"""Progressive accumulation + checkpoint/resume (the fault-tolerance story
replacing the reference's retry-forever replication, ray_server.rs:62-86)."""

import os

import numpy as np

from distributed_raytracer_tpu.models.presets import config1
from distributed_raytracer_tpu.render.progressive import AccumState, render_progressive


def small(cam):
    return cam.replace(samples_per_pixel=8)


def test_straight_render_matches_render_image(tmp_path):
    scene, cam = config1()
    cam = small(cam)
    st = render_progressive(scene, cam, seed=0, spp=8, batch=4)
    from distributed_raytracer_tpu.render.renderer import render_image

    img = render_image(scene, cam, seed=0, spp=8, batch=4)
    np.testing.assert_allclose(st.mean_image(), img, atol=1e-6)


def test_resume_is_bit_identical(tmp_path):
    scene, cam = config1()
    cam = small(cam)
    ck = str(tmp_path / "r.ckpt")

    # interrupted run: stop after 4 of 8 samples
    class Stop(Exception):
        pass

    def interrupt(state):
        if state.samples_done >= 4:
            raise Stop

    try:
        render_progressive(
            scene, cam, seed=0, spp=8, batch=2, checkpoint_path=ck, progress_cb=interrupt
        )
    except Stop:
        pass
    assert os.path.exists(ck)
    mid = AccumState.load(ck)
    assert mid.samples_done == 4

    resumed = render_progressive(
        scene, cam, seed=0, spp=8, batch=2, checkpoint_path=ck
    )
    straight = render_progressive(scene, cam, seed=0, spp=8, batch=2)
    np.testing.assert_array_equal(resumed.raw_sum, straight.raw_sum)
    assert resumed.samples_done == straight.samples_done == 8


def test_incompatible_checkpoint_restarts(tmp_path):
    scene, cam = config1()
    cam = small(cam)
    ck = str(tmp_path / "r.ckpt")
    render_progressive(scene, cam, seed=1, spp=2, batch=2, checkpoint_path=ck)
    # different seed -> checkpoint ignored, fresh render
    st = render_progressive(scene, cam, seed=2, spp=2, batch=2, checkpoint_path=ck)
    fresh = render_progressive(scene, cam, seed=2, spp=2, batch=2)
    np.testing.assert_array_equal(st.raw_sum, fresh.raw_sum)


def test_checkpoint_atomic_save(tmp_path):
    scene, cam = config1()
    cam = small(cam)
    ck = str(tmp_path / "r.ckpt")
    st = render_progressive(scene, cam, seed=0, spp=2, batch=2, checkpoint_path=ck)
    # no stray tmp files left behind
    assert [f for f in os.listdir(tmp_path) if f.endswith(".tmp")] == []
    loaded = AccumState.load(ck)
    np.testing.assert_array_equal(loaded.raw_sum, st.raw_sum)


def test_wavefront_engine_resume_bit_identical(tmp_path):
    scene, cam = config1()
    cam = small(cam)
    ck = str(tmp_path / "w.ckpt")

    class Stop(Exception):
        pass

    def interrupt(state):
        if state.samples_done >= 4:
            raise Stop

    try:
        render_progressive(
            scene, cam, seed=0, spp=8, batch=2, checkpoint_path=ck,
            progress_cb=interrupt, engine="wavefront", pool_size=512,
        )
    except Stop:
        pass
    mid = AccumState.load(ck)
    assert mid.samples_done == 4 and mid.engine == "wavefront" and mid.batch == 2

    resumed = render_progressive(
        scene, cam, seed=0, spp=8, batch=2, checkpoint_path=ck,
        engine="wavefront", pool_size=512,
    )
    straight = render_progressive(
        scene, cam, seed=0, spp=8, batch=2, engine="wavefront", pool_size=512
    )
    np.testing.assert_array_equal(resumed.raw_sum, straight.raw_sum)

    # batch mismatch on a wavefront checkpoint -> restart, matching fresh
    st = render_progressive(
        scene, cam, seed=0, spp=8, batch=4, checkpoint_path=ck,
        engine="wavefront", pool_size=512,
    )
    fresh = render_progressive(
        scene, cam, seed=0, spp=8, batch=4, engine="wavefront", pool_size=512
    )
    np.testing.assert_array_equal(st.raw_sum, fresh.raw_sum)


def test_shuffled_fill_covers_every_pixel_once():
    scene, cam = config1()
    cam = small(cam)
    snapshots = []
    st = render_progressive(
        scene, cam, seed=0, spp=2, batch=2, fill="shuffled", fill_chunk=1000,
        fill_cb=lambda img: snapshots.append(img.copy()),
    )
    assert st.samples_done == 2
    assert np.isfinite(st.raw_sum).all()
    # partial snapshots fill in progressively: nonzero pixel count increases
    filled = [int((s.reshape(-1, 3).sum(-1) != 0).sum()) for s in snapshots]
    assert filled == sorted(filled) and filled[0] < filled[-1]
    # deterministic: a second run is bit-identical
    st2 = render_progressive(
        scene, cam, seed=0, spp=2, batch=2, fill="shuffled", fill_chunk=1000
    )
    np.testing.assert_array_equal(st.raw_sum, st2.raw_sum)


def test_shuffled_fill_fused_engine_mechanics():
    """--fill shuffled with engine='fused' renders the fill chunks through
    the production fused kernel (pixel_ids path).  Interpret-mode PRNG draws
    are zeros, so only the mechanics (coverage, determinism, progressive
    snapshots) are asserted here; color agreement is a -m tpu test."""
    from jax.experimental.pallas import tpu as pltpu

    scene, cam = config1()
    cam = small(cam)
    snapshots = []
    with pltpu.force_tpu_interpret_mode():
        st = render_progressive(
            scene, cam, seed=0, spp=2, batch=2, fill="shuffled",
            fill_chunk=1000, engine="fused", pool_size=512,
            fill_cb=lambda img: snapshots.append(img.copy()),
        )
    assert st.samples_done == 2
    assert np.isfinite(st.raw_sum).all()
    filled = [int((s.reshape(-1, 3).sum(-1) != 0).sum()) for s in snapshots]
    assert filled == sorted(filled) and filled[0] < filled[-1]
    with pltpu.force_tpu_interpret_mode():
        st2 = render_progressive(
            scene, cam, seed=0, spp=2, batch=2, fill="shuffled",
            fill_chunk=1000, engine="fused", pool_size=512,
        )
    np.testing.assert_array_equal(st.raw_sum, st2.raw_sum)


def test_mean_image_zero_count_guard():
    st = AccumState(
        raw_sum=np.ones((4, 3), np.float32), samples_done=0, seed=0,
        image_width=2, image_height=2,
    )
    img = st.mean_image()  # colors.rs:40's zero-count guard
    np.testing.assert_array_equal(img.reshape(-1, 3), np.ones((4, 3)))


def _mega_camera(width=32, depth=6):
    from distributed_raytracer_tpu.models.presets import make_camera

    return make_camera(
        aspect_ratio=16.0 / 9.0, image_width=width, samples_per_pixel=4,
        max_depth=depth, vfov=20.0, lookfrom=(13.0, 2.0, 3.0),
        lookat=(0.0, 0.0, 0.0), vup=(0.0, 1.0, 0.0),
        defocus_angle=0.6, focus_dist=10.0,
    )


def test_mega_engine_resume_bit_identical(tmp_path):
    """The mega render engine under the progressive loop: checkpoint mid-
    render, resume, match the uninterrupted run bit-exactly (same contract
    as the other wavefront engines — noise keyed per sample-batch start)."""
    from jax.experimental.pallas import tpu as pltpu

    from distributed_raytracer_tpu.models.presets import get_config

    scene, _ = get_config("config2")
    cam = _mega_camera()
    ck = str(tmp_path / "m.ckpt")

    class Stop(Exception):
        pass

    def interrupt(state):
        if state.samples_done >= 2:
            raise Stop

    with pltpu.force_tpu_interpret_mode():
        try:
            render_progressive(
                scene, cam, seed=0, spp=4, batch=2, checkpoint_path=ck,
                progress_cb=interrupt, engine="mega", pool_size=128,
            )
        except Stop:
            pass
        mid = AccumState.load(ck)
        assert mid.samples_done == 2 and mid.engine == "mega"

        resumed = render_progressive(
            scene, cam, seed=0, spp=4, batch=2, checkpoint_path=ck,
            engine="mega", pool_size=128,
        )
        straight = render_progressive(
            scene, cam, seed=0, spp=4, batch=2, engine="mega", pool_size=128
        )
    np.testing.assert_array_equal(resumed.raw_sum, straight.raw_sum)
    assert np.isfinite(straight.raw_sum).all()
    assert (straight.raw_sum != 0).any()


def test_mega_engine_walks_multichunk_and_falls_back_on_vmem(tmp_path):
    """Round 4: a scene beyond one sweep chunk (> 512 spheres) now STAYS
    on the mega engine (the walk kernel, tag 'mega' — image covered by
    test_mega_walk.py's routing test); only a VMEM-bound image (dense
    color homes past the budget) still downgrades to fused."""
    from jax.experimental.pallas import tpu as pltpu

    from distributed_raytracer_tpu.models.presets import rtiow_final_scene
    from distributed_raytracer_tpu.ops.camera import make_camera
    from distributed_raytracer_tpu.ops.pallas.mega_render_kernel import (
        mega_render_supported,
    )
    from distributed_raytracer_tpu.ops.pallas.mega_walk_kernel import (
        mega_walk_supported,
    )

    big = rtiow_final_scene(seed=0, pad_to=640)
    cam = _mega_camera(depth=3)
    assert not mega_render_supported(big, cam.num_pixels, 128)
    assert mega_walk_supported(cam.num_pixels, 128)
    ck = str(tmp_path / "walk.ckpt")
    with pltpu.force_tpu_interpret_mode():
        render_progressive(
            big, cam, seed=0, spp=1, batch=1, checkpoint_path=ck,
            engine="mega", pool_size=128,
        )
    assert AccumState.load(ck).engine == "mega"  # no fused downgrade

    # VMEM-bound image: the dense [C, B] color homes exceed the budget ->
    # fused fallback (spp=0 exercises only the routing, no render)
    huge = make_camera(
        aspect_ratio=16.0 / 9.0, image_width=3200, samples_per_pixel=1,
        max_depth=3, vfov=20.0, lookfrom=(13.0, 2.0, 3.0),
        lookat=(0.0, 0.0, 0.0), vup=(0.0, 1.0, 0.0),
        defocus_angle=0.0, focus_dist=10.0,
    )
    assert not mega_walk_supported(huge.num_pixels, 128)
    ck2 = str(tmp_path / "vmem.ckpt")
    st = render_progressive(
        big, huge, seed=0, spp=0, batch=1, checkpoint_path=ck2,
        engine="mega", pool_size=128,
    )
    assert st.samples_done == 0
    assert AccumState.load(ck2).engine == "fused"
