"""Worker for the 2-process jax.distributed CPU test (test_multihost.py).

Each process gets 2 fake CPU devices -> a 4-device global mesh.  Renders a
small scene with the mesh-sharded renderer, gathers the image on every
host, and process 0 writes it (plus a plain single-device local render for
comparison) to the output dir.

Run: python _multihost_worker.py <coordinator> <num_procs> <pid> <outdir>
"""

import os
import sys

os.environ["XLA_FLAGS"] = (
    "--xla_force_host_platform_device_count=2 " + os.environ.get("XLA_FLAGS", "")
)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")  # axon sitecustomize override

import numpy as np  # noqa: E402


def main() -> None:
    coordinator, num_procs, pid, outdir = (
        sys.argv[1],
        int(sys.argv[2]),
        int(sys.argv[3]),
        sys.argv[4],
    )
    from distributed_raytracer_tpu.parallel import multihost

    # MUST come before any backend query (jax.devices etc.)
    multihost.initialize(
        coordinator_address=coordinator, num_processes=num_procs, process_id=pid
    )
    info = multihost.process_info()
    assert info["process_count"] == num_procs, info
    assert info["global_devices"] == 2 * num_procs, info

    import jax.numpy as jnp

    from distributed_raytracer_tpu.models.presets import config1
    from distributed_raytracer_tpu.ops.camera import make_camera
    from distributed_raytracer_tpu.parallel.mesh import make_mesh
    from distributed_raytracer_tpu.parallel.sharded import ShardedRenderer

    scene, cam_full = config1()
    camera = make_camera(
        image_width=48,
        aspect_ratio=16 / 9,
        samples_per_pixel=2,
        max_depth=6,
        vfov=cam_full.vfov,
        lookfrom=cam_full.lookfrom,
        lookat=cam_full.lookat,
    )

    mesh = make_mesh()  # all 4 global devices on the "rays" axis
    renderer = ShardedRenderer(mesh, camera)
    key = jax.random.PRNGKey(7)
    samples = jnp.arange(2, dtype=jnp.int32)
    out = renderer.render_sample_sum(scene, key, samples)
    img = multihost.gather_image(out)

    if pid == 0:
        np.save(os.path.join(outdir, "multi.npy"), img)
        # independent single-device render of the same program (no mesh)
        from distributed_raytracer_tpu.parallel.sharded import _render_ids

        ids = jnp.arange(camera.num_pixels, dtype=jnp.int32)
        expected = jax.jit(
            lambda s, k: _render_ids(s, camera, k, samples, ids, False)
        )(scene, key)
        np.save(os.path.join(outdir, "single.npy"), np.asarray(expected))
    print(f"worker {pid} ok", flush=True)


if __name__ == "__main__":
    main()
