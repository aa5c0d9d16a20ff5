"""Config dataclasses and CLI surface."""

import os

import numpy as np
import pytest

from distributed_raytracer_tpu.utils.config import CameraConfig, RenderJobConfig


def test_camera_config_builds():
    cam = CameraConfig(image_width=64, aspect_ratio=2.0, samples_per_pixel=4).build()
    assert cam.image_width == 64 and cam.image_height == 32
    assert cam.samples_per_pixel == 4


def test_job_config_roundtrip():
    cfg = RenderJobConfig(preset="config1", seed=3, spp=7, batch=2)
    s = cfg.to_json()
    back = RenderJobConfig.from_json(s)
    assert back.preset == "config1" and back.seed == 3 and back.spp == 7
    scene, cam = back.build()
    assert scene.num_spheres == 2
    assert cam.samples_per_pixel == 7  # spp override applied


def test_job_config_unknown_preset():
    with pytest.raises(KeyError):
        RenderJobConfig(preset="nope").build()


def test_cli_render_and_gradcheck(tmp_path, capsys):
    from distributed_raytracer_tpu.cli import main

    out = str(tmp_path / "o.ppm")
    main(["render", "--config", "config1", "--spp", "1", "--width", "64",
          "--out", out])
    assert os.path.exists(out)
    from distributed_raytracer_tpu.render.image import read_ppm

    img = read_ppm(out)
    assert img.shape[1] == 64 and np.isfinite(img).all()

    main(["grad-check", "--config", "config1", "--width", "32"])


def test_cli_wavefront(tmp_path):
    from distributed_raytracer_tpu.cli import main

    out = str(tmp_path / "w.ppm")
    main(["render", "--config", "config1", "--spp", "2", "--width", "64",
          "--wavefront", "--out", out])
    assert os.path.exists(out)


def test_cli_engine_flag_and_checkpoint_config(tmp_path):
    from distributed_raytracer_tpu.cli import main

    out = str(tmp_path / "e.ppm")
    ck = str(tmp_path / "e.ckpt")
    main(["render", "--config", "config1", "--spp", "2", "--width", "64",
          "--engine", "wavefront", "--checkpoint", ck, "--out", out])
    assert os.path.exists(out) and os.path.exists(ck)
    # the effective RenderJobConfig is serialized next to the checkpoint
    assert os.path.exists(ck + ".json")
    cfg = RenderJobConfig.from_json(open(ck + ".json").read())
    assert cfg.preset == "config1" and cfg.engine == "wavefront" and cfg.spp == 2


def test_cli_job_file(tmp_path):
    from distributed_raytracer_tpu.cli import main

    out = str(tmp_path / "j.ppm")
    job = RenderJobConfig(preset="config1", seed=5, spp=2, batch=2,
                          output=out, engine="scan")
    jp = str(tmp_path / "job.json")
    with open(jp, "w") as f:
        f.write(job.to_json())
    main(["render", "--job", jp, "--width", "48"])
    assert os.path.exists(out)


def test_cli_shuffled_fill(tmp_path):
    from distributed_raytracer_tpu.cli import main

    out = str(tmp_path / "s.ppm")
    main(["render", "--config", "config1", "--spp", "2", "--width", "48",
          "--fill", "shuffled", "--snapshot-every", "1", "--out", out])
    assert os.path.exists(out)
    from distributed_raytracer_tpu.render.image import read_ppm

    img = read_ppm(out)
    assert np.isfinite(img).all() and img.mean() > 0


def test_cli_live_display(tmp_path):
    # --display serves progressive frames over HTTP while the render runs;
    # after the final sample the last frame is the finished image
    import json
    import threading
    import urllib.request

    from distributed_raytracer_tpu.cli import main

    out = str(tmp_path / "d.ppm")
    seen = []

    # poll stats.json from a side thread while the CLI renders
    stop = threading.Event()

    def poll():
        while not stop.is_set():
            try:
                with urllib.request.urlopen(
                    "http://127.0.0.1:18642/stats.json", timeout=2
                ) as r:
                    seen.append(json.loads(r.read()))
            except Exception:
                pass
            stop.wait(0.01)

    t = threading.Thread(target=poll)
    t.start()
    try:
        main(["render", "--config", "config1", "--spp", "4", "--batch", "1",
              "--width", "48", "--out", out, "--display",
              "--display-port", "18642"])
    finally:
        stop.set()
        t.join()
    assert os.path.exists(out)
    assert any(s["frames"] > 0 for s in seen), seen[:3]
    assert seen[-1]["width"] == 48
