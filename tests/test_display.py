"""Live HTTP display (render/display.py) — the minifb-window parity path
(client.rs:79-121): tonemap -> packed ARGB -> browser-renderable frames.
"""

import json
import struct
import urllib.request

import numpy as np
import pytest

from distributed_raytracer_tpu.render.display import LiveDisplay, _bmp_from_argb
from distributed_raytracer_tpu.render.image import pack_argb, to_bytes


def _get(url):
    with urllib.request.urlopen(url, timeout=10) as r:
        return r.status, r.headers.get("Content-Type"), r.read()


@pytest.fixture
def display():
    d = LiveDisplay(width=8, height=4, spp_total=16).start()
    yield d
    d.close()


def test_bmp_embeds_packed_argb_verbatim():
    rgb = np.random.default_rng(0).uniform(0, 1, (4, 8, 3)).astype(np.float32)
    packed = pack_argb(rgb)
    bmp = _bmp_from_argb(packed, 8, 4)
    # header: magic, size, offset 54, 32bpp, top-down (negative height)
    assert bmp[:2] == b"BM"
    offset = struct.unpack_from("<I", bmp, 10)[0]
    bpp = struct.unpack_from("<H", bmp, 28)[0]
    height = struct.unpack_from("<i", bmp, 22)[0]
    assert (offset, bpp, height) == (54, 32, -4)
    # pixel payload is the packed buffer byte-for-byte
    assert bmp[54:] == np.ascontiguousarray(packed, "<u4").tobytes()


def test_serves_frames_and_stats(display):
    base = display.url
    # before any frame: 503 on frames, stats at 0
    status, _, _ = _get(base + "stats.json")
    assert status == 200
    with pytest.raises(urllib.error.HTTPError) as e:
        _get(base + "frame.bmp")
    assert e.value.code == 503

    rgb = np.linspace(0, 1, 8 * 4 * 3, dtype=np.float32).reshape(4, 8, 3)
    display.update(rgb, spp_done=5)

    status, ctype, body = _get(base + "frame.bmp")
    assert (status, ctype) == (200, "image/bmp")
    assert body[54:] == np.ascontiguousarray(pack_argb(rgb), "<u4").tobytes()

    status, ctype, body = _get(base + "frame.ppm")
    assert status == 200
    head, pixels = body.split(b"255\n", 1)
    assert head == b"P6\n8 4\n"
    np.testing.assert_array_equal(
        np.frombuffer(pixels, np.uint8).reshape(4, 8, 3), to_bytes(rgb)
    )

    status, _, body = _get(base + "stats.json")
    stats = json.loads(body)
    assert stats == dict(
        frames=1, spp_done=5, spp_total=16, width=8, height=4
    )

    status, ctype, body = _get(base)
    assert status == 200 and ctype.startswith("text/html")
    assert b"frame.bmp" in body


def test_progress_cb_adapter(display):
    from distributed_raytracer_tpu.ops.camera import make_camera
    from distributed_raytracer_tpu.render.progressive import AccumState

    import dataclasses

    cam = make_camera(aspect_ratio=2.0, image_width=8, samples_per_pixel=4)
    state = dataclasses.replace(
        AccumState.fresh(cam, seed=0),
        raw_sum=np.ones((cam.num_pixels, 3), np.float32) * 2.0,
        samples_done=2,
    )
    display.progress_cb()(state)
    _, _, body = _get(display.url + "stats.json")
    assert json.loads(body)["spp_done"] == 2
    status, _, _ = _get(display.url + "frame.bmp")
    assert status == 200
