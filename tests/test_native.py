"""Native host-runtime library (native/dray_native.cpp via ctypes) — parity
between the C++ implementations and the NumPy fallbacks/reference math."""

import numpy as np
import pytest

from distributed_raytracer_tpu import native
from distributed_raytracer_tpu.render.image import pack_argb, to_bytes


requires_lib = pytest.mark.skipif(
    not native.available(), reason="libdray_native.so not built (make -C native)"
)


def test_shuffle_is_permutation_and_deterministic():
    a = native.shuffled_indices(10000, seed=42)
    b = native.shuffled_indices(10000, seed=42)
    c = native.shuffled_indices(10000, seed=43)
    np.testing.assert_array_equal(a, b)
    assert not np.array_equal(a, c)
    np.testing.assert_array_equal(np.sort(a), np.arange(10000))


@requires_lib
def test_tonemap_bytes_matches_reference_math():
    rng = np.random.default_rng(0)
    rgb = rng.uniform(-0.1, 1.3, (500, 3)).astype(np.float32)
    np.testing.assert_array_equal(native.tonemap_bytes(rgb), to_bytes(rgb))


@requires_lib
def test_tonemap_pack_matches_reference_math():
    rng = np.random.default_rng(1)
    rgb = rng.uniform(0, 1.1, (300, 3)).astype(np.float32)
    np.testing.assert_array_equal(native.tonemap_pack(rgb), pack_argb(rgb))


@requires_lib
def test_accumulate_matches_numpy():
    rng = np.random.default_rng(2)
    n_pix, n = 64, 1000
    ids = rng.integers(0, n_pix, n).astype(np.int32)
    colors = rng.random((n, 3)).astype(np.float32)
    raw1 = np.zeros((n_pix, 3), np.float32)
    cnt1 = np.zeros(n_pix, np.int32)
    native.accumulate(raw1, cnt1, colors, ids)
    raw2 = np.zeros((n_pix, 3), np.float32)
    cnt2 = np.zeros(n_pix, np.int32)
    np.add.at(raw2, ids, colors)
    np.add.at(cnt2, ids, 1)
    np.testing.assert_allclose(raw1, raw2, rtol=1e-6)
    np.testing.assert_array_equal(cnt1, cnt2)
    # mean_pack agrees with pack_argb of the mean
    np.testing.assert_array_equal(
        native.mean_pack(raw1, cnt1),
        pack_argb(raw1 / np.where(cnt1 != 0, cnt1, 1)[:, None]),
    )


def test_build_clusters_bounds_cover_members():
    rng = np.random.default_rng(3)
    n, k = 487, 64
    centers = rng.uniform(-11, 11, (n, 3)).astype(np.float32)
    radii = rng.uniform(0.1, 1.0, n).astype(np.float32)
    order, bounds = native.build_clusters(centers, radii, k)
    # order is a permutation
    np.testing.assert_array_equal(np.sort(order), np.arange(n))
    # every member sphere is inside its cluster's bounding sphere
    nc = len(bounds)
    assert nc == -(-n // k)
    for c in range(nc):
        m = order[c * k : (c + 1) * k]
        d = np.linalg.norm(centers[m] - bounds[c, :3], axis=-1) + radii[m]
        assert np.all(d <= bounds[c, 3] * (1 + 1e-5) + 1e-5), c


@requires_lib
def test_build_clusters_cpp_matches_numpy_fallback():
    rng = np.random.default_rng(4)
    n, k = 300, 32
    centers = rng.uniform(-5, 5, (n, 3)).astype(np.float32)
    radii = rng.uniform(0.1, 0.5, n).astype(np.float32)
    o1, b1 = native.build_clusters(centers, radii, k)
    # force numpy fallback
    lib, native._lib = native._lib, None
    orig_path, native._LIB_PATH = native._LIB_PATH, "/nonexistent"
    try:
        o2, b2 = native.build_clusters(centers, radii, k)
    finally:
        native._lib, native._LIB_PATH = lib, orig_path
    np.testing.assert_array_equal(o1, o2)
    np.testing.assert_allclose(b1, b2, rtol=1e-4, atol=1e-5)


def test_morton_order_is_spatially_coherent():
    # RTiOW-like planar sphere field (the actual workload shape): Morton
    # clusters must be far tighter than the scene extent (~22 across)
    rng = np.random.default_rng(5)
    n, k = 512, 64
    centers = rng.uniform(-11, 11, (n, 3)).astype(np.float32)
    centers[:, 1] = 0.2  # ground-plane layout (main.rs:16-19)
    radii = np.full(n, 0.2, np.float32)
    _, bounds = native.build_clusters(centers, radii, k)
    mean_r = bounds[:, 3].mean()
    assert mean_r < 10.0, mean_r
