"""ctypes bindings for the native host runtime (native/dray_native.cpp),
with NumPy fallbacks when the shared library isn't built.

Build: `make -C native` (g++, no dependencies).
"""

from __future__ import annotations

import ctypes
import os
from typing import Optional, Tuple

import numpy as np

_LIB_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "native",
    "libdray_native.so",
)

_lib: Optional[ctypes.CDLL] = None


_build_attempted = False


def _try_build() -> None:
    """Build the .so from source once per process if it's missing.

    The binary is deliberately NOT committed (a stale .so can silently
    diverge from dray_native.cpp); `make -C native` is cheap (<2 s, g++
    only) so production paths self-provision."""
    global _build_attempted
    if _build_attempted:
        return
    _build_attempted = True
    import subprocess

    try:
        subprocess.run(
            ["make", "-C", os.path.dirname(_LIB_PATH)],
            check=True,
            capture_output=True,
            timeout=120,
        )
    except Exception:
        pass  # NumPy fallbacks cover every entry point


def _load() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH):
        _try_build()
    if not os.path.exists(_LIB_PATH):
        return None
    lib = ctypes.CDLL(_LIB_PATH)
    i64, i32, u64 = ctypes.c_int64, ctypes.c_int32, ctypes.c_uint64
    f32p = ctypes.POINTER(ctypes.c_float)
    u8p = ctypes.POINTER(ctypes.c_uint8)
    u32p = ctypes.POINTER(ctypes.c_uint32)
    i32p = ctypes.POINTER(ctypes.c_int32)
    lib.dray_shuffle.argtypes = [i32p, i64, u64]
    lib.dray_tonemap_bytes.argtypes = [f32p, i64, u8p]
    lib.dray_tonemap_pack.argtypes = [f32p, i64, u32p]
    lib.dray_accumulate.argtypes = [f32p, i32p, f32p, i32p, i64, i64]
    lib.dray_mean_pack.argtypes = [f32p, i32p, i64, u32p]
    lib.dray_build_clusters.argtypes = [f32p, f32p, i32, i32, i32p, f32p]
    lib.dray_build_clusters.restype = i32
    _lib = lib
    return lib


def available() -> bool:
    return _load() is not None


def _ptr(a: np.ndarray, ctype):
    return a.ctypes.data_as(ctypes.POINTER(ctype))


def shuffled_indices(n: int, seed: int) -> np.ndarray:
    """Deterministic shuffled pixel permutation (CameraRayIterator's
    progressive fill order, camera.rs:96-98, but seeded)."""
    idx = np.arange(n, dtype=np.int32)
    lib = _load()
    if lib is not None:
        lib.dray_shuffle(_ptr(idx, ctypes.c_int32), n, seed & 0xFFFFFFFFFFFFFFFF)
    else:
        np.random.default_rng(seed).shuffle(idx)
    return idx


def tonemap_bytes(linear_rgb: np.ndarray) -> np.ndarray:
    rgb = np.ascontiguousarray(linear_rgb, np.float32)
    n = rgb.size // 3
    lib = _load()
    if lib is not None:
        out = np.empty(rgb.shape, np.uint8)
        lib.dray_tonemap_bytes(
            _ptr(rgb, ctypes.c_float), n, _ptr(out, ctypes.c_uint8)
        )
        return out
    from distributed_raytracer_tpu.render.image import to_bytes

    return to_bytes(rgb)


def tonemap_pack(linear_rgb: np.ndarray) -> np.ndarray:
    rgb = np.ascontiguousarray(linear_rgb, np.float32)
    n = rgb.size // 3
    lib = _load()
    if lib is not None:
        out = np.empty(rgb.shape[:-1], np.uint32)
        lib.dray_tonemap_pack(
            _ptr(rgb, ctypes.c_float), n, _ptr(out, ctypes.c_uint32)
        )
        return out
    from distributed_raytracer_tpu.render.image import pack_argb

    return pack_argb(rgb)


def accumulate(
    raw: np.ndarray, count: np.ndarray, colors: np.ndarray, pixel_ids: np.ndarray
) -> None:
    """In-place raw[pix] += color; count[pix] += 1 (write_color semantics)."""
    lib = _load()
    colors = np.ascontiguousarray(colors, np.float32)
    pixel_ids = np.ascontiguousarray(pixel_ids, np.int32)
    if lib is not None:
        assert raw.flags.c_contiguous and count.flags.c_contiguous
        lib.dray_accumulate(
            _ptr(raw, ctypes.c_float),
            _ptr(count, ctypes.c_int32),
            _ptr(colors, ctypes.c_float),
            _ptr(pixel_ids, ctypes.c_int32),
            len(pixel_ids),
            len(count),
        )
    else:
        np.add.at(raw, pixel_ids, colors)
        np.add.at(count, pixel_ids, 1)


def mean_pack(raw: np.ndarray, count: np.ndarray) -> np.ndarray:
    lib = _load()
    if lib is not None:
        out = np.empty(len(count), np.uint32)
        lib.dray_mean_pack(
            _ptr(np.ascontiguousarray(raw, np.float32), ctypes.c_float),
            _ptr(np.ascontiguousarray(count, np.int32), ctypes.c_int32),
            len(count),
            _ptr(out, ctypes.c_uint32),
        )
        return out
    from distributed_raytracer_tpu.render.image import pack_argb

    denom = np.where(count != 0, count, 1).astype(np.float32)[:, None]
    return pack_argb(raw / denom)


def build_clusters(
    centers: np.ndarray, radii: np.ndarray, cluster_size: int
) -> Tuple[np.ndarray, np.ndarray]:
    """Morton-sort spheres and compute per-cluster bounding spheres.

    Returns (order [n] int32, cluster_bounds [n_clusters, 4] f32 as
    (cx, cy, cz, r))."""
    centers = np.ascontiguousarray(centers, np.float32)
    radii = np.ascontiguousarray(radii, np.float32)
    n = len(radii)
    n_clusters_max = -(-n // cluster_size)
    order = np.empty(n, np.int32)
    bounds = np.empty((n_clusters_max, 4), np.float32)
    lib = _load()
    if lib is not None:
        nc = lib.dray_build_clusters(
            _ptr(centers, ctypes.c_float),
            _ptr(radii, ctypes.c_float),
            n,
            cluster_size,
            _ptr(order, ctypes.c_int32),
            _ptr(bounds, ctypes.c_float),
        )
        return order, bounds[:nc]
    # NumPy fallback: same algorithm
    lo = centers.min(0)
    span = np.maximum(centers.max(0) - lo, 1e-12)
    q = np.clip((centers - lo) / span, 0, 1 - 1e-9)
    qi = (q * 2097151.0).astype(np.uint64)

    def expand(v):
        v = v & np.uint64(0x1FFFFF)
        v = (v | (v << np.uint64(32))) & np.uint64(0x1F00000000FFFF)
        v = (v | (v << np.uint64(16))) & np.uint64(0x1F0000FF0000FF)
        v = (v | (v << np.uint64(8))) & np.uint64(0x100F00F00F00F00F)
        v = (v | (v << np.uint64(4))) & np.uint64(0x10C30C30C30C30C3)
        v = (v | (v << np.uint64(2))) & np.uint64(0x1249249249249249)
        return v

    code = (
        (expand(qi[:, 0]) << np.uint64(2))
        | (expand(qi[:, 1]) << np.uint64(1))
        | expand(qi[:, 2])
    )
    order[:] = np.argsort(code, kind="stable").astype(np.int32)
    bl = []
    for c in range(n_clusters_max):
        m = order[c * cluster_size : (c + 1) * cluster_size]
        ctr = centers[m].mean(0)
        r = np.max(np.linalg.norm(centers[m] - ctr, axis=-1) + radii[m])
        bl.append([*ctr, r])
    return order, np.asarray(bl, np.float32)
