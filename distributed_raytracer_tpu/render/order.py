"""Ray-stream orderings for the wavefront renderers.

The pool refills lanes from a global ray stream; the PIXEL ORDER of that
stream decides the spatial coherence of each in-flight ray block, which is
what the block-culled kernels key on (a 32x16 pixel tile subtends ~1-2
degrees — its front-to-back chunk walk skips 2/3 of the scene; a block of
rays scattered across the image skips almost nothing; measured in
scripts/walk_probe.py).  The reference's analogue is CameraRayIterator's
pixel ordering (camera.rs:68-116) — shuffled there for display uniformity,
tiled here for traversal coherence.
"""

from __future__ import annotations

import numpy as np


def tile_permutation(width: int, height: int, tile_w: int = 32, tile_h: int = 16) -> np.ndarray:
    """Permutation p of pixel ids such that consecutive stream positions
    walk tile_w x tile_h image tiles; p[k] = pixel id at stream position k.
    Partial edge tiles are emitted last so full tiles stay contiguous."""
    n = width * height
    ids = []
    tail = []
    for ty in range(0, height, tile_h):
        for tx in range(0, width, tile_w):
            full = (ty + tile_h <= height) and (tx + tile_w <= width)
            dst = ids if full else tail
            for y in range(ty, min(ty + tile_h, height)):
                dst.extend(y * width + x for x in range(tx, min(tx + tile_w, width)))
    out = np.asarray(ids + tail, np.int32)
    assert out.size == n
    return out


def inverse_permutation(p: np.ndarray) -> np.ndarray:
    inv = np.empty_like(p)
    inv[p] = np.arange(p.size, dtype=p.dtype)
    return inv
