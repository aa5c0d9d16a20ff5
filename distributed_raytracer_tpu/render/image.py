"""Image post-processing and output.

Batched equivalents of colors.rs: gamma-2 transform (colors.rs:49-55),
intensity clamp + byte quantization (colors.rs:9-24), ARGB packing for
display buffers (colors.rs:43), plus PPM/PNG-free file writers.  The
reference's minifb window becomes progressive snapshot files (the
environment is headless); `pack_argb` produces exactly the u32 buffer the
reference hands to `window.update_with_buffer`.
"""

from __future__ import annotations

import numpy as np

INTENSITY_MIN = 0.0
INTENSITY_MAX = 0.999  # colors.rs:7


def linear_to_gamma(linear: np.ndarray) -> np.ndarray:
    """Gamma-2: sqrt of the positive part (colors.rs:49-55)."""
    return np.sqrt(np.maximum(linear, 0.0))


def to_bytes(linear_rgb: np.ndarray) -> np.ndarray:
    """Linear [..., 3] float -> uint8 bytes via gamma + clamp + 255.999 scale
    (colors.rs:9-24)."""
    g = linear_to_gamma(np.asarray(linear_rgb))
    q = 255.999 * np.clip(g, INTENSITY_MIN, INTENSITY_MAX)
    return q.astype(np.uint8)


def pack_argb(linear_rgb: np.ndarray) -> np.ndarray:
    """Linear [..., 3] float -> packed u32 0xFFRRGGBB (colors.rs:43),
    the minifb display-buffer format."""
    b = to_bytes(linear_rgb).astype(np.uint32)
    return (
        (np.uint32(255) << 24) | (b[..., 0] << 16) | (b[..., 1] << 8) | b[..., 2]
    )


def write_ppm(path: str, linear_rgb: np.ndarray) -> None:
    """Binary P6 PPM writer (the reference declares img.ppm at main.rs:8 but
    never writes it; we actually do)."""
    img = to_bytes(linear_rgb)
    h, w = img.shape[:2]
    with open(path, "wb") as f:
        f.write(f"P6\n{w} {h}\n255\n".encode())
        f.write(img.tobytes())


def read_ppm(path: str) -> np.ndarray:
    """Read a binary P6 PPM back as uint8 [H, W, 3]."""
    with open(path, "rb") as f:
        data = f.read()
    # header: magic, dims, maxval separated by whitespace
    parts = data.split(b"\n", 3)
    assert parts[0] == b"P6", "not a P6 ppm"
    w, h = (int(x) for x in parts[1].split())
    assert parts[2] == b"255"
    pixels = np.frombuffer(parts[3][: w * h * 3], dtype=np.uint8)
    return pixels.reshape(h, w, 3)
