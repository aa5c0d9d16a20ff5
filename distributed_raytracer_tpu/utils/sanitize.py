"""Sanitizer tier (SURVEY §5): NaN/inf discipline as an executable check.

The reference leans on Rust's ownership for memory races and has nothing
for numeric poison; this framework's failure mode is different — masked
lanes and dead branches flowing NaN/inf through `where` transposes (the
0 * inf = NaN class).  The double-where discipline (docs/DESIGN.md §4)
prevents it by construction, but discipline is only as good as its
enforcement: this module makes it a runtime check.

Two mechanisms:

  - `checked(fn)` — jax.experimental.checkify with float_checks: every
    primitive that PRODUCES a NaN/inf/div-by-zero is flagged at the op,
    even if the poison is masked out downstream (exactly how a missing
    double-where manifests: sqrt'(0) = inf inside the dead branch).
    Works under jit and through grad/scan/while_loop.
  - `nan_debug()` — scoped jax_debug_nans for ad-hoc runs (cheaper to
    enable, only fires when poison survives to an output).

The CLI exposes `render --sanitize`, which runs a checkified forward+
gradient pre-flight on a small ray batch before the real render (catches
the regression class in seconds instead of poisoning a long render) and
enables jax_debug_nans for the render itself.
"""

from __future__ import annotations

import contextlib
from typing import Callable

import jax
import jax.numpy as jnp
from jax.experimental import checkify


class FloatSanitizerError(AssertionError):
    """A primitive produced NaN/inf/div-by-zero under the sanitizer tier."""


def checked(fn: Callable, jit: bool = True) -> Callable:
    """Wrap fn so any float error (NaN, inf, div-by-zero) raised by ANY
    primitive inside — including masked/dead branches — raises
    FloatSanitizerError with checkify's location message."""
    cf = checkify.checkify(fn, errors=checkify.float_checks)
    if jit:
        cf = jax.jit(cf)

    def wrapped(*args, **kwargs):
        err, out = cf(*args, **kwargs)
        msg = err.get()
        if msg is not None:
            raise FloatSanitizerError(msg)
        return out

    return wrapped


@contextlib.contextmanager
def nan_debug():
    """Scoped jax_debug_nans (re-runs offending ops un-jitted and raises
    where poison reaches an output)."""
    prev = jax.config.jax_debug_nans
    jax.config.update("jax_debug_nans", True)
    try:
        yield
    finally:
        jax.config.update("jax_debug_nans", prev)


def preflight(scene, camera, seed: int = 0, n_rays: int = 256,
              max_depth: int = 8) -> None:
    """Checkified forward + full-scene-gradient probe on a small strided
    ray batch: raises FloatSanitizerError if any kernel-path primitive
    produces poison.  The batch strides the whole image so material mix /
    grazing-hit geometry resemble the real render."""
    from distributed_raytracer_tpu.ops.camera import generate_rays
    from distributed_raytracer_tpu.ops.trace import trace_rays

    key = jax.random.PRNGKey(seed)
    n_pix = camera.num_pixels
    ids = (jnp.arange(n_rays, dtype=jnp.int32) * max(1, n_pix // n_rays)) % n_pix
    o, d = generate_rays(camera, key, ids % camera.image_width,
                         ids // camera.image_width)
    depth = min(max_depth, camera.max_depth)

    def fwd(params):
        sc = scene.with_diff_params(params)
        return jnp.sum(trace_rays(sc, o, d, key, depth))

    checked(fwd)(scene.diff_params())          # forward primitives
    checked(jax.grad(fwd))(scene.diff_params())  # backward primitives
