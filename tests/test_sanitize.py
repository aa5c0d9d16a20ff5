"""Sanitizer tier (utils/sanitize.py, SURVEY §5).

The tier must (a) pass clean on the production kernels — forward AND
gradient — and (b) CATCH the double-where regression class at the
producing op, not via image diffs.  (b) is demonstrated by seeding the
exact historical bug: a single-where sqrt-at-zero, whose derivative
divides by zero inside the masked branch.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from distributed_raytracer_tpu.models.presets import config2, config4
from distributed_raytracer_tpu.utils.sanitize import (
    FloatSanitizerError,
    checked,
    nan_debug,
    preflight,
)


def test_preflight_clean_config2():
    scene, cam = config2()
    preflight(scene, cam, seed=0, n_rays=128)


def test_preflight_clean_config4():
    # the full material mix + grazing-hit geometry of the flagship scene
    scene, cam = config4()
    preflight(scene, cam, seed=1, n_rays=128, max_depth=6)


def test_seeded_single_where_regression_caught():
    """Re-introduce the bug class the discipline exists for: sqrt guarded
    by a single where.  The FORWARD is fine (sqrt of a clamped value);
    the BACKWARD divides by sqrt(0) inside the dead branch — the tier
    must flag it at the op."""

    def single_where_norm(x):
        # broken near_zero-style guard: sqrt applied to the raw value
        n = jnp.sqrt(jnp.sum(x * x, axis=-1))
        return jnp.sum(jnp.where(n > 0, n, 0.0))

    x = jnp.zeros((4, 3), jnp.float32)  # zero-length vectors hit sqrt(0)
    checked(single_where_norm)(x)  # forward alone is clean
    with pytest.raises(FloatSanitizerError):
        checked(jax.grad(single_where_norm))(x)


def test_double_where_fix_passes():
    """The disciplined version of the same computation is clean — the
    tier separates the bug from the fix."""

    def double_where_norm(x):
        s = jnp.sum(x * x, axis=-1)
        safe = jnp.where(s > 0, s, 1.0)   # guard BEFORE sqrt
        n = jnp.where(s > 0, jnp.sqrt(safe), 0.0)
        return jnp.sum(n)

    x = jnp.zeros((4, 3), jnp.float32)
    checked(jax.grad(double_where_norm))(x)


def test_checked_passes_values_through():
    f = checked(lambda a, b: a * b + 1.0)
    out = f(jnp.float32(3.0), jnp.float32(4.0))
    assert float(out) == 13.0


def test_nan_debug_scoped():
    assert not jax.config.jax_debug_nans
    with nan_debug():
        assert jax.config.jax_debug_nans
        with pytest.raises(FloatingPointError):
            jnp.log(jnp.float32(-1.0)).block_until_ready()
    assert not jax.config.jax_debug_nans


def test_cli_sanitize_smoke(tmp_path):
    from distributed_raytracer_tpu.cli import main
    from distributed_raytracer_tpu.render.image import read_ppm

    out = str(tmp_path / "s.ppm")
    main(["render", "--config", "config1", "--spp", "1", "--width", "32",
          "--sanitize", "--out", out])
    # leave the process flag clean for other tests
    jax.config.update("jax_debug_nans", False)
    img = read_ppm(out)
    assert np.isfinite(img).all()
