"""Property-based tests (hypothesis): core math invariants against random
inputs, complementing the fixed-case unit tests.  The reference's only
tests are hand-picked exact cases (vec3.rs:260-450); these sweep the input
space.

Kept deliberately small/fast: hypothesis drives the SHAPE of the scene
(sphere layouts, ray families), numpy drives bulk randomness inside each
example, and every property is checked vectorized over a ray batch.
"""

import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # subprocess/property tests: minutes, not seconds

hypothesis = pytest.importorskip("hypothesis")
from hypothesis import given, settings
from hypothesis import strategies as st

from distributed_raytracer_tpu.core import vecmath
from distributed_raytracer_tpu.models.scene import SceneBuilder
from distributed_raytracer_tpu.ops.intersect import closest_hit
from np_reference import NPScene, hit_scene

# derandomize: a FIXED example set per hypothesis version — fresh random
# seeds each CI run would make the statistical thresholds (idx agreement
# > 0.99 under f32-vs-f64 near-tie flips) an intermittent-flake lottery
_SETTINGS = dict(max_examples=20, deadline=None, derandomize=True)


def _scene_from(seed: int, n_spheres: int):
    rng = np.random.default_rng(seed)
    sb = SceneBuilder()
    mats = ("lam", "met", "die")
    for i in range(n_spheres):
        c = rng.uniform(-6, 6, 3)
        r = rng.uniform(0.2, 1.5)
        m = mats[i % 3]
        if m == "lam":
            sb.add_lambertian(c, r, rng.uniform(0.05, 0.95, 3))
        elif m == "met":
            sb.add_metal(c, r, rng.uniform(0.05, 0.95, 3), rng.uniform(0, 1))
        else:
            sb.add_dielectric(c, r, rng.uniform(1.1, 2.0))
    return sb.build(), rng


@settings(**_SETTINGS)
@given(seed=st.integers(0, 2**31 - 1), n=st.integers(1, 40))
def test_closest_hit_matches_f64_reference(seed, n):
    """Random scenes x random rays: the f32 closest hit agrees with the
    independent f64 reference on (hit, idx) away from grazing incidence,
    and on t to f32-grade relative tolerance."""
    scene, rng = _scene_from(seed, n)
    r = 256
    o = rng.uniform(-10, 10, (r, 3))
    d = rng.normal(size=(r, 3))
    d /= np.linalg.norm(d, axis=-1, keepdims=True)

    res = closest_hit(jnp.asarray(o, jnp.float32), jnp.asarray(d, jnp.float32), scene)
    nps = NPScene.from_scene(scene)
    t64, idx64, hit64 = hit_scene(nps, o, d)

    got_hit = np.asarray(res.hit)
    got_idx = np.asarray(res.idx)
    got_t = np.asarray(res.t)

    # exclude grazing hits (tiny |disc|) where f32/f64 legitimately disagree:
    # require the f64 t to be stable under a 1e-4 ray-origin nudge
    o2 = o + 1e-4 * d
    t64b, idx64b, hit64b = hit_scene(nps, o2, d)
    stable = (hit64 == hit64b) & (idx64 == idx64b)

    m = stable & hit64 & got_hit
    if m.any():
        agree = got_idx[m] == idx64[m]
        # allow rare near-tie disagreements between two spheres at ~equal t
        assert agree.mean() > 0.99, f"idx agreement {agree.mean():.3f}"
        mm = m & (got_idx == idx64)
        np.testing.assert_allclose(got_t[mm], t64[mm], rtol=2e-4, atol=2e-4)
    # hit/miss agreement on stable rays
    if stable.any():
        assert (got_hit[stable] == hit64[stable]).mean() > 0.99


@settings(**_SETTINGS)
@given(seed=st.integers(0, 2**31 - 1))
def test_reflect_refract_invariants(seed):
    """reflect preserves length and flips the normal component; refract
    satisfies Snell's law for the transmitted direction."""
    rng = np.random.default_rng(seed)
    r = 512
    v = rng.normal(size=(r, 3)).astype(np.float32)
    n = rng.normal(size=(r, 3)).astype(np.float32)
    n /= np.linalg.norm(n, axis=-1, keepdims=True)

    refl = np.asarray(vecmath.reflect(jnp.asarray(v), jnp.asarray(n)))
    np.testing.assert_allclose(
        np.linalg.norm(refl, axis=-1), np.linalg.norm(v, axis=-1), rtol=1e-4
    )
    np.testing.assert_allclose(
        np.sum(refl * n, axis=-1), -np.sum(v * n, axis=-1), rtol=1e-3, atol=1e-4
    )

    # refract: unit incoming, oriented normal against it (vec3.rs:104-109)
    uv = v / np.linalg.norm(v, axis=-1, keepdims=True)
    nn = np.where(np.sum(uv * n, axis=-1, keepdims=True) > 0, -n, n)
    eta = 0.75
    out = np.asarray(vecmath.refract(jnp.asarray(uv), jnp.asarray(nn), eta))
    # Snell: |out x n| = eta * |uv x n| where total internal reflection
    # does not occur (here eta < 1 so never)
    s_in = np.linalg.norm(np.cross(uv, nn), axis=-1)
    s_out = np.linalg.norm(np.cross(out, nn), axis=-1)
    np.testing.assert_allclose(s_out, eta * s_in, rtol=1e-3, atol=1e-4)


@settings(**_SETTINGS)
@given(seed=st.integers(0, 2**31 - 1), n=st.integers(1, 30))
def test_closest_hit_point_on_sphere(seed, n):
    """The hit point o + t*d lies on the winning sphere's surface."""
    scene, rng = _scene_from(seed, n)
    r = 256
    o = rng.uniform(-10, 10, (r, 3)).astype(np.float32)
    d = rng.normal(size=(r, 3)).astype(np.float32)

    res = closest_hit(jnp.asarray(o), jnp.asarray(d), scene)
    hit = np.asarray(res.hit)
    if not hit.any():
        return
    t = np.asarray(res.t)[hit]
    idx = np.asarray(res.idx)[hit]
    p = o[hit] + t[:, None] * d[hit]
    c = np.asarray(scene.centers)[idx]
    rr = np.asarray(scene.radii)[idx]
    dist = np.linalg.norm(p - c, axis=-1)
    np.testing.assert_allclose(dist, rr, rtol=3e-3, atol=3e-3)
