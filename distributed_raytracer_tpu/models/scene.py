"""Scene as a structure-of-arrays pytree.

TPU-native replacement for the reference's heap-allocated object graph
(`HittableList` of `Arc<dyn Hittable>`, hittable_list.rs:6-9, each sphere
carrying an `Arc<dyn Material>`, sphere.rs:6-10).  A dyn-trait graph cannot
be traced by XLA; an SoA pytree can — and it makes every scene parameter a
differentiable leaf, which is the whole point of the framework.

Material dispatch (`trait Material::scatter`, material.rs:4-8) becomes an
integer `mat_type` code selected with `jnp.where` in ops/materials.py.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import jax.numpy as jnp
import numpy as np
from flax import struct

# Material type codes — the `jnp.where`-friendly analogue of the reference's
# five Material impls (material.rs:10-123).
LAMBERTIAN = 0  # material.rs:44-57
METAL = 1       # material.rs:71-81
DIELECTRIC = 2  # material.rs:101-123 ("Dialectric" [sic] in the reference)
ABSORB = 3      # DefaultMaterial, always absorbs (material.rs:10-19)
TRANSPARENT = 4  # passes the ray through, white attenuation (material.rs:21-31)


@struct.dataclass
class Scene:
    """All spheres in the scene, SoA.

    Float leaves (centers, radii, albedo, fuzz, ior) are differentiable;
    mat_type is an integer control leaf.
    """

    centers: jnp.ndarray   # [N, 3] f32
    radii: jnp.ndarray     # [N]    f32 (clamped >= 0 at build time, sphere.rs:14)
    albedo: jnp.ndarray    # [N, 3] f32
    mat_type: jnp.ndarray  # [N]    i32
    fuzz: jnp.ndarray      # [N]    f32 (clamped <= 1 at build time, material.rs:66)
    ior: jnp.ndarray       # [N]    f32 (refraction index; 1.0 for non-dielectrics)

    @property
    def num_spheres(self) -> int:
        return self.centers.shape[0]

    def diff_params(self) -> dict:
        """The differentiable leaves, as a dict suitable for jax.grad."""
        return {
            "centers": self.centers,
            "radii": self.radii,
            "albedo": self.albedo,
            "fuzz": self.fuzz,
            "ior": self.ior,
        }

    def with_diff_params(self, params: dict) -> "Scene":
        return self.replace(**params)


class SceneBuilder:
    """Imperative scene construction API.

    Mirrors the ergonomics of `HittableList::add` (hittable_list.rs:29-31) +
    the material constructors, but accumulates into host-side lists and
    freezes into a Scene SoA.
    """

    def __init__(self) -> None:
        self._centers: List[Tuple[float, float, float]] = []
        self._radii: List[float] = []
        self._albedo: List[Tuple[float, float, float]] = []
        self._mat_type: List[int] = []
        self._fuzz: List[float] = []
        self._ior: List[float] = []

    def _add(self, center, radius, albedo, mat_type, fuzz=0.0, ior=1.0) -> "SceneBuilder":
        self._centers.append(tuple(float(c) for c in center))
        self._radii.append(max(float(radius), 0.0))  # sphere.rs:14 clamp
        self._albedo.append(tuple(float(a) for a in albedo))
        self._mat_type.append(int(mat_type))
        self._fuzz.append(min(float(fuzz), 1.0))  # material.rs:66 clamp
        self._ior.append(float(ior))
        return self

    def add_lambertian(self, center, radius, albedo) -> "SceneBuilder":
        return self._add(center, radius, albedo, LAMBERTIAN)

    def add_metal(self, center, radius, albedo, fuzz) -> "SceneBuilder":
        return self._add(center, radius, albedo, METAL, fuzz=fuzz)

    def add_dielectric(self, center, radius, refraction_index) -> "SceneBuilder":
        return self._add(center, radius, (1.0, 1.0, 1.0), DIELECTRIC, ior=refraction_index)

    def add_absorbing(self, center, radius) -> "SceneBuilder":
        return self._add(center, radius, (0.0, 0.0, 0.0), ABSORB)

    def add_transparent(self, center, radius) -> "SceneBuilder":
        return self._add(center, radius, (1.0, 1.0, 1.0), TRANSPARENT)

    def build(self, pad_to: Optional[int] = None) -> Scene:
        """Freeze into a Scene.

        pad_to: optionally pad the sphere axis to a fixed size (e.g. a
        multiple of 128 for Pallas lane alignment, or a multiple of the
        scene-sharding mesh axis).  Padding spheres have radius 0 and the
        ABSORB material; radius 0 gives discriminant h^2 - a*|oc|^2 < 0 for
        every ray not passing exactly through the center, so they never hit.
        """
        n = len(self._centers)
        if n == 0:
            raise ValueError("empty scene")
        m = pad_to if pad_to is not None else n
        if m < n:
            raise ValueError(f"pad_to={m} < num spheres {n}")

        def pad1(lst, fill):
            return np.asarray(list(lst) + [fill] * (m - n))

        # padding spheres sit at the origin with radius 0; intersection code
        # masks radius<=0 spheres out entirely (a far-away pad center would
        # push the quadratic to 1e16-scale values where f32 rounding can
        # flip the discriminant sign on real TPU hardware)
        centers = np.asarray(
            list(self._centers) + [(0.0, 0.0, 0.0)] * (m - n), dtype=np.float32
        )
        return Scene(
            centers=jnp.asarray(centers),
            radii=jnp.asarray(pad1(self._radii, 0.0), dtype=jnp.float32),
            albedo=jnp.asarray(
                np.asarray(list(self._albedo) + [(0.0, 0.0, 0.0)] * (m - n)),
                dtype=jnp.float32,
            ),
            mat_type=jnp.asarray(pad1(self._mat_type, ABSORB), dtype=jnp.int32),
            fuzz=jnp.asarray(pad1(self._fuzz, 0.0), dtype=jnp.float32),
            ior=jnp.asarray(pad1(self._ior, 1.0), dtype=jnp.float32),
        )
