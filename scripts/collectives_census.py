"""Collectives census: what actually crosses the interconnect, per step.

BASELINE's >=85% v5e-16 scaling target cannot be measured in this
environment (one chip behind a tunnel), but it CAN be made auditable:
compile the real sharded programs on a fake 16-device mesh, read every
collective out of the optimized HLO (op, dtype, bytes), and project the
communication time against published v5e ICI rates next to the measured
single-chip step time.  A reviewer can check the arithmetic without a pod.

Usage: FAKE_DEVICES=16 python scripts/collectives_census.py

v5e link model (public: cloud.google.com/tpu/docs/v5e, "How to Scale Your
Model" jax-ml book): each v5e chip has 4 ICI links at 400 Gbps/direction
-> ~4.5e10 B/s per direction per link usable; a v5e-16 is a 4x4 2D torus.
Bidirectional ring all-reduce of S bytes over an axis of n chips moves
2*S*(n-1)/n bytes per chip; with 2 torus axes the two mesh axes reduce
concurrently on disjoint links.
"""

import os
import re
import sys

if os.environ.get("FAKE_DEVICES"):
    os.environ["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={os.environ['FAKE_DEVICES']} "
        + os.environ.get("XLA_FLAGS", "")
    )
import jax

if os.environ.get("FAKE_DEVICES"):
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from distributed_raytracer_tpu.models.presets import rtiow_final_scene  # noqa: E402
from distributed_raytracer_tpu.ops.camera import make_camera  # noqa: E402
from distributed_raytracer_tpu.parallel import (  # noqa: E402
    ShardedRenderer,
    make_mesh,
    make_scene_sharded_grad_fn,
    shard_scene,
)
from distributed_raytracer_tpu.parallel.sharded import make_sharded_grad_fn  # noqa: E402

DTYPE_BYTES = {"f32": 4, "f64": 8, "bf16": 2, "s32": 4, "u32": 4, "pred": 1,
               "f16": 2, "s8": 1, "u8": 1}

# collective HLO ops that ride the interconnect
COLL_RE = re.compile(
    r"(\w[\w.\-]*) = (\S+?)\[([\d,]*)\][^\n]*?"
    r"(all-reduce|all-gather|reduce-scatter|collective-permute|all-to-all)"
    r"(?:-start)?\(", re.M)


def census(compiled) -> dict:
    """Parse collectives out of optimized HLO: {op: (count, bytes)}."""
    txt = compiled.as_text()
    out = {}
    for m in COLL_RE.finditer(txt):
        dtype, shape_s, op = m.group(2), m.group(3), m.group(4)
        shape = [int(x) for x in shape_s.split(",") if x] or [1]
        nbytes = int(np.prod(shape)) * DTYPE_BYTES.get(dtype, 4)
        c, b = out.get(op, (0, 0))
        out[op] = (c + 1, b + nbytes)
    return out


def show(name, comp, per_chip_note=""):
    c = census(comp)
    total = sum(b for _, b in c.values())
    print(f"\n== {name} ==")
    if not c:
        print("  collectives: NONE (embarrassingly parallel)")
    for op, (n, b) in sorted(c.items()):
        print(f"  {op:>20}: {n:3d} ops, {b/1e6:.3f} MB payload")
    print(f"  total payload/step: {total/1e6:.3f} MB {per_chip_note}")
    return total


def main():
    devs = jax.devices()
    n = len(devs)
    print(f"platform={devs[0].platform} devices={n}")
    scene = rtiow_final_scene(seed=0, pad_to=512)
    cam = make_camera(
        aspect_ratio=16 / 9, image_width=1200, samples_per_pixel=4,
        max_depth=50, vfov=20.0, lookfrom=(13.0, 2.0, 3.0),
        lookat=(0.0, 0.0, 0.0), defocus_angle=0.6, focus_dist=10.0,
    )
    spp = 4

    # --- forward render, rays-DP over all devices ---
    mesh = make_mesh()
    r = ShardedRenderer(mesh, cam)
    s = jnp.arange(spp, dtype=jnp.int32)
    key = jax.random.PRNGKey(0)
    comp = r._render.lower(scene, cam, key, s, r.ids).compile()
    fwd_bytes = show(f"forward render, dp x{n}", comp)

    # --- fwd+bwd (scene grads), rays-DP ---
    gmesh = make_mesh()
    gf = make_sharded_grad_fn(gmesh, cam)
    target = jnp.zeros((cam.num_pixels, 3), jnp.float32)
    # grad_fn is a partial over jitted internals; lower via a wrapper jit
    comp2 = jax.jit(
        lambda sc, k, si, tg: gf(sc, k, si, tg)
    ).lower(scene, key, s, target).compile()
    bwd_bytes = show(f"fwd+bwd scene grads, dp x{n}", comp2)

    # --- fwd+bwd on the 2D mesh (rays x scene) ---
    if n >= 4:
        mesh2 = make_mesh(n_scene=2)
        padded = shard_scene(scene, 2)
        gf2 = make_scene_sharded_grad_fn(mesh2, cam, max_depth=8)
        comp3 = jax.jit(
            lambda sc, k, si, tg: gf2(sc, k, si, tg)
        ).lower(padded, key, s, target).compile()
        show(f"fwd+bwd 2D mesh rays x scene ({dict(mesh2.shape)})", comp3)

    # --- projection to v5e-16 (4x4 torus) ---
    print("\n== v5e-16 projection ==")
    # measured single-chip step times (BENCH_r02 / bench.py official):
    fwd_step_ms = 161.43      # 3.24M rays (spp=4 full image) forward
    grad_step_ms = 28.52      # 262,144-ray grad step
    link_bw = 4.5e10          # B/s per direction per link
    ring_n = 4                # one torus axis of a 4x4
    for label, step_ms, payload in (
        ("forward", fwd_step_ms, fwd_bytes),
        ("fwd+bwd", grad_step_ms, bwd_bytes),
    ):
        # all-reduce over 16 chips on a 2D torus: 2*S*(n-1)/n per axis,
        # axes concurrent on disjoint links
        ar_bytes = 2 * payload * (ring_n - 1) / ring_n
        t_comm_ms = ar_bytes / link_bw * 1e3
        eff = step_ms / (step_ms / 1.0 + t_comm_ms)  # per-chip work constant
        print(
            f"  {label}: payload {payload/1e6:.3f} MB -> ring time "
            f"{t_comm_ms:.3f} ms vs step {step_ms:.1f} ms "
            f"-> projected efficiency {100*eff:.2f}%"
        )
    print(
        "  (per-chip work is constant under dp scaling — the image/ray\n"
        "   batch grows with the mesh; the only serial cost is the psum)"
    )


if __name__ == "__main__":
    main()
