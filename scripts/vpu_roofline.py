"""Fused-bounce kernel utilization — the MFU statement.

The path tracer's hot kernel is VPU-bound (elementwise sphere quadratics;
no matmuls by design — a ray_d @ centers.T formulation flips hits at bf16
precision, docs/DESIGN.md §3), so "MFU" here is utilization of the VECTOR
unit's issue capacity, not the MXU.

Measurement: fused_bounce chained inside ONE jitted fori_loop (d feeds
back), timed as the marginal cost between 8 and 40 repetitions — per-call
tunnel/launch latency cancels, and the resulting per-bounce time matches
the per-iteration kernel time in the production wavefront's profiler
trace (scripts/trace_summary.py) to within a few percent.

Capacity model (v5e): the VPU is an (8 sublanes x 128 lanes) vector unit
with 4 ALUs per lane-slice at ~0.94 GHz => 8*128*4*0.94e9 ~= 3.85e12
vector-op issue slots/s.  The sweep spends ~31 VPU ops per ray x sphere
test (quadratic + winner select; sqrt/div counted as ONE slot each, so
utilization is understated).  A first-principles FMA microbenchmark is
deliberately NOT used: dependent-chain probes get collapsed by the
compiler (measured "2400 TFLOP/s") and teach nothing.

Run on hardware:  timeout 595 python scripts/vpu_roofline.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

VPU_ISSUE_SLOTS_PER_SEC = 8 * 128 * 4 * 0.94e9  # v5e, see module docstring
OPS_PER_TEST = 21
# per ray x sphere, SWEEP ONLY (winner-attribute selection rides the MXU
# since the bf16x3 one-hot matmul): oc (3) + h fma (3) + c_q fma+sub (4) +
# disc (2) + cmp (1) + sqrt (1) + roots (4) + t select (3)


def _timed(fn, *args, iters=10, reps=3):
    from distributed_raytracer_tpu.utils.metrics import timed_best

    return timed_best(fn, *args, iters=iters, reps=reps)


def main():
    from distributed_raytracer_tpu.models.presets import rtiow_final_scene
    from distributed_raytracer_tpu.ops.pallas.bounce_kernel import fused_bounce

    scene = rtiow_final_scene(seed=0, pad_to=512)
    n = scene.num_spheres
    b = int(os.environ.get("DRAY_ROOFLINE_POOL", "8192"))
    key = jax.random.PRNGKey(0)
    o = jax.random.normal(key, (b, 3))
    d = o / jnp.linalg.norm(o, axis=-1, keepdims=True)
    live = jnp.ones((b,), bool)

    def chain_k(reps):
        @jax.jit
        def k(o, d, live):
            def body(i, od):
                o, d = od
                r = fused_bounce(o, d, live, scene, jnp.int32(7) + i)
                return o + 1e-9 * r.new_o, d + 1e-9 * r.new_d

            return jax.lax.fori_loop(0, reps, body, (o, d))

        return k

    # long chains: the r2-r1 marginal must dwarf the per-dispatch tunnel
    # jitter (±1 ms observed), which at r2-r1=32 once produced an
    # impossible 224%-of-VPU reading
    r1, r2 = 20, 220
    dt = (_timed(chain_k(r2), o, d, live) - _timed(chain_k(r1), o, d, live)) / (
        r2 - r1
    )
    tests = b * n
    rate = tests / dt
    ops = rate * OPS_PER_TEST
    util = ops / VPU_ISSUE_SLOTS_PER_SEC
    print(
        f"fused_bounce @ pool {b}: {dt*1e6:.1f} us/bounce, "
        f"{tests/1e6:.1f}M sphere tests -> {rate/1e9:.1f} G tests/s "
        f"~= {ops/1e12:.2f} T vector-ops/s "
        f"= {util*100:.0f}% of the v5e VPU's ~3.85T issue slots/s"
    )


if __name__ == "__main__":
    main()
