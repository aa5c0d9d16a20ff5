"""Feasibility probes for the pool-iteration mega-kernel (DESIGN §9).

Validates the risky Mosaic constructs in isolation before building the
real kernel:

  P1  SMEM (1,1) scratch persisting across grid steps, written from
      reduced (vector->scalar) values, read in @pl.when conditions
      (the done-flag / emitted-counter pattern).
  P2  sublane-select ray fetch: out[lane] = table[c[lane], lane] via
      (C, B) iota-compare + masked sublane reduce (the private-queue
      refill primitive).
  P3  dense pos accumulation: VMEM output with CONSTANT index map
      revisited/updated across grid steps (replaces the per-ray finish
      scatter entirely).
  P4  scalar SMEM output (n_it) with constant index map.
  P5  bulk unique-index 1-D scatter-set timing at ~1.5M candidate rows
      (the fallback pos design — measured for the record).

Run on the real chip: timeout 595 python scripts/mega_probe.py
"""

import sys
import time

sys.path.insert(0, ".")

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

C, B, T = 16, 1024, 8


def kernel(tab_ref, cin_ref, out_ref, pos_ref, nit_ref, done_ref, cnt_ref):
    it = pl.program_id(0)

    @pl.when(it == 0)
    def _init():
        cnt_ref[0, 0] = 0
        done_ref[0, 0] = 0
        nit_ref[0, 0] = 0
        pos_ref[:] = jnp.full_like(pos_ref, -1)

    @pl.when(done_ref[0, 0] == 0)
    def _active():
        # P2: per-lane row select from the resident table
        c = cin_ref[:] + it  # (1, B) i32, varies per step
        rows = jax.lax.broadcasted_iota(jnp.int32, (C, B), 0)
        sel = (rows == c).astype(jnp.float32)
        picked = jnp.sum(sel * tab_ref[:], axis=0, keepdims=True)  # (1, B)
        out_ref[0] = picked

        # P3: masked dense update of the revisited pos output
        fin = (c % 3) == (it % 3)
        sel_fin = (rows == c) & fin
        val = jnp.full((C, B), it * B, jnp.int32) + jax.lax.broadcasted_iota(
            jnp.int32, (C, B), 1
        )
        pos_ref[:] = jnp.where(sel_fin, val, pos_ref[:])

        # P1: vector->scalar reduce written to SMEM scratch, gating later steps
        n_take = jnp.sum(fin.astype(jnp.int32))
        cnt_ref[0, 0] = cnt_ref[0, 0] + n_take
        nit_ref[0, 0] = it + 1
        done_ref[0, 0] = jnp.where(it >= 5, 1, 0)  # steps 6,7 must be skipped


@functools.partial(jax.jit)
def run(tab, cin):
    return pl.pallas_call(
        kernel,
        grid=(T,),
        in_specs=[
            pl.BlockSpec((C, B), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, B), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, B), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((C, B), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((T, 1, B), jnp.float32),
            jax.ShapeDtypeStruct((C, B), jnp.int32),
            jax.ShapeDtypeStruct((1, 1), jnp.int32),
            jax.ShapeDtypeStruct((1, 1), jnp.int32),
        ],
        scratch_shapes=[pltpu.SMEM((1, 1), jnp.int32)],
    )(tab, cin)


def main():
    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(0)
    tab = jnp.asarray(rng.standard_normal((C, B)), jnp.float32)
    cin = jnp.asarray(rng.integers(0, C - T, (1, B)), jnp.int32)

    out, pos, nit, done = jax.block_until_ready(run(tab, cin))
    out, pos = np.asarray(out)[:, 0], np.asarray(pos)
    cin_np = np.asarray(cin)[0]
    tab_np = np.asarray(tab)

    ok = True
    # P2: rows 0..5 picked tab[c+it, lane]; rows 6..7 skipped (garbage, unchecked)
    for it in range(6):
        want = tab_np[cin_np + it, np.arange(B)]
        if not np.array_equal(out[it], want):
            print(f"P2 FAIL at it={it}", np.abs(out[it] - want).max())
            ok = False
    print("P2 sublane-select fetch:", "OK" if ok else "FAIL")

    # P3: pos[c, lane] = it*B + lane for the LAST it<6 where fin held
    want_pos = np.full((C, B), -1, np.int32)
    for it in range(6):
        c = cin_np + it
        fin = (c % 3) == (it % 3)
        want_pos[c[fin], np.nonzero(fin)[0]] = it * B + np.nonzero(fin)[0]
    p3 = np.array_equal(pos, want_pos)
    print("P3 dense pos accumulation:", "OK" if p3 else "FAIL")

    # P1/P4: done gating -> n_it stopped at 6
    p4 = int(nit[0, 0]) == 6
    print(f"P1/P4 scalar gating: n_it={int(nit[0,0])} (want 6):",
          "OK" if p4 else "FAIL")

    # P5: bulk scatter timing (fallback design, for the record)
    for n in (786_432, 1_572_864):
        r = 262_144
        slot = rng.permutation(n) % (r + 2)
        fin = rng.random(n) < (r / n) * 0.9
        slot = np.where(fin, slot, r + 1).astype(np.int32)
        vals = np.arange(n, dtype=np.int32)

        @jax.jit
        def bulk(slot, vals):
            return jnp.full((r + 2,), -1, jnp.int32).at[slot].set(
                vals, mode="drop", unique_indices=True
            )

        s, v = jnp.asarray(slot), jnp.asarray(vals)
        jax.block_until_ready(bulk(s, v))
        t0 = time.perf_counter()
        for _ in range(10):
            res = bulk(s, v)
        jax.block_until_ready(res)
        dt = (time.perf_counter() - t0) / 10
        print(f"P5 bulk scatter {n} rows: {dt*1e3:.2f} ms "
              f"({dt/n*1e9:.2f} ns/row)")

    print("ALL OK" if (ok and p3 and p4) else "PROBE FAILURES", flush=True)


if __name__ == "__main__":
    main()
