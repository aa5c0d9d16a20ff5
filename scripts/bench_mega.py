"""Hardware bench: mega-kernel tape forward vs the round-2 production path.

Official round-2 numbers at the 262,144-ray config-4 workload (BENCH_r02):
fwd+bwd 9.21M rays/s (fwd tape ~21 ms + bwd ~7.5 ms).  The mega kernel
targets the ~10 ms of while-loop/refill/glue/pack overhead in the forward
(docs/DESIGN.md §9).  Run: timeout 1700 python scripts/bench_mega.py
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from distributed_raytracer_tpu.grad.tapegrad import make_tape_tracer
from distributed_raytracer_tpu.models.presets import get_config
from distributed_raytracer_tpu.ops.camera import generate_rays


def production_rays(n_rays=262144, seed=0):
    scene, cam = get_config("config5")  # 512-padded final scene
    key = jax.random.PRNGKey(seed)
    stride = max(1, cam.num_pixels // n_rays)
    ids = (jnp.arange(n_rays, dtype=jnp.int32) * stride) % cam.num_pixels
    o, d = generate_rays(cam, key, ids % cam.image_width,
                         ids // cam.image_width)
    return scene, cam, o, d


def timeit(f, *args, reps=5):
    out = jax.block_until_ready(f(*args))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = f(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps, out


def main():
    print("devices:", jax.devices(), flush=True)
    n_rays = 262144
    scene, cam, o, d = production_rays(n_rays)
    depth = cam.max_depth
    key = jax.random.PRNGKey(1)
    g_color = jnp.ones((n_rays, 3), jnp.float32)

    from distributed_raytracer_tpu.grad.tapegrad import _forward_tape_mega

    # trip-count reconnaissance (untimed): how many rows does the private-
    # queue pool actually use?
    _, _, n_it, _ = _forward_tape_mega(scene, o, d, key, depth, 2048)
    print(f"n_it at pool 2048 (worst-case budget): {int(n_it)}", flush=True)

    configs = [
        ("mega", 2048, 640, 2, 512),
        ("mega", 2048, 512, 2, 512),
        ("mega", 2048, 512, 4, 512),
        ("mega", 2048, 512, 2, 1024),
        ("mega", 2048, 512, 2, 2048),
    ]

    for name, pool, budget, pad, br in configs:
        try:
            tracer = make_tape_tracer(
                key, depth, pool=pool, use_mega=True, segsum="matmul",
                budget=budget, mega_pad=pad, block_rays=br,
            )

            fwd = jax.jit(lambda s, oo, dd: tracer(s, oo, dd))

            def loss(s, oo, dd):
                return jnp.sum(tracer(s, oo, dd) * g_color)

            vjp = jax.jit(jax.grad(loss, allow_int=True))

            t_f, col = timeit(fwd, scene, o, d)
            nan = bool(jnp.isnan(col).any())
            t_g, _ = timeit(vjp, scene, o, d)
            print(
                f"{name} pool={pool} budget={budget} pad={pad} br={br}: "
                f"fwd {t_f*1e3:.2f} ms ({n_rays/t_f/1e6:.2f}M rays/s) "
                f"fwd+bwd {t_g*1e3:.2f} ms ({n_rays/t_g/1e6:.2f}M rays/s) "
                f"nan={nan}",
                flush=True,
            )
        except Exception as e:
            print(f"{name} pool={pool} budget={budget} pad={pad} br={br}: "
                  f"FAILED {type(e).__name__}: {e}",
                  flush=True)

    if "--skip-ref" in sys.argv:
        return
    # reference: the round-2 production config
    tracer2 = make_tape_tracer(
        key, depth, pool=2048, use_fused=True, segsum="matmul", budget=768,
        refill_every=2, planar=True,
    )
    f2 = jax.jit(lambda s, oo, dd: tracer2(s, oo, dd))
    vjp2 = jax.jit(jax.grad(
        lambda s, oo, dd: jnp.sum(tracer2(s, oo, dd) * g_color),
        allow_int=True))
    t_f, _ = timeit(f2, scene, o, d)
    t_g, _ = timeit(vjp2, scene, o, d)
    print(
        f"round2 fused pool=2048: fwd {t_f*1e3:.2f} ms "
        f"({n_rays/t_f/1e6:.2f}M) fwd+bwd {t_g*1e3:.2f} ms "
        f"({n_rays/t_g/1e6:.2f}M rays/s)",
        flush=True,
    )


if __name__ == "__main__":
    main()
