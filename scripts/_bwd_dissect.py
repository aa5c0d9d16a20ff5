"""Attribute the tape backward's while-loop self time: toggle pieces of
one_row off (monkeypatched) and time raw-grad at the official config."""
import sys, os, time
sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp
import numpy as np
from distributed_raytracer_tpu.grad import tapegrad
from distributed_raytracer_tpu.models.presets import final_scene_camera, rtiow_final_scene
from distributed_raytracer_tpu.ops.camera import generate_rays

scene = rtiow_final_scene(seed=0, pad_to=512)
camera = final_scene_camera(image_width=1200, spp=500)
n_rays = 262144
w = camera.image_width
ids = jnp.asarray(np.arange(n_rays, dtype=np.int64) * camera.num_pixels // n_rays, jnp.int32)
o, d = jax.block_until_ready(generate_rays(camera, jax.random.PRNGKey(0), ids % w, ids // w))
g_color = jnp.ones((n_rays, 3), jnp.float32)

def timeit(f, *args, reps=6):
    out = jax.block_until_ready(f(*args))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = f(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps

# variant knob via env-less monkeypatch: wrap _backward_tape
orig_bwd = tapegrad._backward_tape

def run(label, **patch):
    import functools
    def patched(scene, tape, n_it, pos, g_color, segsum="scatter",
                planar=False, unroll=1):
        return orig_bwd(scene, tape, n_it, pos, g_color, segsum, planar,
                        unroll, **patch)
    tapegrad._backward_tape = patched if patch else orig_bwd
    tracer = tapegrad.make_tape_tracer(
        jax.random.PRNGKey(1), camera.max_depth, pool=2048, use_mega=True,
        segsum="matmul", budget=704)
    f = jax.jit(jax.grad(lambda s: jnp.sum(tracer(s, o, d) * g_color), allow_int=True))
    t = timeit(f, scene)
    print(f"{label}: {t*1e3:.2f} ms ({n_rays/t/1e6:.2f}M rays/s)", flush=True)
    tapegrad._backward_tape = orig_bwd

run("baseline (unroll 2)")
