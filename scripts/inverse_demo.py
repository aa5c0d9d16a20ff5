"""Inverse-rendering demo (BASELINE config 5): recover scene albedos from a
target image by gradient descent, writing before/target/after artifacts.

Usage: python scripts/inverse_demo.py [--steps 150] [--out artifacts/]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=150)
    ap.add_argument("--out", default="artifacts")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from distributed_raytracer_tpu.grad import InverseRenderer, render_diff
    from distributed_raytracer_tpu.models.presets import config2
    from distributed_raytracer_tpu.ops.camera import make_camera
    from distributed_raytracer_tpu.render.image import write_ppm
    from distributed_raytracer_tpu.render.renderer import render_image

    os.makedirs(args.out, exist_ok=True)
    scene, _ = config2()
    cam = make_camera(
        aspect_ratio=16 / 9, image_width=160, samples_per_pixel=8, max_depth=8,
    )

    # target: the true scene
    target_img = render_image(scene, cam, seed=7, spp=32)
    write_ppm(os.path.join(args.out, "inverse_target.ppm"), target_img)
    target = render_diff(
        scene, cam, jax.random.PRNGKey(123), jnp.arange(8, dtype=jnp.int32)
    )

    # start: scrambled albedos
    rng = np.random.default_rng(5)
    start = scene.replace(
        albedo=jnp.clip(
            jnp.asarray(rng.random(scene.albedo.shape), jnp.float32), 0.05, 0.95
        )
    )
    write_ppm(
        os.path.join(args.out, "inverse_start.ppm"),
        render_image(start, cam, seed=7, spp=32),
    )

    inv = InverseRenderer(
        start, cam, target, fields=("albedo",), learning_rate=3e-2, spp_per_step=4
    )
    for i in range(args.steps):
        loss = inv.step()
        if i % 20 == 0 or i == args.steps - 1:
            mae = float(jnp.abs(inv.scene.albedo - scene.albedo).mean())
            print(f"step {i:4d}  loss {loss:.6f}  albedo MAE {mae:.4f}", flush=True)

    recovered_img = render_image(inv.scene, cam, seed=7, spp=32)
    write_ppm(os.path.join(args.out, "inverse_recovered.ppm"), recovered_img)

    # report recovery on IDENTIFIABLE parameters only: the dielectric's
    # albedo never touches the image (attenuation is white, material.rs:104),
    # so its gradient is zero and it stays at its random init by design.
    from distributed_raytracer_tpu.models.scene import DIELECTRIC

    ident = np.asarray(scene.mat_type) != DIELECTRIC
    mae = lambda s: float(
        jnp.abs(s.albedo[ident] - scene.albedo[ident]).mean()
    )
    img_rmse = float(np.sqrt(((recovered_img - target_img) ** 2).mean()))
    print(
        f"identifiable-albedo MAE: {mae(inv.scene):.4f} (start {mae(start):.4f}); "
        f"recovered-vs-target image RMSE: {img_rmse:.4f}"
    )


if __name__ == "__main__":
    main()
