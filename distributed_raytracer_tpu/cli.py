"""Command-line interface.

The reference has three binaries with zero flags (main.rs, run_server.rs,
run_client.rs — everything hard-coded).  This CLI covers their roles:

  render      — the monolithic renderer (main.rs) with progressive PPM
                snapshots standing in for the minifb window, plus
                checkpoint/resume.
  render-dist — the fleet (run_server.rs + run_client.rs): mesh-sharded
                render over all visible devices.
  grad-check  — finite-difference spot check of dL/dscene.
  invert      — inverse rendering demo (BASELINE config 5).
"""

from __future__ import annotations

import argparse
import os
import sys
import time


def _add_common(p):
    p.add_argument("--config", default="config1", help="preset name (config1..config5)")
    p.add_argument("--scene", default=None, metavar="FILE",
                   help="user-authored scene file (.json or .npz, "
                        "models/scene_io.py schema); overrides the preset "
                        "scene, and its camera too when the file has one "
                        "(the reference's arbitrary-scene ingestion, "
                        "messages.rs:41-94 / client.rs:18-50)")
    p.add_argument("--spp", type=int, default=None, help="override samples per pixel")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--batch", type=int, default=16, help="samples per device program")
    p.add_argument("--out", default=None, help="output .ppm path")
    p.add_argument("--width", type=int, default=None, help="override image width")
    p.add_argument("--cpu", action="store_true", help="force CPU backend")


def _setup_backend(args):
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    return jax


def _load(args):
    from distributed_raytracer_tpu.models.presets import get_config

    if getattr(args, "scene", None):
        from distributed_raytracer_tpu.models.scene_io import load_scene

        scene, file_cam = load_scene(args.scene)
        # camera: the file's if it carries one, else the preset's (so
        # --config still chooses image size/spp defaults for camera-less
        # scene files); --width/--spp flags below override either way
        cam = file_cam if file_cam is not None else get_config(args.config)[1]
    else:
        scene, cam = get_config(args.config)
    if args.width:
        from distributed_raytracer_tpu.ops.camera import make_camera

        cam = make_camera(
            aspect_ratio=cam.image_width / cam.image_height,
            image_width=args.width,
            samples_per_pixel=cam.samples_per_pixel,
            max_depth=cam.max_depth,
            vfov=float(cam.vfov),
            lookfrom=tuple(float(x) for x in cam.lookfrom),
            lookat=tuple(float(x) for x in cam.lookat),
            vup=tuple(float(x) for x in cam.vup),
            defocus_angle=float(cam.defocus_angle),
            focus_dist=float(cam.focus_dist),
        )
    if args.spp:
        cam = cam.replace(samples_per_pixel=args.spp)
    return scene, cam


def _resolve_engine(args, jax):
    """auto -> the fused production path on TPU, scan on CPU; the
    deprecated --wavefront/--pallas flags map onto the engine names."""
    engine = args.engine
    if args.accel == "culled":
        # culled works on wavefront (block-culled intersect), fused (the
        # culled fused bounce — walk + shade in one kernel), and mega (the
        # mega WALK kernel: the walk inside the whole-render program)
        if engine == "auto":
            if args.wavefront:
                return "wavefront"
            on_tpu = jax.devices()[0].platform != "cpu"
            return "mega" if on_tpu else "wavefront"
        if engine not in ("wavefront", "fused", "mega"):
            print(
                f"[cli] --accel culled requires a wavefront engine; "
                f"overriding --engine {engine}",
                file=sys.stderr,
            )
            return "wavefront"
        return engine
    if engine == "auto":
        if args.wavefront:
            return "wavefront"
        on_tpu = jax.devices()[0].platform != "cpu"
        # mega = the forward production path (one Pallas program per image
        # sample); render_progressive falls back to fused when the scene or
        # image exceeds the kernel's single-chunk/VMEM limits
        return "mega" if on_tpu else "scan"
    return engine


def _job_config(args, engine):
    """The effective RenderJobConfig for this invocation — serialized next
    to checkpoints/outputs for reproducibility."""
    from distributed_raytracer_tpu.utils.config import RenderJobConfig

    return RenderJobConfig(
        preset=args.config,
        scene_path=getattr(args, "scene", None),
        seed=args.seed,
        spp=args.spp,
        batch=args.batch,
        checkpoint_path=args.checkpoint,
        output=args.out,
        engine=engine,
        fill=args.fill,
    )


def cmd_render(args):
    jax = _setup_backend(args)
    from distributed_raytracer_tpu.render.image import write_ppm
    from distributed_raytracer_tpu.render.progressive import render_progressive
    from distributed_raytracer_tpu.utils.metrics import RenderMetrics

    scene, cam = _load(args)
    engine = _resolve_engine(args, jax)
    if args.sanitize:
        from distributed_raytracer_tpu.utils.sanitize import preflight

        print("[sanitize] checkified fwd+grad pre-flight...", file=sys.stderr)
        preflight(scene, cam, seed=args.seed)
        print("[sanitize] clean; rendering under jax_debug_nans",
              file=sys.stderr)
        jax.config.update("jax_debug_nans", True)
    intersect_fn = None
    culled = None
    if args.accel == "culled":
        from distributed_raytracer_tpu.ops.pallas.culled_kernel import (
            build_culled_scene,
            make_culled_intersect,
        )

        culled = build_culled_scene(scene, chunk=256 if engine == "mega" else 128)
        scene = culled.scene  # reordered so material gathers line up
        if engine not in ("fused", "mega"):
            # wavefront engine: culled block-culled intersect_fn; the
            # fused/mega engines instead take the CulledScene itself (the
            # walk runs INSIDE the bounce kernel / the mega row body)
            intersect_fn = make_culled_intersect(culled)
            culled = None

    job = _job_config(args, engine)
    if args.checkpoint:
        with open(args.checkpoint + ".json", "w") as f:
            f.write(job.to_json())

    metrics = RenderMetrics()
    out = args.out or f"{args.config}.ppm"
    t0 = time.time()

    display = None
    if args.display:
        from distributed_raytracer_tpu.render.display import LiveDisplay

        display = LiveDisplay(
            cam.image_width, cam.image_height,
            port=args.display_port, spp_total=cam.samples_per_pixel,
        ).start()
        print(f"live view: {display.url}", file=sys.stderr)

    # fault injection (SURVEY §5: chaos between sample batches): fire ONCE
    # per job — a marker file next to the checkpoint/output makes the fault
    # one-shot so a supervised restart can run through
    chaos_mode, chaos_at = (None, 0)
    if args.chaos:
        chaos_mode, chaos_at = args.chaos.split(":")
        chaos_at = int(chaos_at)
    chaos_marker = (args.checkpoint or out) + ".chaos"

    def progress(state):
        metrics.samples_done = state.samples_done
        metrics.add_rays(cam.num_pixels * args.batch)
        el = time.time() - t0
        print(
            f"sample {state.samples_done}/{cam.samples_per_pixel} "
            f"({cam.num_pixels * state.samples_done / el:,.0f} rays/s) [{engine}]",
            file=sys.stderr,
        )
        if args.heartbeat:
            with open(args.heartbeat, "w") as f:
                f.write(str(state.samples_done))
        if args.snapshot_every and state.samples_done % args.snapshot_every == 0:
            write_ppm(out, state.mean_image())
        if display is not None:
            display.progress_cb()(state)
        if chaos_mode and state.samples_done >= chaos_at and not os.path.exists(
            chaos_marker
        ):
            with open(chaos_marker, "w") as f:
                f.write(chaos_mode)
            if chaos_mode == "crash":
                print("chaos: crashing", file=sys.stderr)
                os._exit(13)
            elif chaos_mode == "hang":
                print("chaos: hanging", file=sys.stderr)
                time.sleep(3600)

    fill_cb = None
    if args.fill == "shuffled" and (args.snapshot_every or display is not None):
        def fill_cb(img):
            # mid-batch repaint while the shuffled fill streams in — the
            # reference's per-pixel-sample converge-on-screen behavior
            # (colors.rs:26-46) at chunk granularity
            if args.snapshot_every:
                write_ppm(out, img)
            if display is not None:
                display.update(img, spp_done=0)

    # block culling needs frustum-coherent ray blocks to skip work
    ray_order = "tiled" if args.accel == "culled" else "row"

    with metrics.phase("render"):
        state = render_progressive(
            scene,
            cam,
            seed=args.seed,
            spp=cam.samples_per_pixel,
            batch=args.batch,
            checkpoint_path=args.checkpoint,
            resume=not args.no_resume,
            progress_cb=progress,
            engine=engine,
            use_pallas=args.pallas,
            intersect_fn=intersect_fn,
            fill=args.fill,
            fill_chunk=args.fill_chunk,
            fill_cb=fill_cb,
            ray_order=ray_order,
            resort_every=args.resort,
            culled=culled,
        )
    write_ppm(out, state.mean_image())
    metrics.report()
    print(f"wrote {out} [engine={engine}]", file=sys.stderr)
    if display is not None:
        display.update(state.mean_image(), spp_done=state.samples_done)
        if args.display_linger:
            print(f"final frame at {display.url} — ctrl-c to exit", file=sys.stderr)
            try:
                while True:
                    time.sleep(1)
            except KeyboardInterrupt:
                pass
        display.close()


def cmd_supervise(args):
    from distributed_raytracer_tpu.utils.supervise import Supervisor

    child = args.child
    if child and child[0] == "--":
        child = child[1:]
    hb = None
    for i, a in enumerate(child):
        if a == "--heartbeat" and i + 1 < len(child):
            hb = child[i + 1]
        elif a.startswith("--heartbeat="):
            hb = a.split("=", 1)[1]
    sup = Supervisor(
        child,
        heartbeat=hb,
        stall_timeout=args.stall_timeout,
        max_restarts=args.max_restarts,
        startup_grace=args.startup_grace,
    )
    res = sup.run()
    print(
        f"supervise: exit {res.exit_code} after {res.restarts} restart(s) "
        f"({','.join(res.events)})",
        file=sys.stderr,
    )
    sys.exit(res.exit_code)


def cmd_render_dist(args):
    # One command launches/joins the whole fleet (the run_server.rs:23-51
    # role): every process runs THIS same command; jax.distributed supplies
    # membership (no multicast discovery).  initialize() must precede any
    # backend query; _setup_backend only touches config flags, so it is
    # safe (and required, for --cpu) to run first.
    jax = _setup_backend(args)
    from distributed_raytracer_tpu.parallel import multihost

    multihost.initialize(
        coordinator_address=args.coordinator,
        num_processes=args.num_processes,
        process_id=args.process_id,
    )
    p0 = jax.process_index() == 0

    from distributed_raytracer_tpu.parallel import ShardedRenderer, make_mesh
    from distributed_raytracer_tpu.render.image import write_ppm

    import numpy as np

    scene, cam = _load(args)
    mesh = make_mesh(n_scene=args.scene_shards)
    spp = cam.samples_per_pixel

    # engine: the PRODUCTION kernels run per-device inside shard_map (the
    # reference's ray servers each drive their own rays' bounce loops with
    # the real kernel, ray_server.rs:46-106 + object_server.rs:34-38 —
    # not a slow stand-in).  auto = mega on TPU, scan on CPU.
    on_cpu = jax.devices()[0].platform == "cpu"
    engine = args.engine
    if engine == "auto":
        engine = "scan" if on_cpu else "mega"
    if engine != "scan" and args.scene_shards > 1:
        print(
            "[render-dist] --scene-shards > 1 runs the 2D scan path; "
            f"--engine {engine} ignored",
            file=sys.stderr,
        )
        engine = "scan"
    mega_walk = False
    if engine == "mega":
        from distributed_raytracer_tpu.ops.pallas.mega_render_kernel import (
            mega_render_supported,
        )
        from distributed_raytracer_tpu.ops.pallas.mega_walk_kernel import (
            mega_walk_supported,
        )

        if not mega_render_supported(scene, cam.num_pixels):
            if mega_walk_supported(cam.num_pixels) and not on_cpu:
                # multi-chunk scene: the mega WALK engine per device shard
                # (TPU only — the walk's in-kernel DMA does not terminate
                # under a partitioned interpret shard_map)
                mega_walk = True
            else:
                print(
                    "[render-dist] mega engine unsupported for this "
                    "workload; falling back to fused",
                    file=sys.stderr,
                )
                engine = "fused"
    if engine == "fused" and on_cpu and len(jax.devices()) > 1:
        # interpret-mode Pallas inside a while_loop under a PARTITIONED
        # shard_map never completes on the fake CPU backend (measured; the
        # mega engine's scan/cond structure is fine) — fused-dp is a
        # TPU-only path, validated in the hardware tier
        print(
            "[render-dist] the fused engine under a multi-device CPU mesh "
            "runs the Pallas interpreter inside while_loop+shard_map, "
            "which does not terminate on this backend; using scan",
            file=sys.stderr,
        )
        engine = "scan"

    if engine in ("mega", "fused"):
        import contextlib

        import jax.numpy as jnp

        from distributed_raytracer_tpu.parallel import (
            make_fused_dp_render,
            make_mega_dp_render,
        )
        from distributed_raytracer_tpu.parallel.sharded import (
            make_mega_walk_dp_render,
        )

        # CPU runs (CI / fake-device meshes) execute the kernels in the
        # Pallas interpreter — same program, same bits for the mega engine
        if on_cpu:
            from jax.experimental.pallas import tpu as pltpu

            interp = pltpu.force_tpu_interpret_mode
        else:
            interp = contextlib.nullcontext

        key = jax.random.PRNGKey(args.seed)
        acc = None
        with interp():
            if engine == "mega":
                if mega_walk:
                    from distributed_raytracer_tpu.ops.pallas.mega_walk_kernel import (
                        walk_pack_for,
                    )

                    pack = walk_pack_for(scene, cam, chunk=256)
                    walk_render = jax.jit(
                        make_mega_walk_dp_render(mesh, pack, cam)
                    )
                    render = lambda sc, bs_, cs_, s_: walk_render(bs_, cs_, s_)
                else:
                    render = jax.jit(make_mega_dp_render(mesh, cam))
                # seeds derived exactly like render_wavefront_sum_mega, and
                # batches carry ABSOLUTE sample indices: the image is
                # bit-identical across mesh size AND batch split
                bs = jnp.asarray(
                    jax.random.randint(key, (), 0, 2**31 - 1), jnp.int32
                )
                cs = jnp.asarray(
                    jax.random.randint(
                        jax.random.fold_in(key, 0xCA3), (), 0, 2**31 - 1
                    ),
                    jnp.int32,
                )
                done = 0
                while done < spp:
                    nb = min(args.batch, spp - done)
                    s = jnp.arange(done, done + nb, dtype=jnp.int32)
                    part = render(scene, bs, cs, s)
                    acc = part if acc is None else acc + part
                    done += nb
                    if p0:
                        print(f"samples {done}/{spp} [mega]", file=sys.stderr)
            else:
                render = jax.jit(make_fused_dp_render(mesh, cam),
                                 static_argnums=2)
                done = 0
                while done < spp:
                    nb = min(args.batch, spp - done)
                    part = render(scene, jax.random.fold_in(key, done), nb)
                    acc = part if acc is None else acc + part
                    done += nb
                    if p0:
                        print(f"samples {done}/{spp} [fused]", file=sys.stderr)
            img = (multihost.gather_image(acc)[: cam.num_pixels] / spp).reshape(
                cam.image_height, cam.image_width, 3
            )
        out = args.out or f"{args.config}_dist.ppm"
        if p0:
            write_ppm(out, img)
            print(
                f"wrote {out} (mesh {dict(mesh.shape)}, engine {engine}, "
                f"{jax.process_count()} process(es))",
                file=sys.stderr,
            )
        return

    if args.scene_shards > 1:
        # run the fully 2D-sharded path (rays x scene)
        import jax.numpy as jnp

        from distributed_raytracer_tpu.parallel import (
            make_scene_sharded_render,
            shard_scene,
        )
        from distributed_raytracer_tpu.parallel.mesh import RAYS_AXIS, pad_to_multiple

        from jax.sharding import NamedSharding
        from jax.sharding import PartitionSpec as P

        from distributed_raytracer_tpu.parallel.mesh import SCENE_AXIS

        padded = shard_scene(scene, args.scene_shards)
        # place inputs as GLOBAL arrays (put_global works 1 process -> pod;
        # plain host arrays are only auto-accepted when fully replicated)
        padded = jax.tree.map(
            lambda x: multihost.put_global(
                np.asarray(x), NamedSharding(mesh, P(SCENE_AXIS))
            ),
            padded,
        )
        render = make_scene_sharded_render(mesh, cam)
        n = cam.num_pixels
        m = pad_to_multiple(n, mesh.shape[RAYS_AXIS])
        ids = multihost.put_global(
            np.r_[np.arange(n), np.zeros(m - n)].astype(np.int32),
            NamedSharding(mesh, P(RAYS_AXIS)),
        )
        key = jax.random.PRNGKey(args.seed)
        acc = None
        # sample batches scanned INSIDE the sharded program: ceil(spp/batch)
        # dispatches, not one per sample
        done = 0
        while done < spp:
            nb = min(args.batch, spp - done)
            s = jnp.arange(done, done + nb, dtype=jnp.int32)
            part = render(padded, key, s, ids)
            acc = part if acc is None else acc + part
            done += nb
            if p0:
                print(f"samples {done}/{spp}", file=sys.stderr)
        # gather BEFORE slicing: under multi-process the accumulator is not
        # fully addressable and host slicing would throw
        img = (multihost.gather_image(acc)[:n] / spp).reshape(
            cam.image_height, cam.image_width, 3
        )
    else:
        import jax.numpy as jnp

        r = ShardedRenderer(mesh, cam)
        key = jax.random.PRNGKey(args.seed)
        acc = None
        done = 0
        while done < spp:
            nb = min(args.batch, spp - done)
            s = jnp.arange(done, done + nb, dtype=jnp.int32)
            out = r.render_sample_sum_padded(scene, key, s)
            acc = out if acc is None else acc + out
            done += nb
            if p0:
                print(f"samples {done}/{spp}", file=sys.stderr)
        img = (multihost.gather_image(acc)[: cam.num_pixels] / spp).reshape(
            cam.image_height, cam.image_width, 3
        )
    # ONE image, written once (the client's role, client.rs:104-121):
    # every process computed/gathered the same global result
    out = args.out or f"{args.config}_dist.ppm"
    if p0:
        write_ppm(out, img)
        print(
            f"wrote {out} (mesh {dict(mesh.shape)}, "
            f"{jax.process_count()} process(es))",
            file=sys.stderr,
        )


def cmd_grad_check(args):
    _setup_backend(args)
    import jax
    import jax.numpy as jnp

    from distributed_raytracer_tpu.grad import render_diff, scene_grads

    scene, cam = _load(args)
    cam = cam.replace(samples_per_pixel=min(cam.samples_per_pixel, 4))
    key = jax.random.PRNGKey(args.seed)
    s = jnp.arange(4, dtype=jnp.int32)
    target = render_diff(scene, cam, jax.random.PRNGKey(args.seed + 1), s)
    loss, grads = scene_grads(scene, cam, key, s, target)
    print(f"loss: {float(loss):.6f}", file=sys.stderr)
    for k, g in grads.items():
        import numpy as np

        g = np.asarray(g)
        print(f"  d/d{k}: |g|={np.abs(g).max():.3e} finite={np.all(np.isfinite(g))}",
              file=sys.stderr)


def cmd_invert(args):
    _setup_backend(args)
    import jax
    import jax.numpy as jnp
    import numpy as np

    from distributed_raytracer_tpu.grad import InverseRenderer, render_diff

    scene, cam = _load(args)
    cam = cam.replace(samples_per_pixel=4)
    target = render_diff(
        scene, cam, jax.random.PRNGKey(123), jnp.arange(8, dtype=jnp.int32)
    )
    rng = np.random.default_rng(args.seed)
    start = scene.replace(
        albedo=jnp.clip(
            scene.albedo + jnp.asarray(rng.normal(0, 0.2, scene.albedo.shape), jnp.float32),
            0.05,
            0.95,
        )
    )
    inv = InverseRenderer(start, cam, target, fields=("albedo",), learning_rate=2e-2)
    for i in range(args.steps):
        loss = inv.step()
        if i % 10 == 0:
            print(f"step {i}: loss {loss:.6f}", file=sys.stderr)
    err = float(jnp.abs(inv.scene.albedo - scene.albedo).mean())
    print(f"final albedo MAE: {err:.4f}", file=sys.stderr)


def cmd_export_scene(args):
    from distributed_raytracer_tpu.models.presets import get_config
    from distributed_raytracer_tpu.models.scene_io import save_scene

    scene, cam = get_config(args.config)
    save_scene(args.out, scene, None if args.no_camera else cam)
    print(f"wrote {args.out} ({scene.num_spheres} spheres)", file=sys.stderr)


class _NoAbbrevParser(argparse.ArgumentParser):
    """argparse with prefix abbreviations disabled: the --job precedence
    logic detects explicitly-typed flags by scanning argv for exact
    '--flag'/'--flag=' tokens, so an abbreviated flag (e.g. '--check' for
    '--checkpoint') would parse but evade detection and get silently
    overridden by the job-file value (review finding)."""

    def __init__(self, *a, **kw):
        kw.setdefault("allow_abbrev", False)
        super().__init__(*a, **kw)


def main(argv=None):
    ap = _NoAbbrevParser(prog="distributed_raytracer_tpu")
    sub = ap.add_subparsers(dest="cmd", required=True,
                            parser_class=_NoAbbrevParser)

    p = sub.add_parser("render", help="single-device progressive render")
    _add_common(p)
    p.add_argument("--job", default=None,
                   help="RenderJobConfig JSON file (flags given on the "
                        "command line still win)")
    p.add_argument("--checkpoint", default=None, help="checkpoint path for resume")
    p.add_argument("--no-resume", action="store_true")
    p.add_argument("--snapshot-every", type=int, default=0,
                   help="write progressive ppm every N samples")
    p.add_argument("--engine",
                   choices=["auto", "scan", "wavefront", "fused", "mega"],
                   default="auto",
                   help="auto = mega render kernel on TPU (one Pallas "
                        "program per image sample; falls back to fused when "
                        "the scene/image exceeds its limits), scan on CPU; "
                        "all engines support checkpoint/resume")
    p.add_argument("--fill", choices=["row", "shuffled"], default="row",
                   help="shuffled = sample-0 progressive fill-in in shuffled "
                        "pixel order (CameraRayIterator parity)")
    p.add_argument("--fill-chunk", type=int, default=16384,
                   help="pixels per shuffled-fill chunk = the live repaint "
                        "granularity (the reference repaints per pixel "
                        "sample, colors.rs:26-46; small chunks approach "
                        "that at a host-roundtrip cost per chunk)")
    p.add_argument("--wavefront", action="store_true",
                   help="(deprecated) same as --engine wavefront")
    p.add_argument("--pallas", action="store_true",
                   help="Pallas intersect kernel for the wavefront engine (TPU)")
    p.add_argument("--accel", choices=["none", "culled"], default="none",
                   help="acceleration structure (culled = Morton block-"
                        "culled front-to-back walk; works on the wavefront "
                        "AND fused engines)")
    p.add_argument("--resort", type=int, default=0, metavar="K",
                   help="re-sort wavefront lanes every K pool iterations "
                        "(secondary-ray coherence for --accel culled; 0 = off)")
    p.add_argument("--display", action="store_true",
                   help="serve a live progressive view over HTTP (the "
                        "reference's minifb window, client.rs:79-121)")
    p.add_argument("--display-port", type=int, default=8642,
                   help="port for --display (0 = ephemeral)")
    p.add_argument("--display-linger", action="store_true",
                   help="keep serving the final frame after the render ends")
    p.add_argument("--sanitize", action="store_true",
                   help="sanitizer tier (SURVEY §5): checkified forward+"
                        "gradient pre-flight on a small ray batch (catches "
                        "NaN/inf at the producing op, masked or not), then "
                        "render under jax_debug_nans")
    p.add_argument("--heartbeat", default=None, metavar="PATH",
                   help="touch PATH every progress step (stall detection "
                        "for `supervise`)")
    p.add_argument("--chaos", default=None, metavar="MODE:N",
                   help="fault injection: crash:N / hang:N fires once when "
                        "N samples are done (one-shot via a marker file)")
    p.set_defaults(fn=cmd_render)

    p = sub.add_parser(
        "supervise",
        help="run a render under failure detection: restart on death, "
             "kill+restart on heartbeat stall (the reference's per-RPC "
             "timeout/failover, ray_server.rs:62-86, at process scope)")
    p.add_argument("--max-restarts", type=int, default=5)
    p.add_argument("--stall-timeout", type=float, default=None,
                   help="seconds of heartbeat silence before kill+restart "
                        "(requires --heartbeat in the child args)")
    p.add_argument("--startup-grace", type=float, default=None,
                   help="stall window before an attempt's FIRST beat "
                        "(startup = imports + jit compile; default "
                        "4x --stall-timeout)")
    p.add_argument("child", nargs=argparse.REMAINDER,
                   help="-- render <flags...> (include --checkpoint)")
    p.set_defaults(fn=cmd_supervise)

    p = sub.add_parser(
        "render-dist",
        help="mesh-sharded render (all devices; run the SAME command on "
             "every process of a multi-process job — the run_server.rs "
             "fleet launch as one CLI)")
    _add_common(p)
    p.add_argument("--engine", choices=["auto", "scan", "fused", "mega"],
                   default="auto",
                   help="per-device engine inside shard_map: mega/fused = "
                        "the production Pallas kernels on every device's "
                        "pixel shard (mega is bit-identical to the single-"
                        "device render — mesh size is a pure perf knob); "
                        "scan = the GSPMD masked-scan path.  auto = mega "
                        "on TPU, scan on CPU")
    p.add_argument("--scene-shards", type=int, default=1,
                   help="shard the sphere axis over this many devices")
    p.add_argument("--coordinator", default=None, metavar="HOST:PORT",
                   help="jax.distributed coordinator (or set "
                        "JAX_COORDINATOR_ADDRESS); omit for single-process")
    p.add_argument("--num-processes", type=int, default=None,
                   help="processes in the job (or JAX_NUM_PROCESSES)")
    p.add_argument("--process-id", type=int, default=None,
                   help="this process's id (or JAX_PROCESS_ID)")
    p.set_defaults(fn=cmd_render_dist)

    p = sub.add_parser(
        "export-scene",
        help="write a preset scene (+ its camera) to a .json/.npz scene "
             "file — authoring starting point for `render --scene`")
    p.add_argument("--config", default="config4",
                   help="preset to export (config1..config5)")
    p.add_argument("--no-camera", action="store_true",
                   help="omit the camera section")
    p.add_argument("out", help="output path (.json or .npz)")
    p.set_defaults(fn=cmd_export_scene)

    p = sub.add_parser("grad-check", help="dL/dscene sanity check")
    _add_common(p)
    p.set_defaults(fn=cmd_grad_check)

    p = sub.add_parser("invert", help="inverse-rendering demo")
    _add_common(p)
    p.add_argument("--steps", type=int, default=100)
    p.set_defaults(fn=cmd_invert)

    args = ap.parse_args(argv)
    if getattr(args, "job", None):
        # job file supplies DEFAULTS; a flag the user actually typed wins.
        # Default-value comparison cannot tell `--batch 16` from an omitted
        # --batch, so explicitness is detected from the argv tokens.
        from distributed_raytracer_tpu.utils.config import RenderJobConfig

        tokens = list(argv) if argv is not None else list(sys.argv[1:])

        def typed(flag):
            return any(a == flag or a.startswith(flag + "=") for a in tokens)

        with open(args.job) as f:
            job = RenderJobConfig.from_json(f.read())
        if not typed("--config") and job.preset:
            args.config = job.preset
        for attr, flag, jval in (
            ("scene", "--scene", job.scene_path),
            ("seed", "--seed", job.seed), ("spp", "--spp", job.spp),
            ("batch", "--batch", job.batch),
            ("checkpoint", "--checkpoint", job.checkpoint_path),
            ("out", "--out", job.output), ("engine", "--engine", job.engine),
            ("fill", "--fill", job.fill),
        ):
            if not typed(flag) and jval is not None:
                setattr(args, attr, jval)
    args.fn(args)


if __name__ == "__main__":
    main()
