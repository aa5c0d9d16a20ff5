"""Real 2-process jax.distributed test on CPU.

The reference "tests" its fleet by launching 56 tokio tasks in one process
on loopback and eyeballing windows (run_server.rs:23-51).  Here we launch
TWO actual OS processes, each with 2 fake CPU devices, join them with
jax.distributed (coordinator on localhost), render over the resulting
4-device global mesh, and assert the gathered image matches a plain
single-device render of the same program exactly.
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # subprocess/property tests: minutes, not seconds

_WORKER = os.path.join(os.path.dirname(os.path.abspath(__file__)), "_multihost_worker.py")


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_render_matches_single(tmp_path):
    coordinator = f"127.0.0.1:{_free_port()}"
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # workers set their own fake-device count
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = root + os.pathsep + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen(
            [sys.executable, _WORKER, coordinator, "2", str(pid), str(tmp_path)],
            env=env,
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=300)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out}"
        assert f"worker {pid} ok" in out

    multi = np.load(tmp_path / "multi.npy")
    single = np.load(tmp_path / "single.npy")
    assert multi.shape == single.shape
    # same program, same seed: the sharded forward has no cross-device
    # reductions, so the match is exact
    np.testing.assert_array_equal(multi, single)


@pytest.mark.slow
def test_render_dist_cli_two_process(tmp_path):
    """The fleet launch as ONE command (run_server.rs:23-51 parity): the
    SAME `render-dist` CLI invocation runs on two processes, joins via
    jax.distributed, and process 0 writes ONE image byte-identical to a
    single-process run of the same command."""
    import sys as _sys

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

    def run_cli(extra_env, out_path, fake_devices):
        env = dict(os.environ)
        env.pop("XLA_FLAGS", None)
        env["XLA_FLAGS"] = (
            f"--xla_force_host_platform_device_count={fake_devices}"
        )
        env["PYTHONPATH"] = root + os.pathsep + env.get("PYTHONPATH", "")
        env.update(extra_env)
        return subprocess.Popen(
            [_sys.executable, "-m", "distributed_raytracer_tpu.cli",
             "render-dist", "--config", "config1", "--cpu", "--spp", "2",
             "--width", "48", "--batch", "2", "--out", out_path],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True,
        )

    # single-process reference (2 fake devices)
    single_out = str(tmp_path / "single.ppm")
    p = run_cli({}, single_out, fake_devices=2)
    out, _ = p.communicate(timeout=300)
    assert p.returncode == 0, out
    assert os.path.exists(single_out)

    # 2-process job, 2 fake devices each -> 4-device global mesh
    coordinator = f"127.0.0.1:{_free_port()}"
    multi_out = str(tmp_path / "multi.ppm")
    procs = [
        run_cli(
            {"JAX_COORDINATOR_ADDRESS": coordinator,
             "JAX_NUM_PROCESSES": "2", "JAX_PROCESS_ID": str(pid)},
            multi_out, fake_devices=2,
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        try:
            o, _ = p.communicate(timeout=300)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(o)
    for pid, (p, o) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {pid} failed:\n{o}"
    # exactly one writer: only process 0 announced the file
    assert sum("wrote" in o for o in outs) == 1, outs

    with open(single_out, "rb") as f:
        single_bytes = f.read()
    with open(multi_out, "rb") as f:
        multi_bytes = f.read()
    # the sharded forward is pure data-parallel per-pixel math (no
    # cross-device reductions), so the 4-device 2-process image matches
    # the single-process one byte-for-byte
    assert single_bytes == multi_bytes


@pytest.mark.slow
def test_render_dist_cli_mega_mesh_size_invariant(tmp_path):
    """`render-dist --engine mega` runs the PRODUCTION mega render kernel
    per device inside shard_map (on CPU: the Pallas interpreter).  Draws
    are keyed by GLOBAL (rid, depth), so an 8-fake-device mesh writes a
    PPM byte-identical to a 1-device run of the same command — the
    distributed layer drives the real kernel (ray_server.rs:46-106 parity)
    with zero estimator drift."""
    import sys as _sys

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

    def run_cli(out_path, fake_devices):
        env = dict(os.environ)
        env.pop("XLA_FLAGS", None)
        env["XLA_FLAGS"] = (
            f"--xla_force_host_platform_device_count={fake_devices}"
        )
        env["PYTHONPATH"] = root + os.pathsep + env.get("PYTHONPATH", "")
        p = subprocess.Popen(
            [_sys.executable, "-m", "distributed_raytracer_tpu.cli",
             "render-dist", "--config", "config1", "--cpu", "--spp", "2",
             "--width", "48", "--batch", "1", "--engine", "mega",
             "--out", out_path],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True,
        )
        out, _ = p.communicate(timeout=540)
        assert p.returncode == 0, out
        assert "[mega]" in out, out
        return out

    one_out = str(tmp_path / "one.ppm")
    eight_out = str(tmp_path / "eight.ppm")
    run_cli(one_out, fake_devices=1)
    run_cli(eight_out, fake_devices=8)
    with open(one_out, "rb") as f:
        one_bytes = f.read()
    with open(eight_out, "rb") as f:
        eight_bytes = f.read()
    assert one_bytes == eight_bytes
