"""Failure injection: SIGKILL a render process mid-run, resume, and the
final image is bit-identical to an uninterrupted run.

This closes the fault-tolerance loop the reference handles with its
retry-forever replica scan (ray_server.rs:62-86): here the worker is
killable at ANY instant because progressive accumulation state is
checkpointed atomically at sample-batch granularity (render/progressive.py).
"""

import os
import signal
import subprocess
import sys
import time

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # subprocess/property tests: minutes, not seconds

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run_cli(args, env):
    return subprocess.Popen(
        [sys.executable, "-m", "distributed_raytracer_tpu.cli", *args],
        env=env,
        stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT,
        text=True,
        cwd=_ROOT,
    )


@pytest.mark.slow
def test_sigkill_resume_bit_identical(tmp_path):
    env = dict(os.environ)
    env["PYTHONPATH"] = _ROOT + os.pathsep + env.get("PYTHONPATH", "")
    ck = str(tmp_path / "kill.ckpt")
    out_resumed = str(tmp_path / "resumed.ppm")
    out_straight = str(tmp_path / "straight.ppm")
    common = ["render", "--config", "config1", "--width", "96", "--spp", "16",
              "--batch", "1", "--cpu", "--seed", "3"]

    # victim: kill as soon as the first checkpoint lands
    p = _run_cli([*common, "--checkpoint", ck, "--out", out_resumed], env)
    deadline = time.time() + 240
    while not os.path.exists(ck) and time.time() < deadline:
        if p.poll() is not None:
            break
        time.sleep(0.1)
    if p.poll() is None:
        os.kill(p.pid, signal.SIGKILL)
        p.wait()
    out = p.stdout.read()
    assert os.path.exists(ck), f"no checkpoint before exit:\n{out}"

    from distributed_raytracer_tpu.render.progressive import AccumState

    mid = AccumState.load(ck)
    assert 0 < mid.samples_done < 16, mid.samples_done

    # resume to completion
    p = _run_cli([*common, "--checkpoint", ck, "--out", out_resumed], env)
    out, _ = p.communicate(timeout=300)
    assert p.returncode == 0, out

    # uninterrupted reference run
    p = _run_cli([*common, "--out", out_straight], env)
    out, _ = p.communicate(timeout=300)
    assert p.returncode == 0, out

    with open(out_resumed, "rb") as f1, open(out_straight, "rb") as f2:
        assert f1.read() == f2.read(), "resumed render differs from uninterrupted"
