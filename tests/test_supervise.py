"""Failure DETECTION: the supervisor notices a crashed or hung render
child, restarts it from its checkpoint, and the final image is
bit-identical to an uninterrupted run.

Extends tests/test_failure_injection.py (externally SIGKILLed worker +
manual resume) with the detection half the reference implements as
per-RPC timeouts + replica failover (ray_server.rs:62-86,
distributed_common.rs:64): death and heartbeat-stall detection, bounded
restarts, automatic resume.
"""

import os
import subprocess
import sys

import pytest

pytestmark = pytest.mark.slow  # subprocess/property tests: minutes, not seconds

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(args, timeout):
    env = dict(os.environ)
    env["PYTHONPATH"] = _ROOT + os.pathsep + env.get("PYTHONPATH", "")
    return subprocess.run(
        [sys.executable, "-m", "distributed_raytracer_tpu.cli", *args],
        env=env,
        cwd=_ROOT,
        capture_output=True,
        text=True,
        timeout=timeout,
    )


def _common(tmp_path, name):
    return [
        "render", "--config", "config1", "--width", "64", "--spp", "8",
        "--batch", "1", "--cpu", "--seed", "3",
        "--out", str(tmp_path / f"{name}.ppm"),
    ]


@pytest.mark.slow
def test_supervisor_restarts_crashed_child(tmp_path):
    ck = str(tmp_path / "c.ckpt")
    r = _run(
        ["supervise", "--max-restarts", "2", "--",
         *_common(tmp_path, "crash"), "--checkpoint", ck,
         "--chaos", "crash:3"],
        timeout=600,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert "exit:13" in r.stderr and "after 1 restart" in r.stderr, r.stderr[-800:]

    straight = _run(_common(tmp_path, "straight"), timeout=600)
    assert straight.returncode == 0, straight.stderr[-2000:]
    a = (tmp_path / "crash.ppm").read_bytes()
    b = (tmp_path / "straight.ppm").read_bytes()
    assert a == b, "supervised+restarted render differs from uninterrupted"


@pytest.mark.slow
def test_supervisor_kills_hung_child_on_heartbeat_stall(tmp_path):
    ck = str(tmp_path / "h.ckpt")
    hb = str(tmp_path / "beat")
    r = _run(
        ["supervise", "--max-restarts", "2", "--stall-timeout", "15", "--",
         *_common(tmp_path, "hang"), "--checkpoint", ck,
         "--heartbeat", hb, "--chaos", "hang:3"],
        timeout=600,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert "stall" in r.stderr and "after 1 restart" in r.stderr, r.stderr[-800:]
    assert os.path.exists(tmp_path / "hang.ppm")


def test_supervisor_gives_up_after_max_restarts(tmp_path):
    from distributed_raytracer_tpu.utils.supervise import Supervisor

    msgs = []
    sup = Supervisor(
        ["definitely-not-a-subcommand"], max_restarts=1, poll=0.05,
        log=msgs.append,
    )
    res = sup.run()
    assert res.exit_code != 0
    assert res.restarts == 1
    assert all(e.startswith("exit:") for e in res.events)


def test_stall_requires_heartbeat():
    from distributed_raytracer_tpu.utils.supervise import Supervisor

    with pytest.raises(ValueError):
        Supervisor(["render"], stall_timeout=5.0)


def test_startup_grace_tolerates_slow_start_then_detects_stall(tmp_path, monkeypatch):
    """A child that takes longer than stall_timeout to produce its FIRST
    beat (imports + jit compile) must not be killed during startup; once
    it has beaten and then hangs, the strict stall_timeout applies."""
    import time

    from distributed_raytracer_tpu.utils.supervise import Supervisor

    hb = str(tmp_path / "beat")
    # child: silent for 1.2s (startup), beat, then hang forever
    code = (
        "import sys,time; time.sleep(1.2); "
        f"open({hb!r},'w').write('x'); time.sleep(60)"
    )
    sup = Supervisor(
        ["--checkpoint", "unused"],  # silences the no-checkpoint warning
        heartbeat=hb,
        stall_timeout=0.5,
        startup_grace=10.0,
        max_restarts=0,
        poll=0.05,
    )
    monkeypatch.setattr(
        Supervisor, "_spawn",
        lambda self: subprocess.Popen([sys.executable, "-c", code]),
    )
    t0 = time.time()
    res = sup.run()
    took = time.time() - t0
    # survived the 1.2s silent startup (grace), killed ~0.5s after the beat
    assert res.events == ["stall"], res.events
    assert 1.2 < took < 8.0, took
