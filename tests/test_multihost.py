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
