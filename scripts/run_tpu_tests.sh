#!/bin/bash
# Hardware test tier: runs the @pytest.mark.tpu assertions on the real chip.
# One TPU process at a time; first compiles of changed kernels can take
# minutes through the remote-compile tunnel (CLAUDE.md).
set -e
cd "$(dirname "$0")/.."
# -u: per-test lines flush through pipes; caller controls the timeout
# (first compiles of changed kernels can exceed 10 min total — run
# subsets with -k when the tunnel is slow)
DRAY_TPU_TESTS=1 exec python -u -m pytest tests/ -m tpu -v "$@"
