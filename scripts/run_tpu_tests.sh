#!/bin/bash
# Hardware test tier: runs the @pytest.mark.tpu assertions on the real chip.
# One TPU process at a time; first compiles of changed kernels can take
# minutes through the remote-compile tunnel (CLAUDE.md).
set -e
cd "$(dirname "$0")/.."
DRAY_TPU_TESTS=1 exec timeout 595 python -m pytest tests/ -m tpu -v "$@"
