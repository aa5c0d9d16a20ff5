#!/bin/bash
# Full CPU suite with PER-MODULE process isolation, timeout and one
# retry — the round-5 answer to the interpret-mode wedge classes
# (docs/DESIGN.md §18): io_callback-heavy Pallas-interpret programs can
# deadlock the XLA:CPU client nondeterministically (all threads
# futex_wait, CPU frozen) with shape/device-layout-dependent
# probability.  Isolating each test module in its own process bounds the
# blast radius; a wedged module times out and retries once in a fresh
# process (the wedge is probabilistic at suite shapes).
#
#   bash scripts/run_suite.sh            # whole suite
#   DRAY_SUITE_TIMEOUT=900 bash scripts/run_suite.sh
set -u
cd "$(dirname "$0")/.."
TIMEOUT="${DRAY_SUITE_TIMEOUT:-900}"
fail=0
summary=()
for f in tests/test_*.py; do
  for attempt in 1 2; do
    start=$(date +%s)
    timeout "$TIMEOUT" python -m pytest "$f" -q --no-header 2>&1 | tail -2
    rc=${PIPESTATUS[0]}
    el=$(( $(date +%s) - start ))
    if [ "$rc" -eq 0 ] || [ "$rc" -eq 5 ]; then
      # rc=5: no tests collected (e.g. test_tpu_hw under -m "not tpu")
      summary+=("PASS  ${f} (${el}s$([ $attempt -eq 2 ] && echo ', retry'))")
      break
    elif [ "$rc" -eq 124 ] && [ "$attempt" -eq 1 ]; then
      echo "TIMEOUT ${f} after ${el}s — retrying in a fresh process" >&2
    else
      summary+=("FAIL  ${f} (rc=${rc}, ${el}s, attempt ${attempt})")
      fail=1
      break
    fi
  done
done
echo "================ suite summary ================"
printf '%s\n' "${summary[@]}"
exit $fail
