#!/bin/bash
# Full test suite, ONE pytest process PER TEST MODULE, with crash detection.
#
# Why not one process: running too many tests in one process segfaults the
# XLA *CPU compiler* partway through (Fatal Python error in
# backend_compile_and_load while compiling an ordinary lax.scan) once a few
# hundred executables have been compiled in-process.  Reproduced at multiple
# commits and at different victim tests — an accumulated-state jaxlib issue,
# not a test bug; no subset of the suite reproduces it.
#
# Why per-module (round 5, VERDICT r4 item 7 "suite fragility by design"):
# the previous alphabetical three-way split could silently re-cross the
# in-process compile threshold as files grow, and with `set -e` a mid-bucket
# segfault lost the remaining buckets' results.  Per-module processes keep
# every module far below the threshold, a crash (signal exit >= 128) is
# detected and reported per module, and the runner always finishes the whole
# suite before exiting nonzero on any failure.
#
# Usage: bash tests/run_all.sh [extra pytest args]
#   RUN_ALL_JOBS=N   run N module processes concurrently (default 1; the
#                    multi-process distributed tests spawn their own workers,
#                    so keep modest)
set -u
cd "$(dirname "$0")/.."

jobs="${RUN_ALL_JOBS:-1}"
fail=0
summary=()

run_one() {
    local label="$1"; shift
    local out
    out=$("$@" 2>&1)
    local rc=$?
    local tail_line
    tail_line=$(echo "$out" | grep -E "[0-9]+ (passed|failed|error|skipped|deselected)" | tail -1)
    if [ $rc -eq 0 ]; then
        echo "OK    $label  ${tail_line:-}"
    elif [ $rc -eq 5 ]; then
        echo "OK    $label  (no tests selected)"
        rc=0
    elif [ $rc -ge 128 ]; then
        echo "CRASH $label  (signal $((rc - 128)))"
        echo "$out" | tail -20
    else
        echo "FAIL  $label  ${tail_line:-rc=$rc}"
        echo "$out" | tail -40
    fi
    return $rc
}

pids=()
labels=()
rcs_dir=$(mktemp -d)
trap 'rm -rf "$rcs_dir"' EXIT

launch() {
    local label="$1"; shift
    if [ "$jobs" -gt 1 ]; then
        ( run_one "$label" "$@"; echo $? > "$rcs_dir/${label//\//_}" ) &
        pids+=($!)
        labels+=("$label")
        while [ "$(jobs -rp | wc -l)" -ge "$jobs" ]; do wait -n || true; done
    else
        run_one "$label" "$@"
        echo $? > "$rcs_dir/${label//\//_}"
    fi
}

for f in tests/test_*.py; do
    launch "$(basename "$f")" python -m pytest "$f" -q -m "not slow" "$@"
done
# slow tests (interpret-mode Pallas, multi-process): still one module each
for f in tests/test_*.py; do
    if grep -q "pytest.mark.slow\|pytestmark.*slow" "$f"; then
        launch "slow:$(basename "$f")" python -m pytest "$f" -q -m "slow" "$@"
    fi
done
wait || true

for rc_file in "$rcs_dir"/*; do
    [ -f "$rc_file" ] || continue
    rc=$(cat "$rc_file")
    if [ "$rc" != "0" ]; then
        fail=1
        echo "NONZERO: $(basename "$rc_file") rc=$rc"
    fi
done

if [ $fail -eq 0 ]; then
    echo "run_all: ALL MODULES PASSED"
else
    echo "run_all: FAILURES DETECTED (see above)"
fi
exit $fail
