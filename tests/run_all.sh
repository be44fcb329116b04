#!/bin/bash
# Full test suite in TWO pytest processes.
#
# Why: running every test in one process segfaults the XLA *CPU compiler*
# partway through (Fatal Python error in backend_compile_and_load while
# compiling an ordinary lax.scan) once a few hundred executables have been
# compiled in-process.  Reproduced at multiple commits (including round-2
# heads) and at different victim tests — it is an accumulated-state jaxlib
# issue, not a test bug; no subset of the suite reproduces it.  Splitting
# the slow (interpret-mode Pallas + multi-process) tests into their own
# process keeps both halves comfortably under the threshold.
set -e
cd "$(dirname "$0")/.."
python -m pytest tests/ -q -m "not slow" "$@"
python -m pytest tests/ -q -m "slow" "$@"
