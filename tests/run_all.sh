#!/bin/bash
# Full test suite in THREE pytest processes.
#
# Why: running too many tests in one process segfaults the XLA *CPU
# compiler* partway through (Fatal Python error in
# backend_compile_and_load while compiling an ordinary lax.scan) once a
# few hundred executables have been compiled in-process.  Reproduced at
# multiple commits (including round-2 heads) and at different victim
# tests — it is an accumulated-state jaxlib issue, not a test bug; no
# subset of the suite reproduces it.  Round 4 the growing non-slow half
# crossed the threshold again, so it is now split alphabetically; the
# slow (interpret-mode Pallas + multi-process) tests keep their own
# process.
set -e
cd "$(dirname "$0")/.."
python -m pytest tests/test_[a-m]*.py -q -m "not slow" "$@"
python -m pytest tests/test_[n-z]*.py -q -m "not slow" "$@"
python -m pytest tests/ -q -m "slow" "$@"
