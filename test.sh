#!/bin/sh
# Test-matrix runner — the analog of the reference's test.sh (which builds
# the C++ tree and runs every *_test binary plus the python suite). Here
# the native runtime is built on first import and the whole matrix is
# pytest; the suite runs on a virtual 8-device CPU mesh so the multi-chip
# sharding tests need no TPU hardware.
#
# Usage: ./test.sh [extra pytest args]
#   SPM_TPU_DISABLE_NATIVE=1 ./test.sh   # pure-Python fallback row
set -e
cd "$(dirname "$0")"
python -m pytest tests/ -x -q "$@"
