#!/usr/bin/env bash
# Build the recommenders-addons-tpu wheel (no network, no build isolation).
#
# Parity: the reference ships a setup.py + bazel build driven by
# tools/testing/build_and_run_tests.sh; here the package is pure Python +
# one bundled C++ source (native/host_kv.cc) compiled lazily on first use
# (native/build.py), so a plain setuptools wheel is the whole story.
#
# Usage: tools/build_wheel.sh [outdir]   (default: dist/)
set -euo pipefail
cd "$(dirname "$0")/.."
OUT="${1:-dist}"
python -m build --wheel --no-isolation --outdir "$OUT"
ls -l "$OUT"/recommenders_addons_tpu-*.whl
