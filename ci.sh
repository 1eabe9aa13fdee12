#!/bin/bash
# CI entry point (the reference's jenkins-ci-build.sh is build-only; ours
# builds the native runtime and runs the full test suite + a bench smoke).
set -euo pipefail
cd "$(dirname "$0")"
make -C native
python -m pytest tests/ -q
echo "CI OK"
