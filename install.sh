#!/usr/bin/env bash
# Install fastqpacker-tpu from this checkout (reference analog: install.sh).
set -euo pipefail
cd "$(dirname "$0")"
python fastqpacker_tpu/runtime/build.py
pip install -e .
echo "installed; try: fqpack -version"
