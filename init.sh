#!/usr/bin/env bash
# Build the native host-preprocessing extension in place.
# Reference counterpart: SamvitJ/Accel init.sh (builds lib/ Cython/CUDA
# extensions; SURVEY.md §3.5).
set -e
cd "$(dirname "$0")"
python accel_tpu/native/setup.py
echo "native extension built:"
python -c "from accel_tpu.native import available; print('  available =', available())"
