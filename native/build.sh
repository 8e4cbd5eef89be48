#!/bin/sh
# Build the native libraries (g++; no cmake needed for these small units).
set -e
cd "$(dirname "$0")"
mkdir -p ../garden_tpu/assets/_native
g++ -O2 -shared -fPIC pack/pack.cpp -lz -o ../garden_tpu/assets/_native/libgardenpack.so
echo "built garden_tpu/assets/_native/libgardenpack.so"
