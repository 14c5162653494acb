#!/bin/sh
# Build the native runtime shared library.
set -e
cd "$(dirname "$0")"
g++ -O3 -shared -fPIC -std=c++17 -pthread \
    -o ../visionworkbench_tpu/native/libvwtpu_runtime.so vwtpu_runtime.cpp
echo "built visionworkbench_tpu/native/libvwtpu_runtime.so"
