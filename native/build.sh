#!/bin/sh
# Build the native data-layer library.
set -e
cd "$(dirname "$0")"
g++ -O3 -fPIC -shared -std=c++17 -Wall -o libtpugs_native.so colmap_io.cpp
echo "built $(pwd)/libtpugs_native.so"
