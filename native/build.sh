#!/bin/sh
# Build the native CPU solver backend (libtpuqp.so).
set -e
cd "$(dirname "$0")"
g++ -O3 -march=native -std=c++17 -shared -fPIC ldl.cpp solver.cpp -o libtpuqp.so
echo "built $(pwd)/libtpuqp.so"
