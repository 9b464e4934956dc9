#!/bin/bash
# Build the native host library (ctypes-loaded by rso.native).
set -e
cd "$(dirname "$0")"
g++ -O3 -march=native -fPIC -shared -std=c++17 -pthread \
    rso_native.cpp -o librso_native.so
echo "built $(pwd)/librso_native.so"
