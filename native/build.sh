#!/bin/bash
# Build the native host libraries (ctypes-loaded by rso.native / rso.io).
set -e
cd "$(dirname "$0")"
g++ -O3 -march=native -fPIC -shared -std=c++17 -pthread \
    rso_native.cpp -o librso_native.so
echo "built $(pwd)/librso_native.so"
# The data-loader links libpng/libjpeg; build it best-effort so the
# dependency-free kernel oracle always ships even on minimal images.
if g++ -O3 -march=native -fPIC -shared -std=c++17 -pthread \
       rso_loader.cpp -o librso_loader.so -lpng -ljpeg -lz 2>/dev/null; then
  echo "built $(pwd)/librso_loader.so"
else
  echo "skipped librso_loader.so (libpng/libjpeg dev headers not found)"
fi
