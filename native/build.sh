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
# Measured-reference baseline (needs OpenCV 4.x dev): shared lib for the
# Python parity tests + standalone binary for FPS measurement.
OPENCV_FLAGS="$(pkg-config --cflags --libs opencv4 2>/dev/null || true)"
if [ -n "$OPENCV_FLAGS" ] && g++ -O3 -march=native -fPIC -shared -std=c++17 \
       rso_baseline.cpp -o librso_baseline.so $OPENCV_FLAGS 2>/dev/null; then
  g++ -O3 -march=native -std=c++17 rso_baseline.cpp -o rso_baseline \
      $OPENCV_FLAGS
  echo "built $(pwd)/librso_baseline.so + rso_baseline"
else
  echo "skipped rso_baseline (OpenCV 4 dev not found)"
fi
