#!/bin/sh
# Build libfastimage.so (native JPEG decode+resize for the host pipeline).
# Auto-invoked on first use by iisan_tpu/data/fastimage.py; also runnable
# standalone.  Requires g++ and libjpeg (headers: jpeglib.h).
set -e
cd "$(dirname "$0")"
g++ -O2 -shared -fPIC -std=c++17 -o libfastimage.so fastimage.cc -ljpeg -lpthread
echo "built $(pwd)/libfastimage.so"
