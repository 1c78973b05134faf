#!/bin/sh
# Build the native loader: csrc/build.sh [outdir]
set -e
cd "$(dirname "$0")"
OUT="${1:-.}"
g++ -O3 -shared -fPIC -std=c++17 -o "$OUT/libptloader.so" ptloader.cpp -ljpeg -lpng
echo "built $OUT/libptloader.so"
