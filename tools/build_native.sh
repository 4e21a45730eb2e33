#!/usr/bin/env bash
# Build the C++ host geometry engine into atlite_tpu/native/libatlite_geom.so
set -euo pipefail
HERE="$(cd "$(dirname "$0")/.." && pwd)"
SRC="$HERE/atlite_tpu/native/geometry.cpp"
OUT="$HERE/atlite_tpu/native/libatlite_geom.so"
g++ -O3 -fPIC -shared -std=c++17 -o "$OUT" "$SRC"
echo "built $OUT"
