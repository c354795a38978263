#!/bin/sh
# Build the reference-code oracle shared library for parity tests.
# Sources are compiled directly out of /root/reference (read-only) — nothing
# is copied into this repository.
set -e
REF=${REF:-/root/reference/mlvfs}
OUT=${1:-$(dirname "$0")/liboracle.so}
cc -O2 -fPIC -shared -o "$OUT" \
    -I"$REF" -I"$(dirname "$0")" \
    "$(dirname "$0")/shim.c" \
    "$REF/dng.c" "$REF/hdr.c" "$REF/cs.c" "$REF/stripes.c" \
    "$REF/patternnoise.c" "$REF/histogram.c" "$REF/amaze_demosaic_RT.c" "$REF/lj92.c" \
    "$REF/index.c" "$REF/wav.c" "$REF/gif.c" \
    -lm -lpthread
echo "built $OUT"
