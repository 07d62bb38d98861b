#!/bin/bash
# Build the reference Tengine C library out-of-tree (the mount is read-only).
# Produces /tmp/tengine-build/source/libtengine-lite.so and tm_benchmark,
# which unlock tests/test_reference_parity.py (golden cross-validation of our
# tmfiles + numerics against the real C implementation) and same-host
# baseline measurements.
set -e
BUILD=${1:-/tmp/tengine-build}
cmake -S /root/reference -B "$BUILD" -DCMAKE_BUILD_TYPE=Release \
    -DTENGINE_ONLINE_REPORT=OFF -DTENGINE_BUILD_BENCHMARK=ON \
    -DTENGINE_BUILD_EXAMPLES=OFF -DTENGINE_BUILD_TESTS=OFF
make -C "$BUILD" -j"$(nproc)"
echo "built: $BUILD/source/libtengine-lite.so"
