#!/bin/bash
# Regenerate the committed PGO profiles in native/pgo.
#
# The profile is collected from the DEFAULT build tree (native/build) so
# the path-mangled .gcda names match what -fprofile-use looks for in
# regular builds.  Training workload: the 1080p CABAC + 640p CAVLC
# entropy benches and the HEVC inter entropy suite — the host-serial
# loops that bound throughput.
set -e
cd "$(dirname "$0")/../.."
PGO=native/pgo
rm -rf "$PGO"
cd native/build
cmake -DCMAKE_CXX_FLAGS="-fprofile-generate=$(pwd)/../pgo" . > /dev/null
ninja -t clean > /dev/null && ninja > /dev/null
cd ../..
LIB=native/build/libhwang_native.so
HWANG_NATIVE_LIB=$PWD/$LIB EB_ONLY=1080 python tools/entbench.py
HWANG_NATIVE_LIB=$PWD/$LIB EB_ONLY=640 python tools/entbench.py
HWANG_NATIVE_LIB=$PWD/$LIB python -m pytest -q \
    tests/test_hevc_inter.py tests/test_hevc_entropy.py \
    tests/test_software_decode.py 2>&1 | tail -1
# restore the normal configuration (picks up -fprofile-use via
# CMakeLists now that native/pgo exists)
cd native/build
cmake -DCMAKE_CXX_FLAGS= . > /dev/null
ninja -t clean > /dev/null && ninja > /dev/null
echo "PGO profiles written to $PGO"
