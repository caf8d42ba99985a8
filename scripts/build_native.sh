#!/usr/bin/env bash
# Fresh-clone native build + tests: configures a CLEAN build dir, builds the
# pie_runtime shared library and all ctest binaries, and runs the 3 C++
# suites. Guards against the stale-build-dir failure mode where ctest
# reports "Not Run" because test binaries were never (re)built.
#
# Usage:
#   scripts/build_native.sh                # Release build + ctest
#   scripts/build_native.sh build-tsan thread   # TSan flavor (§5.2)
#   scripts/build_native.sh build-asan address  # ASan+UBSan flavor
set -euo pipefail
cd "$(dirname "$0")/../native"
BUILD=${1:-build}
SANITIZE=${2:-}
cmake -S . -B "$BUILD" -G Ninja -DCMAKE_BUILD_TYPE=Release \
  ${SANITIZE:+-DPIE_SANITIZE=$SANITIZE}
cmake --build "$BUILD" --parallel
ctest --test-dir "$BUILD" --output-on-failure
