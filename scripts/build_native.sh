#!/usr/bin/env bash
# Fresh-clone native build + tests: configures a CLEAN build dir, builds the
# pie_runtime shared library and all ctest binaries, and runs the 3 C++
# suites. Guards against the stale-build-dir failure mode where ctest
# reports "Not Run" because test binaries were never (re)built.
set -euo pipefail
cd "$(dirname "$0")/../native"
BUILD=${1:-build}
cmake -S . -B "$BUILD" -G Ninja -DCMAKE_BUILD_TYPE=Release
cmake --build "$BUILD" --parallel
ctest --test-dir "$BUILD" --output-on-failure
