#!/usr/bin/env bash
# Native-runtime line-coverage pipeline (reference parity:
# /root/reference/scripts/coverage.sh:1-113 drives an llvm-cov flow for
# pie_core; this image ships gcc, so the same pipeline runs on
# gcov/gcc --coverage).
#
# Usage: scripts/coverage.sh [build-dir]
#   1. configures a gcov-instrumented flavor (native/build-cov)
#   2. runs the C++ test suite under ctest
#   3. prints a per-source line-coverage summary and leaves the full
#      .gcov annotations in the build dir
set -euo pipefail

ROOT="$(cd "$(dirname "$0")/.." && pwd)"
NATIVE="$ROOT/native"
BUILD="${1:-$NATIVE/build-cov}"

cmake -S "$NATIVE" -B "$BUILD" -G Ninja \
  -DCMAKE_BUILD_TYPE=Debug -DPIE_COVERAGE=ON >/dev/null
ninja -C "$BUILD" >/dev/null
ctest --test-dir "$BUILD" --output-on-failure

echo
echo "== line coverage (gcov) =="
cd "$BUILD"
total_lines=0
total_exec=0
for obj in CMakeFiles/pie_runtime.dir/src/*.o CMakeFiles/test_*.dir/src/*.o; do
  [ -e "$obj" ] || continue
  gcov -n -o "$(dirname "$obj")" "$obj" 2>/dev/null
done | awk '
  /^File .*\/native\/(src|include)\// { f=$2; keep=1; next }
  /^File/ { keep=0 }
  keep && /^Lines executed:/ {
    gsub(/Lines executed:|%| of /, " ");
    pct=$1; n=$2;
    exec_lines = pct * n / 100.0;
    printf "  %6.2f%%  %5d lines  %s\n", pct, n, f;
    te += exec_lines; tn += n; keep=0
  }
  END { if (tn > 0) printf "  ------\n  %6.2f%%  %5d lines  TOTAL\n", 100.0*te/tn, tn }'
