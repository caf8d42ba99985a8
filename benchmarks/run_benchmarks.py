"""Benchmark runner with baseline comparison + regression gating.

Reference parity: scripts/benchmarks.py workflow (runner -> analyzer ->
reporter with baseline comparison and --fail-on-regression for CI,
reference benchmarks/cpp/README.md:62-70).

Usage:
  python benchmarks/run_benchmarks.py                 # run, print report
  python benchmarks/run_benchmarks.py --save-baseline # snapshot baseline
  python benchmarks/run_benchmarks.py --fail-on-regression [--threshold 0.1]
"""

from __future__ import annotations

import argparse
import json
import re
import subprocess
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parents[1]
BASELINE = Path(__file__).parent / "baseline.json"
RESULTS = Path(__file__).parent / "results.json"


def run_allocator_bench() -> dict[str, float]:
    """Native page-allocator microbenchmarks (ms, lower is better)."""
    build = ROOT / "native" / "build"
    exe = build / "bench_page_allocator"
    if not exe.exists():
        subprocess.run(
            ["cmake", "-B", "build", "-G", "Ninja"], cwd=ROOT / "native",
            check=True, capture_output=True,
        )
        subprocess.run(
            ["ninja", "-C", "build"], cwd=ROOT / "native", check=True,
            capture_output=True,
        )
    out = subprocess.run(
        [str(exe)], capture_output=True, text=True, check=True, timeout=600
    ).stdout
    metrics: dict[str, float] = {}
    for line in out.splitlines():
        m = re.match(r"(.+?):\s+([0-9.]+) ms", line.strip())
        if m:
            key = "alloc_" + re.sub(r"\s+", "_", m.group(1).strip())
            metrics[key] = float(m.group(2))
    return metrics


def run_decode_bench() -> dict[str, float]:
    """End-to-end decode benchmark (tok/s, higher is better)."""
    out = subprocess.run(
        [sys.executable, str(ROOT / "bench.py")], capture_output=True,
        text=True, timeout=2400,
    ).stdout
    for line in out.splitlines():
        if line.startswith("{"):
            d = json.loads(line)
            return {d["metric"] + "_tok_s": float(d["value"])}
    return {}


HIGHER_IS_BETTER = re.compile(r"tok_s$")


def compare(results: dict, baseline: dict, threshold: float):
    regressions = []
    report = []
    for k, v in sorted(results.items()):
        if k not in baseline:
            report.append(f"  NEW       {k} = {v:.3f}")
            continue
        b = baseline[k]
        if b == 0:
            continue
        if HIGHER_IS_BETTER.search(k):
            delta = (v - b) / b
        else:
            delta = (b - v) / b  # lower is better: positive = improvement
        tag = "OK  "
        if delta < -threshold:
            tag = "REGR"
            regressions.append(k)
        report.append(
            f"  {tag}      {k} = {v:.3f} (baseline {b:.3f}, {delta:+.1%})"
        )
    return report, regressions


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--save-baseline", action="store_true")
    ap.add_argument("--fail-on-regression", action="store_true")
    ap.add_argument("--threshold", type=float, default=0.10)
    ap.add_argument("--skip-decode", action="store_true",
                    help="allocator benchmarks only (no TPU needed)")
    args = ap.parse_args()

    results: dict[str, float] = {}
    results.update(run_allocator_bench())
    if not args.skip_decode:
        results.update(run_decode_bench())

    RESULTS.write_text(json.dumps(results, indent=2))
    print(f"wrote {RESULTS}")

    if args.save_baseline:
        BASELINE.write_text(json.dumps(results, indent=2))
        print(f"baseline saved to {BASELINE}")
        return 0

    if BASELINE.exists():
        baseline = json.loads(BASELINE.read_text())
        report, regressions = compare(results, baseline, args.threshold)
        print("\n".join(report))
        if regressions and args.fail_on_regression:
            print(f"REGRESSIONS: {regressions}")
            return 1
    else:
        for k, v in sorted(results.items()):
            print(f"  {k} = {v:.3f}")
        print("(no baseline; run with --save-baseline to create one)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
