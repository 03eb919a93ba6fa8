"""Pre-warm the persistent XLA compile cache with bench.py's EXACT programs.

VERDICT r3 #1: two of three rounds lost their driver perf capture to cold
compiles on the remote TPU tunnel (25 s .. 15+ min variance, utils/cache.py).
The persistent cache keys on (program HLO, backend, compile options, jax
version) — all identical between this process and the driver's `python
bench.py` — so warming the cache by literally running bench.py once makes
the driver run hit compiled executables.

Run this after ANY change to compute-path code, then keep the verification
output: it re-runs bench.py in a second fresh process and asserts the
first-step compile is cache-hit fast.

Usage:  python tools/prewarm_bench.py [--skip-verify]
"""
from __future__ import annotations

import os
import re
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_bench(budget_s: int, tag: str) -> tuple[float, float | None]:
    env = dict(os.environ, BENCH_BUDGET_S=str(budget_s))
    t0 = time.time()
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        capture_output=True, text=True, env=env, cwd=REPO,
        timeout=budget_s + 120,
    )
    wall = time.time() - t0
    sys.stderr.write(proc.stderr)
    print(f"[{tag}] rc={proc.returncode} wall={wall:.1f}s "
          f"stdout={proc.stdout.strip()!r}")
    m = re.search(r"first step \(compile\): ([0-9.]+)s", proc.stderr)
    compile_s = float(m.group(1)) if m else None
    return wall, compile_s


def main() -> int:
    print("pass 1: populate cache (unbounded-ish budget)")
    _, compile1 = run_bench(budget_s=3600, tag="warm")
    if compile1 is not None:
        print(f"pass 1 first-step compile: {compile1:.1f}s")

    if "--skip-verify" in sys.argv:
        return 0

    print("pass 2: verify a FRESH process hits the cache")
    _, compile2 = run_bench(budget_s=3600, tag="verify")
    if compile2 is None:
        print("FAIL: could not parse compile time from verify pass")
        return 1
    print(f"pass 2 first-step compile: {compile2:.1f}s")
    if compile2 > 60.0:
        print(f"FAIL: verify-pass compile {compile2:.1f}s > 60s — the "
              "driver's fresh process would NOT hit the cache")
        return 1
    print("OK: cache hit confirmed — driver bench will start warm")
    return 0


if __name__ == "__main__":
    sys.exit(main())
