#!/usr/bin/env python
"""One-command test suite runner: shards tests/ across a few fresh
pytest processes.

Why: the full suite JIT-compiles hundreds of XLA:CPU executables; one
long-lived process accumulates enough native state (~7 GB RSS) to risk an
allocator crash near the end. Sharding into fresh processes keeps every
shard small while the on-disk JAX compilation cache keeps repeat runs fast.
Groups run sequentially (the CI box has one core — parallel jax processes
thrash).

Usage:
    python scripts/run_tests.py            # whole suite, sharded
    python scripts/run_tests.py -m "not slow"   # extra args pass through
"""
from __future__ import annotations

import glob
import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
N_GROUPS = 6


def main() -> int:
    extra = sys.argv[1:]
    files = sorted(glob.glob(os.path.join(ROOT, "tests", "test_*.py")))
    # balance groups by file size (rough proxy for compile/run weight)
    weights = [(os.path.getsize(f), f) for f in files]
    weights.sort(reverse=True)
    groups: list[list[str]] = [[] for _ in range(N_GROUPS)]
    totals = [0] * N_GROUPS
    for w, f in weights:
        i = totals.index(min(totals))
        groups[i].append(f)
        totals[i] += w

    env = {**os.environ}
    env.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_test_cache")

    t0 = time.time()
    failures = []
    for i, group in enumerate(g for g in groups if g):
        rel = [os.path.relpath(f, ROOT) for f in sorted(group)]
        print(f"\n=== shard {i + 1}: {len(rel)} file(s) ===", flush=True)
        rc = subprocess.call(
            [sys.executable, "-m", "pytest", "-q", *rel, *extra],
            cwd=ROOT, env=env)
        if rc == 5:      # no tests collected in this shard (e.g. -m filter)
            continue
        if rc != 0:
            failures.append((i + 1, rel, rc))
    dt = time.time() - t0
    if failures:
        print(f"\nFAILED shards after {dt:.0f}s:")
        for i, rel, rc in failures:
            print(f"  shard {i} (rc={rc}): {' '.join(rel)}")
        return 1
    print(f"\nall shards green in {dt:.0f}s")
    return 0


if __name__ == "__main__":
    sys.exit(main())
