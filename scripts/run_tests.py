#!/usr/bin/env python
"""One-command test suite runner: shards tests/ across a few fresh
pytest processes.

Why: the full suite JIT-compiles hundreds of XLA:CPU executables; one
long-lived process accumulates enough native state (~7 GB RSS) to risk an
allocator crash near the end. Sharding into fresh processes keeps every
shard small while the on-disk JAX compilation cache keeps repeat runs fast.
Shards run CONCURRENTLY when the box has cores to spare (up to cpu_count-1
at once) and sequentially on a 1-core box, where parallel jax processes
would thrash.

Usage:
    python scripts/run_tests.py            # whole suite, sharded
    python scripts/run_tests.py -m "not slow"   # extra args pass through
    RADMMM_TEST_JOBS=4 python scripts/run_tests.py   # force concurrency
"""
from __future__ import annotations

import glob
import os
import subprocess
import sys
import tempfile
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
    jobs = int(os.environ.get("RADMMM_TEST_JOBS",
                              max(1, (os.cpu_count() or 1) - 1)))
    jobs = max(1, min(jobs, N_GROUPS))

    shards = [(i + 1, [os.path.relpath(f, ROOT) for f in sorted(g)])
              for i, g in enumerate(g for g in groups if g)]
    t0 = time.time()
    failures = []

    def finish(idx, rel, proc, log):
        rc = proc.wait()
        log.seek(0)
        out = log.read().decode(errors="replace")
        log.close()
        print(f"\n=== shard {idx} (rc={rc}): {len(rel)} file(s) ===")
        print(out, flush=True)
        if rc not in (0, 5):   # 5 = no tests collected (e.g. -m filter)
            failures.append((idx, rel, rc))

    if jobs == 1:
        for idx, rel in shards:
            print(f"\n=== shard {idx}: {len(rel)} file(s) ===", flush=True)
            rc = subprocess.call(
                [sys.executable, "-m", "pytest", "-q", *rel, *extra],
                cwd=ROOT, env=env)
            if rc not in (0, 5):
                failures.append((idx, rel, rc))
    else:
        running: list = []
        pending = list(shards)
        while pending or running:
            while pending and len(running) < jobs:
                idx, rel = pending.pop(0)
                log = tempfile.TemporaryFile()
                proc = subprocess.Popen(
                    [sys.executable, "-m", "pytest", "-q", *rel, *extra],
                    cwd=ROOT, env=env, stdout=log, stderr=subprocess.STDOUT)
                running.append((idx, rel, proc, log))
                print(f"shard {idx} started ({len(rel)} files)", flush=True)
            done = [r for r in running if r[2].poll() is not None]
            if not done:
                time.sleep(1.0)
                continue
            for r in done:
                running.remove(r)
                finish(*r)
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
