"""Probe whether host->device uploads can overlap device compute on this
runtime — the mechanism behind bench.py's `train_e2e_overlap_frac`.

Three timings, one ~compute-bound jitted matmul chain C (~0.3 s device
time) and one ~20 MB host buffer U (the size of a stacked K-group):

  1. compute_s       — dispatch C(x), fetch a scalar of the result.
  2. upload_s        — device_put(U), fetch one element of it.
  3. overlapped_s    — dispatch C(x), then immediately device_put(U)
                       from the SAME thread, fetch both. If the runtime
                       can interleave transfer RPCs with an in-flight
                       execute, overlapped_s ~= max(compute_s, upload_s);
                       if the tunnel serializes RPCs, ~= compute_s +
                       upload_s.

All timings force completion with SCALAR FETCHES, not block_until_ready:
on the axon relay block_until_ready can return before the RPC actually
completes (measured: a 20 MB device_put "blocked" in 0.14 s whose data
landed 90 s later; see bench.py's timing-methodology note).

overlap_capable = (compute_s + upload_s - overlapped_s) / min(compute_s,
upload_s): 1.0 = full overlap possible, 0.0 = the runtime serializes, and
bench.py's zero overlap_frac is a property of the harness tunnel, not of
the prefetch pipeline (on PCIe hosts device_put is DMA and overlaps
trivially).

Usage: python scripts/probe_relay_overlap.py
"""
import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def median(f, n=3):
    ts = []
    for _ in range(n):
        ts.append(f())
    return float(np.median(ts))


def main():
    # compute-bound: repeated matmul, ~0.3 s on a v5e-class chip
    n, iters = 4096, 120

    @jax.jit
    def chain(a):
        def body(_, x):
            return jnp.tanh(x @ x) * 0.5
        return jnp.sum(jax.lax.fori_loop(0, iters, body, a),
                       dtype=jnp.float32)

    a = jnp.asarray(np.random.default_rng(0).normal(size=(n, n)),
                    jnp.bfloat16)
    float(chain(a))                       # compile + warm

    def compute():
        t0 = time.perf_counter()
        float(chain(a))                   # scalar fetch forces completion
        return time.perf_counter() - t0

    compute_s = median(compute)

    u_host = np.random.default_rng(1).integers(
        -2**15, 2**15, size=(20 * 1024 * 1024 // 2,)).astype(np.int16)
    float(jax.device_put(u_host)[-1])     # warm the transfer path

    def upload():
        t0 = time.perf_counter()
        float(jax.device_put(u_host)[-1])  # element fetch forces landing
        return time.perf_counter() - t0

    upload_s = median(upload)

    def overlapped():
        t0 = time.perf_counter()
        out = chain(a)                      # async dispatch
        dev = jax.device_put(u_host)        # should ride under compute
        float(out)
        float(dev[-1])
        return time.perf_counter() - t0

    overlapped_s = median(overlapped)

    # one relay RTT per fetch rides in every timing; report it so the
    # reader can subtract it mentally (it is small vs the ~0.3-0.5 s ops)
    def rtt():
        x = jnp.zeros(())
        t0 = time.perf_counter()
        float(x + 1)
        return time.perf_counter() - t0

    rtt_s = median(rtt)

    saved = compute_s + upload_s - overlapped_s
    cap = saved / max(min(compute_s, upload_s), 1e-9)
    print(json.dumps({
        "compute_s": round(compute_s, 4),
        "upload_s": round(upload_s, 4),
        "overlapped_s": round(overlapped_s, 4),
        "relay_rtt_s": round(rtt_s, 4),
        "overlap_capable": round(max(min(cap, 1.0), 0.0), 3),
    }))


if __name__ == "__main__":
    main()
