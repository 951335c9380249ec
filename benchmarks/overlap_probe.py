"""Does a bulk H2D transfer overlap device compute through the relay?

VERDICT r4 #1: the build's slab uploads are fully serialized with wave
compute (index._insert_batch fences every slab before draining its
waves), so on a slow-relay day 30+ s of transfer is pure dead time.
This probe measures, on the real tunneled TPU:

  A = wall of a bulk H2D transfer alone (fenced)
  B = wall of a chained device compute program alone (fenced)
  C = wall of (launch compute async, then issue transfer, fence both)

overlap_ratio = (A + B - C) / min(A, B): ~1.0 -> full overlap (double
buffering will hide the upload), ~0.0 -> serialized (record the negative
in RESULTS.md and keep the honest engine-side split).

Run on a QUIET host (CLAUDE.md): `python benchmarks/overlap_probe.py`.
Internal deadline; exits cleanly (never SIGTERM mid-RPC — relay wedge).
"""
import json
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

DEADLINE_S = 420
t0 = time.perf_counter()


def left() -> float:
    return DEADLINE_S - (time.perf_counter() - t0)


def main() -> None:
    dev = jax.devices()[0]
    print(f"device: {dev.platform}", file=sys.stderr)

    # --- calibrate the link with a small transfer --------------------
    probe_mb = 8
    a = np.random.default_rng(0).random((probe_mb << 20) // 4,
                                        ).astype(np.float32)
    t = time.perf_counter()
    d = jnp.asarray(a)
    np.asarray(d[0])
    link = probe_mb / (time.perf_counter() - t)
    print(f"link ~{link:.1f} MB/s", file=sys.stderr)
    del d

    # size the test transfer to ~4 s of link time, capped at 256 MB
    xfer_mb = int(max(16, min(256, link * 4.0)))
    big = np.random.default_rng(1).random((xfer_mb << 20) // 4,
                                          ).astype(np.float32)

    # --- compute chain: calibrate to ~the transfer wall --------------
    M = 4096

    @jax.jit
    def burn(x, iters):
        def body(_, acc):
            return jnp.tanh(acc @ acc) * 0.999
        return jax.lax.fori_loop(0, iters, body, x)

    x = jnp.asarray(np.random.default_rng(2).random((M, M),
                                                    np.float32))
    x = (x / M).astype(jnp.bfloat16)
    # warm up + measure per-iter cost
    np.asarray(burn(x, 8).astype(jnp.float32)[0, 0])
    t = time.perf_counter()
    np.asarray(burn(x, 64).astype(jnp.float32)[0, 0])
    per_iter = (time.perf_counter() - t) / 64

    # --- A: transfer alone -------------------------------------------
    t = time.perf_counter()
    d = jnp.asarray(big)
    np.asarray(d[0])
    A = time.perf_counter() - t
    del d
    if left() < 4 * A + 30:
        print(json.dumps({"error": "deadline", "A": A}))
        return

    iters = max(8, int(A / per_iter))
    # --- B: compute alone --------------------------------------------
    t = time.perf_counter()
    np.asarray(burn(x, iters).astype(jnp.float32)[0, 0])
    B = time.perf_counter() - t

    # --- C: compute launched first, transfer issued behind it --------
    big2 = np.random.default_rng(3).random(big.shape).astype(np.float32)
    t = time.perf_counter()
    y = burn(x, iters)                      # async dispatch
    d2 = jnp.asarray(big2)                  # issue upload behind it
    np.asarray(d2[0])                       # fence transfer
    t_xfer_done = time.perf_counter() - t
    np.asarray(y.astype(jnp.float32)[0, 0])  # fence compute
    C = time.perf_counter() - t
    del d2

    # --- C2: transfer issued first, compute behind it ----------------
    big3 = np.random.default_rng(4).random(big.shape).astype(np.float32)
    t = time.perf_counter()
    d3 = jnp.asarray(big3)
    y2 = burn(x, iters)
    np.asarray(y2.astype(jnp.float32)[0, 0])
    C2 = time.perf_counter() - t
    del d3

    ratio = (A + B - C) / max(1e-9, min(A, B))
    ratio2 = (A + B - C2) / max(1e-9, min(A, B))
    print(json.dumps({
        "platform": dev.platform, "link_mbps": round(link, 2),
        "xfer_mb": xfer_mb, "A_transfer_s": round(A, 3),
        "B_compute_s": round(B, 3), "C_combined_s": round(C, 3),
        "C_xfer_fence_s": round(t_xfer_done, 3),
        "C2_xfer_first_s": round(C2, 3),
        "overlap_ratio_compute_first": round(ratio, 3),
        "overlap_ratio_xfer_first": round(ratio2, 3),
    }))


if __name__ == "__main__":
    main()
