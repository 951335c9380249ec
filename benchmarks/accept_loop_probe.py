"""TPU probe: accept-loop variants on a pre-built conflict tensor."""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

T_START = time.time()
BUDGET_S = float(__import__("os").environ.get("PROBE_BUDGET_S", "420"))


def out_of_time():
    if time.time() - T_START > BUDGET_S:
        print("BUDGET EXHAUSTED — exiting cleanly", file=sys.stderr,
              flush=True)
        return True
    return False

B, N = 16384, 40
U = 8
G = -(-N // U)
Np = G * U
R = 10

key = jax.random.PRNGKey(0)
conf = jax.random.uniform(key, (B, N, N)) < 0.1
tri = (jnp.arange(N)[:, None] < jnp.arange(N)[None, :])
conf = conf & tri[None]
confT = jax.jit(lambda c: jnp.moveaxis(c, 0, 2))(conf)    # (s, j, B)
np.asarray(jnp.sum(conf) + jnp.sum(confT))
print("setup done", file=sys.stderr, flush=True)


def bench(name, fn, *args):
    if out_of_time():
        sys.exit(0)
    f = jax.jit(fn)
    np.asarray(f(*args))
    t0 = time.perf_counter()
    for _ in range(R):
        o = f(*args)
    np.asarray(o)
    print(f"{name}: {(time.perf_counter() - t0) / R * 1000:.1f} ms",
          file=sys.stderr, flush=True)


def v_scan4(conflict):
    """current committed version (U=4 lax.scan, dynamic slices)"""
    Uv, Gv = 4, -(-N // 4)
    Npv = Gv * Uv
    cols = jnp.moveaxis(conflict, 2, 0)
    cols = jnp.pad(cols, ((0, Npv - N), (0, 0), (0, 0)))
    cols_g = cols.reshape(Gv, Uv, B, N)
    jbase = jnp.arange(Gv, dtype=jnp.int32) * Uv

    def step(acc, xs):
        jb, cg = xs
        hit = jnp.any(cg & acc[None, :, :N], axis=2)

        def intra(p, k):
            return lax.dynamic_slice(cg[k], (0, jb + p), (B, 1))[:, 0]

        a0 = ~hit[0]
        a1 = ~(hit[1] | (a0 & intra(0, 1)))
        a2 = ~(hit[2] | (a0 & intra(0, 2)) | (a1 & intra(1, 2)))
        a3 = ~(hit[3] | (a0 & intra(0, 3)) | (a1 & intra(1, 3))
               | (a2 & intra(2, 3)))
        blk = jnp.stack([a0, a1, a2, a3], axis=1)
        acc = lax.dynamic_update_slice(acc, blk, (0, jb))
        return acc, None

    acc0 = jnp.zeros((B, Npv), bool)
    accepted, _ = lax.scan(step, acc0, (jbase, cols_g))
    return jnp.sum(accepted[:, :N])


def v_unroll_T(cT):
    """full unroll, B-minor layout, given pre-transposed tensor"""
    confp = jnp.pad(cT, ((0, Np - N), (0, Np - N), (0, 0)))
    blks = []
    for g in range(G):
        j0 = g * U
        if g:
            prev = blks[0] if g == 1 else jnp.concatenate(blks, axis=0)
            cslab = confp[:j0, j0:j0 + U]
            hit = jnp.any(cslab & prev[:, None, :], axis=0)
        else:
            hit = jnp.zeros((U, B), bool)
        it = confp[j0:j0 + U, j0:j0 + U]
        a = [~hit[0]]
        for k in range(1, U):
            h = hit[k]
            for p in range(k):
                h = h | (a[p] & it[p, k])
            a.append(~h)
        blks.append(jnp.stack(a, axis=0))
    return jnp.sum(jnp.concatenate(blks, axis=0)[:N])


def v_transpose(conflict):
    return jnp.sum(jnp.moveaxis(conflict, 0, 2) & True)


def v_hacc(conflict):
    """running hit accumulator, (B, *, N) layout, full unroll"""
    confp = jnp.pad(conflict, ((0, 0), (0, Np - N), (0, Np - N)))
    hacc = jnp.zeros((B, Np), bool)
    blks = []
    for g in range(G):
        j0 = g * U
        hit = hacc[:, j0:j0 + U]
        it = confp[:, j0:j0 + U, j0:j0 + U]
        a = [~hit[:, 0]]
        for k in range(1, U):
            h = hit[:, k]
            for p in range(k):
                h = h | (a[p] & it[:, p, k])
            a.append(~h)
        ag = jnp.stack(a, axis=1)                            # (B, U)
        if g + 1 < G:
            slab = confp[:, j0:j0 + U, :]                    # (B, U, Np)
            hacc = hacc | jnp.any(slab & ag[:, :, None], axis=1)
        blks.append(ag)
    return jnp.sum(jnp.concatenate(blks, axis=1)[:, :N])


def v_scan8_pre(conflict):
    """U=8 lax.scan with pre-gathered intra tiles (no dynamic slices)"""
    confp = jnp.pad(conflict, ((0, 0), (0, Np - N), (0, Np - N)))
    cols = jnp.moveaxis(confp[:, :N, :], 2, 0)               # (Np, B, N)
    cols_g = cols.reshape(G, U, B, N)
    gi = jnp.arange(G)
    intra = confp.reshape(B, G, U, G, U)[:, gi, :, gi, :]    # (G, B, U, U)

    def step(carry, xs):
        acc = carry                                          # (B, N) decided
        cg, it = xs
        hit = jnp.any(cg & acc[None], axis=2)                # (U, B)
        a = [~hit[0]]
        for k in range(1, U):
            h = hit[k]
            for p in range(k):
                h = h | (a[p] & it[:, p, k])
            a.append(~h)
        blk = jnp.stack(a, axis=1)                           # (B, U)
        g = jnp.sum(jnp.zeros((), jnp.int32))                # unused
        return acc, blk

    # NOTE: this variant is WRONG as a loop (acc never updates) — it only
    # measures the per-step op cost floor with U=8 batching.
    acc0 = jnp.zeros((B, N), bool)
    _, blks = lax.scan(step, acc0, (cols_g, intra))
    return jnp.sum(blks)


bench("scan U=4 (current)", v_scan4, conf)
bench("transpose to (s,j,B)", v_transpose, conf)
bench("unroll B-minor (pre-T)", v_unroll_T, confT)
bench("hacc unroll (B-major)", v_hacc, conf)
bench("scan U=8 floor (no carry)", v_scan8_pre, conf)
print("DONE", file=sys.stderr)
