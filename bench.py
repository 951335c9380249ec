"""Benchmark: build + batched k-NN throughput on one chip.

Prints ONE JSON line (possibly several times — each reprint supersedes the
previous; the driver records the tail, so the LAST line is the result):
  {"metric": "knn_qps_chip", "value": <qps>, "unit": "queries/s",
   "vs_baseline": <qps / 100_000>, ...}

Defaults reflect driver scale: 1M clustered 128-d vectors (the BASELINE
SIFT1M shape; clustered synthetic is the honest proxy — uniform random is
the adversarial worst case for any graph ANN).  Override with BENCH_N /
BENCH_DIM / BENCH_DATA / BENCH_METRIC / BENCH_QBATCH / BENCH_K.

The headline is the throughput of the best serving mode that clears the
reference's own recall bar plus a safety margin (recall@10 >= 0.88;
the reference bar is 0.85, GraphTests.cs:28 — the margin keeps the
scored headline from being one seed-wobble away from the bar, VERDICT
r4 #3; every mode's raw qps/recall is still recorded in "modes"):

* block  — two-level MXU scoring (block.py) — usually the winner;
* exact  — blocked brute-force on the MXU (recall ~1.0);
* graph  — HNSW beam search over packed neighborhood tiles (core/pack.py,
  the default layer-0 serving path) and the unpacked fallback.

Robustness contract (round-3 lesson: the driver's run timed out with
NOTHING recorded — a wedged tunnel or a long cold compile must never
again produce parsed:null):

* a startup TUNNEL PROBE runs the first device op in a subprocess with a
  hard deadline and retries through the documented 10-15 min relay
  wedges; if the tunnel never comes back, a "tunnel_wedged" JSON line is
  printed instead of hanging;
* a provisional JSON line is printed after EVERY completed stage (build,
  each serving mode) — the headline only improves monotonically;
* the internal watchdog and SIGTERM both print the best-so-far JSON
  before exiting, so even a driver-side timeout records a result;
* the corpus size auto-downscales when the measured relay link rate
  projects the upload past the time budget (recorded in the JSON).

Every mode's qps + recall, the build rate, and rough efficiency numbers
(exact-mode MFU, graph-mode HBM traffic) go to stderr so the headline is
auditable.  The baseline divisor is the driver-set north star
(BASELINE.json): >= 100k queries/sec/chip batched on v5e.
"""

import json
import os
import signal
import subprocess
import sys
import threading
import time

import numpy as np

T_START = time.perf_counter()
#: headline candidacy gate: reference bar 0.85 + 0.03 margin (see top)
HEADLINE_RECALL = 0.88
BUDGET_S = float(os.environ.get("BENCH_BUDGET_S", "1200"))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def remaining():
    return BUDGET_S - (time.perf_counter() - T_START)


# ---------------------------------------------------------------- result --
# Best-so-far payload.  emit() prints the current best as one JSON line;
# it is called after every completed stage and again from the watchdog /
# SIGTERM paths, so whatever ends the process, the tail holds a result.

_RESULT = {
    "metric": "knn_qps_chip", "value": 0.0, "unit": "queries/s",
    "vs_baseline": 0.0,
}
_RESULT_LOCK = threading.Lock()
_EMITTED_FINAL = False


def update(**fields):
    with _RESULT_LOCK:
        _RESULT.update(fields)


def emit(final=False):
    global _EMITTED_FINAL
    with _RESULT_LOCK:
        if _EMITTED_FINAL:
            return
        if final:
            _EMITTED_FINAL = True
        _RESULT["elapsed_s"] = round(time.perf_counter() - T_START, 1)
        print(json.dumps(_RESULT), flush=True)


def _watchdog():
    """Print the best-so-far JSON and hard-exit if the run wedges (a hung
    device tunnel would otherwise block the harness forever; round 3
    recorded rc=124 with parsed:null — never again)."""
    def arm():
        time.sleep(max(5.0, remaining()))
        update(aborted="watchdog")
        emit(final=True)
        log(f"bench watchdog: budget {BUDGET_S:.0f}s exhausted — "
            "emitted best-so-far and aborting")
        os._exit(0)
    t = threading.Thread(target=arm, daemon=True)
    t.start()


def _on_sigterm(signum, frame):
    update(aborted=f"signal {signum}")
    emit(final=True)
    os._exit(0)


# ---------------------------------------------------------- tunnel probe --
_PROBE_CHILD = r"""
import os, sys, threading, time
def bail():
    time.sleep(float(sys.argv[1]))
    os._exit(9)
threading.Thread(target=bail, daemon=True).start()
if os.environ.get("BENCH_FAKE_WEDGE") == "1":
    time.sleep(10**6)
import jax, jax.numpy as jnp, numpy as np
np.asarray(jnp.sum(jnp.ones((8, 8), jnp.float32)))
os._exit(0)
"""


def tunnel_probe(
        deadline_s=float(os.environ.get("BENCH_PROBE_DEADLINE_S", "90")),
        attempts=int(os.environ.get("BENCH_PROBE_ATTEMPTS", "10")),
        sleep_s=float(os.environ.get("BENCH_PROBE_SLEEP_S", "60"))):
    """First device contact in a SUBPROCESS with a hard deadline.

    The relay tunnel can wedge for 10-15 minutes after a killed RPC
    (CLAUDE.md); probing in-process would hang the whole bench.  The
    child self-exits (rc 9) just before the parent deadline so a wedged
    RPC is abandoned by the child, not SIGKILLed mid-flight by us.
    Returns seconds spent, or raises after all attempts fail.

    Attempt schedule (round-5 retune): 2026-08-20 saw a wedge outlast
    the old 4 x (90s + 30s) window by minutes and the bench gave up with
    nothing scored; attempts now default to 10 with 60s gaps (~25 min of
    wall-clock coverage, still bounded by the remaining() bail below) so
    a responsive window inside a long flap is actually caught.
    """
    t0 = time.perf_counter()
    for attempt in range(attempts):
        if remaining() < deadline_s + 60:
            break  # leave room to emit something useful
        child = subprocess.Popen(
            [sys.executable, "-c", _PROBE_CHILD, str(deadline_s - 8.0)],
            stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)
        try:
            rc = child.wait(timeout=deadline_s)
        except subprocess.TimeoutExpired:
            child.kill()
            rc = -1
        dt = time.perf_counter() - t0
        if rc == 0:
            log(f"tunnel probe: ok after {dt:.1f}s (attempt {attempt + 1})")
            return dt
        log(f"tunnel probe: attempt {attempt + 1} failed rc={rc} "
            f"({dt:.0f}s in) — tunnel likely wedged, retrying")
        time.sleep(sleep_s)
    update(tunnel_wedged=True,
           aborted=f"tunnel wedged for {time.perf_counter() - t0:.0f}s")
    emit(final=True)
    log("tunnel probe: giving up — tunnel wedged; emitted JSON and exiting")
    os._exit(0)


def load_vectors(path):
    """fvecs/bvecs/npy loader (SIFT/GIST/DEEP distribution formats):
    fvecs = per-row [int32 dim][dim float32], bvecs = [int32 dim][dim
    uint8].  Returns float32 (n, dim)."""
    if path.endswith(".npy"):
        return np.load(path).astype(np.float32)
    raw = np.fromfile(path, dtype=np.uint8)
    dim = int(raw[:4].view(np.int32)[0])
    if path.endswith(".fvecs"):
        rec = 4 + 4 * dim
        a = raw.reshape(-1, rec)[:, 4:]
        return a.copy().view(np.float32).reshape(-1, dim)
    if path.endswith(".bvecs"):
        rec = 4 + dim
        return raw.reshape(-1, rec)[:, 4:].astype(np.float32)
    raise ValueError(f"unsupported dataset format: {path}")


def host_preflight():
    """Host/relay health snapshot for the JSON (VERDICT r4 weak #3: the
    143k-vs-184k same-day swing was unattributable because the bench
    recorded no quietness evidence — CLAUDE.md's own 'check ps before
    trusting any number' lesson, made automatic)."""
    try:
        load1, load5, _ = os.getloadavg()
    except OSError:
        load1 = load5 = -1.0
    ncpu = os.cpu_count() or 1
    busy = 0
    try:
        for pid in os.listdir("/proc"):
            if not pid.isdigit() or int(pid) == os.getpid():
                continue
            try:
                with open(f"/proc/{pid}/stat") as f:
                    if f.read().split(") ")[-1][:1] == "R":
                        busy += 1
            except OSError:
                pass
    except OSError:
        busy = -1
    return {"host_load1": round(load1, 2), "host_load5": round(load5, 2),
            "host_ncpu": ncpu, "host_running_procs": busy}


def main():
    n = int(os.environ.get("BENCH_N", "1000000"))
    dim = int(os.environ.get("BENCH_DIM", "128"))
    metric = os.environ.get("BENCH_METRIC", "sq_euclid")
    data_kind = os.environ.get("BENCH_DATA", "clustered")
    q_batch = int(os.environ.get("BENCH_QBATCH", "1024"))
    k = int(os.environ.get("BENCH_K", "10"))
    reps = int(os.environ.get("BENCH_REPS", "10"))

    pre = host_preflight()
    update(**pre)
    if pre["host_load1"] > 0.5:
        log(f"WARNING: host not quiet (load1={pre['host_load1']}, "
            f"{pre['host_running_procs']} running procs) — numbers may "
            "be depressed by host contention (CLAUDE.md)")

    tunnel_probe()

    import jax
    import jax.numpy as jnp
    log("devices:", jax.devices())

    # 3-dispatch latency probe: round-trip of a trivial chained program,
    # the per-launch relay tax every wave/query batch pays
    np.asarray(jnp.sum(jnp.ones((8,), jnp.float32)))  # warm/compile
    lat = []
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(jnp.sum(jnp.ones((8,), jnp.float32)))
        lat.append(time.perf_counter() - t0)
    dispatch_ms = 1000.0 * sorted(lat)[1]
    log(f"dispatch latency ~{dispatch_ms:.1f} ms (median of 3)")
    update(dispatch_ms=round(dispatch_ms, 1))

    from hnswindex_tpu import HNSWIndex, HNSWParameters
    from hnswindex_tpu.core import pack as PK
    from hnswindex_tpu.core.search import knn_search
    from hnswindex_tpu.ops.bruteforce import exact_knn, exact_knn2

    # -- real dataset (VERDICT r4 #6 / BASELINE north-star row 1):
    # BENCH_DATA may be a path to an .fvecs/.bvecs/.npy base file
    # (e.g. SIFT1M sift_base.fvecs); its dim overrides BENCH_DIM and its
    # size caps BENCH_N.  Synthetic kinds remain "clustered"/"uniform".
    dataset = None
    if os.path.sep in data_kind or data_kind.endswith(
            (".fvecs", ".bvecs", ".npy")):
        dataset = load_vectors(data_kind)
        dim = dataset.shape[1]
        n = min(n, dataset.shape[0])
        data_kind = os.path.basename(data_kind)
        log(f"dataset: {data_kind} {dataset.shape} -> N={n}, dim={dim}")

    # -- link rate first: on a bad relay day (2.9-18 MB/s observed) the 1M
    # upload alone can eat the budget; downscale the corpus so SOMETHING
    # lands rather than recording a timeout.
    np.asarray(jnp.sum(jnp.zeros((1 << 21,), jnp.float32)))  # warm consumer
    probe = np.zeros((1 << 21,), np.float32)  # 8 MB
    t0 = time.perf_counter()
    np.asarray(jnp.sum(jnp.asarray(probe)))
    h2d = 8.0 / max(1e-9, time.perf_counter() - t0)
    downscaled = False
    while n > 250000:
        upload_proj = n * dim * 4 / (h2d * 1e6)
        build_proj = n / 10000.0  # engine-side floor ~10k inserts/s
        # sweep + compiles need ~350s of headroom after the build
        if upload_proj + build_proj + 350 <= remaining():
            break
        n //= 2
        downscaled = True
    ceil = h2d * (1 << 20) / (dim * 4)
    log(f"H2D link: {h2d:.1f} MB/s -> ingest ceiling ~{ceil:.0f} inserts/s"
        + (f"; corpus downscaled to N={n}" if downscaled else ""))
    update(h2d_link_mbps=round(h2d, 2), ingest_ceiling_per_s=round(ceil, 1),
           n=n, dim=dim, data=data_kind, downscaled=downscaled)

    rng = np.random.default_rng(65537)
    if dataset is not None:
        vecs = np.ascontiguousarray(dataset[:n])
    elif data_kind == "clustered":
        # proxy for real embedding datasets (SIFT/GloVe/DEEP have strong
        # cluster structure; uniform random is the adversarial worst case)
        centers = rng.random((max(2, n // 500), dim)).astype(np.float32)
        vecs = (centers[rng.integers(0, centers.shape[0], n)]
                + 0.03 * rng.standard_normal((n, dim)).astype(np.float32))
    else:
        vecs = rng.random((n, dim), dtype=np.float32)
    if metric == "ucosine":
        vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)

    params = HNSWParameters(collection_size=n, max_wave_size=512)
    idx = HNSWIndex(dim, metric, parameters=params)

    # -- build: first half warms every wave-bucket compilation; second half
    # is the steady-state measurement
    half = n // 2
    t0 = time.perf_counter()
    idx.add(vecs[:half])
    # block_until_ready is async-fake through the remote relay — a real
    # readback that depends on the last wave's writes is the only honest
    # build-time fence
    np.asarray(jnp.sum(idx._state.deg0))
    warm_s = time.perf_counter() - t0
    up0 = idx.upload_seconds
    t0 = time.perf_counter()
    idx.add(vecs[half:])
    np.asarray(jnp.sum(idx._state.deg0))
    steady_s = time.perf_counter() - t0
    build_rate = (n - half) / steady_s
    # split the steady wall into measured link cost (fenced slab-upload
    # seconds inside add()) vs engine cost: through the tunneled relay
    # the 256 MB steady-half ingest can eat half the wall, which no
    # production PCIe host would pay
    upload_s = idx.upload_seconds - up0
    engine_rate = (n - half) / max(1e-9, steady_s - upload_s)
    log(f"build: total {warm_s + steady_s:.1f}s; steady-state "
        f"{build_rate:.0f} inserts/s (slab upload {upload_s:.1f}s of "
        f"{steady_s:.1f}s -> engine-side {engine_rate:.0f} inserts/s)"
        + (" (BUILD IS TRANSFER-BOUND)" if build_rate > 0.3 * ceil else ""))
    update(build_inserts_per_s=round(build_rate, 1),
           build_engine_inserts_per_s=round(engine_rate, 1),
           build_upload_s=round(upload_s, 2),
           build_vs_bar=round(build_rate / 10_000, 4),
           build_engine_vs_bar=round(engine_rate / 10_000, 4))
    emit()  # provisional: build recorded even if serving never completes

    cfg = idx._cfg
    state = idx._state
    queries = jnp.asarray(vecs[:q_batch])

    def throughput(run):
        d, i = run(queries)
        np.asarray(i)  # force full sync through the transfer path
        t0 = time.perf_counter()
        for _ in range(reps):
            d, i = run(queries)
        np.asarray(i)
        return reps * q_batch / (time.perf_counter() - t0)

    # ground truth for the query batch: host float64 brute force at
    # moderate sizes, device scorer beyond.
    if n <= 300000:
        qh = vecs[:q_batch].astype(np.float64)
        vh = vecs.astype(np.float64)
        vn2 = (vh * vh).sum(1)
        gt = np.empty((q_batch, k), np.int64)
        for s0 in range(0, q_batch, 128):
            qs_ = qh[s0:s0 + 128]
            d = ((qs_ * qs_).sum(1)[:, None] + vn2[None, :]
                 - 2.0 * qs_ @ vh.T)
            part = np.argpartition(d, k, axis=1)[:, :k]
            rows = np.arange(part.shape[0])[:, None]
            ord_ = np.argsort(d[rows, part], axis=1)
            gt[s0:s0 + 128] = part[rows, ord_]
    else:
        gt = np.asarray(exact_knn(cfg.metric, state.vectors, state.norms,
                                  state.active, queries, k)[1])

    def recall_of(ids):
        return float(np.mean([
            len(set(ids[r].tolist()) & set(gt[r].tolist())) / k
            for r in range(ids.shape[0])]))

    candidates = []     # headline-eligible (recall >= HEADLINE_RECALL)
    measured = []       # EVERY measured mode, gate or not (for the JSON)

    def note(qps, mode, rec):
        measured.append((qps, mode, rec))
        if rec > HEADLINE_RECALL:
            candidates.append((qps, mode, rec))
            headline()
        else:
            headline(refresh_only=True)

    def headline(refresh_only=False):
        if measured:
            update(modes={m: {"qps": round(q_, 1), "recall": round(r_, 4)}
                          for q_, m, r_ in sorted(measured, reverse=True)})
        if candidates:
            qps, mode, rec = max(candidates)
            update(value=round(qps, 1),
                   vs_baseline=round(qps / 100_000, 4),
                   headline_mode=mode, headline_recall=round(rec, 4))
        if measured or candidates:
            emit()

    # -- stage order is by headline value per second of compile risk:
    # block first (the recorded winner), then exact (safe fallback), then
    # the graph paths.  Each stage checks the remaining budget, and each
    # runs under guarded(): a transient relay failure mid-stage (e.g.
    # `remote_compile: response body closed` killed a whole run on
    # 2026-08-21 with NOTHING emitted) must cost only that stage.

    def guarded(stage_name, fn):
        try:
            fn()
        except Exception as e:
            log(f"stage {stage_name} FAILED: {e!r} — continuing")
            errs = _RESULT.get("stage_errors", {})
            errs[stage_name] = repr(e)[:200]
            update(stage_errors=errs)

    def stage_block():
        from hnswindex_tpu.block import BlockIndex
        # two block geometries: 192-row blocks measured ~+4% qps and
        # +2.5pp recall over 128 at matched scored-row counts (1M sweep
        # 2026-08-21 — fewer, larger DMAs per probe); 128 stays as the
        # long-measured fallback.  Both record into modes; the headline
        # picks whatever wins on the day.  (n_probe=2/3 at bs=128 are
        # below the bar; the bs=128 knee is 4 — RESULTS.md.)
        for bs, probes in ((192, (3, 4, 5, 6, 8)), (128, (4, 5, 6, 8))):
            if remaining() < 150:
                break
            bix = BlockIndex(dim, metric, parameters=params,
                             block_size=bs)
            t0 = time.perf_counter()
            bix.build(vecs)
            log(f"block bs={bs} build: {time.perf_counter() - t0:.1f}s "
                f"({bix.n_blocks} blocks)")
            tag = "" if bs == 128 else f"bs={bs},"
            for n_probe in probes:
                if n_probe > bix.n_blocks or remaining() < 60:
                    continue

                def block_run(qs, npb=n_probe, b=bix):
                    return b.query_device(qs, k, n_probe=npb)

                qps = throughput(block_run)
                rec = recall_of(np.asarray(block_run(queries)[1])[:, :k])
                log(f"block bs={bs} n_probe={n_probe}: {qps:.0f} q/s, "
                    f"recall@{k} {rec:.3f}")
                note(qps, f"block({tag}n_probe={n_probe})", rec)
            del bix

    if remaining() > 120:
        guarded("block", stage_block)

    # exact mode (recall ~1.0; also the fallback headline when nothing
    # else clears the bar)
    ct = state.coarse_table

    def exact_run(qs):
        if ct is not None:
            return exact_knn2(cfg.metric, state.vectors, ct, state.norms,
                              state.active, qs, k)
        return exact_knn(cfg.metric, state.vectors, state.norms,
                         state.active, qs, k)

    exact_qps = exact_rec = None

    def stage_exact():
        nonlocal exact_qps, exact_rec
        exact_qps = throughput(exact_run)
        exact_rec = recall_of(np.asarray(exact_run(queries)[1])[:, :k])
        mfu = exact_qps * 2.0 * dim * n / 394e12  # vs v5e bf16 peak
        stage = "2-stage bf16+f32" if ct is not None else "f32"
        log(f"exact ({stage}): {exact_qps:.0f} q/s, recall@{k} "
            f"{exact_rec:.4f} (~{100 * mfu:.0f}% of bf16 peak)")
        note(exact_qps, "exact", exact_rec)

    if remaining() > 90:
        guarded("exact", stage_exact)

    # graph mode, packed (the default layer-0 serving path at scale)
    def stage_packed():
        t0 = time.perf_counter()
        pk = idx._get_pack()
        if pk is None:
            return
        jax.block_until_ready(pk.res)
        log(f"pack build: {time.perf_counter() - t0:.1f}s "
            f"(entry set {int(pk.entry_ids.shape[0])})")
        expand = max(1, params.query_expand)
        for ef in (max(k, 12), 16, 32):
            if remaining() < 75:
                continue
            mi = (cfg.search_iter_factor * ef) // expand + 16

            def prun(qs, ef=ef, mi=mi):
                return PK.packed_knn_search(cfg, pk, qs, ef, mi,
                                            expand=expand,
                                            n_entry=min(8, ef))

            qps = throughput(prun)
            rec = recall_of(np.asarray(prun(queries)[1])[:, :k])
            # graph traffic estimate: ~ef expansions x one (K, D) tile
            K = int(pk.nbr0.shape[1])
            gbps = qps * ef * K * (dim * 2 + 8) / 1e9
            log(f"graph-packed ef={ef}: {qps:.0f} q/s, recall@{k} "
                f"{rec:.3f} (~{gbps:.0f} GB/s tile traffic)")
            note(qps, f"graph-packed(ef={ef})", rec)

    if remaining() > 120:
        guarded("graph-packed", stage_packed)

    # graph mode, unpacked fallback — audit info only; never the headline
    # at 1M, so it runs last (registered metrics serve packed since r5)
    def stage_unpacked():
        expand = max(1, params.query_expand)
        ef = 64
        mi = (cfg.search_iter_factor * ef) // expand + 16

        def grun(qs, ef=ef, mi=mi):
            return knn_search(cfg, state, qs, 0, ef, mi, expand=expand)

        qps = throughput(grun)
        rec = recall_of(np.asarray(grun(queries)[1])[:, :k])
        log(f"graph-unpacked ef={ef}: {qps:.0f} q/s, recall@{k} {rec:.3f}")
        note(qps, f"graph(ef={ef})", rec)

    if remaining() > 120:
        guarded("graph-unpacked", stage_unpacked)

    # headline: fastest mode that clears the reference recall bar
    if not candidates and exact_qps is not None:
        candidates.append((exact_qps, "exact", exact_rec))
    if candidates:
        qps, mode, rec = max(candidates)
        log(f"headline mode: {mode} (recall {rec:.3f}) at N={n} "
            f"{data_kind}; build {build_rate:.0f} inserts/s")
    headline()

    # -- recall parity vs the independent C++ host engine at equal
    # parameters (BASELINE north-star row 1).  Runs on a subsample (the
    # reference-style engine builds at ~1-3k inserts/s on this 1-core
    # host): always for a supplied real dataset, and for the synthetic
    # corpus too when the budget allows (BENCH_PARITY=0 disables).
    if (os.environ.get("BENCH_PARITY") != "0"
            and remaining() > (180 if dataset is not None else 300)):
        try:
            from hnswindex_tpu.native.host_engine import HostIndex
            pn = min(n, int(os.environ.get("BENCH_PARITY_N", "50000")))
            sub = vecs[:pn]
            pq = sub[:min(q_batch, 512)]
            # float64 ground truth on the subsample
            vh = sub.astype(np.float64)
            vn2 = (vh * vh).sum(1)
            pgt = np.empty((pq.shape[0], k), np.int64)
            for s0 in range(0, pq.shape[0], 128):
                qs_ = pq[s0:s0 + 128].astype(np.float64)
                dmat = ((qs_ * qs_).sum(1)[:, None] + vn2[None, :]
                        - 2.0 * qs_ @ vh.T)
                part = np.argpartition(dmat, k, axis=1)[:, :k]
                rows = np.arange(part.shape[0])[:, None]
                ord_ = np.argsort(dmat[rows, part], axis=1)
                pgt[s0:s0 + 128] = part[rows, ord_]

            def rec_of(ids):
                return float(np.mean([
                    len(set(ids[r].tolist()) & set(pgt[r].tolist())) / k
                    for r in range(ids.shape[0])]))

            t0 = time.perf_counter()
            host = HostIndex(dim, metric)
            host.set_collection_size(pn)
            host.add(sub)
            hi, _ = host.knn_query(pq, k)
            host_rec = rec_of(hi)
            log(f"parity: host engine built {pn} in "
                f"{time.perf_counter() - t0:.0f}s, recall@{k} {host_rec:.4f}")
            tix = HNSWIndex(dim, metric,
                            parameters=HNSWParameters(collection_size=pn))
            tix.add(sub)
            ti, _ = tix.knn_query(pq, k)
            tpu_rec = rec_of(ti)
            log(f"parity: TPU engine recall@{k} {tpu_rec:.4f} "
                f"(ratio {tpu_rec / max(1e-9, host_rec):.3f}x host)")
            update(parity_n=pn,
                   recall_host_engine=round(host_rec, 4),
                   recall_tpu_engine=round(tpu_rec, 4),
                   recall_parity_vs_host=round(
                       tpu_rec / max(1e-9, host_rec), 4))
            emit()
        except Exception as e:      # parity is auxiliary — never fatal
            log(f"parity stage skipped: {e!r}")

    emit(final=True)


if __name__ == "__main__":
    signal.signal(signal.SIGTERM, _on_sigterm)
    signal.signal(signal.SIGINT, _on_sigterm)
    _watchdog()
    if os.environ.get("BENCH_FAKE_HANG_MAIN") == "1":
        update(build_inserts_per_s=12345.0)  # pretend a stage landed
        time.sleep(10**6)
    try:
        main()
    except BaseException as e:
        # the robustness contract: WHATEVER ends the process, the tail
        # holds a JSON line.  2026-08-21: a relay `remote_compile` RPC
        # died mid-build, the exception escaped main(), and the run
        # recorded nothing — this guard emits best-so-far instead.
        update(aborted=f"exception: {type(e).__name__}: {e}"[:300])
        emit(final=True)
        raise
