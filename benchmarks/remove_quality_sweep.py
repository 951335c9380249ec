"""Removal-quality sweep at scale (VERDICT r2 #4).

Runs remove_probe-style workloads (100k x 50% uniform by default) across
repair-width / fill configurations IN SEPARATE PROCESSES (the repair
knobs are module constants read from HNSW_REPAIR_* env at import), and
prints a drift-vs-cost table.  The reference's bar is post/pre recall
ratio >= 0.98 at 2k (GraphTests.cs:138-148); the workload-inherent drift
at 100k x 50% uniform is larger for ANY engine (the independent C++ host
engine drifts the same on the identical workload — benchmarks/RESULTS.md
removal pass), so this sweep establishes what bar repair width can
actually buy back, at what removals/s.

Usage: PYTHONPATH=/root/repo:/root/.axon_site \
           python benchmarks/remove_quality_sweep.py [N] [FRAC] [DATA]
Env: SWEEP_CONFIGS="name:ENV=V,ENV=V;name2:..." to override the grid.
"""

import json
import os
import subprocess
import sys

N = sys.argv[1] if len(sys.argv) > 1 else "100000"
FRAC = sys.argv[2] if len(sys.argv) > 2 else "0.5"
DATA = sys.argv[3] if len(sys.argv) > 3 else "uniform"

DEFAULT = [
    ("baseline", {}),
    ("fill=M", {"HNSW_REPAIR_FILL": "16"}),
    ("span2x", {"HNSW_REPAIR_SPAN": "64", "HNSW_REPAIR_SPAN_1": "96",
                "HNSW_REPAIR_FANIN": "6"}),
    ("fill+span2x", {"HNSW_REPAIR_FILL": "16", "HNSW_REPAIR_SPAN": "64",
                     "HNSW_REPAIR_SPAN_1": "96",
                     "HNSW_REPAIR_FANIN": "6"}),
    ("ef200+fill", {"REMOVE_EF": "200", "HNSW_REPAIR_FILL": "16"}),
]


def parse_env_grid(s):
    out = []
    for part in s.split(";"):
        name, _, kvs = part.partition(":")
        env = dict(kv.split("=", 1) for kv in kvs.split(",") if kv)
        out.append((name, env))
    return out


def main():
    grid = (parse_env_grid(os.environ["SWEEP_CONFIGS"])
            if "SWEEP_CONFIGS" in os.environ else DEFAULT)
    here = os.path.dirname(os.path.abspath(__file__))
    rows = []
    for name, env in grid:
        e = dict(os.environ)
        e.update(env)
        print(f"== {name}: {env}", file=sys.stderr, flush=True)
        p = subprocess.run(
            [sys.executable, os.path.join(here, "remove_probe.py"),
             N, FRAC, DATA],
            env=e, capture_output=True, text=True, timeout=1800)
        sys.stderr.write(p.stderr)
        line = p.stdout.strip().splitlines()[-1] if p.stdout.strip() else ""
        try:
            r = json.loads(line)
        except (json.JSONDecodeError, IndexError):
            print(f"   FAILED rc={p.returncode}", file=sys.stderr)
            continue
        r["config"] = name
        r["ratio"] = round(r["post_recall"] / max(1e-9, r["pre_recall"]), 4)
        rows.append(r)
        print(json.dumps(r), flush=True)

    print(f"\n{'config':14s} {'rem/s':>8s} {'pre':>7s} {'post':>7s} "
          f"{'ratio':>7s}", file=sys.stderr)
    for r in rows:
        print(f"{r['config']:14s} {r['removals_per_s']:8.0f} "
              f"{r['pre_recall']:7.3f} {r['post_recall']:7.3f} "
              f"{r['ratio']:7.4f}", file=sys.stderr)


if __name__ == "__main__":
    main()
