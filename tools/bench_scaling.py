"""Two-parallelism scaling-efficiency measurement (north rule: >= 0.8
throughput scaling efficiency between N and 4N executors; in-sandbox
stand-in = local[N] vs local[4N] on identical input, mirroring the
reference's 1.7x two-worker throughput gate,
scripts/analysis/multi_worker_throughput.py:735).

Runs the triple-extraction pipeline (the UDF-dominated, CPU-bound
stage where scaling is honest) in a FRESH subprocess per parallelism
level (own JVM, cold caches), computes
    eff = throughput_4N / (4 * throughput_N)
and writes BENCH.md + data/scaling_latest.json (echoed by bench.py).

Usage: python tools/bench_scaling.py [kg_dir] [N] [repeats]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
from datetime import datetime, timezone

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_CHILD = r"""
import json, os, sys, time
sys.path.insert(0, {root!r})
import pyspark.sql.functions as F
from code_indexer_spark.session import get_spark
from code_indexer_spark.plans.pipeline import build_raw_triples, read_pages

spark = get_spark("scaling", master="local[{cores}]",
                  shuffle_partitions="{parts}")
spark.sparkContext.setLogLevel("ERROR")
kg = {kg!r}
n_pages = read_pages(spark, kg).count()

# Warm-up (untimed): fork + import the Python workers and fill their
# per-worker caches on a 1% url-hash sample. On a real cluster the
# executors are long-lived; this mirrors the reference's warm-server
# measurement protocol (docs/operating-modes.md:360-370).
warm = read_pages(spark, kg, for_udf=True).filter(
    F.pmod(F.xxhash64("url"), F.lit(100)) == 0)
build_raw_triples(spark, kg, pages=warm).count()

t0 = time.monotonic()
n_triples = build_raw_triples(spark, kg).count()
dt = time.monotonic() - t0
print(json.dumps(dict(cores={cores}, wall_sec=round(dt, 3),
                      n_pages=n_pages, n_triples=n_triples,
                      pages_per_sec=round(n_pages / dt, 1),
                      triples_per_sec=round(n_triples / dt, 1))))
spark.stop()
"""


def run_level(kg: str, cores: int) -> dict:
    code = _CHILD.format(root=ROOT, cores=cores, parts=max(cores * 2, 8),
                         kg=kg)
    out = subprocess.run([sys.executable, "-c", code], capture_output=True,
                         text=True, check=True)
    line = [ln for ln in out.stdout.strip().splitlines()
            if ln.startswith("{")][-1]
    return json.loads(line)


def main() -> None:
    kg = sys.argv[1] if len(sys.argv) > 1 else \
        os.path.join(ROOT, "data", "kg", "sf_bench")
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    repeats = int(sys.argv[3]) if len(sys.argv) > 3 else 2

    results = {n: [], 4 * n: []}
    for _ in range(repeats):
        for cores in (n, 4 * n):
            r = run_level(kg, cores)
            results[cores].append(r)
            print(f"local[{cores}]: {r['wall_sec']}s "
                  f"({r['triples_per_sec']} triples/s)", file=sys.stderr)

    best = {c: max(rs, key=lambda r: r["triples_per_sec"])
            for c, rs in results.items()}
    tn, t4n = best[n]["triples_per_sec"], best[4 * n]["triples_per_sec"]
    eff = round(t4n / (4 * tn), 3)
    summary = {
        "kg_dir": kg,
        "n_cores": n,
        "n4_cores": 4 * n,
        "n_pages": best[n]["n_pages"],
        "n_triples": best[n]["n_triples"],
        "wall_sec_N": best[n]["wall_sec"],
        "wall_sec_4N": best[4 * n]["wall_sec"],
        "triples_per_sec_N": tn,
        "triples_per_sec_4N": t4n,
        "scaling_efficiency": eff,
        "passes_0_8_gate": eff >= 0.8,
        "measured_at": datetime.now(timezone.utc).isoformat(),
    }
    os.makedirs(os.path.join(ROOT, "data"), exist_ok=True)
    with open(os.path.join(ROOT, "data", "scaling_latest.json"), "w") as f:
        json.dump(summary, f, indent=2)

    with open(os.path.join(ROOT, "BENCH.md"), "w") as f:
        f.write(f"""# BENCH — scaling-efficiency evidence (north rule)

Protocol: the triple-extraction pipeline (pages -> extract -> rules ->
link -> triples; the CPU-bound Arrow-UDF stage) runs on identical input
at two parallelism levels in fresh JVMs, {repeats}x each, best-of taken;
`eff = throughput_4N / (4 x throughput_N)`. This is the in-sandbox
stand-in for N vs 4N executors (see BASELINE.md), mirroring the
reference's two-worker >= 1.7x gate
(`scripts/analysis/multi_worker_throughput.py:735`).

| level | cores | wall (s) | triples/s | pages/s |
|---|---|---|---|---|
| N  | {n} | {best[n]['wall_sec']} | {tn} | {best[n]['pages_per_sec']} |
| 4N | {4*n} | {best[4*n]['wall_sec']} | {t4n} | {best[4*n]['pages_per_sec']} |

Input: `{kg}` — {best[n]['n_pages']} pages, {best[n]['n_triples']} triples.

**Scaling efficiency: {eff} (gate >= 0.8: {'PASS' if eff >= 0.8 else 'FAIL'})**

Measured {summary['measured_at']}.
""")
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
