#!/usr/bin/env python
"""Text-pipeline scaling evidence (webtext axis companion to the flagship
sweep in bench_sweep.py): the fuzzy-dedup clustering job — MinHash →
banded LSH buckets → star edges → connected components → cluster stats —
over 10^6 deterministically synthesized docs with a 10^5-doc boilerplate
hot cluster (the dedup_hot_bucket bench query's workload), run at two
parallelism levels per the north-rule protocol.  Reports throughput at
both levels, efficiency = (T_N / T_4N) / 4, and output-identity (the
cluster-size histogram must be IDENTICAL across core counts — dedup is
exact-deterministic given the LSH parameters, unlike wall time).

Usage: python bench_scaling_text.py [--small-n 8] [--big-n 32]
Writes one JSON line to stdout; intended for BENCH/BASELINE.md §1b.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

RUNNER = r"""
import sys, time, json
sys.path.insert(0, %(repo)r)
from pyspark.sql import functions as F
from engine.session import get_spark
from engine import textops

cores = %(cores)d
n_total, n_hot = %(n_total)d, %(n_hot)d
spark = get_spark(f"textsweep{cores}", master=f"local[{cores}]",
                  shuffle_partitions=cores)
spark.sparkContext.setLogLevel("ERROR")
docs = spark.range(n_total).select(
    F.col("id").alias("doc_id"),
    F.when(
        F.col("id") < n_hot,
        F.lit("the same boilerplate page text repeated across the crawl corpus"),
    ).otherwise(
        F.concat_ws(" ", *[
            F.md5(F.concat(F.lit(str(i)), F.col("id").cast("string")))
            for i in range(6)
        ])
    ).alias("text"),
).repartition(cores).cache()
docs.count()

def job():
    out = textops.dedup_clusters_df(docs)
    hist = sorted(
        (int(r["n_members"]), int(r["n"]))
        for r in out.groupBy("n_members").agg(F.count(F.lit(1)).alias("n")).collect()
    )
    return hist

job()  # warmup (JVM + python workers + codegen)
best = 1e18; hist = None
for _ in range(%(reps)d):
    t0 = time.time(); hist = job(); best = min(best, time.time() - t0)
print("RESULT " + json.dumps({
    "cores": cores, "n_docs": n_total, "wall_s": round(best, 2),
    "docs_per_sec": round(n_total / best, 1), "hist": hist,
}))
spark.stop()
"""


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--small-n", type=int, default=8)
    ap.add_argument("--big-n", type=int, default=32)
    ap.add_argument("--n-total", type=int, default=1_000_000)
    ap.add_argument("--n-hot", type=int, default=100_000)
    ap.add_argument("--reps", type=int, default=2)
    args = ap.parse_args()

    results = []
    for cores in (args.small_n, args.big_n):
        code = RUNNER % {
            "repo": os.path.dirname(os.path.abspath(__file__)),
            "cores": cores,
            "n_total": args.n_total,
            "n_hot": args.n_hot,
            "reps": args.reps,
        }
        r = subprocess.run(
            [sys.executable, "-c", code], capture_output=True, text=True, timeout=3000
        )
        lines = [ln for ln in r.stdout.splitlines() if ln.startswith("RESULT ")]
        if not lines:
            raise RuntimeError(f"text sweep at {cores} cores failed: {r.stderr[-2000:]}")
        results.append(json.loads(lines[0][7:]))
        print(f"  text {results[-1]['cores']} cores: {results[-1]['wall_s']} s", file=sys.stderr)

    small, big = results
    ratio = big["cores"] / small["cores"]
    eff = round((small["wall_s"] / big["wall_s"]) / ratio, 3)
    identical = small["hist"] == big["hist"]
    print(json.dumps({
        "metric": "text_dedup_scaling_efficiency",
        "value": eff,
        "unit": "ratio",
        "runs": results,
        "identical_outputs": identical,
    }))


if __name__ == "__main__":
    main()
