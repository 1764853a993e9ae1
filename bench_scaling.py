#!/usr/bin/env python
"""Scaling-evidence protocol (BASELINE.md §3-4, north rule): run the
identical flagship job on the identical input at parallelism N and 4N cores;
report pages/sec at both + efficiency = (T_N / T_4N) / 4 and verify the two
runs produce identical tile checksums (determinism across parallelism).

Input is the driver events table deterministically replicated ×K in-Spark
(no external data) so the N-core run exceeds ~60 s (amortizes startup,
BASELINE.md §4.1).  Writes BENCH/SCALING_2LEVEL.md and prints one JSON
line.  (bench_sweep.py owns BENCH/BASELINE.md — the full-curve sweep plus
microbenches; this two-level variant must not clobber it.)

Usage: python bench_scaling.py [--small-n 8] [--big-n 32] [--k 40]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402
from engine import joins, raster  # noqa: E402
from engine.session import get_spark  # noqa: E402


def make_points(spark, sf_dir: str, k: int):
    """events ×K with the standard deterministic lon/lat derivation applied
    to the replicated id — same formula both runs, so outputs must agree."""
    ev = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    n_events = ev.count()
    # Parallel range() generates the point set with no serial crossJoin stage
    # and no shuffle; one partition per core (python UDF stages pay ~30 ms
    # fixed setup per task, so task count == cores is throughput-optimal).
    #
    # Distribution is CLUSTERED like a real web corpus: 5000 "city" centers
    # (uniform worldwide) with ±0.05° jitter.  Uniform points at this volume
    # produce ~1 distinct z5 pixel per 11 rows — a degenerate density map
    # whose hash-aggregation is DRAM-latency-bound and benchmarks the memory
    # system, not the engine.  All arithmetic stays integer-derived →
    # deterministic across runs and parallelism.
    nparts = spark.sparkContext.defaultParallelism
    cid = F.col("id") % 5000
    j = F.col("id") / F.lit(5000)  # integer part used below
    jj = (F.col("id") - cid) / 5000
    return spark.range(0, n_events * k, 1, nparts).select(
        F.col("id").alias("event_id"),
        (
            ((cid * 73) % 35800) / 100.0 - 179.0 + 0.005
            + ((jj.cast("long") * 31) % 100) / 1000.0 - 0.05
        ).alias("lon"),
        (
            ((cid * 7919) % 15800) / 100.0 - 79.0 + 0.005
            + ((jj.cast("long") * 17) % 100) / 1000.0 - 0.05
        ).alias("lat"),
    )


def flagship(spark, pts, fused: bool = True):
    """PIP join vs 10° grid → density burn z5 (tile+pixel assignment inside)
    → 2-level pyramid; returns xor of tile checksums (forces full execution
    AND pins determinism).  Columns are pruned to what each stage needs —
    dragging a per-row quadkey string through the Arrow boundary costs more
    than the geometry math (measured).

    ``fused=True`` (default) runs the per-point path through
    raster.burn_base_tiles_pip — ONE Arrow boundary with below-the-boundary
    partial counting — instead of the composed pip_join_broadcast →
    burn_base_tiles chain (two python workers per task).  Result-identical
    by construction (pinned by test_burn_base_tiles_pip_fused_identity and
    by the checksum tuple this protocol records across rounds);
    ``fused=False`` keeps the composed two-boundary plan for A/B evidence."""
    if fused:
        base = raster.burn_base_tiles_pip(pts, entrymod._grid_polygons_pdf(), 5).persist()
    else:
        matched = joins.pip_join_broadcast(
            pts, entrymod._grid_polygons_pdf(), keep_cols=("event_id",)
        )
        base = raster.burn_base_tiles(matched, 5).persist()
    try:
        pyr = raster.pyramid_reduce(raster.pyramid_reduce(base))
        # persist: base feeds both the pyramid and its own checksum pass —
        # without it the burn-assemble stage runs twice (only the shuffle
        # below it is reused)
        cks = raster.tile_checksums(base).unionByName(raster.tile_checksums(pyr))
        row = cks.agg(
            F.expr("aggregate(collect_list(checksum), 0, (a, x) -> int(a ^ x))").alias("ck"),
            F.count(F.lit(1)).alias("tiles"),
            F.sum("page_count").alias("total"),
        ).collect()[0]
    finally:
        base.unpersist()
    return int(row.ck), int(row.tiles), int(row.total)


def run_at(cores: int, sf_dir: str, k: int):
    spark = get_spark(f"scaling-{cores}", master=f"local[{cores}]", shuffle_partitions=cores)
    spark.sparkContext.setLogLevel("ERROR")
    pts = make_points(spark, sf_dir, k)
    n = pts.count()
    # warmup: fork python workers, JIT the codegen, register sinks — the
    # protocol measures steady-state throughput (a cluster amortizes these
    # once per executor lifetime), BASELINE.md §4.1
    flagship(spark, make_points(spark, sf_dir, 2))
    t0 = time.time()
    ck, tiles, total = flagship(spark, pts)
    wall = time.time() - t0
    spark.stop()
    return {"cores": cores, "n_pages": n, "wall_s": round(wall, 2),
            "pages_per_sec": round(n / wall, 1), "checksum_xor": ck,
            "n_tiles": tiles, "total_count": total}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--small-n", type=int, default=8)
    ap.add_argument("--big-n", type=int, default=32)
    ap.add_argument("--k", type=int, default=40)
    args = ap.parse_args()
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    small = run_at(args.small_n, sf_dir, args.k)
    print(f"  local[{args.small_n}]: {small}", file=sys.stderr)
    big = run_at(args.big_n, sf_dir, args.k)
    print(f"  local[{args.big_n}]: {big}", file=sys.stderr)

    ratio = small["wall_s"] / big["wall_s"]
    eff = ratio / (args.big_n / args.small_n)
    identical = small["checksum_xor"] == big["checksum_xor"] and small["n_tiles"] == big["n_tiles"]
    result = {
        "metric": "scaling_efficiency",
        "value": round(eff, 3),
        "unit": "ratio",
        "small": small,
        "big": big,
        "speedup": round(ratio, 2),
        "identical_outputs": identical,
        "sf_dir": sf_dir,
        "replication_k": args.k,
    }

    os.makedirs("BENCH", exist_ok=True)
    with open("BENCH/SCALING_2LEVEL.md", "w") as f:
        f.write(f"""# BENCH — scaling evidence (north rule)

Protocol (BASELINE.md §3-4): identical flagship job (z8 tile assign → 10°
grid PIP join → z5 density burn → 2-level AVERAGE pyramid, checksum-forced)
on the identical deterministic input ({small['n_pages']:,} points = events
×{args.k}), at two parallelism levels.  Sandbox substitute for N vs 4N
executors per the driver instruction.

| run | master | wall (s) | pages/sec |
|---|---|---|---|
| N  | local[{args.small_n}] | {small['wall_s']} | {small['pages_per_sec']:,} |
| 4N | local[{args.big_n}] | {big['wall_s']} | {big['pages_per_sec']:,} |

- **speedup** = {result['speedup']}x, **scaling efficiency** = (T_N / T_4N) / 4 = **{result['value']}** (target ≥ 0.8)
- **determinism**: tile-checksum xor identical across runs: **{identical}**
  (checksum_xor={small['checksum_xor']}, n_tiles={small['n_tiles']}, total_count={small['total_count']})

Raw: `{json.dumps(result)}`
""")
    print(json.dumps(result))


if __name__ == "__main__":
    main()
