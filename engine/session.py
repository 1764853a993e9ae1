"""SparkSession builder tuned for this engine.

Local-mode defaults mirror the intended cluster profile: AQE on (runtime
re-plan + skew-join handling), Arrow on (all engine UDFs are pandas UDFs),
shuffle partitions sized to cores (overridden per-job at scale).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "spark-geotile",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    # Executor python workers must be able to import the `engine` package
    # (pandas UDFs are defined in it).  Local mode: export PYTHONPATH before
    # the JVM starts.  Cluster mode: ship via spark-submit --py-files of the
    # packaged zip instead (BASELINE.md protocol).
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    pp = os.environ.get("PYTHONPATH", "")
    if repo_root not in pp.split(os.pathsep):
        os.environ["PYTHONPATH"] = repo_root + (os.pathsep + pp if pp else "")
    # glibc malloc tuning for the python workers (inherited from this
    # process in local mode; cluster mode ships the same pair via
    # spark.executorEnv.* — see engine/deploy.py).  Default glibc mmaps
    # every allocation >128 KB and munmaps it on free, so EVERY numpy
    # temporary in a vectorized kernel becomes an mmap/munmap pair through
    # the kernel's serialized page-fault path — measured here at 5.5x on
    # the PIP kernel inside workers (12.6 s -> 2.3 s for the same stage,
    # same results).  Raising the threshold keeps big blocks on the heap
    # for reuse; the trim threshold bounds worker RSS growth.  setdefault:
    # an operator-provided value always wins.
    os.environ.setdefault("MALLOC_MMAP_THRESHOLD_", "1073741824")
    os.environ.setdefault("MALLOC_TRIM_THRESHOLD_", "268435456")
    cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    master = master or f"local[{cores}]"
    if shuffle_partitions is None:
        # local mode: one shuffle partition per core keeps every stage's tasks
        # in a single wave; at cluster scale this is set per-job instead.
        shuffle_partitions = int(master[6:-1]) if master.startswith("local[") and master[6:-1].isdigit() else 200
    b = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "262144")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        # Bound the reusable python-worker pool to ~one worker per core.
        # Without a cap, every multi-UDF-stage job can grow the daemon's
        # worker set and the freed workers are never reaped: measured here,
        # a 40-query run grew 67 -> 130 workers / 6.8 -> 15 GB aggregate RSS,
        # and identical sieve plans then burned 2-3.7x more executor CPU
        # (70 -> 264 core-seconds, same stage count) from allocator/page-
        # fault contention across the bloated pool.  With the cap the same
        # sequence stays at 67 workers / 7 GB and per-query CPU is flat.
        # On a cluster this bounds per-executor python memory the same way.
        .config(
            "spark.python.factory.idleWorkerMaxPoolSize",
            str(
                int(master[6:-1])
                if master.startswith("local[") and master[6:-1].isdigit()
                else (os.cpu_count() or 8)
            ),
        )
        .config("spark.ui.enabled", "false")
        # cluster mode: executors don't inherit the driver env — ship the
        # malloc tuning explicitly (no-op in local mode, where the workers
        # inherit the process env set above)
        .config(
            "spark.executorEnv.MALLOC_MMAP_THRESHOLD_",
            os.environ["MALLOC_MMAP_THRESHOLD_"],
        )
        .config(
            "spark.executorEnv.MALLOC_TRIM_THRESHOLD_",
            os.environ["MALLOC_TRIM_THRESHOLD_"],
        )
    )
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    return b.getOrCreate()
