"""SparkSession factory with the engine's scale discipline baked in.

These settings are the local-mode projection of the production posture
(1000-executor cluster over a 10^12-row Iceberg table): AQE on (runtime
skew-join splitting + partition coalescing), Arrow enabled with bounded
batch sizes (the memory-ceiling analog of the reference's recognition batch
size 6), and Python worker reuse (per-executor kernel warm-up amortized, the
model-session-caching analog).
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import SparkSession

__all__ = ["build_session", "default_parallelism", "ship_package"]


def ship_package(spark: SparkSession) -> None:
    """Ship this package to executors — the in-process analog of
    ``spark-submit --py-files texteller_spark.zip`` (north rule). Makes the
    session independent of the driver's working directory."""
    sc = spark.sparkContext
    if getattr(sc, "_texteller_shipped", False):
        return
    sc._texteller_shipped = True
    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    stage = tempfile.mkdtemp(prefix="texteller_pyfiles_")
    zip_path = shutil.make_archive(
        os.path.join(stage, "texteller_spark"), "zip",
        root_dir=os.path.dirname(pkg_dir), base_dir=os.path.basename(pkg_dir),
    )
    sc.addPyFile(zip_path)


def default_parallelism() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def _build(
    app: str = "texteller_spark",
    cpus: int | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    n = cpus or default_parallelism()
    shuffle = shuffle_partitions or max(2 * n, 32)
    # SPARK_GRAFT_MASTER overrides the master URL — used by the scaling
    # experiment to run the identical job under local-cluster[N,cores,mem]
    # (N separate executor JVMs on this host, each with its own Arrow feed
    # path — the closest in-sandbox approximation of a multi-executor
    # cluster; see tools/bench_cluster_scaling.py)
    master = os.environ.get("SPARK_GRAFT_MASTER", f"local[{n}]")
    builder = SparkSession.builder.master(master)
    if master.startswith("local-cluster"):
        builder = builder.config(
            "spark.executor.memory", os.environ.get("SPARK_GRAFT_EXEC_MEM", "4g")
        )
        # Per-executor JVM sizing — what a real cluster's cgroups/YARN give
        # each executor for free. Without it every co-hosted executor JVM
        # sizes GC/JIT/netty pools for ALL host cores (4 JVMs × 32-core
        # pools = thread storm), and cold heaps pay page-fault+usercopy
        # costs inside the measured window. Measured on the 4x8 probe:
        # steady-state 14-17k → 23-29k docs/s, kernel time 25-34% → 6-21%.
        try:
            cores = int(master.split("[")[1].split(",")[1])
        except (IndexError, ValueError):
            cores = 8
        builder = builder.config(
            "spark.executor.extraJavaOptions",
            f"-XX:ActiveProcessorCount={cores} -XX:+AlwaysPreTouch "
            "-XX:+UseParallelGC -XX:ParallelGCThreads=4",
        )
    return (
        builder.appName(app)
        .config("spark.sql.shuffle.partitions", str(shuffle))
        # WARC-Date is UTC by spec; pinning the session tz makes every
        # timestamp derived from crawl data host-timezone-independent
        # (naive-UTC datetimes from the WARC parser land unchanged)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "2048")
        .config("spark.python.worker.reuse", "true")
        # UDF-heavy scans: smaller splits → parallelism without a repartition
        # shuffle (32 MB ≈ a few thousand pages per task)
        .config("spark.sql.files.maxPartitionBytes", str(32 * 1024 * 1024))
        # Iterative operators (the cluster-closure loop) generate a fresh
        # codegen class per round; at the default 100-entry codegen cache
        # they evict every other query's compiled+JITed class, and the NEXT
        # run of an evicted query pays Janino recompile plus a cold C2 JIT
        # warm-up — measured 13.3 s vs 5.0 s on the 100k-page curation scan
        # right after three closure runs (executors idle, C2 thread at 31 s
        # CPU). The entries are small (compiled classes; Metaspace-side,
        # a few KB each) — sized so a full multi-pass bench sweep (42
        # entries x 3 interleaved passes, each closure pass generating
        # dozens of per-round classes) stays resident with margin. Note
        # (r5): an apparent eviction signature in the full sweep (one scan
        # query 4 s fresh vs 15-18 s in-sweep) was root-caused NOT to this
        # cache but to hypervisor CPU steal — 32% steal and 4.5x per-vCPU
        # skew measured under 32-core load in the degraded window
        # (BENCH.md "Host steal"); the raise from 4096 is kept as cheap
        # headroom, it is not load-bearing for that symptom
        .config("spark.sql.codegen.cache.maxEntries", "65536")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )


def build_session(
    app: str = "texteller_spark",
    cpus: int | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    spark = _build(app, cpus, shuffle_partitions)
    ship_package(spark)
    return spark
