"""SparkSession factory with scale-oriented defaults.

Local testing runs ``local[N]`` in one JVM; the same configs are what we'd
submit with ``spark-submit --py-files`` on a real cluster (see README).
"""

from __future__ import annotations

import os
import tempfile
import zipfile

from pyspark.sql import SparkSession

# Defaults chosen for the sandbox (local[32], 128 GiB). On a real cluster the
# same knobs are set per-job; shuffle partitions scale with executor count.
_DEFAULTS = {
    # AQE gives runtime re-planning: partition coalescing, skew-join splits,
    # broadcast conversion — all required at 100 TB scale.
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # Arrow is the transport for every pandas UDF kernel in this engine.
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # Large Arrow batches amortize the per-batch Python/serialization cost
    # of the pandas-UDF kernels (they are all O(batch) NumPy inside).
    "spark.sql.execution.arrow.maxRecordsPerBatch": "131072",
    # Deterministic timestamps in tests.
    "spark.sql.session.timeZone": "UTC",
    # Keep the UI off in the sandbox; a real deploy re-enables it.
    "spark.ui.enabled": "false",
    "spark.sql.shuffle.partitions": "32",
    # Broadcast threshold: dimension tables in this engine (conditions,
    # country refs, admin metadata, polygon covers) are tiny vs the fact side.
    "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
    # ContextCleaner only reaps unreferenced shuffle/broadcast/checkpoint
    # blocks after a DRIVER GC, and the stock periodicGC interval (30 min)
    # outlives whole local jobs on a 48g heap that rarely GCs on its own —
    # superseded iteration checkpoints and finished queries' shuffle state
    # pile up and progressively inflate later queries (measured: the same
    # operator 2x slower 100+ queries into a session). 45s keeps the
    # cleaner live; on a long-lived cluster driver the same setting is the
    # published guidance for iterative workloads (guide §5).
    "spark.cleaner.periodicGC.interval": os.environ.get(
        "SPARK_GRAFT_PERIODIC_GC", "45s"
    ),
}


def get_spark(
    app_name: str = "morituri_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the session.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (env, default 32) so
    bench.py can pin parallelism for the N-vs-4N scaling evidence.
    """
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
        master = f"local[{cpus}]"
    builder = SparkSession.builder.appName(app_name).master(master)
    conf = dict(_DEFAULTS)
    # Local mode runs everything in the driver JVM, whose default heap is
    # 1g — a hard GC wall once caches + 32 concurrent tasks compete. Size it
    # to the machine (cluster deploys size executors instead).
    conf.setdefault("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "48g"))
    conf.setdefault("spark.driver.maxResultSize", "4g")
    if shuffle_partitions is not None:
        conf["spark.sql.shuffle.partitions"] = str(shuffle_partitions)
    if extra_conf:
        conf.update(extra_conf)
    for k, v in conf.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    _ship_package(spark)
    return spark


def _ship_package(spark: SparkSession) -> None:
    """Ship morituri_spark to executors (the ``spark-submit --py-files``
    mechanism, applied programmatically so UDF closures that reference
    module-level kernels import cleanly on workers regardless of cwd)."""
    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    # .txt rides along for package data (ISO-639-2 table) — loaded on
    # workers via importlib.resources, which reads from inside the zip.
    _SHIP = (".py", ".txt")
    sources = [
        os.path.join(root, f)
        for root, _, files in os.walk(pkg_dir)
        for f in files
        if f.endswith(_SHIP)
    ]
    if not sources:
        # imported from a --py-files zip: spark-submit already shipped us
        return
    zip_path = os.path.join(tempfile.gettempdir(), "morituri_spark_pyfiles.zip")
    if not os.path.exists(zip_path) or os.path.getmtime(zip_path) < max(
        map(os.path.getmtime, sources)
    ):
        with zipfile.ZipFile(zip_path + ".tmp", "w") as zf:
            for full in sources:
                rel = os.path.join("morituri_spark", os.path.relpath(full, pkg_dir))
                zf.write(full, rel)
        os.replace(zip_path + ".tmp", zip_path)
    spark.sparkContext.addPyFile(zip_path)
