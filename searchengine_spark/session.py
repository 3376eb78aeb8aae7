"""SparkSession factory with scale-appropriate defaults.

Local testing runs on local[N]; the same settings translate to a real
multi-executor cluster via spark-submit --py-files (the engine never
assumes single-JVM behavior: all state lives in DataFrames / parquet).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "searchengine-spark",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    if cores is None:
        cores = int(os.environ.get("SPARK_GRAFT_CPUS", "4"))
    if shuffle_partitions is None:
        # ~1 partition per core locally; on a real cluster this is set to
        # 2-3x total cores (AQE coalesces small partitions at runtime).
        shuffle_partitions = max(cores, 4)
    builder = (
        SparkSession.builder.master(f"local[{cores}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        # console progress bars write \r-terminated lines that splice
        # themselves into real stdout lines (they ate 27 OK lines from a
        # gate-replay log); nothing interactive reads them here
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    spark = builder.getOrCreate()
    _ship_package(spark)
    return spark


def _ship_package(spark: SparkSession) -> None:
    """Ship this package to executors — the programmatic equivalent of
    ``spark-submit --py-files`` (north rule). Zips the package source
    (content-addressed name so re-adding is idempotent) and registers it
    with addPyFile so Python workers can unpickle our UDFs regardless of
    the driver's cwd."""
    import hashlib
    import tempfile
    import zipfile

    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    h = hashlib.sha1()
    files = []
    for root, _, names in sorted(os.walk(pkg_dir)):
        for name in sorted(names):
            if name.endswith(".py"):
                p = os.path.join(root, name)
                files.append(p)
                st = os.stat(p)
                h.update(f"{p}:{st.st_mtime_ns}:{st.st_size}".encode())
    zip_path = os.path.join(
        tempfile.gettempdir(), f"searchengine_spark-{h.hexdigest()[:12]}.zip"
    )
    if not os.path.exists(zip_path):
        tmp = zip_path + ".tmp"
        with zipfile.ZipFile(tmp, "w") as zf:
            base = os.path.dirname(pkg_dir)
            for p in files:
                zf.write(p, os.path.relpath(p, base))
        os.replace(tmp, zip_path)
    spark.sparkContext.addPyFile(zip_path)
