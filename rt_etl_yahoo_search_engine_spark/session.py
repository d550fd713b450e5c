"""SparkSession factory with the engine's standard local-mode configuration."""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

PYBIN = "/root/.pyenv/shims/python3"


def get_spark(
    app: str = "rt-etl-spark-engine",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    driver_mem: str = "24g",
) -> SparkSession:
    cores = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or f"local[{cores}]"
    n = shuffle_partitions or int(master[master.index("[") + 1 : -1].replace("*", "32"))
    if os.path.exists(PYBIN):
        os.environ.setdefault("PYSPARK_PYTHON", PYBIN)
        os.environ.setdefault("PYSPARK_DRIVER_PYTHON", PYBIN)
    return (
        SparkSession.builder.master(master)
        .appName(app)
        .config("spark.sql.shuffle.partitions", str(n))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.driver.memory", driver_mem)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
