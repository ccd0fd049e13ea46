"""Filesystem probes through the Hadoop FS API.

A bare ``spark.read.parquet`` wrapped in ``except Exception`` cannot tell
"the table genuinely does not exist yet" from "the read transiently
failed" — and treating the latter as the former silently drops state
(dedup ledgers, silver models). These helpers make absence an explicit,
narrow check so every other failure propagates; they speak whatever
filesystem the session's Hadoop conf resolves (local, HDFS, s3a, ...).
"""

from __future__ import annotations

from pyspark.sql import SparkSession


def hadoop_path_exists(spark: SparkSession, path: str) -> bool:
    """True iff ``path`` exists on its (Hadoop-resolved) filesystem."""
    jvm = spark._jvm
    hconf = spark._jsc.hadoopConfiguration()
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    return jpath.getFileSystem(hconf).exists(jpath)
