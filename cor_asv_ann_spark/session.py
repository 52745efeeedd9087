"""SparkSession factory used by tests, bench, and jobs.

Local mode is single-JVM; the knobs that matter there are
shuffle-partition count (≈ cores), AQE, and Arrow batching for the
pandas-UDF stages. The default batch is 2048 rows: the high-volume
vectorized UDFs (LSH pair verification, simhash packing) amortize
per-batch overhead far better than the old 256 (measured: the
embedding verify alone lost ~0.8 s/pass to 7k tiny batches at sf0.1),
while the inference stage is batch-size-insensitive — the model
corrector vectorizes across whatever Arrow hands it (the reference
batches 256 lines per model call, lib/seq2seq.py:111, purely as its
own fixed buffer size; decode results are per-line and
batch-independent).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def spread_input(df, min_parts: int | None = None):
    """Round-robin repartition when the incoming frame has fewer
    partitions than the box has cores: a single-file fixture (one row
    group) or an unsplittable shard otherwise serializes the WHOLE
    narrow prefix of a job — shingling, hashing, explode + partial
    aggregation all run on one core before the first exchange (guide
    §2.5 input skew). No-op on well-split tables, so at warehouse scale
    this never adds an exchange. Only used by operators whose
    aggregates are partition-order independent (integer-exact sums /
    per-row or per-doc computation) — float accumulations keep their
    input partitioning."""
    sc = df.sparkSession.sparkContext
    n = min_parts or sc.defaultParallelism
    try:
        size = df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()
        max_pb = int(
            df.sparkSession.conf.get(
                "spark.sql.files.maxPartitionBytes", "134217728"
            ).rstrip("b")
        )
    except Exception:
        return df
    # fewer estimated splits than cores ⇔ estimated bytes below
    # n × maxPartitionBytes. Plan statistics are analysis-only — the
    # previous df.rdd.getNumPartitions() probe built the whole
    # Python-RDD conversion (~0.3 s of pure overhead per call)
    if size < n * max_pb:
        return df.repartition(n)
    return df


def build_session(
    app: str = "cor_asv_ann_spark",
    cpus: int | None = None,
    shuffle_partitions: int | None = None,
    arrow_batch: int = 2048,
    extra: dict[str, str] | None = None,
    master: str | None = None,
) -> SparkSession:
    """``master`` overrides the default ``local[cpus]`` — e.g.
    ``local-cluster[4,4,3072]`` for real separate executor JVMs (used by
    ``bench.py --scaling-cluster`` as the closest sandbox analogue of
    the north rule's N- vs 4N-executor cluster runs)."""
    cpus = cpus or DEFAULT_CPUS
    shuffle_partitions = shuffle_partitions or cpus
    # one BLAS thread per Python worker: the numpy inference GEMMs are
    # small, and N workers × multithreaded OpenBLAS oversubscribes the
    # box (measured: local[32] slower than local[8] without this)
    for var in ("OMP_NUM_THREADS", "OPENBLAS_NUM_THREADS", "MKL_NUM_THREADS"):
        os.environ.setdefault(var, "1")
    b = (
        SparkSession.builder.master(master or f"local[{cpus}]")
        .appName(app)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # keep AQE, but not its empty-relation rewrite: when a banded
        # join's capped side comes up empty, that rule prunes the whole
        # observed subtree and the no-silent-caps drop metrics
        # (similarity.cap_buckets) vanish exactly in the degenerate case
        # they exist to report. The rewrite only saves work on
        # empty-branch queries, which corpus-scale pipelines don't have.
        .config(
            "spark.sql.adaptive.optimizer.excludedRules",
            "org.apache.spark.sql.execution.adaptive.AQEPropagateEmptyRelation",
        )
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", str(arrow_batch))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.parquet.compression.codec", "snappy")
    )
    for k, v in (extra or {}).items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
