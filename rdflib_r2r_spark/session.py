"""SparkSession factory tuned for the sandbox (local[N]) but written for
cluster scale: AQE on (runtime re-plan + skew-join), Arrow on (pandas-UDF
stages), explicit shuffle-partition sizing.
"""

from __future__ import annotations

import os
from pathlib import Path

from pyspark.sql import SparkSession

# Python workers (pandas UDFs) are separate processes: they need this package
# importable regardless of the driver's cwd/sys.path. On a cluster the same
# is achieved with spark-submit --py-files of the packaged zip.
_REPO_ROOT = str(Path(__file__).resolve().parents[1])


def _ensure_pythonpath() -> None:
    pp = os.environ.get("PYTHONPATH", "")
    if _REPO_ROOT not in pp.split(os.pathsep):
        os.environ["PYTHONPATH"] = (pp + os.pathsep if pp else "") + _REPO_ROOT


def get_spark(
    app_name: str = "rdflib_r2r_spark",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession.

    ``cores`` defaults to $SPARK_GRAFT_CPUS or ``*``. Shuffle partitions
    default to the core count (local mode: shuffles are on-box, 200 default
    just adds task overhead; on a real cluster the caller sizes this to
    2-3x total cores).
    """
    _ensure_pythonpath()
    if cores is None:
        env = os.environ.get("SPARK_GRAFT_CPUS")
        master = f"local[{env}]" if env else "local[*]"
        n = int(env) if env else (os.cpu_count() or 8)
    else:
        master = f"local[{cores}]"
        n = cores
    if shuffle_partitions is not None:
        sp = shuffle_partitions
    else:
        env_sp = os.environ.get("SPARK_GRAFT_SHUFFLE_PARTS")
        sp = int(env_sp) if env_sp else max(n, 8)
    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(sp))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        # rr:sqlQuery sources use ANSI double-quoted identifiers (the W3C
        # R2RML suite is written that way); string literals in engine-built
        # SQL are single-quoted throughout, so this is safe to enable
        .config("spark.sql.ansi.doubleQuotedIdentifiers", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # stay under the compressed-OOPs limit: heaps >~32g disable pointer
        # compression and anti-scale with thread count (measured: md5 bench
        # 2.5s @16g/32thr vs 16.9s @32g/32thr). Spill goes to disk anyway.
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "16g"))
        # throughput GC: the allocation-heavy array/string stages are bound
        # by G1's concurrent overhead at high thread counts (measured:
        # signature stage 24s G1 -> 15.6s ParallelGC @ local[32]); batch
        # analytics prefers max-throughput stop-the-world collection. On a
        # cluster, set the same via spark.executor.extraJavaOptions.
        .config(
            "spark.driver.extraJavaOptions",
            os.environ.get("SPARK_GRAFT_JAVA_OPTS", "-XX:+UseParallelGC"),
        )
        # default 128m packs this box's small inputs into fewer read
        # partitions than cores, starving map stages (e.g. 1.2GB corpus ->
        # 10 tasks on 32 cores). 32m keeps scans wide here; clusters reading
        # 100TB keep the default (splits are plentiful there).
        .config("spark.sql.files.maxPartitionBytes", os.environ.get("SPARK_GRAFT_MAX_PART_BYTES", "33554432"))
        # parquet codec: zstd trades (parallel) CPU for (serial, single-disk
        # here) write bytes — a scaling lever on one box, and on clusters it
        # cuts shuffle-stage-adjacent storage I/O; A/B via env
        .config(
            "spark.sql.parquet.compression.codec",
            os.environ.get("SPARK_GRAFT_PARQUET_CODEC", "snappy"),
        )
        # InferFiltersFromGenerate adds `size(arr) > 0` under every
        # non-outer explode and pushes it below the projection, INLINING
        # the array expression into the filter — regex/tokenize/transform
        # chains under an explode evaluate TWICE per input row (measured
        # 5x wall on the char-bigram LM stage, 2x on tokenize). The
        # alternative (explode_outer + isNotNull) single-evaluates but
        # drops the Generate out of whole-stage codegen, which costs more
        # on volume-heavy stages (LSH banding 1.5s -> 5.0s). Excluding the
        # rule keeps inner-explode codegen AND single evaluation; the only
        # thing lost is pre-filtering of empty-array rows, which every
        # caller here either guards explicitly or doesn't care about.
        .config(
            "spark.sql.optimizer.excludedRules",
            "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate",
        )
        .config("spark.ui.enabled", "false")
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


# (applicationId, defaultParallelism, caller key) -> bool.  The guard
# probe (`df.rdd.getNumPartitions()`) costs a physical-planning pass plus
# a Py4J round trip (measured 60-90 ms) PER CALL, and `_t()` pays it on
# every read of a widen-eligible table even when the decision can never
# change within a session (the inputs are static files).  Caching the
# decision is purely a driver-overhead fix: the chosen plan is identical.
_WIDEN_DECISION: dict = {}


def widen_scan(df, cache_key: str | None = None):
    """Guide §2.5 ("input skew: one huge unsplittable file ... repartition
    immediately after the read"): the sandbox corpus parquet is written as
    a SINGLE row group, so the file scan yields 1-2 partitions no matter
    what ``maxPartitionBytes`` says, and every per-row text stage runs on
    1-2 of the session's cores.  Round-robin repartition right after the
    read — but ONLY when the scan is narrower than the session's default
    parallelism, so on a cluster reading well-split 100 TB inputs this is
    a no-op (the guard is derived from the runtime, not a tuned constant).
    The exchange moves corpus bytes once; the starved stages it unblocks
    cost 10-100x more CPU per byte than the move.

    ``cache_key`` (e.g. the parquet path) memoizes the narrow-scan probe
    per (session, parallelism, key); pass it when the same static input is
    read repeatedly in one session."""
    spark = df.sparkSession
    target = spark.sparkContext.defaultParallelism
    if cache_key is not None:
        key = (spark.sparkContext.applicationId, target, cache_key)
        dec = _WIDEN_DECISION.get(key)
        if dec is None:
            dec = df.rdd.getNumPartitions() < target
            _WIDEN_DECISION[key] = dec
    else:
        dec = df.rdd.getNumPartitions() < target
    if dec:
        return df.repartition(target)
    return df
