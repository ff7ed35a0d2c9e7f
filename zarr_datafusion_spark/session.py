"""SparkSession factory and driver-testdata table registry.

The reference builds a DataFusion ``SessionState`` with information_schema
enabled, a ZARR table factory, and two custom optimizer rules
(reference ``src/bin/zarr_cli/main.rs:54-65``).  The Spark analog is a
``SparkSession`` configured for Arrow + AQE, plus temp views for the
driver's parquet tables; the Zarr source and the statistics rules live in
:mod:`zarr_datafusion_spark.zarr` and :mod:`zarr_datafusion_spark.stats`.

Scale posture: shuffle partitions default to the local core count but are
just a config knob — on a 1000-executor cluster the same code runs with
``spark.sql.shuffle.partitions`` sized to the cluster, and AQE coalesces /
splits at runtime.  Nothing here materializes data on the driver.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

#: Tables the driver generates at /root/testdata/sf*/ (TESTDATA.md).
TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def get_spark(app_name: str = "zarr_datafusion_spark") -> SparkSession:
    """Build (or fetch) the configured SparkSession.

    Config notes (each matters at 100 TB, not just locally):

    * AQE on: runtime coalescing, skew-join splitting, dynamic join
      strategy switch — replaces hand-tuned partition counts.
    * Arrow on: vectorized Python<->JVM boundary for the Zarr source,
      pandas UDFs, and collect.
    * UTC session timezone: deterministic timestamp semantics and
      DuckDB-oracle comparability.
    * shuffle partitions ~ cores for local mode; a cluster deployment
      overrides via spark-defaults (AQE re-coalesces anyway).
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 4))
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.python.filterPushdown.enabled", "true")
        .config("spark.sql.parquet.aggregatePushdown", "true")
        # Whole-stage-codegen class cache: the default 100 entries
        # thrashes on a many-query workload (each query compiles 2-5
        # classes; recompiles cost seconds).  Classes are small; keep
        # them all.
        .config("spark.sql.codegen.cache.maxEntries", "5000")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def normalize_event_ts(df: DataFrame) -> DataFrame:
    """Normalize an ``events`` DataFrame's ``ts`` column to a session-TZ
    TIMESTAMP in microseconds, whatever encoding the parquet used.

    The driver's testdata has shipped ``events.ts`` two ways across
    regenerations:

    * parquet TIMESTAMP(NANOS) — Spark's vectorized reader rejects it,
      so with ``spark.sql.legacy.parquet.nanosAsLong=true`` it arrives
      as a raw ns-since-epoch LongType; convert with exact integer math
      (``DIV 1000`` — float division would lose precision at 1e18 ns
      magnitudes).
    * parquet ``timestamp[us]`` — arrives as TIMESTAMP_NTZ; only a
      cast to session-TZ TIMESTAMP is needed (value-preserving under
      the UTC session timezone, and required because ``unix_micros``
      and streaming ``window()`` reject NTZ input).

    Type-adaptive so the next testdata regeneration cannot break every
    events consumer again (round-3 regression).
    """
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    t = df.schema["ts"].dataType
    if isinstance(t, T.LongType):
        return df.withColumn("ts", F.expr("timestamp_micros(ts DIV 1000)"))
    return df.withColumn("ts", F.col("ts").cast("timestamp"))


def _broadcast_threshold_bytes(spark: SparkSession) -> int:
    """Parse ``spark.sql.autoBroadcastJoinThreshold`` into bytes
    (accepts the bare-number default and k/m/g suffixes); -1 disables."""
    raw = str(spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760"))
    raw = raw.strip().lower().removesuffix("b")
    mult = 1
    for suffix, m in (("k", 1 << 10), ("m", 1 << 20), ("g", 1 << 30)):
        if raw.endswith(suffix):
            raw, mult = raw[:-1], m
            break
    try:
        return int(raw) * mult
    except ValueError:
        return -1


#: On-disk parquet is snappy-compressed + encoded; decoded in-memory
#: rows run a conservative ~5x larger.  A table only gets the STATIC
#: broadcast hint when even that pessimistic estimate fits the
#: threshold, so the hint can never force a spill-sized broadcast.
_BROADCAST_FILE_FACTOR = 5


def _static_broadcast_hint(spark: SparkSession, df: DataFrame, path: str) -> DataFrame:
    """A6 statistics -> Catalyst (VERDICT r5 item 8): dimension tables
    whose FILE size proves them broadcast-small get the broadcast hint
    at registration, so dimension-chain joins (Q5's nation/region/
    supplier ladder, Q21's nation filter) plan broadcast joins from
    static metadata instead of relying on AQE's runtime re-plan.  The
    reference feeds exact row counts to DataFusion's planner the same
    way (``src/datasource/zarr.rs:191-254``); for parquet the size is a
    pure footer/stat fact — no data scan."""
    thresh = _broadcast_threshold_bytes(spark)
    if thresh <= 0:
        return df
    try:
        size = os.path.getsize(path)
    except OSError:
        return df
    if size * _BROADCAST_FILE_FACTOR <= thresh:
        return df.hint("broadcast")
    return df


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one driver parquet table (columnar scan, pushdown-capable).

    ``events.ts`` is normalized to a microsecond session-TZ TIMESTAMP
    regardless of the file's physical encoding — see
    :func:`normalize_event_ts`.  Statically-small tables carry a
    broadcast hint derived from file metadata — see
    :func:`_static_broadcast_hint`.
    """
    # Deterministic timestamp semantics regardless of who built the
    # session (the driver hands queries its own SparkSession):
    # date_trunc / CAST(ts AS DATE) / window() are session-timezone
    # dependent, and the DuckDB oracle computes in UTC.  Runtime-settable.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        # Harmless for timestamp[us] files; lets TIMESTAMP(NANOS) files
        # load as LongType instead of crashing the vectorized reader.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = normalize_event_ts(spark.read.parquet(path))
    else:
        df = spark.read.parquet(path)
    return _static_broadcast_hint(spark, df, path)


def register_tables(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> dict[str, DataFrame]:
    """Register every driver table as a temp view; returns name -> DataFrame.

    Mirrors the reference REPL's table registration step
    (``src/bin/zarr_cli/main.rs:55-64``) for the parquet testdata.
    """
    dfs: dict[str, DataFrame] = {}
    for name in TABLES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if not os.path.exists(path):
            continue
        df = load_table(spark, sf_dir, name)
        df.createOrReplaceTempView(name)
        dfs[name] = df
    return dfs
