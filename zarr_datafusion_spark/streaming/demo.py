"""Structured Streaming over the ``events`` table.

The reference engine is batch-only (``Boundedness::Bounded``,
``zarr_exec.rs:102``); this module is the beyond-reference streaming
slice from SURVEY §7: tumbling/sliding watermarked window aggregations
driven by the parquet ``events`` fixture through a file source, with a
memory sink so tests and the driver can read results synchronously.

The batch/stream parity property: a tumbling-window streaming
aggregation in *complete* mode over a finite file source must equal the
equivalent batch GROUP BY — that's the oracle the driver checks.

Scale notes: the same topology runs against Kafka by swapping
``readStream.format``; watermark bounds state, window+key is the state
key, and ``spark.sql.shuffle.partitions`` sizes the state store spread.
"""

from __future__ import annotations

import os
from itertools import count

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..session import normalize_event_ts

_sink_ids = count()


def _event_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source stream of the events parquet.

    The stream schema is derived from a batch read of the same file —
    never hardcoded — so whichever ts encoding the testdata ships
    (ns-as-long or timestamp[us]) the stream sees exactly what the batch
    reader sees, and ``normalize_event_ts`` applies the matching
    conversion (the round-3 regression was a hardcoded LongType schema
    silently dividing microseconds by 1000)."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")  # oracle determinism
    path = os.path.join(sf_dir, "events.parquet")
    schema = spark.read.parquet(path).schema
    # The file stream source requires a directory; glob-filter the
    # events file out of the shared sf_dir.
    stream = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    return normalize_event_ts(stream)


def _run_to_memory(agg: DataFrame, mode: str) -> DataFrame:
    """Drive a finite streaming query to completion into a memory sink
    and return the sink table (synchronous: processAllAvailable).

    The memory-sink temp view is dropped after the result is decoupled
    via an eager localCheckpoint, so repeated calls don't park one
    result copy per invocation in driver memory for the session's
    lifetime.

    State-store parallelism: a stateful query allocates one state store
    per shuffle partition *per stateful operator*, each with its own
    commit/snapshot files every micro-batch — the standard deployment
    knob is to size ``spark.sql.shuffle.partitions`` to the stream's
    key volume before the first start (it is frozen into the
    checkpoint).  The demo streams carry thousands of keys, so 8 stores
    beat the batch-tuned 32; the batch setting is restored after the
    run."""
    spark = agg.sparkSession
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    name = f"zds_stream_sink_{next(_sink_ids)}"
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "8")
        q = (
            agg.writeStream.outputMode(mode)
            .format("memory")
            .queryName(name)
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    out = spark.table(name).localCheckpoint(eager=True)
    spark.catalog.dropTempView(name)
    return out


def streaming_event_counts(
    spark: SparkSession, sf_dir: str, window: str = "5 minutes"
) -> DataFrame:
    """Tumbling-window watermarked counts per event_type (the §7 demo).

    Complete output mode so every window is emitted even though the
    file source is finite (append would hold back unclosed windows)."""
    agg = (
        _event_stream(spark, sf_dir)
        .withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("sum_value"),
        )
    )
    out = _run_to_memory(agg, "complete")
    return out.select(
        F.col("w.start").alias("window_start"),
        "event_type",
        "n_events",
        "sum_value",
    )


def stream_to_parquet(
    spark: SparkSession, sf_dir: str, out_dir: str, checkpoint_dir: str
) -> int:
    """Streaming file sink with checkpointing: windowed counts appended
    to parquet exactly-once (the production topology — memory sinks are
    test-only).  Returns the number of result rows written.  Restarting
    with the same checkpoint resumes instead of reprocessing — that's
    the exactly-once contract a 100 TB pipeline needs."""
    agg = (
        _event_stream(spark, sf_dir)
        .withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n_events"))
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
        )
    )
    q = (
        agg.writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.read.parquet(out_dir).count()


def streaming_dedup_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming exact dedup with bounded state:
    ``dropDuplicatesWithinWatermark`` expires per-id state once the
    watermark passes it (plain ``dropDuplicates`` on a non-event-time
    key keeps state forever — unbounded on a real stream).

    The stream is unioned with itself so every id genuinely arrives
    twice — the fixture's ids are unique, and without the union the
    dedup operator would never actually remove a row (a vacuous test).
    Result equals batch DISTINCT over one copy — the oracle."""
    stream = _event_stream(spark, sf_dir)
    dedup = (
        stream.union(_event_stream(spark, sf_dir))
        .withWatermark("ts", "10 minutes")
        .dropDuplicatesWithinWatermark(["event_id"])
        .select("event_id", "event_type")
    )
    return _run_to_memory(dedup, "append")


def sliding_window_rates(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Sliding windows (10 min length, 5 min slide): overlapping-window
    event rates — each event lands in two windows."""
    agg = (
        _event_stream(spark, sf_dir)
        .withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "10 minutes", "5 minutes").alias("w"))
        .agg(F.count("*").alias("n_events"))
    )
    out = _run_to_memory(agg, "complete")
    return out.select(
        F.col("w.start").alias("window_start"),
        F.col("w.end").alias("window_end"),
        "n_events",
    )


def streaming_gopher_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ingest-time quality gate: the Gopher rule flags applied to a
    DOCUMENTS file stream, keep-rates aggregated per (lang, source) in
    complete mode.

    This is how a 100 TB pipeline actually deploys a quality filter —
    at ingest, on the stream, not as a later batch pass — and it works
    here because :func:`...operators.textstats.gopher_flags` is pure
    map-side expression work (the minhash-signature rule from round 5:
    per-row folds attach to a stream unchanged; per-doc groupBys would
    be an unsupported unwatermarked aggregation).  The only stateful
    operator is the final bounded-key (lang × source) aggregate.
    Oracle: the identical batch GROUP BY over the batch gopher frame."""
    from zarr_datafusion_spark.operators.textstats import gopher_flags

    path = os.path.join(sf_dir, "documents.parquet")
    schema = spark.read.parquet(path).schema
    stream = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "documents.parquet")
        .parquet(sf_dir)
    )
    agg = (
        gopher_flags(stream, extra=("lang", "source"))
        .groupBy("lang", "source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("keep").cast("bigint").alias("n_keep"),
            F.sum("n_rules_passed").cast("bigint").alias("sum_rules_passed"),
        )
    )
    return _run_to_memory(agg, "complete")
