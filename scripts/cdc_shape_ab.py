"""A/B the two boundary-detection shapes of the CDC core (round 14).

Shape A (shipped through r13): explode ``sequence(w, n)`` to one row
per candidate position — each carrying the doc's full text — then
filter on the md5 window hash.  ~63/64 of the exploded rows are
discarded, but every one pays UnsafeRow materialization with the text
payload.

Shape B (candidate): evaluate the hash test INSIDE one array
expression per doc — ``filter(transform(sequence(w, n), p -> hash
test), ...)`` — so only the surviving boundary positions are ever
exploded into rows.  The boundary SET is byte-identical (same md5
windows, same divisor test), so the oracle and every downstream stage
are untouched; only row-materialization volume changes.

Usage: python scripts/cdc_shape_ab.py [sf_dir] [reps]

MEASURED (r14, sf0.1, local[32], fresh session, suite idle): best-of-3
A 0.222 s vs B 0.251 s, identical 22166-boundary sets — whole-stage
codegen already pipelines explode→filter without materializing the
discarded candidate rows, so the hypothesized UnsafeRow win does not
exist and the shipped Shape A stays.  chunk_cdc's bench cost lives in
the downstream interval assembly + chunk-md5 join, not here.
"""

from __future__ import annotations

import sys
import time

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

sys.path.insert(0, ".")

_W = 16
_D = 64


def _docs(spark, sf_dir):
    import os

    from zarr_datafusion_spark.operators.common import cpu_rebalance

    df = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    return cpu_rebalance(spark, df)


def boundaries_explode_then_filter(d):
    cand = d.select(
        "doc_id", "text", "n",
        F.explode(
            F.expr(
                f"CASE WHEN n < {_W} THEN array() "
                f"ELSE sequence({_W}, n) END"
            )
        ).alias("pos"),
    )
    win = f"substr(text, CAST(pos - {_W - 1} AS INT), {_W})"
    return cand.filter(
        F.expr(
            f"CAST(conv(substring(md5({win}), 1, 8), 16, 10) AS BIGINT) "
            f"% {_D} = 0"
        )
    ).select("doc_id", "pos")


def boundaries_array_internal(d):
    return d.select(
        "doc_id",
        F.explode(
            F.expr(
                f"CASE WHEN n < {_W} THEN array() ELSE "
                f"filter(sequence({_W}, n), p -> "
                f"CAST(conv(substring(md5("
                f"substr(text, CAST(p - {_W - 1} AS INT), {_W})"
                f"), 1, 8), 16, 10) AS BIGINT) % {_D} = 0) END"
            )
        ).alias("pos"),
    )


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "8g")
        .appName("cdc-shape-ab")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    d = _docs(spark, sf_dir).filter(F.length("text") >= 1).select(
        "doc_id", "text", F.length("text").alias("n")
    )
    d.localCheckpoint().count()
    dc = d.localCheckpoint()

    shapes = {
        "A_explode_then_filter": boundaries_explode_then_filter,
        "B_array_internal": boundaries_array_internal,
    }
    # warm both, then alternate reps
    results: dict[str, list[float]] = {k: [] for k in shapes}
    counts = {}
    for name, fn in shapes.items():
        counts[name] = fn(dc).count()
    assert len(set(counts.values())) == 1, counts  # identical boundary sets
    for _ in range(reps):
        for name, fn in shapes.items():
            t0 = time.perf_counter()
            fn(dc).write.format("noop").mode("overwrite").save()
            results[name].append(time.perf_counter() - t0)
    for name, ts in results.items():
        print(f"{name}: best {min(ts):.3f}s  all {[round(t, 3) for t in ts]}  "
              f"boundaries={counts[name]}")
    spark.stop()


if __name__ == "__main__":
    main()
