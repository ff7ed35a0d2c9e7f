"""A/B harness for the round-14 session-2 candidates (same JVM,
alternating order, best-of-N, result-equality asserted in-run).

Experiment 1 — dedup_exact fingerprint width (guide §2.3):
  Shape A (shipped): COUNT(DISTINCT md5_hex) — the distinct exchange
  carries a 32-char STRING key.
  Shape B: COUNT(DISTINCT unhex(md5_hex)) — BINARY(16), bijective with
  the hex spelling, so n_unique (and everything derived) is unchanged
  while the distinct-exchange key bytes halve.

Experiment 2 — text_inverted_index join-back (guide §2.4):
  Shape A (shipped): tok.distinct() feeds TWO branches — groupBy(token)
  for df and window(token)+groupBy(token) for the posting head — joined
  back on token (3 exchanges + a join).
  Shape B: ONE window pass computes df (count over the token partition)
  and rn (row_number) together; the groupBy(token) after the window
  reuses its partitioning (2 exchanges, no join).

Usage: python scripts/ab_r14_s2.py [sf_dir] [reps]

MEASURED (r14 third session, local[32], same-JVM alternating
best-of-6, results asserted identical in-run):

  dedup_exact   sf0.1: A best 0.598 vs B 0.607 (parity)
                sf1:   A best 0.786 vs B 0.869 — hex AHEAD: the
                partial aggregate dedups map-side so the distinct
                exchange has no volume for the narrower key to win
                on, and unhex adds per-row cost.  Shape A stays.
  inv_index     sf0.1: A best 0.604 vs B 0.633 (B med 0.856 vs 0.762)
                sf1:   A best 2.503 vs B 2.436 (parity)
                The df branch aggregates to a ~31-row broadcast side,
                so the join it feeds is nearly free while B's extra
                full-data window pass is not.  Shape A stays.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from zarr_datafusion_spark.operators.common import cpu_rebalance

_INV_HEAD_K = 8


def _noop(df):
    t0 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def _docs(spark, sf_dir):
    return cpu_rebalance(
        spark, spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    )


def dedup_exact_a(spark, sf_dir):
    fp = _docs(spark, sf_dir).select(
        "doc_id",
        F.md5(F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " ")).alias(
            "fingerprint"
        ),
    )
    return fp.agg(
        F.count("*").alias("n_docs"),
        F.countDistinct("fingerprint").alias("n_unique"),
        (F.count("*") - F.countDistinct("fingerprint")).alias("n_exact_dups"),
        F.min("doc_id").alias("first_doc"),
    )


def dedup_exact_b(spark, sf_dir):
    fp = _docs(spark, sf_dir).select(
        "doc_id",
        F.unhex(
            F.md5(F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " "))
        ).alias("fingerprint"),
    )
    return fp.agg(
        F.count("*").alias("n_docs"),
        F.countDistinct("fingerprint").alias("n_unique"),
        (F.count("*") - F.countDistinct("fingerprint")).alias("n_exact_dups"),
        F.min("doc_id").alias("first_doc"),
    )


def inv_index_a(spark, sf_dir):
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    tok = docs.select(
        "doc_id",
        F.explode(F.split(F.lower(F.trim(F.col("text"))), r"\s+")).alias("token"),
    ).distinct()
    df_counts = tok.groupBy("token").agg(F.count("*").alias("df"))
    wk = W.partitionBy("token").orderBy("doc_id")
    head = (
        tok.withColumn("rn", F.row_number().over(wk))
        .filter(F.col("rn") <= _INV_HEAD_K)
        .groupBy("token")
        .agg(
            F.expr(
                "array_join(transform(array_sort(collect_list(doc_id)), "
                "x -> CAST(x AS STRING)), ',')"
            ).alias("postings_head")
        )
    )
    return df_counts.join(head, "token").select("token", "df", "postings_head")


def inv_index_b(spark, sf_dir):
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    tok = docs.select(
        "doc_id",
        F.explode(F.split(F.lower(F.trim(F.col("text"))), r"\s+")).alias("token"),
    ).distinct()
    wk = W.partitionBy("token").orderBy("doc_id")
    wc = W.partitionBy("token")
    return (
        tok.withColumn("df", F.count("*").over(wc))
        .withColumn("rn", F.row_number().over(wk))
        .filter(F.col("rn") <= _INV_HEAD_K)
        .groupBy("token")
        .agg(
            F.max("df").alias("df"),
            F.expr(
                "array_join(transform(array_sort(collect_list(doc_id)), "
                "x -> CAST(x AS STRING)), ',')"
            ).alias("postings_head")
        )
        .select("token", "df", "postings_head")
    )


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 6
    os.environ.setdefault("SPARK_GRAFT_CPUS", "32")
    from zarr_datafusion_spark.session import get_spark

    spark = get_spark()

    for name, fa, fb in (
        ("dedup_exact", dedup_exact_a, dedup_exact_b),
        ("inv_index", inv_index_a, inv_index_b),
    ):
        # result equality first
        pa = fa(spark, sf_dir).toPandas().sort_values(by=None if False else list(fa(spark, sf_dir).columns)).reset_index(drop=True)
        pb = fb(spark, sf_dir).toPandas().sort_values(by=list(fb(spark, sf_dir).columns)).reset_index(drop=True)
        assert pa.equals(pb), f"{name}: RESULTS DIFFER\nA:\n{pa}\nB:\n{pb}"
        print(f"{name}: results identical ({len(pa)} rows)")
        ta, tb = [], []
        for i in range(reps):
            order = [("A", fa, ta), ("B", fb, tb)]
            if i % 2:
                order.reverse()
            for tag, f, acc in order:
                spark.sparkContext.setJobDescription(f"ab:{name}:{tag}:{i}")
                acc.append(_noop(f(spark, sf_dir)))
        print(
            f"{name}: A best {min(ta):.3f} med {sorted(ta)[len(ta)//2]:.3f} | "
            f"B best {min(tb):.3f} med {sorted(tb)[len(tb)//2]:.3f}"
        )
        print(f"  A raw {['%.3f' % t for t in ta]}")
        print(f"  B raw {['%.3f' % t for t in tb]}")


if __name__ == "__main__":
    main()
