"""Stage-by-stage dissection of dedup_setsim_prefix_join (r14 opt round).

Times cumulative sub-pipelines of the PPJoin ladder with the noop sink
(guide §1.4) so the expensive stage is identified before anything is
changed.  Run on a QUIET box:

    python scripts/setsim_dissect.py [sf_dir] [reps]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from zarr_datafusion_spark.operators.dedup import _GRAMS_EXPR
from zarr_datafusion_spark.operators.extras import (
    SETSIM_PREFIX_THRESHOLD,
    setsim_prefix_join,
)

SF = sys.argv[1] if len(sys.argv) > 1 else "data/sf1"
REPS = int(sys.argv[2]) if len(sys.argv) > 2 else 3


def force(df):
    df.write.format("noop").mode("overwrite").save()


def best(spark, label, build):
    b = float("inf")
    for _ in range(REPS):
        t0 = time.perf_counter()
        spark.sparkContext.setJobDescription(label)
        force(build())
        b = min(b, time.perf_counter() - t0)
    print(f"{label:35s} {b:7.2f} s")
    return b


def main():
    spark = (
        SparkSession.builder.master(
            f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]"
        )
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    t = SETSIM_PREFIX_THRESHOLD
    docs = spark.read.parquet(os.path.join(SF, "documents.parquet"))
    print(f"docs: {docs.count()}")

    def g_df():
        return (
            docs.select("doc_id", F.expr(_GRAMS_EXPR).alias("grams"))
            .withColumn("n", F.size("grams"))
            .withColumn(
                "gh",
                F.expr("array_distinct(transform(grams, x -> xxhash64(x)))"),
            )
        )

    def tok_of(g):
        return g.select("doc_id", "n", F.explode("grams").alias("gram"))

    def prefix_of(g):
        tok = tok_of(g)
        df_ = tok.groupBy("gram").agg(F.count(F.lit(1)).alias("df"))
        return (
            tok.join(df_, "gram")
            .withColumn(
                "rnk",
                F.row_number().over(
                    W.partitionBy("doc_id").orderBy("df", "gram")
                ),
            )
            .filter(
                F.col("rnk") <= F.col("n") - F.ceil(F.lit(t) * F.col("n")) + 1
            )
            .select("doc_id", "n", "rnk", F.xxhash64("gram").alias("gk"))
        )

    def cand_of(g):
        prefix = prefix_of(g)
        pa = prefix.select(
            F.col("doc_id").alias("doc_a"), F.col("n").alias("na"),
            F.col("rnk").alias("ia"), "gk",
        )
        pb = prefix.select(
            F.col("doc_id").alias("doc_b"), F.col("n").alias("nb"),
            F.col("rnk").alias("ib"), "gk",
        )
        return (
            pa.join(pb, "gk")
            .filter(F.col("doc_a") < F.col("doc_b"))
            .filter(
                F.least("na", "nb").cast("double")
                >= F.lit(t) * F.greatest("na", "nb").cast("double")
            )
            .filter(
                1
                + F.least(F.col("na") - F.col("ia"), F.col("nb") - F.col("ib"))
                >= F.ceil(F.lit(t / (1.0 + t)) * (F.col("na") + F.col("nb")))
            )
            .select("doc_a", "doc_b")
            .distinct()
        )

    # row counts (uncached, one pass each)
    g = g_df().localCheckpoint(eager=False)
    cand = cand_of(g)
    n_cand = cand.count()
    print(f"candidate pairs: {n_cand}")
    screen_j = (
        "CAST(size(array_intersect(a_gh, b_gh)) AS DOUBLE)"
        " / (size(a_gh) + size(b_gh) - size(array_intersect(a_gh, b_gh)))"
    )
    ga = g.select(
        F.col("doc_id").alias("doc_a"),
        F.col("grams").alias("a_grams"), F.col("gh").alias("a_gh"),
    )
    gb = g.select(
        F.col("doc_id").alias("doc_b"),
        F.col("grams").alias("b_grams"), F.col("gh").alias("b_gh"),
    )
    n_screen = (
        cand.join(ga, "doc_a").join(gb, "doc_b")
        .filter(F.expr(screen_j) >= t)
        .count()
    )
    print(f"post-screen pairs: {n_screen}")
    n_final = setsim_prefix_join(docs, t).count()
    print(f"final pairs: {n_final}")

    # cumulative sub-pipeline timings (each rebuilt from the raw scan;
    # fresh lazy-checkpoint per rep so nothing is reused across reps)
    best(spark, "1 g (grams+gh)", g_df)
    best(spark, "2 + df_ agg", lambda: tok_of(g_df()).groupBy("gram").count())
    best(spark, "3 + prefix (join+window)", lambda: prefix_of(g_df()))
    best(
        spark,
        "4 + cand (selfjoin+distinct)",
        lambda: cand_of(g_df().localCheckpoint(eager=False)),
    )

    def screen_pipeline():
        gg = g_df().localCheckpoint(eager=False)
        c = cand_of(gg)
        ga_ = gg.select(
            F.col("doc_id").alias("doc_a"),
            F.col("grams").alias("a_grams"), F.col("gh").alias("a_gh"),
        )
        gb_ = gg.select(
            F.col("doc_id").alias("doc_b"),
            F.col("grams").alias("b_grams"), F.col("gh").alias("b_gh"),
        )
        return (
            c.join(ga_, "doc_a").join(gb_, "doc_b")
            .filter(F.expr(screen_j) >= t)
        )

    best(spark, "5 + screen join+filter", screen_pipeline)
    best(spark, "6 full (shipped)", lambda: setsim_prefix_join(docs, t))


if __name__ == "__main__":
    main()
