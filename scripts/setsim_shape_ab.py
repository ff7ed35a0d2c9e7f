"""Same-JVM rotating A/B of dedup_setsim_prefix_join shapes (r14 opt).

Shapes (all EXACT — each produces the identical pair set, asserted):

  A  shipped ladder (extras.setsim_prefix_join)
  B  + df>1 pre-join filter (a prefix gram with df==1 can't produce a
       pair — both docs must carry it) and a LEAN verify: the screen
       joins attach gh ONLY (the grams string arrays stay out of the
       12M-row candidate intermediates); grams join in for the ~250k
       post-screen survivors only.
  C  B with the df join replaced by count(*) OVER (PARTITION BY gram)
       (one exchange serves df + nothing else; no agg+sort-merge join).

Usage: python scripts/setsim_shape_ab.py [sf_dir] [rounds]
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
ROUNDS = int(sys.argv[2]) if len(sys.argv) > 2 else 3
T = SETSIM_PREFIX_THRESHOLD

SCREEN_J = (
    "CAST(size(array_intersect(a_gh, b_gh)) AS DOUBLE)"
    " / (size(a_gh) + size(b_gh) - size(array_intersect(a_gh, b_gh)))"
)
EXACT_J = (
    "CAST(size(array_intersect(a_grams, b_grams)) AS DOUBLE)"
    " / (size(a_grams) + size(b_grams)"
    "    - size(array_intersect(a_grams, b_grams)))"
)


def g_of(docs):
    return (
        docs.select("doc_id", F.expr(_GRAMS_EXPR).alias("grams"))
        .withColumn("n", F.size("grams"))
        .withColumn(
            "gh", F.expr("array_distinct(transform(grams, x -> xxhash64(x)))")
        )
        .localCheckpoint(eager=False)
    )


def prefix_join(tok):
    df_ = tok.groupBy("gram").agg(F.count(F.lit(1)).alias("df"))
    return tok.join(df_, "gram")


def prefix_window(tok):
    return tok.withColumn(
        "df", F.count(F.lit(1)).over(W.partitionBy("gram"))
    )


def cand_of_min(g, tighter=True):
    """df>1 + tighter positional bound, pair dedup via groupBy with
    MIN(bound): every per-match bound upper-bounds the same overlap, so
    the pair dies if ANY match proves overlap < alpha."""
    tok = g.select("doc_id", "n", F.explode("grams").alias("gram"))
    ranked = (
        prefix_join(tok)
        .withColumn(
            "rnk",
            F.row_number().over(W.partitionBy("doc_id").orderBy("df", "gram")),
        )
        .filter(F.col("rnk") <= F.col("n") - F.ceil(F.lit(T) * F.col("n")) + 1)
        .filter(F.col("df") > 1)
    )
    prefix = ranked.select(
        "doc_id", "n", "rnk", F.xxhash64("gram").alias("gk")
    )
    pa = prefix.select(
        F.col("doc_id").alias("doc_a"), F.col("n").alias("na"),
        F.col("rnk").alias("ia"), "gk",
    )
    pb = prefix.select(
        F.col("doc_id").alias("doc_b"), F.col("n").alias("nb"),
        F.col("rnk").alias("ib"), "gk",
    )
    bound = (
        F.least(F.col("ia") - 1, F.col("ib") - 1)
        + 1
        + F.least(F.col("na") - F.col("ia"), F.col("nb") - F.col("ib"))
    ) if tighter else (
        F.lit(1)
        + F.least(F.col("na") - F.col("ia"), F.col("nb") - F.col("ib"))
    )
    alpha = F.ceil(F.lit(T / (1.0 + T)) * (F.col("na") + F.col("nb")))
    return (
        pa.join(pb, "gk")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .filter(
            F.least("na", "nb").cast("double")
            >= F.lit(T) * F.greatest("na", "nb").cast("double")
        )
        .withColumn("bnd", bound)
        .withColumn("alpha", alpha)
        .groupBy("doc_a", "doc_b")
        .agg(F.min(F.col("bnd") >= F.col("alpha")).alias("keep"))
        .filter("keep")
        .select("doc_a", "doc_b")
    )


def cand_of(g, with_df_gt1, df_shape):
    tok = g.select("doc_id", "n", F.explode("grams").alias("gram"))
    ranked = (
        df_shape(tok)
        .withColumn(
            "rnk",
            F.row_number().over(W.partitionBy("doc_id").orderBy("df", "gram")),
        )
        .filter(F.col("rnk") <= F.col("n") - F.ceil(F.lit(T) * F.col("n")) + 1)
    )
    if with_df_gt1:
        ranked = ranked.filter(F.col("df") > 1)
    prefix = ranked.select(
        "doc_id", "n", "rnk", F.xxhash64("gram").alias("gk")
    )
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
            >= F.lit(T) * F.greatest("na", "nb").cast("double")
        )
        .filter(
            1 + F.least(F.col("na") - F.col("ia"), F.col("nb") - F.col("ib"))
            >= F.ceil(F.lit(T / (1.0 + T)) * (F.col("na") + F.col("nb")))
        )
        .select("doc_a", "doc_b")
        .distinct()
    )


def lean_verify(g, cand):
    ha = g.select(F.col("doc_id").alias("doc_a"), F.col("gh").alias("a_gh"))
    hb = g.select(F.col("doc_id").alias("doc_b"), F.col("gh").alias("b_gh"))
    survivors = (
        cand.join(ha, "doc_a").join(hb, "doc_b")
        .filter(F.expr(SCREEN_J) >= T)
        .select("doc_a", "doc_b")
    )
    ga = g.select(F.col("doc_id").alias("doc_a"), F.col("grams").alias("a_grams"))
    gb = g.select(F.col("doc_id").alias("doc_b"), F.col("grams").alias("b_grams"))
    return (
        survivors.join(ga, "doc_a").join(gb, "doc_b")
        .select("doc_a", "doc_b", F.expr(EXACT_J).alias("jaccard"))
        .filter(F.col("jaccard") >= T)
    )


def shape_a(docs):
    return setsim_prefix_join(docs, T)


def shape_b(docs):
    g = g_of(docs)
    return lean_verify(g, cand_of(g, True, prefix_join))


def shape_c(docs):
    g = g_of(docs)
    return lean_verify(g, cand_of(g, True, prefix_window))


def shape_d(docs):
    g = g_of(docs)
    return lean_verify(g, cand_of_min(g, tighter=True))


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
    docs = spark.read.parquet(os.path.join(SF, "documents.parquet"))

    all_shapes = {
        "A_shipped": shape_a,
        "B_lean": shape_b,
        "C_window": shape_c,
        "D_minbound": shape_d,
    }
    wanted = os.environ.get("SETSIM_SHAPES", "A_shipped,B_lean").split(",")
    shapes = {k: all_shapes[k] for k in wanted}

    if os.environ.get("SETSIM_COUNTS"):
        g = g_of(docs)
        print("cand shipped-filters:", cand_of(g, True, prefix_join).count())
        print("cand min-bound      :", cand_of_min(g, tighter=True).count())

    # result-identity gate first (cheap checksum of the full output)
    sums = {}
    for name, fn in shapes.items():
        r = (
            fn(docs)
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.expr(
                    "bit_xor(xxhash64(doc_a, doc_b, round(jaccard, 9)))"
                ).alias("s"),
            )
            .collect()[0]
        )
        sums[name] = (r["n"], r["s"])
        print(f"checksum {name}: n={r['n']} s={r['s']}")
    assert len(set(sums.values())) == 1, f"shapes disagree: {sums}"

    best = {k: float("inf") for k in shapes}
    for rnd in range(ROUNDS):
        order = list(shapes.items())[rnd % len(shapes):] + list(shapes.items())[: rnd % len(shapes)]
        for name, fn in order:
            t0 = time.perf_counter()
            spark.sparkContext.setJobDescription(f"{name} r{rnd}")
            fn(docs).write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            best[name] = min(best[name], dt)
            print(f"  round {rnd} {name}: {dt:.2f} s")
    print("BEST:", {k: round(v, 2) for k, v in best.items()})


if __name__ == "__main__":
    main()
