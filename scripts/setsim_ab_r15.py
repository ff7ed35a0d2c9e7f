"""Same-JVM rotating A/B of dedup_setsim_prefix_join refinements
(VERDICT r14 item 6: the 12.1M-candidate gh-screen is the remaining
cost).  All shapes bit-identical (asserted).

  A_shipped    r14 ladder (lean gh screen, sort-merge/AQE joins).
  B_bcast      screen joins take a BROADCAST hint on the per-doc gh
               side (50k rows x ~100 bigints ~= 40 MB at sf1): the
               12.1M candidate rows stop being exchanged twice
               (doc_a-hash, then doc_b-hash) for the screen.
  C_bcast_gk   B + the df-computation join keyed by xxhash64(gram)
               (8-byte join/agg key instead of the gram string; the
               prefix ORDER stays on the raw (df, gram) pair, so the
               recall proof is untouched — only the df lookup key is
               hashed, and a hash collision only perturbs df values,
               i.e. the rarest-first heuristic, never correctness...
               NOTE: collisions merge two grams' df counts, which
               changes rnk and can change the PREFIX — still
               recall-safe only if the order stays consistent, which
               it does (same (df,gram) order for every doc).  Output
               asserted bit-identical.

Usage: python scripts/setsim_ab_r15.py [sf_dir] [rounds]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F
from pyspark.sql import Window as W

from zarr_datafusion_spark.session import get_spark
from zarr_datafusion_spark.operators.dedup import _GRAMS_EXPR
from zarr_datafusion_spark.operators.extras import (
    SETSIM_PREFIX_THRESHOLD,
    setsim_prefix_join,
)

SF = sys.argv[1] if len(sys.argv) > 1 else "data/sf1"
ROUNDS = int(sys.argv[2]) if len(sys.argv) > 2 else 4
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


def cand_of(g, hash_df_key):
    tok = g.select("doc_id", "n", F.explode("grams").alias("gram"))
    if hash_df_key:
        tok = tok.withColumn("gk", F.xxhash64("gram"))
        df_ = tok.groupBy("gk").agg(F.count(F.lit(1)).alias("df"))
        ranked = tok.join(df_, "gk")
    else:
        df_ = tok.groupBy("gram").agg(F.count(F.lit(1)).alias("df"))
        ranked = tok.join(df_, "gram").withColumn("gk", F.xxhash64("gram"))
    ranked = (
        ranked.withColumn(
            "rnk",
            F.row_number().over(W.partitionBy("doc_id").orderBy("df", "gram")),
        )
        .filter(F.col("rnk") <= F.col("n") - F.ceil(F.lit(T) * F.col("n")) + 1)
        .filter(F.col("df") > 1)
    )
    prefix = ranked.select("doc_id", "n", "rnk", "gk")
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


def verify(g, cand, bcast):
    ha = g.select(F.col("doc_id").alias("doc_a"), F.col("gh").alias("a_gh"))
    hb = g.select(F.col("doc_id").alias("doc_b"), F.col("gh").alias("b_gh"))
    if bcast:
        ha, hb = F.broadcast(ha), F.broadcast(hb)
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
    return verify(g, cand_of(g, False), True)


def shape_c(docs):
    g = g_of(docs)
    return verify(g, cand_of(g, True), True)


def shape_d(docs):
    g = g_of(docs)
    return verify(g, cand_of(g, True), False)


def main():
    spark = get_spark("setsim_ab_r15")
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(os.path.join(SF, "documents.parquet"))

    all_shapes = {
        "A_shipped": shape_a,
        "B_bcast": shape_b,
        "C_bcast_gk": shape_c,
        "D_gk": shape_d,
    }
    wanted = os.environ.get("SETSIM_SHAPES", "A_shipped,B_bcast,C_bcast_gk").split(",")
    shapes = {k: all_shapes[k] for k in wanted}

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
        print(f"checksum {name}: n={r['n']} s={r['s']}", flush=True)
    assert len(set(sums.values())) == 1, f"shapes disagree: {sums}"

    best = {k: float("inf") for k in shapes}
    times = {k: [] for k in shapes}
    items = list(shapes.items())
    for rnd in range(ROUNDS):
        order = items[rnd % len(items):] + items[: rnd % len(items)]
        for name, fn in order:
            spark.sparkContext.setJobDescription(f"setsim {name} r{rnd}")
            t0 = time.perf_counter()
            fn(docs).write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            best[name] = min(best[name], dt)
            times[name].append(round(dt, 3))
            print(f"  round {rnd} {name}: {dt:.3f} s", flush=True)
    print("ALL:", times)
    print("BEST:", {k: round(v, 3) for k, v in best.items()})


if __name__ == "__main__":
    main()
