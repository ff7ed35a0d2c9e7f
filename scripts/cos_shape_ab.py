"""A/B/C the pair-scoring shapes of dedup_embedding_cosine (round 14).

The entry is the slowest registry member at sf1 (60-70 s): ~20M
label-blocked pairs each evaluate an ``aggregate(zip_with(...))``
sequential-double fold — higher-order functions are INTERPRETED in
Spark (no whole-stage codegen), so the per-pair cost dominates.

Shape A (shipped): self-join on label, interpreted fold per pair.
Shape B: same join, dot spelled as the UNROLLED left-associated
  64-term sum ``0D + a[0]*b[0] + ... + a[63]*b[63]`` — bit-identical
  accumulation order (the fold is 0D + p0 + p1 + ...), but a plain
  Add/Multiply tree that whole-stage codegen compiles.
Shape C: groupBy(label).applyInPandas — each label block's vectors
  cross the Arrow boundary ONCE (n rows, not n^2/2 pairs); pairs form
  in numpy with per-dim sequential accumulation (acc += A[:,d]*B[:,d]
  for d in 0..63 — same add order as the fold, IEEE-exact), a
  conservative margin prefilter (raw dot >= t - 1e-6) bounds the
  boundary traffic back, and Spark applies the EXACT HALF_UP
  ``round(dot, 6) >= t`` on the survivors (numpy's round is
  half-to-even on binary — never used).

Usage: python scripts/cos_shape_ab.py [sf_dir] [reps]

MEASURED (r14 third session, data/sf1 = 20k vectors / 10 labels /
~23M blocked pairs, local[32], same-JVM rotating best-of-3, all three
result sets asserted bit-identical in-run — 234,900 pairs):

  A-fold       best 11.183 s  (shipped through the r14 mid-round)
  B-unrolled   best 139.392 s (12x WORSE — the 64 GetArrayItem terms
               defeat codegen and the giant expression is evaluated
               in both the join condition and the project)
  C-blockmat   best  2.381 s  (ADOPTED — 4.7x; sf0.1 warm crossover
               0.42 -> 0.54 s documents the Arrow-boundary constant
               below ~1M pairs)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

COS_T = 0.30


def _emb(spark, sf_dir):
    from zarr_datafusion_spark.operators.common import cpu_rebalance

    return cpu_rebalance(
        spark, spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    )


def shape_a(spark, sf_dir):
    e = _emb(spark, sf_dir)
    a, b = e.alias("a"), e.alias("b")
    dot = (
        "aggregate(zip_with(a.embedding, b.embedding, (x, y) -> "
        "CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), 0D, (acc, v) -> acc + v)"
    )
    return (
        a.join(
            b,
            (F.col("a.label") == F.col("b.label"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            F.col("a.label").alias("label"),
            F.round(F.expr(dot), 6).alias("cosine"),
        )
        .filter(F.col("cosine") >= COS_T)
    )


def shape_b(spark, sf_dir):
    e = _emb(spark, sf_dir)
    a, b = e.alias("a"), e.alias("b")
    dot = "CAST(0 AS DOUBLE)" + "".join(
        f" + (CAST(a.embedding[{i}] AS DOUBLE) * CAST(b.embedding[{i}] AS DOUBLE))"
        for i in range(64)
    )
    return (
        a.join(
            b,
            (F.col("a.label") == F.col("b.label"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            F.col("a.label").alias("label"),
            F.round(F.expr(dot), 6).alias("cosine"),
        )
        .filter(F.col("cosine") >= COS_T)
    )


def shape_c(spark, sf_dir):
    e = _emb(spark, sf_dir).select("vec_id", "label", "embedding")

    margin = COS_T - 1e-6

    def block_pairs(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("vec_id")
        ids = pdf["vec_id"].to_numpy()
        lab = pdf["label"].to_numpy()
        n = len(ids)
        if n < 2:
            return pd.DataFrame(
                {"vec_a": pd.Series(dtype="int64"),
                 "vec_b": pd.Series(dtype="int64"),
                 "label": pd.Series(dtype="int32"),
                 "dot": pd.Series(dtype="float64")}
            )
        E = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
        oa, ob, oc, od = [], [], [], []
        CH = 1024
        for i0 in range(0, n - 1, CH):
            i1 = min(i0 + CH, n - 1)
            A = E[i0:i1]                      # (c, 64) left rows
            B = E[i0 + 1:]                    # all rows after i0
            # sequential per-dim accumulation == 0D + p0 + ... + p63
            acc = np.zeros((i1 - i0, n - i0 - 1))
            for d in range(64):
                acc += A[:, d:d + 1] * B[:, d][None, :]
            # upper triangle only: pair (i, j) valid when j > i
            ii, jj = np.nonzero(acc >= margin)
            keep = (jj + i0 + 1) > (ii + i0)  # j index in E is jj+i0+1
            ii, jj = ii[keep], jj[keep]
            oa.append(ids[ii + i0])
            ob.append(ids[jj + i0 + 1])
            oc.append(lab[ii + i0])
            od.append(acc[ii, jj])
        return pd.DataFrame(
            {"vec_a": np.concatenate(oa) if oa else np.array([], dtype=np.int64),
             "vec_b": np.concatenate(ob) if ob else np.array([], dtype=np.int64),
             "label": np.concatenate(oc) if oc else np.array([], dtype=np.int32),
             "dot": np.concatenate(od) if od else np.array([], dtype=np.float64)}
        )

    out = e.groupBy("label").applyInPandas(
        block_pairs, "vec_a long, vec_b long, label int, dot double"
    )
    return out.select(
        "vec_a", "vec_b", "label", F.round(F.col("dot"), 6).alias("cosine")
    ).filter(F.col("cosine") >= COS_T)


def _noop(df):
    t0 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/data/sf1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    os.environ.setdefault("SPARK_GRAFT_CPUS", "32")
    from zarr_datafusion_spark.session import get_spark

    spark = get_spark()
    shapes = [("A-fold", shape_a), ("B-unrolled", shape_b), ("C-blockmat", shape_c)]

    ref = None
    for name, f in shapes:
        p = (
            f(spark, sf_dir)
            .toPandas()
            .sort_values(["vec_a", "vec_b"])
            .reset_index(drop=True)
        )
        if ref is None:
            ref = p
            print(f"{name}: {len(p)} pairs (reference)")
        else:
            assert len(p) == len(ref), f"{name}: row count {len(p)} != {len(ref)}"
            assert (p["vec_a"] == ref["vec_a"]).all() and (
                p["vec_b"] == ref["vec_b"]
            ).all(), f"{name}: pair set differs"
            assert (
                p["cosine"].to_numpy() == ref["cosine"].to_numpy()
            ).all(), f"{name}: cosine bits differ"
            print(f"{name}: identical to reference ({len(p)} pairs)")

    times = {n: [] for n, _ in shapes}
    for i in range(reps):
        order = shapes if i % 2 == 0 else shapes[::-1]
        for name, f in order:
            spark.sparkContext.setJobDescription(f"cos-ab:{name}:{i}")
            times[name].append(_noop(f(spark, sf_dir)))
    for name, ts in times.items():
        print(f"{name}: best {min(ts):.3f} med {sorted(ts)[len(ts)//2]:.3f} raw {['%.2f' % t for t in ts]}")


if __name__ == "__main__":
    main()
