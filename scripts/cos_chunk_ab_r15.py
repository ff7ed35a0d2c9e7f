"""Same-JVM rotating A/B: dedup_embedding_cosine r14 single-block
grouped map vs r15 chunk-pair blocking (VERDICT r14 item 4).

Outputs asserted bit-identical first (n + xxhash64 checksum over the
rounded cosine), then rotating best-of-N noop-forced timings.

Usage: python scripts/cos_chunk_ab_r15.py [sf_dir] [rounds]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pandas as pd
from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from zarr_datafusion_spark.operators.dedup import (
    COS_PAIRS_THRESHOLD,
    QUERIES,
)

SF = sys.argv[1] if len(sys.argv) > 1 else "data/sf1"
ROUNDS = int(sys.argv[2]) if len(sys.argv) > 2 else 3


def shape_old(spark, sf_dir):
    """The r14 single-block grouped map (pre-chunk-pair), verbatim."""
    e = (
        spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
        .select("vec_id", "label", "embedding")
        .filter(
            F.col("vec_id").isNotNull()
            & F.col("label").isNotNull()
            & F.col("embedding").isNotNull()
        )
    )
    margin = COS_PAIRS_THRESHOLD - 1e-6

    def block_pairs(pdf: pd.DataFrame) -> pd.DataFrame:
        empty = {
            "vec_a": pd.Series(dtype="int64"),
            "vec_b": pd.Series(dtype="int64"),
            "label": pd.Series(dtype="int32"),
            "dot": pd.Series(dtype="float64"),
        }
        pdf = pdf.sort_values("vec_id")
        ids = pdf["vec_id"].to_numpy()
        lab = pdf["label"].to_numpy()
        n = len(ids)
        if n < 2:
            return pd.DataFrame(empty)
        emb = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
        oa, ob, oc, od = [], [], [], []
        chunk = 1024
        for i0 in range(0, n - 1, chunk):
            i1 = min(i0 + chunk, n - 1)
            left = emb[i0:i1]
            right = emb[i0 + 1 :]
            acc = np.zeros((i1 - i0, n - i0 - 1))
            for d in range(64):
                acc += left[:, d : d + 1] * right[:, d][None, :]
            ii, jj = np.nonzero(acc >= margin)
            keep = jj >= ii
            ii, jj = ii[keep], jj[keep]
            oa.append(ids[ii + i0])
            ob.append(ids[jj + i0 + 1])
            oc.append(lab[ii + i0])
            od.append(acc[ii, jj])
        if not oa:
            return pd.DataFrame(empty)
        return pd.DataFrame(
            {
                "vec_a": np.concatenate(oa),
                "vec_b": np.concatenate(ob),
                "label": np.concatenate(oc),
                "dot": np.concatenate(od),
            }
        )

    return (
        e.groupBy("label")
        .applyInPandas(block_pairs, "vec_a long, vec_b long, label int, dot double")
        .select(
            "vec_a", "vec_b", "label", F.round(F.col("dot"), 6).alias("cosine")
        )
        .filter(F.col("cosine") >= COS_PAIRS_THRESHOLD)
    )


def shape_new(spark, sf_dir):
    return QUERIES["dedup_embedding_cosine"](spark, sf_dir)


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

    shapes = {"OLD_block": shape_old, "NEW_chunkpair": shape_new}
    sums = {}
    for name, fn in shapes.items():
        r = (
            fn(spark, SF)
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.expr(
                    "bit_xor(xxhash64(vec_a, vec_b, label, round(cosine, 9)))"
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
            spark.sparkContext.setJobDescription(f"cos {name} r{rnd}")
            t0 = time.perf_counter()
            fn(spark, SF).write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            best[name] = min(best[name], dt)
            times[name].append(round(dt, 3))
            print(f"  round {rnd} {name}: {dt:.3f} s", flush=True)
    print("ALL:", times)
    print("BEST:", {k: round(v, 3) for k, v in best.items()})


if __name__ == "__main__":
    main()
