"""Same-JVM rotating A/B of dedup_simhash's pair stage (VERDICT r14
item 5): where should the Hamming popcount run?

  A_lambda   shipped: bit_count(x.simhash ^ y.simhash) computed INSIDE
             the nested interpreted transform lambda that forms pair
             structs.
  B_codegen  the lambda emits (doc_a, doc_b, sa, sb) structs only; the
             xor + bit_count + <=8 filter run as codegen'd expressions
             after the explode (16 extra bytes per candidate pair
             through the Generate, popcount out of the interpreter).

Also prints the bucket-size distribution vs the 10k cap (the cap's
headroom on the redundant sf1 corpus).

Usage: python scripts/simhash_pair_ab_r15.py [sf_dir] [rounds]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from zarr_datafusion_spark.session import get_spark
from zarr_datafusion_spark.operators.dedup import QUERIES, _docs

SF = sys.argv[1] if len(sys.argv) > 1 else "data/sf1"
ROUNDS = int(sys.argv[2]) if len(sys.argv) > 2 else 4


def _bands(spark, sf_dir):
    import pandas as pd  # noqa: F401  (UDF deps)

    # reuse the shipped signature UDF by calling the entry's upstream:
    # rebuild bands exactly as dedup_simhash does
    import zarr_datafusion_spark.operators.dedup as D

    docs = _docs(spark, sf_dir)
    # lift the pandas UDF out of the entry by re-invoking the entry and
    # stopping at the bands projection is not possible; rebuild inline:
    import hashlib

    import numpy as np
    import pandas as pd

    @F.pandas_udf("long")
    def simhash(texts: pd.Series) -> pd.Series:
        shifts = np.arange(64, dtype=np.uint64)
        sign_rows: dict = {}

        def row(w: str):
            r = sign_rows.get(w)
            if r is None:
                h = np.uint64(
                    int.from_bytes(hashlib.md5(w.encode("utf-8")).digest()[:8], "big")
                )
                r = 2 * ((h >> shifts) & np.uint64(1)).astype(np.int64) - 1
                sign_rows[w] = r
            return r

        def sh(t: str) -> int:
            toks = t.lower().split()
            if not toks:
                return 0
            uniq, counts = np.unique(np.array(toks, dtype=object), return_counts=True)
            acc = (np.stack([row(w) for w in uniq]) * counts[:, None]).sum(axis=0)
            v = ((acc > 0).astype(np.uint64) << shifts).sum(dtype=np.uint64)
            return int(v.astype(np.int64))

        return texts.map(sh)

    sh = docs.select("doc_id", simhash("text").alias("simhash"))
    return sh.select(
        "doc_id",
        "simhash",
        F.posexplode(
            F.expr("transform(sequence(0,3), b -> (simhash >> (b*16)) & 65535)")
        ).alias("band_idx", "band_val"),
    )


def grouped(bands):
    return (
        bands.groupBy("band_idx", "band_val")
        .agg(F.sort_array(F.collect_list(F.struct("doc_id", "simhash"))).alias("ds"))
        .filter((F.size("ds") > 1) & (F.size("ds") <= 10000))
    )


def shape_lambda(spark, sf_dir):
    return QUERIES["dedup_simhash"](spark, sf_dir)


def shape_codegen(spark, sf_dir):
    g = grouped(_bands(spark, sf_dir))
    return (
        g.select(
            F.explode(
                F.expr(
                    "flatten(transform(ds, (x, i) -> "
                    "transform(slice(ds, i + 2, size(ds) - i - 1), "
                    "y -> struct(x.doc_id AS doc_a, y.doc_id AS doc_b, "
                    "x.simhash AS sa, y.simhash AS sb))))"
                )
            ).alias("p")
        )
        .select(
            "p.doc_a",
            "p.doc_b",
            F.expr("CAST(bit_count(p.sa ^ p.sb) AS INT)").alias("hamming"),
        )
        .filter(F.col("hamming") <= 8)
        .distinct()
    )


def main():
    spark = get_spark("simhash_pair_ab_r15")
    spark.sparkContext.setLogLevel("ERROR")

    # bucket-size distribution vs the 10k cap
    dist = (
        _bands(spark, SF)
        .groupBy("band_idx", "band_val")
        .count()
        .agg(
            F.count(F.lit(1)).alias("buckets"),
            F.max("count").alias("max_bucket"),
            F.expr("percentile_approx(count, 0.99)").alias("p99"),
            F.sum(F.expr("CASE WHEN count > 10000 THEN 1 ELSE 0 END")).alias(
                "over_cap"
            ),
        )
        .collect()[0]
    )
    print(
        f"buckets={dist['buckets']} max={dist['max_bucket']} "
        f"p99={dist['p99']} over_cap={dist['over_cap']}",
        flush=True,
    )

    shapes = {"A_lambda": shape_lambda, "B_codegen": shape_codegen}
    sums = {}
    for name, fn in shapes.items():
        r = (
            fn(spark, SF)
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.expr("bit_xor(xxhash64(doc_a, doc_b, hamming))").alias("s"),
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
            spark.sparkContext.setJobDescription(f"simhash {name} r{rnd}")
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
