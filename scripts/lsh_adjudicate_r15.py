"""Same-JVM rotating A/B adjudicating the driver-flagged
dedup_minhash_lsh normalized regression (VERDICT r14 items "What's
wrong" 1 / "Next round" 3).

Shapes (all EXACT — identical candidate-pair set, asserted first):

  P_packed   shipped r14 shape: explode(band_idx) then project the two
             packed BIGINTs (Generate carries the 64-element signature
             through its 16 output rows; the question is whether that
             carry is real cost or codegen-local).
  S_string   r13 shape: posexplode(transform(... array_join ...)) —
             the comma-joined ~40-char string band key.
  Z_zip      posexplode(arrays_zip(h0s, h1s)) of two pre-computed
             16-element bigint arrays — the Generate input row carries
             32 bigints (not the 64-wide signature), its output rows
             carry just (pos, h0, h1); packing is two flat transforms.

Usage: python scripts/lsh_adjudicate_r15.py [sf_dir] [rounds]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from zarr_datafusion_spark.session import get_spark
from zarr_datafusion_spark.operators.common import cpu_rebalance
from zarr_datafusion_spark.operators.dedup import (
    N_BANDS,
    N_PERM,
    lsh_candidate_pairs,
    minhash_signatures,
)

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
ROUNDS = int(sys.argv[2]) if len(sys.argv) > 2 else 6
RPB = N_PERM // N_BANDS


def pairs_from(bands, key_cols):
    return (
        bands.groupBy("band_idx", *key_cols)
        .agg(F.sort_array(F.collect_list("doc_id")).alias("ds"))
        .filter((F.size("ds") > 1) & (F.size("ds") <= 10000))
        .select(
            F.explode(
                F.expr(
                    "flatten(transform(ds, (x, i) -> "
                    "transform(slice(ds, i + 2, size(ds) - i - 1), "
                    "y -> struct(x AS doc_a, y AS doc_b))))"
                )
            ).alias("p")
        )
        .select("p.doc_a", "p.doc_b")
        .distinct()
    )


def shape_packed(docs):
    return lsh_candidate_pairs(docs)


def shape_string(docs):
    sigs = minhash_signatures(docs)
    bands = sigs.select(
        "doc_id",
        F.posexplode(
            F.expr(
                f"transform(sequence(0, {N_BANDS - 1}), "
                f"b -> array_join(slice(signature, b * {RPB} + 1, {RPB}), ','))"
            )
        ).alias("band_idx", "band_hash"),
    )
    return pairs_from(bands, ["band_hash"])


def shape_zip(docs):
    sigs = minhash_signatures(docs)
    bands = (
        sigs.select(
            "doc_id",
            F.expr(
                f"transform(sequence(0, {N_BANDS - 1}), b -> "
                f"shiftleft(element_at(signature, b * {RPB} + 1), 32)"
                f" | element_at(signature, b * {RPB} + 2))"
            ).alias("h0s"),
            F.expr(
                f"transform(sequence(0, {N_BANDS - 1}), b -> "
                f"shiftleft(element_at(signature, b * {RPB} + 3), 32)"
                f" | element_at(signature, b * {RPB} + 4))"
            ).alias("h1s"),
        )
        .select(
            "doc_id",
            F.posexplode(F.arrays_zip("h0s", "h1s")).alias("band_idx", "z"),
        )
        .select(
            "doc_id",
            "band_idx",
            F.col("z.h0s").alias("band_h0"),
            F.col("z.h1s").alias("band_h1"),
        )
    )
    return pairs_from(bands, ["band_h0", "band_h1"])


def main():
    spark = get_spark("lsh_adjudicate_r15")  # the bench's exact config
    spark.sparkContext.setLogLevel("ERROR")
    # the registry entry reads docs through _docs() = cpu_rebalance(scan)
    docs = cpu_rebalance(
        spark, spark.read.parquet(os.path.join(SF, "documents.parquet"))
    )

    all_shapes = {
        "P_packed": shape_packed,
        "S_string": shape_string,
        "Z_zip": shape_zip,
    }
    wanted = os.environ.get("LSH_SHAPES", "P_packed,S_string,Z_zip").split(",")
    shapes = {k: all_shapes[k] for k in wanted}

    sums = {}
    for name, fn in shapes.items():
        r = (
            fn(docs)
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.expr("bit_xor(xxhash64(doc_a, doc_b))").alias("s"),
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
            spark.sparkContext.setJobDescription(f"lsh {name} r{rnd}")
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
