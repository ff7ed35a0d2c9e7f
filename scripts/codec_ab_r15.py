"""One-session leg of the shuffle-codec A/B (VERDICT r14 item 8,
guide §2.3): time the shuffle-heaviest sf1 entries under one
spark.io.compression.codec setting (the codec is fixed at JVM launch,
so each leg is its own process; the orchestrating shell alternates
codec order across reps).

Usage: python scripts/codec_ab_r15.py <lz4|zstd> [sf_dir]
Prints one JSON line: {"codec": ..., "queries": {name: sec}}.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CODEC = sys.argv[1]
SF = sys.argv[2] if len(sys.argv) > 2 else "data/sf1"

os.environ.setdefault("SPARK_GRAFT_CPUS", "32")

from pyspark.sql import SparkSession  # noqa: E402

cpus = os.environ["SPARK_GRAFT_CPUS"]
spark = (
    SparkSession.builder.master(f"local[{cpus}]")
    .appName(f"codec_ab_{CODEC}")
    .config("spark.io.compression.codec", CODEC)
    .config("spark.sql.shuffle.partitions", cpus)
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.execution.arrow.pyspark.enabled", "true")
    .config("spark.sql.codegen.cache.maxEntries", "5000")
    .config("spark.cleaner.periodicGC.interval", "1min")
    .config("spark.ui.enabled", "false")
    .config("spark.driver.memory", "16g")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

from zarr_datafusion_spark.operators import dedup, extras  # noqa: E402

ENTRIES = {
    "dedup_ngram_jaccard": dedup.QUERIES["dedup_ngram_jaccard"],
    "dedup_setsim_prefix_join": extras.QUERIES["dedup_setsim_prefix_join"],
    "dedup_exact_substring": extras.QUERIES["dedup_exact_substring"],
}

# warmup: small-SF pass to pay JIT/codegen before the measured runs
for name, fn in ENTRIES.items():
    fn(spark, "/root/testdata/sf0.01").write.format("noop").mode(
        "overwrite"
    ).save()

out = {}
for name, fn in ENTRIES.items():
    spark.sparkContext.setJobDescription(f"codec {CODEC} {name}")
    t0 = time.perf_counter()
    fn(spark, SF).write.format("noop").mode("overwrite").save()
    out[name] = round(time.perf_counter() - t0, 3)

print(json.dumps({"codec": CODEC, "queries": out}))
