"""Scale patterns — skew salting and bucketed co-located joins.

These are the two knobs SURVEY §2's 100 TB posture calls out beyond
what AQE does automatically:

* :func:`salted_agg` — two-stage aggregation for pathologically skewed
  keys (one key owning a double-digit share of all rows): stage 1
  aggregates on (key, random salt) so the hot key's rows spread over
  ``n_salt`` reducers; stage 2 combines the per-salt partials.  For
  algebraic aggregates (count/sum/min/max) the result is identical to
  the direct groupBy — asserted in tests.
* :func:`write_bucketed` / co-located joins — pre-shuffling both join
  sides into the same bucket layout at write time makes every later
  join on that key shuffle-free (the plan contains no Exchange —
  asserted in tests).  This is the batch analog of the reference
  caching remote store handles on the table: pay once at registration,
  never per query.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, functions as F


def _det_salt(df: DataFrame, n_salt: int) -> F.Column:
    """Deterministic salt: hash of the WHOLE row (xxhash64 over every
    column), not ``rand()`` (ADVICE r4) — nondeterministic expressions
    vary row placement run-to-run and can block optimizer pushes
    through the projection, while a row hash gives the same even spread
    with fully reproducible placement (the repo-wide hash-keyed
    posture, same idea as ``common.salted_bucket``).  Identical
    duplicate rows land on one salt — harmless: salting exists to split
    DISTINCT rows of a hot key across reducers."""
    return F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(n_salt)).cast(
        "int"
    )


def salted_agg(
    df: DataFrame,
    key: str,
    aggs: dict[str, str],
    n_salt: int = 16,
) -> DataFrame:
    """Two-stage skew-resistant aggregation.

    ``aggs`` maps output column -> "fn(input)" where fn is one of
    count/sum/min/max (algebraic: partials combine exactly).

    >>> salted_agg(li, "l_returnflag", {"n": "count(*)", "q": "sum(l_quantity)"})
    """
    stage1 = []
    stage2 = []
    for out, spec in aggs.items():
        fn, _, arg = spec.partition("(")
        arg = arg.rstrip(")")
        fn = fn.strip().lower()
        if arg.strip().lower().startswith("distinct"):
            # per-salt distincts would be double-counted by the stage-2
            # combine — DISTINCT is not algebraic
            raise ValueError(f"DISTINCT aggregate cannot be salted: {spec!r}")
        part = f"__p_{out}"
        if fn == "count":
            stage1.append(F.expr(f"count({arg})").alias(part))
            stage2.append(F.sum(part).alias(out))
        elif fn in ("sum", "min", "max"):
            stage1.append(F.expr(f"{fn}({arg})").alias(part))
            stage2.append(getattr(F, fn)(part).alias(out))
        else:
            raise ValueError(f"non-algebraic aggregate {fn!r} cannot be salted")
    salted = df.withColumn("__salt", _det_salt(df, n_salt))
    return (
        salted.groupBy(key, "__salt")
        .agg(*stage1)
        .groupBy(key)
        .agg(*stage2)
    )


def write_sorted(
    df: DataFrame, path: str, key: str, n_files: int = 8
) -> None:
    """Range-partitioned sorted layout for data skipping: every output
    file owns a disjoint ``key`` range, so any engine that reads footer
    min/max (Spark, DuckDB, Trino) prunes whole files / row groups on
    ``key`` predicates.  ``repartitionByRange`` samples the key
    distribution to place equal keys in one partition;
    ``sortWithinPartitions`` then orders rows so row-group stats nest
    inside the file range.  This is the layout knob that turns a
    100 TB full scan into a bounded range read — the parquet analog of
    the zarr source's coordinate-window pruning (A5)."""
    (
        df.repartitionByRange(n_files, F.col(key))
        .sortWithinPartitions(key)
        .write.mode("overwrite")
        .parquet(path)
    )


def write_bucketed(
    df: DataFrame, table: str, key: str, n_buckets: int = 8
) -> None:
    """Persist ``df`` bucketed+sorted by ``key`` so subsequent
    equi-joins/aggregations on ``key`` skip the shuffle entirely.

    Drops any previous incarnation first: with the in-memory session
    catalog, a table from an earlier process is forgotten by the
    catalog but its warehouse directory survives and blocks the name."""
    import shutil

    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    warehouse = spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
    loc = os.path.join(warehouse.removeprefix("file:"), table.lower())
    if os.path.isdir(loc):
        shutil.rmtree(loc)
    (
        df.write.mode("overwrite")
        .bucketBy(n_buckets, key)
        .sortBy(key)
        .format("parquet")
        .saveAsTable(table)
    )


def _morton_expr(col_a: str, col_b: str, bits: int = 16) -> F.Column:
    """Morton (Z-order) code of two non-negative integer columns: bit i
    of each key lands at interleaved positions 2i / 2i+1.  Pure JVM bit
    arithmetic (an OR-fold of shifted masked bits) so the clustering
    key stays in whole-stage codegen — no UDF in the layout path."""
    terms = []
    for i in range(bits):
        terms.append(f"shiftleft(shiftright({col_a}, {i}) & 1, {2 * i})")
        terms.append(f"shiftleft(shiftright({col_b}, {i}) & 1, {2 * i + 1})")
    return F.expr(" | ".join(terms))


def write_zorder(
    df: DataFrame, path: str, key_a: str, key_b: str, n_files: int = 8,
    bits: int = 16,
) -> None:
    """Z-order (Morton-curve) layout for TWO-dimensional data skipping:
    rows are range-partitioned and sorted by the interleaved-bit code
    of (key_a, key_b), so every output file covers a compact rectangle
    in key space and footer min/max prune on predicates over EITHER
    column — where ``write_sorted`` clusters one key perfectly and
    leaves the other striped across every file.  This is the layout
    Delta/Iceberg call OPTIMIZE ZORDER BY, built from plain Spark
    primitives; keys are masked to ``bits`` (low bits beyond the mask
    only affect intra-rectangle order, never pruning correctness).

    100 TB posture: one stats aggregate (4 scalars to the driver — the
    model-parameter class of collect) + one range shuffle on the morton
    code (sampled by repartitionByRange), in-partition sort — identical
    cost shape to write_sorted, strictly better multi-column skipping.

    Keys are first NORMALIZED linearly onto the shared [0, 2^bits)
    grid: interleaving raw values whose ranges differ by orders of
    magnitude degenerates to major/minor ordering (the wide key owns
    all high bits) and the narrow key never clusters.  Linear min/max
    scaling is the right normalizer for near-uniform keys; skewed keys
    swap in rank buckets (ntile) without touching the rest."""
    mask = (1 << bits) - 1
    lo_a, hi_a, lo_b, hi_b = df.agg(
        F.min(key_a), F.max(key_a), F.min(key_b), F.max(key_b)
    ).collect()[0]
    if lo_a is None or lo_b is None:  # empty input: nothing to cluster
        df.write.mode("overwrite").parquet(path)
        return

    def _norm(col: str, lo, hi) -> str:
        # double-space normalization: (x - lo) * mask in BIGINT wraps
        # silently once the key range passes ~2^47 (hash/snowflake ids);
        # the double path is exact enough for 16-bit bucketing and
        # clamped to the grid
        span = max(1, int(hi) - int(lo))
        return (
            f"LEAST({mask}, GREATEST(0, CAST(((CAST({col} AS DOUBLE) - {int(lo)}) "
            f"/ {span}) * {mask} AS BIGINT)))"
        )

    code = _morton_expr(_norm(key_a, lo_a, hi_a), _norm(key_b, lo_b, hi_b), bits)
    (
        df.withColumn("__z", code)
        .repartitionByRange(n_files, F.col("__z"))
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(path)
    )


def _ranked_range_stage(
    df: DataFrame,
    part_key: str,
    order_key: str,
    tie_key: str,
    n_parts: int | None = None,
) -> DataFrame:
    """The pre-checkpoint range stage of :func:`ranked_two_pass`:
    an even range exchange over the full (part, order, tie) key —
    never a hash exchange on the low-cardinality part key — with a
    per-partition sort and a materialized partition id.  Split out so
    plan tests can assert the exchange shape directly (the checkpoint
    in :func:`ranked_two_pass` truncates the visible plan)."""
    spark = df.sparkSession
    n_parts = n_parts or spark.sparkContext.defaultParallelism
    return (
        df.repartitionByRange(n_parts, part_key, order_key, tie_key)
        .sortWithinPartitions(part_key, order_key, tie_key)
        .withColumn("__pid", F.spark_partition_id())
    )


def ranked_two_pass(
    df: DataFrame,
    part_key: str,
    order_key: str,
    tie_key: str,
    rn_col: str = "rn",
    n_parts: int | None = None,
) -> DataFrame:
    """Skew-proof global ROW_NUMBER() OVER (PARTITION BY part_key
    ORDER BY order_key, tie_key) — the two-pass range-partitioned
    ranking that ``relational.win_ranking`` documents as the 100 TB
    mitigation for low-cardinality window partitions (VERDICT r4
    item 2).  A plain window with PARTITION BY o_orderpriority lands
    every row on one of 5 reducers regardless of cluster size; here:

    1. ``repartitionByRange(part, order, tie)`` spreads rows EVENLY
       across ``n_parts`` partitions while keeping the global sort
       order partition-monotone; a per-partition Arrow-batched cumcount
       (``mapInPandas``, state carried across batches) assigns local
       ranks with NO further shuffle — the sort is per-partition, never
       single-reducer.
    2. a tiny (pid, part_key, count) table — aggregated from the SAME
       materialized exchange (pinned by a localCheckpoint, see below) —
       yields each partition's global rank offset via a window over
       n_parts*n_keys rows; broadcast back and added map-side.

    The result is EXACTLY the single-pass window's output (the oracle
    for ``scale_ranked_two_pass`` is the plain window SQL), with the
    5-reducer sort replaced by an even range shuffle + local sorts.
    (order_key, tie_key) must totally order rows within a part_key
    group, as for any deterministic ROW_NUMBER.  rank()/dense_rank()
    reduce to the same machinery keyed on distinct order values;
    ntile/percent_rank/cume_dist need only the per-key global counts
    already present in the offset table."""
    from pyspark.sql.types import LongType, StructField, StructType
    from pyspark.sql.window import Window as W

    ranged = _ranked_range_stage(df, part_key, order_key, tie_key, n_parts)
    # Both the local-rank branch and the offset branch below consume
    # ``ranged``.  RangePartitioner boundaries come from a SAMPLE, so
    # two independent evaluations of the exchange could assign boundary
    # rows different __pid values and silently corrupt the offsets —
    # previously this only held together while ReuseExchange deduped
    # the two identical subplans, which column pruning can break the
    # moment the input carries payload columns beyond the three keys.
    # localCheckpoint pins ONE materialized partition assignment that
    # both branches read (the offset branch touches only the skinny
    # (pid, key) projection of it).  At cluster scale this is the
    # standard price of a two-pass ranking: one materialization of the
    # ranged data, traded for killing the single-reducer window sort.
    ranged = ranged.localCheckpoint(eager=False)

    out_schema = StructType(
        ranged.schema.fields + [StructField("__lrn", LongType(), False)]
    )

    def local_rank(batches):
        # rows arrive sorted by (part, order, tie); only the FIRST key
        # group of a batch can continue the previous batch's key
        carry_key, carry_n = None, 0
        for pdf in batches:
            if not len(pdf):
                continue
            keys = pdf[part_key]
            lrn = pdf.groupby(part_key, sort=False).cumcount().to_numpy() + 1
            if carry_key is not None:
                cont = (keys == carry_key).to_numpy().cumprod().astype(bool)
                lrn[cont] += carry_n
            carry_key = keys.iloc[-1]
            carry_n = int(lrn[(keys == carry_key).to_numpy()].max())
            out = pdf.copy()
            out["__lrn"] = lrn
            yield out

    local = ranged.mapInPandas(local_rank, schema=out_schema)

    # per-(pid, key) row counts — consumed from the reused range
    # exchange, aggregated map-side first, so this branch shuffles a
    # few hundred skinny rows
    cnt = ranged.groupBy("__pid", part_key).agg(F.count("*").alias("__c"))
    off_w = (
        W.partitionBy(part_key)
        .orderBy("__pid")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    off = cnt.select(
        "__pid",
        part_key,
        F.coalesce(F.sum("__c").over(off_w), F.lit(0)).alias("__off"),
    )
    return (
        local.join(F.broadcast(off), ["__pid", part_key])
        .withColumn(rn_col, (F.col("__lrn") + F.col("__off")).cast("long"))
        .drop("__pid", "__lrn", "__off")
    )


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    n_salt: int = 8,
) -> DataFrame:
    """Skew-resistant equi-join: the join dual of :func:`salted_agg`.

    A hot key on the big side sends every one of its rows to ONE
    reducer under a plain shuffle join; salting splits each key's rows
    across ``n_salt`` reducers (deterministic row-hash salt on the big
    side) and
    replicates the small side once per salt value (``explode(sequence)``
    — n_salt x the SMALL table, never the big one), joining on
    (key, salt).  The result set is exactly the unsalted join — salt
    only changes row placement — so the oracle is the plain join.

    AQE's skew-join split handles moderate skew at runtime; explicit
    salting is the deterministic-plan form for pathological keys (one
    key = 30% of a 100 TB table) where runtime splitting of a single
    oversized partition still leaves the straggler's shuffle-read on
    one executor."""
    salted_big = big.withColumn("__salt", _det_salt(big, n_salt))
    salted_small = small.withColumn(
        "__salt", F.explode(F.expr(f"sequence(0, {n_salt - 1})"))
    )
    return salted_big.join(salted_small, [key, "__salt"]).drop("__salt")
