"""Scale-pattern tests: salting preserves aggregate semantics; bucketed
tables join and aggregate without a shuffle (no Exchange in the plan)."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_DIR, plan_text
from zarr_datafusion_spark.scale import salted_agg, write_bucketed
from zarr_datafusion_spark.session import load_table


def test_salted_agg_equals_direct(spark):
    li = load_table(spark, SF_DIR, "lineitem")
    direct = {
        r.l_returnflag: (r.n, r.q, r.lo, r.hi)
        for r in li.groupBy("l_returnflag")
        .agg(
            F.count("*").alias("n"),
            F.sum("l_quantity").alias("q"),
            F.min("l_orderkey").alias("lo"),
            F.max("l_orderkey").alias("hi"),
        )
        .collect()
    }
    salted = {
        r.l_returnflag: (r.n, r.q, r.lo, r.hi)
        for r in salted_agg(
            li,
            "l_returnflag",
            {
                "n": "count(*)",
                "q": "sum(l_quantity)",
                "lo": "min(l_orderkey)",
                "hi": "max(l_orderkey)",
            },
        ).collect()
    }
    assert salted == direct


def test_salted_agg_rejects_non_algebraic(spark):
    import pytest

    li = load_table(spark, SF_DIR, "lineitem")
    with pytest.raises(ValueError):
        salted_agg(li, "l_returnflag", {"a": "avg(l_quantity)"})


def test_bucketed_join_has_no_shuffle(spark):
    o = load_table(spark, SF_DIR, "orders")
    c = load_table(spark, SF_DIR, "customer")
    write_bucketed(o, "orders_b", "o_custkey")
    write_bucketed(c, "cust_b", "c_custkey")
    ob, cb = spark.table("orders_b"), spark.table("cust_b")
    joined = ob.join(
        cb, ob.o_custkey == cb.c_custkey
    ).select("o_orderkey", "c_name")
    # disable broadcast so the join strategy decision is about shuffles;
    # restore the PRIOR value, not a hard-coded default (session fixture
    # is shared across the suite)
    prior = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = plan_text(joined)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prior)
    assert "SortMergeJoin" in plan
    assert "Exchange" not in plan, "bucketed join still shuffles"
    # and the result is right
    n = joined.count()
    assert n == o.join(c, o.o_custkey == c.c_custkey).count()


def test_bucketed_agg_has_no_shuffle(spark):
    o = load_table(spark, SF_DIR, "orders")
    write_bucketed(o, "orders_b2", "o_custkey")
    agg = spark.table("orders_b2").groupBy("o_custkey").agg(F.count("*").alias("n"))
    assert "Exchange" not in plan_text(agg)
    assert agg.count() == o.select("o_custkey").distinct().count()
