"""Derive an sf1-scale dataset from the driver's sf0.1 parquet.

The driver ships sf{0.001,0.01,0.1}; VERDICT r4 item 8 asks for one
recorded sf1 bench point to catch scale cliffs the sf0.1 run can't see
(broadcast-threshold flips, shuffle-partition sizing).  This script
scales the FACT tables 10x while keeping the dimension tables as-is, so
every foreign key into a dimension stays valid:

* lineitem / orders: 10 copies with o_orderkey / l_orderkey shifted by
  copy * KEYSHIFT (the pair shifts consistently, preserving the
  order->lines relationship); part/supp/cust keys untouched.
* events: event_id shifted; user_id / ts untouched (10x the events per
  user-hour — denser, not longer, history).
* documents: doc_id shifted and a per-copy suffix token appended so the
  copies are near-duplicates rather than exact duplicates (keeps the
  dedup operators' workload realistic instead of degenerate).
* embeddings: vec_id shifted, vectors duplicated (ANN workload scales;
  exact ties in top-k are irrelevant to the bench).
* region/nation/customer/supplier/part: copied unchanged.

Deterministic (pure key arithmetic, no RNG).  Output is parquet under
data/sf1/ (gitignored).  Usage:

    python scripts/make_sf1.py [src_dir] [out_dir]
    SPARK_GRAFT_SF_DIR=$PWD/data/sf1 python bench.py
"""

from __future__ import annotations

import os
import sys

import duckdb

COPIES = 10


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = sys.argv[2] if len(sys.argv) > 2 else os.path.join(root, "data", "sf1")
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()

    def copy_table(name: str, select_sql: str) -> None:
        con.execute(
            f"COPY ({select_sql}) TO '{out}/{name}.parquet' (FORMAT PARQUET)"
        )
        n = con.sql(f"SELECT COUNT(*) FROM read_parquet('{out}/{name}.parquet')").fetchone()[0]
        print(f"  {name}: {n} rows")

    for t in ("region", "nation", "customer", "supplier", "part"):
        copy_table(t, f"SELECT * FROM read_parquet('{src}/{t}.parquet')")

    okey_shift = (
        con.sql(
            f"SELECT MAX(o_orderkey) + 1 FROM read_parquet('{src}/orders.parquet')"
        ).fetchone()[0]
    )
    copies = ", ".join(str(i) for i in range(COPIES))
    copy_table(
        "orders",
        f"""SELECT o_orderkey + c.i * {okey_shift} AS o_orderkey,
                   o_custkey, o_orderstatus, o_totalprice, o_orderdate,
                   o_orderpriority
            FROM read_parquet('{src}/orders.parquet'),
                 unnest([{copies}]) AS c(i)""",
    )
    li_cols = [
        r[0]
        for r in con.sql(f"DESCRIBE SELECT * FROM read_parquet('{src}/lineitem.parquet')").fetchall()
    ]
    rest = ", ".join(c for c in li_cols if c != "l_orderkey")
    copy_table(
        "lineitem",
        f"""SELECT l_orderkey + c.i * {okey_shift} AS l_orderkey, {rest}
            FROM read_parquet('{src}/lineitem.parquet'),
                 unnest([{copies}]) AS c(i)""",
    )

    ev_cols = [
        r[0]
        for r in con.sql(f"DESCRIBE SELECT * FROM read_parquet('{src}/events.parquet')").fetchall()
    ]
    ekey_shift = (
        con.sql(
            f"SELECT MAX(event_id) + 1 FROM read_parquet('{src}/events.parquet')"
        ).fetchone()[0]
    )
    rest = ", ".join(c for c in ev_cols if c != "event_id")
    copy_table(
        "events",
        f"""SELECT event_id + c.i * {ekey_shift} AS event_id, {rest}
            FROM read_parquet('{src}/events.parquet'),
                 unnest([{copies}]) AS c(i)""",
    )

    dkey_shift = (
        con.sql(
            f"SELECT MAX(doc_id) + 1 FROM read_parquet('{src}/documents.parquet')"
        ).fetchone()[0]
    )
    doc_cols = [
        r[0]
        for r in con.sql(f"DESCRIBE SELECT * FROM read_parquet('{src}/documents.parquet')").fetchall()
    ]
    rest = ", ".join(c for c in doc_cols if c not in ("doc_id", "text"))
    copy_table(
        "documents",
        f"""SELECT doc_id + c.i * {dkey_shift} AS doc_id,
                   CASE WHEN c.i = 0 THEN text
                        ELSE text || ' v' || CAST(c.i AS VARCHAR) END AS text,
                   {rest}
            FROM read_parquet('{src}/documents.parquet'),
                 unnest([{copies}]) AS c(i)""",
    )

    vkey_shift = (
        con.sql(
            f"SELECT MAX(vec_id) + 1 FROM read_parquet('{src}/embeddings.parquet')"
        ).fetchone()[0]
    )
    emb_cols = [
        r[0]
        for r in con.sql(f"DESCRIBE SELECT * FROM read_parquet('{src}/embeddings.parquet')").fetchall()
    ]
    rest = ", ".join(c for c in emb_cols if c != "vec_id")
    copy_table(
        "embeddings",
        f"""SELECT vec_id + c.i * {vkey_shift} AS vec_id, {rest}
            FROM read_parquet('{src}/embeddings.parquet'),
                 unnest([{copies}]) AS c(i)""",
    )
    print(f"sf1 dataset written to {out}")


if __name__ == "__main__":
    main()
