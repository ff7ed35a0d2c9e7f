"""Spot parity check: run named registry entries against their DuckDB
oracles at one or more SFs, value-exact (the verify-recipe norm).

Usage::

    python scripts/parity_check.py q1,q2[,...] [sf0.001 sf0.01]

Exit code 1 on any mismatch.  Used by the r14 optimization round to
prove every touched entry still matches its oracle bit-for-bit before
its change is kept (the "prove equivalence with the oracle before
moving on" rule).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402
import numpy as np  # noqa: E402
import pandas as pd  # noqa: E402

import __spark_entry__ as E  # noqa: E402
from zarr_datafusion_spark.session import TABLES  # noqa: E402


def norm(df):
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].dt.floor("us")
        elif df[c].dtype == object and len(df) and len(df[c].dropna()):
            v = df[c].dropna().iloc[0]
            if type(v).__name__ == "Decimal":
                df[c] = df[c].astype(float)
            elif type(v).__name__ == "date":
                df[c] = pd.to_datetime(df[c])
    if not len(df):
        return df
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(
        drop=True
    )


def frames_equal(l, r) -> bool:
    if len(l) != len(r) or list(l.columns) != list(r.columns):
        return False
    for c in l.columns:
        lv, rv = l[c], r[c]
        if pd.api.types.is_float_dtype(lv) or pd.api.types.is_float_dtype(rv):
            lv = lv.astype(float).to_numpy()
            rv = rv.astype(float).to_numpy()
            if not (((lv == rv) | (np.isnan(lv) & np.isnan(rv))).all()):
                return False
        else:
            if not (
                (lv.isna() == rv.isna()).all()
                and (lv[~lv.isna()] == rv[~rv.isna()]).all()
            ):
                return False
    return True


def main() -> None:
    names = [q.strip() for q in sys.argv[1].split(",") if q.strip()]
    sfs = sys.argv[2:] or ["sf0.001", "sf0.01"]

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    qs, os_ = E.queries(), E.oracle_sql()
    bad = []
    for sf in sfs:
        sf_dir = f"/root/testdata/{sf}"
        con = duckdb.connect()
        for t in TABLES:
            p = f"{sf_dir}/{t}.parquet"
            if os.path.exists(p):
                con.execute(
                    f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')"
                )
        for name in names:
            l = norm(qs[name](spark, sf_dir).toPandas())
            r = norm(con.sql(os_[name]).df())
            ok = frames_equal(l, r)
            print(f"  {sf} {name}: {'OK' if ok else 'MISMATCH'} ({len(l)} rows)")
            if not ok:
                bad.append((sf, name))
    print("FAILS:", bad or "none")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
