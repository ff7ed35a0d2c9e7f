"""Capture ``explain("formatted")`` for named registry queries.

Usage::

    python scripts/capture_plans.py <tag> q1,q2,...   # -> plans/r14/<q>_<tag>.txt

The optimization-round deliverable (OPTIMIZATION_r14.md) requires a
``_before.txt`` / ``_after.txt`` plan pair for every query touched; this
is the one command that produces them, so before/after captures can
never drift in methodology.  Plans are captured from the DataFrame the
registry entry returns (construction only — nothing is executed), at
the bench's default SF_DIR so PushedFilters/statistics match what the
bench measures.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from zarr_datafusion_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", os.environ.get("SPARK_GRAFT_PLANS_TAG", "r15")
)


def main() -> None:
    tag = sys.argv[1]
    names = [q.strip() for q in sys.argv[2].split(",") if q.strip()]

    from zarr_datafusion_spark.operators import (
        dedup,
        extras,
        relational,
        similarity,
        temporal,
        textstats,
        zarr_queries,
    )

    registry = {}
    for mod in (
        relational, textstats, dedup, similarity, temporal, zarr_queries, extras
    ):
        registry.update(mod.QUERIES)
    registry["profile_numeric_approx"] = extras.profile_numeric_approx

    spark = get_spark("zds-capture-plans")
    os.makedirs(OUT_DIR, exist_ok=True)
    for name in names:
        df = registry[name](spark, SF_DIR)
        text = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(OUT_DIR, f"{name}_{tag}.txt")
        with open(path, "w") as fh:
            fh.write(text)
        print(f"wrote {path} ({len(text)} bytes)")


if __name__ == "__main__":
    main()
