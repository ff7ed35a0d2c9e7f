"""Exact statistics from parquet footers (no data scan).

The reference computes exact coordinate min/max by reading each full
coordinate array at schema-inference time (``schema_inference.rs:214-302``)
and exposes exact row counts / null counts through table statistics
(``src/datasource/zarr.rs:191-254``).  For parquet tables the same exact
numbers are already in the footer metadata — row-group row counts,
per-column statistics — so "reading statistics" is a pure metadata
operation here, cheaper than the reference's coord-array read.

At 100 TB this stays a driver-side metadata read of footer bytes only
(one footer per file); for very large file counts it would be
distributed via ``spark.read.format("binaryFile")`` over footers — noted,
not needed at driver-testdata scale (single file per table).
"""

from __future__ import annotations

import pyarrow.parquet as pq


def parquet_table_stats(path: str):
    """Compute exact TableStats for one parquet file/dir from footers.

    min/max are only recorded when every row group has statistics for
    the column (otherwise the bound is not exact and the shortcut must
    not fire — same guard discipline as ``minmax_optimization.rs:160-200``).
    """
    from zarr_datafusion_spark.engine import TableStats

    meta = pq.read_metadata(path)
    ncols = meta.num_columns
    names = [meta.row_group(0).column(i).path_in_schema for i in range(ncols)] if meta.num_row_groups else []

    mins: dict[str, object] = {}
    maxs: dict[str, object] = {}
    nulls: dict[str, int] = {}
    exact = {name: True for name in names}
    nulls_exact = {name: True for name in names}

    for rg in range(meta.num_row_groups):
        group = meta.row_group(rg)
        for i in range(ncols):
            col = group.column(i)
            name = col.path_in_schema
            st = col.statistics
            # BYTE_ARRAY min/max may be truncated by writers (not exact)
            # — exclude, mirroring the reference's numeric-only coord
            # statistics scope (SURVEY §1.2).  FLOAT/DOUBLE are excluded
            # too: footer min/max ignore NaN but Spark's MIN/MAX order
            # NaN greater than any value, so a NaN-bearing column would
            # make the stats answer diverge from the scan answer and the
            # footer cannot prove NaN absence (null_count excludes NaN).
            # The reference's minmax rule only covers integer coordinate
            # arrays (minmax_optimization.rs:160-200), so this keeps a
            # superset of its scope.
            if (
                st is None
                or not st.has_min_max
                or col.physical_type
                in ("BYTE_ARRAY", "FIXED_LEN_BYTE_ARRAY", "FLOAT", "DOUBLE")
            ):
                exact[name] = False
            else:
                lo, hi = st.min, st.max
                if name not in mins or lo < mins[name]:
                    mins[name] = lo
                if name not in maxs or hi > maxs[name]:
                    maxs[name] = hi
            if st is None or st.null_count is None:
                nulls_exact[name] = False
            else:
                nulls[name] = nulls.get(name, 0) + st.null_count

    return TableStats(
        row_count=meta.num_rows,
        column_min_max={n: (mins[n], maxs[n]) for n in names if exact.get(n) and n in mins},
        column_null_count={n: nulls.get(n, 0) for n in names if nulls_exact.get(n)},
    )
