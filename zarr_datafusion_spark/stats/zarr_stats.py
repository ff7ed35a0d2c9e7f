"""Exact statistics for a Zarr store (reference ``src/datasource/zarr.rs:191-254``).

``num_rows = prod(coord sizes)`` exactly (Cartesian-product model);
coordinate min/max computed at discovery; every column has null_count 0
(Zarr arrays are dense — missing chunks materialize fill_value, never
null).
"""

from __future__ import annotations


def zarr_table_stats(store_path: str):
    from zarr_datafusion_spark.engine import TableStats
    from zarr_datafusion_spark.zarr.metadata import discover_arrays

    meta = discover_arrays(store_path)
    all_cols = [a.name for a in meta.coords + meta.data_vars]
    return TableStats(
        row_count=meta.total_rows,
        column_min_max=dict(meta.coord_min_max),
        column_null_count={name: 0 for name in all_cols},
    )
