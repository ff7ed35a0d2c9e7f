"""Zarr v2/v3 data source for Spark — the reference's core capability.

Flattens a Zarr store of chunked nD arrays into a dense 2-D DataFrame:
one row per grid cell, coordinate columns repeating in row-major (C)
order (reference ``README.md:23-34``, ``src/reader/coord.rs:80-105``).

Implemented as a Spark Python Data Source (Spark >= 4.0): schema from
pure-JSON metadata inference, one input partition per outer-dimension
chunk slab (true parallel scan — the reference's roadmap item, its scan
is single-partition ``zarr_exec.rs:100``), arithmetic coordinate
expansion per partition (no cross-product ever materialized on the
driver), coordinate-equality filter pushdown with the reference's
"Inexact" re-filter contract, and limit pushdown with per-partition
early exit.
"""

from zarr_datafusion_spark.zarr.datasource import (
    ZarrDataSource,
    read_zarr,
    read_zarr_stream,
    register_zarr_source,
)
from zarr_datafusion_spark.zarr.sink import append_zarr, write_zarr
from zarr_datafusion_spark.zarr.metadata import (
    ZarrArrayMeta,
    ZarrStoreMeta,
    detect_zarr_version,
    discover_arrays,
    infer_spark_schema,
)

__all__ = [
    "ZarrArrayMeta",
    "ZarrStoreMeta",
    "ZarrDataSource",
    "detect_zarr_version",
    "discover_arrays",
    "infer_spark_schema",
    "read_zarr",
    "read_zarr_stream",
    "append_zarr",
    "write_zarr",
    "register_zarr_source",
]
