"""Declared dimension names (zarr v3 core-spec ``dimension_names``,
xarray's v2 ``_ARRAY_DIMENSIONS`` attribute) drive coordinate ORDER
exactly — shape-matching inference is provably blind when dimension
sizes collide, and these stores (every xarray-written store, most v3
writers) say the order outright."""

from __future__ import annotations

import json
import os

import numpy as np

from zarr_datafusion_spark.zarr.metadata import discover_arrays
from zarr_datafusion_spark.zarr.writer import write_store


def _square_arrays():
    """EQUAL dim sizes (4x4): size-matching cannot know the order."""
    a = np.arange(4, dtype=np.int64)          # axis named 'zz' (outer!)
    b = np.arange(4, dtype=np.int64) * 10     # axis named 'aa' (inner)
    # v[i, j] = i*100 + b[j]: rows are the 'zz' axis
    v = (a[:, None] * 100 + b[None, :]).astype(np.int64)
    return {
        "zz": (a, (4,)),
        "aa": (b, (4,)),
        "v": (v, (1, 4)),
    }


def test_v2_array_dimensions_attr_orders_coords(spark, tmp_path):
    from zarr_datafusion_spark.zarr import read_zarr

    store = str(tmp_path / "sq2.zarr")
    write_store(store, _square_arrays())
    # without names: alphabetical tie-break puts 'aa' outer — WRONG
    sm = discover_arrays(store)
    assert [c.name for c in sm.coords] == ["aa", "zz"]

    with open(os.path.join(store, "v", ".zattrs"), "w") as f:
        json.dump({"_ARRAY_DIMENSIONS": ["zz", "aa"]}, f)
    # consolidated doc must not override the sidecar attrs with stale
    # content — remove it so the walking path re-reads
    zmeta = os.path.join(store, ".zmetadata")
    if os.path.exists(zmeta):
        os.unlink(zmeta)

    sm = discover_arrays(store)
    assert [c.name for c in sm.coords] == ["zz", "aa"]

    df = read_zarr(spark, store)
    assert df.columns == ["zz", "aa", "v"]
    rows = {(r.zz, r.aa): r.v for r in df.collect()}
    assert rows[(3, 20)] == 320 and rows[(1, 0)] == 100


def test_v3_dimension_names_orders_coords(spark, tmp_path):
    from zarr_datafusion_spark.zarr import read_zarr

    store = str(tmp_path / "sq3.zarr")
    write_store(store, _square_arrays(), zarr_format=3)
    meta_path = os.path.join(store, "v", "zarr.json")
    with open(meta_path) as f:
        doc = json.load(f)
    doc["dimension_names"] = ["zz", "aa"]
    with open(meta_path, "w") as f:
        json.dump(doc, f)
    root = os.path.join(store, "zarr.json")
    with open(root) as f:
        rdoc = json.load(f)
    if "consolidated_metadata" in rdoc:
        rdoc["consolidated_metadata"]["metadata"]["v"]["dimension_names"] = [
            "zz", "aa",
        ]
        with open(root, "w") as f:
            json.dump(rdoc, f)

    sm = discover_arrays(store)
    assert [c.name for c in sm.coords] == ["zz", "aa"]
    df = read_zarr(spark, store)
    rows = {(r.zz, r.aa): r.v for r in df.collect()}
    assert rows[(2, 30)] == 230


def test_declared_names_must_be_consistent(tmp_path):
    """A declaration that does not cover the coords exactly (unknown
    name, wrong arity, shape mismatch, nulls) falls back to inference
    instead of producing a wrong order."""
    store = str(tmp_path / "bad.zarr")
    write_store(store, _square_arrays())
    zmeta = os.path.join(store, ".zmetadata")
    if os.path.exists(zmeta):
        os.unlink(zmeta)

    for bad in (["zz", "nope"], ["zz"], ["zz", "zz"], ["zz", None]):
        with open(os.path.join(store, "v", ".zattrs"), "w") as f:
            json.dump({"_ARRAY_DIMENSIONS": bad}, f)
        sm = discover_arrays(store)
        assert [c.name for c in sm.coords] == ["aa", "zz"], bad


def test_sink_written_stores_declare_dims(spark, tmp_path):
    """The distributed sink now writes the declaration itself (v2
    .zattrs _ARRAY_DIMENSIONS / v3 dimension_names), so sink-written
    stores with EQUAL dim sizes round-trip unambiguously — and the
    system attr never leaks into user-facing schema metadata."""
    from zarr_datafusion_spark.zarr import read_zarr
    from zarr_datafusion_spark.zarr.sink import write_zarr

    rows = [
        (int(z), int(a * 10), int(z * 100 + a * 10))
        for z in range(4)
        for a in range(4)
    ]
    df = spark.createDataFrame(rows, ["zz", "aa", "v"])
    for fmt in (2, 3):
        store = str(tmp_path / f"sq_sink_v{fmt}.zarr")
        write_zarr(df, store, coords=["zz", "aa"], zarr_format=fmt)
        sm = discover_arrays(store)
        assert [c.name for c in sm.coords] == ["zz", "aa"], fmt
        var = sm.data_vars[0]
        assert var.dimension_names == ("zz", "aa")
        assert "_ARRAY_DIMENSIONS" not in var.attrs
        # xarray needs the declaration on EVERY array, coords included
        for c in sm.coords:
            assert c.dimension_names == (c.name,), (fmt, c.name)
        back = read_zarr(spark, store)
        assert back.schema["v"].metadata == {}
        got = {(r.zz, r.aa): r.v for r in back.collect()}
        assert got[(3, 30)] == 330 and got[(2, 0)] == 200
