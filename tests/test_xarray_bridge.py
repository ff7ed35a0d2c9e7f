"""xarray integration (reference roadmap README.md:332 — "Integrate
with xarray-sql").  xarray is not installed here, so the bridge is
exercised through a minimal stand-in exposing xarray's public
interface (``data_vars``/``coords`` mappings, ``.dims``/`.values`` on
the arrays); a real Dataset satisfies the same contract."""

from __future__ import annotations

import numpy as np
import pytest

from zarr_datafusion_spark.zarr.xarray_bridge import from_xarray, register_xarray


class FakeDataArray:
    def __init__(self, values, dims):
        self.values = np.asarray(values)
        self.dims = tuple(dims)


class FakeDataset:
    """Duck-typed xarray.Dataset: data_vars/coords mappings."""

    def __init__(self, data_vars, coords):
        self.data_vars = data_vars
        self.coords = coords


@pytest.fixture(scope="module")
def ds():
    t = np.arange(4, dtype=np.int64)
    y = np.arange(3, dtype=np.int64) * 10
    temp = (t[:, None] * 100 + y[None, :]).astype(np.int64)
    return FakeDataset(
        data_vars={"temp": FakeDataArray(temp, ("t", "y"))},
        coords={"t": FakeDataArray(t, ("t",)), "y": FakeDataArray(y, ("y",))},
    )


def test_flattened_scan_values(spark, ds):
    df = from_xarray(spark, ds)
    rows = sorted(map(tuple, df.collect()))
    want = sorted(
        (int(t), int(y), int(t * 100 + y))
        for t in range(4)
        for y in (0, 10, 20)
    )
    assert [tuple(map(int, r)) for r in rows] == want
    assert df.columns == ["t", "y", "temp"]


def test_register_xarray_sql(spark, ds):
    from zarr_datafusion_spark.engine import Engine

    eng = Engine(spark)
    register_xarray(eng, "xr_ds", ds)
    row = eng.sql(
        "SELECT COUNT(*) AS n, MIN(temp) AS lo, MAX(temp) AS hi FROM xr_ds"
    ).first()
    assert (row.n, row.lo, row.hi) == (12, 0, 320)
    # the engine's scan-free shortcuts attach to the staged store too
    assert eng.sql("SELECT COUNT(*) AS n FROM xr_ds").first().n == 12
    assert eng.last_query_used_shortcut


def test_validation_errors(spark, ds):
    bad = FakeDataset(
        data_vars={"v": FakeDataArray(np.zeros((2, 2), np.int64), ("a", "b"))},
        coords={"a": FakeDataArray(np.arange(2, dtype=np.int64), ("a",))},
    )
    with pytest.raises(ValueError, match="no coordinate"):
        from_xarray(spark, bad)

    mismatch = FakeDataset(
        data_vars={
            "v": FakeDataArray(np.zeros((2, 3), np.int64), ("a", "b")),
            "w": FakeDataArray(np.zeros((3, 2), np.int64), ("b", "a")),
        },
        coords={
            "a": FakeDataArray(np.arange(2, dtype=np.int64), ("a",)),
            "b": FakeDataArray(np.arange(3, dtype=np.int64), ("b",)),
        },
    )
    with pytest.raises(ValueError, match="share one ordered"):
        from_xarray(spark, mismatch)

    empty = FakeDataset(data_vars={}, coords={})
    with pytest.raises(ValueError, match="no data variables"):
        from_xarray(spark, empty)


def test_plain_dict_and_ndarray_inputs(spark):
    """Plain dicts + bare ndarrays (dims inferred from the one data
    var) also pass — the minimal programmatic use."""
    ds = FakeDataset(
        data_vars={"v": FakeDataArray(np.arange(6, dtype=np.int64).reshape(2, 3), ("r", "c"))},
        coords={
            "r": np.arange(2, dtype=np.int64),
            "c": np.arange(3, dtype=np.int64),
        },
    )
    assert from_xarray(spark, ds).count() == 6


def test_extra_coords_are_refused(spark):
    ds = FakeDataset(
        data_vars={"v": FakeDataArray(np.zeros((2, 3), np.int64), ("a", "b"))},
        coords={
            "a": FakeDataArray(np.arange(2, dtype=np.int64), ("a",)),
            "b": FakeDataArray(np.arange(3, dtype=np.int64), ("b",)),
            "aux": FakeDataArray(np.arange(2, dtype=np.int64), ("a",)),
        },
    )
    with pytest.raises(ValueError, match="non-dimension coordinates"):
        from_xarray(spark, ds)
