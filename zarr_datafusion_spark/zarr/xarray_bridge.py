"""SQL over xarray Datasets (reference roadmap ``README.md:332`` —
"Integrate with xarray-sql", an UNCHECKED row the reference never
built; xarray-sql is the public project that lets DataFusion/DuckDB
query xarray objects).

The bridge is deliberately write-through: an xarray ``Dataset`` is a
Zarr store in waiting (same data model — named dimensions, coordinate
arrays, hypercube variables), so ``from_xarray`` stages the dataset
through this repo's OWN v2 writer into a store directory and returns
the ordinary distributed zarr scan over it.  That keeps every engine
feature (pushdown, chunk statistics, stats shortcuts, SQL rewrites)
working on xarray inputs for free, and it is the honest scale story:
the conversion is one driver-side pass over arrays that ALREADY live
in driver memory, after which all query work is executor-parallel.
For datasets too big for the driver, the answer is not this bridge —
point the reader at the dataset's backing Zarr/NetCDF store directly
(``read_zarr`` / ``reference://`` kerchunk).

xarray itself is not installed in this environment, so the bridge is
duck-typed against xarray's public interface (``ds.data_vars``,
``ds.coords``, ``da.dims``, ``da.values``) and tested against a
minimal stand-in; a real ``xarray.Dataset`` satisfies the same
attribute contract.
"""

from __future__ import annotations

import os
import tempfile

__all__ = ["from_xarray", "register_xarray"]


def _mapping_items(obj):
    """items() of xarray's Mapping-like containers (also accepts plain
    dicts in tests)."""
    return list(obj.items())


def _values(da):
    """Materialized numpy array of a DataArray-like (``.values`` is
    xarray's public accessor; plain ndarrays pass through)."""
    import numpy as np

    v = getattr(da, "values", da)
    return np.asarray(v)


def _dims(da, fallback: tuple[str, ...] | None = None) -> tuple[str, ...]:
    d = getattr(da, "dims", None)
    if d is None:
        if fallback is None:
            raise TypeError(f"{da!r} has no .dims and no fallback")
        return fallback
    return tuple(d)


def from_xarray(spark, ds, store_path: str | None = None, **read_kwargs):
    """Flattened DataFrame over an xarray-Dataset-like object.

    ``ds`` must expose ``data_vars`` and ``coords`` mappings whose
    values expose ``dims``/``values`` (xarray's public interface).
    Every data variable must be dimensioned over a shared ordered dim
    tuple (the reference's hypercube contract, ``README.md:23-34``);
    each dim needs a 1-D coordinate.  The dataset is staged through
    the repo's v2 writer into ``store_path`` (a temp directory by
    default) and read back with :func:`~zarr_datafusion_spark.zarr.
    datasource.read_zarr` — so the result is a fully distributed scan,
    not a driver-side createDataFrame.
    """
    import numpy as np

    from zarr_datafusion_spark.zarr.datasource import read_zarr
    from zarr_datafusion_spark.zarr.writer import write_store

    data_vars = _mapping_items(ds.data_vars)
    if not data_vars:
        raise ValueError("dataset has no data variables")
    coords = dict(_mapping_items(ds.coords))

    dims0 = _dims(data_vars[0][1])
    extra = sorted(set(coords) - set(dims0))
    if extra:
        # refusing beats silently dropping columns the user can see in
        # their Dataset (r11 review finding): auxiliary/scalar coords
        # are not part of the hypercube contract this bridge stages
        raise ValueError(
            f"non-dimension coordinates {extra} are not supported by "
            "the zarr staging bridge — drop them (ds.drop_vars) or "
            "promote them to data variables before bridging"
        )
    arrays: dict[str, tuple[np.ndarray, tuple[int, ...]]] = {}
    shape: dict[str, int] = {}
    for d in dims0:
        if d not in coords:
            raise ValueError(f"dimension {d!r} has no coordinate array")
        cv = _values(coords[d])
        if cv.ndim != 1:
            raise ValueError(f"coordinate {d!r} must be 1-D, got {cv.ndim}-D")
        arrays[d] = (cv, (len(cv),))
        shape[d] = len(cv)

    for name, da in data_vars:
        dims = _dims(da, fallback=dims0)
        if dims != dims0:
            raise ValueError(
                f"variable {name!r} dims {dims} != {dims0} — all data "
                "variables must share one ordered dimension tuple"
            )
        vv = _values(da)
        if vv.shape != tuple(shape[d] for d in dims0):
            raise ValueError(
                f"variable {name!r} shape {vv.shape} does not match its "
                f"coordinates {tuple(shape[d] for d in dims0)}"
            )
        # outer-dim chunking of 1: the scan parallelizes over the
        # leading dimension exactly like sink-written stores
        arrays[name] = (vv, (1,) + vv.shape[1:] if vv.ndim > 1 else vv.shape)

    if store_path is None:
        store_path = os.path.join(
            tempfile.mkdtemp(prefix="zds_xarray_"), "dataset.zarr"
        )
    write_store(store_path, arrays)
    return read_zarr(spark, store_path, **read_kwargs)


def register_xarray(engine, name: str, ds, store_path: str | None = None, **kw):
    """``engine.register_zarr`` for an xarray-like Dataset: stage it
    (:func:`from_xarray`'s writer path) and register the store as a
    SQL table — the xarray-sql user story (``SELECT ... FROM ds``)
    with this engine's statistics shortcuts and rewrites attached."""
    import tempfile as _tf

    if store_path is None:
        store_path = os.path.join(
            _tf.mkdtemp(prefix="zds_xarray_"), f"{name}.zarr"
        )
    # stage via the same validation/writer path (discard the scan)
    from_xarray(engine.spark, ds, store_path=store_path)
    engine.register_zarr(name, store_path, **kw)
    return store_path
