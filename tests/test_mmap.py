"""Zero-copy memory-mapped chunk reads (reference roadmap
``README.md:314`` — "Zero-copy reads with memory-mapped I/O").

Raw (codec-free) LOCAL chunks are served as ``np.memmap`` views: no
read() copy, and a window slicing part of a chunk only faults the
pages it touches.  Semantics must be identical to the buffered path —
same values, same strict absence/corruption contract, same I/O
accounting — and compressed/filtered/remote/sharded chunks must keep
using the buffered decode."""

from __future__ import annotations

import os

import numpy as np
import pytest

from zarr_datafusion_spark.zarr import chunkio
from zarr_datafusion_spark.zarr.chunkio import (
    _mmap_dtype,
    _read_chunk_ex_uncached,
    read_chunk,
)
from zarr_datafusion_spark.zarr.metadata import discover_arrays


def _weather_meta(store):
    sm = discover_arrays(store)
    return {m.name: m for m in list(sm.coords) + list(sm.data_vars)}


@pytest.fixture(scope="module")
def raw_store():
    from zarr_datafusion_spark.operators.zarr_queries import fixture_store

    return fixture_store(2)  # written uncompressed: every chunk is raw


def test_raw_local_chunk_is_memmapped(raw_store):
    meta = _weather_meta(raw_store)["temperature"]
    assert _mmap_dtype(raw_store, meta) is not None
    arr, missing = _read_chunk_ex_uncached(raw_store, meta, (0, 0, 0))
    assert isinstance(arr, np.memmap) and not missing
    assert arr.dtype == np.dtype("<i8") and arr.shape == (1, 10, 10)


def test_mmap_values_equal_buffered(raw_store, monkeypatch):
    meta = _weather_meta(raw_store)["temperature"]
    mapped = np.array(read_chunk(raw_store, meta, (3, 0, 0)))
    monkeypatch.setattr(chunkio, "MMAP_LOCAL_RAW", False)
    buffered = read_chunk(raw_store, meta, (3, 0, 0))
    assert not isinstance(buffered, np.memmap)
    assert (mapped == buffered).all()


def test_compressed_filtered_remote_not_eligible(tmp_path):
    from zarr_datafusion_spark.zarr.writer import (
        synthetic_weather_arrays,
        write_store,
    )

    store = str(tmp_path / "gz.zarr")
    write_store(store, synthetic_weather_arrays(), compression="gzip")
    meta = _weather_meta(store)["temperature"]
    assert _mmap_dtype(store, meta) is None
    arr, _ = _read_chunk_ex_uncached(store, meta, (0, 0, 0))
    assert not isinstance(arr, np.memmap)  # buffered decode
    assert _mmap_dtype("s3://bucket/x.zarr", meta) is None  # remote


def test_v3_raw_eligible_compressed_not(tmp_path):
    from zarr_datafusion_spark.zarr.writer import (
        synthetic_weather_arrays,
        write_store,
    )

    raw3 = str(tmp_path / "raw3.zarr")
    write_store(raw3, synthetic_weather_arrays(), zarr_format=3)
    meta = _weather_meta(raw3)["temperature"]
    got, _ = _read_chunk_ex_uncached(raw3, meta, (2, 0, 0))
    assert isinstance(got, np.memmap)

    gz3 = str(tmp_path / "gz3.zarr")
    write_store(gz3, synthetic_weather_arrays(), zarr_format=3,
                compression="gzip")
    meta = _weather_meta(gz3)["temperature"]
    assert _mmap_dtype(gz3, meta) is None


def test_missing_chunk_keeps_fill_contract(raw_store):
    meta = _weather_meta(raw_store)["temperature"]
    arr, missing = _read_chunk_ex_uncached(raw_store, meta, (99, 0, 0))
    assert missing and not isinstance(arr, np.memmap)


def test_truncated_chunk_raises_not_fill(tmp_path):
    from zarr_datafusion_spark.zarr.writer import (
        synthetic_weather_arrays,
        write_store,
    )

    store = str(tmp_path / "trunc.zarr")
    write_store(store, synthetic_weather_arrays())
    meta = _weather_meta(store)["temperature"]
    path = os.path.join(store, "temperature", "1.0.0")
    with open(path, "r+b") as f:
        f.truncate(17)  # neither a whole element count nor the chunk
    with pytest.raises(ValueError):
        _read_chunk_ex_uncached(store, meta, (1, 0, 0))


def test_io_accounting_identical(raw_store, monkeypatch):
    meta = _weather_meta(raw_store)["humidity"]

    def counters():
        chunkio.reset_io_counters()
        read_chunk(raw_store, meta, (5, 0, 0))
        return (chunkio._IO.disk_bytes, chunkio._IO.n_chunks)

    mapped = counters()
    monkeypatch.setattr(chunkio, "MMAP_LOCAL_RAW", False)
    assert counters() == mapped == (800, 1)


def test_cache_copies_memmap_to_heap(raw_store):
    meta = _weather_meta(raw_store)["temperature"]
    chunkio._CHUNK_CACHE.clear()
    first, _ = chunkio.read_chunk_ex(raw_store, meta, (6, 0, 0), cache_mb=8)
    hit, _ = chunkio.read_chunk_ex(raw_store, meta, (6, 0, 0), cache_mb=8)
    assert not isinstance(hit, np.memmap)  # heap copy, no pinned fd
    assert (np.array(first) == hit).all()


def test_update_in_place_is_atomic_and_old_mmap_stable(spark, tmp_path):
    """The sink's chunk writes go through tmp+rename now: an mmap of
    the OLD chunk keeps the old inode's bytes while a new read sees
    the update — no torn or mutated views."""
    from pyspark.sql import functions as F

    from zarr_datafusion_spark.zarr import read_zarr
    from zarr_datafusion_spark.zarr.sink import update_zarr_region, write_zarr

    store = str(tmp_path / "upd.zarr")
    src = read_zarr(spark, __import__(
        "zarr_datafusion_spark.operators.zarr_queries",
        fromlist=["fixture_store"]).fixture_store(2))
    write_zarr(src, store, coords=["time", "lat", "lon"])
    meta = _weather_meta(store)["temperature"]
    old = read_chunk(store, meta, (0, 0, 0))
    assert isinstance(old, np.memmap)
    old_vals = np.array(old)

    upd = read_zarr(spark, store).filter(F.col("time") == 0).withColumn(
        "temperature", F.col("temperature") + 1000
    )
    update_zarr_region(upd, store)
    new = read_chunk(store, meta, (0, 0, 0))
    assert (np.array(new) == old_vals + 1000).all()
    assert (np.array(old) == old_vals).all()  # old mapping untouched
    assert not [n for n in os.listdir(os.path.join(store, "temperature"))
                if ".tmp" in n]
