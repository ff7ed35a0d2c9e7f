"""Decoded-chunk LRU cache + intra-task prefetch (reference roadmap
``README.md:326-327`` — "Async chunk prefetching" and "LRU cache for
frequently accessed chunks", both UNCHECKED rows).

Driver-side unit layer (the cache/prefetch primitives are plain
functions, deterministic to observe here) plus the correctness-critical
integration layer: an in-place store update must never serve stale
cached chunks through the executors, whichever workers the tasks land
on (mtime_ns keys)."""

from __future__ import annotations

import numpy as np
import pytest

from zarr_datafusion_spark.zarr.chunkio import (
    chunk_cache_stats,
    clear_chunk_cache,
    read_window,
)


@pytest.fixture()
def small_store(tmp_path):
    from zarr_datafusion_spark.zarr.writer import write_store

    store = str(tmp_path / "c.zarr")
    write_store(
        store,
        {
            "t": (np.arange(8, dtype=np.int64), (8,)),
            "x": (np.arange(5, dtype=np.int64), (5,)),
            "v": (np.arange(40, dtype=np.int64).reshape(8, 5), (2, 5)),
        },
    )
    return store


def _meta(store, name="v"):
    from zarr_datafusion_spark.zarr.metadata import discover_arrays

    return discover_arrays(store).array(name)


def test_cache_default_off(small_store):
    clear_chunk_cache()
    m = _meta(small_store)
    w = ((0, 8), (0, 5))
    a = read_window(small_store, m, w)
    b = read_window(small_store, m, w)
    assert np.array_equal(a, b)
    s = chunk_cache_stats()
    assert s["hits"] == 0 and s["entries"] == 0


def test_cache_hits_and_io_savings(small_store):
    from zarr_datafusion_spark.zarr.chunkio import (
        io_counters,
        reset_io_counters,
    )

    clear_chunk_cache()
    m = _meta(small_store)
    w = ((0, 8), (0, 5))
    reset_io_counters()
    a = read_window(small_store, m, w, cache_mb=16)
    cold = io_counters()
    assert cold["n_chunks"] == 4
    reset_io_counters()
    b = read_window(small_store, m, w, cache_mb=16)
    warm = io_counters()
    assert np.array_equal(a, b)
    # warm read touched NO chunk files and the counters say so honestly
    assert warm["n_chunks"] == 0 and warm["disk_bytes"] == 0
    s = chunk_cache_stats()
    assert s["hits"] == 4 and s["entries"] == 4
    clear_chunk_cache()


def test_cache_mtime_invalidation(small_store):
    """Rewriting a chunk file in place must yield fresh values on the
    very next cached read (st_mtime_ns keys — the update/append
    correctness contract)."""
    import os

    clear_chunk_cache()
    m = _meta(small_store)
    w = ((0, 2), (0, 5))
    a = read_window(small_store, m, w, cache_mb=16)
    assert a[0, 0] == 0
    p = os.path.join(small_store, "v", "0.0")
    raw = np.asarray(a, dtype=np.int64).copy() + 100
    with open(p, "wb") as f:
        f.write(raw.tobytes())
    os.utime(p, ns=(os.stat(p).st_atime_ns, os.stat(p).st_mtime_ns + 1))
    b = read_window(small_store, m, w, cache_mb=16)
    assert b[0, 0] == 100, "served a stale cached chunk after an update"
    clear_chunk_cache()


def test_cache_eviction_and_oversize(small_store, tmp_path):
    from zarr_datafusion_spark.zarr.chunkio import _CHUNK_CACHE
    from zarr_datafusion_spark.zarr.writer import write_store

    clear_chunk_cache()
    # chunks of 2x5 int64 = 80 B; a 1 MiB budget holds them all — force
    # the bound instead with a store of ~0.5 MiB chunks and a 1 MiB cap
    store = str(tmp_path / "big.zarr")
    write_store(
        store,
        {
            "t": (np.arange(8, dtype=np.int64), (8,)),
            "x": (np.arange(65536, dtype=np.int64), (65536,)),
            "v": (
                np.zeros((8, 65536), dtype=np.int64),
                (1, 65536),
            ),
        },
    )
    m = _meta(store)
    read_window(store, m, ((0, 8), (0, 65536)), cache_mb=1)
    s = chunk_cache_stats()
    assert s["evictions"] > 0
    assert s["bytes"] <= s["capacity"]
    # an entry larger than the whole budget is never admitted
    clear_chunk_cache()
    _CHUNK_CACHE.configure(0)  # keep disabled
    assert chunk_cache_stats()["capacity"] == 0
    clear_chunk_cache()


def test_cached_arrays_are_read_only(small_store):
    clear_chunk_cache()
    from zarr_datafusion_spark.zarr.chunkio import read_chunk_ex

    m = _meta(small_store)
    arr, missing = read_chunk_ex(small_store, m, (0, 0), cache_mb=16)
    assert not missing
    with pytest.raises(ValueError):
        arr[0, 0] = 999
    again, _ = read_chunk_ex(small_store, m, (0, 0), cache_mb=16)
    assert again[0, 0] == 0
    clear_chunk_cache()


def test_missing_chunks_never_cached(small_store):
    import os

    clear_chunk_cache()
    m = _meta(small_store)
    p = os.path.join(small_store, "v", "3.0")
    payload = open(p, "rb").read()
    os.remove(p)
    a = read_window(small_store, m, ((6, 8), (0, 5)), cache_mb=16)
    assert (a == 0).all()  # fill_value
    assert chunk_cache_stats()["entries"] == 0
    with open(p, "wb") as f:
        f.write(payload)
    b = read_window(small_store, m, ((6, 8), (0, 5)), cache_mb=16)
    assert b[1, 4] == 39, "a late-arriving chunk file must be seen"
    clear_chunk_cache()


@pytest.mark.parametrize("prefetch", [2, 8])
def test_prefetch_matches_sequential(small_store, prefetch):
    from zarr_datafusion_spark.zarr.chunkio import (
        io_counters,
        reset_io_counters,
    )

    clear_chunk_cache()
    m = _meta(small_store)
    w = ((0, 8), (0, 5))
    reset_io_counters()
    seq = read_window(small_store, m, w)
    c_seq = io_counters()
    reset_io_counters()
    par = read_window(small_store, m, w, prefetch=prefetch)
    c_par = io_counters()
    assert np.array_equal(seq, par)
    # thread-local counter deltas merged back exactly
    assert c_par == c_seq


def test_prefetch_masked_matches(small_store):
    import os

    from zarr_datafusion_spark.zarr.chunkio import read_window_masked

    os.remove(os.path.join(small_store, "v", "1.0"))
    m = _meta(small_store)
    w = ((0, 8), (0, 5))
    a, ma = read_window_masked(small_store, m, w)
    b, mb = read_window_masked(small_store, m, w, prefetch=4)
    assert np.array_equal(a, b)
    assert ma is not None and mb is not None and np.array_equal(ma, mb)


def test_cache_correct_through_executors(spark, tmp_path):
    """Integration: scan with the cache ON twice, update the store in
    place, scan again — values must be fresh no matter which executor
    workers own which partitions (the cache is per worker process and
    keys by mtime_ns)."""
    from pyspark.sql import functions as F

    from zarr_datafusion_spark.zarr import read_zarr
    from zarr_datafusion_spark.zarr.sink import update_zarr_region, write_zarr

    store = str(tmp_path / "live.zarr")
    df = (
        spark.range(6 * 4)
        .select(
            (F.col("id") / 4).cast("long").alias("t"),
            (F.col("id") % 4).alias("x"),
            F.col("id").alias("v"),
        )
    )
    write_zarr(df, store, ["t", "x"])

    def scan():
        return (
            read_zarr(spark, store, chunk_cache_mb=32)
            .orderBy("t", "x")
            .collect()
        )

    first = scan()
    assert [r.v for r in scan()] == [r.v for r in first]
    upd = spark.createDataFrame(
        [(2, x, 1000 + x) for x in range(4)], "t long, x long, v long"
    )
    update_zarr_region(upd, store)
    after = scan()
    assert [r.v for r in after if r.t == 2] == [1000, 1001, 1002, 1003], (
        "executor chunk cache served stale data after an in-place update"
    )


def test_prefetch_through_executors_and_http(spark, tmp_path):
    """read_zarr(prefetch=N) over a live HTTP store: concurrent ranged
    chunk fetches inside each task, same results as the local scan."""
    import http.server
    import os
    import threading

    from zarr_datafusion_spark.zarr import read_zarr
    from zarr_datafusion_spark.zarr.writer import write_store

    store = str(tmp_path / "h.zarr")
    write_store(
        store,
        {
            "t": (np.arange(6, dtype=np.int64), (6,)),
            "x": (np.arange(4, dtype=np.int64), (4,)),
            "v": (np.arange(24, dtype=np.int64).reshape(6, 4), (1, 4)),
        },
    )
    root = os.path.dirname(store)
    handler = lambda *a, **kw: http.server.SimpleHTTPRequestHandler(  # noqa: E731
        *a, directory=root, **kw
    )
    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), handler)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        url = f"http://127.0.0.1:{srv.server_address[1]}/h.zarr"
        local = read_zarr(spark, store).orderBy("t", "x").collect()
        remote = (
            read_zarr(spark, url, prefetch=4).orderBy("t", "x").collect()
        )
        assert remote == local
    finally:
        srv.shutdown()
        srv.server_close()


def test_ddl_options_cache_and_prefetch(spark, tmp_path):
    """DataFusion's OPTIONS spelling wires the cache/prefetch onto a
    registered table: queries answer identically with them on."""
    from zarr_datafusion_spark.engine import Engine
    from zarr_datafusion_spark.zarr.writer import write_store

    store = str(tmp_path / "ddl.zarr")
    write_store(
        store,
        {
            "t": (np.arange(6, dtype=np.int64), (6,)),
            "x": (np.arange(4, dtype=np.int64), (4,)),
            "v": (np.arange(24, dtype=np.int64).reshape(6, 4), (2, 4)),
        },
    )
    e = Engine(spark)
    e.sql(
        f"CREATE EXTERNAL TABLE cached_tbl STORED AS ZARR LOCATION "
        f"'{store}' OPTIONS ('chunk_cache_mb' '32', 'prefetch' '4')"
    )
    got = e.sql(
        "SELECT t, SUM(v) AS s FROM cached_tbl GROUP BY t ORDER BY t"
    ).collect()
    assert [(r.t, r.s) for r in got] == [
        (t, sum(range(t * 4, t * 4 + 4))) for t in range(6)
    ]
    # twice: the second pass may be served from worker caches — values
    # must be identical either way
    again = e.sql(
        "SELECT t, SUM(v) AS s FROM cached_tbl GROUP BY t ORDER BY t"
    ).collect()
    assert again == got
