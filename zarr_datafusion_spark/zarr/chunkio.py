"""Chunk-level Zarr I/O: key layout, codecs, windowed reads.

The executor-side half of the scan (reference
``src/reader/zarr_reader.rs`` type-dispatch + chunk assembly).  Reads a
rectangular window of an array by visiting only the chunks that
intersect it — this is what makes coordinate-filter and limit pushdown
actual I/O reductions (``zarr_reader.rs:243-317``).

Codecs: raw, zlib, gzip natively; blosc (lz4/lz4hc/zlib inner codecs)
via an installed ``blosc`` package when present, else the pure-Python
fallback in :mod:`zarr_datafusion_spark.zarr.lz4blosc`; zstd and the
remaining blosc inner codecs (blosclz, snappy) stay gated behind
import-tries with actionable messages.  Missing chunk files materialize
the array's fill_value, per the Zarr spec.
"""

from __future__ import annotations

import gzip
import os
import threading
import zlib

import numpy as np

from zarr_datafusion_spark.zarr.metadata import ZarrArrayMeta, numpy_dtype_for


class _IoCounters(threading.local):
    """Thread-local live I/O counters — the in-process analog of the
    reference's ``TrackedStore`` atomics (``tracked_store.rs:20-98``)."""

    def __init__(self):
        self.reset()

    def reset(self) -> None:
        self.disk_bytes = 0
        self.decoded_bytes = 0
        self.n_chunks = 0


_IO = _IoCounters()


def reset_io_counters() -> None:
    _IO.reset()


class _ChunkCache:
    """Process-wide LRU over DECODED chunks (reference roadmap
    ``README.md:327`` — "LRU cache for frequently accessed chunks", an
    unchecked row; the zarr-python analog is ``LRUStoreCache``).

    Scale posture: one bounded cache per EXECUTOR PYTHON WORKER (Spark
    reuses workers across tasks, so a hot store's chunks survive task
    boundaries); byte-budgeted, never row-count-budgeted.  Local chunk
    keys carry ``(st_size, st_mtime_ns)`` so in-place updates and
    appends can never serve stale data; remote chunks have no cheap
    stat, so they key by path alone — enabling the cache on a remote
    scan is an explicit opt-in to object-immutability (the standard
    object-store posture; a rewritten object under the same key is
    outside the contract).  Cached arrays are marked read-only — every
    consumer copies via slice-assign anyway.

    Cache hits do NOT count toward ``disk_bytes``/``n_chunks`` (those
    are honest physical-read counters); hit/miss/eviction totals live
    here, surfaced by :func:`chunk_cache_stats`.
    """

    def __init__(self) -> None:
        from collections import OrderedDict

        self._lock = threading.Lock()
        self._data: "OrderedDict[tuple, tuple]" = OrderedDict()
        self._bytes = 0
        self.capacity = 0  # bytes; 0 = disabled
        self.hits = 0
        self.misses = 0
        self.evictions = 0

    def configure(self, mb: int) -> None:
        """Raise the process budget to at least ``mb`` MiB (scans with
        different budgets share the one cache; the largest wins)."""
        with self._lock:
            self.capacity = max(self.capacity, int(mb) * (1 << 20))

    def get(self, key: tuple):
        with self._lock:
            hit = self._data.get(key)
            if hit is None:
                self.misses += 1
                return None
            self._data.move_to_end(key)
            self.hits += 1
            return hit[0]

    def put(self, key: tuple, arr) -> None:
        nbytes = int(arr.nbytes)
        with self._lock:
            if nbytes > self.capacity or key in self._data:
                return
            self._data[key] = (arr, nbytes)
            self._bytes += nbytes
            while self._bytes > self.capacity and self._data:
                _, (_, evicted) = self._data.popitem(last=False)
                self._bytes -= evicted
                self.evictions += 1

    def stats(self) -> dict[str, int]:
        with self._lock:
            return {
                "entries": len(self._data),
                "bytes": self._bytes,
                "capacity": self.capacity,
                "hits": self.hits,
                "misses": self.misses,
                "evictions": self.evictions,
            }

    def clear(self) -> None:
        with self._lock:
            self._data.clear()
            self._bytes = 0
            self.capacity = 0
            self.hits = self.misses = self.evictions = 0


_CHUNK_CACHE = _ChunkCache()


def chunk_cache_stats() -> dict[str, int]:
    return _CHUNK_CACHE.stats()


def clear_chunk_cache() -> None:
    _CHUNK_CACHE.clear()


def io_counters() -> dict[str, int]:
    """Snapshot of this thread's counters since the last reset."""
    return {
        "disk_bytes": _IO.disk_bytes,
        "decoded_bytes": _IO.decoded_bytes,
        "n_chunks": _IO.n_chunks,
    }


def _decompress_v2(raw: bytes, compressor: dict | None) -> bytes:
    if compressor is None:
        return raw
    cid = compressor.get("id")
    if cid == "zlib":
        return zlib.decompress(raw)
    if cid == "gzip":
        return gzip.decompress(raw)
    if cid == "zstd":
        try:
            import zstandard  # noqa: F401

            return zstandard.ZstdDecompressor().decompress(raw)
        except ImportError as e:
            raise NotImplementedError(
                "zstd-compressed Zarr chunk but the 'zstandard' package is "
                "not installed in this environment"
            ) from e
    if cid == "blosc":
        try:
            import blosc

            return blosc.decompress(raw)
        except ImportError:
            # dependency-free fallback: pure-Python blosc1/lz4 decoder
            # (covers lz4/lz4hc/zlib codecs; see zarr/lz4blosc.py)
            from zarr_datafusion_spark.zarr.lz4blosc import blosc_decompress

            return blosc_decompress(raw)
    raise NotImplementedError(f"unsupported Zarr v2 compressor: {cid!r}")


def _apply_v2_filters_inverse(raw: bytes, filters: tuple, dtype: np.dtype) -> bytes:
    """Invert a Zarr v2 / numcodecs filter chain (applied in reverse of
    encode order, after decompression).  Supported: ``shuffle``
    (byte-transpose by elementsize) and ``delta`` (first value +
    differences -> cumulative sum), the two filters common in real v2
    stores; anything else raises with the filter id."""
    from zarr_datafusion_spark.zarr.lz4blosc import unshuffle

    for f in reversed(filters):
        fid = (f or {}).get("id")
        if fid == "shuffle":
            raw = unshuffle(raw, int(f.get("elementsize", dtype.itemsize)))
        elif fid == "delta":
            enc_dtype = np.dtype(f.get("astype") or f.get("dtype") or dtype)
            out_dtype = np.dtype(f.get("dtype") or dtype)
            arr = np.frombuffer(raw, dtype=enc_dtype)
            raw = np.cumsum(arr, dtype=out_dtype).tobytes()
        else:
            raise NotImplementedError(f"Zarr v2 filter not supported: {fid!r}")
    return raw


def _decode_v3(raw: bytes, codecs: tuple, dtype: np.dtype) -> tuple[bytes, np.dtype]:
    """Apply the v3 codec chain in reverse (bytes->bytes codecs first,
    then the array->bytes 'bytes' codec fixes endianness).

    ``sharding_indexed`` is handled one level up (``_decode_shard`` in
    ``read_chunk``) because it is an array->bytes codec producing a
    whole chunk, not a bytes transform."""
    endian = "little"
    byte_codecs = []
    for codec in codecs:
        name = codec.get("name")
        if name == "bytes":
            endian = (codec.get("configuration") or {}).get("endian", "little")
        elif name in ("gzip", "zstd", "blosc", "crc32c"):
            byte_codecs.append(codec)
        elif name in ("transpose", "sharding_indexed"):
            raise NotImplementedError(f"Zarr v3 codec not supported here: {name}")
        else:
            raise NotImplementedError(f"unknown Zarr v3 codec: {name}")
    for codec in reversed(byte_codecs):
        name = codec["name"]
        if name == "gzip":
            raw = gzip.decompress(raw)
        elif name == "crc32c":
            raw = raw[:-4]  # trailing checksum; not verified
        elif name == "zstd":
            try:
                import zstandard

                raw = zstandard.ZstdDecompressor().decompress(raw)
            except ImportError as e:
                raise NotImplementedError(
                    "zstd codec requires the 'zstandard' package"
                ) from e
        elif name == "blosc":
            try:
                import blosc

                raw = blosc.decompress(raw)
            except ImportError:
                # v3 blosc codec payload is a blosc1 chunk; decode with
                # the dependency-free fallback (zarr/lz4blosc.py)
                from zarr_datafusion_spark.zarr.lz4blosc import blosc_decompress

                raw = blosc_decompress(raw)
    return raw, dtype.newbyteorder("<" if endian == "little" else ">")


def _index_nbytes(n_inner: int, index_codecs: tuple) -> int:
    """Encoded size of a shard index: 16 bytes per inner chunk
    (offset u64le, nbytes u64le) plus 4 for a crc32c suffix if the
    declared index codec chain includes one."""
    size = n_inner * 16
    if any(c.get("name") == "crc32c" for c in index_codecs):
        size += 4
    return size


def _decode_shard(
    raw: bytes, cfg: dict, dtype: np.dtype, shard_shape: tuple, fill_value
) -> np.ndarray:
    """Decode one ``sharding_indexed`` shard (Zarr v3 ZEP-2).

    A shard is a container of inner chunks plus an index: a
    ``(*chunks_per_shard, 2)`` uint64-le array of (offset, nbytes)
    pairs, offsets relative to the shard start, ``2**64-1`` marking a
    missing inner chunk (fill value).  The index sits at
    ``index_location`` ("start" | "end", default end), encoded by
    ``index_codecs`` (only bytes-little [+ crc32c suffix, stripped
    unverified] supported — zarr-python's defaults).  Inner chunks
    decode through the regular v3 chain (``configuration.codecs``),
    so gzip / blosc-lz4 inner compression works, and nested sharding
    recurses naturally via ``read_chunk``'s dispatch.

    The reference reads sharded stores through the zarrs crate
    (``src/reader/zarr_reader.rs:68-184``); this is the from-scratch
    equivalent."""
    inner_shape = tuple(cfg["chunk_shape"])
    if len(inner_shape) != len(shard_shape) or any(
        s % i for s, i in zip(shard_shape, inner_shape)
    ):
        raise ValueError(
            f"inner chunk shape {inner_shape} does not tile shard {shard_shape}"
        )
    cps = tuple(s // i for s, i in zip(shard_shape, inner_shape))
    n_inner = int(np.prod(cps))
    index_codecs = tuple(cfg.get("index_codecs") or ({"name": "bytes"},))
    for c in index_codecs:
        if c.get("name") not in ("bytes", "crc32c"):
            raise NotImplementedError(
                f"shard index codec not supported: {c.get('name')}"
            )
        if c.get("name") == "bytes" and (
            (c.get("configuration") or {}).get("endian", "little") != "little"
        ):
            raise NotImplementedError("big-endian shard index not supported")
    idx_nbytes = _index_nbytes(n_inner, index_codecs)
    if len(raw) < idx_nbytes:
        raise ValueError("shard smaller than its index")
    if cfg.get("index_location", "end") == "start":
        idx_raw = raw[:idx_nbytes]
    else:
        idx_raw = raw[-idx_nbytes:]
    if any(c.get("name") == "crc32c" for c in index_codecs):
        idx_raw = idx_raw[:-4]  # checksum stripped, not verified
    index = np.frombuffer(idx_raw, dtype="<u8").reshape(n_inner, 2)

    inner_codecs = tuple(cfg.get("codecs") or ({"name": "bytes"},))
    missing = np.uint64(2**64 - 1)
    out = np.full(shard_shape, fill_value if fill_value is not None else 0, dtype=dtype)
    import itertools

    for flat, inner_idx in enumerate(itertools.product(*(range(c) for c in cps))):
        off, nb = index[flat]
        if off == missing and nb == missing:
            continue  # missing inner chunk -> fill value
        payload = raw[int(off) : int(off) + int(nb)]
        if any(c.get("name") == "sharding_indexed" for c in inner_codecs):
            sub_cfg = next(
                c for c in inner_codecs if c.get("name") == "sharding_indexed"
            )["configuration"]
            block = _decode_shard(payload, sub_cfg, dtype, inner_shape, fill_value)
        else:
            dec, dt = _decode_v3(payload, inner_codecs, dtype)
            block = np.frombuffer(dec, dtype=dt).reshape(inner_shape)
        sel = tuple(
            slice(i * s, (i + 1) * s) for i, s in zip(inner_idx, inner_shape)
        )
        out[sel] = block
    return out


def _chunk_path(store_path: str, meta: ZarrArrayMeta, idx: tuple[int, ...]) -> str:
    if meta.zarr_format == 2:
        key = meta.dimension_separator.join(str(i) for i in idx)
        return os.path.join(store_path, meta.name, *key.split("/"))
    parts = ["c"] + [str(i) for i in idx]
    if meta.chunk_key_separator == "/":
        return os.path.join(store_path, meta.name, *parts)
    return os.path.join(store_path, meta.name, meta.chunk_key_separator.join(parts))


import functools


@functools.lru_cache(maxsize=64)
def _store_fs(store_path: str):
    """Adapter dispatch (local vs fsspec), memoized per store path —
    executor tasks call read_chunk per chunk and the adapter is
    stateless."""
    from zarr_datafusion_spark.zarr.storage import store_fs

    return store_fs(store_path)[0]


def read_chunk(store_path: str, meta: ZarrArrayMeta, idx: tuple[int, ...]) -> np.ndarray:
    """Read + decode one chunk; missing file -> fill_value (Zarr spec)."""
    return read_chunk_ex(store_path, meta, idx)[0]


def read_chunk_ex(
    store_path: str,
    meta: ZarrArrayMeta,
    idx: tuple[int, ...],
    cache_mb: int = 0,
) -> tuple[np.ndarray, bool]:
    """:func:`read_chunk` plus a ``missing`` flag: True when the chunk
    FILE was absent and the array is spec-mandated fill_value — the raw
    material for the optional fill-as-null surface (reference roadmap
    ``README.md:318``).  A present-but-sharded file with missing INNER
    chunks reports False: its gaps are sub-file and stay fill_value
    (documented limitation of the null mask).

    ``cache_mb > 0`` consults/feeds the process LRU over decoded
    chunks (:class:`_ChunkCache`); missing chunks are never cached
    (``np.full`` is cheaper than a lookup, and an appended store must
    see a late-arriving chunk file immediately)."""
    cache_key = None
    if cache_mb > 0:
        _CHUNK_CACHE.configure(cache_mb)
        if "://" in store_path:
            # remote: no cheap stat — path-keyed, documented opt-in to
            # object immutability
            cache_key = (store_path, meta.name, idx)
        else:
            try:
                st = os.stat(_chunk_path(store_path, meta, idx))
                cache_key = (
                    store_path, meta.name, idx, st.st_size, st.st_mtime_ns,
                )
            except OSError:
                cache_key = None  # absent: fall through to the fill path
        if cache_key is not None:
            hit = _CHUNK_CACHE.get(cache_key)
            if hit is not None:
                return hit, False
    arr, missing = _read_chunk_ex_uncached(store_path, meta, idx)
    if cache_key is not None and not missing:
        if isinstance(arr, np.memmap):
            # the cache must hold HEAP memory: a cached mapping would
            # pin one fd per entry and expose the entry to any
            # non-atomic in-place rewrite of the old file
            arr = np.asarray(arr).copy()
        arr.setflags(write=False)
        _CHUNK_CACHE.put(cache_key, arr)
    return arr, missing


#: Zero-copy memory-mapped reads of RAW (codec-free) local chunks —
#: reference roadmap ``README.md:314`` ("Zero-copy reads with
#: memory-mapped I/O").  Flag exists for tests/A-B only; semantics are
#: identical to the buffered path (strict absence contract included).
MMAP_LOCAL_RAW = True


def _mmap_dtype(store_path: str, meta: ZarrArrayMeta):
    """The on-disk dtype when a chunk is eligible for zero-copy mmap —
    LOCAL store, raw codec chain (v2: no compressor/filters; v3: at
    most the ``bytes`` endian codec) — else None.  Decoding such a
    chunk is a pure reinterpretation of the file's bytes, so the page
    cache can back the array directly: no read() copy, and a window
    that slices one row of a chunk only ever faults that row's pages."""
    if not MMAP_LOCAL_RAW or "://" in store_path:
        return None
    dtype = numpy_dtype_for(meta.dtype, meta.byte_order)
    if meta.zarr_format == 2:
        return dtype if meta.compressor is None and not meta.filters else None
    endian = "little"
    for codec in meta.codecs:
        if codec.get("name") != "bytes":
            return None
        endian = (codec.get("configuration") or {}).get("endian", "little")
    return dtype.newbyteorder("<" if endian == "little" else ">")


def _read_chunk_ex_uncached(
    store_path: str, meta: ZarrArrayMeta, idx: tuple[int, ...]
) -> tuple[np.ndarray, bool]:
    fs = _store_fs(store_path)
    dtype = numpy_dtype_for(meta.dtype, meta.byte_order)
    path = _chunk_path(store_path, meta, idx)
    mm_dtype = _mmap_dtype(store_path, meta)
    if mm_dtype is not None:
        try:
            arr = np.memmap(path, dtype=mm_dtype, mode="r")
        except FileNotFoundError:
            arr = None  # definitive absence: the spec'd fill path below
        except ValueError as e:
            # np.memmap raises ValueError on a size/itemsize mismatch —
            # surface it as the same corruption error the buffered path
            # gives, never as fill values
            raise ValueError(
                f"{meta.name} chunk {idx}: file size is not a whole "
                f"number of {mm_dtype} elements ({e})"
            ) from None
        if arr is not None:
            if arr.size != int(np.prod(meta.chunks)):
                raise ValueError(
                    f"{meta.name} chunk {idx}: decoded {arr.size} elements, "
                    f"expected {int(np.prod(meta.chunks))}"
                )
            _IO.disk_bytes += arr.nbytes
            _IO.decoded_bytes += arr.nbytes
            _IO.n_chunks += 1
            return arr.reshape(meta.chunks, order=meta.order), False
    # ONE round trip per chunk: read directly and map the adapter's
    # DEFINITIVE not-found to the fill path (try_read_bytes keeps the
    # strict ADVICE r7 contract — any non-404 failure raises, never
    # degrades to fabricated fill values).  The old exists-then-read
    # pair cost remote scans a HEAD per chunk.
    raw = fs.try_read_bytes(path)
    if raw is None:
        fill = meta.fill_value if meta.fill_value is not None else 0
        if dtype.kind == "S":
            # zarr v2 spec: fill_value for fixed-length byte strings is
            # base64-encoded; taking it verbatim would corrupt gap-chunk
            # values (b'bnVsbA==' instead of b'null')
            if isinstance(fill, str):
                import base64

                try:
                    fill = base64.b64decode(fill, validate=True)
                except Exception:
                    fill = fill.encode("utf-8")
            elif not isinstance(fill, bytes):
                fill = b""
        elif dtype.kind == "U" and not isinstance(fill, str):
            fill = ""
        return np.full(meta.chunks, fill, dtype=dtype), True
    _IO.disk_bytes += len(raw)
    _IO.n_chunks += 1
    transpose_order = None
    if meta.zarr_format == 2:
        raw = _decompress_v2(raw, meta.compressor)
        if meta.filters:
            raw = _apply_v2_filters_inverse(raw, meta.filters, dtype)
    else:
        shard = next(
            (c for c in meta.codecs if c.get("name") == "sharding_indexed"), None
        )
        if shard is not None:
            arr = _decode_shard(
                raw,
                shard.get("configuration") or {},
                dtype,
                tuple(meta.chunks),
                meta.fill_value,
            )
            _IO.decoded_bytes += arr.nbytes
            return arr, False
        transpose = next(
            (c for c in meta.codecs if c.get("name") == "transpose"), None
        )
        if transpose is not None:
            transpose_order = tuple(
                (transpose.get("configuration") or {}).get(
                    "order", range(len(meta.chunks))
                )
            )
        codecs = tuple(c for c in meta.codecs if c.get("name") != "transpose")
        raw, dtype = _decode_v3(raw, codecs, dtype)
    arr = np.frombuffer(raw, dtype=dtype)
    if arr.size != int(np.prod(meta.chunks)):
        raise ValueError(
            f"{meta.name} chunk {idx}: decoded {arr.size} elements, "
            f"expected {int(np.prod(meta.chunks))}"
        )
    _IO.decoded_bytes += arr.nbytes
    if transpose_order is not None:
        # v3 transpose codec: stored array = input.transpose(order);
        # invert by reshaping to the stored (permuted) shape and
        # transposing back with the inverse permutation.
        stored_shape = tuple(meta.chunks[i] for i in transpose_order)
        inverse = tuple(int(i) for i in np.argsort(transpose_order))
        return (
            np.ascontiguousarray(arr.reshape(stored_shape).transpose(inverse)),
            False,
        )
    return arr.reshape(meta.chunks, order=meta.order), False


def _gather_chunks(
    store_path: str,
    meta: ZarrArrayMeta,
    idxs: list[tuple[int, ...]],
    cache_mb: int = 0,
    prefetch: int = 0,
):
    """(chunk, missing) per index, in order.  ``prefetch > 1`` fetches
    + decodes chunks on a bounded thread pool (reference roadmap
    ``README.md:326`` — "Async chunk prefetching"): remote chunks are
    latency-bound, so overlapping ranged GETs inside ONE task is pure
    win, while the cross-chunk parallelism a cluster needs stays where
    it belongs — in Spark's partitioning, one slab-range per task.
    The I/O counters are thread-local; each pool task measures its own
    deltas and the caller's thread absorbs them, so stats stay exact
    under concurrency."""
    if prefetch <= 1 or len(idxs) <= 1:
        return [read_chunk_ex(store_path, meta, i, cache_mb) for i in idxs]

    from concurrent.futures import ThreadPoolExecutor

    def task(idx):
        _IO.reset()  # pool-thread-local; each task measures itself
        res = read_chunk_ex(store_path, meta, idx, cache_mb)
        return res, io_counters()

    with ThreadPoolExecutor(max_workers=min(prefetch, len(idxs))) as pool:
        results = list(pool.map(task, idxs))
    for _res, c in results:
        _IO.disk_bytes += c["disk_bytes"]
        _IO.decoded_bytes += c["decoded_bytes"]
        _IO.n_chunks += c["n_chunks"]
    return [res for res, _c in results]


def read_window(
    store_path: str,
    meta: ZarrArrayMeta,
    window: tuple[tuple[int, int], ...],
    cache_mb: int = 0,
    prefetch: int = 0,
) -> np.ndarray:
    """Read the half-open rectangular ``window`` ((start, stop) per dim),
    visiting only intersecting chunks (the I/O-reduction core of
    pushdown, ``zarr_reader.rs:243-317``).  ``cache_mb``/``prefetch``
    enable the decoded-chunk LRU and intra-window concurrent fetch
    (reference roadmap ``README.md:326-327``)."""
    if len(window) != len(meta.shape):
        raise ValueError(f"window rank {len(window)} != array rank {len(meta.shape)}")
    out_shape = tuple(hi - lo for lo, hi in window)
    dtype = numpy_dtype_for(meta.dtype, meta.byte_order)
    out = np.empty(out_shape, dtype=dtype.newbyteorder("="))

    chunk_ranges = [
        range(lo // cs, (hi + cs - 1) // cs) if hi > lo else range(0)
        for (lo, hi), cs in zip(window, meta.chunks)
    ]
    if any(len(r) == 0 for r in chunk_ranges):
        return _decode_fixed_strings(out)

    import itertools

    idxs = list(itertools.product(*chunk_ranges))
    chunks = _gather_chunks(store_path, meta, idxs, cache_mb, prefetch)
    for idx, (chunk, _missing) in zip(idxs, chunks):
        src_sel, dst_sel = [], []
        for d, ci in enumerate(idx):
            cs = meta.chunks[d]
            lo, hi = window[d]
            c_lo, c_hi = ci * cs, min((ci + 1) * cs, meta.shape[d])
            s_lo, s_hi = max(lo, c_lo), min(hi, c_hi)
            src_sel.append(slice(s_lo - c_lo, s_hi - c_lo))
            dst_sel.append(slice(s_lo - lo, s_hi - lo))
        out[tuple(dst_sel)] = chunk[tuple(src_sel)]
    return _decode_fixed_strings(out)


def read_window_masked(
    store_path: str,
    meta: ZarrArrayMeta,
    window: tuple[tuple[int, int], ...],
    cache_mb: int = 0,
    prefetch: int = 0,
) -> tuple[np.ndarray, np.ndarray | None]:
    """:func:`read_window` plus a boolean MISSING mask (True = the cell
    came from an absent chunk file and holds spec-mandated fill_value)
    — the raw material for the optional fill-as-null read surface
    (reference roadmap ``README.md:318``).  Returns ``(array, None)``
    when every visited chunk was present, so the common no-gap case
    allocates nothing extra.  Sharded stores mask only wholly-missing
    SHARD files; sub-file inner gaps stay fill_value (documented)."""

    if len(window) != len(meta.shape):
        raise ValueError(f"window rank {len(window)} != array rank {len(meta.shape)}")
    out_shape = tuple(hi - lo for lo, hi in window)
    dtype = numpy_dtype_for(meta.dtype, meta.byte_order)
    out = np.empty(out_shape, dtype=dtype.newbyteorder("="))
    mask: np.ndarray | None = None

    chunk_ranges = [
        range(lo // cs, (hi + cs - 1) // cs) if hi > lo else range(0)
        for (lo, hi), cs in zip(window, meta.chunks)
    ]
    if any(len(r) == 0 for r in chunk_ranges):
        return _decode_fixed_strings(out), None

    import itertools

    idxs = list(itertools.product(*chunk_ranges))
    chunks = _gather_chunks(store_path, meta, idxs, cache_mb, prefetch)
    for idx, (chunk, missing) in zip(idxs, chunks):
        src_sel, dst_sel = [], []
        for d, ci in enumerate(idx):
            cs = meta.chunks[d]
            lo, hi = window[d]
            c_lo, c_hi = ci * cs, min((ci + 1) * cs, meta.shape[d])
            s_lo, s_hi = max(lo, c_lo), min(hi, c_hi)
            src_sel.append(slice(s_lo - c_lo, s_hi - c_lo))
            dst_sel.append(slice(s_lo - lo, s_hi - lo))
        out[tuple(dst_sel)] = chunk[tuple(src_sel)]
        if missing:
            if mask is None:
                mask = np.zeros(out_shape, dtype=bool)
            mask[tuple(dst_sel)] = True
    return _decode_fixed_strings(out), mask


def _decode_fixed_strings(arr: np.ndarray) -> np.ndarray:
    """Fixed-length byte strings (|S<n>) decode to unicode at the read
    boundary, so every consumer (coord expansion, filter-literal
    comparison, min/max stats, Arrow conversion) sees Python-comparable
    strings; chunk assembly above stays raw bytes."""
    if arr.dtype.kind == "S":
        return np.char.decode(arr, "utf-8")
    return arr


def read_array(store_path: str, meta: ZarrArrayMeta) -> np.ndarray:
    """Read a whole (typically 1-D coordinate) array."""
    return read_window(store_path, meta, tuple((0, s) for s in meta.shape))
