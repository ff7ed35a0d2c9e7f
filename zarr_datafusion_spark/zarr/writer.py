"""Minimal Zarr v2/v3 store writer (fixtures + round-trip tests).

The reference generates fixtures with the ``zarr`` python library
(``scripts/data_gen.py``); this container doesn't ship it, so this is a
from-scratch raw-JSON + binary-chunk writer covering exactly the
features our reader supports: C-order arrays, regular chunk grids,
raw/zlib/gzip compression, v2 ``.``/``/`` separators and v3 default
chunk-key encoding.  Not a general-purpose writer.
"""

from __future__ import annotations

import gzip
import itertools
import json
import os
import zlib

import numpy as np

_V2_DTYPE = {
    "int8": "|i1",
    "int16": "<i2",
    "int32": "<i4",
    "int64": "<i8",
    "uint8": "|u1",
    "uint16": "<u2",
    "uint32": "<u4",
    "uint64": "<u8",
    "float16": "<f2",
    "float32": "<f4",
    "float64": "<f8",
    "bool": "|b1",
    "datetime64[ns]": "<M8[ns]",
    "datetime64[us]": "<M8[us]",
    "datetime64[ms]": "<M8[ms]",
    "datetime64[s]": "<M8[s]",
}


def _chunks_of(shape: tuple[int, ...], chunks: tuple[int, ...]):
    ranges = [range((s + c - 1) // c) for s, c in zip(shape, chunks)]
    return itertools.product(*ranges)


def _chunk_bytes(arr: np.ndarray, chunks: tuple[int, ...], idx: tuple[int, ...]) -> bytes:
    sel = tuple(
        slice(i * c, min((i + 1) * c, s)) for i, c, s in zip(idx, chunks, arr.shape)
    )
    block = arr[sel]
    # Pad partial edge chunks to full chunk shape (Zarr stores full chunks)
    if block.shape != tuple(chunks):
        padded = np.zeros(chunks, dtype=arr.dtype)
        padded[tuple(slice(0, e) for e in block.shape)] = block
        block = padded
    return np.ascontiguousarray(block).tobytes()


def _compress(raw: bytes, compression: str | None, typesize: int = 1) -> bytes:
    if compression is None:
        return raw
    if compression == "zlib":
        return zlib.compress(raw, 1)
    if compression == "gzip":
        return gzip.compress(raw, 1)
    if compression == "blosc-lz4":
        from zarr_datafusion_spark.zarr.lz4blosc import blosc_compress

        return blosc_compress(raw, typesize=typesize, do_shuffle=True)
    raise ValueError(
        f"writer supports zlib/gzip/blosc-lz4/None, got {compression!r}"
    )


def _apply_v2_filters(raw: bytes, filters: tuple, dtype: np.dtype) -> bytes:
    """Apply a v2/numcodecs filter chain in ENCODE order (the inverse
    of ``chunkio._apply_v2_filters_inverse``): ``delta`` stores the
    first value + successive differences, ``shuffle`` byte-transposes
    by element size.  Symmetric with the reader, so a
    writer-filtered store roundtrips through the repo's own scan."""
    from zarr_datafusion_spark.zarr.lz4blosc import shuffle as _shuf

    for f in filters:
        fid = (f or {}).get("id")
        if fid == "delta":
            x = np.frombuffer(raw, dtype=np.dtype(f.get("dtype") or dtype))
            enc_dtype = np.dtype(f.get("astype") or f.get("dtype") or dtype)
            d = np.concatenate([x[:1], np.diff(x)]).astype(enc_dtype)
            raw = d.tobytes()
        elif fid == "shuffle":
            raw = _shuf(raw, int(f.get("elementsize", dtype.itemsize)))
        else:
            raise NotImplementedError(f"v2 filter not supported: {fid!r}")
    return raw


def write_v2_array(
    store: str,
    name: str,
    arr: np.ndarray,
    chunks: tuple[int, ...],
    compression: str | None = None,
    dimension_separator: str = ".",
    filters: tuple | None = None,
    dims: tuple | None = None,
) -> None:
    adir = os.path.join(store, name)
    os.makedirs(adir, exist_ok=True)
    if arr.dtype.kind == "S":
        dtype_str = f"|S{arr.dtype.itemsize}"
    elif arr.dtype.kind == "U":
        dtype_str = f"<U{arr.dtype.itemsize // 4}"
    else:
        dtype_str = _V2_DTYPE[str(arr.dtype)]
    if compression == "blosc-lz4":
        compressor = {
            "id": "blosc",
            "cname": "lz4",
            "clevel": 5,
            "shuffle": 1,
            "blocksize": 0,
        }
    elif compression:
        compressor = {"id": compression, "level": 1}
    else:
        compressor = None
    if arr.dtype.kind == "S":
        # v2 spec: byte-string fill_value is base64-encoded
        import base64

        fill_value: object = base64.b64encode(b"").decode("ascii")
    elif arr.dtype.kind == "U":
        fill_value = ""
    else:
        fill_value = 0
    meta = {
        "zarr_format": 2,
        "shape": list(arr.shape),
        "chunks": list(chunks),
        "dtype": dtype_str,
        "compressor": compressor,
        "fill_value": fill_value,
        "order": "C",
        "filters": list(filters) if filters else None,
        "dimension_separator": dimension_separator,
    }
    with open(os.path.join(adir, ".zarray"), "w") as f:
        json.dump(meta, f)
    if dims:
        # xarray requires _ARRAY_DIMENSIONS on EVERY array to open a
        # v2 store; our reader uses it for exact axis order
        with open(os.path.join(adir, ".zattrs"), "w") as f:
            json.dump({"_ARRAY_DIMENSIONS": list(dims)}, f)
    for idx in _chunks_of(arr.shape, chunks):
        key = dimension_separator.join(str(i) for i in idx)
        path = os.path.join(adir, *key.split("/"))
        os.makedirs(os.path.dirname(path), exist_ok=True)
        raw = _chunk_bytes(arr, chunks, idx)
        if filters:
            raw = _apply_v2_filters(raw, tuple(filters), arr.dtype)
        tmp = f"{path}.tmp{os.getpid()}"
        with open(tmp, "wb") as f:
            f.write(_compress(raw, compression, typesize=arr.dtype.itemsize))
        os.replace(tmp, path)


def _encode_shard(
    block: np.ndarray,
    inner_shape: tuple[int, ...],
    compression: str | None,
) -> bytes:
    """Encode one ``sharding_indexed`` shard (index at end, bytes-le
    index codec): concatenated encoded inner chunks followed by the
    (n_inner, 2) uint64-le (offset, nbytes) index."""
    import struct as _struct

    cps = tuple(s // i for s, i in zip(block.shape, inner_shape))
    payloads: list[bytes] = []
    index: list[tuple[int, int]] = []
    pos = 0
    for idx in itertools.product(*(range(c) for c in cps)):
        sel = tuple(
            slice(i * s, (i + 1) * s) for i, s in zip(idx, inner_shape)
        )
        raw = np.ascontiguousarray(block[sel]).tobytes()
        enc = _compress(raw, compression, typesize=block.dtype.itemsize)
        payloads.append(enc)
        index.append((pos, len(enc)))
        pos += len(enc)
    idx_bytes = b"".join(_struct.pack("<QQ", o, n) for o, n in index)
    return b"".join(payloads) + idx_bytes


def write_v3_array(
    store: str,
    name: str,
    arr: np.ndarray,
    chunks: tuple[int, ...],
    compression: str | None = None,
    inner_chunks: tuple[int, ...] | None = None,
    dims: tuple | None = None,
) -> None:
    adir = os.path.join(store, name)
    os.makedirs(adir, exist_ok=True)
    codecs = [{"name": "bytes", "configuration": {"endian": "little"}}]
    if compression == "gzip":
        codecs.append({"name": "gzip", "configuration": {"level": 1}})
    elif compression == "blosc-lz4":
        codecs.append(
            {
                "name": "blosc",
                "configuration": {
                    "cname": "lz4",
                    "clevel": 5,
                    "shuffle": "shuffle",
                    "typesize": arr.dtype.itemsize,
                    "blocksize": 0,
                },
            }
        )
    elif compression is not None:
        raise ValueError(
            f"v3 writer supports gzip/blosc-lz4/None, got {compression!r}"
        )
    if inner_chunks is not None:
        # wrap the chain in sharding_indexed: chunk files become shards
        # of inner chunks (ZEP-2); index at end, bytes-le index codec
        codecs = [
            {
                "name": "sharding_indexed",
                "configuration": {
                    "chunk_shape": list(inner_chunks),
                    "codecs": codecs,
                    "index_codecs": [
                        {"name": "bytes", "configuration": {"endian": "little"}}
                    ],
                    "index_location": "end",
                },
            }
        ]
    meta = {
        "zarr_format": 3,
        "node_type": "array",
        "shape": list(arr.shape),
        "data_type": str(arr.dtype),
        "chunk_grid": {
            "name": "regular",
            "configuration": {"chunk_shape": list(chunks)},
        },
        "chunk_key_encoding": {
            "name": "default",
            "configuration": {"separator": "/"},
        },
        "codecs": codecs,
        "fill_value": 0,
        "attributes": {},
    }
    if dims:
        meta["dimension_names"] = list(dims)  # v3 core-spec field
    with open(os.path.join(adir, "zarr.json"), "w") as f:
        json.dump(meta, f)
    # v3 'bytes' codec is little-endian here
    le = arr.astype(arr.dtype.newbyteorder("<"), copy=False)
    for idx in _chunks_of(arr.shape, chunks):
        path = os.path.join(adir, "c", *[str(i) for i in idx])
        os.makedirs(os.path.dirname(path), exist_ok=True)
        if inner_chunks is not None:
            sel = tuple(
                slice(i * c, min((i + 1) * c, s))
                for i, c, s in zip(idx, chunks, le.shape)
            )
            block = le[sel]
            if block.shape != tuple(chunks):  # pad partial edge shard
                padded = np.zeros(chunks, dtype=le.dtype)
                padded[tuple(slice(0, e) for e in block.shape)] = block
                block = padded
            payload = _encode_shard(block, inner_chunks, compression)
        else:
            payload = _compress(
                _chunk_bytes(le, chunks, idx),
                compression,
                typesize=arr.dtype.itemsize,
            )
        tmp = f"{path}.tmp{os.getpid()}"
        with open(tmp, "wb") as f:
            f.write(payload)
        os.replace(tmp, path)


def write_store(
    store: str,
    arrays: dict[str, tuple[np.ndarray, tuple[int, ...]]],
    zarr_format: int = 2,
    compression: str | None = None,
) -> str:
    """Write a whole store: ``arrays`` maps name -> (ndarray, chunks).

    The root group marker is written LAST so it doubles as a completion
    marker: an interrupted write leaves a store that marker-checking
    callers (e.g. ``fixture_store``) will regenerate rather than
    treating a half-written store as complete."""
    os.makedirs(store, exist_ok=True)
    if zarr_format == 2:
        for name, (arr, chunks) in arrays.items():
            write_v2_array(store, name, arr, chunks, compression)
        with open(os.path.join(store, ".zgroup"), "w") as f:
            json.dump({"zarr_format": 2}, f)
    else:
        for name, (arr, chunks) in arrays.items():
            write_v3_array(store, name, arr, chunks, compression)
        with open(os.path.join(store, "zarr.json"), "w") as f:
            json.dump({"zarr_format": 3, "node_type": "group"}, f)
    return store


def synthetic_weather_arrays(
    ntime: int = 7, nlat: int = 10, nlon: int = 10, seed: int = 42
) -> dict[str, tuple[np.ndarray, tuple[int, ...]]]:
    """The reference's synthetic fixture semantics (time×lat×lon int64
    grids, seed 42 — ``scripts/data_gen.py:52-133``), regenerated
    independently."""
    rng = np.random.RandomState(seed)
    return {
        "time": (np.arange(ntime, dtype=np.int64), (ntime,)),
        "lat": (np.arange(nlat, dtype=np.int64), (nlat,)),
        "lon": (np.arange(nlon, dtype=np.int64), (nlon,)),
        "temperature": (
            rng.randint(-50, 60, (ntime, nlat, nlon)).astype(np.int64),
            (1, nlat, nlon),
        ),
        "humidity": (
            rng.randint(10, 80, (ntime, nlat, nlon)).astype(np.int64),
            (1, nlat, nlon),
        ),
    }
