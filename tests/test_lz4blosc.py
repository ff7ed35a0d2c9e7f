"""Pure-Python LZ4-block / blosc1 codec tests.

Mirrors the reference's blosc-lz4 coverage (``tests/integration_formats.rs``
uses blosc-lz4 stores; codec path ``src/reader/zarr_reader.rs:68-184``),
which this container can't exercise with native blosc (no wheel).  The
decoder is spec-derived, so the tests pin: round-trips across the
split/leftover/memcpy paths, format invariants a real c-blosc chunk
relies on (header layout, stored-uncompressed streams, shuffle planes),
and hypothesis-driven random buffers.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from zarr_datafusion_spark.zarr.lz4blosc import (
    blosc_compress,
    blosc_decompress,
    lz4_compress_block,
    lz4_decompress_block,
    shuffle,
    unshuffle,
)


@given(st.binary(min_size=0, max_size=20000))
@settings(max_examples=60, deadline=None)
def test_lz4_roundtrip_random(data):
    assert lz4_decompress_block(lz4_compress_block(data), len(data)) == data


@pytest.mark.parametrize(
    "data",
    [
        b"",
        b"x",
        b"abcd" * 5000,  # long matches -> extended match lengths
        b"a" * 300,  # RLE-style overlapping match (offset 1)
        bytes(range(256)) * 40,  # periodic
        np.random.RandomState(3).bytes(30000),  # incompressible
        b"lit" * 6 + bytes(np.arange(255, dtype=np.uint8)),  # >15 literals
    ],
)
def test_lz4_roundtrip_edges(data):
    enc = lz4_compress_block(data)
    assert lz4_decompress_block(enc, len(data)) == data


def test_lz4_overlapping_match_decode():
    """Hand-built stream: 4 literals then an offset-1 match of 20 —
    the classic RLE overlap every conformant decoder must handle."""
    #       token lit=4,match=15+ext  literals  offset=1  ext=1 (mlen=4+15+1)
    raw = bytes([0x4F]) + b"AAAA" + struct.pack("<H", 1) + bytes([1])
    assert lz4_decompress_block(raw, 24) == b"A" * 24


def test_lz4_rejects_bad_offset():
    with pytest.raises(ValueError):
        lz4_decompress_block(bytes([0x04]) + struct.pack("<H", 0), 8)
    with pytest.raises(ValueError):  # offset beyond buffer start
        lz4_decompress_block(bytes([0x14]) + b"A" + struct.pack("<H", 9), 5)


@given(
    st.binary(min_size=0, max_size=8192),
    st.sampled_from([1, 2, 4, 8, 16]),
)
@settings(max_examples=60, deadline=None)
def test_shuffle_roundtrip(data, typesize):
    assert unshuffle(shuffle(data, typesize), typesize) == data


def test_shuffle_is_byte_planes():
    data = bytes([1, 2, 3, 4, 5, 6, 7, 8])  # two 4-byte elements
    assert shuffle(data, 4) == bytes([1, 5, 2, 6, 3, 7, 4, 8])


@pytest.mark.parametrize("typesize", [1, 2, 4, 8])
@pytest.mark.parametrize("n_bytes", [0, 100, 4096, 4100, 40000])
def test_blosc_roundtrip_matrix(typesize, n_bytes):
    """Covers: single block, multi-block, leftover partial block
    (4100 % 4096), split streams (typesize>1, blocksize/ts >= 128)."""
    rng = np.random.RandomState(typesize * 1000 + n_bytes)
    data = rng.randint(0, 40, n_bytes).astype(np.uint8).tobytes()
    enc = blosc_compress(data, typesize=typesize, blocksize=4096)
    assert blosc_decompress(enc) == data


def test_blosc_header_layout():
    """Header must be c-blosc1's documented 16 bytes so native blosc
    (when installed) and this decoder read each other's chunks."""
    data = (b"\x01\x02\x03\x04" * 600)
    enc = blosc_compress(data, typesize=4, blocksize=1024)
    version, versionlz, flags, typesize = enc[0], enc[1], enc[2], enc[3]
    nbytes, blocksize, cbytes = struct.unpack_from("<III", enc, 4)
    assert (version, typesize) == (2, 4)
    assert nbytes == len(data) and cbytes == len(enc)
    assert flags & 0x1  # shuffle on
    assert (flags >> 5) & 0x7 == 1  # lz4 codec code
    # bstarts are absolute chunk offsets, first block after the header
    nblocks = -(-nbytes // blocksize)
    bstarts = struct.unpack_from(f"<{nblocks}I", enc, 16)
    assert bstarts[0] == 16 + 4 * nblocks


def test_blosc_memcpy_chunk():
    data = np.random.RandomState(9).bytes(2000)  # incompressible
    enc = blosc_compress(data, typesize=8)
    assert enc[2] & 0x2, "incompressible data should take the memcpy path"
    assert len(enc) == 16 + len(data)
    assert blosc_decompress(enc) == data


def test_blosc_zlib_inner_codec_decodes():
    """A blosc chunk whose inner codec is zlib (flags code 3) —
    hand-assembled, single unsplit block."""
    data = b"hello world " * 100
    comp = zlib.compress(data)
    flags = 3 << 5  # zlib, no shuffle
    block = struct.pack("<I", len(comp)) + comp
    header = struct.pack(
        "<BBBBIII", 2, 1, flags, 1, len(data), len(data), 16 + 4 + len(block)
    )
    chunk = header + struct.pack("<I", 20) + block
    assert blosc_decompress(chunk) == data


def test_blosc_unsupported_paths_are_actionable():
    header = struct.pack("<BBBBIII", 2, 1, (4 << 5), 1, 10, 10, 16 + 4)
    with pytest.raises(NotImplementedError, match="zstd"):
        blosc_decompress(header + struct.pack("<I", 0))
    header = struct.pack("<BBBBIII", 2, 1, 0x4, 1, 10, 10, 16 + 4)
    with pytest.raises(NotImplementedError, match="bit-shuffle"):
        blosc_decompress(header + struct.pack("<I", 0))


def test_blosc_store_roundtrip_through_reader(tmp_path):
    """End-to-end: write a blosc-lz4 v2 store, read a window through
    chunkio (the executor read path), compare to the source array."""
    from zarr_datafusion_spark.zarr.chunkio import read_window
    from zarr_datafusion_spark.zarr.metadata import discover_arrays
    from zarr_datafusion_spark.zarr.writer import write_store

    rng = np.random.RandomState(21)
    arr = rng.randint(-1000, 1000, (20, 30)).astype(np.int64)
    store = write_store(
        str(tmp_path / "b"),
        {"x": (np.arange(20, dtype=np.int64), (20,)),
         "y": (np.arange(30, dtype=np.int64), (30,)),
         "v": (arr, (7, 30))},
        zarr_format=2,
        compression="blosc-lz4",
    )
    meta = discover_arrays(store)
    out = read_window(store, meta.array("v"), ((3, 18), (5, 25)))
    np.testing.assert_array_equal(out, arr[3:18, 5:25])
