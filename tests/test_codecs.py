"""Pure-python zarr chunk codecs (pfb_tpu/utils/codecs.py) — the read
path for reference-produced compressed stores (the reference's
``xds_to_zarr`` writes blosc-lz4-shuffle chunks by default,
/root/reference/pfb/workers/init.py:79-81). The blosc/lz4 C libraries
are absent here, so the lz4/blosclz decoders are checked against
HAND-CRAFTED streams written straight from the format specs, and the
blosc frame logic against frames built by an independent in-test
encoder (raw split streams + zlib inner codec)."""

import json
import struct
import zlib

import numpy as np
import pytest
from numpy.testing import assert_array_equal

from pfb_tpu.utils import codecs, dstore


# ----------------------------------------------------------------- lz4

def test_lz4_literals_and_match():
    # seq1: 8 literals "abcdefgh", then a 64-byte match at offset 8
    # (overlapping run); seq2 (final): 4 literals "tail".
    stream = (bytes([(8 << 4) | 15]) + b"abcdefgh"
              + struct.pack("<H", 8) + bytes([45])
              + bytes([4 << 4]) + b"tail")
    out = codecs.lz4_block_decompress(stream, 8 + 64 + 4)
    assert out == b"abcdefgh" * 9 + b"tail"


def test_lz4_long_literal_run():
    data = bytes(range(256)) * 2  # 512 literals, no match
    # token lit nibble 15, extension 255 + 242 = 512
    stream = bytes([15 << 4, 255, 242]) + data
    assert codecs.lz4_block_decompress(stream, 512) == data


def test_lz4_wrong_size_raises():
    with pytest.raises(ValueError):
        codecs.lz4_block_decompress(bytes([1 << 4]) + b"a", 5)


# ------------------------------------------------------------- blosclz

def test_blosclz_literals_and_match():
    # literals "XY" then a 38-byte match at distance 2 (run of "XY").
    stream = bytes([1]) + b"XY" + bytes([(7 << 5) | 0, 29, 1])
    out = codecs.blosclz_decompress(stream, 40)
    assert out == b"XY" * 20


def test_blosclz_pure_literals():
    data = b"0123456789"
    stream = bytes([len(data) - 1]) + data
    assert codecs.blosclz_decompress(stream, 10) == data


# ------------------------------------------------------------ shuffles

def test_byte_unshuffle_roundtrip():
    rng = np.random.default_rng(0)
    arr = rng.integers(0, 2**31, size=37, dtype=np.int64)
    buf = arr.tobytes() + b"xy"  # 2 trailing unshuffled bytes
    b = np.frombuffer(buf[:37 * 8], np.uint8)
    shuffled = b.reshape(37, 8).T.reshape(-1).tobytes() + b"xy"
    assert codecs.byte_unshuffle(shuffled, 8) == buf


def test_bit_unshuffle_roundtrip():
    rng = np.random.default_rng(1)
    arr = rng.integers(0, 2**15, size=43, dtype=np.uint16)
    buf = arr.tobytes() + b"z"  # trailing non-multiple byte
    nel, ts = 43, 2
    nproc = nel - nel % 8
    b = np.frombuffer(buf[:nproc * ts], np.uint8)
    bits = np.unpackbits(b.reshape(nproc, ts), axis=-1,
                         bitorder="little")  # (nproc, ts*8)
    fwd = np.packbits(bits.T.reshape(ts * 8, nproc), axis=-1,
                      bitorder="little").tobytes()
    shuffled = fwd + buf[nproc * ts:]
    assert codecs.bit_unshuffle(shuffled, ts) == buf


# --------------------------------------------------------- blosc frame

def _blosc_encode(data, typesize, blocksize, codec_id=1, shuffle=True,
                  split=True, inner=None):
    """Independent minimal blosc1 encoder for testing the decoder:
    shuffles per block, splits into typesize streams (stored raw when
    ``inner`` is None, else compressed when it pays)."""
    nbytes = len(data)
    nblocks = -(-nbytes // blocksize)
    leftover = nbytes % blocksize
    flags = (codec_id << 5)
    if shuffle and typesize > 1:
        flags |= 0x1
    if not split:
        flags |= 0x10
    body = bytearray()
    bstarts = []
    base = 16 + 4 * nblocks
    for j in range(nblocks):
        last = j == nblocks - 1
        bsize = leftover if (last and leftover) else blocksize
        block = data[j * blocksize:j * blocksize + bsize]
        if shuffle and typesize > 1:
            b = np.frombuffer(block, np.uint8)
            nel = bsize // typesize
            sh = b[:nel * typesize].reshape(nel, typesize).T.reshape(-1)
            block = sh.tobytes() + bytes(b[nel * typesize:])
        do_split = (split and typesize <= 16 and typesize > 1
                    and blocksize // typesize >= 128
                    and not (last and leftover))
        nsplits = typesize if do_split else 1
        neblock = bsize // nsplits
        bstarts.append(base + len(body))
        for s in range(nsplits):
            piece = block[s * neblock:(s + 1) * neblock]
            comp = inner(piece) if inner else piece
            if inner is None or len(comp) >= neblock:
                body += struct.pack("<i", neblock) + piece
            else:
                body += struct.pack("<i", len(comp)) + comp
    header = bytes([2, 1, flags, typesize]) + struct.pack(
        "<III", nbytes, blocksize, 16 + 4 * nblocks + len(body))
    return header + struct.pack(f"<{nblocks}i", *bstarts) + bytearray(
        body)


@pytest.mark.parametrize("split", [True, False])
@pytest.mark.parametrize("shuffle", [True, False])
def test_blosc_raw_splits(shuffle, split):
    rng = np.random.default_rng(2)
    arr = rng.normal(size=1000).astype("<f8")  # 8000 bytes
    frame = _blosc_encode(arr.tobytes(), typesize=8, blocksize=2048,
                          shuffle=shuffle, split=split)
    out = codecs.blosc_decompress(frame, expected_nbytes=8000)
    assert_array_equal(np.frombuffer(out, "<f8"), arr)


def test_blosc_leftover_block():
    rng = np.random.default_rng(3)
    arr = rng.integers(0, 255, size=5000, dtype=np.uint8)
    frame = _blosc_encode(arr.tobytes(), typesize=1, blocksize=2048)
    out = codecs.blosc_decompress(frame)
    assert out == arr.tobytes()


def test_blosc_zlib_inner():
    arr = np.arange(3000, dtype="<i4")  # compressible
    frame = _blosc_encode(arr.tobytes(), typesize=4, blocksize=4096,
                          codec_id=3, shuffle=True, split=False,
                          inner=zlib.compress)
    out = codecs.blosc_decompress(frame, expected_nbytes=12000)
    assert_array_equal(np.frombuffer(out, "<i4"), arr)


def test_blosc_memcpy():
    data = bytes(range(256))
    frame = (bytes([2, 1, 0x2, 1])
             + struct.pack("<III", 256, 256, 272) + data)
    assert codecs.blosc_decompress(frame) == data


def test_blosc_lz4_inner_split():
    """Frame with codec=lz4 where one split IS lz4-compressed (a run)
    and the rest are stored raw."""
    # 4-byte elements, values constant -> shuffled planes are runs
    arr = np.full(512, 7, dtype="<i4")
    data = arr.tobytes()

    def lz4c(piece):
        # all-equal bytes: 1 literal + overlapping match
        n = len(piece)
        if n < 20 or len(set(piece)) != 1:
            return piece  # "incompressible" -> stored raw
        ml = n - 1 - 4
        ext = []
        tok_ml = 15 if ml >= 15 else ml
        rem = ml - tok_ml
        while tok_ml == 15:
            ext.append(min(rem, 255))
            if rem < 255:
                break
            rem -= 255
        return (bytes([(1 << 4) | tok_ml]) + piece[:1]
                + struct.pack("<H", 1) + bytes(ext))

    frame = _blosc_encode(data, typesize=4, blocksize=1024,
                          codec_id=1, shuffle=True, split=True,
                          inner=lz4c)
    out = codecs.blosc_decompress(frame, expected_nbytes=len(data))
    assert_array_equal(np.frombuffer(out, "<i4"), arr)


# ------------------------------------------------- compressors/filters

@pytest.mark.parametrize("cid,comp", [
    ("zlib", zlib.compress),
    ("gzip", None),
    ("bz2", None),
    ("lzma", None),
    ("zstd", None),
])
def test_bare_compressors(cid, comp):
    import bz2 as _bz2
    import gzip as _gzip
    import lzma as _lzma
    data = np.arange(500, dtype="<f4").tobytes()
    if cid == "gzip":
        raw = _gzip.compress(data)
    elif cid == "bz2":
        raw = _bz2.compress(data)
    elif cid == "lzma":
        raw = _lzma.compress(data)
    elif cid == "zstd":
        zstd = pytest.importorskip("zstandard")
        raw = zstd.ZstdCompressor().compress(data)
    else:
        raw = comp(data)
    out = codecs.decompress_chunk(raw, {"id": cid}, nbytes=len(data))
    assert out == data


def test_filter_shuffle_delta():
    arr = np.arange(100, dtype="<i8")
    enc = np.diff(arr, prepend=arr[:1].astype("<i8") * 0)
    enc[0] = arr[0]
    buf = enc.astype("<i8").tobytes()
    # then shuffle elementsize 8
    b = np.frombuffer(buf, np.uint8).reshape(100, 8).T.reshape(-1)
    out = codecs.decode_filters(
        b.tobytes(),
        [{"id": "delta", "dtype": "<i8"}, {"id": "shuffle",
                                           "elementsize": 8}],
        np.dtype("<i8"))
    assert_array_equal(np.frombuffer(out, "<i8"), arr)


# ------------------------------------------- end-to-end store reading

def test_read_compressed_foreign_store(tmp_path):
    """A store written by reference-side tooling (zarr default-ish:
    blosc frames here built by the independent encoder; plus a
    zlib-compressed array) must read back through dstore."""
    path = tmp_path / "foreign.xds"
    g = path / "ds_0000"
    (path / ".zgroup").parent.mkdir(parents=True)
    (path / ".zgroup").write_text(json.dumps({"zarr_format": 2}))
    g.mkdir()
    (g / ".zgroup").write_text(json.dumps({"zarr_format": 2}))
    (g / ".zattrs").write_text(json.dumps({"freq_out": 1e9}))

    rng = np.random.default_rng(4)
    a = rng.normal(size=(8, 16)).astype("<f8")
    adir = g / "WEIGHT"
    adir.mkdir()
    (adir / ".zarray").write_text(json.dumps({
        "zarr_format": 2, "shape": [8, 16], "chunks": [8, 16],
        "dtype": "<f8", "order": "C", "fill_value": 0,
        "filters": None,
        "compressor": {"id": "blosc", "cname": "lz4", "clevel": 5,
                       "shuffle": 1, "blocksize": 0}}))
    (adir / ".zattrs").write_text(
        json.dumps({"_ARRAY_DIMENSIONS": ["x", "y"]}))
    (adir / "0.0").write_bytes(
        _blosc_encode(a.tobytes(), typesize=8, blocksize=1024))

    b = np.arange(24, dtype="<i4").reshape(4, 6)
    bdir = g / "FLAG"
    bdir.mkdir()
    (bdir / ".zarray").write_text(json.dumps({
        "zarr_format": 2, "shape": [4, 6], "chunks": [2, 6],
        "dtype": "<i4", "order": "C", "fill_value": 0,
        "filters": None, "compressor": {"id": "zlib", "level": 1}}))
    (bdir / ".zattrs").write_text(
        json.dumps({"_ARRAY_DIMENSIONS": ["x", "y"]}))
    for i in range(2):
        (bdir / f"{i}.0").write_bytes(
            zlib.compress(b[i * 2:(i + 1) * 2].tobytes()))

    dss = dstore.read_store(path)
    assert len(dss) == 1
    ds = dss[0]
    assert ds["freq_out"] == 1e9
    assert_array_equal(ds["WEIGHT"], a)
    assert_array_equal(ds["FLAG"], b)
