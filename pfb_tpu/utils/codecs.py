"""Pure-python zarr v2 chunk codecs for reading reference-produced
stores.

The reference writes its xds stores with daskms ``xds_to_zarr``
(/root/reference/pfb/workers/init.py:79-81), which uses zarr's default
compressor — numcodecs ``Blosc(cname='lz4', clevel=5, shuffle=SHUFFLE)``
— so reference outputs are blosc frames with an lz4 inner codec and
byte shuffle.  Neither ``zarr``/``numcodecs`` nor the blosc/lz4 C
libraries ship in this image, so this module decodes the formats
directly:

* blosc1 frames (16-byte header, per-block split streams) with inner
  codecs blosclz, lz4/lz4hc, zlib and zstd, byte- and bit-shuffle;
* bare numcodecs compressors: zlib, gzip, bz2, lzma, zstd;
* numcodecs filters: shuffle, delta.

Decode-only (pfb_tpu writes uncompressed stores, which zarr reads
fine); speed is irrelevant next to the one-time ingest cost.
"""

import bz2
import lzma
import struct
import zlib

import numpy as np

try:  # optional, present in this image
    import zstandard as _zstd
except ImportError:  # pragma: no cover
    _zstd = None

# blosc header flag bits / codec ids (c-blosc 1.x blosc.h)
_BLOSC_DOSHUFFLE = 0x1
_BLOSC_MEMCPYED = 0x2
_BLOSC_DOBITSHUFFLE = 0x4
_BLOSC_DONT_SPLIT = 0x10
_BLOSC_CODECS = {0: "blosclz", 1: "lz4", 2: "snappy", 3: "zlib",
                 4: "zstd"}
_MAX_SPLITS = 16
_MIN_BUFFERSIZE = 128
_MAX_DISTANCE = 8191


def lz4_block_decompress(src, dst_size):
    """LZ4 block-format decoder (lz4_Block_format.md)."""
    src = bytes(src)
    dst = bytearray()
    i, n = 0, len(src)
    while i < n:
        token = src[i]
        i += 1
        lit = token >> 4
        if lit == 15:
            while True:
                b = src[i]
                i += 1
                lit += b
                if b != 255:
                    break
        dst += src[i:i + lit]
        i += lit
        if i >= n:  # last sequence: literals only
            break
        ofs = src[i] | (src[i + 1] << 8)
        i += 2
        if ofs == 0:
            raise ValueError("lz4: zero match offset")
        ml = token & 15
        if ml == 15:
            while True:
                b = src[i]
                i += 1
                ml += b
                if b != 255:
                    break
        ml += 4
        start = len(dst) - ofs
        if start < 0:
            raise ValueError("lz4: match before start")
        if ofs >= ml:
            dst += dst[start:start + ml]
        else:  # overlapping copy: byte-serial semantics
            for k in range(ml):
                dst.append(dst[start + k])
    if len(dst) != dst_size:
        raise ValueError(
            f"lz4: decoded {len(dst)} bytes, expected {dst_size}")
    return bytes(dst)


def blosclz_decompress(src, dst_size):
    """blosclz (fastlz-derived) decoder — works for versionlz 1 & 2
    streams (the format is decode-compatible across blosclz versions;
    only the encoder's hashing changed)."""
    src = bytes(src)
    n = len(src)
    dst = bytearray()
    if n == 0:
        return bytes(dst)
    ip = 0
    ctrl = src[ip] & 31
    ip += 1
    loop = True
    while loop:
        if ctrl >= 32:
            mlen = (ctrl >> 5) - 1
            ofs = (ctrl & 31) << 8
            ref = len(dst) - ofs
            if mlen == 7 - 1:
                while True:
                    code = src[ip]
                    ip += 1
                    mlen += code
                    if code != 255:
                        break
            code = src[ip]
            ip += 1
            ref -= code
            if code == 255 and ofs == (31 << 8):
                ofs = (src[ip] << 8) + src[ip + 1]
                ip += 2
                ref = len(dst) - ofs - _MAX_DISTANCE
            if ip < n:
                ctrl = src[ip]
                ip += 1
            else:
                loop = False
            mlen += 3
            if ref == len(dst):  # run of the previous byte
                dst += bytes([dst[-1]]) * mlen
            else:
                ref -= 1
                if ref < 0:
                    raise ValueError("blosclz: match before start")
                if len(dst) - ref >= mlen:
                    dst += dst[ref:ref + mlen]
                else:
                    for k in range(mlen):
                        dst.append(dst[ref + k])
        else:
            ctrl += 1
            dst += src[ip:ip + ctrl]
            ip += ctrl
            loop = ip < n
            if loop:
                ctrl = src[ip]
                ip += 1
    if len(dst) != dst_size:
        raise ValueError(
            f"blosclz: decoded {len(dst)} bytes, expected {dst_size}")
    return bytes(dst)


def _zstd_decompress(src, dst_size):
    if _zstd is None:  # pragma: no cover
        raise NotImplementedError("zstd chunk but zstandard missing")
    return _zstd.ZstdDecompressor().decompress(
        bytes(src), max_output_size=dst_size)


_INNER = {
    "blosclz": blosclz_decompress,
    "lz4": lz4_block_decompress,
    "zlib": lambda s, n: zlib.decompress(bytes(s)),
    "zstd": _zstd_decompress,
}


def byte_unshuffle(buf, typesize):
    """Undo blosc byte shuffle on one block. Trailing
    ``len(buf) % typesize`` bytes are stored unshuffled (c-blosc
    shuffle-generic.h semantics)."""
    buf = np.frombuffer(buf, dtype=np.uint8)
    nel = buf.size // typesize
    body = buf[:nel * typesize].reshape(typesize, nel).T.reshape(-1)
    return np.concatenate([body, buf[nel * typesize:]]).tobytes()


def bit_unshuffle(buf, typesize):
    """Undo blosc bit shuffle on one block (bshuf semantics: elements
    processed in multiples of 8; the remainder is stored as-is)."""
    buf = np.frombuffer(buf, dtype=np.uint8)
    nel = buf.size // typesize
    nproc = nel - nel % 8
    nb = nproc * typesize
    if nproc:
        bits = np.unpackbits(
            buf[:nb].reshape(typesize * 8, nproc // 8), axis=-1,
            bitorder="little")
        # bits[b, e]: bit b of element e -> repack per element
        body = np.packbits(
            bits.T.reshape(nproc, typesize * 8), axis=-1,
            bitorder="little").reshape(-1)
    else:
        body = buf[:0]
    return np.concatenate([body, buf[nb:]]).tobytes()


def blosc_decompress(raw, expected_nbytes=None):
    """Decode one c-blosc 1.x frame (the numcodecs Blosc chunk
    format): 16-byte header, optional per-block split streams, inner
    codec per the flags byte, then per-block shuffle undo."""
    raw = bytes(raw)
    if len(raw) < 16:
        raise ValueError("blosc: truncated header")
    version, versionlz, flags, typesize = raw[0], raw[1], raw[2], raw[3]
    nbytes, blocksize, cbytes = struct.unpack_from("<III", raw, 4)
    if expected_nbytes is not None and nbytes != expected_nbytes:
        raise ValueError(
            f"blosc: frame nbytes {nbytes} != expected "
            f"{expected_nbytes}")
    if flags & _BLOSC_MEMCPYED:
        return raw[16:16 + nbytes]
    codec = _BLOSC_CODECS.get((flags >> 5) & 0x7)
    if codec not in _INNER:
        raise NotImplementedError(f"blosc inner codec {codec!r}")
    inner = _INNER[codec]
    dont_split = bool(flags & _BLOSC_DONT_SPLIT)
    nblocks = -(-nbytes // blocksize) if blocksize else 0
    leftover = nbytes % blocksize if blocksize else 0
    bstarts = struct.unpack_from(f"<{nblocks}i", raw, 16)
    out = bytearray()
    for j in range(nblocks):
        last = j == nblocks - 1
        bsize = leftover if (last and leftover) else blocksize
        split = (typesize <= _MAX_SPLITS and typesize > 1
                 and blocksize // typesize >= _MIN_BUFFERSIZE
                 and not (last and leftover) and not dont_split)
        nsplits = typesize if split else 1
        neblock = bsize // nsplits
        sw = bstarts[j]
        block = bytearray()
        for _s in range(nsplits):
            (sb,) = struct.unpack_from("<i", raw, sw)
            sw += 4
            if sb == neblock:  # stored raw
                block += raw[sw:sw + neblock]
            else:
                block += inner(raw[sw:sw + sb], neblock)
            sw += sb
        if flags & _BLOSC_DOSHUFFLE and typesize > 1:
            block = byte_unshuffle(bytes(block), typesize)
        elif flags & _BLOSC_DOBITSHUFFLE:
            block = bit_unshuffle(bytes(block), typesize)
        out += block
    if len(out) != nbytes:
        raise ValueError(
            f"blosc: decoded {len(out)} bytes, expected {nbytes}")
    return bytes(out)


def decompress_chunk(raw, compressor, nbytes=None):
    """Apply the zarr v2 ``compressor`` config (a numcodecs config
    dict or None) to one raw chunk."""
    if compressor is None:
        return bytes(raw)
    cid = compressor.get("id")
    if cid == "blosc":
        return blosc_decompress(raw, expected_nbytes=nbytes)
    if cid in ("zlib", "gzip"):
        # numcodecs GZip uses the gzip container; Zlib the raw zlib
        # stream — zlib.decompress with wbits=47 accepts both.
        return zlib.decompress(bytes(raw), 47)
    if cid == "bz2":
        return bz2.decompress(bytes(raw))
    if cid == "lzma":
        return lzma.decompress(bytes(raw))
    if cid == "zstd":
        if nbytes is None:
            if _zstd is None:
                raise NotImplementedError("zstd without zstandard")
            return _zstd.ZstdDecompressor().decompress(bytes(raw))
        return _zstd_decompress(raw, nbytes)
    if cid == "lz4":
        # numcodecs LZ4 prefixes the block with the uint32 size
        (n,) = struct.unpack_from("<I", bytes(raw), 0)
        return lz4_block_decompress(bytes(raw)[4:], n)
    raise NotImplementedError(f"zarr compressor {cid!r}")


def decode_filters(buf, filters, dtype):
    """Undo a zarr v2 ``filters`` chain (applied last-to-first on
    read). Supports numcodecs ``shuffle`` and ``delta``."""
    for f in reversed(filters or []):
        fid = f.get("id")
        if fid == "shuffle":
            es = int(f.get("elementsize", dtype.itemsize))
            buf = byte_unshuffle(buf, es) if es > 1 else buf
        elif fid == "delta":
            dt = np.dtype(f.get("dtype", dtype.str))
            arr = np.frombuffer(buf, dtype=dt)
            buf = np.cumsum(
                arr, dtype=np.dtype(f.get("astype", dt.str))).tobytes()
        else:
            raise NotImplementedError(f"zarr filter {fid!r}")
    return buf
