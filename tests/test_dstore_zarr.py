"""The dstore on-disk format must be genuine zarr v2 so reference-side
tooling (zarr.open / xarray.open_zarr) can read this build's xds/dds/
mds products (reference inter-worker ABI: pfb/workers/init.py:79-81,
grid.py:506-586). The zarr package is absent here, so these tests
decode the store with an INDEPENDENT minimal reader written straight
from the zarr v2 spec (JSON .zarray metadata + raw C-order chunk
files), never via pfb_tpu code."""

import json
from pathlib import Path

import numpy as np
import pytest
from numpy.testing import assert_array_equal

from pfb_tpu.utils import dstore


def _spec_read_array(adir):
    """Independent zarr-v2 array decode, straight from the spec."""
    meta = json.loads((adir / ".zarray").read_text())
    assert meta["zarr_format"] == 2
    assert meta["compressor"] is None
    assert meta["filters"] is None
    assert meta["order"] in ("C", "F")
    shape, chunks = meta["shape"], meta["chunks"]
    dt = np.dtype(meta["dtype"])
    out = np.zeros(shape, dtype=dt)
    if out.size == 0:
        return out
    grid = [-(-s // c) for s, c in zip(shape, chunks)] or [1]
    for idx in np.ndindex(*grid):
        key = ".".join(map(str, idx)) if shape else "0"
        raw = (adir / key).read_bytes()
        block = np.frombuffer(raw, dtype=dt).reshape(
            chunks, order=meta["order"])
        sl = tuple(slice(i * c, min((i + 1) * c, s))
                   for i, c, s in zip(idx, chunks, shape))
        out[sl] = block[tuple(slice(0, s.stop - s.start) for s in sl)]
    return out


def _example_dds():
    rng = np.random.default_rng(0)
    return [{
        "DIRTY": rng.normal(size=(16, 16)),
        "PSF": rng.normal(size=(32, 32)),
        "PSFHAT": (rng.normal(size=(32, 17))
                   + 1j * rng.normal(size=(32, 17))).astype(
                       np.complex128),
        "MASK": rng.integers(0, 2, size=(8, 4)).astype(np.uint8),
        "WSUM": np.array([1234.5]),
        "DUAL": rng.normal(size=(3, 20, 18)).astype(np.float32),
        "BEAM": np.ones((16, 16)),
        "bandid": b, "cell_rad": 1.2e-6, "niters": 0,
        "product": "I", "x0": 0.0,
    } for b in range(2)]


def test_store_is_valid_zarr_v2(tmp_path):
    path = tmp_path / "test_I_main.dds"
    dds = _example_dds()
    dstore.write_store(path, dds)

    # root + group metadata per spec
    root = json.loads((path / ".zgroup").read_text())
    assert root == {"zarr_format": 2}
    g0 = path / "ds_0000"
    assert json.loads((g0 / ".zgroup").read_text()) == {"zarr_format": 2}
    attrs = json.loads((g0 / ".zattrs").read_text())
    assert attrs["bandid"] == 0 and attrs["product"] == "I"

    # every array decodes identically via the independent spec reader
    for i, ds in enumerate(dds):
        gdir = path / f"ds_{i:04d}"
        for key, val in ds.items():
            if isinstance(val, np.ndarray):
                got = _spec_read_array(gdir / key)
                assert_array_equal(got, val)
                assert got.dtype == val.dtype
                # xarray convention present with reference dim names
                adims = json.loads(
                    (gdir / key / ".zattrs").read_text())
                assert "_ARRAY_DIMENSIONS" in adims
                assert len(adims["_ARRAY_DIMENSIONS"]) == val.ndim
    d = json.loads((path / "ds_0000" / "DIRTY" / ".zattrs").read_text())
    assert d["_ARRAY_DIMENSIONS"] == ["x", "y"]
    p = json.loads((path / "ds_0000" / "PSF" / ".zattrs").read_text())
    assert p["_ARRAY_DIMENSIONS"] == ["x_psf", "y_psf"]
    du = json.loads((path / "ds_0000" / "DUAL" / ".zattrs").read_text())
    assert du["_ARRAY_DIMENSIONS"] == ["c", "i", "j"]


def test_roundtrip_and_update(tmp_path):
    path = tmp_path / "t_I_main.dds"
    dds = _example_dds()
    dstore.write_store(path, dds)
    back = dstore.read_store(path)
    assert len(back) == 2
    for ds, b in zip(dds, back):
        for key, val in ds.items():
            if isinstance(val, np.ndarray):
                assert_array_equal(b[key], val)
            else:
                assert b[key] == val

    # checkpoint-style in-place update (spotless writeback contract)
    newm = np.full((16, 16), 3.0)
    dstore.update_ds(path, 1, arrays={"MODEL": newm},
                     attrs={"niters": 7})
    back = dstore.read_store(path)
    assert_array_equal(back[1]["MODEL"], newm)
    assert back[1]["niters"] == 7
    assert back[0].get("niters") == 0  # untouched
    # the new array is itself valid zarr
    assert_array_equal(
        _spec_read_array(path / "ds_0001" / "MODEL"), newm)


def test_dim_clash_degrades_gracefully(tmp_path):
    """BEAM at image resolution would clash 'l_beam' with nothing, but
    two same-dim arrays with different lengths must get de-clashed dims
    (xarray refuses one dim with two sizes)."""
    path = tmp_path / "clash.dds"
    ds = {"DIRTY": np.zeros((8, 8)), "MODEL": np.zeros((4, 4))}
    dstore.write_store(path, [ds])
    dd = json.loads(
        (path / "ds_0000" / "DIRTY" / ".zattrs").read_text())
    md = json.loads(
        (path / "ds_0000" / "MODEL" / ".zattrs").read_text())
    assert dd["_ARRAY_DIMENSIONS"] == ["x", "y"]
    assert md["_ARRAY_DIMENSIONS"] != ["x", "y"]
    back = dstore.read_store(path)
    assert back[0]["MODEL"].shape == (4, 4)


def test_legacy_npy_store_still_readable(tmp_path):
    path = tmp_path / "old.dds"
    d0 = path / "ds_0000"
    d0.mkdir(parents=True)
    arr = np.arange(12.0).reshape(3, 4)
    np.save(d0 / "DIRTY.npy", arr)
    (d0 / "attrs.json").write_text(json.dumps({"bandid": 3}))
    back = dstore.read_store(path)
    assert back[0]["bandid"] == 3
    assert_array_equal(back[0]["DIRTY"], arr)
    # legacy update keeps the legacy layout
    dstore.update_ds(path, 0, arrays={"DIRTY": arr * 2},
                     attrs={"niters": 1})
    back = dstore.read_store(path)
    assert_array_equal(back[0]["DIRTY"], arr * 2)
    assert back[0]["niters"] == 1


def test_multichunk_foreign_zarr_readable(tmp_path):
    """A store written by SOMEONE ELSE with multiple chunks and partial
    edge chunks must read back correctly (interop is two-way)."""
    path = tmp_path / "foreign.dds"
    g = path / "ds_0000"
    a = g / "A"
    a.mkdir(parents=True)
    (path / ".zgroup").write_text(json.dumps({"zarr_format": 2}))
    (g / ".zgroup").write_text(json.dumps({"zarr_format": 2}))
    (g / ".zattrs").write_text(json.dumps({"tag": "x"}))
    arr = np.arange(35, dtype="<f4").reshape(5, 7)
    meta = {"zarr_format": 2, "shape": [5, 7], "chunks": [2, 3],
            "dtype": "<f4", "compressor": None, "fill_value": 0,
            "order": "C", "filters": None}
    (a / ".zarray").write_text(json.dumps(meta))
    (a / ".zattrs").write_text(
        json.dumps({"_ARRAY_DIMENSIONS": ["p", "q"]}))
    for i in range(3):
        for j in range(3):
            blk = np.zeros((2, 3), dtype="<f4")
            sl = arr[i * 2:(i + 1) * 2, j * 3:(j + 1) * 3]
            blk[:sl.shape[0], :sl.shape[1]] = sl
            (a / f"{i}.{j}").write_bytes(blk.tobytes())
    back = dstore.read_store(path)
    assert back[0]["tag"] == "x"
    assert_array_equal(back[0]["A"], arr)
