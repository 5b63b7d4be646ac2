"""Lightweight dataset stores.

The reference persists its inter-worker products as zarr stores of
xarray datasets (xds/dds/mds/fds — SURVEY.md section 1 "storage
formats"). zarr/xarray are unavailable here, so the same contract is
implemented as plain directories:

    <basename>.xds/           (or .dds, .mds, .fds)
        ds_0000/
            attrs.json        scalar attrs (bandid, cell_rad, ...)
            VIS.npy           one .npy per field
            WEIGHT.npy
            ...
        ds_0001/ ...

Field names and attrs are the reference's (VIS/WEIGHT/MASK/UVW/FREQ/
DIRTY/PSF/PSFHAT/WSUM/MODEL/DUAL/RESIDUAL/BEAM + bandid/timeid/
cell_rad/x0/y0/freq_out/time_out/niters/...), so the on-disk layout maps
1:1 onto the reference's store schema (reference:
pfb/utils/stokes2vis.py:235-280, pfb/workers/grid.py:381-586).

A dataset in memory is just ``dict`` with numpy arrays + attrs merged
(attrs under plain keys; complex arrays stored natively by .npy).
"""

import json
import os
import shutil
from pathlib import Path

import numpy as np

_ATTRS = "attrs.json"


def _json_default(o):
    if isinstance(o, (np.integer,)):
        return int(o)
    if isinstance(o, (np.floating,)):
        return float(o)
    if isinstance(o, np.ndarray):
        return o.tolist()
    if isinstance(o, (np.bool_,)):
        return bool(o)
    raise TypeError(f"not serialisable: {type(o)}")


def write_store(path, datasets, overwrite=True):
    """Write a list of dataset dicts to ``path``. Arrays (ndim >= 1) go
    to .npy; scalars/strings/lists into attrs.json."""
    path = Path(path)
    if path.exists():
        if overwrite:
            shutil.rmtree(path)
        else:
            raise FileExistsError(path)
    path.mkdir(parents=True)
    for i, ds in enumerate(datasets):
        write_ds(path, i, ds)


def write_ds(path, index, ds):
    dpath = Path(path) / f"ds_{index:04d}"
    dpath.mkdir(parents=True, exist_ok=True)
    attrs = {}
    for key, val in ds.items():
        arr = np.asarray(val) if not np.isscalar(val) and \
            not isinstance(val, (str, list, tuple, dict, type(None))) \
            else None
        if arr is not None and arr.ndim >= 1:
            np.save(dpath / f"{key}.npy", arr)
        else:
            attrs[key] = val
    with open(dpath / _ATTRS, "w") as f:
        json.dump(attrs, f, default=_json_default)


def update_ds(path, index, arrays=None, attrs=None):
    """In-place update of selected fields/attrs of one dataset — the
    writeback contract the deconvolvers rely on for checkpoint/resume
    (reference: workers/spotless.py:374-394, klean.py:355-374)."""
    dpath = Path(path) / f"ds_{index:04d}"
    if arrays:
        for key, val in arrays.items():
            np.save(dpath / f"{key}.npy", np.asarray(val))
    if attrs:
        with open(dpath / _ATTRS) as f:
            cur = json.load(f)
        cur.update(attrs)
        with open(dpath / _ATTRS, "w") as f:
            json.dump(cur, f, default=_json_default)


def read_store(path):
    """Read all datasets of a store back as a list of dicts."""
    path = Path(path)
    if not path.is_dir():
        raise FileNotFoundError(path)
    out = []
    for dpath in sorted(path.glob("ds_*")):
        ds = {}
        with open(dpath / _ATTRS) as f:
            ds.update(json.load(f))
        for npy in sorted(dpath.glob("*.npy")):
            ds[npy.stem] = np.load(npy)
        out.append(ds)
    return out


def store_exists(path):
    return Path(path).is_dir()


def remove_store(path):
    if Path(path).exists():
        shutil.rmtree(path)
