"""Multi-MS ingestion and slab-streamed CASA reading.

The CASA branch is exercised through a mocked ``casacore.tables.table``
backed by an npz observation, so the slab logic (consecutive-run
getcol(startrow, nrow) reads, bounded memory) is tested even though
python-casacore is absent from the image (the reference streams via
dask-ms, /root/reference/pfb/utils/misc.py:250-370)."""

import sys
import types

import numpy as np
import pytest

from pfb_tpu.utils.ms import simulate_ms
from pfb_tpu.workers.init import _init


def test_init_ms_list(tmp_path):
    """_init over a LIST of MSs == concatenation of per-MS runs
    (reference scans many MSs, workers/init.py:236)."""
    ms1 = str(tmp_path / "a.npz")
    ms2 = str(tmp_path / "b.npz")
    simulate_ms(ms1, nant=5, ntime=3, nchan=2, nsource=2, fov_deg=0.2,
                seed=1)
    simulate_ms(ms2, nant=5, ntime=4, nchan=2, nsource=2, fov_deg=0.2,
                seed=2)
    both = _init(ms=[ms1, ms2], write=False, channels_per_image=1)
    one = _init(ms=ms1, write=False, channels_per_image=1)
    two = _init(ms=ms2, write=False, channels_per_image=1)
    assert len(both) == len(one) + len(two)
    for got, ref in zip(both, one + two):
        np.testing.assert_array_equal(got["VIS"], ref["VIS"])
        np.testing.assert_array_equal(got["UVW"], ref["UVW"])

    # comma-separated path string (the CLI form)
    both2 = _init(ms=f"{ms1},{ms2}", write=False,
                  channels_per_image=1)
    assert len(both2) == len(both)
    for got, ref in zip(both2, both):
        np.testing.assert_array_equal(got["VIS"], ref["VIS"])


class _FakeTable:
    """Mock of casacore.tables.table over an npz column dict. Records
    every (col, nrow) main-table read so tests can assert slab
    boundedness."""

    reads = []

    def __init__(self, path, ack=False):
        base, _, sub = str(path).partition("::")
        self.sub = sub
        with np.load(base + "/cols.npz", allow_pickle=False) as f:
            cols = {k: f[k] for k in f.files}
        if not sub:
            self.cols = {k: v for k, v in cols.items()
                         if k in ("DATA", "UVW", "TIME", "ANTENNA1",
                                  "ANTENNA2", "FLAG",
                                  "WEIGHT_SPECTRUM", "FIELD_ID",
                                  "DATA_DESC_ID", "SCAN_NUMBER")}
        elif sub == "DATA_DESCRIPTION":
            self.cols = {"SPECTRAL_WINDOW_ID": np.array([0]),
                         "POLARIZATION_ID": np.array([0])}
        elif sub == "SPECTRAL_WINDOW":
            self.cols = {"CHAN_FREQ": cols["FREQ"][None]}
        elif sub == "FIELD":
            self.cols = {"PHASE_DIR": np.array(
                [[[float(cols["RA"]), float(cols["DEC"])]]])}
        elif sub == "POLARIZATION":
            corr = [9, 12] if str(cols["POLTYPE"]) == "linear" \
                else [5, 8]
            self.cols = {"CORR_TYPE": np.array([corr])}
        else:
            raise RuntimeError(f"unknown subtable {sub}")

    def __enter__(self):
        return self

    def __exit__(self, *a):
        return False

    def colnames(self):
        return list(self.cols)

    def nrows(self):
        return len(next(iter(self.cols.values())))

    def getcol(self, col, startrow=0, nrow=-1):
        v = self.cols[col]
        if nrow == -1:
            nrow = len(v) - startrow
        if not self.sub:
            _FakeTable.reads.append((col, nrow))
        return v[startrow:startrow + nrow]


@pytest.fixture
def fake_casacore(monkeypatch):
    mod = types.ModuleType("casacore")
    tables = types.ModuleType("casacore.tables")
    tables.table = _FakeTable
    mod.tables = tables
    monkeypatch.setitem(sys.modules, "casacore", mod)
    monkeypatch.setitem(sys.modules, "casacore.tables", tables)
    _FakeTable.reads = []
    return _FakeTable


def _make_casa_dir(tmp_path, **sim_kw):
    npz = str(tmp_path / "obs.npz")
    out = simulate_ms(npz, **sim_kw)
    msdir = tmp_path / "obs.ms"
    msdir.mkdir()
    with np.load(npz, allow_pickle=False) as f:
        np.savez(msdir / "cols.npz", **{k: f[k] for k in f.files})
    return npz, str(msdir), out


def test_casa_source_matches_npz(tmp_path, fake_casacore):
    """init through the (mocked) CASA table == init from the npz."""
    npz, msdir, _ = _make_casa_dir(tmp_path, nant=5, ntime=4, nchan=3,
                                   nsource=2, fov_deg=0.2, seed=5)
    ref = _init(ms=npz, write=False, channels_per_image=1)
    got = _init(ms=msdir, write=False, channels_per_image=1)
    assert len(got) == len(ref)
    for g, r in zip(got, ref):
        np.testing.assert_allclose(g["VIS"], r["VIS"], atol=0)
        np.testing.assert_allclose(g["WEIGHT"], r["WEIGHT"], atol=0)
        np.testing.assert_array_equal(g["UVW"], r["UVW"])


def test_casa_source_reads_are_slabbed(tmp_path, fake_casacore):
    """No whole-table DATA reads: with integrations_per_image splitting
    the groups, every big-column getcol covers at most one time-chunk
    of rows (bounded memory on an out-of-core MS)."""
    from pfb_tpu.utils.ms import CasaMSSource
    npz, msdir, _ = _make_casa_dir(tmp_path, nant=6, ntime=8, nchan=2,
                                   nsource=2, fov_deg=0.2, seed=6)
    _FakeTable.reads = []
    _init(ms=msdir, write=False, channels_per_image=1,
          integrations_per_image=2)
    nrow_total = 6 * 5 // 2 * 8
    big = [(c, n) for c, n in _FakeTable.reads
           if c in ("DATA", "FLAG", "WEIGHT_SPECTRUM", "UVW")]
    assert big, "no slab reads recorded"
    chunk_rows = 6 * 5 // 2 * 2  # nbl x ipi
    assert max(n for _, n in big) <= chunk_rows
    # the slab cap splits even consecutive runs
    src = CasaMSSource(msdir, max_slab_rows=7)
    out = src.read_rows(np.arange(20), ("DATA",))
    assert out["DATA"].shape[0] == 20
    reads = [n for c, n in _FakeTable.reads[-3:] if c == "DATA"]
    assert max(reads) <= 7


def test_casa_gate_message_without_casacore(tmp_path):
    """Without casacore (and without the mock), a directory path
    raises the guidance ImportError."""
    assert "casacore" not in sys.modules or not hasattr(
        sys.modules.get("casacore", None), "tables")
    d = tmp_path / "x.ms"
    d.mkdir()
    from pfb_tpu.utils.ms import read_ms
    with pytest.raises(ImportError, match="python-casacore"):
        read_ms(str(d))
