"""Property-style tests of init's (FIELD, DDID, SCAN) mapping against
the reference construct_mappings semantics
(/root/reference/pfb/utils/misc.py:250-487) on synthetic multi-spw /
multi-field / irregular-scan layouts via DictMSSource (VERDICT r3
item 8).

The trick: visibilities are FINGERPRINTED (vis = row + 1j*chan, both
correlations equal, unit weights, unity gains) so every output
dataset's VIS reveals exactly which (row, chan) cells it came from.
The properties then assert the mapping invariants the reference
guarantees:

P1  partition — every selected (row, chan) cell lands in EXACTLY one
    dataset; nothing is duplicated, nothing dropped;
P2  group purity — all rows in a dataset share its
    (fieldid, ddid, scanid);
P3  time chunking — <= integrations-per-image unique times per chunk,
    chunks are consecutive runs of the group's sorted unique times and
    cover them;
P4  channel chunking — each dataset's FREQ is a contiguous slice of
    ITS spw's freq_range-filtered channels, of size
    channels-per-image (last chunk smaller);
P5  multi-spw — the dataset's frequencies come from the FREQ table row
    of its own DATA_DESC_ID.
"""

import numpy as np
import pytest
from numpy.testing import assert_allclose

from pfb_tpu.workers.init import _init

pmp = pytest.mark.parametrize


def _make_ms(rng, nrow=400, nchan=6, nspw=2, nfield=2, scan_ids=(2, 5, 9),
             irregular=True):
    """Synthetic multi-spw, multi-field, irregular-scan column dict.

    Rows are SHUFFLED (not sorted by group or time) — the reference
    handles arbitrary row order through its TIME/group indexing."""
    nant = 7
    # irregular time grid: unequal gaps
    ntimes = 40
    tgrid = 5e9 + np.cumsum(rng.uniform(1.0, 20.0, size=ntimes))
    time = rng.choice(tgrid, size=nrow)
    fid = rng.integers(0, nfield, size=nrow).astype(np.int32)
    did = rng.integers(0, nspw, size=nrow).astype(np.int32)
    sid = np.asarray(scan_ids)[
        rng.integers(0, len(scan_ids), size=nrow)].astype(np.int32)
    if not irregular:
        order = np.lexsort((time, sid, did, fid))
        time, fid, did, sid = (a[order] for a in
                               (time, fid, did, sid))
    a1 = rng.integers(0, nant - 1, size=nrow).astype(np.int32)
    a2 = (a1 + 1 + rng.integers(0, nant - 1 - a1)).astype(np.int32)
    uvw = rng.normal(scale=300.0, size=(nrow, 3))
    freq = np.stack([np.linspace(1.0e9 + s * 0.3e9,
                                 1.2e9 + s * 0.3e9, nchan)
                     for s in range(nspw)])
    # fingerprint: vis[r, c] = (r+1) + i(c+1) on both correlations
    fp = ((np.arange(nrow)[:, None] + 1)
          + 1j * (np.arange(nchan)[None, :] + 1))
    data = np.stack([fp, fp], axis=-1).astype(np.complex128)
    return dict(
        TIME=time, ANTENNA1=a1, ANTENNA2=a2, UVW=uvw, FREQ=freq,
        FIELD_ID=fid, DATA_DESC_ID=did, SCAN_NUMBER=sid,
        FIELD_RA=np.linspace(0.1, 0.2, nfield),
        FIELD_DEC=np.linspace(-0.6, -0.5, nfield),
        DATA=data, FLAG=np.zeros((nrow, nchan, 2), bool),
        WEIGHT_SPECTRUM=np.ones((nrow, nchan, 2)), POLTYPE="linear")


def _cells(ds):
    """Recover the (row, chan) cells of a dataset from the
    fingerprints. VIS_I = (XX+YY)/2 = fingerprint exactly."""
    vis = np.asarray(ds["VIS"])
    rows = np.rint(vis.real).astype(int) - 1
    chans = np.rint(vis.imag).astype(int) - 1
    m = np.asarray(ds["MASK"]).astype(bool)
    return {(int(r), int(c))
            for r, c in zip(rows[m].ravel(), chans[m].ravel())}


@pmp("ipi,cpi", [(-1, -1), (7, 3), (4, 4), (1, 2)])
def test_mapping_partition_properties(ipi, cpi):
    rng = np.random.default_rng(5)
    ms = _make_ms(rng)
    nrow, nchan = ms["DATA"].shape[:2]
    xds = _init(ms=ms, integrations_per_image=ipi,
                channels_per_image=cpi, write=False)

    # P1: exact partition of all (row, chan) cells
    seen = set()
    for ds in xds:
        cells = _cells(ds)
        assert not (cells & seen), "duplicated cells across datasets"
        seen |= cells
    assert seen == {(r, c) for r in range(nrow)
                    for c in range(nchan)}

    for ds in xds:
        cells = _cells(ds)
        rows = {r for r, _ in cells}
        # P2: group purity
        assert all(ms["FIELD_ID"][r] == ds["fieldid"] for r in rows)
        assert all(ms["DATA_DESC_ID"][r] == ds["ddid"] for r in rows)
        assert all(ms["SCAN_NUMBER"][r] == ds["scanid"] for r in rows)
        # P3: time chunk size + consecutiveness on the group grid
        times = np.unique(ms["TIME"][sorted(rows)])
        eff_ipi = times.size if ipi in (-1, 0, None) else ipi
        assert times.size <= eff_ipi
        gsel = ((ms["FIELD_ID"] == ds["fieldid"])
                & (ms["DATA_DESC_ID"] == ds["ddid"])
                & (ms["SCAN_NUMBER"] == ds["scanid"]))
        gtimes = np.unique(ms["TIME"][gsel])
        i0 = np.searchsorted(gtimes, times[0])
        assert_allclose(gtimes[i0:i0 + times.size], times)
        # P4/P5: channel chunk from THIS spw's table, contiguous
        f = np.asarray(ds["FREQ"])
        spw = ms["FREQ"][ds["ddid"]]
        j0 = np.searchsorted(spw, f[0])
        assert_allclose(spw[j0:j0 + f.size], f)
        eff_cpi = nchan if cpi in (-1, 0, None) else cpi
        assert f.size <= eff_cpi
        assert f.size == eff_cpi or j0 + f.size == spw.size

    # P3 cover: each group's datasets jointly cover its unique times
    for ds in xds:
        pass  # covered by P1 partition


def test_mapping_freq_range_multi_spw():
    """freq_range filters per spw: a range inside spw-1 only must drop
    spw-0 datasets entirely (reference misc.py:301-311)."""
    rng = np.random.default_rng(6)
    ms = _make_ms(rng, nspw=2)
    lo, hi = ms["FREQ"][1][1], ms["FREQ"][1][4]
    xds = _init(ms=ms, write=False, freq_range=f"{lo}:{hi}")
    assert xds, "range intersects spw 1"
    for ds in xds:
        assert ds["ddid"] == 1
        f = np.asarray(ds["FREQ"])
        assert f.min() >= lo and f.max() <= hi
        # P1 restricted: only spw-1 channels in range appear
        spw = ms["FREQ"][1]
        chans = {c for _, c in _cells(ds)}
        want = set(np.where((spw >= lo) & (spw <= hi))[0])
        assert chans <= want


def test_mapping_row_order_invariance():
    """The mapping must not depend on row order: shuffled vs sorted
    layouts give identical dataset partitions (reference indexes by
    TIME/group, never by row position)."""
    rng = np.random.default_rng(7)
    ms_a = _make_ms(rng, irregular=True)
    # build the sorted twin with the same content
    order = np.lexsort((ms_a["TIME"], ms_a["SCAN_NUMBER"],
                        ms_a["DATA_DESC_ID"], ms_a["FIELD_ID"]))
    ms_b = dict(ms_a)
    for k in ("TIME", "ANTENNA1", "ANTENNA2", "UVW", "FIELD_ID",
              "DATA_DESC_ID", "SCAN_NUMBER", "DATA", "FLAG",
              "WEIGHT_SPECTRUM"):
        ms_b[k] = np.asarray(ms_a[k])[order]

    xa = _init(ms=ms_a, integrations_per_image=6,
               channels_per_image=3, write=False)
    xb = _init(ms=ms_b, integrations_per_image=6,
               channels_per_image=3, write=False)
    assert len(xa) == len(xb)

    def key(ds):
        return (ds["fieldid"], ds["ddid"], ds["scanid"],
                ds["time_min"], float(np.asarray(ds["FREQ"])[0]))

    fa = {key(ds): _cells(ds) for ds in xa}
    # the fingerprints travel WITH the permuted DATA, so _cells already
    # returns original row ids for both layouts
    fb = {key(ds): _cells(ds) for ds in xb}
    assert fa.keys() == fb.keys()
    for k in fa:
        assert fa[k] == fb[k], f"partition differs for {k}"


def test_mapping_flagged_cells_masked():
    """Flagged correlations zero the output weight/mask but never move
    cells between datasets."""
    rng = np.random.default_rng(8)
    ms = _make_ms(rng)
    nrow, nchan = ms["DATA"].shape[:2]
    flag = np.zeros((nrow, nchan, 2), bool)
    flag[10] = True           # whole row
    flag[:, 2, :] = True      # whole channel
    ms["FLAG"] = flag
    xds = _init(ms=ms, integrations_per_image=7,
                channels_per_image=3, write=False)
    seen = set()
    for ds in xds:
        seen |= _cells(ds)
    want = {(r, c) for r in range(nrow) for c in range(nchan)
            if not flag[r, c, 0]}
    assert seen == want
