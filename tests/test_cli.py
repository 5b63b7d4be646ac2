"""CLI end-to-end: the pfb-tpu click commands drive the worker pipeline
on a simulated MS (the reference's console-script layer,
pfb/workers/main.py)."""

import glob

import numpy as np
from click.testing import CliRunner

from pfb_tpu.utils.ms import simulate_ms
from pfb_tpu.workers.main import cli


def test_cli_init_grid_klean_restore(tmp_path):
    ms_path = str(tmp_path / "obs.npz")
    simulate_ms(ms_path, nant=7, ntime=4, nchan=2, nsource=2,
                fov_deg=0.3, seed=17)
    out = str(tmp_path / "out")
    runner = CliRunner()

    r = runner.invoke(cli, ["init", "-ms", ms_path, "-o", out,
                            "--channels-per-image", "1"])
    assert r.exit_code == 0, r.output
    assert glob.glob(out + "_I.xds/ds_*")

    r = runner.invoke(cli, ["grid", "-o", out, "-fov", "0.3",
                            "-rob", "0.0"])
    assert r.exit_code == 0, r.output
    assert glob.glob(out + "_I_main.dds/ds_*")

    r = runner.invoke(cli, ["klean", "-o", out, "-niter", "2",
                            "--threshold", "1e-4", "--gamma", "0.1",
                            "--peak-factor", "0.75", "--no-mop-flux"])
    assert r.exit_code == 0, r.output

    r = runner.invoke(cli, ["restore", "-o", out, "--outputs", "mr"])
    assert r.exit_code == 0, r.output
    assert glob.glob(str(tmp_path / "*model_mfs.fits"))


def test_cli_help_lists_all_workers():
    runner = CliRunner()
    r = runner.invoke(cli, ["--help"])
    for w in ("init", "grid", "klean", "spotless", "model2comps",
              "degrid", "restore", "fluxmop", "fastim", "smoovie",
              "fwdbwd"):
        assert w in r.output


def test_pipeline_recipe(tmp_path):
    from pfb_tpu.workers.pipeline import load_recipe, run_recipe
    ms_path = str(tmp_path / "obs.npz")
    simulate_ms(ms_path, nant=7, ntime=4, nchan=2, nsource=2,
                fov_deg=0.3, seed=23)
    out = str(tmp_path / "out")
    recipe = tmp_path / "recipe.yaml"
    recipe.write_text(f"""
steps:
  - worker: init
    params: {{ms: {ms_path}, output-filename: {out},
             channels-per-image: 1}}
  - worker: grid
    params: {{output-filename: {out}, field-of-view: 0.3,
             robustness: 0.0}}
  - worker: klean
    params: {{output-filename: {out}, niter: 2, threshold: 1.0e-4,
             gamma: 0.1, peak-factor: 0.75, mop-flux: false}}
""")
    run_recipe(str(recipe), verbose=0)
    assert glob.glob(out + "_I_main.dds/ds_*")

    bad = tmp_path / "bad.yaml"
    bad.write_text("steps:\n  - worker: nosuch\n")
    try:
        load_recipe(str(bad))
        assert False, "expected ValueError"
    except ValueError as e:
        assert "unknown worker" in str(e)

    bad2 = tmp_path / "bad2.yaml"
    bad2.write_text("steps:\n  - worker: klean\n"
                    "    params: {nonsense-param: 1}\n")
    try:
        load_recipe(str(bad2))
        assert False, "expected ValueError"
    except ValueError as e:
        assert "unknown parameter" in str(e)


def test_cli_profile_dir(tmp_path):
    """--profile-dir writes a jax.profiler trace for the worker run
    (the reference's per-run dask performance_report analogue)."""
    import os

    ms_path = str(tmp_path / "obs.npz")
    simulate_ms(ms_path, nant=7, ntime=2, nchan=1, nsource=1,
                fov_deg=0.3, seed=3)
    out = str(tmp_path / "out")
    prof = str(tmp_path / "prof")
    runner = CliRunner()
    r = runner.invoke(cli, ["--profile-dir", prof, "init", "-ms",
                            ms_path, "-o", out])
    assert r.exit_code == 0, r.output
    import jax
    try:
        jax.profiler.stop_trace()
    except Exception:
        pass
    found = [os.path.join(dp, f) for dp, _, fs in os.walk(prof)
             for f in fs]
    assert found, "no trace files written"
