"""Test configuration.

Tests run on CPU in float64 for parity with the reference test suite
(which asserts identities at 1e-8..1e-12 in double precision, see
/root/reference/tests). Multi-device tests use 8 virtual CPU devices via
XLA_FLAGS, mirroring how the reference's distributed paths *should* have
been tested (SURVEY.md section 4).

Environment must be set before jax is imported anywhere.
"""

import os

if os.environ.get("PFB_TPU_CHIP_TESTS"):
    # on-chip mode: keep the session's real accelerator (f32) so
    # tests/test_tpu_chip.py runs compiled Mosaic lowerings — use it
    # SELECTIVELY (`PFB_TPU_CHIP_TESTS=1 pytest tests/test_tpu_chip.py`);
    # the CPU/f64 parity suites assume double precision and 8 virtual
    # devices and are not meant to run in this mode.
    import jax  # noqa: F401
else:
    # Force CPU even when a TPU plugin env (JAX_PLATFORMS=axon) is
    # present — sitecustomize may already have imported jax, so use
    # jax.config as well.
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8").strip()
    os.environ.setdefault("JAX_ENABLE_X64", "true")

    import jax  # noqa: E402

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: end-to-end pipelines dominating suite wall time — "
        "skip with `-m 'not slow'` for a fast iteration loop "
        "(release gates run everything)")
