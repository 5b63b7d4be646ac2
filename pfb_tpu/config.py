"""Global precision configuration.

The reference defaults to float64 everywhere (pfb/__init__.py:59 sets
JAX_ENABLE_X64; init.yaml precision: double). On TPU, f64 is emulated and
slow, so the policy here is:

- CPU (tests, parity checks): enable x64 and compute in float64.
- TPU: compute in float32 with float64 (or compensated) accumulation where
  the reference uses double_precision_accumulation.

Every op takes its dtype from its inputs; this module only provides the
*default* dtypes used when workers allocate fresh arrays.
"""

import jax
import jax.numpy as jnp

_PRECISION = "double" if jax.config.jax_enable_x64 else "single"


def set_precision(precision: str):
    """Set default precision: 'single' or 'double'.

    'double' requires jax_enable_x64 (enabled automatically).
    """
    global _PRECISION
    if precision not in ("single", "double"):
        raise ValueError(f"Unknown precision {precision}")
    if precision == "double":
        jax.config.update("jax_enable_x64", True)
    _PRECISION = precision


def default_real_dtype():
    return jnp.float64 if _PRECISION == "double" else jnp.float32


def default_complex_dtype():
    return jnp.complex128 if _PRECISION == "double" else jnp.complex64


def complex_for(real_dtype):
    """Complex dtype matching a real dtype."""
    return jnp.result_type(real_dtype, jnp.complex64)


def on_tpu() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:  # pragma: no cover - no backend at all
        return False


def to_device(x, dtype=None):
    """numpy -> device array, building complex from two real uploads:
    some TPU runtimes (the axon relay) cannot transfer complex dtypes in
    either direction."""
    import numpy as np

    x = np.asarray(x)
    if np.iscomplexobj(x) and on_tpu():
        cdtype = dtype or complex_for(jnp.asarray(x.real).dtype)
        rdtype = jnp.finfo(cdtype).dtype
        re = jnp.asarray(np.ascontiguousarray(x.real), rdtype)
        im = jnp.asarray(np.ascontiguousarray(x.imag), rdtype)
        return jax.lax.complex(re, im)
    return jnp.asarray(x) if dtype is None else jnp.asarray(x, dtype)


def to_host(x):
    """Device array -> numpy, splitting complex into real/imag on device
    first: some TPU runtimes (the axon relay) cannot transfer complex
    dtypes device->host at all."""
    import numpy as np

    x = jnp.asarray(x)
    if jnp.iscomplexobj(x):
        return np.asarray(x.real) + 1j * np.asarray(x.imag)
    return np.asarray(x)
