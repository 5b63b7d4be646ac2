"""Mask operator: image <-> unmasked-pixel vector
(reference: pfb/operators/mask.py:4-27)."""

import jax.numpy as jnp
import numpy as np


class Mask:
    def __init__(self, mask):
        """mask: (nx, ny) boolean (True = keep)."""
        self.mask = np.asarray(mask, bool)
        self.nx, self.ny = self.mask.shape
        self.idx = jnp.asarray(np.flatnonzero(self.mask.ravel()))
        self.n = int(self.idx.size)

    def dot(self, x):
        """image -> vector of unmasked pixels."""
        return x.reshape(*x.shape[:-2], -1)[..., self.idx]

    def hdot(self, v):
        """vector -> image (zeros elsewhere)."""
        lead = v.shape[:-1]
        flat = jnp.zeros((*lead, self.nx * self.ny), v.dtype)
        flat = flat.at[..., self.idx].set(v)
        return flat.reshape(*lead, self.nx, self.ny)
