"""Bochner-style fixed (non-trainable) time encoding.

``enc(Δt) = cos(Δt · ω)`` with frequencies ``ω_j = 1 / 10^{linspace(0, 9, d)_j}``
and zero phase — the reference's ``TimeEncode`` (model/time_encoding.py:6-28),
whose Linear(1→d) with frozen weights is exactly this outer product."""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def time_basis(dim: int) -> jnp.ndarray:
    """The fixed frequency vector ω, f32 [dim]."""
    return jnp.asarray(1.0 / 10.0 ** np.linspace(0, 9, dim, dtype=np.float32))


def time_encode(dt: jnp.ndarray, basis: jnp.ndarray) -> jnp.ndarray:
    """cos(Δt·ω) with a trailing feature axis appended: [...] → [..., dim]."""
    return jnp.cos(dt[..., None] * basis)
