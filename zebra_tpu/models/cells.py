"""Recurrent memory-updater cells, pure JAX.

Gate conventions follow torch's GRUCell/RNNCell (what the reference's memory
updater wraps, modules/memory_updater.py:95-103) so behavior is comparable:

    r = σ(x·W_ir + b_ir + h·W_hr + b_hr)
    z = σ(x·W_iz + b_iz + h·W_hz + b_hz)
    n = tanh(x·W_in + b_in + r ⊙ (h·W_hn + b_hn))
    h' = (1-z) ⊙ n + z ⊙ h

with all weights/biases initialized U(-1/√H, 1/√H)."""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp


def _uniform(rng, shape, bound):
    return jax.random.uniform(rng, shape, jnp.float32, -bound, bound)


def matmul(x: jnp.ndarray, w: jnp.ndarray, compute_dtype=None) -> jnp.ndarray:
    """``x @ w`` with reduced-precision MXU inputs where cheap, f32
    accumulation (``preferred_element_type``), f32 master weights.

    - ``compute_dtype`` set: both operands cast to it (Config.compute_dtype;
      casting a big f32 activation measured slower than the MXU-rate win at
      the default widths — see config.py).
    - ``compute_dtype`` None and ``x`` already low-precision (a bf16 table
      gather): the matmul runs at the MXU's bf16 rate by casting only the
      loop-invariant weight — there is NO activation cast traffic, and the
      data was already bf16-quantized in storage, so the only new rounding
      is on the weight. Measured faster; A/B'd for accuracy in
      scripts/parity_run.py.
    - otherwise: plain f32 matmul."""
    if compute_dtype is None and x.dtype == jnp.bfloat16:
        compute_dtype = jnp.bfloat16
    if compute_dtype is None:
        return x @ w
    return jax.lax.dot_general(
        x.astype(compute_dtype),
        w.astype(compute_dtype),
        (((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def gru_init(rng, input_dim: int, hidden_dim: int) -> Dict[str, jnp.ndarray]:
    ks = jax.random.split(rng, 4)
    b = 1.0 / jnp.sqrt(hidden_dim)
    return {
        "w_ih": _uniform(ks[0], (input_dim, 3 * hidden_dim), b),
        "w_hh": _uniform(ks[1], (hidden_dim, 3 * hidden_dim), b),
        "b_ih": _uniform(ks[2], (3 * hidden_dim,), b),
        "b_hh": _uniform(ks[3], (3 * hidden_dim,), b),
    }


def gru_apply(params, x: jnp.ndarray, h: jnp.ndarray,
              compute_dtype=None) -> jnp.ndarray:
    """x [..., D], h [..., H] → h' [..., H]."""
    hd = h.shape[-1]
    gi = matmul(x, params["w_ih"], compute_dtype) + params["b_ih"]
    gh = matmul(h, params["w_hh"], compute_dtype) + params["b_hh"]
    i_r, i_z, i_n = gi[..., :hd], gi[..., hd : 2 * hd], gi[..., 2 * hd :]
    h_r, h_z, h_n = gh[..., :hd], gh[..., hd : 2 * hd], gh[..., 2 * hd :]
    r = jax.nn.sigmoid(i_r + h_r)
    z = jax.nn.sigmoid(i_z + h_z)
    n = jnp.tanh(i_n + r * h_n)
    return (1.0 - z) * n + z * h


def rnn_init(rng, input_dim: int, hidden_dim: int) -> Dict[str, jnp.ndarray]:
    ks = jax.random.split(rng, 4)
    b = 1.0 / jnp.sqrt(hidden_dim)
    return {
        "w_ih": _uniform(ks[0], (input_dim, hidden_dim), b),
        "w_hh": _uniform(ks[1], (hidden_dim, hidden_dim), b),
        "b_ih": _uniform(ks[2], (hidden_dim,), b),
        "b_hh": _uniform(ks[3], (hidden_dim,), b),
    }


def rnn_apply(params, x: jnp.ndarray, h: jnp.ndarray,
              compute_dtype=None) -> jnp.ndarray:
    return jnp.tanh(
        matmul(x, params["w_ih"], compute_dtype) + params["b_ih"]
        + matmul(h, params["w_hh"], compute_dtype) + params["b_hh"]
    )


CELLS = {
    "gru": (gru_init, gru_apply),
    "rnn": (rnn_init, rnn_apply),
}
