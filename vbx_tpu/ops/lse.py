"""Stable log-sum-exp helpers that tolerate fully-masked inputs.

TPUs have no native float64, so every reduction here is written to be stable
in float32: subtract-max logsumexp, with masked lanes held at a large-but-
finite negative constant (a true -inf would generate NaN via inf - inf when a
whole reduction lane is masked).
"""

from __future__ import annotations

import jax.numpy as jnp

# exp(NEG_INF) == 0 in both f32 and f64, while NEG_INF - NEG_INF == 0 stays
# finite (unlike -inf). Large enough that adding per-frame log-liks can never
# bring a masked lane back above a live one.
NEG_INF = -1e30


def masked_fill(x, mask, fill=NEG_INF):
    """Replace entries where mask is False with `fill`."""
    return jnp.where(mask, x, jnp.asarray(fill, dtype=x.dtype))


def logsumexp(x, axis=-1, keepdims=False):
    """Stable logsumexp that returns NEG_INF (not nan) for all-NEG_INF lanes."""
    m = jnp.max(x, axis=axis, keepdims=True)
    m_safe = jnp.maximum(m, jnp.asarray(NEG_INF, dtype=x.dtype))
    out = m_safe + jnp.log(jnp.sum(jnp.exp(x - m_safe), axis=axis, keepdims=True))
    if not keepdims:
        out = jnp.squeeze(out, axis=axis)
    return out


def masked_logsumexp(x, mask, axis=-1, keepdims=False):
    """logsumexp over entries where mask is True."""
    return logsumexp(masked_fill(x, mask), axis=axis, keepdims=keepdims)


