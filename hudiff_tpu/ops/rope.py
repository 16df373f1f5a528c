"""Rotary position embeddings (real-valued formulation).

The reference implements RoPE with complex64 arithmetic over interleaved
(even, odd) feature pairs (model/encoder/cross_attention.py:35-88). Complex
math maps poorly onto the TPU VPU, and interleaved pairs force lane-strided
access; we use the equivalent **rotate-half** layout — pairs are
``(x[i], x[D/2+i])`` — so both halves are contiguous lane slices:
``(a', b') = (a cos(tf) - b sin(tf), a sin(tf) + b cos(tf))``, the complex
product ``(a + ib) * e^{itf}``.

Attention scores are invariant to any fixed permutation of (q, k) feature
pairs applied consistently, so the layout change is semantics-preserving;
the torch checkpoint converter permutes query/key projection columns from
the reference's interleaved order into rotate-half order
(training/checkpoints.py::_rope_permute).
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def rope_tables(head_dim: int, length: int, theta: float = 10000.0):
    """Precompute cos/sin tables of shape [length, head_dim//2] (float32)."""
    assert head_dim % 2 == 0, "RoPE head dim must be even"
    freqs = 1.0 / (theta ** (np.arange(0, head_dim, 2, dtype=np.float64) / head_dim))
    angles = np.outer(np.arange(length, dtype=np.float64), freqs)
    return (jnp.asarray(np.cos(angles), dtype=jnp.float32),
            jnp.asarray(np.sin(angles), dtype=jnp.float32))


def apply_rope(x: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray) -> jnp.ndarray:
    """Rotate feature pairs of ``x`` [..., L, H, D] by position.

    ``cos``/``sin`` are [L, D//2]; rotate-half layout — pair i is
    ``(x[..., i], x[..., D/2 + i])``. Equivalent to the reference's
    interleaved complex form under the converter's column permutation.
    """
    orig_dtype = x.dtype
    xf = x.astype(jnp.float32)
    d2 = x.shape[-1] // 2
    a = xf[..., :d2]
    b = xf[..., d2:]
    # Broadcast [L, D/2] over leading batch and the head axis: [L, 1, D/2].
    c = cos[:, None, :]
    s = sin[:, None, :]
    out = jnp.concatenate([a * c - b * s, a * s + b * c], axis=-1)
    return out.astype(orig_dtype)
