"""Rotary position embeddings (real-valued formulation).

The reference implements RoPE with complex64 arithmetic
(model/encoder/cross_attention.py:35-88). Complex math maps poorly onto the
TPU VPU, so we use the equivalent paired-rotation form over (even, odd)
feature pairs: for each pair (a, b) at position t with frequency f,
``(a', b') = (a cos(tf) - b sin(tf), a sin(tf) + b cos(tf))`` — exactly the
complex product ``(a + ib) * e^{itf}``.
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

    ``cos``/``sin`` are [L, D//2]; adjacent feature pairs (2i, 2i+1) form the
    (real, imag) components, matching torch.view_as_complex semantics on the
    reference's reshape(..., -1, 2).
    """
    orig_dtype = x.dtype
    xf = x.astype(jnp.float32)
    a = xf[..., 0::2]
    b = xf[..., 1::2]
    # Broadcast [L, D/2] over leading batch and the head axis: [L, 1, D/2].
    c = cos[:, None, :]
    s = sin[:, None, :]
    ra = a * c - b * s
    rb = a * s + b * c
    out = jnp.stack([ra, rb], axis=-1).reshape(x.shape)
    return out.astype(orig_dtype)
