"""Conditioning embedders: sinusoidal positions, chain side, region type.

Reference: model/encoder/model.py:19-246 (MLP, PositionalEncoding,
SideEmbedder, RegionEmbedder, PosEmbedder) and the Nano variants at
model/nanoencoder/model.py:173-229.
"""
from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp
import numpy as np


def sinusoidal_table(d_model: int, max_len: int) -> np.ndarray:
    """Standard transformer sinusoidal PE table [max_len, d_model]."""
    position = np.arange(max_len, dtype=np.float64)[:, None]
    div = np.exp(np.arange(0, d_model, 2, dtype=np.float64) * (-np.log(10000.0) / d_model))
    pe = np.zeros((max_len, d_model), dtype=np.float64)
    pe[:, 0::2] = np.sin(position * div)
    pe[:, 1::2] = np.cos(position * div)
    return pe.astype(np.float32)


class GatedMLP(nn.Module):
    """Dense(d->2d) -> GELU -> Dense(2d->d) -> dropout (ref MLP, model.py:19-33).

    The reference hardcodes p=0.5 (nn.Dropout() default); we keep that rate
    but gate it on training mode.
    """
    d: int
    dropout: float = 0.5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        x = nn.Dense(2 * self.d, dtype=self.dtype, param_dtype=jnp.float32)(x)
        x = nn.gelu(x, approximate=False)  # torch nn.GELU default (exact erf)
        x = nn.Dense(self.d, dtype=self.dtype, param_dtype=jnp.float32)(x)
        if self.dropout > 0.0:
            x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        return x


class PosEmbedder(nn.Module):
    """x + PE, refined by a gated MLP: out = (x+PE) + MLP(x+PE).

    Reference PosEmbedder (model/encoder/model.py:233-246).
    """
    d: int
    max_len: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        pe = jnp.asarray(sinusoidal_table(self.d, self.max_len), dtype=x.dtype)
        x = x + pe[None, : x.shape[1], :]
        return x + GatedMLP(self.d, dtype=self.dtype)(x, deterministic=deterministic)


class SideEmbedder(nn.Module):
    """Chain-side (H / lambda / kappa) embedding broadcast over chain length.

    Takes chain types as [B, 2] = (heavy_type, light_type) and returns a
    [B, h_len + l_len, d] feature (reference SideEmbedder, model.py:183-205,
    reshaped from its flattened [2B] convention to an explicit pair axis).
    """
    n_side: int
    s_embedding: int
    d: int
    h_len: int
    l_len: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, chain_type: jnp.ndarray) -> jnp.ndarray:
        emb = nn.Embed(self.n_side, self.s_embedding, param_dtype=jnp.float32,
                       dtype=self.dtype)(chain_type)          # [B, 2, s]
        h = nn.Dense(self.d, dtype=self.dtype, param_dtype=jnp.float32)(emb)
        h = nn.LayerNorm(dtype=self.dtype)(h)
        h = nn.relu(h)
        h = nn.Dense(self.d, dtype=self.dtype, param_dtype=jnp.float32)(h)  # [B, 2, d]
        h_side = jnp.repeat(h[:, 0:1, :], self.h_len, axis=1)
        l_side = jnp.repeat(h[:, 1:2, :], self.l_len, axis=1)
        return jnp.concatenate([h_side, l_side], axis=1)


class NanoSideEmbedder(nn.Module):
    """Single-chain variant: [B] -> [B, h_len, d] (nanoencoder/model.py:173-189)."""
    n_side: int
    s_embedding: int
    d: int
    h_len: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, chain_type: jnp.ndarray) -> jnp.ndarray:
        emb = nn.Embed(self.n_side, self.s_embedding, param_dtype=jnp.float32,
                       dtype=self.dtype)(chain_type)          # [B, s]
        h = nn.Dense(self.d, dtype=self.dtype, param_dtype=jnp.float32)(emb)
        h = nn.LayerNorm(dtype=self.dtype)(h)
        h = nn.relu(h)
        h = nn.Dense(self.d, dtype=self.dtype, param_dtype=jnp.float32)(h)
        return jnp.repeat(h[:, None, :], self.h_len, axis=1)


class RegionEmbedder(nn.Module):
    """FR/CDR region-type embedding (reference RegionEmbedder, model.py:208-230)."""
    n_region: int
    r_embedding: int
    d: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, region: jnp.ndarray) -> jnp.ndarray:
        x = nn.Embed(self.n_region, self.r_embedding, param_dtype=jnp.float32,
                     dtype=self.dtype)(region)
        x = nn.LayerNorm(dtype=self.dtype)(x)
        x = nn.relu(x)
        x = nn.Dense(self.d, dtype=self.dtype, param_dtype=jnp.float32)(x)
        x = nn.LayerNorm(dtype=self.dtype)(x)
        return nn.relu(x)
