"""ByteNet-style dilated convolution residual blocks (Flax).

Functional equivalent of the external ``sequence_models`` package the
reference depends on (ByteNetBlock / MaskedConv1d / PositionFeedForward,
used at model/encoder/model.py:90-180 and :249-304), rebuilt for TPU:

- convolutions use ``lax.conv_general_dilated`` in NLC layout so XLA lowers
  them onto the MXU as batched matmuls;
- dropout is a proper Flax dropout (off in eval) rather than the reference's
  always-on ``F.dropout`` quirk (SURVEY.md §5.1);
- compute dtype is configurable (bfloat16 on TPU), params stay float32.
"""
from __future__ import annotations

from typing import Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp
import numpy as np


def dilation_schedule(n_layers: int, r: int) -> Sequence[int]:
    """Dilations cycle through powers of two up to r (ref model.py:134-135)."""
    log2 = int(np.log2(r)) + 1
    return [2 ** (n % log2) for n in range(n_layers)]


class DilatedConv1d(nn.Module):
    """Same-padded 1-D dilated convolution over the length axis (NLC)."""
    features: int
    kernel_size: int
    dilation: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return nn.Conv(
            features=self.features,
            kernel_size=(self.kernel_size,),
            kernel_dilation=(self.dilation,),
            padding='SAME',
            dtype=self.dtype,
            param_dtype=jnp.float32,
        )(x)


class ByteNetBlock(nn.Module):
    """Residual block: x + FF2(Conv(FF1(x))).

    FF1 = LN -> act -> Dense(d_in->d_h) -> LN -> act
    Conv = dilated width-k conv (d_h -> d_h)
    FF2 = LN -> act -> Dense(d_h->d_out)
    """
    d_h: int
    d_out: int
    kernel_size: int
    dilation: int = 1
    activation: str = 'relu'
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        # exact (erf) GELU: torch nn.GELU default, needed for numeric parity
        # with converted reference checkpoints (tests/test_denoiser_parity.py)
        act = nn.relu if self.activation == 'relu' else (
            lambda v: nn.gelu(v, approximate=False))
        h = nn.LayerNorm(dtype=self.dtype)(x)
        h = act(h)
        h = nn.Dense(self.d_h, dtype=self.dtype, param_dtype=jnp.float32)(h)
        h = nn.LayerNorm(dtype=self.dtype)(h)
        h = act(h)
        h = DilatedConv1d(self.d_h, self.kernel_size, self.dilation, dtype=self.dtype)(h)
        h = nn.LayerNorm(dtype=self.dtype)(h)
        h = act(h)
        h = nn.Dense(self.d_out, dtype=self.dtype, param_dtype=jnp.float32)(h)
        return x + h


class ByteNetStack(nn.Module):
    """N ByteNet blocks with the power-of-two dilation cycle + dropout."""
    n_layers: int
    d_model: int
    kernel_size: int
    r: int
    slim: bool = True
    activation: str = 'relu'
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, deterministic: bool = True) -> jnp.ndarray:
        d_h = self.d_model // 2 if self.slim else self.d_model
        for d in dilation_schedule(self.n_layers, self.r):
            x = ByteNetBlock(
                d_h=d_h, d_out=self.d_model, kernel_size=self.kernel_size,
                dilation=d, activation=self.activation, dtype=self.dtype)(x)
            if self.dropout > 0.0:
                x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        return x
