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

from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
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


class _LNParams(nn.Module):
    """Parameter shell matching nn.LayerNorm's tree ({scale, bias})."""
    dim: int

    @nn.compact
    def __call__(self) -> Tuple[jnp.ndarray, jnp.ndarray]:
        return (self.param('scale', nn.initializers.ones, (self.dim,),
                           jnp.float32),
                self.param('bias', nn.initializers.zeros, (self.dim,),
                           jnp.float32))


class _DenseParams(nn.Module):
    """Parameter shell matching nn.Dense/nn.Conv's tree ({kernel, bias});
    identical default initializer (lecun_normal) and param paths, so a
    model initialized through the fused path is bit-identical to one
    initialized through the module path."""
    kernel_shape: Tuple[int, ...]

    @nn.compact
    def __call__(self) -> Tuple[jnp.ndarray, jnp.ndarray]:
        from flax.linen.linear import default_kernel_init
        return (self.param('kernel', default_kernel_init, self.kernel_shape,
                           jnp.float32),
                self.param('bias', nn.initializers.zeros,
                           (self.kernel_shape[-1],), jnp.float32))


class _ConvParams(nn.Module):
    """Mirrors DilatedConv1d's nesting: DilatedConv1d_0/Conv_0/{kernel,bias}."""
    kernel_shape: Tuple[int, ...]

    @nn.compact
    def __call__(self) -> Tuple[jnp.ndarray, jnp.ndarray]:
        return _DenseParams(self.kernel_shape, name='Conv_0')()


def pallas_active(use_pallas: str) -> bool:
    """'never' -> off; 'auto' -> on TPU only; anything else -> forced on
    (interpret mode off-TPU) — same convention as ops/pallas_attention.py."""
    if use_pallas == 'never':
        return False
    if use_pallas == 'auto':
        return jax.default_backend() == 'tpu'
    return True


class ByteNetBlock(nn.Module):
    """Residual block: x + FF2(Conv(FF1(x))).

    FF1 = LN -> act -> Dense(d_in->d_h) -> LN -> act
    Conv = dilated width-k conv (d_h -> d_h)
    FF2 = LN -> act -> Dense(d_h->d_out)

    ``use_pallas``: route through the fused Pallas kernel
    (ops/pallas_bytenet.py) — one VMEM-resident kernel per block instead of
    ~15 HBM tensor passes. The parameter tree (names, shapes, initializers)
    is identical in both paths, so checkpoints are interchangeable.
    """
    d_h: int
    d_out: int
    kernel_size: int
    dilation: int = 1
    activation: str = 'relu'
    dtype: jnp.dtype = jnp.float32
    use_pallas: str = 'never'

    def _fusable(self, d_in: int) -> bool:
        """On a real TPU the compiled Mosaic kernel needs 128-aligned lane
        dims (pallas_bytenet.mosaic_supported); interpret mode (CPU tests,
        any shape) is unrestricted."""
        import jax
        if jax.default_backend() != 'tpu':
            return True
        from .pallas_bytenet import mosaic_supported
        return mosaic_supported(d_in, self.d_h)

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        d_in = x.shape[-1]
        if pallas_active(self.use_pallas) and self._fusable(d_in):
            from .pallas_bytenet import bytenet_block_fused
            g1, b1 = _LNParams(d_in, name='LayerNorm_0')()
            w1, c1 = _DenseParams((d_in, self.d_h), name='Dense_0')()
            g2, b2 = _LNParams(self.d_h, name='LayerNorm_1')()
            wc, cc = _ConvParams(
                (self.kernel_size, self.d_h, self.d_h),
                name='DilatedConv1d_0')()
            g3, b3 = _LNParams(self.d_h, name='LayerNorm_2')()
            w2, c2 = _DenseParams((self.d_h, self.d_out), name='Dense_1')()
            return bytenet_block_fused(
                x.astype(self.dtype), g1, b1, w1, c1, g2, b2, wc, cc,
                g3, b3, w2, c2, kernel_size=self.kernel_size,
                dilation=self.dilation, activation=self.activation)
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
    use_pallas: str = 'never'

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, deterministic: bool = True) -> jnp.ndarray:
        d_h = self.d_model // 2 if self.slim else self.d_model
        for d in dilation_schedule(self.n_layers, self.r):
            x = ByteNetBlock(
                d_h=d_h, d_out=self.d_model, kernel_size=self.kernel_size,
                dilation=d, activation=self.activation, dtype=self.dtype,
                use_pallas=self.use_pallas)(x)
            if self.dropout > 0.0:
                x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        return x
