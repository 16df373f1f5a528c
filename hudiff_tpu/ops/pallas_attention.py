"""Pallas TPU kernel: fused scaled-dot-product attention.

For HuDiff's short sequences (291/152 tokens) one (batch, head) attention is
tiny — the win is not FLOPs but HBM traffic: XLA materializes the
[B, H, L, L] attention probabilities (1.4 GB per layer at B=512, L=291),
while this kernel keeps scores + softmax + AV entirely in VMEM, one
(batch, head) program per grid cell.

RoPE is applied OUTSIDE the kernel (it fuses into the QKV projection
epilogue; rotated q/k are no larger than q/k). Falls back to the jnp einsum
path off-TPU; interpret mode makes the kernel testable on CPU.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:  # pallas TPU backend is optional at import time (CPU test envs)
    from jax.experimental.pallas import tpu as pltpu
    _HAS_PLTPU = True
except ImportError:  # pragma: no cover
    pltpu = None
    _HAS_PLTPU = False


def _attn_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float, heads: int):
    # block carries all heads of one batch element: [H, L, D]; the head loop
    # is statically unrolled so per-program overhead amortizes over H
    # attention computations.
    for h in range(heads):
        q = q_ref[0, h].astype(jnp.float32)          # [L, D]
        k = k_ref[0, h].astype(jnp.float32)
        v = v_ref[0, h]
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) * scale
        p = jax.nn.softmax(s, axis=-1)
        o = jax.lax.dot_general(p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        o_ref[0, h] = o.astype(o_ref.dtype)


def fused_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                    scale: float, interpret: bool = False) -> jnp.ndarray:
    """softmax(q k^T * scale) v, fused per batch element (all heads).

    q/k/v: [B, H, L, D]. Returns [B, H, L, D] (v dtype).
    """
    B, H, L, D = q.shape
    kernel = functools.partial(_attn_kernel, scale=scale, heads=H)
    block = pl.BlockSpec((1, H, L, D), lambda b: (b, 0, 0, 0))
    return pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[block, block, block],
        out_specs=block,
        out_shape=jax.ShapeDtypeStruct((B, H, L, D), v.dtype),
        interpret=interpret,
    )(q, k, v)


def attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray, scale: float,
              use_pallas: str = 'auto') -> jnp.ndarray:
    """Attention over [B, L, H, D] inputs -> [B, L, H, D].

    use_pallas: 'auto' (TPU only), 'always' (interpret off-TPU), 'never'.
    """
    B, L, H, D = q.shape
    if use_pallas == 'never':
        logits = jnp.einsum('blhd,bmhd->bhlm', q, k,
                            preferred_element_type=jnp.float32) * scale
        probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
        return jnp.einsum('bhlm,bmhd->blhd', probs, v)

    on_tpu = jax.default_backend() == 'tpu'
    if use_pallas == 'auto' and not on_tpu:
        return attention(q, k, v, scale, use_pallas='never')
    interpret = not on_tpu

    def to_bhld(x):
        return x.transpose(0, 2, 1, 3)

    o = fused_attention(to_bhld(q), to_bhld(k), to_bhld(v), scale,
                        interpret=interpret)
    return o.transpose(0, 2, 1, 3)
