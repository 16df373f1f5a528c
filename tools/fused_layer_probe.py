"""Prototype: fully-fused attention LAYER kernel (QKV projection + RoPE +
attention + output projection in ONE Pallas program) vs the current
XLA-proj + fused-attention split.

docs/perf.md identifies the ~4ms gap in the attention stack as custom-call
materialization around the 10 per-forward Pallas calls; folding the
projections into the kernel removes the [B,L,1536] qkv and [B,L,512]
attention-output HBM round-trips. This probe measures a forward-only fused
layer against the production path at flagship shapes before any library
integration.

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/fused_layer_probe.py
"""
from __future__ import annotations

import functools
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402

from hudiff_tpu.ops.pallas_attention import (_rot, _rot_matrix,  # noqa: E402
                                             rope_attention_qkv)
from hudiff_tpu.ops.rope import rope_tables  # noqa: E402


def _fused_layer_kernel(x_ref, wqkv_ref, bqkv_ref, wout_ref, bout_ref,
                        cos_ref, sin_ref, r_ref, y_ref, *,
                        scale: float, heads: int, head_dim: int):
    x = x_ref[0]                                   # [L, d_model]
    qkv = jax.lax.dot_general(
        x, wqkv_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(x.dtype) + bqkv_ref[...]
    c = cos_ref[...]
    s = sin_ref[...]
    rm = r_ref[...]
    A = heads * head_dim
    outs = []
    for h in range(heads):
        q = _rot(qkv[:, h * head_dim:(h + 1) * head_dim]
                 .astype(jnp.float32), c, s, rm)
        k = _rot(qkv[:, A + h * head_dim:A + (h + 1) * head_dim]
                 .astype(jnp.float32), c, s, rm)
        v = qkv[:, 2 * A + h * head_dim:2 * A + (h + 1) * head_dim]
        st = jax.lax.dot_general(q.astype(x.dtype), k.astype(x.dtype),
                                 (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32) * scale
        p = jax.nn.softmax(st, axis=-1)
        o = jax.lax.dot_general(p.astype(v.dtype), v,
                                (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        outs.append(o.astype(x.dtype))
    o_all = jnp.concatenate(outs, axis=-1)          # [L, A]
    y = jax.lax.dot_general(
        o_all, wout_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(x.dtype) + bout_ref[...]
    y_ref[0] = y


def fused_layer(x, wqkv, bqkv, wout, bout, cos, sin, scale, heads):
    B, L, dm = x.shape
    A3 = wqkv.shape[1]
    head_dim = A3 // 3 // heads
    kern = functools.partial(_fused_layer_kernel, scale=scale, heads=heads,
                             head_dim=head_dim)
    cf = jnp.concatenate([cos, cos], axis=1).astype(jnp.float32)
    sf = jnp.concatenate([sin, sin], axis=1).astype(jnp.float32)
    return pl.pallas_call(
        kern, grid=(B,),
        in_specs=[pl.BlockSpec((1, L, dm), lambda b: (b, 0, 0)),
                  pl.BlockSpec(wqkv.shape, lambda b: (0, 0)),
                  pl.BlockSpec(bqkv.shape, lambda b: (0,)),
                  pl.BlockSpec(wout.shape, lambda b: (0, 0)),
                  pl.BlockSpec(bout.shape, lambda b: (0,)),
                  pl.BlockSpec((L, head_dim), lambda b: (0, 0)),
                  pl.BlockSpec((L, head_dim), lambda b: (0, 0)),
                  pl.BlockSpec((head_dim, head_dim), lambda b: (0, 0))],
        out_specs=pl.BlockSpec((1, L, dm), lambda b: (b, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, L, dm), x.dtype),
    )(x, wqkv, bqkv, wout, bout, cf, sf, _rot_matrix(head_dim))


def current_layer(x, wqkv, bqkv, wout, bout, cos, sin, scale, heads):
    qkv = x @ wqkv.astype(x.dtype) + bqkv.astype(x.dtype)
    o = rope_attention_qkv(qkv, cos, sin, scale, heads)
    return o @ wout.astype(x.dtype) + bout.astype(x.dtype)


from tools.perf_breakdown import _scan_time  # noqa: E402 - shared timing helper


def main():
    B, L, dm, att, heads = 64, 291, 768, 512, 8
    head_dim = att // heads
    scale = 1.0 / float(np.sqrt(head_dim))
    dtype = jnp.bfloat16
    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.randn(B, L, dm) * 0.1, dtype)
    wqkv = jnp.asarray(rs.randn(dm, 3 * att) * 0.02, dtype)
    bqkv = jnp.asarray(rs.randn(3 * att) * 0.01, dtype)
    wout = jnp.asarray(rs.randn(att, dm) * 0.02, dtype)
    bout = jnp.asarray(rs.randn(dm) * 0.01, dtype)
    cos, sin = rope_tables(head_dim, L)

    # parity check first
    a = np.asarray(fused_layer(x, wqkv, bqkv, wout, bout, cos, sin, scale,
                               heads), np.float32)
    b = np.asarray(current_layer(x, wqkv, bqkv, wout, bout, cos, sin, scale,
                                 heads), np.float32)
    err = float(np.max(np.abs(a - b)) / (np.max(np.abs(b)) + 1e-9))
    print(f'rel err fused vs current: {err:.4g}', file=sys.stderr)

    t_cur = _scan_time(lambda c: current_layer(
        c, wqkv, bqkv, wout, bout, cos, sin, scale, heads), x)
    t_fus = _scan_time(lambda c: fused_layer(
        c, wqkv, bqkv, wout, bout, cos, sin, scale, heads), x)
    print(json.dumps({'current_ms': round(t_cur * 1e3, 3),
                      'fused_ms': round(t_fus * 1e3, 3),
                      'speedup': round(t_cur / t_fus, 3),
                      'rel_err': err}))


if __name__ == '__main__':
    main()
