"""Fused ByteNet residual block as a Pallas TPU kernel.

The ByteNet block (ops/bytenet.py::ByteNetBlock, the reference's
ByteNetBlock at model/encoder/model.py:90-180) is three LayerNorms, two
1x1 Denses and one dilated width-k conv around a residual:

    y = x + W2 @ act(LN3(conv(act(LN2(W1 @ act(LN1(x)))))))

At HuDiff's widths (d_model 256-768, d_h 128-384, L 139-291) every matmul
is tiny, so the XLA path is HBM-bound: each block streams ~15 tensor-sized
reads/writes through HBM (measured 11-17 TFLOP/s on a v5e — 6-9% MFU,
docs/train_breakdown_b128.json "stages"). This kernel keeps the whole
block in VMEM:

- forward: one read of x, one write of y, plus two narrow intermediate
  saves (p, q — the pre-LN Dense/conv outputs) for the backward;
- backward: analytic VJP in one kernel — recomputes the LayerNorm
  statistics and activations from (x, p, q) in VMEM (elementwise only, no
  matmul recompute) and produces dx plus all 12 parameter gradients, the
  parameter reductions accumulated across the sequential batch-tile grid;
- the dilated SAME conv is expressed as K shifted [TB*L, d_h] x [d_h, d_h]
  matmuls over a zero-padded VMEM buffer, so it rides the MXU like the
  Denses do.

Numerics match the Flax path: LayerNorm statistics in f32 with the
fast-variance formula and eps=1e-6 (flax.linen.LayerNorm defaults), exact
(erf) GELU, matmuls in the input dtype with f32 accumulation — bf16 inputs
(the production path) hit the MXU's native rate, f32 inputs (CPU interpret
tests) keep full fidelity.

Falls back to interpret mode off-TPU, same convention as
ops/pallas_attention.py.
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:  # pallas TPU backend is optional at import time (CPU test envs)
    from jax.experimental.pallas import tpu as pltpu
except ImportError:  # pragma: no cover
    pltpu = None

# Mosaic's default 16 MiB scoped-vmem stack is too small for the widest
# block (d 768 / d_h 384 with the dilation-32 padded conv buffers); the
# v5e has 128 MiB of VMEM — give kernels a 96 MiB allowance and size the
# batch tile to stay well inside it (_tile).
_VMEM_LIMIT = 96 * 1024 * 1024


def _compiler_params(interpret):
    if interpret or pltpu is None:
        return None
    return pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT)


_INV_SQRT2 = 1.0 / math.sqrt(2.0)
_INV_SQRT2PI = 1.0 / math.sqrt(2.0 * math.pi)
_LN_EPS = 1e-6  # flax.linen.LayerNorm default


def _ln_parts(xf, g, b):
    """f32 LayerNorm with flax's fast-variance formula.

    Returns (affine output, normalized, inv_sigma) — the backward reuses
    the latter two."""
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True) - mu * mu
    inv = jax.lax.rsqrt(var + _LN_EPS)
    n = (xf - mu) * inv
    return n * g + b, n, inv


def _ln_bwd(dn_hat, n, inv):
    """dL/dx for y = normalize(x): (dn - mean(dn) - n*mean(dn*n)) * inv."""
    m1 = jnp.mean(dn_hat, axis=-1, keepdims=True)
    m2 = jnp.mean(dn_hat * n, axis=-1, keepdims=True)
    return (dn_hat - m1 - n * m2) * inv


def _erf(x):
    """Abramowitz–Stegun 7.1.26 rational erf (max abs error 1.5e-7 — below
    bf16 resolution and far inside the fused-vs-module test tolerance).
    Mosaic has no erf lowering, so the kernel carries its own."""
    s = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + 0.3275911 * ax)
    poly = t * (0.254829592 + t * (-0.284496736 + t * (1.421413741
                + t * (-1.453152027 + t * 1.061405429))))
    return s * (1.0 - poly * jnp.exp(-ax * ax))


def _act(u, name: str):
    if name == 'relu':
        return jnp.maximum(u, 0.0)
    # exact (erf) GELU — torch nn.GELU default, see ops/bytenet.py
    return u * 0.5 * (1.0 + _erf(u * _INV_SQRT2))


def _dact(u, name: str):
    if name == 'relu':
        return (u > 0).astype(u.dtype)
    cdf = 0.5 * (1.0 + _erf(u * _INV_SQRT2))
    pdf = jnp.exp(-0.5 * u * u) * _INV_SQRT2PI
    return cdf + u * pdf


def _dot3(a, w):
    """[TB, L, M] @ [M, N] -> [TB, L, N], f32 accumulation."""
    return jax.lax.dot_general(a, w, (((2,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _contract_tl(a, b):
    """sum over (tile, length): [TB, L, M], [TB, L, N] -> [M, N] f32.
    Unrolled over the (small, static) tile dim — Mosaic's tpu.matmul has no
    multi-dim contraction, and the per-sample [M, L] x [L, N] form it gets
    instead contracts over L >= 139, a healthy MXU shape."""
    acc = None
    for t in range(a.shape[0]):
        part = jax.lax.dot_general(a[t], b[t], (((0,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32)
        acc = part if acc is None else acc + part
    return acc


def _padded(x, pad):
    """Zero-pad the length axis of [TB, L, H] by ``pad`` on both sides.
    (concatenate, not dynamic_update_slice — Mosaic lowers the former.)"""
    tb, _, H = x.shape
    z = jnp.zeros((tb, pad, H), x.dtype)
    return jnp.concatenate([z, x, z], axis=1)


def _row_mask(shape3, l_valid: int):
    """[1, L, 1] mask of rows < l_valid (the real sequence length; rows
    beyond it are the wrapper's alignment padding — see ``_ceil8``)."""
    idx = jax.lax.broadcasted_iota(jnp.int32, (1, shape3[1], 1), 1)
    return idx < l_valid


def _conv_fwd(bcd, wc, K: int, dil: int):
    """Dilated SAME conv as K shifted matmuls; f32 accumulator."""
    tb, L, H = bcd.shape
    pad = (K - 1) // 2 * dil
    bp = _padded(bcd, pad)
    acc = jnp.zeros((tb, L, H), jnp.float32)
    for k in range(K):
        acc += _dot3(jax.lax.slice_in_dim(bp, k * dil, k * dil + L, axis=1),
                     wc[k].astype(bcd.dtype))
    return acc


# ---------------------------------------------------------------------------
# Forward kernel: x [TB, L, D] -> y [TB, L, D], saving p/q [TB, L, H]
# ---------------------------------------------------------------------------

def _fwd_kernel(x_ref, g1, b1, w1, c1, g2, b2, wc, cc, g3, b3, w2, c2,
                y_ref, p_ref, q_ref, *, K: int, dil: int, act: str,
                l_valid: int):
    x = x_ref[...]
    cd = x.dtype
    xf = x.astype(jnp.float32)
    uh, _, _ = _ln_parts(xf, g1[0], b1[0])
    a = _act(uh, act).astype(cd)
    p = (_dot3(a, w1[...].astype(cd)) + c1[0]).astype(cd)
    p_ref[...] = p
    vh, _, _ = _ln_parts(p.astype(jnp.float32), g2[0], b2[0])
    bb = _act(vh, act).astype(cd)
    # zero the alignment-padding rows: only bb crosses rows (via the conv),
    # so masking it here makes L-padding exact — a padded row's nonzero
    # activations (LN/Dense of a zero row are not zero) must not leak into
    # real rows' conv windows.
    bb = jnp.where(_row_mask(bb.shape, l_valid), bb, jnp.zeros_like(bb))
    q = (_conv_fwd(bb, wc, K, dil) + cc[0]).astype(cd)
    q_ref[...] = q
    wh, _, _ = _ln_parts(q.astype(jnp.float32), g3[0], b3[0])
    e = _act(wh, act).astype(cd)
    y = _dot3(e, w2[...].astype(cd)) + c2[0]
    y_ref[...] = (xf + y).astype(cd)


# ---------------------------------------------------------------------------
# Backward kernel: recompute elementwise pieces from (x, p, q); dx per tile,
# parameter grads accumulated across the (sequential) grid.
# ---------------------------------------------------------------------------

def _bwd_kernel(x_ref, p_ref, q_ref,
                g1, b1, w1, c1, g2, b2, wc, cc, g3, b3, w2, c2, dy_ref,
                dx_ref, dg1, db1, dw1, dc1, dg2, db2, dwc, dcc,
                dg3, db3, dw2, dc2, *, K: int, dil: int, act: str,
                l_valid: int):
    @pl.when(pl.program_id(0) == 0)
    def _init():
        for ref in (dg1, db1, dw1, dc1, dg2, db2, dwc, dcc, dg3, db3,
                    dw2, dc2):
            ref[...] = jnp.zeros_like(ref)

    x = x_ref[...]
    cd = x.dtype
    dy = dy_ref[...]
    dyf = dy.astype(jnp.float32)
    xf = x.astype(jnp.float32)

    # recompute forward elementwise pieces (no matmuls)
    uh, un, inv1 = _ln_parts(xf, g1[0], b1[0])
    a = _act(uh, act).astype(cd)
    vh, vn, inv2 = _ln_parts(p_ref[...].astype(jnp.float32), g2[0], b2[0])
    bb = _act(vh, act).astype(cd)
    # same alignment-row masking as the forward (dwc's shifted-input taps
    # read bb; everything else at padded rows is annihilated by dy == 0)
    bb = jnp.where(_row_mask(bb.shape, l_valid), bb, jnp.zeros_like(bb))
    wh, wn, inv3 = _ln_parts(q_ref[...].astype(jnp.float32), g3[0], b3[0])
    e = _act(wh, act).astype(cd)

    # Dense_1 (w2): y = x + e @ w2 + c2
    de = jax.lax.dot_general(dy, w2[...].astype(cd),
                             (((2,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    dw2[...] += _contract_tl(e, dy)
    dc2[...] += jnp.sum(dyf, axis=(0, 1))[None]

    # LayerNorm_2 (g3/b3)
    dwh = de * _dact(wh, act)
    dg3[...] += jnp.sum(dwh * wn, axis=(0, 1))[None]
    db3[...] += jnp.sum(dwh, axis=(0, 1))[None]
    dq = _ln_bwd(dwh * g3[0], wn, inv3)
    dcc[...] += jnp.sum(dq, axis=(0, 1))[None]
    dqc = dq.astype(cd)

    # dilated conv: data grad = correlation with the flipped kernel;
    # weight grad per tap = shifted-input^T @ dq
    tb, L, H = dqc.shape
    pad = (K - 1) // 2 * dil
    dqp = _padded(dqc, pad)
    bp = _padded(bb, pad)
    dbb = jnp.zeros((tb, L, H), jnp.float32)
    for k in range(K):
        dbb += jax.lax.dot_general(
            jax.lax.slice_in_dim(dqp, (K - 1 - k) * dil,
                                 (K - 1 - k) * dil + L, axis=1),
            wc[k].astype(cd), (((2,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        dwc[k] += _contract_tl(
            jax.lax.slice_in_dim(bp, k * dil, k * dil + L, axis=1), dqc)
    # conv-transpose taps spill real dq rows into padded dbb rows; in the
    # unpadded computation those rows don't exist, so zero them before they
    # reach the parameter-gradient reductions below
    dbb = jnp.where(_row_mask(dbb.shape, l_valid), dbb,
                    jnp.zeros_like(dbb))

    # LayerNorm_1 (g2/b2) + Dense_0 (w1)
    dvh = dbb * _dact(vh, act)
    dg2[...] += jnp.sum(dvh * vn, axis=(0, 1))[None]
    db2[...] += jnp.sum(dvh, axis=(0, 1))[None]
    dp = _ln_bwd(dvh * g2[0], vn, inv2)
    dc1[...] += jnp.sum(dp, axis=(0, 1))[None]
    dpc = dp.astype(cd)
    da = jax.lax.dot_general(dpc, w1[...].astype(cd),
                             (((2,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    dw1[...] += _contract_tl(a, dpc)

    # LayerNorm_0 (g1/b1) + residual
    duh = da * _dact(uh, act)
    dg1[...] += jnp.sum(duh * un, axis=(0, 1))[None]
    db1[...] += jnp.sum(duh, axis=(0, 1))[None]
    dx0 = _ln_bwd(duh * g1[0], un, inv1)
    dx_ref[...] = (dyf + dx0).astype(cd)


# ---------------------------------------------------------------------------
# pallas_call plumbing
# ---------------------------------------------------------------------------

def _ceil8(L: int) -> int:
    """Mosaic's vector layouts need the length axis sublane-aligned: the
    [TB, L, *] -> [TB*L, *] shape cast inside the matmuls is 'unsupported'
    when L % 8 != 0 (hit at the light tower's L=139). The wrappers pad to
    the next multiple of 8 and the kernels mask the padded rows (see
    _row_mask) so the padding is numerically invisible."""
    return -(-L // 8) * 8


def _pad_len(x, L8: int):
    B, L, D = x.shape
    if L == L8:
        return x
    return jnp.concatenate(
        [x, jnp.zeros((B, L8 - L, D), x.dtype)], axis=1)


def _tile(B: int, L: int, D: int, H: int, pad: int) -> int:
    """Largest batch tile (<=8) dividing B whose estimated live set fits
    comfortably inside the scoped-vmem allowance. The estimate is the
    backward kernel's dominant f32 tiles: ~6 [tb, L, D]-sized intermediates
    plus ~4 padded [tb, L+2*pad, H] conv buffers."""
    per_tb = 4 * L * D * 6 + 4 * (L + 2 * pad) * H * 4
    budget = _VMEM_LIMIT * 2 // 3
    for tb in (8, 4, 2, 1):
        if B % tb == 0 and tb * per_tb <= budget:
            return tb
    return 1


def _specs(B, L, D, H, K, tb):
    xs = pl.BlockSpec((tb, L, D), lambda b: (b, 0, 0))
    hs = pl.BlockSpec((tb, L, H), lambda b: (b, 0, 0))
    vec = lambda n: pl.BlockSpec((1, n), lambda b: (0, 0))
    mat = lambda m, n: pl.BlockSpec((m, n), lambda b: (0, 0))
    conv = pl.BlockSpec((K, H, H), lambda b: (0, 0, 0))
    params = [vec(D), vec(D), mat(D, H), vec(H), vec(H), vec(H), conv,
              vec(H), vec(H), vec(H), mat(H, D), vec(D)]
    return xs, hs, params, vec, mat, conv


def _pallas_fwd(x, params, K, dil, act, interpret):
    """x is UNPADDED [B, L, D]; returns y sliced back to L plus the padded
    (xp, p, q) residuals for the backward."""
    B, L, D = x.shape
    L8 = _ceil8(L)
    xp = _pad_len(x, L8)
    H = params[2].shape[1]
    tb = _tile(B, L8, D, H, (K - 1) // 2 * dil)
    xs, hs, pspecs, _, _, _ = _specs(B, L8, D, H, K, tb)
    kern = functools.partial(_fwd_kernel, K=K, dil=dil, act=act, l_valid=L)
    y, p, q = pl.pallas_call(
        kern, grid=(B // tb,),
        in_specs=[xs] + pspecs,
        out_specs=[xs, hs, hs],
        out_shape=[jax.ShapeDtypeStruct((B, L8, D), x.dtype),
                   jax.ShapeDtypeStruct((B, L8, H), x.dtype),
                   jax.ShapeDtypeStruct((B, L8, H), x.dtype)],
        interpret=interpret,
        compiler_params=_compiler_params(interpret),
    )(xp, *params)
    return y[:, :L], xp, p, q


def _pallas_bwd(xp, p, q, params, dy, K, dil, act, interpret):
    """xp/p/q are the PADDED residuals; dy is the unpadded cotangent.
    Returns dx sliced back to dy's length plus the parameter grads."""
    B, L, D = dy.shape
    L8 = xp.shape[1]
    dyp = _pad_len(dy, L8)
    H = params[2].shape[1]
    tb = _tile(B, L8, D, H, (K - 1) // 2 * dil)
    xs, hs, pspecs, vec, mat, conv = _specs(B, L8, D, H, K, tb)
    kern = functools.partial(_bwd_kernel, K=K, dil=dil, act=act, l_valid=L)
    f32 = jnp.float32
    grad_shapes = [jax.ShapeDtypeStruct(s, f32) for s in
                   [(1, D), (1, D), (D, H), (1, H), (1, H), (1, H),
                    (K, H, H), (1, H), (1, H), (1, H), (H, D), (1, D)]]
    grad_specs = [vec(D), vec(D), mat(D, H), vec(H), vec(H), vec(H), conv,
                  vec(H), vec(H), vec(H), mat(H, D), vec(D)]
    outs = pl.pallas_call(
        kern, grid=(B // tb,),
        in_specs=[xs, hs, hs] + pspecs + [xs],
        out_specs=[xs] + grad_specs,
        out_shape=([jax.ShapeDtypeStruct((B, L8, D), dy.dtype)]
                   + grad_shapes),
        interpret=interpret,
        compiler_params=_compiler_params(interpret),
    )(xp, p, q, *params, dyp)
    return (outs[0][:, :L],) + tuple(outs[1:])


def _pack(g1, b1, w1, c1, g2, b2, wc, cc, g3, b3, w2, c2):
    """1-D params to (1, N) rows (TPU-friendly); f32 throughout."""
    row = lambda v: v.astype(jnp.float32)[None]
    return (row(g1), row(b1), w1.astype(jnp.float32), row(c1), row(g2),
            row(b2), wc.astype(jnp.float32), row(cc), row(g3), row(b3),
            w2.astype(jnp.float32), row(c2))


@functools.partial(jax.custom_vjp, nondiff_argnums=(13, 14, 15, 16))
def _bytenet_fused(x, g1, b1, w1, c1, g2, b2, wc, cc, g3, b3, w2, c2,
                   K, dil, act, interpret):
    y, _, _, _ = _pallas_fwd(x, _pack(g1, b1, w1, c1, g2, b2, wc, cc, g3,
                                      b3, w2, c2), K, dil, act, interpret)
    return y


def _fused_fwd(x, g1, b1, w1, c1, g2, b2, wc, cc, g3, b3, w2, c2,
               K, dil, act, interpret):
    packed = _pack(g1, b1, w1, c1, g2, b2, wc, cc, g3, b3, w2, c2)
    y, xp, p, q = _pallas_fwd(x, packed, K, dil, act, interpret)
    return y, (xp, p, q, packed)


def _fused_bwd(K, dil, act, interpret, res, dy):
    xp, p, q, packed = res
    outs = _pallas_bwd(xp, p, q, packed, dy.astype(xp.dtype), K, dil, act,
                       interpret)
    dx = outs[0]
    dg1, db1, dw1, dc1, dg2, db2, dwc, dcc, dg3, db3, dw2, dc2 = outs[1:]
    unrow = lambda v: v[0]
    return (dx, unrow(dg1), unrow(db1), dw1, unrow(dc1), unrow(dg2),
            unrow(db2), dwc, unrow(dcc), unrow(dg3), unrow(db3), dw2,
            unrow(dc2))


_bytenet_fused.defvjp(_fused_fwd, _fused_bwd)


def mosaic_supported(d_in: int, d_h: int) -> bool:
    """Lane-dim eligibility for the COMPILED Mosaic kernel: the in-kernel
    matmuls keep D/H on the lane (minor) axis and Mosaic's shape casts
    around them want 128-aligned lanes (sub-128 widths hit 'unsupported
    shape cast' in infer-vector-layout). Every production tower qualifies
    (256/128, 512/256, 768/384); tiny test/CI configs fall back to the XLA
    module path, where fusion buys nothing anyway. Interpret mode (CPU
    tests) is exempt — ByteNetBlock only consults this on a real TPU
    backend."""
    return d_in % 128 == 0 and d_h % 128 == 0


def bytenet_block_fused(x: jnp.ndarray, g1, b1, w1, c1, g2, b2, wc, cc,
                        g3, b3, w2, c2, *, kernel_size: int, dilation: int,
                        activation: str) -> jnp.ndarray:
    """Fused ByteNet block: y = x + Dense(act(LN(conv(act(LN(Dense(act(
    LN(x)))))))))  — see module docstring.

    x: [B, L, D]; parameters in the flax layout (w1 [D, d_h],
    wc [K, d_h, d_h], w2 [d_h, D], LN scale/bias per stage). Runs the
    Pallas kernel on TPU, interpret mode elsewhere.
    """
    interpret = jax.default_backend() != 'tpu'
    return _bytenet_fused(x, g1, b1, w1, c1, g2, b2, wc, cc, g3, b3, w2, c2,
                          int(kernel_size), int(dilation), str(activation),
                          interpret)


def block_matmul_flops(B: int, L: int, D: int, H: int, K: int,
                       backward: bool = False) -> float:
    """Executed MXU FLOPs of one fused block (for MFU accounting: XLA cost
    analysis reports 0 for custom calls, so bench/tools add these back —
    see utils/flops.py). Forward: Dense D->H, K conv taps HxH, Dense H->D;
    backward executes exactly 2x the forward matmuls (data + weight grads;
    elementwise recompute adds no matmuls)."""
    fwd = 2.0 * B * L * (D * H + K * H * H + H * D)
    return fwd * 3.0 if backward else fwd
