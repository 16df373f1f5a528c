"""Roofline the PRETRAIN STEP: where does the backward lose its ~8 MFU points?

Round-4 VERDICT next #4: the forward rooflines at 38.7% of bf16 peak
(tools/perf_breakdown.py) but the full train step sits at ~31%; perf.md never
decomposed the backward. This tool measures, on the real chip:

  1. batch sweep — full fused step (corrupt+fwd+bwd+Adam) at B in {128,256,512}:
     sec/step, XLA-counted FLOPs, TFLOP/s, MFU (reference batch anchor is
     antibody config B=128; nothing hardware-bound about it);
  2. parts at a fixed B — forward (eval), forward (train-mode dropout),
     forward+backward, forward+backward with dropout off, full step —
     so backward-only time/FLOPs and the dropout/RNG tax fall out by
     subtraction. "Dropout off" keeps the train-mode trace and rebuilds the
     model with dropout rate 0 (flipping ``deterministic`` would also flip
     conv_pallas_policy's kernel routing); the hardcoded p=0.5 pos-MLP
     dropout (embedders.py:27-31, one site of ~25) stays on. All rates are
     MFU-corrected for fused Pallas kernels via utils/flops.py — XLA's
     cost analysis reports ~0 FLOPs for Mosaic custom calls;
  3. per-stage fwd vs fwd+bwd — attention stack, dual towers, aa towers —
     to see which stage's backward runs furthest below its forward rate;
  4. PRNG impl probe — the same fwd+bwd with an 'rbg' dropout key instead of
     the default threefry (identical dropout distribution, cheaper bits on
     TPU) to price the threefry tax specifically.

Timing: repeated calls on ONE compiled executable with a DISTINCT rng per
call (the tunnel run-cache keys on (executable, args)); jax dispatch is
async so host/tunnel latency pipelines away at these >5 ms program sizes.
The full-step numbers use the exact `make_pair_train_step` executable that
bench.py times, so the sweep explains the artifact number, not a proxy.

Run: PYTHONPATH=/root/repo python tools/train_breakdown.py
Env: HUDIFF_TB_SWEEP=128,256,512  HUDIFF_TB_PARTS_B=128  HUDIFF_TB_REPS=6
     HUDIFF_TB_NANO=1 — roofline the NANO stack instead (NanoAntiTFNet at
     nano_config: d=256/512, L=152, dropout 0.5 — the fine-tune step's
     dominant cost; round-5 probe: the infill fwd+bwd is ~91% of the
     B=512 nano fine-tune step, the three frozen AbNatiV forwards ~10 ms
     each).
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from hudiff_tpu.utils.compile_cache import enable_compile_cache  # noqa: E402

enable_compile_cache()

N_REP = int(os.environ.get('HUDIFF_TB_REPS', 6))


def _flops_of(compiled):
    try:
        cost = compiled.cost_analysis()
        ca = cost[0] if isinstance(cost, (list, tuple)) else cost
        return float(ca.get('flops', 0.0)) or None
    except Exception:  # noqa: BLE001 - cost analysis is best-effort
        return None


def _addback(flops, cfg, B, *, deterministic, backward):
    """Add the matmul FLOPs executed inside fused Pallas kernels — XLA's
    cost analysis reports ~0 for Mosaic custom calls, so without this a
    *more* fused stage would report a *lower* MFU (utils/flops.py)."""
    from hudiff_tpu.utils.flops import denoiser_pallas_flops, pallas_active
    if flops is None or not pallas_active():
        return flops
    return flops + denoiser_pallas_flops(
        cfg, B, kind='heavy' if NANO else 'pair',
        deterministic=deterministic, backward=backward)


def _peak():
    # bench._chip_peak_tflops needs bench's own (conditional) jax import;
    # use its table directly
    from bench import _BF16_PEAK_TFLOPS
    kind = jax.devices()[0].device_kind
    for key, peak in _BF16_PEAK_TFLOPS.items():
        if kind.startswith(key):
            return peak
    return 0.0


def _time_compiled(compiled, make_args, n_rep=N_REP):
    """Seconds/call: warm once, then n_rep calls with distinct args."""
    args = [make_args(i) for i in range(n_rep + 1)]
    jax.block_until_ready(args)
    out = compiled(*args[0])
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for i in range(n_rep):
        out = compiled(*args[i + 1])
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n_rep


def _row(dt, flops, peak, B=None):
    row = {'ms': round(dt * 1e3, 2)}
    if B:
        row['sec_per_step'] = round(dt, 4)
        row['steps_per_sec'] = round(1.0 / dt, 3)
    if flops:
        row['gflops'] = round(flops / 1e9, 1)
        tf = flops / dt / 1e12
        row['tflops_per_sec'] = round(tf, 1)
        if peak:
            row['mfu_pct'] = round(100 * tf / peak, 1)
    return row


NANO = os.environ.get('HUDIFF_TB_NANO') == '1'


def build(B, dtype=jnp.bfloat16):
    from hudiff_tpu import constants as C
    from hudiff_tpu.models.denoiser import (AntiTFNet, DenoiserConfig,
                                            NanoAntiTFNet, nano_config)
    from hudiff_tpu.training import train_step as T
    from hudiff_tpu.utils.fast_init import fast_init

    rs = np.random.RandomState(0)
    if NANO:
        cfg = nano_config()
        model = NanoAntiTFNet(cfg, dtype=dtype)
        tokens = jnp.asarray(rs.randint(0, C.N_AA, (B, C.HEAVY_LEN)),
                             jnp.int32)
        region = jnp.asarray(T.heavy_region_batch(B))
        params = fast_init(model, jax.random.PRNGKey(0), tokens[:1],
                           region[:1])
        return model, params, tokens, region, None
    cfg = DenoiserConfig()
    model = AntiTFNet(cfg, dtype=dtype)
    tokens = jnp.asarray(rs.randint(0, C.N_AA, (B, C.PAIR_LEN)), jnp.int32)
    chain = jnp.asarray(np.tile([[0, 2]], (B, 1)))
    region = jnp.asarray(T.pair_region_batch(B))
    params = fast_init(model, jax.random.PRNGKey(0), tokens[:1], region[:1],
                       chain[:1])
    return model, params, tokens, region, chain


def bench_full_step(B, peak):
    """The exact bench.py pretrain executable at batch B."""
    from hudiff_tpu.training import schedules
    from hudiff_tpu.training import train_step as T
    from hudiff_tpu.utils.config import Namespace

    model, params, tokens, region, chain = build(B)
    tx = schedules.make_optimizer(Namespace({'type': 'Adam', 'lr': 1e-4}),
                                  clip_norm=10.0)
    state = T.TrainState.create(params, tx)
    if NANO:
        step = T.make_heavy_train_step(model, donate=True)
        compiled = step.lower(state, tokens, jax.random.PRNGKey(1)).compile()
    else:
        step = T.make_pair_train_step(model, loss_type='merge', donate=True)
        compiled = step.lower(state, tokens, chain,
                              jax.random.PRNGKey(1)).compile()
    flops = _addback(_flops_of(compiled), model.cfg, B,
                     deterministic=False, backward=True)
    # donated state chains call->call; vary rng per call
    holder = {'state': state}

    def call(rng):
        if NANO:
            holder['state'], m = compiled(holder['state'], tokens, rng)
        else:
            holder['state'], m = compiled(holder['state'], tokens, chain, rng)
        return m['loss']

    wrapped_compiled = call
    dt = _time_compiled(lambda *a: wrapped_compiled(*a),
                        lambda i: (jax.random.fold_in(jax.random.PRNGKey(2), i),))
    return _row(dt, flops, peak, B=B)


def bench_parts(B, peak):
    """Forward / forward+backward / dropout / PRNG decomposition at one B."""
    from hudiff_tpu.ops import losses, masking
    from hudiff_tpu import constants as C

    model, params, tokens, region, chain = build(B)
    if NANO:
        cdr_row = jnp.asarray(C.HEAVY_CDR_INDEX)
        cdr_mask = jnp.broadcast_to(cdr_row != 0, tokens.shape)
        protected = cdr_mask
    else:
        cdr_row = jnp.concatenate([jnp.asarray(C.HEAVY_CDR_INDEX),
                                   jnp.asarray(C.LIGHT_CDR_INDEX)])
        cdr_mask = jnp.broadcast_to(cdr_row != 0, tokens.shape)
        protected = masking.pair_protected_mask(tokens, cdr_row)
    cor = masking.corrupt(jax.random.PRNGKey(3), tokens, protected)
    src, mask = cor.src, cor.mask

    # Train-mode routing with dropout genuinely off: rate-0 dropout under
    # deterministic=False (rate==0 short-circuits, no rng draw). Flipping
    # ``deterministic`` instead would also flip conv_pallas_policy's kernel
    # routing on the d=768 towers and contaminate the dropout-tax
    # subtraction with a kernel-path change.
    import dataclasses
    model_nodrop = type(model)(dataclasses.replace(model.cfg, dropout=0.0),
                               dtype=jnp.bfloat16)

    def make_loss(mod, deterministic):
        def loss_fn(params, rng_drop):
            kw = {} if deterministic else {'rngs': {'dropout': rng_drop}}
            margs = (src, region) if NANO else (src, region, chain)
            logits = mod.apply(params, *margs,
                               deterministic=deterministic, **kw)
            m = losses.pair_oardm_loss(logits, tokens, mask, cdr_mask)
            return m['ce'] + m['cdr_ce']
        return loss_fn

    def make_vg(mod, deterministic):
        loss_fn = make_loss(mod, deterministic)

        def vg(p, r):
            loss, grads = jax.value_and_grad(
                lambda q: loss_fn(q, r))(p)
            return loss, jax.tree_util.tree_reduce(
                lambda a, g: a + jnp.sum(g.astype(jnp.float32) ** 2),
                grads, 0.0)
        return vg

    out = {}
    cfg = model.cfg

    def run(tag, fn, seed, *, det, bwd):
        c = jax.jit(fn).lower(params, jax.random.PRNGKey(0)).compile()
        out[tag] = _row(
            _time_compiled(c, lambda i: (params, jax.random.fold_in(
                jax.random.PRNGKey(seed), i))),
            _addback(_flops_of(c), cfg, B, deterministic=det, backward=bwd),
            peak)

    # forward, eval mode (dropout off) — the sampling unit of work
    run('fwd_eval', make_loss(model, True), 4, det=True, bwd=False)
    # forward, train mode (dropout on)
    run('fwd_train', make_loss(model, False), 5, det=False, bwd=False)
    # forward+backward, train mode — grads kept alive via their global norm
    run('fwd_bwd_train', make_vg(model, False), 6, det=False, bwd=True)
    # forward+backward, train routing, dropout rate 0 — the dropout+RNG tax
    run('fwd_bwd_nodrop', make_vg(model_nodrop, False), 7, det=False,
        bwd=True)

    # forward+backward, dropout on, RBG dropout key (same Bernoulli
    # distribution, hardware RNG instead of threefry arithmetic)
    try:
        f = jax.jit(make_vg(model, False))
        rbg0 = jax.random.key(0, impl='rbg')
        c = f.lower(params, rbg0).compile()
        out['fwd_bwd_rbg'] = _row(
            _time_compiled(c, lambda i: (params, jax.random.fold_in(rbg0, i))),
            _addback(_flops_of(c), cfg, B, deterministic=False,
                     backward=True), peak)
    except Exception as e:  # noqa: BLE001 - impl availability varies
        out['fwd_bwd_rbg'] = {'error': str(e)[:200]}

    return out


def bench_stages(B, peak):
    """Per-stage fwd vs fwd+bwd: which stage's backward runs coldest."""
    from hudiff_tpu import constants as C
    from hudiff_tpu.models.denoiser import (ByteNetStack, DenoiserConfig,
                                            SelfAttNet, SplitConvTowers)

    from hudiff_tpu.models.denoiser import nano_config

    from hudiff_tpu.models.denoiser import conv_pallas_policy
    from hudiff_tpu.ops.pallas_bytenet import block_matmul_flops
    from hudiff_tpu.ops.pallas_attention import attention_matmul_flops
    from hudiff_tpu.utils.flops import pallas_active

    cfg = nano_config() if NANO else DenoiserConfig()
    length = C.HEAVY_LEN if NANO else C.PAIR_LEN
    seg_lens = (C.HEAVY_LEN,) if NANO else (C.HEAVY_LEN, C.LIGHT_LEN)
    dtype = jnp.bfloat16
    rs = np.random.RandomState(1)
    key = jax.random.PRNGKey(0)
    out = {}

    def measure(name, mod, x, needs_rng, pallas_flops=None):
        """``pallas_flops(backward)``: per-stage fused-kernel FLOP add-back
        (same rationale as _addback — the whole-model counter doesn't apply
        to an isolated stage)."""
        p = mod.init(key, x[:1])
        kw = (lambda r: {'deterministic': False, 'rngs': {'dropout': r}}) \
            if needs_rng else (lambda r: {})

        # the input varies per timed call (xin), not just the rng — the
        # dropout-free stages would otherwise present identical args to
        # the tunnel's run cache
        def fwd(p_, xin, r):
            return jnp.sum(mod.apply(p_, xin, **kw(r)).astype(jnp.float32))

        def fwd_bwd(p_, xin, r):
            loss, grads = jax.value_and_grad(
                lambda q: fwd(q, xin, r))(p_)
            return loss + jax.tree_util.tree_reduce(
                lambda a, g: a + jnp.sum(g.astype(jnp.float32) ** 2),
                grads, 0.0)

        for tag, fn, bwd in (('fwd', fwd, False), ('fwd_bwd', fwd_bwd, True)):
            c = jax.jit(fn).lower(p, x, key).compile()
            flops = _flops_of(c)
            if flops and pallas_flops and pallas_active():
                flops += pallas_flops(bwd)
            out[f'{name}_{tag}'] = _row(
                _time_compiled(c, lambda i: (
                    p, x + jnp.asarray(i * 1e-3, x.dtype),
                    jax.random.fold_in(jax.random.PRNGKey(11), i))),
                flops, peak)

    def conv_addback(d, n_layers):
        # production training routing: the stage tool measures the
        # non-deterministic trace, so wide pair towers run the XLA path
        if conv_pallas_policy('auto', d, deterministic=False) == 'never':
            return None
        return lambda bwd: sum(
            n_layers * block_matmul_flops(B, L, d, d // 2,
                                          cfg.aa_kernel_size, backward=bwd)
            for L in seg_lens)

    x256 = jnp.asarray(rs.randn(B, length, cfg.d_model), dtype)
    if NANO:
        # nano uses single ByteNet stacks, not the H/L split towers
        measure('aa_towers', ByteNetStack(
            cfg.n_encoder_layers, cfg.d_model, cfg.aa_kernel_size, cfg.r,
            activation=cfg.activation, dropout=cfg.dropout, dtype=dtype,
            use_pallas=conv_pallas_policy('auto', cfg.d_model, False)),
            x256, True, conv_addback(cfg.d_model, cfg.n_encoder_layers))
    else:
        measure('aa_towers', SplitConvTowers(
            cfg.n_encoder_layers, cfg.d_model, cfg.aa_kernel_size, cfg.r,
            cfg.activation, cfg.dropout, dtype=dtype,
            use_pallas=conv_pallas_policy('auto', cfg.d_model, False)),
            x256, True, conv_addback(cfg.d_model, cfg.n_encoder_layers))

    dual_pallas = conv_pallas_policy('auto', cfg.sum_d_model, False)
    x768 = jnp.asarray(rs.randn(B, length, cfg.sum_d_model), dtype)
    if NANO:
        measure('dual_towers', ByteNetStack(
            cfg.dual_layers, cfg.sum_d_model, cfg.aa_kernel_size, cfg.r,
            activation='gelu', dropout=cfg.dropout, dtype=dtype,
            use_pallas=dual_pallas), x768, True,
            conv_addback(cfg.sum_d_model, cfg.dual_layers))
    else:
        measure('dual_towers', SplitConvTowers(
            cfg.dual_layers, cfg.sum_d_model, cfg.aa_kernel_size, cfg.r,
            'relu', cfg.dropout, dtype=dtype, use_pallas=dual_pallas),
            x768, True, conv_addback(cfg.sum_d_model, cfg.dual_layers))

    head_dim = cfg.att_model // cfg.nhead
    measure('self_att', SelfAttNet(
        cfg.sum_d_model, cfg.att_model, cfg.dim_feedforward, cfg.nhead,
        cfg.max_len, cfg.cs_layers, dtype=dtype), x768, False,
        lambda bwd: 2 * cfg.cs_layers * attention_matmul_flops(
            B, cfg.max_len, cfg.nhead, head_dim, backward=bwd))
    return out


def main():
    peak = _peak()
    result = {'device': jax.devices()[0].device_kind,
              'stack': 'nano' if NANO else 'pair',
              'bf16_peak_tflops': peak, 'n_rep': N_REP}

    sections = os.environ.get('HUDIFF_TB_SECTIONS',
                              'sweep,parts,stages').split(',')
    if 'sweep' in sections:
        sweep = [int(b) for b in os.environ.get(
            'HUDIFF_TB_SWEEP', '128,256,512').split(',') if b]
        result['step_sweep'] = {}
        for b in sweep:
            result['step_sweep'][str(b)] = bench_full_step(b, peak)
            print(f'step B={b}: {json.dumps(result["step_sweep"][str(b)])}',
                  file=sys.stderr, flush=True)

    parts_b = int(os.environ.get('HUDIFF_TB_PARTS_B', 128))
    if 'parts' in sections:
        result['parts_B%d' % parts_b] = bench_parts(parts_b, peak)
        print(f'parts: {json.dumps(result["parts_B%d" % parts_b])}',
              file=sys.stderr, flush=True)

    if 'stages' in sections:
        result['stages_B%d' % parts_b] = bench_stages(parts_b, peak)
    print(json.dumps(result, indent=2))


if __name__ == '__main__':
    main()
