"""Benchmark: batched antibody humanization throughput on one chip.

Metric: humanized candidate sequences per second on the full-size HuDiff-Ab
denoiser, running the complete reverse OA-ARDM process (185 framework
positions, one full 291-token forward per position) per candidate.

Baseline: the reference samples sequentially from Python — one host-dispatched
forward per position at batch size 1 (antibody_scripts/sample.py:499-513,
default --batch_size 1). The reference repo publishes no numbers (BASELINE.md),
so the baseline here is that exact loop structure with the same model weights
on the same chip; ``vs_baseline`` is the speedup of the single fused
lax.scan program over it.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} — ALWAYS,
even when the device tunnel is down (round-3 lesson: BENCH_r03 recorded
rc=1/parsed=null because the first jax.devices() raised). Resilience layers:

- supervisor mode (the default entry): re-runs this script as a subprocess
  with a hard timeout and retries on failure/hang — a fresh process gets a
  fresh backend-init attempt — and on final failure prints an error JSON
  itself, so stdout can never end without a parseable line;
- the inner run retries ``jax.devices()`` in-process with backoff (jax only
  caches *successful* backend init, so a raise is retryable) and wraps the
  whole bench in a try/except that emits whatever partial results exist.
"""
import json
import os
import sys
import time

import numpy as np

_IS_INNER = os.environ.get('HUDIFF_BENCH_INNER') == '1'
_IS_CHILD = len(sys.argv) > 2 and sys.argv[1] == '--child-json'

if _IS_INNER or _IS_CHILD:
    import jax
    import jax.numpy as jnp

    from hudiff_tpu.utils.compile_cache import enable_compile_cache

    # Compiles on the tunnel run minutes; the persistent cache makes the
    # driver's bench run hit warm executables from the pre-warm run.
    enable_compile_cache()


# bf16 peak TFLOP/s per chip for MFU accounting (public spec sheets).
_BF16_PEAK_TFLOPS = {
    'TPU v4': 275.0,
    'TPU v5 lite': 197.0,    # v5e
    'TPU v5e': 197.0,
    'TPU v5': 459.0,         # v5p
    'TPU v5p': 459.0,
    'TPU v6 lite': 918.0,    # v6e / Trillium
    'TPU v6e': 918.0,
}


_T0 = time.perf_counter()


def _log(msg: str) -> None:
    """Elapsed-stamped progress on stderr (stdout carries only the JSON)."""
    print(f'[bench +{time.perf_counter() - _T0:7.1f}s] {msg}',
          file=sys.stderr, flush=True)


# Partial results accumulate here as sections complete; any failure path
# emits whatever is present so one wedged section degrades the JSON
# instead of erasing it.
_RESULT = {
    'metric': 'ab_humanization_throughput',
    'value': 0.0,
    'unit': 'seqs/sec/chip',
    'vs_baseline': 0.0,
    'detail': {},
}
_EMITTED = False


def _emit_result(error: str = None) -> None:
    global _EMITTED
    if _EMITTED:
        return
    _EMITTED = True
    if error:
        _RESULT['error'] = error[:500]
    print(json.dumps(_RESULT), flush=True)


def _init_devices_with_retry(attempts: int = 3, backoff: float = 60.0):
    """jax.devices() with retry: backend init failures raise WITHOUT caching
    (xla_bridge.backends() early-returns only when _backends is populated),
    so a later call re-attempts the tunnel handshake."""
    last = None
    for i in range(attempts):
        try:
            return jax.devices()
        except Exception as e:  # noqa: BLE001 - any backend init error
            last = e
            _log(f'backend init attempt {i + 1}/{attempts} failed: '
                 f'{str(e)[:200]}')
            if i + 1 < attempts:
                _log(f'retrying in {backoff:.0f}s')
                time.sleep(backoff)
    raise last


def _chip_peak_tflops() -> float:
    kind = jax.devices()[0].device_kind
    for key, peak in _BF16_PEAK_TFLOPS.items():
        if kind.startswith(key):
            return peak
    return 0.0


def _compiled_flops(compiled):
    """FLOP count from XLA cost analysis of a compiled executable."""
    try:
        cost = compiled.cost_analysis()
        if cost:
            ca = cost[0] if isinstance(cost, (list, tuple)) else cost
            flops = float(ca.get('flops', 0.0))
            return flops or None
    except Exception:  # noqa: BLE001 - cost analysis is best-effort
        pass
    return None


def _denoiser_step_flops(compiled, cfg, B: int, kind: str):
    """cost_analysis flops + the matmul FLOPs XLA cannot see inside the
    fused Pallas kernels (utils/flops.py — cost analysis reports ~0 for
    Mosaic custom calls, so without the add-back a *more* fused step would
    report a *lower* MFU). Train-step accounting: non-deterministic trace,
    fwd+bwd."""
    flops = _compiled_flops(compiled)
    if flops is None:
        return None
    from hudiff_tpu.utils.flops import denoiser_pallas_flops, pallas_active
    if pallas_active():
        flops += denoiser_pallas_flops(cfg, B, kind=kind,
                                       deterministic=False, backward=True)
    return flops


def _rate_fields(out: dict, B: int, dt: float, flops) -> dict:
    out.update({'batch': B, 'steps_per_sec': round(1.0 / dt, 3),
                'seqs_per_sec': round(B / dt, 1),
                'sec_per_step': round(dt, 4)})
    if flops:
        tflops = flops / dt / 1e12
        out['tflops'] = round(tflops, 1)
        peak = _chip_peak_tflops()
        if peak:
            out['mfu_pct'] = round(100.0 * tflops / peak, 1)
            out['chip_bf16_peak_tflops'] = peak
    return out


def _pretrain_prepare(B: int):
    """Build + compile the steady-state fused pretrain step (corrupt + fwd +
    bwd + Adam) on the flagship AntiTFNet. Returns everything the timed
    phase needs; no timed device work happens here."""
    from hudiff_tpu import constants as C
    from hudiff_tpu.models.denoiser import AntiTFNet, DenoiserConfig
    from hudiff_tpu.training import schedules
    from hudiff_tpu.training import train_step as T
    from hudiff_tpu.utils.config import Namespace

    if os.environ.get('HUDIFF_BENCH_TINY') == '1':
        # smoke-test knob: tiny config so the full child path (compile +
        # timed loop + fed pipeline) runs in seconds on CPU in CI
        cfg = DenoiserConfig(d_embedding=32, d_model=32, n_encoder_layers=1,
                             r=16, s_model=32, r_model=32, n_pos_model=32,
                             sum_d_model=96, dual_layers=1, att_model=32,
                             dim_feedforward=32, nhead=2, cs_layers=1)
    else:
        cfg = DenoiserConfig()
    model = AntiTFNet(cfg, dtype=jnp.bfloat16)
    rs = np.random.RandomState(0)
    tokens = jnp.asarray(rs.randint(0, C.N_AA, (B, C.PAIR_LEN)), jnp.int32)
    chain = jnp.asarray(np.tile([[0, 2]], (B, 1)))
    region = jnp.asarray(T.pair_region_batch(1))
    from hudiff_tpu.utils.fast_init import fast_init
    params = fast_init(model, jax.random.PRNGKey(0), tokens[:1], region,
                       chain[:1])
    tx = schedules.make_optimizer(
        Namespace({'type': 'Adam', 'lr': 1e-4}), clip_norm=10.0)
    state = T.TrainState.create(params, tx)
    # donate=True: state buffers update in place, as the real train loop runs
    step = T.make_pair_train_step(model, loss_type='merge', donate=True)

    rng = jax.random.PRNGKey(1)
    _log('pretrain: init done, lowering')
    # ONE compile: the same executable provides the FLOP count (XLA cost
    # analysis) and runs the timed steps.
    compiled = step.lower(state, tokens, chain, rng).compile()
    _log('pretrain: compile done')
    return {'compiled': compiled, 'state': state, 'tokens': tokens,
            'chain': chain, 'rng': rng, 'B': B,
            'flops': _denoiser_step_flops(compiled, cfg, B, 'pair')}


def _pretrain_timed(prep, gate_timed_out: bool):
    """Warm + timed pretrain steps and the fed-pipeline section.
    The TrainState chains output->input, so the axon run-cache cannot
    short-circuit repeated calls."""
    compiled, tokens, chain = prep['compiled'], prep['tokens'], prep['chain']
    state, rng, B = prep['state'], prep['rng'], prep['B']
    state, m = compiled(state, tokens, chain, rng)  # warm
    jax.block_until_ready(m['loss'])
    _log('pretrain: timed loop start')
    n_rep = 5
    # distinct rng per step: donated state buffers keep the same device
    # handles across calls, which the tunnel's run cache can key on —
    # varying an argument forces real execution every step
    rngs = [jax.random.fold_in(rng, i) for i in range(n_rep)]
    jax.block_until_ready(rngs)
    t0 = time.perf_counter()
    for i in range(n_rep):
        state, m = compiled(state, tokens, chain, rngs[i])
    jax.block_until_ready(m['loss'])
    dt = (time.perf_counter() - t0) / n_rep

    out = _rate_fields({}, B, dt, prep['flops'])
    if gate_timed_out:
        out['gate_timeout'] = True  # may have shared the chip with the parent

    # fed-pipeline measurement: same compiled step, but batches arrive
    # through the real input path (RecordStore -> batch_iterator ->
    # device_feed) instead of living on-device. The reference burns
    # DataLoader worker processes on exactly this path
    # (antibody_scripts/antibody_train.py:383-396); the honest claim is the
    # FED rate and its fraction of the synthetic rate, not the synthetic
    # rate alone (round-3 VERDICT weak #6).
    try:
        _log('pretrain: fed-pipeline section start')
        out['fed'] = _bench_fed_pipeline(compiled, state, B, dt)
    except Exception as e:  # noqa: BLE001 - degrade, don't erase the rest
        out['fed'] = {'error': str(e)[:200]}
    return out


def _nano_finetune_prepare(B: int):
    """Build + compile the Nb framework fine-tune step — the reference's
    most intricate hot path: masked infill forward with Gumbel
    straight-through, static-shape IMGT->AHo transfer, THREE frozen AbNatiV
    transformer forwards (VH new, VHH old, VHH new), CDR CE, and the
    backward through all of it (nanobody_scripts/nanofinetune.py:62-199;
    round-4 VERDICT next #3). B=512 per configs/nano_finetune.yml."""
    from hudiff_tpu import constants as C
    from hudiff_tpu.models import abnativ as AB
    from hudiff_tpu.models.denoiser import NanoAntiTFNet, nano_config
    from hudiff_tpu.models.finetune import (NanoFinetuneConfig,
                                            make_nano_finetune_loss)
    from hudiff_tpu.training import finetune as FT
    from hudiff_tpu.training import schedules
    from hudiff_tpu.training import train_step as T
    from hudiff_tpu.utils.config import Namespace
    from hudiff_tpu.utils.fast_init import fast_init

    tiny = os.environ.get('HUDIFF_BENCH_TINY') == '1'
    cfg = nano_config().test_size() if tiny else nano_config()
    infill = NanoAntiTFNet(cfg, dtype=jnp.bfloat16)
    src = jnp.zeros((1, C.HEAVY_LEN), jnp.int32)
    region = jnp.broadcast_to(jnp.asarray(C.HEAVY_REGION_INDEX),
                              (1, C.HEAVY_LEN))
    params = fast_init(infill, jax.random.PRNGKey(0), src, region)

    # frozen scorers at the released checkpoints' full hparams (random
    # weights cost the same FLOPs/bytes as trained ones)
    hp = None if tiny else AB.AbNatiVParams()
    vh_model, vh_vars = FT.load_abnativ(None, straight_through=False,
                                        rng=jax.random.PRNGKey(1), hp=hp)
    vhh_model, vhh_vars = FT.load_abnativ(None, straight_through=False,
                                          rng=jax.random.PRNGKey(2), hp=hp)
    loss_fn = make_nano_finetune_loss(infill, vh_model, vh_vars,
                                      NanoFinetuneConfig(), vhh_model,
                                      vhh_vars)
    step, _ = FT.make_nano_finetune_fns(infill, loss_fn,
                                        jnp.asarray(C.HEAVY_CDR_INDEX),
                                        reconstruct=False, recon_weight=1e-3)
    tx = schedules.make_optimizer(
        Namespace({'type': 'Adam', 'lr': 1e-5}), clip_norm=10.0)
    state = T.TrainState.create(params, tx)

    batch = next(FT.synthetic_nano_batches(B, seed=5))
    tokens = jnp.asarray(batch['tokens'])
    aho = jnp.asarray(batch['aho'])
    rng = jax.random.PRNGKey(3)
    _log('nano-finetune: init done, lowering')
    compiled = step.lower(state, tokens, aho, rng).compile()
    _log('nano-finetune: compile done')
    return {'compiled': compiled, 'state': state, 'tokens': tokens,
            'aho': aho, 'rng': rng, 'B': B,
            'flops': _denoiser_step_flops(compiled, cfg, B, 'heavy')}


def _nano_finetune_timed(prep, gate_timed_out: bool):
    compiled, tokens, aho = prep['compiled'], prep['tokens'], prep['aho']
    state, rng, B = prep['state'], prep['rng'], prep['B']
    state, m = compiled(state, tokens, aho, rng)  # warm
    jax.block_until_ready(m['loss'])
    _log('nano-finetune: timed loop start')
    n_rep = 5
    rngs = [jax.random.fold_in(rng, i) for i in range(n_rep)]
    jax.block_until_ready(rngs)
    t0 = time.perf_counter()
    for i in range(n_rep):
        state, m = compiled(state, tokens, aho, rngs[i])
    jax.block_until_ready(m['loss'])
    dt = (time.perf_counter() - t0) / n_rep
    out = _rate_fields({}, B, dt, prep['flops'])
    if gate_timed_out:
        out['gate_timeout'] = True
    return out


def _wait_gate() -> bool:
    """Child-side gate: compiles overlap the parent's, but warm + timed
    steps wait until the parent has finished ITS timed sections, so the two
    throughput measurements never share the chip. (The child's pre-compile
    device work — init + optimizer init, a few seconds at process start —
    is not gated; it lands minutes before the parent's timed window on
    every measured profile.) Bounded poll (a dead parent must not hang the
    child) slightly longer than the parent's kill budget; if the fallback
    fires, the results are flagged so a potentially-contended measurement
    is visible. Returns True when the gate timed out."""
    gate = os.environ.get('HUDIFF_BENCH_GATE')
    if not gate:
        return False
    _log('child: compiled, waiting on gate')
    budget = int(os.environ.get('HUDIFF_BENCH_TRAIN_TIMEOUT', 1500))
    deadline = time.time() + budget + 120
    while not os.path.exists(gate) and time.time() < deadline:
        time.sleep(0.5)
    return not os.path.exists(gate)


def child_main(train_b: int, ft_b: int) -> dict:
    """Concurrent-child entry: compile the pretrain and nano fine-tune
    steps (overlapping the parent's sampling compiles), then run both
    timed phases after the parent releases the gate."""
    out = {}
    pre = ft = None
    if train_b:
        try:
            pre = _pretrain_prepare(train_b)
        except Exception as e:  # noqa: BLE001 - degrade per-section
            out['pretrain_step'] = {'error': str(e)[:200]}
    else:
        out['pretrain_step'] = {'skipped': True}
    if ft_b:
        try:
            ft = _nano_finetune_prepare(ft_b)
        except Exception as e:  # noqa: BLE001 - degrade per-section
            out['nano_finetune_step'] = {'error': str(e)[:200]}
    else:
        out['nano_finetune_step'] = {'skipped': True}
    gate_timed_out = _wait_gate()
    if pre is not None:
        try:
            out['pretrain_step'] = _pretrain_timed(pre, gate_timed_out)
        except Exception as e:  # noqa: BLE001 - degrade per-section
            out['pretrain_step'] = {'error': str(e)[:200]}
    if ft is not None:
        try:
            out['nano_finetune_step'] = _nano_finetune_timed(ft,
                                                             gate_timed_out)
        except Exception as e:  # noqa: BLE001 - degrade per-section
            out['nano_finetune_step'] = {'error': str(e)[:200]}
    return out


def _bench_fed_pipeline(compiled, state, B: int, synth_dt: float,
                        n_steps: int = 50):
    """Drive the compiled train step from the real host input pipeline.

    Builds a throwaway RecordStore of synthetic-but-well-formed pair grids
    (pad sprinkling like real IMGT grids), then times ``n_steps`` where each
    batch flows store -> pair_batch collate -> prefetch thread -> device_put
    -> step. Reports the fed rate and its fraction of the synthetic
    (device-resident) rate; the gap is input stall."""
    import shutil
    import tempfile

    from hudiff_tpu import constants as C
    from hudiff_tpu.data import oas as D
    from hudiff_tpu.data import store as RS
    from hudiff_tpu.data.pipeline import device_feed
    from hudiff_tpu.tokenizer import Tokenizer

    tok = Tokenizer()
    light_len = C.PAIR_LEN - C.HEAVY_LEN
    rs_ = np.random.RandomState(7)
    tmp = tempfile.mkdtemp(prefix='hudiff_fedbench_')
    try:
        store_path = os.path.join(tmp, 'store')
        n_rec = 4096
        with RS.RecordStoreWriter(store_path) as w:
            for _ in range(n_rec):
                h = rs_.randint(0, C.N_AA, C.HEAVY_LEN)
                l = rs_.randint(0, C.N_AA, light_len)
                h[rs_.rand(C.HEAVY_LEN) < 0.2] = C.IDX_PAD
                l[rs_.rand(light_len) < 0.2] = C.IDX_PAD
                w.put_obj({'h_pad_seq': tok.idx2seq_pad(h),
                           'l_pad_seq': tok.idx2seq_pad(l),
                           'h_type': 'H', 'l_type': 'K'})
        store = RS.RecordStore(store_path)
        it = D.batch_iterator(store, np.arange(n_rec), B, D.pair_batch,
                              seed=3)
        feed = device_feed(it, prefetch_size=2)
        rng = jax.random.PRNGKey(11)
        rngs = [jax.random.fold_in(rng, i) for i in range(n_steps + 2)]
        jax.block_until_ready(rngs)
        m = None
        for i in range(2):  # warm host-transfer layouts + prefetch queue
            b = next(feed)
            state, m = compiled(state, b['tokens'], b['chain_type'], rngs[i])
        jax.block_until_ready(m['loss'])
        t0 = time.perf_counter()
        for i in range(n_steps):
            b = next(feed)
            state, m = compiled(state, b['tokens'], b['chain_type'],
                                rngs[2 + i])
        jax.block_until_ready(m['loss'])
        fed_dt = (time.perf_counter() - t0) / n_steps
        return {
            'steps_per_sec': round(1.0 / fed_dt, 3),
            'seqs_per_sec': round(B / fed_dt, 1),
            'sec_per_step': round(fed_dt, 4),
            'n_steps': n_steps,
            'records': n_rec,
            # 1.0 = no input stall; <1 means the host pipeline is behind
            'of_synthetic_rate': round(synth_dt / fed_dt, 3),
        }
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def main():
    from hudiff_tpu import constants as C
    from hudiff_tpu.models.denoiser import AntiTFNet, DenoiserConfig
    from hudiff_tpu.sampling import sampler as S

    # training-side workloads (round-2 VERDICT weak #4 and round-4 next #3:
    # pretrain AND nano fine-tune throughput/MFU belong in the
    # driver-captured bench, not in docs prose). The train steps' compiles
    # are minutes on the tunnel and their pace varies, so they run in a
    # CONCURRENT subprocess (two processes share the tunnel chip): their
    # compiles overlap the sampling sections', and a hard timeout on the
    # remaining wait means a hung compile degrades the detail field instead
    # of eating the headline sampling metric. HUDIFF_BENCH_TRAIN_B=0 /
    # HUDIFF_BENCH_FT_B=0 skip them; HUDIFF_BENCH_TRAIN_TIMEOUT bounds the
    # total wait (default 1500 s).
    train_b = int(os.environ.get('HUDIFF_BENCH_TRAIN_B', 128))
    ft_b = int(os.environ.get('HUDIFF_BENCH_FT_B', 512))
    train_proc = None
    gate_path = None
    if train_b or ft_b:
        import subprocess
        import sys
        import tempfile
        gate_path = os.path.join(tempfile.mkdtemp(prefix='hudiff_bench_'),
                                 'gate')
        env = dict(os.environ, HUDIFF_BENCH_GATE=gate_path)
        # child progress lines land in the parent's stderr stream (stdout
        # stays clean: it carries only the child's JSON)
        train_proc = subprocess.Popen(
            [sys.executable, os.path.abspath(__file__),
             '--child-json', str(train_b), str(ft_b)],
            stdout=subprocess.PIPE, stderr=None, text=True, env=env)
        # if the parent dies mid-sampling (OOM, tunnel error), never leave
        # the child holding the chip for a driver retry to contend with
        import atexit

        def _reap():
            if train_proc.poll() is None:
                train_proc.kill()
                train_proc.communicate()
        atexit.register(_reap)
    bench_t0 = time.perf_counter()

    # watchdog: a wedged device tunnel hangs the first backend touch
    # inside a C call no signal can interrupt — at least say so on stderr
    # instead of timing out silently
    import threading
    _devices_up = threading.Event()

    def _watchdog():
        if not _devices_up.wait(120):
            _log('WARNING: backend/device init not complete after 120s — '
                 'device tunnel unresponsive?')
    threading.Thread(target=_watchdog, daemon=True).start()
    _init_devices_with_retry(
        attempts=int(os.environ.get('HUDIFF_BENCH_INIT_RETRIES', 3)),
        backoff=float(os.environ.get('HUDIFF_BENCH_INIT_BACKOFF', 60)))
    _devices_up.set()
    _log(f'devices up: {jax.devices()[0].device_kind}')
    _RESULT['detail']['device_kind'] = jax.devices()[0].device_kind

    cfg = DenoiserConfig()  # full-size flagship
    model = AntiTFNet(cfg, dtype=jnp.bfloat16)

    # Candidate batch: the free throughput axis. Measured on v5e with the
    # merged-QKV in-kernel-RoPE attention (round 2 sweep): B=64: 25.3,
    # B=128: 24.2, B=256: 23.0, B=384: 23.6 seqs/sec — the forward is
    # compute-saturated (~70 TFLOP/s) from B≈16, so 64 is the sweet spot
    # (same throughput, 4x lower per-round latency and memory). (The XLA
    # attention path peaks at 8.2 and OOMs at B=512 on the materialized
    # [B,H,L,L] probs.)
    B = int(os.environ.get('HUDIFF_BENCH_B', 64))
    region_row = np.concatenate([C.HEAVY_REGION_INDEX, C.LIGHT_REGION_INDEX])
    region = jnp.asarray(np.broadcast_to(region_row, (B, C.PAIR_LEN)).copy())
    chain = jnp.asarray(np.tile([[0, 2]], (B, 1)))

    cdr = np.concatenate([C.HEAVY_CDR_INDEX, C.LIGHT_CDR_INDEX])
    fr_positions = np.nonzero(cdr == 0)[0]
    K = len(fr_positions)

    rs = np.random.RandomState(0)
    tokens = rs.randint(0, C.N_AA, (B, C.PAIR_LEN)).astype(np.int32)
    tokens[:, fr_positions] = C.IDX_MSK
    tokens = jnp.asarray(tokens)

    from hudiff_tpu.utils.fast_init import fast_init
    _log('sampling: init start')
    params = fast_init(model, jax.random.PRNGKey(0), tokens[:1], region[:1],
                       chain[:1])
    jax.block_until_ready(params)
    _log('sampling: init done')
    order = S.build_order(fr_positions, B, rng=jax.random.PRNGKey(1))

    run = S.make_jit_sampler(model, params)
    # compile
    jax.block_until_ready(run(tokens, region, chain, order, jax.random.PRNGKey(2)))
    _log('sampling: scan compile+warm done')
    # timed runs
    n_rep = 3
    t0 = time.perf_counter()
    for i in range(n_rep):
        out = run(tokens, region, chain, order, jax.random.PRNGKey(3 + i))
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n_rep
    throughput = B / dt
    _log('sampling: timed runs done')
    # partial result: a later section failing must not erase this number
    _RESULT['value'] = round(throughput, 3)
    _RESULT['detail'].update({'batch': B, 'positions': K,
                              'scan_sec_per_batch': round(dt, 4)})

    # reference-style baseline: sequential host loop, batch 1. MEDIAN of 3
    # full runs — the denominator of the headline multiplier was the noisy
    # part of every prior round (round-4 VERDICT next #7: 7.75 vs 9.80 s/seq
    # across runs of the same loop), so stabilize it and quote one value.
    seq_run = S.sequential_reference_sampler(model, params)
    t1 = jnp.asarray(np.asarray(tokens[:1]))
    seq_order = order[:1]
    seq_run(t1, region[:1], chain[:1], seq_order[:, :4], jax.random.PRNGKey(0))  # warm
    seq_times = []
    for i in range(3):
        t0 = time.perf_counter()
        seq_run(t1, region[:1], chain[:1], seq_order, jax.random.PRNGKey(5 + i))
        seq_times.append(time.perf_counter() - t0)
    baseline_dt = float(np.median(seq_times))
    baseline_throughput = 1.0 / baseline_dt
    _log(f'baseline: done (3 runs: {[round(t, 2) for t in seq_times]})')
    _RESULT['vs_baseline'] = round(throughput / baseline_throughput, 2)
    _RESULT['detail'].update({
        'sequential_sec_per_seq': round(baseline_dt, 4),
        'sequential_sec_per_seq_runs': [round(t, 4) for t in seq_times],
    })

    # nanobody humanization throughput (round-4 VERDICT next #3): flagship
    # HuDiff-Nb, full reverse process over the heavy-grid FR positions
    # (nanosample.py:318-329 is the reference loop being replaced)
    try:
        _RESULT['detail']['nano_sampling'] = _bench_nano_sampling()
    except Exception as e:  # noqa: BLE001 - degrade, don't erase the rest
        _RESULT['detail']['nano_sampling'] = {'error': str(e)[:200]}

    # shard_map+pallas TP composition on real silicon (round-4 VERDICT next
    # #5): a mesh-(1,1) forced shard_map must produce the unsharded result
    # and compile under the real TPU toolchain, not just CPU interpret mode
    try:
        _RESULT['detail']['tp_shard_map_smoke'] = _bench_tp_smoke(B)
    except Exception as e:  # noqa: BLE001 - degrade, don't erase the rest
        _RESULT['detail']['tp_shard_map_smoke'] = {'error': str(e)[:200]}

    # all timed sections done — release the child's timed loops
    if gate_path is not None:
        with open(gate_path, 'w', encoding='UTF-8') as f:
            f.write('go\n')

    # collect the concurrent train-step subprocess (launched before the
    # sampling section; see the comment there)
    if train_proc is not None:
        import subprocess
        budget = int(os.environ.get('HUDIFF_BENCH_TRAIN_TIMEOUT', 1500))
        remaining = max(10.0, budget - (time.perf_counter() - bench_t0))
        try:
            out_text, _ = train_proc.communicate(timeout=remaining)
            child = json.loads(out_text.strip().splitlines()[-1])
        except subprocess.TimeoutExpired:
            train_proc.kill()
            train_proc.communicate()
            child = {'error': f'timeout after {budget}s total'}
        except Exception as e:  # noqa: BLE001 - report, don't fail the bench
            child = {'error': str(e)[:200]}
        import shutil
        shutil.rmtree(os.path.dirname(gate_path), ignore_errors=True)
    else:
        child = {'pretrain_step': {'skipped': True},
                 'nano_finetune_step': {'skipped': True}}
    if 'error' in child and 'pretrain_step' not in child:
        child = {'pretrain_step': child, 'nano_finetune_step': child}
    _RESULT['detail'].update({
        'pretrain_step': child.get('pretrain_step', {}),
        'nano_finetune_step': child.get('nano_finetune_step', {}),
    })
    _emit_result()


def _bench_nano_sampling():
    """Nanobody humanization throughput: one fused lax.scan over the
    heavy-grid framework positions on the flagship HuDiff-Nb, batch of
    candidates per program (the exact engine NanoHumanizer drives)."""
    from hudiff_tpu import constants as C
    from hudiff_tpu.models.denoiser import NanoAntiTFNet, nano_config
    from hudiff_tpu.sampling import sampler as S
    from hudiff_tpu.utils.fast_init import fast_init

    B = int(os.environ.get('HUDIFF_BENCH_NANO_B', 64))
    model = NanoAntiTFNet(nano_config(), dtype=jnp.bfloat16)
    region = jnp.asarray(np.broadcast_to(C.HEAVY_REGION_INDEX,
                                         (B, C.HEAVY_LEN)).copy())
    fr_positions = np.nonzero(np.asarray(C.HEAVY_CDR_INDEX) == 0)[0]
    K = len(fr_positions)
    rs = np.random.RandomState(1)
    tokens = rs.randint(0, C.N_AA, (B, C.HEAVY_LEN)).astype(np.int32)
    tokens[:, fr_positions] = C.IDX_MSK
    tokens = jnp.asarray(tokens)
    _log('nano sampling: init start')
    params = fast_init(model, jax.random.PRNGKey(0), tokens[:1], region[:1])
    jax.block_until_ready(params)
    order = S.build_order(fr_positions, B, rng=jax.random.PRNGKey(1))
    run = S.make_jit_sampler(model, params, has_chain_type=False)
    jax.block_until_ready(run(tokens, region, order, jax.random.PRNGKey(2)))
    _log('nano sampling: scan compile+warm done')
    n_rep = 3
    t0 = time.perf_counter()
    for i in range(n_rep):
        out = run(tokens, region, order, jax.random.PRNGKey(3 + i))
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n_rep
    _log('nano sampling: timed runs done')
    return {'batch': B, 'positions': K,
            'scan_sec_per_batch': round(dt, 4),
            'seqs_per_sec': round(B / dt, 1)}


def _bench_tp_smoke(B: int):
    """mesh-(1,1) forced shard_map around the fused Pallas attention kernel
    on the REAL toolchain: proves the composition GSPMD cannot partition
    (ops/pallas_attention.py:361-405) compiles and runs on silicon, and that
    it matches the unsharded kernel bit-for-bit at tp=1. tp>1 silicon is
    unavailable on the one-chip tunnel; the dp*tp>1 execution evidence stays
    the virtual-mesh dryrun (docs/perf.md documents the split)."""
    from jax.sharding import Mesh

    from hudiff_tpu import constants as C
    from hudiff_tpu.ops import pallas_attention as PA
    from hudiff_tpu.ops.rope import rope_tables

    heads, head_dim, L = 8, 64, C.PAIR_LEN  # flagship attention shape
    scale = 1.0 / float(np.sqrt(head_dim))
    rs = np.random.RandomState(3)
    qkv = jnp.asarray(rs.randn(B, L, heads * 3 * head_dim), jnp.bfloat16)
    cos, sin = rope_tables(head_dim, L)
    mesh = Mesh(np.asarray(jax.devices()[:1]).reshape(1, 1),
                ('data', 'model'))

    def tp_fn(x):
        return PA.rope_attention_qkv_tp(x, cos, sin, scale, heads, mesh,
                                        force=True)

    f_tp = jax.jit(tp_fn)
    f_ref = jax.jit(lambda x: PA.rope_attention_qkv(x, cos, sin, scale,
                                                    heads))
    out_tp = jax.block_until_ready(f_tp(qkv))
    out_ref = jax.block_until_ready(f_ref(qkv))
    max_err = float(jnp.max(jnp.abs(out_tp.astype(jnp.float32)
                                    - out_ref.astype(jnp.float32))))
    _log('tp smoke: compile + equality check done')
    n_rep = 10
    # vary the input each rep: the tunnel's run cache keys on (executable,
    # args) and would otherwise short-circuit repeats. n_rep+1 distinct
    # inputs so BOTH loops warm on an input their timed reps never reuse
    qkvs = [qkv + jnp.bfloat16((i + 1) * 1e-3) for i in range(n_rep + 1)]
    jax.block_until_ready(qkvs)
    jax.block_until_ready(f_tp(qkvs[n_rep]))
    t0 = time.perf_counter()
    for i in range(n_rep):
        out = f_tp(qkvs[i])
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n_rep
    jax.block_until_ready(f_ref(qkvs[n_rep]))
    t0 = time.perf_counter()
    for i in range(n_rep):
        out = f_ref(qkvs[i])
    jax.block_until_ready(out)
    dt_ref = (time.perf_counter() - t0) / n_rep
    _log('tp smoke: timed done')
    return {'batch': B, 'heads': heads, 'mesh': [1, 1],
            'max_abs_err_vs_unsharded': max_err,
            'sec_per_call': round(dt, 6),
            'unsharded_sec_per_call': round(dt_ref, 6),
            'ok': bool(max_err == 0.0)}


def supervise() -> None:
    """Re-run this script as an inner subprocess with a hard timeout and
    retry. A wedged device tunnel hangs the first backend touch inside a C
    call no signal can interrupt in-process — but the supervisor CAN kill
    the whole process group and try again with a fresh backend. Guarantees
    exactly one JSON line on stdout no matter what the environment does."""
    import signal
    import subprocess

    attempts = int(os.environ.get('HUDIFF_BENCH_ATTEMPTS', 2))
    # generous per-attempt budget: cold tunnel compiles run minutes each
    # (five distinct programs since round 5: ab scan, nano scan, tp smoke,
    # pretrain step, nano fine-tune step — the persistent compile cache
    # makes warm reruns fast, but the cold path must fit one attempt)
    attempt_timeout = float(os.environ.get('HUDIFF_BENCH_ATTEMPT_TIMEOUT',
                                           2700))
    last_error = 'no attempts ran'
    for i in range(attempts):
        _log(f'supervisor: attempt {i + 1}/{attempts} '
             f'(timeout {attempt_timeout:.0f}s)')
        env = dict(os.environ, HUDIFF_BENCH_INNER='1')
        # new session: on timeout, kill the whole group (the inner spawns a
        # pretrain child; SIGKILL on the inner alone would orphan it on the
        # chip, poisoning the retry)
        proc = subprocess.Popen(
            [sys.executable, os.path.abspath(__file__)],
            stdout=subprocess.PIPE, stderr=None, text=True, env=env,
            start_new_session=True)
        try:
            out_text, _ = proc.communicate(timeout=attempt_timeout)
        except subprocess.TimeoutExpired:
            _log(f'supervisor: attempt {i + 1} hung past '
                 f'{attempt_timeout:.0f}s, killing process group')
            try:
                os.killpg(proc.pid, signal.SIGKILL)
            except OSError:
                proc.kill()
            proc.communicate()
            last_error = f'attempt hung past {attempt_timeout:.0f}s'
            continue
        lines = [l for l in (out_text or '').strip().splitlines() if l]
        if lines:
            try:
                parsed = json.loads(lines[-1])
            except ValueError:
                last_error = f'unparseable inner stdout: {lines[-1][:200]}'
                continue
            if proc.returncode == 0 or 'metric' in parsed:
                print(json.dumps(parsed), flush=True)
                return
            last_error = str(parsed.get('error', f'rc={proc.returncode}'))
        else:
            last_error = f'inner exited rc={proc.returncode} with no output'
        _log(f'supervisor: attempt {i + 1} failed: {last_error[:200]}')
    _emit_result(error=f'all {attempts} attempts failed; last: {last_error}')


if __name__ == '__main__':
    if _IS_CHILD:
        try:
            ft_arg = int(sys.argv[3]) if len(sys.argv) > 3 else 0
            print(json.dumps(child_main(int(sys.argv[2]), ft_arg)))
        except Exception as e:  # noqa: BLE001 - report, don't crash the parent
            print(json.dumps({'error': str(e)[:200]}))
    elif _IS_INNER:
        try:
            main()
        except BaseException as e:  # noqa: BLE001 - always leave a JSON line
            _emit_result(error=f'{type(e).__name__}: {e}')
            raise
    else:
        supervise()
