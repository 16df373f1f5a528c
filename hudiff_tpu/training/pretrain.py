"""Pretraining CLI for HuDiff-Ab (paired) and HuDiff-Nb (heavy-only).

TPU-native rebuild of antibody_scripts/antibody_train.py and
nanobody_scripts/nanotrain.py: the OA-ARDM corruption + forward + loss +
update is one jitted device program; data parallelism over the mesh's data
axis; host keeps the plateau LR scheduler, validation, best-val Orbax
checkpoints, JSONL/TensorBoard metrics.

Usage:
  python -m hudiff_tpu.training.pretrain --config configs/antibody_train.yml \
      --data /path/to/oas_pair_root --logdir ./logs [--resume DIR]
  python -m hudiff_tpu.training.pretrain --config configs/heavy_train.yml \
      --data /path/to/heavy.pkl --kind heavy
  # synthetic smoke run (no data needed):
  python -m hudiff_tpu.training.pretrain --config configs/antibody_test.yml \
      --synthetic 256 --max-iter 3
"""
from __future__ import annotations

import argparse
import os
import time
from typing import Dict, Iterator, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .. import constants as C
from ..data import oas, pipeline
from ..models.denoiser import AntiTFNet, DenoiserConfig, NanoAntiTFNet
from ..parallel import mesh as M
from ..tokenizer import Tokenizer
from ..utils.config import Namespace, load_yaml
from . import checkpoints, schedules, train_step as T
from .logger import (MetricsWriter, count_parameters, get_logger,
                     get_new_log_dir, seed_all, snapshot_source)


def synthetic_batches(kind: str, batch_size: int, seed: int = 0
                      ) -> Iterator[Dict[str, np.ndarray]]:
    """Random human-like grids for smoke testing without OAS data."""
    rs = np.random.RandomState(seed)
    L = C.PAIR_LEN if kind == 'pair' else C.HEAVY_LEN
    while True:
        tokens = rs.randint(0, C.N_AA, (batch_size, L)).astype(np.int32)
        batch = {'tokens': tokens}
        if kind == 'pair':
            batch['chain_type'] = np.stack(
                [np.zeros(batch_size, np.int32),
                 rs.choice([1, 2], batch_size).astype(np.int32)], axis=1)
        yield batch


def data_batches(kind: str, data_path: str, batch_size: int, split: str,
                 seed: int = 0):
    """(iterator, n_batches_per_epoch) over a dataset split. The val
    iterator is unshuffled, so pulling exactly n_batches per validation
    walks the full split once (reference valid() iterates the whole val
    loader, antibody_train.py:193-195)."""
    tok = Tokenizer()
    if kind == 'pair':
        ds = oas.OasPairDataset(data_path)
        collate = lambda recs: oas.pair_batch(recs, tok)
    else:
        ds = oas.OasUnpairDataset(data_path, chaintype='heavy')
        collate = lambda recs: oas.heavy_batch(recs, tok)
    it = oas.batch_iterator(ds, ds.splits[split], batch_size, collate,
                            seed=seed, shuffle=(split == 'train'))
    return it, oas.n_batches_per_epoch(len(ds.splits[split]), batch_size)


def run(cfg: Namespace, kind: str, data_path: Optional[str], logdir: str,
        synthetic: int = 0, max_iter: Optional[int] = None,
        valid_step: Optional[int] = None, resume: Optional[str] = None,
        seed: Optional[int] = None, use_bf16: bool = True,
        tag: str = '', tp: int = 1) -> str:
    assert kind in ('pair', 'heavy')
    seed = seed if seed is not None else cfg.train.get('seed', 2023)
    seed_all(seed)
    rng = jax.random.PRNGKey(seed)

    log_dir = get_new_log_dir(logdir, prefix=f'{kind}_pretrain', tag=tag)
    logger = get_logger('pretrain', log_dir)
    metrics_writer = MetricsWriter(log_dir)
    snapshot_source(log_dir)

    # mesh: data-parallel by default; --tp N adds a 'model' axis — attention
    # QKV/FFN kernels column/row-sharded per parallel/mesh.py rules, fused
    # attention shard_map'd with per-shard head groups (models/denoiser.py)
    mesh = M.make_mesh(model_axis=tp)

    model_cfg = DenoiserConfig.from_dict(cfg.model)
    dtype = jnp.bfloat16 if use_bf16 else jnp.float32
    model = (AntiTFNet if kind == 'pair' else NanoAntiTFNet)(
        model_cfg, dtype=dtype, tp_mesh=(mesh if tp > 1 else None))

    batch_size = cfg.train.batch_size
    max_iter = max_iter if max_iter is not None else cfg.train.max_iter
    valid_step = valid_step if valid_step is not None else cfg.train.valid_step
    batch_acc = cfg.train.get('batch_acc', 1)

    # data (each host shuffles with its own seed -> disjoint-ish shards over
    # DCN without a central sampler; SURVEY.md §2.3)
    data_seed = seed + 1000 * jax.process_index()
    if synthetic:
        train_it = synthetic_batches(kind, batch_size, data_seed)
        val_it = synthetic_batches(kind, batch_size, data_seed + 1)
        # synthetic data has no finite val split; use a small fixed pass
        n_val_batches = max(1, min(4, synthetic // batch_size))
    else:
        train_it, _ = data_batches(kind, data_path, batch_size, 'train',
                                   data_seed)
        val_it, n_val_batches = data_batches(kind, data_path, batch_size,
                                             'val', data_seed + 1)

    bshard = M.batch_sharding(mesh)
    train_feed = pipeline.device_feed(train_it, bshard)
    val_feed = pipeline.device_feed(val_it, bshard)

    # model/optimizer init
    L = C.PAIR_LEN if kind == 'pair' else C.HEAVY_LEN
    init_tokens = jnp.zeros((1, L), jnp.int32)
    init_region = jnp.asarray((T.pair_region_batch(1) if kind == 'pair'
                               else T.heavy_region_batch(1)))
    # one jitted init program (eager init pays a per-op round trip on
    # remote/tunneled backends — 275 s vs 9 s warm; utils/fast_init.py)
    from ..utils.fast_init import fast_init
    if kind == 'pair':
        params = fast_init(model, rng, init_tokens, init_region,
                           jnp.zeros((1, 2), jnp.int32))
    else:
        params = fast_init(model, rng, init_tokens, init_region)
    params = jax.device_put(params, M.param_shardings(mesh, params)
                            if tp > 1 else M.replicated(mesh))
    logger.info('parameters: %d', count_parameters(params))

    tx = schedules.make_optimizer(cfg.train.optimizer,
                                  clip_norm=cfg.train.get('clip_norm'))
    state = T.TrainState.create(params, tx)

    plateau = schedules.make_host_scheduler(cfg.train.scheduler,
                                            init_lr=cfg.train.optimizer.lr)

    best_val = float('inf')
    if resume:
        restored = checkpoints.restore(resume, template={
            'params': state.params, 'opt_state': state.opt_state})
        # checkpoints are labeled by iteration; state.step counts optimizer
        # micro-steps (batch_acc per iteration). Older checkpoints without
        # 'opt_steps' meta used the MICRO-step count as the label, so the
        # label itself is the optimizer step count for them.
        opt_steps = int(restored['meta'].get('opt_steps', restored['step']))
        # lay the restored host trees out over the mesh (mixing restored
        # single-device arrays with mesh-replicated ones fails at jit call)
        rep = M.replicated(mesh)
        pshard = (M.param_shardings(mesh, restored['payload']['params'])
                  if tp > 1 else rep)
        state = state.replace(
            params=jax.device_put(restored['payload']['params'], pshard),
            opt_state=jax.device_put(restored['payload']['opt_state'], rep),
            step=jax.device_put(jnp.asarray(opt_steps, jnp.int32), rep))
        # continue at the persisted scheduler LR / patience / best-val
        # (reference payload carries the scheduler, antibody_train.py:438-445)
        meta = restored['meta']
        if meta.get('scheduler'):
            plateau.load_state_dict(meta['scheduler'])
            schedules.set_learning_rate(state.opt_state, plateau.lr)
        if meta.get('val_loss') is not None:
            best_val = float(meta['val_loss'])
        logger.info('resumed from %s at step %d (lr %.3g, best val %.5f)',
                    resume, restored['step'], plateau.lr, best_val)

    if kind == 'pair':
        loss_type = cfg.train.get('loss_type', 'merge')
        step_fn = T.make_pair_train_step(
            model, loss_type=loss_type,
            l_weight=cfg.train.get('l_loss_weight', 1.0))
        eval_fn = T.make_eval_step(model, loss_type=loss_type,
                                   l_weight=cfg.train.get('l_loss_weight', 1.0),
                                   pair=True)
    else:
        step_fn = T.make_heavy_train_step(model)
        eval_fn = T.make_eval_step(model, pair=False)

    ckpt_dir = os.path.join(log_dir, 'checkpoints')
    os.makedirs(ckpt_dir, exist_ok=True)
    data_rng = jax.random.PRNGKey(seed + 17)

    start_it = int(state.step) // batch_acc
    t_start = time.time()
    it = start_it
    while it < max_iter:
        # Reference iteration semantics (antibody_train.py:55-103): ONE
        # iteration = `batch_acc` optimizer micro-steps; `max_iter` and
        # `valid_step` count iterations, so a config is work-equivalent to
        # the reference's. Logged train metrics are the MEAN over the
        # window (reference sums then divides by batch_acc, :119-132),
        # not the last micro-batch's values.
        sums: Dict[str, float] = {}
        for _ in range(batch_acc):
            batch = next(train_feed)
            if kind == 'pair':
                state, m = step_fn(state, batch['tokens'], batch['chain_type'],
                                   data_rng)
            else:
                state, m = step_fn(state, batch['tokens'], data_rng)
            for k, v in m.items():
                sums[k] = sums.get(k, 0.0) + float(v)
        it += 1
        m = {k: v / batch_acc for k, v in sums.items()}
        m['lr'] = schedules.get_learning_rate(state.opt_state) or 0.0
        m['opt_steps'] = float(int(state.step))
        m['steps_per_sec'] = ((it - start_it) * batch_acc
                              / max(time.time() - t_start, 1e-9))
        metrics_writer.write(it, m, prefix='train')
        logger.info('iter %d | %s', it,
                    ' | '.join(f'{k}: {v:.5f}' for k, v in sorted(m.items())))

        if it % max(valid_step, 1) == 0 or it >= max_iter:
            # full-split validation: average over every val batch
            def _val_step(vbatch, j, _it=it):
                vrng = jax.random.fold_in(jax.random.fold_in(rng, _it), j)
                if kind == 'pair':
                    return eval_fn(state.params, vbatch['tokens'],
                                   vbatch['chain_type'], vrng)
                return eval_fn(state.params, vbatch['tokens'], None, vrng)

            vm = T.evaluate(_val_step, val_feed, n_val_batches)
            metrics_writer.write(it, vm, prefix='val')
            logger.info('valid %d | %s', it,
                        ' | '.join(f'{k}: {v:.5f}' for k, v in sorted(vm.items())))
            new_lr = plateau.update(vm['loss'])
            schedules.set_learning_rate(state.opt_state, new_lr)
            if vm['loss'] < best_val:
                best_val = vm['loss']
                checkpoints.save(ckpt_dir, it, state.params, state.opt_state,
                                 config={'model': dict(cfg.model),
                                         'train': cfg.train.to_dict()
                                         if hasattr(cfg.train, 'to_dict')
                                         else dict(cfg.train),
                                         'kind': kind},
                                 extra={'val_loss': best_val,
                                        'opt_steps': int(state.step),
                                        'scheduler': plateau.state_dict()})
                logger.info('saved best checkpoint at iter %d (val %.5f)',
                            it, best_val)
    metrics_writer.close()
    return log_dir


def main(argv=None):
    # persistent XLA compile cache: repeat CLI runs skip the multi-minute
    # compiles on remote/tunneled backends (utils/compile_cache.py)
    from hudiff_tpu.utils.compile_cache import enable_compile_cache
    enable_compile_cache()
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument('--config', required=True)
    p.add_argument('--kind', choices=['pair', 'heavy'], default=None,
                   help='inferred from config name if omitted')
    p.add_argument('--data', default=None)
    p.add_argument('--logdir', default='./logs')
    p.add_argument('--synthetic', type=int, default=0,
                   help='use N synthetic samples instead of real data')
    p.add_argument('--max-iter', type=int, default=None)
    p.add_argument('--valid-step', type=int, default=None)
    p.add_argument('--resume', default=None)
    p.add_argument('--seed', type=int, default=None)
    p.add_argument('--fp32', action='store_true')
    p.add_argument('--profile', action='store_true',
                   help='capture a jax.profiler trace of the first iterations')
    p.add_argument('--tp', type=int, default=1,
                   help='tensor-parallel size (adds a "model" mesh axis; '
                        'device count must be divisible by it)')
    p.add_argument('--multihost', action='store_true',
                   help='initialize jax.distributed for multi-host (DCN) '
                        'training; each host feeds its own data shard '
                        '(SURVEY.md §2.3)')
    p.add_argument('--tag', default='')
    args = p.parse_args(argv)

    cfg = load_yaml(args.config)
    kind = args.kind or ('heavy' if 'heavy' in os.path.basename(args.config)
                         or cfg.get('name') == 'nano' else 'pair')
    if not args.synthetic and not args.data:
        p.error('need --data or --synthetic N')
    if args.multihost:
        # jax.distributed.initialize() blocks until every process reaches the
        # coordinator; without cluster env it would hang forever — fail fast.
        if not (os.environ.get('COORDINATOR_ADDRESS')
                or os.environ.get('JAX_COORDINATOR_ADDRESS')
                or os.environ.get('TPU_WORKER_HOSTNAMES')
                or os.environ.get('MEGASCALE_COORDINATOR_ADDRESS')):
            p.error('--multihost needs a cluster environment '
                    '(set JAX_COORDINATOR_ADDRESS / run under a TPU pod '
                    'launcher); none detected')
        jax.distributed.initialize()  # coordinator/process env-configured
    if args.profile:
        from jax import profiler as jax_profiler
        trace_dir = os.path.join(args.logdir, 'profile')
        with jax_profiler.trace(trace_dir):
            out = run(cfg, kind, args.data, args.logdir,
                      synthetic=args.synthetic, max_iter=args.max_iter,
                      valid_step=args.valid_step, resume=args.resume,
                      seed=args.seed, use_bf16=not args.fp32, tag=args.tag,
                      tp=args.tp)
        print(f'profiler trace written to {trace_dir}')
        return out
    return run(cfg, kind, args.data, args.logdir, synthetic=args.synthetic,
               max_iter=args.max_iter, valid_step=args.valid_step,
               resume=args.resume, seed=args.seed, use_bf16=not args.fp32,
               tag=args.tag, tp=args.tp)


if __name__ == '__main__':
    main()
