"""Fine-tuning CLIs: AbNatiV-guided humanness optimization.

TPU-native rebuild of antibody_scripts/antibody_finetune.py and
nanobody_scripts/nanofinetune.py:

- Ab: loss = humanness(VH+VL scorers) + H_cdr_ce + L_cdr_ce
        + mouse_ratio * (H_ce + L_ce)          (antibody_finetune.py:71)
- Nb: loss = humanness(VH) [+ delta-VHH] + cdr_ce
        [+ recon_weight * reconstruct_ce]      (nanofinetune.py:120-146)
  with optional cross-training: a human-heavy OA-ARDM step every
  ``cross_interval`` iterations (nanofinetune.py:76-97).

Corruption runs on device (pair mouse mode: Kabat-no-vernier + pad
protection; camel mode: window D=150). AbNatiV scorers are frozen; only the
infilling denoiser's params are optimized. Checkpoints save the infilling
params plus both configs (the reference Ab path saves only the inner
denoiser, antibody_finetune.py:348-355).
"""
from __future__ import annotations

import argparse
import dataclasses
import os
import time
from typing import Dict, Iterator, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .. import constants as C
from ..data import oas, pipeline
from ..models import abnativ as AB
from ..models import finetune as FT
from ..models.denoiser import AntiTFNet, DenoiserConfig, NanoAntiTFNet
from ..ops import losses as L
from ..ops import masking
from ..parallel import mesh as M
from ..tokenizer import Tokenizer, aho_onehot
from ..utils.config import Namespace, load_yaml
from . import checkpoints as CKPT
from . import schedules, train_step as T
from .logger import (MetricsWriter, get_logger, get_new_log_dir, seed_all,
                     snapshot_source)


# ---------------------------------------------------------------------------
# AbNatiV loading (reference .ckpt or random-init for smoke tests)
# ---------------------------------------------------------------------------

def load_abnativ(path: Optional[str], straight_through: bool,
                 rng: jax.Array, hp: Optional[AB.AbNatiVParams] = None):
    if path and os.path.exists(path):
        ckpt = CKPT.load_torch_checkpoint(path)
        conv = AB.convert_torch_abnativ(ckpt)
        model = AB.AbNatiVModel(conv['hp'], straight_through=straight_through)
        return model, conv['variables']
    # random-init scorer (smoke/testing only)
    hp = hp or AB.AbNatiVParams(d_embedding=32, kernel=4, stride=2,
                                num_heads=2, num_mha_layers=1, d_ff=64,
                                num_embeddings=16, embedding_dim_code_book=8)
    model = AB.AbNatiVModel(hp, straight_through=straight_through)
    dummy = jnp.zeros((1, C.AHO_LEN, C.ABNATIV_ALPHABET_SIZE))
    from ..utils.fast_init import fast_init
    return model, fast_init(model, rng, dummy)


# ---------------------------------------------------------------------------
# Device steps
# ---------------------------------------------------------------------------

def make_nano_finetune_fns(infill_model, loss_builder_out, cdr_row,
                           reconstruct: bool, recon_weight: float):
    """(train_step, eval_step) for the Nb framework.

    loss = framework humanness loss + CDR CE (+ reconstruct). The eval step
    computes the same total loss without an update (reference finetune_val,
    nanofinetune.py:202-335).
    """
    loss_fn = loss_builder_out

    def total_loss(params, tokens, aho, rng):
        B = tokens.shape[0]
        region = jnp.broadcast_to(jnp.asarray(C.HEAVY_REGION_INDEX),
                                  (B, C.HEAVY_LEN))
        protected = jnp.logical_or(
            jnp.broadcast_to(cdr_row != 0, tokens.shape),
            tokens == C.IDX_PAD)
        cdr_mask = jnp.broadcast_to(cdr_row != 0, tokens.shape)
        rng_mask, rng_loss = jax.random.split(rng)
        cor = masking.corrupt(rng_mask, tokens, protected, window=150)
        batch = {'src': cor.src, 'mask': cor.mask, 'ref': tokens,
                 'region': region, 'aho': aho}
        ab_loss, (metrics, logits) = loss_fn(params, batch, rng_loss)
        ce = L.nano_finetune_ce(logits, tokens, cdr_mask,
                                mask=cor.mask, reconstruct=reconstruct)
        loss = ab_loss + ce['cdr_ce']
        metrics['cdr_ce'] = ce['cdr_ce']
        if reconstruct:
            loss = loss + recon_weight * ce['reconstruct_ce']
            metrics['reconstruct_ce'] = ce['reconstruct_ce']
        metrics['loss'] = loss
        return loss, metrics

    def step(state: T.TrainState, tokens, aho, rng):
        rng = jax.random.fold_in(rng, state.step)
        (_, metrics), grads = jax.value_and_grad(total_loss, has_aux=True)(
            state.params, tokens, aho, rng)
        return state.apply_gradients(grads), metrics

    def eval_step(params, tokens, aho, rng):
        _, metrics = total_loss(params, tokens, aho, rng)
        return metrics

    return (jax.jit(step, donate_argnums=(0,)), jax.jit(eval_step))


def make_ab_finetune_fns(loss_fn, mouse_h_ratio: float, mouse_l_ratio: float):
    """(train_step, eval_step) for the Ab framework
    (loss composition: antibody_finetune.py:71)."""
    cdr_row = jnp.concatenate([jnp.asarray(C.HEAVY_CDR_KABAT_NO_VERNIER),
                               jnp.asarray(C.LIGHT_CDR_KABAT_NO_VERNIER)])
    plain_cdr = jnp.concatenate([jnp.asarray(C.HEAVY_CDR_INDEX),
                                 jnp.asarray(C.LIGHT_CDR_INDEX)])
    region_row = jnp.concatenate([jnp.asarray(C.HEAVY_REGION_INDEX),
                                  jnp.asarray(C.LIGHT_REGION_INDEX)])

    def total_loss(params, tokens, chain_type, aho_pair, rng):
        B = tokens.shape[0]
        region = jnp.broadcast_to(region_row, (B, C.PAIR_LEN))
        protected = masking.pair_protected_mask(tokens, cdr_row,
                                                protect_pads=True)
        cdr_mask = jnp.broadcast_to(plain_cdr != 0, tokens.shape)
        rng_mask, rng_loss = jax.random.split(rng)
        cor = masking.corrupt(rng_mask, tokens, protected)
        batch = {'src': cor.src, 'mask': cor.mask, 'ref': tokens,
                 'region': region, 'chain_type': chain_type, 'aho': aho_pair}
        ab_loss, (metrics, logits) = loss_fn(params, batch, rng_loss)
        ce = L.pair_oardm_split_loss(logits, tokens, cor.mask, cdr_mask)
        loss = (ab_loss + ce['h_cdr_ce'] + ce['l_cdr_ce']
                + mouse_h_ratio * ce['h_ce'] + mouse_l_ratio * ce['l_ce'])
        metrics.update({'h_cdr_ce': ce['h_cdr_ce'],
                        'l_cdr_ce': ce['l_cdr_ce'],
                        'h_ce': ce['h_ce'], 'l_ce': ce['l_ce'],
                        'loss': loss})
        return loss, metrics

    def step(state: T.TrainState, tokens, chain_type, aho_pair, rng):
        rng = jax.random.fold_in(rng, state.step)
        (_, metrics), grads = jax.value_and_grad(total_loss, has_aux=True)(
            state.params, tokens, chain_type, aho_pair, rng)
        return state.apply_gradients(grads), metrics

    def eval_step(params, tokens, chain_type, aho_pair, rng):
        _, metrics = total_loss(params, tokens, chain_type, aho_pair, rng)
        return metrics

    return (jax.jit(step, donate_argnums=(0,)), jax.jit(eval_step))


# ---------------------------------------------------------------------------
# Synthetic consistent batches (for smoke runs without camel/mouse data)
# ---------------------------------------------------------------------------

def synthetic_nano_batches(batch_size: int, seed: int = 0
                           ) -> Iterator[Dict[str, np.ndarray]]:
    rs = np.random.RandomState(seed)
    while True:
        tokens = np.empty((batch_size, C.HEAVY_LEN), np.int32)
        aho = np.zeros((batch_size, C.AHO_LEN, C.ABNATIV_ALPHABET_SIZE),
                       np.float32)
        for b in range(batch_size):
            n_res = rs.randint(110, 126)
            res = rs.randint(0, 20, n_res)
            grid = np.full(C.HEAVY_LEN, C.IDX_PAD, np.int32)
            slots = np.sort(rs.choice(150, n_res, replace=False))
            grid[slots] = res
            grid[150:] = rs.randint(0, 20, 2)
            tokens[b] = grid
            arow = np.full(C.AHO_LEN, C.ABNATIV_GAP_IDX, np.int32)
            aslots = np.sort(rs.choice(147, n_res, replace=False))
            arow[aslots] = res
            arow[147:] = grid[150:]
            aho[b, np.arange(C.AHO_LEN), arow] = 1.0
        yield {'tokens': tokens, 'aho': aho}


def synthetic_pair_batches(batch_size: int, seed: int = 0
                           ) -> Iterator[Dict[str, np.ndarray]]:
    rs = np.random.RandomState(seed)
    nano = synthetic_nano_batches(batch_size, seed)
    while True:
        h = next(nano)
        l = next(nano)
        l_tokens = np.array(l['tokens'][:, : C.LIGHT_LEN])
        # light grid: slot 138 is the single tail; AHo light tail = col 148
        # (col 147 must stay gap so the count invariants hold)
        l_tokens[:, 137] = C.IDX_PAD
        l_aho = np.array(l['aho'])
        l_aho[:, 147, :] = 0.0
        l_aho[:, 147, C.ABNATIV_GAP_IDX] = 1.0
        tokens = np.concatenate([h['tokens'], l_tokens], axis=1)
        chain = np.stack([np.zeros(batch_size, np.int32),
                          rs.choice([1, 2], batch_size).astype(np.int32)], 1)
        aho_pair = np.concatenate([h['aho'], l_aho], axis=1)
        yield {'tokens': tokens, 'chain_type': chain, 'aho': aho_pair}


# ---------------------------------------------------------------------------
# Run loops
# ---------------------------------------------------------------------------

def run_nano(cfg: Namespace, args) -> str:
    seed = cfg.finetune.get('seed', 2023)
    seed_all(seed)
    rng = jax.random.PRNGKey(seed)
    log_dir = get_new_log_dir(args.logdir, prefix='nano_finetune', tag=args.tag)
    logger = get_logger('finetune', log_dir)
    writer = MetricsWriter(log_dir)
    snapshot_source(log_dir)

    # infilling model from the pretrain checkpoint
    from ..sampling.humanize import load_denoiser
    infill_model, variables, _ = load_denoiser(args.pretrain_ckpt, 'heavy',
                                               use_bf16=not args.fp32)
    model_cfg = infill_model.cfg

    vh_model, vh_vars = load_abnativ(args.abnativ_vh, straight_through=False,
                                     rng=jax.random.PRNGKey(1))
    ft_cfg = FT.NanoFinetuneConfig(
        loss_type=cfg.model.loss_type,
        vhh_nativeness=cfg.model.vhh_nativeness,
        temperature=cfg.model.temperature,
        human_threshold=cfg.model.human_threshold,
        human_all_seq=cfg.model.human_all_seq,
        vhh_all_seq=cfg.model.vhh_all_seq,
        equal_weight=cfg.model.equal_weight)
    if ft_cfg.vhh_nativeness:
        vhh_model, vhh_vars = load_abnativ(args.abnativ_vhh,
                                           straight_through=False,
                                           rng=jax.random.PRNGKey(2))
    else:
        vhh_model = vhh_vars = None

    loss_fn = FT.make_nano_finetune_loss(infill_model, vh_model, vh_vars,
                                         ft_cfg, vhh_model, vhh_vars)
    cdr_row = jnp.asarray(C.HEAVY_CDR_INDEX)
    reconstruct = bool(cfg.model.get('part_reconstruct_vhh', False))
    step_fn, eval_fn = make_nano_finetune_fns(
        infill_model, loss_fn, cdr_row, reconstruct,
        cfg.finetune.get('reconstruct_loss_weight', 1e-3))

    # optional cross-training on human heavy OA-ARDM batches
    cross = bool(args.cross_training)
    if cross:
        heavy_step = T.make_heavy_train_step(infill_model, donate=False)
        heavy_eval = T.make_eval_step(infill_model, pair=False)
        if args.heavy_data:
            heavy_it = pipeline.prefetch(
                oas_heavy_batches(args.heavy_data, cfg.finetune.batch_size, seed))
            heavy_val_it, n_heavy_val = oas_heavy_val_batches(
                args.heavy_data, cfg.finetune.batch_size)
        else:
            heavy_it = _synthetic_heavy_gen(cfg.finetune.batch_size, seed)
            heavy_val_it = _synthetic_heavy_gen(cfg.finetune.batch_size,
                                                seed + 500)
            n_heavy_val = 2

    tx = schedules.make_optimizer(cfg.finetune.optimizer,
                                  clip_norm=cfg.finetune.get('clip_norm'))
    state = T.TrainState.create(variables, tx)

    if args.synthetic:
        vhh_it = synthetic_nano_batches(cfg.finetune.batch_size, seed)
        vhh_val_it = synthetic_nano_batches(cfg.finetune.batch_size, seed + 501)
        n_val_batches = 2
    else:
        ds = oas.OasUnpairDataset(args.vhh_data, chaintype='vhh')
        tok = Tokenizer()
        collate = lambda recs: oas.heavy_batch(recs, tok, with_aho=True,
                                               drop_aho_failed=True)
        vhh_it = oas.batch_iterator(ds, ds.splits['train'],
                                    cfg.finetune.batch_size, collate, seed=seed)
        # held-out VHH validation split (reference vhh_val_loader,
        # nanofinetune.py:416-435)
        vhh_val_it = oas.batch_iterator(ds, ds.splits['val'],
                                        cfg.finetune.batch_size, collate,
                                        shuffle=False)
        n_val_batches = oas.n_batches_per_epoch(len(ds.splits['val']),
                                                cfg.finetune.batch_size)
    vhh_it = pipeline.prefetch(vhh_it, 2)

    plateau = schedules.make_host_scheduler(cfg.finetune.scheduler,
                                            init_lr=cfg.finetune.optimizer.lr)

    ckpt_dir = os.path.join(log_dir, 'checkpoints')
    best = float('inf')
    if getattr(args, 'resume', None):
        state, plateau, best = _restore_finetune(args.resume, state, plateau,
                                                 logger)
    max_iter = args.max_iter or cfg.finetune.max_iter
    valid_step = args.valid_step or cfg.finetune.valid_step
    t0 = time.time()
    start_it = int(state.step)
    for it in range(start_it + 1, max_iter + 1):
        batch = next(vhh_it)
        if cross and it % cfg.finetune.get('cross_interval', 5) == 0:
            state, hm = heavy_step(state, jnp.asarray(next(heavy_it)), rng)
            writer.write(it, {k: float(v) for k, v in hm.items()},
                         prefix='cross')
        state, m = step_fn(state, jnp.asarray(batch['tokens']),
                           jnp.asarray(batch['aho']), rng)
        m = {k: float(v) for k, v in m.items()}
        m['steps_per_sec'] = (it - start_it) / max(time.time() - t0, 1e-9)
        writer.write(it, m, prefix='finetune')
        logger.info('iter %d | %s', it,
                    ' | '.join(f'{k}: {v:.5f}' for k, v in sorted(m.items())))
        if it % valid_step == 0 or it == max_iter:
            # full held-out validation drives the plateau LR and best-ckpt
            # selection (reference nanofinetune.py:524-539)
            def _val(vb, j, _it=it):
                vrng = jax.random.fold_in(jax.random.fold_in(rng, 7919 + _it), j)
                return eval_fn(state.params, jnp.asarray(vb['tokens']),
                               jnp.asarray(vb['aho']), vrng)

            vm = T.evaluate(_val, vhh_val_it, n_val_batches)
            if cross:
                def _hval(vb, j, _it=it):
                    vrng = jax.random.fold_in(
                        jax.random.fold_in(rng, 104729 + _it), j)
                    tokens = vb['tokens'] if isinstance(vb, dict) else vb
                    return heavy_eval(state.params, jnp.asarray(tokens),
                                      None, vrng)

                hv = T.evaluate(_hval, heavy_val_it, n_heavy_val)
                vm.update({f'heavy_{k}': v for k, v in hv.items()})
            writer.write(it, vm, prefix='val')
            logger.info('valid %d | %s', it,
                        ' | '.join(f'{k}: {v:.5f}'
                                   for k, v in sorted(vm.items())))
            new_lr = plateau.update(vm['loss'])
            schedules.set_learning_rate(state.opt_state, new_lr)
            if vm['loss'] < best:
                best = vm['loss']
                CKPT.save(ckpt_dir, it, state.params, state.opt_state,
                          config={'model': dataclasses.asdict(model_cfg),
                                  'finetune': cfg.to_dict(),
                                  'finetuned': True, 'kind': 'heavy'},
                          extra={'val_loss': best,
                                 'scheduler': plateau.state_dict()})
                logger.info('saved best checkpoint at iter %d (val %.5f)',
                            it, best)
    writer.close()
    return log_dir


def _restore_finetune(resume_dir: str, state, plateau, logger):
    """Resume a fine-tune run: params/opt_state/step + host-scheduler state
    + best-val (reference reloads the saved framework + scheduler,
    nanofinetune.py:530-539)."""
    restored = CKPT.restore(resume_dir, template={
        'params': state.params, 'opt_state': state.opt_state})
    state = state.replace(params=restored['payload']['params'],
                          opt_state=restored['payload']['opt_state'],
                          step=jnp.asarray(restored['step'], jnp.int32))
    meta = restored['meta']
    best = float(meta.get('val_loss', meta.get('loss', float('inf'))))
    if meta.get('scheduler'):
        plateau.load_state_dict(meta['scheduler'])
        schedules.set_learning_rate(state.opt_state, plateau.lr)
    logger.info('resumed from %s at step %d (lr %.3g, best val %.5f)',
                resume_dir, restored['step'], plateau.lr, best)
    return state, plateau, best


def oas_heavy_val_batches(path: str, batch_size: int):
    """(iterator, n_batches) over the heavy val split (token batches)."""
    ds = oas.OasUnpairDataset(path, chaintype='heavy')
    tok = Tokenizer()
    collate = lambda recs: oas.heavy_batch(recs, tok)

    def gen():
        for b in oas.batch_iterator(ds, ds.splits['val'], batch_size, collate,
                                    shuffle=False):
            yield b['tokens']

    return gen(), oas.n_batches_per_epoch(len(ds.splits['val']), batch_size)


def _synthetic_heavy_gen(batch_size: int, seed: int):
    rs = np.random.RandomState(seed)
    while True:
        yield rs.randint(0, C.N_AA, (batch_size, C.HEAVY_LEN)).astype(np.int32)


def oas_heavy_batches(path: str, batch_size: int, seed: int):
    ds = oas.OasUnpairDataset(path, chaintype='heavy')
    tok = Tokenizer()
    collate = lambda recs: oas.heavy_batch(recs, tok)
    for b in oas.batch_iterator(ds, ds.splits['train'], batch_size, collate,
                                seed=seed):
        yield b['tokens']


def run_ab(cfg: Namespace, args) -> str:
    seed = cfg.finetune.get('seed', 2023)
    seed_all(seed)
    rng = jax.random.PRNGKey(seed)
    log_dir = get_new_log_dir(args.logdir, prefix='ab_finetune', tag=args.tag)
    logger = get_logger('finetune', log_dir)
    writer = MetricsWriter(log_dir)
    snapshot_source(log_dir)

    from ..sampling.humanize import load_denoiser
    infill_model, variables, _ = load_denoiser(args.pretrain_ckpt, 'pair',
                                               use_bf16=not args.fp32)
    model_cfg = infill_model.cfg

    # the reference leaves torch train-mode straight-through active in the Ab
    # path (SURVEY.md §2.4 quirks); we keep ST for the gradient path
    vh_model, vh_vars = load_abnativ(args.abnativ_vh, True, jax.random.PRNGKey(1))
    vlk_model, vlk_vars = load_abnativ(args.abnativ_vlk, True, jax.random.PRNGKey(2))
    vll_model, vll_vars = load_abnativ(args.abnativ_vll, True, jax.random.PRNGKey(3))

    ft_cfg = FT.AbFinetuneConfig(
        loss_type=cfg.model.loss_type,
        human_threshold=cfg.model.human_threshold,
        all_seq=cfg.model.all_seq,
        mutation=cfg.model.get('mutation', False))
    loss_fn = FT.make_ab_finetune_loss(infill_model, vh_model, vh_vars,
                                       vlk_model, vlk_vars, vll_model,
                                       vll_vars, ft_cfg)
    step_fn, eval_fn = make_ab_finetune_fns(
        loss_fn,
        cfg.model.get('mouse_resi_h_ratio', 0.0),
        cfg.model.get('mouse_resi_l_ratio', 0.0))

    tx = schedules.make_optimizer(cfg.finetune.optimizer)
    state = T.TrainState.create(variables, tx)

    if args.synthetic:
        it_batches = synthetic_pair_batches(cfg.finetune.batch_size, seed)
        val_batches = synthetic_pair_batches(cfg.finetune.batch_size, seed + 501)
        n_val_batches = 2
    else:
        ds = oas.OasPairDataset(args.mouse_data, mouse=True)
        tok = Tokenizer()
        collate = lambda recs: oas.pair_batch(recs, tok, with_aho=True)

        def merge(recs):
            b = collate(recs)
            b['aho'] = np.concatenate([b.pop('aho_h'), b.pop('aho_l')], axis=1)
            return b
        it_batches = oas.batch_iterator(ds, ds.splits['train'],
                                        cfg.finetune.batch_size, merge,
                                        seed=seed)
        val_batches = oas.batch_iterator(ds, ds.splits['val'],
                                         cfg.finetune.batch_size, merge,
                                         shuffle=False)
        n_val_batches = oas.n_batches_per_epoch(len(ds.splits['val']),
                                                cfg.finetune.batch_size)
    it_batches = pipeline.prefetch(it_batches, 2)

    plateau = schedules.make_host_scheduler(cfg.finetune.scheduler,
                                            init_lr=cfg.finetune.optimizer.lr)
    ckpt_dir = os.path.join(log_dir, 'checkpoints')
    best = float('inf')
    if getattr(args, 'resume', None):
        state, plateau, best = _restore_finetune(args.resume, state, plateau,
                                                 logger)
    max_iter = args.max_iter or cfg.finetune.max_iter
    valid_step = args.valid_step or cfg.finetune.valid_step
    t0 = time.time()
    start_it = int(state.step)
    for it in range(start_it + 1, max_iter + 1):
        batch = next(it_batches)
        state, m = step_fn(state, jnp.asarray(batch['tokens']),
                           jnp.asarray(batch['chain_type']),
                           jnp.asarray(batch['aho']), rng)
        m = {k: float(v) for k, v in m.items()}
        m['steps_per_sec'] = (it - start_it) / max(time.time() - t0, 1e-9)
        writer.write(it, m, prefix='finetune')
        logger.info('iter %d | %s', it,
                    ' | '.join(f'{k}: {v:.5f}' for k, v in sorted(m.items())))
        if it % valid_step == 0 or it == max_iter:
            # full held-out mouse-pair validation drives LR + best-ckpt
            def _val(vb, j, _it=it):
                vrng = jax.random.fold_in(jax.random.fold_in(rng, 7919 + _it), j)
                return eval_fn(state.params, jnp.asarray(vb['tokens']),
                               jnp.asarray(vb['chain_type']),
                               jnp.asarray(vb['aho']), vrng)

            vm = T.evaluate(_val, val_batches, n_val_batches)
            writer.write(it, vm, prefix='val')
            logger.info('valid %d | %s', it,
                        ' | '.join(f'{k}: {v:.5f}'
                                   for k, v in sorted(vm.items())))
            new_lr = plateau.update(vm['loss'])
            schedules.set_learning_rate(state.opt_state, new_lr)
            if vm['loss'] < best:
                best = vm['loss']
                CKPT.save(ckpt_dir, it, state.params, state.opt_state,
                          config={'model': dataclasses.asdict(model_cfg),
                                  'finetune': cfg.to_dict(),
                                  'finetuned': True, 'kind': 'pair'},
                          extra={'val_loss': best,
                                 'scheduler': plateau.state_dict()})
                logger.info('saved best checkpoint at iter %d (val %.5f)',
                            it, best)
    writer.close()
    return log_dir


def main(argv=None):
    # persistent XLA compile cache: repeat CLI runs skip the multi-minute
    # compiles on remote/tunneled backends (utils/compile_cache.py)
    from hudiff_tpu.utils.compile_cache import enable_compile_cache
    enable_compile_cache()
    p = argparse.ArgumentParser(description=__doc__)
    sub = p.add_subparsers(dest='cmd', required=True)
    for name in ('ab', 'nano'):
        q = sub.add_parser(name)
        q.add_argument('--config', required=True)
        q.add_argument('--pretrain-ckpt', required=True)
        q.add_argument('--abnativ-vh', default=None)
        q.add_argument('--logdir', default='./logs')
        q.add_argument('--synthetic', action='store_true')
        q.add_argument('--max-iter', type=int, default=None)
        q.add_argument('--valid-step', type=int, default=None)
        q.add_argument('--batch-size', type=int, default=None,
                       help='override the config batch size')
        q.add_argument('--resume', default=None,
                       help='checkpoint dir of a previous fine-tune run; '
                            'restores params/optimizer/scheduler/best-val')
        q.add_argument('--fp32', action='store_true')
        q.add_argument('--tag', default='')
        if name == 'ab':
            q.add_argument('--abnativ-vlk', default=None)
            q.add_argument('--abnativ-vll', default=None)
            q.add_argument('--mouse-data', default=None)
        else:
            q.add_argument('--abnativ-vhh', default=None)
            q.add_argument('--vhh-data', default=None)
            q.add_argument('--heavy-data', default=None)
            q.add_argument('--cross-training', action='store_true')
    args = p.parse_args(argv)
    cfg = load_yaml(args.config)
    if args.batch_size:
        cfg.finetune.batch_size = args.batch_size
    if args.cmd == 'ab':
        return run_ab(cfg, args)
    return run_nano(cfg, args)


if __name__ == '__main__':
    main()
