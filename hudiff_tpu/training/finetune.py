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
    return model, model.init(rng, dummy)


# ---------------------------------------------------------------------------
# Device steps
# ---------------------------------------------------------------------------

def make_nano_finetune_step(infill_model, loss_builder_out, cdr_row,
                            reconstruct: bool, recon_weight: float):
    """loss = framework humanness loss + CDR CE (+ reconstruct)."""
    loss_fn = loss_builder_out

    def step(state: T.TrainState, tokens, aho, rng):
        B = tokens.shape[0]
        region = jnp.broadcast_to(jnp.asarray(C.HEAVY_REGION_INDEX),
                                  (B, C.HEAVY_LEN))
        protected = jnp.logical_or(
            jnp.broadcast_to(cdr_row != 0, tokens.shape),
            tokens == C.IDX_PAD)
        cdr_mask = jnp.broadcast_to(cdr_row != 0, tokens.shape)
        rng = jax.random.fold_in(rng, state.step)
        rng_mask, rng_loss = jax.random.split(rng)
        cor = masking.corrupt(rng_mask, tokens, protected, window=150)

        batch = {'src': cor.src, 'mask': cor.mask, 'ref': tokens,
                 'region': region, 'aho': aho}

        def total_loss(params):
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

        (_, metrics), grads = jax.value_and_grad(total_loss, has_aux=True)(
            state.params)
        return state.apply_gradients(grads), metrics

    return jax.jit(step, donate_argnums=(0,))


def make_ab_finetune_step(loss_fn, mouse_h_ratio: float, mouse_l_ratio: float):
    cdr_row = jnp.concatenate([jnp.asarray(C.HEAVY_CDR_KABAT_NO_VERNIER),
                               jnp.asarray(C.LIGHT_CDR_KABAT_NO_VERNIER)])
    plain_cdr = jnp.concatenate([jnp.asarray(C.HEAVY_CDR_INDEX),
                                 jnp.asarray(C.LIGHT_CDR_INDEX)])
    region_row = jnp.concatenate([jnp.asarray(C.HEAVY_REGION_INDEX),
                                  jnp.asarray(C.LIGHT_REGION_INDEX)])

    def step(state: T.TrainState, tokens, chain_type, aho_pair, rng):
        B = tokens.shape[0]
        region = jnp.broadcast_to(region_row, (B, C.PAIR_LEN))
        protected = masking.pair_protected_mask(tokens, cdr_row,
                                                protect_pads=True)
        cdr_mask = jnp.broadcast_to(plain_cdr != 0, tokens.shape)
        rng = jax.random.fold_in(rng, state.step)
        rng_mask, rng_loss = jax.random.split(rng)
        cor = masking.corrupt(rng_mask, tokens, protected)
        batch = {'src': cor.src, 'mask': cor.mask, 'ref': tokens,
                 'region': region, 'chain_type': chain_type, 'aho': aho_pair}

        def total_loss(params):
            ab_loss, (metrics, logits) = loss_fn(params, batch, rng_loss)
            ce = L.pair_oardm_split_loss(logits, tokens, cor.mask, cdr_mask)
            loss = (ab_loss + ce['h_cdr_ce'] + ce['l_cdr_ce']
                    + mouse_h_ratio * ce['h_ce'] + mouse_l_ratio * ce['l_ce'])
            metrics.update({'h_cdr_ce': ce['h_cdr_ce'],
                            'l_cdr_ce': ce['l_cdr_ce'],
                            'h_ce': ce['h_ce'], 'l_ce': ce['l_ce'],
                            'loss': loss})
            return loss, metrics

        (_, metrics), grads = jax.value_and_grad(total_loss, has_aux=True)(
            state.params)
        return state.apply_gradients(grads), metrics

    return jax.jit(step, donate_argnums=(0,))


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
    step_fn = make_nano_finetune_step(
        infill_model, loss_fn, cdr_row, reconstruct,
        cfg.finetune.get('reconstruct_loss_weight', 1e-3))

    # optional cross-training on human heavy OA-ARDM batches
    cross = bool(args.cross_training)
    if cross:
        heavy_step = T.make_heavy_train_step(infill_model, donate=False)
        if args.heavy_data:
            heavy_it = pipeline.prefetch(
                oas_heavy_batches(args.heavy_data, cfg.finetune.batch_size, seed))
        else:
            heavy_it = _synthetic_heavy_gen(cfg.finetune.batch_size, seed)

    tx = schedules.make_optimizer(cfg.finetune.optimizer,
                                  clip_norm=cfg.finetune.get('clip_norm'))
    state = T.TrainState.create(variables, tx)

    if args.synthetic:
        vhh_it = synthetic_nano_batches(cfg.finetune.batch_size, seed)
    else:
        ds = oas.OasUnpairDataset(args.vhh_data, chaintype='vhh')
        tok = Tokenizer()
        collate = lambda recs: oas.heavy_batch(recs, tok, with_aho=True,
                                               drop_aho_failed=True)
        vhh_it = oas.batch_iterator(ds, ds.splits['train'],
                                    cfg.finetune.batch_size, collate, seed=seed)
    vhh_it = pipeline.prefetch(vhh_it, 2)

    plateau = schedules.make_host_scheduler(cfg.finetune.scheduler,
                                            init_lr=cfg.finetune.optimizer.lr)

    ckpt_dir = os.path.join(log_dir, 'checkpoints')
    best = float('inf')
    max_iter = args.max_iter or cfg.finetune.max_iter
    valid_step = args.valid_step or cfg.finetune.valid_step
    t0 = time.time()
    for it in range(1, max_iter + 1):
        batch = next(vhh_it)
        if cross and it % cfg.finetune.get('cross_interval', 5) == 0:
            state, hm = heavy_step(state, jnp.asarray(next(heavy_it)), rng)
            writer.write(it, {k: float(v) for k, v in hm.items()},
                         prefix='cross')
        state, m = step_fn(state, jnp.asarray(batch['tokens']),
                           jnp.asarray(batch['aho']), rng)
        m = {k: float(v) for k, v in m.items()}
        m['steps_per_sec'] = it / max(time.time() - t0, 1e-9)
        writer.write(it, m, prefix='finetune')
        logger.info('iter %d | %s', it,
                    ' | '.join(f'{k}: {v:.5f}' for k, v in sorted(m.items())))
        if it % valid_step == 0 or it == max_iter:
            new_lr = plateau.update(m['loss'])
            schedules.set_learning_rate(state.opt_state, new_lr)
            if m['loss'] < best:
                best = m['loss']
                CKPT.save(ckpt_dir, it, state.params, state.opt_state,
                          config={'model': dataclasses.asdict(model_cfg),
                                  'finetune': cfg.to_dict(),
                                  'finetuned': True, 'kind': 'heavy'},
                          extra={'loss': best})
                logger.info('saved best checkpoint at iter %d', it)
    writer.close()
    return log_dir


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
    step_fn = make_ab_finetune_step(loss_fn,
                                    cfg.model.get('mouse_resi_h_ratio', 0.0),
                                    cfg.model.get('mouse_resi_l_ratio', 0.0))

    tx = schedules.make_optimizer(cfg.finetune.optimizer)
    state = T.TrainState.create(variables, tx)

    if args.synthetic:
        it_batches = synthetic_pair_batches(cfg.finetune.batch_size, seed)
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
    it_batches = pipeline.prefetch(it_batches, 2)

    plateau = schedules.make_host_scheduler(cfg.finetune.scheduler,
                                            init_lr=cfg.finetune.optimizer.lr)
    ckpt_dir = os.path.join(log_dir, 'checkpoints')
    best = float('inf')
    max_iter = args.max_iter or cfg.finetune.max_iter
    valid_step = args.valid_step or cfg.finetune.valid_step
    t0 = time.time()
    for it in range(1, max_iter + 1):
        batch = next(it_batches)
        state, m = step_fn(state, jnp.asarray(batch['tokens']),
                           jnp.asarray(batch['chain_type']),
                           jnp.asarray(batch['aho']), rng)
        m = {k: float(v) for k, v in m.items()}
        m['steps_per_sec'] = it / max(time.time() - t0, 1e-9)
        writer.write(it, m, prefix='finetune')
        logger.info('iter %d | %s', it,
                    ' | '.join(f'{k}: {v:.5f}' for k, v in sorted(m.items())))
        if it % valid_step == 0 or it == max_iter:
            new_lr = plateau.update(m['loss'])
            schedules.set_learning_rate(state.opt_state, new_lr)
            if m['loss'] < best:
                best = m['loss']
                CKPT.save(ckpt_dir, it, state.params, state.opt_state,
                          config={'model': dataclasses.asdict(model_cfg),
                                  'finetune': cfg.to_dict(),
                                  'finetuned': True, 'kind': 'pair'},
                          extra={'loss': best})
                logger.info('saved best checkpoint at iter %d', it)
    writer.close()
    return log_dir


def main(argv=None):
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
