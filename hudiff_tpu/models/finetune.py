"""Fine-tune frameworks: AbNatiV-guided humanness optimization.

TPU-native rebuilds of AntiFrameWork (model/encoder/model.py:387-719) and
NanoInfillingFramework (model/nanoencoder/model.py:346-571):

- the infilling denoiser fills masked framework slots with Gumbel
  straight-through one-hots;
- infilled IMGT grids are projected onto AHo grids via the static-shaped
  rank-matching transfer (ops/scheme_transfer.py);
- frozen AbNatiV scorers judge humanness of the infilled positions; losses
  push scores toward ``human_threshold``;
- the pair framework's per-light-type scorer split (kappa vs lambda) runs
  BOTH scorers over all light chains and combines with per-sample weights —
  static shapes instead of the reference's data-dependent subsetting
  (model/encoder/model.py:451-513).

These are loss-function builders over the *infilling* params; AbNatiV
variables are closed over (frozen).
"""
from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from .. import constants as C
from ..ops import losses as L
from ..ops import scheme_transfer as ST
from ..utils.prng import rbg_dropout_key
from . import abnativ as AB


def huber(x: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """torch F.smooth_l1_loss elementwise (beta=1)."""
    d = jnp.abs(x - target)
    return jnp.where(d < 1.0, 0.5 * d * d, d - 0.5)


def _score_loss(score: jnp.ndarray, threshold: float, loss_type: str,
                weights: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    target = jnp.full_like(score, threshold)
    if loss_type == 'mse_loss':
        per = (score - target) ** 2
    elif loss_type == 'smooth_loss':
        per = huber(score, target)
    elif loss_type == 'l1_loss':
        per = jnp.abs(score - target)
    else:
        raise KeyError(f'unknown loss type {loss_type}')
    if weights is None:
        return per.mean()
    return (per * weights).sum() / jnp.maximum(weights.sum(), 1.0)


@dataclasses.dataclass(frozen=True)
class NanoFinetuneConfig:
    """Mirrors configs/training_nano_framework.yml model section."""
    loss_type: str = 'smooth_loss'
    vhh_nativeness: bool = True
    temperature: float = 1.0
    human_threshold: float = 1.0
    human_all_seq: bool = False
    vhh_all_seq: bool = False
    equal_weight: bool = False


def make_nano_finetune_loss(infill_model, vh_model, vh_vars,
                            cfg: NanoFinetuneConfig,
                            vhh_model=None, vhh_vars=None) -> Callable:
    """Returns ``loss_fn(infill_params, batch, rng) -> (loss, metrics)``.

    batch: src [B,152] masked tokens, mask [B,152] bool, ref [B,152] clean
    tokens, region [B,152], aho [B,149,21] one-hot of the original VHH.
    """
    if cfg.vhh_nativeness:
        assert vhh_model is not None and vhh_vars is not None

    def loss_fn(infill_params, batch, rng):
        src, mask, ref = batch['src'], batch['mask'], batch['ref']
        region, aho = batch['region'], batch['aho']
        rng_drop, rng_gumbel = jax.random.split(rng)

        logits = infill_model.apply(infill_params, src, region,
                                    deterministic=False,
                                    rngs={'dropout': rbg_dropout_key(rng_drop)})
        st = ST.gumbel_straight_through(rng_gumbel, logits[..., : C.N_AA],
                                        cfg.temperature)          # [B,152,20]
        st21 = jnp.concatenate(
            [st, jnp.zeros((*st.shape[:2], 1), st.dtype)], axis=-1)

        base = ST.imgt_grid_onehot(ref, dtype=st.dtype)
        infilled_imgt = jnp.where(mask[..., None], st21, base)

        tmap = ST.build_transfer_map(ref, aho, ST.NANO_IMGT_CAND,
                                     ST.NANO_AHO_CAND, C.IDX_X)
        infilled_aho = ST.apply_transfer(infilled_imgt, aho, tmap)
        infill_aho_mask = ST.transfer_mask(mask, tmap)

        out_vh = vh_model.apply(vh_vars, infilled_aho)
        humanness = AB.nativeness_scores(out_vh, infill_aho_mask, 'VH',
                                         all_seq=cfg.human_all_seq)
        vh_loss = _score_loss(humanness, cfg.human_threshold, cfg.loss_type)

        metrics: Dict[str, jnp.ndarray] = {
            'vh_loss': vh_loss, 'humanness_mean': humanness.mean()}
        loss = vh_loss
        if cfg.vhh_nativeness:
            old = vhh_model.apply(vhh_vars, jax.lax.stop_gradient(aho))
            old_s = AB.nativeness_scores(old, infill_aho_mask, 'VHH',
                                         all_seq=cfg.vhh_all_seq)
            new = vhh_model.apply(vhh_vars, infilled_aho)
            new_s = AB.nativeness_scores(new, infill_aho_mask, 'VHH',
                                         all_seq=cfg.vhh_all_seq)
            delta = jnp.mean((new_s - jax.lax.stop_gradient(old_s)) ** 2)
            if cfg.equal_weight:
                # equalize gradient contribution when delta < vh_loss
                # (nanoencoder/model.py:424-434)
                ratio = jax.lax.stop_gradient(delta / jnp.maximum(vh_loss, 1e-12))
                delta_eq = jnp.where(delta < vh_loss,
                                     delta / jnp.maximum(ratio, 1e-12), delta)
                loss = vh_loss + delta_eq
            else:
                loss = vh_loss + delta
            metrics['delta_vhh'] = delta
            metrics['vhh_new_mean'] = new_s.mean()
        metrics['loss'] = loss
        return loss, (metrics, logits)

    return loss_fn


@dataclasses.dataclass(frozen=True)
class AbFinetuneConfig:
    """Mirrors configs/antibody_finetune.yml model section."""
    loss_type: str = 'smooth_loss'
    human_threshold: float = 1.0
    all_seq: bool = False
    mutation: bool = False
    temperature: float = 1.0
    heavy_mutation_threshold: int = 17
    light_mutation_threshold: int = 15
    norm_mutation: int = 10


def make_ab_finetune_loss(infill_model, vh_model, vh_vars, vlk_model, vlk_vars,
                          vll_model, vll_vars, cfg: AbFinetuneConfig) -> Callable:
    """Returns ``loss_fn(infill_params, batch, rng) -> (loss, (metrics, logits))``.

    batch: src [B,291], mask [B,291] bool, ref [B,291], region [B,291],
    chain_type [B,2], aho [B,298,21] (heavy 149 + light 149 one-hots).
    """
    H = C.AHO_LEN

    def loss_fn(infill_params, batch, rng):
        src, mask, ref = batch['src'], batch['mask'], batch['ref']
        region, chain, aho = batch['region'], batch['chain_type'], batch['aho']
        rng_drop, rng_gumbel = jax.random.split(rng)

        logits = infill_model.apply(infill_params, src, region, chain,
                                    deterministic=False,
                                    rngs={'dropout': rbg_dropout_key(rng_drop)})
        st = ST.gumbel_straight_through(rng_gumbel, logits[..., : C.N_AA],
                                        cfg.temperature)
        st21 = jnp.concatenate(
            [st, jnp.zeros((*st.shape[:2], 1), st.dtype)], axis=-1)
        base = ST.imgt_grid_onehot(ref, dtype=st.dtype)
        infilled_imgt = jnp.where(mask[..., None], st21, base)

        tmap = ST.build_transfer_map(ref, aho, ST.PAIR_IMGT_CAND,
                                     ST.PAIR_AHO_CAND, C.IDX_PAD)
        infilled_aho = ST.apply_transfer(infilled_imgt, aho, tmap)
        infill_aho_mask = ST.transfer_mask(mask, tmap)

        aho_h, aho_l = infilled_aho[:, :H], infilled_aho[:, H:]
        m_h, m_l = infill_aho_mask[:, :H], infill_aho_mask[:, H:]

        out_h = vh_model.apply(vh_vars, aho_h)
        s_h = AB.nativeness_scores(out_h, m_h, 'VH', all_seq=cfg.all_seq)
        vh_loss = _score_loss(s_h, cfg.human_threshold, cfg.loss_type)

        is_kappa = (chain[:, 1] == C.CHAIN_TYPES['K']).astype(jnp.float32)
        is_lambda = 1.0 - is_kappa
        out_k = vlk_model.apply(vlk_vars, aho_l)
        s_k = AB.nativeness_scores(out_k, m_l, 'VKappa', all_seq=cfg.all_seq)
        out_l = vll_model.apply(vll_vars, aho_l)
        s_l = AB.nativeness_scores(out_l, m_l, 'VLambda', all_seq=cfg.all_seq)

        if cfg.loss_type == 'smooth_loss':
            # reference sums per-light-chain losses and divides by B
            # (encoder/model.py:496-514)
            per_l = (huber(s_k, jnp.full_like(s_k, cfg.human_threshold)) * is_kappa
                     + huber(s_l, jnp.full_like(s_l, cfg.human_threshold)) * is_lambda)
            vl_loss = per_l.sum() / s_k.shape[0]
        else:
            vlk = _score_loss(s_k, cfg.human_threshold, cfg.loss_type, is_kappa)
            vll = _score_loss(s_l, cfg.human_threshold, cfg.loss_type, is_lambda)
            vl_loss = vlk + vll
        ab_loss = vh_loss + vl_loss

        metrics = {'vh_loss': vh_loss, 'vl_loss': vl_loss,
                   'ab_score_loss': ab_loss,
                   'vh_score_mean': s_h.mean()}
        loss = ab_loss
        if cfg.mutation:
            # hinge on mutation counts; argmax-based (gradient-free in the
            # reference too, encoder/model.py:523-558)
            pred = jnp.argmax(logits, axis=-1)
            h_mut = (((pred != ref) & mask)[:, : C.HEAVY_LEN]).sum(-1)
            l_mut = (((pred != ref) & mask)[:, C.HEAVY_LEN:]).sum(-1)
            h_pen = jnp.clip((h_mut - cfg.heavy_mutation_threshold)
                             / cfg.norm_mutation, 0, None).mean()
            l_pen = jnp.clip(((l_mut - cfg.light_mutation_threshold)
                              / cfg.norm_mutation) ** 2, 0, None).mean()
            metrics['h_mutation_loss'] = h_pen
            metrics['l_mutation_loss'] = l_pen
            loss = loss + h_pen + l_pen
        metrics['loss'] = loss
        return loss, (metrics, logits)

    return loss_fn


def mask_low_score_residues(tokens: jnp.ndarray, residue_scores: jnp.ndarray,
                            tmap: ST.TransferMap, cdr_mask: jnp.ndarray,
                            threshold: float = 0.988047) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Mask framework residues whose AbNatiV residue score is below the VH
    threshold (reference mask_residues, nanoencoder/model.py:484-501).

    residue_scores: [B, 149] per-position exp(-recon_error).
    Returns (masked tokens, new mask)."""
    B, L = tokens.shape
    # project AHo residue scores back onto IMGT slots via the inverse map:
    # scatter score at aho slot j into imgt slot src[b, j]
    b_ix = jnp.arange(B)[:, None]
    safe_src = jnp.where(tmap.src >= 0, tmap.src, L)
    imgt_scores = jnp.ones((B, L + 1), residue_scores.dtype).at[
        b_ix, safe_src].set(residue_scores)[:, :L]
    to_mask = (imgt_scores < threshold) & jnp.logical_not(cdr_mask)
    new_tokens = jnp.where(to_mask, jnp.asarray(C.IDX_MSK, tokens.dtype), tokens)
    return new_tokens, to_mask
