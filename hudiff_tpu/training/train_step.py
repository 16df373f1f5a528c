"""Jitted pretrain steps: OA-ARDM corruption + forward + loss + optax update.

One fused device program per step (the reference splits corruption onto CPU
dataloader workers and syncs losses to host every micro-batch,
antibody_scripts/antibody_train.py:41-176).
"""
from __future__ import annotations

import functools
from typing import Any, Callable, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from .. import constants as C
from ..ops import losses, masking
from ..utils.prng import rbg_dropout_key  # re-exported; see utils/prng.py


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    opt_state: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)

    @classmethod
    def create(cls, params, tx):
        # jitted optimizer init off-CPU: eager tx.init dispatches a few ops
        # PER PARAMETER LEAF, each a round trip on tunneled backends
        # (utils/fast_init.py has the measurements for model init)
        if jax.default_backend() == 'cpu':
            opt_state = tx.init(params)
        else:
            opt_state = jax.jit(tx.init)(params)
        return cls(step=jnp.zeros((), jnp.int32), params=params,
                   opt_state=opt_state, tx=tx)

    def apply_gradients(self, grads):
        updates, new_opt = self.tx.update(grads, self.opt_state, self.params)
        return self.replace(step=self.step + 1,
                            params=optax.apply_updates(self.params, updates),
                            opt_state=new_opt)


def pair_region_batch(batch_size: int) -> np.ndarray:
    """[B, 291] region conditioning (constant per batch)."""
    row = np.concatenate([C.HEAVY_REGION_INDEX, C.LIGHT_REGION_INDEX])
    return np.broadcast_to(row, (batch_size, C.PAIR_LEN)).copy()


def heavy_region_batch(batch_size: int) -> np.ndarray:
    return np.broadcast_to(C.HEAVY_REGION_INDEX, (batch_size, C.HEAVY_LEN)).copy()


def make_pair_train_step(model, loss_type: str = 'merge', l_weight: float = 1.0,
                         mouse: bool = False,
                         donate: bool = True,
                         rbg_dropout: bool = True) -> Callable:
    """Returns jitted ``step(state, tokens, chain_type, rng) -> (state, metrics)``.

    tokens: [B, 291] clean grids; chain_type: [B, 2]; corruption happens inside.
    """
    cdr_row = jnp.concatenate([jnp.asarray(C.HEAVY_CDR_KABAT_NO_VERNIER if mouse
                                           else C.HEAVY_CDR_INDEX),
                               jnp.asarray(C.LIGHT_CDR_KABAT_NO_VERNIER if mouse
                                           else C.LIGHT_CDR_INDEX)])
    region_row = jnp.concatenate([jnp.asarray(C.HEAVY_REGION_INDEX),
                                  jnp.asarray(C.LIGHT_REGION_INDEX)])

    def step(state: TrainState, tokens, chain_type, rng):
        B = tokens.shape[0]
        region = jnp.broadcast_to(region_row, (B, C.PAIR_LEN))
        protected = masking.pair_protected_mask(tokens, cdr_row,
                                                protect_pads=mouse)
        cdr_mask = jnp.broadcast_to(cdr_row != 0, tokens.shape)
        rng_mask, rng_drop = jax.random.split(jax.random.fold_in(rng, state.step))
        if rbg_dropout:
            rng_drop = rbg_dropout_key(rng_drop)
        cor = masking.corrupt(rng_mask, tokens, protected)

        def loss_fn(params):
            logits = model.apply(params, cor.src, region, chain_type,
                                 deterministic=False,
                                 rngs={'dropout': rng_drop})
            if loss_type == 'split':
                m = losses.pair_oardm_split_loss(logits, tokens, cor.mask,
                                                 cdr_mask, l_weight=l_weight)
                loss = m['h_ce'] + m['l_ce'] + m['h_cdr_ce'] + m['l_cdr_ce']
            else:
                m = losses.pair_oardm_loss(logits, tokens, cor.mask, cdr_mask)
                loss = m['ce'] + m['cdr_ce']
            m['loss'] = loss
            return loss, m

        (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        return state.apply_gradients(grads), metrics

    return jax.jit(step, donate_argnums=(0,) if donate else ())


def make_heavy_train_step(model, donate: bool = True,
                          rbg_dropout: bool = True) -> Callable:
    """Nanobody pretrain step: ``step(state, tokens, rng)`` on [B, 152] grids
    (reference nanobody_scripts/nanotrain.py:43-335)."""
    cdr_row = jnp.asarray(C.HEAVY_CDR_INDEX)
    region_row = jnp.asarray(C.HEAVY_REGION_INDEX)

    def step(state: TrainState, tokens, rng):
        B = tokens.shape[0]
        region = jnp.broadcast_to(region_row, (B, C.HEAVY_LEN))
        protected = jnp.broadcast_to(cdr_row != 0, tokens.shape)
        cdr_mask = protected
        rng_mask, rng_drop = jax.random.split(jax.random.fold_in(rng, state.step))
        if rbg_dropout:
            rng_drop = rbg_dropout_key(rng_drop)
        cor = masking.corrupt(rng_mask, tokens, protected)

        def loss_fn(params):
            logits = model.apply(params, cor.src, region, deterministic=False,
                                 rngs={'dropout': rng_drop})
            m = losses.heavy_oardm_loss(logits, tokens, cor.mask, cdr_mask)
            m['loss'] = m['ce'] + m['cdr_ce']
            return m['loss'], m

        (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        return state.apply_gradients(grads), metrics

    return jax.jit(step, donate_argnums=(0,) if donate else ())


def evaluate(step_metrics_fn: Callable[[Dict[str, Any], int], Dict[str, Any]],
             val_feed, n_batches: int) -> Dict[str, float]:
    """Average eval metrics over the FULL validation split (``n_batches``
    batches pulled from ``val_feed``) — the reference iterates the entire
    val loader and averages (antibody_train.py:179-307,
    nanofinetune.py:202-335); single-batch validation makes best-checkpoint
    selection noise-driven.

    ``step_metrics_fn(batch, j) -> metrics`` runs the jitted eval step on one
    batch (j = batch index, for rng folding).
    """
    sums: Dict[str, float] = {}
    for j in range(n_batches):
        m = step_metrics_fn(next(val_feed), j)
        for k, v in m.items():
            sums[k] = sums.get(k, 0.0) + float(v)
    return {k: v / n_batches for k, v in sums.items()}


def make_eval_step(model, loss_type: str = 'merge', l_weight: float = 1.0,
                   pair: bool = True) -> Callable:
    """Validation step: deterministic forward, same losses, no update."""
    if pair:
        cdr_row = jnp.concatenate([jnp.asarray(C.HEAVY_CDR_INDEX),
                                   jnp.asarray(C.LIGHT_CDR_INDEX)])
        region_row = jnp.concatenate([jnp.asarray(C.HEAVY_REGION_INDEX),
                                      jnp.asarray(C.LIGHT_REGION_INDEX)])
    else:
        cdr_row = jnp.asarray(C.HEAVY_CDR_INDEX)
        region_row = jnp.asarray(C.HEAVY_REGION_INDEX)

    def step(params, tokens, chain_type, rng):
        B, L = tokens.shape
        region = jnp.broadcast_to(region_row, (B, L))
        protected = jnp.broadcast_to(cdr_row != 0, tokens.shape)
        cor = masking.corrupt(rng, tokens, protected)
        if pair:
            logits = model.apply(params, cor.src, region, chain_type)
            if loss_type == 'split':
                m = losses.pair_oardm_split_loss(logits, tokens, cor.mask,
                                                 protected, l_weight=l_weight)
                m['loss'] = m['h_ce'] + m['l_ce'] + m['h_cdr_ce'] + m['l_cdr_ce']
            else:
                m = losses.pair_oardm_loss(logits, tokens, cor.mask, protected)
                m['loss'] = m['ce'] + m['cdr_ce']
        else:
            logits = model.apply(params, cor.src, region)
            m = losses.heavy_oardm_loss(logits, tokens, cor.mask, protected)
            m['loss'] = m['ce'] + m['cdr_ce']
        return m

    return jax.jit(step)
