"""IMGT <-> AHo numbering-scheme transfer, static-shaped.

The fine-tune frameworks must scatter infilled IMGT-grid residues into the
AHo-aligned one-hot grids that AbNatiV consumes. The reference does this with
data-dependent boolean mask assignment plus runtime count asserts
(model/nanoencoder/model.py:537-571, model/encoder/model.py:595-651) — shapes
change per batch, which XLA cannot compile.

TPU-native formulation: within each sample, the k-th valid (non-pad) IMGT
candidate slot corresponds to the k-th valid (non-gap) AHo candidate slot.
That rank matching is computed with cumulative sums and one scatter —
everything static-shaped and jit/grad-friendly. Tail slots excluded by the
reference (IMGT heavy 150-151 / pair light 290; AHo heavy 147-148 / pair
light 296) are excluded from the candidate lists here.

Validity thresholds mirror the reference: the nanobody path treats tokens
< 20 as residues (X excluded; nanoencoder/model.py:447), the pair path
tokens < 21 (X included; encoder/model.py:655).
"""
from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .. import constants as C

# Candidate slot index vectors (static).
NANO_IMGT_CAND = np.arange(150)                      # heavy grid minus tail
NANO_AHO_CAND = np.arange(147)                       # AHo heavy minus tail
PAIR_IMGT_CAND = np.concatenate([np.arange(150), np.arange(152, 290)])
PAIR_AHO_CAND = np.concatenate([np.arange(147), np.arange(149, 296), [297]])


class TransferMap(NamedTuple):
    src: jnp.ndarray        # [B, L_aho] IMGT source slot per AHo slot, -1 = keep
    imgt_valid: jnp.ndarray  # [B, n_imgt_cand] bool
    aho_valid: jnp.ndarray   # [B, n_aho_cand] bool


def build_transfer_map(imgt_tokens: jnp.ndarray, aho_onehot: jnp.ndarray,
                       imgt_cand: np.ndarray, aho_cand: np.ndarray,
                       imgt_valid_max: int) -> TransferMap:
    """Compute, for every AHo grid slot, which IMGT slot feeds it (-1: none).

    imgt_tokens: [B, L_imgt] token ids; valid slots are tokens < imgt_valid_max.
    aho_onehot: [B, L_aho, 21]; valid slots are argmax != gap (20).
    """
    B = imgt_tokens.shape[0]
    L_aho = aho_onehot.shape[1]
    icand = jnp.asarray(imgt_cand)
    acand = jnp.asarray(aho_cand)
    M = icand.shape[0]

    imgt_valid = imgt_tokens[:, icand] < imgt_valid_max            # [B, M]
    aho_valid = (jnp.argmax(aho_onehot, axis=-1) != C.ABNATIV_GAP_IDX)[:, acand]

    rank_imgt = jnp.cumsum(imgt_valid, axis=-1) - 1                 # [B, M]
    rank_aho = jnp.cumsum(aho_valid, axis=-1) - 1                   # [B, N]

    # pos_of_rank[b, r] = IMGT slot index of the r-th valid candidate
    dump = jnp.where(imgt_valid, rank_imgt, M)                      # invalid -> slot M
    b_ix = jnp.arange(B)[:, None]
    pos_of_rank = jnp.full((B, M + 1), -1, jnp.int32).at[
        b_ix, dump].set(jnp.broadcast_to(icand, (B, M)).astype(jnp.int32))

    safe_rank = jnp.clip(rank_aho, 0, M)
    src_cand = jnp.where(aho_valid,
                         pos_of_rank[b_ix, safe_rank], -1)          # [B, N]

    src = jnp.full((B, L_aho), -1, jnp.int32).at[b_ix, acand[None, :]].set(
        src_cand.astype(jnp.int32))
    return TransferMap(src=src, imgt_valid=imgt_valid, aho_valid=aho_valid)


def apply_transfer(imgt_onehot: jnp.ndarray, aho_onehot: jnp.ndarray,
                   tmap: TransferMap) -> jnp.ndarray:
    """Gather IMGT one-hot rows into the AHo grid; keep original where src=-1."""
    B, L_aho, V = aho_onehot.shape
    safe_src = jnp.maximum(tmap.src, 0)
    gathered = jnp.take_along_axis(imgt_onehot, safe_src[:, :, None], axis=1)
    keep = (tmap.src < 0)[:, :, None]
    return jnp.where(keep, aho_onehot, gathered.astype(aho_onehot.dtype))


def transfer_mask(imgt_mask: jnp.ndarray, tmap: TransferMap) -> jnp.ndarray:
    """Project a boolean IMGT-slot mask through the map onto the AHo grid."""
    safe_src = jnp.maximum(tmap.src, 0)
    moved = jnp.take_along_axis(imgt_mask, safe_src, axis=1)
    return jnp.logical_and(tmap.src >= 0, moved)


def imgt_grid_onehot(tokens: jnp.ndarray, dtype=jnp.float32) -> jnp.ndarray:
    """Token grid -> AbNatiV-alphabet one-hot: grid pad (21) maps to the gap
    channel (20); <msk> (22) one-hots to zeros (never present at transfer
    time). Reference trans_*_scheme pad remap (nanoencoder/model.py:547-550)."""
    remapped = jnp.where(tokens == C.IDX_PAD, C.ABNATIV_GAP_IDX, tokens)
    return jax.nn.one_hot(remapped, C.ABNATIV_ALPHABET_SIZE, dtype=dtype)


def counts_match(imgt_tokens, aho_onehot, pair: bool) -> jnp.ndarray:
    """Per-sample candidate-count equality (the reference's runtime asserts,
    for host-side data validation)."""
    if pair:
        icand, acand, vmax = PAIR_IMGT_CAND, PAIR_AHO_CAND, C.IDX_PAD
    else:
        icand, acand, vmax = NANO_IMGT_CAND, NANO_AHO_CAND, C.IDX_X
    tm = build_transfer_map(imgt_tokens, aho_onehot, icand, acand, vmax)
    return tm.imgt_valid.sum(-1) == tm.aho_valid.sum(-1)


def gumbel_straight_through(rng: jax.Array, logits: jnp.ndarray,
                            temperature: float = 1.0) -> jnp.ndarray:
    """Hard one-hot forward, softmax gradient backward
    (reference gumbel_softmax, model/encoder/model.py:706-719)."""
    u = jax.random.uniform(rng, logits.shape)
    g = -jnp.log(-jnp.log(u + 1e-20) + 1e-20)
    probs = jax.nn.softmax((logits + g) / temperature, axis=-1)
    hard = jax.nn.one_hot(jnp.argmax(probs, axis=-1), logits.shape[-1],
                          dtype=probs.dtype)
    return jax.lax.stop_gradient(hard - probs) + probs
