"""OA-ARDM forward corruption, on device.

The reference implements the forward (masking) diffusion in CPU collaters with
per-sample Python loops (dataset/oas_pair_dataset_new.py:398-434,
oas_unpair_dataset_new.py:239-273, :327-368). Here it is a pure function of
``(rng, tokens, protected_mask)`` that vectorizes over the batch and runs
inside the jitted train step, so corruption is reproducible, fused with the
model forward, and free of host<->device sync.

Semantics (matching the reference):
- ``D`` is the padded grid length (291 pair / 152 heavy / 150 camel window);
- ``t ~ U{1, D-1}``, ``num_mask = D - t + 1`` positions are drawn uniformly
  without replacement;
- protected positions (CDRs; plus grid pads in mouse/camel modes) are then
  cleared from the mask, so realized mask counts shrink accordingly;
- masked positions are replaced by the <msk> token.
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from .. import constants as C


class Corrupted(NamedTuple):
    src: jnp.ndarray          # [B, L] masked token grid (model input)
    mask: jnp.ndarray         # [B, L] bool, True where masked
    num_masked: jnp.ndarray   # [B] realized masked counts (loss timesteps)


def sample_mask_counts(rng: jax.Array, batch: int, D: int) -> jnp.ndarray:
    """Draw the OA-ARDM ``num_mask = D - t + 1`` with t ~ U{1, D-1}."""
    t = jax.random.randint(rng, (batch,), 1, D)
    return D - t + 1


def random_subset_mask(rng: jax.Array, batch: int, length: int,
                       counts: jnp.ndarray, window: Optional[int] = None
                       ) -> jnp.ndarray:
    """[B, length] bool mask with ``counts[b]`` True entries drawn uniformly
    without replacement from the first ``window`` positions (default: all)."""
    window = length if window is None else window
    scores = jax.random.uniform(rng, (batch, length))
    if window < length:
        scores = scores.at[:, window:].set(2.0)  # never selected
    # rank positions by score; the `counts` smallest are selected
    order = jnp.argsort(scores, axis=-1)
    ranks = jnp.argsort(order, axis=-1)
    return ranks < counts[:, None]


def corrupt(rng: jax.Array, tokens: jnp.ndarray, protected: jnp.ndarray,
            window: Optional[int] = None) -> Corrupted:
    """Apply OA-ARDM forward masking.

    Args:
      rng: PRNG key.
      tokens: [B, L] int token grid.
      protected: [B, L] bool; True positions are never masked (CDRs, pads...).
      window: optionally restrict candidate positions to [0, window)
        (the camel fine-tune collater uses D=150,
        oas_unpair_dataset_new.py:333).
    """
    B, L = tokens.shape
    D = window if window is not None else L
    rng_t, rng_m = jax.random.split(rng)
    counts = sample_mask_counts(rng_t, B, D)
    mask = random_subset_mask(rng_m, B, L, counts, window=window)
    mask = jnp.logical_and(mask, jnp.logical_not(protected))
    src = jnp.where(mask, jnp.asarray(C.IDX_MSK, tokens.dtype), tokens)
    return Corrupted(src=src, mask=mask, num_masked=mask.sum(axis=-1))


def pair_protected_mask(tokens: jnp.ndarray, cdr_index: jnp.ndarray,
                        protect_pads: bool = False) -> jnp.ndarray:
    """Build the protected mask for the pair grid: CDR slots, and optionally
    grid pads (mouse fine-tune mode, oas_pair_dataset_new.py:414-418)."""
    protected = jnp.broadcast_to(cdr_index != 0, tokens.shape)
    if protect_pads:
        protected = jnp.logical_or(protected, tokens == C.IDX_PAD)
    return protected
