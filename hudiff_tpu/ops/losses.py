"""OA-ARDM losses: masked cross-entropy with Hoogeboom reweighting.

Pure-jnp re-implementations of utils/loss.py. The reference gathers masked
tokens with data-dependent ``masked_select``; on TPU we keep static shapes and
compute mask-weighted reductions instead — numerically identical.

Reweighting semantics preserved from the reference (incl. SURVEY.md §5.5-5.6
quirks): the Hoogeboom term multiplies each masked token's CE by
``n_positions / t`` where ``n_positions`` is the *padded* grid length of the
chain block and ``t`` the per-sample masked count (pair model: the combined
H+L count for both chains).
"""
from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from .. import constants as C


def token_ce(logits: jnp.ndarray, targets: jnp.ndarray) -> jnp.ndarray:
    """Per-position cross entropy, float32. logits [.., V], targets [..]."""
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    return -jnp.take_along_axis(logp, targets[..., None].astype(jnp.int32),
                                axis=-1)[..., 0]


def masked_mean(values: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Mean of ``values`` where ``mask`` is True (0 if mask empty)."""
    mask = mask.astype(values.dtype)
    denom = jnp.maximum(mask.sum(), 1.0)
    return (values * mask).sum() / denom


def masked_accuracy(logits: jnp.ndarray, targets: jnp.ndarray,
                    mask: jnp.ndarray) -> jnp.ndarray:
    pred = jnp.argmax(logits, axis=-1)
    return masked_mean((pred == targets).astype(jnp.float32), mask)


def _reweighted_ce(ce: jnp.ndarray, mask: jnp.ndarray, t: jnp.ndarray,
                   n_positions: int) -> jnp.ndarray:
    """Mean over masked tokens of ``n_positions / t_b * ce`` (per-sample t)."""
    w = (n_positions / jnp.maximum(t, 1).astype(jnp.float32))[:, None]
    return masked_mean(ce * w, mask)


def pair_oardm_loss(logits: jnp.ndarray, targets: jnp.ndarray,
                    mask: jnp.ndarray, cdr_mask: jnp.ndarray,
                    reweight: bool = True) -> Dict[str, jnp.ndarray]:
    """Merged H+L loss (reference OasMaskedCrossEntropyLoss, loss.py:138-200).

    mask: the OA-ARDM corruption mask; cdr_mask: CDR positions (always given
    unmasked to the model; supervised separately).
    """
    ce = token_ce(logits, targets)
    t = mask.sum(axis=-1)
    nll = masked_mean(ce, mask)
    cdr = masked_mean(ce, cdr_mask)
    ce_loss = _reweighted_ce(ce, mask, t, logits.shape[1]) if reweight else nll
    return {'ce': ce_loss, 'nll': nll, 'cdr_ce': cdr,
            'accuracy': masked_accuracy(logits, targets, mask)}


def pair_oardm_split_loss(logits: jnp.ndarray, targets: jnp.ndarray,
                          mask: jnp.ndarray, cdr_mask: jnp.ndarray,
                          l_weight: float = 1.0, reweight: bool = True
                          ) -> Dict[str, jnp.ndarray]:
    """Split H / L loss (reference OasMaskedSplitCrossEntropyLoss,
    loss.py:26-135). Both chains are reweighted by the combined H+L masked
    count but by their own padded length; the light terms get ``l_weight``."""
    H = C.HEAVY_LEN
    ce = token_ce(logits, targets)
    h_ce, l_ce = ce[:, :H], ce[:, H:]
    h_mask, l_mask = mask[:, :H], mask[:, H:]
    h_cdr, l_cdr = cdr_mask[:, :H], cdr_mask[:, H:]
    t_total = mask.sum(axis=-1)

    h_nll = masked_mean(h_ce, h_mask)
    l_nll = masked_mean(l_ce, l_mask)
    h_cdr_loss = masked_mean(h_ce, h_cdr)
    l_cdr_loss = masked_mean(l_ce, l_cdr) * l_weight
    if reweight:
        h_loss = _reweighted_ce(h_ce, h_mask, t_total, H)
        l_loss = _reweighted_ce(l_ce, l_mask, t_total, logits.shape[1] - H) * l_weight
    else:
        h_loss, l_loss = h_nll, l_nll
    return {'h_ce': h_loss, 'h_nll': h_nll, 'h_cdr_ce': h_cdr_loss,
            'l_ce': l_loss, 'l_nll': l_nll, 'l_cdr_ce': l_cdr_loss,
            'accuracy': masked_accuracy(logits, targets, mask)}


def heavy_oardm_loss(logits: jnp.ndarray, targets: jnp.ndarray,
                     mask: jnp.ndarray, cdr_mask: jnp.ndarray,
                     reweight: bool = True) -> Dict[str, jnp.ndarray]:
    """Heavy-only loss (reference OasMaskedHeavyCrossEntropyLoss,
    loss.py:203-264)."""
    ce = token_ce(logits, targets)
    t = mask.sum(axis=-1)
    nll = masked_mean(ce, mask)
    cdr = masked_mean(ce, cdr_mask)
    ce_loss = _reweighted_ce(ce, mask, t, logits.shape[1]) if reweight else nll
    return {'ce': ce_loss, 'nll': nll, 'cdr_ce': cdr,
            'accuracy': masked_accuracy(logits, targets, mask)}


def nano_finetune_ce(logits: jnp.ndarray, targets: jnp.ndarray,
                     cdr_mask: jnp.ndarray, mask: jnp.ndarray | None = None,
                     reconstruct: bool = False) -> Dict[str, jnp.ndarray]:
    """CDR CE (+ optional reconstruct term) for the nanobody fine-tune
    (reference OasMaskedNanoCrossEntropyLoss, loss.py:267-299)."""
    ce = token_ce(logits, targets)
    out = {'cdr_ce': masked_mean(ce, cdr_mask)}
    if reconstruct:
        assert mask is not None
        t = mask.sum(axis=-1)
        out['reconstruct_ce'] = _reweighted_ce(ce, mask, t, logits.shape[1])
    return out
