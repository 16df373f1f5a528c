"""PRNG helpers for hot training paths.

The OA-ARDM corruption draws must stay on threefry (bit-stable masking
across backends and rounds), but dropout masks only need to be
Bernoulli(1-p) — any counter-based generator gives statistically
identical training. XLA's RngBitGenerator is substantially cheaper than
threefry arithmetic on TPU: measured on the flagship B=128 pretrain step
(docs/train_breakdown_b128.json, TPU v5e), threefry dropout costs
~12 ms/step of 104.5 ms and re-keying the dropout stream onto 'rbg'
recovers ~8.5 ms (+2.4 MFU points) with masking draws untouched.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def rbg_dropout_key(k):
    """Derive an 'rbg'-impl key from a threefry (or raw uint32) key.

    Pure function of the incoming key, so jitted steps that take a
    threefry key stay deterministic per (key, backend). Only use for
    dropout-style noise: rbg's split/fold_in have weaker stream-
    independence guarantees than threefry, which is fine for Bernoulli
    masks but not for anything semantics-bearing.
    """
    kd = k
    if jnp.issubdtype(k.dtype, jax.dtypes.prng_key):
        kd = jax.random.key_data(k)
    kd = kd.ravel().astype(jnp.uint32)
    data = jnp.concatenate([kd, kd ^ jnp.uint32(0x9E3779B9)])
    return jax.random.wrap_key_data(data, impl='rbg')
