"""Reverse OA-ARDM sampling as a single jitted ``lax.scan``.

The reference humanization loop (antibody_scripts/sample.py:499-513,
nanobody_scripts/nanosample.py:318-329) runs one full model forward per masked
position per candidate, driven from Python — ~170 sequential host-dispatched
forwards per antibody. Here the whole reverse process is ONE device program:

- carry: ``(token_grid [B, L], rng)``;
- xs: per-step position columns from a ``[B, K]`` order matrix (so every
  candidate can use its own shuffled position order) + per-step PRNG keys;
- each step: full forward, gather logits at each candidate's position,
  ``jax.random.categorical`` over the allowed token prefix, scatter back.

``order`` is padded to a static K with -1; padded steps are no-ops, keeping
shapes static for XLA while supporting per-candidate mask counts.
The batch axis B is the free throughput axis (hundreds of candidates per
program) and can be sharded over a device mesh.
"""
from __future__ import annotations

import functools
from typing import Callable, Optional

import jax
import jax.numpy as jnp

from .. import constants as C

# Default sampling vocabulary: everything except <msk>
# (reference softmaxes logits[:, i, :22], sample.py:510-512).
SAMPLE_TOP = C.N_TOKENS - 1


def make_scan_sampler(apply_fn: Callable[..., jnp.ndarray], top: int = SAMPLE_TOP,
                      positions_per_step: int = 1):
    """Build a jittable sampler around ``apply_fn(tokens, ...) -> logits``.

    Args:
      apply_fn: model forward taking ``(tokens, *cond)`` and returning
        ``[B, L, V]`` logits. Do NOT close over parameter arrays — inside
        jit they embed as HLO constants (~330 MB executables, multi-minute
        compiles; docs/perf.md). Thread params through ``*cond`` instead,
        as make_jit_sampler does with its first cond entry.
      top: sample from ``logits[..., :top]``. The default 22 (all but <msk>)
        is what ALL four reference sampling scripts use regardless of
        checkpoint version (``[:len(all_token)-1]``, sample.py:510,
        sample_for_anti_cdr.py:192, nanosample.py:326,
        sample_for_nano_cdr.py:177); 20 is an optional stricter setting
        matching the fine-tune loss restriction (models/finetune.py slices
        logits[..., :N_AA]) that the reference itself never samples with.
      positions_per_step: resample this many positions per forward. 1 (the
        default) matches the reference's strictly-one-position-at-a-time
        reverse process (sample.py:499-513). k>1 is the standard OA-ARDM
        acceleration: the k positions of a step are drawn as conditionally
        independent given the current grid — an opt-in approximation that
        cuts the number of forwards (the dominant cost) by ~k at a small
        joint-dependency cost within each step.

    Returns:
      ``sampler(tokens, order, rng, *cond) -> tokens`` where ``order`` is
      ``[B, K]`` int32 position indices (-1 = no-op pad).
    """

    def sampler(tokens: jnp.ndarray, order: jnp.ndarray, rng: jax.Array,
                *cond) -> jnp.ndarray:
        B, L = tokens.shape
        K = order.shape[1]
        k = max(1, positions_per_step)
        n_steps = -(-K // k)
        if n_steps * k != K:  # pad order with no-op slots to a multiple of k
            order = jnp.concatenate(
                [order, jnp.full((B, n_steps * k - K), -1, order.dtype)],
                axis=1)
        step_rngs = jax.random.split(rng, n_steps)
        batch_ix = jnp.arange(B)

        if k == 1:
            def step(carry_tokens, xs):
                pos, step_rng = xs                      # pos: [B]
                valid = pos >= 0
                safe_pos = jnp.where(valid, pos, 0)
                logits = apply_fn(carry_tokens, *cond)  # [B, L, V]
                sel = jnp.take_along_axis(
                    logits, safe_pos[:, None, None], axis=1)[:, 0, :top]
                sampled = jax.random.categorical(step_rng,
                                                 sel.astype(jnp.float32))
                cur = carry_tokens[batch_ix, safe_pos]
                new_val = jnp.where(valid, sampled.astype(carry_tokens.dtype),
                                    cur)
                return carry_tokens.at[batch_ix, safe_pos].set(new_val), None

            xs = (order.T, step_rngs)
        else:
            def step(carry_tokens, xs):
                pos, step_rng = xs                      # pos: [B, k]
                valid = pos >= 0
                # invalid slots scatter out of bounds and are dropped, so a
                # padded slot can never clobber a real write in the same step
                safe_gather = jnp.where(valid, pos, 0)
                safe_scatter = jnp.where(valid, pos, L)
                logits = apply_fn(carry_tokens, *cond)  # [B, L, V]
                sel = jnp.take_along_axis(
                    logits, safe_gather[:, :, None], axis=1)[:, :, :top]
                sampled = jax.random.categorical(
                    step_rng, sel.astype(jnp.float32))  # [B, k]
                return carry_tokens.at[
                    batch_ix[:, None], safe_scatter].set(
                        sampled.astype(carry_tokens.dtype),
                        mode='drop'), None

            xs = (order.reshape(B, n_steps, k).transpose(1, 0, 2), step_rngs)

        final, _ = jax.lax.scan(step, tokens, xs)
        return final

    return sampler


def make_jit_sampler(model, params, top: int = SAMPLE_TOP,
                     has_chain_type: bool = True, mesh=None,
                     positions_per_step: int = 1):
    """Convenience: jitted end-to-end sampler for a denoiser model.

    Returns ``fn(tokens, region, chain_type, order, rng) -> tokens`` (chain
    type omitted for the nanobody model).

    When the model computes in bfloat16, parameters are cast to bfloat16 ONCE
    here instead of being re-cast from float32 inside every scan step —
    halving the per-step HBM weight traffic (the dominant cost at small
    sequence lengths).

    With ``mesh`` (a ('data', 'model') ``jax.sharding.Mesh``), the candidate
    batch is sharded over the 'data' axis and parameters are replicated, so
    one humanization round scales across chips — sharding never changes the
    sampled tokens, only where they're computed.

    ``positions_per_step`` forwards to make_scan_sampler: 1 (default) is the
    exact one-position-at-a-time reverse process; k>1 is the opt-in
    within-step-independence acceleration (~k× fewer forwards).
    """
    if getattr(model, 'dtype', jnp.float32) == jnp.bfloat16:
        def cast(x):
            if hasattr(x, 'dtype') and x.dtype == jnp.float32 and x.ndim >= 2:
                return x.astype(jnp.bfloat16)
            return x
        params = jax.tree_util.tree_map(cast, params)

    jit_kwargs = {}
    if mesh is not None and mesh.size > 1:
        from ..parallel import mesh as M
        params = jax.device_put(params, M.replicated(mesh))
        bsh = M.batch_sharding(mesh)
        rep = M.replicated(mesh)
        n_in = 4 if has_chain_type else 3
        jit_kwargs = dict(in_shardings=tuple([rep] + [bsh] * n_in + [rep]),
                          out_shardings=bsh)
    else:
        # checkpoint loaders hand back HOST (numpy) trees; committed device
        # buffers make every run() call reuse them, where numpy jit
        # arguments would re-upload the full weight tree per call
        params = jax.device_put(params)

    # Params are a jit ARGUMENT, not a closure capture: closed-over arrays
    # become embedded HLO constants, which bloats the flagship sampler
    # executable to ~330MB of baked-in weights and turns its compile (and
    # persistent-cache load) into minutes. As an argument the weights stay
    # one device buffer shared by every executable; they ride through the
    # scan sampler as the first ``*cond`` entry.
    def apply_fn(tokens, p, *cond):
        return model.apply(p, tokens, *cond)

    sampler = make_scan_sampler(apply_fn, top=top,
                                positions_per_step=positions_per_step)

    if has_chain_type:
        @functools.partial(jax.jit, **jit_kwargs)
        def _run(p, tokens, region, chain, order, rng):
            return sampler(tokens, order, rng, p, region, chain)

        def run(tokens, region, chain, order, rng):
            return _run(params, tokens, region, chain, order, rng)
    else:
        @functools.partial(jax.jit, **jit_kwargs)
        def _run(p, tokens, region, order, rng):
            return sampler(tokens, order, rng, p, region)

        def run(tokens, region, order, rng):
            return _run(params, tokens, region, order, rng)

    return run


def build_order(mask_positions, batch: int, rng: Optional[jax.Array] = None,
                shuffle: bool = True, pad_to: Optional[int] = None) -> jnp.ndarray:
    """[B, K] per-candidate position orders from a set of maskable positions.

    Each candidate gets an independent shuffle (the reference shuffles once and
    shares it across the batch, sample.py:497-498; independent orders increase
    candidate diversity at no cost inside the single device program).

    Delegates to ``build_order_rows`` with the same position set for every
    row, so the RNG-seeding logic lives in exactly one place.
    """
    import numpy as np
    pos = np.asarray(mask_positions, dtype=np.int32)
    return build_order_rows([pos] * batch, rng=rng, shuffle=shuffle,
                            pad_to=len(pos) if pad_to is None else pad_to)


def build_order_rows(position_sets, rng: Optional[jax.Array] = None,
                     shuffle: bool = True,
                     pad_to: Optional[int] = None) -> jnp.ndarray:
    """[B, K] orders where each row has its OWN maskable-position set.

    This is what lets one device program humanize MANY different antibodies
    at once: row b resamples exactly position_sets[b] (shuffled), padded to
    a shared static K with -1 no-ops. Shapes stay identical across calls, so
    the jitted scan compiles once for a whole dataset sweep.
    """
    import numpy as np
    K = pad_to if pad_to is not None else max(
        (len(p) for p in position_sets), default=0)
    out = np.full((len(position_sets), K), -1, dtype=np.int32)
    if shuffle:
        entropy = (np.asarray(jax.random.key_data(rng)).ravel().tolist()
                   if rng is not None else [0])
        rs = np.random.Generator(np.random.PCG64(
            np.random.SeedSequence([int(e) for e in entropy])))
    for b, pos in enumerate(position_sets):
        pos = np.asarray(pos, dtype=np.int32)
        out[b, : len(pos)] = rs.permutation(pos) if shuffle else pos
    return jnp.asarray(out)


def sequential_reference_sampler(model, params, top: int = SAMPLE_TOP,
                                 has_chain_type: bool = True):
    """Reference-style sampler: one host-dispatched jitted forward per
    position (the reference's cost structure, for benchmarking speedups).

    Calling convention mirrors ``make_jit_sampler``: the returned ``run`` is
    ``(tokens, region, chain, order, rng)`` for pair models and
    ``(tokens, region, order, rng)`` for nanobody models — no dummy chain
    argument in the nano case."""
    # params as a jit argument (not an embedded constant) for the same
    # compile-time/executable-size reason as make_jit_sampler; committed to
    # the device once so numpy checkpoint trees don't re-upload per forward
    params = jax.device_put(params)
    _fwd = jax.jit(lambda p, t, *cond: model.apply(p, t, *cond))

    def fwd(t, *cond):
        return _fwd(params, t, *cond)

    def _run(tokens, cond, order, rng):
        import numpy as np
        tokens = np.asarray(tokens).copy()
        order0 = np.asarray(order)[0]
        for pos in order0:
            if pos < 0:
                continue
            logits = fwd(jnp.asarray(tokens), *cond)
            rng, sub = jax.random.split(rng)
            sel = logits[:, pos, :top].astype(jnp.float32)
            samp = jax.random.categorical(sub, sel)
            tokens[:, pos] = np.asarray(samp)
        return jnp.asarray(tokens)

    if has_chain_type:
        def run(tokens, region, chain, order, rng):
            return _run(tokens, (region, chain), order, rng)
    else:
        def run(tokens, region, order, rng):
            return _run(tokens, (region,), order, rng)
    return run
