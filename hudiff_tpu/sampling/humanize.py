"""Humanization CLIs: antibody (paired) and nanobody.

TPU-native rebuild of the reference sampling engines
(antibody_scripts/sample.py, sample_for_anti_cdr.py,
nanobody_scripts/nanosample.py, sample_for_nano_cdr.py):

- input grids come from the numbering layer (ANARCI if present, else the
  built-in consensus aligner);
- masking variants: pretrain = all framework slots (CDR_INDEX == 0);
  fine-tune = Kabat-no-vernier framework slots minus grid pads
  (sample.py:142-179);
- the whole reverse process runs as ONE jitted lax.scan per batch of
  candidates (sampling/sampler.py) instead of ~170 host-dispatched forwards;
- candidate selection by preservation vs the parental sequence
  (select_the_most_similarity_seq, sample.py:352-367) done on the grids.

Usage:
  python -m hudiff_tpu.sampling.humanize ab --ckpt CKPT \
      --data-fpath humanization_pair_data_filter.csv --batch-size 64
  python -m hudiff_tpu.sampling.humanize ab --ckpt CKPT --hseq ... --lseq ...
  python -m hudiff_tpu.sampling.humanize nano --ckpt CKPT --vhh-seq ...
"""
from __future__ import annotations

import argparse
import os
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from .. import constants as C
from ..models.denoiser import AntiTFNet, DenoiserConfig, NanoAntiTFNet
from ..numbering import align as AL
from ..numbering import imgt as IMGT
from ..tokenizer import Tokenizer
from ..training import checkpoints as CKPT
from ..training.logger import get_logger, get_new_log_dir, seed_all
from . import sampler as S

_TOK = Tokenizer()


# ---------------------------------------------------------------------------
# Input construction
# ---------------------------------------------------------------------------

def pair_input(h_seq: str, l_seq: str, finetune: bool = False
               ) -> Optional[Dict[str, np.ndarray]]:
    """Build the 291-grid input for one antibody
    (reference batch_input_element, sample.py:142-179)."""
    # reject fragments / non-antibody chains the way ANARCI numbering
    # failure would in the reference (scores: real domains ~500, junk <10)
    try:
        h_scores = AL.profile_scores(h_seq)
        _, _, h_score = AL.detect_chain_type(h_seq, h_scores)
        l_scores = AL.profile_scores(l_seq)
        _, _, l_score = AL.detect_chain_type(l_seq, l_scores)
        # kappa/lambda by direct K-vs-L profile comparison (never forced to
        # kappa when the overall best profile mis-scores as heavy); reuses
        # the same alignment pass
        l_group, l_margin = AL.classify_light(l_seq, l_scores)
    except (ValueError, TypeError):
        return None  # unalignable / non-string input (NaN CSV cells etc.)
    if h_score < AL.MIN_CHAIN_SCORE or l_score < AL.MIN_CHAIN_SCORE:
        return None
    if AL.is_confident_heavy(l_scores) or AL.is_confident_light(h_scores):
        return None  # a true heavy chain in the light slot or light chain
        # in the heavy slot (swapped/pasted inputs) — distinct from a
        # borderline chain, which proceeds via classify_light
        # (round-2 weak #3); HuAb348-calibrated margins in align.py
    AL.warn_ambiguous_light(l_group, l_margin)
    h = IMGT.grid_string(h_seq, heavy=True, chain_hint='H')
    l = IMGT.grid_string(l_seq, heavy=False, chain_hint=l_group)
    if h is None or l is None:
        return None

    tokens = np.concatenate([_TOK.seq2idx(h['grid']), _TOK.seq2idx(l['grid'])])
    region = np.concatenate([C.HEAVY_REGION_INDEX, C.LIGHT_REGION_INDEX])
    chain = np.asarray([C.CHAIN_TYPES['H'], C.CHAIN_TYPES[l_group]], np.int32)

    if finetune:
        cdr = np.concatenate([C.HEAVY_CDR_KABAT_NO_VERNIER,
                              C.LIGHT_CDR_KABAT_NO_VERNIER])
        mask = (cdr == 0) & (tokens != C.IDX_PAD)
    else:
        cdr = np.concatenate([C.HEAVY_CDR_INDEX, C.LIGHT_CDR_INDEX])
        mask = cdr == 0
    positions = np.nonzero(mask)[0].astype(np.int32)
    src = tokens.copy()
    src[mask] = C.IDX_MSK
    # pad_to: static per-mode upper bound on masked slots, so the jitted
    # scan sampler compiles ONCE per mode instead of per masked-count
    return {'tokens': src, 'clean': tokens, 'region': region, 'chain': chain,
            'positions': positions, 'pad_to': int(np.count_nonzero(cdr == 0)),
            'aho_h': h['aho'], 'aho_l': l['aho'],
            'h_grid': h['grid'], 'l_grid': l['grid'], 'l_group': l_group}


def pair_inpaint_input(h_seq: str, l_seq: str
                       ) -> Optional[Dict[str, np.ndarray]]:
    """Germline-graft inpainting init (reference batch_inpaint_input_element,
    sample.py:286-310): graft the parental CDRs onto the nearest human
    germline (numbering/germline.py), freeze the framework slots where the
    parental residue already equals the germline, and resample every other
    framework slot. Falls back to the chain-type consensus as the template
    when the germline graft is unavailable for a chain.

    Reuses the grids pair_input already aligned — no second alignment pass.
    """
    from ..numbering import consensus as CONS
    from ..numbering import germline as G
    base = pair_input(h_seq, l_seq, finetune=False)
    if base is None:
        return None
    h_grid = np.asarray(list(base['h_grid']))
    l_grid = np.asarray(list(base['l_grid']))
    l_group = base['l_group']

    def consensus_identity_slots(grid: np.ndarray, aho: str,
                                 profile: str) -> np.ndarray:
        """Fallback template: grid slots where the parental residue equals
        the chain-type consensus at the same AHo column (both AHo-aligned,
        so columns correspond; the k-th residue of the AHo alignment
        occupies the k-th occupied grid slot)."""
        par_aho = np.asarray(list(aho))
        cons_arr = np.asarray(list(CONS.CONSENSUS[profile][0]))
        identity_aho = par_aho == cons_arr
        occ_slots = np.nonzero(grid != '-')[0]
        res_cols = np.nonzero(par_aho != '-')[0]
        n = min(len(occ_slots), len(res_cols))
        ident_grid = np.zeros(len(grid), bool)
        ident_grid[occ_slots[:n]] = identity_aho[res_cols[:n]]
        return ident_grid

    def identity_slots(grid: np.ndarray, aho: str, group: str,
                       profile: str) -> np.ndarray:
        """Frozen slots: parental residue equals its germline graft
        (reference graft_chain identity_pos_list, sample.py:217-226)."""
        try:
            g = G.graft_cdrs(grid, group)['grid']
        except ValueError:
            return consensus_identity_slots(grid, aho, profile)
        return (grid == g) & (grid != '-')

    identity = np.concatenate([
        identity_slots(h_grid, base['aho_h'], 'H', 'H'),
        identity_slots(l_grid, base['aho_l'], l_group, l_group)])

    cdr = np.concatenate([C.HEAVY_CDR_INDEX, C.LIGHT_CDR_INDEX])
    # resample every framework slot not frozen by template identity —
    # including unoccupied insertion slots, exactly like the reference mask
    # (h_l_mask = CDR_INDEX==0 & init==pad, sample.py:293-300)
    mask = (cdr == 0) & ~identity
    positions = np.nonzero(mask)[0].astype(np.int32)
    src = base['clean'].copy()
    src[mask] = C.IDX_MSK
    out = dict(base)
    out.update({'tokens': src, 'positions': positions,
                'pad_to': int(np.count_nonzero(cdr == 0))})
    return out


def _is_heavy_type(seq) -> bool:
    """True when ``seq`` is a string that aligns as a heavy-group chain above
    the fragment floor — the acceptance test behind nano_input and the
    nano FASTA record scan."""
    if not isinstance(seq, str) or not seq.strip():
        return False
    try:
        group, _, score = AL.detect_chain_type(seq)
    except ValueError:
        return False
    return group == 'H' and score >= AL.MIN_CHAIN_SCORE


def nano_input(vhh_seq: str, finetune: bool = False, inpaint: bool = False
               ) -> Optional[Dict[str, np.ndarray]]:
    """152-grid input for one nanobody
    (reference batch_input_element, nanosample.py:124-149)."""
    try:
        group, _, score = AL.detect_chain_type(vhh_seq)
    except (ValueError, TypeError):
        return None  # unalignable / non-string input
    if score < AL.MIN_CHAIN_SCORE:
        return None  # fragment / non-antibody input
    if group != 'H':
        # a kappa/lambda light chain aligns fine but is NOT a nanobody; the
        # chain_hint below bypasses grid_string's heavy gate, so the gate
        # must be applied here (the reference rejects via abnumber chain
        # typing, sample_for_nano_cdr.py:32-46)
        return None
    h = IMGT.grid_string(vhh_seq, heavy=True, chain_hint='VHH')
    if h is None:
        return None
    tokens = _TOK.seq2idx(h['grid'])
    region = np.asarray(C.HEAVY_REGION_INDEX)
    if inpaint:
        cdr = C.INPAINT_HEAVY_CDR_INDEX
        mask = cdr == 0
    elif finetune:
        cdr = C.HEAVY_CDR_KABAT_NO_VERNIER
        mask = (cdr == 0) & (tokens != C.IDX_PAD)
    else:
        cdr = C.HEAVY_CDR_INDEX
        mask = cdr == 0
    positions = np.nonzero(mask)[0].astype(np.int32)
    src = tokens.copy()
    src[mask] = C.IDX_MSK
    return {'tokens': src, 'clean': tokens, 'region': region,
            'positions': positions, 'pad_to': int(np.count_nonzero(cdr == 0)),
            'aho': h['aho']}


# ---------------------------------------------------------------------------
# Selection / preservation metrics (abnumber-free: compare on grids)
# ---------------------------------------------------------------------------

def grid_identity(a: np.ndarray, b: np.ndarray) -> float:
    """Fraction of identical residues over slots occupied in either grid."""
    occ = (a != C.IDX_PAD) | (b != C.IDX_PAD)
    if occ.sum() == 0:
        return 0.0
    return float(((a == b) & occ).sum() / occ.sum())


def select_most_similar(parental: np.ndarray, candidates: np.ndarray) -> int:
    """Index of the candidate grid most similar to the parental grid
    (reference select_the_most_similarity_seq, sample.py:352-367)."""
    scores = [grid_identity(parental, cand) for cand in candidates]
    return int(np.argmax(scores))


# ---------------------------------------------------------------------------
# Model loading
# ---------------------------------------------------------------------------

def load_denoiser(ckpt_path: str, kind: str, use_bf16: bool = True):
    """Load a denoiser from an Orbax run dir or a reference torch .pt file.

    Torch checkpoints: 'pretrain' payloads carry ['config']['model'] +
    ['model']; 'finetune' payloads carry ['pretrain_config'] + ['model']
    (reference sample.py:446-454)."""
    dtype = jnp.bfloat16 if use_bf16 else jnp.float32
    if ckpt_path.endswith(('.pt', '.pth', '.ckpt')):
        payload = CKPT.load_torch_checkpoint(ckpt_path)
        cfg_dict = payload.get('pretrain_config',
                               payload.get('infilling_params',
                                           payload.get('config')))
        model_cfg = DenoiserConfig.from_dict(
            dict(cfg_dict['model'] if 'model' in cfg_dict else cfg_dict))
        state_dict = payload['model']
        # nb fine-tune checkpoints carry the whole framework; extract the
        # infilling denoiser by prefix (reference get_multi_model_state,
        # nanosample.py:185-193)
        if any(k.startswith('infilling_pretrain.') for k in state_dict):
            state_dict = {k.partition('infilling_pretrain.')[2]: v
                          for k, v in state_dict.items()
                          if k.startswith('infilling_pretrain.')}
            finetuned = True
        else:
            finetuned = 'pretrain_config' in payload
        variables = CKPT.convert_torch_denoiser(state_dict, pair=(kind == 'pair'),
                                                nhead=model_cfg.nhead)
    else:
        restored = CKPT.restore(ckpt_path)
        meta_cfg = restored['meta'].get('config', {})
        model_cfg = DenoiserConfig.from_dict(meta_cfg.get('model', {}))
        # the pretrain loop stores full Flax variables ({'params': ...}, from
        # model.init) in the payload's 'params' slot — don't double-wrap
        tree = restored['payload']['params']
        variables = tree if 'params' in tree else {'params': tree}
        finetuned = bool(meta_cfg.get('finetuned', False))
    model = (AntiTFNet if kind == 'pair' else NanoAntiTFNet)(model_cfg, dtype=dtype)
    return model, variables, finetuned


# ---------------------------------------------------------------------------
# Batched humanization
# ---------------------------------------------------------------------------


def load_mouse_pairs(data_fpath: str):
    """(name, h_seq, l_seq) rows from a mouse-pair CSV (shared by the model
    CLI and the graft baseline). Rows with missing/NaN sequences are
    skipped, matching the model path's skip-on-unalignable behavior."""
    import pandas as pd
    df = pd.read_csv(data_fpath)
    mouse = df[df['type'] == 'mouse'] if 'type' in df.columns else df
    out = []
    for i, r in enumerate(mouse.itertuples()):
        name = str(getattr(r, 'name', i))
        h = getattr(r, 'h_seq', None)
        l = getattr(r, 'l_seq', None)
        if not isinstance(h, str) or not isinstance(l, str):
            continue
        out.append((name, h, l))
    return out


def _bucket_order_width(k_used: int, cap: int) -> int:
    """Static order width for the jitted scan: the batch's real masked-slot
    maximum rounded up to a multiple of 32, capped at the mode maximum.

    The scan pays one FULL forward per order column, padded or not — an
    inpaint run that only resamples ~55 slots must not execute the FR
    mode's 185 steps. Bucketing keeps the compile count bounded (<=6
    variants per mode) while skipping the no-op tail.
    """
    if k_used >= cap:
        return cap
    return min(cap, ((max(k_used, 1) + 31) // 32) * 32)


def _packed_pad_to(inputs) -> int:
    """Bucketed static order width for a packed batch."""
    live = [inp for inp in inputs if inp is not None]
    return _bucket_order_width(
        max((len(inp['positions']) for inp in live), default=0),
        max((inp['pad_to'] for inp in live), default=1))


def _bucket_batch(n: int, cap: int) -> int:
    """Power-of-two bucketed device batch for a packed stream: a 4-row
    stream must not pad to a 256-row program (64x wasted compute per
    round), but per-exact-size shapes would recompile every sweep. Powers
    of two cap the distinct compiled sizes at log2(cap) per process."""
    b = 1
    while b < n:
        b *= 2
    return max(1, min(b, cap))


def iter_packed_chunks(humanizer, stream, pad_to: int):
    """Drive a packed ``(key, inp)`` stream through bucketed
    ``device_batch``-capped programs, yielding ``(chunk, sampled_rows)``
    per device round.

    THE one definition of the pack-rows-into-chunks semantics shared by
    PairHumanizer.humanize_many, NanoHumanizer.humanize_many, and the
    serving coalescer — so padding/chunking changes can never diverge the
    CLI and serving paths.

    Batch policy: the smallest ALREADY-COMPILED bucket that fits, else the
    stream's own power-of-two bucket. A small first sweep gets a
    right-sized program (a 2-antibody CLI run must not pad to 256 rows),
    while the shrinking survivor waves of a retry loop reuse the big first-
    wave program instead of compiling a new smaller one per wave — on a
    tunneled backend a fresh compile costs minutes, a padded round seconds.
    """
    if not stream:
        return
    need = _bucket_batch(len(stream), humanizer.device_batch)
    used = getattr(humanizer, '_compiled_batches', None)
    if used is None:
        used = humanizer._compiled_batches = set()
    # programs are cached per (batch, pad_to): a big batch compiled at a
    # DIFFERENT pad_to is not warm for this stream, so only same-pad_to
    # entries count as reusable
    fits = [b for b, p in used if p == pad_to and b >= need]
    B = min(fits) if fits else need
    for s in range(0, len(stream), B):
        chunk = stream[s: s + B]
        yield chunk, humanizer.sample_rows([inp for _, inp in chunk], pad_to,
                                           batch=B)
        # registered only after a SUCCESSFUL round: a failing compile/shape
        # must not poison the reuse policy toward the failing size
        used.add((B, pad_to))


def _maybe_mesh(shard: bool):
    """('data', 'model'=1) mesh over all devices when sharding is requested
    and more than one device exists; sharding never changes sampled tokens."""
    if not shard or jax.device_count() <= 1:
        return None
    from ..parallel.mesh import make_mesh
    return make_mesh(model_axis=1)

class PairHumanizer:
    def __init__(self, model, variables, batch_size: int = 16,
                 shuffle: bool = True, seed: int = 2023, mesh=None,
                 device_batch: Optional[int] = None,
                 positions_per_step: int = 1):
        self.batch_size = batch_size
        # packed-mode device batch: rows from MANY antibodies share one
        # program of this size (defaults to batch_size = unpacked shape)
        self.device_batch = device_batch or batch_size
        self.shuffle = shuffle
        self.rng = jax.random.PRNGKey(seed)
        self.run = S.make_jit_sampler(model, variables, mesh=mesh,
                                      positions_per_step=positions_per_step)

    def __call__(self, h_seq: str, l_seq: str, finetune: bool = False,
                 inpaint: bool = False) -> Optional[Dict[str, object]]:
        inp = (pair_inpaint_input(h_seq, l_seq) if inpaint
               else pair_input(h_seq, l_seq, finetune=finetune))
        if inp is None:
            return None
        B = self.batch_size
        tokens = jnp.asarray(np.tile(inp['tokens'], (B, 1)))
        region = jnp.asarray(np.tile(inp['region'], (B, 1)))
        chain = jnp.asarray(np.tile(inp['chain'], (B, 1)))
        self.rng, r_ord, r_samp = jax.random.split(self.rng, 3)
        order = S.build_order(inp['positions'], B, rng=r_ord,
                              shuffle=self.shuffle,
                              pad_to=_bucket_order_width(
                                  len(inp['positions']), inp['pad_to']))
        out = np.asarray(self.run(tokens, region, chain, order, r_samp))
        h_seqs = [_TOK.idx2seq(row[: C.HEAVY_LEN]) for row in out]
        l_seqs = [_TOK.idx2seq(row[C.HEAVY_LEN:]) for row in out]
        best = select_most_similar(inp['clean'], out)
        return {'h_seqs': h_seqs, 'l_seqs': l_seqs, 'grids': out,
                'best_idx': best, 'best': (h_seqs[best], l_seqs[best])}

    def sample_rows(self, rows: List[Dict], pad_to: int,
                    batch: Optional[int] = None) -> np.ndarray:
        """One device call over heterogeneous packed rows.

        ``rows`` may mix DIFFERENT antibodies: each row dict carries its own
        tokens/region/chain/positions. The per-row order matrix
        (sampler.build_order_rows) makes the single jitted scan resample the
        right slots for each row. Short final chunks are padded by repeating
        the last row (the extra outputs are discarded), so every call has
        the same [B, L] shape and the program compiles once per dataset
        sweep. ``batch`` (from _bucket_batch) right-sizes the program for
        small streams; default is the full device_batch.
        """
        n = len(rows)
        B = batch or self.device_batch
        assert 0 < n <= B
        padded = rows + [rows[-1]] * (B - n)
        tokens = jnp.asarray(np.stack([r['tokens'] for r in padded]))
        region = jnp.asarray(np.stack([r['region'] for r in padded]))
        chain = jnp.asarray(np.stack([r['chain'] for r in padded]))
        self.rng, r_ord, r_samp = jax.random.split(self.rng, 3)
        order = S.build_order_rows([r['positions'] for r in padded],
                                   rng=r_ord, shuffle=self.shuffle,
                                   pad_to=pad_to)
        out = self.run(tokens, region, chain, order, r_samp)
        return np.asarray(out)[:n]

    def humanize_many(self, inputs: List[Optional[Dict]],
                      rows_per_input: int,
                      pad_to: Optional[int] = None) -> List[Optional[Dict]]:
        """Packed dataset-scale humanization: every antibody gets
        ``rows_per_input`` candidate rows, and rows from many antibodies
        share device programs of size ``batch_size``.

        The reference (and the unpacked path) issues one device round per
        antibody; at dataset scale (HuAb348: 348 antibodies) that leaves the
        MXU idle on small batches. Packing keeps the batch axis full
        regardless of per-antibody candidate counts.
        """
        stream: List[Tuple[int, Dict]] = []
        for i, inp in enumerate(inputs):
            if inp is None:
                continue
            stream.extend([(i, inp)] * rows_per_input)
        pad_to = pad_to or _packed_pad_to(inputs)
        grids: Dict[int, List[np.ndarray]] = {}
        for chunk, out in iter_packed_chunks(self, stream, pad_to):
            for (i, _), row in zip(chunk, out):
                grids.setdefault(i, []).append(row)
        results: List[Optional[Dict]] = []
        for i, inp in enumerate(inputs):
            if inp is None or i not in grids:
                results.append(None)
                continue
            out = np.stack(grids[i])
            h_seqs = [_TOK.idx2seq(row[: C.HEAVY_LEN]) for row in out]
            l_seqs = [_TOK.idx2seq(row[C.HEAVY_LEN:]) for row in out]
            best = select_most_similar(inp['clean'], out)
            results.append({'h_seqs': h_seqs, 'l_seqs': l_seqs, 'grids': out,
                            'best_idx': best,
                            'best': (h_seqs[best], l_seqs[best])})
        return results


class NanoHumanizer:
    def __init__(self, model, variables, batch_size: int = 16,
                 shuffle: bool = True, seed: int = 2023, mesh=None,
                 device_batch: Optional[int] = None,
                 positions_per_step: int = 1):
        self.batch_size = batch_size
        self.device_batch = device_batch or batch_size
        self.shuffle = shuffle
        self.rng = jax.random.PRNGKey(seed)
        self.run = S.make_jit_sampler(model, variables, has_chain_type=False,
                                      mesh=mesh,
                                      positions_per_step=positions_per_step)

    def sample_rows(self, rows: List[Dict], pad_to: int,
                    batch: Optional[int] = None) -> np.ndarray:
        """One device call over heterogeneous packed nanobody rows
        (see PairHumanizer.sample_rows)."""
        n = len(rows)
        B = batch or self.device_batch
        assert 0 < n <= B
        padded = rows + [rows[-1]] * (B - n)
        tokens = jnp.asarray(np.stack([r['tokens'] for r in padded]))
        region = jnp.asarray(np.stack([r['region'] for r in padded]))
        self.rng, r_ord, r_samp = jax.random.split(self.rng, 3)
        order = S.build_order_rows([r['positions'] for r in padded],
                                   rng=r_ord, shuffle=self.shuffle,
                                   pad_to=pad_to)
        out = self.run(tokens, region, order, r_samp)
        return np.asarray(out)[:n]

    def humanize_many(self, inputs: List[Optional[Dict]],
                      rows_per_input: int,
                      pad_to: Optional[int] = None) -> List[Optional[Dict]]:
        """Packed dataset-scale humanization with the nanobody validity
        filter applied per antibody (reference nanosample.py:338-353)."""
        stream: List[Tuple[int, Dict]] = []
        for i, inp in enumerate(inputs):
            if inp is None:
                continue
            stream.extend([(i, inp)] * rows_per_input)
        pad_to = pad_to or _packed_pad_to(inputs)
        grids: Dict[int, List[np.ndarray]] = {}
        for chunk, out in iter_packed_chunks(self, stream, pad_to):
            for (i, _), row in zip(chunk, out):
                grids.setdefault(i, []).append(row)
        results: List[Optional[Dict]] = []
        for i, inp in enumerate(inputs):
            if inp is None or i not in grids:
                results.append(None)
                continue
            out = np.stack(grids[i])
            seqs = [_TOK.idx2seq(row) for row in out]
            # one native batch alignment crossing for all candidates instead
            # of N python DP runs (align.align_to_aho_batch)
            aligned = AL.align_to_aho_batch(seqs, 'H')
            valid_ix = [k for k, a in enumerate(aligned) if a is not None]
            if not valid_ix:
                results.append(None)
                continue
            g = out[valid_ix]
            vseqs = [seqs[k] for k in valid_ix]
            best = select_most_similar(inp['clean'], g)
            results.append({'seqs': vseqs, 'grids': g, 'best_idx': best,
                            'best': vseqs[best]})
        return results

    def __call__(self, vhh_seq: str, finetune: bool = False,
                 inpaint: bool = False, max_retry: int = 3
                 ) -> Optional[Dict[str, object]]:
        inp = nano_input(vhh_seq, finetune=finetune, inpaint=inpaint)
        if inp is None:
            return None
        B = self.batch_size
        tokens = jnp.asarray(np.tile(inp['tokens'], (B, 1)))
        region = jnp.asarray(np.tile(inp['region'], (B, 1)))
        for _ in range(max_retry):
            self.rng, r_ord, r_samp = jax.random.split(self.rng, 3)
            order = S.build_order(inp['positions'], B, rng=r_ord,
                                  shuffle=self.shuffle,
                                  pad_to=_bucket_order_width(
                                      len(inp['positions']), inp['pad_to']))
            out = np.asarray(self.run(tokens, region, order, r_samp))
            seqs = [_TOK.idx2seq(row) for row in out]
            # validity retry (reference nanosample.py:338-353): sequences must
            # still align as heavy chains; only valid candidates are returned
            # (and the best-of-batch is picked among them). One batched
            # alignment call for the whole candidate batch.
            aligned = AL.align_to_aho_batch(seqs, 'H')
            valid_ix = [i for i, a in enumerate(aligned) if a is not None]
            if valid_ix:
                grids = out[valid_ix]
                vseqs = [seqs[i] for i in valid_ix]
                best = select_most_similar(inp['clean'], grids)
                return {'seqs': vseqs, 'grids': grids, 'best_idx': best,
                        'best': vseqs[best]}
        return None


# ---------------------------------------------------------------------------
# CLI
# ---------------------------------------------------------------------------


def collect_unique(sample_fn, target: int, max_retry: int):
    """Resample until ``target`` unique candidates or the retry cap
    (reference loops to N distinct, sample.py:181-217).

    ``sample_fn() -> list-of-candidates | None`` (None = alignment/validity
    failure for the round). A None round is NOT terminal: the nanobody
    validity filter is stochastic (a round where every candidate fails the
    AHo re-alignment can be followed by a good round), so the loop keeps
    retrying — matching the packed loops, which ``continue`` on a None
    result. Returns ``(unique, failed)``; ``failed`` is True when at least
    one round returned None, so callers report a skip only via
    ``failed and not unique`` — the shared semantics behind the CLI loops,
    the Python api, and the HTTP service.
    """
    unique: list = []
    seen: set = set()
    failed = False
    for _ in range(max_retry):
        cands = sample_fn()
        if cands is None:
            failed = True
            continue
        _dedup_into(seen, unique, cands, target)
        if len(unique) >= target:
            break
    return unique, failed


def _dedup_into(seen: set, unique: list, cands, target: int) -> None:
    """Accumulate candidates into ``unique`` up to ``target``, skipping
    duplicates — the one definition of the dedup semantics shared by
    collect_unique and both packed dataset loops."""
    for c in cands:
        if c not in seen and len(unique) < target:
            seen.add(c)
            unique.append(c)


def _write_csv_header(path: str) -> None:
    with open(path, 'w', encoding='UTF-8') as f:
        f.write('Specific,name,hseq,lseq,\n')


def run_ab(args) -> str:
    import pandas as pd
    model, variables, finetuned = load_denoiser(args.ckpt, 'pair',
                                                use_bf16=not args.fp32)
    finetune = (args.ckpt_version == 'finetune') if args.ckpt_version else finetuned
    log_dir = get_new_log_dir(args.logdir, prefix=f'ab_humanize_{args.seed}')
    logger = get_logger('humanize', log_dir)
    save_fpath = os.path.join(log_dir, 'sample_humanization_result.csv')
    _write_csv_header(save_fpath)

    hum = PairHumanizer(model, variables, batch_size=args.batch_size,
                        shuffle=(args.sample_order == 'shuffle'),
                        seed=args.seed, mesh=_maybe_mesh(args.shard),
                        device_batch=max(args.pack_size, args.batch_size),
                        positions_per_step=args.positions_per_step)

    if args.fasta:
        # single-antibody humanization from a (complex) FASTA
        # (reference sample_for_anti_cdr.py:53-70)
        from ..eval.biophi import pair_from_fasta
        h_seq, l_seq = pair_from_fasta(args.fasta)
        pairs = [(os.path.basename(args.fasta), h_seq, l_seq)]
    elif args.hseq and args.lseq:
        pairs = [('input', args.hseq, args.lseq)]
    else:
        pairs = load_mouse_pairs(args.data_fpath)

    if len(pairs) > 1:
        _packed_pair_loop(hum, pairs, finetune, args, logger, save_fpath)
        _ab_epilogue(save_fpath, args, logger)
        logger.info('results: %s', save_fpath)
        return save_fpath

    for name, h_seq, l_seq in pairs:
        with open(save_fpath, 'a', encoding='UTF-8') as f:
            f.write(f'mouse,{name},{h_seq},{l_seq}\n')
        # resample with fresh orders until --sample-number unique candidates
        # or the retry cap
        def round_fn():
            res = hum(h_seq, l_seq, finetune=finetune,
                      inpaint=args.sample_method == 'inpaint')
            if res is None:
                return None
            return ([res['best']] if args.similarity_search
                    else list(zip(res['h_seqs'], res['l_seqs'])))

        target = 1 if args.similarity_search else args.sample_number
        unique, failed = collect_unique(round_fn, target, args.max_retry)
        if failed and not unique:
            logger.warning('could not align %s; skipped', name)
            continue
        with open(save_fpath, 'a', encoding='UTF-8') as f:
            for g_h, g_l in unique:
                f.write(f'humanization,{name}human_sample,{g_h},{g_l}\n')
        logger.info('humanized %s (%d candidates)', name, len(unique))
    _ab_epilogue(save_fpath, args, logger)
    logger.info('results: %s', save_fpath)
    return save_fpath


def _ab_epilogue(save_fpath: str, args, logger) -> None:
    """Post-run exports (reference sample.py:579-588): a paired FASTA for
    BioPhi OASis next to the CSV, and per-antibody FASTAs for structure
    prediction when --structure-fasta is set."""
    from ..eval import biophi as BP
    base = os.path.dirname(save_fpath)
    try:
        BP.sample_csv_to_fasta(save_fpath,
                               os.path.join(base, 'sample_identity.fa'),
                               version=args.fa_version)
    except Exception as e:  # noqa: BLE001 - exports must not kill the run
        logger.warning('fasta export failed: %s', e)
    if getattr(args, 'structure_fasta', False):
        try:
            import pandas as pd
            fa_dir = os.path.join(base, 'sample_human_fa')
            os.makedirs(fa_dir, exist_ok=True)
            df = pd.read_csv(save_fpath)
            human = df[df['Specific'] == 'humanization'].reset_index(
                drop=True)
            for i, r in human.iterrows():
                BP.write_pair_fasta(
                    [(str(r['name']), r['hseq'], r['lseq'])],
                    os.path.join(fa_dir, f'human_{i}.fasta'))
        except Exception as e:  # noqa: BLE001
            logger.warning('structure fasta export failed: %s', e)


def _packed_pair_loop(hum: PairHumanizer, pairs, finetune: bool, args,
                      logger, save_fpath: str) -> None:
    """Dataset-scale antibody humanization: candidate rows from every
    still-unfinished antibody are packed into shared device programs
    (PairHumanizer.humanize_many). Per-antibody semantics are unchanged —
    --batch-size candidates per round, unique-dedup to --sample-number,
    --max-retry rounds — only the device utilization differs."""
    n = len(pairs)
    inpaint = args.sample_method == 'inpaint'
    inputs: List[Optional[Dict]] = []
    for _, h_seq, l_seq in pairs:
        inputs.append(pair_inpaint_input(h_seq, l_seq) if inpaint
                      else pair_input(h_seq, l_seq, finetune=finetune))
    target = 1 if args.similarity_search else args.sample_number
    unique: List[list] = [[] for _ in range(n)]
    seen: List[set] = [set() for _ in range(n)]
    # one static scan width for the WHOLE run: recomputing per retry round
    # over the shrinking active set would trigger mid-run recompiles just to
    # trim a few no-op steps
    run_pad_to = _packed_pad_to(inputs)
    for _ in range(args.max_retry):
        active = [i for i in range(n)
                  if inputs[i] is not None and len(unique[i]) < target]
        if not active:
            break
        results = hum.humanize_many([inputs[i] for i in active],
                                    rows_per_input=args.batch_size,
                                    pad_to=run_pad_to)
        for i, res in zip(active, results):
            if res is None:
                continue
            cands = ([res['best']] if args.similarity_search
                     else list(zip(res['h_seqs'], res['l_seqs'])))
            _dedup_into(seen[i], unique[i], cands, target)
    with open(save_fpath, 'a', encoding='UTF-8') as f:
        for i, (name, h_seq, l_seq) in enumerate(pairs):
            # parental row always written (same as the unpacked path, which
            # writes it before attempting); humanization rows only on success
            f.write(f'mouse,{name},{h_seq},{l_seq}\n')
            if inputs[i] is None:
                logger.warning('could not align %s; skipped', name)
                continue
            for g_h, g_l in unique[i]:
                f.write(f'humanization,{name}human_sample,{g_h},{g_l}\n')
            logger.info('humanized %s (%d candidates)', name, len(unique[i]))


def run_nano(args) -> str:
    import pandas as pd
    model, variables, finetuned = load_denoiser(args.ckpt, 'heavy',
                                                use_bf16=not args.fp32)
    finetune = (args.ckpt_version == 'finetune') if args.ckpt_version else finetuned
    log_dir = get_new_log_dir(args.logdir, prefix=f'nano_humanize_{args.seed}')
    logger = get_logger('humanize', log_dir)
    save_fpath = os.path.join(log_dir, 'sample_humanization_result.csv')
    with open(save_fpath, 'w', encoding='UTF-8') as f:
        f.write('Specific,name,vhh_seq,\n')

    hum = NanoHumanizer(model, variables, batch_size=args.batch_size,
                        shuffle=(args.sample_order == 'shuffle'),
                        seed=args.seed, mesh=_maybe_mesh(args.shard),
                        device_batch=max(args.pack_size, args.batch_size),
                        positions_per_step=args.positions_per_step)

    if args.fasta:
        # first HEAVY-type record of a FASTA — actually type-checked, so a
        # complex FASTA whose first record is a light chain is not silently
        # humanized as a nanobody
        # (reference sample_for_nano_cdr.get_nano_seq_from_fasta, :32-46)
        from ..eval.biophi import read_fasta
        records = read_fasta(args.fasta)
        rec = next((r for r in records if _is_heavy_type(r[1])), None)
        if rec is None:
            raise SystemExit(
                f'no heavy-type record found in {args.fasta} '
                f'({len(records)} records scanned)')
        rows = [(rec[0].split()[0], rec[1])]
    elif args.vhh_seq:
        rows = [('input', args.vhh_seq)]
    else:
        df = pd.read_csv(args.data_fpath)
        col = 'vhhseq' if 'vhhseq' in df.columns else 'vhh_seq'
        # missing/non-string cells (NaN floats from pandas) are skipped with
        # a warning instead of crashing the whole dataset run — same guard
        # as load_mouse_pairs on the pair path
        rows = [(str(i), s) for i, s in enumerate(df[col])
                if isinstance(s, str) and s.strip()]
        if len(rows) < len(df):
            logger.warning('skipped %d rows with missing/non-string %s',
                           len(df) - len(rows), col)

    if len(rows) > 1:
        _packed_nano_loop(hum, rows, finetune, args, logger, save_fpath)
        logger.info('results: %s', save_fpath)
        return save_fpath

    for name, seq in rows:
        with open(save_fpath, 'a', encoding='UTF-8') as f:
            f.write(f'camel,{name},{seq}\n')
        # resample until --sample-number unique candidates or the retry cap
        def round_fn():
            res = hum(seq, finetune=finetune,
                      inpaint=args.sample_method == 'inpaint')
            if res is None:
                return None
            return [res['best']] if args.similarity_search else res['seqs']

        target = 1 if args.similarity_search else args.sample_number
        unique, failed = collect_unique(round_fn, target, args.max_retry)
        if failed and not unique:
            logger.warning('could not align/humanize %s; skipped', name)
            continue
        with open(save_fpath, 'a', encoding='UTF-8') as f:
            for s in unique:
                f.write(f'humanization,{name}human_sample,{s}\n')
        logger.info('humanized %s (%d candidates)', name, len(unique))
    logger.info('results: %s', save_fpath)
    return save_fpath


def _packed_nano_loop(hum: NanoHumanizer, rows, finetune: bool, args,
                      logger, save_fpath: str) -> None:
    """Dataset-scale nanobody humanization over packed device programs
    (NanoHumanizer.humanize_many); per-antibody semantics unchanged."""
    n = len(rows)
    inpaint = args.sample_method == 'inpaint'
    inputs: List[Optional[Dict]] = [
        nano_input(seq, finetune=finetune, inpaint=inpaint)
        for _, seq in rows]
    target = 1 if args.similarity_search else args.sample_number
    unique: List[list] = [[] for _ in range(n)]
    seen: List[set] = [set() for _ in range(n)]
    # one static scan width for the WHOLE run: recomputing per retry round
    # over the shrinking active set would trigger mid-run recompiles just to
    # trim a few no-op steps
    run_pad_to = _packed_pad_to(inputs)
    for _ in range(args.max_retry):
        active = [i for i in range(n)
                  if inputs[i] is not None and len(unique[i]) < target]
        if not active:
            break
        results = hum.humanize_many([inputs[i] for i in active],
                                    rows_per_input=args.batch_size,
                                    pad_to=run_pad_to)
        for i, res in zip(active, results):
            if res is None:
                continue
            cands = [res['best']] if args.similarity_search else res['seqs']
            _dedup_into(seen[i], unique[i], cands, target)
    with open(save_fpath, 'a', encoding='UTF-8') as f:
        for i, (name, seq) in enumerate(rows):
            f.write(f'camel,{name},{seq}\n')
            if inputs[i] is None or not unique[i]:
                logger.warning('could not align/humanize %s; skipped', name)
                continue
            for sq in unique[i]:
                f.write(f'humanization,{name}human_sample,{sq}\n')
            logger.info('humanized %s (%d candidates)', name, len(unique[i]))


def main(argv=None):
    # persistent XLA compile cache: repeat CLI runs skip the multi-minute
    # compiles on remote/tunneled backends (utils/compile_cache.py)
    from hudiff_tpu.utils.compile_cache import enable_compile_cache
    enable_compile_cache()
    p = argparse.ArgumentParser(description=__doc__)
    sub = p.add_subparsers(dest='cmd', required=True)
    for name in ('ab', 'nano'):
        q = sub.add_parser(name)
        q.add_argument('--ckpt', required=True)
        q.add_argument('--ckpt-version', choices=['pretrain', 'finetune'],
                       default=None)
        q.add_argument('--data-fpath', default=None)
        q.add_argument('--batch-size', type=int, default=16)
        q.add_argument('--sample-number', type=int, default=1)
        q.add_argument('--max-retry', type=int, default=8,
                       help='resampling rounds to reach --sample-number '
                            'unique candidates (reference sample.py:181-217)')
        q.add_argument('--seed', type=int, default=2023)
        q.add_argument('--sample-order', default='shuffle',
                       choices=['shuffle', 'sequential'])
        q.add_argument('--sample-method', default='FR',
                       choices=['FR', 'inpaint'])
        q.add_argument('--similarity-search', action='store_true', default=True)
        q.add_argument('--no-similarity-search', dest='similarity_search',
                       action='store_false')
        q.add_argument('--logdir', default='./logs')
        q.add_argument('--fp32', action='store_true')
        q.add_argument('--positions-per-step', type=int, default=1,
                       help='resample k positions per forward (k>1 = the '
                            'OA-ARDM within-step-independence acceleration, '
                            '~k x faster; 1 = exact reference semantics)')
        q.add_argument('--pack-size', type=int, default=256,
                       help='device batch for dataset-mode packed sampling: '
                            'rows from many antibodies share one program of '
                            'this size (per-antibody candidate count stays '
                            '--batch-size)')
        q.add_argument('--shard', action='store_true',
                       help='shard the candidate batch over all devices '
                            '(data-parallel sampling; identical results, '
                            'N-chip throughput)')
        q.add_argument('--fasta', default=None,
                       help='humanize the chain pair / nanobody in this FASTA')
        if name == 'ab':
            q.add_argument('--hseq', default=None)
            q.add_argument('--lseq', default=None)
            q.add_argument('--fa-version', default='v001',
                           help='name prefix for the exported BioPhi FASTA '
                                '(reference --fa_version)')
            q.add_argument('--structure-fasta', action='store_true',
                           help='also split per-antibody FASTAs for '
                                'structure prediction (reference '
                                '--structure)')
        else:
            q.add_argument('--vhh-seq', default=None)
    # model-free classic CDR-graft baseline (reference cdr_pair_grafting,
    # sample.py:370-376): germline FRs + parental CDRs, no diffusion model
    g = sub.add_parser('graft')
    g.add_argument('--hseq', default=None)
    g.add_argument('--lseq', default=None)
    g.add_argument('--data-fpath', default=None,
                   help='CSV of mouse pairs: graft the whole dataset '
                        '(reference --traditional_method, sample.py:370-376)')
    g.add_argument('--back-mutation', action='store_true',
                   help='back-mutate Kabat vernier-zone residues to parental')
    g.add_argument('--output', default=None, help='CSV path (default stdout)')
    args = p.parse_args(argv)
    if args.cmd == 'graft':
        return run_graft(args)
    seed_all(args.seed)
    if args.cmd == 'ab':
        return run_ab(args)
    return run_nano(args)


def run_graft(args):
    from ..numbering import germline as G
    rows = []
    if args.data_fpath:
        logger = get_logger('graft')
        for name, h_seq, l_seq in load_mouse_pairs(args.data_fpath):
            # always write the parental row (matches the model CLI path) so
            # the baseline CSV stays row-aligned even when a graft fails
            rows.append(('mouse', name, h_seq, l_seq))
            try:
                h, l = G.cdr_pair_grafting(h_seq, l_seq,
                                           back_mutation=args.back_mutation)
            except Exception as e:  # noqa: BLE001 - skip unalignable rows
                logger.warning('skipping graft for %s: %s', name, e)
                continue
            rows.append(('humanization', f'{name}human_sample', h, l))
    elif args.hseq and args.lseq:
        h, l = G.cdr_pair_grafting(args.hseq, args.lseq,
                                   back_mutation=args.back_mutation)
        rows.append(('cdr_graft', 'graft_sample', h, l))
    else:
        raise SystemExit('graft needs --hseq/--lseq or --data-fpath')
    text = 'Specific,name,hseq,lseq\n' + ''.join(
        f'{a},{b},{c},{d}\n' for a, b, c, d in rows)
    if args.output:
        with open(args.output, 'w') as f:
            f.write(text)
        print(args.output)
        return args.output
    print(text, end='')
    return None


if __name__ == '__main__':
    main()
