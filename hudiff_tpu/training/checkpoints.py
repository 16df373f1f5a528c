"""Orbax checkpointing with the reference's logical payload.

The reference saves ``{config, model, optimizer, scheduler, iteration}`` on
best validation loss (antibody_scripts/antibody_train.py:435-445). Here:
params + opt_state as an Orbax pytree, config/metadata as JSON alongside.
Also provides the PyTorch->JAX converter for released reference checkpoints.
"""
from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional

import jax
import numpy as np


def save(ckpt_dir: str, step: int, params, opt_state=None,
         config: Optional[dict] = None, extra: Optional[dict] = None) -> str:
    import orbax.checkpoint as ocp
    path = os.path.abspath(os.path.join(ckpt_dir, f'step_{step}'))
    payload = {'params': params}
    if opt_state is not None:
        payload['opt_state'] = opt_state
    # Materialize to host numpy: jax arrays carry device-topology metadata
    # that makes the checkpoint unrestorable on a different device count
    # (e.g. trained on an 8-chip mesh, sampled on 1 chip). At HuDiff scale
    # (<50M params) a host copy is cheap; multi-host sharded saves would
    # instead pass a template at restore.
    payload = jax.device_get(payload)
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, payload, force=True)
    meta = {'step': step, 'config': config or {}, **(extra or {})}
    with open(os.path.join(ckpt_dir, f'step_{step}.json'), 'w') as f:
        json.dump(meta, f, indent=2, default=float)
    _update_latest(ckpt_dir, step)
    return path


def restore(ckpt_dir: str, step: Optional[int] = None, template=None) -> Dict[str, Any]:
    import orbax.checkpoint as ocp
    if step is None:
        step = latest_step(ckpt_dir)
        if step is None:
            raise FileNotFoundError(f'no checkpoints under {ckpt_dir}')
    path = os.path.abspath(os.path.join(ckpt_dir, f'step_{step}'))
    import logging as _logging

    class _NoTemplateFilter(_logging.Filter):
        # template-less restore is the supported path for CLI loads (the
        # saved tree is the source of truth); drop orbax's UNSAFE warning
        def filter(self, record):
            return 'target tree to be provided' not in record.getMessage()

    flt = _NoTemplateFilter()
    _logging.getLogger('absl').addFilter(flt)
    try:
        with ocp.StandardCheckpointer() as ckptr:
            payload = ckptr.restore(path, template) if template is not None \
                else ckptr.restore(path)
    finally:
        _logging.getLogger('absl').removeFilter(flt)
    meta_path = os.path.join(ckpt_dir, f'step_{step}.json')
    meta = json.load(open(meta_path)) if os.path.exists(meta_path) else {'step': step}
    return {'payload': payload, 'meta': meta, 'step': step}


def latest_step(ckpt_dir: str) -> Optional[int]:
    marker = os.path.join(ckpt_dir, 'LATEST')
    if os.path.exists(marker):
        return int(open(marker).read().strip())
    steps = []
    if os.path.isdir(ckpt_dir):
        for name in os.listdir(ckpt_dir):
            if name.startswith('step_') and not name.endswith('.json'):
                try:
                    steps.append(int(name.split('_', 1)[1]))
                except ValueError:
                    pass
    return max(steps) if steps else None


def _update_latest(ckpt_dir: str, step: int) -> None:
    with open(os.path.join(ckpt_dir, 'LATEST'), 'w') as f:
        f.write(str(step))


# ---------------------------------------------------------------------------
# PyTorch -> JAX conversion for released reference checkpoints
# (hudiffab.pt / hudiffnb.pt). Host-side torch-cpu only.
# ---------------------------------------------------------------------------

def _strip_module_prefix(state_dict: dict) -> dict:
    """Drop DataParallel 'module.' prefixes (reference antibody_train.py:23-30)."""
    return {(k[7:] if k.startswith('module.') else k): v
            for k, v in state_dict.items()}


class TorchParamConverter:
    """torch state_dict -> Flax param tree helpers shared by the full
    denoiser converter and the partial (parity-test) converters."""

    def __init__(self, state_dict: dict, nhead: int = 8):
        self.sd = {k: np.asarray(v.detach().cpu().numpy()
                                 if hasattr(v, 'detach') else v)
                   for k, v in _strip_module_prefix(state_dict).items()}
        self.nhead = nhead
        self.out: dict = {}

    def put(self, path: str, value: np.ndarray):
        node = self.out
        parts = path.split('/')
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = value

    def dense(self, dst: str, src: str):
        self.put(dst + '/kernel', self.sd[src + '.weight'].T)
        if src + '.bias' in self.sd:
            self.put(dst + '/bias', self.sd[src + '.bias'])

    def _rope_permute(self, cols: int) -> np.ndarray:
        """Column permutation mapping the reference's interleaved RoPE pairs
        (2i, 2i+1) onto this framework's rotate-half layout (i, D/2+i),
        per head (ops/rope.py). Scores are invariant to a consistent (q, k)
        pair permutation, so this preserves the model exactly."""
        d = cols // self.nhead
        per_head = np.concatenate([np.arange(0, d, 2), np.arange(1, d, 2)])
        return np.concatenate([h * d + per_head for h in range(self.nhead)])

    def qkv_dense(self, dst: str, src: str):
        """Merge the reference's query/key/value projections into the merged
        qkv Dense, permuting q/k columns into rotate-half order.

        Column layout is HEAD-MAJOR: per-head [q_h | k_h | v_h] groups of
        3*head_dim, so a P(None, 'model') column sharding of this kernel
        splits exactly at head boundaries (ops/pallas_attention.py
        rope_attention_qkv_tp)."""
        sd = self.sd
        ws, bs = [], []
        for part, permute in (('query', True), ('key', True), ('value', False)):
            w = sd[f'{src}.{part}.weight'].T         # [in, out]
            b = sd.get(f'{src}.{part}.bias')
            if permute:
                perm = self._rope_permute(w.shape[1])
                w = w[:, perm]
                b = None if b is None else b[perm]
            ws.append(w)
            bs.append(b if b is not None else np.zeros(w.shape[1], w.dtype))
        d_in, A = ws[0].shape
        hd = A // self.nhead
        # [in, A] x3 -> [in, H, 3, hd] -> [in, 3A] head-major
        wm = np.stack([w.reshape(d_in, self.nhead, hd) for w in ws], axis=2)
        bm = np.stack([b.reshape(self.nhead, hd) for b in bs], axis=1)
        self.put(dst + '/kernel', wm.reshape(d_in, 3 * A))
        self.put(dst + '/bias', bm.reshape(3 * A))

    def layernorm(self, dst: str, src: str):
        self.put(dst + '/scale', self.sd[src + '.weight'])
        self.put(dst + '/bias', self.sd[src + '.bias'])

    def conv1d(self, dst: str, src: str):
        # torch [out, in, k] -> flax [k, in, out]
        self.put(dst + '/kernel', self.sd[src + '.weight'].transpose(2, 1, 0))
        self.put(dst + '/bias', self.sd[src + '.bias'])

    def pff_conv(self, dst: str, src: str):
        # sequence_models PositionFeedForward = Conv1d(k=1): [out, in, 1]
        sd = self.sd
        w = sd[src + '.conv.weight'] if src + '.conv.weight' in sd \
            else sd[src + '.weight']
        if w.ndim == 3:
            w = w[:, :, 0]
        self.put(dst + '/kernel', w.T)
        bias_key = src + '.conv.bias' if src + '.conv.bias' in sd else src + '.bias'
        if bias_key in sd:
            self.put(dst + '/bias', sd[bias_key])

    def bytenet_block(self, dst: str, src: str):
        # reference sequence1 = [LN, act, PFF, LN, act]; conv;
        # sequence2 = [LN, act, PFF]
        self.layernorm(dst + '/LayerNorm_0', src + '.sequence1.0')
        self.pff_conv(dst + '/Dense_0', src + '.sequence1.2')
        self.layernorm(dst + '/LayerNorm_1', src + '.sequence1.3')
        self.conv1d(dst + '/DilatedConv1d_0/Conv_0', src + '.conv')
        self.layernorm(dst + '/LayerNorm_2', src + '.sequence2.0')
        self.pff_conv(dst + '/Dense_1', src + '.sequence2.2')

    def att_layer(self, dst: str, src: str):
        self.qkv_dense(dst + '/qkv', src)
        self.dense(dst + '/out', src + '.out_put')

    def self_att(self, dst: str, src: str, n_layers: int):
        for i in range(n_layers):
            blk_src = f'{src}.layers.{i}'
            blk_dst = f'{dst}/block_{i}'
            self.att_layer(blk_dst + '/attn', blk_src + '.attn_hl')
            self.att_layer(blk_dst + '/attn_c', blk_src + '.attn_hl_c')
            self.layernorm(blk_dst + '/norm1', blk_src + '.norm_hl1')
            self.layernorm(blk_dst + '/norm2', blk_src + '.norm_hl2')
            self.dense(blk_dst + '/Dense_0', blk_src + '.ff_hl.0')
            self.dense(blk_dst + '/Dense_1', blk_src + '.ff_hl.2')

    def tower(self, dst: str, src_fmt: str, n_layers: int):
        for i in range(n_layers):
            self.bytenet_block(f'{dst}/ByteNetBlock_{i}', src_fmt.format(i))

    def count_layers(self, prefix: str) -> int:
        n = 0
        while any(k.startswith(f'{prefix}.{n}.') for k in self.sd):
            n += 1
        return n


def convert_torch_self_att(state_dict: dict, nhead: int = 8) -> dict:
    """Convert a bare reference ``SelfAttNet`` state_dict (keys
    ``layers.{i}.attn_hl...``, model/encoder/cross_attention.py:291-310) onto
    this framework's ``SelfAttNet`` param tree — used for the numeric
    torch->jax parity test of the attention stack + RoPE permutation."""
    c = TorchParamConverter(state_dict, nhead=nhead)
    n_layers = c.count_layers('layers')
    for i in range(n_layers):
        blk_src = f'layers.{i}'
        blk_dst = f'block_{i}'
        c.att_layer(blk_dst + '/attn', blk_src + '.attn_hl')
        c.att_layer(blk_dst + '/attn_c', blk_src + '.attn_hl_c')
        c.layernorm(blk_dst + '/norm1', blk_src + '.norm_hl1')
        c.layernorm(blk_dst + '/norm2', blk_src + '.norm_hl2')
        c.dense(blk_dst + '/Dense_0', blk_src + '.ff_hl.0')
        c.dense(blk_dst + '/Dense_1', blk_src + '.ff_hl.2')
    return {'params': c.out}


def convert_torch_bytenet_block(state_dict: dict) -> dict:
    """Convert one bare reference ByteNetBlock (sequence_models layout:
    ``sequence1.* / conv / sequence2.*``) onto this framework's
    ``ByteNetBlock`` param tree (parity test support)."""
    c = TorchParamConverter({f'b.{k}': v for k, v in state_dict.items()})
    c.bytenet_block('blk', 'b')
    return {'params': c.out['blk']}


def convert_torch_denoiser(state_dict: dict, pair: bool = True,
                           nhead: int = 8) -> dict:
    """Map a reference AntiTFNet/NanoAntiTFNet torch state_dict onto this
    framework's Flax param tree (same architecture family; see
    models/denoiser.py for the layer correspondence). ``nhead`` is needed to
    permute query/key columns into the rotate-half RoPE layout (both
    reference configs use nhead=8, configs/antibody_train.yml:22)."""
    c = TorchParamConverter(state_dict, nhead=nhead)
    sd = c.sd
    put, dense, layernorm = c.put, c.dense, c.layernorm
    pff_conv, self_att, tower, count_layers = (c.pff_conv, c.self_att,
                                               c.tower, c.count_layers)

    put('aa_embed/embedding',
        sd['aa_encoder.embedder.weight'])

    if pair:
        n_enc = count_layers('aa_encoder.h_layers')
        tower('aa_encoder/h_tower', 'aa_encoder.h_layers.{}', n_enc)
        tower('aa_encoder/l_tower', 'aa_encoder.l_layers.{}', n_enc)
        put('side_encoder/Embed_0/embedding', sd['side_encoder.side_embeddinng.weight'])
        dense('side_encoder/Dense_0', 'side_encoder.side_mlp.0')
        layernorm('side_encoder/LayerNorm_0', 'side_encoder.side_mlp.1')
        dense('side_encoder/Dense_1', 'side_encoder.side_mlp.3')
        n_dual = count_layers('dual_conv_block.h_layers')
        tower('dual_conv/h_tower', 'dual_conv_block.h_layers.{}', n_dual)
        tower('dual_conv/l_tower', 'dual_conv_block.l_layers.{}', n_dual)
    else:
        n_enc = count_layers('aa_encoder.layers')
        tower('aa_encoder', 'aa_encoder.layers.{}', n_enc)
        n_dual = count_layers('nano_conv_block.layers')
        tower('nano_conv', 'nano_conv_block.layers.{}', n_dual)

    put('region_encoder/Embed_0/embedding', sd['region_encoder.region_embedding.weight'])
    layernorm('region_encoder/LayerNorm_0', 'region_encoder.region_layer1.0')
    pff_conv('region_encoder/Dense_0', 'region_encoder.region_layer1.2')
    layernorm('region_encoder/LayerNorm_1', 'region_encoder.region_layer1.3')

    dense('pos_encoder/GatedMLP_0/Dense_0', 'pos_encoder.pos_lin.ln1')
    dense('pos_encoder/GatedMLP_0/Dense_1', 'pos_encoder.pos_lin.ln2')

    n_att = count_layers('self_at.layers')
    self_att('self_att', 'self_at', n_att)

    layernorm('last_norm', 'last_norm')
    dense('decoder', 'decoder')
    return {'params': c.out}


def _ensure_unpickle_shims() -> None:
    """Released reference checkpoints carry pickled ``easydict.EasyDict``
    config objects (reference antibody_train.py:4 + :342 — the YAML config
    is wrapped in EasyDict before being stored in every ``torch.save``
    payload), so unpickling needs that class importable. When the easydict
    package is absent, register a pickle-compatible shim: a dict subclass
    with attribute access under the same module path and class name."""
    import sys
    import types
    try:
        import easydict  # noqa: F401 - real package wins when present
        return
    except ImportError:
        pass
    if 'easydict' in sys.modules:
        return

    class EasyDict(dict):
        """Pickle-compatible stand-in for easydict.EasyDict."""

        def __getattr__(self, key):
            try:
                return self[key]
            except KeyError as e:
                raise AttributeError(key) from e

        def __setattr__(self, key, value):
            self[key] = value

    EasyDict.__module__ = 'easydict'
    EasyDict.__qualname__ = 'EasyDict'  # pickle resolves module+qualname
    mod = types.ModuleType('easydict')
    mod.EasyDict = EasyDict
    sys.modules['easydict'] = mod


def load_torch_checkpoint(path: str) -> dict:
    import torch
    _ensure_unpickle_shims()
    return torch.load(path, map_location='cpu', weights_only=False)
