"""One-time migration: merged-qkv kernels from the legacy part-major layout
(q|k|v concatenated, each head-blocked) to the canonical head-major layout
(per-head [q_h | k_h | v_h] groups) introduced for tensor parallelism
(ops/pallas_attention.py::rope_attention_qkv_tp).

Usage: python tools/migrate_qkv_layout.py <ckpt_dir> [...]

Each <ckpt_dir> is an Orbax checkpoint directory (examples/demo_ab_tiny,
a training run's checkpoints/ dir, ...). The step's config JSON supplies
nhead/att_model. Idempotence guard: a '.qkv_layout' marker file records the
layout; already-migrated dirs are skipped.
"""
from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def headmajor_perm(heads: int, att_model: int) -> np.ndarray:
    """Column permutation: new col (h, part, i) <- old col part*A + h*hd + i."""
    hd = att_model // heads
    idx = []
    for h in range(heads):
        for part in range(3):
            idx.append(part * att_model + h * hd + np.arange(hd))
    return np.concatenate(idx)


def migrate_tree(params, heads: int, att_model: int) -> int:
    """Permute every */qkv/{kernel,bias} leaf in place. Returns #leaves."""
    perm = headmajor_perm(heads, att_model)
    n = 0

    def walk(node):
        nonlocal n
        if not isinstance(node, dict):
            return
        for key, child in node.items():
            if key == 'qkv' and isinstance(child, dict) and 'kernel' in child:
                child['kernel'] = np.asarray(child['kernel'])[..., perm]
                if 'bias' in child:
                    child['bias'] = np.asarray(child['bias'])[..., perm]
                n += 1
            else:
                walk(child)

    walk(params)
    return n


def migrate_ckpt_dir(ckpt_dir: str) -> None:
    from hudiff_tpu.training import checkpoints as CK

    marker = os.path.join(ckpt_dir, '.qkv_layout')
    if os.path.exists(marker) and open(marker).read().strip() == 'head-major':
        print(f'{ckpt_dir}: already head-major, skipping')
        return

    restored = CK.restore(ckpt_dir)
    step, meta, payload = restored['step'], restored['meta'], restored['payload']
    cfg = meta.get('config', {})
    model_cfg = cfg.get('model', cfg)
    heads = int(model_cfg.get('nhead', 8))
    att_model = int(model_cfg.get('att_model', 512))

    n = migrate_tree(payload['params'], heads, att_model)
    # opt_state (adam mu/nu) carries per-parameter moments in the same tree
    # shape — permute those too or resumed training would mix columns
    if payload.get('opt_state') is not None:
        n += migrate_tree(payload['opt_state'], heads, att_model)
    assert n > 0, f'{ckpt_dir}: no qkv leaves found'

    CK.save(ckpt_dir, step, payload['params'],
            opt_state=payload.get('opt_state'), config=cfg,
            extra={k: v for k, v in meta.items()
                   if k not in ('step', 'config')})
    with open(marker, 'w') as f:
        f.write('head-major\n')
    print(f'{ckpt_dir}: migrated {n} qkv leaves at step {step} '
          f'(heads={heads}, att_model={att_model})')


if __name__ == '__main__':
    for d in sys.argv[1:]:
        migrate_ckpt_dir(d)
