"""Device mesh + sharding rules.

The reference is single-GPU (SURVEY.md §2.3); the TPU-native design scales via
GSPMD over a 2-D ``('data', 'model')`` mesh:

- batch axis sharded over ``data`` (gradient all-reduce rides ICI);
- attention QKV / FFN kernels sharded over ``model`` (tensor parallelism —
  head-dim for QKV, inner dim for FFN), everything else replicated.

At HuDiff's model scale TP is optional; the rules exist so the same train step
compiles from 1 chip to a pod slice without code changes.
"""
from __future__ import annotations

import re
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(devices: Optional[Sequence] = None, model_axis: int = 1) -> Mesh:
    """Build a ('data', 'model') mesh over the given (or all) devices."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    assert n % model_axis == 0, f'{n} devices not divisible by model={model_axis}'
    arr = np.asarray(devices).reshape(n // model_axis, model_axis)
    return Mesh(arr, axis_names=('data', 'model'))


# Parameter-path regexes -> PartitionSpec over the ('data', 'model') mesh.
# Matched against '/'.join(path) of the flax param tree.
_TP_RULES = (
    # merged QKV projection: [d_model, 3*att_model] column-sharded. The
    # kernel layout is HEAD-MAJOR (per-head [q|k|v] groups,
    # ops/pallas_attention.py), so this sharding lands exactly on head
    # boundaries: the fused attention kernel runs per shard under shard_map
    # with heads/tp local heads and zero gathers (rope_attention_qkv_tp),
    # and the out-projection's row sharding below contracts the
    # head-sharded activation with one all-reduce (Megatron pattern).
    (re.compile(r'attn(_c)?/qkv/kernel$'), P(None, 'model')),
    (re.compile(r'attn(_c)?/qkv/bias$'), P('model')),
    (re.compile(r'attn(_c)?/out/kernel$'), P('model', None)),
    # attention-block FFN: Dense_0 expands, Dense_1 contracts
    (re.compile(r'block_\d+/Dense_0/kernel$'), P(None, 'model')),
    (re.compile(r'block_\d+/Dense_1/kernel$'), P('model', None)),
)


def param_pspec(path: str) -> P:
    for rx, spec in _TP_RULES:
        if rx.search(path):
            return spec
    return P()


def param_shardings(mesh: Mesh, params):
    """PyTree of NamedShardings implementing the TP rules."""
    flat = jax.tree_util.tree_flatten_with_path(params)[0]

    def path_str(kp):
        return '/'.join(getattr(k, 'key', str(k)) for k in kp)

    specs = {path_str(kp): param_pspec(path_str(kp)) for kp, _ in flat}

    def to_sharding(kp, leaf):
        return NamedSharding(mesh, specs[path_str(kp)])

    return jax.tree_util.tree_map_with_path(to_sharding, params)


def batch_sharding(mesh: Mesh, ndim: int = 2) -> NamedSharding:
    """Leading axis over 'data', rest replicated."""
    return NamedSharding(mesh, P('data', *([None] * (ndim - 1))))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
