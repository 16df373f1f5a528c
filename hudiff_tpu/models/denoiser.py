"""OA-ARDM denoiser networks: paired antibody (HuDiff-Ab) and nanobody
(HuDiff-Nb).

TPU-first re-design of the reference AntiTFNet (model/encoder/model.py:325-384)
and NanoAntiTFNet (model/nanoencoder/model.py:290-343):

- one Flax module per model; compute dtype configurable (bfloat16 on TPU);
- RoPE attention in the real-valued paired-rotation form;
- dropout only active in training (the reference's always-on ``F.dropout``
  at inference, SURVEY.md §5.1, is deliberately not reproduced);
- chain-type conditioning takes an explicit [B, 2] (heavy, light) pair instead
  of the reference's order-dependent flattened [2B] vector.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Mapping, Optional

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from .. import constants as C
from ..ops.bytenet import ByteNetStack
from ..ops.rope import rope_tables
from .embedders import PosEmbedder, RegionEmbedder, SideEmbedder


@dataclasses.dataclass(frozen=True)
class DenoiserConfig:
    """Mirrors the ``model:`` section of the reference YAML configs
    (configs/antibody_train.yml:2-24, configs/heavy_train.yml:2-21)."""
    n_tokens: int = 23
    d_embedding: int = 256
    d_model: int = 256
    n_encoder_layers: int = 6
    aa_kernel_size: int = 7
    r: int = 128
    n_side: int = 3
    s_embedding: int = 4
    s_model: int = 256
    n_region: int = 7
    r_embedding: int = 4
    r_model: int = 256
    n_pos_model: int = 256
    max_len: int = C.PAIR_LEN
    sum_d_model: int = 768
    dual_layers: int = 6
    att_model: int = 512
    dim_feedforward: int = 256
    nhead: int = 8
    cs_layers: int = 5
    dropout: float = 0.2
    activation: str = 'gelu'

    @classmethod
    def from_dict(cls, d: Mapping[str, Any]) -> 'DenoiserConfig':
        fields = {f.name for f in dataclasses.fields(cls)}
        return cls(**{k: v for k, v in d.items() if k in fields})

    def test_size(self) -> 'DenoiserConfig':
        """Tiny variant for fast tests (mirrors configs/antibody_test.yml)."""
        return dataclasses.replace(
            self, d_embedding=64, d_model=64, n_encoder_layers=1,
            aa_kernel_size=13, s_model=64, r_model=64, n_pos_model=64,
            sum_d_model=(3 * 64 if self.max_len == C.PAIR_LEN else 2 * 64),
            dual_layers=2, att_model=512, dim_feedforward=512, cs_layers=1)


def nano_config(**overrides) -> DenoiserConfig:
    """Default HuDiff-Nb config (configs/heavy_train.yml:2-21)."""
    base = dict(max_len=C.HEAVY_LEN, sum_d_model=512, dim_feedforward=256,
                dropout=0.5)
    base.update(overrides)
    return DenoiserConfig(**base)


class RoPEAttention(nn.Module):
    """Multi-head self-attention with rotary embeddings
    (reference AttLayer, cross_attention.py:131-173).

    On TPU the scores/softmax/AV stage runs as a fused Pallas kernel
    (ops/pallas_attention.py), avoiding the [B, H, L, L] HBM round-trip.

    ``tp_mesh``: a ('data', 'model') Mesh enabling tensor parallelism — the
    merged head-major QKV projection is column-sharded over 'model' and the
    fused kernel runs per shard under shard_map with heads/tp local heads
    (zero gathers; the out-projection all-reduces). See
    ops/pallas_attention.py::rope_attention_qkv_tp.
    """
    d_model: int
    att_model: int
    nhead: int
    length: int
    dtype: jnp.dtype = jnp.float32
    use_pallas: str = 'auto'
    tp_mesh: Any = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        from ..ops.pallas_attention import (rope_attention_qkv,
                                            rope_attention_qkv_tp)
        B, L, _ = x.shape
        head_dim = self.att_model // self.nhead
        # One merged QKV matmul (the reference's three projections are
        # merged head-major by the checkpoint converter), passed to the
        # kernel as a single buffer: no split copies at the custom-call
        # boundary, per-head slicing + RoPE happen in VMEM.
        qkv = nn.Dense(3 * self.att_model, dtype=self.dtype,
                       param_dtype=jnp.float32, name='qkv')(x)

        cos, sin = rope_tables(head_dim, self.length)
        scale = 1.0 / float(np.sqrt(head_dim))
        if self.tp_mesh is not None:
            out = rope_attention_qkv_tp(qkv, cos[:L], sin[:L], scale,
                                        self.nhead, self.tp_mesh,
                                        use_pallas=self.use_pallas)
        else:
            out = rope_attention_qkv(qkv, cos[:L], sin[:L], scale, self.nhead,
                                     use_pallas=self.use_pallas)
        return nn.Dense(self.d_model, dtype=self.dtype, param_dtype=jnp.float32,
                        name='out')(out)


class SelfAttBlock(nn.Module):
    """Two attention applications + FFN with the reference residual pattern
    (cross_attention.py:257-287): note the FFN residual reconnects to the
    *block input*, not the attention output."""
    d_model: int
    att_model: int
    dim_feedforward: int
    nhead: int
    length: int
    dtype: jnp.dtype = jnp.float32
    use_pallas: str = 'auto'
    tp_mesh: Any = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        attn = lambda name: RoPEAttention(
            self.d_model, self.att_model, self.nhead, self.length,
            dtype=self.dtype, use_pallas=self.use_pallas,
            tp_mesh=self.tp_mesh, name=name)
        at = x + attn('attn')(x)
        at = at + attn('attn_c')(
            nn.LayerNorm(dtype=self.dtype, name='norm1')(at))
        h = nn.LayerNorm(dtype=self.dtype, name='norm2')(at)
        h = nn.Dense(self.dim_feedforward, dtype=self.dtype,
                     param_dtype=jnp.float32)(h)
        h = nn.relu(h)
        h = nn.Dense(self.d_model, dtype=self.dtype, param_dtype=jnp.float32)(h)
        return h + x


class SelfAttNet(nn.Module):
    d_model: int
    att_model: int
    dim_feedforward: int
    nhead: int
    length: int
    n_layers: int
    dtype: jnp.dtype = jnp.float32
    use_pallas: str = 'auto'
    tp_mesh: Any = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        for i in range(self.n_layers):
            x = SelfAttBlock(self.d_model, self.att_model, self.dim_feedforward,
                             self.nhead, self.length, dtype=self.dtype,
                             use_pallas=self.use_pallas, tp_mesh=self.tp_mesh,
                             name=f'block_{i}')(x)
        return x


class SplitConvTowers(nn.Module):
    """Separate ByteNet towers over the heavy (152) and light (139) halves
    (reference ByteNetTime._convolve, model.py:170-180 / DualConv :277-304)."""
    n_layers: int
    d_model: int
    kernel_size: int
    r: int
    activation: str
    dropout: float
    dtype: jnp.dtype = jnp.float32
    use_pallas: str = 'never'

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, deterministic: bool = True) -> jnp.ndarray:
        h = x[:, : C.HEAVY_LEN, :]
        l = x[:, C.HEAVY_LEN:, :]
        stack = lambda name: ByteNetStack(
            n_layers=self.n_layers, d_model=self.d_model,
            kernel_size=self.kernel_size, r=self.r, activation=self.activation,
            dropout=self.dropout, dtype=self.dtype,
            use_pallas=self.use_pallas, name=name)
        h = stack('h_tower')(h, deterministic=deterministic)
        l = stack('l_tower')(l, deterministic=deterministic)
        return jnp.concatenate([h, l], axis=1)


def conv_pallas_policy(use_pallas: str, d_model: int,
                       deterministic: bool) -> str:
    """Routing for the fused ByteNet kernel, from v5e measurements at each
    production tower shape (docs/perf.md "fused ByteNet", d_model/d_h at
    L=152, B=128): 256/128 wins fused both ways (1.05x fwd, 1.33x fwd+bwd),
    512/256 wins both ways (1.50x fwd, 1.48x fwd+bwd), 768/384 wins the
    forward (1.04x) but loses the backward (0.85x — XLA's backward matmuls
    already run near roofline at that width). So towers up to d=512 follow
    ``use_pallas`` everywhere; the d=768 pair dual towers follow it only on
    forward-only (deterministic) traces — i.e. sampling and eval."""
    if d_model > 512 and not deterministic:
        return 'never'
    return use_pallas


class AntiTFNet(nn.Module):
    """HuDiff-Ab paired denoiser: tokens [B,291] -> logits [B,291,23].

    Architecture (reference AntiTFNet.forward, model/encoder/model.py:366-384):
    token embed -> split H/L ByteNet towers -> (+pos, +side) -> concat(3d)
    -> split dual conv towers -> joint RoPE self-attention -> LN -> decode.

    ``tp_mesh``: optional ('data', 'model') Mesh — attention runs
    tensor-parallel over 'model' via shard_map'd fused kernels (see
    RoPEAttention); pair with parallel.mesh.param_shardings.
    """
    cfg: DenoiserConfig
    dtype: jnp.dtype = jnp.float32
    use_pallas: str = 'auto'
    tp_mesh: Any = None

    @nn.compact
    def __call__(self, tokens: jnp.ndarray, region: jnp.ndarray,
                 chain_type: jnp.ndarray, *, deterministic: bool = True
                 ) -> jnp.ndarray:
        cfg = self.cfg
        emb = nn.Embed(cfg.n_tokens, cfg.d_embedding, param_dtype=jnp.float32,
                       dtype=self.dtype, name='aa_embed')(tokens)
        emb = SplitConvTowers(
            cfg.n_encoder_layers, cfg.d_model, cfg.aa_kernel_size, cfg.r,
            cfg.activation, cfg.dropout, dtype=self.dtype,
            use_pallas=conv_pallas_policy(self.use_pallas, cfg.d_model,
                                          deterministic),
            name='aa_encoder')(emb, deterministic=deterministic)

        side = SideEmbedder(cfg.n_side, cfg.s_embedding, cfg.s_model,
                            C.HEAVY_LEN, C.LIGHT_LEN, dtype=self.dtype,
                            name='side_encoder')(chain_type)
        reg = RegionEmbedder(cfg.n_region, cfg.r_embedding, cfg.r_model,
                             dtype=self.dtype, name='region_encoder')(region)
        pos = PosEmbedder(cfg.n_pos_model, cfg.max_len, dtype=self.dtype,
                          name='pos_encoder')(reg, deterministic=deterministic)

        summed = emb + pos + side
        feature = jnp.concatenate([summed, pos, side], axis=-1)

        feature = SplitConvTowers(
            cfg.dual_layers, cfg.sum_d_model, cfg.aa_kernel_size, cfg.r,
            'relu', cfg.dropout, dtype=self.dtype,
            use_pallas=conv_pallas_policy(self.use_pallas, cfg.sum_d_model,
                                          deterministic),
            name='dual_conv')(feature, deterministic=deterministic)

        feature = SelfAttNet(cfg.sum_d_model, cfg.att_model, cfg.dim_feedforward,
                             cfg.nhead, cfg.max_len, cfg.cs_layers,
                             dtype=self.dtype, use_pallas=self.use_pallas,
                             tp_mesh=self.tp_mesh, name='self_att')(feature)
        feature = nn.LayerNorm(dtype=self.dtype, name='last_norm')(feature)
        return nn.Dense(cfg.n_tokens, dtype=jnp.float32, param_dtype=jnp.float32,
                        name='decoder')(feature.astype(jnp.float32))


class NanoAntiTFNet(nn.Module):
    """HuDiff-Nb heavy-only denoiser: tokens [B,152] -> logits [B,152,23]
    (reference NanoAntiTFNet.forward, model/nanoencoder/model.py:325-343)."""
    cfg: DenoiserConfig
    dtype: jnp.dtype = jnp.float32
    use_pallas: str = 'auto'
    tp_mesh: Any = None

    @nn.compact
    def __call__(self, tokens: jnp.ndarray, region: jnp.ndarray,
                 chain_type: Optional[jnp.ndarray] = None, *,
                 deterministic: bool = True) -> jnp.ndarray:
        cfg = self.cfg
        emb = nn.Embed(cfg.n_tokens, cfg.d_embedding, param_dtype=jnp.float32,
                       dtype=self.dtype, name='aa_embed')(tokens)
        emb = ByteNetStack(cfg.n_encoder_layers, cfg.d_model, cfg.aa_kernel_size,
                           cfg.r, activation=cfg.activation, dropout=cfg.dropout,
                           dtype=self.dtype,
                           use_pallas=conv_pallas_policy(
                               self.use_pallas, cfg.d_model, deterministic),
                           name='aa_encoder')(
            emb, deterministic=deterministic)

        reg = RegionEmbedder(cfg.n_region, cfg.r_embedding, cfg.r_model,
                             dtype=self.dtype, name='region_encoder')(region)
        pos = PosEmbedder(cfg.n_pos_model, cfg.max_len, dtype=self.dtype,
                          name='pos_encoder')(reg, deterministic=deterministic)

        feature = jnp.concatenate([emb + pos, pos], axis=-1)
        feature = ByteNetStack(cfg.dual_layers, cfg.sum_d_model,
                               cfg.aa_kernel_size, cfg.r, activation='gelu',
                               dropout=cfg.dropout, dtype=self.dtype,
                               use_pallas=conv_pallas_policy(
                                   self.use_pallas, cfg.sum_d_model,
                                   deterministic),
                               name='nano_conv')(feature,
                                                 deterministic=deterministic)
        feature = SelfAttNet(cfg.sum_d_model, cfg.att_model, cfg.dim_feedforward,
                             cfg.nhead, cfg.max_len, cfg.cs_layers,
                             dtype=self.dtype, use_pallas=self.use_pallas,
                             tp_mesh=self.tp_mesh, name='self_att')(feature)
        feature = nn.LayerNorm(dtype=self.dtype, name='last_norm')(feature)
        return nn.Dense(cfg.n_tokens, dtype=jnp.float32, param_dtype=jnp.float32,
                        name='decoder')(feature.astype(jnp.float32))
