"""AbNatiV VQ-VAE nativeness scorer (Flax, frozen inference).

Re-implementation of the reference's vendored AbNatiV
(model/nanoencoder/abnativ_model.py:166-213, abnativ_vq.py:163-276,
abnativ_utils.py:27-58) used as a frozen differentiable humanness scorer
during fine-tuning. Architecture:

  one-hot [B, 149, 21] -> Conv1d embed -> PE -> N MHA blocks
    -> cosine-similarity vector quantization (EMA codebook, frozen here)
    -> PE -> N MHA blocks -> ConvTranspose1d -> softmax reconstruction

Outputs per-position reconstruction MSE; nativeness = exp(-mean error),
linearly rescaled per model type (abnativ_scoring.py:95-142).

Training-only machinery (k-means init, EMA updates, dead-code expiry,
DDP sync) is intentionally absent: every entry point in the reference keeps
the scorer frozen. ``straight_through`` optionally passes gradients through
the codebook lookup (the reference Ab fine-tune leaves torch train-mode ST
active; the Nb fine-tune calls .eval() and does not — SURVEY.md §3.2).
"""
from __future__ import annotations

import dataclasses
import math
from typing import Any, Dict, Mapping

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from .. import constants as C


# ---------------------------------------------------------------------------
# CNN geometry helpers (faithful to abnativ_utils.py:27-58, incl. its quirky
# padding search loop, so (l_red, padding) match the reference exactly).
# ---------------------------------------------------------------------------

def _l_out_cnn1d(L_in: int, K: int, S: int, P: int, D: int = 1) -> float:
    return (L_in + 2 * P - D * (K - 1) - 1) / S + 1


def find_optimal_cnn1d_padding(L_in: int, K: int, S: int):
    P = 0
    L_out = _l_out_cnn1d(L_in, K, S, P)
    assert L_in >= K, 'kernel larger than input'
    while not float(L_out).is_integer() and 2 * P <= S:
        L_out = _l_out_cnn1d(L_in, K, S, P)
        P += 1
    if 2 * P >= S:
        P -= 1
    return math.floor(L_out), P


def find_out_padding_cnn1d_transpose(L_obj: int, L_in: int, K: int, S: int,
                                     P: int) -> int:
    L_out = (L_in - 1) * S - 2 * P + (K - 1) + 1
    assert L_obj >= L_out, 'transpose output larger than target'
    return L_obj - L_out


@dataclasses.dataclass(frozen=True)
class AbNatiVParams:
    """hparams dict carried inside the reference .ckpt files."""
    d_embedding: int = 128
    kernel: int = 4
    stride: int = 2
    num_heads: int = 4
    num_mha_layers: int = 4
    d_ff: int = 256
    length_seq: int = C.AHO_LEN
    alphabet_size: int = C.ABNATIV_ALPHABET_SIZE
    num_embeddings: int = 512     # codebook size
    embedding_dim_code_book: int = 32
    decay: float = 0.8
    commitment_cost: float = 1.0
    drop: float = 0.0

    @classmethod
    def from_dict(cls, d: Mapping[str, Any]) -> 'AbNatiVParams':
        fields = {f.name for f in dataclasses.fields(cls)}
        return cls(**{k: v for k, v in d.items() if k in fields})


def sinusoidal_table(d: int, max_len: int) -> np.ndarray:
    position = np.arange(max_len, dtype=np.float64)[:, None]
    div = np.exp(np.arange(0, d, 2, dtype=np.float64) * (-np.log(10000.0) / d))
    pe = np.zeros((max_len, d), dtype=np.float64)
    pe[:, 0::2] = np.sin(position * div)
    pe[:, 1::2] = np.cos(position * div)
    return pe.astype(np.float32)


class MHABlock(nn.Module):
    """Post-norm MHA + MLP block (abnativ_model.py:45-77)."""
    d: int
    heads: int
    d_ff: int
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        attn = nn.MultiHeadDotProductAttention(
            num_heads=self.heads, qkv_features=self.d, out_features=self.d,
            name='mha')(x, x)
        x = x + nn.Dropout(self.dropout)(attn, deterministic=deterministic)
        x = nn.LayerNorm(epsilon=1e-6, name='norm1')(x)
        h = nn.Dense(self.d_ff, name='ff1')(x)
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        h = nn.relu(h)
        h = nn.Dense(self.d, name='ff2')(h)
        x = x + nn.Dropout(self.dropout)(h, deterministic=deterministic)
        return nn.LayerNorm(epsilon=1e-6, name='norm2')(x)


class AbNatiVEncoder(nn.Module):
    hp: AbNatiVParams

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        hp = self.hp
        l_red, padding = find_optimal_cnn1d_padding(hp.length_seq, hp.kernel,
                                                    hp.stride)
        h = nn.Conv(hp.d_embedding, kernel_size=(hp.kernel,),
                    strides=(hp.stride,), padding=[(padding, padding)],
                    name='cnn')(x)
        pe = jnp.asarray(sinusoidal_table(hp.d_embedding, l_red))
        h = h + pe[None, : h.shape[1], :]
        h = nn.Dropout(hp.drop)(h, deterministic=deterministic)
        for i in range(hp.num_mha_layers):
            h = MHABlock(hp.d_embedding, hp.num_heads, hp.d_ff, hp.drop,
                         name=f'mha_{i}')(h, deterministic=deterministic)
        return h


class AbNatiVDecoder(nn.Module):
    hp: AbNatiVParams

    @nn.compact
    def __call__(self, q, *, deterministic: bool = True):
        hp = self.hp
        l_red, padding = find_optimal_cnn1d_padding(hp.length_seq, hp.kernel,
                                                    hp.stride)
        out_pad = find_out_padding_cnn1d_transpose(hp.length_seq, l_red,
                                                   hp.kernel, hp.stride, padding)
        pe = jnp.asarray(sinusoidal_table(hp.d_embedding, l_red))
        z = q + pe[None, : q.shape[1], :]
        z = nn.Dropout(hp.drop)(z, deterministic=deterministic)
        for i in range(hp.num_mha_layers):
            z = MHABlock(hp.d_embedding, hp.num_heads, hp.d_ff, hp.drop,
                         name=f'mha_{i}')(z, deterministic=deterministic)
        # ConvTranspose1d with torch semantics: VALID transpose, crop the
        # torch padding P from both ends, extend by output_padding zeros.
        z = nn.ConvTranspose(hp.alphabet_size, kernel_size=(hp.kernel,),
                             strides=(hp.stride,), padding='VALID',
                             transpose_kernel=True, name='cnn_t')(z)
        full = z.shape[1]
        target = hp.length_seq
        z = z[:, padding: padding + target, :]
        if z.shape[1] < target:
            z = jnp.pad(z, ((0, 0), (0, target - z.shape[1]), (0, 0)))
        return jax.nn.softmax(z, axis=-1)


class CosineVQ(nn.Module):
    """Frozen cosine-similarity codebook lookup (abnativ_vq.py:107-160
    inference path; temperature 0 => argmax)."""
    hp: AbNatiVParams
    straight_through: bool = False

    @nn.compact
    def __call__(self, x) -> Dict[str, jnp.ndarray]:
        hp = self.hp
        dim, cb_dim = hp.d_embedding, hp.embedding_dim_code_book
        needs_proj = cb_dim != dim
        if needs_proj:
            x_in = nn.Dense(cb_dim, name='project_in')(x)
        else:
            x_in = x
        embed = self.param('codebook', nn.initializers.normal(1.0),
                           (hp.num_embeddings, cb_dim))
        xf = x_in.astype(jnp.float32)
        x_n = xf / (jnp.linalg.norm(xf, axis=-1, keepdims=True) + 1e-12)
        e_n = embed / (jnp.linalg.norm(embed, axis=-1, keepdims=True) + 1e-12)
        dist = jnp.einsum('bnd,cd->bnc', x_n, e_n)
        ind = jnp.argmax(dist, axis=-1)
        quant = embed[ind]
        if self.straight_through:
            quant = xf + jax.lax.stop_gradient(quant - xf)

        loss_pbe = jnp.mean((quant - jax.lax.stop_gradient(xf)) ** 2,
                            axis=(1, 2))
        if hp.commitment_cost > 0:
            commit = (jax.lax.stop_gradient(quant) - xf) ** 2
            loss_pbe = loss_pbe + hp.commitment_cost * jnp.mean(commit, axis=(1, 2))

        quant = quant.astype(x.dtype)
        if needs_proj:
            quant_out = nn.Dense(dim, name='project_out')(quant)
        else:
            quant_out = quant

        onehot = jax.nn.one_hot(ind, hp.num_embeddings)
        avg = jnp.mean(onehot.reshape(-1, hp.num_embeddings), axis=0)
        perplexity = jnp.exp(-jnp.sum(avg * jnp.log(avg + 1e-10)))
        return {'quantize_projected_out': quant_out,
                'loss_vq_commit_pbe': loss_pbe,
                'encoding_indices': ind,
                'perplexity': perplexity}


class AbNatiVModel(nn.Module):
    """Full scorer: one-hot [B, 149, 21] -> dict of reconstruction errors
    (abnativ_model.py:190-213)."""
    hp: AbNatiVParams
    straight_through: bool = False

    @nn.compact
    def __call__(self, inputs, *, deterministic: bool = True) -> Dict[str, jnp.ndarray]:
        x = AbNatiVEncoder(self.hp, name='encoder')(
            inputs, deterministic=deterministic)
        vq = CosineVQ(self.hp, straight_through=self.straight_through,
                      name='vqvae')(x)
        x_recon = AbNatiVDecoder(self.hp, name='decoder')(
            vq['quantize_projected_out'], deterministic=deterministic)
        err_pres_pposi = (x_recon - inputs) ** 2
        err_pposi = jnp.mean(err_pres_pposi, axis=-1)
        err_pbe = jnp.mean(err_pposi, axis=-1)
        return {'inputs': inputs, 'x_recon': x_recon,
                'recon_error_pres_pposi': err_pres_pposi,
                'recon_error_pposi': err_pposi,
                'recon_error_pbe': err_pbe,
                'loss_pbe': err_pbe + vq['loss_vq_commit_pbe'],
                **vq}


# ---------------------------------------------------------------------------
# Nativeness scoring (abnativ_scoring.py:95-183)
# ---------------------------------------------------------------------------

def nativeness_scores(output: Dict[str, jnp.ndarray], portion_mask,
                      model_type: str, all_seq: bool = False) -> jnp.ndarray:
    """Rescaled nativeness per sequence over selected positions.

    portion_mask: [B, 149] float/bool selecting positions (ignored when
    ``all_seq``). Sequences with an empty selection score 1.0
    (abnativ_scoring.py:139-140).
    """
    err = output['recon_error_pposi']
    if all_seq:
        raw = jnp.exp(-err.sum(axis=-1) / err.shape[1])
        norm_empty = None
    else:
        m = portion_mask.astype(err.dtype)
        norm = m.sum(axis=-1)
        raw = jnp.exp(-(err * m).sum(axis=-1) / norm)
        norm_empty = norm == 0
    t_r = C.ABNATIV_BEST_THRESHOLDS.get(model_type)
    if t_r is None:
        return raw
    rescaled = (C.ABNATIV_RESCALE_TARGET - 1.0) / (t_r - 1.0) * (raw - 1.0) + 1.0
    if norm_empty is not None:
        rescaled = jnp.where(norm_empty, 1.0, rescaled)
    return rescaled


def nativeness_scores_seq(output: Dict[str, jnp.ndarray], model_type: str
                          ) -> jnp.ndarray:
    """Whole-sequence variant normalized by non-gap residue count
    (abnativ_scoring.py:144-183)."""
    err = output['recon_error_pposi']
    non_gap = (jnp.argmax(output['inputs'], axis=-1) != C.ABNATIV_GAP_IDX)
    norm = non_gap.sum(axis=-1)
    raw = jnp.exp(-err.sum(axis=-1) / norm)
    t_r = C.ABNATIV_BEST_THRESHOLDS.get(model_type)
    if t_r is None:
        return raw
    return (C.ABNATIV_RESCALE_TARGET - 1.0) / (t_r - 1.0) * (raw - 1.0) + 1.0


# ---------------------------------------------------------------------------
# PyTorch checkpoint conversion (reference .ckpt files carry
# {'state_dict', 'hyper_parameters'} from pytorch-lightning)
# ---------------------------------------------------------------------------

def convert_torch_abnativ(ckpt: dict) -> Dict[str, Any]:
    """-> {'hp': AbNatiVParams, 'variables': flax params}."""
    hp_dict = ckpt.get('hyper_parameters', ckpt.get('hparams', {}))
    # the released lightning .ckpt files nest the dict one level deeper:
    # ckpt['hyper_parameters']['hparams'] (reference abnativ_scoring.py:284-287,
    # nanofinetune.py:31-34) — unwrap so real hparams are read instead of
    # silently falling back to the dataclass defaults
    if 'hparams' in hp_dict:
        hp_dict = hp_dict['hparams']
    hp = AbNatiVParams.from_dict(hp_dict)
    sd = {k: np.asarray(v.detach().cpu().numpy() if hasattr(v, 'detach') else v)
          for k, v in ckpt['state_dict'].items()}
    p: dict = {}

    def put(path, val):
        node = p
        parts = path.split('/')
        for q in parts[:-1]:
            node = node.setdefault(q, {})
        node[parts[-1]] = val

    def dense(dst, src):
        put(dst + '/kernel', sd[src + '.weight'].T)
        put(dst + '/bias', sd[src + '.bias'])

    def layernorm(dst, src):
        put(dst + '/scale', sd[src + '.weight'])
        put(dst + '/bias', sd[src + '.bias'])

    def mha(dst, src, d, heads):
        # torch MultiheadAttention packed in_proj [3d, d] -> flax per-head
        w = sd[src + '.in_proj_weight']
        b = sd[src + '.in_proj_bias']
        head_dim = d // heads
        for i, name in enumerate(('query', 'key', 'value')):
            wi = w[i * d:(i + 1) * d].T.reshape(d, heads, head_dim)
            bi = b[i * d:(i + 1) * d].reshape(heads, head_dim)
            put(f'{dst}/{name}/kernel', wi)
            put(f'{dst}/{name}/bias', bi)
        wo = sd[src + '.out_proj.weight'].T.reshape(heads, head_dim, d)
        put(dst + '/out/kernel', wo)
        put(dst + '/out/bias', sd[src + '.out_proj.bias'])

    def mha_block(dst, src, d, heads):
        mha(dst + '/mha', src + '.self_MHA', d, heads)
        dense(dst + '/ff1', src + '.MLperceptron.0')
        dense(dst + '/ff2', src + '.MLperceptron.3')
        layernorm(dst + '/norm1', src + '.layernorm1')
        layernorm(dst + '/norm2', src + '.layernorm2')

    d, heads = hp.d_embedding, hp.num_heads
    # encoder: cnn_embedding[1] is the Conv1d (index 0/2 are Rearranges)
    put('encoder/cnn/kernel', sd['encoder.cnn_embedding.1.weight'].transpose(2, 1, 0))
    put('encoder/cnn/bias', sd['encoder.cnn_embedding.1.bias'])
    for i in range(hp.num_mha_layers):
        mha_block(f'encoder/mha_{i}', f'encoder.en_MHA_blocks.{i}', d, heads)
        mha_block(f'decoder/mha_{i}', f'decoder.de_MHA_blocks.{i}', d, heads)
    # decoder transpose conv: torch weight [in, out, k] -> flax
    # transpose_kernel=True expects [k, out, in]
    put('decoder/cnn_t/kernel',
        sd['decoder.cnn_reconstruction.1.weight'].transpose(2, 1, 0))
    put('decoder/cnn_t/bias', sd['decoder.cnn_reconstruction.1.bias'])
    # VQ codebook (+ optional projections)
    embed = sd['vqvae._codebook.embed']
    if embed.ndim == 3:
        embed = embed[0]
    put('vqvae/codebook', embed)
    if 'vqvae.project_in.weight' in sd:
        dense('vqvae/project_in', 'vqvae.project_in')
        dense('vqvae/project_out', 'vqvae.project_out')
    return {'hp': hp, 'variables': {'params': p}}
