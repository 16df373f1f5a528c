"""Structural parity of the torch->jax denoiser converter: a reference-layout
state dict (correct names + shapes) must convert into exactly our Flax tree."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from hudiff_tpu import constants as C
from hudiff_tpu.models.denoiser import NanoAntiTFNet, nano_config
from hudiff_tpu.training import checkpoints as CKPT


def _torch_like(shape):
    return np.random.RandomState(abs(hash(shape)) % 2**31).randn(*shape).astype(np.float32)


def _nano_reference_state_dict(cfg):
    """Reference NanoAntiTFNet state-dict layout (model/nanoencoder/model.py:
    290-343 + sequence_models layer structure), tiny config."""
    sd = {}
    d, sum_d, att, ff = cfg.d_model, cfg.sum_d_model, cfg.att_model, cfg.dim_feedforward

    def dense(name, din, dout):
        sd[name + '.weight'] = _torch_like((dout, din))
        sd[name + '.bias'] = _torch_like((dout,))

    def ln(name, dim):
        sd[name + '.weight'] = _torch_like((dim,))
        sd[name + '.bias'] = _torch_like((dim,))

    def pff(name, din, dout):
        sd[name + '.conv.weight'] = _torch_like((dout, din, 1))
        sd[name + '.conv.bias'] = _torch_like((dout,))

    def bytenet_block(prefix, dmodel, dh, k):
        ln(prefix + '.sequence1.0', dmodel)
        pff(prefix + '.sequence1.2', dmodel, dh)
        ln(prefix + '.sequence1.3', dh)
        sd[prefix + '.conv.weight'] = _torch_like((dh, dh, k))
        sd[prefix + '.conv.bias'] = _torch_like((dh,))
        ln(prefix + '.sequence2.0', dh)
        pff(prefix + '.sequence2.2', dh, dmodel)

    sd['aa_encoder.embedder.weight'] = _torch_like((cfg.n_tokens, cfg.d_embedding))
    for i in range(cfg.n_encoder_layers):
        bytenet_block(f'aa_encoder.layers.{i}', d, d // 2, cfg.aa_kernel_size)
    for i in range(cfg.dual_layers):
        bytenet_block(f'nano_conv_block.layers.{i}', sum_d, sum_d // 2,
                      cfg.aa_kernel_size)

    sd['region_encoder.region_embedding.weight'] = _torch_like(
        (cfg.n_region, cfg.r_embedding))
    ln('region_encoder.region_layer1.0', cfg.r_embedding)
    pff('region_encoder.region_layer1.2', cfg.r_embedding, cfg.r_model)
    ln('region_encoder.region_layer1.3', cfg.r_model)

    dense('pos_encoder.pos_lin.ln1', cfg.n_pos_model, 2 * cfg.n_pos_model)
    dense('pos_encoder.pos_lin.ln2', 2 * cfg.n_pos_model, cfg.n_pos_model)

    for i in range(cfg.cs_layers):
        p = f'self_at.layers.{i}'
        for attn in ('attn_hl', 'attn_hl_c'):
            dense(f'{p}.{attn}.query', sum_d, att)
            dense(f'{p}.{attn}.key', sum_d, att)
            dense(f'{p}.{attn}.value', sum_d, att)
            dense(f'{p}.{attn}.out_put', att, sum_d)
        ln(f'{p}.norm_hl1', sum_d)
        ln(f'{p}.norm_hl2', sum_d)
        dense(f'{p}.ff_hl.0', sum_d, ff)
        dense(f'{p}.ff_hl.2', ff, sum_d)

    ln('last_norm', sum_d)
    dense('decoder', sum_d, cfg.n_tokens)
    return sd


def _tree_paths(tree, prefix=''):
    out = {}
    for k, v in tree.items():
        path = f'{prefix}/{k}' if prefix else k
        if isinstance(v, dict):
            out.update(_tree_paths(v, path))
        else:
            out[path] = tuple(np.shape(v))
    return out


def test_nano_converter_matches_flax_tree():
    cfg = nano_config().test_size()
    model = NanoAntiTFNet(cfg)
    tokens = jnp.zeros((1, C.HEAVY_LEN), jnp.int32)
    region = jnp.zeros((1, C.HEAVY_LEN), jnp.int32)
    init = model.init(jax.random.PRNGKey(0), tokens, region)

    sd = _nano_reference_state_dict(cfg)
    conv = CKPT.convert_torch_denoiser(sd, pair=False)

    want = _tree_paths(init['params'])
    got = _tree_paths(conv['params'])
    missing = sorted(set(want) - set(got))
    extra = sorted(set(got) - set(want))
    assert not missing, f'converter missing params: {missing[:8]}'
    assert not extra, f'converter extra params: {extra[:8]}'
    mismatched = [k for k in want if want[k] != got[k]]
    assert not mismatched, \
        f'shape mismatches: {[(k, want[k], got[k]) for k in mismatched[:5]]}'

    # converted tree must run through the model
    logits = model.apply({'params': conv['params']}, tokens, region)
    assert logits.shape == (1, C.HEAVY_LEN, C.N_TOKENS)
    assert bool(jnp.isfinite(logits).all())


def test_module_prefix_strip():
    sd = {'module.decoder.weight': np.zeros((3, 4)),
          'decoder.bias': np.zeros(3)}
    out = CKPT._strip_module_prefix(sd)
    assert set(out) == {'decoder.weight', 'decoder.bias'}
