"""Numeric torch->jax parity for the denoiser building blocks.

The AbNatiV converter has end-to-end numeric parity (test_abnativ.py); this
closes the remaining untested link for loading the released reference
checkpoints (hudiffab.pt / hudiffnb.pt): the attention stack (incl. the RoPE
column permutation in convert_torch_denoiser) and the ByteNet block.

The reference SelfAttNet (model/encoder/cross_attention.py:291-310) is pure
torch and importable without the external `sequence_models` package; the
ByteNetBlock is re-created locally with the sequence_models layout the
converter expects (sequence1 = [LN, act, PFF, LN, act]; conv;
sequence2 = [LN, act, PFF]).
"""
import importlib.util
import os

import numpy as np
import pytest

torch = pytest.importorskip('torch')

REF_XATTN = '/root/reference/model/encoder/cross_attention.py'
needs_ref = pytest.mark.skipif(not os.path.exists(REF_XATTN),
                               reason='reference not mounted')


def _load_ref_cross_attention():
    spec = importlib.util.spec_from_file_location('ref_xattn', REF_XATTN)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@needs_ref
@pytest.mark.parametrize('length', [291, 152])
def test_self_att_stack_numeric_parity(length):
    """Reference SelfAttNet with random weights == converted Flax SelfAttNet
    (validates the qkv merge + interleaved->rotate-half RoPE permutation)."""
    import jax
    import jax.numpy as jnp

    from hudiff_tpu.models.denoiser import SelfAttNet
    from hudiff_tpu.training.checkpoints import convert_torch_self_att

    ref = _load_ref_cross_attention()
    torch.manual_seed(0)
    d_model, att_model, ff, nhead, n_layers = 48, 64, 96, 8, 2
    net = ref.SelfAttNet(d_model, att_model, ff, nhead, length, n_layers)
    net.eval()

    x = torch.randn(2, length, d_model)
    with torch.no_grad():
        want = net(x).numpy()

    variables = convert_torch_self_att(
        {k: v for k, v in net.state_dict().items()}, nhead=nhead)
    flax_net = SelfAttNet(d_model=d_model, att_model=att_model,
                          dim_feedforward=ff, nhead=nhead, length=length,
                          n_layers=n_layers)
    got = np.asarray(flax_net.apply(
        jax.tree_util.tree_map(jnp.asarray, variables), jnp.asarray(x.numpy())))

    np.testing.assert_allclose(got, want, atol=2e-4, rtol=2e-4)


class _PFF(torch.nn.Module):
    """sequence_models.PositionFeedForward: Conv1d(k=1) over channels."""

    def __init__(self, d_in, d_out):
        super().__init__()
        self.conv = torch.nn.Conv1d(d_in, d_out, 1)

    def forward(self, x):
        return self.conv(x.transpose(1, 2)).transpose(1, 2)


class _MaskedConv1d(torch.nn.Conv1d):
    """sequence_models.MaskedConv1d: same-padded Conv1d on (N, L, C)."""

    def __init__(self, d_in, d_out, kernel_size, dilation=1):
        padding = dilation * (kernel_size - 1) // 2
        super().__init__(d_in, d_out, kernel_size, dilation=dilation,
                         padding=padding)

    def forward(self, x):
        return super().forward(x.transpose(1, 2)).transpose(1, 2)


class _TorchByteNetBlock(torch.nn.Module):
    """sequence_models.ByteNetBlock layout (the converter's source schema)."""

    def __init__(self, d_in, d_h, d_out, kernel_size, dilation=1,
                 activation='relu'):
        super().__init__()
        act = torch.nn.ReLU() if activation == 'relu' else torch.nn.GELU()
        self.conv = _MaskedConv1d(d_h, d_h, kernel_size, dilation=dilation)
        self.sequence1 = torch.nn.Sequential(
            torch.nn.LayerNorm(d_in), act, _PFF(d_in, d_h),
            torch.nn.LayerNorm(d_h), act)
        self.sequence2 = torch.nn.Sequential(
            torch.nn.LayerNorm(d_h), act, _PFF(d_h, d_out))

    def forward(self, x):
        return x + self.sequence2(self.conv(self.sequence1(x)))


def _dilations(n_layers, r):
    log2 = int(np.log2(r)) + 1
    return [2 ** (n % log2) for n in range(n_layers)]


class _TorchByteNetTime(torch.nn.Module):
    """Reference ByteNetTime (model/encoder/model.py:90-180): token embed +
    separate H/L conv towers over the split 152/139 halves. down_embed=False
    (the reference configs), so up_embedder is Identity. dropout=0 (the
    always-on F.dropout quirk is irrelevant to weight layout)."""

    def __init__(self, n_tokens, d_embedding, d_model, n_layers, kernel_size,
                 r, activation='relu', h_len=152):
        super().__init__()
        assert d_model == d_embedding
        self.embedder = torch.nn.Embedding(n_tokens, d_embedding)
        mk = lambda: torch.nn.ModuleList([
            _TorchByteNetBlock(d_model, d_model // 2, d_model, kernel_size,
                               dilation=d, activation=activation)
            for d in _dilations(n_layers, r)])
        self.h_layers = mk()
        self.l_layers = mk()
        self.h_len = h_len

    def forward(self, x):
        e = self.embedder(x)
        h_e, l_e = e[:, :self.h_len, :], e[:, self.h_len:, :]
        for h_layer, l_layer in zip(self.h_layers, self.l_layers):
            h_e, l_e = h_layer(h_e), l_layer(l_e)
        return torch.cat((h_e, l_e), dim=1)


class _TorchNanoByteNetTime(torch.nn.Module):
    """Reference NanoByteNetTime (model/nanoencoder/model.py:91-170):
    single conv tower."""

    def __init__(self, n_tokens, d_embedding, d_model, n_layers, kernel_size,
                 r, activation='relu'):
        super().__init__()
        self.embedder = torch.nn.Embedding(n_tokens, d_embedding)
        self.layers = torch.nn.ModuleList([
            _TorchByteNetBlock(d_model, d_model // 2, d_model, kernel_size,
                               dilation=d, activation=activation)
            for d in _dilations(n_layers, r)])

    def forward(self, x):
        e = self.embedder(x)
        for layer in self.layers:
            e = layer(e)
        return e


class _TorchSideEmbedder(torch.nn.Module):
    """Reference SideEmbedder (model/encoder/model.py:183-205), including its
    flattened-[2B] input convention and the 'side_embeddinng' attribute typo
    the converter keys on."""

    def __init__(self, n_side, s_embedding, d_side, h_len=152, l_len=139):
        super().__init__()
        self.side_embeddinng = torch.nn.Embedding(n_side, s_embedding)
        self.side_mlp = torch.nn.Sequential(
            torch.nn.Linear(s_embedding, d_side),
            torch.nn.LayerNorm(d_side),
            torch.nn.ReLU(),
            torch.nn.Linear(d_side, d_side))
        self.h_len, self.l_len = h_len, l_len

    def forward(self, side, mask=None):
        emb_side = self.side_embeddinng(side.view(-1, 1))
        emb_side = self.side_mlp(emb_side)
        h = emb_side[side == 0].repeat(1, self.h_len, 1)
        l = emb_side[side != 0].repeat(1, self.l_len, 1)
        return torch.cat((h, l), dim=1)


class _TorchRegionEmbedder(torch.nn.Module):
    """Reference RegionEmbedder (model/encoder/model.py:208-230)."""

    def __init__(self, r_pos, r_embedding, r_model):
        super().__init__()
        self.region_embedding = torch.nn.Embedding(r_pos, r_embedding)
        self.region_layer1 = torch.nn.Sequential(
            torch.nn.LayerNorm(r_embedding),
            torch.nn.ReLU(),
            _PFF(r_embedding, r_model),
            torch.nn.LayerNorm(r_model),
            torch.nn.ReLU())

    def forward(self, pos_seq):
        return self.region_layer1(self.region_embedding(pos_seq))


class _TorchMLP(torch.nn.Module):
    """Reference MLP (model/encoder/model.py:19-33); nn.Dropout is inactive
    under eval()."""

    def __init__(self, n_embd):
        super().__init__()
        self.ln1 = torch.nn.Linear(n_embd, 2 * n_embd)
        self.gelu = torch.nn.GELU()
        self.ln2 = torch.nn.Linear(2 * n_embd, n_embd)
        self.dropout = torch.nn.Dropout()

    def forward(self, x):
        return self.dropout(self.ln2(self.gelu(self.ln1(x))))


class _TorchPosEmbedder(torch.nn.Module):
    """Reference PosEmbedder + PositionalEncoding
    (model/encoder/model.py:62-87, :233-246)."""

    def __init__(self, p_emb, max_len):
        super().__init__()
        position = torch.arange(max_len).unsqueeze(1)
        div = torch.exp(torch.arange(0, p_emb, 2)
                        * (-np.log(10000.0) / p_emb))
        pe = torch.zeros(max_len, 1, p_emb)
        pe[:, 0, 0::2] = torch.sin(position * div)
        pe[:, 0, 1::2] = torch.cos(position * div)
        self.register_buffer('pe', pe)
        self.pos_lin = _TorchMLP(n_embd=p_emb)

    def forward(self, x):
        y = self.pe[:x.size(1)]
        x = x + y.reshape(y.shape[1], y.shape[0], y.shape[2])
        return x + self.pos_lin(x)


class _TorchDualConv(torch.nn.Module):
    """Reference DualConv (model/encoder/model.py:249-304); activation is the
    class default 'relu' as AntiTFNet instantiates it. dropout=0."""

    def __init__(self, d_model, n_layers, kernel_size, r, h_len=152):
        super().__init__()
        mk = lambda: torch.nn.ModuleList([
            _TorchByteNetBlock(d_model, d_model // 2, d_model, kernel_size,
                               dilation=d, activation='relu')
            for d in _dilations(n_layers, r)])
        self.h_layers = mk()
        self.l_layers = mk()
        self.h_len = h_len

    def forward(self, s):
        h_s, l_s = s[:, :self.h_len, :], s[:, self.h_len:, :]
        for layer in self.h_layers:
            h_s = layer(h_s)
        for layer in self.l_layers:
            l_s = layer(l_s)
        return h_s, l_s


class _TorchNanoConv(torch.nn.Module):
    """Reference NanoConv (model/nanoencoder/model.py:239-270); class default
    activation 'gelu'."""

    def __init__(self, d_model, n_layers, kernel_size, r):
        super().__init__()
        self.layers = torch.nn.ModuleList([
            _TorchByteNetBlock(d_model, d_model // 2, d_model, kernel_size,
                               dilation=d, activation='gelu')
            for d in _dilations(n_layers, r)])

    def forward(self, s):
        for layer in self.layers:
            s = layer(s)
        return s


class _TorchAntiTFNet(torch.nn.Module):
    """The COMPLETE reference AntiTFNet (model/encoder/model.py:325-384) with
    the exact module tree convert_torch_denoiser expects; forward wiring
    copied from _encoder/_att/forward (:351-384): note the pos encoder runs
    ON the region embedding, and the concat is (summed, pos, side)."""

    def __init__(self, n_tokens, d_embedding, d_model, n_encoder_layers,
                 aa_kernel_size, r, n_side, s_embedding, s_model, n_region,
                 r_embedding, r_model, n_pos_model, max_len, sum_d_model,
                 dual_layers, att_model, dim_feedforward, nhead, cs_layers,
                 activation='relu'):
        super().__init__()
        ref = _load_ref_cross_attention()
        self.aa_encoder = _TorchByteNetTime(
            n_tokens, d_embedding, d_model, n_encoder_layers, aa_kernel_size,
            r, activation=activation)
        self.side_encoder = _TorchSideEmbedder(n_side, s_embedding, s_model)
        self.region_encoder = _TorchRegionEmbedder(n_region, r_embedding,
                                                   r_model)
        self.pos_encoder = _TorchPosEmbedder(n_pos_model, max_len)
        self.dual_conv_block = _TorchDualConv(sum_d_model, dual_layers,
                                              aa_kernel_size, r)
        self.self_at = ref.SelfAttNet(sum_d_model, att_model, dim_feedforward,
                                      nhead, max_len, cs_layers)
        self.last_norm = torch.nn.LayerNorm(sum_d_model)
        self.decoder = torch.nn.Linear(sum_d_model, n_tokens)

    def forward(self, seq, region, chn_type):
        emb = self.aa_encoder(seq.int())
        chn_emb = self.side_encoder(chn_type)
        region_emb = self.region_encoder(region.int())
        pos_emb = self.pos_encoder(region_emb)
        summed = emb + pos_emb + chn_emb
        feature = torch.cat((summed, pos_emb, chn_emb), dim=-1)
        h, l = self.dual_conv_block(feature)
        h_l = self.self_at(torch.cat((h, l), dim=1))
        return self.decoder(self.last_norm(h_l))


class _TorchNanoAntiTFNet(torch.nn.Module):
    """The COMPLETE reference NanoAntiTFNet
    (model/nanoencoder/model.py:290-343): no side embedder; feature =
    cat(emb + pos, pos)."""

    def __init__(self, n_tokens, d_embedding, d_model, n_encoder_layers,
                 aa_kernel_size, r, n_region, r_embedding, r_model,
                 n_pos_model, max_len, sum_d_model, dual_layers, att_model,
                 dim_feedforward, nhead, cs_layers, activation='relu'):
        super().__init__()
        ref = _load_ref_cross_attention()
        self.aa_encoder = _TorchNanoByteNetTime(
            n_tokens, d_embedding, d_model, n_encoder_layers, aa_kernel_size,
            r, activation=activation)
        self.region_encoder = _TorchRegionEmbedder(n_region, r_embedding,
                                                   r_model)
        self.pos_encoder = _TorchPosEmbedder(n_pos_model, max_len)
        self.nano_conv_block = _TorchNanoConv(sum_d_model, dual_layers,
                                              aa_kernel_size, r)
        self.self_at = ref.SelfAttNet(sum_d_model, att_model, dim_feedforward,
                                      nhead, max_len, cs_layers)
        self.last_norm = torch.nn.LayerNorm(sum_d_model)
        self.decoder = torch.nn.Linear(sum_d_model, n_tokens)

    def forward(self, seq, region, chn_type=None):
        emb = self.aa_encoder(seq.int())
        pos_emb = self.pos_encoder(self.region_encoder(region.int()))
        feature = torch.cat((emb + pos_emb, pos_emb), dim=-1)
        h = self.nano_conv_block(feature)
        h = self.self_at(h)
        return self.decoder(self.last_norm(h))


@needs_ref
def test_full_antitfnet_numeric_parity():
    """END-TO-END: a random-weight reference AntiTFNet, converted with
    convert_torch_denoiser, produces the same logits as our Flax AntiTFNet —
    the full composition (embed, split towers, side/region/pos encoders,
    concat wiring, dual towers, attention stack, decoder), not just blocks.
    This is the load path for the released hudiffab.pt."""
    import jax
    import jax.numpy as jnp

    from hudiff_tpu import constants as C
    from hudiff_tpu.models.denoiser import AntiTFNet, DenoiserConfig
    from hudiff_tpu.training.checkpoints import convert_torch_denoiser

    torch.manual_seed(2)
    d = 48
    nhead = 8
    kw = dict(n_tokens=23, d_embedding=d, d_model=d, n_encoder_layers=2,
              aa_kernel_size=5, r=4, n_side=3, s_embedding=4, s_model=d,
              n_region=7, r_embedding=4, r_model=d, n_pos_model=d,
              max_len=C.PAIR_LEN, sum_d_model=3 * d, dual_layers=2,
              att_model=64, dim_feedforward=96, nhead=nhead, cs_layers=2,
              activation='gelu')
    net = _TorchAntiTFNet(**kw)
    net.eval()

    B = 2
    rng = np.random.default_rng(0)
    tokens = rng.integers(0, 23, size=(B, C.PAIR_LEN))
    region = np.concatenate([np.asarray(C.HEAVY_REGION_INDEX),
                             np.asarray(C.LIGHT_REGION_INDEX)])
    region = np.tile(region[None, :], (B, 1))
    chain_pairs = np.asarray([[0, 2], [0, 1]])  # (H, K), (H, L)

    with torch.no_grad():
        want = net(torch.from_numpy(tokens),
                   torch.from_numpy(region),
                   # reference takes the chain types flattened to [2B]
                   torch.from_numpy(chain_pairs.reshape(-1))).numpy()

    variables = convert_torch_denoiser(net.state_dict(), pair=True,
                                       nhead=nhead)
    cfg = DenoiserConfig(**{k: v for k, v in kw.items()
                            if k != 'activation'}, activation='gelu')
    flax_net = AntiTFNet(cfg)
    got = np.asarray(flax_net.apply(
        jax.tree_util.tree_map(jnp.asarray, variables),
        jnp.asarray(tokens), jnp.asarray(region), jnp.asarray(chain_pairs)))

    np.testing.assert_allclose(got, want, atol=2e-4, rtol=2e-4)


@needs_ref
def test_torch_checkpoint_file_roundtrip(tmp_path):
    """The on-disk path for released checkpoints: torch.save a reference
    payload ({'model': state_dict, 'pretrain_config': ...}, the
    antibody_finetune.py:348-355 layout), reload via load_torch_checkpoint,
    convert, and match logits — covers file (de)serialization on top of the
    in-memory parity tests."""
    import jax
    import jax.numpy as jnp

    from hudiff_tpu import constants as C
    from hudiff_tpu.models.denoiser import AntiTFNet, DenoiserConfig
    from hudiff_tpu.training.checkpoints import (convert_torch_denoiser,
                                                 load_torch_checkpoint)

    torch.manual_seed(5)
    d = 32
    kw = dict(n_tokens=23, d_embedding=d, d_model=d, n_encoder_layers=1,
              aa_kernel_size=5, r=4, n_side=3, s_embedding=4, s_model=d,
              n_region=7, r_embedding=4, r_model=d, n_pos_model=d,
              max_len=C.PAIR_LEN, sum_d_model=3 * d, dual_layers=1,
              att_model=32, dim_feedforward=64, nhead=4, cs_layers=1,
              activation='gelu')
    net = _TorchAntiTFNet(**kw)
    net.eval()
    path = tmp_path / 'hudiffab.pt'
    torch.save({'model': net.state_dict(), 'pretrain_config': {'x': 1}},
               str(path))

    ckpt = load_torch_checkpoint(str(path))
    assert ckpt['pretrain_config'] == {'x': 1}
    variables = convert_torch_denoiser(ckpt['model'], pair=True, nhead=4)

    B = 2
    rng = np.random.default_rng(3)
    tokens = rng.integers(0, 23, size=(B, C.PAIR_LEN))
    region = np.tile(np.concatenate(
        [np.asarray(C.HEAVY_REGION_INDEX),
         np.asarray(C.LIGHT_REGION_INDEX)])[None, :], (B, 1))
    chain_pairs = np.asarray([[0, 2], [0, 1]])
    with torch.no_grad():
        want = net(torch.from_numpy(tokens), torch.from_numpy(region),
                   torch.from_numpy(chain_pairs.reshape(-1))).numpy()
    cfg = DenoiserConfig(**{k: v for k, v in kw.items()
                            if k != 'activation'}, activation='gelu')
    got = np.asarray(AntiTFNet(cfg).apply(
        jax.tree_util.tree_map(jnp.asarray, variables),
        jnp.asarray(tokens), jnp.asarray(region), jnp.asarray(chain_pairs)))
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=2e-4)


@needs_ref
def test_full_nano_antitfnet_numeric_parity():
    """Same end-to-end guarantee for NanoAntiTFNet (hudiffnb.pt load path)."""
    import jax
    import jax.numpy as jnp

    from hudiff_tpu import constants as C
    from hudiff_tpu.models.denoiser import DenoiserConfig, NanoAntiTFNet
    from hudiff_tpu.training.checkpoints import convert_torch_denoiser

    torch.manual_seed(3)
    d = 48
    nhead = 8
    kw = dict(n_tokens=23, d_embedding=d, d_model=d, n_encoder_layers=2,
              aa_kernel_size=5, r=4, n_region=7, r_embedding=4, r_model=d,
              n_pos_model=d, max_len=C.HEAVY_LEN, sum_d_model=2 * d,
              dual_layers=2, att_model=64, dim_feedforward=96, nhead=nhead,
              cs_layers=2, activation='gelu')
    net = _TorchNanoAntiTFNet(**kw)
    net.eval()

    B = 3
    rng = np.random.default_rng(1)
    tokens = rng.integers(0, 23, size=(B, C.HEAVY_LEN))
    region = np.tile(np.asarray(C.HEAVY_REGION_INDEX)[None, :], (B, 1))

    with torch.no_grad():
        want = net(torch.from_numpy(tokens),
                   torch.from_numpy(region)).numpy()

    variables = convert_torch_denoiser(net.state_dict(), pair=False,
                                       nhead=nhead)
    cfg = DenoiserConfig(
        **{k: v for k, v in kw.items()
           if k not in ('activation',)},
        n_side=3, s_embedding=4, s_model=d, activation='gelu')
    flax_net = NanoAntiTFNet(cfg)
    got = np.asarray(flax_net.apply(
        jax.tree_util.tree_map(jnp.asarray, variables),
        jnp.asarray(tokens), jnp.asarray(region)))

    np.testing.assert_allclose(got, want, atol=2e-4, rtol=2e-4)


@pytest.mark.parametrize('activation,dilation', [('relu', 1), ('gelu', 4)])
def test_bytenet_block_numeric_parity(activation, dilation):
    import jax
    import jax.numpy as jnp

    from hudiff_tpu.ops.bytenet import ByteNetBlock
    from hudiff_tpu.training.checkpoints import convert_torch_bytenet_block

    torch.manual_seed(1)
    d, d_h, k = 32, 16, 7
    blk = _TorchByteNetBlock(d, d_h, d, k, dilation=dilation,
                             activation=activation)
    blk.eval()
    x = torch.randn(3, 152, d)
    with torch.no_grad():
        want = blk(x).numpy()

    variables = convert_torch_bytenet_block(blk.state_dict())
    flax_blk = ByteNetBlock(d_h=d_h, d_out=d, kernel_size=k,
                            dilation=dilation, activation=activation)
    got = np.asarray(flax_blk.apply(
        jax.tree_util.tree_map(jnp.asarray, variables), jnp.asarray(x.numpy())))

    np.testing.assert_allclose(got, want, atol=2e-4, rtol=2e-4)
