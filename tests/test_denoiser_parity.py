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
