"""AbNatiV scorer tests, including numerical parity vs the reference torch
implementation (weights converted, outputs compared)."""
import os
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from hudiff_tpu import constants as C
from hudiff_tpu.models import abnativ as A

REF_ROOT = '/root/reference'

HP = dict(d_embedding=32, kernel=4, stride=2, num_heads=2, num_mha_layers=1,
          d_ff=64, length_seq=149, alphabet_size=21, num_embeddings=16,
          embedding_dim_code_book=8, decay=0.8, commitment_cost=1.0,
          drop=0.0, learning_rate=1e-3)


def _rand_onehot(B=3, L=149, V=21, seed=0):
    rs = np.random.RandomState(seed)
    idx = rs.randint(0, V, (B, L))
    out = np.zeros((B, L, V), np.float32)
    out[np.arange(B)[:, None], np.arange(L)[None, :], idx] = 1.0
    return out


def test_padding_math_matches_reference_formulas():
    # AHo length 149 with a few kernel/stride combos
    for K, S in [(4, 2), (7, 3), (5, 2), (9, 4)]:
        l_red, P = A.find_optimal_cnn1d_padding(149, K, S)
        # reference invariant: conv output length is integral
        assert float(A._l_out_cnn1d(149, K, S, P)).is_integer() or 2 * P >= S
        out_pad = A.find_out_padding_cnn1d_transpose(149, l_red, K, S, P)
        assert out_pad >= 0


def test_forward_shapes_and_scores():
    hp = A.AbNatiVParams.from_dict(HP)
    model = A.AbNatiVModel(hp)
    x = jnp.asarray(_rand_onehot())
    variables = model.init(jax.random.PRNGKey(0), x)
    out = model.apply(variables, x)
    assert out['x_recon'].shape == (3, 149, 21)
    assert out['recon_error_pposi'].shape == (3, 149)
    assert out['recon_error_pbe'].shape == (3,)
    # reconstruction is a softmax distribution
    np.testing.assert_allclose(np.asarray(out['x_recon'].sum(-1)), 1.0, rtol=1e-5)

    mask = jnp.ones((3, 149))
    s = A.nativeness_scores(out, mask, 'VH')
    assert s.shape == (3,)
    # empty portion scores exactly 1.0
    s_empty = A.nativeness_scores(out, jnp.zeros((3, 149)), 'VH')
    np.testing.assert_allclose(np.asarray(s_empty), 1.0)


def test_gradient_flows_to_inputs():
    hp = A.AbNatiVParams.from_dict(HP)
    model = A.AbNatiVModel(hp, straight_through=True)
    x = jnp.asarray(_rand_onehot())
    variables = model.init(jax.random.PRNGKey(0), x)

    def score(x):
        out = model.apply(variables, x)
        return A.nativeness_scores(out, jnp.ones((3, 149)), 'VH').sum()

    g = jax.grad(score)(x)
    assert bool(jnp.isfinite(g).all())
    assert float(jnp.abs(g).sum()) > 0


@pytest.mark.skipif(not os.path.isdir(REF_ROOT), reason='reference not mounted')
def test_parity_vs_reference_torch():
    import torch
    sys.path.insert(0, REF_ROOT)
    from model.nanoencoder.abnativ_model import AbNatiV_Model as TorchAbNatiV

    torch.manual_seed(0)
    tmodel = TorchAbNatiV(dict(HP))
    # codebook is kmeans-initted lazily; install a random, initialized one
    tmodel.vqvae._codebook.embed.data.normal_(0, 1.0)
    tmodel.vqvae._codebook.initted.data.fill_(1)
    tmodel.eval()

    x_np = _rand_onehot(B=2, seed=3)
    with torch.no_grad():
        tout = tmodel(torch.tensor(x_np))

    ckpt = {'state_dict': tmodel.state_dict(), 'hyper_parameters': dict(HP)}
    conv = A.convert_torch_abnativ(ckpt)
    jmodel = A.AbNatiVModel(conv['hp'])
    jout = jmodel.apply(conv['variables'], jnp.asarray(x_np))

    np.testing.assert_allclose(np.asarray(jout['x_recon']),
                               tout['x_recon'].numpy(), atol=2e-5)
    np.testing.assert_allclose(np.asarray(jout['recon_error_pposi']),
                               tout['recon_error_pposi'].numpy(), atol=2e-5)
    np.testing.assert_array_equal(np.asarray(jout['encoding_indices']),
                                  tout['encoding_indices'].numpy())
