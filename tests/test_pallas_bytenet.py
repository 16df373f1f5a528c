"""Fused Pallas ByteNet block (ops/pallas_bytenet.py) vs the Flax module path.

The fused kernel must be a drop-in for ByteNetBlock/ByteNetStack: identical
parameter tree (names, shapes, init values — checkpoints interchangeable),
matching outputs, and matching gradients (analytic VJP vs autodiff through
the module path). Runs in interpret mode on CPU (use_pallas='always'), f32.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hudiff_tpu.ops.bytenet import ByteNetBlock, ByteNetStack
from hudiff_tpu.ops.pallas_bytenet import block_matmul_flops


def _block(use_pallas, act, dil, d_h=12, d_out=16, k=5):
    return ByteNetBlock(d_h=d_h, d_out=d_out, kernel_size=k, dilation=dil,
                        activation=act, use_pallas=use_pallas)


@pytest.mark.parametrize('act', ['relu', 'gelu'])
@pytest.mark.parametrize('dil', [1, 4])
def test_block_fused_matches_module(act, dil):
    ref = _block('never', act, dil)
    fused = _block('always', act, dil)
    x = jnp.asarray(np.random.RandomState(0).randn(3, 21, 16), jnp.float32)
    params = ref.init(jax.random.PRNGKey(7), x)
    out_ref = ref.apply(params, x)
    out_fused = fused.apply(params, x)
    np.testing.assert_allclose(np.asarray(out_fused), np.asarray(out_ref),
                               rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize('act', ['relu', 'gelu'])
def test_block_grads_match(act):
    ref = _block('never', act, 2)
    fused = _block('always', act, 2)
    x = jnp.asarray(np.random.RandomState(1).randn(2, 13, 16), jnp.float32)
    params = ref.init(jax.random.PRNGKey(3), x)

    def loss(mod):
        def f(p, xin):
            y = mod.apply(p, xin)
            # position-dependent weighting so dx is not a constant field
            w = jnp.arange(y.size, dtype=jnp.float32).reshape(y.shape)
            return jnp.sum(y * jnp.sin(w))
        return jax.value_and_grad(f, argnums=(0, 1))

    v_ref, (gp_ref, gx_ref) = loss(ref)(params, x)
    v_fused, (gp_fused, gx_fused) = loss(fused)(params, x)
    np.testing.assert_allclose(float(v_fused), float(v_ref), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(gx_fused), np.asarray(gx_ref),
                               rtol=2e-4, atol=2e-4)
    flat_ref = jax.tree_util.tree_leaves_with_path(gp_ref)
    flat_fused = dict(jax.tree_util.tree_leaves_with_path(gp_fused))
    assert len(flat_ref) == 12  # 3 LN pairs + 3 kernel/bias pairs
    for path, leaf in flat_ref:
        got = flat_fused[path]
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(leaf), rtol=2e-4, atol=2e-4,
            err_msg=jax.tree_util.keystr(path))


def test_param_tree_identical_both_paths():
    """Same key -> bit-identical init through either path (flax derives the
    param RNG from the parameter path, so matching trees is the whole
    checkpoint-interchangeability story)."""
    x = jnp.zeros((1, 9, 16), jnp.float32)
    p_ref = _block('never', 'gelu', 2).init(jax.random.PRNGKey(11), x)
    p_fused = _block('always', 'gelu', 2).init(jax.random.PRNGKey(11), x)
    ref_flat = jax.tree_util.tree_leaves_with_path(p_ref)
    fused_flat = jax.tree_util.tree_leaves_with_path(p_fused)
    assert [p for p, _ in ref_flat] == [p for p, _ in fused_flat]
    for (path, a), (_, b) in zip(ref_flat, fused_flat):
        assert a.shape == b.shape and a.dtype == b.dtype
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                      err_msg=jax.tree_util.keystr(path))


def test_stack_fused_matches_module():
    """Full stack with the production dilation cycle (1,2,4) and gelu."""
    kw = dict(n_layers=3, d_model=16, kernel_size=5, r=4, activation='gelu',
              dropout=0.0)
    ref = ByteNetStack(use_pallas='never', **kw)
    fused = ByteNetStack(use_pallas='always', **kw)
    x = jnp.asarray(np.random.RandomState(2).randn(4, 19, 16), jnp.float32)
    params = ref.init(jax.random.PRNGKey(5), x)
    np.testing.assert_allclose(np.asarray(fused.apply(params, x)),
                               np.asarray(ref.apply(params, x)),
                               rtol=3e-5, atol=3e-5)


def test_conv_pallas_policy():
    """Routing table from the v5e measurements (docs/perf.md): every tower
    follows use_pallas on forward-only traces; under training only widths
    up to 512 stay fused (768 loses the fused backward, 0.85x)."""
    from hudiff_tpu.models.denoiser import conv_pallas_policy as pol
    for d in (256, 512, 768):
        assert pol('auto', d, deterministic=True) == 'auto'
        assert pol('never', d, deterministic=True) == 'never'
    assert pol('auto', 256, deterministic=False) == 'auto'
    assert pol('auto', 512, deterministic=False) == 'auto'
    assert pol('auto', 768, deterministic=False) == 'never'


def test_flop_counters():
    fwd = block_matmul_flops(8, 152, 256, 128, 7)
    assert fwd == 2.0 * 8 * 152 * (256 * 128 + 7 * 128 * 128 + 128 * 256)
    assert block_matmul_flops(8, 152, 256, 128, 7, backward=True) == 3 * fwd

    from hudiff_tpu.models.denoiser import DenoiserConfig, nano_config
    from hudiff_tpu.utils.flops import denoiser_pallas_flops
    cfg = DenoiserConfig()
    # pair training: d=768 dual towers route to XLA -> strictly fewer
    # pallas flops than the deterministic trace of the same pass shape
    train = denoiser_pallas_flops(cfg, 4, kind='pair', deterministic=False,
                                  backward=True)
    det = denoiser_pallas_flops(cfg, 4, kind='pair', deterministic=True,
                                backward=True)
    assert 0 < train < det
    # nano training: all towers fused (512 max width)
    ncfg = nano_config()
    ntrain = denoiser_pallas_flops(ncfg, 4, kind='heavy', deterministic=False,
                                   backward=True)
    ndet = denoiser_pallas_flops(ncfg, 4, kind='heavy', deterministic=True,
                                 backward=True)
    assert ntrain == ndet > 0
