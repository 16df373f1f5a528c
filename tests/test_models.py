import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hudiff_tpu import constants as C
from hudiff_tpu.models.denoiser import (AntiTFNet, DenoiserConfig,
                                        NanoAntiTFNet, nano_config)


@pytest.fixture(scope='module')
def tiny_pair():
    cfg = DenoiserConfig().test_size()
    model = AntiTFNet(cfg)
    rng = jax.random.PRNGKey(0)
    B = 2
    tokens = jax.random.randint(rng, (B, C.PAIR_LEN), 0, C.N_TOKENS)
    region = jnp.concatenate([
        jnp.broadcast_to(jnp.asarray(C.HEAVY_REGION_INDEX), (B, C.HEAVY_LEN)),
        jnp.broadcast_to(jnp.asarray(C.LIGHT_REGION_INDEX), (B, C.LIGHT_LEN)),
    ], axis=1)
    chain = jnp.asarray([[0, 2], [0, 1]])
    params = model.init(rng, tokens, region, chain)
    return model, params, (tokens, region, chain)


def test_pair_forward_shape(tiny_pair):
    model, params, args = tiny_pair
    logits = model.apply(params, *args)
    assert logits.shape == (2, C.PAIR_LEN, C.N_TOKENS)
    assert logits.dtype == jnp.float32
    assert bool(jnp.isfinite(logits).all())


def test_pair_jit_and_grad(tiny_pair):
    model, params, args = tiny_pair

    @jax.jit
    def loss_fn(p):
        logits = model.apply(p, *args)
        return jnp.mean(logits ** 2)

    g = jax.grad(loss_fn)(params)
    leaves = jax.tree_util.tree_leaves(g)
    assert all(bool(jnp.isfinite(x).all()) for x in leaves)
    # every parameter should receive gradient signal somewhere
    total = sum(float(jnp.abs(x).sum()) for x in leaves)
    assert total > 0


def test_pair_dropout_changes_train_output(tiny_pair):
    model, params, args = tiny_pair
    out_eval = model.apply(params, *args, deterministic=True)
    out_tr1 = model.apply(params, *args, deterministic=False,
                          rngs={'dropout': jax.random.PRNGKey(1)})
    out_tr2 = model.apply(params, *args, deterministic=False,
                          rngs={'dropout': jax.random.PRNGKey(2)})
    # eval is deterministic; train outputs differ across dropout rngs
    out_eval2 = model.apply(params, *args, deterministic=True)
    np.testing.assert_array_equal(np.asarray(out_eval), np.asarray(out_eval2))
    assert not np.allclose(np.asarray(out_tr1), np.asarray(out_tr2))


def test_nano_forward_shape():
    cfg = nano_config().test_size()
    model = NanoAntiTFNet(cfg)
    rng = jax.random.PRNGKey(0)
    B = 3
    tokens = jax.random.randint(rng, (B, C.HEAVY_LEN), 0, C.N_TOKENS)
    region = jnp.broadcast_to(jnp.asarray(C.HEAVY_REGION_INDEX), (B, C.HEAVY_LEN))
    params = model.init(rng, tokens, region)
    logits = model.apply(params, tokens, region)
    assert logits.shape == (B, C.HEAVY_LEN, C.N_TOKENS)
    assert bool(jnp.isfinite(logits).all())


def test_bfloat16_compute():
    cfg = DenoiserConfig().test_size()
    model = AntiTFNet(cfg, dtype=jnp.bfloat16)
    rng = jax.random.PRNGKey(0)
    tokens = jax.random.randint(rng, (2, C.PAIR_LEN), 0, C.N_TOKENS)
    region = jnp.zeros((2, C.PAIR_LEN), jnp.int32)
    chain = jnp.asarray([[0, 1], [0, 2]])
    params = model.init(rng, tokens, region, chain)
    logits = model.apply(params, tokens, region, chain)
    # decoder upcasts: logits are fp32 even with bf16 compute
    assert logits.dtype == jnp.float32
    assert bool(jnp.isfinite(logits).all())
