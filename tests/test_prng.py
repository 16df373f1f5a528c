"""The rbg dropout re-key: faster bits, identical semantics where it counts.

Training steps derive their dropout stream from XLA's RngBitGenerator
('rbg') instead of threefry — measured ~8.5 ms cheaper per B=128 flagship
step on TPU v5e (docs/train_breakdown_b128.json). These tests pin the two
invariants the swap must preserve:

  1. the OA-ARDM corruption draws (which positions mask, semantics-bearing)
     stay on threefry and are bit-identical with rbg_dropout on or off —
     proven by running the step at dropout=0.0, where the ONLY remaining
     randomness is the corruption stream;
  2. steps remain deterministic per key.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hudiff_tpu import constants as C
from hudiff_tpu.models.denoiser import AntiTFNet, DenoiserConfig
from hudiff_tpu.training import schedules
from hudiff_tpu.training import train_step as T
from hudiff_tpu.utils.config import Namespace
from hudiff_tpu.utils.prng import rbg_dropout_key


def test_rbg_key_from_raw_and_typed():
    raw = jax.random.PRNGKey(7)                      # uint32[2]
    typed = jax.random.key(7)                        # typed threefry key
    for k in (raw, typed):
        rk = rbg_dropout_key(k)
        assert jnp.issubdtype(rk.dtype, jax.dtypes.prng_key)
        assert jax.random.key_data(rk).shape == (4,)
        # usable: bernoulli + fold_in (what flax Dropout does internally)
        m = jax.random.bernoulli(jax.random.fold_in(rk, 3), 0.8, (16,))
        assert m.shape == (16,)
    # same input key -> same rbg key (pure function)
    a = jax.random.key_data(rbg_dropout_key(raw))
    b = jax.random.key_data(rbg_dropout_key(raw))
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.fixture(scope='module')
def tiny_pair():
    cfg = DenoiserConfig(n_encoder_layers=1, dual_layers=1, cs_layers=1,
                         dropout=0.0)
    model = AntiTFNet(cfg, dtype=jnp.float32)
    rs = np.random.RandomState(0)
    tokens = jnp.asarray(rs.randint(0, C.N_AA, (2, C.PAIR_LEN)), jnp.int32)
    chain = jnp.asarray(np.tile([[0, 2]], (2, 1)))
    region = jnp.asarray(T.pair_region_batch(2))
    params = model.init(jax.random.PRNGKey(0), tokens[:1], region[:1],
                        chain[:1])
    tx = schedules.make_optimizer(Namespace({'type': 'Adam', 'lr': 1e-4}),
                                  clip_norm=10.0)
    return model, params, tx, tokens, chain


def test_corruption_stream_is_threefry_golden(tiny_pair):
    """The step's masking stream (semantics-bearing) must stay on threefry
    and keep its exact pre-rbg draws: replicate the step's rng plumbing
    (fold_in(key, step) -> split -> corrupt) and pin the result against
    checksums recorded before the dropout stream moved to rbg. Threefry is
    platform-independent, so these hold on CPU and TPU alike. If this test
    breaks, the training corruption stream changed — that is a semantics
    change, not a perf knob."""
    from hudiff_tpu.ops import masking

    _, _, _, tokens, _ = tiny_pair
    cdr_row = jnp.concatenate([jnp.asarray(C.HEAVY_CDR_INDEX),
                               jnp.asarray(C.LIGHT_CDR_INDEX)])
    protected = masking.pair_protected_mask(tokens, cdr_row)
    rng_mask, _rng_drop = jax.random.split(
        jax.random.fold_in(jax.random.PRNGKey(1), jnp.zeros((), jnp.int32)))
    cor = masking.corrupt(rng_mask, tokens, protected)
    assert int(cor.mask.sum()) == 57
    assert int(cor.src.sum()) == 6127
    np.testing.assert_array_equal(
        np.asarray(cor.mask[0]).astype(int)[:24],
        [0, 0, 1, 0, 0, 1, 1, 1, 0, 1, 1, 0,
         0, 0, 1, 1, 0, 0, 0, 0, 0, 0, 1, 0])


def test_rbg_step_deterministic_per_key(tiny_pair):
    model, params, tx, tokens, chain = tiny_pair
    losses = []
    for _ in range(2):
        state = T.TrainState.create(params, tx)
        step = T.make_pair_train_step(model, donate=False, rbg_dropout=True)
        _, m = step(state, tokens, chain, jax.random.PRNGKey(5))
        losses.append(float(m['loss']))
    assert losses[0] == losses[1]
