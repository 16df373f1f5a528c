import jax
import jax.numpy as jnp
import numpy as np

from hudiff_tpu import constants as C
from hudiff_tpu.ops import losses, masking


def test_corrupt_invariants():
    rng = jax.random.PRNGKey(0)
    B = 64
    tokens = jax.random.randint(rng, (B, C.PAIR_LEN), 0, C.N_AA)
    cdr = jnp.concatenate([jnp.asarray(C.HEAVY_CDR_INDEX),
                           jnp.asarray(C.LIGHT_CDR_INDEX)])
    protected = masking.pair_protected_mask(tokens, cdr)
    out = masking.corrupt(jax.random.PRNGKey(1), tokens, protected)

    src, mask, n = np.asarray(out.src), np.asarray(out.mask), np.asarray(out.num_masked)
    # CDRs never masked
    assert not (mask & np.asarray(protected)).any()
    # masked positions carry the <msk> token, others unchanged
    assert (src[mask] == C.IDX_MSK).all()
    assert (src[~mask] == np.asarray(tokens)[~mask]).all()
    # realized counts match the mask
    np.testing.assert_array_equal(n, mask.sum(-1))
    assert (n >= 1).all()  # num_mask >= 2 pre-protection; FRs dominate


def test_corrupt_window():
    rng = jax.random.PRNGKey(0)
    tokens = jnp.zeros((8, C.HEAVY_LEN), jnp.int32)
    protected = jnp.zeros_like(tokens, dtype=bool)
    out = masking.corrupt(rng, tokens, protected, window=150)
    mask = np.asarray(out.mask)
    assert not mask[:, 150:].any()  # camel window: tail never masked


def test_mask_count_distribution():
    # num_mask = D - t + 1 with t ~ U{1, D-1}: support [2, D]
    counts = masking.sample_mask_counts(jax.random.PRNGKey(3), 10000, 291)
    c = np.asarray(counts)
    assert c.min() >= 2 and c.max() <= 291
    assert abs(c.mean() - (291 + 2) / 2) < 3


def test_pair_loss_hand_computed():
    # 1 sample, 4 positions, 3 tokens: verify the Hoogeboom reweighting math
    logits = jnp.log(jnp.asarray([[[0.7, 0.2, 0.1],
                                   [0.1, 0.8, 0.1],
                                   [0.25, 0.25, 0.5],
                                   [0.9, 0.05, 0.05]]]))
    targets = jnp.asarray([[0, 1, 2, 0]])
    mask = jnp.asarray([[True, True, False, False]])
    cdr = jnp.asarray([[False, False, True, False]])
    out = losses.pair_oardm_loss(logits, targets, mask, cdr)
    ce0, ce1 = -np.log(0.7), -np.log(0.8)
    t = 2.0
    expected_ce = np.mean([4 / t * ce0, 4 / t * ce1])
    np.testing.assert_allclose(float(out['ce']), expected_ce, rtol=1e-3)
    np.testing.assert_allclose(float(out['nll']), np.mean([ce0, ce1]), rtol=1e-3)
    np.testing.assert_allclose(float(out['cdr_ce']), -np.log(0.5), rtol=1e-3)
    assert float(out['accuracy']) == 1.0


def test_split_loss_weights():
    B, V = 4, C.N_TOKENS
    rng = jax.random.PRNGKey(0)
    logits = jax.random.normal(rng, (B, C.PAIR_LEN, V))
    targets = jax.random.randint(rng, (B, C.PAIR_LEN), 0, V)
    mask = jax.random.bernoulli(jax.random.PRNGKey(1), 0.3, (B, C.PAIR_LEN))
    cdr = jax.random.bernoulli(jax.random.PRNGKey(2), 0.2, (B, C.PAIR_LEN))
    out1 = losses.pair_oardm_split_loss(logits, targets, mask, cdr, l_weight=1.0)
    out3 = losses.pair_oardm_split_loss(logits, targets, mask, cdr, l_weight=3.0)
    np.testing.assert_allclose(float(out3['l_ce']), 3 * float(out1['l_ce']), rtol=1e-6)
    np.testing.assert_allclose(float(out3['h_ce']), float(out1['h_ce']), rtol=1e-6)


def test_empty_mask_is_safe():
    logits = jnp.zeros((2, 10, 5))
    targets = jnp.zeros((2, 10), jnp.int32)
    mask = jnp.zeros((2, 10), bool)
    out = losses.pair_oardm_loss(logits, targets, mask, mask)
    assert np.isfinite(float(out['ce']))


def test_cosine_scheduler():
    from hudiff_tpu.training.schedules import make_host_scheduler
    import math

    class Cfg(dict):
        def get(self, k, d=None):
            return super().get(k, d)

    s = make_host_scheduler(Cfg(type='cosine', T_max=10, eta_min=0.1), 1.0)
    lrs = [s.update(0.0) for _ in range(10)]
    assert abs(lrs[-1] - 0.1) < 1e-9          # annealed to eta_min at T_max
    expected5 = 0.1 + 0.9 * (1 + math.cos(math.pi * 5 / 10)) / 2
    assert abs(lrs[4] - expected5) < 1e-9
    assert all(a > b for a, b in zip(lrs, lrs[1:]))  # monotone decay

    p = make_host_scheduler(Cfg(type='plateau', factor=0.5, patience=0,
                                min_lr=0.01), 1.0)
    p.update(1.0)
    assert p.update(2.0) == 0.5               # worse loss -> immediate decay
