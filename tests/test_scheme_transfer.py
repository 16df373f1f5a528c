import jax
import jax.numpy as jnp
import numpy as np

from hudiff_tpu import constants as C
from hudiff_tpu.ops import scheme_transfer as ST


def _consistent_nano_batch(B=3, seed=0):
    """Random grids where the IMGT main region and AHo main region carry the
    same residues in order (the invariant real data satisfies)."""
    rs = np.random.RandomState(seed)
    imgt = np.full((B, C.HEAVY_LEN), C.IDX_PAD, np.int64)
    aho_idx = np.full((B, C.AHO_LEN), C.ABNATIV_GAP_IDX, np.int64)
    for b in range(B):
        n = rs.randint(100, 130)
        res = rs.randint(0, 20, n)
        imgt[b, np.sort(rs.choice(150, n, replace=False))] = res
        imgt[b, 150:] = rs.randint(0, 20, 2)
        aho_idx[b, np.sort(rs.choice(147, n, replace=False))] = res
        aho_idx[b, 147:] = imgt[b, 150:]
    onehot = np.zeros((B, C.AHO_LEN, 21), np.float32)
    for b in range(B):
        onehot[b, np.arange(C.AHO_LEN), aho_idx[b]] = 1.0
    return jnp.asarray(imgt), jnp.asarray(onehot)


def test_counts_match_nano():
    imgt, aho = _consistent_nano_batch()
    assert bool(ST.counts_match(imgt, aho, pair=False).all())


def test_transfer_moves_residues_in_order():
    imgt, aho = _consistent_nano_batch(B=2, seed=1)
    tmap = ST.build_transfer_map(imgt, aho, ST.NANO_IMGT_CAND,
                                 ST.NANO_AHO_CAND, C.IDX_X)
    imgt_oh = ST.imgt_grid_onehot(imgt)
    out = ST.apply_transfer(imgt_oh, aho, tmap)
    # transferring the ORIGINAL grid must reproduce the original AHo one-hot
    # on all main (non-tail) columns
    np.testing.assert_allclose(np.asarray(out[:, :147]),
                               np.asarray(aho[:, :147]), atol=0)


def test_transfer_carries_infilled_values():
    imgt, aho = _consistent_nano_batch(B=2, seed=2)
    # replace one framework residue with a distinct token, transfer, and
    # check exactly one AHo column changed to that token's channel
    b, slot = 0, None
    row = np.asarray(imgt[b])
    for s in range(150):
        if row[s] < 20:
            slot = s
            break
    new_tok = (row[slot] + 1) % 20
    imgt2 = imgt.at[b, slot].set(new_tok)
    tmap = ST.build_transfer_map(imgt, aho, ST.NANO_IMGT_CAND,
                                 ST.NANO_AHO_CAND, C.IDX_X)
    out = ST.apply_transfer(ST.imgt_grid_onehot(imgt2), aho, tmap)
    diff = np.abs(np.asarray(out) - np.asarray(aho)).sum(axis=-1)
    changed = np.nonzero(diff[b])[0]
    assert len(changed) == 1
    assert np.argmax(np.asarray(out)[b, changed[0]]) == new_tok


def test_transfer_mask_projection():
    imgt, aho = _consistent_nano_batch(B=2, seed=3)
    mask = (imgt < 20) & (jnp.arange(C.HEAVY_LEN) < 150)
    tmap = ST.build_transfer_map(imgt, aho, ST.NANO_IMGT_CAND,
                                 ST.NANO_AHO_CAND, C.IDX_X)
    pmask = ST.transfer_mask(mask, tmap)
    # every masked residue lands somewhere; counts preserved
    assert int(pmask.sum()) == int(mask[:, :150].sum())


def test_gumbel_straight_through():
    rng = jax.random.PRNGKey(0)
    logits = jnp.asarray(np.random.RandomState(0).randn(4, 7, 20))
    st = ST.gumbel_straight_through(rng, logits)
    out = np.asarray(st)
    # forward: exact one-hot
    np.testing.assert_allclose(out.sum(-1), 1.0, rtol=1e-5)
    assert ((out.max(-1) > 0.99) | (out.max(-1) < 1.01)).all()

    # backward: gradient equals the softmax gradient
    def f(l):
        return (ST.gumbel_straight_through(rng, l) * 2.0).sum()

    g = jax.grad(f)(logits)
    assert bool(jnp.isfinite(g).all())
