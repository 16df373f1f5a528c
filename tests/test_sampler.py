import jax
import jax.numpy as jnp
import numpy as np

from hudiff_tpu import constants as C
from hudiff_tpu.models.denoiser import DenoiserConfig, NanoAntiTFNet, nano_config
from hudiff_tpu.sampling import sampler as S


def _tiny_nano():
    cfg = nano_config().test_size()
    model = NanoAntiTFNet(cfg)
    rng = jax.random.PRNGKey(0)
    tokens = jnp.zeros((2, C.HEAVY_LEN), jnp.int32)
    region = jnp.broadcast_to(jnp.asarray(C.HEAVY_REGION_INDEX), (2, C.HEAVY_LEN))
    params = model.init(rng, tokens, region)
    return model, params, region


def test_scan_sampler_fills_all_masked():
    model, params, region = _tiny_nano()
    B = 2
    cdr = np.asarray(C.HEAVY_CDR_INDEX)
    fr_positions = np.nonzero(cdr == 0)[0]

    tokens = np.random.RandomState(0).randint(0, C.N_AA, (B, C.HEAVY_LEN))
    tokens[:, fr_positions] = C.IDX_MSK
    tokens = jnp.asarray(tokens, jnp.int32)

    order = S.build_order(fr_positions, B, rng=jax.random.PRNGKey(1))
    run = S.make_jit_sampler(model, params, has_chain_type=False)
    out = run(tokens, region, order, jax.random.PRNGKey(2))

    out = np.asarray(out)
    assert (out != C.IDX_MSK).all(), "all masked positions resampled"
    # CDR positions untouched
    np.testing.assert_array_equal(out[:, cdr != 0], np.asarray(tokens)[:, cdr != 0])
    # sampled tokens come from the allowed prefix (no <msk>)
    assert out.max() < C.IDX_MSK


def test_order_padding_noop():
    model, params, _ = _tiny_nano()
    tokens = jnp.full((1, C.HEAVY_LEN), 3, jnp.int32)
    region = jnp.broadcast_to(jnp.asarray(C.HEAVY_REGION_INDEX), (1, C.HEAVY_LEN))
    # order entirely -1: nothing should change
    order = jnp.full((1, 7), -1, jnp.int32)
    run = S.make_jit_sampler(model, params, has_chain_type=False)
    out = run(tokens, region, order, jax.random.PRNGKey(0))
    np.testing.assert_array_equal(np.asarray(out), np.asarray(tokens))


def test_scan_matches_sequential_semantics():
    """Scan sampler and reference-style host loop draw identical tokens when
    fed the same per-step RNG stream and order."""
    model, params, _ = _tiny_nano()
    region = jnp.broadcast_to(jnp.asarray(C.HEAVY_REGION_INDEX), (1, C.HEAVY_LEN))
    cdr = np.asarray(C.HEAVY_CDR_INDEX)
    fr = np.nonzero(cdr == 0)[0][:10]  # short order for speed
    tokens = np.random.RandomState(1).randint(0, C.N_AA, (1, C.HEAVY_LEN))
    tokens[:, fr] = C.IDX_MSK
    tokens = jnp.asarray(tokens, jnp.int32)
    order = S.build_order(fr, 1, shuffle=False)

    rng = jax.random.PRNGKey(7)
    run = S.make_jit_sampler(model, params, has_chain_type=False)
    out_scan = run(tokens, region, order, rng)

    # replicate: sequential loop with the same split structure as the scan
    step_rngs = jax.random.split(rng, order.shape[1])
    cur = np.asarray(tokens).copy()
    for k in range(order.shape[1]):
        pos = int(order[0, k])
        logits = model.apply(params, jnp.asarray(cur), region)
        sel = logits[:, pos, :S.SAMPLE_TOP].astype(jnp.float32)
        samp = jax.random.categorical(step_rngs[k], sel)
        cur[:, pos] = np.asarray(samp)
    np.testing.assert_array_equal(np.asarray(out_scan), cur)


def test_build_order_per_candidate_shuffles():
    fr = np.arange(20)
    order = np.asarray(S.build_order(fr, 4, rng=jax.random.PRNGKey(0)))
    assert order.shape == (4, 20)
    for b in range(4):
        assert sorted(order[b]) == list(range(20))
    assert not (order[0] == order[1]).all()


def test_sharded_sampler_matches_unsharded():
    """Data-parallel sampling over an 8-device mesh must produce the exact
    same tokens as single-device (sharding is layout, not semantics)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from hudiff_tpu import constants as C
    from hudiff_tpu.models.denoiser import NanoAntiTFNet, nano_config
    from hudiff_tpu.parallel.mesh import make_mesh
    from hudiff_tpu.sampling import sampler as S

    cfg = nano_config().test_size()
    model = NanoAntiTFNet(cfg)
    B, L = 8, C.HEAVY_LEN
    tokens = jnp.full((B, L), C.IDX_MSK, jnp.int32)
    region = jnp.zeros((B, L), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), tokens[:1], region[:1])
    order = S.build_order(np.arange(0, 40), B, rng=jax.random.PRNGKey(1))
    rng = jax.random.PRNGKey(2)

    run1 = S.make_jit_sampler(model, params, has_chain_type=False)
    out1 = np.asarray(run1(tokens, region, order, rng))

    mesh = make_mesh(model_axis=1)
    assert mesh.shape['data'] == 8
    runN = S.make_jit_sampler(model, params, has_chain_type=False, mesh=mesh)
    outN = np.asarray(runN(tokens, region, order, rng))

    np.testing.assert_array_equal(out1, outN)


def test_multi_position_step_fills_all():
    """k>1 sampling fills every masked slot, keeps CDRs, and never writes
    out-of-set positions (the padded-slot drop path)."""
    model, params, region = _tiny_nano()
    B = 2
    cdr = np.asarray(C.HEAVY_CDR_INDEX)
    fr_positions = np.nonzero(cdr == 0)[0]
    tokens = np.random.RandomState(0).randint(0, C.N_AA, (B, C.HEAVY_LEN))
    tokens[:, fr_positions] = C.IDX_MSK
    tokens = jnp.asarray(tokens, jnp.int32)
    for k in (3, 7):
        order = S.build_order(fr_positions, B, rng=jax.random.PRNGKey(1))
        run = S.make_jit_sampler(model, params, has_chain_type=False,
                                 positions_per_step=k)
        out = np.asarray(run(tokens, region, order, jax.random.PRNGKey(2)))
        assert (out != C.IDX_MSK).all(), k
        np.testing.assert_array_equal(out[:, cdr != 0],
                                      np.asarray(tokens)[:, cdr != 0])
        assert out.max() < C.IDX_MSK


def test_multi_position_step_respects_row_masks():
    """Rows with different position sets: the padded short row must keep its
    unmasked tokens even when packed into k-sized steps (drop-mode scatter
    cannot clobber slot 0 etc.)."""
    model, params, region = _tiny_nano()
    cdr = np.asarray(C.HEAVY_CDR_INDEX)
    fr = np.nonzero(cdr == 0)[0]
    sets = [fr[:11], fr[:4]]  # row 1 has 4 real slots + 7 pads
    tokens = np.random.RandomState(3).randint(0, C.N_AA, (2, C.HEAVY_LEN))
    tokens[0, sets[0]] = C.IDX_MSK
    tokens[1, sets[1]] = C.IDX_MSK
    tokens = jnp.asarray(tokens, jnp.int32)
    order = S.build_order_rows(sets, rng=jax.random.PRNGKey(4), pad_to=11)
    run = S.make_jit_sampler(model, params, has_chain_type=False,
                             positions_per_step=4)
    out = np.asarray(run(tokens, region, order, jax.random.PRNGKey(5)))
    assert (out != C.IDX_MSK).all()
    keep1 = np.ones(C.HEAVY_LEN, bool)
    keep1[sets[1]] = False
    np.testing.assert_array_equal(out[1][keep1], np.asarray(tokens)[1][keep1])


def test_k1_path_unchanged_by_refactor():
    """positions_per_step=1 produces the same tokens as the default call."""
    model, params, region = _tiny_nano()
    cdr = np.asarray(C.HEAVY_CDR_INDEX)
    fr = np.nonzero(cdr == 0)[0][:9]
    tokens = np.random.RandomState(6).randint(0, C.N_AA, (2, C.HEAVY_LEN))
    tokens[:, fr] = C.IDX_MSK
    tokens = jnp.asarray(tokens, jnp.int32)
    order = S.build_order(fr, 2, rng=jax.random.PRNGKey(7))
    r1 = S.make_jit_sampler(model, params, has_chain_type=False)
    r2 = S.make_jit_sampler(model, params, has_chain_type=False,
                            positions_per_step=1)
    o1 = np.asarray(r1(tokens, region, order, jax.random.PRNGKey(8)))
    o2 = np.asarray(r2(tokens, region, order, jax.random.PRNGKey(8)))
    np.testing.assert_array_equal(o1, o2)
