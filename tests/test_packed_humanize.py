"""Packed dataset-scale humanization: rows from many different antibodies
share one device program (PairHumanizer/NanoHumanizer.humanize_many +
sampler.build_order_rows)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from hudiff_tpu import constants as C
from hudiff_tpu.models.denoiser import (AntiTFNet, DenoiserConfig,
                                        NanoAntiTFNet, nano_config)
from hudiff_tpu.sampling import humanize as H
from hudiff_tpu.sampling import sampler as S

VHH1 = ('QVQLVESGGGLVQAGGSLRLSCAASGRTFSSYAMGWFRQAPGKEREFVAAISWSGGSTYY'
        'ADSVKGRFTISRDNAKNTVYLQMNSLKPEDTAVYYCAADRGSSYYYDYWGQGTQVTVSS')
VHH2 = ('EVQLVESGGGLVQPGGSLRLSCAASGFTFSSYAMSWVRQAPGKGLEWVSAISGSGGSTYY'
        'ADSVKGRFTISRDNSKNTLYLQMNSLRAEDTAVYYCAKDPRGYGAYWGQGTLVTVSS')
H1 = ('QVQLQQPGAELVKPGASVKLSCKASGYTFTSYWMHWVKQRPGQGLEWIGEINPSNGRTNY'
      'NEKFKSKATLTVDKSSSTAYMQLSSLTSEDSAVYYCARGGYYFDYWGQGTTLTVSS')
L1 = ('DIVMTQSQKFMSTSVGDRVSVTCKASQNVGTNVAWYQQKPGQSPKALIYSASYRYSGVPD'
      'RFTGSGSGTDFTLTISNVQSEDLAEYFCQQYNSYPLTFGAGTKLELK')
H2 = ('EVQLVESGGGLVQPGGSLRLSCAASGFTFSSYAMSWVRQAPGKGLEWVSAISGSGGSTYY'
      'ADSVKGRFTISRDNSKNTLYLQMNSLRAEDTAVYYCAKDRGYYFDYWGQGTLVTVSS')
L2 = ('EIVLTQSPGTLSLSPGERATLSCRASQSVSSSYLAWYQQKPGQAPRLLIYGASSRATGIP'
      'DRFSGSGSGTDFTLTISRLEPEDFAVYYCQQYGSSPLTFGGGTKVEIK')


def test_build_order_rows_per_row_positions():
    sets = [np.array([3, 7, 11]), np.array([1, 2]), np.array([5])]
    order = np.asarray(S.build_order_rows(sets, rng=jax.random.PRNGKey(0),
                                          pad_to=4))
    assert order.shape == (3, 4)
    for row, pos in zip(order, sets):
        got = sorted(int(v) for v in row if v >= 0)
        assert got == sorted(int(v) for v in pos)
        assert (row[len(pos):] == -1).all()


def test_build_order_rows_no_shuffle():
    sets = [np.array([9, 4, 2])]
    order = np.asarray(S.build_order_rows(sets, shuffle=False, pad_to=3))
    np.testing.assert_array_equal(order[0], [9, 4, 2])


@pytest.fixture(scope='module')
def pair_hum():
    cfg = DenoiserConfig().test_size()
    model = AntiTFNet(cfg)
    tokens = jnp.zeros((1, C.PAIR_LEN), jnp.int32)
    region = jnp.asarray(np.concatenate(
        [C.HEAVY_REGION_INDEX, C.LIGHT_REGION_INDEX])[None])
    chain = jnp.asarray([[0, 2]])
    params = model.init(jax.random.PRNGKey(0), tokens, region, chain)
    return H.PairHumanizer(model, params, batch_size=2, seed=7,
                           device_batch=5)


def test_packed_pair_humanize_many(pair_hum):
    """Two different antibodies, 2 candidate rows each, device batch 5:
    rows pack across antibodies and the final short chunk is padded."""
    inputs = [H.pair_input(H1, L1), H.pair_input(H2, L2), None]
    results = pair_hum.humanize_many(inputs, rows_per_input=2)
    assert results[2] is None
    for inp, res in zip(inputs[:2], results[:2]):
        assert res is not None and len(res['h_seqs']) == 2
        grids = res['grids']
        # every masked slot filled, no <msk> left
        assert (grids != C.IDX_MSK).all()
        # CDRs (and everything unmasked) preserved per antibody
        cdr = np.concatenate([C.HEAVY_CDR_INDEX, C.LIGHT_CDR_INDEX]) != 0
        np.testing.assert_array_equal(
            grids[:, cdr], np.broadcast_to(inp['clean'][cdr], (2, cdr.sum())))
        assert 0 <= res['best_idx'] < 2


def test_packed_matches_input_masks(pair_hum):
    """Row packing must resample exactly each row's own positions: an
    antibody's unmasked framework residues survive even when its neighbor in
    the batch has those slots masked."""
    a = H.pair_input(H1, L1, finetune=True)   # finetune mask: fewer slots
    b = H.pair_input(H2, L2, finetune=False)  # pretrain mask: all FR slots
    res = pair_hum.humanize_many([a, b], rows_per_input=1)
    keep_a = a['tokens'] != C.IDX_MSK
    np.testing.assert_array_equal(res[0]['grids'][0][keep_a],
                                  a['tokens'][keep_a])
    keep_b = b['tokens'] != C.IDX_MSK
    np.testing.assert_array_equal(res[1]['grids'][0][keep_b],
                                  b['tokens'][keep_b])


def test_packed_nano_humanize_many():
    cfg = nano_config().test_size()
    model = NanoAntiTFNet(cfg)
    tokens = jnp.zeros((1, C.HEAVY_LEN), jnp.int32)
    region = jnp.asarray(C.HEAVY_REGION_INDEX)[None]
    params = model.init(jax.random.PRNGKey(0), tokens, region)
    hum = H.NanoHumanizer(model, params, batch_size=2, seed=3,
                          device_batch=3)
    inputs = [H.nano_input(VHH1), H.nano_input(VHH2)]
    results = hum.humanize_many(inputs, rows_per_input=2)
    got = [r for r in results if r is not None]
    # tiny random model output may fail the validity realignment filter;
    # the packing contract is: present results are well-formed
    for res in got:
        assert len(res['seqs']) >= 1
        assert (res['grids'] != C.IDX_MSK).all()


@pytest.mark.slow
def test_packed_cli_pair(tmp_path):
    """End-to-end packed CSV run through the CLI driver with a tiny model."""
    import pandas as pd
    from hudiff_tpu.training import checkpoints as CK
    cfg = DenoiserConfig().test_size()
    model = AntiTFNet(cfg)
    tokens = jnp.zeros((1, C.PAIR_LEN), jnp.int32)
    region = jnp.asarray(np.concatenate(
        [C.HEAVY_REGION_INDEX, C.LIGHT_REGION_INDEX])[None])
    chain = jnp.asarray([[0, 2]])
    params = model.init(jax.random.PRNGKey(0), tokens, region, chain)
    ckpt_dir = str(tmp_path / 'ckpt')
    CK.save(ckpt_dir, 0, params, config={'model': cfg.__dict__})
    csv = tmp_path / 'mice.csv'
    pd.DataFrame({'name': ['abA', 'abB'], 'type': ['mouse', 'mouse'],
                  'h_seq': [H1, H2], 'l_seq': [L1, L2]}).to_csv(csv,
                                                                index=False)
    out = H.main(['ab', '--ckpt', ckpt_dir, '--data-fpath', str(csv),
                  '--batch-size', '2', '--pack-size', '4', '--fp32',
                  '--logdir', str(tmp_path / 'logs'), '--ckpt-version',
                  'pretrain'])
    df = pd.read_csv(out)
    hum_rows = df[df['Specific'] == 'humanization']
    assert set(hum_rows['name']) == {'abAhuman_sample', 'abBhuman_sample'}


def test_collect_unique_semantics():
    from hudiff_tpu.sampling.humanize import collect_unique
    calls = []

    def fn_ok():
        calls.append(1)
        return ['a', 'b', 'a']

    unique, failed = collect_unique(fn_ok, target=3, max_retry=4)
    assert not failed
    assert unique == ['a', 'b'] or len(unique) == 2  # only 2 distinct exist
    assert len(calls) == 4  # kept retrying to the cap

    fail_calls = []

    def fn_fail():
        fail_calls.append(1)
        return None

    unique, failed = collect_unique(fn_fail, target=1, max_retry=5)
    assert failed and unique == []
    assert len(fail_calls) == 5  # every retry round spent, none aborted early

    # a None round is stochastic (nano validity filter), NOT terminal: the
    # loop must keep retrying and can still reach the target afterwards —
    # same semantics as the packed loops' continue-on-None
    seq = iter([None, ['x'], None, ['y'], ['z']])
    unique, failed = collect_unique(lambda: next(seq), target=2, max_retry=5)
    assert unique == ['x', 'y']
    assert failed  # at least one round failed (callers gate on `and not unique`)

    seq = iter([['x'], None, None, None, None])
    unique, failed = collect_unique(lambda: next(seq), target=2, max_retry=5)
    assert failed and unique == ['x']  # partial results preserved

    unique, failed = collect_unique(lambda: ['p', 'q'], target=2, max_retry=9)
    assert not failed and unique == ['p', 'q']


def test_bucket_order_width():
    from hudiff_tpu.sampling.humanize import _bucket_order_width
    assert _bucket_order_width(55, 185) == 64
    assert _bucket_order_width(64, 185) == 64
    assert _bucket_order_width(65, 185) == 96
    assert _bucket_order_width(185, 185) == 185
    assert _bucket_order_width(300, 185) == 185  # capped at mode max
    assert _bucket_order_width(0, 185) == 32
    assert _bucket_order_width(1, 20) == 20      # cap below one bucket


def test_inpaint_uses_short_scan(pair_hum, monkeypatch):
    """Inpaint masks far fewer slots than the FR cap; the humanizer must
    build a bucketed (short) order, not the 185-wide mode maximum."""
    widths = []
    orig = S.build_order

    def spy(pos, batch, rng=None, shuffle=True, pad_to=None):
        widths.append(pad_to)
        return orig(pos, batch, rng=rng, shuffle=shuffle, pad_to=pad_to)

    monkeypatch.setattr(S, 'build_order', spy)
    res = pair_hum(H1, L1, inpaint=True)
    assert res is not None
    n_pos = len(H.pair_inpaint_input(H1, L1)['positions'])
    assert widths[-1] < 185
    assert widths[-1] >= n_pos
    assert widths[-1] % 32 == 0 or widths[-1] == 185
    # all masked slots still resampled
    assert (res['grids'] != C.IDX_MSK).all()


def test_positions_per_step_cdr_invariance():
    """--positions-per-step k (within-step independence, ~k x fewer
    forwards) must never touch protected slots: CDRs and unmasked framework
    residues are bit-identical to the parental at every k. Measured quality
    drift of the dial (tiny model trained on the HuAb348 humanized pairs,
    8 mice, fixed seeds; tools/pps_quality.py) is documented in
    COMPONENTS.md: preservation/germline-identity deltas vs the exact k=1
    semantics stay within a few percent through k=8."""
    cfg = DenoiserConfig().test_size()
    model = AntiTFNet(cfg)
    tokens = jnp.zeros((1, C.PAIR_LEN), jnp.int32)
    region = jnp.asarray(np.concatenate(
        [C.HEAVY_REGION_INDEX, C.LIGHT_REGION_INDEX])[None])
    params = model.init(jax.random.PRNGKey(0), tokens, region,
                        jnp.asarray([[0, 2]]))
    inp = H.pair_input(H1, L1)
    prot = inp['tokens'] != C.IDX_MSK  # CDRs + any unmasked slots
    for k in (1, 4):
        hum = H.PairHumanizer(model, params, batch_size=2, seed=11,
                              positions_per_step=k)
        res = hum(H1, L1)
        assert res is not None
        grids = res['grids']
        assert (grids != C.IDX_MSK).all()
        np.testing.assert_array_equal(
            grids[:, prot],
            np.broadcast_to(inp['clean'][prot], (2, int(prot.sum()))))


def test_nano_input_rejects_light_chain():
    """A kappa light chain aligns well (score >> MIN_CHAIN_SCORE) but must be
    rejected as nanobody input — the chain_hint='VHH' grid placement bypasses
    grid_string's heavy gate, so nano_input itself must type-check."""
    assert H.nano_input(L1) is None
    assert H.nano_input(VHH1) is not None


def test_nano_input_non_string():
    """NaN cells from a pandas CSV (float) must be rejected, not crash."""
    assert H.nano_input(float('nan')) is None
    assert H.nano_input('') is None


def test_is_heavy_type():
    assert H._is_heavy_type(VHH1)
    assert H._is_heavy_type(H1)
    assert not H._is_heavy_type(L1)
    assert not H._is_heavy_type(float('nan'))
    assert not H._is_heavy_type('QQQQ')  # fragment below the score floor


def test_build_order_delegates_to_rows():
    """build_order(pos, B) must equal build_order_rows([pos]*B) bit-for-bit
    (one RNG-seeding implementation, finding: duplicated entropy logic)."""
    pos = np.arange(5, 25, dtype=np.int32)
    rng = jax.random.PRNGKey(11)
    a = np.asarray(S.build_order(pos, 3, rng=rng, pad_to=24))
    b = np.asarray(S.build_order_rows([pos] * 3, rng=rng, pad_to=24))
    assert (a == b).all()
    c = np.asarray(S.build_order(pos, 2, shuffle=False))
    assert (c == pos[None, :]).all()


def test_bucket_batch():
    """Packed streams right-size the device program: a 4-row stream must not
    pad to a 256-row program (measured: a 2-antibody CLI run went from
    >20 min to 30 s on CPU), while large streams still cap at device_batch
    and sizes stay power-of-two bucketed (bounded recompiles)."""
    assert H._bucket_batch(1, 256) == 1
    assert H._bucket_batch(4, 256) == 4
    assert H._bucket_batch(5, 256) == 8
    assert H._bucket_batch(300, 256) == 256
    assert H._bucket_batch(0, 256) == 1
    assert H._bucket_batch(9, 8) == 8


def test_packed_batch_reuse_policy():
    """Retry waves must reuse the largest already-compiled batch program
    instead of compiling a smaller one per shrinking survivor set (a fresh
    compile costs minutes on a tunneled backend; a padded round seconds) —
    while a small FIRST sweep still gets a right-sized program."""
    class Spy:
        device_batch = 256

        def __init__(self):
            self.batches = []

        def sample_rows(self, rows, pad_to, batch=None):
            self.batches.append(batch)
            return np.zeros((len(rows), 4), np.int32)

    spy = Spy()
    stream = [(i, {'x': 1}) for i in range(40)]
    list(H.iter_packed_chunks(spy, stream, 8))      # first wave: bucket 64
    list(H.iter_packed_chunks(spy, stream[:3], 8))  # survivors: reuse 64
    assert spy.batches[0] == 64
    assert spy.batches[-1] == 64  # no new smaller compile
    spy2 = Spy()
    list(H.iter_packed_chunks(spy2, stream[:3], 8))  # small first sweep
    assert spy2.batches[0] == 4   # right-sized, not 256


def test_packed_batch_policy_failure_and_pad_to():
    """A failing round must NOT register its bucket (the reuse policy would
    otherwise steer every later stream onto the failing size forever), and
    a bucket compiled at a different pad_to is not 'warm' for this one."""
    class Boom(Exception):
        pass

    class Spy:
        device_batch = 256

        def __init__(self, fail_first=False):
            self.fail_first = fail_first
            self.batches = []

        def sample_rows(self, rows, pad_to, batch=None):
            if self.fail_first:
                self.fail_first = False
                raise Boom()
            self.batches.append((batch, pad_to))
            return np.zeros((len(rows), 4), np.int32)

    spy = Spy(fail_first=True)
    stream = [(i, {'x': 1}) for i in range(40)]
    try:
        list(H.iter_packed_chunks(spy, stream, 8))
    except Boom:
        pass
    assert not getattr(spy, '_compiled_batches')  # failure not registered
    list(H.iter_packed_chunks(spy, stream[:3], 8))
    assert spy.batches[-1] == (4, 8)  # right-sized, not the failed 64

    spy2 = Spy()
    list(H.iter_packed_chunks(spy2, stream, 8))       # (64, 8) compiled
    list(H.iter_packed_chunks(spy2, stream[:3], 16))  # other pad_to
    assert spy2.batches[-1] == (4, 16)  # no cross-pad_to reuse
    assert list(H.iter_packed_chunks(spy2, [], 8)) == []  # empty stream


def test_pair_input_rejects_swapped_heavy_in_light_slot():
    """A TRUE heavy chain in the light slot (swapped inputs) is rejected,
    while borderline light chains still proceed via classify_light."""
    assert H.pair_input(H1, H1) is None   # heavy in the light slot
    assert H.pair_input(H1, L1) is not None
    assert H.pair_input(123, L1) is None  # non-string stays rejected


def test_pair_input_rejects_light_in_heavy_slot():
    """Symmetric swap gate: a TRUE light chain in the heavy slot is
    rejected (HuAb348-calibrated margin: real light chains score >100
    points below H on the heavy profile)."""
    assert H.pair_input(L1, L1) is None
