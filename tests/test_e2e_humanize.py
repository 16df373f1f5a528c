"""End-to-end CPU humanization tests on the reference's shipped fixtures
(SURVEY.md §4: 7k9i.fasta + abnativ_select_vhh.csv), with tiny random models."""
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

pytestmark = pytest.mark.slow  # multi-minute integration runs

from hudiff_tpu import constants as C
from hudiff_tpu.models.denoiser import (AntiTFNet, DenoiserConfig,
                                        NanoAntiTFNet, nano_config)
from hudiff_tpu.sampling import humanize as H

REF_DATA = '/root/reference/data'


@pytest.fixture(scope='module')
def tiny_pair_model():
    cfg = DenoiserConfig().test_size()
    model = AntiTFNet(cfg)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, C.PAIR_LEN), jnp.int32),
                        jnp.zeros((1, C.PAIR_LEN), jnp.int32),
                        jnp.zeros((1, 2), jnp.int32))
    return model, params


@pytest.mark.skipif(not os.path.isdir(REF_DATA), reason='fixtures not mounted')
def test_humanize_pair_from_fasta(tiny_pair_model):
    from hudiff_tpu.eval.biophi import pair_from_fasta
    h_seq, l_seq = pair_from_fasta(os.path.join(REF_DATA, 'fasta_file/7k9i.fasta'))
    # 2B04 is a mouse antibody: both chains must be extracted, antigen skipped
    assert len(h_seq) > 100 and len(l_seq) > 100

    model, params = tiny_pair_model
    hum = H.PairHumanizer(model, params, batch_size=2)
    res = hum(h_seq, l_seq)
    assert res is not None
    assert len(res['h_seqs']) == 2
    # CDR loops preserved in every candidate
    inp = H.pair_input(h_seq, l_seq)
    cdr = np.concatenate([C.HEAVY_CDR_INDEX, C.LIGHT_CDR_INDEX]) != 0
    for grid in res['grids']:
        np.testing.assert_array_equal(grid[cdr], inp['clean'][cdr])
    # no mask tokens remain
    assert (res['grids'] != C.IDX_MSK).all()


@pytest.mark.skipif(not os.path.isdir(REF_DATA), reason='fixtures not mounted')
def test_humanize_vhh_from_csv():
    import pandas as pd
    df = pd.read_csv(os.path.join(REF_DATA,
                                  'nanobody_eval_data/abnativ_select_vhh.csv'))
    seq = df.iloc[0]['vhhseq']

    cfg = nano_config().test_size()
    model = NanoAntiTFNet(cfg)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, C.HEAVY_LEN), jnp.int32),
                        jnp.zeros((1, C.HEAVY_LEN), jnp.int32))
    hum = H.NanoHumanizer(model, params, batch_size=2)
    res = hum(seq)
    assert res is not None and len(res['seqs']) == 2
    inp = H.nano_input(seq)
    cdr = np.asarray(C.HEAVY_CDR_INDEX) != 0
    for grid in res['grids']:
        np.testing.assert_array_equal(grid[cdr], inp['clean'][cdr])
    # best candidate is the most parental-similar one
    assert res['best'] in res['seqs']
