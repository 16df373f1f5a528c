"""High-level one-call API (hudiff_tpu/api.py)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from hudiff_tpu import api
from hudiff_tpu import constants as C
from hudiff_tpu.models.denoiser import AntiTFNet, DenoiserConfig
from hudiff_tpu.training import checkpoints as CK

H1 = ('QVQLQQPGAELVKPGASVKLSCKASGYTFTSYWMHWVKQRPGQGLEWIGEINPSNGRTNY'
      'NEKFKSKATLTVDKSSSTAYMQLSSLTSEDSAVYYCARGGYYFDYWGQGTTLTVSS')
L1 = ('DIVMTQSQKFMSTSVGDRVSVTCKASQNVGTNVAWYQQKPGQSPKALIYSASYRYSGVPD'
      'RFTGSGSGTDFTLTISNVQSEDLAEYFCQQYNSYPLTFGAGTKLELK')


@pytest.fixture(scope='module')
def ab_ckpt(tmp_path_factory):
    tmp = tmp_path_factory.mktemp('api_ckpt')
    cfg = DenoiserConfig().test_size()
    model = AntiTFNet(cfg)
    region = jnp.asarray(np.concatenate(
        [C.HEAVY_REGION_INDEX, C.LIGHT_REGION_INDEX])[None])
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, C.PAIR_LEN), jnp.int32), region,
                        jnp.asarray([[0, 2]]))
    path = str(tmp / 'ckpt')
    CK.save(path, 0, params, config={'model': cfg.__dict__})
    return path


def test_humanize_pair(ab_ckpt):
    cands = api.humanize_pair(H1, L1, ab_ckpt, n=2, batch_size=2,
                              use_bf16=False)
    assert len(cands) == 2
    for h, l in cands:
        assert len(h) > 80 and len(l) > 70


def test_humanizer_cache_reused(ab_ckpt):
    before = dict(api._HUMANIZER_CACHE)
    api.humanize_pair(H1, L1, ab_ckpt, n=1, batch_size=2, use_bf16=False)
    assert dict(api._HUMANIZER_CACHE) == before  # same key, no reload


def test_humanize_pair_rejects_garbage(ab_ckpt):
    with pytest.raises(ValueError):
        api.humanize_pair('AAAA', 'GGGG', ab_ckpt, batch_size=2,
                          use_bf16=False)


def test_graft_and_identity():
    h, l = api.graft(H1, L1)
    assert api.germline_identity(h, 'H') == pytest.approx(1.0)
    assert api.germline_identity(H1, 'H') < 0.9
