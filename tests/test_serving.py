"""HTTP serving layer: warm samplers behind a JSON API (hudiff_tpu/serving)."""
import json
import threading
import urllib.request

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from hudiff_tpu import constants as C
from hudiff_tpu import serving as SV
from hudiff_tpu.models.denoiser import AntiTFNet, DenoiserConfig
from hudiff_tpu.training import checkpoints as CK

H1 = ('QVQLQQPGAELVKPGASVKLSCKASGYTFTSYWMHWVKQRPGQGLEWIGEINPSNGRTNY'
      'NEKFKSKATLTVDKSSSTAYMQLSSLTSEDSAVYYCARGGYYFDYWGQGTTLTVSS')
L1 = ('DIVMTQSQKFMSTSVGDRVSVTCKASQNVGTNVAWYQQKPGQSPKALIYSASYRYSGVPD'
      'RFTGSGSGTDFTLTISNVQSEDLAEYFCQQYNSYPLTFGAGTKLELK')


@pytest.fixture(scope='module')
def server(tmp_path_factory):
    tmp = tmp_path_factory.mktemp('serve')
    cfg = DenoiserConfig().test_size()
    model = AntiTFNet(cfg)
    region = jnp.asarray(np.concatenate(
        [C.HEAVY_REGION_INDEX, C.LIGHT_REGION_INDEX])[None])
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, C.PAIR_LEN), jnp.int32), region,
                        jnp.asarray([[0, 2]]))
    CK.save(str(tmp / 'ckpt'), 0, params, config={'model': cfg.__dict__})
    service = SV.HumanizationService(ab_ckpt=str(tmp / 'ckpt'),
                                     batch_size=2, use_bf16=False,
                                     warmup=True)
    srv = SV.serve(service, port=0)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f'http://127.0.0.1:{srv.server_address[1]}'
    srv.shutdown()


def _post(url, payload):
    req = urllib.request.Request(url, json.dumps(payload).encode(),
                                 {'Content-Type': 'application/json'})
    try:
        with urllib.request.urlopen(req, timeout=120) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def test_health(server):
    with urllib.request.urlopen(server + '/health', timeout=30) as r:
        out = json.loads(r.read())
    assert out['status'] == 'ok'
    assert out['models'] == ['ab']


def test_humanize_ab(server):
    code, out = _post(server + '/humanize/ab',
                      {'h_seq': H1, 'l_seq': L1, 'sample_number': 2})
    assert code == 200
    assert len(out['candidates']) == 2
    for c in out['candidates']:
        assert set(c) == {'h_seq', 'l_seq'}
        assert len(c['h_seq']) > 80


def test_graft_endpoint(server):
    code, out = _post(server + '/graft',
                      {'h_seq': H1, 'l_seq': L1, 'back_mutation': True})
    assert code == 200
    from hudiff_tpu.numbering import germline as G
    assert out['h_seq'] == G.cdr_pair_grafting(H1, L1,
                                               back_mutation=True)[0]


def test_missing_field_400(server):
    code, out = _post(server + '/humanize/ab', {'h_seq': H1})
    assert code == 400 and 'missing field' in out['error']


def test_non_dict_body_400(server):
    """A valid-JSON non-object body must get a 400, not a dropped socket."""
    for payload in ([1, 2], 'a string'):
        code, out = _post(server + '/humanize/ab', payload)
        assert code == 400 and 'object' in out['error']


def test_unaligned_422(server):
    code, out = _post(server + '/humanize/ab',
                      {'h_seq': 'AAAA', 'l_seq': 'GGGG'})
    assert code == 422


def test_no_nano_model_422(server):
    code, out = _post(server + '/humanize/nano', {'vhh_seq': H1})
    assert code == 422 and 'no nanobody checkpoint' in out['error']


def test_unknown_path_404(server):
    code, out = _post(server + '/frobnicate', {})
    assert code == 404


def test_concurrent_requests(server):
    """Device access serializes behind the lock; concurrent requests all
    complete and return well-formed candidates."""
    results = []

    def call():
        results.append(_post(server + '/humanize/ab',
                             {'h_seq': H1, 'l_seq': L1}))

    threads = [threading.Thread(target=call) for _ in range(3)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert len(results) == 3
    assert all(code == 200 and len(out['candidates']) == 1
               for code, out in results)
