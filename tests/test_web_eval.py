"""Protocol tests for the web evaluators against canned responses.

The reference scrapers (evaluation/T20_eval.py, Zscore_eval.py,
humab_eval.py) define exact URLs, parameters and response formats; these
tests pin our implementations to those protocols without needing egress.
"""
import pytest

import hudiff_tpu.eval.web as web

VH = ('QVQLKQSGPGLVAPSQSLSITCTVSGFSLINYAISWVRQPPGKGLEWLGVIWTGGGTNYNSALKSRLSI'
      'SKDNSKSQVFLKMNSLQTDDTARYYCARKDYYGRYYGMDYWGQGTSVTVS')

T20_HTML = ('<html><body><table><tr><td>T20 Score:</td><td>82.51</td></tr>'
            '</table></body></html>')
ZSCORE_HTML = ('<html><h3>The Z-score value of the Query sequence is: '
               '-0.417</h3></html>')
HUMAB_HTML = """
<html><body>
<table class="table table-results">
  <tr><th>V Gene</th><th>Score</th><th>Threshold</th><th>Class</th></tr>
  <tr><td>hv1</td><td>0.42</td><td>0.85</td><td>MOUSE</td></tr>
  <tr><td>hv3</td><td>0.91</td><td>0.85</td><td>HUMAN</td></tr>
</table>
<table class="table table-results">
  <tr><td>kv1</td><td>0.88</td><td>0.80</td><td>HUMAN</td></tr>
</table>
<table class="table table-results">
  <tr><td>ignored third table</td><td>HUMAN</td></tr>
</table>
</body></html>
"""


@pytest.fixture
def no_sleep(monkeypatch):
    sleeps = []
    monkeypatch.setattr(web, 'SLEEP', sleeps.append)
    return sleeps


def _fake_fetch(monkeypatch, responder):
    calls = []

    def fetch(url, method='get', data=None, timeout=60.0):
        calls.append({'url': url, 'method': method, 'data': data})
        return responder(url, method, data)

    monkeypatch.setattr(web, 'FETCH', fetch)
    return calls


# ---------------------------------------------------------------------------
# T20
# ---------------------------------------------------------------------------

def test_t20_url_params_and_regex(monkeypatch, no_sleep):
    calls = _fake_fetch(monkeypatch,
                        lambda u, m, d: web.Response(True, T20_HTML, u))
    monkeypatch.setattr(web, '_chain_type', lambda s: 'K')
    score, chain_type = web.get_t20_online('PEPTIDESEQ', region=1)
    assert score == 82.51
    assert chain_type == 'vk'
    # exact reference URL (T20_eval.py:24)
    assert calls[0]['url'] == ('https://sam.curiaglobal.com/t20/cgi-bin/'
                               'blast.py?chain=vk&region=1&output=3'
                               '&seqs=PEPTIDESEQ')
    assert calls[0]['method'] == 'get'


def test_t20_region2_forces_vh(monkeypatch, no_sleep):
    calls = _fake_fetch(monkeypatch,
                        lambda u, m, d: web.Response(True, T20_HTML, u))
    score, chain_type = web.get_t20_online('PEPTIDESEQ', region=2)
    assert chain_type == 'vh'
    assert 'chain=vh&region=2' in calls[0]['url']


def test_t20_retries_then_succeeds(monkeypatch, no_sleep):
    n = {'i': 0}

    def responder(u, m, d):
        n['i'] += 1
        if n['i'] < 3:
            return web.Response(False, 'server busy', u, 503)
        return web.Response(True, T20_HTML, u)

    calls = _fake_fetch(monkeypatch, responder)
    monkeypatch.setattr(web, '_chain_type', lambda s: 'H')
    score, chain_type = web.get_t20_online('SEQ')
    assert score == 82.51 and chain_type == 'vh'
    assert len(calls) == 3
    # backoff schedule 0.5 + retry*5 (T20_eval.py:34)
    assert no_sleep[:2] == [0.5, 5.5]


def test_t20_unparseable_returns_none(monkeypatch, no_sleep):
    _fake_fetch(monkeypatch,
                lambda u, m, d: web.Response(True, '<html>error</html>', u))
    monkeypatch.setattr(web, '_chain_type', lambda s: 'H')
    assert web.get_t20_online('SEQ') == (None, None)


def test_t20_csv_columns(monkeypatch, no_sleep, tmp_path):
    _fake_fetch(monkeypatch,
                lambda u, m, d: web.Response(True, T20_HTML, u))
    monkeypatch.setattr(web, '_chain_type',
                        lambda s: 'H' if s.startswith('HHH') else 'K')
    sample = tmp_path / 'sample_humanization_result.csv'
    sample.write_text('Specific,name,hseq,lseq,\n'
                      'mouse,ab1,HHHAAA,KKKBBB\n'
                      'humanization,ab1human_sample,HHHCCC,KKKDDD\n')
    out = web.t20_csv(str(sample))
    import pandas as pd
    df = pd.read_csv(out)
    assert list(df.columns) == ['Raw_name', 'h_score', 'h_gene', 'l_score',
                                'l_gene', 'h_seq', 'l_seq']
    assert len(df) == 1  # only the humanization row
    assert df.iloc[0]['h_score'] == 82.51
    assert df.iloc[0]['h_gene'] == 'vh' and df.iloc[0]['l_gene'] == 'vk'


# ---------------------------------------------------------------------------
# SHAB Z-score
# ---------------------------------------------------------------------------

@pytest.mark.parametrize('group,db', [('H', 'human_heavy'),
                                      ('K', 'human_kappa'),
                                      ('L', 'human_lambda')])
def test_zscore_db_selection_and_regex(monkeypatch, no_sleep, group, db):
    calls = _fake_fetch(monkeypatch,
                        lambda u, m, d: web.Response(True, ZSCORE_HTML, u))
    monkeypatch.setattr(web, '_chain_type', lambda s: group)
    z, chain_type = web.get_z_score_online('MYSEQ')
    assert z == -0.417
    assert chain_type == db
    # exact reference URL (Zscore_eval.py:24)
    assert calls[0]['url'] == ('http://www.bioinf.org.uk/abs/shab/'
                               f'shab.cgi?aa_sequence=MYSEQ&DB={db}')


# ---------------------------------------------------------------------------
# Hu-mAb
# ---------------------------------------------------------------------------

def test_humab_job_flow(monkeypatch, no_sleep):
    def responder(url, method, data):
        if method == 'post':
            # the app redirects to a per-job result URL
            return web.Response(True, '', url + '/result/job42')
        return web.Response(True, HUMAB_HTML, url)

    calls = _fake_fetch(monkeypatch, responder)
    out = web.humab_scores('HSEQ', 'LSEQ', job_name='test_0')
    # POST fields exactly as the reference sends them (humab_eval.py:44-49)
    post = calls[0]
    assert post['method'] == 'post'
    assert post['url'] == web.HUMAB_URL
    assert post['data'] == {'h_sequence_score': 'HSEQ',
                            'l_sequence_score': 'LSEQ',
                            'jobname_score': 'test_0',
                            'humanise': True}
    # waits before polling the redirected result page
    assert no_sleep == [web.HUMAB_WAIT_SECONDS]
    assert calls[1]['url'].endswith('/result/job42')
    # HUMAN rows of the first two tables
    assert out['h_v_gene'] == 'hv3' and out['h_score'] == 0.91
    assert out['h_classification'] == 'HUMAN'
    assert out['l_v_gene'] == 'kv1' and out['l_score'] == 0.88


def test_humab_table_parser_only_first_two_tables():
    rows = web.extract_human_rows(HUMAB_HTML)
    assert len(rows) == 2
    assert rows[0][-1] == 'HUMAN' and rows[0][0] == 'hv3'
    assert rows[1][0] == 'kv1'


def test_humab_result_row_shape(monkeypatch, no_sleep):
    def responder(url, method, data):
        if method == 'post':
            return web.Response(True, '', url + '?job=1')
        return web.Response(True, HUMAB_HTML, url)

    _fake_fetch(monkeypatch, responder)
    data = web.get_humab_result('j', 'HSEQ', 'LSEQ')
    # 2 tables x 4 cells + both sequences (humab_eval.py:72-73)
    assert len(data) == 10
    assert data[-2:] == ['HSEQ', 'LSEQ']


# ---------------------------------------------------------------------------
# Internal chain typing (replaces abnumber's Chain.chain_type)
# ---------------------------------------------------------------------------

def test_chain_type_detects_heavy():
    assert web._chain_type(VH) == 'H'


def test_fail_soft_without_network(monkeypatch, no_sleep):
    def responder(u, m, d):
        raise web.WebEvalUnavailable('no egress')

    _fake_fetch(monkeypatch, responder)
    monkeypatch.setattr(web, '_chain_type', lambda s: 'H')
    with pytest.raises(web.WebEvalUnavailable):
        web.get_t20_online('SEQ', retries=2)
    with pytest.raises(web.WebEvalUnavailable):
        web.get_z_score_online('SEQ', retries=2)
