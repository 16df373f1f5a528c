"""Web-service humanness evaluators (optional; require network egress).

Rebuilds evaluation/T20_eval.py (sam.curiaglobal.com T20 server),
evaluation/Zscore_eval.py (bioinf.org.uk SHAB) and evaluation/humab_eval.py
(OPIG SAbPred Hu-mAb). These cross a network boundary and are therefore
host-side, optional, and fail soft: every entry point raises
``WebEvalUnavailable`` with a clear message when the service cannot be
reached (e.g. in zero-egress environments).
"""
from __future__ import annotations

import concurrent.futures as futures
import re
import time
from typing import Dict, List, Optional, Tuple


class WebEvalUnavailable(RuntimeError):
    pass


_T20_URL = ('https://sam.curiaglobal.com/cgi-bin/t20/t20.py?'
            'chain={chain}&region={region}&output=text&seq={seq}')
_T20_RE = re.compile(r'T20 score:\s*([0-9.]+)')


def _get(url: str, retries: int = 3, timeout: float = 30.0) -> str:
    try:
        import requests
    except ImportError as e:
        raise WebEvalUnavailable('requests not installed') from e
    last: Optional[Exception] = None
    for _ in range(retries):
        try:
            r = requests.get(url, timeout=timeout)
            r.raise_for_status()
            return r.text
        except Exception as e:  # noqa: BLE001 - fail soft with context
            last = e
            time.sleep(1.0)
    raise WebEvalUnavailable(f'web evaluation unreachable: {last}')


def t20_score(seq: str, chain: str, region: int = 1) -> float:
    """Single-chain T20 humanness (T20_eval.py:13-45). region=1 full seq,
    region=2 framework only."""
    chain_key = {'H': 'vh', 'K': 'vk', 'L': 'vl'}.get(chain, chain)
    text = _get(_T20_URL.format(chain=chain_key, region=region, seq=seq))
    m = _T20_RE.search(text)
    if not m:
        raise WebEvalUnavailable('T20 response not parseable')
    return float(m.group(1))


def t20_scores(seqs: List[Tuple[str, str]], region: int = 1,
               max_workers: int = 8) -> List[Optional[float]]:
    """Parallel T20 over (seq, chain) pairs (T20_eval.py:128-156)."""
    out: List[Optional[float]] = [None] * len(seqs)
    with futures.ThreadPoolExecutor(max_workers=max_workers) as ex:
        futs = {ex.submit(t20_score, s, c, region): i
                for i, (s, c) in enumerate(seqs)}
        for fut in futures.as_completed(futs):
            i = futs[fut]
            try:
                out[i] = fut.result()
            except WebEvalUnavailable:
                out[i] = None
    return out


def t20_scores_from_csv(sample_csv: str, region: int = 1) -> Dict[str, float]:
    import numpy as np
    import pandas as pd
    df = pd.read_csv(sample_csv)
    human = df[df['Specific'] == 'humanization']
    pairs = [(r.hseq, 'H') for r in human.itertuples()] + \
            [(r.lseq, 'K') for r in human.itertuples()]
    scores = t20_scores(pairs, region=region)
    n = len(human)
    h = [s for s in scores[:n] if s is not None]
    l = [s for s in scores[n:] if s is not None]
    return {'t20_h_mean': float(np.mean(h)) if h else float('nan'),
            't20_l_mean': float(np.mean(l)) if l else float('nan')}


_HUMAB_URL = 'https://opig.stats.ox.ac.uk/webapps/sabdab-sabpred/sabpred/humab'


def humab_scores(h_seq: str, l_seq: str) -> Dict[str, float]:
    """Hu-mAb classifier scores via the OPIG SAbPred web app
    (evaluation/humab_eval.py:40-128)."""
    try:
        import requests
    except ImportError as e:
        raise WebEvalUnavailable('requests not installed') from e
    try:
        r = requests.post(_HUMAB_URL, data={'hchain': h_seq, 'lchain': l_seq},
                          timeout=60)
        r.raise_for_status()
    except Exception as e:  # noqa: BLE001
        raise WebEvalUnavailable(f'Hu-mAb service unreachable: {e}') from e
    scores = {}
    for chain, pat in (('h', r'VH[^0-9]*([0-9.]+)'),
                       ('l', r'V[KL][^0-9]*([0-9.]+)')):
        m = re.search(pat, r.text)
        if m:
            scores[f'humab_{chain}'] = float(m.group(1))
    if not scores:
        raise WebEvalUnavailable('Hu-mAb response not parseable')
    return scores


def ablstm_scores(aho_seqs: List[str], model_path: Optional[str] = None
                  ) -> List[float]:
    """Local ABLSTM humanness over AHo-aligned sequences
    (evaluation/ABLSTM_eval.py:17-84). Requires the external `ablstm`
    package + weights; raises WebEvalUnavailable otherwise."""
    try:
        from ablstm import ModelLSTM  # type: ignore
    except ImportError as e:
        raise WebEvalUnavailable('ablstm package not installed') from e
    model = ModelLSTM(embedding_dim=64, hidden_dim=64, device='cpu',
                      gapped=True)
    if model_path:
        model.load(fn=model_path)
    import tempfile
    with tempfile.NamedTemporaryFile('w', suffix='.fa', delete=False) as f:
        for i, s in enumerate(aho_seqs):
            f.write(f'>{i}\n{s}\n')
        path = f.name
    scores = model.eval(fn=path)
    return [float(s) for s in scores]


_ZSCORE_URL = 'http://www.bioinf.org.uk/abs/shab/shab.cgi'


def z_score(seq: str) -> float:
    """SHAB Z-score humanness (Zscore_eval.py:18-95)."""
    try:
        import requests
    except ImportError as e:
        raise WebEvalUnavailable('requests not installed') from e
    try:
        r = requests.post(_ZSCORE_URL, data={'seq': seq}, timeout=30)
        r.raise_for_status()
    except Exception as e:  # noqa: BLE001
        raise WebEvalUnavailable(f'Z-score service unreachable: {e}') from e
    m = re.search(r'Z[- ]?score[^0-9\-]*(-?[0-9.]+)', r.text)
    if not m:
        raise WebEvalUnavailable('Z-score response not parseable')
    return float(m.group(1))
