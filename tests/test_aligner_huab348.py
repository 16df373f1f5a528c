"""HuAb348-scale regression test for the internal aligner.

Pins the alignment-rate claim (COMPONENTS.md) as a test over the full
reference eval set (696 chains x2: every mouse + experimental humanized
pair in humanization_pair_data_filter.csv): alignment rate and conserved
anchor placement (IMGT Cys23 / Cys104 / heavy W118) must not regress.
"""
import os

import numpy as np
import pandas as pd
import pytest

from hudiff_tpu import constants as C
from hudiff_tpu.eval.metrics import GridChain

HUAB348 = ('/root/reference/data/antibody_eval_data/HuAb348_data/'
           'humanization_pair_data_filter.csv')

pytestmark = [
    pytest.mark.skipif(not os.path.exists(HUAB348),
                       reason='reference eval data not mounted'),
]

H23 = C.HEAVY_POSITIONS_IDX['23']
H104 = C.HEAVY_POSITIONS_IDX['104']
H118 = C.HEAVY_POSITIONS_IDX['118']
L23 = C.LIGHT_POSITIONS_IDX['23']
L104 = C.LIGHT_POSITIONS_IDX['104']


def _rates(seqs, heavy):
    aligned = 0
    anchors_ok = 0
    for seq in seqs:
        try:
            ch = GridChain(seq, heavy, 'H' if heavy else None)
        except ValueError:
            continue
        aligned += 1
        if heavy:
            ok = (ch.grid[H23] == 'C' and ch.grid[H104] == 'C'
                  and ch.grid[H118] == 'W')
        else:
            ok = ch.grid[L23] == 'C' and ch.grid[L104] == 'C'
        anchors_ok += bool(ok)
    return aligned / len(seqs), anchors_ok / max(aligned, 1)


def test_huab348_alignment_and_anchor_rates():
    df = pd.read_csv(HUAB348)
    h_rate, h_anchor = _rates(list(df['h_seq']), heavy=True)
    l_rate, l_anchor = _rates(list(df['l_seq']), heavy=False)
    # COMPONENTS.md claim: ~100/99.7% aligned, ~98-99% anchor-perfect
    assert h_rate >= 0.99, f'heavy align rate regressed: {h_rate:.4f}'
    assert l_rate >= 0.99, f'light align rate regressed: {l_rate:.4f}'
    assert h_anchor >= 0.97, f'heavy anchor rate regressed: {h_anchor:.4f}'
    assert l_anchor >= 0.97, f'light anchor rate regressed: {l_anchor:.4f}'


def test_chain_margin_separation():
    """Pin the is_confident_heavy / is_confident_light calibration on real
    data (first 100 HuAb348 rows = 200 chains): every heavy chain's
    H-minus-best-light profile margin clears +LIGHT_MARGIN_AMBIGUOUS and
    every light chain clears -LIGHT_MARGIN_AMBIGUOUS. Full-set measurement
    (1392 chains): heavy margins [+156, +553], light [-553, -133] — the
    30.0 threshold sits >100 points from both distributions."""
    from hudiff_tpu.numbering import align as AL
    df = pd.read_csv(HUAB348).head(100)
    for col, heavy in (('h_seq', True), ('l_seq', False)):
        for s in df[col]:
            if not isinstance(s, str):
                continue
            scores = AL.profile_scores(s)
            if heavy:
                assert AL.is_confident_heavy(scores), s[:30]
                assert not AL.is_confident_light(scores), s[:30]
            else:
                assert AL.is_confident_light(scores), s[:30]
                assert not AL.is_confident_heavy(scores), s[:30]
