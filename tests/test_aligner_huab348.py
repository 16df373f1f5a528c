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
