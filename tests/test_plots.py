"""Venn-overlap + OASis-curve plotting utils (reference
utils/evaluation.py:113-315; venn2 geometry re-derived in pure matplotlib)."""
import os

import numpy as np
import pytest

from hudiff_tpu.eval import plots as P


class FakeChain:
    def __init__(self, grid):
        self.grid = np.asarray(list(grid))

    def occupied(self):
        return self.grid != '-'


def test_mutation_overlap_counts():
    parental = FakeChain('AAAAAA--')
    experimental = FakeChain('ACADAA--')  # mutations at 1(C), 3(D)
    predicted = FakeChain('ACAEAF--')     # mutations at 1(C), 3(E), 5(F)
    o = P.mutation_overlap(parental, experimental, predicted)
    # pos1: both mutated to C -> shared; pos3: both mutated but E!=D ->
    # one each side; pos5: predicted only
    assert o == {'Baseline only': 1, 'Shared': 1, 'Predicted only': 2}


def test_mutation_overlap_no_mutations():
    a = FakeChain('AAAA')
    o = P.mutation_overlap(a, FakeChain('AAAA'), FakeChain('AAAA'))
    assert o == {'Baseline only': 0, 'Shared': 0, 'Predicted only': 0}


def test_venn2_layout_lens_area_matches_shared():
    for a_only, shared, b_only in [(5, 3, 7), (1, 1, 1), (10, 0.5, 2)]:
        r1, r2, d = P._venn2_layout(a_only, shared, b_only)
        assert abs(np.pi * r1 * r1 - (a_only + shared)) < 1e-6
        assert abs(np.pi * r2 * r2 - (b_only + shared)) < 1e-6
        assert abs(P._lens_area(d, r1, r2) - shared) < 1e-4


def test_venn2_layout_disjoint():
    r1, r2, d = P._venn2_layout(4, 0, 9)
    assert d > r1 + r2  # circles must not touch


@pytest.fixture()
def overlap_rows():
    rng = np.random.RandomState(0)
    rows = []
    for i in range(6):
        rows.append({'Baseline only': int(rng.randint(1, 10)),
                     'Shared': int(rng.randint(0, 8)),
                     'Predicted only': int(rng.randint(1, 10)),
                     'name': f'ab{i}'})
    return rows


def test_plot_overlap_writes_file(tmp_path, overlap_rows):
    out = str(tmp_path / 'overlap.png')
    P.plot_overlap(overlap_rows, out)
    assert os.path.getsize(out) > 0


def test_plot_overlap_venns_writes_file(tmp_path, overlap_rows):
    out = str(tmp_path / 'venns.png')
    P.plot_overlap_venns(overlap_rows, out, ncols=4)
    assert os.path.getsize(out) > 0


@pytest.fixture()
def oasis_curves_df():
    pd = pytest.importorskip('pandas')
    rng = np.random.RandomState(1)
    cols = ['0%'] + [f'{p}%' for p in range(1, 91)]
    rows = []
    for g in ('HuDiff', 'Mouse', 'Experimental'):
        base = {'HuDiff': 0.85, 'Mouse': 0.45, 'Experimental': 0.8}[g]
        for i in range(4):
            decay = np.linspace(0, 0.3, len(cols))
            vals = np.clip(base - decay + rng.normal(0, 0.01, len(cols)),
                           0, 1)
            rows.append(dict({'group': g}, **dict(zip(cols, vals))))
    return pd.DataFrame(rows, index=[f'ab{i}' for i in range(12)])


def test_plot_oasis_curves(tmp_path, oasis_curves_df):
    out = str(tmp_path / 'curves.png')
    P.plot_oasis_curves(oasis_curves_df, out, groupby='group')
    assert os.path.getsize(out) > 0


def test_plot_oasis_curves_ungrouped(tmp_path, oasis_curves_df):
    out = str(tmp_path / 'curves2.png')
    df = oasis_curves_df.drop(columns=['group']).iloc[:3]
    P.plot_oasis_curves(df, out)
    assert os.path.getsize(out) > 0


def test_plot_oasis_curve_and_barplots(tmp_path, oasis_curves_df):
    out = str(tmp_path / 'panel.png')
    P.plot_oasis_curve_and_barplots(oasis_curves_df, 'group', out)
    assert os.path.getsize(out) > 0


def test_load_oasis_curves_csv(tmp_path, oasis_curves_df):
    path = str(tmp_path / 'curves.csv')
    oasis_curves_df.to_csv(path)
    df = P.load_oasis_curves(path)
    assert '50%' in df.columns and len(df) == len(oasis_curves_df)


def test_overlap_table_on_real_grids():
    """End-to-end overlap on alignable sequences through GridChain."""
    h = ('EVQLVESGGGLVQPGGSLRLSCAASGFTFSSYAMSWVRQAPGKGLEWVSAISGSGGSTYY'
         'ADSVKGRFTISRDNSKNTLYLQMNSLRAEDTAVYYCAKDRGYYFDYWGQGTLVTVSS')
    l = ('DIQMTQSPSSLSASVGDRVTITCRASQSISSYLNWYQQKPGKAPKLLIYAASSLQSGVPS'
         'RFSGSGSGTDFTLTISSLQPEDFATYYCQQSYSTPLTFGGGTKVEIK')
    # experimental: one H mutation; predicted: the same one plus one more
    h_exp = h[:30] + 'V' + h[31:]
    h_pred = h[:30] + 'V' + h[:0] + h[31:50] + 'T' + h[51:]
    rows = P.overlap_table([(h, l)], [(h_exp, l)], [(h_pred, l)],
                           names=['x'])
    assert len(rows) == 1
    assert rows[0]['Shared'] >= 1
    assert rows[0]['name'] == 'x'
