"""parse_cgz_file: paired OAS .csv.gz parsing (reference
dataset/preprocess.py:27-175) — locus filter, X filter, dedup, grid pads."""
import gzip

import numpy as np
import pytest

from hudiff_tpu import constants as C
from hudiff_tpu.data import oas
from hudiff_tpu.numbering import imgt as IMGT

H1 = ('QVQLQQPGAELVKPGASVKLSCKASGYTFTSYWMHWVKQRPGQGLEWIGEINPSNGRTNY'
      'NEKFKSKATLTVDKSSSTAYMQLSSLTSEDSAVYYCARGGYYFDYWGQGTTLTVSS')
L1 = ('DIVMTQSQKFMSTSVGDRVSVTCKASQNVGTNVAWYQQKPGQSPKALIYSASYRYSGVPD'
      'RFTGSGSGTDFTLTISNVQSEDLAEYFCQQYNSYPLTFGAGTKLELK')
H2 = ('EVQLVESGGGLVQPGGSLRLSCAASGFTFSSYAMSWVRQAPGKGLEWVSAISGSGGSTYY'
      'ADSVKGRFTISRDNSKNTLYLQMNSLRAEDTAVYYCAKDRGYYFDYWGQGTLVTVSS')
L2 = ('QSVLTQPPSASGTPGQRVTISCSGSSSNIGSNTVNWYQQLPGTAPKLLIYSNNQRPSGVP'
      'DRFSGSKSGTSASLAISGLQSEDEADYYCAAWDDSLNGPVFGGGTKLTVL')


def _anarci_json(seq: str, heavy: bool, locus: str) -> str:
    """Segmented ANARCI-style numbering dict (str(dict) like OAS embeds)
    built from the framework's own grid placement."""
    placed = IMGT.grid_string(seq, heavy=heavy, chain_hint=locus)
    assert placed is not None
    positions = C.HEAVY_POSITIONS if heavy else C.LIGHT_POSITIONS
    regions = C.HEAVY_REGION_INDEX if heavy else C.LIGHT_REGION_INDEX
    segs = {name: {} for name in C.SEG_NAMES[locus]}
    for i, ch in enumerate(placed['grid']):
        if ch == '-':
            continue
        seg = C.SEG_NAMES[locus][regions[i]]
        segs[seg][positions[i] + ' '] = ch  # OAS keys carry trailing spaces
    return str(segs), placed['grid']


def _write_cgz(path, rows):
    cols = ['locus_heavy', 'locus_light', 'ANARCI_numbering_heavy',
            'ANARCI_numbering_light', 'sequence_alignment_aa_heavy',
            'sequence_alignment_aa_light']
    with gzip.open(path, 'wt') as f:
        f.write('{"metadata": "synthetic OAS export"}\n')  # header line 0
        f.write(','.join(cols) + '\n')
        for r in rows:
            f.write(','.join('"%s"' % str(r[c]).replace('"', "'")
                             for c in cols) + '\n')


@pytest.fixture()
def cgz(tmp_path):
    jh1, grid_h1 = _anarci_json(H1, True, 'H')
    jl1, grid_l1 = _anarci_json(L1, False, 'K')
    jh2, grid_h2 = _anarci_json(H2, True, 'H')
    jl2, grid_l2 = _anarci_json(L2, False, 'L')
    good_k = {'locus_heavy': 'H', 'locus_light': 'K',
              'ANARCI_numbering_heavy': jh1, 'ANARCI_numbering_light': jl1,
              'sequence_alignment_aa_heavy': H1,
              'sequence_alignment_aa_light': L1}
    good_l = {'locus_heavy': 'H', 'locus_light': 'L',
              'ANARCI_numbering_heavy': jh2, 'ANARCI_numbering_light': jl2,
              'sequence_alignment_aa_heavy': H2,
              'sequence_alignment_aa_light': L2}
    wrong_locus = dict(good_k, locus_heavy='K')
    x_h = H1[:30] + 'X' + H1[31:]
    jx, _ = _anarci_json(x_h, True, 'H')
    with_x = dict(good_k, ANARCI_numbering_heavy=jx,
                  sequence_alignment_aa_heavy=x_h)
    rows = [good_k, wrong_locus, with_x, good_k, good_l]  # good_k duplicated
    path = tmp_path / 'unit.csv.gz'
    _write_cgz(path, rows)
    return str(path), {'grids': (grid_h1, grid_l1, grid_h2, grid_l2)}


def test_parse_cgz_filters_and_pads(cgz):
    path, meta = cgz
    out, chn = oas.parse_cgz_file(path, set())
    # wrong-locus, X-containing, and duplicate rows dropped -> 2 records
    assert len(out) == 2
    names = [r[0] for r in out]
    assert all(n == 'unit' for n in names)
    (n1, h1, l1, hp1, lp1, ah1, al1, lh1, ll1) = out[0]
    assert (h1, l1) == (H1, L1)
    assert hp1 == meta['grids'][0]
    assert lp1 == meta['grids'][1]
    assert ah1 is None and al1 is None  # not mouse mode
    assert (lh1, ll1) == ('H', 'K')
    (_, h2, l2, hp2, lp2, _, _, lh2, ll2) = out[1]
    assert (lh2, ll2) == ('H', 'L')
    assert hp2 == meta['grids'][2]
    assert {(H1, L1), (H2, L2)} == chn


def test_parse_cgz_mouse_mode_aho(cgz):
    path, _ = cgz
    out, _ = oas.parse_cgz_file(path, set(), mouse=True)
    assert len(out) == 2
    for rec in out:
        aho_h, aho_l = rec[5], rec[6]
        assert aho_h is not None and len(aho_h) == C.AHO_LEN
        assert aho_l is not None and len(aho_l) == C.AHO_LEN
        # AHo alignment preserves the residues
        assert aho_h.replace('-', '') == rec[1]


def test_parse_cgz_dedup_across_files(cgz, tmp_path):
    path, _ = cgz
    out1, chn = oas.parse_cgz_file(path, set())
    out2, chn = oas.parse_cgz_file(path, chn)  # same file again
    assert len(out1) == 2 and len(out2) == 0  # all pairs already seen


def test_build_pair_dataset_from_csv(tmp_path):
    """CSV -> paired RecordStore path (no OAS download needed): built store
    loads through OasPairDataset and feeds pair_batch."""
    import pandas as pd

    from hudiff_tpu import constants as C
    from hudiff_tpu.data import oas
    from hudiff_tpu.tokenizer import Tokenizer

    h = ('QVQLVQSGAEVKKPGASVKVSCKASGYTFTGYYMHWVRQAPGQGLEWMGWINPNSGGTNYA'
         'QKFQGRVTMTRDTSISTAYMELSRLRSDDTAVYYCARDLRGYFDYWGQGTLVTVSS')
    l = ('DIQMTQSPSSLSASVGDRVTITCRASQSISSYLNWYQQKPGKAPKLLIYAASSLQSGVPSR'
         'FSGSGSGTDFTLTISSLQPEDFATYYCQQSYSTPLTFGGGTKVEIK')
    h2 = h.replace('GYYMH', 'GYYIH')  # distinct second pair
    csv = tmp_path / 'pairs.csv'
    pd.DataFrame({'type': ['humanized', 'mouse', 'humanized', 'humanized'],
                  'name': ['a', 'b', 'c', 'dup_of_a'],
                  'h_seq': [h, h, h2, h], 'l_seq': [l, l, l, l]}).to_csv(
        csv, index=False)
    out = oas.build_pair_dataset_from_csv(str(csv), str(tmp_path / 'ds'),
                                          type_filter='humanized',
                                          split_ratio=0.5)
    ds = oas.OasPairDataset(out)
    # mouse row filtered out AND the duplicate (H, L) pair deduplicated
    # (duplicates would leak across the random train/val split)
    assert len(ds) == 2
    rec = ds[0]
    assert len(rec['h_pad_seq']) == C.HEAVY_LEN
    assert len(rec['l_pad_seq']) == C.LIGHT_LEN
    assert len(rec['aho_h_pad_seq']) == C.AHO_LEN
    assert rec['l_type'] in ('K', 'L')
    batch = oas.pair_batch([ds[i] for i in range(len(ds))], Tokenizer())
    assert batch['tokens'].shape == (2, C.PAIR_LEN)
    assert batch['chain_type'].shape == (2, 2)


def test_build_pair_dataset_type_filter_requires_column(tmp_path):
    """--type-filter on a CSV without a 'type' column must error loudly,
    not silently train on every row."""
    import pandas as pd
    import pytest as _pytest

    from hudiff_tpu.data import oas
    csv = tmp_path / 'p.csv'
    pd.DataFrame({'name': ['a'], 'h_seq': ['QVQ'], 'l_seq': ['DIQ']}).to_csv(
        csv, index=False)
    with _pytest.raises(ValueError, match="no 'type' column"):
        oas.build_pair_dataset_from_csv(str(csv), str(tmp_path / 'ds'),
                                        type_filter='humanized')


def test_build_pair_dataset_rejects_fragments_and_swaps(tmp_path):
    """chain_hint bypasses grid_string's typing gate, so the builder itself
    must apply the pair_input gates: fragments below MIN_CHAIN_SCORE and
    light chains in the h_seq column must be skipped, not NW-aligned into
    the training store as junk records."""
    import pandas as pd

    from hudiff_tpu.data import oas

    h = ('QVQLVQSGAEVKKPGASVKVSCKASGYTFTGYYMHWVRQAPGQGLEWMGWINPNSGGTNYA'
         'QKFQGRVTMTRDTSISTAYMELSRLRSDDTAVYYCARDLRGYFDYWGQGTLVTVSS')
    l = ('DIQMTQSPSSLSASVGDRVTITCRASQSISSYLNWYQQKPGKAPKLLIYAASSLQSGVPSR'
         'FSGSGSGTDFTLTISSLQPEDFATYYCQQSYSTPLTFGGGTKVEIK')
    csv = tmp_path / 'pairs.csv'
    h_alt = h.replace('GYYMH', 'GYYIH')
    pd.DataFrame({
        'name': ['good', 'fragment', 'swapped', 'heavy_in_l'],
        'h_seq': [h, 'QVQLVQSG', l, h],   # fragment + light-in-heavy-column
        'l_seq': [l, l, h, h_alt],        # + heavy-in-light-column
    }).to_csv(csv, index=False)
    out = oas.build_pair_dataset_from_csv(str(csv), str(tmp_path / 'ds'),
                                          split_ratio=0.5)
    ds = oas.OasPairDataset(out)
    assert len(ds) == 1  # only the real pair survives
    assert ds[0]['name'] == 'good'
