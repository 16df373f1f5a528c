"""RecordStore (python + native paths), batch assembly, native aligner."""
import os

import numpy as np
import pytest

from hudiff_tpu import constants as C
from hudiff_tpu.data import oas, store
from hudiff_tpu.tokenizer import Tokenizer


@pytest.fixture()
def small_store(tmp_path):
    path = str(tmp_path / 'test_store')
    with store.RecordStoreWriter(path) as w:
        for i in range(20):
            w.put_obj({'i': i, 'payload': 'x' * (i + 1)})
    return path


def test_store_roundtrip_python(small_store):
    rs = store.RecordStore(small_store, native=False)
    assert len(rs) == 20
    assert rs[7] == {'i': 7, 'payload': 'x' * 8}
    assert [r['i'] for r in rs] == list(range(20))
    rs.close()


def test_store_roundtrip_native(small_store):
    from hudiff_tpu.native import load
    if load() is None:
        pytest.skip('native library not built')
    rs = store.RecordStore(small_store, native=True)
    assert rs._native is not None, 'native path should be active'
    assert len(rs) == 20
    assert rs[3] == {'i': 3, 'payload': 'xxxx'}
    with pytest.raises(IndexError):
        rs.get(99)
    rs.close()


def test_native_python_agree(small_store):
    from hudiff_tpu.native import load
    if load() is None:
        pytest.skip('native library not built')
    a = store.RecordStore(small_store, native=True)
    b = store.RecordStore(small_store, native=False)
    for i in range(20):
        assert a.get(i) == b.get(i)
    a.close()
    b.close()


def test_pair_batch_assembly():
    tok = Tokenizer()
    rec = {'h_pad_seq': '-' * C.HEAVY_LEN, 'l_pad_seq': 'A' * C.LIGHT_LEN,
           'h_type': 'H', 'l_type': 'K'}
    batch = oas.pair_batch([rec, rec], tok)
    assert batch['tokens'].shape == (2, C.PAIR_LEN)
    assert (batch['tokens'][:, : C.HEAVY_LEN] == C.IDX_PAD).all()
    assert (batch['tokens'][:, C.HEAVY_LEN:] == 0).all()
    np.testing.assert_array_equal(batch['chain_type'], [[0, 2], [0, 2]])


def test_heavy_batch_drop_aho_failed():
    tok = Tokenizer()
    good = {'pad_seq': 'A' * C.HEAVY_LEN, 'chain': 'H', 'aho_seq': 'A' * 149}
    bad = {'pad_seq': 'C' * C.HEAVY_LEN, 'chain': 'H',
           'aho_seq': 'A' * 146 + '---'}
    batch = oas.heavy_batch([good, bad], tok, drop_aho_failed=True)
    assert batch['tokens'].shape[0] == 1


def test_native_aligner_matches_python():
    from hudiff_tpu.native import load
    if load() is None:
        pytest.skip('native library not built')
    import hudiff_tpu.native as N
    from hudiff_tpu.numbering import align as AL
    seq = ('QVQLVESGGGSVQAGGSLVLSCAASGYTYTAGCMGWFRQTPGKEREGVAAIDSDGSTAYADSVKG'
           'RFTISRDNDKNMVYLQMNSLKPEDTAMYYCAAASRCGLGTVREYRFWGQGTQVTVSS')
    r_native = AL.align_to_aho(seq, 'VHH')
    saved = (N._TRIED, N._LIB)
    try:
        N._TRIED, N._LIB = True, None
        r_pure = AL.align_to_aho(seq, 'VHH')
    finally:
        N._TRIED, N._LIB = saved
    assert r_native[0] == r_pure[0]
    assert abs(r_native[1] - r_pure[1]) < 1e-2
