import numpy as np

from hudiff_tpu import constants as C
from hudiff_tpu.tokenizer import Tokenizer, aho_onehot


def test_roundtrip():
    tok = Tokenizer()
    seqs = [
        'EVQLVESGGGLVQPGGSLRLSSAISGFSISSTSIDWVRQAPGKGLEWVARISPSSGSTSYADSVKG',
        'QVQLQESGGGLVQPGGSLRLSCAASGFTFSSAIMTW',
    ]
    mat = tok.seq2idx_batch(seqs)
    assert mat.shape == (2, len(seqs[0]))
    assert mat.dtype == np.int32
    out = tok.idx2seq_batch(mat)
    assert out == seqs  # pads stripped on decode


def test_special_tokens():
    tok = Tokenizer()
    assert tok.n_toks == 23
    assert tok.idx_pad == 21 and tok.idx_msk == 22
    assert tok.tok2idx('A') == 0 and tok.tok2idx('Y') == 19 and tok.tok2idx('X') == 20
    padded = tok.seq2idx('AC-Y')
    assert padded.tolist() == [0, 1, 21, 19]
    assert tok.idx2seq_pad(padded) == 'AC-Y'
    assert tok.idx2seq(padded) == 'ACY'


def test_chain_type_idx():
    tok = Tokenizer()
    assert tok.chain_type_idx('H') == 0
    assert tok.chain_type_idx('L') == 1
    assert tok.chain_type_idx('K') == 2


def test_aho_onehot():
    oh = aho_onehot('AY-X')
    assert oh.shape == (4, 21)
    assert oh[0, 0] == 1 and oh[1, 19] == 1 and oh[2, 20] == 1
    # unknown letters one-hot to all-zeros (reference get_dummies semantics)
    assert oh[3].sum() == 0
    assert oh.sum() == 3
