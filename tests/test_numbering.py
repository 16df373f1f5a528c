import numpy as np
import pytest

from hudiff_tpu import constants as C
from hudiff_tpu.numbering import aho, align as AL, imgt

# A mouse VH/VL pair from the HuAb348 eval set (public data).
VH = ('EVKLEESGGGLVQPGGSMKLSCVASGFTFSNFWMDWVRQSPEKGLEWIAGIRLKSYNYATHYAESVKG'
      'RFTISRDDSKSSVYLQMNNLRAEDTGIYYCTDWDGAYWGQGTLVTVSA')
VL = ('DIVMTQSHKFMSTSVGDRVSITCKASQDVSTDVAWYQQKPGQSPKLLIYSASYRYTGVPDRFTGSGSG'
      'TDFTFTISSVQAEDLAVYYCQQHYSTPFTFGSGTKLEIK')
VHH = ('QVQLVESGGGSVQAGGSLVLSCAASGYTYTAGCMGWFRQTPGKEREGVAAIDSDGSTAYADSVKGRF'
       'TISRDNDKNMVYLQMNSLKPEDTAMYYCAAASRCGLGTVREYRFWGQGTQVTVSS')


def test_aho_alignment_roundtrip():
    a = aho.align_aho(VH, chain='H')
    assert a is not None and len(a) == C.AHO_LEN
    assert a.replace('-', '') == VH  # residue order preserved, none lost
    # conserved cysteines at AHo positions 23 and 106
    assert a[22] == 'C' and a[105] == 'C'


def test_imgt_grid_placement_heavy():
    h = imgt.grid_string(VH, heavy=True, chain_hint='H')
    assert h is not None and len(h['grid']) == C.HEAVY_LEN
    g = h['grid']
    assert g.replace('-', '') == VH
    # IMGT anchors: Cys23 (slot 22), Cys104 (slot 103), W118 (slot 141)
    assert g[22] == 'C' and g[103] == 'C' and g[141] == 'W'
    # CDR3 residues inside the CDR3 slots
    cdr3 = ''.join(ch for ch, t in zip(g, C.HEAVY_CDR_INDEX) if t == 3 and ch != '-')
    assert cdr3 in VH


def test_imgt_grid_placement_light():
    group, profile, _ = AL.detect_chain_type(VL)
    assert group == 'K'
    l = imgt.grid_string(VL, heavy=False, chain_hint=group)
    assert l is not None and len(l['grid']) == C.LIGHT_LEN
    g = l['grid']
    assert g.replace('-', '') == VL
    assert g[22] == 'C' and g[103] == 'C'


def test_chain_detection():
    assert AL.detect_chain_type(VH)[0] == 'H'
    assert AL.detect_chain_type(VL)[0] == 'K'
    assert AL.detect_chain_type(VHH)[0] == 'H'


def test_number_to_dict():
    out = imgt.number_to_dict(VH, chain_hint='H')
    assert out is not None
    labels, chain = out
    assert chain == 'H'
    assert labels['23'] == 'C' and labels['104'] == 'C'
    assert len(''.join(labels.values())) == len(VH)


def test_unalignable_inputs():
    assert aho.align_aho('Z' * 30) is None           # bad residues
    assert aho.align_aho('A' * 200) is None          # too long
    res = imgt.grid_string('QQQ', heavy=True, chain_hint='H')
    # extremely short: aligns or returns None, but never crashes
    assert res is None or len(res['grid']) == C.HEAVY_LEN


def test_transfer_consistency_with_finetune():
    """Grid + AHo from the numbering engine must satisfy the IMGT<->AHo
    transfer count invariants used in fine-tuning."""
    import jax.numpy as jnp
    from hudiff_tpu.ops import scheme_transfer as ST
    from hudiff_tpu.tokenizer import Tokenizer, aho_onehot
    tok = Tokenizer()
    h = imgt.grid_string(VHH, heavy=True, chain_hint='VHH')
    tokens = jnp.asarray(tok.seq2idx(h['grid']))[None]
    ah = jnp.asarray(aho_onehot(h['aho']))[None]
    assert bool(ST.counts_match(tokens, ah, pair=False)[0])
