"""Adversarial numbering fixtures (round-3 VERDICT next #7).

The reference numbers arbitrary species through ANARCI/HMMER profiles
(dataset/abnativ_alignment/mybio.py:1097-1155); the internal
consensus-anchored aligner was only validated on HuAb348 mouse/human chains.
These fixtures pin its behavior on the hard cases:

- rat and rabbit frameworks (incl. rabbit kappa's extra Cys80) must grid
  with the invariant anchors in place;
- heavily-engineered FRs must grid without disturbing the CDR windows;
- pathological insertions must NEVER silently shift framework columns —
  either a clean None or an unchanged FR split;
- non-antibody / frame-shifted input must be REJECTED (None + warning),
  never silently mis-gridded (the 2-of-3 anchor gate in
  numbering/imgt.place_on_grid).
"""
import numpy as np
import pytest

from hudiff_tpu import constants as C
from hudiff_tpu.numbering import align as AL
from hudiff_tpu.numbering import imgt as IMGT
from hudiff_tpu.numbering import regions as RG

# A mouse VH/VL pair from the HuAb348 eval set (public data) — the in-family
# baseline the engineered variants are derived from.
MOUSE_H = ('EVKLEESGGGLVQPGGSMKLSCVASGFTFSNFWMDWVRQSPEKGLEWIAGIRLKSYNYAT'
           'HYAESVKGRFTISRDDSKSSVYLQMNNLRAEDTGIYYCTDWDGAYWGQGTLVTVSA')
MOUSE_L = ('DIVMTQSHKFMSTSVGDRVSITCKASQDVSTDVAWYQQKPGQSPKLLIYSASYRYTGVPD'
           'RFTGSGSGTDFTFTISSVQAEDLAVYYCQQHYSTPFTFGSGTKLEIK')

# Germline-plausible RAT V-domains (rodent frameworks differing from both
# the human consensus profiles and the HuAb348 mice).
RAT_H = ('EVQLQQSGAELVRPGASVKLSCKASGYTFTDYYINWVKQRPEQGLEWIGRIDPEDGETKY'
         'APKFQGKATITADTSSNTAYLQLSSLTSEDTAVYYCARSGYYGSSYFDYWGQGVMVTVSS')
RAT_K = ('DIQMTQSPSLLSASVGDRVTLNCKASQNINKYLNWYQQKLGEAPKLLIYNTNNLQTGIPS'
         'RFSGSGSGTDFTLTISSLQPEDFATYFCFQHYSGPYTFGSGTKLEIK')

# Germline-plausible RABBIT V-domains. Rabbit VH1 frameworks open with
# QSVEESGGRLVTPGTPLTLTC (very unlike human/mouse FR1); rabbit kappa carries
# the famous EXTRA interdomain cysteine at the ...ISGVQCDDAATYYC motif —
# a third C the anchor gate must not confuse with Cys23/Cys106.
RABBIT_H = ('QSVEESGGRLVTPGTPLTLTCTVSGFSLSSYAMSWVRQAPGKGLEWIGIISSSGSTYY'
            'ASWAKGRFTISKTSTTVDLKITSPTTEDTATYFCARGGYSSGWYFDLWGPGTLVTVSS')
RABBIT_K = ('DIVMTQTPASVSEPVGGTVTIKCQASQSISSYLAWYQQKPGQPPKLLIYGASTLASGV'
            'PSRFKGSGSGTQFTLTISGVQCDDAATYYCQQGYSSSNVDNAFGGGTEVVVK')


def _grid_cys_ok(placed: dict, heavy: bool) -> bool:
    """The invariant IMGT 23/104 cysteines land on their grid positions."""
    positions = C.HEAVY_POSITIONS if heavy else C.LIGHT_POSITIONS
    grid = placed['grid']
    return (grid[list(positions).index('23')] == 'C'
            and grid[list(positions).index('104')] == 'C')


@pytest.mark.parametrize('seq,heavy,label', [
    (RAT_H, True, 'rat VH'),
    (RAT_K, False, 'rat VK'),
    (RABBIT_H, True, 'rabbit VH'),
    (RABBIT_K, False, 'rabbit VK'),
])
def test_out_of_family_frameworks_grid_cleanly(seq, heavy, label):
    """Rat/rabbit frameworks are far from the human consensus but are real
    V-domains: they must grid with both invariant Cys in place and sane
    region windows — not be rejected, and not mis-grid."""
    group, profile, _ = AL.detect_chain_type(seq)
    assert (group == 'H') == heavy, f'{label}: mistyped as {group}'
    placed = IMGT.grid_string(seq, heavy=heavy)
    assert placed is not None, f'{label}: failed to grid'
    assert _grid_cys_ok(placed, heavy), f'{label}: Cys anchors misplaced'
    regs = RG.region_sequences(seq, heavy=heavy)
    assert regs is not None
    # every region non-empty and the chain fully placed in order
    assert all(regs[r] for r in ('fr1', 'cdr1', 'fr2', 'cdr2', 'fr3',
                                 'cdr3', 'fr4')), f'{label}: empty region'
    assert ''.join(regs[r] for r in ('fr1', 'cdr1', 'fr2', 'cdr2', 'fr3',
                                     'cdr3', 'fr4')) == seq


def test_rabbit_kappa_extra_cys_not_confused():
    """Rabbit kappa's third cysteine (the QCDD motif in FR3) must stay a
    plain FR3 residue — the two ANCHOR columns still get the right pair."""
    placed = IMGT.grid_string(RABBIT_K, heavy=False)
    assert placed is not None
    aho = placed['aho']
    assert aho[22] == 'C' and aho[105] == 'C'
    assert aho.count('C') == 3  # the extra one survives, un-anchored


def test_engineered_fr_still_grids_with_cdrs_intact():
    """Ala-scan 8 FR1 residues (keeping the anchors): an engineered
    framework far from any germline must still grid, and the CDR windows
    must be byte-identical to the parental chain's."""
    base = RG.region_sequences(MOUSE_H, heavy=True)
    engineered = MOUSE_H[:2] + 'AAAAAAAA' + MOUSE_H[10:]
    regs = RG.region_sequences(engineered, heavy=True)
    assert regs is not None
    for cdr in ('cdr1', 'cdr2', 'cdr3'):
        assert regs[cdr] == base[cdr], f'{cdr} window moved'


def test_single_anchor_mutation_tolerated():
    """A C23A point mutant is a legitimate engineered variant: the 2-of-3
    anchor rule must keep numbering it (ANARCI does), not reject it."""
    idx = MOUSE_H.index('C')  # first Cys = Cys23
    mutant = MOUSE_H[:idx] + 'A' + MOUSE_H[idx + 1:]
    placed = IMGT.grid_string(mutant, heavy=True)
    assert placed is not None
    # and its CDR3 is where the parental one is
    base = RG.region_sequences(MOUSE_H, heavy=True)
    regs = RG.region_sequences(mutant, heavy=True)
    assert regs['cdr3'] == base['cdr3']


def test_pathological_cdr3_insertion_never_shifts_frameworks():
    """Extra CDR3 residues (long engineered loops) must be absorbed by the
    CDR3 ladder or rejected — the FR splits must never shift."""
    base = RG.region_sequences(MOUSE_H, heavy=True)
    cdr3 = base['cdr3']
    pos = MOUSE_H.index(cdr3) + len(cdr3) // 2
    for n_ins in (4, 8, 14):
        stretched = MOUSE_H[:pos] + 'GS' * (n_ins // 2) + MOUSE_H[pos:]
        regs = RG.region_sequences(stretched, heavy=True)
        if regs is None:
            continue  # clean rejection is acceptable
        for fr in ('fr1', 'fr2', 'fr3', 'fr4'):
            assert regs[fr] == base[fr], (
                f'{n_ins}-residue CDR3 insertion shifted {fr}')
        assert len(regs['cdr3']) == len(cdr3) + n_ins


def test_non_antibody_rejected_with_warning():
    """Non-V-domain input must be a clean None + warning, never a silently
    mis-gridded chain (the anchor gate's defined failure behavior)."""
    # hen egg lysozyme N-terminal half: a real protein, not an antibody
    lysozyme = ('KVFGRCELAAAMKRHGLDNYRGYSLGNWVCAAKFESNFNTQATNRNTDGSTDYGILQI'
                'NSRWWCNDGRTPGSRNLCNIPC')
    with pytest.warns(UserWarning, match='anchors|V-domain'):
        assert IMGT.grid_string(lysozyme, heavy=True,
                                chain_hint='H') is None
    # poly-alanine of V-domain length: no anchors at all
    with pytest.warns(UserWarning, match='anchors|V-domain'):
        assert IMGT.grid_string('A' * 110, heavy=True,
                                chain_hint='H') is None


def test_scrambled_chain_rejected():
    """A residue-shuffled real chain keeps the composition but no structure:
    the anchor gate must reject what the DP would otherwise mis-grid."""
    rs = np.random.RandomState(5)
    chars = list(MOUSE_H)
    rs.shuffle(chars)
    scrambled = ''.join(chars)
    with pytest.warns(UserWarning, match='anchors|V-domain'):
        assert IMGT.grid_string(scrambled, heavy=True,
                                chain_hint='H') is None


def test_truncated_chain_behavior_defined():
    """A chain missing FR1 (N-terminal truncation, common in sequencing
    artifacts) must either grid with anchors intact or return None."""
    trunc = MOUSE_H[25:]  # cuts through Cys23
    out = IMGT.grid_string(trunc, heavy=True, chain_hint='H')
    if out is not None:
        assert out['aho'][105] == 'C'
