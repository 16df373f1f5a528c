import numpy as np
import pytest

from hudiff_tpu.eval import metrics as M

VH = ('EVKLEESGGGLVQPGGSMKLSCVASGFTFSNFWMDWVRQSPEKGLEWIAGIRLKSYNYATHYAESVKG'
      'RFTISRDDSKSSVYLQMNNLRAEDTGIYYCTDWDGAYWGQGTLVTVSA')
VH_HUM = ('EVQLVESGGGLVQPGGSLRLSCAASGFTFSNFWMDWVRQAPGKGLEWVGGIRLKSYNYATHYAES'
          'VKGRFTISRDDSKNTAYLQMNSLRAEDTAVYYCTRWDGAYWGQGTLVTVSS')


def test_self_preservation_is_one():
    a = M.GridChain(VH, heavy=True, chain_hint='H')
    assert M.all_preservation(a, a) == 1.0
    assert M.vernier_preservation(a, a) == 1.0
    assert M.fr_preservation(a, a) == 1.0


def test_preservation_ordering():
    mouse = M.GridChain(VH, heavy=True, chain_hint='H')
    hum = M.GridChain(VH_HUM, heavy=True, chain_hint='H')
    p = M.all_preservation(hum, mouse)
    assert 0.7 < p < 1.0  # humanized differs mostly in FRs
    # CDR1/CDR2 grafted unchanged (this real pair mutates one CDR3-edge
    # residue, IMGT 106 D->R, so only the first two loops are exact)
    from hudiff_tpu import constants as C
    loops12 = np.isin(C.HEAVY_CDR_INDEX, (1, 2))
    occ = (mouse.grid != '-') & loops12
    assert (mouse.grid[occ] == hum.grid[occ]).all()


def test_mutation_precision_perfect_match():
    mouse = M.GridChain(VH, heavy=True, chain_hint='H')
    exp = M.GridChain(VH_HUM, heavy=True, chain_hint='H')
    # sampled == experimental -> precision 1.0
    assert M.mutation_precision(exp, mouse, exp) == 1.0
    # sampled == parental -> no shared mutations; exp-only mutations don't
    # count against the sample, so result is None or low
    r = M.mutation_precision(exp, mouse, mouse)
    assert r is None or r == 0.0


def test_consensus_identity_ranges():
    hum = M.GridChain(VH_HUM, heavy=True, chain_hint='H')
    mouse = M.GridChain(VH, heavy=True, chain_hint='H')
    ih = M.consensus_identity(hum)
    im = M.consensus_identity(mouse)
    assert 0.0 < im < ih <= 1.0  # humanized closer to human consensus


def test_unalignable_raises():
    with pytest.raises(ValueError):
        M.GridChain('ZZZZZZ', heavy=True, chain_hint='H')
