"""LIVE demo-eval regeneration checks (round-4 VERDICT weak #5 / next #6).

tests/test_demo_eval_report.py band-checks the COMMITTED artifacts, which
fire only when someone regenerates them. These tests run the real
pipeline (sampling.humanize CLI -> eval.harness CLI) over a small subset
of each dataset with the shipped demo checkpoints and assert the same
live bands tools/regen_demo_eval.py enforces — so a sampler, numbering,
eval-pairing, or checkpoint regression fails CI without anyone touching
the committed JSON.
"""
import os
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, 'tools'))

import regen_demo_eval as R  # noqa: E402


@pytest.mark.slow
def test_live_ab_regen_subset():
    report = R.regen_ab(subset=8, write=False)
    # bands already asserted inside regen_ab (check_ab_bands); pin the
    # coverage contract here too so a silent band removal is visible
    assert report['n_matched'] >= 7
    assert report['n_skipped_unmatched'] == 0


@pytest.mark.slow
def test_live_nano_regen_subset():
    report = R.regen_nano(subset=8, write=False)
    assert report['n_matched'] >= 7
    assert report['preservation_all'] > 0.85
