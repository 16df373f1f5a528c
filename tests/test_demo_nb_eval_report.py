"""Dataset-scale NANOBODY demo-checkpoint eval report (round-4 VERDICT next #6).

examples/demo_nb_eval.json is the committed output of running the full
nano pipeline over ALL 300 camelid VHHs of the reference's nanobody eval
set (abnativ_select_vhh.csv) with the shipped demo_nb_tiny checkpoint:

    python tools/regen_demo_eval.py nano --write

which drives the real CLIs end to end (sampling.humanize nano ->
eval.harness nano) — the metric battery mirrors the reference's
nanobody eval (nanobody_scripts/nano_eval.py:81-142: identity to the
parental, FR identity against human consensus/germline).

This test pins that COMMITTED report with tolerance bands; the LIVE
regression check (subset rerun of the same pipeline every slow-suite run)
is tests/test_demo_eval_regen.py::test_live_nano_regen_subset. demo_nb_tiny
is a PIPELINE demo trained on the 300 camelid VHHs themselves (not on human
heavy chains like the released HuDiff-Nb), so the pinned invariant is
reconstruction fidelity + FR identity in a stable band around the camelid
parental level (parental means on this set, measured with this framework's
metrics: consensus 0.8081 / germline 0.7936), not humanization lift.
"""
import json
import os

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REPORT = os.path.join(HERE, 'examples', 'demo_nb_eval.json')


def test_demo_nb_eval_report_bands():
    with open(REPORT) as f:
        r = json.load(f)
    # coverage: every parental VHH sampled; at most one unalignable
    assert r['n_samples'] >= 290
    assert r['n_matched'] >= r['n_samples'] - 1

    # FR-only edits with CDRs frozen: candidates stay close to parental
    assert 0.85 <= r['preservation_all'] <= 0.99

    # human-consensus / germline FR identity in the stable band around the
    # camelid parental level (see module docstring for the anchors)
    assert 0.75 <= r['consensus_fr_identity'] <= 0.92
    assert 0.72 <= r['germline_fr_identity'] <= 0.92
