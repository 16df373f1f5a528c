"""Germline-breadth sensitivity study (round-3 VERDICT missing #2 / next #6).

The reference grafts against abnumber's full IMGT allele database
(antibody_scripts/sample.py:370-376, patent_eval.py:203-213); this repo
embeds ONE representative allele per functional gene
(numbering/germline.py). The question: how much can that cost on real data?

Alleles of the same V gene are point variants — IMGT allele pairs differ by
a handful of nucleotides, so within-gene protein distance in FR1-FR3 is
almost always <= ~2 residues (the '*01 vs *02' scale). Two consequences to
bound, both MEASURED here on every HuAb348 chain (348 mouse + 348
experimentally humanized pairs, H and L = up to 1392 chains):

1. **Gene selection**: nearest-gene choice flips only if the runner-up
   gene trails the winner by less than the allele-level wiggle. We report
   the distribution of the best-vs-second-gene FR-identity margin (in
   residue equivalents over the ~85 occupied FR1-FR3 slots) and the
   fraction of chains whose margin exceeds 2 and 4 residues.
2. **Reported germline FR identity**: against the TRUE best allele,
   abnumber's identity can exceed ours by at most (allele distance)/|FR|
   ~= 2/85 ~= 2.4 identity points — an upper bound independent of which
   gene wins.

Output: one JSON with per-group margin distributions; the numbers are
pinned by tests/test_germline_margin.py and quoted in
numbering/germline.py's docstring.

Run: PYTHONPATH=/root/repo python tools/germline_margin.py
"""
from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

HUAB348 = ('/root/reference/data/antibody_eval_data/HuAb348_data/'
           'humanization_pair_data_filter.csv')


def chain_margins(seqs, group):
    """Per-chain (best_score, margin_points, margin_residues, n_fr) for the
    best vs second-best DIFFERENT gene."""
    from hudiff_tpu.numbering import germline as G
    from hudiff_tpu.numbering import imgt as IMGT

    rows = []
    for seq in seqs:
        placed = IMGT.grid_string(seq, heavy=group == 'H', chain_hint=group)
        if placed is None:
            continue
        grid = np.asarray(list(placed['grid']))
        scores = G.v_gene_scores(grid, group)
        if len(scores) < 2:
            continue
        ranked = sorted(scores.values(), reverse=True)
        best, second = ranked[0], ranked[1]
        # occupied FR1-FR3 slot count for the residue-equivalent margin
        heavy = group == 'H'
        fr = ~G._cdr_mask(heavy)
        fr4 = np.zeros_like(fr)
        fr4[-G._FR4_LEN[group]:] = True
        n_fr = int(((grid != '-') & fr & ~fr4).sum())
        rows.append((best, best - second, (best - second) * n_fr, n_fr))
    return rows


def summarize(rows):
    if not rows:
        return None
    margin_res = np.asarray([r[2] for r in rows])
    return {
        'n_chains': len(rows),
        'margin_residues': {
            'median': round(float(np.median(margin_res)), 2),
            'p10': round(float(np.percentile(margin_res, 10)), 2),
            'min': round(float(margin_res.min()), 2),
        },
        'frac_margin_gt_2res': round(float((margin_res > 2).mean()), 4),
        'frac_margin_gt_4res': round(float((margin_res > 4).mean()), 4),
        'mean_fr_slots': round(float(np.mean([r[3] for r in rows])), 1),
    }


def main():
    import pandas as pd
    df = pd.read_csv(HUAB348)
    out = {}
    # heavy chains: everything; light chains: split by measured type
    from hudiff_tpu.numbering.align import classify_light
    h_rows = chain_margins(df['h_seq'].tolist(), 'H')
    l_seqs = df['l_seq'].tolist()
    k_seqs = [s for s in l_seqs if classify_light(s)[0] == 'K']
    lam_seqs = [s for s in l_seqs if classify_light(s)[0] == 'L']
    out['H'] = summarize(h_rows)
    out['K'] = summarize(chain_margins(k_seqs, 'K'))
    out['L'] = summarize(chain_margins(lam_seqs, 'L'))
    # the allele-level identity bound: one representative allele per gene
    # can underreport germline FR identity by at most d/|FR| where d is the
    # within-gene allele protein distance (<=2 residues at the IMGT allele
    # scale)
    mean_fr = np.mean([v['mean_fr_slots'] for v in out.values() if v])
    out['identity_bound_pts_at_2res'] = round(2.0 / mean_fr, 4)
    print(json.dumps(out, indent=2))


if __name__ == '__main__':
    main()
