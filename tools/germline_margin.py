"""Germline-breadth sensitivity study (round-3 missing #2, round-4 next #2).

The reference grafts against abnumber's full IMGT allele database
(antibody_scripts/sample.py:370-376, patent_eval.py:203-213); this repo
embeds a curated library (numbering/germline.py) of one-or-more alleles per
functional gene, extensible at runtime from an IMGT fasta
(extend_library_from_fasta). This study MEASURES, on every HuAb348 chain
(348 mouse + 348 experimentally humanized pairs, H and L), what library
breadth costs and what the round-5 allele additions bought:

1. **Gene selection margins** (gene-grouped: max over each gene's alleles):
   the distribution of the best-vs-second-GENE FR-identity margin in residue
   equivalents over the ~80 occupied FR1-FR3 slots, and the fraction of
   chains whose margin exceeds 2 and 4 residues. Nearest-gene choice can
   flip only if the runner-up trails by less than the allele-level wiggle
   of genes still represented by one allele (<= ~2 residues at the IMGT
   allele scale).
2. **Before/after the round-5 additions** (IGHV3-23*04, IGKV3D-20*01,
   IGKV2D-29*01, IGLV2-14*03): per-chain identity gain (measured, not
   bounded), winner-gene flip count, and the margin stats recomputed
   against the round-4 one-allele-per-gene library.
3. **Residual identity bound**: for the fraction of chains whose winning
   gene now carries >=2 library alleles, the representative-allele
   underreport is measured (the gain); for the rest it remains bounded by
   (within-gene allele distance)/|FR| ~= 2/80 ~= 2.5 identity points.

Output: one JSON with per-group numbers; pinned by
tests/test_germline_margin.py and quoted in numbering/germline.py.

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

# alleles added in round 5 on top of the round-4 one-allele-per-gene
# library; excluding them reproduces the round-4 "before" measurement
ADDED_R5 = frozenset({'IGHV3-23*04', 'IGKV3D-20*01', 'IGKV2D-29*01',
                      'IGLV2-14*03'})


def _gene_scores(allele_scores, exclude=frozenset()):
    # one grouping rule, owned by the library (review: no second copy)
    from hudiff_tpu.numbering import germline as G
    return G.group_allele_scores(allele_scores, exclude=exclude)


def _top2(scores):
    ranked = sorted(scores.items(), key=lambda kv: -kv[1])
    return ranked[0], ranked[1]


def chain_rows(seqs, group):
    """Per-chain measurement record: gene-grouped margins after (full
    library) and before (round-4 library), the winner flip, and the
    measured identity gain from the added alleles."""
    from hudiff_tpu.numbering import germline as G
    from hudiff_tpu.numbering import imgt as IMGT

    rows = []
    for seq in seqs:
        placed = IMGT.grid_string(seq, heavy=group == 'H', chain_hint=group)
        if placed is None:
            continue
        grid = np.asarray(list(placed['grid']))
        allele_scores = G.v_gene_scores(grid, group)
        after = _gene_scores(allele_scores)
        before = _gene_scores(allele_scores, exclude=ADDED_R5)
        if len(after) < 2:
            continue
        heavy = group == 'H'
        fr = ~G._cdr_mask(heavy)
        fr4 = np.zeros_like(fr)
        fr4[-G._FR4_LEN[group]:] = True
        n_fr = int(((grid != '-') & fr & ~fr4).sum())
        (w_a, s_a), (_, s2_a) = _top2(after)
        (w_b, s_b), (_, s2_b) = _top2(before)
        multi = len([a for a in allele_scores
                     if G.gene_of(a) == w_a]) >= 2
        rows.append({
            'margin_res_after': (s_a - s2_a) * n_fr,
            'margin_res_before': (s_b - s2_b) * n_fr,
            'gain_pts': s_a - s_b,           # measured allele-breadth gain
            'flip': w_a != w_b,              # winner GENE changed
            'winner_multiallele': multi,     # winner covered by >=2 alleles
            'n_fr': n_fr,
        })
    return rows


def summarize(rows):
    if not rows:
        return None
    m_after = np.asarray([r['margin_res_after'] for r in rows])
    m_before = np.asarray([r['margin_res_before'] for r in rows])
    gain = np.asarray([r['gain_pts'] for r in rows])
    return {
        'n_chains': len(rows),
        'margin_residues': {
            'median': round(float(np.median(m_after)), 2),
            'p10': round(float(np.percentile(m_after, 10)), 2),
            'min': round(float(m_after.min()), 2),
        },
        'frac_margin_gt_2res': round(float((m_after > 2).mean()), 4),
        'frac_margin_gt_4res': round(float((m_after > 4).mean()), 4),
        'mean_fr_slots': round(float(np.mean([r['n_fr'] for r in rows])), 1),
        'before_r5': {
            'frac_margin_gt_2res': round(float((m_before > 2).mean()), 4),
            'median_margin_res': round(float(np.median(m_before)), 2),
        },
        'r5_alleles': {
            'winner_flips': int(sum(r['flip'] for r in rows)),
            'frac_winner_multiallele': round(
                float(np.mean([r['winner_multiallele'] for r in rows])), 4),
            'identity_gain_pts': {
                'mean': round(float(gain.mean()), 5),
                'max': round(float(gain.max()), 5),
                'frac_gained': round(float((gain > 0).mean()), 4),
            },
        },
    }


def main():
    import pandas as pd
    df = pd.read_csv(HUAB348)
    out = {}
    from hudiff_tpu.numbering.align import classify_light
    l_seqs = df['l_seq'].tolist()
    k_seqs = [s for s in l_seqs if classify_light(s)[0] == 'K']
    lam_seqs = [s for s in l_seqs if classify_light(s)[0] == 'L']
    out['H'] = summarize(chain_rows(df['h_seq'].tolist(), 'H'))
    out['K'] = summarize(chain_rows(k_seqs, 'K'))
    out['L'] = summarize(chain_rows(lam_seqs, 'L'))
    # residual bound for genes still at one library allele: one
    # representative allele can underreport germline FR identity by at most
    # d/|FR| where d is the within-gene allele protein distance (<=2
    # residues at the IMGT allele scale). Chains whose winner carries >=2
    # alleles have the gain MEASURED above instead of bounded.
    groups = [out[g] for g in ('H', 'K', 'L') if out.get(g)]
    mean_fr = np.mean([v['mean_fr_slots'] for v in groups])
    out['identity_bound_pts_at_2res'] = round(2.0 / mean_fr, 4)
    covered = [v['r5_alleles']['frac_winner_multiallele'] * v['n_chains']
               for v in groups]
    total = sum(v['n_chains'] for v in groups)
    out['frac_chains_winner_multiallele'] = round(sum(covered) / total, 4)
    print(json.dumps(out, indent=2))


if __name__ == '__main__':
    main()
