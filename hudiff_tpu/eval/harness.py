"""Evaluation harness CLI over humanization sample CSVs.

Rebuilds antibody_scripts/patent_eval.py:232-323 / humab25_eval.py and
nanobody_scripts/nano_eval.py with local metrics:

- preservation (all / vernier) vs parental mouse;
- FR / vernier mutation precision vs experimental humanized pairs;
- consensus (pseudo-germline) FR identity;
- AbNatiV VH/VHH nativeness when scorer checkpoints are provided (the
  reference shells out to the `abnativ score` CLI, nano_eval.py:92-108);
- web-service metrics (T20 / Z-score / Hu-mAb) are optional and only run
  with --web (they require egress; see eval/web.py).

Usage:
  python -m hudiff_tpu.eval.harness ab --sample-csv sample.csv \
      --pair-csv humanization_pair_data_filter.csv
  python -m hudiff_tpu.eval.harness nano --sample-csv sample.csv \
      [--abnativ-vh vh.ckpt --abnativ-vhh vhh.ckpt]
"""
from __future__ import annotations

import argparse
import json
import os
from typing import Dict, List, Optional

import numpy as np

from .. import constants as C
from . import metrics as M


def _mean(xs: List[float]) -> Optional[float]:
    return float(np.mean(xs)) if xs else None


def eval_ab(sample_csv: str, pair_csv: str, out_path: Optional[str] = None
            ) -> Dict[str, object]:
    """Score an antibody humanization run against the paired eval set
    (mouse + experimental humanized, e.g. HuAb348 / Humab25 CSVs)."""
    import pandas as pd
    sample = pd.read_csv(sample_csv)
    human = sample[sample['Specific'] == 'humanization'].reset_index(drop=True)
    ref = pd.read_csv(pair_csv)
    mouse = ref[ref['type'] == 'mouse'].reset_index(drop=True)
    exp = ref[ref['type'] == 'humanized'].reset_index(drop=True)

    n = min(len(human), len(mouse))
    sample_pairs = [(human.iloc[i]['hseq'], human.iloc[i]['lseq'])
                    for i in range(n)]
    mouse_pairs = [(mouse.iloc[i]['h_seq'], mouse.iloc[i]['l_seq'])
                   for i in range(n)]

    report: Dict[str, object] = {'n': n}
    pres = M.group_preservation(sample_pairs, mouse_pairs)
    report['preservation_all_h'] = _mean(pres['h_all'])
    report['preservation_all_l'] = _mean(pres['l_all'])
    report['preservation_vernier_h'] = _mean(pres['h_vernier'])
    report['preservation_vernier_l'] = _mean(pres['l_vernier'])

    if len(exp) >= n:
        exp_pairs = [(exp.iloc[i]['h_seq'], exp.iloc[i]['l_seq'])
                     for i in range(n)]
        fr = M.group_mutation_precision(exp_pairs, mouse_pairs, sample_pairs)
        vr = M.group_mutation_precision(exp_pairs, mouse_pairs, sample_pairs,
                                        vernier_only=True)
        report['fr_mutation_precision_h'] = _mean(fr['h'])
        report['fr_mutation_precision_l'] = _mean(fr['l'])
        report['vernier_mutation_precision_h'] = _mean(vr['h'])
        report['vernier_mutation_precision_l'] = _mean(vr['l'])

    cons_h, cons_l = [], []
    for h_seq, l_seq in sample_pairs:
        try:
            cons_h.append(M.consensus_identity(M.GridChain(h_seq, True, 'H')))
            cons_l.append(M.consensus_identity(M.GridChain(l_seq, False)))
        except ValueError:
            continue
    report['consensus_fr_identity_h'] = _mean(cons_h)
    report['consensus_fr_identity_l'] = _mean(cons_l)

    if out_path:
        with open(out_path, 'w') as f:
            json.dump(report, f, indent=2)
    return report


def abnativ_scores_local(seqs: List[str], model_type: str, ckpt: str,
                         batch_size: int = 64) -> List[float]:
    """Whole-sequence AbNatiV nativeness via the in-framework scorer
    (replaces the `abnativ score` subprocess, nano_eval.py:92-108)."""
    import jax
    import jax.numpy as jnp
    from ..models import abnativ as AB
    from ..numbering import aho as AHO
    from ..tokenizer import aho_onehot
    from ..training import checkpoints as CKPT

    conv = AB.convert_torch_abnativ(CKPT.load_torch_checkpoint(ckpt))
    model = AB.AbNatiVModel(conv['hp'])
    apply = jax.jit(lambda x: model.apply(conv['variables'], x))

    out: List[float] = []
    aligned = []
    for s in seqs:
        a = AHO.align_aho(s, is_VHH=(model_type == 'VHH'))
        aligned.append(a)
    valid = [(i, a) for i, a in enumerate(aligned) if a is not None]
    scores = {i: float('nan') for i in range(len(seqs))}
    for s0 in range(0, len(valid), batch_size):
        chunk = valid[s0:s0 + batch_size]
        x = jnp.asarray(np.stack([aho_onehot(a) for _, a in chunk]))
        res = model.apply(conv['variables'], x)
        sc = AB.nativeness_scores_seq(res, model_type)
        for (i, _), v in zip(chunk, np.asarray(sc)):
            scores[i] = float(v)
    return [scores[i] for i in range(len(seqs))]


def eval_nano(sample_csv: str, abnativ_vh: Optional[str] = None,
              abnativ_vhh: Optional[str] = None,
              out_path: Optional[str] = None) -> Dict[str, object]:
    """Nanobody metrics (nano_eval.py:81-142): AbNatiV VH/VHH improvement vs
    the published parental means, consensus FR identity, preservation."""
    import pandas as pd
    sample = pd.read_csv(sample_csv)
    human = sample[sample['Specific'] == 'humanization'].reset_index(drop=True)
    parental = sample[sample['Specific'] == 'camel'].reset_index(drop=True)
    col = 'vhh_seq' if 'vhh_seq' in sample.columns else sample.columns[2]
    seqs = list(human[col])
    report: Dict[str, object] = {'n': len(seqs)}

    pres = []
    for i in range(min(len(human), len(parental))):
        try:
            a = M.GridChain(human.iloc[i][col], True, 'VHH')
            b = M.GridChain(parental.iloc[i][col], True, 'VHH')
            pres.append(M.all_preservation(a, b))
        except ValueError:
            continue
    report['preservation_all'] = _mean(pres)

    cons = []
    for s in seqs:
        try:
            cons.append(M.consensus_identity(M.GridChain(s, True, 'H')))
        except ValueError:
            continue
    report['consensus_fr_identity'] = _mean(cons)

    if abnativ_vh:
        vh = abnativ_scores_local(seqs, 'VH', abnativ_vh)
        report['abnativ_vh_mean'] = float(np.nanmean(vh))
        report['abnativ_vh_improvement'] = (
            report['abnativ_vh_mean'] - C.NANO_EVAL_REF_VH_SCORE)
    if abnativ_vhh:
        vhh = abnativ_scores_local(seqs, 'VHH', abnativ_vhh)
        report['abnativ_vhh_mean'] = float(np.nanmean(vhh))
        report['abnativ_vhh_delta'] = (
            report['abnativ_vhh_mean'] - C.NANO_EVAL_REF_VHH_SCORE)

    if out_path:
        with open(out_path, 'w') as f:
            json.dump(report, f, indent=2)
    return report


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    sub = p.add_subparsers(dest='cmd', required=True)
    a = sub.add_parser('ab')
    a.add_argument('--sample-csv', required=True)
    a.add_argument('--pair-csv', required=True)
    a.add_argument('--out', default=None)
    a.add_argument('--web', action='store_true',
                   help='also run T20/Z-score web evaluations (needs egress)')
    n = sub.add_parser('nano')
    n.add_argument('--sample-csv', required=True)
    n.add_argument('--abnativ-vh', default=None)
    n.add_argument('--abnativ-vhh', default=None)
    n.add_argument('--out', default=None)
    args = p.parse_args(argv)
    if args.cmd == 'ab':
        report = eval_ab(args.sample_csv, args.pair_csv, args.out)
        if args.web:
            from . import web
            report['t20'] = web.t20_scores_from_csv(args.sample_csv)
    else:
        report = eval_nano(args.sample_csv, args.abnativ_vh, args.abnativ_vhh,
                           args.out)
    print(json.dumps(report, indent=2))
    return report


if __name__ == '__main__':
    main()
