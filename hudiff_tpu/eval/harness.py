"""Evaluation harness CLI over humanization sample CSVs.

Rebuilds antibody_scripts/patent_eval.py:232-323 / humab25_eval.py and
nanobody_scripts/nano_eval.py:

- sample rows are paired to their parental mouse / experimental humanized
  rows BY NAME (the sample CSV carries ``{name}human_sample``), so multiple
  samples per antibody (--sample-number > 1) and skipped antibodies never
  misalign the metrics;
- preservation (all / vernier) vs parental mouse, for both the samples and
  the experimental pairs;
- FR / vernier mutation precision vs experimental humanized pairs;
- consensus (pseudo-germline) FR identity;
- AbNatiV nativeness + improvement vs the parental mouse when scorer
  checkpoints are provided (the reference shells out to the `abnativ score`
  CLI, nano_eval.py:92-108) — batched through the native aligner and a
  jitted scorer;
- OASis identity via the BioPhi subprocess when available
  (patent_eval.py:258-277);
- web-service metrics (T20 / Z-score) are optional and only run with --web
  (they require egress; see eval/web.py). T20 improvement vs mouse uses a
  precomputed mouse T20 CSV when given (HuAb348 ships
  sample_t20_mouse_score.csv).

Usage:
  python -m hudiff_tpu.eval.harness ab --sample-csv sample.csv \
      --pair-csv humanization_pair_data_filter.csv
  python -m hudiff_tpu.eval.harness nano --sample-csv sample.csv \
      [--abnativ-vh vh.ckpt --abnativ-vhh vhh.ckpt]
"""
from __future__ import annotations

import argparse
import functools
import json
import os
from typing import Dict, List, Optional, Tuple

import numpy as np

from .. import constants as C
from . import metrics as M

SAMPLE_SUFFIX = 'human_sample'


def _mean(xs: List[float]) -> Optional[float]:
    return float(np.mean(xs)) if xs else None


def _parental_key(sample_name: str) -> str:
    """'{name}human_sample' -> '{name}' (humanize CLI row naming)."""
    if sample_name.endswith(SAMPLE_SUFFIX):
        return sample_name[: -len(SAMPLE_SUFFIX)]
    return sample_name


def _pairs_by_name(df, h_col: str = 'h_seq', l_col: str = 'l_seq'
                   ) -> Dict[str, Tuple[str, str]]:
    return {str(r['name']): (r[h_col], r[l_col]) for _, r in df.iterrows()}


def _exp_by_mouse_name(mouse_df, exp_df
                       ) -> Tuple[Dict[str, Tuple[str, str]], str]:
    """Map parental mouse name -> experimental humanized pair.

    The HuAb348 CSV links the groups by ``order_name`` ('0_mouse' /
    '0_humanized'); fall back to positional pairing otherwise (the
    reference pairs purely by position, patent_eval.py:288-291) — but
    loudly, since positional pairing misaligns every metric as soon as
    one row is skipped. Returns ``(mapping, pairing_mode)``."""
    out: Dict[str, Tuple[str, str]] = {}
    if 'order_name' in mouse_df.columns and 'order_name' in exp_df.columns:
        exp_by_order = {str(r['order_name']).split('_')[0]:
                        (r['h_seq'], r['l_seq']) for _, r in exp_df.iterrows()}
        for _, r in mouse_df.iterrows():
            order = str(r['order_name']).split('_')[0]
            if order in exp_by_order:
                out[str(r['name'])] = exp_by_order[order]
        return out, 'order_name'
    # putative_data/humanization_pair152.csv layout: no order_name, but the
    # mouse and humanized groups carry the SAME unique antibody names — pair
    # by name directly (exact, unlike the positional fallback)
    mouse_names = [str(n) for n in mouse_df['name']]
    exp_names = [str(n) for n in exp_df['name']]
    shared = set(mouse_names) & set(exp_names)
    if (shared and len(set(mouse_names)) == len(mouse_names)
            and len(set(exp_names)) == len(exp_names)):
        exp_by = {str(r['name']): (r['h_seq'], r['l_seq'])
                  for _, r in exp_df.iterrows()}
        for name in mouse_names:
            if name in exp_by:
                out[name] = exp_by[name]
        return out, 'name'
    import warnings
    warnings.warn(
        'pair CSV has no order_name column: falling back to POSITIONAL '
        'experimental pairing (row i of the mouse group <-> row i of the '
        'humanized group). Any skipped row misaligns the precision metrics; '
        'prefer an order_name column or --experimental-csv.', stacklevel=2)
    n = min(len(mouse_df), len(exp_df))
    for i in range(n):
        out[str(mouse_df.iloc[i]['name'])] = (exp_df.iloc[i]['h_seq'],
                                              exp_df.iloc[i]['l_seq'])
    return out, 'positional'


def _grid_pair(h_seq: str, l_seq: str
               ) -> Optional[Tuple[M.GridChain, M.GridChain]]:
    try:
        return M.GridChain(h_seq, True, 'H'), M.GridChain(l_seq, False)
    except ValueError:
        return None


def eval_ab(sample_csv: str, pair_csv: str, out_path: Optional[str] = None,
            abnativ_vh: Optional[str] = None,
            abnativ_vlk: Optional[str] = None,
            abnativ_vll: Optional[str] = None,
            oasis_db: Optional[str] = None,
            biophi_exec: str = 'biophi',
            parental_oasis: Optional[str] = None,
            experimental_oasis: Optional[str] = None,
            web: bool = False,
            mouse_t20_csv: Optional[str] = None,
            plots_dir: Optional[str] = None,
            experimental_csv: Optional[str] = None) -> Dict[str, object]:
    """Score an antibody humanization run against the paired eval set
    (mouse + experimental humanized, e.g. HuAb348 / Humab25 CSVs)."""
    import pandas as pd
    sample = pd.read_csv(sample_csv)
    human = sample[sample['Specific'] == 'humanization'].reset_index(drop=True)
    ref = pd.read_csv(pair_csv)
    mouse = (ref[ref['type'] == 'mouse'].reset_index(drop=True)
             if 'type' in ref.columns else ref)
    exp = (ref[ref['type'] == 'humanized'].reset_index(drop=True)
           if 'type' in ref.columns else ref.iloc[0:0])

    mouse_by_name = _pairs_by_name(mouse)
    if experimental_csv:
        # Humab25-style layout: experimental humanized pairs live in their
        # own CSV ('experimental_humanized.csv' or a t20-score CSV carrying
        # Raw_name/h_seq/l_seq), keyed to the mouse set by name
        # (reference humab25_eval.py:293-300)
        exp_df = pd.read_csv(experimental_csv)
        name_col = 'name' if 'name' in exp_df.columns else 'Raw_name'
        exp_by_name = {str(r[name_col]): (r['h_seq'], r['l_seq'])
                       for _, r in exp_df.iterrows()}
        pairing_mode = 'experimental_csv'
    else:
        exp_by_name, pairing_mode = _exp_by_mouse_name(mouse, exp)

    report: Dict[str, object] = {'n_samples': len(human),
                                 'pairing': pairing_mode}
    matched = 0
    skipped_unmatched = 0
    skipped_unaligned = 0
    pres = {'h_all': [], 'l_all': [], 'h_vernier': [], 'l_vernier': []}
    fr_prec = {'h': [], 'l': []}
    vr_prec = {'h': [], 'l': []}
    cons_h: List[float] = []
    cons_l: List[float] = []
    germ_h: List[float] = []
    germ_l: List[float] = []
    triples: List[Tuple[str, Tuple[str, str], Tuple[str, str]]] = []

    for _, row in human.iterrows():
        key = _parental_key(str(row['name']))
        if key not in mouse_by_name:
            skipped_unmatched += 1
            continue
        m_h, m_l = mouse_by_name[key]
        s_h, s_l = row['hseq'], row['lseq']
        sample_grids = _grid_pair(s_h, s_l)
        mouse_grids = _grid_pair(m_h, m_l)
        if sample_grids is None or mouse_grids is None:
            skipped_unaligned += 1
            continue
        matched += 1
        triples.append((key, (s_h, s_l), (m_h, m_l)))
        pres['h_all'].append(M.all_preservation(sample_grids[0], mouse_grids[0]))
        pres['l_all'].append(M.all_preservation(sample_grids[1], mouse_grids[1]))
        pres['h_vernier'].append(
            M.vernier_preservation(sample_grids[0], mouse_grids[0]))
        pres['l_vernier'].append(
            M.vernier_preservation(sample_grids[1], mouse_grids[1]))
        cons_h.append(M.consensus_identity(sample_grids[0]))
        cons_l.append(M.consensus_identity(sample_grids[1]))
        germ_h.append(M.germline_identity(sample_grids[0]))
        germ_l.append(M.germline_identity(sample_grids[1]))
        if key in exp_by_name:
            e_h, e_l = exp_by_name[key]
            exp_grids = _grid_pair(e_h, e_l)
            if exp_grids is not None:
                ph = M.mutation_precision(exp_grids[0], mouse_grids[0],
                                          sample_grids[0])
                pl = M.mutation_precision(exp_grids[1], mouse_grids[1],
                                          sample_grids[1])
                vh = M.mutation_precision(exp_grids[0], mouse_grids[0],
                                          sample_grids[0], vernier_only=True)
                vl = M.mutation_precision(exp_grids[1], mouse_grids[1],
                                          sample_grids[1], vernier_only=True)
                if ph is not None:
                    fr_prec['h'].append(ph)
                if pl is not None:
                    fr_prec['l'].append(pl)
                if vh is not None:
                    vr_prec['h'].append(vh)
                if vl is not None:
                    vr_prec['l'].append(vl)

    report.update({
        'n_matched': matched,
        'n_skipped_unmatched': skipped_unmatched,
        'n_skipped_unaligned': skipped_unaligned,
        'preservation_all_h': _mean(pres['h_all']),
        'preservation_all_l': _mean(pres['l_all']),
        'preservation_vernier_h': _mean(pres['h_vernier']),
        'preservation_vernier_l': _mean(pres['l_vernier']),
        'fr_mutation_precision_h': _mean(fr_prec['h']),
        'fr_mutation_precision_l': _mean(fr_prec['l']),
        'vernier_mutation_precision_h': _mean(vr_prec['h']),
        'vernier_mutation_precision_l': _mean(vr_prec['l']),
        'consensus_fr_identity_h': _mean(cons_h),
        'consensus_fr_identity_l': _mean(cons_l),
        'germline_fr_identity_h': _mean(germ_h),
        'germline_fr_identity_l': _mean(germ_l),
    })

    # experimental-vs-mouse context aggregates (the reference logs these
    # alongside the sample numbers, patent_eval.py:293-298)
    exp_pres_h, exp_pres_l = [], []
    for name, epair in exp_by_name.items():
        if name not in mouse_by_name:
            continue
        eg = _grid_pair(*epair)
        mg = _grid_pair(*mouse_by_name[name])
        if eg is None or mg is None:
            continue
        exp_pres_h.append(M.all_preservation(eg[0], mg[0]))
        exp_pres_l.append(M.all_preservation(eg[1], mg[1]))
    report['exp_preservation_all_h'] = _mean(exp_pres_h)
    report['exp_preservation_all_l'] = _mean(exp_pres_l)

    # AbNatiV improvement vs the parental mouse (always-local equivalent of
    # the reference's web-scraped T20 improvement)
    if abnativ_vh and triples:
        s_scores = abnativ_scores_local([t[1][0] for t in triples], 'VH',
                                        abnativ_vh)
        m_scores = abnativ_scores_local([t[2][0] for t in triples], 'VH',
                                        abnativ_vh)
        report['abnativ_vh_mean'] = float(np.nanmean(s_scores))
        report['abnativ_vh_improvement'] = float(
            np.nanmean(s_scores) - np.nanmean(m_scores))
    if (abnativ_vlk or abnativ_vll) and triples:
        from ..numbering import align as AL
        imp = []
        means = []
        for _, (s_h, s_l), (m_h, m_l) in triples:
            try:
                group, margin = AL.classify_light(s_l)
            except ValueError:
                continue
            AL.warn_ambiguous_light(group, margin,
                                    context='selects the AbNatiV scorer')
            ckpt = abnativ_vlk if group == 'K' else abnativ_vll
            mtype = 'VKappa' if group == 'K' else 'VLambda'
            if not ckpt:
                continue
            sv = abnativ_scores_local([s_l], mtype, ckpt)[0]
            mv = abnativ_scores_local([m_l], mtype, ckpt)[0]
            if np.isfinite(sv):
                means.append(sv)
            if np.isfinite(sv) and np.isfinite(mv):
                imp.append(sv - mv)
        report['abnativ_vl_mean'] = _mean(means)
        report['abnativ_vl_improvement'] = _mean(imp)

    # OASis identity (BioPhi subprocess; optional external tool)
    if oasis_db:
        from . import biophi as BP
        base = os.path.dirname(os.path.abspath(sample_csv))
        fasta = os.path.join(base, 'sample_identity.fa')
        if not os.path.exists(fasta):
            BP.sample_csv_to_fasta(sample_csv, fasta)
        xlsx = BP.run_oasis(fasta, oasis_db,
                            os.path.join(base, 'sample_identity_oasis.xlsx'),
                            exec_path=biophi_exec)
        if xlsx:
            report['oasis_median_identity'] = BP.oasis_curve_mean(xlsx)
            if parental_oasis and os.path.exists(parental_oasis):
                mouse_mean = BP.oasis_curve_mean(parental_oasis)
                report['oasis_median_improvement'] = (
                    report['oasis_median_identity'] - mouse_mean)
                if experimental_oasis and os.path.exists(experimental_oasis):
                    report['exp_oasis_median_improvement'] = (
                        BP.oasis_curve_mean(experimental_oasis) - mouse_mean)
        else:
            report['oasis_median_identity'] = None  # biophi unavailable

    # T20 web battery (egress required; fail soft)
    if web:
        from . import web as W
        try:
            t20_path = W.t20_csv(sample_csv)
            t20 = pd.read_csv(t20_path)
            report['t20_h_mean'] = float(t20['h_score'].mean())
            report['t20_l_mean'] = float(t20['l_score'].mean())
            if mouse_t20_csv and os.path.exists(mouse_t20_csv):
                mt = pd.read_csv(mouse_t20_csv)
                report['t20_h_improvement'] = (
                    report['t20_h_mean'] - float(mt['h_score'].mean()))
                report['t20_l_improvement'] = (
                    report['t20_l_mean'] - float(mt['l_score'].mean()))
        except W.WebEvalUnavailable as e:
            report['t20_error'] = str(e)

    if plots_dir:
        _write_ab_plots(plots_dir, triples, exp_by_name, pres, report)

    if out_path:
        with open(out_path, 'w') as f:
            json.dump(report, f, indent=2)
    return report


def _write_ab_plots(plots_dir: str, triples, exp_by_name, pres,
                    report: Dict[str, object]) -> None:
    """Figure battery for an antibody eval run (the reference produces these
    from notebooks over utils/evaluation.py; here they hang off the harness):
    preservation distributions, mutation-overlap venns vs the experimental
    humanization, and a position-level conservation table."""
    from . import metrics as M
    from . import plots as P
    os.makedirs(plots_dir, exist_ok=True)
    P.score_distributions(
        {'H all': pres['h_all'], 'L all': pres['l_all'],
         'H vernier': pres['h_vernier'], 'L vernier': pres['l_vernier']},
        os.path.join(plots_dir, 'preservation_dist.png'),
        xlabel='preservation vs parental')

    with_exp = [(name, spair, mpair, exp_by_name[name])
                for name, spair, mpair in triples if name in exp_by_name]
    if with_exp:
        rows = P.overlap_table([t[2] for t in with_exp],
                               [t[3] for t in with_exp],
                               [t[1] for t in with_exp],
                               names=[t[0] for t in with_exp])
        if rows:
            P.plot_overlap(rows, os.path.join(plots_dir, 'overlap_mean.png'))
            P.plot_overlap_venns(
                rows, os.path.join(plots_dir, 'overlap_venns.png'))
            report['overlap_shared_mean'] = float(
                np.mean([r['Shared'] for r in rows]))

    # position-level conservation vs the parental germline graft
    # (utils/evaluation.py collect_positions)
    rows = []
    for name, (s_h, s_l), (m_h, m_l) in triples:
        try:
            rows += M.collect_positions(M.GridChain(m_h, True, 'H'),
                                        M.GridChain(s_h, True, 'H'), name)
            rows += M.collect_positions(M.GridChain(m_l, False),
                                        M.GridChain(s_l, False), name)
        except ValueError:
            continue
    if rows:
        import csv
        path = os.path.join(plots_dir, 'conservation_positions.csv')
        with open(path, 'w', newline='') as f:
            w = csv.DictWriter(f, fieldnames=list(rows[0].keys()))
            w.writeheader()
            w.writerows(rows)


_ABNATIV_CACHE: Dict[str, tuple] = {}


def abnativ_scores_local(seqs: List[str], model_type: str, ckpt: str,
                         batch_size: int = 64) -> List[float]:
    """Whole-sequence AbNatiV nativeness via the in-framework scorer
    (replaces the `abnativ score` subprocess, nano_eval.py:92-108).

    AHo alignment goes through the batched native aligner; scoring through a
    single jitted apply at a fixed batch shape (the tail batch is padded),
    so N sequences cost one alignment crossing + ceil(N/B) device calls.
    """
    import jax.numpy as jnp

    from ..models import abnativ as AB
    from ..numbering import aho as AHO
    from ..numbering import align as AL
    from ..tokenizer import aho_onehot

    if ckpt not in _ABNATIV_CACHE:
        import jax

        from ..training import checkpoints as CKPT
        conv = AB.convert_torch_abnativ(CKPT.load_torch_checkpoint(ckpt))
        model = AB.AbNatiVModel(conv['hp'])
        # variables as a jit argument, not a closure capture — closed-over
        # arrays embed as HLO constants and bloat compile time; committed
        # to the device once (the converter returns a host numpy tree,
        # which as a jit argument would re-upload per batch)
        variables = jax.device_put(conv['variables'])
        _apply = jax.jit(lambda v, x: model.apply(v, x))
        apply = functools.partial(_apply, variables)
        _ABNATIV_CACHE[ckpt] = (model, conv, apply)
    _, _, apply = _ABNATIV_CACHE[ckpt]

    # batched AHo alignment (ANARCI per-seq when present, else one native
    # batch crossing)
    profile = {'VH': 'H', 'VHH': 'VHH', 'VKappa': 'K',
               'VLambda': 'L'}[model_type]
    try:
        import anarci  # type: ignore  # noqa: F401
        has_anarci = True
    except ImportError:
        has_anarci = False
    if has_anarci:  # pragma: no cover - external binary
        aligned = [AHO.align_aho(s, is_VHH=(model_type == 'VHH')) for s in seqs]
    else:
        aligned = [r[0] if r is not None else None
                   for r in AL.align_to_aho_batch(seqs, profile)]

    valid = [(i, a) for i, a in enumerate(aligned) if a is not None]
    scores = {i: float('nan') for i in range(len(seqs))}
    for s0 in range(0, len(valid), batch_size):
        chunk = valid[s0:s0 + batch_size]
        x = np.stack([aho_onehot(a) for _, a in chunk])
        n = x.shape[0]
        if n < batch_size:  # pad the tail so the jit signature is stable
            x = np.concatenate(
                [x, np.repeat(x[:1], batch_size - n, axis=0)], axis=0)
        res = apply(jnp.asarray(x))
        sc = np.asarray(AB.nativeness_scores_seq(res, model_type))[:n]
        for (i, _), v in zip(chunk, sc):
            scores[i] = float(v)
    return [scores[i] for i in range(len(seqs))]


def eval_nano(sample_csv: str, abnativ_vh: Optional[str] = None,
              abnativ_vhh: Optional[str] = None,
              out_path: Optional[str] = None,
              web: bool = False) -> Dict[str, object]:
    """Nanobody metrics (nano_eval.py:81-142): AbNatiV VH/VHH improvement vs
    the published parental means, consensus FR identity, preservation.
    Sample rows pair to parentals by name."""
    import pandas as pd
    sample = pd.read_csv(sample_csv)
    human = sample[sample['Specific'] == 'humanization'].reset_index(drop=True)
    parental = sample[sample['Specific'] == 'camel'].reset_index(drop=True)
    col = 'vhh_seq' if 'vhh_seq' in sample.columns else sample.columns[2]
    parental_by_name = {str(r['name']): r[col] for _, r in parental.iterrows()}

    seqs = list(human[col])
    report: Dict[str, object] = {'n_samples': len(seqs)}

    pres = []
    matched = 0
    for _, row in human.iterrows():
        key = _parental_key(str(row['name']))
        par = parental_by_name.get(key)
        if par is None:
            continue
        try:
            a = M.GridChain(row[col], True, 'VHH')
            b = M.GridChain(par, True, 'VHH')
        except ValueError:
            continue
        matched += 1
        pres.append(M.all_preservation(a, b))
    report['n_matched'] = matched
    report['preservation_all'] = _mean(pres)

    cons = []
    germ = []
    for s in seqs:
        try:
            cons.append(M.consensus_identity(M.GridChain(s, True, 'H')))
            germ.append(M.germline_identity(M.GridChain(s, True, 'H')))
        except ValueError:
            continue
    report['consensus_fr_identity'] = _mean(cons)
    report['germline_fr_identity'] = _mean(germ)

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

    if web:
        from . import web as W
        try:
            t20_path = W.t20_frame_csv(sample_csv)
            import pandas as pd
            t20 = pd.read_csv(t20_path)
            report['t20_frame_mean'] = float(t20['h_score'].mean())
        except W.WebEvalUnavailable as e:
            report['t20_error'] = str(e)

    if out_path:
        with open(out_path, 'w') as f:
            json.dump(report, f, indent=2)
    return report


def main(argv=None):
    # persistent XLA compile cache: repeat CLI runs skip the multi-minute
    # compiles on remote/tunneled backends (utils/compile_cache.py)
    from hudiff_tpu.utils.compile_cache import enable_compile_cache
    enable_compile_cache()
    p = argparse.ArgumentParser(description=__doc__)
    sub = p.add_subparsers(dest='cmd', required=True)
    a = sub.add_parser('ab')
    a.add_argument('--sample-csv', required=True)
    a.add_argument('--pair-csv', required=True)
    a.add_argument('--out', default=None)
    a.add_argument('--abnativ-vh', default=None)
    a.add_argument('--abnativ-vlk', default=None)
    a.add_argument('--abnativ-vll', default=None)
    a.add_argument('--oasis-db', default=None,
                   help='OASis 9-mer DB path; runs the biophi subprocess '
                        'when the executable exists')
    a.add_argument('--biophi-exec', default='biophi')
    a.add_argument('--parental-oasis', default=None,
                   help='precomputed parental OASis xlsx (improvement base)')
    a.add_argument('--experimental-oasis', default=None)
    a.add_argument('--experimental-csv', default=None,
                   help='separate experimental-humanized CSV (Humab25 '
                        'layout: name/Raw_name + h_seq/l_seq), keyed to the '
                        'mouse set by name')
    a.add_argument('--mouse-t20-csv', default=None,
                   help='precomputed mouse T20 CSV (improvement base)')
    a.add_argument('--web', action='store_true',
                   help='also run T20/Z-score web evaluations (needs egress)')
    a.add_argument('--plots', default=None, metavar='DIR',
                   help='write the figure battery (preservation dists, '
                        'mutation-overlap venns, conservation-position CSV) '
                        'into DIR')
    n = sub.add_parser('nano')
    n.add_argument('--sample-csv', required=True)
    n.add_argument('--abnativ-vh', default=None)
    n.add_argument('--abnativ-vhh', default=None)
    n.add_argument('--web', action='store_true')
    n.add_argument('--out', default=None)
    args = p.parse_args(argv)
    if args.cmd == 'ab':
        report = eval_ab(args.sample_csv, args.pair_csv, args.out,
                         abnativ_vh=args.abnativ_vh,
                         abnativ_vlk=args.abnativ_vlk,
                         abnativ_vll=args.abnativ_vll,
                         oasis_db=args.oasis_db,
                         biophi_exec=args.biophi_exec,
                         parental_oasis=args.parental_oasis,
                         experimental_oasis=args.experimental_oasis,
                         web=args.web,
                         mouse_t20_csv=args.mouse_t20_csv,
                         plots_dir=args.plots,
                         experimental_csv=args.experimental_csv)
    else:
        report = eval_nano(args.sample_csv, args.abnativ_vh, args.abnativ_vhh,
                           args.out, web=args.web)
    print(json.dumps(report, indent=2))
    return report


if __name__ == '__main__':
    main()
