"""Evaluation plots: ROC/PR curves, score distributions, preservation
scatter. Rebuilds the plotting surface of utils/evaluation.py:13-381.
Matplotlib is optional; every function raises a clear error if unavailable.
"""
from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import numpy as np


def _plt():
    try:
        import matplotlib
        matplotlib.use('Agg')
        import matplotlib.pyplot as plt
        return plt
    except ImportError as e:
        raise RuntimeError('matplotlib not available for plotting') from e


def roc_curve_plot(y_true: Sequence[int], scores: Sequence[float],
                   path: str, label: str = 'model') -> float:
    """ROC curve + AUC (utils/evaluation.py ROC plots)."""
    from sklearn.metrics import auc, roc_curve
    fpr, tpr, _ = roc_curve(y_true, scores)
    a = auc(fpr, tpr)
    plt = _plt()
    fig, ax = plt.subplots(figsize=(5, 5))
    ax.plot(fpr, tpr, label=f'{label} (AUC={a:.3f})')
    ax.plot([0, 1], [0, 1], '--', color='grey')
    ax.set_xlabel('FPR')
    ax.set_ylabel('TPR')
    ax.legend()
    fig.savefig(path, dpi=150, bbox_inches='tight')
    plt.close(fig)
    return float(a)


def pr_curve_plot(y_true: Sequence[int], scores: Sequence[float],
                  path: str, label: str = 'model') -> float:
    from sklearn.metrics import average_precision_score, precision_recall_curve
    prec, rec, _ = precision_recall_curve(y_true, scores)
    ap = average_precision_score(y_true, scores)
    plt = _plt()
    fig, ax = plt.subplots(figsize=(5, 5))
    ax.plot(rec, prec, label=f'{label} (AP={ap:.3f})')
    ax.set_xlabel('Recall')
    ax.set_ylabel('Precision')
    ax.legend()
    fig.savefig(path, dpi=150, bbox_inches='tight')
    plt.close(fig)
    return float(ap)


def score_distributions(groups: Dict[str, Sequence[float]], path: str,
                        xlabel: str = 'score') -> None:
    """Overlaid histograms per group (e.g. mouse vs humanized T20/AbNatiV)."""
    plt = _plt()
    fig, ax = plt.subplots(figsize=(6, 4))
    for name, vals in groups.items():
        vals = np.asarray([v for v in vals if np.isfinite(v)])
        if len(vals) == 0:
            continue
        ax.hist(vals, bins=30, alpha=0.5, label=f'{name} (n={len(vals)})',
                density=True)
    ax.set_xlabel(xlabel)
    ax.set_ylabel('density')
    ax.legend()
    fig.savefig(path, dpi=150, bbox_inches='tight')
    plt.close(fig)


def abnativ_profile(res_scores: Sequence[float], seq: str, path: str,
                    name: str = '', model_type: str = 'VH') -> None:
    """Per-position AbNatiV residue score profile with CDR shading
    (abnativ_scoring.plot_abnativ_profile, :31-58)."""
    from .. import constants as C
    plt = _plt()
    fig, ax = plt.subplots(figsize=(16, 4))
    ax.plot(res_scores, linewidth=2, color='darkorange', label=name)
    cdr = np.asarray(C.AHO_CDR_INDEX)
    for v in (1, 2, 3):
        cols = np.nonzero(cdr == v)[0]
        if len(cols):
            ax.axvspan(cols[0], cols[-1], alpha=0.08, color='forestgreen')
    ax.set_ylabel(f'AbNatiV {model_type} residue score')
    ax.set_xlabel('AHo position')
    if name:
        ax.legend()
    fig.savefig(path, dpi=150, bbox_inches='tight')
    plt.close(fig)
