"""ctypes bridge to the native NW aligner kernel (csrc/aligner.cc)."""
from __future__ import annotations

from typing import List, Optional, Tuple

import numpy as np

from ..native import load


def align(q_idx: List[int], score_mat: np.ndarray, skip_cost: np.ndarray
          ) -> Tuple[Optional[List[int]], float]:
    """Returns (cols [m] query-index-per-column or None, score).

    Raises ImportError when the native library is not built (callers fall
    back to the numpy DP).
    """
    lib = load()
    if lib is None:
        raise ImportError('native aligner not built (make -C csrc)')
    q = np.asarray(q_idx, dtype=np.int32)
    m = score_mat.shape[0]
    score32 = np.ascontiguousarray(score_mat, dtype=np.float32)
    skip32 = np.ascontiguousarray(skip_cost, dtype=np.float32)
    out_cols = np.empty(m, dtype=np.int32)
    out_score = np.empty(1, dtype=np.float32)
    rc = lib.hd_align(
        q.ctypes.data_as(__import__('ctypes').c_void_p), len(q),
        score32.ctypes.data_as(__import__('ctypes').c_void_p),
        skip32.ctypes.data_as(__import__('ctypes').c_void_p), m,
        out_cols.ctypes.data_as(__import__('ctypes').c_void_p),
        out_score.ctypes.data_as(__import__('ctypes').c_void_p))
    if rc != 0:
        return None, float('-inf')
    return out_cols.tolist(), float(out_score[0])


def align_batch(queries: List[List[int]], score_mat: np.ndarray,
                skip_cost: np.ndarray
                ) -> List[Tuple[Optional[List[int]], float]]:
    """Batched variant over ``hd_align_batch`` (csrc/aligner.cc:73-88): one
    ctypes crossing for N queries (eval-set-scale scoring)."""
    import ctypes

    lib = load()
    if lib is None:
        raise ImportError('native aligner not built (make -C csrc)')
    nb = len(queries)
    m = score_mat.shape[0]
    if nb == 0:
        return []
    max_n = max(len(q) for q in queries)
    q = np.full((nb, max_n), -2, dtype=np.int32)
    lens = np.empty(nb, dtype=np.int32)
    for i, qi in enumerate(queries):
        q[i, : len(qi)] = qi
        lens[i] = len(qi)
    score32 = np.ascontiguousarray(score_mat, dtype=np.float32)
    skip32 = np.ascontiguousarray(skip_cost, dtype=np.float32)
    out_cols = np.empty((nb, m), dtype=np.int32)
    out_scores = np.empty(nb, dtype=np.float32)
    lib.hd_align_batch(
        q.ctypes.data_as(ctypes.c_void_p),
        lens.ctypes.data_as(ctypes.c_void_p),
        ctypes.c_int32(nb), ctypes.c_int32(max_n),
        score32.ctypes.data_as(ctypes.c_void_p),
        skip32.ctypes.data_as(ctypes.c_void_p), ctypes.c_int32(m),
        out_cols.ctypes.data_as(ctypes.c_void_p),
        out_scores.ctypes.data_as(ctypes.c_void_p))
    out = []
    for i in range(nb):
        # per-item failures are marked with kNegInf = -1e30 (aligner.cc:15,83)
        if out_scores[i] <= -5e29:
            out.append((None, float('-inf')))
        else:
            out.append((out_cols[i].tolist(), float(out_scores[i])))
    return out
