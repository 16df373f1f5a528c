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
