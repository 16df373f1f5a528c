"""Run directories, logging, metrics (JSONL + optional TensorBoard).

Mirrors the reference's observability surface (utils/misc.py:10-65,
TensorBoard scalars at antibody_train.py:141-174): timestamped run dirs,
file+stream logging, per-iteration scalar metrics, a source snapshot, and
global seeding. TensorBoard is optional (JSONL is always written and is the
source of truth)."""
from __future__ import annotations

import json
import logging
import os
import random
import shutil
import time
from typing import Dict, Optional

import numpy as np


def get_new_log_dir(root: str = './logs', prefix: str = '', tag: str = '') -> str:
    fn = time.strftime('%Y_%m_%d__%H_%M_%S', time.localtime())
    if prefix:
        fn = prefix + '_' + fn
    if tag:
        fn = fn + '_' + tag
    log_dir = os.path.join(root, fn)
    os.makedirs(log_dir, exist_ok=True)
    return log_dir


def seed_all(seed: int) -> None:
    np.random.seed(seed)
    random.seed(seed)


def get_logger(name: str, log_dir: Optional[str] = None,
               log_name: str = 'log.txt') -> logging.Logger:
    logger = logging.getLogger(name)
    logger.setLevel(logging.DEBUG)
    if logger.handlers:
        return logger
    fmt = logging.Formatter('[%(asctime)s::%(name)s::%(levelname)s] %(message)s')
    sh = logging.StreamHandler()
    sh.setFormatter(fmt)
    logger.addHandler(sh)
    if log_dir is not None:
        fh = logging.FileHandler(os.path.join(log_dir, log_name))
        fh.setFormatter(fmt)
        logger.addHandler(fh)
    return logger


def snapshot_source(log_dir: str, package_root: Optional[str] = None) -> None:
    """Copy the framework source into the run dir (reference self-copies its
    scripts, antibody_train.py:369-371)."""
    import hudiff_tpu
    src = package_root or os.path.dirname(hudiff_tpu.__file__)
    dst = os.path.join(log_dir, 'src_snapshot', 'hudiff_tpu')
    if not os.path.exists(dst):
        shutil.copytree(src, dst, ignore=shutil.ignore_patterns('__pycache__'))


class MetricsWriter:
    """JSONL scalar writer; mirrors scalars to TensorBoard if available."""

    def __init__(self, log_dir: str, filename: str = 'metrics.jsonl'):
        self.path = os.path.join(log_dir, filename)
        self._f = open(self.path, 'a')
        self._tb = None
        try:
            from torch.utils.tensorboard import SummaryWriter
            self._tb = SummaryWriter(os.path.join(log_dir, 'tb'))
        except Exception:
            pass

    def write(self, step: int, scalars: Dict[str, float], prefix: str = '') -> None:
        row = {'step': int(step)}
        for k, v in scalars.items():
            key = f'{prefix}/{k}' if prefix else k
            row[key] = float(v)
            if self._tb is not None:
                self._tb.add_scalar(key, float(v), int(step))
        self._f.write(json.dumps(row) + '\n')
        self._f.flush()
        if self._tb is not None:
            self._tb.flush()

    def close(self) -> None:
        self._f.close()
        if self._tb is not None:
            self._tb.close()


def count_parameters(params) -> int:
    import jax
    return sum(int(np.prod(x.shape)) for x in jax.tree_util.tree_leaves(params))
