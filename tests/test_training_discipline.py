"""Validation/scheduler/resume discipline tests.

The reference selects checkpoints by FULL validation-split loss
(antibody_train.py:179-307) and persists scheduler state in the checkpoint
(antibody_train.py:438-445); these tests pin the rebuilt equivalents.
"""
import glob
import json
import os

import pytest

from hudiff_tpu.training import schedules
from hudiff_tpu.training import train_step as T
from hudiff_tpu.utils.config import load_yaml

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


# ---------------------------------------------------------------------------
# Schedules
# ---------------------------------------------------------------------------

def test_gradual_warmup_ramp_then_plateau():
    """multiplier=10/total_epoch=10 ramps linearly to 10x base lr, then the
    plateau logic takes over (reference utils/warmup.py:28-88)."""
    s = schedules.ReduceOnPlateau(init_lr=1e-4, factor=0.5, patience=1,
                                  warmup_multiplier=10.0, warmup_epochs=10)
    lrs = [s.update(1.0) for _ in range(10)]
    # linear ramp: epoch e gives 1 + 9*e/10 multiplier
    assert lrs[0] == pytest.approx(1e-4 * 1.9)
    assert lrs[4] == pytest.approx(1e-4 * 5.5)
    assert lrs[9] == pytest.approx(1e-3)
    # handoff: plateau starts from 10x lr; patience=1 -> decay after 2 bad
    assert s.update(0.5) == pytest.approx(1e-3)   # improvement
    assert s.update(0.6) == pytest.approx(1e-3)   # bad 1
    assert s.update(0.6) == pytest.approx(5e-4)   # bad 2 > patience -> decay
    # warmup never runs again
    assert s.update(0.4) == pytest.approx(5e-4)


def test_train_configs_carry_warmup_keys():
    """The shipped train configs must keep the reference's GradualWarmup keys
    (configs/antibody_train.yml:46-48: multiplier 10, total_epoch 10)."""
    ab = load_yaml(os.path.join(REPO, 'configs/antibody_train.yml'))
    nb = load_yaml(os.path.join(REPO, 'configs/heavy_train.yml'))
    for cfg, epochs in ((ab, 10), (nb, 20)):
        sched = schedules.make_host_scheduler(cfg.train.scheduler,
                                              init_lr=cfg.train.optimizer.lr)
        assert sched.warmup_multiplier == 10
        assert sched.warmup_epochs == epochs


def test_scheduler_state_roundtrip():
    a = schedules.ReduceOnPlateau(init_lr=1e-4, factor=0.5, patience=2,
                                  warmup_multiplier=10.0, warmup_epochs=3)
    for v in (1.0, 0.9, 0.8, 0.7, 0.9, 0.9):
        a.update(v)
    b = schedules.ReduceOnPlateau(init_lr=1e-4, factor=0.5, patience=2,
                                  warmup_multiplier=10.0, warmup_epochs=3)
    b.load_state_dict(json.loads(json.dumps(a.state_dict())))
    # identical continuation
    for v in (0.95, 0.95, 0.95, 0.6):
        assert a.update(v) == b.update(v)
    assert a.best == b.best and a.bad == b.bad and a.epoch == b.epoch


def test_cosine_state_roundtrip():
    a = schedules.CosineAnnealing(init_lr=1e-3, t_max=7)
    for _ in range(3):
        a.update(0.0)
    b = schedules.CosineAnnealing(init_lr=1e-3, t_max=7)
    b.load_state_dict(a.state_dict())
    for _ in range(5):
        assert a.update(0.0) == b.update(0.0)


# ---------------------------------------------------------------------------
# Full-split evaluation helper
# ---------------------------------------------------------------------------

def test_evaluate_averages_over_all_batches():
    feed = iter([{'x': i} for i in range(100)])
    calls = []

    def step(batch, j):
        calls.append((batch['x'], j))
        return {'loss': float(batch['x']), 'aux': 2.0 * batch['x']}

    out = T.evaluate(step, feed, 5)
    assert [c[0] for c in calls] == [0, 1, 2, 3, 4]
    assert out['loss'] == pytest.approx(2.0)   # mean(0..4)
    assert out['aux'] == pytest.approx(4.0)
    # the feed is positioned after the consumed epoch
    assert next(feed)['x'] == 5


def _val_rows(metrics_path):
    rows = []
    with open(metrics_path) as f:
        for line in f:
            row = json.loads(line)
            if 'val/loss' in row:
                rows.append((row['step'], row['val/loss']))
    return rows


def _saved_steps(ckpt_dir):
    return sorted(int(os.path.basename(p).split('_')[1].split('.')[0])
                  for p in glob.glob(os.path.join(ckpt_dir, 'step_*.json')))


# ---------------------------------------------------------------------------
# Best-checkpoint selection is val-driven (pretrain CLI, synthetic data)
# ---------------------------------------------------------------------------

@pytest.mark.slow
def test_pretrain_best_ckpt_follows_val_loss(tmp_path):
    from hudiff_tpu.training import pretrain as PT_CLI
    logdir = str(tmp_path / 'logs')
    PT_CLI.main(['--config', os.path.join(REPO, 'configs/heavy_test.yml'),
                 '--synthetic', '64', '--max-iter', '8', '--valid-step', '2',
                 '--logdir', logdir])
    run_dir = sorted(glob.glob(os.path.join(logdir, '*')))[-1]
    vals = _val_rows(os.path.join(run_dir, 'metrics.jsonl'))
    assert len(vals) >= 4, 'expected one val row per valid_step'
    saved = set(_saved_steps(os.path.join(run_dir, 'checkpoints')))
    best = float('inf')
    for step, loss in vals:
        should_save = loss < best
        assert (step in saved) == should_save, (
            f'step {step}: val {loss} vs best {best}, saved={step in saved}')
        best = min(best, loss)


@pytest.mark.slow
def test_pretrain_iteration_semantics_match_reference(tmp_path):
    """Reference train(it) runs `batch_acc` optimizer steps per iteration and
    counts iterations against max_iter (antibody_train.py:55-103,
    configs/antibody_train.yml:28-29). heavy_test.yml has batch_acc: 2, so
    max_iter=3 must perform exactly 6 optimizer steps, log 3 train rows, and
    each row's metrics are the window MEAN (reference :119-132), pinned via
    the opt_steps column."""
    from hudiff_tpu.training import pretrain as PT_CLI
    logdir = str(tmp_path / 'logs')
    PT_CLI.main(['--config', os.path.join(REPO, 'configs/heavy_test.yml'),
                 '--synthetic', '32', '--max-iter', '3', '--valid-step', '10',
                 '--logdir', logdir])
    run_dir = sorted(glob.glob(os.path.join(logdir, '*')))[-1]
    rows = []
    with open(os.path.join(run_dir, 'metrics.jsonl')) as f:
        for line in f:
            row = json.loads(line)
            if 'train/loss' in row:
                rows.append(row)
    assert [r['step'] for r in rows] == [1, 2, 3]
    assert [int(r['train/opt_steps']) for r in rows] == [2, 4, 6]


# ---------------------------------------------------------------------------
# Fine-tune resume: same LR / best-val / iteration continuation
# ---------------------------------------------------------------------------

@pytest.mark.slow
def test_pretrain_resume_iteration_mapping(tmp_path):
    """Resume restores the optimizer micro-step count from ckpt meta
    ('opt_steps') and continues at the right ITERATION (label/batch_acc
    semantics): a 2-iteration run (batch_acc=2 -> 4 opt steps) resumed to
    max-iter 3 must log exactly iteration 3 with opt_steps 6."""
    from hudiff_tpu.training import pretrain as PT_CLI
    logdir = str(tmp_path / 'l1')
    PT_CLI.main(['--config', os.path.join(REPO, 'configs/heavy_test.yml'),
                 '--synthetic', '32', '--max-iter', '2', '--valid-step', '2',
                 '--logdir', logdir])
    ckpt = sorted(glob.glob(os.path.join(logdir, '*', 'checkpoints')))[-1]
    meta = json.load(open(sorted(glob.glob(
        os.path.join(ckpt, 'step_*.json')))[-1]))
    assert meta['step'] == 2 and meta['opt_steps'] == 4

    logdir2 = str(tmp_path / 'l2')
    PT_CLI.main(['--config', os.path.join(REPO, 'configs/heavy_test.yml'),
                 '--synthetic', '32', '--max-iter', '3', '--valid-step', '3',
                 '--resume', ckpt, '--logdir', logdir2])
    run2 = sorted(glob.glob(os.path.join(logdir2, '*')))[-1]
    rows = [json.loads(line)
            for line in open(os.path.join(run2, 'metrics.jsonl'))]
    train = [(r['step'], int(r['train/opt_steps'])) for r in rows
             if 'train/loss' in r]
    assert train == [(3, 6)]


@pytest.mark.slow
def test_nano_finetune_resume_continues_state(heavy_pretrain_ckpt, tmp_path):
    from hudiff_tpu.training import finetune as FT_CLI

    pt_ckpt = heavy_pretrain_ckpt  # shared session fixture (conftest)

    ft_logs = str(tmp_path / 'ft1')
    FT_CLI.main(['nano', '--config',
                 os.path.join(REPO, 'configs/nano_finetune.yml'),
                 '--pretrain-ckpt', pt_ckpt, '--synthetic',
                 '--max-iter', '2', '--valid-step', '1', '--batch-size', '4',
                 '--logdir', ft_logs])
    ft_ckpt = sorted(glob.glob(os.path.join(ft_logs, '*', 'checkpoints')))[-1]

    # poison the persisted scheduler LR so restoration is observable
    meta_path = sorted(glob.glob(os.path.join(ft_ckpt, 'step_*.json')))[-1]
    meta = json.load(open(meta_path))
    assert meta.get('scheduler'), 'fine-tune ckpt must persist scheduler state'
    assert 'val_loss' in meta, 'fine-tune ckpt must persist best val loss'
    meta['scheduler']['lr'] = 5.5e-6
    json.dump(meta, open(meta_path, 'w'))
    saved_step = meta['step']

    ft2_logs = str(tmp_path / 'ft2')
    FT_CLI.main(['nano', '--config',
                 os.path.join(REPO, 'configs/nano_finetune.yml'),
                 '--pretrain-ckpt', pt_ckpt, '--synthetic',
                 '--max-iter', str(saved_step + 2), '--valid-step', '1',
                 '--batch-size', '4', '--resume', ft_ckpt,
                 '--logdir', ft2_logs])
    run2 = sorted(glob.glob(os.path.join(ft2_logs, '*')))[-1]
    with open(os.path.join(run2, 'metrics.jsonl')) as f:
        rows = [json.loads(line) for line in f]
    train_steps = [r['step'] for r in rows if 'finetune/loss' in r]
    # continues AFTER the restored iteration, not from 1
    assert train_steps[0] == saved_step + 1
    # a worse-val checkpoint in the resumed run is not saved over the best:
    # best_val was restored, so saves only happen on genuine improvement
    vals = [(r['step'], r['val/loss']) for r in rows if 'val/loss' in r]
    saved = set(_saved_steps(os.path.join(run2, 'checkpoints')))
    best = meta['val_loss']
    for step, loss in vals:
        assert (step in saved) == (loss < best)
        best = min(best, loss)
