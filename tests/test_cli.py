"""CLI-surface tests: pretrain -> finetune -> humanize chained through the
real argparse entry points and the native checkpoint loader.

The unit/e2e tests build params in-process, which bypasses the
save->restore->load_denoiser path entirely (a double-nested-params bug
survived there once); these tests drive the same surfaces a user does.
"""
import glob
import os

import pytest

from hudiff_tpu.sampling import humanize as H
from hudiff_tpu.training import finetune as FT_CLI
from hudiff_tpu.training import pretrain as PT_CLI

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
VHH = ('QVQLVESGGGLVQAGGSLRLSCAASGRTFSSYAMGWFRQAPGKEREFVAAISWSGGSTYYADSVKGRF'
       'TISRDNAKNTVYLQMNSLKPEDTAVYYCAADRGSYYYTRNQYDYWGQGTQVTVSS')


def _latest_ckpt_dir(logdir: str) -> str:
    runs = sorted(glob.glob(os.path.join(logdir, '*', 'checkpoints')))
    assert runs, f'no checkpoint dir under {logdir}'
    return runs[-1]


@pytest.fixture(scope='module')
def pretrain_ckpt(tmp_path_factory):
    logdir = str(tmp_path_factory.mktemp('pt_logs'))
    PT_CLI.main(['--config', os.path.join(REPO, 'configs/heavy_test.yml'),
                 '--synthetic', '32', '--max-iter', '2', '--valid-step', '2',
                 '--logdir', logdir])
    return _latest_ckpt_dir(logdir)


def _read_rows(csv_path: str):
    with open(csv_path) as f:
        return [line.strip() for line in f if line.strip()]


def test_humanize_nano_from_pretrain_ckpt(pretrain_ckpt, tmp_path):
    out = str(tmp_path / 'hum')
    H.main(['nano', '--ckpt', pretrain_ckpt, '--vhh-seq', VHH,
            '--batch-size', '4', '--sample-number', '1',
            '--no-similarity-search', '--logdir', out])
    csvs = glob.glob(os.path.join(out, '*', 'sample_humanization_result.csv'))
    assert csvs
    rows = _read_rows(csvs[0])
    assert any(r.startswith('camel,') for r in rows)
    hum = [r for r in rows if r.startswith('humanization,')]
    assert hum, 'no humanized candidates written'
    # candidates are amino-acid strings of plausible VHH length
    for r in hum:
        seq = r.split(',')[2]
        assert 90 < len(seq) < 152 and seq.isalpha()


def test_finetune_then_humanize(pretrain_ckpt, tmp_path):
    ft_logs = str(tmp_path / 'ft_logs')
    FT_CLI.main(['nano', '--config',
                 os.path.join(REPO, 'configs/nano_finetune.yml'),
                 '--pretrain-ckpt', pretrain_ckpt, '--synthetic',
                 '--max-iter', '2', '--valid-step', '2', '--batch-size', '4',
                 '--logdir', ft_logs])
    ft_ckpt = _latest_ckpt_dir(ft_logs)

    out = str(tmp_path / 'hum_ft')
    H.main(['nano', '--ckpt', ft_ckpt, '--vhh-seq', VHH,
            '--batch-size', '2', '--sample-number', '1', '--logdir', out])
    csvs = glob.glob(os.path.join(out, '*', 'sample_humanization_result.csv'))
    assert csvs
    rows = _read_rows(csvs[0])
    assert any(r.startswith('humanization,') for r in rows)
