"""CLI-surface tests: pretrain -> finetune -> humanize chained through the
real argparse entry points and the native checkpoint loader.

The unit/e2e tests build params in-process, which bypasses the
save->restore->load_denoiser path entirely (a double-nested-params bug
survived there once); these tests drive the same surfaces a user does.
"""
import glob
import os

import pytest

pytestmark = pytest.mark.slow  # multi-minute integration runs

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


@pytest.fixture()
def pretrain_ckpt(heavy_pretrain_ckpt):
    # session-scoped shared tiny checkpoint (conftest.heavy_pretrain_ckpt)
    return heavy_pretrain_ckpt


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


def test_humanize_sample_number_retry(pretrain_ckpt, tmp_path):
    """--sample-number 4 with batch 2 must resample until it has 4 UNIQUE
    candidates (reference resamples to N distinct, sample.py:181-217)."""
    out = str(tmp_path / 'hum_n4')
    H.main(['nano', '--ckpt', pretrain_ckpt, '--vhh-seq', VHH,
            '--batch-size', '2', '--sample-number', '4',
            '--no-similarity-search', '--logdir', out])
    csvs = glob.glob(os.path.join(out, '*', 'sample_humanization_result.csv'))
    assert csvs
    hum = [r.split(',')[2] for r in _read_rows(csvs[0])
           if r.startswith('humanization,')]
    assert len(hum) == 4, f'expected 4 candidates, got {len(hum)}'
    assert len(set(hum)) == 4, 'candidates are not unique'


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


def test_ab_finetune_then_humanize(pair_pretrain_ckpt, tmp_path):
    """Antibody fine-tune CLI (3 random-init AbNatiV scorers) then humanize
    from the finetune checkpoint."""
    pt_ckpt = pair_pretrain_ckpt

    ft_logs = str(tmp_path / 'ab_ft')
    FT_CLI.main(['ab', '--config',
                 os.path.join(REPO, 'configs/antibody_finetune.yml'),
                 '--pretrain-ckpt', pt_ckpt, '--synthetic',
                 '--max-iter', '2', '--valid-step', '2', '--batch-size', '4',
                 '--logdir', ft_logs])
    ft_ckpt = _latest_ckpt_dir(ft_logs)

    out = str(tmp_path / 'ab_hum')
    H.main(['ab', '--ckpt', ft_ckpt,
            '--hseq', 'QVQLKQSGPGLVAPSQSLSITCTVSGFSLINYAISWVRQPPGKGLEWLGVIWT'
                      'GGGTNYNSALKSRLSISKDNSKSQVFLKMNSLQTDDTARYYCARKDYYGRYYG'
                      'MDYWGQGTSVTVS',
            '--lseq', 'QAVVTQESALTTSPGETVTLTCRSSTGAVTTSNYANWVQEKPDHLFTGLIGGT'
                      'NNRAPGVPARFSGSLIGDKAALTITGAQTEDEAIYFCALWYNNHWVFGGGTKL'
                      'TVL',
            '--batch-size', '2', '--sample-number', '1', '--logdir', out])
    csvs = glob.glob(os.path.join(out, '*', 'sample_humanization_result.csv'))
    assert csvs
    rows = _read_rows(csvs[0])
    assert any(r.startswith('humanization,') for r in rows)


def test_shipped_demo_checkpoint_loads():
    """examples/demo_ab_tiny must keep loading through load_denoiser (the
    README quickstart path) and produce a full humanization."""
    demo = os.path.join(REPO, 'examples', 'demo_ab_tiny')
    model, variables, finetuned = H.load_denoiser(demo, 'pair',
                                                  use_bf16=False)
    assert not finetuned
    hum = H.PairHumanizer(model, variables, batch_size=2, seed=3)
    res = hum('QVQLQQPGAELVKPGASVKLSCKASGYTFTSYWMHWVKQRPGQGLEWIGEINPSNGRTNY'
              'NEKFKSKATLTVDKSSSTAYMQLSSLTSEDSAVYYCARGGYYFDYWGQGTTLTVSS',
              'DIVMTQSQKFMSTSVGDRVSVTCKASQNVGTNVAWYQQKPGQSPKALIYSASYRYSGVPD'
              'RFTGSGSGTDFTLTISNVQSEDLAEYFCQQYNSYPLTFGAGTKLELK')
    assert res is not None and len(res['h_seqs']) == 2
    from hudiff_tpu import constants as C
    assert (res['grids'] != C.IDX_MSK).all()


def test_shipped_nano_demo_checkpoint_loads():
    """examples/demo_nb_tiny loads and humanizes a VHH (README path)."""
    demo = os.path.join(REPO, 'examples', 'demo_nb_tiny')
    model, variables, finetuned = H.load_denoiser(demo, 'heavy',
                                                  use_bf16=False)
    assert not finetuned
    hum = H.NanoHumanizer(model, variables, batch_size=2, seed=5)
    res = hum(VHH)
    assert res is not None and len(res['seqs']) >= 1
