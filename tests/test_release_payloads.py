"""Schema-pin the RELEASED checkpoint payload layouts (round-4 VERDICT
next #8): the real hudiffab.pt / hudiffnb.pt / AbNatiV .ckpt files are not
present in this environment, so these fixtures torch.save payloads in the
EXACT documented layouts — pickled easydict.EasyDict configs included —
and drive the real loaders end-to-end, making conversion of the actual
releases a file-drop away.

Layouts encoded (reference file:line):
- pretrain .pt: {'config': EasyDict(yaml) with .model, 'model': state_dict,
  'optimizer', 'scheduler', 'iteration'}            (antibody_train.py:439-445)
- ab fine-tune .pt: {'fineconfig', 'pretrain_config', 'model':
  anti_infilling.state_dict(), 'optimizer', 'scheduler', 'iteration'}
                                                (antibody_finetune.py:348-355)
- nb fine-tune .pt: {'config', 'model': framework state_dict with
  'eval_abnativ_model.' / 'infilling_pretrain.' key prefixes,
  'abnativ_params': hparams, 'infilling_params': EasyDict(model kwargs),
  'optimizer', 'scheduler', 'iteration'}; consumers split by prefix and
  build NanoAntiTFNet(**infilling_params)
            (nanofinetune.py:531-539, nanosample.py:185-193 + :268-269)
- AbNatiV .ckpt (lightning): {'hyper_parameters': {'hparams': {...}},
  'state_dict': {...}}             (abnativ_scoring.py:284-287, nanofinetune.py:31-34)

The configs are pickled as easydict.EasyDict exactly like the releases
(antibody_train.py:342); easydict is NOT installed here, so these tests
also prove the unpickle shim (checkpoints._ensure_unpickle_shims).
"""
import os
import sys

import numpy as np
import pytest

import jax.numpy as jnp

torch = pytest.importorskip('torch')

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, HERE)

from hudiff_tpu import constants as C  # noqa: E402
from hudiff_tpu.models import abnativ as A  # noqa: E402
from hudiff_tpu.training import checkpoints as CKPT  # noqa: E402

from test_denoiser_parity import (_TorchAntiTFNet,  # noqa: E402
                                  _TorchNanoAntiTFNet)

# tiny-but-real module dims (state_dict keys match the reference tree —
# proven by the numeric parity tests in test_denoiser_parity.py)
_D = 32
AB_KW = dict(n_tokens=23, d_embedding=_D, d_model=_D, n_encoder_layers=1,
             aa_kernel_size=5, r=4, n_side=3, s_embedding=4, s_model=_D,
             n_region=7, r_embedding=4, r_model=_D, n_pos_model=_D,
             max_len=C.PAIR_LEN, sum_d_model=3 * _D, dual_layers=1,
             att_model=32, dim_feedforward=64, nhead=4, cs_layers=1,
             activation='gelu')
NB_KW = {k: v for k, v in dict(AB_KW, max_len=C.HEAVY_LEN,
                               sum_d_model=2 * _D).items()
         if k not in ('n_side', 's_embedding', 's_model')}


def _easydict(d):
    """The exact class the releases pickle (module 'easydict', class
    'EasyDict'); the loader's shim provides it when the package is absent."""
    CKPT._ensure_unpickle_shims()
    import easydict
    out = easydict.EasyDict()
    for k, v in d.items():
        out[k] = _easydict(v) if isinstance(v, dict) else v
    return out


def _fake_opt_state():
    return {'state': {0: {'step': torch.tensor(1),
                          'exp_avg': torch.zeros(3)}},
            'param_groups': [{'lr': 1e-4}]}


def _load_and_forward(path, kind):
    from hudiff_tpu.sampling.humanize import load_denoiser
    model, variables, finetuned = load_denoiser(path, kind, use_bf16=False)
    B = 2
    L = C.PAIR_LEN if kind == 'pair' else C.HEAVY_LEN
    tokens = jnp.zeros((B, L), jnp.int32)
    if kind == 'pair':
        region = jnp.asarray(np.tile(np.concatenate(
            [np.asarray(C.HEAVY_REGION_INDEX),
             np.asarray(C.LIGHT_REGION_INDEX)])[None], (B, 1)))
        logits = model.apply(variables, tokens, region,
                             jnp.asarray([[0, 2], [0, 1]]))
    else:
        region = jnp.asarray(np.tile(
            np.asarray(C.HEAVY_REGION_INDEX)[None], (B, 1)))
        logits = model.apply(variables, tokens, region)
    assert logits.shape == (B, L, 23)
    assert bool(jnp.isfinite(logits).all())
    return finetuned


def test_pretrain_release_payload(tmp_path):
    """hudiffab.pt layout: EasyDict config with a .model section, plus
    optimizer/scheduler/iteration the loader must tolerate."""
    torch.manual_seed(0)
    net = _TorchAntiTFNet(**AB_KW)
    cfg = _easydict({'model': dict(AB_KW),
                     'train': {'seed': 2023, 'batch_size': 64},
                     'dataset': {'name': 'oas_pair'}})
    path = str(tmp_path / 'hudiffab.pt')
    torch.save({'config': cfg, 'model': net.state_dict(),
                'optimizer': _fake_opt_state(), 'scheduler': {'factor': 0.6},
                'iteration': 100000}, path)
    assert _load_and_forward(path, 'pair') is False


def test_ab_finetune_release_payload(tmp_path):
    """Ab fine-tune layout: bare infilling state_dict under 'model',
    config under 'pretrain_config' (selects the finetune branch)."""
    torch.manual_seed(1)
    net = _TorchAntiTFNet(**AB_KW)
    path = str(tmp_path / 'ab_finetune.pt')
    torch.save({'fineconfig': _easydict({'finetune': {'lr': 1e-5}}),
                'pretrain_config': _easydict({'model': dict(AB_KW)}),
                'model': net.state_dict(),
                'optimizer': _fake_opt_state(), 'scheduler': {},
                'iteration': 5000}, path)
    assert _load_and_forward(path, 'pair') is True


def test_nb_finetune_release_payload(tmp_path):
    """hudiffnb.pt layout: multi-model state_dict split by key prefix
    ('eval_abnativ_model.' dropped, 'infilling_pretrain.' extracted) and
    the flat NanoAntiTFNet(**infilling_params) kwargs."""
    torch.manual_seed(2)
    net = _TorchNanoAntiTFNet(**NB_KW)
    sd = {f'infilling_pretrain.{k}': v for k, v in net.state_dict().items()}
    # the frozen scorer's weights ride along under the other prefix; any
    # tensor content — consumers must drop them, not trip on them
    sd['eval_abnativ_model.encoder.fc.weight'] = torch.zeros(4, 4)
    sd['eval_abnativ_model.encoder.fc.bias'] = torch.zeros(4)
    path = str(tmp_path / 'hudiffnb.pt')
    torch.save({'config': _easydict({'model': {'loss_type': 'smooth_loss'}}),
                'model': sd,
                'abnativ_params': {'d_embedding': 128, 'kernel': 4},
                'infilling_params': _easydict(NB_KW),
                'optimizer': _fake_opt_state(), 'scheduler': {},
                'iteration': 28000}, path)
    assert _load_and_forward(path, 'heavy') is True


def test_abnativ_lightning_ckpt_payload(tmp_path):
    """AbNatiV .ckpt layout: hparams nested as
    ckpt['hyper_parameters']['hparams'] — the converter must read the REAL
    values (here: non-default num_heads/d_ff), not silently fall back to
    the dataclass defaults, and load from the saved file."""
    hp = dict(d_embedding=32, kernel=4, stride=2, num_heads=2,
              num_mha_layers=1, d_ff=64, length_seq=149, alphabet_size=21,
              num_embeddings=16, embedding_dim_code_book=8, decay=0.8,
              commitment_cost=1.0, drop=0.0, learning_rate=1e-3)
    sys.path.insert(0, '/root/reference')
    try:
        from model.nanoencoder.abnativ_model import \
            AbNatiV_Model as TorchAbNatiV
    except ImportError:
        pytest.skip('reference not mounted')
    torch.manual_seed(3)
    tmodel = TorchAbNatiV(dict(hp))
    tmodel.vqvae._codebook.embed.data.normal_(0, 1.0)
    tmodel.vqvae._codebook.initted.data.fill_(1)
    path = str(tmp_path / 'vh_model.ckpt')
    torch.save({'hyper_parameters': {'hparams': dict(hp)},
                'state_dict': tmodel.state_dict(),
                'epoch': 3, 'global_step': 1234}, path)

    ckpt = CKPT.load_torch_checkpoint(path)
    conv = A.convert_torch_abnativ(ckpt)
    # the nested hparams were read, not defaulted (defaults: num_heads=4,
    # d_ff=256)
    assert conv['hp'].num_heads == 2
    assert conv['hp'].d_ff == 64
    out = A.AbNatiVModel(conv['hp']).apply(
        conv['variables'],
        jnp.asarray(np.eye(21, dtype=np.float32)[
            np.random.RandomState(0).randint(0, 21, (2, 149))]))
    assert out['x_recon'].shape == (2, 149, 21)


def test_easydict_shim_roundtrip(tmp_path):
    """The shim must unpickle nested EasyDicts with attribute access —
    exactly what reading ckpt['config'].model does in reference consumers."""
    cfg = _easydict({'model': {'nhead': 8}, 'train': {'lr': 1e-4}})
    path = str(tmp_path / 'cfg.pt')
    torch.save({'config': cfg}, path)
    back = CKPT.load_torch_checkpoint(path)['config']
    assert back.model['nhead'] == 8
    assert back['train']['lr'] == 1e-4
