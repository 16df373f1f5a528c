"""Test configuration: force CPU with 8 virtual devices so sharding tests run
anywhere.

Note: this machine's site hook (/root/.axon_site/sitecustomize.py) registers
the axon TPU backend at interpreter start and programmatically sets
jax_platforms, so the JAX_PLATFORMS env var alone is NOT enough — we must
override via jax.config before any device is touched.
"""
import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# persistent compile cache: the slow suite's wall time is dominated by XLA
# CPU compiles of the same tiny programs (fresh processes recompile
# everything); a shared on-disk cache makes reruns and the 2-process
# multihost workers (which compile identical programs) near-instant
from hudiff_tpu.utils.compile_cache import enable_compile_cache  # noqa: E402

enable_compile_cache()

import glob  # noqa: E402

import pytest  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _latest_ckpt(logdir: str) -> str:
    runs = sorted(glob.glob(os.path.join(logdir, '*', 'checkpoints')))
    assert runs, f'no checkpoint dir under {logdir}'
    return runs[-1]


# Session-scoped tiny pretrained checkpoints shared by the CLI-chain / e2e /
# resume tests (round-2 VERDICT next #9: one fixture training run instead of
# one per test keeps the slow suite inside a CI window).

@pytest.fixture(scope='session')
def heavy_pretrain_ckpt(tmp_path_factory):
    from hudiff_tpu.training import pretrain as PT_CLI
    logdir = str(tmp_path_factory.mktemp('shared_heavy_pt'))
    PT_CLI.main(['--config', os.path.join(REPO, 'configs/heavy_test.yml'),
                 '--synthetic', '32', '--max-iter', '1', '--valid-step', '1',
                 '--logdir', logdir])
    return _latest_ckpt(logdir)


@pytest.fixture(scope='session')
def pair_pretrain_ckpt(tmp_path_factory):
    from hudiff_tpu.training import pretrain as PT_CLI
    logdir = str(tmp_path_factory.mktemp('shared_pair_pt'))
    PT_CLI.main(['--config', os.path.join(REPO, 'configs/antibody_test.yml'),
                 '--synthetic', '32', '--max-iter', '1', '--valid-step', '1',
                 '--logdir', logdir])
    return _latest_ckpt(logdir)
