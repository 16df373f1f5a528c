"""Worker process for the 2-process multi-host pretrain test.

Run as: python multihost_worker.py <process_id> <num_processes> <port> <logdir>

Initializes jax.distributed on CPU (2 virtual devices per process), then runs
one iteration of the REAL pretrain loop (training/pretrain.run) with synthetic
data: the ('data','model') mesh spans both processes' devices, each host feeds
its own data shard (jax.make_array_from_process_local_data), and the gradient
all-reduce crosses the process boundary. Prints the final global val loss so
the parent can assert both processes computed the same value.
"""
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

pid, nproc, port, logdir = (int(sys.argv[1]), int(sys.argv[2]), sys.argv[3],
                            sys.argv[4])

os.environ['XLA_FLAGS'] = '--xla_force_host_platform_device_count=2'
os.environ['JAX_PLATFORMS'] = 'cpu'

import jax  # noqa: E402

jax.config.update('jax_platforms', 'cpu')
# share the suite's persistent compile cache: both workers compile identical
# programs, so the second (and any rerun) reads instead of compiling
from hudiff_tpu.utils.compile_cache import enable_compile_cache  # noqa: E402

enable_compile_cache()
jax.distributed.initialize(coordinator_address=f'127.0.0.1:{port}',
                           num_processes=nproc, process_id=pid)
assert jax.process_count() == nproc, jax.process_count()
assert len(jax.devices()) == 2 * nproc, jax.devices()

import glob  # noqa: E402
import json  # noqa: E402

from hudiff_tpu.training import pretrain as PT  # noqa: E402
from hudiff_tpu.utils.config import load_yaml  # noqa: E402

cfg = load_yaml(os.path.join(REPO, 'configs/heavy_test.yml'))
# micro model: the test exercises the DISTRIBUTED mechanics (2-process mesh,
# per-host shards, cross-process collectives), not model capacity — shrink
# every width so the partitioned XLA CPU compile stays fast
cfg.model.update(d_embedding=32, d_model=32, n_encoder_layers=1,
                 s_model=32, r_model=32, n_pos_model=32, sum_d_model=64,
                 dual_layers=1, att_model=32, dim_feedforward=64,
                 nhead=4, cs_layers=1)
cfg.train.batch_size = 8
out_dir = PT.run(cfg, 'heavy', None, os.path.join(logdir, f'proc{pid}'),
                 synthetic=16, max_iter=1, valid_step=1, use_bf16=False,
                 seed=7)

rows = []
with open(os.path.join(out_dir, 'metrics.jsonl')) as f:
    for line in f:
        row = json.loads(line)
        if 'val/loss' in row:
            rows.append(row['val/loss'])
assert rows, 'no val rows logged'
ckpts = glob.glob(os.path.join(out_dir, 'checkpoints', 'step_*.json'))
print(f'MULTIHOST_RESULT pid={pid} val_loss={rows[-1]:.10f} '
      f'ckpts={len(ckpts)}', flush=True)
