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

# --- one packed sampling round across both processes (round-3 VERDICT
# next #9): the candidate batch is sharded over the global 'data' axis
# spanning the two processes, and the sampled tokens must be IDENTICAL to
# a single-device run of the same program (sharding changes where the
# tokens are computed, never what they are). Each worker checks its own
# addressable shard against the locally computed full-batch reference.
import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from hudiff_tpu import constants as C  # noqa: E402
from hudiff_tpu.models.denoiser import NanoAntiTFNet, nano_config  # noqa: E402
from hudiff_tpu.parallel.mesh import make_mesh  # noqa: E402
from hudiff_tpu.sampling import sampler as S  # noqa: E402

scfg = nano_config().test_size()
smodel = NanoAntiTFNet(scfg)
B, L = 8, C.HEAVY_LEN
tokens = jnp.full((B, L), C.IDX_MSK, jnp.int32)
region = jnp.zeros((B, L), jnp.int32)
sparams = smodel.init(jax.random.PRNGKey(0), tokens[:1], region[:1])
order = S.build_order(np.arange(0, 12), B, rng=jax.random.PRNGKey(1))
srng = jax.random.PRNGKey(2)

# single-device reference, computed independently on each process
run1 = S.make_jit_sampler(smodel, sparams, has_chain_type=False)
ref = np.asarray(run1(tokens, region, order, srng))

mesh = make_mesh(model_axis=1)  # ('data'=2*nproc, 'model'=1), cross-process
assert mesh.shape['data'] == 2 * nproc
runN = S.make_jit_sampler(smodel, sparams, has_chain_type=False, mesh=mesh)
outN = runN(tokens, region, order, srng)
shard_ok = all(
    np.array_equal(np.asarray(sh.data), ref[sh.index[0]])
    for sh in outN.addressable_shards)
n_local = sum(sh.data.shape[0] for sh in outN.addressable_shards)

print(f'MULTIHOST_RESULT pid={pid} val_loss={rows[-1]:.10f} '
      f'ckpts={len(ckpts)} sample_ok={int(shard_ok)} '
      f'sample_local_rows={n_local}', flush=True)
