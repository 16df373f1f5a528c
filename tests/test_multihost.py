"""Two-process multi-host pretrain: jax.distributed.initialize on CPU, a
global ('data','model') mesh spanning both processes, per-host data shards,
cross-process gradient all-reduce (round-2 VERDICT missing #5 / next #5).

Spawns 2 real OS processes running tests/multihost_worker.py; both must
finish one pretrain iteration + full validation and agree on the global val
loss bit-for-bit.
"""
import os
import re
import socket
import subprocess
import sys

import pytest

HERE = os.path.dirname(os.path.abspath(__file__))
WORKER = os.path.join(HERE, 'multihost_worker.py')


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(('127.0.0.1', 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_pretrain_step(tmp_path):
    port = _free_port()
    env = {k: v for k, v in os.environ.items()
           if k not in ('XLA_FLAGS', 'JAX_PLATFORMS', 'PYTHONPATH')}
    env['PYTHONPATH'] = os.path.dirname(HERE)
    procs = [subprocess.Popen(
        [sys.executable, WORKER, str(i), '2', str(port), str(tmp_path)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env, text=True)
        for i in range(2)]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=900)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f'worker failed:\n{out[-4000:]}'
    losses = {}
    local_rows = 0
    for out in outs:
        m = re.search(r'MULTIHOST_RESULT pid=(\d) val_loss=([0-9.]+) '
                      r'ckpts=(\d+) sample_ok=(\d) sample_local_rows=(\d+)',
                      out)
        assert m, f'no result line:\n{out[-4000:]}'
        losses[int(m.group(1))] = m.group(2)
        assert int(m.group(3)) >= 1  # best-val checkpoint written
        # packed sampling round across the 2 processes: every process'
        # addressable shards must equal the single-device run's rows
        # (round-3 VERDICT next #9 — sharding changes where, never what)
        assert int(m.group(4)) == 1
        local_rows += int(m.group(5))
    assert set(losses) == {0, 1}
    assert local_rows == 8  # the global candidate batch, split across hosts
    # the val loss is a global reduction -> bit-identical across processes
    assert losses[0] == losses[1]
