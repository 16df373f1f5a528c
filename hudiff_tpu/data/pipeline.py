"""Host->device feeding: background prefetch + sharded device puts.

The reference relies on torch DataLoader worker processes; here a light
background thread keeps a small queue of ready numpy batches while the TPU
computes, and ``device_put`` lays batches out over the mesh's data axis
(SURVEY.md §7 "LMDB -> mesh feeding").
"""
from __future__ import annotations

import queue
import threading
from typing import Callable, Dict, Iterable, Iterator, Optional

import jax
import numpy as np


def prefetch(it: Iterable, size: int = 2) -> Iterator:
    """Run ``it`` in a daemon thread, buffering up to ``size`` items.

    A producer-side exception is re-raised in the consumer (silently ending
    the stream would truncate an epoch and look like clean exhaustion)."""
    q: queue.Queue = queue.Queue(maxsize=size)
    _END = object()

    def worker():
        try:
            for item in it:
                q.put(item)
        except BaseException as e:  # noqa: BLE001 - relay to consumer
            q.put((_END, e))
            return
        q.put((_END, None))

    threading.Thread(target=worker, daemon=True).start()
    while True:
        item = q.get()
        if isinstance(item, tuple) and len(item) == 2 and item[0] is _END:
            if item[1] is not None:
                raise item[1]
            return
        yield item


def device_feed(batches: Iterable[Dict[str, np.ndarray]],
                sharding: Optional[jax.sharding.Sharding] = None,
                prefetch_size: int = 2) -> Iterator[Dict[str, jax.Array]]:
    """Prefetched iterator of device-resident batches (sharded if given).

    Multi-host (jax.process_count() > 1): each host's iterator yields its
    LOCAL batch shard and the global array is assembled across hosts with
    ``jax.make_array_from_process_local_data`` — the global batch is
    batch_size x process_count (per-host shards, SURVEY.md §2.3)."""
    multihost = jax.process_count() > 1

    def put(batch):
        if sharding is None:
            return {k: jax.device_put(v) for k, v in batch.items()}
        if multihost:
            return {k: jax.make_array_from_process_local_data(sharding, v)
                    for k, v in batch.items()}
        return {k: jax.device_put(v, sharding) for k, v in batch.items()}

    for batch in prefetch(batches, prefetch_size):
        yield put(batch)
