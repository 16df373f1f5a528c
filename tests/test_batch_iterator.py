import numpy as np

from hudiff_tpu.data import oas


class _ListDS:
    def __init__(self, n):
        self.n = n

    def __getitem__(self, i):
        return i

    def __len__(self):
        return self.n


def test_small_split_yields_whole_epoch():
    """A split smaller than batch_size must still yield batches
    (regression: drop_last starved the VHH fine-tune on the 80-record set)."""
    ds = _ListDS(5)
    it = oas.batch_iterator(ds, np.arange(5), batch_size=16,
                            collate=lambda x: x, seed=0)
    batch = next(it)
    assert sorted(batch) == [0, 1, 2, 3, 4]
    batch2 = next(it)  # next epoch, reshuffled
    assert sorted(batch2) == [0, 1, 2, 3, 4]


def test_drop_last_on_large_split():
    ds = _ListDS(10)
    it = oas.batch_iterator(ds, np.arange(10), batch_size=4,
                            collate=lambda x: x, seed=0, shuffle=False)
    assert next(it) == [0, 1, 2, 3]
    assert next(it) == [4, 5, 6, 7]
    # remainder of 2 dropped; next epoch restarts
    assert next(it) == [0, 1, 2, 3]


def test_empty_split_raises():
    import pytest
    ds = _ListDS(0)
    with pytest.raises(ValueError):
        next(oas.batch_iterator(ds, np.asarray([], np.int64), 4,
                                collate=lambda x: x))


def test_prefetch_relays_producer_exception():
    from hudiff_tpu.data.pipeline import prefetch

    def gen():
        yield 1
        yield 2
        raise RuntimeError('disk went away')

    it = prefetch(gen(), size=1)
    assert next(it) == 1
    assert next(it) == 2
    import pytest as _pytest
    with _pytest.raises(RuntimeError, match='disk went away'):
        next(it)


def test_prefetch_passes_tuples_through():
    from hudiff_tpu.data.pipeline import prefetch
    items = [(1, 2), (3, 4)]
    assert list(prefetch(iter(items))) == items
