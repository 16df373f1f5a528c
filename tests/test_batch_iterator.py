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
