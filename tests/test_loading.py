"""Host loader tests: the multi-worker decode pool must be a pure performance
knob — batch order/content identical for any ``num_workers`` (the reference's
``train_worker``/``val_worker``, data_config.py:5-21), exceptions propagate, and
abandoned iterators don't leak/park worker threads."""

import threading
import time

import numpy as np
import pytest

from heal_swin_tpu.data.loading import DataLoader


class _SlowSquares:
    """Map-style dataset with a deliberately GIL-releasing 'decode' (sleep)."""

    def __init__(self, n=32, delay=0.0, fail_at=None):
        self.n = n
        self.delay = delay
        self.fail_at = fail_at

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        if self.fail_at is not None and i == self.fail_at:
            raise ValueError(f"decode failed at {i}")
        if self.delay:
            time.sleep(self.delay)
        return np.full((3,), i * i, dtype=np.int64)


@pytest.mark.parametrize("shuffle", [False, True])
def test_num_workers_is_order_invariant(shuffle):
    ds = _SlowSquares(n=37)
    ref = [b.copy() for b in DataLoader(ds, batch_size=4, shuffle=shuffle, seed=3,
                                        prefetch=0)]
    for workers in (1, 2, 5):
        loader = DataLoader(ds, batch_size=4, shuffle=shuffle, seed=3,
                            num_workers=workers)
        got = list(loader)
        assert len(got) == len(ref)
        for a, b in zip(got, ref):
            np.testing.assert_array_equal(a, b)


def test_pool_actually_overlaps_decodes():
    # 16 samples x 30 ms decode: serial floor ~0.48 s; 4 workers should land
    # well under half that (threads overlap in time.sleep, like PIL decode)
    ds = _SlowSquares(n=16, delay=0.03)
    t0 = time.time()
    list(DataLoader(ds, batch_size=4, num_workers=4, prefetch=4))
    elapsed = time.time() - t0
    assert elapsed < 0.30, f"pool did not overlap decodes: {elapsed:.2f}s"


@pytest.mark.parametrize("workers", [1, 3])
def test_decode_exception_propagates(workers):
    ds = _SlowSquares(n=16, fail_at=9)
    with pytest.raises(ValueError, match="decode failed at 9"):
        list(DataLoader(ds, batch_size=4, num_workers=workers))


@pytest.mark.parametrize("workers", [1, 4])
def test_abandoned_iterator_does_not_leak_threads(workers):
    before = threading.active_count()
    ds = _SlowSquares(n=64, delay=0.005)
    it = iter(DataLoader(ds, batch_size=4, num_workers=workers, prefetch=2))
    next(it)
    it.close()  # abandon mid-epoch (generator finally sets the stop event)
    deadline = time.time() + 5.0
    while threading.active_count() > before and time.time() < deadline:
        time.sleep(0.05)
    assert threading.active_count() <= before


def test_epoch_reshuffle_changes_order_deterministically():
    ds = _SlowSquares(n=24)
    loader = DataLoader(ds, batch_size=4, shuffle=True, seed=0, num_workers=2)
    e0 = np.concatenate(list(loader))
    loader.set_epoch(1)
    e1 = np.concatenate(list(loader))
    loader.set_epoch(0)
    e0_again = np.concatenate(list(loader))
    assert not np.array_equal(e0, e1)
    np.testing.assert_array_equal(e0, e0_again)
