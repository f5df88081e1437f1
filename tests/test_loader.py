"""Python loader behavior: prefetch-thread lifecycle (an abandoned
iterator must not leave the producer blocked on its queue) and batch
assembly invariants."""
import threading
import time
import types

import numpy as np

from dsgan_tpu.data.loader import CustomDatasetDataLoader


class _FakeDataset:
    """16-item dict dataset; no native path."""

    def initialize(self, opt, rng):
        pass

    def name(self):
        return "fake"

    def __len__(self):
        return 16

    def __getitem__(self, i):
        return {"A": np.full((4, 4, 3), i, np.float32), "A_paths": f"p{i}"}


def _loader(monkeypatch, ds_cls=_FakeDataset, **kw):
    from dsgan_tpu.data import loader as L

    monkeypatch.setattr(L, "CreateDataset", lambda opt, rng=None: ds_cls())
    opt = types.SimpleNamespace(
        batchSize=kw.get("batchSize", 4), seed=0, nThreads=2,
        max_dataset_size=float("inf"), native_loader="off",
        dataset_mode="aligned",
    )
    dl = CustomDatasetDataLoader()
    dl.initialize(opt, kw.get("phase", "train"))
    return dl


def test_full_iteration_batches(monkeypatch):
    dl = _loader(monkeypatch)
    batches = list(dl)
    assert len(batches) == 4
    assert batches[0]["A"].shape == (4, 4, 4, 3)
    assert isinstance(batches[0]["A_paths"], list)
    # train phase shuffles deterministically from --seed: all items appear
    seen = sorted(int(b["A"][j, 0, 0, 0]) for b in batches for j in range(4))
    assert seen == list(range(16))


def test_abandoned_iterator_releases_producer(monkeypatch):
    """Early break (the eval CLI's --how_many) must not leak the prefetch
    thread blocked on q.put."""
    dl = _loader(monkeypatch)
    n0 = threading.active_count()
    for _ in range(8):
        it = iter(dl)
        next(it)
        it.close()  # what GC of the generator does
    deadline = time.time() + 5.0
    while threading.active_count() > n0 + 1 and time.time() < deadline:
        time.sleep(0.05)
    assert threading.active_count() <= n0 + 1, "producer threads leaked"


def test_eval_phase_keeps_ragged_tail(monkeypatch):
    dl = _loader(monkeypatch, batchSize=5, phase="test")
    sizes = [b["A"].shape[0] for b in dl]
    assert sizes == [5, 5, 5, 1]  # no drop_last outside training


def test_producer_exception_propagates(monkeypatch):
    """A decode error in the prefetch thread must surface in the consumer
    (not leave it blocked forever waiting for a sentinel that never comes)."""
    import pytest

    class _Broken(_FakeDataset):
        def __getitem__(self, i):
            if i == 6:
                raise OSError("corrupt image")
            return super().__getitem__(i)

    dl = _loader(monkeypatch, ds_cls=_Broken)
    with pytest.raises(OSError, match="corrupt image"):
        for _ in dl:
            pass
