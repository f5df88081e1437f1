"""Python loader behavior: prefetch-thread lifecycle (an abandoned
iterator must not leave the producer blocked on its queue) and batch
assembly invariants."""
import threading
import time
import types

import numpy as np
import pytest

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


def _disk_opt(root, **kw):
    import types as _t

    d = dict(
        dataroot=str(root), phase="train_all", dataset_mode="aligned",
        resize_or_crop="resize_and_crop", which_direction="AtoB",
        loadSize_w=40, loadSize_h=40, fineSize_w=32, fineSize_h=32,
        input_nc=3, output_nc=3, no_flip=False, batchSize=4, seed=7,
        nThreads=1, max_dataset_size=float("inf"), native_loader="off",
        serial_batches=False,
    )
    d.update(kw)
    return _t.SimpleNamespace(**d)


def _write_aligned(root, n=8, size=64):
    from PIL import Image

    d = root / "train_all"
    d.mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(0)
    for pfx in "ab":
        for i in range(n):
            arr = rng.integers(0, 255, (size, size, 3)).astype(np.uint8)
            Image.fromarray(arr).save(d / f"{pfx}_{i}.png")


def _stream(opt):
    from dsgan_tpu.data.loader import CreateDataLoader

    dl = CreateDataLoader(opt, "train")
    return [{k: (v.copy() if isinstance(v, np.ndarray) else v) for k, v in b.items()}
            for b in dl]


def test_augmentation_deterministic_across_thread_counts(tmp_path):
    """--seed pins the augmentation stream regardless of nThreads: each
    item's randomness derives from (seed, stream serial), not from the
    scheduling-dependent draw order of a shared generator."""
    _write_aligned(tmp_path)
    s1 = _stream(_disk_opt(tmp_path, nThreads=1))
    s8 = _stream(_disk_opt(tmp_path, nThreads=8))
    assert len(s1) == len(s8) > 0
    for b1, b8 in zip(s1, s8):
        np.testing.assert_array_equal(b1["A"], b8["A"])
        np.testing.assert_array_equal(b1["B"], b8["B"])
        assert b1["A_paths"] == b8["A_paths"]


def test_native_and_python_paths_identical_stream(tmp_path):
    """With per-item serials the native C++ path replays the Python
    path's exact (w, h, flip) draws — bit-identical batches."""
    rt = pytest.importorskip("dsgan_tpu.runtime")
    if not rt.available():
        pytest.skip("native runtime unavailable")
    _write_aligned(tmp_path)
    py = _stream(_disk_opt(tmp_path, native_loader="off"))
    nat = _stream(_disk_opt(tmp_path, native_loader="auto"))
    for bp, bn in zip(py, nat):
        np.testing.assert_array_equal(bp["A"], bn["A"])
        np.testing.assert_array_equal(bp["B"], bn["B"])
