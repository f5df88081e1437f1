"""Batching + prefetching loader (the TPU-native CustomDatasetDataLoader,
reference DSGAN/data/__init__.py:31-63).

Decoding runs in a thread pool (PIL releases the GIL for decode), batches
are assembled as contiguous NHWC float32 arrays, and a small background
queue keeps the accelerator fed while it trains on the previous batch —
host preprocessing overlaps device compute, the overlap the reference's
synchronous metric loop destroyed (SURVEY §3.1).

For maximum throughput ``dsgan_tpu.runtime`` provides a native C++ decode
path; this Python loader is the portable default and the fallback.
"""

import queue
import threading
from concurrent.futures import ThreadPoolExecutor

import numpy as np


def CreateDataset(opt, rng=None):
    """Dispatch on --dataset_mode (reference data/__init__.py:12-28)."""
    from dsgan_tpu.data.datasets import AlignedDataset, SingleDataset, UnalignedDataset

    if opt.dataset_mode == "aligned":
        dataset = AlignedDataset()
    elif opt.dataset_mode == "unaligned":
        dataset = UnalignedDataset()
    elif opt.dataset_mode == "single":
        dataset = SingleDataset()
    else:
        raise ValueError(f"Dataset [{opt.dataset_mode}] not recognized.")
    dataset.initialize(opt, rng)
    print(f"dataset [{dataset.name()}] was created")
    return dataset


class CustomDatasetDataLoader:
    def name(self):
        return "CustomDatasetDataLoader"

    def initialize(self, opt, phase):
        self.opt = opt
        self.phase = phase
        self.rng = np.random.default_rng(getattr(opt, "seed", 20))
        self.dataset = CreateDataset(opt, self.rng)
        self.batch_size = opt.batchSize
        self.shuffle = phase == "train"
        self.num_workers = max(1, int(getattr(opt, "nThreads", 4)))
        self.max_items = int(min(len(self.dataset),
                                 getattr(opt, "max_dataset_size", float("inf")) or len(self.dataset)))
        self.drop_last = phase == "train"  # static shapes: no ragged tail batch
        # per-item serials make augmentation a pure function of stream
        # position (thread-count independent; see datasets._item_rng).
        # The counter persists across epochs so each epoch draws fresh.
        import inspect

        self._serial = 0

        def _accepts(fn, name):
            try:
                return name in inspect.signature(fn).parameters
            except (TypeError, ValueError):
                return False

        self._seeded = _accepts(self.dataset.__getitem__, "serial")
        self._native_seeded = hasattr(self.dataset, "native_batch") and _accepts(
            self.dataset.native_batch, "serials")

    def load_data(self):
        return self

    def __len__(self):
        return int(self.max_items)

    def _batches_of_indices(self):
        n = int(self.max_items)
        order = np.arange(n)
        if self.shuffle:
            self.rng.shuffle(order)
        bs = self.batch_size
        end = (n // bs) * bs if self.drop_last else n
        for i in range(0, end, bs):
            yield order[i:i + bs]
        if not self.drop_last and end < n:
            yield order[end:n]

    def __iter__(self):
        q = queue.Queue(maxsize=4)
        sentinel = object()
        stop = threading.Event()  # consumer gone (early break / GC): don't
        #                           block on q.put forever, release the pool

        use_native = (
            getattr(self.opt, "native_loader", "auto") != "off"
            and hasattr(self.dataset, "native_batch")
        )

        def _put(item):
            while not stop.is_set():
                try:
                    q.put(item, timeout=0.2)
                    return True
                except queue.Full:
                    continue
            return False

        def produce():
            nonlocal use_native
            try:
                with ThreadPoolExecutor(self.num_workers) as pool:
                    for idx in self._batches_of_indices():
                        if stop.is_set():
                            return
                        if self._seeded:
                            serials = list(range(self._serial, self._serial + len(idx)))
                            self._serial += len(idx)
                        else:
                            serials = None
                        batch = None
                        if use_native:
                            kw = {"serials": serials} if self._native_seeded else {}
                            batch = self.dataset.native_batch(
                                idx.tolist(), self.num_workers, **kw
                            )
                            if batch is None:
                                use_native = False  # fall back permanently
                        if batch is None:
                            if serials is not None:
                                items = list(pool.map(
                                    lambda t: self.dataset.__getitem__(t[0], t[1]),
                                    zip(idx.tolist(), serials),
                                ))
                            else:
                                items = list(pool.map(self.dataset.__getitem__, idx.tolist()))
                            batch = {}
                            for key in items[0]:
                                vals = [it[key] for it in items]
                                if isinstance(vals[0], np.ndarray):
                                    batch[key] = np.stack(vals)
                                else:
                                    batch[key] = vals
                        if not _put(batch):
                            return
            except BaseException as e:  # decode error etc.: the consumer
                #  must see it — dying silently would leave it blocked on
                #  q.get() forever (the sentinel would never be posted)
                _put(e)
                return
            _put(sentinel)

        t = threading.Thread(target=produce, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is sentinel:
                    break
                if isinstance(item, BaseException):
                    raise item
                yield item
        finally:
            stop.set()


def CreateDataLoader(opt, phase):
    data_loader = CustomDatasetDataLoader()
    print(data_loader.name())
    data_loader.initialize(opt, phase)
    return data_loader
