"""Dataset classes: aligned (paired TIR<->RGB), unaligned (CycleGAN-style),
single (inference-only). Pure-host, index-based; batching/prefetch lives in
loader.py.

AlignedDataset matches reference DSGAN/data/aligned_dataset.py:27-90:
  dir = dataroot/phase; pairing by half-split; ToTensor -> random crop
  offset in [0, loadSize-fineSize-1] -> [-1,1] -> joint random hflip ->
  optional RGB->gray when nc==1.
"""

import os

import numpy as np
from PIL import Image

from dsgan_tpu.data import transforms as T
from dsgan_tpu.data.image_folder import list_images, make_dataset


def _open_rgb(path):
    return Image.open(path).convert("RGB")


def _item_rng(seed, serial):
    """Per-item Generator derived from (--seed, item serial).

    The loader fetches items on a thread pool; drawing augmentation
    randomness from one shared Generator there makes the stream depend on
    thread scheduling (each call is lock-protected but the ORDER isn't),
    so --seed would not actually pin the augmentations for nThreads > 1.
    With a serial assigned sequentially by the producer, each item's
    randomness is a pure function of its position in the epoch stream —
    deterministic for any thread count, and identical between the Python
    and native C++ paths (torch answers this with per-worker seeding,
    data/__init__.py's DataLoader; this is the thread-pool equivalent)."""
    return np.random.default_rng(np.random.SeedSequence([int(seed), int(serial)]))


class AlignedDataset:
    def initialize(self, opt, rng=None):
        self.opt = opt
        self.dir_AB = os.path.join(opt.dataroot, opt.phase)
        self.A_paths, self.B_paths = make_dataset(self.dir_AB)
        assert opt.resize_or_crop == "resize_and_crop"
        self.rng = rng or np.random.default_rng(getattr(opt, "seed", 20))
        self._seed = getattr(opt, "seed", 20)

    def __getitem__(self, index, serial=None):
        opt = self.opt
        rng = _item_rng(self._seed, serial) if serial is not None else self.rng
        A_path = self.A_paths[index]
        B_path = self.B_paths[index]

        input_nc = opt.output_nc if opt.which_direction == "BtoA" else opt.input_nc
        output_nc = opt.input_nc if opt.which_direction == "BtoA" else opt.output_nc
        # 3-channel recipes stay uint8 on the host end to end — the
        # /255*2-1 normalize runs on device (BaseModel._place_batch),
        # bit-identically, at a quarter of the H2D bytes. Grayscale
        # recipes keep the f32 host path (luma mix is an f32 op).
        u8 = input_nc == 3 and output_nc == 3
        A = np.asarray(_open_rgb(A_path), dtype=np.uint8)
        B = np.asarray(_open_rgb(B_path), dtype=np.uint8)

        w_off_max = max(0, opt.loadSize_w - opt.fineSize_w - 1)
        h_off_max = max(0, opt.loadSize_h - opt.fineSize_h - 1)
        w_off = int(rng.integers(0, w_off_max + 1))
        h_off = int(rng.integers(0, h_off_max + 1))
        A = T.crop(A, h_off, w_off, opt.fineSize_h, opt.fineSize_w)
        B = T.crop(B, h_off, w_off, opt.fineSize_h, opt.fineSize_w)

        if (not opt.no_flip) and rng.random() < 0.5:
            A = T.hflip(A)
            B = T.hflip(B)

        if not u8:
            A = T.normalize(A.astype(np.float32) / 255.0)
            B = T.normalize(B.astype(np.float32) / 255.0)
            if input_nc == 1:
                A = T.rgb_to_gray(A)
            if output_nc == 1:
                B = T.rgb_to_gray(B)

        return {
            "A": np.ascontiguousarray(A),
            "B": np.ascontiguousarray(B),
            "A_paths": A_path,
            "B_paths": B_path,
        }

    def __len__(self):
        return len(self.A_paths)

    def name(self):
        return "AlignedDataset"

    def native_batch(self, indices, num_threads=4, serials=None):
        """Batch fast path through the C++ runtime (decode+crop+flip+
        normalize in native threads). Joint offsets/flip per A/B pair.
        With ``serials`` the per-item draws replay __getitem__'s exact
        (w, h, flip) order from the same per-item rng, so the native and
        Python paths produce BIT-IDENTICAL augmentation streams. Returns
        None when the native runtime is unavailable or the recipe needs
        the Python path (grayscale conversion)."""
        opt = self.opt
        input_nc = opt.output_nc if opt.which_direction == "BtoA" else opt.input_nc
        output_nc = opt.input_nc if opt.which_direction == "BtoA" else opt.output_nc
        if input_nc == 1 or output_nc == 1:
            return None
        from dsgan_tpu import runtime as rt

        if not rt.available():
            return None
        n = len(indices)
        h_max = max(0, opt.loadSize_h - opt.fineSize_h - 1)
        w_max = max(0, opt.loadSize_w - opt.fineSize_w - 1)
        if serials is not None:
            oy = np.zeros(n, np.int64)
            ox = np.zeros(n, np.int64)
            flips = np.zeros(n, np.int32)
            for j, s in enumerate(serials):
                r = _item_rng(self._seed, s)
                ox[j] = r.integers(0, w_max + 1)
                oy[j] = r.integers(0, h_max + 1)
                if not opt.no_flip:
                    flips[j] = int(r.random() < 0.5)
        else:
            oy = self.rng.integers(0, h_max + 1, n)
            ox = self.rng.integers(0, w_max + 1, n)
            flips = (
                (self.rng.random(n) < 0.5).astype(np.int32)
                if not opt.no_flip else np.zeros(n, np.int32)
            )
        a_paths = [self.A_paths[i] for i in indices]
        b_paths = [self.B_paths[i] for i in indices]
        # uint8 out of the native path too: normalize runs on device
        a, _ = rt.load_batch_u8(a_paths, oy, ox, flips, opt.fineSize_h, opt.fineSize_w, num_threads)
        b, _ = rt.load_batch_u8(b_paths, oy, ox, flips, opt.fineSize_h, opt.fineSize_w, num_threads)
        return {"A": a, "B": b, "A_paths": a_paths, "B_paths": b_paths}


class UnalignedDataset:
    """Reference unaligned_dataset.py: separate phase+'A' / phase+'B' dirs,
    random B pairing unless --serial_batches."""

    def initialize(self, opt, rng=None):
        self.opt = opt
        self.dir_A = os.path.join(opt.dataroot, opt.phase + "A")
        self.dir_B = os.path.join(opt.dataroot, opt.phase + "B")
        self.A_paths = list_images(self.dir_A)
        self.B_paths = list_images(self.dir_B)
        self.A_size = len(self.A_paths)
        self.B_size = len(self.B_paths)
        self.rng = rng or np.random.default_rng(getattr(opt, "seed", 20))
        self._seed = getattr(opt, "seed", 20)
        # uint8 host pipeline when no side needs the (f32) luma mix —
        # normalize runs on device, bit-identically (see AlignedDataset)
        self._u8 = opt.input_nc == 3 and opt.output_nc == 3
        self.transform = T.get_transform(opt, self.rng, uint8=self._u8)

    def __getitem__(self, index, serial=None):
        rng = _item_rng(self._seed, serial) if serial is not None else self.rng
        A_path = self.A_paths[index % self.A_size]
        if self.opt.serial_batches:
            index_B = index % self.B_size
        else:
            index_B = int(rng.integers(0, self.B_size))
        B_path = self.B_paths[index_B]
        A = self.transform(_open_rgb(A_path), rng=rng)
        B = self.transform(_open_rgb(B_path), rng=rng)
        if self.opt.which_direction == "BtoA":
            input_nc, output_nc = self.opt.output_nc, self.opt.input_nc
        else:
            input_nc, output_nc = self.opt.input_nc, self.opt.output_nc
        if input_nc == 1:
            A = T.rgb_to_gray(A)
        if output_nc == 1:
            B = T.rgb_to_gray(B)
        return {
            "A": np.ascontiguousarray(A),
            "B": np.ascontiguousarray(B),
            "A_paths": A_path,
            "B_paths": B_path,
        }

    def __len__(self):
        return max(self.A_size, self.B_size)

    def name(self):
        return "UnalignedDataset"


class SingleDataset:
    """Reference single_dataset.py: A-side only over dataroot."""

    def initialize(self, opt, rng=None):
        self.opt = opt
        self.A_paths = list_images(opt.dataroot)
        self.rng = rng or np.random.default_rng(getattr(opt, "seed", 20))
        self._seed = getattr(opt, "seed", 20)
        if opt.which_direction == "BtoA":
            nc = opt.output_nc
        else:
            nc = opt.input_nc
        self._u8 = nc == 3
        self.transform = T.get_transform(opt, self.rng, uint8=self._u8)

    def __getitem__(self, index, serial=None):
        rng = _item_rng(self._seed, serial) if serial is not None else self.rng
        A_path = self.A_paths[index]
        A = self.transform(_open_rgb(A_path), rng=rng)
        if self.opt.which_direction == "BtoA":
            input_nc = self.opt.output_nc
        else:
            input_nc = self.opt.input_nc
        if input_nc == 1:
            A = T.rgb_to_gray(A)
        return {"A": np.ascontiguousarray(A), "A_paths": A_path}

    def __len__(self):
        return len(self.A_paths)

    def name(self):
        return "SingleDataset"
