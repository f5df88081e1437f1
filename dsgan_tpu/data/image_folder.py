"""Image directory walking (reference DSGAN/data/image_folder.py).

``make_dataset`` walks the directory in sorted order and SPLITS THE LIST
IN HALF — first half is domain A (TIR), second half domain B (RGB)
(reference image_folder.py:24-34). This is the pairing rule the shipped
KAIST/IRVI recipes rely on; kept bug-compatible.
"""

import os

IMG_EXTENSIONS = [
    ".jpg", ".JPG", ".jpeg", ".JPEG",
    ".png", ".PNG", ".ppm", ".PPM", ".bmp", ".BMP",
]


def is_image_file(filename):
    return any(filename.endswith(ext) for ext in IMG_EXTENSIONS)


def make_dataset(dir):
    """Sorted walk, then half-split -> (A_paths, B_paths)."""
    images = []
    assert os.path.isdir(dir), f"{dir} is not a valid directory"
    for root, _, fnames in sorted(os.walk(dir)):
        for fname in sorted(fnames):
            if is_image_file(fname):
                images.append(os.path.join(root, fname))
    ix = len(images) // 2
    return images[:ix], images[ix:]


def list_images(dir):
    """Flat sorted list of all images under dir (no split)."""
    a, b = make_dataset(dir)
    return a + b


def default_loader(path):
    """PIL RGB loader (reference image_folder.py:35-36)."""
    from PIL import Image

    return Image.open(path).convert("RGB")


class ImageFolder:
    """Flat image-directory dataset (reference image_folder.py:41-66).

    The reference class is dead code AND latently broken — it feeds
    ``make_dataset``'s half-split 2-tuple straight into ``self.imgs``,
    so ``len()`` is 2 and ``__getitem__`` yields path lists. This
    rebuild keeps the documented contract (sorted flat listing, optional
    transform, ``return_paths``) and actually works.
    """

    def __init__(self, root, transform=None, return_paths=False,
                 loader=default_loader):
        imgs = list_images(root)
        if len(imgs) == 0:
            raise RuntimeError(
                "Found 0 images in: " + root + "\n"
                "Supported image extensions are: " + ",".join(IMG_EXTENSIONS))
        self.root = root
        self.imgs = imgs
        self.transform = transform
        self.return_paths = return_paths
        self.loader = loader

    def __getitem__(self, index):
        path = self.imgs[index]
        img = self.loader(path)
        if self.transform is not None:
            img = self.transform(img)
        if self.return_paths:
            return img, path
        return img

    def __len__(self):
        return len(self.imgs)
