"""Data layer: aligned / unaligned / single datasets + a prefetching,
threaded host loader feeding device-ready NHWC batches.

Directory conventions, pairing rules (including the half-split A/B pairing
of reference image_folder.py:24-34 — bug-compatible, existing KAIST/IRVI
recipes depend on it), and the transform pipeline match the reference's
data layer (DSGAN/data/)."""

from dsgan_tpu.data.loader import CreateDataLoader, CreateDataset

__all__ = ["CreateDataLoader", "CreateDataset"]
