from dsgan_tpu.options.base_options import BaseOptions
from dsgan_tpu.options.train_options import TrainOptions
from dsgan_tpu.options.test_options import TestOptions

__all__ = ["BaseOptions", "TrainOptions", "TestOptions"]
