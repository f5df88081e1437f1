"""Model registry and factories (TPU-native equivalent of the reference's
DSGAN/models/__init__.py registry + networks.py define_G/define_D zoo).

``create_model(opt)`` dispatches on ``opt.model`` to a training-algorithm
class (pix2pix / cycle_gan / test), each of which compiles its whole
optimization step into one XLA program. ``define_G`` / ``define_D``
construct flax generator/discriminator modules by recipe name.
"""

from dsgan_tpu.models.registry import (
    create_model,
    define_D,
    define_G,
    find_model_using_name,
    get_option_setter,
    init_params,
)

__all__ = [
    "create_model",
    "define_D",
    "define_G",
    "find_model_using_name",
    "get_option_setter",
    "init_params",
]
