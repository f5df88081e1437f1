from dsgan_tpu.utils import util
from dsgan_tpu.utils.image_pool import init_pool, pool_query
