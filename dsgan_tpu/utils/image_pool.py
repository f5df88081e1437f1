"""Discriminator replay buffer, device-resident and functional.

The reference ImagePool (DSGAN/util/image_pool.py:5-32) is host-side
Python state queried between the G forward and the D step — which would
split the train step into multiple device programs. Here the pool is a
ring buffer that LIVES IN THE TRAIN STATE on device, so the whole
G+pool+D+G-update step stays one fused XLA program.

Semantics match the reference exactly, per batch element in order:
  * while the pool is not full: store the image, return the image;
  * else with p<=0.5 return the image unchanged, with p>0.5 swap it with
    a uniformly chosen stored image and return the old one.
"""

import jax
import jax.numpy as jnp
from jax import lax


def init_pool(pool_size, shape, dtype=jnp.float32):
    """Allocate pool buffers. shape is (H, W, C) of one pooled image.

    pool_size == 0 (pool disabled; callers skip pool_query at trace time)
    still allocates ONE row: a zero-size buffer cannot be serialized by
    orbax, which would make any --pool_size 0 run crash at checkpoint
    save. One spare image of HBM is noise next to the activations."""
    images = jnp.zeros((max(pool_size, 1), *shape), dtype)
    count = jnp.zeros((), jnp.int32)
    return images, count


def pool_query(images, count, batch, rng):
    """Query the pool with a batch (B, H, W, C) -> (images', count', out).

    Sequential over batch elements (matching the reference's per-image
    loop); B is static so this unrolls/scans into the fused step.
    """
    pool_size = images.shape[0]
    b = batch.shape[0]

    def body(i, carry):
        imgs, cnt, out = carry
        img = batch[i]
        key = jax.random.fold_in(rng, i)
        k_p, k_idx = jax.random.split(key)

        def insert(args):
            imgs, cnt, out = args
            imgs = lax.dynamic_update_slice(imgs, img[None], (cnt, 0, 0, 0))
            out = lax.dynamic_update_slice(out, img[None], (i, 0, 0, 0))
            return imgs, cnt + 1, out

        def replay(args):
            imgs, cnt, out = args
            p = jax.random.uniform(k_p)
            idx = jax.random.randint(k_idx, (), 0, pool_size)
            old = lax.dynamic_slice(imgs, (idx, 0, 0, 0), (1, *imgs.shape[1:]))[0]
            swap = p > 0.5
            ret = jnp.where(swap, old, img)
            new_slot = jnp.where(swap, img, old)
            imgs = lax.dynamic_update_slice(imgs, new_slot[None], (idx, 0, 0, 0))
            out = lax.dynamic_update_slice(out, ret[None], (i, 0, 0, 0))
            return imgs, cnt, out

        return lax.cond(cnt < pool_size, insert, replay, (imgs, cnt, out))

    out0 = jnp.zeros_like(batch)
    images, count, out = lax.fori_loop(0, b, body, (images, count, out0))
    return images, count, out
