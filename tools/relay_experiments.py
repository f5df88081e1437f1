"""Closed-experiment record: chunk-input staging variants for the k-step
chained train step (docs/PERF.md "relay pathologies").

The product path is ``models.base_model.make_fused_chunk_step`` — k
channel-fused (N,H,W,6) per-batch puts, split+stacked in-jit. Two other
stagings were built and measured on the way there; this module keeps the
losing one so the measurement survives outside the product module
(VERDICT r4 weak #6):

1. HOST-stacked chunk (one (k,N,H,W,C) put per side): a relay-attached
   device completes one k-stacked put ~30x slower than k pipelined
   per-batch puts — measured (tools/chunk_trace.py, v5e via relay, k=8
   b16 uint8): a single 2x25 MB stacked put + chained dispatch takes
   4.4-5.6 s to complete while the staged chunk executes in 0.93 s and
   3 MB puts land in ~4 ms each. The relay fragments large transfers
   into frames that each pay its completion-event latency.
2. SPLIT per-side puts (this module, ``make_split_chained_step``): k
   puts per batch arg (2k total at the pix2pix signature). Works, but
   every fresh put's completion event serializes at ~120 ms once the
   big program is resident, so put COUNT is the cost driver — fusing
   A|B along channels halves it (k puts), which is the shipped variant.
"""

import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dsgan_tpu.models.base_model import make_chained_step


def make_split_chained_step(step_fn, k, n_batch_args=2):
    """make_chained_step, but fed k SEPARATE per-batch arrays per side and
    stacked INSIDE the jitted program.

    ``(state, A_0..A_{k-1}, B_0..B_{k-1}, ..., lr) -> same outputs``

    Superseded by make_fused_chunk_step (half the H2D puts); kept as the
    measured record of the stacked-put pathology — see module docstring.
    """
    import jax.numpy as jnp

    chained = make_chained_step(step_fn)

    def split(state, *args):
        flat, lr = args[:-1], args[-1]
        assert len(flat) == k * n_batch_args, (len(flat), k, n_batch_args)
        stacked = tuple(
            jnp.stack(flat[i * k:(i + 1) * k]) for i in range(n_batch_args)
        )
        return chained(state, *stacked, lr)

    return split
