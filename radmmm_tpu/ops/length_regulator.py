"""Length regulation: expand text frames by integer durations, batched.

The reference loops per item and per frame with torch.cat
(common.py:208-237). Here: output frame t takes text index
searchsorted(cumsum(dur), t, 'right') — one gather, fully batched.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def regulate_length(x: jax.Array, durations: jax.Array, max_out_len: int):
    """x: (B, T_text, C); durations: (B, T_text) ints >= 0.

    Returns (out (B, max_out_len, C), out_lens (B,)) with zero padding past
    sum(durations).
    """
    ends = jnp.cumsum(durations, axis=1)                  # (B, T_text)
    out_lens = ends[:, -1]
    t = jnp.arange(max_out_len)

    def per_item(ends_i):
        return jnp.searchsorted(ends_i, t, side="right")

    idx = jax.vmap(per_item)(ends)                        # (B, max_out)
    idx = jnp.minimum(idx, x.shape[1] - 1)
    out = jnp.take_along_axis(x, idx[:, :, None], axis=1)
    valid = t[None, :] < out_lens[:, None]
    return out * valid[:, :, None].astype(x.dtype), out_lens
