"""Sequence-length masking utilities.

TPU-native equivalent of the reference's ``SequenceLength`` wrapper and
``get_mask_from_lengths`` (reference: common.py:105-128). Unlike the torch
version, masks here are built against a *static* padded length (required for
XLA's static shapes) rather than ``lengths.max()``.
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp


def mask_from_lengths(lengths: jax.Array, max_len: int) -> jax.Array:
    """Binary mask of shape (B, max_len): True for valid positions.

    Mirrors get_mask_from_lengths (common.py:105-116) but with a static
    max_len so it can live under jit.
    """
    ids = jnp.arange(max_len, dtype=lengths.dtype)
    return ids[None, :] < lengths[:, None]


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class SeqLens:
    """Lengths + cached boolean mask for a padded batch (B, T).

    JAX analogue of the reference SequenceLength (common.py:123-128); a frozen
    pytree so it can be passed through jit boundaries.
    """

    lengths: jax.Array  # (B,) int32
    mask: jax.Array     # (B, T) bool

    @classmethod
    def create(cls, lengths: jax.Array, max_len: int) -> "SeqLens":
        lengths = lengths.astype(jnp.int32)
        return cls(lengths=lengths, mask=mask_from_lengths(lengths, max_len))

    @property
    def max_len(self) -> int:
        return self.mask.shape[-1]

    def downsample(self, factor: int) -> "SeqLens":
        """Lengths // factor with mask at T // factor frames.

        Used for the n_group_size "squeeze" (reference decoders.py:182).
        """
        new_len = self.mask.shape[-1] // factor
        new_lengths = self.lengths // factor
        return SeqLens(lengths=new_lengths,
                       mask=mask_from_lengths(new_lengths, new_len))

    def fmask(self, dtype=jnp.float32) -> jax.Array:
        return self.mask.astype(dtype)
