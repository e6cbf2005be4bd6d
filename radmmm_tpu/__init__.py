"""radmmm_tpu — a TPU-native multilingual multi-speaker TTS framework.

A ground-up JAX/XLA/Pallas re-design of the capabilities of NVIDIA's RAD-MMM
(multilingual multi-accented multi-speaker text-to-speech with a normalizing-flow
mel decoder, unsupervised alignment, and deterministic attribute predictors).

Reference behavior is documented per-module with `file:line` citations into the
upstream repo (mounted read-only at /root/reference). The implementation is
TPU-first: channels-last layouts, masked batched ops instead of per-item loops,
lax.scan recurrences instead of packed sequences, device-side Viterbi alignment
instead of a host round-trip, and jit/pjit over a jax.sharding.Mesh instead of
DDP/NCCL.
"""

__version__ = "0.1.0"
