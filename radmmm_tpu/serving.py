"""Serving export: a self-contained, ahead-of-time-compiled TTS artifact.

`jax.export` serializes the jitted inference function — text → (audio |
mel) with the trained params baked in as constants — to a StableHLO
artifact that any process can deserialize and call WITHOUT the model code,
config system, or checkpoint files. This is the deployment story the
reference (a research repo, no serving path — SURVEY.md §0) leaves to the
user: one file, static shapes picked at export time (TPU-first), loadable
on the serving fleet.

    # offline
    python -m radmmm_tpu export -c model.yaml -c data.yaml \
        --export.path=tts.bin --export.batch_size=8

    # serving process
    from radmmm_tpu.serving import load_tts
    tts = load_tts("tts.bin")
    mel_or_audio, lens = tts(text_ids, text_lens, speaker_ids, accent_ids,
                             f0_mean, f0_std, seed)
"""
from __future__ import annotations

import functools
from typing import Optional, Tuple

import numpy as np


def make_tts_fn(model, variables, *, sigma: float = 0.8,
                max_frames: int = 1024, vocoder=None, vocoder_vars=None):
    """Pure function text→(mel|audio): params closed over as constants."""
    import jax
    import jax.numpy as jnp

    from radmmm_tpu.models.tts import TTSModel

    def tts(text, text_lens, speaker_ids, accent_ids, f0_mean, f0_std,
            seed):
        key = jax.random.PRNGKey(seed)
        out = model.apply(variables, key, text, text_lens, speaker_ids,
                          accent_ids=accent_ids, f0_mean=f0_mean,
                          f0_std=f0_std, sigma=sigma, max_frames=max_frames,
                          method=TTSModel.infer)
        mel, lens = out["mel"], out["lens"].lengths
        if vocoder is not None:
            audio = vocoder.apply(vocoder_vars, mel)
            return audio, lens
        return mel, lens

    return tts


def export_tts(model, variables, path: str, *, batch_size: int = 8,
               max_text: int = 96, sigma: float = 0.8,
               max_frames: int = 1024, vocoder=None, vocoder_vars=None,
               platforms: Optional[Tuple[str, ...]] = None) -> int:
    """AOT-export the TTS function to ``path``. Returns artifact bytes."""
    import jax
    import jax.numpy as jnp
    from jax import export as jexport

    fn = make_tts_fn(model, variables, sigma=sigma, max_frames=max_frames,
                     vocoder=vocoder, vocoder_vars=vocoder_vars)
    B, T = batch_size, max_text
    specs = (
        jax.ShapeDtypeStruct((B, T), jnp.int32),    # text
        jax.ShapeDtypeStruct((B,), jnp.int32),      # text_lens
        jax.ShapeDtypeStruct((B,), jnp.int32),      # speaker_ids
        jax.ShapeDtypeStruct((B,), jnp.int32),      # accent_ids
        jax.ShapeDtypeStruct((B,), jnp.float32),    # f0_mean
        jax.ShapeDtypeStruct((B,), jnp.float32),    # f0_std
        jax.ShapeDtypeStruct((), jnp.int32),        # seed
    )
    kwargs = {"platforms": platforms} if platforms else {}
    exported = jexport.export(jax.jit(fn), **kwargs)(*specs)
    blob = exported.serialize()
    with open(path, "wb") as f:
        f.write(blob)
    return len(blob)


def load_tts(path: str):
    """Deserialize an exported artifact into a callable (no model code)."""
    from jax import export as jexport

    with open(path, "rb") as f:
        exported = jexport.deserialize(f.read())

    def call(*args):
        import jax.numpy as jnp
        return exported.call(*[jnp.asarray(a) for a in args])

    call.in_avals = exported.in_avals
    call.platforms = exported.platforms
    return call
