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

Multi-bucket artifacts: pass ``buckets=[(8, 96), (4, 48), (1, 32)]`` (or
``--export.buckets=8x96,4x48,1x32``) to compile several (batch, max_text)
entry points into ONE file; ``load_tts`` then accepts any request with
batch <= max B and text <= max T, dispatches to the smallest covering
bucket, pads (replicating row 0 for batch fill — sliced away on return),
and trims outputs back to the request size. Static shapes stay TPU-first;
the bucket set is the serving latency/padding-waste tradeoff knob.
"""
from __future__ import annotations

import functools
import json
import struct
from typing import Optional, Sequence, Tuple

import numpy as np

# container header for multi-bucket artifacts; single-bucket exports remain
# a raw jax.export blob (readable by older loaders)
_MAGIC = b"RMMTTSB1"


def make_tts_fn(model, variables, *, sigma: float = 0.8,
                max_frames: int = 1024, vocoder=None, vocoder_vars=None,
                pcm_int16: bool = True):
    """Pure function text→(mel|audio): params closed over as constants.

    Audio artifacts return int16 PCM by default, quantized ON DEVICE: a
    WAV response is 16-bit anyway, so converting before the device→host
    fetch moves 2 bytes/sample instead of 4 — half the serving egress
    (VERDICT r4 next #3; the reference's CPU vocode path never faces this,
    vocoder_utils.py:43)."""
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
            if pcm_int16:
                audio = jnp.round(
                    jnp.clip(audio.astype(jnp.float32), -1.0, 1.0)
                    * 32767.0).astype(jnp.int16)
            return audio, lens
        return mel, lens

    return tts


def _export_one(fn, B: int, T: int,
                platforms: Optional[Tuple[str, ...]]) -> bytes:
    import jax
    import jax.numpy as jnp
    from jax import export as jexport

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
    return jexport.export(jax.jit(fn), **kwargs)(*specs).serialize()


def export_tts(model, variables, path: str, *, batch_size: int = 8,
               max_text: int = 96, sigma: float = 0.8,
               max_frames: int = 1024, vocoder=None, vocoder_vars=None,
               buckets: Optional[Sequence[Tuple[int, int]]] = None,
               platforms: Optional[Tuple[str, ...]] = None) -> int:
    """AOT-export the TTS function to ``path``. Returns artifact bytes.

    With ``buckets`` (a list of (batch, max_text) pairs), every bucket is
    compiled into one container file and ``load_tts`` dispatches by request
    shape; otherwise a single raw (batch_size, max_text) blob is written.
    """
    fn = make_tts_fn(model, variables, sigma=sigma, max_frames=max_frames,
                     vocoder=vocoder, vocoder_vars=vocoder_vars)
    if not buckets:
        blob = _export_one(fn, batch_size, max_text, platforms)
        with open(path, "wb") as f:
            f.write(blob)
        return len(blob)

    entries, blobs, off = [], [], 0
    for B, T in buckets:
        blob = _export_one(fn, int(B), int(T), platforms)
        entries.append({"batch_size": int(B), "max_text": int(T),
                        "offset": off, "length": len(blob)})
        blobs.append(blob)
        off += len(blob)
    index = json.dumps({"version": 1, "entries": entries}).encode()
    with open(path, "wb") as f:
        f.write(_MAGIC)
        f.write(struct.pack("<Q", len(index)))
        f.write(index)
        for blob in blobs:
            f.write(blob)
    return len(_MAGIC) + 8 + len(index) + off


def _bucketed_call(exported_by_bucket):
    """Dispatching callable over {(B, T): Exported}: pick the smallest
    covering bucket, pad the request up to it, trim outputs back."""
    import jax.numpy as jnp

    buckets = sorted(exported_by_bucket, key=lambda bt: bt[0] * bt[1])

    def call(text, text_lens, speaker_ids, accent_ids, f0_mean, f0_std,
             seed):
        text = np.asarray(text)
        b, t = text.shape
        fit = [(B, T) for B, T in buckets if B >= b and T >= t]
        if not fit:
            raise ValueError(
                f"request shape ({b}, {t}) exceeds every exported bucket "
                f"{buckets}")
        B, T = fit[0]
        pad_rows = B - b
        text_p = np.zeros((B, T), text.dtype)
        text_p[:b, :t] = text
        per_item = []
        for a in (text_lens, speaker_ids, accent_ids, f0_mean, f0_std):
            a = np.asarray(a)
            # replicate row 0 into the batch fill: always a valid item,
            # its outputs are sliced away below
            per_item.append(np.concatenate(
                [a, np.repeat(a[:1], pad_rows, axis=0)]) if pad_rows else a)
        if pad_rows:
            text_p[b:] = text_p[:1]
        out, lens = exported_by_bucket[(B, T)].call(
            jnp.asarray(text_p), *[jnp.asarray(a) for a in per_item],
            jnp.asarray(seed))
        return out[:b], lens[:b]

    return call, buckets


def load_tts(path: str):
    """Deserialize an exported artifact into a callable (no model code).

    Handles both raw single-bucket blobs and multi-bucket containers; the
    returned callable exposes ``in_avals``/``platforms`` and, for
    containers, ``buckets`` plus shape-dispatching semantics.
    """
    from jax import export as jexport

    with open(path, "rb") as f:
        data = f.read()

    if not data.startswith(_MAGIC):
        exported = jexport.deserialize(data)

        def call(*args):
            import jax.numpy as jnp
            return exported.call(*[jnp.asarray(a) for a in args])

        call.in_avals = exported.in_avals
        call.out_avals = exported.out_avals
        call.platforms = exported.platforms
        call.buckets = [tuple(exported.in_avals[0].shape)]
        return call

    (n_index,) = struct.unpack_from("<Q", data, len(_MAGIC))
    body = len(_MAGIC) + 8
    index = json.loads(data[body:body + n_index].decode())
    base = body + n_index
    exported_by_bucket = {}
    for e in index["entries"]:
        blob = data[base + e["offset"]:base + e["offset"] + e["length"]]
        exported_by_bucket[(e["batch_size"], e["max_text"])] = \
            jexport.deserialize(blob)

    call, buckets = _bucketed_call(exported_by_bucket)
    biggest = exported_by_bucket[buckets[-1]]
    call.in_avals = biggest.in_avals
    call.out_avals = biggest.out_avals
    call.platforms = biggest.platforms
    call.buckets = buckets
    return call
