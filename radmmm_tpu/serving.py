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
            audio = vocoder.apply(vocoder_vars,
                                  mel.astype(_param_dtype(vocoder_vars)))
            if pcm_int16:
                audio = jnp.round(
                    jnp.clip(audio.astype(jnp.float32), -1.0, 1.0)
                    * 32767.0).astype(jnp.int16)
            return audio, lens
        return mel, lens

    return tts


def _param_dtype(variables):
    """dtype of a variable collection's leaves — serving commonly carries
    bf16-cast vocoder params (halves HBM traffic on the upsampled
    sequences); the mel input must match the conv kernels' dtype."""
    import jax
    return jax.tree_util.tree_leaves(variables)[0].dtype


def make_two_stage_fns(model, variables, *, sigma: float = 0.8,
                       vocoder=None, vocoder_vars=None,
                       pcm_int16: bool = True):
    """Two-stage serving: (dur_fn, make_decode) pure functions.

    Stage A (`dur_fn`): text -> (txt_enc, durations, n_frames). Stage B
    (`make_decode(max_frames)`): (txt_enc, durations, ...) -> (audio|mel,
    lens) at one compiled mel-frame bucket. A server runs stage A, fetches
    only the few-byte n_frames, picks the smallest bucket covering the
    request, and dispatches stage B — so the flow decoder + vocoder (and
    the waveform egress) scale with the utterance's REAL length instead of
    a global max_frames. txt_enc/durations never leave the device.

    The reference synthesizes monolithically at a fixed max
    (tts_lightning_modules.py:286-384); with XLA's static shapes the
    bucketed split is the idiomatic TPU serving shape.
    """
    import jax
    import jax.numpy as jnp

    from radmmm_tpu.models.tts import TTSModel

    def dur_fn(text, text_lens, speaker_ids, accent_ids):
        out = model.apply(variables, text, text_lens, speaker_ids,
                          accent_ids=accent_ids,
                          method=TTSModel.infer_durations)
        return out["txt_enc"], out["durations"], out["n_frames"]

    def make_decode(max_frames: int):
        def decode(txt_enc, durations, speaker_ids, accent_ids, f0_mean,
                   f0_std, seed):
            key = jax.random.PRNGKey(seed)
            out = model.apply(variables, key, txt_enc, durations,
                              speaker_ids, accent_ids=accent_ids,
                              f0_mean=f0_mean, f0_std=f0_std, sigma=sigma,
                              max_frames=int(max_frames),
                              method=TTSModel.infer_decode)
            mel, lens = out["mel"], out["lens"].lengths
            if vocoder is not None:
                audio = vocoder.apply(vocoder_vars,
                                      mel.astype(_param_dtype(vocoder_vars)))
                if pcm_int16:
                    audio = jnp.round(
                        jnp.clip(audio.astype(jnp.float32), -1.0, 1.0)
                        * 32767.0).astype(jnp.int16)
                return audio, lens
            return mel, lens
        return decode

    return dur_fn, make_decode


class TwoStageTTS:
    """In-process two-stage bucketed TTS (same 7-arg call as make_tts_fn's
    output): stage A on device, a tiny n_frames fetch, stage B at the
    smallest compiled mel-frame bucket covering the batch."""

    def __init__(self, model, variables,
                 frame_buckets: Sequence[int] = (192, 384, 576, 800),
                 **kw):
        import jax
        dur_fn, make_decode = make_two_stage_fns(model, variables, **kw)
        self.dur = jax.jit(dur_fn)
        self.frame_buckets = sorted(int(f) for f in frame_buckets)
        self.decode = {f: jax.jit(make_decode(f))
                       for f in self.frame_buckets}

    def pick_bucket(self, n_frames) -> int:
        need = int(np.asarray(n_frames).max())
        # over the largest bucket: decode clamps there (same truncation
        # semantics as single-stage infer at that max_frames)
        return next((f for f in self.frame_buckets if f >= need),
                    self.frame_buckets[-1])

    def __call__(self, text, text_lens, speaker_ids, accent_ids, f0_mean,
                 f0_std, seed):
        txt_enc, durations, n_frames = self.dur(text, text_lens,
                                                speaker_ids, accent_ids)
        mf = self.pick_bucket(n_frames)
        return self.decode[mf](txt_enc, durations, speaker_ids, accent_ids,
                               f0_mean, f0_std, seed)


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
               frame_buckets: Optional[Sequence[int]] = None,
               platforms: Optional[Tuple[str, ...]] = None) -> int:
    """AOT-export the TTS function to ``path``. Returns artifact bytes.

    With ``buckets`` (a list of (batch, max_text) pairs), every bucket is
    compiled into one container file and ``load_tts`` dispatches by request
    shape; otherwise a single raw (batch_size, max_text) blob is written.

    With ``frame_buckets`` (a list of max mel-frame counts), the artifact
    is TWO-STAGE: per (batch, max_text) bucket one duration program plus
    one decode program per frame bucket; ``load_tts`` runs durations,
    reads only n_frames back, and decodes at the smallest covering frame
    bucket (see make_two_stage_fns).
    """
    if frame_buckets:
        return _export_two_stage(
            model, variables, path,
            buckets=buckets or [(batch_size, max_text)],
            frame_buckets=frame_buckets, sigma=sigma, vocoder=vocoder,
            vocoder_vars=vocoder_vars, platforms=platforms)
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


def _export_two_stage(model, variables, path: str, *, buckets,
                      frame_buckets, sigma, vocoder, vocoder_vars,
                      platforms) -> int:
    """Write a version-2 container: per (B, T) bucket a 'dur' program and
    one 'decode' program per mel-frame bucket."""
    import jax
    import jax.numpy as jnp
    from jax import export as jexport

    dur_fn, make_decode = make_two_stage_fns(
        model, variables, sigma=sigma, vocoder=vocoder,
        vocoder_vars=vocoder_vars)
    kwargs = {"platforms": platforms} if platforms else {}
    entries, blobs, off = [], [], 0

    def add(blob, **meta):
        nonlocal off
        entries.append(dict(meta, offset=off, length=len(blob)))
        blobs.append(blob)
        off += len(blob)

    for B, T in buckets:
        B, T = int(B), int(T)
        specs_a = (
            jax.ShapeDtypeStruct((B, T), jnp.int32),    # text
            jax.ShapeDtypeStruct((B,), jnp.int32),      # text_lens
            jax.ShapeDtypeStruct((B,), jnp.int32),      # speaker_ids
            jax.ShapeDtypeStruct((B,), jnp.int32),      # accent_ids
        )
        exp_a = jexport.export(jax.jit(dur_fn), **kwargs)(*specs_a)
        txt_enc_aval, durations_aval, _ = exp_a.out_avals
        add(exp_a.serialize(), stage="dur", batch_size=B, max_text=T)
        for F in sorted(int(f) for f in frame_buckets):
            specs_b = (
                txt_enc_aval, durations_aval,
                jax.ShapeDtypeStruct((B,), jnp.int32),      # speaker_ids
                jax.ShapeDtypeStruct((B,), jnp.int32),      # accent_ids
                jax.ShapeDtypeStruct((B,), jnp.float32),    # f0_mean
                jax.ShapeDtypeStruct((B,), jnp.float32),    # f0_std
                jax.ShapeDtypeStruct((), jnp.int32),        # seed
            )
            blob = jexport.export(jax.jit(make_decode(F)),
                                  **kwargs)(*specs_b).serialize()
            add(blob, stage="decode", batch_size=B, max_text=T,
                max_frames=F)

    index = json.dumps({"version": 2, "entries": entries}).encode()
    with open(path, "wb") as f:
        f.write(_MAGIC)
        f.write(struct.pack("<Q", len(index)))
        f.write(index)
        for blob in blobs:
            f.write(blob)
    return len(_MAGIC) + 8 + len(index) + off


def _pad_request(buckets, text, per_item):
    """Pick the smallest covering (B, T) bucket and pad the request to it:
    text zero-padded, per-item arrays batch-filled by replicating row 0
    (always a valid item; its outputs are sliced away by the caller)."""
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
    if pad_rows:
        text_p[b:] = text_p[:1]
    padded = []
    for a in per_item:
        a = np.asarray(a)
        padded.append(np.concatenate(
            [a, np.repeat(a[:1], pad_rows, axis=0)]) if pad_rows else a)
    return (B, T), b, text_p, padded


def _bucketed_call(exported_by_bucket):
    """Dispatching callable over {(B, T): Exported}: pick the smallest
    covering bucket, pad the request up to it, trim outputs back."""
    import jax.numpy as jnp

    buckets = sorted(exported_by_bucket, key=lambda bt: bt[0] * bt[1])

    def call(text, text_lens, speaker_ids, accent_ids, f0_mean, f0_std,
             seed):
        (B, T), b, text_p, per_item = _pad_request(
            buckets, text, (text_lens, speaker_ids, accent_ids, f0_mean,
                            f0_std))
        out, lens = exported_by_bucket[(B, T)].call(
            jnp.asarray(text_p), *[jnp.asarray(a) for a in per_item],
            jnp.asarray(seed))
        return out[:b], lens[:b]

    return call, buckets


def _two_stage_call(dur_by_bucket, decode_by_bucket):
    """Dispatching callable for version-2 (two-stage) artifacts: run the
    duration program, fetch only n_frames, decode at the smallest covering
    mel-frame bucket. Signature matches the single-stage callable."""
    import jax.numpy as jnp

    buckets = sorted(dur_by_bucket, key=lambda bt: bt[0] * bt[1])

    def call(text, text_lens, speaker_ids, accent_ids, f0_mean, f0_std,
             seed):
        (B, T), b, text_p, per_item = _pad_request(
            buckets, text, (text_lens, speaker_ids, accent_ids, f0_mean,
                            f0_std))
        text_lens_p, spk_p, acc_p, f0m_p, f0s_p = [
            jnp.asarray(a) for a in per_item]
        txt_enc, durations, n_frames = dur_by_bucket[(B, T)].call(
            jnp.asarray(text_p), text_lens_p, spk_p, acc_p)
        decodes = decode_by_bucket[(B, T)]
        frame_buckets = sorted(decodes)
        # only n_frames crosses to the host (a few bytes); real rows only —
        # batch fill replicates row 0, already covered by it
        need = int(np.asarray(n_frames)[:b].max())
        F = next((f for f in frame_buckets if f >= need), frame_buckets[-1])
        out, lens = decodes[F].call(txt_enc, durations, spk_p, acc_p,
                                    f0m_p, f0s_p, jnp.asarray(seed))
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

    if index.get("version", 1) >= 2:
        dur_by_bucket, decode_by_bucket = {}, {}
        for e in index["entries"]:
            blob = data[base + e["offset"]:base + e["offset"] + e["length"]]
            bt = (e["batch_size"], e["max_text"])
            if e["stage"] == "dur":
                dur_by_bucket[bt] = jexport.deserialize(blob)
            else:
                decode_by_bucket.setdefault(bt, {})[e["max_frames"]] = \
                    jexport.deserialize(blob)
        call, buckets = _two_stage_call(dur_by_bucket, decode_by_bucket)
        biggest = dur_by_bucket[buckets[-1]]
        call.in_avals = biggest.in_avals
        call.out_avals = next(iter(
            decode_by_bucket[buckets[-1]].values())).out_avals
        call.platforms = biggest.platforms
        call.buckets = buckets
        call.frame_buckets = sorted(decode_by_bucket[buckets[-1]])
        return call

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
