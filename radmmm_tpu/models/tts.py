"""Top-level TTS model: embeddings + encoder + aligner + flow + predictors.

Functional re-design of the reference's TTSModel LightningModule
(tts_lightning_modules.py:53-859). The flax module owns all trainable
submodules; training/inference *steps* (loss aggregation, optimizer,
sampling loops) live in radmmm_tpu.training as pure jitted functions.

Key behavior parity points:
* mel_scale/descale fixed affine (mel+5)/2 (tts_lightning_modules.py:543-549)
* attention keys = raw text embeddings (optionally + speaker/accent vecs,
  detached) — not the encoder output (tts_lightning_modules.py:440-466)
* context = attn @ txt_enc (tts_lightning_modules.py:670)
* attribute predictors consume *detached* context/speaker/accent
  (tts_lightning_modules.py:688-727)
* duration targets = attn summed over mel frames, log-space prediction
  (tts_lightning_modules.py:720-727)
* full sampling pipeline: durations -> voiced -> F0 (optionally re-shifted
  to speaker stats) -> energy -> flow inverse -> descale
  (tts_lightning_modules.py:286-384)
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from radmmm_tpu.models.attributes import ConvLSTMLinearDAP
from radmmm_tpu.models.encoder import TextEncoder
from radmmm_tpu.models.flow_decoder import RADMMMFlow
from radmmm_tpu.ops.alignment import binarize_attention
from radmmm_tpu.ops.attention import ConvAttention
from radmmm_tpu.ops.length_regulator import regulate_length
from radmmm_tpu.ops.lstm import multi_bilstm_scan
from radmmm_tpu.utils.masking import SeqLens


@dataclasses.dataclass(frozen=True)
class TTSConfig:
    """Hyperparameters mirroring the reference's shipped RADMMM config
    (configs/RADMMM_model_config.yaml + attribute configs)."""
    n_text_tokens: int = 426
    n_text_dim: int = 512
    n_speakers: int = 7
    n_speaker_dim: int = 16
    n_augmentations: int = 0          # augmented copies get new speaker ids
    use_accent: bool = True
    n_accents: int = 7
    n_accent_dim: int = 8
    n_mel_channels: int = 80
    use_accent_emb_for_encoder: bool = True
    use_accent_emb_for_decoder: bool = False
    use_accent_emb_for_alignment: bool = False
    use_speaker_emb_for_alignment: bool = True
    encoder_n_convolutions: int = 3
    encoder_kernel_size: int = 5
    encoder_p_dropout: float = 0.5
    lstm_norm_fn: Optional[str] = "spectral"
    scale_mel: bool = True
    f0_loss_voiced_only: bool = True
    # run the frame-level predictors' (f0/energy/voiced) BiLSTMs as ONE
    # fused scan (6 direction-lanes in the carry) instead of 3 serial
    # scans; mathematically identical, ~3x fewer serial recurrence steps
    gang_frame_predictors: bool = True
    decoder: Dict[str, Any] = dataclasses.field(default_factory=dict)
    f0_predictor: Optional[Dict[str, Any]] = None
    energy_predictor: Optional[Dict[str, Any]] = None
    voiced_predictor: Optional[Dict[str, Any]] = None
    duration_predictor: Optional[Dict[str, Any]] = None

    @property
    def total_speakers(self) -> int:
        return self.n_speakers * (1 + self.n_augmentations)

    @property
    def encoder_dim(self) -> int:
        return self.n_text_dim + (self.n_accent_dim
                                  if self.use_accent_emb_for_encoder else 0)


def default_radmmm_config(**overrides) -> TTSConfig:
    """The shipped 7-language RADMMM recipe, matching the reference yaml.

    Note the reference feeds the *encoder-dim* text dim (520) to the decoder
    and predictors (configs/RADMMM_model_config.yaml:23).
    """
    cfg = dict(
        n_augmentations=2,
        decoder=dict(n_speaker_dim=16, use_accent=True, n_accent_dim=8,
                     n_text_dim=520, use_context_lstm=True,
                     context_lstm_norm=None, n_f0_dims=1,
                     n_energy_avg_dims=1, context_w_f0_and_energy=True,
                     n_mel_channels=80, n_flows=8,
                     n_conv_layers_per_step=4, n_early_size=2,
                     n_early_every=2, n_group_size=2, affine_model="wavenet",
                     scaling_fn="tanh", affine_activation="softplus",
                     use_partial_padding=True,
                     use_accent_emb_for_decoder=False),
    )
    dap = dict(n_speaker_dim=16, n_accent_dim=8, use_accent_embedding=True,
               in_dim=520, out_dim=1, reduction_factor=16,
               n_backbone_layers=3, n_hidden=256, kernel_size=5,
               p_dropout=0.5, lstm_type="bilstm")
    cfg["f0_predictor"] = dict(dap, target_offset=-5.0)
    cfg["energy_predictor"] = dict(dap, target_offset=-0.75)
    cfg["voiced_predictor"] = dict(dap)
    cfg["duration_predictor"] = dict(dap, log_target=True)
    cfg.update(overrides)
    return TTSConfig(**cfg)


def mel_scale(mel):
    return (mel + 5.0) / 2.0


def mel_descale(mel):
    return mel * 2.0 - 5.0


class TTSModel(nn.Module):
    config: TTSConfig

    def setup(self):
        c = self.config
        self.text_embeddings = nn.Embed(
            c.n_text_tokens, c.n_text_dim,
            embedding_init=nn.initializers.normal(1.0))
        self.speaker_embeddings = nn.Embed(
            c.total_speakers, c.n_speaker_dim,
            embedding_init=nn.initializers.normal(1.0))
        if c.use_accent:
            self.accent_embeddings = nn.Embed(
                c.n_accents, c.n_accent_dim,
                embedding_init=nn.initializers.normal(1.0))
        self.text_encoder = TextEncoder(
            encoder_n_convolutions=c.encoder_n_convolutions,
            encoder_embedding_dim=c.encoder_dim,
            encoder_kernel_size=c.encoder_kernel_size,
            lstm_norm_fn=c.lstm_norm_fn,
            p_dropout=c.encoder_p_dropout)

        attention_key_dim = c.n_text_dim
        if c.use_accent_emb_for_alignment:
            attention_key_dim += c.n_accent_dim
        elif c.use_speaker_emb_for_alignment:
            attention_key_dim += c.n_speaker_dim
        self.attention = ConvAttention(c.n_mel_channels, attention_key_dim)

        self.decoder = RADMMMFlow(**c.decoder)
        # predictor backbone chosen by the reference's class_path
        # (attribute_predictors.ConvLSTMLinearDAP / LSTMConvDAP — the RADTTS
        # duration recipe uses the LSTMConv backbone)
        from radmmm_tpu.models.attributes import LSTMConvDAP
        dap_classes = {"ConvLSTMLinearDAP": ConvLSTMLinearDAP,
                       "LSTMConvDAP": LSTMConvDAP}
        for attr in ("f0_predictor", "energy_predictor", "voiced_predictor",
                     "duration_predictor"):
            pcfg = getattr(c, attr)
            if pcfg is None:
                setattr(self, attr, None)
                continue
            pcfg = dict(pcfg)
            cls = dap_classes[pcfg.pop("_class", "ConvLSTMLinearDAP")]
            setattr(self, attr, cls(**pcfg))

    # ---- pieces -----------------------------------------------------------
    def encode_speaker(self, spk_ids):
        return self.speaker_embeddings(spk_ids)

    def encode_accent(self, accent_ids):
        return self.accent_embeddings(accent_ids)

    def encode_text(self, text, lens: SeqLens, accent_vecs=None, train=True):
        """-> (txt_enc (B,T,encoder_dim), txt_emb (B,T,n_text_dim))."""
        txt_emb = self.text_embeddings(text)
        if accent_vecs is not None and self.config.use_accent_emb_for_encoder:
            acc = jnp.broadcast_to(
                accent_vecs[:, None, :],
                (*txt_emb.shape[:2], accent_vecs.shape[-1]))
            enc_in = jnp.concatenate([txt_emb, acc], axis=-1)
        else:
            enc_in = txt_emb
        txt_enc = self.text_encoder(enc_in, lens.mask, train=train)
        return txt_enc, txt_emb

    def compute_attention(self, mel, txt_emb, spk_vecs, accent_vecs,
                          out_lens: SeqLens, in_lens: SeqLens,
                          attn_prior, binarize: bool):
        keys = txt_emb
        c = self.config
        if c.use_accent_emb_for_alignment:
            extra = accent_vecs
        elif c.use_speaker_emb_for_alignment:
            extra = spk_vecs
        else:
            extra = None
        if extra is not None:
            extra = jax.lax.stop_gradient(extra)
            keys = jnp.concatenate(
                [keys, jnp.broadcast_to(extra[:, None, :],
                                        (*keys.shape[:2], extra.shape[-1]))],
                axis=-1)
        attn_soft, attn_logprob = self.attention(
            mel, keys, key_mask=in_lens.mask, attn_prior=attn_prior)
        attn_hard = None
        if binarize:
            # fully detached hard attention, as the reference uses for
            # context/durations (tts_lightning_modules.py:470, :270-284)
            attn = binarize_attention(attn_soft, in_lens.lengths,
                                      out_lens.lengths)
            attn_hard = attn
        else:
            attn = attn_soft
        return attn, attn_soft, attn_hard, attn_logprob

    def _gangable(self, mods) -> bool:
        """True when the frame-level predictors' BiLSTMs have identical
        shapes and can be fused into one multi_bilstm_scan."""
        if not self.config.gang_frame_predictors or len(mods) < 2:
            return False
        if not all(isinstance(m, ConvLSTMLinearDAP) for m in mods):
            return False
        return all(m.lstm_type == "bilstm" and m.n_hidden == mods[0].n_hidden
                   for m in mods)

    def _infer_frame_attrs(self, context, f0_spk, energy_spk, out_lens,
                           accent_vecs, f0_mean, f0_std):
        """(voiced_logits, f0, energy) at inference. voiced/f0/energy are
        independent given context, so their BiLSTMs gang into one fused
        scan exactly as in training."""
        mods = [self.voiced_predictor, self.f0_predictor,
                self.energy_predictor]
        if self._gangable(mods):
            spks = [f0_spk, f0_spk, energy_spk]
            pre = [m(None, context, s, out_lens, accent_emb=accent_vecs,
                     train=False, phase="pre") for m, s in zip(mods, spks)]
            ys = multi_bilstm_scan(
                jnp.stack([p["conv"] for p in pre]), out_lens.mask,
                jnp.stack([p["lstm"]["wi"] for p in pre]),
                jnp.stack([p["lstm"]["wh"] for p in pre]),
                jnp.stack([p["lstm"]["bias"] for p in pre]))
            hats = [m(None, None, None, out_lens, train=False,
                      phase="post", lstm_out=ys[i])["x_hat"]
                    for i, m in enumerate(mods)]
            return (mods[0].inv_tx(hats[0]),
                    mods[1].inv_tx(hats[1], x_mean=f0_mean, x_std=f0_std),
                    mods[2].inv_tx(hats[2]))
        voiced_logits = self.voiced_predictor.infer(
            context, f0_spk, out_lens, accent_emb=accent_vecs)
        f0 = self.f0_predictor.infer(
            context, f0_spk, out_lens, x_mean=f0_mean, x_std=f0_std,
            accent_emb=accent_vecs)
        energy = self.energy_predictor.infer(
            context, energy_spk, out_lens, accent_emb=accent_vecs)
        return voiced_logits, f0, energy

    # ---- training forward -------------------------------------------------
    def __call__(self, batch: Dict[str, jax.Array], binarize: bool = False,
                 train: bool = True, sync_bn: bool = False):
        """Training/validation forward (tts_lightning_modules.py:643-750).

        batch: text (B,Tt) int, input_lengths, mel (B,Tm,80) raw,
        output_lengths, speaker_ids, accent_ids, f0 (B,Tm), voiced_mask,
        energy_avg, attn_prior (B,Tm,Tt), speaker_f0_mean/std.
        """
        c = self.config
        in_lens = SeqLens.create(batch["input_lengths"],
                                 batch["text"].shape[1])
        out_lens = SeqLens.create(batch["output_lengths"],
                                  batch["mel"].shape[1])
        mel = mel_scale(batch["mel"]) if c.scale_mel else batch["mel"]

        spk_vecs = self.encode_speaker(batch["speaker_ids"])
        accent_vecs = (self.encode_accent(batch["accent_ids"])
                       if c.use_accent else None)
        txt_enc, txt_emb = self.encode_text(batch["text"], in_lens,
                                            accent_vecs, train=train)
        attn, attn_soft, attn_hard, attn_logprob = self.compute_attention(
            mel, txt_emb, spk_vecs, accent_vecs, out_lens, in_lens,
            batch.get("attn_prior"), binarize)

        # (B, Tm, Tt) @ (B, Tt, C) -> (B, Tm, C)
        context = jnp.einsum("bmt,btc->bmc", attn, txt_enc,
                             precision=jax.lax.Precision.HIGHEST)

        outputs = self.decoder(mel, spk_vecs, context, out_lens,
                               f0=batch.get("f0"),
                               energy_avg=batch.get("energy_avg"),
                               accent_vecs=accent_vecs, train=train,
                               sync_bn=sync_bn)
        outputs.update(attn=attn, attn_soft=attn_soft,
                       attn_logprob=attn_logprob, context=context,
                       spk_vecs=spk_vecs, accent_vecs=accent_vecs,
                       txt_enc=txt_enc)

        sg = jax.lax.stop_gradient
        ctx_d, spk_d = sg(context), sg(spk_vecs)
        acc_d = sg(accent_vecs) if accent_vecs is not None else None
        # frame-level predictors: (out_key, module, target, extra kwargs)
        frame_preds = []
        if self.f0_predictor is not None:
            frame_preds.append(
                ("f0_outputs", self.f0_predictor, batch["f0"][..., None],
                 dict(x_mean=batch.get("speaker_f0_mean"),
                      x_std=batch.get("speaker_f0_std"))))
        if self.energy_predictor is not None:
            frame_preds.append(("energy_outputs", self.energy_predictor,
                                batch["energy_avg"][..., None], {}))
        if self.voiced_predictor is not None:
            frame_preds.append(("voiced_outputs", self.voiced_predictor,
                                batch["voiced_mask"][..., None], {}))
        if self._gangable([m for _, m, _, _ in frame_preds]):
            # all three recurrences share mask/hidden size: run the conv
            # stacks, then ONE fused 6-lane scan, then the output linears
            pre = [m(t, ctx_d, spk_d, out_lens, accent_emb=acc_d,
                     train=train, phase="pre", **kw)
                   for _, m, t, kw in frame_preds]
            ys = multi_bilstm_scan(
                jnp.stack([p["conv"] for p in pre]), out_lens.mask,
                jnp.stack([p["lstm"]["wi"] for p in pre]),
                jnp.stack([p["lstm"]["wh"] for p in pre]),
                jnp.stack([p["lstm"]["bias"] for p in pre]))
            for i, (key, m, _, _) in enumerate(frame_preds):
                outputs[key] = m(pre[i]["x"], None, spk_d, out_lens,
                                 train=train, phase="post", lstm_out=ys[i])
        else:
            for key, m, t, kw in frame_preds:
                outputs[key] = m(t, ctx_d, spk_d, out_lens,
                                 accent_emb=acc_d, train=train, **kw)
        if self.duration_predictor is not None:
            duration_targets = sg(attn.sum(axis=1))[..., None]  # (B,Tt,1)
            outputs["duration_outputs"] = self.duration_predictor(
                duration_targets, sg(txt_enc), spk_d, in_lens,
                accent_emb=acc_d, train=train)
        return outputs

    # ---- inference --------------------------------------------------------
    def infer_durations(self, text, text_lens, duration_speaker_ids,
                        accent_ids=None, token_duration_max: int = 100):
        """Stage A of two-stage serving: text -> encoder states, token
        durations, and total frame counts.

        Cheap relative to decoding. Its `n_frames` output lets a server
        pick the smallest compiled mel-frame bucket for `infer_decode`, so
        the flow decoder + vocoder run near the utterance's real length
        instead of a global max_frames. (The reference's sample_full,
        tts_lightning_modules.py:286-384, is monolithic at a fixed max; on
        TPU, static shapes make the bucketed split the idiomatic serving
        shape — only the few-byte n_frames crosses to the host between
        stages, txt_enc/durations stay device-resident.)
        """
        c = self.config
        in_lens = SeqLens.create(text_lens, text.shape[1])
        dur_spk = self.encode_speaker(duration_speaker_ids)
        accent_vecs = (self.encode_accent(accent_ids)
                       if (c.use_accent and accent_ids is not None) else None)
        txt_enc, _ = self.encode_text(text, in_lens, accent_vecs,
                                      train=False)
        durations = self.duration_predictor.infer(
            txt_enc, dur_spk, in_lens, accent_emb=accent_vecs)[..., 0]
        durations = jnp.clip(jnp.round(durations), 1, token_duration_max)
        durations = (durations * in_lens.fmask(durations.dtype)).astype(jnp.int32)
        return {"txt_enc": txt_enc, "durations": durations,
                "n_frames": durations.sum(-1)}

    def infer_decode(self, rng, txt_enc, durations, speaker_ids,
                     decoder_speaker_ids=None, f0_speaker_ids=None,
                     energy_speaker_ids=None, accent_ids=None, f0_mean=None,
                     f0_std=None, sigma: float = 1.0, max_frames: int = 1024,
                     shift_stats: bool = True):
        """Stage B of two-stage serving: encoder states + durations -> mel.

        Everything from length regulation onward (frame attributes, flow
        decoder sampling); `max_frames` is the compiled bucket picked from
        stage A's n_frames. `infer` composes A and B at one max_frames.
        """
        c = self.config
        if decoder_speaker_ids is None:
            decoder_speaker_ids = speaker_ids
        if f0_speaker_ids is None:
            f0_speaker_ids = speaker_ids
        if energy_speaker_ids is None:
            energy_speaker_ids = speaker_ids

        dec_spk = self.encode_speaker(decoder_speaker_ids)
        f0_spk = self.encode_speaker(f0_speaker_ids)
        energy_spk = self.encode_speaker(energy_speaker_ids)
        accent_vecs = (self.encode_accent(accent_ids)
                       if (c.use_accent and accent_ids is not None) else None)

        context, out_len_vals = regulate_length(txt_enc, durations,
                                                max_frames)
        out_lens = SeqLens.create(jnp.minimum(out_len_vals, max_frames),
                                  max_frames)

        voiced_logits, f0_raw, energy = self._infer_frame_attrs(
            context, f0_spk, energy_spk, out_lens, accent_vecs,
            f0_mean, f0_std)
        voiced = jax.nn.sigmoid(voiced_logits) > 0.5
        f0 = f0_raw * voiced

        if shift_stats and f0_mean is not None:
            # batch-global voiced stats, as in the reference
            # (tts_lightning_modules.py:367-376)
            vm = (voiced & out_lens.mask[..., None]).astype(f0.dtype)
            n = jnp.maximum(vm.sum(), 1.0)
            mu = (f0 * vm).sum() / n
            var = ((f0 - mu) ** 2 * vm).sum() / n
            f0n = (f0 - mu) / jnp.sqrt(jnp.maximum(var, 1e-8))
            f0_shifted = f0n * f0_std[:, None, None] + f0_mean[:, None, None]
            f0 = jnp.where(vm > 0, f0_shifted, f0)

        dec_out = self.decoder.infer(
            rng, dec_spk, txt_enc, sigma, dur=durations, f0=f0[..., 0],
            energy_avg=energy[..., 0], lens=out_lens,
            accent_vecs=accent_vecs)
        mel = mel_descale(dec_out["mel"]) if c.scale_mel else dec_out["mel"]
        return {"mel": mel, "lens": out_lens, "durations": durations,
                "f0": f0, "energy": energy, "voiced": voiced}

    def infer(self, rng, text, text_lens, speaker_ids,
              decoder_speaker_ids=None, f0_speaker_ids=None,
              energy_speaker_ids=None, duration_speaker_ids=None,
              accent_ids=None, f0_mean=None, f0_std=None, sigma: float = 1.0,
              max_frames: int = 1024, shift_stats: bool = True,
              token_duration_max: int = 100):
        """Full TTS sampling (sample_full, tts_lightning_modules.py:286-384):
        infer_durations + infer_decode at one max_frames.

        Returns dict with mel (B, max_frames, n_mel) (descaled) and lens.
        """
        if duration_speaker_ids is None:
            duration_speaker_ids = speaker_ids
        d = self.infer_durations(text, text_lens, duration_speaker_ids,
                                 accent_ids=accent_ids,
                                 token_duration_max=token_duration_max)
        return self.infer_decode(
            rng, d["txt_enc"], d["durations"], speaker_ids,
            decoder_speaker_ids=decoder_speaker_ids,
            f0_speaker_ids=f0_speaker_ids,
            energy_speaker_ids=energy_speaker_ids, accent_ids=accent_ids,
            f0_mean=f0_mean, f0_std=f0_std, sigma=sigma,
            max_frames=max_frames, shift_stats=shift_stats)

    def reconstruct(self, rng, batch, sigma: float = 1.0):
        """Reconstruction/voice-cloning path: GT F0/energy + MAS durations
        (reconstruct_from_batch_attributes,
        tts_lightning_modules.py:389-437)."""
        c = self.config
        in_lens = SeqLens.create(batch["input_lengths"],
                                 batch["text"].shape[1])
        out_lens = SeqLens.create(batch["output_lengths"],
                                  batch["mel"].shape[1])
        mel = mel_scale(batch["mel"]) if c.scale_mel else batch["mel"]
        spk_vecs = self.encode_speaker(batch["speaker_ids"])
        accent_vecs = (self.encode_accent(batch["accent_ids"])
                       if c.use_accent else None)
        txt_enc, txt_emb = self.encode_text(batch["text"], in_lens,
                                            accent_vecs, train=False)
        attn, attn_soft, _, _ = self.compute_attention(
            mel, txt_emb, spk_vecs, accent_vecs, out_lens, in_lens,
            batch.get("attn_prior"), binarize=True)
        durations = attn.sum(axis=1).astype(jnp.int32)   # (B, Tt)
        dec_out = self.decoder.infer(
            rng, spk_vecs, txt_enc, sigma, dur=durations,
            f0=batch.get("f0"), energy_avg=batch.get("energy_avg"),
            lens=out_lens, accent_vecs=accent_vecs)
        out_mel = (mel_descale(dec_out["mel"]) if c.scale_mel
                   else dec_out["mel"])
        return {"mel": out_mel, "attn": attn, "attn_soft": attn_soft,
                "durations": durations, "lens": out_lens}
