"""RADMMM normalizing-flow mel decoder, TPU-native.

Reference behavior (decoders.py:36-248, models/radmmm.py:29-148):

* Context preprocessing: temporal "squeeze" by n_group_size, speaker (and
  optionally accent) vectors broadcast over time, F0/energy channels
  appended, then a bidirectional context LSTM.
* 8 FlowSteps: invertible 1x1 channel mix (data-initialized whitening at
  step 0, LU-parameterized elsewhere) followed by an affine (WaveNet-
  parameterized) or spline coupling. Early z-exit of n_early_size channels
  every n_early_every steps.
* Training runs mel -> z with logdets; inference runs z ~ N(0, sigma²) -> mel
  through the reversed flows (the reference samples with
  torch.cuda.FloatTensor, decoders.py:221 — here an explicit PRNG key).

Layout: channels-last (B, T, C). The squeeze matches the reference's
nn.Unfold ordering (channel-major within a group: index = c*g + k) so that
flow-channel semantics line up (decoders.py:119-122).
"""
from __future__ import annotations

from typing import Optional, Union

import jax
import jax.numpy as jnp
from flax import linen as nn

from radmmm_tpu.ops.coupling import AffineCoupling, SplineCoupling
from radmmm_tpu.ops.invertible import (InvertibleLU, WhiteningConv,
                                       whitening_stats,
                                       whitening_params_from_stats)
from radmmm_tpu.ops.lstm import MaskedLSTM
from radmmm_tpu.ops.length_regulator import regulate_length
from radmmm_tpu.utils.masking import SeqLens


def squeeze_time(x: jax.Array, g: int) -> jax.Array:
    """(B, T, C) -> (B, T//g, C*g), channel-major group layout."""
    if g == 1:
        return x
    B, T, C = x.shape
    Tg = (T // g) * g
    x = x[:, :Tg].reshape(B, T // g, g, C)
    return jnp.swapaxes(x, 2, 3).reshape(B, T // g, C * g)


def unsqueeze_time(x: jax.Array, g: int) -> jax.Array:
    """Inverse of squeeze_time."""
    if g == 1:
        return x
    B, Tg, Cg = x.shape
    x = x.reshape(B, Tg, Cg // g, g)
    return jnp.swapaxes(x, 2, 3).reshape(B, Tg * g, Cg // g)


class FlowStep(nn.Module):
    """Invertible 1x1 + coupling (decoders.py:36-80)."""
    n_channels: int
    n_context_dim: int
    n_layers: int
    step_index: int
    mode: str = "LUS"                 # 'LUS' | 'whiten'
    affine_model: str = "wavenet"
    scaling_fn: str = "tanh"
    affine_activation: str = "softplus"
    use_partial_padding: bool = True
    use_spline: bool = False
    use_bn: bool = True
    bn_axis_name: Optional[str] = None

    def setup(self):
        if self.mode == "whiten":
            self.invtbl_conv = WhiteningConv(self.n_channels,
                                             init_seed=self.step_index)
        else:
            self.invtbl_conv = InvertibleLU(self.n_channels,
                                            init_seed=self.step_index)
        if self.use_spline:
            self.coupling = SplineCoupling(
                self.n_channels, self.n_layers, n_bins=32,
                left=-3, right=3, bottom=-3, top=3, use_quadratic=True,
                use_bn=self.use_bn, bn_axis_name=self.bn_axis_name)
        else:
            self.coupling = AffineCoupling(
                self.n_channels, self.n_layers,
                affine_model=self.affine_model, scaling_fn=self.scaling_fn,
                affine_activation=self.affine_activation,
                use_partial_padding=self.use_partial_padding)

    def __call__(self, z, context, mask=None, inverse=False, train=True,
                 sync_bn=False):
        if inverse:
            z = self.coupling(z, context, mask, inverse=True, train=train,
                              sync_bn=sync_bn)
            return self.invtbl_conv(z, inverse=True)
        z, log_det_W = self.invtbl_conv(z)
        z, log_s = self.coupling(z, context, mask, train=train,
                                 sync_bn=sync_bn)
        return z, log_det_W, log_s


class RADMMMFlow(nn.Module):
    """Bipartite flow decoder P(mel | text, speaker, accent, F0, energy)."""
    n_speaker_dim: int = 16
    use_accent: bool = True
    n_accent_dim: int = 8
    n_text_dim: int = 512
    n_group_size: int = 2
    n_mel_channels: int = 80
    n_f0_dims: int = 1
    n_energy_avg_dims: int = 1
    context_w_f0_and_energy: bool = True
    use_context_lstm: bool = True
    context_lstm_norm: Optional[str] = None
    n_flows: int = 8
    n_conv_layers_per_step: int = 4
    n_early_size: int = 2
    n_early_every: int = 2
    affine_model: str = "wavenet"
    scaling_fn: str = "tanh"
    affine_activation: str = "softplus"
    use_partial_padding: bool = True
    n_splines: int = 0
    use_bn: bool = True
    use_accent_emb_for_decoder: bool = False
    bn_axis_name: Optional[str] = None
    # rematerialize each flow step's activations in the backward pass:
    # True trades ~1/3 more FLOPs for O(n_flows)x less live activation
    # memory — the HBM knob for long-utterance recipes (epic-duration
    # configs, dur_max >> 10 s) and bigger per-chip batches.
    # 'save_wn' keeps ONLY the WN conv inputs (ops/coupling.py
    # checkpoint_name tags) and rematerializes the cheap elementwise rest:
    # no conv recompute (the FLOPs) at a few-MB/flow memory cost.
    # Any other string resolves as a jax.checkpoint_policies attribute.
    remat: Union[bool, str] = False

    @property
    def decoder_cond_dims(self) -> int:
        g = self.n_group_size
        base = (self.n_f0_dims + self.n_energy_avg_dims + self.n_text_dim) * g \
            + self.n_speaker_dim
        if self.use_accent_emb_for_decoder:
            base += self.n_accent_dim
        if self.use_context_lstm:
            hidden = (self.n_speaker_dim + self.n_text_dim * g
                      + (self.n_accent_dim
                         if self.use_accent_emb_for_decoder else 0)) // 2
            return hidden * 2
        return base

    @property
    def exit_steps(self):
        return [i for i in range(1, self.n_flows)
                if i % self.n_early_every == 0]

    def _flow_channel_sizes(self):
        sizes = []
        c = self.n_mel_channels * self.n_group_size
        for i in range(self.n_flows):
            if i > 0 and i % self.n_early_every == 0:
                c -= self.n_early_size
            sizes.append(c)
        return sizes

    def setup(self):
        assert self.n_speaker_dim % 2 == 0 and self.n_early_size % 2 == 0
        g = self.n_group_size
        if self.use_context_lstm:
            hidden = (self.n_speaker_dim + self.n_text_dim * g
                      + (self.n_accent_dim
                         if self.use_accent_emb_for_decoder else 0)) // 2
            self.context_lstm = MaskedLSTM(
                hidden, bidirectional=True,
                spectral_norm=(self.context_lstm_norm is not None
                               and "spectral" in self.context_lstm_norm))
        # static argnums (self=0): inverse=4, train=5, sync_bn=6 — call
        # sites pass them positionally (nn.remat + kwargs don't mix)
        if isinstance(self.remat, str):
            policy = (jax.checkpoint_policies.save_only_these_names(
                "wn_h", "wn_skip") if self.remat == "save_wn"
                else getattr(jax.checkpoint_policies, self.remat))
            step_cls = nn.remat(FlowStep, static_argnums=(4, 5, 6),
                                policy=policy)
        elif self.remat:
            step_cls = nn.remat(FlowStep, static_argnums=(4, 5, 6))
        else:
            step_cls = FlowStep
        self.flows = [
            step_cls(c, self.decoder_cond_dims, self.n_conv_layers_per_step,
                     step_index=i,
                     mode=("whiten" if i == 0 else "LUS"),
                     affine_model=self.affine_model,
                     scaling_fn=self.scaling_fn,
                     affine_activation=self.affine_activation,
                     use_partial_padding=self.use_partial_padding,
                     use_spline=(i < self.n_splines), use_bn=self.use_bn,
                     bn_axis_name=self.bn_axis_name,
                     name=f"flow_{i}")
            for i, c in enumerate(self._flow_channel_sizes())
        ]

    def preprocess_context(self, context, spk_vecs, lens: SeqLens,
                           f0=None, energy_avg=None, accent_vecs=None,
                           train=True):
        """models/radmmm.py:103-148, channels-last and batched."""
        g = self.n_group_size
        context = squeeze_time(context, g)
        parts = [context]
        T = context.shape[1]
        parts.append(jnp.broadcast_to(spk_vecs[:, None, :],
                                      (context.shape[0], T,
                                       spk_vecs.shape[-1])))
        if self.use_accent_emb_for_decoder:
            assert accent_vecs is not None
            parts.append(jnp.broadcast_to(accent_vecs[:, None, :],
                                          (context.shape[0], T,
                                           accent_vecs.shape[-1])))
        if self.context_w_f0_and_energy:
            if f0 is not None and self.n_f0_dims > 0:
                parts.append(squeeze_time(f0[..., None], g))
            if energy_avg is not None and self.n_energy_avg_dims > 0:
                parts.append(squeeze_time(energy_avg[..., None], g))
        ctx = jnp.concatenate(parts, axis=-1)
        if self.use_context_lstm:
            glens = lens.downsample(g)
            ctx = self.context_lstm(ctx, glens.mask, update_sn=train)
        return ctx

    def __call__(self, mel, spk_vecs, context, lens: SeqLens,
                 f0=None, energy_avg=None, accent_vecs=None, train=True,
                 sync_bn=False):
        """Training direction mel -> z (decoders.py:168-205).

        mel: (B, T, n_mel); context: (B, T, n_text_dim) (attention-aligned).
        """
        ctx = self.preprocess_context(context, spk_vecs, lens, f0,
                                      energy_avg, accent_vecs, train=train)
        g = self.n_group_size
        z = squeeze_time(mel, g)
        glens = lens.downsample(g)
        mask = glens.mask

        z_out, log_s_list, log_det_W_list = [], [], []
        exit_steps = set(self.exit_steps)
        for i, step in enumerate(self.flows):
            if i in exit_steps:
                z_out.append(z[..., :self.n_early_size])
                z = z[..., self.n_early_size:]
            z, log_det_W, log_s = step(z, ctx, mask, False, train, sync_bn)
            log_s_list.append(log_s)
            log_det_W_list.append(log_det_W)
        z_out.append(z)
        z_mel = jnp.concatenate(z_out, axis=-1)
        return {"z_mel": z_mel, "log_det_W_list": log_det_W_list,
                "log_s_list": log_s_list, "context_w_spkvec": ctx}

    def infer(self, rng, spk_vecs, txt_enc, sigma, dur=None, f0=None,
              energy_avg=None, lens: Optional[SeqLens] = None,
              accent_vecs=None, max_frames: Optional[int] = None,
              residual: Optional[jax.Array] = None):
        """Sampling direction z -> mel (decoders.py:207-248).

        txt_enc: (B, T_text, C); dur: (B, T_text) int frames per token.
        `residual` overrides the N(0, sigma²) latent draw (analysis-synthesis
        and invertibility testing). Returns dict with mel (B, T_out, n_mel).
        """
        g = self.n_group_size
        if lens is None:
            assert dur is not None and max_frames is not None
            txt_expanded, out_lens = regulate_length(txt_enc, dur, max_frames)
            lens = SeqLens.create(out_lens, max_frames)
        else:
            txt_expanded, _ = regulate_length(txt_enc, dur, lens.max_len)

        ctx = self.preprocess_context(txt_expanded, spk_vecs, lens, f0,
                                      energy_avg, accent_vecs, train=False)
        B = txt_enc.shape[0]
        Tg = lens.max_len // g
        total_ch = self.n_mel_channels * g
        if residual is None:
            residual = jax.random.normal(rng, (B, Tg, total_ch)) * sigma

        n_early_total = len(self.exit_steps) * self.n_early_size
        z = residual[..., n_early_total:]
        glens = lens.downsample(g)
        mask = glens.mask

        exit_stack = list(self.exit_steps)
        for i in range(self.n_flows - 1, -1, -1):
            z = self.flows[i](z, ctx, mask, True, False, False)
            if exit_stack and i == exit_stack[-1]:
                exit_stack.pop()
                lo = len(exit_stack) * self.n_early_size
                chunk = residual[..., lo:lo + self.n_early_size]
                z = jnp.concatenate([chunk, z], axis=-1)

        mel = unsqueeze_time(z, g)
        mel = mel * lens.fmask(mel.dtype)[..., None]
        return {"mel": mel, "lens": lens}


def init_whitening_from_batch(variables, flow: RADMMMFlow, mel, spk_vecs,
                              context, lens: SeqLens, f0=None,
                              energy_avg=None, accent_vecs=None,
                              axis_name: Optional[str] = None):
    """Explicit data-dependent init of the step-0 whitening conv.

    The reference performs this lazily inside the first forward with a
    dist.broadcast (common.py:593-597); here it is a separate jittable pass
    run once before training (SURVEY.md §7.3), with psum-reduced global
    statistics so every replica computes identical parameters.
    """
    g = flow.n_group_size
    z = squeeze_time(mel, g)
    glens = lens.downsample(g)
    mean, covar = whitening_stats(z, glens.mask, axis_name=axis_name)
    new = whitening_params_from_stats(mean, covar)

    params = variables["params"]
    buffers = variables.get("buffers", {})
    wparams = dict(params["flow_0"]["invtbl_conv"])
    wparams["upper"] = new["upper"]
    wparams["upper_diag"] = new["upper_diag"]
    new_params = dict(params)
    f0p = dict(new_params["flow_0"]); f0p["invtbl_conv"] = wparams
    new_params["flow_0"] = f0p

    wbuf = dict(buffers.get("flow_0", {}).get("invtbl_conv", {}))
    wbuf["input_mean"] = new["input_mean"]
    wbuf["initialized"] = jnp.ones((), jnp.bool_)
    new_buffers = dict(buffers)
    f0b = dict(new_buffers.get("flow_0", {})); f0b["invtbl_conv"] = wbuf
    new_buffers["flow_0"] = f0b

    out = dict(variables)
    out["params"] = new_params
    out["buffers"] = new_buffers
    return out
