"""WaveGlow: flow-based neural vocoder (mel -> waveform), trainable.

TPU-native counterpart of the reference's vendored WaveGlow training tree
(vocoders/waveglow_for_LIMMITS23/, ~7.3k LoC of torch used to train the
LIMMITS23 challenge vocoders). Architecture follows the published WaveGlow
design: audio squeezed into groups of n_group samples, a stack of flows of
[invertible 1x1 conv + affine coupling], couplings parameterized by a gated
(tanh·sigmoid) dilated conv stack conditioned on transposed-conv-upsampled
mels, early z-exits every n_early_every flows.

Training = maximum likelihood (same compute_flow_loss as the TTS decoder);
inference = z ~ N(0, sigma^2) through the reversed flows. The gated unit is
the reference's fused_add_tanh_sigmoid_multiply (common.py:66-73) — left to
XLA fusion here.
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from radmmm_tpu.ops.conv import MaskedConv1d, conv1d_same
from radmmm_tpu.ops.invertible import InvertibleConv
from radmmm_tpu.vocoder.hifigan import conv_transpose1d


class GatedWN(nn.Module):
    """WaveNet stack with gated units and mel conditioning added pre-gate."""
    n_half: int
    n_channels: int = 256
    n_layers: int = 8
    kernel_size: int = 3

    @nn.compact
    def __call__(self, z_half, cond):
        h = MaskedConv1d(self.n_channels, 1, use_weight_norm=True,
                         name="start")(z_half)
        output = jnp.zeros_like(h)
        for i in range(self.n_layers):
            dilation = 2 ** i
            z_proj = MaskedConv1d(2 * self.n_channels, self.kernel_size,
                                  dilation=dilation, use_weight_norm=True,
                                  name=f"in_{i}")(h)
            c_proj = MaskedConv1d(2 * self.n_channels, 1,
                                  use_weight_norm=True,
                                  name=f"cond_{i}")(cond)
            acts = z_proj + c_proj
            # fused add-tanh-sigmoid gate (XLA fuses the elementwise chain)
            t = jnp.tanh(acts[..., :self.n_channels])
            s = jax.nn.sigmoid(acts[..., self.n_channels:])
            gated = t * s
            res_skip = MaskedConv1d(
                2 * self.n_channels if i < self.n_layers - 1
                else self.n_channels, 1, use_weight_norm=True,
                name=f"res_skip_{i}")(gated)
            if i < self.n_layers - 1:
                h = h + res_skip[..., :self.n_channels]
                output = output + res_skip[..., self.n_channels:]
            else:
                output = output + res_skip
        return MaskedConv1d(2 * self.n_half, 1, zero_init=True,
                            name="end")(output)


class WaveGlow(nn.Module):
    n_mel_channels: int = 80
    n_flows: int = 12
    n_group: int = 8
    n_early_every: int = 4
    n_early_size: int = 2
    wn_channels: int = 256
    wn_layers: int = 8
    hop_length: int = 256
    upsample_kernel: int = 1024

    @property
    def exit_steps(self):
        return [i for i in range(1, self.n_flows)
                if i % self.n_early_every == 0]

    def _channel_sizes(self):
        sizes, c = [], self.n_group
        for i in range(self.n_flows):
            if i > 0 and i % self.n_early_every == 0:
                c -= self.n_early_size
            sizes.append(c)
        return sizes

    def setup(self):
        # mel upsampling to audio rate (transposed conv, then grouped)
        self.up_kernel = self.param(
            "upsample_kernel_w", nn.initializers.normal(0.02),
            (self.upsample_kernel, self.n_mel_channels, self.n_mel_channels))
        self.up_bias = self.param("upsample_bias", nn.initializers.zeros,
                                  (self.n_mel_channels,))
        self.convinv = [InvertibleConv(c, init_seed=i, name=f"convinv_{i}")
                        for i, c in enumerate(self._channel_sizes())]
        self.wn = [GatedWN(c // 2, self.wn_channels, self.wn_layers,
                           name=f"wn_{i}")
                   for i, c in enumerate(self._channel_sizes())]

    def upsample_mel(self, mel, n_samples: int):
        """(B, T_mel, 80) -> grouped cond (B, n_samples//group, 80*group)."""
        up = conv_transpose1d(mel, self.up_kernel, self.up_bias,
                              stride=self.hop_length,
                              padding=0)[:, :n_samples]
        B, T, C = up.shape
        g = self.n_group
        T = (T // g) * g
        up = up[:, :T].reshape(B, T // g, g, C)
        return jnp.swapaxes(up, 2, 3).reshape(B, T // g, C * g)

    def _squeeze_audio(self, audio):
        B, T = audio.shape
        g = self.n_group
        T = (T // g) * g
        return audio[:, :T].reshape(B, T // g, g)

    def __call__(self, audio, mel):
        """Training direction audio -> z. audio: (B, T); mel: (B, T_mel, 80).
        Returns dict(z, log_s_list, log_det_W_list)."""
        z = self._squeeze_audio(audio)
        cond = self.upsample_mel(mel, audio.shape[1])
        cond = cond[:, :z.shape[1]]
        z_out, log_s_list, log_det_W_list = [], [], []
        exits = set(self.exit_steps)
        for i in range(self.n_flows):
            if i in exits:
                z_out.append(z[..., :self.n_early_size])
                z = z[..., self.n_early_size:]
            z, log_det_w = self.convinv[i](z)
            n_half = z.shape[-1] // 2
            z0, z1 = z[..., :n_half], z[..., n_half:]
            params = self.wn[i](z0, cond)
            # reference layout (glow.py:241-243): b first half, log_s second
            b = params[..., :n_half]
            log_s = params[..., n_half:]
            z1 = jnp.exp(log_s) * z1 + b
            z = jnp.concatenate([z0, z1], axis=-1)
            log_s_list.append(log_s)
            log_det_W_list.append(log_det_w)
        z_out.append(z)
        return {"z": jnp.concatenate(z_out, axis=-1),
                "log_s_list": log_s_list,
                "log_det_W_list": log_det_W_list}

    def infer(self, rng, mel, sigma: float = 1.0,
              n_samples: Optional[int] = None, residual=None):
        """mel (B, T_mel, 80) -> audio (B, T_mel*hop).

        `residual` (B, Tg, n_group) overrides the Gaussian draw — layout
        matches __call__'s z (early exits first, final channels last), so
        infer(residual=forward(audio, mel)['z']) reconstructs the audio."""
        if n_samples is None:
            n_samples = mel.shape[1] * self.hop_length
        cond = self.upsample_mel(mel, n_samples)
        B, Tg, _ = cond.shape
        if residual is None:
            residual = jax.random.normal(rng, (B, Tg, self.n_group)) * sigma
        else:
            residual = residual[:, :Tg]
        n_early_total = len(self.exit_steps) * self.n_early_size
        z = residual[..., n_early_total:]
        exit_stack = list(self.exit_steps)
        for i in range(self.n_flows - 1, -1, -1):
            n_half = z.shape[-1] // 2
            z0, z1 = z[..., :n_half], z[..., n_half:]
            params = self.wn[i](z0, cond)
            b = params[..., :n_half]
            log_s = params[..., n_half:]
            z1 = (z1 - b) * jnp.exp(-log_s)
            z = jnp.concatenate([z0, z1], axis=-1)
            z = self.convinv[i](z, inverse=True)
            if exit_stack and i == exit_stack[-1]:
                exit_stack.pop()
                lo = len(exit_stack) * self.n_early_size
                z = jnp.concatenate(
                    [residual[..., lo:lo + self.n_early_size], z], axis=-1)
        B, Tg, g = z.shape
        return z.reshape(B, Tg * g)


def load_waveglow_config(config_path: Optional[str]) -> dict:
    """waveglow_config (+WN_config) kwargs from the vendored train
    config.json (waveglow_for_LIMMITS23/config.json) or a flat json/yaml."""
    kwargs = {}
    if config_path:
        import json
        with open(config_path) as f:
            raw = json.load(f)
        wg = raw.get("waveglow_config", raw)
        wn = wg.pop("WN_config", {})
        kwargs = dict(wg)
        if "n_layers" in wn:
            kwargs["wn_layers"] = wn["n_layers"]
        if "n_channels" in wn:
            kwargs["wn_channels"] = wn["n_channels"]
        data = raw.get("data_config", {})
        if "hop_length" in data:
            kwargs["hop_length"] = data["hop_length"]
    return kwargs


def load_torch_waveglow_params(state_dict, model: "WaveGlow"):
    """Convert a torch WaveGlow checkpoint (the vendored LIMMITS23 tree's
    glow.py naming: upsample / convinv.N.conv / WN.N.{start,in_layers.M,
    cond_layer,res_skip_layers.M,end}) to this module's params.

    Handles both weight-normed (weight_v/weight_g) and remove_weightnorm'd
    (plain weight) checkpoints; the reference's single fused cond_layer
    (2*n_channels*n_layers rows) is sliced into this module's per-layer
    cond projections — weight_norm is per-output-row, so slicing v and g
    row-wise is exact.
    """
    import numpy as np

    def npy(t):
        return np.asarray(t.detach().cpu().numpy()
                          if hasattr(t, "detach") else t)

    def wnorm_conv(base, rows=None):
        """-> {v, g, bias} for a MaskedConv1d(use_weight_norm=True)."""
        if f"{base}.weight_v" in state_dict:
            v = npy(state_dict[f"{base}.weight_v"])
            g = npy(state_dict[f"{base}.weight_g"]).reshape(-1)
        else:
            v = npy(state_dict[f"{base}.weight"])
            g = np.linalg.norm(v.reshape(v.shape[0], -1), axis=1)
        b = npy(state_dict[f"{base}.bias"])
        if rows is not None:
            lo, hi = rows
            v, g, b = v[lo:hi], g[lo:hi], b[lo:hi]
        return {"v": v.transpose(2, 1, 0), "g": g, "bias": b}

    nc = model.wn_channels
    params = {
        "upsample_kernel_w":
            npy(state_dict["upsample.weight"]).transpose(2, 0, 1),
        "upsample_bias": npy(state_dict["upsample.bias"]),
    }
    for i in range(model.n_flows):
        params[f"convinv_{i}"] = {
            "weight": npy(state_dict[f"convinv.{i}.conv.weight"])[..., 0]}
        wn = {"start": wnorm_conv(f"WN.{i}.start"),
              "end": {
                  "kernel":
                      npy(state_dict[f"WN.{i}.end.weight"]).transpose(2, 1, 0),
                  "bias": npy(state_dict[f"WN.{i}.end.bias"])}}
        for j in range(model.wn_layers):
            wn[f"in_{j}"] = wnorm_conv(f"WN.{i}.in_layers.{j}")
            wn[f"cond_{j}"] = wnorm_conv(f"WN.{i}.cond_layer",
                                         rows=(2 * nc * j, 2 * nc * (j + 1)))
            wn[f"res_skip_{j}"] = wnorm_conv(f"WN.{i}.res_skip_layers.{j}")
        params[f"wn_{i}"] = wn
    return {"params": params}


def waveglow_loss(outputs, sigma: float = 1.0):
    """Flow NLL over all audio samples (no masking: fixed segments)."""
    z = outputs["z"]
    n = z.size
    log_s_total = sum(jnp.sum(ls) for ls in outputs["log_s_list"])
    # each 1x1 logdet applies per (grouped) time frame
    frames = z.shape[0] * z.shape[1]
    log_det_total = sum(outputs["log_det_W_list"]) * frames
    prior = jnp.sum(z * z) / (2 * sigma * sigma)
    return (prior - log_s_total - log_det_total) / n
