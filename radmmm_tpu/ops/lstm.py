"""Masked (bi)directional LSTM as lax.scan recurrences.

TPU-native replacement for the reference's packed-sequence LSTMs
(common.py:281-331, 374-395, 425-504; models/radmmm.py:136-146). Packing is a
GPU/cuDNN idiom; on TPU we scan over the padded time axis and carry hidden
state through masked (padding) steps unchanged, which is mathematically
identical to pack_padded_sequence/pad_packed_sequence semantics:

* forward direction: h/c update only where mask==1; outputs at padding are 0
  (pad_packed zero-fills).
* backward direction: scan the time-reversed sequence; leading padding rows
  carry the zero initial state so the first *valid* reverse step sees h0=0,
  exactly like packing.

Gate order follows torch (i, f, g, o). Weights: Wi (in, 4H), Wh (H, 4H),
b_ih + b_hh both kept for checkpoint-compatibility with torch state dicts.
Optional spectral norm on Wh (one power iteration per call, mutable 'spectral'
collection) mirrors nn.utils.spectral_norm(weight_hh_l0) (common.py:273-276).
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from radmmm_tpu.ops.conv import get_conv_precision


def _uniform_lstm_init(hidden: int):
    bound = 1.0 / np.sqrt(hidden)
    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)
    return init


_LSTM_BACKEND = "scan"


def set_lstm_backend(name: str) -> None:
    """'scan' (default; in-graph lax.scan, measured equivalent on v5e) or
    'pallas' (VMEM-resident recurrence kernel, ops/lstm_pallas.py; falls
    back to scan off-TPU). 'pallas_interpret' forces the kernel's
    interpreter for CPU testing."""
    global _LSTM_BACKEND
    assert name in ("scan", "pallas", "pallas_interpret"), name
    _LSTM_BACKEND = name


def multi_bilstm_scan(xs: jax.Array, mask: jax.Array, wi: jax.Array,
                      wh: jax.Array, bias: jax.Array) -> jax.Array:
    """P independent bidirectional masked LSTMs fused into ONE lax.scan.

    The recurrence is serial-latency-bound, not FLOP-bound: P separate
    bidirectional scans serialize P*T steps (2*P*T if the directions are
    also separate). Stacking all 2P direction-lanes into the carry runs
    them in T steps with one batched (2P,B,H)x(2P,H,4H) MXU matmul per
    step. Used to gang the frame-level attribute predictors' BiLSTMs
    (f0/energy/voiced share the same mask and hidden size — see
    models/tts.py) and, with P=1, as the plain fused BiLSTM.

    xs:   (P, B, T, C)  per-predictor inputs (shared mask)
    wi:   (P, C, 8H)    input projections, [fwd | bwd] concatenated
    wh:   (P, 2, H, 4H) recurrent weights per direction
    bias: (P, 2, 4H)    b_ih + b_hh per direction
    Returns (P, B, T, 2H), [fwd | bwd] concatenated, zero at padding.
    """
    P, B, T = xs.shape[0], xs.shape[1], xs.shape[2]
    H = wh.shape[-2]
    L = 2 * P
    prec = get_conv_precision()
    xp = jnp.einsum("pbtc,pch->pbth", xs, wi, precision=prec)  # (P,B,T,8H)
    xp_f = xp[..., :4 * H] + bias[:, 0][:, None, None, :]
    # backward direction scans the time-reversed sequence: leading padding
    # rows keep (h, c) at zero until the first valid frame
    xp_b = jnp.flip(xp[..., 4 * H:] + bias[:, 1][:, None, None, :], axis=2)
    xp_l = jnp.stack([xp_f, xp_b], axis=1).reshape(L, B, T, 4 * H)
    mask_pair = jnp.stack([mask, jnp.flip(mask, axis=1)], axis=0)  # (2,B,T)
    mask_l = jnp.broadcast_to(mask_pair[None], (P, 2, B, T)).reshape(L, B, T)
    wh_l = wh.reshape(L, H, 4 * H)
    scan_xs = (jnp.moveaxis(xp_l, 2, 0),                       # (T,L,B,4H)
               jnp.moveaxis(mask_l, 2, 0))                     # (T,L,B)

    def step(carry, inp):
        h, c = carry                                           # (L,B,H)
        xpt, m = inp
        gates = xpt + jnp.einsum("dbh,dhg->dbg", h, wh_l, precision=prec)
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        i = jax.nn.sigmoid(i)
        f = jax.nn.sigmoid(f)
        g = jnp.tanh(g)
        o = jax.nn.sigmoid(o)
        c_new = f * c + i * g
        h_new = o * jnp.tanh(c_new)
        m = m[..., None]
        h = jnp.where(m > 0, h_new, h)
        c = jnp.where(m > 0, c_new, c)
        return (h, c), h_new * m

    h0 = jnp.zeros((L, B, H), xs.dtype)
    _, ys = jax.lax.scan(step, (h0, h0), scan_xs, unroll=8)    # (T,L,B,H)
    ys = ys.reshape(T, P, 2, B, H)
    out_f = jnp.moveaxis(ys[:, :, 0], 0, 2)                    # (P,B,T,H)
    out_b = jnp.flip(jnp.moveaxis(ys[:, :, 1], 0, 2), axis=2)
    return jnp.concatenate([out_f, out_b], axis=-1)


def bilstm_scan(x: jax.Array, mask: jax.Array,
                wi_f: jax.Array, wh_f: jax.Array, bias_f: jax.Array,
                wi_b: jax.Array, wh_b: jax.Array, bias_b: jax.Array):
    """Fused bidirectional masked LSTM: both directions in ONE lax.scan.

    P=1 case of multi_bilstm_scan. Semantics are identical to
    lstm_scan(reverse=False) ++ lstm_scan(reverse=True).

    x: (B, T, C), mask: (B, T) float. Returns (out_fwd, out_bwd), each
    (B, T, H), zero at padding positions.
    """
    H = wh_f.shape[0]
    out = multi_bilstm_scan(
        x[None],
        mask,
        jnp.concatenate([wi_f, wi_b], axis=1)[None],
        jnp.stack([wh_f, wh_b], axis=0)[None],
        jnp.stack([bias_f, bias_b], axis=0)[None])[0]
    return out[..., :H], out[..., H:]


def lstm_scan(x: jax.Array, mask: jax.Array, wi: jax.Array, wh: jax.Array,
              bias: jax.Array, reverse: bool = False) -> jax.Array:
    """Single-direction masked LSTM. x: (B, T, C), mask: (B, T) float.

    Returns outputs (B, T, H), zero at padding positions.
    """
    B = x.shape[0]
    H = wh.shape[0]
    prec = get_conv_precision()
    # hoist the input projection out of the scan: one big MXU matmul
    x_proj = jnp.einsum("btc,ch->bth", x, wi, precision=prec) + bias
    if reverse:
        x_proj = jnp.flip(x_proj, axis=1)
        mask = jnp.flip(mask, axis=1)

    if _LSTM_BACKEND != "scan":
        from radmmm_tpu.ops.lstm_pallas import (lstm_recurrence_pallas,
                                                pallas_available)
        interpret = _LSTM_BACKEND == "pallas_interpret"
        if interpret or pallas_available():
            ys = lstm_recurrence_pallas(
                jnp.swapaxes(x_proj, 0, 1),
                jnp.swapaxes(mask, 0, 1).astype(x_proj.dtype), wh,
                interpret=interpret)
            ys = jnp.swapaxes(ys, 0, 1)
            if reverse:
                ys = jnp.flip(ys, axis=1)
            return ys

    def step(carry, inp):
        h, c = carry
        xp, m = inp  # (B, 4H), (B,)
        gates = xp + jnp.einsum("bh,hg->bg", h, wh, precision=prec)
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        i = jax.nn.sigmoid(i)
        f = jax.nn.sigmoid(f)
        g = jnp.tanh(g)
        o = jax.nn.sigmoid(o)
        c_new = f * c + i * g
        h_new = o * jnp.tanh(c_new)
        m = m[:, None]
        h = jnp.where(m > 0, h_new, h)
        c = jnp.where(m > 0, c_new, c)
        return (h, c), h_new * m

    h0 = jnp.zeros((B, H), x.dtype)
    c0 = jnp.zeros((B, H), x.dtype)
    xs = (jnp.swapaxes(x_proj, 0, 1), jnp.swapaxes(mask, 0, 1))
    _, ys = jax.lax.scan(step, (h0, c0), xs, unroll=8)
    ys = jnp.swapaxes(ys, 0, 1)  # (B, T, H)
    if reverse:
        ys = jnp.flip(ys, axis=1)
    return ys


class SpectralNormedParam(nn.Module):
    """Spectral norm wrapper state for a 2-D weight, torch semantics.

    One power iteration per training call; u persisted in 'spectral'.
    """
    shape: tuple
    name_prefix: str = "wh"

    @nn.compact
    def __call__(self, w: jax.Array, update: bool) -> jax.Array:
        # torch views weight_hh (4H, H); ours is (H, 4H) -> use transpose view
        w2d = w.T  # (4H, H)
        u = self.variable(
            "spectral", f"{self.name_prefix}_u",
            lambda: jax.random.normal(self.make_rng("params")
                                      if self.has_rng("params")
                                      else jax.random.key(0), (w2d.shape[0],)))
        # the power iteration runs under no_grad in torch
        # (torch.nn.utils.spectral_norm): sigma's gradient flows through W
        # only — u and v are constants of the backward pass
        w2d_it = jax.lax.stop_gradient(w2d)
        u_val = u.value / jnp.maximum(jnp.linalg.norm(u.value), 1e-12)
        v = w2d_it.T @ u_val
        v = v / jnp.maximum(jnp.linalg.norm(v), 1e-12)
        u_new = w2d_it @ v
        u_new = u_new / jnp.maximum(jnp.linalg.norm(u_new), 1e-12)
        if update and not self.is_initializing():
            u.value = u_new
        sigma = u_new @ (w2d @ v)
        return w / sigma


class MaskedLSTM(nn.Module):
    """(Bi)LSTM over padded sequences. hidden = per-direction hidden size."""
    hidden: int
    bidirectional: bool = True
    spectral_norm: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, mask: Optional[jax.Array] = None,
                 update_sn: bool = False, return_weights: bool = False):
        if mask is None:
            m = jnp.ones(x.shape[:2], x.dtype)
        else:
            m = mask.astype(x.dtype)
        cin = x.shape[-1]
        init = _uniform_lstm_init(self.hidden)
        dirs = ["fwd", "bwd"] if self.bidirectional else ["fwd"]
        ws = {}
        for d in dirs:
            wi = self.param(f"wi_{d}", init, (cin, 4 * self.hidden))
            wh = self.param(f"wh_{d}", init, (self.hidden, 4 * self.hidden))
            b_ih = self.param(f"b_ih_{d}", init, (4 * self.hidden,))
            b_hh = self.param(f"b_hh_{d}", init, (4 * self.hidden,))
            if self.spectral_norm:
                wh = SpectralNormedParam(shape=wh.shape,
                                         name_prefix=f"wh_{d}")(wh, update_sn)
            ws[d] = (wi, wh, b_ih + b_hh)
        if return_weights:
            # gang mode: the caller stacks these across several same-shape
            # LSTMs and runs multi_bilstm_scan once (see models/tts.py);
            # params (incl. spectral norm state) still live in this module
            assert self.bidirectional, "gang mode is bidirectional-only"
            return {
                "wi": jnp.concatenate([ws["fwd"][0], ws["bwd"][0]], axis=1),
                "wh": jnp.stack([ws["fwd"][1], ws["bwd"][1]], axis=0),
                "bias": jnp.stack([ws["fwd"][2], ws["bwd"][2]], axis=0),
            }
        if not self.bidirectional:
            return lstm_scan(x, m, *ws["fwd"])
        if _LSTM_BACKEND == "scan":
            # both directions fused into one scan (half the serial steps)
            out_f, out_b = bilstm_scan(x, m, *ws["fwd"], *ws["bwd"])
        else:
            out_f = lstm_scan(x, m, *ws["fwd"])
            out_b = lstm_scan(x, m, *ws["bwd"], reverse=True)
        return jnp.concatenate([out_f, out_b], axis=-1)
