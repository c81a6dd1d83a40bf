"""Polyphase (space-to-depth) reformulation of the depth-2 conv autoencoder.

Why: on TPU the stock conv-AE is HBM-bandwidth-bound (~6 GB of inter-layer
activation traffic per 20-channel shot; see PERF_NOTES.md) and its 32-channel
convs use ~25% of the MXU's 128 output lanes.  Re-expressing every layer on
the half-resolution "base grid" (the s2d2 domain) turns each layer into ONE
im2col matmul with K in {128, 512} and N = 128 (4 output phases x 32
channels) — full MXU lanes — and makes the whole tile's activations small
enough to live in VMEM for a fused Pallas kernel (planned, round 2 — see
PERF_NOTES.md).

This module is the MATH: it builds the scattered weight matrices
(``FusedAEPlan``) from standard Flax ConvAutoencoder params and provides a
pure-jnp executor ``fused_ae_apply`` that is exactly equivalent to
``ConvAutoencoder.apply`` under float32 math (~1e-5 on CPU; on TPU the Flax
reference itself runs default-precision bf16-accumulated convs, so compare
against fused_ae_apply or on CPU when anchoring a kernel port).

Layer algebra (tile (256,128,1); base grid (128,64); phases a,b in {0,1}):

  L1  conv3x3(1->32)+relu+pool : patches Q[u,v] = x[2u-1:2u+3, 2v-1:2v+3]
      (K=16), Z1 = Q @ W1 (N=128 = 4 phases x 32), P1 = max_ab relu(Z1)
  L2  conv3x3(32->32)+relu+pool: patches over P1 (4,4,32) windows (K=512),
      same phase-packing, P2 (64,32,32)
  L3  convT2 3x3 s2 (32->32)+relu: each OUTPUT phase is a small conv with a
      disjoint slice of the transposed kernel (window (2,2,32), K=128,
      N=128); taps extracted EMPIRICALLY from flax.nn.ConvTranspose by
      impulse probing, so the padding/flip conventions cannot be got wrong
  L4  convT1: identical structure at (128,64) -> phases of (256,128)
  L5  out conv3x3(32->1)+sigmoid: patches (4,4,32) of the phase-form E
      (K=512, N=4 phases)

Conv scatter rule (analytic, verified by the equivalence test): for a 3x3
SAME conv evaluated at phase (a,b) of a 2x-downsampled patch grid,
W[(rho,sigma,ci),(ab,c)] = w[rho-a, sigma-b, ci, c] when 0 <= rho-a <= 2.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from specenh.config import ModelConfig

__all__ = ["FusedAEPlan", "build_plan", "fused_ae_apply"]


# ---------------------------------------------------------------------------
# weight scattering
# ---------------------------------------------------------------------------


def _conv_phase_weights(w: np.ndarray) -> np.ndarray:
    """(k,k,Ci,Co) SAME-conv kernel -> (4*4*Ci, 4*Co) patch matrix.

    Patch rows rho,sigma in 0..3 cover input positions 2u-1 .. 2u+2; output
    column block (a*2+b)*Co + c is the conv evaluated at (2u+a, 2v+b).
    Requires k == 3 (the window of a 3x3 conv at both phases fits in 4).
    """
    k, _, ci, co = w.shape
    if k != 3:
        raise NotImplementedError("polyphase plan currently supports 3x3 kernels")
    out = np.zeros((4, 4, ci, 4 * co), w.dtype)
    for a in range(2):
        for b in range(2):
            for rho in range(4):
                for sigma in range(4):
                    dy, dx = rho - a, sigma - b
                    if 0 <= dy <= 2 and 0 <= dx <= 2:
                        out[rho, sigma, :, (a * 2 + b) * co : (a * 2 + b + 1) * co] = w[dy, dx]
    return out.reshape(4 * 4 * ci, 4 * co)


def _convt_response(kernel: np.ndarray, ci: int, co: int):
    """Impulse-probe flax ConvTranspose(stride 2, SAME) to get the exact
    translation-invariant response M[dy+off, dx+off, ci, co] with
    out[y,x] = sum_{p,q} in[p,q] * M[y-2p, x-2q]."""
    import flax.linen as nn

    k = kernel.shape[0]
    mod = nn.ConvTranspose(co, (k, k), strides=(2, 2), padding="SAME")
    params = {"params": {"kernel": jnp.asarray(kernel), "bias": jnp.zeros(co)}}
    n = 8  # probe grid, delta placed centrally
    p0 = n // 2
    probe = np.zeros((ci, n, n, ci), np.float32)
    for c in range(ci):
        probe[c, p0, p0, c] = 1.0
    out = np.asarray(mod.apply(params, jnp.asarray(probe)))  # (ci, 2n, 2n, co)
    # offsets delta = y - 2*p0 with nonzero response
    resp = {}
    for dy in range(-2 * p0, 2 * (n - p0)):
        for dx in range(-2 * p0, 2 * (n - p0)):
            block = out[:, 2 * p0 + dy, 2 * p0 + dx, :]  # (ci, co)
            if np.abs(block).max() > 0:
                resp[(dy, dx)] = block
    return resp


def _convt_phase_weights(kernel: np.ndarray) -> Tuple[np.ndarray, int, int]:
    """(k,k,Ci,Co) ConvTranspose kernel -> ((2*2*Ci, 4*Co) window matrix,
    e_lo, f_lo) where the input window for base cell (u,v) is
    in[u+e_lo : u+e_lo+2, v+f_lo : v+f_lo+2] and column block (a*2+b)*Co is
    output phase (2u+a, 2v+b).  Valid for k == 3, stride 2 (window 2x2)."""
    k, _, ci, co = kernel.shape
    if k != 3:
        raise NotImplementedError("polyphase plan currently supports 3x3 kernels")
    resp = _convt_response(kernel, ci, co)
    # offsets delta = a - 2e => e = (a - dy) / 2 for matching parity
    es = sorted({(a - dy) // 2 for (dy, _) in resp for a in range(2) if (a - dy) % 2 == 0})
    fs = sorted({(b - dx) // 2 for (_, dx) in resp for b in range(2) if (b - dx) % 2 == 0})
    e_lo, e_hi = min(es), max(es)
    f_lo, f_hi = min(fs), max(fs)
    if e_hi - e_lo + 1 > 2 or f_hi - f_lo + 1 > 2:
        raise NotImplementedError(
            f"window {(e_hi - e_lo + 1, f_hi - f_lo + 1)} > 2x2 for k={k}"
        )
    if f_lo != e_lo:
        raise NotImplementedError("non-square convT window offsets unsupported")
    out = np.zeros((2, 2, ci, 4 * co), kernel.dtype)
    for (dy, dx), block in resp.items():
        for a in range(2):
            for b in range(2):
                if (a - dy) % 2 or (b - dx) % 2:
                    continue
                e, f = (a - dy) // 2, (b - dx) // 2
                assert e_lo <= e <= e_lo + 1 and f_lo <= f <= f_lo + 1, (
                    "impulse response tap outside derived window"
                )
                out[e - e_lo, f - f_lo, :, (a * 2 + b) * co : (a * 2 + b + 1) * co] = block
    return out.reshape(2 * 2 * ci, 4 * co), e_lo, f_lo


@dataclasses.dataclass
class FusedAEPlan:
    """Device-ready scattered weights for the polyphase executor."""

    w1: jax.Array  # (16, 128)
    b1: jax.Array  # (128,)
    w2: jax.Array  # (512, 128)
    b2: jax.Array
    w3: jax.Array  # (128, 128) convT2 window matrix
    b3: jax.Array
    e3: int  # window start offset
    w4: jax.Array  # (128, 128) convT1
    b4: jax.Array
    e4: int
    w5: jax.Array  # (512, 4) out conv
    b5: jax.Array  # (4,)


def build_plan(params, cfg: ModelConfig = ModelConfig(), dtype=jnp.float32) -> FusedAEPlan:
    """Standard ConvAutoencoder params -> FusedAEPlan.

    Supports the flagship geometry: depth-2, all kernels 3x3, input
    (256,128,1) (MODEL_PRESETS['scan_k3'] / 'graphs' — the reference's
    best/most-used config, hyperparam_scan.py:152-165 with kernel (3,3)).
    """
    if cfg.depth != 2 or any(k != (3, 3) for k in cfg.kernels) or cfg.out_kernel != (3, 3):
        raise NotImplementedError("fused plan supports depth-2 3x3 models")
    p = params["params"]

    def rep4(b):  # bias per channel, replicated over the 4 phases
        return np.tile(np.asarray(b), 4)

    w1 = _conv_phase_weights(np.asarray(p["enc_conv0"]["kernel"]))
    w2 = _conv_phase_weights(np.asarray(p["enc_conv1"]["kernel"]))
    w3, e3, _ = _convt_phase_weights(np.asarray(p["dec_deconv1"]["kernel"]))
    w4, e4, _ = _convt_phase_weights(np.asarray(p["dec_deconv0"]["kernel"]))
    w5 = _conv_phase_weights(np.asarray(p["out_conv"]["kernel"]))
    return FusedAEPlan(
        w1=jnp.asarray(w1, dtype), b1=jnp.asarray(rep4(p["enc_conv0"]["bias"]), dtype),
        w2=jnp.asarray(w2, dtype), b2=jnp.asarray(rep4(p["enc_conv1"]["bias"]), dtype),
        w3=jnp.asarray(w3, dtype), b3=jnp.asarray(rep4(p["dec_deconv1"]["bias"]), dtype),
        e3=e3,
        w4=jnp.asarray(w4, dtype), b4=jnp.asarray(rep4(p["dec_deconv0"]["bias"]), dtype),
        e4=e4,
        w5=jnp.asarray(w5, dtype), b5=jnp.asarray(rep4(p["out_conv"]["bias"]), dtype),
    )


# ---------------------------------------------------------------------------
# pure-jnp executor (the correctness anchor; the Pallas kernel mirrors it)
# ---------------------------------------------------------------------------


def _patches_2x(x: jax.Array, ci: int) -> jax.Array:
    """(B,H,W,Ci) -> (B,H/2,W/2, 4*4*Ci): the (4,4,Ci) window
    x[2u-1:2u+3, 2v-1:2v+3, :] per base cell, zero-padded at borders."""
    b, h, w, _ = x.shape
    xp = jnp.pad(x, ((0, 0), (1, 2), (1, 2), (0, 0)))
    rows = []
    for rho in range(4):
        cols = []
        for sigma in range(4):
            cols.append(xp[:, rho : rho + h : 2, sigma : sigma + w : 2, :])
        rows.append(jnp.stack(cols, axis=-2))
    q = jnp.stack(rows, axis=-3)  # (B, h/2, w/2, 4, 4, Ci)
    return q.reshape(b, h // 2, w // 2, 16 * ci)


def _window_2(x: jax.Array, ci: int, lo: int) -> jax.Array:
    """(B,H,W,Ci) -> (B,H,W, 2*2*Ci): window x[u+lo : u+lo+2, v+lo : v+lo+2]
    per cell (for the convT layers), zero-padded."""
    b, h, w, _ = x.shape
    pad_lo, pad_hi = max(-lo, 0), max(lo + 1, 0)
    xp = jnp.pad(x, ((0, 0), (pad_lo, pad_hi), (pad_lo, pad_hi), (0, 0)))
    rows = []
    for e in range(2):
        cols = []
        for f in range(2):
            cols.append(
                xp[:, pad_lo + lo + e : pad_lo + lo + e + h,
                   pad_lo + lo + f : pad_lo + lo + f + w, :]
            )
        rows.append(jnp.stack(cols, axis=-2))
    q = jnp.stack(rows, axis=-3)
    return q.reshape(b, h, w, 4 * ci)


def _phases_to_grid(z: jax.Array, co: int) -> jax.Array:
    """(B,h,w,4*Co) phase form -> (B,2h,2w,Co) natural grid."""
    b, h, w, _ = z.shape
    z = z.reshape(b, h, w, 2, 2, co)
    z = z.transpose(0, 1, 3, 2, 4, 5)  # b, h, a, w, b_, co
    return z.reshape(b, 2 * h, 2 * w, co)


def _pool_phases(z: jax.Array, co: int) -> jax.Array:
    """relu + max over the 4 phase groups: (B,h,w,4*Co) -> (B,h,w,Co)."""
    b, h, w, _ = z.shape
    z = jax.nn.relu(z).reshape(b, h, w, 4, co)
    return jnp.max(z, axis=-2)


_HI = jax.lax.Precision.HIGHEST


@partial(jax.jit, static_argnames=("logits",))
def fused_ae_apply(plan: FusedAEPlan, x: jax.Array, logits: bool = False) -> jax.Array:
    """Polyphase executor, exactly equivalent to ConvAutoencoder.apply on
    (B,256,128,1) tiles (any H,W divisible by 4)."""
    mm = partial(jnp.matmul, precision=_HI, preferred_element_type=jnp.float32)
    # L1: conv1+relu+pool on the base grid
    q1 = _patches_2x(x, x.shape[-1])  # (B,128,64,16)
    p1 = _pool_phases(mm(q1, plan.w1) + plan.b1, plan.b1.shape[0] // 4)
    # L2: conv2+relu+pool
    q2 = _patches_2x(p1, p1.shape[-1])  # (B,64,32,512)
    p2 = _pool_phases(mm(q2, plan.w2) + plan.b2, plan.b2.shape[0] // 4)
    # L3: convT2 + relu -> natural (B,128,64,32)
    q3 = _window_2(p2, p2.shape[-1], plan.e3)
    d = _phases_to_grid(jax.nn.relu(mm(q3, plan.w3) + plan.b3), plan.b3.shape[0] // 4)
    # L4: convT1 + relu -> phase form of (B,256,128,32)
    q4 = _window_2(d, d.shape[-1], plan.e4)
    e_ph = jax.nn.relu(mm(q4, plan.w4) + plan.b4)  # (B,128,64,128)
    e = _phases_to_grid(e_ph, plan.b4.shape[0] // 4)  # (B,256,128,32)
    # L5: out conv (+ sigmoid)
    q5 = _patches_2x(e, e.shape[-1])  # (B,128,64,512)
    z5 = mm(q5, plan.w5) + plan.b5  # (B,128,64,4)
    out = _phases_to_grid(z5, 1)  # (B,256,128,1)
    return out if logits else jax.nn.sigmoid(out)


# registered as a pytree so the plan can cross jit boundaries
jax.tree_util.register_dataclass(
    FusedAEPlan,
    data_fields=["w1", "b1", "w2", "b2", "w3", "b3", "w4", "b4", "w5", "b5"],
    meta_fields=["e3", "e4"],
)
