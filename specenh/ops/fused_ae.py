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

__all__ = ["FusedAEPlan", "build_plan", "fused_ae_apply",
           "PolyLayer", "build_plan_layers", "polyphase_apply"]


# ---------------------------------------------------------------------------
# weight scattering
# ---------------------------------------------------------------------------


def _conv_phase_weights(w: np.ndarray) -> np.ndarray:
    """(k,k,Ci,Co) odd-k SAME-conv kernel -> ((k+1)^2*Ci, 4*Co) patch matrix.

    With pad r=(k-1)//2, the conv at both phases of base cell u reads rows
    2u-r .. 2u+r+1 — a (k+1)-window whose index rho equals a+dy; output
    column block (a*2+b)*Co + c is the conv evaluated at (2u+a, 2v+b).
    """
    k, _, ci, co = w.shape
    if k % 2 == 0:
        raise NotImplementedError("polyphase plan supports odd kernels")
    wz = k + 1
    out = np.zeros((wz, wz, ci, 4 * co), w.dtype)
    for a in range(2):
        for b in range(2):
            for rho in range(wz):
                for sigma in range(wz):
                    dy, dx = rho - a, sigma - b
                    if 0 <= dy <= k - 1 and 0 <= dx <= k - 1:
                        out[rho, sigma, :, (a * 2 + b) * co : (a * 2 + b + 1) * co] = w[dy, dx]
    return out.reshape(wz * wz * ci, 4 * co)


def _convt_response(kernel: np.ndarray, ci: int, co: int):
    """Impulse-probe flax ConvTranspose(stride 2, SAME) to get the exact
    translation-invariant response M[dy+off, dx+off, ci, co] with
    out[y,x] = sum_{p,q} in[p,q] * M[y-2p, x-2q]."""
    import flax.linen as nn

    k = kernel.shape[0]
    # HIGHEST precision: the default (bf16-decomposed on TPU) rounds the
    # probed responses, which corrupts ae_train_kernel's id-through-f32
    # maps when they are built on a TPU backend (measured: w3t/w4t ids off
    # by one 32-entry block, CPU vs TPU maps diverging at 9k entries).
    # Each probe output is a single product, so HIGHEST makes it an exact
    # copy of the kernel entry on every backend.
    mod = nn.ConvTranspose(co, (k, k), strides=(2, 2), padding="SAME",
                           precision=jax.lax.Precision.HIGHEST)
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
    """(k,k,Ci,Co) odd-k stride-2 ConvTranspose kernel ->
    ((wz*wz*Ci, 4*Co) window matrix, e_lo, wz) where the input window for
    base cell (u,v) is in[u+e_lo : u+e_lo+wz, v+e_lo : v+e_lo+wz] and
    column block (a*2+b)*Co is output phase (2u+a, 2v+b).  The window size
    wz = ceil((k+1)/2) and offsets come from impulse probing, so any
    padding/flip convention is captured automatically."""
    k, _, ci, co = kernel.shape
    resp = _convt_response(kernel, ci, co)
    # offsets delta = a - 2e => e = (a - dy) / 2 for matching parity
    es = sorted({(a - dy) // 2 for (dy, _) in resp for a in range(2) if (a - dy) % 2 == 0})
    fs = sorted({(b - dx) // 2 for (_, dx) in resp for b in range(2) if (b - dx) % 2 == 0})
    e_lo, e_hi = min(es), max(es)
    f_lo, f_hi = min(fs), max(fs)
    wz = e_hi - e_lo + 1
    if f_hi - f_lo + 1 != wz or f_lo != e_lo:
        raise NotImplementedError("non-square convT window offsets unsupported")
    out = np.zeros((wz, wz, ci, 4 * co), kernel.dtype)
    for (dy, dx), block in resp.items():
        for a in range(2):
            for b in range(2):
                if (a - dy) % 2 or (b - dx) % 2:
                    continue
                e, f = (a - dy) // 2, (b - dx) // 2
                assert e_lo <= e <= e_hi and f_lo <= f <= f_hi, (
                    "impulse response tap outside derived window"
                )
                out[e - e_lo, f - f_lo, :, (a * 2 + b) * co : (a * 2 + b + 1) * co] = block
    return out.reshape(wz * wz * ci, 4 * co), e_lo, wz


@dataclasses.dataclass
class FusedAEPlan:
    """Device-ready scattered weights for the polyphase executor.

    Static metadata: k1/k2/k5 are the conv kernel sizes (patch windows are
    k+1 wide); (e3, wz3)/(e4, wz4) are the convT window offset and size.
    """

    w1: jax.Array  # ((k1+1)^2 * 1, 128)
    b1: jax.Array  # (128,)
    w2: jax.Array  # ((k2+1)^2 * C, 128)
    b2: jax.Array
    w3: jax.Array  # (wz3^2 * C, 128) convT2 window matrix
    b3: jax.Array
    e3: int  # window start offset
    w4: jax.Array  # (wz4^2 * C, 128) convT1
    b4: jax.Array
    e4: int
    w5: jax.Array  # ((k5+1)^2 * C, 4) out conv
    b5: jax.Array  # (4,)
    k1: int = 3
    k2: int = 3
    wz3: int = 2
    wz4: int = 2
    k5: int = 3


def build_plan(params, cfg: ModelConfig = ModelConfig(), dtype=jnp.float32) -> FusedAEPlan:
    """Standard ConvAutoencoder params -> FusedAEPlan.

    Supports every depth-2 reference geometry with odd square kernels
    (scan_k3/k5/k7, manual, graphs presets).
    """
    if cfg.depth != 2:
        raise NotImplementedError("fused plan supports depth-2 models")
    for k in (*cfg.kernels, cfg.out_kernel):
        if k[0] != k[1] or k[0] % 2 == 0:
            raise NotImplementedError("fused plan supports odd square kernels")
    p = params["params"]

    def rep4(b):  # bias per channel, replicated over the 4 phases
        return np.tile(np.asarray(b), 4)

    w1 = _conv_phase_weights(np.asarray(p["enc_conv0"]["kernel"]))
    w2 = _conv_phase_weights(np.asarray(p["enc_conv1"]["kernel"]))
    w3, e3, wz3 = _convt_phase_weights(np.asarray(p["dec_deconv1"]["kernel"]))
    w4, e4, wz4 = _convt_phase_weights(np.asarray(p["dec_deconv0"]["kernel"]))
    w5 = _conv_phase_weights(np.asarray(p["out_conv"]["kernel"]))
    return FusedAEPlan(
        w1=jnp.asarray(w1, dtype), b1=jnp.asarray(rep4(p["enc_conv0"]["bias"]), dtype),
        w2=jnp.asarray(w2, dtype), b2=jnp.asarray(rep4(p["enc_conv1"]["bias"]), dtype),
        w3=jnp.asarray(w3, dtype), b3=jnp.asarray(rep4(p["dec_deconv1"]["bias"]), dtype),
        e3=e3,
        w4=jnp.asarray(w4, dtype), b4=jnp.asarray(rep4(p["dec_deconv0"]["bias"]), dtype),
        e4=e4,
        w5=jnp.asarray(w5, dtype), b5=jnp.asarray(rep4(p["out_conv"]["bias"]), dtype),
        k1=cfg.kernels[0][0], k2=cfg.kernels[1][0], wz3=wz3, wz4=wz4,
        k5=cfg.out_kernel[0],
    )


# ---------------------------------------------------------------------------
# pure-jnp executor (the correctness anchor; the Pallas kernel mirrors it)
# ---------------------------------------------------------------------------


def _patches_2x(x: jax.Array, ci: int, k: int = 3) -> jax.Array:
    """(B,H,W,Ci) -> (B,H/2,W/2, (k+1)^2*Ci): the (k+1,k+1,Ci) window
    x[2u-r : 2u+r+2, 2v-r : 2v+r+2, :] per base cell (r = (k-1)//2),
    zero-padded at borders."""
    b, h, w, _ = x.shape
    wz = k + 1
    r = (k - 1) // 2
    xp = jnp.pad(x, ((0, 0), (r, r + 1), (r, r + 1), (0, 0)))
    rows = []
    for rho in range(wz):
        cols = []
        for sigma in range(wz):
            cols.append(xp[:, rho : rho + h : 2, sigma : sigma + w : 2, :])
        rows.append(jnp.stack(cols, axis=-2))
    q = jnp.stack(rows, axis=-3)  # (B, h/2, w/2, wz, wz, Ci)
    return q.reshape(b, h // 2, w // 2, wz * wz * ci)


def _window_n(x: jax.Array, ci: int, lo: int, wz: int) -> jax.Array:
    """(B,H,W,Ci) -> (B,H,W, wz*wz*Ci): window
    x[u+lo : u+lo+wz, v+lo : v+lo+wz] per cell (convT layers), zero-padded."""
    b, h, w, _ = x.shape
    pad_lo, pad_hi = max(-lo, 0), max(lo + wz - 1, 0)
    xp = jnp.pad(x, ((0, 0), (pad_lo, pad_hi), (pad_lo, pad_hi), (0, 0)))
    rows = []
    for e in range(wz):
        cols = []
        for f in range(wz):
            cols.append(
                xp[:, pad_lo + lo + e : pad_lo + lo + e + h,
                   pad_lo + lo + f : pad_lo + lo + f + w, :]
            )
        rows.append(jnp.stack(cols, axis=-2))
    q = jnp.stack(rows, axis=-3)
    return q.reshape(b, h, w, wz * wz * ci)


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
    q1 = _patches_2x(x, x.shape[-1], plan.k1)
    p1 = _pool_phases(mm(q1, plan.w1) + plan.b1, plan.b1.shape[0] // 4)
    # L2: conv2+relu+pool
    q2 = _patches_2x(p1, p1.shape[-1], plan.k2)
    p2 = _pool_phases(mm(q2, plan.w2) + plan.b2, plan.b2.shape[0] // 4)
    # L3: convT2 + relu -> natural grid
    q3 = _window_n(p2, p2.shape[-1], plan.e3, plan.wz3)
    d = _phases_to_grid(jax.nn.relu(mm(q3, plan.w3) + plan.b3), plan.b3.shape[0] // 4)
    # L4: convT1 + relu -> phase form
    q4 = _window_n(d, d.shape[-1], plan.e4, plan.wz4)
    e_ph = jax.nn.relu(mm(q4, plan.w4) + plan.b4)
    e = _phases_to_grid(e_ph, plan.b4.shape[0] // 4)
    # L5: out conv (+ sigmoid)
    q5 = _patches_2x(e, e.shape[-1], plan.k5)
    z5 = mm(q5, plan.w5) + plan.b5  # (B, H/2, W/2, 4)
    out = _phases_to_grid(z5, 1)
    return out if logits else jax.nn.sigmoid(out)


# registered as a pytree so the plan can cross jit boundaries
jax.tree_util.register_dataclass(
    FusedAEPlan,
    data_fields=["w1", "b1", "w2", "b2", "w3", "b3", "w4", "b4", "w5", "b5"],
    meta_fields=["e3", "e4", "k1", "k2", "wz3", "wz4", "k5"],
)


# ---------------------------------------------------------------------------
# depth-generic polyphase plan (the correctness anchor for ANY depth —
# notably the deep3 preset, manual_scan_3layers.py:185-201)
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class PolyLayer:
    """One model layer in polyphase form.

    kind 'conv_pool': stride-1 SAME conv + relu + 2x2 max-pool, evaluated
    on the pooled grid (patch window k+1, all 4 phases in one matmul);
    kind 'convt': stride-2 ConvTranspose + relu, window (e, wz) from
    impulse probing; kind 'out': the stride-1 head conv, evaluated at
    half resolution with 4 output phases.
    """

    kind: str
    w: jax.Array
    b: jax.Array
    k: int = 0   # conv kernel size (conv_pool / out)
    e: int = 0   # convT window offset
    wz: int = 0  # convT window size


jax.tree_util.register_dataclass(
    PolyLayer, data_fields=["w", "b"], meta_fields=["kind", "k", "e", "wz"]
)


def build_plan_layers(params, cfg: ModelConfig, dtype=jnp.float32):
    """ConvAutoencoder params -> list[PolyLayer], any depth with odd
    square kernels.  ``build_plan`` stays the fixed depth-2 form consumed
    by the Pallas kernels; this is the depth-generic anchor/executor plan
    (reference: manual_scan_3layers.py:185-201 for the depth-3 family)."""
    for k in (*cfg.kernels, cfg.out_kernel):
        if k[0] != k[1] or k[0] % 2 == 0:
            raise NotImplementedError("polyphase plan supports odd square kernels")
    if min(cfg.input_shape[0], cfg.input_shape[1]) % (2 ** cfg.depth):
        raise NotImplementedError("input must be divisible by 2^depth")
    p = params["params"]

    def rep4(b):
        return np.tile(np.asarray(b), 4)

    layers = []
    for i, k in enumerate(cfg.kernels):
        w = _conv_phase_weights(np.asarray(p[f"enc_conv{i}"]["kernel"]))
        layers.append(PolyLayer(
            "conv_pool", jnp.asarray(w, dtype),
            jnp.asarray(rep4(p[f"enc_conv{i}"]["bias"]), dtype), k=k[0],
        ))
    for i in reversed(range(len(cfg.kernels))):
        w, e, wz = _convt_phase_weights(np.asarray(p[f"dec_deconv{i}"]["kernel"]))
        layers.append(PolyLayer(
            "convt", jnp.asarray(w, dtype),
            jnp.asarray(rep4(p[f"dec_deconv{i}"]["bias"]), dtype), e=e, wz=wz,
        ))
    w = _conv_phase_weights(np.asarray(p["out_conv"]["kernel"]))
    layers.append(PolyLayer(
        "out", jnp.asarray(w, dtype),
        jnp.asarray(rep4(p["out_conv"]["bias"]), dtype), k=cfg.out_kernel[0],
    ))
    return layers


def polyphase_apply(layers, x: jax.Array, logits: bool = False) -> jax.Array:
    """Depth-generic polyphase executor, exactly equivalent to
    ConvAutoencoder.apply (jit with ``layers`` as a pytree arg)."""
    mm = partial(jnp.matmul, precision=_HI, preferred_element_type=jnp.float32)
    for lyr in layers:
        co4 = lyr.b.shape[0]
        if lyr.kind == "conv_pool":
            q = _patches_2x(x, x.shape[-1], lyr.k)
            x = _pool_phases(mm(q, lyr.w) + lyr.b, co4 // 4)
        elif lyr.kind == "convt":
            q = _window_n(x, x.shape[-1], lyr.e, lyr.wz)
            x = _phases_to_grid(jax.nn.relu(mm(q, lyr.w) + lyr.b), co4 // 4)
        else:
            q = _patches_2x(x, x.shape[-1], lyr.k)
            x = _phases_to_grid(mm(q, lyr.w) + lyr.b, co4 // 4)
    return x if logits else jax.nn.sigmoid(x)
