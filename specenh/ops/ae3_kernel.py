"""Single fused Pallas TPU kernel for the DEPTH-3 conv autoencoder.

Why: the deep3 preset (manual_scan_3layers.py:185-201 — filters
(16, 32, 64), all kernels (5, 5)) served through the XLA conv path at
15.5 ms / 600 tiles (~20% of bf16 peak), the same HBM-bound disease the
depth-2 kernel (specenh.ops.ae_kernel) cured.  This kernel runs all
seven layers in VMEM.

Layout: the depth-2 design generalised one level down.  Every tensor
lives on the 32x16 EIGHTH-resolution coarse grid of one (256, 128) tile
(512 lanes); finer resolutions are parity planes stacked in sublanes,
with per-level parity modulus P in {8, 4, 2, 1} per axis:

    input  x64   (64, n)  8x8 full-res parities          (256x128)
    p1     (256, n)  4x4 parities x 16 ch                (128x64)
    p2     (128, n)  2x2 parities x 32 ch                (64x32)
    p3     (64, n)   coarse-native, 64 ch                (32x16)
    d2     (256, n)  2x2 parities x 64 ch                (64x32)
    d1     (512, n)  4x4 parities x 32 ch                (128x64)
    d0     16 parts of (64, n): 8x8 parities x 16 ch     (256x128)
    out    o64 (64, n)  8x8 full-res parities

Tap algebra (one rule for every layer): a window tap at signed distance
``d`` on a P-parity input decomposes into parity ``d mod P`` (a sublane
row-block slice) and coarse lane shift ``d // P`` (static, with edge
masks).  Encoder layers evaluated at P_out parities use d = 2u - r + rho
per output parity u; decoder (ConvTranspose) layers use d = w + e_lo + i
per base parity w, with the 4 output phases in the weight columns
(exactly specenh.ops.fused_ae's polyphase algebra, which remains the
correctness anchor via build_plan_layers/polyphase_apply).

Weights are host-scattered from the depth-generic polyphase plan; the
first conv (ci=1: single-row parity blocks are illegal Mosaic slices)
folds its row selection into the weights over full shifted x64 copies,
like the depth-2 kernel's L1.

Reference parity: replaces Keras ``autoencoder.predict`` for the
depth-3 family (VAE/manual_scan_3layers.py:203-233).
"""

from __future__ import annotations

import dataclasses
import functools
from functools import partial
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from specenh.config import ModelConfig
from specenh.ops.fused_ae import build_plan_layers

__all__ = ["AE3KernelWeights", "build_kernel3_weights", "ae3_kernel_apply",
           "ae3_kernel_enhance_specs", "supports3", "tiles_to_x64",
           "o64_to_tiles", "specs_to_x64", "o64_to_specs"]

# one (256, 128) tile: depth-3 coarse grid 32 x 16 = 512 lanes
CS3, CT3 = 32, 16
LANES3 = CS3 * CT3


def supports3(cfg: ModelConfig) -> bool:
    """Depth-3 geometries the fused kernel executes: odd square kernels
    <= 7, filters multiples of 16 up to 64 (the deep3 preset is
    (16, 32, 64)), (256, 128, 1) tiles."""
    return (
        cfg.depth == 3
        and tuple(cfg.input_shape) == (256, 128, 1)
        and all(
            k[0] == k[1] and k[0] % 2 == 1 and k[0] <= 7
            for k in (*cfg.kernels, cfg.out_kernel)
        )
        and all(c % 16 == 0 and c <= 64 for c in cfg.filters)
    )


# ---------------------------------------------------------------------------
# host-side: tap tables
# ---------------------------------------------------------------------------


def _enc0_shift_sets(p: int, q: int, k: int) -> Tuple[List[int], List[int]]:
    """First-conv coarse shifts for output parity (p, q) of the 4x4 eval
    grid: window positions d = 2p - r + rho on the 8-parity input."""
    r = (k - 1) // 2
    es = sorted({(2 * p - r + rho) // 8 for rho in range(k + 1)})
    fs = sorted({(2 * q - r + sigma) // 8 for sigma in range(k + 1)})
    return es, fs


def _enc0_weight(plan_w: np.ndarray, p: int, q: int, k: int) -> np.ndarray:
    """Host-scattered first-conv lhs (4*C1, |E||F|*64) for parity (p, q):
    row selection folded in (column (ei*|F| + fi)*64 + xi*8 + phi carries
    the tap landing on that shift/parity pair; x64 rows are xi-major)."""
    r = (k - 1) // 2
    es, fs = _enc0_shift_sets(p, q, k)
    out = np.zeros((plan_w.shape[1], len(es) * len(fs) * 64), np.float32)
    for rho in range(k + 1):
        dy = 2 * p - r + rho
        phi, e = dy % 8, dy // 8
        for sigma in range(k + 1):
            dx = 2 * q - r + sigma
            xi, f = dx % 8, dx // 8
            col = (es.index(e) * len(fs) + fs.index(f)) * 64 + xi * 8 + phi
            out[:, col] = plan_w[rho * (k + 1) + sigma, :]
    return out


def _enc_slots(u: int, v: int, k: int, p_in: int) -> List[Tuple[int, int, int]]:
    """Mid-encoder conv window taps for output parity (u, v): input has
    p_in parities per axis; d = 2u - r + rho -> (parity block, e, f)."""
    r = (k - 1) // 2
    slots = []
    for rho in range(k + 1):
        d = 2 * u - r + rho
        py, e = d % p_in, d // p_in
        for sigma in range(k + 1):
            d2 = 2 * v - r + sigma
            qx, f = d2 % p_in, d2 // p_in
            slots.append((py * p_in + qx, e, f))
    return slots


def _dec_slots(w: int, x: int, e_lo: int, wz: int, p_in: int) -> List[Tuple[int, int, int]]:
    """ConvTranspose window taps for base parity (w, x) of the input
    grid: d = w + e_lo + i -> (parity block, e, f)."""
    slots = []
    for i in range(wz):
        d = w + e_lo + i
        py, e = d % p_in, d // p_in
        for j in range(wz):
            d2 = x + e_lo + j
            qx, f = d2 % p_in, d2 // p_in
            slots.append((py * p_in + qx, e, f))
    return slots


def _out_slots(p: int, q: int, k: int) -> List[Tuple[int, int, int]]:
    """Head-conv window taps for output parity (p, q) of the 4x4 eval
    grid, indexing the 16 dec0 production parts: part (dy//2)*4 + dx//2,
    phase row-block (dy%2)*2 + dx%2 within it."""
    r = (k - 1) // 2
    slots = []
    for rho in range(k + 1):
        dy = 2 * p - r + rho
        phi, e = dy % 8, dy // 8
        for sigma in range(k + 1):
            dx = 2 * q - r + sigma
            xi, f = dx % 8, dx // 8
            part = (phi // 2) * 4 + (xi // 2)
            blk = (phi % 2) * 2 + (xi % 2)
            slots.append((part * 4 + blk, e, f))
    return slots


@dataclasses.dataclass
class AE3KernelWeights:
    """Device-ready transposed weight matrices (+ static metadata).

    w0t: first conv, 16 stacked (4*C1, Kmax) parity blocks (K varies per
    parity; the live columns are the first |E||F|*64).
    """

    w0t: jax.Array   # (16 * 4*C1, K0max)
    b0: jax.Array    # (4*C1, 1)
    w1t: jax.Array   # (4*C2, (k+1)^2*C1)
    b1: jax.Array
    w2t: jax.Array   # (4*C3, (k+1)^2*C2)
    b2: jax.Array
    wd2t: jax.Array  # (4*C3, wz^2*C3)
    bd2: jax.Array
    wd1t: jax.Array  # (4*C2, wz^2*C3)
    bd1: jax.Array
    wd0t: jax.Array  # (4*C1, wz^2*C2)
    bd0: jax.Array
    wot: jax.Array   # (4, (k+1)^2*C1)
    bo: jax.Array    # (4, 1)
    e_d2: int
    wz_d2: int
    e_d1: int
    wz_d1: int
    e_d0: int
    wz_d0: int
    k0: int = 5
    k1: int = 5
    k2: int = 5
    ko: int = 5
    c1: int = 16
    c2: int = 32
    c3: int = 64


jax.tree_util.register_dataclass(
    AE3KernelWeights,
    data_fields=["w0t", "b0", "w1t", "b1", "w2t", "b2", "wd2t", "bd2",
                 "wd1t", "bd1", "wd0t", "bd0", "wot", "bo"],
    meta_fields=["e_d2", "wz_d2", "e_d1", "wz_d1", "e_d0", "wz_d0",
                 "k0", "k1", "k2", "ko", "c1", "c2", "c3"],
)


def build_kernel3_weights(params, cfg: ModelConfig,
                          dtype=jnp.bfloat16) -> AE3KernelWeights:
    if not supports3(cfg):
        raise NotImplementedError(
            "ae3_kernel supports depth-3 geometries with odd square "
            "kernels <= 7 and 16/32/64-channel filters"
        )
    layers = build_plan_layers(params, cfg, dtype=jnp.float32)
    enc0, enc1, enc2, dec2, dec1, dec0, outl = layers
    c1, c2, c3 = cfg.filters
    k0, k1, k2 = (k[0] for k in cfg.kernels)
    ko = cfg.out_kernel[0]

    def t(w):
        return jnp.asarray(np.asarray(w, np.float32).T, dtype)

    def col(b):
        return jnp.asarray(np.asarray(b, np.float32))[:, None]

    w0_np = np.asarray(enc0.w, np.float32)
    blocks = [_enc0_weight(w0_np, p, q, k0) for p in range(4) for q in range(4)]
    kmax = max(b.shape[1] for b in blocks)
    w0t = np.zeros((16 * 4 * c1, kmax), np.float32)
    for i, b in enumerate(blocks):
        w0t[i * 4 * c1:(i + 1) * 4 * c1, : b.shape[1]] = b
    return AE3KernelWeights(
        w0t=jnp.asarray(w0t, dtype), b0=col(enc0.b),
        w1t=t(enc1.w), b1=col(enc1.b),
        w2t=t(enc2.w), b2=col(enc2.b),
        wd2t=t(dec2.w), bd2=col(dec2.b),
        wd1t=t(dec1.w), bd1=col(dec1.b),
        wd0t=t(dec0.w), bd0=col(dec0.b),
        wot=t(outl.w), bo=col(np.asarray(outl.b)[:4]),
        e_d2=dec2.e, wz_d2=dec2.wz, e_d1=dec1.e, wz_d1=dec1.wz,
        e_d0=dec0.e, wz_d0=dec0.wz,
        k0=k0, k1=k1, k2=k2, ko=ko, c1=c1, c2=c2, c3=c3,
    )


# ---------------------------------------------------------------------------
# XLA-side layout conversion
# ---------------------------------------------------------------------------


def tiles_to_x64(tiles: jax.Array, dtype=jnp.bfloat16) -> jax.Array:
    """(B, 256, 128, 1) NHWC tiles -> (64, B*512) full-res parity rows on
    the 32x16 coarse grid (row = xi*8 + phi, x-parity major)."""
    b = tiles.shape[0]
    x = jnp.squeeze(tiles, -1).astype(dtype)
    x = x.reshape(b, CS3, 8, CT3, 8)
    x = x.transpose(4, 2, 0, 1, 3)                       # (xi, phi, B, 32, 16)
    return x.reshape(64, b * LANES3)


def o64_to_tiles(o64: jax.Array, b: int) -> jax.Array:
    """(64, B*512) parity rows in PRODUCTION order (py, qx, a, bb) ->
    (B, 256, 128, 1) tiles (pixel y = 8s + 2*py + a, x = 8t + 2*qx + bb)."""
    x = o64.reshape(4, 4, 2, 2, b, CS3, CT3)             # (py,qx,a,bb,B,s,t)
    x = x.transpose(4, 5, 0, 2, 6, 1, 3)                 # (B,s,py,a,t,qx,bb)
    return x.reshape(b, 256, 128)[..., None]


def specs_to_x64(specs: jax.Array, k_tiles: int, dtype=jnp.bfloat16) -> jax.Array:
    """(C, 256, >=k*128) spectrograms -> (64, C*k*512) parity rows."""
    c = specs.shape[0]
    tiles = specs[:, :, : k_tiles * 128].reshape(c, 256, k_tiles, 128)
    tiles = tiles.transpose(0, 2, 1, 3).reshape(c * k_tiles, 256, 128, 1)
    return tiles_to_x64(tiles, dtype)


def o64_to_specs(o64: jax.Array, c: int, k_tiles: int) -> jax.Array:
    """(64, C*k*512) production parity rows -> (C, 256, k*128)."""
    t = jnp.squeeze(o64_to_tiles(o64, c * k_tiles), -1)
    t = t.reshape(c, k_tiles, 256, 128)
    return t.transpose(0, 2, 1, 3).reshape(c, 256, k_tiles * 128)


# ---------------------------------------------------------------------------
# the kernel
# ---------------------------------------------------------------------------


def _lane_shift(x, sh):
    if sh == 0:
        return x
    k = x.shape[0]
    if sh > 0:
        return jnp.concatenate([x[:, sh:], jnp.zeros((k, sh), x.dtype)], axis=1)
    return jnp.concatenate([jnp.zeros((k, -sh), x.dtype), x[:, :sh]], axis=1)


def _make_masks3(nb, dtype, ss=CT3, emax=1):
    """0/1 (1, nb) edge masks per (e, f) on the 32x16 coarse grid (``ss``
    = lane stride of one coarse-freq step; 16*I when I tiles interleave)."""
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, nb), 1)
    s = (lane // jnp.int32(ss)) & jnp.int32(CS3 - 1)
    t = lane & jnp.int32(CT3 - 1)
    mu = {0: None}
    mv = {0: None}
    for e in range(1, emax + 1):
        mu[-e] = (s >= e).astype(dtype)
        mu[e] = (s < CS3 - e).astype(dtype)
        mv[-e] = (t >= e).astype(dtype)
        mv[e] = (t < CT3 - e).astype(dtype)
    masks = {}
    for e in range(-emax, emax + 1):
        for f in range(-emax, emax + 1):
            if mu[e] is None and mv[f] is None:
                masks[(e, f)] = None
            elif mu[e] is None:
                masks[(e, f)] = mv[f]
            elif mv[f] is None:
                masks[(e, f)] = mu[e]
            else:
                masks[(e, f)] = mu[e] * mv[f]
    return masks


def _tap(x, row0, nrows, e, f, masks, ss):
    blk = x[row0:row0 + nrows, :]
    y = _lane_shift(blk, e * ss + f)
    m = masks[(e, f)]
    return y if m is None else y * m


def _mm(lhs, rhs):
    return jax.lax.dot_general(
        lhs, rhs, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )


def _phase_max(z, c):
    z = jax.nn.relu(z)
    return jnp.maximum(
        jnp.maximum(z[0:c], z[c:2 * c]),
        jnp.maximum(z[2 * c:3 * c], z[3 * c:4 * c]),
    )


_K_CHUNK_LIMIT = 1024


def _tapsum(w_ref, taps, nrows, k_limit=_K_CHUNK_LIMIT):
    k_total = len(taps) * nrows
    n_chunks = max(1, -(-k_total // k_limit))
    chunk = -(-len(taps) // n_chunks)
    z = None
    for i in range(0, len(taps), chunk):
        sub = taps[i:i + chunk]
        q = jnp.concatenate([t() for t in sub], axis=0)
        part = _mm(w_ref[:, i * nrows:(i + len(sub)) * nrows], q)
        z = part if z is None else z + part
    return z


def _make_kernel3(wts: AE3KernelWeights, nb: int, dtype, ss: int = CT3):
    c1, c2, c3 = wts.c1, wts.c2, wts.c3
    enc0_sets = [_enc0_shift_sets(p, q, wts.k0) for p in range(4) for q in range(4)]
    enc1_all = [_enc_slots(u, v, wts.k1, 4) for u in range(2) for v in range(2)]
    enc2_slots = _enc_slots(0, 0, wts.k2, 2)
    d2_slots = _dec_slots(0, 0, wts.e_d2, wts.wz_d2, 1)
    d1_all = [_dec_slots(w, x, wts.e_d1, wts.wz_d1, 2)
              for w in range(2) for x in range(2)]
    d0_all = [_dec_slots(w, x, wts.e_d0, wts.wz_d0, 4)
              for w in range(4) for x in range(4)]
    out_all = [_out_slots(p, q, wts.ko) for p in range(4) for q in range(4)]
    emax = max(
        max(abs(e), abs(f))
        for slots in (enc1_all + [enc2_slots, d2_slots] + d1_all + d0_all
                      + out_all)
        for (_, e, f) in slots
    )
    emax = max(emax, *(abs(s) for es, fs in enc0_sets for s in (*es, *fs)))

    def kernel(x64_ref, w0_ref, b0_ref, w1_ref, b1_ref, w2_ref, b2_ref,
               wd2_ref, bd2_ref, wd1_ref, bd1_ref, wd0_ref, bd0_ref,
               wo_ref, bo_ref, o_ref):
        masks = _make_masks3(nb, dtype, ss, emax)
        x64 = x64_ref[:]

        # enc0: first conv + relu + pool at the 4x4 parity grid.  K
        # operands are full shifted x64 copies (ci=1: single-row gathers
        # are illegal); row selection lives in the host weights.
        shifts = sorted({
            (e, f) for es, fs in enc0_sets for e in es for f in fs
        })
        shifted = {
            (e, f): _tap(x64, 0, 64, e, f, masks, ss) for (e, f) in shifts
        }
        m0 = 4 * c1
        p1_parts = []
        for pi in range(16):
            es, fs = enc0_sets[pi]
            q0 = jnp.concatenate(
                [shifted[(e, f)] for e in es for f in fs], axis=0
            )
            z0 = _mm(w0_ref[pi * m0:(pi + 1) * m0, : q0.shape[0]], q0) + b0_ref[:]
            p1_parts.append(_phase_max(z0, c1).astype(dtype))
        p1 = jnp.concatenate(p1_parts, axis=0)            # (16*C1, nb)

        # enc1: conv + relu + pool at the 2x2 parity grid
        p2_parts = []
        for ui in range(4):
            z1 = _tapsum(
                w1_ref,
                [partial(_tap, p1, r * c1, c1, e, f, masks, ss)
                 for (r, e, f) in enc1_all[ui]],
                c1,
            ) + b1_ref[:]
            p2_parts.append(_phase_max(z1, c2).astype(dtype))
        p2 = jnp.concatenate(p2_parts, axis=0)            # (4*C2, nb)

        # enc2: conv + relu + pool at the coarse grid
        z2 = _tapsum(
            w2_ref,
            [partial(_tap, p2, r * c2, c2, e, f, masks, ss)
             for (r, e, f) in enc2_slots],
            c2,
        ) + b2_ref[:]
        p3 = _phase_max(z2, c3).astype(dtype)             # (C3, nb)

        # dec2: convT + relu -> 2x2 parities x C3
        zd2 = _tapsum(
            wd2_ref,
            [partial(_tap, p3, r * c3, c3, e, f, masks, ss)
             for (r, e, f) in d2_slots],
            c3,
        )
        d2 = jax.nn.relu(zd2 + bd2_ref[:]).astype(dtype)  # (4*C3, nb)

        # dec1: convT + relu -> 4x4 parities x C2 (4 base-parity gathers).
        # Each gather produces part (w, x) with the 4 phases (a, b) inside;
        # the full parity is (2w+a, 2x+b), so the concat re-orders the
        # phase blocks PARITY-major (py*4 + qx) — the layout _dec_slots
        # indexes for dec0.
        d1_parts = []
        for wi in range(4):
            zd1 = _tapsum(
                wd1_ref,
                [partial(_tap, d2, r * c3, c3, e, f, masks, ss)
                 for (r, e, f) in d1_all[wi]],
                c3,
            )
            d1_parts.append(jax.nn.relu(zd1 + bd1_ref[:]).astype(dtype))
        d1 = jnp.concatenate([
            d1_parts[(py // 2) * 2 + (qx // 2)][
                ((py % 2) * 2 + (qx % 2)) * c2:
                ((py % 2) * 2 + (qx % 2)) * c2 + c2, :]
            for py in range(4) for qx in range(4)
        ], axis=0)                                        # (16*C2, nb)

        # dec0: convT + relu -> 16 production parts of (4*C1, nb)
        d0_parts = []
        for wi in range(16):
            zd0 = _tapsum(
                wd0_ref,
                [partial(_tap, d1, r * c2, c2, e, f, masks, ss)
                 for (r, e, f) in d0_all[wi]],
                c2,
            )
            d0_parts.append(jax.nn.relu(zd0 + bd0_ref[:]).astype(dtype))

        # out conv + sigmoid -> o64 in production order (py, qx, a, b).
        # Taps index straight into the 16 dec0 parts (slot r = part*4 +
        # phase block).
        for pi in range(16):
            zo = _tapsum(
                wo_ref,
                [partial(_tap, d0_parts[r // 4], (r % 4) * c1, c1, e, f,
                         masks, ss)
                 for (r, e, f) in out_all[pi]],
                c1,
            ) + bo_ref[:]                                 # (4, nb)
            o_ref[pi * 4:(pi + 1) * 4, :] = jax.nn.sigmoid(zo).astype(
                o_ref.dtype
            )

    return kernel


def _pallas_ae3(x64, wts: AE3KernelWeights, block_tiles: int, interpret: bool,
                out_dtype=jnp.float32, ss=CT3):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    m = x64.shape[1]
    nb = block_tiles * LANES3
    kern = _make_kernel3(wts, nb, x64.dtype, ss)

    def fixed(arr):
        return pl.BlockSpec(arr.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)

    ws = [wts.w0t, wts.b0, wts.w1t, wts.b1, wts.w2t, wts.b2,
          wts.wd2t, wts.bd2, wts.wd1t, wts.bd1, wts.wd0t, wts.bd0,
          wts.wot, wts.bo]
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((64, m), out_dtype),
        grid=(m // nb,),
        in_specs=[
            pl.BlockSpec((64, nb), lambda i: (0, i), memory_space=pltpu.VMEM),
            *[fixed(w) for w in ws],
        ],
        out_specs=pl.BlockSpec((64, nb), lambda i: (0, i), memory_space=pltpu.VMEM),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=96 * 1024 * 1024),
    )(x64, *ws)


@functools.partial(jax.jit, static_argnames=("block_tiles", "interpret", "out_dtype"))
def ae3_kernel_apply(wts: AE3KernelWeights, tiles: jax.Array,
                     block_tiles: int = 1, interpret: bool = False,
                     out_dtype=jnp.float32) -> jax.Array:
    """(B, 256, 128, 1) tiles -> (B, 256, 128, 1) sigmoid probabilities:
    drop-in ConvAutoencoder.apply for the depth-3 family."""
    b = tiles.shape[0]
    x64 = tiles_to_x64(tiles, jnp.bfloat16)
    o64 = _pallas_ae3(x64, wts, block_tiles, interpret, out_dtype)
    return o64_to_tiles(o64, b)


@functools.partial(jax.jit, static_argnames=("k_tiles", "block_tiles",
                                             "interpret", "out_dtype"))
def ae3_kernel_enhance_specs(wts: AE3KernelWeights, specs: jax.Array,
                             k_tiles: int, block_tiles: int = 0,
                             interpret: bool = False,
                             out_dtype=jnp.float32) -> jax.Array:
    """(C, 256, T) spectrograms -> (C, 256, k*128) restitched enhancement:
    the depth-3 serving fast path — Pallas corner-turn in, the fused
    kernel with interleaved lanes (ss = 16*I), Pallas corner-turn out.
    ``block_tiles=0`` processes one I-tile group per grid step."""
    from specenh.ops.parity_turn import (
        o64_2d_to_specs,
        pick_interleave3,
        specs_to_x64_2d,
    )

    c = specs.shape[0]
    i_ = pick_interleave3(k_tiles)
    if block_tiles == 0:
        # two interleave groups per grid step when they divide the total
        # (measured best: I=2/bt=4 on the deep3 reference shot)
        block_tiles = 2 * i_ if (c * k_tiles) % (2 * i_) == 0 else i_
    if block_tiles % i_:
        raise ValueError(
            f"block_tiles {block_tiles} must be a multiple of the "
            f"interleave {i_}"
        )
    x64 = specs_to_x64_2d(specs, k_tiles, interleave=i_, interpret=interpret)
    o64 = _pallas_ae3(x64, wts, block_tiles, interpret, out_dtype,
                      ss=CT3 * i_)
    return o64_2d_to_specs(o64, c, k_tiles, interleave=i_,
                           interpret=interpret)
