"""Single fused Pallas TPU kernel for the whole depth-2 conv autoencoder.

Why: the stock XLA conv pipeline is HBM-bandwidth-bound — ~6 GB of
inter-layer activation traffic per 20-channel shot (Z1, P1, P2, d, E all
round-trip HBM; PERF_NOTES.md "Where the 16.5 ms goes").  This kernel keeps
every activation in VMEM: HBM sees only the input tiles and the sigmoid
output (~160 MB/shot).

The layout idea that makes it legal under Mosaic's constraints (no strided
slices on values, lane shuffles expensive, M-major matmuls slow):

    EVERY tensor lives on a fixed coarse lane grid — the 64x32 quarter-
    resolution cells of one (256,128) tile, 2048 lanes — and finer
    resolutions are expressed as PARITY PLANES stacked in the sublane
    (row) dimension:

      input  x16  (16, 2048)  16 full-res parity rows  (256x128 = 4x4 par)
      P1     p1_4 (128, 2048)  4 fine parities x 32 ch  (128x64  = 2x2 par)
      P2     p2   (32, 2048)   coarse-native            (64x32)
      d      d4   (128, 2048)  4 fine parities x 32 ch
      E      e16  (512, 2048) 16 full-res parities x 32 ch
      out    o16  (16, 2048)  16 full-res parity rows

    Convolution windows then decompose into (parity row-block, coarse lane
    shift) pairs: selecting a parity plane is a SUBLANE slice (free), and a
    coarse shift is a static lane shift by f + 32*e (cheap), so every layer
    is ONE dense (rows, K)@(K, 2048) matmul over host-scattered weights —
    K in {16, 128, 512}, full MXU rows, no dilation, no lane re-gridding.

Weights come from the existing polyphase plan (specenh.ops.fused_ae
.build_plan) — this kernel is the Pallas execution of that same math, and
``fused_ae_apply`` (pure jnp, float32) remains the correctness anchor.
Numerics: bf16 operands / f32 accumulation; service-level SSIM vs the f32
path is gated in bench.py.

Reference parity: replaces Keras ``autoencoder.predict``
(VAE/hyperparam_scan.py:214-244) for inference of the depth-2 family.
"""

from __future__ import annotations

import dataclasses
import functools
from functools import partial
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from specenh.config import ModelConfig
from specenh.ops.fused_ae import FusedAEPlan, build_plan

__all__ = ["AEKernelWeights", "build_kernel_weights", "ae_kernel_apply",
           "ae_kernel_enhance_specs", "supports", "tiles_to_x16",
           "o16_to_tiles", "specs_to_x16", "o16_to_specs"]

# one (256, 128) tile: coarse grid 64 x 32 = 2048 lanes
CS, CT = 64, 32
LANES = CS * CT


# ---------------------------------------------------------------------------
# host-side: tap tables and scattered weights
# ---------------------------------------------------------------------------


def _l1_shift_sets(p: int, q: int, k: int = 3):
    """conv1 window coarse shifts for fine-parity (p, q): the (k+1)^2 taps
    touch shifts E_p x F_q — for k=3/5: E_0 = {-1, 0}, E_1 = {0, 1};
    for k=7 both are {-1, 0, 1} (same for f)."""
    r = (k - 1) // 2
    es = sorted({(2 * p - r + rho) // 4 for rho in range(k + 1)})
    fs = sorted({(2 * q - r + sigma) // 4 for sigma in range(k + 1)})
    return es, fs


def _l1_weight(plan_w1: np.ndarray, p: int, q: int, k: int = 3) -> np.ndarray:
    """Host-scattered conv1 lhs (4*C1, |E||F|*16) for fine-parity (p, q).

    The kernel's K operand is the concat of the four FULL shifted x16
    copies X_(e,f) (16 rows each, (e, f) in E_p x F_q order); single-row
    gathers are illegal lane-shifted slices under Mosaic, so the row
    selection is folded in here: column (ei*2 + fi)*16 + (xi*4 + phi)
    carries the weight of window tap (rho, sigma) that lands on that
    (shift, parity-row) pair.  x16 rows are xi-major (see tiles_to_x16).
    """
    r = (k - 1) // 2
    es, fs = _l1_shift_sets(p, q, k)
    out = np.zeros((plan_w1.shape[1], len(es) * len(fs) * 16), np.float32)
    for rho in range(k + 1):
        dy = 2 * p - r + rho
        phi, e = dy % 4, dy // 4
        for sigma in range(k + 1):
            dx = 2 * q - r + sigma
            xi, f = dx % 4, dx // 4
            col = (es.index(e) * len(fs) + fs.index(f)) * 16 + xi * 4 + phi
            out[:, col] = plan_w1[rho * (k + 1) + sigma, :]
    return out


def _l2_slots(k: int = 3) -> List[Tuple[int, int, int]]:
    """(k+1)^2 window taps of conv2 (base = coarse grid): C1-row parity
    blocks of p1_4, coarse shifts up to +-(k+1)//4."""
    r = (k - 1) // 2
    slots = []
    for rho in range(k + 1):
        d = rho - r
        pp, e = d % 2, d // 2
        for sigma in range(k + 1):
            d2 = sigma - r
            qq, f = d2 % 2, d2 // 2
            slots.append((pp * 2 + qq, e, f))
    return slots


def _l4_slots(p: int, q: int, e4: int, wz: int) -> List[Tuple[int, int, int]]:
    """convT1 window taps for fine-parity (p, q): 32-row blocks of d4."""
    slots = []
    for i in range(wz):
        d = p + e4 + i
        pp, e = d % 2, d // 2
        for j in range(wz):
            d2 = q + e4 + j
            qq, f = d2 % 2, d2 // 2
            slots.append((pp * 2 + qq, e, f))
    return slots


def _l5_slots(p: int, q: int, k: int = 3) -> List[Tuple[int, int, int]]:
    """out-conv window taps for fine-parity (p, q): C1-row blocks of e16.

    e16 rows are in PRODUCTION order (p', q', a', b', c) — the direct concat
    of the four convT1 outputs — so full-res parity (phi, xi) maps to block
    ((p'*2 + q')*4 + a'*2 + b') with p' = phi//2, a' = phi%2 etc."""
    r = (k - 1) // 2
    slots = []
    for rho in range(k + 1):
        dy = 2 * p - r + rho
        phi, e = dy % 4, dy // 4
        for sigma in range(k + 1):
            dx = 2 * q - r + sigma
            xi, f = dx % 4, dx // 4
            blk = (((phi // 2) * 2 + (xi // 2)) * 4) + (phi % 2) * 2 + (xi % 2)
            slots.append((blk, e, f))
    return slots


@dataclasses.dataclass
class AEKernelWeights:
    """Device-ready transposed weight matrices (+ static tap tables)."""

    w1t: jax.Array  # (512, 64)   conv1: 4 per-parity (128, 64) blocks
    b1: jax.Array   # (128, 1)
    w2t: jax.Array  # (128, 512)  conv2
    b2: jax.Array
    w3t: jax.Array  # (128, wz3^2*32) convT2
    b3: jax.Array
    w4t: jax.Array  # (128, wz4^2*32) convT1
    b4: jax.Array
    w5t: jax.Array  # (4, (k5+1)^2*C1) out conv
    b5: jax.Array   # (4, 1)
    e3: int
    wz3: int
    e4: int
    wz4: int
    k1: int = 3
    k2: int = 3
    k5: int = 3
    c1: int = 32
    c2: int = 32

    def tree_flatten(self):  # pragma: no cover - registered below
        pass


jax.tree_util.register_dataclass(
    AEKernelWeights,
    data_fields=["w1t", "b1", "w2t", "b2", "w3t", "b3", "w4t", "b4", "w5t", "b5"],
    meta_fields=["e3", "wz3", "e4", "wz4", "k1", "k2", "k5", "c1", "c2"],
)


def supports(cfg: ModelConfig) -> bool:
    """Geometries the fused kernel executes: every depth-2 reference
    config — odd square kernels up to 7 (the array sweep's k3/k5/k7,
    hyperparam_scan.py:123), filters 32 or 64 per layer (the manual
    (64, 32)/k5 config, manual_scan.py:120-124), (256, 128, 1) tiles.
    Channel counts must be sublane-block multiples (32) for the parity
    row layout."""
    return (
        cfg.depth == 2
        and tuple(cfg.input_shape) == (256, 128, 1)
        and all(
            k[0] == k[1] and k[0] % 2 == 1 and k[0] <= 7
            for k in (*cfg.kernels, cfg.out_kernel)
        )
        and all(c % 32 == 0 and c <= 64 for c in cfg.filters)
    )


def build_kernel_weights(params, cfg: ModelConfig = ModelConfig(),
                         dtype=jnp.bfloat16) -> AEKernelWeights:
    if not supports(cfg):
        raise NotImplementedError(
            "ae_kernel supports depth-2 geometries with odd square kernels "
            "<= 7 and 32/64-channel filters; other configs use the Flax path"
        )
    plan = build_plan(params, cfg, dtype=jnp.float32)

    def t(w):
        return jnp.asarray(np.asarray(w, np.float32).T, dtype)

    def col(b):
        return jnp.asarray(np.asarray(b, np.float32))[:, None]

    k1, k2, k5 = plan.k1, plan.k2, plan.k5
    w1_np = np.asarray(plan.w1, np.float32)
    blocks = [_l1_weight(w1_np, p, q, k1) for p in range(2) for q in range(2)]
    assert len({b.shape for b in blocks}) == 1, "uneven L1 shift sets"
    w1t_stack = np.concatenate(blocks, axis=0)  # (4 * 4*C1, |E||F|*16)
    return AEKernelWeights(
        w1t=jnp.asarray(w1t_stack, dtype), b1=col(plan.b1),
        w2t=t(plan.w2), b2=col(plan.b2),
        w3t=t(plan.w3), b3=col(plan.b3),
        w4t=t(plan.w4), b4=col(plan.b4),
        w5t=t(plan.w5), b5=col(np.asarray(plan.b5)[:4]),
        e3=plan.e3, wz3=plan.wz3, e4=plan.e4, wz4=plan.wz4,
        k1=k1, k2=k2, k5=k5,
        c1=int(cfg.filters[0]), c2=int(cfg.filters[1]),
    )


# ---------------------------------------------------------------------------
# XLA-side layout conversion (cheap reshape/transpose copies on HBM)
# ---------------------------------------------------------------------------


def tiles_to_x16(tiles: jax.Array, dtype=jnp.bfloat16) -> jax.Array:
    """(B, 256, 128, 1) NHWC tiles -> (16, B*2048) full-res parity rows.

    Row order is TIME-PARITY MAJOR (row = xi*4 + phi): natural spectrogram
    rows are already s-major (y = 4s + phi), so the xi-major convention
    lets the Pallas corner-turn build each coarse-s block of 16 rows from
    plain 4-row sublane slices — no row-permutation matmul."""
    b = tiles.shape[0]
    x = jnp.squeeze(tiles, -1).astype(dtype)            # (B, 256, 128)
    x = x.reshape(b, CS, 4, CT, 4)
    x = x.transpose(4, 2, 0, 1, 3)                      # (xi, phi, B, 64, 32)
    return x.reshape(16, b * LANES)


@functools.lru_cache(maxsize=1)
def _gather_kernel_4x4():
    """One-hot stride-4 conv kernel gathering natural offset (phi, xi) into
    channel ch = xi*4 + phi (forward conv = cross-correlation, no flip)."""
    w = np.zeros((4, 4, 1, 16), np.float32)
    for ch in range(16):
        w[ch % 4, ch // 4, 0, ch] = 1.0
    return jnp.asarray(w, jnp.bfloat16)


def specs_to_x16(specs: jax.Array, k_tiles: int, dtype=jnp.bfloat16) -> jax.Array:
    """(C, 256, >=k*128) spectrograms -> (16, C*k*2048) parity rows.

    The 16-way parity gather runs as a stride-4 one-hot conv (exact: the
    0/1 taps select disjoint values) followed by an identity-matrix
    dot_general for the final (m, 16) -> (16, m) transpose — the MXU
    consumes the transposed operand natively, so this measures 2.14 ms for
    a 600-tile shot vs 2.33 for the best pure-transpose form."""
    c = specs.shape[0]
    tiles = specs[:, :, : k_tiles * 128].reshape(c, 256, k_tiles, 128)
    tiles = tiles.transpose(0, 2, 1, 3).reshape(c * k_tiles, 256, 128, 1)
    y = jax.lax.conv_general_dilated(
        tiles.astype(dtype), _gather_kernel_4x4().astype(dtype), (4, 4),
        "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=dtype,
    )                                                    # (B, 64, 32, 16)
    y = y.reshape(c * k_tiles * LANES, 16)
    eye = jnp.asarray(np.eye(16, dtype=np.float32), dtype)
    return jax.lax.dot_general(
        eye, y, (((1,), (1,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
    )


@functools.lru_cache(maxsize=1)
def _scatter_kernel_4x4():
    """One-hot conv_transpose kernel scattering production-order parity
    channel ch=(p,q,a,b) to natural offset (phi, xi) = (2p+a, 2q+b).
    lax.conv_transpose flips the kernel (impulse-probed: W[i, j] lands at
    stride*s + (3-i)), hence the 3- indices."""
    w = np.zeros((4, 4, 16, 1), np.float32)
    for ch in range(16):
        p, q, a, b = (ch >> 3) & 1, (ch >> 2) & 1, (ch >> 1) & 1, ch & 1
        w[3 - (2 * p + a), 3 - (2 * q + b), ch, 0] = 1.0
    return jnp.asarray(w)


def o16_to_specs(o16: jax.Array, c: int, k_tiles: int) -> jax.Array:
    """(16, C*k*2048) parity rows (production order) -> (C, 256, k*128)
    restitched enhancement.

    The 16-way parity interleave runs as a stride-4 one-hot conv_transpose
    at Precision.HIGHEST (exact 0/1 scatter on the MXU) — 2.05 ms for a
    600-tile shot vs 2.84 for the best pure-transpose form (XLA TPU
    transposes run at ~150 GB/s; the conv engine does the scatter at
    memory speed)."""
    b = o16.shape[1] // LANES
    x = o16.reshape(16, b, LANES).transpose(1, 2, 0)     # (B, 2048, 16)
    y = jax.lax.conv_transpose(
        x.reshape(b, CS, CT, 16), _scatter_kernel_4x4(), strides=(4, 4),
        padding="VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=jax.lax.Precision.HIGHEST,
    )                                                    # (B, 256, 128, 1)
    t = jnp.squeeze(y, -1).reshape(c, k_tiles, 256, 128)
    return t.transpose(0, 2, 1, 3).reshape(c, 256, k_tiles * 128)


def o16_to_tiles(o16: jax.Array, b: int) -> jax.Array:
    """(16, B*2048) parity rows in PRODUCTION order (p, q, a, b) ->
    (B, 256, 128, 1) NHWC tiles (natural pixel y = 4s + 2p + a,
    x = 4t + 2q + bb)."""
    x = o16.reshape(2, 2, 2, 2, b, CS, CT)              # (p, q, a, bb, B, s, t)
    x = x.transpose(4, 5, 0, 2, 6, 1, 3)                # (B, s, p, a, t, q, bb)
    return x.reshape(b, 256, 128)[..., None]


# ---------------------------------------------------------------------------
# the kernel
# ---------------------------------------------------------------------------


def _lane_shift(x, sh):
    """Static lane shift with zero fill (Mosaic's dynamic rotate rejects
    non-32-bit dtypes; static concat of slices lowers cleanly)."""
    if sh == 0:
        return x
    k = x.shape[0]
    if sh > 0:
        return jnp.concatenate([x[:, sh:], jnp.zeros((k, sh), x.dtype)], axis=1)
    return jnp.concatenate([jnp.zeros((k, -sh), x.dtype), x[:, :sh]], axis=1)


def _make_masks(nb, dtype, ss=CT, emax=1):
    """0/1 row-vectors (1, nb) per (e, f) in [-emax, emax]^2 zeroing taps
    that fall outside the tile; (0,0) maps to None (no mask).  k<=5
    geometries shift at most +-1 coarse cell; k=7 reaches +-2 on conv2.

    ``ss`` is the lane stride of one coarse-freq step: 32 for the classic
    per-tile lane grid (lane = s*32 + t), 32*I for the I-way interleaved
    grid (lane = s*(32*I) + j*32 + t, j = tile-within-group) that gives the
    corner-turn DMAs full 128-lane windows.  Tile edges in t sit at every
    32 lanes and in s at every ``ss`` lanes either way — the interleave
    index j never enters the masks, and the same masks that zero
    out-of-tile taps also zero the cross-tile leakage a +-f lane shift
    would otherwise pick up from the neighbouring tile of the group."""
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, nb), 1)
    s = (lane // jnp.int32(ss)) & jnp.int32(CS - 1)
    t = lane & jnp.int32(CT - 1)
    mu = {0: None}
    mv = {0: None}
    for e in range(1, emax + 1):
        mu[-e] = (s >= e).astype(dtype)
        mu[e] = (s < CS - e).astype(dtype)
        mv[-e] = (t >= e).astype(dtype)
        mv[e] = (t < CT - e).astype(dtype)
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


def _tap(x, row0, nrows, e, f, masks, ss=CT):
    """One window tap: sublane block [row0:row0+nrows] of x, coarse-shifted
    by (e, f) with tile-edge zeroing (``ss`` = lane stride of one s step)."""
    blk = x[row0:row0 + nrows, :]
    y = _lane_shift(blk, e * ss + f)
    m = masks[(e, f)]
    return y if m is None else y * m


def _gather_q(x, slots, nrows, masks, ss=CT):
    """Assemble the K-side operand: concat of taps in slot order."""
    return jnp.concatenate(
        [_tap(x, r * nrows, nrows, e, f, masks, ss) for (r, e, f) in slots],
        axis=0,
    )


def _mm(lhs, rhs):
    return jax.lax.dot_general(
        lhs, rhs, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )


def _phase_max(z, c: int = 32):
    """relu + max over the 4 phase row-blocks: (4c, n) f32 -> (c, n)."""
    z = jax.nn.relu(z)
    return jnp.maximum(
        jnp.maximum(z[0:c], z[c:2 * c]), jnp.maximum(z[2 * c:3 * c], z[3 * c:4 * c])
    )


# largest K operand materialised as one concat; bigger layers accumulate
# over tap chunks instead (bounds VMEM: a (1024, 6-tile-block) bf16
# operand is ~24 MB).  The flagship k3 K=512 stays a single matmul —
# byte-identical to the round-2 program.
_K_CHUNK_LIMIT = 1024


def _tapsum(w_ref, taps, nrows: int, k_limit: int = _K_CHUNK_LIMIT):
    """z = W @ concat(taps), computed in column chunks when K is large:
    sum_i W[:, chunk_i] @ concat(chunk_i taps).  ``taps`` is a list of
    thunks each producing an (nrows, nb) block; chunking is free math
    (f32 accumulation either way) but bounds the live concat buffer."""
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


def _make_kernel(wts: AEKernelWeights, nb: int, dtype, ss: int = CT):
    c1, c2 = wts.c1, wts.c2
    l2_slots = _l2_slots(wts.k2)
    l3_slots = [
        (0, wts.e3 + i, wts.e3 + j)
        for i in range(wts.wz3) for j in range(wts.wz3)
    ]
    l4_all = [_l4_slots(p, q, wts.e4, wts.wz4) for p in range(2) for q in range(2)]
    l5_all = [_l5_slots(p, q, wts.k5) for p in range(2) for q in range(2)]
    l1_sets = [_l1_shift_sets(p, q, wts.k1) for p in range(2) for q in range(2)]
    emax = max(
        max(abs(e), abs(f))
        for slots in (l2_slots, l3_slots, *l4_all, *l5_all)
        for (_, e, f) in slots
    )
    emax = max(emax, *(abs(s) for es, fs in l1_sets for s in (*es, *fs)))

    def kernel(x16_ref, w1_ref, b1_ref, w2_ref, b2_ref, w3_ref, b3_ref,
               w4_ref, b4_ref, w5_ref, b5_ref, o_ref):
        masks = _make_masks(nb, dtype, ss, emax)
        x16 = x16_ref[:]

        # L1: conv1 + relu + pool, one matmul per fine parity.  The K
        # operand is the concat of FULL shifted x16 copies (single-row
        # lane-shifted slices are illegal under Mosaic); the row selection
        # lives in the host-scattered w1 (see _l1_weight).
        l1_shifts = sorted({
            (e, f) for es, fs in l1_sets for e in es for f in fs
        })
        shifted = {
            (e, f): _tap(x16, 0, 16, e, f, masks, ss) for (e, f) in l1_shifts
        }
        p1_parts = []
        for p in range(2):
            for q in range(2):
                es, fs = l1_sets[p * 2 + q]
                q1 = jnp.concatenate(
                    [shifted[(e, f)] for e in es for f in fs], axis=0
                )                                                # (|E||F|*16, nb)
                m1 = 4 * c1
                z1 = _mm(w1_ref[(p * 2 + q) * m1:(p * 2 + q + 1) * m1, :],
                         q1) + b1_ref[:]
                p1_parts.append(_phase_max(z1, c1).astype(dtype))
        p1_4 = jnp.concatenate(p1_parts, axis=0)                 # (4*C1, nb)

        # L2: conv2 + relu + pool (base grid == coarse lanes); chunked
        # accumulation when K = (k2+1)^2*C1 exceeds the VMEM-friendly limit
        z2 = _tapsum(
            w2_ref,
            [partial(_tap, p1_4, r * c1, c1, e, f, masks, ss)
             for (r, e, f) in l2_slots],
            c1,
        ) + b2_ref[:]
        p2 = _phase_max(z2, c2).astype(dtype)                    # (C2, nb)

        # L3: convT2 + relu -> 4 fine-parity planes directly
        q3 = _gather_q(p2, l3_slots, c2, masks, ss)              # (wz3^2*C2, nb)
        d4 = jax.nn.relu(_mm(w3_ref[:], q3) + b3_ref[:]).astype(dtype)

        # L4: convT1 + relu -> e16 in production order (p, q, a, b, c)
        e_parts = []
        for pi in range(4):
            q4 = _gather_q(d4, l4_all[pi], c2, masks, ss)
            z4 = jax.nn.relu(_mm(w4_ref[:], q4) + b4_ref[:]).astype(dtype)
            e_parts.append(z4)                                   # (4*C1, nb)

        # L5: out conv + sigmoid -> o16 in production order (p, q, a, b).
        # Taps index straight into the four convT1 outputs (block // 4 picks
        # the producing parity, block % 4 the phase rows) — no e16 concat
        # buffer.
        for pi in range(4):
            z5 = _tapsum(
                w5_ref,
                [partial(_tap, e_parts[blk // 4], (blk % 4) * c1, c1, e, f,
                         masks, ss)
                 for (blk, e, f) in l5_all[pi]],
                c1,
            ) + b5_ref[:]                                        # (4, nb)
            o_ref[pi * 4:(pi + 1) * 4, :] = jax.nn.sigmoid(z5).astype(
                o_ref.dtype
            )

    return kernel


def _pallas_ae(x16, wts: AEKernelWeights, block_tiles: int, interpret: bool,
               out_dtype=jnp.float32, ss=CT):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    m = x16.shape[1]
    nb = block_tiles * LANES
    kern = _make_kernel(wts, nb, x16.dtype, ss)

    def fixed(arr):
        return pl.BlockSpec(arr.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)

    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((16, m), out_dtype),
        grid=(m // nb,),
        in_specs=[
            pl.BlockSpec((16, nb), lambda i: (0, i), memory_space=pltpu.VMEM),
            fixed(wts.w1t), fixed(wts.b1),
            fixed(wts.w2t), fixed(wts.b2),
            fixed(wts.w3t), fixed(wts.b3),
            fixed(wts.w4t), fixed(wts.b4),
            fixed(wts.w5t), fixed(wts.b5),
        ],
        out_specs=pl.BlockSpec((16, nb), lambda i: (0, i), memory_space=pltpu.VMEM),
        interpret=interpret,
        # blocks >3 tiles exceed Mosaic's default 16M scoped-vmem budget
        # (the interleaved 6-tile block needs ~28M of the chip's 128M)
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024),
    )(x16, wts.w1t, wts.b1, wts.w2t, wts.b2, wts.w3t, wts.b3,
      wts.w4t, wts.b4, wts.w5t, wts.b5)


@functools.partial(jax.jit, static_argnames=("block_tiles", "interpret", "out_dtype"))
def ae_kernel_apply(wts: AEKernelWeights, tiles: jax.Array,
                    block_tiles: int = 1, interpret: bool = False,
                    out_dtype=jnp.float32) -> jax.Array:
    """(B, 256, 128, 1) tiles -> (B, 256, 128, 1) sigmoid probabilities.

    Drop-in replacement for ``ConvAutoencoder.apply`` (inference, flagship
    geometry); all five layers run in one Pallas kernel, activations never
    leave VMEM.  ``B`` must be a multiple of ``block_tiles``.
    """
    b = tiles.shape[0]
    x16 = tiles_to_x16(tiles, jnp.bfloat16)
    o16 = _pallas_ae(x16, wts, block_tiles, interpret, out_dtype)
    return o16_to_tiles(o16, b)


def enhance_interleave(wts: AEKernelWeights, k_tiles: int) -> int:
    """Corner-turn interleave the serving path runs with: parity_turn's
    default, halved for big-K geometries — k7's 2048-row conv2 and the
    manual config's 2304 overflow VMEM at the 6-tile interleave (measured:
    Mosaic compile failure on v5e); the corner turns still get >=96-lane
    windows at 3."""
    from specenh.ops.parity_turn import pick_interleave

    i_ = pick_interleave(k_tiles)
    kmax = max((wts.k2 + 1) ** 2 * wts.c1, (wts.k5 + 1) ** 2 * wts.c1)
    if kmax > 1536 and i_ > 3:
        i_ = max(j for j in (3, 2, 1) if k_tiles % j == 0)
    return i_


@functools.partial(jax.jit, static_argnames=("k_tiles", "interleave",
                                             "block_tiles", "interpret",
                                             "out_dtype"))
def ae_kernel_enhance_x16(wts: AEKernelWeights, x16: jax.Array,
                          k_tiles: int, interleave: int,
                          block_tiles: int = 0, interpret: bool = False,
                          out_dtype=jnp.float32) -> jax.Array:
    """(16, C*k*2048) parity rows (already normalized, interleave
    ``interleave``) -> (C, 256, k*128) restitched enhancement.  The back
    half of ``ae_kernel_enhance_specs`` — the fused-STFT front-end
    (ops.stft_fused) produces x16 directly, skipping the (F,T) specs."""
    from specenh.ops.parity_turn import o16_2d_to_specs

    i_ = interleave
    c = x16.shape[1] // (k_tiles * LANES)
    if block_tiles == 0:
        block_tiles = i_
    if block_tiles % i_:
        raise ValueError(f"block_tiles must be a multiple of the group size {i_}")
    o16 = _pallas_ae(x16, wts, block_tiles, interpret, out_dtype, ss=i_ * CT)
    return o16_2d_to_specs(o16, c, k_tiles, i_, interpret)


@functools.partial(jax.jit, static_argnames=("k_tiles", "block_tiles",
                                             "interpret", "out_dtype"))
def ae_kernel_enhance_specs(wts: AEKernelWeights, specs: jax.Array,
                            k_tiles: int, block_tiles: int = 0,
                            interpret: bool = False,
                            out_dtype=jnp.float32) -> jax.Array:
    """(C, 256, T) spectrograms -> (C, 256, k*128) restitched enhancement:
    the serving fast path — Pallas corner-turn in, the fused kernel, Pallas
    corner-turn out (equivalent to patch -> apply -> unpatch).

    Layouts are interleaved I tiles per group (specenh.ops.parity_turn) so
    every corner-turn DMA window is >=96 lanes; the kernel runs with lane
    stride ``ss = 32*I``.  ``block_tiles=0`` processes one group per grid
    step; explicit values must be multiples of the group size."""
    from specenh.ops.parity_turn import specs_to_x16_2d

    i_ = enhance_interleave(wts, k_tiles)
    x16 = specs_to_x16_2d(specs, k_tiles, i_, interpret)
    return ae_kernel_enhance_x16(wts, x16, k_tiles, i_, block_tiles,
                                 interpret, out_dtype)
