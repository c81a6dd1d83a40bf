"""Fused Pallas TPU TRAINING kernel for the depth-2 conv autoencoder.

Why: the XLA conv training step is HBM-bound at ~7% of bf16 peak (measured
0.59 s/epoch bf16 on the reference recipe, PERF_NOTES.md round 3) — the
same inter-layer activation traffic that motivated the inference kernel
(specenh.ops.ae_kernel), tripled by the backward pass.  This kernel runs
forward AND backward in one Pallas program: activations, relu/pool masks
and all gradient math stay in VMEM; HBM sees the input tiles, the labels,
the logits, and the (tiny) weight-gradient accumulators.

Design (shared layout with the inference kernel — parity planes on the
coarse 64x32 lane grid, window taps as (sublane block, static lane shift)
pairs):

* forward mirrors ae_kernel._make_kernel but KEEPS per-layer artifacts:
  post-pool activations (to regather K operands in the backward — cheaper
  in VMEM than keeping the gathered q operands alive), 0/1 pool-routing
  masks (phase == max AND max > 0, f32-computed then stored bf16), relu
  masks, and the f32 logits;
* backward: dz5 = (sigmoid(z5) - y) * tile_mask (UNNORMALISED — the
  1/(mask_sum * H * W) BCE factor is applied outside, keeping the kernel
  free of scalars), then per layer
      dW_l  += dz_l  @ q_l^T        (lane-contracted MXU matmul)
      db_l  += rowsum(dz_l)
      dq_l   = W_l^T @ dz_l
  with dq scattered back through the tap structure by the ADJOINT of the
  forward tap (mask, then inverse lane shift);
* weight-gradient outputs use Pallas accumulation across grid steps
  (constant index_map; zeroed at program_id 0);
* the kernel trains the SCATTERED operands; ``build_train_maps`` builds
  integer gather maps from the Flax conv params ONCE per geometry (by
  pushing global parameter ids through the existing plan builders), so
  the scattered weights are an on-device gather per step and the conv-
  kernel gradients are the scatter-add transpose — gradient identity with
  the Flax model holds by construction (each scattered entry is exactly
  one conv-kernel entry; duplicates sum).

Gradient-semantics deltas vs Flax/XLA (both measure-zero on real data,
gated by the trajectory-parity test): pool ties route gradient to EVERY
maximal phase (XLA's reduce_window picks one); relu'(0) = 0 (same as XLA).

Reference parity: replaces Keras ``autoencoder.fit``'s step
(VAE/hyperparam_scan.py:177-184) for the supported depth-2 family.
"""

from __future__ import annotations

import dataclasses
import functools
from functools import partial
from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from specenh.config import ModelConfig
from specenh.ops import ae_kernel as AK
from specenh.ops.ae_kernel import (
    CS,
    CT,
    LANES,
    _l1_shift_sets,
    _l2_slots,
    _l4_slots,
    _l5_slots,
    _lane_shift,
    _make_masks,
    _mm,
    _tap,
    supports,
    tiles_to_x16,
)

__all__ = ["TrainMaps", "build_train_maps", "gather_train_weights",
           "kernel_value_and_grad", "make_kernel_train_step",
           "kernel_train_epoch_fn", "supports"]


# ---------------------------------------------------------------------------
# host-side: parameter-id maps
# ---------------------------------------------------------------------------

_LAYERS = ["enc_conv0", "enc_conv1", "dec_deconv1", "dec_deconv0", "out_conv"]
_OPS = ["w1t", "b1", "w2t", "b2", "w3t", "b3", "w4t", "b4", "w5t", "b5"]


def _param_layout(params) -> List[Tuple[str, str, Tuple[int, ...], int]]:
    """Fixed flattening order: (layer, leaf, shape, offset)."""
    out = []
    off = 0
    for layer in _LAYERS:
        for leaf in ("kernel", "bias"):
            shape = tuple(np.asarray(params["params"][layer][leaf]).shape)
            out.append((layer, leaf, shape, off))
            off += int(np.prod(shape))
    return out


def flatten_params(params) -> jax.Array:
    """Concat of raveled leaves in the fixed layout order (jit-safe)."""
    return jnp.concatenate([
        jnp.ravel(params["params"][layer][leaf])
        for layer in _LAYERS for leaf in ("kernel", "bias")
    ])


def unflatten_grads(flat: jax.Array, layout) -> Dict:
    out: Dict[str, Dict[str, jax.Array]] = {}
    for layer, leaf, shape, off in layout:
        out.setdefault(layer, {})[leaf] = flat[off:off + int(np.prod(shape))].reshape(shape)
    return {"params": out}


@dataclasses.dataclass(frozen=True)
class TrainMaps:
    """Integer gather maps: scattered-operand entry -> flat param index
    (-1 = structurally zero).  ``shapes`` mirror AEKernelWeights operands;
    ``layout`` is the flat-param bookkeeping; meta mirrors the plan."""

    maps: Tuple[np.ndarray, ...]       # int32, one per _OPS entry
    layout: tuple
    n_params: int
    e3: int
    wz3: int
    e4: int
    wz4: int
    k1: int
    k2: int
    k5: int
    c1: int
    c2: int


@functools.lru_cache(maxsize=8)
def _build_train_maps_cached(cfg: ModelConfig) -> TrainMaps:
    # Push 1-based global parameter ids through the real builders.  float32
    # represents ids exactly below 2^24 (~16.7M; the largest reference
    # geometry has ~0.2M parameters).  The convT impulse probe copies
    # kernel entries verbatim (each (dy,dx) offset maps to exactly one
    # tap), so ids survive build_plan unchanged.
    model_shape = (1, *cfg.input_shape)
    from specenh.models.autoencoder import make_model

    real = make_model(cfg).init(
        jax.random.PRNGKey(0), np.zeros(model_shape, np.float32)
    )
    layout = _param_layout(real)
    n = sum(int(np.prod(s)) for _, _, s, _ in layout)
    assert n < 2 ** 24, "id-through-f32 trick needs < 2^24 params"
    fake = {"params": {}}
    for layer, leaf, shape, off in layout:
        ids = (np.arange(int(np.prod(shape)), dtype=np.float64) + 1 + off)
        fake["params"].setdefault(layer, {})[leaf] = jnp.asarray(
            ids.reshape(shape), jnp.float32
        )
    wts = AK.build_kernel_weights(fake, cfg, dtype=jnp.float32)
    maps = []
    for name in _OPS:
        ids = np.asarray(getattr(wts, name), np.float64)
        m = np.rint(ids).astype(np.int32) - 1  # 0 -> -1 (structural zero)
        maps.append(m)
    return TrainMaps(
        maps=tuple(maps), layout=tuple(layout), n_params=n,
        e3=wts.e3, wz3=wts.wz3, e4=wts.e4, wz4=wts.wz4,
        k1=wts.k1, k2=wts.k2, k5=wts.k5, c1=wts.c1, c2=wts.c2,
    )


def build_train_maps(cfg: ModelConfig = ModelConfig()) -> TrainMaps:
    if not supports(cfg):
        raise NotImplementedError(
            "ae_train_kernel supports the same depth-2 family as ae_kernel"
        )
    return _build_train_maps_cached(cfg)


# ---------------------------------------------------------------------------
# structured (gather-free) weight assembly
#
# Element gathers/scatters on TPU run at ~7 ns/element (measured: 0.85 ms
# for the 134k-entry operand set — 1.7 ms/step both ways, ~45% of the
# whole train step).  But the id maps tile AFFINELY: every (br, bc) tile
# of every operand is either zero or one whole kernel-tap slice
# w[dy, dx, :, :] (possibly transposed) or a bias run — so the operands
# can be assembled from STATIC slices of the param leaves (stack +
# transpose + reshape; no gather), and the grads unscattered as static
# slice sums (no scatter).  Derived from the maps, validated at build.
# ---------------------------------------------------------------------------


def _derive_one_map(m: np.ndarray, layout):
    """One operand map -> (grid_shape, tile_shape, cells) where cells is a
    list (grid-row-major) of None (zero tile) or (layer, leaf, index, kind):
    index = (dy, dx) for kernel leaves / start for bias runs; kind 'flip'
    marks a transposed slice.  Raises AssertionError when the map does not
    tile affinely.  Shared with the depth-3 trainer (ae3_train_kernel)."""
    leaf_of = []  # (layer, leaf, shape, off, end)
    for layer, leaf, shape, off in layout:
        leaf_of.append((layer, leaf, shape, off, off + int(np.prod(shape))))

    def locate(b):
        for layer, leaf, shape, off, end in leaf_of:
            if off <= b < end:
                return layer, leaf, shape, b - off
        raise AssertionError(f"id {b} outside layout")

    def tile_grid(m):
        # coarsest affine tiling (same probe as the derivation notebook)
        def affine_ok(t):
            if (t < 0).all():
                return True
            if (t < 0).any():
                return False
            b = t[0, 0]
            sr = t[1, 0] - b if t.shape[0] > 1 else 0
            sc = t[0, 1] - b if t.shape[1] > 1 else 0
            r = np.arange(t.shape[0])[:, None]
            c = np.arange(t.shape[1])[None, :]
            return bool((t == b + r * sr + c * sc).all())

        for br in (128, 64, 32, 16, 8, 4, 2, 1):
            if m.shape[0] % br:
                continue
            for bc in (512, 256, 128, 64, 32, 16, 8, 4, 2, 1):
                if m.shape[1] % bc:
                    continue
                if all(
                    affine_ok(m[i * br:(i + 1) * br, j * bc:(j + 1) * bc])
                    for i in range(m.shape[0] // br)
                    for j in range(m.shape[1] // bc)
                ):
                    return br, bc
        raise AssertionError("no affine tiling")

    m2 = m if m.ndim == 2 else m[:, None]
    br, bc = tile_grid(m2)
    gr, gc = m2.shape[0] // br, m2.shape[1] // bc
    cells = []
    for i in range(gr):
        for j in range(gc):
            t = m2[i * br:(i + 1) * br, j * bc:(j + 1) * bc]
            if (t < 0).all():
                cells.append(None)
                continue
            assert (t >= 0).all(), "mixed zero/value tile"
            b = int(t[0, 0])
            sr = int(t[1, 0] - b) if br > 1 else 0
            sc = int(t[0, 1] - b) if bc > 1 else 0
            layer, leaf, shape, rel = locate(b)
            if leaf == "bias":
                if bc == 1 and sr == 1:
                    cells.append((layer, "bias", rel, "run"))
                elif bc == 1 and sr == 0:
                    # the same bias element broadcast down the tile
                    # (out-conv's co=1 bias replicated over phases)
                    cells.append((layer, "bias", rel, "bcast"))
                else:
                    raise AssertionError((layer, br, bc, sr, sc))
            else:
                kh, kw, ci, co = shape
                dy, dx, ci0, co0 = np.unravel_index(rel, shape)
                tap = (int(dy), int(dx))
                if bc == 1 and sr == 1:
                    # consecutive run of the raveled leaf, as a column
                    cells.append((layer, "kernel", int(rel), "colrun"))
                elif br == 1 and sc == 1:
                    # consecutive run of the raveled leaf, as a row
                    cells.append((layer, "kernel", int(rel), "rowrun"))
                elif ((ci0, co0) == (0, 0) and (br, bc) == (ci, co)
                      and (sr, sc) == (co, 1)):
                    cells.append((layer, "kernel", tap, "direct"))
                elif ((ci0, co0) == (0, 0) and (br, bc) == (co, ci)
                      and (sr, sc) == (1, co)):
                    cells.append((layer, "kernel", tap, "flip"))
                else:
                    raise AssertionError(
                        f"unrecognised tile {layer} {br}x{bc} strides {sr},{sc}"
                    )
    return ((gr, gc), (br, bc), tuple(cells))


def _derive_structured(tm: TrainMaps):
    """All operands of a TrainMaps via _derive_one_map."""
    return tuple(_derive_one_map(np.asarray(m), tm.layout) for m in tm.maps)


def _structured_of(tm: TrainMaps):
    hit = _STRUCT_CACHE.get(id(tm))
    if hit is not None and hit[0] is tm:
        if hit[1] is None:
            raise AssertionError("maps do not tile affinely")
        return hit[1]
    try:
        out = _derive_structured(tm)
    except AssertionError:
        _STRUCT_CACHE[id(tm)] = (tm, None)
        raise
    _STRUCT_CACHE[id(tm)] = (tm, out)
    return out


def _structured_or_none(tm: TrainMaps):
    try:
        return _structured_of(tm)
    except AssertionError:
        return None


_STRUCT_CACHE: Dict[int, tuple] = {}


def _assemble_operand(params, prog, op_shape, dtype):
    """One operand from static leaf slices: stack tiles grid-major, then
    (gr, gc, br, bc) -> (gr*br, gc*bc)."""
    (gr, gc), (br, bc), cells = prog
    tiles = []
    zero = jnp.zeros((br, bc), jnp.float32)
    for cell in cells:
        if cell is None:
            tiles.append(zero)
            continue
        layer, leaf, index, kind = cell
        if leaf == "bias":
            bvec = params["params"][layer]["bias"]
            if kind == "run":
                v = bvec[index:index + br][:, None]
            else:  # bcast
                v = jnp.broadcast_to(bvec[index], (br, bc))
        else:
            kern = params["params"][layer]["kernel"]
            if kind == "colrun":
                v = kern.reshape(-1)[index:index + br][:, None]
            elif kind == "rowrun":
                v = kern.reshape(-1)[index:index + bc][None, :]
            else:
                dy, dx = index
                sl = kern[dy, dx]  # (ci, co)
                v = sl.T if kind == "flip" else sl
        tiles.append(v.astype(jnp.float32))
    grid = jnp.stack(tiles).reshape(gr, gc, br, bc)
    out = grid.transpose(0, 2, 1, 3).reshape(gr * br, gc * bc)
    return out.reshape(op_shape)


def gather_train_weights_structured(params, tm: TrainMaps, dtype=jnp.bfloat16):
    """gather_train_weights without gathers (static slice assembly)."""
    progs = _structured_of(tm)
    ops = [
        _assemble_operand(params, prog, np.asarray(m).shape, dtype)
        for prog, m in zip(progs, tm.maps)
    ]
    w1t, b1, w2t, b2, w3t, b3, w4t, b4, w5t, b5 = ops
    fwd = [w1t.astype(dtype), b1, w2t.astype(dtype), b2, w3t.astype(dtype),
           b3, w4t.astype(dtype), b4, w5t.astype(dtype), b5]
    bwd = [w2t.T.astype(dtype), w3t.T.astype(dtype), w4t.T.astype(dtype),
           w5t.T.astype(dtype)]
    return fwd, bwd


def unscatter_grads_structured(grads_ops, tm: TrainMaps):
    """unscatter_grads without scatters: per param leaf, the static sum of
    the operand tiles that reference it."""
    return _unscatter_structured(grads_ops, _structured_of(tm), tm.layout)


def _unscatter_structured(grads_ops, progs, layout):
    """Generic core of unscatter_grads_structured over (progs, layout)
    pairs — shared with the depth-3 trainer.  Leaves no operand tile
    references get zero grads (the caller adds its own contributions)."""
    acc: Dict[Tuple[str, str], Dict] = {}
    for prog, g in zip(progs, grads_ops):
        (gr, gc), (br, bc), cells = prog
        g2 = g.reshape(gr, br, gc, bc).transpose(0, 2, 1, 3)  # (gr, gc, br, bc)
        for n, cell in enumerate(cells):
            if cell is None:
                continue
            layer, leaf, index, kind = cell
            i, j = divmod(n, gc)
            tile = g2[i, j].astype(jnp.float32)
            d = acc.setdefault((layer, leaf), {})
            d.setdefault((index, kind) if leaf == "bias" else index, []).append(
                (tile, kind)
            )
    out: Dict[str, Dict[str, jax.Array]] = {}
    for layer, leaf, shape, off in layout:
        d = acc.get((layer, leaf), {})
        if leaf == "bias":
            g = jnp.zeros(shape, jnp.float32)
            for (start, kind), tiles in d.items():
                if kind == "run":
                    s = sum((t[:, 0] for t, _ in tiles[1:]),
                            tiles[0][0][:, 0])
                    g = g.at[start:start + s.shape[0]].add(s)
                else:  # bcast: every element fed from the same bias entry
                    s = sum(float(0.0) + t.sum() for t, _ in tiles)
                    g = g.at[start].add(s)
            out.setdefault(layer, {})["bias"] = g
        else:
            kh, kw, ci, co = shape

            def tap_grad(tiles):
                parts = [t.T if kind == "flip" else t for t, kind in tiles]
                return sum(parts[1:], parts[0])

            taps = []
            runs = []  # (rel, 1-D values) accumulated on the raveled leaf
            for key, tiles in d.items():
                for t, kind in tiles:
                    if kind == "colrun":
                        runs.append((key, t[:, 0]))
                    elif kind == "rowrun":
                        runs.append((key, t[0, :]))
            for dy in range(kh):
                row = []
                for dx in range(kw):
                    tiles = [
                        tk for tk in d.get((dy, dx), [])
                        if tk[1] in ("direct", "flip")
                    ]
                    row.append(
                        tap_grad(tiles) if tiles
                        else jnp.zeros((ci, co), jnp.float32)
                    )
                taps.append(jnp.stack(row))
            g = jnp.stack(taps)
            if runs:
                g_flat = g.reshape(-1)
                for rel, vals in runs:
                    g_flat = g_flat.at[rel:rel + vals.shape[0]].add(vals)
                g = g_flat.reshape(shape)
            out.setdefault(layer, {})["kernel"] = g
    return {"params": out}


_FUSED_CACHE: Dict[int, tuple] = {}


def _fused_maps(tm: TrainMaps):
    """One concatenated map over all 10 operands (measured: ten separate
    57k-element gathers/scatters cost ~1.4-1.5 ms each way per batch on
    v5e — fusing them into single ops cuts the dispatch+lowering count).
    Cached per TrainMaps identity (ndarray fields are unhashable)."""
    hit = _FUSED_CACHE.get(id(tm))
    if hit is not None and hit[0] is tm:
        return hit[1]
    big = np.concatenate([np.asarray(m).ravel() for m in tm.maps])
    sizes = [int(np.asarray(m).size) for m in tm.maps]
    offs = np.cumsum([0] + sizes)
    # cache NUMPY (a jnp constant created under one trace must not leak
    # into another); jnp conversion at the use site is a free constant
    out = (big.astype(np.int32), tuple(sizes), tuple(int(o) for o in offs[:-1]))
    _FUSED_CACHE[id(tm)] = (tm, out)
    return out


def gather_train_weights(params, tm: TrainMaps, dtype=jnp.bfloat16):
    """Flax params -> (fwd operands, bwd-data operands), on device, traced
    (runs every step — the scattered weights follow the optimizer).

    Routes through the structured (gather-free) static-slice assembly when
    the maps tile affinely — true for every supported geometry; measured
    0.93 -> 0.51 ms on v5e — and falls back to one fused gather over all
    operands otherwise."""
    if _structured_or_none(tm) is not None:
        return gather_train_weights_structured(params, tm, dtype)
    flat = flatten_params(params)
    big_np, sizes, offs = _fused_maps(tm)
    big = jnp.asarray(big_np)
    all_w = jnp.where(big >= 0, flat[jnp.clip(big, 0)], 0.0)
    ops = [
        jax.lax.dynamic_slice_in_dim(all_w, off, size, 0).reshape(
            np.asarray(m).shape
        )
        for m, size, off in zip(tm.maps, sizes, offs)
    ]
    w1t, b1, w2t, b2, w3t, b3, w4t, b4, w5t, b5 = ops
    fwd = [w1t.astype(dtype), b1, w2t.astype(dtype), b2, w3t.astype(dtype),
           b3, w4t.astype(dtype), b4, w5t.astype(dtype), b5]
    # backward-data operands: the transposes (W^T for dq = W^T @ dz)
    bwd = [w2t.T.astype(dtype), w3t.T.astype(dtype), w4t.T.astype(dtype),
           w5t.T.astype(dtype)]
    return fwd, bwd


def unscatter_grads(grads_ops, tm: TrainMaps):
    """Scattered-operand grads -> flat conv-param grads (duplicates sum:
    the exact transpose of the gather in gather_train_weights).  Static
    slice-sum unscatter when the maps tile affinely (1.13 -> 0.51 ms on
    v5e), else one fused scatter-add."""
    if _structured_or_none(tm) is not None:
        return unscatter_grads_structured(grads_ops, tm)
    big = jnp.asarray(_fused_maps(tm)[0])
    vals = jnp.concatenate(
        [g.astype(jnp.float32).ravel() for g in grads_ops]
    )
    flat = jnp.zeros((tm.n_params,), jnp.float32).at[jnp.clip(big, 0)].add(
        jnp.where(big >= 0, vals, 0.0)
    )
    return unflatten_grads(flat, tm.layout)


# ---------------------------------------------------------------------------
# the fused forward+backward kernel
# ---------------------------------------------------------------------------


def _mm_lane(a, b):
    """Lane-contracted matmul: (M, n) x (K, n) -> (M, K) f32 — the dW
    products (contraction dim = lanes, the big one)."""
    return jax.lax.dot_general(
        a, b, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )


def _inv_tap(g, e, f, masks, ss):
    """Adjoint of _tap's (shift then mask): mask then inverse shift."""
    m = masks[(e, f)]
    if m is not None:
        g = g * m
    return _lane_shift(g, -(e * ss + f))


def _rowsum(z):
    return jnp.sum(z, axis=1, keepdims=True)


def _make_train_kernel(tm: TrainMaps, nb: int, dtype, ss: int = CT,
                       pre3d: bool = False):
    c1, c2 = tm.c1, tm.c2
    l2s = _l2_slots(tm.k2)
    l3s = [(0, tm.e3 + i, tm.e3 + j) for i in range(tm.wz3) for j in range(tm.wz3)]
    l4_all = [_l4_slots(p, q, tm.e4, tm.wz4) for p in range(2) for q in range(2)]
    l5_all = [_l5_slots(p, q, tm.k5) for p in range(2) for q in range(2)]
    l1_sets = [_l1_shift_sets(p, q, tm.k1) for p in range(2) for q in range(2)]
    emax = max(
        max(abs(e), abs(f))
        for slots in (l2s, l3s, *l4_all, *l5_all)
        for (_, e, f) in slots
    )
    emax = max(emax, *(abs(s) for es, fs in l1_sets for s in (*es, *fs)))

    def kernel(x16_ref, y16_ref, tmask_ref,
               w1_ref, b1_ref, w2_ref, b2_ref, w3_ref, b3_ref, w4_ref,
               b4_ref, w5_ref, b5_ref, w2T_ref, w3T_ref, w4T_ref, w5T_ref,
               logits_ref, dw1_ref, db1_ref, dw2_ref, db2_ref, dw3_ref,
               db3_ref, dw4_ref, db4_ref, dw5_ref, db5_ref):
        from jax.experimental import pallas as pl

        @pl.when(pl.program_id(0) == 0)
        def _init():
            for r in (dw1_ref, db1_ref, dw2_ref, db2_ref, dw3_ref, db3_ref,
                      dw4_ref, db4_ref, dw5_ref, db5_ref):
                r[...] = jnp.zeros(r.shape, r.dtype)

        masks = _make_masks(nb, dtype, ss, emax)
        # pre3d: per-tile (B, 16, LANES) operands — one tile per grid step,
        # no 2-D corner-turn needed (the epoch engine converts the whole
        # dataset once; batches are leading-dim gathers)
        x16 = x16_ref[0] if pre3d else x16_ref[:]
        y16_all = y16_ref[0] if pre3d else y16_ref[:]
        # (1, nb) f32: 1 on real tiles, 0 on padding
        tmask = tmask_ref[0] if pre3d else tmask_ref[:]

        def q1_of(pi):
            es, fs = l1_sets[pi]
            return jnp.concatenate(
                [_tap(x16, 0, 16, e, f, masks, ss) for e in es for f in fs],
                axis=0,
            )

        # ---------- forward (keeping backward artifacts) ----------
        m1 = 4 * c1
        pm1s, p1_parts = [], []
        for pi in range(4):
            z1 = _mm(w1_ref[pi * m1:(pi + 1) * m1, :], q1_of(pi)) + b1_ref[:]
            r1 = jax.nn.relu(z1)                                 # (4c1, nb) f32
            p1 = jnp.maximum(jnp.maximum(r1[0:c1], r1[c1:2 * c1]),
                             jnp.maximum(r1[2 * c1:3 * c1], r1[3 * c1:4 * c1]))
            live = (p1 > 0).astype(jnp.float32)
            pm1s.append(jnp.concatenate(
                [(r1[a * c1:(a + 1) * c1] == p1).astype(jnp.float32) * live
                 for a in range(4)], axis=0).astype(dtype))       # (4c1, nb)
            p1_parts.append(p1.astype(dtype))
        p1_4 = jnp.concatenate(p1_parts, axis=0)                 # (4*C1, nb)

        def q2_of():
            return jnp.concatenate(
                [_tap(p1_4, r * c1, c1, e, f, masks, ss) for (r, e, f) in l2s],
                axis=0,
            )

        z2 = _mm(w2_ref[:], q2_of()) + b2_ref[:]                 # (4c2, nb)
        r2 = jax.nn.relu(z2)
        p2f = jnp.maximum(jnp.maximum(r2[0:c2], r2[c2:2 * c2]),
                          jnp.maximum(r2[2 * c2:3 * c2], r2[3 * c2:4 * c2]))
        live2 = (p2f > 0).astype(jnp.float32)
        pm2 = jnp.concatenate(
            [(r2[a * c2:(a + 1) * c2] == p2f).astype(jnp.float32) * live2
             for a in range(4)], axis=0).astype(dtype)           # (4c2, nb)
        p2 = p2f.astype(dtype)                                   # (C2, nb)

        def q3_of():
            return jnp.concatenate(
                [_tap(p2, 0, c2, e, f, masks, ss) for (_, e, f) in l3s], axis=0
            )

        z3 = _mm(w3_ref[:], q3_of()) + b3_ref[:]                 # (4c2, nb)
        m3 = (z3 > 0).astype(dtype)
        d4 = jax.nn.relu(z3).astype(dtype)

        def q4_of(pi):
            return jnp.concatenate(
                [_tap(d4, r * c2, c2, e, f, masks, ss)
                 for (r, e, f) in l4_all[pi]], axis=0
            )

        m4s, e_parts = [], []
        for pi in range(4):
            z4 = _mm(w4_ref[:], q4_of(pi)) + b4_ref[:]           # (4c1, nb)
            m4s.append((z4 > 0).astype(dtype))
            e_parts.append(jax.nn.relu(z4).astype(dtype))

        def q5_of(pi):
            return jnp.concatenate(
                [_tap(e_parts[blk // 4], (blk % 4) * c1, c1, e, f, masks, ss)
                 for (blk, e, f) in l5_all[pi]], axis=0
            )

        z5s = []
        for pi in range(4):
            z5 = _mm(w5_ref[:], q5_of(pi)) + b5_ref[:]           # (4, nb)
            z5s.append(z5)
            if pre3d:
                logits_ref[0, pi * 4:(pi + 1) * 4, :] = z5.astype(
                    logits_ref.dtype
                )
            else:
                logits_ref[pi * 4:(pi + 1) * 4, :] = z5.astype(logits_ref.dtype)

        # ---------- backward ----------
        # Static accumulation: contributions are gathered into per-(block,
        # phase) lists then summed + concatenated — no dynamic-update-slice
        # on values (a Mosaic trap).
        def block_sum(contrib, n_blocks, rows):
            parts = []
            for b_ in range(n_blocks):
                lst = contrib.get(b_, [])
                parts.append(sum(lst[1:], lst[0]) if lst
                             else jnp.zeros((rows, nb), jnp.float32))
            return jnp.concatenate(parts, axis=0) if n_blocks > 1 else parts[0]

        e_contrib = {pi: {} for pi in range(4)}  # pi -> phase blk -> [g]
        dw5 = db5 = None
        for pi in range(4):
            y = y16_all[pi * 4:(pi + 1) * 4, :].astype(jnp.float32)
            dz5 = (jax.nn.sigmoid(z5s[pi]) - y) * tmask          # (4, nb)
            q5 = q5_of(pi)
            d5p = _mm_lane(dz5.astype(dtype), q5)
            dw5 = d5p if dw5 is None else dw5 + d5p
            db5 = _rowsum(dz5) if db5 is None else db5 + _rowsum(dz5)
            dq5 = _mm(w5T_ref[:], dz5.astype(dtype))             # (K5, nb)
            for j, (blk, e, f) in enumerate(l5_all[pi]):
                g = _inv_tap(dq5[j * c1:(j + 1) * c1], e, f, masks, ss)
                e_contrib[blk // 4].setdefault(blk % 4, []).append(g)
        dw5_ref[...] += dw5
        db5_ref[...] += db5

        d4_contrib = {}
        dw4 = db4 = None
        for pi in range(4):
            de = block_sum(e_contrib[pi], 4, c1)                  # (4c1, nb)
            dz4 = de * m4s[pi]
            q4 = q4_of(pi)
            d4p = _mm_lane(dz4.astype(dtype), q4)
            dw4 = d4p if dw4 is None else dw4 + d4p
            db4 = _rowsum(dz4) if db4 is None else db4 + _rowsum(dz4)
            dq4 = _mm(w4T_ref[:], dz4.astype(dtype))              # (K4, nb)
            for j, (blk, e, f) in enumerate(l4_all[pi]):
                g = _inv_tap(dq4[j * c2:(j + 1) * c2], e, f, masks, ss)
                d4_contrib.setdefault(blk, []).append(g)
        dw4_ref[...] += dw4
        db4_ref[...] += db4

        dz3 = block_sum(d4_contrib, 4, c2) * m3                   # (4c2, nb)
        dw3_ref[...] += _mm_lane(dz3.astype(dtype), q3_of())
        db3_ref[...] += _rowsum(dz3)
        dq3 = _mm(w3T_ref[:], dz3.astype(dtype))                  # (K3, nb)
        dp2 = None
        for j, (_, e, f) in enumerate(l3s):
            g = _inv_tap(dq3[j * c2:(j + 1) * c2], e, f, masks, ss)
            dp2 = g if dp2 is None else dp2 + g                   # (C2, nb)

        # L2 pool backward: route dp2 to every maximal live phase
        dz2 = jnp.concatenate([dp2] * 4, axis=0) * pm2            # (4c2, nb)
        dw2_ref[...] += _mm_lane(dz2.astype(dtype), q2_of())
        db2_ref[...] += _rowsum(dz2)
        dq2 = _mm(w2T_ref[:], dz2.astype(dtype))                  # (K2, nb)
        p1_contrib = {}
        for j, (r, e, f) in enumerate(l2s):
            g = _inv_tap(dq2[j * c1:(j + 1) * c1], e, f, masks, ss)
            p1_contrib.setdefault(r, []).append(g)
        dp1_4 = block_sum(p1_contrib, 4, c1)                      # (4c1, nb)

        dw1_parts, db1 = [], None
        for pi in range(4):
            dp1 = dp1_4[pi * c1:(pi + 1) * c1]
            dz1 = jnp.concatenate([dp1] * 4, axis=0) * pm1s[pi]   # (4c1, nb)
            dw1_parts.append(_mm_lane(dz1.astype(dtype), q1_of(pi)))
            db1 = _rowsum(dz1) if db1 is None else db1 + _rowsum(dz1)
        dw1_ref[...] += jnp.concatenate(dw1_parts, axis=0)
        db1_ref[...] += db1

    return kernel


def _pallas_train(x16, y16, tmask, fwd, bwd, tm: TrainMaps,
                  block_tiles: int, interpret: bool, dtype):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    m = x16.shape[1]
    nb = block_tiles * LANES
    kern = _make_train_kernel(tm, nb, dtype)

    def fixed_in(arr):
        return pl.BlockSpec(arr.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)

    def acc_spec(shape):
        # constant index_map: the SAME VMEM block revisits every grid step
        # -> cross-step accumulation (zeroed at program_id 0)
        return pl.BlockSpec(shape, lambda i: tuple(0 for _ in shape),
                            memory_space=pltpu.VMEM)

    grad_shapes = [np.asarray(tm.maps[i]).shape for i in range(10)]
    out_shape = (
        jax.ShapeDtypeStruct((16, m), jnp.float32),  # logits
        *[jax.ShapeDtypeStruct(s, jnp.float32) for s in grad_shapes],
    )
    out_specs = (
        pl.BlockSpec((16, nb), lambda i: (0, i), memory_space=pltpu.VMEM),
        *[acc_spec(s) for s in grad_shapes],
    )
    return pl.pallas_call(
        kern,
        out_shape=out_shape,
        grid=(m // nb,),
        in_specs=[
            pl.BlockSpec((16, nb), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((16, nb), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nb), lambda i: (0, i), memory_space=pltpu.VMEM),
            *[fixed_in(w) for w in fwd],
            *[fixed_in(w) for w in bwd],
        ],
        out_specs=out_specs,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
    )(x16, y16, tmask, *fwd, *bwd)


# ---------------------------------------------------------------------------
# XLA wrappers: layout plumbing, loss, the step
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=1)
def _prod_perm():
    """Row permutation x16 (xi*4+phi) order -> o16 production (p,q,a,b)."""
    perm = np.zeros(16, np.int64)
    for phi in range(4):
        for xi in range(4):
            prod = 8 * (phi >> 1) + 4 * (xi >> 1) + 2 * (phi & 1) + (xi & 1)
            perm[prod] = xi * 4 + phi
    return perm


def tiles_to_y16(tiles: jax.Array, dtype=jnp.bfloat16) -> jax.Array:
    """Labels (B,256,128,1) -> (16, B*2048) rows in PRODUCTION order —
    aligned with the kernel's z5 output rows."""
    return tiles_to_x16(tiles, dtype)[jnp.asarray(_prod_perm())]


def tiles_to_x16_3d(tiles: jax.Array, dtype=jnp.bfloat16) -> jax.Array:
    """(B,256,128,1) -> (B, 16, 2048) per-tile parity form: the pre-layout
    training operand — batches are leading-dim gathers, no per-batch
    corner-turn (rows xi*4+phi, lanes s*32+t, as tiles_to_x16)."""
    b = tiles.shape[0]
    x = jnp.squeeze(tiles, -1).astype(dtype)
    x = x.reshape(b, CS, 4, CT, 4)
    return x.transpose(0, 4, 2, 1, 3).reshape(b, 16, LANES)


def tiles_to_y16_3d(tiles: jax.Array, dtype=jnp.bfloat16) -> jax.Array:
    """(B,256,128,1) labels -> (B, 16, 2048), rows in PRODUCTION order."""
    return tiles_to_x16_3d(tiles, dtype)[:, jnp.asarray(_prod_perm()), :]


def _pallas_train_pre(x3, y3, mlanes, fwd, bwd, tm: TrainMaps,
                      interpret: bool, dtype):
    """Pre-layout variant: (B, 16, LANES) operands, one tile per grid
    step, logits out in the same 3-D form."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b = x3.shape[0]
    kern = _make_train_kernel(tm, LANES, dtype, pre3d=True)

    def fixed_in(arr):
        return pl.BlockSpec(arr.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)

    def acc_spec(shape):
        return pl.BlockSpec(shape, lambda i: tuple(0 for _ in shape),
                            memory_space=pltpu.VMEM)

    grad_shapes = [np.asarray(tm.maps[i]).shape for i in range(10)]
    return pl.pallas_call(
        kern,
        out_shape=(
            jax.ShapeDtypeStruct((b, 16, LANES), jnp.float32),
            *[jax.ShapeDtypeStruct(s, jnp.float32) for s in grad_shapes],
        ),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, 16, LANES), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 16, LANES), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            # (B, 1, LANES): a (1, LANES) trailing block is legal (== the
            # overall trailing dims); a 2-D (1, LANES) block is not
            pl.BlockSpec((1, 1, LANES), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            *[fixed_in(w) for w in fwd],
            *[fixed_in(w) for w in bwd],
        ],
        out_specs=(
            pl.BlockSpec((1, 16, LANES), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            *[acc_spec(s) for s in grad_shapes],
        ),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
    )(x3, y3, mlanes, *fwd, *bwd)


def masked_bce_from_logits3d(logits3, y3, mask):
    """Mean BCE over real tiles from (B, 16, LANES) logits/labels."""
    z = logits3
    y = y3.astype(jnp.float32)
    per = jnp.maximum(z, 0) - z * y + jnp.log1p(jnp.exp(-jnp.abs(z)))
    w = mask.astype(jnp.float32)[:, None, None]
    return jnp.sum(per * w) / (jnp.sum(w) * 16.0 * LANES)


def _tile_mask_lanes(mask: jax.Array) -> jax.Array:
    """(B,) 0/1 tile mask -> (1, B*2048) lane mask."""
    return jnp.repeat(mask.astype(jnp.float32), LANES)[None, :]


def masked_bce_from_logits16(logits16, y16, lane_mask):
    """Mean BCE over real tiles from (16, m) production-order logits."""
    z, y = logits16, y16.astype(jnp.float32)
    per = jnp.maximum(z, 0) - z * y + jnp.log1p(jnp.exp(-jnp.abs(z)))
    w = lane_mask  # (1, m)
    return jnp.sum(per * w) / (jnp.sum(w) * 16.0)


def kernel_loss_grad_sums(params, x, y, mask, tm: TrainMaps,
                          block_tiles: int = 1, interpret: bool = False,
                          dtype=jnp.bfloat16):
    """UNNORMALIZED (bce_sum, mask_sum, grad_sums) from the fused kernel —
    the data-parallel building block: ``lax.psum`` all three over the mesh
    axis, then apply kernel_value_and_grad's normalization AFTER the
    collective, so the sharded step equals the single-device step on the
    unsharded batch even when one device's shard is all padding (a local
    mean would be 0/0 there)."""
    x16 = tiles_to_x16(x, dtype)
    y16 = tiles_to_y16(y, dtype)
    lm = _tile_mask_lanes(mask)
    fwd, bwd = gather_train_weights(params, tm, dtype)
    logits16, *gops = _pallas_train(
        x16, y16, lm, fwd, bwd, tm, block_tiles, interpret, dtype
    )
    z, yf = logits16, y16.astype(jnp.float32)
    per = jnp.maximum(z, 0) - z * yf + jnp.log1p(jnp.exp(-jnp.abs(z)))
    return jnp.sum(per * lm), jnp.sum(mask), unscatter_grads(gops, tm)


def kernel_value_and_grad(params, x, y, mask, tm: TrainMaps,
                          block_tiles: int = 1, interpret: bool = False,
                          dtype=jnp.bfloat16):
    """(loss, conv-param grads) from the fused kernel — the
    jax.value_and_grad equivalent on the Pallas path (traceable)."""
    bce_sum, msum, gsums = kernel_loss_grad_sums(
        params, x, y, mask, tm, block_tiles, interpret, dtype
    )
    denom = msum * float(np.prod(x.shape[1:]))  # == msum * LANES * 16
    grads = jax.tree_util.tree_map(lambda g: g / denom, gsums)
    return bce_sum / denom, grads


def make_kernel_train_step(cfg: ModelConfig, tx, block_tiles: int = 1,
                           interpret: bool = False, dtype=jnp.bfloat16):
    """Returns step(state, x_tiles, y_tiles, mask) -> (state, loss): the
    Pallas fused forward+backward with the optax update in XLA.  Drop-in
    for train.train_step on supported geometries."""
    tm = build_train_maps(cfg)

    @jax.jit
    def step(state, x, y, mask):
        loss, grads = kernel_value_and_grad(
            state.params, x, y, mask, tm, block_tiles, interpret, dtype
        )
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return state.replace(
            params=params, opt_state=opt_state, step=state.step + 1
        ), loss

    return step


def kernel_train_epoch_fn(cfg: ModelConfig, tx, block_tiles: int = 1,
                          interpret: bool = False, dtype=jnp.bfloat16,
                          pre_layout: bool = False):
    """Scanned whole-epoch program on the fused train kernel — the
    train.train_epoch equivalent (one dispatch per epoch).

    ``pre_layout=True`` corner-turns the whole dataset into the per-tile
    (B, 16, 2048) parity form once per epoch and feeds the kernel by
    leading-dim gathers.  Measured on v5e: 0.323 vs 0.317 s/epoch for the
    default per-batch-conversion form — XLA already overlaps the layout
    conversions with the kernel, so the default stays False (kept for
    layouts where the dataset arrives pre-turned)."""
    tm = build_train_maps(cfg)
    denom_scale = float(np.prod(cfg.input_shape))

    @jax.jit
    def epoch(state, x, y, batch_idx, batch_mask):
        if pre_layout:
            x3 = tiles_to_x16_3d(x, dtype)
            y3 = tiles_to_y16_3d(y, dtype)

            def body(st, args):
                idx, m = args
                xb, yb = x3[idx], y3[idx]
                ml = jnp.broadcast_to(
                    m.astype(jnp.float32)[:, None, None],
                    (m.shape[0], 1, LANES),
                )
                fwd, bwd = gather_train_weights(st.params, tm, dtype)
                logits3, *gops = _pallas_train_pre(
                    xb, yb, ml, fwd, bwd, tm, interpret, dtype
                )
                denom = jnp.sum(m) * denom_scale
                grads = jax.tree_util.tree_map(
                    lambda g: g / denom, unscatter_grads(gops, tm)
                )
                loss = masked_bce_from_logits3d(logits3, yb, m)
                updates, opt_state = tx.update(grads, st.opt_state, st.params)
                params = optax.apply_updates(st.params, updates)
                return st.replace(
                    params=params, opt_state=opt_state, step=st.step + 1
                ), loss

            return jax.lax.scan(body, state, (batch_idx, batch_mask))

        def body(st, args):
            idx, m = args
            loss, grads = kernel_value_and_grad(
                st.params, x[idx], y[idx], m, tm, block_tiles, interpret, dtype
            )
            updates, opt_state = tx.update(grads, st.opt_state, st.params)
            params = optax.apply_updates(st.params, updates)
            return st.replace(
                params=params, opt_state=opt_state, step=st.step + 1
            ), loss

        return jax.lax.scan(body, state, (batch_idx, batch_mask))

    return epoch
