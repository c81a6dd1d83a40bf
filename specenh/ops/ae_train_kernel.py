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


def gather_train_weights(params, tm: TrainMaps, dtype=jnp.bfloat16):
    """Flax params -> (fwd operands, bwd-data operands), on device, traced
    (runs every step — the scattered weights follow the optimizer)."""
    flat = flatten_params(params)
    ops = []
    for m in tm.maps:
        mj = jnp.asarray(m)
        w = jnp.where(mj >= 0, flat[jnp.clip(mj, 0)], 0.0)
        ops.append(w)
    w1t, b1, w2t, b2, w3t, b3, w4t, b4, w5t, b5 = ops
    fwd = [w1t.astype(dtype), b1, w2t.astype(dtype), b2, w3t.astype(dtype),
           b3, w4t.astype(dtype), b4, w5t.astype(dtype), b5]
    # backward-data operands: the transposes (W^T for dq = W^T @ dz)
    bwd = [w2t.T.astype(dtype), w3t.T.astype(dtype), w4t.T.astype(dtype),
           w5t.T.astype(dtype)]
    return fwd, bwd


def unscatter_grads(grads_ops, tm: TrainMaps):
    """Scattered-operand grads -> flat conv-param grads (duplicates sum:
    the exact transpose of the gather in gather_train_weights)."""
    flat = jnp.zeros((tm.n_params,), jnp.float32)
    for g, m in zip(grads_ops, tm.maps):
        mj = jnp.asarray(m).ravel()
        valid = mj >= 0
        flat = flat.at[jnp.clip(mj, 0)].add(
            jnp.where(valid, g.astype(jnp.float32).ravel(), 0.0)
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


def _make_train_kernel(tm: TrainMaps, nb: int, dtype, ss: int = CT):
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
        x16 = x16_ref[:]
        tmask = tmask_ref[:]  # (1, nb) f32: 1 on real tiles, 0 on padding

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
            y = y16_ref[pi * 4:(pi + 1) * 4, :].astype(jnp.float32)
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


def _tile_mask_lanes(mask: jax.Array) -> jax.Array:
    """(B,) 0/1 tile mask -> (1, B*2048) lane mask."""
    return jnp.repeat(mask.astype(jnp.float32), LANES)[None, :]


def masked_bce_from_logits16(logits16, y16, lane_mask):
    """Mean BCE over real tiles from (16, m) production-order logits."""
    z, y = logits16, y16.astype(jnp.float32)
    per = jnp.maximum(z, 0) - z * y + jnp.log1p(jnp.exp(-jnp.abs(z)))
    w = lane_mask  # (1, m)
    return jnp.sum(per * w) / (jnp.sum(w) * 16.0)


def kernel_value_and_grad(params, x, y, mask, tm: TrainMaps,
                          block_tiles: int = 1, interpret: bool = False,
                          dtype=jnp.bfloat16):
    """(loss, conv-param grads) from the fused kernel — the
    jax.value_and_grad equivalent on the Pallas path (traceable)."""
    x16 = tiles_to_x16(x, dtype)
    y16 = tiles_to_y16(y, dtype)
    lm = _tile_mask_lanes(mask)
    fwd, bwd = gather_train_weights(params, tm, dtype)
    logits16, *gops = _pallas_train(
        x16, y16, lm, fwd, bwd, tm, block_tiles, interpret, dtype
    )
    denom = jnp.sum(mask) * float(np.prod(x.shape[1:]))
    grads = jax.tree_util.tree_map(
        lambda g: g / denom, unscatter_grads(gops, tm)
    )
    loss = masked_bce_from_logits16(logits16, y16, lm)
    return loss, grads


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
                          interpret: bool = False, dtype=jnp.bfloat16):
    """Scanned whole-epoch program on the fused train kernel — the
    train.train_epoch equivalent (one dispatch per epoch)."""
    tm = build_train_maps(cfg)

    @jax.jit
    def epoch(state, x, y, batch_idx, batch_mask):
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
