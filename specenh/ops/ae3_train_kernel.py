"""Fused Pallas TPU TRAINING kernel for the DEPTH-3 conv autoencoder.

Why: the deep3 preset (VAE/manual_scan_3layers.py:185-201 — filters
(16, 32, 64), all kernels (5, 5)) trains through the stock XLA conv path,
which is HBM-bound exactly like the depth-2 step was before
specenh.ops.ae_train_kernel (PERF_NOTES.md round 3).  This kernel runs
all seven layers' forward AND backward in one Pallas program on the
depth-3 parity-plane layout of specenh.ops.ae3_kernel: activations,
relu/pool masks and all gradient math stay in VMEM; HBM sees the input
tiles, the labels, the logits, and the (tiny) weight-grad accumulators.

Design (same structure as the depth-2 trainer, one level deeper):

* forward mirrors ae3_kernel._make_kernel3 but KEEPS per-layer artifacts:
  post-pool activations (K operands are REGATHERED in the backward —
  cheaper in VMEM than keeping the q buffers alive), 0/1 pool-routing
  masks per encoder level, relu masks per decoder level, and f32 logits;
* backward: dz_out = (sigmoid(z) - y) * tile_mask (UNNORMALISED; the
  1/(mask_sum * H * W) BCE factor is applied outside), then per layer
      dW_l += dz_l @ q_l^T        (lane-contracted MXU matmul)
      db_l += rowsum(dz_l)
      dq_l  = W_l^T @ dz_l
  with dq scattered back through the tap structure by the ADJOINT of the
  forward tap (mask, then inverse lane shift); the dec1 parity-major
  concat re-order is inverted when routing dec0's contributions;
* weight-grad outputs use Pallas accumulation across grid steps
  (constant index_map; zeroed at program_id 0);
* the kernel trains the SCATTERED operands: ``build_train_maps3`` pushes
  global parameter ids through ae3_kernel.build_kernel3_weights once per
  geometry.  All operands except w0t assemble from static leaf slices
  (ae_train_kernel's affine-tiling machinery); w0t — the first conv's
  row-selection-folded lhs, whose (c1, 1) column runs would need ~37k
  slice cells — assembles instead by a ONE-HOT TAP MATMUL: a constant
  0/1 tensor M (blocks, K, k^2) with w0t = einsum(M, kernel), and the
  gradient is the einsum transpose.  Exact (each output entry is one
  copied kernel entry).

Gradient-semantics deltas vs Flax/XLA (both measure-zero on real data,
gated by the trajectory-parity tests): pool ties route gradient to EVERY
maximal phase; relu'(0) = 0 (same as XLA).

Reference parity: replaces Keras ``autoencoder.fit`` for the depth-3
family (VAE/manual_scan_3layers.py:203-214).
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
from specenh.ops import ae3_kernel as AK3
from specenh.ops.ae3_kernel import (
    CS3,
    CT3,
    LANES3,
    _dec_slots,
    _enc0_shift_sets,
    _enc_slots,
    _make_masks3,
    _mm,
    _out_slots,
    _tap,
    supports3,
    tiles_to_x64,
)
from specenh.ops.ae_train_kernel import (
    _derive_one_map,
    _fused_maps,
    _inv_tap,
    _mm_lane,
    _rowsum,
    _unscatter_structured,
    unflatten_grads,
)

__all__ = ["TrainMaps3", "build_train_maps3", "gather_train_weights3",
           "unscatter_grads3", "kernel_value_and_grad3",
           "make_kernel_train_step3", "kernel_train_epoch_fn3", "supports3"]

_HI = jax.lax.Precision.HIGHEST

# fixed flattening order of the depth-3 model's param leaves
_LAYERS3 = ["enc_conv0", "enc_conv1", "enc_conv2", "dec_deconv2",
            "dec_deconv1", "dec_deconv0", "out_conv"]
_OPS3 = ["w0t", "b0", "w1t", "b1", "w2t", "b2", "wd2t", "bd2",
         "wd1t", "bd1", "wd0t", "bd0", "wot", "bo"]


# ---------------------------------------------------------------------------
# host-side: parameter-id maps
# ---------------------------------------------------------------------------


def _param_layout3(params) -> List[Tuple[str, str, Tuple[int, ...], int]]:
    out = []
    off = 0
    for layer in _LAYERS3:
        for leaf in ("kernel", "bias"):
            shape = tuple(np.asarray(params["params"][layer][leaf]).shape)
            out.append((layer, leaf, shape, off))
            off += int(np.prod(shape))
    return out


def flatten_params3(params) -> jax.Array:
    return jnp.concatenate([
        jnp.ravel(params["params"][layer][leaf])
        for layer in _LAYERS3 for leaf in ("kernel", "bias")
    ])


@dataclasses.dataclass(frozen=True)
class TrainMaps3:
    """Integer gather maps: scattered-operand entry -> flat param index
    (-1 = structurally zero), one per _OPS3 entry, + plan metadata."""

    maps: Tuple[np.ndarray, ...]
    layout: tuple
    n_params: int
    e_d2: int
    wz_d2: int
    e_d1: int
    wz_d1: int
    e_d0: int
    wz_d0: int
    k0: int
    k1: int
    k2: int
    ko: int
    c1: int
    c2: int
    c3: int


@functools.lru_cache(maxsize=4)
def _build_train_maps3_cached(cfg: ModelConfig) -> TrainMaps3:
    # Push 1-based global parameter ids through the real weight builder —
    # float32 holds ids exactly below 2^24 (deep3 has ~231k parameters) and
    # the convT impulse probe copies entries verbatim (Precision.HIGHEST,
    # fused_ae._convt_response).
    from specenh.models.autoencoder import make_model

    real = make_model(cfg).init(
        jax.random.PRNGKey(0), np.zeros((1, *cfg.input_shape), np.float32)
    )
    layout = _param_layout3(real)
    n = sum(int(np.prod(s)) for _, _, s, _ in layout)
    assert n < 2 ** 24, "id-through-f32 trick needs < 2^24 params"
    fake = {"params": {}}
    for layer, leaf, shape, off in layout:
        ids = np.arange(int(np.prod(shape)), dtype=np.float64) + 1 + off
        fake["params"].setdefault(layer, {})[leaf] = jnp.asarray(
            ids.reshape(shape), jnp.float32
        )
    wts = AK3.build_kernel3_weights(fake, cfg, dtype=jnp.float32)
    maps = []
    for name in _OPS3:
        ids = np.asarray(getattr(wts, name), np.float64)
        maps.append(np.rint(ids).astype(np.int32) - 1)  # 0 -> -1 (zero)
    return TrainMaps3(
        maps=tuple(maps), layout=tuple(layout), n_params=n,
        e_d2=wts.e_d2, wz_d2=wts.wz_d2, e_d1=wts.e_d1, wz_d1=wts.wz_d1,
        e_d0=wts.e_d0, wz_d0=wts.wz_d0,
        k0=wts.k0, k1=wts.k1, k2=wts.k2, ko=wts.ko,
        c1=wts.c1, c2=wts.c2, c3=wts.c3,
    )


def build_train_maps3(cfg: ModelConfig) -> TrainMaps3:
    if not supports3(cfg):
        raise NotImplementedError(
            "ae3_train_kernel supports the same depth-3 family as ae3_kernel"
        )
    return _build_train_maps3_cached(cfg)


# ---------------------------------------------------------------------------
# operand assembly: structured slices for everything except w0t, which is a
# one-hot tap matmul (its (c1, 1) column runs would need ~37k slice cells)
# ---------------------------------------------------------------------------

_STRUCT3_CACHE: Dict[int, tuple] = {}


def _w0_struct(tm: TrainMaps3):
    """(one-hot M (blocks, Kmax, k0^2) float32, (k0, c1, n_blocks)) derived
    from the w0t id map; every live column must be one c1-run of
    enc_conv0.kernel (asserted)."""
    off0 = shape0 = None
    for layer, leaf, shape, off in tm.layout:
        if layer == "enc_conv0" and leaf == "kernel":
            shape0, off0 = shape, off
    k, _, ci, c1 = shape0
    assert ci == 1, "first conv must be single-channel input"
    m = np.asarray(tm.maps[0])
    nbb, kmax = m.shape[0] // c1, m.shape[1]
    m3 = m.reshape(nbb, c1, kmax).astype(np.int64)
    live = m3[:, 0, :] >= 0
    rel = m3 - off0
    tap = np.where(live, rel[:, 0, :] // c1, -1)
    want = tap[:, None, :] * c1 + np.arange(c1)[None, :, None]
    ok = np.where(live[:, None, :], rel == want, m3 < 0)
    assert ok.all(), "w0t map is not c1-run structured"
    onehot = (tap[..., None] == np.arange(k * k)[None, None, :]).astype(
        np.float32
    )
    return onehot, (k, c1, nbb)


def _struct3_of(tm: TrainMaps3):
    """(w0 one-hot info, progs[1:]) or None when derivation fails (then
    the fused-gather fallback runs)."""
    hit = _STRUCT3_CACHE.get(id(tm))
    if hit is not None and hit[0] is tm:
        return hit[1]
    try:
        w0 = _w0_struct(tm)
        progs = tuple(
            _derive_one_map(np.asarray(m), tm.layout) for m in tm.maps[1:]
        )
        out = (w0, progs)
    except AssertionError:
        out = None
    _STRUCT3_CACHE[id(tm)] = (tm, out)
    return out


def _assemble_w0(params, w0info) -> jax.Array:
    onehot_np, (k, c1, nbb) = w0info
    w2d = params["params"]["enc_conv0"]["kernel"].reshape(k * k, c1).astype(
        jnp.float32
    )
    out = jnp.einsum("btk,kc->bct", jnp.asarray(onehot_np), w2d,
                     precision=_HI)
    return out.reshape(nbb * c1, onehot_np.shape[1])


def _w0_grad(dw0: jax.Array, w0info) -> jax.Array:
    onehot_np, (k, c1, nbb) = w0info
    g = dw0.reshape(nbb, c1, onehot_np.shape[1]).astype(jnp.float32)
    dw2d = jnp.einsum("bct,btk->kc", g, jnp.asarray(onehot_np),
                      precision=_HI)
    return dw2d.reshape(k, k, 1, c1)


def gather_train_weights3(params, tm: TrainMaps3, dtype=jnp.bfloat16):
    """Flax params -> (14 fwd operands, 6 backward-data transposes), traced
    (runs every step — the scattered weights follow the optimizer)."""
    from specenh.ops.ae_train_kernel import _assemble_operand

    st = _struct3_of(tm)
    if st is not None:
        w0info, progs = st
        ops = [_assemble_w0(params, w0info)]
        ops += [
            _assemble_operand(params, prog, np.asarray(m).shape, dtype)
            for prog, m in zip(progs, tm.maps[1:])
        ]
    else:  # fused gather fallback (correct for any supported map)
        flat = flatten_params3(params)
        big_np, sizes, offs = _fused_maps(tm)
        big = jnp.asarray(big_np)
        all_w = jnp.where(big >= 0, flat[jnp.clip(big, 0)], 0.0)
        ops = [
            jax.lax.dynamic_slice_in_dim(all_w, off, size, 0).reshape(
                np.asarray(m).shape
            )
            for m, size, off in zip(tm.maps, sizes, offs)
        ]
    (w0t, b0, w1t, b1, w2t, b2, wd2t, bd2, wd1t, bd1, wd0t, bd0,
     wot, bo) = ops
    fwd = [w0t.astype(dtype), b0, w1t.astype(dtype), b1,
           w2t.astype(dtype), b2, wd2t.astype(dtype), bd2,
           wd1t.astype(dtype), bd1, wd0t.astype(dtype), bd0,
           wot.astype(dtype), bo]
    bwd = [w1t.T.astype(dtype), w2t.T.astype(dtype), wd2t.T.astype(dtype),
           wd1t.T.astype(dtype), wd0t.T.astype(dtype), wot.T.astype(dtype)]
    return fwd, bwd


def unscatter_grads3(grads_ops, tm: TrainMaps3):
    """Scattered-operand grads -> conv-param grads (duplicates sum: the
    exact transpose of gather_train_weights3)."""
    st = _struct3_of(tm)
    if st is None:
        big = jnp.asarray(_fused_maps(tm)[0])
        vals = jnp.concatenate(
            [g.astype(jnp.float32).ravel() for g in grads_ops]
        )
        flat = jnp.zeros((tm.n_params,), jnp.float32).at[
            jnp.clip(big, 0)
        ].add(jnp.where(big >= 0, vals, 0.0))
        return unflatten_grads(flat, tm.layout)
    w0info, progs = st
    out = _unscatter_structured(grads_ops[1:], progs, tm.layout)
    out["params"]["enc_conv0"]["kernel"] = (
        out["params"]["enc_conv0"]["kernel"] + _w0_grad(grads_ops[0], w0info)
    )
    return out


# ---------------------------------------------------------------------------
# the fused forward+backward kernel
# ---------------------------------------------------------------------------

_K_CHUNK_LIMIT = 1024


def _chunk_ranges(n_taps: int, nrows: int, k_limit: int = _K_CHUNK_LIMIT):
    """(start, length) chunks bounding each VMEM concat to ~k_limit rows."""
    k_total = n_taps * nrows
    n_chunks = max(1, -(-k_total // k_limit))
    step = -(-n_taps // n_chunks)
    return [(i, min(step, n_taps - i)) for i in range(0, n_taps, step)]


def _fwd_tapsum(w_ref, taps, nrows):
    z = None
    for i, ln in _chunk_ranges(len(taps), nrows):
        q = jnp.concatenate([taps[j]() for j in range(i, i + ln)], axis=0)
        part = _mm(w_ref[:, i * nrows:(i + ln) * nrows], q)
        z = part if z is None else z + part
    return z


def _dw_accum(dw_ref, pairs, nrows):
    """dw_ref[:, chunk] += sum over (dz, taps) pairs of dz @ q_chunk^T —
    shared-weight layers (the 4/16 parity gathers) accumulate in VMEM
    before the single ref update per chunk."""
    n = len(pairs[0][1])
    for i, ln in _chunk_ranges(n, nrows):
        acc = None
        for dz, taps in pairs:
            q = jnp.concatenate([taps[j]() for j in range(i, i + ln)], axis=0)
            p = _mm_lane(dz, q)
            acc = p if acc is None else acc + p
        dw_ref[:, i * nrows:(i + ln) * nrows] += acc


def _block_sum(contrib: dict, n_blocks: int, rows: int, nb: int):
    parts = []
    for b_ in range(n_blocks):
        lst = contrib.get(b_, [])
        parts.append(sum(lst[1:], lst[0]) if lst
                     else jnp.zeros((rows, nb), jnp.float32))
    return jnp.concatenate(parts, axis=0) if n_blocks > 1 else parts[0]


def _make_train_kernel3(tm: TrainMaps3, nb: int, dtype, ss: int = CT3):
    c1, c2, c3 = tm.c1, tm.c2, tm.c3
    enc0_sets = [_enc0_shift_sets(p, q, tm.k0)
                 for p in range(4) for q in range(4)]
    enc1_all = [_enc_slots(u, v, tm.k1, 4) for u in range(2) for v in range(2)]
    enc2_slots = _enc_slots(0, 0, tm.k2, 2)
    d2_slots = _dec_slots(0, 0, tm.e_d2, tm.wz_d2, 1)
    d1_all = [_dec_slots(w, x, tm.e_d1, tm.wz_d1, 2)
              for w in range(2) for x in range(2)]
    d0_all = [_dec_slots(w, x, tm.e_d0, tm.wz_d0, 4)
              for w in range(4) for x in range(4)]
    out_all = [_out_slots(p, q, tm.ko) for p in range(4) for q in range(4)]
    emax = max(
        max(abs(e), abs(f))
        for slots in (enc1_all + [enc2_slots, d2_slots] + d1_all + d0_all
                      + out_all)
        for (_, e, f) in slots
    )
    emax = max(emax, *(abs(s) for es, fs in enc0_sets for s in (*es, *fs)))

    def kernel(x64_ref, y64_ref, tmask_ref,
               w0_ref, b0_ref, w1_ref, b1_ref, w2_ref, b2_ref,
               wd2_ref, bd2_ref, wd1_ref, bd1_ref, wd0_ref, bd0_ref,
               wo_ref, bo_ref,
               w1T_ref, w2T_ref, wd2T_ref, wd1T_ref, wd0T_ref, woT_ref,
               logits_ref,
               dw0_ref, db0_ref, dw1_ref, db1_ref, dw2_ref, db2_ref,
               dwd2_ref, dbd2_ref, dwd1_ref, dbd1_ref, dwd0_ref, dbd0_ref,
               dwo_ref, dbo_ref):
        from jax.experimental import pallas as pl

        @pl.when(pl.program_id(0) == 0)
        def _init():
            for r in (dw0_ref, db0_ref, dw1_ref, db1_ref, dw2_ref, db2_ref,
                      dwd2_ref, dbd2_ref, dwd1_ref, dbd1_ref, dwd0_ref,
                      dbd0_ref, dwo_ref, dbo_ref):
                r[...] = jnp.zeros(r.shape, r.dtype)

        masks = _make_masks3(nb, dtype, ss, emax)
        x64 = x64_ref[:]
        y64 = y64_ref[:]
        tmask = tmask_ref[:]                              # (1, nb) f32

        # ---------- forward (keeping backward artifacts) ----------
        shifts = sorted({
            (e, f) for es, fs in enc0_sets for e in es for f in fs
        })
        shifted = {
            (e, f): _tap(x64, 0, 64, e, f, masks, ss) for (e, f) in shifts
        }
        m0 = 4 * c1

        def q0_of(pi):
            es, fs = enc0_sets[pi]
            return jnp.concatenate(
                [shifted[(e, f)] for e in es for f in fs], axis=0
            )

        pm0s, p1_parts = [], []
        for pi in range(16):
            q0 = q0_of(pi)
            z0 = _mm(w0_ref[pi * m0:(pi + 1) * m0, : q0.shape[0]], q0) \
                + b0_ref[:]
            r0 = jax.nn.relu(z0)                          # (4c1, nb) f32
            p0 = jnp.maximum(jnp.maximum(r0[0:c1], r0[c1:2 * c1]),
                             jnp.maximum(r0[2 * c1:3 * c1], r0[3 * c1:4 * c1]))
            live = (p0 > 0).astype(jnp.float32)
            pm0s.append(jnp.concatenate(
                [(r0[a * c1:(a + 1) * c1] == p0).astype(jnp.float32) * live
                 for a in range(4)], axis=0).astype(dtype))
            p1_parts.append(p0.astype(dtype))
        p1 = jnp.concatenate(p1_parts, axis=0)            # (16*C1, nb)

        def q1_taps(ui):
            return [partial(_tap, p1, r * c1, c1, e, f, masks, ss)
                    for (r, e, f) in enc1_all[ui]]

        pm1s, p2_parts = [], []
        for ui in range(4):
            z1 = _fwd_tapsum(w1_ref, q1_taps(ui), c1) + b1_ref[:]
            r1 = jax.nn.relu(z1)                          # (4c2, nb)
            p = jnp.maximum(jnp.maximum(r1[0:c2], r1[c2:2 * c2]),
                            jnp.maximum(r1[2 * c2:3 * c2], r1[3 * c2:4 * c2]))
            live = (p > 0).astype(jnp.float32)
            pm1s.append(jnp.concatenate(
                [(r1[a * c2:(a + 1) * c2] == p).astype(jnp.float32) * live
                 for a in range(4)], axis=0).astype(dtype))
            p2_parts.append(p.astype(dtype))
        p2 = jnp.concatenate(p2_parts, axis=0)            # (4*C2, nb)

        def q2_taps():
            return [partial(_tap, p2, r * c2, c2, e, f, masks, ss)
                    for (r, e, f) in enc2_slots]

        z2 = _fwd_tapsum(w2_ref, q2_taps(), c2) + b2_ref[:]
        r2 = jax.nn.relu(z2)                              # (4c3, nb)
        p3f = jnp.maximum(jnp.maximum(r2[0:c3], r2[c3:2 * c3]),
                          jnp.maximum(r2[2 * c3:3 * c3], r2[3 * c3:4 * c3]))
        live2 = (p3f > 0).astype(jnp.float32)
        pm2 = jnp.concatenate(
            [(r2[a * c3:(a + 1) * c3] == p3f).astype(jnp.float32) * live2
             for a in range(4)], axis=0).astype(dtype)
        p3 = p3f.astype(dtype)                            # (C3, nb)

        def qd2_taps():
            return [partial(_tap, p3, r * c3, c3, e, f, masks, ss)
                    for (r, e, f) in d2_slots]

        zd2 = _fwd_tapsum(wd2_ref, qd2_taps(), c3) + bd2_ref[:]
        md2 = (zd2 > 0).astype(dtype)
        d2 = jax.nn.relu(zd2).astype(dtype)               # (4*C3, nb)

        def qd1_taps(wi):
            return [partial(_tap, d2, r * c3, c3, e, f, masks, ss)
                    for (r, e, f) in d1_all[wi]]

        d1_parts, md1s = [], []
        for wi in range(4):
            zd1 = _fwd_tapsum(wd1_ref, qd1_taps(wi), c3) + bd1_ref[:]
            md1s.append((zd1 > 0).astype(dtype))
            d1_parts.append(jax.nn.relu(zd1).astype(dtype))
        # parity-major reorder (py*4 + qx), as the serving kernel
        d1 = jnp.concatenate([
            d1_parts[(py // 2) * 2 + (qx // 2)][
                ((py % 2) * 2 + (qx % 2)) * c2:
                ((py % 2) * 2 + (qx % 2)) * c2 + c2, :]
            for py in range(4) for qx in range(4)
        ], axis=0)                                        # (16*C2, nb)

        def qd0_taps(wi):
            return [partial(_tap, d1, r * c2, c2, e, f, masks, ss)
                    for (r, e, f) in d0_all[wi]]

        d0_parts, md0s = [], []
        for wi in range(16):
            zd0 = _fwd_tapsum(wd0_ref, qd0_taps(wi), c2) + bd0_ref[:]
            md0s.append((zd0 > 0).astype(dtype))
            d0_parts.append(jax.nn.relu(zd0).astype(dtype))

        def qo_taps(pi):
            return [partial(_tap, d0_parts[r // 4], (r % 4) * c1, c1, e, f,
                            masks, ss)
                    for (r, e, f) in out_all[pi]]

        zos = []
        for pi in range(16):
            zo = _fwd_tapsum(wo_ref, qo_taps(pi), c1) + bo_ref[:]  # (4, nb)
            zos.append(zo)
            logits_ref[pi * 4:(pi + 1) * 4, :] = zo.astype(logits_ref.dtype)

        # ---------- backward ----------
        # out conv
        d0_contrib = {wi: {} for wi in range(16)}
        dzo_list = []
        dbo = None
        for pi in range(16):
            yb = y64[pi * 4:(pi + 1) * 4, :].astype(jnp.float32)
            dzo = (jax.nn.sigmoid(zos[pi]) - yb) * tmask   # (4, nb)
            dzo_list.append(dzo)
            dbo = _rowsum(dzo) if dbo is None else dbo + _rowsum(dzo)
        dbo_ref[...] += dbo
        _dw_accum(dwo_ref,
                  [(dzo_list[pi].astype(dtype), qo_taps(pi))
                   for pi in range(16)], c1)
        for pi in range(16):
            dqo = _mm(woT_ref[:], dzo_list[pi].astype(dtype))  # (Ko, nb)
            for j, (r, e, f) in enumerate(out_all[pi]):
                g = _inv_tap(dqo[j * c1:(j + 1) * c1], e, f, masks, ss)
                d0_contrib[r // 4].setdefault(r % 4, []).append(g)

        # dec0
        d1_contrib = {}
        dzd0_list = []
        dbd0 = None
        for wi in range(16):
            dd = _block_sum(d0_contrib[wi], 4, c1, nb)     # (4c1, nb)
            dz = dd * md0s[wi]
            dzd0_list.append(dz)
            dbd0 = _rowsum(dz) if dbd0 is None else dbd0 + _rowsum(dz)
        dbd0_ref[...] += dbd0
        _dw_accum(dwd0_ref,
                  [(dzd0_list[wi].astype(dtype), qd0_taps(wi))
                   for wi in range(16)], c2)
        for wi in range(16):
            dq = _mm(wd0T_ref[:], dzd0_list[wi].astype(dtype))
            for j, (r, e, f) in enumerate(d0_all[wi]):
                g = _inv_tap(dq[j * c2:(j + 1) * c2], e, f, masks, ss)
                d1_contrib.setdefault(r, []).append(g)     # r: parity-major

        # dec1 (invert the parity-major concat: block py*4+qx came from
        # gather wi=(py//2)*2+qx//2, phase blk=(py%2)*2+qx%2)
        d2_contrib = {}
        dzd1_list = []
        dbd1 = None
        for wi in range(4):
            parts = []
            for blk in range(4):
                py = (wi // 2) * 2 + blk // 2
                qx = (wi % 2) * 2 + blk % 2
                lst = d1_contrib.get(py * 4 + qx, [])
                parts.append(sum(lst[1:], lst[0]) if lst
                             else jnp.zeros((c2, nb), jnp.float32))
            dz = jnp.concatenate(parts, axis=0) * md1s[wi]  # (4c2, nb)
            dzd1_list.append(dz)
            dbd1 = _rowsum(dz) if dbd1 is None else dbd1 + _rowsum(dz)
        dbd1_ref[...] += dbd1
        _dw_accum(dwd1_ref,
                  [(dzd1_list[wi].astype(dtype), qd1_taps(wi))
                   for wi in range(4)], c3)
        for wi in range(4):
            dq = _mm(wd1T_ref[:], dzd1_list[wi].astype(dtype))
            for j, (r, e, f) in enumerate(d1_all[wi]):
                g = _inv_tap(dq[j * c3:(j + 1) * c3], e, f, masks, ss)
                d2_contrib.setdefault(r, []).append(g)

        # dec2
        dd2 = _block_sum(d2_contrib, 4, c3, nb)            # (4c3, nb)
        dzd2 = dd2 * md2
        dbd2_ref[...] += _rowsum(dzd2)
        _dw_accum(dwd2_ref, [(dzd2.astype(dtype), qd2_taps())], c3)
        dq = _mm(wd2T_ref[:], dzd2.astype(dtype))
        dp3 = None
        for j, (_, e, f) in enumerate(d2_slots):
            g = _inv_tap(dq[j * c3:(j + 1) * c3], e, f, masks, ss)
            dp3 = g if dp3 is None else dp3 + g            # (C3, nb)

        # enc2 pool backward (gradient to every maximal live phase)
        dz2 = jnp.concatenate([dp3] * 4, axis=0) * pm2     # (4c3, nb)
        db2_ref[...] += _rowsum(dz2)
        _dw_accum(dw2_ref, [(dz2.astype(dtype), q2_taps())], c2)
        dq2 = _mm(w2T_ref[:], dz2.astype(dtype))
        p2_contrib = {}
        for j, (r, e, f) in enumerate(enc2_slots):
            g = _inv_tap(dq2[j * c2:(j + 1) * c2], e, f, masks, ss)
            p2_contrib.setdefault(r, []).append(g)

        # enc1 pool backward
        p1_contrib = {}
        dz1_list = []
        db1 = None
        for ui in range(4):
            lst = p2_contrib.get(ui, [])
            dp2 = (sum(lst[1:], lst[0]) if lst
                   else jnp.zeros((c2, nb), jnp.float32))
            dz1 = jnp.concatenate([dp2] * 4, axis=0) * pm1s[ui]
            dz1_list.append(dz1)
            db1 = _rowsum(dz1) if db1 is None else db1 + _rowsum(dz1)
        db1_ref[...] += db1
        _dw_accum(dw1_ref,
                  [(dz1_list[ui].astype(dtype), q1_taps(ui))
                   for ui in range(4)], c1)
        for ui in range(4):
            dq1 = _mm(w1T_ref[:], dz1_list[ui].astype(dtype))
            for j, (r, e, f) in enumerate(enc1_all[ui]):
                g = _inv_tap(dq1[j * c1:(j + 1) * c1], e, f, masks, ss)
                p1_contrib.setdefault(r, []).append(g)

        # enc0 pool backward + first-conv weight grads (per-parity K widths)
        db0 = None
        for pi in range(16):
            lst = p1_contrib.get(pi, [])
            dp1 = (sum(lst[1:], lst[0]) if lst
                   else jnp.zeros((c1, nb), jnp.float32))
            dz0 = jnp.concatenate([dp1] * 4, axis=0) * pm0s[pi]  # (4c1, nb)
            q0 = q0_of(pi)
            dw0_ref[pi * m0:(pi + 1) * m0, 0:q0.shape[0]] += _mm_lane(
                dz0.astype(dtype), q0
            )
            db0 = _rowsum(dz0) if db0 is None else db0 + _rowsum(dz0)
        db0_ref[...] += db0

    return kernel


def _pallas_train3(x64, y64, tmask, fwd, bwd, tm: TrainMaps3,
                   block_tiles: int, interpret: bool, dtype):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    m = x64.shape[1]
    nb = block_tiles * LANES3
    kern = _make_train_kernel3(tm, nb, dtype)

    def fixed_in(arr):
        return pl.BlockSpec(arr.shape, lambda i: (0, 0),
                            memory_space=pltpu.VMEM)

    def acc_spec(shape):
        # constant index_map: the SAME VMEM block revisits every grid step
        # -> cross-step accumulation (zeroed at program_id 0)
        return pl.BlockSpec(shape, lambda i: tuple(0 for _ in shape),
                            memory_space=pltpu.VMEM)

    grad_shapes = [np.asarray(tm.maps[i]).shape for i in range(14)]
    out_shape = (
        jax.ShapeDtypeStruct((64, m), jnp.float32),  # logits
        *[jax.ShapeDtypeStruct(s, jnp.float32) for s in grad_shapes],
    )
    out_specs = (
        pl.BlockSpec((64, nb), lambda i: (0, i), memory_space=pltpu.VMEM),
        *[acc_spec(s) for s in grad_shapes],
    )
    return pl.pallas_call(
        kern,
        out_shape=out_shape,
        grid=(m // nb,),
        in_specs=[
            pl.BlockSpec((64, nb), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((64, nb), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nb), lambda i: (0, i), memory_space=pltpu.VMEM),
            *[fixed_in(w) for w in fwd],
            *[fixed_in(w) for w in bwd],
        ],
        out_specs=out_specs,
        interpret=interpret,
        # 125M: the k7/(64,32,64) grid corner needs 114.8M scoped (measured;
        # 110M rejected it); the limit only gates, smaller geometries compile
        # identically.  v5e VMEM is 128M.
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=125 * 1024 * 1024
        ),
    )(x64, y64, tmask, *fwd, *bwd)


# ---------------------------------------------------------------------------
# XLA wrappers: layout plumbing, loss, the step
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=1)
def _prod_perm3():
    """Row permutation x64 (xi*8 + phi) order -> o64 production order
    ((py*4 + qx)*4 + a*2 + b with phi = 2py + a, xi = 2qx + b)."""
    perm = np.zeros(64, np.int64)
    for py in range(4):
        for qx in range(4):
            for a in range(2):
                for b in range(2):
                    prod = (py * 4 + qx) * 4 + a * 2 + b
                    perm[prod] = (2 * qx + b) * 8 + (2 * py + a)
    return perm


def tiles_to_y64(tiles: jax.Array, dtype=jnp.bfloat16) -> jax.Array:
    """Labels (B,256,128,1) -> (64, B*512) rows in PRODUCTION order —
    aligned with the kernel's logits rows."""
    return tiles_to_x64(tiles, dtype)[jnp.asarray(_prod_perm3())]


def _tile_mask_lanes3(mask: jax.Array) -> jax.Array:
    return jnp.repeat(mask.astype(jnp.float32), LANES3)[None, :]


def masked_bce_from_logits64(logits64, y64, lane_mask):
    """Mean BCE over real tiles from (64, m) production-order logits."""
    z, y = logits64, y64.astype(jnp.float32)
    per = jnp.maximum(z, 0) - z * y + jnp.log1p(jnp.exp(-jnp.abs(z)))
    w = lane_mask  # (1, m)
    return jnp.sum(per * w) / (jnp.sum(w) * 64.0)


def kernel_loss_grad_sums3(params, x, y, mask, tm: TrainMaps3,
                           block_tiles: int = 1, interpret: bool = False,
                           dtype=jnp.bfloat16):
    """UNNORMALIZED (bce_sum, mask_sum, grad_sums) — the data-parallel
    building block (see ae_train_kernel.kernel_loss_grad_sums): psum all
    three over the mesh axis, then normalize by the global denominator."""
    x64 = tiles_to_x64(x, dtype)
    y64 = tiles_to_y64(y, dtype)
    lm = _tile_mask_lanes3(mask)
    fwd, bwd = gather_train_weights3(params, tm, dtype)
    logits64, *gops = _pallas_train3(
        x64, y64, lm, fwd, bwd, tm, block_tiles, interpret, dtype
    )
    z, yf = logits64, y64.astype(jnp.float32)
    per = jnp.maximum(z, 0) - z * yf + jnp.log1p(jnp.exp(-jnp.abs(z)))
    return jnp.sum(per * lm), jnp.sum(mask), unscatter_grads3(gops, tm)


def kernel_value_and_grad3(params, x, y, mask, tm: TrainMaps3,
                           block_tiles: int = 1, interpret: bool = False,
                           dtype=jnp.bfloat16):
    """(loss, conv-param grads) from the fused depth-3 kernel — the
    jax.value_and_grad equivalent on the Pallas path (traceable)."""
    bce_sum, msum, gsums = kernel_loss_grad_sums3(
        params, x, y, mask, tm, block_tiles, interpret, dtype
    )
    denom = msum * float(np.prod(x.shape[1:]))  # == msum * LANES3 * 64
    grads = jax.tree_util.tree_map(lambda g: g / denom, gsums)
    return bce_sum / denom, grads


def make_kernel_train_step3(cfg: ModelConfig, tx, block_tiles: int = 1,
                            interpret: bool = False, dtype=jnp.bfloat16):
    """Returns step(state, x_tiles, y_tiles, mask) -> (state, loss): the
    fused depth-3 forward+backward with the optax update in XLA."""
    tm = build_train_maps3(cfg)

    @jax.jit
    def step(state, x, y, mask):
        loss, grads = kernel_value_and_grad3(
            state.params, x, y, mask, tm, block_tiles, interpret, dtype
        )
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return state.replace(
            params=params, opt_state=opt_state, step=state.step + 1
        ), loss

    return step


def kernel_train_epoch_fn3(cfg: ModelConfig, tx, block_tiles: int = 1,
                           interpret: bool = False, dtype=jnp.bfloat16):
    """Scanned whole-epoch program on the fused depth-3 train kernel — the
    train.train_epoch equivalent (one dispatch per epoch)."""
    tm = build_train_maps3(cfg)

    @jax.jit
    def epoch(state, x, y, batch_idx, batch_mask):
        def body(st, args):
            idx, m = args
            loss, grads = kernel_value_and_grad3(
                st.params, x[idx], y[idx], m, tm, block_tiles, interpret,
                dtype,
            )
            updates, opt_state = tx.update(grads, st.opt_state, st.params)
            params = optax.apply_updates(st.params, updates)
            return st.replace(
                params=params, opt_state=opt_state, step=st.step + 1
            ), loss

        return jax.lax.scan(body, state, (batch_idx, batch_mask))

    return epoch
