"""Pallas corner-turn kernels: spectrogram <-> parity layout, 2-D windows.

The fused AE kernel (specenh.ops.ae_kernel) consumes tiles as 16 parity
rows over a mixed (freq-coarse, time-coarse) lane grid.  Producing that
layout with XLA ops is a strided corner-turn the TPU runs at ~37 GB/s
(2.14 ms in / 2.05 ms out for a 600-tile shot, PERF_NOTES.md).  These
kernels replace that — and their design is driven by measured v5e facts:

* Rank-changing reshapes between Pallas calls are NOT free: TPU HBM
  arrays are tiled on their last two dims, so (16, G, 64, 192) <->
  (16, m) costs a real relayout (~1.2-2.0 ms each way through the
  transpose engine).  Both kernels therefore speak the AE kernel's 2-D
  ``(16, m)`` form DIRECTLY — no intermediate 4-D array.
* VMEM windows with sub-128-lane minors DMA at 71-144 GB/s; 2-D
  ``(16, wide)`` windows and contiguous slabs move at 390+ GB/s, and
  strided HBM *reads* are fast while strided *writes* are slow — so the
  input turn reads strided spectrogram blocks and writes wide 2-D rows,
  and the output turn reads wide 2-D rows and writes one fully
  contiguous channel slab per grid step.
* In-kernel, the stride-4 time-parity gather/scatter runs as one-hot
  matmuls (iota-generated; Mosaic rejects strided slices on values, and
  a 0/1 matmul is EXACT for bf16 values).  The freq parity needs NO
  matmul at all: x16 rows are xi-major (row = xi*4 + phi, see
  ``tiles_to_x16``), so each coarse-s block of 16 rows is four plain
  4-row sublane slices of the naturally s-major spectrogram rows.
* float32 is preserved to ~1e-5 relative on the output side via a hi/lo
  bfloat16 split; the two halves share one matmul with a stacked
  ``[B; B]`` operand so the recombining add comes out of the MXU
  accumulator for free.

Layout contracts (must match specenh.ops.ae_kernel):

* x16/o16 lanes per I-tile group: ``s*(32*I) + j*32 + t`` (j = tile
  within group); the AE kernel runs with lane stride ``ss = 32*I``.
* x16 row order: ``xi*4 + phi``; o16 row order: production ``(p,q,a,b)``
  with ``(phi, xi) = (2p + a, 2q + b)``.
* ``k_tiles % I == 0`` keeps every group inside one channel.

Reference parity: layout plumbing for the inference fast path replacing
Keras ``autoencoder.predict`` + numpy restitching
(VAE/hyperparam_scan.py:214-244); no reference analogue of its own.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from specenh.ops.ae_kernel import CS, CT, LANES, _mm

__all__ = ["pick_interleave", "specs_to_x16_2d", "o16_2d_to_specs"]


def pick_interleave(k_tiles: int) -> int:
    """Largest supported group size dividing the per-channel tile count
    (6 for the reference's 30-tile spectrograms).  Larger groups mean
    fewer, larger one-hot matmuls and fewer Mosaic ops per grid step;
    the quadratic matmul-waste growth caps the useful size at ~6."""
    for i in (6, 4, 3, 2):
        if k_tiles % i == 0:
            return i
    return 1


def _colsel(xi: int, i_: int):
    """(I*128, I*32) one-hot gather: out col j*32 + t reads nat col
    j*128 + 4t + xi."""
    n_in, n_out = i_ * 4 * CT, i_ * CT
    r = jax.lax.broadcasted_iota(jnp.int32, (n_in, n_out), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (n_in, n_out), 1)
    return (r == (c >> 5) * 128 + 4 * (c & (CT - 1)) + xi).astype(jnp.bfloat16)


def _colscat2(xi: int, i_: int):
    """(2*I*32, I*128) one-hot scatter for a lane-stacked [hi | lo]
    operand: in col j*32 + t (in either half) feeds nat col
    j*128 + 4t + xi; the matmul's accumulator sums the halves."""
    w = i_ * CT
    r = jax.lax.broadcasted_iota(jnp.int32, (2 * w, i_ * 4 * CT), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (2 * w, i_ * 4 * CT), 1)
    rr = r % w
    return (c == (rr >> 5) * 128 + 4 * (rr & (CT - 1)) + xi).astype(jnp.bfloat16)


def _prod_row(phi: int, xi: int) -> int:
    """o16 production-order row for full-res parity (phi, xi)."""
    return 8 * (phi >> 1) + 4 * (xi >> 1) + 2 * (phi & 1) + (xi & 1)


# ---------------------------------------------------------------------------
# specs -> x16 (2-D)
# ---------------------------------------------------------------------------


def _make_turn_in_kernel(i_: int):
    def kernel(s_ref, o_ref):
        nat = s_ref[0].astype(jnp.bfloat16)  # (256, I*128), exact bf16 cast
        sel = [
            _mm(nat, _colsel(xi, i_)).astype(jnp.bfloat16) for xi in range(4)
        ]  # (256, I*32) each; rows stay natural 4s+phi (s-major)
        pieces = [
            jnp.concatenate(
                [sel[xi][4 * s:4 * (s + 1), :] for xi in range(4)], axis=0
            )  # (16, I*32), rows xi*4 + phi
            for s in range(CS)
        ]
        o_ref[...] = jnp.concatenate(pieces, axis=1)  # (16, I*2048)

    return kernel


@functools.partial(jax.jit, static_argnames=("k_tiles", "interleave", "interpret"))
def specs_to_x16_2d(specs: jax.Array, k_tiles: int, interleave: int = 0,
                    interpret: bool = False) -> jax.Array:
    """(C, 256, >=k*128) spectrograms -> (16, C*k*2048) bf16 parity rows,
    interleaved lane order — the AE kernel's operand for ``ss = 32*I``."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    c = specs.shape[0]
    i_ = interleave or pick_interleave(k_tiles)
    if k_tiles % i_:
        raise ValueError(
            f"interleave {i_} must divide k_tiles {k_tiles} (every group "
            "stays inside one channel)"
        )
    gpc = k_tiles // i_
    g = c * gpc
    return pl.pallas_call(
        _make_turn_in_kernel(i_),
        out_shape=jax.ShapeDtypeStruct((16, c * k_tiles * LANES), jnp.bfloat16),
        grid=(g,),
        in_specs=[
            pl.BlockSpec(
                (1, 4 * CS, i_ * 4 * CT),
                lambda i: (i // gpc, 0, i % gpc),
                memory_space=pltpu.VMEM,
            )
        ],
        out_specs=pl.BlockSpec(
            (16, i_ * LANES), lambda i: (0, i), memory_space=pltpu.VMEM
        ),
        interpret=interpret,
    )(specs)


# ---------------------------------------------------------------------------
# o16 (2-D) -> specs
# ---------------------------------------------------------------------------


def _make_turn_out_kernel(i_: int, gpc: int):
    w = i_ * CT
    gl = i_ * LANES  # lanes per group

    def kernel(o_ref, s_ref):
        v = o_ref[...]  # (16, k*2048) f32, rows in production order
        # rows -> (xi, phi) order via plain single-row sublane slices
        rows = [None] * 16
        for phi in range(4):
            for xi in range(4):
                r = _prod_row(phi, xi)
                rows[xi * 4 + phi] = v[r:r + 1, :]
        r16 = jnp.concatenate(rows, axis=0)  # (16, k*2048)
        # hi/lo split by BITMASK, not cast-and-subtract: under
        # --xla_allow_excess_precision (set on this TPU host) interpret
        # mode elides the f32->bf16->f32 round trip, making lo == 0 and
        # silently degrading the turn to hi-only (~2e-3).  Truncating the
        # low mantissa bits is immune and keeps hi exactly
        # bf16-representable.
        bits = jax.lax.bitcast_convert_type(r16, jnp.uint32)
        hi_f32 = jax.lax.bitcast_convert_type(
            bits & jnp.uint32(0xFFFF0000), jnp.float32
        )
        hi = hi_f32.astype(jnp.bfloat16)
        lo = (r16 - hi_f32).astype(jnp.bfloat16)
        scats = [_colscat2(xi, i_) for xi in range(4)]

        slabs = []
        for g in range(gpc):
            nat = None
            for xi in range(4):
                hx = hi[4 * xi:4 * (xi + 1), g * gl:(g + 1) * gl]  # (4, gl)
                lx = lo[4 * xi:4 * (xi + 1), g * gl:(g + 1) * gl]
                tall = jnp.concatenate(
                    [
                        jnp.concatenate(
                            [hx[:, s * w:(s + 1) * w], lx[:, s * w:(s + 1) * w]],
                            axis=1,
                        )  # (4, 2w): [hi | lo] lane-stacked
                        for s in range(CS)
                    ],
                    axis=0,
                )  # (256, 2w), rows natural 4s+phi
                part = _mm(tall, scats[xi])  # (256, I*128) f32, hi+lo summed
                nat = part if nat is None else nat + part
            slabs.append(nat)
        s_ref[0] = (
            jnp.concatenate(slabs, axis=1) if gpc > 1 else slabs[0]
        )  # (256, k*128) natural, contiguous channel slab

    return kernel


@functools.partial(jax.jit, static_argnames=("c", "k_tiles", "interleave",
                                              "interpret"))
def o16_2d_to_specs(o16: jax.Array, c: int, k_tiles: int, interleave: int = 0,
                    interpret: bool = False) -> jax.Array:
    """(16, C*k*2048) f32 parity rows (production order, interleaved lanes)
    -> (C, 256, k*128) restitched enhancement (float32, ~1e-5 relative of
    the exact scatter via the hi/lo split)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    i_ = interleave or pick_interleave(k_tiles)
    if k_tiles % i_:
        raise ValueError(
            f"interleave {i_} must divide k_tiles {k_tiles} (every group "
            "stays inside one channel)"
        )
    gpc = k_tiles // i_
    return pl.pallas_call(
        _make_turn_out_kernel(i_, gpc),
        out_shape=jax.ShapeDtypeStruct((c, 4 * CS, k_tiles * 4 * CT), jnp.float32),
        grid=(c,),
        in_specs=[
            pl.BlockSpec(
                (16, k_tiles * LANES), lambda i: (0, i), memory_space=pltpu.VMEM
            )
        ],
        out_specs=pl.BlockSpec(
            (1, 4 * CS, k_tiles * 4 * CT),
            lambda i: (i, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
    )(o16)


# ---------------------------------------------------------------------------
# depth-3 variants: specs <-> x64 on the 32x16 coarse grid (8x8 parities)
#
# Same design one level down: freq parity phi in 0..7 is free (natural
# rows are 8s + phi, so each coarse-s block of 64 rows is eight plain
# 8-row sublane slices), time parity xi runs as one-hot stride-8 lane
# matmuls.  Layout contracts match specenh.ops.ae3_kernel: lanes
# s*(16*I) + j*16 + t; x64 rows xi*8 + phi; o64 rows production order
# (py, qx, a, b) with (phi, xi) = (2*py + a, 2*qx + b).
# ---------------------------------------------------------------------------

from specenh.ops.ae3_kernel import CS3, CT3, LANES3  # noqa: E402


def _colsel8(xi: int, i_: int):
    """(I*128, I*16) one-hot gather: out col j*16 + t reads nat col
    j*128 + 8t + xi."""
    n_in, n_out = i_ * 8 * CT3, i_ * CT3
    r = jax.lax.broadcasted_iota(jnp.int32, (n_in, n_out), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (n_in, n_out), 1)
    return (r == (c >> 4) * 128 + 8 * (c & (CT3 - 1)) + xi).astype(jnp.bfloat16)


def _colscat8_2(xi: int, i_: int):
    """(2*I*16, I*128) one-hot scatter for a lane-stacked [hi | lo]
    operand: in col j*16 + t (either half) feeds nat col j*128 + 8t + xi."""
    w = i_ * CT3
    r = jax.lax.broadcasted_iota(jnp.int32, (2 * w, i_ * 8 * CT3), 0) % w
    c = jax.lax.broadcasted_iota(jnp.int32, (2 * w, i_ * 8 * CT3), 1)
    return (c == (r >> 4) * 128 + 8 * (r & (CT3 - 1)) + xi).astype(jnp.bfloat16)


def _prod_row3(phi: int, xi: int) -> int:
    """o64 production-order row for full-res parity (phi, xi)."""
    return ((phi >> 1) * 4 + (xi >> 1)) * 4 + (phi & 1) * 2 + (xi & 1)


def pick_interleave3(k_tiles: int) -> int:
    """Group size for the depth-3 turns/kernel (lanes per group = I*512).
    Small groups win (measured, deep3 20-ch shot: I=2/bt=4 7.06 ms,
    I=3/bt=3 7.13, I=6/bt=6 8.05, I=1/bt=1 8.07 — PERF_NOTES round 3);
    preference order 2, 3, 4, 6."""
    for i in (2, 3, 4, 6):
        if k_tiles % i == 0:
            return i
    return 1


def _make_turn3_in_kernel(i_: int):
    def kernel(s_ref, o_ref):
        nat = s_ref[0].astype(jnp.bfloat16)  # (256, I*128)
        sel = [
            _mm(nat, _colsel8(xi, i_)).astype(jnp.bfloat16) for xi in range(8)
        ]  # (256, I*16) each; rows natural 8s + phi
        pieces = [
            jnp.concatenate(
                [sel[xi][8 * s:8 * (s + 1), :] for xi in range(8)], axis=0
            )  # (64, I*16), rows xi*8 + phi
            for s in range(CS3)
        ]
        o_ref[...] = jnp.concatenate(pieces, axis=1)  # (64, I*512)

    return kernel


@functools.partial(jax.jit, static_argnames=("k_tiles", "interleave", "interpret"))
def specs_to_x64_2d(specs: jax.Array, k_tiles: int, interleave: int = 0,
                    interpret: bool = False) -> jax.Array:
    """(C, 256, >=k*128) spectrograms -> (64, C*k*512) bf16 parity rows,
    interleaved lanes — the depth-3 AE kernel's operand for ss = 16*I."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    c = specs.shape[0]
    i_ = interleave or pick_interleave3(k_tiles)
    if k_tiles % i_:
        raise ValueError(f"interleave {i_} must divide k_tiles {k_tiles}")
    gpc = k_tiles // i_
    g = c * gpc
    return pl.pallas_call(
        _make_turn3_in_kernel(i_),
        out_shape=jax.ShapeDtypeStruct((64, c * k_tiles * LANES3), jnp.bfloat16),
        grid=(g,),
        in_specs=[
            pl.BlockSpec(
                (1, 8 * CS3, i_ * 8 * CT3),
                lambda i: (i // gpc, 0, i % gpc),
                memory_space=pltpu.VMEM,
            )
        ],
        out_specs=pl.BlockSpec(
            (64, i_ * LANES3), lambda i: (0, i), memory_space=pltpu.VMEM
        ),
        interpret=interpret,
    )(specs)


def _make_turn3_out_kernel(i_: int, gpc: int):
    w = i_ * CT3
    gl = i_ * LANES3

    def kernel(o_ref, s_ref):
        v = o_ref[...]  # (64, k*512) f32, production order
        rows = [None] * 64
        for phi in range(8):
            for xi in range(8):
                r = _prod_row3(phi, xi)
                rows[xi * 8 + phi] = v[r:r + 1, :]
        r64 = jnp.concatenate(rows, axis=0)  # (64, k*512), xi-major
        bits = jax.lax.bitcast_convert_type(r64, jnp.uint32)
        hi_f32 = jax.lax.bitcast_convert_type(
            bits & jnp.uint32(0xFFFF0000), jnp.float32
        )
        hi = hi_f32.astype(jnp.bfloat16)
        lo = (r64 - hi_f32).astype(jnp.bfloat16)
        scats = [_colscat8_2(xi, i_) for xi in range(8)]

        slabs = []
        for g in range(gpc):
            nat = None
            for xi in range(8):
                hx = hi[8 * xi:8 * (xi + 1), g * gl:(g + 1) * gl]
                lx = lo[8 * xi:8 * (xi + 1), g * gl:(g + 1) * gl]
                tall = jnp.concatenate(
                    [
                        jnp.concatenate(
                            [hx[:, s * w:(s + 1) * w], lx[:, s * w:(s + 1) * w]],
                            axis=1,
                        )
                        for s in range(CS3)
                    ],
                    axis=0,
                )  # (256, 2w), rows natural 8s + phi
                part = _mm(tall, scats[xi])  # (256, I*128)
                nat = part if nat is None else nat + part
            slabs.append(nat)
        s_ref[0] = (
            jnp.concatenate(slabs, axis=1) if gpc > 1 else slabs[0]
        )

    return kernel


@functools.partial(jax.jit, static_argnames=("c", "k_tiles", "interleave",
                                             "interpret"))
def o64_2d_to_specs(o64: jax.Array, c: int, k_tiles: int, interleave: int = 0,
                    interpret: bool = False) -> jax.Array:
    """(64, C*k*512) f32 production parity rows -> (C, 256, k*128)
    (float32, ~1e-5 relative via the hi/lo split)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    i_ = interleave or pick_interleave3(k_tiles)
    if k_tiles % i_:
        raise ValueError(f"interleave {i_} must divide k_tiles {k_tiles}")
    gpc = k_tiles // i_
    return pl.pallas_call(
        _make_turn3_out_kernel(i_, gpc),
        out_shape=jax.ShapeDtypeStruct((c, 8 * CS3, k_tiles * 8 * CT3), jnp.float32),
        grid=(c,),
        in_specs=[
            pl.BlockSpec(
                (64, k_tiles * LANES3), lambda i: (0, i), memory_space=pltpu.VMEM
            )
        ],
        out_specs=pl.BlockSpec(
            (1, 8 * CS3, k_tiles * 8 * CT3),
            lambda i: (i, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
    )(o64)
