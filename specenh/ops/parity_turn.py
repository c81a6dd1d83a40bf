"""Pallas corner-turn kernels: spectrogram <-> parity layout at DMA speed.

The fused AE kernel (specenh.ops.ae_kernel) consumes tiles as 16 parity
planes over a coarse (freq, time) lane grid.  Producing that layout with
XLA ops is a strided corner-turn the TPU runs at ~37 GB/s (measured:
2.14 ms in via a one-hot conv gather, 2.05 ms out via a conv_transpose
scatter, for a 600-tile shot — PERF_NOTES.md).  These kernels do the same
permutation as Pallas programs instead, with three measured facts driving
the design (all v5e, this repo's probes):

* VMEM windows whose minor dimension is 32 lanes move at ~71 GB/s — the
  DMA scatters into quarter-filled lane tiles.  Full 128-lane windows move
  at 390-950 GB/s.  So parity pieces are stored INTERLEAVED: ``I`` tiles
  per group, piece row = ``(64, I*32)`` lanes (I = 6 for the reference's
  30-tile spectrograms -> 192-lane windows).  The AE kernel's lane algebra
  survives: lane = s*(32*I) + j*32 + t, so its coarse-freq shift stride is
  ``32*I`` instead of 32 (the ``ss`` parameter) and tap tables / weights
  are untouched.
* x16 lives in HBM as ``(16, G, 64, I*32)``; its reshape to the AE
  kernel's ``(16, m)`` operand is contiguous — free metadata.  The lane
  interleave is performed BY THE DMA when blocks move between HBM and
  VMEM.
* In-kernel, the stride-4 parity gather/scatter runs as one-hot matmuls
  (Mosaic rejects strided slices on values and sublane<->lane shape
  casts; a 0/1 matmul is the legal spelling and is EXACT for bf16 values:
  each output element is a single ``1.0 * v`` product with f32
  accumulation).  The inverse direction keeps float32 to ~1e-5 relative
  via a hi/lo bfloat16 split permuted in two exact passes.

Layout contracts (must match specenh.ops.ae_kernel):

* x16 row order is natural parity ``phi*4 + xi`` with full-res pixel
  ``(y, x) = (4s + phi, 4t + xi)``.
* o16 row order is production order ``(p, q, a, b)`` with
  ``(phi, xi) = (2p + a, 2q + b)``.
* groups are ``I`` consecutive tiles; ``k_tiles % I == 0`` keeps every
  group inside one channel (any channel count works).

Reference parity: layout plumbing for the inference fast path that
replaces Keras ``autoencoder.predict`` + numpy restitching
(VAE/hyperparam_scan.py:214-244); no reference analogue of its own.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from specenh.ops.ae_kernel import CS, CT, LANES

__all__ = ["pick_interleave", "specs_to_x16i", "o16i_to_specs"]


def pick_interleave(k_tiles: int) -> int:
    """Largest supported group size dividing the per-channel tile count.
    6 -> 192-lane pieces (75% lane utilisation), 4 -> 128 (100%),
    3 -> 96 (75%), 2 -> 64 (50%), 1 -> 32 (the slow-DMA fallback)."""
    for i in (6, 4, 3, 2):
        if k_tiles % i == 0:
            return i
    return 1


# ---------------------------------------------------------------------------
# one-hot permutation matrices, generated in-kernel from iota (no operands)
# ---------------------------------------------------------------------------


def _row_gather(phi: int):
    """(64, 256) one-hot: out row s reads nat row 4s + phi."""
    r = jax.lax.broadcasted_iota(jnp.int32, (CS, 4 * CS), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (CS, 4 * CS), 1)
    return (c == 4 * r + phi).astype(jnp.bfloat16)


def _col_gather(xi: int):
    """(128, 32) one-hot: out col t reads nat col 4t + xi."""
    r = jax.lax.broadcasted_iota(jnp.int32, (4 * CT, CT), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (4 * CT, CT), 1)
    return (r == 4 * c + xi).astype(jnp.bfloat16)


def _row_scatter():
    """(256, 256) one-hot: nat row 4s + phi reads permuted row phi*64 + s."""
    i = jax.lax.broadcasted_iota(jnp.int32, (4 * CS, 4 * CS), 0)
    j = jax.lax.broadcasted_iota(jnp.int32, (4 * CS, 4 * CS), 1)
    return (j == (i & 3) * CS + (i >> 2)).astype(jnp.bfloat16)


def _col_scatter():
    """(128, 128) one-hot: permuted col xi*32 + t feeds nat col 4t + xi."""
    i = jax.lax.broadcasted_iota(jnp.int32, (4 * CT, 4 * CT), 0)
    j = jax.lax.broadcasted_iota(jnp.int32, (4 * CT, 4 * CT), 1)
    return (j == 4 * (i & (CT - 1)) + (i >> 5)).astype(jnp.bfloat16)


def _mm(lhs, rhs):
    return jax.lax.dot_general(
        lhs, rhs, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )


# ---------------------------------------------------------------------------
# specs -> interleaved x16
# ---------------------------------------------------------------------------


def _make_turn_in_kernel(interleave: int):
    def kernel(*refs):
        o_ref = refs[-1]
        # per parity row: pieces of the I tiles, lane-concatenated (j, t)
        rows = [[] for _ in range(16)]
        for j in range(interleave):
            nat = refs[j][0].astype(jnp.bfloat16)  # (256, 128)
            for phi in range(4):
                rp = _mm(_row_gather(phi), nat).astype(jnp.bfloat16)
                for xi in range(4):
                    rows[phi * 4 + xi].append(
                        _mm(rp, _col_gather(xi)).astype(jnp.bfloat16)
                    )
        for r in range(16):
            o_ref[r, 0] = (
                jnp.concatenate(rows[r], axis=1) if interleave > 1 else rows[r][0]
            )

    return kernel


@functools.partial(jax.jit, static_argnames=("k_tiles", "interleave", "interpret"))
def specs_to_x16i(specs: jax.Array, k_tiles: int, interleave: int = 0,
                  interpret: bool = False) -> jax.Array:
    """(C, 256, >=k*128) spectrograms -> (16, G, 64, I*32) bf16 interleaved
    parity pieces; ``.reshape(16, -1)`` is the AE kernel's operand with
    lane stride ``ss = 32*I`` (free contiguous reshape)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    c = specs.shape[0]
    i_ = interleave or pick_interleave(k_tiles)
    b = c * k_tiles
    g = b // i_

    def in_map(j):
        return lambda i: ((i_ * i + j) // k_tiles, 0, (i_ * i + j) % k_tiles)

    return pl.pallas_call(
        _make_turn_in_kernel(i_),
        out_shape=jax.ShapeDtypeStruct((16, g, CS, i_ * CT), jnp.bfloat16),
        grid=(g,),
        in_specs=[
            pl.BlockSpec((1, 4 * CS, 4 * CT), in_map(j), memory_space=pltpu.VMEM)
            for j in range(i_)
        ],
        out_specs=pl.BlockSpec(
            (16, 1, CS, i_ * CT), lambda i: (0, i, 0, 0), memory_space=pltpu.VMEM
        ),
        interpret=interpret,
    )(*([specs] * i_))


# ---------------------------------------------------------------------------
# interleaved o16 -> specs
# ---------------------------------------------------------------------------


def _prod_row(phi: int, xi: int) -> int:
    """o16 production-order row for full-res parity (phi, xi)."""
    return 8 * (phi >> 1) + 4 * (xi >> 1) + 2 * (phi & 1) + (xi & 1)


def _make_turn_out_kernel(interleave: int, gpc: int):
    """One grid step = ONE CHANNEL: read its ``gpc`` groups, emit the whole
    (256, k*128) channel slab.  The slab is the channel's fully contiguous
    HBM region, which matters because strided HBM *writes* are the slow
    direction (measured: (1,256,768) strided-row blocks wrote at ~57 GB/s;
    the contiguous slab version runs the whole turn at 0.50 ms vs 1.98)."""

    def kernel(o_ref, s_ref):
        pr, sc = _row_scatter(), _col_scatter()
        outs = []
        for gg in range(gpc):
            v = o_ref[:, gg]  # (16, 64, I*32) f32
            tiles = []
            for j in range(interleave):
                vj = v[:, :, j * CT:(j + 1) * CT]  # (16, 64, 32)
                tiles.append(
                    jnp.concatenate(
                        [
                            jnp.concatenate(
                                [vj[_prod_row(phi, xi)] for xi in range(4)],
                                axis=1,
                            )
                            for phi in range(4)
                        ],
                        axis=0,
                    )
                )  # (256, 128): rows (phi, s), cols (xi, t)
            big = (
                jnp.concatenate(tiles, axis=1) if interleave > 1 else tiles[0]
            )
            hi = big.astype(jnp.bfloat16)
            lo = (big - hi.astype(jnp.float32)).astype(jnp.bfloat16)

            def perm(x):
                y = _mm(pr, x).astype(jnp.bfloat16)  # exact: values are bf16
                cols = [
                    _mm(y[:, j * 128:(j + 1) * 128], sc)
                    for j in range(interleave)
                ]
                return (
                    jnp.concatenate(cols, axis=1) if interleave > 1 else cols[0]
                )

            outs.append(perm(hi) + perm(lo))  # f32, rows 4s+phi, cols 4t+xi
        s_ref[0] = jnp.concatenate(outs, axis=1) if gpc > 1 else outs[0]

    return kernel


@functools.partial(jax.jit, static_argnames=("c", "k_tiles", "interleave",
                                              "interpret"))
def o16i_to_specs(o16: jax.Array, c: int, k_tiles: int, interleave: int = 0,
                  interpret: bool = False) -> jax.Array:
    """(16, C*k*2048) f32 interleaved parity rows (production order) ->
    (C, 256, k*128) restitched enhancement (float32, ~1e-5 relative of the
    exact scatter via the hi/lo split).  One grid step per channel; the
    per-channel input window is ~0.5 MB * k_tiles, so the raised
    vmem_limit covers shots up to ~60 tiles."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    i_ = interleave or pick_interleave(k_tiles)
    b = o16.shape[1] // LANES
    g = b // i_
    gpc = k_tiles // i_  # groups per channel
    o4 = o16.reshape(16, g, CS, i_ * CT)
    return pl.pallas_call(
        _make_turn_out_kernel(i_, gpc),
        out_shape=jax.ShapeDtypeStruct((c, 4 * CS, k_tiles * 4 * CT), jnp.float32),
        grid=(c,),
        in_specs=[
            pl.BlockSpec(
                (16, gpc, CS, i_ * CT), lambda i: (0, i, 0, 0),
                memory_space=pltpu.VMEM,
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
    )(o4)
