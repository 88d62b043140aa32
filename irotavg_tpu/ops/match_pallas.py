"""Fused Pallas matcher kernel: Hamming distances on the MXU + online
best-2 reduction, without materialising the (N1, N2) distance matrix.

Replaces the reference's per-keypoint scalar loops (descriptorDistance,
src/ViewGraph.cpp:106-122, inside findORBMatches* :125-569) the TPU way:

* 256-bit descriptors are unpacked once per frame to ±1 bfloat16 rows;
  the Hamming distance is then ``h = 128 - 0.5 * <a, b>`` — an exact
  integer identity that turns XOR+popcount into an MXU matmul.
* A flash-attention-style sweep tiles frame-2 columns; each (128, 128)
  distance tile is gated (validity / vocab-node / search-window /
  epipolar, matching the three reference matchers) and folded into
  running per-row (best, second-best, argmin) state held in the output
  refs — O(N1) memory instead of O(N1·N2).

The same computation is available as a pure-jnp path (`best2_reference`)
used on CPU and as the golden model in tests; `fused_best2` dispatches.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BIG = 10_000.0
_BR = 128   # row tile (frame-1 descriptors)
_BC = 128   # column tile (frame-2 descriptors)

# rowf columns: 0 valid, 1 node, 2 gx/x1, 3 gy/y1, 4 octave, 5 th/radius
# colf columns: 0 valid, 1 node, 2 x2, 3 y2, 4 octave, 5 a, 6 b, 7 c
ROWF_W = 8
COLF_W = 8

GATES = ("none", "node", "local", "epipolar", "epipolar_nonode")


def unpack_pm1(desc, dtype=jnp.bfloat16):
    """(N, 8) uint32 descriptor words -> (N, 256) ±1 rows.

    bit b of word w maps to column ``32*w + b``; <a, b> over ±1 vectors
    equals ``256 - 2*hamming``, exactly representable in bf16/f32.
    """
    desc = jnp.asarray(desc, jnp.uint32)
    bits = (desc[:, :, None] >> jnp.arange(32, dtype=jnp.uint32)) & 1
    bits = bits.reshape(desc.shape[0], 256)
    return (2.0 * bits.astype(jnp.float32) - 1.0).astype(dtype)


def _tile_mask(gate, rowf, colf):
    """(BR, BC) bool gate for one tile.  ``rowf`` is (BR, 8) and ``colf``
    is (8, BC) (pre-transposed so both broadcasts are layout-natural)."""
    mask = (rowf[:, 0:1] > 0) & (colf[0:1, :] > 0)
    if gate == "node":
        mask &= rowf[:, 1:2] == colf[1:2, :]
    elif gate == "local":
        r = rowf[:, 5:6]
        mask &= jnp.abs(colf[2:3, :] - rowf[:, 2:3]) <= r
        mask &= jnp.abs(colf[3:4, :] - rowf[:, 3:4]) <= r
        o1 = rowf[:, 4:5]
        o2 = colf[4:5, :]
        mask &= (o2 >= jnp.maximum(o1 - 2, 0)) & \
                (o2 <= jnp.minimum(o1 + 2, 7))
    elif gate in ("epipolar", "epipolar_nonode"):
        if gate == "epipolar":
            mask &= rowf[:, 1:2] == colf[1:2, :]
        a, b, c = colf[5:6, :], colf[6:7, :], colf[7:8, :]
        num = a * rowf[:, 2:3] + b * rowf[:, 3:4] + c
        den = a * a + b * b
        # num^2/den < th  <=>  num^2 < th*den (den >= 0; den==0 -> reject)
        mask &= num * num < rowf[:, 5:6] * den
    return mask


def _make_kernel(gate: str, nc: int):
    def kernel(bits1_ref, bits2t_ref, rowf_ref, colft_ref,
               d1_ref, d2_ref, idx_ref):
        i = pl.program_id(0)
        j = pl.program_id(1)
        row = pl.ds(i, 1)

        @pl.when(j == 0)
        def _():
            d1_ref[row, :] = jnp.full((1, _BR), BIG, jnp.float32)
            d2_ref[row, :] = jnp.full((1, _BR), BIG, jnp.float32)
            idx_ref[row, :] = jnp.full((1, _BR), -1, jnp.int32)

        dot = jax.lax.dot_general(
            bits1_ref[:], bits2t_ref[:],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        D = 128.0 - 0.5 * dot
        mask = _tile_mask(gate, rowf_ref[:], colft_ref[:])
        D = jnp.where(mask, D, BIG)

        m1 = jnp.min(D, axis=1)
        cols = jax.lax.broadcasted_iota(jnp.int32, (_BR, _BC), 1)
        # first-occurrence argmin (hardware argmin tie order is unspecified)
        i1 = jnp.min(jnp.where(D == m1[:, None], cols, _BC), axis=1)
        i1 = jnp.minimum(i1, _BC - 1)
        m2 = jnp.min(jnp.where(cols == i1[:, None], BIG, D), axis=1)

        rd1 = d1_ref[row, :][0]
        rd2 = d2_ref[row, :][0]
        ri = idx_ref[row, :][0]
        gi = j * _BC + i1
        # merged top-2 of {running pair, tile pair}; ties keep the
        # earlier (lower-index) column, matching a global argmin
        d1_ref[row, :] = jnp.minimum(rd1, m1)[None, :]
        idx_ref[row, :] = jnp.where(m1 < rd1, gi, ri)[None, :]
        d2_ref[row, :] = jnp.minimum(
            jnp.maximum(rd1, m1), jnp.minimum(rd2, m2)
        )[None, :]

    return kernel


@functools.partial(jax.jit, static_argnames=("gate", "interpret"))
def _fused_best2_padded(bits1, bits2t, rowf, colft, *, gate, interpret):
    n1 = bits1.shape[0]
    n2 = bits2t.shape[1]
    nr, nc = n1 // _BR, n2 // _BC
    grid = (nr, nc)
    kernel = _make_kernel(gate, nc)
    flops = 2 * n1 * n2 * 256
    d1, d2, idx = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((_BR, 256), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((256, _BC), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_BR, ROWF_W), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((COLF_W, _BC), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((nr, _BR), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nr, _BR), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nr, _BR), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((nr, _BR), jnp.float32),
            jax.ShapeDtypeStruct((nr, _BR), jnp.float32),
            jax.ShapeDtypeStruct((nr, _BR), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=int(bits1.size * 2 + bits2t.size * 2 * nr),
            transcendentals=0,
        ),
        interpret=interpret,
    )(bits1, bits2t, rowf, colft)
    return d1.reshape(n1), d2.reshape(n1), idx.reshape(n1)


def _pad_to(x, n, axis, fill=0.0):
    pad = n - x.shape[axis]
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths, constant_values=fill)


def use_pallas() -> bool:
    """Pallas path on TPU; interpret-mode when IROTAVG_PALLAS=interpret
    (tests); jnp fallback otherwise."""
    mode = os.environ.get("IROTAVG_PALLAS", "auto")
    if mode == "off":
        return False
    if mode == "interpret":
        return True
    return jax.default_backend() == "tpu"


def fused_best2(bits1, bits2t, rowf, colft, gate: str):
    """Per-row (best_dist, second_dist, best_idx) over gated columns.

    bits1: (N1, 256) ±1; bits2t: (256, N2) ±1 (transposed);
    rowf: (N1, 8); colft: (8, N2).  Pads internally to 128 multiples;
    padded columns are gated out via colf validity.
    """
    assert gate in GATES, gate
    n1, n2 = bits1.shape[0], bits2t.shape[1]
    n1p = -(-n1 // _BR) * _BR
    n2p = -(-n2 // _BC) * _BC
    bits1 = _pad_to(bits1, n1p, 0)
    bits2t = _pad_to(bits2t, n2p, 1)
    rowf = _pad_to(rowf, n1p, 0)       # padded rows: valid=0
    colft = _pad_to(colft, n2p, 1)     # padded cols: valid=0
    interpret = os.environ.get("IROTAVG_PALLAS") == "interpret"
    d1, d2, idx = _fused_best2_padded(
        bits1, bits2t, rowf, colft, gate=gate, interpret=interpret
    )
    return d1[:n1], d2[:n1], idx[:n1]


def best2_reference(bits1, bits2t, rowf, colft, gate: str):
    """Pure-jnp golden model of :func:`fused_best2` (used on CPU)."""
    dot = bits1.astype(jnp.float32) @ bits2t.astype(jnp.float32)
    D = 128.0 - 0.5 * dot
    mask = _tile_mask(gate, rowf, colft)
    D = jnp.where(mask, D, BIG)
    i1 = jnp.argmin(D, axis=1).astype(jnp.int32)
    d1 = jnp.take_along_axis(D, i1[:, None].astype(jnp.int64), axis=1)[:, 0]
    D2 = D.at[jnp.arange(D.shape[0]), i1].set(BIG)
    d2 = jnp.min(D2, axis=1)
    return d1, d2, jnp.where(d1 >= BIG, -1, i1)


def make_rowf(valid, node=None, x=None, y=None, octave=None, th=None):
    """Assemble the (N, 8) per-row feature block (f32)."""
    n = valid.shape[0]
    z = jnp.zeros((n,), jnp.float32)
    cols = [
        jnp.asarray(valid, jnp.float32),
        z if node is None else jnp.asarray(node, jnp.float32),
        z if x is None else jnp.asarray(x, jnp.float32),
        z if y is None else jnp.asarray(y, jnp.float32),
        z if octave is None else jnp.asarray(octave, jnp.float32),
        z if th is None else jnp.asarray(th, jnp.float32),
        z, z,
    ]
    return jnp.stack(cols, axis=1)


def make_colft(valid, node=None, x=None, y=None, octave=None,
               a=None, b=None, c=None):
    """Assemble the (8, N) per-column feature block (f32, transposed)."""
    n = valid.shape[0]
    z = jnp.zeros((n,), jnp.float32)
    rows = [
        jnp.asarray(valid, jnp.float32),
        z if node is None else jnp.asarray(node, jnp.float32),
        z if x is None else jnp.asarray(x, jnp.float32),
        z if y is None else jnp.asarray(y, jnp.float32),
        z if octave is None else jnp.asarray(octave, jnp.float32),
        z if a is None else jnp.asarray(a, jnp.float32),
        z if b is None else jnp.asarray(b, jnp.float32),
        z if c is None else jnp.asarray(c, jnp.float32),
    ]
    return jnp.stack(rows, axis=0)


def best2(bits1, bits2t, rowf, colft, gate: str):
    """Dispatch: Pallas kernel on TPU / interpret, jnp reference else."""
    if use_pallas():
        return fused_best2(bits1, bits2t, rowf, colft, gate)
    return best2_reference(bits1, bits2t, rowf, colft, gate)
