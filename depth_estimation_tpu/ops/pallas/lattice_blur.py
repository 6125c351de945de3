"""Pallas TPU kernel: fused multi-axis lattice blur.

The XLA formulation of the blur (`ops.permutohedral._blur`) issues d+1
sequential gather-axpy passes, each round-tripping the (C, L) value table
through HBM — ~6×3 table transfers per filter. At flagship capacity the
whole table is ~1 MB (C=16k, L=16, f32) and the neighbor index table
~0.8 MB: both fit comfortably in VMEM. This kernel keeps the table
on-chip for ALL d+1 axes — one HBM read of the inputs, one write of the
result, zero intermediate traffic.

Kernel I/O:
  vals      (C+1, L)  f32   value table (+ zero sentinel row C)
  neighbors (d+1, C, 2) i32 blur neighbor slots (C = missing)
  out       (C+1, L)  f32

`reverse` flips the axis order (transpose filter, used by the VJP).

Falls back transparently: `blur_fused(plan, vals)` checks the VMEM budget
and returns None when the table is too large for on-chip residency —
callers then use the XLA path.

HARDWARE STATUS (v5e, 2026-08 toolchain): Mosaic rejects the in-kernel
row gather with "Multiple source vregs along gather dimension" —
tpu.dynamic_gather only gathers within a single vreg span, not across a
16k-row table. The kernel is correct under interpret mode and stays
opt-in (DET_PALLAS_BLUR=1) pending either (a) Mosaic gaining multi-vreg
dynamic_gather or (b) a block-local reformulation (sort vertices so blur
neighbors fall inside 8-sublane groups). The XLA blur path (~3.5 ms at
flagship capacity) remains the production route; see ROADMAP.md.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

try:  # pallas is part of jax, but guard import for exotic builds
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    PALLAS_OK = True
except Exception:  # pragma: no cover
    PALLAS_OK = False

__all__ = ["blur_fused", "VMEM_BUDGET_BYTES"]

VMEM_BUDGET_BYTES = 12 * 1024 * 1024  # leave headroom below ~16 MB/core


def _blur_kernel(vals_ref, nbr_ref, out_ref, scratch, *, num_axes, reverse):
    # load the full table into scratch; ping-pong between scratch and out
    scratch[...] = vals_ref[...]
    C1, L = vals_ref.shape
    C = C1 - 1

    axes = range(num_axes - 1, -1, -1) if reverse else range(num_axes)
    use_scratch_src = True
    for j in axes:
        src = scratch if use_scratch_src else out_ref
        dst = out_ref if use_scratch_src else scratch
        # Mosaic's gather support is take_along_axis-shaped: indices must
        # match the table shape (per-lane row gather, tpu.dynamic_gather
        # along dim 0). Broadcast the neighbor row ids across lanes and pad
        # with the sentinel row so all shapes equal (C+1, L).
        n1 = jnp.concatenate([nbr_ref[j, :, 0], jnp.full((1,), C, jnp.int32)])
        n2 = jnp.concatenate([nbr_ref[j, :, 1], jnp.full((1,), C, jnp.int32)])
        idx1 = jax.lax.broadcast_in_dim(n1, (C1, L), (0,))
        idx2 = jax.lax.broadcast_in_dim(n2, (C1, L), (0,))
        table = src[...]
        v1 = jnp.take_along_axis(table, idx1, axis=0)
        v2 = jnp.take_along_axis(table, idx2, axis=0)
        row_is_sentinel = (
            jax.lax.broadcasted_iota(jnp.int32, (C1, L), 0) == C
        )
        new = table + 0.5 * (v1 + v2)
        dst[...] = jnp.where(row_is_sentinel, jnp.zeros_like(new), new)
        use_scratch_src = not use_scratch_src

    # ensure the final data lands in out_ref
    if use_scratch_src:  # even number of passes → result in scratch
        out_ref[...] = scratch[...]


def blur_fused(plan, vals: jax.Array, reverse: bool = False, interpret: bool = False):
    """Fused blur through all axes; returns None if not applicable."""
    if not PALLAS_OK:
        return None
    num_axes = plan.d + 1
    C1, L = vals.shape
    table_bytes = C1 * L * vals.dtype.itemsize
    nbr_bytes = plan.neighbors.size * 4
    if 3 * table_bytes + nbr_bytes > VMEM_BUDGET_BYTES:
        return None

    kernel = partial(_blur_kernel, num_axes=num_axes, reverse=reverse)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(vals.shape, vals.dtype),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM(vals.shape, vals.dtype)],
        interpret=interpret,
    )(vals, plan.neighbors)
