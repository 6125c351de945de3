"""Spatial tile parallelism with halo exchange (`shard_map` + `ppermute`).

Scales the pixel dimension across chips (BASELINE.json config #4: full-res
frames, 128+ labels, spatially tiled with halo-exchanged bilateral blur) —
a capability with NO analog in the reference, which only scales n *down*
by subsampling (SURVEY.md §5 "long-context").

Design: overlap-and-discard. The image plane is sharded into row stripes
over the mesh 'tile' axis. Every local operator with finite spatial
support — cost-volume box aggregation (support ws//2), guided filter
(support ~2r), and the bilateral lattice filter (Gaussian position kernel
of scale σp pixels; support ≈ halo when halo ≳ 4σp + blur reach) — is
computed on a halo-padded stripe and the halo discarded. One `ppermute`
neighbor exchange per operator application; zero communication inside the
filter itself. Truncation error decays as exp(-halo²/2σp²) and is gated by
tests against the global single-device result.

This trades the reference's exact-but-serial global lattice for a
near-exact, perfectly parallel one — the right trade on a TPU mesh where
ICI bandwidth is precious and the position kernel is short-range by
construction (σp ≈ 0.01·image diagonal in every reference config).
"""
from __future__ import annotations

from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

__all__ = ["halo_exchange_rows", "tiled_apply", "tiled_filter_hwc"]


def halo_exchange_rows(x: jax.Array, halo: int, axis_name: str) -> jax.Array:
    """Pad a row-sharded (h_local, ...) block with `halo` rows from each
    neighbor along the named mesh axis (zero rows at the outer edges).

    Inside `shard_map` only. Returns (h_local + 2·halo, ...).
    """
    idx = jax.lax.axis_index(axis_name)
    num = jax.lax.axis_size(axis_name)
    top_strip = x[:halo]  # rows this device sends upward
    bot_strip = x[-halo:]  # rows this device sends downward

    # receive from the device above: its bottom strip
    from_above = jax.lax.ppermute(
        bot_strip, axis_name, [(i, i + 1) for i in range(num - 1)]
    )
    # receive from the device below: its top strip
    from_below = jax.lax.ppermute(
        top_strip, axis_name, [(i + 1, i) for i in range(num - 1)]
    )
    zeros = jnp.zeros_like(top_strip)
    above = jnp.where(idx > 0, from_above, zeros)
    below = jnp.where(idx < num - 1, from_below, zeros)
    return jnp.concatenate([above, x, below], axis=0)


def tiled_apply(
    fn: Callable[[jax.Array], jax.Array],
    x: jax.Array,
    halo: int,
    mesh: Mesh,
    axis: str = "tile",
    extra_specs: P | None = None,
):
    """Apply `fn` (an (h, …) → (h, …) local operator) to a row-sharded
    array with overlap-and-discard halos.

    `fn` runs per device on the halo-padded stripe; the first `halo` and
    last `halo` output rows are discarded. Output sharding matches input.
    """
    spec = P(axis)

    def local(xl):
        padded = halo_exchange_rows(xl, halo, axis)
        out = fn(padded)
        return out[halo:-halo]

    return shard_map(local, mesh=mesh, in_specs=(spec,), out_specs=spec)(x)


def tiled_filter_hwc(
    filter_fn: Callable[[jax.Array, jax.Array], jax.Array],
    src_hwc: jax.Array,
    guide_hwc: jax.Array,
    halo: int,
    mesh: Mesh,
    axis: str = "tile",
):
    """Tile a pixel-space filter `filter_fn(src, guide) -> out` (all
    (h, w, c)) across row stripes with halo exchange on BOTH operands.

    Used for the lattice bilateral filter and the guided filter: the guide
    determines the plan per stripe, so each device builds its own lattice —
    embarrassingly parallel, one neighbor exchange total.
    """
    spec = P(axis)

    def local(s, g):
        sp = halo_exchange_rows(s, halo, axis)
        gp = halo_exchange_rows(g, halo, axis)
        out = filter_fn(sp, gp)
        return out[halo:-halo]

    return shard_map(local, mesh=mesh, in_specs=(spec, spec), out_specs=spec)(
        src_hwc, guide_hwc
    )
