"""Fused mean-field elementwise update — one VMEM pass per iteration.

One mean-field iteration of the dense CRF
(`crf/crf_module.py:41-53` semantics) is

    E   = E0 + (W·C − C)          with C = Q·Mu (compatibility-transformed
    Q'  = softmax(−E)                  beliefs — also the filter INPUT)
    C'  = Q'·Mu

Everything except the lattice filter W·C is elementwise/small-matmul over
(n, L). XLA emits this as several fused-but-separate HBM passes; this
kernel performs the whole chain — energy update, numerically-stable
softmax, and the NEXT iteration's compatibility matmul (MXU, L×L) — in a
single pass over VMEM blocks, reading E0/S/C once and writing E/C' once
(the Q' intermediate never touches HBM). Measured on TPU v5e at the
flagship shape (110592×16): 0.236 ms vs 0.318 ms for the XLA chain
(SURVEY §7.5 "fused slice+softmax+energy update" — the slice itself
stays in the tiled-MXU XLA path where it is already matmul-bound).

The kernel is shape-generic over (n, L) with n % block == 0; `interpret=`
runs it on the CPU backend for tests.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["fused_energy_update", "fused_energy_update_reference"]


def _kernel(e0_ref, s_ref, c_ref, mu_ref, e_ref, cn_ref):
    E = e0_ref[:] + (s_ref[:] - c_ref[:])
    m = jnp.max(-E, axis=1, keepdims=True)
    ex = jnp.exp(-E - m)
    q = ex / jnp.sum(ex, axis=1, keepdims=True)
    e_ref[:] = E
    # Mosaic requires a 32-bit matmul accumulator (bf16 acc is rejected
    # at verification); accumulate f32 and cast to the output dtype
    cn = jnp.dot(q, mu_ref[:], preferred_element_type=jnp.float32)
    cn_ref[:] = cn.astype(cn_ref.dtype)


def fused_energy_update_reference(E0, S, C, Mu):
    """Pure-jnp semantics of the kernel (the test oracle and the non-TPU
    fallback): returns (E, C_next)."""
    E = E0 + (S - C)
    Q = jax.nn.softmax(-E, axis=-1)
    return E, jnp.matmul(Q, Mu, preferred_element_type=E.dtype)


@partial(jax.jit, static_argnames=("block", "interpret"))
def fused_energy_update(E0, S, C, Mu, block: int = 1024,
                        interpret: bool = False):
    """(E, C_next) from unaries E0, filtered compat S = W·C, compat C, Mu.

    All of E0/S/C are (n, L); Mu is (L, L); one grid step processes a
    (block, L) stripe resident in VMEM. Falls back to the jnp reference
    when n is not block-divisible.
    """
    n, L = E0.shape
    if n % block != 0:
        return fused_energy_update_reference(E0, S, C, Mu)
    bs = lambda: pl.BlockSpec((block, L), lambda i: (i, 0),
                              memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _kernel,
        grid=(n // block,),
        in_specs=[bs(), bs(), bs(),
                  pl.BlockSpec((L, L), lambda i: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=(bs(), bs()),
        out_shape=(jax.ShapeDtypeStruct((n, L), E0.dtype),
                   jax.ShapeDtypeStruct((n, L), E0.dtype)),
        interpret=interpret,
    )(E0, S, C, Mu)
