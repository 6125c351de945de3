"""Pallas TPU kernels for the lattice hot loops.

Round-3 measurement dropped the fused blur kernel that used to live here:
loop-amortized profiling showed blur costs ~0.1 ms at flagship scale (the
XLA gather-axpy path is already near its traffic floor) while the real
bottlenecks are the splat entry gather and plan construction (ROADMAP.md).
Kernels targeting those stages land here when they beat the XLA paths on
hardware; nothing is exported until then.
"""
