"""Pallas TPU kernels for the mean-field hot loop.

History of what lives here is measurement-driven (SURVEY.md §7.5 asks for
Pallas on the bandwidth-critical stages; rounds 3-5 kept moving which
stages those ARE):

- the r2 fused-blur kernel was dropped in r3 (blur is ~sub-0.1 ms — the
  XLA gather path is near its floor, and the r4 tiled-MXU splat/slice
  made the vertex table walk vanish from the profile entirely);
- whole-table VMEM row gathers (the other blur idea) still do not lower
  through Mosaic (round-5 probe: gather-shape rejection);
- what DOES beat XLA on chip (round 5): fusing the per-iteration
  elementwise chain — energy update, softmax, and the next iteration's
  compatibility transform — into one VMEM pass (`meanfield.py`,
  measured 0.236 ms vs 0.318 ms for the fused-by-XLA equivalent at
  flagship shape).
"""
from .meanfield import fused_energy_update  # noqa: F401
