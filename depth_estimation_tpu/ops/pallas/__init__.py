"""Pallas TPU kernels for the lattice hot loops."""
from .lattice_blur import blur_fused  # noqa: F401
