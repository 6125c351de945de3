"""depth_estimation_tpu — TPU-native dense stereo/depth estimation.

A brand-new JAX/XLA/Pallas framework with the capabilities of the
`mfinzi/depth-estimation` research stack (see /root/repo/SURVEY.md):

- stereo cost-volume construction (`ops.costvolume`),
- differentiable Gaussian filtering: dense oracle (`ops.dense_gaussian`),
  permutohedral lattice (`ops.permutohedral`, Pallas kernels under
  `ops.pallas`), box/gaussian/guided filters (`ops.boxfilter`,
  `ops.guided_filter`),
- mean-field dense-CRF inference and the trainable CRF-as-RNN layer
  (`crf.meanfield`, `crf.compat`, `crf.guides`),
- task models: depth refiner / uncertainty / upsampler (`models`),
- multi-chip sharding: spatial tiling w/ halo exchange, data parallel
  (`parallel`),
- data & IO: PFM/PGM/PNG, Tsukuba/Middlebury datasets, synthetic fixtures
  (`data`),
- training harness: optax/orbax, metrics, logging (`train`).

Everything is functional (params are pytrees), jit/grad/vmap/shard_map
friendly, and designed for TPU: static shapes, fused XLA ops, Pallas for
the bandwidth-bound lattice inner loops.
"""

__version__ = "0.1.0"
