"""Batched stereo serving: frames → disparities at throughput.

Production path for BASELINE config #5 (batched image sequences sharded
across the mesh): one jitted program maps the full CRF stereo pipeline
over a frame batch (vmap — per-frame lattice plans batch into single XLA
ops) and shards the batch over the 'data' mesh axis. Host↔device transfer
overlaps with compute via async dispatch on the previous batch.

Usage:
    server = StereoServer(cfg, mesh=make_mesh())      # or mesh=None
    disps = server(left_batch, right_batch)           # (B, h, w)
    stats = server.throughput(left_batch, right_batch)
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..models.pipeline import CRFStereoConfig, crf_stereo_infer
from ..parallel.mesh import data_sharding, replicated

__all__ = ["StereoServer"]


class StereoServer:
    def __init__(self, cfg: CRFStereoConfig, mesh=None, auto_capacity: bool = True,
                 batch_mode: str = "loop"):
        """`auto_capacity` (default on): when the lattice backend runs
        with no explicit `max_vertices`, the first batch's leading frame
        calibrates a tight measured-occupancy capacity
        (`pipeline.calibrate_capacity`) instead of the ~50×-oversized
        safe default — the published serving throughput depends on it.

        `batch_mode`: 'loop' (default) dispatches the single-frame
        program per frame — async dispatch pipelines the frames and each
        runs the fast single-frame plan path (round-4 TPU measurement:
        27 fps vs 9 fps for the vmapped program at B=8 flagship, because
        `vmap` forces the plan build's data-dependent fast paths into
        their general branches). 'vmap' keeps the one-program whole-batch
        form — the right shape for mesh-sharded batches (mesh != None
        forces it).
        """
        self.cfg = cfg
        self.mesh = mesh
        self.batch_mode = "vmap" if mesh is not None else batch_mode
        self._needs_calibration = (
            auto_capacity and cfg.backend == "lattice" and cfg.max_vertices is None
        )
        self._make_fn()

    def _make_fn(self):
        cfg = self.cfg

        def one(left, right):
            return crf_stereo_infer(left, right, cfg)["disparity"]

        if self.batch_mode == "loop":
            self._fn_one = jax.jit(one)
            self._fn = lambda lb, rb: jnp.stack(
                [self._fn_one(lb[i], rb[i]) for i in range(lb.shape[0])]
            )
        else:
            self._fn = jax.jit(jax.vmap(one))

    def _shard(self, x):
        if self.mesh is None:
            return x
        return jax.device_put(x, data_sharding(self.mesh, x.ndim))

    def __call__(self, left_batch, right_batch):
        left = jnp.asarray(left_batch, jnp.float32)
        if self._needs_calibration:
            from ..models.pipeline import calibrate_capacity

            self.cfg = calibrate_capacity(left[0], self.cfg, tiled=True)
            self._make_fn()
            self._needs_calibration = False
        left = self._shard(left)
        right = self._shard(jnp.asarray(right_batch, jnp.float32))
        return self._fn(left, right)

    def throughput(self, left_batch, right_batch, reps: int = 5) -> dict:
        """Measure frames/s (steady-state, post-compile).

        Fetch-anchored (utils/timing.chain_timer): each rep folds its
        disparities into a device scalar and one final 4-byte fetch
        synchronizes — `block_until_ready` does not wait on this
        container's TPU relay, so naive loops time Python dispatch."""
        from ..utils.timing import chain_timer

        if self._needs_calibration:
            self(left_batch[:1], right_batch[:1])
        left = self._shard(jnp.asarray(left_batch, jnp.float32))
        right = self._shard(jnp.asarray(right_batch, jnp.float32))
        fn = self._fn

        def step(acc):
            return acc + jnp.sum(fn(left, right), dtype=jnp.float32)

        dt = chain_timer(step, reps=reps)
        B = np.asarray(left_batch).shape[0]
        return {
            "frames_per_s": B / dt,
            "batch": B,
            "ms_per_batch": dt * 1e3,
            "devices": 1 if self.mesh is None else int(np.prod(self.mesh.devices.shape)),
        }
