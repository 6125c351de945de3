"""Training harness: optax optimization, orbax checkpoints, metric logging.

Replaces the reference's external `oil` Trainer dependency
(`crf/mb_stereo_crf.py:5-11` — Trainer/LoaderTo/cosLr; SURVEY.md §2
"external deps to replace") with a compact functional harness:

- `TrainState`: params + optimizer state pytree.
- `Trainer`: jit-compiled update step over a user loss_fn, cosine or
  constant LR, per-step metric logging (JSONL + stdout), periodic eval,
  orbax checkpoint save/restore with step tracking (capability parity with
  the reference's three checkpoint systems, SURVEY.md §5).

Data parallel: pass `mesh` and every update runs as one SPMD program —
params/optimizer state replicated, batch leaves sharded on their leading
dim over the 'data' axis, gradient all-reduce inserted by XLA from the
shardings (the TPU-native form of the reference's DataParallel /
ParallelModel replica machinery). The user loss_fn must average over the
batch dimension (any `...mean()` loss does).
"""
from __future__ import annotations

import json
import time
from dataclasses import dataclass, field
from pathlib import Path
from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax

__all__ = ["TrainState", "Trainer", "cosine_lr"]


@jax.tree_util.register_pytree_node_class
@dataclass
class TrainState:
    params: Any
    opt_state: Any
    step: jax.Array

    def tree_flatten(self):
        return (self.params, self.opt_state, self.step), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)


def cosine_lr(base_lr: float, total_steps: int) -> optax.Schedule:
    """Cosine decay to zero — the `cosLr` schedule the reference trainers
    use (`crf/mb_stereo_crf.py:5`)."""
    return optax.cosine_decay_schedule(base_lr, max(total_steps, 1))


class Trainer:
    """Minimal functional trainer.

    Args:
      loss_fn: (params, batch) → scalar loss (jit-traceable).
      optimizer: an optax GradientTransformation.
      metrics_fn: optional (params, batch) → dict of scalars for eval.
      log_dir: if set, writes one JSON line per log event to train_log.jsonl
        and orbax checkpoints under checkpoints/.
      mesh: optional `jax.sharding.Mesh` with a 'data' axis — enables
        data-parallel updates (batch sharded on leading dims, params
        replicated; see module docstring).
    """

    def __init__(
        self,
        loss_fn: Callable,
        optimizer: optax.GradientTransformation,
        metrics_fn: Callable | None = None,
        log_dir: str | None = None,
        log_every: int = 10,
        mesh=None,
    ):
        self.loss_fn = loss_fn
        self.optimizer = optimizer
        self.metrics_fn = metrics_fn
        self.log_dir = Path(log_dir) if log_dir else None
        self.log_every = log_every
        self.mesh = mesh
        self._batch_sharding = None
        self._rep = None
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec

            self._rep = NamedSharding(mesh, PartitionSpec())
            self._batch_sharding = NamedSharding(mesh, PartitionSpec("data"))

        @jax.jit
        def _update(state: TrainState, batch):
            loss, grads = jax.value_and_grad(self.loss_fn)(state.params, batch)
            updates, opt_state = self.optimizer.update(
                grads, state.opt_state, state.params
            )
            params = optax.apply_updates(state.params, updates)
            return TrainState(params, opt_state, state.step + 1), loss

        self._update = _update

    def _place_batch(self, batch):
        """Shard batch leaves on their leading dim over the 'data' axis."""
        if self._batch_sharding is None:
            return batch
        return jax.tree.map(
            lambda x: jax.device_put(x, self._batch_sharding)
            if getattr(x, "ndim", 0) >= 1
            else x,
            batch,
        )

    def init(self, params) -> TrainState:
        state = TrainState(
            params, self.optimizer.init(params), jnp.zeros((), jnp.int32)
        )
        if self._rep is not None:
            state = jax.device_put(state, self._rep)
        return state

    def fit(
        self,
        state: TrainState,
        batches,
        num_steps: int,
        eval_batches=None,
        eval_every: int = 100,
    ) -> TrainState:
        """Run `num_steps` updates pulling batches from the (cycling)
        iterable; logs loss and periodic eval metrics."""
        it = iter(batches)
        t0 = time.time()
        try:
            for i in range(num_steps):
                try:
                    batch = next(it)
                except StopIteration:
                    it = iter(batches)
                    batch = next(it)
                state, loss = self._update(state, self._place_batch(batch))
                if (i + 1) % self.log_every == 0 or i == num_steps - 1:
                    self._log(
                        {
                            "step": int(state.step),
                            "loss": float(loss),
                            "steps_per_s": (i + 1) / (time.time() - t0),
                        }
                    )
                if eval_batches is not None and (i + 1) % eval_every == 0:
                    self.evaluate(state, eval_batches)
        except KeyboardInterrupt:
            # SIGINT-save semantics of the reference trainer
            # (`train_net_step.py` saves a checkpoint in its finally block)
            if self.log_dir:
                self.save(state, name="interrupt")
                self._log({"step": int(state.step), "interrupted": True})
            raise
        return state

    def evaluate(self, state: TrainState, batches) -> dict:
        if self.metrics_fn is None:
            return {}
        metric_fn = jax.jit(self.metrics_fn)
        totals, count = {}, 0
        for batch in batches:
            m = metric_fn(state.params, self._place_batch(batch))
            for k, v in m.items():
                totals[k] = totals.get(k, 0.0) + float(v)
            count += 1
        means = {k: v / max(count, 1) for k, v in totals.items()}
        self._log({"step": int(state.step), "eval": means})
        return means

    def _log(self, record: dict) -> None:
        if self.log_dir:
            with open(self.log_dir / "train_log.jsonl", "a") as f:
                f.write(json.dumps(record) + "\n")

    # --- checkpointing (orbax) ---------------------------------------------

    def save(self, state: TrainState, name: str = "latest") -> None:
        if not self.log_dir:
            raise ValueError("Trainer needs log_dir for checkpointing")
        import orbax.checkpoint as ocp

        path = (self.log_dir / "checkpoints" / name).absolute()
        ckptr = ocp.StandardCheckpointer()
        ckptr.save(
            path,
            {"params": state.params, "opt_state": state.opt_state, "step": state.step},
            force=True,
        )
        ckptr.wait_until_finished()

    def restore(self, template: TrainState, name: str = "latest") -> TrainState:
        import orbax.checkpoint as ocp

        path = (self.log_dir / "checkpoints" / name).absolute()
        ckptr = ocp.StandardCheckpointer()
        restored = ckptr.restore(
            path,
            {
                "params": template.params,
                "opt_state": template.opt_state,
                "step": template.step,
            },
        )
        return TrainState(restored["params"], restored["opt_state"], restored["step"])
