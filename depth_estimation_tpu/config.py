"""Unified configuration system — one dataclass tree for the whole stack.

The reference has three incompatible config styles to unify (SURVEY.md §5):
Detectron's global `cfg` AttrDict + YAML merge (`lib/core/config.py`),
Matterport's class-attribute `Config` with computed fields
(`mrcnn/config.py`), and ad-hoc notebook hyperparameter cells. Here: typed
frozen dataclasses with

- derived-value inference (`finalize()` ≙ `assert_and_infer_cfg`),
- dict/JSON round-trip (`to_dict`/`from_dict` ≙ YAML merge),
- dotted-path overrides (`override(cfg, "crf.niters", 8)` ≙ `cfg_from_list`).

Frozen + hashable, so configs can be static jit arguments.
"""
from __future__ import annotations

import dataclasses
import json
from dataclasses import dataclass, field
from typing import Any

__all__ = [
    "CRFConfig",
    "UnaryConfig",
    "MeshConfig",
    "TrainConfig",
    "ExperimentConfig",
    "to_dict",
    "from_dict",
    "override",
]


@dataclass(frozen=True)
class UnaryConfig:
    """Cost-volume construction (`crf/depth.py` knobs)."""

    num_disp: int = 16
    window_size: int = 9
    criterion: str = "ad"  # 'ad' | 'sd' | 'nprod'


@dataclass(frozen=True)
class CRFConfig:
    """Mean-field CRF (`DenseCrf.ipynb` cell 6 + CRFasRNN ctor knobs)."""

    niters: int = 5
    gamma: float = 3.0
    sigma_color: float = 0.1
    sigma_pos: float = 0.1
    sigma_feat: float = 10.0
    backend: str = "lattice"  # 'lattice' | 'dense' | 'guided'
    guided_radius: int = 15
    guided_eps: float = 1e-2
    max_vertices: int | None = None  # None = auto (pow2 ≥ 2n)


@dataclass(frozen=True)
class MeshConfig:
    """Device mesh (replaces GPU_COUNT / mynn.DataParallel wiring)."""

    data: int | None = None  # None = all devices / tile
    tile: int = 1
    halo: int = 8


@dataclass(frozen=True)
class TrainConfig:
    steps: int = 300
    lr: float = 3e-2
    schedule: str = "constant"  # 'constant' | 'cosine'
    log_every: int = 10
    eval_every: int = 100
    seed: int = 0


@dataclass(frozen=True)
class ExperimentConfig:
    unary: UnaryConfig = field(default_factory=UnaryConfig)
    crf: CRFConfig = field(default_factory=CRFConfig)
    mesh: MeshConfig = field(default_factory=MeshConfig)
    train: TrainConfig = field(default_factory=TrainConfig)

    def finalize(self) -> "ExperimentConfig":
        """Validate and infer derived values (≙ `assert_and_infer_cfg`)."""
        assert self.unary.num_disp > 0 and self.unary.window_size % 2 == 1
        assert self.crf.backend in ("lattice", "dense", "guided")
        assert self.crf.niters >= 0
        assert self.mesh.tile >= 1 and self.mesh.halo >= 1
        return self


def to_dict(cfg) -> dict:
    return dataclasses.asdict(cfg)


def _build(cls, data: dict):
    kwargs = {}
    for f in dataclasses.fields(cls):
        if f.name not in data:
            continue
        v = data[f.name]
        if dataclasses.is_dataclass(f.type) if isinstance(f.type, type) else False:
            v = _build(f.type, v)
        elif isinstance(v, dict):
            sub = {
                "unary": UnaryConfig,
                "crf": CRFConfig,
                "mesh": MeshConfig,
                "train": TrainConfig,
            }.get(f.name)
            if sub:
                v = _build(sub, v)
        kwargs[f.name] = v
    return cls(**kwargs)


def from_dict(data: dict) -> ExperimentConfig:
    """Merge a (possibly partial, nested) dict onto defaults."""
    return _build(ExperimentConfig, data).finalize()


def from_json(path) -> ExperimentConfig:
    with open(path) as f:
        return from_dict(json.load(f))


def override(cfg, path: str, value: Any):
    """Return a copy of `cfg` with the dotted-path field replaced
    (`override(cfg, 'crf.niters', 8)` ≙ Detectron's `cfg_from_list`)."""
    parts = path.split(".")
    if len(parts) == 1:
        return dataclasses.replace(cfg, **{parts[0]: value})
    head, rest = parts[0], ".".join(parts[1:])
    return dataclasses.replace(cfg, **{head: override(getattr(cfg, head), rest, value)})
