"""Config system tests: defaults, dict merge, dotted overrides, validation."""
import json

import pytest

from depth_estimation_tpu.config import (
    CRFConfig,
    ExperimentConfig,
    from_dict,
    override,
    to_dict,
)


def test_defaults_finalize():
    cfg = ExperimentConfig().finalize()
    assert cfg.crf.backend == "lattice"
    assert cfg.unary.num_disp == 16


def test_partial_dict_merge():
    cfg = from_dict({"crf": {"niters": 8, "backend": "guided"}, "train": {"lr": 1e-3}})
    assert cfg.crf.niters == 8
    assert cfg.crf.backend == "guided"
    assert cfg.train.lr == 1e-3
    assert cfg.unary.num_disp == 16  # untouched default


def test_roundtrip():
    cfg = ExperimentConfig()
    again = from_dict(json.loads(json.dumps(to_dict(cfg))))
    assert again == cfg


def test_override_dotted():
    cfg = ExperimentConfig()
    cfg2 = override(cfg, "crf.niters", 9)
    assert cfg2.crf.niters == 9
    assert cfg.crf.niters == 5  # original untouched (frozen)


def test_validation_rejects_bad_backend():
    with pytest.raises(AssertionError):
        from_dict({"crf": {"backend": "magic"}})


def test_hashable_for_jit():
    assert hash(ExperimentConfig()) == hash(ExperimentConfig())
    assert hash(CRFConfig(niters=3)) != hash(CRFConfig(niters=4))
