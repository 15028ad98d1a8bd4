"""BaseConfig round-trip semantics (reference: src/flash/config.py:13-141)."""

from dataclasses import field
from typing import List

import pytest
from pydantic.dataclasses import dataclass

from flash_diffusion_tpu.config import BaseConfig


@dataclass
class _DemoConfig(BaseConfig):
    lr: float = 1e-4
    stages: List[int] = field(default_factory=lambda: [1, 2])


def test_name_stamped_and_dict_roundtrip():
    cfg = _DemoConfig(lr=0.5)
    d = cfg.to_dict()
    assert d["name"] == "_DemoConfig"
    cfg2 = _DemoConfig.from_dict(d)
    assert cfg2.lr == 0.5 and cfg2.stages == [1, 2]


def test_json_yaml_roundtrip(tmp_path):
    cfg = _DemoConfig(lr=0.25, stages=[3])
    jp = cfg.save_json(str(tmp_path))
    yp = cfg.save_yaml(str(tmp_path))
    assert _DemoConfig.from_json(jp).lr == 0.25
    assert _DemoConfig.from_yaml(yp).stages == [3]


def test_mismatched_name_warns_not_fails(caplog):
    cfg = _DemoConfig.from_dict({"name": "SomethingElse", "lr": 1.0})
    assert cfg.lr == 1.0


def test_validation_rejects_bad_types():
    with pytest.raises(Exception):
        _DemoConfig(lr="not-a-float-at-all")
