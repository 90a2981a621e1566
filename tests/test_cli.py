"""Three-scope dataclass CLI tests (parity: simple_parsing flag surface —
``--scope.field``, dash variants, ``--config_path`` YAML overlay)."""

import dataclasses
from typing import Optional, Tuple

import pytest

from pixparse_tpu.framework.cli import ConfigArgumentParser
from pixparse_tpu.framework.config import OptimizationCfg, TaskTrainCfg


@dataclasses.dataclass
class _Inner:
    rate: float = 1.0
    name: str = "x"


@dataclasses.dataclass
class _Outer:
    flag: bool = False
    size: int = 3
    pair: Optional[Tuple[float, float]] = None
    inner: _Inner = dataclasses.field(default_factory=_Inner)


@dataclasses.dataclass
class _WithOptionalChild:
    child: Optional[_Inner] = None
    base: int = 1


def _parse(scopes, argv):
    p = ConfigArgumentParser()
    for dest, cls in scopes.items():
        p.add_arguments(cls, dest)
    return p.parse_args(argv)


def test_nested_scopes_and_types():
    ns = _parse(
        {"a": _Outer},
        ["--a.flag", "true", "--a.size", "7", "--a.inner.rate", "0.5"],
    )
    assert ns.a.flag is True
    assert ns.a.size == 7
    assert ns.a.inner.rate == 0.5
    assert ns.a.inner.name == "x"


def test_dash_variants():
    @dataclasses.dataclass
    class D:
        learning_rate: float = 1.0

    ns = _parse({"opt": D}, ["--opt.learning-rate", "3e-4"])
    assert ns.opt.learning_rate == 3e-4


def test_tuple_field_space_and_comma():
    ns = _parse({"a": _Outer}, ["--a.pair", "0.9", "0.98"])
    assert ns.a.pair == (0.9, 0.98)
    ns = _parse({"a": _Outer}, ["--a.pair", "0.9,0.98"])
    assert ns.a.pair == (0.9, 0.98)


def test_optional_dataclass_only_instantiated_when_set():
    ns = _parse({"a": _WithOptionalChild}, [])
    assert ns.a.child is None
    ns = _parse({"a": _WithOptionalChild}, ["--a.child.rate", "2.0"])
    assert ns.a.child is not None and ns.a.child.rate == 2.0


def test_config_path_yaml_overlay(tmp_path):
    cfg_file = tmp_path / "cfg.yaml"
    cfg_file.write_text(
        "a:\n  size: 11\n  inner:\n    name: from_yaml\n"
    )
    # CLI flags win over the file
    ns = _parse(
        {"a": _Outer},
        ["--config_path", str(cfg_file), "--a.inner.name", "from_cli"],
    )
    assert ns.a.size == 11
    assert ns.a.inner.name == "from_cli"


def test_real_task_cfg_flags():
    ns = _parse(
        {"task": TaskTrainCfg},
        [
            "--task.opt.learning_rate", "3e-4",
            "--task.opt.betas", "0.9", "0.98",
            "--task.opt.clip_grad_mode", "norm",
            "--task.num_intervals", "30",
            "--task.dtype", "bfloat16",
            "--task.mesh.fsdp", "2",
            "--task.opt.optimizer-state-dtype", "bfloat16",
        ],
    )
    assert ns.task.opt.betas == (0.9, 0.98)
    assert ns.task.opt.clip_grad_mode == "norm"
    # the bf16-Adam-moments opt-in reaches the optimizer through this flag
    assert ns.task.opt.optimizer_state_dtype == "bfloat16"
    assert ns.task.num_intervals == 30
    assert ns.task.mesh.fsdp == 2


def test_missing_required_field_errors():
    @dataclasses.dataclass
    class R:
        must: str

    with pytest.raises(SystemExit):
        _parse({"r": R}, [])
