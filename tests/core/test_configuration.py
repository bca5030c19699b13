from typing import Any, Dict

import pytest

from smqtk_indexing_tpu.core.configuration import (
    Configurable,
    cls_conf_key,
    configuration_test_helper,
    from_config_dict,
    make_default_config,
    merge_dict,
    to_config_dict,
)


class ExampleConfigurable (Configurable):

    def __init__(self, a: int = 1, b: str = "x", c=None):
        self.a, self.b, self.c = a, b, c

    def get_config(self) -> Dict[str, Any]:
        return {"a": self.a, "b": self.b, "c": self.c}


class TestMergeDict:

    def test_flat_overwrite(self) -> None:
        assert merge_dict({"a": 1}, {"a": 2, "b": 3}) == {"a": 2, "b": 3}

    def test_nested_merge(self) -> None:
        a = {"x": {"y": 1, "z": 2}}
        merge_dict(a, {"x": {"y": 9}})
        assert a == {"x": {"y": 9, "z": 2}}

    def test_returns_target(self) -> None:
        a: Dict = {}
        assert merge_dict(a, {"k": 1}) is a


class TestConfigurable:

    def test_default_config_from_signature(self) -> None:
        assert ExampleConfigurable.get_default_config() == \
            {"a": 1, "b": "x", "c": None}

    def test_from_config_merges_defaults(self) -> None:
        inst = ExampleConfigurable.from_config({"a": 5})
        assert (inst.a, inst.b) == (5, "x")

    def test_from_config_no_merge(self) -> None:
        inst = ExampleConfigurable.from_config(
            {"a": 5, "b": "y", "c": 2}, False)
        assert (inst.a, inst.b, inst.c) == (5, "y", 2)

    def test_round_trip_helper(self) -> None:
        inst = ExampleConfigurable(a=9, b="q", c=[1, 2])
        insts = configuration_test_helper(inst)
        assert len(insts) == 3


class TestPluginConfigBlocks:

    def test_make_default_config_shape(self) -> None:
        cfg = make_default_config([ExampleConfigurable])
        key = cls_conf_key(ExampleConfigurable)
        assert cfg["type"] is None
        assert cfg[key] == {"a": 1, "b": "x", "c": None}

    def test_to_from_config_dict_roundtrip(self) -> None:
        inst = ExampleConfigurable(a=3)
        blob = to_config_dict(inst)
        inst2 = from_config_dict(blob, [ExampleConfigurable])
        assert inst2.get_config() == inst.get_config()

    def test_from_config_dict_missing_type(self) -> None:
        with pytest.raises(ValueError, match="type"):
            from_config_dict({}, [ExampleConfigurable])

    def test_from_config_dict_unknown_type(self) -> None:
        with pytest.raises(ValueError, match="does not match"):
            from_config_dict({"type": "nope.NotAClass"},
                             [ExampleConfigurable])

    def test_from_config_dict_accepts_bare_class_name(self) -> None:
        inst = from_config_dict(
            {"type": "ExampleConfigurable",
             "ExampleConfigurable": {"a": 7}},
            [ExampleConfigurable])
        assert inst.a == 7


class TestPluginDiscovery:

    def test_all_builtin_impls_discoverable(self) -> None:
        from smqtk_indexing_tpu import NearestNeighborsIndex
        nn_names = {c.__name__ for c in NearestNeighborsIndex.get_impls()}
        assert "FlatNearestNeighborsIndex" in nn_names

    def test_interface_not_in_impls(self) -> None:
        from smqtk_indexing_tpu import NearestNeighborsIndex
        assert NearestNeighborsIndex not in \
            NearestNeighborsIndex.get_impls()
