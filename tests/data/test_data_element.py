"""Data element (byte-blob persistence) tests."""
import os

import pytest

from smqtk_indexing_tpu.data.data_element import (
    DataElement, DataFileElement, DataMemoryElement, from_uri,
)
from smqtk_indexing_tpu.data.exceptions import ReadOnlyError


class TestDataMemoryElement:
    def test_plugin_discoverable(self):
        assert DataMemoryElement in DataElement.get_impls()

    def test_empty_by_default(self):
        e = DataMemoryElement()
        assert e.is_empty()
        assert e.get_bytes() == b""

    def test_set_get(self):
        e = DataMemoryElement()
        e.set_bytes(b"abc")
        assert not e.is_empty()
        assert e.get_bytes() == b"abc"

    def test_readonly(self):
        e = DataMemoryElement(bytes=b"x", readonly=True)
        assert e.is_read_only()
        with pytest.raises(ReadOnlyError):
            e.set_bytes(b"y")
        assert e.get_bytes() == b"x"

    def test_config_roundtrip_binary_content(self):
        e = DataMemoryElement(bytes=bytes(range(256)))
        e2 = DataMemoryElement.from_config(e.get_config())
        assert e2.get_bytes() == e.get_bytes()


class TestDataFileElement:
    def test_write_read(self, tmp_path):
        p = str(tmp_path / "blob.bin")
        e = DataFileElement(p)
        assert e.is_empty()
        e.set_bytes(b"\x00\x01\x02")
        assert DataFileElement(p).get_bytes() == b"\x00\x01\x02"

    def test_readonly_flag(self, tmp_path):
        p = str(tmp_path / "blob.bin")
        DataFileElement(p).set_bytes(b"x")
        ro = DataFileElement(p, readonly=True)
        assert ro.is_read_only()
        with pytest.raises(ReadOnlyError):
            ro.set_bytes(b"y")

    def test_missing_file_empty(self, tmp_path):
        e = DataFileElement(str(tmp_path / "nope.bin"))
        assert e.is_empty()
        assert e.get_bytes() == b""


def test_from_uri(tmp_path):
    p = str(tmp_path / "x.bin")
    e = from_uri(f"file://{p}")
    e.set_bytes(b"hello")
    assert from_uri(p).get_bytes() == b"hello"
