import os

import pytest

from garden_tpu.assets import pack


def test_native_built():
    assert pack.native_available(), "native libgardenpack.so should be built"


def test_pack_roundtrip(tmp_path):
    p = str(tmp_path / "assets.gpk")
    w = pack.PackWriter(p)
    big = b"scene data " * 1000
    w.add("scenes/level1.scene", big)
    w.add("tiny.txt", b"x")
    w.finish()

    r = pack.PackReader(p)
    assert set(r.names()) == {"scenes/level1.scene", "tiny.txt"}
    assert r.read("scenes/level1.scene") == big
    assert r.read("tiny.txt") == b"x"
    with pytest.raises(KeyError):
        r.read("missing")
    r.close()
    # compression actually happened (big is repetitive)
    assert os.path.getsize(p) < len(big) // 2


def test_python_fallback_interop(tmp_path, monkeypatch):
    """Archives written by the Python fallback must read natively and
    vice versa (identical format)."""
    p1 = str(tmp_path / "py.gpk")
    monkeypatch.setattr(pack, "_NATIVE", None)
    w = pack.PackWriter(p1)
    w.add("a/b.bin", bytes(range(256)) * 10)
    w.finish()
    r = pack.PackReader(p1)
    assert r.read("a/b.bin") == bytes(range(256)) * 10
    monkeypatch.undo()
    if pack.native_available():
        r2 = pack.PackReader(p1)
        assert r2.read("a/b.bin") == bytes(range(256)) * 10
        r2.close()
