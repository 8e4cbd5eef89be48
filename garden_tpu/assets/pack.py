"""Pack archive bindings: native C++ reader/writer with a Python fallback.

Rebuild of the cfnptr/pack integration (ResourceSystem reads `pack::Reader`
archives in release builds, include/garden/system/resource.hpp:28-30,
183-189). The hot implementation is native/pack/pack.cpp (C ABI via ctypes,
zlib-compressed, FNV-1a path index); when the shared library hasn't been
built, a pure-Python implementation of the identical format takes over, so
archives are interchangeable between the two.
"""

from __future__ import annotations

import ctypes
import os
import struct
import zlib
from typing import Dict, List, Optional, Tuple

_MAGIC = b"GPK1"
_LIB_PATH = os.path.join(os.path.dirname(__file__), "_native",
                         "libgardenpack.so")


def _fnv1a(name: bytes) -> int:
    h = 1469598103934665603
    for b in name:
        h ^= b
        h = (h * 1099511628211) & 0xFFFFFFFFFFFFFFFF
    return h


def _load_native():
    if not os.path.exists(_LIB_PATH):
        # try a one-shot build (g++ is in the toolchain); fall back quietly
        build = os.path.join(os.path.dirname(__file__), "..", "..",
                             "native", "build.sh")
        if os.path.exists(build):
            import subprocess
            try:
                subprocess.run(["sh", build], capture_output=True, timeout=60)
            except Exception:
                pass
    if not os.path.exists(_LIB_PATH):
        return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None
    lib.gpk_writer_create.restype = ctypes.c_void_p
    lib.gpk_writer_create.argtypes = [ctypes.c_char_p]
    lib.gpk_writer_add.restype = ctypes.c_int
    lib.gpk_writer_add.argtypes = [ctypes.c_void_p, ctypes.c_char_p,
                                   ctypes.c_char_p, ctypes.c_uint64]
    lib.gpk_writer_finish.restype = ctypes.c_int
    lib.gpk_writer_finish.argtypes = [ctypes.c_void_p]
    lib.gpk_reader_open.restype = ctypes.c_void_p
    lib.gpk_reader_open.argtypes = [ctypes.c_char_p]
    lib.gpk_reader_count.restype = ctypes.c_uint32
    lib.gpk_reader_count.argtypes = [ctypes.c_void_p]
    lib.gpk_reader_find.restype = ctypes.c_int
    lib.gpk_reader_find.argtypes = [ctypes.c_void_p, ctypes.c_char_p]
    lib.gpk_reader_item_size.restype = ctypes.c_uint64
    lib.gpk_reader_item_size.argtypes = [ctypes.c_void_p, ctypes.c_int]
    lib.gpk_reader_item_name.restype = ctypes.c_int
    lib.gpk_reader_item_name.argtypes = [ctypes.c_void_p, ctypes.c_int,
                                         ctypes.c_char_p, ctypes.c_uint32]
    lib.gpk_reader_read.restype = ctypes.c_int
    lib.gpk_reader_read.argtypes = [ctypes.c_void_p, ctypes.c_int,
                                    ctypes.c_char_p]
    lib.gpk_reader_close.argtypes = [ctypes.c_void_p]
    return lib


_NATIVE = _load_native()


def native_available() -> bool:
    return _NATIVE is not None


class PackWriter:
    def __init__(self, path: str):
        self.path = path
        if _NATIVE:
            self._w = _NATIVE.gpk_writer_create(path.encode())
            if not self._w:
                raise IOError(f"cannot create {path}")
            self._items = None
        else:
            self._w = None
            self._items: List[Tuple[bytes, bytes]] = []

    def add(self, name: str, data: bytes) -> None:
        if self._w:
            rc = _NATIVE.gpk_writer_add(self._w, name.encode(), data, len(data))
            if rc < 0:
                raise IOError(f"pack add failed: {rc}")
        else:
            self._items.append((name.encode(), data))

    def add_file(self, name: str, path: str) -> None:
        with open(path, "rb") as f:
            self.add(name, f.read())

    def finish(self) -> None:
        if self._w:
            rc = _NATIVE.gpk_writer_finish(self._w)
            self._w = None
            if rc < 0:
                # e.g. index write hit a full disk: the archive is truncated
                raise IOError(f"pack finish failed: {rc}")
            return
        # python fallback: identical format
        with open(self.path, "wb") as f:
            f.write(_MAGIC)
            f.write(struct.pack("<I", len(self._items)))
            index_pos = f.tell()
            f.write(struct.pack("<Q", 0))
            index = []
            for name, data in self._items:
                comp = zlib.compress(data, 6) if len(data) > 64 else data
                compressed = 1 if len(data) > 64 and len(comp) < len(data) else 0
                stored = comp if compressed else data
                offset = f.tell()
                f.write(stored)
                index.append((name, offset, len(stored), len(data), compressed))
            index_offset = f.tell()
            for name, offset, stored, raw, compressed in index:
                f.write(struct.pack("<Q", _fnv1a(name)))
                f.write(struct.pack("<I", len(name)))
                f.write(name)
                f.write(struct.pack("<QQQB", offset, stored, raw, compressed))
            f.seek(index_pos)
            f.write(struct.pack("<Q", index_offset))


class PackReader:
    def __init__(self, path: str):
        self.path = path
        if _NATIVE:
            self._r = _NATIVE.gpk_reader_open(path.encode())
            if not self._r:
                raise IOError(f"cannot open {path}")
            self._index = None
        else:
            self._r = None
            self._index: Dict[str, Tuple[int, int, int, int]] = {}
            with open(path, "rb") as f:
                if f.read(4) != _MAGIC:
                    raise IOError("bad magic")
                (count,) = struct.unpack("<I", f.read(4))
                (index_offset,) = struct.unpack("<Q", f.read(8))
                f.seek(index_offset)
                for _ in range(count):
                    f.read(8)  # hash
                    (n,) = struct.unpack("<I", f.read(4))
                    name = f.read(n).decode()
                    offset, stored, raw, compressed = struct.unpack(
                        "<QQQB", f.read(25))
                    self._index[name] = (offset, stored, raw, compressed)

    def names(self) -> List[str]:
        if self._r:
            out = []
            buf = ctypes.create_string_buffer(4096)
            for i in range(_NATIVE.gpk_reader_count(self._r)):
                if _NATIVE.gpk_reader_item_name(self._r, i, buf, 4096) >= 0:
                    out.append(buf.value.decode())
            return out
        return list(self._index.keys())

    def read(self, name: str) -> bytes:
        if self._r:
            idx = _NATIVE.gpk_reader_find(self._r, name.encode())
            if idx < 0:
                raise KeyError(name)
            size = _NATIVE.gpk_reader_item_size(self._r, idx)
            buf = ctypes.create_string_buffer(int(size))
            rc = _NATIVE.gpk_reader_read(self._r, idx, buf)
            if rc != 0:
                raise IOError(f"pack read failed: {rc}")
            return buf.raw
        if name not in self._index:
            raise KeyError(name)
        offset, stored, raw, compressed = self._index[name]
        with open(self.path, "rb") as f:
            f.seek(offset)
            data = f.read(stored)
        return zlib.decompress(data) if compressed else data

    def close(self) -> None:
        if self._r:
            _NATIVE.gpk_reader_close(self._r)
            self._r = None
