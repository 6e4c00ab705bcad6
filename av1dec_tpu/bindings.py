"""ctypes binding to the native front-half (libav1dec_native.so).

The native library is the host C++ half of the decoder: OBU parsing,
header parsing, and (as it lands) the msac entropy decoder emitting plan
tensors.  Header-level data crosses the boundary as JSON; hot plan data as
packed numpy buffers.
"""

from __future__ import annotations

import ctypes as C
import json
import os
import subprocess
from typing import List, Optional

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "build", "libav1dec_native.so")

_lib = None


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH):
        subprocess.run(["make", "-s"], cwd=_NATIVE_DIR, check=True)
    lib = C.CDLL(_LIB_PATH)
    lib.av1n_create.restype = C.c_void_p
    lib.av1n_destroy.argtypes = [C.c_void_p]
    lib.av1n_parse_tu.restype = C.c_int
    lib.av1n_parse_tu.argtypes = [C.c_void_p, C.c_char_p, C.c_size_t]
    lib.av1n_seq_json.restype = C.c_char_p
    lib.av1n_seq_json.argtypes = [C.c_void_p]
    lib.av1n_frame_json.restype = C.c_char_p
    lib.av1n_frame_json.argtypes = [C.c_void_p, C.c_int]
    _lib = lib
    return lib


def rebuild_native() -> None:
    """Force-rebuild the native library (dev helper)."""
    subprocess.run(["make", "-s"], cwd=_NATIVE_DIR, check=True)
    global _lib
    _lib = None


class NativeParser:
    """Header-level parser handle over the native library."""

    def __init__(self) -> None:
        self._lib = _load()
        self._h = self._lib.av1n_create()

    def parse_tu(self, data: bytes) -> List[dict]:
        """Parse one temporal unit; returns the completed frames' headers."""
        n = self._lib.av1n_parse_tu(self._h, data, len(data))
        if n < 0:
            raise ValueError(f"native parse error rc={n}")
        out = []
        for i in range(n):
            out.append(json.loads(self._lib.av1n_frame_json(self._h, i)))
        return out

    @property
    def seq(self) -> Optional[dict]:
        s = self._lib.av1n_seq_json(self._h)
        return json.loads(s) if s else None

    def close(self) -> None:
        if self._h:
            self._lib.av1n_destroy(self._h)
            self._h = None

    def __del__(self):  # pragma: no cover
        try:
            self.close()
        except Exception:
            pass
