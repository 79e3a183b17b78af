"""ctypes bindings for the C++ host runtime (cpp/mlc_host).

Builds libmlc_host.so on first use (cmake+ninja or direct g++) and
caches it under cpp/build/. All callers degrade gracefully to the
pure-Python implementations when no toolchain is available.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import List, Optional

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_CPP = os.path.join(_REPO, "cpp")
_BUILD = os.path.join(_CPP, "build")
_LIB = os.path.join(_BUILD, "libmlc_host.so")

_lib: Optional[ctypes.CDLL] = None
_tried = False

_STYLE_IDS = {"single": 0, "two": 1, "dolly": 2, "oasst": 3, "moss": 4}


def _build() -> bool:
    os.makedirs(_BUILD, exist_ok=True)
    srcs = [
        os.path.join(_CPP, "mlc_host", "conversation.cc"),
        os.path.join(_CPP, "mlc_host", "ckpt_loader.cc"),
    ]
    # direct g++ is faster and dependency-free; cmake stays the
    # canonical build for packaging
    cmd = ["g++", "-O2", "-std=c++17", "-shared", "-fPIC", "-pthread",
           "-o", _LIB, *srcs]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=300)
        return True
    except Exception:
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None:
        return _lib
    if _tried:
        return None
    _tried = True
    if not os.path.exists(_LIB):
        if not _build():
            return None
    elif any(
        os.path.getmtime(os.path.join(_CPP, "mlc_host", f)) > os.path.getmtime(_LIB)
        for f in os.listdir(os.path.join(_CPP, "mlc_host"))
    ):
        _build()
    try:
        lib = ctypes.CDLL(_LIB)
    except OSError:
        return None
    lib.mlc_conv_create.restype = ctypes.c_void_p
    lib.mlc_conv_create.argtypes = [ctypes.c_char_p] * 3 + [ctypes.c_int32] + [ctypes.c_char_p] * 2
    lib.mlc_conv_destroy.argtypes = [ctypes.c_void_p]
    lib.mlc_conv_append.argtypes = [ctypes.c_void_p, ctypes.c_int32, ctypes.c_char_p]
    lib.mlc_conv_update_last.argtypes = [ctypes.c_void_p, ctypes.c_char_p]
    lib.mlc_conv_set_offset.argtypes = [ctypes.c_void_p, ctypes.c_int32]
    lib.mlc_conv_reset.argtypes = [ctypes.c_void_p]
    lib.mlc_conv_get_prompt.restype = ctypes.c_char_p
    lib.mlc_conv_get_prompt.argtypes = [ctypes.c_void_p]
    lib.mlc_conv_get_prompt_unprocessed.restype = ctypes.c_char_p
    lib.mlc_conv_get_prompt_unprocessed.argtypes = [ctypes.c_void_p]
    lib.mlc_utf8_safe_prefix.restype = ctypes.c_int64
    lib.mlc_utf8_safe_prefix.argtypes = [ctypes.c_char_p, ctypes.c_int64]
    lib.mlc_find_stop.restype = ctypes.c_int64
    lib.mlc_find_stop.argtypes = [
        ctypes.c_char_p, ctypes.c_int64, ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_int64),
    ]
    lib.mlc_load_file.restype = ctypes.c_int64
    lib.mlc_load_file.argtypes = [ctypes.c_char_p, ctypes.c_void_p, ctypes.c_int64]
    lib.mlc_load_files.restype = ctypes.c_int64
    lib.mlc_load_files.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.POINTER(ctypes.c_void_p),
        ctypes.POINTER(ctypes.c_int64), ctypes.c_int64, ctypes.c_int64,
    ]
    _lib = lib
    return lib


class NativeConversation:
    """C++-backed conversation engine with the Python Conversation's
    rendering contract (used by tests to pin C++/Python parity, and by
    the session layer when the native lib is present)."""

    def __init__(self, system: str, roles, style: str, sep: str,
                 sep2: Optional[str], offset: int = 0):
        lib = get_lib()
        if lib is None:
            raise RuntimeError("native library unavailable")
        self._lib = lib
        self._h = lib.mlc_conv_create(
            system.encode(), roles[0].encode(), roles[1].encode(),
            _STYLE_IDS[style], sep.encode(),
            (sep2 or "").encode(),
        )
        lib.mlc_conv_set_offset(self._h, offset)
        self._roles = tuple(roles)

    def __del__(self):
        try:
            self._lib.mlc_conv_destroy(self._h)
        except Exception:
            pass

    def append(self, role: str, message: Optional[str]) -> None:
        idx = self._roles.index(role)
        self._lib.mlc_conv_append(
            self._h, idx, None if message is None else message.encode()
        )

    def update_last(self, message: str) -> None:
        self._lib.mlc_conv_update_last(self._h, message.encode())

    def reset(self) -> None:
        self._lib.mlc_conv_reset(self._h)

    def get_prompt(self) -> str:
        return self._lib.mlc_conv_get_prompt(self._h).decode()

    def get_prompt_unprocessed(self) -> str:
        return self._lib.mlc_conv_get_prompt_unprocessed(self._h).decode()


def utf8_safe_prefix(data: bytes) -> int:
    lib = get_lib()
    if lib is None:
        raise RuntimeError("native library unavailable")
    return lib.mlc_utf8_safe_prefix(data, len(data))


def find_stop(text: bytes, stop: bytes):
    """Returns (position-or-minus-1, holdback_bytes)."""
    lib = get_lib()
    if lib is None:
        raise RuntimeError("native library unavailable")
    hold = ctypes.c_int64(0)
    pos = lib.mlc_find_stop(text, len(text), stop, ctypes.byref(hold))
    return pos, hold.value


def load_files_parallel(paths: List[str], buffers, num_threads: int = 8) -> None:
    """Fill pre-allocated writable buffers (e.g. np.empty arrays) from
    files, in parallel."""
    lib = get_lib()
    if lib is None:
        raise RuntimeError("native library unavailable")
    n = len(paths)
    c_paths = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    c_dsts = (ctypes.c_void_p * n)(
        *[b.ctypes.data if hasattr(b, "ctypes") else ctypes.addressof(b) for b in buffers]
    )
    c_sizes = (ctypes.c_int64 * n)(
        *[b.nbytes if hasattr(b, "nbytes") else len(b) for b in buffers]
    )
    rc = lib.mlc_load_files(c_paths, c_dsts, c_sizes, n, num_threads)
    if rc != 0:
        raise IOError(f"failed loading shard {paths[rc - 1]!r}")


def available() -> bool:
    return get_lib() is not None
