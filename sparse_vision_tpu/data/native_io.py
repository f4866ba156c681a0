"""ctypes bindings + on-demand build for the native shard reader (native/svio.cc).

The native tier of the IO path: a C++ background thread fills a ring of read-ahead
buffers with raw shard payloads (pread loops, no GIL), and Python receives zero-copy
numpy views. Opt-in fast path of ActivationCache (prefetch="native"); everything
degrades to the numpy/memmap path when no C++ toolchain is available.

When to use which (measured): on page-cached data plain memmap is fastest (no copy at
all) — keep the default. The native reader pays one memcpy but keeps COLD reads (real
disk/NFS latency) fully off the Python thread and ahead of compute, which is the
production regime for multi-GB ImageNet activation caches.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Sequence

import numpy as np

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_SRC = os.path.join(_REPO_ROOT, "native", "svio.cc")
_LIB_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "_native")
_LIB = os.path.join(_LIB_DIR, "libsvio.so")

_lib_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_build_failed = False


def build_native(force: bool = False) -> Optional[str]:
    """Compile native/svio.cc to a shared library (cached). Returns the path or None
    when no toolchain / source is available."""
    global _build_failed
    if os.path.exists(_LIB) and not force:
        return _LIB
    if not os.path.exists(_SRC):
        return None
    os.makedirs(_LIB_DIR, exist_ok=True)
    cmd = ["g++", "-O3", "-std=c++17", "-shared", "-fPIC", "-pthread", _SRC, "-o", _LIB]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
    except Exception:
        _build_failed = True
        return None
    return _LIB


def load_native() -> Optional[ctypes.CDLL]:
    global _lib
    with _lib_lock:
        if _lib is not None:
            return _lib
        if _build_failed:
            return None
        path = build_native()
        if path is None:
            return None
        lib = ctypes.CDLL(path)
        lib.sv_reader_create.restype = ctypes.c_void_p
        lib.sv_reader_create.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.POINTER(ctypes.c_long),
            ctypes.POINTER(ctypes.c_long), ctypes.c_int, ctypes.c_int,
        ]
        lib.sv_reader_next.restype = ctypes.POINTER(ctypes.c_char)
        lib.sv_reader_next.argtypes = [ctypes.c_void_p, ctypes.POINTER(ctypes.c_long)]
        lib.sv_reader_release.argtypes = [ctypes.c_void_p]
        lib.sv_reader_error.restype = ctypes.c_char_p
        lib.sv_reader_error.argtypes = [ctypes.c_void_p]
        lib.sv_reader_destroy.argtypes = [ctypes.c_void_p]
        _lib = lib
        return _lib


def npy_payload_offset(path: str) -> tuple[int, tuple, np.dtype, bool]:
    """Byte offset of the raw data inside a .npy file, plus shape/dtype/fortran flag."""
    with open(path, "rb") as f:
        version = np.lib.format.read_magic(f)
        shape, fortran, dtype = np.lib.format._read_array_header(f, version)
        return f.tell(), shape, dtype, bool(fortran)


class NativeShardIterator:
    """Iterate .npy shard payloads as zero-copy numpy views, read ahead natively.

    The view returned by ``__next__`` is only valid until the following ``__next__``
    (the underlying ring buffer is recycled) — consume or copy before advancing, which
    is exactly the device-upload usage pattern.
    """

    def __init__(self, paths: Sequence[str], n_buffers: int = 3):
        lib = load_native()
        if lib is None:
            raise RuntimeError("native svio library unavailable (no g++?)")
        self._lib = lib
        self._meta = [npy_payload_offset(p) for p in paths]
        c_paths = (ctypes.c_char_p * len(paths))(*[p.encode() for p in paths])
        c_off = (ctypes.c_long * len(paths))(*[m[0] for m in self._meta])
        c_nb = (ctypes.c_long * len(paths))(
            *[int(np.prod(m[1])) * m[2].itemsize for m in self._meta]
        )
        self._h = lib.sv_reader_create(c_paths, c_off, c_nb, len(paths), n_buffers)
        self._i = 0
        self._pending_release = False

    def __iter__(self):
        return self

    def __next__(self) -> np.ndarray:
        if self._h is None:
            raise StopIteration
        if self._pending_release:
            self._lib.sv_reader_release(self._h)
            self._pending_release = False
        size = ctypes.c_long()
        ptr = self._lib.sv_reader_next(self._h, ctypes.byref(size))
        if not ptr:
            err = self._lib.sv_reader_error(self._h)
            self.close()
            if err:
                raise IOError(err.decode())
            raise StopIteration
        _, shape, dtype, fortran = self._meta[self._i]
        self._i += 1
        self._pending_release = True
        buf = ctypes.cast(ptr, ctypes.POINTER(ctypes.c_char * size.value)).contents
        return np.frombuffer(buf, dtype=dtype).reshape(shape, order="F" if fortran else "C")

    def close(self):
        if self._h is not None:
            self._lib.sv_reader_destroy(self._h)
            self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
