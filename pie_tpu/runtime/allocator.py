"""ctypes binding to the C++ sharded page allocator (native/), with a pure
Python fallback when the shared library is unavailable.

Reference parity: pie_core PageAllocator
(reference include/engine/page_allocator.hpp:17-72) exposed to Python — the
reference bound its core via nanobind (src/bindings.cpp) but only ever
exposed ``hello()``; here the allocator is fully usable from the scheduler.
"""

from __future__ import annotations

import ctypes
import logging
import subprocess
import threading
from pathlib import Path
from typing import Optional

logger = logging.getLogger(__name__)

TOKENS_PER_PAGE = 64  # must match native kTokensPerPage / reference page.hpp:14

_NATIVE_DIR = Path(__file__).resolve().parents[2] / "native"
_LIB_PATHS = [
    _NATIVE_DIR / "build" / "libpie_runtime.so",
    Path(__file__).parent / "libpie_runtime.so",
]

_lib = None
_lib_lock = threading.Lock()


def _try_build() -> Optional[Path]:
    try:
        subprocess.run(
            ["cmake", "-B", "build", "-G", "Ninja"],
            cwd=_NATIVE_DIR, check=True, capture_output=True, timeout=120,
        )
        subprocess.run(
            ["ninja", "-C", "build", "pie_runtime"],
            cwd=_NATIVE_DIR, check=True, capture_output=True, timeout=300,
        )
        p = _NATIVE_DIR / "build" / "libpie_runtime.so"
        return p if p.exists() else None
    except Exception as e:  # pragma: no cover
        logger.warning("native build failed: %s", e)
        return None


def load_native():
    """Load (building if needed) the native library; None if unavailable."""
    global _lib
    with _lib_lock:
        if _lib is not None:
            return _lib
        path = next((p for p in _LIB_PATHS if p.exists()), None)
        if path is None and _NATIVE_DIR.exists():
            path = _try_build()
        if path is None:
            return None
        lib = ctypes.CDLL(str(path))
        lib.pie_alloc_create.restype = ctypes.c_void_p
        lib.pie_alloc_create.argtypes = [ctypes.c_uint32, ctypes.c_uint32]
        lib.pie_alloc_destroy.argtypes = [ctypes.c_void_p]
        lib.pie_alloc_allocate.restype = ctypes.c_int64
        lib.pie_alloc_allocate.argtypes = [ctypes.c_void_p]
        lib.pie_alloc_allocate_n.restype = ctypes.c_int64
        lib.pie_alloc_allocate_n.argtypes = [
            ctypes.c_void_p, ctypes.c_uint32, ctypes.POINTER(ctypes.c_int64),
        ]
        lib.pie_alloc_free.restype = ctypes.c_int32
        lib.pie_alloc_free.argtypes = [ctypes.c_void_p, ctypes.c_uint32]
        lib.pie_alloc_add_ref.restype = ctypes.c_int32
        lib.pie_alloc_add_ref.argtypes = [ctypes.c_void_p, ctypes.c_uint32]
        lib.pie_alloc_ref_count.restype = ctypes.c_uint32
        lib.pie_alloc_ref_count.argtypes = [ctypes.c_void_p, ctypes.c_uint32]
        lib.pie_alloc_num_free.restype = ctypes.c_uint32
        lib.pie_alloc_num_free.argtypes = [ctypes.c_void_p]
        lib.pie_alloc_num_pages.restype = ctypes.c_uint32
        lib.pie_alloc_num_pages.argtypes = [ctypes.c_void_p]
        _lib = lib
        return _lib


class _PyAllocator:
    """Pure-Python fallback (functionally identical, GIL-serialized)."""

    def __init__(self, num_pages: int):
        self.free_list = list(range(num_pages - 1, -1, -1))
        self.refs = [0] * num_pages
        self.n = num_pages
        self.lock = threading.Lock()

    def allocate(self) -> int:
        with self.lock:
            if not self.free_list:
                return -1
            pid = self.free_list.pop()
            self.refs[pid] = 1
            return pid

    def free(self, pid: int):
        with self.lock:
            if self.refs[pid] <= 0:
                raise ValueError("free of unallocated page")
            self.refs[pid] -= 1
            if self.refs[pid] == 0:
                self.free_list.append(pid)

    def add_ref(self, pid: int):
        with self.lock:
            if self.refs[pid] <= 0:
                raise ValueError("add_ref of free page")
            self.refs[pid] += 1

    def ref_count(self, pid: int) -> int:
        return self.refs[pid]

    def num_free(self) -> int:
        return len(self.free_list)


class PageAllocator:
    """Refcounted page-id allocator backed by the native C++ library."""

    def __init__(self, num_pages: int, num_shards: int = 0, native: bool = True):
        self.num_pages = num_pages
        self._h = None
        self._py: Optional[_PyAllocator] = None
        lib = load_native() if native else None
        if lib is not None:
            self._lib = lib
            self._h = ctypes.c_void_p(lib.pie_alloc_create(num_pages, num_shards))
            if not self._h:
                raise MemoryError("failed to create native allocator")
        else:
            self._py = _PyAllocator(num_pages)

    @property
    def is_native(self) -> bool:
        return self._h is not None

    def allocate(self) -> int:
        """Returns page id or -1 on exhaustion."""
        if self._py is not None:
            return self._py.allocate()
        return self._lib.pie_alloc_allocate(self._h)

    def allocate_n(self, n: int) -> list[int]:
        """Allocate up to n pages; rolls back (frees) on partial failure and
        returns [] so callers get all-or-nothing semantics."""
        if self._py is not None:
            out = []
            for _ in range(n):
                pid = self._py.allocate()
                if pid < 0:
                    for p in out:
                        self._py.free(p)
                    return []
                out.append(pid)
            return out
        buf = (ctypes.c_int64 * n)()
        got = self._lib.pie_alloc_allocate_n(self._h, n, buf)
        if got < n:
            for i in range(got):
                self._lib.pie_alloc_free(self._h, buf[i])
            return []
        return list(buf[:n])

    def free(self, page_id: int):
        if self._py is not None:
            self._py.free(page_id)
            return
        if self._lib.pie_alloc_free(self._h, page_id) != 0:
            raise ValueError(f"bad free of page {page_id}")

    def add_ref(self, page_id: int):
        if self._py is not None:
            self._py.add_ref(page_id)
            return
        if self._lib.pie_alloc_add_ref(self._h, page_id) != 0:
            raise ValueError(f"bad add_ref of page {page_id}")

    def ref_count(self, page_id: int) -> int:
        if self._py is not None:
            return self._py.ref_count(page_id)
        return self._lib.pie_alloc_ref_count(self._h, page_id)

    def num_free(self) -> int:
        if self._py is not None:
            return self._py.num_free()
        return self._lib.pie_alloc_num_free(self._h)

    def __del__(self):
        h = getattr(self, "_h", None)
        if h:
            self._lib.pie_alloc_destroy(h)
            self._h = None
