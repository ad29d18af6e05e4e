"""ctypes binding to the native host runtime (cpp/ → libsparsifyme.so).

The reference's host layer is header-only C++ (`include/sparsify.me/util`,
`containers` — SURVEY.md C4/C5); ours is a compiled C++ library exposing a
C ABI (capi.h), loaded here via ctypes (pybind11 is not in the image).
Everything degrades gracefully: if the library isn't built, `available()`
is False and callers fall back to the pure-JAX/NumPy paths.

Build: ``cmake -S cpp -B cpp/build -G Ninja && cmake --build cpp/build``
"""

from __future__ import annotations

import ctypes
import functools
import os
from typing import List, Optional, Tuple

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_CANDIDATES = (
    os.path.join(_REPO, "cpp", "build", "libsparsifyme.so"),
    os.path.join(_REPO, "libsparsifyme.so"),
)


@functools.lru_cache(maxsize=1)
def _lib() -> Optional[ctypes.CDLL]:
    path = os.environ.get("SPARSIFYME_NATIVE_LIB")
    paths = (path,) if path else _CANDIDATES
    for p in paths:
        if p and os.path.exists(p):
            lib = ctypes.CDLL(p)
            _declare(lib)
            return lib
    return None


def _declare(lib: ctypes.CDLL) -> None:
    c_f32p = ctypes.POINTER(ctypes.c_float)
    c_u8p = ctypes.POINTER(ctypes.c_uint8)
    c_i32p = ctypes.POINTER(ctypes.c_int32)
    c_i64p = ctypes.POINTER(ctypes.c_int64)
    i64 = ctypes.c_int64
    lib.sm_abi_version.restype = ctypes.c_int
    lib.sm_now_ms.restype = ctypes.c_double
    lib.sm_read_shapes.restype = ctypes.c_long
    lib.sm_read_shapes.argtypes = [ctypes.c_char_p, c_i64p, ctypes.c_long]
    lib.sm_prune_nm_f32.argtypes = [
        c_f32p, i64, i64, ctypes.c_int, ctypes.c_int, c_f32p, c_u8p,
    ]
    lib.sm_prune_check_nm_f32.restype = ctypes.c_int
    lib.sm_prune_check_nm_f32.argtypes = [
        c_f32p, i64, i64, ctypes.c_int, ctypes.c_int,
    ]
    lib.sm_compress_24_f32.argtypes = [c_f32p, i64, i64, c_f32p, c_f32p,
                                       c_u8p]
    lib.sm_decompress_24_f32.argtypes = [c_f32p, c_f32p, c_u8p, i64, i64,
                                         c_f32p]
    lib.sm_pack_codes.argtypes = [c_u8p, i64, c_u8p]
    lib.sm_unpack_codes.argtypes = [c_u8p, i64, c_u8p]
    lib.sm_prune_block_f32.argtypes = [
        c_f32p, i64, i64, ctypes.c_int, ctypes.c_int, ctypes.c_float,
        c_f32p, c_u8p,
    ]
    lib.sm_ell_from_dense_f32.argtypes = [
        c_f32p, i64, i64, ctypes.c_int, ctypes.c_int, c_f32p, c_i32p,
    ]


def available() -> bool:
    return _lib() is not None


def _fp(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def _u8(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


def now_ms() -> float:
    return _lib().sm_now_ms()


def read_shapes(path: str, max_rows: int = 4096) -> List[Tuple[int, ...]]:
    """Native shapes-CSV reader (`util::read_shapes`, util/util.hxx:36-61)."""
    out = np.zeros((max_rows, 4), np.int64)
    n = _lib().sm_read_shapes(
        path.encode(), out.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        max_rows,
    )
    if n < 0:
        raise FileNotFoundError(path)
    return [tuple(int(x) for x in row) for row in out[:n]]


def prune_nm(w: np.ndarray, n: int = 2, m: int = 4):
    w = np.ascontiguousarray(w, np.float32)
    rows, cols = w.shape
    pruned = np.empty_like(w)
    mask = np.empty((rows, cols), np.uint8)
    _lib().sm_prune_nm_f32(_fp(w), rows, cols, n, m, _fp(pruned), _u8(mask))
    return pruned, mask


def prune_check_nm(w: np.ndarray, n: int = 2, m: int = 4) -> bool:
    w = np.ascontiguousarray(w, np.float32)
    rows, cols = w.shape
    return bool(_lib().sm_prune_check_nm_f32(_fp(w), rows, cols, n, m))


def compress_24(w: np.ndarray):
    w = np.ascontiguousarray(w, np.float32)
    rows, cols = w.shape
    k4 = (cols + 3) // 4
    v0 = np.empty((rows, k4), np.float32)
    v1 = np.empty((rows, k4), np.float32)
    codes = np.empty((rows, k4), np.uint8)
    _lib().sm_compress_24_f32(_fp(w), rows, cols, _fp(v0), _fp(v1),
                              _u8(codes))
    return v0, v1, codes


def decompress_24(v0, v1, codes, cols: int) -> np.ndarray:
    v0 = np.ascontiguousarray(v0, np.float32)
    v1 = np.ascontiguousarray(v1, np.float32)
    codes = np.ascontiguousarray(codes, np.uint8)
    rows = v0.shape[0]
    w = np.empty((rows, cols), np.float32)
    _lib().sm_decompress_24_f32(_fp(v0), _fp(v1), _u8(codes), rows, cols,
                                _fp(w))
    return w


def pack_codes(codes: np.ndarray) -> np.ndarray:
    codes = np.ascontiguousarray(codes, np.uint8)
    flat = codes.reshape(-1)
    packed = np.empty((flat.size + 1) // 2, np.uint8)
    _lib().sm_pack_codes(_u8(flat), flat.size, _u8(packed))
    return packed


def unpack_codes(packed: np.ndarray, n: int) -> np.ndarray:
    packed = np.ascontiguousarray(packed, np.uint8)
    codes = np.empty(n, np.uint8)
    _lib().sm_unpack_codes(_u8(packed), n, _u8(codes))
    return codes


def prune_block(w: np.ndarray, block=(2, 2), sparsity: float = 0.5):
    w = np.ascontiguousarray(w, np.float32)
    rows, cols = w.shape
    pruned = np.empty_like(w)
    mask = np.empty((rows, cols), np.uint8)
    _lib().sm_prune_block_f32(_fp(w), rows, cols, block[0], block[1],
                              sparsity, _fp(pruned), _u8(mask))
    return pruned, mask


def ell_from_dense(w: np.ndarray, block_size: int, ell_blocks: int):
    w = np.ascontiguousarray(w, np.float32)
    rows, cols = w.shape
    values = np.empty((rows, ell_blocks * block_size), np.float32)
    col_indices = np.empty((rows // block_size, ell_blocks), np.int32)
    _lib().sm_ell_from_dense_f32(
        _fp(w), rows, cols, block_size, ell_blocks, _fp(values),
        col_indices.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    )
    return values, col_indices
