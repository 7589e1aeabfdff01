"""ctypes bindings to the native C++ runtime library (native/*.cpp).

Builds lazily with g++ on first use and caches the .so; every consumer
falls back to the pure-python path when the toolchain or build is
unavailable, so the framework never hard-depends on the native layer.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_SRC = os.path.join(_REPO_ROOT, "native", "prefhetch_native.cpp")
_BUILD_DIR = os.path.join(_REPO_ROOT, "native", "build")
_SO = os.path.join(_BUILD_DIR, "libprefhetch_native.so")
_STAMP = _SO + ".src.sha256"

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _src_hash() -> str:
    import hashlib

    with open(_SRC, "rb") as f:
        return hashlib.sha256(f.read()).hexdigest()


def _build(src_hash: str) -> bool:
    os.makedirs(_BUILD_DIR, exist_ok=True)
    cmd = [
        "g++", "-O3", "-march=native", "-std=c++17", "-shared", "-fPIC",
        "-pthread", _SRC, "-o", _SO,
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
    except (subprocess.SubprocessError, FileNotFoundError):
        return False
    with open(_STAMP, "w") as f:
        f.write(src_hash)
    return True


def get_lib() -> Optional[ctypes.CDLL]:
    """The loaded native library, or None if unavailable.

    Rebuilds when the source hash differs from the stamp written at build
    time — never loads a .so this machine didn't build (the .so is
    gitignored; a stale/foreign binary has no matching stamp)."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        src_hash = _src_hash()
        stamp = None
        if os.path.exists(_STAMP):
            with open(_STAMP) as f:
                stamp = f.read().strip()
        if not os.path.exists(_SO) or stamp != src_hash:
            if not _build(src_hash):
                return None
        try:
            lib = ctypes.CDLL(_SO)
        except OSError:
            return None
        i64 = ctypes.c_int64
        lib.pfh_vecs_header.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(i64), ctypes.POINTER(i64)
        ]
        lib.pfh_vecs_header.restype = ctypes.c_int
        lib.pfh_vecs_read.argtypes = [
            ctypes.c_char_p, ctypes.c_void_p, i64, i64
        ]
        lib.pfh_vecs_read.restype = ctypes.c_int
        lib.pfh_json_encode_f32.argtypes = [
            ctypes.c_void_p, i64, ctypes.c_char_p, i64
        ]
        lib.pfh_json_encode_f32.restype = i64
        lib.pfh_json_encode_i64.argtypes = [
            ctypes.c_void_p, i64, ctypes.c_char_p, i64
        ]
        lib.pfh_json_encode_i64.restype = i64
        lib.pfh_json_decode_f64.argtypes = [
            ctypes.c_char_p, i64, ctypes.c_void_p, i64
        ]
        lib.pfh_json_decode_f64.restype = i64
        lib.pfh_ntt_batch.argtypes = [
            ctypes.c_void_p, i64, i64, i64,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int, ctypes.c_int,
        ]
        lib.pfh_ntt_batch.restype = None
        _lib = lib
        return _lib


def available() -> bool:
    return get_lib() is not None


# ---------------------------------------------------------------------------
def read_vecs_native(path: str, dtype) -> Optional[np.ndarray]:
    """Native fvecs/ivecs read; None if the library is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    d = ctypes.c_int64()
    n = ctypes.c_int64()
    rc = lib.pfh_vecs_header(path.encode(), ctypes.byref(d), ctypes.byref(n))
    if rc != 0:
        raise ValueError(f"{path}: native header error {rc}")
    out = np.empty((n.value, d.value), dtype=dtype)
    rc = lib.pfh_vecs_read(
        path.encode(), out.ctypes.data_as(ctypes.c_void_p), n.value, d.value
    )
    if rc != 0:
        raise ValueError(f"{path}: native read error {rc}")
    return out


def json_encode_f32(x: np.ndarray) -> Optional[bytes]:
    """Flat float array → JSON array bytes (f32 round-trip precision)."""
    lib = get_lib()
    if lib is None:
        return None
    x = np.ascontiguousarray(x, np.float32)
    cap = x.size * 26 + 32
    buf = ctypes.create_string_buffer(cap)
    n = lib.pfh_json_encode_f32(
        x.ctypes.data_as(ctypes.c_void_p), x.size, buf, cap
    )
    if n < 0:
        return None
    return buf.raw[:n]


def json_encode_i64(x: np.ndarray) -> Optional[bytes]:
    lib = get_lib()
    if lib is None:
        return None
    x = np.ascontiguousarray(x, np.int64)
    cap = x.size * 26 + 32
    buf = ctypes.create_string_buffer(cap)
    n = lib.pfh_json_encode_i64(
        x.ctypes.data_as(ctypes.c_void_p), x.size, buf, cap
    )
    if n < 0:
        return None
    return buf.raw[:n]


def json_encode_f32_nested(x: np.ndarray) -> Optional[bytes]:
    """N-D float array → nested JSON array bytes: the trailing axis is
    encoded natively per row, outer axes become JSON nesting."""
    lib = get_lib()
    if lib is None:
        return None
    x = np.ascontiguousarray(x, np.float32)
    if x.ndim == 1:
        return json_encode_f32(x)
    rows = [json_encode_f32_nested(r) for r in x]
    if any(r is None for r in rows):
        return None
    return b"[" + b",".join(rows) + b"]"


def json_decode_array(buf: bytes, start: int = 0) -> Optional[np.ndarray]:
    """Decode the JSON number array beginning at buf[start] ('[...]') into
    float64. None if the library is unavailable or the input is malformed."""
    lib = get_lib()
    if lib is None:
        return None
    seg = buf[start:]
    # every element costs ≥2 bytes (digit + separator) → safe count bound
    cap = len(seg) // 2 + 2
    out = np.empty(cap, np.float64)
    n = lib.pfh_json_decode_f64(
        seg, len(seg), out.ctypes.data_as(ctypes.c_void_p), cap
    )
    if n < 0:
        return None
    return out[:n]


def json_decode_field(body: bytes, key: str) -> Optional[np.ndarray]:
    """Decode the flat JSON number array at `"key": [...]` inside a JSON
    object body, without parsing the rest of the object. None when the key
    is absent, the library is unavailable, or the structure is unexpected
    (callers fall back to stdlib json)."""
    marker = b'"' + key.encode() + b'"'
    pos = body.find(marker)
    if pos < 0:
        return None
    pos = body.find(b":", pos + len(marker))
    if pos < 0:
        return None
    pos += 1
    while pos < len(body) and body[pos : pos + 1] in b" \t\r\n":
        pos += 1
    if pos >= len(body) or body[pos : pos + 1] != b"[":
        return None
    return json_decode_array(body, pos)


class NativeNTT:
    """Shoup-multiplication negacyclic NTT (threaded) for one prime."""

    def __init__(self, q: int, n: int, inverse: bool = False):
        from prefhetch_tpu.crypto.ntt import build_tables

        self.q, self.n, self.inverse = q, n, inverse
        tb = build_tables(q, n)
        tws = tb.stage_itw if inverse else tb.stage_tw
        tw = np.concatenate(tws)
        psi = tb.ipsi_pows if inverse else tb.psi_pows

        def shoup(a):
            return np.array([(int(v) << 64) // q for v in a], np.uint64).astype(
                np.int64
            )

        self.tw = np.ascontiguousarray(tw, np.int64)
        self.tw_sh = shoup(tw)
        self.psi = np.ascontiguousarray(psi, np.int64)
        self.psi_sh = shoup(psi)
        self.bitrev = np.ascontiguousarray(tb.bitrev, np.int64)

    def __call__(self, x: np.ndarray, n_threads: int | None = None) -> np.ndarray:
        if n_threads is None:
            n_threads = min(4, os.cpu_count() or 1)
        lib = get_lib()
        assert lib is not None
        x = np.ascontiguousarray(x.reshape(-1, self.n), np.int64).copy()
        lib.pfh_ntt_batch(
            x.ctypes.data_as(ctypes.c_void_p), x.shape[0], self.n, self.q,
            self.psi.ctypes.data_as(ctypes.c_void_p),
            self.psi_sh.ctypes.data_as(ctypes.c_void_p),
            self.tw.ctypes.data_as(ctypes.c_void_p),
            self.tw_sh.ctypes.data_as(ctypes.c_void_p),
            self.bitrev.ctypes.data_as(ctypes.c_void_p),
            0 if self.inverse else 1,   # twist_first: fwd twists before
            n_threads,
        )
        return x


# ---------------------------------------------------------------------------
# epoll HTTP frontend (native/pfh_http.cpp) — built as its own .so so the
# codec library never links socket/thread machinery it doesn't need
# ---------------------------------------------------------------------------
_HTTP_SRC = os.path.join(_REPO_ROOT, "native", "pfh_http.cpp")
_HTTP_SO = os.path.join(_BUILD_DIR, "libpfh_http.so")
_HTTP_STAMP = _HTTP_SO + ".src.sha256"

_http_lock = threading.Lock()
_http_lib: Optional[ctypes.CDLL] = None
_http_tried = False

_PATH_MAX = 120   # keep in sync with pfh_http.cpp kPathMax


class ReqDesc(ctypes.Structure):
    """Mirror of pfh_http.cpp ReqDesc."""

    _fields_ = [
        ("req_id", ctypes.c_uint64),
        ("body", ctypes.POINTER(ctypes.c_uint8)),
        ("body_len", ctypes.c_uint64),
        ("method", ctypes.c_char * 8),
        ("path", ctypes.c_char * _PATH_MAX),
        ("flags", ctypes.c_uint8),
    ]


def get_http_lib() -> Optional[ctypes.CDLL]:
    """The epoll-frontend library, lazily built; None if unavailable."""
    global _http_lib, _http_tried
    with _http_lock:
        if _http_lib is not None or _http_tried:
            return _http_lib
        _http_tried = True
        import hashlib

        with open(_HTTP_SRC, "rb") as f:
            src_hash = hashlib.sha256(f.read()).hexdigest()
        stamp = None
        if os.path.exists(_HTTP_STAMP):
            with open(_HTTP_STAMP) as f:
                stamp = f.read().strip()
        if not os.path.exists(_HTTP_SO) or stamp != src_hash:
            os.makedirs(_BUILD_DIR, exist_ok=True)
            cmd = [
                "g++", "-O3", "-march=native", "-std=c++17", "-shared",
                "-fPIC", "-pthread", _HTTP_SRC, "-o", _HTTP_SO,
            ]
            try:
                subprocess.run(cmd, check=True, capture_output=True,
                               timeout=120)
            except (subprocess.SubprocessError, FileNotFoundError):
                return None
            with open(_HTTP_STAMP, "w") as f:
                f.write(src_hash)
        try:
            lib = ctypes.CDLL(_HTTP_SO)
        except OSError:
            return None
        lib.pfh_http_start.argtypes = [ctypes.c_uint16, ctypes.c_int]
        lib.pfh_http_start.restype = ctypes.c_void_p
        lib.pfh_http_poll.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ReqDesc), ctypes.c_int,
            ctypes.c_int64, ctypes.c_int64,
        ]
        lib.pfh_http_poll.restype = ctypes.c_int
        lib.pfh_http_respond.argtypes = [
            ctypes.c_void_p, ctypes.c_uint64, ctypes.c_int, ctypes.c_int,
            ctypes.c_char_p, ctypes.c_uint64,
        ]
        lib.pfh_http_respond.restype = None
        lib.pfh_http_respond_multi.argtypes = [
            ctypes.c_void_p, ctypes.c_int, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_int, ctypes.c_void_p, ctypes.c_void_p,
        ]
        lib.pfh_http_respond_multi.restype = None
        lib.pfh_http_port.argtypes = [ctypes.c_void_p]
        lib.pfh_http_port.restype = ctypes.c_uint16
        lib.pfh_http_stop.argtypes = [ctypes.c_void_p]
        lib.pfh_http_stop.restype = None
        _http_lib = lib
        return _http_lib
