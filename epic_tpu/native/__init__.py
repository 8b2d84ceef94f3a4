"""ctypes bindings to the native helper library (libepic_native.so).

Replaces the reference's ctypes FFI layer
(/root/reference/libepic/python/epic/epic_harmonic.py) for the host-side
native components. The library is built on demand with ``make`` (g++ only);
if no toolchain is available everything degrades to the pure-NumPy
implementations, mirroring the reference's gpu->cpu graceful fallback
philosophy (harmonic.py:76-102).
"""

from __future__ import annotations

import ctypes as ct
import pathlib
import subprocess

import numpy as np

from ..errors import (
    EpicError,
    InvalidGradientError,
    InvalidLocationError,
    InvalidPathError,
    Result,
)

_DIR = pathlib.Path(__file__).parent
_LIB_PATH = _DIR / "libepic_native.so"
_SRC_PATH = _DIR / "epic_native.cc"
_lib = None
_build_failed = False

_PATH_ERRORS = {
    int(Result.ERROR_INVALID_LOCATION): InvalidLocationError,
    int(Result.ERROR_INVALID_GRADIENT): InvalidGradientError,
    int(Result.ERROR_INVALID_PATH): InvalidPathError,
}


def _build() -> bool:
    try:
        subprocess.run(
            ["make", "-s", "lib"], cwd=_DIR, check=True, capture_output=True
        )
        return _LIB_PATH.exists()
    except (OSError, subprocess.CalledProcessError):
        return False


def _load():
    global _lib, _build_failed
    if _lib is not None:
        return _lib
    if _build_failed:
        return None
    stale = (
        _LIB_PATH.exists()
        and _SRC_PATH.exists()
        and _SRC_PATH.stat().st_mtime > _LIB_PATH.stat().st_mtime
    )
    if (not _LIB_PATH.exists() or stale) and not _build():
        _build_failed = True
        return None
    lib = ct.CDLL(str(_LIB_PATH))

    f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
    f64p = np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS")
    u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")

    lib.epic_path2d_f32.restype = ct.c_int
    lib.epic_path2d_f32.argtypes = [
        f32p, u8p, ct.c_int, ct.c_int,
        ct.c_float, ct.c_float, ct.c_float, ct.c_float,
        ct.c_int, ct.c_int, f32p, ct.c_int, ct.POINTER(ct.c_int),
    ]
    lib.epic_sweep2d_f32.restype = ct.c_int
    lib.epic_sweep2d_f32.argtypes = [
        f32p, u8p, ct.c_int, ct.c_int, ct.c_int, ct.POINTER(ct.c_float)
    ]
    lib.epic_solve2d_f32.restype = ct.c_int
    lib.epic_solve2d_f32.argtypes = [
        f32p, u8p, ct.c_int, ct.c_int, ct.c_float, ct.c_uint, ct.c_uint,
        ct.POINTER(ct.c_uint), ct.POINTER(ct.c_float), ct.POINTER(ct.c_int),
    ]
    lib.epic_sor2d_f32.restype = ct.c_int
    lib.epic_sor2d_f32.argtypes = [
        f32p, u8p, ct.c_int, ct.c_int, ct.c_float, ct.c_float,
        ct.c_uint, ct.POINTER(ct.c_uint),
    ]
    lib.epic_sor2d_f64.restype = ct.c_int
    lib.epic_sor2d_f64.argtypes = [
        f64p, u8p, ct.c_int, ct.c_int, ct.c_double, ct.c_double,
        ct.c_uint, ct.POINTER(ct.c_uint),
    ]
    # long double (x87 80-bit extended on x86-64, np.longdouble): the
    # reference exposes all three precisions through Python
    # (harmonic_legacy_cpu.cpp:36-141, epic_harmonic.py:111-113).
    f80p = np.ctypeslib.ndpointer(np.longdouble, flags="C_CONTIGUOUS")
    lib.epic_sor2d_f80.restype = ct.c_int
    lib.epic_sor2d_f80.argtypes = [
        f80p, u8p, ct.c_int, ct.c_int, ct.c_longdouble, ct.c_longdouble,
        ct.c_uint, ct.POINTER(ct.c_uint),
    ]
    _lib = lib
    return lib


def available() -> bool:
    return _load() is not None


def compute_path(
    u: np.ndarray,
    locked: np.ndarray,
    x: float,
    y: float,
    step_size: float = 0.2,
    cd_precision: float = 0.4,
    max_length: int = 1_000_000,
    mode: str = "reference",
    _cap: int | None = None,
) -> np.ndarray:
    """Native streamline extraction; same contract as epic_tpu.path.compute_path."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native library unavailable")
    u = np.ascontiguousarray(u, dtype=np.float32)
    locked_u8 = np.ascontiguousarray(locked, dtype=np.uint8)
    h, w = u.shape
    # Start with a 4M-point buffer; if the walk legitimately exceeds it, the
    # library reports the true count via code 100 and we retry with an
    # exact-size buffer — the step budget is always the caller's max_length,
    # never the buffer capacity (buffer size must not change the walk).
    # _cap overrides the initial capacity (tests exercise the retry).
    cap = min(max_length, 4_000_000) if _cap is None else _cap
    while True:
        out = np.empty((cap, 2), dtype=np.float32)
        n = ct.c_int(0)
        code = lib.epic_path2d_f32(
            u, locked_u8, h, w,
            float(x), float(y), float(step_size), float(cd_precision),
            int(max_length), {"reference": 0, "bilinear": 1}[mode],
            out.reshape(-1), cap, ct.byref(n),
        )
        if code == 100:  # truncated: n holds the full point count
            cap = int(n.value)
            continue
        break
    if code != 0:
        exc = _PATH_ERRORS.get(code)
        if exc is not None:
            raise exc(f"native path extraction failed at ({x}, {y})")
        raise EpicError(code, "native path extraction failed")
    return out[: n.value].copy()


def sweep_2d(u: np.ndarray, locked: np.ndarray, iteration: int):
    """One scalar red-black sweep (independent C++ oracle). Returns (u, delta)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native library unavailable")
    u = np.ascontiguousarray(u, dtype=np.float32).copy()
    locked_u8 = np.ascontiguousarray(locked, dtype=np.uint8)
    h, w = u.shape
    delta = ct.c_float(0.0)
    code = lib.epic_sweep2d_f32(u, locked_u8, h, w, int(iteration), ct.byref(delta))
    if code != 0:
        raise EpicError(code, "native sweep failed")
    return u, float(delta.value)


def solve_2d(
    u: np.ndarray,
    locked: np.ndarray,
    epsilon: float = 1e-3,
    stagger: int = 100,
    max_iterations: int = 1_000_000,
):
    """Full log-space relaxation to convergence — the native C++ twin of
    ``solver.core.solve`` (harmonic_complete_cpu protocol,
    harmonic_cpu.cpp:136-184).

    Returns ``(u, iterations, delta, converged)``. Iteration counts match the
    JAX solvers exactly; fields to float32 tolerance.
    """
    lib = _load()
    if lib is None:
        raise RuntimeError("native library unavailable")
    u = np.ascontiguousarray(u, dtype=np.float32).copy()
    locked_u8 = np.ascontiguousarray(locked, dtype=np.uint8)
    h, w = u.shape
    iters = ct.c_uint(0)
    delta = ct.c_float(0.0)
    converged = ct.c_int(0)
    code = lib.epic_solve2d_f32(
        u, locked_u8, h, w, float(epsilon), int(stagger), int(max_iterations),
        ct.byref(iters), ct.byref(delta), ct.byref(converged),
    )
    if code != 0:
        raise EpicError(code, "native solve failed")
    return u, int(iters.value), float(delta.value), bool(converged.value)


def legacy_sor_2d(
    u: np.ndarray,
    locked: np.ndarray,
    epsilon: float = 1e-4,
    omega: float = 1.5,
    min_iterations: int = 10_000,
    dtype=np.float64,
):
    """Legacy non-log SOR to convergence (harmonic_legacy_cpu semantics).

    Returns (u, iterations). dtype float32 or float64 selects precision.
    """
    lib = _load()
    if lib is None:
        raise RuntimeError("native library unavailable")
    locked_u8 = np.ascontiguousarray(locked, dtype=np.uint8)
    h, w = u.shape
    iters = ct.c_uint(0)
    if dtype == np.float32:
        u = np.ascontiguousarray(u, dtype=np.float32).copy()
        code = lib.epic_sor2d_f32(
            u, locked_u8, h, w, float(epsilon), float(omega),
            int(min_iterations), ct.byref(iters),
        )
    elif dtype == np.longdouble:
        u = np.ascontiguousarray(u, dtype=np.longdouble).copy()
        code = lib.epic_sor2d_f80(
            u, locked_u8, h, w, np.longdouble(epsilon), np.longdouble(omega),
            int(min_iterations), ct.byref(iters),
        )
    else:
        u = np.ascontiguousarray(u, dtype=np.float64).copy()
        code = lib.epic_sor2d_f64(
            u, locked_u8, h, w, float(epsilon), float(omega),
            int(min_iterations), ct.byref(iters),
        )
    if code != 0:
        raise EpicError(code, "native SOR failed")
    return u, int(iters.value)
