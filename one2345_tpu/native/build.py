"""Build + load the native (C++) components via ctypes.

The shared library is compiled on first use with g++ -O3 and cached next to
the sources; loading falls back gracefully (callers use the numpy paths)
when no compiler is available.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

_DIR = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_DIR, "libone2345_native.so")
_SRC = [os.path.join(_DIR, "marching_tets.cpp")]

_lib = None
_load_failed = False


def build(force: bool = False, out: str | None = None) -> str | None:
    """:param out: output path override — the stale-.so recovery must build
    to a FRESH path, because dlopen dedups by pathname and would hand back
    the already-loaded stale handle for the original file."""
    out = out or _SO
    if os.path.exists(out) and not force:
        newest_src = max(os.path.getmtime(s) for s in _SRC)
        if os.path.getmtime(out) >= newest_src:
            return out
    try:
        # no -march=native: the .so is built on first use on whatever host
        # runs it (it is gitignored), and portable codegen avoids SIGILL if
        # a build cache moves between machines
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-std=c++17"]
            + _SRC
            + ["-o", out],
            check=True,
            capture_output=True,
        )
        return out
    except (subprocess.CalledProcessError, FileNotFoundError):
        return None


def load() -> ctypes.CDLL | None:
    global _lib, _load_failed
    if _lib is not None:
        return _lib
    if _load_failed:
        return None
    so = build()
    if so is None:
        _load_failed = True
        return None
    try:
        lib = _bind(ctypes.CDLL(so))
    except (OSError, AttributeError):
        # Stale cached .so missing a newer symbol.  Rebuild to a FRESH
        # temp path and load that: dlopen dedups by pathname, so an
        # in-place rebuild of the already-mapped file would return the
        # same stale handle (and overwriting a mapped ELF is UB).
        import tempfile

        tmp = os.path.join(
            tempfile.gettempdir(), f"libone2345_native_{os.getpid()}.so"
        )
        so = build(force=True, out=tmp)
        try:
            lib = _bind(ctypes.CDLL(so)) if so else None
        except (OSError, AttributeError):
            lib = None
        if lib is None:
            _load_failed = True
            return None
        # Repair the cached .so too so future processes dlopen the fresh
        # build directly instead of repeating this failed-load + rebuild
        # cycle.  The stale _SO is mapped in THIS process (its dlopen
        # succeeded; only symbol binding failed), so don't truncate it in
        # place — COPY the just-built temp library to a per-PID sibling
        # (no second g++ run, no shared ".new" path for concurrently
        # recovering processes to trample) and atomically rename it over
        # _SO.  Also drop the per-PID temp file at exit.
        import atexit
        import shutil

        sibling = f"{_SO}.new.{os.getpid()}"
        try:
            shutil.copyfile(tmp, sibling)
            os.replace(sibling, _SO)
        except OSError:
            try:
                os.path.exists(sibling) and os.unlink(sibling)
            except OSError:
                pass
        atexit.register(lambda p=tmp: os.path.exists(p) and os.unlink(p))
    _lib = lib
    return _lib


def _bind(lib: ctypes.CDLL) -> ctypes.CDLL:
    lib.marching_tetrahedra_cpp.restype = ctypes.c_int
    lib.marching_tetrahedra_cpp.argtypes = [
        ctypes.POINTER(ctypes.c_float),
        ctypes.c_int,
        ctypes.c_int,
        ctypes.c_int,
        ctypes.c_float,
        ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
        ctypes.POINTER(ctypes.POINTER(ctypes.c_int32)),
        ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_int64),
    ]
    lib.marching_tetrahedra_sparse_cpp.restype = ctypes.c_int
    lib.marching_tetrahedra_sparse_cpp.argtypes = [
        ctypes.POINTER(ctypes.c_float),
        ctypes.c_int,
        ctypes.c_int,
        ctypes.c_int,
        ctypes.c_float,
        ctypes.POINTER(ctypes.c_int64),
        ctypes.c_int64,
        ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
        ctypes.POINTER(ctypes.POINTER(ctypes.c_int32)),
        ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_int64),
    ]
    lib.free_mesh.argtypes = [
        ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_int32),
    ]
    lib.sign_plane_analyze_cpp.restype = ctypes.c_int
    lib.sign_plane_analyze_cpp.argtypes = [
        ctypes.POINTER(ctypes.c_uint8),
        ctypes.c_int,
        ctypes.POINTER(ctypes.c_uint8),
        ctypes.POINTER(ctypes.POINTER(ctypes.c_int64)),
        ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.POINTER(ctypes.c_int64)),
        ctypes.POINTER(ctypes.c_int64),
    ]
    lib.free_idx.argtypes = [
        ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_int64),
    ]
    return lib


def sign_plane_analyze_native(bits, R: int):
    """Unpack the packed sign plane and find crossing cubes in one native
    pass; returns (inside [R,R,R] bool, active_cube_ids [K], needed_voxel_ids
    [M]) or None when the native library is unavailable."""
    import numpy as np

    lib = load()
    if lib is None:
        return None
    b = np.ascontiguousarray(bits, dtype=np.uint8)
    inside = np.empty(R * R * R, np.uint8)
    pc = ctypes.POINTER(ctypes.c_int64)()
    pn = ctypes.POINTER(ctypes.c_int64)()
    nc = ctypes.c_int64()
    nn = ctypes.c_int64()
    rc = lib.sign_plane_analyze_cpp(
        b.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        R,
        inside.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.byref(pc), ctypes.byref(nc), ctypes.byref(pn), ctypes.byref(nn),
    )
    if rc != 0:
        return None
    # malloc(0) may return NULL — guard the empty-mesh case
    cubes = (np.ctypeslib.as_array(pc, shape=(nc.value,)).copy()
             if nc.value else np.zeros(0, np.int64))
    needed = (np.ctypeslib.as_array(pn, shape=(nn.value,)).copy()
              if nn.value else np.zeros(0, np.int64))
    lib.free_idx(pc, pn)
    # zero-copy reinterpret: the buffer holds 0/1 bytes and is caller-owned
    return inside.reshape(R, R, R).view(np.bool_), cubes, needed


def marching_tetrahedra_native(field, threshold: float = 0.0, active_cubes=None):
    """C++ marching tetrahedra; returns (verts [N,3], faces [M,3]) or None
    when the native library is unavailable.

    :param active_cubes: optional int64 [K] linear ids over the
        (X-1, Y-1, Z-1) cube lattice (C order) — only these cubes are
        visited (the sparse field fetch already knows the crossing set)."""
    import numpy as np

    lib = load()
    if lib is None:
        return None
    f = np.ascontiguousarray(field, dtype=np.float32)
    X, Y, Z = f.shape
    pv = ctypes.POINTER(ctypes.c_float)()
    pf = ctypes.POINTER(ctypes.c_int32)()
    nv = ctypes.c_int64()
    nf = ctypes.c_int64()
    if active_cubes is not None:
        cubes = np.ascontiguousarray(active_cubes, dtype=np.int64)
        rc = lib.marching_tetrahedra_sparse_cpp(
            f.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            X, Y, Z, ctypes.c_float(threshold),
            cubes.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            ctypes.c_int64(cubes.size),
            ctypes.byref(pv), ctypes.byref(pf), ctypes.byref(nv), ctypes.byref(nf),
        )
    else:
        rc = lib.marching_tetrahedra_cpp(
            f.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            X, Y, Z, ctypes.c_float(threshold),
            ctypes.byref(pv), ctypes.byref(pf), ctypes.byref(nv), ctypes.byref(nf),
        )
    if rc != 0:
        return None
    verts = np.ctypeslib.as_array(pv, shape=(nv.value, 3)).copy()
    faces = np.ctypeslib.as_array(pf, shape=(nf.value, 3)).copy()
    lib.free_mesh(pv, pf)
    return verts, faces
