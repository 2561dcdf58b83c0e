"""ctypes bindings for the native (C++) runtime components in csrc/.

Build: `make -C csrc` (outputs deepflame_tpu/_native/libdfnative.so).
Every entry point has a pure-Python fallback, so the framework runs without
the native library; with it, table loading and partition planning use the
C++ paths (the reference's equivalents are C++ too: tableSolver.C,
decomposePar).
"""
from __future__ import annotations

import ctypes
import os

import numpy as np

__all__ = ["load_native", "native_available", "flare_table_native",
           "partition_balance", "partition_slabs"]

_LIB = None
_TRIED = False


def load_native():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    path = os.path.join(os.path.dirname(__file__), "_native", "libdfnative.so")
    if os.path.exists(path):
        lib = ctypes.CDLL(path)
        lib.ft_open.restype = ctypes.c_void_p
        lib.ft_open.argtypes = [ctypes.c_char_p]
        lib.ft_dims.argtypes = [ctypes.c_void_p,
                                np.ctypeslib.ndpointer(np.int32)]
        lib.ft_n_tables.restype = ctypes.c_long
        lib.ft_n_tables.argtypes = [ctypes.c_void_p]
        lib.ft_axis.argtypes = [ctypes.c_void_p, ctypes.c_int,
                                np.ctypeslib.ndpointer(np.float64)]
        lib.ft_misc.argtypes = [ctypes.c_void_p,
                                np.ctypeslib.ndpointer(np.float64)]
        lib.ft_laminar.argtypes = [ctypes.c_void_p,
                                   np.ctypeslib.ndpointer(np.float64)]
        lib.ft_names.restype = ctypes.c_long
        lib.ft_names.argtypes = [ctypes.c_void_p, ctypes.c_char_p,
                                 ctypes.c_long]
        lib.ft_read_tables.argtypes = [ctypes.c_void_p,
                                       np.ctypeslib.ndpointer(np.float64)]
        lib.ft_close.argtypes = [ctypes.c_void_p]
        lib.part_balance.argtypes = [ctypes.c_int] * 4 + [
            np.ctypeslib.ndpointer(np.int32)]
        lib.part_slabs.argtypes = [ctypes.c_int, ctypes.c_int,
                                   np.ctypeslib.ndpointer(np.int32)]
        _LIB = lib
    return _LIB


def native_available() -> bool:
    return load_native() is not None


def flare_table_native(path: str):
    """Parse a FlaRe .tbl with the C++ loader. Returns the same tuple shape
    the Python reader consumes: (dims, names, axes, (hfu, hox), laminar,
    tables_flat)."""
    lib = load_native()
    if lib is None:
        raise RuntimeError("native library not built (make -C csrc)")
    h = lib.ft_open(path.encode())
    if not h:
        raise IOError(f"native FlaRe parse failed: {path}")
    try:
        dims = np.zeros(10, np.int32)
        lib.ft_dims(h, dims)
        NH, NZ, NC, NGZ, NGC, NZC, NS, NYomega, NY, NZL = (int(x) for x in dims)
        n = lib.ft_names(h, None, 0)
        buf = ctypes.create_string_buffer(n + 1)
        lib.ft_names(h, buf, n + 1)
        l1, _, l2 = buf.value.decode().partition("\n")
        omega_species = tuple(l1.split()[:NYomega])
        species = tuple(l2.split()[:NY])
        axes = []
        for i, ln in enumerate((NH, NZ, NC, NGZ, NGC, NZC)):
            a = np.zeros(ln)
            lib.ft_axis(h, i, a)
            axes.append(a)
        misc = np.zeros(2)
        lib.ft_misc(h, misc)
        lam = np.zeros(NH * NZL * 5)
        lib.ft_laminar(h, lam)
        n_tables = lib.ft_n_tables(h)
        single = NH * NZ * NC * NGZ * NGC * NZC
        tables = np.zeros(n_tables * single)
        lib.ft_read_tables(h, tables)
        return (tuple(int(x) for x in dims), (omega_species, species),
                tuple(axes), (misc[0], misc[1]),
                lam.reshape(NH, NZL, 5), tables)
    finally:
        lib.ft_close(h)


def partition_balance(nx: int, ny: int, nz: int, n_devices: int):
    """Surface-minimizing device-grid factorization (native or Python)."""
    lib = load_native()
    if lib is not None:
        out = np.zeros(3, np.int32)
        lib.part_balance(nx, ny, nz, n_devices, out)
        return tuple(int(x) for x in out)
    # Python fallback
    best, best_cost = (n_devices, 1, 1), float("inf")
    for dx in range(1, n_devices + 1):
        if n_devices % dx:
            continue
        rem = n_devices // dx
        for dy in range(1, rem + 1):
            if rem % dy:
                continue
            dz = rem // dy
            if dx > nx or dy > ny or dz > nz:
                continue
            cost = ((2 * (ny // dy) * (nz // dz) if dx > 1 else 0)
                    + (2 * (nx // dx) * (nz // dz) if dy > 1 else 0)
                    + (2 * (nx // dx) * (ny // dy) if dz > 1 else 0)
                    + 1000 * (nx % dx + ny % dy + nz % dz))
            if cost < best_cost:
                best, best_cost = (dx, dy, dz), cost
    return best


def partition_slabs(n: int, n_devices: int):
    lib = load_native()
    if lib is not None:
        out = np.zeros(n_devices + 1, np.int32)
        lib.part_slabs(n, n_devices, out)
        return out.astype(int)
    base, rem = divmod(n, n_devices)
    starts = [0]
    for d in range(n_devices):
        starts.append(starts[-1] + base + (1 if d < rem else 0))
    return np.asarray(starts)
