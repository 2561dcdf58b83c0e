"""Flamelet-generated-manifold table solver: FlaRe table IO + N-D lookup.

Role parity: /root/reference/src/dfCombustionModels/FGM/flameletTableSolver/
tableSolver.C — reads the FlaRe `.tbl` text format (header `NH NZ NC NGZ NGC
NZC NS NYomega NY NZL`; species-name lines; the six axis vectors h/z/c/gz/gc/
gzc; `Hfu Hox`; NH*NZL laminar flame property rows (z, sl, th, tau, kctau);
then the 6-D tables omgc/cOc/ZOc/cp/mwt/hiyi/Tf/nu (+Ycmax if unscaled PV,
+ per-species omega and Y tables)), and provides lookup1d..lookup6d
multilinear interpolation (tableSolver.H:200-227).

TPU-first: a lookup over a whole field is one `map_coordinates(order=1)` call
per table — exact multilinear interpolation as batched gathers, instead of the
reference's per-cell index arithmetic. Axes may be non-uniform: physical
coordinates are converted to fractional indices with jnp.interp.
"""
from __future__ import annotations

import dataclasses
from typing import Dict, Sequence

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["FlameletTable", "read_flare_table", "write_flare_table",
           "lookup", "make_synthetic_table"]

AXIS_NAMES = ("h", "z", "c", "gz", "gc", "gzc")
BASE_TABLES = ("omgc", "cOc", "ZOc", "cp", "mwt", "hiyi", "Tf", "nu")


@dataclasses.dataclass(frozen=True)
class FlameletTable:
    axes: tuple                      # 6 arrays (may have length 1)
    tables: Dict[str, jax.Array]     # name -> (NH, NZ, NC, NGZ, NGC, NZC)
    scaled_pv: bool
    H_fuel: float
    H_ox: float
    omega_species: tuple             # names with source tables ("omega_<sp>")
    species: tuple                   # names with Y tables
    laminar: Dict[str, np.ndarray]   # z/sl/th/tau/kctau, shape (NH, NZL)

    @property
    def shape(self):
        return tuple(len(a) for a in self.axes)


def _frac_index(x, axis_vals):
    """Physical coordinate -> fractional index on a (possibly non-uniform,
    possibly length-1) axis, clamped to the table."""
    n = axis_vals.shape[0]
    if n == 1:
        return jnp.zeros_like(x)
    idx = jnp.interp(x, axis_vals, jnp.arange(n, dtype=x.dtype))
    return jnp.clip(idx, 0.0, n - 1.0)


def lookup(table: FlameletTable, name: str, coords: Sequence) -> jax.Array:
    """Multilinear interpolation of `name` at physical coords (h, z, c, gz,
    gc, gzc) — each scalar or broadcastable field; pass None for axes of
    length 1 (collapsed dimensions). lookup1d..lookup6d parity."""
    tab = table.tables[name]
    shape = None
    fi = []
    for ax, c in enumerate(coords):
        a = table.axes[ax]
        if c is None:
            fi.append(None)
            continue
        c = jnp.asarray(c)
        shape = jnp.broadcast_shapes(shape or (), c.shape)
        fi.append(_frac_index(c, jnp.asarray(a, c.dtype)))
    if shape is None:
        shape = ()
    idxs = []
    for ax, f in enumerate(fi):
        if f is None:
            idxs.append(jnp.zeros(shape))
        else:
            idxs.append(jnp.broadcast_to(f, shape))
    flat = [i.reshape(-1) for i in idxs]
    out = jax.scipy.ndimage.map_coordinates(tab, flat, order=1, mode="nearest")
    return out.reshape(shape)


def read_flare_table(path: str, dtype=jnp.float32,
                     use_native: bool = True) -> FlameletTable:
    """Parse the FlaRe .tbl text format (tableSolver.C:52-200).

    Uses the C++ loader (csrc/flare_table.cpp via ctypes) when built —
    ~50x faster than the numpy text path on production-size tables."""
    if use_native:
        from ...native import native_available, flare_table_native
        if native_available():
            (dims, (omega_species, species), axes, (hfu, hox), lam_rows,
             flat) = flare_table_native(path)
            NH, NZ, NC, NGZ, NGC, NZC, NS, NYomega, NY, NZL = dims
            scaled_pv = (NS == 8 + NYomega)
            names = list(BASE_TABLES)
            if not scaled_pv:
                names.append("Ycmax")
            names += [f"omega_{s}" for s in omega_species]
            names += list(species)
            size = NH * NZ * NC * NGZ * NGC * NZC
            tables = {name: jnp.asarray(
                flat[k * size:(k + 1) * size].reshape(NH, NZ, NC, NGZ, NGC,
                                                      NZC), dtype)
                for k, name in enumerate(names)}
            lam = {key: lam_rows[:, :, i]
                   for i, key in enumerate(("z", "sl", "th", "tau", "kctau"))}
            return FlameletTable(axes=axes, tables=tables,
                                 scaled_pv=scaled_pv, H_fuel=hfu, H_ox=hox,
                                 omega_species=omega_species, species=species,
                                 laminar=lam)
    with open(path) as f:
        tok_header = f.readline().split()
        NH, NZ, NC, NGZ, NGC, NZC, NS, NYomega, NY, NZL = (
            int(t) for t in tok_header[:10])
        scaled_pv = (NS == 8 + NYomega)
        # name lines are always present (possibly empty), tableSolver.C:87-104
        omega_species = tuple(f.readline().split()[:NYomega])
        species = tuple(f.readline().split()[:NY])

        def read_n(n):
            vals = []
            while len(vals) < n:
                vals.append(float(f.readline().split()[0]))
            return np.asarray(vals)

        axes = (read_n(NH), read_n(NZ), read_n(NC), read_n(NGZ), read_n(NGC),
                read_n(NZC))
        Hfu, Hox = (float(t) for t in f.readline().split()[:2])
        lam = {k: np.zeros((NH, NZL)) for k in ("z", "sl", "th", "tau", "kctau")}
        for i in range(NH):
            for j in range(NZL):
                row = [float(t) for t in f.readline().split()[:5]]
                for k, key in enumerate(("z", "sl", "th", "tau", "kctau")):
                    lam[key][i, j] = row[k]
        names = list(BASE_TABLES)
        if not scaled_pv:
            names.append("Ycmax")
        names += [f"omega_{s}" for s in omega_species]
        names += list(species)
        size = NH * NZ * NC * NGZ * NGC * NZC
        rest = np.loadtxt(f).reshape(-1)
        tables = {}
        for k, name in enumerate(names):
            block = rest[k * size:(k + 1) * size]
            tables[name] = jnp.asarray(
                block.reshape(NH, NZ, NC, NGZ, NGC, NZC), dtype)
    return FlameletTable(axes=tuple(np.asarray(a) for a in axes),
                         tables=tables, scaled_pv=scaled_pv,
                         H_fuel=Hfu, H_ox=Hox,
                         omega_species=omega_species, species=species,
                         laminar=lam)


def write_flare_table(path: str, table: FlameletTable) -> None:
    """Write the FlaRe text format (for generating tables with this repo)."""
    NH, NZ, NC, NGZ, NGC, NZC = table.shape
    NYomega = len(table.omega_species)
    NY = len(table.species)
    NS = (8 if table.scaled_pv else 9) + NYomega
    NZL = table.laminar["z"].shape[1]
    with open(path, "w") as f:
        f.write(f"{NH} {NZ} {NC} {NGZ} {NGC} {NZC} {NS} {NYomega} {NY} {NZL}\n")
        if NYomega:
            f.write(" ".join(table.omega_species) + "\n")
        else:
            f.write("\n")
        if NY:
            f.write(" ".join(table.species) + "\n")
        else:
            f.write("\n")
        for a in table.axes:
            for v in np.asarray(a).ravel():
                f.write(f"{v:.10g}\n")
        f.write(f"{table.H_fuel:.10g} {table.H_ox:.10g}\n")
        for i in range(NH):
            for j in range(NZL):
                f.write(" ".join(f"{table.laminar[k][i, j]:.10g}"
                                 for k in ("z", "sl", "th", "tau", "kctau"))
                        + "\n")
        names = list(BASE_TABLES)
        if not table.scaled_pv:
            names.append("Ycmax")
        names += [f"omega_{s}" for s in table.omega_species]
        names += list(table.species)
        for name in names:
            np.savetxt(f, np.asarray(table.tables[name]).reshape(-1, 1),
                       fmt="%.10g")


def make_synthetic_table(NH=1, NZ=21, NC=11, NGZ=5, NGC=3, NZC=1,
                        dtype=jnp.float32) -> FlameletTable:
    """Small analytic table for tests: smooth functions of (z, c, gz, gc)
    and, when NH > 1, of the enthalpy-loss coordinate (temperature and
    source term drop as heat is lost, like a real non-adiabatic manifold)."""
    h_max = 5e5 if NH > 1 else 1.0
    axes = (np.linspace(0.0, h_max, NH), np.linspace(0.0, 1.0, NZ),
            np.linspace(0.0, 1.0, NC), np.linspace(0.0, 0.25, NGZ),
            np.linspace(0.0, 0.25, NGC), np.linspace(0.0, 1.0, NZC))
    H, Z, C, GZ, GC, GZC = np.meshgrid(*axes, indexing="ij")
    zst = 0.3
    flam = np.exp(-((Z - zst) / 0.15) ** 2)
    hfac = 1.0 - 0.3 * (H / h_max) if NH > 1 else np.ones_like(H)
    tables = {
        "omgc": 50.0 * flam * C * (1.0 - C) * (1.0 - 2.0 * GZ) * (1.0 - GC)
                * hfac,
        "cOc": 10.0 * flam * C * hfac,
        "ZOc": 5.0 * flam * Z * C * hfac,
        "cp": 1200.0 + 300.0 * C * flam,
        "mwt": 28.0 - 8.0 * C * flam,
        "hiyi": -1e5 * C * flam,
        "Tf": 300.0 + 1800.0 * C * flam * hfac,
        "nu": 1.5e-5 * (1.0 + 4.0 * C * flam),
    }
    lam = {k: np.zeros((NH, 5)) for k in ("z", "sl", "th", "tau", "kctau")}
    lam["z"][:] = np.linspace(0, 1, 5)
    lam["sl"][:] = 0.4
    lam["th"][:] = 5e-4
    lam["tau"][:] = 5.0
    lam["kctau"][:] = 1.0
    return FlameletTable(
        axes=axes, tables={k: jnp.asarray(v, dtype) for k, v in tables.items()},
        scaled_pv=True, H_fuel=0.0, H_ox=0.0, omega_species=(), species=(),
        laminar=lam)
