"""Runtime post-processing function objects.

Role parity: /root/reference/src/functionObjects/field — the rebuilt OpenFOAM
function-object set the reference's tests depend on: `fieldMinMax` is
load-bearing for the detonation anchor (test/CMakeLists.txt:17 feeds
corrtest.cpp:157-196 with max-pressure locations); `probes`/`sample` feed the
TGV/SandiaD/aachenBomb temperature assertions (corrtest.cpp:51-78);
`fieldAverage` for statistics. Output format: simple columnar text time
series under postProcessing/<name>/, mirroring the reference layout.
"""
from __future__ import annotations

import dataclasses
import os
from typing import Sequence

import numpy as np

from ..mesh.structured import StructuredMesh

__all__ = ["FieldMinMax", "Probes", "LineSample", "FieldAverage",
           "FunctionObjectSet", "Histogram", "FieldCalculus",
           "VolFieldValue", "SurfaceFieldValue", "FieldValueDelta",
           "PatchFieldValue",
           "total_pressure", "pressure_coefficient",
           "write_cell_centres", "write_cell_volumes"]


# --- mesh-backend dispatch -------------------------------------------------
# The classes below serve BOTH backends (the reference's functionObjects
# run on any fvMesh): StructuredMesh exposes cell_centers()/volume;
# FaceListMesh carries flat centers (n,3) + per-cell volumes. Fields are
# (nx,ny,nz)-shaped on the former, (n_cells,)-flat on the latter — every
# reduction below is shape-agnostic once the centers match the field shape.

def _is_facelist(mesh) -> bool:
    return hasattr(mesh, "owner") and not hasattr(mesh, "cell_centers")


def _cell_xyz(mesh):
    """(X, Y, Z) cell-center arrays matching the backend's field shape."""
    if _is_facelist(mesh):
        c = np.asarray(mesh.centers)
        return c[:, 0], c[:, 1], c[:, 2]
    return tuple(np.asarray(a) for a in mesh.cell_centers())


def _cell_volumes(mesh):
    """Per-cell volume array (scalar broadcast on uniform structured)."""
    if _is_facelist(mesh):
        return np.asarray(mesh.volumes)
    return np.asarray(mesh.volume)


def _nearest_cell(mesh, point):
    """Index of the cell whose center is nearest `point` — structured:
    (i,j,k); face-list: flat int (probes/sample nearest-cell semantics)."""
    if _is_facelist(mesh):
        c = np.asarray(mesh.centers)
        d = c - np.asarray(point, c.dtype)[None, :]
        return int(np.argmin(np.einsum("ij,ij->i", d, d)))
    i = int(np.clip((point[0] - mesh.x0) / mesh.dx, 0, mesh.nx - 1))
    j = int(np.clip((point[1] - mesh.y0) / mesh.dy, 0, mesh.ny - 1))
    k = int(np.clip((point[2] - mesh.z0) / mesh.dz, 0, mesh.nz - 1))
    return (i, j, k)


class FieldMinMax:
    """Min/max (+ location of max) time series of named fields
    (fieldMinMax parity, incl. the location output corrtest relies on)."""

    def __init__(self, mesh: StructuredMesh, fields: Sequence[str],
                 out_dir: str = "postProcessing/fieldMinMax"):
        self.mesh = mesh
        self.fields = tuple(fields)
        self.out_dir = out_dir
        self.rows: list[tuple] = []

    def __call__(self, time: float, fields: dict):
        X, Y, Z = _cell_xyz(self.mesh)
        row = [time]
        for name in self.fields:
            f = np.asarray(fields[name])
            imin = np.unravel_index(np.argmin(f), f.shape)
            imax = np.unravel_index(np.argmax(f), f.shape)
            row += [f[imin], X[imin], Y[imin], Z[imin],
                    f[imax], X[imax], Y[imax], Z[imax]]
        self.rows.append(tuple(row))

    def write(self):
        os.makedirs(self.out_dir, exist_ok=True)
        hdr = ["time"]
        for name in self.fields:
            hdr += [f"min({name})", "x_min", "y_min", "z_min",
                    f"max({name})", "x_max", "y_max", "z_max"]
        path = os.path.join(self.out_dir, "fieldMinMax.dat")
        np.savetxt(path, np.asarray(self.rows), header=" ".join(hdr))
        return path


class Probes:
    """Point probes (nearest cell), probes function-object parity."""

    def __init__(self, mesh: StructuredMesh, points: Sequence[tuple],
                 fields: Sequence[str], out_dir: str = "postProcessing/probes"):
        self.mesh = mesh
        self.fields = tuple(fields)
        self.out_dir = out_dir
        self.idx = [_nearest_cell(mesh, p) for p in points]
        self.rows: list[tuple] = []

    def __call__(self, time: float, fields: dict):
        row = [time]
        for name in self.fields:
            f = np.asarray(fields[name])
            for ijk in self.idx:
                row.append(f[ijk])
        self.rows.append(tuple(row))

    def write(self):
        os.makedirs(self.out_dir, exist_ok=True)
        path = os.path.join(self.out_dir, "probes.dat")
        np.savetxt(path, np.asarray(self.rows))
        return path


class LineSample:
    """Axis-aligned line sample (the `sample`/`sets` function object that
    produces the station profiles corrtest asserts on)."""

    def __init__(self, mesh: StructuredMesh, axis: int, through: tuple,
                 fields: Sequence[str], out_dir: str = "postProcessing/sample",
                 tol: float | None = None):
        self.mesh = mesh
        self.axis = axis
        self.fields = tuple(fields)
        self.out_dir = out_dir
        self.snapshots: dict[float, np.ndarray] = {}
        if _is_facelist(mesh):
            # cells whose centers lie within tol of the line through
            # `through` along `axis` (sample `sets` nearest-cell role on
            # general meshes — the wedge-axis station extraction the
            # examples did ad hoc). tol default: half the local cell size.
            c = np.asarray(mesh.centers)
            if tol is None:
                tol_arr = 0.51 * np.asarray(mesh.volumes) ** (1.0 / 3.0)
            else:
                tol_arr = np.full(c.shape[0], tol)
            off = [a for a in range(3) if a != axis]
            mask = np.ones(c.shape[0], bool)
            for a in off:
                mask &= np.abs(c[:, a] - through[a]) <= tol_arr
            sel = np.nonzero(mask)[0]
            if sel.size == 0:       # fall back to the single nearest cell
                sel = np.asarray([_nearest_cell(mesh, through)])
            self.sel = sel[np.argsort(c[sel, axis])]
            self.coord = c[self.sel, axis]
            self.fixed = None
        else:
            j = int(np.clip((through[1] - mesh.y0) / mesh.dy,
                            0, mesh.ny - 1))
            k = int(np.clip((through[2] - mesh.z0) / mesh.dz,
                            0, mesh.nz - 1))
            i = int(np.clip((through[0] - mesh.x0) / mesh.dx,
                            0, mesh.nx - 1))
            self.fixed = (i, j, k)

    def __call__(self, time: float, fields: dict):
        cols = []
        m = self.mesh
        if self.fixed is None:          # face-list backend
            cols.append(self.coord)
            for name in self.fields:
                cols.append(np.asarray(fields[name])[self.sel])
            self.snapshots[time] = np.stack(cols, axis=1)
            return
        n = m.shape[self.axis]
        coord = {0: m.x0 + (np.arange(n) + 0.5) * m.dx,
                 1: m.y0 + (np.arange(n) + 0.5) * m.dy,
                 2: m.z0 + (np.arange(n) + 0.5) * m.dz}[self.axis]
        cols.append(coord)
        i, j, k = self.fixed
        for name in self.fields:
            f = np.asarray(fields[name])
            sl = [i, j, k]
            sl[self.axis] = slice(None)
            cols.append(f[tuple(sl)])
        self.snapshots[time] = np.stack(cols, axis=1)

    def write(self):
        os.makedirs(self.out_dir, exist_ok=True)
        paths = []
        for t, arr in self.snapshots.items():
            p = os.path.join(self.out_dir, f"line_{t:.9g}.xy")
            np.savetxt(p, arr)
            paths.append(p)
        return paths


class FieldAverage:
    """Running time average of fields (fieldAverage parity)."""

    def __init__(self, fields: Sequence[str]):
        self.fields = tuple(fields)
        self.mean: dict[str, np.ndarray] = {}
        self.n = 0

    def __call__(self, time: float, fields: dict):
        self.n += 1
        w = 1.0 / self.n
        for name in self.fields:
            f = np.asarray(fields[name])
            if name not in self.mean:
                self.mean[name] = f.copy()
            else:
                self.mean[name] = (1 - w) * self.mean[name] + w * f


class Histogram:
    """Volume-weighted histogram of a field (histogram function-object
    parity): per write time, bin counts over [lo, hi]."""

    def __init__(self, field: str, n_bins: int = 50, lo=None, hi=None,
                 out_dir: str = "postProcessing/histogram"):
        self.field = field
        self.n_bins = n_bins
        self.lo, self.hi = lo, hi
        self.out_dir = out_dir
        self.snapshots: dict[float, tuple] = {}

    def __call__(self, time: float, fields: dict):
        f = np.asarray(fields[self.field]).ravel()
        lo = self.lo if self.lo is not None else float(f.min())
        hi = self.hi if self.hi is not None else float(f.max())
        counts, edges = np.histogram(f, bins=self.n_bins, range=(lo, hi))
        self.snapshots[time] = (counts, edges)

    def write(self):
        os.makedirs(self.out_dir, exist_ok=True)
        paths = []
        for t, (counts, edges) in self.snapshots.items():
            mid = 0.5 * (edges[:-1] + edges[1:])
            p = os.path.join(self.out_dir, f"{self.field}_{t:.9g}.dat")
            np.savetxt(p, np.stack([mid, counts], axis=1))
            paths.append(p)
        return paths


class FieldCalculus:
    """The reference's field-expression family (add/subtract/scale/mag/
    magSqr/components/log/grad/div/ddt, functionObjects/field Make list) as
    one DerivedFields-compatible spec factory: each classmethod returns a
    callable(fields_dict) -> array usable in DerivedFields specs."""

    @staticmethod
    def mag(name):
        return lambda f: np.sqrt(np.sum(np.asarray(f[name]) ** 2, axis=0)) \
            if np.asarray(f[name]).ndim == 4 else abs(np.asarray(f[name]))

    @staticmethod
    def mag_sqr(name):
        def _f(f):
            a = np.asarray(f[name])
            return np.sum(a * a, axis=0) if a.ndim == 4 else a * a
        return _f

    @staticmethod
    def component(name, c):
        return lambda f: np.asarray(f[name])[c]

    @staticmethod
    def add(a, b):
        return lambda f: np.asarray(f[a]) + np.asarray(f[b])

    @staticmethod
    def subtract(a, b):
        return lambda f: np.asarray(f[a]) - np.asarray(f[b])

    @staticmethod
    def scale(name, factor):
        return lambda f: factor * np.asarray(f[name])

    @staticmethod
    def log(name, floor=1e-300):
        return lambda f: np.log(np.maximum(np.asarray(f[name]), floor))

    @staticmethod
    def grad(name, bcs, mesh):
        from ..ops.fv import grad as _grad
        import jax.numpy as jnp
        return lambda f: np.stack(
            [np.asarray(g) for g in _grad(jnp.asarray(f[name]), bcs, mesh)])

    @staticmethod
    def div(name, bcs, mesh):
        from ..ops.fv import grad as _grad
        import jax.numpy as jnp

        def _f(f):
            v = jnp.asarray(f[name])
            return np.asarray(sum(_grad(v[c], bcs[c], mesh)[c]
                                  for c in range(3)))
        return _f

    @staticmethod
    def ddt(name, dt):
        prev = {}

        def _f(f):
            cur = np.asarray(f[name])
            out = (cur - prev.get("v", cur)) / dt
            prev["v"] = cur
            return out
        return _f


class VolFieldValue:
    """Volume-region reductions (volFieldValue parity,
    /root/reference/src/functionObjects/field Make/files): per-step
    sum / volIntegrate / average / volAverage / min / max / CoV of named
    fields over an axis-aligned box region (whole domain by default).

    ops: any of "sum", "volIntegrate", "average", "volAverage", "min",
    "max", "CoV". The volume-weighted variants match OpenFOAM's
    definitions (uniform cell volume on a structured box makes
    average == volAverage; both kept for dictionary parity)."""

    def __init__(self, mesh: StructuredMesh, fields: Sequence[str],
                 ops: Sequence[str] = ("volAverage",), box=None,
                 out_dir: str = "postProcessing/volFieldValue"):
        self.mesh = mesh
        self.fields = tuple(fields)
        self.ops = tuple(ops)
        self.out_dir = out_dir
        self.rows: list[tuple] = []
        if box is None:
            self.mask = None
        else:
            (x0, x1), (y0, y1), (z0, z1) = box
            X, Y, Z = _cell_xyz(mesh)
            self.mask = ((X >= x0) & (X <= x1) & (Y >= y0) & (Y <= y1)
                         & (Z >= z0) & (Z <= z1))

    def _reduce(self, op: str, f: np.ndarray, v) -> float:
        if op == "sum":
            return float(f.sum())
        if op == "volIntegrate":
            return float((f * v).sum())
        if op == "average":
            return float(f.mean())
        if op == "volAverage":
            # sum(f V)/sum(V) — equals f.mean() on uniform cells
            return float((f * v).sum() / np.sum(v * np.ones_like(f)))
        if op == "min":
            return float(f.min())
        if op == "max":
            return float(f.max())
        if op == "CoV":
            m = f.mean()
            return float(f.std() / m) if m != 0.0 else 0.0
        raise ValueError(op)

    def __call__(self, time: float, fields: dict):
        row = [time]
        vols = _cell_volumes(self.mesh)
        for name in self.fields:
            f = np.asarray(fields[name])
            v = vols
            if self.mask is not None:
                f = f[self.mask]
                if np.ndim(vols) > 0:
                    v = vols[self.mask.ravel()]
            row += [self._reduce(op, f, v) for op in self.ops]
        self.rows.append(tuple(row))

    def write(self):
        os.makedirs(self.out_dir, exist_ok=True)
        hdr = ["time"] + [f"{op}({name})" for name in self.fields
                          for op in self.ops]
        path = os.path.join(self.out_dir, "volFieldValue.dat")
        np.savetxt(path, np.asarray(self.rows), header=" ".join(hdr))
        return path


class SurfaceFieldValue:
    """Face-plane reductions (surfaceFieldValue parity): areaAverage /
    areaIntegrate / sum of a FACE field on one constant-index plane of a
    face array (e.g. outlet mass flow = sum of phi*A on the last x-plane).

    axis: face-normal axis; index: face-plane index into the (n+1)-sized
    face arrays (0 = low boundary, n = high boundary)."""

    def __init__(self, mesh: StructuredMesh, fields: Sequence[str],
                 axis: int = 0, index: int = 0,
                 ops: Sequence[str] = ("areaAverage",),
                 out_dir: str = "postProcessing/surfaceFieldValue"):
        self.mesh = mesh
        self.fields = tuple(fields)
        self.axis = axis
        self.index = index
        self.ops = tuple(ops)
        self.out_dir = out_dir
        self.rows: list[tuple] = []
        spac = [mesh.dx, mesh.dy, mesh.dz]
        spac.pop(axis)
        self.face_area = spac[0] * spac[1]

    def _reduce(self, op: str, f: np.ndarray) -> float:
        if op == "areaAverage":
            return float(f.mean())
        if op == "areaIntegrate":
            return float(f.sum() * self.face_area)
        if op == "sum":
            return float(f.sum())
        if op == "min":
            return float(f.min())
        if op == "max":
            return float(f.max())
        raise ValueError(op)

    def __call__(self, time: float, fields: dict):
        row = [time]
        for name in self.fields:
            f = np.asarray(fields[name])      # face array for self.axis
            plane = np.take(f, self.index, axis=self.axis)
            row += [self._reduce(op, plane) for op in self.ops]
        self.rows.append(tuple(row))

    def write(self):
        os.makedirs(self.out_dir, exist_ok=True)
        hdr = ["time"] + [f"{op}({name})" for name in self.fields
                          for op in self.ops]
        path = os.path.join(self.out_dir, "surfaceFieldValue.dat")
        np.savetxt(path, np.asarray(self.rows), header=" ".join(hdr))
        return path


class PatchFieldValue:
    """surfaceFieldValue on a named boundary PATCH of a FaceListMesh
    (the reference's `surfaceFieldValue { regionType patch; }` mode —
    outlet mass flow, patch-averaged T, etc. on arbitrary meshes).

    Reduces owner-cell values of named cell fields over the patch with
    areaAverage / areaIntegrate / sum / min / max; an optional weight
    field name (e.g. the boundary mass flux) turns areaIntegrate into
    a flux integral sum(w f A)."""

    def __init__(self, mesh, patch: str, fields: Sequence[str],
                 ops: Sequence[str] = ("areaAverage",),
                 weight_field: str | None = None,
                 out_dir: str = "postProcessing/patchFieldValue"):
        names = [p.name for p in mesh.patches]
        self.patch = mesh.patches[names.index(patch)]
        self.fields = tuple(fields)
        self.ops = tuple(ops)
        self.weight_field = weight_field
        self.out_dir = out_dir
        self.rows: list[tuple] = []

    def _reduce(self, op: str, f: np.ndarray, a: np.ndarray,
                w: np.ndarray) -> float:
        if op == "areaAverage":
            return float((f * a).sum() / a.sum())
        if op == "areaIntegrate":
            return float((w * f * a).sum())
        if op == "sum":
            return float(f.sum())
        if op == "min":
            return float(f.min())
        if op == "max":
            return float(f.max())
        raise ValueError(op)

    def __call__(self, time: float, fields: dict):
        own = np.asarray(self.patch.owner)
        a = np.asarray(self.patch.mag_sf)
        w = (np.asarray(fields[self.weight_field])[own]
             if self.weight_field is not None else np.ones_like(a))
        row = [time]
        for name in self.fields:
            f = np.asarray(fields[name])[own]
            row += [self._reduce(op, f, a, w) for op in self.ops]
        self.rows.append(tuple(row))

    def write(self):
        os.makedirs(self.out_dir, exist_ok=True)
        hdr = ["time"] + [f"{op}({name})" for name in self.fields
                          for op in self.ops]
        path = os.path.join(self.out_dir, "patchFieldValue.dat")
        np.savetxt(path, np.asarray(self.rows), header=" ".join(hdr))
        return path


def write_cell_centres(mesh: StructuredMesh,
                       out_dir: str = "postProcessing/mesh"):
    """writeCellCentres parity."""
    os.makedirs(out_dir, exist_ok=True)
    X, Y, Z = (np.asarray(a) for a in mesh.cell_centers())
    path = os.path.join(out_dir, "cellCentres.dat")
    np.savetxt(path, np.stack([X.ravel(), Y.ravel(), Z.ravel()], axis=1))
    return path


def write_cell_volumes(mesh: StructuredMesh,
                       out_dir: str = "postProcessing/mesh"):
    """writeCellVolumes parity (uniform on the structured block)."""
    os.makedirs(out_dir, exist_ok=True)
    n = int(np.prod(mesh.shape))
    path = os.path.join(out_dir, "cellVolumes.dat")
    np.savetxt(path, np.full((n,), mesh.volume))
    return path


@dataclasses.dataclass
class FunctionObjectSet:
    """Bundle invoked each write interval (controlDict functions parity)."""
    objects: list

    def __call__(self, time: float, fields: dict):
        for obj in self.objects:
            obj(time, fields)

    def write(self):
        out = []
        for obj in self.objects:
            if hasattr(obj, "write"):
                out.append(obj.write())
        return out


def total_pressure(p, rho, U):
    """p0 = p + 0.5 rho |U|^2 (functionObjects::pressure mode 'total';
    the incompressible-form total pressure the reference's pressure
    function object writes)."""
    q = 0.5 * rho * (U ** 2).sum(axis=0)
    return p + q


def pressure_coefficient(p, rho, U, p_inf, U_inf, rho_inf=None):
    """Cp = (p - p_inf) / (0.5 rho_inf U_inf^2) (pressure mode
    'staticCoeff')."""
    import numpy as _np
    r = rho_inf if rho_inf is not None else _np.asarray(rho).mean()
    return (p - p_inf) / (0.5 * r * U_inf ** 2)


class FieldValueDelta:
    """Difference/ratio of two fieldValue-style function objects per step
    (fieldValueDelta parity: e.g. pressure drop inlet->outlet, mass
    imbalance in-out). ops: subtract | add | min | max (OpenFOAM set).

    The two operands must produce single-scalar rows (one field, one op);
    their __call__ is driven by THIS object - do not also register them
    separately."""

    def __init__(self, a, b, op: str = "subtract",
                 out_dir: str = "postProcessing/fieldValueDelta"):
        self.a = a
        self.b = b
        self.op = op
        self.out_dir = out_dir
        self.rows: list[tuple] = []

    def __call__(self, time: float, fields: dict):
        self.a(time, fields)
        self.b(time, fields)
        va = self.a.rows[-1][1]
        vb = self.b.rows[-1][1]
        if self.op == "subtract":
            d = va - vb
        elif self.op == "add":
            d = va + vb
        elif self.op == "min":
            d = min(va, vb)
        elif self.op == "max":
            d = max(va, vb)
        else:
            raise ValueError(self.op)
        self.rows.append((time, d))

    def write(self):
        os.makedirs(self.out_dir, exist_ok=True)
        path = os.path.join(self.out_dir, "fieldValueDelta.dat")
        np.savetxt(path, np.asarray(self.rows),
                   header=f"time {self.op}(a,b)")
        return path


def randomise(field, magnitude: float, seed: int = 0):
    """randomise parity (functionObjects/field/randomise): field + uniform
    perturbation in [-magnitude, magnitude] per cell."""
    rng = np.random.default_rng(seed)
    f = np.asarray(field)
    return f + rng.uniform(-magnitude, magnitude, f.shape)


def surface_interpolate(field, mesh: StructuredMesh):
    """surfaceInterpolate parity: linear cell->face interpolation. Returns
    a tuple of interior-face arrays, one per axis (axis a has shape with
    n_a - 1 faces along that axis)."""
    f = np.asarray(field)
    out = []
    for a in range(3):
        sl_lo = [slice(None)] * 3
        sl_hi = [slice(None)] * 3
        sl_lo[a] = slice(0, -1)
        sl_hi[a] = slice(1, None)
        out.append(0.5 * (f[tuple(sl_lo)] + f[tuple(sl_hi)]))
    return tuple(out)


class NearWallFields:
    """nearWallFields parity: time series of named fields sampled in the
    cell layer adjacent to a wall patch (axis, side with side 0 = low)."""

    def __init__(self, fields: Sequence[str], axis: int, side: int,
                 out_dir: str = "postProcessing/nearWallFields"):
        self.fields = tuple(fields)
        self.axis = axis
        self.side = side
        self.out_dir = out_dir
        self.rows: list[tuple] = []

    def _layer(self, f):
        sl = [slice(None)] * 3
        sl[self.axis] = 0 if self.side == 0 else -1
        return f[tuple(sl)]

    def __call__(self, time: float, fields: dict):
        row = [time]
        for name in self.fields:
            lay = self._layer(np.asarray(fields[name]))
            row += [lay.min(), lay.max(), lay.mean()]
        self.rows.append(tuple(row))

    def write(self):
        os.makedirs(self.out_dir, exist_ok=True)
        hdr = ["time"]
        for n in self.fields:
            hdr += [f"min({n})", f"max({n})", f"mean({n})"]
        path = os.path.join(self.out_dir, "nearWallFields.dat")
        np.savetxt(path, np.asarray(self.rows), header=" ".join(hdr))
        return path


def processor_field(mesh: StructuredMesh, n_shards: int = 1, axis: int = 0):
    """processorField parity: per-cell owning-rank id. The TPU analogue of
    MPI rank is the shard index of the device mesh (cells are block-
    partitioned along `axis` into n_shards equal slabs, matching the
    distributed layer's decomposition)."""
    n = mesh.shape[axis]
    ids = np.minimum(np.arange(n) * n_shards // n, n_shards - 1)
    shape = [1, 1, 1]
    shape[axis] = n
    return np.broadcast_to(ids.reshape(shape), mesh.shape).astype(np.int32)


class ReadFields:
    """readFields parity: injects fields loaded from an .npz snapshot into
    the function-object field registry each call (making post-processed
    fields available to downstream objects)."""

    def __init__(self, path: str, names: Sequence[str] | None = None):
        data = np.load(path)
        self.loaded = {k: data[k] for k in (names or data.files)}

    def __call__(self, time: float, fields: dict):
        fields.update(self.loaded)


def field_coordinate_system_transform(U, origin, e1, e3):
    """fieldCoordinateSystemTransform parity for vector fields: express U
    (3, ...) in the local Cartesian system with axes (e1, e2 = e3 x e1,
    e3), all unit vectors; origin only matters for positions, not
    vectors."""
    e1 = np.asarray(e1, np.float64)
    e3 = np.asarray(e3, np.float64)
    e1 = e1 / np.linalg.norm(e1)
    e3 = e3 - e1 * (e3 @ e1)
    e3 = e3 / np.linalg.norm(e3)
    e2 = np.cross(e3, e1)
    R = np.stack([e1, e2, e3])          # rows = new basis
    Uarr = np.asarray(U)
    return np.einsum("ab,b...->a...", R, Uarr)


class StreamLine:
    """streamLine parity: trace streamlines through a frozen velocity
    snapshot by midpoint (RK2) integration on the structured block; writes
    one polyline per seed point."""

    def __init__(self, mesh: StructuredMesh, seeds, step_frac: float = 0.5,
                 max_steps: int = 2000,
                 out_dir: str = "postProcessing/streamLine"):
        self.mesh = mesh
        self.seeds = np.asarray(seeds, np.float64)
        self.h = step_frac * float(min(mesh.dx, mesh.dy, mesh.dz))
        self.max_steps = max_steps
        self.out_dir = out_dir
        self.lines: list[np.ndarray] = []

    def _sample(self, U, x):
        # nearest-cell lookup (consistent with the tracer's first-order use)
        d = (self.mesh.dx, self.mesh.dy, self.mesh.dz)
        idx = []
        for a in range(3):
            i = int(np.clip(x[a] / d[a] - 0.5, 0, self.mesh.shape[a] - 1))
            idx.append(i)
        return np.array([U[c][tuple(idx)] for c in range(3)])

    def __call__(self, time: float, fields: dict):
        U = np.asarray(fields["U"])
        ext = np.array([self.mesh.shape[a]
                        * (self.mesh.dx, self.mesh.dy, self.mesh.dz)[a]
                        for a in range(3)])
        self.lines = []
        for seed in self.seeds:
            x = np.asarray(seed, np.float64).copy()
            pts = [x.copy()]
            for _ in range(self.max_steps):
                u1 = self._sample(U, x)
                sp = np.linalg.norm(u1)
                if sp < 1e-12:
                    break
                xm = x + 0.5 * self.h * u1 / sp
                u2 = self._sample(U, xm)
                sp2 = np.linalg.norm(u2)
                if sp2 < 1e-12:
                    break
                x = x + self.h * u2 / sp2
                if np.any(x < 0) or np.any(x >= ext):
                    break
                pts.append(x.copy())
            self.lines.append(np.asarray(pts))

    def write(self):
        os.makedirs(self.out_dir, exist_ok=True)
        paths = []
        for i, line in enumerate(self.lines):
            p = os.path.join(self.out_dir, f"track{i}.xy")
            np.savetxt(p, line, header="x y z")
            paths.append(p)
        return paths


def region_size_distribution(field, threshold: float, cell_volume: float,
                             above: bool = True):
    """regionSizeDistribution parity: label connected regions where the
    field is above (or below) threshold and return the sorted region
    volumes [m^3] (6/18-connectivity via scipy.ndimage)."""
    from scipy import ndimage
    f = np.asarray(field)
    mask = f > threshold if above else f < threshold
    labels, n = ndimage.label(mask)
    if n == 0:
        return np.zeros((0,))
    sizes = ndimage.sum_labels(np.ones_like(f), labels,
                               index=np.arange(1, n + 1))
    return np.sort(sizes)[::-1] * cell_volume


def blending_factor(field, mesh: StructuredMesh, axis: int = 0):
    """blendingFactor parity: the limiter weight the limitedLinear
    divergence scheme would apply on each interior face of `axis`
    (1 = pure linear / central, 0 = pure upwind), averaged back to cells —
    a mesh-resolution/monotonicity diagnostic."""
    f = np.asarray(field, np.float64)
    fm = np.roll(f, 1, axis)
    fp = np.roll(f, -1, axis)
    # Sweby r on the face between i and i+1 assuming positive flow
    num = f - fm
    den = fp - f
    r = num / np.where(np.abs(den) > 1e-300, den, 1e-300)
    # limitedLinear 1: psi = max(0, min(2r, 1)) on the linear weight
    psi = np.clip(np.minimum(2.0 * r, 1.0), 0.0, 1.0)
    return psi


def age(phi, mesh: StructuredMesh, rho=None, n_sweeps: int | None = None,
        tol: float = 1e-10):
    """age parity (functionObjects/field/age, listed in the reference's
    Make/files): steady age-of-fluid tau solving div(phi, tau) = rho by
    first-order upwind Jacobi sweeps (information propagates one cell per
    sweep, so convergence needs ~mesh-extent sweeps; the default scales
    with the mesh and iteration stops early once the update falls below
    `tol` relative). phi is the face-flux tuple (one array per axis,
    interior+boundary faces, as the solvers carry it); inflow boundaries
    hold tau = 0; cells with no outflow faces (stagnant) keep their
    previous tau rather than dividing by a floored diagonal. Returns
    tau [s]."""
    if n_sweeps is None:
        # upwind Jacobi propagates one cell/sweep: cover the longest
        # possible streamline (sum of extents), plus slack
        n_sweeps = 2 * int(sum(mesh.shape)) + 10
    rho_arr = np.ones(mesh.shape) if rho is None else np.asarray(rho)
    tau = np.zeros(mesh.shape, np.float64)
    vol = mesh.volume
    phis = [np.asarray(p, np.float64) for p in phi]
    for _ in range(n_sweeps):
        diag = np.zeros_like(tau)
        off = np.zeros_like(tau)
        for a in range(3):
            f = phis[a]
            lo = [slice(None)] * 3
            hi = [slice(None)] * 3
            lo[a] = slice(0, -1)          # face on the cell's low side
            hi[a] = slice(1, None)        # face on the cell's high side
            f_lo, f_hi = f[tuple(lo)], f[tuple(hi)]
            # outflow faces contribute to the diagonal; inflow faces pull
            # the upwind neighbour's tau (zero outside the domain = inlet)
            diag += np.maximum(f_hi, 0.0) + np.maximum(-f_lo, 0.0)
            up_lo = np.roll(tau, 1, axis=a)
            sl0 = [slice(None)] * 3
            sl0[a] = 0
            up_lo[tuple(sl0)] = 0.0
            up_hi = np.roll(tau, -1, axis=a)
            slN = [slice(None)] * 3
            slN[a] = -1
            up_hi[tuple(slN)] = 0.0
            off += np.maximum(f_lo, 0.0) * up_lo \
                + np.maximum(-f_hi, 0.0) * up_hi
        tau_new = np.where(diag > 0.0,
                           (rho_arr * vol + off) / np.where(diag > 0.0,
                                                            diag, 1.0),
                           tau)
        delta = np.max(np.abs(tau_new - tau))
        tau = tau_new
        if delta <= tol * max(np.max(np.abs(tau)), 1e-300):
            break
    return tau


def interface_height(alpha, mesh: StructuredMesh, locations,
                     axis: int = 2):
    """interfaceHeight parity: for each (x, y) location, the height along
    `axis` of the phase interface, found by integrating the phase
    fraction up the column (the OpenFOAM hIntegral method, robust to
    smeared interfaces; no isovalue parameter — the integral method does
    not use one). Heights are returned in the mesh coordinate frame
    (column-base origin along `axis` added)."""
    a = np.asarray(alpha)
    d = (mesh.dx, mesh.dy, mesh.dz)[axis]
    heights = []
    for loc in locations:
        idx = []
        dims = [i for i in range(3) if i != axis]
        for li, dim in enumerate(dims):
            spac = (mesh.dx, mesh.dy, mesh.dz)[dim]
            org = (mesh.x0, mesh.y0, mesh.z0)[dim]
            idx.append(int(np.clip((loc[li] - org) / spac, 0,
                                   mesh.shape[dim] - 1)))
        sl = [0, 0, 0]
        sl[dims[0]], sl[dims[1]] = idx
        sl[axis] = slice(None)
        col = a[tuple(sl)]
        org_ax = (mesh.x0, mesh.y0, mesh.z0)[axis]
        # integral of alpha = height above the column base; shift into the
        # mesh coordinate frame along `axis`
        heights.append(float(col.sum() * d) + org_ax)
    return np.asarray(heights)


def xi_reaction_rate(b, Xi, Su, rho_u, mesh: StructuredMesh, bcs=None):
    """XiReactionRate parity: writes the turbulent flame speed St = Xi*Su
    and the reaction rate wdot = rho_u * St * |grad(b)| of a b-Xi premixed
    flame model (b = regress variable). Returns (St, wdot)."""
    import jax.numpy as jnp
    from ..ops.fv import grad as _grad
    from ..mesh.structured import zero_gradient
    if bcs is None:
        zg = (zero_gradient(), zero_gradient())
        bcs = (zg, zg, zg)
    g = _grad(jnp.asarray(b), bcs, mesh)
    mag_gb = np.sqrt(sum(np.asarray(gc) ** 2 for gc in g))
    St = np.asarray(Xi) * np.asarray(Su)
    return St, np.asarray(rho_u) * St * mag_gb


__all__ += ["randomise", "surface_interpolate", "NearWallFields",
            "processor_field", "ReadFields",
            "field_coordinate_system_transform", "StreamLine",
            "region_size_distribution", "blending_factor",
            "age", "interface_height", "xi_reaction_rate"]
