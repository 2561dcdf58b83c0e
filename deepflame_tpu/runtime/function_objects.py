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
           "FunctionObjectSet"]


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
        X, Y, Z = (np.asarray(a) for a in self.mesh.cell_centers())
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
        self.idx = []
        for (x, y, z) in points:
            i = int(np.clip((x - mesh.x0) / mesh.dx, 0, mesh.nx - 1))
            j = int(np.clip((y - mesh.y0) / mesh.dy, 0, mesh.ny - 1))
            k = int(np.clip((z - mesh.z0) / mesh.dz, 0, mesh.nz - 1))
            self.idx.append((i, j, k))
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
                 fields: Sequence[str], out_dir: str = "postProcessing/sample"):
        self.mesh = mesh
        self.axis = axis
        self.fields = tuple(fields)
        self.out_dir = out_dir
        j = int(np.clip((through[1] - mesh.y0) / mesh.dy, 0, mesh.ny - 1))
        k = int(np.clip((through[2] - mesh.z0) / mesh.dz, 0, mesh.nz - 1))
        i = int(np.clip((through[0] - mesh.x0) / mesh.dx, 0, mesh.nx - 1))
        self.fixed = (i, j, k)
        self.snapshots: dict[float, np.ndarray] = {}

    def __call__(self, time: float, fields: dict):
        cols = []
        m = self.mesh
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
