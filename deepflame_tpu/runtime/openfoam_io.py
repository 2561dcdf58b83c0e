"""OpenFOAM field-file import: run reference cases on their exact data.

Role parity: OpenFOAM IOobject field reading — lets this framework consume
the reference's shipped case directories directly (e.g. the nonuniform
initial fields of test/dfLowMachFoam/twoD_reactingTGV), so anchors can be
run on bit-identical initial conditions.

Supports ascii volScalarField/volVectorField internalField entries
(uniform and nonuniform List<scalar|vector>), plain or .gz. Cell ordering
follows blockMesh: x varies fastest, then y, then z.
"""
from __future__ import annotations

import gzip
import os
import re

import numpy as np

__all__ = ["read_openfoam_field_flat", "read_openfoam_field", "read_case_fields"]


def _read_text(path: str) -> str:
    if os.path.exists(path + ".gz"):
        with gzip.open(path + ".gz", "rt") as f:
            return f.read()
    with open(path) as f:
        return f.read()


def read_openfoam_field_flat(path: str) -> np.ndarray:
    """internalField as a FLAT array in the file's own (OpenFOAM) cell
    order: (n,) scalar or (n, 3) vector; uniform fields raise (caller
    should broadcast) unless a count can't be known. For blockmesh-built
    face-list meshes compose with mesh.blockmesh.openfoam_cell_order."""
    text = _read_text(path)
    m = re.search(r"internalField\s+nonuniform\s+List<(scalar|vector)>\s*"
                  r"\n?\s*(\d+)\s*\n?\s*\(", text)
    if not m:
        mu = re.search(r"internalField\s+uniform\s+\(([^)]*)\)\s*;", text)
        if mu:
            return np.array([float(t) for t in mu.group(1).split()])
        mu = re.search(r"internalField\s+uniform\s+([-\d.eE+]+)\s*;", text)
        if mu:
            return np.array([float(mu.group(1))])
        raise ValueError(f"cannot parse internalField in {path}")
    kind, count = m.group(1), int(m.group(2))
    body_start = m.end()
    depth = 1
    i = body_start
    while depth > 0:
        c = text[i]
        if c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
        i += 1
    body = text[body_start:i - 1]
    nums = np.array(body.replace("(", " ").replace(")", " ").split(),
                    dtype=np.float64)
    if kind == "scalar":
        assert nums.size == count
        return nums
    assert nums.size == 3 * count
    return nums.reshape(count, 3)


def read_openfoam_field(path: str, shape) -> np.ndarray:
    """Read internalField into (nx, ny, nz) (scalar) or (3, nx, ny, nz)
    (vector). `shape` = (nx, ny, nz) of the blockMesh."""
    nx, ny, nz = shape
    n = nx * ny * nz
    text = _read_text(path)
    m = re.search(r"internalField\s+uniform\s+\(([^)]*)\)\s*;", text)
    if m:  # uniform vector
        vals = np.array([float(t) for t in m.group(1).split()])
        out = np.broadcast_to(vals[:, None], (3, n)).copy()
        return _reshape_vec(out, shape)
    m = re.search(r"internalField\s+uniform\s+([-\d.eE+]+)\s*;", text)
    if m:  # uniform scalar
        return np.full(shape, float(m.group(1)))
    m = re.search(r"internalField\s+nonuniform\s+List<(scalar|vector)>\s*"
                  r"\n?\s*(\d+)\s*\n?\s*\(", text)
    if not m:
        raise ValueError(f"cannot parse internalField in {path}")
    kind, count = m.group(1), int(m.group(2))
    assert count == n, f"{path}: field has {count} cells, mesh has {n}"
    body_start = m.end()
    # find matching closing paren of the list: scan to ');' at depth 0
    depth = 1
    i = body_start
    while depth > 0:
        c = text[i]
        if c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
        i += 1
    body = text[body_start:i - 1]
    nums = np.array(body.replace("(", " ").replace(")", " ").split(),
                    dtype=np.float64)
    if kind == "scalar":
        assert nums.size == n
        return nums.reshape(nz, ny, nx).transpose(2, 1, 0)
    assert nums.size == 3 * n
    vec = nums.reshape(n, 3).T
    return _reshape_vec(vec, shape)


def _reshape_vec(vec_flat: np.ndarray, shape) -> np.ndarray:
    nx, ny, nz = shape
    return vec_flat.reshape(3, nz, ny, nx).transpose(0, 3, 2, 1)


def read_case_fields(case_dir: str, time: str, names, shape) -> dict:
    """Read several fields from <case>/<time>/<name>."""
    return {name: read_openfoam_field(os.path.join(case_dir, time, name),
                                      shape)
            for name in names}
