"""Non-orthogonal + skewness correction on face-list meshes.

Role parity: OpenFOAM's `laplacian(gamma,x) Gauss linear corrected` +
nonOrthogonalCorrectors loop (reference pEqn, SURVEY §3.1) and
skew-corrected interpolation. The face-list laplacian keeps only the
over-relaxed orthogonal part implicit; on non-orthogonal meshes the
cross-diffusion k_no . grad_f(x) must be added as a deferred source
(ops/fv_facelist.py laplacian_nonortho_corr_fl) or the scheme drops to
first order. The test solves a manufactured Poisson problem on a uniformly
sheared hex mesh (26.6 deg non-orthogonality) and checks second-order
convergence is restored by the correction.
"""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deepflame_tpu.mesh import fixed_value, zero_gradient
from deepflame_tpu.mesh.geometry import build_general_mesh
from deepflame_tpu.ops.fv_facelist import (fvm_laplacian_fl,
                                           interpolate_fl,
                                           interpolate_skew_fl,
                                           laplacian_nonortho_corr_fl)
from deepflame_tpu.ops.linsolve import cg


def sheared_box(n, alpha, lz=0.1):
    """n x n x 1 hex mesh of the unit square sheared x -> x + alpha*y:
    a uniform parallelogram mesh whose y-faces keep +y normals while cell
    centers offset by alpha*dy — constant non-orthogonality atan(alpha)."""
    xs = np.linspace(0.0, 1.0, n + 1)
    ys = np.linspace(0.0, 1.0, n + 1)
    zs = np.array([0.0, lz])

    def pid(i, j, k):
        return (i * (n + 1) + j) * 2 + k

    pts = np.zeros(((n + 1) * (n + 1) * 2, 3))
    for i in range(n + 1):
        for j in range(n + 1):
            for k in range(2):
                pts[pid(i, j, k)] = [xs[i] + alpha * ys[j], ys[j], zs[k]]

    def cid(i, j):
        return i * n + j

    faces, owner, neighbour = [], [], []
    # interior faces with owner->neighbour normals (+x then +y)
    for i in range(n - 1):
        for j in range(n):
            faces.append([pid(i + 1, j, 0), pid(i + 1, j + 1, 0),
                          pid(i + 1, j + 1, 1), pid(i + 1, j, 1)])
            owner.append(cid(i, j))
            neighbour.append(cid(i + 1, j))
    for i in range(n):
        for j in range(n - 1):
            faces.append([pid(i, j + 1, 0), pid(i, j + 1, 1),
                          pid(i + 1, j + 1, 1), pid(i + 1, j + 1, 0)])
            owner.append(cid(i, j))
            neighbour.append(cid(i, j + 1))
    n_int = len(faces)

    patch_defs = []

    def add_patch(name, ftype, quads, owners):
        start = len(faces)
        faces.extend(quads)
        owner.extend(owners)
        patch_defs.append((name, ftype, start, len(quads)))

    # outward normals: -x, +x, -y, +y, then the two z planes as empty
    add_patch("x_lo", "patch",
              [[pid(0, j, 0), pid(0, j, 1), pid(0, j + 1, 1),
                pid(0, j + 1, 0)] for j in range(n)],
              [cid(0, j) for j in range(n)])
    add_patch("x_hi", "patch",
              [[pid(n, j, 0), pid(n, j + 1, 0), pid(n, j + 1, 1),
                pid(n, j, 1)] for j in range(n)],
              [cid(n - 1, j) for j in range(n)])
    add_patch("y_lo", "patch",
              [[pid(i, 0, 0), pid(i + 1, 0, 0), pid(i + 1, 0, 1),
                pid(i, 0, 1)] for i in range(n)],
              [cid(i, 0) for i in range(n)])
    add_patch("y_hi", "patch",
              [[pid(i, n, 0), pid(i, n, 1), pid(i + 1, n, 1),
                pid(i + 1, n, 0)] for i in range(n)],
              [cid(i, n - 1) for i in range(n)])
    zlo, zhi, ozs = [], [], []
    for i in range(n):
        for j in range(n):
            zlo.append([pid(i, j, 0), pid(i, j + 1, 0),
                        pid(i + 1, j + 1, 0), pid(i + 1, j, 0)])
            zhi.append([pid(i, j, 1), pid(i + 1, j, 1),
                        pid(i + 1, j + 1, 1), pid(i, j + 1, 1)])
            ozs.append(cid(i, j))
    add_patch("z_lo", "empty", zlo, ozs)
    add_patch("z_hi", "empty", zhi, ozs)

    return build_general_mesh(pts, faces, np.asarray(owner),
                              np.asarray(neighbour), patch_defs)


def _exact(xy):
    return np.sin(np.pi * xy[:, 0]) * np.sin(np.pi * xy[:, 1])


def _solve_poisson(gm, corrected: bool):
    """-laplacian(u) = f with Dirichlet BCs from the exact solution at
    boundary face centroids; deferred-correction outer iterations when
    corrected=True. Returns L2 error vs the exact cell-center values."""
    bcs = {}
    for p in gm.patches:
        if p.ftype == "empty":
            continue
        bcs[p.name] = fixed_value(jnp.asarray(_exact(p.f_ctr)))
    m = gm.with_bcs(bcs, jnp.float64)
    assert m.k_no is not None     # the sheared mesh IS non-orthogonal
    nf = m.n_faces
    ones_f = jnp.ones((nf,))
    gamma_b = [jnp.ones_like(p.mag_sf) for p in m.patches]
    eqn = fvm_laplacian_fl(m, ones_f, gamma_b, jnp.float64, sign=-1.0)
    f = 2.0 * np.pi ** 2 * _exact(np.asarray(gm.centers))
    b0 = eqn.rhs() + jnp.asarray(f)
    Vn = m.volumes / jnp.mean(m.volumes)
    A = lambda x: eqn.apply(x) * Vn
    d = eqn.diag() * Vn
    d_inv = 1.0 / jnp.where(jnp.abs(d) > 1e-300, d, 1.0)
    u = jnp.zeros((m.n_cells,))
    n_outer = 40 if corrected else 1
    for _ in range(n_outer):
        src = (laplacian_nonortho_corr_fl(m, ones_f, u)
               if corrected else 0.0)
        res = cg(A, (b0 + src) * Vn, u, lambda r: d_inv * r,
                 tol=1e-12, max_iter=4000)
        u = res.x
    err = np.asarray(u) - _exact(np.asarray(gm.centers))
    V = np.asarray(gm.volumes)
    return float(np.sqrt((err ** 2 * V).sum() / V.sum()))


def test_nonortho_correction_restores_second_order():
    """At alpha=0.5 (26.6 deg): corrected scheme converges ~O(h^2); the
    uncorrected orthogonal-only operator is substantially less accurate."""
    alpha = 0.5
    e16c = _solve_poisson(sheared_box(16, alpha), corrected=True)
    e32c = _solve_poisson(sheared_box(32, alpha), corrected=True)
    order = np.log2(e16c / e32c)
    assert order > 1.7, (e16c, e32c, order)
    e32u = _solve_poisson(sheared_box(32, alpha), corrected=False)
    assert e32u > 3.0 * e32c, (e32u, e32c)


def test_skew_interpolation_exact_for_linear():
    """skewCorrected interpolation reproduces a linear field exactly at
    face centroids on a skewed mesh; plain linear interpolation does not
    (it lands on the own-nei line, not the centroid)."""
    gm = sheared_box(8, 0.5)
    bcs = {p.name: zero_gradient() for p in gm.patches
           if p.ftype != "empty"}
    m = gm.with_bcs(bcs, jnp.float64)
    g = np.array([1.3, -0.7, 0.2])
    xc = jnp.asarray(np.asarray(gm.centers) @ g)
    exact_f = np.asarray(gm.f_ctr) @ g
    plain = np.asarray(interpolate_fl(m, xc))
    if m.skew is not None:
        skewed = np.asarray(interpolate_skew_fl(m, xc))
        assert np.abs(skewed - exact_f).max() < 1e-12
        assert np.abs(skewed - exact_f).max() <= np.abs(plain - exact_f).max()
    else:
        # mesh turned out skew-free: plain linear must already be exact
        assert np.abs(plain - exact_f).max() < 1e-12


def test_orthogonal_mesh_correction_is_free():
    """On an orthogonal box (from blockmesh-style straight grid) k_no/skew
    are dropped (None) and the corrected laplacian is bit-identical."""
    gm = sheared_box(8, 0.0)
    bcs = {p.name: zero_gradient() for p in gm.patches
           if p.ftype != "empty"}
    m = gm.with_bcs(bcs, jnp.float64)
    assert m.k_no is None and m.skew is None
