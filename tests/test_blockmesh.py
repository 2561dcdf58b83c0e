"""blockMesh-parity generator + polyMesh IO + general geometry.

Validates the unstructured-mesh ingestion path (mesh/geometry.py,
mesh/blockmesh.py, mesh/polymesh.py) against the structured backends and
against analytic invariants, including the reference's 6-block graded
axisymmetric wedge (twoD_SandiaD_flareFGM/system/blockMeshDict) — the first
reference mesh neither box backend can represent.
"""
import os
import tempfile

import jax.numpy as jnp
import numpy as np
import pytest

from deepflame_tpu.mesh import (StructuredMesh, fixed_value, zero_gradient,
                                fixed_gradient)
from deepflame_tpu.mesh.blockmesh import (build_blockmesh,
                                          build_blockmesh_raw,
                                          parse_blockmesh_dict,
                                          read_blockmesh)
from deepflame_tpu.mesh.facelist import from_structured, graded_box
from deepflame_tpu.mesh.polymesh import read_polymesh, write_polymesh
from deepflame_tpu.ops import fv_facelist as fvl
from deepflame_tpu.ops.linsolve import cg

SANDIA_DICT = ("/root/reference/examples/dfLowMachFoam/fgm/"
               "twoD_SandiaD_flareFGM/system/blockMeshDict")

BOX_DICT = """
convertToMeters 0.5;
vertices
(
    (0 0 0) (2 0 0) (2 1.4 0) (0 1.4 0)
    (0 0 1) (2 0 1) (2 1.4 1) (0 1.4 1)
);
blocks
(
    hex (0 1 2 3 4 5 6 7) (8 6 4) simpleGrading (1 1 1)
);
boundary
(
    xlo { type patch; faces ((0 4 7 3)); }
    xhi { type patch; faces ((1 2 6 5)); }
    ylo { type wall;  faces ((0 1 5 4)); }
    yhi { type wall;  faces ((3 7 6 2)); }
    zlo { type wall;  faces ((0 3 2 1)); }
    zhi { type wall;  faces ((4 5 6 7)); }
);
"""

GRADED_DICT = """
vertices
(
    (0 0 0) (1 0 0) (1 0.7 0) (0 0.7 0)
    (0 0 0.5) (1 0 0.5) (1 0.7 0.5) (0 0.7 0.5)
);
blocks
(
    hex (0 1 2 3 4 5 6 7) (8 6 4) simpleGrading (4 1 0.5)
);
boundary
(
    xlo { type patch; faces ((0 4 7 3)); }
    xhi { type patch; faces ((1 2 6 5)); }
    ylo { type wall;  faces ((0 1 5 4)); }
    yhi { type wall;  faces ((3 7 6 2)); }
    zlo { type wall;  faces ((0 3 2 1)); }
    zhi { type wall;  faces ((4 5 6 7)); }
);
"""

BOX_BCS = {"xlo": fixed_value(1.3), "xhi": zero_gradient(),
           "ylo": zero_gradient(), "yhi": fixed_gradient(0.7),
           "zlo": zero_gradient(), "zhi": zero_gradient()}

STRUCT_BCS = ((fixed_value(1.3), zero_gradient()),
              (zero_gradient(), fixed_gradient(0.7)),
              (zero_gradient(), zero_gradient()))


def _closedness(m):
    acc = np.zeros((m.n_cells, 3))
    sf = np.asarray(m.normal) * np.asarray(m.mag_sf)[:, None]
    np.add.at(acc, np.asarray(m.owner), sf)
    np.add.at(acc, np.asarray(m.neighbour), -sf)
    for p in m.patches:
        np.add.at(acc, np.asarray(p.owner),
                  np.asarray(p.normal) * np.asarray(p.mag_sf)[:, None])
    return np.abs(acc).max()


class TestBoxParity:
    """blockMesh box == from_structured on every geometric + operator datum."""

    def setup_method(self):
        gm = build_blockmesh(parse_blockmesh_dict(BOX_DICT))
        self.fl_b = gm.with_bcs(BOX_BCS)
        mesh = StructuredMesh.box([1.0, 0.7, 0.5], [8, 6, 4])
        self.fl_s = from_structured(mesh, STRUCT_BCS)
        rng = np.random.default_rng(7)
        self.x = jnp.asarray(rng.normal(size=(8 * 6 * 4,)) + 2.0)

    def test_geometry(self):
        np.testing.assert_allclose(self.fl_b.volumes, self.fl_s.volumes,
                                   rtol=1e-12)
        np.testing.assert_allclose(self.fl_b.centers, self.fl_s.centers,
                                   atol=1e-12)
        assert self.fl_b.n_faces == self.fl_s.n_faces

    def test_grad_parity(self):
        gb = fvl.grad_fl(self.fl_b, self.x)
        gs = fvl.grad_fl(self.fl_s, self.x)
        np.testing.assert_allclose(gb, gs, rtol=1e-10, atol=1e-10)

    def test_laplacian_solve_parity(self):
        for fl in (self.fl_b, self.fl_s):
            assert _closedness(fl) < 1e-12
        sols = []
        for fl in (self.fl_b, self.fl_s):
            gam = jnp.ones((fl.n_faces,))
            gb = [jnp.ones_like(p.mag_sf) for p in fl.patches]
            A = fvl.fvm_laplacian_fl(fl, gam, gb, sign=-1.0)
            A = A + fvl.fvm_source_implicit_fl(fl, jnp.full(
                (fl.n_cells,), 3.0))
            b = A.rhs() + self.x
            x0 = jnp.zeros_like(self.x)
            res = cg(A.apply, b, x0, tol=1e-12, max_iter=500,
                     M_inv=lambda r: r / A.diag())
            sols.append(res.x)
        np.testing.assert_allclose(sols[0], sols[1], rtol=1e-9, atol=1e-10)


def test_graded_matches_graded_box():
    gm = build_blockmesh(parse_blockmesh_dict(GRADED_DICT))
    fl_b = gm.with_bcs(BOX_BCS)
    # same geometric edge distribution as simpleGrading (4 1 0.5)
    from deepflame_tpu.mesh.blockmesh import _grading_points
    xe = _grading_points(8, 4.0) * 1.0
    ye = _grading_points(6, 1.0) * 0.7
    ze = _grading_points(4, 0.5) * 0.5
    fl_g = graded_box(xe, ye, ze, STRUCT_BCS)
    np.testing.assert_allclose(np.sort(np.asarray(fl_b.volumes)),
                               np.sort(np.asarray(fl_g.volumes)), rtol=1e-12)
    np.testing.assert_allclose(fl_b.centers, fl_g.centers, atol=1e-12)
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(8 * 6 * 4,)) + 2.0)
    np.testing.assert_allclose(fvl.grad_fl(fl_b, x), fvl.grad_fl(fl_g, x),
                               rtol=1e-9, atol=1e-10)


def test_polymesh_roundtrip():
    raw = build_blockmesh_raw(parse_blockmesh_dict(GRADED_DICT))
    gm0 = build_blockmesh(parse_blockmesh_dict(GRADED_DICT))
    with tempfile.TemporaryDirectory() as d:
        write_polymesh(d, *raw)
        gm1 = read_polymesh(d)
    np.testing.assert_allclose(gm0.volumes, gm1.volumes, rtol=1e-12)
    np.testing.assert_allclose(gm0.centers, gm1.centers, atol=1e-12)
    np.testing.assert_allclose(gm0.weights, gm1.weights, atol=1e-12)
    assert gm0.patch_names == gm1.patch_names


class TestSandiaWedge:
    """The reference's 6-block graded axisymmetric wedge mesh."""

    @classmethod
    def setup_class(cls):
        cls.gm = read_blockmesh(SANDIA_DICT)

    def test_counts_and_volume(self):
        gm = self.gm
        assert gm.n_cells == 5170
        # analytic wedge volume: full angle 2*atan(0.15718/3.6);
        # inner r<9.1mm spans z in [-100, 500] mm, outer to 150 mm spans
        # [0, 500] mm; planar wedge => V = tan(theta)*r^2 per unit z
        t = 0.15717942211764708 / 3.6
        # upstream (z in [-100,0]): jet pipe r<3.6mm + pilot annulus
        # 3.85..9.1mm (the tube wall 3.6..3.85mm is unmeshed solid)
        v_inner = (t * 0.0036 ** 2 * 0.1
                   + t * (0.0091 ** 2 - 0.00385 ** 2) * 0.1
                   + t * 0.0091 ** 2 * 0.5)
        v_outer = t * (0.15 ** 2 - 0.0091 ** 2) * 0.5
        np.testing.assert_allclose(gm.volumes.sum(), v_inner + v_outer,
                                   rtol=1e-10)
        assert (gm.volumes > 0).all()
        assert gm.non_ortho_deg.max() < 1.0

    def test_closed_cells(self):
        fl = self.gm.with_bcs({n: zero_gradient()
                               for n in self.gm.patch_names})
        assert _closedness(fl) < 1e-14

    def test_patch_areas(self):
        gm = self.gm
        areas = {p.name: float(p.mag_sf.sum()) for p in gm.patches}
        t = 0.15717942211764708 / 3.6
        # inletCH4: disc r<3.6mm at z=-100 => planar-wedge area t*r^2
        np.testing.assert_allclose(areas["inletCH4"], t * 0.0036 ** 2,
                                   rtol=1e-10)
        np.testing.assert_allclose(areas["outlet"], t * 0.15 ** 2,
                                   rtol=1e-10)
        # pilot annulus 3.85..9.1 mm
        np.testing.assert_allclose(areas["inletPilot"],
                                   t * (0.0091 ** 2 - 0.00385 ** 2),
                                   rtol=1e-10)
        assert areas["axis"] == 0.0

    @staticmethod
    def _to_scipy(A):
        """FvMatrixFL -> scipy CSR (validates coefficients via direct
        solve; the graded wedge with one small Dirichlet patch is too
        ill-conditioned for plain Jacobi-CG in a test budget)."""
        from scipy.sparse import coo_matrix
        m = A.mesh
        own = np.asarray(m.owner)
        nei = np.asarray(m.neighbour)
        inv_v = 1.0 / np.asarray(m.volumes)
        rows = np.concatenate([np.arange(m.n_cells), own, nei])
        cols = np.concatenate([np.arange(m.n_cells), nei, own])
        vals = np.concatenate([np.asarray(A.diag_c),
                               np.asarray(A.upper) * inv_v[own],
                               np.asarray(A.lower) * inv_v[nei]])
        return coo_matrix((vals, (rows, cols)),
                          shape=(m.n_cells, m.n_cells)).tocsr()

    def test_uniform_solution_invariant(self):
        """-laplacian(T) + c*T with outlet fixedValue(1), others
        zeroGradient: T == 1 solves exactly on the full unstructured wedge
        (Helmholtz shift keeps the system CG-friendly, as the real pEqn's
        compressibility diagonal does)."""
        bcs = {n: zero_gradient() for n in self.gm.patch_names}
        bcs["outlet"] = fixed_value(1.0)
        fl = self.gm.with_bcs(bcs)
        gam = jnp.ones((fl.n_faces,))
        gb = [jnp.ones_like(p.mag_sf) for p in fl.patches]
        A = fvl.fvm_laplacian_fl(fl, gam, gb, sign=-1.0)
        c = 0.1 * A.diag()
        A = A + fvl.fvm_source_implicit_fl(fl, c)
        b = A.rhs() + c
        x0 = jnp.zeros((fl.n_cells,))
        sol = cg(A.apply, b, x0, tol=1e-12, max_iter=5000,
                 M_inv=lambda r: r / A.diag()).x
        np.testing.assert_allclose(sol, 1.0, atol=1e-7)

    def test_axial_conduction_profile(self):
        """Fixed T on the z=-100mm inlets + fixed T at the outlet with
        insulated walls/wedges: the exact steady solution in the outer
        column (planar-wedge cross-section, area independent of z) is
        linear in z. Solved direct (scipy) to validate the assembled
        coefficients independent of iterative-solver conditioning."""
        bcs = {n: zero_gradient() for n in self.gm.patch_names}
        bcs["inletCH4"] = fixed_value(0.0)
        bcs["inletPilot"] = fixed_value(0.0)
        bcs["inletAir"] = fixed_value(0.0)
        bcs["outlet"] = fixed_value(1.0)
        fl = self.gm.with_bcs(bcs)
        gam = jnp.ones((fl.n_faces,))
        gb = [jnp.ones_like(p.mag_sf) for p in fl.patches]
        A = fvl.fvm_laplacian_fl(fl, gam, gb, sign=-1.0)
        from scipy.sparse.linalg import spsolve
        sol = spsolve(self._to_scipy(A), np.asarray(A.rhs()))
        # cells in the outer air column (r > 9.1mm): 1D conduction in z
        # between z=0 (T=0) and z=0.5 (T=1) => T = z/0.5
        ctr = np.asarray(self.gm.centers)
        outer = ctr[:, 0] > 0.0095
        z = ctr[outer, 2]
        np.testing.assert_allclose(sol[outer], z / 0.5, atol=5e-3)


def test_wedge_vector_flux_is_zero():
    """Advective flux through wedge patches must vanish exactly for any
    cell velocity (the diagonal-affine ghost alone would leak O(sin
    theta))."""
    gm = read_blockmesh(SANDIA_DICT)
    bcs = {n: zero_gradient() for n in gm.patch_names}
    m = gm.with_bcs(bcs)
    rng = np.random.default_rng(0)
    u = jnp.asarray(rng.normal(size=(gm.n_cells, 3)))
    _, phi_b = fvl.flux_of_fl(m, u)
    for p, fb in zip(m.patches, phi_b):
        if p.kind in ("wedge", "symmetry", "empty"):
            assert float(jnp.abs(fb).max(initial=0.0)) == 0.0


CYCLIC_DICT = """
vertices
(
    (0 0 0) (1 0 0) (1 0.7 0) (0 0.7 0)
    (0 0 0.1) (1 0 0.1) (1 0.7 0.1) (0 0.7 0.1)
);
blocks
(
    hex (0 1 2 3 4 5 6 7) (8 6 1) simpleGrading (1 1 1)
);
boundary
(
    left  { type cyclic; neighbourPatch right; faces ((0 4 7 3)); }
    right { type cyclic; neighbourPatch left;  faces ((1 2 6 5)); }
    ylo   { type wall;   faces ((0 1 5 4)); }
    yhi   { type wall;   faces ((3 7 6 2)); }
);
"""


def test_cyclic_pair_matches_structured():
    """Cyclic patch pairs become wrap interior faces: operators match
    from_structured with a cyclic axis (the temporally-evolving-jet /
    triple-flame mesh idiom; front/back fall into defaultFaces empty)."""
    from deepflame_tpu.mesh import cyclic, empty
    gm = build_blockmesh(parse_blockmesh_dict(CYCLIC_DICT))
    assert "left" not in gm.patch_names and "right" not in gm.patch_names
    assert "defaultFaces" in gm.patch_names
    bcs = {"ylo": fixed_value(0.3), "yhi": zero_gradient()}
    fl_b = gm.with_bcs(bcs)
    mesh = StructuredMesh.box([1.0, 0.7, 0.1], [8, 6, 1])
    sb = ((cyclic(), cyclic()), (fixed_value(0.3), zero_gradient()),
          (empty(), empty()))
    fl_s = from_structured(mesh, sb)
    assert fl_b.n_faces == fl_s.n_faces
    np.testing.assert_allclose(fl_b.volumes, fl_s.volumes, rtol=1e-12)
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.normal(size=(8 * 6,)) + 2.0)
    np.testing.assert_allclose(fvl.grad_fl(fl_b, x), fvl.grad_fl(fl_s, x),
                               rtol=1e-10, atol=1e-12)
    gam_b = jnp.ones((fl_b.n_faces,))
    gb_b = [jnp.ones_like(p.mag_sf) for p in fl_b.patches]
    gb_s = [jnp.ones_like(p.mag_sf) for p in fl_s.patches]
    A_b = fvl.fvm_laplacian_fl(fl_b, gam_b, gb_b, sign=-1.0)
    A_s = fvl.fvm_laplacian_fl(fl_s, jnp.ones((fl_s.n_faces,)), gb_s,
                               sign=-1.0)
    np.testing.assert_allclose(A_b.apply(x), A_s.apply(x), rtol=1e-10,
                               atol=1e-10)
    np.testing.assert_allclose(A_b.rhs(), A_s.rhs(), rtol=1e-10, atol=1e-12)


def test_multigrading_points():
    """Multi-section simpleGrading tiles the block exactly and matches the
    single-ratio generator segment-by-segment."""
    from deepflame_tpu.mesh.blockmesh import _grading_points
    pts = _grading_points(10, [(0.6, 0.4, 0.25), (0.4, 0.6, 1.0)])
    assert len(pts) == 11
    assert pts[0] == 0.0 and abs(pts[-1] - 1.0) < 1e-14
    assert (np.diff(pts) > 0).all()
    # first segment: 4 cells over 0.6 with ratio 0.25
    seg = _grading_points(4, 0.25) * 0.6
    np.testing.assert_allclose(pts[:5], seg, rtol=1e-12)
    # second: 6 uniform cells over the remaining 0.4
    np.testing.assert_allclose(np.diff(pts[4:]), 0.4 / 6, rtol=1e-12)


def test_wedge_kind_is_geometric():
    """Wedge patches keep kind='wedge' even when a field spec names them
    with another BC — the solvers' exact zero-flux rules key on the kind;
    a relabeled wedge silently leaks O(sin theta) flux through BOTH tilted
    sides (same-signed normals), which multiplied jet fluid 19x in the
    Sandia D case before this rule."""
    gm = read_blockmesh(SANDIA_DICT)
    spec = {n: zero_gradient() for n in gm.patch_names}  # naive user spec
    fl = gm.with_bcs(spec)
    kinds = {p.name: p.kind for p in fl.patches}
    assert kinds["frontAndBack_pos"] == "wedge"
    assert kinds["frontAndBack_neg"] == "wedge"
    assert kinds["axis"] == "empty"
    # and the advective boundary flux through them is exactly zero
    rng = np.random.default_rng(1)
    u = jnp.asarray(rng.normal(size=(gm.n_cells, 3)))
    _, phi_b = fvl.flux_of_fl(fl, u)
    for p, fb in zip(fl.patches, phi_b):
        if p.kind == "wedge":
            assert float(jnp.abs(fb).max(initial=0.0)) == 0.0


def test_wall_functions_fl_matches_structured():
    """WallFunctionsFL masks/values on a box == the structured
    WallFunctions for the same geometry (wall-adjacent layer, wall
    distance, nutk/epsilon values)."""
    from deepflame_tpu.turbulence.wall_functions import WallFunctions
    from deepflame_tpu.turbulence.wall_functions_fl import (
        make_wall_functions_fl)
    gm = build_blockmesh(parse_blockmesh_dict(BOX_DICT))
    wf_fl = make_wall_functions_fl(gm, ("ylo", "yhi"))
    mesh = StructuredMesh.box([1.0, 0.7, 0.5], [8, 6, 4])
    wf_s = WallFunctions.for_walls(mesh, ((1, 0), (1, 1)),
                                   dtype=jnp.float64)
    np.testing.assert_allclose(np.asarray(wf_fl.mask),
                               np.asarray(wf_s.mask).reshape(-1))
    m = np.asarray(wf_fl.mask) > 0
    np.testing.assert_allclose(np.asarray(wf_fl.y)[m],
                               np.asarray(wf_s.y).reshape(-1)[m],
                               rtol=1e-12)
    rng = np.random.default_rng(2)
    k = jnp.asarray(rng.uniform(1.0, 50.0, mesh.n_cells))
    rho = jnp.full((mesh.n_cells,), 1.2)
    mu = jnp.full((mesh.n_cells,), 1.8e-5)
    nut_fl = np.asarray(wf_fl.nut(rho, k, mu))
    nut_s = np.asarray(wf_s.nut(rho.reshape(mesh.shape),
                                k.reshape(mesh.shape),
                                mu.reshape(mesh.shape))).reshape(-1)
    np.testing.assert_allclose(nut_fl[m], nut_s[m], rtol=1e-10)
    eps_fl = np.asarray(wf_fl.epsilon(k))
    eps_s = np.asarray(wf_s.epsilon(k.reshape(mesh.shape))).reshape(-1)
    np.testing.assert_allclose(eps_fl[m], eps_s[m], rtol=1e-10)
