"""FV operator layer validation (SURVEY.md §7 stage 3).

Checks exactness on polynomial fields, 2nd-order convergence, exact diagonal
extraction vs brute force, and Krylov solves vs dense numpy solutions — the
float64 reference-diff pattern the reference only has as its DEBUG_ flag
(/root/reference/src_gpu/dfMatrixDataBase.H:52-64).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.smoke

from deepflame_tpu.mesh import (StructuredMesh, fixed_value, zero_gradient,
                                cyclic, empty)
from deepflame_tpu.ops import (grad, div_flux, laplacian_explicit, fvm_ddt,
                               fvm_div, fvm_laplacian, solve_fvmatrix)
from deepflame_tpu.ops.fv import FvMatrix


def bcs_all(bc):
    return ((bc, bc), (bc, bc), (bc, bc))


def test_grad_linear_exact():
    mesh = StructuredMesh.box([1.0, 2.0, 0.5], [8, 10, 6])
    X, Y, Z = mesh.cell_centers()
    f = 2.0 * X + 3.0 * Y - 1.5 * Z
    # zeroGradient ghosts would corrupt a linear profile at boundaries; use
    # fixedGradient-free interior check: cyclic won't match either, so check
    # interior cells only with zeroGradient padding
    g = grad(f, bcs_all(zero_gradient()), mesh)
    gi = np.asarray(g)[:, 2:-2, 2:-2, 2:-2]
    np.testing.assert_allclose(gi[0], 2.0, rtol=1e-12)
    np.testing.assert_allclose(gi[1], 3.0, rtol=1e-12)
    np.testing.assert_allclose(gi[2], -1.5, rtol=1e-12)


def test_laplacian_quadratic_exact():
    mesh = StructuredMesh.box([1.0, 1.0, 1.0], [12, 12, 12])
    X, Y, Z = mesh.cell_centers()
    f = X**2 + 2.0 * Y**2 - Z**2
    lap = laplacian_explicit(1.0, f, bcs_all(zero_gradient()), mesh)
    li = np.asarray(lap)[2:-2, 2:-2, 2:-2]
    np.testing.assert_allclose(li, 2.0 + 4.0 - 2.0, rtol=1e-10)


def test_laplacian_convergence_order():
    errs = []
    for n in (16, 32, 64):
        mesh = StructuredMesh.box([1.0, 1.0, 1.0 / n], [n, n, 1])
        X, Y, _ = mesh.cell_centers()
        f = jnp.sin(2 * jnp.pi * X) * jnp.sin(2 * jnp.pi * Y)
        exact = -8.0 * jnp.pi**2 * f
        bcs = ((cyclic(), cyclic()), (cyclic(), cyclic()), (empty(), empty()))
        lap = laplacian_explicit(1.0, f, bcs, mesh)
        errs.append(float(jnp.max(jnp.abs(lap - exact))))
    order = np.log2(errs[0] / errs[1])
    assert 1.8 < order < 2.2, (errs, order)


def test_diag_matches_bruteforce():
    mesh = StructuredMesh.box([1.0, 1.0, 1.0], [4, 3, 2])
    rng = np.random.default_rng(0)
    bcs = ((fixed_value(1.0), zero_gradient()),
           (cyclic(), cyclic()),
           (fixed_value(0.0), zero_gradient()))
    phi = tuple(jnp.asarray(rng.normal(size=s))
                for s in [(5, 3, 2), (4, 4, 2), (4, 3, 3)])
    x_old = jnp.asarray(rng.normal(size=(4, 3, 2)))
    eqn = (fvm_ddt(1.2, x_old, 0.1, mesh, bcs)
           + fvm_div(phi, x_old, mesh, bcs, "upwind")
           + fvm_laplacian(0.7, mesh, bcs, sign=-1.0))
    # brute force diagonal: apply to unit basis vectors
    n = mesh.n_cells
    diag_bf = np.zeros(mesh.shape)
    for idx in np.ndindex(*mesh.shape):
        e = np.zeros(mesh.shape)
        e[idx] = 1.0
        diag_bf[idx] = float(eqn.apply(jnp.asarray(e))[idx])
    np.testing.assert_allclose(np.asarray(eqn.diag()), diag_bf, rtol=1e-12)


def test_poisson_1d_vs_analytic():
    """-d2u/dx2 = 1, u(0)=u(1)=0 -> u = x(1-x)/2."""
    n = 64
    mesh = StructuredMesh.box([1.0, 1.0 / n, 1.0 / n], [n, 1, 1])
    bcs = ((fixed_value(0.0), fixed_value(0.0)),
           (empty(), empty()), (empty(), empty()))
    eqn = fvm_laplacian(1.0, mesh, bcs, sign=-1.0).with_source(
        jnp.ones(mesh.shape))
    res = solve_fvmatrix(eqn, jnp.zeros(mesh.shape), symmetric=True, tol=1e-12)
    X, _, _ = mesh.cell_centers()
    exact = X * (1.0 - X) / 2.0
    # discrete solution differs from the continuum by O(h^2) (ghost-cell
    # Dirichlet: h^2/8 ~ 3.8e-5 at n=64)
    np.testing.assert_allclose(np.asarray(res.x), np.asarray(exact),
                               atol=1.0 / 64**2)
    assert float(res.final_residual) < 1e-10


def test_krylov_vs_dense():
    """Random advection-diffusion FvMatrix solved by BiCGStab == dense solve."""
    mesh = StructuredMesh.box([1.0, 1.0, 1.0], [5, 4, 3])
    rng = np.random.default_rng(1)
    bcs = ((fixed_value(0.3), zero_gradient()),
           (zero_gradient(), fixed_value(1.0)),
           (cyclic(), cyclic()))
    phi = tuple(jnp.asarray(rng.normal(size=s))
                for s in [(6, 4, 3), (5, 5, 3), (5, 4, 4)])
    x_old = jnp.asarray(rng.normal(size=mesh.shape))
    eqn = (fvm_ddt(1.0, x_old, 0.05, mesh, bcs)
           + fvm_div(phi, x_old, mesh, bcs, "upwind")
           + fvm_laplacian(0.3, mesh, bcs, sign=-1.0))
    n = mesh.n_cells
    A = np.zeros((n, n))
    for j in range(n):
        e = np.zeros(n)
        e[j] = 1.0
        A[:, j] = np.asarray(eqn.apply(jnp.asarray(e.reshape(mesh.shape)))).ravel()
    b = np.asarray(eqn.rhs()).ravel()
    x_dense = np.linalg.solve(A, b)
    res = solve_fvmatrix(eqn, jnp.zeros(mesh.shape), tol=1e-13, max_iter=2000)
    np.testing.assert_allclose(np.asarray(res.x).ravel(), x_dense, atol=1e-8)


def test_heat_equation_conservation():
    """Implicit heat marching with zeroGradient: total energy conserved,
    approaches uniform steady state."""
    mesh = StructuredMesh.box([1.0, 1.0, 0.1], [16, 16, 1])
    bcs = bcs_all(zero_gradient())
    rng = np.random.default_rng(2)
    T = jnp.asarray(rng.uniform(300, 400, mesh.shape))
    total0 = float(jnp.sum(T))
    dt = 0.01
    for _ in range(20):
        eqn = fvm_ddt(1.0, T, dt, mesh, bcs) + fvm_laplacian(
            0.1, mesh, bcs, sign=-1.0)
        T = solve_fvmatrix(eqn, T, symmetric=True, tol=1e-12).x
    assert abs(float(jnp.sum(T)) - total0) / total0 < 1e-9
    assert float(jnp.std(T)) < 0.2 * float(np.std(rng.uniform(300, 400, mesh.shape)))


def test_upwind_advection_step():
    """1D cyclic advection of a top-hat by implicit upwind: bounded, mass
    conserved."""
    n = 64
    mesh = StructuredMesh.box([1.0, 1.0 / n, 1.0 / n], [n, 1, 1])
    bcs = ((cyclic(), cyclic()), (empty(), empty()), (empty(), empty()))
    u = 1.0
    phi = (jnp.full((n + 1, 1, 1), u), jnp.zeros((n, 2, 1)), jnp.zeros((n, 1, 2)))
    X, _, _ = mesh.cell_centers()
    psi = jnp.where((X > 0.25) & (X < 0.5), 1.0, 0.0)
    mass0 = float(jnp.sum(psi))
    dt = 0.5 / n
    for _ in range(10):
        eqn = fvm_ddt(1.0, psi, dt, mesh, bcs) + fvm_div(phi, psi, mesh, bcs,
                                                         "upwind")
        psi = solve_fvmatrix(eqn, psi, tol=1e-12).x
    psi_n = np.asarray(psi)
    assert psi_n.min() > -1e-8 and psi_n.max() < 1.0 + 1e-8
    assert abs(float(jnp.sum(psi)) - mass0) / mass0 < 1e-9
    # profile has moved downstream: center of mass advanced by ~u*t
    com0, com = 0.375, float((X.squeeze() * psi_n.squeeze()).sum() / psi_n.sum())
    assert 0.37 < com - 10 * dt * 0 and com > com0 + 0.5 * 10 * dt * u / 1.0 - 0.05


@pytest.mark.slow   # ~110 s on 1 CPU; the core limiters are covered by
# the convection-scheme tests above
def test_extended_limiter_family():
    """minmod/MUSCL/superBee/QUICK/vanAlbada/OSPRE convection schemes:
    (a) all are TVD on a 1D advected step (no new extrema), (b) all
    reduce to psi(1)=1 second-order accuracy on a smooth profile (more
    accurate than upwind), (c) conservation: sum of fluxes telescopes."""
    import jax
    from deepflame_tpu.mesh import StructuredMesh, cyclic, empty
    from deepflame_tpu.ops.fv import fvm_div, fvm_ddt
    from deepflame_tpu.ops.linsolve import solve_fvmatrix

    n = 64
    L = 1.0
    mesh = StructuredMesh.box([L, L / n, L / n], [n, 1, 1])
    b = ((cyclic(), cyclic()), (empty(), empty()), (empty(), empty()))
    u = 1.0
    phi = (jnp.full((n + 1, 1, 1), u), jnp.zeros((n, 2, 1)),
           jnp.zeros((n, 1, 2)))
    X, _, _ = mesh.cell_centers()
    dt = 0.5 * (L / n) / u      # CFL 0.5
    rho = jnp.ones(mesh.shape)

    def advect(q0, scheme, steps):
        q = q0
        for _ in range(steps):
            eqn = (fvm_ddt(rho, q, dt, mesh, b)
                   + fvm_div(phi, q, mesh, b, scheme))
            q = solve_fvmatrix(eqn, q, tol=1e-12, max_iter=200).x
        return q

    step0 = jnp.where((X > 0.2) & (X < 0.5), 1.0, 0.0)
    smooth0 = jnp.sin(2 * jnp.pi * X / L) ** 4
    err_up = None
    for scheme in ("upwind", "minmod", "MUSCL", "superBee", "QUICK",
                   "vanAlbada", "OSPRE"):
        q = advect(step0, scheme, 20)
        qn = np.asarray(q)
        assert qn.min() > -1e-8 and qn.max() < 1.0 + 1e-8, scheme  # TVD
        # conservation
        np.testing.assert_allclose(float(q.sum()), float(step0.sum()),
                                   rtol=1e-10, err_msg=scheme)
        qs = advect(smooth0, scheme, 20)
        # L1 error vs exact (shifted by u*t)
        shift = 20 * dt * u
        exact = np.sin(2 * np.pi * ((np.asarray(X) - shift) % L) / L) ** 4
        e = np.abs(np.asarray(qs) - exact.reshape(qs.shape)).mean()
        if scheme == "upwind":
            err_up = e
        else:
            assert e < err_up * 0.85, (scheme, e, err_up)


def test_vmapped_krylov_converged_lane_overrun_f32():
    """Under vmap, while_loop batching iterates EVERY lane until the slowest
    finishes; a converged BiCGStab/CG lane must freeze instead of breaking
    down (f32 residual underflow -> NaN; seen in the 2D reacting TGV run as
    whole-field species NaNs at ignition)."""
    from deepflame_tpu.ops.linsolve import bicgstab, cg

    n = 64
    rng = np.random.default_rng(0)
    # lane 0: trivially conditioned (converges in ~1 iter); lane 1: stiff
    # tridiagonal system needing many iterations
    def make_A(eps):
        def A(x):
            xm = jnp.roll(x, 1)
            xp = jnp.roll(x, -1)
            return (2.0 + eps) * x - xm - xp
        return A

    b0 = jnp.asarray(rng.normal(size=n), jnp.float32)
    x0 = jnp.zeros(n, jnp.float32)

    def solve_one(eps, b, solver):
        def A(x):
            xm = jnp.roll(x, 1)
            xp = jnp.roll(x, -1)
            return (2.0 + eps) * x - xm - xp
        return solver(A, b, x0, None, 1e-6, 0.0, 2000)

    for solver in (bicgstab, cg):
        eps = jnp.asarray([100.0, 1e-4], jnp.float32)   # easy + hard lanes
        # the easy lane's RHS sits at trace-species scale: its raw residual
        # dot products underflow f32 once converged, which is exactly the
        # breakdown regime
        bb = jnp.stack([b0 * 1e-18, b0])
        res = jax.vmap(lambda e, b: solve_one(e, b, solver))(eps, bb)
        assert bool(jnp.all(jnp.isfinite(res.x))), solver.__name__
        # both lanes actually solved their system
        for k in range(2):
            A = make_A(float(eps[k]))
            bk = np.asarray(bb[k])
            r = np.asarray(A(res.x[k]) - bk)
            # lane 0 sits at the f32 underflow floor by design — only a
            # loose relative accuracy is meaningful there; the hard lane
            # must be properly solved
            tol_k = 5e-2 if k == 0 else 5e-3
            assert np.abs(r).max() < tol_k * np.abs(bk).max(), \
                (solver.__name__, k)


def test_limited_linear01_bounds_face_values():
    """limitedLinear01 (fvSchemes div(phi,Yi) in every shipped low-Mach
    case): identical to limitedLinear for in-bounds fields, and clamps the
    face value to [0,1] when cell values overshoot."""
    from deepflame_tpu.mesh import StructuredMesh, cyclic, empty
    from deepflame_tpu.mesh.structured import pad_field
    from deepflame_tpu.ops.fv import limited_face_values

    n = 32
    mesh = StructuredMesh.box([1.0, 1.0 / n, 1.0 / n], [n, 1, 1])
    b = ((cyclic(), cyclic()), (empty(), empty()), (empty(), empty()))
    X, _, _ = mesh.cell_centers()
    phi_x = jnp.ones((n + 1, 1, 1))

    q = 0.5 + 0.4 * jnp.sin(2 * jnp.pi * X)          # in [0.1, 0.9]
    P = pad_field(q, b, mesh)
    f_ll = limited_face_values(P, phi_x, 0, "limitedLinear", 1.0, b)
    f_01 = limited_face_values(P, phi_x, 0, "limitedLinear01", 1.0, b)
    np.testing.assert_allclose(np.asarray(f_01), np.asarray(f_ll), rtol=1e-14)

    q2 = q.at[5, 0, 0].set(1.3).at[9, 0, 0].set(-0.2)  # overshoots
    P2 = pad_field(q2, b, mesh)
    f2 = np.asarray(limited_face_values(P2, phi_x, 0, "limitedLinear01",
                                        1.0, b))
    fll = np.asarray(limited_face_values(P2, phi_x, 0, "limitedLinear",
                                         1.0, b))
    # the 01 bound limits the LIMITER (OpenFOAM Limited01): faces whose
    # upwind value is in-bounds stay in [0,1]; an out-of-bounds upwind value
    # passes through (a limiter can only blend toward central) but is never
    # pushed further out than plain limitedLinear
    up2 = np.asarray(q2[:, 0, 0])            # u > 0: upwind = owner cell
    in_bounds_up = np.concatenate([[True], (up2 >= 0) & (up2 <= 1)])
    f2f = f2[:, 0, 0]
    assert f2f[in_bounds_up].min() >= -1e-14
    assert f2f[in_bounds_up].max() <= 1.0 + 1e-14
    assert (f2f <= fll[:, 0, 0].max() + 1e-14).all()


def test_interpolate_cubic_exact_on_cubics():
    """interpolate_cubic (fvSchemes div(hDiffCorrFlux) Gauss cubic): exact
    for cubic polynomials on a uniform periodic mesh, and strictly more
    accurate than linear on a smooth non-polynomial profile."""
    from deepflame_tpu.mesh import StructuredMesh, cyclic, empty
    from deepflame_tpu.mesh.structured import pad_field
    from deepflame_tpu.ops.fv import interpolate, interpolate_cubic

    n = 32
    mesh = StructuredMesh.box([1.0, 1.0 / n, 1.0 / n], [n, 1, 1])
    b = ((cyclic(), cyclic()), (empty(), empty()), (empty(), empty()))
    h = 1.0 / n
    # periodic cubic in the cell index (wraps cleanly when built from a
    # periodic coordinate): use s = sin basis instead for wrap; exactness
    # check uses an OPEN (zeroGradient-free) interior slice of a plain cubic
    X, _, _ = mesh.cell_centers()
    q = 2.0 + 3.0 * X - 1.5 * X**2 + 0.7 * X**3
    P = pad_field(q, b, mesh)
    fc = np.asarray(interpolate_cubic(P, 0, b))[2:-2, 0, 0]
    xf = np.arange(1, n) * h
    exact = 2.0 + 3.0 * xf - 1.5 * xf**2 + 0.7 * xf**3
    np.testing.assert_allclose(fc[1:-1], exact[2:-2], rtol=1e-12)

    qs = jnp.sin(2 * jnp.pi * X)
    Ps = pad_field(qs, b, mesh)
    xf_all = np.arange(0, n + 1) * h
    ex = np.sin(2 * np.pi * xf_all)
    e_cub = np.abs(np.asarray(interpolate_cubic(Ps, 0, b))[:, 0, 0] - ex).max()
    e_lin = np.abs(np.asarray(interpolate(Ps, 0))[:, 0, 0] - ex).max()
    assert e_cub < 0.05 * e_lin, (e_cub, e_lin)


def test_stencil_matches_apply_and_diag():
    """Round-5 fused stencil path: FvMatrix.stencil() coefficients must
    reproduce apply() and diag() exactly for composed ddt+div+laplacian+Sp
    operators under mixed BCs (the Krylov loops run on the stencil)."""
    import numpy as np
    from deepflame_tpu.mesh import (StructuredMesh, cyclic, empty,
                                    fixed_value, zero_gradient, symmetry)
    from deepflame_tpu.ops.fv import (fvm_ddt, fvm_div, fvm_laplacian,
                                      fvm_source_implicit, interpolate,
                                      FvMatrix)
    from deepflame_tpu.mesh.structured import pad_field

    rng = np.random.default_rng(11)
    mesh = StructuredMesh.box([0.1, 0.08, 0.01], [8, 6, 2])
    cases = [
        ((cyclic(), cyclic()), (cyclic(), cyclic()), (cyclic(), cyclic())),
        ((fixed_value(2.0), zero_gradient()),
         (zero_gradient(), fixed_value(0.5)),
         (symmetry(negate=True), zero_gradient())),
        ((zero_gradient(), zero_gradient()), (cyclic(), cyclic()),
         (empty(), empty())),
    ]
    for bcs in cases:
        x = jnp.asarray(rng.normal(size=mesh.shape))
        x_old = jnp.asarray(rng.normal(size=mesh.shape))
        rho = jnp.asarray(rng.uniform(0.5, 2.0, mesh.shape))
        phi = tuple(jnp.asarray(rng.normal(size=interpolate(
            pad_field(x, bcs, mesh), ax).shape)) for ax in range(3))
        gam = tuple(jnp.asarray(rng.uniform(0.1, 1.0, p.shape))
                    for p in phi)
        sp = jnp.asarray(rng.uniform(0.1, 3.0, mesh.shape))
        for scheme in ("upwind", "linear"):
            eqn = (fvm_ddt(rho, x_old, 1e-3, mesh, bcs)
                   + fvm_div(phi, x, mesh, bcs, scheme)
                   + fvm_laplacian(gam, mesh, bcs, dtype=x.dtype,
                                   sign=-1.0)
                   + fvm_source_implicit(sp, mesh, bcs, dtype=x.dtype))
            st = eqn.stencil()
            assert st is not None
            D, lo, hi = st
            y_ref = eqn.apply(x)
            y_st = FvMatrix.stencil_apply(x, D, lo, hi)
            np.testing.assert_allclose(np.asarray(y_st), np.asarray(y_ref),
                                       rtol=1e-12, atol=1e-9)
            np.testing.assert_allclose(np.asarray(D),
                                       np.asarray(eqn.diag()),
                                       rtol=1e-12, atol=1e-9)
        # weight_flux variant (phiUc weighted by phi's sign)
        phiUc = tuple(jnp.asarray(rng.normal(size=p.shape)) for p in phi)
        eqn = (fvm_ddt(rho, x_old, 1e-3, mesh, bcs)
               + fvm_div(phiUc, x, mesh, bcs, "upwind", weight_flux=phi))
        D, lo, hi = eqn.stencil()
        np.testing.assert_allclose(
            np.asarray(FvMatrix.stencil_apply(x, D, lo, hi)),
            np.asarray(eqn.apply(x)), rtol=1e-12, atol=1e-9)
        np.testing.assert_allclose(np.asarray(D), np.asarray(eqn.diag()),
                                   rtol=1e-12, atol=1e-9)
