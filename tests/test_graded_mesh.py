"""Non-uniform (graded) face-list meshes — beyond the structured backend.

graded_box (mesh/facelist.py) builds tensor-product meshes with arbitrary
edge positions (blockMesh simpleGrading output shape). Central differences
with distance-based weights are exact for linear fields on orthogonal
non-uniform meshes — which gives machine-precision invariants — and the
full face-list low-Mach solver must run on such meshes unchanged.
"""
import os

import jax
import jax.numpy as jnp
import numpy as np

from deepflame_tpu.mesh import empty, fixed_value, zero_gradient
from deepflame_tpu.mesh.facelist import graded_box
from deepflame_tpu.ops.fv_facelist import (div_flux_fl, fvm_laplacian_fl,
                                           fvm_source_implicit_fl, grad_fl,
                                           interpolate_fl)
from deepflame_tpu.ops.linsolve import cg

DATA = os.path.join(os.path.dirname(__file__), "data")


def geometric_edges(L, n, ratio):
    """n cells over [0, L] with last/first width = ratio."""
    r = ratio ** (1.0 / (n - 1))
    w = np.cumprod(np.full(n, r)) / r
    w = w / w.sum() * L
    return np.concatenate([[0.0], np.cumsum(w)])


def _mesh(n=24, ratio=8.0, bc_lo=None, bc_hi=None):
    e = (empty(), empty())
    bcs = ((bc_lo or zero_gradient(), bc_hi or zero_gradient()),
           (zero_gradient(), zero_gradient()), e)
    xe = geometric_edges(1.0, n, ratio)
    return graded_box(xe, np.array([0.0, 0.1]), np.array([0.0, 0.1]),
                      bcs), xe


def test_linear_field_exactness():
    """Gauss gradient and face interpolation are exact for a linear field
    on a strongly graded mesh (the distance-weighted scheme's defining
    property)."""
    m, xe = _mesh(ratio=16.0)
    x = m.centers[:, 0]
    f = 3.0 + 2.0 * x
    ff = interpolate_fl(m, f)
    xf = interpolate_fl(m, x)
    np.testing.assert_allclose(np.asarray(ff), 3.0 + 2.0 * np.asarray(xf),
                               rtol=1e-13)
    g = grad_fl(m, f)
    # interior cells (boundary cells see zeroGradient ghosts)
    interior = (np.asarray(x) > float(xe[1])) & (np.asarray(x) < float(xe[-2]))
    np.testing.assert_allclose(np.asarray(g)[interior, 0], 2.0, rtol=1e-11)


def test_divergence_theorem_graded():
    """sum_c V_c div(phi)_c == net boundary flux for arbitrary face data."""
    m, _ = _mesh(ratio=8.0)
    rng = np.random.default_rng(3)
    phi = jnp.asarray(rng.standard_normal(m.n_faces))
    phi_b = [jnp.asarray(rng.standard_normal(p.owner.shape[0]))
             for p in m.patches]
    d = div_flux_fl(m, phi, phi_b)
    total = float(jnp.sum(d * m.volumes))
    bnd = sum(float(jnp.sum(fb * p.mag_sf))
              for fb, p in zip(phi_b, m.patches))
    np.testing.assert_allclose(total, bnd, rtol=1e-12, atol=1e-12)


def test_steady_conduction_graded_exact():
    """Steady conduction between fixed temperatures: the discrete solution
    on a graded mesh is the exact linear profile (central scheme is exact
    for linear solutions on orthogonal non-uniform meshes)."""
    T0, T1 = 300.0, 900.0
    m, xe = _mesh(ratio=12.0, bc_lo=fixed_value(T0), bc_hi=fixed_value(T1))
    n = m.n_cells
    gamma_f = jnp.ones(m.n_faces)
    gamma_b = [jnp.ones(p.owner.shape[0]) for p in m.patches]
    eqn = (fvm_source_implicit_fl(m, jnp.zeros(n) + 1e-30)
           + fvm_laplacian_fl(m, gamma_f, gamma_b, sign=-1.0))
    # CG on the volume-scaled (symmetric) system — the per-unit-volume LDU
    # form is nonsymmetric when volumes vary
    V = m.volumes
    sol = cg(lambda x: eqn.apply(x) * V, eqn.rhs() * V, jnp.full(n, 600.0),
             tol=1e-10, rel_tol=0.0, max_iter=2000)
    x = np.asarray(m.centers[:, 0])
    # ghost sits one cell-width outside -> effective wall position shifts by
    # half the end cell; the discrete linear profile interpolates the ghost
    # values, so compare against the line through the two ghost centers
    w_lo = xe[1] - xe[0]
    w_hi = xe[-1] - xe[-2]
    xg0, Tg0 = xe[0] - 0.5 * w_lo, None
    # fixedValue ghost: ghost = 2*T_b - owner; the converged profile is the
    # straight line satisfying both ghost relations — just check linearity
    # + boundary-value recovery at the faces via extrapolation
    T = np.asarray(sol.x)
    coef = np.polyfit(x, T, 1)
    resid = T - np.polyval(coef, x)
    assert np.abs(resid).max() < 1e-6 * (T1 - T0)
    # face-extrapolated wall temperatures hit the BCs
    T_lo = T[0] + (xe[0] - x[0]) * coef[0]
    T_hi = T[-1] + (xe[-1] - x[-1]) * coef[0]
    np.testing.assert_allclose([T_lo, T_hi], [T0, T1], rtol=1e-6)


def test_low_mach_fl_on_graded_duct():
    """Full face-list low-Mach step on a graded duct: uniform inflow stays
    uniform (grading must not manufacture momentum), fields finite."""
    from deepflame_tpu.chemistry import (load_mechanism, make_thermo,
                                         make_kinetics, make_transport)
    from deepflame_tpu.combustion import NoCombustion
    from deepflame_tpu.solvers.low_mach import LowMachConfig
    from deepflame_tpu.solvers.low_mach_fl import LowMachSolverFL
    mech = load_mechanism(os.path.join(DATA, "air.yaml"))
    th, tr, kin = make_thermo(mech), make_transport(mech), make_kinetics(mech)
    e = (empty(), empty())
    u_in = 2.0
    bU = ((fixed_value(u_in), zero_gradient()),
          (zero_gradient(), zero_gradient()), e)
    bU0 = ((fixed_value(0.0), zero_gradient()),
           (zero_gradient(), zero_gradient()), e)
    bp = ((zero_gradient(), fixed_value(101325.0)),
          (zero_gradient(), zero_gradient()), e)
    bs = ((zero_gradient(), zero_gradient()),
          (zero_gradient(), zero_gradient()), e)
    xe = geometric_edges(0.1, 24, 6.0)
    ye = np.array([0.0, 0.0125, 0.025])
    ze = np.array([0.0, 0.01])

    def mk(bcs):
        return graded_box(xe, ye, ze, bcs)

    solver = LowMachSolverFL(
        m_p=mk(bp), m_h=mk(bs), m_Y=mk(bs), m_rho=mk(bs),
        m_U=(mk(bU), mk(bU0), mk(bU0)),
        thermo=th, transport=tr, combustion=NoCombustion(th, kin),
        config=LowMachConfig(chemistry=False, div_scheme="upwind",
                             use_pallas="never"))
    n = solver.mesh.n_cells
    s = solver.initial_state(jnp.full(n, 101325.0), jnp.full(n, 300.0),
                             jnp.ones((n, 1)),
                             jnp.stack([jnp.full(n, u_in), jnp.zeros(n),
                                        jnp.zeros(n)], 1))
    step = jax.jit(lambda st: solver.step(st, 5e-5)[0])
    for _ in range(10):
        s = step(s)
    u = np.asarray(s.U[:, 0])
    assert np.all(np.isfinite(np.asarray(s.T)))
    assert np.abs(u - u_in).max() < 1e-3 * u_in, np.abs(u - u_in).max()
    # mass conservation: inlet and outlet fluxes match at steady state
    m = solver.mesh
    fl_in = sum(float(jnp.sum(fb * p.mag_sf))
                for fb, p in zip(s.phi_b, m.patches)
                if p.name == "ax0_lo")
    fl_out = sum(float(jnp.sum(fb * p.mag_sf))
                 for fb, p in zip(s.phi_b, m.patches)
                 if p.name == "ax0_hi")
    np.testing.assert_allclose(-fl_in, fl_out, rtol=1e-6)
