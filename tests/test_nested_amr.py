"""Multi-level 2:1 nested patch AMR (mesh/patch_amr.py::NestedPatchAMR).

Role parity targets: dfDynamicRefineFvMesh maxRefinement cascades with 2:1
interfaces + unrefinement (dfDynamicRefineFvMesh.H:116-160, hexRef.C).
Checks: prolong/restrict conservation, a 2-level Sod run reaching the exact
star-region plateaus from a base grid too coarse to do so alone, window
tracking of the moving shock through both levels, and 3D isotropic
refinement (hexRef8-style cube split).
"""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deepflame_tpu.chemistry import load_mechanism, make_kinetics, make_thermo
from deepflame_tpu.constants import GAS_CONSTANT
from deepflame_tpu.mesh import StructuredMesh, empty, zero_gradient
from deepflame_tpu.mesh.patch_amr import NestedPatchAMR
from deepflame_tpu.solvers.high_speed import HighSpeedConfig, HighSpeedSolver

pytestmark = pytest.mark.smoke

DATA = os.path.join(os.path.dirname(__file__), "data")


@pytest.fixture(scope="module")
def air():
    mech = load_mechanism(os.path.join(DATA, "air.yaml"))
    return mech, make_thermo(mech), make_kinetics(mech)


def _solver(th, kin, mesh):
    b = ((zero_gradient(), zero_gradient()),) * 3
    bx = (b[0], (empty(), empty()), (empty(), empty()))
    cfg = HighSpeedConfig(flux="HLLC", rk_order=2, limiter="vanLeer",
                          chemistry="none")
    return HighSpeedSolver(mesh=mesh, thermo=th, kinetics=kin, bcs_rho=bx,
                           bcs_U=(bx, bx, bx), bcs_p=bx, bcs_Y=bx,
                           config=cfg)


def _sod_ic(mech, mesh):
    X, _, _ = mesh.cell_centers()
    pL, pR, rhoL, rhoR = 1e5, 1e4, 1.0, 0.125
    W = mech.molecular_weights[0]
    TL = pL * W / (rhoL * GAS_CONSTANT)
    TR = pR * W / (rhoR * GAS_CONSTANT)
    T = jnp.where(X < 0.5, TL, TR)
    p = jnp.where(X < 0.5, pL, pR)
    return p, T, jnp.ones((1,) + mesh.shape)


def test_prolong_restrict_conservation(air):
    """Block-mean(piecewise-constant prolongation) is the identity —
    refine/unrefine conserve every conservative variable exactly."""
    mech, th, kin = air
    mesh = StructuredMesh.box([1.0, 0.25, 1e-2], [32, 8, 1])
    sol = _solver(th, kin, mesh)
    amr = NestedPatchAMR.build(sol, (8, 4), ratio=2, isotropic=True)
    rng = np.random.default_rng(0)
    T = jnp.asarray(400.0 + 100.0 * rng.random(mesh.shape))
    p = jnp.asarray(1e5 * (1.0 + 0.1 * rng.random(mesh.shape)))
    sc = sol.initial_state(p, T, jnp.ones((1,) + mesh.shape))
    sf = amr.prolong(sc, 5)
    from deepflame_tpu.mesh.patch_amr import _mean_axes
    for qf, qc in zip(amr._cons(sf)[:4], amr._cons(sc)[:4]):
        back = _mean_axes(qf, amr.ratio, amr.axes)
        win = amr._slice_c(qc, 5, amr.pc)
        np.testing.assert_allclose(np.asarray(back), np.asarray(win),
                                   rtol=1e-12)


def test_two_level_sod_hits_star_plateaus(air):
    """2-level 2:1 nesting (effective 4x local resolution) on a coarse base:
    star-region plateaus within 3% of the exact Riemann solution, and both
    windows track the shock."""
    mech, th, kin = air
    n = 100
    mesh = StructuredMesh.box([1.0, 1e-2, 1e-2], [n, 1, 1])
    sol = _solver(th, kin, mesh)
    amr = NestedPatchAMR.build(sol, (32, 32), ratio=2, buffer_c=3,
                               isotropic=False)
    p, T, Y = _sod_ic(mech, mesh)
    ps = amr.initial_state(p, T, Y, offset=n // 2 - 16)
    pL, rhoL = 1e5, 1.0
    a0 = float(np.sqrt(1.4 * pL / rhoL))
    dt = 0.4 * mesh.dx / (a0 * 1.8) / 2.0
    nsteps = int(0.25 / a0 / dt)
    step = jax.jit(lambda s: amr.step(s, dt)[0])
    for _ in range(nsteps):
        ps = step(ps)
    rho, U, pf, Tf, _ = sol.primitives(ps.coarse)
    X, _, _ = mesh.cell_centers()
    x = np.asarray(X).squeeze()
    u = np.asarray(U[0]).squeeze()
    pfr = np.asarray(pf).squeeze()
    p_star = 0.30313 * pL
    u_star = 0.92745 * np.sqrt(pL / rhoL)
    mask = (x > 0.55) & (x < 0.65)
    assert abs(pfr[mask].mean() - p_star) / p_star < 0.03
    assert abs(u[mask].mean() - u_star) / u_star < 0.03
    # shock sits near x ~ 0.74 at this time: the level-1 window followed it
    off = int(ps.offset)
    assert 0.5 < x[min(off + 16, n - 1)] < 0.95, off
    # level-2 window is a live PatchState with its own offset
    assert hasattr(ps.fine, "offset")


def test_three_level_build_and_step(air):
    mech, th, kin = air
    mesh = StructuredMesh.box([1.0, 1e-2, 1e-2], [64, 1, 1])
    sol = _solver(th, kin, mesh)
    amr = NestedPatchAMR.build(sol, (16, 8, 8), ratio=2, isotropic=False)
    p, T, Y = _sod_ic(mech, mesh)
    ps = amr.initial_state(p, T, Y, offset=24)
    dt = 0.1 * mesh.dx / 600.0
    step = jax.jit(lambda s: amr.step(s, dt)[0])
    for _ in range(4):
        ps = step(ps)
    assert bool(jnp.all(jnp.isfinite(ps.coarse.rhoE)))
    # three nesting levels present
    assert hasattr(ps.fine, "offset") and hasattr(ps.fine.fine, "offset")


@pytest.mark.slow   # ~50 s on 1 CPU; 1D/2D nest tests cover the cascade
def test_isotropic_3d_refinement(air):
    """hexRef8-style cube split: fine patch refines x, y AND z."""
    mech, th, kin = air
    mesh = StructuredMesh.box([1.0, 0.25, 0.25], [24, 6, 6])
    sol = _solver(th, kin, mesh)
    amr = NestedPatchAMR.build(sol, (8,), ratio=2, isotropic=True)
    assert amr.axes == (0, 1, 2)
    assert amr.fine.mesh.shape == (16, 12, 12)
    p, T, Y = _sod_ic(mech, mesh)
    ps = amr.initial_state(p, T, Y, offset=8)
    dt = 0.1 * mesh.dx / 600.0
    step = jax.jit(lambda s: amr.step(s, dt)[0])
    for _ in range(3):
        ps = step(ps)
    assert bool(jnp.all(jnp.isfinite(ps.coarse.rhoE)))
    assert bool(jnp.all(jnp.isfinite(ps.fine.rhoE)))


def test_nested_reflux_conserves(air):
    """2-level nest with reflux=True: total mass/energy conserved to
    round-off through a pressure-pulse transient (every level's interface
    coupling telescopes); overwrite-only drifts measurably."""
    mech, th, kin = air
    mesh = StructuredMesh.box([1.0, 1e-2, 1e-2], [64, 1, 1])
    sol = _solver(th, kin, mesh)
    X, _, _ = mesh.cell_centers()
    p = jnp.where(jnp.abs(X - 0.5) < 0.06, 4e5, 1e5)
    W = mech.molecular_weights[0]
    T = jnp.full(mesh.shape, 300.0)
    Y = jnp.ones((1,) + mesh.shape)
    dt, n_steps = 2e-6, 12

    def run(reflux):
        amr = NestedPatchAMR.build(sol, pcs=(24, 24), ratio=2, buffer_c=3,
                                   reflux=reflux)
        ps = amr.initial_state(p, T, Y, offset=32 - 12)
        m0 = float(jnp.sum(ps.coarse.rho))
        e0 = float(jnp.sum(ps.coarse.rhoE))
        step = jax.jit(amr.step)
        for _ in range(n_steps):
            ps, _ = step(ps, dt)
        return (abs(float(jnp.sum(ps.coarse.rho)) - m0) / m0,
                abs(float(jnp.sum(ps.coarse.rhoE)) - e0) / e0)

    dm_r, de_r = run(True)
    dm_o, de_o = run(False)
    assert dm_r < 1e-12, dm_r
    assert de_r < 1e-12, de_r
    assert dm_o > 10.0 * max(dm_r, 1e-15), (dm_o, dm_r)
