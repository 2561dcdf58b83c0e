"""FGM solver on the face-list backend: parity with the structured FGM
solver on a box mesh + end-to-end on the real Sandia D wedge mesh.

Role parity: solvers/fgm_fl.py carries baseFGM/flareFGM (+k-epsilon RAS) to
arbitrary unstructured meshes; on a box mesh both backends run the same
algorithm and must agree to Krylov roundoff (the test_facelist_solver.py
pattern applied to the FGM family).
"""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deepflame_tpu.combustion.fgm.table import make_synthetic_table
from deepflame_tpu.mesh import (StructuredMesh, cyclic, empty, fixed_value,
                                zero_gradient)
from deepflame_tpu.mesh.blockmesh import read_blockmesh
from deepflame_tpu.mesh.facelist import from_structured
from deepflame_tpu.solvers.fgm import FGMSolver, FGMConfig
from deepflame_tpu.solvers.fgm_fl import FGMSolverFL

SANDIA_DICT = ("/root/reference/examples/dfLowMachFoam/fgm/"
               "twoD_SandiaD_flareFGM/system/blockMeshDict")


def _flat(x):
    return jnp.asarray(np.asarray(x).reshape(-1))


def test_fgm_fl_matches_structured_box():
    """Periodic 2D FGM kernel: both backends step the same fields."""
    from deepflame_tpu.chemistry import (load_mechanism, make_thermo,
                                         make_kinetics, make_transport)
    from deepflame_tpu.combustion import NoCombustion
    mech = load_mechanism(os.path.join(os.path.dirname(__file__), "data",
                                       "air.yaml"))
    th, tr, kin = make_thermo(mech), make_transport(mech), make_kinetics(mech)
    tb = make_synthetic_table(dtype=jnp.float64)
    n = 12
    L = 1e-2
    mesh = StructuredMesh.box([L, L, L / n], [n, n, 1])
    b = ((cyclic(), cyclic()), (cyclic(), cyclic()), (empty(), empty()))
    cfg = FGMConfig(chemistry=False, use_pallas="never")
    sol_s = FGMSolver(
        mesh=mesh, thermo=th, transport=tr, combustion=NoCombustion(th, kin),
        bcs_U=(b, b, b), bcs_p=b, bcs_h=b, bcs_Y=b, bcs_rho=b,
        config=cfg, table=tb, bcs_Z=b)
    fl = from_structured(mesh, b)
    sol_f = FGMSolverFL(
        m_p=fl, m_h=fl, m_Y=fl, m_rho=fl, m_U=(fl, fl, fl),
        m_c=fl, m_var=fl, m_k=None, m_eps=None,
        thermo=th, transport=tr, combustion=None, config=cfg, table=tb)

    X, Yg, _ = mesh.cell_centers()
    Z = jnp.full(mesh.shape, 0.3)
    r2 = (X - L / 2) ** 2 + (Yg - L / 2) ** 2
    c0 = jnp.where(r2 < (L / 4) ** 2, 0.5, 0.0)
    p = jnp.full(mesh.shape, 101325.0)
    s_s = sol_s.fgm_initial_state(p, Z, c0)
    s_f = sol_f.fgm_initial_state(_flat(p), _flat(Z), _flat(c0))

    np.testing.assert_allclose(_flat(s_s.T), s_f.T, rtol=1e-12)
    np.testing.assert_allclose(_flat(s_s.rho), s_f.rho, rtol=1e-12)

    dt = 1e-5
    step_s = jax.jit(lambda st: sol_s.step(st, dt)[0])
    step_f = jax.jit(lambda st: sol_f.step(st, dt)[0])
    for _ in range(3):
        s_s = step_s(s_s)
        s_f = step_f(s_f)
    for name in ("T", "rho", "p", "Z", "c", "cvar"):
        a = _flat(getattr(s_s, name))
        bb = getattr(s_f, name)
        np.testing.assert_allclose(a, bb, rtol=2e-6, atol=1e-11,
                                   err_msg=name)


@pytest.mark.slow
def test_fgm_fl_sandia_wedge_smoke():
    """flareFGM + k-epsilon on the reference's real 6-block wedge mesh:
    pilot-stabilized jet develops, fields stay finite and bounded."""
    tb = make_synthetic_table(dtype=jnp.float64)
    gm = read_blockmesh(SANDIA_DICT)
    zg = zero_gradient()
    names = gm.patch_names

    def scalar_bcs(vals):
        d = {n: zg for n in names}
        d.update({k: fixed_value(v) for k, v in vals.items()})
        return d

    bc_p = {n: zg for n in names}
    bc_p["outlet"] = fixed_value(1e5)
    bc_Z = scalar_bcs({"inletCH4": 1.0, "inletPilot": 0.3, "inletAir": 0.0})
    bc_c = scalar_bcs({"inletCH4": 0.0, "inletPilot": 1.0, "inletAir": 0.0})
    bc_var = scalar_bcs({"inletCH4": 0.0, "inletPilot": 0.0,
                         "inletAir": 0.0})
    bc_He = {n: zg for n in names}
    bc_k = scalar_bcs({"inletCH4": 1.0, "inletPilot": 0.5, "inletAir": 0.05})
    bc_eps = scalar_bcs({"inletCH4": 500.0, "inletPilot": 100.0,
                         "inletAir": 5.0})
    bc_rho = {n: zg for n in names}

    def u_bcs(c):
        vals = {"inletCH4": 10.0, "inletPilot": 3.0, "inletAir": 0.9}
        d = {}
        for n in names:
            if n in vals:
                d[n] = fixed_value(vals[n] if c == 2 else 0.0)
            elif n.startswith("wall"):
                d[n] = fixed_value(0.0)
            else:
                d[n] = zg
        return d

    cfg = FGMConfig(chemistry=False, div_scheme="upwind", use_pallas="never")
    sol = FGMSolverFL(
        m_p=gm.with_bcs(bc_p), m_h=gm.with_bcs(bc_He),
        m_Y=gm.with_bcs(bc_Z), m_rho=gm.with_bcs(bc_rho),
        m_U=tuple(gm.with_bcs(u_bcs(c)) for c in range(3)),
        m_c=gm.with_bcs(bc_c), m_var=gm.with_bcs(bc_var),
        m_k=gm.with_bcs(bc_k), m_eps=gm.with_bcs(bc_eps),
        thermo=None, transport=None, combustion=None, config=cfg, table=tb)

    n = gm.n_cells
    ctr = np.asarray(gm.centers)
    Z0 = np.zeros(n)
    c0 = np.zeros(n)
    pil = ((ctr[:, 0] > 0.0036) & (ctr[:, 0] < 0.0091)
           & (ctr[:, 2] > -0.01) & (ctr[:, 2] < 0.05))
    Z0[pil] = 0.3
    c0[pil] = 1.0
    U0 = np.zeros((n, 3))
    U0[:, 2] = 0.9
    s = sol.fgm_initial_state(jnp.full((n,), 1e5), jnp.asarray(Z0),
                              jnp.asarray(c0), jnp.asarray(U0),
                              k0=0.05, eps0=5.0)
    assert float(s.T.max()) > 1000.0        # burned pilot from the table
    dt = 2e-6
    step = jax.jit(lambda st: sol.step(st, dt)[0])
    for _ in range(8):
        s = step(s)
    for f in (s.T, s.U, s.p, s.Z, s.c, s.k, s.eps):
        assert np.all(np.isfinite(np.asarray(f)))
    assert float(s.c.max()) <= 1.0 + 1e-9
    assert float(s.Z.min()) >= -1e-9
    assert 250.0 < float(s.T.min())
