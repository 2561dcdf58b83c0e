"""LES subgrid models on the face-list backend.

Role parity: the reference runs its LES family (Smagorinsky/WALE/Sigma,
src/TurbulenceModels, Sigma.H:28-44) on arbitrary fvMesh; round 2 only had
LES on the structured backend. LESModel.mu_t_fl computes the same tensor
algebra from grad_fl — on a box mesh both backends must agree to roundoff,
and a full FL solver step with les= must match the structured solver with
turbulence= (the test_facelist_solver parity pattern)."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deepflame_tpu.chemistry import (load_mechanism, make_thermo,
                                     make_kinetics, make_transport)
from deepflame_tpu.combustion import NoCombustion
from deepflame_tpu.mesh import StructuredMesh, cyclic, empty
from deepflame_tpu.mesh.facelist import from_structured
from deepflame_tpu.solvers.low_mach import LowMachSolver, LowMachConfig
from deepflame_tpu.solvers.low_mach_fl import LowMachSolverFL
from deepflame_tpu.turbulence.les import (LESModel, sigma_model, smagorinsky,
                                          wale)


def _flat(x):
    return np.asarray(x).reshape(-1)


def _setup(n=10, L=2e-3):
    mesh = StructuredMesh.box([L, L, L], [n, n, n])
    b = ((cyclic(), cyclic()), (cyclic(), cyclic()), (cyclic(), cyclic()))
    X, Yg, Zg = mesh.cell_centers()
    k0 = 2 * np.pi / L
    U0 = jnp.stack([2.0 * jnp.sin(k0 * X) * jnp.cos(k0 * Yg),
                    -2.0 * jnp.cos(k0 * X) * jnp.sin(k0 * Yg),
                    0.5 * jnp.sin(k0 * Zg)])
    return mesh, b, U0


@pytest.mark.parametrize("model", [smagorinsky(), wale(), sigma_model()])
def test_mu_t_fl_matches_structured(model):
    """mu_t on a periodic box: grad_fl tensor algebra == structured shifts."""
    mesh, b, U0 = _setup()
    fl = from_structured(mesh, b)
    rho = jnp.full(mesh.shape, 1.1)
    mu_s = model.mu_t(rho, U0, (b, b, b), mesh)
    U_fl = jnp.stack([jnp.asarray(_flat(U0[c])) for c in range(3)], 1)
    mu_f = model.mu_t_fl(jnp.asarray(_flat(rho)), U_fl, (fl, fl, fl),
                         fl.volumes)
    # scale-aware atol: Sigma's D = s3(s1-s2)(s2-s3)/s1^2 amplifies eig
    # roundoff near its zero set; a wiring bug would give O(1) rel errors
    np.testing.assert_allclose(_flat(mu_s), np.asarray(mu_f), rtol=1e-9,
                               atol=1e-6 * float(jnp.max(mu_s)))
    assert float(jnp.max(mu_f)) > 0.0
    # SGS k/eps parity too (per-cell-delta variant vs scalar-delta)
    k_s, e_s = model.sgs_k_epsilon(mu_s, rho, mesh)
    k_f, e_f = model.sgs_k_epsilon_fl(mu_f, jnp.asarray(_flat(rho)),
                                      fl.volumes)
    np.testing.assert_allclose(_flat(k_s), np.asarray(k_f), rtol=1e-9,
                               atol=1e-12 * float(jnp.max(k_f)))
    np.testing.assert_allclose(_flat(e_s), np.asarray(e_f), rtol=1e-9,
                               atol=1e-12 * float(jnp.max(e_f)))


def test_les_fl_solver_step_parity():
    """Full PIMPLE step with WALE SGS: FL backend == structured backend."""
    mech = load_mechanism(os.path.join(os.path.dirname(__file__), "data",
                                       "air.yaml"))
    th, tr, kin = make_thermo(mech), make_transport(mech), make_kinetics(mech)
    mesh, b, U0 = _setup(n=8)
    cfg = LowMachConfig(chemistry=False, use_pallas="never")
    model = wale()
    comb = NoCombustion(th, kin)
    sol_s = LowMachSolver(mesh=mesh, thermo=th, transport=tr,
                          combustion=comb, bcs_U=(b, b, b), bcs_p=b,
                          bcs_h=b, bcs_Y=b, bcs_rho=b, config=cfg,
                          turbulence=model)
    fl = from_structured(mesh, b)
    sol_f = LowMachSolverFL(m_p=fl, m_h=fl, m_Y=fl, m_rho=fl,
                            m_U=(fl, fl, fl), thermo=th, transport=tr,
                            combustion=comb, config=cfg, les=model)
    ns = mech.n_species
    T0 = jnp.full(mesh.shape, 600.0)
    p0 = jnp.full(mesh.shape, 101325.0)
    Yv = np.zeros(ns)
    Yv[0] = 1.0
    Y0 = jnp.asarray(np.tile(Yv[:, None, None, None], (1,) + mesh.shape))
    s_s = sol_s.initial_state(p0, T0, Y0, U0)
    s_f = sol_f.initial_state(jnp.asarray(_flat(p0)),
                              jnp.asarray(_flat(T0)),
                              jnp.asarray(np.asarray(Y0).reshape(ns, -1).T),
                              jnp.asarray(np.stack([_flat(U0[c])
                                                    for c in range(3)], 1)))
    dt = 5e-7
    step_s = jax.jit(lambda st: sol_s.step(st, dt)[0])
    step_f = jax.jit(lambda st: sol_f.step(st, dt)[0])
    for _ in range(3):
        s_s = step_s(s_s)
        s_f = step_f(s_f)
    # 1e-7: the FL ELL reductions sum faces in a different order than the
    # structured shift-adds (f64 roundoff, amplified by the Krylov stops)
    for name, a, bb in (("T", s_s.T, s_f.T), ("p", s_s.p, s_f.p),
                        ("rho", s_s.rho, s_f.rho)):
        rel = np.abs(_flat(a) - np.asarray(bb)).max() \
            / np.abs(np.asarray(bb)).max()
        assert rel < 1e-7, (name, rel)
    relU = np.abs(np.stack([_flat(s_s.U[c]) for c in range(3)], 1)
                  - np.asarray(s_f.U)).max() \
        / max(np.abs(np.asarray(s_f.U)).max(), 1e-10)
    assert relU < 1e-6, relU
