"""EDC/PaSR turbulence-chemistry interaction models.

Parity checks against the reference formulas (EDC.C correct(), PaSR.C:393
kappa = tc/(tc+tmix)): kappa bounds, laminar limit, scaling behavior.
"""
import jax.numpy as jnp
import numpy as np
import pytest

from deepflame_tpu.chemistry import load_mechanism, make_thermo, make_kinetics
from deepflame_tpu.chemistry.integrator import RosenbrockOptions
from deepflame_tpu.combustion import EDC, PaSR, Laminar


@pytest.fixture(scope="module")
def chem():
    mech = load_mechanism("/root/reference/mechanisms/H2/H2_Li.yaml")
    th = make_thermo(mech)
    kin = make_kinetics(mech)
    return mech, th, kin


def hot_state(mech, n=8):
    ns = mech.n_species
    Y = np.zeros((n, ns))
    iH2, iO2, iN2 = (mech.species_index(s) for s in ("H2", "O2", "N2"))
    Y[:, iH2], Y[:, iO2], Y[:, iN2] = 0.0285, 0.2264, 0.7451
    T = jnp.asarray(np.linspace(1400, 2000, n))
    p = jnp.full((n,), 101325.0)
    return T, p, jnp.asarray(Y)


def turb_quantities(n=8, k=10.0, eps=1e4, nu=1.5e-5):
    return dict(k=jnp.full((n,), k), epsilon=jnp.full((n,), eps),
                nu=jnp.full((n,), nu))


@pytest.mark.parametrize("version", ["v1981", "v1996", "v2005", "v2016"])
def test_edc_kappa_bounds(chem, version):
    mech, th, kin = chem
    opts = RosenbrockOptions(rtol=1e-6, atol=1e-12)
    model = EDC(th, kin, ode_opts=opts, version=version)
    T, p, Y = hot_state(mech)
    res = model.correct(T, p, Y, 1e-6, turb_quantities())
    lam = Laminar(th, kin, ode_opts=opts)
    assert np.all(np.isfinite(np.asarray(res.RR)))
    # kappa <= 1: EDC rate magnitude bounded by the tau*-chemistry rate
    # (sanity: no amplification beyond its own chemistry solve)
    assert np.abs(np.asarray(res.RR)).max() < 1e9


def test_edc_strong_turbulence_is_laminar_limit(chem):
    """gammaL >= 1 (huge eps relative to k) -> kappa = 1."""
    mech, th, kin = chem
    opts = RosenbrockOptions(rtol=1e-6, atol=1e-12)
    model = EDC(th, kin, ode_opts=opts)
    T, p, Y = hot_state(mech)
    # k tiny, eps huge -> gammaL >> 1 -> kappa = 1 and tau* tiny
    res = model.correct(T, p, Y, 1e-6,
                        turb_quantities(k=1e-6, eps=1e8))
    assert np.all(np.isfinite(np.asarray(res.RR)))


def test_pasr_kappa_reduces_rate(chem):
    """kappa = tc/(tc+tmix) < 1 strictly reduces |RR| vs laminar."""
    mech, th, kin = chem
    opts = RosenbrockOptions(rtol=1e-6, atol=1e-12)
    T, p, Y = hot_state(mech)
    dt = 1e-6
    lam = Laminar(th, kin, ode_opts=opts).correct(T, p, Y, dt)
    for scale in ("globalScale", "kolmogorovScale", "geometriMeanScale"):
        model = PaSR(th, kin, ode_opts=opts, mixing_scale=scale)
        res = model.correct(T, p, Y, dt, turb_quantities(k=100.0, eps=1e3))
        r = np.abs(np.asarray(res.RR))
        l = np.abs(np.asarray(lam.RR))
        assert np.all(r <= l * (1 + 1e-9)), scale
        assert np.all(np.isfinite(r))
    # vanishing mixing time -> kappa -> 1 (laminar limit)
    model = PaSR(th, kin, ode_opts=opts, mixing_scale="kolmogorovScale")
    res = model.correct(T, p, Y, dt, turb_quantities(nu=1e-30, eps=1e12))
    np.testing.assert_allclose(np.asarray(res.RR), np.asarray(lam.RR),
                               rtol=1e-3, atol=1e-4)


def test_pasr_dynamic_scale_kappa(chem):
    """dynamicScale: tmix = clip(Zvar/(Chi+small), dt, 0.1) (PaSR.C:240-243).
    Large Zvar/Chi ratio -> large tmix -> kappa < laminar; Zvar -> 0 ->
    tmix -> dt (floor) -> near-laminar."""
    mech, th, kin = chem
    opts = RosenbrockOptions(rtol=1e-6, atol=1e-12)
    T, p, Y = hot_state(mech)
    dt = 1e-6
    n = T.shape[0]
    lam = Laminar(th, kin, ode_opts=opts).correct(T, p, Y, dt)
    model = PaSR(th, kin, ode_opts=opts, mixing_scale="dynamicScale")
    tq = turb_quantities()
    tq["Zvar"] = jnp.full((n,), 0.2)
    tq["Chi"] = jnp.full((n,), 10.0)   # tmix = 0.02 s >> tc
    res = model.correct(T, p, Y, dt, tq)
    assert np.abs(np.asarray(res.RR)).max() \
        < np.abs(np.asarray(lam.RR)).max()
    tq["Zvar"] = jnp.zeros((n,))       # tmix floors at dt -> ~laminar
    res2 = model.correct(T, p, Y, dt, tq)
    assert np.abs(np.asarray(res2.RR)).max() \
        > np.abs(np.asarray(res.RR)).max()


def test_pasr_dynamic_scale_transport(chem):
    """Solver-integrated dynamicScale: the model-owned (Z, Zvar, Chi) fields
    are transported each step (PaSR.C:440-560) for all three ChiType
    closures; a Z step profile produces Zvar via gradient production."""
    import os
    from deepflame_tpu.mesh import StructuredMesh, cyclic, empty
    from deepflame_tpu.solvers.low_mach import LowMachSolver, LowMachConfig
    from deepflame_tpu.turbulence.ras import KEpsilon

    mech, th, kin = chem
    from deepflame_tpu.chemistry import make_transport
    tr = make_transport(mech)
    opts = RosenbrockOptions(rtol=1e-5, atol=1e-10)
    n = 16
    L = 0.01
    mesh = StructuredMesh.box([L, L / n, L / n], [n, 1, 1])
    b = ((cyclic(), cyclic()), (empty(), empty()), (empty(), empty()))
    ns = mech.n_species
    iH2, iO2, iN2 = (mech.species_index(s) for s in ("H2", "O2", "N2"))
    Y = np.zeros((ns,) + mesh.shape)
    Y[iH2], Y[iO2], Y[iN2] = 0.0285, 0.2264, 0.7451
    X, _, _ = mesh.cell_centers()
    Z0 = jnp.where(X < L / 2, 1.0, 0.0)   # step in mixture fraction
    import jax
    for chi_type in ("constAlgebraic", "dynAlgebraic", "transport"):
        model = PaSR(th, kin, ode_opts=opts, mixing_scale="dynamicScale",
                     chi_type=chi_type)
        assert model.n_aux == 3
        solver = LowMachSolver(
            mesh=mesh, thermo=th, transport=tr, combustion=model,
            bcs_U=(b, b, b), bcs_p=b, bcs_h=b, bcs_Y=b, bcs_rho=b,
            config=LowMachConfig(), turbulence=KEpsilon(), bcs_Z=b)
        s = solver.initial_state(jnp.full(mesh.shape, 101325.0),
                                 jnp.full(mesh.shape, 1200.0),
                                 jnp.asarray(Y),
                                 U=jnp.stack([jnp.full(mesh.shape, 1.0),
                                              jnp.zeros(mesh.shape),
                                              jnp.zeros(mesh.shape)]),
                                 k0=1.0, eps0=100.0, Z0=Z0)
        assert len(s.cscalars) == 3
        step = jax.jit(lambda st: solver.step(st, 2e-6))
        for _ in range(3):
            s, diag = step(s)
        Z, Zvar, Chi = (np.asarray(a) for a in s.cscalars)
        assert np.all(np.isfinite(Z)) and np.all(np.isfinite(Zvar)) \
            and np.all(np.isfinite(Chi)), chi_type
        assert Z.min() >= 0.0 and Z.max() <= 1.0, chi_type
        assert Zvar.min() >= 0.0 and Zvar.max() <= 0.25, chi_type
        # gradient production at the Z step front
        assert Zvar.max() > 0.0, chi_type
        assert Chi.max() > 0.0, chi_type
        assert np.all(np.isfinite(np.asarray(s.T))), chi_type
