"""CJ detonation speed from in-repo thermochemistry vs the reference anchor.

/root/reference/test/corrtest.cpp:47-49: 1979.33 m/s +- 1% for stoichiometric
H2-air at 1 atm (test/oneD_detonationH2 case conditions).
"""
import numpy as np
import pytest

pytestmark = pytest.mark.smoke

from deepflame_tpu.chemistry import load_mechanism, make_thermo, make_kinetics
from deepflame_tpu.utils.cj import cj_speed


@pytest.mark.slow   # ~60 s on 1 CPU (full CJ Newton iteration in f64)
def test_cj_h2_air():
    mech = load_mechanism("/root/reference/mechanisms/H2/H2_Li.yaml")
    th = make_thermo(mech)
    kin = make_kinetics(mech)
    ns = mech.n_species
    iH2, iO2, iN2, iH2O = (mech.species_index(s)
                           for s in ("H2", "O2", "N2", "H2O"))
    Y0 = np.zeros(ns)
    Y0[iH2], Y0[iO2], Y0[iN2] = 0.02851, 0.226, 0.745
    Y0 /= Y0.sum()
    Yb = Y0.copy()
    wO2 = Y0[iH2] / 2.016 * 0.5 * 31.998
    Yb[iH2O] = Y0[iH2] + wO2
    Yb[iO2] -= wO2
    Yb[iH2] = 0.0
    D, T_cj, p_cj = cj_speed(th, kin, Y0, Yb, 101325.0, 300.0,
                             x_range=(0.54, 0.60), n_x=4, relax_time=1e-3)
    # anchor: 1979.33 +- 1% (allow 2% for the coarse x-scan)
    assert abs(D - 1979.33) / 1979.33 < 0.02, D
    assert 2800.0 < T_cj < 3100.0
