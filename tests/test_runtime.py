"""Runtime layer: config loading, checkpoint round trip, function objects,
flame diagnostics (SURVEY.md §5 auxiliary-subsystem parity)."""
import os

import jax.numpy as jnp
import numpy as np
import pytest

from deepflame_tpu.mesh import StructuredMesh
from deepflame_tpu.runtime import (CaseConfig, load_case, save_state,
                                   load_state, latest_time, FieldMinMax,
                                   Probes, LineSample, FunctionObjectSet,
                                   PhaseTimers)
from deepflame_tpu.utils.flame_speed import (flame_position, flame_thickness,
                                             flame_speed)


def test_config_yaml_roundtrip(tmp_path):
    p = tmp_path / "case.yaml"
    p.write_text("""
chemistry:
  mechanism_file: /root/reference/mechanisms/H2/H2_Li.yaml
  ode_rtol: 1.0e-8
  inert_specie: N2
combustion:
  model: EDC
  edc_version: v2016
control:
  end_time: 5.0e-4
  delta_t: 2.0e-7
schemes:
  flux_scheme: HLLCP
""")
    cfg = load_case(str(p))
    assert cfg.chemistry.ode_rtol == 1e-8
    assert cfg.combustion.model == "EDC"
    assert cfg.schemes.flux_scheme == "HLLCP"
    assert cfg.solution.n_correctors == 2      # default preserved
    # typo safety
    bad = tmp_path / "bad.yaml"
    bad.write_text("chemistry:\n  mechanizm_file: x\n")
    with pytest.raises(ValueError, match="unknown keys"):
        load_case(str(bad))


def test_checkpoint_roundtrip(tmp_path):
    from deepflame_tpu.solvers.low_mach import LowMachState
    rng = np.random.default_rng(0)
    sh = (4, 4, 1)
    state = LowMachState(
        rho=jnp.asarray(rng.random(sh)), U=jnp.asarray(rng.random((3,) + sh)),
        p=jnp.asarray(rng.random(sh)), ha=jnp.asarray(rng.random(sh)),
        Y=jnp.asarray(rng.random((3,) + sh)), T=jnp.asarray(rng.random(sh)),
        phi=(jnp.asarray(rng.random((5, 4, 1))),
             jnp.asarray(rng.random((4, 5, 1))),
             jnp.asarray(rng.random((4, 4, 2)))),
        dpdt=jnp.asarray(rng.random(sh)), time=jnp.asarray(1.5e-4))
    d = str(tmp_path / "ckpt")
    save_state(d, state, 1.5e-4)
    save_state(d, state, 3.0e-4)
    assert latest_time(d) == pytest.approx(3.0e-4)
    restored = load_state(d, state, "latest")
    for a, b in zip(jax.tree.flatten(state)[0], jax.tree.flatten(restored)[0]):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


import jax  # noqa: E402


def test_function_objects(tmp_path):
    mesh = StructuredMesh.box([1.0, 1.0, 0.1], [8, 8, 1])
    X, Y, _ = mesh.cell_centers()
    T = 300.0 + 100.0 * np.asarray(X)
    fmm = FieldMinMax(mesh, ["T"], out_dir=str(tmp_path / "fmm"))
    prb = Probes(mesh, [(0.5, 0.5, 0.05)], ["T"],
                 out_dir=str(tmp_path / "probes"))
    line = LineSample(mesh, 0, (0.0, 0.5, 0.05), ["T"],
                      out_dir=str(tmp_path / "sample"))
    fos = FunctionObjectSet([fmm, prb, line])
    fos(0.0, {"T": T})
    fos(1e-4, {"T": T + 1.0})
    fos.write()
    data = np.loadtxt(str(tmp_path / "fmm" / "fieldMinMax.dat"))
    assert data.shape[0] == 2
    # max(T) at the largest x
    np.testing.assert_allclose(data[0, 5], np.max(T))
    assert data[0, 6] > 0.9   # x of max near the right edge
    pr = np.loadtxt(str(tmp_path / "probes" / "probes.dat"))
    np.testing.assert_allclose(pr[0, 1], T[4, 4, 0])


def test_flame_diagnostics():
    x = np.linspace(0, 0.01, 200)
    x_f = 0.004
    delta = 3e-4
    T = 300 + 1700 * 0.5 * (1 + np.tanh((x - x_f) / delta))
    assert abs(flame_position(x, T) - x_f) < 1e-4
    # tanh thermal thickness = (Tmax-Tmin)/max grad = 2*delta
    assert abs(flame_thickness(x, T) - 2 * delta) / (2 * delta) < 0.05
    times = np.linspace(0, 1e-3, 10)
    pos = 0.004 + 2.5 * times
    assert abs(flame_speed(times, pos) - 2.5) < 1e-9


def test_phase_timers():
    t = PhaseTimers(sync=False)
    with t.phase("a"):
        sum(range(1000))
    with t.phase("a"):
        pass
    rep = t.report()
    assert "a" in rep and t.counts["a"] == 2


def test_solver_factory():
    """CaseConfig -> working solver via the factory (createFields parity)."""
    import jax
    from deepflame_tpu.mesh import cyclic, empty
    from deepflame_tpu.runtime import load_case
    from deepflame_tpu.runtime.factory import build_low_mach_solver
    import os as _os
    case = load_case(_os.path.join(_os.path.dirname(__file__), "..",
                                   "examples", "cases", "reacting_tgv.yaml"))
    assert case.chemistry.inert_specie == "N2"
    n = 8
    L = 2e-3
    mesh = StructuredMesh.box([L, L, L / n], [n, n, 1])
    b = ((cyclic(), cyclic()), (cyclic(), cyclic()), (empty(), empty()))
    solver, mech = build_low_mach_solver(case, mesh, (b, b, b), b, b, b, b)
    assert solver.config.inert_index == mech.species_index("N2")
    ns = mech.n_species
    import numpy as _np
    Y = _np.zeros((ns,) + mesh.shape)
    Y[mech.species_index("H2")] = 0.0285
    Y[mech.species_index("O2")] = 0.2264
    Y[mech.species_index("N2")] = 0.7451
    s = solver.initial_state(jnp.full(mesh.shape, 101325.0),
                             jnp.full(mesh.shape, 1500.0), jnp.asarray(Y))
    s2, diag = jax.jit(lambda st: solver.step(st, 1e-7))(s)
    assert bool(jnp.all(jnp.isfinite(s2.T)))


def test_openfoam_field_reader(tmp_path):
    """Round-trip a hand-written OpenFOAM field + read a reference field."""
    from deepflame_tpu.runtime.openfoam_io import read_openfoam_field
    f = tmp_path / "T"
    f.write_text("""
FoamFile { version 2.0; format ascii; class volScalarField; object T; }
dimensions      [0 0 0 1 0 0 0];
internalField   nonuniform List<scalar>
6
(
1 2 3 4 5 6
)
;
boundaryField { }
""")
    arr = read_openfoam_field(str(f), (3, 2, 1))
    # blockMesh ordering: x fastest -> arr[i,j,0]
    np.testing.assert_allclose(arr[:, 0, 0], [1, 2, 3])
    np.testing.assert_allclose(arr[:, 1, 0], [4, 5, 6])
    g = tmp_path / "U"
    g.write_text("""
internalField   nonuniform List<vector>
2
(
(1 2 3) (4 5 6)
)
;
""")
    v = read_openfoam_field(str(g), (2, 1, 1))
    np.testing.assert_allclose(v[0, :, 0, 0], [1, 4])
    np.testing.assert_allclose(v[1, :, 0, 0], [2, 5])
    u = tmp_path / "p"
    u.write_text("internalField   uniform 101325;\n")
    pu = read_openfoam_field(str(u), (2, 2, 1))
    np.testing.assert_allclose(pu, 101325.0)
    # the reference's shipped TGV field parses and has the documented range
    T_ref = read_openfoam_field(
        "/root/reference/test/dfLowMachFoam/twoD_reactingTGV/H2/cvodeSolver/0/T",
        (128, 128, 1))
    assert 299.9 < T_ref.min() < 301.0 and 1900.0 < T_ref.max() < 2000.0


def test_derived_field_objects():
    """Q/vorticity/MachNo/yPlus/wallHeatFlux function objects: analytic
    checks on a solid-body-rotation velocity field and a linear shear."""
    import jax.numpy as jnp
    from deepflame_tpu.mesh import StructuredMesh, cyclic, empty
    from deepflame_tpu.runtime.derived import (vorticity, q_criterion,
                                               enstrophy, mach_number,
                                               y_plus, wall_heat_flux,
                                               DerivedFields)
    from deepflame_tpu.runtime.function_objects import FieldMinMax
    from deepflame_tpu.chemistry import load_mechanism, make_thermo
    import os
    n = 16
    L = 1.0
    mesh = StructuredMesh.box([L, L, L / n], [n, n, 1])
    b = ((cyclic(), cyclic()), (cyclic(), cyclic()), (empty(), empty()))
    bU = (b, b, b)
    X, Y, _ = mesh.cell_centers()
    Om = 3.0
    # solid-body rotation about z: U = Om x r -> vorticity_z = 2 Om, Q>0
    U = jnp.stack([-Om * (Y - L / 2), Om * (X - L / 2),
                   jnp.zeros(mesh.shape)])
    w = vorticity(U, bU, mesh)
    interior = (slice(2, -2), slice(2, -2), slice(None))
    np.testing.assert_allclose(np.asarray(w[2][interior]), 2 * Om,
                               rtol=1e-6)
    Q = q_criterion(U, bU, mesh)
    assert np.all(np.asarray(Q[interior]) > 0)   # pure rotation: Q = Om^2
    np.testing.assert_allclose(np.asarray(Q[interior]), Om * Om, rtol=1e-6)
    ens = enstrophy(U, bU, mesh)
    np.testing.assert_allclose(np.asarray(ens[interior]), 2 * Om * Om,
                               rtol=1e-6)

    # Mach number vs hand calc for air at 300 K
    mech = load_mechanism(os.path.join(os.path.dirname(__file__), "data",
                                       "air.yaml"))
    th = make_thermo(mech)
    T = jnp.full(mesh.shape, 300.0)
    Yt = jnp.ones(mesh.shape + (1,))
    Uc = jnp.stack([jnp.full(mesh.shape, 100.0), jnp.zeros(mesh.shape),
                    jnp.zeros(mesh.shape)])
    Ma = mach_number(Uc, T, Yt, th)
    a_300 = float(np.asarray(Ma).mean())
    assert 0.27 < a_300 < 0.31        # c(air,300K) ~ 347 m/s -> Ma ~ 0.288

    # yPlus on a linear shear over the y=0 wall: tau_w = mu dU/dy
    dUdy = 400.0
    Ush = jnp.stack([dUdy * Y, jnp.zeros(mesh.shape), jnp.zeros(mesh.shape)])
    rho = jnp.full(mesh.shape, 1.2)
    mu = jnp.full(mesh.shape, 1.8e-5)
    yp = y_plus(Ush, rho, mu, mesh, wall=(1, 0))
    # u_tau = sqrt(mu dUdy / rho); y+ = rho u_tau (dy/2) / mu
    dy2 = mesh.dy / 2
    u_tau = np.sqrt(1.8e-5 * dUdy / 1.2)
    np.testing.assert_allclose(np.asarray(yp), 1.2 * u_tau * dy2 / 1.8e-5,
                               rtol=1e-6)

    # wallHeatFlux: linear T profile
    Tlin = 300.0 + 1000.0 * Y
    kappa = jnp.full(mesh.shape, 0.026)
    qw = wall_heat_flux(Tlin, kappa, mesh, wall=(1, 0), T_wall=300.0)
    np.testing.assert_allclose(np.asarray(qw), 0.026 * 1000.0, rtol=1e-6)

    # DerivedFields adapter feeds storage objects
    fmm = FieldMinMax(mesh, ["Q"])
    der = DerivedFields({"Q": lambda f: q_criterion(f["U"], bU, mesh)}, fmm)
    der(0.0, {"U": U})
    assert len(fmm.rows) == 1


def test_extended_derived_fields():
    """CourantNo/PecletNo/Lambda2/wallShearStress/turbulenceIntensity/
    flowType/streamFunction (function-object long-tail parity) analytic
    checks."""
    import jax.numpy as jnp
    from deepflame_tpu.mesh import StructuredMesh, cyclic, empty
    from deepflame_tpu.runtime.derived import (
        courant_no, peclet_no, lambda2, wall_shear_stress,
        turbulence_intensity, flow_type, stream_function_2d,
        wall_heat_transfer_coeff)
    n = 16
    L = 1.0
    mesh = StructuredMesh.box([L, L, L / n], [n, n, 1])
    b = ((cyclic(), cyclic()), (cyclic(), cyclic()), (empty(), empty()))
    bU = (b, b, b)
    X, Y, _ = mesh.cell_centers()
    interior = (slice(2, -2), slice(2, -2), slice(None))

    # Courant: uniform U = (2, 1, 0), dt = dx/4 -> Co = dt*(2+1)/h
    U = jnp.stack([jnp.full(mesh.shape, 2.0), jnp.full(mesh.shape, 1.0),
                   jnp.zeros(mesh.shape)])
    dt = mesh.dx / 4.0
    co = courant_no(U, dt, mesh)
    np.testing.assert_allclose(np.asarray(co), dt * 3.0 / mesh.dx, rtol=1e-12)

    # Peclet: |U| h rho / gamma
    pe = peclet_no(U, jnp.full(mesh.shape, 1.2), jnp.full(mesh.shape, 1e-3),
                   mesh)
    np.testing.assert_allclose(np.asarray(pe),
                               np.sqrt(5.0) * mesh.dx * 1.2 / 1e-3, rtol=1e-6)

    # Lambda2 for solid-body rotation about z, Omega: S=0, W^2 has
    # eigenvalues (-Om^2, -Om^2, 0) -> middle eigenvalue = -Om^2 < 0 (vortex)
    Om = 3.0
    Urot = jnp.stack([-Om * (Y - L / 2), Om * (X - L / 2),
                      jnp.zeros(mesh.shape)])
    l2 = lambda2(Urot, bU, mesh)
    np.testing.assert_allclose(np.asarray(l2[interior]), -Om * Om, rtol=1e-5)

    # flowType: pure rotation -> 0; simple shear -> 1
    ft = flow_type(Urot, bU, mesh)
    np.testing.assert_allclose(np.asarray(ft[interior]), 0.0, atol=1e-6)
    Ushear = jnp.stack([5.0 * (Y - L / 2), jnp.zeros(mesh.shape),
                        jnp.zeros(mesh.shape)])
    ft2 = flow_type(Ushear, bU, mesh)
    np.testing.assert_allclose(np.asarray(ft2[interior]), 1.0, atol=1e-6)

    # wallShearStress on linear shear over y=0 wall: tau = mu * u(y0)/(h/2)
    mu = jnp.full(mesh.shape, 1.8e-5)
    tau = wall_shear_stress(Ushear, None, mu, mesh, wall=(1, 0))
    u_first = 5.0 * (0.5 * mesh.dy - L / 2)
    np.testing.assert_allclose(np.asarray(tau[0]),
                               1.8e-5 * u_first / (0.5 * mesh.dy), rtol=1e-6)

    # turbulence intensity: k = 1.5 -> sqrt(2k/3)=1; |U|=sqrt(5)
    ti = turbulence_intensity(U, jnp.full(mesh.shape, 1.5))
    np.testing.assert_allclose(np.asarray(ti), 1.0 / np.sqrt(5.0), rtol=1e-6)

    # wall heat transfer coefficient: q_w / (T_wall - T_ref)
    T = jnp.full(mesh.shape, 350.0)
    kap = jnp.full(mesh.shape, 0.026)
    h_c = wall_heat_transfer_coeff(T, kap, mesh, (1, 0), T_wall=400.0,
                                   T_ref=300.0)
    qw = 0.026 * (350.0 - 400.0) / (0.5 * mesh.dy)
    np.testing.assert_allclose(np.asarray(h_c), qw / 100.0, rtol=1e-12)

    # stream function of uniform flow u=(1,0): psi = y -> corner rows differ
    # by dy * flux; fluxes: phi_x (nx+1,ny,1) = dy*dz*1 (area-weighted here
    # taken as unit-depth velocity flux), phi_y = 0
    fx = jnp.full((n + 1, n, 1), mesh.dy)
    fy = jnp.zeros((n, n + 1, 1))
    psi = stream_function_2d(fx, fy, mesh)
    d_psi = np.diff(np.asarray(psi), axis=1)
    np.testing.assert_allclose(d_psi, mesh.dy, rtol=1e-12)


def test_histogram_and_field_calculus(tmp_path):
    import jax.numpy as jnp
    from deepflame_tpu.mesh import StructuredMesh
    from deepflame_tpu.runtime.function_objects import (
        Histogram, FieldCalculus, write_cell_centres, write_cell_volumes)
    mesh = StructuredMesh.box([1.0, 1.0, 0.25], [4, 4, 1])
    f = {"T": jnp.linspace(300.0, 400.0, 16).reshape(4, 4, 1),
         "U": jnp.ones((3, 4, 4, 1)) * 2.0}
    h = Histogram("T", n_bins=4, lo=300.0, hi=400.0,
                  out_dir=str(tmp_path / "hist"))
    h(0.0, f)
    paths = h.write()
    data = np.loadtxt(paths[0])
    assert data[:, 1].sum() == 16

    assert np.allclose(FieldCalculus.mag("U")(f), np.sqrt(12.0))
    assert np.allclose(FieldCalculus.mag_sqr("U")(f), 12.0)
    assert np.allclose(FieldCalculus.component("U", 1)(f), 2.0)
    assert np.allclose(FieldCalculus.add("T", "T")(f),
                       2 * np.asarray(f["T"]))
    assert np.allclose(FieldCalculus.subtract("T", "T")(f), 0.0)
    assert np.allclose(FieldCalculus.scale("T", 2.0)(f),
                       2 * np.asarray(f["T"]))
    assert np.allclose(FieldCalculus.log("T")(f), np.log(np.asarray(f["T"])))
    ddt = FieldCalculus.ddt("T", 0.1)
    assert np.allclose(ddt(f), 0.0)            # first call: no history
    f2 = {"T": f["T"] + 1.0}
    assert np.allclose(ddt(f2), 10.0)

    p1 = write_cell_centres(mesh, str(tmp_path / "mesh"))
    p2 = write_cell_volumes(mesh, str(tmp_path / "mesh"))
    assert np.loadtxt(p1).shape == (16, 3)
    np.testing.assert_allclose(np.loadtxt(p2), mesh.volume)


def test_vol_and_surface_field_values(tmp_path):
    import numpy as np
    import jax.numpy as jnp
    from deepflame_tpu.mesh import StructuredMesh
    from deepflame_tpu.runtime.function_objects import (VolFieldValue,
                                                        SurfaceFieldValue)

    mesh = StructuredMesh.box([1.0, 1.0, 1.0], [8, 8, 8])
    X, _, _ = mesh.cell_centers()
    f = np.asarray(X)                                # mean 0.5
    vol = VolFieldValue(mesh, ["f"], ops=("sum", "volIntegrate",
                                          "volAverage", "min", "max", "CoV"),
                        out_dir=str(tmp_path / "vol"))
    vol(0.0, {"f": f})
    s, vi, va, mn, mx, cov = vol.rows[0][1:]
    assert abs(va - 0.5) < 1e-12
    assert abs(vi - 0.5) < 1e-12                     # integral over unit box
    assert abs(mn - 1 / 16) < 1e-12 and abs(mx - 15 / 16) < 1e-12
    # box-restricted region
    vol2 = VolFieldValue(mesh, ["f"], ops=("volAverage",),
                         box=((0.0, 0.5), (0.0, 1.0), (0.0, 1.0)),
                         out_dir=str(tmp_path / "vol2"))
    vol2(0.0, {"f": f})
    assert abs(vol2.rows[0][1] - 0.25) < 1e-12

    # face-plane reduction: uniform face flux 2.0 on the high-x plane
    phi_x = np.full((9, 8, 8), 2.0)
    sv = SurfaceFieldValue(mesh, ["phi"], axis=0, index=8,
                           ops=("areaAverage", "areaIntegrate"),
                           out_dir=str(tmp_path / "surf"))
    sv(0.0, {"phi": phi_x})
    aavg, aint = sv.rows[0][1:]
    assert abs(aavg - 2.0) < 1e-12
    assert abs(aint - 2.0) < 1e-12                   # area = 1
    p1 = vol.write(); p2 = sv.write()
    assert (tmp_path / "vol" / "volFieldValue.dat").exists()
    assert (tmp_path / "surf" / "surfaceFieldValue.dat").exists()


def test_pressure_tools_and_delta(tmp_path):
    """total_pressure / pressure_coefficient / fieldValueDelta parity."""
    import numpy as np
    from deepflame_tpu.mesh import StructuredMesh
    from deepflame_tpu.runtime.function_objects import (
        FieldValueDelta, VolFieldValue, total_pressure,
        pressure_coefficient)
    rho = np.full((4, 4, 1), 2.0)
    U = np.zeros((3, 4, 4, 1))
    U[0] = 3.0
    p = np.full((4, 4, 1), 1000.0)
    p0 = total_pressure(p, rho, U)
    np.testing.assert_allclose(p0, 1000.0 + 0.5 * 2.0 * 9.0)
    cp = pressure_coefficient(p, rho, U, p_inf=900.0, U_inf=3.0)
    np.testing.assert_allclose(cp, 100.0 / (0.5 * 2.0 * 9.0))

    mesh = StructuredMesh.box([1.0, 1.0, 0.1], [4, 4, 1])
    a = VolFieldValue(mesh, ["T"], ops=("max",),
                      out_dir=str(tmp_path / "a"))
    b = VolFieldValue(mesh, ["T"], ops=("min",),
                      out_dir=str(tmp_path / "b"))
    d = FieldValueDelta(a, b, op="subtract",
                        out_dir=str(tmp_path / "d"))
    T = np.linspace(300.0, 400.0, 16).reshape(4, 4, 1)
    d(0.0, {"T": T})
    assert abs(d.rows[-1][1] - 100.0) < 1e-12
    d.write()


def test_long_tail_function_objects(tmp_path):
    """randomise / surfaceInterpolate / nearWallFields / processorField /
    readFields / fieldCoordinateSystemTransform / streamLine /
    regionSizeDistribution / blendingFactor parity objects."""
    from deepflame_tpu.runtime.function_objects import (
        NearWallFields, ReadFields, StreamLine, blending_factor,
        field_coordinate_system_transform, processor_field,
        randomise, region_size_distribution, surface_interpolate)

    mesh = StructuredMesh.box([1.0, 1.0, 0.1], [8, 8, 1])
    X, Y, _ = mesh.cell_centers()
    T = 300.0 + 100.0 * np.asarray(X)

    # randomise: bounded, mean-preserving-ish perturbation
    Tr = randomise(T, 1.0, seed=3)
    assert np.all(np.abs(Tr - T) <= 1.0)
    assert not np.allclose(Tr, T)

    # surfaceInterpolate: exact for a linear field (midpoint of neighbours)
    fx, fy, fz = surface_interpolate(T, mesh)
    np.testing.assert_allclose(fx, 0.5 * (T[:-1] + T[1:]), rtol=1e-14)
    assert fx.shape == (7, 8, 1) and fy.shape == (8, 7, 1)

    # nearWallFields: the low-x layer of T is the smallest column
    nwf = NearWallFields(["T"], axis=0, side=0,
                         out_dir=str(tmp_path / "nwf"))
    nwf(0.0, {"T": T})
    nwf.write()
    rows = np.loadtxt(str(tmp_path / "nwf" / "nearWallFields.dat"),
                      ndmin=2)
    np.testing.assert_allclose(rows[0, 3], T[0].mean())

    # processorField: block partition along x into 4 slabs
    pid = processor_field(mesh, n_shards=4, axis=0)
    assert pid.shape == mesh.shape
    assert pid.min() == 0 and pid.max() == 3
    assert np.all(np.diff(pid[:, 0, 0]) >= 0)

    # readFields: injects snapshot fields into the registry
    np.savez(tmp_path / "snap.npz", Qdot=np.asarray(T) * 2.0)
    rf = ReadFields(str(tmp_path / "snap.npz"))
    reg = {"T": T}
    rf(0.0, reg)
    np.testing.assert_allclose(reg["Qdot"], T * 2.0)

    # coordinate transform: rotating x-aligned flow into a 45-degree basis
    U = np.zeros((3, 4))
    U[0] = 1.0
    Ur = field_coordinate_system_transform(
        U, origin=(0, 0, 0), e1=(1, 1, 0), e3=(0, 0, 1))
    np.testing.assert_allclose(Ur[0], np.sqrt(0.5), rtol=1e-12)
    np.testing.assert_allclose(Ur[2], 0.0, atol=1e-15)

    # streamline in uniform +x flow: straight line along x
    Uf = np.zeros((3,) + mesh.shape)
    Uf[0] = 2.0
    sl = StreamLine(mesh, seeds=[(0.1, 0.5, 0.05)], max_steps=50,
                    out_dir=str(tmp_path / "sl"))
    sl(0.0, {"U": Uf})
    paths = sl.write()
    track = np.loadtxt(paths[0])
    assert track.shape[0] > 5
    np.testing.assert_allclose(track[:, 1], 0.5, atol=1e-12)
    assert np.all(np.diff(track[:, 0]) > 0)

    # regionSizeDistribution: two disjoint hot blobs -> two regions
    f = np.zeros(mesh.shape)
    f[1:3, 1:3, 0] = 1.0
    f[5:8, 5:8, 0] = 1.0
    sizes = region_size_distribution(f, 0.5, cell_volume=mesh.volume)
    assert sizes.shape[0] == 2
    np.testing.assert_allclose(sizes / mesh.volume, [9.0, 4.0])

    # blendingFactor: 1 in smooth regions, 0 at an extremum
    g = np.asarray(X).copy()            # linear -> r = 1 -> psi = 1
    psi = blending_factor(g, mesh, axis=0)
    np.testing.assert_allclose(psi[2:-2], 1.0)
    h = np.cos(8 * np.pi * np.asarray(X))    # oscillatory -> limited
    psih = blending_factor(h, mesh, axis=0)
    assert psih.min() < 0.5


def test_age_interface_height_xi_reaction_rate(tmp_path):
    """age / interfaceHeight / XiReactionRate parity objects (the last
    items of the reference's functionObjects/field Make list)."""
    from deepflame_tpu.runtime.function_objects import (
        age, interface_height, xi_reaction_rate)

    # age in a uniform duct flow u = 2 m/s: the discrete first-order
    # upwind solution is tau_i = (i+1) dx / u (residence time at the
    # cell's outflow face; tau = 0 at the inlet)
    n = 16
    mesh = StructuredMesh.box([1.0, 0.1, 0.1], [n, 1, 1])
    u = 2.0
    area_x = mesh.dy * mesh.dz
    phi_x = np.full((n + 1, 1, 1), u * area_x)
    phi_y = np.zeros((n, 2, 1))
    phi_z = np.zeros((n, 1, 2))
    tau = age((phi_x, phi_y, phi_z), mesh, n_sweeps=3 * n)
    np.testing.assert_allclose(
        tau[:, 0, 0], (np.arange(n) + 1) * mesh.dx / u, rtol=1e-10)

    # interfaceHeight: a sharp liquid layer of depth 0.375 along z
    mesh3 = StructuredMesh.box([1.0, 1.0, 1.0], [4, 4, 8])
    alpha = np.zeros(mesh3.shape)
    alpha[:, :, :3] = 1.0                      # 3 of 8 cells full
    h = interface_height(alpha, mesh3, locations=[(0.5, 0.5)], axis=2)
    np.testing.assert_allclose(h, [0.375], rtol=1e-12)

    # XiReactionRate: planar b ramp, uniform Xi/Su ->
    # St = Xi*Su, wdot = rho_u*St*|db/dx|
    mesh2 = StructuredMesh.box([1.0, 0.1, 0.1], [32, 1, 1])
    X2, _, _ = mesh2.cell_centers()
    b = np.clip(np.asarray(X2), 0.0, 1.0)      # db/dx = 1
    St, wdot = xi_reaction_rate(b, Xi=2.0, Su=0.4, rho_u=1.1, mesh=mesh2)
    np.testing.assert_allclose(St, 0.8)
    np.testing.assert_allclose(wdot[8:-8], 1.1 * 0.8 * 1.0, rtol=1e-6)
