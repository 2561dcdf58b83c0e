"""Multi-device domain decomposition: sharded == unsharded.

Role parity: the reference's only distributed test is the DEBUG_ compile flag
diffing CPU vs GPU paths per step (/root/reference/src_gpu/
dfMatrixDataBase.H:52-64). Here it is a real test: the SAME jitted step runs
replicated and sharded over an 8-device mesh (domain decomposition along x,
SURVEY.md §2.11.1); GSPMD inserts halo exchanges + reductions, and the
results must agree to roundoff.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from deepflame_tpu.chemistry import (load_mechanism, make_thermo,
                                     make_kinetics, make_transport)
from deepflame_tpu.combustion import NoCombustion
from deepflame_tpu.mesh import StructuredMesh, cyclic, empty
from deepflame_tpu.solvers.low_mach import LowMachSolver, LowMachConfig
from deepflame_tpu.solvers.high_speed import HighSpeedSolver, HighSpeedConfig

import os
DATA = os.path.join(os.path.dirname(__file__), "data")

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 virtual devices")


def _shard_state(state, mesh_dev, spec_map):
    def put(x, spec):
        if hasattr(x, "shape") and x.ndim > 0:
            return jax.device_put(x, NamedSharding(mesh_dev, spec))
        return x
    return jax.tree.map(put, state, spec_map)


def test_low_mach_sharded_equals_unsharded():
    mech = load_mechanism(os.path.join(DATA, "air.yaml"))
    th, tr, kin = make_thermo(mech), make_transport(mech), make_kinetics(mech)
    n = 32
    L = 2e-3
    mesh = StructuredMesh.box([L, L, L / n], [n, n, 1])
    b = ((cyclic(), cyclic()), (cyclic(), cyclic()), (empty(), empty()))
    solver = LowMachSolver(
        mesh=mesh, thermo=th, transport=tr, combustion=NoCombustion(th, kin),
        bcs_U=(b, b, b), bcs_p=b, bcs_h=b, bcs_Y=b, bcs_rho=b,
        config=LowMachConfig(chemistry=False))
    X, Yg, _ = mesh.cell_centers()
    k = 2 * np.pi / L
    U = jnp.stack([2.0 * jnp.sin(k * X) * jnp.cos(k * Yg),
                   -2.0 * jnp.cos(k * X) * jnp.sin(k * Yg),
                   jnp.zeros(mesh.shape)])
    T = 300.0 + 40.0 * jnp.sin(k * X)
    state = solver.initial_state(jnp.full(mesh.shape, 101325.0), T,
                                 jnp.ones((1,) + mesh.shape), U)
    dt = 1e-6
    step = jax.jit(lambda s: solver.step(s, dt)[0])
    ref = jax.block_until_ready(step(state))

    mesh_dev = Mesh(np.array(jax.devices()[:8]), ("x",))
    cell = P("x")
    vec = P(None, "x")
    spec = type(state)(rho=cell, U=vec, p=cell, ha=cell, Y=vec, T=cell,
                      phi=(P(), P(), P()), dpdt=cell, time=P())
    sharded = _shard_state(state, mesh_dev, spec)
    out = jax.block_until_ready(step(sharded))

    for name in ("rho", "U", "p", "ha", "T"):
        a = np.asarray(getattr(ref, name))
        bb = np.asarray(getattr(out, name))
        np.testing.assert_allclose(a, bb, rtol=1e-11, atol=1e-11,
                                   err_msg=name)


def test_high_speed_sharded_equals_unsharded():
    mech = load_mechanism(os.path.join(DATA, "air.yaml"))
    th, kin = make_thermo(mech), make_kinetics(mech)
    n = 64
    mesh = StructuredMesh.box([1.0, 1.0 / n, 1.0 / n], [n, 1, 1])
    b = ((cyclic(), cyclic()), (empty(), empty()), (empty(), empty()))
    solver = HighSpeedSolver(
        mesh=mesh, thermo=th, kinetics=kin, bcs_rho=b, bcs_U=(b, b, b),
        bcs_p=b, bcs_Y=b,
        config=HighSpeedConfig(flux="HLLC", rk_order=2, chemistry="none"))
    X, _, _ = mesh.cell_centers()
    T = 300.0 + 50.0 * jnp.exp(-((X - 0.5) / 0.1) ** 2)
    p = 1e5 * (1.0 + 0.2 * jnp.exp(-((X - 0.5) / 0.1) ** 2))
    state = solver.initial_state(p, T, jnp.ones((1,) + mesh.shape))
    dt = 1e-5
    step = jax.jit(lambda s: solver.step(s, dt)[0])
    ref = jax.block_until_ready(step(state))

    mesh_dev = Mesh(np.array(jax.devices()[:8]), ("x",))
    spec = type(state)(rho=P("x"), rhoU=P(None, "x"), rhoE=P("x"),
                       rhoY=P(None, "x"), T=P("x"), time=P())
    sharded = _shard_state(state, mesh_dev, spec)
    out = jax.block_until_ready(step(sharded))
    for name in ("rho", "rhoU", "rhoE", "rhoY", "T"):
        np.testing.assert_allclose(np.asarray(getattr(ref, name)),
                                   np.asarray(getattr(out, name)),
                                   rtol=1e-12, atol=1e-12, err_msg=name)
