"""Geometric multigrid V-cycle preconditioner (GAMG/AmgX parity)."""
import jax
import jax.numpy as jnp
import numpy as np

from deepflame_tpu.mesh import StructuredMesh, fixed_value, zero_gradient, \
    cyclic, empty
from deepflame_tpu.ops.fv import fvm_laplacian, fvm_source_implicit
from deepflame_tpu.ops.linsolve import cg
from deepflame_tpu.ops.multigrid import make_mg_preconditioner


def test_mg_cg_poisson_iterations():
    """MG-CG converges in O(10) iterations where Jacobi-CG needs O(n)."""
    n = 128
    mesh = StructuredMesh.box([1.0, 1.0, 1.0 / n], [n, n, 1])
    b_bc = ((fixed_value(0.0), fixed_value(0.0)),
            (zero_gradient(), zero_gradient()), (empty(), empty()))
    gamma = (jnp.ones((n + 1, n, 1)), jnp.ones((n, n + 1, 1)),
             jnp.ones((n, n, 2)))
    diag_c = jnp.full(mesh.shape, 1e-6)
    eqn = (fvm_source_implicit(diag_c, mesh, b_bc, dtype=jnp.float64)
           + fvm_laplacian(gamma, mesh, b_bc, dtype=jnp.float64, sign=-1.0))
    rng = np.random.default_rng(0)
    rhs = jnp.asarray(rng.normal(size=mesh.shape))
    x0 = jnp.zeros(mesh.shape)

    M_mg = make_mg_preconditioner(mesh, b_bc, diag_c, gamma, jnp.float64)
    r_mg = cg(eqn.apply, rhs, x0, M_mg, tol=0.0, rel_tol=1e-8, max_iter=200)
    d = eqn.diag()
    M_j = lambda r: r / d
    r_j = cg(eqn.apply, rhs, x0, M_j, tol=0.0, rel_tol=1e-8, max_iter=2000)

    assert int(r_mg.iterations) < 25, int(r_mg.iterations)
    assert int(r_j.iterations) > 3 * int(r_mg.iterations)
    # both converge to the same solution
    np.testing.assert_allclose(np.asarray(r_mg.x), np.asarray(r_j.x),
                               atol=1e-5)


def test_mg_variable_coefficients_cyclic():
    """Variable-coefficient operator with cyclic BCs + diagonal shift."""
    n = 64
    mesh = StructuredMesh.box([1.0, 1.0, 1.0 / n], [n, n, 1])
    b_bc = ((cyclic(), cyclic()), (cyclic(), cyclic()), (empty(), empty()))
    rng = np.random.default_rng(1)
    gamma = (jnp.asarray(rng.uniform(0.5, 2.0, (n + 1, n, 1))),
             jnp.asarray(rng.uniform(0.5, 2.0, (n, n + 1, 1))),
             jnp.ones((n, n, 2)))
    diag_c = jnp.asarray(rng.uniform(0.5, 1.5, mesh.shape))
    eqn = (fvm_source_implicit(diag_c, mesh, b_bc, dtype=jnp.float64)
           + fvm_laplacian(gamma, mesh, b_bc, dtype=jnp.float64, sign=-1.0))
    rhs = jnp.asarray(rng.normal(size=mesh.shape))
    M = make_mg_preconditioner(mesh, b_bc, diag_c, gamma, jnp.float64)
    res = cg(eqn.apply, rhs, jnp.zeros(mesh.shape), M, tol=0.0, rel_tol=1e-10,
             max_iter=100)
    assert int(res.iterations) < 30
    r = np.asarray(eqn.apply(res.x) - rhs)
    assert np.abs(r).max() / np.abs(np.asarray(rhs)).max() < 1e-8
