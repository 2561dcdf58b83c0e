"""AMR analogue: multi-criteria marking, conservative re-gridding."""
import jax.numpy as jnp
import numpy as np

from deepflame_tpu.mesh import StructuredMesh, zero_gradient
from deepflame_tpu.mesh.amr import (AdaptiveResolution, RefinementCriteria,
                                    coarsen_field, coarsen_mesh, mark_cells,
                                    refine_field, refine_mesh)


def bcs_all():
    b = (zero_gradient(), zero_gradient())
    return (b, b, b)


def test_marking_gradient_and_value():
    n = 32
    mesh = StructuredMesh.box([1.0, 1.0, 1.0 / n], [n, n, 1])
    X, Y, _ = mesh.cell_centers()
    # sharp front at x = 0.5
    T = 300.0 + 1700.0 * 0.5 * (1 + jnp.tanh((X - 0.5) / 0.02))
    crit = RefinementCriteria(gradients=(("T", 100.0),), n_buffer=2)
    mark = np.asarray(mark_cells(crit, {"T": T}, bcs_all(), mesh)).squeeze()
    xs = np.asarray(X).squeeze()[:, 0]
    marked_x = xs[mark[:, 0] > 0]
    assert 0.3 < marked_x.min() < 0.5 < marked_x.max() < 0.7
    assert mark.mean() < 0.5          # only the front region
    # value-window criterion
    crit2 = RefinementCriteria(fields=(("T", 500.0, 1500.0),), n_buffer=0)
    mark2 = np.asarray(mark_cells(crit2, {"T": T}, bcs_all(), mesh)).squeeze()
    T_n = np.asarray(T).squeeze()
    assert np.all(mark2[(T_n >= 500) & (T_n <= 1500)] == 1)


def test_refine_coarsen_conservation():
    rng = np.random.default_rng(0)
    f = jnp.asarray(rng.random((8, 6, 1)))
    fr = refine_field(f, axes=(0, 1))
    assert fr.shape == (16, 12, 1)
    # exact round trip (prolongation then restriction)
    np.testing.assert_allclose(np.asarray(coarsen_field(fr, axes=(0, 1))),
                               np.asarray(f), rtol=1e-14)
    # integral conservation under coarsening of any field
    g = jnp.asarray(rng.random((16, 12, 1)))
    gc = coarsen_field(g, axes=(0, 1))
    np.testing.assert_allclose(float(g.mean()), float(gc.mean()), rtol=1e-13)
    # mass-weighted restriction conserves rho*f
    rho = jnp.asarray(rng.random((16, 12, 1)) + 0.5)
    fw = coarsen_field(g, axes=(0, 1), weights=rho)
    lhs = float((coarsen_field(rho, axes=(0, 1)) * fw).mean())
    np.testing.assert_allclose(lhs, float((rho * g).mean()), rtol=1e-13)


def test_adaptive_driver():
    n = 16
    mesh = StructuredMesh.box([1.0, 1.0, 1.0 / n], [n, n, 1])
    X, Y, _ = mesh.cell_centers()
    T_front = 300.0 + 1700.0 * 0.5 * (1 + jnp.tanh((X - 0.5) / 0.05))
    T_flat = jnp.full(mesh.shape, 300.0)
    drv = AdaptiveResolution(
        criteria=RefinementCriteria(gradients=(("T", 200.0),), n_buffer=1),
        refine_above=0.01, coarsen_below=0.001, max_level=2)
    m2, action = drv.maybe_adapt(mesh, {"T": T_front}, bcs_all())
    assert action == "refine" and m2.nx == 2 * n and drv.level == 1
    m3, action = drv.maybe_adapt(m2, {"T": refine_field(T_front)}, bcs_all())
    assert action == "refine" and drv.level == 2
    # flat field -> coarsen back
    m4, action = drv.maybe_adapt(m3, {"T": jnp.full(m3.shape, 300.0)},
                                 bcs_all())
    assert action == "coarsen" and drv.level == 1
