"""LES SGS model validation.

Checks the analytic properties each model must satisfy (the same physics the
reference's Smagorinsky/dynamicSmagorinsky/Sigma models encode,
/root/reference/src/TurbulenceModels/turbulenceModels/LES/).
"""
import jax.numpy as jnp
import numpy as np
import pytest

from deepflame_tpu.mesh import StructuredMesh, cyclic
from deepflame_tpu.turbulence import (smagorinsky, wale, sigma_model,
                                      dynamic_smagorinsky)
from deepflame_tpu.turbulence.les import _eig3_sym


def setup_field(kind="shear"):
    n = 16
    mesh = StructuredMesh.box([1.0, 1.0, 1.0], [n, n, n])
    b = ((cyclic(), cyclic()),) * 3
    bcs_U = (b, b, b)
    X, Y, Z = mesh.cell_centers()
    if kind == "shear":
        # pure shear u = S*y: known |S| = S
        U = jnp.stack([2.0 * jnp.sin(2 * jnp.pi * Y),
                       jnp.zeros(mesh.shape), jnp.zeros(mesh.shape)])
    elif kind == "triax":
        # three-directional shear: nonzero for WALE/Sigma too
        U = jnp.stack([2.0 * jnp.sin(2 * jnp.pi * Y),
                       1.5 * jnp.sin(2 * jnp.pi * Z),
                       1.0 * jnp.sin(2 * jnp.pi * X)])
    elif kind == "solid":
        # solid-body rotation: zero strain -> zero nu_t for all models
        U = jnp.stack([-2.0 * (Y - 0.5), 2.0 * (X - 0.5),
                       jnp.zeros(mesh.shape)])
    rho = jnp.ones(mesh.shape)
    return mesh, bcs_U, U, rho


def test_eig3_sym():
    rng = np.random.default_rng(0)
    A = rng.normal(size=(3, 3, 10))
    A = A + A.transpose(1, 0, 2)
    e1, e2, e3 = _eig3_sym(jnp.asarray(A))
    ours = np.sort(np.stack([np.asarray(e1), np.asarray(e2), np.asarray(e3)]),
                   axis=0)[::-1]
    for k in range(10):
        ref = np.sort(np.linalg.eigvalsh(A[:, :, k]))[::-1]
        np.testing.assert_allclose(ours[:, k], ref, rtol=1e-8, atol=1e-10)


@pytest.mark.parametrize("model", [smagorinsky(), wale(), sigma_model(),
                                   dynamic_smagorinsky()])
def test_positive_and_finite(model):
    mesh, bcs_U, U, rho = setup_field("triax")
    mut = model.mu_t(rho, U, bcs_U, mesh)
    m = np.asarray(mut)
    assert np.all(np.isfinite(m))
    assert m.min() >= -1e-12
    assert m.max() > 0.0


@pytest.mark.parametrize("model", [wale(), sigma_model()])
def test_zero_for_pure_shear(model):
    """WALE and Sigma vanish in pure shear (their wall-behavior design
    property; plain Smagorinsky does not)."""
    mesh, bcs_U, U, rho = setup_field("shear")
    mut = np.asarray(model.mu_t(rho, U, bcs_U, mesh))
    assert mut.max() < 1e-10


@pytest.mark.parametrize("model", [sigma_model()])
def test_zero_for_solid_rotation(model):
    """Sigma must vanish for solid-body rotation (its design property;
    WALE famously does NOT — grad(U)^2 is symmetric-nonzero in rotation)."""
    mesh, bcs_U, U, rho = setup_field("solid")
    # cyclic wrap corrupts the linear rotation profile at box edges; the
    # model property holds in the interior
    mut = np.asarray(model.mu_t(rho, U, bcs_U, mesh))[2:-2, 2:-2, 2:-2]
    assert mut.max() < 1e-10


def test_smagorinsky_magnitude():
    """Pure sinusoidal shear: nu_t = (Cs d)^2 |S| with |S| = |du/dy|."""
    mesh, bcs_U, U, rho = setup_field("shear")
    model = smagorinsky()
    mut = np.asarray(model.mu_t(rho, U, bcs_U, mesh))
    delta = (mesh.dx * mesh.dy * mesh.dz) ** (1 / 3)
    # at the cells where |cos| ~ max: dudy ~ 4 pi (2nd-order central of sin)
    k = 2 * np.pi
    # central difference of sin at cell centers: 2 k sinc(k h) max|cos(k y_i)|
    yc = (np.arange(16) + 0.5) * mesh.dy
    cos_max = np.abs(np.cos(k * yc)).max()
    dudy_num = 2.0 * k * np.sin(k * mesh.dy) / (k * mesh.dy) * cos_max
    expected = (model.Cs * delta) ** 2 * abs(dudy_num)
    np.testing.assert_allclose(mut.max(), expected, rtol=1e-6)


def test_eig3_sym_uniform_region_f32():
    """f32 regression (round 5): a uniform-gradient region (A = q I, p2 = 0)
    must not divide by a flushed-to-zero floor — 1e-60 underflows in f32,
    which NaN'd the Sigma model in any laminar coflow (jet-flame configs)."""
    import jax.numpy as jnp
    import numpy as np
    from deepflame_tpu.turbulence.les import _eig3_sym

    A = jnp.broadcast_to(2.5 * jnp.eye(3, dtype=jnp.float32)[:, :, None],
                         (3, 3, 4)).astype(jnp.float32)
    e1, e2, e3 = _eig3_sym(A)
    for e in (e1, e2, e3):
        assert bool(jnp.all(jnp.isfinite(e)))
        np.testing.assert_allclose(np.asarray(e), 2.5, rtol=1e-5)
    # exact-zero matrix too
    Z = jnp.zeros((3, 3, 4), jnp.float32)
    for e in _eig3_sym(Z):
        assert bool(jnp.all(jnp.isfinite(e)))
