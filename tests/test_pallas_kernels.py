"""Pallas fused Helmholtz-operator kernel vs the FvMatrix reference
(interpret mode on CPU; the compiled path runs on TPU)."""
import jax
import jax.numpy as jnp
import numpy as np

from deepflame_tpu.mesh import (StructuredMesh, cyclic, empty, fixed_value,
                                zero_gradient, pad_field)
from deepflame_tpu.ops.fv import fvm_laplacian, fvm_source_implicit
from deepflame_tpu.ops.pallas_kernels import helmholtz_apply, fits_vmem


def test_helmholtz_matches_fvmatrix():
    rng = np.random.default_rng(0)
    n = 16
    mesh = StructuredMesh.box([1.0, 0.5, 0.25], [n, n, n])
    bcs = ((fixed_value(0.3), zero_gradient()),
           (cyclic(), cyclic()),
           (zero_gradient(), fixed_value(1.2)))
    gamma = (jnp.asarray(rng.uniform(0.5, 2.0, (n + 1, n, n))),
             jnp.asarray(rng.uniform(0.5, 2.0, (n, n + 1, n))),
             jnp.asarray(rng.uniform(0.5, 2.0, (n, n, n + 1))))
    d = jnp.asarray(rng.uniform(0.1, 1.0, mesh.shape))
    eqn = (fvm_source_implicit(d, mesh, bcs, dtype=jnp.float64)
           + fvm_laplacian(gamma, mesh, bcs, dtype=jnp.float64, sign=-1.0))
    x = jnp.asarray(rng.normal(size=mesh.shape))
    ref = eqn.apply(x)
    xp = pad_field(x, bcs, mesh, homogeneous=True)
    ours = helmholtz_apply(xp, gamma, d, mesh.spacing, interpret=True)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref),
                               rtol=1e-12, atol=1e-12)


def test_helmholtz_2d_empty_axis():
    rng = np.random.default_rng(1)
    n = 12
    mesh = StructuredMesh.box([1.0, 1.0, 1.0 / n], [n, n, 1])
    bcs = ((cyclic(), cyclic()), (cyclic(), cyclic()), (empty(), empty()))
    gamma = (jnp.asarray(rng.uniform(0.5, 2.0, (n + 1, n, 1))),
             jnp.asarray(rng.uniform(0.5, 2.0, (n, n + 1, 1))),
             jnp.ones((n, n, 2)))
    d = jnp.asarray(rng.uniform(0.1, 1.0, mesh.shape))
    eqn = (fvm_source_implicit(d, mesh, bcs, dtype=jnp.float64)
           + fvm_laplacian(gamma, mesh, bcs, dtype=jnp.float64, sign=-1.0))
    x = jnp.asarray(rng.normal(size=mesh.shape))
    xp = pad_field(x, bcs, mesh, homogeneous=True)
    ours = helmholtz_apply(xp, gamma, d, mesh.spacing, interpret=True)
    # fvm_laplacian skips nothing; axis z has size 1 so fluxes cancel there
    np.testing.assert_allclose(np.asarray(ours), np.asarray(eqn.apply(x)),
                               rtol=1e-12, atol=1e-12)


def test_helmholtz_tiled_matches_fvmatrix():
    """x-tiled kernel (halo via two adjacent blocks) == FvMatrix, incl. the
    LAST tile whose i+1 input block extends past the array end."""
    from deepflame_tpu.ops.pallas_kernels import (fits_vmem_tiled,
                                                  helmholtz_apply_tiled)
    rng = np.random.default_rng(2)
    n = 16
    mesh = StructuredMesh.box([1.0, 0.5, 0.25], [n, n, n])
    bcs = ((fixed_value(0.3), zero_gradient()),
           (cyclic(), cyclic()),
           (zero_gradient(), fixed_value(1.2)))
    gamma = (jnp.asarray(rng.uniform(0.5, 2.0, (n + 1, n, n))),
             jnp.asarray(rng.uniform(0.5, 2.0, (n, n + 1, n))),
             jnp.asarray(rng.uniform(0.5, 2.0, (n, n, n + 1))))
    d = jnp.asarray(rng.uniform(0.1, 1.0, mesh.shape))
    eqn = (fvm_source_implicit(d, mesh, bcs, dtype=jnp.float64)
           + fvm_laplacian(gamma, mesh, bcs, dtype=jnp.float64, sign=-1.0))
    x = jnp.asarray(rng.normal(size=mesh.shape))
    ref = eqn.apply(x)
    xp = pad_field(x, bcs, mesh, homogeneous=True)
    for tx in (2, 4, 8):
        ours = helmholtz_apply_tiled(xp, gamma, d, mesh.spacing, tx=tx,
                                     interpret=True)
        np.testing.assert_allclose(np.asarray(ours), np.asarray(ref),
                                   rtol=1e-12, atol=1e-12)
    # feasibility: 128^3 f32 tiles fit where the whole array cannot
    assert not fits_vmem((128, 128, 128), np.float32)
    assert fits_vmem_tiled((128, 128, 128), np.float32, tx=8)
    assert not fits_vmem_tiled((128, 128, 128), np.float64, tx=8)
    assert not fits_vmem_tiled((100, 128, 128), np.float32, tx=8)  # 8∤100


def test_fits_vmem():
    assert fits_vmem((48, 48, 48), np.float32)
    assert not fits_vmem((256, 256, 256), np.float32)
    # thin-z 2D fields pad their unit lane dim to 128 in VMEM: must reject
    # (a (128,128,1) operand occupies as much VMEM as (128,128,128))
    assert not fits_vmem((128, 128, 1), np.float32)
    assert not fits_vmem((64, 64, 64), np.float64)


def test_gj_inverse_lanes_interpret():
    """Pallas Gauss-Jordan batch inverse == jnp reference (interpret mode)."""
    import numpy as np
    import jax.numpy as jnp
    from deepflame_tpu.ops.pallas_kernels import gj_inverse_lanes
    from deepflame_tpu.chemistry.integrator import _gj_inverse_batched

    rng = np.random.default_rng(3)
    L, n = 512, 10
    W = jnp.asarray(rng.normal(size=(L, n, n)), jnp.float32) \
        + 5.0 * jnp.eye(n, dtype=jnp.float32)[None]
    ref = _gj_inverse_batched(W)                       # (n, n, L)
    out = gj_inverse_lanes(jnp.moveaxis(W, 0, -1), block=256, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)
    # genuinely inverts
    inv = np.moveaxis(np.asarray(out), -1, 0)
    eye = np.einsum("lij,ljk->lik", np.asarray(W), inv)
    np.testing.assert_allclose(eye, np.broadcast_to(np.eye(n), (L, n, n)),
                               atol=5e-3)


def test_stencil_apply_tiled_matches_roll():
    """General 7-point stencil kernel (round 5) == roll-based reference,
    incl. cyclic wrap and batched (vmapped) operands."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from deepflame_tpu.ops.fv import FvMatrix
    from deepflame_tpu.ops.pallas_kernels import stencil_apply_tiled

    rng = np.random.default_rng(5)
    shape = (16, 12, 8)
    x = jnp.asarray(rng.normal(size=shape), jnp.float32)
    D = jnp.asarray(rng.normal(size=shape), jnp.float32)
    lo = tuple(jnp.asarray(rng.normal(size=shape), jnp.float32)
               for _ in range(3))
    hi = tuple(jnp.asarray(rng.normal(size=shape), jnp.float32)
               for _ in range(3))
    ref = FvMatrix.stencil_apply(x, D, lo, hi)
    out = stencil_apply_tiled(x, D, lo, hi, tx=4, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-6,
                               atol=1e-6)

    # batched via vmap (the species-solve path)
    xb = jnp.asarray(rng.normal(size=(3,) + shape), jnp.float32)
    Db = jnp.asarray(rng.normal(size=(3,) + shape), jnp.float32)
    lob = tuple(jnp.asarray(rng.normal(size=(3,) + shape), jnp.float32)
                for _ in range(3))
    hib = tuple(jnp.asarray(rng.normal(size=(3,) + shape), jnp.float32)
                for _ in range(3))
    ref_b = jax.vmap(FvMatrix.stencil_apply)(xb, Db, lob, hib)
    out_b = jax.vmap(lambda x_, d_, l0, l1, l2, h0, h1, h2:
                     stencil_apply_tiled(x_, d_, (l0, l1, l2),
                                         (h0, h1, h2), tx=4,
                                         interpret=True))(
        xb, Db, *lob, *hib)
    np.testing.assert_allclose(np.asarray(out_b), np.asarray(ref_b),
                               rtol=2e-6, atol=1e-6)


def test_mlp_fused_lanes_matches_xla():
    """Fused MLP kernel (interpret) == the XLA stacked-einsum reference,
    including the in-kernel Abramowitz-Stegun erf-GELU (|err| <= 1.5e-7)
    and the drm19-shaped species count (S = 20 > one sublane tile — the
    layout that surfaced the Mosaic tiling-rule failures, round 5)."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from deepflame_tpu.ops.pallas_kernels import mlp_fused_lanes

    rng = np.random.default_rng(9)
    S, F, B = 20, 23, 1024
    sizes = (F, 64, 32, 16, 1)
    Ws = [jnp.asarray(rng.normal(scale=0.3, size=(S, a, b)), jnp.float32)
          for a, b in zip(sizes[:-1], sizes[1:])]
    bs = [jnp.asarray(rng.normal(scale=0.1, size=(S, b)), jnp.float32)
          for b in sizes[1:]]
    x = jnp.asarray(rng.normal(size=(B, F)), jnp.float32)

    def ref():
        h = jnp.einsum("bi,sio->sbo", x, Ws[0]) + bs[0][:, None, :]
        for l in range(1, 4):
            h = jax.nn.gelu(h, approximate=False)
            h = jnp.einsum("sbi,sio->sbo", h, Ws[l]) + bs[l][:, None, :]
        return h[..., 0].T                                   # (B, S)

    out = mlp_fused_lanes(x, Ws, bs, compute_dtype=jnp.float32, block=512,
                          interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref()),
                               rtol=2e-5, atol=2e-5)
