"""Pressure-solve Krylov iteration counts on the face-list backend:
Jacobi-CG vs aggregation-AMG-CG (ops/amg_fl.py), on the reference's own
Sandia D wedge mesh and on a 20:1 graded box. The AmgX-role measurement
demanded by VERDICT r2 #4 (reference: src/dfMatrix/amgxSolver.H:58-82,
amgxpOptions AGGREGATION V-cycle)."""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

# the axon sitecustomize pins jax_platforms to the TPU backend; this probe
# must not contend with production runs on the one real chip — force CPU
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp
import numpy as np

from deepflame_tpu.mesh import fixed_value, zero_gradient
from deepflame_tpu.mesh.blockmesh import read_blockmesh
from deepflame_tpu.mesh.facelist import graded_box
from deepflame_tpu.ops.amg_fl import make_amg_fl
from deepflame_tpu.ops.fv_facelist import (fvm_laplacian_fl,
                                           fvm_source_implicit_fl)
from deepflame_tpu.ops.linsolve import cg

WEDGE = ("/root/reference/examples/dfLowMachFoam/fgm/twoD_SandiaD_flareFGM/"
         "system/blockMeshDict")


def geometric_edges(L, n, ratio):
    r = ratio ** (1.0 / (n - 1))
    w = np.cumprod(np.full(n, r)) / r
    return np.concatenate([[0.0], np.cumsum(w / w.sum() * L)])


def probe(name, m, tol):
    rho, dt, p0 = 1.0, 1e-5, 1e5
    eqn = (fvm_source_implicit_fl(m, jnp.full((m.n_cells,), rho / p0 / dt))
           + fvm_laplacian_fl(m, jnp.full((m.n_faces,), rho * dt),
                              [rho * dt] * len(m.patches), sign=-1.0))
    rng = np.random.default_rng(0)
    b = jnp.asarray(rng.standard_normal(m.n_cells))
    Vn = m.volumes / jnp.mean(m.volumes)
    A = lambda x: eqn.apply(x) * Vn
    bv = b * Vn
    x0 = jnp.zeros_like(b)
    d = eqn.diag() * Vn
    d_inv = 1.0 / jnp.where(jnp.abs(d) > 1e-300, d, 1.0)

    t0 = time.perf_counter()
    amg = make_amg_fl(m)
    t_setup = time.perf_counter() - t0
    sizes = [lv.n_coarse for lv in amg.levels]

    for label, M in (("jacobi", lambda r: d_inv * r),
                     ("amg", amg.preconditioner(eqn, m.volumes))):
        f = jax.jit(lambda bb: cg(A, bb, x0, M, tol=tol, max_iter=20000))
        r = f(bv)
        jax.block_until_ready(r.x)
        t0 = time.perf_counter()
        r = f(bv)
        jax.block_until_ready(r.x)
        wall = time.perf_counter() - t0
        print(f"{name:28s} {label:7s} iters={int(r.iterations):5d} "
              f"res={float(r.final_residual):.2e} wall={wall*1e3:8.1f} ms")
    print(f"{name:28s} amg-setup(host)={t_setup*1e3:.0f} ms "
          f"levels={len(sizes)} sizes={sizes[:6]}{'...' if len(sizes)>6 else ''}")


def main():
    gm = read_blockmesh(WEDGE)
    zg = zero_gradient()
    bcs = {n: zg for n in gm.patch_names}
    bcs["outlet"] = fixed_value(0.0)
    probe(f"sandia-wedge ({gm.n_cells}c)", gm.with_bcs(bcs, jnp.float64),
          tol=1e-8)

    ex = geometric_edges(1.0, 48, 20.0)
    ey = geometric_edges(0.5, 48, 0.05)
    ez = np.linspace(0.0, 0.1, 9)
    m = graded_box(ex, ey, ez,
                   ((zg, fixed_value(0.0)), (zg, zg), (zg, zg)))
    probe(f"graded-box 48x48x8 ({m.n_cells}c)", m, tol=1e-8)


if __name__ == "__main__":
    main()
