"""Single-droplet drag validation (dfHighSpeedFoam oneD_singleDropletMotion
parity).

Role parity: /root/reference/examples/dfHighSpeedFoam/oneD_singleDropletMotion
{d_25, d_100, d_1000} — the classic droplet-relaxation benchmark: one
water-density droplet (1000 kg/m^3) injected at 30.48 m/s (100 ft/s) into a
67.056 m/s (220 ft/s) air stream, sphereDrag model, diameters 25/100/1000 um.
The validation target is the velocity-relaxation history u_p(t) against a
reference integration of the same drag law

    du_p/dt = (3/4) (rho_g / (rho_l d)) C_D |u_g - u_p| (u_g - u_p),
    C_D = 24/Re (1 + Re^(2/3)/6)  for Re < 1000, else 0.424  (sphereDrag)

done here with scipy's adaptive RK45 at tight tolerance. The framework side
runs the SAME SprayCloud drag physics used by the spray solvers (frozen
uniform gas field, no evaporation/breakup).

Usage: python examples/single_droplet_motion.py [--platform cpu]
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

U_GAS = 67.056     # 220 ft/s
U_DROP = 30.48     # 100 ft/s
RHO_L = 1000.0
T_GAS = 293.0
P_GAS = 101325.0
RHO_G = P_GAS / (287.0 * T_GAS)
MU_G = 1.8e-5


def reference_history(d0, t_end, n=400):
    from scipy.integrate import solve_ivp

    def rhs(t, y):
        up = y[0]
        rel = U_GAS - up
        Re = RHO_G * abs(rel) * d0 / MU_G
        Cd = np.where(Re < 1000.0,
                      24.0 / max(Re, 1e-12) * (1.0 + Re ** (2.0 / 3.0) / 6.0),
                      0.424)
        return [0.75 * RHO_G / (RHO_L * d0) * Cd * abs(rel) * rel]

    ts = np.linspace(0.0, t_end, n)
    sol = solve_ivp(rhs, (0.0, t_end), [U_DROP], t_eval=ts,
                    rtol=1e-10, atol=1e-12)
    return ts, sol.y[0]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--platform", default=None)
    ap.add_argument("--dtype", default="f64")
    args = ap.parse_args()

    from deepflame_tpu.runtime.platform import configure
    configure(args.platform, args.dtype)
    import jax
    import jax.numpy as jnp
    dtype = jnp.float64 if args.dtype == "f64" else jnp.float32

    from deepflame_tpu.lagrangian.cloud import ManualInjector, SprayCloud
    from deepflame_tpu.lagrangian.liquids import water
    from deepflame_tpu.mesh import StructuredMesh

    # long 1D duct so the droplet never exits during the run
    L = 10.0
    mesh = StructuredMesh.box([L, 0.01, 0.01], [100, 1, 1])
    gas = {
        "rho": jnp.full(mesh.shape, RHO_G, dtype),
        "U": jnp.stack([jnp.full(mesh.shape, U_GAS, dtype),
                        jnp.zeros(mesh.shape, dtype),
                        jnp.zeros(mesh.shape, dtype)]),
        "T": jnp.full(mesh.shape, T_GAS, dtype),
        "p": jnp.full(mesh.shape, P_GAS, dtype),
        "mu": jnp.full(mesh.shape, MU_G, dtype),
    }

    print(f"{'d [um]':>8} {'t_end [ms]':>11} {'u_p(t_end)':>11} "
          f"{'reference':>10} {'rel err':>9}")
    worst = 0.0
    for d_um, t_end in ((25, 2e-3), (100, 2e-2), (1000, 0.1)):
        d0 = d_um * 1e-6
        inj = ManualInjector(positions=np.array([[0.05, 0.005, 0.005]]),
                             soi=0.0, d0=d0, n_particle=1.0,
                             T_inject=T_GAS, rho_liquid=RHO_L,
                             U0=(U_DROP, 0.0, 0.0))
        cloud = SprayCloud(mesh=mesh, liquid=water(), injector=inj,
                           max_parcels=1, evaporation="none",
                           drag="sphereDrag", breakup="none",
                           wall_interaction=())
        import jax as _jax
        c = cloud.init(_jax.random.PRNGKey(0), dtype)
        # resolve the smallest relaxation time with >= 20 substeps
        tau = RHO_L * d0 ** 2 / (18.0 * MU_G)
        dt = min(tau / 20.0, t_end / 200.0)
        n_steps = int(round(t_end / dt))

        def body(carry, _):
            c, t = carry
            c2, _src = cloud.evolve(c, gas, dt, t)
            return (c2, t + dt), c2.vel[0, 0]

        (c, _), u_hist = jax.lax.scan(body, (c, jnp.asarray(0.0, dtype)),
                                      None, length=n_steps)
        u_fin = float(u_hist[-1])
        _, u_ref = reference_history(d0, t_end)
        err = abs(u_fin - u_ref[-1]) / abs(u_ref[-1])
        worst = max(worst, err)
        print(f"{d_um:8d} {t_end*1e3:11.2f} {u_fin:11.4f} "
              f"{u_ref[-1]:10.4f} {err:9.2e}")
    print(f"worst relative error vs reference drag integration: {worst:.2e}")
    assert worst < 0.02, "drag history deviates >2% from the reference law"
    print("PASS: sphereDrag relaxation matches the reference integration")


if __name__ == "__main__":
    main()
