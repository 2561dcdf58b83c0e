"""Lagrangian spray cloud: fixed-capacity SoA parcels under jit.

Role parity: /root/reference/src/lagrangian/{intermediate,spray} — the
KinematicCloud->ThermoCloud->ReactingCloud->SprayCloud template stack with
injection, drag, evaporation (LiquidEvaporation/Boil/Spalding), Ranz-Marshall
heat transfer, and the Euler coupling sources Srho/SU/Sh/SYi consumed by the
solvers (dfSprayFoam/createClouds.H:2-9; rhoEqn.H:38, UEqn.H:9, EEqn.H:5-12,
YEqn.H:109-111).

TPU-first design:
  - Parcels are fixed-capacity structure-of-arrays with an `active` mask —
    no dynamic allocation under jit (SURVEY.md §7 stage 9). Dead/escaped
    parcels are masked; injection reuses a static number of slots per step
    with per-parcel multiplicity (nParticle) scaled to match the mass rate,
    so shapes never change.
  - Cell location on the structured mesh is a floor-divide (no cell hash);
    gas->parcel sampling is nearest-cell gather; parcel->gas sources are
    scatter-adds (jnp .at[].add) — both single XLA ops over all parcels.
  - Drag and heat transfer use the analytically-implicit update (stable for
    tau_p << dt); evaporation follows the Spalding-number formulation
    (dm/dt = pi d Sh rho_g D ln(1+B_M), the reference's new
    LiquidEvaporationSpalding model, README.md:30) with the classic
    D^2-law/boiling limits as special cases.
"""
from __future__ import annotations

import dataclasses
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp

from ..mesh.structured import StructuredMesh
from .liquids import Liquid

__all__ = ["CloudState", "ConeInjector", "ManualInjector",
           "PatchFuncInjector", "SprayCloud", "CloudSources"]


class CloudState(NamedTuple):
    pos: jax.Array        # (3, N)
    vel: jax.Array        # (3, N)
    d: jax.Array          # (N,) droplet diameter [m]
    T: jax.Array          # (N,) droplet temperature
    n_part: jax.Array     # (N,) droplets per parcel
    active: jax.Array     # (N,) 0/1
    inject_ptr: jax.Array # scalar: next slot to fill
    m_injected: jax.Array # total injected mass
    key: jax.Array        # PRNG key for injection sampling
    m_vol: jax.Array      # (C, N) volatile mass per droplet per component
    films: tuple = ()     # per film wall: WallFilmState


class CloudSources(NamedTuple):
    Srho: jax.Array       # (nx, ny, nz) mass [kg/m^3/s]
    SU: jax.Array         # (3, nx, ny, nz) momentum
    Sh: jax.Array         # (nx, ny, nz) energy [J/m^3/s]
    SY: jax.Array         # (nx, ny, nz) fuel-vapor species mass


@dataclasses.dataclass(frozen=True)
class ManualInjector:
    """manualInjection parity (water-mist detonation cases:
    /root/reference/examples/dfHighSpeedFoam/oneD_detH2WaterMist/constant/
    sprayCloudProperties — positionsFile + fixed nParticle + uniform size,
    one-shot release at SOI).

    positions: (N0, 3) parcel positions; all released in the step containing
    `soi`. The owning SprayCloud must have max_parcels >= N0.
    """
    positions: Any = ()           # (N0, 3) array-like
    soi: float = 0.0
    d0: float = 5e-6
    n_particle: float = 275.0
    T_inject: float = 300.0
    U0: tuple = (0.0, 0.0, 0.0)
    rho_liquid: float = 997.0

    @property
    def parcels_per_step(self) -> int:
        import numpy as _np
        return int(_np.asarray(self.positions).shape[0])

    @property
    def t_start(self) -> float:
        return self.soi

    @property
    def t_end(self) -> float:
        return self.soi          # one-shot

    def sample(self, keys, time, dt, dtype):
        import numpy as _np
        pos_np = _np.asarray(self.positions, dtype=_np.float64)
        K = pos_np.shape[0]
        pos = jnp.asarray(pos_np.T, dtype)
        vel = jnp.broadcast_to(jnp.asarray(self.U0, dtype)[:, None], (3, K))
        dm = jnp.full((K,), self.d0, dtype)
        m_drop = self.rho_liquid * jnp.pi / 6.0 * self.d0 ** 3
        mass_step = K * self.n_particle * m_drop
        # release exactly once: the step whose interval contains SOI
        injecting = jnp.logical_and(time <= self.soi, time + dt > self.soi)
        return pos, vel, dm, mass_step, injecting


@dataclasses.dataclass(frozen=True)
class ConeInjector:
    """Cone-nozzle injection (coneInjection parity, the aachenBomb
    injector: /root/reference/test/aachenBomb_2D/constant/
    sprayCloudProperties `coneInjection` with `flowRateAndDischarge` +
    RosinRammler size distribution + `flowRateProfile` table).

    cone_angle_deg is the FULL cone angle (2x thetaOuter).
    mdot_profile: optional ((t, relative_rate), ...) table — normalized at
    construction so the integral over [t_start, t_end] equals mass_total
    (OpenFOAM flowRateProfile semantics). u_from_flow: injection speed from
    the instantaneous volumetric flow through the discharge orifice,
    U = mdot / (rho_l Cd A), A = pi/4 (d_outer^2 - d_inner^2)
    (InjectionModel flowType flowRateAndDischarge)."""
    position: tuple       # (x, y, z)
    direction: tuple = (0.0, -1.0, 0.0)
    cone_angle_deg: float = 10.0
    u_mag: float = 200.0          # injection velocity magnitude
    mdot: float = 1e-3            # kg/s
    t_start: float = 0.0
    t_end: float = 1.25e-3
    d_mean: float = 8e-5          # mean droplet diameter
    d_spread: float = 0.3         # relative spread
    parcels_per_step: int = 8
    T_inject: float = 320.0
    # flowRateProfile table (relative rates; normalized by mass_total)
    mdot_profile: tuple = ()
    mass_total: float | None = None
    # size distribution: lognormal (d_mean/d_spread) | RosinRammler
    size_dist: str = "lognormal"
    rr_d: float = 1.5e-4
    rr_n: float = 3.0
    rr_min: float = 1e-6
    rr_max: float = 1.5e-4
    # flowRateAndDischarge velocity
    u_from_flow: bool = False
    Cd: float = 0.9
    d_outer: float = 1.2e-4
    d_inner: float = 0.0
    rho_liquid: float = 680.0     # liquid density at T_inject

    def _mdot_now(self, time, dtype):
        """Instantaneous mass flow rate [kg/s]."""
        if not self.mdot_profile:
            return jnp.asarray(self.mdot, dtype)
        import numpy as _np
        tab = _np.asarray(self.mdot_profile, dtype=_np.float64)
        ts, rs = tab[:, 0], tab[:, 1]
        if self.mass_total is not None:
            # normalize: integral of the profile over the table = mass_total
            integral = _np.trapezoid(rs, ts)
            rs = rs * (self.mass_total / integral)
        return jnp.interp(jnp.asarray(time, dtype),
                          jnp.asarray(ts, dtype), jnp.asarray(rs, dtype))

    def sample(self, keys, time, dt, dtype):
        """Per-step parcel samples: (pos (3,K), vel (3,K), d (K,),
        mass_this_step, injecting)."""
        k1, k2, k3 = keys
        K = self.parcels_per_step
        if self.size_dist == "RosinRammler":
            # truncated Rosin-Rammler by renormalized inverse CDF:
            # F(d) = 1 - exp(-(d/d_rr)^n) restricted to [rr_min, rr_max]
            import math
            u = jax.random.uniform(k1, (K,), dtype)
            Fmin = 1.0 - math.exp(-(self.rr_min / self.rr_d) ** self.rr_n)
            Fmax = 1.0 - math.exp(-(self.rr_max / self.rr_d) ** self.rr_n)
            F = Fmin + u * (Fmax - Fmin)
            dm = self.rr_d * (-jnp.log1p(-F)) ** (1.0 / self.rr_n)
            dm = jnp.clip(dm, self.rr_min, self.rr_max)
        else:
            dm = self.d_mean * jnp.exp(self.d_spread
                                       * jax.random.normal(k1, (K,), dtype))
            dm = jnp.clip(dm, 0.2 * self.d_mean, 4.0 * self.d_mean)
        half = jnp.deg2rad(self.cone_angle_deg / 2.0)
        axis = jnp.asarray(self.direction, dtype)
        axis = axis / jnp.linalg.norm(axis)
        phi = jax.random.uniform(k2, (K,), dtype, 0.0, 2.0 * jnp.pi)
        cos_t = 1.0 - jax.random.uniform(k3, (K,), dtype) \
            * (1.0 - jnp.cos(half))
        sin_t = jnp.sqrt(1.0 - cos_t**2)
        ref = jnp.where(jnp.abs(axis[0]) < 0.9,
                        jnp.asarray([1.0, 0.0, 0.0], dtype),
                        jnp.asarray([0.0, 1.0, 0.0], dtype))
        a1 = jnp.cross(axis, ref)
        a1 = a1 / jnp.linalg.norm(a1)
        a2 = jnp.cross(axis, a1)
        dirs = (axis[:, None] * cos_t[None, :]
                + a1[:, None] * (sin_t * jnp.cos(phi))[None, :]
                + a2[:, None] * (sin_t * jnp.sin(phi))[None, :])
        pos = jnp.asarray(self.position, dtype)[:, None] + 0.0 * dirs
        injecting = jnp.logical_and(time >= self.t_start, time < self.t_end)
        mdot_now = self._mdot_now(time, dtype)
        if self.u_from_flow:
            A = jnp.pi / 4.0 * (self.d_outer ** 2 - self.d_inner ** 2)
            u_mag = mdot_now / (self.rho_liquid * self.Cd * A)
        else:
            u_mag = jnp.asarray(self.u_mag, dtype)
        return pos, u_mag * dirs, dm, mdot_now * dt, injecting


@dataclasses.dataclass(frozen=True)
class PatchFuncInjector:
    """Patch-function injection (PatchFuncInjection parity,
    /root/reference/src/lagrangian/intermediate/submodels/Kinematic/
    InjectionModel/PatchFuncInjection — parcels released across a boundary
    patch with a position/time velocity function and a time-dependent flow
    rate profile).

    Positions are sampled uniformly over the rectangle [lo, hi] (the patch
    region, degenerate along the patch-normal axis). `u_fn(x, y, z, t)`
    returns the (3, K) injection velocity at the sampled positions (defaults
    to the constant `u_const`); `mdot_fn(t)` the instantaneous flow rate
    (defaults to constant `mdot`). Both must be jit-traceable."""
    lo: tuple             # rectangle corner (x, y, z)
    hi: tuple             # opposite corner (one axis equal to lo's)
    u_const: tuple = (0.0, -10.0, 0.0)
    u_fn: Any = None      # (x, y, z, t) -> (3, K) velocities
    mdot: float = 1e-3
    mdot_fn: Any = None   # (t,) -> instantaneous kg/s
    t_start: float = 0.0
    t_end: float = 1e-3
    d_mean: float = 8e-5
    d_spread: float = 0.3
    parcels_per_step: int = 8
    T_inject: float = 320.0
    # size distribution: lognormal (d_mean/d_spread) | RosinRammler
    # (truncated; same semantics as ConeInjector)
    size_dist: str = "lognormal"
    rr_d: float = 2e-5
    rr_n: float = 3.0
    rr_min: float = 5e-6
    rr_max: float = 1e-4
    # axisymmetric-wedge patches: the patch is a radial strip whose true
    # (revolved) face area grows linearly with the coordinate along
    # `radial_axis` — sample that coordinate area-weighted (pdf ~ r, i.e.
    # r = sqrt(u) scaling) so parcels/m^2 match the reference's
    # patchInjection uniform-over-face-area placement
    radial_axis: int | None = None

    def sample(self, keys, time, dt, dtype):
        k1, k2, _ = keys
        K = self.parcels_per_step
        if self.size_dist == "RosinRammler":
            import math
            u = jax.random.uniform(k1, (K,), dtype)
            Fmin = 1.0 - math.exp(-(self.rr_min / self.rr_d) ** self.rr_n)
            Fmax = 1.0 - math.exp(-(self.rr_max / self.rr_d) ** self.rr_n)
            F = Fmin + u * (Fmax - Fmin)
            dm = self.rr_d * (-jnp.log1p(-F)) ** (1.0 / self.rr_n)
            dm = jnp.clip(dm, self.rr_min, self.rr_max)
        else:
            dm = self.d_mean * jnp.exp(self.d_spread
                                       * jax.random.normal(k1, (K,), dtype))
            dm = jnp.clip(dm, 0.2 * self.d_mean, 4.0 * self.d_mean)
        lo = jnp.asarray(self.lo, dtype)
        hi = jnp.asarray(self.hi, dtype)
        u01 = jax.random.uniform(k2, (3, K), dtype)
        if self.radial_axis is not None:
            u01 = u01.at[self.radial_axis].set(
                jnp.sqrt(u01[self.radial_axis]))
        pos = lo[:, None] + u01 * (hi - lo)[:, None]
        if self.u_fn is not None:
            vel = jnp.asarray(self.u_fn(pos[0], pos[1], pos[2], time), dtype)
            vel = jnp.broadcast_to(vel.reshape(3, -1), (3, K))
        else:
            vel = jnp.broadcast_to(
                jnp.asarray(self.u_const, dtype)[:, None], (3, K))
        mdot_now = self.mdot_fn(time) if self.mdot_fn is not None \
            else self.mdot
        injecting = jnp.logical_and(time >= self.t_start, time < self.t_end)
        return pos, vel, dm, mdot_now * dt, injecting


@dataclasses.dataclass(frozen=True)
class SprayCloud:
    mesh: StructuredMesh
    liquid: Liquid
    injector: ConeInjector
    max_parcels: int = 8192
    evaporation: str = "Spalding"   # Spalding | D2law | none
    drag: str = "SchillerNaumann"   # SchillerNaumann | sphereDrag
    gravity: tuple = (0.0, 0.0, 0.0)  # particleForces gravity (+ buoyancy)
    breakup: str = "none"           # ReitzDiwakar | KHRT | none
    collision: str = "none"         # ORourke | none
    dispersion: bool = False        # stochastic (DRW) turbulent dispersion
    # per-boundary parcel-wall interaction: dict {(axis, side): mode} with
    # mode in {"escape", "rebound", "stick", "film"}; boundaries not listed
    # escape. "film" absorbs impinging parcels into a WallFilm (the
    # reference's surfaceFilmModels attachment, regionModels overlay)
    wall_interaction: tuple = ()    # ((axis, side, mode), ...)
    # wall films: WallFilm instances, one per (axis, side) that uses "film"
    films: tuple = ()
    # devolatilisation (SingleKineticRateDevolatilisation parity,
    # /root/reference/src/lagrangian/intermediate/submodels/
    # ReactingMultiphase/DevolatilisationModel): per volatile component
    # (A1 [1/s], E [J/kmol], Y0 mass fraction at injection); released mass
    # dm = min(dt * A1 exp(-E/(R T)) * m_vol, m_vol) joins the gas phase
    devolatilisation: tuple = ()    # ((A1, E, Y0), ...)
    restitution: float = 0.7
    # parcel update ordering. The reference's v1.4 "reordered mass/
    # velocity/temperature update" (README.md:31; ReactingParcel.H:378
    # calcPhaseChange before motion): mass_first computes phase change
    # first and integrates drag/momentum exchange with the REDUCED parcel
    # mass/diameter. False keeps the original velocity-first order.
    mass_first: bool = False
    Sc_gas: float = 0.7
    Pr_gas: float = 0.7
    # film-temperature blend weight on the DROPLET temperature: the
    # standard 1/3-2/3 rule is 2/3 (T_film = (2 Tp + Tg)/3). Exposed for
    # the aachenBomb station-2 sensitivity falsification (VERDICT r4
    # item 4c: evaporative-cooling placement)
    film_w: float = 2.0 / 3.0
    # ReitzDiwakar coefficients (the aachenBomb submodel defaults)
    Cbag: float = 6.0
    Cb: float = 0.785
    Cstrip: float = 0.5
    Cs: float = 10.0
    # ReitzKHRT coefficients (OpenFOAM-7 sprayFoam defaults)
    b0: float = 0.61                # KH child-size constant
    b1: float = 40.0                # KH timescale constant
    cTau: float = 1.0               # RT breakup-time constant
    cRT: float = 0.1                # RT wavelength constant
    weber_limit: float = 6.0        # no KH breakup below this We_g
    d_min: float = 1e-6             # smallest stable/child diameter [m]

    def init(self, key, dtype=jnp.float64) -> CloudState:
        N = self.max_parcels
        z = jnp.zeros((N,), dtype)
        return CloudState(pos=jnp.zeros((3, N), dtype),
                          vel=jnp.zeros((3, N), dtype),
                          d=z + 1e-6, T=z + 300.0, n_part=z, active=z,
                          inject_ptr=jnp.asarray(0, jnp.int32),
                          m_injected=jnp.zeros((), dtype),
                          key=key,
                          m_vol=jnp.zeros((len(self.devolatilisation), N),
                                          dtype),
                          films=tuple(fl.init(self.mesh, dtype)
                                      for fl in self.films))

    # ------------------------------------------------------------ helpers
    def _cell_index(self, pos):
        m = self.mesh
        i = jnp.clip(((pos[0] - m.x0) / m.dx).astype(jnp.int32), 0, m.nx - 1)
        j = jnp.clip(((pos[1] - m.y0) / m.dy).astype(jnp.int32), 0, m.ny - 1)
        k = jnp.clip(((pos[2] - m.z0) / m.dz).astype(jnp.int32), 0, m.nz - 1)
        return i, j, k

    def _in_domain(self, pos):
        m = self.mesh
        return ((pos[0] >= m.x0) & (pos[0] <= m.x0 + m.nx * m.dx)
                & (pos[1] >= m.y0) & (pos[1] <= m.y0 + m.ny * m.dy)
                & (pos[2] >= m.z0) & (pos[2] <= m.z0 + m.nz * m.dz))

    # ------------------------------------------------------------- evolve

    def _phase_change(self, liq, gas, g, d, Tp, Re, rho_g, T_g, mu_g,
                      p_g, Yv_g, dt):
        """LiquidEvaporationBoil-parity phase change for one substep.
        Returns (dm_dt, dm, m_new, m_d, (T_film, Sh, Nu, cp_c, kappa_c))."""
        rho_l = liq.rho(Tp)
        m_d = rho_l * jnp.pi / 6.0 * d**3          # droplet mass
        # physical vapor diffusivity at film conditions (2/3 rule) — the
        # 1/p dependence is essential in pressurized chambers; the old
        # mu/(rho Sc) estimate is ~p/1atm too fast there
        T_film = self.film_w * Tp + (1.0 - self.film_w) * T_g
        D_v = liq.D_vap(T_film, p_g)
        Sc_f = mu_g / jnp.maximum(rho_g * D_v, 1e-20)
        Sh = 2.0 + 0.6 * jnp.sqrt(jnp.maximum(Re, 0.0)) * Sc_f**(1/3)
        Nu = 2.0 + 0.6 * jnp.sqrt(jnp.maximum(Re, 0.0)) * self.Pr_gas**(1/3)
        # carrier cp/kappa at parcels: use solver-provided fields when
        # available, else the air-like estimate (OpenFOAM interpolates the
        # carrier's actual Cp/kappa to the parcel, LiquidEvaporationBoil.C:
        # 180-197; the hardcoded 1005 underestimates kappa ~30% in the flame)
        cp_c = g(gas["cp"]) if "cp" in gas else jnp.full_like(rho_g, 1005.0)
        kappa_c = g(gas["kappa"]) if "kappa" in gas \
            else mu_g * 1005.0 / self.Pr_gas
        if self.evaporation == "none":
            dm_dt = jnp.zeros_like(d)
        else:
            # LiquidEvaporationBoil parity (LiquidEvaporationBoil.C:221-300)
            T_boil_pc = liq.T_boil_at(p_g)
            Td = jnp.minimum(Tp, 0.999 * T_boil_pc)
            p_sat = liq.p_sat(Td)
            # --- evaporation branch: MOLAR Spalding ratio with film density
            # dm/dt = pi d Sh Dab rho_s ln(1 + Xr), Xr = (Xs - Xc)/(1 - Xs)
            x_s = jnp.clip(p_sat / jnp.maximum(p_g, 1.0), 0.0, 0.999)
            W_g = 28.9
            # carrier molar fraction of the vapor species
            W_mix = 1.0 / (Yv_g / liq.W + (1.0 - Yv_g) / W_g)
            X_c = Yv_g * W_mix / liq.W
            Xr = jnp.clip((x_s - X_c) / jnp.maximum(1.0 - x_s, 1e-6),
                          0.0, 50.0)
            # film density at surface conditions (same p, ideal gas)
            rho_s = rho_g * T_g / jnp.maximum(T_film, 200.0)
            dm_dt_evap = jnp.pi * d * Sh * rho_s * D_v * jnp.log1p(Xr)
            if self.evaporation != "Spalding":   # classic D2-law option
                dm_dt_evap = jnp.pi * d * Sh * rho_s * D_v * Xr
            # --- boiling branch (pSat > 0.999 pc): iterated Spalding-log
            # heat-limited rate + empirical nucleate flash-boil
            # (LiquidEvaporationBoil.C:252-285; note Sh used in place of Nu)
            hv = liq.latent_heat(Td)
            dT_sup = jnp.maximum(Tp - T_boil_pc, 0.5)   # droplet superheat
            alphaS = jnp.where(
                dT_sup < 5.0, 760.0 * dT_sup**0.26,
                jnp.where(dT_sup < 25.0, 27.0 * dT_sup**2.33,
                          13800.0 * dT_sup**0.39))
            Gf = alphaS * dT_sup * jnp.pi * d**2 / hv
            cp_s = liq.cp_vap(T_film)
            A_sp = jnp.maximum(cp_c * (T_g - T_film), 0.0) / hv
            B_sp = jnp.pi * (kappa_c / jnp.maximum(cp_s, 1.0)) * d * Sh

            def _boil_iter(_, Gr):
                G = B_sp / (1.0 + Gr) * jnp.log1p(A_sp * (1.0 + Gr))
                return Gf / jnp.maximum(G, 1e-30)

            Gr = jax.lax.fori_loop(0, 50, _boil_iter,
                                   jnp.full_like(d, 1e-5))
            G_heat = jnp.where(
                A_sp > 0.0,
                B_sp / (1.0 + Gr) * jnp.log1p(A_sp * (1.0 + Gr)), 0.0)
            dm_dt_boil = G_heat + Gf
            boiling = p_sat > 0.999 * jnp.maximum(p_g, 1.0)
            saturated = X_c * jnp.maximum(p_g, 1.0) > p_sat
            dm_dt = jnp.where(boiling, dm_dt_boil,
                              jnp.where(saturated, 0.0, dm_dt_evap))
        dm = jnp.clip(dm_dt * dt, 0.0, 0.95 * m_d)
        m_new = m_d - dm
        return dm_dt, dm, m_new, m_d, (T_film, Sh, Nu, cp_c, kappa_c)

    def evolve(self, c: CloudState, gas: dict, dt,
               time) -> tuple[CloudState, CloudSources]:
        """One Lagrangian substep (parcels.evolve() parity).

        gas: dict of cell fields rho, U (3,...), T, mu, p, (optionally Yv
        fuel vapor mass fraction for the Spalding driving force).
        """
        inj = self.injector
        liq = self.liquid
        dtype = c.d.dtype
        N = self.max_parcels

        # ==== injection: K static slots per step, multiplicity matches mdot
        key, k1, k2, k3 = jax.random.split(c.key, 4)
        K = inj.parcels_per_step
        slots = (c.inject_ptr + jnp.arange(K, dtype=jnp.int32)) % N
        pos_inj, vel_inj, dm, mass_step, injecting = inj.sample(
            (k1, k2, k3), time, dt, dtype)
        m_drop = liq.rho(inj.T_inject) * jnp.pi / 6.0 * dm**3
        n_per = jnp.where(injecting, mass_step / K / m_drop, 0.0)

        def set_slots(arr, vals):
            return arr.at[..., slots].set(jnp.where(injecting, vals,
                                                    arr[..., slots]))

        pos = set_slots(c.pos, pos_inj)
        vel = set_slots(c.vel, vel_inj)
        d = set_slots(c.d, dm)
        Tp = set_slots(c.T, jnp.full((K,), inj.T_inject, dtype))
        n_part = set_slots(c.n_part, n_per)
        if self.devolatilisation:
            Y0 = jnp.asarray([y0 for (_, _, y0) in self.devolatilisation],
                             dtype)
            m_vol = set_slots(c.m_vol, Y0[:, None] * m_drop[None, :])
        else:
            m_vol = c.m_vol
        active = set_slots(c.active, jnp.where(injecting,
                                               jnp.ones((K,), dtype), 0.0))
        ptr = jnp.where(injecting, (c.inject_ptr + K) % N, c.inject_ptr)
        m_injected = c.m_injected + jnp.where(injecting, mass_step, 0.0)

        # ==== gas state at parcels (nearest cell)
        ii, jj, kk = self._cell_index(pos)
        g = lambda f: f[ii, jj, kk]
        rho_g = g(gas["rho"])
        T_g = g(gas["T"])
        mu_g = g(gas["mu"])
        p_g = g(gas["p"])
        u_g = jnp.stack([g(gas["U"][a]) for a in range(3)])
        Yv_g = g(gas["Yv"]) if "Yv" in gas else jnp.zeros_like(rho_g)

        # ==== kinematic prelude (shared by drag and evaporation)
        rho_l = liq.rho(Tp)
        rel = u_g - vel
        rel_mag = jnp.sqrt(jnp.sum(rel**2, axis=0) + 1e-30)
        Re = rho_g * rel_mag * d / jnp.maximum(mu_g, 1e-12)

        if self.mass_first:
            # v1.4 parity: phase change first; drag sees the reduced mass
            dm_dt, dm, m_new, m_d, evap_aux = self._phase_change(
                liq, gas, g, d, Tp, Re, rho_g, T_g, mu_g, p_g, Yv_g, dt)
            d_drag = (6.0 * m_new / (jnp.pi * rho_l)) ** (1.0 / 3.0)
        else:
            d_drag = d

        # ==== drag (Schiller-Naumann, analytically implicit)
        if self.drag == "sphereDrag":
            # OpenFOAM SphereDragForce (lagrangian/intermediate submodel):
            # Cd Re/24 = 1 + Re^(2/3)/6 for Re < 1000, else 0.424 Re/24 —
            # the singleDropletMotion validation cases use this law
            Cd_Re24 = jnp.where(Re < 1000.0,
                                1.0 + Re ** (2.0 / 3.0) / 6.0,
                                0.424 * Re / 24.0)
        else:                                     # Schiller-Naumann
            Cd_Re24 = 1.0 + 0.15 * Re**0.687      # = Cd*Re/24
        tau_p = rho_l * d_drag**2 \
            / (18.0 * jnp.maximum(mu_g, 1e-12) * Cd_Re24)
        f_rel = dt / jnp.maximum(tau_p, 1e-12)
        # gravity + buoyancy (particleForces gravity, GravityForce.C:
        # g*(1 - rho_g/rho_l)): exact solution of
        # dv/dt = (u_g - v)/tau_p + g_eff relaxes toward u_g + tau_p*g_eff
        g_vec = jnp.asarray(self.gravity, vel.dtype)
        if any(self.gravity):
            g_eff = g_vec[:, None] * (1.0 - rho_g / rho_l)[None, :]
        else:
            g_eff = jnp.zeros((3, 1), vel.dtype)
        rel_eq = rel + tau_p[None, :] * g_eff
        vel_new = vel + rel_eq * (1.0 - jnp.exp(-f_rel))
        # momentum exchanged with the GAS is the drag impulse only —
        # gravity acts on the parcel from outside the two-phase system
        dmom = (vel_new - vel) - g_eff * dt

        # ==== evaporation (skipped here in mass_first order — already done)
        if not self.mass_first:
            dm_dt, dm, m_new, m_d, evap_aux = self._phase_change(
                liq, gas, g, d, Tp, Re, rho_g, T_g, mu_g, p_g, Yv_g, dt)
        T_film, Sh, Nu, cp_c, kappa_c = evap_aux

        # ==== devolatilisation (SingleKineticRateDevolatilisation parity:
        # dMassDV = min(dt * A1 exp(-E/(R T)) * massVolatile, massVolatile),
        # R in J/kmol/K as in the reference)
        if self.devolatilisation:
            R_kmol = 8314.462618
            A1 = jnp.asarray([a for (a, _, _) in self.devolatilisation],
                             dtype)
            E = jnp.asarray([e for (_, e, _) in self.devolatilisation], dtype)
            kappa_dv = A1[:, None] * jnp.exp(-E[:, None]
                                             / (R_kmol * Tp[None, :]))
            dm_dv = jnp.minimum(dt * kappa_dv * m_vol, m_vol) \
                * (active > 0)[None, :]
            dm_dv_tot = jnp.minimum(jnp.sum(dm_dv, axis=0), 0.95 * m_new)
            m_vol = m_vol - dm_dv * jnp.where(
                jnp.sum(dm_dv, axis=0) > 0.0,
                dm_dv_tot / jnp.maximum(jnp.sum(dm_dv, axis=0), 1e-300),
                0.0)[None, :]
            m_new = m_new - dm_dv_tot
        else:
            dm_dv_tot = jnp.zeros_like(m_new)

        # ==== heat transfer (Ranz-Marshall, implicit relaxation) + latent sink
        h_conv = Nu * kappa_c / jnp.maximum(d, 1e-9)
        area = jnp.pi * d**2
        if self.evaporation != "none":
            # Bird correction (RanzMarshall BirdCorrection true in the
            # aachenBomb case dict, sprayCloudProperties:175-178): the
            # Stefan flow of evaporating vapor insulates the droplet —
            # htc *= phi/(e^phi - 1), phi = NCpW/htc with NCpW the
            # evaporative flux heat capacity (HeatTransferModel::htc).
            # Without it droplets near the flame heat and boil far too
            # fast (the evaporative-cooled rich core dies early).
            NCpW = (dm_dt / jnp.maximum(area, 1e-20)) * liq.cp_vap(T_film)
            phi_bird = jnp.clip(NCpW / jnp.maximum(h_conv, 1e-20), 0.0, 50.0)
            h_conv = jnp.where(
                phi_bird > 1e-3,
                h_conv * phi_bird / jnp.expm1(jnp.maximum(phi_bird, 1e-6)),
                h_conv)
        cp_l = liq.cp(Tp)
        tau_T = m_d * cp_l / jnp.maximum(h_conv * area, 1e-20)
        L = liq.latent_heat(Tp)
        T_new = T_g + (Tp - T_g) * jnp.exp(-dt / jnp.maximum(tau_T, 1e-12))
        T_new = T_new - dm * L / jnp.maximum(m_d * cp_l, 1e-20)
        # liquid cannot exceed its local-pressure boiling point (OpenFOAM
        # SprayParcel limits Td to Tbp during phase change)
        T_cap = liq.T_boil_at(p_g) if self.evaporation != "none" \
            else liq.T_crit - 1.0
        T_new = jnp.clip(T_new, 250.0, T_cap)
        # diameter from conserved parcel mass at the NEW temperature's liquid
        # density (thermal expansion; keeps mass accounting exact)
        d_new = (6.0 * m_new / (jnp.pi * liq.rho(T_new))) ** (1.0 / 3.0)

        # ==== breakup (ReitzDiwakar parity: bag + stripping regimes reduce
        # the parcel diameter toward the stable diameter over the regime
        # timescale; droplet count per parcel rises to conserve mass)
        if self.breakup == "ReitzDiwakar":
            # OpenFOAM-7 ReitzDiwakar::update formulation exactly (note the
            # 1/2 in the Weber number — Cbag=6 is calibrated to THAT
            # convention; a full-We criterion shatters droplets to half the
            # stable size and destroys spray penetration):
            #   We = rhoc |u| d / (2 sigma);  Re = |u| d / nuc
            #   We > Cbag:
            #     We > Cstrip sqrt(Re): dStrip = (2 Cstrip sigma)^2
            #                                    / (rhoc |u|^3 muc)
            #                           tau = Cs d sqrt(rhol/rhoc) / |u|
            #     else (bag):           dBag = 2 Cbag sigma / (rhoc |u|^2)
            #                           tau = Cb d sqrt(rhol d / sigma)
            #   d -> dStable + (d - dStable) exp(-dt/tau)
            sigma = jnp.maximum(liq.sigma, 1e-10)
            rho_l_b = liq.rho(T_new)
            urel = jnp.maximum(rel_mag, 1e-10)
            We = 0.5 * rho_g * urel**2 * d_new / sigma
            Re_b = jnp.maximum(Re, 1e-10)
            strip = We > self.Cstrip * jnp.sqrt(Re_b)
            d_strip = (2.0 * self.Cstrip * sigma) ** 2 \
                / (rho_g * urel**3 * jnp.maximum(mu_g, 1e-12))
            tau_strip = self.Cs * d_new \
                * jnp.sqrt(rho_l_b / jnp.maximum(rho_g, 1e-10)) / urel
            d_bag = 2.0 * self.Cbag * sigma / (rho_g * urel**2)
            tau_bag = self.Cb * d_new * jnp.sqrt(
                rho_l_b * d_new / sigma)
            d_stable = jnp.maximum(jnp.where(strip, d_strip, d_bag),
                                   self.d_min)
            tau = jnp.where(strip, tau_strip, tau_bag)
            breaking = We > self.Cbag
            # OpenFOAM-7 ReitzDiwakar::update relaxation is the IMPLICIT
            # form d = (f dStable + d)/(1 + f) with f = dt/tau — NOT
            # exp(-dt/tau): at f ~ 1 the exponential form removes 63% of
            # (d - dStable) per step vs 50%, over-fragmenting the spray and
            # shortening liquid penetration (the term the aachenBomb
            # station-2 falsification chain pinned; round 5)
            f_rel = jnp.where(breaking, dt / jnp.maximum(tau, 1e-12), 0.0)
            d_broken = (f_rel * d_stable + d_new) / (1.0 + f_rel)
            d_broken = jnp.maximum(d_broken, jnp.minimum(d_stable, d_new))
            # conserve parcel liquid mass: n d^3 = const
            n_part = n_part * (d_new / jnp.maximum(d_broken, 1e-9)) ** 3
            d_new = d_broken
        elif self.breakup == "KHRT":
            # Kelvin-Helmholtz / Rayleigh-Taylor hybrid (ReitzKHRT parity;
            # registered in makeSprayParcelBreakupModels.H:34). Wave
            # growth-rate/wavelength correlations are the standard Reitz
            # (1987) fits. TPU adaptation: both mechanisms act as
            # diameter relaxation toward their child size over their own
            # timescale (the RT induction timer becomes the relaxation
            # time cTau/omega_RT), mass conserved by raising n_part —
            # same continuous treatment as the ReitzDiwakar branch above.
            sigma = jnp.maximum(liq.sigma, 1e-10)
            rho_l_b = liq.rho(T_new)
            mu_l = liq.mu(T_new)
            r = jnp.maximum(0.5 * d_new, 1e-9)
            urel = jnp.maximum(rel_mag, 1e-10)
            we_g = rho_g * urel**2 * r / sigma
            we_l = rho_l_b * urel**2 * r / sigma
            re_l = rho_l_b * urel * r / jnp.maximum(mu_l, 1e-10)
            oh = jnp.sqrt(we_l) / re_l
            ta = oh * jnp.sqrt(we_g)
            # KH wavelength and growth rate
            lam_kh = 9.02 * r * (1.0 + 0.45 * jnp.sqrt(oh)) \
                * (1.0 + 0.4 * ta**0.7) \
                / (1.0 + 0.865 * we_g**1.67) ** 0.6
            omega_kh = (0.34 + 0.38 * we_g**1.5) \
                / ((1.0 + oh) * (1.0 + 1.4 * ta**0.6)) \
                * jnp.sqrt(sigma / (rho_l_b * r**3))
            d_kh = jnp.maximum(2.0 * self.b0 * lam_kh, self.d_min)
            tau_kh = 3.726 * self.b1 * r / jnp.maximum(
                omega_kh * lam_kh, 1e-20)
            kh_on = (we_g > self.weber_limit) & (d_kh < d_new)
            # RT: deceleration along the trajectory (drag)
            g_t = 0.375 * (24.0 / jnp.maximum(Re, 1e-6)) * Cd_Re24 \
                * rho_g * urel**2 / (rho_l_b * r)
            drho = jnp.maximum(rho_l_b - rho_g, 1e-3)
            k_rt = jnp.sqrt(g_t * drho / (3.0 * sigma))
            omega_rt = jnp.sqrt(
                (2.0 / (3.0 * jnp.sqrt(3.0 * sigma)))
                * (g_t * drho) ** 1.5 / (rho_l_b + rho_g))
            lam_rt = 2.0 * jnp.pi * self.cRT / jnp.maximum(k_rt, 1e-6)
            d_rt = jnp.maximum(lam_rt, self.d_min)
            tau_rt = self.cTau / jnp.maximum(omega_rt, 1e-20)
            rt_on = d_rt < d_new
            # the faster active mechanism wins (RT dominates near-nozzle
            # high-deceleration drops; KH the downstream stripping)
            use_rt = rt_on & (~kh_on | (tau_rt < tau_kh))
            d_child = jnp.where(use_rt, d_rt, d_kh)
            tau = jnp.where(use_rt, tau_rt, tau_kh)
            breaking = kh_on | rt_on
            frac = jnp.where(breaking,
                             1.0 - jnp.exp(-dt / jnp.maximum(tau, 1e-12)),
                             0.0)
            d_broken = jnp.maximum(d_new - frac * (d_new - d_child),
                                   jnp.minimum(d_child, d_new))
            n_part = n_part * (d_new / jnp.maximum(d_broken, 1e-9)) ** 3
            d_new = d_broken

        # ==== collision / coalescence (O'Rourke parity, the reference's
        # intermediate/submodels/Kinematic/CollisionModel family). TPU
        # adaptation: instead of per-cell pairwise O(N^2) sampling, each
        # parcel collides with the CELL-MEAN droplet population (number
        # density, Sauter diameter, mean velocity gathered by scatter-add).
        # Collision frequency nu = n_cell pi/4 (d_i + d_cell)^2 |v_rel|;
        # coalescence probability follows the O'Rourke critical Weber
        # criterion; coalescing parcels grow toward the pair-volume
        # diameter and momentum-average their velocity, conserving mass
        # and momentum.
        if self.collision == "ORourke":
            shape_c = self.mesh.shape
            Vc = self.mesh.volume
            w_act = n_part * (active > 0)
            num = jnp.zeros(shape_c, dtype).at[ii, jj, kk].add(w_act)
            d2s = jnp.zeros(shape_c, dtype).at[ii, jj, kk].add(w_act * d**2)
            d3s = jnp.zeros(shape_c, dtype).at[ii, jj, kk].add(w_act * d**3)
            mom_c = [jnp.zeros(shape_c, dtype).at[ii, jj, kk].add(
                w_act * vel_new[a]) for a in range(3)]
            n_cell = num[ii, jj, kk]
            d32_c = d3s[ii, jj, kk] / jnp.maximum(d2s[ii, jj, kk], 1e-30)
            u_cell = jnp.stack([mom_c[a][ii, jj, kk] for a in range(3)]) \
                / jnp.maximum(n_cell, 1e-30)
            n_dens = jnp.maximum(n_cell - n_part, 0.0) / Vc  # exclude self
            v_rel_c = jnp.sqrt(jnp.sum((vel_new - u_cell) ** 2, axis=0)
                               + 1e-30)
            freq = n_dens * jnp.pi / 4.0 * (d_new + d32_c) ** 2 * v_rel_c
            p_coll = 1.0 - jnp.exp(-freq * dt)
            # coalescence efficiency: We < We_crit (O'Rourke permanent-
            # coalescence regime; grazing collisions left as no-ops)
            rho_l_c = liq.rho(T_new)
            We_c = rho_l_c * v_rel_c**2 * jnp.minimum(d_new, d32_c) \
                / jnp.maximum(liq.sigma, 1e-10)
            coal_eff = jnp.clip(jnp.minimum(1.0, 2.4 / jnp.maximum(
                We_c, 1e-6)), 0.0, 1.0)
            key, kc = jax.random.split(key)
            u_rand = jax.random.uniform(kc, (N,), dtype)
            coalesce = (u_rand < p_coll * coal_eff) & (active > 0) \
                & (n_dens > 0.0)
            # pair-volume diameter; halve multiplicity (two -> one)
            d_coal = (d_new**3 + d32_c**3) ** (1.0 / 3.0)
            v_coal = (vel_new * d_new[None] ** 3
                      + u_cell * d32_c[None] ** 3) \
                / jnp.maximum(d_new**3 + d32_c**3, 1e-30)[None]
            grow = jnp.where(coalesce, d_coal / jnp.maximum(d_new, 1e-12),
                             1.0)
            d_new = d_new * grow
            n_part = n_part / grow**3  # parcel mass invariant; the partner
            # mass it absorbed is statistical (mean-field), so global
            # liquid mass stays exactly conserved
            vel_new = jnp.where(coalesce[None, :], v_coal, vel_new)

        # ==== stochastic turbulent dispersion (DRW): isotropic velocity
        # fluctuation sampled from the local turbulent kinetic energy
        if self.dispersion and "k_turb" in gas:
            key, kd = jax.random.split(key)
            k_t = g(gas["k_turb"])
            sigma_u = jnp.sqrt(jnp.maximum(2.0 * k_t / 3.0, 0.0))
            xi = jax.random.normal(kd, (3, N), dtype)
            vel_new = vel_new + sigma_u * xi * (active > 0)

        # ==== move; wall interaction (rebound/stick) then deactivate
        # escaped / fully evaporated. Parcels culled for smallness
        # flash-evaporate: their remaining mass joins dm so no liquid mass
        # silently disappears.
        pos_new = pos + vel_new * dt
        m = self.mesh
        lo_b = jnp.asarray([m.x0, m.y0, m.z0], dtype)
        hi_b = lo_b + jnp.asarray([m.nx * m.dx, m.ny * m.dy, m.nz * m.dz],
                                  dtype)
        films = list(c.films)
        absorbed = jnp.zeros((N,), bool)
        for (w_ax, w_side, w_mode) in self.wall_interaction:
            bound = lo_b[w_ax] if w_side == 0 else hi_b[w_ax]
            crossed = (pos_new[w_ax] < bound) if w_side == 0 \
                else (pos_new[w_ax] > bound)
            if w_mode == "rebound":
                refl = 2.0 * bound - pos_new[w_ax]
                pos_new = pos_new.at[w_ax].set(
                    jnp.where(crossed, refl, pos_new[w_ax]))
                vel_new = vel_new.at[w_ax].set(jnp.where(
                    crossed, -self.restitution * vel_new[w_ax],
                    vel_new[w_ax]))
                # tangential restitution too (no-slip-ish wall)
                for t_ax in range(3):
                    if t_ax != w_ax:
                        vel_new = vel_new.at[t_ax].set(jnp.where(
                            crossed, self.restitution * vel_new[t_ax],
                            vel_new[t_ax]))
            elif w_mode == "stick":
                eps_in = 1e-6 * (hi_b[w_ax] - lo_b[w_ax])
                park = bound + eps_in if w_side == 0 else bound - eps_in
                pos_new = pos_new.at[w_ax].set(
                    jnp.where(crossed, park, pos_new[w_ax]))
                vel_new = jnp.where(crossed[None, :],
                                    jnp.zeros_like(vel_new), vel_new)
            elif w_mode == "film":
                # absorb into the matching WallFilm (surfaceFilmModels
                # attachment): parcel liquid mass, tangential momentum, and
                # temperature deposit onto the wall face it crossed
                fi = next(i for i, fl in enumerate(self.films)
                          if fl.axis == w_ax and fl.side == w_side)
                fl = self.films[fi]
                t1, t2 = fl.tangential_axes()
                sizes = (m.dx, m.dy, m.dz)
                origins = (m.x0, m.y0, m.z0)
                dims = (m.nx, m.ny, m.nz)
                i1 = jnp.clip(((pos_new[t1] - origins[t1])
                               / sizes[t1]).astype(jnp.int32), 0,
                              dims[t1] - 1)
                i2 = jnp.clip(((pos_new[t2] - origins[t2])
                               / sizes[t2]).astype(jnp.int32), 0,
                              dims[t2] - 1)
                hit = crossed & (active > 0) & ~absorbed
                A_f = fl.face_area(m)
                w_m = jnp.where(hit, m_new * n_part, 0.0) / A_f
                mom_t = jnp.stack([vel_new[t1], vel_new[t2]]) * w_m[None]
                films[fi] = fl.absorb(films[fi], i1, i2, w_m, mom_t, T_new)
                absorbed = absorbed | hit
        too_small = (active > 0) & (d_new <= 0.5 * self.d_min) & ~absorbed
        dm = dm + jnp.where(too_small, m_new, 0.0)
        m_new = jnp.where(too_small, 0.0, m_new)
        alive = (active > 0) & self._in_domain(pos_new) & ~too_small \
            & ~absorbed
        mask = alive.astype(dtype)

        # ==== Euler sources (per unit volume): scatter-add. Parcels absorbed
        # into a wall film this step still exchanged mass/momentum/heat with
        # the gas on the way in, so they keep their source contribution.
        V = self.mesh.volume
        src_mask = (alive | absorbed).astype(dtype)
        w = n_part * src_mask / (V * dt)            # parcels -> per-vol-per-s
        dm_tot = (dm + dm_dv_tot) * w               # evap + devol mass rate
        shape = self.mesh.shape
        Srho = jnp.zeros(shape, dtype).at[ii, jj, kk].add(dm_tot)
        SY = Srho
        # momentum: drag reaction - momentum carried by evaporated mass
        SU = jnp.zeros((3,) + shape, dtype)
        mom = (-m_d * dmom / dt + (dm + dm_dv_tot) / dt * vel_new) \
            * (n_part * src_mask / V)
        for a in range(3):
            SU = SU.at[a, ii, jj, kk].add(mom[a])
        # energy: evaporated vapor enthalpy (sensible at T_p) minus latent
        # drawn from gas + convective exchange handled via T relaxation
        # (devolatilised mass carries no latent sink)
        q_conv = -h_conv * area * (T_g - Tp) * (n_part * src_mask / V)
        h_vap = -dm * w * L
        Sh_src = jnp.zeros(shape, dtype).at[ii, jj, kk].add(q_conv + h_vap)

        # ==== wall-film substep: heat-up + evaporation back into the
        # wall-adjacent gas layer (thermoSingleLayer transfer)
        sizes = (self.mesh.dx, self.mesh.dy, self.mesh.dz)
        for fi, fl in enumerate(self.films):
            sl = [slice(None)] * 3
            sl[fl.axis] = 0 if fl.side == 0 else -1
            sl = tuple(sl)
            gw = {k2d: gas[k2d][sl] for k2d in ("rho", "T", "mu", "p")
                  if k2d in gas}
            if "Yv" in gas:
                gw["Yv"] = gas["Yv"][sl]
            dn = sizes[fl.axis]
            gw["dn"] = dn
            films[fi], fsrc = fl.evolve(films[fi], gw, liq, dt,
                                        face_area=fl.face_area(self.mesh))
            Srho = Srho.at[sl].add(fsrc["Srho"] / dn)
            SY = SY.at[sl].add(fsrc["SY"] / dn)
            Sh_src = Sh_src.at[sl].add(fsrc["Sh"] / dn)

        c_new = CloudState(pos=pos_new, vel=vel_new, d=d_new, T=T_new,
                           n_part=n_part, active=mask, inject_ptr=ptr,
                           m_injected=m_injected, key=key,
                           m_vol=m_vol * mask[None, :], films=tuple(films))
        return c_new, CloudSources(Srho=Srho, SU=SU, Sh=Sh_src, SY=SY)

    def stats(self, c: CloudState):
        m = (self.liquid.rho(c.T) * jnp.pi / 6.0 * c.d**3 * c.n_part
             * c.active)
        out = dict(n_active=jnp.sum(c.active),
                   liquid_mass=jnp.sum(m),
                   d32=jnp.sum(c.d**3 * c.n_part * c.active)
                   / jnp.maximum(jnp.sum(c.d**2 * c.n_part * c.active),
                                 1e-30))
        if self.films:
            out["film_mass"] = sum(
                jnp.sum(fs.m) * fl.face_area(self.mesh)
                for fs, fl in zip(c.films, self.films))
            out["film_evaporated"] = sum(fs.m_evap for fs in c.films)
        return out
