"""Low-Mach PIMPLE solver on the face-list (CSR/unstructured) backend.

Role parity: the same dfLowMachFoam loop as solvers/low_mach.py
(dfLowMachFoam.C:123-512 — rhoEqn, UEqn, YEqn, EEqn, correctThermo, pEqn
correctors with Rhie-Chow ddtCorr), discretized through gather/scatter over
FaceListMesh connectivity (ops/fv_facelist.py) instead of shifts over a
structured block. This is the solver stage of the BASELINE north-star
"gather/scatter over CSR face-cell connectivity" path: any mesh expressible
as owner/neighbour face lists (unstructured included) runs the same step.

Validation: on a box mesh this solver must reproduce the structured
LowMachSolver step to roundoff (tests/test_facelist_solver.py) — both
backends share BC semantics and per-unit-volume operator forms by
construction.

State layout is flat cells: scalars (n_cells,), vectors (n_cells, 3),
species (n_cells, ns), interior face flux (nf,) + per-patch boundary fluxes.
"""
from __future__ import annotations

import dataclasses
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp

from ..mesh.facelist import FaceListMesh
from ..ops.fv_facelist import (FvMatrixFL, div_flux_fl, face_grad_fl,
                               flux_normal_fl,
                               fvm_ddt_fl, fvm_div_fl, fvm_laplacian_fl,
                               fvm_laplacian_corrected_fl,
                               fvm_source_implicit_fl, grad_fl, grad_multi_fl,
                               interpolate_fl, laplacian_nonortho_corr_fl,
                               sngrad_fl, _boundary_face_value)
from ..ops.linsolve import cg, solve_fvmatrix
from ..parallel.context import gmean
from .low_mach import LowMachConfig

__all__ = ["LowMachFLState", "LowMachSolverFL", "rng_keps_kwargs",
           "make_step_fl"]


def _bake_patch_axes(m: FaceListMesh) -> FaceListMesh:
    """Host-side: fill BoundaryPatch.n_axis from concrete normals so the
    mixed-BC shortcut in _fix_boundary_fluxes never inspects a traced
    normal (required when the mesh travels through jit as an argument)."""
    import numpy as np
    changed = False
    pts = []
    for p in m.patches:
        if p.n_axis is None and int(p.owner.shape[0]) > 0:
            n0 = np.asarray(p.normal)
            ax = int(np.argmax(np.abs(n0[0] if n0.ndim == 2 else n0)))
            p = dataclasses.replace(p, n_axis=ax)
            changed = True
        pts.append(p)
    return dataclasses.replace(m, patches=tuple(pts)) if changed else m


def make_step_fl(solver):
    """jit the solver step with every mesh/connectivity array passed as a
    TRACED argument instead of a closure constant.

    Closing the solver over jit (``jax.jit(lambda s: sol.step(s, dt))``)
    bakes the owner/neighbour/ELL index arrays in as XLA constants; XLA then
    constant-folds every expression over them (index clamps, center deltas,
    weight complements) separately at EVERY use site, serially, on the host
    — compile time grows with mesh size (measured ~120 s at 16^3 and >590 s
    at 32^3 in round 3). With the mesh as a traced pytree argument the graph
    is size-generic modulo shapes and compile time is flat. This mirrors
    what parallel/distributed_fl.py already does for exactly this reason.

    Returns ``step(state, dt, sources=None) -> (state, diag)``. Works for
    LowMachSolverFL and subclasses (FGMSolverFL).

    When EVERY mesh carries a ShiftPlan the solver closes over the mesh
    instead: the plan path has no gather-index expressions left to
    constant-fold (compile time measured flat, 46 s at 48^3), closure
    constants run ~20% faster, and — decisive — XLA:TPU MIscompiles the
    traced-mesh program at 96^3 (the optimized executable yields NaNs
    while the de-optimized interpreter of the same jaxpr is clean;
    jax_debug_nans confirms). Traced-arg mode remains for plan-less
    (general/unstructured) meshes, whose ELL index arrays do fold.
    """
    meshes_all = []
    for f in dataclasses.fields(solver):
        v = getattr(solver, f.name)
        if isinstance(v, FaceListMesh):
            meshes_all.append(v)
        elif f.name == "m_U" and v is not None:
            meshes_all.extend(v)
    if getattr(solver, "m_Y_groups", None) is not None:
        meshes_all.extend(g[0] for g in solver.m_Y_groups)
    if meshes_all and all(mm.plan is not None for mm in meshes_all):
        baked = {}
        for f in dataclasses.fields(solver):
            v = getattr(solver, f.name)
            if isinstance(v, FaceListMesh):
                baked[f.name] = _bake_patch_axes(v)
            elif f.name == "m_U" and v is not None:
                baked[f.name] = tuple(_bake_patch_axes(x) for x in v)
        if getattr(solver, "m_Y_groups", None) is not None:
            baked["m_Y_groups"] = tuple(
                (_bake_patch_axes(g[0]), g[1]) for g in solver.m_Y_groups)
        sol_c = dataclasses.replace(solver, **baked)
        jf = jax.jit(lambda s, dt, sources: sol_c.step(s, dt, sources))
        return lambda s, dt, sources=None: jf(s, dt, sources)
    mesh_kw = {}
    for f in dataclasses.fields(solver):
        v = getattr(solver, f.name)
        if isinstance(v, FaceListMesh):
            mesh_kw[f.name] = _bake_patch_axes(v)
        elif f.name == "m_U" and v is not None:
            mesh_kw[f.name] = tuple(_bake_patch_axes(x) for x in v)
        elif f.name == "p_ell" and v is not None:
            mesh_kw[f.name] = v
    groups_idx = None
    groups_meshes = None
    if getattr(solver, "m_Y_groups", None) is not None:
        # species index tuples must stay static (Python iteration keys);
        # only the meshes are traced
        groups_idx = tuple(tuple(int(i) for i in g[1])
                           for g in solver.m_Y_groups)
        groups_meshes = tuple(_bake_patch_axes(g[0])
                              for g in solver.m_Y_groups)
    base = dataclasses.replace(
        solver, **{k: None for k in mesh_kw},
        **({"m_Y_groups": None} if groups_idx is not None else {}))

    @jax.jit
    def _step(kw, gmeshes, s, dt, sources):
        if gmeshes is not None:
            kw = dict(kw, m_Y_groups=tuple(
                (mm, gi) for mm, gi in zip(gmeshes, groups_idx)))
        sol = dataclasses.replace(base, **kw)
        return sol.step(s, dt, sources)

    def step(s, dt, sources=None):
        return _step(mesh_kw, groups_meshes, s, dt, sources)

    return step


def rng_keps_kwargs(C1: float = 1.42) -> dict:
    """Constructor kwargs for the RNG k-epsilon variant with its published
    constants (OpenFOAM RNGkEpsilon defaults: Cmu 0.0845, C1 1.42, C2 1.68,
    sigmak = sigmaEps = 0.71942, eta0 4.38, beta 0.012). Case dicts may
    override C1 (the Sandia D flareFGM case sets C1 1.52)."""
    return dict(keps_variant="RNG", Cmu=0.0845, C1=C1, C2=1.68,
                sigma_k=0.71942, sigma_eps=0.71942, eta0=4.38,
                beta_rng=0.012)


class LowMachFLState(NamedTuple):
    rho: jax.Array           # (n,)
    U: jax.Array             # (n, 3)
    p: jax.Array
    ha: jax.Array
    Y: jax.Array             # (n, ns)
    T: jax.Array
    phi: jax.Array           # (nf,) interior face mass-flux density
    phi_b: tuple             # per-patch boundary flux densities
    dpdt: jax.Array
    time: jax.Array
    chem_dt: Any = ()
    turb: tuple = ()          # (k, eps) when RAS is active (m_k set)


def _coeff_patches(m: FaceListMesh):
    """Value-neutral (zeroGradient) boundary values of a coefficient field:
    face value = owner value (the structured backend's bcs_coeff role)."""
    return [lambda q, p=p: q[p.owner] for p in m.patches]


def _face_product(m: FaceListMesh, q):
    """Face interpolation of a coefficient field (interior), boundary =
    owner extrapolation. Returns (interior (nf,), per-patch list)."""
    return interpolate_fl(m, q), [q[p.owner] for p in m.patches]


@dataclasses.dataclass(frozen=True)
class LowMachSolverFL:
    """Per-field FaceListMesh instances carry each field's boundary
    coefficients over the SAME geometry/connectivity (built by
    mesh.facelist.from_structured for box meshes, or any constructor
    producing consistent owner/neighbour/patch blocks for general meshes)."""
    m_p: FaceListMesh        # pressure-field BCs
    m_h: FaceListMesh
    m_Y: FaceListMesh        # shared by all species
    m_rho: FaceListMesh
    m_U: tuple               # (3,) per velocity component
    thermo: Any
    transport: Any
    combustion: Any
    config: LowMachConfig = LowMachConfig()
    # RAS closure (standard k-epsilon on the face-list mesh; active when
    # m_k is set). Mirrors turbulence/ras.py::KEpsilon; wall_fns is a
    # WallFunctionsFL for wall patches (turbulence/wall_functions_fl.py).
    m_k: Any = None
    m_eps: Any = None
    wall_fns: Any = None
    # per-species Y boundary conditions: OpenFOAM gives every species its
    # own boundaryField (0/C2H5OH vs 0/O2 ...). m_Y carries the shared
    # default; m_Y_groups, when set, is ((mesh, (species_idx, ...)), ...) —
    # species within a group share one BC mesh and stay vmapped together,
    # so a 34-species case with 5 distinct inlet compositions costs 6
    # vmapped solves, not 34 serial ones
    m_Y_groups: Any = None
    Cmu: float = 0.09
    C1: float = 1.44
    C2: float = 1.92
    sigma_k: float = 1.0
    sigma_eps: float = 1.3
    k_min: float = 1e-10
    eps_min: float = 1e-12
    Pr_t: float = 0.85
    Sc_t: float = 0.7
    # RNG k-epsilon variant (OpenFOAM RNGkEpsilon.C: the strain-dependent
    # (C1 - R) coefficient with R = eta(1-eta/eta0)/(1+beta eta^3),
    # eta = |S| k/eps). The Sandia D flareFGM case dict selects
    # `RASModel RNGkEpsilon; C1 1.52` (/root/reference/test/dfLowMachFoam/
    # twoD_SandiaD_flareFGM/constant/turbulenceProperties:23-28); use
    # rng_keps_kwargs() for the published constants.
    keps_variant: str = "standard"   # standard | RNG
    eta0: float = 4.38
    beta_rng: float = 0.012
    # AMG pressure preconditioner (ops/amg_fl.py AMGSetupFL built over m_p's
    # connectivity — the reference's AmgX AGGREGATION V-cycle role,
    # src/dfMatrix/amgxSolver.H:58-82). None = Jacobi-CG. Single-device
    # only: on shard-local meshes (w_own set) the loop falls back to Jacobi.
    p_mg: Any = None
    # ELL SpMV route for the pressure CG matvec: m_p.ell_connectivity()
    # triple precomputed at construction (host walk — cannot run on the
    # tracer leaves seen under jit/shard_map). None = the scatter_both
    # segment-sum matvec. With it set, each CG matvec is ONE dense gather +
    # width-6 reduction, and on TPU the Mosaic ELL kernel
    # (ops/pallas_kernels.ell_matvec, x VMEM-resident) when
    # config.use_pallas == "auto". Reference SpMV role: src_gpu CSR +
    # AmgX (dfMatrixOpBase.H:117-125).
    p_ell: Any = None
    # LES SGS model (turbulence/les.py LESModel) — mutually exclusive with
    # the k-epsilon RAS block (m_k). mu_t from per-cell tensor algebra on
    # grad_fl; reference role: src/TurbulenceModels LES family on general
    # meshes (Sigma.H:28-44, WALE). Enables the north-star 3D LES jet case
    # on unstructured meshes.
    les: Any = None

    @property
    def mesh(self) -> FaceListMesh:
        return self.m_p

    # ------------------------------------------------------------- helpers
    def _mixture_update(self, p, T, Y):
        X = self.thermo.mole_fractions(Y)
        mu = self.transport.mu_mix(T, X)
        cp = self.thermo.cp_mass(T, Y)
        lam = self.transport.lambda_mix(T, X)
        alpha = lam / cp
        if self.config.unity_lewis:
            rhoD = jnp.broadcast_to(alpha, (Y.shape[1],) + alpha.shape)
        else:
            rho = self.thermo.rho(p, T, Y)
            Dm = self.transport.mix_diff_coeffs(T, p, X, Y)   # (n, ns)
            rhoD = jnp.moveaxis(rho[..., None] * Dm, -1, 0)
        return mu, alpha, rhoD                           # rhoD: (ns, n)

    def _face_flux(self, rho, U):
        """(interior phi, per-patch phi) of rho*U using the U-component
        boundary coefficients (mirror of structured _face_flux)."""
        m = self.m_p
        q = rho[:, None] * U                            # (n, 3)
        phi = flux_normal_fl(m, q)
        phi_b = []
        for ip, p in enumerate(m.patches):
            if p.kind in ("symmetry", "wedge", "empty"):
                # exact reflection => zero normal mass flux (see flux_of_fl)
                phi_b.append(jnp.zeros_like(p.mag_sf))
                continue
            vb = 0.0
            for c in range(3):
                pc = self.m_U[c].patches[ip]
                vb = vb + _boundary_face_value(pc, q[:, c]) * p.normal[:, c]
            phi_b.append(vb)
        return phi, tuple(phi_b)

    def initial_state(self, p, T, Y, U=None, time=0.0, k0=1e-3,
                      eps0=1e-2) -> LowMachFLState:
        dtype = T.dtype
        n = T.shape[0]
        if U is None:
            U = jnp.zeros((n, 3), dtype)
        ha = self.thermo.h_mass(T, Y)
        rho = self.thermo.rho(p, T, Y)
        phi, phi_b = self._face_flux(rho, U)
        turb = ()
        if self.m_k is not None:
            turb = (jnp.broadcast_to(jnp.asarray(k0, dtype), (n,)),
                    jnp.broadcast_to(jnp.asarray(eps0, dtype), (n,)))
        # CVODE-style per-cell warm-started chemistry substep (same as the
        # structured backend's initial_state: without it dt_start=None cold
        # starts the stiff integrator EVERY step — measured 2000x slower at
        # 32^3 on TPU)
        chem_dt = ()
        if self.config.chemistry and \
                getattr(self.combustion, "ode_opts", None) is not None:
            chem_dt = jnp.full((n,), self.combustion.ode_opts.dt_init, dtype)
        return LowMachFLState(rho=rho, U=U, p=p, ha=ha, Y=Y, T=T, phi=phi,
                              phi_b=phi_b, dpdt=jnp.zeros(n, dtype),
                              time=jnp.asarray(time, dtype), turb=turb,
                              chem_dt=chem_dt)

    def _fix_boundary_fluxes(self, phi_b, rho_b_face):
        """Prescribed mass flux on fixed-normal-velocity patches (mirror of
        structured _fix_boundary_fluxes: only the NORMAL component's BC
        decides; tangential components carry no normal flux on the
        axis-aligned patches this constructor produces)."""
        import numpy as np
        fixed_kinds = ("fixedValue", "symmetryNegate", "inletOutlet")
        out = list(phi_b)
        m = self.m_p
        for ip, p in enumerate(m.patches):
            if p.owner.shape[0] == 0:      # degenerate patch (e.g. axis)
                continue
            kinds = [self.m_U[c].patches[ip].kind for c in range(3)]
            if all(k in fixed_kinds for k in kinds):
                # general normals: prescribed u_bc . n per face (face value
                # of every a = -1 component is b/2)
                val = 0.0
                for c in range(3):
                    pc = self.m_U[c].patches[ip]
                    val = val + 0.5 * pc.b * p.normal[:, c]
                out[ip] = rho_b_face[ip] * val
                continue
            # mixed per-component kinds: axis-aligned-patch shortcut (the
            # structured constructors only produce these on box meshes).
            # Shard-local patches carry the dominant axis statically
            # (p.n_axis) because their normals are traced arrays.
            if p.n_axis is not None:
                ax = p.n_axis
            else:
                n0 = np.asarray(p.normal)[0]
                ax = int(np.argmax(np.abs(n0)))
            pc = self.m_U[ax].patches[ip]
            if pc.kind in fixed_kinds:
                # face value of the normal component = b/2 (a = -1 kinds)
                out[ip] = rho_b_face[ip] * 0.5 * pc.b * p.normal[:, ax]
        return tuple(out)

    def _keps_advance(self, k, eps, rho, rho_old, phi, phi_b, U, mu, dt):
        """Standard k-epsilon update on the face-list mesh; returns
        (k, eps, mu_t). Mirrors turbulence/ras.py::KEpsilon.advance."""
        cfg = self.config
        m = self.m_p
        mu_t = rho * self.Cmu * k * k / jnp.maximum(eps, self.eps_min)
        gU = grad_multi_fl(self.m_U, U)                  # (n, i, j)
        S = 0.5 * (gU + jnp.swapaxes(gU, 1, 2))
        SS = jnp.sum(S * S, axis=(1, 2))
        divU = gU[:, 0, 0] + gU[:, 1, 1] + gU[:, 2, 2]
        P = mu_t * 2.0 * SS
        # realizability production limiter (Menter-style clip): unbounded
        # P = mu_t |S|^2 at sharp fronts outruns the lagged dissipation and
        # sends k -> inf within a few steps (observed on the Sandia D pilot
        # front); OpenFOAM survives via bound() + wall functions, here the
        # standard P <= 10 rho eps clip serves
        P = jnp.minimum(P, 10.0 * rho * jnp.maximum(eps, self.eps_min))
        wf = self.wall_fns
        if wf is not None:
            # wall-layer production + log-layer eddy viscosity
            # (epsilonWallFunction::calculate + nutkWallFunction).
            # G MUST use the wall-function nutw, NOT the transported-k
            # mu_t = rho Cmu k^2/eps: with the cell value, G_w tracks the
            # pinned eps_w for ANY k and the wall layer admits a spurious
            # high-k equilibrium (observed: pipe k ~ 400 = 15x the log-law
            # level, laminar-like profile, nu_t ~ 3e-3 homogenizing the
            # Sandia jet). OpenFOAM epsilonWallFunction::calculate uses the
            # nut BOUNDARY field (nutkWallFunction) for exactly this reason.
            mut_w = rho * wf.nut(rho, k, mu)
            G_w = wf.production(rho, k, mu, mut_w, U)
            P = wf.apply(G_w, P)
            mu_t = wf.apply(mut_w, mu_t)
        k_s = jnp.maximum(k, self.k_min)
        C1_eff = self.C1
        if self.keps_variant == "RNG":
            # OpenFOAM RNGkEpsilon.C: eta = sqrt(S2) k/eps with
            # S2 = 2|dev(symm(grad U))|^2; R = eta(1-eta/eta0)/(1+beta eta^3)
            # and the eps production coefficient becomes (C1 - R)
            S2_dev = 2.0 * jnp.maximum(SS - divU * divU / 3.0, 0.0)
            eta = jnp.sqrt(S2_dev) * k_s / jnp.maximum(eps, self.eps_min)
            R = eta * (1.0 - eta / self.eta0) \
                / (1.0 + self.beta_rng * eta ** 3)
            C1_eff = self.C1 - R
        # epsilon: implicit destruction via C2 rho eps/k on the diagonal
        D_e, D_eb = _face_product(m, mu + mu_t / self.sigma_eps)
        dtype = k.dtype
        eqn_e = (fvm_ddt_fl(self.m_eps, rho, rho_old, eps, dt, dtype)
                 + fvm_div_fl(self.m_eps, phi, list(phi_b),
                              cfg.div_scheme, dtype, x_now=eps)
                 + fvm_laplacian_corrected_fl(self.m_eps, D_e, D_eb,
                                              eps, dtype, sign=-1.0)
                 + fvm_source_implicit_fl(self.m_eps,
                                          self.C2 * rho * eps / k_s, dtype)
                 ).with_source(C1_eff * (eps / k_s) * P)
        res_e = solve_fvmatrix(eqn_e, eps, tol=1e-8, max_iter=cfg.max_iter_u)
        eps = jnp.maximum(res_e.x, self.eps_min)
        if wf is not None:
            # epsilonWallFunction: pin eps in wall-adjacent cells
            eps = wf.apply(wf.epsilon(k), eps)
        # k: implicit destruction rho eps/k
        D_k, D_kb = _face_product(m, mu + mu_t / self.sigma_k)
        eqn_k = (fvm_ddt_fl(self.m_k, rho, rho_old, k, dt, dtype)
                 + fvm_div_fl(self.m_k, phi, list(phi_b),
                              cfg.div_scheme, dtype, x_now=k)
                 + fvm_laplacian_corrected_fl(self.m_k, D_k, D_kb, k,
                                              dtype, sign=-1.0)
                 + fvm_source_implicit_fl(self.m_k, rho * eps / k_s, dtype)
                 ).with_source(P)
        res_k = solve_fvmatrix(eqn_k, k, tol=1e-8, max_iter=cfg.max_iter_u)
        k = jnp.maximum(res_k.x, self.k_min)
        mu_t = rho * self.Cmu * k * k / jnp.maximum(eps, self.eps_min)
        return k, eps, mu_t

    # ---------------------------------------------------------------- step
    def step(self, s: LowMachFLState, dt, sources=None):
        """sources: optional spray coupling dict with keys Srho (n,),
        SU (3, n), Sh (n,), SY (n,), SY_index (static fuel species index) —
        the reference's parcels.Srho/SU/Sh/SYi terms on the unstructured
        path (dfSprayFoam rhoEqn.H:38, UEqn.H:9, EEqn.H:5-12, YEqn.H:33),
        produced here by lagrangian/overlay.py::OverlaySprayCloud."""
        cfg = self.config
        m = self.m_p
        dtype = s.T.dtype
        n = s.T.shape[0]
        ns = s.Y.shape[1]
        diag = {}

        rho_old, U_old, p_old, ha_old, Y_old = s.rho, s.U, s.p, s.ha, s.Y
        rho, U, p, ha, Y, T = s.rho, s.U, s.p, s.ha, s.Y, s.T
        phi, phi_b = s.phi, s.phi_b
        dpdt = s.dpdt
        turb = s.turb

        # ===== chemistry (operator split)
        if cfg.chemistry:
            turb_q = None
            if self.m_k is not None:
                # turbulence quantities for EDC/PaSR mixing models
                mu0, _, _ = self._mixture_update(p, T, Y)
                turb_q = dict(k=turb[0], epsilon=turb[1], nu=mu0 / rho)
            elif self.les is not None:
                mu0, _, _ = self._mixture_update(p, T, Y)
                mu_t0 = self.les.mu_t_fl(rho, U, self.m_U, m.volumes)
                k_sgs, eps_sgs = self.les.sgs_k_epsilon_fl(mu_t0, rho,
                                                           m.volumes)
                turb_q = dict(k=k_sgs, epsilon=eps_sgs, nu=mu0 / rho)
            chem = self.combustion.correct(
                T, p, Y, dt * cfg.chemistry_dt_scale, turb_q,
                dt_start=s.chem_dt if not isinstance(s.chem_dt, tuple)
                else None)
            RR = chem.RR * cfg.chemistry_dt_scale        # (n, ns)
            chem_dt_new = chem.dt_next if chem.dt_next is not None \
                else s.chem_dt
        else:
            RR = jnp.zeros_like(Y)
            chem_dt_new = s.chem_dt

        src_rho = sources["Srho"] if sources else 0.0

        for outer in range(cfg.n_outer):
            # ===== rhoEqn (parcels.Srho, dfSprayFoam rhoEqn.H:38)
            rho = rho_old - dt * div_flux_fl(m, phi, phi_b) + dt * src_rho

            # ===== coefficients (molecular + RAS effective, the reference's
            # turbulence->muEff()/alphaEff() pattern)
            mu, alpha, rhoD = self._mixture_update(p, T, Y)
            if self.m_k is not None:
                k_t, e_t = turb
                k_t, e_t, mu_t = self._keps_advance(
                    k_t, e_t, rho, rho_old, phi, phi_b, U, mu, dt)
                turb = (k_t, e_t)
                mu = mu + mu_t
                alpha = alpha + mu_t / self.Pr_t
                rhoD = rhoD + mu_t[None] / self.Sc_t
            elif self.les is not None:
                mu_t = self.les.mu_t_fl(rho, U, self.m_U, m.volumes)
                mu = mu + mu_t
                alpha = alpha + mu_t / self.les.Pr_t
                rhoD = rhoD + mu_t[None] / self.les.Sc_t
            mu_f, mu_bf = _face_product(m, mu)

            # ===== UEqn
            U, HbyA, rAU = self._momentum(rho, rho_old, U, U_old, phi, phi_b,
                                          p, mu, mu_f, mu_bf, dt, diag,
                                          SU=sources["SU"] if sources
                                          else None)

            # ===== YEqn
            gY_all = None
            if ns > 1:
                # batched species gradients: ONE wide gather/scatter per
                # BC group instead of ns scalar-field gradient pipelines
                groups0 = self.m_Y_groups or ((self.m_Y,
                                               tuple(range(ns))),)
                if len(groups0) == 1:
                    gY_all = grad_fl(groups0[0][0], Y)     # (n, ns, 3)
                else:
                    gY_all = jnp.zeros((n, ns, 3), dtype)
                    for m_Yg, idx in groups0:
                        ii = jnp.asarray(idx)
                        gY_all = gY_all.at[:, ii, :].set(
                            grad_fl(m_Yg, Y[:, ii]))
                # sumYDiff_c = sum_i rhoD[i] * gY[i, c]   (rhoD is (ns, n))
                sumYDiff = jnp.einsum("in,nic->nc", rhoD, gY_all)
                # phiUc: correction flux density at faces (batched over the
                # 3 components; boundary = owner extrapolation as before)
                phiUc = flux_normal_fl(m, sumYDiff)
                phiUc_b = [jnp.sum(sumYDiff[p_.owner] * p_.normal, axis=1)
                           for p_ in m.patches]

                def _make_solver(m_Yg):
                    def _solve_species(rhoD_i, y_i, y_old_i, src_i):
                        D_f, D_b = _face_product(m, rhoD_i)
                        eqn = (fvm_ddt_fl(m_Yg, rho, rho_old, y_old_i, dt,
                                          dtype)
                               + fvm_div_fl(m_Yg, phi,
                                            [pb for pb in phi_b],
                                            cfg.div_scheme, dtype, x_now=y_i)
                               + fvm_div_fl(m_Yg, phiUc, phiUc_b,
                                            "upwind", dtype)
                               + fvm_laplacian_corrected_fl(
                                   m_Yg, D_f, D_b, y_i, dtype, sign=-1.0)
                               ).with_source(src_i)
                        res = solve_fvmatrix(eqn, y_i, tol=cfg.y_tol,
                                             max_iter=cfg.max_iter_u)
                        return jnp.clip(res.x, 0.0, 1.0), res.iterations

                    return _solve_species

                Y_in = Y
                srcs_Y = RR.T
                if sources is not None and sources.get("SY_index") is not None:
                    srcs_Y = srcs_Y.at[sources["SY_index"]].add(sources["SY"])
                groups = self.m_Y_groups or ((self.m_Y, tuple(range(ns))),)
                it_ys = []
                Y_new = Y
                for m_Yg, idx in groups:
                    ii = jnp.asarray(idx)
                    Y_t, it_y = jax.vmap(_make_solver(m_Yg))(
                        rhoD[ii], Y.T[ii], Y_old.T[ii], srcs_Y[ii])
                    Y_new = Y_new.at[:, ii].set(Y_t.T)
                    it_ys.append(jnp.max(it_y))
                Y = Y_new
                diag["iters_Y"] = jnp.max(jnp.stack(it_ys))
                if cfg.inert_index is not None:
                    others = jnp.sum(Y, axis=1) - Y[:, cfg.inert_index]
                    Y = Y.at[:, cfg.inert_index].set(
                        jnp.clip(1.0 - others, 0.0, 1.0))
                else:
                    Y = Y / jnp.sum(Y, axis=1, keepdims=True)

            # ===== EEqn
            alpha_f, alpha_b = _face_product(m, alpha)
            K = 0.5 * jnp.sum(U * U, axis=1)
            K_old = 0.5 * jnp.sum(U_old * U_old, axis=1)
            Kf, Kb = _face_product(m, K)
            dKdt = (rho * K - rho_old * K_old) / dt + div_flux_fl(
                m, phi * Kf, [fb * kb for fb, kb in zip(phi_b, Kb)])
            hcorr_div = 0.0
            if ns > 1:
                h_sp = self.thermo.h_species(T)          # (n, ns)
                coeff = h_sp * (rhoD.T - alpha[:, None])  # (n, ns)
                hcorr = jnp.einsum("ni,nic->nc", coeff, gY_all)
                hc_f = flux_normal_fl(m, hcorr)
                hc_b = [jnp.sum(hcorr[p_.owner] * p_.normal, axis=1)
                        for p_ in m.patches]
                hcorr_div = div_flux_fl(m, hc_f, hc_b)
            eqn_h = (fvm_ddt_fl(self.m_h, rho, rho_old, ha_old, dt, dtype)
                     + fvm_div_fl(self.m_h, phi, list(phi_b),
                                  cfg.div_scheme, dtype, x_now=ha)
                     + fvm_laplacian_corrected_fl(self.m_h, alpha_f,
                                                  alpha_b, ha, dtype,
                                                  sign=-1.0))
            src_h = sources["Sh"] if sources else 0.0
            eqn_h = eqn_h.with_source(dpdt - dKdt + hcorr_div + src_h)
            if cfg.solve_energy:
                res_h = solve_fvmatrix(eqn_h, ha, tol=cfg.h_tol,
                                       max_iter=cfg.max_iter_u)
                ha = res_h.x
                diag["iters_h"] = res_h.iterations

            # ===== correctThermo
            T = self.thermo.T_from_h(ha, Y, T)
            psi = self.thermo.psi(T, Y)

            # ===== pEqn correctors
            rho_fn = lambda pp: self.thermo.rho(pp, T, Y)
            p_prev, U_prev = p, U
            rhoU_old = self._face_flux(rho_old, U_old)
            p, phi, phi_b, U, dpdt, rho, p_res = self._pressure_loop(
                p, p_old, psi, rho_fn, HbyA, rAU, dt, rho_old,
                (s.phi, s.phi_b), rhoU_old, diag, src_rho=src_rho)
            diag[f"p_res_{outer}"] = p_res
            if outer < cfg.n_outer - 1:
                p = p_prev + cfg.p_relax * (p - p_prev)
                U = U_prev + cfg.u_relax * (U - U_prev)
                rho = rho_fn(p)
                dpdt = (p - p_old) / dt

        rho_eos = self.thermo.rho(p, T, Y)
        diag["continuity_err"] = jnp.max(jnp.abs(rho_eos - rho)) \
            / jnp.mean(rho)
        diag["T_min"] = jnp.min(T)
        diag["T_max"] = jnp.max(T)
        if self.m_k is not None:
            diag["k_max"] = jnp.max(turb[0])
        return LowMachFLState(rho=rho, U=U, p=p, ha=ha, Y=Y, T=T, phi=phi,
                              phi_b=phi_b, dpdt=dpdt, time=s.time + dt,
                              chem_dt=chem_dt_new, turb=turb), diag

    # ----------------------------------------------------------- momentum
    def _momentum(self, rho, rho_old, U, U_old, phi, phi_b, p, mu, mu_f,
                  mu_bf, dt, stats, SU=None):
        cfg = self.config
        m = self.m_p
        dtype = U.dtype
        gp = grad_fl(self.m_p, p)                        # (n, 3)
        # dev2 explicit correction — all 10 coefficient-field gradients
        # (mu*dU_i/dx_c for i,c plus mu*divU) in ONE batched Gauss pass
        gU_all = grad_multi_fl(self.m_U, U)              # (n, 3, 3) [n,i,c]
        divU = gU_all[:, 0, 0] + gU_all[:, 1, 1] + gU_all[:, 2, 2]
        Q = jnp.concatenate([mu[:, None] * gU_all.reshape(-1, 9),
                             (mu * divU)[:, None]], axis=1)    # (n, 10)
        G = self._grad_coeff(Q)                          # (n, 10, 3)
        corrs = []
        for c in range(3):
            corr = (G[:, 0 + c, 0] + G[:, 3 + c, 1] + G[:, 6 + c, 2]
                    - G[:, 9, c] * (2.0 / 3.0))
            corrs.append(corr)
        g_vec = cfg.gravity
        srcs = jnp.stack([-gp[:, c] + corrs[c]
                          + (SU[c] if SU is not None else 0.0)
                          + (rho * g_vec[c] if g_vec[c] else 0.0)
                          for c in range(3)], axis=1)

        U_new, HbyA = [], []
        u_diags = None
        for c in range(3):
            eqn = (fvm_ddt_fl(self.m_U[c], rho, rho_old, U_old[:, c], dt,
                              dtype)
                   + fvm_div_fl(self.m_U[c], phi, list(phi_b),
                                getattr(cfg, "div_scheme_U", None)
                                or cfg.div_scheme, dtype, x_now=U[:, c])
                   + fvm_laplacian_corrected_fl(self.m_U[c], mu_f,
                                                mu_bf, U[:, c], dtype,
                                                sign=-1.0)
                   ).with_source(srcs[:, c])
            res = solve_fvmatrix(eqn, U[:, c], tol=cfg.u_tol,
                                 max_iter=cfg.max_iter_u)
            U_new.append(res.x)
            if u_diags is None:
                u_diags = eqn.diag()
            HbyA.append((eqn.H(res.x) + gp[:, c]) / u_diags)
        if stats is not None:
            stats["iters_U"] = res.iterations
        return (jnp.stack(U_new, axis=1), jnp.stack(HbyA, axis=1),
                1.0 / u_diags)

    def _grad_coeff(self, q):
        """Gauss gradient of coefficient field(s): boundary face value =
        owner value (structured bcs_coeff role). Batched: q (n,) -> (n, 3)
        or q (n, k) -> (n, k, 3) through one wide gather/scatter. Plan
        meshes loop columns (fused slab stencils) — the (nf, k, 3) face
        tensor would relayout hundreds of MB at production sizes."""
        m = self.m_p
        if m.plan is not None and q.ndim == 2:
            return jnp.stack([self._grad_coeff(q[:, j])
                              for j in range(q.shape[1])], axis=1)
        if m.plan is not None:
            out = m.plan_grad_interior(q)                    # (n, 3)
            for p_ in m.patches:
                fb = q[p_.owner] * p_.mag_sf
                out = out + jax.ops.segment_sum(
                    fb[:, None] * p_.normal, p_.owner,
                    num_segments=m.n_cells)
            return m.restrict(out) / m.vol_local[:, None]
        qf = interpolate_fl(m, q)                            # (nf, ...)
        sf_vec = m.mag_sf[:, None] * m.normal                # (nf, 3)
        fv = qf[..., None] * sf_vec.reshape(
            (sf_vec.shape[0],) + (1,) * (qf.ndim - 1) + (3,))
        out = m.scatter_faces(fv)                            # (n, ..., 3)
        for p_ in m.patches:
            qo = q[p_.owner]
            fb = qo * p_.mag_sf.reshape(
                (p_.mag_sf.shape[0],) + (1,) * (qo.ndim - 1))
            fbv = fb[..., None] * p_.normal.reshape(
                (p_.normal.shape[0],) + (1,) * (fb.ndim - 1) + (3,))
            out = out + jax.ops.segment_sum(fbv, p_.owner,
                                            num_segments=m.n_cells)
        return m.restrict(out) / m.vol_local.reshape(
            (m.vol_local.shape[0],) + (1,) * (out.ndim - 1))

    # ------------------------------------------------------ pressure loop
    def _pressure_loop(self, p, p_old, psi, rho_fn, HbyA, rAU, dt, rho_old,
                       phi_old_all, rhoU_old, stats, src_rho=0.0):
        cfg = self.config
        m = self.m_p
        dtype = p.dtype
        phi_old, phi_b_old = phi_old_all
        rhoU_old_f, rhoU_old_b = rhoU_old
        p_res = jnp.zeros((), dtype)
        for _ in range(cfg.n_corr):
            rho = rho_fn(p)
            rho_f = interpolate_fl(self.m_rho, rho)
            rho_bf = [_boundary_face_value(pc, rho)
                      for pc in self.m_rho.patches]
            # phiHbyA = rho_f * (HbyA . n)_f  (interior batched over c —
            # interpolation weights are geometry-only, shared across m_U)
            phiH = flux_normal_fl(m, HbyA)
            phiH_b = [0.0 for _ in m.patches]
            for c in range(3):
                for ip, p_ in enumerate(m.patches):
                    if p_.kind in ("symmetry", "wedge", "empty"):
                        # exactly zero normal flux (see flux_of_fl): the
                        # per-component affine ghost leaks O(sin theta)
                        # times the tangential velocity through BOTH tilted
                        # wedge sides (same-signed normals — they do not
                        # cancel), continuously creating mass/momentum in
                        # any region with radial motion
                        continue
                    pc = self.m_U[c].patches[ip]
                    phiH_b[ip] = phiH_b[ip] + _boundary_face_value(
                        pc, HbyA[:, c]) * p_.normal[:, c]
            phiH = rho_f * phiH
            phiH_b = [0.0 * rb if p_.kind in ("symmetry", "wedge", "empty")
                      else rb * hb
                      for rb, hb, p_ in zip(rho_bf, phiH_b, m.patches)]
            # rhorAUf: face interpolation of the PRODUCT rho*rAU
            rhorAUf, rhorAU_b = _face_product(m, rho * rAU)
            # ddtCorr with the OpenFOAM limiter
            small = jnp.asarray(1e-15, dtype)
            corr = phi_old - rhoU_old_f
            coeff = 1.0 - jnp.minimum(jnp.abs(corr)
                                      / (jnp.abs(phi_old) + small), 1.0)
            phiH = phiH + rhorAUf * coeff * corr / dt
            for ip in range(len(m.patches)):
                corr_b = phi_b_old[ip] - rhoU_old_b[ip]
                coeff_b = 1.0 - jnp.minimum(
                    jnp.abs(corr_b) / (jnp.abs(phi_b_old[ip]) + small), 1.0)
                phiH_b[ip] = phiH_b[ip] + rhorAU_b[ip] * coeff_b * corr_b / dt
            phiH_b = list(self._fix_boundary_fluxes(phiH_b, rho_bf))
            eqn_p = (fvm_source_implicit_fl(m, psi / dt, dtype)
                     + fvm_laplacian_fl(m, rhorAUf, rhorAU_b, dtype,
                                        sign=-1.0))
            # src_rho: spray mass source (parcels.Srho in the reference
            # pEqn.H) — kept in the pEqn AND the continuity density below
            # so evaporated mass never re-enters as an acoustic imbalance
            eqn_p = eqn_p.with_source(rho_old / dt
                                      - div_flux_fl(m, phiH, phiH_b)
                                      + src_rho)
            # CG needs SPD: the per-unit-volume LDU form is nonsymmetric
            # when volumes vary (row_c scaled by 1/V_c), so solve the
            # volume-scaled system (V/V_mean)*A(x) = (V/V_mean)*b —
            # symmetric by construction (OpenFOAM's fvMatrix is stored
            # V-scaled the same way); normalizing by V_mean keeps the
            # absolute-tolerance semantics, and on uniform meshes the
            # scaling is exactly 1 (bit-identical to the structured path)
            Vn = m.vol_local / gmean(m.vol_local)
            # restrict: on a shard-local mesh, halo/pad rows are not this
            # shard's equations — zero them out of A(x) and b so every
            # Krylov psum reduction sums exactly the globally-owned rows
            plan_shape = m.plan.shape if m.plan is not None else None
            if plan_shape is not None:
                # lattice-resident pressure CG (see ops/linsolve plan path):
                # coefficients precomputed once with the Vn symmetrization
                # folded in; each CG iteration is one fused stencil pass
                # with NO flat<->lattice relayouts inside the while_loop.
                from ..ops.fv_facelist import apply_stencil_lattice
                diag_lat, stencil_terms = eqn_p.plan_stencil(scale=Vn)
                apply_v = lambda X: apply_stencil_lattice(X, diag_lat,
                                                          stencil_terms)
            elif self.p_ell is not None:
                nbr_e, coef_e = eqn_p.ell(conn=self.p_ell)
                # Mosaic's gather primitive is take_along_axis-shaped only
                # (same-shape 2D input/indices), so the arbitrary-index ELL
                # gather cannot lower in Pallas on current TPU toolchains;
                # XLA's native dynamic-gather HLO carries the matvec instead
                # (the kernel remains for interpret-mode validation). Plan
                # meshes skip ELL entirely: eqn.apply runs as shift slices.
                pallas_ok = False
                apply_v = lambda x: m.restrict(
                    eqn_p.apply_ell(x, nbr_e, coef_e, pallas=pallas_ok) * Vn)
            else:
                apply_v = lambda x: m.restrict(eqn_p.apply(x) * Vn)
            if self.p_mg is not None and m.w_own is None:
                # aggregation-AMG V-cycle (AmgX AGGREGATION role); PCG is
                # invariant to scalar scaling of M, so the V-scaled
                # hierarchy preconditions the Vn-scaled system directly
                M_inv = self.p_mg.preconditioner(eqn_p, m.volumes)
                if plan_shape is not None:
                    M_flat = M_inv
                    M_inv = lambda R: M_flat(R.reshape(-1)).reshape(
                        plan_shape)
            elif plan_shape is not None:
                d_inv = 1.0 / jnp.where(jnp.abs(diag_lat) > 1e-300,
                                        diag_lat, 1.0)
                M_inv = lambda r: d_inv * r
            else:
                d_p = eqn_p.diag() * Vn
                d_inv = 1.0 / jnp.where(jnp.abs(d_p) > 1e-300, d_p, 1.0)
                M_inv = lambda r: d_inv * r
            # nonOrthogonal corrector loop (reference pEqn.H `while
            # pimple.correctNonOrthogonal()`, SURVEY §3.1): the implicit
            # operator carries only the over-relaxed orthogonal part; the
            # cross-diffusion k_no . grad_f(p) enters as a deferred source
            # rebuilt from the latest p each pass. On orthogonal meshes
            # (k_no None) the correction is skipped and ONE solve runs —
            # bit-identical to the uncorrected path.
            has_no = (m.k_no is not None
                      or any(pp.k_no is not None for pp in m.patches))
            n_solves = 1 + (cfg.n_nonortho if has_no else 0)
            p_res = None
            for _ in range(n_solves):
                src_no = (laplacian_nonortho_corr_fl(m, rhorAUf, p,
                                                     gamma_b=rhorAU_b)
                          if has_no else 0.0)
                b_p = m.restrict((eqn_p.rhs() + src_no) * Vn)
                if plan_shape is not None:
                    res_p = cg(apply_v, b_p.reshape(plan_shape),
                               p.reshape(plan_shape), M_inv,
                               tol=cfg.p_tol, rel_tol=cfg.p_rel_tol,
                               max_iter=cfg.max_iter_p)
                    p = res_p.x.reshape(-1)
                else:
                    res_p = cg(apply_v, b_p, p,
                               M_inv, tol=cfg.p_tol, rel_tol=cfg.p_rel_tol,
                               max_iter=cfg.max_iter_p)
                    p = res_p.x
                if p_res is None:
                    p_res = res_p.initial_residual
                if stats is not None:
                    stats["iters_p"] = (stats.get("iters_p", 0)
                                        + res_p.iterations)
            # flux reconstruction — includes the non-orthogonal part of the
            # final corrector's face gradient so phi is consistent with the
            # solved equation (OpenFOAM pEqn.flux() includes the correction)
            sng = sngrad_fl(m, p)
            phi = phiH - rhorAUf * sng
            if m.k_no is not None:
                gf_p = face_grad_fl(m, p)
                phi = phi - rhorAUf * jnp.sum(m.k_no * gf_p, axis=1) / m.mag_sf
            phi_b = []
            for ip, p_ in enumerate(m.patches):
                po = p[p_.owner]
                ghost = p_.a * po + p_.b
                phi_b.append(phiH_b[ip]
                             - rhorAU_b[ip] * (ghost - po) / p_.delta)
            phi_b = list(self._fix_boundary_fluxes(phi_b, rho_bf))
            gp = grad_fl(self.m_p, p)
            U = HbyA - rAU[:, None] * gp
            dpdt = (p - p_old) / dt
        rho = rho_old - dt * div_flux_fl(m, phi, phi_b) + dt * src_rho
        return p, phi, tuple(phi_b), U, dpdt, rho, p_res
