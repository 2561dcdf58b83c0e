"""Riemann flux schemes for the density-based solver, vectorized per face.

Role parity: /root/reference/src/fluxSchemes/ — the runtime-selectable
`fluxScheme` family: HLLC (HLLC.C:70-225, Roe-averaged wave speeds :104-105),
HLLCP (low-Mach pressure-fix variant, HLLCP.C), AUSMDV (AUSMDV.C), and the
central-upwind Kurganov/Tadmor pair (Kurganov.C, Tadmor.C).

TPU-first: the reference computes fluxes one face at a time through a virtual
call per face (fluxScheme.H:81 calculateFluxes); here each scheme is a pure
function over whole face arrays (all faces of one axis at once) — pure VPU
elementwise work, fused by XLA into the reconstruction and update.

States passed in are primitives already MUSCL-reconstructed to the two sides
of each face: rho, u (normal), v, w (tangential), p, E (total energy per unit
mass, absolute internal + kinetic), a (sound speed), Y (species, trailing).
Returned fluxes: (mass, mom_n, mom_t1, mom_t2, energy, species) per face.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["hllc_flux", "hllcp_flux", "ausmdv_flux", "kurganov_flux",
           "tadmor_flux", "FLUX_SCHEMES"]


def _star_flux(rho, u, v, w, p, E, Y, S, S_star, q):
    """HLLC star-region flux correction F* = F + S (U* - U) for one side."""
    coef = rho * (S - u) / (S - S_star)
    # U* components
    r_s = coef
    ru_s = coef * S_star
    rv_s = coef * v
    rw_s = coef * w
    E_s = coef * (E + (S_star - u) * (S_star + p / (rho * (S - u))))
    # conservative state and physical flux on this side
    r, ru, rv, rw = rho, rho * u, rho * v, rho * w
    rE = rho * E
    F_r = rho * u
    F_ru = rho * u * u + p
    F_rv = rho * u * v
    F_rw = rho * u * w
    F_E = u * (rE + p)
    mass = F_r + S * (r_s - r)
    momn = F_ru + S * (ru_s - ru)
    momt1 = F_rv + S * (rv_s - rv)
    momt2 = F_rw + S * (rw_s - rw)
    ener = F_E + S * (E_s - rE)
    # species ride the star mass flux
    Yflux = Y * (F_r + S * (r_s - r))[..., None]
    return mass, momn, momt1, momt2, ener, Yflux


def _physical_flux(rho, u, v, w, p, E, Y):
    mass = rho * u
    return (mass, rho * u * u + p, rho * u * v, rho * u * w,
            u * (rho * E + p), Y * mass[..., None])


def hllc_flux(L, R, pressure_fix: bool = False):
    """HLLC approximate Riemann solver (Toro), Roe-averaged wave speeds.

    L, R: dicts with rho, u, v, w, p, E, a, Y. Returns the 6-tuple of fluxes.
    pressure_fix=True gives HLLCP: the acoustic pressure-difference dissipation
    is scaled by the local Mach number, suppressing low-Mach pressure
    oscillations (the fix HLLCP.C adopts from detonationFoam).
    """
    rhoL, uL, pL, EL, aL, YL = L["rho"], L["u"], L["p"], L["E"], L["a"], L["Y"]
    rhoR, uR, pR, ER, aR, YR = R["rho"], R["u"], R["p"], R["E"], R["a"], R["Y"]
    vL, wL, vR, wR = L["v"], L["w"], R["v"], R["w"]

    # Roe averages for wave-speed estimates
    sL = jnp.sqrt(rhoL)
    sR = jnp.sqrt(rhoR)
    inv = 1.0 / (sL + sR)
    u_roe = (sL * uL + sR * uR) * inv
    a_roe = jnp.sqrt((sL * aL**2 + sR * aR**2) * inv
                     + 0.5 * sL * sR * inv * inv * (uR - uL) ** 2)
    S_L = jnp.minimum(uL - aL, u_roe - a_roe)
    S_R = jnp.maximum(uR + aR, u_roe + a_roe)

    dp = pR - pL
    if pressure_fix:
        # scale the pressure-jump contribution to the contact speed by the
        # face Mach number (low-Mach anti-dissipation)
        mach = jnp.maximum(jnp.abs(uL) / aL, jnp.abs(uR) / aR)
        dp = dp * jnp.minimum(1.0, mach)

    num = (dp + rhoL * uL * (S_L - uL) - rhoR * uR * (S_R - uR))
    den = (rhoL * (S_L - uL) - rhoR * (S_R - uR))
    S_star = num / jnp.where(jnp.abs(den) > 1e-300, den, 1e-300)

    FL = _physical_flux(rhoL, uL, vL, wL, pL, EL, YL)
    FR = _physical_flux(rhoR, uR, vR, wR, pR, ER, YR)
    FsL = _star_flux(rhoL, uL, vL, wL, pL, EL, YL, S_L, S_star, uL)
    FsR = _star_flux(rhoR, uR, vR, wR, pR, ER, YR, S_R, S_star, uR)

    def select(fl, fsl, fsr, fr):
        expand = fl.ndim > S_L.ndim
        sl = S_L[..., None] if expand else S_L
        ss = S_star[..., None] if expand else S_star
        sr = S_R[..., None] if expand else S_R
        return jnp.where(sl >= 0, fl,
                         jnp.where(ss >= 0, fsl,
                                   jnp.where(sr >= 0, fsr, fr)))

    return tuple(select(fl, fsl, fsr, fr)
                 for fl, fsl, fsr, fr in zip(FL, FsL, FsR, FR))


def hllcp_flux(L, R):
    return hllc_flux(L, R, pressure_fix=True)


def ausmdv_flux(L, R):
    """AUSMDV flux-vector/difference splitting (Wada & Liou 1997 blend)."""
    rhoL, uL, pL, EL, YL = L["rho"], L["u"], L["p"], L["E"], L["Y"]
    rhoR, uR, pR, ER, YR = R["rho"], R["u"], R["p"], R["E"], R["Y"]
    vL, wL, vR, wR = L["v"], L["w"], R["v"], R["w"]
    am = jnp.maximum(L["a"], R["a"])

    alphaL = 2.0 * (pL / rhoL) / (pL / rhoL + pR / rhoR)
    alphaR = 2.0 * (pR / rhoR) / (pL / rhoL + pR / rhoR)

    # split velocities (AUSMD)
    def u_plus(u, alpha):
        sub = alpha * ((u + am) ** 2 / (4 * am) - 0.5 * (u + jnp.abs(u))) \
            + 0.5 * (u + jnp.abs(u))
        return jnp.where(jnp.abs(u) <= am, sub, 0.5 * (u + jnp.abs(u)))

    def u_minus(u, alpha):
        sub = -alpha * ((u - am) ** 2 / (4 * am) + 0.5 * (u - jnp.abs(u))) \
            + 0.5 * (u - jnp.abs(u))
        return jnp.where(jnp.abs(u) <= am, sub, 0.5 * (u - jnp.abs(u)))

    def p_plus(u, p):
        sub = p * (u + am) ** 2 * (2.0 - u / am) / (4 * am**2)
        return jnp.where(jnp.abs(u) <= am, sub,
                         p * 0.5 * (1.0 + jnp.sign(u)))

    def p_minus(u, p):
        sub = p * (u - am) ** 2 * (2.0 + u / am) / (4 * am**2)
        return jnp.where(jnp.abs(u) <= am, sub,
                         p * 0.5 * (1.0 - jnp.sign(u)))

    up = u_plus(uL, alphaL)
    um = u_minus(uR, alphaR)
    p_half = p_plus(uL, pL) + p_minus(uR, pR)
    mass = up * rhoL + um * rhoR

    # AUSMV / AUSMD momentum blend switch on pressure gradient
    s = jnp.clip(10.0 * jnp.abs(pR - pL) / jnp.minimum(pL, pR), 0.0, 1.0) * 0.5
    momn_ausmv = up * rhoL * uL + um * rhoR * uR
    momn_ausmd = 0.5 * (mass * (uL + uR) - jnp.abs(mass) * (uR - uL))
    momn = (0.5 + s) * momn_ausmv + (0.5 - s) * momn_ausmd + p_half

    half = 0.5 * (mass + jnp.abs(mass))
    halfm = 0.5 * (mass - jnp.abs(mass))
    momt1 = half * vL + halfm * vR
    momt2 = half * wL + halfm * wR
    HL = EL + pL / rhoL
    HR = ER + pR / rhoR
    ener = half * HL + halfm * HR
    Yflux = half[..., None] * YL + halfm[..., None] * YR
    return mass, momn, momt1, momt2, ener, Yflux


def _central_upwind(L, R, knp: bool):
    """Kurganov(-Noelle-Petrova) central-upwind flux (rhoCentralFoam family)."""
    rhoL, uL, pL, EL, YL = L["rho"], L["u"], L["p"], L["E"], L["Y"]
    rhoR, uR, pR, ER, YR = R["rho"], R["u"], R["p"], R["E"], R["Y"]
    ap = jnp.maximum(jnp.maximum(uL + L["a"], uR + R["a"]), 0.0)
    am = jnp.minimum(jnp.minimum(uL - L["a"], uR - R["a"]), 0.0)
    FL = _physical_flux(rhoL, uL, L["v"], L["w"], pL, EL, YL)
    FR = _physical_flux(rhoR, uR, R["v"], R["w"], pR, ER, YR)
    UL = (rhoL, rhoL * uL, rhoL * L["v"], rhoL * L["w"], rhoL * EL,
          YL * rhoL[..., None])
    UR = (rhoR, rhoR * uR, rhoR * R["v"], rhoR * R["w"], rhoR * ER,
          YR * rhoR[..., None])
    if knp:
        d = 1.0 / jnp.maximum(ap - am, 1e-300)
        out = []
        for fl, fr, ul, ur in zip(FL, FR, UL, UR):
            if fl.ndim > ap.ndim:
                a_p, a_m, dd = ap[..., None], am[..., None], d[..., None]
            else:
                a_p, a_m, dd = ap, am, d
            out.append((a_p * fl - a_m * fr) * dd + a_p * a_m * dd * (ur - ul))
        return tuple(out)
    # Kurganov-Tadmor: symmetric max speed
    a_max = jnp.maximum(ap, -am)
    out = []
    for fl, fr, ul, ur in zip(FL, FR, UL, UR):
        aa = a_max[..., None] if fl.ndim > a_max.ndim else a_max
        out.append(0.5 * (fl + fr) - 0.5 * aa * (ur - ul))
    return tuple(out)


def kurganov_flux(L, R):
    return _central_upwind(L, R, knp=True)


def tadmor_flux(L, R):
    return _central_upwind(L, R, knp=False)


FLUX_SCHEMES = {
    "HLLC": hllc_flux,
    "HLLCP": hllcp_flux,
    "AUSMDV": ausmdv_flux,
    "Kurganov": kurganov_flux,
    "Tadmor": tadmor_flux,
}
