"""Derive an L-stable 4-stage order-4 Rosenbrock (ROS4) coefficient set
with an embedded order-3 error estimate, for the reference-grade chemistry
tier (chemistry/integrator.py).

Direct (autonomous) Rosenbrock form used by the integrator:

    (I - gamma dt J) k_i = f(y + dt sum_{j<i} a_ij k_j)
                           + dt J sum_{j<i} g_ij k_j
    y1 = y + dt sum_i b_i k_i

Order conditions (derived by Taylor expansion; beta_ij = a_ij + g_ij for
j<i, beta_ii = gamma; beta_i = alpha_i + c_i with alpha_i = sum a_ij,
c_i = sum_{j<=i} g~_ij; B_i = sum_{j<=i} beta_ij beta_j;
A_i = sum_{j<i} a_ij beta_j):

  O1: sum b_i             = 1
  O2: sum b_i beta_i      = 1/2
  O3: sum b_i alpha_i^2   = 1/3
  O4: sum b_i B_i         = 1/6
  O5: sum b_i sum_j beta_ij B_j       = 1/24
  O6: sum b_i sum_j beta_ij alpha_j^2 = 1/12
  O7: sum b_i alpha_i A_i = 1/8
  O8: sum b_i alpha_i^3   = 1/4

gamma = 0.5728160624821349 (root of g^4 - 4g^3 + 3g^2 - 2/3 g + 1/24,
the L-stability condition for R(z) = N(z)/(1-gamma z)^4 with N of degree
<= 3).  Structure: a41=a31, a42=a32, a43=0 so F4 = F3 (3 RHS evaluations
for 4 stages).  The embedded order-3 weights need the 4x4 system
[1; beta; alpha^2; B] b^ = [1, 1/2, 1/3, 1/6] to be SINGULAR (else
b^ = b uniquely); det = 0 is imposed as a 9th constraint, and
b^ = b + t * nullvec gives the embedded family.

Run: python tools/derive_ros4.py  -> prints the coefficient block pasted
into chemistry/integrator.py, then verifies observed convergence order on
a stiff nonlinear 3-species system against an f64 reference.
"""
import numpy as np
from scipy.optimize import fsolve

GAMMA = None
# L-stability gamma: root of g^4 - 4g^3 + 3g^2 - (2/3) g + 1/24 in (0.4, 0.8)
roots = np.roots([1.0, -4.0, 3.0, -2.0 / 3.0, 1.0 / 24.0])
for r in roots:
    if abs(r.imag) < 1e-12 and 0.4 < r.real < 0.8:
        GAMMA = float(r.real)
assert GAMMA is not None, roots
print(f"gamma = {GAMMA!r}")


def unpack(z):
    b = z[0:4]
    a31 = z[4]
    g21, g31, g32, g41, g42, g43 = z[5:11]
    a21 = 0.5
    a32 = 1.0 - a31           # alpha3 = alpha4 = 1
    A = np.zeros((4, 4))
    A[1, 0] = a21
    A[2, 0], A[2, 1] = a31, a32
    A[3, 0], A[3, 1], A[3, 2] = a31, a32, 0.0   # F4 = F3
    G = np.zeros((4, 4))
    G[1, 0] = g21
    G[2, 0], G[2, 1] = g31, g32
    G[3, 0], G[3, 1], G[3, 2] = g41, g42, g43
    for i in range(4):
        G[i, i] = GAMMA
    return b, A, G


def tableau(b, A, G):
    beta = A + G                       # beta_ij (incl diag gamma)
    alpha = A.sum(axis=1)
    beta_i = alpha + G.sum(axis=1)
    B = beta @ beta_i
    Av = np.zeros(4)
    for i in range(4):
        Av[i] = sum(A[i, j] * beta_i[j] for j in range(i))
    return beta, alpha, beta_i, B, Av


def conds(z):
    b, A, G = unpack(z)
    beta, alpha, beta_i, B, Av = tableau(b, A, G)
    M = np.stack([np.ones(4), beta_i, alpha ** 2, B])
    return np.array([
        b.sum() - 1.0,
        b @ beta_i - 0.5,
        b @ alpha ** 2 - 1.0 / 3.0,
        b @ B - 1.0 / 6.0,
        b @ (beta @ B) - 1.0 / 24.0,
        b @ (beta @ alpha ** 2) - 1.0 / 12.0,
        b @ (alpha * Av) - 1.0 / 8.0,
        b @ alpha ** 3 - 0.25,
        np.linalg.det(M),              # embedded-family singularity
    ])


from scipy.optimize import least_squares
best = None
best_cost = np.inf
rng = np.random.default_rng(0)
for trial in range(200):
    z0 = rng.uniform(-1.5, 1.5, size=11)
    r = least_squares(conds, z0, xtol=1e-14, ftol=1e-14, gtol=1e-14,
                      max_nfev=2000)
    res = np.abs(conds(r.x)).max()
    # prefer modest coefficient magnitudes (error-constant hygiene)
    if res < 1e-11 and np.abs(r.x).max() < 4.0:
        sz = np.abs(r.x).max()
        if sz < best_cost:
            best, best_cost = r.x, sz
        if sz < 2.0:
            break
assert best is not None, "no solution found"
b, A, G = unpack(best)
beta, alpha, beta_i, B, Av = tableau(b, A, G)
M = np.stack([np.ones(4), beta_i, alpha ** 2, B])
# embedded: b_hat = b + t * v, v in null(M); scale so the estimate is O(1)
_, s, vt = np.linalg.svd(M)
v = vt[-1]
bh = b + v / np.abs(v).max()
print("residuals:", np.abs(conds(best)).max(), " sing.val:", s[-1])
print("b   =", repr(b))
print("bh  =", repr(bh))
print("A   =", repr(A))
print("G   =", repr(G))

# ---- empirical order verification on a stiff nonlinear system (f64)
def f(y):
    # 3-species autocatalytic-ish stiff nonlinear system
    return np.array([
        -0.04 * y[0] + 1e4 * y[1] * y[2] - 0.5 * y[0] * y[1],
        0.04 * y[0] - 1e4 * y[1] * y[2] - 3e7 * y[1] ** 2 + 0.5 * y[0] * y[1],
        3e7 * y[1] ** 2,
    ])


def jac(y):
    return np.array([
        [-0.04 - 0.5 * y[1], 1e4 * y[2] - 0.5 * y[0], 1e4 * y[1]],
        [0.04 + 0.5 * y[1], -1e4 * y[2] - 6e7 * y[1] + 0.5 * y[0],
         -1e4 * y[1]],
        [0.0, 6e7 * y[1], 0.0],
    ])


def ros4_step(y, dt):
    J = jac(y)
    W = np.eye(3) - GAMMA * dt * J
    Wi = np.linalg.inv(W)
    ks = []
    Fs = {}
    for i in range(4):
        g = y + dt * sum(A[i, j] * ks[j] for j in range(i))
        key = tuple(np.round(A[i, :i], 12))
        Fi = f(g)
        rhs = Fi + dt * (J @ sum((G[i, j] * ks[j] for j in range(i)),
                                 np.zeros(3)))
        ks.append(Wi @ rhs)
    y1 = y + dt * sum(b[i] * ks[i] for i in range(4))
    ye = y + dt * sum(bh[i] * ks[i] for i in range(4))
    return y1, y1 - ye


def integrate(y0, t_end, n):
    y = y0.copy()
    dt = t_end / n
    for _ in range(n):
        y, _ = ros4_step(y, dt)
    return y


y0 = np.array([1.0, 1e-4, 0.0])
t_end = 0.2
ref = integrate(y0, t_end, 200000)
errs = []
ns = [50, 100, 200, 400, 800]
for n in ns:
    e = np.linalg.norm(integrate(y0, t_end, n) - ref)
    errs.append(e)
print("orders:", [f"{np.log2(errs[i] / errs[i + 1]):.2f}"
                  for i in range(len(errs) - 1)])
print("errs:", [f"{e:.3e}" for e in errs])
