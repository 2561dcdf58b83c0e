"""Dump the optimized HLO of the 96^3 chemistry jit and summarize the
biggest top-level fusions (the trace shows 7 fusions carrying ~91 of
116 ms). Prints each named fusion's shapes and op census.

Usage: python tools/dump_chem_hlo.py [--n 96]
"""
import argparse
import functools
import os
import re
import sys
from collections import Counter

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from __graft_entry__ import _build_3d_les


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=96)
    ap.add_argument("--names", default="fusion,fusion.1,fusion.2,fusion.3,"
                    "fusion.4,fusion.5,fusion.6")
    args = ap.parse_args()

    from deepflame_tpu.chemistry.reactor import solve_chemistry
    solver, state = _build_3d_les(n=args.n, dtype=jnp.float32)
    th, kin = solver.thermo, solver.combustion.kinetics
    opts = solver.combustion.ode_opts
    T, p = state.T, state.p
    Yt = jnp.moveaxis(state.Y, 0, -1)
    d0 = state.chem_dt
    dt = 2.5e-7

    f = jax.jit(functools.partial(
        solve_chemistry, th, kin, opts=opts, n_bins=128, fast_tier=True,
        sort="T"))
    txt = f.lower(T, p, Yt, dt, dt_start=d0).compile().as_text()
    with open("/tmp/chem_hlo.txt", "w") as fh:
        fh.write(txt)
    print(f"HLO: {len(txt)} chars -> /tmp/chem_hlo.txt")

    # map: top-level instruction name -> called computation for fusions
    want = set(args.names.split(","))
    # find lines like  %fusion.2 = (...) fusion(...), kind=kLoop, calls=%fused_computation.N
    for m in re.finditer(r"^\s*(?:ROOT )?%?(fusion(?:\.\d+)?) = ([^\n]*)",
                         txt, re.M):
        name, rest = m.group(1), m.group(2)
        if name not in want:
            continue
        cm = re.search(r"calls=%?([\w.-]+)", rest)
        shape = rest.split(" fusion(")[0]
        print(f"\n==== {name}: shape {shape[:160]}")
        if not cm:
            print("   (no calls= found)", rest[:200])
            continue
        comp = cm.group(1)
        # extract that computation's body
        bm = re.search(rf"^%?{re.escape(comp)} [^\n]*\n(.*?)^}}", txt,
                       re.M | re.S)
        if not bm:
            print("   (computation body not found)")
            continue
        body = bm.group(1)
        ops = Counter(re.findall(r"= [\w\[\]\d,{}]+ ([a-z-]+)\(", body))
        print("   ops:", dict(ops.most_common(15)))
        # biggest tensor shapes inside
        shapes = Counter(re.findall(r"f32\[[\d,]+\]", body))
        print("   top shapes:", shapes.most_common(8))


if __name__ == "__main__":
    main()
