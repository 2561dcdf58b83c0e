"""FlaRe-table generation-knob sensitivity probe (VERDICT r3 item 8).

The round-3 Sandia D attribution pinned part of the near-field residual on
the generated table's mid-manifold omgc (the published FlaRe table is not
downloadable in this environment). This tool compares table variants
produced by tools/gen_flare_table.py at the attribution's probe points:
omgc/Tf over the (Z, c) manifold at zero variance, plus the
variance-convolved omgc at the gz/gc levels the Sandia jet actually
samples. If the variants agree at the probes, the residual is OUTSIDE the
generation knobs (discretization of the c axis, flamelet count).

Usage: python tools/probe_table_sensitivity.py base.tbl variant.tbl ...
"""
import sys
import os

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    import jax.numpy as jnp
    from deepflame_tpu.combustion.fgm.table import read_flare_table as read_table, lookup

    paths = sys.argv[1:]
    assert len(paths) >= 2, "need >= 2 tables"
    tables = [(p, read_table(p)) for p in paths]
    Zp = [0.20, 0.275, 0.3528, 0.43, 0.55]
    cp = [0.25, 0.5, 0.75, 1.0]
    print(f"{'table':40s} " + " ".join(
        f"omgc(Z={z:.3f},c={c:.2f})" for z in Zp[:3] for c in cp[1:3]))
    rows = []
    for p, tb in tables:
        vals = []
        for z in Zp[:3]:
            for c in cp[1:3]:
                coords = (None, jnp.asarray([z]), jnp.asarray([c]),
                          jnp.asarray([0.0]), jnp.asarray([0.0]), None)
                vals.append(float(lookup(tb, "omgc", coords)[0]))
        rows.append((p, vals))
        print(f"{os.path.basename(p):40s} "
              + " ".join(f"{v:18.1f}" for v in vals))
    base = np.asarray(rows[0][1])
    for p, vals in rows[1:]:
        rel = np.abs(np.asarray(vals) - base) / np.maximum(np.abs(base), 1.0)
        print(f"max rel dev vs base [{os.path.basename(p)}]: {rel.max():.3f}")
    # variance-convolved probe (the jet samples gz ~ 0.05-0.2)
    print("\nwith variance gz=0.1, gc=0.1:")
    for p, tb in tables:
        vals = []
        for z in Zp[:3]:
            coords = (None, jnp.asarray([z]), jnp.asarray([0.5]),
                      jnp.asarray([0.1]), jnp.asarray([0.1]), None)
            vals.append(float(lookup(tb, "omgc", coords)[0]))
        print(f"{os.path.basename(p):40s} "
              + " ".join(f"{v:12.1f}" for v in vals))


if __name__ == "__main__":
    main()
