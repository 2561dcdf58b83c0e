"""Checkpoint / restart of solver state pytrees.

Role parity: OpenFOAM field IO inherited by the reference — every field is an
IOobject written each writeInterval and restart reads latestTime
(SURVEY.md §5 "Checkpoint / resume"; createFields.H:17-27, dfLowMachFoam.C:533).
Here the state is one pytree: bit-exact save/load via npz (with orbax
available as an alternative for multi-host runs).
"""
from __future__ import annotations

import json
import os
from typing import Any

import jax
import numpy as np

__all__ = ["save_state", "load_state", "load_meta", "latest_time"]


def save_state(directory: str, state: Any, time: float, meta: dict | None = None):
    """Write state pytree to <directory>/<time>/state.npz + meta.json."""
    tdir = os.path.join(directory, f"{time:.9g}")
    os.makedirs(tdir, exist_ok=True)
    leaves, treedef = jax.tree.flatten(state)
    arrays = {f"leaf_{i}": np.asarray(x) for i, x in enumerate(leaves)}
    np.savez(os.path.join(tdir, "state.npz"), **arrays)
    with open(os.path.join(tdir, "meta.json"), "w") as f:
        json.dump({"time": time, "n_leaves": len(leaves),
                   "treedef": str(treedef), **(meta or {})}, f)
    return tdir


def load_state(directory: str, like: Any, time: float | str = "latest") -> Any:
    """Read a checkpoint into the structure of `like` (bit-exact restart)."""
    if time == "latest":
        time = latest_time(directory)
        if time is None:
            raise FileNotFoundError(f"no checkpoints in {directory}")
    tdir = os.path.join(directory, f"{float(time):.9g}")
    data = np.load(os.path.join(tdir, "state.npz"))
    leaves, treedef = jax.tree.flatten(like)
    assert len(leaves) == len(data.files), \
        f"checkpoint has {len(data.files)} leaves, state needs {len(leaves)}"
    new_leaves = [jax.numpy.asarray(data[f"leaf_{i}"], leaves[i].dtype
                                    if hasattr(leaves[i], "dtype") else None)
                  for i in range(len(leaves))]
    return jax.tree.unflatten(treedef, new_leaves)


def load_meta(directory: str, time: float | str = "latest") -> dict:
    """Read a checkpoint's meta.json (carries e.g. the adjustable dt at
    write time so restarts resume with the settled step size)."""
    if time == "latest":
        time = latest_time(directory)
        if time is None:
            raise FileNotFoundError(f"no checkpoints in {directory}")
    tdir = os.path.join(directory, f"{float(time):.9g}")
    with open(os.path.join(tdir, "meta.json")) as f:
        return json.load(f)


def latest_time(directory: str) -> float | None:
    if not os.path.isdir(directory):
        return None
    times = []
    for d in os.listdir(directory):
        try:
            times.append(float(d))
        except ValueError:
            pass
    return max(times) if times else None
