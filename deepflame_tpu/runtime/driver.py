"""Case driver: the solver `main()` time loop as a reusable harness.

Role parity: the reference solver mains (dfLowMachFoam.C:249-533 —
`while runTime.run()`: Courant-adjusted dt, PIMPLE step, runTime.write()
each writeInterval, Info<< step logs) plus the `splittingStrategy` chemistry
mode (chemistry every 2nd step with 2x dt as a fractional step,
YEqn_RR.H:1-50 gated at dfLowMachFoam.C:291-294).
"""
from __future__ import annotations

import dataclasses
import time as _time
from typing import Callable

import jax
import numpy as np

from .checkpoint import save_state, load_state, load_meta, latest_time
from .config import ControlDict

__all__ = ["run_case"]


def run_case(solver, state, control: ControlDict,
             function_objects=None,
             checkpoint_dir: str | None = None,
             splitting: bool = False,
             fields_fn: Callable | None = None,
             log_every: int = 10,
             courant_fn: Callable | None = None,
             restart: bool = False):
    """Run a time loop to control.end_time.

    solver must expose step(state, dt) (or step(state, dt, chemistry_on) when
    splitting); fields_fn(state) -> dict feeds function objects; courant_fn
    (state, dt) -> Co enables adjustable dt (controlDict adjustTimeStep).
    restart=True resumes from the latest checkpoint in checkpoint_dir
    (OpenFOAM `startFrom latestTime`): state, time, the settled adjustable
    dt, and the write schedule all continue where the previous run stopped.
    Returns the final state.
    """
    dt = control.delta_t
    if restart:
        if checkpoint_dir is None or latest_time(checkpoint_dir) is None:
            print("restart requested but no checkpoint found; cold start")
        else:
            state = load_state(checkpoint_dir, state)
            meta = load_meta(checkpoint_dir)
            dt = float(meta.get("dt", dt))
            print(f"restarting from t={meta['time']:.6e} (dt={dt:.3e})")
    t = float(np.asarray(state.time if hasattr(state, "time")
                         else state.gas.time))
    # align the write schedule to the global grid (restart lands mid-grid)
    n_written = int(np.floor(t / control.write_interval + 1e-9))
    next_write = (n_written + 1) * control.write_interval
    step_jit = jax.jit(lambda s, dt_: solver.step(s, dt_))
    if splitting:
        # chemistry every 2nd step with 2x dt (fractional-step splitting)
        cfg_off = dataclasses.replace(solver.config, chemistry=False)
        solver_off = dataclasses.replace(solver, config=cfg_off)
        step_off = jax.jit(lambda s, dt_: solver_off.step(s, dt_))
        cfg_on = dataclasses.replace(solver.config, chemistry_dt_scale=2.0)
        solver_on = dataclasses.replace(solver, config=cfg_on)
        step_jit = jax.jit(lambda s, dt_: solver_on.step(s, dt_))
    i = 0
    t_wall = _time.perf_counter()
    while t < control.end_time - 1e-15:
        if control.adjust_time_step and courant_fn is not None:
            co = float(courant_fn(state, dt))
            if co > 0:
                dt = min(dt * min(control.max_courant / max(co, 1e-12), 1.2),
                         control.end_time - t)
        if splitting and i % 2 == 1:
            state, diag = step_off(state, dt)
        else:
            state, diag = step_jit(state, dt)
        t += dt
        i += 1
        if i % log_every == 0:
            msg = f"t={t:.6e} dt={dt:.3e}"
            for k in ("T_min", "T_max", "continuity_err"):
                if k in diag:
                    msg += f" {k}={float(diag[k]):.6g}"
            print(msg, flush=True)
        if t >= next_write - 1e-15:
            if function_objects is not None and fields_fn is not None:
                function_objects(t, fields_fn(state))
            if checkpoint_dir is not None:
                save_state(checkpoint_dir, state, t, meta={"dt": dt})
            next_write += control.write_interval
    if function_objects is not None:
        function_objects.write()
    print(f"run complete: {i} steps, {_time.perf_counter() - t_wall:.1f}s wall")
    return state
