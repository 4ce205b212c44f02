"""Fixed-grid ODE integrators as single compiled `lax.scan` loops.

The reference integrates the CFM sampling ODE with torchdiffeq's fixed-grid
solvers (``models/base_model.py:235-243``), configured as ``method: rk4,
step_size: 0.05`` in every shipped config, i.e. 20 steps over t in [0, 1].
There, each of the 20 steps is a separate eager GPU launch; here the whole
trajectory is one XLA program: `lax.scan` over the step index with the network
forward inside, so weights stay pinned in HBM/VMEM across steps and XLA overlaps
the per-step work (the BASELINE.md north star).

`method="rk4"` follows torchdiffeq's choice of the Kutta 3/8 rule for its
``rk4`` solver; the classic Runge-Kutta tableau is available as
``rk4_classic``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _euler_step(f, t, dt, y):
    return y + dt * f(t, y)


def _midpoint_step(f, t, dt, y):
    half = f(t + dt / 2, y + (dt / 2) * f(t, y))
    return y + dt * half


def _rk4_38_step(f, t, dt, y):
    # Kutta 3/8 rule (torchdiffeq rk4_alt_step_func)
    k1 = f(t, y)
    k2 = f(t + dt / 3, y + dt * k1 / 3)
    k3 = f(t + dt * 2 / 3, y + dt * (k2 - k1 / 3))
    k4 = f(t + dt, y + dt * (k1 - k2 + k3))
    return y + dt * (k1 + 3 * (k2 + k3) + k4) / 8


def _rk4_classic_step(f, t, dt, y):
    k1 = f(t, y)
    k2 = f(t + dt / 2, y + dt * k1 / 2)
    k3 = f(t + dt / 2, y + dt * k2 / 2)
    k4 = f(t + dt, y + dt * k3)
    return y + dt * (k1 + 2 * k2 + 2 * k3 + k4) / 6


_STEPPERS = {
    "euler": _euler_step,
    "midpoint": _midpoint_step,
    "rk4": _rk4_38_step,
    "rk4_classic": _rk4_classic_step,
}

NET_EVALS_PER_STEP = {"euler": 1, "midpoint": 2, "rk4": 4, "rk4_classic": 4}


def odeint(f, y0, t0=0.0, t1=1.0, method="rk4", step_size=0.05, unroll=5):
    """Integrate dy/dt = f(t, y) from t0 to t1 on a fixed grid.

    Returns y(t1). The number of steps is static (full steps of ``step_size``
    plus one truncated final step, torchdiffeq's fixed-grid semantics), so the
    loop compiles once for a given configuration. ``unroll`` is passed
    to ``lax.scan``; 5 measures ~1% faster than 1 on the ds2 sampler (v5e)
    and plateaus beyond that — sampling programs compile once and then run
    hundreds of batches, so the extra compile time amortizes away. Override
    per-model via ``odeint_kwargs: {options: {unroll: N}}``.
    """
    if method not in _STEPPERS:
        raise ValueError(f"ODE method '{method}' not implemented ({list(_STEPPERS)})")
    stepper = _STEPPERS[method]
    n_full, remainder = _grid_plan(step_size, t0, t1)
    if n_full <= 0 and remainder == 0.0:
        raise ValueError(f"step_size {step_size} too large for interval [{t0}, {t1}]")
    dt = step_size

    ts = t0 + dt * jnp.arange(n_full, dtype=jnp.float32)

    def scan_body(y, t):
        return stepper(f, t, dt, y), None

    y_final, _ = jax.lax.scan(scan_body, y0, ts, unroll=unroll)
    if remainder > 0.0:
        y_final = stepper(f, t0 + dt * n_full, remainder, y_final)
    return y_final


def _grid_plan(step_size: float, t0: float, t1: float) -> tuple[int, float]:
    """(n_full_steps, truncated_remainder) of the fixed grid — torchdiffeq
    semantics: full steps of ``step_size``, plus one truncated final step when
    the step size does not divide the interval (its grid is
    t0 + step_size * arange(...) with the last point clamped to t1) — NOT n
    equal steps of a rounded size. Single source of truth for both
    :func:`odeint` and :func:`grid_steps` so net_evals_per_sample accounting
    can never drift from the executed eval count."""
    span = t1 - t0
    if step_size <= 0 or span <= 0:
        raise ValueError(f"step_size {step_size} too large for interval [{t0}, {t1}]")
    n_full = int(span / step_size + 1e-9)
    remainder = span - n_full * step_size
    if remainder < 1e-9 * max(1.0, abs(span)):
        remainder = 0.0
    return n_full, remainder


def grid_steps(step_size: float, t0: float = 0.0, t1: float = 1.0) -> int:
    """Number of stepper invocations odeint() makes for this grid."""
    n_full, remainder = _grid_plan(step_size, t0, t1)
    return n_full + (1 if remainder > 0.0 else 0)


def parse_odeint_kwargs(odeint_kwargs: dict | None) -> dict:
    """Translate the reference's torchdiffeq kwargs layout
    (``{method: rk4, options: {step_size: 0.05}}``) into odeint() arguments."""
    odeint_kwargs = dict(odeint_kwargs or {})
    out = {"method": odeint_kwargs.get("method", "rk4")}
    options = odeint_kwargs.get("options") or {}
    if "step_size" in options:
        out["step_size"] = float(options["step_size"])
    if "unroll" in options:
        out["unroll"] = int(options["unroll"])
    return out
