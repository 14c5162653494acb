"""Nonlinear optimization (ref ``src/vw/Math/LevenbergMarquardt.h:88``,
``NelderMead.h``, ``ConjugateGradient.h``).

Levenberg-Marquardt is the workhorse (camera solves, transform inversion,
subpixel fits). The reference differentiates numerically; here the Jacobian
comes from ``jax.jacfwd`` — exact and compiled. Simplex/CG wrap SciPy on the
host (they only drive small host-side problems in the reference).
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional

import numpy as np
import jax
import jax.numpy as jnp


class LMResult(NamedTuple):
    x: np.ndarray
    converged: bool
    iterations: int
    final_error: float


def levenberg_marquardt(model_fn: Callable, x0, target,
                        max_iterations: int = 100,
                        rel_tolerance: float = 1e-16,
                        abs_tolerance: float = 1e-16,
                        initial_lambda: float = 0.1) -> LMResult:
    """Minimize ||model_fn(x) - target||^2 (ref ``levenberg_marquardt``,
    LevenbergMarquardt.h:88-214: lambda scaled x10 on failure, /10 on
    success)."""
    x = jnp.asarray(x0, jnp.float64) if jax.config.jax_enable_x64 else jnp.asarray(x0, jnp.float32)
    target = jnp.asarray(target, x.dtype)

    def residual(p):
        return jnp.asarray(model_fn(p), x.dtype).reshape(-1) - target.reshape(-1)

    jac_fn = jax.jacfwd(residual)
    lam = initial_lambda
    err = residual(x)
    norm = float(err @ err)
    converged = False
    it = 0
    for it in range(1, max_iterations + 1):
        j = jac_fn(x)
        jtj = j.T @ j
        jte = j.T @ err
        improved = False
        for _ in range(20):  # inner lambda search
            a = jtj + lam * jnp.diag(jnp.diag(jtj))
            try:
                delta = jnp.linalg.solve(a, jte)
            except Exception:
                break
            x_try = x - delta
            err_try = residual(x_try)
            norm_try = float(err_try @ err_try)
            if norm_try < norm:
                x, err = x_try, err_try
                improvement = abs(norm - norm_try) / max(norm, 1e-300)
                norm = norm_try
                lam = max(lam / 10.0, 1e-15)
                improved = True
                if improvement < rel_tolerance or norm < abs_tolerance:
                    converged = True
                break
            lam *= 10.0
        if not improved or converged:
            converged = converged or not improved
            break
    return LMResult(np.asarray(x, np.float64), converged, it, norm)


def nelder_mead(f: Callable, x0, max_iterations: int = 1000,
                tolerance: float = 1e-8) -> np.ndarray:
    """Downhill simplex (ref ``NelderMead.h``); SciPy host implementation."""
    from scipy.optimize import minimize
    res = minimize(lambda p: float(f(np.asarray(p))), np.asarray(x0, np.float64),
                   method="Nelder-Mead",
                   options={"maxiter": max_iterations, "xatol": tolerance,
                            "fatol": tolerance})
    return res.x


def conjugate_gradient(f: Callable, x0, max_iterations: int = 500,
                       tolerance: float = 1e-8) -> np.ndarray:
    """Nonlinear CG with JAX gradients (ref ``ConjugateGradient.h``)."""
    from scipy.optimize import minimize
    grad = jax.grad(lambda p: jnp.asarray(f(p)).sum())
    res = minimize(lambda p: float(f(jnp.asarray(p, jnp.float32))),
                   np.asarray(x0, np.float64), jac=lambda p: np.asarray(
                       grad(jnp.asarray(p, jnp.float32)), np.float64),
                   method="CG", options={"maxiter": max_iterations, "gtol": tolerance})
    return res.x


def newton_raphson(f: Callable, x0, max_iterations: int = 50,
                   tolerance: float = 1e-12) -> float:
    """Scalar Newton's method with autodiff (ref ``Functions.h`` newton usage)."""
    df = jax.grad(lambda v: jnp.asarray(f(v)).sum())
    x = float(x0)
    for _ in range(max_iterations):
        fx = float(f(x))
        if abs(fx) < tolerance:
            break
        d = float(df(jnp.float32(x)))
        if d == 0:
            break
        x -= fx / d
    return x


def particle_swarm(f: Callable, lower, upper, num_particles: int = 40,
                   iterations: int = 100, seed: int = 0,
                   inertia: float = 0.7, c1: float = 1.5, c2: float = 1.5):
    """Particle swarm minimization over a box (ref ``ParticleSwarm.h``)."""
    rng = np.random.default_rng(seed)
    lower = np.asarray(lower, np.float64)
    upper = np.asarray(upper, np.float64)
    dim = lower.shape[0]
    pos = rng.uniform(lower, upper, (num_particles, dim))
    vel = rng.uniform(-(upper - lower), upper - lower, (num_particles, dim)) * 0.1
    pbest = pos.copy()
    pbest_val = np.array([float(f(p)) for p in pos])
    g = pbest[np.argmin(pbest_val)].copy()
    gval = pbest_val.min()
    for _ in range(iterations):
        r1 = rng.random((num_particles, dim))
        r2 = rng.random((num_particles, dim))
        vel = inertia * vel + c1 * r1 * (pbest - pos) + c2 * r2 * (g - pos)
        pos = np.clip(pos + vel, lower, upper)
        vals = np.array([float(f(p)) for p in pos])
        improved = vals < pbest_val
        pbest[improved] = pos[improved]
        pbest_val[improved] = vals[improved]
        if pbest_val.min() < gval:
            gval = pbest_val.min()
            g = pbest[np.argmin(pbest_val)].copy()
    return g, float(gval)
