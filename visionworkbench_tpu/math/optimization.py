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
