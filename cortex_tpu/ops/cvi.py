"""Conjugate-computation variational inference (CVI) — natural-gradient VI.

Khan & Lin (2017): non-conjugate variational inference reduced to conjugate
Bayesian updates.  Each non-conjugate likelihood site ``p(y_i | z_i)``,
``z_i = x_i·w``, is replaced by an adaptively-refit Gaussian pseudo-site
whose natural parameters follow the natural gradient of the ELBO:

    dm_i = E_q[∂_z log p(y_i|z_i)]          (Bonnet's identity)
    dv_i = ½ E_q[∂²_z log p(y_i|z_i)]       (Price's identity)
    λ₂ᵢ ← (1−ρ) λ₂ᵢ + ρ dv_i,   λ₁ᵢ ← (1−ρ) λ₁ᵢ + ρ (dm_i − 2 dv_i μ_i)

after which the global posterior is one *conjugate* Gaussian linear-model
update — a d×d solve.  Expectations are Gauss–Hermite quadrature of the
autodiff'd log-likelihood: the user supplies only ``log_lik(z)``, JAX
supplies the derivatives.  The whole loop is a ``lax.scan`` under ``jit``.

Complements EP (`cortex_tpu.ops.ep`): same model class, different fixed
point — CVI maximizes the ELBO (exact for conjugate sites in one step with
ρ=1), EP moment-matches the tilted marginals.  The reference's processor
interface admits either rule algebra but ships none
(`/root/reference/src/inference_engine.jl:331-477`).
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

__all__ = ["CVIResult", "cvi_linear_model"]


class CVIResult(NamedTuple):
    """Variational posterior over the weights plus the converged site
    naturals.  ``site_lam1``/``site_lam2``: per-site natural parameters of
    the Gaussian pseudo-observations; ``elbo_trace``: Monte-Carlo-free ELBO
    estimates per iteration (quadrature); ``delta``: last natural-parameter
    change (convergence diagnostic)."""

    mean: jax.Array
    cov: jax.Array
    site_lam1: jax.Array
    site_lam2: jax.Array
    elbo_trace: jax.Array
    delta: jax.Array


def cvi_linear_model(
    X: jax.Array,
    log_lik: Callable,
    prior_var: float = 1.0,
    n_iters: int = 60,
    step_size: float = 0.7,
    n_quad: int = 31,
    lam2_floor: float = 1e-8,
) -> CVIResult:
    """Natural-gradient VI for ``w ~ N(0, prior_var·I)``,
    ``y_i ~ p(·| x_i·w)`` with factorizing scalar sites.

    ``X``: ``(n, d)``; ``log_lik(z)`` maps ``(n, k)`` latent values to
    elementwise log-likelihoods (close over ``y``).  Conjugate (Gaussian)
    sites reach the exact posterior in one ρ=1 step; non-conjugate sites
    ascend the ELBO along the natural gradient.
    """
    X = jnp.asarray(X)
    n, d = X.shape
    prior_prec = jnp.eye(d, dtype=X.dtype) / prior_var

    nodes, weights = np.polynomial.hermite_e.hermegauss(n_quad)
    nodes = jnp.asarray(nodes, X.dtype)
    qw = jnp.asarray(weights / np.sqrt(2.0 * np.pi), X.dtype)

    # ``log_lik`` is elementwise over its (n, k) argument, so the gradient of
    # its sum IS the elementwise derivative (each output depends on one
    # input); iterating gives the elementwise second derivative.  This keeps
    # per-site closures over ``y`` intact (no per-scalar re-tracing).
    glog = jax.grad(lambda z: jnp.sum(log_lik(z)))
    hlog = jax.grad(lambda z: jnp.sum(glog(z)))

    def expectations(mu, var):
        sd = jnp.sqrt(var)
        z = mu[:, None] + sd[:, None] * nodes[None, :]  # (n, k)
        e_ll = jnp.sum(log_lik(z) * qw[None, :], axis=1)
        dm = jnp.sum(glog(z) * qw[None, :], axis=1)  # Bonnet
        dv = 0.5 * jnp.sum(hlog(z) * qw[None, :], axis=1)  # Price
        return e_ll, dm, dv

    def posterior(lam1, lam2):
        # Pseudo-precisions w̃ᵢ = −2λ₂ᵢ ≥ floor; pseudo-targets λ₁ᵢ.
        wtil = jnp.maximum(-2.0 * lam2, lam2_floor)
        Sinv = prior_prec + X.T @ (wtil[:, None] * X)
        L = jnp.linalg.cholesky(Sinv)
        m = jax.scipy.linalg.cho_solve((L, True), X.T @ lam1)
        V = jax.scipy.linalg.cho_solve((L, True), X.T)  # (d, n)
        sigma2 = jnp.sum(X * V.T, axis=1)  # marginal vars of z_i
        return m, L, sigma2

    def step(state, _):
        lam1, lam2 = state
        m, L, sigma2 = posterior(lam1, lam2)
        mu = X @ m
        e_ll, dm, dv = expectations(mu, sigma2)
        lam2_new = (1.0 - step_size) * lam2 + step_size * jnp.minimum(
            dv, -0.5 * lam2_floor
        )
        lam1_new = (1.0 - step_size) * lam1 + step_size * (dm - 2.0 * dv * mu)
        # ELBO (up to constants): E[log lik] − KL(q‖prior).
        logdet_Sinv = 2.0 * jnp.sum(jnp.log(jnp.diagonal(L)))
        kl = 0.5 * (
            (m @ m) / prior_var
            + jnp.trace(
                jax.scipy.linalg.cho_solve((L, True), jnp.eye(X.shape[1], dtype=X.dtype))
            )
            / prior_var
            + logdet_Sinv
            + X.shape[1] * jnp.log(prior_var)
            - X.shape[1]
        )
        elbo = jnp.sum(e_ll) - kl
        delta = jnp.maximum(
            jnp.max(jnp.abs(lam1_new - lam1)), jnp.max(jnp.abs(lam2_new - lam2))
        )
        return (lam1_new, lam2_new), (elbo, delta)

    init = (jnp.zeros((n,), X.dtype), jnp.full((n,), -0.5 * lam2_floor, X.dtype))
    (lam1, lam2), (elbos, deltas) = lax.scan(step, init, None, length=n_iters)
    m, L, _ = posterior(lam1, lam2)
    cov = jax.scipy.linalg.cho_solve((L, True), jnp.eye(d, dtype=X.dtype))
    return CVIResult(m, cov, lam1, lam2, elbos, deltas[-1])
