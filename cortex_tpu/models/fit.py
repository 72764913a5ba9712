"""Differentiable inference: gradient-based parameter learning.

Every inference program in this framework is a pure JAX function, so the
log evidence is differentiable w.r.t. model parameters — a capability with
no counterpart in the reference (its rules are opaque Julia callables).
Maximum-likelihood system identification for the LGSSM becomes a dozen lines
of gradient ascent through the Kalman-filter scan, batched over replicas and
shardable over a mesh like everything else.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from ..ops.chains import scalar_kalman_update

__all__ = [
    "LGSSMParams",
    "MvLGSSMParams",
    "fit_lgssm_ml",
    "fit_lgssm_em",
    "fit_mv_lgssm_ml",
    "fit_hgf_ml",
]


class LGSSMParams(NamedTuple):
    """Unconstrained parameterization: ``A`` free, noise variances via log."""

    A: jax.Array
    log_Q: jax.Array
    log_R: jax.Array

    @property
    def Q(self) -> jax.Array:
        return jnp.exp(self.log_Q)

    @property
    def R(self) -> jax.Array:
        return jnp.exp(self.log_R)


def _neg_log_evidence(params: LGSSMParams, y: jax.Array, prior) -> jax.Array:
    """Average negative log evidence over replicas (prediction-error
    decomposition — the same scan as ``LGSSM.log_evidence`` but traced with
    the parameters as differentiable inputs)."""
    A, Q, R = params.A, params.Q, params.R
    yT = jnp.moveaxis(jnp.asarray(y), -1, 0)
    pm = jnp.broadcast_to(jnp.asarray(prior[0], y.dtype), yT.shape[1:])
    pv = jnp.broadcast_to(jnp.asarray(prior[1], y.dtype), yT.shape[1:])

    def step(carry, obs):
        m, v = carry
        m_f, v_f, ll = scalar_kalman_update(obs, m, v, 1.0, R)
        return (A * m_f, A * A * v_f + Q), ll

    _, lls = jax.lax.scan(step, (pm, pv), yT)
    return -jnp.mean(jnp.sum(lls, axis=0))


def fit_lgssm_ml(
    y: jax.Array,
    n_steps: int = 500,
    learning_rate: float = 0.05,
    init: LGSSMParams = None,
    prior: Tuple[float, float] = (0.0, 10.0),
) -> Tuple[LGSSMParams, jax.Array]:
    """Maximum-likelihood LGSSM parameters by Adam on the exact log evidence.

    ``y``: ``(..., T)`` observations (replicas pooled into the likelihood).
    Returns the fitted params and the loss trace.  The whole optimization is
    one jitted ``lax.scan`` — gradients flow through the Kalman filter.
    """
    y = jnp.asarray(y)
    if init is None:
        init = LGSSMParams(
            jnp.asarray(0.5), jnp.log(jnp.var(y) / 2 + 1e-3), jnp.log(jnp.var(y) / 2 + 1e-3)
        )

    import optax

    opt = optax.adam(learning_rate)
    loss_grad = jax.value_and_grad(_neg_log_evidence)

    def step(carry, _):
        params, opt_state = carry
        loss, grads = loss_grad(params, y, prior)
        updates, opt_state = opt.update(grads, opt_state)
        params = optax.apply_updates(params, updates)
        return (params, opt_state), loss

    (params, _), losses = jax.lax.scan(
        step, (init, opt.init(init)), None, length=n_steps
    )
    return params, losses


def fit_lgssm_em(
    y: jax.Array,
    n_iters: int = 50,
    init: LGSSMParams = None,
    prior: Tuple[float, float] = (0.0, 10.0),
) -> Tuple[LGSSMParams, jax.Array]:
    """Maximum-likelihood LGSSM parameters (``A``, ``Q``, ``R``; ``H = 1``)
    by expectation-maximization with a *closed-form* M-step.

    The E-step is the RTS smoother plus the lag-one smoothed cross-covariance
    ``Cov(x_{t+1}, x_t | y) = G_t v^s_{t+1}`` (Shumway & Stoffer); the M-step
    pools sufficient statistics over replicas and time.  The whole EM loop is
    one jitted ``lax.scan`` — no line searches, no learning rate, monotone in
    the log evidence.  Complements :func:`fit_lgssm_ml` (Adam on the same
    objective); the reference has no parameter learning at all (its rules are
    fixed closed-form messages, `/root/reference/src/inference_engine.jl:331-477`).

    ``y``: ``(..., T)``; returns ``(params, log_evidence_trace)`` where the
    trace entry ``i`` is the pooled log evidence *under the params entering
    iteration i* (so it is non-decreasing).
    """
    y = jnp.asarray(y)
    yT = jnp.moveaxis(y, -1, 0)  # (T, ...replicas)
    T = yT.shape[0]
    n_obs = yT.size
    n_trans = n_obs - yT[0].size
    pm = jnp.broadcast_to(jnp.asarray(prior[0], y.dtype), yT.shape[1:])
    pv = jnp.broadcast_to(jnp.asarray(prior[1], y.dtype), yT.shape[1:])
    if init is None:
        v = jnp.var(y) / 2 + 1e-3
        init = LGSSMParams(jnp.asarray(0.5, y.dtype), jnp.log(v), jnp.log(v))

    def e_step(A, Q, R):
        def fstep(carry, obs):
            m, v = carry  # predictive belief for this step
            m_f, v_f, ll = scalar_kalman_update(obs, m, v, 1.0, R)
            return (A * m_f, A * A * v_f + Q), (m_f, v_f, ll)

        _, (m_fs, v_fs, lls) = jax.lax.scan(fstep, (pm, pv), yT)

        def bstep(carry, inp):
            m_next, v_next = carry
            m_f, v_f = inp
            v_pred = A * A * v_f + Q
            G = v_f * A / v_pred
            m_s = m_f + G * (m_next - A * m_f)
            v_s = v_f + G * G * (v_next - v_pred)
            return (m_s, v_s), (m_s, v_s, G * v_next)

        _, (m_ss, v_ss, cs) = jax.lax.scan(
            bstep, (m_fs[-1], v_fs[-1]), (m_fs[:-1], v_fs[:-1]), reverse=True
        )
        m_s = jnp.concatenate([m_ss, m_fs[-1:]], axis=0)
        v_s = jnp.concatenate([v_ss, v_fs[-1:]], axis=0)
        return m_s, v_s, cs, jnp.sum(lls)

    def em_iter(params, _):
        A, Q, R = params.A, params.Q, params.R
        m_s, v_s, cs, ll = e_step(A, Q, R)
        ex2 = v_s + m_s**2
        s11 = jnp.sum(ex2[:-1])
        s00 = jnp.sum(ex2[1:])
        s10 = jnp.sum(cs + m_s[1:] * m_s[:-1])
        A_new = s10 / s11
        Q_new = (s00 - 2.0 * A_new * s10 + A_new**2 * s11) / n_trans
        R_new = jnp.sum((yT - m_s) ** 2 + v_s) / n_obs
        new = LGSSMParams(A_new, jnp.log(Q_new), jnp.log(R_new))
        return new, ll

    params, lls = jax.lax.scan(em_iter, init, None, length=n_iters)
    return params, lls


def fit_hgf_ml(
    u: jax.Array,
    n_steps: int = 300,
    learning_rate: float = 0.05,
    init_omega: float = -2.0,
    init_log_theta: float = -3.0,
    kappa: float = 1.0,
    pi_u: float = 10.0,
):
    """Fit the continuous HGF's volatility parameters (ω, θ) by maximizing
    the one-step-ahead predictive likelihood — the standard model-fitting
    objective for hierarchical Gaussian filters, here as plain gradient
    ascent through the filtering scan.

    Returns ``((omega, theta), losses)``.
    """
    import optax

    from .hgf import HGF

    u = jnp.asarray(u)

    def nll(params):
        omega, log_theta = params
        model = HGF(
            kappa=kappa, omega=omega, theta=jnp.exp(log_theta), pi_u=pi_u
        )
        return -jnp.mean(model.log_likelihood(u))

    opt = optax.adam(learning_rate)
    loss_grad = jax.value_and_grad(nll)

    def step(carry, _):
        params, opt_state = carry
        loss, grads = loss_grad(params)
        updates, opt_state = opt.update(grads, opt_state)
        params = optax.apply_updates(params, updates)
        return (params, opt_state), loss

    init = (jnp.asarray(init_omega), jnp.asarray(init_log_theta))
    (params, _), losses = jax.lax.scan(
        step, (init, opt.init(init)), None, length=n_steps
    )
    omega, log_theta = params
    return (omega, jnp.exp(log_theta)), losses


class MvLGSSMParams(NamedTuple):
    """Unconstrained vector-model parameterization: ``A`` free; ``Q``/``R``
    via Cholesky factors of their log-diagonal/free-lower parts so the noise
    covariances stay PD throughout optimization."""

    A: jax.Array  # (d, d)
    q_chol: jax.Array  # (d, d) lower, log-diagonal
    r_chol: jax.Array  # (m, m) lower, log-diagonal

    @staticmethod
    def _expand(chol_param: jax.Array) -> jax.Array:
        L = jnp.tril(chol_param, k=-1) + jnp.diag(jnp.exp(jnp.diagonal(chol_param)))
        return L @ L.T

    @property
    def Q(self) -> jax.Array:
        return self._expand(self.q_chol)

    @property
    def R(self) -> jax.Array:
        return self._expand(self.r_chol)


def fit_mv_lgssm_ml(
    y: jax.Array,
    H: jax.Array,
    d: int,
    n_steps: int = 300,
    learning_rate: float = 0.02,
    init: "MvLGSSMParams | None" = None,
) -> Tuple[MvLGSSMParams, jax.Array]:
    """ML system identification for the vector LGSSM with known ``H``:
    gradient ascent on the prediction-error log evidence
    (:func:`cortex_tpu.ops.chains_mv.mv_lgssm_log_evidence`), batched over
    replica series.  Returns the fitted unconstrained params and the loss
    trace; read ``params.A/Q/R`` for the constrained matrices.
    """
    import optax

    from ..ops.chains_mv import mv_lgssm_log_evidence

    y = jnp.asarray(y)
    H = jnp.asarray(H, y.dtype)
    if init is None:
        init = MvLGSSMParams(
            A=0.5 * jnp.eye(d, dtype=y.dtype),
            q_chol=jnp.zeros((d, d), y.dtype),
            r_chol=jnp.zeros((H.shape[0], H.shape[0]), y.dtype),
        )
    prior = (jnp.zeros((d,), y.dtype), 10.0 * jnp.eye(d, dtype=y.dtype))

    def nll(params: MvLGSSMParams) -> jax.Array:
        return -jnp.mean(
            mv_lgssm_log_evidence(y, params.A, params.Q, H, params.R, prior)
        )

    opt = optax.adam(learning_rate)
    loss_grad = jax.value_and_grad(nll)

    def step(carry, _):
        p, s = carry
        loss, g = loss_grad(p)
        updates, s = opt.update(g, s)
        return (optax.apply_updates(p, updates), s), loss

    (params, _), losses = jax.lax.scan(
        step, (init, opt.init(init)), None, length=n_steps
    )
    return params, losses
