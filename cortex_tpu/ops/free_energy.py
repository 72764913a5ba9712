"""Variational / Bethe free energy — generic helpers.

The reference computes no free energy (SURVEY.md §5); convergence is sweep
quiescence.  Here free energy is first-class: the model families track their
ELBOs in closed form (HMM: ``logZ − KL``; GMM: full Bishop decomposition;
LGSSM: exact log-evidence), and this module provides the generic pieces:

- :func:`elbo_conjugate` — the structured-VMP identity
  ``ELBO = log Z̃ − Σ KL(q(θ) ‖ p(θ))`` for conjugate models whose E-step is
  exact under expected-log parameters,
- :func:`bethe_free_energy_chain` — the Bethe free energy of a Gaussian
  chain from its BP messages/marginals (exact −log Z on trees),
- reductions across replica meshes are plain ``sum``/``psum`` of the
  per-replica values.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp


__all__ = ["elbo_conjugate", "bethe_free_energy_chain"]


def elbo_conjugate(log_evidence_tilde: jax.Array, *kl_terms: jax.Array) -> jax.Array:
    """``ELBO = log Z̃ − Σ KL`` (see :mod:`cortex_tpu.models.hmm` for the
    derivation); inputs broadcast across replica axes."""
    out = log_evidence_tilde
    for kl in kl_terms:
        out = out - kl
    return out


def bethe_free_energy_chain(
    obs_xi: jax.Array,
    obs_w: jax.Array,
    Q: float,
    A: float = 1.0,
) -> jax.Array:
    """Bethe free energy of a scalar Gaussian chain, shape ``(...)``.

    For tree graphs the Bethe free energy equals the exact negative log
    evidence, which for the chain is a closed-form functional of the
    observation messages alone (``(..., T)`` information-form arrays):
    computed via the prediction-error decomposition.  Usable as a
    convergence/monitoring scalar per replica.
    """
    # Reconstruct observations and their noise from the obs messages:
    # xi = H y / R_, w = H^2 / R_ with H=1: y = xi/w, R_ = 1/w.
    y = obs_xi / obs_w
    R_ = 1.0 / obs_w
    T = y.shape[-1]
    yT = jnp.moveaxis(y, -1, 0)
    RT = jnp.moveaxis(R_, -1, 0)

    # Prediction-error decomposition with the no-prior chain convention:
    # filtered_1 = obs_1; subsequent predictions via the transition.
    m = yT[0]
    v = RT[0]
    ll = jnp.zeros(y.shape[:-1], y.dtype)

    def body(carry, inp):
        m, v, ll = carry
        y_t, r_t = inp
        pm, pv = A * m, A * A * v + Q
        s = pv + r_t
        ll = ll - 0.5 * (jnp.log(2.0 * jnp.pi * s) + (y_t - pm) ** 2 / s)
        k = pv / s
        m_f = pm + k * (y_t - pm)
        v_f = pv - k * pv
        return (m_f, v_f, ll), None

    (m, v, ll), _ = jax.lax.scan(body, (m, v, ll), (yT[1:], RT[1:]))
    # Free energy = -log p(y_2..T | y_1) under the chain (y_1 anchors the
    # no-prior convention, mirroring the BP wiring).
    return -ll
