"""Vector-state LGSSM smoothing: time-parallel associative scan with matrices.

Generalizes :mod:`cortex_tpu.ops.chains` to d-dimensional states and
m-dimensional observations:

    x_t = A x_{t-1} + N(0, Q),    y_t = H x_t + N(0, R)

using the parallel Kalman filter/smoother elements (Särkkä &
García-Fernández 2020) with matrix combines — ``d×d`` solves and matmuls that
map onto the MXU when batched over replicas.  The multivariate counterpart of
the reference's 2-D joint-marginal computations
(``test/inference_engine_tests.jl:949-979``), lifted to whole chains.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
from jax import lax

__all__ = [
    "MvChainMarginals",
    "MvSmootherOperator",
    "mv_lgssm_filter",
    "mv_lgssm_log_evidence",
    "mv_lgssm_smooth",
    "mv_lgssm_smooth_seq",
    "mv_lgssm_smooth_matmul",
    "mv_lgssm_smoother_operator",
]


class MvChainMarginals(NamedTuple):
    mean: jax.Array  # (..., T, d)
    cov: jax.Array  # (..., T, d, d)


class _Elem(NamedTuple):
    A: jax.Array
    b: jax.Array
    C: jax.Array
    eta: jax.Array
    J: jax.Array


def _solve_small(M: jax.Array, B: jax.Array, pivot: bool = True) -> jax.Array:
    """Batched ``solve(M, B)`` for small static ``d`` via unrolled
    Gauss-Jordan.

    ``jnp.linalg.solve`` lowers to an LU custom call; instantiated dozens of
    times inside an unrolled ``associative_scan`` it produced a 473-second
    XLA compile at the bench shape on the v5e tunnel — heavy enough to crash
    the remote TPU worker outright.  For the d ≤ 16 systems of the smoother
    combines, ``d`` unrolled elimination steps of pure vector ops compile in
    seconds and batch over replicas on the VPU.  Falls back to the LU path
    above d = 32.

    ``pivot=False`` drops the partial-pivoting row swaps (the argmax +
    row-gather per step is the remaining compile cost: measured 32 s vs 5 s
    for a 100-step assoc-scan of combines on the v5e tunnel).  Only valid
    when every leading principal pivot is structurally nonzero — true for
    the smoother's systems: ``M = I + C @ J`` with C, J PSD has eigenvalues
    ≥ 1, and predicted covariances are SPD.  The general default pivots."""
    d = M.shape[-1]
    if d > 32:
        return jnp.linalg.solve(M, B)
    aug = jnp.concatenate([M, B], axis=-1)  # (..., d, d+k)
    idx = jnp.arange(d)
    for i in range(d):
        if pivot:
            col = jnp.abs(aug[..., :, i])
            col = jnp.where(idx >= i, col, -jnp.inf)  # among rows >= i
            p = jnp.argmax(col, axis=-1)[..., None]  # (..., 1)
            perm = jnp.where(idx == i, p, jnp.where(idx == p, i, idx))
            aug = jnp.take_along_axis(aug, perm[..., :, None], axis=-2)
        piv_row = aug[..., i : i + 1, :]
        piv_row = piv_row / piv_row[..., :, i : i + 1]
        factors = aug[..., :, i : i + 1]
        is_i = (idx == i)[:, None]
        aug = jnp.where(is_i, piv_row, aug - factors * piv_row)
    return aug[..., :, d:]


def _solve_small_logdet(M: jax.Array, B: jax.Array):
    """Pivotless :func:`_solve_small` that also returns ``log |det M|``
    (the running product of elimination pivots) — the Kalman update needs
    ``S⁻¹`` systems AND ``log det S`` for the evidence, and this gets both
    from one elimination with zero LU/Cholesky custom calls.  Requires the
    structurally-nonzero-pivot condition of ``pivot=False`` (S is SPD)."""
    d = M.shape[-1]
    aug = jnp.concatenate([M, B], axis=-1)
    idx = jnp.arange(d)
    logdet = jnp.zeros(M.shape[:-2], M.dtype)
    for i in range(d):
        piv = aug[..., i, i]
        logdet = logdet + jnp.log(jnp.abs(piv))
        piv_row = aug[..., i : i + 1, :] / piv[..., None, None]
        factors = aug[..., :, i : i + 1]
        is_i = (idx == i)[:, None]
        aug = jnp.where(is_i, piv_row, aug - factors * piv_row)
    return aug[..., :, d:], logdet


def _combine(e1: _Elem, e2: _Elem) -> _Elem:
    """Matrix filtering combine (Särkkä 2020 eq. 10); e1 earlier, e2 later."""
    d = e1.A.shape[-1]
    I = jnp.eye(d, dtype=e1.A.dtype)
    M = I + e1.C @ e2.J  # (..., d, d)
    # One shared elimination for the three M-systems (stack on the k axis).
    rhs = jnp.concatenate(
        [
            e1.A,
            (e1.b + (e1.C @ e2.eta[..., None])[..., 0])[..., None],
            e1.C,
        ],
        axis=-1,
    )
    sol = _solve_small(M, rhs, pivot=False)
    MA, Mb, MC = sol[..., :d], sol[..., d : d + 1], sol[..., d + 1 :]
    A = e2.A @ MA
    b = (e2.A @ Mb)[..., 0] + e2.b
    C = e2.A @ MC @ _mT(e2.A) + e2.C
    Mt = I + e2.J @ e1.C
    rhs_t = jnp.concatenate(
        [(e2.eta - (e2.J @ e1.b[..., None])[..., 0])[..., None], e2.J],
        axis=-1,
    )
    sol_t = _solve_small(Mt, rhs_t, pivot=False)
    eta = (_mT(e1.A) @ sol_t[..., :1])[..., 0] + e1.eta
    J = _mT(e1.A) @ sol_t[..., 1:] @ e1.A + e1.J
    return _Elem(A, b, C, eta, J)


class _SElem(NamedTuple):
    E: jax.Array
    g: jax.Array
    L: jax.Array


def _scombine(e1: _SElem, e2: _SElem) -> _SElem:
    """Smoother combine, reverse direction; e1 later (closer to T), e2
    earlier."""
    return _SElem(
        e2.E @ e1.E,
        (e2.E @ e1.g[..., None])[..., 0] + e2.g,
        e2.E @ e1.L @ _mT(e2.E) + e2.L,
    )


def _mT(x: jax.Array) -> jax.Array:
    return jnp.swapaxes(x, -1, -2)


def mv_lgssm_smooth(
    y: jax.Array,
    A: jax.Array,
    Q: jax.Array,
    H: jax.Array,
    R: jax.Array,
    prior: Tuple[jax.Array, jax.Array],
) -> MvChainMarginals:
    """Exact RTS-equivalent marginals for a vector-state LGSSM.

    Parameters
    ----------
    y: ``(..., T, m)`` observations (leading axes = replicas).
    A, Q: ``(d, d)`` transition matrix / noise covariance.
    H: ``(m, d)`` observation matrix; R: ``(m, m)`` observation noise.
    prior: ``(m0 (d,), P0 (d, d))`` prior on the first state.

    Time-parallel: O(log T) depth via two associative scans.
    """
    y = jnp.asarray(y)
    A, Q, H, R = map(jnp.asarray, (A, Q, H, R))
    m0, P0 = map(jnp.asarray, prior)
    d = A.shape[-1]
    T = y.shape[-2]
    # Missing observations: a time step whose vector contains any NaN is
    # treated as fully unobserved (its filtering element degenerates to the
    # pure prediction (A, 0, Q, 0, 0)).  Partial (per-component) missingness
    # is not supported on this path.
    observed = ~jnp.any(jnp.isnan(y), axis=-1)  # (..., T)
    y = jnp.where(observed[..., None], y, 0.0)
    obsT = jnp.moveaxis(observed, -1, 0)  # (T, ...)
    yT = jnp.moveaxis(y, -2, 0)  # (T, ..., m)
    batch = yT.shape[1:-1]
    I = jnp.eye(d, dtype=y.dtype)

    # Generic elements (t >= 2); identical for all steps except the data term.
    S = H @ Q @ _mT(H) + R  # (m, m)
    K = _mT(_solve_small(_mT(S), H @ _mT(Q), pivot=False))  # Q Hᵀ S⁻¹, (d, m)
    IKH = I - K @ H
    A_g = IKH @ A
    C_g = IKH @ Q
    HtSi = _mT(_solve_small(_mT(S), H, pivot=False))  # Hᵀ S⁻¹, (d?, m) -> (d, m)... (m,d)ᵀ
    eta_coef = _mT(A) @ HtSi  # (d, m)
    J_g = _mT(A) @ HtSi @ H @ A  # (d, d)

    b_g = jnp.einsum("dm,t...m->t...d", K, yT[1:])
    eta_g = jnp.einsum("dm,t...m->t...d", eta_coef, yT[1:])

    def bcast(mat, leading):
        return jnp.broadcast_to(mat, leading + mat.shape)

    n_rest = (T - 1,) + batch
    mrest = obsT[1:][..., None, None]  # (T-1, ..., 1, 1)
    elems_rest = _Elem(
        jnp.where(mrest, bcast(A_g, n_rest), jnp.broadcast_to(A, n_rest + A.shape)),
        jnp.where(mrest[..., 0], b_g, 0.0),
        jnp.where(mrest, bcast(C_g, n_rest), jnp.broadcast_to(Q, n_rest + Q.shape)),
        jnp.where(mrest[..., 0], eta_g, 0.0),
        jnp.where(mrest, bcast(J_g, n_rest), 0.0),
    )

    # First element: filtered belief of x_1 under the prior (prior alone if
    # the first observation is missing).
    S1 = H @ P0 @ _mT(H) + R
    K1 = _mT(_solve_small(_mT(S1), H @ _mT(P0), pivot=False))  # P0 Hᵀ S1⁻¹
    m1 = obsT[0][..., None, None]
    b1 = m0 + jnp.where(
        m1[..., 0], jnp.einsum("dm,...m->...d", K1, yT[0] - H @ m0), 0.0
    )
    C1 = jnp.where(m1, (I - K1 @ H) @ P0, P0)
    zeros_d = jnp.zeros(batch + (d,), y.dtype)
    zeros_dd = jnp.zeros(batch + (d, d), y.dtype)
    elem1 = _Elem(
        zeros_dd,
        jnp.broadcast_to(b1, batch + (d,)),
        jnp.broadcast_to(C1, batch + (d, d)),
        zeros_d,
        zeros_dd,
    )

    elems = jax.tree_util.tree_map(
        lambda a, rest: jnp.concatenate([a[None], rest], axis=0), elem1, elems_rest
    )

    filtered = lax.associative_scan(_combine, elems, axis=0)
    fm, fP = filtered.b, filtered.C  # (T, ..., d), (T, ..., d, d)

    # Smoother elements.
    Pp = A @ fP[:-1] @ _mT(A) + Q  # predicted covs
    G = _mT(_solve_small(_mT(Pp), A @ _mT(fP[:-1]), pivot=False))  # P_f Aᵀ Pp⁻¹
    g = fm[:-1] - jnp.einsum("t...ij,t...j->t...i", G @ A, fm[:-1])
    L = fP[:-1] - G @ Pp @ _mT(G)
    selems = _SElem(
        jnp.concatenate([G, jnp.zeros_like(G[:1])], axis=0),
        jnp.concatenate([g, fm[-1:]], axis=0),
        jnp.concatenate([L, fP[-1:]], axis=0),
    )
    smoothed = lax.associative_scan(_scombine, selems, axis=0, reverse=True)
    return MvChainMarginals(
        jnp.moveaxis(smoothed.g, 0, -2), jnp.moveaxis(smoothed.L, 0, -3)
    )


def _mv_filter_scan(y, A, Q, H, R, prior):
    """Shared sequential filter: returns (means, covs, loglik-per-step).

    Sequential `lax.scan` (the associative path above serves smoothing; the
    evidence needs the per-step innovation terms anyway).  NaN steps (any
    component) skip the update and contribute zero log-likelihood.
    """
    y = jnp.asarray(y)
    A, Q, H, R = map(lambda a: jnp.asarray(a, y.dtype), (A, Q, H, R))
    m0 = jnp.asarray(prior[0], y.dtype)
    P0 = jnp.asarray(prior[1], y.dtype)
    d = A.shape[-1]
    mdim = H.shape[-2]
    observed = ~jnp.any(jnp.isnan(y), axis=-1)
    y = jnp.where(observed[..., None], y, 0.0)
    yT = jnp.moveaxis(y, -2, 0)
    obsT = jnp.moveaxis(observed, -1, 0)
    batch = yT.shape[1:-1]

    def update(mean, P, obs, mask):
        # One pivotless Gauss-Jordan elimination of the SPD innovation
        # system yields S⁻¹innov, S⁻¹HP, and log det S together — replacing
        # the Cholesky + two triangular-solve custom calls that dominated
        # the sequential filter's runtime on TPU (1.9 ms/step at
        # (4096, d=4); custom calls serialize per step inside lax.scan).
        S = H @ P @ _mT(H) + R  # (..., m, m)
        innov = obs - jnp.einsum("md,...d->...m", H, mean)
        PHt = P @ jnp.broadcast_to(_mT(H), P.shape[:-2] + (d, mdim))
        rhs = jnp.concatenate([innov[..., None], _mT(PHt)], axis=-1)
        sol, logdetS = _solve_small_logdet(
            jnp.broadcast_to(S, innov.shape[:-1] + (mdim, mdim)), rhs
        )
        u = sol[..., 0]  # S⁻¹ innov
        SiHP = sol[..., 1:]  # S⁻¹ H P, (..., m, d)
        ll = (
            -0.5 * jnp.sum(innov * u, axis=-1)
            - 0.5 * logdetS
            - 0.5 * mdim * jnp.log(2.0 * jnp.pi)
        )
        mean_u = mean + jnp.einsum("...dm,...m->...d", PHt, u)
        P_u = P - PHt @ SiHP
        # Rounding in the elimination asymmetrizes P slightly; over long
        # chains that compounds until S loses SPD (NaN evidence gradients at
        # T=200).  Re-symmetrize every step.
        P_u = 0.5 * (P_u + _mT(P_u))
        keep = mask[..., None]
        keep2 = mask[..., None, None]
        return (
            jnp.where(keep, mean_u, mean),
            jnp.where(keep2, P_u, P),
            jnp.where(mask, ll, 0.0),
        )

    mean0 = jnp.broadcast_to(m0, batch + (d,))
    Pp0 = jnp.broadcast_to(P0, batch + (d, d))
    mean1, P1, ll1 = update(mean0, Pp0, yT[0], obsT[0])

    def step(carry, inp):
        obs, mask = inp
        mean, P = carry
        mp = jnp.einsum("ij,...j->...i", A, mean)
        Pp = A @ P @ _mT(A) + Q
        mf, Pf, ll = update(mp, Pp, obs, mask)
        return (mf, Pf), (mf, Pf, ll)

    _, (means, covs, lls) = lax.scan(step, (mean1, P1), (yT[1:], obsT[1:]))
    means = jnp.concatenate([mean1[None], means], axis=0)
    covs = jnp.concatenate([P1[None], covs], axis=0)
    lls = jnp.concatenate([ll1[None], lls], axis=0)
    return means, covs, lls


def mv_lgssm_smooth_seq(
    y: jax.Array,
    A: jax.Array,
    Q: jax.Array,
    H: jax.Array,
    R: jax.Array,
    prior: Tuple[jax.Array, jax.Array],
) -> MvChainMarginals:
    """Sequential RTS smoother (filter ``lax.scan`` + backward ``lax.scan``).

    Same marginals as :func:`mv_lgssm_smooth`.  Single-chip this is usually
    the fastest path: the associative scan performs ~2× the combine work of
    the sequential recursions to buy O(log T) *depth*, which only pays when
    the time axis is sharded across devices (``parallel.time_sharded``) —
    at (R=4096, T=100, d=4) on a v5e the sequential smoother also compiles
    ~4× faster than the unrolled combine network."""
    A_, Q_ = jnp.asarray(A), jnp.asarray(Q)
    means, covs, _ = _mv_filter_scan(y, A_, Q_, H, R, prior)
    A_ = jnp.asarray(A_, means.dtype)
    Q_ = jnp.asarray(Q_, means.dtype)

    def back(carry, inp):
        ms_next, Ps_next = carry
        mf, Pf = inp
        Pp = A_ @ Pf @ _mT(A_) + Q_
        G = _mT(_solve_small(_mT(Pp), A_ @ _mT(Pf), pivot=False))
        ms = mf + jnp.einsum(
            "...de,...e->...d", G, ms_next - jnp.einsum("de,...e->...d", A_, mf)
        )
        Ps = Pf + G @ (Ps_next - Pp) @ _mT(G)
        return (ms, Ps), (ms, Ps)

    _, (ms_rest, Ps_rest) = lax.scan(
        back,
        (means[-1], covs[-1]),
        (means[:-1], covs[:-1]),
        reverse=True,
    )
    ms = jnp.concatenate([ms_rest, means[-1:]], axis=0)
    Ps = jnp.concatenate([Ps_rest, covs[-1:]], axis=0)
    return MvChainMarginals(jnp.moveaxis(ms, 0, -2), jnp.moveaxis(Ps, 0, -3))


class MvSmootherOperator(NamedTuple):
    """Precompiled affine smoother: ``means = y·L + c``, covs constant.

    For a time-invariant LGSSM the smoothed means are affine in the stacked
    observations and the smoothed covariances do not depend on the data at
    all — the entire smoothing sweep collapses to ONE ``(R, T·m) @
    (T·m, T·d)`` MXU matmul against a precomputed operator plus a constant
    covariance track.  The d-dimensional generalization of the scalar
    ``lgssm_smooth_matmul`` trick (``ops/chains.py``); O(T²·m·d) FLOPs per
    replica (vs O(T·d³) sequential) — wins while the (T·m, T·d) operator
    fits comfortably, loses at very large T.  Dense data only (no NaNs:
    missingness changes the operator)."""

    L: jax.Array  # (T*m, T*d)
    c: jax.Array  # (T, d) affine offset (prior contribution)
    cov: jax.Array  # (T, d, d) data-independent smoothed covariances


def mv_lgssm_smoother_operator(
    T: int,
    A: jax.Array,
    Q: jax.Array,
    H: jax.Array,
    R: jax.Array,
    prior: Tuple[jax.Array, jax.Array],
) -> MvSmootherOperator:
    """Build the affine operator by smoothing the T·m unit-impulse inputs
    as one batch (linearity: column k of L is ``smooth(e_k) - smooth(0)``)."""
    A_, Q_, H_, R_ = map(jnp.asarray, (A, Q, H, R))
    m = H_.shape[-2]
    d = A_.shape[-1]
    basis = jnp.concatenate(
        [jnp.zeros((1, T * m)), jnp.eye(T * m)], axis=0
    ).reshape(T * m + 1, T, m)
    out = mv_lgssm_smooth_seq(basis, A_, Q_, H_, R_, prior)
    c = out.mean[0]  # (T, d): response to all-zero observations
    L = (out.mean[1:] - c).reshape(T * m, T * d)
    return MvSmootherOperator(L, c, out.cov[0])


def mv_lgssm_smooth_matmul(
    y: jax.Array,
    A: jax.Array = None,
    Q: jax.Array = None,
    H: jax.Array = None,
    R: jax.Array = None,
    prior: Tuple[jax.Array, jax.Array] = None,
    operator: MvSmootherOperator = None,
) -> MvChainMarginals:
    """Smoothing as one MXU matmul against a precomputed affine operator.

    Identical marginals to :func:`mv_lgssm_smooth` for dense data; pass
    ``operator=`` to amortize the build across sweeps."""
    y = jnp.asarray(y)
    T, m = y.shape[-2], y.shape[-1]
    if operator is None:
        operator = mv_lgssm_smoother_operator(T, A, Q, H, R, prior)
    d = operator.c.shape[-1]
    flat = y.reshape(y.shape[:-2] + (T * m,))
    means = (
        jnp.einsum(
            "...k,kj->...j",
            flat,
            operator.L,
            precision=lax.Precision.HIGHEST,
        ).reshape(y.shape[:-2] + (T, d))
        + operator.c
    )
    cov = jnp.broadcast_to(operator.cov, y.shape[:-2] + (T, d, d))
    return MvChainMarginals(means, cov)


def mv_lgssm_filter(
    y: jax.Array,
    A: jax.Array,
    Q: jax.Array,
    H: jax.Array,
    R: jax.Array,
    prior: Tuple[jax.Array, jax.Array],
) -> MvChainMarginals:
    """Filtered beliefs p(x_t | y_{1:t}) for the vector-state LGSSM
    (streaming posterior).  Same parameter contract as
    :func:`mv_lgssm_smooth`; NaN steps predict through the gap."""
    means, covs, _ = _mv_filter_scan(y, A, Q, H, R, prior)
    return MvChainMarginals(jnp.moveaxis(means, 0, -2), jnp.moveaxis(covs, 0, -3))


def mv_lgssm_log_evidence(
    y: jax.Array,
    A: jax.Array,
    Q: jax.Array,
    H: jax.Array,
    R: jax.Array,
    prior: Tuple[jax.Array, jax.Array],
) -> jax.Array:
    """log p(y_{1:T}) via the prediction-error decomposition, shape
    ``y.shape[:-2]`` (one value per replica).  Differentiable in all
    parameters — the ML system-identification hook for vector models.  NaN
    steps are marginalized analytically."""
    _, _, lls = _mv_filter_scan(y, A, Q, H, R, prior)
    return jnp.sum(lls, axis=0)
