"""Pallas kernel tests (interpreter mode on CPU): parity with the scan
formulations."""

import numpy as np
import pytest

import jax.numpy as jnp

from cortex_tpu.ops import lgssm_smooth_scan
from cortex_tpu.ops.hmm import hmm_forward_backward
from cortex_tpu.ops.pallas_hmm import hmm_forward_backward_pallas
from cortex_tpu.ops.pallas_kernels import lgssm_smooth_pallas


def test_lgssm_pallas_matches_scan():
    rng = np.random.default_rng(0)
    y = jnp.asarray(rng.normal(size=(40, 32)).cumsum(axis=-1), dtype=jnp.float32)
    a = lgssm_smooth_pallas(y, tile=16)
    b = lgssm_smooth_scan(y)
    np.testing.assert_allclose(
        np.asarray(a.mean), np.asarray(b.mean), rtol=1e-4, atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(a.variance), np.asarray(b.variance), rtol=1e-4, atol=1e-4
    )


def test_lgssm_pallas_nondefault_params_and_padding():
    rng = np.random.default_rng(1)
    # 21 replicas with tile 16 exercises the padding path.
    y = jnp.asarray(rng.normal(size=(21, 24)).cumsum(axis=-1), dtype=jnp.float32)
    a = lgssm_smooth_pallas(y, A=0.9, Q=0.5, H=2.0, R=0.7, tile=16)
    b = lgssm_smooth_scan(y, A=0.9, Q=0.5, H=2.0, R=0.7)
    np.testing.assert_allclose(
        np.asarray(a.mean), np.asarray(b.mean), rtol=1e-3, atol=1e-3
    )


def test_hmm_pallas_matches_log_scan():
    rng = np.random.default_rng(2)
    R_, T, K = 12, 15, 4
    lik = (rng.random((R_, T, K)) + 0.1).astype(np.float32)
    A = (rng.random((K, K)) + 0.2).astype(np.float32)
    A /= A.sum(1, keepdims=True)
    pi = np.full(K, 1 / K, dtype=np.float32)

    out = hmm_forward_backward_pallas(
        jnp.asarray(lik), jnp.asarray(A), jnp.asarray(pi), tile=8
    )
    ref = hmm_forward_backward(
        jnp.log(jnp.asarray(lik)), jnp.log(jnp.asarray(A)), jnp.log(jnp.asarray(pi))
    )
    np.testing.assert_allclose(
        np.asarray(out.gamma), np.exp(np.asarray(ref.log_gamma)), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(out.log_evidence), np.asarray(ref.log_evidence), rtol=1e-5
    )


def test_hmm_pallas_gamma_normalized():
    rng = np.random.default_rng(3)
    lik = (rng.random((4, 10, 3)) + 0.05).astype(np.float32)
    A = np.full((3, 3), 1 / 3, dtype=np.float32)
    pi = np.full(3, 1 / 3, dtype=np.float32)
    out = hmm_forward_backward_pallas(
        jnp.asarray(lik), jnp.asarray(A), jnp.asarray(pi), tile=4
    )
    np.testing.assert_allclose(np.asarray(out.gamma).sum(-1), 1.0, rtol=1e-5)


def test_hmm_counts_pallas_matches_log_scan():
    from cortex_tpu.ops.pallas_hmm import hmm_forward_backward_counts_pallas

    rng = np.random.default_rng(4)
    R_, T, K = 8, 12, 4
    lik = (rng.random((R_, T, K)) + 0.1).astype(np.float32)
    A = (rng.random((K, K)) + 0.2).astype(np.float32)
    A /= A.sum(1, keepdims=True)
    pi = np.full(K, 1 / K, dtype=np.float32)

    out = hmm_forward_backward_counts_pallas(
        jnp.asarray(lik), jnp.asarray(A), jnp.asarray(pi), tile=4
    )
    ref = hmm_forward_backward(
        jnp.log(jnp.asarray(lik)), jnp.log(jnp.asarray(A)), jnp.log(jnp.asarray(pi))
    )
    np.testing.assert_allclose(
        np.asarray(out.gamma), np.exp(np.asarray(ref.log_gamma)), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(out.xi_sum), np.exp(np.asarray(ref.log_xi_sum)), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(out.log_evidence), np.asarray(ref.log_evidence), rtol=1e-5
    )
    # xi_sum rows sum to T-1 total mass.
    np.testing.assert_allclose(np.asarray(out.xi_sum).sum((-2, -1)), T - 1, rtol=1e-4)
