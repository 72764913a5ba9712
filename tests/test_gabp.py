"""Loopy Gaussian BP tests.

Oracles: dense linear solve (GaBP means are exact for walk-summable models;
means AND variances exact on trees — Weiss & Freeman 2001)."""

import jax.numpy as jnp
import numpy as np
import pytest

from cortex_tpu.ops.gabp import GaBPResult, gabp_solve, grid_edges


def _dense(lam_diag, edges, lam_off, eta):
    n = len(lam_diag)
    L = np.diag(np.asarray(lam_diag, dtype=np.float64))
    for (i, j), v in zip(np.asarray(edges), np.asarray(lam_off)):
        L[i, j] += v
        L[j, i] += v
    S = np.linalg.inv(L)
    return S @ np.asarray(eta, dtype=np.float64), np.diag(S)


def test_grid_edges_shape():
    e = grid_edges(3, 4)
    assert e.shape == (3 * 3 + 2 * 4, 2)
    assert e.max() == 11 and e.min() == 0


def test_tree_exact_means_and_variances():
    # A path graph is a tree: GaBP must be exact in means AND variances.
    n = 12
    rng = np.random.default_rng(0)
    lam_diag = jnp.asarray(2.0 + rng.random(n), dtype=jnp.float32)
    edges = jnp.asarray([[i, i + 1] for i in range(n - 1)])
    lam_off = jnp.asarray(-0.5 + 0.2 * rng.random(n - 1), dtype=jnp.float32)
    eta = jnp.asarray(rng.normal(size=n), dtype=jnp.float32)

    res = gabp_solve(lam_diag, eta, edges, lam_off, n_iters=80, damping=1.0)
    mean_d, var_d = _dense(lam_diag, edges, lam_off, eta)
    np.testing.assert_allclose(np.asarray(res.mean), mean_d, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(res.variance), var_d, rtol=1e-4, atol=1e-5)
    assert float(res.delta) < 1e-6


def test_loopy_grid_means_match_dense_solve():
    h, w = 6, 7
    n = h * w
    rng = np.random.default_rng(1)
    edges = grid_edges(h, w)
    lam_diag = jnp.asarray(np.full(n, 5.0), dtype=jnp.float32)  # diagonally dominant
    lam_off = jnp.asarray(-1.0 + 0.2 * rng.random(len(edges)), dtype=jnp.float32)
    eta = jnp.asarray(rng.normal(size=n), dtype=jnp.float32)

    res = gabp_solve(lam_diag, eta, jnp.asarray(edges), lam_off, n_iters=120)
    mean_d, var_d = _dense(lam_diag, edges, lam_off, eta)
    np.testing.assert_allclose(np.asarray(res.mean), mean_d, rtol=2e-4, atol=2e-5)
    # Loopy variances are approximate but positive and under-estimates here.
    assert np.all(np.asarray(res.variance) > 0)
    assert np.max(np.abs(np.asarray(res.variance) - var_d) / var_d) < 0.3


def test_batched_replicas_match_individual():
    h, w = 4, 4
    n = h * w
    rng = np.random.default_rng(2)
    edges = jnp.asarray(grid_edges(h, w))
    lam_diag = jnp.asarray(np.full(n, 4.0), dtype=jnp.float32)
    lam_off = jnp.asarray(np.full(edges.shape[0], -0.8), dtype=jnp.float32)
    etas = jnp.asarray(rng.normal(size=(5, n)), dtype=jnp.float32)

    batched = gabp_solve(lam_diag, etas, edges, lam_off, n_iters=100)
    assert batched.mean.shape == (5, n)
    single = gabp_solve(lam_diag, etas[3], edges, lam_off, n_iters=100)
    np.testing.assert_allclose(batched.mean[3], single.mean, rtol=1e-5, atol=1e-6)
    # Variances depend only on the (shared) graph, not on eta: shape (n,).
    assert batched.variance.shape == (n,)
    np.testing.assert_allclose(batched.variance, single.variance, rtol=1e-5)


def test_denoising_improves_over_observation():
    """Grid-MRF smoothing: posterior means are closer to the clean image."""
    h, w = 16, 16
    n = h * w
    rng = np.random.default_rng(3)
    xx, yy = np.meshgrid(np.linspace(0, 2, w), np.linspace(0, 2, h))
    clean = np.sin(np.pi * xx) * np.cos(np.pi * yy)
    noisy = clean + 0.4 * rng.normal(size=(h, w))

    obs_prec, smooth = 2.0, 1.2
    edges = grid_edges(h, w)
    deg = np.zeros(n)
    for i, j in edges:
        deg[i] += 1
        deg[j] += 1
    lam_diag = jnp.asarray(obs_prec + smooth * deg, dtype=jnp.float32)
    lam_off = jnp.asarray(np.full(len(edges), -smooth), dtype=jnp.float32)
    eta = jnp.asarray(obs_prec * noisy.ravel(), dtype=jnp.float32)

    res = gabp_solve(lam_diag, eta, jnp.asarray(edges), lam_off, n_iters=150)
    denoised = np.asarray(res.mean).reshape(h, w)
    assert np.sqrt(np.mean((denoised - clean) ** 2)) < 0.6 * np.sqrt(
        np.mean((noisy - clean) ** 2)
    )
    assert float(res.delta) < 1e-4


def test_grid_solve_matches_edge_list_solver():
    """The stencil path must reproduce the generic edge-list GaBP exactly
    (same Jacobi schedule, same damping)."""
    from cortex_tpu.ops.gabp import gabp_grid_solve

    h, w = 5, 9
    n = h * w
    rng = np.random.default_rng(4)
    edges = grid_edges(h, w)
    lam_diag = jnp.asarray(4.0 + rng.random((h, w)), dtype=jnp.float32)
    coupling = -0.9
    lam_off = jnp.asarray(np.full(len(edges), coupling), dtype=jnp.float32)
    eta = jnp.asarray(rng.normal(size=(3, h, w)), dtype=jnp.float32)

    for iters, damping in ((7, 0.7), (60, 1.0)):
        grid = gabp_grid_solve(lam_diag, eta, coupling, n_iters=iters, damping=damping)
        flat = gabp_solve(
            lam_diag.reshape(n), eta.reshape(3, n), jnp.asarray(edges), lam_off,
            n_iters=iters, damping=damping,
        )
        np.testing.assert_allclose(
            np.asarray(grid.mean).reshape(3, n), np.asarray(flat.mean),
            rtol=2e-4, atol=2e-5,
        )
        np.testing.assert_allclose(
            np.asarray(grid.variance).reshape(n), np.asarray(flat.variance),
            rtol=2e-4, atol=2e-5,
        )


def test_grid_solve_converges_and_denoises():
    from cortex_tpu.ops.gabp import gabp_grid_solve

    h, w = 16, 16
    rng = np.random.default_rng(5)
    xx, yy = np.meshgrid(np.linspace(0, 2, w), np.linspace(0, 2, h))
    clean = np.sin(np.pi * xx) * np.cos(np.pi * yy)
    noisy = clean + 0.4 * rng.normal(size=(h, w))
    obs_prec, smooth = 2.0, 1.2
    deg = np.full((h, w), 4.0)
    deg[0, :] -= 1; deg[-1, :] -= 1; deg[:, 0] -= 1; deg[:, -1] -= 1
    res = gabp_grid_solve(
        jnp.asarray(obs_prec + smooth * deg, dtype=jnp.float32),
        jnp.asarray(obs_prec * noisy, dtype=jnp.float32),
        -smooth, n_iters=150,
    )
    assert float(res.delta) < 1e-4
    assert np.sqrt(np.mean((np.asarray(res.mean) - clean) ** 2)) < 0.6 * np.sqrt(
        np.mean((noisy - clean) ** 2)
    )
