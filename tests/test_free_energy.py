"""Free-energy helper tests."""

import numpy as np
import pytest

import jax.numpy as jnp

from cortex_tpu.models import LGSSM
from cortex_tpu.ops import lgssm_messages_scan
from cortex_tpu.ops.free_energy import bethe_free_energy_chain, elbo_conjugate


def test_elbo_conjugate_composition():
    out = elbo_conjugate(jnp.asarray(10.0), jnp.asarray(2.0), jnp.asarray(3.0))
    assert float(out) == pytest.approx(5.0)


def test_bethe_free_energy_equals_negative_log_evidence_on_chain():
    """On a tree the Bethe free energy is exactly −log Z; compare against the
    LGSSM prediction-error log evidence conditioned on the first point."""
    rng = np.random.default_rng(0)
    y = jnp.asarray(rng.normal(size=(5, 30)).cumsum(axis=-1))
    msgs = lgssm_messages_scan(y, A=1.0, Q=1.0, H=1.0, R=1.0)
    obs_xi, obs_w = msgs["obs"]
    fe = bethe_free_energy_chain(obs_xi, obs_w, Q=1.0, A=1.0)
    assert fe.shape == (5,)

    # Oracle: dense filter over t>=2 given filtered_1 = obs_1.
    yn = np.asarray(y)
    for b in range(5):
        m, v = yn[b, 0], 1.0
        ll = 0.0
        for t in range(1, 30):
            s = v + 1.0 + 1.0
            ll += -0.5 * (np.log(2 * np.pi * s) + (yn[b, t] - m) ** 2 / s)
            k = (v + 1.0) / s
            m = m + k * (yn[b, t] - m)
            v = (v + 1.0) * (1 - k)
        assert float(fe[b]) == pytest.approx(-ll, rel=1e-4)


def test_bethe_free_energy_decreases_with_better_fit():
    rng = np.random.default_rng(1)
    smooth_data = jnp.asarray(np.zeros((1, 40)) + 0.01 * rng.normal(size=(1, 40)))
    rough_data = jnp.asarray(rng.normal(size=(1, 40)) * 5.0)
    fe_smooth = bethe_free_energy_chain(
        *lgssm_messages_scan(smooth_data)["obs"], Q=1.0
    )
    fe_rough = bethe_free_energy_chain(
        *lgssm_messages_scan(rough_data)["obs"], Q=1.0
    )
    assert float(fe_smooth[0]) < float(fe_rough[0])
