"""Numpy-only statistics helpers (no Spark needed)."""

from __future__ import annotations

import math

import pytest

from great_expectations_spark.functions import stats as s


def test_chi2_sf_known_values():
    # textbook critical values
    assert s.chi2_sf(3.841, 1) == pytest.approx(0.05, abs=2e-3)
    assert s.chi2_sf(5.991, 2) == pytest.approx(0.05, abs=2e-3)
    assert s.chi2_sf(0.0, 5) == 1.0
    assert s.chi2_sf(100.0, 2) < 1e-20


def test_beta_cdf_analytic():
    # Beta(2,5): F(x) = 1 - (1-x)^5 (1 + 5x)
    for x in (0.05, 0.25, 0.5, 0.9):
        assert s.beta_cdf(x, 2, 5) == pytest.approx(
            1 - (1 - x) ** 5 * (1 + 5 * x), abs=1e-9
        )
    assert s.beta_cdf(0.5, 2, 2) == pytest.approx(0.5)
    assert s.beta_cdf(-0.1, 2, 2) == 0.0
    assert s.beta_cdf(1.1, 2, 2) == 1.0


def test_gamma_and_chi2_cdf_relation():
    # chi2(df) == gamma(df/2, scale 2)
    assert s.gamma_cdf(4.0, 2.0, 0, 2.0) == pytest.approx(
        1 - math.exp(-2) * 3, abs=1e-9
    )
    assert 1 - s.gamma_cdf(3.841, 0.5, 0, 2.0) == pytest.approx(
        s.chi2_sf(3.841, 1), abs=1e-6
    )


def test_kl_and_psi():
    assert s.kl_divergence([0.5, 0.5], [0.5, 0.5]) == 0.0
    assert s.kl_divergence([1.0, 0.0], [0.5, 0.5]) == pytest.approx(
        math.log(2)
    )
    assert math.isinf(s.kl_divergence([0.5, 0.5], [1.0, 0.0]))
    assert s.psi([100, 100], [100, 100]) == pytest.approx(0.0, abs=1e-6)
    assert s.psi([100, 100], [20, 180]) > 0.5


def test_ks_p_value_monotone():
    assert s.ks_p_value(0.0, 100) == 1.0
    assert s.ks_p_value(0.05, 100) > s.ks_p_value(0.2, 100)
    assert s.ks_p_value(0.5, 1000) < 1e-10


def test_chi2_test_uniform():
    out = s.chi2_test([25, 25, 25, 25], [25, 25, 25, 25])
    assert out["statistic"] == 0.0 and out["p_value"] == 1.0
    out = s.chi2_test([10, 40, 25, 25], [25, 25, 25, 25])
    assert out["p_value"] < 0.01
