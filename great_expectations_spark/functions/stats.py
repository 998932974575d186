"""Driver-side statistical helpers (numpy-only; scipy is not available).

Implements the standard public formulas the reference gets from
``scipy.stats``: chi-square survival function (regularized upper incomplete
gamma, Numerical-Recipes-style series/continued fraction), the asymptotic
two-sided Kolmogorov-Smirnov p-value, KL divergence / entropy, and PSI.
"""

from __future__ import annotations

import math
from typing import List, Sequence

import numpy as np


def _gammainc_lower_series(s: float, x: float) -> float:
    """Regularized lower incomplete gamma P(s, x) by power series (x < s+1)."""
    if x <= 0:
        return 0.0
    term = 1.0 / s
    total = term
    k = s
    for _ in range(1000):
        k += 1.0
        term *= x / k
        total += term
        if abs(term) < abs(total) * 1e-15:
            break
    return total * math.exp(-x + s * math.log(x) - math.lgamma(s))


def _gammainc_upper_contfrac(s: float, x: float) -> float:
    """Regularized upper incomplete gamma Q(s, x) by continued fraction
    (x >= s+1)."""
    tiny = 1e-300
    b = x + 1.0 - s
    c = 1.0 / tiny
    d = 1.0 / b
    h = d
    for i in range(1, 1000):
        an = -i * (i - s)
        b += 2.0
        d = an * d + b
        if abs(d) < tiny:
            d = tiny
        c = b + an / c
        if abs(c) < tiny:
            c = tiny
        d = 1.0 / d
        delta = d * c
        h *= delta
        if abs(delta - 1.0) < 1e-15:
            break
    return h * math.exp(-x + s * math.log(x) - math.lgamma(s))


def chi2_sf(x: float, df: float) -> float:
    """P(Chi2_df > x) — survival function of the chi-square distribution."""
    if x <= 0:
        return 1.0
    s = df / 2.0
    half_x = x / 2.0
    if half_x < s + 1.0:
        return max(0.0, min(1.0, 1.0 - _gammainc_lower_series(s, half_x)))
    return max(0.0, min(1.0, _gammainc_upper_contfrac(s, half_x)))


def betainc_regularized(a: float, b: float, x: float) -> float:
    """Regularized incomplete beta I_x(a, b) via the standard continued
    fraction (Numerical-Recipes-style), symmetric for convergence."""
    if x <= 0:
        return 0.0
    if x >= 1:
        return 1.0
    ln_front = (
        math.lgamma(a + b)
        - math.lgamma(a)
        - math.lgamma(b)
        + a * math.log(x)
        + b * math.log(1.0 - x)
    )
    front = math.exp(ln_front)

    def contfrac(a_: float, b_: float, x_: float) -> float:
        tiny = 1e-300
        qab, qap, qam = a_ + b_, a_ + 1.0, a_ - 1.0
        c = 1.0
        d = 1.0 - qab * x_ / qap
        if abs(d) < tiny:
            d = tiny
        d = 1.0 / d
        h = d
        for m in range(1, 300):
            m2 = 2 * m
            aa = m * (b_ - m) * x_ / ((qam + m2) * (a_ + m2))
            d = 1.0 + aa * d
            if abs(d) < tiny:
                d = tiny
            c = 1.0 + aa / c
            if abs(c) < tiny:
                c = tiny
            d = 1.0 / d
            h *= d * c
            aa = -(a_ + m) * (qab + m) * x_ / ((a_ + m2) * (qap + m2))
            d = 1.0 + aa * d
            if abs(d) < tiny:
                d = tiny
            c = 1.0 + aa / c
            if abs(c) < tiny:
                c = tiny
            d = 1.0 / d
            delta = d * c
            h *= delta
            if abs(delta - 1.0) < 1e-14:
                break
        return h

    if x < (a + 1.0) / (a + b + 2.0):
        return max(0.0, min(1.0, front * contfrac(a, b, x) / a))
    # symmetry I_x(a,b) = 1 - I_{1-x}(b,a); the front factor is invariant
    # under (a,b,x) -> (b,a,1-x)
    return max(0.0, min(1.0, 1.0 - front * contfrac(b, a, 1.0 - x) / b))


def gamma_cdf(x: float, alpha: float, loc: float = 0.0, scale: float = 1.0) -> float:
    z = (x - loc) / scale
    if z <= 0:
        return 0.0
    if z < alpha + 1.0:
        return max(0.0, min(1.0, _gammainc_lower_series(alpha, z)))
    return max(0.0, min(1.0, 1.0 - _gammainc_upper_contfrac(alpha, z)))


def beta_cdf(
    x: float, a: float, b: float, loc: float = 0.0, scale: float = 1.0
) -> float:
    return betainc_regularized(a, b, (x - loc) / scale)


def norm_cdf(x: float, mean: float = 0.0, std: float = 1.0) -> float:
    return 0.5 * (1.0 + math.erf((x - mean) / (std * math.sqrt(2.0))))


def ks_p_value(statistic: float, n_effective: float) -> float:
    """Asymptotic two-sided KS p-value: Q_KS((sqrt(n)+0.12+0.11/sqrt(n))·D)."""
    if statistic <= 0:
        return 1.0
    sqrt_n = math.sqrt(n_effective)
    lam = (sqrt_n + 0.12 + 0.11 / sqrt_n) * statistic
    total = 0.0
    for k in range(1, 101):
        term = 2.0 * (-1.0) ** (k - 1) * math.exp(-2.0 * (k * lam) ** 2)
        total += term
        if abs(term) < 1e-12:
            break
    return max(0.0, min(1.0, total))


def kl_divergence(p: Sequence[float], q: Sequence[float]) -> float:
    """sum(p * log(p / q)) in nats; 0·log(0/q)=0; infinite if q=0 where p>0."""
    p_arr = np.asarray(p, dtype=float)
    q_arr = np.asarray(q, dtype=float)
    p_arr = p_arr / p_arr.sum() if p_arr.sum() else p_arr
    q_arr = q_arr / q_arr.sum() if q_arr.sum() else q_arr
    mask = p_arr > 0
    if np.any(q_arr[mask] == 0):
        return float("inf")
    return float(np.sum(p_arr[mask] * np.log(p_arr[mask] / q_arr[mask])))


def psi(expected: Sequence[float], actual: Sequence[float], eps: float = 1e-6) -> float:
    """Population Stability Index: sum((a - e) * ln(a / e)) over buckets,
    with epsilon smoothing of empty buckets."""
    e = np.asarray(expected, dtype=float)
    a = np.asarray(actual, dtype=float)
    e = e / e.sum() if e.sum() else e
    a = a / a.sum() if a.sum() else a
    e = np.clip(e, eps, None)
    a = np.clip(a, eps, None)
    e = e / e.sum()
    a = a / a.sum()
    return float(np.sum((a - e) * np.log(a / e)))


def chi2_test(observed: Sequence[float], expected: Sequence[float]) -> dict:
    """Pearson chi-square goodness-of-fit against expected counts."""
    obs = np.asarray(observed, dtype=float)
    exp = np.asarray(expected, dtype=float)
    if exp.sum() > 0:
        exp = exp * (obs.sum() / exp.sum())
    mask = exp > 0
    stat = float(np.sum((obs[mask] - exp[mask]) ** 2 / exp[mask]))
    dof = int(mask.sum()) - 1
    return {
        "statistic": stat,
        "dof": dof,
        "p_value": chi2_sf(stat, dof) if dof > 0 else 1.0,
    }


def ks_two_sample_from_cdfs(
    cdf_a: Sequence[float],
    cdf_b: Sequence[float],
    n_a: float,
    n_b: float,
) -> dict:
    """Two-sample KS from CDFs evaluated on a shared grid (our scale path:
    the grid is the merged histogram/quantile edges computed in Spark)."""
    a = np.asarray(cdf_a, dtype=float)
    b = np.asarray(cdf_b, dtype=float)
    statistic = float(np.max(np.abs(a - b))) if len(a) else 0.0
    n_eff = n_a * n_b / (n_a + n_b) if (n_a + n_b) > 0 else 0.0
    return {
        "statistic": statistic,
        "p_value": ks_p_value(statistic, n_eff) if n_eff > 0 else 1.0,
    }


def histogram_edges(
    min_value: float, max_value: float, bins: int
) -> List[float]:
    if bins <= 0:
        raise ValueError("bins must be positive")
    if max_value <= min_value:
        max_value = min_value + 1.0
    width = (max_value - min_value) / bins
    return [min_value + i * width for i in range(bins + 1)]
