"""Driver-side statistical math (numpy only — scipy is not in the image).

Used by the distributional expectations: KL divergence
(reference expect_column_kl_divergence_to_be_less_than.py:378-640),
chi-square test (expect_column_chisquare_test_p_value_to_be_greater_than),
KS test (expect_column_bootstrapped_ks_test_p_value_to_be_greater_than),
Cramér's phi (expect_column_pair_cramers_phi_value_to_be_less_than).

The incomplete-gamma routines implement the standard series/continued-
fraction evaluation of the regularized gamma functions (public numerical
methods; cf. Abramowitz & Stegun §6.5) so we can compute chi-square
survival probabilities without scipy.
"""

from __future__ import annotations

import math

import numpy as np


def _gammainc_lower_series(a: float, x: float) -> float:
    """Regularized lower incomplete gamma P(a,x) by power series (x < a+1)."""
    if x <= 0:
        return 0.0
    term = 1.0 / a
    total = term
    n = a
    for _ in range(1000):
        n += 1.0
        term *= x / n
        total += term
        if abs(term) < abs(total) * 1e-15:
            break
    return total * math.exp(-x + a * math.log(x) - math.lgamma(a))


def _gammainc_upper_cf(a: float, x: float) -> float:
    """Regularized upper incomplete gamma Q(a,x) by continued fraction (x >= a+1)."""
    tiny = 1e-300
    b = x + 1.0 - a
    c = 1.0 / tiny
    d = 1.0 / b
    h = d
    for i in range(1, 1000):
        an = -i * (i - a)
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
    return h * math.exp(-x + a * math.log(x) - math.lgamma(a))


def chi2_sf(x: float, df: float) -> float:
    """Survival function of the chi-square distribution, P(X >= x)."""
    if x <= 0:
        return 1.0
    a = df / 2.0
    x2 = x / 2.0
    if x2 < a + 1.0:
        return max(0.0, min(1.0, 1.0 - _gammainc_lower_series(a, x2)))
    return max(0.0, min(1.0, _gammainc_upper_cf(a, x2)))


def ks_sf(d: float, n_eff: float) -> float:
    """Two-sided KS asymptotic survival probability.

    Q(lambda) = 2 * sum_{k>=1} (-1)^{k-1} exp(-2 k^2 lambda^2), with the
    standard small-sample correction lambda = (sqrt(n)+0.12+0.11/sqrt(n))*d.
    """
    if d <= 0:
        return 1.0
    sqrt_n = math.sqrt(n_eff)
    lam = (sqrt_n + 0.12 + 0.11 / sqrt_n) * d
    total = 0.0
    for k in range(1, 101):
        term = 2.0 * ((-1.0) ** (k - 1)) * math.exp(-2.0 * (k * lam) ** 2)
        total += term
        if abs(term) < 1e-12:
            break
    return max(0.0, min(1.0, total))


def chisquare_test(observed: np.ndarray, expected: np.ndarray) -> tuple[float, float]:
    """Pearson chi-square statistic and p-value (df = k-1)."""
    observed = np.asarray(observed, dtype=float)
    expected = np.asarray(expected, dtype=float)
    mask = expected > 0
    stat = float(np.sum((observed[mask] - expected[mask]) ** 2 / expected[mask]))
    df = int(mask.sum()) - 1
    return stat, chi2_sf(stat, max(df, 1))


def kl_divergence(pk: np.ndarray, qk: np.ndarray) -> float:
    """KL(p || q) in nats; inf when q has zero mass where p doesn't.

    Matches scipy.stats.entropy(pk, qk) semantics used by the reference
    (expect_column_kl_divergence_to_be_less_than.py:454-516).
    """
    pk = np.asarray(pk, dtype=float)
    qk = np.asarray(qk, dtype=float)
    psum, qsum = pk.sum(), qk.sum()
    if psum <= 0 or qsum <= 0:
        return float("inf")
    pk = pk / psum
    qk = qk / qsum
    nz = pk > 0
    if np.any(qk[nz] <= 0):
        return float("inf")
    return float(np.sum(pk[nz] * np.log(pk[nz] / qk[nz])))


def cramers_phi(contingency: np.ndarray) -> float:
    """Cramér's V/phi from a 2-D contingency table."""
    table = np.asarray(contingency, dtype=float)
    n = table.sum()
    if n == 0:
        return 0.0
    row = table.sum(axis=1, keepdims=True)
    colsum = table.sum(axis=0, keepdims=True)
    expected = row @ colsum / n
    mask = expected > 0
    chi2 = float(np.sum((table[mask] - expected[mask]) ** 2 / expected[mask]))
    k = min(table.shape[0] - 1, table.shape[1] - 1)
    if k <= 0:
        return 0.0
    return math.sqrt(chi2 / (n * k))
