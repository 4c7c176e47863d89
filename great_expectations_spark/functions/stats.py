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
    # Numerical Recipes probks: the alternating series only converges for
    # large-enough lambda; on NON-convergence (tiny lambda = near-perfect
    # fit) the correct answer is 1.0 — truncating mid-oscillation returns
    # garbage (e.g. 0.18 for a fit with D=5e-6)
    a2 = -2.0 * lam * lam
    fac, total, termbf = 2.0, 0.0, 0.0
    for j in range(1, 101):
        term = fac * math.exp(a2 * j * j)
        total += term
        if abs(term) <= 1e-10 * termbf or abs(term) <= 1e-12 * abs(total):
            return max(0.0, min(1.0, total))
        fac = -fac
        termbf = abs(term)
    return 1.0  # series failed to converge => p ~ 1


def chisquare_test(observed: np.ndarray, expected: np.ndarray) -> tuple[float, float]:
    """Pearson chi-square statistic and p-value, df = k-1
    (scipy.stats.chisquare semantics: zero expected with nonzero observed
    → infinite statistic → p=0)."""
    observed = np.asarray(observed, dtype=float)
    expected = np.asarray(expected, dtype=float)
    if np.any((expected <= 0) & (observed > 0)):
        return float("inf"), 0.0
    if np.any(expected <= 0):
        # scipy: (0-0)^2/0 = nan -> stat nan -> p nan (fails a > threshold
        # check, like the reference); silently masking the cell would
        # compute a finite p against an inflated df and could flip success
        return float("nan"), float("nan")
    stat = float(np.sum((observed - expected) ** 2 / expected))
    df = len(observed) - 1
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


def _betacf(a: float, b: float, x: float) -> float:
    """Continued fraction for the incomplete beta (Lentz's algorithm —
    standard public numerical method)."""
    tiny = 1e-300
    qab, qap, qam = a + b, a + 1.0, a - 1.0
    c = 1.0
    d = 1.0 - qab * x / qap
    if abs(d) < tiny:
        d = tiny
    d = 1.0 / d
    h = d
    for m in range(1, 300):
        m2 = 2 * m
        aa = m * (b - m) * x / ((qam + m2) * (a + m2))
        d = 1.0 + aa * d
        if abs(d) < tiny:
            d = tiny
        c = 1.0 + aa / c
        if abs(c) < tiny:
            c = tiny
        d = 1.0 / d
        h *= d * c
        aa = -(a + m) * (qab + m) * x / ((a + m2) * (qap + m2))
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


def betainc_reg(a: float, b: float, x: float) -> float:
    """Regularized incomplete beta I_x(a,b)."""
    if x <= 0.0:
        return 0.0
    if x >= 1.0:
        return 1.0
    ln_front = (
        math.lgamma(a + b) - math.lgamma(a) - math.lgamma(b)
        + a * math.log(x) + b * math.log(1.0 - x)
    )
    front = math.exp(ln_front)
    if x < (a + 1.0) / (a + b + 2.0):
        return front * _betacf(a, b, x) / a
    return 1.0 - front * _betacf(b, a, 1.0 - x) / b


def gammainc_lower_reg(a: float, x: float) -> float:
    """Regularized lower incomplete gamma P(a,x)."""
    if x <= 0:
        return 0.0
    if x < a + 1.0:
        return max(0.0, min(1.0, _gammainc_lower_series(a, x)))
    return max(0.0, min(1.0, 1.0 - _gammainc_upper_cf(a, x)))


def _betacf_vec(a: float, b: float, x: np.ndarray) -> np.ndarray:
    """Vectorized Lentz continued fraction for the incomplete beta — the
    same recurrence as ``_betacf`` run across the whole array at once (the
    KS path evaluates up to ks_sample_cap=100k points; a per-element
    Python loop is tens of seconds of driver stall, this is milliseconds)."""
    tiny = 1e-300
    qab, qap, qam = a + b, a + 1.0, a - 1.0
    c = np.ones_like(x)
    d = 1.0 - qab * x / qap
    d = np.where(np.abs(d) < tiny, tiny, d)
    d = 1.0 / d
    h = d.copy()
    for m in range(1, 300):
        m2 = 2 * m
        aa = m * (b - m) * x / ((qam + m2) * (a + m2))
        d = 1.0 + aa * d
        d = np.where(np.abs(d) < tiny, tiny, d)
        c = 1.0 + aa / c
        c = np.where(np.abs(c) < tiny, tiny, c)
        d = 1.0 / d
        h = h * (d * c)
        aa = -(a + m) * (qab + m) * x / ((a + m2) * (qap + m2))
        d = 1.0 + aa * d
        d = np.where(np.abs(d) < tiny, tiny, d)
        c = 1.0 + aa / c
        c = np.where(np.abs(c) < tiny, tiny, c)
        d = 1.0 / d
        delta = d * c
        h = h * delta
        if np.all(np.abs(delta - 1.0) < 1e-14):
            break
    return h


def betainc_reg_vec(a: float, b: float, x: np.ndarray) -> np.ndarray:
    """Vectorized regularized incomplete beta I_x(a,b)."""
    x = np.clip(np.asarray(x, dtype=float), 0.0, 1.0)
    out = np.empty_like(x)
    interior = (x > 0.0) & (x < 1.0)
    small = interior & (x < (a + 1.0) / (a + b + 2.0))
    large = interior & ~small
    ln_b = math.lgamma(a + b) - math.lgamma(a) - math.lgamma(b)
    xs = x[small]
    out[small] = (
        np.exp(ln_b + a * np.log(xs) + b * np.log1p(-xs)) * _betacf_vec(a, b, xs) / a
    )
    xl = x[large]
    out[large] = 1.0 - (
        np.exp(ln_b + a * np.log(xl) + b * np.log1p(-xl))
        * _betacf_vec(b, a, 1.0 - xl) / b
    )
    out[x <= 0.0] = 0.0
    out[x >= 1.0] = 1.0
    return np.clip(out, 0.0, 1.0)


def _gammainc_lower_series_vec(a: float, x: np.ndarray) -> np.ndarray:
    term = np.full_like(x, 1.0 / a)
    total = term.copy()
    n = a
    for _ in range(1000):
        n += 1.0
        term = term * x / n
        total = total + term
        if np.all(np.abs(term) < np.abs(total) * 1e-15):
            break
    return total * np.exp(-x + a * np.log(x) - math.lgamma(a))


def _gammainc_upper_cf_vec(a: float, x: np.ndarray) -> np.ndarray:
    tiny = 1e-300
    b = x + 1.0 - a
    c = np.full_like(x, 1.0 / tiny)
    d = 1.0 / b
    h = d.copy()
    for i in range(1, 1000):
        an = -i * (i - a)
        b = b + 2.0
        d = an * d + b
        d = np.where(np.abs(d) < tiny, tiny, d)
        c = b + an / c
        c = np.where(np.abs(c) < tiny, tiny, c)
        d = 1.0 / d
        delta = d * c
        h = h * delta
        if np.all(np.abs(delta - 1.0) < 1e-15):
            break
    return h * np.exp(-x + a * np.log(x) - math.lgamma(a))


def gammainc_lower_reg_vec(a: float, x: np.ndarray) -> np.ndarray:
    """Vectorized regularized lower incomplete gamma P(a,x)."""
    x = np.asarray(x, dtype=float)
    out = np.zeros_like(x)
    lo = (x > 0.0) & (x < a + 1.0)
    hi = x >= a + 1.0
    out[lo] = _gammainc_lower_series_vec(a, x[lo])
    out[hi] = 1.0 - _gammainc_upper_cf_vec(a, x[hi])
    return np.clip(out, 0.0, 1.0)


def norm_cdf(x: np.ndarray, loc: float = 0.0, scale: float = 1.0) -> np.ndarray:
    z = (np.asarray(x, dtype=float) - loc) / (scale * math.sqrt(2.0))
    return np.array([0.5 * (1.0 + math.erf(v)) for v in z])


def dist_cdf(name: str, args: tuple, x: np.ndarray) -> np.ndarray:
    """CDF of a named distribution with GE/scipy positional args
    (norm(loc,scale), beta(a,b,loc,scale), gamma(a,loc,scale),
    chi2(df,loc,scale), expon(loc,scale), uniform(loc,scale))."""
    x = np.asarray(x, dtype=float)
    if name == "norm":
        loc = args[0] if len(args) > 0 else 0.0
        scale = args[1] if len(args) > 1 else 1.0
        return norm_cdf(x, loc, scale)
    if name == "uniform":
        loc = args[0] if len(args) > 0 else 0.0
        scale = args[1] if len(args) > 1 else 1.0
        return np.clip((x - loc) / scale, 0.0, 1.0)
    if name == "expon":
        loc = args[0] if len(args) > 0 else 0.0
        scale = args[1] if len(args) > 1 else 1.0
        z = np.maximum((x - loc) / scale, 0.0)
        return 1.0 - np.exp(-z)
    if name == "beta":
        a, b = args[0], args[1]
        loc = args[2] if len(args) > 2 else 0.0
        scale = args[3] if len(args) > 3 else 1.0
        z = np.clip((x - loc) / scale, 0.0, 1.0)
        return betainc_reg_vec(a, b, z)
    if name == "gamma":
        a = args[0]
        loc = args[1] if len(args) > 1 else 0.0
        scale = args[2] if len(args) > 2 else 1.0
        z = np.maximum((x - loc) / scale, 0.0)
        return gammainc_lower_reg_vec(a, z)
    if name == "chi2":
        df = args[0]
        loc = args[1] if len(args) > 1 else 0.0
        scale = args[2] if len(args) > 2 else 1.0
        z = np.maximum((x - loc) / scale, 0.0)
        return gammainc_lower_reg_vec(df / 2.0, z / 2.0)
    raise ValueError(f"unsupported distribution {name!r}")


def ks_test_named(sample: np.ndarray, name: str, args: tuple) -> tuple[float, float]:
    """One-sample two-sided KS test against a named distribution
    (scipy.stats.kstest semantics): D = sup|ECDF - CDF|, asymptotic p."""
    s = np.sort(np.asarray(sample, dtype=float))
    n = len(s)
    if n == 0:
        return 0.0, 1.0
    cdf = dist_cdf(name, args, s)
    ecdf_hi = np.arange(1, n + 1) / n
    ecdf_lo = np.arange(0, n) / n
    d = float(max(np.max(ecdf_hi - cdf), np.max(cdf - ecdf_lo)))
    return d, ks_sf(d, n)


def cramers_phi(contingency: np.ndarray) -> float:
    """Cramér's V/phi from a 2-D contingency table — with Yates continuity
    correction on 2x2 tables (scipy.stats.chi2_contingency's default,
    which the reference calls: observed shifted toward expected by up to
    0.5 when dof == 1)."""
    table = np.asarray(contingency, dtype=float)
    n = table.sum()
    if n == 0:
        return 0.0
    row = table.sum(axis=1, keepdims=True)
    colsum = table.sum(axis=0, keepdims=True)
    expected = row @ colsum / n
    dof = (table.shape[0] - 1) * (table.shape[1] - 1)
    if dof == 1:
        diff = expected - table
        table = table + np.sign(diff) * np.minimum(0.5, np.abs(diff))
    mask = expected > 0
    chi2 = float(np.sum((table[mask] - expected[mask]) ** 2 / expected[mask]))
    k = min(table.shape[0] - 1, table.shape[1] - 1)
    if k <= 0:
        return 0.0
    return math.sqrt(chi2 / (n * k))
