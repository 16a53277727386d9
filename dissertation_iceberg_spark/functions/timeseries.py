"""Time-series helpers: PACF from ACF via Durbin-Levinson (SURVEY A13).

The ACF is computed distributed (queries/oi_variants.oi_acf); PACF is
an O(k²) recursion on that tiny vector — driver-side by design
(SURVEY §4 'genuinely hard to distribute' list).
"""

from __future__ import annotations


def pacf_from_acf(acf: list[float]) -> list[float]:
    """Durbin-Levinson: acf[0] must be lag-1 (lag-0 == 1 implied).
    Returns pacf values for lags 1..len(acf)."""
    if not acf:
        return []
    r = [1.0, *acf]  # r[k] = autocorrelation at lag k
    k_max = len(acf)
    pacf = [r[1]]
    phi_prev = [r[1]]
    for k in range(2, k_max + 1):
        num = r[k] - sum(phi_prev[j] * r[k - 1 - j] for j in range(k - 1))
        den = 1.0 - sum(phi_prev[j] * r[j + 1] for j in range(k - 1))
        phi_kk = num / den
        phi = [
            phi_prev[j] - phi_kk * phi_prev[k - 2 - j] for j in range(k - 1)
        ] + [phi_kk]
        pacf.append(phi_kk)
        phi_prev = phi
    return pacf
