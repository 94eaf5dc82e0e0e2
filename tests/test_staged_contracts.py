"""Pure-Python property tests for the staged queries' portable
integer contracts (no Spark session): the HLL rho rank, the
trailing-zero geometric sampler, truncating division parity, and the
systematic-sampling boundary arithmetic. These pin the MATH the SQL
on both engines spells out, independently of either engine."""

from __future__ import annotations

from fractions import Fraction
from math import trunc

from hypothesis import given
from hypothesis import strategies as st

from autosinapi_spark.plans.staged_r9 import _HLL_WBITS, _SYS_K


def _rho_reference(w: int, bits: int) -> int:
    """Position of the leftmost 1-bit scanning from the budget MSB."""
    for i in range(bits - 1, -1, -1):
        if w & (1 << i):
            return bits - i
    return bits + 1


@given(st.integers(min_value=0, max_value=(1 << 54) - 1))
def test_hll_rho_formula(w):
    # the SQL spells rho as 55 - length(bin(w)) with a w = 0 sentinel;
    # Python's bit_length is the same minimal-binary length
    rho = (_HLL_WBITS + 1) - w.bit_length() if w else _HLL_WBITS + 1
    assert rho == _rho_reference(w, _HLL_WBITS)


def _tz_reference(h: int, cap: int) -> int:
    if h == 0:
        return cap
    n = 0
    while not (h >> n) & 1:
        n += 1
    return n


@given(st.integers(min_value=0, max_value=(1 << 60) - 1))
def test_dp_trailing_zero_formula(h):
    # the SQL spells tz as length(bin(h & -h)) - 1 with an h = 0 cap
    tz = 60 if h == 0 else (h & -h).bit_length() - 1
    assert tz == _tz_reference(h, 60)


@given(
    st.integers(min_value=-(10**15), max_value=10**15),
    st.integers(min_value=1, max_value=10**6),
)
def test_truncating_division_parity(a, b):
    # DuckDB // and Spark DIV both truncate toward zero (verified on
    # the engines); the Holt replay's tdiv must match that exactly
    q = abs(a) // b
    tdiv = -q if a < 0 else q
    assert tdiv == trunc(Fraction(a, b))


@given(
    st.lists(
        st.integers(min_value=1, max_value=10**6), min_size=1, max_size=400
    )
)
def test_systematic_sampling_boundary_conservation(weights):
    # every one of the K stratum boundaries is crossed by exactly one
    # item, so the crossing counts sum to K and any item heavier than
    # one stratum is always selected
    w_total = sum(weights)
    cum = 0
    selected = []
    crossings = 0
    for i, w in enumerate(weights):
        before, cum = cum, cum + w
        k0 = (before * _SYS_K) // w_total
        k1 = (cum * _SYS_K) // w_total
        if k1 > k0:
            selected.append(i)
            crossings += k1 - k0
    assert crossings == _SYS_K
    assert len(selected) <= _SYS_K
    heavy = {
        i for i, w in enumerate(weights) if w * _SYS_K >= w_total
    }
    assert heavy <= set(selected)
    # strata ids are strictly increasing across selections
    strata = [(sum(weights[:i]) * _SYS_K) // w_total for i in selected]
    assert strata == sorted(strata) and len(set(strata)) == len(strata)


# --- OLS closed form: power sums ARE the least-squares minimizer -----


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=500),
            st.integers(min_value=-(10**9), max_value=10**9),
        ),
        min_size=2,
        max_size=40,
    )
)
def test_ols_power_sum_closed_form(pts):
    # month grain => one y per x within a group
    dedup = {}
    for x, y in pts:
        dedup[x] = y
    pts = sorted(dedup.items())
    if len(pts) < 2:
        return  # den = 0 rows are filtered by the query
    n = len(pts)
    sx = sum(x for x, _ in pts)
    sy = sum(y for _, y in pts)
    sxx = sum(x * x for x, _ in pts)
    sxy = sum(x * y for x, y in pts)
    num = n * sxy - sx * sy
    den = n * sxx - sx * sx
    assert den > 0  # distinct x values guarantee positive variance
    slope = Fraction(num, den)
    # ppm via truncation toward zero == the engines' // and DIV
    q = abs(num) * 10**6 // den
    assert (-q if num < 0 else q) == trunc(slope * 10**6)
    # the closed form is the true LS minimizer: residual orthogonality
    b = (Fraction(sy) - slope * sx) / n
    resid = [Fraction(y) - slope * x - b for x, y in pts]
    assert sum(resid) == 0
    assert sum(r * x for r, (x, _) in zip(resid, pts)) == 0


# --- chi-square: the integer identity the SQL relies on --------------


@given(
    st.lists(
        st.lists(st.integers(min_value=0, max_value=1000), min_size=2,
                 max_size=4),
        min_size=2,
        max_size=5,
    )
)
def test_chi2_integer_identity(table):
    w = min(len(r) for r in table)
    table = [r[:w] for r in table]
    total = sum(sum(r) for r in table)
    rows = [sum(r) for r in table]
    cols = [sum(r[j] for r in table) for j in range(w)]
    if total == 0 or 0 in rows or 0 in cols:
        return  # empty margins never reach the division in-engine
    for i, r in enumerate(table):
        for j, obs in enumerate(r):
            exp = Fraction(rows[i] * cols[j], total)
            # (obs*N - r*c)^2 / (r*c*N)  ==  (obs - exp)^2 / exp
            lhs = Fraction(
                (obs * total - rows[i] * cols[j]) ** 2,
                rows[i] * cols[j] * total,
            )
            assert lhs == (obs - exp) ** 2 / exp
            # the emitted term is nonnegative, so floor == trunc
            assert trunc(lhs * 10**6) == (lhs * 10**6).__floor__()


# --- PMI: exact-integer ratio == probability form --------------------


@given(
    st.integers(min_value=1, max_value=10**6),
    st.integers(min_value=1, max_value=10**6),
    st.integers(min_value=1, max_value=10**6),
    st.integers(min_value=1, max_value=10**9),
    st.integers(min_value=1, max_value=10**9),
)
def test_pmi_ratio_identity(c2, cx, cy, n1, n2):
    lhs = Fraction(c2 * n1 * n1, n2 * cx * cy)
    rhs = Fraction(c2, n2) / (Fraction(cx, n1) * Fraction(cy, n1))
    assert lhs == rhs


# --- rotation staleness bound: capacity arithmetic -------------------


@given(st.integers(min_value=1, max_value=2000))
def test_rotation_stale_bound_is_feasible(n):
    # the bound must be large enough that refreshing every query
    # within it never demands more than WINDOW slots per round on
    # average, and must keep the floor-3 rigor for small registries
    from tools.rotation_check import WINDOW, stale_bound

    b = stale_bound(n)
    assert b >= 3
    assert b * WINDOW >= n  # avg refresh demand n/b fits the window
    if n > 3 * WINDOW:
        assert b == -(-n // WINDOW)  # exactly the capacity bound
