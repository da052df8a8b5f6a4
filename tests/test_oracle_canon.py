"""Canon-sensitivity mutation tests (VERDICT r6, next-round #3).

The float canon in ``oracle.py`` is load-bearing for every green gate
row: it widened twice during the round-6 scale probes (fixed
round(x, 6) -> 12 significant digits for large magnitudes), and a
canon that coarsens further could eventually mask a real engine bug.
These tests inject KNOWN-WRONG perturbations at exactly the scales the
canon protects and assert ``canonicalize`` still distinguishes them —
i.e. they pin the canon's guaranteed detection floor:

* |x| <  1e9 (driver domain, ``_SIG_CUTOFF``): bit-for-bit the
  driver's round(x, 6) — any absolute error >= 2e-6 is detected.
* |x| >= 1e9: 12 significant digits — any relative error >= 1e-11 is
  detected, while the ~4e-14 relative summation-order noise the sf10
  probe measured on 10M-row double sums compares equal.

If a future canon change breaks any assertion here, the change made
the gate blind to a perturbation it currently catches — re-derive the
floor before shipping it.

No SparkSession needed: ``canonicalize`` is pure.
"""

from __future__ import annotations

import math

import pytest

from mapreduce_word2vec_spark.oracle import (
    ROUND_DIGITS,
    SIG_DIGITS,
    _SIG_CUTOFF,
    canonicalize,
)


def _differs(a_rows, b_rows, cols=("v",)):
    return canonicalize(list(cols), a_rows) != canonicalize(list(cols), b_rows)


# ---------------------------------------------------------------------------
# Detection floor ABOVE the cutoff (sig-digit canon)
# ---------------------------------------------------------------------------


def test_detects_1e9_relative_error_on_1e11_sum():
    """A 1e-9 relative error on an sf10-magnitude sum (1e11) must fail.

    12 significant digits resolve 0.1 absolute at 1e11; the injected
    error is 100 absolute — three orders of magnitude above the floor.
    """
    truth = 2.7e11
    wrong = truth * (1 + 1e-9)
    assert _differs([(truth,)], [(wrong,)])


def test_detects_1e11_relative_error_at_cutoff_scale():
    """The guaranteed relative floor at |x| >= cutoff is 1e-11.

    At SIG_DIGITS=12 the quantum is 10**(floor(log10|x|) - 11), i.e.
    at worst ~1e-11 relative; a 5e-11 relative error always crosses at
    least one quantum boundary regardless of where x sits in a decade.
    """
    for mag in (1e9, 3.7e9, 1e10, 8.2e11, 1e13):
        truth = mag
        wrong = mag * (1 + 5e-11)
        assert _differs([(truth,)], [(wrong,)]), f"missed 5e-11 rel at {mag:g}"


def test_tolerates_summation_order_noise_on_1e11_sum():
    """The measured ~4e-14 relative summation-order noise must PASS.

    This is the other side of the contract: the canon exists because
    Spark's and DuckDB's reduction trees legitimately disagree at this
    level on 10M-row double sums (sf10 probe, q1 at 2.7e11). A canon
    that flags it would make every large-scale gate row flaky.
    """
    truth = 2.7e11
    noisy = truth * (1 + 4e-14)
    assert not _differs([(truth,)], [(noisy,)])


# ---------------------------------------------------------------------------
# Detection floor BELOW the cutoff (driver's round(x, 6))
# ---------------------------------------------------------------------------


def test_detects_cent_error_on_money_value():
    """Off-by-one-cent on a DECIMAL-style money value must fail."""
    assert _differs([(12345.67,)], [(12345.68,)])


def test_detects_cent_error_at_driver_sum_scale():
    """Off-by-one-cent at the driver's q1-sum magnitude (~2.7e8).

    Under the pre-r7 cutoff (1e7) this window used 12 significant
    digits, whose 1e-3 quantum at 2.7e8 still caught a cent — but a
    2e-5 error slipped through (ADVICE r6). Both must fail now that
    round(x, 6) applies up to 1e9.
    """
    truth = 2.7e8
    assert _differs([(truth,)], [(truth + 0.01,)])
    assert _differs([(truth,)], [(truth + 2e-5,)])


def test_detects_2e6_absolute_error_below_cutoff():
    """Guaranteed absolute floor below the cutoff: 2e-6.

    round(x, 6) has a 1e-6 quantum; an absolute error >= 2e-6 always
    crosses a boundary. Checked across the whole driver-exact domain
    including just under the cutoff, where round(x, 6) needs 15
    significant digits (the most float64-hostile point).
    """
    for mag in (0.5, 123.456, 1e6, 2.7e8, 9.99e8):
        assert _differs([(mag,)], [(mag + 2e-6,)]), f"missed 2e-6 abs at {mag:g}"


# ---------------------------------------------------------------------------
# Probe canon (sig_cutoff=1e7, used by sf >= 1 scale gates)
# ---------------------------------------------------------------------------


def _differs_probe(a_rows, b_rows):
    return canonicalize(["v"], a_rows, sig_cutoff=1e7) != canonicalize(
        ["v"], b_rows, sig_cutoff=1e7
    )


def test_probe_canon_tolerates_one_quantum_noise_at_1e8():
    """The exact sf1 finding that motivated the probe cutoff: q17's
    6M-row sum differs by ONE round(,6) quantum at 1.6e8 between
    Spark's and DuckDB's reduction trees. Driver-strict canon must
    flag it (that precision is real at driver row counts); the probe
    canon must absorb it."""
    a, b = 159852175.541428, 159852175.541429
    assert _differs([(a,)], [(b,)])  # driver-strict: one quantum apart
    assert not _differs_probe([(a,)], [(b,)])


def test_probe_canon_still_detects_cent_errors():
    """The probe canon's floor in the relaxed [1e7, 1e9) window: 12
    significant digits resolve <= 1e-3 absolute there — an off-by-one-
    cent semantic bug still fails everywhere the relaxation applies.
    (Above 1e9 both canons are identical and the guaranteed floor is
    the relative one pinned above.)"""
    for mag in (1.6e7, 1.6e8, 9.9e8):
        assert _differs_probe([(mag,)], [(mag + 0.01,)]), f"missed cent at {mag:g}"


def test_probe_row_tolerance_absorbs_knife_edge_only():
    """Probe gates additionally accept rows whose ONLY differences are
    float cells within 1.5 canon quanta — the knife-edge case where a
    value sits exactly on a rounding boundary and two correct engines
    round one quantum apart (events_bot_detection at sf1: 2/15000 rows,
    one 1e-6 quantum at |x|~3e4). The band must NOT absorb anything the
    detection floor promises to catch."""
    from mapreduce_word2vec_spark.oracle import _rows_within_float_tolerance as tol

    cutoff = 1e7
    # one-quantum knife-edge below the cutoff: absorbed
    assert tol((("f", 31194.570962), ("i", 80)), (("f", 31194.570963), ("i", 80)), cutoff)
    # a cent error: NOT absorbed
    assert not tol((("f", 31194.57),), (("f", 31194.58),), cutoff)
    # three quanta: NOT absorbed
    assert not tol((("f", 31194.570962),), (("f", 31194.570965),), cutoff)
    # one sig-digit quantum above the cutoff: absorbed
    assert tol((("f", 2.7e11),), (("f", 2.7e11 + 0.1),), cutoff)
    # int cells must be exact even when floats are tolerable
    assert not tol((("f", 1.0), ("i", 80)), (("f", 1.0), ("i", 81)), cutoff)
    # NULL vs value, type drift: never absorbed
    assert not tol((None,), (("f", 0.0),), cutoff)
    assert not tol((("i", 5),), (("f", 5.0),), cutoff)


# ---------------------------------------------------------------------------
# Structural mutations (row/column integrity)
# ---------------------------------------------------------------------------


def test_detects_values_swapped_across_rows():
    """Swapping values between rows (same multiset per column) fails.

    The canon sorts rows, so PURE row reordering compares equal (by
    design — SQL results are unordered). But re-pairing values across
    rows produces different row tuples and must be caught.
    """
    a = [(1, 10.0), (2, 20.0)]
    b = [(1, 20.0), (2, 10.0)]
    assert _differs(a, b, cols=("k", "v"))
    # ...while pure reordering is fine:
    assert not _differs([(2, 20.0), (1, 10.0)], [(1, 10.0), (2, 20.0)], cols=("k", "v"))


def test_detects_int_float_type_divergence():
    """5 (BIGINT) vs 5.0 (DOUBLE) must fail — the round-1 scalar_math
    lesson: the driver's value hash is type-sensitive."""
    assert _differs([(5,)], [(5.0,)])


def test_detects_dropped_and_duplicated_rows():
    a = [(1, 10.0), (2, 20.0)]
    assert _differs(a, a[:1], cols=("k", "v"))
    assert _differs(a, a + [a[0]], cols=("k", "v"))


def test_null_vs_zero_and_nan_semantics():
    assert _differs([(None,)], [(0.0,)])
    # NaN is a VALUE in a float column: NaN == NaN under the canon.
    assert not _differs([(float("nan"),)], [(float("nan"),)])
    assert _differs([(float("nan"),)], [(0.0,)])


def test_negative_zero_is_normalized():
    """-0.0 == 0.0 for equality but str()-sorts differently — without
    normalization, equal multisets containing a -0.0 (one engine's
    tiny negative rounding down, the other's +0.0) misalign in the
    canonical row sort and cascade into bogus mismatches (the sf1
    emb_normalize finding). The canon must map both to +0.0,
    including tiny values that ROUND to -0.0."""
    assert not _differs([(-0.0,)], [(0.0,)])
    assert not _differs([(-1e-9,)], [(0.0,)])  # rounds to -0.0 pre-fix
    # ...and multisets mixing signs of zero with nearby values align:
    a = [(-1e-9,), (-0.0001,)]
    b = [(0.0,), (-0.0001,)]
    assert not _differs(a, b)
    canon = canonicalize(["v"], [(-1e-9,)])
    assert str(canon[0][0]) == "('f', 0.0)"


# ---------------------------------------------------------------------------
# Cutoff placement invariants
# ---------------------------------------------------------------------------


def test_cutoff_constants_are_the_documented_ones():
    """The floors asserted above are derived from these constants; a
    drive-by change to either must consciously revisit this file."""
    assert ROUND_DIGITS == 6
    assert SIG_DIGITS == 12
    assert _SIG_CUTOFF == 1e9


def test_round6_is_exact_in_float64_below_cutoff():
    """Below the cutoff round(x, 6) asks for <= 15 significant digits,
    inside float64's exact domain — the property that makes the
    driver's round(,6) well-defined there and the cutoff placement
    correct. At the cutoff itself the requirement crosses 16."""
    just_below = 0.999 * _SIG_CUTOFF  # largest decade below the cutoff
    digits_needed = math.floor(math.log10(just_below)) + 1 + ROUND_DIGITS
    assert digits_needed <= 15
    digits_at_cutoff = math.floor(math.log10(_SIG_CUTOFF)) + 1 + ROUND_DIGITS
    assert digits_at_cutoff >= 16


def test_widening_is_monotone_at_the_boundary():
    """Values equal under round(x, 6) stay equal under the sig-digit
    canon at the boundary magnitude — green evidence recorded below
    the cutoff remains valid if a value drifts across it between
    scale factors."""
    x = 999_999_999.1234564
    y = 999_999_999.1234565  # equal under round(,6)
    assert round(x, ROUND_DIGITS) == round(y, ROUND_DIGITS)
    fx = float(f"{x:.{SIG_DIGITS}g}")
    fy = float(f"{y:.{SIG_DIGITS}g}")
    assert fx == fy
