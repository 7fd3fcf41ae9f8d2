"""Unit tests for the gate's vectorized comparator (tools/check_oracle):
True must imply classic-repr-path equality; anything uncertain must
return None so the classic path stays authoritative."""

from __future__ import annotations

import numpy as np
import pandas as pd

from tools.check_oracle import fast_compare


def test_permutation_invariant():
    a = pd.DataFrame({"x": [1.0, 2.0, float("nan")], "n": [1, 2, 3]})
    b = pd.DataFrame({"x": [2.0, float("nan"), 1.0], "n": [2, 3, 1]})
    assert fast_compare(a, b) is True


def test_one_ulp_mismatch_detected():
    a = pd.DataFrame({"x": [1.0, 2.0]})
    c = pd.DataFrame({"x": [1.0, np.nextafter(2.0, 3)]})
    assert fast_compare(a, c) is False


def test_datetime_resolution_normalized():
    d = pd.DataFrame(
        {"t": pd.to_datetime(["2024-01-01 00:00:01"]).astype("datetime64[ns]")}
    )
    e = pd.DataFrame(
        {"t": pd.to_datetime(["2024-01-01 00:00:01"]).astype("datetime64[us]")}
    )
    assert fast_compare(d, e) is True


def test_unsupported_dtypes_defer_to_classic():
    s = pd.DataFrame({"s": ["a"]})
    assert fast_compare(s, s) is None  # strings
    n = pd.DataFrame({"n": pd.array([1, None], dtype="Int64")})
    assert fast_compare(n, n) is None  # nullable extension ints


def test_int_float_pair_roundtrip_guard():
    # ANY int-vs-float dtype pair defers to classic: the classic repr
    # compare renders 5 vs 5.0 as '5' vs '5.0' and FAILs, so a fast-path
    # OK for a numerically-coinciding mixed pair would mask a
    # Spark/oracle column-type drift the driver gate flags.
    v = 2**53 + 1  # not representable in float64
    i = pd.DataFrame({"n": [v, 1]})
    f = pd.DataFrame({"n": [float(v), 1.0]})
    assert fast_compare(i, f) is None  # classic decides
    i2 = pd.DataFrame({"n": [2**60, 1]})
    f2 = pd.DataFrame({"n": [float(2**60), 1.0]})
    assert fast_compare(i2, f2) is None  # lossless cast exists, still defer


def test_signed_zero_distinct():
    # the classic repr path distinguishes -0.0 from 0.0; so must we
    assert (
        fast_compare(pd.DataFrame({"z": [0.0]}), pd.DataFrame({"z": [-0.0]}))
        is False
    )


def test_nan_payloads_canonicalized():
    weird_nan = np.int64(0x7FF8000000000001).view("float64") * 1  # payload NaN
    a = pd.DataFrame({"x": [float("nan")]})
    b = pd.DataFrame({"x": [weird_nan]})
    assert fast_compare(a, b) is True


def test_mismatch_samples_are_surfaced():
    # a False verdict on a frame too large to re-adjudicate classically
    # must still carry actionable samples (ADVICE r8): the comparator
    # appends up to 3 (column, spark, oracle) raw-value pairs
    a = pd.DataFrame({"x": [1.0, 2.0, 3.0], "k": [1, 2, 3]})
    b = pd.DataFrame({"x": [1.0, 2.5, 3.5], "k": [1, 2, 3]})
    samples: list = []
    assert fast_compare(a, b, samples_out=samples) is False
    assert 1 <= len(samples) <= 3
    assert any("2.5" in s or "3.5" in s for s in samples)
    # equality never populates samples
    samples = []
    assert fast_compare(a, a.copy(), samples_out=samples) is True
    assert samples == []
