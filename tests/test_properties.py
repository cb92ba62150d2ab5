"""Property-based tests (hypothesis) for pure-Python kernels:
schema-evolution gate, sort comparator, matcher, partition-spec
parsing. No SparkSession needed — these run fast and explore corners
example tests miss."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import types as T

from ice_spark.catalog.schema import SchemaIncompatibleError, check_compatible, is_compatible
from ice_spark.catalog.transforms import SortField, parse_partition_spec
from ice_spark.ingest.inspect import _cmp_rows

# --- schema gate -------------------------------------------------------------

_PRIMS = [
    T.IntegerType(),
    T.LongType(),
    T.FloatType(),
    T.DoubleType(),
    T.StringType(),
    T.BooleanType(),
    T.DateType(),
    T.DecimalType(10, 2),
    T.DecimalType(20, 2),
]


@st.composite
def _schemas(draw, max_fields=5):
    n = draw(st.integers(1, max_fields))
    fields = []
    for i in range(n):
        dt = draw(st.sampled_from(_PRIMS))
        nullable = draw(st.booleans())
        fields.append(T.StructField(f"c{i}", dt, nullable))
    return T.StructType(fields)


@given(_schemas())
@settings(max_examples=60, deadline=None)
def test_schema_self_compatible(schema):
    """Reflexivity: every schema is a subset of itself."""
    check_compatible(schema, schema)


@given(_schemas())
@settings(max_examples=60, deadline=None)
def test_dropping_optional_field_stays_compatible(schema):
    optionals = [f for f in schema.fields if f.nullable]
    if not optionals:
        return
    reduced = T.StructType([f for f in schema.fields if f is not optionals[0]])
    check_compatible(reduced, schema)


@given(_schemas())
@settings(max_examples=60, deadline=None)
def test_extra_field_always_rejected(schema):
    extended = T.StructType(
        list(schema.fields) + [T.StructField("zz_extra", T.StringType(), True)]
    )
    assert not is_compatible(extended, schema)


@given(st.integers(1, 38), st.integers(1, 38), st.integers(0, 10), st.integers(0, 10))
@settings(max_examples=80, deadline=None)
def test_decimal_promotion_law(p1, p2, s1, s2):
    """decimal(p1,s1) → decimal(p2,s2) accepted iff s1==s2 and p1<=p2."""
    s1 = min(s1, p1)
    s2 = min(s2, p2)
    a = T.StructType([T.StructField("d", T.DecimalType(p1, s1), True)])
    b = T.StructType([T.StructField("d", T.DecimalType(p2, s2), True)])
    expected = s1 == s2 and p1 <= p2
    assert is_compatible(a, b) == expected


# --- sort comparator ---------------------------------------------------------

_vals = st.one_of(st.none(), st.integers(-100, 100))


@given(
    st.lists(st.tuples(_vals, _vals), min_size=2, max_size=2),
    st.booleans(),
    st.one_of(st.none(), st.booleans()),
)
@settings(max_examples=200, deadline=None)
def test_cmp_rows_antisymmetric(pairs, desc, null_first):
    order = [SortField("a", desc=desc, null_first=null_first),
             SortField("b", desc=not desc, null_first=null_first)]
    a, b = tuple(pairs[0]), tuple(pairs[1])
    assert _cmp_rows(a, b, order) == -_cmp_rows(b, a, order)
    assert _cmp_rows(a, a, order) == 0


@given(st.lists(st.one_of(st.none(), st.integers(-50, 50)), min_size=3, max_size=3))
@settings(max_examples=100, deadline=None)
def test_cmp_rows_matches_python_sort_asc_nulls_first(vals):
    """asc nulls-first total order == Python sort with None lowest."""
    order = [SortField("a")]
    rows = [(v,) for v in vals]
    by_cmp = sorted(rows, key=lambda r: _key(r, order))
    py = sorted(rows, key=lambda r: (r[0] is not None, r[0] if r[0] is not None else 0))
    assert by_cmp == py


def _key(row, order):
    import functools

    return functools.cmp_to_key(lambda a, b: _cmp_rows(a, b, order))(row)


def test_cmp_rows_matches_python_sort_total():
    import functools
    import itertools

    order = [SortField("a", desc=True, null_first=False)]
    rows = [(v,) for v in [None, 3, -1, None, 7, 0]]
    got = sorted(rows, key=functools.cmp_to_key(lambda a, b: _cmp_rows(a, b, order)))
    # desc nulls_last: 7, 3, 0, -1, None, None
    assert got == [(7,), (3,), (0,), (-1,), (None,), (None,)]


# --- partition spec parsing --------------------------------------------------

@given(st.sampled_from(["identity", "year", "month", "day", "hour"]))
def test_parse_simple_transforms(tr):
    [f] = parse_partition_spec([{"column": "c", "transform": tr}])
    assert f.transform == tr and f.param is None


@given(st.integers(1, 4096))
def test_parse_param_transforms(n):
    [f] = parse_partition_spec([{"column": "c", "transform": f"bucket[{n}]"}])
    assert f.param == n
    [g] = parse_partition_spec([{"column": "c", "transform": f"truncate[{n}]"}])
    assert g.param == n


def test_parse_rejects_bad_transforms():
    import pytest

    for bad in ["bucket", "truncate", "frobnicate", "bucket[x]", ""]:
        with pytest.raises(ValueError):
            parse_partition_spec([{"column": "c", "transform": bad}])


# --- decimal two's-complement (Iceberg bucket serialization) -----------------


@given(st.integers(min_value=-(10**30), max_value=10**30))
@settings(max_examples=300, deadline=None)
def test_decimal_bytes_match_java_biginteger(n):
    """Model Java BigInteger.toByteArray: minimal big-endian
    two's-complement, round-trips, and minimality (no redundant
    leading byte)."""
    from ice_spark.catalog.iceberg_transforms import _decimal_unscaled_bytes

    b = _decimal_unscaled_bytes(n)
    assert int.from_bytes(b, "big", signed=True) == n  # round trip
    if len(b) > 1:
        # minimality: dropping the first byte must change the value
        assert int.from_bytes(b[1:], "big", signed=True) != n


# --- bloom membership (driver probe vs build spec) ---------------------------


@given(st.lists(st.integers(min_value=-(2**40), max_value=2**40), min_size=1, max_size=50))
@settings(max_examples=100, deadline=None)
def test_bloom_positions_deterministic_and_in_range(keys):
    from ice_spark.catalog.fileindex import _py_positions

    for k in keys:
        pos = _py_positions(str(k), 4096, 5)
        assert pos == _py_positions(str(k), 4096, 5)  # deterministic
        assert all(0 <= p < 4096 for p in pos)
        assert len(pos) == 5
