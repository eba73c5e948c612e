"""Property-based tests (hypothesis) — SURVEY.md §5.5.

One Spark job per example is slow, so examples are few but each is a
structured random batch; shrinking still isolates minimal failures.
"""

from __future__ import annotations

import datetime as dt

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

# names must avoid the line-protocol escape-ambiguous characters
# (backslash, newline); everything else printable is fair game
_NAME = st.text(
    alphabet=st.characters(
        codec="ascii",
        min_codepoint=0x21,
        max_codepoint=0x7E,
        exclude_characters="\\\"'",
    ),
    min_size=1,
    max_size=12,
)
_ROW = st.tuples(
    st.integers(min_value=0, max_value=2**40).map(
        lambda us: dt.datetime(2020, 1, 1) + dt.timedelta(microseconds=us)
    ),
    _NAME,
    _NAME,
    st.floats(
        allow_nan=False,
        allow_infinity=False,
        min_value=-1e12,
        max_value=1e12,
    ),
)


@settings(max_examples=6, deadline=None)
@given(st.lists(_ROW, min_size=1, max_size=20))
def test_line_protocol_round_trip_property(spark, rows):
    """parse(render(points)) == points for arbitrary names/values."""
    from iot_system_plc_data_to_influxdb_spark.streaming.influx import (
        parse_line_protocol,
        to_line_protocol,
    )

    # dedup (ip, alias) keys so the comparison below is well-defined
    uniq = {(ip, al): (ts, ip, al, v) for ts, ip, al, v in rows}
    pts = spark.createDataFrame(
        list(uniq.values()),
        "ts timestamp, plc_ip string, alias string, value double",
    )
    back = parse_line_protocol(to_line_protocol(pts)).collect()
    got = {(r["measurement"], r["field"]): r for r in back}
    assert set(got) == set(uniq)
    for (ip, al), (ts, _ip, _al, v) in uniq.items():
        r = got[(ip, al)]
        assert r["ts"] == ts
        assert r["value"] == v


_TEXT = st.text(
    alphabet=st.characters(
        codec="ascii",
        min_codepoint=0x20,
        max_codepoint=0x7E,
        exclude_characters='\\"',
    ),
    max_size=30,
)


@settings(max_examples=6, deadline=None)
@given(st.lists(_TEXT, min_size=1, max_size=10))
def test_line_protocol_string_field_property(spark, texts):
    """Quoted string field values survive parsing verbatim — spaces,
    commas, and '=' inside the quotes included — with numeric value
    null and value_raw carrying the unquoted text."""
    from iot_system_plc_data_to_influxdb_spark.streaming.influx import (
        parse_line_protocol,
    )

    lines = spark.createDataFrame(
        [
            (f'm{i},tag=x k{i}="{txt}" 1704067200000000000',)
            for i, txt in enumerate(texts)
        ],
        "line string",
    )
    got = {r["field"]: r for r in parse_line_protocol(lines).collect()}
    assert set(got) == {f"k{i}" for i in range(len(texts))}
    for i, txt in enumerate(texts):
        r = got[f"k{i}"]
        assert r["value_raw"] == txt, (txt, r["value_raw"])
        assert r["value"] is None
        assert r["measurement"] == f"m{i}" and r["tags"] == {"tag": "x"}


@settings(max_examples=6, deadline=None)
@given(
    st.lists(_ROW, min_size=2, max_size=40),
    st.integers(min_value=2, max_value=5),
)
def test_rollup_merge_property(spark, rows, factor):
    """reaggregate(rollup(fine)) == rollup(coarse) for any coarsening
    factor — the mergeable-aggregate invariant that makes MV routing
    and map-side combine correct at any scale."""
    from iot_system_plc_data_to_influxdb_spark.streaming.rollup import (
        batch_downsample,
        reaggregate_rollup,
    )

    pts = spark.createDataFrame(
        rows, "ts timestamp, plc_ip string, alias string, value double"
    )
    fine = batch_downsample(pts, "60 seconds")
    merged = reaggregate_rollup(fine, f"{60 * factor} seconds")
    direct = batch_downsample(pts, f"{60 * factor} seconds")
    key = lambda r: (r["bucket_start"], r["plc_ip"], r["alias"])  # noqa: E731
    md = {key(r): r for r in merged.collect()}
    dd = {key(r): r for r in direct.collect()}
    assert set(md) == set(dd)
    for k in md:
        for c in ("n", "min_value", "max_value", "sum_value", "avg_value"):
            assert md[k][c] == dd[k][c], (k, c)


@settings(max_examples=5, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=2**20).map(
                lambda s: dt.datetime(2024, 1, 1) + dt.timedelta(seconds=s)
            ),
            st.sampled_from(["a", "b", "c", "d"]),
            st.floats(allow_nan=False, allow_infinity=False,
                      min_value=-1e6, max_value=1e6),
        ),
        min_size=1,
        max_size=40,
    ),
    st.lists(st.sampled_from(["a", "b", "c", "d"]), min_size=1, max_size=3,
             unique=True),
)
def test_or_group_equals_union_property(spark, rows, picked):
    """A compiled OR group selects exactly the union of the per-value
    single-equality queries — the multi-value-variable contract."""
    from iot_system_plc_data_to_influxdb_spark.functions.influxql import (
        compile_influxql,
    )

    pts = spark.createDataFrame(
        rows, "ts timestamp, plc_ip string, value double"
    )
    disj = " OR ".join(f"\"plc_ip\" = '{v}'" for v in picked)
    got = compile_influxql(
        f"SELECT count(value) AS n FROM m WHERE ({disj})", pts
    ).collect()[0]["n"]
    per = sum(
        compile_influxql(
            f"SELECT count(value) AS n FROM m WHERE \"plc_ip\" = '{v}'", pts
        ).collect()[0]["n"]
        for v in picked
    )
    assert got == per


@settings(max_examples=5, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=2**20).map(
                lambda s: dt.datetime(2024, 1, 1) + dt.timedelta(seconds=s)
            ),
            st.sampled_from(["x", "y"]),
            st.floats(allow_nan=False, allow_infinity=False,
                      min_value=1.0, max_value=1e6),
            st.floats(allow_nan=False, allow_infinity=False,
                      min_value=1.0, max_value=1e6),
        ),
        min_size=1,
        max_size=40,
    )
)
def test_field_arithmetic_equals_separate_queries(spark, rows):
    """mean(a)/mean(b) compiled as one statement equals the quotient of
    the two separately-compiled aggregates, bitwise, per series."""
    from iot_system_plc_data_to_influxdb_spark.functions.influxql import (
        compile_influxql,
    )

    pts = spark.createDataFrame(
        rows, "ts timestamp, plc_ip string, value double, other double"
    )
    ratio = {
        r["plc_ip"]: r["r"]
        for r in compile_influxql(
            "SELECT mean(value) / mean(other) AS r FROM m GROUP BY plc_ip",
            pts,
        ).collect()
    }
    num = {
        r["plc_ip"]: r["m"]
        for r in compile_influxql(
            "SELECT mean(value) AS m FROM m GROUP BY plc_ip", pts
        ).collect()
    }
    den = {
        r["plc_ip"]: r["m"]
        for r in compile_influxql(
            "SELECT mean(other) AS m FROM m GROUP BY plc_ip", pts
        ).collect()
    }
    assert set(ratio) == set(num) == set(den)
    for k in ratio:
        assert ratio[k] == num[k] / den[k]


# --- b19_span_dedup: Spark islands-merge vs a direct Python oracle ----------

def _py_spans(docs: dict[int, list[str]], L: int = 5):
    """Reference implementation: duplicated L-gram starts merged into
    maximal spans (gap > L breaks)."""
    grams = {}
    for d, toks in docs.items():
        for i in range(len(toks) - L + 1):
            grams.setdefault(tuple(toks[i : i + L]), set()).add(d)
    dup = {g for g, ds in grams.items() if len(ds) >= 2}
    out = set()
    for d, toks in docs.items():
        starts = [
            i
            for i in range(len(toks) - L + 1)
            if tuple(toks[i : i + L]) in dup
        ]
        if not starts:
            continue
        span = [starts[0], starts[0]]
        for i in starts[1:]:
            if i - span[1] > L:
                out.add((d, span[0], span[1] + L - 1))
                span = [i, i]
            else:
                span[1] = i
        out.add((d, span[0], span[1] + L - 1))
    return out


@settings(max_examples=5, deadline=None)
@given(
    st.lists(
        st.lists(
            st.sampled_from(["a", "b", "c"]),  # tiny vocab forces collisions
            min_size=1,
            max_size=30,
        ),
        min_size=2,
        max_size=10,
    )
)
def test_span_dedup_matches_python_oracle(spark, token_lists):
    import iot_system_plc_data_to_influxdb_spark.plans as plans_mod
    from iot_system_plc_data_to_influxdb_spark.plans.northstar import (
        b19_span_dedup,
    )

    docs = {i: toks for i, toks in enumerate(token_lists)}
    # drive the registered plan through a monkeyless path: build the
    # same dataframe shape the query reads, via a temp parquet dir
    import tempfile

    with tempfile.TemporaryDirectory() as td:
        spark.createDataFrame(
            [(d, " ".join(toks), "en", "src", len(" ".join(toks))) for d, toks in docs.items()],
            "doc_id bigint, text string, lang string, source string, n_chars bigint",
        ).write.mode("overwrite").parquet(f"{td}/documents.parquet")
        got = {
            (r["doc_id"], r["start_tok"], r["end_tok"])
            for r in b19_span_dedup(spark, td).collect()
        }
    assert got == _py_spans(docs)


# --- InfluxQL parser totality: garbage in → InfluxQLError out, never a
# bare KeyError/IndexError/AttributeError (the "no silent fallback"
# contract the round-2 advisor probed with hand-built edge cases) -----------

_INFLUX_FRAGMENTS = st.sampled_from(
    [
        "SELECT", "FROM", "WHERE", "GROUP BY", "ORDER BY", "LIMIT",
        "SLIMIT", "fill(", "time(", "mean(", "value", "points", "*",
        "(", ")", ",", "'x'", '"tag"', "=~ /re/", "AND", "OR", "1h",
        "now()", "-", "/", "time", "DESC", "INTO", "tz('UTC')", "::field",
        "0.5", ";", "''",
    ]
)


@settings(max_examples=300, deadline=None)
@given(st.lists(_INFLUX_FRAGMENTS, min_size=1, max_size=12))
def test_influxql_parse_total_on_fragment_soup(frags):
    from iot_system_plc_data_to_influxdb_spark.functions.influxql import (
        InfluxQLError,
        parse,
    )

    q = " ".join(frags)
    try:
        parse(q)
    except InfluxQLError:
        pass  # the contract: malformed input fails loudly AND typed


@settings(max_examples=200, deadline=None)
@given(
    st.text(
        alphabet=st.characters(codec="ascii", min_codepoint=0x20, max_codepoint=0x7E),
        min_size=0,
        max_size=60,
    )
)
def test_influxql_parse_total_on_ascii_noise(s):
    from iot_system_plc_data_to_influxdb_spark.functions.influxql import (
        InfluxQLError,
        parse,
    )

    try:
        parse(s)
    except InfluxQLError:
        pass


# --- InfluxQL compile+execute totality over a generated grammar ------------
# Grafana emits combinatorial SELECT shapes; every VALID combination the
# grammar below builds must compile to a runnable plan (or reject with
# the typed error) — no bare exceptions, no crash in .collect().

_AGG = st.sampled_from(["mean", "max", "min", "sum", "count", "last", "first"])
_TRANSFORM = st.sampled_from(
    ["", "derivative", "non_negative_derivative", "difference",
     "moving_average", "cumulative_sum",
     # 1.8 technical-analysis suite (all take a period argument)
     "exponential_moving_average", "double_exponential_moving_average",
     "triple_exponential_moving_average", "triple_exponential_derivative",
     "relative_strength_index", "chande_momentum_oscillator",
     "kaufmans_efficiency_ratio", "kaufmans_adaptive_moving_average"]
)
_TA_NAMES = frozenset(
    n for n in (
        "exponential_moving_average", "double_exponential_moving_average",
        "triple_exponential_moving_average", "triple_exponential_derivative",
        "relative_strength_index", "chande_momentum_oscillator",
        "kaufmans_efficiency_ratio", "kaufmans_adaptive_moving_average",
    )
)
_FILL = st.sampled_from(["", "fill(previous)", "fill(0)", "fill(none)", "fill(linear)"])
_BUCKET = st.sampled_from(["10m", "1h", "6h"])
_WHERE = st.sampled_from(
    ["", "WHERE time >= '2024-01-02' AND time < '2024-01-05'",
     "WHERE \"plc\" = '10.0.0.1'", "WHERE value > 10"]
)
_TAIL = st.sampled_from(
    ["", "ORDER BY time DESC", "LIMIT 5", "ORDER BY time DESC LIMIT 3",
     "SLIMIT 2", "LIMIT 4 SLIMIT 1 SOFFSET 1"]
)


_FIELD = st.sampled_from(["value", "/val/", '"value"::field'])


@st.composite
def _influxql_query(draw):
    agg = draw(_AGG)
    tr = draw(_TRANSFORM)
    sel = f"{agg}({draw(_FIELD)})"
    if tr == "moving_average":
        sel = f"moving_average({sel}, 3)"
    elif tr in _TA_NAMES:
        sel = f"{tr}({sel}, {draw(st.sampled_from([2, 3, 5]))})"
    elif tr:
        sel = f"{tr}({sel})"
    where = draw(_WHERE)
    fill = draw(_FILL)
    bucket = draw(_BUCKET)
    tail = draw(_TAIL)
    return f"SELECT {sel} FROM points {where} GROUP BY time({bucket}) {fill} {tail}".strip()


# selector / math / paging shapes over the raw (non-time-grouped) path
_RAW_SEL = st.sampled_from(
    ["top(value, 3)", "bottom(value, 2)", "top(value, plc, 2)",
     "bottom(value, plc, 1)", "sample(value, 3)", "distinct(value)",
     "pow(value, 2)", "log(value, 2)", "atan2(value, 2)", "abs(value)"]
)
_RAW_GROUP = st.sampled_from(["", "GROUP BY plc"])


@st.composite
def _influxql_raw_query(draw):
    sel = draw(_RAW_SEL)
    where = draw(_WHERE)
    group = draw(_RAW_GROUP)
    tail = draw(_TAIL)
    return f"SELECT {sel} FROM points {where} {group} {tail}".strip()


@st.composite
def _influxql_hw_query(draw):
    # predictor grammar: sole select item, GROUP BY time required;
    # fill()/tz() combinations must reject TYPED, which this exercises
    fn = draw(st.sampled_from(["holt_winters", "holt_winters_with_fit"]))
    season = draw(st.sampled_from([0, 4]))
    n = draw(st.sampled_from([1, 3]))
    where = draw(_WHERE)
    fill = draw(_FILL)
    tail = draw(_TAIL)
    return (
        f"SELECT {fn}(mean(value), {n}, {season}) FROM points {where} "
        f"GROUP BY time({draw(_BUCKET)}) {fill} {tail}"
    ).strip()


@settings(max_examples=30, deadline=None)
@given(
    st.one_of(_influxql_query(), _influxql_raw_query(), _influxql_hw_query())
)
def test_influxql_compile_grammar_total(spark, q):
    from iot_system_plc_data_to_influxdb_spark.functions.influxql import (
        InfluxQLError,
        compile_statement,
    )

    pts = spark.createDataFrame(
        [
            (f"2024-01-0{1 + i % 6}T{i % 24:02d}:00:00", "10.0.0.%d" % (i % 2), "t1", float(i))
            for i in range(48)
        ],
        "ts_s string, plc string, alias string, value double",
    ).select(
        F.col("ts_s").cast("timestamp").alias("ts"), "plc", "alias", "value"
    )
    try:
        out = compile_statement(q, pts)
    except InfluxQLError:
        return  # typed rejection is a valid outcome
    rows = out.collect()  # plan must actually execute
    assert rows is not None
