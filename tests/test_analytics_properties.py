"""Property tests for the round-7 analytics operators — each checked
against an independent pure-Python reference on hypothesis-generated
event tables (the non-oracle leg of SURVEY.md §5.5: the DuckDB gate
proves Spark==SQL; these prove both match the textbook definition).

All five operators quantize value to integer cents and use either
exact integer algebra or single IEEE operations, so the comparisons
are EXACT equality, not tolerances."""

from __future__ import annotations

import datetime
import sys
import tempfile

from hypothesis import given, settings, strategies as st

sys.path.insert(0, "/root/repo")

_T0 = datetime.datetime(2024, 1, 1)

# (event_type_idx, minute_offset, cents) rows; small grids force ties
_EVENT = st.tuples(
    st.integers(min_value=0, max_value=2),
    st.integers(min_value=0, max_value=5000),
    st.integers(min_value=0, max_value=3000),
)


def _write_events(spark, rows, td):
    data = [
        (
            i,
            _T0 + datetime.timedelta(minutes=mins, seconds=i % 7),
            i % 5,
            f"t{et}",
            cents / 100.0,
            "{}",
        )
        for i, (et, mins, cents) in enumerate(rows)
    ]
    spark.createDataFrame(
        data,
        "event_id bigint, ts timestamp, user_id bigint, "
        "event_type string, value double, props string",
    ).write.mode("overwrite").parquet(f"{td}/events.parquet")


def _round_ratio(num: int, den: int, digits: int = 4) -> float:
    scale = 10**digits
    if num >= 0:
        n = 2 * num * scale + den
        return (n - n % (2 * den)) // (2 * den) / scale
    n = 2 * (-num) * scale + den
    return -((n - n % (2 * den)) // (2 * den)) / scale


@settings(max_examples=5, deadline=None)
@given(st.lists(_EVENT, min_size=8, max_size=60))
def test_acf_matches_python_reference(spark, rows):
    from iot_system_plc_data_to_influxdb_spark.plans.timeseries import b23_acf

    with tempfile.TemporaryDirectory() as td:
        _write_events(spark, rows, td)
        got = {
            (r["event_type"], r["lag"]): (r["n"], r["acf"])
            for r in b23_acf(spark, td).collect()
        }
    # python reference: discretized-mean ACF over (ts, event_id) order
    series: dict = {}
    for i, (et, mins, cents) in enumerate(rows):
        ts = _T0 + datetime.timedelta(minutes=mins, seconds=i % 7)
        series.setdefault(f"t{et}", []).append((ts, i, cents))
    for et, pts in series.items():
        pts.sort()
        cs = [c for _, _, c in pts]
        n, s = len(cs), sum(cs)
        mean_c = ((2 * s + n) - (2 * s + n) % (2 * n)) // (2 * n)
        dev = [c - mean_c for c in cs]
        den = sum(d * d for d in dev)
        for lag in (1, 2, 3):
            num = sum(dev[i] * dev[i - lag] for i in range(lag, n))
            if n <= lag:
                expect = None  # no lagged terms: SUM over nothing = NULL
            elif den == 0:
                expect = None  # constant series: integer div by zero
            else:
                expect = _round_ratio(num, den)
            assert got[(et, lag)] == (n, expect), (et, lag)


@settings(max_examples=5, deadline=None)
@given(st.lists(_EVENT, min_size=8, max_size=60))
def test_changepoint_matches_python_argmax(spark, rows):
    from iot_system_plc_data_to_influxdb_spark.plans.timeseries import (
        b23_changepoint,
    )

    with tempfile.TemporaryDirectory() as td:
        _write_events(spark, rows, td)
        got = {
            r["event_type"]: (r["n"], r["k_star"], r["d_max"])
            for r in b23_changepoint(spark, td).collect()
        }
    series: dict = {}
    for i, (et, mins, cents) in enumerate(rows):
        ts = _T0 + datetime.timedelta(minutes=mins, seconds=i % 7)
        series.setdefault(f"t{et}", []).append((ts, i, cents))
    for et, pts in series.items():
        pts.sort()
        cs = [c for _, _, c in pts]
        n, sn = len(cs), sum(cs)
        if n < 2:
            assert et not in got  # k < n leaves no candidate
            continue
        best = None
        ck = 0
        for k in range(1, n):  # candidates k = 1..n-1
            ck += cs[k - 1]
            dk = abs(n * ck - k * sn)
            if best is None or dk > best[1]:
                best = (k, dk)
        assert got[et] == (n, best[0], best[1]), et


@settings(max_examples=5, deadline=None)
@given(st.lists(_EVENT, min_size=4, max_size=60))
def test_event_transitions_match_python_bigrams(spark, rows):
    from iot_system_plc_data_to_influxdb_spark.plans.streaming_parity import (
        b27_event_transitions,
    )

    with tempfile.TemporaryDirectory() as td:
        _write_events(spark, rows, td)
        got = {
            (r["from_event"], r["to_event"]): (r["n_transitions"], r["p"])
            for r in b27_event_transitions(spark, td).collect()
        }
    per_user: dict = {}
    for i, (et, mins, cents) in enumerate(rows):
        ts = _T0 + datetime.timedelta(minutes=mins, seconds=i % 7)
        per_user.setdefault(i % 5, []).append((ts, i, f"t{et}"))
    counts: dict = {}
    for seq in per_user.values():
        seq.sort()
        for (_, _, a), (_, _, b) in zip(seq, seq[1:]):
            counts[(a, b)] = counts.get((a, b), 0) + 1
    totals: dict = {}
    for (a, _), c in counts.items():
        totals[a] = totals.get(a, 0) + c
    expect = {
        pair: (c, _round_ratio(c, totals[pair[0]]))
        for pair, c in counts.items()
    }
    assert got == expect


@settings(max_examples=5, deadline=None)
@given(st.lists(_EVENT, min_size=45, max_size=80))
def test_bollinger_bands_match_python_reference(spark, rows):
    import math

    from iot_system_plc_data_to_influxdb_spark.plans.timeseries import (
        b12_bollinger,
    )

    with tempfile.TemporaryDirectory() as td:
        _write_events(spark, rows, td)
        got = {
            (r["event_type"], r["event_id"]): (
                r["price"], r["ma"], r["upper_band"], r["lower_band"]
            )
            for r in b12_bollinger(spark, td).collect()
        }
    series: dict = {}
    for i, (et, mins, cents) in enumerate(rows):
        if i % 5 >= 40:  # plan filters user_id < 40; user_id = i % 5
            continue
        ts = _T0 + datetime.timedelta(minutes=mins, seconds=i % 7)
        series.setdefault(f"t{et}", []).append((ts, i, cents))
    expect = {}
    for et, pts in series.items():
        pts.sort()
        cs = [c for _, _, c in pts]
        for j in range(19, len(cs)):
            win = cs[j - 19 : j + 1]
            s, q, n = sum(win), sum(c * c for c in win), 20
            ma = float(s) / (100 * n)
            sd = math.sqrt(float(n * q - s * s) / float(n * n)) / 100
            expect[(et, pts[j][1])] = (cs[j] / 100.0, ma, ma + 2 * sd, ma - 2 * sd)
    assert got == expect


@settings(max_examples=5, deadline=None)
@given(st.lists(_EVENT, min_size=10, max_size=60))
def test_theil_sen_matches_python_median_of_slopes(spark, rows):
    from iot_system_plc_data_to_influxdb_spark.plans.timeseries import (
        b24_theil_sen,
    )

    with tempfile.TemporaryDirectory() as td:
        _write_events(spark, rows, td)
        got = {
            r["event_type"]: (
                r["n_buckets"], r["n_pairs"], r["slope_cents_per_hour"]
            )
            for r in b24_theil_sen(spark, td).collect()
        }
    buckets: dict = {}
    for i, (et, mins, cents) in enumerate(rows):
        ts = _T0 + datetime.timedelta(minutes=mins, seconds=i % 7)
        # UTC-pin the epoch: naive .timestamp() uses the host timezone,
        # which on a fractional-offset host (+05:30) would shift hour
        # buckets relative to Spark's UTC-pinned date_trunc('hour').
        hr = int(
            ts.replace(minute=0, second=0, microsecond=0,
                       tzinfo=datetime.timezone.utc).timestamp()
        ) // 3600
        buckets.setdefault(f"t{et}", {}).setdefault(hr, 0)
        buckets[f"t{et}"][hr] += cents
    for et, b in buckets.items():
        hrs = sorted(b)
        pairs = [
            ((b[hj] - b[hi]) / float(hj - hi), hi, hj)
            for i, hi in enumerate(hrs)
            for hj in hrs[i + 1 :]
        ]
        if not pairs:
            assert et not in got  # single bucket: no slope defined
            continue
        pairs.sort()
        np_, nb = len(pairs), len(hrs)
        med = pairs[(np_ + 1) // 2 - 1][0]  # rank-at-ceil(0.5 n)
        assert got[et] == (nb, np_, med), et


@settings(max_examples=5, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=10**6),
                min_size=1, max_size=40, unique=True))
def test_stratified_sample_is_k_smallest_md5(spark, doc_ids):
    import hashlib
    import tempfile as tf

    from iot_system_plc_data_to_influxdb_spark.plans.northstar import (
        b18_stratified_sample,
    )

    with tf.TemporaryDirectory() as td:
        spark.createDataFrame(
            [(d, "x", f"l{d % 2}", f"s{d % 3}", 1) for d in doc_ids],
            "doc_id bigint, text string, lang string, source string, "
            "n_chars bigint",
        ).write.mode("overwrite").parquet(f"{td}/documents.parquet")
        got = {
            (r["lang"], r["source"]): set()
            for r in b18_stratified_sample(spark, td).collect()
        }
        for r in b18_stratified_sample(spark, td).collect():
            got[(r["lang"], r["source"])].add(r["doc_id"])
    strata: dict = {}
    for d in doc_ids:
        key = (f"l{d % 2}", f"s{d % 3}")
        hk = hashlib.md5(f"strat1|{d}".encode()).hexdigest()
        strata.setdefault(key, []).append((hk, d))
    for key, members in strata.items():
        members.sort()
        expect = {d for _, d in members[:5]}
        assert got.get(key, set()) == expect, key


def test_theil_sen_scale_guard_rejects_unbounded_range(spark):
    """The O(B²) pair join is gated: a series whose bucket count
    exceeds max_buckets raises ScaleGuardError at plan-build time
    instead of submitting a quadratic join."""
    import pytest

    from iot_system_plc_data_to_influxdb_spark.plans.timeseries import (
        ScaleGuardError,
        b24_theil_sen,
    )

    # 6 distinct hourly buckets in one series
    rows = [(0, 60 * h, 100) for h in range(6)]
    with tempfile.TemporaryDirectory() as td:
        _write_events(spark, rows, td)
        with pytest.raises(ScaleGuardError, match="B=6"):
            b24_theil_sen(spark, td, max_buckets=4)
        # at or under the cap the plan builds and runs
        assert b24_theil_sen(spark, td, max_buckets=6).count() == 1


def test_theil_sen_sampled_matches_python_on_md5_subset(spark):
    """The sampled variant keeps each series' K smallest-md5 hourly
    buckets, then medians slopes over that subset — checked against a
    pure-Python replay of the same hash ranking and pair median."""
    import hashlib

    from iot_system_plc_data_to_influxdb_spark.plans.timeseries import (
        b24_theil_sen_sampled,
    )

    rows = [(i % 2, 60 * (i * 7 % 97), (i * 131) % 3000) for i in range(80)]
    with tempfile.TemporaryDirectory() as td:
        _write_events(spark, rows, td)
        got = {
            r["event_type"]: (
                r["n_buckets"], r["n_pairs"], r["slope_cents_per_hour"]
            )
            for r in b24_theil_sen_sampled(spark, td, k=5).collect()
        }
    buckets: dict = {}
    for i, (et, mins, cents) in enumerate(rows):
        ts = _T0 + datetime.timedelta(minutes=mins, seconds=i % 7)
        hr = int(
            ts.replace(minute=0, second=0, microsecond=0,
                       tzinfo=datetime.timezone.utc).timestamp()
        ) // 3600
        buckets.setdefault(f"t{et}", {}).setdefault(hr, 0)
        buckets[f"t{et}"][hr] += cents
    for et, b in buckets.items():
        ranked = sorted(
            b, key=lambda h: (hashlib.md5(f"{et}|{h}".encode()).hexdigest(), h)
        )[:5]
        hrs = sorted(ranked)
        pairs = sorted(
            (b[hj] - b[hi]) / float(hj - hi)
            for i, hi in enumerate(hrs)
            for hj in hrs[i + 1 :]
        )
        med = pairs[(len(pairs) + 1) // 2 - 1]
        assert got[et] == (len(hrs), len(pairs), med), et


@settings(max_examples=25, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.booleans(),                       # scheme https?
            st.booleans(),                       # WWW prefix
            st.booleans(),                       # case-mangle host
            st.sampled_from(["", ":80", ":443", ":8080"]),
            st.lists(st.integers(0, 9), min_size=0, max_size=3),  # path segs
            st.booleans(),                       # /index.html suffix
            st.booleans(),                       # trailing slash
            st.lists(
                st.sampled_from(
                    ["id=1", "id=2", "q=x", "utm_source=a",
                     "utm_campaign=b", "ref=tw", "fbclid=z"]
                ),
                min_size=0, max_size=4, unique=True,
            ),
            st.booleans(),                       # fragment
        ),
        min_size=1, max_size=12,
    )
)
def test_url_canonicalization_matches_python_reference(spark, specs):
    """functions/url.canonical_url (the expression shared by the batch
    dedup query and the streaming ingest filter) equals an independent
    pure-Python canonicalizer on component-fuzzed URLs."""
    from iot_system_plc_data_to_influxdb_spark.functions.url import (
        canonical_url,
    )
    from pyspark.sql import functions as F

    def build(spec):
        https, www, mangle, port, segs, index, slash, params, frag = spec
        # fold a couple of deterministic off-grid schemes into the fuzz
        # space: ftp keeps its :443/:80 (per-scheme default-port rule)
        if port == ":8080" and index and https:
            scheme = "FTP" if mangle else "ftp"
            port = ":443"
        else:
            scheme = "https" if https else ("HTTP" if mangle else "http")
        host = ("WWW." if www and mangle else "www." if www else "")
        host += "Example.COM" if mangle else "example.com"
        path = "".join(f"/s{n}" for n in segs)
        if index:
            path += "/index.html"
        elif slash:
            path += "/"
        q = ("?" + "&".join(params)) if params else ""
        f_ = "#frag" if frag else ""
        return f"{scheme}://{host}{port}{path}{q}{f_}"

    def canon_py(url):
        import re

        m = re.match(r"^([A-Za-z]+)://([^/?#]+)([^?#]*)", url)
        if m is None:
            return None
        scheme, hostport, path = (
            m.group(1).lower(), m.group(2).lower(), m.group(3)
        )
        # per-scheme default port only; other schemes keep their port
        default = {"http": ":80", "https": ":443"}.get(scheme)
        if default and hostport.endswith(default):
            hostport = hostport[: -len(default)]
        if hostport.startswith("www."):
            hostport = hostport[4:]
        path = re.sub(r"/index\.html$", "", path)
        path = re.sub(r"/$", "", path)
        qm = re.search(r"\?([^#]*)", url)
        kept = sorted(
            p for p in (qm.group(1).split("&") if qm else [])
            if p
            and not p.startswith("utm_")
            and not p.startswith("ref=")
            and not p.startswith("fbclid=")
        )
        return f"{scheme}://{hostport}{path}" + (
            "?" + "&".join(kept) if kept else ""
        )

    urls = [build(s) for s in specs]
    # scheme-less / malformed inputs must canonicalize to NULL, never
    # to a '://'-prefixed garbage key that merges distinct junk
    urls += ["example.com/p/1", "not a url", "://host/x", ""]
    got = [
        r["c"]
        for r in spark.createDataFrame([(u,) for u in urls], "url string")
        .select(canonical_url(F.col("url")).alias("c"))
        .collect()
    ]
    assert got == [canon_py(u) for u in urls]


# ---- round-9 operators -------------------------------------------------

_WORDS = ["the", "a", "of", "to", "deep", "net", "graph", "spark", "x1"]
_DOC = st.lists(
    st.integers(min_value=0, max_value=len(_WORDS) - 1),
    min_size=1,
    max_size=30,
)


@settings(max_examples=5, deadline=None)
@given(st.lists(_DOC, min_size=1, max_size=6))
def test_rake_matches_python_reference(spark, docs_idx):
    """b21_rake_keywords vs a pure-Python RAKE on hypothesis-generated
    documents over a mixed stopword/content alphabet — exact equality
    of the full top-5 table (phrases, integer scores, ranks)."""
    import tempfile

    import iot_system_plc_data_to_influxdb_spark.plans as plans

    stop = {"the", "a", "of", "to"}  # subset of functions/text.STOPWORDS
    docs = [" ".join(_WORDS[i] for i in d) for d in docs_idx]

    with tempfile.TemporaryDirectory() as td:
        spark.createDataFrame(
            [(i, t, "en", "s") for i, t in enumerate(docs)],
            "doc_id bigint, text string, lang string, source string",
        ).write.mode("overwrite").parquet(f"{td}/documents.parquet")
        got = {
            (r["doc_id"], r["rank"]): (r["phrase"], r["score"])
            for r in plans.all_queries()["b21_rake_keywords"](
                spark, td
            ).collect()
        }

    expect = {}
    for i, text in enumerate(docs):
        toks = text.split()
        phrases, cur = [], []
        for w in toks:
            if w in stop:
                if cur:
                    phrases.append(cur)
                cur = []
            else:
                cur.append(w)
        if cur:
            phrases.append(cur)
        if not phrases:
            continue
        freq: dict = {}
        deg: dict = {}
        for ph in phrases:
            for w in ph:
                freq[w] = freq.get(w, 0) + 1
                deg[w] = deg.get(w, 0) + len(ph)
        score100 = {
            w: (2 * 100 * deg[w] + freq[w]) // (2 * freq[w]) for w in freq
        }
        scored = sorted(
            ((sum(score100[w] for w in ph), " ".join(ph)) for ph in phrases),
            key=lambda t: (-t[0], t[1]),
        )
        for rk, (sc, ph) in enumerate(scored[:5], start=1):
            expect[(i, rk)] = (ph, sc)
    assert got == expect


def test_backtest_matches_python_holt_reference(spark):
    """b24_backtest vs a pure-Python Holt fit + backtest over the
    sf0.001 events table: n_train = floor(0.8n), fold over the train
    prefix with the textbook recurrence, h-step forecasts against the
    held-out tail, naive = last train value. Exact equality on counts
    and bit-equality on max_abs_err (same IEEE expression tree)."""
    import iot_system_plc_data_to_influxdb_spark.plans as plans
    from iot_system_plc_data_to_influxdb_spark.catalog import t as t_
    from pyspark.sql import functions as SF

    sf = "/root/testdata/sf0.001"
    hourly = (
        t_(spark, sf, "events")
        .groupBy("event_type", SF.date_trunc("hour", "ts").alias("h"))
        .agg(
            (
                SF.sum(SF.col("value").cast("decimal(14,2)")).cast("double")
                / SF.count("*")
            ).alias("y")
        )
        .collect()
    )
    series: dict = {}
    for r in hourly:
        series.setdefault(r["event_type"], []).append((r["h"], r["y"]))
    expect = {}
    for et, pts in series.items():
        ys = [y for _h, y in sorted(pts)]
        n = len(ys)
        n_train = (4 * n) // 5
        tr, te = ys[:n_train], ys[n_train:]
        lvl, trd = tr[0], 0.0
        for y in tr[1:]:
            l_new = 0.2 * y + 0.8 * (lvl + trd)
            trd = 0.1 * (l_new - lvl) + 0.9 * trd
            lvl = l_new
        y_last = tr[-1]
        he = [abs(lvl + (i + 1) * trd - y) for i, y in enumerate(te)]
        ne = [abs(y_last - y) for y in te]
        expect[et] = (
            n_train,
            len(te),
            max(he),
            sum(1 for a, b in zip(he, ne) if a < b),
            sum(1 for a, b in zip(he, ne) if a == b),
        )

    got = {
        r["event_type"]: (
            r["n_train"], r["n_test"], r["max_abs_err"],
            r["n_beats_naive"], r["n_ties"],
        )
        for r in plans.all_queries()["b24_backtest"](spark, sf).collect()
    }
    assert got == expect


def test_ewma_control_detects_planted_shift(spark, tmp_path):
    """b23_ewma_control on a crafted series: a stable process with a
    sustained level shift in its final quarter must flag violations
    starting IN the shifted region (EWMA catches sustained small
    shifts), while a steady twin series stays fully in control."""
    import datetime

    import iot_system_plc_data_to_influxdb_spark.plans as plans

    t0 = datetime.datetime(2024, 1, 1)
    rows = []
    eid = 0
    # 80 hourly points; 'shift' jumps +8 units at hour 60
    for hr in range(80):
        base = 100.0 + (hr % 5) * 0.5  # small stable wiggle
        shift = base + (8.0 if hr >= 60 else 0.0)
        for name, val in (("steady", base), ("shift", shift)):
            rows.append(
                (eid, t0 + datetime.timedelta(hours=hr), 0, name, val, "{}")
            )
            eid += 1
    spark.createDataFrame(
        rows,
        "event_id bigint, ts timestamp, user_id bigint, "
        "event_type string, value double, props string",
    ).write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")

    got = {
        r["event_type"]: r
        for r in plans.all_queries()["b23_ewma_control"](
            spark, str(tmp_path)
        ).collect()
    }
    assert got["shift"]["n_violations"] > 0
    assert got["shift"]["first_violation_h"] >= t0 + datetime.timedelta(
        hours=60
    )
    # the steady series' violations, if any, are boundary noise — the
    # shifted series must dominate decisively
    assert got["shift"]["n_violations"] > got["steady"]["n_violations"]
    assert got["shift"]["max_abs_dev"] > got["steady"]["max_abs_dev"]
