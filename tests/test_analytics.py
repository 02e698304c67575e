"""Exact-value checks of the analytics operators (LTTB, rolling
z-score, seasonal profile, interpolated sketch quantiles, counter
resets) against pure-Python references on adversarial synthetic
series — the cross-engine determinism claims (integer selection
arithmetic, endpoint conventions, tie-breaks) are each exercised
directly here; the DuckDB oracle parity is covered by the registered
queries (`tools/check_oracle.py lttb_6h anomaly_zscore_topk
seasonal_hourly_profile histogram_quantile_1d counter_resets_1d`)."""

from __future__ import annotations

import math
from datetime import datetime, timedelta

from pyspark.sql import functions as F

BASE = datetime(2024, 1, 1)


def _mk_points(n_series=3, n=400):
    """Deterministic, adversarial series: plateaus (area ties), spikes,
    duplicate timestamps (id tie-break), empty stretches (non-adjacent
    buckets), NEGATIVE values (exercises the div-truncates-toward-zero
    anchor arithmetic, where Python's floor-// would diverge)."""
    rows = []
    eid = 0
    for s in range(n_series):
        for i in range(n):
            # gaps: series s skips a stretch of minutes → empty buckets
            minute = i * 7 + (240 if (i // 40) % 3 == s % 3 else 0)
            cents = (i * 2654435761 + s * 97) % 5000 - 2500
            if i % 17 == 0:
                cents += 40000  # spike
            if 100 <= i < 120:
                cents = 1234  # plateau → area2 ties
            ts = BASE + timedelta(minutes=minute)
            rows.append((f"s{s}", ts, eid, int(cents)))
            if i % 53 == 0:  # duplicate timestamp, distinct id
                eid += 1
                rows.append((f"s{s}", ts, eid, int(cents) + 3))
            eid += 1
    return rows


def _tdiv(a, b):
    """Truncation-toward-zero division — Spark `div` / DuckDB `//`
    semantics; Python's `//` floors and diverges on negative sums."""
    q = abs(a) // abs(b)
    return q if (a >= 0) == (b > 0) else -q


def _lttb_reference(rows, span_s):
    """Mirror of the bucket-anchored parallel LTTB semantics."""
    span_us = span_s * 1_000_000
    by_series = {}
    for s, ts, eid, cents in rows:
        x = int((ts - datetime(1970, 1, 1)).total_seconds() * 1_000_000)
        by_series.setdefault(s, []).append((x, eid, cents))
    winners = {}
    for s, pts in by_series.items():
        buckets = {}
        for x, eid, y in pts:
            buckets.setdefault(x // span_us, []).append((x, eid, y))
        order = sorted(buckets)
        anchors = {}
        for i, b in enumerate(order):
            members = buckets[b]
            n, sy = len(members), sum(y for _, _, y in members)
            anchors[b] = (b * span_us + span_us // 2, _tdiv(sy, n))
        for i, b in enumerate(order):
            members = buckets[b]
            if i == 0:
                win = min(members, key=lambda m: (m[0], m[1]))
            elif i == len(order) - 1:
                win = max(members, key=lambda m: (m[0], m[1]))
            else:
                ax, ay = anchors[order[i - 1]]
                cx, cy = anchors[order[i + 1]]
                win = max(
                    members,
                    key=lambda m: (
                        abs((ax - cx) * (m[2] - ay) - (ax - m[0]) * (cy - ay)),
                        -m[0],
                        -m[1],
                    ),
                )
            winners[(s, b)] = win[1]  # id is the identity check
    return winners


def test_lttb_matches_reference(spark):
    from s1tiling_spark.operators.analytics import lttb_downsample

    rows = _mk_points()
    df = spark.createDataFrame(rows, "s string, ts timestamp, eid long, cents long")
    span_s = 3600
    got = lttb_downsample(
        df, keys=["s"], ts_col="ts", cents_col=F.col("cents"),
        bucket_seconds=span_s, id_col="eid",
    ).collect()
    ref = _lttb_reference(rows, span_s)
    got_map = {
        (r["s"],
         int((r["bucket_start"] - datetime(1970, 1, 1)).total_seconds())
         // span_s): r["eid"]
        for r in got
    }
    assert got_map == ref  # reference is keyed by (series, bucket index)
    # endpoint convention: per series, first bucket keeps its earliest
    # point and last bucket its latest
    for s in {r[0] for r in rows}:
        series = [r for r in rows if r[0] == s]
        first = min(series, key=lambda r: (r[1], r[2]))
        last = max(series, key=lambda r: (r[1], r[2]))
        picked = {r["eid"] for r in got if r["s"] == s}
        assert first[2] in picked and last[2] in picked


def test_rolling_zscore_matches_reference(spark):
    from s1tiling_spark.operators.analytics import rolling_zscore

    rows = _mk_points(n_series=2, n=120)
    df = spark.createDataFrame(rows, "s string, ts timestamp, eid long, cents long")
    W, MINP = 16, 6
    got = {
        r["eid"]: r["z"]
        for r in rolling_zscore(
            df, keys=["s"], ts_col="ts", cents_col=F.col("cents"),
            id_col="eid", window_n=W, min_periods=MINP,
        ).collect()
    }
    by_series = {}
    for s, ts, eid, cents in sorted(rows, key=lambda r: (r[0], r[1], r[2])):
        by_series.setdefault(s, []).append((eid, cents))
    n_null = n_val = 0
    for s, seq in by_series.items():
        for i, (eid, y) in enumerate(seq):
            win = [c for _, c in seq[max(0, i - W):i]]
            n = len(win)
            s1, s2 = sum(win), sum(c * c for c in win)
            rad = n * s2 - s1 * s1
            if n >= MINP and rad > 0:
                exp = (y * n - s1) / math.sqrt(rad)
                assert got[eid] == exp, (s, eid)
                n_val += 1
            else:
                assert got[eid] is None, (s, eid)
                n_null += 1
    assert n_val > 100 and n_null > 10


def test_seasonal_profile_matches_reference(spark):
    from s1tiling_spark.operators.analytics import seasonal_profile

    rows = _mk_points(n_series=2, n=200)
    df = spark.createDataFrame(rows, "s string, ts timestamp, eid long, cents long")
    K = 2
    got = {
        (r["s"], r["hod"]): (r["n"], r["baseline"], r["sd"], r["n_outliers"])
        for r in seasonal_profile(
            df, keys=["s"], ts_col="ts", cents_col=F.col("cents"), k_sigma=K,
        ).collect()
    }
    groups = {}
    for s, ts, _eid, cents in rows:
        groups.setdefault((s, ts.hour), []).append(cents)
    assert set(got) == set(groups)
    for key, ys in groups.items():
        n = float(len(ys))
        s1, s2 = float(sum(ys)), float(sum(y * y for y in ys))
        outliers = sum(
            1 for y in ys
            if (y * n - s1) * (y * n - s1) > K * K * (n * s2 - s1 * s1)
        )
        gn, gb, gsd, go = got[key]
        assert gn == len(ys)
        assert gb == s1 / (n * 100.0)
        assert gsd == math.sqrt(n * s2 - s1 * s1) / (n * 100.0)
        assert go == outliers, key


def test_interp_quantiles_match_reference(spark):
    from s1tiling_spark.operators.sketch import sketch_quantiles_interp

    WIDTH = 8
    # long-form sketch: 2 groups with lumpy bucket counts
    sk = [
        ("2024-01-01", "a", 0, 5), ("2024-01-01", "a", 3, 90),
        ("2024-01-01", "a", 4, 1), ("2024-01-01", "a", 9, 4),
        ("2024-01-01", "b", 1, 1),  # single tiny group: p50=p99 bucket
        ("2024-01-02", "a", 2, 50), ("2024-01-02", "a", 7, 50),
    ]
    df = spark.createDataFrame(
        [(datetime.fromisoformat(d), s, q, c) for d, s, q, c in sk],
        "bucket_start timestamp, source string, qbin int, cnt long",
    )
    percents = [(50, "p50"), (90, "p90"), (99, "p99")]
    got = {
        (r["bucket_start"].isoformat(), r["source"]):
            (r["p50"], r["p90"], r["p99"])
        for r in sketch_quantiles_interp(df, percents, width=WIDTH).collect()
    }
    groups = {}
    for d, s, q, c in sk:
        groups.setdefault((d, s), []).append((q, c))
    for (d, s), bins in groups.items():
        bins.sort()
        total = sum(c for _, c in bins)
        exp = []
        for p, _ in percents:
            r = (p * total + 99) // 100
            cum = 0
            for q, c in bins:
                if cum + c >= r and cum < r:
                    exp.append(q * WIDTH + WIDTH * (r - cum) / c)
                    break
                cum += c
        key = (datetime.fromisoformat(d).isoformat(), s)
        assert got[key] == tuple(exp), key
        # interpolated estimate stays inside its bucket's value range
        for v in exp:
            assert any(q * WIDTH <= v <= (q + 1) * WIDTH for q, _ in bins)


def test_counter_resets_matches_reference(spark):
    from s1tiling_spark.operators.rollup import counter_resets

    # counters with wraps, plateaus, and a single-sample series
    rows = []
    eid = 0
    for s, vals in (
        ("a", [0, 5, 9, 2, 2, 7, 1, 1, 0, 50]),   # 3 resets
        ("b", [10, 10, 10]),                        # none
        ("c", [4]),                                 # no predecessor at all
    ):
        for i, v in enumerate(vals):
            rows.append((s, BASE + timedelta(hours=6 * i), eid, v))
            eid += 1
    df = spark.createDataFrame(rows, "s string, ts timestamp, eid long, ctr long")
    got = {
        (r["s"], r["bucket_start"].day): (r["resets"], r["n_samples"])
        for r in counter_resets(
            df, keys=["s"], ts_col="ts", counter_col="ctr", tier="1d",
            order_cols=("eid",),
        ).collect()
    }
    # day 1 of 'a': samples 0..3 → predecessors for 3 of them, 1 reset
    assert got[("a", 1)] == (1, 3)
    assert got[("a", 2)] == (1, 4)   # [2,7,1,1] preceded by 2 → one reset
    assert got[("a", 3)] == (1, 2)   # [0,50] preceded by 1 → reset at 0
    assert got[("b", 1)] == (0, 2)  # first sample has no predecessor
    # a bucket whose every sample lacks a predecessor: NULL resets, 0 n
    assert got[("c", 1)] == (None, 0)


def test_metric_correlation_matches_reference(spark):
    from s1tiling_spark.operators.analytics import metric_correlation

    # 3 series over 3 days: b = 2*a + noiseless (corr 1), c anti-moves
    # vs a on day 1, constant on day 2 (zero variance -> NULL)
    rows = []
    eid = 0
    for d in range(3):
        for h in range(24):
            for m in (0, 30):  # two samples per hour -> mean anchor
                ts = BASE + timedelta(days=d, hours=h, minutes=m)
                a = (h * 37 + m + d) % 101
                rows += [("a", ts, eid, a), ("b", ts, eid + 1, 2 * a + 7)]
                c = -a if d == 0 else (5 if d == 1 else (a * a) % 53)
                rows.append(("c", ts, eid + 2, c))
                eid += 3
    df = spark.createDataFrame(rows, "s string, ts timestamp, eid long, cents long")
    got = {
        (r["et_a"], r["et_b"], r["bucket_start"].day):
            (r["n_buckets"], r["corr"])
        for r in metric_correlation(
            df, key_col="s", ts_col="ts", cents_col=F.col("cents"),
        ).collect()
    }
    # python reference with the same trunc-mean anchors
    anchors = {}
    for s, ts, _eid, cents in rows:
        anchors.setdefault((s, ts.day, ts.hour), []).append(cents)
    series = {}
    for (s, d, h), ys in anchors.items():
        series.setdefault((s, d), {})[h] = _tdiv(sum(ys), len(ys))
    for (sa, sb) in (("a", "b"), ("a", "c"), ("b", "c")):
        for d in (1, 2, 3):
            xs = series[(sa, d)]
            ys = series[(sb, d)]
            common = sorted(set(xs) & set(ys))
            n = float(len(common))
            sx = float(sum(xs[h] for h in common))
            sy = float(sum(ys[h] for h in common))
            sxy = float(sum(xs[h] * ys[h] for h in common))
            sxx = float(sum(xs[h] * xs[h] for h in common))
            syy = float(sum(ys[h] * ys[h] for h in common))
            den = math.sqrt(n * sxx - sx * sx) * math.sqrt(n * syy - sy * sy)
            exp = (n * sxy - sx * sy) / den if den > 0 else None
            gn, gc = got[(sa, sb, d)]
            assert gn == len(common)
            assert gc == exp, (sa, sb, d)
    # sanity on the planted structure
    # near-1: the trunc-mean anchor rounds b's odd sums, so the linear
    # relation is not bit-exact — but anti-correlation IS exact (trunc
    # toward zero is symmetric: anchor(-a) == -anchor(a))
    assert got[("a", "b", 1)][1] > 0.9999
    # anti-correlation is structurally exact (trunc toward zero is
    # symmetric: anchor(-a) == -anchor(a)) but the float moment algebra
    # can overshoot ±1 by an ulp — the cross-engine equality above is
    # the real check
    assert abs(got[("a", "c", 1)][1] + 1.0) < 1e-12
    assert got[("a", "c", 2)][1] is None         # zero variance day


def test_threshold_alerts_semantics(spark):
    from s1tiling_spark.operators.analytics import threshold_alerts

    T, FOR_S = 100, 3600
    rows = []

    def series(s, samples):
        for i, (minute, y) in enumerate(samples):
            rows.append((s, BASE + timedelta(minutes=minute), i, y))

    # a: run of 3 highs spanning exactly 1h (fires, boundary
    # inclusive), broken by a low, then a 2-sample 30-min run (too
    # short), then a PENDING run at series end spanning 2h (fires)
    series("a", [(0, 150), (30, 200), (60, 150), (61, 50),
                 (90, 150), (120, 150), (121, 10),
                 (150, 150), (210, 200), (270, 150)])
    # b: single high sample (duration 0 — never fires), all-low tail
    series("b", [(0, 500), (30, 50), (60, 50)])
    # c: equal-to-threshold is NOT above (strict >)
    series("c", [(0, 100), (30, 100), (60, 100)])
    df = spark.createDataFrame(rows, "s string, ts timestamp, eid long, cents long")
    got = sorted(
        (r["s"], r["alert_start"].minute + r["alert_start"].hour * 60,
         r["alert_end"].minute + r["alert_end"].hour * 60,
         r["n_samples"], r["duration_us"])
        for r in threshold_alerts(
            df, keys=["s"], ts_col="ts", cents_col=F.col("cents"),
            threshold_cents=T, for_duration_s=FOR_S, id_col="eid",
        ).collect()
    )
    assert got == [
        ("a", 0, 60, 3, 3600 * 1_000_000),
        ("a", 150, 270, 3, 7200 * 1_000_000),
    ]


def test_linear_fit_matches_reference(spark):
    """Per-(series, day) least-squares over exact integer moments —
    negative cents exercise the signed numerator; a single-sample day
    and a same-second day must be excluded (denominator 0)."""
    from s1tiling_spark.operators.analytics import linear_fit

    rows = _mk_points(n_series=2, n=100)
    # degenerate groups: one lone sample; one day with every sample in
    # the same second (x identical -> den == 0)
    deg_day = datetime(2024, 3, 1)
    rows += [("deg1", deg_day, 90001, 500)]
    rows += [("deg2", deg_day, 90002 + i, 100 * i) for i in range(5)]
    df = spark.createDataFrame(rows, "s string, ts timestamp, eid long, cents long")
    got = {
        (r["s"], r["bucket_start"]): (r["n"], r["slope_per_hour"], r["predict_end"])
        for r in linear_fit(
            df, keys=["s"], ts_col="ts", cents_col=F.col("cents"), bucket="day"
        ).collect()
    }
    assert ("deg1", deg_day) not in got and ("deg2", deg_day) not in got

    groups = {}
    for s, ts, eid, cents in rows:
        day = datetime(ts.year, ts.month, ts.day)
        x = int((ts - day).total_seconds())  # positive -> floor == trunc
        groups.setdefault((s, day), []).append((x, cents))
    n_checked = 0
    for (s, day), pts in groups.items():
        n = len(pts)
        sx = sum(x for x, _ in pts)
        sy = sum(y for _, y in pts)
        sxy = sum(x * y for x, y in pts)
        sxx = sum(x * x for x, _ in pts)
        num, den = n * sxy - sx * sy, n * sxx - sx * sx
        if den == 0:
            assert (s, day) not in got
            continue
        slope = num / den
        exp_slope = slope * 3600.0 / 100.0
        exp_pred = (sy + slope * (n * 86400.0 - sx)) / n / 100.0
        gn, gs, gp = got[(s, day)]
        assert gn == n
        assert gs == exp_slope and gp == exp_pred, (s, day)
        n_checked += 1
    assert n_checked >= 2


def test_funnel_strict_ordering(spark):
    """Strict step ordering: a step-2 event at or before the first
    step-1 event must not count; re-ordering applies per user."""
    from s1tiling_spark.operators.analytics import funnel

    t = lambda m: BASE + timedelta(minutes=m)  # noqa: E731
    rows = [
        # u1 completes the funnel in order
        (1, t(0), "view"), (1, t(5), "click"), (1, t(9), "purchase"),
        # u2: click BEFORE first view -> no step2; purchase without click ignored
        (2, t(3), "click"), (2, t(4), "view"), (2, t(8), "purchase"),
        # u3: view then click, purchase exactly AT the click ts (strict >) -> no step3
        (3, t(0), "view"), (3, t(2), "click"), (3, t(2), "purchase"),
        # u4 never views -> not in any cohort
        (4, t(1), "click"), (4, t(2), "purchase"),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, event_type string")
    out = funnel(
        df, user_col="user_id", ts_col="ts", step_col="event_type",
        steps=("view", "click", "purchase"),
    ).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["n_step1"], r["n_step2"], r["n_step3"]) == (3, 2, 1)
    assert r["lag12_us"] == (5 - 0 + 2 - 0) * 60 * 1_000_000
    assert r["lag23_us"] == (9 - 5) * 60 * 1_000_000
    assert r["conv_full"] == 1 / 3


def _epoch_us(ts):
    return int((ts - datetime(1970, 1, 1)).total_seconds() * 1_000_000)


def test_time_weighted_avg_matches_reference(spark):
    from s1tiling_spark.operators.analytics import time_weighted_avg

    rows = _mk_points(n_series=2, n=150)
    df = spark.createDataFrame(rows, "s string, ts timestamp, eid long, cents long")
    got = {
        (r["s"], r["bucket_start"]): (
            r["n_samples"], r["span_us"], r["wsum_cents_us"], r["twa"]
        )
        for r in time_weighted_avg(
            df, keys=["s"], ts_col="ts", cents_col=F.col("cents"),
            id_col="eid", bucket="day",
        ).collect()
    }
    by_grp = {}
    for s, ts, eid, cents in rows:
        day = ts.replace(hour=0, minute=0, second=0, microsecond=0)
        by_grp.setdefault((s, day), []).append((_epoch_us(ts), eid, cents))
    assert len(got) == len(by_grp)
    n_single = 0
    for key, pts in by_grp.items():
        pts.sort()
        span = pts[-1][0] - pts[0][0]
        wsum = sum(
            y * (pts[i + 1][0] - x) for i, (x, _, y) in enumerate(pts[:-1])
        )
        twa = wsum / span / 100.0 if span > 0 else None
        assert got[key] == (len(pts), span, wsum, twa), key
        n_single += span == 0
    # the fixture must exercise both branches
    assert any(v[1] > 0 for v in got.values())


def test_value_changes_matches_reference(spark):
    from s1tiling_spark.operators.analytics import value_changes

    rows = _mk_points(n_series=2, n=150)
    df = spark.createDataFrame(rows, "s string, ts timestamp, eid long, cents long")
    got = {
        (r["s"], r["bucket_start"]): (r["n_samples"], r["n_changes"])
        for r in value_changes(
            df, keys=["s"], ts_col="ts", cents_col=F.col("cents"),
            id_col="eid", tier="1h",
        ).collect()
    }
    by_series = {}
    for s, ts, eid, cents in sorted(rows, key=lambda r: (r[0], r[1], r[2])):
        by_series.setdefault(s, []).append((ts, cents))
    ref = {}
    for s, seq in by_series.items():
        prev = None
        for ts, y in seq:
            hour = ts.replace(minute=0, second=0, microsecond=0)
            n, c = ref.get((s, hour), (0, 0))
            ref[(s, hour)] = (n + 1, c + (prev is not None and prev != y))
            prev = y
    assert got == ref
    assert sum(c for _, c in got.values()) > 50  # changes actually occur


def test_heartbeat_uptime_matches_reference(spark):
    from s1tiling_spark.operators.analytics import DAY_US, heartbeat_uptime

    # pings with deliberate gaps, a burst, duplicate timestamps, and an
    # island that crosses midnight (the day-splatting path)
    L = 600  # seconds
    rows = []
    eid = 0
    for s in range(2):
        t = BASE + timedelta(hours=22, minutes=s)
        for i in range(300):
            step = [60, 60, 60, 3600, 120][i % 5] + s * 7
            t = t + timedelta(seconds=step)
            rows.append((f"s{s}", t, eid))
            eid += 1
            if i % 37 == 0:  # duplicate ts
                rows.append((f"s{s}", t, eid))
                eid += 1
    df = spark.createDataFrame(rows, "s string, ts timestamp, eid long")
    got = {
        (r["s"], r["bucket_start"]): (
            r["uptime_us"], r["n_islands"], r["uptime_ratio"]
        )
        for r in heartbeat_uptime(
            df, keys=["s"], ts_col="ts", id_col="eid", liveness_s=L
        ).collect()
    }
    # reference: merge intervals then clip per day
    live_us = L * 1_000_000
    ref = {}
    by_series = {}
    for s, ts, eid in sorted(rows, key=lambda r: (r[0], r[1], r[2])):
        by_series.setdefault(s, []).append(_epoch_us(ts))
    for s, xs in by_series.items():
        islands = []
        for x in xs:
            if islands and x - islands[-1][1] <= live_us:
                islands[-1] = (islands[-1][0], max(islands[-1][1], x))
            else:
                islands.append((x, x))
        for s0, last in islands:
            e = last + live_us
            for d in range(s0 // DAY_US, (e - 1) // DAY_US + 1):
                cov = min(e, (d + 1) * DAY_US) - max(s0, d * DAY_US)
                day = datetime(1970, 1, 1) + timedelta(microseconds=d * DAY_US)
                u, n = ref.get((s, day), (0, 0))
                ref[(s, day)] = (u + cov, n + 1)
    assert set(got) == set(ref)
    for k, (u, n) in ref.items():
        assert got[k] == (u, n, u / DAY_US), k
    # at least one island must cross midnight for the splat to be real
    assert any(n > 0 and u < DAY_US and k[1].hour == 0 for k, (u, n) in ref.items())
    assert len({k[1] for k in ref}) >= 2


def test_retention_cohorts_matches_reference(spark):
    from s1tiling_spark.operators.analytics import retention_cohorts

    # users joining on different days, some churning, some returning
    rows = []
    eid = 0
    for u in range(30):
        join_day = u % 5
        active_days = {join_day} | {
            join_day + k for k in (1, 3, 7, 14) if (u + k) % 3 != 0
        }
        for d in sorted(active_days):
            for h in (9, 15):
                rows.append(
                    (eid, BASE + timedelta(days=d, hours=h, minutes=u), u)
                )
                eid += 1
    df = spark.createDataFrame(rows, "event_id long, ts timestamp, user_id long")
    offsets = (0, 1, 3, 7, 14)
    got = {
        (r["cohort_day"], r["k_days"]): (
            r["n_active"], r["n_cohort"], r["retention"]
        )
        for r in retention_cohorts(
            df, user_col="user_id", ts_col="ts", offsets=offsets
        ).collect()
    }
    first = {}
    active = set()
    for eid, ts, u in rows:
        d = ts.replace(hour=0, minute=0, second=0, microsecond=0)
        first[u] = min(first.get(u, d), d)
        active.add((u, d))
    sizes = {}
    for u, d in first.items():
        sizes[d] = sizes.get(d, 0) + 1
    ref = {}
    for u, d in active:
        k = (d - first[u]).days
        if k in offsets:
            key = (first[u], k)
            ref[key] = ref.get(key, 0) + 1
    assert set(got) == set(ref)
    for key, n in ref.items():
        sz = sizes[key[0]]
        assert got[key] == (n, sz, n / sz), key
    # churn must actually thin the cohorts
    assert any(n < sizes[d] for (d, k), n in ref.items() if k > 0)


def test_quantile_over_time_matches_reference(spark):
    """Exact order statistics per (series, day): ceil-rank selection on
    the sorted multiset — ties (plateau values), negative values, and
    n=1 groups all checked against sorted()[k-1]."""
    from s1tiling_spark.operators.analytics import quantile_over_time

    rows = _mk_points(n_series=2, n=120)
    rows += [("lone", datetime(2024, 3, 2), 95000, -7)]  # n=1 group
    df = spark.createDataFrame(rows, "s string, ts timestamp, eid long, cents long")
    got = {
        (r["s"], r["bucket_start"]): (r["p50"], r["p90"], r["p99"])
        for r in quantile_over_time(
            df, keys=("s",), ts_col="ts", value_col="cents", bucket="day"
        ).collect()
    }

    groups = {}
    for s, ts, eid, cents in rows:
        day = datetime(ts.year, ts.month, ts.day)
        groups.setdefault((s, day), []).append(cents)
    assert len(got) == len(groups)
    for key, vals in groups.items():
        vs = sorted(vals)
        n = len(vs)
        exp = tuple(vs[(q * n + 99) // 100 - 1] for q in (50, 90, 99))
        assert got[key] == exp, key
    assert got[("lone", datetime(2024, 3, 2))] == (-7, -7, -7)


def test_holt_winters_matches_reference(spark):
    """holt_winters_smooth (level+trend struct fold) against an
    independent per-row python recursion — the oracle DuckDB cannot
    provide (its list_reduce mis-evaluates struct accumulators on
    chains >= 3, see the query's module comment). Bit-exact doubles:
    both sides run the identical recursion over the identical frame."""
    from s1tiling_spark.catalog.analytics_queries import (
        _EWMA_W,
        holt_winters_smooth,
    )

    sf_dir = "/root/testdata/sf0.001"
    got = {
        (r["event_type"], r["ts"], r["event_id"]): (r["level"], r["trend"])
        for r in holt_winters_smooth(spark, sf_dir).collect()
    }
    ev = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .select(
            "event_type", "ts", "event_id",
            F.round(F.col("value") * 100).cast("double").alias("cents"),
        )
        .collect()
    )
    series: dict = {}
    for r in sorted(ev, key=lambda r: (r["event_type"], r["ts"], r["event_id"])):
        series.setdefault(r["event_type"], []).append(r)
    checked = 0
    for rows in series.values():
        vals = [r["cents"] for r in rows]
        for i, r in enumerate(rows):
            frame = vals[max(0, i - (_EWMA_W - 1)) : i + 1]
            key = (r["event_type"], r["ts"], r["event_id"])
            if len(frame) < 2:
                assert got[key] == (None, None)
                continue
            s, b = frame[0], frame[1] - frame[0]
            for x in frame[1:]:
                s1 = 0.5 * x + 0.5 * (s + b)
                b = 0.5 * (s1 - s) + 0.5 * b
                s = s1
            assert got[key] == (s, b), (key, got[key], (s, b))
            checked += 1
    assert checked > 900
