"""Tests for the distributed statistics operators."""

from __future__ import annotations

import math

import pytest

from pyspark.sql import functions as F

from etl_excel_csv_sql_spark.operators import stats


def test_chi_square_independent_uniform(spark):
    # perfectly balanced 2x2 table -> chi2 == 0
    rows = [("x", "p"), ("x", "q"), ("y", "p"), ("y", "q")] * 10
    df = spark.createDataFrame(rows, "a string, b string")
    r = stats.chi_square_independence(df, "a", "b").first()
    assert r["chi2"] == 0.0
    assert r["dof"] == 1 and r["n"] == 40 and r["n_cells"] == 4


def test_chi_square_perfect_dependence(spark):
    # a == b determines everything: chi2 == n * (k-1) for a kxk diagonal
    rows = [("x", "p")] * 10 + [("y", "q")] * 10
    df = spark.createDataFrame(rows, "a string, b string")
    r = stats.chi_square_independence(df, "a", "b").first()
    assert abs(r["chi2"] - 20.0) < 1e-6  # n*(k-1) = 20*(2-1)
    assert r["n_observed_cells"] == 2  # empty cells folded in exactly


def test_chi_square_matches_scipy_formula(spark):
    # hand-computed 2x3 with unbalanced margins
    rows = (
        [("x", "p")] * 8 + [("x", "q")] * 2 + [("x", "r")] * 5
        + [("y", "p")] * 3 + [("y", "q")] * 9 + [("y", "r")] * 4
    )
    df = spark.createDataFrame(rows, "a string, b string")
    r = stats.chi_square_independence(df, "a", "b").first()
    n = 31
    obs = {("x", "p"): 8, ("x", "q"): 2, ("x", "r"): 5,
           ("y", "p"): 3, ("y", "q"): 9, ("y", "r"): 4}
    ra = {"x": 15, "y": 16}
    cb = {"p": 11, "q": 11, "r": 9}
    chi2 = sum(
        (o - ra[a] * cb[b] / n) ** 2 / (ra[a] * cb[b] / n)
        for (a, b), o in obs.items()
    )
    assert abs(r["chi2"] - chi2) < 1e-6
    assert r["dof"] == 2


def test_linear_fit_exact_line(spark):
    rows = [(float(x), 3.0 * x + 2.0) for x in range(1, 50)]
    df = spark.createDataFrame(rows, "x double, y double")
    r = stats.linear_fit(df, "x", "y").first()
    assert abs(r["slope"] - 3.0) < 1e-6
    assert abs(r["intercept"] - 2.0) < 1e-6
    assert abs(r["r2"] - 1.0) < 1e-6


def test_linear_fit_known_noise(spark):
    # symmetric residuals around y = 2x: slope stays 2, r2 < 1
    rows = [(1.0, 2.0 + 1.0), (2.0, 4.0 - 1.0), (3.0, 6.0 + 1.0), (4.0, 8.0 - 1.0)]
    df = spark.createDataFrame(rows, "x double, y double")
    r = stats.linear_fit(df, "x", "y").first()
    # hand OLS: Sx=10 Sy=20 Sxx=30 Sxy=58 n=4 -> slope=(232-200)/20=1.6
    sx, sy, sxx, sxy = 10.0, 20.0, 30.0, 58.0
    n = 4.0
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    assert abs(r["slope"] - slope) < 1e-6
    assert 0 < r["r2"] < 1


def test_linear_fit_partitioning_invariant(spark, sf_dir):
    from etl_excel_csv_sql_spark.catalog import load_table

    li = load_table(spark, sf_dir, "lineitem")
    a = stats.linear_fit(li, "l_quantity", "l_extendedprice").first()
    b = stats.linear_fit(
        li.repartition(13), "l_quantity", "l_extendedprice"
    ).first()
    assert (a["slope"], a["intercept"], a["r2"]) == (
        b["slope"],
        b["intercept"],
        b["r2"],
    )  # decimal moment sums: bit-identical under re-partitioning
    # synthetic lineitem draws price independently of quantity (unlike
    # real TPC-H): a near-zero r2 on a valid fit is the correct answer
    assert 0.0 <= a["r2"] <= 1.0


def test_correlation_matrix_known_values(spark):
    rows = [(1.0, 2.0, -1.0), (2.0, 4.0, -2.0), (3.0, 6.0, -3.0), (4.0, 8.5, -4.0)]
    df = spark.createDataFrame(rows, "x double, y double, z double")
    got = {
        (r["col_a"], r["col_b"]): r["corr"]
        for r in stats.correlation_matrix(df, ["x", "y", "z"]).collect()
    }
    assert len(got) == 3
    assert got[("x", "z")] == -1.0          # exact anti-correlation
    assert 0.99 < got[("x", "y")] <= 1.0    # near-perfect line
    assert -1.0 <= got[("y", "z")] < -0.99


def test_join_cardinality_matches_real_join(spark, sf_dir):
    from etl_excel_csv_sql_spark.catalog import load_table

    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    est = stats.join_cardinality_estimate(
        li, orders, "l_orderkey", "o_orderkey"
    ).first()
    actual = li.join(
        orders, li["l_orderkey"] == orders["o_orderkey"]
    ).count()
    assert est["join_rows"] == actual  # exact, not an estimate, by construction


def test_join_cardinality_flags_manytomany_explosion(spark):
    left = spark.createDataFrame([(1,)] * 100 + [(2,)] * 2, "k long")
    right = spark.createDataFrame([(1,)] * 50 + [(3,)] * 5, "k long")
    r = stats.join_cardinality_estimate(left, right, "k", "k").first()
    assert r["join_rows"] == 5000
    assert r["matched_keys"] == 1
    assert r["max_key_contribution"] == 5000
    assert r["expansion_factor"] > 49.0


def test_ab_test_known_counts(spark):
    # synthetic: assignment determined by the same md5 trick, so build
    # events whose conversion depends on the user id and check the math
    rows = []
    for u in range(200):
        rows.append((u * 10, u, "view"))
        if u % 4 == 0:
            rows.append((u * 10 + 1, u, "purchase"))
    df = spark.createDataFrame(rows, "event_id long, user_id long, event_type string")
    rep = {r["variant"]: r for r in stats.ab_test_report(df).collect()}
    assert set(rep) == {"control", "treatment", "lift"}
    c, t, l = rep["control"], rep["treatment"], rep["lift"]
    assert c["n_users"] + t["n_users"] == 200
    assert l["n_converted"] == 50
    # z from the four counts, recomputed in python
    import math

    nc, kc, nt, kt = c["n_users"], c["n_converted"], t["n_users"], t["n_converted"]
    p = (kc + kt) / (nc + nt)
    z = (kt / nt - kc / nc) / math.sqrt(p * (1 - p) * (1 / nc + 1 / nt))
    assert abs(l["z_score"] - z) < 1e-6
    # conversion is independent of the hash assignment: no significance
    assert abs(l["z_score"]) < 3


def test_ab_test_degenerate_all_convert(spark):
    rows = [(u, u, "purchase") for u in range(50)]
    df = spark.createDataFrame(rows, "event_id long, user_id long, event_type string")
    rep = {r["variant"]: r for r in stats.ab_test_report(df).collect()}
    assert rep["lift"]["z_score"] is None  # pooled variance 0 -> NULL, no crash
    assert rep["lift"]["rate"] == 1.0


def test_benford_report_on_benford_sample(spark):
    """A log-uniform sample IS Benford-distributed: deviations should be
    small; a uniform sample is NOT: deviation for digit 1 is large."""
    from etl_excel_csv_sql_spark.operators.stats import benford_report
    import math

    log_uniform = [(10 ** (0.0001 * i),) for i in range(40000)]  # 1..~10^4
    got = {
        r.digit: r
        for r in benford_report(
            spark.createDataFrame(log_uniform, ["v"]), "v"
        ).collect()
    }
    assert set(got) == set(range(1, 10))
    for d in range(1, 10):
        assert got[d].abs_dev < 0.01
        assert got[d].benford_pct == round(math.log10(1 + 1 / d), 6)

    uniform = [(float(i),) for i in range(1, 10001)]
    got_u = {
        r.digit: r
        for r in benford_report(
            spark.createDataFrame(uniform, ["v"]), "v"
        ).collect()
    }
    assert got_u[1].abs_dev > 0.05  # uniform ≠ Benford


def test_cuped_reduces_variance_when_covariate_predicts(spark):
    """CUPED property test: when the pre-period covariate strongly
    predicts the post-period metric, the adjusted variance collapses;
    the unadjusted and adjusted treatment effects stay close (CUPED is
    unbiased)."""
    import random

    from etl_excel_csv_sql_spark.operators import stats

    rng = random.Random(7)
    rows = []
    for u in range(400):
        base = rng.uniform(10, 100)  # the user's persistent level
        for d in range(1, 11):  # pre-period: Jan 1-10
            rows.append((u, f"2024-01-{d:02d} 12:00:00", base + rng.uniform(-1, 1)))
        for d in range(21, 31):  # post-period: Jan 21-30
            rows.append((u, f"2024-01-{d:02d} 12:00:00", base + rng.uniform(-1, 1)))
    df = spark.createDataFrame(
        rows, "user_id long, ts_s string, value double"
    ).select("user_id", F.col("ts_s").cast("timestamp").alias("ts"), "value")
    rep = {
        r.variant: r
        for r in stats.cuped_ab_report(df, split_ts="2024-01-16 00:00:00").collect()
    }
    assert set(rep) == {"control", "treatment", "delta"}
    # persistent user level dominates -> X ~ Y -> massive shrink
    assert rep["delta"].var_reduction > 0.9
    for v in ("control", "treatment"):
        assert rep[v].var_y_cuped < rep[v].var_y * 0.2
    # unbiasedness: effects agree well inside the raw noise scale
    assert abs(rep["delta"].mean_y - rep["delta"].mean_y_cuped) < (
        rep["delta"].var_y ** 0.5
    )


def test_cuped_handles_degenerate_zero_variance_covariate(spark):
    """Constant pre-period covariate -> var(X)=0 -> theta null-guarded
    to 0: CUPED must degrade to the raw readout, not divide by zero."""
    from etl_excel_csv_sql_spark.operators import stats

    rows = [
        (u, "2024-01-05 00:00:00", 5.0) for u in range(50)
    ] + [
        (u, "2024-01-25 00:00:00", float(u % 7)) for u in range(50)
    ]
    df = spark.createDataFrame(
        rows, "user_id long, ts_s string, value double"
    ).select("user_id", F.col("ts_s").cast("timestamp").alias("ts"), "value")
    rep = {
        r.variant: r
        for r in stats.cuped_ab_report(df, split_ts="2024-01-16 00:00:00").collect()
    }
    for v in ("control", "treatment"):
        assert rep[v].mean_y == rep[v].mean_y_cuped
        assert rep[v].var_y == rep[v].var_y_cuped


# ---------------------------------------------------------------- KM / RFM


def test_kaplan_meier_hand_computed(spark):
    """4 users on a tiny timeline; KM factors checked by hand.

    Corpus max = t0+100h. Horizon 10h. Users:
      a: [0, 5h]    -> dur 5,  last 95h before max  -> churned
      b: [0, 5h30]  -> dur 5,  churned
      c: [0, 50h]   -> dur 50, churned
      d: [0, 100h]  -> dur 100, last == max -> censored
    Curve: t=5: n=4, d=2 -> S=0.5; t=50: n=2, d=1 -> S=0.25;
           t=100: n=1, d=0 (censored) -> S=0.25.
    """
    from etl_excel_csv_sql_spark.operators import stats

    base = 1_700_000_000_000_000  # us
    h = 3_600 * 1_000_000
    rows = []
    for uid, first, last in [
        (1, 0, 5 * h),
        (2, 0, 5 * h + 30 * 60 * 1_000_000),
        (3, 0, 50 * h),
        (4, 0, 100 * h),
    ]:
        rows.append((uid, base + first))
        rows.append((uid, base + last))
    df = spark.createDataFrame(rows, "user_id long, us long").select(
        "user_id", F.timestamp_micros(F.col("us")).alias("ts")
    )
    out = {
        r["dur_hours"]: r
        for r in stats.kaplan_meier(df, horizon_hours=10).collect()
    }
    assert set(out) == {5, 50, 100}
    assert out[5]["n_at_risk"] == 4 and out[5]["n_churned"] == 2
    assert out[5]["survival"] == pytest.approx(0.5)
    assert out[50]["n_at_risk"] == 2 and out[50]["n_churned"] == 1
    assert out[50]["survival"] == pytest.approx(0.25)
    assert out[100]["n_at_risk"] == 1 and out[100]["n_churned"] == 0
    assert out[100]["n_censored"] == 1
    assert out[100]["survival"] == pytest.approx(0.25)


def test_kaplan_meier_monotone_and_bounded(spark, sf_dir):
    from etl_excel_csv_sql_spark.catalog import load_table
    from etl_excel_csv_sql_spark.operators import stats

    events = load_table(spark, sf_dir, "events")
    curve = (
        stats.kaplan_meier(events, horizon_hours=24)
        .orderBy("dur_hours")
        .collect()
    )
    assert curve, "curve must be non-empty"
    prev = 1.0
    for r in curve:
        assert 0.0 <= r["survival"] <= prev + 1e-9
        prev = r["survival"]
    # risk set at the smallest lifetime is every user
    n_users = events.select("user_id").distinct().count()
    assert curve[0]["n_at_risk"] == n_users


def test_global_row_number_total_order(spark):
    from etl_excel_csv_sql_spark.operators import relational

    df = spark.range(0, 997).select(
        (F.col("id") * 7919 % 997).alias("k"), "id"
    )
    out = relational.global_row_number(
        df, [F.col("k").asc(), F.col("id").asc()], out_col="rn",
        num_partitions=8,
    ).collect()
    ordered = sorted(out, key=lambda r: (r["k"], r["id"]))
    assert [r["rn"] for r in ordered] == list(range(1, 998))


def test_ntile_from_rank_matches_native_ntile(spark):
    from pyspark.sql import Window

    from etl_excel_csv_sql_spark.operators import relational

    for n, k in [(17, 4), (16, 4), (3, 4), (100, 7)]:
        df = spark.range(1, n + 1).select(F.col("id").alias("rank"))
        got = df.select(
            "rank",
            relational.ntile_from_rank(
                F.col("rank"), F.lit(n).cast("bigint"), k
            ).alias("bucket"),
            F.ntile(k).over(Window.orderBy("rank")).alias("native"),
        ).collect()
        for r in got:
            assert r["bucket"] == r["native"], (n, k, r)


def test_rfm_scores_reward_best_customers(spark, sf_dir):
    from etl_excel_csv_sql_spark.catalog import load_table
    from etl_excel_csv_sql_spark.operators import stats

    orders = load_table(spark, sf_dir, "orders")
    rfm = stats.rfm_segmentation(orders, k=4)
    rows = rfm.collect()
    # quartiles are balanced: each score 1..4, sizes differ by <= 1
    from collections import Counter

    for col in ("r_score", "f_score", "m_score"):
        c = Counter(r[col] for r in rows)
        assert set(c) == {1, 2, 3, 4}
        assert max(c.values()) - min(c.values()) <= 1
    # the biggest spender holds the top monetary score
    top = max(rows, key=lambda r: r["monetary"])
    assert top["m_score"] == 4
    # most stale customer gets the lowest recency score
    stale = max(rows, key=lambda r: (r["recency_days"], -r["c_custkey"]))
    assert stale["r_score"] == 1


def test_winsorized_summary_clips_outliers(spark):
    from etl_excel_csv_sql_spark.operators import stats

    vals = [(float(i), "g") for i in range(1, 100)] + [(10_000.0, "g")]
    df = spark.createDataFrame(vals, "v double, g string")
    out = stats.winsorized_summary(
        df, "v", "g", lower=0.05, upper=0.95
    ).collect()[0]
    assert out["n"] == 100
    assert out["n_clipped_high"] >= 1  # the 10k outlier got clamped
    assert out["winsor_mean"] < 200  # mean is robust to the outlier
    assert out["clip_hi"] < 10_000


# ------------------------------------------------------------------- PSI


def test_psi_drift_zero_on_identical_distributions(spark):
    from etl_excel_csv_sql_spark.operators import quality

    df = spark.range(0, 1000).select((F.col("id") % 100).cast("double").alias("v"))
    out = quality.psi_drift(df, df, "v", n_buckets=10).collect()
    assert len(out) == 10
    assert all(abs(r["contribution"]) < 1e-9 for r in out)
    assert all(abs(r["frac_old"] - 0.1) < 0.011 for r in out)


def test_psi_drift_detects_shift(spark):
    from etl_excel_csv_sql_spark.operators import quality

    old = spark.range(0, 1000).select((F.col("id") % 100).cast("double").alias("v"))
    new = old.select((F.col("v") + 80).alias("v"))  # hard right shift
    out = quality.psi_drift(old, new, "v", n_buckets=10).collect()
    psi = sum(r["contribution"] for r in out)
    assert psi > 0.25  # "drifted" by the standard rule of thumb
    # all new mass sits in the top buckets
    top = [r for r in out if r["bucket"] >= 8]
    assert sum(r["frac_new"] for r in top) > 0.5


# ------------------------------------------------------------------- ACF


def test_acf_perfect_period_two(spark):
    """Alternating daily series -> acf(1) ~ -1, acf(2) ~ +1 (biased
    estimator shrinks toward 0 with the n_pairs/n ratio)."""
    import datetime

    from etl_excel_csv_sql_spark.operators import events as ev_ops

    rows = []
    for i in range(40):
        rows.append(
            (
                i,
                datetime.datetime(2024, 1, 1) + datetime.timedelta(days=i),
                100.0 if i % 2 == 0 else 0.0,
            )
        )
    df = spark.createDataFrame(rows, "event_id long, ts timestamp, value double")
    out = {r["lag"]: r["acf"] for r in ev_ops.acf_daily(df, max_lag=3).collect()}
    assert out[1] < -0.9
    assert out[2] > 0.9
    assert abs(out[3] - out[1]) < 0.1  # odd lags align


def test_acf_lag_zero_normalization_bound(spark, sf_dir):
    from etl_excel_csv_sql_spark.catalog import load_table
    from etl_excel_csv_sql_spark.operators import events as ev_ops

    events = load_table(spark, sf_dir, "events")
    out = ev_ops.acf_daily(events, max_lag=7).collect()
    assert len(out) == 7
    for r in out:
        assert abs(r["acf"]) <= 1.0 + 1e-9
        assert r["n_pairs"] > 0


def test_seasonal_decompose_recovers_planted_cycle(spark):
    """Plant y = 1000 + phase_effect(weekday) on a flat trend: the
    decomposition must put the cycle in `seasonal` (zero-sum) and
    leave residuals ~0 away from edges."""
    import datetime

    from etl_excel_csv_sql_spark.operators import events as ev_ops

    effect = [30.0, -20.0, 10.0, 0.0, -10.0, 20.0, -30.0]
    rows = []
    for i in range(35):
        d = datetime.datetime(2024, 1, 1) + datetime.timedelta(days=i)
        phase = (d.date() - datetime.date(1970, 1, 1)).days % 7
        rows.append((i, d, 1000.0 + effect[phase]))
    df = spark.createDataFrame(rows, "event_id long, ts timestamp, value double")
    out = ev_ops.seasonal_decompose_daily(df).collect()
    assert len(out) == 35
    by_day = {r["day"]: r for r in out}
    # edges: first/last 3 days have no full window -> null trend
    assert by_day["2024-01-01"]["trend"] is None
    assert by_day["2024-02-04"]["trend"] is None
    # interior: trend = 1000 (7-day MA of a pure weekly cycle is flat),
    # seasonal = planted effect, residual ~ 0
    mid = by_day["2024-01-15"]
    assert mid["trend"] == pytest.approx(1000.0, abs=1e-6)
    phase = (datetime.date(2024, 1, 15) - datetime.date(1970, 1, 1)).days % 7
    assert mid["seasonal"] == pytest.approx(effect[phase], abs=1e-6)
    assert mid["residual"] == pytest.approx(0.0, abs=1e-6)
    # seasonal components sum to ~0 across the 7 phases
    seas = {r["phase"]: r["seasonal"] for r in out if r["seasonal"] is not None}
    assert sum(seas.values()) == pytest.approx(0.0, abs=1e-6)


def test_seasonal_decompose_even_period_2xma(spark):
    """Regression (ADVICE r7): with even `period` the rowsBetween(-half,
    half) window holds period+1 rows, so the old count==period guard was
    never true in the interior but WAS true one row from each edge —
    trend came out null everywhere except spurious asymmetric edge
    windows. Even periods now use the classical 2x(period) centered MA
    (half-weight endpoints over period+1 days)."""
    import datetime

    from etl_excel_csv_sql_spark.operators import events as ev_ops

    effect = [12.0, -4.0, 8.0, -16.0]  # zero-sum 4-day cycle
    rows = []
    for i in range(20):
        d = datetime.datetime(2024, 1, 1) + datetime.timedelta(days=i)
        phase = (d.date() - datetime.date(1970, 1, 1)).days % 4
        rows.append((i, d, 500.0 + effect[phase]))
    df = spark.createDataFrame(rows, "event_id long, ts timestamp, value double")
    out = {r["day"]: r for r in ev_ops.seasonal_decompose_daily(df, period=4).collect()}
    assert len(out) == 20
    # edges: the 2x4 MA needs 2 days each side -> null trend
    for day in ("2024-01-01", "2024-01-02", "2024-01-19", "2024-01-20"):
        assert out[day]["trend"] is None, day
    # interior: 2x4 MA of a pure 4-day cycle is flat = 500, residual ~0
    mid = out["2024-01-10"]
    assert mid["trend"] == pytest.approx(500.0, abs=1e-6)
    assert mid["residual"] == pytest.approx(0.0, abs=1e-6)
    phase10 = (datetime.date(2024, 1, 10) - datetime.date(1970, 1, 1)).days % 4
    assert mid["seasonal"] == pytest.approx(effect[phase10], abs=1e-6)


def test_seasonal_decompose_calendar_gap_nulls_trend(spark):
    """Regression (ADVICE r7): the ROWS window used to slide over a gappy
    daily frame, silently widening the 'period-day' MA across missing
    days. The day spine now makes ROWS offsets true day offsets: windows
    touching a missing day produce null trend instead of a skewed one."""
    import datetime

    from etl_excel_csv_sql_spark.operators import events as ev_ops

    rows = []
    for i in range(21):
        if i == 10:  # hole in the calendar
            continue
        d = datetime.datetime(2024, 3, 1) + datetime.timedelta(days=i)
        rows.append((i, d, 100.0 + i))
    df = spark.createDataFrame(rows, "event_id long, ts timestamp, value double")
    out = {r["day"]: r for r in ev_ops.seasonal_decompose_daily(df, period=7).collect()}
    assert len(out) == 20  # missing day is not fabricated into the output
    assert "2024-03-11" not in out
    # any 7-day window covering the hole is incomplete -> null trend
    for i in range(8, 14):
        day = (datetime.date(2024, 3, 1) + datetime.timedelta(days=i)).isoformat()
        if day == "2024-03-11":
            continue
        assert out[day]["trend"] is None, day
    # a full window clear of the hole and the edges still has trend:
    # linear series -> centered MA equals the center value
    assert out["2024-03-05"]["trend"] == pytest.approx(104.0, abs=1e-6)
    assert out["2024-03-18"]["trend"] == pytest.approx(117.0, abs=1e-6)


def test_seasonal_decompose_corrupt_timestamp_fails_loudly(spark):
    """ADVICE r9: one year-9999 row must not kill the job with an opaque
    max-array-length failure from the day-spine sequence — the span
    guard raises a named error instead, and a sane span still works."""
    import datetime

    from etl_excel_csv_sql_spark.operators import events as ev_ops

    rows = [
        (i, datetime.datetime(2024, 3, 1) + datetime.timedelta(days=i), 10.0 + i)
        for i in range(21)
    ]
    rows.append((99, datetime.datetime(9999, 12, 31), 1.0))
    df = spark.createDataFrame(rows, "event_id long, ts timestamp, value double")
    with pytest.raises(Exception, match="max_spine_days"):
        ev_ops.seasonal_decompose_daily(df, period=7).collect()
    # an explicitly raised bound admits the wide spine (caller opt-in)
    ok = ev_ops.seasonal_decompose_daily(
        df, period=7, max_spine_days=4_000_000
    )
    assert ok.count() == 22
    # and the clean series is untouched by the guard
    clean = spark.createDataFrame(rows[:21], "event_id long, ts timestamp, value double")
    assert ev_ops.seasonal_decompose_daily(clean, period=7).count() == 21


def test_global_prefix_sum_matches_window(spark):
    from pyspark.sql import Window as W

    from etl_excel_csv_sql_spark.operators import relational

    df = spark.range(0, 500).select(
        (F.col("id") * 37 % 113).alias("k"),
        "id",
        (F.col("id") % 7).cast("decimal(10,2)").alias("v"),
    )
    order = [F.col("k").asc(), F.col("id").asc()]
    got = relational.global_prefix_sum(
        df, order, "v", out_col="ps", num_partitions=8
    )
    want = df.withColumn(
        "ps_w",
        F.sum("v").over(
            W.orderBy(*order).rowsBetween(W.unboundedPreceding, 0)
        ),
    )
    j = got.join(want.select("id", "ps_w"), "id")
    assert j.where(F.col("ps") != F.col("ps_w")).count() == 0


def test_pareto_abc_classes_partition_revenue(spark, sf_dir):
    from etl_excel_csv_sql_spark.catalog import load_table
    from etl_excel_csv_sql_spark.operators import stats

    li = load_table(spark, sf_dir, "lineitem")
    out = stats.pareto_abc(li).collect()
    classes = {r["abc_class"] for r in out}
    assert classes == {"A", "B", "C"}
    # cum_share is monotone in rank and ends at 1.0
    by_rank = sorted(out, key=lambda r: r["rank"])
    assert by_rank[-1]["cum_share"] == pytest.approx(1.0, abs=1e-6)
    shares = [r["cum_share"] for r in by_rank]
    assert all(a <= b + 1e-9 for a, b in zip(shares, shares[1:]))
    # class A holds the head of the curve
    assert by_rank[0]["abc_class"] == "A"


def test_time_decay_attribution_hand_weights(spark):
    """One conversion (value 100) with two touches 1h and 7h before, at
    6h half-life: w1 = 2^(-1/6), w2 = 2^(-7/6); credits split
    proportionally. A touch outside the 24h window gets nothing."""
    import datetime

    from etl_excel_csv_sql_spark.operators import events as ev_ops

    t0 = datetime.datetime(2024, 5, 1, 12, 0, 0)

    def at(hours_before):
        return t0 - datetime.timedelta(hours=hours_before)

    rows = [
        (1, 7, at(30), "click", 0.0),   # outside 24h window
        (2, 7, at(7), "click", 0.0),
        (3, 7, at(1), "view", 0.0),
        (4, 7, t0, "purchase", 100.0),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, event_type string, value double"
    )
    out = {
        r["channel"]: r
        for r in ev_ops.attribute_time_decay(
            df, window_seconds=24 * 3600, half_life_seconds=6 * 3600
        ).collect()
    }
    w_click = 2 ** (-7 / 6)
    w_view = 2 ** (-1 / 6)
    total = w_click + w_view
    assert set(out) == {"click", "view"}
    assert out["click"]["credited_value"] == pytest.approx(
        100 * w_click / total, abs=1e-3
    )
    assert out["view"]["credited_value"] == pytest.approx(
        100 * w_view / total, abs=1e-3
    )
    assert out["click"]["n_touches"] == 1  # the 30h-old touch is out


def test_daily_user_accounting_identities(spark, sf_dir):
    from etl_excel_csv_sql_spark.catalog import load_table
    from etl_excel_csv_sql_spark.operators import events as ev_ops

    ev = load_table(spark, sf_dir, "events")
    rows = sorted(
        ev_ops.daily_user_accounting(ev).collect(), key=lambda r: r["day"]
    )
    total_users = ev.select("user_id").distinct().count()
    # the cumulative curve ends at the total distinct user count
    assert rows[-1]["cum_users"] == total_users
    # day 1: everyone active is new
    assert rows[0]["n_new"] == rows[0]["n_active"]
    assert rows[0]["n_returning"] == 0
    # invariants every day
    cum = 0
    for r in rows:
        cum += r["n_new"]
        assert r["cum_users"] == cum
        assert r["n_active"] == r["n_new"] + r["n_returning"]
        assert r["n_returning"] >= 0


def test_chi_square_drops_null_categories(spark):
    """Nulls in either categorical must drop listwise: the null group
    survived the contingency groupBy but fell out of the null-rejecting
    marginal joins, re-entering chi2 as spurious 'unobserved expected'
    mass — a strongly significant statistic on independent data."""
    from etl_excel_csv_sql_spark.operators import stats

    rows = [("a", "x"), ("a", "y"), ("b", "x"), ("b", "y")] * 25
    rows += [(None, "x")] * 50 + [("a", None)] * 50  # half the rows null-keyed
    df = spark.createDataFrame(rows, "ca string, cb string")
    got = stats.chi_square_independence(df, "ca", "cb").collect()[0]
    # perfectly independent 2x2 with equal counts -> chi2 == 0
    assert got.chi2 == 0.0 and got.n == 100 and got.dof == 1


def test_correlation_matrix_listwise_null_deletion(spark):
    """corr(x, y) where y==x on non-null rows must be exactly 1.0 even
    when y is null elsewhere (n and the moment sums previously used
    different row sets)."""
    from etl_excel_csv_sql_spark.operators import stats

    rows = [(float(i), float(i) if i % 2 == 0 else None) for i in range(100)]
    df = spark.createDataFrame(rows, "x double, y double")
    got = {
        (r.col_a, r.col_b): r.corr
        for r in stats.correlation_matrix(df, ["x", "y"]).collect()
    }
    assert got[("x", "y")] == 1.0


def test_winsorized_summary_ignores_null_values(spark):
    from etl_excel_csv_sql_spark.operators import stats

    df = spark.createDataFrame(
        [("g", 10.0), ("g", 10.0), ("g", None), ("g", None)],
        "grp string, v double",
    )
    got = stats.winsorized_summary(df, "v", "grp", 0.0, 1.0).collect()[0]
    assert got.n == 2
    assert got.winsor_mean == 10.0 and got.winsor_std == 0.0
