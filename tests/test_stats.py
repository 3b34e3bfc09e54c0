"""Semantic tests for the r6 stats pack (plans/stats_queries.py):
correlations against numpy on the exact integer units, OLS against
numpy.polyfit, chi-square terms against a scipy-free python reference,
and the exactness of the decimal moment strings."""

from __future__ import annotations

from collections import defaultdict

import numpy as np
import pytest
from pyspark.sql import functions as F

from strava_data_pipeline_spark.plans import stats_queries as S
from strava_data_pipeline_spark.sources.catalog import load_table

SF = "/root/testdata/sf0.001"


def _lineitem_units(spark):
    rows = load_table(spark, SF, "lineitem").select(
        F.round(F.col("l_quantity") * 100).cast("bigint").alias("quantity"),
        F.round(F.col("l_extendedprice") * 100).cast("bigint").alias("price"),
        F.round(F.col("l_discount") * 100).cast("bigint").alias("discount"),
        F.round(F.col("l_tax") * 100).cast("bigint").alias("tax"),
    ).collect()
    return {
        c: np.array([r[c] for r in rows], dtype=np.float64)
        for c in ("quantity", "price", "discount", "tax")
    }


class TestCorrMatrix:
    def test_matches_numpy(self, spark):
        cols = _lineitem_units(spark)
        got = {
            (r["var_x"], r["var_y"]): r for r in S.corr_matrix(spark, SF).collect()
        }
        assert set(got) == set(S._CM_PAIRS)
        for (x, y), r in got.items():
            want = np.corrcoef(cols[x], cols[y])[0, 1]
            assert abs(r["corr"] - want) < 1e-6, (x, y)
            assert -1.0 <= r["corr"] <= 1.0

    def test_cov_numerator_is_exact_integer(self, spark):
        cols = {
            c: v.astype(object) for c, v in _lineitem_units(spark).items()
        }  # python ints: exact
        n = len(next(iter(cols.values())))
        for r in S.corr_matrix(spark, SF).collect():
            x, y = cols[r["var_x"]], cols[r["var_y"]]
            want = n * int(sum(a * b for a, b in zip(x, y))) - int(sum(x)) * int(
                sum(y)
            )
            assert int(r["cov_num"]) == want, (r["var_x"], r["var_y"])


class TestTrendFit:
    def test_matches_numpy_polyfit(self, spark):
        events = load_table(spark, SF, "events").select(
            "event_type",
            F.expr("cast(unix_timestamp(ts) div 86400 as bigint)").alias("t"),
            F.round(F.col("value") * 100).cast("bigint").alias("vc"),
        )
        by_type = defaultdict(lambda: ([], []))
        for r in events.collect():
            by_type[r["event_type"]][0].append(r["t"])
            by_type[r["event_type"]][1].append(r["vc"])
        got = {r["event_type"]: r for r in S.trend_fit(spark, SF).collect()}
        assert set(got) == set(by_type)
        for ty, (ts, vs) in by_type.items():
            slope, intercept = np.polyfit(
                np.array(ts, dtype=float), np.array(vs, dtype=float), 1
            )
            r = got[ty]
            assert abs(r["slope_cents_per_day"] - slope) < 1e-5, ty
            assert abs(r["intercept_cents"] - intercept) < 1e-2, ty
            # exact rational: slope == num/den on python ints
            n = len(ts)
            num = n * sum(a * b for a, b in zip(ts, vs)) - sum(ts) * sum(vs)
            den = n * sum(a * a for a in ts) - sum(ts) ** 2
            assert int(r["slope_num"]) == num and int(r["slope_den"]) == den


class TestChi2Independence:
    def test_matches_python_reference(self, spark):
        events = load_table(spark, SF, "events").select(
            "event_type",
            F.expr("cast(unix_timestamp(ts) div 86400 % 7 as bigint)").alias(
                "wd"
            ),
        )
        obs = defaultdict(int)
        for r in events.collect():
            obs[(r["event_type"], r["wd"])] += 1
        n = sum(obs.values())
        rt = defaultdict(int)
        ct = defaultdict(int)
        for (t, w), o in obs.items():
            rt[t] += o
            ct[w] += o
        got = {
            (r["event_type"], r["wd"]): r
            for r in S.chi2_independence(spark, SF).collect()
        }
        assert set(got) == set(obs)
        for (t, w), r in got.items():
            e = rt[t] * ct[w] / n
            term = (obs[(t, w)] - e) ** 2 / e
            assert r["obs"] == obs[(t, w)]
            assert abs(r["expected"] - e) < 1e-5
            assert abs(r["chi2_term"] - term) < 1e-5

    def test_margins_conserve(self, spark):
        rows = S.chi2_independence(spark, SF).collect()
        n_events = load_table(spark, SF, "events").count()
        assert sum(r["obs"] for r in rows) == n_events
        # expected counts sum to N too (within rounding)
        assert abs(sum(r["expected"] for r in rows) - n_events) < 1e-3
