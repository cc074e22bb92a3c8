"""Regression tests for the round-11 advice punch list (landed r12):

1. create_table/create_ome_table record txn.<app>=batch on the CREATING
   commit, so a foreachBatch replay of batch 0 (restart after commit,
   before checkpoint advance) is skipped — Delta's txnAppId/txnVersion
   contract applies to the initial write too.
2. kendall_tau_daily uses the standard tau-b denominator: n1/n2 count
   ALL pairs tied on that axis, including pairs tied on both.
3. cramers_v folds the FULL r×c contingency grid: an empty cell
   (O=0, E>0) contributes E to chi².
4. mann_kendall_trend returns NULL var_s/z on a degenerate (all-tied)
   series instead of a cross-engine 0/0 NULL-vs-NaN split.

Each statistical fix is exercised on a SYNTHETIC orders table built to
hit the exact failure scenario (both-tied days / an absent
priority×status combo / a flat daily series) that real sf data may not
contain, with the expectation computed independently in plain Python.
"""

from __future__ import annotations

import datetime
import math
from decimal import Decimal

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ome_arrow_spark.sources import table_log as tl
from ome_arrow_spark.suite_analytics import (
    cramers_v,
    kendall_tau_daily,
    mann_kendall_trend,
)


def _base(spark, n=20):
    return spark.range(0, n).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v")
    )


@pytest.fixture(scope="module")
def ome_images_df(spark):
    from ome_arrow_spark import synth

    return synth.golden_images_df(spark, ids=["single-channel"])


class TestCreateCommitTxn:
    def test_create_records_txn_and_batch0_replay_skipped(self, spark, tmp_path):
        tdir = str(tmp_path / "tbl")
        b0 = _base(spark, 10)
        v0 = tl.create_table(spark, b0, tdir, txn_app="ingest", txn_batch=0)
        assert v0 == 0
        assert tl.table_properties(tdir)["txn.ingest"] == "0"
        # replay of the CREATING micro-batch: detected by append_table's
        # txn check, no rows land, version unchanged
        v1 = tl.append_table(spark, b0, tdir, txn_app="ingest", txn_batch=0)
        assert v1 == 0
        assert tl.read_table(spark, tdir).count() == 10
        # the next batch still advances normally
        v2 = tl.append_table(
            spark, _base(spark, 20).filter("k >= 10"), tdir,
            txn_app="ingest", txn_batch=1,
        )
        assert v2 == 1
        assert tl.read_table(spark, tdir).count() == 20

    def test_create_txn_args_validated(self, spark, tmp_path):
        with pytest.raises(tl.TableLogError, match="go together"):
            tl.create_table(
                spark, _base(spark, 5), str(tmp_path / "t"), txn_app="x"
            )

    def test_create_ome_table_txn(self, spark, tmp_path, ome_images_df):
        tdir = str(tmp_path / "ot")
        one = ome_images_df.limit(1)
        tl.create_ome_table(spark, one, tdir, txn_app="acq", txn_batch=0)
        assert tl.table_properties(tdir)["txn.acq"] == "0"
        v = tl.append_ome_table(spark, one, tdir, txn_app="acq", txn_batch=0)
        assert v == 0  # batch-0 replay skipped
        assert tl.read_ome_table(spark, tdir).count() == 1


def _orders(spark, tmp_path, rows):
    """Write a minimal synthetic orders.parquet and return its sf_dir."""
    schema = T.StructType(
        [
            T.StructField("o_orderdate", T.DateType()),
            T.StructField("o_totalprice", T.DecimalType(12, 2)),
            T.StructField("o_orderpriority", T.StringType()),
            T.StructField("o_orderstatus", T.StringType()),
        ]
    )
    df = spark.createDataFrame(rows, schema)
    d = str(tmp_path / "sf_synth")
    df.coalesce(1).write.parquet(d + "/orders.parquet")
    return d


def _day(i):
    return datetime.date(1995, 1, 1) + datetime.timedelta(days=i)


class TestKendallTauBothTied:
    def test_both_tied_pairs_in_denominator(self, spark, tmp_path):
        # 5 days: days 0 and 1 share BOTH n_orders (2) and spend (30.00)
        # — the exact case r11 ADVICE flagged; days 2/3 tie on count
        # only, day 4 is distinct.
        p = Decimal("10.00")
        rows = (
            [(_day(0), Decimal("10.00"), "1-URGENT", "O")] * 1
            + [(_day(0), Decimal("20.00"), "1-URGENT", "O")]
            + [(_day(1), Decimal("15.00"), "1-URGENT", "O")]
            + [(_day(1), Decimal("15.00"), "1-URGENT", "O")]
            + [(_day(2), Decimal("5.00"), "1-URGENT", "O")] * 3
            + [(_day(3), Decimal("7.00"), "1-URGENT", "O")] * 3
            + [(_day(4), p, "1-URGENT", "O")] * 5
        )
        sf = _orders(spark, tmp_path, rows)
        out = kendall_tau_daily(spark, sf).collect()[0].asDict()

        # independent brute force with the STANDARD tau-b formula
        daily = {}
        for d, tp, _, _ in rows:
            n, s = daily.get(d, (0, Decimal(0)))
            daily[d] = (n + 1, s + tp)
        pts = [daily[k] for k in sorted(daily)]
        n = len(pts)
        conc = disc = tx = ty = 0
        for i in range(n):
            for j in range(i + 1, n):
                (x1, y1), (x2, y2) = pts[i], pts[j]
                if x1 == x2 or y1 == y2:
                    tx += x1 == x2
                    ty += y1 == y2
                elif (x1 < x2) == (y1 < y2):
                    conc += 1
                else:
                    disc += 1
        n0 = n * (n - 1) // 2
        expected = (conc - disc) / math.sqrt(float((n0 - tx) * (n0 - ty)))
        assert out["n_pairs"] == n0
        assert out["conc"] == conc and out["disc"] == disc
        # the query reports ties_x/ties_y EXCLUDING both-tied, plus the
        # both-tied count separately; the standard n1/n2 are the sums
        both = out["ties_both"]
        assert both >= 1  # the scenario actually has a both-tied pair
        assert out["ties_x"] + both == tx
        assert out["ties_y"] + both == ty
        assert out["tau_b"] == pytest.approx(expected, rel=0, abs=1e-12)


class TestCramersVEmptyCell:
    def test_empty_cell_contributes_expected(self, spark, tmp_path):
        # 2 priorities × 2 statuses with one EMPTY combo (p2,F):
        # chi² must include that cell's E term.
        rows = (
            [(_day(0), Decimal("1.00"), "p1", "O")] * 6
            + [(_day(0), Decimal("1.00"), "p1", "F")] * 4
            + [(_day(0), Decimal("1.00"), "p2", "O")] * 5
        )
        sf = _orders(spark, tmp_path, rows)
        out = cramers_v(spark, sf).collect()[0].asDict()

        obs = {("p1", "O"): 6, ("p1", "F"): 4, ("p2", "O"): 5}
        n = sum(obs.values())
        rt = {"p1": 10, "p2": 5}
        ct = {"O": 11, "F": 4}
        chi2 = Decimal(0)
        for pri in rt:
            for st in ct:
                e = rt[pri] * ct[st] / n
                o = obs.get((pri, st), 0)
                chi2 += Decimal(round((o - e) ** 2 / e, 9))
        assert out["n"] == n
        assert out["n_rows_cat"] == 2 and out["n_cols_cat"] == 2
        assert out["chi2"] == pytest.approx(float(chi2), rel=0, abs=1e-12)
        assert out["cramers_v"] == pytest.approx(
            math.sqrt(float(chi2) / (n * 1)), rel=0, abs=1e-12
        )
        # the empty cell's E = 5*4/15 > 1: chi² with it strictly exceeds
        # the observed-cells-only fold, so a regression would be caught
        chi2_observed_only = sum(
            float(Decimal(round((obs[k] - rt[k[0]] * ct[k[1]] / n) ** 2
                                / (rt[k[0]] * ct[k[1]] / n), 9)))
            for k in obs
        )
        assert out["chi2"] > chi2_observed_only


class TestMannKendallDegenerate:
    def test_flat_series_yields_null(self, spark, tmp_path):
        rows = [
            (_day(i), Decimal("1.00"), "p1", "O") for i in range(4)
        ] * 2  # 4 days, every day has exactly 2 orders → all-tied
        sf = _orders(spark, tmp_path, rows)
        out = mann_kendall_trend(spark, sf).collect()[0].asDict()
        assert out["n_days"] == 4
        assert out["s_stat"] == 0
        assert out["var_s"] is None
        assert out["z"] is None

    def test_trending_series_unchanged(self, spark, tmp_path):
        rows = [
            (_day(i), Decimal("1.00"), "p1", "O")
            for i in range(4)
            for _ in range(i + 1)  # 1,2,3,4 orders/day → monotone
        ]
        sf = _orders(spark, tmp_path, rows)
        out = mann_kendall_trend(spark, sf).collect()[0].asDict()
        n = 4
        var18 = n * (n - 1) * (2 * n + 5)
        assert out["s_stat"] == 6
        assert out["var_s"] == pytest.approx(var18 / 18)
        assert out["z"] == pytest.approx(5 / math.sqrt(var18 / 18))
