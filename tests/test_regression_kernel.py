"""The general k-feature Gram OLS kernel (operators/regression.ols_fit)
vs the SQL closed form (ols2_gram query) and DuckDB's regr_* aggregates."""

from __future__ import annotations

import duckdb
import pytest

from dissertation_iceberg_spark.io import load_table
from dissertation_iceberg_spark.operators.regression import ols_fit
from dissertation_iceberg_spark.queries.regression import ols2_gram


def test_ols_fit_matches_closed_form(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").selectExpr(
        "l_returnflag", "l_discount AS x1", "l_tax AS x2", "l_extendedprice AS y"
    )
    fits = {
        f["l_returnflag"]: f
        for f in ols_fit(li, ["x1", "x2"], "y", group_cols=["l_returnflag"])
    }
    sql = {
        r["l_returnflag"]: r.asDict() for r in ols2_gram(spark, sf_dir).collect()
    }
    assert set(fits) == set(sql)
    for flag, f in fits.items():
        s = sql[flag]
        assert f["n"] == s["n"]
        assert abs(f["beta"]["x1"] - s["beta1_r"]) < 1e-4
        assert abs(f["beta"]["x2"] - s["beta2_r"]) < 1e-4
        assert abs(f["beta"]["const"] - s["intercept_r"]) < 1e-4
        assert abs(f["tvals"]["x1"] - s["t_beta1"]) < 1e-3
        assert abs(f["adj_r2"] - s["adj_r2"]) < 1e-6


def test_ols_fit_single_feature_vs_duckdb_regr(spark, sf_dir):
    e = load_table(spark, sf_dir, "events").selectExpr(
        "event_type", "CAST(user_id AS DOUBLE) AS x", "value AS y"
    )
    fits = {
        f["event_type"]: f for f in ols_fit(e, ["x"], "y", group_cols=["event_type"])
    }
    con = duckdb.connect()
    du = con.execute(
        f"""
        SELECT event_type,
               regr_slope(value, CAST(user_id AS DOUBLE)) AS slope,
               regr_intercept(value, CAST(user_id AS DOUBLE)) AS icept,
               regr_r2(value, CAST(user_id AS DOUBLE)) AS r2,
               count(*) AS n
        FROM '{sf_dir}/events.parquet' GROUP BY 1
        """
    ).fetchdf()
    for _, r in du.iterrows():
        f = fits[r["event_type"]]
        assert f["n"] == r["n"]
        assert abs(f["beta"]["x"] - r["slope"]) < 1e-9
        assert abs(f["beta"]["const"] - r["icept"]) < 1e-9
        # adj_r2 -> r2: un-adjust
        n, k = f["n"], 2
        r2 = 1 - (1 - f["adj_r2"]) * (n - k) / (n - 1)
        assert abs(r2 - r["r2"]) < 1e-9


def test_regression_spec_construction():
    from dissertation_iceberg_spark.operators.regression import regression_spec

    x, y = regression_spec("combined", "log", predictive=True)
    assert x == ["order_imbalance_vis", "order_imbalance_hid",
                 "smb", "hml", "rf", "cma", "rmw"]
    assert y == "fut_log_ret"
    x, y = regression_spec("iceberg", "excess", predictive=False, momentum=True)
    assert "momentum" in x and "order_imbalance_ib" in x
    assert y == "log_ret_ex"
    x, y = regression_spec("vis", "log", predictive=False)
    assert x[0] == "order_imbalance" and y == "log_ret"
