"""S8 factor-file reader (skiprows-equivalent) + trading-calendar dim."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from dissertation_iceberg_spark.sources.factors import read_ff_factors, trading_days

FF_FILE = """This file was created by CMPT_ME_BEME_RETS using the 202401 CRSP database.
The 1-month TBill return is from Ibbotson and Associates Inc.
,Mkt-RF,SMB,HML,RMW,CMA,RF
20171229,0.21,-0.11,0.05,0.02,0.01,0.001
20180102,0.85,-0.31,-0.21,0.12,-0.09,0.001
20180103,0.64,0.02,-0.10,-0.08,0.03,0.001
20180104,0.45,-0.15,0.28,0.01,0.11,0.001
Copyright 2024 Kenneth R. French
"""


def test_ff_reader_skips_junk(spark, tmp_path):
    p = tmp_path / "ff5_daily.csv"
    p.write_text(FF_FILE)
    df = read_ff_factors(spark, str(p), min_date="2018-01-01").toPandas()
    assert len(df) == 3  # junk header/footer + pre-2018 row dropped
    assert list(df.columns) == ["date", "mkt_rf", "smb", "hml", "rmw", "cma", "rf"]
    assert df.date.min() == pd.Timestamp("2018-01-02").date()
    assert abs(df.set_index("date").loc[pd.Timestamp("2018-01-03").date(), "smb"] - 0.02) < 1e-12


def test_trading_days_calendar(spark):
    cal = trading_days(spark, "2018-03-01", "2018-03-14").toPandas()
    cal["dow"] = pd.to_datetime(cal.date).dt.dayofweek
    assert (cal[cal.dow < 5].is_trading_day).all()
    assert (~cal[cal.dow >= 5].is_trading_day).all()
    # next trading day after Friday 2018-03-02 is Monday 2018-03-05
    fri = cal[cal.date == pd.Timestamp("2018-03-02").date()].iloc[0]
    assert fri.next_trading_day == pd.Timestamp("2018-03-05").date()
    sat = cal[cal.date == pd.Timestamp("2018-03-03").date()].iloc[0]
    assert sat.prev_trading_day == pd.Timestamp("2018-03-02").date()
    assert sat.next_trading_day == pd.Timestamp("2018-03-05").date()


def test_nyse_holiday_rules():
    """Rule-derived NYSE closures hit the known public dates."""
    import datetime as dt

    from dissertation_iceberg_spark.sources.factors import nyse_holidays

    hols = nyse_holidays(2018, 2022)
    expected = {
        "2018-01-01", "2018-01-15", "2018-02-19", "2018-03-30",  # Good Friday
        "2018-05-28", "2018-07-04", "2018-09-03", "2018-11-22",
        "2018-12-05",  # ad-hoc: national day of mourning
        "2018-12-25",
        "2021-12-24",  # Christmas 2021 (Sat) observed Friday
        "2022-06-20",  # Juneteenth 2022 (Sun) observed Monday
    }
    assert {dt.date.fromisoformat(s) for s in expected} <= hols
    # New Year's Day 2022 fell on Saturday: NOT observed (no shift)
    assert dt.date(2021, 12, 31) not in hols
    assert dt.date(2022, 1, 1) not in hols


def test_trading_days_skips_nyse_holidays(spark):
    cal = trading_days(spark, "2018-07-01", "2018-07-10").toPandas().set_index("date")
    import datetime as dt

    assert not cal.loc[dt.date(2018, 7, 4)].is_trading_day  # Wednesday holiday
    assert cal.loc[dt.date(2018, 7, 3)].is_trading_day
    # next/prev trading day hop OVER the mid-week holiday
    assert cal.loc[dt.date(2018, 7, 3)].next_trading_day == dt.date(2018, 7, 5)
    assert cal.loc[dt.date(2018, 7, 5)].prev_trading_day == dt.date(2018, 7, 3)


def test_spark_ml_minhash_agrees_with_custom(spark, sf_dir):
    """SURVEY §7 step 9 names ml.feature.MinHashLSH — cross-check the
    custom banded MinHash against Spark ML's approxSimilarityJoin."""
    from pyspark.ml.feature import CountVectorizer, MinHashLSH, Tokenizer

    from dissertation_iceberg_spark.io import load_table
    from dissertation_iceberg_spark.operators.dedup import (
        jaccard_near_dup_pairs,
    )

    docs = load_table(spark, sf_dir, "documents")
    tok = Tokenizer(inputCol="text", outputCol="words")
    cv = CountVectorizer(inputCol="words", outputCol="vec", binary=True)
    words = tok.transform(docs)
    model = cv.fit(words)
    vecs = model.transform(words).select("doc_id", "vec")
    mh = MinHashLSH(inputCol="vec", outputCol="hashes", numHashTables=8, seed=42)
    mh_model = mh.fit(vecs)
    sim = (
        mh_model.approxSimilarityJoin(vecs, vecs, 0.8, distCol="jd")
        .filter(F.col("datasetA.doc_id") < F.col("datasetB.doc_id"))
        .select(
            F.col("datasetA.doc_id").alias("id_a"),
            F.col("datasetB.doc_id").alias("id_b"),
            (1 - F.col("jd")).alias("jaccard_ml"),
        )
        .toPandas()
    )
    # exact word-level (n=1 shingle) Jaccard from the custom operator
    exact = jaccard_near_dup_pairs(
        docs, "text", "doc_id", n=1, threshold=0.2
    ).toPandas()
    if len(exact):
        m = exact.merge(sim, on=["id_a", "id_b"], how="inner")
        # ML path (token-set Jaccard) must agree with the custom op
        assert len(m) > 0
        assert (abs(m.jaccard - m.jaccard_ml) < 1e-6).all()


def test_hll_approx_distinct_within_tolerance(spark, sf_dir):
    """approx_count_distinct (HLL++, fixed-size sketch state — the
    100 TB path for vocabulary stats) lands within 5% of the exact
    two-phase distinct across every language group."""
    from pyspark.sql import functions as F

    from dissertation_iceberg_spark.io import load_table

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "lang", F.explode(F.split(F.col("text"), " ")).alias("tok")
    ).filter(F.col("tok") != "")
    got = (
        toks.groupBy("lang")
        .agg(
            F.countDistinct("tok").alias("exact"),
            F.approx_count_distinct("tok", rsd=0.02).alias("approx"),
        )
        .toPandas()
    )
    assert len(got) > 0
    rel_err = (got.approx - got.exact).abs() / got.exact
    assert rel_err.max() < 0.05, got.to_string()


def test_histogram_quantiles_close_to_exact(spark, duck, sf_dir):
    """The 256-bin histogram estimate must land within 2% relative
    error of the exact quantile on the lineitem price distribution."""
    from dissertation_iceberg_spark.queries.sketch_ops import histogram_quantiles

    est = {
        r["q"]: r["est"]
        for r in histogram_quantiles(spark, sf_dir).collect()
    }
    for q, e in est.items():
        exact = duck.execute(
            f"SELECT quantile_cont(l_extendedprice, {q}) FROM lineitem"
        ).fetchone()[0]
        assert abs(e - exact) / abs(exact) < 0.02, (q, e, exact)
