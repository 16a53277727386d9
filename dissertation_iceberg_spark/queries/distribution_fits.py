"""Corpus distribution-law fits (round 3): Zipf rank-frequency slope,
Heaps vocabulary-growth curve, and Good-Turing count-of-count
smoothing — the three classic statistics a training-data pipeline
reads off its token-frequency table before choosing vocabulary sizes
and sampling temperatures. None exist in the reference (its corpus is
LOBSTER messages, not text), but they are first-class for an engine
claiming the LLM-corpus use case at 100 TB.

All three share one fact-scale stage — the (lang, term) -> count
aggregate, map-side combinable — and do their fitting on the O(vocab)
or O(count-of-count) distinct frames that fall out of it. Logs are
quantized once to integer 1e-5 grain (``round(ln(x)*1e5)::BIGINT``)
so every downstream Gram sum is an exact integer in both engines;
with |ln| <= ~30 the squared terms stay < 9.2e18 up to ~1e6-term
vocabularies (headroom documented per query).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from dissertation_iceberg_spark.io import load_table, spread
from dissertation_iceberg_spark.queries.registry import register

# DuckDB-side tokenizer shared with llm_ops (str_split on single space,
# empties dropped) — mirrors Spark's split + filter exactly.
_TOKENS = "list_filter(str_split(text, ' '), x -> x <> '')"

# Integer log grain: 1e-5.  ln(rank), ln(count) <= ~30 for any
# realistic corpus, so |q| <= 3e6, q*q <= 9e12, and a 1e6-term vocab
# sums to <= 9e18 — inside BIGINT.  The 1e6 grain used elsewhere would
# overflow the Sxy sum at ~1e5 terms; 1e5 trades 10x headroom for a
# 1e-5 quantization the 6-dp display rounding cannot see.
_LOG_SCALE = 100_000

_R6_SQL = "CAST(round(({x}) * 1e6) AS BIGINT) / 1e6"


def _r6(col):
    """Portable 6-dp rounding (round-to-integer of x*1e6 is bit-stable
    across engines; round-to-scale is not — see microstructure._r6)."""
    return F.round(col * 1e6).cast("long") / 1e6


def _qlog(col):
    """ln(col) quantized to the shared integer grain."""
    return F.round(F.log(col.cast("double")) * _LOG_SCALE).cast("long")


_QLOG_SQL = f"CAST(round(ln(CAST({{x}} AS DOUBLE)) * {_LOG_SCALE}) AS BIGINT)"


# --------------------------------------------------------------------------
# Zipf rank-frequency fit
# --------------------------------------------------------------------------

_SLOPE_SQL = (
    "(CAST(n_terms AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)"
    " / (CAST(n_terms AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)"
)

_ZIPF_ORACLE = f"""
WITH tf AS (
  SELECT lang, term, count(*) AS c
  FROM (SELECT lang, unnest({_TOKENS}) AS term FROM documents)
  GROUP BY 1, 2),
ranked AS (
  SELECT lang,
         {_QLOG_SQL.format(x="row_number() OVER (PARTITION BY lang ORDER BY c DESC, term)")} AS xq,
         {_QLOG_SQL.format(x="c")} AS yq
  FROM tf),
gram AS (
  SELECT lang,
         CAST(count(*) AS BIGINT) AS n_terms,
         CAST(sum(xq) AS BIGINT) AS sx, CAST(sum(yq) AS BIGINT) AS sy,
         CAST(sum(xq * xq) AS BIGINT) AS sxx,
         CAST(sum(xq * yq) AS BIGINT) AS sxy
  FROM ranked GROUP BY 1)
SELECT lang, n_terms,
  {_R6_SQL.format(x=_SLOPE_SQL)} AS zipf_slope,
  {_R6_SQL.format(x="(CAST(sy AS DOUBLE) - " + _SLOPE_SQL + " * sx) / n_terms / " + str(_LOG_SCALE))} AS zipf_intercept
FROM gram
ORDER BY lang
"""


@register("zipf_fit", oracle=_ZIPF_ORACLE)
def zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language Zipf's-law fit: OLS slope of ln(freq) on ln(rank)
    over the term-frequency table (slope ~ -1 for natural text; the
    deviation is a standard corpus-quality signal).

    Scale shape: the only fact-scale stage is the (lang, term) count
    (map-side combinable).  The rank window runs on the O(vocab)
    distinct-term frame partitioned by lang, logs are quantized to
    integer 1e-5 grain, and the per-language Gram sums (n, Sx, Sy,
    Sxx, Sxy) are exact BIGINTs — the slope is five doubles' worth of
    arithmetic on a 5-row frame.  No raw-double sum ever crosses a
    shuffle; headroom: Sxy < 9e18 up to ~1e6 terms/lang.
    """
    docs = spread(load_table(spark, sf_dir, "documents"))
    tf = (
        docs.select(
            "lang",
            F.explode(
                F.filter(F.split("text", " "), lambda x: x != "")
            ).alias("term"),
        )
        .groupBy("lang", "term")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    w = Window.partitionBy("lang").orderBy(F.desc("c"), F.asc("term"))
    ranked = tf.select(
        "lang",
        _qlog(F.row_number().over(w)).alias("xq"),
        _qlog(F.col("c")).alias("yq"),
    )
    gram = ranked.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_terms"),
        F.sum("xq").alias("sx"),
        F.sum("yq").alias("sy"),
        F.sum(F.col("xq") * F.col("xq")).alias("sxx"),
        F.sum(F.col("xq") * F.col("yq")).alias("sxy"),
    )
    nd = F.col("n_terms").cast("double")
    sxd = F.col("sx").cast("double")
    slope = (nd * F.col("sxy") - sxd * F.col("sy")) / (
        nd * F.col("sxx") - sxd * F.col("sx")
    )
    intercept = (
        (F.col("sy").cast("double") - slope * F.col("sx"))
        / F.col("n_terms")
        / F.lit(float(_LOG_SCALE))
    )
    return gram.select(
        "lang",
        "n_terms",
        _r6(slope).alias("zipf_slope"),
        _r6(intercept).alias("zipf_intercept"),
    )


# --------------------------------------------------------------------------
# Heaps vocabulary-growth curve
# --------------------------------------------------------------------------

_HEAPS_ORACLE = f"""
WITH per_doc AS (
  SELECT lang, doc_id, CAST(len({_TOKENS}) AS BIGINT) AS n_tokens
  FROM documents),
new_terms AS (
  SELECT lang, doc_id, CAST(count(*) AS BIGINT) AS n_new
  FROM (SELECT lang, term, min(doc_id) AS doc_id
        FROM (SELECT lang, doc_id, unnest({_TOKENS}) AS term FROM documents)
        GROUP BY 1, 2)
  GROUP BY 1, 2)
SELECT p.lang, p.doc_id,
  CAST(sum(p.n_tokens) OVER w AS BIGINT) AS cum_tokens,
  CAST(sum(coalesce(t.n_new, 0)) OVER w AS BIGINT) AS cum_vocab
FROM per_doc p LEFT JOIN new_terms t USING (lang, doc_id)
WINDOW w AS (PARTITION BY p.lang ORDER BY p.doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
"""


@register("heaps_law", oracle=_HEAPS_ORACLE)
def heaps_law(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heaps'-law vocabulary-growth curve: cumulative distinct terms
    vs cumulative tokens per language, in doc_id ingestion order — the
    curve whose log-log slope (beta ~ 0.5 for natural text) drives
    vocabulary-size planning.

    Scale shape: first-occurrence doc per term is a min() aggregate on
    the (lang, term) frame — no per-doc state, no re-scan; the two
    cumulative sums run on the O(docs) per-document frame partitioned
    by lang.  Everything is exact integers.
    """
    docs = spread(load_table(spark, sf_dir, "documents"))
    toks = docs.select(
        "lang",
        "doc_id",
        F.explode(F.filter(F.split("text", " "), lambda x: x != "")).alias(
            "term"
        ),
    )
    per_doc = docs.select(
        "lang",
        "doc_id",
        F.size(F.filter(F.split("text", " "), lambda x: x != ""))
        .cast("long")
        .alias("n_tokens"),
    )
    new_terms = (
        toks.groupBy("lang", "term")
        .agg(F.min("doc_id").alias("doc_id"))
        .groupBy("lang", "doc_id")
        .agg(F.count(F.lit(1)).cast("long").alias("n_new"))
    )
    joined = per_doc.join(new_terms, ["lang", "doc_id"], "left").select(
        "lang",
        "doc_id",
        "n_tokens",
        F.coalesce("n_new", F.lit(0)).alias("n_new"),
    )
    w = (
        Window.partitionBy("lang")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return joined.select(
        "lang",
        "doc_id",
        F.sum("n_tokens").over(w).cast("long").alias("cum_tokens"),
        F.sum("n_new").over(w).cast("long").alias("cum_vocab"),
    )


# --------------------------------------------------------------------------
# Good-Turing count-of-count smoothing
# --------------------------------------------------------------------------

_GT_ORACLE = f"""
WITH tf AS (
  SELECT term, count(*) AS c
  FROM (SELECT unnest({_TOKENS}) AS term FROM documents)
  GROUP BY 1),
coc AS (
  SELECT c AS r, CAST(count(*) AS BIGINT) AS n_r FROM tf GROUP BY 1),
tot AS (SELECT CAST(sum(c) AS BIGINT) AS n_tokens FROM tf),
led AS (
  SELECT r, n_r,
         lead(r) OVER (ORDER BY r) AS r_next,
         lead(n_r) OVER (ORDER BY r) AS n_next
  FROM coc)
SELECT CAST(r AS BIGINT) AS r, n_r,
  CASE WHEN r_next = r + 1
       THEN {_R6_SQL.format(x="(r + 1) * CAST(n_next AS DOUBLE) / n_r")}
       ELSE NULL END AS r_star,
  CASE WHEN r_next = r + 1
       THEN CAST(round((r + 1) * CAST(n_next AS DOUBLE) / n_r
                       / n_tokens * 1e9) AS BIGINT)
       ELSE NULL END AS p_gt_nano
FROM led CROSS JOIN tot
"""


@register("good_turing", oracle=_GT_ORACLE)
def good_turing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Good-Turing frequency smoothing over the corpus term table:
    count-of-counts N_r, the adjusted count r* = (r+1)·N_{r+1}/N_r,
    and the smoothed probability r*/N (NULL where N_{r+1} is absent,
    i.e. the unsmoothable tail) — the classic unseen-mass estimator
    behind Katz backoff.

    Scale shape: term counts (fact-scale, map-side combinable) ->
    count-of-counts (O(vocab) -> O(distinct r)); the lead() runs on
    the tiny unpartitioned count-of-count frame (O(distinct r) rows,
    never row-scale — same accepted class as SCALE.md's O(bins)
    windows).  p is emitted at integer 1e-9 grain to survive hashing.
    """
    docs = spread(load_table(spark, sf_dir, "documents"))
    tf = (
        docs.select(
            F.explode(
                F.filter(F.split("text", " "), lambda x: x != "")
            ).alias("term")
        )
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    coc = tf.groupBy(F.col("c").alias("r")).agg(
        F.count(F.lit(1)).cast("long").alias("n_r")
    )
    tot = tf.agg(F.sum("c").cast("long").alias("n_tokens"))
    w = Window.orderBy("r")  # O(distinct r) frame — tiny by construction
    led = coc.select(
        "r",
        "n_r",
        F.lead("r").over(w).alias("r_next"),
        F.lead("n_r").over(w).alias("n_next"),
    )
    adjacent = F.col("r_next") == F.col("r") + 1
    r_star = (F.col("r") + 1) * F.col("n_next").cast("double") / F.col("n_r")
    return led.join(F.broadcast(tot)).select(
        F.col("r").cast("long").alias("r"),
        "n_r",
        F.when(adjacent, _r6(r_star)).alias("r_star"),
        F.when(
            adjacent,
            F.round(r_star / F.col("n_tokens") * 1e9).cast("long"),
        ).alias("p_gt_nano"),
    )


# --------------------------------------------------------------------------
# Discrete power-law exponent MLE over the user-activity distribution
# --------------------------------------------------------------------------

_PL_ORACLE = """
WITH deg AS (
  SELECT user_id, CAST(count(*) AS BIGINT) AS d
  FROM events GROUP BY 1),
h AS (
  SELECT d, CAST(count(*) AS BIGINT) AS cnt FROM deg GROUP BY 1),
terms AS (
  SELECT d, cnt,
         CAST(round(ln(2.0 * d) * 1e6) AS BIGINT) AS log_micro
  FROM h),
t AS (
  SELECT CAST(sum(cnt) AS BIGINT) AS n_users,
         CAST(max(d) AS BIGINT) AS d_max,
         CAST(sum(cnt * log_micro) AS BIGINT) AS logsum_micro
  FROM terms)
SELECT n_users, CAST(1 AS BIGINT) AS d_min, d_max,
       round(1.0 + CAST(n_users AS DOUBLE) * 1e6 / logsum_micro, 6) AS alpha,
       round((CAST(n_users AS DOUBLE) * 1e6 / logsum_micro)
             / sqrt(CAST(n_users AS DOUBLE)), 6) AS alpha_se
FROM t
"""


@register("powerlaw_alpha", oracle=_PL_ORACLE)
def powerlaw_alpha(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Discrete power-law exponent MLE over the per-user activity
    distribution: α = 1 + n·[Σ ln(d_i/(d_min − ½))]⁻¹ with d_min = 1
    (Clauset-Shalizi-Newman continuous approximation) and its
    asymptotic standard error (α−1)/√n — the heavy-tail diagnostic
    beside zipf_fit (rank-frequency) and heaps_law (vocab growth),
    here on BEHAVIORAL degrees: is user activity power-law enough to
    need skew-aware partitioning?

    Scale shape: per-user counts reduce to the O(distinct degrees)
    count-of-count histogram; each distinct degree's log is
    micro-rounded ONCE to BIGINT (1e-6 grain, the documented libm
    pattern) and weighted by its exact count, so the log-sum is an
    exact integer in both engines. |ln(2d)|·1e6 ≤ ~3.5e7 and the
    weighted sum stays < 9.2e18 up to ~1e11 users.
    """
    e = load_table(spark, sf_dir, "events")
    deg = e.groupBy("user_id").agg(F.count(F.lit(1)).cast("long").alias("d"))
    h = deg.groupBy("d").agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    terms = h.select(
        "d",
        "cnt",
        F.round(F.log(2.0 * F.col("d")) * 1e6).cast("long").alias("log_micro"),
    )
    t = terms.agg(
        F.sum("cnt").cast("long").alias("n_users"),
        F.max("d").cast("long").alias("d_max"),
        F.sum(F.col("cnt") * F.col("log_micro")).cast("long").alias(
            "logsum_micro"
        ),
    )
    ratio = F.col("n_users").cast("double") * 1e6 / F.col("logsum_micro")
    return t.select(
        "n_users",
        F.lit(1).cast("long").alias("d_min"),
        "d_max",
        F.round(1.0 + ratio, 6).alias("alpha"),
        F.round(ratio / F.sqrt(F.col("n_users").cast("double")), 6).alias(
            "alpha_se"
        ),
    )


# --------------------------------------------------------------------------
# Gumbel (EVT type-I) fit to daily block maxima, with return levels
# --------------------------------------------------------------------------

# binary-exact shared literals: Euler-Mascheroni, sqrt(6)/pi, and the
# Gumbel quantile factors -ln(-ln(1-1/T)) precomputed so NO runtime
# libm call exists in either engine
_EVT_GAMMA = "5.772156649015329e-1"
_EVT_Z = "7.79696801233676e-1"
_EVT_Q30 = "3.3842944934992527e0"
_EVT_Q365 = "5.8985259242227315e0"

_EVT_ORACLE = f"""
WITH daily AS (
  SELECT date_trunc('day', ts) AS day,
         CAST(max(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS mx
  FROM events GROUP BY 1),
s AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(sum(mx) AS BIGINT) AS sx,
         CAST(sum(mx * mx) AS BIGINT) AS sxx
  FROM daily),
fit AS (
  SELECT n,
    CAST(sx AS DOUBLE) / n AS m,
    sqrt((CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx / n) / (n - 1))
      * {_EVT_Z} AS beta
  FROM s)
SELECT n AS n_days,
  round(m / 100.0, 6) AS mean_daily_max,
  round(beta / 100.0, 6) AS beta_dollars,
  round((m - {_EVT_GAMMA} * beta) / 100.0, 6) AS mu_dollars,
  round((m - {_EVT_GAMMA} * beta + beta * {_EVT_Q30}) / 100.0, 6)
    AS return_level_30d,
  round((m - {_EVT_GAMMA} * beta + beta * {_EVT_Q365}) / 100.0, 6)
    AS return_level_365d
FROM fit
"""


@register("evt_gumbel_fit", oracle=_EVT_ORACLE)
def evt_gumbel_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extreme-value (Gumbel) fit to the daily block maxima of event
    value by the method of moments — β = s·√6/π, μ = m − γβ — with
    the 30-day and 1-year return levels μ − β·ln(−ln(1−1/T)): the
    'how big is the biggest value we should expect' tail forecast
    that complements var_cvar (in-sample quantiles) with an
    extrapolating EVT model.

    Scale shape: one map-side-combinable daily-max pass (max of exact
    integer cents); moments reduce on the O(days) frame with exact
    BIGINT power sums. Every irrational constant (γ, √6/π, the two
    quantile factors) is a shared binary-exact literal, so no libm
    call exists at runtime in either engine.
    """
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy(F.date_trunc("day", F.col("ts")).alias("day")).agg(
        F.max(F.round(F.col("value") * 100).cast("long"))
        .cast("long")
        .alias("mx")
    )
    s = daily.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("mx").cast("long").alias("sx"),
        F.sum(F.col("mx") * F.col("mx")).cast("long").alias("sxx"),
    )
    n = F.col("n")
    m = F.col("sx").cast("double") / n
    beta = (
        F.sqrt(
            (F.col("sxx").cast("double") - F.col("sx").cast("double") * F.col("sx") / n)
            / (n - 1)
        )
        * F.expr(_EVT_Z)
    )
    mu = m - F.expr(_EVT_GAMMA) * beta
    return s.select(
        n.alias("n_days"),
        F.round(m / 100.0, 6).alias("mean_daily_max"),
        F.round(beta / 100.0, 6).alias("beta_dollars"),
        F.round(mu / 100.0, 6).alias("mu_dollars"),
        F.round((mu + beta * F.expr(_EVT_Q30)) / 100.0, 6).alias(
            "return_level_30d"
        ),
        F.round((mu + beta * F.expr(_EVT_Q365)) / 100.0, 6).alias(
            "return_level_365d"
        ),
    )
