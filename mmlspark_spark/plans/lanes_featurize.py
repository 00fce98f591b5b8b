"""Featurization lanes (SURVEY §2.8, §2.10)

Split from the former single-file ``plans/catalog.py`` (round 15,
purely mechanical — no lane changed; the ``CATALOG`` registry in
``plans.catalog`` is the only contract and import order preserves the
original registration order)."""

from __future__ import annotations

from pyspark.sql import functions as F  # noqa: F401
from pyspark.sql import DataFrame  # noqa: F401
from pyspark.sql.window import Window  # noqa: F401

from mmlspark_spark.plans.catalog import _t, register  # noqa: F401

# Featurization (SURVEY §2.8, §2.10)
# ---------------------------------------------------------------------------

@register(
    "value_indexer",
    oracle="""
    WITH lv AS (
      SELECT l_returnflag,
             CAST(dense_rank() OVER (ORDER BY l_returnflag) - 1 AS INTEGER) AS idx
      FROM (SELECT DISTINCT l_returnflag FROM lineitem)
    )
    SELECT idx, count(*) AS n
    FROM lineitem JOIN lv USING (l_returnflag)
    GROUP BY idx
    """,
)
def value_indexer(spark, sf_dir):
    """ValueIndexer: deterministic sorted distinct→index mapping applied
    via broadcast join (parity: featurize/ValueIndexer.scala:56-203)."""
    from mmlspark_spark.featurize import ValueIndexer

    li = _t(spark, sf_dir, "lineitem")
    model = ValueIndexer(inputCol="l_returnflag", outputCol="idx").fit(li)
    return model.transform(li).groupBy("idx").agg(F.count("*").alias("n"))


@register(
    "clean_missing",
    oracle="""
    WITH t AS (
      SELECT o_orderpriority,
             CASE WHEN o_totalprice < 100000 THEN NULL ELSE o_totalprice END AS v
      FROM orders
    ), m AS (SELECT avg(v) AS mv FROM t)
    SELECT o_orderpriority,
           round(sum(coalesce(v, (SELECT mv FROM m))), 4) AS total,
           count(*) AS n
    FROM t GROUP BY o_orderpriority
    """,
)
def clean_missing(spark, sf_dir):
    """CleanMissingData mean imputation (parity:
    featurize/CleanMissingData.scala:48-139): null out small orders, fit
    the mean on the rest, impute, aggregate."""
    from mmlspark_spark.featurize import CleanMissingData

    orders = _t(spark, sf_dir, "orders").select(
        "o_orderpriority",
        F.when(F.col("o_totalprice") < 100000, None)
        .otherwise(F.col("o_totalprice")).alias("v"),
    )
    model = CleanMissingData(cols=["v"], cleaningMode="Mean").fit(orders)
    return (
        model.transform(orders)
        .groupBy("o_orderpriority")
        .agg(F.round(F.sum("v"), 4).alias("total"), F.count("*").alias("n"))
    )


@register(
    "data_conversion",
    oracle="""
    SELECT CAST(l_quantity AS INTEGER) AS qty_int,
           strftime(l_shipdate, '%Y-%m-%d') AS ship_day,
           count(*) AS n
    FROM lineitem GROUP BY 1, 2
    """,
)
def data_conversion(spark, sf_dir):
    """DataConversion: numeric + timestamp→formatted-string casts
    (parity: featurize/DataConversion.scala:83-157)."""
    from mmlspark_spark.featurize import DataConversion

    li = _t(spark, sf_dir, "lineitem").select(
        F.col("l_quantity").alias("qty_int"), F.col("l_shipdate").alias("ship_day")
    )
    out = DataConversion(cols=["qty_int"], convertTo="integer").transform(li)
    out = DataConversion(cols=["ship_day"], convertTo="string",
                         dateTimeFormat="yyyy-MM-dd").transform(out)
    return out.groupBy("qty_int", "ship_day").agg(F.count("*").alias("n"))


@register(
    "ts_featurize",
    oracle="""
    SELECT event_id,
           CAST(epoch_ms(ts) AS DOUBLE) AS epoch_millis,
           CAST(year(ts) AS DOUBLE) AS year,
           CAST(dayofweek(ts) + 1 AS DOUBLE) AS day_of_week,
           CAST(month(ts) AS DOUBLE) AS month,
           CAST(day(ts) AS DOUBLE) AS day_of_month,
           CAST(hour(ts) AS DOUBLE) AS hour
    FROM events
    """,
)
def ts_featurize(spark, sf_dir):
    """Timestamp featurization components (parity:
    featurize/Featurize.scala:188-203) — DuckDB numbers weekdays 0-6
    (Sun=0), Spark 1-7 (Sun=1), so the oracle shifts by one."""
    from mmlspark_spark.featurize.auto import timestamp_features

    ev = _t(spark, sf_dir, "events")
    feats = timestamp_features("ts")
    names = ["epoch_millis", "year", "day_of_week", "month", "day_of_month", "hour"]
    return ev.select(
        "event_id", *[feats[i].alias(n) for i, n in enumerate(names)]
    )


@register(
    "multi_ngram",
    oracle="""
    WITH toks AS (
      SELECT doc_id,
             len(list_filter(string_split_regex(text, '\\s+'), x -> x <> '')) AS nt
      FROM documents
    )
    SELECT doc_id,
           CAST(greatest(nt, 0) + greatest(nt - 1, 0) + greatest(nt - 2, 0)
                AS INTEGER) AS n_grams
    FROM toks
    """,
)
def multi_ngram(spark, sf_dir):
    """MultiNGram over documents: total 1+2+3-gram count per doc
    (parity: featurize/text/MultiNGram.scala:26-70)."""
    from mmlspark_spark.featurize import MultiNGram
    from mmlspark_spark.functions import tokens

    docs = _t(spark, sf_dir, "documents").select(
        "doc_id", tokens("text").alias("toks")
    )
    out = MultiNGram(inputCol="toks", outputCol="grams",
                     lengths=[1, 2, 3]).transform(docs)
    return out.select("doc_id", F.size("grams").alias("n_grams"))


@register(
    "page_splitter",
    oracle="SELECT doc_id, text AS reassembled FROM documents",
)
def page_splitter(spark, sf_dir):
    """PageSplitter: word-boundary-preserving pagination. The oracle is
    the reassembly identity — concatenating the emitted pages must
    reproduce the original text byte-for-byte, which DuckDB checks by
    just selecting the source column (split-loss would hash-mismatch)."""
    from mmlspark_spark.featurize import PageSplitter

    docs = _t(spark, sf_dir, "documents")
    out = PageSplitter(inputCol="text", outputCol="pages",
                       maximumPageLength=200, minimumPageLength=100).transform(docs)
    return out.select(
        "doc_id", F.concat_ws("", "pages").alias("reassembled"))


def _text_featurize_oracle() -> str:
    """Replays the full TextFeaturizer pipeline: RegexTokenizer
    (lowercase, ``\\s+`` gaps split, empties dropped), MultiNGram
    [1,2] (2-grams joined by a single space), HashingTF slots
    (murmur3_x86_32 seed 42 + nonNegativeMod into 2^15 — recomputed
    bit-exact by plans/duckdb_xxh.murmur32_str) and the IDF zero rule
    (a slot present in EVERY document gets idf log(1)=0 and drops out
    of nnz). Token-less documents keep their row with nnz 0, exactly
    like the empty SparseVector."""
    from mmlspark_spark.plans.duckdb_xxh import murmur32_str, nonneg_mod32

    slot = nonneg_mod32(murmur32_str("term", u="yt"), 1 << 15)
    return f"""
    WITH d AS (
      SELECT doc_id, list_filter(
               string_split_regex(lower(text), '[ \\t\\n\\x0B\\f\\r]+'),
               x -> x <> '') AS toks
      FROM documents
    ), grams AS (
      SELECT doc_id,
             unnest(toks || list_transform(
               range(1, greatest(len(toks)-1, 0)+1),
               i -> toks[i] || ' ' || toks[i+1])) AS term
      FROM d
    ), slots AS (
      SELECT DISTINCT doc_id, {slot} AS slot FROM grams
    ), dfreq AS (
      SELECT slot, count(*) AS df FROM slots GROUP BY slot
    )
    SELECT d.doc_id, CAST(coalesce(z.nnz, 0) AS INTEGER) AS nnz
    FROM d LEFT JOIN (
      SELECT s.doc_id, count(*) FILTER (
        WHERE dfreq.df < (SELECT count(*) FROM d)) AS nnz
      FROM slots s JOIN dfreq USING (slot) GROUP BY s.doc_id
    ) z USING (doc_id)
    """


@register("text_featurize_pipeline", oracle=_text_featurize_oracle(),
          headline=True)
def text_featurize_pipeline(spark, sf_dir):
    """TextFeaturizer end-to-end (tokenize → 1,2-grams → hashTF → IDF)
    over documents; returns per-doc nonzero-slot counts, HASH-EXACT
    against a DuckDB oracle replaying the murmur3 slot layout and the
    IDF zero rule (rows-only before round 8)."""
    from mmlspark_spark.featurize import TextFeaturizer

    docs = _t(spark, sf_dir, "documents")
    # fit_transform: ONE tokenize→n-gram→hashTF pass feeds both the IDF
    # fit and the output rows (fit().transform() would tokenize twice)
    out = TextFeaturizer(inputCol="text", outputCol="features",
                         nGramLengths=[1, 2],
                         numFeatures=1 << 15).fit_transform(docs)
    from pyspark.ml.functions import vector_to_array

    from mmlspark_spark.core.cache import propagate_intermediates

    arr = vector_to_array(F.col("features"))
    nnz = F.size(F.filter(arr, lambda x: x != 0.0))
    return propagate_intermediates(out, out.select("doc_id", nnz.alias("nnz")))


# ---------------------------------------------------------------------------
