"""NGramLanguageModel and DomainMixer semantics: hand-computed LM
probabilities, smoothing of unseen grams, short/NULL-doc contracts,
mixture quotas, determinism under repartitioning, and the rate-mode
approximation."""

import math

import pytest
from pyspark.sql import functions as F


def _lm_fit(spark, texts, **kw):
    from mmlspark_spark.llm import NGramLanguageModel

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"])
    model = NGramLanguageModel(textCol="text", **kw).fit(df)
    model.set("idCol", "doc_id")
    return df, model


def test_ngram_lm_hand_computed(spark):
    """Corpus ['a b a', 'a b']: uni a:3 b:2 (V=2); bi 'a b':2 'b a':1.
    With k=0.5: P(b|a) = 2.5/4, P(a|b) = 1.5/3."""
    df, model = _lm_fit(spark, ["a b a", "a b"], k=0.5)
    rows = {r.doc_id: r for r in model.transform(df).collect()}
    p_b_a = math.log(2.5 / 4.0)
    p_a_b = math.log(1.5 / 3.0)
    assert rows[0].n_bigrams == 2
    assert rows[0].avg_logprob == pytest.approx((p_b_a + p_a_b) / 2)
    assert rows[1].n_bigrams == 1
    assert rows[1].avg_logprob == pytest.approx(p_b_a)


def test_ngram_lm_short_and_null_docs(spark):
    """<2 tokens → no bigrams → NULL score, n_bigrams 0; NULL text
    likewise (raw_word_ngrams' NULL→[] contract)."""
    from pyspark.sql import types as T

    df, model = _lm_fit(spark, ["a b a", "a b"])
    extra = spark.createDataFrame(
        [(10, "solo"), (11, None), (12, "")],
        T.StructType([T.StructField("doc_id", T.LongType()),
                      T.StructField("text", T.StringType())]))
    rows = {r.doc_id: r for r in model.transform(extra).collect()}
    for i in (10, 11, 12):
        assert rows[i].n_bigrams == 0
        assert rows[i].avg_logprob is None


def test_ngram_lm_unseen_words_smoothed(spark):
    """A fully-unseen bigram scores ln(k / (0 + k·V)) = -ln(V) — the
    add-k floor, never -inf/NULL."""
    df, model = _lm_fit(spark, ["a b a", "a b"], k=0.5)  # V = 2
    unseen = spark.createDataFrame([(99, "zz qq")], ["doc_id", "text"])
    row = model.transform(unseen).collect()[0]
    assert row.n_bigrams == 1
    assert row.avg_logprob == pytest.approx(-math.log(2.0))


def test_ngram_lm_lowercase_folding(spark):
    """lowercase=True folds 'A B' and 'a b' into the same gram."""
    df, model = _lm_fit(spark, ["A B", "a b"], k=0.5, lowercase=True)
    assert model.vocabSize == 2
    rows = model.transform(df).collect()
    assert len({round(r.avg_logprob, 9) for r in rows}) == 1


def _mix_df(spark):
    rows = [(i, "a") for i in range(100)] + \
           [(100 + i, "b") for i in range(50)] + \
           [(150 + i, "c") for i in range(10)]
    return spark.createDataFrame(rows, ["doc_id", "domain"])


def test_domain_mixer_exact_quotas_and_determinism(spark):
    """weights a:3 b:1 × budget 80 → quotas a:60 b:20; domain c (not
    in weights) dropped and reported; the same ids come back under a
    different partitioning."""
    from mmlspark_spark.llm import DomainMixer

    df = _mix_df(spark)
    mixer = DomainMixer(domainCol="domain", idCol="doc_id",
                        weights={"a": 3, "b": 1}, totalBudget=80,
                        exact=True, seed=7)
    out = mixer.transform(df)
    by_dom = {r.domain: r["count"] for r in
              out.groupBy("domain").count().collect()}
    assert by_dom == {"a": 60, "b": 20}
    assert mixer.observedDroppedDomains == ["c"]

    ids = sorted(r.doc_id for r in out.collect())
    again = sorted(
        r.doc_id
        for r in mixer.transform(df.repartition(7)).collect())
    assert ids == again


def test_domain_mixer_quota_caps_at_available(spark):
    """A domain smaller than its quota contributes everything it has
    (no reallocation — the spec is a per-domain ceiling)."""
    from mmlspark_spark.llm import DomainMixer

    df = _mix_df(spark)
    out = DomainMixer(domainCol="domain", idCol="doc_id",
                      weights={"a": 1, "b": 1}, totalBudget=300,
                      exact=True).transform(df)
    by_dom = {r.domain: r["count"] for r in
              out.groupBy("domain").count().collect()}
    # quota 150 each; a has 100, b has 50 → all kept, none borrowed
    assert by_dom == {"a": 100, "b": 50}


def test_domain_mixer_rate_mode_approximates_quota(spark):
    """Rate mode: map-only filter, quota hit within sampling error,
    only weighted domains survive."""
    from mmlspark_spark.llm import DomainMixer

    df = _mix_df(spark)
    out = DomainMixer(domainCol="domain", idCol="doc_id",
                      weights={"a": 3, "b": 1}, totalBudget=80,
                      exact=False, seed=7).transform(df)
    rows = out.collect()
    assert {r.domain for r in rows} <= {"a", "b"}
    n = len(rows)
    assert 40 <= n <= 120  # 80 ± sampling error at these tiny counts
    # no exchange in the selection itself: it is a filter over the scan
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_domain_mixer_validation(spark):
    from mmlspark_spark.llm import DomainMixer

    df = _mix_df(spark)
    with pytest.raises(ValueError, match="weights"):
        DomainMixer(domainCol="domain", idCol="doc_id",
                    weights={}).transform(df)
    strdf = df.withColumn("doc_id", F.col("doc_id").cast("string"))
    with pytest.raises(ValueError, match="integer"):
        DomainMixer(domainCol="domain", idCol="doc_id",
                    weights={"a": 1}).transform(strdf)
