"""LLM training-data pipeline lanes I: text analysis, dedup families, fingerprint indexes, LSH ANN (engine extras)

Split from the former single-file ``plans/catalog.py`` (round 15,
purely mechanical — no lane changed; the ``CATALOG`` registry in
``plans.catalog`` is the only contract and import order preserves the
original registration order)."""

from __future__ import annotations

from pyspark.sql import functions as F  # noqa: F401
from pyspark.sql import DataFrame  # noqa: F401
from pyspark.sql.window import Window  # noqa: F401

from mmlspark_spark.plans.catalog import _t, register  # noqa: F401

# LLM training-data pipeline: text analysis, dedup, similarity
# ---------------------------------------------------------------------------

@register(
    "token_count",
    oracle="""
    SELECT doc_id,
           CAST(len(list_filter(string_split_regex(text, '\\s+'),
                                x -> x <> '')) AS INTEGER) AS n_tokens
    FROM documents
    """,
)
def token_count_q(spark, sf_dir):
    """Whitespace token counting as a pure Catalyst expression — one map
    stage over the corpus, no shuffle."""
    from mmlspark_spark.functions import token_count

    docs = _t(spark, sf_dir, "documents")
    return docs.select("doc_id", token_count("text").alias("n_tokens"))


@register(
    "quality_score",
    oracle="""
    WITH toks AS (
      SELECT doc_id, length(text) AS len_chars,
             list_filter(string_split_regex(text, '\\s+'), x -> x <> '') AS t
      FROM documents
    )
    SELECT doc_id, len_chars,
           CAST(len(t) AS INTEGER) AS n_tokens,
           round(CAST(len(list_filter(t, x -> length(x) >= 6)) AS DOUBLE) / len(t), 6)
             AS long_token_ratio,
           round(CAST(len(list_filter(t, x -> lower(x) IN ('the','a','of','and','to','in','is','it')))
                 AS DOUBLE) / len(t), 6) AS stopword_ratio
    FROM toks
    """,
)
def quality_score(spark, sf_dir):
    """Document quality heuristics (C4/Gopher-style): length, token count,
    long-token ratio, stopword density. All expressions, zero UDFs."""
    from mmlspark_spark.functions import stopword_ratio, token_count, tokens

    docs = _t(spark, sf_dir, "documents")
    t = tokens("text")
    long_ratio = (
        F.size(F.filter(t, lambda x: F.length(x) >= 6)).cast("double") / F.size(t)
    )
    return docs.select(
        "doc_id",
        F.length("text").alias("len_chars"),
        token_count("text").alias("n_tokens"),
        F.round(long_ratio, 6).alias("long_token_ratio"),
        F.round(stopword_ratio("text"), 6).alias("stopword_ratio"),
    )


@register(
    "lang_stats",
    oracle="""
    SELECT lang, count(*) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS total_chars,
           round(avg(n_chars), 6) AS avg_chars
    FROM documents GROUP BY lang
    """,
)
def lang_stats(spark, sf_dir):
    """Per-language corpus profile (companion to language-ID scoring)."""
    docs = _t(spark, sf_dir, "documents")
    return docs.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_chars").cast("long").alias("total_chars"),
        F.round(F.avg("n_chars"), 6).alias("avg_chars"),
    )


@register(
    "exact_dedup",
    oracle="""
    SELECT min(doc_id) AS doc_id, count(*) AS n_copies
    FROM documents GROUP BY md5(text)
    """,
)
def exact_dedup(spark, sf_dir):
    """ExactDeduplicator: hash-groupBy dedup keeping the lowest id.
    Shuffle key is the 128-bit content hash, never the document text."""
    from mmlspark_spark.llm import ExactDeduplicator

    docs = _t(spark, sf_dir, "documents")
    kept = ExactDeduplicator(keyCols=["text"], idCol="doc_id").transform(docs)
    sizes = docs.groupBy(F.md5(F.col("text")).alias("__h")).agg(
        F.count("*").alias("n_copies")
    )
    return (
        kept.withColumn("__h", F.md5(F.col("text")))
        .join(sizes, "__h")
        .select("doc_id", "n_copies")
    )


@register(
    "ngram_jaccard",
    oracle="""
    WITH toks AS (
      SELECT doc_id,
             list_filter(string_split_regex(text, '\\s+'), x -> x <> '') AS w
      FROM documents
    ), idx AS (
      SELECT doc_id, w, unnest(range(1, greatest(len(w)-3, 1))) AS i FROM toks
    ), sh AS (
      SELECT DISTINCT doc_id,
             w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' || w[i+3] || ' ' || w[i+4]
               AS shingle
      FROM idx
    ), cnt AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
    pairs AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT doc_a, doc_b,
           round(CAST(inter AS DOUBLE) / (ca.n + cb.n - inter), 6) AS jaccard
    FROM pairs
    JOIN cnt ca ON ca.doc_id = doc_a
    JOIN cnt cb ON cb.doc_id = doc_b
    """,
    headline=True,
)
def ngram_jaccard_q(spark, sf_dir):
    """Exact word-5-gram Jaccard over shingle-sharing pairs — the
    candidate space is pruned by the shingle equi-join (SURVEY 'LLM
    extras'; scale path = MinHash below)."""
    from mmlspark_spark.core.cache import propagate_intermediates
    from mmlspark_spark.llm import ngram_jaccard_pairs

    docs = _t(spark, sf_dir, "documents")
    out = ngram_jaccard_pairs(docs, "doc_id", "text", n=5)
    final = out.select("doc_a", "doc_b",
                       F.round("jaccard", 6).alias("jaccard"))
    # .select() returns a new object without the attached persisted
    # handles — propagate so bench's release_intermediates frees them
    return propagate_intermediates(out, final)


@register(
    "curation_pipeline",
    oracle="""
    WITH RECURSIVE kept AS (
      SELECT doc_id, lang, source, text FROM documents
      WHERE NOT (length(text) < 200
                 OR length(text) > 100000
                 OR len(list_filter(string_split_regex(text, '\\s+'),
                                    x -> x <> '')) < 40
                 OR CAST(length(text) - length(regexp_replace(text,
                      '[^\\w\\s]', '', 'g')) AS DOUBLE)
                    / greatest(length(text), 1) > 0.05
                 OR (CASE WHEN len(list_filter(string_split(text, chr(10)),
                                               x -> x <> '')) > 0
                     THEN CAST(len(list_filter(string_split(text, chr(10)),
                                               x -> x <> ''))
                            - len(list_distinct(list_filter(
                                  string_split(text, chr(10)),
                                  x -> x <> ''))) AS DOUBLE)
                          / len(list_filter(string_split(text, chr(10)),
                                            x -> x <> ''))
                     ELSE 0.0 END) > 0.5)
    ), toks AS (
      SELECT doc_id,
             list_filter(string_split_regex(text, '\\s+'), x -> x <> '') AS w
      FROM kept
    ), idx AS (
      SELECT doc_id, w, unnest(range(1, greatest(len(w)-3, 1))) AS i FROM toks
    ), sh AS (
      SELECT DISTINCT doc_id,
             w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' || w[i+3] || ' ' || w[i+4]
               AS shingle
      FROM idx
    ), cnt AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
    inter AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS i
      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ), j AS (
      SELECT doc_a, doc_b FROM inter
      JOIN cnt ca ON ca.doc_id = doc_a
      JOIN cnt cb ON cb.doc_id = doc_b
      WHERE CAST(i AS DOUBLE) / (ca.n + cb.n - i) >= 0.5
    ), edges AS (
      SELECT doc_a AS a, doc_b AS b FROM j
      UNION SELECT doc_b, doc_a FROM j
    ), reach(n, m) AS (
      SELECT a, a FROM edges
      UNION SELECT a, b FROM edges
      UNION SELECT r.n, e.b FROM reach r JOIN edges e ON r.m = e.a
    ), losers AS (
      SELECT n AS doc_id FROM reach GROUP BY n HAVING n <> min(m)
    ), surviving AS (
      SELECT k.doc_id, k.lang, k.source FROM kept k
      WHERE k.doc_id NOT IN (SELECT doc_id FROM losers)
    )
    SELECT doc_id, lang, source FROM (
      SELECT doc_id, lang, source,
             row_number() OVER (PARTITION BY lang, source
                                ORDER BY doc_id) AS rn
      FROM surviving
    ) WHERE rn <= 10
    """)
def curation_pipeline_q(spark, sf_dir):
    """End-to-end corpus curation, the north-star composition proof:
    QualityFilter (C4/Gopher rules) → near-dup resolution (exact
    5-gram Jaccard ≥ 0.5, connected components, min-id survivor) →
    StratifiedSampler cap of 10 per (lang, source). Every stage is
    deterministic, so the WHOLE pipeline is verified exactly against
    one SQL replay (CASE filter → recursive-CTE closure anti-join →
    window cap)."""
    from mmlspark_spark.core.cache import (
        attach_intermediates,
        persist_intermediate,
        propagate_intermediates,
    )
    from mmlspark_spark.llm import (
        QualityFilter,
        ngram_jaccard_pairs,
        resolve_duplicate_clusters,
    )
    from mmlspark_spark.operators.stages import StratifiedSampler

    docs = _t(spark, sf_dir, "documents")
    # `kept` feeds both the shingle pipeline and the left_anti branch;
    # AQE does not reuse the multi-consumer subtree, so without the
    # pin the QualityFilter scan + tokenization would run twice
    kept = persist_intermediate(
        QualityFilter(minChars=200, minTokens=40,
                      maxPunctRatio=0.05).transform(docs)
        .filter(F.col("keep")).drop("keep", "reason"))
    pairs = ngram_jaccard_pairs(kept, "doc_id", "text", n=5)
    losers = (resolve_duplicate_clusters(
        pairs.filter(F.col("jaccard") >= 0.5))
        .filter(~F.col("is_kept")).select("doc_id"))
    surviving = kept.join(losers, "doc_id", "left_anti")
    capped = StratifiedSampler(stratumCols=["lang", "source"],
                               perStratum=10,
                               orderBy="doc_id").transform(surviving)
    out = propagate_intermediates(
        pairs, capped.select("doc_id", "lang", "source"))
    return attach_intermediates(out, kept)


@register(
    "substring_dedup_spans",
    oracle="""
    WITH win AS (
      SELECT doc_id, i AS pos, i + 39 AS e,
             md5(substr(text, i, 40)) AS h
      FROM documents,
           unnest(range(1, greatest(length(text) - 38, 1))) AS t(i)
      WHERE length(text) >= 40
    ), dup AS (
      SELECT h FROM win GROUP BY h HAVING count(*) > 1
    ), marked AS (
      SELECT doc_id, pos, e FROM win JOIN dup USING (h)
    ), flagged AS (
      SELECT doc_id, pos, e,
             CASE WHEN pos > coalesce(max(e) OVER (
                    PARTITION BY doc_id ORDER BY pos
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                    0) THEN 1 ELSE 0 END AS f
      FROM marked
    ), islands AS (
      SELECT doc_id, pos, e,
             sum(f) OVER (PARTITION BY doc_id ORDER BY pos
                          ROWS BETWEEN UNBOUNDED PRECEDING
                          AND CURRENT ROW) AS g
      FROM flagged
    )
    SELECT doc_id, min(pos) AS span_start, max(e) AS span_end
    FROM islands GROUP BY doc_id, g
    """)
def substring_dedup_spans_q(spark, sf_dir):
    """Exact duplicated-substring detection (k=40): every maximal
    character span whose 40-char windows repeat anywhere in the
    corpus. The oracle replays windowing, duplicate marking, and
    interval-island merging from scratch in SQL."""
    from mmlspark_spark.llm.dedup import duplicated_substring_spans

    docs = _t(spark, sf_dir, "documents")
    # maxDocsPerWindow=None: exact semantics, matching the uncapped
    # oracle (the ngram_jaccard convention for oracled queries)
    return duplicated_substring_spans(docs, "doc_id", "text", k=40,
                                      maxDocsPerWindow=None)


@register(
    "embedding_covariance",
    oracle="""
    WITH ex AS (
      SELECT vec_id,
             unnest(embedding) AS v,
             unnest(range(1, len(embedding) + 1)) AS i
      FROM embeddings
    )
    SELECT a.i - 1 AS i, b.i - 1 AS j,
           round(avg(a.v * b.v) - avg(a.v) * avg(b.v), 6) AS cov
    FROM ex a JOIN ex b USING (vec_id)
    WHERE a.i <= b.i
    GROUP BY 1, 2
    """)
def embedding_covariance_q(spark, sf_dir):
    """EmbeddingPCA's fit statistics verified cross-engine: the
    distributed one-pass (count, Σx, Σxxᵀ) moment reduction must
    reproduce the population covariance DuckDB computes from scratch —
    upper triangle, 6dp. This checks the operator's math, not just
    its output shape; the eigendecomposition on top is unit-tested
    against planted components (sign/order canonicalized)."""
    from mmlspark_spark.llm.embeddings import EmbeddingPCA

    emb = _t(spark, sf_dir, "embeddings")
    cov = EmbeddingPCA(inputCol="embedding").covariance(emb)
    d = cov.shape[0]
    rows = [(i, j, float(round(cov[i, j], 6)))
            for i in range(d) for j in range(i, d)]
    return spark.createDataFrame(rows, "i int, j int, cov double")


@register(
    "quality_filter",
    oracle="""
    SELECT doc_id, reason, (reason IS NULL) AS keep FROM (
      SELECT doc_id,
        CASE
          WHEN length(text) < 200 THEN 'too_short'
          WHEN length(text) > 100000 THEN 'too_long'
          WHEN len(list_filter(string_split_regex(text, '\\s+'),
                               x -> x <> '')) < 40 THEN 'too_few_tokens'
          WHEN CAST(length(text) - length(regexp_replace(text,
                 '[^\\w\\s]', '', 'g')) AS DOUBLE)
               / greatest(length(text), 1) > 0.05 THEN 'punct_heavy'
          WHEN (CASE WHEN len(list_filter(string_split(text, chr(10)),
                                          x -> x <> '')) > 0
                THEN CAST(len(list_filter(string_split(text, chr(10)),
                                          x -> x <> ''))
                       - len(list_distinct(list_filter(
                             string_split(text, chr(10)),
                             x -> x <> ''))) AS DOUBLE)
                     / len(list_filter(string_split(text, chr(10)),
                                       x -> x <> ''))
                ELSE 0.0 END) > 0.5 THEN 'repetitious'
        END AS reason
      FROM documents
    )
    """)
def quality_filter_q(spark, sf_dir):
    """C4/Gopher rule filter with auditable drop reasons — pure
    expressions, one map stage (QualityFilter op). Thresholds chosen
    so the sf corpus exercises both verdicts."""
    from mmlspark_spark.llm.quality import QualityFilter

    docs = _t(spark, sf_dir, "documents")
    out = QualityFilter(minChars=200, minTokens=40,
                        maxPunctRatio=0.05).transform(docs)
    return out.select("doc_id", "reason", "keep")


@register(
    "stratified_sample",
    oracle="""
    SELECT doc_id, lang, source FROM (
      SELECT doc_id, lang, source,
             row_number() OVER (PARTITION BY lang, source
                                ORDER BY doc_id) AS rn
      FROM documents
    ) WHERE rn <= 10
    """)
def stratified_sample_q(spark, sf_dir):
    """Exact per-stratum subsample: cap each (lang, source) bucket at
    its 10 lowest doc ids — the deterministic training-data curation
    mode of StratifiedSampler (the seeded-Bernoulli mode is rows-only
    by nature). perStratum=10 BINDS at every driver sf (max stratum is
    16 docs at sf0.001/0.01), so the oracle actually exercises the
    capping logic, not an identity pass-through."""
    from mmlspark_spark.operators.stages import StratifiedSampler

    docs = _t(spark, sf_dir, "documents")
    out = StratifiedSampler(stratumCols=["lang", "source"], perStratum=10,
                            orderBy="doc_id").transform(docs)
    return out.select("doc_id", "lang", "source")


@register(
    "dedup_resolve",
    oracle="""
    WITH RECURSIVE toks AS (
      SELECT doc_id,
             list_filter(string_split_regex(text, '\\s+'), x -> x <> '') AS w
      FROM documents
    ), idx AS (
      SELECT doc_id, w, unnest(range(1, greatest(len(w)-3, 1))) AS i FROM toks
    ), sh AS (
      SELECT DISTINCT doc_id,
             w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' || w[i+3] || ' ' || w[i+4]
               AS shingle
      FROM idx
    ), cnt AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
    inter AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS i
      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ), j AS (
      SELECT doc_a, doc_b FROM inter
      JOIN cnt ca ON ca.doc_id = doc_a
      JOIN cnt cb ON cb.doc_id = doc_b
      WHERE CAST(i AS DOUBLE) / (ca.n + cb.n - i) >= 0.5
    ), edges AS (
      SELECT doc_a AS a, doc_b AS b FROM j
      UNION SELECT doc_b, doc_a FROM j
    ), reach(n, m) AS (
      SELECT a, a FROM edges
      UNION SELECT a, b FROM edges
      UNION SELECT r.n, e.b FROM reach r JOIN edges e ON r.m = e.a
    )
    SELECT n AS doc_id, min(m) AS component,
           (n = min(m)) AS is_kept
    FROM reach GROUP BY n
    """)
def dedup_resolve_q(spark, sf_dir):
    """End-to-end dedup resolution: exact n-gram Jaccard candidates at
    threshold 0.5 → connected components over the pair graph → one
    canonical survivor (min doc id) per cluster. The oracle replays
    the clustering as a recursive transitive closure, so the iterative
    min-label propagation is verified exactly — component labels,
    membership, and survivor choice."""
    from mmlspark_spark.core.cache import propagate_intermediates
    from mmlspark_spark.llm import (
        ngram_jaccard_pairs,
        resolve_duplicate_clusters,
    )

    docs = _t(spark, sf_dir, "documents")
    pairs = ngram_jaccard_pairs(docs, "doc_id", "text", n=5)
    close = pairs.filter(F.col("jaccard") >= 0.5)
    out = resolve_duplicate_clusters(close)
    return propagate_intermediates(pairs, out)


@register(
    "ngram_lm_score",
    oracle="""
    WITH toks AS (
      SELECT doc_id,
             list_filter(string_split_regex(lower(text), '\\s+'),
                         x -> x <> '') AS t
      FROM documents
    ), uc AS (
      SELECT w, count(*) AS uc
      FROM (SELECT unnest(t) AS w FROM toks) GROUP BY w
    ), v AS (SELECT count(*) AS v FROM uc),
    bg AS (
      SELECT doc_id,
             unnest(list_transform(range(1, len(t)), i -> t[i])) AS w1,
             unnest(list_transform(range(1, len(t)),
                                   i -> t[i] || ' ' || t[i+1])) AS b
      FROM toks
    ), bc AS (SELECT b, count(*) AS bc FROM bg GROUP BY b),
    scored AS (
      SELECT g.doc_id,
             round(avg(ln((coalesce(bc.bc, 0) + 0.5)
                          / (coalesce(uc.uc, 0)
                             + 0.5 * (SELECT v FROM v)))), 6)
               AS avg_logprob,
             CAST(count(*) AS INTEGER) AS n_bigrams
      FROM bg g LEFT JOIN bc ON g.b = bc.b LEFT JOIN uc ON g.w1 = uc.w
      GROUP BY g.doc_id
    )
    SELECT d.doc_id, s.avg_logprob,
           coalesce(s.n_bigrams, 0) AS n_bigrams
    FROM documents d LEFT JOIN scored s ON d.doc_id = s.doc_id
    """)
def ngram_lm_score(spark, sf_dir):
    """CCNet-style LM quality signal: fit an exact add-k bigram model
    on the corpus, score every document by mean log-probability
    (NGramLanguageModel). Fit is two count shuffles; scoring is an
    explode + two hash joins on gram keys — and because the counts
    are exact integers the score is engine-portable, so the oracle
    verifies the actual probabilities hash-exact, not just row
    counts."""
    from mmlspark_spark.core.cache import propagate_intermediates
    from mmlspark_spark.llm import NGramLanguageModel

    docs = _t(spark, sf_dir, "documents")
    model = NGramLanguageModel(textCol="text", k=0.5, lowercase=True).fit(docs)
    model.set("idCol", "doc_id")
    out = model.transform(docs)
    final = out.select(
        "doc_id", F.round("avg_logprob", 6).alias("avg_logprob"),
        "n_bigrams")
    # keep the persisted count-frame handles visible to the caller's
    # release_intermediates
    return propagate_intermediates(out, final)


@register(
    "domain_mix",
    oracle="""
    WITH w(lang, q) AS (
      VALUES ('en', 150), ('de', 60), ('fr', 45), ('es', 30), ('zh', 15)
    ), ranked AS (
      SELECT doc_id, lang,
             row_number() OVER (
               PARTITION BY lang
               ORDER BY ((((doc_id + 42) % 2147483647) * 48271 % 2147483647)
                         * 48271) % 2147483647,
                        doc_id) AS rn
      FROM documents)
    SELECT doc_id, lang FROM ranked JOIN w USING (lang) WHERE rn <= q
    """)
def domain_mix(spark, sf_dir):
    """Target-mixture resampling (DomainMixer, exact mode): integer
    weights 10/4/3/2/1 over langs × budget 300 → quotas 150/60/45/30/15,
    filled by a deterministic Lehmer-hash ranking so the selection is a
    uniform-but-reproducible sample, not an ingest-order head. The
    oracle replays quota ranking with the same integer arithmetic —
    the mixture is verified membership-exact. (The zero-shuffle rate
    mode is the 100 TB path; it trades quota exactness for a map-only
    plan and is recall-tested in tests/ instead.)"""
    from mmlspark_spark.llm import DomainMixer

    docs = _t(spark, sf_dir, "documents")
    mixer = DomainMixer(
        domainCol="lang", idCol="doc_id",
        weights={"en": 10, "de": 4, "fr": 3, "es": 2, "zh": 1},
        totalBudget=300, exact=True, seed=42)
    return mixer.transform(docs).select("doc_id", "lang")


@register(
    "domain_temperature_mix",
    oracle="""
    WITH counts AS (
      SELECT lang, count(*) AS cnt FROM documents GROUP BY lang
    ), w AS (
      SELECT lang,
             CAST(floor(pow(cnt, 0.5) * 1000000) AS BIGINT) AS wi
      FROM counts
    ), q AS (
      SELECT lang,
             300 * wi // (SELECT CAST(sum(wi) AS BIGINT) FROM w) AS quota
      FROM w
    ), ranked AS (
      SELECT doc_id, lang,
             row_number() OVER (
               PARTITION BY lang
               ORDER BY ((((doc_id + 42) % 2147483647) * 48271 % 2147483647)
                         * 48271) % 2147483647,
                        doc_id) AS rn
      FROM documents)
    SELECT r.doc_id, r.lang FROM ranked r
    JOIN q ON r.lang IS NOT DISTINCT FROM q.lang
    WHERE rn <= quota
    """)
def domain_temperature_mix(spark, sf_dir):
    """Temperature-sampled mixture (DomainMixer(temperature=0.5)):
    weights derived from the observed per-lang counts as count^0.5 —
    the XLM-R/mT5 recipe that flattens a head-heavy corpus toward its
    rare domains (en dominates this table ~3:1 over each other lang;
    at α=0.5 its quota share shrinks toward parity). The float pow is
    quantized to an integer weight (floor(count^α·10⁶)) and the quota
    is exact integer arithmetic (budget·w // Σw), so the oracle
    replays quota derivation AND the Lehmer-ranked fill bit-for-bit —
    membership-exact like domain_mix, but with the weights COMPUTED
    from the data instead of given."""
    from mmlspark_spark.llm import DomainMixer

    docs = _t(spark, sf_dir, "documents")
    mixer = DomainMixer(domainCol="lang", idCol="doc_id",
                        temperature=0.5, totalBudget=300,
                        exact=True, seed=42)
    return mixer.transform(docs).select("doc_id", "lang")


@register(
    "chunk_overlap",
    oracle="""
    WITH t AS (
      SELECT doc_id, list_filter(string_split_regex(text, '[ \\t\\n\\r]+'),
                                 x -> x <> '') AS toks
      FROM documents
    ), s AS (
      SELECT doc_id, toks, unnest(range(0, len(toks), 16)) AS st
      FROM t WHERE len(toks) > 0
    )
    SELECT doc_id,
           CAST(st // 16 AS BIGINT) AS chunk_id,
           CAST(len(list_slice(toks, st + 1, st + 32)) AS BIGINT)
             AS n_tokens,
           array_to_string(list_slice(toks, st + 1, st + 32), ' ')
             AS chunk
    FROM s
    """)
def chunk_overlap(spark, sf_dir):
    """Overlap-stride chunking (chunk_documents, 32-token windows
    every 16): the retrieval/eval-prep layout — consecutive chunks
    share half their tokens so no boundary-straddling span is lost.
    Map-only plan: tokenize once per row behind a Generate barrier
    (CollapseProject would otherwise re-inline the tokenize into every
    slice, O(tokens × chunks) per doc), then sequence+slice+posexplode
    — no shuffle at any scale. The oracle replays windows, stride
    arithmetic and the whitespace class token-for-token."""
    from mmlspark_spark.llm import chunk_documents

    docs = _t(spark, sf_dir, "documents")
    out = chunk_documents(docs, idCol="doc_id", textCol="text",
                          chunkTokens=32, stride=16)
    return out.select("doc_id",
                      F.col("chunk_id").cast("long").alias("chunk_id"),
                      F.col("n_tokens").cast("long").alias("n_tokens"),
                      "chunk")


@register(
    "vocab_build",
    oracle="""
    WITH words AS (
      SELECT unnest(list_filter(
               string_split_regex(text, '[ \\t\\n\\x0B\\f\\r]+'),
               x -> x <> '')) AS word
      FROM documents
    ), hist AS (
      SELECT word, CAST(count(*) AS BIGINT) AS freq
      FROM words GROUP BY word HAVING count(*) >= 3
    )
    SELECT CAST(row_number() OVER (ORDER BY freq DESC, word) - 1
                AS BIGINT) AS token_id,
           word, freq
    FROM hist
    """)
def vocab_build(spark, sf_dir):
    """Distributed word-level vocabulary (build_vocabulary, minCount=3)
    — the artifact LLM pipelines ship to tokenizers / LM smoothing.
    Corpus-scale work is one tokenize + groupBy(word) shuffle; the
    deterministic (freq DESC, word ASC) id ranking runs over the
    vocabulary-sized histogram (Heaps' law — MBs at 100 TB corpus
    scale), where a single-partition sort is harmless. Hash-exact:
    tokenize class, tie-break, and id arithmetic all replay in SQL."""
    from mmlspark_spark.llm import build_vocabulary

    docs = _t(spark, sf_dir, "documents")
    return build_vocabulary(docs, textCol="text", minCount=3)


def _bpe_merges_oracle(num_merges: int = 8, max_doc: int = 40) -> str:
    """Replays the BPE merge-learning loop (tokenizer._learn_merges)
    at toy scale by UNROLLING the iterations into generated CTEs —
    one (pair-count → argmax-with-lex-ties → greedy-merge) block per
    merge. The greedy non-overlapping left-to-right merge inside each
    word is a list_reduce fold whose accumulator is a
    struct(o := chr(1)-joined emitted symbols, p := pending symbol):
    merging sets p := l||r (the merged symbol can never be the left
    of the same pair again — exactly Python's i += 2), otherwise p is
    emitted onto o. Strings, not a struct-of-list accumulator —
    DuckDB 1.0's list_reduce mis-folds list-typed struct fields.
    Tie-break is (count DESC, l ASC, r ASC), byte order == code-point
    order under UTF-8, matching the Python heap's tuple order. The
    big-corpus lane (bpe_tokenize) stays rows-only by design: at
    numMerges=1000 the unrolled SQL would be ~3000 CTEs, and merge
    learning is still driver-side over the Heaps-law histogram either
    way — this toy lane proves the ALGORITHM replays exactly."""
    parts = [f"""
    WITH words AS (
      SELECT unnest(list_filter(
               string_split_regex(lower(text), '[ \\t\\n\\x0B\\f\\r]+'),
               x -> x <> '')) AS w
      FROM documents
      WHERE doc_id < {max_doc} AND text IS NOT NULL
        AND strpos(text, chr(1)) = 0
    ), st0 AS (
      SELECT w, CAST(count(*) AS BIGINT) AS c,
             list_append(list_transform(range(length(w)),
                                        i -> w[i+1:i+1]), '</w>') AS syms
      FROM words GROUP BY w
    )"""]
    for i in range(1, num_merges + 1):
        parts.append(f""", pc{i} AS (
      SELECT pr.l AS l, pr.r AS r, CAST(sum(c) AS BIGINT) AS cnt FROM (
        SELECT c, unnest(list_transform(range(len(syms) - 1),
                 j -> struct_pack(l := syms[j+1], r := syms[j+2]))) AS pr
        FROM st{i-1}) GROUP BY pr.l, pr.r
    ), best{i} AS (
      SELECT l, r FROM pc{i} ORDER BY cnt DESC, l ASC, r ASC LIMIT 1
    ), st{i} AS (
      SELECT w, c, list_filter(string_split(f.o || chr(1) || f.p, chr(1)),
                               s -> s <> '') AS syms
      FROM (SELECT w, c, list_reduce(
              list_transform(syms, s -> struct_pack(o := '', p := s)),
              (a, x) -> CASE WHEN a.p = b.l AND x.p = b.r
                        THEN struct_pack(o := a.o, p := a.p || x.p)
                        ELSE struct_pack(o := a.o || chr(1) || a.p,
                                         p := x.p) END) AS f
            FROM st{i-1}, best{i} b)
    )""")
    sel = " UNION ALL ".join(
        f"SELECT CAST({i} AS INT) AS rnk, l, r FROM best{i}"
        for i in range(1, num_merges + 1))
    parts.append(f" SELECT * FROM ({sel}) ORDER BY rnk")
    return "".join(parts)


@register("bpe_merges_small", oracle=_bpe_merges_oracle())
def bpe_merges_small(spark, sf_dir):
    """BPE merge learning (BPETokenizer.fit) at toy scale — the
    data-dependent half of BPE, fully replayed: the fit's ONE
    distributed shuffle builds the word histogram (docs 0..39,
    lowercased, ASCII-whitespace split), then 8 argmax merges with
    (count DESC, pair lex ASC) tie-breaks learn the merge table.
    Returns (rnk, l, r) — the fitted artifact itself. The production
    lane (bpe_tokenize, numMerges=1000 over the full corpus) shares
    this exact code path and stays rows-only only because 1000
    unrolled CTEs is not a reasonable oracle; the algorithm is proven
    here and the encode side is pinned by hand-computed sequences in
    tests."""
    from mmlspark_spark.llm.tokenizer import BPETokenizer

    docs = (_t(spark, sf_dir, "documents")
            .filter((F.col("doc_id") < 40)
                    & F.col("text").isNotNull()
                    & ~F.col("text").contains("\x01")))
    model = BPETokenizer(textCol="text", numMerges=8).fit(docs)
    return spark.createDataFrame(
        [(i + 1, m[0], m[1]) for i, m in enumerate(model.merges)],
        "rnk int, l string, r string")


@register(
    "hash_split",
    oracle="""
    WITH h1 AS (
      SELECT doc_id,
             (((doc_id + 42) % 2147483647) * 48271) % 2147483647 AS h
      FROM documents
    ), h2 AS (
      SELECT doc_id, (xor(h, h >> 15) * 48271) % 2147483647 AS h
      FROM h1
    ), u AS (
      SELECT doc_id, xor(h, h >> 13) % 2147483647 AS u FROM h2
    )
    SELECT doc_id,
           CASE WHEN u < 1932735282 THEN 'train'
                WHEN u < 2040109464 THEN 'val'
                ELSE 'test' END AS split
    FROM u
    """)
def hash_split(spark, sf_dir):
    """Deterministic train/val/test split (HashSplitter 90/5/5): a
    row's split is a pure function of its id via a NONLINEAR
    xorshift-Lehmer uniform (the plain Lehmer key is linear in the id
    — sequential ids form a lattice that can leave a narrow band
    empty), so assignment survives corpus growth (new docs never move
    old docs between splits — randomSplit reshuffles every run and
    leaks test into train). Thresholds are exact integers
    floor(cum_frac × m) (1932735282 = ⌊0.9·(2³¹−1)⌋, 2040109464 =
    ⌊0.95·(2³¹−1)⌋), and the oracle replays multiply/xorshift/
    threshold bit-for-bit. One CASE expression on a map stage — zero
    shuffles at any scale."""
    from mmlspark_spark.llm import HashSplitter

    docs = _t(spark, sf_dir, "documents")
    out = HashSplitter(idCol="doc_id",
                       splits={"train": 0.9, "val": 0.05, "test": 0.05},
                       seed=42).transform(docs)
    return out.select("doc_id", "split")


@register(
    "embedding_kmeans_assign",
    oracle="""
    WITH cent AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS cvec,
             row_number() OVER (
               ORDER BY ((((vec_id + 42) % 2147483647) * 48271 % 2147483647)
                         * 48271) % 2147483647, vec_id) AS rk
      FROM embeddings WHERE embedding IS NOT NULL
    ), c AS (SELECT CAST(rk - 1 AS INTEGER) AS cluster, cvec
             FROM cent WHERE rk <= 8),
    d AS (
      SELECT e.vec_id, c.cluster,
             list_distance(CAST(e.embedding AS DOUBLE[]), c.cvec) AS dist
      FROM embeddings e CROSS JOIN c
      WHERE e.embedding IS NOT NULL
    )
    SELECT vec_id, cluster FROM (
      SELECT vec_id, cluster,
             row_number() OVER (PARTITION BY vec_id
                                ORDER BY dist, cluster) AS rn
      FROM d
    ) WHERE rn = 1
    """)
def embedding_kmeans_assign(spark, sf_dir):
    """EmbeddingKMeans assignment pass (maxIter=0): nearest of the 8
    hash-rank-seeded centroids per vector, ties to the lower cluster
    index. Centroids broadcast into one Arrow-batched argmin map — no
    shuffle — and every step (hash-ranked init, argmin, tie-break) is
    deterministic, so the oracle replays the whole operator (both
    sides use the direct (x-c)² distance form and a lower-index
    tie-break; the only residual divergence channel is float
    summation order inside the distance itself, negligible off exact
    ties). NULL vectors are excluded on both sides — the model's
    NULL→NULL cluster contract has no SQL analog. The Lloyd
    iterations on top (update = posexplode + partial-agg avg) are
    convergence-tested in tests/ instead (iteration count is
    data-dependent)."""
    from mmlspark_spark.llm import EmbeddingKMeans

    emb = _t(spark, sf_dir, "embeddings")
    model = EmbeddingKMeans(inputCol="embedding", idCol="vec_id",
                            k=8, maxIter=0).fit(emb)
    return (model.transform(emb)
            .filter(F.col("embedding").isNotNull())
            .select("vec_id", F.col("__km_cluster").alias("cluster")))


@register(
    "semantic_dedup",
    oracle="""
    WITH cent AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS cvec,
             row_number() OVER (
               ORDER BY ((((vec_id + 42) % 2147483647) * 48271 % 2147483647)
                         * 48271) % 2147483647, vec_id) AS rk
      FROM embeddings WHERE embedding IS NOT NULL
    ), c AS (SELECT CAST(rk - 1 AS INTEGER) AS cluster, cvec
             FROM cent WHERE rk <= 8),
    asg AS (
      SELECT vec_id, cluster, v FROM (
        SELECT e.vec_id, c.cluster, CAST(e.embedding AS DOUBLE[]) AS v,
               row_number() OVER (PARTITION BY e.vec_id
                 ORDER BY list_distance(CAST(e.embedding AS DOUBLE[]),
                                        c.cvec),
                          c.cluster) AS rn
        FROM embeddings e CROSS JOIN c
        WHERE e.embedding IS NOT NULL
      ) WHERE rn = 1
    ), dropped AS (
      SELECT DISTINCT b.vec_id AS idb
      FROM asg a JOIN asg b ON a.cluster = b.cluster
                           AND a.vec_id < b.vec_id
      WHERE list_cosine_similarity(a.v, b.v) >= 0.3
    )
    SELECT vec_id, cluster,
           vec_id NOT IN (SELECT idb FROM dropped) AS is_kept
    FROM asg
    """)
def semantic_dedup_q(spark, sf_dir):
    """SemDeDup: cluster embeddings (8 deterministic cells), drop any
    row whose cell holds a lower-id row at cosine ≥ 0.3 (the synthetic
    embeddings are near-orthogonal, so 0.3 binds — 166 of 500 drop at
    sf0.01; a vacuous threshold proves nothing). Pairwise cost is
    Σ cᵢ² via the cluster equi-join, never N² — the oracle verifies
    cluster labels, membership, and survivor verdicts exactly."""
    from mmlspark_spark.llm import semantic_dedup

    emb = _t(spark, sf_dir, "embeddings")
    return semantic_dedup(emb, idCol="vec_id", vecCol="embedding",
                          k=8, threshold=0.3, maxIter=0)


def _minhash_cte(k: int = 32, b: int = 16, n: int = 5,
                    threshold: float = 0.2, cap: int = 1000) -> str:
    """DuckDB replay of the FULL MinHashLSHDeduplicator pipeline at its
    production configuration — tokenize (Java ``\\s`` spelled out, incl.
    ``\\x0B``/``\\f``), distinct 5-gram shingles, per-shingle
    ``xxhash64`` over UTF-8 bytes, k slot hashes (signed min, exactly
    Spark's ``min`` over LongType), banded bucket join with the
    ``maxBucketSize`` cap, upper-triangle pair expansion and the
    signature-match estimate. The xxhash64 values are recomputed
    bit-exact by the plans/duckdb_xxh expression generators, so this is
    the SAME hash family the 100 TB path uses, not a weakened oracle
    lane. Seeds for ``xxhash64(lit(i), x)`` fold to constants
    (``hashLong(x, hashInt(i, 42))``) in Python."""
    from mmlspark_spark.plans.duckdb_xxh import (hash_int, to_s64, to_u64,
                                                 xxh64_long, xxh64_str)

    r = k // b
    assert r == 2, "band expr below unrolls exactly r=2 slots"
    slot_seeds = "[" + ", ".join(
        f"{hash_int(i, 42)}::HUGEINT" for i in range(k)) + "]"
    band_seeds = "[" + ", ".join(
        f"{hash_int(j, 42)}::HUGEINT" for j in range(b)) + "]"
    sh_hash = xxh64_str("sh", u="za")  # unsigned HUGEINT
    slot_hash = to_s64(xxh64_long("shu", f"({slot_seeds}[si+1])", u="zb"))
    band_hash = xxh64_long(
        to_u64("sig[2*j+2]"),
        xxh64_long(to_u64("sig[2*j+1]"), f"({band_seeds}[j+1])", u="zc"),
        u="zd")
    est = f"(len(list_filter(range(1, {k}+1), i -> sa[i] = sb[i])))"
    # the chain ends in CTE ``mh(doc_a, doc_b, est_jaccard)`` so
    # dedup_recall can reuse the WHOLE replay as a fragment (the
    # _bm25_cte/_ivf_cte pattern); _minhash_oracle itself is just
    # SELECT * from it
    return f"""t AS (
      SELECT doc_id, list_filter(
               string_split_regex(text, '[ \\t\\n\\x0B\\f\\r]+'),
               x -> x <> '') AS toks
      FROM documents WHERE text IS NOT NULL
    ), g AS (
      SELECT DISTINCT doc_id,
        unnest(list_transform(range(1, greatest(len(toks)-{n - 1}, 0)+1),
          i -> array_to_string(toks[i:i+{n - 1}], ' '))) AS sh
      FROM t
    ), shh AS (
      SELECT DISTINCT doc_id, {sh_hash} AS shu FROM g
    ), slotrows AS (
      SELECT doc_id, si, {slot_hash} AS hv
      FROM (SELECT doc_id, shu, unnest(range(0, {k})) AS si FROM shh)
    ), sig AS (
      SELECT doc_id, list(m ORDER BY si) AS sig
      FROM (SELECT doc_id, si, min(hv) AS m
            FROM slotrows GROUP BY doc_id, si)
      GROUP BY doc_id
    ), band AS (
      SELECT doc_id, j, {band_hash} AS bh
      FROM (SELECT doc_id, sig, unnest(range(0, {b})) AS j FROM sig)
    ), bucket AS (
      SELECT j, bh, list_sort(list(DISTINCT doc_id)) AS ids
      FROM band GROUP BY j, bh
    ), pairs AS (
      SELECT DISTINCT p.a AS doc_a, p.b AS doc_b
      FROM (SELECT unnest(flatten(list_transform(
              range(1, len(ids)), i -> list_transform(
                ids[i+1:], y -> {{'a': ids[i], 'b': y}})))) AS p
            FROM bucket
            WHERE len(ids) > 1 AND len(ids) <= {cap})
    ), mh AS (
      SELECT doc_a, doc_b,
             CAST({est} AS DOUBLE) / {k} AS est_jaccard
      FROM pairs
      JOIN (SELECT doc_id AS doc_a, sig AS sa FROM sig) USING (doc_a)
      JOIN (SELECT doc_id AS doc_b, sig AS sb FROM sig) USING (doc_b)
      WHERE CAST({est} AS DOUBLE) / {k} >= {threshold}
    )"""


def _minhash_oracle() -> str:
    return f"""
    WITH {_minhash_cte()}
    SELECT doc_a, doc_b, est_jaccard FROM mh
    """


@register("minhash_dedup", oracle=_minhash_oracle(), headline=True)
def minhash_dedup(spark, sf_dir):
    """MinHash+LSH near-dup candidates, HASH-EXACT against a DuckDB
    oracle that replays the production xxhash64 family bit-for-bit
    (plans/duckdb_xxh): shingle string hash → 32 slot mins → 16 band
    hashes → capped buckets → pair estimates. Rows-only until round 8;
    recall vs exact Jaccard additionally asserted in tests/test_llm.py."""
    from mmlspark_spark.llm import MinHashLSHDeduplicator

    docs = _t(spark, sf_dir, "documents")
    return MinHashLSHDeduplicator(
        idCol="doc_id", textCol="text", shingleSize=5,
        numHashes=32, bands=16, threshold=0.2,
    ).transform(docs)


def _minhash_match_oracle(k: int = 32, split: int = 400,
                          threshold: float = 0.2,
                          cap: int = 1000,
                          dead: str | None = None) -> str:
    """Replays match_against_index over the shared _minhash_cte
    fragment: buckets are built from INDEX docs only (doc_id <
    split), the batch's band rows equi-join them, the maxBucketSize
    cap counts STORED members only (exactly the match-time
    semantics, which differ from transform's union-bucket cap), and
    signatures attach to the surviving (batch, indexed) pairs. The
    fragment's own bucket/pairs/mh CTEs go unreferenced and are
    pruned by DuckDB's optimizer. ``dead`` (a doc_id predicate)
    replays a pending TOMBSTONE set: masked ids leave the stored
    bucket members BEFORE the cap count — matching equals a fresh
    index over the survivors, the read-time-delete contract."""
    est = f"(len(list_filter(range(1, {k}+1), i -> sa[i] = sb[i])))"
    stored = f"doc_id < {split}" + (f" AND NOT ({dead})" if dead
                                    else "")
    # the unnest lives in its OWN CTE (mexp): DuckDB 1.0's binder
    # internal-errors on unnest inside a filtered derived table
    return f"""
    WITH {_minhash_cte(k=k, threshold=threshold, cap=cap)}, bucketi AS (
      SELECT j, bh, list_sort(list(DISTINCT doc_id)) AS ids
      FROM band WHERE {stored} GROUP BY j, bh
    ), mb AS (
      SELECT nb.doc_id AS doc_a, b2.ids AS bids
      FROM band nb JOIN bucketi b2 USING (j, bh)
      WHERE nb.doc_id >= {split} AND len(b2.ids) <= {cap}
    ), mexp AS (
      SELECT doc_a, unnest(bids) AS doc_b FROM mb
    ), mcand AS (
      SELECT DISTINCT doc_a, doc_b FROM mexp WHERE doc_a <> doc_b
    )
    SELECT doc_a, doc_b,
           CAST({est} AS DOUBLE) / {k} AS est_jaccard
    FROM mcand
    JOIN (SELECT doc_id AS doc_a, sig AS sa FROM sig) USING (doc_a)
    JOIN (SELECT doc_id AS doc_b, sig AS sb FROM sig) USING (doc_b)
    WHERE CAST({est} AS DOUBLE) / {k} >= {threshold}
    """


@register("minhash_match_indexed", oracle=_minhash_match_oracle())
def minhash_match_indexed(spark, sf_dir):
    """Incremental NEAR-dup against a PERSISTED MinHash index — the
    daily-ingest shape at 100 TB: the stored corpus (docs < 400) was
    shingled ONCE into signatures + banded bucket keys
    (MinHashLSHDeduplicator.save_index); the incoming batch (docs >=
    400) shingles only itself and equi-joins its bucket keys against
    the artifact, returning (batch doc, indexed doc, est_jaccard)
    pairs. Hot stored buckets are capped BEFORE the join fan-out by
    counting only the touched buckets. The oracle replays the exact
    match-time semantics (index-side buckets, stored-member cap)
    over the shared bit-exact xxhash64 fragment."""
    import os

    from mmlspark_spark.llm import MinHashLSHDeduplicator

    docs = _t(spark, sf_dir, "documents")
    dd = MinHashLSHDeduplicator(
        idCol="doc_id", textCol="text", shingleSize=5,
        numHashes=32, bands=16, threshold=0.2)
    path = os.path.join(
        "/tmp/mmlspark_spark_idx",
        f"minhash_{os.path.basename(sf_dir.rstrip('/'))}")
    dd.save_index(docs.filter(F.col("doc_id") < 400), path)
    return dd.match_against_index(dd.load_index(spark, path),
                                  docs.filter(F.col("doc_id") >= 400))


@register("minhash_match_appended", oracle=_minhash_match_oracle())
def minhash_match_appended(spark, sf_dir):
    """The APPEND half of the near-dup stored-index lifecycle under
    the driver's hash gate (round 14): the artifact is built in two
    installments — save_index over docs < 250, then append_to_index
    over 250 ≤ docs < 400 (appended docs shingle ALONE; their
    signature and bucket rows land as new files, no re-shingle of the
    existing store) — and the incoming batch (docs ≥ 400) screens
    against the GROWN index. The oracle is the same fresh-over-union
    replay the single-save lane uses: append == fresh build over the
    union is the family's documented contract, previously pinned only
    in pytest, now hash-checked through the driver."""
    import os

    from mmlspark_spark.llm import MinHashLSHDeduplicator

    docs = _t(spark, sf_dir, "documents")
    dd = MinHashLSHDeduplicator(
        idCol="doc_id", textCol="text", shingleSize=5,
        numHashes=32, bands=16, threshold=0.2)
    path = os.path.join(
        "/tmp/mmlspark_spark_idx",
        f"minhash_app_{os.path.basename(sf_dir.rstrip('/'))}")
    dd.save_index(docs.filter(F.col("doc_id") < 250), path)
    dd.append_to_index(
        docs.filter((F.col("doc_id") >= 250) & (F.col("doc_id") < 400)),
        path)
    return dd.match_against_index(dd.load_index(spark, path),
                                  docs.filter(F.col("doc_id") >= 400))


def _minhash_screen_oracle(k: int = 32, day1: int = 250,
                           day2: int = 400, threshold: float = 0.2,
                           cap: int = 1000) -> str:
    """Replays the neardup_screen_foreach_batch TOPOLOGY in SQL: day-2
    rows are screened against the day-1 index (index-side buckets,
    stored-member cap, signature threshold), the UNFLAGGED day-2 rows
    join the stored set (the survivors append), and the day-3 batch
    matches against that GROWN set with the same semantics — the full
    screen-and-ingest pipeline over the shared bit-exact xxhash64
    fragment."""
    est = (f"(len(list_filter(range(1, {k}+1), "
           f"i -> sa[i] = sb[i])))")
    return f"""
    WITH {_minhash_cte(k=k, threshold=threshold, cap=cap)}, b1 AS (
      SELECT j, bh, list_sort(list(DISTINCT doc_id)) AS ids
      FROM band WHERE doc_id < {day1} GROUP BY j, bh
    ), m1 AS (
      SELECT nb.doc_id AS doc_a, b1.ids AS bids
      FROM band nb JOIN b1 USING (j, bh)
      WHERE nb.doc_id >= {day1} AND nb.doc_id < {day2}
        AND len(b1.ids) <= {cap}
    ), e1 AS (
      SELECT doc_a, unnest(bids) AS doc_b FROM m1
    ), c1 AS (
      SELECT DISTINCT doc_a, doc_b FROM e1 WHERE doc_a <> doc_b
    ), flagged AS (
      SELECT DISTINCT doc_a FROM c1
      JOIN (SELECT doc_id AS doc_a, sig AS sa FROM sig) USING (doc_a)
      JOIN (SELECT doc_id AS doc_b, sig AS sb FROM sig) USING (doc_b)
      WHERE CAST({est} AS DOUBLE) / {k} >= {threshold}
    ), stored AS (
      SELECT doc_id FROM sig WHERE doc_id < {day1}
      UNION ALL
      SELECT doc_id FROM sig
      WHERE doc_id >= {day1} AND doc_id < {day2}
        AND doc_id NOT IN (SELECT doc_a FROM flagged)
    ), b2 AS (
      SELECT j, bh, list_sort(list(DISTINCT band.doc_id)) AS ids
      FROM band JOIN stored ON band.doc_id = stored.doc_id
      GROUP BY j, bh
    ), m2 AS (
      SELECT nb.doc_id AS doc_a, b2.ids AS bids
      FROM band nb JOIN b2 USING (j, bh)
      WHERE nb.doc_id >= {day2} AND len(b2.ids) <= {cap}
    ), e2 AS (
      SELECT doc_a, unnest(bids) AS doc_b FROM m2
    ), c2 AS (
      SELECT DISTINCT doc_a, doc_b FROM e2 WHERE doc_a <> doc_b
    )
    SELECT doc_a, doc_b,
           CAST({est} AS DOUBLE) / {k} AS est_jaccard
    FROM c2
    JOIN (SELECT doc_id AS doc_a, sig AS sa FROM sig) USING (doc_a)
    JOIN (SELECT doc_id AS doc_b, sig AS sb FROM sig) USING (doc_b)
    WHERE CAST({est} AS DOUBLE) / {k} >= {threshold}
    """


@register("minhash_screen_incremental",
          oracle=_minhash_screen_oracle())
def minhash_screen_incremental(spark, sf_dir):
    """The NEAR-DUP screen-and-ingest streaming topology under the
    driver's hash gate (round 15 — the minhash sibling of
    exact_match_incremental, closing the last pytest-only
    foreachBatch wrapper): two deterministic micro-batches flow
    through ``neardup_screen_foreach_batch`` — day 1 (docs < 250)
    bootstraps the MinHash index, day 2 (250 ≤ docs < 400) is
    screened against it and ONLY its unflagged survivors append
    (flagged rows quarantine; the pairs frame is localCheckpoint'd
    before the append mutates the store it derives from) — then a
    third batch (docs ≥ 400) matches against the GROWN artifact. The
    oracle replays the whole topology in SQL over the shared
    bit-exact xxhash64 fragment: day-2 flags from day-1 buckets
    (stored-member cap + signature threshold), survivors = unflagged
    day-2 ids, day-3 candidates from the day1∪survivors buckets."""
    import os

    from mmlspark_spark.llm import MinHashLSHDeduplicator
    from mmlspark_spark.llm.index_common import _hadoop_fs
    from mmlspark_spark.streaming import neardup_screen_foreach_batch

    docs = _t(spark, sf_dir, "documents")
    dd = MinHashLSHDeduplicator(
        idCol="doc_id", textCol="text", shingleSize=5,
        numHashes=32, bands=16, threshold=0.2)
    path = os.path.join(
        "/tmp/mmlspark_spark_idx",
        f"minhash_scr_{os.path.basename(sf_dir.rstrip('/'))}")
    fs, P = _hadoop_fs(spark, path)
    fs.delete(P(path), True)
    screen = neardup_screen_foreach_batch(dd, path, "doc_id")
    screen(docs.filter(F.col("doc_id") < 250), 0)
    screen(docs.filter(
        (F.col("doc_id") >= 250) & (F.col("doc_id") < 400)), 1)
    return dd.match_against_index(dd.load_index(spark, path),
                                  docs.filter(F.col("doc_id") >= 400))


@register("minhash_match_tombstoned",
          oracle=_minhash_match_oracle(dead="doc_id % 5 = 0"))
def minhash_match_tombstoned(spark, sf_dir):
    """The DELETE half of the stored-index lifecycle under the
    driver's hash gate (round 12): the stored corpus (docs < 400)
    tombstones every 5th doc (a takedown batch — metadata-only, no
    store rewrite), then the incoming batch screens against the
    index. Tombstoned docs are masked from the bucket store BEFORE
    the hot-bucket cap count, so matching equals a fresh index over
    the survivors — which is exactly what the oracle replays (the
    shared xxhash64 fragment with the dead ids excluded from the
    stored side). save_index clears stale tombstones on overwrite,
    so the query is hermetic across repeated driver runs."""
    import os

    from mmlspark_spark.llm import MinHashLSHDeduplicator

    docs = _t(spark, sf_dir, "documents")
    dd = MinHashLSHDeduplicator(
        idCol="doc_id", textCol="text", shingleSize=5,
        numHashes=32, bands=16, threshold=0.2)
    path = os.path.join(
        "/tmp/mmlspark_spark_idx",
        f"minhash_del_{os.path.basename(sf_dir.rstrip('/'))}")
    stored = docs.filter(F.col("doc_id") < 400)
    dd.save_index(stored, path)
    dd.delete_from_index(
        stored.filter(F.col("doc_id") % 5 == 0).select("doc_id"),
        path)
    return dd.match_against_index(dd.load_index(spark, path),
                                  docs.filter(F.col("doc_id") >= 400))


def _dedup_recall_oracle(n: int = 5, threshold: float = 0.2) -> str:
    """Composes the two proven replays — the FULL MinHash pipeline
    (_minhash_cte, bit-exact xxhash64) and the exact word-5-gram
    Jaccard truth — and counts candidate coverage. Only membership
    reaches the output (true_pairs, hit_pairs, recall), so this pins
    that both pipelines produce identical PAIR SETS on both engines:
    the property every dedup recall claim rests on. CTE names in the
    exact chain are prefixed ex- (the minhash fragment owns t/g/sig/
    band/bucket/pairs)."""
    return f"""
    WITH {_minhash_cte()}, extoks AS (
      SELECT doc_id,
             list_filter(string_split_regex(text, '\\s+'),
                         x -> x <> '') AS w
      FROM documents
    ), exidx AS (
      SELECT doc_id, w, unnest(range(1, greatest(len(w)-{n - 2}, 1)))
               AS i
      FROM extoks
    ), exsh AS (
      SELECT DISTINCT doc_id,
             array_to_string(w[i:i+{n - 1}], ' ') AS shingle
      FROM exidx
    ), excnt AS (
      SELECT doc_id, count(*) AS nn FROM exsh GROUP BY 1
    ), expairs AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
      FROM exsh a JOIN exsh b
        ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ), ex AS (
      SELECT doc_a, doc_b
      FROM expairs
      JOIN excnt ca ON ca.doc_id = doc_a
      JOIN excnt cb ON cb.doc_id = doc_b
      WHERE CAST(inter AS DOUBLE) / (ca.nn + cb.nn - inter)
            >= {threshold}
    ), hit AS (
      SELECT ex.doc_a FROM ex
      JOIN mh ON mh.doc_a = ex.doc_a AND mh.doc_b = ex.doc_b
    )
    SELECT CAST((SELECT count(*) FROM ex) AS BIGINT) AS true_pairs,
           CAST((SELECT count(*) FROM hit) AS BIGINT) AS hit_pairs,
           round(CAST((SELECT count(*) FROM hit) AS DOUBLE)
                 / greatest((SELECT count(*) FROM ex), 1), 6) AS recall
    """


@register("dedup_recall", oracle=_dedup_recall_oracle())
def dedup_recall(spark, sf_dir):
    """Candidate recall of MinHash-LSH against exact 5-gram Jaccard
    truth (threshold 0.2) — the evaluation loop every dedup deployment
    runs (tune bands/hashes until candidate recall clears the bar),
    as one distributed job: both pipelines run, the overlap is a
    semi-join, and the oracle replays BOTH pair sets (bit-exact
    xxhash64 MinHash + exact-Jaccard SQL), so the recall number is
    cross-engine-proven, not just locally asserted (the pytest recall
    check in tests/test_llm.py becomes a driver-checked artifact)."""
    from mmlspark_spark.core.cache import propagate_intermediates
    from mmlspark_spark.llm import MinHashLSHDeduplicator, ngram_jaccard_pairs

    docs = _t(spark, sf_dir, "documents")
    mh = MinHashLSHDeduplicator(
        idCol="doc_id", textCol="text", shingleSize=5,
        numHashes=32, bands=16, threshold=0.2,
    ).transform(docs).select("doc_a", "doc_b")
    ex = (ngram_jaccard_pairs(docs, "doc_id", "text", n=5)
          .filter(F.col("jaccard") >= 0.2).select("doc_a", "doc_b"))
    hits = (ex.join(mh, ["doc_a", "doc_b"], "left_semi")
            .agg(F.count("*").alias("hit_pairs")))
    out = (ex.agg(F.count("*").alias("true_pairs"))
           .crossJoin(hits)
           .select(F.col("true_pairs").cast("bigint").alias("true_pairs"),
                   F.col("hit_pairs").cast("bigint").alias("hit_pairs"),
                   F.round(F.col("hit_pairs").cast("double")
                           / F.greatest(F.col("true_pairs"), F.lit(1)),
                           6).alias("recall")))
    return propagate_intermediates(ex, propagate_intermediates(mh, out))


def _hamming_band_pairs_sql(bands: int, maxHamming: int, cap: int) -> str:
    """Shared SQL tail replaying ``dedup._hamming_band_pairs`` —
    expects a prior CTE ``fp(doc_id, sh BIGINT)``. Used by BOTH the
    simhash_dedup and image_dhash_dedup oracles; a private copy in
    each would let the band/cap/tie-break replay drift (the fold_sum
    lesson). Equal-width chunks only (64 % bands == 0)."""
    from mmlspark_spark.plans.duckdb_xxh import to_u64

    assert 64 % bands == 0, "oracle assumes equal-width chunks"
    w = 64 // bands
    return f"""band AS (
      SELECT doc_id, sh, j,
             (({to_u64("sh")})::UBIGINT >> ({w}*j)) & {(1 << w) - 1}
               AS chunk
      FROM (SELECT doc_id, sh, unnest(range(0, {bands})) AS j FROM fp)
    ), bucket AS (
      SELECT j, chunk,
             list({{'i': doc_id, 'h': sh}} ORDER BY doc_id) AS ms
      FROM band GROUP BY j, chunk
    ), pairs AS (
      SELECT DISTINCT p.a AS doc_a, p.b AS doc_b, p.x AS x
      FROM (SELECT unnest(flatten(list_transform(
              range(1, len(ms)), i -> list_transform(
                ms[i+1:], y -> {{'a': ms[i].i, 'b': y.i,
                                 'x': xor(ms[i].h, y.h)}})))) AS p
            FROM bucket
            WHERE len(ms) > 1 AND len(ms) <= {cap})
    )
    SELECT doc_a, doc_b, CAST(bit_count(x) AS INTEGER) AS hamming
    FROM pairs WHERE bit_count(x) <= {maxHamming}
    """


def _simhash_fp_cte() -> str:
    """The SimHash fingerprint WITH-fragment ending in CTE
    ``fp(doc_id, sh)`` — Java-\\s tokens (duplicates COUNT — the vote
    aggregate is over the raw token list), per-token xxhash64 (hashed
    once per distinct word, joined back), 64 sign-votes,
    two's-complement assembly (bit 63 negative). Empty-token
    documents fingerprint to 0 and participate (only NULL text is
    excluded), exactly like the Spark path. Shared by simhash_dedup
    and simhash_match_indexed so the fingerprint replay cannot
    drift."""
    from mmlspark_spark.plans.duckdb_xxh import xxh64_str

    return f"""t AS (
      SELECT doc_id, list_filter(
               string_split_regex(text, '[ \\t\\n\\x0B\\f\\r]+'),
               x -> x <> '') AS toks
      FROM documents WHERE text IS NOT NULL
    ), tok AS (
      SELECT doc_id, unnest(toks) AS w FROM t
    ), wh AS (
      SELECT w, ({xxh64_str("w", u="ze")})::UBIGINT AS hu
      FROM (SELECT DISTINCT w FROM tok)
    ), votes AS (
      SELECT doc_id, j,
             sum(CASE WHEN ((hu >> j) & 1) = 1 THEN 1 ELSE -1 END) AS v
      FROM (SELECT doc_id, hu, unnest(range(0, 64)) AS j
            FROM tok JOIN wh USING (w))
      GROUP BY doc_id, j
    ), fp AS (
      SELECT doc_id, CAST(sum(CASE WHEN v <= 0 THEN 0::HUGEINT
               WHEN j = 63 THEN -9223372036854775808::HUGEINT
               ELSE (1::HUGEINT << j) END) AS BIGINT) AS sh
      FROM votes GROUP BY doc_id
      UNION ALL
      SELECT doc_id, 0::BIGINT FROM t WHERE len(toks) = 0
    )"""


def _simhash_oracle(bands: int = 4, maxHamming: int = 10,
                    cap: int = 1000) -> str:
    """DuckDB replay of the FULL SimHashDeduplicator pipeline: the
    shared fingerprint fragment + 16-bit band chunks, capped buckets,
    upper-triangle pairs and the Hamming filter."""
    return f"""
    WITH {_simhash_fp_cte()}, {_hamming_band_pairs_sql(bands, maxHamming, cap)}"""


def _simhash_match_oracle(bands: int = 4, maxHamming: int = 10,
                          split: int = 400, cap: int = 1000,
                          dead: str | None = None) -> str:
    """Replays SimHashDeduplicator.match_against_index: buckets from
    INDEX docs only (doc_id < split), batch band rows equi-join them,
    stored-member cap, Hamming filter on the xor — match-time
    semantics over the shared fingerprint fragment. The unnest lives
    in its own CTE (the DuckDB 1.0 binder lesson). ``dead`` (a doc_id
    predicate) replays a pending TOMBSTONE set: masked ids leave the
    stored bucket members BEFORE the cap count — matching equals a
    fresh index over the survivors (the read-time-delete contract,
    same as _minhash_match_oracle's)."""
    from mmlspark_spark.plans.duckdb_xxh import to_u64

    assert 64 % bands == 0
    w = 64 // bands
    stored = f"doc_id < {split}" + (f" AND NOT ({dead})" if dead
                                    else "")
    return f"""
    WITH {_simhash_fp_cte()}, band AS (
      SELECT doc_id, sh, j,
             (({to_u64("sh")})::UBIGINT >> ({w}*j)) & {(1 << w) - 1}
               AS chunk
      FROM (SELECT doc_id, sh, unnest(range(0, {bands})) AS j FROM fp)
    ), bucketi AS (
      SELECT j, chunk,
             list({{'i': doc_id, 'h': sh}} ORDER BY doc_id) AS ms
      FROM band WHERE {stored} GROUP BY j, chunk
    ), mb AS (
      SELECT nb.doc_id AS doc_a, nb.sh AS sha, b2.ms AS bms
      FROM band nb JOIN bucketi b2 USING (j, chunk)
      WHERE nb.doc_id >= {split} AND len(b2.ms) <= {cap}
    ), mexp AS (
      SELECT doc_a, sha, unnest(bms) AS m FROM mb
    )
    SELECT DISTINCT doc_a, m.i AS doc_b,
           CAST(bit_count(xor(sha, m.h)) AS INTEGER) AS hamming
    FROM mexp
    WHERE doc_a <> m.i AND bit_count(xor(sha, m.h)) <= {maxHamming}
    """


@register("simhash_match_indexed", oracle=_simhash_match_oracle())
def simhash_match_indexed(spark, sf_dir):
    """Incremental SimHash near-dup against a PERSISTED fingerprint
    index — the cheapest stored index in the engine (16 bytes/doc;
    band chunks are bit-slices derived free at match time): the
    incoming batch (docs >= 400) fingerprints map-side and its chunk
    keys equi-join the stored corpus's (docs < 400), hot stored
    buckets capped before the fan-out, Hamming filter on the xor.
    Oracle replays the match-time semantics over the shared
    fingerprint fragment."""
    import os

    from mmlspark_spark.llm import SimHashDeduplicator

    docs = _t(spark, sf_dir, "documents")
    dd = SimHashDeduplicator(idCol="doc_id", textCol="text",
                             bands=4, maxHammingDistance=10)
    path = os.path.join(
        "/tmp/mmlspark_spark_idx",
        f"simhash_{os.path.basename(sf_dir.rstrip('/'))}")
    dd.save_index(docs.filter(F.col("doc_id") < 400), path)
    return dd.match_against_index(dd.load_index(spark, path),
                                  docs.filter(F.col("doc_id") >= 400))


@register("simhash_match_appended", oracle=_simhash_match_oracle())
def simhash_match_appended(spark, sf_dir):
    """The APPEND half of the FingerprintIndexMixin lifecycle under
    the driver's hash gate (round 15 — the minhash_match_appended
    pattern on the fingerprint family, covering the shared mixin for
    all four 64-bit-fingerprint dedupers: SimHash text, image dHash,
    audio Haitsma-Kalker, video dHash): the artifact is built in two
    installments — save_index over docs < 250, then append_to_index
    over 250 ≤ docs < 400 (appended docs fingerprint ALONE,
    map-side; their rows land as new parquet files, no re-read of
    the existing store) — and the incoming batch (docs ≥ 400)
    screens against the GROWN index. Oracle is the same
    fresh-over-union replay the single-save lane uses: append ==
    fresh build over the union is the mixin's contract, previously
    pinned only in pytest."""
    import os

    from mmlspark_spark.llm import SimHashDeduplicator

    docs = _t(spark, sf_dir, "documents")
    dd = SimHashDeduplicator(idCol="doc_id", textCol="text",
                             bands=4, maxHammingDistance=10)
    path = os.path.join(
        "/tmp/mmlspark_spark_idx",
        f"simhash_app_{os.path.basename(sf_dir.rstrip('/'))}")
    dd.save_index(docs.filter(F.col("doc_id") < 250), path)
    dd.append_to_index(
        docs.filter((F.col("doc_id") >= 250) & (F.col("doc_id") < 400)),
        path)
    return dd.match_against_index(dd.load_index(spark, path),
                                  docs.filter(F.col("doc_id") >= 400))


@register("simhash_match_tombstoned",
          oracle=_simhash_match_oracle(dead="doc_id % 5 = 0"))
def simhash_match_tombstoned(spark, sf_dir):
    """The DELETE half of the SimHash stored-index lifecycle under
    the driver's hash gate (round 13 — the minhash_match_tombstoned
    pattern on the fingerprint family): the stored corpus (docs <
    400) tombstones every 5th doc (metadata-only takedown), then the
    incoming batch screens against the index. Tombstoned
    fingerprints are masked BEFORE banding, so they neither surface
    as doc_b nor count toward the hot-bucket cap — matching equals a
    fresh index over the survivors, exactly what the oracle replays
    (dead ids excluded from the stored side of the shared
    fingerprint fragment). save_index clears stale tombstones on
    overwrite, so repeated driver runs are hermetic."""
    import os

    from mmlspark_spark.llm import SimHashDeduplicator

    docs = _t(spark, sf_dir, "documents")
    dd = SimHashDeduplicator(idCol="doc_id", textCol="text",
                             bands=4, maxHammingDistance=10)
    path = os.path.join(
        "/tmp/mmlspark_spark_idx",
        f"simhash_del_{os.path.basename(sf_dir.rstrip('/'))}")
    stored = docs.filter(F.col("doc_id") < 400)
    dd.save_index(stored, path)
    dd.delete_from_index(
        stored.filter(F.col("doc_id") % 5 == 0).select("doc_id"),
        path)
    return dd.match_against_index(dd.load_index(spark, path),
                                  docs.filter(F.col("doc_id") >= 400))


def _image_dhash_oracle(bands: int = 4, maxHamming: int = 6,
                        cap: int = 1000) -> str:
    """Replays image_dhash_dedup end-to-end: the deterministic pixel
    synthesis (chained xxhash64 of (group, pixel-index) — recomputed
    bit-exact), the odd-variant brightness shift with its 255 clip,
    the 64 dHash comparisons, two's-complement assembly, and the
    shared banded-Hamming tail."""
    from mmlspark_spark.plans.duckdb_xxh import to_u64, xxh64_long

    inner = xxh64_long(to_u64("grp"), "42::HUGEINT", u="qa")
    pix = f"(({xxh64_long(to_u64('r*9+c'), 'gh', u='qb')}) % 256)"
    return f"""
    WITH d AS (
      SELECT doc_id, doc_id % 10 AS grp, doc_id // 10 AS v
      FROM documents
    ), gh AS (
      SELECT doc_id, v, {inner} AS gh FROM d
    ), px AS (
      SELECT doc_id, list_transform(range(0, 8), r ->
               list_transform(range(0, 9), c ->
                 {pix} + CASE WHEN (r*9+c + v) % 9 = 0
                              THEN 17 * v ELSE 0 END)) AS g
      FROM gh
    ), fp AS (
      SELECT doc_id, CAST(sum(
               CASE WHEN g[j//8 + 1][j%8 + 1] <= g[j//8 + 1][j%8 + 2]
                      THEN 0::HUGEINT
                    WHEN j = 63 THEN -9223372036854775808::HUGEINT
                    ELSE (1::HUGEINT << j) END) AS BIGINT) AS sh
      FROM (SELECT doc_id, g, unnest(range(0, 64)) AS j FROM px)
      GROUP BY doc_id
    ), {_hamming_band_pairs_sql(bands, maxHamming, cap)}"""


@register("image_dhash_dedup", oracle=_image_dhash_oracle())
def image_dhash_dedup(spark, sf_dir):
    """Perceptual-hash image dedup (ImageDHashDeduplicator, pure-
    Catalyst grid lane): synthetic 8×9 grayscale grids — pixel =
    pmod(xxhash64(doc_id%10, pixel_index), 256), so every group of 10
    residues shares one base image, and variant v = doc_id div 10
    perturbs ~8 stagger-positioned pixels by 17·v — near variants stay
    within the Hamming ≤ 6 threshold, far variants collide in a band
    (some chunk is untouched) but FAIL the threshold, so both the
    candidate and the filter stage are exercised non-vacuously.
    Fingerprint → shared banded buckets → capped pairs → Hamming
    filter, all replayed hash-exact by the oracle. Map-side except
    the bucket groupBy."""
    from mmlspark_spark.llm import ImageDHashDeduplicator

    docs = _t(spark, sf_dir, "documents").select("doc_id")
    grp = (F.col("doc_id") % 10).cast("long")
    v = F.expr("doc_id div 10")

    def pix(r, c):
        p = F.pmod(F.xxhash64(grp, F.lit(r * 9 + c).cast("long")),
                   F.lit(256)).cast("int")
        return p + F.when((F.lit(r * 9 + c) + v) % 9 == 0,
                          (17 * v).cast("int")).otherwise(F.lit(0))

    grid = F.array(*[F.array(*[pix(r, c) for c in range(9)])
                     for r in range(8)])
    planted = docs.select("doc_id", grid.alias("gray"))
    return ImageDHashDeduplicator(
        idCol="doc_id", imageCol="gray", bands=4,
        maxHammingDistance=6).transform(planted)


def _audio_fp_oracle(bands: int = 4, maxHamming: int = 6,
                     cap: int = 1000) -> str:
    """Replays audio_fingerprint_dedup end-to-end: the deterministic
    energy-grid synthesis (chained xxhash64 of (group, cell-index),
    power-of-two base modulus so signed pmod and unsigned mod agree),
    the variant gain perturbation, the 64 Haitsma-Kalker second-order
    difference signs, two's-complement assembly, and the shared
    banded-Hamming tail."""
    from mmlspark_spark.plans.duckdb_xxh import to_u64, xxh64_long

    inner = xxh64_long(to_u64("grp"), "42::HUGEINT", u="aa")
    cell = f"(({xxh64_long(to_u64('t*9+f'), 'gh', u='ab')}) % 1024)"
    d = ("(g[j//8 + 2][j%8 + 1] - g[j//8 + 2][j%8 + 2])"
         " - (g[j//8 + 1][j%8 + 1] - g[j//8 + 1][j%8 + 2])")
    return f"""
    WITH d AS (
      SELECT doc_id, doc_id % 10 AS grp, doc_id // 10 AS v
      FROM documents
    ), gh AS (
      SELECT doc_id, v, {inner} AS gh FROM d
    ), px AS (
      SELECT doc_id, list_transform(range(0, 9), t ->
               list_transform(range(0, 9), f ->
                 CAST({cell} AS DOUBLE)
                 + CASE WHEN (t*9+f + 5*v) % 17 = 0
                        THEN CAST(61 * v AS DOUBLE)
                        ELSE 0.0 END)) AS g
      FROM gh
    ), fp AS (
      SELECT doc_id, CAST(sum(
               CASE WHEN {d} <= 0 THEN 0::HUGEINT
                    WHEN j = 63 THEN -9223372036854775808::HUGEINT
                    ELSE (1::HUGEINT << j) END) AS BIGINT) AS sh
      FROM (SELECT doc_id, g, unnest(range(0, 64)) AS j FROM px)
      GROUP BY doc_id
    ), {_hamming_band_pairs_sql(bands, maxHamming, cap)}"""


@register("audio_fingerprint_dedup", oracle=_audio_fp_oracle())
def audio_fingerprint_dedup(spark, sf_dir):
    """Perceptual audio dedup (AudioFingerprintDeduplicator, pure-
    Catalyst grid lane): synthetic 9×9 time×band energy grids —
    cell = xxhash64(doc_id%10, cell_index) & 1023 as a double, so
    every group of 10 residues shares one base recording, and
    variant v = doc_id div 10 adds a 61·v gain bump at ~5 stagger-
    positioned cells — near variants stay within Hamming ≤ 6, far
    variants band-collide but FAIL the threshold (1.4k detected vs
    1.1k collide-but-filtered at sf0.01), so both the candidate and
    filter stages are exercised non-vacuously. Haitsma-Kalker
    second-order-difference fingerprint → shared banded buckets →
    capped pairs → Hamming filter, all replayed hash-exact. Map-side
    except the bucket groupBy."""
    from mmlspark_spark.llm import AudioFingerprintDeduplicator

    docs = _t(spark, sf_dir, "documents").select("doc_id")
    grp = (F.col("doc_id") % 10).cast("long")
    v = F.expr("doc_id div 10")

    def cell(t, f):
        idx = t * 9 + f
        e = (F.xxhash64(grp, F.lit(idx).cast("long"))
             .bitwiseAND(F.lit(1023)).cast("double"))
        return e + F.when((F.lit(idx) + 5 * v) % 17 == 0,
                          (61 * v).cast("double")).otherwise(F.lit(0.0))

    grid = F.array(*[F.array(*[cell(t, f) for f in range(9)])
                     for t in range(9)])
    planted = docs.select("doc_id", grid.alias("energy"))
    return AudioFingerprintDeduplicator(
        idCol="doc_id", audioCol="energy", bands=4,
        maxHammingDistance=6).transform(planted)


def _video_fp_cte() -> str:
    """The shared video-fingerprint replay fragment (CTEs ``d`` →
    ``docfh`` → ``sizes``): deterministic per-frame 8×9 grids
    (chained xxhash64 of (group, frame·72 + cell)), the dHash bit
    rule and two's-complement assembly PER FRAME, distinct frame-hash
    sets per doc and the per-doc size ledger. Reused by
    video_dhash_dedup (full pair stage) and video_match_indexed
    (batch-vs-stored stage) so the fingerprint replay cannot
    diverge."""
    from mmlspark_spark.plans.duckdb_xxh import to_u64, xxh64_long

    inner = xxh64_long(to_u64("grp"), "42::HUGEINT", u="va")
    pix = (f"(({xxh64_long(to_u64('f*72 + r*9 + c'), 'gh', u='vb')})"
           f" % 256)")
    return f"""d AS (
      SELECT doc_id, doc_id % 25 AS grp, doc_id // 25 AS v
      FROM documents
    ), gh AS (
      SELECT doc_id, grp, v, {inner} AS gh FROM d
    ), gf AS (
      SELECT DISTINCT grp, gh, v + i AS f
      FROM (SELECT grp, gh, v, unnest(range(0, 8)) AS i FROM gh)
    ), px AS (
      SELECT grp, f, list_transform(range(0, 8), r ->
               list_transform(range(0, 9), c -> {pix})) AS g
      FROM gf
    ), fp AS (
      SELECT grp, f, CAST(sum(
               CASE WHEN g[j//8 + 1][j%8 + 1] <= g[j//8 + 1][j%8 + 2]
                      THEN 0::HUGEINT
                    WHEN j = 63 THEN -9223372036854775808::HUGEINT
                    ELSE (1::HUGEINT << j) END) AS BIGINT) AS fh
      FROM (SELECT grp, f, g, unnest(range(0, 64)) AS j FROM px)
      GROUP BY grp, f
    ), docfh AS (
      SELECT DISTINCT h.doc_id, p.fh
      FROM gh h JOIN fp p
        ON p.grp = h.grp AND p.f BETWEEN h.v AND h.v + 7
    ), sizes AS (
      SELECT doc_id, count(*) AS n FROM docfh GROUP BY doc_id
    )"""


def _video_dhash_oracle(minOverlap: float = 0.7) -> str:
    """Replays video_dhash_dedup end-to-end over the shared
    fingerprint fragment, then the containment-overlap pair stage.
    The oracle may self-join (declarative replay); the Spark path
    uses capped hash buckets instead. All arithmetic is integer or
    dyadic-rational (matches / 8), so the compare is exact."""
    return f"""
    WITH {_video_fp_cte()}, pairs AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             CAST(count(*) AS BIGINT) AS matches
      FROM docfh a JOIN docfh b
        ON a.fh = b.fh AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT doc_a, doc_b, matches,
           CAST(matches AS DOUBLE) / least(na.n, nb.n) AS overlap
    FROM pairs
    JOIN sizes na ON na.doc_id = doc_a
    JOIN sizes nb ON nb.doc_id = doc_b
    WHERE CAST(matches AS DOUBLE) / least(na.n, nb.n) >= {minOverlap}
    """


def _planted_clips(spark, sf_dir):
    """The shared synthetic-clip frame: every doc is an 8-frame clip
    cut from its group's virtual reel at offset v = doc_id div 25 —
    adjacent offsets share 7 of 8 frames (overlap 0.875), two apart
    share 6 (0.75), three+ fall below the 0.7 containment threshold,
    so near, boundary and rejected pairs all occur. Frame pixels are
    chained xxhash64 of (group, frame·72 + cell) mod 256 (power of
    two: signed pmod == unsigned mod) — the Spark twin of
    :func:`_video_fp_cte`'s pixel synthesis."""
    docs = _t(spark, sf_dir, "documents").select("doc_id")
    # one parsed SQL string instead of ~360 py4j calls assembling the
    # 72-cell grid expression — same tree, same xxhash64 inputs (grp
    # and f are BIGINT on both paths), so pixels are bit-identical
    frames = F.expr(
        "transform(sequence(doc_id div 25, doc_id div 25 + 7), "
        f"__f -> {_clip_grid_sql('CAST(doc_id % 25 AS BIGINT)', '__f')})")
    return docs.select("doc_id", frames.alias("clip"))


def _clip_grid_sql(grp_sql: str, f_sql: str) -> str:
    """SQL text of one synthesized 8×9 reel-frame pixel grid —
    chained xxhash64 of (group, frame·72 + cell) mod 256, the byte-
    same expression :func:`_planted_clips` used to assemble via ~360
    py4j calls (pure driver time, any data size)."""
    return "array(" + ",".join(
        "array(" + ",".join(
            f"CAST(pmod(xxhash64({grp_sql}, {f_sql} * 72 + {r * 9 + c})"
            f", 256) AS BIGINT)"
            for c in range(9)) + ")"
        for r in range(8)) + ")"


def _planted_clip_hashes(spark, sf_dir):
    """Frame-HASH twin of :func:`_planted_clips` for the stored-index
    lanes: (doc_id, clip ``array<long>``) where clip holds the dHash
    of frames v..v+7 — the deduplicator's precomputed-hash lane.
    Adjacent clips share 7 of 8 reel frames by construction, so the
    per-doc grid synthesis re-evaluated the same (grp, f) frame ~8×;
    here each DISTINCT reel frame is synthesized and dHashed exactly
    once (the oracle's own ``gf`` CTE dedups identically) and hashes
    re-attach to docs by (grp, f) equi-join — guide §1.2 "don't
    compute things you throw away". Pixel math and
    :func:`~mmlspark_spark.llm.multimodal_dedup.dhash_expr` are the
    byte-same expressions as the grid lane, so every downstream value
    is identical; the join keys and hash rows are 24 bytes, and at
    scale the frame table grows with the corpus, not with the 8×
    window overlap."""
    from mmlspark_spark.llm.multimodal_dedup import dhash_sql

    docs = _t(spark, sf_dir, "documents").select("doc_id")
    grp = (F.col("doc_id") % 25).cast("long")
    v = F.expr("doc_id div 25")
    exploded = docs.select(
        "doc_id", grp.alias("grp"),
        F.explode(F.sequence(v, v + F.lit(7))).alias("f"))

    # grid + dHash as ONE parsed SQL string (the Column-API assembly
    # paid ~2.4 s of py4j round trips per plan build — same tree,
    # same values; the lane oracles pin bit-equality)
    fhs = (exploded.select("grp", "f").distinct()
           .select("grp", "f",
                   F.expr(dhash_sql(_clip_grid_sql("grp", "f")))
                   .alias("fh")))
    return (exploded.join(fhs, ["grp", "f"])
            .groupBy("doc_id").agg(F.collect_list("fh").alias("clip")))


@register("video_dhash_dedup", oracle=_video_dhash_oracle())
def video_dhash_dedup(spark, sf_dir):
    """Frame-sampled video near-dup (VideoDHashDeduplicator, pure-
    Catalyst grid lane) over the shared synthetic clips: per-frame
    dHash → distinct-set explode → capped frame-hash buckets → pair
    counts → containment filter, replayed exactly (all values integer
    or dyadic)."""
    from mmlspark_spark.llm import VideoDHashDeduplicator

    return VideoDHashDeduplicator(
        idCol="doc_id", videoCol="clip",
        minOverlap=0.7).transform(_planted_clips(spark, sf_dir))


def _video_match_oracle(minOverlap: float = 0.7, split: int = 400,
                        cap: int = 1000,
                        dead: str | None = None) -> str:
    """Replays VideoDHashDeduplicator.match_against_index over the
    shared fingerprint fragment: stored docs are doc_id < split,
    the batch is doc_id >= split; frame hashes held by more than
    ``cap`` STORED docs are dropped before the pair stage (the
    stored-member hot-frame cap — a title card must not explode the
    fan-out); matches count shared distinct frame hashes; containment
    overlap uses the batch's own sizes and the stored ledger.
    ``dead`` (a doc_id predicate) replays a pending TOMBSTONE set:
    masked docs leave the stored frames, the hot-frame cap count AND
    the size ledger — matching equals a fresh index over the
    survivors (the read-time-delete contract)."""
    stored = f"doc_id < {split}" + (f" AND NOT ({dead})" if dead
                                    else "")
    b_stored = (f"b.doc_id < {split}"
                + (f" AND NOT ({dead.replace('doc_id', 'b.doc_id')})"
                   if dead else ""))
    return f"""
    WITH {_video_fp_cte()}, okfh AS (
      SELECT fh FROM docfh WHERE {stored}
      GROUP BY fh HAVING count(*) <= {cap}
    ), pairs AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             CAST(count(*) AS BIGINT) AS matches
      FROM docfh a
      JOIN okfh o ON o.fh = a.fh
      JOIN docfh b ON b.fh = a.fh
      WHERE a.doc_id >= {split} AND {b_stored}
      GROUP BY 1, 2
    )
    SELECT doc_a, doc_b, matches,
           CAST(matches AS DOUBLE) / least(na.n, nb.n) AS overlap
    FROM pairs
    JOIN sizes na ON na.doc_id = doc_a
    JOIN sizes nb ON nb.doc_id = doc_b
    WHERE CAST(matches AS DOUBLE) / least(na.n, nb.n) >= {minOverlap}
    """


@register("video_match_indexed", oracle=_video_match_oracle())
def video_match_indexed(spark, sf_dir):
    """Incremental video near-dup against a PERSISTED per-frame dHash
    index (round 12 — the LAST near-dup family to get the stored
    lifecycle): docs < 400 save as the index (frames store,
    fh-clustered, + per-doc size ledger), the batch (docs >= 400)
    frame-hashes map-side, semi-joins the store down to touched
    rows, hot stored frame hashes are capped before the fan-out, and
    containment overlap reads the stored ledger — the stored corpus
    is never re-hashed or re-aggregated. Oracle replays the
    match-time semantics over the shared fingerprint fragment."""
    import os

    from mmlspark_spark.llm import VideoDHashDeduplicator

    planted = _planted_clip_hashes(spark, sf_dir)
    dd = VideoDHashDeduplicator(idCol="doc_id", videoCol="clip",
                                minOverlap=0.7,
                                maxDocsPerFrameHash=1000)
    path = os.path.join(
        "/tmp/mmlspark_spark_idx",
        f"video_{os.path.basename(sf_dir.rstrip('/'))}")
    dd.save_index(planted.filter(F.col("doc_id") < 400), path)
    return dd.match_against_index(
        dd.load_index(spark, path),
        planted.filter(F.col("doc_id") >= 400))


@register("video_match_appended", oracle=_video_match_oracle())
def video_match_appended(spark, sf_dir):
    """The APPEND half of the video stored-index lifecycle under the
    driver's hash gate (round 16 — with embedding_match_appended
    this completes the append matrix over every stored near-dup
    family): the artifact is built in two installments — save_index
    over docs < 250, then append_to_index over 250 ≤ docs < 400
    (appended clips frame-hash ALONE, map-side; their frame rows and
    size-ledger rows land as new parquet files, no re-read of the
    existing store) — and the incoming batch (docs ≥ 400) screens
    against the GROWN index, hot-frame cap and containment ledger
    included. Oracle is the same fresh-over-union replay the
    single-save lane uses: append == fresh build over the union,
    previously pinned only in pytest."""
    import os

    from mmlspark_spark.llm import VideoDHashDeduplicator

    planted = _planted_clip_hashes(spark, sf_dir)
    dd = VideoDHashDeduplicator(idCol="doc_id", videoCol="clip",
                                minOverlap=0.7,
                                maxDocsPerFrameHash=1000)
    path = os.path.join(
        "/tmp/mmlspark_spark_idx",
        f"video_app_{os.path.basename(sf_dir.rstrip('/'))}")
    dd.save_index(planted.filter(F.col("doc_id") < 250), path)
    dd.append_to_index(
        planted.filter((F.col("doc_id") >= 250)
                       & (F.col("doc_id") < 400)),
        path)
    return dd.match_against_index(
        dd.load_index(spark, path),
        planted.filter(F.col("doc_id") >= 400))


@register("video_match_tombstoned",
          oracle=_video_match_oracle(dead="doc_id % 5 = 0"))
def video_match_tombstoned(spark, sf_dir):
    """The DELETE half of the video stored-index lifecycle under the
    driver's hash gate (round 13): the stored clips (docs < 400)
    tombstone every 5th doc (metadata-only takedown), then the
    incoming batch screens against the index. Tombstoned docs are
    masked from the frame store, the hot-frame cap count AND the
    size ledger — matching equals a fresh index over the survivors,
    exactly what the oracle replays (dead docs excluded from the
    stored side of the frame-synthesis + dHash + set-overlap
    fragment). save_index clears stale tombstones on overwrite, so
    repeated driver runs are hermetic."""
    import os

    from mmlspark_spark.llm import VideoDHashDeduplicator

    planted = _planted_clip_hashes(spark, sf_dir)
    dd = VideoDHashDeduplicator(idCol="doc_id", videoCol="clip",
                                minOverlap=0.7,
                                maxDocsPerFrameHash=1000)
    path = os.path.join(
        "/tmp/mmlspark_spark_idx",
        f"video_del_{os.path.basename(sf_dir.rstrip('/'))}")
    stored = planted.filter(F.col("doc_id") < 400)
    dd.save_index(stored, path)
    dd.delete_from_index(
        stored.filter(F.col("doc_id") % 5 == 0).select("doc_id"),
        path)
    return dd.match_against_index(
        dd.load_index(spark, path),
        planted.filter(F.col("doc_id") >= 400))


def _dsir_oracle(B: int = 1024, k: int = 150, seed: int = 7) -> str:
    """Replays the FULL DSIR pipeline (llm/selection.py) end to end:
    pinned tokenization, unigram+bigram grams in position order,
    per-DISTINCT-gram xxhash64 → power-of-two bucket (unsigned mod ==
    Spark's signed bit-AND), smoothed target/raw log-ratio table, the
    per-document left-fold score in gram order (list_reduce prepend-0
    — the fold_sum order contract), the seeded Gumbel key from
    chained xxhash64(doc_id, seed), and the rounded-key top-k. Scores
    round to 6dp BEFORE entering the key so ulp-level ln() drift
    between libm and Java Math.log cannot flip selection."""
    from mmlspark_spark.plans.duckdb_xxh import (
        to_s64,
        to_u64,
        xxh64_long,
        xxh64_str,
    )

    h1 = xxh64_long(to_u64("doc_id"), "42::HUGEINT", u="dga")
    h2 = xxh64_long(f"{seed}::HUGEINT", "h1", u="dgb")
    # two-sided clamp mirroring DSIRModel._gumbel_key exactly:
    # greatest(…, 2⁻⁶⁴) for h = −2⁶³ (u = 0 → −ln(−ln 0) = −inf) and
    # least(…, 1 − 2⁻⁵³) for the 512 h values near +2⁶³ whose
    # int64→double cast rounds to u = 1.0 (Spark: +inf key; DuckDB:
    # ln(0) raises — the clamp is what keeps the oracle runnable)
    u01 = (f"least(greatest(CAST(({to_s64('h2v')}) AS DOUBLE)"
           f"/18446744073709551616.0 + 0.5,"
           f" 1.0/18446744073709551616.0),"
           f" 1.0 - 1.0/9007199254740992.0)")
    return f"""
    WITH t AS (
      SELECT doc_id, lang, list_filter(
               string_split_regex(text, '[ \\t\\n\\r]+'),
               x -> x <> '') AS tk
      FROM documents WHERE text IS NOT NULL
    ), grams AS (
      SELECT doc_id, lang,
             tk || list_transform(range(1, len(tk)),
                                  i -> tk[i] || ' ' || tk[i+1]) AS gs
      FROM t
    ), gx AS (
      SELECT doc_id, lang, j, gs[j+1] AS g
      FROM (SELECT doc_id, lang, gs, unnest(range(0, len(gs))) AS j
            FROM grams)
    ), gh AS (
      SELECT g,
             CAST(({to_u64(xxh64_str("g", u="dg"))}) % {B} AS BIGINT)
               AS b
      FROM (SELECT DISTINCT g FROM gx)
    ), gb AS (
      SELECT doc_id, lang, j, b FROM gx JOIN gh USING (g)
    ), tcnt AS (
      SELECT b, CAST(count(*) AS BIGINT) AS c FROM gb
      WHERE lang = 'en' GROUP BY b
    ), rcnt AS (
      SELECT b, CAST(count(*) AS BIGINT) AS c FROM gb GROUP BY b
    ), tot AS (
      SELECT (SELECT COALESCE(CAST(sum(c) AS BIGINT), 0) FROM tcnt)
               AS tt,
             (SELECT COALESCE(CAST(sum(c) AS BIGINT), 0) FROM rcnt)
               AS rt
    ), fullb AS (
      SELECT r.b AS b, COALESCE(tc.c, 0) AS tc, COALESCE(rc.c, 0) AS rc
      FROM (SELECT unnest(range(0, {B})) AS b) r
      LEFT JOIN tcnt tc ON tc.b = r.b
      LEFT JOIN rcnt rc ON rc.b = r.b
    ), lrarr AS (
      SELECT list(ln((tc + 1.0) / (CAST(tt AS DOUBLE) + {float(B)}))
                  - ln((rc + 1.0) / (CAST(rt AS DOUBLE) + {float(B)}))
                  ORDER BY b) AS arr
      FROM fullb CROSS JOIN tot
    ), doclist AS (
      SELECT doc_id, list(b ORDER BY j) AS bs FROM gb GROUP BY doc_id
    ), scored AS (
      SELECT t.doc_id,
             list_reduce(list_prepend(0.0::DOUBLE,
               list_transform(COALESCE(dl.bs, CAST([] AS BIGINT[])),
                              bb -> arr[bb + 1])),
               (a2, b2) -> a2 + b2) AS score
      FROM t LEFT JOIN doclist dl USING (doc_id) CROSS JOIN lrarr
    ), g2 AS (
      SELECT doc_id, round(score, 6) AS dsir_score, ({h2}) AS h2v
      FROM (SELECT doc_id, score, ({h1}) AS h1 FROM scored)
    )
    SELECT doc_id, dsir_score,
           round(dsir_score / 1.0 - ln(-ln({u01})), 6) AS gumbel_key
    FROM g2
    ORDER BY gumbel_key DESC, doc_id LIMIT {k}
    """


@register("dsir_select", oracle=_dsir_oracle())
def dsir_select(spark, sf_dir):
    """DSIR data selection (Xie et al. 2023, arXiv:2302.03169): fit
    hashed unigram+bigram importance weights of the English subset
    against the whole pool, score every document map-side via the
    one-row broadcast log-ratio array, and Gumbel-top-k resample 150
    docs without replacement. FIT shuffles are bucket-bounded (1024),
    SCORING is zero-shuffle (single-row BNLJ broadcast + per-doc
    fold), SELECTION is TakeOrderedAndProject — no stage touches
    corpus-sized state, so the plan is unchanged at 100 TB. Keys and
    scores round to 6dp before ranking so the driver hash and the
    member set are float-drift-proof."""
    from mmlspark_spark.llm import DSIRSelector

    from mmlspark_spark.core.cache import propagate_intermediates

    docs = _t(spark, sf_dir, "documents")
    sel = DSIRSelector(idCol="doc_id", textCol="text", buckets=1024,
                       seed=7)
    # fit_with_indicator: the target is an in-pool subset, so BOTH
    # histograms come from ONE tokenize+explode pass (identical
    # counts); the bucket-bounded count frame is persisted so tot /
    # ratio-array / re-broadcasts read 1024 cached rows instead of
    # re-running the corpus explode
    model = sel.fit_with_indicator(docs, F.col("lang") == "en")
    out = model.resample(docs, k=150)
    return propagate_intermediates(
        out, out.select("doc_id", F.col("dsir_score"), "gumbel_key"))


@register("simhash_dedup", oracle=_simhash_oracle())
def simhash_dedup(spark, sf_dir):
    """SimHash fingerprint near-dup candidates, HASH-EXACT against a
    DuckDB oracle replaying the production xxhash64 family bit-for-bit
    (plans/duckdb_xxh): per-token hashes → 64 sign votes → fingerprint
    → 16-bit band buckets → capped pairs → Hamming filter. Rows-only
    until round 8."""
    from mmlspark_spark.llm import SimHashDeduplicator

    docs = _t(spark, sf_dir, "documents")
    return SimHashDeduplicator(
        idCol="doc_id", textCol="text", bands=4, maxHammingDistance=10
    ).transform(docs)


@register(
    "knn_bruteforce",
    oracle="""
    SELECT query_id, neighbor_id, sim, rk FROM (
      SELECT q.vec_id AS query_id, d.vec_id AS neighbor_id,
             round(list_cosine_similarity(q.embedding::DOUBLE[],
                                          d.embedding::DOUBLE[]), 6) AS sim,
             row_number() OVER (
               PARTITION BY q.vec_id
               ORDER BY list_cosine_similarity(q.embedding::DOUBLE[],
                                               d.embedding::DOUBLE[]) DESC,
                        d.vec_id
             ) AS rk
      FROM embeddings q JOIN embeddings d ON q.vec_id < 5 AND d.vec_id <> q.vec_id
    ) WHERE rk <= 10
    """,
    headline=True,
)
def knn_bruteforce(spark, sf_dir):
    """Exact top-10 cosine neighbors for the first 5 query vectors —
    brute-force baseline of the similarity-search stack."""
    from mmlspark_spark.llm import BruteForceKNN

    emb = _t(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 5)
    # numpy = the scale path (broadcast queries, stream corpus,
    # per-partition BLAS partial top-k); measured 2x the expr path at
    # sf0.1 (0.45 s vs 0.95 s) and verified repr-exact vs the oracle
    out = BruteForceKNN(idCol="vec_id", vecCol="embedding", k=10,
                        method="numpy").search(emb, q)
    return out.select(
        "query_id", "neighbor_id",
        F.round("sim", 6).alias("sim"), F.col("rank").alias("rk"),
    )


def _knn_lsh_oracle(numPlanes: int = 16, bands: int = 8, k: int = 10,
                    dim: int = 64, seed: int = 42) -> str:
    """Replays LSHKNN end-to-end: the SAME seeded numpy hyperplanes
    (regenerated here at import time and inlined as double literals —
    both sides call ``default_rng(seed).standard_normal`` so they can
    never drift), sign-bit signatures with the identical left-fold
    summation order, band chunks, bucket-join candidates, exact cosine
    (separate dot/norm² folds — bit-identical to the one-pass struct
    accumulator because each accumulator adds in element order) and
    the (sim DESC, neighbor_id) top-k window."""
    import numpy as np

    planes = np.random.default_rng(seed).standard_normal((numPlanes, dim))
    pls = "[" + ", ".join(
        "[" + ", ".join(repr(float(v)) for v in row) + "]"
        for row in planes) + "]::DOUBLE[][]"
    from mmlspark_spark.plans.duckdb_xxh import cosine_sql, fold_sum

    r = numPlanes // bands
    assert r == 2, "chunk expr below unrolls exactly r=2 bits"

    def fold(term: str) -> str:
        return fold_sum(term, dim)

    def bit(plane_ix: str) -> str:
        return (f"(CASE WHEN {fold(f'v[i2] * pls[{plane_ix}][i2]')} > 0 "
                f"THEN 1 ELSE 0 END)")

    return f"""
    WITH pl AS (SELECT {pls} AS pls),
    e AS (
      SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v
      FROM embeddings
    ), sig AS (
      SELECT vec_id, v,
             list_transform(range(0, {bands}),
               b -> {bit('2*b+1')} + 2 * {bit('2*b+2')}) AS chunks
      FROM e, pl
    ), band AS (
      SELECT vec_id, unnest(chunks) AS chunk,
             unnest(range(0, {bands})) AS band
      FROM sig
    ), cand AS (
      SELECT DISTINCT q.vec_id AS query_id, d.vec_id AS neighbor_id
      FROM band d JOIN band q
        ON d.band = q.band AND d.chunk = q.chunk
      WHERE q.vec_id < 5 AND d.vec_id <> q.vec_id
    ), scored AS (
      SELECT query_id, neighbor_id,
             {cosine_sql("eq.v", "ed.v", dim)} AS sim
      FROM cand
      JOIN e eq ON eq.vec_id = query_id
      JOIN e ed ON ed.vec_id = neighbor_id
    )
    SELECT query_id, neighbor_id, round(sim, 6) AS sim,
           CAST(rk AS INTEGER) AS rk
    FROM (SELECT *, row_number() OVER (
            PARTITION BY query_id
            ORDER BY sim DESC, neighbor_id) AS rk
          FROM scored)
    WHERE rk <= {k}
    """


@register("knn_lsh", oracle=_knn_lsh_oracle())
def knn_lsh(spark, sf_dir):
    """LSH-bucketed approximate KNN, HASH-EXACT against a DuckDB
    oracle replaying the seeded hyperplanes, signature bits, bucket
    join and exact-cosine top-k bit-for-bit (rows-only before round
    8; recall vs brute force additionally asserted in
    tests/test_llm.py)."""
    from mmlspark_spark.llm import LSHKNN

    emb = _t(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 5)
    out = LSHKNN(idCol="vec_id", vecCol="embedding", k=10,
                 numPlanes=16, bands=8).search(emb, q)
    return out.select("query_id", "neighbor_id",
                      F.round("sim", 6).alias("sim"), F.col("rank").alias("rk"))


@register("knn_lsh_indexed", oracle=_knn_lsh_oracle())
def knn_lsh_indexed(spark, sf_dir):
    """LSH ANN from a PERSISTED signature index (round 12 — the last
    ANN family to gain the stored lifecycle): the corpus's band rows
    (12 bytes each, vectors split into their own store) persist once;
    a search signatures only the queries, broadcasts them onto the
    stored band rows, and the exact-cosine rerank joins stored
    vectors once per candidate. Results are identical to the
    in-memory lane — the oracle is knn_lsh's seeded-plane replay
    verbatim, so a hash match proves the save/load round-trip is
    lossless."""
    import os

    from mmlspark_spark.llm import LSHKNN

    emb = _t(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 5)
    lsh = LSHKNN(idCol="vec_id", vecCol="embedding", k=10,
                 numPlanes=16, bands=8)
    path = os.path.join(
        "/tmp/mmlspark_spark_idx",
        f"lsh_{os.path.basename(sf_dir.rstrip('/'))}")
    lsh.save_index(emb, path)
    out = lsh.search_with_index(lsh.load_index(spark, path), q)
    return out.select("query_id", "neighbor_id",
                      F.round("sim", 6).alias("sim"),
                      F.col("rank").alias("rk"))


@register(
    "embedding_stats",
    oracle="""
    SELECT label, count(*) AS n,
           round(avg(list_aggregate(list_transform(embedding::DOUBLE[],
                 x -> x * x), 'sum')), 6) AS avg_sq_norm
    FROM embeddings GROUP BY label
    """,
)
def embedding_stats(spark, sf_dir):
    """Per-label embedding norms — array aggregation expressions over
    vector columns."""
    emb = _t(spark, sf_dir, "embeddings")
    sq_norm = F.aggregate(
        F.transform(F.col("embedding"), lambda x: x.cast("double") * x.cast("double")),
        F.lit(0.0), lambda a, v: a + v,
    )
    return emb.groupBy("label").agg(
        F.count("*").alias("n"),
        F.round(F.avg(sq_norm), 6).alias("avg_sq_norm"),
    )


# ---------------------------------------------------------------------------
