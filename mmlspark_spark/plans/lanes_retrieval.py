"""LLM training-data pipeline lanes II: embedding dedup, IVF/PQ/SQ ANN lifecycles, BM25/hybrid retrieval (engine extras)

Split from the former single-file ``plans/catalog.py`` (round 15,
purely mechanical — no lane changed; the ``CATALOG`` registry in
``plans.catalog`` is the only contract and import order preserves the
original registration order)."""

from __future__ import annotations

from pyspark.sql import functions as F  # noqa: F401
from pyspark.sql import DataFrame  # noqa: F401
from pyspark.sql.window import Window  # noqa: F401

from mmlspark_spark.plans.catalog import _t, register  # noqa: F401

# Explainers (SURVEY §2.10; reference explainers/LIMEBase, KernelSHAPBase)
# ---------------------------------------------------------------------------

@register("tabular_lime", oracle=None)
def tabular_lime(spark, sf_dir):
    """TabularLIME over a revenue model on lineitem: explode-sample →
    score → per-id weighted lasso in applyInPandas (rows-only; analytic
    recovery asserted in tests/test_explainers.py)."""
    from mmlspark_spark.explainers import TabularLIME
    from mmlspark_spark.operators import Lambda

    li = _t(spark, sf_dir, "lineitem")
    model = Lambda(fn=lambda df: df.withColumn(
        "prediction",
        F.col("l_extendedprice") * (1 - F.col("l_discount"))))
    probe = li.limit(10)
    lime = TabularLIME(model=model, inputCols=["l_extendedprice", "l_discount"],
                       backgroundData=li.limit(500), targetCol="prediction",
                       numSamples=100, seed=42)
    out = lime.transform(probe)
    return out.select(
        "l_orderkey", "l_linenumber",
        F.round(F.col("explanation")[0], 2).alias("w_price"),
        F.round(F.col("explanation")[1], 2).alias("w_discount"),
    )


@register("tabular_shap", oracle=None)
def tabular_shap(spark, sf_dir):
    """KernelSHAP over the same revenue model (rows-only; efficiency
    property asserted in tests)."""
    from mmlspark_spark.explainers import TabularSHAP
    from mmlspark_spark.operators import Lambda

    li = _t(spark, sf_dir, "lineitem")
    model = Lambda(fn=lambda df: df.withColumn(
        "prediction",
        F.col("l_extendedprice") * (1 - F.col("l_discount"))))
    probe = li.limit(10)
    shap = TabularSHAP(model=model, inputCols=["l_extendedprice", "l_discount"],
                       backgroundData=li.limit(500), targetCol="prediction",
                       numSamples=64, seed=42)
    out = shap.transform(probe)
    return out.select(
        "l_orderkey", "l_linenumber",
        F.round(F.col("shapValues")[0], 2).alias("base"),
        F.round(F.col("shapValues")[1], 2).alias("phi_price"),
        F.round(F.col("shapValues")[2], 2).alias("phi_discount"),
    )


@register(
    "embedding_dedup",
    oracle="""
    WITH e AS (
      SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
      WHERE vec_id < 300
    )
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           round(list_cosine_similarity(a.v, b.v), 6) AS cosine
    FROM e a JOIN e b ON a.vec_id < b.vec_id
    WHERE list_cosine_similarity(a.v, b.v) >= 0.3
    """,
)
def embedding_dedup(spark, sf_dir):
    """Embedding-cosine near-dup pairs, exact path over a bounded slice
    (the LSH path is the scale variant, recall-tested in tests).

    Threshold 0.3, not a production-like 0.9: the synthetic embeddings
    are near-orthogonal (max pairwise cosine ~0.47 at every SF), so any
    higher threshold makes the oracle comparison vacuous (0 rows on
    both sides proves nothing). 0.3 compares ~300 real pairs."""
    from mmlspark_spark.llm.dedup import EmbeddingDeduplicator

    emb = _t(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 300)
    out = EmbeddingDeduplicator(idCol="vec_id", vecCol="embedding",
                                threshold=0.3, method="exact").transform(emb)
    return out.select("id_a", "id_b", F.round("cosine", 6).alias("cosine"))


def _embedding_match_oracle(numPlanes: int = 16, bands: int = 8,
                            dim: int = 64, seed: int = 42,
                            split: int = 400, threshold: float = 0.2,
                            cap: int = 1000,
                            dead: str | None = None) -> str:
    """Replays EmbeddingDeduplicator.match_against_index: the SAME
    seeded numpy hyperplanes as _knn_lsh_oracle (regenerated at
    import, inlined as literals), sign-bit band chunks for ALL
    vectors, buckets counted over INDEX vectors only (stored-member
    cap — match-time semantics), batch×stored candidates on the
    chunk equi-join, exact cosine via the proven fold replay.
    ``dead`` (a vec_id predicate) replays a pending TOMBSTONE set:
    masked ids leave both the stored bucket-member counts (BEFORE
    the cap) and the candidate side — matching equals a fresh index
    over the survivors (the read-time-delete contract)."""
    import numpy as np

    from mmlspark_spark.plans.duckdb_xxh import cosine_sql, fold_sum

    planes = np.random.default_rng(seed).standard_normal((numPlanes,
                                                          dim))
    pls = "[" + ", ".join(
        "[" + ", ".join(repr(float(v)) for v in row) + "]"
        for row in planes) + "]::DOUBLE[][]"
    r = numPlanes // bands
    assert r == 2, "chunk expr below unrolls exactly r=2 bits"

    def bit(plane_ix: str) -> str:
        return (f"(CASE WHEN "
                f"{fold_sum(f'v[i2] * pls[{plane_ix}][i2]', dim)} > 0 "
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
    ), bucketi AS (
      SELECT band, chunk, CAST(count(*) AS BIGINT) AS n
      FROM band WHERE {f"vec_id < {split}"
                       + (f" AND NOT ({dead})" if dead else "")}
      GROUP BY band, chunk
    ), cand AS (
      SELECT DISTINCT nb.vec_id AS id_a, d.vec_id AS id_b
      FROM band nb
      JOIN band d ON nb.band = d.band AND nb.chunk = d.chunk
      JOIN bucketi bi ON bi.band = nb.band AND bi.chunk = nb.chunk
      WHERE nb.vec_id >= {split} AND d.vec_id < {split}
        AND bi.n <= {cap}{
          f" AND NOT ({dead.replace('vec_id', 'd.vec_id')})"
          if dead else ""}
    )
    SELECT id_a, id_b,
           round({cosine_sql("ea.v", "eb.v", dim)}, 6) AS cosine
    FROM cand
    JOIN e ea ON ea.vec_id = id_a
    JOIN e eb ON eb.vec_id = id_b
    WHERE {cosine_sql("ea.v", "eb.v", dim)} >= {threshold}
    """


@register("embedding_match_indexed", oracle=_embedding_match_oracle())
def embedding_match_indexed(spark, sf_dir):
    """Incremental EMBEDDING near-dup against a PERSISTED LSH index —
    the semantic-dedup daily-ingest shape: the stored corpus
    (vec_id < 400) was banded ONCE under the seeded hyperplanes into
    (id, band, chunk) bucket keys + a vector store; the incoming
    batch (vec_id >= 400) bands only itself, equi-joins the stored
    keys (hot stored buckets capped before the fan-out), and exact
    cosine verifies the surviving candidates against the stored
    vectors. Threshold 0.2 because the synthetic embeddings are
    near-orthogonal (the embedding_dedup rationale). Oracle replays
    planes, chunks, stored-member cap, and the cosine fold
    bit-exact."""
    import os

    from mmlspark_spark.llm.dedup import EmbeddingDeduplicator

    emb = _t(spark, sf_dir, "embeddings")
    dd = EmbeddingDeduplicator(idCol="vec_id", vecCol="embedding",
                               threshold=0.2, method="lsh",
                               numPlanes=16, bands=8)
    path = os.path.join(
        "/tmp/mmlspark_spark_idx",
        f"embdedup_{os.path.basename(sf_dir.rstrip('/'))}")
    dd.save_index(emb.filter(F.col("vec_id") < 400), path)
    out = dd.match_against_index(
        dd.load_index(spark, path),
        emb.filter(F.col("vec_id") >= 400))
    return out.select("id_a", "id_b",
                      F.round("cosine", 6).alias("cosine"))


@register("embedding_match_appended",
          oracle=_embedding_match_oracle())
def embedding_match_appended(spark, sf_dir):
    """The APPEND half of the embedding stored-index lifecycle under
    the driver's hash gate (round 16 — completes the append matrix:
    every stored near-dup family now has save/append/load/match
    driver-gated): the artifact is built in two installments —
    save_index over vec_id < 250, then append_to_index over
    250 ≤ vec_id < 400 (appended vectors band ALONE under the SAME
    stored seeded hyperplanes, map-side; their bucket keys and
    vectors land as new parquet files, no re-read of the existing
    store) — and the incoming batch (vec_id ≥ 400) screens against
    the GROWN index. Oracle is the same fresh-over-union replay the
    single-save lane uses: append == fresh build over the union is
    the lifecycle's contract, previously pinned only in pytest."""
    import os

    from mmlspark_spark.llm.dedup import EmbeddingDeduplicator

    emb = _t(spark, sf_dir, "embeddings")
    dd = EmbeddingDeduplicator(idCol="vec_id", vecCol="embedding",
                               threshold=0.2, method="lsh",
                               numPlanes=16, bands=8)
    path = os.path.join(
        "/tmp/mmlspark_spark_idx",
        f"embdedup_app_{os.path.basename(sf_dir.rstrip('/'))}")
    dd.save_index(emb.filter(F.col("vec_id") < 250), path)
    dd.append_to_index(
        emb.filter((F.col("vec_id") >= 250) & (F.col("vec_id") < 400)),
        path)
    out = dd.match_against_index(
        dd.load_index(spark, path),
        emb.filter(F.col("vec_id") >= 400))
    return out.select("id_a", "id_b",
                      F.round("cosine", 6).alias("cosine"))


@register("embedding_match_tombstoned",
          oracle=_embedding_match_oracle(dead="vec_id % 5 = 0"))
def embedding_match_tombstoned(spark, sf_dir):
    """The DELETE half of the embedding near-dup stored-index
    lifecycle under the driver's hash gate (round 13): the stored
    vectors (vec_id < 400) tombstone every 5th id (metadata-only
    takedown), then the incoming batch screens against the index.
    Tombstoned ids leave the stored bucket store BEFORE the
    hot-bucket cap count and never surface as id_b — matching equals
    a fresh index over the survivors, exactly what the oracle
    replays (dead ids excluded from bucket counts and candidates in
    the seeded-hyperplane fragment). save_index clears stale
    tombstones on overwrite, so repeated driver runs are hermetic."""
    import os

    from mmlspark_spark.llm.dedup import EmbeddingDeduplicator

    emb = _t(spark, sf_dir, "embeddings")
    dd = EmbeddingDeduplicator(idCol="vec_id", vecCol="embedding",
                               threshold=0.2, method="lsh",
                               numPlanes=16, bands=8)
    path = os.path.join(
        "/tmp/mmlspark_spark_idx",
        f"embdedup_del_{os.path.basename(sf_dir.rstrip('/'))}")
    stored = emb.filter(F.col("vec_id") < 400)
    dd.save_index(stored, path)
    dd.delete_from_index(
        stored.filter(F.col("vec_id") % 5 == 0).select("vec_id"),
        path)
    out = dd.match_against_index(
        dd.load_index(spark, path),
        emb.filter(F.col("vec_id") >= 400))
    return out.select("id_a", "id_b",
                      F.round("cosine", 6).alias("cosine"))


@register(
    "text_metrics",
    oracle="""
    SELECT doc_id,
           round(CAST(length(text) - length(regexp_replace(text, '[^\\w\\s]', '', 'g'))
                 AS DOUBLE) / greatest(length(text), 1), 6) AS punct_ratio,
           length(regexp_replace(text, '[A-Za-z]+|[0-9]+|[^ \\tA-Za-z0-9]',
                                 'X', 'g'))
             - length(regexp_replace(text,
                      '[A-Za-z]+|[0-9]+|[^ \\tA-Za-z0-9]', '', 'g'))
             AS subword_tokens
    FROM documents WHERE doc_id < 2000
    """,
)
def text_metrics(spark, sf_dir):
    """Punctuation ratio + BPE-ish subword count as pure expressions
    (SURVEY 'LLM extras' text analysis)."""
    from mmlspark_spark.functions.text_quality import (
        punct_ratio,
        subword_token_count,
    )

    docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 2000)
    return docs.select(
        "doc_id",
        F.round(punct_ratio("text"), 6).alias("punct_ratio"),
        subword_token_count("text").cast("bigint").alias("subword_tokens"),
    )


@register(
    "lang_id_heuristic",
    oracle="""
    WITH toks AS (
      SELECT doc_id,
             list_transform(
               list_filter(string_split_regex(text, '\\s+'), x -> x <> ''),
               x -> lower(x)) AS t
      FROM documents WHERE doc_id < 2000
    ),
    scored AS (
      SELECT doc_id,
        len(list_filter(t, x -> list_contains(
          ['der','die','das','und','ist','nicht','ein','mit'], x))) AS de,
        len(list_filter(t, x -> list_contains(
          ['the','and','of','is','that','with','for','this'], x))) AS en,
        len(list_filter(t, x -> list_contains(
          ['el','los','las','es','una','para','con','por'], x))) AS es,
        len(list_filter(t, x -> list_contains(
          ['le','la','les','et','est','une','dans','pour'], x))) AS fr,
        len(list_filter(t, x -> list_contains(
          ['il','gli','che','per','una','sono','con','di'], x))) AS it
      FROM toks
    )
    SELECT doc_id,
      CASE WHEN greatest(de, en, es, fr, it) = 0 THEN 'und'
           WHEN de = greatest(de, en, es, fr, it) THEN 'de'
           WHEN en = greatest(de, en, es, fr, it) THEN 'en'
           WHEN es = greatest(de, en, es, fr, it) THEN 'es'
           WHEN fr = greatest(de, en, es, fr, it) THEN 'fr'
           ELSE 'it' END AS pred_lang
    FROM scored
    """,
)
def lang_id_heuristic(spark, sf_dir):
    """Function-word-profile language ID over documents. The oracle
    replicates the exact scoring — per-language function-word hit
    counts, argmax with lexicographic-min tie-break, 'und' on zero hits
    — as DuckDB list expressions, so the heuristic itself is
    hash-checked (not just row counts)."""
    from mmlspark_spark.functions.text_quality import lang_id

    docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 2000)
    return docs.select("doc_id", lang_id("text").alias("pred_lang"))


@register(
    "doc_fingerprint",
    oracle="""
    SELECT doc_id,
           list_reduce(
             list_prepend(0::BIGINT,
               list_transform(
                 list_filter(string_split_regex(text, '\\s+'), x -> x <> ''),
                 t -> list_reduce(
                        list_prepend(0::BIGINT,
                          list_transform(string_split(t, ''),
                                         c -> ascii(c)::BIGINT)),
                        (a, c) -> (a * 131 + c) % 562949953421231))),
             (acc, th) -> (acc * 31 + th) % 562949953421231) AS fingerprint
    FROM documents
    WHERE doc_id < 2000
    """)
def doc_fingerprint_query(spark, sf_dir):
    """Order-sensitive rolling-hash content fingerprint, portable
    variant: Rabin-Karp char-polynomial token hash folded by position,
    pure modular arithmetic — so DuckDB reproduces it bit-for-bit (the
    oracle above mirrors the fold with list_reduce). The xxhash64
    variant (`doc_fingerprint`, the production default — cheaper per
    char) stays property-tested for determinism + order sensitivity in
    tests/test_properties.py; both are the same map-side operator with
    a pluggable token hash."""
    from mmlspark_spark.functions.text_quality import (
        doc_fingerprint_portable)

    docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 2000)
    return docs.select(
        "doc_id", doc_fingerprint_portable("text").alias("fingerprint"))


@register(
    "winnow_fingerprint",
    oracle="""
    WITH t AS (
      SELECT doc_id, list_filter(string_split_regex(text, '[ \\t\\n\\r]+'),
                                 x -> x <> '') AS toks
      FROM documents WHERE doc_id < 300
    ), th AS (
      SELECT doc_id, list_transform(toks,
        t -> list_reduce(list_prepend(0::BIGINT,
               list_transform(string_split(t, ''), c -> ascii(c)::BIGINT)),
             (a, c) -> (a * 131 + c) % 562949953421231)) AS tokh
      FROM t
    ), g AS (
      SELECT doc_id,
        CASE WHEN len(tokh) >= 4 THEN
          list_transform(range(0, len(tokh) - 3),
            i -> list_reduce(list_prepend(0::BIGINT,
                               list_slice(tokh, i + 1, i + 4)),
                 (a, h) -> (a * 31 + h) % 562949953421231))
        ELSE [] END AS grams
      FROM th
    ), w AS (
      SELECT doc_id, grams, least(4, len(grams)) AS W
      FROM g WHERE len(grams) > 0
    ), sel AS (
      SELECT doc_id,
        unnest(list_transform(range(0, len(grams) - W + 1),
          s -> {'pos': s + W - list_position(
                         list_reverse(list_slice(grams, s + 1, s + W)),
                         list_min(list_slice(grams, s + 1, s + W))),
                'fp': list_min(list_slice(grams, s + 1, s + W))})) AS e
      FROM w
    )
    SELECT DISTINCT doc_id, CAST(e.pos AS BIGINT) AS pos,
           CAST(e.fp AS BIGINT) AS fp
    FROM sel
    """)
def winnow_fingerprint(spark, sf_dir):
    """Winnowing fingerprints (Schleimer et al. 2003 / MOSS): 4-gram
    Rabin-Karp rolling hashes, window-4 rightmost-min selection — the
    position-aware local fingerprint family for copy/quote detection
    (any shared 7-token run is guaranteed a common fingerprint).
    Pure modular arithmetic throughout, so the oracle replays token
    hashing, gram folding AND the window argmin selection hash-exact.
    Map-side except the final fixed-width DISTINCT."""
    from mmlspark_spark.llm import winnow_fingerprints

    docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 300)
    return winnow_fingerprints(docs, idCol="doc_id", textCol="text",
                               k=4, window=4)


@register(
    "cdc_chunks",
    oracle=r"""
    WITH t AS (
      SELECT doc_id, list_filter(string_split_regex(text, '[ \t\n\r]+'),
                                 x -> x <> '') AS toks
      FROM documents WHERE doc_id < 300
    ), th AS (
      SELECT doc_id, toks, list_transform(toks,
        t -> list_reduce(list_prepend(0::BIGINT,
               list_transform(string_split(t, ''), c -> ascii(c)::BIGINT)),
             (a, c) -> (a * 131 + c) % 562949953421231)) AS tokh
      FROM t
    ), g AS (
      SELECT doc_id, toks,
        CASE WHEN len(tokh) >= 4 THEN
          list_transform(range(0, len(tokh) - 3),
            i -> list_reduce(list_prepend(0::BIGINT,
                               list_slice(tokh, i + 1, i + 4)),
                 (a, h) -> (a * 31 + h) % 562949953421231))
        ELSE [] END AS grams
      FROM th
    ), c AS (
      SELECT doc_id, toks,
        list_sort(list_distinct(
          [0] || list_transform(
                   list_filter(range(0, len(grams)),
                               i -> grams[i + 1] % 16 = 0),
                   i -> i + 4)
              || [len(toks)])) AS cuts
      FROM g WHERE len(toks) > 0
    ), sel AS (
      SELECT doc_id, toks, cuts, unnest(range(0, len(cuts) - 1)) AS j
      FROM c
    )
    SELECT doc_id, CAST(j AS BIGINT) AS chunk_id,
           CAST(cuts[j + 1] AS BIGINT) AS start,
           CAST(cuts[j + 2] - cuts[j + 1] AS BIGINT) AS n_tokens,
           array_to_string(list_slice(toks, cuts[j + 1] + 1,
                                      cuts[j + 2]), ' ') AS chunk
    FROM sel WHERE cuts[j + 2] - cuts[j + 1] > 0
    """)
def cdc_chunks_q(spark, sf_dir):
    """Content-defined chunking (cdc_chunks, k=4, maskBits=4): chunk
    boundaries fall where the local 4-gram rolling hash ≡ 0 (mod 16),
    so an edit moves only the chunks around it — fixed-stride windows
    downstream of an insertion all shift (chunk_overlap shows that
    layout; this is the dedup-stable one, the LBFS/FastCDC idea at
    token granularity). The oracle replays token hashing, gram
    folding, boundary selection and chunk extraction hash-exact."""
    from mmlspark_spark.llm import cdc_chunks

    docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 300)
    out = cdc_chunks(docs, idCol="doc_id", textCol="text",
                     k=4, maskBits=4)
    return out.select("doc_id",
                      F.col("chunk_id").cast("long").alias("chunk_id"),
                      "start", "n_tokens", "chunk")


@register(
    "url_canonicalize",
    oracle=r"""
    WITH raw AS (
      SELECT doc_id,
             'HTTPS://Site' || (doc_id % 10)
               || '.Example.ORG:443/Path' || (doc_id % 3)
               || '/?b=2&utm_source=x&a=1&fbclid=zz#frag' || doc_id
               || '?x=' || (doc_id % 7) AS u
      FROM documents WHERE doc_id < 1000
    ), parts AS (
      SELECT doc_id,
        lower(regexp_extract(u, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1))
          AS scheme,
        regexp_replace(u, '^[A-Za-z][A-Za-z0-9+.-]*://', '') AS rest,
        regexp_extract(u, '^[^#?]*\?([^#]*)', 1) AS query
      FROM raw
    ), comps AS (
      SELECT doc_id, scheme,
        lower(regexp_extract(regexp_extract(rest, '^([^/?#]*)', 1),
                             '^([^:]*)', 1)) AS host,
        regexp_extract(regexp_extract(rest, '^([^/?#]*)', 1),
                       ':([0-9]+)$', 1) AS port,
        regexp_extract(rest, '^[^/?#]*([^?#]*)', 1) AS path,
        array_to_string(list_sort(list_filter(string_split(query, '&'),
          p -> p <> '' AND NOT regexp_matches(
                 p, '^(utm_[^=]*|fbclid|gclid)='))), '&') AS qs
      FROM parts
    )
    SELECT doc_id,
      scheme || '://' || host
      || CASE WHEN port = '' OR (scheme = 'http' AND port = '80')
                   OR (scheme = 'https' AND port = '443') THEN ''
              ELSE ':' || port END
      || coalesce(nullif(regexp_replace(path, '/+$', ''), ''), '/')
      || CASE WHEN qs <> '' THEN '?' || qs ELSE '' END AS canonical
    FROM comps
    """)
def url_canonicalize(spark, sf_dir):
    """URL canonicalization (canonicalize_url) — the key-maker for
    URL-level dedup and domain aggregation: lowercase scheme/host,
    default-port strip, fragment drop, tracking-param removal
    (utm_*/fbclid/gclid), sorted query params, trailing-slash
    collapse. Planted messy URLs (mixed case, :443, utm noise,
    per-doc fragment) exercise every rule; the oracle replays the
    whole normalization with the same conservative regex classes.
    Map-only — canonical keys turn URL dedup into an exact groupBy."""
    from mmlspark_spark.llm import canonicalize_url

    docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 1000)
    planted = docs.select(
        "doc_id",
        F.concat(
            F.lit("HTTPS://Site"), (F.col("doc_id") % 10).cast("string"),
            F.lit(".Example.ORG:443/Path"),
            (F.col("doc_id") % 3).cast("string"),
            F.lit("/?b=2&utm_source=x&a=1&fbclid=zz#frag"),
            F.col("doc_id").cast("string"),
            # '?' INSIDE the fragment — must NOT resurrect as query
            F.lit("?x="), (F.col("doc_id") % 7).cast("string"),
        ).alias("u"))
    return planted.select(
        "doc_id", canonicalize_url("u").alias("canonical"))


def _ivf_cte(cent_ctes: str, nProbe: int, dim: int, nq: int = 5,
             corpus_where: str = "") -> str:
    """Shared IVF-replay WITH-fragment (the _bm25_cte pattern — ONE
    copy of the assignment/probe/candidate SQL so a tie-break or fold
    fix can never diverge between the IVF-family oracles).
    Expects an upstream CTE ``e(vec_id, v)``; ``cent_ctes`` must end
    in a CTE ``c(cell, cv)``; the fragment ends in ``cand(q_id, d_id,
    qv, dv)``: corpus top-1 cell / query top-nProbe cells by exact
    cosine with cell-ASC tie-break, candidates equi-joined on the
    cell. ``corpus_where`` (a predicate over ``d_id``) restricts the
    INDEXED corpus only — queries stay unrestricted — mirroring the
    filtered-index lanes (``knn_ivf_filtered``); cell assignment is
    per-vector, so filtering assignments equals assigning the
    filtered corpus."""
    from mmlspark_spark.plans.duckdb_xxh import cosine_sql

    cos = cosine_sql("e.v", "c.cv", dim)
    cw = f" WHERE {corpus_where}" if corpus_where else ""
    return f"""{cent_ctes}, dsim AS (
      SELECT e.vec_id AS d_id, e.v AS dv, c.cell, {cos} AS sim
      FROM e, c
    ), dass AS (
      SELECT d_id, dv, cell FROM (
        SELECT *, row_number() OVER (
          PARTITION BY d_id ORDER BY sim DESC, cell ASC) AS rk
        FROM dsim{cw}) WHERE rk = 1
    ), qass AS (
      SELECT q_id, qv, cell FROM (
        SELECT d_id AS q_id, dv AS qv, cell, row_number() OVER (
          PARTITION BY d_id ORDER BY sim DESC, cell ASC) AS rk
        FROM dsim WHERE d_id < {nq}) WHERE rk <= {nProbe}
    ), cand AS (
      SELECT DISTINCT q_id, d_id, qv, dv
      FROM dass JOIN qass USING (cell) WHERE q_id <> d_id
    )"""


def _ivf_topk_tail(dim: int, k: int) -> str:
    """The exact-cosine top-k over ``cand`` ending the IVF replays."""
    from mmlspark_spark.plans.duckdb_xxh import cosine_sql

    return f""", scored AS (
      SELECT q_id AS query_id, d_id AS neighbor_id,
             {cosine_sql("qv", "dv", dim)} AS sim
      FROM cand
    )
    SELECT query_id, neighbor_id, round(sim, 6) AS sim,
           CAST(rk AS INTEGER) AS rk
    FROM (SELECT *, row_number() OVER (
            PARTITION BY query_id
            ORDER BY sim DESC, neighbor_id) AS rk
          FROM scored)
    WHERE rk <= {k}
    """


def _knn_ivf_pretrained_oracle(nlist: int = 16, nProbe: int = 4,
                               k: int = 10, dim: int = 64,
                               corpus_where: str = "") -> str:
    """Replays the bring-your-own-quantizer IVF lane end-to-end: the
    centroid frame IS data (embeddings vec_id < nlist), assignment
    ranks cells by exact cosine with cell-ASC tie-break (corpus top-1,
    queries top-nProbe), candidates equi-join on the cell, and the
    final exact-cosine top-k window — every float computed with the
    same left-fold order as the Catalyst expressions (shared
    _ivf_cte/_ivf_topk_tail fragments over fold_sum/cosine_sql).
    ``corpus_where`` (a ``d_id`` predicate via the shared fragment)
    restricts the INDEXED corpus only — a survivor predicate replays
    both the tombstone mask and a post-compaction index, since cell
    assignment is per-vector (masking stored assignments == fresh
    index over survivors)."""
    cent = (f"""c AS (
      SELECT vec_id AS cell, v AS cv FROM e WHERE vec_id < {nlist}
    )""")
    return f"""
    WITH e AS (
      SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v
      FROM embeddings
    ), {_ivf_cte(cent, nProbe, dim, corpus_where=corpus_where)}{
        _ivf_topk_tail(dim, k)}"""


@register("knn_ivf_pretrained", oracle=_knn_ivf_pretrained_oracle())
def knn_ivf_pretrained(spark, sf_dir):
    """IVF search with a PRE-TRAINED coarse quantizer passed as a
    small broadcast (cell, vector) frame — the faiss-style production
    shape where the quantizer is trained once offline — via
    IVFKNN.search_with_centroids: pure-Catalyst cosine cell
    assignment (combinable max-struct for the corpus, window for the
    queries), cell equi-join, exact-cosine top-k. Fully replayed by
    the oracle (unlike knn_ivf's sampled numpy fit, which stays the
    rows-only scale lane)."""
    from mmlspark_spark.llm.similarity import IVFKNN

    emb = _t(spark, sf_dir, "embeddings")
    cent = emb.filter(F.col("vec_id") < 16).select(
        F.col("vec_id").alias("cell"), F.col("embedding").alias("cvec"))
    q = emb.filter(F.col("vec_id") < 5)
    out = IVFKNN(idCol="vec_id", vecCol="embedding", k=10,
                 nlist=16, nProbe=4).search_with_centroids(emb, q, cent)
    return out.select("query_id", "neighbor_id",
                      F.round("sim", 6).alias("sim"),
                      F.col("rank").alias("rk"))


@register("knn_ivf_appended", oracle=_knn_ivf_pretrained_oracle())
def knn_ivf_appended(spark, sf_dir):
    """The APPEND half of the CELL-PARTITIONED store geometry under
    the driver's hash gate (round 14 — completing the append matrix:
    bucket rows = minhash_match_appended, merged stats =
    bm25_search_appended, cell directories = this lane): even vectors
    index first (save_index), odd vectors append incrementally —
    appended vectors assign against the STORED centroids map-side and
    land as new files in their cell directories, the existing corpus
    never re-read — then the standard queries search the grown
    artifact. The oracle is the plain fresh-build replay over the
    full corpus (the quantizer is fixed at save time, the faiss
    operating model, so appended == fresh exactly)."""
    import os

    from mmlspark_spark.llm.similarity import IVFKNN

    emb = _t(spark, sf_dir, "embeddings")
    cent = emb.filter(F.col("vec_id") < 16).select(
        F.col("vec_id").alias("cell"), F.col("embedding").alias("cvec"))
    q = emb.filter(F.col("vec_id") < 5)
    ivf = IVFKNN(idCol="vec_id", vecCol="embedding", k=10,
                 nlist=16, nProbe=4)
    path = os.path.join(
        "/tmp/mmlspark_spark_idx",
        f"ivf_app_{os.path.basename(sf_dir.rstrip('/'))}")
    ivf.save_index(emb.filter(F.col("vec_id") % 2 == 0), cent, path)
    ivf.append_to_index(emb.filter(F.col("vec_id") % 2 == 1), path)
    out = ivf.search_with_index(ivf.load_index(spark, path), q)
    return out.select("query_id", "neighbor_id",
                      F.round("sim", 6).alias("sim"),
                      F.col("rank").alias("rk"))


@register("knn_ivf_ingested", oracle=_knn_ivf_pretrained_oracle())
def knn_ivf_ingested(spark, sf_dir):
    """The ANN STREAMING-INGEST TOPOLOGY under the driver's hash gate
    (round 16 — the vector sibling of bm25_search_ingested /
    minhash_screen_incremental / exact_match_incremental, completing
    the ingest-topology matrix): three deterministic micro-batches
    flow through ``ann_ingest_foreach_batch`` exactly as a
    ``writeStream.foreachBatch`` would deliver them — batch 0
    bootstraps the cell-partitioned IVF store with the
    bring-your-own quantizer (save_index; the quantizer is frozen at
    bootstrap, the faiss operating model), batches 1-2 append (new
    vectors assign against the STORED centroids map-side and land as
    new files in their cell directories, through the torn-append
    bracket per batch) — then the standard queries search the
    stream-built artifact. The oracle is the plain fresh-build
    replay over the full corpus: a hash match proves the
    stream-built index == a nightly batch build bit-for-bit, through
    the topology wrapper itself rather than direct append calls
    (which knn_ivf_appended gates). The artifact directory is
    removed up front so the bootstrap/append branch is deterministic
    across driver reruns."""
    import os

    from mmlspark_spark.llm.index_common import _hadoop_fs
    from mmlspark_spark.llm.similarity import IVFKNN
    from mmlspark_spark.streaming import ann_ingest_foreach_batch

    emb = _t(spark, sf_dir, "embeddings")
    cent = emb.filter(F.col("vec_id") < 16).select(
        F.col("vec_id").alias("cell"), F.col("embedding").alias("cvec"))
    q = emb.filter(F.col("vec_id") < 5)
    ivf = IVFKNN(idCol="vec_id", vecCol="embedding", k=10,
                 nlist=16, nProbe=4)
    path = os.path.join(
        "/tmp/mmlspark_spark_idx",
        f"ivf_ing_{os.path.basename(sf_dir.rstrip('/'))}")
    fs, P = _hadoop_fs(spark, path)
    fs.delete(P(path), True)
    ingest = ann_ingest_foreach_batch(ivf, path, centroids=cent)
    for b in range(3):
        ingest(emb.filter(F.col("vec_id") % 3 == b), b)
    out = ivf.search_with_index(ivf.load_index(spark, path), q)
    return out.select("query_id", "neighbor_id",
                      F.round("sim", 6).alias("sim"),
                      F.col("rank").alias("rk"))


def _ivf_stored_lane(spark, sf_dir, suffix: str, dead_mod: int,
                     compact: bool):
    """Shared body of the two stored-IVF delete lanes: save the
    cell-partitioned artifact, tombstone every ``dead_mod``-th
    vector, optionally COMPACT (physical rewrite of affected cell
    directories), then search the stored index. Tombstoned-vs-
    compacted must return identical rows — the tombstone lane proves
    the read-time mask, the compacted lane proves the physical
    rewrite, and both hash against the same survivor replay."""
    import os

    from mmlspark_spark.llm.similarity import IVFKNN

    emb = _t(spark, sf_dir, "embeddings")
    cent = emb.filter(F.col("vec_id") < 16).select(
        F.col("vec_id").alias("cell"), F.col("embedding").alias("cvec"))
    q = emb.filter(F.col("vec_id") < 5)
    ivf = IVFKNN(idCol="vec_id", vecCol="embedding", k=10,
                 nlist=16, nProbe=4)
    path = os.path.join(
        "/tmp/mmlspark_spark_idx",
        f"ivf_{suffix}_{os.path.basename(sf_dir.rstrip('/'))}")
    ivf.save_index(emb, cent, path)
    ivf.delete_from_index(
        emb.filter(F.col("vec_id") % dead_mod == 0).select("vec_id"),
        path)
    if compact:
        ivf.compact_index(spark, path)
    out = ivf.search_with_index(ivf.load_index(spark, path), q)
    return out.select("query_id", "neighbor_id",
                      F.round("sim", 6).alias("sim"),
                      F.col("rank").alias("rk"))


@register("knn_ivf_tombstoned", oracle=_knn_ivf_pretrained_oracle(
    corpus_where="NOT (d_id % 7 = 0)"))
def knn_ivf_tombstoned(spark, sf_dir):
    """The DELETE half of the stored-IVF lifecycle under the
    driver's hash gate (round 13 — the last index family whose
    tombstones were pytest-only): the whole corpus indexes into the
    cell-partitioned artifact, every 7th vector is tombstoned
    (metadata-only takedown — cell directories untouched), and
    search_with_index masks the dead ids at read time. Cell
    assignment is per-vector, so masking stored assignments equals a
    fresh index over the survivors — exactly what the oracle replays
    (the shared _ivf_cte with the survivor predicate on the indexed
    corpus; queries stay unrestricted). save_index clears stale
    tombstones on overwrite, so repeated driver runs are hermetic."""
    return _ivf_stored_lane(spark, sf_dir, "del", 7, compact=False)


@register("knn_ivf_compacted", oracle=_knn_ivf_pretrained_oracle(
    corpus_where="NOT (d_id % 6 = 0)"))
def knn_ivf_compacted(spark, sf_dir):
    """COMPACTION under the driver's hash gate (round 13 — until now
    compacted==fresh was pinned only in pytest): save → tombstone
    every 6th vector → compact_index (physically rewrites ONLY the
    cell directories containing a dead id, drops fully-dead cells,
    clears the tombstone set) → search the rewritten artifact. The
    oracle replays a fresh index over the survivors — a hash match
    proves the PHYSICAL rewrite preserves search results exactly,
    not just the read-time mask (its sibling knn_ivf_tombstoned, at
    a different dead set so neither lane can shadow the other)."""
    return _ivf_stored_lane(spark, sf_dir, "cmp", 6, compact=True)


def _knn_ivf_filtered_oracle(nlist: int = 16, nProbe: int = 4,
                             k: int = 10, dim: int = 64) -> str:
    """The pretrained-IVF replay with the corpus predicate pushed
    below assignment (corpus_where on the shared _ivf_cte fragment) —
    filtered-index semantics: the inverted lists hold only matching
    vectors, so top-k never under-fills from post-filtering."""
    cent = (f"""c AS (
      SELECT vec_id AS cell, v AS cv FROM e WHERE vec_id < {nlist}
    )""")
    return f"""
    WITH e AS (
      SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v
      FROM embeddings
    ), {_ivf_cte(cent, nProbe, dim, corpus_where="d_id >= 100")}{
        _ivf_topk_tail(dim, k)}"""


@register("knn_ivf_filtered", oracle=_knn_ivf_filtered_oracle())
def knn_ivf_filtered(spark, sf_dir):
    """FILTERED IVF — the metadata predicate (vec_id >= 100, a plain
    range) sits BELOW the cell assignment, so it pushes to the
    parquet scan and the inverted lists hold exactly the searchable
    subset — filtered-index semantics (the knn_sq8_filtered pattern;
    faiss IDSelector at build), never post-filtering, which silently
    returns < k rows. Cell assignment is per-vector, so filtering
    before assignment equals filtering a stored index's cell
    directories (the `where=` parameter on search_with_index —
    round-trip pinned in tests). Queries stay unrestricted."""
    from mmlspark_spark.llm.similarity import IVFKNN

    emb = _t(spark, sf_dir, "embeddings")
    cent = emb.filter(F.col("vec_id") < 16).select(
        F.col("vec_id").alias("cell"), F.col("embedding").alias("cvec"))
    q = emb.filter(F.col("vec_id") < 5)
    corpus = emb.filter(F.col("vec_id") >= 100)
    out = IVFKNN(idCol="vec_id", vecCol="embedding", k=10,
                 nlist=16, nProbe=4).search_with_centroids(
        corpus, q, cent)
    return out.select("query_id", "neighbor_id",
                      F.round("sim", 6).alias("sim"),
                      F.col("rank").alias("rk"))


def _ann_recall_oracle(nlist: int = 16, nProbe: int = 4, k: int = 10,
                       dim: int = 64, nq: int = 5) -> str:
    """Composes the two proven replays — the bring-your-own-quantizer
    IVF search (_knn_ivf_pretrained_oracle's CTEs) and the exact
    brute-force top-k — and counts the member-set overlap per query.
    Only membership reaches the output (hits, recall), so this checks
    that BOTH search pipelines produce identical candidate SETS on
    both engines, the property every recall claim in tests rests
    on."""
    from mmlspark_spark.plans.duckdb_xxh import cosine_sql

    def cos(a: str, b: str) -> str:
        return cosine_sql(a, b, dim)

    cent = (f"""c AS (
      SELECT vec_id AS cell, v AS cv FROM e WHERE vec_id < {nlist}
    )""")
    return f"""
    WITH e AS (
      SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v
      FROM embeddings
    ), {_ivf_cte(cent, nProbe, dim, nq)}, iv AS (
      SELECT q_id, d_id FROM (
        SELECT q_id, d_id, row_number() OVER (
          PARTITION BY q_id
          ORDER BY {cos("qv", "dv")} DESC, d_id) AS rk
        FROM cand) WHERE rk <= {k}
    ), bf AS (
      SELECT q_id, d_id FROM (
        SELECT q.vec_id AS q_id, d.vec_id AS d_id, row_number() OVER (
          PARTITION BY q.vec_id
          ORDER BY {cos("q.v", "d.v")} DESC, d.vec_id) AS rk
        FROM (SELECT * FROM e WHERE vec_id < {nq}) q, e d
        WHERE q.vec_id <> d.vec_id) WHERE rk <= {k}
    ), h AS (
      SELECT bf.q_id, CAST(count(iv.d_id) AS BIGINT) AS hits
      FROM bf LEFT JOIN iv ON bf.q_id = iv.q_id AND bf.d_id = iv.d_id
      GROUP BY bf.q_id
    )
    SELECT q_id AS query_id, hits,
           round(hits / {float(k)}, 6) AS recall
    FROM h
    """


@register("ann_recall", oracle=_ann_recall_oracle())
def ann_recall(spark, sf_dir):
    """Distributed recall@10 of the IVF lane against the exact
    brute-force baseline — the evaluation loop every production ANN
    deployment runs (tune nProbe until recall clears the bar), here
    as a single Spark job: both searches are pure Catalyst, the
    overlap is a semi-join + count per query, and the oracle replays
    BOTH pipelines so the member sets (not just the counts) are
    cross-engine-proven. Uses the pretrained quantizer shape
    (vec_id < 16 as cells) so recall is a pure function of the
    data."""
    from mmlspark_spark.llm.similarity import IVFKNN, BruteForceKNN

    emb = _t(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 5)
    cent = emb.filter(F.col("vec_id") < 16).select(
        F.col("vec_id").alias("cell"), F.col("embedding").alias("cvec"))
    approx = (IVFKNN(idCol="vec_id", vecCol="embedding", k=10,
                     nlist=16, nProbe=4)
              .search_with_centroids(emb, q, cent)
              .select("query_id", "neighbor_id"))
    exact = (BruteForceKNN(idCol="vec_id", vecCol="embedding", k=10)
             .search(emb, q).select("query_id", "neighbor_id"))
    hits = (exact.join(approx, ["query_id", "neighbor_id"], "left_semi")
            .groupBy("query_id").agg(F.count("*").alias("hits")))
    return (exact.select("query_id").distinct()
            .join(hits, "query_id", "left")
            .select("query_id",
                    F.coalesce("hits", F.lit(0)).cast("bigint")
                    .alias("hits"),
                    F.round(F.coalesce("hits", F.lit(0)) / F.lit(10.0), 6)
                    .alias("recall")))


def _phrase_oracle(plen: int = 4, k: int = 10,
                   pids: str = "3, 47, 101") -> str:
    """Replays phrase_search end-to-end: positional postings (0-based
    offsets via the range/struct unnest), phrase slots from the same
    pinned tokenizer, all-slots-found gate (m = n), and the shifted
    intersection ``|∩_i (positions_i − i)|`` — integer set math, no
    float channel at all."""
    return f"""
    WITH t AS (
      SELECT doc_id, list_filter(
               string_split_regex(text, '[ \\t\\n\\r]+'),
               x -> x <> '') AS tk
      FROM documents WHERE text IS NOT NULL
    ), post AS (
      SELECT doc_id, u.term, u.pos FROM (
        SELECT doc_id, unnest(list_transform(range(len(tk)),
                 i -> struct_pack(pos := i, term := tk[i + 1]))) AS u
        FROM t)
    ), postl AS (
      SELECT term, doc_id, list(pos ORDER BY pos) AS ps
      FROM post GROUP BY term, doc_id
    ), ph AS (
      SELECT doc_id AS pid, tk[1:{plen}] AS ptk FROM t
      WHERE doc_id IN ({pids})
    ), pterms AS (
      SELECT pid, u.i, u.term FROM (
        SELECT pid, unnest(list_transform(range(len(ptk)),
                 i -> struct_pack(i := i, term := ptk[i + 1]))) AS u
        FROM ph)
    ), n AS (
      SELECT pid, count(*) AS n FROM pterms GROUP BY pid
    ), hits AS (
      SELECT p.pid, p.i, pl.doc_id, pl.ps
      FROM pterms p JOIN postl pl ON pl.term = p.term
    ), per AS (
      SELECT pid, doc_id, count(*) AS m,
             list(struct_pack(i := i, ps := ps) ORDER BY i) AS slots
      FROM hits GROUP BY pid, doc_id
    ), tf AS (
      SELECT pid, doc_id,
             CAST(len(list_reduce(
               list_transform(slots,
                 s -> list_transform(s.ps, p -> p - s.i)),
               (a2, b2) -> list_intersect(a2, b2))) AS BIGINT)
               AS phrase_tf
      FROM per JOIN n USING (pid) WHERE m = n
    )
    SELECT pid AS query_id, doc_id, phrase_tf,
           CAST(rk AS INTEGER) AS rank
    FROM (SELECT *, row_number() OVER (
            PARTITION BY pid
            ORDER BY phrase_tf DESC, doc_id) AS rk
          FROM tf WHERE phrase_tf > 0)
    WHERE rk <= {k}
    """


@register("bm25_phrase_search", oracle=_phrase_oracle())
def bm25_phrase_search(spark, sf_dir):
    """Exact-phrase retrieval over positional postings
    (BM25Retriever.phrase_search) — the decontamination-audit
    primitive: which documents contain these 4 tokens VERBATIM and
    consecutively. Phrases are the first 4 tokens of docs 3/47/101
    (derived identically on both engines), so the source doc is a
    guaranteed hit at offset 0 and any true n-gram collision
    elsewhere in the corpus must appear on BOTH sides. The match
    count is the shifted-positions intersection — pure integer set
    math, broadcast phrase slots onto the term-keyed postings
    exchange, no corpus scan."""
    from mmlspark_spark.functions.text_quality import pinned_tokens
    from mmlspark_spark.llm import BM25Retriever

    docs = _t(spark, sf_dir, "documents")
    phrases = (docs.filter(F.col("doc_id").isin(3, 47, 101))
               .select(F.col("doc_id").alias("query_id"),
                       F.array_join(
                           F.slice(pinned_tokens("text"), 1, 4), " ")
                       .alias("query")))
    return BM25Retriever(k=10).phrase_search(docs, phrases)


@register("bm25_phrase_indexed", oracle=_phrase_oracle(
    plen=3, k=10, pids="5, 64, 202"))
def bm25_phrase_indexed(spark, sf_dir):
    """Exact-phrase retrieval FROM A PERSISTED INDEX — the production
    decontamination-audit loop: save_index(positions=True) writes the
    positional postings (term-clustered parquet, Lucene's PhraseQuery
    layout) once, then phrase_search_with_index answers every audit
    from the artifact without re-tokenizing the corpus. Results are
    identical to the from-docs lane by construction (positions are
    deterministic integers); this lane uses different phrases (first
    3 tokens of docs 5/64/202) so its driver hash is an independent
    check, not a copy of bm25_phrase_search's."""
    import os

    from mmlspark_spark.functions.text_quality import pinned_tokens
    from mmlspark_spark.llm import BM25Retriever

    docs = _t(spark, sf_dir, "documents")
    phrases = (docs.filter(F.col("doc_id").isin(5, 64, 202))
               .select(F.col("doc_id").alias("query_id"),
                       F.array_join(
                           F.slice(pinned_tokens("text"), 1, 3), " ")
                       .alias("query")))
    bm = BM25Retriever(k=10)
    path = os.path.join("/tmp/mmlspark_spark_idx",
                        f"bm25_phrase_{os.path.basename(sf_dir.rstrip('/'))}")
    bm.save_index(docs, path, positions=True)
    return bm.phrase_search_with_index(bm.load_index(spark, path),
                                       phrases)


def _bm25_cte(k1: float = 1.2, b: float = 0.75,
              qids: str = "3, 47, 101", qlen: int = 6,
              dead: str | None = None,
              corpus_where: str | None = None) -> str:
    """Shared BM25 WITH-fragment ending in CTE ``bm(query_id, doc_id,
    score, rnk)`` — used by BOTH bm25_search and hybrid_rrf so the
    idf/tf formula replay cannot drift between them. Every double op
    mirrors retrieval.BM25Retriever operation-for-operation; the
    per-(query, doc) fold runs in term-sorted order (list ORDER BY
    term + left fold) exactly like the Spark array_sort fold.
    ``dead`` (a doc_id predicate) replays a pending TOMBSTONE set
    under the Lucene deleted-docs model: masked docs never score
    (filtered out of the hits), but df / N / avgdl still count them
    until compaction — exactly search_with_index's read-time mask.
    ``corpus_where`` instead restricts the CORPUS itself (the ``t``
    tokenize CTE), so df / N / avgdl recompute over the survivors —
    the post-COMPACTION replay (compact_index's fresh-over-survivors
    contract). The query docs (``qids``) must satisfy it: queries
    tokenize from ``t`` in this replay, while the production lane
    builds them from the raw table."""
    dead_where = (f"WHERE NOT ({dead.replace('doc_id', 'p.doc_id')})"
                  if dead else "")
    cw = f" AND ({corpus_where})" if corpus_where else ""
    return f"""t AS (
      SELECT doc_id, list_filter(
               string_split_regex(text, '[ \\t\\n\\r]+'),
               x -> x <> '') AS tk
      FROM documents WHERE text IS NOT NULL{cw}
    ), post AS (
      SELECT doc_id, dl, w AS term, CAST(count(*) AS BIGINT) AS tf
      FROM (SELECT doc_id, len(tk) AS dl, unnest(tk) AS w FROM t)
      GROUP BY doc_id, dl, w
    ), dfq AS (
      SELECT term, CAST(count(*) AS BIGINT) AS df FROM post
      GROUP BY term
    ), st AS (
      SELECT CAST(count(*) AS BIGINT) AS nn,
             CAST(sum(len(tk)) AS DOUBLE) / count(*) AS avgdl
      FROM t
    ), qterms AS (
      SELECT DISTINCT doc_id AS qid, unnest(tk[1:{qlen}]) AS term
      FROM t WHERE doc_id IN ({qids})
    ), hits AS (
      SELECT q.qid, p.doc_id, p.term,
             ln(1.0 + (st.nn - d.df + 0.5) / (d.df + 0.5))
             * (p.tf * {k1 + 1.0})
             / (p.tf + {k1} * (1.0 - {b}
                               + {b} * (CAST(p.dl AS DOUBLE)
                                        / st.avgdl))) AS part
      FROM qterms q JOIN post p USING (term)
      JOIN dfq d ON d.term = p.term CROSS JOIN st
      {dead_where}
    ), bm AS (
      SELECT qid AS query_id, doc_id, score,
             row_number() OVER (
               PARTITION BY qid ORDER BY score DESC, doc_id) AS rnk
      FROM (SELECT qid, doc_id,
                   round(list_reduce(
                     list_prepend(0.0::DOUBLE,
                                  list(part ORDER BY term)),
                     (a2, b2) -> a2 + b2), 6) AS score
            FROM hits GROUP BY qid, doc_id)
    )"""


def _bm25_oracle(k: int = 10) -> str:
    return f"""
    WITH {_bm25_cte()}
    SELECT query_id, doc_id, score, CAST(rnk AS INTEGER) AS rk
    FROM bm WHERE rnk <= {k}
    """


@register("bm25_search", oracle=_bm25_oracle())
def bm25_search(spark, sf_dir):
    """Okapi BM25 retrieval (BM25Retriever): queries are the first 6
    tokens of docs 3/47/101, searched against the whole corpus. The
    inverted index is one explode + groupBy(term, doc); document
    frequency shares the postings' term key (one exchange); the tiny
    query-term frame broadcasts onto it; N/avgdl ride a one-row
    broadcast. Per-(query, doc) contributions fold in term-sorted
    order — never an unordered float SUM — so the Lucene-variant idf
    and tf saturation replay hash-exact; scores round to 6dp before
    the top-10 rank."""
    from mmlspark_spark.llm.retrieval import BM25Retriever

    docs = _t(spark, sf_dir, "documents")
    out = BM25Retriever(k=10).search(docs, _bm25_queries(docs))
    return out.select("query_id", "doc_id", "score",
                      F.col("rank").alias("rk"))


@register("bm25_search_tombstoned", oracle=f"""
    WITH {_bm25_cte(dead="doc_id % 7 = 0")}
    SELECT query_id, doc_id, score, CAST(rnk AS INTEGER) AS rk
    FROM bm WHERE rnk <= 10
    """)
def bm25_search_tombstoned(spark, sf_dir):
    """BM25 search from a stored index with PENDING tombstones under
    the driver's hash gate (round 12): the whole corpus indexes once,
    every 7th doc is tombstoned (takedown — metadata-only), and
    search_with_index masks them at read time under the Lucene
    deleted-docs model: masked docs never surface, but df / N / avgdl
    still count them until compaction — which is exactly what the
    oracle replays (the shared _bm25_cte fold with dead docs filtered
    from the hits, stats over the full index). save_index clears
    stale tombstones on overwrite, so repeated driver runs are
    hermetic."""
    import os

    from mmlspark_spark.llm.retrieval import BM25Retriever

    docs = _t(spark, sf_dir, "documents")
    bm = BM25Retriever(k=10)
    path = os.path.join(
        "/tmp/mmlspark_spark_idx",
        f"bm25_del_{os.path.basename(sf_dir.rstrip('/'))}")
    bm.save_index(docs, path)
    bm.delete_from_index(
        docs.filter(F.col("doc_id") % 7 == 0).select("doc_id"), path)
    out = bm.search_with_index(bm.load_index(spark, path),
                               _bm25_queries(docs))
    return out.select("query_id", "doc_id", "score",
                      F.col("rank").alias("rk"))


@register("bm25_search_appended", oracle=_bm25_oracle())
def bm25_search_appended(spark, sf_dir):
    """The APPEND half of the BM25 lifecycle under the driver's hash
    gate (round 14; round 15 re-gates the delta-sized refresh):
    even docs index first (save_index), odd docs append incrementally
    — appended docs tokenize ALONE, their per-term doc counts
    full-outer-merge into the stored dfreq (integer addition,
    O(batch + vocabulary) — the append never re-reads the postings
    store), and the one-row stats extend over the exact stored token
    sum — then the standard queries search the grown artifact. The
    oracle is the plain fresh-build replay over the full corpus, so a
    hash match proves incrementally built == batch-built bit-for-bit
    through the driver (previously pinned only in the streaming
    pytest)."""
    import os

    from mmlspark_spark.llm.retrieval import BM25Retriever

    docs = _t(spark, sf_dir, "documents")
    bm = BM25Retriever(k=10)
    path = os.path.join(
        "/tmp/mmlspark_spark_idx",
        f"bm25_app_{os.path.basename(sf_dir.rstrip('/'))}")
    bm.save_index(docs.filter(F.col("doc_id") % 2 == 0), path)
    bm.append_to_index(docs.filter(F.col("doc_id") % 2 == 1), path)
    out = bm.search_with_index(bm.load_index(spark, path),
                               _bm25_queries(docs))
    return out.select("query_id", "doc_id", "score",
                      F.col("rank").alias("rk"))


@register("bm25_search_ingested", oracle=_bm25_oracle())
def bm25_search_ingested(spark, sf_dir):
    """The BM25 STREAMING-INGEST TOPOLOGY under the driver's hash
    gate (round 15 — the bm25 sibling of exact_match_incremental):
    three deterministic micro-batches flow through
    ``bm25_ingest_foreach_batch`` exactly as a
    ``writeStream.foreachBatch`` would deliver them — batch 0
    bootstraps the index (save_index), batches 1 and 2 append through
    the delta-sized dfreq merge (per-term doc counts of the batch
    full-outer-merged into the stored vocabulary, O(batch + vocab),
    never an index re-scan) — then the standard queries search the
    stream-built artifact. The oracle is the plain fresh-build replay
    over the full corpus: a hash match proves the stream-built index
    == a nightly batch build bit-for-bit, through the topology wrapper
    itself rather than direct append_to_index calls (which
    bm25_search_appended gates). The artifact directory is removed
    up front so the bootstrap/append branch is deterministic across
    driver reruns."""
    import os

    from mmlspark_spark.llm.index_common import _hadoop_fs
    from mmlspark_spark.llm.retrieval import BM25Retriever
    from mmlspark_spark.streaming import bm25_ingest_foreach_batch

    docs = _t(spark, sf_dir, "documents")
    bm = BM25Retriever(k=10)
    path = os.path.join(
        "/tmp/mmlspark_spark_idx",
        f"bm25_ing_{os.path.basename(sf_dir.rstrip('/'))}")
    fs, P = _hadoop_fs(spark, path)
    fs.delete(P(path), True)
    ingest = bm25_ingest_foreach_batch(bm, path)
    for b in range(3):
        ingest(docs.filter(F.col("doc_id") % 3 == b), b)
    out = bm.search_with_index(bm.load_index(spark, path),
                               _bm25_queries(docs))
    return out.select("query_id", "doc_id", "score",
                      F.col("rank").alias("rk"))


@register("bm25_search_compacted", oracle=f"""
    WITH {_bm25_cte(corpus_where="NOT (doc_id % 7 = 0)")}
    SELECT query_id, doc_id, score, CAST(rnk AS INTEGER) AS rk
    FROM bm WHERE rnk <= 10
    """)
def bm25_search_compacted(spark, sf_dir):
    """COMPACTION of the flat-store geometry under the driver's hash
    gate (round 13 — its cell-partitioned sibling is
    knn_ivf_compacted): save → tombstone every 7th doc →
    compact_index (postings/doclens rewritten via staging+rename,
    df re-aggregated from the compacted postings, the one-row stats
    subtract the dead docs' exact (count, Σdl) off the stored
    integers) → search the rewritten artifact. The oracle replays a
    FRESH build over the survivors — df / N / avgdl over the
    surviving corpus, unlike bm25_search_tombstoned's Lucene
    deleted-docs stats — so a hash match proves compacted ==
    fresh-over-survivors bit-for-bit through the driver, not just
    pytest. Query docs 3/47/101 are not ≡0 (mod 7), so the replay's
    query tokenization is unaffected by the survivor cut."""
    import os

    from mmlspark_spark.llm.retrieval import BM25Retriever

    docs = _t(spark, sf_dir, "documents")
    bm = BM25Retriever(k=10)
    path = os.path.join(
        "/tmp/mmlspark_spark_idx",
        f"bm25_cmp_{os.path.basename(sf_dir.rstrip('/'))}")
    bm.save_index(docs, path)
    bm.delete_from_index(
        docs.filter(F.col("doc_id") % 7 == 0).select("doc_id"), path)
    bm.compact_index(spark, path)
    out = bm.search_with_index(bm.load_index(spark, path),
                               _bm25_queries(docs))
    return out.select("query_id", "doc_id", "score",
                      F.col("rank").alias("rk"))


def _bm25_queries(docs):
    from mmlspark_spark.functions.text_quality import pinned_tokens

    return (docs.filter(F.col("doc_id").isin(3, 47, 101))
            .select(F.col("doc_id").alias("query_id"),
                    F.array_join(F.slice(pinned_tokens("text"), 1, 6),
                                 " ").alias("query")))


def _hybrid_rrf_oracle(k: int = 10, rrf_k: float = 60.0) -> str:
    return f"""
    WITH {_bm25_cte()}, dn AS (
      SELECT query_id, doc_id, rnk FROM (
        SELECT q.vec_id AS query_id, d.vec_id AS doc_id,
               row_number() OVER (
                 PARTITION BY q.vec_id
                 ORDER BY list_cosine_similarity(
                   q.embedding::DOUBLE[], d.embedding::DOUBLE[]) DESC,
                 d.vec_id) AS rnk
        FROM embeddings q JOIN embeddings d
          ON q.vec_id IN (3, 47, 101) AND d.vec_id <> q.vec_id)
      WHERE rnk <= {k}
    ), fused AS (
      SELECT COALESCE(b.query_id, d.query_id) AS query_id,
             COALESCE(b.doc_id, d.doc_id) AS doc_id,
             round(0.0 + COALESCE(1.0 / ({rrf_k} + b.rnk), 0.0)
                       + COALESCE(1.0 / ({rrf_k} + d.rnk), 0.0), 6)
               AS rrf_score
      FROM (SELECT query_id, doc_id, rnk FROM bm WHERE rnk <= {k}) b
      FULL OUTER JOIN dn d
        ON b.query_id = d.query_id AND b.doc_id = d.doc_id
    )
    SELECT query_id, doc_id, rrf_score, CAST(rnk2 AS INTEGER) AS rk
    FROM (SELECT query_id, doc_id, rrf_score,
                 row_number() OVER (
                   PARTITION BY query_id
                   ORDER BY rrf_score DESC, doc_id) AS rnk2
          FROM fused)
    WHERE rnk2 <= {k}
    """


@register("hybrid_rrf_indexed", oracle=_hybrid_rrf_oracle())
def hybrid_rrf_indexed(spark, sf_dir):
    """The COMPOSED serving path from persisted artifacts under the
    driver's hash gate (round 14): both retrieval legs answer from
    stored indexes — BM25 from the parquet postings artifact
    (save_index → search_with_index) and dense cosine from the
    cell-partitioned IVF artifact probed with nProbe == nlist (every
    cell read → EXACT top-k; the stored-layout cost model, the
    in-memory ranking semantics) — then reciprocal rank fusion joins
    the two already-top-k frames. The oracle is the SAME replay as
    the in-memory hybrid_rrf lane: a hash match proves the entire
    retrieval stack (index build, stored search, fusion) returns
    bit-identical rankings from artifacts as from memory."""
    import os

    from mmlspark_spark.llm.retrieval import (
        BM25Retriever,
        reciprocal_rank_fusion,
    )
    from mmlspark_spark.llm.similarity import IVFKNN

    docs = _t(spark, sf_dir, "documents")
    bm = BM25Retriever(k=10)
    bpath = os.path.join(
        "/tmp/mmlspark_spark_idx",
        f"bm25_hyb_{os.path.basename(sf_dir.rstrip('/'))}")
    bm.save_index(docs, bpath)
    bmr = (bm.search_with_index(bm.load_index(spark, bpath),
                                _bm25_queries(docs))
           .select("query_id", "doc_id", "rank"))

    emb = _t(spark, sf_dir, "embeddings")
    cent = emb.filter(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("cell"),
        F.col("embedding").alias("cvec"))
    ivf = IVFKNN(idCol="vec_id", vecCol="embedding", k=10,
                 nlist=4, nProbe=4)
    vpath = os.path.join(
        "/tmp/mmlspark_spark_idx",
        f"ivf_hyb_{os.path.basename(sf_dir.rstrip('/'))}")
    ivf.save_index(emb, cent, vpath)
    q = emb.filter(F.col("vec_id").isin(3, 47, 101))
    dn = (ivf.search_with_index(ivf.load_index(spark, vpath), q)
          .select("query_id", F.col("neighbor_id").alias("doc_id"),
                  "rank"))
    fused = reciprocal_rank_fusion([bmr, dn], k=60, topK=10)
    return fused.select("query_id", "doc_id", "rrf_score",
                        F.col("rank").alias("rk"))


@register("hybrid_rrf", oracle=_hybrid_rrf_oracle())
def hybrid_rrf(spark, sf_dir):
    """Hybrid retrieval: BM25 (sparse, documents) and exact cosine
    (dense, embeddings) top-10 lists for queries 3/47/101, combined
    by reciprocal rank fusion — score = 1/(60+rank_bm25) +
    1/(60+rank_dense), sources added in list order, docs absent from
    a source contributing 0 (Cormack et al. 2009; rank-only fusion
    needs no cross-retriever score normalization). The fusion joins
    two already-top-k frames, so it is small however large the
    corpus; both source rankings and the fused scores replay
    hash-exact."""
    from mmlspark_spark.llm import BruteForceKNN
    from mmlspark_spark.llm.retrieval import (
        BM25Retriever,
        reciprocal_rank_fusion,
    )

    docs = _t(spark, sf_dir, "documents")
    bm = (BM25Retriever(k=10).search(docs, _bm25_queries(docs))
          .select("query_id", "doc_id", "rank"))
    emb = _t(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id").isin(3, 47, 101))
    dn = (BruteForceKNN(idCol="vec_id", vecCol="embedding", k=10,
                        method="expr").search(emb, q)
          .select("query_id", F.col("neighbor_id").alias("doc_id"),
                  "rank"))
    fused = reciprocal_rank_fusion([bm, dn], k=60, topK=10)
    return fused.select("query_id", "doc_id", "rrf_score",
                        F.col("rank").alias("rk"))


def _knn_pq_oracle(M: int = 8, K: int = 16, ds: int = 8, k: int = 10,
                   nq: int = 5) -> str:
    """Replays the full PQ/ADC pipeline (PQKNN.search_with_codebooks):
    codebook synthesis (subvector m of embedding m·K+c), per-subspace
    squared-L2 encoding with the direct (x−c)² left fold and
    first-min argmin, the per-query LUT, the m-ascending ADC fold,
    and the distance-ASC top-k window — every double in the same
    operation order as the Catalyst expressions."""
    from mmlspark_spark.plans.duckdb_xxh import fold_sum

    dd = fold_sum("(sub[i2] - cvec[i2]) * (sub[i2] - cvec[i2])", ds)
    return f"""
    WITH e AS (
      SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v
      FROM embeddings
    ), cb AS (
      SELECT vec_id // {K} AS m, vec_id % {K} AS code,
             v[(vec_id // {K}) * {ds} + 1 : (vec_id // {K}) * {ds} + {ds}]
               AS cvec
      FROM e WHERE vec_id < {M * K}
    ), dists AS (
      SELECT vec_id, m, code, {dd} AS dd
      FROM (SELECT e.vec_id, cb.m, cb.code,
                   e.v[cb.m * {ds} + 1 : cb.m * {ds} + {ds}] AS sub,
                   cb.cvec
            FROM e, cb)
    ), codes AS (
      SELECT vec_id, m,
             list_position(l, list_aggregate(l, 'min')) - 1 AS code
      FROM (SELECT vec_id, m, list(dd ORDER BY code) AS l
            FROM dists GROUP BY vec_id, m)
    ), adc AS (
      SELECT q_id, d_id,
             list_reduce(list_prepend(0.0::DOUBLE,
                                      list(val ORDER BY m)),
                         (a2, b2) -> a2 + b2) AS adc
      FROM (SELECT qd.vec_id AS q_id, dc.vec_id AS d_id, dc.m AS m,
                   qd.dd AS val
            FROM codes dc JOIN dists qd
              ON qd.m = dc.m AND qd.code = dc.code
            WHERE qd.vec_id < {nq} AND qd.vec_id <> dc.vec_id)
      GROUP BY q_id, d_id
    )
    SELECT query_id, neighbor_id, round(adc, 6) AS adc,
           CAST(rk AS INTEGER) AS rk
    FROM (SELECT q_id AS query_id, d_id AS neighbor_id, adc,
                 row_number() OVER (
                   PARTITION BY q_id
                   ORDER BY adc ASC, d_id ASC) AS rk
          FROM adc)
    WHERE rk <= {k}
    """


@register("knn_pq_adc", oracle=_knn_pq_oracle())
def knn_pq_adc(spark, sf_dir):
    """Product-quantization ANN (PQKNN.search_with_codebooks): 64-dim
    embeddings compressed to 8 subspace codes against a pre-trained
    (m, code, cvec) codebook frame (subvector m of embeddings
    m·16+c), then ADC top-10 for 5 queries — per-query 8×16 exact
    LUT, candidates scored with 8 lookups instead of 64 multiplies.
    Codebooks broadcast as one aggregated row; encoding is map-only;
    the scan is a broadcast cross join collapsed by the top-k window.
    Fully replayed by the oracle (squared-L2 folds, first-min argmin,
    m-ascending ADC fold all order-pinned); the sampled-fit lane
    (fit_codebooks) stays rows-only like knn_ivf's."""
    from mmlspark_spark.llm.similarity import PQKNN

    emb = (_t(spark, sf_dir, "embeddings")
           .select("vec_id",
                   F.col("embedding").cast("array<double>")
                   .alias("embedding")))
    cb = (emb.filter(F.col("vec_id") < 128)
          .select(F.expr("vec_id div 16").cast("int").alias("m"),
                  (F.col("vec_id") % 16).cast("int").alias("code"),
                  F.slice("embedding",
                          F.expr("(vec_id div 16) * 8 + 1").cast("int"),
                          8).alias("cvec")))
    q = emb.filter(F.col("vec_id") < 5)
    out = PQKNN(idCol="vec_id", vecCol="embedding", k=10, M=8, K=16,
                dim=64).search_with_codebooks(emb, q, cb)
    return out.select("query_id", "neighbor_id",
                      F.round("adc_dist", 6).alias("adc"),
                      F.col("rank").alias("rk"))


def _knn_ivfpq_oracle(M: int = 8, K: int = 16, ds: int = 8,
                      dim: int = 64, nlist: int = 8, nProbe: int = 3,
                      k: int = 10, nq: int = 5) -> str:
    """Replays PQKNN.search_ivfpq (IVFADC) end-to-end: squared-L2
    coarse assignment with cell-ASC tie-break (corpus argmin, query
    top-nProbe), residual computation, residual PQ encoding against
    the shared codebooks, the per-(query, cell) residual LUT, the
    m-ascending ADC fold, and the distance-ASC top-k — all folds in
    the exact Catalyst element order."""
    from mmlspark_spark.plans.duckdb_xxh import fold_sum

    l2 = fold_sum("(e.v[i2] - c.cv[i2]) * (e.v[i2] - c.cv[i2])", dim)
    sub2 = fold_sum("(sub[i2] - cvec[i2]) * (sub[i2] - cvec[i2])", ds)
    return f"""
    WITH e AS (
      SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v
      FROM embeddings
    ), c AS (
      SELECT vec_id - 200 AS cell, v AS cv FROM e
      WHERE vec_id BETWEEN 200 AND {200 + nlist - 1}
    ), cb AS (
      SELECT vec_id // {K} AS m, vec_id % {K} AS code,
             v[(vec_id // {K}) * {ds} + 1 : (vec_id // {K}) * {ds} + {ds}]
               AS cvec
      FROM e WHERE vec_id < {M * K}
    ), dd AS (
      SELECT e.vec_id AS d_id, c.cell, {l2} AS d2,
             list_transform(range(1, {dim + 1}),
                            i9 -> e.v[i9] - c.cv[i9]) AS res
      FROM e, c
    ), dass AS (
      SELECT d_id, cell, res FROM (
        SELECT *, row_number() OVER (
          PARTITION BY d_id ORDER BY d2 ASC, cell ASC) AS rk
        FROM dd) WHERE rk = 1
    ), ddist AS (
      SELECT d_id, cell, m, code, {sub2} AS dv
      FROM (SELECT a.d_id, a.cell, b.m, b.code,
                   a.res[b.m * {ds} + 1 : b.m * {ds} + {ds}] AS sub,
                   b.cvec
            FROM dass a, cb b)
    ), dcode AS (
      SELECT d_id, cell, m,
             list_position(l, list_aggregate(l, 'min')) - 1 AS code
      FROM (SELECT d_id, cell, m, list(dv ORDER BY code) AS l
            FROM ddist GROUP BY d_id, cell, m)
    ), qass AS (
      SELECT d_id AS q_id, cell, res FROM (
        SELECT *, row_number() OVER (
          PARTITION BY d_id ORDER BY d2 ASC, cell ASC) AS rk
        FROM dd WHERE d_id < {nq}) WHERE rk <= {nProbe}
    ), qdist AS (
      SELECT q_id, cell, m, code, {sub2} AS dv
      FROM (SELECT a.q_id, a.cell, b.m, b.code,
                   a.res[b.m * {ds} + 1 : b.m * {ds} + {ds}] AS sub,
                   b.cvec
            FROM qass a, cb b)
    ), adc AS (
      SELECT q_id, d_id,
             list_reduce(list_prepend(0.0::DOUBLE,
                                      list(val ORDER BY m)),
                         (a2, b2) -> a2 + b2) AS adc
      FROM (SELECT qd.q_id, dc.d_id, dc.m, qd.dv AS val
            FROM dcode dc JOIN qdist qd
              ON qd.cell = dc.cell AND qd.m = dc.m
             AND qd.code = dc.code
            WHERE qd.q_id <> dc.d_id)
      GROUP BY q_id, d_id
    )
    SELECT query_id, neighbor_id, round(adc, 6) AS adc,
           CAST(rk AS INTEGER) AS rk
    FROM (SELECT q_id AS query_id, d_id AS neighbor_id, adc,
                 row_number() OVER (
                   PARTITION BY q_id
                   ORDER BY adc ASC, d_id ASC) AS rk
          FROM adc)
    WHERE rk <= {k}
    """


@register("knn_ivfpq", oracle=_knn_ivfpq_oracle())
def knn_ivfpq(spark, sf_dir):
    """IVFADC (PQKNN.search_ivfpq) — the composed billion-scale ANN
    recipe: 8 pre-trained coarse cells (embeddings 200..207), corpus
    residuals PQ-encoded against the shared 8×16 codebooks, queries
    probing their 3 nearest cells with per-(query, cell) residual
    LUTs, candidates meeting on a cell equi-join and scoring with 8
    lookups each. Corpus assignment is a map-side ×8 broadcast
    expansion collapsed by a combinable max-struct aggregate (one
    shuffled row per vector); nothing scans the corpus per query.
    Fully replayed by the oracle — coarse L2 folds, residuals,
    argmin codes, ADC folds, top-k all order-pinned."""
    from mmlspark_spark.llm.similarity import PQKNN

    emb = (_t(spark, sf_dir, "embeddings")
           .select("vec_id",
                   F.col("embedding").cast("array<double>")
                   .alias("embedding")))
    cents = (emb.filter(F.col("vec_id").between(200, 207))
             .select((F.col("vec_id") - 200).alias("cell"),
                     F.col("embedding").alias("cvec")))
    cbooks = (emb.filter(F.col("vec_id") < 128)
              .select(F.expr("vec_id div 16").cast("int").alias("m"),
                      (F.col("vec_id") % 16).cast("int").alias("code"),
                      F.slice("embedding",
                              F.expr("(vec_id div 16) * 8 + 1")
                              .cast("int"), 8).alias("cvec")))
    q = emb.filter(F.col("vec_id") < 5)
    out = PQKNN(idCol="vec_id", vecCol="embedding", k=10, M=8, K=16,
                dim=64).search_ivfpq(emb, q, cents, cbooks, nProbe=3)
    return out.select("query_id", "neighbor_id",
                      F.round("adc_dist", 6).alias("adc"),
                      F.col("rank").alias("rk"))


@register("knn_ivfpq_indexed", oracle=_knn_ivfpq_oracle(nProbe=2, nq=8))
def knn_ivfpq_indexed(spark, sf_dir):
    """IVFADC FROM A PERSISTED COMPOSED INDEX — the production
    big-corpus lifecycle: save_ivfpq_index writes coarse centroids +
    residual codebooks + cell-partitioned PQ codes as ONE
    manifest-pinned artifact, then search_ivfpq_with_index probes it —
    only the query-side cell ranking and residual LUTs compute fresh;
    the corpus side is the stored code table (M ints per vector, read
    cell-pruned). Same quantizers as knn_ivfpq but different queries
    (vec_id < 8) and nProbe=2, so the driver hash is an independent
    check of the stored-artifact path, not a copy."""
    import os

    from mmlspark_spark.llm.similarity import PQKNN

    emb = (_t(spark, sf_dir, "embeddings")
           .select("vec_id",
                   F.col("embedding").cast("array<double>")
                   .alias("embedding")))
    cents = (emb.filter(F.col("vec_id").between(200, 207))
             .select((F.col("vec_id") - 200).alias("cell"),
                     F.col("embedding").alias("cvec")))
    cbooks = (emb.filter(F.col("vec_id") < 128)
              .select(F.expr("vec_id div 16").cast("int").alias("m"),
                      (F.col("vec_id") % 16).cast("int").alias("code"),
                      F.slice("embedding",
                              F.expr("(vec_id div 16) * 8 + 1")
                              .cast("int"), 8).alias("cvec")))
    q = emb.filter(F.col("vec_id") < 8)
    pq = PQKNN(idCol="vec_id", vecCol="embedding", k=10, M=8, K=16,
               dim=64)
    path = os.path.join(
        "/tmp/mmlspark_spark_idx",
        f"ivfpq_{os.path.basename(sf_dir.rstrip('/'))}")
    pq.save_ivfpq_index(emb, cents, cbooks, path)
    out = pq.search_ivfpq_with_index(pq.load_ivfpq_index(spark, path),
                                     q, nProbe=2)
    return out.select("query_id", "neighbor_id",
                      F.round("adc_dist", 6).alias("adc"),
                      F.col("rank").alias("rk"))


def _knn_ivf_oracle(nlist: int = 16, nProbe: int = 4, k: int = 10,
                    dim: int = 64, seed: int = 42) -> str:
    """Full replay of the DETERMINISTIC IVF pipeline — fit included:
    the coarse centroids are EmbeddingKMeans' hash-ranked seeds (the
    ``nlist`` lowest ids under the portable Lehmer rank, the SAME
    ranking embedding_kmeans_assign oracles), then the
    search_with_centroids replay via the shared _ivf_cte fragment —
    every float in the shared fold order."""
    cent = (f"""cr AS (
      SELECT CAST(embedding AS DOUBLE[]) AS cv,
             row_number() OVER (
               ORDER BY ((((vec_id + {seed}) % 2147483647)
                          * 48271 % 2147483647) * 48271) % 2147483647,
                        vec_id) AS rk
      FROM embeddings WHERE embedding IS NOT NULL
    ), c AS (
      SELECT CAST(rk - 1 AS INTEGER) AS cell, cv FROM cr
      WHERE rk <= {nlist}
    )""")
    return f"""
    WITH e AS (
      SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v
      FROM embeddings
    ), {_ivf_cte(cent, nProbe, dim)}{_ivf_topk_tail(dim, k)}"""


@register("knn_ivf", oracle=_knn_ivf_oracle())
def knn_ivf(spark, sf_dir):
    """IVF-bucketed approximate KNN with a DETERMINISTIC fit: the
    coarse quantizer is IVFKNN.fit_centroids_df (EmbeddingKMeans
    hash-ranked seeding — a distributed TakeOrderedAndProject
    collecting nlist·d floats, the driver-sized quantizer contract),
    then the pure-Catalyst search_with_centroids lane (cosine cell
    assignment via combinable max-struct, cell equi-join, exact-cosine
    top-k). Every step replays in SQL, upgrading this query from
    rows-only (r1-r9: sampled numpy Lloyd fit) to hash-exact; the
    sampled fit stays available as IVFKNN.search and keeps its recall
    assertion in tests/test_extras.py."""
    from mmlspark_spark.llm.similarity import IVFKNN

    emb = _t(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 5)
    ivf = IVFKNN(idCol="vec_id", vecCol="embedding", k=10,
                 nlist=16, nProbe=4, seed=42)
    out = ivf.search_with_centroids(emb, q, ivf.fit_centroids_df(emb))
    return out.select("query_id", "neighbor_id",
                      F.round("sim", 6).alias("sim"), F.col("rank").alias("rk"))


def _knn_sq8_oracle(dim: int = 64, lv: int = 255, k: int = 10,
                    nq: int = 5, corpus_where: str = "") -> str:
    """Replays ScalarQuantizerKNN end-to-end INCLUDING the fit (the
    per-dim min/max bounds are exact aggregates, so unlike the
    sampled k-means fits this quantizer has no rows-only lane):
    uniform encode via floor(r + 0.5) with edge clamps, constant-dim
    zero codes, lo + code·Δ reconstruction, and the direct (q−x̂)²
    element-order left fold — each double in Catalyst's operation
    order. ``corpus_where`` restricts the INDEXED corpus (fit +
    scan) while queries stay unrestricted — the filtered-ANN replay
    (``knn_sq8_filtered``)."""
    from mmlspark_spark.plans.duckdb_xxh import fold_sum

    los = ", ".join(f"min(v[{i + 1}])" for i in range(dim))
    his = ", ".join(f"max(v[{i + 1}])" for i in range(dim))
    d2 = fold_sum("(q.v[i2] - r.recon[i2]) * (q.v[i2] - r.recon[i2])",
                  dim)
    w = f" WHERE {corpus_where}" if corpus_where else ""
    return f"""
    WITH e AS (
      SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v
      FROM embeddings
    ), ec AS (
      SELECT * FROM e{w}
    ), b AS (
      SELECT list_value({los}) AS lo, list_value({his}) AS hi FROM ec
    ), r AS (
      SELECT ec.vec_id, list_transform(range(1, {dim + 1}), i9 ->
               CASE WHEN b.hi[i9] = b.lo[i9] THEN b.lo[i9]
                    ELSE b.lo[i9]
                         + CAST(greatest(0.0, least({lv}.0,
                             floor((ec.v[i9] - b.lo[i9])
                                   / ((b.hi[i9] - b.lo[i9]) / {lv}.0)
                                   + 0.5))) AS INTEGER)::DOUBLE
                           * ((b.hi[i9] - b.lo[i9]) / {lv}.0)
               END) AS recon
      FROM ec, b
    ), d AS (
      SELECT q.vec_id AS q_id, r.vec_id AS d_id, {d2} AS d2
      FROM e q, r
      WHERE q.vec_id < {nq} AND q.vec_id <> r.vec_id
    )
    SELECT query_id, neighbor_id, round(d2, 6) AS sqd,
           CAST(rk AS INTEGER) AS rk
    FROM (SELECT q_id AS query_id, d_id AS neighbor_id, d2,
                 row_number() OVER (
                   PARTITION BY q_id
                   ORDER BY d2 ASC, d_id ASC) AS rk
          FROM d)
    WHERE rk <= {k}
    """


def _knn_matryoshka_oracle(dim: int = 64, dp: int = 16, cand: int = 25,
                           k: int = 10, nq: int = 5) -> str:
    """Replays truncated_rerank_search end-to-end: the dPrime-prefix
    coarse cosine (order-pinned folds, 1e-300 norm floors, sim-DESC /
    id-ASC top-C), then the exact full-dimension rerank over just the
    surviving candidates — both stages' doubles in Catalyst's
    operation order."""
    from mmlspark_spark.plans.duckdb_xxh import fold_sum

    def cos(qv: str, dv: str, n: int) -> str:
        return (f"({fold_sum(f'{qv}[i2] * {dv}[i2]', n)})"
                f" / (greatest(sqrt({fold_sum(f'{qv}[i2] * {qv}[i2]', n)}),"
                f" 1e-300)"
                f" * greatest(sqrt({fold_sum(f'{dv}[i2] * {dv}[i2]', n)}),"
                f" 1e-300))")

    return f"""
    WITH e AS (
      SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v
      FROM embeddings
    ), coarse AS (
      SELECT q_id, d_id FROM (
        SELECT q.vec_id AS q_id, d.vec_id AS d_id,
               row_number() OVER (
                 PARTITION BY q.vec_id
                 ORDER BY {cos('qp', 'dp', dp)} DESC, d.vec_id ASC
               ) AS crk
        FROM (SELECT vec_id, v[1:{dp}] AS qp FROM e
              WHERE vec_id < {nq}) q,
             (SELECT vec_id, v[1:{dp}] AS dp FROM e) d
        WHERE q.vec_id <> d.vec_id)
      WHERE crk <= {cand}
    ), rer AS (
      SELECT c.q_id, c.d_id, {cos('q.v', 'd.v', dim)} AS sim
      FROM coarse c
      JOIN e q ON q.vec_id = c.q_id
      JOIN e d ON d.vec_id = c.d_id
    )
    SELECT query_id, neighbor_id, round(sim, 6) AS sim,
           CAST(rk AS INTEGER) AS rk
    FROM (SELECT q_id AS query_id, d_id AS neighbor_id, sim,
                 row_number() OVER (
                   PARTITION BY q_id
                   ORDER BY sim DESC, d_id ASC) AS rk
          FROM rer)
    WHERE rk <= {k}
    """


@register("knn_matryoshka", oracle=_knn_matryoshka_oracle())
def knn_matryoshka(spark, sf_dir):
    """Matryoshka two-stage retrieval (truncated_rerank_search, MRL
    Kusupati 2022): coarse cosine over only the FIRST 16 of 64
    embedding dimensions keeps 25 candidates per query (the prefix
    fold reads 25% of the floats; at production d=1024/dPrime=64 it
    reads 6%), then an exact full-dimension rerank of just those
    25×5 candidate rows — broadcast-joined back to the corpus, never
    a second scan. Both stages are deterministic Catalyst (prefix
    slice, order-pinned folds, id tie-breaks), so the whole pipeline
    replays hash-exact."""
    from mmlspark_spark.llm.similarity import truncated_rerank_search

    emb = _t(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 5)
    out = truncated_rerank_search(emb, q, dPrime=16, idCol="vec_id",
                                  vecCol="embedding", k=10,
                                  candidates=25)
    return out.select("query_id", "neighbor_id",
                      F.round("sim", 6).alias("sim"),
                      F.col("rank").alias("rk"))


def _knn_matryoshka_sq8_oracle(dim: int = 64, dp: int = 16,
                               cand: int = 25, k: int = 10, nq: int = 5,
                               lv: int = 255) -> str:
    """Replays truncated_rerank_search(coarse='sq8') end-to-end: exact
    per-prefix-dim [lo, hi] bounds, uniform SQ8 encode (floor(r+0.5),
    edge clamps, constant-dim zero codes) and lo + code·Δ
    reconstruction — the _knn_sq8_oracle formulas on the dp-prefix —
    then the asymmetric coarse cosine (exact query prefix vs corpus
    reconstruction, order-pinned folds, 1e-300 floors) and the exact
    full-dimension rerank, every double in Catalyst's operation
    order."""
    from mmlspark_spark.plans.duckdb_xxh import fold_sum

    def cos(qv: str, dv: str, n: int) -> str:
        return (f"({fold_sum(f'{qv}[i2] * {dv}[i2]', n)})"
                f" / (greatest(sqrt({fold_sum(f'{qv}[i2] * {qv}[i2]', n)}),"
                f" 1e-300)"
                f" * greatest(sqrt({fold_sum(f'{dv}[i2] * {dv}[i2]', n)}),"
                f" 1e-300))")

    los = ", ".join(f"min(v[{i + 1}])" for i in range(dp))
    his = ", ".join(f"max(v[{i + 1}])" for i in range(dp))
    return f"""
    WITH e AS (
      SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v
      FROM embeddings
    ), b AS (
      SELECT list_value({los}) AS lo, list_value({his}) AS hi FROM e
    ), r AS (
      SELECT e.vec_id, list_transform(range(1, {dp + 1}), i9 ->
               CASE WHEN b.hi[i9] = b.lo[i9] THEN b.lo[i9]
                    ELSE b.lo[i9]
                         + CAST(greatest(0.0, least({lv}.0,
                             floor((e.v[i9] - b.lo[i9])
                                   / ((b.hi[i9] - b.lo[i9]) / {lv}.0)
                                   + 0.5))) AS INTEGER)::DOUBLE
                           * ((b.hi[i9] - b.lo[i9]) / {lv}.0)
               END) AS recon
      FROM e, b
    ), coarse AS (
      SELECT q_id, d_id FROM (
        SELECT q.vec_id AS q_id, r.vec_id AS d_id,
               row_number() OVER (
                 PARTITION BY q.vec_id
                 ORDER BY {cos('q.qp', 'r.recon', dp)} DESC,
                          r.vec_id ASC) AS crk
        FROM (SELECT vec_id, v[1:{dp}] AS qp FROM e
              WHERE vec_id < {nq}) q, r
        WHERE q.vec_id <> r.vec_id)
      WHERE crk <= {cand}
    ), rer AS (
      SELECT c.q_id, c.d_id, {cos('q.v', 'd.v', dim)} AS sim
      FROM coarse c
      JOIN e q ON q.vec_id = c.q_id
      JOIN e d ON d.vec_id = c.d_id
    )
    SELECT query_id, neighbor_id, round(sim, 6) AS sim,
           CAST(rk AS INTEGER) AS rk
    FROM (SELECT q_id AS query_id, d_id AS neighbor_id, sim,
                 row_number() OVER (
                   PARTITION BY q_id
                   ORDER BY sim DESC, d_id ASC) AS rk
          FROM rer)
    WHERE rk <= {k}
    """


@register("knn_matryoshka_sq8", oracle=_knn_matryoshka_sq8_oracle())
def knn_matryoshka_sq8(spark, sf_dir):
    """Matryoshka-over-SQ8 — the composed production recipe
    (truncated_rerank_search(coarse='sq8')): the coarse stage scores
    the exact query prefix against the SQ8-RECONSTRUCTED corpus prefix
    (exact bounds fit on the 16-dim prefix, uint8 codes, lo + code·Δ),
    so a stored coarse index is 8× smaller than the float prefix —
    0.8% of full-float bytes at d=1024/dPrime=64/bits=8 — and the
    exact full-dimension rerank caps the recall cost. Deterministic
    fit → the whole composition replays hash-exact."""
    from mmlspark_spark.llm.similarity import truncated_rerank_search

    emb = _t(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 5)
    out = truncated_rerank_search(emb, q, dPrime=16, idCol="vec_id",
                                  vecCol="embedding", k=10,
                                  candidates=25, coarse="sq8")
    return out.select("query_id", "neighbor_id",
                      F.round("sim", 6).alias("sim"),
                      F.col("rank").alias("rk"))


@register("knn_sq8", oracle=_knn_sq8_oracle())
def knn_sq8(spark, sf_dir):
    """Scalar-quantization ANN (ScalarQuantizerKNN, faiss SQ8
    family): 64-dim embeddings compressed to 64 uint8 codes between
    exact per-dimension corpus [lo, hi] bounds (ONE map-combined
    aggregate pass, a single 2d-double row out), then asymmetric
    top-10 for 5 queries — exact query vs on-the-fly lo + code·Δ
    reconstruction, squared-L2 left fold, corpus-side under a
    broadcast query cross join. The fit is exact min/max, so the
    whole fit→encode→search pipeline replays hash-exact — the only
    quantized-ANN lane with an oracled fit."""
    from mmlspark_spark.llm.similarity import ScalarQuantizerKNN

    emb = _t(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 5)
    out = ScalarQuantizerKNN(idCol="vec_id", vecCol="embedding",
                             k=10, bits=8, dim=64).search(emb, q)
    return out.select("query_id", "neighbor_id",
                      F.round("sq_dist", 6).alias("sqd"),
                      F.col("rank").alias("rk"))


@register("knn_sq8_filtered",
          oracle=_knn_sq8_oracle(corpus_where="vec_id >= 200"))
def knn_sq8_filtered(spark, sf_dir):
    """FILTERED ANN — metadata predicate composed under the quantized
    search, the production 'search only docs matching X' shape: the
    corpus filter (vec_id >= 200, a plain range predicate) sits BELOW
    the fit and the scan, so it pushes to the parquet reader
    (row-group skipping) and the SQ bounds are fitted on exactly the
    searchable subset — filtered-index semantics (like faiss
    IDSelector applied at build), not post-filtering of results,
    which silently returns < k rows. Queries stay unrestricted.
    Deterministic fit → the filtered pipeline replays hash-exact."""
    from mmlspark_spark.llm.similarity import ScalarQuantizerKNN

    emb = _t(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 5)
    corpus = emb.filter(F.col("vec_id") >= 200)
    out = ScalarQuantizerKNN(idCol="vec_id", vecCol="embedding",
                             k=10, bits=8, dim=64).search(corpus, q)
    return out.select("query_id", "neighbor_id",
                      F.round("sq_dist", 6).alias("sqd"),
                      F.col("rank").alias("rk"))


# ---------------------------------------------------------------------------
