"""Corpus-layout & curation operators for LLM pretraining pipelines:
sequence packing and benchmark decontamination.

The standard pretraining layout is concatenate-then-chunk: documents
are laid out end-to-end (within a shard, in a deterministic order) and
fixed ``maxTokens`` windows are cut across the concatenation — no
padding waste, documents may straddle window boundaries. This operator
computes each document's placement in that layout as pure window
expressions, so a 100 TB corpus gets its training-sequence addresses
without any driver state or python row work.

Scale: the only shuffle is the per-shard window sort; ``numShards``
bounds each sort's partition (pick shards ≈ corpus_size /
executor-memory-comfortable-slice). Shard assignment is ``id %
numShards`` — deterministic and cross-engine reproducible (a hash
assignment would balance adversarial id distributions better but is
engine-specific; ids from a sequence are already uniform mod N).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.window import Window

from mmlspark_spark.core.base import Transformer
from mmlspark_spark.functions.text_quality import token_count


class BenchmarkDecontaminator(Transformer):
    """Flag training documents that overlap an evaluation benchmark.

    Standard decontamination (the n-gram-overlap rule used for LLM
    pretraining corpora): a corpus document is contaminated when it
    shares at least ``minShingles`` distinct word ``n``-gram shingles
    with the benchmark SUITE as a whole (the union of all benchmark
    texts' shingles — overlap is counted against the pooled set, not
    per benchmark item; with ``minShingles > 1`` a document touching
    several items lightly can therefore flag even though no single
    item alone reaches the threshold). ``transform(corpus)`` appends
    ``contaminated_count`` (distinct shared shingles) and
    ``contaminated`` (count >= minShingles).

    Scale: benchmark suites are tiny next to a 100 TB corpus, so the
    benchmark's distinct shingle set (hashed to 8-byte longs) is
    BROADCAST and the corpus side stays a map-side semi-intersection +
    one groupBy on (doc id) longs — the corpus never self-joins and
    never shuffles text.
    """

    def __init__(self, benchmarkData: DataFrame = None,
                 idCol: str = "doc_id", textCol: str = "text",
                 benchmarkTextCol: str = "text", n: int = 8,
                 minShingles: int = 1):
        super().__init__(benchmarkData=benchmarkData, idCol=idCol,
                         textCol=textCol, benchmarkTextCol=benchmarkTextCol,
                         n=n, minShingles=minShingles)

    def transform_schema(self, schema: T.StructType) -> T.StructType:
        self._require_cols(schema, self.idCol, self.textCol)
        return T.StructType(list(schema.fields) + [
            T.StructField("contaminated_count", T.IntegerType()),
            T.StructField("contaminated", T.BooleanType()),
        ])

    def _transform(self, df: DataFrame) -> DataFrame:
        from mmlspark_spark.functions.text_quality import word_shingles

        # hashed=True fuses the hash into word_shingles' single lambda;
        # a transform(..., xxhash64) layer on top would re-evaluate the
        # whole shingle construction per element (no subexpression
        # elimination inside HOF lambdas)
        hashed = word_shingles(self.benchmarkTextCol, self.n, hashed=True)
        bench = (self.benchmarkData
                 .select(F.explode(hashed).alias("__s")).distinct())
        corpus_hashed = word_shingles(self.textCol, self.n, hashed=True)
        exploded = df.select(F.col(self.idCol).alias("__id"),
                             F.explode(corpus_hashed).alias("__s"))
        counts = (exploded.join(F.broadcast(bench), "__s", "left_semi")
                  .groupBy("__id")
                  .agg(F.count("*").alias("contaminated_count")))
        joined = df.join(
            counts, df[self.idCol] == counts["__id"], "left").drop("__id")
        cnt = F.coalesce(F.col("contaminated_count"), F.lit(0)).cast("int")
        return (joined
                .withColumn("contaminated_count", cnt)
                .withColumn("contaminated", cnt >= self.minShingles))


class SequencePacker(Transformer):
    """Assign each document its (shard, sequence, offset) placement in
    the concatenate-then-chunk layout.

    Output columns appended: ``n_tokens`` (whitespace tokens),
    ``shard`` (``idCol % numShards``), ``seq_index`` (which
    fixed-size window the document STARTS in, per shard),
    ``seq_offset`` (token offset inside that window). A document whose
    span crosses a boundary continues into the next window — the
    consumer slices ``[seq_offset, ...)`` across windows, exactly like
    any packed-pretraining reader.
    """

    def __init__(self, idCol: str = "doc_id", textCol: str = "text",
                 maxTokens: int = 2048, numShards: int = 32):
        if maxTokens <= 0 or numShards <= 0:
            raise ValueError("maxTokens and numShards must be positive")
        super().__init__(idCol=idCol, textCol=textCol, maxTokens=maxTokens,
                         numShards=numShards)

    def transform_schema(self, schema: T.StructType) -> T.StructType:
        self._require_cols(schema, self.idCol, self.textCol)
        return T.StructType(list(schema.fields) + [
            T.StructField("n_tokens", T.IntegerType()),
            T.StructField("shard", T.LongType()),
            T.StructField("seq_index", T.LongType()),
            T.StructField("seq_offset", T.LongType()),
        ])

    def _transform(self, df: DataFrame) -> DataFrame:
        cap = int(self.maxTokens)
        # pmod, not %: Spark's % keeps the dividend's sign, so signed
        # hash ids would land in shards -(n-1)..-1 that a consumer
        # iterating 0..n-1 silently skips
        shard = F.pmod(F.col(self.idCol).cast("long"),
                       F.lit(int(self.numShards)))
        with_tokens = df.withColumn(
            "n_tokens", token_count(self.textCol).cast("int")
        ).withColumn("shard", shard)
        w = (Window.partitionBy("shard").orderBy(F.col(self.idCol))
             .rowsBetween(Window.unboundedPreceding, -1))
        cum_before = F.coalesce(F.sum("n_tokens").over(w),
                                F.lit(0).cast("long"))
        return (with_tokens
                .withColumn("seq_index", F.floor(cum_before / cap))
                .withColumn("seq_offset", cum_before % cap))


def chunk_documents(df: DataFrame, idCol: str = "doc_id",
                    textCol: str = "text", chunkTokens: int = 64,
                    stride: int | None = None) -> DataFrame:
    """Overlap-stride chunking: cut each document into token windows
    of ``chunkTokens``, starting every ``stride`` tokens (stride <
    chunkTokens => overlapping windows -- the retrieval/eval-prep
    layout, where SequencePacker's concat-then-chunk is the
    pretraining one). Returns (id, chunk_id, n_tokens, chunk).

    Pure Catalyst, no shuffle, no Python: tokenize ONCE per row behind
    an ``explode(array(...))`` Generate barrier -- without it,
    CollapseProject re-inlines the tokenize expression into every
    ``slice`` lambda, making the map work O(tokens x chunks) per
    document (quadratic for long docs; the same pitfall that took
    minhash 5s->165s) -- then ``sequence()`` the start offsets,
    ``transform``+``slice`` the windows over the materialized token
    attribute, and ``posexplode``. Chunk starts cover every token
    (last window may be short); empty/whitespace-only documents
    produce no chunks. Tokens are the pinned ASCII-whitespace split
    (engine-parity with the corpus_report tokenizer), so the
    ``chunk_overlap`` catalog query verifies hash-exact.
    """
    if stride is None:
        stride = chunkTokens
    if stride <= 0 or chunkTokens <= 0:
        raise ValueError("chunkTokens and stride must be positive")
    if stride > chunkTokens:
        raise ValueError(
            f"stride ({stride}) > chunkTokens ({chunkTokens}) would "
            "skip tokens between consecutive chunks")
    from mmlspark_spark.functions.text_quality import PINNED_WS_RE

    toks = F.filter(F.split(F.col(textCol), PINNED_WS_RE),
                    lambda x: x != F.lit(""))
    # Generate barrier: __toks is a bound attribute downstream, so the
    # regex tokenization runs exactly once per row
    tok_df = df.select(F.col(idCol),
                       F.explode(F.array(toks)).alias("__toks"))
    toks_attr = F.col("__toks")
    starts = F.when(
        F.size(toks_attr) > 0,
        F.sequence(F.lit(0), F.size(toks_attr) - 1, F.lit(stride)),
    ).otherwise(F.array().cast("array<int>"))
    chunks = F.transform(
        starts,
        lambda s: F.slice(toks_attr, s + 1, chunkTokens))
    exploded = tok_df.select(
        F.col(idCol),
        F.posexplode(chunks).alias("chunk_id", "__chunk"))
    return exploded.select(
        idCol, "chunk_id",
        F.size("__chunk").alias("n_tokens"),
        F.concat_ws(" ", "__chunk").alias("chunk"))


def cdc_chunks(df: DataFrame, idCol: str = "doc_id",
               textCol: str = "text", k: int = 4,
               maskBits: int = 4) -> DataFrame:
    """Content-defined chunking (the LBFS/rsync/FastCDC family, at
    token granularity): cut after every k-token window whose rolling
    hash ≡ 0 (mod 2^maskBits) — so chunk boundaries are a function of
    LOCAL CONTENT, not position. Insert a sentence into a document and
    only the chunks around the edit change, while every fixed-stride
    window downstream of the edit shifts (the property that makes CDC
    the right unit for chunk-level dedup of evolving corpora; expected
    chunk length ≈ 2^maskBits + k tokens).

    Returns (id, chunk_id, start, n_tokens, chunk) — start is the
    0-based token offset. Same portable Rabin-Karp hash family AND
    cross-engine-pinned whitespace tokenization (``pinned_tokens``) as
    winnow_fingerprints, so the ``cdc_chunks`` catalog query replays
    boundary selection and chunk extraction hash-exact in DuckDB.
    Map-only: two Generate barriers (token hashes → gram hashes) keep
    the per-row arrays computed once; no shuffle at any scale.
    """
    from mmlspark_spark.functions.text_quality import (_FP_MOD,
                                                       pinned_tokens)

    if k <= 0 or maskBits <= 0:
        raise ValueError("k and maskBits must be positive")
    m = F.lit(_FP_MOD).cast("long")
    mask = F.lit(2 ** maskBits).cast("long")
    tokh_and_toks = F.struct(
        pinned_tokens(F.col(textCol)).alias("toks"),
        F.transform(
            pinned_tokens(F.col(textCol)),
            lambda t: F.aggregate(
                F.split(t, ""), F.lit(0).cast("long"),
                lambda a, c: F.pmod(a * 131 + F.ascii(c), m))).alias("th"))
    d1 = df.select(F.col(idCol),
                   F.explode(F.array(tokh_and_toks)).alias("__s"))
    toks = F.col("__s.toks")
    th = F.col("__s.th")
    n = F.size(th)
    grams = F.when(
        n >= k,
        F.transform(
            F.sequence(F.lit(0), n - k),
            lambda i: F.aggregate(
                F.slice(th, i + 1, k), F.lit(0).cast("long"),
                lambda a, h: F.pmod(a * 31 + h, m))),
    ).otherwise(F.array().cast("array<long>"))
    d2 = d1.select(F.col(idCol), toks.alias("__toks"),
                   F.explode(F.array(grams)).alias("__grams"))
    g = F.col("__grams")
    tk = F.col("__toks")
    nt = F.size(tk)
    # cut AFTER the window end (position i+k) for every matching gram;
    # 0 and n close the first/last chunk; sorted+distinct handles a
    # match in the final window (i+k == n) colliding with the n cut
    cuts = F.array_sort(F.array_distinct(F.concat(
        F.array(F.lit(0)),
        F.transform(
            F.filter(F.sequence(F.lit(0), F.greatest(F.size(g) - 1,
                                                     F.lit(0))),
                     lambda i: (F.size(g) > 0)
                     & (F.pmod(F.element_at(g, i + 1), mask) == 0)),
            lambda i: i + k),
        F.array(nt))))
    chunks = F.transform(
        F.sequence(F.lit(0), F.size(cuts) - 2),
        lambda j: F.struct(
            F.element_at(cuts, j + 1).alias("start"),
            F.slice(tk, F.element_at(cuts, j + 1) + 1,
                    F.element_at(cuts, j + 2)
                    - F.element_at(cuts, j + 1)).alias("c")))
    return (d2.filter(nt > 0)
            .select(F.col(idCol),
                    F.posexplode(chunks).alias("chunk_id", "__c"))
            .select(idCol, "chunk_id",
                    F.col("__c.start").cast("long").alias("start"),
                    F.size("__c.c").cast("long").alias("n_tokens"),
                    F.concat_ws(" ", "__c.c").alias("chunk"))
            .filter(F.col("n_tokens") > 0))
