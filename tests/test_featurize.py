import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from mmlspark_spark.featurize import (
    CleanMissingData,
    CountSelector,
    DataConversion,
    Featurize,
    IndexToValue,
    MultiNGram,
    PageSplitter,
    TextFeaturizer,
    TextPreprocessor,
    UnicodeNormalize,
    ValueIndexer,
)


def test_data_conversion_casts(basic_df):
    out = DataConversion(cols=["numbers"], convertTo="double").transform(basic_df)
    assert isinstance(out.schema["numbers"].dataType, T.DoubleType)
    out2 = DataConversion(cols=["doubles"], convertTo="string").transform(basic_df)
    assert isinstance(out2.schema["doubles"].dataType, T.StringType)


def test_data_conversion_date_roundtrip(spark):
    df = spark.createDataFrame([("2024/03/15",)], ["d"])
    out = DataConversion(cols=["d"], convertTo="date",
                         dateTimeFormat="yyyy/MM/dd").transform(df)
    assert isinstance(out.schema["d"].dataType, T.DateType)
    back = DataConversion(cols=["d"], convertTo="string",
                          dateTimeFormat="yyyy-MM-dd").transform(out)
    assert back.collect()[0].d == "2024-03-15"


def test_value_indexer_roundtrip(spark):
    df = spark.createDataFrame([("b",), ("a",), ("c",), ("a",), (None,)], ["v"])
    model = ValueIndexer(inputCol="v", outputCol="idx").fit(df)
    assert model.levels == ["a", "b", "c", None]
    out = model.transform(df)
    got = {r.v: r.idx for r in out.collect()}
    assert got == {"a": 0, "b": 1, "c": 2, None: 3}
    # metadata carried for inverse
    back = IndexToValue(inputCol="idx", outputCol="orig").transform(out)
    assert all(r.orig == (r.v if r.v is not None else None) for r in back.collect())


def test_clean_missing_mean_median(spark):
    df = spark.createDataFrame(
        [(1.0, 10), (3.0, None), (None, 30)],
        T.StructType([T.StructField("a", T.DoubleType()),
                      T.StructField("b", T.IntegerType())]),
    )
    m = CleanMissingData(cols=["a", "b"], cleaningMode="Mean").fit(df)
    out = {(r.a, r.b) for r in m.transform(df).collect()}
    assert out == {(1.0, 10), (3.0, 20), (2.0, 30)}  # means: a→2.0, b→20
    m2 = CleanMissingData(cols=["a"], cleaningMode="Custom", customValue=-1.0).fit(df)
    assert {r.a for r in m2.transform(df).collect()} == {1.0, 3.0, -1.0}
    m3 = CleanMissingData(cols=["a", "b"], cleaningMode="Remove").fit(df)
    assert m3.transform(df).count() == 1


def test_unicode_normalize(spark):
    df = spark.createDataFrame([("Ｈｅｌｌｏ Ｗｏrld",), ("ÅBC",)], ["text"])
    out = UnicodeNormalize(inputCol="text", outputCol="n", form="NFKC").transform(df)
    vals = [r.n for r in out.collect()]
    assert "hello world" in vals


def test_page_splitter(spark):
    text = "word " * 100  # 500 chars
    df = spark.createDataFrame([(text.strip(),)], ["text"])
    out = PageSplitter(inputCol="text", outputCol="pages",
                       maximumPageLength=120, minimumPageLength=80).transform(df)
    pages = out.collect()[0].pages
    assert all(len(p) <= 120 for p in pages)
    assert "".join(pages) == text.strip()


def test_multi_ngram(spark):
    df = spark.createDataFrame([(["a", "b", "c"],)], ["tokens"])
    out = MultiNGram(inputCol="tokens", outputCol="g", lengths=[1, 2, 3]).transform(df)
    g = out.collect()[0].g
    assert g == ["a", "b", "c", "a b", "b c", "a b c"]


def test_text_preprocessor(spark):
    df = spark.createDataFrame([("The Cat and the Hat",)], ["text"])
    out = TextPreprocessor(
        inputCol="text", outputCol="p",
        map={"the cat": "feline", "cat": "X", "hat": "topper"},
    ).transform(df)
    # longest-match-first: "the cat" wins over "cat"
    assert out.collect()[0].p == "feline and the topper"


def test_text_featurizer(documents):
    model = TextFeaturizer(inputCol="text", outputCol="features",
                           nGramLengths=[1, 2], numFeatures=1 << 12).fit(documents)
    out = model.transform(documents)
    row = out.select("features").first()
    assert row.features.size == 1 << 12
    assert "__tok" not in out.columns


def test_text_featurizer_fit_transform_parity(documents):
    """fit_transform (one tokenize+hashTF pass feeding both the IDF fit
    and the output — r16 optimization) must be row-identical to the
    two-pass fit().transform() on the same frame."""
    from pyspark.ml.functions import vector_to_array

    from mmlspark_spark.core.cache import release_intermediates

    tf = TextFeaturizer(inputCol="text", outputCol="features",
                        nGramLengths=[1, 2], numFeatures=1 << 12)
    two_pass = tf.fit(documents).transform(documents)
    single = tf.fit_transform(documents)
    assert single.columns == two_pass.columns

    def rows(df):
        arr = vector_to_array(F.col("features"))
        return sorted(
            (r.doc_id, r.nnz, round(r.tot, 6)) for r in df.select(
                "doc_id", F.size(F.filter(arr, lambda x: x != 0.0)).alias("nnz"),
                F.aggregate(arr, F.lit(0.0), lambda a, x: a + x).alias("tot"),
            ).collect())

    try:
        assert rows(single) == rows(two_pass)
    finally:
        release_intermediates(single)


def test_featurize_auto(spark):
    df = spark.createDataFrame(
        [(1.0, "red", 25, "2024-01-01 10:00:00"),
         (None, "blue", 30, "2024-06-15 22:30:00"),
         (3.0, "red", None, "2023-03-08 05:10:00")],
        "x double, color string, age int, ts string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    model = Featurize(inputCols=["x", "color", "age", "ts"]).fit(df)
    out = model.transform(df)
    vecs = [r.features for r in out.collect()]
    dim = vecs[0].size
    assert all(v.size == dim for v in vecs)
    # x imputed (no NaN), one-hot color present, 8 ts components
    assert dim >= 1 + 2 + 1 + 8


def test_count_selector(spark):
    from pyspark.ml.linalg import Vectors

    df = spark.createDataFrame(
        [(Vectors.dense([1.0, 0.0, 2.0, 0.0]),),
         (Vectors.dense([0.5, 0.0, 0.0, 0.0]),)],
        ["features"],
    )
    model = CountSelector(inputCol="features", outputCol="sel").fit(df)
    assert model.indices == [0, 2]
    out = model.transform(df)
    assert out.collect()[0].sel.size == 2


def test_multi_ngram_short_and_empty_docs(spark):
    """Token arrays shorter than n yield [] instead of the
    sequence(1,0)/slice(t,0,n) crash — one empty document must not
    abort the job."""
    from mmlspark_spark.featurize import MultiNGram

    df = spark.createDataFrame(
        [(1, ["a", "b", "c"]), (2, ["a"]), (3, [])],
        ["doc_id", "toks"])
    out = MultiNGram(inputCol="toks", outputCol="g",
                     lengths=[1, 2, 3]).transform(df)
    got = {r.doc_id: r.g for r in out.collect()}
    assert got[1] == ["a", "b", "c", "a b", "b c", "a b c"]
    assert got[2] == ["a"]
    assert got[3] == []


def test_text_preprocessor_normalizes_keys(spark):
    """Replacement-map keys pass through the same normFunc as the
    text: an uppercase key must still match lowered input."""
    from mmlspark_spark.featurize import TextPreprocessor

    df = spark.createDataFrame([(1, "Mr. Smith sends Data")],
                               ["doc_id", "text"])
    out = TextPreprocessor(inputCol="text", outputCol="p",
                           normFunc="lower",
                           map={"Mr.": "mister", "Data": "<D>"}).transform(df)
    assert out.collect()[0].p == "mister smith sends <D>"


def test_featurize_null_text_high_cardinality(spark):
    """A NULL in a high-cardinality text column must not NPE the
    tokenizer at fit or transform time."""
    from mmlspark_spark.featurize import Featurize

    rows = [(i, f"word{i} text sample number {i}" if i else None,
             float(i)) for i in range(30)]
    df = spark.createDataFrame(rows, ["id", "txt", "num"])
    model = Featurize(inputCols=["txt", "num"], outputCol="features",
                      oneHotMaxCategories=5).fit(df)
    out = model.transform(df)
    assert out.filter("features IS NULL").count() == 0
    assert out.count() == 30
