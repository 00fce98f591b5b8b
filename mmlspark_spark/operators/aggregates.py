"""Aggregation operators (SURVEY §2.4).

Scale notes: everything here is expressed as DataFrame aggregations, so
Spark performs map-side partial aggregation before the shuffle; the only
driver-side materialization is per-*column* stat rows (O(#cols), not
O(#rows)) and per-*label* weight tables (O(#labels)), both tiny at any
data scale.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from mmlspark_spark.core.base import Estimator, Model, Transformer

_NUMERIC = (T.ByteType, T.ShortType, T.IntegerType, T.LongType,
            T.FloatType, T.DoubleType, T.DecimalType)


class SummarizeData(Transformer):
    """Per-column statistical profile.

    Parity: reference ``core/.../stages/SummarizeData.scala:101-238`` —
    counts (rows, missing, unique), basic stats (mean/variance/stddev/
    skewness/kurtosis/min/max), percentiles (25/50/75).

    Scale: the reference assembles this by unioning per-column single-row
    frames and outer-joining stat groups (``SummarizeData.scala:110-128``)
    — one Spark job per column. We instead compute EVERY stat for EVERY
    column in a single ``df.agg`` pass (one scan, one reduce), then pivot
    the single wide row into per-column rows on the driver (O(#cols)).
    ``exact`` switches unique counts / percentiles from approximate
    (HLL / QuantileSummaries) to exact — exact is what the DuckDB oracle
    checks; approximate is the 100 TB default.
    """

    def __init__(self, counts: bool = True, basic: bool = True,  # noqa: D107
                 percentiles: bool = True, errorThreshold: float = 0.0,
                 exact: bool = False):
        super().__init__(counts=counts, basic=basic, percentiles=percentiles,
                         errorThreshold=errorThreshold, exact=exact)

    def transform_schema(self, schema: T.StructType) -> T.StructType:
        fields = [T.StructField("feature", T.StringType(), False)]
        if self.counts:
            fields += [T.StructField(n, T.DoubleType(), True)
                       for n in ("count", "unique_value_count", "missing_value_count")]
        if self.basic:
            fields += [T.StructField(n, T.DoubleType(), True)
                       for n in ("mean", "variance", "stddev", "skewness",
                                 "kurtosis", "min", "max")]
        if self.percentiles:
            fields += [T.StructField(n, T.DoubleType(), True)
                       for n in ("p25", "median", "p75")]
        return T.StructType(fields)

    def _transform(self, df: DataFrame) -> DataFrame:
        # No narrow-scan spread here, measured deliberately: sketch
        # partial aggregation is cheap per row, so repartitioning a
        # 1-3-split scan costs more than the parallelism buys
        # (1.3 s → 1.8 s on the 4-column approx bench query at sf0.1) —
        # and in exact mode the reordered float summation moves means
        # at the ~1e-6 level, which the oracle compare would catch.
        numeric = [f.name for f in df.schema.fields if isinstance(f.dataType, _NUMERIC)]
        # Two aggregation passes, NOT one: declarative aggs compile to
        # whole-stage-codegen HashAggregate, but one TypedImperative agg
        # (HLL sketch / quantile summary) in the same agg forces the
        # whole thing onto the ObjectHashAggregate path — measured 3x
        # slower at sf0.1 than two clean passes.
        decl_aggs = []
        sketch_by_col: dict[str, list] = {}

        def add(name: str, expr):
            decl_aggs.append(expr.cast("double").alias(name))

        def add_sketch(c: str, expr):
            sketch_by_col.setdefault(c, []).append(expr)

        for c in df.columns:
            col = F.col(c)
            is_num = c in numeric
            if self.counts:
                add(f"{c}__count", F.count(F.lit(1)))
                if self.exact:
                    add_sketch(c, F.count_distinct(col).cast("double")
                               .alias(f"{c}__unique_value_count"))
                else:
                    add_sketch(c, F.approx_count_distinct(col).cast("double")
                               .alias(f"{c}__unique_value_count"))
                add(f"{c}__missing_value_count", F.count(F.lit(1)) - F.count(col))
            if self.basic:
                add(f"{c}__mean", F.mean(col) if is_num else F.lit(None))
                add(f"{c}__variance", F.var_samp(col) if is_num else F.lit(None))
                add(f"{c}__stddev", F.stddev_samp(col) if is_num else F.lit(None))
                add(f"{c}__skewness", F.skewness(col) if is_num else F.lit(None))
                add(f"{c}__kurtosis", F.kurtosis(col) if is_num else F.lit(None))
                add(f"{c}__min", F.min(col) if is_num else F.lit(None))
                add(f"{c}__max", F.max(col) if is_num else F.lit(None))
            if self.percentiles and is_num:
                # one quantile sketch per column (array of 3 qs), not three
                qs = F.array(F.lit(0.25), F.lit(0.5), F.lit(0.75))
                expr = (F.percentile(col, qs) if self.exact
                        else F.percentile_approx(col, qs))
                add_sketch(c, expr.alias(f"{c}__pq"))

        # The decl pass and the per-column sketch passes are independent
        # jobs — run them all concurrently (guide §2.6: overlapping jobs
        # back-fill idle slots). Round-5 had already split decl from
        # sketch (overlapped best-of-3 0.893 s vs single mixed agg
        # 3.360 s at sf0.1 — one TypedImperative agg forces the whole
        # mixed agg onto ObjectHashAggregate). Round-16 splits the
        # sketch pass further, ONE JOB PER COLUMN: the sf0.1 parquet is
        # a single row-group (1-3 splits), so a combined sketch job
        # serializes every column's HLL + QuantileSummaries inserts
        # onto ≤3 cores while 29 idle; per-column jobs run those
        # sketches concurrently (measured 2.45 s → 1.48 s best,
        # identical results — per-column sketches never interact, and
        # each column keeps the same scan partitioning and merge
        # shape). On a real cluster the scan has more splits than
        # slots, and the same split instead bounds each job's working
        # set (one column's sketch state per task, not all columns').
        # In exact mode this also keeps each job to ONE distinct agg —
        # multi-count_distinct in one agg triggers EXPAND (×aggs rows).
        jobs: list = []
        if decl_aggs:
            jobs.append(decl_aggs)
        jobs.extend(sketch_by_col.values())
        if len(jobs) == 1:
            wide = df.agg(*jobs[0]).collect()[0].asDict()
        else:
            from concurrent.futures import ThreadPoolExecutor

            with ThreadPoolExecutor(max_workers=min(8, len(jobs))) as pool:
                futs = [pool.submit(
                    lambda a=aggs: df.agg(*a).collect()) for aggs in jobs]
                wide = {}
                for f in futs:
                    wide.update(f.result()[0].asDict())
        for c in numeric:
            pq = wide.pop(f"{c}__pq", None)
            if pq is not None:
                wide[f"{c}__p25"], wide[f"{c}__median"], wide[f"{c}__p75"] = \
                    (float(v) if v is not None else None for v in pq)
        out_schema = self.transform_schema(df.schema)
        stat_cols = [f.name for f in out_schema.fields][1:]
        rows = [
            tuple([c] + [wide.get(f"{c}__{s}") for s in stat_cols])
            for c in df.columns
        ]
        # Arrow path for the tiny local result: list-of-rows
        # createDataFrame routes every downstream action through a
        # pickled python RDD job (measured 680 ms per count() of a
        # 4-row frame vs 140 ms via pandas/Arrow). dtype=object keeps
        # None → NULL (a float64 pandas column would smuggle NaN).
        import pandas as pd

        pdf = pd.DataFrame(rows, columns=[f.name for f in out_schema.fields],
                           dtype=object)
        return df.sparkSession.createDataFrame(pdf, out_schema)


class ClassBalancerModel(Model):
    """Joins per-label weights onto rows; broadcast by default.

    Parity: reference ``core/.../stages/ClassBalancer.scala:57-96``
    (broadcast equi-join of the tiny weight table).
    """

    def __init__(self, inputCol: str = "label", outputCol: str = "weight",  # noqa: D107
                 weights: DataFrame | None = None, broadcastJoin: bool = True):
        super().__init__(inputCol=inputCol, outputCol=outputCol,
                         weights=weights, broadcastJoin=broadcastJoin)

    def transform_schema(self, schema: T.StructType) -> T.StructType:
        self._require_cols(schema, self.inputCol)
        return T.StructType(list(schema.fields)
                            + [T.StructField(self.outputCol, T.DoubleType(), True)])

    def _transform(self, df: DataFrame) -> DataFrame:
        w = self.weights.withColumnRenamed(self.inputCol, "__cb_key")
        if self.broadcastJoin:
            w = F.broadcast(w)
        # eqNullSafe: fit's groupBy emits a weight row for a NULL label
        # group, and a plain equi-join would never match it back —
        # null-label rows silently got NULL weight. Column order is
        # restored to honor transform_schema (the join key would
        # otherwise lead the output).
        return (df.join(w, F.col(self.inputCol).eqNullSafe(F.col("__cb_key")),
                        how="left")
                .select(*df.columns, self.outputCol))


class ClassBalancer(Estimator):
    """Compute weight = max(label count) / count(label) per label value.

    Parity: reference ``core/.../stages/ClassBalancer.scala:41-57``.
    The weight table is O(#labels) — computed distributed, never more
    than a broadcast-variable's worth of driver state.
    """

    def __init__(self, inputCol: str = "label", outputCol: str = "weight",  # noqa: D107
                 broadcastJoin: bool = True):
        super().__init__(inputCol=inputCol, outputCol=outputCol,
                         broadcastJoin=broadcastJoin)

    def transform_schema(self, schema: T.StructType) -> T.StructType:
        self._require_cols(schema, self.inputCol)
        return schema

    def _fit(self, df: DataFrame) -> ClassBalancerModel:
        counts = df.groupBy(self.inputCol).count()
        # window-free global max via cross join of a 1-row agg (broadcast)
        max_count = counts.agg(F.max("count").alias("__max"))
        weights = (
            counts.crossJoin(F.broadcast(max_count))
            .select(self.inputCol,
                    (F.col("__max") / F.col("count")).cast("double").alias(self.outputCol))
        )
        return ClassBalancerModel(inputCol=self.inputCol, outputCol=self.outputCol,
                                  weights=weights, broadcastJoin=self.broadcastJoin)


class EnsembleByKey(Transformer):
    """Group rows by key(s) and average the listed numeric/vector columns;
    optionally join the aggregate back onto every input row.

    Parity: reference ``core/.../stages/EnsembleByKey.scala:83-127``
    (mean of double cols / ``Summarizer.mean`` of vector cols; equi-join
    back when ``collapseGroup=False`` — join at ``:118-121``).
    """

    def __init__(self, keys: Sequence[str] = (), cols: Sequence[str] = (),  # noqa: D107
                 colNames: Sequence[str] = (), collapseGroup: bool = True,
                 vectorDims: dict | None = None):
        cols = list(cols)
        names = list(colNames) or [f"mean_{c}" for c in cols]
        super().__init__(keys=list(keys), cols=cols, colNames=names,
                         collapseGroup=collapseGroup, vectorDims=vectorDims or {})

    def transform_schema(self, schema: T.StructType) -> T.StructType:
        from pyspark.ml.linalg import VectorUDT

        self._require_cols(schema, *self.keys, *self.cols)
        agg_fields = [
            T.StructField(
                n,
                T.ArrayType(T.DoubleType())        # vector -> per-dim means
                if isinstance(schema[c].dataType, VectorUDT)
                else T.DoubleType(),
                True,
            )
            for c, n in zip(self.cols, self.colNames)
        ]
        if self.collapseGroup:
            return T.StructType([schema[k] for k in self.keys] + agg_fields)
        return T.StructType(list(schema.fields) + agg_fields)

    def _transform(self, df: DataFrame) -> DataFrame:
        from pyspark.ml.functions import vector_to_array
        from pyspark.ml.linalg import VectorUDT

        aggs = []
        for c, n in zip(self.cols, self.colNames):
            dt = df.schema[c].dataType
            if isinstance(dt, VectorUDT):
                # elementwise mean via array avg: vector -> array -> posexplode-free
                # mean using aggregate over fixed dims (declared or probed once)
                dim = self.vectorDims.get(c)
                if dim is None:
                    # null-safe probe with a real error on empty/all-null
                    # (None[0] / len(None) TypeErrors are opaque)
                    from mmlspark_spark.functions.vector import vector_dim

                    dim = vector_dim(df, c)
                arr = vector_to_array(F.col(c))
                aggs.append(F.array(*[F.avg(arr[i]) for i in range(dim)]).alias(n))
            else:
                aggs.append(F.avg(F.col(c)).cast("double").alias(n))
        agg = df.groupBy(*self.keys).agg(*aggs)
        if self.collapseGroup:
            return agg
        # restore the declared column order — the join moves its keys
        # to the front, violating transform_schema's layout
        return (df.join(agg, on=list(self.keys), how="left")
                .select(*df.columns, *self.colNames))


class HeavyHitters(Transformer):
    """Exact top-k most frequent values of a column — the hot-key /
    vocabulary-head detector a curation pipeline runs before choosing
    stopword lists, shingle caps (``maxDocsPerShingle``), or join-skew
    salting factors. With ``tokenize=True`` the input column is
    whitespace-tokenized first (heavy TOKENS of a document corpus).

    Output: (value, cnt), ``k`` rows, ties broken by value ascending so
    the result is deterministic and engine-reproducible.

    Scale: the count is one partial-aggregated groupBy (map-side
    combine shrinks each partition to its local distinct values before
    the exchange), and the top-k is ``orderBy(...).limit(k)``, which
    Spark executes as TakeOrderedAndProject — a per-partition bounded
    heap plus a driver merge of p×k rows, never a global sort. The
    whole job shuffles |distinct values| rows, not |rows|. When even
    |distinct| is too wide (e.g. shingles at 100 TB), pre-filter with
    ``minCount`` after a first pass, or cap the universe upstream —
    an approximate CMS/SpaceSaving sketch trades exactness for one
    pass and is deliberately NOT the default (this operator feeds
    thresholds that downstream ops treat as exact)."""

    def __init__(self, inputCol: str = "text", k: int = 100,
                 minCount: int = 1, tokenize: bool = False,
                 outputValueCol: str = "value",
                 outputCountCol: str = "cnt"):
        super().__init__(inputCol=inputCol, k=k, minCount=minCount,
                         tokenize=tokenize, outputValueCol=outputValueCol,
                         outputCountCol=outputCountCol)

    def transform_schema(self, schema: T.StructType) -> T.StructType:
        self._require_cols(schema, self.inputCol)
        src = schema[self.inputCol].dataType
        vt = T.StringType() if self.tokenize else src
        return T.StructType([
            T.StructField(self.outputValueCol, vt),
            T.StructField(self.outputCountCol, T.LongType(), False)])

    def _transform(self, df: DataFrame) -> DataFrame:
        from mmlspark_spark.functions.text_quality import tokens

        if self.tokenize:
            vals = df.select(
                F.explode(tokens(self.inputCol)).alias(self.outputValueCol))
        else:
            vals = df.select(F.col(self.inputCol).alias(self.outputValueCol))
        counted = (vals.groupBy(self.outputValueCol)
                   .agg(F.count("*").alias(self.outputCountCol)))
        if self.minCount > 1:
            counted = counted.filter(
                F.col(self.outputCountCol) >= self.minCount)
        return (counted
                .orderBy(F.col(self.outputCountCol).desc(),
                         F.col(self.outputValueCol))
                .limit(self.k))
