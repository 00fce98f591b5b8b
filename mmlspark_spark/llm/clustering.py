"""Embedding k-means and semantic (SemDeDup-style) deduplication.

Clustering is the workhorse of embedding-space curation: SemDeDup
(Abbas et al., 2023) clusters corpus embeddings with k-means and
removes near-duplicates *within* clusters, turning an O(N²) pairwise
search into O(Σ cᵢ²) over cluster sizes; the same cluster labels
drive topic bucketing and cluster-balanced mixing. This module is
the Spark-native version, built so the pieces are all bounded:

- **Init is deterministic.** The k seed centroids are the vectors of
  the k lowest ids under the same portable Lehmer hash ranking the
  DomainMixer uses — reproducible across runs, partitionings, and
  engines (no kmeans|| randomness; a hash-ranked subset of a shuffled
  corpus is an unbiased sample). Driver state: k·d floats.
- **Assign is a map.** Centroids broadcast into an Arrow-batched
  pandas UDF; one argmin over k per row, no shuffle.
- **Update is a partial-aggregated shuffle.** ``posexplode`` of the
  assigned vectors → ``groupBy(cluster, dim).avg`` — map-side combine
  reduces the shuffle to (partitions × k × d) partial rows, and the
  k·d result collects to the driver to form the next centroid set.
  No ``applyInPandas``-per-cluster (that would put a whole cluster's
  rows in one task — the skew trap for big clusters).
- Empty clusters keep their previous centroid (never NaN-poison the
  codebook); iteration stops at ``maxIter`` or when the max centroid
  shift drops below ``tol``.

``maxIter=0`` is a first-class mode: assignment against the raw
hash-ranked seed vectors. It is how the catalog oracles the operator
exactly (every step above is integer/argmin-deterministic, so DuckDB
can replay it), and a cheap "random-projection-free bucketing" in
its own right.

At 100 TB, pick k so clusters stay pairwise-joinable (SemDeDup uses
k in the tens of thousands for billions of docs — cluster size,
not corpus size, bounds the within-cluster join).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from mmlspark_spark.core.base import Estimator, Model
from mmlspark_spark.llm.mixing import _uniform_key


class EmbeddingKMeans(Estimator):
    """Lloyd k-means over an ``array<float/double>`` column."""

    def __init__(self, inputCol: str = "embedding", idCol: str = "vec_id",
                 k: int = 8, maxIter: int = 10, tol: float = 1e-6,
                 seed: int = 42):
        super().__init__(inputCol=inputCol, idCol=idCol, k=k,
                         maxIter=maxIter, tol=tol, seed=seed)

    def transform_schema(self, schema: T.StructType) -> T.StructType:
        self._require_cols(schema, self.inputCol, self.idCol)
        if schema[self.idCol].dataType.typeName() not in (
                "integer", "long", "short"):
            raise ValueError(
                f"EmbeddingKMeans idCol '{self.idCol}' must be an "
                f"integer id (the deterministic seeding key — a "
                f"non-numeric id would null the hash and degrade init "
                f"to an ingest-order head); got "
                f"{schema[self.idCol].dataType.simpleString()}")
        return schema

    def _init_centroids(self, df: DataFrame) -> np.ndarray:
        """Vectors of the k lowest ids under the portable hash rank —
        one small job, k rows collected."""
        u = _uniform_key(self.idCol, self.seed)
        rows = (df.select(F.col(self.idCol).alias("__id"),
                          F.col(self.inputCol).cast("array<double>")
                          .alias("__v"))
                .filter(F.col("__v").isNotNull())
                .orderBy(u, F.col(self.idCol))
                .limit(self.k)
                .collect())
        if len(rows) < self.k:
            raise ValueError(
                f"EmbeddingKMeans: k={self.k} but only {len(rows)} "
                f"non-null vectors available")
        # subscript, not attribute: Row.__v would name-mangle in here
        return np.asarray([r["__v"] for r in rows], dtype="float64")

    def _fit(self, df: DataFrame) -> "EmbeddingKMeansModel":
        cents = self._init_centroids(df)
        model = EmbeddingKMeansModel(
            centroids=[list(c) for c in cents], inputCol=self.inputCol,
            idCol=self.idCol)
        for _ in range(self.maxIter):
            assigned = model.transform(df).select(
                "__km_cluster",
                F.col(self.inputCol).cast("array<double>").alias("__v"))
            stats = (assigned
                     .select("__km_cluster",
                             F.posexplode("__v").alias("__dim", "__x"))
                     .groupBy("__km_cluster", "__dim")
                     .agg(F.avg("__x").alias("__mean"))
                     .collect())
            nxt = cents.copy()  # empty clusters keep their centroid
            for r in stats:
                nxt[r["__km_cluster"], r["__dim"]] = r["__mean"]
            shift = float(np.abs(nxt - cents).max())
            cents = nxt
            model = EmbeddingKMeansModel(
                centroids=[list(c) for c in cents],
                inputCol=self.inputCol, idCol=self.idCol)
            if shift < self.tol:
                break
        return model


class EmbeddingKMeansModel(Model):
    """Adds ``__km_cluster`` (int, centroid index in hash-rank order)
    — rename downstream via ``clusterCol``."""

    def __init__(self, centroids=None, inputCol: str = "embedding",
                 idCol: str = "vec_id", clusterCol: str = "__km_cluster"):
        super().__init__(centroids=[list(c) for c in (centroids or [])],
                         inputCol=inputCol, idCol=idCol,
                         clusterCol=clusterCol)

    def transform_schema(self, schema: T.StructType) -> T.StructType:
        self._require_cols(schema, self.inputCol)
        return T.StructType(
            list(schema.fields)
            + [T.StructField(self.clusterCol, T.IntegerType())])

    def _transform(self, df: DataFrame) -> DataFrame:
        from pyspark.sql.functions import pandas_udf

        cents = self.centroids

        @pandas_udf("int")
        def assign(col):
            import numpy as np
            import pandas as pd

            C = np.asarray(cents, dtype="float64")  # k × d
            vals = col.tolist()
            mask = [v is not None for v in vals]
            out = [None] * len(vals)
            if any(mask):
                X = np.asarray([v for v in vals if v is not None],
                               dtype="float64")
                # Direct (x-c)² differences, NOT the expanded
                # -2x·c+||c||² BLAS form: the DuckDB oracle ranks by
                # list_distance's direct form, and the two formulas
                # round differently — a near-equidistant vector could
                # flip clusters between engines under the expanded
                # form. Row-chunked so the (rows × k × d) difference
                # tensor stays ~32 MB however large k is.
                # np.argmin takes the FIRST minimum → ties break to
                # the lower cluster index (the oracle's ORDER BY
                # dist, cluster contract).
                chunk = max(1, 4_000_000 // max(1, C.size))
                parts = []
                for s in range(0, len(X), chunk):
                    d2 = ((X[s:s + chunk, None, :] - C[None, :, :]) ** 2
                          ).sum(axis=2)
                    parts.append(np.argmin(d2, axis=1))
                labels = np.concatenate(parts)
                it = iter(labels)
                for i, ok in enumerate(mask):
                    if ok:
                        out[i] = int(next(it))
            return pd.Series(out, dtype="Int64")

        return df.withColumn(
            self.clusterCol,
            assign(F.col(self.inputCol).cast("array<double>")))


def semantic_dedup(df: DataFrame, idCol: str = "vec_id",
                   vecCol: str = "embedding", k: int = 8,
                   threshold: float = 0.3, maxIter: int = 0,
                   seed: int = 42) -> DataFrame:
    """SemDeDup: cluster embeddings, then drop any row whose cluster
    contains a lower-id row with cosine ≥ ``threshold``. Returns
    (id, cluster, is_kept) for every non-null-vector input row —
    downstream filters on ``is_kept`` and audits drop counts per
    cluster. NULL vectors are excluded from the output (they cannot
    be deduplicated or clustered; filter them upstream if they must
    be preserved).

    The pairwise search is an equi-join on the cluster label, so its
    cost is Σ cᵢ² over cluster sizes, never N² — k is the knob that
    bounds it. Survivor rule: a row is kept iff it is the minimum id
    of its closed ε-neighborhood within the cluster — deterministic
    and single-pass. Like every transitive dedup (MinHash-CC
    included), similarity CHAINS can drop a row whose surviving
    neighbors are all beyond ε (a "1—2, 2—3" chain keeps only 1);
    when component-exact semantics matter, feed the ≥-threshold pairs
    to :func:`mmlspark_spark.llm.resolve_duplicate_clusters` instead
    — this function trades that precision for zero iterative passes.
    """
    from mmlspark_spark.core.cache import (
        attach_intermediates,
        persist_intermediate,
    )
    from mmlspark_spark.functions.vector import cosine_similarity

    model = EmbeddingKMeans(inputCol=vecCol, idCol=idCol, k=k,
                            maxIter=maxIter, seed=seed).fit(df)
    # persisted: the frame below feeds both self-join sides AND the
    # final verdict join — without the pin the Arrow assignment scan
    # (and any Lloyd lineage) would re-run three times per action
    assigned = persist_intermediate(
        model.transform(df)
        .filter(F.col(vecCol).isNotNull())
        .select(F.col(idCol), F.col("__km_cluster").alias("cluster"),
                F.col(vecCol).cast("array<double>").alias("__v")))
    a = assigned.select(F.col(idCol).alias("id_a"),
                        F.col("cluster").alias("__ca"),
                        F.col("__v").alias("__va"))
    b = assigned.select(F.col(idCol).alias("id_b"),
                        F.col("cluster").alias("__cb"),
                        F.col("__v").alias("__vb"))
    dropped = (a.join(b, (F.col("__ca") == F.col("__cb"))
                      & (F.col("id_a") < F.col("id_b")))
               .filter(cosine_similarity("__va", "__vb") >= threshold)
               .select(F.col("id_b").alias("__dropped"))
               .distinct())
    out = (assigned
           .join(dropped, assigned[idCol] == F.col("__dropped"), "left")
           .select(idCol, "cluster",
                   F.col("__dropped").isNull().alias("is_kept")))
    # caller releases via core.cache.release_intermediates(out)
    return attach_intermediates(out, assigned)
