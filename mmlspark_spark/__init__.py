"""mmlspark_spark — a PySpark-native analytics/ML engine.

A from-scratch re-expression of the capabilities of Azure/mmlspark
(MMLSpark / SynapseML) as idiomatic PySpark: every operator is declared
through the DataFrame / SQL API so Catalyst + Tungsten pick the physical
strategy; Python touches data only through Arrow-batched pandas UDFs on
the genuinely non-relational paths.

Subpackages
-----------
core           base Transformer/Estimator contracts, schema propagation,
               params, serialization, DataFrame equality helpers
operators      dataflow convenience stages (select/drop/explode/...,
               SummarizeData, ClassBalancer, EnsembleByKey, MiniBatch...)
functions      column-function library (vector slicing, text normalize,
               timestamp featurization, LLM text analysis)
featurize      DataConversion, ValueIndexer, CleanMissingData, Featurize,
               TextFeaturizer ...
ml             TrainClassifier/TrainRegressor, model statistics, AutoML
recommendation SAR (join-based, no driver collect), indexers, ranking
nn             KNN / ConditionalKNN (broadcast tree)
explainers     TabularLIME / KernelSHAP (explode + applyInPandas)
anomaly        IsolationForest-style anomaly scoring
http           HTTP-as-dataflow transformer family
sources        binary / image file readers
streaming      Structured Streaming helpers + HTTP serving
llm            100 TB training-data pipeline ops: dedup (exact, MinHash-LSH,
               SimHash, n-gram Jaccard), similarity search, text quality
"""

__version__ = "0.1.0"
