from mmlspark_spark.llm.dedup import (
    ExactDeduplicator,
    IncrementalDeduplicator,
    LineDeduplicator,
    MinHashLSHDeduplicator,
    SimHashDeduplicator,
    connected_components,
    duplicated_substring_spans,
    ngram_jaccard_pairs,
    resolve_duplicate_clusters,
    winnow_fingerprints,
)
from mmlspark_spark.llm.clustering import (
    EmbeddingKMeans,
    EmbeddingKMeansModel,
    semantic_dedup,
)
from mmlspark_spark.llm.embeddings import EmbeddingPCA, EmbeddingPCAModel
from mmlspark_spark.llm.export import (
    read_training_shard,
    shard_assignment,
    verify_training_shards,
    write_training_shards,
)
from mmlspark_spark.llm.lm import NGramLanguageModel, NGramLMModel
from mmlspark_spark.llm.mixing import DomainMixer, HashSplitter
from mmlspark_spark.llm.packing import (
    BenchmarkDecontaminator,
    SequencePacker,
    cdc_chunks,
    chunk_documents,
)
from mmlspark_spark.llm.quality import QualityFilter
from mmlspark_spark.llm.scrub import (
    MarkupStripper,
    PIIRedactor,
    canonicalize_url,
    extract_domains,
    extract_urls,
    redact_pii,
    strip_markup,
)
from mmlspark_spark.llm.index_common import (
    compact_all,
    index_info,
    repair_file_append,
)
from mmlspark_spark.llm.multimodal_dedup import (
    AudioFingerprintDeduplicator,
    ImageDHashDeduplicator,
    VideoDHashDeduplicator,
    audio_fingerprint_expr,
    dhash_expr,
)
from mmlspark_spark.llm.retrieval import (
    BM25Retriever,
    reciprocal_rank_fusion,
)
from mmlspark_spark.llm.selection import (
    DSIRModel,
    DSIRSelector,
    hashed_grams,
)
from mmlspark_spark.llm.similarity import (
    BruteForceKNN,
    IVFKNN,
    LSHKNN,
    PQKNN,
)
from mmlspark_spark.llm.tokenizer import (
    BPETokenizer,
    BPETokenizerModel,
    build_vocabulary,
)

__all__ = [
    "ExactDeduplicator",
    "compact_all",
    "index_info",
    "repair_file_append",
    "IncrementalDeduplicator",
    "LineDeduplicator",
    "MinHashLSHDeduplicator",
    "SimHashDeduplicator",
    "ImageDHashDeduplicator",
    "dhash_expr",
    "AudioFingerprintDeduplicator",
    "audio_fingerprint_expr",
    "VideoDHashDeduplicator",
    "DSIRSelector",
    "DSIRModel",
    "hashed_grams",
    "BM25Retriever",
    "reciprocal_rank_fusion",
    "ngram_jaccard_pairs",
    "duplicated_substring_spans",
    "connected_components",
    "resolve_duplicate_clusters",
    "winnow_fingerprints",
    "BruteForceKNN",
    "LSHKNN",
    "IVFKNN",
    "PQKNN",
    "SequencePacker",
    "BenchmarkDecontaminator",
    "QualityFilter",
    "EmbeddingPCA",
    "EmbeddingPCAModel",
    "NGramLanguageModel",
    "NGramLMModel",
    "DomainMixer",
    "HashSplitter",
    "EmbeddingKMeans",
    "EmbeddingKMeansModel",
    "semantic_dedup",
    "write_training_shards",
    "read_training_shard",
    "verify_training_shards",
    "shard_assignment",
    "MarkupStripper",
    "strip_markup",
    "BPETokenizer",
    "build_vocabulary",
    "cdc_chunks",
    "chunk_documents",
    "BPETokenizerModel",
    "PIIRedactor",
    "redact_pii",
    "extract_urls",
    "canonicalize_url",
    "extract_domains",
]
