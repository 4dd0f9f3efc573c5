from biodata_pipeline_spark.operators.chunking import chunk_documents
from biodata_pipeline_spark.operators.retrieval import (
    cosine_top_k,
    retrieval_rank_metrics,
)
from biodata_pipeline_spark.operators.similarity import (
    similarity_join,
    lsh_similarity_join,
)
from biodata_pipeline_spark.operators.dedup import (
    exact_dedup,
    minhash_lsh_dup_pairs,
    ngram_jaccard_dup_pairs,
    simhash_dup_pairs,
    embedding_dup_pairs,
)
from biodata_pipeline_spark.operators.asof import asof_join
from biodata_pipeline_spark.operators.sessionize import sessionize
from biodata_pipeline_spark.operators.grid import sweep_grid, work_remaining

__all__ = [
    "chunk_documents",
    "cosine_top_k",
    "retrieval_rank_metrics",
    "similarity_join",
    "lsh_similarity_join",
    "exact_dedup",
    "minhash_lsh_dup_pairs",
    "ngram_jaccard_dup_pairs",
    "simhash_dup_pairs",
    "embedding_dup_pairs",
    "asof_join",
    "sessionize",
    "sweep_grid",
    "work_remaining",
]
