from biodata_pipeline_spark.operators.chunking import chunk_documents
from biodata_pipeline_spark.operators.retrieval import (
    cosine_top_k,
    retrieval_rank_metrics,
)
from biodata_pipeline_spark.operators.similarity import (
    similarity_join,
    similarity_join_vectorized,
    lsh_similarity_join,
)
from biodata_pipeline_spark.operators.dedup import (
    exact_dedup,
    minhash_lsh_dup_pairs,
    ngram_jaccard_dup_pairs,
    simhash_dup_pairs,
    embedding_dup_pairs,
    embedding_dedup_survivors,
)
from biodata_pipeline_spark.operators.asof import asof_join
from biodata_pipeline_spark.operators.sessionize import sessionize
from biodata_pipeline_spark.operators.grid import (
    expand_grid_over,
    grid_apply,
    sweep_grid,
    work_remaining,
)
from biodata_pipeline_spark.operators.clusters import (
    connected_components,
    dedup_survivors,
)
from biodata_pipeline_spark.operators.layout import length_batched
from biodata_pipeline_spark.operators.skew import salted_agg, salted_join
from biodata_pipeline_spark.operators.similarity import ivf_ann
from biodata_pipeline_spark.operators.upsert import latest_by_key, upsert
from biodata_pipeline_spark.operators.retrieval import retrieve_top_k_auto
from biodata_pipeline_spark.operators.dedup import SignatureStore, collapse_exact
from biodata_pipeline_spark.operators.enrichment import enrich_with_external_calls
from biodata_pipeline_spark.operators.rollup import base_rollup, cascade_rollup
from biodata_pipeline_spark.operators.sketches import cms_build, cms_lookup

__all__ = [
    "base_rollup",
    "cascade_rollup",
    "cms_build",
    "cms_lookup",
    "expand_grid_over",
    "grid_apply",
    "connected_components",
    "dedup_survivors",
    "length_batched",
    "salted_agg",
    "salted_join",
    "ivf_ann",
    "retrieve_top_k_auto",
    "SignatureStore",
    "collapse_exact",
    "enrich_with_external_calls",
    "chunk_documents",
    "cosine_top_k",
    "retrieval_rank_metrics",
    "similarity_join",
    "similarity_join_vectorized",
    "latest_by_key",
    "upsert",
    "lsh_similarity_join",
    "exact_dedup",
    "minhash_lsh_dup_pairs",
    "ngram_jaccard_dup_pairs",
    "simhash_dup_pairs",
    "embedding_dup_pairs",
    "embedding_dedup_survivors",
    "asof_join",
    "sessionize",
    "sweep_grid",
    "work_remaining",
]
