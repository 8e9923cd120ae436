"""Engine-native operators that Spark lacks as built-ins.

- ``topk_join``  — the reference's ``FEDERATED_SEARCH`` top-k vector search
  (reference ``README.md:403-407``) as a similarity join with broadcast /
  reverse-broadcast / shuffle / LSH physical strategies.
- ``dedup``      — exact, MinHash-LSH, SimHash, n-gram Jaccard and
  embedding-cosine near-duplicate detection (SURVEY.md §2.11).
- ``ann``        — LSH bucketing used by the approximate strategies.
"""

from confluent_kafka_vector_search_prompt_inference_spark.operators.topk_join import topk_similarity_join
from confluent_kafka_vector_search_prompt_inference_spark.operators.dedup import (
    dedup_exact,
    exact_duplicate_groups,
    minhash_signatures,
    minhash_lsh_candidates,
    ngram_jaccard_pairs,
    simhash_signatures,
    simhash_near_duplicates,
    embedding_near_duplicates,
)

__all__ = [
    "topk_similarity_join",
    "dedup_exact",
    "exact_duplicate_groups",
    "minhash_signatures",
    "minhash_lsh_candidates",
    "ngram_jaccard_pairs",
    "simhash_signatures",
    "simhash_near_duplicates",
    "embedding_near_duplicates",
]
