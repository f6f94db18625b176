from trisk_datawrangle_spark.llm.text import (  # noqa: F401
    fingerprint,
    lang_id,
    quality_score,
    token_count,
    tokenize,
)
from trisk_datawrangle_spark.llm.dedup import (  # noqa: F401
    exact_dedup,
    minhash_lsh_pairs,
    minhash_signature,
    ngram_jaccard_pairs,
    simhash64,
    word_ngrams,
)
from trisk_datawrangle_spark.llm.similarity import (  # noqa: F401
    cosine_similarity,
    cosine_topk,
    lsh_bucket_topk,
)
