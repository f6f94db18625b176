from trisk_datawrangle_spark.llm.text import (  # noqa: F401
    fingerprint,
    lang_id,
    normalize_text,
    pii_scrub,
    quality_score,
    token_count,
    tokenize,
)
from trisk_datawrangle_spark.llm.dedup import (  # noqa: F401
    exact_dedup,
    minhash_lsh_pairs,
    minhash_signatures,
    ngram_jaccard_pairs,
    shingle_hashes,
    simhash64,
    simhash_table,
    word_ngrams,
)
from trisk_datawrangle_spark.llm.similarity import (  # noqa: F401
    cosine_similarity,
    cosine_topk,
    lsh_bucket_topk,
)
from trisk_datawrangle_spark.llm.lsh_index import (  # noqa: F401
    lsh_index_append,
    minhash_lsh_index_pairs,
    stream_dedup_ingest,
    write_lsh_index,
)
from trisk_datawrangle_spark.llm.pq_index import (  # noqa: F401
    ivf_pq_index_topk,
    write_ivf_pq_index,
)
