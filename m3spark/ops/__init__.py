"""Large-scale training-data pipeline operators.

Beyond the reference's validation surface: deduplication, similarity
search, text analysis, and multimodal-column plumbing — the operations a
100 TB web-corpus pipeline needs next to schema validation.
"""

from .dedup import (  # noqa: F401
    char_shingles, dedup_clusters, exact_duplicates, jaccard_pairs,
    minhash_pairs, minhash_signatures, simhash,
)
from .similarity import (  # noqa: F401
    cosine_topk, ivf_persist_fixed, ivf_topk, ivf_topk_fixed,
    ivf_topk_fixed_persisted, ivf_topk_queries, lsh_ann_pairs,
    lsh_candidates,
)
from .phash import portable_hash60  # noqa: F401
from .text import fingerprint, lang_id, quality, token_stats  # noqa: F401
from .multimodal import decode_binary_features  # noqa: F401
