from .text import (  # noqa: F401
    fingerprint,
    lang_id,
    quality_score,
    shingles,
    stopword_ratio,
    token_count,
)
from .dedup import (  # noqa: F401
    exact_duplicates,
    jaccard_pairs,
    lsh_candidates,
    minhash_signature,
    simhash,
    simhash_near_dups,
)
from .similarity import ann_pairs, cosine_topk, ivf_assign  # noqa: F401
