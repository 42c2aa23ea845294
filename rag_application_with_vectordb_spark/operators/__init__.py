from .ann import ann_ivf_topk, ann_lsh_topk, hyperplane_buckets, ivf_assign  # noqa: F401
from .asof import asof_join_pandas, asof_join_prior  # noqa: F401
from .chunker import chunk_documents, global_chunk_index  # noqa: F401
from .dedup import (  # noqa: F401
    embedding_neardup_pairs,
    exact_dup_groups,
    minhash_lsh_pairs,
    minhash_signatures,
    ngram_jaccard_pairs,
    simhash_blocked_pairs,
    simhash_pairs,
    simhash_signatures,
)
from .kmeans import assign_clusters, kmeans_fit  # noqa: F401
from .knn import knn, knn_join  # noqa: F401
from .multimodal import decode_media_stub, with_binary_payload  # noqa: F401
from .prefix import bucketed_row_number, bucketed_running_sum  # noqa: F401
from .rangejoin import range_join_within  # noqa: F401
from .skew import salted_join  # noqa: F401
