"""Pipeline API surface."""

from .core import (  # noqa: F401
    build_scaling_bloom,
    build_scaling_bloom_checkpointed,
    build_sketch,
    build_sketch_checkpointed,
    build_sketch_grouped,
    build_sketch_hashed,
    check_membership,
    dedup_approx,
    dedup_exact,
    sketches_from_dataset,
)
from .dedup import (  # noqa: F401
    minhash_lsh_dedup,
    near_dedup_keep_first,
    simhash_dedup,
)
from .similarity import (  # noqa: F401
    cosine_neardup_pairs,
    ivf_knn,
    knn_topk,
    lsh_neardup_pairs,
)
from .skew import salted_counts, top_k_by_count, tumbling_window_agg  # noqa: F401
from .webtext import webtext_pipeline, webtext_pipeline_resumable  # noqa: F401
