from .dedup import (
    BloomMarkStage,
    add_key_columns,
    canonical_key,
    dedup_exact_first,
    make_shard_actors,
)
from .sketch_agg import (
    BloomCountAgg,
    CmsAgg,
    HllAgg,
    KllAgg,
    MultiSketchStage,
    SketchAgg,
    TDigestAgg,
    run_sketches,
    sketch_column,
    tree_merge,
)

__all__ = [
    "BloomMarkStage",
    "add_key_columns",
    "canonical_key",
    "dedup_exact_first",
    "make_shard_actors",
    "MultiSketchStage",
    "run_sketches",
    "sketch_column",
    "tree_merge",
    "SketchAgg",
    "HllAgg",
    "CmsAgg",
    "TDigestAgg",
    "KllAgg",
    "BloomCountAgg",
]
