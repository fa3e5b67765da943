"""streammd_ray — a from-scratch Ray-Data-native distributed sketch /
approximate-aggregation engine.

Semantics grounded in the reference engine delocalizer/streammd
(/root/reference, studied for behaviour only): single-pass Bloom-filter
duplicate marking, generalized here into five mergeable UDAF sketches (Bloom,
HyperLogLog, count-min, t-digest, KLL) over Parquet tables of conversation /
agent transcripts, executed as ray.data.Dataset pipelines of map_batches over
zero-copy Arrow batches with actor pools for stateful stages.
"""

__version__ = "0.1.0"

from .compat import apply_ray_patches as _apply_ray_patches

_apply_ray_patches()
