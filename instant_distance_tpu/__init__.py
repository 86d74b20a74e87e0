"""instant-distance-tpu: a TPU-native HNSW indexing-and-search framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
djc/instant-distance (fast HNSW approximate nearest neighbor search):
dense padded adjacency arrays in HBM instead of pointer-chasing node types,
batched wavefront beam search instead of per-query heaps, wave-based
batched construction instead of rayon threads + per-node locks, and
mesh-sharded indices with cross-shard top-k merge for multi-chip scale.
"""

from .config import Builder, Config, Heuristic, DEFAULT_M, INVALID

__version__ = "0.1.0"

__all__ = [
    "Builder",
    "Config",
    "Heuristic",
    "Hnsw",
    "HnswMap",
    "Search",
    "Neighbor",
    "BruteForce",
    "ScanIndex",
    "PackedHnsw",
    "HybridIndex",
    "StreamingHnsw",
    "ShardedHnsw",
    "ShardedScanIndex",
    "ReplicatedHnsw",
    "ReplicatedPackedHnsw",
    "ReplicatedScanIndex",
    "DEFAULT_M",
    "INVALID",
]


def __getattr__(name):
    # Lazy imports keep `import instant_distance_tpu` light and avoid
    # circular imports between config and model modules.
    if name in ("Hnsw", "HnswMap", "Search", "Neighbor"):
        from .models import hnsw

        return getattr(hnsw, name)
    if name == "BruteForce":
        from .models.brute import BruteForce

        return BruteForce
    if name == "ScanIndex":
        from .models.scan import ScanIndex

        return ScanIndex
    if name == "PackedHnsw":
        from .models.packed import PackedHnsw

        return PackedHnsw
    if name == "HybridIndex":
        from .models.hybrid import HybridIndex

        return HybridIndex
    if name == "StreamingHnsw":
        from .models.streaming import StreamingHnsw

        return StreamingHnsw
    if name == "ShardedHnsw":
        from .parallel.sharded import ShardedHnsw

        return ShardedHnsw
    if name == "ShardedScanIndex":
        from .parallel.scan import ShardedScanIndex

        return ShardedScanIndex
    if name in ("ReplicatedHnsw", "ReplicatedPackedHnsw",
                "ReplicatedScanIndex"):
        from .parallel import replicated

        return getattr(replicated, name)
    raise AttributeError(name)
