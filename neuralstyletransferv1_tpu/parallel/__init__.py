"""Multi-chip execution: mesh construction and frame-batch data parallelism.

The workload's one real multi-chip axis is the frame batch (SURVEY §2.8): the
stylizer forwards are embarrassingly parallel per frame, while the temporal
EMA recurrences are cheap and run as in-graph scans with a 1-frame halo
between neighboring shards.
"""

from .mesh import make_mesh, shard_stylizer

__all__ = ["make_mesh", "shard_stylizer"]
