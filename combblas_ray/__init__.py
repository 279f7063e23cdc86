"""combblas_ray — a Ray-Data-native combinatorial-BLAS / link-graph engine.

Rebuilds the query & data-processing capabilities of CombBLAS 2.0
(reference: hongyx11/CombBLAS, C++/MPI) as idiomatic Ray Data pipelines:
edge tables as `ray.data.Dataset` of Arrow batches, semiring SpMV/SpGEMM
as map_batches + groupby shuffles, and iterative graph algorithms
(PageRank, connected components, label propagation, BFS/SSSP, triangle
counting) driven over stateful actor pools that hold resident CSR block
partitions across iterations.

Nothing here is a port: the reference tells us WHAT to compute (operator
semantics, cited per-module as file:line into /root/reference), the HOW
is Ray-Data-first.
"""

__version__ = "0.1.0"

# Every keyed shuffle in this engine uses repartition(keys=...) + local
# numpy reduce, which requires Ray Data's hash shuffle strategy. Datasets
# capture the DataContext at creation, so set it at import time (process-
# local config; no Ray session is started here).
try:  # pragma: no cover - depends on ray version
    from ray.data.context import DataContext, ShuffleStrategy

    DataContext.get_current().shuffle_strategy = ShuffleStrategy.HASH_SHUFFLE
except Exception:  # noqa: BLE001
    pass
