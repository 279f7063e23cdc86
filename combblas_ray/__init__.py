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
