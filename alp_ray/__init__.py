"""alp_ray — a Ray-Data-native link-graph analytics engine.

A from-scratch rebuild of the *capabilities* of ALP/GraphBLAS + ALP/Pregel
(reference: BenBrock/ALP mirror at /root/reference) on Ray Data's execution
model: Arrow-block datasets, ``map_batches`` kernels, groupby shuffles, and
stateful actor pools — never a translation of the reference's C++ kernels.

Layout
------
- ``alp_ray.functions``  — semirings / monoids / scalar kernels
  (≙ reference include/graphblas/{ops,monoid,semiring}.hpp).
- ``alp_ray.sources``    — corpus synthesis, parquet readers, edge-table
  derivation (≙ reference utils/parser + buildMatrixUnique).
- ``alp_ray.stages``     — map_batches stage callables (edge extraction,
  hashing, spmv scatter, text stats) (≙ BLAS1/2 primitives).
- ``alp_ray.state``      — GraphShard actor engine holding per-partition CSR
  (≙ reference/matrix.hpp CRS+CCS) and checkpoint manifests.
- ``alp_ray.pipelines``  — end-to-end algorithms (pagerank, components,
  labelprop, triangles, …) (≙ include/graphblas/algorithms/).

No function in this package calls ``ray.init`` / ``ray.shutdown``; sessions
are owned by the caller (driver, bench.py, or the test fixture).
"""

__version__ = "0.1.0"
