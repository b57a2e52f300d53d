"""linear_kdtree_spark — a PySpark-native spatial index + join engine.

A from-scratch re-expression (NOT a port) of the capabilities of
rob05c/linear-kdtree (reference at /root/reference, C++/CUDA/TBB):

- distributed linear kd-tree build (reference nocuda.cpp:70-138) as a
  level-synchronous DataFrame loop — one aggregation shuffle per tree level,
  heap-ordered flat split table, final ``repartitionByRange`` +
  ``sortWithinPartitions`` replacing the reference's in-place parallel
  block partition (quicksort.hh:480-534),
- tree-path "Morton" codes (reference lkt.cpp:140-157) as pure JVM column
  expressions during the build and as a vectorized Arrow/pandas UDF for
  post-hoc labelling of new points,
- the query workloads the index exists to serve: kNN, point-in-polygon,
  tile assignment (H3/S2-style), spatial joins, raster aggregation,
- plus the web-scale training-data-pipeline operator suite the engine is
  deployed inside: dedup (exact / MinHash-LSH / SimHash / n-gram Jaccard /
  embedding near-dup), similarity search, text analysis, multimodal column
  plumbing.

Everything is DataFrame/Catalyst-first; Python executes only inside
Arrow-batched pandas UDFs (never per-row).
"""

from linear_kdtree_spark.session import get_spark
from linear_kdtree_spark.operators.build import LktIndex, lkt_build
from linear_kdtree_spark.operators.tree import SplitTree

__version__ = "0.1.0"

__all__ = ["get_spark", "lkt_build", "LktIndex", "SplitTree", "__version__"]
