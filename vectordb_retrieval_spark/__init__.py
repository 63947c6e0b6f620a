"""vectordb_retrieval_spark — a PySpark-native vector-retrieval analytics engine.

A ground-up re-design (not a port) of the capabilities of the
Human-Augment-Analytics/vectordb-retrieval research framework
(reference, read-only, at /root/reference): batch k-nearest-neighbor
search over dense embedding collections with exact, IVF/PQ/SQ-quantized,
and LSH operators; ground-truth construction; a retrieval-quality
metrics suite; a config-driven indexer/searcher registry; index
persistence with fingerprint validation; and large-scale
training-data-pipeline operators (dedup, similarity search, text
analysis, multimodal column plumbing).

Everything is expressed Spark-first: DataFrames + Catalyst for the
plans, broadcast variables for small index artifacts (centroids,
projection matrices), Arrow-batched pandas kernels only where built-in
column functions genuinely can't express the math (dense gram-matrix
distance blocks).
"""

__version__ = "0.1.0"

from vectordb_retrieval_spark.session import get_spark  # noqa: F401
