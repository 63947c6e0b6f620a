"""Index artifact model.

Reference counterpart: ``IndexArtifact(kind, data, metadata)``
(modular.py:19-25) — a single in-memory object.  The Spark-native
artifact splits into (a) ``tables``: DataFrames (bucket tables, cluster
assignments, code tables) that scale with the base data and live as
Parquet at cluster scale, and (b) ``params``: small driver-side objects
(centroids, projection matrices, codebooks, calibration stats) that are
broadcast to executors.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import DataFrame


@dataclass
class IndexArtifact:
    kind: str
    tables: dict[str, DataFrame] = field(default_factory=dict)
    params: dict[str, Any] = field(default_factory=dict)
    metadata: dict[str, Any] = field(default_factory=dict)
