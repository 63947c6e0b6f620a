"""Indexer/searcher registries + Composite pairing.

Parity with the reference's plugin architecture: string-keyed registries
(``register_indexer``/``register_searcher``, modular.py:85-106), the
``CompositeAlgorithm`` indexer+searcher pairing (modular.py:554-622),
and the top-level algorithm factory (algorithms/__init__.py:25-47) that
YAML configs resolve through (runner.py:274-299).  Configs written for
the reference's modular path port with only class-name mapping.
"""

from __future__ import annotations

from typing import Any, Callable

from pyspark.sql import DataFrame

from vectordb_retrieval_spark.artifacts import IndexArtifact
from vectordb_retrieval_spark.operators.cluster_pruned import (
    ClusterPrunedExactIndexer,
    ClusterPrunedExactSearcher,
)
from vectordb_retrieval_spark.operators.exact import exact_knn
from vectordb_retrieval_spark.operators.graph_ann import (
    GraphANNIndexer,
    GraphANNSearcher,
)
from vectordb_retrieval_spark.operators.ivf import (
    FixedCentroidIVFIndexer,
    IVFIndexer,
    IVFSearcher,
)
from vectordb_retrieval_spark.operators.lsh import LSHIndexer, LSHSearcher
from vectordb_retrieval_spark.operators.pq import PQADCSearcher, PQIndexer
from vectordb_retrieval_spark.operators.quant import PQCodec, SQ8Codec

INDEXER_REGISTRY: dict[str, Callable[..., Any]] = {}
SEARCHER_REGISTRY: dict[str, Callable[..., Any]] = {}


def register_indexer(name: str, cls: Callable[..., Any]) -> None:
    INDEXER_REGISTRY[name] = cls


def register_searcher(name: str, cls: Callable[..., Any]) -> None:
    SEARCHER_REGISTRY[name] = cls


class BruteForceIndexer:
    """Raw-vector 'index' (reference: modular.py:121-133) — the exact
    path needs no structure; the artifact is the base table itself."""

    def __init__(self, metric: str = "l2", **_):
        self.metric = metric

    def build(self, base_df: DataFrame, id_col: str = "id", vec_col: str = "vec"):
        from pyspark.sql import functions as F

        vectors = base_df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("vec"))
        return IndexArtifact(
            kind="raw_vectors",
            tables={"vectors": vectors},
            params={"metric": self.metric},
            metadata={"metric": self.metric},
        )


class LinearSearcher:
    """Full-scan exact top-k (reference: modular.py:312-390)."""

    def __init__(self, **_):
        self.artifact: IndexArtifact | None = None

    def attach(self, artifact: IndexArtifact) -> "LinearSearcher":
        self.artifact = artifact
        return self

    def search(self, query_df: DataFrame, k: int, qid_col: str = "qid", vec_col: str = "vec"):
        art = self.artifact
        return exact_knn(
            art.tables["vectors"],
            query_df,
            k,
            art.params["metric"],
            id_col="id",
            vec_col="vec",
            qid_col=qid_col,
            qvec_col=vec_col,
        )


class CompositeAlgorithm:
    """(indexer, searcher) pairing with artifact handoff
    (reference: modular.py:554-622, the tests' main interface)."""

    def __init__(self, indexer, searcher):
        self.indexer = indexer
        self.searcher = searcher
        self.artifact: IndexArtifact | None = None

    def build_index(self, base_df: DataFrame, id_col: str = "id", vec_col: str = "vec"):
        self.artifact = self.indexer.build(base_df, id_col=id_col, vec_col=vec_col)
        self.searcher.attach(self.artifact)
        return self.artifact

    def batch_search(self, query_df: DataFrame, k: int, qid_col: str = "qid", vec_col: str = "vec"):
        if self.artifact is None:
            raise RuntimeError("build_index must run before batch_search")
        return self.searcher.search(query_df, k, qid_col=qid_col, vec_col=vec_col)


def _ivf_sq8(**kw):
    return IVFIndexer(codec=SQ8Codec(), **kw)


def _ivf_pq(m: int = 8, ksub: int = 256, **kw):
    metric = kw.get("metric", "l2")
    return IVFIndexer(
        codec=PQCodec(m=m, ksub=ksub, normalize=(metric == "cosine")), **kw
    )


register_indexer("brute_force", BruteForceIndexer)
register_indexer("ivf_flat", IVFIndexer)
register_indexer("ivf_fixed", FixedCentroidIVFIndexer)
register_indexer("ivf_sq8", _ivf_sq8)
register_indexer("ivf_pq", _ivf_pq)
register_indexer("pq", PQIndexer)
register_indexer("lsh", LSHIndexer)
register_indexer("cluster_pruned_exact", ClusterPrunedExactIndexer)
register_indexer("graph_ann", GraphANNIndexer)

register_searcher("linear", LinearSearcher)
register_searcher("ivf", IVFSearcher)
register_searcher("pq_adc", PQADCSearcher)
register_searcher("lsh", LSHSearcher)
register_searcher("cluster_pruned_exact", ClusterPrunedExactSearcher)
register_searcher("graph_ann", GraphANNSearcher)


def get_algorithm_instance(
    indexer: dict[str, Any], searcher: dict[str, Any]
) -> CompositeAlgorithm:
    """Factory from config dicts: {"type": name, ...params}."""
    icfg = dict(indexer)
    scfg = dict(searcher)
    icls = INDEXER_REGISTRY[icfg.pop("type")]
    scls = SEARCHER_REGISTRY[scfg.pop("type")]
    return CompositeAlgorithm(icls(**icfg), scls(**scfg))
