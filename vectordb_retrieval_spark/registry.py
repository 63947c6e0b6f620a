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


def _ivf_sqfp16(**kw):
    from vectordb_retrieval_spark.operators.quant import SQfp16Codec

    return IVFIndexer(codec=SQfp16Codec(), **kw)


def _ivf_pq(m: int = 8, ksub: int = 256, **kw):
    metric = kw.get("metric", "l2")
    return IVFIndexer(
        codec=PQCodec(m=m, ksub=ksub, normalize=(metric == "cosine")), **kw
    )


def _ivf_opq(m: int = 8, ksub: int = 256, opq_iters: int = 8, **kw):
    from vectordb_retrieval_spark.operators.quant import OPQCodec

    metric = kw.get("metric", "l2")
    return IVFIndexer(
        codec=OPQCodec(
            m=m, ksub=ksub, normalize=(metric == "cosine"), opq_iters=opq_iters
        ),
        **kw,
    )


def _opq(m: int = 8, ksub: int = 256, **kw):
    return PQIndexer(m=m, ksub=ksub, opq=True, **kw)


def _ivf_pca(dim_out: int = 8, **kw):
    from vectordb_retrieval_spark.operators.quant import PCACodec

    return IVFIndexer(codec=PCACodec(dim_out), **kw)


register_indexer("brute_force", BruteForceIndexer)
register_indexer("ivf_flat", IVFIndexer)
register_indexer("ivf_fixed", FixedCentroidIVFIndexer)
register_indexer("ivf_sq8", _ivf_sq8)
register_indexer("ivf_sqfp16", _ivf_sqfp16)
register_indexer("ivf_pq", _ivf_pq)
register_indexer("ivf_opq", _ivf_opq)
register_indexer("ivf_pca", _ivf_pca)
register_indexer("pq", PQIndexer)
register_indexer("opq", _opq)
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


def parse_index_spec(
    spec: str, metric: str = "l2", **params
) -> tuple[dict[str, Any], dict[str, Any]]:
    """FAISS-style index-factory string → (indexer_cfg, searcher_cfg).

    Parity: the reference's generic factory surface
    (``src/algorithms/approximate_search.py:6-87`` accepts any
    ``faiss.index_factory(dimension, index_type)`` string).  Supported
    specs map onto this engine's native operators:

    - ``"Flat"``                 → brute_force + linear
    - ``"IVF{n},Flat"``          → ivf_flat(nlist=n) + ivf
    - ``"IVF{n},SQ8"``           → ivf_sq8(nlist=n) + ivf
    - ``"IVF{n},SQfp16"``        → ivf_sqfp16(nlist=n) + ivf
    - ``"IVF{n},PQ{m}[x{b}]"``   → ivf_pq(nlist=n, m=m, ksub=2^b) + ivf
    - ``"PQ{m}[x{b}]"``          → pq(m=m, ksub=2^b) + pq_adc
    - ``"OPQ{m},PQ{m}[x{b}]"``   → opq (learned rotation + PQ) + pq_adc
    - ``"OPQ{m},IVF{n},PQ{m}"``  → ivf_opq(nlist=n, m=m) + ivf
    - ``"PCA{d},IVF{n},Flat"``   → ivf_pca(nlist=n, dim_out=d) + ivf
      (FAISS PCA pre-transform: vectors stored as top-d principal
      coordinates, decoded to the rank-d reconstruction at scan time)
    - ``"HNSW{m}"``              → graph_ann(m=m) + graph_ann (the
      survey-sanctioned partitioned-graph HNSW replacement, SURVEY §7.1#8)
    - ``"LSH"``                  → lsh + lsh

    Extra ``params`` spread into the indexer config except the
    searcher-time knobs (``nprobe``, ``ef_search``,
    ``candidate_multiplier``, ``probe_partitions``), which route to the
    searcher — the same split the reference makes when it pushes
    ``kwargs['nprobe']`` onto the built index
    (approximate_search.py:49-50)."""
    import re

    search_keys = {
        "nprobe", "ef_search", "candidate_multiplier", "probe_partitions",
    }
    icfg: dict[str, Any] = {"metric": metric}
    scfg: dict[str, Any] = {}
    for key, val in params.items():
        (scfg if key in search_keys else icfg)[key] = val

    s = spec.strip()
    parts = [p.strip() for p in s.split(",")]

    def _pq_args(token: str) -> dict[str, int]:
        m = re.fullmatch(r"PQ(\d+)(?:x(\d+))?", token)
        if not m:
            raise ValueError(f"bad PQ clause in index spec {spec!r}")
        out = {"m": int(m.group(1))}
        if m.group(2):
            out["ksub"] = 2 ** int(m.group(2))
        return out

    # FAISS "OPQ{m}" prefix: an orthogonal pre-rotation paired with the
    # PQ clause that follows ("OPQ16,PQ16", "OPQ16,IVF256,PQ16").  The
    # trailing PQ clause supplies m/ksub; the prefix's m must agree.
    # FAISS "PCA{d}" prefix: a learned dimensionality-reduction
    # transform ahead of the index; maps onto the PCACodec codec slot
    mpca = re.fullmatch(r"PCA(\d+)", parts[0]) if len(parts) >= 2 else None
    if mpca:
        rest = parts[1:]
        if len(rest) == 2 and rest[1] == "Flat":
            mivf = re.fullmatch(r"IVF(\d+)", rest[0])
            if mivf:
                icfg["nlist"] = int(mivf.group(1))
                icfg["dim_out"] = int(mpca.group(1))
                return {"type": "ivf_pca", **icfg}, {"type": "ivf", **scfg}
        raise ValueError(f"unsupported index spec {spec!r}")

    mopq = re.fullmatch(r"OPQ(\d+)", parts[0]) if len(parts) >= 2 else None
    if mopq:
        opq_m = int(mopq.group(1))
        rest = parts[1:]
        if len(rest) == 1 and rest[0].startswith("PQ"):
            args = _pq_args(rest[0])
            if args["m"] != opq_m:
                raise ValueError(f"OPQ{opq_m} paired with PQ{args['m']} in {spec!r}")
            return {"type": "opq", **args, **icfg}, {"type": "pq_adc", **scfg}
        if len(rest) == 2 and rest[1].startswith("PQ"):
            mivf = re.fullmatch(r"IVF(\d+)", rest[0])
            if mivf:
                args = _pq_args(rest[1])
                if args["m"] != opq_m:
                    raise ValueError(
                        f"OPQ{opq_m} paired with PQ{args['m']} in {spec!r}"
                    )
                icfg["nlist"] = int(mivf.group(1))
                return {"type": "ivf_opq", **args, **icfg}, {"type": "ivf", **scfg}
        raise ValueError(f"unsupported index spec {spec!r}")

    if len(parts) == 1:
        p = parts[0]
        if p == "Flat":
            return {"type": "brute_force", **icfg}, {"type": "linear", **scfg}
        if p == "LSH":
            return {"type": "lsh", **icfg}, {"type": "lsh", **scfg}
        m = re.fullmatch(r"HNSW(\d+)", p)
        if m:
            return (
                {"type": "graph_ann", "m": int(m.group(1)), **icfg},
                {"type": "graph_ann", **scfg},
            )
        if p.startswith("PQ"):
            return (
                {"type": "pq", **_pq_args(p), **icfg},
                {"type": "pq_adc", **scfg},
            )
    elif len(parts) == 2:
        m = re.fullmatch(r"IVF(\d+)", parts[0])
        if m:
            icfg["nlist"] = int(m.group(1))
            quant = parts[1]
            if quant == "Flat":
                return {"type": "ivf_flat", **icfg}, {"type": "ivf", **scfg}
            if quant == "SQ8":
                return {"type": "ivf_sq8", **icfg}, {"type": "ivf", **scfg}
            if quant == "SQfp16":
                return {"type": "ivf_sqfp16", **icfg}, {"type": "ivf", **scfg}
            if quant.startswith("PQ"):
                return (
                    {"type": "ivf_pq", **_pq_args(quant), **icfg},
                    {"type": "ivf", **scfg},
                )
    raise ValueError(f"unsupported index spec {spec!r}")


def algorithm_from_spec(
    spec: str, metric: str = "l2", **params
) -> CompositeAlgorithm:
    """One-call factory: ``algorithm_from_spec("IVF256,SQ8", nprobe=10)``
    — the ergonomic equivalent of the reference's
    ``ApproximateSearch(..., index_type="IVF256,SQ8", nprobe=10)``."""
    icfg, scfg = parse_index_spec(spec, metric, **params)
    return get_algorithm_instance(icfg, scfg)
