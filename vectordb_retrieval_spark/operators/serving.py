"""Broadcast-index serving — the small-index fast path for the IVF
family and standalone PQ.

The partitioned scan (``kernels.cluster_scan_topk``) is the at-scale
plan: the assignment table is the big side, probe lists prune its
partitions, and fragment top-ks shuffle into a global per-query merge.
But when the PACKED index (per-cluster id arrays + code/vector
matrices) fits under ``broadcast_threshold`` bytes — always true for
the reference's in-RAM configurations (modular.py:341-385), and true at
cluster scale for compressed codes over sharded or per-tenant corpora —
that dataflow is upside down: the index is smaller than the candidate
traffic it generates.  This module flips it, the same inversion Spark's
broadcast-join threshold encodes and the same one graph_ann.py applies
to its shard blobs (graph_ann.py:507-518): broadcast the packed index
once, scan the QUERY table, and run each query's entire
probe → decode → scan → top-k pipeline inside a single task.  One
narrow mapInPandas job, zero shuffle, exactly k rows out per query.

Result parity: probe selection (nprobe nearest centroids, ties by
cluster id), decode, float64 distance arithmetic, and (dist, id)
tie-breaks replicate ``cluster_scan_topk`` + ``topk_per_query``
exactly, so the oracle hash checks hold on either path.

Per-worker warm cache: the broadcast value lives inside each reused
Python worker across jobs, and decoded float64 cluster matrices memoize
on it — repeated searches against the same artifact skip decode
entirely, which is what makes repeated-artifact serving approach the
reference's in-memory throughput.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from vectordb_retrieval_spark.functions.distance import (
    normalize_rows,
    pairwise_distances,
)


class PackedClusters:
    """Pickled into the index broadcast: per-cluster id arrays and
    payload matrices (float32 vectors, or uint8/int16 codes when a
    codec is attached), plus the coarse centroids for in-kernel
    probing.  The decode cache is per-process state and is excluded
    from pickling."""

    def __init__(self, cids, ids, payloads, codec, centroids):
        self.cids = cids
        self.ids = ids
        self.payloads = payloads
        self.codec = codec
        self.centroids = centroids
        self.index = {int(c): i for i, c in enumerate(cids)}
        self._dec: dict[int, np.ndarray] = {}

    def decoded(self, i: int) -> np.ndarray:
        out = self._dec.get(i)
        if out is None:
            raw = self.payloads[i]
            # float64, matching what cluster_scan_topk hands to
            # pairwise_distances after its internal upcast (float32
            # raw vectors upcast exactly; codec decode is float64) —
            # cached so repeated searches skip decode AND upcast
            out = (
                raw.astype(np.float64)
                if self.codec is None
                else self.codec.decode(raw)
            )
            self._dec[i] = out
        return out

    def __getstate__(self):
        state = self.__dict__.copy()
        state["_dec"] = {}
        return state

    def nbytes(self) -> int:
        return sum(p.nbytes + i.nbytes for p, i in zip(self.payloads, self.ids))


def pack_clusters(
    assignment: DataFrame, payload_col: str, centroids, codec
) -> PackedClusters:
    """Collect an assignment/code table into a PackedClusters bundle.
    Caller is responsible for the size gate (estimate first, collect
    only under the threshold)."""
    pdf = assignment.select("cluster_id", "id", payload_col).toPandas()
    cid = pdf["cluster_id"].to_numpy(dtype=np.int64)
    order = np.argsort(cid, kind="stable")
    cid = cid[order]
    ids_all = pdf["id"].to_numpy(dtype=np.int64)[order]
    payload = np.vstack(pdf[payload_col].to_numpy())[order]
    if codec is not None and payload.size and 0 <= payload.min() and payload.max() < 256:
        payload = payload.astype(np.uint8)  # SQ8 / PQ(ksub<=256) codes
    ucids, starts = np.unique(cid, return_index=True)
    bounds = np.r_[starts, len(cid)]
    ids = [ids_all[bounds[i] : bounds[i + 1]] for i in range(len(ucids))]
    pays = [payload[bounds[i] : bounds[i + 1]] for i in range(len(ucids))]
    return PackedClusters(ucids, ids, pays, codec, centroids)


def artifact_serving_broadcast(
    art,
    spark,
    threshold: int,
    table: str = "assignment",
):
    """Memoized packed-index broadcast for an IVF-family artifact
    (flat, SQ8 or PQ payload).  Returns None when the packed index
    would exceed ``threshold`` — size is ESTIMATED from row count ×
    payload width before any collect, so the driver never materializes
    an over-threshold index.  Underscore params are runtime-only: never
    persisted, never inherited by append/delete derivatives."""
    from vectordb_retrieval_spark.operators.quant import PQCodec

    if "_serving_bc" in art.params:
        return art.params["_serving_bc"]
    codec = art.params.get("codec")
    cents = art.params["centroids"]
    n = art.tables[table].count()
    if codec is None:
        width = 4 * cents.shape[1]
    elif isinstance(codec, PQCodec):
        width = codec.m * (1 if codec.ksub <= 256 else 2)
    else:
        width = cents.shape[1]  # SQ8: one byte per dim packed
    # gate on what a worker actually holds: packed payload + ids PLUS
    # the float64 decode cache (8 bytes × dim per row).  Gating on
    # packed bytes alone let a 57 MB SQ8 index through whose decode is
    # 460 MB — every worker then pays a one-shot full-index decode and
    # the "fast path" ran 30x slower than the partitioned scan.
    decoded = 8 * cents.shape[1]
    if n * (width + decoded + 8) > threshold:
        art.params["_serving_bc"] = None
        return None
    packed = pack_clusters(
        art.tables[table], "vec" if codec is None else "codes", cents, codec
    )
    if packed.nbytes() > threshold:
        art.params["_serving_bc"] = None
        return None
    bc = spark.sparkContext.broadcast(packed)
    art.params["_serving_bc"] = bc
    return bc


def topk_rows(d: np.ndarray, ids: np.ndarray, kk: int) -> tuple[np.ndarray, np.ndarray]:
    """Per-row smallest-kk selection over a (n_q, n_b) distance block,
    ties by ascending id — exact: boundary ties (kth == (k+1)th value)
    are re-ranked with a full (dist, id) lexsort for the affected rows,
    so the kept SET always equals the lexicographic top-k.  The
    vectorized argpartition path covers the (overwhelmingly common)
    tie-free case."""
    n = d.shape[1]
    if n <= kk:
        order = np.lexsort((np.broadcast_to(ids, d.shape), d), axis=1)
        return np.take_along_axis(d, order, axis=1), ids[order]
    part = np.argpartition(d, kk - 1, axis=1)[:, :kk]
    pdist = np.take_along_axis(d, part, axis=1)
    pids = ids[part]
    order = np.lexsort((pids, pdist), axis=1)
    out_d = np.take_along_axis(pdist, order, axis=1)
    out_i = np.take_along_axis(pids, order, axis=1)
    thresh = out_d[:, -1]
    ambiguous = np.nonzero((d <= thresh[:, None]).sum(axis=1) > kk)[0]
    for r in ambiguous:
        full = np.lexsort((ids, d[r]))[:kk]
        out_d[r] = d[r][full]
        out_i[r] = ids[full]
    return out_d, out_i


def broadcast_probe_search(
    query_df: DataFrame,
    bc_index,
    nprobe: int | None,
    k: int,
    metric: str,
    qid_col: str = "qid",
    vec_col: str = "vec",
    accum=None,
    normalize_queries: bool | None = None,
    block_rows: int = 8192,
) -> DataFrame:
    """Search a broadcast PackedClusters index: each task probes and
    scans for its own queries and emits their final (qid, id, dist,
    rank) top-k — rank 1..k ascending by (dist, id), the same contract
    as ``topk_per_query``.

    ``nprobe=None`` (or >= nlist, or no centroids) scans every cluster
    — the exhaustive form standalone PQ uses.  ``normalize_queries``
    defaults to (metric == 'cosine'); standalone PQ passes it
    explicitly because its codec normalizes while ADC runs in L2.
    """
    spark = query_df.sparkSession
    if normalize_queries is None:
        normalize_queries = metric == "cosine"
    q = query_df.select(F.col(qid_col).alias("qid"), F.col(vec_col).alias("vec"))
    # the query side is small by contract; spreading it across the
    # executor pool costs one tiny round-robin exchange and sets the
    # search's whole parallelism
    par = spark.sparkContext.defaultParallelism
    if q.rdd.getNumPartitions() < par:
        q = q.repartition(par)
    norm_q = normalize_queries

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        idx: PackedClusters = bc_index.value
        cents = idx.centroids
        for pdf in batches:
            if len(pdf) == 0:
                continue
            qids = pdf["qid"].to_numpy(dtype=np.int64)
            qmat = np.vstack(pdf["vec"].to_numpy()).astype(np.float32)
            if norm_q:
                qmat = normalize_rows(qmat.astype(np.float64)).astype(np.float32)
            n_q = len(qids)
            if cents is None or nprobe is None or nprobe >= len(cents):
                probe_plan = [(bi, None) for bi in range(len(idx.cids))]
            else:
                # identical probe selection to IVFSearcher.probe_clusters:
                # nprobe nearest centroids by float64 L2, ties by cluster id
                d2c = pairwise_distances(qmat, cents, "l2")
                npb = min(nprobe, d2c.shape[1])
                order = np.lexsort(
                    (np.broadcast_to(np.arange(d2c.shape[1]), d2c.shape), d2c),
                    axis=1,
                )[:, :npb]
                flat_c = order.ravel()
                flat_q = np.repeat(np.arange(n_q), npb)
                so = np.argsort(flat_c, kind="stable")
                fc, fq = flat_c[so], flat_q[so]
                ucs, starts = np.unique(fc, return_index=True)
                bounds = np.r_[starts, len(fc)]
                probe_plan = []
                for j, c in enumerate(ucs):
                    bi = idx.index.get(int(c))
                    if bi is not None:
                        probe_plan.append((bi, fq[bounds[j] : bounds[j + 1]]))
            acc_q: list[np.ndarray] = []
            acc_i: list[np.ndarray] = []
            acc_d: list[np.ndarray] = []
            for bi, qrows in probe_plan:
                bids = idx.ids[bi]
                bvecs = idx.decoded(bi)
                qsub = qmat if qrows is None else qmat[qrows]
                rows = np.arange(n_q, dtype=np.int64) if qrows is None else qrows
                for s in range(0, len(bids), block_rows):
                    bid = bids[s : s + block_rows]
                    d = pairwise_distances(qsub, bvecs[s : s + block_rows], metric)
                    if accum is not None:
                        accum.add(int(d.size))
                    kk = min(k, d.shape[1])
                    od, oi = topk_rows(d, bid, kk)
                    acc_q.append(np.repeat(rows, kk))
                    acc_i.append(oi.ravel())
                    acc_d.append(od.ravel())
            if not acc_q:
                continue
            aq = np.concatenate(acc_q)
            ai = np.concatenate(acc_i)
            ad = np.concatenate(acc_d)
            order = np.lexsort((ai, ad, aq))
            aq, ai, ad = aq[order], ai[order], ad[order]
            starts = np.r_[0, np.nonzero(np.diff(aq))[0] + 1]
            counts = np.diff(np.r_[starts, len(aq)])
            rank = np.arange(len(aq)) - np.repeat(starts, counts)
            keep = rank < k
            yield pd.DataFrame(
                {
                    "qid": qids[aq[keep]],
                    "id": ai[keep],
                    "dist": ad[keep],
                    "rank": (rank[keep] + 1).astype(np.int32),
                }
            )

    return q.mapInPandas(kernel, schema="qid long, id long, dist double, rank int")
