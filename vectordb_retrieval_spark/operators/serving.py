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
        self._scan: dict = {}

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

    def scan_state(self, i: int, metric: str):
        """Per-cluster distance-scan state, cached like the decode it
        derives from: (rows, row_sq_norms) for l2, (normalized rows,
        None) for cosine, (rows, None) for ip.  The cached pieces are
        exactly the subexpressions ``pairwise_distances`` recomputes
        per call — same float64 arithmetic, hoisted out of the
        per-(query-batch × cluster) hot loop."""
        key = (i, metric)
        out = self._scan.get(key)
        if out is None:
            dec = self.decoded(i)
            if metric == "l2":
                out = (dec, (dec * dec).sum(axis=1))
            elif metric == "cosine":
                out = (normalize_rows(dec), None)
            else:
                out = (dec, None)
            self._scan[key] = out
        return out

    def __getstate__(self):
        state = self.__dict__.copy()
        state["_dec"] = {}
        state["_scan"] = {}
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


# padding sentinel for ragged candidate blocks: sorts after every real
# id at equal (infinite) distance, filtered from the emitted rows
_PAD_ID = np.int64(1) << 62


def topk_block(
    D: np.ndarray, I: np.ndarray, kk: int
) -> tuple[np.ndarray, np.ndarray]:
    """Row-wise smallest-kk over a padded (n_q, c) candidate block with
    PER-ROW id arrays, ties by ascending id — the ragged-width sibling
    of ``topk_rows``.  Padding entries are (inf, _PAD_ID): they sort
    after every real candidate, so rows with fewer than kk real
    candidates surface them at the tail for the caller to filter.
    Boundary ties (kth == (k+1)th distance) re-rank the affected rows
    with a full (dist, id) lexsort, so the kept set is always the
    lexicographic top-kk."""
    n = D.shape[1]
    if n <= kk:
        order = np.lexsort((I, D), axis=1)
        return np.take_along_axis(D, order, axis=1), np.take_along_axis(
            I, order, axis=1
        )
    part = np.argpartition(D, kk - 1, axis=1)[:, :kk]
    pdist = np.take_along_axis(D, part, axis=1)
    pids = np.take_along_axis(I, part, axis=1)
    order = np.lexsort((pids, pdist), axis=1)
    out_d = np.take_along_axis(pdist, order, axis=1)
    out_i = np.take_along_axis(pids, order, axis=1)
    thresh = out_d[:, -1]
    ambiguous = np.nonzero((D <= thresh[:, None]).sum(axis=1) > kk)[0]
    for r in ambiguous:
        full = np.lexsort((I[r], D[r]))[:kk]
        out_d[r] = D[r][full]
        out_i[r] = I[r][full]
    return out_d, out_i


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
            all_rows = np.arange(n_q, dtype=np.int64)
            # per-batch query-side scan state, hoisted out of the
            # per-cluster loop: the float64 upcast, squared norms (l2)
            # and row normalization (cosine) are exactly what
            # pairwise_distances would redo on every cluster call
            q64 = qmat.astype(np.float64)
            if metric == "l2":
                qsq = (q64 * q64).sum(axis=1)
            elif metric == "cosine":
                q64 = normalize_rows(q64)
                qsq = None
            else:
                qsq = None
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
            # Scatter-merge: instead of a per-cluster top-k plus one
            # (qid, dist, id) lexsort over nq×nprobe×k rows (profiled at
            # ~80% of warm kernel time — the GEMMs are only ~15%), write
            # every probed cluster's full distance block into ONE padded
            # (n_q, width) candidate matrix at per-query fill offsets,
            # then take a single vectorized row-wise top-k.  Segments cap
            # the padded width at ~block_rows so an exhaustive scan (the
            # standalone-PQ probe_plan) stays cache-sized: each segment
            # reduces to per-query winners and the winners re-merge at
            # the end.  Exactness is preserved: all candidate distances
            # reach a (dist, id)-lexicographic selection, same order the
            # old two-stage merge produced.
            entries = []  # (bi, row_start, row_end, qrows|None)
            for bi, qrows in probe_plan:
                sz = len(idx.ids[bi])
                for s in range(0, sz, block_rows):
                    entries.append((bi, s, min(sz, s + block_rows), qrows))
            cap = max(block_rows, 4 * k)
            seg_d: list[np.ndarray] = []
            seg_i: list[np.ndarray] = []

            def flush(pend, width: int) -> None:
                D = np.full((n_q, width), np.inf)
                I = np.full((n_q, width), _PAD_ID)
                fill = np.zeros(n_q, dtype=np.int64)
                for bi, s, e, qrows in pend:
                    qsub = q64 if qrows is None else q64[qrows]
                    rows = all_rows if qrows is None else qrows
                    # same float64 arithmetic as pairwise_distances,
                    # with the cluster-side subexpressions cached on
                    # the broadcast index (scan_state) and the
                    # query-side ones hoisted per batch
                    b, bsq = idx.scan_state(bi, metric)
                    b = b[s:e]
                    if metric == "l2":
                        qs_ = qsq if qrows is None else qsq[qrows]
                        d = (
                            qs_[:, None]
                            + bsq[s:e][None, :]
                            - 2.0 * (qsub @ b.T)
                        )
                        np.maximum(d, 0.0, out=d)
                        np.sqrt(d, out=d)
                    elif metric == "cosine":
                        d = 1.0 - qsub @ b.T
                    elif metric == "ip":
                        d = -(qsub @ b.T)
                    else:
                        d = pairwise_distances(qsub, idx.decoded(bi)[s:e], metric)
                    if accum is not None:
                        accum.add(int(d.size))
                    cols = fill[rows, None] + np.arange(e - s)
                    D[rows[:, None], cols] = d
                    I[rows[:, None], cols] = idx.ids[bi][s:e]
                    fill[rows] += e - s
                od, oi = topk_block(D, I, min(k, width))
                seg_d.append(od)
                seg_i.append(oi)

            pend: list[tuple] = []
            w = np.zeros(n_q, dtype=np.int64)
            for ent in entries:
                _, s, e, qrows = ent
                inc = e - s
                wmax = int(w.max() if qrows is None else w[qrows].max()) + inc
                if pend and wmax > cap:
                    flush(pend, int(w.max()))
                    pend = []
                    w = np.zeros(n_q, dtype=np.int64)
                pend.append(ent)
                if qrows is None:
                    w += inc
                else:
                    w[qrows] += inc
            if pend:
                flush(pend, int(w.max()))
            if not seg_d:
                continue
            if len(seg_d) == 1:
                fd, fi = seg_d[0], seg_i[0]
            else:
                fd = np.concatenate(seg_d, axis=1)
                fi = np.concatenate(seg_i, axis=1)
                fd, fi = topk_block(fd, fi, min(k, fd.shape[1]))
            kk = fd.shape[1]
            valid = (fi != _PAD_ID).ravel()
            ranks = np.broadcast_to(
                np.arange(1, kk + 1, dtype=np.int32), fd.shape
            ).ravel()
            yield pd.DataFrame(
                {
                    "qid": np.repeat(qids, kk)[valid],
                    "id": fi.ravel()[valid],
                    "dist": fd.ravel()[valid],
                    "rank": ranks[valid],
                }
            )

    return q.mapInPandas(kernel, schema="qid long, id long, dist double, rank int")
