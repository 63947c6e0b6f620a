"""Section-level timing of _batched_beam (instrumented copy)."""

import sys
import time

import numpy as np

sys.path.insert(0, ".")

from vectordb_retrieval_spark.operators.graph_ann import (  # noqa: E402
    _beam_scratch,
    _build_nsw,
    _entry_dists,
    _pad_adjacency,
)
from scripts.profile_beam import gen  # noqa: E402

T = {}


def tick(k, t0):
    T[k] = T.get(k, 0.0) + (time.perf_counter() - t0)
    return time.perf_counter()


def beam_v2(mat, padj, qmat, ef, metric, entry=0):
    """Sentinel-padded adjacency + flat visited/dedup keys + bound
    pre-filter.  Exact same results as _batched_beam."""
    n = len(mat)
    n_q = len(qmat)
    ef = min(ef, n)
    t = time.perf_counter()
    m32 = np.ascontiguousarray(mat, dtype=np.float32)
    q32 = np.ascontiguousarray(qmat, dtype=np.float32)
    bsq = (m32.astype(np.float64) ** 2).sum(axis=1).astype(np.float32)
    qsq = (q32.astype(np.float64) ** 2).sum(axis=1).astype(np.float32)
    beam_d = np.full((n_q, ef), np.inf, dtype=np.float32)
    beam_i = np.full((n_q, ef), -1, dtype=np.int64)
    beam_x = np.zeros((n_q, ef), dtype=bool)
    n1 = n + 1
    # sentinel-padded adjacency: -1 -> n (always-visited column)
    padj_s = np.where(padj < 0, np.int32(n), padj)
    vflat = np.zeros(n_q * n1, dtype=bool)
    vflat.reshape(n_q, n1)[:, n] = True
    u_pair = np.empty(n_q * n1, dtype=np.int32)
    u_node = np.empty(n, dtype=np.int32)
    lut = np.empty(n, dtype=np.int64)
    beam_d[:, 0] = _entry_dists(m32, bsq, q32, qsq, entry, metric)
    beam_i[:, 0] = entry
    vflat.reshape(n_q, n1)[:, entry] = True
    dmax = padj.shape[1]
    qbase = np.arange(n_q, dtype=np.int64) * n1
    t = tick("setup", t)
    while True:
        t = time.perf_counter()
        frontier = (~beam_x) & (beam_i >= 0)
        if not frontier.any():
            tick("frontier", t)
            break
        fq, fslot = np.nonzero(frontier)
        beam_x[fq, fslot] = True
        nodes = beam_i[fq, fslot]
        kall = np.repeat(qbase[fq], dmax) + padj_s[nodes].reshape(-1)
        ok = ~vflat[kall]
        kk_ = kall[ok]
        t = tick("gather+mask", t)
        if len(kk_):
            seq = np.arange(len(kk_), dtype=np.int32)
            u_pair[kk_] = seq
            rep = u_pair[kk_] == seq
            kk_ = kk_[rep]
            vflat[kk_] = True
            fa = (kk_ // n1).astype(np.int64)
            fn = (kk_ - fa * n1).astype(np.int64)
            seq = np.arange(len(fn), dtype=np.int32)
            u_node[fn] = seq
            un = fn[u_node[fn] == seq]
            lut[un] = np.arange(len(un))
            inv = lut[fn]
            t = tick("dedup", t)
            if len(un) * n_q <= 32 * len(fa):
                dot = (m32[un] @ q32.T)[inv, fa]
            else:
                dot = np.einsum("ij,ij->i", m32[fn], q32[fa], dtype=np.float32)
            if metric == "l2":
                nd = np.sqrt(np.maximum(bsq[fn] + qsq[fa] - 2.0 * dot, 0.0))
            else:
                nd = 1.0 - dot if metric == "cosine" else -dot
            t = tick("distance", t)
        else:
            continue
        keep = nd < beam_d[fa, ef - 1]
        if not keep.all():
            fa, fn, nd = fa[keep], fn[keep], nd[keep]
            if not len(fa):
                tick("bound-filter", t)
                continue
        t = tick("bound-filter", t)
        live = beam_i >= 0
        lq, lslot = np.nonzero(live)
        ld = beam_d[lq, lslot]
        li = beam_i[lq, lslot]
        lx = beam_x[lq, lslot]
        t = tick("live-extract", t)
        dcap = float(max(ld.max(), nd.max() if len(nd) else 0.0)) + 1.0
        dlo = min(0.0, float(min(ld.min(), nd.min() if len(nd) else 0.0)))
        span = dcap - dlo
        lkey = lq.astype(np.float64) * span + (ld - dlo)
        nkey = fa.astype(np.float64) * span + (nd - dlo)
        no = np.argsort(nkey)
        fa_s, nd_s, fn_s, nkey = fa[no], nd[no], fn[no], nkey[no]
        pos_l = np.arange(len(lq)) + np.searchsorted(nkey, lkey, side="left")
        pos_n = np.arange(len(fa_s)) + np.searchsorted(lkey, nkey, side="right")
        lcnt = np.bincount(lq, minlength=n_q)
        ncnt = np.bincount(fa_s, minlength=n_q)
        qstart = np.concatenate(([0], np.cumsum(lcnt + ncnt)[:-1]))
        rank_l = pos_l - qstart[lq]
        rank_n = pos_n - qstart[fa_s]
        keep_l = rank_l < ef
        keep_n = rank_n < ef
        t = tick("merge-rank", t)
        beam_d.fill(np.inf)
        beam_i.fill(-1)
        beam_x.fill(False)
        beam_d[lq[keep_l], rank_l[keep_l]] = ld[keep_l]
        beam_i[lq[keep_l], rank_l[keep_l]] = li[keep_l]
        beam_x[lq[keep_l], rank_l[keep_l]] = lx[keep_l]
        beam_d[fa_s[keep_n], rank_n[keep_n]] = nd_s[keep_n]
        beam_i[fa_s[keep_n], rank_n[keep_n]] = fn_s[keep_n]
        tick("rebuild", t)
    return beam_d, beam_i


def beam_instrumented(mat, padj, qmat, ef, metric, entry=0):
    n = len(mat)
    n_q = len(qmat)
    ef = min(ef, n)
    t = time.perf_counter()
    m32 = np.ascontiguousarray(mat, dtype=np.float32)
    q32 = np.ascontiguousarray(qmat, dtype=np.float32)
    bsq = (m32.astype(np.float64) ** 2).sum(axis=1).astype(np.float32)
    qsq = (q32.astype(np.float64) ** 2).sum(axis=1).astype(np.float32)
    beam_d = np.full((n_q, ef), np.inf, dtype=np.float32)
    beam_i = np.full((n_q, ef), -1, dtype=np.int64)
    beam_x = np.zeros((n_q, ef), dtype=bool)
    visited = np.zeros((n_q, n), dtype=bool)
    u_pair = np.empty(n_q * n, dtype=np.int32)
    u_node = np.empty(n, dtype=np.int32)
    lut = np.empty(n, dtype=np.int64)
    beam_d[:, 0] = _entry_dists(m32, bsq, q32, qsq, entry, metric)
    beam_i[:, 0] = entry
    visited[:, entry] = True
    dmax = padj.shape[1]
    t = tick("setup", t)
    waves = 0
    pairs = 0
    while True:
        t = time.perf_counter()
        frontier = (~beam_x) & (beam_i >= 0)
        if not frontier.any():
            tick("frontier", t)
            break
        waves += 1
        fq, fslot = np.nonzero(frontier)
        beam_x[fq, fslot] = True
        nodes = beam_i[fq, fslot]
        neigh = padj[nodes]
        a_idx = np.repeat(fq, dmax)
        n_idx = neigh.reshape(-1)
        ok = n_idx >= 0
        ok[ok] &= ~visited[a_idx[ok], n_idx[ok]]
        fa, fn = a_idx[ok], n_idx[ok]
        t = tick("gather+mask", t)
        if len(fa):
            key = fa * np.int64(n) + fn
            seq = np.arange(len(key), dtype=np.int32)
            u_pair[key] = seq
            rep = u_pair[key] == seq
            fa, fn = fa[rep], fn[rep]
            visited[fa, fn] = True
            seq = np.arange(len(fn), dtype=np.int32)
            u_node[fn] = seq
            un = fn[u_node[fn] == seq]
            lut[un] = np.arange(len(un))
            inv = lut[fn]
            t = tick("dedup", t)
            pairs += len(fa)
            if len(un) * n_q <= 32 * len(fa):
                dot = (m32[un] @ q32.T)[inv, fa]
            else:
                dot = np.einsum("ij,ij->i", m32[fn], q32[fa], dtype=np.float32)
            if metric == "l2":
                nd = np.sqrt(np.maximum(bsq[fn] + qsq[fa] - 2.0 * dot, 0.0))
            else:
                nd = 1.0 - dot if metric == "cosine" else -dot
            t = tick("distance", t)
        else:
            nd = np.empty(0, dtype=np.float32)
        if not len(fa):
            continue
        # bound pre-filter: a candidate >= the query's current ef-th
        # best can never enter the merged beam (merging only raises
        # ranks), so drop before the sort machinery
        keep = nd < beam_d[fa, ef - 1]
        if not keep.all():
            fa, fn, nd = fa[keep], fn[keep], nd[keep]
            if not len(fa):
                tick("bound-filter", t)
                t = time.perf_counter()
                continue
        t = tick("bound-filter", t)
        live = beam_i >= 0
        lq, lslot = np.nonzero(live)
        ld = beam_d[lq, lslot]
        li = beam_i[lq, lslot]
        lx = beam_x[lq, lslot]
        t = tick("live-extract", t)
        dcap = float(max(ld.max(), nd.max() if len(nd) else 0.0)) + 1.0
        dlo = min(0.0, float(min(ld.min(), nd.min() if len(nd) else 0.0)))
        span = dcap - dlo
        lkey = lq.astype(np.float64) * span + (ld - dlo)
        nkey = fa.astype(np.float64) * span + (nd - dlo)
        no = np.argsort(nkey)
        fa_s, nd_s, fn_s, nkey = fa[no], nd[no], fn[no], nkey[no]
        pos_l = np.arange(len(lq)) + np.searchsorted(nkey, lkey, side="left")
        pos_n = np.arange(len(fa_s)) + np.searchsorted(lkey, nkey, side="right")
        lcnt = np.bincount(lq, minlength=n_q)
        ncnt = np.bincount(fa_s, minlength=n_q)
        qstart = np.concatenate(([0], np.cumsum(lcnt + ncnt)[:-1]))
        rank_l = pos_l - qstart[lq]
        rank_n = pos_n - qstart[fa_s]
        keep_l = rank_l < ef
        keep_n = rank_n < ef
        t = tick("merge-rank", t)
        beam_d.fill(np.inf)
        beam_i.fill(-1)
        beam_x.fill(False)
        beam_d[lq[keep_l], rank_l[keep_l]] = ld[keep_l]
        beam_i[lq[keep_l], rank_l[keep_l]] = li[keep_l]
        beam_x[lq[keep_l], rank_l[keep_l]] = lx[keep_l]
        beam_d[fa_s[keep_n], rank_n[keep_n]] = nd_s[keep_n]
        beam_i[fa_s[keep_n], rank_n[keep_n]] = fn_s[keep_n]
        t = tick("rebuild", t)
    return beam_d, beam_i, waves, pairs


def main():
    n, dim, n_shards, m, ef, chunk = 20_000, 64, 8, 12, 24, 128
    n_q = 4096
    base = gen(n, dim, 7, 0)
    qmat = gen(n_q, dim, 7, 2)
    ids = np.arange(n)
    shards = []
    for s in range(n_shards):
        mat = base[ids % n_shards == s]
        shards.append((mat, _pad_adjacency(_build_nsw(mat, m, 32, "l2"))))
    for mat, padj in shards:
        beam_instrumented(mat, padj, qmat[:chunk], ef, "l2")
    T.clear()
    t0 = time.time()
    tot_waves = tot_pairs = calls = 0
    for mat, padj in shards:
        for qs in range(0, n_q, chunk):
            _, _, w, p = beam_instrumented(
                mat, padj, qmat[qs : qs + chunk], ef, "l2"
            )
            tot_waves += w
            tot_pairs += p
            calls += 1
    wall = time.time() - t0
    print(f"wall {wall:.3f}s  calls {calls}  waves/call {tot_waves/calls:.1f}  "
          f"pairs/call {tot_pairs/calls:.0f}  pairs/query {tot_pairs/(n_q*8):.0f}")
    for k, v in sorted(T.items(), key=lambda kv: -kv[1]):
        print(f"  {k:14s} {v:.3f}s  {100*v/wall:.1f}%")

    # A/B: v2 vs original, checking identical results
    from vectordb_retrieval_spark.operators.graph_ann import _batched_beam

    for mat, padj in shards[:2]:
        d0, i0 = _batched_beam(mat, padj, qmat[:chunk], ef, "l2")
        d2, i2 = beam_v2(mat, padj, qmat[:chunk], ef, "l2")
        assert np.array_equal(i0, i2), "node mismatch"
        assert np.array_equal(d0, d2), "dist mismatch"
    print("v2 == original on 2 shards")

    for name, fn in (("orig", _batched_beam), ("v2", beam_v2)):
        for mat, padj in shards:
            fn(mat, padj, qmat[:chunk], ef, "l2")  # warm
        t0 = time.time()
        for mat, padj in shards:
            for qs in range(0, n_q, chunk):
                fn(mat, padj, qmat[qs : qs + chunk], ef, "l2")
        print(f"{name}: {time.time()-t0:.3f}s")
    T.clear()


if __name__ == "__main__":
    main()
