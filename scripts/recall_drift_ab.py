"""Recall-drift A/B for the random-data IVF rows (r12 judge #2, ordered
into r14 as an ANALYSIS note — the committed queries' results stay
frozen; this script changes nothing the driver runs).

The bench's r_sq8 row (random 20k x 64-d, IVF nlist=256 trained with
the engine's sampled Lloyd, SQ8 codec, nprobe=24, k=20) reads ~0.46
recall where the reference class (FAISS IVF256,SQ8 on its random
config) reads ~0.51.  Because n_train = 256*nlist = 65,536 > 20,000,
the trainer sees the WHOLE table — so the drift cannot be sampling; it
must be the Lloyd configuration (init, iteration count, no nredo).
This script replicates the engine's exact serving math in NumPy
(same lloyd_kmeans trainer, same SQ8 min/max calibration and float64
decode, same probe ordering) and sweeps the trainer knobs:

- iters: 10 (committed) vs 25 (FAISS Clustering default) vs 50
- init: k-means++ (committed) vs random-subset (FAISS-style)
- nredo: best-inertia-of-N restarts (FAISS nredo semantics)

Writes bench_artifacts/recall_drift_ab_r14.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from vectordb_retrieval_spark.operators.quant import lloyd_kmeans  # noqa: E402

N, DIM, NQ, K, NLIST, NPROBE = 20_000, 64, 2048, 20, 256, 24


def bench_matrices():
    """Collect the bench's EXACT random workload (sources/random_gen)
    once so absolute recalls here line up with the committed r_sq8 row;
    the sweep itself is pure NumPy."""
    from vectordb_retrieval_spark.session import get_spark
    from vectordb_retrieval_spark.sources.random_gen import random_vectors

    spark = get_spark("recall_drift_ab", master="local[8]")
    bp = random_vectors(spark, N, DIM, seed=7).toPandas()
    qp = random_vectors(spark, NQ, DIM, seed=7, stream=2, id_col="qid").toPandas()
    base = np.vstack(bp.sort_values("id")["vec"].to_numpy()).astype(np.float32)
    queries = np.vstack(qp.sort_values("qid")["vec"].to_numpy()).astype(np.float32)
    spark.stop()
    return base, queries


def exact_topk(base, queries, k):
    # float64 L2, ties by id — the engine's exact_knn contract
    out = np.empty((len(queries), k), dtype=np.int64)
    b = base.astype(np.float64)
    bn = (b * b).sum(axis=1)
    for s in range(0, len(queries), 256):
        q = queries[s : s + 256].astype(np.float64)
        d = bn[None, :] - 2.0 * (q @ b.T)
        idx = np.argpartition(d, k - 1, axis=1)[:, :k]
        dd = np.take_along_axis(d, idx, axis=1)
        order = np.lexsort((idx, dd), axis=1)
        out[s : s + 256] = np.take_along_axis(idx, order, axis=1)
    return out


def sq8_roundtrip(base):
    lo = base.astype(np.float64).min(axis=0)
    hi = base.astype(np.float64).max(axis=0)
    scale = (hi - lo) / 255.0
    scale[scale == 0.0] = 1.0
    codes = np.clip(np.rint((base.astype(np.float64) - lo) / scale), 0, 255)
    return lo + codes * scale  # float64 decode — the serving math


def ivf_recall(base, queries, gt, cents):
    dec = sq8_roundtrip(base)
    b32 = base.astype(np.float32)
    c32 = cents.astype(np.float64)
    # nearest-centroid assignment (float32 rows vs float64 centroids,
    # ties to lower cluster id — functions/distance.assign_nearest)
    members = [[] for _ in range(len(cents))]
    for s in range(0, len(b32), 4096):
        blk = b32[s : s + 4096].astype(np.float64)
        d = ((blk[:, None, :] - c32[None, :, :]) ** 2).sum(axis=2)
        cid = d.argmin(axis=1)
        for i, c in enumerate(cid):
            members[c].append(s + i)
    members = [np.asarray(m, dtype=np.int64) for m in members]
    hits = 0
    qd = queries.astype(np.float64)
    cn = (c32 * c32).sum(axis=1)
    for s in range(0, len(queries), 256):
        q = qd[s : s + 256]
        dc = cn[None, :] - 2.0 * (q @ c32.T)
        probe = np.argsort(dc, axis=1, kind="stable")[:, :NPROBE]
        for r in range(len(q)):
            cand = np.concatenate([members[c] for c in probe[r] if len(members[c])])
            if len(cand) == 0:
                continue
            dv = ((dec[cand] - q[r][None, :]) ** 2).sum(axis=1)
            kk = min(K, len(cand))
            top = cand[np.argpartition(dv, kk - 1)[:kk]]
            hits += len(np.intersect1d(top, gt[s + r], assume_unique=False))
    return hits / (len(queries) * K)


def inertia(base, cents):
    b = base.astype(np.float64)
    c = cents.astype(np.float64)
    tot = 0.0
    for s in range(0, len(b), 4096):
        blk = b[s : s + 4096]
        d = ((blk[:, None, :] - c[None, :, :]) ** 2).sum(axis=2)
        tot += d.min(axis=1).sum()
    return tot


def main() -> int:
    base, queries = bench_matrices()
    gt = exact_topk(base, queries, K)
    results = []
    for iters in (10, 25, 50):
        for init in ("++", "random"):
            t0 = time.time()
            cents = lloyd_kmeans(
                base.astype(np.float64), NLIST, 7, iters=iters, init=init
            )
            rec = ivf_recall(base, queries, gt, cents)
            results.append(
                {
                    "iters": iters,
                    "init": init,
                    "seed": 7,
                    "recall": round(rec, 4),
                    "inertia": round(inertia(base, cents), 1),
                    "train_s": round(time.time() - t0, 1),
                }
            )
            print(results[-1], flush=True)
    # nredo-of-4 at the committed iters: best inertia wins (FAISS nredo)
    best = None
    redo = []
    for seed in (7, 17, 27, 37):
        cents = lloyd_kmeans(base.astype(np.float64), NLIST, seed, iters=10, init="++")
        ine = inertia(base, cents)
        redo.append({"seed": seed, "inertia": round(ine, 1)})
        if best is None or ine < best[0]:
            best = (ine, seed, cents)
    rec = ivf_recall(base, queries, gt, best[2])
    results.append(
        {
            "iters": 10,
            "init": "++",
            "nredo": 4,
            "best_seed": best[1],
            "recall": round(rec, 4),
            "inertia": round(best[0], 1),
            "redo_inertias": redo,
        }
    )
    print(results[-1], flush=True)
    out = {
        "workload": "numpy replication of the bench r_sq8 row "
        "(20k x 64 random, IVF256+SQ8, nprobe=24, k=20)",
        "committed_config": {"iters": 10, "init": "++", "seed": 7},
        "sweep": results,
    }
    path = os.path.join(REPO, "bench_artifacts", "recall_drift_ab_r14.json")
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1)
    print("wrote", path)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
