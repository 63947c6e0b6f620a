"""Line-level phase timing of _search_batch_fast on the bench's
random-20k config (nlist=256, SQ8, nprobe=24, k=20, 2048-query task)."""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def main() -> int:
    from vectordb_retrieval_spark.operators.ivf import IVFIndexer
    from vectordb_retrieval_spark.operators.quant import SQ8Codec
    from vectordb_retrieval_spark.operators.serving import (
        _probe_plan,
        pack_clusters,
        search_batch,
    )
    from vectordb_retrieval_spark.session import get_spark
    from vectordb_retrieval_spark.sources.random_gen import random_vectors

    spark = get_spark("profile-sq8k")
    base = random_vectors(spark, 20_000, 64, seed=7).cache()
    base.count()
    art = IVFIndexer(
        nlist=256, seed=7, max_iter=10, init_mode="k-means||", codec=SQ8Codec()
    ).build(base, id_col="id", vec_col="vec")
    art.tables["assignment"].write.format("noop").mode("overwrite").save()
    idx = pack_clusters(
        art.tables["assignment"], "codes",
        art.params["centroids"], art.params["codec"],
    )
    rng = np.random.RandomState(3)
    qmat = rng.randn(2048, 64).astype(np.float32)
    qids = np.arange(2048, dtype=np.int64)
    search_batch(idx, qids, qmat, 24, 20, "l2")  # warm

    # phase timing: probe plan alone
    t0 = time.perf_counter()
    for _ in range(10):
        plan, n_primary = _probe_plan(idx, qmat, 24, 2048, split_primary=True)
    t_plan = (time.perf_counter() - t0) / 10
    n_entries_p = n_primary
    print(f"probe_plan: {t_plan*1000:.1f} ms   plan entries={len(plan)} "
          f"(primary {n_primary}, rest {len(plan)-n_primary})")
    sizes = [len(idx.ids[bi]) for bi, _ in plan]
    qcounts = [0 if qr is None else len(qr) for _, qr in plan]
    print(f"cluster sizes: min={min(sizes)} mean={np.mean(sizes):.0f} "
          f"max={max(sizes)}; probing queries/entry mean={np.mean(qcounts):.0f}")
    tot_cand = sum(s * q for s, q in zip(sizes, qcounts))
    print(f"total candidate pairs: {tot_cand/1e6:.2f} M")

    # whole kernel with a monkeypatched merge to count/time merges
    import vectordb_retrieval_spark.operators.serving as sv

    t0 = time.perf_counter()
    for _ in range(5):
        search_batch(idx, qids, qmat, 24, 20, "l2")
    t_all = (time.perf_counter() - t0) / 5
    print(f"whole kernel: {t_all*1000:.1f} ms")

    # time the packed_scan fetch (memoized — should be ~0)
    t0 = time.perf_counter()
    idx.packed_scan("l2")
    print(f"packed_scan (memo): {(time.perf_counter()-t0)*1000:.2f} ms")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
