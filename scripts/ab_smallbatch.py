"""One-session A/B of the small-batch partitioned-scan serving path.

Builds a 100k x 384-d clustered-cosine IVF-SQ8 index (above the 128 MB
broadcast gate, so searches take the partitioned cluster_scan_topk
plan), then interleaves timed reps of the SAME 1024-query search with
the small-batch optimizations ON (coalesced scan tasks + JVM-side
fragment merge) and OFF (one-partition-per-core scan + python merge
kernel).  Interleaving means both variants sample the same container
interference windows, so the ratio is trustworthy even when absolute
QPS is not.  Also asserts the two variants return identical rows.

    python scripts/ab_smallbatch.py [n_base] [n_queries]
"""

import json
import sys
import time

sys.path.insert(0, ".")

from vectordb_retrieval_spark.session import get_spark  # noqa: E402


def materialize(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def timed_group(fns, reps=5):
    ts = [[] for _ in fns]
    for _ in range(reps):
        for i, fn in enumerate(fns):
            t0 = time.time()
            fn()
            ts[i].append(time.time() - t0)
    return [min(t) for t in ts]


def main() -> int:
    n_base = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    n_q = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
    spark = get_spark("ab_smallbatch", master="local[32]")

    from vectordb_retrieval_spark.functions import kernels
    from vectordb_retrieval_spark.operators import ivf as ivf_mod
    from vectordb_retrieval_spark.operators.ivf import IVFIndexer, IVFSearcher
    from vectordb_retrieval_spark.operators.quant import SQ8Codec
    from vectordb_retrieval_spark.sources.random_gen import clustered_vectors

    base = clustered_vectors(
        spark, n_base, 384, n_clusters=200, spread=0.35, seed=13, stream=6,
        num_partitions=32,
    ).cache()
    materialize(base)
    q = clustered_vectors(
        spark, n_q, 384, n_clusters=200, spread=0.35, seed=13, stream=7,
        id_col="qid",
    ).cache()
    q.count()

    art = IVFIndexer(
        nlist=256, metric="cosine", seed=13, max_iter=5,
        init_mode="k-means||", codec=SQ8Codec(),
    ).build(base, id_col="id", vec_col="vec")
    materialize(art.tables["assignment"])

    orig_merge = kernels.merge_fragment_topk

    def merge_python_only(frag, k, n_queries=None):
        # force the python merge kernel (pre-optimization behaviour)
        return orig_merge(frag, k, n_queries=None)

    orig_scan = kernels.cluster_scan_topk

    def scan_no_coalesce(*a, **kw):
        kw["n_tasks"] = None
        return orig_scan(*a, **kw)

    # variant OFF: patch both knobs for plan construction, then restore
    ivf_mod.cluster_scan_topk = scan_no_coalesce
    ivf_mod.merge_fragment_topk = merge_python_only
    s_off = IVFSearcher(nprobe=10).attach(art)
    res_off = s_off.search(q, 20, qid_col="qid", vec_col="vec")
    ivf_mod.cluster_scan_topk = orig_scan
    ivf_mod.merge_fragment_topk = orig_merge
    s_on = IVFSearcher(nprobe=10).attach(art)
    res_on = s_on.search(q, 20, qid_col="qid", vec_col="vec")

    # identical results?
    a = sorted(map(tuple, res_on.select("qid", "id", "rank").collect()))
    b = sorted(map(tuple, res_off.select("qid", "id", "rank").collect()))
    assert a == b, "small-batch path changed results"

    # warm both plans, then interleave
    materialize(res_on.select("qid", "id"))
    materialize(res_off.select("qid", "id"))
    t_on, t_off = timed_group(
        [
            lambda: materialize(
                s_on.search(q, 20, qid_col="qid", vec_col="vec").select(
                    "qid", "id"
                )
            ),
            lambda: materialize(
                s_off.search(q, 20, qid_col="qid", vec_col="vec").select(
                    "qid", "id"
                )
            ),
        ]
    )
    print(
        json.dumps(
            {
                "n_base": n_base,
                "n_queries": n_q,
                "wall_on_s": round(t_on, 4),
                "wall_off_s": round(t_off, 4),
                "qps_on": round(n_q / t_on, 1),
                "qps_off": round(n_q / t_off, 1),
                "speedup": round(t_off / t_on, 3),
                "identical_results": True,
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
