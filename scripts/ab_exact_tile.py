"""One-session interleaved A/B of the exact-kNN score-tile cap.

Times the SAME 4096-query exact search over a 500k x 384-d corpus with
the 2M-element score tiling ON vs OFF (cap lifted to 10^12 = untiled).
Interleaved reps sample the same container interference windows, so the
ratio isolates the tiling effect from background-load swings (the
untiled kernel's ~330 MB/worker score matrices are DRAM-bound and swing
hardest when the pool is contended).  Asserts identical result rows.

    python scripts/ab_exact_tile.py [n_base] [n_queries]
"""

import json
import sys
import time

sys.path.insert(0, ".")

from vectordb_retrieval_spark.session import get_spark  # noqa: E402


def materialize(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def timed_group(fns, reps=4):
    ts = [[] for _ in fns]
    for _ in range(reps):
        for i, fn in enumerate(fns):
            t0 = time.time()
            fn()
            ts[i].append(time.time() - t0)
    return [min(t) for t in ts]


def main() -> int:
    n_base = int(sys.argv[1]) if len(sys.argv) > 1 else 500_000
    n_q = int(sys.argv[2]) if len(sys.argv) > 2 else 4096
    spark = get_spark("ab_exact_tile", master="local[32]")

    from vectordb_retrieval_spark.operators import exact as exact_mod
    from vectordb_retrieval_spark.operators.exact import exact_knn
    from vectordb_retrieval_spark.sources.random_gen import clustered_vectors

    base = clustered_vectors(
        spark, n_base, 384, n_clusters=200, spread=0.35, seed=13, stream=6,
        num_partitions=32,
    ).cache()
    materialize(base)
    q = clustered_vectors(
        spark, n_q, 384, n_clusters=200, spread=0.35, seed=13, stream=10,
        id_col="qid",
    ).cache()
    q.count()

    def build(tile):
        exact_mod.SCORE_TILE_ELEMS = tile
        return exact_knn(base, q, 20, "cosine", qid_col="qid", qvec_col="vec")

    res_on = build(2_000_000)
    res_off = build(10**12)
    a = sorted(map(tuple, res_on.select("qid", "id", "rank").collect()))
    b = sorted(map(tuple, res_off.select("qid", "id", "rank").collect()))
    assert a == b, "tiling changed results"

    materialize(res_on.select("qid", "id"))
    materialize(res_off.select("qid", "id"))
    t_on, t_off = timed_group(
        [
            lambda: materialize(build(2_000_000).select("qid", "id")),
            lambda: materialize(build(10**12).select("qid", "id")),
        ]
    )
    print(
        json.dumps(
            {
                "n_base": n_base,
                "n_queries": n_q,
                "wall_on_s": round(t_on, 3),
                "wall_off_s": round(t_off, 3),
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
