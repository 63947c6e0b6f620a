"""Standalone at-scale probe: the bench's 150k scale block at an
arbitrary corpus size (default 500k x 384-d clustered cosine).

Not part of bench.py's per-round run (the driver's budget sizes that at
150k); run manually to extend the scaling curve:

    python scripts/scale_probe.py [n_base]

Prints one JSON line with build times, interleaved QPS rows
(exact / ivf_sq8 / routed graph at 1024q, exact / ivf_sq8 at 4096q) and
recalls — the same methodology as bench.py's scale block (timed_group:
ratio sides sample the same interference windows).
"""

import json
import sys
import time

sys.path.insert(0, ".")

import numpy as np  # noqa: E402

from vectordb_retrieval_spark.session import get_spark  # noqa: E402


def materialize(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def timed_group(fns, reps=3):
    ts = [[] for _ in fns]

    def round_():
        for i, fn in enumerate(fns):
            t0 = time.time()
            fn()
            ts[i].append(time.time() - t0)

    for _ in range(reps):
        round_()
    if any(max(t) > 2.5 * max(min(t), 1e-9) for t in ts):
        for _ in range(2):
            round_()
    return [min(t) for t in ts]


def main() -> int:
    n_base = int(sys.argv[1]) if len(sys.argv) > 1 else 500_000
    spark = get_spark("scale_probe", master="local[32]")

    from vectordb_retrieval_spark.operators.exact import exact_knn
    from vectordb_retrieval_spark.operators.graph_ann import (
        GraphANNIndexer,
        GraphANNSearcher,
    )
    from vectordb_retrieval_spark.operators.ivf import IVFIndexer, IVFSearcher
    from vectordb_retrieval_spark.operators.quant import SQ8Codec
    from vectordb_retrieval_spark.sources.random_gen import clustered_vectors

    # warmup (JVM + python workers)
    spark.range(1000).selectExpr("sum(id)").collect()
    materialize(
        spark.range(10_000).repartition(32).mapInPandas(
            lambda it: it, schema="id long"
        )
    )
    cal_a = np.random.RandomState(0).rand(1024, 512).astype(np.float32)
    cal_b = np.random.RandomState(1).rand(512, 1024).astype(np.float32)
    cal_a @ cal_b
    t0 = time.time()
    for _ in range(10):
        cal_a @ cal_b
    out = {
        "n_base": n_base,
        "driver_gemm_gflops": round(
            10 * 2 * 1024 * 512 * 1024 / (time.time() - t0) / 1e9, 2
        ),
    }

    # scale shard count with the corpus so per-shard beam matrices stay
    # bounded (~4.7k rows/shard, the 150k block's density)
    n_shards = max(32, int(round(n_base / 4700 / 32)) * 32)

    t0 = time.time()
    base_s = clustered_vectors(
        spark, n_base, 384, n_clusters=200, spread=0.35, seed=13, stream=6,
        num_partitions=32,
    ).cache()
    materialize(base_s)
    out["gen_s"] = round(time.time() - t0, 3)
    q_s = clustered_vectors(
        spark, 1024, 384, n_clusters=200, spread=0.35, seed=13, stream=7,
        id_col="qid",
    ).cache()
    q_s.count()
    q4s = clustered_vectors(
        spark, 4096, 384, n_clusters=200, spread=0.35, seed=13, stream=10,
        id_col="qid",
    ).cache()
    q4s.count()

    t0 = time.time()
    sq8_art = IVFIndexer(
        nlist=256, metric="cosine", seed=13, max_iter=5,
        init_mode="k-means||", codec=SQ8Codec(),
    ).build(base_s, id_col="id", vec_col="vec")
    materialize(sq8_art.tables["assignment"])
    out["ivf_sq8_build_s"] = round(time.time() - t0, 3)

    t0 = time.time()
    g_art = GraphANNIndexer(
        m=16, metric="cosine", num_partitions=n_shards,
        partition_by="kmeans", seed=13, long_links=8,
    ).build(base_s, id_col="id", vec_col="vec")
    materialize(g_art.tables["graph"])
    out["graph_kmeans_build_s"] = round(time.time() - t0, 3)
    out["graph_shards"] = n_shards

    sq8 = IVFSearcher(nprobe=10).attach(sq8_art)
    g = GraphANNSearcher(ef_search=64, probe_partitions=4).attach(g_art)

    def t_exact(q):
        return lambda: materialize(
            exact_knn(base_s, q, 20, "cosine", qid_col="qid", qvec_col="vec")
        )

    def t_search(s, q):
        return lambda: materialize(
            s.search(q, 20, qid_col="qid", vec_col="vec").select("qid", "id")
        )

    for fn in (t_exact(q_s), t_search(sq8, q_s), t_search(g, q_s)):
        fn()  # warm
    te, ts_, tg = timed_group([t_exact(q_s), t_search(sq8, q_s), t_search(g, q_s)])
    out["qps_exact_1024q"] = round(1024 / te, 2)
    out["qps_ivf_sq8_nprobe10_1024q"] = round(1024 / ts_, 2)
    out["qps_graph_probe4_1024q"] = round(1024 / tg, 2)

    for fn in (t_exact(q4s), t_search(sq8, q4s)):
        fn()
    te4, ts4 = timed_group([t_exact(q4s), t_search(sq8, q4s)])
    out["qps_exact_4096q"] = round(4096 / te4, 2)
    out["qps_ivf_sq8_nprobe10_4096q"] = round(4096 / ts4, 2)

    exact_s = (
        exact_knn(base_s, q_s, 20, "cosine", qid_col="qid", qvec_col="vec")
        .select("qid", "id")
        .cache()
    )
    exact_s.count()
    out["recall_ivf_sq8_nprobe10"] = round(
        sq8.search(q_s, 20, qid_col="qid", vec_col="vec")
        .select("qid", "id")
        .join(exact_s, ["qid", "id"])
        .count()
        / (1024 * 20),
        4,
    )
    out["recall_graph_probe4"] = round(
        g.search(q_s, 20, qid_col="qid", vec_col="vec")
        .select("qid", "id")
        .join(exact_s, ["qid", "id"])
        .count()
        / (1024 * 20),
        4,
    )
    print("SCALE_PROBE " + json.dumps(out, sort_keys=True))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
