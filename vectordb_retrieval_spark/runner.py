"""Experiment + benchmark runners with JSON/markdown reporting.

Reference counterparts: ``ExperimentRunner`` (experiment_runner.py:
42-488) and ``BenchmarkRunner`` (runner.py:29-215), re-shaped for Spark:

- dataset load dispatches to the sources package (random / parquet /
  glove / fvecs) and yields the (train, test, gt) DataFrame triple;
- query subsetting is a seeded hash-order limit (alignment with GT is
  free — GT is keyed by qid, not row position);
- per algorithm: fingerprint-gated build-vs-load of the persisted
  artifact (build_only / retrieve_only / auto modes, parity with
  experiment_runner.py:163-182,274-344), timed build, timed search
  (full materialization), metric sweep via the distributed metrics
  pass;
- reporting: per-algorithm JSON, combined JSON + config snapshot,
  markdown summary table (runner.py:664-728 analogue).

Timing semantics differ from the reference by design (SURVEY.md §7.4#2):
wall-clock covers whole distributed jobs; "qps" is
n_queries / search_wall_s — batch throughput, not per-query latency.
"""

from __future__ import annotations

import json
import os
import time
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from vectordb_retrieval_spark.config import ExperimentConfig
from vectordb_retrieval_spark.metrics import retrieval_metrics_multi
from vectordb_retrieval_spark.persistence import (
    artifact_size_bytes,
    config_fingerprint,
    load_artifact,
    save_artifact,
)
from vectordb_retrieval_spark.registry import get_algorithm_instance


def load_dataset(
    spark: SparkSession, ds: dict[str, Any], metric: str, gt_k: int, seed: int
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """(train(id, vec), test(qid, vec), gt(qid, id, rank)) per the
    dataset config's ``type``."""
    kind = ds.get("type", ds.get("name", "random"))
    if kind == "random":
        from vectordb_retrieval_spark.sources.random_gen import random_dataset

        train, test, gt_arr = random_dataset(
            spark,
            train_size=ds.get("train_size", 20_000),
            test_size=ds.get("test_size", 256),
            dimensions=ds.get("dimensions", 64),
            ground_truth_k=gt_k,
            seed=ds.get("seed", seed),
            metric=metric,
        )
        gt = gt_arr.select(
            "qid", F.posexplode("gt").alias("pos", "id")
        ).select("qid", "id", (F.col("pos") + 1).alias("rank"))
        return train, test, gt
    if kind == "parquet":
        from vectordb_retrieval_spark.operators.exact import exact_knn
        from vectordb_retrieval_spark.sources.vector_schema import load_vector_table

        base = load_vector_table(spark.read.parquet(ds["base_path"]))
        if "query_path" in ds:
            queries = load_vector_table(
                spark.read.parquet(ds["query_path"]), id_col="qid"
            )
        else:
            queries = base.filter(
                F.expr(ds.get("query_filter", "id % 10 = 0"))
            ).select(F.col("id").alias("qid"), "vec")
        gt = exact_knn(base, queries, gt_k, metric, qid_col="qid", qvec_col="vec")
        return base, queries, gt.select("qid", "id", "rank")
    if kind == "npy":
        # reference msmarco pre-embedded .npy pair (dataset.py:966-1108):
        # base/query arrays by row position, GT recomputed brute-force
        from vectordb_retrieval_spark.operators.exact import exact_knn
        from vectordb_retrieval_spark.sources.npy_loader import read_npy_vectors

        base = read_npy_vectors(spark, ds["base_path"], limit=ds.get("base_limit"))
        queries = read_npy_vectors(
            spark, ds["query_path"], limit=ds.get("query_limit"), id_col="qid"
        )
        gt = exact_knn(base, queries, gt_k, metric, qid_col="qid", qvec_col="vec")
        return base, queries, gt.select("qid", "id", "rank")
    if kind == "msmarco":
        # reference 3-pass parquet loader (dataset.py:1110-1701):
        # positives-based GT instead of brute force
        from vectordb_retrieval_spark.sources.msmarco import preembedded_dataset

        return preembedded_dataset(
            spark.read.parquet(ds["base_path"]),
            spark.read.parquet(ds["query_path"]),
            base_limit=ds.get("base_limit"),
            query_limit=ds.get("query_limit"),
            positives_col=ds.get("positives_col", "relevant_doc_ids"),
            gt_k=gt_k,
        )
    if kind == "glove":
        from vectordb_retrieval_spark.sources.glove import glove_dataset

        train, test, gt_arr = glove_dataset(
            spark,
            ds["path"],
            test_size=ds.get("test_size", 256),
            train_limit=ds.get("train_limit"),
            ground_truth_k=gt_k,
            seed=ds.get("seed", seed),
            metric=metric,
        )
        gt = gt_arr.select(
            "qid", F.posexplode("gt").alias("pos", "id")
        ).select("qid", "id", (F.col("pos") + 1).alias("rank"))
        return train, test, gt
    raise ValueError(f"unknown dataset type {kind!r}")


def _materialize(df: DataFrame) -> int:
    return df.count()


class ExperimentRunner:
    """One dataset, many algorithms."""

    def __init__(
        self,
        spark: SparkSession,
        config: ExperimentConfig,
        output_dir: str,
        index_dir: str | None = None,
        persistence_mode: str = "none",  # none | auto | build_only | retrieve_only
    ):
        self.spark = spark
        self.config = config
        self.output_dir = output_dir
        self.index_dir = index_dir or os.path.join(output_dir, "indexes")
        self.persistence_mode = persistence_mode
        os.makedirs(output_dir, exist_ok=True)

    # ---------------------------------------------------------------- dataset
    def load(self) -> tuple[DataFrame, DataFrame, DataFrame]:
        cfg = self.config
        gt_k = max([cfg.topk, *cfg.evaluation_ks])
        train, test, gt = load_dataset(
            self.spark, cfg.dataset, cfg.metric, gt_k, cfg.seed
        )
        if cfg.n_queries:
            # seeded subset without replacement; GT stays aligned by qid
            test = (
                test.withColumn("_r", F.xxhash64("qid", F.lit(cfg.seed)))
                .orderBy("_r", "qid")
                .limit(cfg.n_queries)
                .drop("_r")
            )
            gt = gt.join(test.select("qid"), "qid", "left_semi")
        return train, test, gt

    # -------------------------------------------------------------- algorithm
    def _fingerprint(self, name: str, algo_cfg: dict) -> str:
        return config_fingerprint(
            {
                "dataset": self.config.dataset,
                "metric": self.config.metric,
                "algorithm": {name: algo_cfg},
            }
        )

    def run_algorithm(
        self,
        name: str,
        algo_cfg: dict,
        train: DataFrame,
        test: DataFrame,
        gt: DataFrame,
    ) -> dict[str, Any]:
        cfg = self.config
        algo = get_algorithm_instance(
            algo_cfg.get("indexer", {"type": "brute_force"}),
            algo_cfg.get("searcher", {"type": "linear"}),
        )
        fp = self._fingerprint(name, algo_cfg)
        index_path = os.path.join(self.index_dir, name)

        build_time = 0.0
        loaded = False
        if self.persistence_mode in ("auto", "retrieve_only"):
            try:
                artifact = load_artifact(self.spark, index_path, fp)
                algo.artifact = artifact
                algo.searcher.attach(artifact)
                loaded = True
            except (FileNotFoundError, ValueError):
                if self.persistence_mode == "retrieve_only":
                    raise
        if not loaded:
            t0 = time.time()
            artifact = algo.build_index(train, id_col="id", vec_col="vec")
            for df in artifact.tables.values():
                _materialize(df)
            build_time = time.time() - t0
            if self.persistence_mode in ("auto", "build_only"):
                save_artifact(artifact, index_path, fp)
        index_size_mb = (
            round(artifact_size_bytes(index_path) / 2**20, 3)
            if os.path.exists(index_path)
            else None
        )
        if self.persistence_mode == "build_only":
            return {"algorithm": name, "build_time_s": round(build_time, 3),
                    "built_only": True, "fingerprint": fp,
                    "index_size_mb": index_size_mb}

        n_queries = test.count()
        t0 = time.time()
        pred = algo.batch_search(test, cfg.topk, qid_col="qid", vec_col="vec")
        pred = pred.cache()
        _materialize(pred)
        search_time = time.time() - t0

        # repeat-aware timing (reference config.py:26 declares repeat;
        # its statistics live in scripts/compare_algorithms.py:164-236):
        # each extra rep executes a FRESH search plan end to end, and the
        # reported wall/QPS become the mean over reps with the spread
        # kept alongside (mean±std feeds summary_markdown/one-pager).
        walls = [search_time]
        for _ in range(max(int(getattr(cfg, "repeat", 1)), 1) - 1):
            t0 = time.time()
            _materialize(
                algo.batch_search(test, cfg.topk, qid_col="qid", vec_col="vec")
            )
            walls.append(time.time() - t0)
        search_time = sum(walls) / len(walls)
        wall_std = (
            (sum((w - search_time) ** 2 for w in walls) / (len(walls) - 1))
            ** 0.5
            if len(walls) > 1
            else None
        )

        ks = sorted(set([*cfg.evaluation_ks, cfg.topk]))
        mrows = retrieval_metrics_multi(pred, gt, ks).collect()
        pred.unpersist()
        metrics: dict[str, Any] = {
            "algorithm": name,
            "n_queries": n_queries,
            "topk": cfg.topk,
            "build_time_s": round(build_time, 3),
            "search_wall_s": round(search_time, 3),
            "qps": round(n_queries / search_time, 2) if search_time else None,
            # reference semantics: batch wall divided evenly per query
            # (experiment_runner.py:434-437; see SURVEY §7.4#2 caveat)
            "mean_query_ms": round(1000.0 * search_time / n_queries, 3)
            if n_queries
            else None,
            "fingerprint": fp,
            "loaded_from_cache": loaded,
            "index_size_mb": index_size_mb,
        }
        if wall_std is not None:
            metrics["n_repeats"] = len(walls)
            metrics["search_wall_std_s"] = round(wall_std, 3)
            metrics["search_wall_runs_s"] = [round(w, 3) for w in walls]
            # per-query latency distribution over the repeats, per the
            # reference's wall-clock-divided-batch semantics
            # (experiment_runner.py:434-437: every query in a batch is
            # billed wall/n) and its percentile arithmetic
            # (metrics.py:222-234, numpy linear interpolation) — the
            # same derivation metrics.serving_latency_stats applies to
            # recorded timing frames
            if n_queries:
                import numpy as np

                per_ms = np.repeat(
                    np.array([1000.0 * w / n_queries for w in walls]),
                    n_queries,
                )
                metrics["query_ms_p50"] = round(
                    float(np.percentile(per_ms, 50)), 6
                )
                metrics["query_ms_p95"] = round(
                    float(np.percentile(per_ms, 95)), 6
                )
                metrics["query_ms_p99"] = round(
                    float(np.percentile(per_ms, 99)), 6
                )
            if search_time:
                # delta-method spread of qps = n/wall around the mean wall
                metrics["qps_std"] = round(
                    n_queries * wall_std / (search_time**2), 2
                )
        ndis = getattr(algo.searcher, "ndis_accum", None)
        if ndis is not None:
            metrics["ndis"] = int(ndis.value)
        for r in mrows:
            for m in ("recall", "precision", "map", "ndcg", "hit_rate", "mrr"):
                metrics[f"{m}@{r['k']}"] = round(float(r[m]), 6)
        summary_k = min(100, cfg.topk)
        metrics["recall"] = metrics.get(
            f"recall@{summary_k}", metrics.get(f"recall@{cfg.topk}")
        )
        return metrics

    # ------------------------------------------------------------------- run
    def run(self) -> dict[str, Any]:
        cfg = self.config
        train, test, gt = self.load()
        gt = gt.cache()
        _materialize(gt)
        results: dict[str, Any] = {}
        for name, algo_cfg in cfg.algorithms.items():
            results[name] = self.run_algorithm(name, algo_cfg, train, test, gt)
            with open(
                os.path.join(self.output_dir, f"{name}_results.json"), "w"
            ) as fh:
                json.dump(results[name], fh, indent=2)
        gt.unpersist()
        combined = {"config": cfg.to_dict(), "results": results}
        with open(os.path.join(self.output_dir, "combined_results.json"), "w") as fh:
            json.dump(combined, fh, indent=2, default=str)
        return combined


def summary_markdown(all_results: dict[str, dict[str, Any]]) -> str:
    """Benchmark summary table (reference: runner.py:664-728)."""
    lines = [
        "# Benchmark Summary",
        "",
        "| Dataset | Algorithm | Recall | QPS | Search Wall (s) | Build (s) |",
        "|---|---|---:|---:|---:|---:|",
    ]
    for ds_name, combined in all_results.items():
        for algo, m in combined["results"].items():
            if m.get("built_only"):
                lines.append(
                    f"| {ds_name} | {algo} | — | — | — | {m['build_time_s']} |"
                )
                continue
            qps = m.get("qps", "—")
            if m.get("qps_std") is not None:
                qps = f"{qps} ± {m['qps_std']}"
            wall = m.get("search_wall_s", "—")
            if m.get("search_wall_std_s") is not None:
                wall = f"{wall} ± {m['search_wall_std_s']}"
            lines.append(
                f"| {ds_name} | {algo} | {m.get('recall', '—')} |"
                f" {qps} | {wall} |"
                f" {m.get('build_time_s', '—')} |"
            )
    return "\n".join(lines) + "\n"


def _qps_recall_points(
    all_results: dict[str, dict[str, Any]]
) -> list[tuple[str, float, float]]:
    pts = []
    for ds_name, combined in all_results.items():
        for algo, m in combined["results"].items():
            if m.get("qps") and m.get("recall") is not None:
                pts.append((f"{ds_name}/{algo}", float(m["qps"]), float(m["recall"])))
    return pts


def _ops_points(
    all_results: dict[str, dict[str, Any]]
) -> tuple[list[tuple[str, float, float]], str]:
    """Distance-ops points with the reference's QPS fallback; returns
    (points, xlabel)."""
    pts = []
    fallback = False
    for ds_name, combined in all_results.items():
        for algo, m in combined["results"].items():
            if m.get("recall") is None:
                continue
            if m.get("ndis"):
                pts.append((f"{ds_name}/{algo}", float(m["ndis"]), float(m["recall"])))
            elif m.get("qps"):
                fallback = True
                pts.append((f"{ds_name}/{algo}", float(m["qps"]), float(m["recall"])))
    xlabel = "qps (log, fallback)" if fallback else "distance ops (ndis, log)"
    return pts, xlabel


def qps_recall_svg(all_results: dict[str, dict[str, Any]]) -> str:
    """Hand-rolled QPS-vs-recall SVG scatter (reference:
    runner.py:402-521) — log-x QPS, linear-y recall, one labeled point
    per (dataset, algorithm)."""
    import math

    pts = _qps_recall_points(all_results)
    w, h, pad = 640, 420, 56
    if not pts:
        return f'<svg xmlns="http://www.w3.org/2000/svg" width="{w}" height="{h}"/>'
    lo = min(p[1] for p in pts)
    hi = max(p[1] for p in pts)
    lx, hx = math.log10(max(lo, 1e-3)) - 0.2, math.log10(max(hi, 1e-3)) + 0.2

    def sx(q):
        return pad + (math.log10(max(q, 1e-3)) - lx) / (hx - lx) * (w - 2 * pad)

    def sy(r):
        return h - pad - r * (h - 2 * pad)

    parts = [
        f'<svg xmlns="http://www.w3.org/2000/svg" width="{w}" height="{h}">',
        f'<rect width="{w}" height="{h}" fill="white"/>',
        f'<line x1="{pad}" y1="{h-pad}" x2="{w-pad}" y2="{h-pad}" stroke="black"/>',
        f'<line x1="{pad}" y1="{pad}" x2="{pad}" y2="{h-pad}" stroke="black"/>',
        f'<text x="{w//2}" y="{h-12}" text-anchor="middle" font-size="12">QPS (log)</text>',
        f'<text x="14" y="{h//2}" font-size="12" transform="rotate(-90 14 {h//2})" text-anchor="middle">recall</text>',
    ]
    for label, q, r in pts:
        x, y = sx(q), sy(r)
        parts.append(f'<circle cx="{x:.1f}" cy="{y:.1f}" r="4" fill="steelblue"/>')
        parts.append(
            f'<text x="{x+6:.1f}" y="{y-6:.1f}" font-size="10">{label}</text>'
        )
    parts.append("</svg>")
    return "\n".join(parts)


def _scatter_svg(
    pts: list[tuple[str, float, float]], xlabel: str, ylabel: str
) -> str:
    """Log-x / linear-y labeled scatter (shared by the QPS and
    operations plots; reference hand-rolls the same shape,
    runner.py:402-521)."""
    import math

    w, h, pad = 640, 420, 56
    if not pts:
        return f'<svg xmlns="http://www.w3.org/2000/svg" width="{w}" height="{h}"/>'
    lo = min(p[1] for p in pts)
    hi = max(p[1] for p in pts)
    lx, hx = math.log10(max(lo, 1e-3)) - 0.2, math.log10(max(hi, 1e-3)) + 0.2
    ymax = max(1.0, max(p[2] for p in pts))

    def sx(q):
        return pad + (math.log10(max(q, 1e-3)) - lx) / (hx - lx) * (w - 2 * pad)

    def sy(r):
        return h - pad - (r / ymax) * (h - 2 * pad)

    parts = [
        f'<svg xmlns="http://www.w3.org/2000/svg" width="{w}" height="{h}">',
        f'<rect width="{w}" height="{h}" fill="white"/>',
        f'<line x1="{pad}" y1="{h-pad}" x2="{w-pad}" y2="{h-pad}" stroke="black"/>',
        f'<line x1="{pad}" y1="{pad}" x2="{pad}" y2="{h-pad}" stroke="black"/>',
        f'<text x="{w//2}" y="{h-12}" text-anchor="middle" font-size="12">{xlabel}</text>',
        f'<text x="14" y="{h//2}" font-size="12" transform="rotate(-90 14 {h//2})" text-anchor="middle">{ylabel}</text>',
    ]
    for label, x, y in pts:
        px, py = sx(x), sy(y)
        parts.append(f'<circle cx="{px:.1f}" cy="{py:.1f}" r="4" fill="steelblue"/>')
        parts.append(
            f'<text x="{px+6:.1f}" y="{py-6:.1f}" font-size="10">{label}</text>'
        )
    parts.append("</svg>")
    return "\n".join(parts)


def operations_recall_svg(all_results: dict[str, dict[str, Any]]) -> str:
    """Distance-operations-vs-recall scatter (reference:
    evaluation.plot_operations_vs_recall, tested by
    tests/test_operations_recall_plot.py:15-107): x = ndis (the
    similarity-op accumulator) when the searcher reports one, falling
    back to QPS — same fallback the reference implements."""
    pts, xlabel = _ops_points(all_results)
    return _scatter_svg(pts, xlabel, "recall")


def save_png_plots(
    all_results: dict[str, dict[str, Any]], output_dir: str
) -> list[str]:
    """matplotlib PNG twins of the SVG scatters (the reference emits
    PNGs, experiment_runner.py:764-780).  Env-gated exactly like the
    Pillow codec branches: lazily imports matplotlib (Agg backend) and
    returns the written paths, or [] when the library is absent — the
    SVGs remain the always-available record."""
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except ImportError:  # pragma: no cover - env-dependent
        return []
    ops_pts, ops_xlabel = _ops_points(all_results)
    written: list[str] = []
    for fname, pts, xlabel in (
        ("qps_vs_recall.png", _qps_recall_points(all_results), "QPS (log)"),
        ("operations_vs_recall.png", ops_pts, ops_xlabel),
    ):
        fig, ax = plt.subplots(figsize=(6.4, 4.2))
        if pts:
            ax.scatter([p[1] for p in pts], [p[2] for p in pts], c="steelblue")
            for label, x, y in pts:
                ax.annotate(label, (x, y), fontsize=7)
            ax.set_xscale("log")
        ax.set_xlabel(xlabel)
        ax.set_ylabel("recall")
        path = os.path.join(output_dir, fname)
        fig.savefig(path, format="png")
        plt.close(fig)
        written.append(path)
    return written


def one_page_summary(all_results: dict[str, dict[str, Any]]) -> str:
    """Compact one-page markdown summary with QPS-vs-recall plot links,
    per-dataset score tables and takeaways (reference:
    runner.py:523-662 _generate_one_page_summary)."""
    lines = ["# One-Page Benchmark Summary (QPS vs Recall)", ""]
    takeaways: list[str] = []
    for ds_name, combined in all_results.items():
        lines += [f"## Dataset: {ds_name}", ""]
        rows = []
        for algo, m in combined["results"].items():
            rows.append(
                (
                    algo,
                    m.get("recall"),
                    m.get("qps"),
                    m.get("mean_query_ms"),
                    m.get("build_time_s"),
                    "build_only" if m.get("built_only") else "ok",
                    m.get("qps_std"),
                )
            )
        plot_pts = [
            (a, q, r) for a, r, q, *_ in rows if q and r is not None
        ]
        if plot_pts:
            lines += [f"![QPS vs Recall — {ds_name}](./qps_vs_recall.svg)", ""]
            best_r = max(plot_pts, key=lambda p: (p[2], p[1]))
            best_q = max(plot_pts, key=lambda p: (p[1], p[2]))
            takeaways.append(
                f"- `{ds_name}`: best recall `{best_r[0]}` ({best_r[2]:.4f}), "
                f"best QPS `{best_q[0]}` ({best_q[1]:.2f})"
            )
        lines += [
            "| Algorithm | Recall | QPS | Mean Query Time (ms) | Build Time (s) | Status |",
            "|---|---:|---:|---:|---:|---|",
        ]
        for algo, rec, qps, mq, bt, status, qps_std in sorted(
            rows,
            key=lambda x: (
                -(x[1] if x[1] is not None else -1.0),
                -(x[2] if x[2] is not None else -1.0),
                x[0],
            ),
        ):
            fmt = lambda v, p: (f"{v:.{p}f}" if v is not None else "N/A")
            qps_cell = fmt(qps, 2)
            if qps_std is not None and qps is not None:
                qps_cell = f"{qps_cell} ± {qps_std:.2f}"
            lines.append(
                f"| {algo} | {fmt(rec, 4)} | {qps_cell} | {fmt(mq, 3)} |"
                f" {fmt(bt, 2)} | {status} |"
            )
        lines.append("")
        cfg = combined.get("config", {})
        if cfg:
            lines += ["### Dataset Details", ""]
            for key in ("metric", "topk", "n_queries", "seed"):
                if cfg.get(key) is not None:
                    lines.append(f"- {key}: `{cfg[key]}`")
            lines.append("")
    if takeaways:
        lines += ["## Brief Takeaways", "", *takeaways, ""]
    return "\n".join(lines).rstrip() + "\n"


class BenchmarkRunner:
    """Multi-dataset suite from a benchmark config file
    (reference: runner.py:29-215)."""

    def __init__(self, config_file: str, output_dir: str, spark: SparkSession):
        from vectordb_retrieval_spark.config import (
            load_config_file,
            resolve_benchmark_config,
        )

        self.raw = load_config_file(config_file)
        self.configs = resolve_benchmark_config(self.raw)
        self.output_dir = output_dir
        self.spark = spark
        os.makedirs(output_dir, exist_ok=True)

    def run(self) -> dict[str, Any]:
        all_results: dict[str, Any] = {}
        for cfg in self.configs:
            ds_name = cfg.dataset.get("name", cfg.dataset.get("type", "dataset"))
            out = os.path.join(self.output_dir, ds_name)
            runner = ExperimentRunner(self.spark, cfg, out)
            all_results[ds_name] = runner.run()
            # config snapshot for provenance (reference: runner.py:161-163)
            with open(os.path.join(out, f"{ds_name}_config.json"), "w") as fh:
                json.dump(cfg.to_dict(), fh, indent=2, default=str)
        with open(os.path.join(self.output_dir, "all_results.json"), "w") as fh:
            json.dump(all_results, fh, indent=2, default=str)
        with open(
            os.path.join(self.output_dir, "benchmark_summary.md"), "w"
        ) as fh:
            fh.write(summary_markdown(all_results))
        with open(
            os.path.join(self.output_dir, "qps_vs_recall.svg"), "w"
        ) as fh:
            fh.write(qps_recall_svg(all_results))
        with open(
            os.path.join(self.output_dir, "one_page_summary.md"), "w"
        ) as fh:
            fh.write(one_page_summary(all_results))
        with open(
            os.path.join(self.output_dir, "operations_vs_recall.svg"), "w"
        ) as fh:
            fh.write(operations_recall_svg(all_results))
        save_png_plots(all_results, self.output_dir)
        return all_results
