"""Parameter sweeps and statistical algorithm comparison.

Parity targets (Human-Augment-Analytics/vectordb-retrieval):

- ``scripts/parameter_sweep.py:29-418`` — grid expansion over an
  algorithm's parameter ranges, one experiment per combination,
  best-config analysis (best recall / best QPS / best balanced =
  recall×QPS), a summary report and recall-vs-QPS visualization.
- ``scripts/compare_algorithms.py:36-539`` — repeat-aware runs
  (num_runs seeds per algorithm), per-metric mean±std, and pairwise
  significance tests between algorithms.

Spark-first deltas from the reference:

- The reference reloads the dataset and rebuilds ground truth for
  EVERY parameter combination (``run_single_configuration`` constructs
  a fresh ExperimentRunner each time).  Here the dataset and the
  cached ground truth are loaded ONCE per sweep and shared across all
  combinations — at 100 TB the dataset scan dominates, so a sweep of k
  configs costs 1 scan + k searches instead of k scans + k searches.
- Significance uses Welch's t (unequal variances) with the p-value
  from the regularized incomplete beta — plain math, no scipy (the
  reference leans on ``scipy.stats.ttest_ind``).
"""

from __future__ import annotations

import copy
import itertools
import json
import math
import os
import time
from typing import Any

from pyspark.sql import SparkSession

from vectordb_retrieval_spark.config import ExperimentConfig
from vectordb_retrieval_spark.runner import ExperimentRunner, _scatter_svg

# --------------------------------------------------------------------- grid


def expand_grid(param_ranges: dict[str, list]) -> list[dict[str, Any]]:
    """All combinations of the parameter ranges, in deterministic
    (sorted-key, given-value-order) order.  Parity:
    parameter_sweep.py:78-97 generate_parameter_combinations."""
    if not param_ranges:
        return [{}]
    names = sorted(param_ranges)
    return [
        dict(zip(names, combo))
        for combo in itertools.product(*(param_ranges[n] for n in names))
    ]


def _set_path(cfg: dict, dotted: str, value: Any) -> None:
    """Set ``cfg['a']['b'] = value`` for dotted path ``'a.b'``,
    creating intermediate dicts."""
    parts = dotted.split(".")
    cur = cfg
    for p in parts[:-1]:
        cur = cur.setdefault(p, {})
    cur[parts[-1]] = value


def _combo_name(family: str, combo: dict[str, Any]) -> str:
    if not combo:
        return family
    inner = ",".join(f"{k.split('.')[-1]}={v}" for k, v in sorted(combo.items()))
    return f"{family}({inner})"


# -------------------------------------------------------------------- sweep


def run_parameter_sweep(
    spark: SparkSession, sweep_cfg: dict[str, Any], output_dir: str
) -> dict[str, Any]:
    """Grid sweep over algorithm parameters on ONE shared dataset.

    ``sweep_cfg``::

        base:                       # ExperimentConfig fields (no algorithms)
          dataset: {type: random, ...}
          metric: l2
          topk: 10
        sweeps:
          ivf:                      # algorithm family
            algorithm:              # base indexer/searcher config
              indexer: {type: ivf_flat, nlist: 8}
              searcher: {type: ivf}
            grid:                   # dotted paths into the algorithm cfg
              searcher.nprobe: [1, 2, 4, 8]
              indexer.nlist: [4, 8]

    Returns ``{"results": [...], "best": {...}}`` and writes
    ``sweep_results.json``, ``sweep_summary.md`` and
    ``recall_vs_qps_curves.svg`` under ``output_dir``.  Parity:
    parameter_sweep.py:170-359 (run loop, analyze_results,
    generate_reports) — with the dataset/GT loaded once, not per
    combination."""
    base = dict(sweep_cfg.get("base", {}))
    base.pop("algorithms", None)
    cfg = ExperimentConfig(algorithms={}, **base)
    os.makedirs(output_dir, exist_ok=True)
    runner = ExperimentRunner(spark, cfg, output_dir)
    train, test, gt = runner.load()
    gt = gt.cache()
    gt.count()

    results: list[dict[str, Any]] = []
    idx = 0
    try:
        for family, spec in sweep_cfg.get("sweeps", {}).items():
            base_algo = spec.get("algorithm", {})
            for combo in expand_grid(spec.get("grid", {})):
                algo_cfg = copy.deepcopy(base_algo)
                for dotted, val in combo.items():
                    _set_path(algo_cfg, dotted, val)
                name = _combo_name(family, combo)
                t0 = time.time()
                row = runner.run_algorithm(name, algo_cfg, train, test, gt)
                row["family"] = family
                row["params"] = dict(combo)
                row["config_index"] = idx
                row["experiment_time_s"] = round(time.time() - t0, 3)
                results.append(row)
                idx += 1
    finally:
        gt.unpersist()

    best = analyze_sweep(results)
    out = {"results": results, "best": best}
    with open(os.path.join(output_dir, "sweep_results.json"), "w") as fh:
        json.dump(out, fh, indent=2, default=str)
    with open(os.path.join(output_dir, "sweep_summary.md"), "w") as fh:
        fh.write(sweep_summary_markdown(results, best))
    with open(
        os.path.join(output_dir, "recall_vs_qps_curves.svg"), "w"
    ) as fh:
        fh.write(sweep_curves_svg(results))
    save_sweep_png(results, output_dir)
    return out


def save_sweep_png(results: list[dict[str, Any]], output_dir: str) -> list[str]:
    """matplotlib PNG twin of ``recall_vs_qps_curves.svg`` (one
    polyline per family).  Env-gated like runner.save_png_plots —
    returns [] without matplotlib."""
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except ImportError:  # pragma: no cover - env-dependent
        return []
    fig, ax = plt.subplots(figsize=(6.4, 4.2))
    families: dict[str, list[tuple[float, float]]] = {}
    for r in results:
        if r.get("qps") and r.get("recall") is not None:
            families.setdefault(r.get("family", ""), []).append(
                (float(r["qps"]), float(r["recall"]))
            )
    for family, pts in sorted(families.items()):
        pts = sorted(pts)
        ax.plot(
            [p[0] for p in pts], [p[1] for p in pts],
            marker="o", label=family or "(default)",
        )
    if families:
        ax.set_xscale("log")
        ax.legend(fontsize=8)
    ax.set_xlabel("QPS (log)")
    ax.set_ylabel("recall")
    path = os.path.join(output_dir, "recall_vs_qps_curves.png")
    fig.savefig(path, format="png")
    plt.close(fig)
    return [path]


def analyze_sweep(results: list[dict[str, Any]]) -> dict[str, Any]:
    """Best configurations per objective — best recall, best QPS, best
    balanced (recall×QPS) — overall and per family.  Parity:
    parameter_sweep.py:223-259 analyze_results/best_configs."""
    ok = [
        r
        for r in results
        if r.get("recall") is not None and r.get("qps")
    ]

    def pick(rows: list[dict], key) -> dict[str, Any] | None:
        if not rows:
            return None
        r = max(rows, key=key)
        return {
            "algorithm": r["algorithm"],
            "params": r.get("params", {}),
            "recall": r["recall"],
            "qps": r["qps"],
        }

    best = {
        "best_recall": pick(ok, lambda r: (r["recall"], r["qps"])),
        "best_qps": pick(ok, lambda r: (r["qps"], r["recall"])),
        "best_balanced": pick(ok, lambda r: r["recall"] * r["qps"]),
        "per_family": {},
    }
    for family in sorted({r.get("family", "") for r in ok}):
        rows = [r for r in ok if r.get("family") == family]
        best["per_family"][family] = {
            "best_recall": pick(rows, lambda r: (r["recall"], r["qps"])),
            "best_qps": pick(rows, lambda r: (r["qps"], r["recall"])),
            "best_balanced": pick(rows, lambda r: r["recall"] * r["qps"]),
        }
    return best


def sweep_summary_markdown(
    results: list[dict[str, Any]], best: dict[str, Any]
) -> str:
    """Sweep report: full per-config table + best-config section.
    Parity: parameter_sweep.py:285-322 generate_summary_report."""
    lines = [
        "# Parameter Sweep Summary",
        "",
        f"Configurations: {len(results)}",
        "",
        "| # | Algorithm | Params | Recall | QPS | Build (s) | Search (s) |",
        "|---:|---|---|---:|---:|---:|---:|",
    ]
    for r in results:
        params = ", ".join(f"{k}={v}" for k, v in sorted(r.get("params", {}).items()))
        lines.append(
            f"| {r.get('config_index', '—')} | {r['algorithm']} | {params or '—'} |"
            f" {r.get('recall', '—')} | {r.get('qps', '—')} |"
            f" {r.get('build_time_s', '—')} | {r.get('search_wall_s', '—')} |"
        )
    lines += ["", "## Best configurations", ""]
    for objective in ("best_recall", "best_qps", "best_balanced"):
        b = best.get(objective)
        if b:
            lines.append(
                f"- **{objective}**: `{b['algorithm']}` — recall {b['recall']},"
                f" QPS {b['qps']}"
            )
    for family, fb in best.get("per_family", {}).items():
        b = fb.get("best_balanced")
        if b:
            lines.append(
                f"- family `{family}` best balanced: `{b['algorithm']}` —"
                f" recall {b['recall']}, QPS {b['qps']}"
            )
    return "\n".join(lines) + "\n"


def sweep_curves_svg(results: list[dict[str, Any]]) -> str:
    """Recall-vs-QPS curve per algorithm family: the sweep's points
    connected in QPS order (the classic ANN tradeoff curve; reference
    plots the same scatter in parameter_sweep.py:324-359).  Built on
    the runner's hand-rolled scatter, with one polyline per family."""
    pts = [
        (r["algorithm"], float(r["qps"]), float(r["recall"]))
        for r in results
        if r.get("qps") and r.get("recall") is not None
    ]
    svg = _scatter_svg(pts, "QPS (log)", "recall")
    if not pts:
        return svg
    # inject one polyline per family (same coordinate mapping as the
    # scatter: log-x over the full point range, linear-y in recall)
    lo = min(p[1] for p in pts)
    hi = max(p[1] for p in pts)
    lx, hx = math.log10(max(lo, 1e-3)) - 0.2, math.log10(max(hi, 1e-3)) + 0.2
    ymax = max(1.0, max(p[2] for p in pts))
    w, h, pad = 640, 420, 56

    def sx(q):
        return pad + (math.log10(max(q, 1e-3)) - lx) / (hx - lx) * (w - 2 * pad)

    def sy(r):
        return h - pad - (r / ymax) * (h - 2 * pad)

    families: dict[str, list[tuple[float, float]]] = {}
    for r in results:
        if r.get("qps") and r.get("recall") is not None:
            families.setdefault(r.get("family", ""), []).append(
                (float(r["qps"]), float(r["recall"]))
            )
    colors = ["steelblue", "darkorange", "seagreen", "crimson", "purple"]
    lines = []
    for i, (family, fpts) in enumerate(sorted(families.items())):
        fpts.sort()
        path = " ".join(f"{sx(q):.1f},{sy(r):.1f}" for q, r in fpts)
        color = colors[i % len(colors)]
        lines.append(
            f'<polyline points="{path}" fill="none" stroke="{color}"'
            f' stroke-width="1.5"><title>{family}</title></polyline>'
        )
    return svg.replace("</svg>", "\n".join(lines) + "</svg>")


# -------------------------------------------------- statistical comparison


def _betacf(a: float, b: float, x: float) -> float:
    """Continued fraction for the incomplete beta (modified Lentz)."""
    max_it, eps, fpmin = 200, 3e-12, 1e-300
    qab, qap, qam = a + b, a + 1.0, a - 1.0
    c = 1.0
    d = 1.0 - qab * x / qap
    if abs(d) < fpmin:
        d = fpmin
    d = 1.0 / d
    h = d
    for m in range(1, max_it + 1):
        m2 = 2 * m
        aa = m * (b - m) * x / ((qam + m2) * (a + m2))
        d = 1.0 + aa * d
        if abs(d) < fpmin:
            d = fpmin
        c = 1.0 + aa / c
        if abs(c) < fpmin:
            c = fpmin
        d = 1.0 / d
        h *= d * c
        aa = -(a + m) * (qab + m) * x / ((a + m2) * (qap + m2))
        d = 1.0 + aa * d
        if abs(d) < fpmin:
            d = fpmin
        c = 1.0 + aa / c
        if abs(c) < fpmin:
            c = fpmin
        d = 1.0 / d
        delta = d * c
        h *= delta
        if abs(delta - 1.0) < eps:
            break
    return h


def _ibeta(a: float, b: float, x: float) -> float:
    """Regularized incomplete beta I_x(a, b)."""
    if x <= 0.0:
        return 0.0
    if x >= 1.0:
        return 1.0
    ln_front = (
        math.lgamma(a + b)
        - math.lgamma(a)
        - math.lgamma(b)
        + a * math.log(x)
        + b * math.log(1.0 - x)
    )
    front = math.exp(ln_front)
    if x < (a + 1.0) / (a + b + 2.0):
        return front * _betacf(a, b, x) / a
    return 1.0 - front * _betacf(b, a, 1.0 - x) / b


def welch_t(xs: list[float], ys: list[float]) -> tuple[float, float, float]:
    """Welch's unequal-variance t-test: (t, df, two-sided p).  The
    p-value is the Student-t survival via the regularized incomplete
    beta — the same number scipy.stats.ttest_ind(equal_var=False)
    reports, computed with stdlib math only."""
    n1, n2 = len(xs), len(ys)
    if n1 < 2 or n2 < 2:
        raise ValueError("welch_t needs at least 2 observations per side")
    m1, m2 = sum(xs) / n1, sum(ys) / n2
    v1 = sum((x - m1) ** 2 for x in xs) / (n1 - 1)
    v2 = sum((y - m2) ** 2 for y in ys) / (n2 - 1)
    se2 = v1 / n1 + v2 / n2
    if se2 <= 0.0:
        return 0.0, float(n1 + n2 - 2), 1.0
    t = (m1 - m2) / math.sqrt(se2)
    df = se2**2 / (
        (v1 / n1) ** 2 / (n1 - 1) + (v2 / n2) ** 2 / (n2 - 1)
    )
    p = _ibeta(df / 2.0, 0.5, df / (df + t * t))
    return t, df, min(max(p, 0.0), 1.0)


COMPARE_METRICS = ("recall", "qps", "mean_query_ms", "build_time_s")


def comparison_stats(
    runs: list[dict[str, dict[str, Any]]],
    metrics: tuple[str, ...] = COMPARE_METRICS,
) -> dict[str, Any]:
    """Per-algorithm mean±std and pairwise Welch significance from a
    list of per-run result dicts (each ``{algo: metrics_dict}``).
    Parity: compare_algorithms.py:164-236 perform_statistical_analysis
    (np.mean/np.std + ttest_ind → stdlib mean/sample-std + welch_t)."""
    algos = sorted({a for run in runs for a in run})
    values: dict[str, dict[str, list[float]]] = {
        m: {a: [] for a in algos} for m in metrics
    }
    for run in runs:
        for a, row in run.items():
            for m in metrics:
                v = row.get(m)
                if v is not None:
                    values[m][a].append(float(v))
    stats: dict[str, Any] = {"n_runs": len(runs), "metrics": {}, "tests": {}}
    for m in metrics:
        stats["metrics"][m] = {}
        for a in algos:
            vs = values[m][a]
            if not vs:
                continue
            mean = sum(vs) / len(vs)
            std = (
                math.sqrt(sum((v - mean) ** 2 for v in vs) / (len(vs) - 1))
                if len(vs) > 1
                else 0.0
            )
            stats["metrics"][m][a] = {
                "mean": round(mean, 6),
                "std": round(std, 6),
                "n": len(vs),
            }
        tests = {}
        for a1, a2 in itertools.combinations(algos, 2):
            v1, v2 = values[m][a1], values[m][a2]
            if len(v1) < 2 or len(v2) < 2:
                continue
            try:
                t, df, p = welch_t(v1, v2)
            except ValueError:
                continue
            tests[f"{a1} vs {a2}"] = {
                "t": round(t, 4),
                "df": round(df, 2),
                "p_value": round(p, 6),
                "significant_005": p < 0.05,
            }
        stats["tests"][m] = tests
    return stats


def comparison_markdown(stats: dict[str, Any]) -> str:
    """mean±std table + pairwise significance table.  Parity:
    compare_algorithms.py:301-408 (summary + statistical reports)."""
    lines = [
        "# Algorithm Comparison (statistical)",
        "",
        f"Runs per algorithm: {stats.get('n_runs', '—')}",
        "",
        "| Algorithm | " + " | ".join(
            f"{m} (mean ± std)" for m in stats["metrics"]
        ) + " |",
        "|---|" + "---:|" * len(stats["metrics"]),
    ]
    algos = sorted(
        {a for per in stats["metrics"].values() for a in per}
    )
    for a in algos:
        cells = []
        for m in stats["metrics"]:
            s = stats["metrics"][m].get(a)
            cells.append(
                f"{s['mean']:.4f} ± {s['std']:.4f}" if s else "—"
            )
        lines.append(f"| {a} | " + " | ".join(cells) + " |")
    lines += [
        "",
        "## Pairwise significance (Welch's t, two-sided)",
        "",
        "| Metric | Pair | t | df | p | significant (p<0.05) |",
        "|---|---|---:|---:|---:|---|",
    ]
    for m, tests in stats["tests"].items():
        for pair, r in tests.items():
            lines.append(
                f"| {m} | {pair} | {r['t']} | {r['df']} | {r['p_value']} |"
                f" {'yes' if r['significant_005'] else 'no'} |"
            )
    return "\n".join(lines) + "\n"


def run_algorithm_comparison(
    spark: SparkSession,
    base_cfg: dict[str, Any],
    num_runs: int = 3,
    output_dir: str = "comparison_out",
) -> dict[str, Any]:
    """num_runs full experiment runs (seed = base_seed + run index,
    exactly the reference's per-run reseeding,
    compare_algorithms.py:108-112), then mean±std + significance.
    Writes ``comparison_stats.json`` and ``comparison_report.md``."""
    os.makedirs(output_dir, exist_ok=True)
    runs: list[dict[str, dict[str, Any]]] = []
    base_seed = int(base_cfg.get("seed", 42))
    for run_idx in range(num_runs):
        cfg_dict = copy.deepcopy(base_cfg)
        cfg_dict["seed"] = base_seed + run_idx
        ds = cfg_dict.get("dataset")
        if isinstance(ds, dict) and "seed" in ds:
            ds["seed"] = int(ds["seed"]) + run_idx
        cfg = ExperimentConfig(**cfg_dict)
        runner = ExperimentRunner(
            spark, cfg, os.path.join(output_dir, f"run_{run_idx}")
        )
        runs.append(runner.run()["results"])
    stats = comparison_stats(runs)
    with open(os.path.join(output_dir, "comparison_stats.json"), "w") as fh:
        json.dump(stats, fh, indent=2, default=str)
    with open(os.path.join(output_dir, "comparison_report.md"), "w") as fh:
        fh.write(comparison_markdown(stats))
    return stats
