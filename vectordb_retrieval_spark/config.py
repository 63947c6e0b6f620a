"""Experiment/benchmark configuration model.

Parity with the reference's config semantics so its YAML files port
with only class-name mapping:

- ``ExperimentConfig`` fields (config.py:10-46): dataset, n_queries,
  topk, repeat, query_batch_size, algorithms{}, metric, seed.
- ``deep_merge_dict`` (runner.py:217-230): per-dataset overrides merge
  recursively onto base algorithm definitions.
- Reusable ``indexers{}``/``searchers{}`` registries referenced by
  ``indexer_ref``/``searcher_ref`` (runner.py:37-38,274-299,
  configs/benchmark_config.yaml:7-151), resolved to inline configs with
  default ``type: Composite``.
"""

from __future__ import annotations

import copy
import json
from dataclasses import dataclass, field
from typing import Any


def deep_merge_dict(base: dict, override: dict) -> dict:
    """Recursive dict merge, override wins; nested dicts merge key-wise
    (reference: runner.py:217-230)."""
    out = copy.deepcopy(base)
    for key, val in override.items():
        if isinstance(val, dict) and isinstance(out.get(key), dict):
            out[key] = deep_merge_dict(out[key], val)
        else:
            out[key] = copy.deepcopy(val)
    return out


@dataclass
class ExperimentConfig:
    dataset: dict[str, Any]
    algorithms: dict[str, dict[str, Any]] = field(default_factory=dict)
    n_queries: int | None = None
    topk: int = 10
    repeat: int = 1
    query_batch_size: int = 128
    metric: str = "l2"
    seed: int = 42
    evaluation_ks: list[int] = field(default_factory=lambda: [1, 10, 100])

    def to_dict(self) -> dict[str, Any]:
        return {
            "dataset": self.dataset,
            "algorithms": self.algorithms,
            "n_queries": self.n_queries,
            "topk": self.topk,
            "repeat": self.repeat,
            "query_batch_size": self.query_batch_size,
            "metric": self.metric,
            "seed": self.seed,
            "evaluation_ks": self.evaluation_ks,
        }


def load_config_file(path: str) -> dict[str, Any]:
    """YAML or JSON config file → dict (reference: runner.py:34-35)."""
    with open(path) as fh:
        text = fh.read()
    if path.endswith(".json"):
        return json.loads(text)
    import yaml

    return yaml.safe_load(text)


def _resolve_refs(
    algo_cfg: dict[str, Any],
    indexers: dict[str, dict],
    searchers: dict[str, dict],
) -> dict[str, Any]:
    """Resolve ``indexer_ref``/``searcher_ref`` against the reusable
    registries into inline configs (reference: runner.py:274-299), and
    ``index_spec`` FAISS-style factory strings (reference
    approximate_search.py ``index_type``) into indexer/searcher pairs —
    explicit ``indexer``/``searcher`` keys deep-merge on top."""
    cfg = copy.deepcopy(algo_cfg)
    if "index_spec" in cfg:
        from vectordb_retrieval_spark.registry import parse_index_spec

        spec = cfg.pop("index_spec")
        spec_params = cfg.pop("index_params", {})
        icfg, scfg = parse_index_spec(
            spec, cfg.get("metric", "l2"), **spec_params
        )
        if "metric" not in cfg and "metric" not in spec_params:
            # leave the slot open for the dataset-level metric
            # (setdefault in resolve_benchmark_config)
            icfg.pop("metric", None)
        cfg["indexer"] = deep_merge_dict(icfg, cfg.get("indexer", {}))
        cfg["searcher"] = deep_merge_dict(scfg, cfg.get("searcher", {}))
    if "indexer_ref" in cfg:
        ref = cfg.pop("indexer_ref")
        if ref not in indexers:
            raise KeyError(f"indexer_ref {ref!r} not in indexers registry")
        cfg["indexer"] = deep_merge_dict(indexers[ref], cfg.get("indexer", {}))
    if "searcher_ref" in cfg:
        ref = cfg.pop("searcher_ref")
        if ref not in searchers:
            raise KeyError(f"searcher_ref {ref!r} not in searchers registry")
        cfg["searcher"] = deep_merge_dict(searchers[ref], cfg.get("searcher", {}))
    cfg.setdefault("type", "Composite")
    return cfg


def resolve_benchmark_config(raw: dict[str, Any]) -> list[ExperimentConfig]:
    """Benchmark config dict → one fully-resolved ExperimentConfig per
    dataset (the reference's per-dataset "planner", runner.py:94-155):
    normalize dataset entries, deep-merge per-dataset algorithm
    overrides onto base definitions, force the dataset-level metric,
    resolve refs."""
    indexers = raw.get("indexers", {})
    searchers = raw.get("searchers", {})
    base_algos = raw.get("algorithms", {})
    defaults = {
        k: raw[k]
        for k in ("n_queries", "topk", "repeat", "query_batch_size", "seed",
                  "evaluation_ks")
        if k in raw
    }

    datasets = raw.get("datasets", [])
    if isinstance(datasets, dict):
        datasets = [
            {"name": name, **(cfg or {})} for name, cfg in datasets.items()
        ]
    configs: list[ExperimentConfig] = []
    for ds in datasets:
        ds = copy.deepcopy(ds)
        ds_algos = ds.pop("algorithms", {})
        merged_algos: dict[str, dict] = {}
        names = set(base_algos) | set(ds_algos)
        for name in sorted(names):
            merged = deep_merge_dict(
                base_algos.get(name, {}), ds_algos.get(name, {})
            )
            if merged.pop("enabled", True) is False:
                continue
            merged_algos[name] = _resolve_refs(merged, indexers, searchers)
        metric = ds.pop("metric", raw.get("metric", "l2"))
        # dataset-level metric is forced into every indexer config
        # (reference: runner.py:133-143; searchers read the metric from
        # the built artifact, not their constructor)
        for cfg in merged_algos.values():
            if isinstance(cfg.get("indexer"), dict):
                cfg["indexer"].setdefault("metric", metric)
        overrides = {
            k: ds.pop(k)
            for k in ("n_queries", "topk", "repeat", "query_batch_size", "seed",
                      "evaluation_ks")
            if k in ds
        }
        configs.append(
            ExperimentConfig(
                dataset=ds,
                algorithms=merged_algos,
                metric=metric,
                **{**defaults, **overrides},
            )
        )
    return configs
