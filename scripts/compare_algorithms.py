"""Statistical algorithm-comparison CLI — the driver for
sweep.run_algorithm_comparison.

Parity: reference ``scripts/compare_algorithms.py:470-539`` (argparse
surface: --config / --output-dir / --num-runs / --create-config).
Each run reseeds (base seed + run index, exactly the reference's
per-run reseeding); the report carries per-metric mean±std and a
pairwise Welch-t significance table (stdlib math, no scipy).

    python scripts/compare_algorithms.py --create-config
    python scripts/compare_algorithms.py --config configs/comparison_config.yaml
"""

import argparse
import json
import os
import sys

sys.path.insert(0, ".")

DEFAULT_CONFIG = {
    "dataset": {
        "type": "random",
        "train_size": 20_000,
        "test_size": 512,
        "dimensions": 64,
        "seed": 42,
    },
    "algorithms": {
        "exact": {
            "indexer": {"type": "brute_force"},
            "searcher": {"type": "linear"},
        },
        "ivf_sq8": {
            "indexer": {"type": "ivf_sq8", "nlist": 128, "seed": 42},
            "searcher": {"type": "ivf", "nprobe": 8},
        },
        "graph": {
            "indexer": {"type": "graph_ann", "m": 8, "seed": 42},
            "searcher": {"type": "graph_ann", "ef_search": 48},
        },
    },
    "metric": "l2",
    "topk": 10,
    "n_queries": 500,
    "seed": 42,
    "evaluation_ks": [1, 10],
}


def create_default_comparison_config() -> str:
    import yaml

    os.makedirs("configs", exist_ok=True)
    path = "configs/comparison_config.yaml"
    with open(path, "w") as fh:
        yaml.safe_dump(DEFAULT_CONFIG, fh, default_flow_style=False)
    print(f"Default comparison configuration created: {path}")
    return path


def main() -> int:
    parser = argparse.ArgumentParser(
        description="Compare vector retrieval algorithms with statistics"
    )
    parser.add_argument("--config", type=str, help="comparison config")
    parser.add_argument(
        "--output-dir", type=str, default="algorithm_comparison_results"
    )
    parser.add_argument("--num-runs", type=int, default=3)
    parser.add_argument("--create-config", action="store_true")
    args = parser.parse_args()

    if args.create_config:
        path = create_default_comparison_config()
        print(f"Use: python {__file__} --config {path}")
        return 0
    if not args.config or not os.path.exists(args.config):
        print(
            "Error: --config is required (use --create-config to generate "
            "a default)."
        )
        return 2

    from vectordb_retrieval_spark.config import load_config_file
    from vectordb_retrieval_spark.session import get_spark
    from vectordb_retrieval_spark.sweep import run_algorithm_comparison

    spark = get_spark("algorithm_comparison")
    stats = run_algorithm_comparison(
        spark,
        load_config_file(args.config),
        num_runs=args.num_runs,
        output_dir=args.output_dir,
    )
    print(json.dumps(stats["metrics"], indent=2, default=str))
    print(f"Reports under: {args.output_dir}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
