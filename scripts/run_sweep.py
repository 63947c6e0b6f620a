"""Parameter-sweep CLI — the driver for sweep.run_parameter_sweep.

Parity: reference ``scripts/parameter_sweep.py:391-418`` (argparse
surface: --config / --output-dir / --create-config; default-config
generator).  The sweep itself runs all combinations against ONE shared
dataset + cached ground truth (see vectordb_retrieval_spark/sweep.py).

    python scripts/run_sweep.py --create-config
    python scripts/run_sweep.py --config configs/sweep_config.yaml
"""

import argparse
import json
import os
import sys

sys.path.insert(0, ".")

DEFAULT_CONFIG = {
    "base": {
        "dataset": {
            "type": "random",
            "train_size": 20_000,
            "test_size": 512,
            "dimensions": 64,
            "seed": 42,
        },
        "metric": "l2",
        "topk": 10,
        "n_queries": 500,
        "seed": 42,
        "evaluation_ks": [1, 10],
    },
    "sweeps": {
        "ivf_sq8": {
            "algorithm": {
                "indexer": {"type": "ivf_sq8", "nlist": 128, "seed": 42},
                "searcher": {"type": "ivf"},
            },
            "grid": {"searcher.nprobe": [1, 2, 4, 8, 16]},
        },
        "graph": {
            "algorithm": {
                "indexer": {"type": "graph_ann", "m": 8, "seed": 42},
                "searcher": {"type": "graph_ann"},
            },
            "grid": {"searcher.ef_search": [16, 24, 48, 64]},
        },
        "lsh": {
            "algorithm": {
                "indexer": {"type": "lsh", "dimension": 64, "seed": 42},
                "searcher": {"type": "lsh"},
            },
            "grid": {
                "indexer.num_tables": [2, 4],
                "indexer.hash_size": [6, 8],
            },
        },
    },
}


def create_default_sweep_config() -> str:
    import yaml

    os.makedirs("configs", exist_ok=True)
    path = "configs/sweep_config.yaml"
    with open(path, "w") as fh:
        yaml.safe_dump(DEFAULT_CONFIG, fh, default_flow_style=False)
    print(f"Default sweep configuration created: {path}")
    return path


def main() -> int:
    parser = argparse.ArgumentParser(
        description="Run a parameter sweep for vector retrieval algorithms"
    )
    parser.add_argument("--config", type=str, help="sweep config YAML/JSON")
    parser.add_argument(
        "--output-dir", type=str, default="parameter_sweep_results"
    )
    parser.add_argument("--create-config", action="store_true")
    args = parser.parse_args()

    if args.create_config:
        path = create_default_sweep_config()
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
    from vectordb_retrieval_spark.sweep import run_parameter_sweep

    spark = get_spark("parameter_sweep")
    out = run_parameter_sweep(
        spark, load_config_file(args.config), args.output_dir
    )
    print(json.dumps(out["best"], indent=2, default=str))
    print(f"Reports under: {args.output_dir}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
