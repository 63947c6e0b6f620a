#!/usr/bin/env python
"""CLI benchmark entry point (reference:
scripts/run_full_benchmark.py:281-314).

    python scripts/run_benchmark.py --config configs/benchmark.yaml \
        --output-dir benchmark_results
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser(description="Run the benchmark suite")
    ap.add_argument("--config", required=True, help="YAML/JSON benchmark config")
    ap.add_argument("--output-dir", default="benchmark_results")
    ap.add_argument("--master", default=None, help="Spark master override")
    args = ap.parse_args()

    from vectordb_retrieval_spark.runner import BenchmarkRunner
    from vectordb_retrieval_spark.session import get_spark

    spark = get_spark("benchmark", master=args.master)
    runner = BenchmarkRunner(args.config, args.output_dir, spark)
    results = runner.run()
    for ds, combined in results.items():
        for algo, m in combined["results"].items():
            print(
                f"{ds}/{algo}: recall={m.get('recall')}"
                f" qps={m.get('qps')} build_s={m.get('build_time_s')}"
            )
    print(f"artifacts in {args.output_dir}/")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
