"""spark-submit entry point: delegates to the package CLI.

Usage: spark-submit --py-files linguistjs_spark.zip run_quality_filter.py \
           <pages_parquet_dir> --output /path/out --buckets 64
"""
import sys

from linguistjs_spark.cli import main

if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
