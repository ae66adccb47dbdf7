"""One fresh-process leg timing the bench's cold prefix: get_spark (with
whatever SEISMIC_* env is set), docs.count, then the headline build exactly
as bench.py times it.  Prints one JSON line.

Usage: SEISMIC_PREWARM=0|1 python tools/ab_build_leg.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from canary import measure  # noqa: E402


def main() -> None:
    pre = measure()
    from seismic_spark.index import SeismicSparkIndex
    from seismic_spark.postings import IndexConfig
    from seismic_spark.session import get_spark

    cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    t0 = time.time()
    spark = get_spark("ab-build", cores=cores, shuffle_partitions=max(32, cores))
    spark.sparkContext.setLogLevel("ERROR")
    session_s = round(time.time() - t0, 2)

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    t0 = time.time()
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    docs.count()
    count_s = round(time.time() - t0, 2)

    t0 = time.time()
    idx = SeismicSparkIndex.build(spark, docs, IndexConfig(n_postings=10**6))
    idx.postings.count()
    build_s = round(time.time() - t0, 3)
    post = measure()
    spark.stop()
    print(json.dumps({
        "prewarm": os.environ.get("SEISMIC_PREWARM", "1"),
        "session_s": session_s, "count_s": count_s, "build_s": build_s,
        "canary_pre": pre["first_touch_mbps"],
        "canary_post": post["first_touch_mbps"],
    }))


if __name__ == "__main__":
    main()
