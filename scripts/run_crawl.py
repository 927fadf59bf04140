"""spark-submit entrypoint for the crawl engine.

Local smoke run:
    python scripts/run_crawl.py --warehouse /tmp/wh --pages 2000

Cluster deployment (north rule: spark-submit --py-files at N and 4N
executors; the engine itself never references the master — parallelism
comes entirely from partitioning):

    cd /root/repo && zip -r /tmp/crawler_spark.zip crawler_spark
    spark-submit \
      --master <cluster-master> \
      --num-executors <N or 4N> \
      --conf spark.sql.adaptive.enabled=true \
      --conf spark.sql.adaptive.skewJoin.enabled=true \
      --conf spark.sql.shuffle.partitions=<2-3x total cores> \
      --py-files /tmp/crawler_spark.zip \
      scripts/run_crawl.py --warehouse <shared-path> --pages 200000

Resume: re-running with the same --warehouse continues from the last
committed round snapshot (crashed half-rounds replay idempotently).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    p = argparse.ArgumentParser(description="Run the crawler_spark engine")
    p.add_argument("--warehouse", required=True, help="snapshot catalog root (shared path)")
    p.add_argument("--pages", type=int, default=10000, help="synthetic corpus size")
    p.add_argument("--hosts", type=int, default=16)
    p.add_argument("--max-rounds", type=int, default=100)
    p.add_argument("--round-duration", type=float, default=3600.0)
    p.add_argument("--deep-frac", type=float, default=0.1)
    p.add_argument("--no-payload", action="store_true", help="do not persist image bytes")
    p.add_argument("--master", default=None, help="override master (default: spark-submit's)")
    args = p.parse_args()

    from pyspark.sql import SparkSession

    from crawler_spark.operators.frontier import CrawlEngine
    from crawler_spark.session import get_spark
    from crawler_spark.sources.synth import corpus_to_spark, gen_corpus
    from crawler_spark.storage import SnapshotCatalog

    # under spark-submit the session already exists with the submitted
    # master/conf; get_spark only fills local defaults otherwise
    active = SparkSession.getActiveSession()
    spark = active if active is not None else get_spark(master=args.master)
    spark.sparkContext.setLogLevel("WARN")

    corpus = corpus_to_spark(
        spark,
        gen_corpus(n_pages=args.pages, n_hosts=args.hosts, deep_frac=args.deep_frac),
    )
    engine = CrawlEngine(
        spark=spark,
        catalog=SnapshotCatalog(spark, args.warehouse),
        seed_pages=corpus["seed_pages"],
        sitemap_entries=corpus["sitemap_entries"],
        robots_rules=corpus["robots_rules"],
        keywords=corpus["keywords"],
        round_duration=args.round_duration,
        store_payload=not args.no_payload,
    )
    if not engine.catalog.exists("frontier"):
        engine.bootstrap()
        print(f"bootstrapped frontier at round {engine.current_round()}")
    else:
        print(f"resuming from round {engine.current_round()}")

    t0 = time.time()
    metrics = engine.run(max_rounds=args.max_rounds)
    elapsed = time.time() - t0
    scheduled = sum(m["scheduled"] for m in metrics)
    print(
        json.dumps(
            {
                "rounds": len(metrics),
                "scheduled": scheduled,
                "stored": sum(m["stored"] for m in metrics),
                "pages": engine.pages().count(),
                "pending": engine.pending_count(),
                "secs": round(elapsed, 2),
                "urls_per_sec": round(scheduled / elapsed, 1) if elapsed else None,
            }
        )
    )


if __name__ == "__main__":
    main()
