"""spark-submit entrypoint for the crawler_spark engine.

Subcommands mirror the reference CLI (src/crawler.py:853-874):

    crawl     harvest rounds over the synthetic corpus  (reference: harvest)
    analyze   re-match keywords, rewrite the bridge     (reference: analyze,
              src/crawler.py:244-295)
    backfill  re-derive missing payload fields          (reference: update,
              src/crawler.py:470-633)
    export    filter-labeled per-ad files + per-dir CSVs + filename
              write-back                                (reference: export,
              src/crawler.py:189-241)
    assembly  the 8-column CSV                          (reference: assembly,
              src/crawler.py:149-186)
    report    per-portal/per-sitemap link counts CSV    (reference:
              src/count_advertisements.py)

Local smoke run:
    python scripts/run_crawl.py crawl --warehouse /tmp/wh --pages 2000
    python scripts/run_crawl.py analyze --warehouse /tmp/wh
    python scripts/run_crawl.py export --warehouse /tmp/wh --out /tmp/exp

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
      scripts/run_crawl.py crawl --warehouse <shared-path> --pages 200000

Resume: re-running crawl with the same --warehouse continues from the
last committed round snapshot (crashed half-rounds replay idempotently).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _spark(master: str | None):
    from pyspark.sql import SparkSession

    from crawler_spark.session import get_spark

    # under spark-submit the session already exists with the submitted
    # master/conf; get_spark only fills local defaults otherwise
    active = SparkSession.getActiveSession()
    spark = active if active is not None else get_spark(master=master)
    spark.sparkContext.setLogLevel("WARN")
    return spark


def _corpus(spark, args):
    from crawler_spark.sources.synth import corpus_to_spark, gen_corpus

    return corpus_to_spark(
        spark,
        gen_corpus(n_pages=args.pages, n_hosts=args.hosts, deep_frac=args.deep_frac),
    )


def _catalog(spark, args):
    from crawler_spark.storage import SnapshotCatalog

    return SnapshotCatalog(spark, args.warehouse)


def _add_common(p):
    p.add_argument("--warehouse", required=True, help="snapshot catalog root (shared path)")
    p.add_argument("--master", default=None, help="override master (default: spark-submit's)")
    p.add_argument(
        "-c", "--config", default=None, metavar="CONFIG_YML",
        help="reference-shaped config.yml (portals/keywords/filters, "
        "etc/config.yml): portal budgets override politeness, keywords "
        "drive matching, filters drive export labeling",
    )


def _config(args):
    path = getattr(args, "config", None)
    if not path:
        return None
    from crawler_spark.sources.config_yaml import load_config

    return load_config(path)


def _add_corpus_args(p):
    p.add_argument("--pages", type=int, default=10000, help="synthetic corpus size")
    p.add_argument("--hosts", type=int, default=16)
    p.add_argument("--deep-frac", type=float, default=0.1)


def _resolve_fetch_fn(spec: str | None):
    """'pkg.module:attr' -> callable, the CLI face of the real-HTTP
    insertion point (payload.make_fetch_parse_udf fetch_fn; a
    production deployment points this at its requests.Session-backed
    fetcher — see SCALE.md 'The real-HTTP insertion point')."""
    if not spec:
        return None
    import importlib

    mod_name, _, attr = spec.partition(":")
    if not attr:
        raise SystemExit(f"--fetch-fn must be 'module.path:attr', got {spec!r}")
    obj = getattr(importlib.import_module(mod_name), attr)
    return obj() if isinstance(obj, type) else obj


def cmd_crawl(args) -> dict:
    from crawler_spark.operators.frontier import CrawlEngine

    spark = _spark(args.master)
    corpus = _corpus(spark, args)
    robots = corpus["robots_rules"]
    keywords = corpus["keywords"]
    cfg = _config(args)
    if cfg is not None:
        from crawler_spark.sources import config_yaml as cy

        robots = cy.apply_portal_budgets(robots, cfg)
        if cfg.get("keywords"):
            keywords = cy.keywords_df(spark, cfg)
    engine = CrawlEngine(
        spark=spark,
        catalog=_catalog(spark, args),
        seed_pages=corpus["seed_pages"],
        sitemap_entries=corpus["sitemap_entries"],
        robots_rules=robots,
        keywords=keywords,
        round_duration=args.round_duration,
        store_payload=not args.no_payload,
        fetch_fn=_resolve_fetch_fn(getattr(args, "fetch_fn", None)),
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
    return {
        "rounds": len(metrics),
        "scheduled": scheduled,
        "stored": sum(m["stored"] for m in metrics),
        "pages": engine.pages().count(),
        "pending": engine.pending_count(),
        "secs": round(elapsed, 2),
        "urls_per_sec": round(scheduled / elapsed, 1) if elapsed else None,
    }


def cmd_analyze(args) -> dict:
    from crawler_spark.operators.analyze import analyze, upsert_keywords

    spark = _spark(args.master)
    corpus = _corpus(spark, args)
    catalog = _catalog(spark, args)
    keywords = corpus["keywords"]
    cfg = _config(args)
    if cfg is not None and cfg.get("keywords"):
        from crawler_spark.sources import config_yaml as cy

        keywords = cy.keywords_df(spark, cfg)
    upsert_keywords(catalog, keywords)
    bridge = analyze(
        catalog,
        keywords,
        title_only=not args.include_description,
        min_id=args.min_id,
        max_id=args.max_id,
        reset=not args.no_reset,
    )
    return {"bridge_rows": bridge.count()}


def cmd_backfill(args) -> dict:
    from crawler_spark.operators.analyze import backfill

    spark = _spark(args.master)
    n = backfill(_catalog(spark, args), force=args.force)
    return {"backfilled": n}


def cmd_export(args) -> dict:
    from pyspark.sql import functions as F

    from crawler_spark import schemas
    from crawler_spark.functions.filters import filters_as_rows
    from crawler_spark.operators import export as ex
    from crawler_spark.sources.synth import FILTER_ROWS

    spark = _spark(args.master)
    corpus = _corpus(spark, args)
    catalog = _catalog(spark, args)
    pages = catalog.read("pages", schemas.PAGES)
    if args.min_id is not None:
        pages = pages.filter(F.col("id") >= args.min_id)
    if args.max_id is not None:
        pages = pages.filter(F.col("id") <= args.max_id)
    bridge = catalog.read("bridge", schemas.BRIDGE).distinct()
    keywords = (
        catalog.read("keywords", schemas.KEYWORDS)
        if catalog.exists("keywords")
        else corpus["keywords"]
    )
    cfg = _config(args)
    if cfg is not None and cfg.get("filters"):
        # -c config.yml: the reference's filters section drives the
        # labeling (etc/config.yml:122-156), overriding --filters
        from crawler_spark.sources import config_yaml as cy

        filters = cy.filter_rows(cfg)
    elif args.filters == "corpus":
        filters = filters_as_rows(corpus["export_filters"])
    else:
        filters = FILTER_ROWS
    if cfg is not None and cfg.get("keywords"):
        from crawler_spark.sources import config_yaml as cy

        keywords = cy.keywords_df(spark, cfg)
    # keyword-presence semi-join (O-17) before labeling, ORDER BY id at
    # file naming time via the deterministic filename format
    semi = pages.join(
        bridge.select(F.col("page_id").alias("id"), "portal").distinct(),
        on=["id", "portal"],
        how="left_semi",
    )
    labeled = ex.with_filename(ex.label_pages(semi, filters), ext=args.format)
    written = ex.export_files_fs(labeled, args.out, fmt=args.format)
    labeled_rel = labeled.drop("filename").join(written, on="url")
    csv_rows = ex.csv_rows_for_export(labeled_rel, bridge, keywords)
    dirs = ex.write_directory_csvs(csv_rows, args.out).collect()
    ex.write_back_filenames(catalog, written)
    counts = {r["filter_name"]: r["n"] for r in ex.category_counts(labeled).collect()}
    return {
        "exported": written.count(),
        "dirs": {r["dir"] or ".": r["n_rows"] for r in dirs},
        "category_counts": counts,
    }


def cmd_assembly(args) -> dict:
    from pyspark.sql import functions as F

    from crawler_spark import schemas
    from crawler_spark.operators import export as ex

    spark = _spark(args.master)
    catalog = _catalog(spark, args)
    pages = catalog.read("pages", schemas.PAGES)
    if args.min_id is not None:
        pages = pages.filter(F.col("id") >= args.min_id)
    if args.max_id is not None:
        pages = pages.filter(F.col("id") <= args.max_id)
    bridge = catalog.read("bridge", schemas.BRIDGE).distinct()
    keywords = catalog.read("keywords", schemas.KEYWORDS)
    df = ex.export_csv(pages, bridge, keywords, args.out)
    return {"rows": df.count(), "out": args.out}


def cmd_report(args) -> dict:
    from crawler_spark.operators.report import count_report, write_count_report

    spark = _spark(args.master)
    corpus = _corpus(spark, args)
    grand = write_count_report(
        count_report(corpus["sitemap_entries"], corpus["robots_rules"]), args.out
    )
    return {"grand_total": grand, "out": args.out}


def main() -> None:
    p = argparse.ArgumentParser(description="Run the crawler_spark engine")
    sub = p.add_subparsers(dest="cmd")

    c = sub.add_parser("crawl", help="run harvest rounds")
    _add_common(c)
    _add_corpus_args(c)
    c.add_argument("--max-rounds", type=int, default=100)
    c.add_argument("--round-duration", type=float, default=3600.0)
    c.add_argument("--no-payload", action="store_true", help="do not persist image bytes")
    c.add_argument(
        "--fetch-fn",
        default=None,
        help="'module.path:attr' real-HTTP fetcher plugged into the fused "
        "fetch UDF ((image_id, w, h, fmt) -> bytes; a class is "
        "instantiated once per worker — session/cookie-jar state)",
    )

    a = sub.add_parser("analyze", help="re-match keywords, rewrite bridge")
    _add_common(a)
    _add_corpus_args(a)
    a.add_argument("--min-id", type=int, default=None)
    a.add_argument("--max-id", type=int, default=None)
    a.add_argument("--no-reset", action="store_true")
    a.add_argument("--include-description", action="store_true")

    b = sub.add_parser("backfill", help="re-derive missing payload fields")
    _add_common(b)
    b.add_argument("--force", action="store_true")

    e = sub.add_parser("export", help="write per-ad files + per-dir CSVs")
    _add_common(e)
    _add_corpus_args(e)
    e.add_argument("--out", required=True)
    e.add_argument("--format", choices=["xml", "html"], default="xml")
    e.add_argument("--filters", choices=["corpus", "builtin"], default="corpus")
    e.add_argument("--min-id", type=int, default=None)
    e.add_argument("--max-id", type=int, default=None)

    s = sub.add_parser("assembly", help="write the 8-column CSV")
    _add_common(s)
    s.add_argument("--out", required=True)
    s.add_argument("--min-id", type=int, default=None)
    s.add_argument("--max-id", type=int, default=None)

    r = sub.add_parser("report", help="per-portal link-count CSV")
    r.add_argument("--out", required=True)
    r.add_argument("--master", default=None)
    _add_corpus_args(r)

    # back-compat: bare flags mean `crawl` (round-1 interface)
    argv = sys.argv[1:]
    if argv and argv[0].startswith("--"):
        argv = ["crawl", *argv]
    args = p.parse_args(argv)
    if args.cmd is None:
        p.print_help()
        sys.exit(2)

    out = {
        "crawl": cmd_crawl,
        "analyze": cmd_analyze,
        "backfill": cmd_backfill,
        "export": cmd_export,
        "assembly": cmd_assembly,
        "report": cmd_report,
    }[args.cmd](args)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
