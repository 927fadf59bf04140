"""Reference ``config.yml`` ingestion.

The reference CLI is driven entirely by one YAML file
(etc/config.yml:1-156, loaded in src/crawler.py:45-58): ``portals``
(name/url/engine/requests_per_minute/retry_timeout), ``keywords``
(title/search/case_sensitive, inserted in list order so AUTOINCREMENT
ids are positional, src/keyword_manager.py:36-45), and ``filters``
(category -> filter_name -> pattern/catch_all/case_sensitive, applied
in document order with first-match-wins, src/advert_exporter.py:588-656).

This module maps that exact file shape onto the engine's table
schemas so a user migrating from the reference can point ``-c
config.yml`` at their existing file:

- :func:`keywords_df`      -> :data:`crawler_spark.schemas.KEYWORDS`
- :func:`filters_df`       -> :data:`crawler_spark.schemas.EXPORT_FILTERS`
- :func:`portal_budgets`   -> per-host politeness overrides merged onto
  the robots table by :func:`apply_portal_budgets` (requests_per_minute
  and retry_timeout feed the same token math the reference's
  ``crawl_delay`` sleep uses, src/harvester.py:420-434)

PyYAML ships with this environment; ``load_config`` is the only
YAML-touching entry point so a missing library fails loudly there.
"""

from __future__ import annotations

from urllib.parse import urlparse

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from crawler_spark import schemas


def load_config(path: str) -> dict:
    """yaml.safe_load of a reference-shaped config file."""
    import yaml

    with open(path, encoding="utf-8") as fh:
        cfg = yaml.safe_load(fh) or {}
    if not isinstance(cfg, dict):
        raise ValueError(f"{path}: config root must be a mapping")
    return cfg


# ------------------------------------------------------------ keywords
def keyword_rows(cfg: dict) -> list[tuple[int, str, str, bool]]:
    """(id, title, search, case_sensitive), ids positional from 1 —
    the insertion order the reference's AUTOINCREMENT produces."""
    out = []
    for i, kw in enumerate(cfg.get("keywords") or [], start=1):
        out.append(
            (
                i,
                str(kw["title"]),
                str(kw["search"]),
                bool(kw.get("case_sensitive", False)),
            )
        )
    return out


def keywords_df(spark: SparkSession, cfg: dict) -> DataFrame:
    return spark.createDataFrame(keyword_rows(cfg), schemas.KEYWORDS)


# ------------------------------------------------------------- filters
def filter_rows(cfg: dict) -> list[tuple[str, int, str, int, str, bool, bool]]:
    """EXPORT_FILTERS rows; sequence = YAML document order (PyYAML
    preserves mapping order on Python >= 3.7)."""
    out = []
    for cseq, (cat, flt) in enumerate((cfg.get("filters") or {}).items()):
        for fseq, (name, spec) in enumerate((flt or {}).items()):
            out.append(
                (
                    str(cat),
                    cseq,
                    str(name),
                    fseq,
                    str(spec["pattern"]),
                    bool(spec.get("catch_all", False)),
                    bool(spec.get("case_sensitive", False)),
                )
            )
    return out


def filters_df(spark: SparkSession, cfg: dict) -> DataFrame:
    return spark.createDataFrame(filter_rows(cfg), schemas.EXPORT_FILTERS)


# ------------------------------------------------------------- portals
def portal_budgets(cfg: dict) -> list[tuple[str, str, int, int]]:
    """(host, portal_name, requests_per_minute, retry_timeout_min) per
    configured portal; host = the portal url's netloc."""
    out = []
    for p in cfg.get("portals") or []:
        host = urlparse(str(p["url"])).netloc
        if not host:
            raise ValueError(f"portal {p.get('name')!r}: url has no host: {p.get('url')!r}")
        out.append(
            (
                host,
                str(p.get("name", host)),
                int(p.get("requests_per_minute", 1)),
                int(p.get("retry_timeout", 5)),
            )
        )
    return out


def apply_portal_budgets(robots_rules: DataFrame, cfg: dict) -> DataFrame:
    """Override politeness budgets on the robots table from the config.

    Matching hosts get the config's requests_per_minute /
    retry_timeout; everything else on the row (sitemap urls, REP
    rules, robots Crawl-delay) stays as discovered — the config is
    the operator's budget, robots.txt remains the site's, and the
    politeness stage already takes max(60/rpm, Crawl-delay). The
    override table is a handful of rows, so the join broadcasts.
    """
    budgets = portal_budgets(cfg)
    if not budgets:
        return robots_rules
    spark = robots_rules.sparkSession
    ov = spark.createDataFrame(
        [(h, rpm, rt) for h, _name, rpm, rt in budgets],
        "host string, _cfg_rpm int, _cfg_retry int",
    )
    return (
        robots_rules.join(F.broadcast(ov), on="host", how="left")
        .withColumn(
            "requests_per_minute",
            F.coalesce(F.col("_cfg_rpm"), F.col("requests_per_minute")),
        )
        .withColumn(
            "retry_timeout_min",
            F.coalesce(F.col("_cfg_retry"), F.col("retry_timeout_min")),
        )
        .drop("_cfg_rpm", "_cfg_retry")
    )
