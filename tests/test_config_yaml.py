"""YAML config ingestion (reference etc/config.yml, src/crawler.py:45-58).

A user migrating from the reference points ``-c config.yml`` at their
existing file; these tests pin the mapping (portals -> politeness
budgets, keywords -> KEYWORDS rows with positional ids, filters ->
EXPORT_FILTERS rows in document order) and drive the CLI end-to-end
from a config twin of the reference's fixture.
"""

import os
import sys
from argparse import Namespace

import pytest
from pyspark.sql import functions as F

from crawler_spark.sources import config_yaml as cy

CONFIG_TWIN = """\
portals:
  - name: "karriere_1"
    url: "https://portal1.example.at/"
    engine: KarriereHarvester
    requests_per_minute: 120000
    retry_timeout: 5
  - name: "stepstone_0"
    url: "https://portal0.example.de/"
    requests_per_minute: 120000
    retry_timeout: 15
    engine: StepStoneHarvester
keywords:
  - title: "Controller"
    search: controll
    case_sensitive: false
  - title: "HR"
    search: \\bHR
    case_sensitive: true
filters:
  education_level:
    higher_education:
      catch_all: false
      case_sensitive: false
      pattern: 'universit|degree|studium|master|bachelor'
      description: "Higher education positions"
    vocational:
      catch_all: false
      case_sensitive: false
      pattern: 'lehre|apprentice|ausbildung'
    other_education:
      catch_all: true
      case_sensitive: false
      pattern: '.*'
  job_type:
    full_time:
      catch_all: false
      case_sensitive: false
      pattern: 'vollzeit|full[\\s-]*time'
    part_time:
      catch_all: false
      case_sensitive: false
      pattern: 'teilzeit|part[\\s-]*time'
"""


@pytest.fixture(scope="module")
def cfg(tmp_path_factory):
    p = tmp_path_factory.mktemp("cfg") / "config.yml"
    p.write_text(CONFIG_TWIN, encoding="utf-8")
    return cy.load_config(str(p))


def test_keyword_rows_positional_ids(cfg):
    rows = cy.keyword_rows(cfg)
    # AUTOINCREMENT order: ids = list position from 1
    # (src/keyword_manager.py:36-45)
    assert rows == [
        (1, "Controller", "controll", False),
        (2, "HR", "\\bHR", True),
    ]


def test_filter_rows_document_order(cfg):
    rows = cy.filter_rows(cfg)
    assert [r[:4] for r in rows] == [
        ("education_level", 0, "higher_education", 0),
        ("education_level", 0, "vocational", 1),
        ("education_level", 0, "other_education", 2),
        ("job_type", 1, "full_time", 0),
        ("job_type", 1, "part_time", 1),
    ]
    # catch_all / case_sensitive carried through
    assert rows[2][5] is True and rows[0][6] is False


def test_portal_budgets_netloc(cfg):
    assert cy.portal_budgets(cfg) == [
        ("portal1.example.at", "karriere_1", 120000, 5),
        ("portal0.example.de", "stepstone_0", 120000, 15),
    ]


def test_portal_budgets_keeps_port():
    got = cy.portal_budgets(
        {"portals": [{"name": "x", "url": "http://host:8080/p", "requests_per_minute": 3}]}
    )
    assert got == [("host:8080", "x", 3, 5)]


def test_apply_portal_budgets_overrides_matching_host_only(spark, cfg):
    from crawler_spark.sources.synth import corpus_to_spark, gen_corpus

    corpus = corpus_to_spark(spark, gen_corpus(n_pages=60, n_hosts=3, seed=7))
    merged = cy.apply_portal_budgets(corpus["robots_rules"], cfg)
    rows = {r["host"]: r for r in merged.collect()}
    assert rows["portal1.example.at"]["requests_per_minute"] == 120000
    assert rows["portal1.example.at"]["retry_timeout_min"] == 5
    # host not in the config keeps its discovered budget
    orig = {r["host"]: r for r in corpus["robots_rules"].collect()}
    h2 = "portal2.example.de"
    assert rows[h2]["requests_per_minute"] == orig[h2]["requests_per_minute"]
    # non-budget columns untouched
    assert rows[h2]["sitemap_urls"] == orig[h2]["sitemap_urls"]


def test_cli_config_end_to_end(spark, tmp_path):
    """crawl -> analyze -> export driven by -c config.yml: config
    keywords bound the bridge ids, config filters name the export
    directories (reference flow src/crawler.py:37-120)."""
    sys.path.insert(
        0,
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts"),
    )
    import run_crawl

    cfg_path = tmp_path / "config.yml"
    cfg_path.write_text(CONFIG_TWIN, encoding="utf-8")
    wh = str(tmp_path / "wh")
    base = dict(
        master=None, warehouse=wh, pages=150, hosts=3, deep_frac=0.0,
        config=str(cfg_path),
    )
    crawl = run_crawl.cmd_crawl(
        Namespace(**base, max_rounds=20, round_duration=3600.0, no_payload=True)
    )
    assert crawl["pending"] == 0 and crawl["pages"] > 0

    analyzed = run_crawl.cmd_analyze(
        Namespace(**base, min_id=None, max_id=None, no_reset=False, include_description=False)
    )
    assert analyzed["bridge_rows"] > 0

    from crawler_spark import schemas
    from crawler_spark.storage import SnapshotCatalog

    cat = SnapshotCatalog(spark, wh)
    # the config defines exactly 2 keywords -> bridge ids bounded by them
    kw_ids = {
        r["keyword_id"]
        for r in cat.read("bridge", schemas.BRIDGE).select("keyword_id").distinct().collect()
    }
    assert kw_ids and kw_ids <= {1, 2}
    # keywords table upserted from the config
    kws = {r["id"]: r["title"] for r in cat.read("keywords", schemas.KEYWORDS).collect()}
    assert kws == {1: "Controller", 2: "HR"}

    out = str(tmp_path / "exp")
    exported = run_crawl.cmd_export(
        Namespace(**base, out=out, format="xml", filters="corpus", min_id=None, max_id=None)
    )
    assert exported["exported"] > 0
    # config filter names are the export directory tree
    cats = set(exported["category_counts"])
    assert cats <= {
        "higher_education", "vocational", "other_education", "full_time", "part_time",
    }
    top_dirs = {d for d in os.listdir(out) if os.path.isdir(os.path.join(out, d))}
    assert top_dirs <= {"higher_education", "vocational", "other_education"}


def test_cli_fetch_fn_resolution():
    """--fetch-fn 'module:attr' resolves the real-HTTP insertion point:
    functions pass through, classes instantiate (per-process session
    state), bad specs fail loudly. The engine-side seam itself is
    covered by tests/test_payload.py::test_fetch_fn_seam_*."""
    import collections
    import json as _json
    import sys

    import pytest as _pytest

    sys.path.insert(0, "/root/repo/scripts")
    try:
        from run_crawl import _resolve_fetch_fn
    finally:
        sys.path.pop(0)

    assert _resolve_fetch_fn(None) is None
    assert _resolve_fetch_fn("json:dumps") is _json.dumps
    inst = _resolve_fetch_fn("collections:Counter")
    assert isinstance(inst, collections.Counter)
    with _pytest.raises(SystemExit, match="module.path:attr"):
        _resolve_fetch_fn("no_colon_here")
