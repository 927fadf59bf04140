"""Single-process reference twin — the fidelity oracle.

A deliberately naive pandas/python implementation of the reference
crawler's semantics (iKoulee/crawler), independent of the Spark
engine's dataflow code, used to assert:

- per-portal crawl (storage) ordering   (src/harvester.py:1132-1152)
- final URL-seen set                    (src/harvester.py:133-166)
- keyword match / bridge equality       (src/keyword_manager.py:124-193)
- payload integrity (phash / PSNR)      (BASELINE.json input_hint)

Politeness uses the same discrete-round token model as the engine
(tokens = max(1, floor(round_duration / max(60/rpm, robots_delay)))):
the reference's wall-clock sleeps make cross-portal interleaving
nondeterministic even in the reference itself, so ordering equality
is asserted per portal under a shared discretization — exactly what
the reference's own tests pin down (tests/test_harvester.py:301,394).
"""

from __future__ import annotations

import math
import re
from dataclasses import dataclass, field

import pandas as pd

from crawler_spark.functions.payload import phash64, pixels_for

STYLE_FILTER = {
    "stepstone": re.compile(r".*listings-[0-9]+.*"),
    "karriere": re.compile(r".*sitemap-jobs.*"),
}


def _style(portal: str) -> str:
    return portal.split("_")[0]


def _path_of(url: str) -> str:
    m = re.match(r"^[a-z]+://[^/]+(/[^?#]*)?(\?[^#]*)?", url)
    if not m:
        return "/"
    return (m.group(1) or "/") + (m.group(2) or "")


def _twin_rule_len(rule: str, path: str) -> int:
    """REP rule match length, -1 if no match (independent twin of
    Protego's evaluation, src/harvester.py:405-410)."""
    if "*" in rule or rule.endswith("$"):
        pat = re.escape(rule).replace(r"\*", ".*")
        if pat.endswith(r"\$"):
            pat = pat[:-2] + "$"
        return len(rule) if re.match(pat, path) else -1
    return len(rule) if path.startswith(rule) else -1


def _twin_can_fetch(url: str, allow: list[str] | None, disallow: list[str] | None) -> bool:
    """Longest matching rule wins; Allow wins length ties."""
    path = _path_of(url)
    best_a = max((_twin_rule_len(r, path) for r in (allow or [])), default=-1)
    best_d = max((_twin_rule_len(r, path) for r in (disallow or [])), default=-1)
    return best_a >= best_d


@dataclass
class TwinResult:
    order: dict[str, list[str]] = field(default_factory=dict)  # portal -> stored urls
    seen: set[str] = field(default_factory=set)
    bridge: set[tuple[int, str, int]] = field(default_factory=set)  # (kw_id, portal, page_id)
    pages: list[dict] = field(default_factory=list)
    dropped: set[str] = field(default_factory=set)
    rounds: int = 0
    # portal -> {"scheduled","stored","retried","dropped"} totals across
    # rounds — the twin of the engine's per-host lineage metrics
    # (src/harvester.py:318-326 ads/min log analog).
    lineage: dict[str, dict] = field(default_factory=dict)


def match_keywords_twin(caption: str | None, keyword_rows: list[tuple]) -> list[int]:
    """Independent re-implementation of src/keyword_manager.py:124-193
    with title_only=False, title=caption, description=None, source=None."""
    text = caption if caption else None  # empty string is falsy -> fallback -> None
    if text is None:
        return []
    out = []
    for kid, _title, search, cs in keyword_rows:
        rx = re.compile(search, 0 if cs else re.IGNORECASE)
        if rx.search(text):
            out.append(int(kid))
    return out


def run_twin(
    corpus: dict[str, pd.DataFrame],
    round_duration: float = 60.0,
    max_rounds: int = 100000,
) -> TwinResult:
    robots = corpus["robots_rules"]
    sm = corpus["sitemap_entries"]
    seed = corpus["seed_pages"].set_index("url")
    kw_rows = list(corpus["keywords"][["id", "title", "search", "case_sensitive"]].itertuples(index=False, name=None))

    # ---- discovery
    eligible: list[tuple] = []  # (portal, sitemap_seq, loc_seq, url)
    robots_by_portal = {r.portal: r for r in robots.itertuples()}
    for r in robots.itertuples():
        rx = STYLE_FILTER[_style(r.portal)]
        smset = {u for u in (r.sitemap_urls or []) if rx.match(u)}
        sub = sm[(sm.portal == r.portal) & (sm.sitemap_url.isin(smset))]
        for e in sub.sort_values(["sitemap_seq", "loc_seq"]).itertuples():
            if e.url is None or not isinstance(e.url, str) or e.url.strip() == "":
                continue  # src/harvester.py:1303-1307
            u = e.url.strip()
            if not _twin_can_fetch(u, getattr(r, "allow", None), r.disallow):
                continue
            eligible.append((r.portal, int(e.sitemap_seq), int(e.loc_seq), u))

    # global first-occurrence dedup (DB-wide UNIQUE url)
    eligible.sort(key=lambda t: (t[0], t[1], t[2]))
    first: dict[str, tuple] = {}
    for t in eligible:
        if t[3] not in first:
            first[t[3]] = t
    per_portal: dict[str, list[str]] = {}
    for t in sorted(first.values(), key=lambda t: (t[0], t[1], t[2])):
        per_portal.setdefault(t[0], []).append(t[3])

    # ---- politeness budgets
    tokens: dict[str, int] = {}
    retry_rounds: dict[str, int] = {}
    for p, r in robots_by_portal.items():
        delay = max(60.0 / r.requests_per_minute, r.robots_crawl_delay or 0.0)
        tokens[p] = max(1, int(round_duration // delay))
        retry_rounds[p] = max(1, math.ceil(r.retry_timeout_min * 60.0 / round_duration))

    # ---- rounds
    res = TwinResult()
    state: dict[str, dict] = {
        u: {"state": "pending", "attempt": 0, "retry_round": 0}
        for urls in per_portal.values()
        for u in urls
    }
    res.order = {p: [] for p in per_portal}
    res.lineage = {
        p: {"scheduled": 0, "stored": 0, "retried": 0, "dropped": 0} for p in per_portal
    }
    rnd = 0
    while any(s["state"] == "pending" for s in state.values()) and rnd < max_rounds:
        for portal, urls in per_portal.items():
            lin = res.lineage[portal]
            admitted = [
                u
                for u in urls
                if state[u]["state"] == "pending" and state[u]["retry_round"] <= rnd
            ][: tokens[portal]]
            lin["scheduled"] += len(admitted)
            for u in admitted:
                st = state[u]
                if u in seed.index:
                    row = seed.loc[u]
                    status = int(row.http_status)
                    if bool(row.transient) and st["attempt"] >= 1:
                        status = 200
                else:
                    status = 404
                if status == 200:
                    lin["stored"] += 1
                    st["state"] = "stored"
                    res.order[portal].append(u)
                    res.seen.add(u)
                    page_id = len(res.order[portal])
                    caption = row.caption
                    for kid in match_keywords_twin(caption, kw_rows):
                        res.bridge.add((kid, portal, page_id))
                    res.pages.append(
                        {
                            "portal": portal,
                            "id": page_id,
                            "url": u,
                            "image_id": row.image_id,
                            "caption": caption,
                            "attempt": st["attempt"],
                            "round": rnd,
                            "phash": phash64(
                                pixels_for(row.image_id, int(row.w), int(row.h))
                            ),
                        }
                    )
                elif 500 <= status <= 504 and st["attempt"] == 0:
                    lin["retried"] += 1
                    st["attempt"] = 1
                    st["retry_round"] = rnd + retry_rounds[portal]
                else:
                    lin["dropped"] += 1
                    st["state"] = "dropped"
                    res.dropped.add(u)
        rnd += 1
    res.rounds = rnd
    return res
