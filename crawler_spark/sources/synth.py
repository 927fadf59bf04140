"""Deterministic synthetic crawl corpus (seed=42, no external data).

Mirrors the shape of the reference's fixtures (FIXTURES.md): portal
hosts with Zipfian page counts, two portal styles with the reference's
two discovery shapes (sitemap-index with regex-filtered urlsets,
src/harvester.py:1118-1154; robots-listed jobs sitemaps,
src/harvester.py:1206-1349), seeded status faults for the routing
matrix (src/harvester.py:1087-1107), keyword-bearing captions modeled
on etc/config.yml:17-121 including case-sensitivity traps, and the
image+caption payload per BASELINE.json input_hint.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from crawler_spark.functions.payload import phash64, pixels_for

SEED = 42

# Keyword table modeled on etc/config.yml:17-121 (patterns are the
# same regex style; ids are 1-based insertion order, which the golden
# match sets depend on — tests/test_harvester_keywords.py:156-185).
KEYWORD_ROWS = [
    (1, "Controller", r"controll", False),
    (2, "Analyst", r"analyst", False),
    (3, "Manager / Management", r"manag", False),
    (4, "Project development", r"\bproject\s+develop", False),
    (5, "Business development", r"\bbusiness develop", False),
    (6, "Recruiter / Recruiting", r"\brecruit", False),
    (7, "HR", r"\bHR", True),
    (8, "Human Resources", r"\bhuman\s+resourc", False),
    (9, "Personalentwicklung", r"\bpersonalentwickl", False),
    (10, "Consultant / Consulting", r"\bconsult", False),
    (11, "Associate", r"\bassociate\b", False),
    (12, "SQL", r"\bSQL\b", True),
]

# Export filter config modeled on etc/config.yml:122-156 /
# tests/test_export.py:42-67: two categories, ordered filters,
# first-match-wins with catch-all fallback
# (src/advert_exporter.py:547-586).
FILTER_ROWS = [
    # (category, category_seq, filter_name, filter_seq, pattern, catch_all, case_sensitive)
    ("education_level", 0, "higher_education", 0, r"universit|degree|studium|master|bachelor", False, False),
    ("education_level", 0, "vocational", 1, r"lehre|apprentice|ausbildung", False, False),
    ("education_level", 0, "any_education", 2, r".*", True, False),
    ("job_type", 1, "full_time", 0, r"vollzeit|full[- ]?time", False, False),
    ("job_type", 1, "part_time", 1, r"teilzeit|part[- ]?time", False, False),
    ("job_type", 1, "internship", 2, r"praktikum|intern(ship)?\b", False, False),
]

# Caption phrase pools: some carry keyword matches (incl. case traps
# `HR` vs `hr`, `SQL` vs `sql`), some carry export-filter triggers,
# some are noise. Deterministic composition per page.
_ROLES = [
    "Senior Controller",                 # kw 1
    "Data Analyst",                      # kw 2
    "Manager of Operations",             # kw 3
    "Project Developer for project development",  # kw 4
    "Business Development Lead for business development",  # kw 5
    "Recruiting Specialist to recruit talent",     # kw 6
    "HR Generalist",                     # kw 7 (case-sensitive hit)
    "hr assistant",                      # case trap: NOT kw 7
    "Head of Human Resources",           # kw 8
    "Personalentwicklung Expertin",      # kw 9
    "IT Consultant",                     # kw 10
    "Associate Scientist",               # kw 11
    "associates welcome",                # trap: NOT kw 11 (\bassociate\b)
    "SQL Database Engineer",             # kw 12 (case-sensitive hit)
    "sql tuning enthusiast",             # case trap: NOT kw 12
    "Software Engineer",                 # no keyword
    "Baristas and cooks",                # no keyword
]
_EDU = [
    "university degree required",        # higher_education
    "Master studium von Vorteil",        # higher_education
    "Lehre oder Ausbildung abgeschlossen",  # vocational
    "no formal requirements",            # catch-all
]
_TYPE = [
    "Vollzeit Stelle",                   # full_time
    "full-time position",                # full_time
    "Teilzeit moeglich",                 # part_time
    "Praktikum fuer Studierende",        # internship
    "flexible arrangement",              # no match in job_type (not catch-all) -> dropped at export
]
_CITIES = ["Wien", "Graz", "Linz", "Berlin", "Hamburg", "Salzburg"]


def make_caption(i: int, rng: np.random.Generator) -> str:
    role = _ROLES[int(rng.integers(0, len(_ROLES)))]
    edu = _EDU[int(rng.integers(0, len(_EDU)))]
    jt = _TYPE[int(rng.integers(0, len(_TYPE)))]
    city = _CITIES[i % len(_CITIES)]
    return f"{role} in {city}. {edu}; {jt}."


def gen_corpus(
    n_pages: int = 2000,
    n_hosts: int = 8,
    urlset_size: int = 100,
    dup_frac: float = 0.03,
    empty_frac: float = 0.01,
    with_phash: bool = True,
    seed: int = SEED,
    rpms: tuple[int, ...] = (6000, 12, 2),
    img_sizes: tuple[int, ...] = (32, 64, 96),
    fault_frac: float = 1.0,
    robots_delay_every: int = 4,
    deep_frac: float = 0.0,
    png_frac: float = 0.0,
    jpeg_frac: float = 0.0,
) -> dict[str, pd.DataFrame]:
    """Generate the full corpus as pandas DataFrames (all deterministic).

    ``deep_frac`` adds that fraction of EXTRA pages reachable only via
    in-page links (never listed in a sitemap): each deep page is linked
    from 1-2 same-host depth-0 pages, and a third of deep pages link on
    to another deep page (depth 2). Exercises the link-discovery /
    priority path of the scheduler.
    """
    rng = np.random.Generator(np.random.PCG64(seed))

    # Zipfian host sizes (hot-host skew is a design requirement).
    weights = 1.0 / np.arange(1, n_hosts + 1) ** 1.1
    weights /= weights.sum()
    counts = np.maximum(1, (weights * n_pages).astype(int))
    counts[0] += n_pages - counts.sum()  # exact total, skew to hottest

    hosts = [f"portal{i}.example.{'at' if i % 2 else 'de'}" for i in range(n_hosts)]
    styles = ["stepstone" if i % 2 == 0 else "karriere" for i in range(n_hosts)]
    portals = [f"{'stepstone' if i % 2 == 0 else 'karriere'}_{i}" for i in range(n_hosts)]

    rows = []
    uid = 0
    for hi in range(n_hosts):
        for _ in range(int(counts[hi])):
            if styles[hi] == "stepstone":
                url = f"https://{hosts[hi]}/stellenangebote--job-{uid}-inline.html"
            else:
                url = f"https://{hosts[hi]}/jobs/{uid}"
            # fault_frac scales the 8% fault budget (0.0 = clean corpus
            # for throughput benches; 1.0 = the routing-matrix mix).
            r = rng.random()
            if r >= 0.08 * fault_frac:
                status, transient = 200, False
            elif r < 0.02 * fault_frac:
                status, transient = 404, False
            elif r < 0.04 * fault_frac:
                status, transient = 410, False
            else:
                status = int(500 + rng.integers(0, 5))
                transient = bool(rng.random() < 0.5)
            w = int(rng.choice(img_sizes))
            h = int(rng.choice(img_sizes))
            caption = make_caption(uid, rng) if rng.random() > 0.02 else ""
            # png_frac of payloads arrive PNG-encoded (the real stdlib
            # codec in functions/payload.py) — same pixels, different
            # wire format, so phash/PSNR fidelity must be fmt-invariant.
            # Keyed off uid, NOT an rng draw: consuming the stream here
            # would shift every later draw and silently change all
            # existing corpora (incl. golden-pinned ones) at png_frac=0.
            fr = (uid * 2654435761 % 2**32) / 2**32
            # jpeg_frac stacks after png_frac on the same hash so png
            # assignment (and all existing corpora) is unchanged when
            # jpeg_frac=0
            fmt = (
                "png"
                if fr < png_frac
                else ("jpeg" if fr < png_frac + jpeg_frac else "raw")
            )
            rows.append(
                (
                    f"img_{uid:08d}",
                    url,
                    hosts[hi],
                    portals[hi],
                    w,
                    h,
                    fmt,
                    caption,
                    status,
                    transient,
                )
            )
            uid += 1

    n_top = uid
    cols = [
        "image_id", "url", "host", "portal", "w", "h", "fmt",
        "caption", "http_status", "transient",
    ]
    top_pages = pd.DataFrame(rows, columns=cols)

    # ---- deep pages: reachable only through in-page links (never in a
    # sitemap). Depth 1 = linked from 1-2 depth-0 pages of the same
    # host; every third deep page is instead linked from the previous
    # deep page (depth 2) — exercises multi-hop discovery + priority.
    outlinks: dict[str, list[str]] = {}
    deep_rows = []
    n_deep = int(n_pages * deep_frac)
    if n_deep:
        deep_by_host: dict[str, list[str]] = {}
        for d in range(n_deep):
            hi = d % n_hosts
            host, portal = hosts[hi], portals[hi]
            url = f"https://{host}/detail/{uid}"
            w = int(rng.choice(img_sizes))
            h = int(rng.choice(img_sizes))
            caption = make_caption(uid, rng)
            deep_rows.append(
                (f"img_{uid:08d}", url, host, portal, w, h, "raw", caption, 200, False)
            )
            siblings = deep_by_host.setdefault(host, [])
            if len(siblings) % 3 == 2:
                # depth 2: linked only from the previous deep page
                outlinks.setdefault(siblings[-1], []).append(url)
            else:
                top_urls = top_pages[top_pages.host == host].url.to_numpy()
                for pick in rng.integers(0, len(top_urls), int(rng.integers(1, 3))):
                    outlinks.setdefault(top_urls[pick], []).append(url)
            siblings.append(url)
            uid += 1

    seed_pages = pd.concat(
        [top_pages, pd.DataFrame(deep_rows, columns=cols)], ignore_index=True
    )
    if with_phash:
        seed_pages["phash"] = [
            phash64(pixels_for(iid, w, h))
            for iid, w, h in zip(seed_pages.image_id, seed_pages.w, seed_pages.h)
        ]
    else:
        seed_pages["phash"] = np.int64(0)
    seed_pages["phash"] = seed_pages["phash"].astype("int64")
    seed_pages["outlinks"] = [sorted(set(outlinks.get(u, []))) for u in seed_pages.url]

    # ---- sitemap entries: per-portal document order, chunked urlsets,
    # plus decoy sitemaps (regex-filtered out, src/harvester.py:1135/1250),
    # duplicate entries, and empty <loc> entries (skipped,
    # src/harvester.py:1303-1307).
    sm_rows = []
    for hi in range(n_hosts):
        # only depth-0 pages are sitemap-listed; deep pages must be
        # discovered through links
        sub = seed_pages.iloc[:n_top][seed_pages.iloc[:n_top].host == hosts[hi]]
        order = rng.permutation(len(sub))
        urls = sub.url.to_numpy()[order]
        if styles[hi] == "stepstone":
            sm_name = lambda k: f"https://{hosts[hi]}/sitemaps/listings-{k}.xml"  # noqa: E731
        else:
            sm_name = lambda k: f"https://{hosts[hi]}/sitemap-jobs-{k}.xml"  # noqa: E731
        loc = 0
        for j, u in enumerate(urls):
            k = j // urlset_size
            if j % urlset_size == 0:
                loc = 0
            sm_rows.append((portals[hi], sm_name(k), k, loc, u))
            loc += 1
            if rng.random() < empty_frac:  # empty/whitespace <loc>
                sm_rows.append((portals[hi], sm_name(k), k, loc, "  " if rng.random() < 0.5 else None))
                loc += 1
        # duplicates: re-list a sample of this host's URLs in a later sitemap
        n_dup = int(len(urls) * dup_frac)
        if n_dup:
            dup_urls = urls[rng.integers(0, len(urls), n_dup)]
            k = len(urls) // urlset_size + 1
            for li, u in enumerate(dup_urls):
                sm_rows.append((portals[hi], sm_name(k), k, li, u))
        # decoy sitemap: wrong name pattern; its URLs must never be crawled
        decoy = (
            f"https://{hosts[hi]}/sitemaps/companies-1.xml"
            if styles[hi] == "stepstone"
            else f"https://{hosts[hi]}/sitemap-geocity-1.xml"
        )
        for li in range(3):
            sm_rows.append((portals[hi], decoy, 999, li, f"https://{hosts[hi]}/company/{li}"))

    sitemap_entries = pd.DataFrame(
        sm_rows, columns=["portal", "sitemap_url", "sitemap_seq", "loc_seq", "url"]
    )

    # ---- robots rules (etc/config.yml:1-16 + Crawl-delay fixture).
    rb_rows = []
    for hi in range(n_hosts):
        rpm = rpms[hi % len(rpms)]
        delay = (
            10.0
            if robots_delay_every and hi % robots_delay_every == robots_delay_every - 1
            else None
        )
        retry = 5 if styles[hi] == "karriere" else 15
        smaps = sorted(
            sitemap_entries[sitemap_entries.portal == portals[hi]].sitemap_url.unique()
        )
        rb_rows.append((hosts[hi], portals[hi], rpm, delay, retry, smaps, ["/admin/"], []))
    robots_rules = pd.DataFrame(
        rb_rows,
        columns=[
            "host", "portal", "requests_per_minute", "robots_crawl_delay",
            "retry_timeout_min", "sitemap_urls", "disallow", "allow",
        ],
    )

    keywords = pd.DataFrame(
        KEYWORD_ROWS, columns=["id", "title", "search", "case_sensitive"]
    )
    keywords["id"] = keywords["id"].astype("int64")

    export_filters = pd.DataFrame(
        FILTER_ROWS,
        columns=[
            "category", "category_seq", "filter_name", "filter_seq",
            "pattern", "catch_all", "case_sensitive",
        ],
    )

    return {
        "seed_pages": seed_pages,
        "sitemap_entries": sitemap_entries,
        "robots_rules": robots_rules,
        "keywords": keywords,
        "export_filters": export_filters,
    }


def corpus_to_spark(spark, corpus: dict[str, pd.DataFrame]) -> dict:
    """Materialize the corpus as Spark DataFrames with engine schemas."""
    from crawler_spark import schemas

    mapping = {
        "seed_pages": schemas.SEED_PAGES,
        "sitemap_entries": schemas.SITEMAP_ENTRIES,
        "robots_rules": schemas.ROBOTS_RULES,
        "keywords": schemas.KEYWORDS,
        "export_filters": schemas.EXPORT_FILTERS,
    }
    out = {}
    for name, pdf in corpus.items():
        out[name] = spark.createDataFrame(pdf, schema=mapping[name])
    return out


def write_corpus(spark, corpus: dict[str, pd.DataFrame], path: str) -> None:
    for name, df in corpus_to_spark(spark, corpus).items():
        df.write.mode("overwrite").parquet(f"{path}/{name}.parquet")


def read_corpus(spark, path: str) -> dict:
    names = ["seed_pages", "sitemap_entries", "robots_rules", "keywords", "export_filters"]
    return {n: spark.read.parquet(f"{path}/{n}.parquet") for n in names}
