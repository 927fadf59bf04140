"""Deduplication operators for training-data pipelines.

Five dedup families over a documents table, each with the 100 TB
scale path spelled out:

- exact: partial-agg groupBy on xxhash64(text) + text collision guard
  (duplicates collapse map-side before the shuffle)
- n-gram Jaccard: shingle explode + self-join — exact but O(pairs
  sharing a shingle); the SQL-oracle-checkable ground truth
- MinHash + LSH: signatures fully native (xxhash64, JVM), banded
  bucket join on bare ids — the scale path; candidates verified with
  exact Jaccard after re-joining shingles onto the deduped pair set
- SimHash: 64-bit bit-vote fingerprint, fully native (explode +
  xxhash64 + 64-column conditional-sum HashAggregate); near-dup =
  small Hamming distance within 16-bit quadrant blocks
- embedding cosine near-dup: see similarity.py

The reference's only dedup is the URL UNIQUE anti-join
(src/harvester.py:133-166); these generalize it to content identity,
which is what a crawl corpus at 10^10 pages actually needs.
"""

from __future__ import annotations

from functools import reduce
from operator import add

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# --------------------------------------------------------------- exact


def _representatives(docs: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """(hash, text, kept_id) — one row per distinct text.

    groupBy(hash, text) + min(id) is a HashAggregate with map-side
    partial aggregation: every duplicate collapses to one row per
    input partition BEFORE the exchange, so at 10^10 docs the shuffle
    carries ~|distinct texts|, not |docs| (a window over the text
    would shuffle every row with no partial agg). The 64-bit xxhash64
    leads the grouping key so the exchange partitioner and AQE see a
    cheap fixed-width key; the text itself stays in the key purely as
    the hash-collision guard (two texts colliding at 64 bits still
    form distinct groups).
    """
    return (
        docs.select(F.col(id_col).alias("_rid"), F.col(text_col).alias("_rtext"))
        .withColumn("_h", F.xxhash64(F.col("_rtext")))
        .groupBy("_h", "_rtext")
        .agg(F.min("_rid").alias("_keep"))
    )


def exact_dedup(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Keep the lowest-id representative per identical text.

    Two-phase: partial-agg representative selection (see
    _representatives), then a left-semi join of the full rows against
    the kept ids — both sides shuffle on the 8-byte id, the wide
    payload columns never enter an aggregation key.
    """
    reps = _representatives(docs, text_col, id_col).select("_keep")
    return docs.join(reps, on=[F.col(id_col) == F.col("_keep")], how="left_semi")


def exact_groups(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(keep, id) — every doc mapped to the min-id representative of
    its identical-text group (keep == id for the representative row).

    The membership relation the LSH pre-dedup pass expands pairs and
    components through; same partial-agg + hash-keyed join shape as
    exact_dup_pairs.
    """
    reps = _representatives(docs, text_col, id_col)
    hashed = docs.select(F.col(id_col).alias("_mid"), F.col(text_col).alias("_mt")).withColumn(
        "_mh", F.xxhash64(F.col("_mt"))
    )
    return hashed.join(
        reps, on=[F.col("_mh") == F.col("_h"), F.col("_mt") == F.col("_rtext")]
    ).select(F.col("_keep").alias("keep"), F.col("_mid").alias("id"))


def exact_dup_pairs(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(kept_id, dup_id) pairs of identical texts.

    Join back on (hash, text) — hash is the effective join key, the
    text equality is the collision guard riding along as a residual
    equi-condition.
    """
    reps = _representatives(docs, text_col, id_col)
    hashed = docs.select(F.col(id_col).alias("_id"), F.col(text_col).alias("_t")).withColumn(
        "_hh", F.xxhash64(F.col("_t"))
    )
    return (
        hashed.join(
            reps,
            on=[F.col("_hh") == F.col("_h"), F.col("_t") == F.col("_rtext")],
        )
        .filter(F.col("_id") != F.col("_keep"))
        .select(F.col("_keep").alias("kept_id"), F.col("_id").alias("dup_id"))
    )


# ------------------------------------------------------------ shingles


def with_shingles(
    docs: DataFrame, n: int = 3, text_col: str = "text", max_tokens: int | None = None
) -> DataFrame:
    """Word n-gram shingles as array<string> — pure native exprs.

    ``max_tokens`` caps the shingled prefix: the exact all-pairs twin's
    join cost grows with sum(per-shingle frequency^2), so a bounded
    prefix keeps the ground-truth check's cost independent of document
    length (apply the SAME cap in any oracle SQL).

    The token array is projected as its own column before the shingle
    expression consumes it: a single inlined Column would embed the
    split() subtree inside the transform() lambda and every size()
    guard, so Catalyst re-splits the full text per shingle position
    (~max_tokens x per row) and the generated plan carries the monster
    expression in every Filter/Project it pushes through — measured
    ~4x slower to compile AND run. CollapseProject leaves the
    projection alone because split() is non-cheap and referenced more
    than once."""
    toks = F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
    if max_tokens is not None:
        toks = F.slice(toks, 1, max_tokens)
    staged = docs.withColumn("__shingle_toks", toks)
    t = F.col("__shingle_toks")
    shingles = F.when(
        F.size(t) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(t) - F.lit(n - 1)),
            lambda i: F.array_join(F.slice(t, i, n), " "),
        ),
    ).otherwise(F.array(F.array_join(t, " ")))
    return staged.withColumn("shingles", F.array_distinct(shingles)).drop(
        "__shingle_toks"
    )


def ngram_jaccard_pairs(
    docs: DataFrame,
    n: int = 3,
    threshold: float = 0.8,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_tokens: int | None = None,
) -> DataFrame:
    """Exact n-gram Jaccard similarity over all pairs sharing >=1 shingle.

    explode -> self-join on shingle -> per-pair intersection count ->
    |A ∪ B| = |A| + |B| - |A ∩ B|. This is the ground-truth (and
    DuckDB-oracle-expressible) variant; use minhash_lsh_pairs at scale.
    ``max_tokens`` bounds the per-document shingled prefix (see
    :func:`with_shingles`).

    The exploded (id, n_sh, shingle) relation is cached before the
    self-join: both join sides would otherwise re-derive it from the
    source (two scans, two shingle evaluations, and — the dominant
    one-shot cost — two whole-stage codegen compilations of the
    shingle expression). The relation is small by construction
    (docs x max_tokens rows); it stays cached for plan reuse, which
    is the right trade for a ground-truth twin that callers run
    on bounded samples.
    """
    sh = with_shingles(docs, n, text_col, max_tokens=max_tokens).select(
        F.col(id_col).alias("id"), F.size("shingles").alias("n_sh"), F.explode("shingles").alias("s")
    )
    sh = sh.cache()
    a, b = sh.alias("a"), sh.alias("b")
    inter = (
        a.join(b, on=[F.col("a.s") == F.col("b.s"), F.col("a.id") < F.col("b.id")])
        .groupBy(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.n_sh").alias("n_a"),
            F.col("b.n_sh").alias("n_b"),
        )
        .agg(F.count("*").alias("inter"))
    )
    return (
        inter.withColumn(
            "jaccard",
            F.col("inter").cast("double")
            / (F.col("n_a") + F.col("n_b") - F.col("inter")).cast("double"),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))
    )


# ------------------------------------------------------------- minhash


_MINHASH_PRIME = 2147483647  # 2^31 - 1; keeps a*h+b under 2^62 (no ANSI overflow)


def minhash_signature(n_hashes: int = 64, seed: int = 42):
    """array<long> minhash signature from a shingles column.

    One xxhash64 string pass per shingle, then n_hashes universal-hash
    rotations sig_i = min over shingles of (a_i * h + b_i) mod p —
    the classic permutation-family construction (cf. Spark MLlib
    MinHashLSH). All JVM expressions, no Python; hashing the string
    bytes once instead of n_hashes times cuts the dominant cost of
    signature building by ~64x. Coefficients derive deterministically
    from the seed so executors and re-runs agree.
    """
    rnd = []
    state = seed
    for _ in range(n_hashes):
        # xorshift64* — deterministic, dependency-free coefficient stream
        state ^= (state << 13) & 0xFFFFFFFFFFFFFFFF
        state ^= state >> 7
        state ^= (state << 17) & 0xFFFFFFFFFFFFFFFF
        a = state % (_MINHASH_PRIME - 1) + 1
        state ^= (state << 13) & 0xFFFFFFFFFFFFFFFF
        state ^= state >> 7
        state ^= (state << 17) & 0xFFFFFFFFFFFFFFFF
        b = state % _MINHASH_PRIME
        rnd.append((a, b))

    def rotation(hashes_col, i: int):
        a, b = rnd[i]
        return F.array_min(
            F.transform(
                hashes_col,
                lambda h: F.pmod(F.lit(a) * h + F.lit(b), F.lit(_MINHASH_PRIME)),
            )
        )

    def expr(hashes_col):
        # hashes_col must be the MATERIALIZED array of per-shingle
        # base hashes (see hashed_shingles) — passing the raw
        # transform(...) expression here would re-run the string
        # hashing once per rotation.
        return F.array(*[rotation(hashes_col, i) for i in range(n_hashes)])

    return expr


def hashed_shingles(shingles_col):
    """Per-shingle base hash: one xxhash64 string pass, folded mod p."""
    return F.transform(
        shingles_col, lambda s: F.pmod(F.xxhash64(s), F.lit(_MINHASH_PRIME))
    )


# Small odd multipliers for positional token-hash mixing; u*a stays
# far below 2^63 (u < 2^31, a < 2^21), so no ANSI overflow.
_SHINGLE_MIX = [999983, 911887, 824741, 745751, 655357, 524287, 433151, 333667]


def hashed_shingle_sets(
    docs: DataFrame, n: int = 3, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(id, hs) — distinct word-n-gram shingles as 31-bit hashes.

    The banding path never needs shingle STRINGS: each token is
    xxhash64'd once and n-grams combine positionally-weighted token
    hashes mod p, skipping the slice/array_join string construction
    entirely. Exact duplicates keep identical hash sets, so LSH recall
    on them is untouched; the 2^-31-scale hash-merge perturbation on
    near-dup similarity is absorbed by the exact string-level verify.
    """
    toks = F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
    u = F.transform(toks, lambda t: F.pmod(F.xxhash64(t), F.lit(_MINHASH_PRIME)))
    with_u = docs.select(
        F.col(id_col).alias("id"),
        u.alias("_u"),
        F.pmod(
            F.xxhash64(F.array_join(toks, " ")), F.lit(_MINHASH_PRIME)
        ).alias("_whole"),
    )

    def gram(i):
        # i is the 1-based start index column of the n-gram
        term = None
        for j in range(n):
            t = F.element_at(F.col("_u"), i + j) * F.lit(_SHINGLE_MIX[j])
            term = t if term is None else term + t
        return F.pmod(term, F.lit(_MINHASH_PRIME))

    hs = F.when(
        F.size("_u") >= n,
        F.transform(F.sequence(F.lit(1), F.size("_u") - F.lit(n - 1)), gram),
    ).otherwise(F.array(F.col("_whole")))
    return with_u.select("id", F.array_distinct(hs).alias("hs"))


def _lsh_banded(
    docs: DataFrame, n: int, n_hashes: int, bands: int, text_col: str, id_col: str
) -> DataFrame:
    """(id, band, bucket) — banded minhash signature buckets.

    Banded explode over (id, band, bucket) ONLY: the shingles array
    (the widest column in the pipeline) must NOT ride through the
    xbands explode — at 16 bands that would shuffle the payload 16x.
    """
    rows_per_band = n_hashes // bands
    sig = minhash_signature(n_hashes)
    return hashed_shingle_sets(docs, n, text_col, id_col).withColumn(
        "sig", sig(F.col("hs"))
    ).select(
        "id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.xxhash64(
                            F.concat_ws(
                                ",",
                                F.transform(
                                    F.slice("sig", b * rows_per_band + 1, rows_per_band),
                                    lambda x: x.cast("string"),
                                ),
                            )
                        ).alias("bucket"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("id", "bb.band", "bb.bucket")


def _pair_structs(ids_col):
    """All ordered (id_a < id_b) pairs of a sorted id array, as structs."""
    return F.flatten(
        F.transform(
            ids_col,
            lambda x: F.transform(
                F.filter(ids_col, lambda y: y > x),
                lambda y: F.struct(x.alias("id_a"), y.alias("id_b")),
            ),
        )
    )


def _bucket_candidates(banded: DataFrame, max_bucket: int | None) -> DataFrame:
    """Distinct candidate (id_a, id_b) pairs from bucket co-membership.

    Candidate generation as ONE pass: group ids per (band, bucket) and
    explode within-bucket pairs. A self-join on the banded rows would
    evaluate the whole signature pipeline once per side (Spark does not
    reuse the exchange across differently-aliased join inputs); here
    the signatures are computed once and the shuffle moves bare
    (band, bucket, id) triples.

    ``max_bucket`` is the degenerate-bucket guard: a bucket of N ids
    would otherwise materialize N(N-1)/2 structs inside ONE task (a
    boilerplate-heavy web corpus puts millions of ids in one
    (band, bucket) row — single-task OOM). Oversized buckets are
    chunked into ``max_bucket``-sized slices; within-chunk pairs
    explode as before (bounded at max_bucket^2/2 structs per row) and
    cross-chunk pairs come from a co-partitioned chunk self-join, so
    the quadratic pair OUTPUT is spread across tasks instead of built
    in one array. The bucket relation is localCheckpoint-ed so the
    self-join does not re-run the signature pipeline. Pair-set output
    is identical to the uncapped path.
    """
    buckets = (
        banded.groupBy("band", "bucket")
        .agg(F.array_sort(F.collect_set("id")).alias("ids"))
        .filter(F.size("ids") > 1)
    )
    if max_bucket is None:
        return (
            buckets.select(F.explode(_pair_structs(F.col("ids"))).alias("p"))
            .select("p.id_a", "p.id_b")
            .dropDuplicates(["id_a", "id_b"])
        )
    cap = int(max_bucket)
    n_chunks = F.floor((F.size("ids") + F.lit(cap - 1)) / F.lit(cap)).cast("int")
    chunks = F.transform(
        F.sequence(F.lit(0), n_chunks - F.lit(1)),
        lambda i: F.slice(F.col("ids"), i * cap + 1, cap),
    )
    chunked = buckets.select(
        "band", "bucket", F.posexplode(chunks).alias("ci", "chunk")
    ).localCheckpoint(eager=False)
    within = chunked.select(F.explode(_pair_structs(F.col("chunk"))).alias("p")).select(
        "p.id_a", "p.id_b"
    )
    # ids are sorted, chunks are consecutive slices: every id of an
    # earlier chunk < every id of a later one, so the cross product is
    # already (id_a < id_b)-oriented. Empty unless a bucket overflowed.
    a, b = chunked.alias("ca"), chunked.alias("cb")
    cross_pairs = F.flatten(
        F.transform(
            F.col("ca.chunk"),
            lambda x: F.transform(
                F.col("cb.chunk"), lambda y: F.struct(x.alias("id_a"), y.alias("id_b"))
            ),
        )
    )
    cross = (
        a.join(
            b,
            on=[
                F.col("ca.band") == F.col("cb.band"),
                F.col("ca.bucket") == F.col("cb.bucket"),
                F.col("ca.ci") < F.col("cb.ci"),
            ],
        )
        .select(F.explode(cross_pairs).alias("p"))
        .select("p.id_a", "p.id_b")
    )
    return within.unionByName(cross).dropDuplicates(["id_a", "id_b"])


def _minhash_rep_pairs(
    docs: DataFrame,
    n: int,
    n_hashes: int,
    bands: int,
    threshold: float,
    text_col: str,
    id_col: str,
    verify: bool,
    max_bucket: int | None,
) -> DataFrame:
    """LSH candidate generation (+ exact verify) over ``docs`` as-is —
    the core pipeline minhash_lsh_pairs and near_dedup_corpus share."""
    banded = _lsh_banded(docs, n, n_hashes, bands, text_col, id_col)
    cands = _bucket_candidates(banded, max_bucket)
    if not verify:
        return cands
    # Exact string-level Jaccard verify, restricted to candidate ids:
    # shingle strings are built for <= 2x|candidate pairs| docs, not
    # the whole corpus (and never twice for the full table).
    cand_ids = cands.select(F.explode(F.array("id_a", "id_b")).alias("cid")).distinct()
    cdocs = docs.join(cand_ids, on=[F.col(id_col) == F.col("cid")], how="left_semi")
    shingled = with_shingles(cdocs, n, text_col).select(
        F.col(id_col).alias("id"), "shingles"
    )
    sh_a = shingled.select(F.col("id").alias("id_a"), F.col("shingles").alias("sh_a"))
    sh_b = shingled.select(F.col("id").alias("id_b"), F.col("shingles").alias("sh_b"))
    pairs = cands.join(sh_a, on="id_a").join(sh_b, on="id_b")
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size(F.array_union("sh_a", "sh_b"))
    return (
        pairs.withColumn("jaccard", inter.cast("double") / union.cast("double"))
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))
    )


def minhash_lsh_pairs(
    docs: DataFrame,
    n: int = 3,
    n_hashes: int = 64,
    bands: int = 16,
    threshold: float = 0.8,
    text_col: str = "text",
    id_col: str = "doc_id",
    verify: bool = True,
    pre_dedup: bool = True,
    max_bucket: int | None = 1024,
) -> DataFrame:
    """MinHash + banded LSH candidate generation, exact-Jaccard verify.

    bands x rows = n_hashes; two docs collide if any band's signature
    slice hashes equal. The bucket join shuffles on (band, bucket_hash)
    — at 10^10 docs this is the only all-pairs-free dedup: cost is
    O(docs x bands) + O(candidate pairs), not O(docs^2).

    ``pre_dedup`` (the standard pipeline order) collapses byte-identical
    texts to one representative BEFORE signatures: a web corpus's
    boilerplate (error pages, templates) otherwise lands millions of
    identical docs in one (band, bucket) row — the degenerate-bucket
    single-task blowup. LSH runs on representatives only, and the pair
    set is expanded back through the exact-group membership afterwards
    (signatures depend only on the text, so a member pair qualifies iff
    its representative pair does — the output pair set is IDENTICAL,
    including jaccard values: identical texts have jaccard exactly 1).
    ``max_bucket`` guards the residual case of many DISTINCT texts
    sharing a band signature (see _bucket_candidates).
    """
    if not pre_dedup:
        return _minhash_rep_pairs(
            docs, n, n_hashes, bands, threshold, text_col, id_col, verify, max_bucket
        )
    # checkpoint: members is referenced by the rep filter, both
    # expansion sides, and the within-group join — without truncation
    # each reference re-runs the representative aggregation
    members = exact_groups(docs, text_col, id_col).localCheckpoint(eager=False)
    # alias the members-side key to a reserved name: a bare F.col("id")
    # is ambiguous at analysis when the caller's id_col is itself "id"
    # (docs columns stay in scope through the join condition)
    rep_docs = docs.join(
        members.filter(F.col("keep") == F.col("id")).select(
            F.col("id").alias("_rep_id")
        ),
        on=[F.col(id_col) == F.col("_rep_id")],
        how="left_semi",
    )
    rep_pairs = _minhash_rep_pairs(
        rep_docs, n, n_hashes, bands, threshold, text_col, id_col, verify, max_bucket
    )
    extra = [F.col("jaccard")] if verify else []
    ma = members.select(F.col("keep").alias("_ka"), F.col("id").alias("_ia"))
    mb = members.select(F.col("keep").alias("_kb"), F.col("id").alias("_ib"))
    # cross-group pairs: every member of group(a) pairs with every
    # member of group(b); identical texts inherit the rep jaccard
    cross = (
        rep_pairs.join(ma, on=[F.col("id_a") == F.col("_ka")])
        .join(mb, on=[F.col("id_b") == F.col("_kb")])
        .select(
            F.least("_ia", "_ib").alias("id_a"),
            F.greatest("_ia", "_ib").alias("id_b"),
            *extra,
        )
    )
    # within-group pairs: identical texts, jaccard exactly 1.0
    within = ma.join(
        mb, on=[F.col("_ka") == F.col("_kb"), F.col("_ia") < F.col("_ib")]
    ).select(
        F.col("_ia").alias("id_a"),
        F.col("_ib").alias("id_b"),
        *([F.lit(1.0).alias("jaccard")] if verify else []),
    )
    return cross.unionByName(within)


# ------------------------------------------------------- dedup pipeline


def connected_components(
    pairs: DataFrame,
    a_col: str = "id_a",
    b_col: str = "id_b",
    max_iters: int = 50,
    return_iterations: bool = False,
):
    """(id, component) for every id in ``pairs``; component = min id
    reachable through the pair graph.

    Alternating large-star / small-star (Kiveris et al., "Connected
    Components in MapReduce and Beyond"): each round, large-star hooks
    every node's LARGER neighbors onto the minimum of its neighborhood,
    small-star hooks the smaller neighbors (and the node itself) onto
    that minimum. Converges in O(log n) rounds on ANY topology — the
    upgrade over plain min-label propagation, whose O(diameter) rounds
    degrade to O(n) on chain-shaped duplicate clusters (ver-batim
    re-posts of re-posts). Each phase is one groupBy + one join over
    bare (long, long) edges; localCheckpoint truncates lineage so the
    plan stays flat across iterations.

    Raises a warning if the loop exhausts ``max_iters`` without
    converging (labels would otherwise be silently non-minimal);
    at O(log n) convergence, 50 iterations covers any practical graph.
    """
    import warnings

    # the min-label algebra below casts ids to long; a non-integral id
    # column (e.g. string urls) would cast to NULL, drop every edge in
    # the a != b filter, and silently return empty labels — fail loudly
    # instead (callers hash such keys to xxhash64 first)
    dtypes = dict(pairs.dtypes)
    integral = {"tinyint", "smallint", "int", "bigint"}
    for c in (a_col, b_col):
        if dtypes.get(c) not in integral:
            raise TypeError(
                f"connected_components requires integral id columns; "
                f"{c!r} is {dtypes.get(c)!r} — hash non-numeric keys "
                f"(e.g. xxhash64) before building the pair graph"
            )
    edges = (
        pairs.select(F.col(a_col).cast("long").alias("a"), F.col(b_col).cast("long").alias("b"))
        .filter(F.col("a") != F.col("b"))
        .select(F.greatest("a", "b").alias("hi"), F.least("a", "b").alias("lo"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    prev_sig = None
    iters = 0
    converged = False
    for _ in range(max_iters):
        iters += 1
        # large-star: for each node u, m = min(N(u) ∪ {u}); emit (v, m)
        # for the strictly-larger neighbors v > u
        nbrs = edges.select(F.col("hi").alias("u"), F.col("lo").alias("v")).unionByName(
            edges.select(F.col("lo").alias("u"), F.col("hi").alias("v"))
        )
        mins = nbrs.groupBy("u").agg(F.min("v").alias("_mv")).select(
            "u", F.least("_mv", F.col("u")).alias("m")
        )
        large = (
            nbrs.join(mins, on="u")
            .filter(F.col("v") > F.col("u"))
            .select(F.col("v").alias("hi"), F.col("m").alias("lo"))
            .distinct()
        )
        # small-star: edges run hi -> lo; for each node u,
        # m = min(smaller neighbors ∪ {u}); hook them (and u) onto m
        sm = large.groupBy("hi").agg(F.min("lo").alias("m"))
        cand = large.select("hi", "lo").unionByName(
            sm.select("hi", F.col("hi").alias("lo"))
        )
        edges = (
            cand.join(sm, on="hi")
            .filter(F.col("lo") != F.col("m"))
            .select(F.col("lo").alias("hi"), F.col("m").alias("lo"))
            .distinct()
            .localCheckpoint(eager=True)
        )
        # fixed point: edge multiset unchanged (count + order-free hash;
        # a 64-bit collision faking convergence is ~2^-64 per iteration)
        stat = edges.agg(
            F.count("*").alias("n"),
            # decimal sum: exact and overflow-free under ANSI mode
            F.sum(F.xxhash64("hi", "lo").cast("decimal(38,0)")).alias("h"),
        ).first()
        sig = (stat["n"], stat["h"])
        if sig == prev_sig:
            converged = True
            break
        prev_sig = sig
    if not converged:
        warnings.warn(
            f"connected_components did not converge in {max_iters} iterations; "
            "labels may be non-minimal",
            stacklevel=2,
        )
    # converged state is a star forest: every non-root points at its root
    labels = (
        edges.select(F.col("hi").alias("id"), F.col("lo").alias("component"))
        .unionByName(edges.select(F.col("lo").alias("id"), F.col("lo").alias("component")))
        .distinct()
    )
    if return_iterations:
        return labels, iters
    return labels


def near_dedup_corpus(
    docs: DataFrame,
    n: int = 3,
    n_hashes: int = 64,
    bands: int = 16,
    threshold: float = 0.9,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """The operator a training-data pipeline actually runs: remove
    near-duplicates, keeping the lowest-id representative of every
    duplicate CLUSTER (not just pairwise: A~B and B~C collapse to one
    doc even when A~C is below threshold).

    exact-dedup pre-pass -> minhash LSH pairs over representatives ->
    connected components over (rep pairs ∪ exact-group star edges) ->
    anti-join the dominated ids. The pre-pass (the standard pipeline
    order) is what makes this safe on a boilerplate-heavy corpus:
    byte-identical docs never reach the LSH stage, so the quadratic
    pair expansion minhash_lsh_pairs would otherwise have to perform
    for them is replaced by LINEAR star edges (keep -> member) — the
    component structure, and therefore the kept set, is unchanged
    (every member is connected to its representative, representatives
    to each other exactly as their texts dictate). The component step
    is O(log n) rounds of small self-joins over the (tiny relative to
    the corpus) pair set.
    """
    members = exact_groups(docs, text_col, id_col).localCheckpoint(eager=False)
    # _rep_id alias: see minhash_lsh_pairs — avoids analysis ambiguity
    # when the caller's id_col is itself named "id"
    rep_docs = docs.join(
        members.filter(F.col("keep") == F.col("id")).select(
            F.col("id").alias("_rep_id")
        ),
        on=[F.col(id_col) == F.col("_rep_id")],
        how="left_semi",
    )
    rep_pairs = _minhash_rep_pairs(
        rep_docs, n, n_hashes, bands, threshold, text_col, id_col,
        verify=True, max_bucket=1024,
    )
    star = members.filter(F.col("keep") != F.col("id")).select(
        F.col("keep").alias("id_a"), F.col("id").alias("id_b")
    )
    edges = rep_pairs.select("id_a", "id_b").unionByName(star)
    comp = connected_components(edges)
    dominated = comp.filter(F.col("id") != F.col("component")).select(
        F.col("id").alias("_rep_id")
    )
    return docs.join(
        dominated, on=[F.col(id_col) == F.col("_rep_id")], how="left_anti"
    )


# ------------------------------------------------------------- simhash


def simhash_fingerprints(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(id, sh) — 64-bit SimHash fingerprints, 100% JVM-side.

    Plan shape: tokenize + xxhash64 per token (native exprs), explode,
    then ONE HashAggregate with 64 conditional-sum columns (bit votes)
    + a token count. Partial aggregation collapses each doc to a
    single 65-long row map-side, so the groupBy(id) exchange moves one
    narrow row per doc regardless of document length — this replaces a
    per-token, per-character Python loop that was the 3rd-slowest
    query in round 1 (row-at-a-time Python in disguise).

    Bit i of the fingerprint is set when >= half the token hashes have
    bit i set (votes >= 0 in classic SimHash terms); empty/whitespace
    docs fingerprint to 0.
    """
    toks = F.filter(
        F.split(F.trim(F.lower(F.col(text_col))), r"\s+"), lambda t: t != F.lit("")
    )
    ex = docs.select(
        F.col(id_col).alias("id"),
        F.explode_outer(F.transform(toks, lambda t: F.xxhash64(t))).alias("th"),
    )
    votes = ex.groupBy("id").agg(
        F.count("th").alias("_n"),
        *[
            F.sum(
                F.shiftrightunsigned("th", i).bitwiseAND(F.lit(1)).cast("int")
            ).alias(f"_b{i}")
            for i in range(64)
        ],
    )
    # bit i wins when ones*2 >= n; bit 63's weight is Long.MIN_VALUE
    # (two's complement), which plain long addition composes correctly.
    fp = reduce(
        add,
        [
            F.when(
                F.col(f"_b{i}") * 2 >= F.col("_n"),
                F.lit((1 << i) if i < 63 else -(1 << 63)).cast("long"),
            )
            .otherwise(F.lit(0).cast("long"))
            for i in range(64)
        ],
    )
    return votes.select(
        "id", F.when(F.col("_n") == 0, F.lit(0).cast("long")).otherwise(fp).alias("sh")
    )


def simhash_near_dup_pairs(
    docs: DataFrame,
    max_hamming: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    verify_exact: bool = False,
) -> DataFrame:
    """Near-dup pairs by SimHash Hamming distance <= max_hamming.

    Scale path: block on 16-bit quadrants (a pair within Hamming<=3 of
    64 bits must agree exactly on >=1 of 4 quadrants — pigeonhole), so
    the join is on quadrant equality, never all-pairs.

    ``verify_exact`` adds the candidate->verify step every production
    fingerprint dedup runs: SimHash is lossy (documents differing by
    one token out of ~100 can tie every bit vote), so candidate pairs
    are re-joined to their texts and kept only on exact equality.
    With max_hamming=0 the verified output is exactly the
    text-equality pair relation (recall 1: identical texts always
    fingerprint identically), which is what the DuckDB oracle pins.
    """
    sh = simhash_fingerprints(docs, text_col, id_col)
    quads = sh.select(
        "id",
        "sh",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(q).alias("q"),
                        F.shiftrightunsigned("sh", q * 16).bitwiseAND(F.lit(0xFFFF)).alias("qv"),
                    )
                    for q in range(4)
                ]
            )
        ).alias("qq"),
    ).select("id", "sh", "qq.q", "qq.qv")
    a, b = quads.alias("a"), quads.alias("b")
    ham = F.bit_count(F.col("a.sh").bitwiseXOR(F.col("b.sh")))
    pairs = (
        a.join(
            b,
            on=[
                F.col("a.q") == F.col("b.q"),
                F.col("a.qv") == F.col("b.qv"),
                F.col("a.id") < F.col("b.id"),
            ],
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            ham.alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .dropDuplicates(["id_a", "id_b"])
    )
    if not verify_exact:
        return pairs
    txt = docs.select(F.col(id_col), F.col(text_col))
    t_a = txt.select(F.col(id_col).alias("id_a"), F.col(text_col).alias("_ta"))
    t_b = txt.select(F.col(id_col).alias("id_b"), F.col(text_col).alias("_tb"))
    return (
        pairs.join(t_a, on="id_a")
        .join(t_b, on="id_b")
        .filter(F.col("_ta") == F.col("_tb"))
        .select("id_a", "id_b", "hamming")
    )
