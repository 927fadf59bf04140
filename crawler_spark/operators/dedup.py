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


def with_shingles(docs: DataFrame, n: int = 3, text_col: str = "text") -> DataFrame:
    """Word n-gram shingles as array<string> — pure native exprs."""
    toks = F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
    shingles = F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - F.lit(n - 1)),
            lambda i: F.array_join(F.slice(toks, i, n), " "),
        ),
    ).otherwise(F.array(F.array_join(toks, " ")))
    return docs.withColumn("shingles", F.array_distinct(shingles))


def ngram_jaccard_pairs(
    docs: DataFrame,
    n: int = 3,
    threshold: float = 0.8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Exact n-gram Jaccard similarity over all pairs sharing >=1 shingle.

    explode -> self-join on shingle -> per-pair intersection count ->
    |A ∪ B| = |A| + |B| - |A ∩ B|. This is the ground-truth (and
    DuckDB-oracle-expressible) variant; use minhash_lsh_pairs at scale.
    """
    sh = with_shingles(docs, n, text_col).select(
        F.col(id_col).alias("id"), F.size("shingles").alias("n_sh"), F.explode("shingles").alias("s")
    )
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


def minhash_lsh_pairs(
    docs: DataFrame,
    n: int = 3,
    n_hashes: int = 64,
    bands: int = 16,
    threshold: float = 0.8,
    text_col: str = "text",
    id_col: str = "doc_id",
    verify: bool = True,
) -> DataFrame:
    """MinHash + banded LSH candidate generation, exact-Jaccard verify.

    bands x rows = n_hashes; two docs collide if any band's signature
    slice hashes equal. The bucket join shuffles on (band, bucket_hash)
    — at 10^10 docs this is the only all-pairs-free dedup: cost is
    O(docs x bands) + O(candidate pairs), not O(docs^2).
    """
    rows_per_band = n_hashes // bands
    sig = minhash_signature(n_hashes)

    # Banded explode over (id, band, bucket) ONLY: the shingles array
    # (the widest column in the pipeline) must NOT ride through the
    # xbands explode — at 16 bands that would shuffle the payload 16x.
    # Candidate pairs are bare id pairs; shingle strings are derived
    # only for the (far smaller) candidate id set in the verify step.
    banded = hashed_shingle_sets(docs, n, text_col, id_col).withColumn(
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

    # Candidate generation as ONE pass: group ids per (band, bucket)
    # and explode within-bucket pairs. A self-join would evaluate the
    # whole signature pipeline once per side (Spark does not reuse the
    # exchange across differently-aliased join inputs); here the
    # signatures are computed once and the shuffle moves bare
    # (band, bucket, id) triples.
    buckets = (
        banded.groupBy("band", "bucket")
        .agg(F.array_sort(F.collect_set("id")).alias("ids"))
        .filter(F.size("ids") > 1)
    )
    pair_arr = F.flatten(
        F.transform(
            F.col("ids"),
            lambda x: F.transform(
                F.filter(F.col("ids"), lambda y: y > x),
                lambda y: F.struct(x.alias("id_a"), y.alias("id_b")),
            ),
        )
    )
    cands = (
        buckets.select(F.explode(pair_arr).alias("p"))
        .select("p.id_a", "p.id_b")
        .dropDuplicates(["id_a", "id_b"])
    )
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


# ------------------------------------------------------- dedup pipeline


def connected_components(
    pairs: DataFrame, a_col: str = "id_a", b_col: str = "id_b", max_iters: int = 50
) -> DataFrame:
    """(id, component) for every id in ``pairs``; component = min id
    reachable through the pair graph.

    Join-based min-label propagation: each iteration joins every
    node's current label with its neighbors' and keeps the minimum,
    converging in O(diameter) rounds — near-dup clusters are shallow
    (duplicates of duplicates), so this is a handful of iterations.
    The driver loop carries only the convergence check (one count per
    iteration), all data stays distributed; at 10^10 scale this is the
    standard large-star/small-star shape without the optimization,
    which SCALE.md calls out.
    """
    # materialize the edge set ONCE (localCheckpoint truncates lineage):
    # without this every iteration would re-derive the upstream pair
    # pipeline (minhash signatures included) from scratch, and the
    # label plan would grow by one join per iteration
    edges = (
        pairs.select(F.col(a_col).alias("src"), F.col(b_col).alias("dst"))
        .unionByName(pairs.select(F.col(b_col).alias("src"), F.col(a_col).alias("dst")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    labels = (
        edges.select(F.col("src").alias("id"))
        .distinct()
        .withColumn("component", F.col("id"))
        .localCheckpoint(eager=True)
    )
    for _ in range(max_iters):
        neighbor_min = (
            edges.join(labels, on=[edges["dst"] == labels["id"]])
            .select(F.col("src").alias("id"), F.col("component"))
            .groupBy("id")
            .agg(F.min("component").alias("_nbr"))
        )
        updated = (
            labels.join(neighbor_min, on="id", how="left")
            .select(
                "id",
                F.least(F.col("component"), F.coalesce(F.col("_nbr"), F.col("component"))).alias(
                    "new_component"
                ),
                "component",
            )
            .localCheckpoint(eager=True)
        )
        changed = updated.filter(F.col("new_component") != F.col("component")).count()
        labels = updated.select("id", F.col("new_component").alias("component"))
        if changed == 0:
            break
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

    minhash LSH pairs -> connected components -> anti-join the
    dominated ids. Everything upstream is the verified scale path;
    the component step adds O(diameter) small self-joins over the
    (tiny relative to the corpus) pair set.
    """
    pairs = minhash_lsh_pairs(
        docs, n=n, n_hashes=n_hashes, bands=bands, threshold=threshold,
        text_col=text_col, id_col=id_col,
    )
    comp = connected_components(pairs)
    dominated = comp.filter(F.col("id") != F.col("component")).select("id")
    return docs.join(
        dominated, on=[F.col(id_col) == F.col("id")], how="left_anti"
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
