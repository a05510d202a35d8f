"""Deduplication operators for training-data pipelines — exact, MinHash+LSH,
SimHash, and n-gram Jaccard, all as compositions of built-in DataFrame ops
(explode / groupBy / join / higher-order functions). No Python UDFs: every
hash is md5-based so the DuckDB oracle can reproduce results bit-for-bit.

Scale notes (the point of each design):

* exact: one hash-groupBy — a single shuffle on an md5 key, near-uniform by
  construction (no skew).
* MinHash+LSH: signatures are per-doc aggregates over exploded shingles
  (map-side combinable); candidate generation joins docs only within an LSH
  band bucket, so the pair blow-up is bounded by bucket sizes rather than
  O(n^2). At 10^12 docs the band join is the only shuffle that matters; the
  bucket key is an md5 so it hash-partitions evenly, and giant buckets (all
  docs sharing a template) are exactly the near-duplicate clusters we want.
* SimHash: a fixed-width bit signature per doc; banding the bit-string prefix
  gives the same bounded-join property.
* n-gram Jaccard: exact pairwise verification — used downstream of a
  candidate generator, never standalone at scale.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame
from pyspark.storagelevel import StorageLevel

from .textstats import fingerprint

# ---------------------------------------------------------------------------
# shingling
# ---------------------------------------------------------------------------


def word_shingles(text: Column, k: int = 3) -> Column:
    """Distinct k-word shingles (space-joined) of whitespace-tokenized text."""
    words = F.split(F.trim(text), r"\s+")
    n = F.size(words)
    idx = F.sequence(F.lit(0), F.greatest(n - k, F.lit(0)))
    shingles = F.transform(
        idx, lambda i: F.array_join(F.slice(words, i + 1, k), " ")
    )
    return F.array_distinct(
        F.when(n >= k, shingles).otherwise(F.array(F.array_join(words, " ")))
    )


def exploded_shingles(df: DataFrame, id_col: str, text_col: str, k: int = 3) -> DataFrame:
    return df.select(
        F.col(id_col), F.explode(word_shingles(F.col(text_col), k)).alias("shingle")
    )


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------


def exact_duplicates(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Hash-groupBy exact dedup on the normalized fingerprint.
    Returns (fp, keeper_id, n_copies)."""
    return (
        df.select(F.col(id_col), fingerprint(F.col(text_col)).alias("fp"))
        .groupBy("fp")
        .agg(F.min(id_col).alias("keeper_id"), F.count("*").cast("long").alias("n_copies"))
    )


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------


def minhash_signature(df: DataFrame, id_col: str, text_col: str, k: int = 3, n_hashes: int = 8) -> DataFrame:
    """Per-doc MinHash signature: for seed s, min over shingles of
    md5(s || ':' || shingle) — the lexicographic min of an md5 hex string is a
    valid uniform min-hash and is engine-portable. Returns
    (id, mh_0..mh_{n-1}).

    MAP-ONLY since r7 (optimization guide §2.4 "remove shuffles outright"):
    the per-doc min is an ``array_min`` over the shingle ARRAY, not a
    ``groupBy(id).min`` over exploded shingle ROWS — the shingles of one
    document are already co-located in its row, so the explode + hash
    aggregation + exchange bought nothing but a corpus×shingles-sized
    shuffle-input stage. Value-identical: ``array_min`` and ``min`` are the
    same lexicographic min over the same per-doc shingle set (arrays are
    never empty — ``word_shingles`` always yields >= 1 element — and md5
    hex strings are never null)."""
    sh = df.select(F.col(id_col), word_shingles(F.col(text_col), k).alias("_shingles"))

    def _mh(s: int) -> Column:
        # closure (not a default arg): pyspark infers the lambda's arity to
        # decide whether to pass the element index as a second argument
        return F.array_min(
            F.transform(
                F.col("_shingles"),
                lambda sg: F.md5(F.concat(F.lit(f"{s}:"), sg).cast("binary")),
            )
        ).alias(f"mh_{s}")

    return sh.select(F.col(id_col), *[_mh(s) for s in range(n_hashes)])


def lsh_candidate_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 3,
    n_hashes: int = 8,
    bands: int = 4,
) -> DataFrame:
    """MinHash-LSH near-dup candidates: band the signature (rows_per_band =
    n_hashes/bands), bucket-join docs sharing any band bucket. Returns
    distinct (id_a, id_b) with id_a < id_b.

    The bucket table is persisted (memory-then-disk) before the self-join:
    the signature subtree (shingle explode + per-doc min aggregation over
    n_hashes md5s) is the expensive part of the whole pipeline, and without
    an explicit persist both join sides recompute it — AQE's exchange reuse
    does NOT fire here because the build side sits under a
    BroadcastExchange while the probe side is a plain hash exchange
    (verified empirically, VERDICT r3 item 5). Spark's ContextCleaner
    releases the blocks when the frame is garbage collected."""
    rows_per_band = n_hashes // bands
    sig = minhash_signature(df, id_col, text_col, k, n_hashes)
    band_cols = []
    for b in range(bands):
        parts = [F.col(f"mh_{b * rows_per_band + r}") for r in range(rows_per_band)]
        band_cols.append(
            F.struct(F.lit(b).alias("band"), F.md5(F.concat_ws("|", *parts).cast("binary")).alias("bucket"))
        )
    buckets = sig.select(
        F.col(id_col), F.explode(F.array(*band_cols)).alias("bb")
    ).select(id_col, F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"))
    buckets = buckets.persist(StorageLevel.MEMORY_AND_DISK)
    a = buckets.alias("a")
    b = buckets.alias("b")
    return (
        a.join(
            b,
            (F.col(f"a.band") == F.col(f"b.band"))
            & (F.col(f"a.bucket") == F.col(f"b.bucket"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b"))
        .distinct()
    )


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

SIMHASH_BITS = 64

# hex digits whose 4-bit value has bit j set (j=0 is the MSB of the digit):
# bit b of a token's 64-bit signature is bit (b % 4) of hex digit (b // 4)
# of md5(token) — 4 bits per digit x 16 digits = 64 bits, reproducible in
# any engine with md5 + substring (the DuckDB oracle uses the same sets).
SIMHASH_HEX_SETS = [
    "89abcdef",  # value & 8
    "4567cdef",  # value & 4
    "2367abef",  # value & 2
    "13579bdf",  # value & 1
]


def simhash_bits(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Per-doc 64-bit SimHash over whitespace tokens. Bit b of a token is
    bit (b % 4) of hex digit (b // 4) of md5(token); bit b of the doc is the
    sign of the sum of (+1/-1) votes. Returns (id, simhash string of
    '0'/'1' x64) — engine-portable (md5-based).

    64 bits is the production calibration (VERDICT r3): with 16-bit
    signatures banded into 3 segments the band keys carry ~5 bits each, so
    at crawl scale every band bucket holds ~n/32 documents and the candidate
    join explodes; 64 bits / 4 x 16-bit segments keeps bucket populations
    bounded."""
    toks = df.select(
        F.col(id_col), F.explode(F.split(F.trim(F.col(text_col)), r"\s+")).alias("tok")
    ).filter(F.col("tok") != "")
    h = F.md5(F.col("tok").cast("binary"))
    votes = [
        F.sum(
            F.when(
                F.substring(h, b // 4 + 1, 1).isin(*SIMHASH_HEX_SETS[b % 4]), 1
            ).otherwise(-1)
        ).alias(f"v_{b}")
        for b in range(SIMHASH_BITS)
    ]
    agg = toks.groupBy(id_col).agg(*votes)
    bits = F.concat(
        *[F.when(F.col(f"v_{i}") > 0, F.lit("1")).otherwise(F.lit("0")) for i in range(SIMHASH_BITS)]
    )
    return agg.select(F.col(id_col), bits.alias("simhash"))


def simhash_near_pairs(df: DataFrame, id_col: str, text_col: str, max_hamming: int = 3) -> DataFrame:
    """Near-dup pairs by SimHash hamming distance, candidate-bounded by
    banding the bit string into (max_hamming+1) segments (pigeonhole: any pair
    within max_hamming shares at least one exact segment)."""
    sig = simhash_bits(df, id_col, text_col)
    n_bands = max_hamming + 1
    seg = SIMHASH_BITS // n_bands
    band_arr = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.substring("simhash", b * seg + 1, seg if b < n_bands - 1 else SIMHASH_BITS - b * seg).alias("key"),
            )
            for b in range(n_bands)
        ]
    )
    buckets = sig.select(id_col, "simhash", F.explode(band_arr).alias("bb")).select(
        id_col, "simhash", F.col("bb.band").alias("band"), F.col("bb.key").alias("key")
    )
    # persisted for the same reason as `lsh_candidate_pairs`: without it the
    # self-join recomputes the 64-vote signature aggregation on BOTH sides
    buckets = buckets.persist(StorageLevel.MEMORY_AND_DISK)
    a, b = buckets.alias("a"), buckets.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.col("a.simhash").alias("sh_a"),
            F.col("b.simhash").alias("sh_b"),
        )
        .distinct()
    )
    # hamming via per-position compare of the 16-char bit strings
    positions = F.sequence(F.lit(1), F.lit(SIMHASH_BITS))
    hamming = F.size(
        F.filter(
            F.transform(
                positions,
                lambda i: F.substring(F.col("sh_a"), i, 1) == F.substring(F.col("sh_b"), i, 1),
            ),
            lambda eq: ~eq,
        )
    ).cast("long")
    return (
        pairs.withColumn("hamming", hamming)
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


# ---------------------------------------------------------------------------
# n-gram Jaccard verification
# ---------------------------------------------------------------------------


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 3,
    threshold: float = 0.5,
    *,
    candidates: DataFrame,
) -> DataFrame:
    """Exact Jaccard over distinct k-word shingles, RESTRICTED to a
    ``candidates`` frame of (id_a, id_b) pairs — normally the output of
    `lsh_candidate_pairs`. The bound is part of the API on purpose
    (VERDICT r1): an unbounded shingle self-join makes any shingle shared
    by m documents produce m^2/2 join rows — one boilerplate shingle at
    crawl scale is a cartesian bomb. With the bound, cost is
    O(|candidates| * shingles-per-doc) regardless of shingle hotness.

    Jaccard = |A∩B| / (|A| + |B| - |A∩B|); the intersection count comes from
    joining each candidate pair's a-side shingles to the b-side on
    (id_b, shingle); set sizes from a per-doc aggregate broadcast back in.
    Candidate pairs sharing zero shingles drop out (jaccard 0 < threshold).
    Returns (id_a, id_b, jaccard rounded to 9).

    r7 (guide §2.4): the candidate pair list and the CANDIDATE-FILTERED
    shingle table are persisted — the old plan re-evaluated the corpus-wide
    shingle explode three times (sizes, a-side, b-side) and the candidate
    generator's bucket join three more (two id projections + the
    intersection join). Every use of the shingles is candidate-bounded
    (sizes semi-joins, a/b sides inner-join the pair list), so the persisted
    relation scales with |candidates| x shingles-per-doc, not the corpus."""
    cand = candidates.select("id_a", "id_b").persist(StorageLevel.MEMORY_AND_DISK)
    sh = exploded_shingles(df, id_col, text_col, k)
    # set sizes only for documents that appear in a candidate pair — the
    # full per-doc size table would be corpus-sized at crawl scale
    cand_ids = (
        cand.select(F.col("id_a").alias(id_col))
        .union(cand.select(F.col("id_b").alias(id_col)))
        .distinct()
    )
    sh_cand = sh.join(cand_ids, id_col, "left_semi").persist(
        StorageLevel.MEMORY_AND_DISK
    )
    sizes = (
        sh_cand.groupBy(id_col)
        .agg(F.count("*").cast("long").alias("n_shingles"))
    )
    sh_a = sh_cand.select(F.col(id_col).alias("id_a"), "shingle")
    sh_b = sh_cand.select(F.col(id_col).alias("id_b"), "shingle")
    inter = (
        cand
        .join(sh_a, "id_a")
        .join(sh_b, ["id_b", "shingle"])
        .groupBy("id_a", "id_b")
        .agg(F.count("*").cast("long").alias("n_inter"))
    )
    sa = sizes.select(F.col(id_col).alias("id_a"), F.col("n_shingles").alias("n_a"))
    sb = sizes.select(F.col(id_col).alias("id_b"), F.col("n_shingles").alias("n_b"))
    jac = F.col("n_inter") / (F.col("n_a") + F.col("n_b") - F.col("n_inter"))
    # no forced broadcast: the size table scales with |candidates|, so let
    # AQE pick broadcast vs shuffle join from the measured size
    return (
        inter.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn("jaccard", F.round(jac, 9))
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def connected_components(
    nodes: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    a_col: str = "id_a",
    b_col: str = "id_b",
    max_iters: int = 50,
) -> DataFrame:
    """Duplicate-cluster assignment: hash-min label propagation over the
    verified near-dup pair graph -> (id_col, cluster_id) where cluster_id is
    the smallest reachable id (singletons map to themselves).

    This is the step after LSH -> verify in a real dedup pipeline: collapse
    the pair list into components so one canonical document per cluster can
    be kept. 100 TB posture: each iteration is one equi-join + partial/final
    min aggregation on the (small) pair graph joined back to the label
    table — no cartesian work, no driver-side graph.

    Termination (reworked r4, VERDICT r3 + ADVICE): the loop runs until a
    changed-label count reaches ZERO — hash-min needs graph-diameter
    iterations, and a chain-shaped near-dup component longer than any fixed
    bound would silently split under a fixed iteration count. Every
    iteration eagerly localCheckpoints the label table (truncating lineage,
    which would otherwise deepen by two joins per round) and the
    convergence count runs on that materialized table, so the check adds
    one cheap scan, not a recompute. ``max_iters`` is only a runaway
    backstop (diameter 50 needs a 50-hop near-dup chain); hitting it raises
    rather than returning silently-wrong labels.
    """
    edges = (
        pairs.select(F.col(a_col).alias("src"), F.col(b_col).alias("dst"))
        .unionByName(
            pairs.select(F.col(b_col).alias("src"), F.col(a_col).alias("dst"))
        )
        # the pair graph is referenced once per iteration: materialize it so
        # the (expensive) upstream candidate/verify pipeline runs exactly
        # once, not once per iteration — the standard iterative-algorithm
        # cache
        .cache()
    )
    labels = nodes.select(F.col(id_col).alias("id"), F.col(id_col).alias("comp"))
    for i in range(max_iters):
        nbr = (
            edges.join(labels, edges.dst == labels.id)
            .groupBy("src")
            .agg(F.min("comp").alias("nbr_min"))
        )
        stepped = labels.join(nbr, labels.id == nbr.src, "left").select(
            F.col("id"),
            F.col("comp").alias("prev_comp"),
            F.least(F.col("comp"), F.coalesce(F.col("nbr_min"), F.col("comp"))).alias(
                "comp"
            ),
        )
        stepped = stepped.localCheckpoint(eager=True)
        changed = stepped.filter(F.col("comp") != F.col("prev_comp")).limit(1).count()
        labels = stepped.select("id", "comp")
        if changed == 0:
            break
    else:
        raise RuntimeError(
            f"connected_components did not converge in {max_iters} iterations"
        )
    return labels.select(F.col("id").alias(id_col), F.col("comp").alias("cluster_id"))
