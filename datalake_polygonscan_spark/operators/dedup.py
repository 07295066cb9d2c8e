"""Deduplication operators for LLM-corpus pipelines (L1, L2).

Five dedup families, each a pure DataFrame composition:

- ``exact_dedup``         — hash-of-normalized-text, rank-1 survivor
- ``minhash_lsh_*``       — MinHash signatures + LSH banding (Broder '97;
                            the GPT-3/C4-style fuzzy dedup)
- ``simhash``             — Charikar '02 bitwise fingerprint
- ``ngram_jaccard_pairs`` — exact shingle-set Jaccard verification
- ``embedding_near_duplicates`` — cosine threshold over embeddings

Scale notes (the 100 TB story):
- MinHash here is deterministic AND cheap: ONE md5 per distinct shingle
  (its first 60 bits as an int), then ``num_perm`` universal-hash
  permutations ``(a_p*h + b_p) mod (2^31-1)`` with fixed constants —
  integer multiply-adds instead of ``num_perm`` md5 calls per shingle
  (16x less hashing at the defaults). No RNG state ships to executors,
  and any engine (DuckDB included) reproduces it bit-for-bit because
  the constants come from one shared Python generator.
- LSH banding turns the quadratic all-pairs problem into an equi-join
  on (band_id, band_signature): Spark shuffles both sides on the band
  key — a linear shuffle, never a cross join.
- The Jaccard verify step joins candidate pairs back to exploded
  shingle sets; candidate count is bounded by band collisions, not n².
- Common-shingle hot keys (stop-phrases) are the classic skew source:
  ``ngram_jaccard_pairs`` drops shingles with document frequency above
  ``max_doc_freq`` before pairing (standard trick; AQE skew-join
  handles the rest).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from datalake_polygonscan_spark.functions.text import char_shingles, normalize_text, word_shingles
from datalake_polygonscan_spark.functions.vectors import cosine_similarity


def _ensure_parallelism(df: DataFrame) -> DataFrame:
    """CPU-heavy per-row stages (shingle hashing, bit votes) must not
    run on a handful of input splits: a single small parquet file would
    serialize the whole corpus onto one core. Round-robin repartition
    to the session's shuffle parallelism — but ONLY when the scan is
    actually under-split. The gate reads the catalog file index
    (``df.inputFiles()``, planning-only — no ``df.rdd`` conversion, no
    job): a file-backed input with >= target files already gives every
    core work, so the exchange would be pure overhead — at 100 TB a
    well-split corpus (tens of thousands of files) skips straight to
    the hash stage. Fewer files than target (or a non-file source,
    where ``inputFiles`` is empty/unavailable) keeps the round-robin
    exchange, whose cost is small next to the md5/bit-vote work it
    parallelizes."""
    target = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32"))
    try:
        n_files = len(df.inputFiles())
    except Exception:  # streaming relations etc. — assume under-split
        n_files = 0
    if n_files >= target:
        return df
    return df.repartition(target)


def exact_dedup(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """L1 — exact dedup on md5(normalized text); survivor = min id.

    Deterministic by construction (dropDuplicates keeps an arbitrary
    row; rank-1-by-id reproduces across runs and cluster sizes).
    Output: input rows + ``text_hash``, survivors only.
    """
    hashed = df.withColumn("text_hash", F.md5(normalize_text(text_col)))
    w = Window.partitionBy("text_hash").orderBy(F.col(id_col).asc())
    return hashed.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") == 1).drop("_rn")


#: universal-hash modulus for MinHash permutations (Mersenne prime 2^31-1):
#: base hashes are reduced mod P first, so a_p*h + b_p < 2^62 — exact in
#: int64 arithmetic in every engine, no overflow, no float rounding.
MINHASH_PRIME = 2_147_483_647


def minhash_perm_constants(num_perm: int) -> list[tuple[int, int]]:
    """Deterministic (a_p, b_p) pairs for the universal-hash MinHash
    permutations, from a fixed-seed 64-bit LCG. The DuckDB oracle SQL
    (queries/llm.py) is generated from THIS function, so both engines
    agree by construction."""
    state = 0x5DEECE66D
    consts = []
    for _ in range(num_perm):
        state = (state * 6364136223846793005 + 1442695040888963407) % 2**64
        a_p = state % (MINHASH_PRIME - 1) + 1  # in [1, P-1], never 0
        state = (state * 6364136223846793005 + 1442695040888963407) % 2**64
        b_p = state % MINHASH_PRIME
        consts.append((a_p, b_p))
    return consts


def shingle_sets(df: DataFrame, text_col: str, id_col: str, shingle_k: int = 3) -> DataFrame:
    """(doc_id, distinct word-shingle array) — the shared input of the
    MinHash-LSH pipeline. Computed ONCE and reused by both the
    signature and the verify stages (minhash_lsh_dedup persists it so
    the shingling CPU isn't paid twice)."""
    return _ensure_parallelism(
        df.select(
            F.col(id_col).alias("doc_id"),
            F.array_distinct(word_shingles(text_col, shingle_k)).alias("shingles"),
        )
    )


def _shingle_base_hash(shingle_col) -> "F.Column":
    """md5(shingle) -> first 15 hex chars (60 bits) -> int64, reduced
    mod MINHASH_PRIME. ``conv`` in Spark == ``CAST('0x'||hex AS BIGINT)``
    in DuckDB; 60 bits always fits signed 64-bit, so no truncation
    ambiguity between engines."""
    return F.conv(F.substring(F.md5(shingle_col), 1, 15), 16, 10).cast("long") % F.lit(MINHASH_PRIME)


def _signatures_from_shingles(shingled: DataFrame, num_perm: int) -> DataFrame:
    # explode -> codegen base hash -> ONE hash-aggregate with num_perm
    # min() columns: everything whole-stage-codegen with map-side
    # partial mins (the higher-order transform/array_min form is
    # CodegenFallback — measured ~30% slower); shuffle rows are
    # (doc_id, num_perm longs) partials, linear in docs not shingles
    ex = shingled.select("doc_id", F.explode("shingles").alias("_s"))
    h = ex.select("doc_id", _shingle_base_hash(F.col("_s")).alias("_h"))
    mins = [
        F.min((F.lit(a) * F.col("_h") + F.lit(b)) % F.lit(MINHASH_PRIME)).alias(f"_p{i}")
        for i, (a, b) in enumerate(minhash_perm_constants(num_perm))
    ]
    flat = h.groupBy("doc_id").agg(*mins)
    return flat.select("doc_id", F.array(*[f"_p{i}" for i in range(num_perm)]).alias("signature"))


def minhash_signatures(
    df: DataFrame,
    text_col: str,
    id_col: str,
    num_perm: int = 16,
    shingle_k: int = 3,
) -> DataFrame:
    """MinHash signature per document: array of ``num_perm`` minima of
    universal-hash permutations ``(a_p*base + b_p) mod 2^31-1`` over the
    md5-derived base hash of each word shingle (the min over the
    distinct shingle set equals the min over the multiset, so the
    shared distinct shingle table feeds this too).

    Stays entirely in codegen, and the md5 cost is paid ONCE per
    shingle (the permutations are integer multiply-adds) — no shuffle
    at all until someone aggregates the signatures.
    """
    return _signatures_from_shingles(shingle_sets(df, text_col, id_col, shingle_k), num_perm)


def banded_signatures(signatures: DataFrame, bands: int = 4) -> DataFrame:
    """LSH banding projection: ``bands`` (doc_id, band, band_hash)
    rows per signature. This IS the persistable LSH index — a table of
    these rows is what :func:`incremental_lsh_candidates` probes, so a
    growing corpus never re-hashes old documents."""
    sig_len = F.size("signature")
    rows_per_band = (sig_len / F.lit(bands)).cast("int")
    return signatures.select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.struct(
                    b.alias("band"),
                    # signature elements are int64; stringify for a
                    # deterministic engine-neutral band digest
                    F.md5(
                        F.concat_ws(
                            "|",
                            F.transform(
                                F.slice("signature", b * rows_per_band + 1, rows_per_band),
                                lambda x: x.cast("string"),
                            ),
                        )
                    ).alias("band_hash"),
                ),
            )
        ).alias("bh"),
    ).select("doc_id", "bh.band", "bh.band_hash")


def incremental_lsh_candidates(new_banded: DataFrame, index: DataFrame) -> DataFrame:
    """Candidate pairs between a NEW batch and a PERSISTED LSH index:
    equi-join the batch's band rows against the stored (doc_id, band,
    band_hash) table. Cost follows the BATCH — the corpus contributes
    one build side keyed by (band, band_hash), never a re-shingle or
    re-hash of old text. Output (doc_a, doc_b) with doc_a = index doc,
    doc_b = batch doc, distinct."""
    n = new_banded.select(
        F.col("doc_id").alias("doc_b"), "band", "band_hash"
    )
    i = index.select(F.col("doc_id").alias("doc_a"), "band", "band_hash")
    return (
        n.join(i, ["band", "band_hash"])
        .filter(F.col("doc_a") != F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )


def minhash_lsh_candidate_pairs(
    signatures: DataFrame,
    bands: int = 4,
) -> DataFrame:
    """LSH banding: split each signature into ``bands`` equal rows,
    hash each band, equi-join on (band, band_hash) to get candidate
    pairs (doc_a < doc_b). One explode + one shuffle join — linear in
    corpus size, never quadratic.
    """
    banded = banded_signatures(signatures, bands)
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    shingle_k: int = 3,
    threshold: float = 0.5,
    max_doc_freq: int | None = None,
    candidates: DataFrame | None = None,
    shingled: DataFrame | None = None,
) -> DataFrame:
    """Exact n-gram Jaccard similarity for document pairs.

    Without ``candidates``: pairs = docs sharing >=1 (non-hot) shingle,
    found by a self-equi-join on the exploded shingle table — with
    ``max_doc_freq`` pruning stop-phrase hot keys so no reduce key
    explodes. With ``candidates`` (e.g. from LSH): verify only those.
    ``shingled`` (from :func:`shingle_sets`) lets callers reuse an
    already-computed (possibly persisted) shingle table.

    Output: (doc_a, doc_b, jaccard) with jaccard >= threshold.
    """
    sets = shingled if shingled is not None else shingle_sets(df, text_col, id_col, shingle_k)
    if candidates is not None:
        # candidate-verify path: join the (small) pair list to the
        # shingle sets and intersect arrays in codegen — no exploded
        # self-join, cost = O(|candidates| * shingles-per-doc)
        sa = sets.select(F.col("doc_id").alias("doc_a"), F.col("shingles").alias("sh_a"))
        sb = sets.select(F.col("doc_id").alias("doc_b"), F.col("shingles").alias("sh_b"))
        return (
            candidates.join(sa, "doc_a")
            .join(sb, "doc_b")
            .withColumn("intersection", F.size(F.array_intersect("sh_a", "sh_b")))
            .withColumn(
                "jaccard",
                F.col("intersection") / (F.size("sh_a") + F.size("sh_b") - F.col("intersection")),
            )
            .filter(F.col("jaccard") >= threshold)
            .select("doc_a", "doc_b", "jaccard")
        )
    sizes = sets.select("doc_id", F.size("shingles").alias("set_size"))
    exploded = sets.select("doc_id", F.explode("shingles").alias("shingle"))
    if max_doc_freq is not None:
        doc_freq = exploded.groupBy("shingle").agg(F.count("*").alias("df"))
        exploded = exploded.join(doc_freq.filter(F.col("df") <= max_doc_freq), "shingle", "inner").select(
            "doc_id", "shingle"
        )
    a = exploded.alias("a")
    b = exploded.alias("b")
    inter = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count("*").alias("intersection"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("set_size").alias("size_a"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("set_size").alias("size_b"))
    return (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn(
            "jaccard",
            F.col("intersection") / (F.col("size_a") + F.col("size_b") - F.col("intersection")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


def minhash_lsh_duplicate_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    num_perm: int = 16,
    bands: int = 4,
    shingle_k: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """Verified duplicate pairs (doc_a < doc_b, jaccard >= threshold)
    from the full MinHash-LSH pipeline: shared shingle table ->
    signatures -> banded candidates -> exact Jaccard verify.

    The shingle table is computed ONCE and persisted across its two
    consumers (signatures, Jaccard verify) — the md5 shingling is the
    CPU-dominant stage, so recomputing it doubled the job's cost. At
    100 TB the persist becomes a checkpoint to the object store.

    The verified pair list is eagerly materialized (localCheckpoint —
    pairs are tiny relative to the corpus) so the shingle cache can be
    unpersisted before returning: repeated calls in a long-lived
    session (e.g. the dedup AND dedup-groups registry entries) no
    longer accumulate cached shingle blocks in executor storage.
    """
    sets = shingle_sets(df, text_col, id_col, shingle_k).persist()
    try:
        sigs = _signatures_from_shingles(sets, num_perm)
        cand = minhash_lsh_candidate_pairs(sigs, bands)
        pairs = ngram_jaccard_pairs(
            df, text_col, id_col, shingle_k, threshold, candidates=cand, shingled=sets
        )
        return pairs.localCheckpoint(eager=True)
    finally:
        sets.unpersist()


def minhash_lsh_dedup(
    df: DataFrame,
    text_col: str,
    id_col: str,
    num_perm: int = 16,
    bands: int = 4,
    shingle_k: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """L2 end-to-end: LSH candidates -> exact Jaccard verify -> greedy
    survivor choice (drop the larger id of each duplicate pair).

    Note: survivor selection is min-id within each *pairwise* dup
    relation (standard corpus-dedup practice: drop any doc that
    duplicates a lower id). For full transitive-closure GROUPS, feed
    :func:`minhash_lsh_duplicate_pairs` to
    :func:`operators.graph.connected_components` (registry entry
    ``l2_dedup_groups``).
    """
    dups = minhash_lsh_duplicate_pairs(df, text_col, id_col, num_perm, bands, shingle_k, threshold)
    to_drop = dups.select(F.col("doc_b").alias("_drop_id")).distinct()
    return df.join(to_drop, df[id_col] == F.col("_drop_id"), "left_anti")


def simhash(df: DataFrame, text_col: str, id_col: str, bits: int = 64) -> DataFrame:
    """L2 — SimHash fingerprint (Charikar '02): per-token 64-bit hash
    (xxhash64, JVM built-in), bitwise ±1 vote weighted by nothing
    (uniform), sign of each bit-sum -> fingerprint bits.

    Formulated as explode -> ONE hash-aggregate with ``bits`` codegen'd
    conditional sums (one per bit position): everything stays in
    whole-stage codegen with map-side partial aggregation, unlike the
    per-bit ``F.aggregate`` higher-order form (CodegenFallback,
    ``bits`` interpreted passes over every token array — measured 1.6x
    slower). The shuffle rows are (doc_id, 64 ints) partial votes —
    narrow, and linear in document count, not token count.
    Output: (id, simhash as bigint, n_tokens); documents with an empty
    token array (empty/whitespace-only text) get simhash=0, n_tokens=0
    rather than vanishing through the explode.
    """
    from datalake_polygonscan_spark.functions.text import tokens

    # explode_outer keeps a (doc_id, NULL) row for empty token arrays
    # (empty/whitespace-only/NULL text tokenizes to no real tokens), so
    # those docs survive to the output (simhash=0, n_tokens=0) without
    # a second join back to the id list
    real_tokens = F.filter(F.array_distinct(tokens(text_col)), lambda t: t != "")
    ex = _ensure_parallelism(
        df.select(F.col(id_col).alias("doc_id"), F.explode_outer(real_tokens).alias("tok"))
    )
    # xxhash64(NULL) returns the seed (a real value), so gate on the
    # token's own nullity to keep h NULL for the empty-doc marker rows
    h = ex.select("doc_id", F.when(F.col("tok").isNotNull(), F.xxhash64("tok")).alias("h"))

    def bit_set(i: int):
        # mask test instead of shiftright (whose py4j wrapper rejects
        # lambda-scoped Columns in Spark 4); only bit 63 of the xxhash64
        # value is the sign bit — lower requested widths (bits < 64)
        # test their top bit with a plain mask like any other position
        return (F.col("h") < 0) if i == 63 else F.col("h").bitwiseAND(F.lit(1 << i)) != 0

    votes = h.groupBy("doc_id").agg(
        # NULL hash (empty doc) votes 0, so its fingerprint stays 0
        *[
            F.sum(F.when(F.col("h").isNull(), 0).when(bit_set(i), 1).otherwise(-1)).alias(f"_v{i}")
            for i in range(bits)
        ],
        F.count("h").alias("n_tokens"),
    )
    fingerprint = None
    for i in range(bits):
        # the i=63 bit would overflow a signed long as +2^63; every
        # narrower fingerprint's top bit fits as a positive value
        bit_value = F.lit(-(2**63) if i == 63 else 1 << i).cast("long")
        contrib = F.when(F.col(f"_v{i}") > 0, bit_value).otherwise(F.lit(0).cast("long"))
        fingerprint = contrib if fingerprint is None else fingerprint + contrib
    return votes.select("doc_id", fingerprint.alias("simhash"), F.col("n_tokens").cast("int").alias("n_tokens"))


def simhash_near_pairs(
    fingerprints: DataFrame, max_hamming: int = 3, block_bits: int = 16, bits: int = 64
) -> DataFrame:
    """Near-dup pairs by SimHash: block on 4 x 16-bit chunks (a pair
    within hamming distance 3 must agree on >=1 of 4 chunks — pigeonhole),
    equi-join per chunk, verify exact hamming via bit_count(xor).

    ``bits`` must match the fingerprint width used in :func:`simhash`:
    blocking only over the meaningful chunks — a 64-bit block plan over
    32-bit fingerprints would make the all-zero upper chunks collide
    for every document (an accidental all-pairs join).
    """
    n_blocks = bits // block_bits
    blocks = fingerprints.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("block"),
                        F.expr(f"shiftright(simhash, {b * block_bits}) & {(1 << block_bits) - 1}").alias("chunk"),
                    )
                    for b in range(n_blocks)
                ]
            )
        ).alias("bc"),
    ).select("doc_id", "simhash", "bc.block", "bc.chunk")
    a, b = blocks.alias("a"), blocks.alias("b")
    return (
        a.join(
            b,
            (F.col("a.block") == F.col("b.block"))
            & (F.col("a.chunk") == F.col("b.chunk"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))).alias("hamming"),
        )
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )


def embedding_near_duplicates(
    embeddings: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    method: str = "lsh",
    n_planes: int = 10,
    n_tables: int = 32,
    dim: int = 64,
    seed: int = 7,
) -> DataFrame:
    """L2 — embedding-cosine near-dup pairs (id_a < id_b, cos >= t).

    ``method='lsh'`` (default, the scale path): candidate pairs come
    from self-equi-joins on signed-random-projection buckets
    (similarity.py's hyperplane bucketer) across ``n_tables``
    independent tables — a linear shuffle on (table, bucket) keys,
    never an n² theta join — then exact cosine verifies candidates.
    Recall for a pair at cosine t is 1-(1-p^b)^T with
    p = 1 - acos(t)/π: at the defaults (b=10, T=32) that is ~0.97 for
    t>=0.8, >0.999 for t>=0.9 and ~1 for t>=0.95 — while random
    near-orthogonal pairs collide in only 1-(1-2^-10)^32 ≈ 3.1% of
    cases (vs 9.4% at the former b=8, T=24: each sharpening trades a
    point or two of recall at the 0.8 edge for ~3x less verify
    volume; measured 2000-vector sf0.1 candidates drop 188k → ~63k).
    At corpus scale, join candidate IDs back to vectors instead of
    carrying vectors through the pair dedup (narrower shuffle rows).

    ``method='exact'`` is the all-pairs theta-join form — the oracle /
    small-data verifier, quadratic by construction.
    """
    base = embeddings.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("vec"))
    if method == "exact":
        a = base.select(F.col("vec_id").alias("id_a"), F.col("vec").alias("vec_a"))
        b = base.select(F.col("vec_id").alias("id_b"), F.col("vec").alias("vec_b"))
        scored = a.join(b, F.col("id_a") < F.col("id_b")).withColumn(
            "cosine", cosine_similarity("vec_a", "vec_b")
        )
    elif method == "lsh":
        from datalake_polygonscan_spark.functions.vectors import dot_pandas, l2_norm
        from datalake_polygonscan_spark.operators.similarity import lsh_table_buckets

        # normalize ONCE per vector (zero-norm vectors have no cosine
        # and are dropped), so each candidate pair is scored with a
        # single dot product instead of dot + two norms
        normed = (
            base.withColumn("_n", l2_norm("vec"))
            .filter(F.col("_n") > 0)
            .select("vec_id", F.transform("vec", lambda x: x.cast("double") / F.col("_n")).alias("vec"))
        )
        # all table buckets in one Arrow/numpy matmul per batch (see
        # lsh_table_buckets: the expression form's codegen compile time
        # dominated the whole query); element = table<<32 | bucket.
        # Vectors ride along through the ONE bucket-key shuffle, the
        # dot scores right at the join, and only pairs past the
        # threshold reach the distinct — minimal stage count (each
        # extra exchange costs a barrier; the join-ids-back variant
        # spent more time in stage orchestration than in math)
        tb = normed.select(
            "vec_id", "vec", F.explode(lsh_table_buckets(F.col("vec"), dim, n_planes, n_tables, seed)).alias("tb")
        )
        a, b = tb.alias("a"), tb.alias("b")
        scored = (
            a.join(b, (F.col("a.tb") == F.col("b.tb")) & (F.col("a.vec_id") < F.col("b.vec_id")))
            .select(
                F.col("a.vec_id").alias("id_a"),
                F.col("b.vec_id").alias("id_b"),
                dot_pandas(F.col("a.vec"), F.col("b.vec")).alias("cosine"),
            )
            .filter(F.col("cosine") >= threshold)
            .dropDuplicates(["id_a", "id_b"])
        )
    else:
        raise ValueError(f"unknown method {method!r}; expected 'lsh' or 'exact'")
    return (
        scored.filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", F.round("cosine", 6).alias("cosine"))
    )


def fingerprint_bottom_k(df: DataFrame, text_col: str, id_col: str, k: int = 8, char_k: int = 5) -> DataFrame:
    """L4 — document fingerprint: bottom-k sketch of md5'd character
    k-grams (a winnowing-style rolling fingerprint; bottom-k of a
    min-wise hash family is an unbiased Jaccard estimator between
    sketches). Output: (id, fingerprint array<string> ascending).
    """
    grams = _ensure_parallelism(df.select(F.col(id_col).alias("doc_id"), char_shingles(text_col, char_k).alias("grams")))
    return grams.select(
        "doc_id",
        F.slice(F.array_sort(F.array_distinct(F.transform("grams", F.md5))), 1, k).alias("fingerprint"),
    )


def winnowing_fingerprints(
    df: DataFrame, text_col: str, id_col: str, k: int = 3, w: int = 4
) -> DataFrame:
    """L8 — WINNOWING document fingerprints (Schleimer/Wilkerson/Aiken,
    SIGMOD '03 — the MOSS algorithm): hash the ORDERED word k-gram
    sequence of the normalized text, slide a window of ``w``
    consecutive hashes, record the minimum of each window. The
    winnowing guarantee: any shared run of >= w + k - 1 consecutive
    words between two documents produces at least one SHARED
    fingerprint — a locality property the bottom-k sketch
    (:func:`fingerprint_bottom_k`) cannot give, which is why winnowing
    is the standard for overlap/plagiarism detection rather than
    whole-document similarity.

    Entirely codegen (the single-regex-pass shingler +
    sequence/slice/array_min higher-order functions — no Python in the
    row path); hashes are the engine-neutral 60-bit md5 prefix shared
    with the MinHash tier, so a SQL oracle replays the pipeline
    bit-exactly. Word grams (not char grams) keep the hash count at
    O(tokens): winnowing every char position costs ~6x more md5 and
    window work for the same guarantee expressed in characters.
    Output: (doc_id, fingerprints array<bigint> distinct ascending,
    n_grams). Documents shorter than one window keep the min of what
    they have — every doc fingerprints.
    """
    grams = _ensure_parallelism(
        df.select(F.col(id_col).alias("doc_id"), word_shingles(text_col, k).alias("grams"))
    )
    hashes = F.transform(
        "grams", lambda g: F.conv(F.substring(F.md5(g), 1, 15), 16, 10).cast("long")
    )
    # the exchange is a projection-collapse barrier as well as a
    # parallelism guard: the hash array crosses the shuffle
    # materialized once per row instead of being re-inlined into
    # every downstream window-slice reference
    h = _ensure_parallelism(
        grams.select("doc_id", hashes.alias("h"), F.size("grams").alias("n_grams"))
    )
    n_win = F.size("h") - F.lit(w - 1)
    picks = F.transform(
        F.sequence(F.lit(1), F.greatest(n_win, F.lit(1))),
        lambda i: F.array_min(F.slice("h", i, F.least(F.lit(w), F.size("h")))),
    )
    return h.select(
        "doc_id",
        F.array_sort(F.array_distinct(picks)).alias("fingerprints"),
        F.col("n_grams").cast("long").alias("n_grams"),
    )


def winnowing_overlap_pairs(
    fingerprints: DataFrame,
    min_shared: int = 2,
    threshold: float = 0.5,
    max_df: int = 50,
) -> DataFrame:
    """Document pairs sharing winnowed fingerprints: explode the
    fingerprint sets, drop fingerprints occurring in more than
    ``max_df`` documents (corpus boilerplate — a winnowed minimum
    shared by thousands of docs is a hot key that says nothing about
    pairwise overlap but quadratically blows up its join bucket; the
    exact analog of the MinHash tier's hot-shingle pruning), equi-join
    on the surviving fingerprint values (a blocked join — candidates
    meet only inside a shared-hash bucket, never all-pairs), count
    shared prints per pair and score ``shared / min(|A|, |B|)``
    (containment over the FULL fingerprint sets — a boilerplate-only
    doc can't fake overlap). Keeps pairs with >= ``min_shared`` shared
    prints AND score >= ``threshold``.

    100 TB story: one shuffle on the fingerprint value; the frequency
    cap bounds every bucket's pair fan-out at max_df^2, so the join
    cost is sum(df^2) <= max_df * total_prints — linear in the corpus.
    """
    # materialize the fingerprint ARRAYS before exploding
    # (localCheckpoint): the explode otherwise collapses with the
    # upstream windowing projection and re-evaluates the whole
    # shingling/windowing tree once PER EXPLODED PRINT (~20x per doc —
    # measured 52s -> 4s at sf0.1), and the exploded table feeds the
    # frequency pass plus BOTH sides of the pair join. At corpus scale
    # this is a staged intermediate table
    sized = fingerprints.select(
        "doc_id", "fingerprints", F.size("fingerprints").alias("n_fp")
    ).localCheckpoint(eager=True).select(
        "doc_id", "n_fp", F.explode("fingerprints").alias("fp")
    )
    rare = sized.groupBy("fp").agg(F.count("*").alias("_df")).filter(
        F.col("_df") <= max_df
    )
    sized = sized.join(rare.select("fp"), "fp")
    a = sized.select(F.col("doc_id").alias("id_a"), F.col("n_fp").alias("n_a"), "fp")
    b = sized.select(F.col("doc_id").alias("id_b"), F.col("n_fp").alias("n_b"), "fp")
    return (
        a.join(b, "fp")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b", "n_a", "n_b")
        .agg(F.count("*").alias("shared"))
        .filter(F.col("shared") >= min_shared)
        .withColumn(
            "overlap",
            F.round(F.col("shared") / F.least(F.col("n_a"), F.col("n_b")), 6),
        )
        .filter(F.col("overlap") >= threshold)
        .select("id_a", "id_b", F.col("shared").cast("long").alias("shared"), "overlap")
    )


def ngram_containment_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    shingle_k: int = 3,
    threshold: float = 0.5,
    max_doc_freq: int | None = None,
) -> DataFrame:
    """L15 — n-gram CONTAINMENT pairs: |A ∩ B| / |A| with A the
    smaller shingle set — the asymmetric signal Jaccard structurally
    cannot give. A short document quoted verbatim inside a long one
    has Jaccard ≈ |A|/|B| ≈ 0 (L2 never flags it) but containment
    ≈ 1. This is the sub-document sibling of L13's span fractions:
    L13 scores how much of ONE doc is duplicated anywhere; L15 names
    the specific (contained, container) pairs.

    Same blocking structure as :func:`ngram_jaccard_pairs` — exploded
    shingle self-equi-join (optionally df-capped so stop-phrase keys
    never explode), one groupBy pair count, sizes joined after — so
    the all-pairs cost is O(sum of per-shingle doc-freq squared),
    never O(n^2). Orientation is deterministic: the smaller set is
    the contained side, ties break to the lower doc id.

    Output: (doc_contained, doc_container, containment, size_contained,
    size_container) with containment >= threshold.
    """
    sets = shingle_sets(df, text_col, id_col, shingle_k)
    sizes = sets.select("doc_id", F.size("shingles").alias("set_size"))
    exploded = sets.select("doc_id", F.explode("shingles").alias("shingle"))
    if max_doc_freq is not None:
        doc_freq = exploded.groupBy("shingle").agg(F.count("*").alias("df"))
        exploded = exploded.join(
            doc_freq.filter(F.col("df") <= max_doc_freq), "shingle", "inner"
        ).select("doc_id", "shingle")
    a = exploded.alias("a")
    b = exploded.alias("b")
    inter = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("da"), F.col("b.doc_id").alias("db"))
        .agg(F.count("*").alias("i"))
    )
    sa = sizes.select(F.col("doc_id").alias("da"), F.col("set_size").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("db"), F.col("set_size").alias("nb"))
    scored = inter.join(sa, "da").join(sb, "db")
    # orient: smaller set = contained side; equal sizes -> lower id
    small_is_a = (F.col("na") < F.col("nb")) | (
        (F.col("na") == F.col("nb")) & (F.col("da") < F.col("db"))
    )
    oriented = scored.select(
        F.when(small_is_a, F.col("da")).otherwise(F.col("db")).alias("doc_contained"),
        F.when(small_is_a, F.col("db")).otherwise(F.col("da")).alias("doc_container"),
        F.when(small_is_a, F.col("na")).otherwise(F.col("nb")).alias("size_contained"),
        F.when(small_is_a, F.col("nb")).otherwise(F.col("na")).alias("size_container"),
        (F.col("i") / F.least("na", "nb")).alias("containment"),
    )
    return oriented.filter(F.col("containment") >= threshold).select(
        "doc_contained", "doc_container",
        F.round("containment", 6).alias("containment"),
        F.col("size_contained").cast("long").alias("size_contained"),
        F.col("size_container").cast("long").alias("size_container"),
    )


def duplicate_token_spans(
    df: DataFrame,
    text_col: str,
    id_col: str,
    min_len: int = 20,
) -> DataFrame:
    """L17 — EXACT duplicate-substring spans with exact boundaries
    (Lee et al. 2022, "Deduplicating Training Data Makes Language
    Models Better" — the ExactSubstr criterion): every maximal token
    span of length >= ``min_len`` that occurs more than once in the
    corpus, per document. This is the sub-document signal whole-doc
    and chunk-granularity dedup (L13's fixed 32-token chunks) miss:
    boundaries here are token-exact, not chunk-aligned.

    Formulation: the union of maximal duplicate spans >= L equals the
    union of duplicated L-grams — any duplicate span of length m >= L
    is covered by its m-L+1 duplicated L-grams, and every duplicated
    L-gram IS a duplicate span (the identity the paper's suffix-array
    LCP >= L criterion computes; the suffix array is its single-node
    data structure, the distributed form is this grouped-anchor
    equivalent). So:

    1. one scan explodes each doc into its L-gram start positions,
       each carrying ONLY the md5 digest of its L tokens (the L13
       discipline: shuffles carry digests, never text — per-position
       payload is constant, not O(L));
    2. ONE hash-partition window by digest counts occurrences; count
       >= 2 marks the position as inside a duplicate span (corpus-wide
       AND intra-doc repeats both qualify, as in the paper);
    3. per-doc gaps-and-islands coalescing merges overlapping [pos,
       pos+L) intervals into MAXIMAL spans with exact boundaries —
       a window over the (small) duplicate-position subset only.

    Three linear shuffles, no cross join, no candidate blowup: the
    digest exchange is the only corpus-sized one and it is
    partial-agg shaped. Returns one row per doc: n_tokens, n_spans,
    dup_tokens, longest_span, first_start (1-based), dup_frac.
    """
    L = int(min_len)
    toks = _ensure_parallelism(
        df.select(
            F.col(id_col).alias("doc_id"),
            F.split(F.lower(F.col(text_col)), " ").alias("t"),
        )
    )
    sizes = toks.select("doc_id", F.size("t").alias("n_tokens"))
    grams = (
        toks.filter(F.size("t") >= L)
        .select(
            "doc_id", "t",
            F.explode(F.expr(f"sequence(1, size(t) - {L} + 1)")).alias("pos"),
        )
        .select(
            "doc_id", "pos",
            F.md5(F.concat_ws(" ", F.expr(f"slice(t, pos, {L})"))).alias("dg"),
        )
    )
    dup = (
        grams.withColumn("c", F.count("*").over(Window.partitionBy("dg")))
        .filter(F.col("c") >= 2)
        .select("doc_id", "pos")
    )
    w_doc = Window.partitionBy("doc_id").orderBy("pos")
    w_prev = w_doc.rowsBetween(Window.unboundedPreceding, -1)
    islands = (
        dup.withColumn("prev_end", F.max(F.col("pos") + L).over(w_prev))
        .withColumn(
            "new_island",
            F.when(
                F.col("prev_end").isNull() | (F.col("pos") > F.col("prev_end")), 1
            ).otherwise(0),
        )
        .withColumn("island", F.sum("new_island").over(w_doc))
    )
    spans = islands.groupBy("doc_id", "island").agg(
        F.min("pos").alias("start"),
        (F.max("pos") + F.lit(L)).alias("end_excl"),
    )
    per_doc = spans.groupBy("doc_id").agg(
        F.count("*").alias("n_spans"),
        F.sum(F.col("end_excl") - F.col("start")).alias("dup_tokens"),
        F.max(F.col("end_excl") - F.col("start")).alias("longest_span"),
        F.min("start").alias("first_start"),
    )
    return (
        sizes.join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            F.col("n_tokens").cast("long").alias("n_tokens"),
            F.coalesce("n_spans", F.lit(0)).cast("long").alias("n_spans"),
            F.coalesce("dup_tokens", F.lit(0)).cast("long").alias("dup_tokens"),
            F.coalesce("longest_span", F.lit(0)).cast("long").alias("longest_span"),
            F.coalesce("first_start", F.lit(0)).cast("long").alias("first_start"),
            F.round(
                F.coalesce("dup_tokens", F.lit(0)).cast("double") / F.col("n_tokens"), 4
            ).alias("dup_frac"),
        )
    )


def remove_duplicate_spans(
    df: DataFrame,
    text_col: str,
    id_col: str,
    min_len: int = 20,
) -> DataFrame:
    """L19 — APPLY the ExactSubstr policy (Lee et al. 2022 §3.1): cut
    every token covered by a duplicated span >= ``min_len`` out of
    every document (the paper removes ALL occurrences, not
    all-but-one, and reports no quality loss), producing the cleaned
    corpus the detection pass (:func:`duplicate_token_spans`) only
    scored.

    Plan: the detector's duplicate-position islands mark covered token
    index ranges per doc; tokens explode with their positions ONCE, an
    equi-join on doc_id plus an interval predicate flags covered
    tokens (span count per doc is small — the fan-out is bounded by
    spans, not pairs), and the survivors reassemble in exact token
    order via a sorted struct aggregation. All shuffles are linear
    (the detector's three + one token-explode exchange); no cross
    join. Deterministic: token order is positional, not
    engine-arbitrary.

    Returns (doc_id, n_tokens, n_removed, cleaned_text).
    """
    L = int(min_len)
    toks = _ensure_parallelism(
        df.select(
            F.col(id_col).alias("doc_id"),
            F.split(F.lower(F.col(text_col)), " ").alias("t"),
        )
    )
    grams = (
        toks.filter(F.size("t") >= L)
        .select(
            "doc_id", "t",
            F.explode(F.expr(f"sequence(1, size(t) - {L} + 1)")).alias("pos"),
        )
        .select(
            "doc_id", "pos",
            F.md5(F.concat_ws(" ", F.expr(f"slice(t, pos, {L})"))).alias("dg"),
        )
    )
    dup = (
        grams.withColumn("c", F.count("*").over(Window.partitionBy("dg")))
        .filter(F.col("c") >= 2)
        .select("doc_id", "pos")
    )
    w_doc = Window.partitionBy("doc_id").orderBy("pos")
    w_prev = w_doc.rowsBetween(Window.unboundedPreceding, -1)
    spans = (
        dup.withColumn("prev_end", F.max(F.col("pos") + L).over(w_prev))
        .withColumn(
            "new_island",
            F.when(
                F.col("prev_end").isNull() | (F.col("pos") > F.col("prev_end")), 1
            ).otherwise(0),
        )
        .withColumn("island", F.sum("new_island").over(w_doc))
        .groupBy("doc_id", "island")
        .agg(F.min("pos").alias("s_start"), (F.max("pos") + F.lit(L)).alias("s_end"))
    )
    exploded = toks.select(
        "doc_id", F.posexplode("t").alias("idx0", "tok")
    ).select("doc_id", (F.col("idx0") + 1).alias("idx"), "tok")
    covered = (
        exploded.join(spans, "doc_id")
        .filter((F.col("idx") >= F.col("s_start")) & (F.col("idx") < F.col("s_end")))
        .select("doc_id", "idx")
        .distinct()
    )
    kept = exploded.join(covered, ["doc_id", "idx"], "left_anti")
    rebuilt = kept.groupBy("doc_id").agg(
        F.count("*").alias("n_kept"),
        F.concat_ws(
            " ",
            F.expr("transform(array_sort(collect_list(struct(idx, tok))), x -> x.tok)"),
        ).alias("cleaned_text"),
    )
    sizes = toks.select("doc_id", F.size("t").alias("n_tokens"))
    return (
        sizes.join(rebuilt, "doc_id", "left")
        .select(
            "doc_id",
            F.col("n_tokens").cast("long").alias("n_tokens"),
            (F.col("n_tokens") - F.coalesce("n_kept", F.lit(0))).cast("long").alias("n_removed"),
            F.coalesce("cleaned_text", F.lit("")).alias("cleaned_text"),
        )
    )
