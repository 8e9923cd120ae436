"""Deduplication family for large-scale training-data pipelines.

Not in the reference (SURVEY.md §2.11 — mandated extension surface). Five
strategies, cheapest-first, all expressed so the heavy lifting stays on the
JVM and shuffles move hashes/ids instead of document bodies:

- exact           — group on a 16-byte md5 fingerprint of normalized text;
- MinHash + LSH   — shingle → per-seed xxhash64 min → band → bucket join;
                    candidates verified with exact Jaccard;
- n-gram Jaccard  — exact set-similarity join via explode + count (the
                    verification primitive; also standalone for small n);
- SimHash         — 64-bit signed-bit signature, banded bucketing, Hamming
                    verify with JVM ``bit_count(a ^ b)``;
- embedding cosine — near-dup by semantic vector, exact or LSH-bucketed.

Scale notes: every candidate-pair generator is a hash join on short keys
(bucket ids), never an all-pairs product; verification only touches
candidate pairs. MinHash signatures are pure Catalyst expressions
(``transform``/``array_min``/``xxhash64``), so signature computation is
shuffle-free and codegen'd.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import LongType

from confluent_kafka_vector_search_prompt_inference_spark.functions.text import (
    doc_fingerprint,
    normalized_text,
    word_tokens,
)
from confluent_kafka_vector_search_prompt_inference_spark.functions.vector import vec_cosine


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------

def dedup_exact(df: DataFrame, cols: list[str] | None = None) -> DataFrame:
    """Exact dedup: ``dropDuplicates`` (hash aggregate on the key columns)."""
    return df.dropDuplicates(cols) if cols else df.dropDuplicates()


def exact_duplicate_groups(
    df: DataFrame, id_col: str, text_col: str, min_group: int = 2
) -> DataFrame:
    """Groups of byte-identical (after normalization) documents.

    Returns ``(fingerprint, n_docs, keep_id, member_ids)`` — ``keep_id`` is
    the smallest id (the canonical survivor). Shuffles 16-byte hashes + ids
    only, never text bodies."""
    return (
        df.select(F.col(id_col), doc_fingerprint(text_col).alias("fingerprint"))
        .groupBy("fingerprint")
        .agg(
            F.count("*").alias("n_docs"),
            F.min(id_col).alias("keep_id"),
            F.sort_array(F.collect_list(id_col)).alias("member_ids"),
        )
        .filter(F.col("n_docs") >= min_group)
    )


# ---------------------------------------------------------------------------
# shingles + MinHash
# ---------------------------------------------------------------------------

def word_shingles(text: Column | str, n: int = 3) -> Column:
    """Distinct word n-gram shingles of the normalized text (ARRAY<STRING>).

    Documents shorter than n words fall back to their full token join so no
    row ends up with an empty shingle set."""
    toks = word_tokens(text)
    ngrams = F.transform(
        F.sequence(F.lit(1), F.greatest(F.size(toks) - (n - 1), F.lit(1))),
        lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
    )
    return F.array_distinct(ngrams)


def minhash_signatures(
    df: DataFrame,
    id_col: str,
    text_col: str | None,
    *,
    num_hashes: int = 64,
    shingle_n: int = 3,
    out_col: str = "minhash",
    shingle_col: str | None = None,
) -> DataFrame:
    """Append ``out_col: ARRAY<BIGINT>`` of ``num_hashes`` minima.

    Hash family: each shingle is string-hashed ONCE (``xxhash64`` → 32-bit
    domain), then ``h_i = (a_i·h + b_i) mod 2^32`` with seeded random odd
    multipliers — the standard pairwise-independent multiply-shift family
    (a naive ``h1 + i·h2`` is NOT min-wise independent: high-``i`` members
    share argmins and the Jaccard estimate collapses). Products stay below
    2^63, so arithmetic is overflow-free under ANSI mode (Spark 4 default).
    All JVM-side, no UDF, one codegen'd projection: at 100 TB this stage is
    a pure map with zero shuffle.

    Intermediate arrays are materialized in staged projections — Catalyst
    does not CSE a subexpression across array elements, so inlining the
    shingle pipeline would recompute the regex/split ``num_hashes``× per
    row.

    ``shingle_col``: name of a precomputed shingle-array column on ``df``
    (skips the shingling stage). Lets a caller compute shingles ONCE and
    share them between the signature leg and an exact-Jaccard verify leg
    (see ``ngram_jaccard_pairs``'s matching parameter)."""
    rng = np.random.default_rng(42)
    a_consts = rng.integers(1, 2**31 - 1, size=num_hashes, dtype=np.int64) | 1
    b_consts = rng.integers(0, 2**32 - 1, size=num_hashes, dtype=np.int64)
    mask = F.lit(0xFFFFFFFF)

    if shingle_col is not None:
        shingled = df.select(F.col(id_col), F.col(shingle_col).alias("__sh"))
    else:
        shingled = df.select(F.col(id_col), word_shingles(text_col, shingle_n).alias("__sh"))
    hashed = shingled.select(
        F.col(id_col),
        F.transform(F.col("__sh"), lambda s: F.xxhash64(s).bitwiseAND(mask)).alias("__h"),
    )

    # The num_hashes affine minima run in ONE Arrow-batched NumPy UDF over
    # the precomputed hash arrays: a 64-member Catalyst expression array
    # generates megabytes of Java that blows past JIT limits and runs
    # interpreted (~5× slower); the (shingles × num_hashes) outer product is
    # exactly what BLAS-style vectorization is for. Still a zero-shuffle map.
    from pyspark.sql.types import ArrayType, LongType as _Long

    @F.pandas_udf(ArrayType(_Long()))
    def _minima(hs: pd.Series) -> pd.Series:
        out = []
        for h in hs:
            if h is None or len(h) == 0:
                out.append([0] * num_hashes)
                continue
            hv = np.asarray(h, dtype=np.int64)  # values < 2^32
            fam = (hv[:, None] * a_consts[None, :] + b_consts[None, :]) & 0xFFFFFFFF
            out.append([int(x) for x in fam.min(axis=0)])
        return pd.Series(out)

    return hashed.select(F.col(id_col), _minima(F.col("__h")).alias(out_col))


def minhash_lsh_candidates(
    signatures: DataFrame,
    id_col: str,
    *,
    sig_col: str = "minhash",
    bands: int = 16,
    est_threshold: float | None = None,
    max_bucket_size: int | None = None,
    num_hashes: int | None = None,
    with_estimate: bool = True,
) -> DataFrame:
    """Candidate duplicate pairs ``(id_a, id_b, est_jaccard)``, id_a < id_b.

    Band hash = xxhash64 of the band's signature slice; pairs sharing ≥1
    band bucket become candidates (self-join on the bucket id — a hash
    join). ``est_jaccard`` = fraction of agreeing minhashes.

    ``num_hashes``: pass the known signature width to skip the one-row
    probe job that otherwise derives it from the data.

    ``with_estimate=False`` returns bare ``(id_a, id_b)`` pairs and skips
    the two signature re-attach joins that compute ``est_jaccard`` — the
    right shape when an exact verify stage follows anyway (the estimate
    only pays for itself when it prunes a large candidate fraction, e.g.
    wide-band configs on low-similarity corpora). It also makes
    ``signatures`` a single-consumer input, so the caller needs no
    cache/persist on it.

    ``max_bucket_size`` drops buckets with more members before the
    self-join — a bucket of m docs emits m² pairs, so one boilerplate/spam
    cluster can dominate the whole job on low-entropy corpora. Oversized
    buckets are near-duplicate *families*, better handled by the exact
    dedup path; true pairs in a dropped bucket still surface through
    their other bands."""
    if num_hashes is None:
        n_row = signatures.select(F.size(sig_col).alias("n")).first()
        num_hashes = int(n_row["n"])
    assert num_hashes % bands == 0, "bands must divide num_hashes"
    assert with_estimate or est_threshold is None, (
        "est_threshold requires with_estimate=True"
    )
    rows = num_hashes // bands

    # The bucket self-join moves ONLY (id, bucket) — never the signature
    # arrays: exploding a wide row bands× before a shuffle multiplies the
    # shuffle bytes by bands. Signatures are re-attached afterwards by id
    # (a narrow hash join against the original frame).
    banded = signatures.select(
        F.col(id_col),
        F.explode(
            F.array(
                *[
                    F.xxhash64(F.slice(F.col(sig_col), b * rows + 1, rows), F.lit(b)).alias("h")
                    for b in range(bands)
                ]
            )
        ).alias("__bucket"),
    )
    if max_bucket_size is not None:
        w = Window.partitionBy("__bucket")
        banded = (
            banded.withColumn("__bsize", F.count("*").over(w))
            .filter(F.col("__bsize") <= max_bucket_size)
            .drop("__bsize")
        )
    a = banded.select(F.col(id_col).alias("id_a"), "__bucket")
    b = banded.select(F.col(id_col).alias("id_b"), "__bucket")
    pairs = (
        a.join(b, on="__bucket")
        .filter(F.col("id_a") < F.col("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )
    if not with_estimate:
        return pairs.select("id_a", "id_b")
    sig_a = signatures.select(F.col(id_col).alias("id_a"), F.col(sig_col).alias("__sig_a"))
    sig_b = signatures.select(F.col(id_col).alias("id_b"), F.col(sig_col).alias("__sig_b"))
    agree = F.size(
        F.filter(
            F.zip_with(F.col("__sig_a"), F.col("__sig_b"), lambda x, y: x == y),
            lambda eq: eq,
        )
    )
    out = (
        pairs.join(sig_a, "id_a")
        .join(sig_b, "id_b")
        .select(
            "id_a",
            "id_b",
            F.round(agree.cast("double") / F.lit(float(num_hashes)), 6).alias("est_jaccard"),
        )
    )
    if est_threshold is not None:
        out = out.filter(F.col("est_jaccard") >= est_threshold)
    return out


# ---------------------------------------------------------------------------
# exact n-gram Jaccard (verification primitive)
# ---------------------------------------------------------------------------

def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str | None,
    *,
    shingle_n: int = 1,
    threshold: float = 0.8,
    candidates: DataFrame | None = None,
    shingle_col: str | None = None,
) -> DataFrame:
    """Exact Jaccard over distinct word n-gram sets → pairs ≥ threshold.

    With ``candidates`` (id_a, id_b) given — e.g. from MinHash LSH — each
    candidate pair is scored directly with ``array_intersect`` on the two
    shingle sets (two hash joins on doc id, no explode; work is O(pairs)).
    Otherwise all pairs sharing ≥1 shingle are considered (explode +
    self-join on the shingle — still a hash join, with frequency-skewed
    shingles the known hot spot; salting hook: filter ultra-common shingles
    first).

    ``shingle_col``: precomputed shingle-array column on ``df`` (skips
    shingling here; pair with ``minhash_signatures(shingle_col=...)`` to
    compute shingles once for the whole candidates+verify pipeline)."""
    if shingle_col is not None:
        sets_src = df.select(F.col(id_col), F.col(shingle_col).alias("__sh"))
    else:
        sets_src = df.select(
            F.col(id_col), word_shingles(text_col, shingle_n).alias("__sh")
        )
    if candidates is not None:
        sets = sets_src
        sa = sets.select(F.col(id_col).alias("id_a"), F.col("__sh").alias("__sha"))
        sb = sets.select(F.col(id_col).alias("id_b"), F.col("__sh").alias("__shb"))
        inter = F.size(F.array_intersect("__sha", "__shb"))
        union = F.size("__sha") + F.size("__shb") - inter
        return (
            candidates.select("id_a", "id_b")
            .join(sa, "id_a")
            .join(sb, "id_b")
            .select(
                "id_a",
                "id_b",
                F.round(inter.cast("double") / union.cast("double"), 6).alias("jaccard"),
            )
            .filter(F.col("jaccard") >= threshold)
        )

    sets = sets_src.select(F.col(id_col), F.explode("__sh").alias("__shingle"))
    sizes = sets.groupBy(id_col).agg(F.count("*").alias("__n"))

    a = sets.select(F.col(id_col).alias("id_a"), "__shingle")
    b = sets.select(F.col(id_col).alias("id_b"), "__shingle")
    inter = (
        a.join(b, on="__shingle")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("__inter"))
    )
    na = sizes.select(F.col(id_col).alias("id_a"), F.col("__n").alias("__na"))
    nb = sizes.select(F.col(id_col).alias("id_b"), F.col("__n").alias("__nb"))
    return (
        inter.join(na, "id_a")
        .join(nb, "id_b")
        .select(
            "id_a",
            "id_b",
            F.round(
                F.col("__inter").cast("double")
                / (F.col("__na") + F.col("__nb") - F.col("__inter")).cast("double"),
                6,
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


# ---------------------------------------------------------------------------
# repeated-span removal (substring-level dedup)
# ---------------------------------------------------------------------------

def repeated_span_removal(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    n: int = 5,
    min_count: int = 2,
) -> DataFrame:
    """Cut corpus-repeated word spans OUT of each document (Lee et al.,
    "Deduplicating Training Data Makes Language Models Better" — the
    substring-level dedup the doc-level strategies above cannot express:
    a boilerplate paragraph pasted into a thousand otherwise-distinct
    pages survives every whole-doc dedup, and it is exactly what a
    language model memorizes).

    Semantics (word-granularity approximation of the paper's
    suffix-array pass): a word ``n``-gram occurring ``min_count``+ times
    across the corpus (within-doc repeats count — matching the
    suffix-array view of the corpus as one string) marks ALL ``n`` of
    its word positions at EVERY occurrence; a document's cleaned text is
    its uncovered words, original order preserved. Docs shorter than
    ``n`` words have no grams and pass through untouched.

    Returns ``(id_col, n_words, n_kept, n_removed, removed_frac,
    cleaned_text)`` — one row per input doc (fully-duplicated docs keep
    a row with ``cleaned_text = ''``).

    Plan shape at 100 TB: gram-keyed exchanges for the occurrence count
    and the duplicated-gram semi-join (token-scale rows of
    ``(gram, pos)`` — never doc pairs, never an all-pairs product);
    covered positions reach the word table through a ``(doc, pos)``
    anti-join whose right side needs NO distinct (anti-join ignores
    multiplicity); the cleaned text rebuilds with an in-row
    ``array_sort`` over collected ``(pos, word)`` structs — one groupBy,
    no window over the corpus."""
    from confluent_kafka_vector_search_prompt_inference_spark.persist import track

    base = track(span_tokenized(df, id_col, text_col))
    occ = track(gram_occurrences(base, n))
    dup = (
        occ.groupBy("__s")
        .agg(F.count("*").alias("__cnt"))
        .filter(F.col("__cnt") >= min_count)
        .select("__s")
    )
    return span_clean(base, occ, dup, id_col, n=n)


def span_tokenized(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    num_partitions: int | None = None,
) -> DataFrame:
    """``(__id, __toks)`` staging projection for the span-removal family —
    tokenized once, hash-spread so the gram explode parallelizes even
    when the input arrives as one split (small-SF parquet, micro-batch).

    ``num_partitions=None`` sizes the spread as ``max(32,
    spark.sql.shuffle.partitions)``: a floor of 32 keeps small inputs
    from funneling the explode through a handful of tasks, and on a real
    cluster — where shuffle.partitions is sized to the executor fleet —
    the spread follows it instead of capping a 100 TB corpus' gram
    explode (and every downstream span-removal exchange) at a fixed 32
    tasks. Explicit values win for callers that know their input
    (micro-batch lanes pass their batch-sized count)."""
    if num_partitions is None:
        num_partitions = max(
            32, int(df.sparkSession.conf.get("spark.sql.shuffle.partitions"))
        )
    return df.select(
        F.col(id_col).alias("__id"), word_tokens(text_col).alias("__toks")
    ).repartition(num_partitions, "__id")


def gram_occurrences(base: DataFrame, n: int) -> DataFrame:
    """Every word ``n``-gram occurrence ``(__id, __pos, __s)`` of a
    :func:`span_tokenized` projection. Gram start positions are 0-based;
    ``slice()`` is 1-based, so gram ``i-1`` covers 0-based word positions
    ``[i-1, i+n-2]`` — exactly what ``posexplode`` reports for the words
    themselves. Docs shorter than ``n`` words yield no rows."""
    return base.select(
        "__id",
        F.posexplode(
            F.when(
                F.size("__toks") >= n,
                F.transform(
                    F.sequence(F.lit(1), F.greatest(F.size("__toks") - (n - 1), F.lit(1))),
                    lambda i: F.concat_ws(" ", F.slice("__toks", i, n)),
                ),
            ).otherwise(F.array().cast("array<string>"))
        ).alias("__pos", "__s"),
    )


def span_clean(
    base: DataFrame,
    occ: DataFrame,
    dup_grams: DataFrame,
    id_col: str,
    *,
    n: int = 5,
) -> DataFrame:
    """Cut every occurrence of the given duplicated grams out of the
    tokenized docs — the shared rebuild half of the span-removal family
    (batch: corpus-internal dup set; streaming: landed-history ∪
    within-batch). ``dup_grams`` is a one-column ``__s`` DataFrame; the
    coverage anti-join's right side needs no distinct (anti-join ignores
    multiplicity), and the cleaned text rebuilds with an in-row
    ``array_sort`` over collected ``(pos, word)`` structs — one groupBy,
    no corpus-wide window."""
    covered = (
        occ.join(dup_grams.select("__s"), "__s", "left_semi")
        .select("__id", F.explode(F.sequence("__pos", F.col("__pos") + (n - 1))).alias("__wpos"))
    )
    words = base.select("__id", F.posexplode("__toks").alias("__wpos", "__w"))
    kept = words.join(covered, ["__id", "__wpos"], "left_anti")
    agg = kept.groupBy("__id").agg(
        F.count("*").alias("__n_kept"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("__wpos", "__w"))),
                lambda s: s["__w"],
            ),
            " ",
        ).alias("cleaned_text"),
    )
    return (
        base.select("__id", F.size("__toks").cast("bigint").alias("n_words"))
        .join(agg, "__id", "left")
        .select(
            F.col("__id").alias(id_col),
            "n_words",
            F.coalesce("__n_kept", F.lit(0)).cast("bigint").alias("n_kept"),
            (F.col("n_words") - F.coalesce("__n_kept", F.lit(0))).cast("bigint").alias("n_removed"),
            F.round(
                (F.col("n_words") - F.coalesce("__n_kept", F.lit(0))).cast("double")
                / F.col("n_words").cast("double"),
                6,
            ).alias("removed_frac"),
            F.coalesce("cleaned_text", F.lit("")).alias("cleaned_text"),
        )
    )


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

def simhash_signatures(
    df: DataFrame, id_col: str, text_col: str, *, out_col: str = "simhash"
) -> DataFrame:
    """64-bit SimHash of the whitespace tokens (Arrow-batched UDF).

    Token hashing + bit voting is a tight NumPy loop per batch; the output
    is one BIGINT per doc, so everything downstream (banding, Hamming
    verify) is JVM-side."""
    tokens = word_tokens(text_col)

    @F.pandas_udf(LongType())
    def _simhash(tok_lists: pd.Series) -> pd.Series:
        out = np.empty(len(tok_lists), dtype=np.int64)
        shifts = np.arange(64, dtype=np.uint64)
        for i, toks in enumerate(tok_lists):
            if toks is None or len(toks) == 0:
                out[i] = 0
                continue
            hs = np.array(
                [np.uint64(int.from_bytes(__import__("hashlib").blake2b(
                    t.encode(), digest_size=8).digest(), "big")) for t in toks],
                dtype=np.uint64,
            )
            bits = ((hs[:, None] >> shifts[None, :]) & np.uint64(1)).astype(np.int64)
            votes = (2 * bits - 1).sum(axis=0)
            word = np.uint64(0)
            for j in np.nonzero(votes > 0)[0]:
                word |= np.uint64(1) << np.uint64(j)
            out[i] = np.int64(word)
        return pd.Series(out)

    return df.select(F.col(id_col), _simhash(tokens).alias(out_col))


def simhash_near_duplicates(
    signatures: DataFrame,
    id_col: str,
    *,
    sig_col: str = "simhash",
    max_hamming: int = 3,
    bands: int = 4,
) -> DataFrame:
    """Pairs with Hamming distance ≤ ``max_hamming``.

    Pigeonhole bucketing: split the 64-bit signature into ``bands`` chunks;
    any pair within distance ``bands-1`` shares ≥1 exact chunk, so a bucket
    join finds all of them. Verify with JVM ``bit_count(a ^ b)``."""
    width = 64 // bands
    mask = (1 << width) - 1
    chunks = F.array(
        *[
            ((F.shiftrightunsigned(F.col(sig_col), b * width)).bitwiseAND(F.lit(mask)) * bands + b)
            for b in range(bands)
        ]
    )
    banded = signatures.select(
        F.col(id_col), F.col(sig_col), F.explode(chunks).alias("__bucket")
    )
    a = banded.select(F.col(id_col).alias("id_a"), F.col(sig_col).alias("__sa"), "__bucket")
    b = banded.select(F.col(id_col).alias("id_b"), F.col(sig_col).alias("__sb"), "__bucket")
    return (
        a.join(b, on="__bucket")
        .filter(F.col("id_a") < F.col("id_b"))
        .dropDuplicates(["id_a", "id_b"])
        .select(
            "id_a",
            "id_b",
            F.bit_count(F.col("__sa").bitwiseXOR(F.col("__sb"))).alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
    )


# ---------------------------------------------------------------------------
# embedding-cosine near-dup
# ---------------------------------------------------------------------------

def embedding_near_duplicates(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    *,
    threshold: float = 0.95,
    method: str = "exact",
    bands: int = 8,
    rows_per_band: int = 6,
    seed: int = 42,
) -> DataFrame:
    """Pairs ``(id_a, id_b, cosine)`` with cosine ≥ threshold, id_a < id_b.

    ``exact`` broadcasts the (ids, float32 matrix) once and scores each
    partition's rows against it with one float64 NumPy matmul — the same
    precision ladder as the top-k join (fine to ~1e5 rows / use within a
    blocking key; a per-pair Catalyst cosine on a crossJoin evaluates the
    array expression O(n²) times and is ~50× slower at 5k rows). ``lsh``
    buckets by SRP signature first so only colliding pairs are scored —
    the 100 TB path."""
    a = df.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("__va"))
    b = df.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("__vb"))
    if method == "exact":
        from pyspark.sql.types import DoubleType, StructField, StructType

        from confluent_kafka_vector_search_prompt_inference_spark.operators.topk_join import _collect_matrix

        spark = df.sparkSession
        # NULL / wrong-dimension vectors scored NULL (and were filtered) in
        # the per-pair expression form; the matmul form must not crash on
        # them — drop them up front on BOTH sides instead (dim = first
        # non-null row's length; a one-partition probe job)
        probe = (
            df.filter(F.col(vec_col).isNotNull())
            .select(F.size(vec_col).alias("__d"))
            .first()
        )
        if probe is None:
            df = df.limit(0)
        else:
            df = df.filter(
                F.col(vec_col).isNotNull() & (F.size(vec_col) == probe["__d"])
            )
        c_ids, c_mat = _collect_matrix(df, id_col, vec_col)
        c_norm = np.linalg.norm(c_mat.astype(np.float64), axis=1)
        c_norm[c_norm == 0] = 1.0
        bc = spark.sparkContext.broadcast((c_ids, c_mat, c_norm))
        out_schema = StructType(
            [
                StructField("id_a", df.schema[id_col].dataType),
                StructField("id_b", df.schema[id_col].dataType),
                StructField("cosine", DoubleType()),
            ]
        )

        def score(batches):
            ids, mat, norms = bc.value
            if mat.size == 0:
                return
            matT = mat.T.astype(np.float64)
            for pdf in batches:
                if pdf.empty:
                    continue
                S = np.asarray(
                    [np.asarray(v, dtype=np.float64) for v in pdf[vec_col]]
                )
                s_norm = np.linalg.norm(S, axis=1)
                s_norm[s_norm == 0] = 1.0
                cos = np.round((S @ matT) / s_norm[:, None] / norms[None, :], 6)
                s_ids = pdf[id_col].to_numpy()
                # ordered pairs only (id_a < id_b) and above threshold
                keep = (cos >= threshold) & (s_ids[:, None] < ids[None, :])
                ra, rb = np.nonzero(keep)
                if len(ra):
                    yield pd.DataFrame(
                        {
                            "id_a": s_ids[ra],
                            "id_b": ids[rb],
                            "cosine": cos[ra, rb],
                        }
                    )

        return df.select(id_col, vec_col).mapInPandas(score, out_schema)
    elif method == "lsh":
        from confluent_kafka_vector_search_prompt_inference_spark.operators.ann import srp_band_hashes

        dim = int(df.select(F.size(vec_col).alias("d")).first()["d"])
        hashed = srp_band_hashes(
            df.select(id_col, vec_col), vec_col,
            dim=dim, bands=bands, rows_per_band=rows_per_band, seed=seed,
        ).select(F.col(id_col), F.col(vec_col), F.explode("band_hashes").alias("__bucket"))
        ha = hashed.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("__va"), "__bucket")
        hb = hashed.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("__vb"), "__bucket")
        pairs = (
            ha.join(hb, on="__bucket")
            .filter(F.col("id_a") < F.col("id_b"))
            .dropDuplicates(["id_a", "id_b"])
        )
    else:
        raise ValueError(f"unknown method {method!r}")
    return pairs.select(
        "id_a",
        "id_b",
        F.round(vec_cosine(F.col("__va"), F.col("__vb")), 6).alias("cosine"),
    ).filter(F.col("cosine") >= threshold)


def semantic_dropped_ids(
    indexed: DataFrame,
    id_col: str,
    vec_col: str,
    *,
    threshold: float,
    cluster_col: str = "cluster",
    block: int = 2048,
) -> DataFrame:
    """Within-cluster near-duplicate ids: for each cluster, every row that
    has a cosine ≥ threshold partner with a SMALLER id (the SemDeDup drop
    set). One ``groupBy(cluster).applyInPandas`` — the O(|cluster|²·d)
    pair work runs as blocked float64 BLAS matmuls on the executor that
    owns the cluster, never as exploded join rows: a 25k-row cluster is
    ~3·10⁸ pairs, which is one second of matmul but minutes (and a
    shuffle of pair-rows carrying vectors twice) as a Catalyst
    self-join. ``block`` bounds the similarity-matrix memory to
    block × |cluster| doubles. Cosine is rounded HALF_UP to 6 decimals,
    matching Spark's ``round`` so results are engine-exact."""
    import numpy as np
    import pandas as pd

    id_type = indexed.schema[id_col].dataType.simpleString()

    def _dropped(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(id_col).reset_index(drop=True)
        V = np.asarray([np.asarray(v, dtype=np.float64) for v in pdf[vec_col]])
        n = len(pdf)
        if n < 2:
            return pd.DataFrame({id_col: pdf[id_col][:0]})
        norms = np.linalg.norm(V, axis=1)
        norms[norms == 0.0] = 1.0
        U = V / norms[:, None]
        dropped = np.zeros(n, dtype=bool)
        for jlo in range(1, n, block):
            jhi = min(jlo + block, n)
            hit = np.zeros(jhi - jlo, dtype=bool)
            for ilo in range(0, jhi, block):
                ihi = min(ilo + block, jhi)
                sim = U[jlo:jhi] @ U[ilo:ihi].T  # (jblock, iblock)
                # Spark ROUND is half-up (away from zero)
                sim = np.sign(sim) * np.floor(np.abs(sim) * 1e6 + 0.5) / 1e6
                jj = np.arange(jlo, jhi)[:, None]
                ii = np.arange(ilo, ihi)[None, :]
                hit |= ((sim >= threshold) & (ii < jj)).any(axis=1)
            dropped[jlo:jhi] = hit
        return pd.DataFrame({id_col: pdf[id_col][dropped]})

    return indexed.select(cluster_col, id_col, vec_col).groupBy(cluster_col).applyInPandas(
        _dropped, schema=f"{id_col} {id_type}"
    )


def semantic_dedup(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    *,
    threshold: float = 0.95,
    n_clusters: int | None = None,
    target_cluster_rows: int = 1024,
    seed: int = 42,
) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023): k-means
    the embedding corpus into clusters, score cosine pairs ONLY within
    each cluster, and greedily drop every row whose cluster contains a
    near-duplicate (cosine ≥ threshold) with a smaller id.

    Returns the surviving rows with their ``cluster`` column attached.

    Scale design, two levers (both found empirically by SCALECHECK —
    a fixed-k variant scaled quadratically past sf1):

    - ``n_clusters`` defaults to corpus_rows / target_cluster_rows
      (one count job), so cluster size — and with it the Σ|cluster|²
      pair budget — stays CONSTANT as the corpus grows: total pair work
      is n · target_cluster_rows, i.e. linear in n. A fixed k silently
      degenerates to O(n²/k).
    - Pair scoring runs as blocked BLAS inside the cluster's executor
      (:func:`semantic_dropped_ids`), never as a Catalyst self-join
      exploding |cluster|² rows that carry the vectors twice.

    At 100 TB, ``cluster`` doubles as the physical partition key (same
    layout the IVF index uses) so the group stage reads partition-local.
    Greedy min-id pruning matches connected-components resolution on
    duplicate cliques and is the standard SemDeDup policy; use
    :func:`~confluent_kafka_vector_search_prompt_inference_spark.operators.components.dedup_clusters` when
    chain-transitive resolution is required.
    """
    from confluent_kafka_vector_search_prompt_inference_spark.operators.ivf import build_ivf_index

    if n_clusters is None:
        n = df.count()
        n_clusters = max(4, min(65_536, -(-n // target_cluster_rows)))
    indexed, _ = build_ivf_index(
        df, vec_col, n_clusters=n_clusters, seed=seed, cluster_col="cluster"
    )
    dropped = semantic_dropped_ids(
        indexed, id_col, vec_col, threshold=threshold
    )
    return indexed.join(dropped, id_col, "left_anti")


# ---------------------------------------------------------------------------
# Content-defined chunking (CDC) — the storage-dedup modality: chunk
# boundaries are picked by the CONTENT (a gear rolling hash hitting a mask),
# not by position, so an insertion early in a document shifts only the one
# chunk it lands in; every later chunk re-aligns and its hash still matches
# the store. Fixed-size chunking loses all alignment after one edit; this is
# why every dedup store (restic/borg/LBFS-lineage) chunks by content. In an
# LLM-corpus pipeline CDC chunk hashes approximate exact-substring dedup at
# sub-document granularity: shared boilerplate between revisions collapses
# to shared chunk fingerprints.
# ---------------------------------------------------------------------------

_GEAR_SEED = 0x9E3779B97F4A7C15


def _gear_table() -> list[int]:
    """256 deterministic 64-bit gear values (splitmix64 over the byte)."""
    out = []
    for b in range(256):
        z = (b * _GEAR_SEED + 0x632BE59BD9B4E019) & 0xFFFFFFFFFFFFFFFF
        z = ((z ^ (z >> 30)) * 0xBF58476D1CE4E5B9) & 0xFFFFFFFFFFFFFFFF
        z = ((z ^ (z >> 27)) * 0x94D049BB133111EB) & 0xFFFFFFFFFFFFFFFF
        out.append(z ^ (z >> 31))
    return out


def cdc_chunks(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    *,
    mask_bits: int = 6,
    min_len: int = 16,
    max_len: int = 256,
) -> DataFrame:
    """Content-defined chunks of each document's UTF-8 text.

    Returns ``(id, chunk_no, start, length, chunk_hash)`` where a
    boundary is declared when the gear hash's low ``mask_bits`` bits are
    zero (expected chunk length 2^mask_bits), clamped to
    [min_len, max_len]. The rolling hash is inherently sequential per
    document, so this is an Arrow-batched ``mapInPandas`` (one pass per
    document, no shuffle at all — the embarrassingly-parallel shape);
    chunk hashes are md5 of the chunk bytes, so identical substrings
    anywhere in the corpus produce identical fingerprints for the
    downstream exact-dedup groupBy.
    """
    import hashlib

    import pandas as pd

    from pyspark.sql.types import (
        IntegerType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    gear = _gear_table()
    mask = (1 << mask_bits) - 1
    id_field = docs.schema[id_col].dataType
    schema = StructType(
        [
            StructField("id", id_field),
            StructField("chunk_no", IntegerType()),
            StructField("start", LongType()),
            StructField("length", LongType()),
            StructField("chunk_hash", StringType()),
        ]
    )

    def chunk_one(text: str):
        data = text.encode("utf-8")
        n = len(data)
        chunks = []
        start = 0
        h = 0
        i = 0
        while i < n:
            h = ((h << 1) + gear[data[i]]) & 0xFFFFFFFFFFFFFFFF
            length = i - start + 1
            if (length >= min_len and (h & mask) == 0) or length >= max_len or i == n - 1:
                chunks.append((start, length, hashlib.md5(data[start : i + 1]).hexdigest()))
                start = i + 1
                h = 0
            i += 1
        return chunks

    def run(batches):
        for pdf in batches:
            ids, nos, starts, lens, hashes = [], [], [], [], []
            for rid, text in zip(pdf[id_col], pdf[text_col]):
                for no, (s, ln, hx) in enumerate(chunk_one(text or "")):
                    ids.append(rid)
                    nos.append(no)
                    starts.append(s)
                    lens.append(ln)
                    hashes.append(hx)
            yield pd.DataFrame(
                {
                    "id": ids,
                    "chunk_no": nos,
                    "start": starts,
                    "length": lens,
                    "chunk_hash": hashes,
                }
            )

    return docs.select(id_col, text_col).mapInPandas(run, schema)


def mutual_knn_pairs(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    *,
    k: int = 10,
    metric: str = "cosine",
    strategy: str = "broadcast_corpus",
) -> DataFrame:
    """Reciprocal nearest neighbors: pairs ``(id_a, id_b, score, rank_ab,
    rank_ba)`` where each vector appears in the OTHER's top-k (id_a <
    id_b, self-matches excluded).

    One-directional kNN candidates are asymmetric — a hub vector appears
    in thousands of top-k lists without being near any of them; requiring
    reciprocity is the standard hub-suppression filter for semantic-dedup
    candidate pairs (and the building block of reciprocal-neighbor
    re-ranking in retrieval). Built as ONE top-k similarity join (every
    vector as query, any physical ``strategy`` the scale calls for —
    broadcast / shuffle / LSH / IVF) followed by a self-equi-join of the
    k-bounded result with itself on the swapped key pair: the reciprocity
    check costs O(n·k) rows, never a second scoring pass.
    """
    from confluent_kafka_vector_search_prompt_inference_spark.operators.topk_join import topk_similarity_join

    corpus = df.select(F.col(id_col).alias("cid"), F.col(vec_col).alias("vector"))
    queries = df.select(F.col(id_col).alias("qid"), F.col(vec_col).alias("vector"))
    # k+1 then drop self-matches: a vector is always its own top-1
    topk = topk_similarity_join(
        queries, corpus, k=k + 1,
        query_id="qid", query_vec="vector",
        corpus_id="cid", corpus_vec="vector",
        metric=metric, strategy=strategy,
    ).filter(F.col("qid") != F.col("cid"))
    # JVM round-6 BEFORE re-ranking: the NumPy strategies emit raw
    # doubles, and ranking on rounded scores (ties → ascending id) is the
    # cross-engine-reproducible contract every vec oracle pins.
    topk = topk.withColumn("score", F.round("score", 6))
    w = Window.partitionBy("qid").orderBy(F.desc("score"), F.asc("cid"))
    topk = (
        topk.withColumn("nn_rank", F.row_number().over(w).cast("int"))
        .filter(F.col("nn_rank") <= k)
        .select("qid", "cid", "score", "nn_rank")
    )
    fwd = topk.select(
        F.col("qid").alias("id_a"), F.col("cid").alias("id_b"),
        F.col("score").alias("score"), F.col("nn_rank").alias("rank_ab"),
    ).filter(F.col("id_a") < F.col("id_b"))
    rev = topk.select(
        F.col("cid").alias("id_a"), F.col("qid").alias("id_b"),
        F.col("nn_rank").alias("rank_ba"),
    ).filter(F.col("id_a") < F.col("id_b"))
    return fwd.join(rev, ["id_a", "id_b"]).select(
        "id_a", "id_b", "score", "rank_ab", "rank_ba"
    )
