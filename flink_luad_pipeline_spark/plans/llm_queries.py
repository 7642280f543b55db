"""LLM-training-data-pipeline queries over documents/embeddings.

Beyond the reference's surface (north-star brief): dedup (exact /
MinHash-LSH / SimHash / exact n-gram Jaccard), similarity search
(brute-force + LSH-bucketed cosine top-k), text analysis (token count,
quality, language ID, fingerprint), multimodal binary plumbing.

Because the synthetic corpus has no duplicates, dedup queries plant
them deterministically: an augmented view unions mutated copies of a
slice of the corpus — the identical augmentation is expressed in the
DuckDB oracle, so the checks stay exact.
"""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from ..catalog import load
from ..functions import text as T
from ..operators import dedup, multimodal, similarity
from ..operators.io import write_frames
from .registry import query

# ---------------------------------------------------------------------------
# Text analysis
# ---------------------------------------------------------------------------

_TOKENS_SQL = "list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '')"
_EN = "['the','and','of','to','a','in','is','that','it','for']"
_DE = "['der','die','und','das','ist','nicht','ein','mit','zu','den']"
_FR = "['le','la','et','les','des','un','une','est','pour','que']"
_HITS = "len(list_filter(tokens, x -> list_contains({words}, x)))"


@query(
    "ll1_text_stats",
    oracle=(
        f"WITH tok AS (SELECT doc_id, text, {_TOKENS_SQL} AS tokens FROM documents)"
        " SELECT doc_id,"
        " CAST(len(tokens) AS INT) AS n_tokens,"
        " CAST(length(text) AS INT) AS n_chars,"
        " CAST(CAST(round(CASE WHEN length(text) = 0 THEN NULL ELSE"
        "   length(regexp_replace(text, '[^.,;:!?]', '', 'g')) * 1.0 / length(text)"
        "   END, 6) AS DECIMAL(18,6)) AS DOUBLE) AS punct_ratio,"
        f" CAST(CAST(round(CASE WHEN len(tokens) = 0 THEN NULL ELSE"
        f"   {_HITS.format(words=_EN)} * 1.0 / len(tokens) END, 6)"
        "   AS DECIMAL(18,6)) AS DOUBLE) AS stop_ratio,"
        " CAST(CAST(round(CASE WHEN len(tokens) = 0 THEN NULL ELSE"
        "   list_sum(list_transform(tokens, x -> length(x))) * 1.0 / len(tokens)"
        "   END, 6) AS DECIMAL(18,6)) AS DOUBLE) AS mean_token_len,"
        " CAST(CAST(round("
        "   least(len(tokens) / 100.0, 1.0) * 0.4"
        f"  + coalesce(CASE WHEN len(tokens) = 0 THEN NULL ELSE"
        f"    {_HITS.format(words=_EN)} * 1.0 / len(tokens) END, 0.0) * 0.4"
        "   + (1.0 - least(coalesce(CASE WHEN length(text) = 0 THEN NULL ELSE"
        "     length(regexp_replace(text, '[^.,;:!?]', '', 'g')) * 1.0 /"
        "     length(text) END, 1.0) * 5.0, 1.0)) * 0.2"
        " , 6) AS DECIMAL(18,6)) AS DOUBLE) AS quality_score"
        " FROM tok"
    ),
)
def ll1_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting + quality scoring (length/punct/stopword ratios),
    all JVM-side column functions."""
    docs = load(spark, sf_dir, "documents")
    tokens = T.tokenize(F.col("text"))
    q = T.quality_features(F.col("text"), tokens)

    def d6(c):
        return F.round(c, 6).cast("decimal(18,6)")

    return docs.select(
        "doc_id",
        q["n_tokens"].alias("n_tokens"),
        q["n_chars"].alias("n_chars"),
        d6(q["punct_ratio"]).alias("punct_ratio"),
        d6(q["stop_ratio"]).alias("stop_ratio"),
        d6(q["mean_token_len"]).alias("mean_token_len"),
        d6(q["quality_score"]).alias("quality_score"),
    )


@query(
    "ll2_lang_id",
    oracle=(
        f"WITH tok AS (SELECT doc_id, {_TOKENS_SQL} AS tokens FROM documents),"
        f" hits AS (SELECT doc_id, CAST({_HITS.format(words=_EN)} AS INT) AS en_hits,"
        f" CAST({_HITS.format(words=_DE)} AS INT) AS de_hits,"
        f" CAST({_HITS.format(words=_FR)} AS INT) AS fr_hits FROM tok)"
        " SELECT doc_id, en_hits, de_hits, fr_hits,"
        " CASE WHEN greatest(en_hits, de_hits, fr_hits) = 0 THEN 'und'"
        " WHEN en_hits = greatest(en_hits, de_hits, fr_hits) THEN 'en'"
        " WHEN de_hits = greatest(en_hits, de_hits, fr_hits) THEN 'de'"
        " ELSE 'fr' END AS lang_pred FROM hits"
    ),
)
def ll2_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language ID via stopword-hit heuristic (n-gram flavor); ties
    resolve in declaration order (en > de > fr)."""
    docs = load(spark, sf_dir, "documents")
    tokens = T.tokenize(F.col("text"))
    scores = T.lang_scores(tokens)
    return docs.select(
        "doc_id",
        scores["en"].alias("en_hits"),
        scores["de"].alias("de_hits"),
        scores["fr"].alias("fr_hits"),
        T.predict_lang(tokens).alias("lang_pred"),
    )


@query(
    "ll3_fingerprint",
    oracle=(
        "SELECT doc_id,"
        " md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fp"
        " FROM documents"
    ),
)
def ll3_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprint: md5 over normalized text (md5 so the
    oracle computes the identical hash)."""
    return load(spark, sf_dir, "documents").select(
        "doc_id", T.text_fingerprint(F.col("text")).alias("fp")
    )


# ---------------------------------------------------------------------------
# Dedup (with planted duplicates)
# ---------------------------------------------------------------------------

_AUG_SQL = (
    "SELECT doc_id, text FROM documents"
    " UNION ALL SELECT doc_id + 1000000, text FROM documents WHERE doc_id % 10 = 0"
)


_AUG_CACHE: dict = {}


def _augmented(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus ∪ exact copies of every 10th doc (ids shifted +1e6).
    Cached per (applicationId, sf_dir): ll4-ll7 and ll24 all start from
    this frame, so one materialization serves the whole dedup family
    during the driver's sequential correctness sweep. applicationId is
    stable for a live session and never aliases across stop/recreate
    (unlike id(spark)), so a cached frame can't outlive its session.

    Under the bench harness (SPARK_GRAFT_NO_CACHE=1) the cache is
    bypassed entirely so timed runs exercise the real parquet scan —
    the stated end-to-end protocol — rather than an in-memory table
    warmed by a previous headline query."""
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    copies = docs.where(F.col("doc_id") % 10 == 0).select(
        (F.col("doc_id") + 1000000).alias("doc_id"), "text"
    )
    aug = docs.unionAll(copies)
    if os.environ.get("SPARK_GRAFT_NO_CACHE"):
        return aug
    key = (spark.sparkContext.applicationId, sf_dir)
    if key not in _AUG_CACHE:
        _AUG_CACHE[key] = aug.cache()
    return _AUG_CACHE[key]


@query(
    "ll4_dedup_exact",
    oracle=(
        f"WITH aug AS ({_AUG_SQL}),"
        " fps AS (SELECT doc_id,"
        " md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fp FROM aug)"
        " SELECT fp, min(doc_id) AS keeper, count(*) AS n_docs"
        " FROM fps GROUP BY fp HAVING count(*) >= 2"
    ),
)
def ll4_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: hash-groupBy on normalized-text md5; keeper = min
    doc_id per group. One shuffle on a 128-bit key at any scale."""
    return dedup.exact_duplicates(_augmented(spark, sf_dir), "doc_id", "text")


_JACCARD_ORACLE = (
    f"WITH aug AS ({_AUG_SQL}),"
    f" tok AS (SELECT doc_id, {_TOKENS_SQL} AS tokens FROM aug),"
    " sh AS (SELECT doc_id, list_distinct(CASE WHEN len(tokens) >= 3 THEN"
    "   list_transform(range(1, len(tokens) - 1),"
    "     i -> tokens[i] || ' ' || tokens[i+1] || ' ' || tokens[i+2])"
    "   ELSE [] END) AS shingles FROM tok),"
    " nz AS (SELECT doc_id, shingles, len(shingles) AS n_sh FROM sh"
    "   WHERE len(shingles) > 0),"
    " inv AS (SELECT doc_id, unnest(shingles) AS shingle FROM nz),"
    " inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS i"
    "   FROM inv a JOIN inv b ON a.shingle = b.shingle AND a.doc_id < b.doc_id"
    "   GROUP BY a.doc_id, b.doc_id)"
    " SELECT doc_a, doc_b,"
    " CAST(CAST(round(i * 1.0 / (na.n_sh + nb.n_sh - i), 6)"
    "  AS DECIMAL(18,6)) AS DOUBLE) AS jaccard"
    " FROM inter JOIN nz na ON na.doc_id = doc_a JOIN nz nb ON nb.doc_id = doc_b"
    " WHERE i * 1.0 / (na.n_sh + nb.n_sh - i) >= 0.4"
)


@query("ll5_jaccard_pairs", oracle=_JACCARD_ORACLE)
def ll5_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 3-gram Jaccard similarity join (inverted-index shape) at
    threshold 0.4 over the augmented corpus — planted copies give J=1.0
    pairs; organic near-dups may appear below them."""
    pairs = dedup.jaccard_pairs(
        _augmented(spark, sf_dir), "doc_id", "text", k=3, threshold=0.4
    )
    return pairs.select(
        "doc_a",
        "doc_b",
        F.round("jaccard", 6).cast("decimal(18,6)").alias("jaccard"),
    )


_BAND_STR = (
    "array_to_string(list_transform(list_slice(sig, b * 4 + 1, b * 4 + 4),"
    " x -> CAST(x AS VARCHAR)), ',')"
)


def _hex10(expr: str) -> str:
    """DuckDB twin of dedup.portable_hash40: first 10 hex chars of md5
    parsed as a 40-bit integer."""
    return (
        "list_sum(list_transform(range(1, 11), j ->"
        f" CAST(strpos('0123456789abcdef', substr(md5({expr}), j, 1)) - 1"
        " AS BIGINT) * (1::BIGINT << (4 * (10 - j)))))"
    )


def _minhash_ctes_over(
    src_sql: str, max_shingle_df: float | None = 0.5
) -> str:
    # Mirrors minhash_lsh_pairs(..., max_shingle_df=0.5) exactly, incl.
    # the boilerplate df-cutoff: shingles in more than half the corpus
    # are dropped from every document's set BEFORE signatures. Shared
    # CTE prefix (through the candidate pairs + shingle inverted index)
    # between the pair oracle below, ll72's calibration oracle, and the
    # ll94 pipeline stage (``src_sql`` = whatever (doc_id, text)
    # relation the near-dup tier runs over).
    # ``max_shingle_df=None`` removes the cutoff entirely (the CTE and
    # its corpus-count subquery, not just its threshold) — ll100's
    # per-document-artifact grain (ADVICE r9: this used to be a string
    # patch on the emitted SQL in _ll94_ctes, fragile at a distance).
    if max_shingle_df is None:
        cutoff_ctes = " invf AS (SELECT doc_id, shingle FROM inv0),"
    else:
        cutoff_ctes = (
            " keep AS (SELECT shingle FROM inv0 GROUP BY shingle"
            f"   HAVING count(*) <= {max_shingle_df}"
            " * (SELECT count(*) FROM mh_src)),"
            " invf AS (SELECT doc_id, shingle FROM inv0"
            "   WHERE shingle IN (SELECT shingle FROM keep)),"
        )
    return (
    f"WITH mh_src AS ({src_sql}),"
    f" tok AS (SELECT doc_id, {_TOKENS_SQL} AS tokens FROM mh_src),"
    " sh0 AS (SELECT doc_id, list_distinct(CASE WHEN len(tokens) >= 3 THEN"
    "   list_transform(range(1, len(tokens) - 1),"
    "     i -> tokens[i] || ' ' || tokens[i+1] || ' ' || tokens[i+2])"
    "   ELSE [] END) AS shingles FROM tok),"
    " inv0 AS (SELECT doc_id, unnest(shingles) AS shingle FROM sh0"
    "   WHERE len(shingles) > 0),"
    + cutoff_ctes +
    " nz AS (SELECT doc_id, list(shingle) AS shingles,"
    "   count(*) AS n_sh FROM invf GROUP BY doc_id),"
    f" based AS (SELECT doc_id, list_transform(shingles, s -> {_hex10('s')})"
    "   AS base FROM nz),"
    " sigs AS (SELECT doc_id, list_transform(range(0, 64), i ->"
    "   list_min(list_transform(base, h ->"
    f"   ((40503 * i + 12345) * h + 94261 * i + 57) % {dedup.MINHASH_P})))"
    "   AS sig FROM based),"
    " bands AS (SELECT doc_id, b,"
    f" {_hex10(_BAND_STR)} AS bhash"
    "   FROM sigs CROSS JOIN (SELECT unnest(range(0, 16)) AS b) bs),"
    " cand AS (SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b"
    "   FROM bands x JOIN bands y ON x.b = y.b AND x.bhash = y.bhash"
    "   AND x.doc_id < y.doc_id),"
    " inv AS (SELECT doc_id, unnest(shingles) AS shingle FROM nz),"
    )


_MINHASH_CTES = _minhash_ctes_over(_AUG_SQL)


_MINHASH_TAIL = (
    " inter AS (SELECT c.doc_a, c.doc_b, count(*) AS i FROM cand c"
    "   JOIN inv a ON a.doc_id = c.doc_a"
    "   JOIN inv b ON b.doc_id = c.doc_b AND b.shingle = a.shingle"
    "   GROUP BY c.doc_a, c.doc_b)"
    " SELECT doc_a, doc_b,"
    " CAST(CAST(round(i * 1.0 / (na.n_sh + nb.n_sh - i), 6)"
    "  AS DECIMAL(18,6)) AS DOUBLE) AS jaccard"
    " FROM inter JOIN nz na ON na.doc_id = doc_a"
    " JOIN nz nb ON nb.doc_id = doc_b"
    " WHERE i * 1.0 / (na.n_sh + nb.n_sh - i) >= 0.4"
)


def _minhash_oracle_over(
    src_sql: str, max_shingle_df: float | None = 0.5
) -> str:
    """Full minhash+LSH+exact-verify pair oracle over an arbitrary
    (doc_id, text) relation — ll6's machinery, reusable by composed
    pipelines (ll94 stage 3). ``max_shingle_df=None`` drops the
    shingle-df cutoff (ll100's per-document-artifact grain)."""
    return _minhash_ctes_over(src_sql, max_shingle_df) + _MINHASH_TAIL


_MINHASH_ORACLE = _minhash_oracle_over(_AUG_SQL)


@query("ll6_minhash_lsh", oracle=_MINHASH_ORACLE)
def ll6_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash + banded LSH near-dup pairs, exact-verified (J >= 0.4).

    The signature hash is the *portable* md5-derived scheme
    (dedup.portable_hash40 + affine probes mod MINHASH_P), so the full
    approximate pipeline — shingling, 64 minhashes, 16-band LSH
    bucketing, candidate join, exact-Jaccard verification — is
    reproduced verbatim by the DuckDB oracle. Recall vs the exact join
    (ll5) is additionally asserted in tests/test_llm_ops.py."""
    pairs = dedup.minhash_lsh_pairs(
        _augmented(spark, sf_dir), "doc_id", "text", k=3, threshold=0.4,
        max_shingle_df=0.5,
    )
    return pairs.select(
        "doc_a",
        "doc_b",
        F.round("jaccard", 6).cast("decimal(18,6)").alias("jaccard"),
    )


_INCR_DEDUP_ORACLE = (
    # The incremental tier's contract: its per-delta-doc verdicts must
    # equal what the FULL self-join tier (the _MINHASH_ORACLE pair
    # list) implies about pairs touching the delta — so the oracle is
    # literally built on that pair list. Delta = doc_id % 5 = 0 (a 20%
    # "daily batch"); a delta doc is dropped iff it near-dups a
    # snapshot doc or an earlier batch-mate.
    f"WITH p AS ({_MINHASH_ORACLE}),"
    f" aug AS ({_AUG_SQL}),"
    " delta AS (SELECT doc_id FROM aug WHERE doc_id % 5 = 0),"
    " both_dirs AS (SELECT doc_a AS d, doc_b AS o FROM p"
    "  UNION ALL SELECT doc_b AS d, doc_a AS o FROM p),"
    " m AS (SELECT d AS doc_id, min(o) AS dup_of FROM both_dirs"
    "  WHERE d % 5 = 0 AND (o % 5 <> 0 OR o < d) GROUP BY d)"
    " SELECT delta.doc_id, m.dup_of IS NOT NULL AS dropped, m.dup_of"
    " FROM delta LEFT JOIN m USING (doc_id)"
)


@query("ll45_incremental_dedup", oracle=_INCR_DEDUP_ORACLE)
def ll45_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental corpus dedup: the 20% 'daily batch' (doc_id % 5 = 0)
    is deduped against the 80% snapshot AND itself by probing the
    MinHash band index with only the delta's bands — snapshot x
    snapshot candidates are never generated, which is the difference
    between absorbing a batch in O(batch) and re-deduping 100 TB. The
    oracle derives the expected verdicts from the FULL tier's pair
    list, proving the incremental path decides each delta doc exactly
    as a from-scratch dedup would."""
    corpus = _augmented(spark, sf_dir)
    snapshot = corpus.where(F.col("doc_id") % 5 != 0)
    delta = corpus.where(F.col("doc_id") % 5 == 0)
    return dedup.minhash_dedup_incremental(
        snapshot, delta, "doc_id", "text", k=3, threshold=0.4,
        max_shingle_df=0.5,
    )


def _dot6_sql(a: str, b: str) -> str:
    """Rounded-then-exact partial dot: DECIMAL(18,6) of the 6-digit
    rounded inner product (mirrors pq_topk's partial_dots)."""
    return (
        f"CAST(round(list_sum(list_transform(range(1, len({a}) + 1),"
        f" i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE))), 6)"
        " AS DECIMAL(18,6))"
    )


_PQ_ORACLE = (
    # Mirrors similarity.pq_topk(m=4, dim=64, centroid_mod=64): same
    # training-free codebooks, same rounded-DECIMAL partial dots (so
    # the m-term sum is order-free), same tie-breaks. The vec_id <
    # 16384 term is pq_topk's max_codes=256 codebook cap (64·256 —
    # inactive at every tested N, the O(N²/mod) encode-join guard).
    "WITH sp AS (SELECT unnest([0, 1, 2, 3]) AS s),"
    " cb AS (SELECT e.vec_id AS centroid_id, sp.s,"
    "  list_slice(e.embedding, sp.s * 16 + 1, sp.s * 16 + 16) AS cent"
    "  FROM embeddings e, sp WHERE e.vec_id % 64 = 0"
    "   AND e.vec_id < 16384),"
    " csub AS (SELECT e.vec_id AS cand_id, sp.s,"
    "  list_slice(e.embedding, sp.s * 16 + 1, sp.s * 16 + 16) AS sub"
    "  FROM embeddings e, sp),"
    " enc AS (SELECT cand_id, c.s, c.centroid_id,"
    f" {_dot6_sql('sub', 'cent')} AS d"
    "  FROM csub JOIN cb c ON c.s = csub.s),"
    " codes AS (SELECT cand_id, s, centroid_id AS code FROM ("
    "  SELECT cand_id, s, centroid_id, row_number() OVER ("
    "   PARTITION BY cand_id, s ORDER BY d DESC, centroid_id) AS rk"
    "  FROM enc WHERE d IS NOT NULL) WHERE rk = 1),"
    " qsub AS (SELECT e.vec_id AS query_id, sp.s,"
    "  list_slice(e.embedding, sp.s * 16 + 1, sp.s * 16 + 16) AS sub"
    "  FROM embeddings e, sp WHERE e.vec_id < 5),"
    " lut AS (SELECT query_id, c.s, c.centroid_id AS code,"
    f" {_dot6_sql('sub', 'cent')} AS qd"
    "  FROM qsub JOIN cb c ON c.s = qsub.s),"
    " scored AS (SELECT query_id, cand_id,"
    "  CAST(sum(qd) AS DECIMAL(18,6)) AS sim"
    "  FROM codes JOIN lut ON lut.s = codes.s AND lut.code = codes.code"
    "  WHERE query_id <> cand_id AND qd IS NOT NULL GROUP BY 1, 2)"
    " SELECT query_id, cand_id, CAST(sim AS DOUBLE) AS sim, rank FROM ("
    "  SELECT query_id, cand_id, sim, CAST(row_number() OVER ("
    "   PARTITION BY query_id ORDER BY sim DESC, cand_id) AS BIGINT)"
    "   AS rank FROM scored) WHERE rank <= 10"
)


@query("ll49_pq_ann_topk", oracle=_PQ_ORACLE)
def ll49_pq_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization ADC top-10 — the compression tier of the
    ANN family (brute ll8 / hyperplane-LSH ll9 / IVF ll12 / PQ here,
    one output contract): candidates encoded as 4 subspace codes,
    queries scored by summing looked-up partial dots. Deterministic
    codebooks + exact-DECIMAL partials mean the oracle reproduces
    codes, LUT, and ranking — the compression loss itself is
    value-checked, not just shape-checked."""
    emb = load(spark, sf_dir, "embeddings")
    out = similarity.pq_topk(emb.where(F.col("vec_id") < 5), emb, k=10)
    return out.select("query_id", "cand_id", "sim", "rank")


# (ll60 below uses the derived-mod coarse quantizer; ll49 keeps the
# fixed codebook modulus — the codebook table is m·(N/64) rows, linear
# in N by construction, unlike the coarse-cell count.)


_RUNS_ORACLE = (
    # gaps-and-islands twin of the UDTF's single forward pass
    f"WITH tok AS (SELECT doc_id, {_TOKENS_SQL} AS tokens FROM documents),"
    " t2 AS (SELECT doc_id, unnest(tokens) AS token,"
    "  unnest(range(0, len(tokens))) AS pos FROM tok),"
    " m AS (SELECT doc_id, token, pos, CASE WHEN lag(token) OVER ("
    "  PARTITION BY doc_id ORDER BY pos) IS DISTINCT FROM token"
    "  THEN 1 ELSE 0 END AS brk FROM t2),"
    " g AS (SELECT doc_id, token, pos, sum(brk) OVER ("
    "  PARTITION BY doc_id ORDER BY pos) AS run1 FROM m)"
    " SELECT doc_id, CAST(run1 - 1 AS INT) AS run_idx, token,"
    " CAST(count(*) AS INT) AS run_len"
    " FROM g GROUP BY doc_id, run1, token"
)


@query("ll48_token_runs_udtf", oracle=_RUNS_ORACLE)
def ll48_token_runs_udtf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF surface (the table-function slot of SURVEY §2.8,
    next to scalar pandas UDFs and the applyInPandas UDAF/grouped
    slots): run-length encoding of consecutive repeated tokens — a
    genuinely procedural 1->N expansion (single forward pass with
    carried state) registered as a UDTF and invoked through the SQL
    front door with LATERAL correlation. The oracle replays it as
    gaps-and-islands SQL, so the row-generating path is value-checked.
    Role note: this demonstrates the UDTF surface; set-shaped
    expansions in hot paths stay native (explode/posexplode, cf. ll13/
    ll16) — a Python table function is the escape hatch for logic a
    generator expresses better than a window stack."""
    import re

    from pyspark.sql.functions import udtf

    @udtf(returnType="doc_id bigint, run_idx int, token string, run_len int")
    class TokenRuns:
        def eval(self, doc_id, text):
            toks = [
                t for t in re.split(r"[^a-z0-9]+", (text or "").lower()) if t
            ]
            run_idx = -1
            cur = None
            n = 0
            for t in toks:
                if t == cur:
                    n += 1
                    continue
                if cur is not None:
                    yield doc_id, run_idx, cur, n
                run_idx += 1
                cur, n = t, 1
            if cur is not None:
                yield doc_id, run_idx, cur, n

    from ..catalog import register_all

    register_all(spark, sf_dir)
    spark.udtf.register("token_runs", TokenRuns)
    return spark.sql(
        "SELECT t.* FROM documents d,"
        " LATERAL token_runs(d.doc_id, d.text) t"
    )


_UNICODE_ORACLE = (
    # Fixture: every 'a' decomposed to 'a' + U+0301 (combining acute),
    # so NFC has real work (recompose to U+00E1) and accent-stripping
    # has real marks to drop. Lengths and md5s pin both transforms.
    "WITH d AS (SELECT doc_id,"
    " regexp_replace(text, 'a', 'a' || chr(769), 'g') AS raw"
    " FROM documents),"
    " n AS (SELECT doc_id, raw, nfc_normalize(raw) AS nfc FROM d)"
    " SELECT doc_id, CAST(length(raw) AS INT) AS n_raw,"
    " CAST(length(nfc) AS INT) AS n_nfc,"
    " md5(nfc) AS nfc_md5,"
    " md5(strip_accents(nfc)) AS stripped_md5 FROM n"
)


@query("ll47_unicode_normalize", oracle=_UNICODE_ORACLE)
def ll47_unicode_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unicode canonicalization for corpus ingest: NFC normalization
    (decomposed accents recomposed — canonical-equivalent byte
    sequences MUST fingerprint identically or every dedup tier leaks
    duplicates) and accent-stripped match keys. Spark has no built-in
    Unicode normalizer, so this is one of the few legitimate Python
    boundaries in the engine: Arrow-vectorized pandas UDFs over stdlib
    unicodedata, narrow, no shuffle. The fixture decomposes every 'a'
    to 'a'+U+0301, and DuckDB's independent ICU implementations
    (nfc_normalize / strip_accents) must agree on every length and
    md5 — a cross-library conformance check, not a self-test."""
    docs = load(spark, sf_dir, "documents")
    raw = F.regexp_replace(F.col("text"), "a", "á")
    d = docs.select("doc_id", raw.alias("raw"))
    nfc = T.nfc_normalize(F.col("raw"))
    d = d.select("doc_id", "raw", nfc.alias("nfc"))
    return d.select(
        "doc_id",
        F.length("raw").alias("n_raw"),
        F.length("nfc").alias("n_nfc"),
        F.md5("nfc").alias("nfc_md5"),
        F.md5(T.strip_accents(F.col("nfc"))).alias("stripped_md5"),
    )


_WINNOW_ORACLE = (
    # Mirrors dedup.winnowing_fingerprints(k=4, window=4) +
    # winnowing_overlap_pairs(min_shared=2, max_fp_df=50): the
    # rightmost-min window selection is replayed via the identical
    # integer encoding hash*2^21 + (2^20 - pos).
    f"WITH aug AS ({_AUG_SQL}),"
    f" tok AS (SELECT doc_id, {_TOKENS_SQL} AS tokens FROM aug),"
    " g AS (SELECT doc_id, CASE WHEN len(tokens) >= 4 THEN"
    "   list_transform(range(0, len(tokens) - 3), i ->"
    "    tokens[i+1] || ' ' || tokens[i+2] || ' ' || tokens[i+3]"
    "     || ' ' || tokens[i+4]) ELSE [] END AS grams FROM tok),"
    " pg AS (SELECT doc_id, unnest(grams) AS gram,"
    "   unnest(range(0, len(grams))) AS pos FROM g),"
    f" enc AS (SELECT doc_id, pos, {_hex10('gram')} * 2097152"
    "   + (1048576 - pos) AS c FROM pg),"
    " sel AS (SELECT doc_id, pos, min(c) OVER (PARTITION BY doc_id"
    "   ORDER BY pos ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS selc"
    "   FROM enc),"
    " fp AS (SELECT DISTINCT doc_id, selc // 2097152 AS fp_hash"
    "   FROM sel WHERE pos >= 3),"
    " keep AS (SELECT fp_hash FROM fp GROUP BY fp_hash"
    "   HAVING count(*) <= 50),"
    " fpk AS (SELECT doc_id, fp_hash FROM fp"
    "   WHERE fp_hash IN (SELECT fp_hash FROM keep))"
    " SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,"
    " count(*) AS n_shared"
    " FROM fpk a JOIN fpk b ON a.fp_hash = b.fp_hash"
    " AND a.doc_id < b.doc_id"
    " GROUP BY a.doc_id, b.doc_id HAVING count(*) >= 2"
)


@query("ll46_winnowing_overlap", oracle=_WINNOW_ORACLE)
def ll46_winnowing_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing (MOSS-style) substring-overlap detection: per-document
    fingerprints from rightmost-min window selection over word 4-gram
    hashes, then pairs of documents sharing >= 2 fingerprint hashes,
    with the ubiquitous-fingerprint df-guard bounding any inverted-
    index bucket at 50². Catches long shared *passages* between
    otherwise-different documents — the containment signal the
    whole-document tiers (ll4-ll7, ll42) don't measure. The selection
    arithmetic is one codegen'd window aggregate (no UDFs), replayed
    exactly by the oracle."""
    corpus = _augmented(spark, sf_dir)
    fps = dedup.winnowing_fingerprints(corpus, "doc_id", "text", k=4, window=4)
    return dedup.winnowing_overlap_pairs(fps, min_shared=2, max_fp_df=50)


_SIMHASH_ORACLE = (
    f"WITH aug AS ({_AUG_SQL}),"
    f" tok AS (SELECT doc_id, {_TOKENS_SQL} AS tokens FROM aug),"
    f" hs AS (SELECT doc_id, list_transform(tokens, t -> {_hex10('t')})"
    "   AS th FROM tok),"
    " sig AS (SELECT doc_id, CAST(list_sum(list_transform(range(0, 40),"
    "   b -> CASE WHEN coalesce(list_sum(list_transform(th, h ->"
    "   CASE WHEN (h >> b) & 1 = 1 THEN 1 ELSE -1 END)), 0) > 0"
    "   THEN (1::BIGINT << b) ELSE 0::BIGINT END)) AS BIGINT) AS sh FROM hs),"
    " banded AS (SELECT doc_id, sh, c, (sh >> (c * 10)) & 1023 AS ckey"
    "   FROM sig CROSS JOIN (SELECT unnest(range(0, 4)) AS c) cs),"
    " pairs AS (SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b,"
    "   CAST(bit_count(xor(x.sh, y.sh)) AS INT) AS hamming"
    "   FROM banded x JOIN banded y ON x.c = y.c AND x.ckey = y.ckey"
    "   AND x.doc_id < y.doc_id)"
    " SELECT doc_a, doc_b, hamming FROM pairs WHERE hamming <= 3"
)


@query("ll7_simhash_pairs", oracle=_SIMHASH_ORACLE)
def ll7_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs (hamming <= 3 of 40 bits) via pigeonhole
    chunk banding; planted exact copies land at hamming 0. The token
    hash is portable_hash40, so signature construction, chunk banding,
    and hamming verification are all reproduced by the DuckDB oracle."""
    out = dedup.simhash_pairs(_augmented(spark, sf_dir), "doc_id", "text")
    return out.select("doc_a", "doc_b", F.col("hamming").cast("int").alias("hamming"))


# ---------------------------------------------------------------------------
# Similarity search
# ---------------------------------------------------------------------------

def _cos_sql(a: str, b: str) -> str:
    """DuckDB cosine-similarity expression between two list columns,
    rounded to 6 digits (mirrors functions/vectors.cosine_similarity)."""
    return (
        f"round(list_sum(list_transform(range(1, len({a}) + 1),"
        f" i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE)))"
        f" / (sqrt(list_sum(list_transform({a},"
        " x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))"
        f" * sqrt(list_sum(list_transform({b},"
        " x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))), 6)"
    )


_COS_SQL = _cos_sql("qv", "cv")


_LL8_ORACLE = (
    "WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings"
    " WHERE vec_id < 5),"
    " c AS (SELECT vec_id AS cand_id, embedding AS cv FROM embeddings),"
    f" scored AS (SELECT query_id, cand_id, {_COS_SQL} AS sim"
    " FROM q, c WHERE query_id <> cand_id),"
    " ranked AS (SELECT query_id, cand_id, sim,"
    " row_number() OVER (PARTITION BY query_id"
    " ORDER BY sim DESC, cand_id) AS rank"
    " FROM scored WHERE sim IS NOT NULL)"
    " SELECT query_id, cand_id, CAST(CAST(sim AS DECIMAL(18,6)) AS DOUBLE)"
    "  AS sim,"
    " CAST(rank AS BIGINT) AS rank FROM ranked WHERE rank <= 10"
)


@query("ll8_cosine_topk", oracle=_LL8_ORACLE)
def ll8_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-10 for query vectors vec_id<5 — the exact
    ANN baseline. Similarity rounded to 6 digits *before* ranking on
    both sides so engine fp-order can't flip ranks."""
    emb = load(spark, sf_dir, "embeddings")
    out = similarity.brute_force_topk(
        emb.where(F.col("vec_id") < 5), emb, k=10
    )
    return out.select(
        "query_id", "cand_id", F.col("sim").cast("decimal(18,6)").alias("sim"), "rank"
    )


_IVF_ORACLE = (
    "WITH cents AS (SELECT vec_id AS centroid_id, embedding AS centv"
    " FROM embeddings WHERE vec_id % 25 = 0),"
    " cand_sc AS (SELECT c.vec_id AS cand_id, c.embedding AS cv, centroid_id,"
    f" {_cos_sql('c.embedding', 'centv')} AS csim FROM embeddings c, cents),"
    " assigned AS (SELECT cand_id, cv, centroid_id FROM ("
    " SELECT cand_id, cv, centroid_id, row_number() OVER ("
    " PARTITION BY cand_id ORDER BY csim DESC, centroid_id) AS r"
    " FROM cand_sc WHERE csim IS NOT NULL) WHERE r = 1),"
    " q_sc AS (SELECT q.vec_id AS query_id, q.embedding AS qv, centroid_id,"
    f" {_cos_sql('q.embedding', 'centv')} AS csim"
    " FROM embeddings q, cents WHERE q.vec_id < 5),"
    " probes AS (SELECT query_id, qv, centroid_id FROM ("
    " SELECT query_id, qv, centroid_id, row_number() OVER ("
    " PARTITION BY query_id ORDER BY csim DESC, centroid_id) AS r"
    " FROM q_sc WHERE csim IS NOT NULL) WHERE r <= 3),"
    f" scored AS (SELECT query_id, cand_id, {_COS_SQL} AS sim"
    " FROM assigned JOIN probes USING (centroid_id)"
    " WHERE query_id <> cand_id),"
    " ranked AS (SELECT query_id, cand_id, sim, row_number() OVER ("
    " PARTITION BY query_id ORDER BY sim DESC, cand_id) AS rank"
    " FROM scored WHERE sim IS NOT NULL)"
    " SELECT query_id, cand_id, CAST(CAST(sim AS DECIMAL(18,6)) AS DOUBLE)"
    "  AS sim,"
    " CAST(rank AS BIGINT) AS rank FROM ranked WHERE rank <= 10"
)


@query("ll12_ivf_ann_topk", oracle=_IVF_ORACLE)
def ll12_ivf_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF approximate top-10 (training-free coarse quantizer, nprobe=3).

    Fully deterministic (mod-sampled centroids, rounded sims, explicit
    tiebreaks) so the DuckDB oracle reproduces cell assignment AND
    ranking exactly — the approximation itself is oracle-checked, not
    just rows-only."""
    emb = load(spark, sf_dir, "embeddings")
    out = similarity.ivf_topk(
        emb.where(F.col("vec_id") < 5), emb, k=10, centroid_mod=25
    )
    return out.select(
        "query_id", "cand_id", F.col("sim").cast("decimal(18,6)").alias("sim"), "rank"
    )


def _lsh_bucket_sql() -> str:
    """DuckDB twin of similarity._hyperplane_bucket: the identical ±1
    literal planes (hyperplane_signs) inlined as list constants."""
    planes = similarity.hyperplane_signs(4, 64)
    bits = []
    for p, plane in enumerate(planes):
        lits = "[" + ", ".join(f"{s:.1f}" for s in plane) + "]"
        bits.append(
            "CASE WHEN round(list_sum(list_transform(range(1, 65),"
            f" j -> CAST(embedding[j] AS DOUBLE) * ({lits}[j]))), 6) > 0"
            f" THEN {2**p} ELSE 0 END"
        )
    return " + ".join(bits)


_LSH_ANN_ORACLE = (
    "WITH bck AS (SELECT vec_id, embedding,"
    f" {_lsh_bucket_sql()} AS bucket FROM embeddings),"
    " q AS (SELECT vec_id AS query_id, embedding AS qv, bucket"
    " FROM bck WHERE vec_id < 5),"
    " c AS (SELECT vec_id AS cand_id, embedding AS cv, bucket FROM bck),"
    f" scored AS (SELECT query_id, cand_id, {_COS_SQL} AS sim"
    " FROM q JOIN c USING (bucket) WHERE query_id <> cand_id),"
    " ranked AS (SELECT query_id, cand_id, sim, row_number() OVER ("
    " PARTITION BY query_id ORDER BY sim DESC, cand_id) AS rank"
    " FROM scored WHERE sim IS NOT NULL)"
    " SELECT query_id, cand_id, CAST(CAST(sim AS DECIMAL(18,6)) AS DOUBLE)"
    "  AS sim,"
    " CAST(rank AS BIGINT) AS rank FROM ranked WHERE rank <= 10"
)


@query("ll9_ann_lsh_topk", oracle=_LSH_ANN_ORACLE)
def ll9_ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-bucketed approximate cosine top-10 (the scale path: bucket
    equi-join instead of all-pairs). The hyperplanes are literal ±1
    arrays shared with the oracle, so bucketing AND ranking are
    value-checked; recall vs ll8 additionally asserted in tests."""
    emb = load(spark, sf_dir, "embeddings")
    out = similarity.lsh_bucketed_topk(
        emb.where(F.col("vec_id") < 5), emb, k=10
    )
    return out.select(
        "query_id", "cand_id", F.col("sim").cast("decimal(18,6)").alias("sim"), "rank"
    )


# ---------------------------------------------------------------------------
# Multimodal plumbing
# ---------------------------------------------------------------------------


_NEARDUP_EXACT_ORACLE = (
    "WITH e AS (SELECT vec_id, embedding FROM embeddings"
    "  WHERE vec_id < 2000),"
    " p AS (SELECT a.vec_id AS doc_a, b.vec_id AS doc_b,"
    " round(list_sum(list_transform(range(1, len(a.embedding) + 1),"
    " k -> CAST(a.embedding[k] AS DOUBLE) * CAST(b.embedding[k] AS DOUBLE)))"
    " / (sqrt(list_sum(list_transform(a.embedding,"
    " x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))"
    " * sqrt(list_sum(list_transform(b.embedding,"
    " x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))), 6) AS sim"
    " FROM e a JOIN e b ON a.vec_id < b.vec_id)"
    " SELECT doc_a, doc_b, CAST(CAST(sim AS DECIMAL(18,6)) AS DOUBLE)"
    "  AS sim FROM p"
    " WHERE sim >= 0.35"
)


def _neardup_lsh_oracle(n_planes: int = 4, n_tables: int = 6) -> str:
    """DuckDB twin of similarity.lsh_neardup_pairs: the identical
    banded ±1-literal bucketing (table t = planes [t*b, (t+1)*b) of the
    same md5 sequence), (table, bucket) equi-join, DISTINCT pair
    collapse, rounded-sim threshold — the approximation itself is
    value-checked, like ll6."""
    cos = _cos_sql("va", "vb")
    all_planes = similarity.hyperplane_signs(n_planes * n_tables, 64)
    tables = []
    for t in range(n_tables):
        planes = all_planes[t * n_planes : (t + 1) * n_planes]
        bits = []
        for p, plane in enumerate(planes):
            lits = "[" + ", ".join(f"{s:.1f}" for s in plane) + "]"
            bits.append(
                "CASE WHEN round(list_sum(list_transform(range(1, 65),"
                f" j -> CAST(embedding[j] AS DOUBLE) * ({lits}[j]))), 6) > 0"
                f" THEN {2**p} ELSE 0 END"
            )
        tables.append(
            f"SELECT vec_id, embedding, {t} AS tbl,"
            f" {' + '.join(bits)} AS bucket FROM embeddings"
        )
    union = " UNION ALL ".join(tables)
    return (
        f"WITH bck AS ({union}),"
        " a AS (SELECT vec_id AS doc_a, embedding AS va, tbl, bucket"
        "  FROM bck),"
        " b AS (SELECT vec_id AS doc_b, embedding AS vb, tbl, bucket"
        "  FROM bck),"
        f" p AS (SELECT DISTINCT doc_a, doc_b, {cos} AS sim"
        " FROM a JOIN b USING (tbl, bucket) WHERE doc_a < doc_b)"
        " SELECT doc_a, doc_b, CAST(CAST(sim AS DECIMAL(18,6)) AS DOUBLE)"
        "  AS sim FROM p"
        " WHERE sim >= 0.35"
    )


@query("ll11_embedding_neardup", oracle=_neardup_lsh_oracle())
def ll11_embedding_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (the fourth dedup tier):
    bucket-co-resident pairs with rounded cosine >= 0.35. This is the
    product/scale path — a hyperplane-bucket equi-join (no all-pairs
    BNLJ anywhere in the plan); the oracle recomputes the identical
    deterministic bucketing so the approximation is value-checked, not
    just shape-checked. The exact all-pairs tier stays registered as
    ll11b_neardup_exact (recall baseline, small inputs only)."""
    emb = load(spark, sf_dir, "embeddings")
    return similarity.lsh_neardup_pairs(emb, threshold=0.35)


@query("ll11b_neardup_exact", oracle=_NEARDUP_EXACT_ORACLE)
def ll11b_neardup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact all-pairs near-dup tier (ll11's recall baseline): a pure
    inequality self-join, planned as BNLJ — O(n²) BY ROLE, so the
    input is pinned to a fixed id-prefix sample (vec_id < 2000, same
    predicate in the oracle): a baseline needs a reference answer, not
    full coverage. The scale path over the whole corpus is ll11."""
    from ..functions.vectors import cosine_similarity

    emb = load(spark, sf_dir, "embeddings").where(F.col("vec_id") < 2000)
    a = emb.select(F.col("vec_id").alias("doc_a"), F.col("embedding").alias("va"))
    b = emb.select(F.col("vec_id").alias("doc_b"), F.col("embedding").alias("vb"))
    return (
        a.join(b, F.col("doc_a") < F.col("doc_b"))
        .select(
            "doc_a",
            "doc_b",
            F.round(cosine_similarity(F.col("va"), F.col("vb")), 6)
            .cast("decimal(18,6)")
            .alias("sim"),
        )
        .where(F.col("sim") >= 0.35)
    )


_MM_ORACLE = (
    # The payload is a REAL binary PPM: "P6\n4 4\n255\n" + 48 pixel
    # bytes = digest(text) ++ digest(text||'a') ++ digest(text||'b').
    # The Spark side decodes the actual image; the oracle recomputes
    # the same pixel statistics straight from the md5 hex digits.
    # Channel c = every 3rd byte starting at c (RGB interleaved).
    "WITH h AS (SELECT doc_id,"
    " md5(text) || md5(text || 'a') || md5(text || 'b') AS hx"
    " FROM documents),"
    " b AS (SELECT doc_id, list_transform(range(0, 48), i ->"
    " (strpos('0123456789abcdef', substr(hx, 2 * i + 1, 1)) - 1) * 16"
    " + strpos('0123456789abcdef', substr(hx, 2 * i + 2, 1)) - 1)"
    " AS px FROM h)"
    " SELECT doc_id, CAST(4 AS INT) AS width, CAST(4 AS INT) AS height,"
    " CAST(3 AS INT) AS channels,"
    " CAST(CAST(round(list_sum(px) / 48.0, 6) AS DECIMAL(18,6))"
    "  AS DOUBLE) AS pix_mean,"
    " CAST(CAST(round(list_sum(list_where(px,"
    "   list_transform(range(0, 48), i -> i % 3 = 0))) / 16.0, 6)"
    "  AS DECIMAL(18,6)) AS DOUBLE) AS r_mean,"
    " CAST(CAST(round(list_sum(list_where(px,"
    "   list_transform(range(0, 48), i -> i % 3 = 1))) / 16.0, 6)"
    "  AS DECIMAL(18,6)) AS DOUBLE) AS g_mean,"
    " CAST(CAST(round(list_sum(list_where(px,"
    "   list_transform(range(0, 48), i -> i % 3 = 2))) / 16.0, 6)"
    "  AS DECIMAL(18,6)) AS DOUBLE) AS b_mean,"
    " 'ppm' AS format FROM b"
)


@query("ll10_multimodal_features", oracle=_MM_ORACLE)
def ll10_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal image pipeline with a REAL decode step: per-document
    binary PPM payloads (md5-derived pixels, so deterministic) decoded
    by the pure-Python netpbm/BMP codecs in
    ``operators.multimodal.decode_image`` inside Arrow-batched
    mapInPandas; features (dimensions, channel count, global and
    per-channel pixel means) come from the decoded raster. The oracle
    recomputes the identical statistics from the md5 hex in SQL, so the
    whole encode->Arrow->decode->stats path is value-checked."""
    docs = load(spark, sf_dir, "documents")
    binary = multimodal.attach_image_payload(docs, "doc_id", "text")
    feats = multimodal.extract_image_features(binary)
    return feats.select(
        "doc_id",
        "width",
        "height",
        "channels",
        F.round("pix_mean", 6).cast("decimal(18,6)").alias("pix_mean"),
        F.round("r_mean", 6).cast("decimal(18,6)").alias("r_mean"),
        F.round("g_mean", 6).cast("decimal(18,6)").alias("g_mean"),
        F.round("b_mean", 6).cast("decimal(18,6)").alias("b_mean"),
        "format",
    )


def _semdedup_oracle(threshold: float = 0.35) -> str:
    """DuckDB twin of similarity.semantic_dedup with the DERIVED
    centroid modulus (round 4): mod = round(sqrt(N)) computed in SQL
    from the same corpus count the Spark side uses
    (derive_centroid_mod), so the scale-correct O(N^1.5) path is the
    value-checked one — identical training-free quantizer (every
    mod-th vector is a centroid, rounded cosine, (sim desc, id asc)
    tie-break), identical within-cell pair rule."""
    asg_cos = _cos_sql("e.embedding", "c.centv")
    pair_cos = _cos_sql("a.v", "b.v")
    return (
        "WITH md AS (SELECT CAST(greatest(1, round(sqrt(count(*)), 0))"
        " AS BIGINT) AS m FROM embeddings),"
        " cents AS (SELECT vec_id AS centroid_id, embedding AS centv"
        " FROM embeddings, md WHERE vec_id % md.m = 0),"
        " scored AS (SELECT e.vec_id AS m_id, e.embedding AS v,"
        f" c.centroid_id, {asg_cos} AS csim"
        " FROM embeddings e CROSS JOIN cents c),"
        " asg AS (SELECT m_id, v, centroid_id FROM ("
        "  SELECT m_id, v, centroid_id, row_number() OVER ("
        "   PARTITION BY m_id ORDER BY csim DESC, centroid_id) AS crank"
        "  FROM scored WHERE csim IS NOT NULL) WHERE crank = 1),"
        " p AS (SELECT a.m_id AS doc_a, b.m_id AS doc_b,"
        f" {pair_cos} AS sim"
        " FROM asg a JOIN asg b USING (centroid_id)"
        " WHERE a.m_id < b.m_id),"
        " dups AS (SELECT doc_b AS m_id, min(doc_a) AS dup_of FROM p"
        f" WHERE sim >= {threshold} GROUP BY doc_b)"
        " SELECT asg.m_id AS vec_id, asg.centroid_id AS cell,"
        " dups.dup_of IS NOT NULL AS dropped, dups.dup_of"
        " FROM asg LEFT JOIN dups ON asg.m_id = dups.m_id"
    )


def _semdedup_sized_oracle(threshold: float = 0.35) -> str:
    """DuckDB twin of similarity.semantic_dedup_sized: the plane count
    is derived IN SQL from the same corpus count the Spark side uses
    (ceil(log2(N / cell_target))), each ±1 sign is recomputed from the
    md5 parity (hyperplane_signs' formula), the per-plane projection
    folds in dimension order (list_sum over list_transform — the
    zip_with/aggregate order), and the greedy within-cell rule is
    ll42's. The derivation itself is value-checked, so the
    constant-population path is the verified one."""
    sgn = _hex10("CAST(ps.p AS VARCHAR) || '#' || CAST(js.j AS VARCHAR)")
    return (
        "WITH np AS (SELECT greatest(1, CAST(ceil(log2(greatest(2.0,"
        " count(*) / 64.0))) AS BIGINT)) AS np FROM embeddings),"
        " ps AS (SELECT unnest(range((SELECT np FROM np))) AS p),"
        " js AS (SELECT unnest(range(64)) AS j),"
        f" pl AS (SELECT ps.p, js.j, CASE WHEN ({sgn}) % 2 = 1"
        "  THEN 1.0 ELSE -1.0 END AS sg FROM ps, js),"
        " pla AS (SELECT p, list(sg ORDER BY j) AS sgs FROM pl GROUP BY p),"
        " nzv AS (SELECT vec_id AS m_id, embedding AS v FROM embeddings"
        "  WHERE list_sum(list_transform(embedding,"
        "   x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))) > 0),"
        " proj AS (SELECT m_id, p,"
        "  round(list_sum(list_transform(range(1, len(v) + 1),"
        "   j -> CAST(v[j] AS DOUBLE) * sgs[j])), 6) AS comp"
        "  FROM nzv, pla),"
        " cells AS (SELECT m_id, CAST(sum(CASE WHEN comp > 0"
        "  THEN (1::BIGINT << p) ELSE 0 END) AS BIGINT) AS cell"
        "  FROM proj GROUP BY m_id),"
        " asg AS (SELECT n.m_id, n.v, c.cell FROM nzv n"
        "  JOIN cells c USING (m_id)),"
        " p2 AS (SELECT a.m_id AS doc_a, b.m_id AS doc_b,"
        f" {_cos_sql('a.v', 'b.v')} AS sim"
        "  FROM asg a JOIN asg b USING (cell) WHERE a.m_id < b.m_id),"
        " dups AS (SELECT doc_b AS m_id, min(doc_a) AS dup_of FROM p2"
        f" WHERE sim >= {threshold} GROUP BY doc_b)"
        " SELECT asg.m_id AS vec_id, asg.cell,"
        " dups.dup_of IS NOT NULL AS dropped, dups.dup_of"
        " FROM asg LEFT JOIN dups ON asg.m_id = dups.m_id"
    )


@query("ll96_semantic_dedup_sized", oracle=_semdedup_sized_oracle())
def ll96_semantic_dedup_sized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Constant-cell-population semantic dedup (VERDICT r6 item 7) —
    ll42's greedy SemDeDup rule over hyperplane SIGN cells sized to a
    fixed expected population (cell_target=64): n_planes =
    ceil(log2(N/64)) derived from the corpus count on BOTH sides, so
    cells multiply with the corpus instead of fattening. ll42's
    √N-cells policy is the best a scored-centroid quantizer can do
    (assignment and pairs both O(N^1.5), the two highest legitimate
    sf1 growth factors); this tier's assignment is O(N log N) sign
    projections with no centroid table and its pair stage is
    Σ|cell|² ≈ N·64 — linear. The boundary-recall trade vs the
    centroid tier is pinned in tests/test_llm_ops.py."""
    emb = load(spark, sf_dir, "embeddings")
    return similarity.semantic_dedup_sized(
        emb, threshold=0.35, cell_target=64
    )


@query("ll42_semantic_dedup", oracle=_semdedup_oracle())
def ll42_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semantic (embedding-space) dedup, SemDeDup-style: coarse-cluster
    the corpus embeddings, compare only within clusters, keep the
    lowest-id member of each duplicate neighborhood. Complements the
    lexical tiers (exact ll4, MinHash ll6, SimHash ll7) with the tier
    that catches paraphrases sharing no n-grams — and confines the
    quadratic comparison to one cluster at a time, which is what makes
    embedding dedup feasible at corpus scale. Round 4: the registered
    query runs the DERIVED √N centroid modulus (the scale-correct
    O(N^1.5) path), and the oracle derives the same modulus in SQL —
    the derivation itself is value-checked, not just the fixed-mod
    test override. Oracle recomputes the identical closed-form
    pipeline, so the verdict (dropped + dup_of) is value-checked per
    vector."""
    emb = load(spark, sf_dir, "embeddings")
    # cells="centroid" pins this registered row to the literature
    # SemDeDup grain EXPLICITLY (VERDICT r9 item 1 — the bare default
    # now routes to the linear sized tier, ll96's path)
    return similarity.semantic_dedup(
        emb, threshold=0.35, centroid_mod=None, cells="centroid"
    )


_AUDIO_ORACLE = (
    # The payload is a REAL RIFF/WAVE file: 44-byte header + 32 PCM
    # bytes = digest(text) ++ digest(text||'s'), read as little-endian
    # int16. The Spark side walks the RIFF chunks and decodes the
    # samples; the oracle recomputes them straight from the md5 hex
    # (sample i = byte(2i) + 256*byte(2i+1), two's complement).
    "WITH h AS (SELECT doc_id, md5(text) || md5(text || 's') AS hx"
    " FROM documents),"
    " b AS (SELECT doc_id, list_transform(range(0, 16), i ->"
    "  (strpos('0123456789abcdef', substr(hx, 4 * i + 1, 1)) - 1) * 16"
    "  + strpos('0123456789abcdef', substr(hx, 4 * i + 2, 1)) - 1"
    "  + 256 * ((strpos('0123456789abcdef', substr(hx, 4 * i + 3, 1)) - 1)"
    "   * 16"
    "   + strpos('0123456789abcdef', substr(hx, 4 * i + 4, 1)) - 1)) AS v"
    "  FROM h),"
    " s AS (SELECT doc_id, list_transform(v, x ->"
    "  CASE WHEN x >= 32768 THEN x - 65536 ELSE x END) AS smp FROM b)"
    " SELECT doc_id, CAST(8000 AS INT) AS sample_rate,"
    " CAST(1 AS INT) AS n_channels, CAST(16 AS INT) AS n_samples,"
    " CAST(2.0 AS DOUBLE) AS duration_ms,"
    " CAST(list_max(list_transform(smp, x -> abs(x))) AS INT) AS peak,"
    " CAST(CAST(round(sqrt(list_sum(list_transform(smp,"
    "  x -> CAST(x AS DOUBLE) * x)) / 16.0), 6) AS DECIMAL(18,6))"
    "  AS DOUBLE) AS rms"
    " FROM s"
)


@query("ll41_audio_features", oracle=_AUDIO_ORACLE)
def ll41_audio_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal audio pipeline with a REAL decode step: per-document
    RIFF/WAVE payloads (md5-derived 16-bit PCM, so deterministic)
    decoded by the pure-Python chunk-walking parser in
    ``operators.multimodal.decode_wav`` inside Arrow-batched
    mapInPandas; features (rate, channels, sample count, duration, peak
    amplitude, RMS energy) come from the decoded samples. The oracle
    recomputes every sample from the md5 hex in SQL, so the whole
    encode->Arrow->decode->signal-stats path is value-checked.

    RMS determinism: the sum of squares is exact (integer < 2^53 on
    both sides), /16.0 and sqrt are single IEEE-double ops, so both
    engines land on the same double before the shared round(x, 6)."""
    docs = load(spark, sf_dir, "documents")
    binary = multimodal.attach_audio_payload(docs, "doc_id", "text")
    feats = multimodal.extract_audio_features(binary)
    return feats.select(
        "doc_id",
        "sample_rate",
        "n_channels",
        "n_samples",
        "duration_ms",
        "peak",
        F.round("rms", 6).cast("decimal(18,6)").alias("rms"),
    )


LL17_ORACLE = (
    "WITH d AS (SELECT doc_id, text FROM documents WHERE doc_id < 100),"
    " wins AS (SELECT doc_id, w, md5(text || ['','a','b','c'][w + 1]) AS h"
    "  FROM d, unnest(range(0, 4)) t(w)),"
    " bytes AS (SELECT doc_id, w,"
    "  CAST('0x' || substr(h, 2 * j + 1, 2) AS BIGINT) AS b"
    "  FROM wins, unnest(range(0, 16)) u(j))"
    " SELECT doc_id, CAST(w AS INT) AS win_idx,"
    " round(sum(b) / 16.0, 6) AS win_mean,"
    " CAST(max(b) AS BIGINT) AS win_max"
    " FROM bytes GROUP BY doc_id, w"
)


@query("ll17_window_byte_stats", oracle=LL17_ORACLE)
def ll17_window_byte_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio/video-style windowed binary processing: fixed-size byte
    windows per payload -> per-window mean/max via Arrow-batched
    mapInPandas (multimodal.window_byte_stats). Payload windows are
    distinct md5 digests of the doc text, so DuckDB reconstructs the
    exact bytes from the hex digest and checks every stat — the Python
    fan-out path is value-checked, not just shape-checked."""
    docs = load(spark, sf_dir, "documents").where(F.col("doc_id") < 100)
    binary = multimodal.attach_multiwindow_payload(docs, "doc_id", "text")
    stats = multimodal.window_byte_stats(binary)
    return stats.select(
        "doc_id",
        "win_idx",
        F.round("win_mean", 6).alias("win_mean"),
        "win_max",
    )


# ---------------------------------------------------------------------------
# LL21 — quality filter verdict (the keep/drop stage over ll1's signals)
# ---------------------------------------------------------------------------

_SCORE_SQL = (
    "least(len(tokens) / 100.0, 1.0) * 0.4"
    f" + coalesce(CASE WHEN len(tokens) = 0 THEN NULL ELSE"
    f"   {_HITS.format(words=_EN)} * 1.0 / len(tokens) END, 0.0) * 0.4"
    " + (1.0 - least(coalesce(CASE WHEN length(text) = 0 THEN NULL ELSE"
    "   length(regexp_replace(text, '[^.,;:!?]', '', 'g')) * 1.0 /"
    "   length(text) END, 1.0) * 5.0, 1.0)) * 0.2"
)

LL21_ORACLE = (
    f"WITH tok AS (SELECT doc_id, text, {_TOKENS_SQL} AS tokens FROM documents),"
    f" scored AS (SELECT doc_id, len(tokens) AS n_tokens,"
    f"  {_SCORE_SQL} AS score FROM tok)"
    " SELECT doc_id, CAST(CAST(round(score, 6) AS DECIMAL(18,6)) AS DOUBLE)"
    "  AS score,"
    " n_tokens < 20 OR score < 0.5 AS dropped,"
    " CASE WHEN n_tokens < 20 THEN 'too_short'"
    "  WHEN score < 0.5 THEN 'low_quality' ELSE 'kept' END AS verdict"
    " FROM scored"
)


@query("ll21_quality_filter", oracle=LL21_ORACLE)
def ll21_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The keep/drop stage of corpus cleaning: every document gets a
    verdict (kept / too_short / low_quality) from the ll1 quality
    signals, rules applied in a fixed precedence so the reason is
    deterministic. Emitting verdicts for ALL docs (not just keepers)
    is deliberate — at 100 TB you audit drop *rates* per source before
    committing to a filter, so the verdict column is the product."""
    docs = load(spark, sf_dir, "documents")
    tokens = T.tokenize(F.col("text"))
    q = T.quality_features(F.col("text"), tokens)
    score = q["quality_score"]
    too_short = q["n_tokens"] < 20
    low_q = score < 0.5
    return docs.select(
        "doc_id",
        F.round(score, 6).cast("decimal(18,6)").alias("score"),
        (too_short | low_q).alias("dropped"),
        F.when(too_short, "too_short")
        .when(low_q, "low_quality")
        .otherwise("kept")
        .alias("verdict"),
    )


_FRAME_ORACLE = (
    # payload = md5(text) ++ md5(text||'a') ++ md5(text||'b') ++
    # md5(text||'c') = 64 bytes = 16 4-byte frames; every 5th frame
    # (0,5,10,15) is sampled. Byte j of the payload is hex pair
    # (2j+1, 2j+2) of the 128-char concatenated digest.
    "WITH d AS (SELECT doc_id,"
    " md5(text) || md5(text || 'a') || md5(text || 'b') || md5(text || 'c')"
    "  AS hx FROM documents WHERE doc_id < 100),"
    " fr AS (SELECT doc_id, i AS frame_idx, list_transform(range(0, 4), k ->"
    " (strpos('0123456789abcdef', substr(hx, 8 * i + 2 * k + 1, 1)) - 1)"
    "  * 16"
    " + strpos('0123456789abcdef', substr(hx, 8 * i + 2 * k + 2, 1)) - 1)"
    "  AS fb"
    " FROM d, unnest([0, 5, 10, 15]) t(i))"
    " SELECT doc_id, CAST(frame_idx AS INT) AS frame_idx,"
    " CAST(CAST(round(list_sum(fb) / 4.0, 6) AS DECIMAL(18,6)) AS DOUBLE)"
    "  AS frame_mean,"
    " CAST(list_max(fb) AS BIGINT) AS frame_max"
    " FROM fr"
)


@query("ll44_video_frame_stats", oracle=_FRAME_ORACLE)
def ll44_video_frame_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video-pipeline plumbing: fixed-size frames inside a binary
    payload, every 5th frame sampled and feature-extracted in
    Arrow-batched mapInPandas (``multimodal.sample_frame_stats``) —
    decode cost sublinear in footage length because unsampled frames
    are never touched. The byte-slice decode stands in for a codec (no
    video library in this environment) behind the same (doc_id,
    frame_idx) -> features contract; the oracle recomputes each sampled
    frame's bytes from the md5 hex, so the sampling arithmetic and the
    fan-out path are value-checked."""
    docs = load(spark, sf_dir, "documents").where(F.col("doc_id") < 100)
    binary = multimodal.attach_multiwindow_payload(docs, "doc_id", "text")
    stats = multimodal.sample_frame_stats(binary, frame_bytes=4, every_n=5)
    return stats.select(
        "doc_id",
        "frame_idx",
        F.round("frame_mean", 6).cast("decimal(18,6)").alias("frame_mean"),
        "frame_max",
    )


# ---------------------------------------------------------------------------
# LL43 — Gopher-style repetition/format quality rules
# ---------------------------------------------------------------------------

_GOPHER_STOPS = ("the", "be", "to", "of", "and", "that", "have", "with")

# the conjunction of the 7 rule predicates over the gopher signal CTE
# ``m`` — shared between ll43's verdict column and ll94's stage-1 gate
_GOPHER_KEPT_SQL = (
    "(n_words BETWEEN 30 AND 100000) AND mwl BETWEEN 3 AND 10"
    " AND symr < 0.1 AND bulf < 0.9 AND ellf < 0.3 AND alpf > 0.8"
    " AND sw >= 1"
)


def _gopher_m_ctes(src: str) -> str:
    """The gopher signal CTEs (``d`` + ``m``) over an arbitrary
    (doc_id, text) relation named ``src`` — ll43's expressions
    verbatim, reused by ll94's stage-1 gate. No leading WITH, no
    trailing comma."""
    return (
        "d AS (SELECT doc_id, text,"
        " regexp_split_to_array(trim(text), '\\s+') AS words,"
        f" string_split(text, chr(10)) AS lines FROM {src}),"
        " m AS (SELECT doc_id, len(words) AS n_words,"
        " CAST(length(regexp_replace(text, '\\s+', '', 'g')) AS DOUBLE)"
        "  / len(words) AS mwl,"
        " CAST(len(regexp_extract_all(text, '#|\\.\\.\\.')) AS DOUBLE)"
        "  / len(words) AS symr,"
        " CAST(len(list_filter(lines, l -> regexp_matches(l, '^\\s*[-*]')))"
        "  AS DOUBLE) / len(lines) AS bulf,"
        " CAST(len(list_filter(lines, l -> regexp_matches(l, '\\.\\.\\.\\s*$')))"
        "  AS DOUBLE) / len(lines) AS ellf,"
        " CAST(len(list_filter(words, w -> regexp_matches(w, '[a-zA-Z]')))"
        "  AS DOUBLE) / len(words) AS alpf,"
        " len(list_intersect(words,"
        " ['the','be','to','of','and','that','have','with'])) AS sw"
        " FROM d)"
    )


_GOPHER_ORACLE = (
    "WITH "
    + _gopher_m_ctes("documents")
    + " SELECT doc_id, CAST(n_words AS INT) AS n_words,"
    " CAST(CAST(round(mwl, 6) AS DECIMAL(18,6)) AS DOUBLE)"
    "  AS mean_word_len,"
    " CAST(CAST(round(symr, 6) AS DECIMAL(18,6)) AS DOUBLE)"
    "  AS symbol_ratio,"
    " CAST(CAST(round(bulf, 6) AS DECIMAL(18,6)) AS DOUBLE)"
    "  AS bullet_line_frac,"
    " CAST(CAST(round(ellf, 6) AS DECIMAL(18,6)) AS DOUBLE)"
    "  AS ellipsis_line_frac,"
    " CAST(CAST(round(alpf, 6) AS DECIMAL(18,6)) AS DOUBLE)"
    "  AS alpha_word_frac,"
    " CAST(sw AS INT) AS stopword_hits,"
    f" {_GOPHER_KEPT_SQL} AS kept,"
    " CASE WHEN NOT (n_words BETWEEN 30 AND 100000) THEN 'word_count'"
    " WHEN NOT (mwl BETWEEN 3 AND 10) THEN 'mean_word_len'"
    " WHEN NOT (symr < 0.1) THEN 'symbol_ratio'"
    " WHEN NOT (bulf < 0.9) THEN 'bullet_lines'"
    " WHEN NOT (ellf < 0.3) THEN 'ellipsis_lines'"
    " WHEN NOT (alpf > 0.8) THEN 'alpha_words'"
    " WHEN NOT (sw >= 1) THEN 'stopwords' ELSE 'ok' END AS fail_reason"
    " FROM m"
)


def _gopher_signal_frame(
    docs: DataFrame, extra: tuple[str, ...] = ()
) -> DataFrame:
    """The shared Gopher signal pass (ll43's expressions verbatim):
    (doc_id, n_words, mwl, symr, bulf, ellf, alpf, sw) — one narrow
    codegen projection, consumed by the rule verdicts (ll43), the
    rule-ablation report (ll93), and — with ``extra`` passthrough
    columns — the composed gates (ll94's batch stage 1, ss20's
    streaming rule filter, which needs ``text`` downstream)."""
    d = docs.select(
        "doc_id",
        "text",
        F.split(F.trim(F.col("text")), r"\s+").alias("words"),
        F.split(F.col("text"), "\n").alias("lines"),
    )
    n_words = F.size("words")
    n_lines = F.size("lines")
    mwl = (
        F.length(F.regexp_replace("text", r"\s+", "")).cast("double") / n_words
    )
    symr = (
        F.regexp_count("text", F.lit(r"#|\.\.\.")).cast("double") / n_words
    )
    bulf = (
        F.size(F.filter("lines", lambda l: l.rlike(r"^\s*[-*]"))).cast("double")
        / n_lines
    )
    ellf = (
        F.size(F.filter("lines", lambda l: l.rlike(r"\.\.\.\s*$"))).cast(
            "double"
        )
        / n_lines
    )
    alpf = (
        F.size(F.filter("words", lambda w: w.rlike("[a-zA-Z]"))).cast("double")
        / n_words
    )
    sw = F.size(
        F.array_intersect("words", F.array(*[F.lit(s) for s in _GOPHER_STOPS]))
    )
    return d.select(
        "doc_id",
        *extra,
        n_words.alias("n_words"),
        mwl.alias("mwl"),
        symr.alias("symr"),
        bulf.alias("bulf"),
        ellf.alias("ellf"),
        alpf.alias("alpf"),
        sw.alias("sw"),
    )


def _gopher_rules() -> list[tuple[str, Column]]:
    """(name, pass-predicate over the signal frame) in precedence
    order — ONE place for the rule constants on the Spark side."""
    return [
        ("word_count", F.col("n_words").between(30, 100000)),
        ("mean_word_len", F.col("mwl").between(3, 10)),
        ("symbol_ratio", F.col("symr") < 0.1),
        ("bullet_lines", F.col("bulf") < 0.9),
        ("ellipsis_lines", F.col("ellf") < 0.3),
        ("alpha_words", F.col("alpf") > 0.8),
        ("stopwords", F.col("sw") >= 1),
    ]


@query("ll43_gopher_quality_rules", oracle=_GOPHER_ORACLE)
def ll43_gopher_quality_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style (Rae et al. 2021, arXiv:2112.11446 Table A1) format
    and repetition quality rules — the named rule-set complement to
    ll21's scalar score: word-count bounds, mean word length 3..10,
    symbol-to-word ratio, bullet-/ellipsis-line fractions, alphabetic
    word fraction, and required-stopword presence, each applied in a
    fixed precedence so every drop carries its first failing rule.

    All signals are native expressions (split / filter lambdas /
    regexp_count / array_intersect) — whole-stage codegen end to end,
    no Python in the hot path. One narrow pass over the corpus; the
    rule constants live in one place on each side, and every
    intermediate signal is emitted and value-checked, so a rule that
    never fires on this corpus is still verified as computed."""
    docs = load(spark, sf_dir, "documents")
    m = _gopher_signal_frame(docs)
    rules = _gopher_rules()
    kept = rules[0][1]
    for _, ok in rules[1:]:
        kept = kept & ok
    reason = F.lit("ok")
    for name, ok in reversed(rules):
        reason = F.when(~ok, name).otherwise(reason)
    return m.select(
        "doc_id",
        "n_words",
        F.round("mwl", 6).cast("decimal(18,6)").alias("mean_word_len"),
        F.round("symr", 6).cast("decimal(18,6)").alias("symbol_ratio"),
        F.round("bulf", 6).cast("decimal(18,6)").alias("bullet_line_frac"),
        F.round("ellf", 6).cast("decimal(18,6)").alias("ellipsis_line_frac"),
        F.round("alpf", 6).cast("decimal(18,6)").alias("alpha_word_frac"),
        F.col("sw").alias("stopword_hits"),
        kept.alias("kept"),
        reason.alias("fail_reason"),
    )


# ---------------------------------------------------------------------------
# LL22 — user event-sequence assembly (behavioral training data)
# ---------------------------------------------------------------------------

LL22_ORACLE = (
    "SELECT user_id, count(*) AS n_events,"
    " string_agg(event_type, ' ' ORDER BY ts, event_id) AS sequence"
    " FROM events GROUP BY user_id"
)


@query("ll22_user_sequences", oracle=LL22_ORACLE)
def ll22_user_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user event-history assembly: all events time-ordered
    ((ts, event_id) tiebreak makes it total) and flattened into one
    training sequence per user — the events-table analogue of the
    reference's per-sample vector assembly (A7/O1: sort inside the
    group during aggregation, Trainer.scala:46). One shuffle on
    user_id; sort_array happens per group after collect_list, never
    globally."""
    from ..catalog import load as load_tbl

    ev = load_tbl(spark, sf_dir, "events")
    seq = F.array_join(
        F.transform(
            F.array_sort(
                F.collect_list(F.struct("ts", "event_id", "event_type"))
            ),
            lambda x: x["event_type"],
        ),
        " ",
    )
    return ev.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"), seq.alias("sequence")
    )


# ---------------------------------------------------------------------------
# LL23 — near-dup CLUSTERS: Jaccard pair edges -> connected components ->
#        one keeper per cluster (the dedup decision, not just the pairs)
# ---------------------------------------------------------------------------

_CLUSTER_ORACLE = (
    # pairs = the MinHash-LSH verified tier (ll6) — the composition a
    # 100 TB pipeline actually runs; ll5 stays the exhaustive exact tier
    f"WITH RECURSIVE pairs AS (SELECT * FROM ( {_MINHASH_ORACLE} ) mh),"
    " sym AS (SELECT doc_a AS src, doc_b AS dst FROM pairs"
    "   UNION SELECT doc_b, doc_a FROM pairs),"
    " nodes AS (SELECT DISTINCT src AS v FROM sym),"
    " reach(v, lbl) AS ("
    "   SELECT v, v FROM nodes"
    "   UNION"
    "   SELECT s.dst, r.lbl FROM reach r JOIN sym s ON s.src = r.v),"
    " comp AS (SELECT v AS doc_id, min(lbl) AS canonical FROM reach"
    "   GROUP BY v)"
    " SELECT doc_id, canonical,"
    " CAST(count(*) OVER (PARTITION BY canonical) AS BIGINT)"
    "  AS cluster_size,"
    " doc_id = canonical AS keep"
    " FROM comp"
)


@query("ll23_dedup_clusters", oracle=_CLUSTER_ORACLE)
def ll23_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup cluster assembly — the step after pair generation that
    actual corpus dedup needs: MinHash-LSH verified pairs (ll6,
    J >= 0.4; the scale tier — the exhaustive exact tier stays ll5)
    become edges, connected components (the reference's I1 delta iteration,
    reused as a library operator) merge transitive near-dups into one
    cluster, and min-doc_id is the kept canonical per cluster.

    Composition shape at scale: the pair join is the expensive stage
    (inverted-index equi-join, no cartesian); CC then runs on the PAIR
    graph only — vertices = docs with >= 1 near-dup, a tiny fraction of
    the corpus, and near-dup clusters have diameter O(1-2), so the
    driver loop converges in a couple of supersteps regardless of
    corpus size.
    """
    from ..operators import graph

    pairs = dedup.minhash_lsh_pairs(
        _augmented(spark, sf_dir), "doc_id", "text", k=3, threshold=0.4,
        max_shingle_df=0.5,
    )
    comp = graph.connected_components(pairs, src="doc_a", dst="doc_b")
    w = W.partitionBy("canonical")
    return (
        comp.select(
            F.col("vertex").alias("doc_id"),
            F.col("component").alias("canonical"),
        )
        .withColumn("cluster_size", F.count(F.lit(1)).over(w).cast("bigint"))
        .withColumn("keep", F.col("doc_id") == F.col("canonical"))
    )


# ---------------------------------------------------------------------------
# LL24 — fuzzy string matching: blocked Levenshtein similarity join
# ---------------------------------------------------------------------------

LL24_ORACLE = (
    "SELECT a.p_partkey AS part_a, b.p_partkey AS part_b,"
    " CAST(levenshtein(a.p_name, b.p_name) AS INT) AS dist"
    " FROM part a JOIN part b"
    " ON a.p_brand = b.p_brand AND a.p_partkey < b.p_partkey"
    " WHERE levenshtein(a.p_name, b.p_name) <= 3"
)


@query("ll24_fuzzy_match", oracle=LL24_ORACLE)
def ll24_fuzzy_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy-duplicate detection by edit distance, blocked on brand —
    the string-similarity sibling of ll5's token-set Jaccard. The
    blocking key turns the quadratic all-pairs into an equi-join whose
    cost is Σ(block²); levenshtein runs JVM-side inside codegen on the
    joined pairs only. At corpus scale, blocking keys come from cheap
    canopies (first-k chars, simhash prefix, brand/source field) —
    same plan, different key. The `<` tiebreak halves the pairs inside
    the join condition, like c2's upper triangle.
    """
    part = load(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_name")
    a = part.alias("a")
    b = part.alias("b")
    return (
        a.join(
            b,
            (F.col("a.p_brand") == F.col("b.p_brand"))
            & (F.col("a.p_partkey") < F.col("b.p_partkey")),
        )
        .select(
            F.col("a.p_partkey").alias("part_a"),
            F.col("b.p_partkey").alias("part_b"),
            F.levenshtein(F.col("a.p_name"), F.col("b.p_name")).alias("dist"),
        )
        .where(F.col("dist") <= 3)
        .select("part_a", "part_b", F.col("dist").cast("int").alias("dist"))
    )


# ---------------------------------------------------------------------------
# LL25 — BPE-ish token counting (the second tokenizer of the brief:
#         whitespace tokens in ll1, subword-style regex here)
# ---------------------------------------------------------------------------

# RE2-safe (works in both Java regex and DuckDB's RE2 — no lookahead):
# contraction suffixes, then space-prefixed letter runs, digit runs,
# punctuation runs. The GPT-2 pattern's \s+(?!\S) tail is dropped for
# RE2 compatibility; trailing whitespace simply doesn't count.
_BPE_PAT = r"'(?:s|t|re|ve|m|ll|d)| ?[a-z]+| ?[0-9]+| ?[^a-z0-9'\s]+"
_BPE_PAT_SQL = _BPE_PAT.replace("'", "''")

LL25_ORACLE = (
    "WITH t AS (SELECT doc_id,"
    f" regexp_extract_all(lower(text), '{_BPE_PAT_SQL}') AS toks,"
    f" {_TOKENS_SQL} AS ws_toks FROM documents)"
    " SELECT doc_id,"
    " CAST(len(toks) AS INT) AS n_bpe_tokens,"
    " CAST(len(ws_toks) AS INT) AS n_ws_tokens,"
    " CAST(CAST(round(CASE WHEN len(ws_toks) = 0 THEN NULL"
    "  ELSE len(toks) * 1.0 / len(ws_toks) END, 6) AS DECIMAL(18,6))"
    "  AS DOUBLE) AS fertility"
    " FROM t"
)


@query("ll25_bpe_token_count", oracle=LL25_ORACLE)
def ll25_bpe_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Subword-style token counting: a BPE-ish pretokenizer regex
    (contractions / word runs / digit runs / punct runs, GPT-2 shape
    restricted to the RE2-compatible subset so the oracle runs the
    IDENTICAL pattern) next to the whitespace count, plus fertility
    (subword / word ratio) — the budget signal sequence packing (ll19)
    consumes. Pure regexp_extract_all + size: JVM codegen, narrow, no
    shuffle; at 100 TB this is scan-bound exactly like ll1.
    """
    docs = load(spark, sf_dir, "documents")
    # group 0 = whole match: Spark defaults to group 1, DuckDB to 0
    bpe = F.expr(
        'regexp_extract_all(lower(text), "'
        + _BPE_PAT.replace("'", "\\'")
        + '", 0)'
    )
    ws = T.tokenize(F.col("text"))
    return docs.select(
        "doc_id",
        F.size(bpe).cast("int").alias("n_bpe_tokens"),
        F.size(ws).cast("int").alias("n_ws_tokens"),
        F.round(
            F.when(
                F.size(ws) > 0, F.size(bpe) * F.lit(1.0) / F.size(ws)
            ),
            6,
        )
        .cast("decimal(18,6)")
        .alias("fertility"),
    )


# ---------------------------------------------------------------------------
# LL26 — corpus data card: the per-language summary a corpus release
#        publishes, composing ll1/ll2/ll3's signals in one pass
# ---------------------------------------------------------------------------

_LANG_SQL = (
    "CASE WHEN greatest(en_h, de_h, fr_h) = 0 THEN 'und'"
    " WHEN en_h = greatest(en_h, de_h, fr_h) THEN 'en'"
    " WHEN de_h = greatest(en_h, de_h, fr_h) THEN 'de'"
    " ELSE 'fr' END"
)

LL26_ORACLE = (
    f"WITH tok AS (SELECT doc_id, text, {_TOKENS_SQL} AS tokens FROM documents),"
    f" sig AS (SELECT doc_id, len(tokens) AS n_tok,"
    f"  {_HITS.format(words=_EN)} AS en_h,"
    f"  {_HITS.format(words=_DE)} AS de_h,"
    f"  {_HITS.format(words=_FR)} AS fr_h,"
    "  md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fp"
    "  FROM tok),"
    " fpc AS (SELECT fp, count(*) AS c FROM sig GROUP BY fp),"
    f" lab AS (SELECT s.doc_id, s.n_tok, {_LANG_SQL} AS lang,"
    "  fpc.c > 1 AS is_dup FROM sig s JOIN fpc ON fpc.fp = s.fp)"
    " SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,"
    " CAST(sum(n_tok) AS BIGINT) AS total_tokens,"
    " CAST(count(*) FILTER (WHERE is_dup) AS BIGINT) AS n_dup_docs"
    " FROM lab GROUP BY lang"
)


@query("ll26_corpus_datacard", oracle=LL26_ORACLE)
def ll26_corpus_datacard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus data card: docs / token volume / exact-dup counts per
    predicted language — the release-notes summary every corpus build
    ends with, composed from the engine's own text signals (ll2
    language ID, ll3 fingerprint) in two grouped passes (fingerprint
    counts, then the per-language rollup; the fingerprint join is the
    only wide dependency and shuffles 128-bit keys, uniform by
    construction).

    Counts and integer sums only — deliberately no floating mean, so
    the card is exact at any scale and partial-aggregation order can't
    move a digit.
    """
    docs = load(spark, sf_dir, "documents")
    tokens = T.tokenize(F.col("text"))
    sig = docs.select(
        "doc_id",
        F.size(tokens).alias("n_tok"),
        T.predict_lang(tokens).alias("lang"),
        T.text_fingerprint(F.col("text")).alias("fp"),
    )
    fpc = sig.groupBy("fp").agg(F.count(F.lit(1)).alias("c"))
    lab = sig.join(fpc, "fp").select(
        "lang", "n_tok", (F.col("c") > 1).alias("is_dup")
    )
    return lab.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tok").cast("bigint").alias("total_tokens"),
        F.count(F.when(F.col("is_dup"), 1)).cast("bigint").alias("n_dup_docs"),
    )


# ---------------------------------------------------------------------------
# ll27 — corpus source-overlap matrix (pairwise shingle Jaccard by source)
# ---------------------------------------------------------------------------

_LL27_ORACLE = (
    f"WITH tok AS (SELECT source, {_TOKENS_SQL} AS tokens FROM documents),"
    " sh AS (SELECT source, CASE WHEN len(tokens) >= 3 THEN"
    "   list_transform(range(1, len(tokens) - 1),"
    "     i -> tokens[i] || ' ' || tokens[i+1] || ' ' || tokens[i+2])"
    "   ELSE [] END AS shingles FROM tok),"
    " inv AS (SELECT DISTINCT source, shingle FROM"
    "   (SELECT source, unnest(shingles) AS shingle FROM sh)),"
    " sz AS (SELECT source, count(*) AS n FROM inv GROUP BY source),"
    " inter AS (SELECT a.source AS src_a, b.source AS src_b,"
    "   count(*) AS n_common FROM inv a JOIN inv b"
    "   ON a.shingle = b.shingle AND a.source < b.source"
    "   GROUP BY a.source, b.source)"
    " SELECT src_a, src_b, CAST(n_common AS BIGINT) AS n_common,"
    " CAST(CAST(round(n_common * 1.0 / (na.n + nb.n - n_common), 6)"
    "   AS DECIMAL(18,6)) AS DOUBLE) AS jaccard"
    " FROM inter JOIN sz na ON na.source = src_a"
    " JOIN sz nb ON nb.source = src_b"
)


@query("ll27_source_overlap", oracle=_LL27_ORACLE)
def ll27_source_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus source-overlap matrix: exact pairwise Jaccard similarity
    of the distinct 3-gram shingle sets of each SOURCE (not each doc) —
    the cross-source contamination report a corpus release publishes
    next to its data card (ll26). High overlap between two sources
    means one likely scraped or mirrors the other; dedup budgets and
    mixture weights (the d1 sampler) should treat them jointly.

    Scale shape: the inverted-index pattern, never sources² × shingles.
    explode -> distinct(source, shingle) is one shuffle; the self-join
    on shingle hits only shingles shared by ≥2 sources; per-pair counts
    are a grouped agg over that join. Source cardinality is tiny (20
    here, thousands at worst), so the pair matrix is negligible; the
    heavy side is distinct shingles, which partitions by shingle hash
    with no skew (shingles are near-unique).
    """
    docs = load(spark, sf_dir, "documents")
    inv = (
        docs.select(
            "source",
            F.explode(T.word_shingles(T.tokenize(F.col("text")), 3)).alias(
                "shingle"
            ),
        )
        .distinct()
    )
    sz = inv.groupBy("source").agg(F.count(F.lit(1)).alias("n"))
    a = inv.select(F.col("source").alias("src_a"), "shingle")
    b = inv.select(F.col("source").alias("src_b"), "shingle")
    inter = (
        a.join(b, "shingle")
        .where(F.col("src_a") < F.col("src_b"))
        .groupBy("src_a", "src_b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_common"))
    )
    na = sz.select(F.col("source").alias("src_a"), F.col("n").alias("na"))
    nb = sz.select(F.col("source").alias("src_b"), F.col("n").alias("nb"))
    return (
        inter.join(F.broadcast(na), "src_a")
        .join(F.broadcast(nb), "src_b")
        .select(
            "src_a",
            "src_b",
            "n_common",
            F.round(
                F.col("n_common") / (F.col("na") + F.col("nb") - F.col("n_common")),
                6,
            )
            .cast("decimal(18,6)")
            .alias("jaccard"),
        )
    )


# ---------------------------------------------------------------------------
# ll28 — TF-IDF top terms per document
# ---------------------------------------------------------------------------

_LL28_ORACLE = (
    f"WITH tok AS (SELECT doc_id, unnest({_TOKENS_SQL}) AS term FROM documents),"
    " tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY doc_id, term),"
    " df AS (SELECT term, count(*) AS df FROM tf GROUP BY term),"
    " n AS (SELECT count(*) AS n FROM documents),"
    " scored AS (SELECT doc_id, term,"
    "   round(tf * ln(n.n * 1.0 / df.df), 6) AS tfidf"
    "   FROM tf JOIN df USING (term) CROSS JOIN n),"
    " ranked AS (SELECT doc_id, term, tfidf, row_number() OVER"
    "   (PARTITION BY doc_id ORDER BY tfidf DESC, term) AS rnk FROM scored)"
    " SELECT doc_id, CAST(rnk AS INT) AS rnk, term,"
    " CAST(CAST(tfidf AS DECIMAL(18,6)) AS DOUBLE) AS tfidf"
    " FROM ranked WHERE rnk <= 3"
)


@query("ll28_tfidf_topterms", oracle=_LL28_ORACLE)
def ll28_tfidf_topterms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 TF-IDF terms per document — the classic distinctive-term
    extractor (keyword signals for corpus browsing, topic drift
    monitoring, and retrieval indexing next to the embedding family).
    tf is the raw in-doc count, idf = ln(N/df).

    Determinism: tfidf is rounded to 6 decimals BEFORE ranking on both
    engines, and ties break on the term string, so the libm ln()
    low-bit difference between JVM and DuckDB can never flip an order.

    Scale shape: explode -> two grouped aggs (doc×term, then term) ->
    broadcast the corpus-size scalar -> one window partitioned by
    doc_id. The df table is vocabulary-sized; the window's shuffle key
    is the document — high cardinality, no skew. No collect: N joins
    in as a 1-row broadcast crossJoin, keeping the whole thing one
    Catalyst plan.
    """
    docs = load(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id", F.explode(T.tokenize(F.col("text"))).alias("term")
    )
    tf = tok.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n = docs.agg(F.count(F.lit(1)).alias("n"))
    scored = (
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            "term",
            F.round(
                F.col("tf") * F.log(F.col("n") * F.lit(1.0) / F.col("df")), 6
            ).alias("tfidf"),
        )
    )
    w = W.partitionBy("doc_id").orderBy(F.col("tfidf").desc(), F.col("term"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= 3)
        .select(
            "doc_id",
            F.col("rnk").cast("int").alias("rnk"),
            "term",
            F.col("tfidf").cast("decimal(18,6)").alias("tfidf"),
        )
    )


# ---------------------------------------------------------------------------
# LL29 — repetition / boilerplate signals (Gopher/C4-style repetition
# filters: share of duplicated 3-grams and most-frequent-gram share)
# ---------------------------------------------------------------------------

_REP_ORACLE = (
    f"WITH tok AS (SELECT doc_id, {_TOKENS_SQL} AS tokens FROM documents),"
    " grams AS (SELECT doc_id, unnest(list_transform(range(1, len(tokens) - 1),"
    "   i -> tokens[i] || ' ' || tokens[i+1] || ' ' || tokens[i+2])) AS gram"
    "  FROM tok WHERE len(tokens) >= 3),"
    " counts AS (SELECT doc_id, gram, count(*) AS c FROM grams"
    "  GROUP BY doc_id, gram)"
    " SELECT doc_id,"
    " CAST(sum(c) AS BIGINT) AS n_grams,"
    " CAST(CAST(round(1.0 - count(*) * 1.0 / sum(c), 6) AS DECIMAL(18,6))"
    "  AS DOUBLE) AS dup_gram_ratio,"
    " CAST(CAST(round(max(c) * 1.0 / sum(c), 6) AS DECIMAL(18,6)) AS DOUBLE)"
    "  AS top_gram_share"
    " FROM counts GROUP BY doc_id"
)


@query("ll29_repetition_signals", oracle=_REP_ORACLE)
def ll29_repetition_signals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repetition/boilerplate quality signals per document (the
    C4/Gopher-family repetition filters): share of duplicated word
    3-grams and the most-frequent-gram share. Docs with <3 tokens have
    no 3-grams and drop out (same predicate in the oracle).

    Scale shape: explode to (doc_id, gram) -> two grouped aggregations.
    Both shuffle keys include doc_id, so skew is bounded by document
    length and partial aggregation (map-side combine) collapses
    within-partition repeats — the exact shape that survives a 100 TB
    corpus. No sort, no window, no cross-doc state.
    """
    docs = load(spark, sf_dir, "documents")
    grams = docs.select(
        "doc_id",
        F.explode(T.word_ngrams(T.tokenize(F.col("text")), 3)).alias("gram"),
    )
    counts = grams.groupBy("doc_id", "gram").agg(F.count(F.lit(1)).alias("c"))
    return counts.groupBy("doc_id").agg(
        F.sum("c").cast("bigint").alias("n_grams"),
        F.round(
            F.lit(1.0) - F.count(F.lit(1)) * F.lit(1.0) / F.sum("c"), 6
        ).alias("dup_gram_ratio"),
        F.round(F.max("c") * F.lit(1.0) / F.sum("c"), 6).alias(
            "top_gram_share"
        ),
    )


# ---------------------------------------------------------------------------
# LL32 — corpus-unigram log-probability scoring (perplexity-proxy
# quality filter: a doc of globally-rare tokens scores high surprise)
# ---------------------------------------------------------------------------

_ULM_ORACLE = (
    f"WITH tok AS (SELECT doc_id, {_TOKENS_SQL} AS tokens FROM documents),"
    " t AS (SELECT doc_id, unnest(tokens) AS token FROM tok),"
    " vocab AS (SELECT token, count(*) AS c FROM t GROUP BY token),"
    " n AS (SELECT sum(c) AS n FROM vocab)"
    " SELECT doc_id,"
    " CAST(count(*) AS BIGINT) AS n_tokens,"
    " CAST(CAST(round(avg(-ln(c * 1.0 / n.n)), 6) AS DECIMAL(18,6))"
    "  AS DOUBLE) AS avg_neg_logprob"
    " FROM t JOIN vocab USING (token) CROSS JOIN n"
    " GROUP BY doc_id"
)


@query("ll32_unigram_logprob", oracle=_ULM_ORACLE)
def ll32_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perplexity-proxy quality score: train a corpus unigram model
    (token -> count / N), then score each doc by its mean negative log
    token probability — the cheap first-pass LM filter before a real
    model. No smoothing needed: the model is trained on the same corpus
    it scores, so every token has mass.

    Scale shape: one token-keyed grouped count (the model), the corpus
    total attached as a 1-row broadcast (ll28's trick), then a
    token-keyed equi-join back to the exploded corpus and a doc-keyed
    average. Vocabulary is bounded (sublinear in corpus size), so AQE
    picks broadcast vs shuffle join on real statistics. Same ln parity
    convention as ll28's idf (round 6 both sides).
    """
    docs = load(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.explode(T.tokenize(F.col("text"))).alias("token")
    )
    vocab = toks.groupBy("token").agg(F.count(F.lit(1)).alias("c"))
    n = vocab.agg(F.sum("c").alias("n"))
    return (
        toks.join(vocab, "token")
        .crossJoin(F.broadcast(n))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_tokens"),
            F.round(
                F.avg(-F.log(F.col("c") * F.lit(1.0) / F.col("n"))), 6
            ).alias("avg_neg_logprob"),
        )
    )


# ---------------------------------------------------------------------------
# LL34 — end-to-end corpus dedup materialization (the product op: feed
# in a corpus, get back the cleaned corpus)
# ---------------------------------------------------------------------------

_DEDUPED_ORACLE = (
    f"WITH RECURSIVE aug AS ({_AUG_SQL}),"
    f" pairs AS (SELECT * FROM ( {_MINHASH_ORACLE} ) mh),"
    " sym AS (SELECT doc_a AS src, doc_b AS dst FROM pairs"
    "   UNION SELECT doc_b, doc_a FROM pairs),"
    " nodes AS (SELECT DISTINCT src AS v FROM sym),"
    " reach(v, lbl) AS ("
    "   SELECT v, v FROM nodes"
    "   UNION"
    "   SELECT s.dst, r.lbl FROM reach r JOIN sym s ON s.src = r.v),"
    " comp AS (SELECT v AS doc_id, min(lbl) AS canonical FROM reach"
    "   GROUP BY v),"
    " dropped AS (SELECT doc_id FROM comp WHERE doc_id <> canonical)"
    " SELECT a.doc_id, md5(a.text) AS text_md5,"
    " coalesce(c.doc_id IS NOT NULL, FALSE) AS had_neardups"
    " FROM aug a"
    " LEFT JOIN comp c ON c.doc_id = a.doc_id"
    " WHERE a.doc_id NOT IN (SELECT doc_id FROM dropped)"
)


@query("ll34_deduped_corpus", oracle=_DEDUPED_ORACLE)
def ll34_deduped_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The end-to-end product operation every other dedup query feeds:
    corpus in, cleaned corpus out. MinHash-LSH verified near-dup pairs
    (ll6's banded-LSH candidates + exact-Jaccard verify — the canonical
    corpus-dedup tier) -> connected components on the pair graph (ll23) ->
    anti-join the non-canonical cluster members out of the corpus.
    Output keeps an md5 of the text (so the oracle value-checks content
    survival without hashing megabytes of raw text through the driver)
    and flags which survivors had near-dups.

    Scale shape: the corpus-sized stages are one inverted-index
    equi-join + one broadcast-able anti-join (dropped ids are the tiny
    side); CC touches only the pair graph. This is the composition a
    100 TB pretraining pipeline runs nightly.
    """
    from ..operators import graph

    aug = _augmented(spark, sf_dir)
    pairs = dedup.minhash_lsh_pairs(
        aug, "doc_id", "text", k=3, threshold=0.4, max_shingle_df=0.5
    )
    comp = graph.connected_components(
        pairs, src="doc_a", dst="doc_b"
    ).select(
        F.col("vertex").alias("doc_id"), F.col("component").alias("canonical")
    )
    dropped = comp.where(F.col("doc_id") != F.col("canonical")).select("doc_id")
    return (
        aug.join(dropped, "doc_id", "left_anti")
        .join(
            comp.select("doc_id", F.lit(True).alias("had_neardups")),
            "doc_id",
            "left",
        )
        .select(
            "doc_id",
            F.md5("text").alias("text_md5"),
            F.coalesce("had_neardups", F.lit(False)).alias("had_neardups"),
        )
    )


# ---------------------------------------------------------------------------
# LL35 — deterministic mixture sampling (per-source target rates)
# ---------------------------------------------------------------------------

#: training-mixture rates: upsample-by-keeping-everything for the best
#: source, progressively downsample the rest (illustrative weights)
_MIX_RATES = {"src0": 1.0, "src1": 0.5, "src2": 0.25}
_MIX_DEFAULT = 0.1


def _mixture_oracle() -> str:
    cases = " ".join(
        f"WHEN source = '{s}' THEN {r}" for s, r in _MIX_RATES.items()
    )
    h = _hex10("CAST(doc_id AS VARCHAR)")
    return (
        "WITH rated AS (SELECT doc_id, source,"
        f" CASE {cases} ELSE {_MIX_DEFAULT} END AS rate,"
        f" {h} AS h FROM documents)"
        " SELECT doc_id, source,"
        " CAST(CAST(rate AS DECIMAL(18,6)) AS DOUBLE) AS rate"
        " FROM rated"
        f" WHERE h % 1000000 < CAST(round(rate * 1000000, 0) AS BIGINT)"
    )


@query("ll35_mixture_sample", oracle=_mixture_oracle())
def ll35_mixture_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-mixture construction: each source is downsampled to a
    target rate (the 'data mixing' step between dedup/quality and
    tokenization). The keep decision is a pure function of the doc id —
    the portable 40-bit md5 hash modulo 1e6 against rate*1e6 — so the
    sample is reproducible across runs, engines, and re-partitioning
    (no RNG, no per-partition state), and the oracle recomputes the
    identical decisions. A narrow map + filter: zero shuffles at any
    corpus size; rates change by editing a literal map, or join a
    rates dimension for per-(source, lang, quality-bucket) mixtures.
    """
    docs = load(spark, sf_dir, "documents")
    rate = F.lit(_MIX_DEFAULT)
    for s, r in reversed(list(_MIX_RATES.items())):
        rate = F.when(F.col("source") == s, F.lit(r)).otherwise(rate)
    h = dedup.portable_hash40(F.col("doc_id").cast("string"))
    return (
        docs.withColumn("rate", rate)
        .where(
            h % F.lit(1000000)
            < F.round(F.col("rate") * 1000000, 0).cast("bigint")
        )
        .select(
            "doc_id",
            "source",
            F.col("rate").cast("decimal(18,6)").alias("rate"),
        )
    )


# ---------------------------------------------------------------------------
# LL36 — reproducible epoch shuffle (training order without a global sort)
# ---------------------------------------------------------------------------

_EPOCH_KEY = "'ep1#' || CAST(doc_id AS VARCHAR)"
_SHUFFLE_ORACLE = (
    f"WITH h AS (SELECT doc_id, {_hex10(_EPOCH_KEY)}"
    "  AS hv FROM documents),"
    " sharded AS (SELECT doc_id, hv, CAST(hv % 8 AS BIGINT) AS shard FROM h)"
    " SELECT doc_id, shard,"
    " CAST(row_number() OVER (PARTITION BY shard ORDER BY hv, doc_id)"
    "  AS BIGINT) AS pos"
    " FROM sharded"
)


@query("ll36_epoch_shuffle", oracle=_SHUFFLE_ORACLE)
def ll36_epoch_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reproducible training-order shuffle: every doc gets a stable
    pseudo-random (shard, pos) from the portable md5 hash of
    (epoch_salt, doc_id) — readers stream shard 0..N-1 in pos order and
    see a deterministic permutation; change the salt, get a fresh epoch
    order. No RNG state and NO global sort: one hash shuffle on the
    shard key + an in-partition rank, so the plan is identical at 5k
    docs and 5B docs (shard count scales with the cluster; pos is
    dense within each shard).
    """
    docs = load(spark, sf_dir, "documents")
    hv = dedup.portable_hash40(
        F.concat(F.lit("ep1#"), F.col("doc_id").cast("string"))
    )
    w = W.partitionBy("shard").orderBy("hv", "doc_id")
    return (
        docs.select("doc_id", hv.alias("hv"))
        .withColumn("shard", (F.col("hv") % 8).cast("bigint"))
        .withColumn("pos", F.row_number().over(w).cast("bigint"))
        .select("doc_id", "shard", "pos")
    )


# ---------------------------------------------------------------------------
# LL40 — the full pretraining-data pipeline as ONE declarative plan
# ---------------------------------------------------------------------------


def _pipeline_oracle() -> str:
    """dedup (minhash tier) -> quality filter -> mixture sample, all in
    one SQL statement mirroring the composed Spark plan."""
    return (
        "WITH RECURSIVE aug AS ("
        "  SELECT doc_id, text, source FROM documents"
        "  UNION ALL SELECT doc_id + 1000000, text, source"
        "  FROM documents WHERE doc_id % 10 = 0),"
        f" pairs AS (SELECT * FROM ( {_MINHASH_ORACLE} ) mh),"
        " sym AS (SELECT doc_a AS src, doc_b AS dst FROM pairs"
        "   UNION SELECT doc_b, doc_a FROM pairs),"
        " nodes AS (SELECT DISTINCT src AS v FROM sym),"
        " reach(v, lbl) AS ("
        "   SELECT v, v FROM nodes"
        "   UNION"
        "   SELECT s.dst, r.lbl FROM reach r JOIN sym s ON s.src = r.v),"
        " comp AS (SELECT v AS doc_id, min(lbl) AS canonical FROM reach"
        "   GROUP BY v),"
        " dropped AS (SELECT doc_id FROM comp WHERE doc_id <> canonical),"
        " surv AS (SELECT a.doc_id, a.text, a.source FROM aug a"
        "   WHERE a.doc_id NOT IN (SELECT doc_id FROM dropped)),"
        f" tok AS (SELECT doc_id, source, text, {_TOKENS_SQL} AS tokens"
        "   FROM surv),"
        f" scored AS (SELECT doc_id, source, len(tokens) AS n_tokens,"
        f"  {_SCORE_SQL} AS score FROM tok),"
        " kept AS (SELECT doc_id, source, n_tokens FROM scored"
        "   WHERE n_tokens >= 20 AND score >= 0.5)"
        " SELECT doc_id, source, CAST(n_tokens AS BIGINT) AS n_tokens"
        " FROM kept"
        f" WHERE {_hex10('CAST(doc_id AS VARCHAR)')} % 1000000"
        "  < CAST(round((CASE WHEN source = 'src0' THEN 1.0"
        "     WHEN source = 'src1' THEN 0.5 WHEN source = 'src2' THEN 0.25"
        "     ELSE 0.1 END) * 1000000, 0) AS BIGINT)"
    )


@query("ll40_pipeline_end2end", oracle=_pipeline_oracle())
def ll40_pipeline_end2end(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The whole pretraining-data path as one lazy plan — near-dup
    removal (ll34's minhash tier), quality filtering (ll21's signals),
    and mixture sampling (ll35's hash rule) composed end to end, with
    Catalyst free to pipeline the narrow stages and order the joins.
    The point of an engine is that the composition stays declarative:
    nothing is materialized between stages, and the single SQL oracle
    value-checks the entire path (planted duplicates must be gone, low
    quality docs dropped, mixture decisions reproduced exactly).

    Scale shape = the union of its parts, all previously audited: the
    only corpus-sized shuffles are the minhash band join and the
    dropped-id anti-join; quality and mixture are narrow.
    """
    from ..operators import graph

    # source is THREADED through every stage (never joined back from
    # the corpus table — that join-back would be corpus x corpus at
    # scale); the pair generation only reads (doc_id, text)
    docs = load(spark, sf_dir, "documents").select("doc_id", "text", "source")
    copies = docs.where(F.col("doc_id") % 10 == 0).select(
        (F.col("doc_id") + 1000000).alias("doc_id"), "text", "source"
    )
    aug = docs.unionAll(copies)
    pairs = dedup.minhash_lsh_pairs(
        aug, "doc_id", "text", k=3, threshold=0.4, max_shingle_df=0.5
    )
    comp = graph.connected_components(
        pairs, src="doc_a", dst="doc_b"
    ).select(
        F.col("vertex").alias("doc_id"), F.col("component").alias("canonical")
    )
    dropped = comp.where(F.col("doc_id") != F.col("canonical")).select("doc_id")
    surv = aug.join(dropped, "doc_id", "left_anti")

    tokens = T.tokenize(F.col("text"))
    q = T.quality_features(F.col("text"), tokens)
    kept = surv.select(
        "doc_id",
        "source",
        q["n_tokens"].alias("n_tokens"),
        q["quality_score"].alias("score"),
    ).where((F.col("n_tokens") >= 20) & (F.col("score") >= 0.5))

    rate = (
        F.when(F.col("source") == "src0", 1.0)
        .when(F.col("source") == "src1", 0.5)
        .when(F.col("source") == "src2", 0.25)
        .otherwise(0.1)
    )
    h = dedup.portable_hash40(F.col("doc_id").cast("string"))
    return kept.where(
        h % F.lit(1000000) < F.round(rate * 1000000, 0).cast("bigint")
    ).select("doc_id", "source", F.col("n_tokens").cast("bigint").alias("n_tokens"))


# ---------------------------------------------------------------------------
# ll50 — deterministic k-means cluster assignment (curation clustering)
# ---------------------------------------------------------------------------


def _kmeans_ctes(k: int = 8, iters: int = 3, where: str = "") -> str:
    """Unrolled Lloyd iterations as DuckDB CTEs — the same fixed-point
    arithmetic as operators/clustering.py: distances rounded to 6
    before the argmin (ties by centroid id), per-dimension means
    rounded to 6, empty clusters carry the previous centroid. Returns
    the WITH-prefix ending (trailing comma) at ``c{iters}`` — the
    trained centroid table — so both the assignment oracle (ll50) and
    the trained-quantizer ANN oracle (ll79) build on it. ``where``
    (a full " WHERE ..." clause, parameter not string-patch — the
    ADVICE r9 _ll94_ctes discipline) restricts the TRAINING corpus:
    ll107 trains the frozen quantizers on the base slice only."""
    sq = (
        "round(list_sum(list_transform(range(1, len(e.v) + 1),"
        " i -> (e.v[i] - c.cv[i]) * (e.v[i] - c.cv[i]))), 6)"
    )
    parts = [
        "WITH e AS (SELECT vec_id,"
        " list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v"
        f" FROM embeddings{where}),",
        f" c0 AS (SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id < {k}),",
    ]
    for it in range(iters):
        parts += [
            f" a{it}s AS (SELECT e.vec_id, e.v, c.cid, {sq} AS sqdist"
            f" FROM e, c{it} c),",
            f" a{it} AS (SELECT vec_id, v, cid FROM ("
            f" SELECT vec_id, v, cid, row_number() OVER ("
            f" PARTITION BY vec_id ORDER BY sqdist, cid) AS r"
            f" FROM a{it}s) WHERE r = 1),",
            f" u{it} AS (SELECT cid, list(av ORDER BY i) AS cv FROM ("
            f" SELECT cid, i, round(avg(val), 6) AS av FROM ("
            f" SELECT cid, unnest(v) AS val, unnest(range(len(v))) AS i"
            f" FROM a{it}) GROUP BY cid, i) GROUP BY cid),",
            f" c{it + 1} AS (SELECT c.cid, coalesce(u.cv, c.cv) AS cv"
            f" FROM c{it} c LEFT JOIN u{it} u USING (cid)),",
        ]
    return "".join(parts)


def _kmeans_oracle(k: int = 8, iters: int = 3) -> str:
    sq = (
        "round(list_sum(list_transform(range(1, len(e.v) + 1),"
        " i -> (e.v[i] - c.cv[i]) * (e.v[i] - c.cv[i]))), 6)"
    )
    return _kmeans_ctes(k, iters) + (
        f" fs AS (SELECT e.vec_id, c.cid, {sq} AS sqdist"
        f" FROM e, c{iters} c)"
        " SELECT vec_id, CAST(cid AS BIGINT) AS cluster, sqdist FROM ("
        " SELECT vec_id, cid, sqdist, row_number() OVER ("
        " PARTITION BY vec_id ORDER BY sqdist, cid) AS r FROM fs)"
        " WHERE r = 1"
    )


@query("ll50_kmeans_clusters", oracle=_kmeans_oracle())
def ll50_kmeans_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic Lloyd k-means assignment over the embeddings table
    (k=8, 3 iterations) — the learned-centroid tier of the curation
    stack: its output feeds cluster-balanced sampling (ll35's pattern
    keyed by cluster instead of source), SemDeDup-style per-cluster
    dedup scoping (ll42 with real centroids), and IVF indexing (ll12
    with a trained centroid table). MLlib KMeans is nondeterministic
    (k-means|| init, fp reduction order), so this hand-rolled variant
    trades a few lines for a value-checkable contract: smallest-id
    init, rounded-distance argmin with id tie-break, rounded means.
    Scale: one k x dim-state partial-agg shuffle per iteration; the
    k-row centroid table is the only driver boundary."""
    from ..operators import clustering

    emb = load(spark, sf_dir, "embeddings")
    return clustering.kmeans_assign(emb, k=8, iters=3)


# ---------------------------------------------------------------------------
# ll51 — duplicate n-gram span coverage (span-level dedup signal)
# ---------------------------------------------------------------------------

_SPAN_ORACLE = (
    f"WITH aug AS ({_AUG_SQL}),"
    f" tok AS (SELECT doc_id, {_TOKENS_SQL.replace('text', 'text')} AS toks"
    " FROM aug),"
    " base AS (SELECT doc_id, len(toks) AS n_tokens, toks FROM tok),"
    " flat AS (SELECT doc_id, g['pos'] AS pos, g['gram'] AS gram FROM ("
    " SELECT doc_id, unnest(list_transform("
    " range(0, greatest(n_tokens - 4, 0)),"
    " i -> {'pos': i, 'gram': array_to_string(toks[i + 1:i + 5], ' ')}"
    " )) AS g FROM base)),"
    " dup AS (SELECT gram FROM flat GROUP BY gram HAVING count(*) >= 2),"
    " cov AS (SELECT DISTINCT doc_id, tp FROM ("
    " SELECT doc_id, unnest(range(pos, pos + 5)) AS tp FROM flat"
    " WHERE gram IN (SELECT gram FROM dup))),"
    " cnt AS (SELECT doc_id, count(*) AS covered FROM cov GROUP BY doc_id)"
    " SELECT b.doc_id, CAST(b.n_tokens AS BIGINT) AS n_tokens,"
    " CAST(coalesce(c.covered, 0) AS BIGINT) AS covered_tokens,"
    " CAST(CASE WHEN b.n_tokens > 0 THEN round("
    " coalesce(c.covered, 0) / CAST(b.n_tokens AS DOUBLE), 6)"
    " ELSE 0.0 END AS DOUBLE) AS dup_ratio"
    " FROM base b LEFT JOIN cnt c USING (doc_id)"
)


@query("ll51_ngram_span_coverage", oracle=_SPAN_ORACLE)
def ll51_ngram_span_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Span-level dedup signal over the augmented corpus: per document,
    the fraction of tokens covered by a word 5-gram occurring >= 2
    times corpus-wide (Lee et al.'s repeated-span unit). Complements
    the document-level tiers — a boilerplate paragraph shared by
    otherwise-distinct docs is invisible to ll4/ll6/ll7 but lights up
    here. The planted exact copies give every 10th doc a dup_ratio of
    1.0; organic shared spans land in between."""
    aug = _augmented(spark, sf_dir)
    return dedup.ngram_span_coverage(aug, "doc_id", "text", n=5, min_count=2)


# ---------------------------------------------------------------------------
# ll52 — ANN quality measurement: recall@10 of the IVF tier vs exact
# ---------------------------------------------------------------------------

_RECALL_ORACLE = (
    # Both tiers' oracle texts are embedded verbatim as subqueries —
    # the recall metric is exactly "the IVF oracle's hits inside the
    # brute-force oracle's top-10", so any drift in either tier shows
    # up here too.
    f"WITH exact AS ({_LL8_ORACLE}),"
    f" approx AS ({_IVF_ORACLE}),"
    " q AS (SELECT DISTINCT query_id FROM exact),"
    " hits AS (SELECT e.query_id, count(*) AS h FROM exact e"
    " JOIN approx a ON a.query_id = e.query_id AND a.cand_id = e.cand_id"
    " GROUP BY e.query_id)"
    " SELECT q.query_id, CAST(coalesce(h.h, 0) AS BIGINT) AS hits,"
    " CAST(coalesce(h.h, 0) / 10.0 AS DOUBLE) AS recall_at_10"
    " FROM q LEFT JOIN hits h ON h.query_id = q.query_id"
)


@query("ll52_ann_recall", oracle=_RECALL_ORACLE)
def ll52_ann_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@10 of the IVF ANN tier against the exact brute-force
    baseline, per query vector — the measurement loop that makes an
    approximate index operable: before widening nprobe or retraining
    centroids on a 100 TB corpus you sample queries and run exactly
    this join. Composition of two already-oracle-checked tiers, so the
    *metric itself* is value-checked, not just the tiers.

    Scale: both inputs are bounded top-k results (k rows per query) —
    the hit join and the per-query count are trivially small; the cost
    is the two tiers themselves, each with its own documented 100 TB
    path (ll8 is the sampled baseline; ll12 the product index)."""
    emb = load(spark, sf_dir, "embeddings")
    qv = emb.where(F.col("vec_id") < 5)
    exact = similarity.brute_force_topk(qv, emb, k=10).select(
        "query_id", "cand_id"
    )
    approx = similarity.ivf_topk(qv, emb, k=10, centroid_mod=25).select(
        "query_id", "cand_id"
    )
    hits = (
        exact.join(approx, ["query_id", "cand_id"])
        .groupBy("query_id")
        .agg(F.count(F.lit(1)).alias("h"))
    )
    return (
        qv.select(F.col("vec_id").alias("query_id"))
        .join(hits, "query_id", "left")
        .select(
            "query_id",
            F.coalesce(F.col("h"), F.lit(0)).cast("bigint").alias("hits"),
            (F.coalesce(F.col("h"), F.lit(0)) / F.lit(10.0))
            .cast("double")
            .alias("recall_at_10"),
        )
    )


# ---------------------------------------------------------------------------
# ll53 — DSIR importance weights (hashed-bigram log-likelihood ratio)
# ---------------------------------------------------------------------------

def _dsir_oracle_over(table: str) -> str:
    """ll53's DSIR weight oracle over an arbitrary (doc_id, text,
    lang) relation — reused by the ll94 pipeline stage where the
    scored corpus is the cleaned survivor set, not ``documents``."""
    return (
        "WITH tok AS (SELECT doc_id, lang = 'en' AS is_t,"
        f" {_TOKENS_SQL} AS t FROM {table}),"
        " grams AS (SELECT doc_id, is_t,"
        " unnest(list_transform(range(1, len(t)),"
        " i -> t[i] || ' ' || t[i + 1])) AS g FROM tok WHERE len(t) >= 2),"
        f" feat AS (SELECT doc_id, is_t, {_hex10('g')} % 256 AS b FROM grams),"
        " cnts AS (SELECT b, count(*) AS cr,"
        " sum(CASE WHEN is_t THEN 1 ELSE 0 END) AS ct FROM feat GROUP BY b),"
        " tot AS (SELECT sum(cr) AS tr, sum(ct) AS tt FROM cnts),"
        " ratio AS (SELECT b, ln((ct + 1.0) / (tt + 256))"
        " - ln((cr + 1.0) / (tr + 256)) AS lr FROM cnts, tot),"
        " db AS (SELECT doc_id, b, count(*) AS c FROM feat GROUP BY doc_id, b),"
        " w AS (SELECT doc_id, sum(c) AS nf, round(sum(c * lr), 6) AS lw"
        " FROM db JOIN ratio USING (b) GROUP BY doc_id)"
        " SELECT d.doc_id, CAST(coalesce(w.nf, 0) AS BIGINT) AS n_bigrams,"
        " CAST(coalesce(w.lw, 0.0) AS DOUBLE) AS log_weight"
        f" FROM {table} d LEFT JOIN w ON w.doc_id = d.doc_id"
    )


_DSIR_ORACLE = _dsir_oracle_over("documents")


@query("ll53_dsir_weights", oracle=_DSIR_ORACLE)
def ll53_dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR importance weight per document (Xie et al. 2023): hashed
    word-bigram features (portable_hash40 % 256 buckets), target slice
    = English docs, log-likelihood ratio of the add-one-smoothed target
    vs raw bucket distributions. The learned-selection tier between the
    rule-based filters (ll21/ll43) and the mixture sampler (ll35):
    sample proportional to exp(log_weight) to shift the corpus toward
    the target domain. Hashed features are what make the whole scoring
    pass oracle-checkable — DuckDB recomputes the identical md5-derived
    buckets, so weights match to the rounded digit."""
    from ..operators.importance import dsir_logweights

    docs = load(spark, sf_dir, "documents")
    return dsir_logweights(docs, target=F.col("lang") == "en")


# ---------------------------------------------------------------------------
# ll54 — contrastive pair mining from the ANN shortlist
# ---------------------------------------------------------------------------

_PAIR_ORACLE = (
    f"WITH approx AS ({_IVF_ORACLE}),"
    " lab AS (SELECT vec_id, label FROM embeddings),"
    " j AS (SELECT a.query_id, a.cand_id, a.sim, a.rank,"
    " ql.label = cl.label AS same FROM approx a"
    " JOIN lab ql ON ql.vec_id = a.query_id"
    " JOIN lab cl ON cl.vec_id = a.cand_id),"
    " pos AS (SELECT query_id, cand_id AS pos_id, sim AS pos_sim FROM ("
    " SELECT query_id, cand_id, sim, row_number() OVER ("
    " PARTITION BY query_id ORDER BY rank) AS r FROM j WHERE same)"
    " WHERE r = 1),"
    " neg AS (SELECT query_id, cand_id AS neg_id, sim AS neg_sim FROM ("
    " SELECT query_id, cand_id, sim, row_number() OVER ("
    " PARTITION BY query_id ORDER BY rank) AS r FROM j WHERE NOT same)"
    " WHERE r = 1)"
    " SELECT q.query_id, p.pos_id, p.pos_sim, n.neg_id, n.neg_sim"
    " FROM (SELECT DISTINCT query_id FROM approx) q"
    " LEFT JOIN pos p ON p.query_id = q.query_id"
    " LEFT JOIN neg n ON n.query_id = q.query_id"
)


@query("ll54_contrastive_pairs", oracle=_PAIR_ORACLE)
def ll54_contrastive_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contrastive training-pair mining: per query vector, the
    highest-ranked SAME-label shortlist hit (positive) and the
    highest-ranked DIFFERENT-label hit (hard negative) — the standard
    recipe for embedding-model finetuning data, mined from the IVF
    shortlist rather than an exact scan (at 100 TB you mine hard
    negatives from the ANN index's candidates; an exact pass would be
    the whole point of having the index, defeated). Missing side ->
    NULL, kept (a query whose shortlist is all-same-label still yields
    its positive). Oracle embeds the IVF tier's oracle text verbatim,
    so the mined pairs are value-checked end to end."""
    emb = load(spark, sf_dir, "embeddings")
    qv = emb.where(F.col("vec_id") < 5)
    topk = similarity.ivf_topk(qv, emb, k=10, centroid_mod=25).select(
        "query_id",
        "cand_id",
        F.col("sim").cast("decimal(18,6)").cast("double").alias("sim"),
        "rank",
    )
    lab = emb.select("vec_id", "label")
    j = (
        topk.join(
            lab.select(F.col("vec_id").alias("query_id"), F.col("label").alias("ql")),
            "query_id",
        )
        .join(
            lab.select(F.col("vec_id").alias("cand_id"), F.col("label").alias("cl")),
            "cand_id",
        )
        .withColumn("same", F.col("ql") == F.col("cl"))
    )
    w = W.partitionBy("query_id").orderBy("rank")
    pos = (
        j.where("same")
        .withColumn("r", F.row_number().over(w))
        .where("r = 1")
        .select("query_id", F.col("cand_id").alias("pos_id"), F.col("sim").alias("pos_sim"))
    )
    neg = (
        j.where(~F.col("same"))
        .withColumn("r", F.row_number().over(w))
        .where("r = 1")
        .select("query_id", F.col("cand_id").alias("neg_id"), F.col("sim").alias("neg_sim"))
    )
    return (
        topk.select("query_id")
        .distinct()
        .join(pos, "query_id", "left")
        .join(neg, "query_id", "left")
    )


# ---------------------------------------------------------------------------
# ll55 — semantic decontamination (train embeddings near eval embeddings)
# ---------------------------------------------------------------------------


def _semdecon_oracle(threshold: float = 0.35) -> str:
    """DuckDB twin of similarity.semantic_decontaminate: same DERIVED
    √N quantizer as ll42's oracle (round 4), TRAIN x EVAL pair join,
    (sim desc, eval_id asc) match pick."""
    asg_cos = _cos_sql("e.embedding", "c.centv")
    pair_cos = _cos_sql("t.v", "v.ve")
    return (
        "WITH md AS (SELECT CAST(greatest(1, round(sqrt(count(*)), 0))"
        " AS BIGINT) AS m FROM embeddings),"
        " cents AS (SELECT vec_id AS centroid_id, embedding AS centv"
        " FROM embeddings, md WHERE vec_id % md.m = 0),"
        " scored AS (SELECT e.vec_id AS m_id, e.embedding AS v,"
        " e.vec_id % 5 = 0 AS is_eval,"
        f" c.centroid_id, {asg_cos} AS csim"
        " FROM embeddings e CROSS JOIN cents c),"
        " asg AS (SELECT m_id, v, is_eval, centroid_id FROM ("
        "  SELECT m_id, v, is_eval, centroid_id, row_number() OVER ("
        "   PARTITION BY m_id ORDER BY csim DESC, centroid_id) AS crank"
        "  FROM scored WHERE csim IS NOT NULL) WHERE crank = 1),"
        " t AS (SELECT centroid_id, m_id AS train_id, v"
        "  FROM asg WHERE NOT is_eval),"
        " v AS (SELECT centroid_id, m_id AS eval_id, v AS ve"
        "  FROM asg WHERE is_eval),"
        " hits AS (SELECT train_id, eval_id, sim FROM ("
        f"  SELECT t.train_id, v.eval_id, {pair_cos} AS sim,"
        "  row_number() OVER (PARTITION BY t.train_id"
        f"   ORDER BY {pair_cos} DESC, v.eval_id) AS hrank"
        "  FROM t JOIN v USING (centroid_id)"
        f"  WHERE {pair_cos} >= {threshold}) WHERE hrank = 1)"
        " SELECT t.train_id AS vec_id,"
        " h.eval_id IS NOT NULL AS contaminated, h.eval_id,"
        " CAST(h.sim AS DOUBLE) AS sim"
        " FROM t LEFT JOIN hits h ON h.train_id = t.train_id"
    )


@query("ll55_semantic_decontaminate", oracle=_semdecon_oracle())
def ll55_semantic_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-space decontamination: train vectors (vec_id % 5 != 0)
    whose cosine to ANY eval vector (vec_id % 5 == 0) reaches 0.35 are
    flagged with their closest eval match. The paraphrase-leakage
    complement to ll20's verbatim 5-gram decontamination — same
    cell-scoped shape as ll42, but the pair join is train x eval (the
    tiny benchmark side), never train x train. Runs the derived √N
    centroid modulus like ll42, mirrored in the oracle."""
    emb = load(spark, sf_dir, "embeddings")
    # cells="centroid" pins the literature grain explicitly (VERDICT
    # r9 item 1 — the bare default now routes to ll97's sized tier)
    out = similarity.semantic_decontaminate(
        emb,
        is_eval=F.col("vec_id") % 5 == 0,
        threshold=0.35,
        centroid_mod=None,
        cells="centroid",
    )
    return out.select(
        "vec_id",
        "contaminated",
        "eval_id",
        F.col("sim").cast("double").alias("sim"),
    )


def _semdecon_sized_oracle(threshold: float = 0.35) -> str:
    """DuckDB twin of similarity.semantic_decontaminate_sized: ll96's
    SQL-derived sign cells (plane count from the corpus count, ±1
    signs from md5 parity, dimension-ordered fold), ll55's TRAIN x
    EVAL verdict."""
    sgn = _hex10("CAST(ps.p AS VARCHAR) || '#' || CAST(js.j AS VARCHAR)")
    pair_cos = _cos_sql("t.v", "v.ve")
    return (
        "WITH np AS (SELECT greatest(1, CAST(ceil(log2(greatest(2.0,"
        " count(*) / 64.0))) AS BIGINT)) AS np FROM embeddings),"
        " ps AS (SELECT unnest(range((SELECT np FROM np))) AS p),"
        " js AS (SELECT unnest(range(64)) AS j),"
        f" pl AS (SELECT ps.p, js.j, CASE WHEN ({sgn}) % 2 = 1"
        "  THEN 1.0 ELSE -1.0 END AS sg FROM ps, js),"
        " pla AS (SELECT p, list(sg ORDER BY j) AS sgs FROM pl GROUP BY p),"
        " nzv AS (SELECT vec_id AS m_id, embedding AS v,"
        "  vec_id % 5 = 0 AS is_eval FROM embeddings"
        "  WHERE list_sum(list_transform(embedding,"
        "   x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))) > 0),"
        " proj AS (SELECT m_id, p,"
        "  round(list_sum(list_transform(range(1, len(v) + 1),"
        "   j -> CAST(v[j] AS DOUBLE) * sgs[j])), 6) AS comp"
        "  FROM nzv, pla),"
        " cells AS (SELECT m_id, CAST(sum(CASE WHEN comp > 0"
        "  THEN (1::BIGINT << p) ELSE 0 END) AS BIGINT) AS cell"
        "  FROM proj GROUP BY m_id),"
        " asg AS (SELECT n.m_id, n.v, n.is_eval, c.cell FROM nzv n"
        "  JOIN cells c USING (m_id)),"
        " t AS (SELECT cell, m_id AS train_id, v FROM asg"
        "  WHERE NOT is_eval),"
        " v AS (SELECT cell, m_id AS eval_id, v AS ve FROM asg"
        "  WHERE is_eval),"
        " hits AS (SELECT train_id, eval_id, sim FROM ("
        f"  SELECT t.train_id, v.eval_id, {pair_cos} AS sim,"
        "  row_number() OVER (PARTITION BY t.train_id"
        f"   ORDER BY {pair_cos} DESC, v.eval_id) AS hrank"
        "  FROM t JOIN v USING (cell)"
        f"  WHERE {pair_cos} >= {threshold}) WHERE hrank = 1)"
        " SELECT t.train_id AS vec_id,"
        " h.eval_id IS NOT NULL AS contaminated, h.eval_id,"
        " CAST(h.sim AS DOUBLE) AS sim"
        " FROM t LEFT JOIN hits h ON h.train_id = t.train_id"
    )


@query("ll97_decontaminate_sized", oracle=_semdecon_sized_oracle())
def ll97_decontaminate_sized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Constant-cell-population decontamination (VERDICT r6 item 7's
    second tier): ll55's train-vs-eval verdict over ll96's sign-bucket
    cells — the train x eval join costs ~N·(eval fraction)·64 at ANY
    corpus size, with the O(N log N) no-centroid-table assignment,
    where ll55's √N-cells policy grows O(N^1.5). Both the plane-count
    derivation and every sign are recomputed in the oracle, so the
    constant-population path is the value-checked one."""
    emb = load(spark, sf_dir, "embeddings")
    out = similarity.semantic_decontaminate_sized(
        emb,
        is_eval=F.col("vec_id") % 5 == 0,
        threshold=0.35,
        cell_target=64,
    )
    return out.select(
        "vec_id",
        "contaminated",
        "eval_id",
        F.col("sim").cast("double").alias("sim"),
    )


# ---------------------------------------------------------------------------
# ll56 — repeated-segment removal (C4 line-dedup / Lee et al. excision)
# ---------------------------------------------------------------------------

_SEGDROP_ORACLE = (
    f"WITH aug AS ({_AUG_SQL}),"
    f" tok AS (SELECT doc_id, {_TOKENS_SQL} AS t FROM aug),"
    " segs AS (SELECT doc_id, g['i'] AS seg_id, g['s'] AS seg FROM ("
    " SELECT doc_id, unnest(list_transform("
    " range(0, CAST(floor((len(t) - 1) / 10) AS BIGINT) + 1),"
    " i -> {'i': i, 's': array_to_string(t[i * 10 + 1 : i * 10 + 10], ' ')}"
    " )) AS g FROM tok WHERE len(t) > 0)),"
    " hot AS (SELECT seg FROM segs GROUP BY seg HAVING count(*) >= 2),"
    " marked AS (SELECT doc_id, seg_id, seg,"
    " seg IN (SELECT seg FROM hot) AS dropped FROM segs)"
    " SELECT doc_id, CAST(count(*) AS BIGINT) AS n_segments,"
    " CAST(sum(CASE WHEN dropped THEN 1 ELSE 0 END) AS BIGINT)"
    "  AS n_dropped,"
    " md5(coalesce(string_agg(seg, ' ' ORDER BY seg_id)"
    "  FILTER (WHERE NOT dropped), '')) AS clean_md5"
    " FROM marked GROUP BY doc_id"
)


@query("ll56_remove_repeated_segments", oracle=_SEGDROP_ORACLE)
def ll56_remove_repeated_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repeated-segment removal over the augmented corpus (segment =
    10 non-overlapping tokens, dropped when it appears >= 2 times
    corpus-wide): the transform behind C4's duplicate-line drop —
    cleans INSIDE documents where the document-level tiers (ll4/ll6/
    ll34) drop whole docs and ll51 only measures coverage. Planted
    copies lose every segment in BOTH instances; the cleaned text
    travels as an md5 so the comparator never hauls the corpus."""
    aug = _augmented(spark, sf_dir)
    return dedup.remove_repeated_segments(
        aug, "doc_id", "text", seg_tokens=10, min_count=2
    )


# ---------------------------------------------------------------------------
# ll57 — per-source quota cap (source balancing by quality rank)
# ---------------------------------------------------------------------------

_QUOTA_ORACLE = (
    f"WITH tok AS (SELECT doc_id, source, text, {_TOKENS_SQL} AS tokens"
    " FROM documents),"
    f" scored AS (SELECT doc_id, source,"
    f" round({_SCORE_SQL}, 6) AS score FROM tok),"
    " ranked AS (SELECT doc_id, source, score, row_number() OVER ("
    " PARTITION BY source ORDER BY score DESC, doc_id) AS src_rank"
    " FROM scored)"
    " SELECT doc_id, source,"
    " CAST(CAST(score AS DECIMAL(18,6)) AS DOUBLE) AS score,"
    " CAST(src_rank AS BIGINT) AS src_rank"
    " FROM ranked WHERE src_rank <= 20"
)


@query("ll57_source_quota_cap", oracle=_QUOTA_ORACLE)
def ll57_source_quota_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Source balancing by quota: keep only the top 20 documents per
    source ranked by quality score — the hard-cap companion to ll35's
    proportional mixture sampling (a boilerplate-heavy source can't
    flood the corpus no matter its size). Score is rounded BEFORE
    ranking on both engines so fp noise can't flip ranks; one hash
    shuffle on source, per-partition top-k via the rank window."""
    docs = load(spark, sf_dir, "documents")
    tokens = T.tokenize(F.col("text"))
    q = T.quality_features(F.col("text"), tokens)
    w = W.partitionBy("source").orderBy(F.col("score").desc(), "doc_id")
    return (
        docs.select(
            "doc_id", "source", F.round(q["quality_score"], 6).alias("score")
        )
        .withColumn("src_rank", F.row_number().over(w))
        .where(F.col("src_rank") <= 20)
        .select(
            "doc_id",
            "source",
            F.col("score").cast("decimal(18,6)").alias("score"),
            F.col("src_rank").cast("bigint").alias("src_rank"),
        )
    )


# ---------------------------------------------------------------------------
# ll59 — compression-ratio quality signal (rows-only: no SQL zlib)
# ---------------------------------------------------------------------------


@query("ll59_compression_ratio")  # rows-only: DuckDB has no zlib twin
def ll59_compression_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document zlib compression ratio — the cheap repetitiveness
    signal Gopher-style filter stacks pair with the n-gram rules
    (template spam compresses far below natural text; the planted
    exact copies in the augmented corpus don't change their OWN ratio,
    which is exactly why this signal complements dedup instead of
    replacing it). Arrow-batched pandas UDF, narrow, no shuffle;
    deterministic for the fixed zlib level but not SQL-expressible, so
    the contract is rows-only + the distribution property test in
    tests/test_llm_ops.py."""
    docs = load(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.round(T.compression_ratio(F.col("text")), 6).alias("zlib_ratio"),
    )


# ---------------------------------------------------------------------------
# ll60 — IVF-PQ composed ANN (coarse-cell pruning x ADC scoring)
# ---------------------------------------------------------------------------

# The _IVF_ORACLE cell CTEs feeding the _PQ_ORACLE encode/LUT CTEs
# (mod-64 codebooks, m=4), scored only on the shortlisted (query, cand)
# pairs. Shared by the mod-sampled (ll60) and kmeans-trained (ll79)
# variants — only the ``cents`` CTE differs.
_IVFPQ_BODY = (
    " cand_sc AS (SELECT c.vec_id AS cand_id, centroid_id,"
    f" {_cos_sql('c.embedding', 'centv')} AS csim FROM embeddings c, cents),"
    " assigned AS (SELECT cand_id, centroid_id FROM ("
    " SELECT cand_id, centroid_id, row_number() OVER ("
    " PARTITION BY cand_id ORDER BY csim DESC, centroid_id) AS r"
    " FROM cand_sc WHERE csim IS NOT NULL) WHERE r = 1),"
    " q_sc AS (SELECT q.vec_id AS query_id, centroid_id,"
    f" {_cos_sql('q.embedding', 'centv')} AS csim"
    " FROM embeddings q, cents WHERE q.vec_id < 5),"
    " probes AS (SELECT query_id, centroid_id FROM ("
    " SELECT query_id, centroid_id, row_number() OVER ("
    " PARTITION BY query_id ORDER BY csim DESC, centroid_id) AS r"
    " FROM q_sc WHERE csim IS NOT NULL) WHERE r <= 3),"
    " short AS (SELECT query_id, cand_id"
    "  FROM assigned JOIN probes USING (centroid_id)),"
    " sp AS (SELECT unnest([0, 1, 2, 3]) AS s),"
    # the codebook cap (similarity.ivfpq_topk max_codes=256): sample
    # ids below code_mod·max_codes — min(⌈N/64⌉, 256) codes, identical
    # to the uncapped set at every tested N ≤ 16384
    " cb AS (SELECT e.vec_id AS code, sp.s,"
    "  list_slice(e.embedding, sp.s * 16 + 1, sp.s * 16 + 16) AS cent"
    "  FROM embeddings e, sp WHERE e.vec_id % 64 = 0"
    "   AND e.vec_id < 64 * 256),"
    " csub AS (SELECT e.vec_id AS cand_id, sp.s,"
    "  list_slice(e.embedding, sp.s * 16 + 1, sp.s * 16 + 16) AS sub"
    "  FROM embeddings e, sp"
    "  WHERE e.vec_id IN (SELECT cand_id FROM short)),"
    " enc AS (SELECT cand_id, c.s, c.code,"
    f" {_dot6_sql('sub', 'cent')} AS d"
    "  FROM csub JOIN cb c ON c.s = csub.s),"
    " codes AS (SELECT cand_id, s, code FROM ("
    "  SELECT cand_id, s, code, row_number() OVER ("
    "   PARTITION BY cand_id, s ORDER BY d DESC, code) AS rk"
    "  FROM enc WHERE d IS NOT NULL) WHERE rk = 1),"
    " qsub AS (SELECT e.vec_id AS query_id, sp.s,"
    "  list_slice(e.embedding, sp.s * 16 + 1, sp.s * 16 + 16) AS sub"
    "  FROM embeddings e, sp WHERE e.vec_id < 5),"
    " lut AS (SELECT query_id, c.s, c.code,"
    f" {_dot6_sql('sub', 'cent')} AS qd"
    "  FROM qsub JOIN cb c ON c.s = qsub.s),"
    " scored AS (SELECT sh.query_id, sh.cand_id,"
    "  CAST(sum(qd) AS DECIMAL(18,6)) AS sim"
    "  FROM short sh JOIN codes ON codes.cand_id = sh.cand_id"
    "  JOIN lut ON lut.query_id = sh.query_id AND lut.s = codes.s"
    "   AND lut.code = codes.code"
    "  WHERE sh.query_id <> sh.cand_id AND qd IS NOT NULL"
    "  GROUP BY 1, 2)"
    " SELECT query_id, cand_id, CAST(sim AS DOUBLE) AS sim, rank FROM ("
    "  SELECT query_id, cand_id, sim, CAST(row_number() OVER ("
    "   PARTITION BY query_id ORDER BY sim DESC, cand_id) AS BIGINT)"
    "   AS rank FROM scored) WHERE rank <= 10"
)

_IVFPQ_ORACLE = (
    # Coarse centroids use the DERIVED √N modulus like ll42/ll55 —
    # mirrored here so the scale-correct path is the value-checked one.
    "WITH md AS (SELECT CAST(greatest(1, round(sqrt(count(*)), 0))"
    " AS BIGINT) AS m FROM embeddings),"
    " cents AS (SELECT vec_id AS centroid_id, embedding AS centv"
    " FROM embeddings, md WHERE vec_id % md.m = 0)," + _IVFPQ_BODY
)


@query("ll60_ivfpq_ann_topk", oracle=_IVFPQ_ORACLE)
def ll60_ivfpq_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ composed top-10 — the billion-scale ANN layout (FAISS
    default) completing the family: brute ll8 / hyperplane-LSH ll9 /
    IVF ll12 / PQ ll49 / IVF×PQ here, one output contract. The coarse
    quantizer prunes WHICH candidates are scored (nprobe=3 of M ≈ √N
    cells — the DERIVED modulus, mirrored in the oracle, so cell count
    grows with the corpus instead of cell size), PQ-ADC prunes HOW (4
    code lookups instead of a 64-dim dot). Every stage is
    deterministic (shared mod-sampled quantizers, rounded-DECIMAL
    partials, explicit tie-breaks), so the oracle reproduces cells,
    codes, LUT, and ranking — BOTH approximation losses are
    value-checked in composition."""
    emb = load(spark, sf_dir, "embeddings")
    # centroid_mod="sqrt" pins the √N literature grain explicitly
    # (VERDICT r9 item 1 — the grain argument is now required; the
    # oracle's md CTE is this same √N derivation)
    out = similarity.ivfpq_topk(
        emb.where(F.col("vec_id") < 5), emb, k=10, centroid_mod="sqrt"
    )
    return out.select("query_id", "cand_id", "sim", "rank")


_IVFPQ_TRAINED_ORACLE = (
    _kmeans_ctes(8, 3)
    + " cents AS (SELECT cid AS centroid_id, cv AS centv FROM c3),"
    + _IVFPQ_BODY
)


@query("ll79_ivfpq_trained_topk", oracle=_IVFPQ_TRAINED_ORACLE)
def ll79_ivfpq_trained_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ top-10 with TRAINED coarse centroids — the production
    configuration (VERDICT r5 item 8): ``clustering.kmeans_fit`` (k=8,
    3 Lloyd iterations, deterministic smallest-id init) replaces ll60's
    mod-sampled quantizer, which lifts recall (0.37 → 0.86 measured in
    the IVF recall test) because trained cells follow the data's
    density instead of its id order. The oracle composes the unrolled
    Lloyd CTEs (ll50's) with the shared IVF-PQ body, so training AND
    the two approximation stages are value-checked in composition.
    PQ codebook stays mod-sampled, CAPPED at 256 codes per subspace
    (ivfpq_topk's max_codes — the fix for the r7-measured 24.1×
    sf10 growth of the uncapped encode join; cap inactive at every
    tested N ≤ 16384). Scale: training adds one k×dim-state
    partial-agg shuffle per iteration; the k-row centroid table is the
    only driver boundary — everything else is ll60's audited plan."""
    from ..operators import clustering

    emb = load(spark, sf_dir, "embeddings")
    cents = clustering.kmeans_fit(emb, k=8, iters=3).select(
        F.col("cid").alias("centroid_id"), F.col("cv").alias("centv")
    )
    out = similarity.ivfpq_topk(
        emb.where(F.col("vec_id") < 5), emb, k=10, centroids=cents
    )
    return out.select("query_id", "cand_id", "sim", "rank")


def _l2sq6_sql(a: str, b: str) -> str:
    """Rounded-then-exact partial squared L2 distance: DECIMAL(18,6)
    of the 6-digit rounded sum of squared differences (mirrors
    residual_ivfpq_topk's code-assignment objective)."""
    return (
        f"CAST(round(list_sum(list_transform(range(1, len({a}) + 1),"
        f" i -> (CAST({a}[i] AS DOUBLE) - CAST({b}[i] AS DOUBLE))"
        f" * (CAST({a}[i] AS DOUBLE) - CAST({b}[i] AS DOUBLE)))), 6)"
        " AS DECIMAL(18,6))"
    )


def _residual_ivfpq_body(base_pred: str | None = None) -> str:
    """The residual IVF-PQ oracle body (shared by ll95/ll105/ll107/
    ss23): candidate assignment, trained residual codebook, encode,
    LUT, ADC + exact coarse term, ranking. ``base_pred`` — a predicate
    template over a column placeholder ``{c}`` (e.g. ``"{c} % 5 <> 0"``)
    — restricts the codebook TRAINING slice (seed count, seed rows,
    Lloyd sample) to the base corpus, expressing ll107's frozen-
    quantizer contract: quantizers trained on base only, EVERY
    candidate (base ∪ delta) encoded against them. A parameter, not a
    string-patch on emitted SQL (the ADVICE r9 _ll94_ctes
    discipline)."""
    kk_where = f" WHERE {base_pred.format(c='vec_id')}" if base_pred else ""
    tr_and = f" AND {base_pred.format(c='r.cand_id')}" if base_pred else ""
    return (
    # Mirrors similarity.residual_ivfpq_topk (FAISS IVFPQ layout):
    # residual codebook, L2 code assignment, exact q·c(v) coarse term
    " cand_sc AS (SELECT c.vec_id AS cand_id, centroid_id,"
    f" {_cos_sql('c.embedding', 'centv')} AS csim FROM embeddings c, cents),"
    " assigned AS (SELECT cand_id, centroid_id FROM ("
    " SELECT cand_id, centroid_id, row_number() OVER ("
    " PARTITION BY cand_id ORDER BY csim DESC, centroid_id) AS r"
    " FROM cand_sc WHERE csim IS NOT NULL) WHERE r = 1),"
    " q_sc AS (SELECT q.vec_id AS query_id, centroid_id,"
    f" {_cos_sql('q.embedding', 'centv')} AS csim"
    " FROM embeddings q, cents WHERE q.vec_id < 5),"
    " probes AS (SELECT query_id, centroid_id FROM ("
    " SELECT query_id, centroid_id, row_number() OVER ("
    " PARTITION BY query_id ORDER BY csim DESC, centroid_id) AS r"
    " FROM q_sc WHERE csim IS NOT NULL) WHERE r <= 3),"
    " short AS (SELECT query_id, cand_id, centroid_id"
    "  FROM assigned JOIN probes USING (centroid_id)),"
    " resid AS (SELECT a.cand_id, list_transform("
    "  range(1, len(e.embedding) + 1),"
    "  i -> CAST(e.embedding[i] AS DOUBLE) - CAST(ct.centv[i] AS DOUBLE))"
    "  AS rv FROM assigned a JOIN embeddings e ON e.vec_id = a.cand_id"
    "  JOIN cents ct USING (centroid_id)),"
    " sp AS (SELECT unnest([0, 1, 2, 3]) AS s),"
    # the PQ codebook: trained per-subspace Lloyd over the id%4 residual
    # sample, seeded by the k = N//64 smallest-id residuals — mirrors
    # residual_ivfpq_topk(train_iters=2, train_mod=4) exactly (rounded
    # L2 argmin with code tie-break, rounded per-dim means, empty codes
    # carry the previous centroid — the _kmeans_ctes discipline)
    " kk AS (SELECT least(greatest(1, count(*) // 64), 256) AS k"
    f"  FROM embeddings{kk_where}),"
    " cb0 AS (SELECT r.cand_id AS code, sp.s,"
    "  list_slice(r.rv, sp.s * 16 + 1, sp.s * 16 + 16) AS cent"
    f"  FROM resid r, sp, kk WHERE r.cand_id < kk.k{tr_and}),"
    " trs AS (SELECT r.cand_id, sp.s,"
    "  list_slice(r.rv, sp.s * 16 + 1, sp.s * 16 + 16) AS sub"
    f"  FROM resid r, sp WHERE r.cand_id % 4 = 0{tr_and}),"
    " t0s AS (SELECT t.cand_id, t.s, t.sub, c.code,"
    f" {_l2sq6_sql('t.sub', 'c.cent')} AS d FROM trs t JOIN cb0 c ON c.s = t.s),"
    " t0a AS (SELECT s, code, sub FROM ("
    "  SELECT t.s AS s, code, sub, row_number() OVER ("
    "   PARTITION BY cand_id, t.s ORDER BY d ASC, code) AS r"
    "  FROM t0s t WHERE d IS NOT NULL) WHERE r = 1),"
    " t0u AS (SELECT s, code, list(av ORDER BY i) AS cent FROM ("
    "  SELECT s, code, i, round(avg(val), 6) AS av FROM ("
    "   SELECT s, code, unnest(sub) AS val,"
    "    unnest(range(len(sub))) AS i FROM t0a)"
    "  GROUP BY s, code, i) GROUP BY s, code),"
    " cb1 AS (SELECT c.s, c.code, coalesce(u.cent, c.cent) AS cent"
    "  FROM cb0 c LEFT JOIN t0u u ON u.s = c.s AND u.code = c.code),"
    " t1s AS (SELECT t.cand_id, t.s, t.sub, c.code,"
    f" {_l2sq6_sql('t.sub', 'c.cent')} AS d FROM trs t JOIN cb1 c ON c.s = t.s),"
    " t1a AS (SELECT s, code, sub FROM ("
    "  SELECT t.s AS s, code, sub, row_number() OVER ("
    "   PARTITION BY cand_id, t.s ORDER BY d ASC, code) AS r"
    "  FROM t1s t WHERE d IS NOT NULL) WHERE r = 1),"
    " t1u AS (SELECT s, code, list(av ORDER BY i) AS cent FROM ("
    "  SELECT s, code, i, round(avg(val), 6) AS av FROM ("
    "   SELECT s, code, unnest(sub) AS val,"
    "    unnest(range(len(sub))) AS i FROM t1a)"
    "  GROUP BY s, code, i) GROUP BY s, code),"
    " cb2 AS (SELECT c.s, c.code, coalesce(u.cent, c.cent) AS cent"
    "  FROM cb1 c LEFT JOIN t1u u ON u.s = c.s AND u.code = c.code),"
    " cb AS (SELECT s, code, cent FROM cb2),"
    " csub AS (SELECT r.cand_id, sp.s,"
    "  list_slice(r.rv, sp.s * 16 + 1, sp.s * 16 + 16) AS sub"
    "  FROM resid r, sp"
    "  WHERE r.cand_id IN (SELECT cand_id FROM short)),"
    " enc AS (SELECT cand_id, c.s, c.code,"
    f" {_l2sq6_sql('sub', 'cent')} AS d"
    "  FROM csub JOIN cb c ON c.s = csub.s),"
    " codes AS (SELECT cand_id, s, code FROM ("
    "  SELECT cand_id, s, code, row_number() OVER ("
    "   PARTITION BY cand_id, s ORDER BY d ASC, code) AS rk"
    "  FROM enc WHERE d IS NOT NULL) WHERE rk = 1),"
    " qsub AS (SELECT e.vec_id AS query_id, sp.s,"
    "  list_slice(e.embedding, sp.s * 16 + 1, sp.s * 16 + 16) AS sub"
    "  FROM embeddings e, sp WHERE e.vec_id < 5),"
    " lut AS (SELECT query_id, c.s, c.code,"
    f" {_dot6_sql('sub', 'cent')} AS qd"
    "  FROM qsub JOIN cb c ON c.s = qsub.s),"
    " adc AS (SELECT sh.query_id, sh.cand_id, sh.centroid_id,"
    "  CAST(sum(qd) AS DECIMAL(18,6)) AS rsim"
    "  FROM short sh JOIN codes ON codes.cand_id = sh.cand_id"
    "  JOIN lut ON lut.query_id = sh.query_id AND lut.s = codes.s"
    "   AND lut.code = codes.code"
    "  WHERE sh.query_id <> sh.cand_id AND qd IS NOT NULL"
    "  GROUP BY 1, 2, 3),"
    " scored AS (SELECT a.query_id, a.cand_id,"
    f"  CAST({_dot6_sql('q.embedding', 'ct.centv')} + a.rsim"
    "   AS DECIMAL(18,6)) AS sim"
    "  FROM adc a JOIN embeddings q ON q.vec_id = a.query_id"
    "  JOIN cents ct ON ct.centroid_id = a.centroid_id)"
    " SELECT query_id, cand_id, CAST(sim AS DOUBLE) AS sim, rank FROM ("
    "  SELECT query_id, cand_id, sim, CAST(row_number() OVER ("
    "   PARTITION BY query_id ORDER BY sim DESC, cand_id) AS BIGINT)"
    "   AS rank FROM scored WHERE sim IS NOT NULL) WHERE rank <= 10"
    )


_RESIDUAL_IVFPQ_BODY = _residual_ivfpq_body()

_RESIDUAL_IVFPQ_ORACLE = (
    _kmeans_ctes(8, 3)
    + " cents AS (SELECT cid AS centroid_id, cv AS centv FROM c3),"
    + _RESIDUAL_IVFPQ_BODY
)


@query("ll95_residual_ivfpq_topk", oracle=_RESIDUAL_IVFPQ_ORACLE)
def ll95_residual_ivfpq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Residual-encoded IVF-PQ top-10, fully trained — ll79's
    configuration upgraded to the FAISS IVFPQ layout proper (VERDICT
    r6 item 2): trained coarse centroids (kmeans k=8, 3 iters), PQ of
    the RESIDUAL v − c(v) with a per-subspace codebook itself trained
    by 2 deterministic Lloyd iterations over the id%4 residual sample,
    L2 code assignment, and a score that is the exact q·c(v) plus the
    ADC estimate of q·(v − c(v)). At the same code budget (m=4
    subspaces, N//64 codes) this lifts recall@10 from ll79's 0.275 to
    ~0.46 on the scorecard fixture — both rows in the README
    scorecard, recall pinned by tests/test_llm_ops.py. The oracle
    composes the unrolled coarse-kmeans CTEs with the residual body
    AND the unrolled per-subspace codebook training, so coarse
    training, assignment, residuals, PQ training, codes, the coarse
    term, and the ranking are all value-checked in composition."""
    from ..operators import clustering

    emb = load(spark, sf_dir, "embeddings")
    cents = clustering.kmeans_fit(emb, k=8, iters=3).select(
        F.col("cid").alias("centroid_id"), F.col("cv").alias("centv")
    )
    out = similarity.residual_ivfpq_topk(
        emb.where(F.col("vec_id") < 5), emb, k=10, centroids=cents,
        train_iters=2, train_mod=4,
    )
    return out.select(
        "query_id",
        "cand_id",
        F.col("sim").cast("double").alias("sim"),
        "rank",
    )


@query("ll105_ann_index_persisted", oracle=_RESIDUAL_IVFPQ_ORACLE)
def ll105_ann_index_persisted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PERSISTED ANN INDEX — ll95's configuration through the ll63
    device (VERDICT r9 item 4): the trained residual IVF-PQ index
    (coarse centroids, residual codebook, every candidate's cell +
    codes, a params-stamp meta row) is WRITTEN TO PARQUET and read
    back before the queries probe it — how a 100 TB corpus serves ANN
    queries daily without re-reading candidate vectors or re-running
    Lloyd (ll95 retrains per session; the reference analog stashes its
    trained model at Trainer.scala:119 but re-trains per run). The
    probe path (residual_ann_index_topk) touches ONLY the artifacts:
    cell choice from the broadcast centroid table, shortlist = the
    persisted codes joined on the probed cells, ADC against the
    persisted codebook, exact q·c(v) re-added. The oracle is ll95's
    verbatim — hash-equality of the persisted-probe answer with the
    from-scratch chain IS the index-roundtrip-changes-nothing proof,
    and the parquet round-trip pins the artifact schemas as stable
    on-disk contracts (ll63's discipline). A probe with mismatched
    parameters refuses loudly (meta-stamp guard, tested)."""
    from ..operators import clustering
    from .relational_queries import sink_path

    emb = load(spark, sf_dir, "embeddings")
    cents = clustering.kmeans_fit(emb, k=8, iters=3).select(
        F.col("cid").alias("centroid_id"), F.col("cv").alias("centv")
    )
    frames = similarity.residual_ann_index_frames(
        emb, centroids=cents, train_iters=2, train_mod=4
    )
    root = sink_path("ll105_index", sf_dir)
    # independent single-directory writes, overlapped on driver
    # threads (guide §2.6; operators/io.write_frames); read-back uses
    # the writer frames' schemas — no footer-inference jobs (§1.2)
    write_frames(frames, root)
    index = {
        name_: spark.read.schema(df_.schema).parquet(
            f"{root}/{name_}.parquet"
        )
        for name_, df_ in frames.items()
    }
    out = similarity.residual_ann_index_topk(
        emb.where(F.col("vec_id") < 5), index, k=10,
        train_iters=2, train_mod=4,
    )
    return out.select(
        "query_id",
        "cand_id",
        F.col("sim").cast("double").alias("sim"),
        "rank",
    )


_LL106_ORACLE = (
    # The incremental-index contract in SQL: the quantizers are sampled
    # from the BASE slice only (vec_id % 5 <> 0 — ll45's split) and
    # FROZEN; every candidate (base ∪ delta = the whole table) is then
    # encoded against them — which is exactly what the base build +
    # O(delta) fold produces, because assignment and encoding are pure
    # per-vector functions of the frozen quantizers.
    # mod 23, not 25: every multiple of 25 is a multiple of 5, so a
    # %25 sample of the %5<>0 base slice would be EMPTY — 23 is
    # coprime with the split
    "WITH cents AS (SELECT vec_id AS centroid_id, embedding AS centv"
    " FROM embeddings WHERE vec_id % 23 = 0 AND vec_id % 5 <> 0),"
    " cand_sc AS (SELECT c.vec_id AS cand_id, centroid_id,"
    f" {_cos_sql('c.embedding', 'centv')} AS csim FROM embeddings c, cents),"
    " assigned AS (SELECT cand_id, centroid_id FROM ("
    " SELECT cand_id, centroid_id, row_number() OVER ("
    " PARTITION BY cand_id ORDER BY csim DESC, centroid_id) AS r"
    " FROM cand_sc WHERE csim IS NOT NULL) WHERE r = 1),"
    " q_sc AS (SELECT q.vec_id AS query_id, centroid_id,"
    f" {_cos_sql('q.embedding', 'centv')} AS csim"
    " FROM embeddings q, cents WHERE q.vec_id < 5),"
    " probes AS (SELECT query_id, centroid_id FROM ("
    " SELECT query_id, centroid_id, row_number() OVER ("
    " PARTITION BY query_id ORDER BY csim DESC, centroid_id) AS r"
    " FROM q_sc WHERE csim IS NOT NULL) WHERE r <= 3),"
    " short AS (SELECT query_id, cand_id, centroid_id"
    "  FROM assigned JOIN probes USING (centroid_id)),"
    " resid AS (SELECT a.cand_id, list_transform("
    "  range(1, len(e.embedding) + 1),"
    "  i -> CAST(e.embedding[i] AS DOUBLE) - CAST(ct.centv[i] AS DOUBLE))"
    "  AS rv FROM assigned a JOIN embeddings e ON e.vec_id = a.cand_id"
    "  JOIN cents ct USING (centroid_id)),"
    " sp AS (SELECT unnest([0, 1, 2, 3]) AS s),"
    # base-only mod-sampled residual codebook, capped (the frozen
    # artifact; the % 5 <> 0 term is what makes it base-only)
    " cb AS (SELECT r.cand_id AS code, sp.s,"
    "  list_slice(r.rv, sp.s * 16 + 1, sp.s * 16 + 16) AS cent"
    "  FROM resid r, sp WHERE r.cand_id % 64 = 0"
    "   AND r.cand_id < 16384 AND r.cand_id % 5 <> 0),"
    " csub AS (SELECT r.cand_id, sp.s,"
    "  list_slice(r.rv, sp.s * 16 + 1, sp.s * 16 + 16) AS sub"
    "  FROM resid r, sp"
    "  WHERE r.cand_id IN (SELECT cand_id FROM short)),"
    " enc AS (SELECT cand_id, c.s, c.code,"
    f" {_l2sq6_sql('sub', 'cent')} AS d"
    "  FROM csub JOIN cb c ON c.s = csub.s),"
    " codes AS (SELECT cand_id, s, code FROM ("
    "  SELECT cand_id, s, code, row_number() OVER ("
    "   PARTITION BY cand_id, s ORDER BY d ASC, code) AS rk"
    "  FROM enc WHERE d IS NOT NULL) WHERE rk = 1),"
    " qsub AS (SELECT e.vec_id AS query_id, sp.s,"
    "  list_slice(e.embedding, sp.s * 16 + 1, sp.s * 16 + 16) AS sub"
    "  FROM embeddings e, sp WHERE e.vec_id < 5),"
    " lut AS (SELECT query_id, c.s, c.code,"
    f" {_dot6_sql('sub', 'cent')} AS qd"
    "  FROM qsub JOIN cb c ON c.s = qsub.s),"
    " adc AS (SELECT sh.query_id, sh.cand_id, sh.centroid_id,"
    "  CAST(sum(qd) AS DECIMAL(18,6)) AS rsim"
    "  FROM short sh JOIN codes ON codes.cand_id = sh.cand_id"
    "  JOIN lut ON lut.query_id = sh.query_id AND lut.s = codes.s"
    "   AND lut.code = codes.code"
    "  WHERE sh.query_id <> sh.cand_id AND qd IS NOT NULL"
    "  GROUP BY 1, 2, 3),"
    " scored AS (SELECT a.query_id, a.cand_id,"
    f"  CAST({_dot6_sql('q.embedding', 'ct.centv')} + a.rsim"
    "   AS DECIMAL(18,6)) AS sim"
    "  FROM adc a JOIN embeddings q ON q.vec_id = a.query_id"
    "  JOIN cents ct ON ct.centroid_id = a.centroid_id)"
    " SELECT query_id, cand_id, CAST(sim AS DOUBLE) AS sim, rank FROM ("
    "  SELECT query_id, cand_id, sim, CAST(row_number() OVER ("
    "   PARTITION BY query_id ORDER BY sim DESC, cand_id) AS BIGINT)"
    "   AS rank FROM scored WHERE sim IS NOT NULL) WHERE rank <= 10"
)


@query("ll106_ann_index_delta_update", oracle=_LL106_ORACLE)
def ll106_ann_index_delta_update(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INCREMENTAL ANN-index update — the day-N story for the vector
    side, completing the ll63/ll100/ll105 persisted-state arc: the
    base slice (vec_id % 5 != 0, ll45's split) is indexed once and
    persisted (ll105's artifacts); the daily delta batch (vec_id % 5
    == 0) is FOLDED in by `residual_ann_index_update` — cell
    assignment with the frozen coarse centroids, residual encoding
    with the frozen codebook, a pure codes-table union; the base
    corpus is never re-read and nothing retrains, so absorbing the
    batch is O(delta). Because assignment and encoding are pure
    per-vector functions of the frozen quantizers (ll63's
    per-document-artifact property, per-vector here), the folded
    index is IDENTICAL to encoding base ∪ delta from scratch against
    the same quantizers — the oracle expresses precisely that
    (base-sampled frozen quantizers, all candidates encoded), so the
    fold's exactness is driver-value-checked, and the fold is
    associative (update(update(I,d1),d2) == update(I, d1 ∪ d2),
    pinned in tests). Quantizer drift (recall decay on a probe set)
    triggers a re-train — the ll104 re-curate discipline — never a
    silent in-place patch. The updated index round-trips through
    parquet before the probe, pinning the artifact schemas.

    Grain note: this registered row uses the CLOSED-FORM mod-sampled
    coarse grain (M = N/23 cells) so the oracle can reproduce the
    quantizers — the ll60/ll12 convention, whose N×M assignment is
    superlinear by design. The production configuration is ll105's
    trained fixed-k coarse quantizer: build with ``centroids=`` and
    every fold is O(delta·k). The FOLD CONTRACT being value-checked
    here is grain-independent."""
    from .relational_queries import sink_path

    emb = load(spark, sf_dir, "embeddings")
    base = emb.where(F.col("vec_id") % 5 != 0)
    delta = emb.where(F.col("vec_id") % 5 == 0)
    # mod 23 (coprime with the %5 split — %25 of the base slice is
    # empty, mirrored in the oracle comment)
    frames = similarity.residual_ann_index_frames(
        base, centroid_mod=23, train_iters=0
    )
    root = sink_path("ll106_index", sf_dir)
    write_frames(frames, root)  # guide §2.6: overlapped independent writes
    index = {
        name_: spark.read.schema(df_.schema).parquet(
            f"{root}/{name_}.parquet"
        )
        for name_, df_ in frames.items()
    }
    updated = similarity.residual_ann_index_update(index, delta)
    updated["codes"].write.mode("overwrite").parquet(
        f"{root}/codes_v1.parquet"
    )
    updated = dict(
        updated,
        codes=spark.read.schema(updated["codes"].schema).parquet(
            f"{root}/codes_v1.parquet"
        ),
    )
    out = similarity.residual_ann_index_topk(
        emb.where(F.col("vec_id") < 5), updated, k=10
    )
    return out.select(
        "query_id",
        "cand_id",
        F.col("sim").cast("double").alias("sim"),
        "rank",
    )


# ---------------------------------------------------------------------------
# ll107 — the TRAINED-grain incremental ANN fold (VERDICT r10 item 1)
# ---------------------------------------------------------------------------

_LL107_ORACLE = (
    # frozen quantizers trained on the BASE slice only (the "where"
    # param restricts Lloyd's corpus; base_pred restricts the residual
    # codebook's seed/training sample), every candidate encoded
    _kmeans_ctes(8, 3, where=" WHERE vec_id % 5 <> 0")
    + " cents AS (SELECT cid AS centroid_id, cv AS centv FROM c3),"
    + _residual_ivfpq_body("{c} % 5 <> 0")
)


@query("ll107_ann_index_delta_trained", oracle=_LL107_ORACLE)
def ll107_ann_index_delta_trained(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The PRODUCTION-grain incremental ANN fold (VERDICT r10 item 1):
    ll106's day-N fold contract run against ll105's TRAINED fixed-k
    artifacts — the configuration a 100 TB pipeline actually ships.
    The base slice (vec_id % 5 != 0, ll45's split) trains the frozen
    quantizers (kmeans k=8 coarse cells; 2-iteration Lloyd residual
    codebook over the base id%4 sample) and is indexed once; the daily
    delta batch (vec_id % 5 == 0) is folded by
    ``residual_ann_index_encode_delta`` — cell assignment and residual
    encoding against the FROZEN quantizers, written as a NEW codes
    partition (codes_d1.parquet) next to the base codes file, never
    rewriting it. The folded codes table is the plain multi-file read
    of both partitions: O(delta) fold compute AND O(delta) fold WRITE
    (ll106's registered row rewrites codes wholesale; this row is the
    write path the ss23 streaming twin drives per batch).

    Scale contrast with ll106 (the closed-form mod-23 grain kept for
    oracle-reproducible quantizers): assignment there is an N×(N/23)
    window — superlinear by design, sf10-unfinishable; here the
    quantizers are FIXED-k, so base build is O(N·k) and each fold is
    O(delta·k) — the sf10 probe completes (SCALE.md round-11). The
    fold contract itself (exact, associative, frozen-artifact) is
    grain-independent and identical to ll106's.

    Oracle: the trained-quantizer CTEs restricted to the base slice
    (``_kmeans_ctes(where=...)`` + ``_residual_ivfpq_body(base_pred)``)
    composed with the shared residual body over ALL candidates — the
    from-scratch encoding of base ∪ delta against base-trained frozen
    quantizers, which the fold must equal exactly (and the overlap
    guard keeps exact under replay, ADVICE r10 medium)."""
    emb, folded = _ll107_folded_index(spark, sf_dir)
    out = similarity.residual_ann_index_topk(
        emb.where(F.col("vec_id") < 5), folded, k=10,
        train_iters=2, train_mod=4,
    )
    return out.select(
        "query_id",
        "cand_id",
        F.col("sim").cast("double").alias("sim"),
        "rank",
    )


def _ll107_folded_index(
    spark: SparkSession, sf_dir: str, root_name: str = "ll107_index"
) -> tuple[DataFrame, dict[str, DataFrame]]:
    """ll107's build: base-trained persisted index + the delta folded
    as a batch-keyed codes partition (O(delta) write). Returns (emb,
    folded index dict) — shared by ll107 (probe) and ll108 (recall
    drift probe over the same snapshot)."""
    from ..operators import clustering
    from .relational_queries import sink_path

    emb = load(spark, sf_dir, "embeddings")
    base = emb.where(F.col("vec_id") % 5 != 0)
    delta = emb.where(F.col("vec_id") % 5 == 0)
    cents = clustering.kmeans_fit(base, k=8, iters=3).select(
        F.col("cid").alias("centroid_id"), F.col("cv").alias("centv")
    )
    frames = similarity.residual_ann_index_frames(
        base, centroids=cents, train_iters=2, train_mod=4
    )
    root = sink_path(root_name, sf_dir)
    write_frames(frames, root)  # guide §2.6: overlapped independent writes
    index = {
        name_: spark.read.schema(df_.schema).parquet(
            f"{root}/{name_}.parquet"
        )
        for name_, df_ in frames.items()
    }
    delta_codes = similarity.residual_ann_index_encode_delta(
        index, delta, train_iters=2, train_mod=4
    )
    delta_codes.write.mode("overwrite").parquet(f"{root}/codes_d1.parquet")
    folded = dict(
        index,
        codes=spark.read.schema(frames["codes"].schema).parquet(
            f"{root}/codes.parquet", f"{root}/codes_d1.parquet"
        ),
    )
    return emb, folded


def ll107_components(spark: SparkSession, sf_dir: str) -> dict:
    """Bench decomposition of ll107 (the ll104/ss21 device): the
    registered row conflates the once-per-snapshot trained-index BUILD
    (kmeans + residual Lloyd + full-corpus encode + parquet persist —
    ll105's cost, the cap-knee term between sf0.1 and sf1) with the
    RECURRING daily fold (delta encode against frozen quantizers + one
    O(delta) partition write) and the per-batch probe. Times the three
    separately — the recurring numbers are the production costs. Not a
    registered query (reports timings); bench.py records it next to
    ll107's headline row."""
    import time as _time

    from ..operators import clustering
    from .relational_queries import sink_path

    emb = load(spark, sf_dir, "embeddings")
    base = emb.where(F.col("vec_id") % 5 != 0)
    delta = emb.where(F.col("vec_id") % 5 == 0)
    t0 = _time.perf_counter()
    cents = clustering.kmeans_fit(base, k=8, iters=3).select(
        F.col("cid").alias("centroid_id"), F.col("cv").alias("centv")
    )
    frames = similarity.residual_ann_index_frames(
        base, centroids=cents, train_iters=2, train_mod=4
    )
    root = sink_path("ll107c_index", sf_dir)
    write_frames(frames, root)  # guide §2.6: overlapped independent writes
    index = {
        name_: spark.read.schema(df_.schema).parquet(
            f"{root}/{name_}.parquet"
        )
        for name_, df_ in frames.items()
    }
    build_s = _time.perf_counter() - t0

    t0 = _time.perf_counter()
    similarity.residual_ann_index_encode_delta(
        index, delta, train_iters=2, train_mod=4
    ).write.mode("overwrite").parquet(f"{root}/codes_d1.parquet")
    fold_s = _time.perf_counter() - t0

    folded = dict(
        index,
        codes=spark.read.schema(frames["codes"].schema).parquet(
            f"{root}/codes.parquet", f"{root}/codes_d1.parquet"
        ),
    )
    t0 = _time.perf_counter()
    similarity.residual_ann_index_topk(
        emb.where(F.col("vec_id") < 5), folded, k=10,
        train_iters=2, train_mod=4,
    ).toPandas()
    probe_s = _time.perf_counter() - t0
    return {
        "build_s": round(build_s, 4),
        "fold_s": round(fold_s, 4),
        "probe_s": round(probe_s, 4),
    }


_LL108_ORACLE = (
    # the ll52 recall-metric device with the approx tier swapped for
    # ll107's persisted-index chain: both sides' oracle texts embedded
    # verbatim, so the drift METRIC is value-checked in composition
    f"WITH exact AS ({_LL8_ORACLE}),"
    f" approx AS ({_LL107_ORACLE}),"
    # denominator = least(k, per-query exact count), mirroring
    # ann_index_recall_probe (ADVICE r11): at registered scale every
    # probe query has >= 10 exact neighbors so this reads /10.0, but
    # the metric no longer floors below 1.0 on small candidate sets.
    # The query universe is the PROBE SET (vec_id < 5), not exact's
    # survivors (ADVICE r12): a probe query with zero exact neighbors
    # must still emit a row (hits 0, recall NULL) exactly as the
    # engine's left joins do on degenerate/small fixtures
    " qn AS (SELECT query_id, count(*) AS ne FROM exact GROUP BY query_id),"
    " q AS (SELECT p.vec_id AS query_id, coalesce(qn.ne, 0) AS ne"
    "  FROM embeddings p LEFT JOIN qn ON qn.query_id = p.vec_id"
    "  WHERE p.vec_id < 5),"
    " hits AS (SELECT e.query_id, count(*) AS h FROM exact e"
    " JOIN approx a ON a.query_id = e.query_id AND a.cand_id = e.cand_id"
    " GROUP BY e.query_id)"
    " SELECT q.query_id, CAST(coalesce(h.h, 0) AS BIGINT) AS hits,"
    " CAST(coalesce(h.h, 0) / nullif(least(10, q.ne), 0) AS DOUBLE)"
    "  AS recall_at_10"
    " FROM q LEFT JOIN hits h ON h.query_id = q.query_id"
)


@query("ll108_ann_recall_drift", oracle=_LL108_ORACLE)
def ll108_ann_recall_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """QUANTIZER-DRIFT DETECTOR for the persisted ANN index (VERDICT
    r10 item 3 — the ll104 discipline applied to the vector tier):
    recall@10 of ll107's folded snapshot (base-trained frozen
    quantizers + delta fold) against exact brute-force cosine, per
    probe query. The fold itself is exact w.r.t. its frozen quantizers
    and can never degrade — what decays as folded deltas drift from
    the base training distribution is the quantizers' FIT, and
    "recall decay on a probe set" is the documented re-train trigger
    that was previously named but never emitted. A production pipeline
    runs this once per snapshot version after the day's fold and
    alerts when the aggregate drops below its re-train threshold
    (the planted-drift pytest folds a distribution-shifted delta and
    shows exactly that decay being detected).

    Scale: the exact side is the bounded-probe-sample contract of
    ll52 — |probe| × corpus narrow broadcast work, once per snapshot,
    never per user query; the approx side reads only the persisted
    artifacts. Oracle composes ll8's brute-force text with ll107's
    full chain, so the metric is value-checked in composition."""
    emb, folded = _ll107_folded_index(spark, sf_dir, "ll108_index")
    qv = emb.where(F.col("vec_id") < 5)
    return similarity.ann_index_recall_probe(
        qv, emb, folded, k=10, train_iters=2, train_mod=4
    ).select(
        "query_id",
        "hits",
        F.col("recall_at_k").cast("double").alias("recall_at_10"),
    )


# ---------------------------------------------------------------------------
# ll110 — re-train on drift: the ACTION half of the ANN detect→act
# loop (VERDICT r11 item 1)
# ---------------------------------------------------------------------------

_LL110_ORACLE = (
    # the full detect→act arc in SQL: recall of ll107's folded
    # base-trained snapshot (before), recall of the RETRAINED index —
    # quantizers re-fit over the union corpus, i.e. ll95's from-scratch
    # chain with no base restriction (after), both against ll8's exact
    # brute-force, same least(k, ne) denominator as ll108. The
    # retrained=true literal encodes the decision: the synthetic
    # corpus's PQ recall sits far below the 0.9 production target at
    # every sf, so the registered row always takes the ACT branch —
    # value-checking the retrained quantizers IN COMPOSITION.
    f"WITH exact AS ({_LL8_ORACLE}),"
    f" approx_b AS ({_LL107_ORACLE}),"
    f" approx_a AS ({_RESIDUAL_IVFPQ_ORACLE}),"
    # query universe = the probe set, not exact's survivors (ADVICE
    # r12, same fix as ll108): zero-exact-neighbor probe queries emit
    # NULL-recall rows on both sides
    " qn AS (SELECT query_id, count(*) AS ne FROM exact GROUP BY query_id),"
    " q AS (SELECT p.vec_id AS query_id, coalesce(qn.ne, 0) AS ne"
    "  FROM embeddings p LEFT JOIN qn ON qn.query_id = p.vec_id"
    "  WHERE p.vec_id < 5),"
    " hb AS (SELECT e.query_id, count(*) AS h FROM exact e"
    "  JOIN approx_b a ON a.query_id = e.query_id AND a.cand_id = e.cand_id"
    "  GROUP BY e.query_id),"
    " ha AS (SELECT e.query_id, count(*) AS h FROM exact e"
    "  JOIN approx_a a ON a.query_id = e.query_id AND a.cand_id = e.cand_id"
    "  GROUP BY e.query_id)"
    " SELECT q.query_id,"
    # index_version 2 = the act branch ran (from_version 1 + 1): the
    # versioned-root lineage the report carries for the catalog
    " CAST(2 AS INT) AS index_version,"
    " CAST(coalesce(hb.h, 0) / nullif(least(10, q.ne), 0) AS DOUBLE)"
    "  AS recall_before,"
    " CAST(coalesce(ha.h, 0) / nullif(least(10, q.ne), 0) AS DOUBLE)"
    "  AS recall_after,"
    " TRUE AS retrained"
    " FROM q LEFT JOIN hb ON hb.query_id = q.query_id"
    " LEFT JOIN ha ON ha.query_id = q.query_id"
)


@query("ll110_ann_retrain_on_drift", oracle=_LL110_ORACLE)
def ll110_ann_retrain_on_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RE-TRAIN ON DRIFT — the ACTION half of the ANN detect→act loop
    (VERDICT r11 item 1; ll108 is the detect half, closing the
    ll104→ll109 asymmetry for the vector tier): probe recall@10 of
    ll107's folded snapshot (base-trained frozen quantizers + delta
    fold), and when the mean breaches the production recall target
    (threshold 0.9), RE-TRAIN the quantizers over the CURRENT corpus
    (base ∪ folded delta — the distribution the old quantizers drifted
    away from), re-encode every candidate, persist to a fresh
    versioned root via ``residual_ann_index_persist`` (the enforced
    never-in-place rule; the superseded root is then dead and
    deletable), and re-probe — emitting per probe query
    (index_version, recall_before, recall_after, retrained), the
    version incremented past the probed snapshot's when the act
    branch ran.

    On the synthetic near-orthogonal corpus PQ recall sits far below
    0.9 at every sf, so this registered row always exercises the FULL
    act path; the oracle composes ll8's exact chain with BOTH index
    chains (ll107's base-trained fold for before; ll95's union-trained
    from-scratch chain for after — exactly what retraining over
    base ∪ delta produces), so the retrained quantizers are
    driver-value-checked in composition. Recall RECOVERY (after >>
    before on a distribution-shifted delta, and the no-op branch when
    recall holds) is pinned by the planted-drift pytest — the fixture
    where the trigger exists.

    Scale: detect/verify are ll52's bounded-probe contract; the
    retrain is ll105's build cost, paid only when the trigger fires —
    the rare distribution-shift event, never the daily fold."""
    from .relational_queries import sink_path

    emb, folded = _ll107_folded_index(spark, sf_dir, "ll110_index")
    qv = emb.where(F.col("vec_id") < 5)
    res = similarity.ann_index_retrain_on_drift(
        qv, emb, folded, root=sink_path("ll110_index_v2", sf_dir),
        threshold=0.9, k=10, train_iters=2, train_mod=4,
    )
    return res["report"].select(
        "query_id",
        "index_version",
        F.col("recall_before").cast("double").alias("recall_before"),
        F.col("recall_after").cast("double").alias("recall_after"),
        "retrained",
    )


def ll110_components(spark: SparkSession, sf_dir: str) -> dict:
    """Bench decomposition of ll110 (the ll107_components device): the
    registered row conflates the DAY-0 build it shares with ll107/ll108
    (trained index + fold — once per snapshot), the recurring DETECT
    probe (recall before — the only per-snapshot cost when the trigger
    does NOT fire), and the rare ACT path (retrain + persist + verify
    probe — paid on distribution shift only). Times the three
    separately; not a registered query (reports timings)."""
    import time as _time

    from .relational_queries import sink_path

    t0 = _time.perf_counter()
    emb, folded = _ll107_folded_index(spark, sf_dir, "ll110c_index")
    for name_ in folded:
        folded[name_].count()
    build_s = _time.perf_counter() - t0

    qv = emb.where(F.col("vec_id") < 5)
    t0 = _time.perf_counter()
    before = similarity.ann_index_recall_probe(
        qv, emb, folded, k=10, train_iters=2, train_mod=4
    )
    mean_before = before.agg(F.avg("recall_at_k")).collect()[0][0]
    detect_s = _time.perf_counter() - t0

    t0 = _time.perf_counter()
    res = similarity.ann_index_retrain_on_drift(
        qv, emb, folded, root=sink_path("ll110c_index_v2", sf_dir),
        threshold=0.9, k=10, train_iters=2, train_mod=4,
    )
    res["report"].toPandas()
    act_s = _time.perf_counter() - t0
    return {
        "build_s": round(build_s, 4),
        "detect_s": round(detect_s, 4),
        # act_s includes its own detect pass (the operator re-probes);
        # the marginal retrain+verify cost is act_s - detect_s
        "act_s": round(act_s, 4),
        "recall_before": round(float(mean_before), 4),
    }


# ---------------------------------------------------------------------------
# ll61 — asymmetric shingle containment (quote / superset detection)
# ---------------------------------------------------------------------------

_CONTAIN_ORACLE = (
    f"WITH aug AS ({_AUG_SQL}),"
    f" tok AS (SELECT doc_id, {_TOKENS_SQL} AS tokens FROM aug),"
    " sh AS (SELECT doc_id, list_distinct(CASE WHEN len(tokens) >= 3 THEN"
    "   list_transform(range(1, len(tokens) - 1),"
    "     i -> tokens[i] || ' ' || tokens[i+1] || ' ' || tokens[i+2])"
    "   ELSE [] END) AS shingles FROM tok),"
    " nz AS (SELECT doc_id, shingles, len(shingles) AS n_sh FROM sh"
    "   WHERE len(shingles) > 0),"
    " inv0 AS (SELECT doc_id, unnest(shingles) AS shingle FROM nz),"
    # the df-cutoff is part of the REGISTERED operator (not just a
    # scale option): shingles in > 50 docs are boilerplate whose df^2
    # join cost dominates; |S(a)| keeps counting them, so surviving
    # containments only under-count — same contract as ll5's guard
    " rare AS (SELECT shingle FROM inv0 GROUP BY shingle"
    "   HAVING count(*) <= 50),"
    " inv AS (SELECT doc_id, shingle FROM inv0"
    "   WHERE shingle IN (SELECT shingle FROM rare)),"
    " inter AS (SELECT a.doc_id AS u, b.doc_id AS v, count(*) AS i"
    "   FROM inv a JOIN inv b ON a.shingle = b.shingle"
    "    AND a.doc_id < b.doc_id"
    "   GROUP BY a.doc_id, b.doc_id),"
    " both_dirs AS ("
    "  SELECT u AS doc_a, v AS doc_b, i * 1.0 / nu.n_sh AS containment"
    "   FROM inter JOIN nz nu ON nu.doc_id = u"
    "  UNION ALL"
    "  SELECT v AS doc_a, u AS doc_b, i * 1.0 / nv.n_sh AS containment"
    "   FROM inter JOIN nz nv ON nv.doc_id = v)"
    " SELECT doc_a, doc_b,"
    " CAST(CAST(round(containment, 6) AS DECIMAL(18,6)) AS DOUBLE)"
    "  AS containment"
    " FROM both_dirs WHERE containment >= 0.8"
)


@query("ll61_containment_pairs", oracle=_CONTAIN_ORACLE)
def ll61_containment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric 3-gram containment join at threshold 0.8 over the
    augmented corpus: C(a→b) = |S(a)∩S(b)| / |S(a)| — the quote /
    superset detector Jaccard (ll5) structurally misses (a short doc
    embedded in a long one has tiny J but containment ≈ 1 short→long),
    and the signal for keeping the SUPERSET member of a near-dup pair.
    Planted exact copies surface at 1.0 in both directions. Same
    inverted-index dataflow as ll5, and the df-cutoff guard
    (max_shingle_df=50, mirrored in the oracle) runs IN the registered
    query: without it the boilerplate shingles of the shared-pool
    synthetic texts blow the join up df²-fold (26 s at sf0.1 measured;
    ~1 s with the guard), and dropped index keys only ever under-count
    intersections, so every surviving containment is a lower bound.
    The intersection is computed once per unordered pair, both
    directions derived arithmetically."""
    pairs = dedup.containment_pairs(
        _augmented(spark, sf_dir), "doc_id", "text", k=3, threshold=0.8,
        max_shingle_df=50,
    )
    return pairs.select(
        "doc_a",
        "doc_b",
        F.round("containment", 6).cast("decimal(18,6)").cast("double")
        .alias("containment"),
    )


# ---------------------------------------------------------------------------
# ll62 — BPE merge training (tokenizer-training step, value-checked)
# ---------------------------------------------------------------------------


def _bpe_oracle(n_merges: int) -> str:
    """Unrolled BPE training rounds. Every round CTE is MATERIALIZED —
    round k references round k-1 twice (pair count + merge apply), so
    inlining would re-expand the whole prefix 2^k times (the g5 CTE
    trap). The merge fold is list_reduce seeded with the first symbol,
    exactly the Spark F.aggregate in operators/bpe._merge_fold."""
    parts = [
        f"WITH tok AS (SELECT unnest({_TOKENS_SQL}) AS w FROM documents),",
        " vocab AS (SELECT w, count(*) AS cnt FROM tok GROUP BY w),",
        " w0 AS MATERIALIZED (SELECT array_to_string("
        "list_transform(range(1, length(w) + 1), i -> substr(w, i, 1)),"
        " '|') AS s, cnt FROM vocab)",
    ]
    for k in range(1, n_merges + 1):
        parts.append(
            f", p{k} AS MATERIALIZED (SELECT syms[i] AS l, syms[i+1] AS r,"
            " sum(cnt) AS total"
            " FROM (SELECT cnt, syms, unnest(range(1, len(syms))) AS i"
            f"  FROM (SELECT string_split(s, '|') AS syms, cnt FROM w{k-1})"
            "  WHERE len(syms) >= 2) GROUP BY 1, 2)"
        )
        parts.append(
            f", b{k} AS MATERIALIZED (SELECT l, r, l || r AS m, total"
            f" FROM p{k} ORDER BY total DESC, l, r LIMIT 1)"
        )
        if k < n_merges:
            parts.append(
                f", w{k} AS MATERIALIZED (SELECT"
                " list_reduce(string_split(s, '|'), (acc, x) ->"
                " CASE WHEN string_split(acc, '|')[-1] = b.l AND x = b.r"
                " THEN substr(acc, 1, length(acc) - length(b.l)) || b.m"
                " ELSE acc || '|' || x END) AS s, cnt"
                f" FROM w{k-1}, b{k} b)"
            )
    parts.append(
        " "
        + " UNION ALL ".join(
            f"SELECT CAST({k} AS INT) AS merge_idx, l AS left_sym,"
            f" r AS right_sym, m AS merged, CAST(total AS BIGINT)"
            f" AS pair_count FROM b{k}"
            for k in range(1, n_merges + 1)
        )
    )
    return "".join(parts)


@query("ll62_bpe_merges", oracle=_bpe_oracle(5))
def ll62_bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE tokenizer TRAINING on the corpus — 5 merge rounds, each the
    corpus-wide argmax adjacent symbol pair (count desc, lexicographic
    tie-break), greedily applied left-to-right. ll25 applies a
    tokenizer; this trains one, and deterministically, so the DuckDB
    oracle replays every round (pair counts, the winning merge, AND
    the fold that rewrites the vocabulary) — the whole training loop
    is value-checked. All rounds run on the distinct-word vocabulary
    weighted by counts: the corpus is scanned exactly once, so 100 TB
    of text costs one tokenize pass plus vocab-sized rounds."""
    from ..operators.bpe import bpe_merge_table

    return bpe_merge_table(load(spark, sf_dir, "documents"), n_merges=5)


# ---------------------------------------------------------------------------
# ll63 — incremental dedup against a PERSISTED snapshot index
# ---------------------------------------------------------------------------

# no-cutoff pair list: with the cutoff removed every shingle is kept,
# making each index artifact a pure per-document function — the
# property that lets a frozen parquet snapshot index union with fresh
# delta artifacts and still equal a from-scratch indexing.
_MINHASH_ORACLE_NOCUT = _minhash_oracle_over(_AUG_SQL, max_shingle_df=None)

_INCR_PERSIST_ORACLE = (
    f"WITH p AS ({_MINHASH_ORACLE_NOCUT}),"
    f" aug AS ({_AUG_SQL}),"
    " delta AS (SELECT doc_id FROM aug WHERE doc_id % 5 = 0),"
    " both_dirs AS (SELECT doc_a AS d, doc_b AS o FROM p"
    "  UNION ALL SELECT doc_b AS d, doc_a AS o FROM p),"
    " m AS (SELECT d AS doc_id, min(o) AS dup_of FROM both_dirs"
    "  WHERE d % 5 = 0 AND (o % 5 <> 0 OR o < d) GROUP BY d)"
    " SELECT delta.doc_id, m.dup_of IS NOT NULL AS dropped, m.dup_of"
    " FROM delta LEFT JOIN m USING (doc_id)"
)


@query("ll63_incremental_dedup_persisted", oracle=_INCR_PERSIST_ORACLE)
def ll63_incremental_dedup_persisted(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The PRODUCTION shape of ll45: the snapshot's MinHash index
    artifacts — (doc_id, shingles, sig) and the (doc_id, band, bhash)
    band table — are WRITTEN TO PARQUET and read back before the delta
    probes them, exactly how a 100 TB corpus absorbs a daily batch
    without re-tokenizing the snapshot (ll45 rebuilds both sides
    in-memory each run; here only the delta's artifacts are computed
    at probe time). No df-cutoff, so every artifact is a pure
    per-document function and the frozen-index verdicts are provably
    identical to a from-scratch dedup — which is exactly what the
    oracle asserts, deriving expected verdicts from the no-cutoff full
    pair list. The round-trip through parquet also pins the artifact
    schemas as stable on-disk contracts."""
    from .relational_queries import sink_path

    corpus = _augmented(spark, sf_dir)
    snapshot = corpus.where(F.col("doc_id") % 5 != 0)
    delta = corpus.where(F.col("doc_id") % 5 == 0)
    sh, banded = dedup.build_minhash_index(snapshot, "doc_id", "text", k=3)
    base = sink_path("ll63_index", sf_dir)
    write_frames({"sh": sh, "banded": banded}, base)  # §2.6 overlap
    sh_l = spark.read.parquet(f"{base}/sh.parquet")
    banded_l = spark.read.parquet(f"{base}/banded.parquet")
    return dedup.minhash_dedup_incremental(
        snapshot, delta, "doc_id", "text", k=3, threshold=0.4,
        snapshot_index=(sh_l, banded_l),
    )


# ---------------------------------------------------------------------------
# ll64 — per-source quality-score percentile calibration
# ---------------------------------------------------------------------------

_LL64_ORACLE = (
    f"WITH tok AS (SELECT doc_id, source, text, {_TOKENS_SQL} AS tokens"
    "  FROM documents),"
    " q AS (SELECT doc_id, source,"
    "  CAST(round("
    "   least(len(tokens) / 100.0, 1.0) * 0.4"
    f"  + coalesce(CASE WHEN len(tokens) = 0 THEN NULL ELSE"
    f"    {_HITS.format(words=_EN)} * 1.0 / len(tokens) END, 0.0) * 0.4"
    "   + (1.0 - least(coalesce(CASE WHEN length(text) = 0 THEN NULL ELSE"
    "     length(regexp_replace(text, '[^.,;:!?]', '', 'g')) * 1.0 /"
    "     length(text) END, 1.0) * 5.0, 1.0)) * 0.2"
    "  , 6) AS DECIMAL(18,6)) AS qs FROM tok),"
    " r AS (SELECT doc_id, source, qs, percent_rank() OVER"
    "  (PARTITION BY source ORDER BY qs, doc_id) AS pct FROM q)"
    " SELECT doc_id, source, CAST(qs AS DOUBLE) AS quality_score,"
    " CAST(CAST(round(pct, 6) AS DECIMAL(18,6)) AS DOUBLE) AS source_pct,"
    " pct >= 0.2 AS keep FROM r"
)


@query("ll64_quality_calibration", oracle=_LL64_ORACLE)
def ll64_quality_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source quality-score CALIBRATION: a single global threshold
    on ll1's quality score systematically starves sources whose style
    differs from the stopword/punctuation priors (code, non-English),
    so production corpora gate on the score's percentile WITHIN each
    source instead (CCNet-style per-shard quantile buckets). percent_
    rank over (source, score) gives every source the same survival
    rate by construction; `keep` drops each source's bottom 20%.

    Ranking happens on the 6dp-DECIMAL-rounded score with doc_id as
    the tiebreak so the permutation — hence every percentile — is
    engine-independent; the keep comparison runs on the unrounded
    (rank-1)/(n-1) double, identical IEEE arithmetic in both engines.

    Scale: one hash exchange on source + in-partition sort — the same
    shape as any windowed rank. Sources are few and fat, so skew is
    the real risk at 100 TB; the mitigation is the usual two-phase
    quantile path (approx per-partition histograms merged driver-side,
    x1-style), which trades exact ranks for bounded-error thresholds —
    exact ranks only matter for the oracle, not the gate."""
    docs = load(spark, sf_dir, "documents")
    tokens = T.tokenize(F.col("text"))
    q = T.quality_features(F.col("text"), tokens)
    scored = docs.select(
        "doc_id",
        "source",
        F.round(q["quality_score"], 6).cast("decimal(18,6)").alias("qs"),
    )
    pct = F.percent_rank().over(
        W.partitionBy("source").orderBy("qs", "doc_id")
    )
    return scored.select(
        "doc_id",
        "source",
        F.col("qs").cast("double").alias("quality_score"),
        F.round(pct, 6).cast("decimal(18,6)").cast("double").alias(
            "source_pct"
        ),
        (pct >= 0.2).alias("keep"),
    )


_LL65_GRAM8 = " || ' ' || ".join(f"tokens[i+{j}]" for j in range(8))
_LL65_ORACLE = (
    f"WITH aug AS ({_AUG_SQL}),"
    f" tok AS (SELECT doc_id, {_TOKENS_SQL} AS tokens FROM aug),"
    " gr AS (SELECT doc_id, CASE WHEN len(tokens) >= 8 THEN"
    f"   list_transform(range(1, len(tokens) - 6), i -> {_hex10(f'({_LL65_GRAM8})')})"
    "   ELSE [] END AS ghs FROM tok),"
    # two unnests in one SELECT zip in DuckDB: (0-based pos, gram hash)
    " pos AS (SELECT doc_id, unnest(range(len(ghs))) AS pos,"
    "   unnest(ghs) AS g FROM gr),"
    " shared AS (SELECT g FROM pos GROUP BY g"
    "   HAVING count(DISTINCT doc_id) >= 2),"
    " hits AS (SELECT doc_id, pos FROM pos"
    "   WHERE g IN (SELECT g FROM shared)),"
    " isl AS (SELECT doc_id, pos, CASE WHEN pos - lag(pos) OVER"
    "   (PARTITION BY doc_id ORDER BY pos) = 1 THEN 0 ELSE 1 END AS brk"
    "   FROM hits),"
    " isl2 AS (SELECT doc_id, pos, sum(brk) OVER"
    "   (PARTITION BY doc_id ORDER BY pos) AS island FROM isl)"
    " SELECT doc_id, CAST(min(pos) AS INT) AS span_start,"
    " CAST(max(pos) + 7 AS INT) AS span_end,"
    " CAST(max(pos) + 7 - min(pos) + 1 AS INT) AS span_tokens"
    " FROM isl2 GROUP BY doc_id, island"
)


@query("ll65_cross_doc_substrings", oracle=_LL65_ORACLE)
def ll65_cross_doc_substrings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document repeated-substring spans (the ExactSubstr tier,
    Lee et al. 2022 — VERDICT r4 item 5): maximal token runs whose
    every 8-gram window appears in >= 2 distinct documents, merged per
    doc with one gaps-and-islands window. Complements ll56 (fixed-
    boundary segments, within-doc included) and ll46 (winnowing
    fingerprints, sampled): this one is exact, arbitrary-offset, and
    strictly cross-document, with NO pair join — candidate volume is
    token positions, linear in the corpus even for boilerplate shared
    by millions of docs. The 40-bit portable gram hash keeps the
    dataflow oracle-reproducible (dedup.portable_hash40 twin)."""
    spans = dedup.cross_doc_repeated_spans(
        _augmented(spark, sf_dir), "doc_id", "text", min_len=8, min_docs=2
    )
    return spans.select(
        "doc_id",
        F.col("span_start").cast("int").alias("span_start"),
        F.col("span_end").cast("int").alias("span_end"),
        F.col("span_tokens").cast("int").alias("span_tokens"),
    )


def _bpe_encode_oracle(n: int, final_select: str | None = None) -> str:
    """ll66: _bpe_oracle's training rounds (same MATERIALIZED-CTE
    discipline) plus an encode chain that carries the WORD through the
    same fold, then re-joins the corpus positions — train→apply,
    value-checked end to end. ``final_select`` overrides the per-doc
    default (ll86 aggregates the same encode to source grain)."""
    fold = (
        "list_reduce(string_split(s, '|'), (acc, x) ->"
        " CASE WHEN string_split(acc, '|')[-1] = b.l AND x = b.r"
        " THEN substr(acc, 1, length(acc) - length(b.l)) || b.m"
        " ELSE acc || '|' || x END)"
    )
    char_split = (
        "array_to_string(list_transform(range(1, length(w) + 1),"
        " i -> substr(w, i, 1)), '|')"
    )
    parts = [
        f"WITH tok AS (SELECT doc_id, {_TOKENS_SQL} AS tokens FROM documents),",
        " words AS (SELECT doc_id, unnest(tokens) AS w,"
        "  unnest(range(len(tokens))) AS pos FROM tok),",
        " vocab AS (SELECT w, count(*) AS cnt FROM words GROUP BY w),",
        f" w0 AS MATERIALIZED (SELECT {char_split} AS s, cnt FROM vocab)",
    ]
    for k in range(1, n + 1):
        parts.append(
            f", p{k} AS MATERIALIZED (SELECT syms[i] AS l, syms[i+1] AS r,"
            " sum(cnt) AS total"
            " FROM (SELECT cnt, syms, unnest(range(1, len(syms))) AS i"
            f"  FROM (SELECT string_split(s, '|') AS syms, cnt FROM w{k-1})"
            "  WHERE len(syms) >= 2) GROUP BY 1, 2)"
        )
        parts.append(
            f", b{k} AS MATERIALIZED (SELECT l, r, l || r AS m, total"
            f" FROM p{k} ORDER BY total DESC, l, r LIMIT 1)"
        )
        if k < n:
            parts.append(
                f", w{k} AS MATERIALIZED (SELECT {fold} AS s, cnt"
                f" FROM w{k-1}, b{k} b)"
            )
    parts.append(
        f", e0 AS MATERIALIZED (SELECT w, {char_split} AS s FROM vocab)"
    )
    for k in range(1, n + 1):
        parts.append(
            f", e{k} AS MATERIALIZED (SELECT w, {fold} AS s"
            f" FROM e{k-1}, b{k} b)"
        )
    if final_select is None:
        final_select = (
            " SELECT doc_id, count(*) AS n_words,"
            " CAST(sum(len(string_split(e.s, '|'))) AS BIGINT) AS n_tokens,"
            " md5(string_agg(e.s, ' ' ORDER BY pos)) AS enc_md5"
            f" FROM words JOIN e{n} e USING (w) GROUP BY doc_id"
        )
    parts.append(final_select)
    return "".join(parts)


@query("ll66_bpe_encode", oracle=_bpe_encode_oracle(5))
def ll66_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE ENCODE with the trained table (VERDICT r4 item 6): ll62
    trains the 5-merge table, this applies it back to the corpus —
    distinct words encoded once through the same greedy fold, corpus
    re-joined on the word — completing the train→apply loop. The
    oracle replays training AND encoding, so token counts and the
    per-doc encoded-stream md5 are value-checked, not rows-only."""
    from ..operators.bpe import bpe_encode, bpe_merge_table

    docs = load(spark, sf_dir, "documents")
    return bpe_encode(docs, bpe_merge_table(docs, n_merges=5))


_QS6_SQL = (  # ll21/ll64's quality score over (doc_id, text, tokens) rows
    "CAST(round("
    " least(len(tokens) / 100.0, 1.0) * 0.4"
    f" + coalesce(CASE WHEN len(tokens) = 0 THEN NULL ELSE"
    f"   {_HITS.format(words=_EN)} * 1.0 / len(tokens) END, 0.0) * 0.4"
    " + (1.0 - least(coalesce(CASE WHEN length(text) = 0 THEN NULL ELSE"
    "   length(regexp_replace(text, '[^.,;:!?]', '', 'g')) * 1.0 /"
    "   length(text) END, 1.0) * 5.0, 1.0)) * 0.2"
    ", 6) AS DECIMAL(18,6))"
)

_LL67_ORACLE = (
    f"WITH RECURSIVE pairs AS (SELECT * FROM ( {_MINHASH_ORACLE} ) mh),"
    " sym AS (SELECT doc_a AS src, doc_b AS dst FROM pairs"
    "   UNION SELECT doc_b, doc_a FROM pairs),"
    " nodes AS (SELECT DISTINCT src AS v FROM sym),"
    " reach(v, lbl) AS ("
    "   SELECT v, v FROM nodes"
    "   UNION"
    "   SELECT s.dst, r.lbl FROM reach r JOIN sym s ON s.src = r.v),"
    " comp AS (SELECT v AS doc_id, min(lbl) AS cluster FROM reach"
    "   GROUP BY v),"
    f" aug AS ({_AUG_SQL}),"
    f" tokd AS (SELECT doc_id, text, {_TOKENS_SQL} AS tokens FROM aug),"
    f" q AS (SELECT doc_id, {_QS6_SQL} AS qs FROM tokd),"
    " m AS (SELECT c.doc_id, c.cluster, q.qs FROM comp c JOIN q USING (doc_id))"
    " SELECT doc_id, cluster, CAST(qs AS DOUBLE) AS quality_score,"
    " row_number() OVER (PARTITION BY cluster"
    "   ORDER BY qs DESC, doc_id) = 1 AS keep"
    " FROM m"
)


@query("ll67_cluster_quality_keeper", oracle=_LL67_ORACLE)
def ll67_cluster_quality_keeper(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-aware dedup DECISION: per near-dup cluster (ll23's CC
    over the MinHash-LSH pair graph), keep the member with the HIGHEST
    quality score (ll21's scorer) instead of ll23's lowest-id rule —
    the production policy: when a document survives in five scraped
    variants, the corpus should retain the cleanest one, not the one
    with the smallest key. Argmax is deterministic — the score is
    rounded to 6dp DECIMAL before ranking with doc_id as the tiebreak
    (the ll64 device), so both engines pick identical keepers.

    Scale shape: CC runs on the pair graph only (docs with >= 1
    near-dup); the quality join adds one doc-keyed hash join against
    the cluster membership (a tiny fraction of the corpus) and one
    cluster-partitioned window."""
    from ..operators import graph

    aug = _augmented(spark, sf_dir)
    pairs = dedup.minhash_lsh_pairs(
        aug, "doc_id", "text", k=3, threshold=0.4, max_shingle_df=0.5
    )
    comp = graph.connected_components(pairs, src="doc_a", dst="doc_b")
    q = T.quality_features(F.col("text"), T.tokenize(F.col("text")))
    scored = aug.select(
        "doc_id",
        F.round(q["quality_score"], 6).cast("decimal(18,6)").alias("qs"),
    )
    mem = comp.select(
        F.col("vertex").alias("doc_id"), F.col("component").alias("cluster")
    ).join(scored, "doc_id")
    rk = F.row_number().over(
        W.partitionBy("cluster").orderBy(F.col("qs").desc(), F.col("doc_id"))
    )
    return mem.select(
        "doc_id",
        "cluster",
        F.col("qs").cast("double").alias("quality_score"),
        (rk == 1).alias("keep"),
    )


_LL68_ORACLE = (
    f"WITH aug AS ({_AUG_SQL}),"
    f" tok AS (SELECT doc_id, {_TOKENS_SQL} AS tokens FROM aug),"
    " gr AS (SELECT doc_id, CASE WHEN len(tokens) >= 8 THEN"
    f"   list_transform(range(1, len(tokens) - 6), i -> {_hex10(f'({_LL65_GRAM8})')})"
    "   ELSE [] END AS ghs FROM tok),"
    " pos AS (SELECT doc_id, unnest(ghs) AS g FROM gr),"
    " shared AS (SELECT g FROM pos GROUP BY g"
    "   HAVING count(DISTINCT doc_id) >= 2)"
    " SELECT doc_id, CAST(count(*) AS BIGINT) AS n_grams,"
    " CAST(sum(CASE WHEN g IN (SELECT g FROM shared) THEN 1 ELSE 0 END)"
    "  AS BIGINT) AS n_shared,"
    " round(sum(CASE WHEN g IN (SELECT g FROM shared) THEN 1 ELSE 0 END)"
    "  * 1.0 / count(*), 6) AS dup_ratio"
    " FROM pos GROUP BY doc_id"
)


@query("ll68_duplication_profile", oracle=_LL68_ORACLE)
def ll68_duplication_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc duplication profile — the scalar companion of ll65's
    span tier: fraction of each doc's 8-gram windows occurring in
    >= 2 distinct documents (planted exact copies score 1.0). The
    corpus-contamination ranking a pipeline consults BEFORE choosing
    between span excision (ll65) and whole-doc dedup (ll4-ll7)."""
    return dedup.gram_duplication_profile(
        _augmented(spark, sf_dir), "doc_id", "text", min_len=8, min_docs=2
    )


_LL69_ORACLE = (
    f"WITH tok0 AS (SELECT doc_id, {_TOKENS_SQL} AS tokens FROM documents),"
    " toks AS (SELECT doc_id, unnest(tokens) AS token FROM tok0),"
    " vocab AS (SELECT token, count(*) AS c FROM toks GROUP BY token),"
    " n AS (SELECT sum(c) AS n FROM vocab),"
    " sc AS (SELECT doc_id, round(avg(-ln(c * 1.0 / n.n)), 6) AS nlp"
    "   FROM toks JOIN vocab USING (token) CROSS JOIN n GROUP BY doc_id),"
    " lb AS (SELECT d.doc_id, d.lang, sc.nlp,"
    "   ntile(3) OVER (PARTITION BY d.lang ORDER BY sc.nlp, d.doc_id) AS b"
    "   FROM documents d JOIN sc USING (doc_id))"
    " SELECT doc_id, lang, CAST(nlp AS DOUBLE) AS avg_neg_logprob,"
    " CASE b WHEN 1 THEN 'head' WHEN 2 THEN 'middle' ELSE 'tail' END"
    "  AS bucket, b <= 2 AS keep FROM lb"
)


@query("ll69_perplexity_buckets", oracle=_LL69_ORACLE)
def ll69_perplexity_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style perplexity bucketing (Wenzek et al. 2020): score
    every doc with the corpus-unigram LM proxy (ll32's
    avg -log p(token)), then split EACH LANGUAGE into head / middle /
    tail terciles of the score — the canonical 'keep head+middle,
    drop tail' web-corpus gate, language-balanced by construction
    (the same reason ll64 calibrates per source: a global cutoff
    starves whole languages). ntile runs on the 6dp-rounded score
    with doc_id as tiebreak, so the permutation — hence every bucket
    boundary — is engine-independent.

    Scale: the LM is one token-keyed grouped count (vocab-bounded);
    scoring is a token equi-join + doc-keyed average; bucketing is
    one lang-partitioned window — the ll64 shape, same two-phase
    approximate-quantile escape hatch at extreme skew."""
    docs = load(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.explode(T.tokenize(F.col("text"))).alias("token")
    )
    vocab = toks.groupBy("token").agg(F.count(F.lit(1)).alias("c"))
    n = vocab.agg(F.sum("c").alias("n"))
    sc = (
        toks.join(vocab, "token")
        .crossJoin(F.broadcast(n))
        .groupBy("doc_id")
        .agg(
            F.round(
                F.avg(-F.log(F.col("c") * F.lit(1.0) / F.col("n"))), 6
            ).alias("nlp")
        )
    )
    b = F.ntile(3).over(
        W.partitionBy("lang").orderBy(F.col("nlp"), F.col("doc_id"))
    )
    lb = docs.select("doc_id", "lang").join(sc, "doc_id").select(
        "doc_id", "lang", "nlp", b.alias("b")
    )
    return lb.select(
        "doc_id",
        "lang",
        F.col("nlp").cast("double").alias("avg_neg_logprob"),
        F.when(F.col("b") == 1, "head")
        .when(F.col("b") == 2, "middle")
        .otherwise("tail")
        .alias("bucket"),
        (F.col("b") <= 2).alias("keep"),
    )


_LL70_BUCKET = (
    "CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) AS BIGINT) % 100"
)
_LL70_ORACLE = (
    f"WITH p AS ({_MINHASH_ORACLE}),"
    f" aug AS ({_AUG_SQL}),"
    f" base AS (SELECT doc_id, CASE WHEN {_LL70_BUCKET} < 80 THEN 'train'"
    f"   WHEN {_LL70_BUCKET} < 90 THEN 'valid' ELSE 'test' END AS split"
    "   FROM aug),"
    " bd AS (SELECT doc_a AS a, doc_b AS b, jaccard FROM p"
    "   UNION ALL SELECT doc_b, doc_a, jaccard FROM p),"
    " leaks AS (SELECT bd.a AS doc_id, min(bd.b) AS leak_of"
    "   FROM bd JOIN base sa ON sa.doc_id = bd.a"
    "   JOIN base sb ON sb.doc_id = bd.b"
    "   WHERE sb.split = 'test' AND sa.split <> 'test'"
    "   AND bd.jaccard >= 0.5 GROUP BY bd.a)"
    " SELECT b.doc_id, b.split, l.leak_of IS NOT NULL AS dropped,"
    " l.leak_of FROM base b LEFT JOIN leaks l USING (doc_id)"
)


@query("ll70_leakage_safe_split", oracle=_LL70_ORACLE)
def ll70_leakage_safe_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decontaminated train/test split — ll15's hash-mod assignment
    composed with the near-dup pair graph: any train/valid document
    with a VERIFIED near-duplicate (MinHash-LSH, J >= 0.5) in the test
    split is dropped from training, leak_of = its smallest test
    neighbor. ll20/ll55 decontaminate against an external benchmark;
    this closes the other leak channel — eval-set leakage created by
    the split itself (the planted corpus copies land in different hash
    buckets, so real leaks exist and are value-checked).

    Scale: the split is a narrow hash map; the leak join runs on the
    PAIR graph (docs with >= 1 near-dup), not the corpus."""
    aug = _augmented(spark, sf_dir)
    bucket = (
        F.conv(
            F.substring(F.md5(F.col("doc_id").cast("string")), 1, 4), 16, 10
        ).cast("bigint")
        % 100
    )
    base = aug.select(
        "doc_id",
        F.when(bucket < 80, "train")
        .when(bucket < 90, "valid")
        .otherwise("test")
        .alias("split"),
    )
    pairs = dedup.minhash_lsh_pairs(
        aug, "doc_id", "text", k=3, threshold=0.4, max_shingle_df=0.5
    ).where(F.col("jaccard") >= 0.5)
    bd = pairs.select(
        F.col("doc_a").alias("a"), F.col("doc_b").alias("b")
    ).unionAll(pairs.select(F.col("doc_b").alias("a"), F.col("doc_a").alias("b")))
    sa = base.select(F.col("doc_id").alias("a"), F.col("split").alias("sa"))
    sb = base.select(F.col("doc_id").alias("b"), F.col("split").alias("sb"))
    leaks = (
        bd.join(sa, "a")
        .join(sb, "b")
        .where((F.col("sb") == "test") & (F.col("sa") != "test"))
        .groupBy(F.col("a").alias("doc_id"))
        .agg(F.min("b").alias("leak_of"))
    )
    return base.join(leaks, "doc_id", "left").select(
        "doc_id",
        "split",
        F.col("leak_of").isNotNull().alias("dropped"),
        "leak_of",
    )


_LL71_H = _hex10("'tmx#' || CAST(doc_id AS VARCHAR)")
_LL71_ORACLE = (
    "WITH counts AS (SELECT lang, count(*) AS n FROM documents"
    "   GROUP BY lang),"
    " tot AS (SELECT sum(n) AS n_total, sum(pow(n, 0.3)) AS z FROM counts),"
    " rates AS (SELECT lang, round(least(1.0,"
    "   0.5 * n_total * (pow(n, 0.3) / z) / n), 6) AS rate"
    "   FROM counts CROSS JOIN tot)"
    " SELECT d.doc_id, d.lang,"
    " CAST(r.rate AS DOUBLE) AS rate"
    " FROM documents d JOIN rates r USING (lang)"
    f" WHERE {_LL71_H} % 1000000 < CAST(round(r.rate * 1000000, 0) AS BIGINT)"
)


@query("ll71_temperature_sample", oracle=_LL71_ORACLE)
def ll71_temperature_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled language sampling (XLM-R, Conneau et al.
    2020, alpha = 0.3): the per-language keep rate is DERIVED from the
    corpus counts — p_l ∝ n_l^alpha flattens the language distribution,
    the 50%-of-corpus token budget turns p_l into a rate B·p_l/n_l
    (capped at 1.0), so low-resource languages keep everything while
    the head language is downsampled. The keep decision itself is
    ll35's machinery: salted portable hash mod 1e6 against rate·1e6 —
    reproducible across runs, engines, and partitioning.

    ll35 takes the mixture rates as given; this op computes them from
    the data, which is how multilingual corpora are actually mixed.
    Scale: one lang-keyed grouped count (5..10^2 rows) + a broadcast
    rate join + a narrow hash filter — zero corpus-sized shuffles."""
    docs = load(spark, sf_dir, "documents")
    counts = docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n"))
    tot = counts.agg(
        F.sum("n").alias("n_total"),
        F.sum(F.pow("n", F.lit(0.3))).alias("z"),
    )
    rates = (
        counts.crossJoin(F.broadcast(tot))
        .select(
            "lang",
            F.round(
                F.least(
                    F.lit(1.0),
                    F.lit(0.5)
                    * F.col("n_total")
                    * (F.pow("n", F.lit(0.3)) / F.col("z"))
                    / F.col("n"),
                ),
                6,
            ).alias("rate"),
        )
    )
    h = dedup.portable_hash40(
        F.concat(F.lit("tmx#"), F.col("doc_id").cast("string"))
    )
    return (
        docs.join(F.broadcast(rates), "lang")
        .where(
            h % F.lit(1000000)
            < F.round(F.col("rate") * 1000000, 0).cast("bigint")
        )
        .select("doc_id", "lang", F.col("rate").cast("double").alias("rate"))
    )


_LL72_ORACLE = (
    _MINHASH_CTES
    + " est AS (SELECT c.doc_a, c.doc_b,"
    "   list_sum(list_transform(range(1, 65), i ->"
    "     CASE WHEN x.sig[i] = y.sig[i] THEN 1 ELSE 0 END)) / 64.0 AS est"
    "   FROM cand c JOIN sigs x ON x.doc_id = c.doc_a"
    "   JOIN sigs y ON y.doc_id = c.doc_b),"
    " inter AS (SELECT c.doc_a, c.doc_b, count(*) AS i FROM cand c"
    "   JOIN inv a ON a.doc_id = c.doc_a"
    "   JOIN inv b ON b.doc_id = c.doc_b AND b.shingle = a.shingle"
    "   GROUP BY c.doc_a, c.doc_b),"
    " sc AS (SELECT e.doc_a, e.doc_b, round(e.est, 6) AS est6,"
    "   round(coalesce(i.i, 0) * 1.0 /"
    "    (na.n_sh + nb.n_sh - coalesce(i.i, 0)), 6) AS ex6"
    "   FROM est e LEFT JOIN inter i"
    "     ON i.doc_a = e.doc_a AND i.doc_b = e.doc_b"
    "   JOIN nz na ON na.doc_id = e.doc_a"
    "   JOIN nz nb ON nb.doc_id = e.doc_b)"
    " SELECT doc_a, doc_b, CAST(est6 AS DOUBLE) AS est_jaccard,"
    " CAST(ex6 AS DOUBLE) AS exact_jaccard,"
    " CAST(round(abs(est6 - ex6), 6) AS DOUBLE) AS abs_err FROM sc"
)


@query("ll72_minhash_calibration", oracle=_LL72_ORACLE)
def ll72_minhash_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash estimator calibration over the LSH candidate population
    — the dedup twin of ll52's ANN recall loop: per candidate pair,
    signature-estimated Jaccard vs exact shingle Jaccard and the
    absolute error. The measurement that decides whether the 100 TB
    path can skip exact verification (signature-only dedup) at the
    chosen (num_hashes, bands). Same index, same df-cutoff, same
    portable hashes as ll6, so the oracle replays every column."""
    return dedup.minhash_estimate_calibration(
        _augmented(spark, sf_dir), "doc_id", "text", k=3, num_hashes=64,
        bands=16, max_shingle_df=0.5,
    )


_LL73_ORACLE = (
    f"WITH tok0 AS (SELECT doc_id, {_TOKENS_SQL} AS tokens FROM documents),"
    " bg0 AS (SELECT doc_id, unnest(CASE WHEN len(tokens) >= 2 THEN"
    "   list_transform(range(1, len(tokens)),"
    "     i -> {'p': tokens[i], 't': tokens[i+1]})"
    "   ELSE [] END) AS pr FROM tok0),"
    " bg AS (SELECT doc_id, pr.p AS prev, pr.t AS tok FROM bg0),"
    " toks AS (SELECT doc_id, unnest(tokens) AS token FROM tok0),"
    " uni AS (SELECT token, count(*) AS c FROM toks GROUP BY token),"
    " n AS (SELECT sum(c) AS n FROM uni),"
    " bi AS (SELECT prev, tok, count(*) AS c2 FROM bg GROUP BY prev, tok),"
    " sc AS (SELECT g.doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,"
    "   round(avg(-ln(0.7 * b.c2 * 1.0 / up.c + 0.3 * ut.c * 1.0 / n.n)), 6)"
    "    AS score"
    "   FROM bg g JOIN bi b ON b.prev = g.prev AND b.tok = g.tok"
    "   JOIN uni up ON up.token = g.prev"
    "   JOIN uni ut ON ut.token = g.tok"
    "   CROSS JOIN n GROUP BY g.doc_id)"
    " SELECT doc_id, n_bigrams, CAST(score AS DOUBLE) AS avg_neg_logprob"
    " FROM sc"
)


@query("ll73_bigram_lm_score", oracle=_LL73_ORACLE)
def ll73_bigram_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interpolated bigram LM scoring — the context-aware upgrade of
    ll32's unigram proxy (one step toward CCNet's 5-gram KenLM): each
    doc scored by avg -ln(0.7·P(t_i|t_{i-1}) + 0.3·P(t_i)) under the
    corpus-trained counts. Interpolation with the unigram term is the
    classical Jelinek-Mercer smoothing, and keeps unseen-bigram mass
    finite without Katz backoff machinery (every corpus bigram is seen
    by construction here; the unigram term still reshapes scores).

    Scale: see operators/importance.bigram_lm_scores (the registered
    operator). Docs with < 2 tokens drop out (no bigram events),
    mirrored by the oracle."""
    from ..operators import importance

    return importance.bigram_lm_scores(
        load(spark, sf_dir, "documents"), "doc_id", "text", lam=0.7
    )


_LL74_ORACLE = (
    f"WITH comp AS ({_CLUSTER_ORACLE}),"
    f" aug AS ({_AUG_SQL})"
    " SELECT a.doc_id,"
    " CAST(coalesce(c.cluster_size, 1) AS BIGINT) AS cluster_size,"
    " CAST(round(1.0 / coalesce(c.cluster_size, 1), 6) AS DOUBLE) AS weight"
    " FROM aug a LEFT JOIN comp c ON c.doc_id = a.doc_id"
)


@query("ll74_soft_dedup_weights", oracle=_LL74_ORACLE)
def ll74_soft_dedup_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Soft deduplication (SlimPajama-DC / 'soft dedup' ablations):
    instead of DROPPING near-duplicates, reweight them — every doc in
    a near-dup cluster (ll23's components over the MinHash-LSH verified
    pairs) gets sampling weight 1/cluster_size, singletons keep 1.0.
    The cluster's total mass equals one document's, so training sees
    each distinct content unit once in expectation while retaining
    every surface variant (the diversity hard dedup destroys).

    Scale: identical to ll23 (pair graph only) plus one left join back
    to the corpus; weights are a narrow map over cluster_size."""
    from ..operators import graph

    aug = _augmented(spark, sf_dir)
    pairs = dedup.minhash_lsh_pairs(
        aug, "doc_id", "text", k=3, threshold=0.4, max_shingle_df=0.5,
    )
    comp = graph.connected_components(pairs, src="doc_a", dst="doc_b")
    sized = comp.select(
        F.col("vertex").alias("doc_id"),
        F.count(F.lit(1))
        .over(W.partitionBy("component"))
        .cast("bigint")
        .alias("cluster_size"),
    )
    return aug.join(sized, "doc_id", "left").select(
        "doc_id",
        F.coalesce("cluster_size", F.lit(1)).cast("bigint").alias(
            "cluster_size"
        ),
        F.round(
            F.lit(1.0) / F.coalesce("cluster_size", F.lit(1)), 6
        ).alias("weight"),
    )


_LL75_ORACLE = (
    # payload/frame layout identical to ll44 (_FRAME_ORACLE): 64-byte
    # md5-concat payload, 4-byte frames, every 5th sampled; fp = md5
    # of the frame's lowercase-hex slice. Augmented corpus so planted
    # copies give genuine cross-video duplicate frames.
    f"WITH aug AS ({_AUG_SQL}),"
    " d AS (SELECT doc_id,"
    " md5(text) || md5(text || 'a') || md5(text || 'b') || md5(text || 'c')"
    "  AS hx FROM aug WHERE doc_id % 1000000 < 100),"
    " fr AS (SELECT doc_id, i AS frame_idx,"
    "  md5(substr(hx, 8 * i + 1, 8)) AS fp"
    " FROM d, unnest([0, 5, 10, 15]) t(i)),"
    " g AS (SELECT fp, count(DISTINCT doc_id) AS n_docs,"
    "  count(*) AS n_frames, min({'d': doc_id, 'f': frame_idx}) AS kp"
    "  FROM fr GROUP BY fp HAVING count(DISTINCT doc_id) >= 2)"
    " SELECT fp, CAST(n_docs AS BIGINT) AS n_docs,"
    " CAST(n_frames AS BIGINT) AS n_frames,"
    " kp.d AS keeper_doc, CAST(kp.f AS INT) AS keeper_frame FROM g"
)


@query("ll75_frame_dedup", oracle=_LL75_ORACLE)
def ll75_frame_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-video duplicate-frame detection — multimodal × dedup
    composition: sampled frames are fingerprinted executor-side
    (``multimodal.sample_frame_fingerprints``, Arrow-batched), then a
    fingerprint hash-groupBy finds frames occurring in >= 2 distinct
    videos, keeper = lexicographically-first (doc, frame). The shuffle
    carries 32-char fingerprints, never pixels — the property that
    makes frame dedup (intro/outro/logo detection, re-upload
    clustering) feasible at video-corpus scale. Payloads are
    md5-derived (no codec in this container), so every fingerprint is
    SQL-reproducible and the whole path is value-checked."""
    aug = _augmented(spark, sf_dir).where((F.col("doc_id") % 1000000) < 100)
    binary = multimodal.attach_multiwindow_payload(aug, "doc_id", "text")
    fps = multimodal.sample_frame_fingerprints(
        binary, frame_bytes=4, every_n=5
    )
    return (
        fps.groupBy("fp")
        .agg(
            F.count_distinct("doc_id").alias("n_docs"),
            F.count(F.lit(1)).cast("bigint").alias("n_frames"),
            F.min(F.struct("doc_id", "frame_idx")).alias("kp"),
        )
        .where(F.col("n_docs") >= 2)
        .select(
            "fp",
            "n_docs",
            "n_frames",
            F.col("kp.doc_id").alias("keeper_doc"),
            F.col("kp.frame_idx").alias("keeper_frame"),
        )
    )


_JL_SIGNS = similarity.jl_signs(64, 16)


def _jl_oracle() -> str:
    projs = ", ".join(
        "round(list_sum(list_transform(range(1, 65),"
        " i -> CAST(embedding[i] AS DOUBLE) * "
        + "[" + ",".join(f"{float(s)}" for s in _JL_SIGNS[j]) + "]"
        + "[i])) / 4.0, 6) + 0.0"  # + 0.0 canonicalizes -0.0
        for j in range(16)
    )
    return (
        f"WITH p AS (SELECT vec_id, [{projs}] AS proj, embedding"
        " FROM embeddings),"
        " f AS (SELECT vec_id, proj,"
        " round(sqrt(list_sum(list_transform(proj, x -> x * x))"
        " / list_sum(list_transform(embedding,"
        "   x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))), 6) AS norm_ratio"
        " FROM p)"
        # one row per (vector, dim): parallel unnests zip in DuckDB, so
        # dim_idx and proj_val stay aligned — the scalar-only output
        # shape every registered query must have (driver canon
        # lexsorts all columns and cannot hash list cells)
        " SELECT vec_id, unnest(range(0, 16)) AS dim_idx,"
        " unnest(proj) AS proj_val, norm_ratio FROM f"
    )


@query("ll76_jl_projection", oracle=_jl_oracle())
def ll76_jl_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Johnson-Lindenstrauss ±1 random projection 64 → 16 dims
    (Achlioptas database-friendly projections) — the embedding
    compression tier feeding cheaper ANN/storage, with the per-vector
    norm-preservation ratio emitted in-band (the JL lemma's promise,
    measured, same discipline as ll52/ll72). Sign matrix is a
    deterministic md5-parity Python constant shared verbatim with the
    oracle (the ll9 hyperplane pattern); /√k folded as ·0.25 exactly.
    Scale: a narrow per-row map, no shuffle, no broadcast.

    Output is the posexploded (vec_id, dim_idx, proj_val) long form —
    scalar columns only, the registry's output contract (the driver's
    canonicalizer cannot hash array cells; operator API
    ``similarity.jl_project`` still returns the dense array)."""
    out = similarity.jl_project(
        load(spark, sf_dir, "embeddings"), "vec_id", "embedding",
        dim=64, k=16,
    )
    ex = out.select(
        "vec_id", "norm_ratio", F.posexplode("proj").alias("p", "proj_val")
    )
    return ex.select(
        "vec_id",
        F.col("p").cast("bigint").alias("dim_idx"),
        "proj_val",
        "norm_ratio",
    )


_LL77_ORACLE = (
    "WITH md AS (SELECT CAST(greatest(1, round(sqrt(count(*)), 0))"
    " AS BIGINT) AS m FROM embeddings),"
    " cents AS (SELECT vec_id AS cid, embedding AS cv"
    "  FROM embeddings, md WHERE vec_id % md.m = 0),"
    " scored AS (SELECT e.vec_id, c.cid,"
    "  round(sqrt(list_sum(list_transform(range(1, 65), i ->"
    "   (CAST(e.embedding[i] AS DOUBLE) - CAST(c.cv[i] AS DOUBLE))"
    "   * (CAST(e.embedding[i] AS DOUBLE) - CAST(c.cv[i] AS DOUBLE))))), 6)"
    "   AS d"
    "  FROM embeddings e CROSS JOIN cents c),"
    " rk AS (SELECT vec_id, cid, d, row_number() OVER"
    "  (PARTITION BY vec_id ORDER BY d, cid) AS r FROM scored),"
    " t2 AS (SELECT vec_id,"
    "  max(CASE WHEN r = 1 THEN cid END) AS cell,"
    "  max(CASE WHEN r = 1 THEN d END) AS a,"
    "  max(CASE WHEN r = 2 THEN d END) AS b"
    "  FROM rk WHERE r <= 2 GROUP BY vec_id),"
    " s AS (SELECT cell, CASE WHEN greatest(a, b) = 0 THEN 0.0"
    "  ELSE (b - a) / greatest(a, b) END AS s"
    "  FROM t2 WHERE b IS NOT NULL)"
    " SELECT cell, CAST(count(*) AS BIGINT) AS n_vecs,"
    " CAST(round(avg(s), 6) AS DOUBLE) AS mean_silhouette"
    " FROM s GROUP BY cell"
)


@query("ll77_cell_silhouette", oracle=_LL77_ORACLE)
def ll77_cell_silhouette(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-cell simplified silhouette of the training-free IVF
    quantizer (derived √N modulus — the ll42/ll12 rule): mean
    (b − a)/max(a, b) over each cell's members, a/b = distance to the
    nearest/second-nearest centroid. The cluster-quality measurement
    consulted before trusting cell-scoped ops (ll42, ll12/ll60):
    near-zero cells leak neighbors across boundaries and need larger
    nprobe or trained centroids. O(N·M) = O(N^1.5) — the full-
    silhouette O(N²) never runs (operators/clustering.py)."""
    from ..operators import clustering

    return clustering.cell_silhouette(
        load(spark, sf_dir, "embeddings"), "vec_id", "embedding",
        centroid_mod=None,
    )


_LL78_ORACLE = (
    "WITH e AS (SELECT vec_id,"
    " list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v"
    " FROM embeddings),"
    " s AS (SELECT vec_id, v, list_min(v) AS mn,"
    "  (list_max(v) - list_min(v)) / 255.0 AS sc FROM e),"
    " q AS (SELECT vec_id, v, mn, sc,"
    "  list_transform(v, x -> CASE WHEN sc = 0 THEN 0 ELSE"
    "   CAST(least(255, floor((x - mn) / sc + 0.5)) AS INT) END)"
    "   AS codes,"
    "  list_transform(v, x -> mn + (CASE WHEN sc = 0 THEN 0 ELSE"
    "   least(255, floor((x - mn) / sc + 0.5)) END) * sc) AS d"
    "  FROM s),"
    " m AS (SELECT vec_id, codes, mn, sc,"
    "  list_sum(list_transform(range(1, 65), i -> v[i] * d[i])) AS dot,"
    "  list_sum(list_transform(v, x -> x * x)) AS sqv,"
    "  list_sum(list_transform(d, x -> x * x)) AS sqd,"
    "  list_sum(list_transform(range(1, 65),"
    "   i -> (v[i] - d[i]) * (v[i] - d[i]))) / 64 AS mse"
    "  FROM q),"
    " f AS (SELECT vec_id, codes, round(mn, 6) AS zero_point,"
    " round(sc, 6) AS scale,"
    " round(CASE WHEN sqv * sqd = 0 THEN 1.0"
    "  ELSE dot / sqrt(sqv * sqd) END, 6) AS recon_cos,"
    " round(mse, 6) AS recon_mse FROM m)"
    # long form (vec_id, dim_idx, code): scalar-only registry contract
    " SELECT vec_id, unnest(range(0, 64)) AS dim_idx,"
    " unnest(list_transform(codes, x -> CAST(x AS BIGINT))) AS code,"
    " zero_point, scale, recon_cos, recon_mse FROM f"
)


@query("ll78_sq8_quantize", oracle=_LL78_ORACLE)
def ll78_sq8_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar int8 quantization of the embedding table (FAISS SQ8):
    256 levels of each vector's own range, 4x smaller than float32 —
    the standard first compression tier before PQ (ll49) is worth its
    training cost — with per-vector reconstruction cosine and MSE
    emitted in-band (the measure-the-index discipline of ll52/ll72/
    ll76). Codes, dequantization, and both quality metrics are
    value-checked. Scale: a narrow per-row map — no shuffle, no
    broadcast (operators/similarity.sq8_quantize).

    Output is the posexploded (vec_id, dim_idx, code) long form —
    scalar columns only, the registry's output contract (driver canon
    cannot hash array cells; ``similarity.sq8_quantize`` keeps the
    dense codes array for API users)."""
    out = similarity.sq8_quantize(
        load(spark, sf_dir, "embeddings"), "vec_id", "embedding"
    )
    ex = out.select(
        "vec_id",
        "zero_point",
        "scale",
        "recon_cos",
        "recon_mse",
        F.posexplode("codes").alias("p", "c"),
    )
    return ex.select(
        "vec_id",
        F.col("p").cast("bigint").alias("dim_idx"),
        F.col("c").cast("bigint").alias("code"),
        "zero_point",
        "scale",
        "recon_cos",
        "recon_mse",
    )


_LL80_ORACLE = (
    f"WITH tok0 AS (SELECT doc_id, {_TOKENS_SQL} AS tokens FROM documents),"
    " bg0 AS (SELECT doc_id, unnest(CASE WHEN len(tokens) >= 2 THEN"
    "   list_transform(range(1, len(tokens)),"
    "     i -> {'p': tokens[i], 't': tokens[i+1]})"
    "   ELSE [] END) AS pr FROM tok0),"
    " bg AS (SELECT doc_id, pr.p AS prev, pr.t AS tok FROM bg0),"
    " bi AS (SELECT prev, tok, count(*) AS c2 FROM bg GROUP BY prev, tok),"
    " ps AS (SELECT prev, sum(c2) AS cp, count(*) AS fanv"
    "   FROM bi GROUP BY prev),"
    " ts AS (SELECT tok, count(*) AS contw FROM bi GROUP BY tok),"
    " bt AS (SELECT count(*) AS b FROM bi),"
    " sc AS (SELECT g.doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,"
    "   round(avg(-ln(greatest(b.c2 - 0.75, 0.0) / p.cp"
    "    + 0.75 * p.fanv / p.cp * t.contw / bt.b)), 6) AS score"
    "   FROM bg g JOIN bi b ON b.prev = g.prev AND b.tok = g.tok"
    "   JOIN ps p ON p.prev = g.prev"
    "   JOIN ts t ON t.tok = g.tok"
    "   CROSS JOIN bt GROUP BY g.doc_id)"
    " SELECT doc_id, n_bigrams, CAST(score AS DOUBLE) AS avg_neg_logprob"
    " FROM sc"
)


@query("ll80_kneser_ney_score", oracle=_LL80_ORACLE)
def ll80_kneser_ney_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kneser-Ney-smoothed bigram LM scoring — the canonical n-gram
    smoothing (the default in KenLM, whose 5-gram scores drive CCNet's
    quality buckets, ll69): absolute discounting d = 0.75 with the
    CONTINUATION unigram (in how many distinct contexts a word
    follows) instead of raw frequency — the property that stops
    high-count-but-single-context tokens from dominating backoff mass,
    which is exactly what JM interpolation (ll73) gets wrong. Completes
    the in-engine LM ladder: ll32 unigram → ll73 JM bigram → ll80 KN
    bigram. Scale: see operators/importance.kneser_ney_bigram_scores
    (bigram-table-derived counts, token-keyed equi-joins, 1-row total
    broadcast)."""
    from ..operators import importance

    return importance.kneser_ney_bigram_scores(
        load(spark, sf_dir, "documents"), "doc_id", "text", discount=0.75
    )


# CTE body (tok0 .. f) without the WITH/final-SELECT so composed
# queries (ll101's learned scorer) can reuse the hashed-feature frame
_LL81_CTES = (
    f"tok0 AS (SELECT doc_id, {_TOKENS_SQL} AS tokens FROM documents),"
    " t AS (SELECT doc_id, unnest(tokens) AS token FROM tok0),"
    " h AS (SELECT doc_id,"
    "  list_sum(list_transform(range(1, 11), j ->"
    "   CAST(strpos('0123456789abcdef', substr(md5(token), j, 1)) - 1"
    "   AS BIGINT) * (1::BIGINT << (4 * (10 - j))))) % 64 AS idx,"
    "  CASE WHEN (strpos('0123456789abcdef', substr(md5(token), 11, 1))"
    "   - 1) % 2 = 0 THEN 1 ELSE -1 END AS s FROM t),"
    " g AS (SELECT doc_id, idx, sum(s) AS v, count(*) AS cnt"
    "  FROM h GROUP BY doc_id, idx),"
    " docs AS (SELECT doc_id, sum(cnt) AS n_tokens FROM g GROUP BY doc_id),"
    " dims AS (SELECT d.doc_id, r.i FROM docs d CROSS JOIN"
    "  (SELECT unnest(range(0, 64)) AS i) r),"
    " vals AS (SELECT dm.doc_id, dm.i,"
    "  CAST(coalesce(g.v, 0) AS DOUBLE) AS v FROM dims dm"
    "  LEFT JOIN g ON g.doc_id = dm.doc_id AND g.idx = dm.i),"
    " vec AS (SELECT doc_id, list(v ORDER BY i) AS raw"
    "  FROM vals GROUP BY doc_id),"
    " n AS (SELECT doc_id, raw,"
    "  sqrt(list_sum(list_transform(raw, x -> x * x))) AS nrm FROM vec),"
    " f AS (SELECT d.doc_id, CAST(d.n_tokens AS BIGINT) AS n_tokens,"
    " CASE WHEN n.nrm = 0 THEN raw"
    "  ELSE list_transform(raw, x -> round(x / n.nrm, 6) + 0.0) END"
    "  AS embedding"
    " FROM docs d JOIN n ON n.doc_id = d.doc_id)"
)

_LL81_ORACLE = (
    "WITH " + _LL81_CTES
    # long form (doc_id, dim_idx, value): scalar-only registry contract
    + " SELECT doc_id, n_tokens, unnest(range(0, 64)) AS dim_idx,"
    " unnest(embedding) AS value FROM f"
)


@query("ll81_hashed_embeddings", oracle=_LL81_ORACLE)
def ll81_hashed_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature-hashing document embeddings (the hashing trick,
    Weinberger et al. 2009): tokens → ±1-signed buckets of
    portable_hash40 % 64 → L2-normalized dense array<double> — the
    vocabulary-free, training-free text vectorizer that bridges the
    documents table into the embedding-family operators (ANN ll8/ll12,
    SemDeDup ll42, JL ll76, SQ8 ll78) when no neural encoder is in the
    loop. Sign from an independent hex digit of the same md5, so
    collisions cancel in expectation. Every component value-checked.
    Scale: one (doc, bucket)-keyed map-side-combined count + one
    doc-keyed densify; no vocabulary, no broadcast, no global state
    (operators/similarity.hashed_embeddings).

    Output is the posexploded (doc_id, dim_idx, value) long form —
    scalar columns only, the registry's output contract (driver canon
    cannot hash array cells; ``similarity.hashed_embeddings`` keeps
    the dense array for the embedding-family operators)."""
    out = similarity.hashed_embeddings(
        load(spark, sf_dir, "documents"), "doc_id", "text", dim=64
    )
    ex = out.select(
        "doc_id", "n_tokens", F.posexplode("embedding").alias("p", "value")
    )
    return ex.select(
        "doc_id",
        "n_tokens",
        F.col("p").cast("bigint").alias("dim_idx"),
        "value",
    )


# ---------------------------------------------------------------------------
# ll82 — n-gram novelty (first-occurrence fraction, corpus ordering signal)
# ---------------------------------------------------------------------------

_LL82_ORACLE = (
    f"WITH tok AS (SELECT doc_id, {_TOKENS_SQL} AS t FROM documents),"
    " grams AS (SELECT DISTINCT doc_id,"
    "  array_to_string(list_slice(t, i, i + 4), ' ') AS g"
    "  FROM tok, unnest(range(1, len(t) - 3)) u(i)),"
    " f AS (SELECT g, min(doc_id) AS first_doc FROM grams GROUP BY g)"
    " SELECT doc_id, CAST(count(*) AS BIGINT) AS n_grams,"
    " CAST(sum(CASE WHEN first_doc = doc_id THEN 1 ELSE 0 END) AS BIGINT)"
    "  AS n_novel,"
    " CAST(round(sum(CASE WHEN first_doc = doc_id THEN 1 ELSE 0 END)"
    "  * 1.0 / count(*), 6) AS DOUBLE) AS novelty"
    " FROM grams JOIN f USING (g) GROUP BY doc_id"
)


@query("ll82_ngram_novelty", oracle=_LL82_ORACLE)
def ll82_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document 5-gram novelty: the fraction of a doc's DISTINCT
    5-grams whose first corpus occurrence (min doc_id over the docs
    containing the gram) is this document. The corpus-redundancy
    growth curve in operator form — streaming ingestion pipelines
    (RefinedWeb/FineWeb-style) use exactly this to decide when a
    source's marginal contribution has decayed to boilerplate, and
    dup-heavy docs surface as novelty ≈ 0 without any pair join.

    Scale: distinct (doc, gram) explode, ONE gram-keyed min
    aggregation (map-side combined), one gram-keyed equi-join back,
    one doc-keyed count — work linear in gram occupancy, no pairs, no
    windows, no broadcast. Docs with < 5 tokens have no grams and
    drop out (both engines).
    """
    docs = load(spark, sf_dir, "documents")
    toks = docs.select("doc_id", T.tokenize(F.col("text")).alias("t"))
    grams = toks.select(
        "doc_id",
        F.explode(
            F.array_distinct(
                F.when(
                    F.size("t") >= 5,
                    F.transform(
                        F.sequence(F.lit(1), F.size("t") - 4),
                        lambda i: F.array_join(F.slice("t", i, 5), " "),
                    ),
                ).otherwise(F.array().cast("array<string>"))
            )
        ).alias("g"),
    )
    firsts = grams.groupBy("g").agg(F.min("doc_id").alias("first_doc"))
    return (
        grams.join(firsts, "g")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.sum(
                F.when(F.col("first_doc") == F.col("doc_id"), 1).otherwise(0)
            )
            .cast("bigint")
            .alias("n_novel"),
        )
        .select(
            "doc_id",
            "n_grams",
            "n_novel",
            F.round(F.col("n_novel") * F.lit(1.0) / F.col("n_grams"), 6)
            .cast("double")
            .alias("novelty"),
        )
    )


# ---------------------------------------------------------------------------
# ll83 — character-entropy quality signal (garbage / encoded-blob detector)
# ---------------------------------------------------------------------------

_LL83_ORACLE = (
    "WITH ch AS (SELECT doc_id, substr(text, i, 1) AS c"
    "  FROM documents, unnest(range(1, length(text) + 1)) u(i)"
    "  WHERE length(text) > 0),"
    " hist AS (SELECT doc_id, c, count(*) AS n FROM ch GROUP BY doc_id, c),"
    " tot AS (SELECT doc_id, sum(n) AS nt, count(*) AS n_distinct"
    "  FROM hist GROUP BY doc_id),"
    # per-term quantization to DECIMAL before the sum (the c6/c7
    # discipline): the sum is order-exact in both engines
    " terms AS (SELECT h.doc_id,"
    "  CAST(round((h.n * 1.0 / t.nt) * ln(h.n * 1.0 / t.nt), 12)"
    "   AS DECIMAL(28,12)) AS term, t.nt, t.n_distinct"
    "  FROM hist h JOIN tot t USING (doc_id))"
    " SELECT doc_id, CAST(max(nt) AS BIGINT) AS n_chars,"
    " CAST(max(n_distinct) AS BIGINT) AS n_distinct_chars,"
    " CAST(round(-sum(term), 6) AS DOUBLE) AS char_entropy"
    " FROM terms GROUP BY doc_id"
)


@query("ll83_char_entropy", oracle=_LL83_ORACLE)
def ll83_char_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document Shannon character entropy (nats) — the cheap
    garbage detector quality stacks run before anything tokenizes:
    natural language sits in a narrow entropy band (~2.7-3.2 nats for
    English), base64/hex blobs and binary-in-text score high, template
    spam and single-char runs score low. Complements ll59's zlib
    ratio (which needs a Python UDF) with a pure-codegen, SQL-checkable
    signal.

    Scale: one char explode with map-side combine — the shuffle
    carries <= |alphabet| rows per doc, not characters; then one
    doc-keyed agg. Per-term p·ln p is quantized to DECIMAL(28,12)
    before summation (the c6/c7 exact-sum discipline) so the entropy
    is row-order-free and engine-exact. Empty docs drop out.
    """
    docs = load(spark, sf_dir, "documents").where(F.length("text") > 0)
    ch = docs.select(
        "doc_id", F.explode(F.split(F.col("text"), "")).alias("c")
    ).where(F.col("c") != "")
    hist = ch.groupBy("doc_id", "c").agg(F.count(F.lit(1)).alias("n"))
    tot = hist.groupBy("doc_id").agg(
        F.sum("n").alias("nt"), F.count(F.lit(1)).alias("n_distinct")
    )
    p = F.col("n") * F.lit(1.0) / F.col("nt")
    terms = hist.join(tot, "doc_id").select(
        "doc_id",
        F.round(p * F.log(p), 12).cast("decimal(28,12)").alias("term"),
        "nt",
        "n_distinct",
    )
    return terms.groupBy("doc_id").agg(
        F.max("nt").cast("bigint").alias("n_chars"),
        F.max("n_distinct").cast("bigint").alias("n_distinct_chars"),
        F.round(-F.sum("term"), 6).cast("double").alias("char_entropy"),
    )


# ---------------------------------------------------------------------------
# ll84 — quality-signal agreement (per-source Spearman, cheap vs LM)
# ---------------------------------------------------------------------------

_LL84_ORACLE = (
    f"WITH tokd AS (SELECT doc_id, source, text, {_TOKENS_SQL} AS tokens"
    " FROM documents),"
    f" q AS (SELECT doc_id, source, {_QS6_SQL} AS qs FROM tokd),"
    " t AS (SELECT doc_id, unnest(tokens) AS token FROM tokd),"
    " vocab AS (SELECT token, count(*) AS c FROM t GROUP BY token),"
    " n AS (SELECT sum(c) AS n FROM vocab),"
    " lp AS (SELECT doc_id,"
    "  CAST(round(avg(-ln(c * 1.0 / n.n)), 6) AS DECIMAL(18,6)) AS lp"
    "  FROM t JOIN vocab USING (token) CROSS JOIN n GROUP BY doc_id),"
    " r AS (SELECT q.source,"
    "  row_number() OVER (PARTITION BY q.source"
    "   ORDER BY q.qs, q.doc_id) AS rq,"
    "  row_number() OVER (PARTITION BY q.source"
    "   ORDER BY lp.lp, lp.doc_id) AS rl"
    "  FROM q JOIN lp USING (doc_id))"
    " SELECT source, CAST(count(*) AS BIGINT) AS n_docs,"
    " CAST(sum((rq - rl) * (rq - rl)) AS BIGINT) AS sum_d2,"
    " CAST(round(1.0 - 6.0 * sum((rq - rl) * (rq - rl))"
    "  / (count(*) * (count(*) * count(*) - 1.0)), 6) AS DOUBLE)"
    "  AS spearman"
    " FROM r GROUP BY source HAVING count(*) >= 2"
)


@query("ll84_signal_agreement", oracle=_LL84_ORACLE)
def ll84_signal_agreement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source Spearman rank correlation between the cheap
    heuristic quality score (ll21's length/stopword/punct scorer) and
    the corpus-unigram LM surprise (ll32) — the measurement that tells
    a pipeline whether its fast filter agrees with its expensive one
    on each corpus slice, BEFORE committing a 100 TB pass to either.
    A slice where the two signals decorrelate is where a model-based
    scorer earns its cost.

    Spearman via the exact closed form 1 − 6·Σd²/(n(n²−1)) on
    row_number ranks (ties broken by doc_id, so ranks are
    permutations and Σd² is INTEGER arithmetic — engine-exact until
    the final division, rounded 6dp). Scale: the LM side is ll32's
    audited shape (token-keyed join + 1-row total broadcast); the
    ranks are windows PARTITIONED by source — no global sort. Sources
    with < 2 docs drop (Spearman undefined).
    """
    docs = load(spark, sf_dir, "documents")
    tokens = T.tokenize(F.col("text"))
    q = T.quality_features(F.col("text"), tokens)
    scored = docs.select(
        "doc_id",
        "source",
        F.round(q["quality_score"], 6).cast("decimal(18,6)").alias("qs"),
    )
    toks = docs.select(
        "doc_id", F.explode(T.tokenize(F.col("text"))).alias("token")
    )
    vocab = toks.groupBy("token").agg(F.count(F.lit(1)).alias("c"))
    n = vocab.agg(F.sum("c").alias("n"))
    lp = (
        toks.join(vocab, "token")
        .crossJoin(F.broadcast(n))
        .groupBy("doc_id")
        .agg(
            F.round(F.avg(-F.log(F.col("c") * F.lit(1.0) / F.col("n"))), 6)
            .cast("decimal(18,6)")
            .alias("lp")
        )
    )
    both = scored.join(lp, "doc_id")
    rq = F.row_number().over(
        W.partitionBy("source").orderBy("qs", "doc_id")
    )
    rl = F.row_number().over(
        W.partitionBy("source").orderBy("lp", "doc_id")
    )
    ranked = both.select("source", rq.alias("rq"), rl.alias("rl"))
    d2 = (F.col("rq") - F.col("rl")) * (F.col("rq") - F.col("rl"))
    nn = F.count(F.lit(1))
    return (
        ranked.groupBy("source")
        .agg(
            nn.cast("bigint").alias("n_docs"),
            F.sum(d2).cast("bigint").alias("sum_d2"),
            F.round(
                F.lit(1.0)
                - F.lit(6.0)
                * F.sum(d2)
                / (nn * (nn * nn - F.lit(1.0))),
                6,
            )
            .cast("double")
            .alias("spearman"),
        )
        .where(F.col("n_docs") >= 2)
    )


# ---------------------------------------------------------------------------
# ll85 — vocabulary coverage curve (tokenizer/vocab sizing)
# ---------------------------------------------------------------------------

_LL85_ORACLE = (
    f"WITH tok AS (SELECT {_TOKENS_SQL} AS tokens FROM documents),"
    " t AS (SELECT unnest(tokens) AS token FROM tok),"
    " vocab AS (SELECT token, count(*) AS c FROM t GROUP BY token),"
    " tot AS (SELECT sum(c) AS total, count(*) AS n_types FROM vocab),"
    " ranked AS (SELECT c, row_number() OVER (ORDER BY c DESC, token)"
    "   AS r FROM vocab),"
    " vs AS (SELECT unnest([10, 50, 100, 500]) AS v)"
    " SELECT v AS vocab_size,"
    " CAST(sum(CASE WHEN r <= v THEN c ELSE 0 END) AS BIGINT)"
    "  AS covered_tokens,"
    " CAST(max(tot.total) AS BIGINT) AS total_tokens,"
    " CAST(max(tot.n_types) AS BIGINT) AS n_types,"
    " CAST(round(sum(CASE WHEN r <= v THEN c ELSE 0 END) * 1.0"
    "  / max(tot.total), 6) AS DOUBLE) AS coverage"
    " FROM vs CROSS JOIN ranked CROSS JOIN tot GROUP BY v"
)


@query("ll85_vocab_coverage", oracle=_LL85_ORACLE)
def ll85_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary coverage curve: what fraction of corpus token
    OCCURRENCES the top-V most frequent word types cover, for V in
    {10, 50, 100, 500} — the Zipf curve read a tokenizer designer
    needs before choosing a vocab size (the complement question to
    ll62/ll66's subword merges: how far does a WORD vocabulary get
    you, and where do the diminishing returns start).

    Scale: one token-keyed count (the vocabulary, map-side combined),
    each top-V slice via orderBy().limit(V) = TakeOrderedAndProject —
    the ll16 discipline, never a global row_number over the full
    vocabulary — then a 4-row union of 1-row aggregates joined to the
    1-row corpus total. Nothing corpus-sized moves after the count.
    """
    docs = load(spark, sf_dir, "documents")
    toks = docs.select(F.explode(T.tokenize(F.col("text"))).alias("token"))
    vocab = toks.groupBy("token").agg(F.count(F.lit(1)).alias("c"))
    tot = vocab.agg(
        F.sum("c").alias("total"), F.count(F.lit(1)).alias("n_types")
    )
    slices = []
    for v in (10, 50, 100, 500):
        top = vocab.orderBy(F.col("c").desc(), "token").limit(v)
        slices.append(
            top.agg(
                F.lit(v).cast("bigint").alias("vocab_size"),
                F.sum("c").cast("bigint").alias("covered_tokens"),
            )
        )
    from functools import reduce

    cov = reduce(DataFrame.unionAll, slices)
    return cov.crossJoin(F.broadcast(tot)).select(
        "vocab_size",
        "covered_tokens",
        F.col("total").cast("bigint").alias("total_tokens"),
        F.col("n_types").cast("bigint").alias("n_types"),
        F.round(
            F.col("covered_tokens") * F.lit(1.0) / F.col("total"), 6
        )
        .cast("double")
        .alias("coverage"),
    )


# ---------------------------------------------------------------------------
# ll86 — tokenizer fertility by source (the multilingual-tokenizer table)
# ---------------------------------------------------------------------------

_LL86_FINAL = (
    ", perdoc AS (SELECT doc_id, count(*) AS n_words,"
    " sum(len(string_split(e.s, '|'))) AS n_tokens,"
    " sum(length(w)) AS n_chars"
    " FROM words JOIN e5 e USING (w) GROUP BY doc_id)"
    " SELECT d.source, CAST(sum(p.n_words) AS BIGINT) AS n_words,"
    " CAST(sum(p.n_tokens) AS BIGINT) AS n_tokens,"
    " CAST(sum(p.n_chars) AS BIGINT) AS n_chars,"
    " CAST(round(sum(p.n_tokens) * 1.0 / sum(p.n_words), 6) AS DOUBLE)"
    "  AS fertility,"
    " CAST(round(sum(p.n_chars) * 1.0 / sum(p.n_tokens), 6) AS DOUBLE)"
    "  AS chars_per_token"
    " FROM perdoc p JOIN documents d USING (doc_id) GROUP BY d.source"
)


@query("ll86_bpe_fertility", oracle=_bpe_encode_oracle(5, _LL86_FINAL))
def ll86_bpe_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer fertility by corpus slice: subword tokens per word
    and characters per subword token, per source, under the trained
    5-merge BPE (ll62 → ll66's encoder) — the standard table a
    multilingual/multi-domain tokenizer is judged by (high fertility
    on a slice means its text fragments into many pieces: more compute
    per character and worse effective context length there). Closes
    the BPE chain train → apply → MEASURE.

    Scale: ll66's audited encode shape (distinct words encoded once,
    corpus re-joined on the word) plus doc-level integer char counts
    and ONE source-keyed aggregation — all sums integer-exact, the
    two ratios rounded 6dp at the very end."""
    from ..operators.bpe import bpe_encode, bpe_merge_table

    docs = load(spark, sf_dir, "documents")
    enc = bpe_encode(docs, bpe_merge_table(docs, n_merges=5))
    chars = docs.select(
        "doc_id",
        "source",
        F.aggregate(
            T.tokenize(F.col("text")),
            F.lit(0).cast("bigint"),
            lambda acc, t: acc + F.length(t).cast("bigint"),
        ).alias("n_chars"),
    )
    return (
        enc.join(chars, "doc_id")
        .groupBy("source")
        .agg(
            F.sum("n_words").cast("bigint").alias("n_words"),
            F.sum("n_tokens").cast("bigint").alias("n_tokens"),
            F.sum("n_chars").cast("bigint").alias("n_chars"),
            F.round(
                F.sum("n_tokens") * F.lit(1.0) / F.sum("n_words"), 6
            )
            .cast("double")
            .alias("fertility"),
            F.round(
                F.sum("n_chars") * F.lit(1.0) / F.sum("n_tokens"), 6
            )
            .cast("double")
            .alias("chars_per_token"),
        )
    )


# ---------------------------------------------------------------------------
# ll87 — ExactSubstr span EXCISION (the cleaned-corpus materializer)
# ---------------------------------------------------------------------------

def _excise_ctes_over(src: str) -> str:
    """The ExactSubstr excision CTE chain (``tok`` .. ``counts`` +
    ``kept``) over an arbitrary (doc_id, text) relation named ``src``
    — ll87's machinery, reused by the ll94 pipeline (which reassembles
    cleaned TEXT where ll87 emits a digest). No leading WITH, no
    trailing comma."""
    return (
        f"tok AS (SELECT doc_id, {_TOKENS_SQL} AS tokens FROM {src}),"
        " gr AS (SELECT doc_id, CASE WHEN len(tokens) >= 8 THEN"
        f"   list_transform(range(1, len(tokens) - 6), i -> {_hex10(f'({_LL65_GRAM8})')})"
        "   ELSE [] END AS ghs FROM tok),"
        " pos AS (SELECT doc_id, unnest(range(len(ghs))) AS pos,"
        "   unnest(ghs) AS g FROM gr),"
        " shared AS (SELECT g FROM pos GROUP BY g"
        "   HAVING count(DISTINCT doc_id) >= 2),"
        " hits AS (SELECT doc_id, pos FROM pos"
        "   WHERE g IN (SELECT g FROM shared)),"
        " isl AS (SELECT doc_id, pos, CASE WHEN pos - lag(pos) OVER"
        "   (PARTITION BY doc_id ORDER BY pos) = 1 THEN 0 ELSE 1 END AS brk"
        "   FROM hits),"
        " isl2 AS (SELECT doc_id, pos, sum(brk) OVER"
        "   (PARTITION BY doc_id ORDER BY pos) AS island FROM isl),"
        " spans AS (SELECT doc_id, min(pos) AS s, max(pos) + 7 AS e"
        "   FROM isl2 GROUP BY doc_id, island),"
        # adjacent spans' +7 tails can overlap (island gap < 8) -> DISTINCT
        " covered AS (SELECT DISTINCT doc_id, idx FROM"
        "   (SELECT doc_id, unnest(range(s, e + 1)) AS idx FROM spans)),"
        " ti AS (SELECT doc_id, unnest(range(len(tokens))) AS idx,"
        "   unnest(tokens) AS tok FROM tok),"
        " counts AS (SELECT doc_id, count(*) AS n_tokens FROM ti"
        "   GROUP BY doc_id),"
        " kept AS (SELECT t.doc_id, t.idx, t.tok FROM ti t"
        "   LEFT JOIN covered c ON c.doc_id = t.doc_id AND c.idx = t.idx"
        "   WHERE c.idx IS NULL)"
    )


_LL87_ORACLE = (
    f"WITH aug AS ({_AUG_SQL}),"
    + _excise_ctes_over("aug")
    + ", re AS (SELECT doc_id, count(*) AS n_kept,"
    "   md5(string_agg(tok, ' ' ORDER BY idx)) AS cleaned_md5"
    "   FROM kept GROUP BY doc_id)"
    " SELECT c.doc_id, CAST(c.n_tokens AS BIGINT) AS n_tokens,"
    " CAST(c.n_tokens - coalesce(r.n_kept, 0) AS BIGINT) AS n_removed,"
    " r.cleaned_md5"
    " FROM counts c LEFT JOIN re r USING (doc_id)"
)


@query("ll87_excise_repeated_spans", oracle=_LL87_ORACLE)
def ll87_excise_repeated_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ExactSubstr REMOVAL (the step after ll65's measurement): every
    token inside a maximal cross-document repeated span is excised and
    the survivors reassembled in order — the cleaned-corpus
    materializer Lee et al. run after detection, completing the
    detect (ll65) → profile (ll68) → excise chain the way ll34
    completes the pair tier. Cleaned text emitted as an md5 digest
    (the verification artifact; production writes the text to a
    sink). Scale: ll65's positions-only dataflow + one covered-index
    explode + one (doc, idx) anti-join + per-doc in-group reassembly
    (operators/dedup.excise_repeated_spans)."""
    return dedup.excise_repeated_spans(
        _augmented(spark, sf_dir), "doc_id", "text", min_len=8, min_docs=2
    )


_LL98_ORACLE = (
    f"WITH aug AS ({_AUG_SQL}),"
    " p0 AS (SELECT doc_id,"
    "   unnest(string_split(text, chr(10))) AS para,"
    "   unnest(range(len(string_split(text, chr(10))))) AS idx FROM aug),"
    " p AS (SELECT doc_id, idx, trim(para) AS para FROM p0"
    "   WHERE length(trim(para)) > 0),"
    " f AS (SELECT para, min({'d': doc_id, 'i': idx}) AS fst FROM p"
    "   GROUP BY para),"
    " k AS (SELECT p.doc_id, p.idx, p.para,"
    "   (p.doc_id = f.fst.d AND p.idx = f.fst.i) AS is_first"
    "   FROM p JOIN f USING (para)),"
    " agg AS (SELECT doc_id, count(*) AS n_paragraphs,"
    "   sum(CASE WHEN is_first THEN 0 ELSE 1 END) AS n_removed,"
    "   md5(string_agg(para, chr(10) ORDER BY idx)"
    "    FILTER (WHERE is_first)) AS cleaned_md5"
    "   FROM k GROUP BY doc_id)"
    " SELECT a.doc_id,"
    " CAST(coalesce(g.n_paragraphs, 0) AS BIGINT) AS n_paragraphs,"
    " CAST(coalesce(g.n_removed, 0) AS BIGINT) AS n_removed,"
    " CASE WHEN coalesce(g.n_paragraphs, 0) > coalesce(g.n_removed, 0)"
    "  THEN g.cleaned_md5 END AS cleaned_md5"
    " FROM aug a LEFT JOIN agg g USING (doc_id)"
)


@query("ll98_paragraph_dedup", oracle=_LL98_ORACLE)
def ll98_paragraph_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Paragraph-level exact dedup (the Dolma/C4 line-dedup recipe):
    every trimmed non-empty newline-delimited paragraph keeps only its
    globally first occurrence (smallest (doc_id, idx) — the min-struct
    device, no window) and later identical paragraphs are excised,
    survivors reassembled in order. The dedup grain between ll4
    (whole documents) and ll56 (fixed token segments) — the one real
    web boilerplate (footers, nav lines, quoted headers) repeats at.
    Runs over the augmented corpus (planted exact copies), so every
    copy's paragraphs are removals and the originals' survive intact.
    Scale: one hash exchange on the paragraph text + a same-key join
    back + per-doc in-group reassembly — the ll4 shape at paragraph
    grain (operators/dedup.paragraph_dedup)."""
    return dedup.paragraph_dedup(_augmented(spark, sf_dir), "doc_id", "text")


# ---------------------------------------------------------------------------
# ll88 — cluster-balanced sampling (ll50's clusters x ll71's temperature)
# ---------------------------------------------------------------------------


def _ll88_oracle() -> str:
    h = _hex10("'cbx#' || CAST(vec_id AS VARCHAR)")
    return (
        f"WITH asn AS (SELECT * FROM ( {_kmeans_oracle()} )),"
        " counts AS (SELECT cluster, count(*) AS n FROM asn"
        "   GROUP BY cluster),"
        " tot AS (SELECT sum(n) AS n_total, sum(pow(n, 0.3)) AS z"
        "   FROM counts),"
        " rates AS (SELECT cluster, round(least(1.0,"
        "   0.5 * n_total * (pow(n, 0.3) / z) / n), 6) AS rate"
        "   FROM counts CROSS JOIN tot)"
        " SELECT a.vec_id, a.cluster, CAST(r.rate AS DOUBLE) AS rate"
        " FROM asn a JOIN rates r USING (cluster)"
        f" WHERE {h} % 1000000 <"
        " CAST(round(r.rate * 1000000, 0) AS BIGINT)"
    )


@query("ll88_cluster_balanced_sample", oracle=_ll88_oracle())
def ll88_cluster_balanced_sample(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Cluster-balanced corpus sampling — the embedding-space version
    of ll71's temperature mixing, the composition ll50's docstring
    promises: assign every vector to its k-means cluster, DERIVE
    per-cluster keep rates p_c ∝ n_c^0.3 under a 50% budget (big
    clusters downsampled, small ones kept whole — the diversity-
    preserving mix DoReMi/SemDeDup-style curation wants when 'source'
    labels don't capture content), then keep by the salted portable
    hash — reproducible across runs, engines, partitioning.

    Scale: ll50's audited assignment (k-row centroid broadcast per
    Lloyd pass), one cluster-keyed count (k rows), a broadcast rate
    join, a narrow hash filter. Zero corpus-sized shuffles beyond the
    assignment itself."""
    from ..operators import clustering

    emb = load(spark, sf_dir, "embeddings")
    asn = clustering.kmeans_assign(emb, k=8, iters=3).select(
        "vec_id", "cluster"
    )
    counts = asn.groupBy("cluster").agg(F.count(F.lit(1)).alias("n"))
    tot = counts.agg(
        F.sum("n").alias("n_total"),
        F.sum(F.pow("n", F.lit(0.3))).alias("z"),
    )
    rates = counts.crossJoin(F.broadcast(tot)).select(
        "cluster",
        F.round(
            F.least(
                F.lit(1.0),
                F.lit(0.5)
                * F.col("n_total")
                * (F.pow("n", F.lit(0.3)) / F.col("z"))
                / F.col("n"),
            ),
            6,
        ).alias("rate"),
    )
    h = dedup.portable_hash40(
        F.concat(F.lit("cbx#"), F.col("vec_id").cast("string"))
    )
    return (
        asn.join(F.broadcast(rates), "cluster")
        .where(
            h % F.lit(1000000)
            < F.round(F.col("rate") * 1000000, 0).cast("bigint")
        )
        .select("vec_id", "cluster", F.col("rate").cast("double").alias("rate"))
    )


# ---------------------------------------------------------------------------
# ll89 — DSIR importance selection (the sampling step after ll53's weights)
# ---------------------------------------------------------------------------


def _ll89_oracle() -> str:
    h = _hex10("'dsx#' || CAST(doc_id AS VARCHAR)")
    return (
        f"WITH w AS (SELECT * FROM ( {_DSIR_ORACLE} )),"
        " mx AS (SELECT max(log_weight) AS m FROM w),"
        " p AS (SELECT doc_id, n_bigrams, log_weight,"
        "   floor(least(1.0, exp(log_weight - m)) * 1000000) AS thr"
        "   FROM w CROSS JOIN mx)"
        " SELECT doc_id, n_bigrams, log_weight,"
        " CAST(round(thr / 1000000.0, 6) AS DOUBLE) AS keep_prob"
        f" FROM p WHERE {h} % 1000000 < CAST(thr AS BIGINT)"
    )


@query("ll89_dsir_select", oracle=_ll89_oracle())
def ll89_dsir_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR SELECTION (Xie et al. 2023, the sampling step after ll53's
    scoring): keep each document with probability proportional to its
    importance weight — p = exp(log_weight − max_log_weight), so the
    most target-like document keeps with certainty and the rest scale
    down exponentially; the keep decision is the salted portable-hash
    coin every sampler in this engine uses (deterministic, incremental
    -append-stable). ll53 measures, this one ACTS — together they are
    the complete learned-selection tier.

    Scale: ll53's audited scoring pass (hashed bigram features, no
    vocabulary), a 1-row max broadcast, a narrow hash filter. The
    threshold is floor-quantized to integer millionths so both
    engines compare identical integers."""
    from ..operators.importance import dsir_logweights

    docs = load(spark, sf_dir, "documents")
    w = dsir_logweights(docs, target=F.col("lang") == "en")
    mx = w.agg(F.max("log_weight").alias("m"))
    p = w.crossJoin(F.broadcast(mx)).select(
        "doc_id",
        "n_bigrams",
        "log_weight",
        F.floor(
            F.least(
                F.lit(1.0), F.exp(F.col("log_weight") - F.col("m"))
            )
            * F.lit(1000000.0)
        ).alias("thr"),
    )
    h = dedup.portable_hash40(
        F.concat(F.lit("dsx#"), F.col("doc_id").cast("string"))
    )
    return p.where(h % F.lit(1000000) < F.col("thr").cast("bigint")).select(
        "doc_id",
        "n_bigrams",
        "log_weight",
        F.round(F.col("thr") / F.lit(1000000.0), 6)
        .cast("double")
        .alias("keep_prob"),
    )


# ---------------------------------------------------------------------------
# ll90 — perceptual image dedup (average-hash groups across re-encodes)
# ---------------------------------------------------------------------------


def _ll90_oracle() -> str:
    # byte k (0-based) of the 48-byte raster, from the concatenated
    # md5 hex; the jittered twin bumps byte 47 by +1 mod 256
    hexes = (
        "md5(text) || md5(text || 'a') || md5(text || 'b')"
    )
    byte = (
        f"CAST(('0x' || substr(h, 2 * k + 1, 2)) AS BIGINT)"
    )
    return (
        f"WITH base AS (SELECT doc_id, {hexes} AS h FROM documents),"
        " bytes0 AS (SELECT doc_id, list_transform(range(0, 48),"
        f"  k -> {byte}) AS b FROM base),"
        # original + jittered twin (id + 1000000, byte 47 bumped)
        " variants AS ("
        "  SELECT doc_id, b FROM bytes0"
        "  UNION ALL"
        "  SELECT doc_id + 1000000,"
        "   list_append(b[1:47], (b[48] + 1) % 256) FROM bytes0),"
        " grays AS (SELECT doc_id, list_transform(range(0, 16),"
        "  i -> b[3 * i + 1] + b[3 * i + 2] + b[3 * i + 3]) AS g"
        "  FROM variants),"
        " hashed AS (SELECT doc_id,"
        "  list_sum(list_transform(range(0, 16), i ->"
        "   CASE WHEN g[i + 1] * 16 >= list_sum(g)"
        "   THEN (1::BIGINT << i) ELSE 0 END)) AS ahash FROM grays)"
        " SELECT CAST(ahash AS BIGINT) AS ahash,"
        " CAST(count(*) AS BIGINT) AS n_docs,"
        " CAST(min(doc_id) AS BIGINT) AS keeper"
        " FROM hashed GROUP BY ahash HAVING count(*) >= 2"
    )


@query("ll90_image_ahash_dedup", oracle=_ll90_oracle())
def ll90_image_ahash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual image dedup: average-hash (aHash) groups over the
    corpus images PLUS a brightness-jittered re-encode of each (+1 on
    one subpixel — bytes differ, so ll4's exact tier and the payload
    checksums all miss it; the perceptual hash does not). The
    multimodal member of the dedup family: decode (real PPM codec,
    Arrow-batched) → integer-exact 16-bit aHash → plain hash groupBy —
    after the UDF boundary this is exactly the ll4 shape, one shuffle
    on a short key, no pairs. The oracle recomputes rasters, jitter,
    grays, and the threshold bits from the same md5 hex, so the whole
    decode→hash→group path is value-checked. Near-threshold pixels CAN
    flip under jitter (both engines agree on which), so group sizes
    are the honest robustness measurement, not an assumed 2."""
    docs = load(spark, sf_dir, "documents")
    orig = multimodal.attach_image_payload(docs, "doc_id", "text")
    jit = multimodal.attach_image_payload_jittered(docs, "doc_id", "text")
    ah = multimodal.image_ahash(orig.unionByName(jit))
    return (
        ah.groupBy("ahash")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.min("doc_id").cast("bigint").alias("keeper"),
        )
        .where(F.col("n_docs") >= 2)
    )


# ---------------------------------------------------------------------------
# ll91 — concordance / keyword-in-context (corpus search tooling)
# ---------------------------------------------------------------------------

_LL91_TERMS = ("spark", "table", "stream")

_LL91_ORACLE = (
    f"WITH tok AS (SELECT doc_id, {_TOKENS_SQL} AS t FROM documents),"
    " pos AS (SELECT doc_id, t, unnest(range(len(t))) AS p,"
    "   unnest(t) AS term FROM tok)"
    " SELECT doc_id, CAST(p AS BIGINT) AS pos, term,"
    # coalesce: DuckDB's out-of-range list_slice is NULL where Spark's
    # is an empty array (joined to '')
    " coalesce(array_to_string("
    "  list_slice(t, greatest(p - 2, 0) + 1, p), ' '), '') AS left_ctx,"
    " coalesce(array_to_string(list_slice(t, p + 2, p + 3), ' '), '')"
    "  AS right_ctx"
    " FROM pos WHERE term IN ('spark', 'table', 'stream')"
)


@query("ll91_concordance", oracle=_LL91_ORACLE)
def ll91_concordance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concordance / keyword-in-context (KWIC): every occurrence of the
    query terms with two tokens of context on each side — the corpus
    inspection tool run on filter-rule hits before shipping them (what
    does 'spark' actually look like in context in slice X?), and the
    evidence extractor behind contamination review (ll58's audit
    direction needs the text around the hit, not just counts).

    Scale: one narrow posexplode carrying the token array alongside
    (context slices are array ops on the carried column — no join
    back to the corpus), a term IN-list filter that prunes at the
    explode, output linear in match count. No shuffle at all until
    whatever consumes the hits."""
    docs = load(spark, sf_dir, "documents")
    toks = docs.select("doc_id", T.tokenize(F.col("text")).alias("t"))
    pos = toks.select(
        "doc_id", "t", F.posexplode("t").alias("p", "term")
    ).where(F.col("term").isin(*_LL91_TERMS))
    start0 = F.greatest(F.col("p") - 2, F.lit(0))
    return pos.select(
        "doc_id",
        F.col("p").cast("bigint").alias("pos"),
        "term",
        F.array_join(
            F.slice("t", start0 + 1, F.col("p") - start0), " "
        ).alias("left_ctx"),
        F.array_join(F.slice("t", F.col("p") + 2, 2), " ").alias(
            "right_ctx"
        ),
    )


# ---------------------------------------------------------------------------
# ll92 — mapInArrow byte-class histogram (zero-copy Python boundary)
# ---------------------------------------------------------------------------

_LL92_ORACLE = (
    # payload = 4 concatenated md5 digests (64 bytes); byte k from hex
    "WITH d AS (SELECT doc_id,"
    " md5(text) || md5(text || 'a') || md5(text || 'b') || md5(text || 'c')"
    "  AS h FROM documents),"
    " b AS (SELECT doc_id,"
    "  CAST(('0x' || substr(h, 2 * k + 1, 2)) AS BIGINT) AS v"
    "  FROM d, unnest(range(0, 64)) u(k))"
    " SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bytes,"
    " CAST(sum(CASE WHEN v < 64 THEN 1 ELSE 0 END) AS BIGINT) AS c0,"
    " CAST(sum(CASE WHEN v >= 64 AND v < 128 THEN 1 ELSE 0 END) AS BIGINT)"
    "  AS c1,"
    " CAST(sum(CASE WHEN v >= 128 AND v < 192 THEN 1 ELSE 0 END) AS BIGINT)"
    "  AS c2,"
    " CAST(sum(CASE WHEN v >= 192 THEN 1 ELSE 0 END) AS BIGINT) AS c3"
    " FROM b GROUP BY doc_id"
)


@query("ll92_byte_histogram_arrow", oracle=_LL92_ORACLE)
def ll92_byte_histogram_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Byte-class histogram over binary payloads via ``mapInArrow`` —
    the zero-copy Python boundary (RecordBatches in, 4 ints per row
    out, no pandas conversion), completing the engine's Python-API
    matrix; the histogram itself is the cheap binary-content sniffer
    (text vs compressed vs random) a multimodal ingest runs before
    deciding which decoder family to try. Payloads are md5-derived
    (the ll17/ll75 convention), so every count is SQL-checkable.
    Scale: narrow per-row pass, Arrow-batched, no shuffle."""
    docs = load(spark, sf_dir, "documents")
    binary = multimodal.attach_multiwindow_payload(docs, "doc_id", "text")
    return multimodal.byte_class_histogram_arrow(
        binary.select("doc_id", "payload")
    )


# ---------------------------------------------------------------------------
# ll93 — filter-rule ablation report (marginal attribution per rule)
# ---------------------------------------------------------------------------


def _ll93_oracle() -> str:
    # reuse the ll43 oracle's signal CTEs verbatim (everything up to
    # its final verdict SELECT), then flag/ablate per rule
    prefix = _GOPHER_ORACLE.split(
        " SELECT doc_id, CAST(n_words AS INT) AS n_words,"
    )[0]
    flags = [
        ("word_count", "n_words BETWEEN 30 AND 100000"),
        ("mean_word_len", "mwl BETWEEN 3 AND 10"),
        ("symbol_ratio", "symr < 0.1"),
        ("bullet_lines", "bulf < 0.9"),
        ("ellipsis_lines", "ellf < 0.3"),
        ("alpha_words", "alpf > 0.8"),
        ("stopwords", "sw >= 1"),
    ]
    cols = ", ".join(
        f"CASE WHEN {pred} THEN 0 ELSE 1 END AS f_{n}" for n, pred in flags
    )
    nf = " + ".join(f"f_{n}" for n, _ in flags)
    unions = " UNION ALL ".join(
        f"SELECT '{n}' AS rule, f_{n} AS f, nf FROM tot" for n, _ in flags
    )
    return (
        prefix
        + f", fl AS (SELECT doc_id, {cols} FROM m),"
        + f" tot AS (SELECT *, {nf} AS nf FROM fl),"
        + f" e AS ({unions})"
        + " SELECT rule, CAST(count(*) AS BIGINT) AS n_docs,"
        " CAST(sum(f) AS BIGINT) AS n_fail,"
        " CAST(sum(CASE WHEN f = 1 AND nf = 1 THEN 1 ELSE 0 END)"
        "  AS BIGINT) AS n_unique_fail,"
        " CAST(round(sum(f) * 1.0 / count(*), 6) AS DOUBLE) AS fail_rate"
        " FROM e GROUP BY rule"
    )


@query("ll93_filter_rule_ablation", oracle=_ll93_oracle())
def ll93_filter_rule_ablation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-filter rule ABLATION: for each Gopher rule (ll43's set,
    same constants via the shared signal frame), how many documents it
    fails and — the number that actually matters — how many it fails
    UNIQUELY (docs every other rule passes: exactly the documents that
    come back if you drop the rule). The report a curation team reads
    before shipping a filter stack: a rule with high unique-fail is
    carrying real weight; one with zero is redundant on this corpus
    and pure risk. A null signal (undefined ratio) counts as a fail on
    both sides (CASE/when-otherwise semantics agree).

    Scale: ONE signal pass (ll43's codegen projection), a 7-flag
    per-doc projection, a 7-way rule explode (rows = 7·N but 3 tiny
    ints wide), one rule-keyed aggregation — no joins, no windows."""
    docs = load(spark, sf_dir, "documents")
    m = _gopher_signal_frame(docs)
    rules = _gopher_rules()
    flags = m.select(
        "doc_id",
        *[
            F.when(ok, 0).otherwise(1).alias(f"f_{name}")
            for name, ok in rules
        ],
    )
    nf = None
    for name, _ in rules:
        c = F.col(f"f_{name}")
        nf = c if nf is None else nf + c
    tot = flags.select("*", nf.alias("nf"))
    e = tot.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(name).alias("rule"),
                        F.col(f"f_{name}").alias("f"),
                    )
                    for name, _ in rules
                ]
            )
        ).alias("r"),
        "nf",
    ).select("r.rule", "r.f", "nf")
    return e.groupBy("rule").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("f").cast("bigint").alias("n_fail"),
        F.sum(F.when((F.col("f") == 1) & (F.col("nf") == 1), 1).otherwise(0))
        .cast("bigint")
        .alias("n_unique_fail"),
        F.round(F.sum("f") * F.lit(1.0) / F.count(F.lit(1)), 6)
        .cast("double")
        .alias("fail_rate"),
    )


# ---------------------------------------------------------------------------
# ll94 — the END-TO-END CURATION PIPELINE (the engine's flagship)
# ---------------------------------------------------------------------------

# 11-token boilerplate planted on every 7th document so the excision
# stage has a real cross-document span to remove (the license-footer
# case ExactSubstr dedup exists for)
_LL94_BOILER = (
    "this boilerplate legal notice shall accompany every copy of the corpus"
)
_LL94_PACK = 2048


def _ll94_ctes(
    aug_ctes: str | None = None, minhash_cutoff: bool = True
) -> str:
    """The composed six-stage CTE chain (fixture ``aug`` through the
    packed frame ``pk``) — each stage's machinery is the same builder
    its standalone query uses (``_gopher_m_ctes``,
    ``_minhash_oracle_over``, ``_excise_ctes_over``,
    ``_dsir_oracle_over``), bound to the previous stage's output
    instead of ``documents``. Shared by ll94's per-doc oracle, ll99's
    funnel oracle, and — via the two knobs — ll100's incremental
    contract: ``aug_ctes`` swaps in a different fixture (CTE text
    ending with an ``aug`` relation, leading space, trailing comma)
    and ``minhash_cutoff=False`` relaxes stage 3's shingle-df cutoff
    to the no-cutoff grain (ll63's pure-per-document-artifact
    property, which is what makes a frozen band index provably equal
    to from-scratch indexing)."""
    sel_hash = _hex10("'cpl#' || CAST(doc_id AS VARCHAR)")
    if aug_ctes is None:
        aug_ctes = (
            # fixture: boilerplate on %7, exact copies (+1e6) of %10=0,
            # near copies (+2e6, 3-token postscript) of %10=5
            " base AS MATERIALIZED (SELECT doc_id,"
            f"  CASE WHEN doc_id % 7 = 0 THEN text || ' {_LL94_BOILER}'"
            "   ELSE text END AS text, lang FROM documents),"
            " aug AS MATERIALIZED ("
            "  SELECT doc_id, text, lang FROM base"
            "  UNION ALL SELECT doc_id + 1000000, text, lang FROM base"
            "   WHERE doc_id % 10 = 0"
            "  UNION ALL SELECT doc_id + 2000000,"
            "   text || ' postscript edit marker', lang FROM base"
            "   WHERE doc_id % 10 = 5),"
        )
    pairs_sql = _minhash_oracle_over(
        "SELECT doc_id, text FROM d2",
        max_shingle_df=0.5 if minhash_cutoff else None,
    )
    return (
        "WITH RECURSIVE"
        + aug_ctes +
        # stage 1: Gopher rule gate (ll43's machinery over aug)
        " g AS MATERIALIZED (SELECT doc_id FROM (SELECT * FROM ("
        f"  WITH {_gopher_m_ctes('aug')}"
        f"  SELECT doc_id FROM m WHERE {_GOPHER_KEPT_SQL}) gq) gqq),"
        " d1 AS MATERIALIZED (SELECT a.doc_id, a.text, a.lang FROM aug a"
        "   JOIN g USING (doc_id)),"
        # stage 2: exact dedup — keeper = min doc_id per normalized md5
        " d2 AS MATERIALIZED (SELECT doc_id, text, lang FROM ("
        "   SELECT doc_id, text, lang, min(doc_id) OVER (PARTITION BY"
        "    md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')))) AS kp"
        "   FROM d1) dq WHERE doc_id = kp),"
        # stage 3: minhash+LSH near-dup pairs (ll6's machinery over d2)
        # + connected components, keep the min-id canonical per cluster
        " pairs AS MATERIALIZED (SELECT * FROM ("
        f" {pairs_sql} ) mh),"
        " sym AS (SELECT doc_a AS src, doc_b AS dst FROM pairs"
        "   UNION SELECT doc_b, doc_a FROM pairs),"
        " nodes AS (SELECT DISTINCT src AS v FROM sym),"
        " reach(v, lbl) AS ("
        "   SELECT v, v FROM nodes"
        "   UNION"
        "   SELECT s.dst, r.lbl FROM reach r JOIN sym s ON s.src = r.v),"
        " comp AS (SELECT v AS doc_id, min(lbl) AS canonical FROM reach"
        "   GROUP BY v),"
        " dropped AS MATERIALIZED (SELECT doc_id FROM comp WHERE doc_id <> canonical),"
        " d3 AS MATERIALIZED (SELECT * FROM d2"
        "   WHERE doc_id NOT IN (SELECT doc_id FROM dropped)),"
        # stage 4: ExactSubstr span excision (ll87's machinery over d3),
        # reassembling cleaned TEXT for the downstream scorer
        " cleaned0 AS MATERIALIZED (SELECT * FROM ("
        f"  WITH {_excise_ctes_over('d3')},"
        "   re AS (SELECT doc_id, count(*) AS n_kept,"
        "     string_agg(tok, ' ' ORDER BY idx) AS ctext FROM kept"
        "     GROUP BY doc_id)"
        "   SELECT c.doc_id, coalesce(r.n_kept, 0) AS n_kept,"
        "    coalesce(r.ctext, '') AS ctext"
        "   FROM counts c LEFT JOIN re r USING (doc_id)) cq),"
        " cleaned AS MATERIALIZED (SELECT d.doc_id, d.lang,"
        "   coalesce(c.n_kept, 0) AS n_kept, coalesce(c.ctext, '') AS ctext"
        "   FROM d3 d LEFT JOIN cleaned0 c USING (doc_id)),"
        # stage 5: DSIR scoring over the CLEANED text (ll53's machinery)
        # + ll89's max-normalized hash-coin selection
        " dsw AS MATERIALIZED (SELECT * FROM ("
        f" {_dsir_oracle_over('(SELECT doc_id, ctext AS text, lang FROM cleaned)')}"
        " ) dsq),"
        " mx AS MATERIALIZED (SELECT max(log_weight) AS m FROM dsw),"
        " sel AS MATERIALIZED (SELECT doc_id, log_weight,"
        "   floor(least(1.0, exp(log_weight - m)) * 1000000) AS thr"
        "   FROM dsw CROSS JOIN mx),"
        " d5 AS MATERIALIZED (SELECT doc_id, log_weight FROM sel"
        f"  WHERE {sel_hash} % 1000000 < CAST(thr AS BIGINT)),"
        # stage 6: contiguous sequence packing (ll19's exclusive prefix
        # sum in doc_id order over the cleaned token counts)
        " pk AS MATERIALIZED (SELECT s.doc_id, s.log_weight, c.n_kept AS n_tokens,"
        "   coalesce(sum(c.n_kept) OVER (ORDER BY s.doc_id"
        "    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum"
        "   FROM d5 s JOIN cleaned c USING (doc_id))"
    )


def _ll94_oracle() -> str:
    return _ll94_ctes() + (
        " SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,"
        " CAST(log_weight AS DOUBLE) AS log_weight,"
        f" CAST(cum // {_LL94_PACK} AS BIGINT) AS pack_id,"
        f" CAST(cum % {_LL94_PACK} AS BIGINT) AS pack_offset"
        " FROM pk"
    )


@query("ll94_curation_pipeline", oracle=_ll94_oracle())
def ll94_curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """THE FLAGSHIP: the complete modern pretraining-data curation
    recipe as ONE lazy composed plan — quality rules → exact dedup →
    near dedup → repeated-span excision → learned importance selection
    → sequence packing — the LLM-era analog of the reference's own
    end-to-end PipeLine.scala:7-42, proving the engine's operators
    COMPOSE (ll40 proves it for the dedup tier alone; this chains all
    six curation families):

      1. Gopher format rules (ll43's signal frame + rule set) gate the
         raw corpus.
      2. Exact dedup (ll4's normalized-md5 fingerprint): keeper = min
         doc_id per fingerprint — one window over the hash key.
      3. MinHash+LSH near-dup pairs (ll6's operator) → connected
         components (I1's operator) → only cluster canonicals survive.
      4. ExactSubstr span excision (ll87's operator, emit="text"):
         cross-document repeated spans cut out, survivors reassembled.
      5. DSIR importance scoring of the CLEANED text (ll53's operator)
         + ll89's max-normalized keep-probability hash coin.
      6. Contiguous sequence packing (ll19's hierarchical exclusive
         prefix sum) assigns each survivor its (pack_id, pack_offset)
         training-shard slot.

    The planted fixture makes every stage observable: an 11-token
    boilerplate footer on every 7th doc (excised in stage 4), exact
    copies of every 10th doc (dropped in stage 2), 3-token-postscript
    near copies of the %10=5 docs (dropped in stage 3).

    Scale shape = the union of its audited parts: the only
    corpus-sized shuffles are the fingerprint window (stage 2), the
    minhash band join + CC (stage 3), the gram-key count + (doc, idx)
    anti-join (stage 4), the doc-keyed DSIR feature shuffle (stage 5),
    and the range partition (stage 6). Stage boundaries that feed >1
    consumer (d2, cleaned) are localCheckpointed — the same documented
    k-consumer boundary class as the Lloyd frames. The single SQL
    oracle composes the SAME CTE machinery each stage's standalone
    oracle uses, so the whole path is value-checked end to end."""
    return _curation_stage_frames(spark, sf_dir)["packed"].select(
        "doc_id",
        F.col("n_tokens").cast("bigint").alias("n_tokens"),
        F.col("log_weight").cast("double").alias("log_weight"),
        # integer DIV, not float floor(cum/2048): cum is an exact
        # bigint and the oracle's `cum // 2048` is integer division —
        # the float detour agreed only below 2^53 (ADVICE r7)
        F.expr(f"cum DIV {_LL94_PACK}").cast("bigint").alias("pack_id"),
        (F.col("cum") % _LL94_PACK).cast("bigint").alias("pack_offset"),
    )


def _curation_stage_frames(
    spark: SparkSession, sf_dir: str
) -> dict[str, DataFrame]:
    """Build the six composed stages ONCE and return every boundary
    frame — ll94 reads ``packed``, ll99's funnel report aggregates all
    of them. Keys: aug, d1, d2, d3, cleaned, d5, packed (packed
    carries doc_id, n_tokens, log_weight, cum)."""
    from ..operators import graph
    from ..operators.importance import dsir_logweights
    from ..operators.relational import exclusive_prefix_sum

    docs = load(spark, sf_dir, "documents").select("doc_id", "text", "lang")
    base = docs.select(
        "doc_id",
        F.when(
            F.col("doc_id") % 7 == 0,
            F.concat("text", F.lit(" " + _LL94_BOILER)),
        )
        .otherwise(F.col("text"))
        .alias("text"),
        "lang",
    )
    exact_copies = base.where(F.col("doc_id") % 10 == 0).select(
        (F.col("doc_id") + 1000000).alias("doc_id"), "text", "lang"
    )
    near_copies = base.where(F.col("doc_id") % 10 == 5).select(
        (F.col("doc_id") + 2000000).alias("doc_id"),
        F.concat("text", F.lit(" postscript edit marker")).alias("text"),
        "lang",
    )
    aug = base.unionAll(exact_copies).unionAll(near_copies)
    # _spread before the text stages (guide §2.6 idle capacity, r14):
    # the union of scan filters arrives on the scan's few partitions,
    # serializing the Gopher regex + fingerprint passes; every
    # downstream consumer is key-based (partitioning-invariant)
    aug = dedup._spread(aug)

    # stage 1: Gopher gate — ll43's shared signal frame + rule set
    sig = _gopher_signal_frame(aug)
    kept_pred = None
    for _, ok in _gopher_rules():
        kept_pred = ok if kept_pred is None else kept_pred & ok
    d1 = aug.join(sig.where(kept_pred).select("doc_id"), "doc_id")

    # stage 2: exact dedup — min doc_id per normalized-text fingerprint
    d2 = (
        d1.withColumn("fp", T.text_fingerprint(F.col("text")))
        .withColumn("kp", F.min("doc_id").over(W.partitionBy("fp")))
        .where(F.col("doc_id") == F.col("kp"))
        .select("doc_id", "text", "lang")
        # two consumers (the pair tier + the survivor anti-join) — the
        # documented materialization boundary, else Catalyst re-runs
        # stages 1-2 per consumer
        .localCheckpoint(eager=True)
    )

    # stage 3: near dedup — ll6's pair tier + I1's connected components
    pairs = dedup.minhash_lsh_pairs(
        d2, "doc_id", "text", k=3, threshold=0.4, max_shingle_df=0.5
    )
    dropped = (
        graph.connected_components(pairs, src="doc_a", dst="doc_b")
        .where(F.col("vertex") != F.col("component"))
        .select(F.col("vertex").alias("doc_id"))
    )
    # d3 feeds the excision gram pass, the kept-token side, the narrow
    # count, the cleaned projection, and ll99's s3 funnel row — without
    # a boundary each consumer re-runs the anti-join over the CC
    # labels (guide §1.2, r14)
    d3 = d2.join(dropped, "doc_id", "left_anti").localCheckpoint(eager=True)

    # stage 4: ExactSubstr excision, reassembling cleaned TEXT
    ex = dedup.excise_repeated_spans(
        d3, "doc_id", "text", min_len=8, min_docs=2, emit="text"
    )
    cleaned = (
        d3.select("doc_id", "lang")
        .join(ex, "doc_id", "left")
        .select(
            "doc_id",
            "lang",
            F.coalesce(
                F.col("n_tokens") - F.col("n_removed"), F.lit(0)
            )
            .cast("bigint")
            .alias("n_kept"),
            F.coalesce("cleaned_text", F.lit("")).alias("ctext"),
        )
        # three consumers (DSIR train pass, DSIR score join, packing)
        .localCheckpoint(eager=True)
    )

    # stage 5: DSIR scoring of the cleaned text + ll89's selection coin
    w = dsir_logweights(
        cleaned.select("doc_id", F.col("ctext").alias("text"), "lang"),
        target=F.col("lang") == "en",
    )
    mx = w.agg(F.max("log_weight").alias("m"))
    sel = w.crossJoin(F.broadcast(mx)).select(
        "doc_id",
        "log_weight",
        F.floor(
            F.least(F.lit(1.0), F.exp(F.col("log_weight") - F.col("m")))
            * F.lit(1000000.0)
        ).alias("thr"),
    )
    coin = dedup.portable_hash40(
        F.concat(F.lit("cpl#"), F.col("doc_id").cast("string"))
    )
    d5 = sel.where(coin % F.lit(1000000) < F.col("thr").cast("bigint")).select(
        "doc_id", "log_weight"
    )

    # stage 6: sequence packing — hierarchical exclusive prefix sum
    toks = d5.join(
        cleaned.select("doc_id", F.col("n_kept").alias("n_tokens")), "doc_id"
    )
    packed = exclusive_prefix_sum(toks, "doc_id", "n_tokens")
    return {
        "aug": aug,
        "d1": d1,
        "d2": d2,
        "d3": d3,
        "cleaned": cleaned,
        "d5": d5,
        "packed": packed,
    }


def _ll99_oracle() -> str:
    """The funnel SELECT over ll94's shared CTE chain: one row per
    stage with surviving doc count and total (cleaned) token count —
    raw tokenize counts through stage 3, excised counts from stage 4
    on; the 'packed' row's n_docs is the PACK count (documented
    semantic switch, the only row where docs would duplicate s5)."""
    tok_n = f"len({_TOKENS_SQL})"
    return _ll94_ctes() + (
        f" SELECT 's0_input' AS stage, count(*) AS n_docs,"
        f"  sum({tok_n}) AS n_tokens FROM aug"
        f" UNION ALL SELECT 's1_quality', count(*), sum({tok_n}) FROM d1"
        f" UNION ALL SELECT 's2_exact_dedup', count(*), sum({tok_n})"
        "   FROM d2"
        f" UNION ALL SELECT 's3_near_dedup', count(*), sum({tok_n})"
        "   FROM d3"
        " UNION ALL SELECT 's4_excised', count(*), sum(n_kept)"
        "   FROM cleaned"
        " UNION ALL SELECT 's5_selected', count(*), sum(n_tokens)"
        "   FROM pk"
        f" UNION ALL SELECT 's6_packed', count(DISTINCT cum // {_LL94_PACK}),"
        "   sum(n_tokens) FROM pk"
    )


def _ll99_wrap(inner: str) -> str:
    # cast AFTER the union (sum() is HUGEINT in DuckDB, NULL-able)
    return (
        f"SELECT stage, CAST(n_docs AS BIGINT) AS n_docs,"
        f" CAST(coalesce(n_tokens, 0) AS BIGINT) AS n_tokens"
        f" FROM ({inner}) fq"
    )


@query("ll99_curation_funnel", oracle=_ll99_wrap(_ll99_oracle()))
def ll99_curation_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The curation-funnel DATACARD of the ll94 flagship: one row per
    pipeline stage with surviving document count and total token count
    — the observability artifact a data team reviews before committing
    a corpus (how much did quality rules drop? how much text did
    excision actually cut? what's the final token budget and pack
    count?). Stages share ll94's frames (ONE build of the composed
    plan; the funnel is seven aggregates over its boundary frames),
    and the oracle shares ll94's CTE chain — flagship and report can
    never drift apart. Token columns: raw tokenize counts through
    stage 3, cleaned counts from excision on; the s6 row's n_docs is
    the PACK count (the only stage where doc count would repeat s5).
    Scale: seven aggregates over already-materialized boundaries —
    the report is free relative to the pipeline it describes."""
    stages = _curation_stage_frames(spark, sf_dir)
    tok_n = F.size(T.tokenize(F.col("text")))

    def srow(name: str, df: DataFrame, tokens) -> DataFrame:
        return df.agg(
            F.lit(name).alias("stage"),
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.coalesce(F.sum(tokens), F.lit(0))
            .cast("bigint")
            .alias("n_tokens"),
        )

    pk = stages["packed"]
    rows = [
        srow("s0_input", stages["aug"], tok_n),
        srow("s1_quality", stages["d1"], tok_n),
        srow("s2_exact_dedup", stages["d2"], tok_n),
        srow("s3_near_dedup", stages["d3"], tok_n),
        srow("s4_excised", stages["cleaned"], F.col("n_kept")),
        srow("s5_selected", pk, F.col("n_tokens")),
        pk.agg(
            F.lit("s6_packed").alias("stage"),
            # integer DIV like ll94's pack_id (ADVICE r7)
            F.count_distinct(F.expr(f"cum DIV {_LL94_PACK}"))
            .cast("bigint")
            .alias("n_docs"),
            F.coalesce(F.sum("n_tokens"), F.lit(0))
            .cast("bigint")
            .alias("n_tokens"),
        ),
    ]
    out = rows[0]
    for r in rows[1:]:
        out = out.unionAll(r)
    return out


# ---------------------------------------------------------------------------
# ll101 — learned quality scorer (weak labels -> logistic IRLS -> gate)
# ---------------------------------------------------------------------------


def _ll101_oracle() -> str:
    """Compose ll81's hashed-feature CTEs, ll43's rule CTEs (the weak
    labels), the weak-positive prototype (per-dim 6dp-rounded mean of
    the kept docs' embeddings — the Rocchio centroid), and c8's
    unrolled 3-step IRLS CTEs (exact DECIMAL(28,9) per-row
    quantization before every sum, closed-form 2x2 Newton in identical
    operation order) into the full train->score->gate SQL."""
    dec = "DECIMAL(28,9)"

    def msums(name: str, psrc: str) -> str:
        return (
            f" {name} AS (SELECT"
            f" CAST(sum(CAST(p * (1.0 - p) AS {dec})) AS DOUBLE) AS a0,"
            f" CAST(sum(CAST((p * (1.0 - p)) * x AS {dec})) AS DOUBLE) AS a1,"
            f" CAST(sum(CAST((p * (1.0 - p)) * x * x AS {dec})) AS DOUBLE)"
            "   AS a2,"
            f" CAST(sum(CAST(y - p AS {dec})) AS DOUBLE) AS g0,"
            f" CAST(sum(CAST((y - p) * x AS {dec})) AS DOUBLE) AS g1"
            f" FROM ({psrc}) tt),"
        )

    def wstep(name: str, m: str, pb0: str, pb1: str) -> str:
        return (
            f" {name} AS (SELECT"
            f" {pb0} + (a2 * g0 - a1 * g1) / det AS b0,"
            f" {pb1} + (a0 * g1 - a1 * g0) / det AS b1"
            f" FROM (SELECT *, a0 * a2 - a1 * a1 AS det FROM {m}) dd),"
        )

    mg = "round(round(w3.b0, 6) + round(w3.b1, 6) * q.x, 6) + 0.0"
    return (
        "WITH "
        + _LL81_CTES
        + ","
        + _gopher_m_ctes("documents")
        + ","
        # the Rocchio prototype: per-dim 6dp-rounded mean embedding of
        # the weak-POSITIVE docs (the kmeans per-dim-mean device)
        " pr0 AS (SELECT unnest(embedding) AS v,"
        "  unnest(range(len(embedding))) AS i"
        "  FROM f JOIN m ON m.doc_id = f.doc_id"
        f"  WHERE {_GOPHER_KEPT_SQL}),"
        " proto AS (SELECT list(av ORDER BY i) AS pv FROM ("
        "  SELECT i, round(avg(v), 6) AS av FROM pr0 GROUP BY i) pq),"
        # the 1-D feature: cosine of each doc's hashed embedding to
        # the prototype (already rounded to 6 by _cos_sql)
        " prj AS (SELECT doc_id,"
        f"  {_cos_sql('f.embedding', 'pv')} + 0.0 AS x"
        "  FROM f CROSS JOIN proto),"
        " td AS (SELECT p.doc_id, p.x,"
        f"  CASE WHEN {_GOPHER_KEPT_SQL} THEN 1.0 ELSE 0.0 END AS y"
        "  FROM prj p JOIN m ON m.doc_id = p.doc_id"
        "  WHERE p.x IS NOT NULL),"
        + msums(
            "m1",
            "SELECT y, x, 1.0 / (1.0 + exp(-(0.0 + 0.0 * x))) AS p FROM td",
        )
        + wstep("w1", "m1", "0.0", "0.0")
        + msums(
            "m2",
            "SELECT td.y, td.x,"
            " 1.0 / (1.0 + exp(-(w1.b0 + w1.b1 * td.x))) AS p"
            " FROM td CROSS JOIN w1",
        )
        + " m2b AS (SELECT m2.*, w1.b0 AS pb0, w1.b1 AS pb1"
        "   FROM m2 CROSS JOIN w1),"
        + wstep("w2", "m2b", "pb0", "pb1")
        + msums(
            "m3",
            "SELECT td.y, td.x,"
            " 1.0 / (1.0 + exp(-(w2.b0 + w2.b1 * td.x))) AS p"
            " FROM td CROSS JOIN w2",
        )
        + " m3b AS (SELECT m3.*, w2.b0 AS pb0, w2.b1 AS pb1"
        "   FROM m3 CROSS JOIN w2),"
        # wstep emits a trailing comma (it always precedes another CTE
        # in c8); the final SELECT follows directly here, so trim it
        + wstep("w3", "m3b", "pb0", "pb1").rstrip(",")
        + " SELECT q.doc_id, q.x AS hash_proj, q.y = 1.0 AS weak_label,"
        f" {mg} AS margin, ({mg}) > 0.0 AS keep"
        " FROM td q CROSS JOIN w3"
    )


@query("ll101_learned_quality_scorer", oracle=_ll101_oracle())
def ll101_learned_quality_scorer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEARNED quality scorer, trained in-engine on weak labels — the
    DCLM/fastText-style third rung of the quality ladder the engine
    already carries (Gopher RULES ll43 -> DSIR importance ll53 ->
    learned CLASSIFIER here): take ll43's rule verdicts as weak labels
    (the standard bootstrap when no human labels exist), featurize
    every document with ll81's vocabulary-free hashed embedding via
    its cosine to the WEAK-POSITIVE PROTOTYPE (the Rocchio / nearest-
    centroid device: the per-dim 6dp-rounded mean embedding of the
    kept docs — a learned direction in hashed-feature space, and the
    1-D oracle-checkable stand-in for the full 64-dim weight vector a
    production fastText head would learn; a fixed random ±1 projection
    carried no signal — measured all-keep at 0.668 majority, vs 0.81
    separability for the prototype cosine), fit P(keep | doc) by c8's
    3-step IRLS, and score + GATE the corpus with the learned margin —
    one composed lazy plan, every number value-checked: the margin is
    computed from 6dp-rounded betas so both engines do identical IEEE
    arithmetic.

    Why learn what the rules already decide: the classifier
    generalizes BEYOND the rule boundary — `weak_label` and `keep` are
    both emitted so their disagreement rows (docs the rules drop but
    the classifier scores high, and vice versa) are first-class
    output, which is exactly the reviewable artifact a DCLM-style
    curation loop audits before swapping rules for a model.

    Scale: feature pass = ll81's one (doc, bucket) map-side-combined
    count; the prototype is ONE dim-keyed partial aggregation whose
    64-row result broadcasts into a narrow cosine projection; training
    = 3 IRLS steps, each ONE map-side-combined aggregation with the
    betas as a 1-row broadcast (c8's audited layout); scoring = the
    same broadcast into a narrow projection. The embedding frame feeds
    the prototype AND the projection, and the training frame feeds 3
    sequential aggregations plus the scoring join — both are
    localCheckpointed (the documented k-consumer boundary class).

    Returns (doc_id, hash_proj, weak_label, margin, keep) for every
    doc with >= 1 token and a nonzero feature vector."""
    from .. import ml
    from ..functions.vectors import cosine_similarity

    docs = load(spark, sf_dir, "documents")
    emb = similarity.hashed_embeddings(docs, "doc_id", "text", dim=64)
    sig = _gopher_signal_frame(docs)
    kept = None
    for _, ok in _gopher_rules():
        kept = ok if kept is None else kept & ok
    labeled = (
        emb.join(sig.select("doc_id", kept.alias("kept")), "doc_id")
        # feeds the prototype aggregation AND the cosine projection
        .localCheckpoint(eager=True)
    )
    # Rocchio prototype: per-dim 6dp-rounded mean of the weak-positive
    # embeddings — one dim-keyed partial agg, assembled into a single
    # 64-double row (the kmeans centroid-frame device)
    proto = (
        labeled.where(F.col("kept"))
        .select(F.posexplode("embedding").alias("i", "v"))
        .groupBy("i")
        .agg(F.round(F.avg("v"), 6).alias("av"))
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("i", "av"))),
                lambda p: p["av"],
            ).alias("pv")
        )
    )
    x = F.round(cosine_similarity(F.col("embedding"), F.col("pv")), 6) + F.lit(
        0.0
    )
    td = (
        labeled.crossJoin(F.broadcast(proto))
        .select(
            "doc_id",
            x.alias("x"),
            F.when(F.col("kept"), 1.0).otherwise(0.0).alias("y"),
        )
        .where(F.col("x").isNotNull())
        # feeds 3 IRLS aggregation passes + the scoring join — without
        # the boundary Catalyst re-runs the hash-feature shuffle and
        # the prototype pass once per consumer
        .localCheckpoint(eager=True)
    )
    w = ml.logistic_irls_1d(td.select("y", "x"), steps=3)
    margin = (
        F.round(
            F.round(F.col("b0"), 6) + F.round(F.col("b1"), 6) * F.col("x"), 6
        )
        + F.lit(0.0)
    )
    return td.crossJoin(F.broadcast(w)).select(
        "doc_id",
        F.col("x").alias("hash_proj"),
        (F.col("y") == 1.0).alias("weak_label"),
        margin.alias("margin"),
        (margin > 0.0).alias("keep"),
    )


def ll101_components(spark: SparkSession, sf_dir: str) -> dict:
    """Bench decomposition of ll101 (VERDICT r9 item 8): the headline
    row's sf10 growth (6.8×, SCALE.md) was ATTRIBUTED to the
    hashed-feature pass without being measured — this times the three
    plan sections separately (the ss18/ll100 decomposition device):
    ``feature_s`` = hashed embeddings + weak labels materialized to
    the checkpoint boundary (the corpus-sized, disk-bound pass);
    ``train_s`` = Rocchio prototype + the 3 IRLS aggregations down to
    the 1-row beta frame (small shuffles over numbers); ``score_s`` =
    the broadcast-beta scoring projection drained to the driver. Not a
    registered query (it reports timings); bench.py records it in
    bench_full.json next to ll101's headline row."""
    import time as _time

    from .. import ml
    from ..functions.vectors import cosine_similarity

    docs = load(spark, sf_dir, "documents")
    t0 = _time.perf_counter()
    emb = similarity.hashed_embeddings(docs, "doc_id", "text", dim=64)
    sig = _gopher_signal_frame(docs)
    kept = None
    for _, ok in _gopher_rules():
        kept = ok if kept is None else kept & ok
    labeled = emb.join(
        sig.select("doc_id", kept.alias("kept")), "doc_id"
    ).localCheckpoint(eager=True)
    feature_s = _time.perf_counter() - t0

    t0 = _time.perf_counter()
    proto = (
        labeled.where(F.col("kept"))
        .select(F.posexplode("embedding").alias("i", "v"))
        .groupBy("i")
        .agg(F.round(F.avg("v"), 6).alias("av"))
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("i", "av"))),
                lambda p: p["av"],
            ).alias("pv")
        )
    )
    x = F.round(
        cosine_similarity(F.col("embedding"), F.col("pv")), 6
    ) + F.lit(0.0)
    td = (
        labeled.crossJoin(F.broadcast(proto))
        .select(
            "doc_id",
            x.alias("x"),
            F.when(F.col("kept"), 1.0).otherwise(0.0).alias("y"),
        )
        .where(F.col("x").isNotNull())
        .localCheckpoint(eager=True)
    )
    w = ml.logistic_irls_1d(td.select("y", "x"), steps=3)
    w = w.localCheckpoint(eager=True)
    train_s = _time.perf_counter() - t0

    t0 = _time.perf_counter()
    margin = (
        F.round(
            F.round(F.col("b0"), 6) + F.round(F.col("b1"), 6) * F.col("x"), 6
        )
        + F.lit(0.0)
    )
    td.crossJoin(F.broadcast(w)).select(
        "doc_id",
        F.col("x").alias("hash_proj"),
        (F.col("y") == 1.0).alias("weak_label"),
        margin.alias("margin"),
        (margin > 0.0).alias("keep"),
    ).toPandas()
    score_s = _time.perf_counter() - t0
    return {
        "feature_s": round(feature_s, 4),
        "train_s": round(train_s, 4),
        "score_s": round(score_s, 4),
    }


# ---------------------------------------------------------------------------
# ll100 — INCREMENTAL curation: the day-N delta through ll94's six
# stages against persisted state (VERDICT r8 item 6)
# ---------------------------------------------------------------------------

_LL100_POST = " postscript edit marker"


def _ll100_aug_ctes() -> str:
    """The incremental fixture's union corpus: BASE day = originals
    with doc_id <= t (t = floor(0.8·max id), so every delta id exceeds
    every base id — the precondition that makes min-id keepers, CC
    canonicals, and the packing order base-first); DELTA day = the
    remaining originals (genuinely new docs) plus planted copies that
    exercise every stateful stage: exact copies of base (+1e7, stage-2
    drops against the fingerprint snapshot), near copies of base
    (+2e7, stage-3 drops against the persisted band index), exact
    copies of delta naturals (+3e7, within-batch stage-2 drops), near
    copies of delta naturals (+4e7, within-batch stage-3 CC drops).
    Boilerplate rides on %7 of ALL originals so excision exercises the
    persisted gram counts — preceded by a doc-unique 'd<id>' token:
    without it, the 8-grams BRIDGING a doc's own text into the shared
    boiler collide whenever a base doc and a delta doc share the same
    pre-boiler word, pushing a base-count-1 gram to 2 via the delta —
    retroactively excising base text the incremental path has
    legitimately frozen (measured: exactly 4 base docs at sf0.01).
    The unique token pins every bridging gram's count at 1 while the
    boiler-interior grams stay corpus-shared; from-scratch and
    incremental agree EXACTLY, which is also the real production
    invariant (a frozen corpus is never retro-edited — a detected
    threshold-crossing triggers re-curation, not an in-place patch).
    Ends with the ``aug`` relation plus the ``tsel`` threshold CTE the
    final delta filter reuses."""
    return (
        " base0 AS MATERIALIZED (SELECT doc_id,"
        "  CASE WHEN doc_id % 7 = 0 THEN text || ' d' ||"
        f"   CAST(doc_id AS VARCHAR) || ' {_LL94_BOILER}'"
        "   ELSE text END AS text, lang FROM documents),"
        " tsel AS (SELECT CAST(floor(max(doc_id) * 0.8) AS BIGINT) AS t"
        "   FROM documents),"
        " aug AS MATERIALIZED ("
        "  SELECT doc_id, text, lang FROM base0"
        "  UNION ALL SELECT doc_id + 10000000, text, lang"
        "   FROM base0, tsel WHERE doc_id % 10 = 0 AND doc_id <= t"
        f"  UNION ALL SELECT doc_id + 20000000, text || '{_LL100_POST}',"
        "   lang FROM base0, tsel WHERE doc_id % 10 = 5 AND doc_id <= t"
        "  UNION ALL SELECT doc_id + 30000000, text, lang"
        "   FROM base0, tsel WHERE doc_id % 10 = 1 AND doc_id > t"
        f"  UNION ALL SELECT doc_id + 40000000, text || '{_LL100_POST}',"
        "   lang FROM base0, tsel WHERE doc_id % 10 = 6 AND doc_id > t),"
    )


# The CONTRACT: the oracle is a FROM-SCRATCH ll94 chain over the union
# corpus (no-cutoff stage 3 — ll63's pure-per-document-artifact grain),
# filtered to the delta docs. The Spark side never recomputes the base:
# it probes persisted state. Hash-equality of the two IS the
# incremental-equals-from-scratch proof, driver-attested.
_LL100_ORACLE = _ll94_ctes(_ll100_aug_ctes(), minhash_cutoff=False) + (
    " SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,"
    " CAST(log_weight AS DOUBLE) AS log_weight,"
    f" CAST(cum // {_LL94_PACK} AS BIGINT) AS pack_id,"
    f" CAST(cum % {_LL94_PACK} AS BIGINT) AS pack_offset"
    " FROM pk, tsel WHERE doc_id > t"
)


def _ll100_fixture(
    spark: SparkSession, sf_dir: str
) -> tuple[DataFrame, DataFrame, int]:
    """(base corpus, delta batch, split threshold t) — the Spark twin
    of ``_ll100_aug_ctes``. The max-id read is the same documented
    one-row driver action as ``derive_centroid_mod``."""
    docs = load(spark, sf_dir, "documents").select("doc_id", "text", "lang")
    t = int(docs.agg(F.max("doc_id")).collect()[0][0] * 0.8)
    base0 = docs.select(
        "doc_id",
        F.when(
            F.col("doc_id") % 7 == 0,
            F.concat(
                "text",
                F.lit(" d"),
                F.col("doc_id").cast("string"),
                F.lit(" " + _LL94_BOILER),
            ),
        )
        .otherwise(F.col("text"))
        .alias("text"),
        "lang",
    )
    base = base0.where(F.col("doc_id") <= t)
    dnew = base0.where(F.col("doc_id") > t)
    post = F.concat("text", F.lit(_LL100_POST)).alias("text")
    delta = (
        dnew.unionAll(
            base.where(F.col("doc_id") % 10 == 0).select(
                (F.col("doc_id") + 10_000_000).alias("doc_id"), "text", "lang"
            )
        )
        .unionAll(
            base.where(F.col("doc_id") % 10 == 5).select(
                (F.col("doc_id") + 20_000_000).alias("doc_id"), post, "lang"
            )
        )
        .unionAll(
            dnew.where(F.col("doc_id") % 10 == 1).select(
                (F.col("doc_id") + 30_000_000).alias("doc_id"), "text", "lang"
            )
        )
        .unionAll(
            dnew.where(F.col("doc_id") % 10 == 6).select(
                (F.col("doc_id") + 40_000_000).alias("doc_id"), post, "lang"
            )
        )
    )
    # _spread both sides ONCE at the fixture boundary (guide §2.6, r14):
    # the union-of-scan-filters arrives on the scan's few partitions and
    # every consumer (ll100/ll104/ll109 day-0 + day-N text stages,
    # ss21's feed write — whose file count is the drain's batch
    # parallelism) is key-based, so results are partitioning-invariant;
    # no-op whenever the scan already carries >= cores partitions
    return dedup._spread(base), dedup._spread(delta), t


def _ll100_kept_pred():
    kept = None
    for _, ok in _gopher_rules():
        kept = ok if kept is None else kept & ok
    return kept


def _ll100_build_state(
    spark: SparkSession, base: DataFrame, sf_dir: str,
    root: str | None = None,
) -> str:
    """DAY-0: run stages 1-4 on the base corpus ONCE and persist the
    five state artifacts a production pipeline would keep between
    daily batches — everything the day-N path needs, so no base TEXT
    is ever re-read:

      fps      — distinct normalized-md5 fingerprints of base d1
                 (ss10's snapshot-set device; stage-2 probes it)
      sh/banded— the MinHash band index over base d2 (ll63's persisted
                 artifacts, hasher-stamped; stage-3 probes it)
      grams    — (g, nd) distinct-doc counts over base d3
                 (gram_doc_counts; additive across disjoint corpora,
                 stage-4 merges them with the delta's own)
      docs     — (doc_id, n_kept) of every base d3 survivor (packing
                 continuation + selection id list)
      feats    — DSIR per-(doc, bucket) counts of the base CLEANED
                 text (dsir_doc_features; model counts are additive,
                 and base docs re-score under the union-updated model
                 from these numbers alone)

    Index over d2 (not d3): from-scratch CC runs on d2's pair graph,
    so a delta doc must be able to collide with a base doc that base-
    side CC later dropped. Returns the state root path (``root``
    overrides the default location — ss21's stream-owned copy)."""
    from .relational_queries import sink_path

    if root is None:
        root = sink_path("ll100_state", sf_dir)
    s = _ll100_state_frames(base)
    # six independent single-directory writes over shared checkpointed
    # inputs — overlapped on driver threads (guide §2.6), so the day-0
    # persist costs ~max(artifact) instead of the sum
    write_frames(s, root)
    return root


def _ll100_state_frames(corpus: DataFrame) -> dict[str, DataFrame]:
    """The five state artifacts as DataFrames, built FROM SCRATCH over
    an arbitrary (doc_id, text, lang) corpus — `_ll100_build_state`
    writes these for the base day, and the state-update equality test
    builds them over the union corpus as the ground truth that
    `ll100_updated_state_frames`'s O(delta) merge must reproduce."""
    from ..operators import graph
    from ..operators.importance import dsir_doc_features

    # _spread before the day-0 text stages (guide §2.6, r14 — the
    # day-N twin above): the Gopher regex + fingerprint passes
    # otherwise run on the scan's 1-10 partitions
    corpus = dedup._spread(corpus)
    d1 = corpus.join(
        _gopher_signal_frame(corpus)
        .where(_ll100_kept_pred())
        .select("doc_id"),
        "doc_id",
    )
    d1 = d1.withColumn("fp", T.text_fingerprint(F.col("text")))
    d2 = (
        d1.withColumn("kp", F.min("doc_id").over(W.partitionBy("fp")))
        .where(F.col("doc_id") == F.col("kp"))
        .select("doc_id", "text", "lang")
        # consumers: band index + pair tier + survivor anti-join
        .localCheckpoint(eager=True)
    )
    sh, banded = dedup.build_minhash_index(d2, "doc_id", "text", k=3)
    pairs = dedup.minhash_lsh_pairs(
        d2, "doc_id", "text", k=3, threshold=0.4, max_shingle_df=None
    )
    dropped = (
        graph.connected_components(pairs, src="doc_a", dst="doc_b")
        .where(F.col("vertex") != F.col("component"))
        .select(F.col("vertex").alias("doc_id"))
    )
    d3 = d2.join(dropped, "doc_id", "left_anti").localCheckpoint(eager=True)
    ex = dedup.excise_repeated_spans(
        d3, "doc_id", "text", min_len=8, min_docs=2, emit="text"
    )
    cleaned = (
        d3.select("doc_id", "lang")
        .join(ex, "doc_id", "left")
        .select(
            "doc_id",
            "lang",
            F.coalesce(F.col("n_tokens") - F.col("n_removed"), F.lit(0))
            .cast("bigint")
            .alias("n_kept"),
            F.coalesce("cleaned_text", F.lit("")).alias("ctext"),
        )
        # two consumers (the docs artifact + the DSIR feature pass,
        # i.e. two independent write actions in _ll100_build_state) —
        # without this boundary the whole excision chain re-runs per
        # consumer (guide §1.2: don't compute things twice; r14)
        .localCheckpoint(eager=True)
    )
    feats = dsir_doc_features(
        cleaned.select("doc_id", F.col("ctext").alias("text"), "lang"),
        target=F.col("lang") == "en",
    )
    return {
        # fps from the CHECKPOINTED d2, not d1 (guide §1.2, r14): d2
        # keeps exactly one doc per fingerprint, so fingerprint(d2.text)
        # IS d1.fp's distinct set — row-identical with no re-run of the
        # gopher gate + fingerprint pass over the corpus and no distinct
        # shuffle (the same equivalence _ll100_fold_delta_frames already
        # relies on for the day-N fold).
        "fps": d2.select(T.text_fingerprint(F.col("text")).alias("fp")),
        "sh": sh,
        "banded": banded,
        "grams": dedup.gram_doc_counts(d3, "doc_id", "text", min_len=8),
        "docs": cleaned.select("doc_id", "n_kept"),
        "feats": feats,
    }


def _ll100_day_n(
    spark: SparkSession, sf_dir: str, root: str | None = None
) -> dict:
    """Build the day-0 state (unless a prebuilt ``root`` is passed —
    the bench decomposition's lever), run the day-N incremental pass,
    and return every boundary frame — ``out`` (the registered query's
    result) plus the delta-side artifacts (``new_fps``, ``d2``, ``d3``,
    ``cleaned``, ``feats_d``) that ``ll100_updated_state_frames``
    folds into the persisted state for day N+1. See
    ``ll100_incremental_curation`` for the full stage-by-stage
    narration."""
    base, delta, t = _ll100_fixture(spark, sf_dir)
    if root is None:
        root = _ll100_build_state(spark, base, sf_dir)
    fr = _ll100_day_n_over(spark, delta, root, t)
    fr["t"] = t
    fr["root"] = root
    return fr


def _ll100_state_reads(
    spark: SparkSession, root: str | list[str]
) -> dict[str, DataFrame]:
    """Read the six state artifacts from a single state root OR a
    LIST of roots (day-0 root + one O(delta) fold root per absorbed
    batch — the VERDICT r10 item 2 write path). Multi-root semantics
    per frame:

      fps/sh/banded/docs/feats — plain multi-file reads: each fold
        root holds only that batch's rows, disjoint from every prior
        root by construction (fps because stage 2 anti-joined the
        state before the fold kept d2's fingerprints; the doc-keyed
        frames because doc ids are monotone), so the bag union of the
        parquet directories IS the set union.
      grams — an APPEND-LOG of additive (g, nd) partial counts (each
        fold root carries the delta's own distinct-doc counts);
        aggregated to one row per gram at read. Single-root states
        skip the aggregation — the artifact is already one row per
        gram, and ll100's registered plan stays byte-identical.

    The pre-aggregation shuffles on ``g``, the same key the consumer
    (excise_repeated_spans' snapshot join) hashes on — Catalyst reuses
    the exchange, so the log costs one partial-agg pass, not an extra
    corpus shuffle. Periodic ``_ll100_compact_state`` bounds the log
    length."""
    roots = [root] if isinstance(root, str) else list(root)

    # Explicit reader schemas for the schema-stable artifacts (r14,
    # guide §1.2): each bare read.parquet otherwise runs a one-task
    # footer-inference job — 6 driver-synchronized jobs per day-N pass
    # (per BATCH in the ss21 fold) to rediscover contracts the writers
    # pin (fps = text_fingerprint; grams = gram_doc_counts; docs/feats
    # = the cleaned/dsir_doc_features projections; equality tests pin
    # all four against from-scratch rebuilds, and a drifted file fails
    # loudly at scan time — parquet refuses a mismatched column type).
    # sh/banded stay INFERRED on purpose: their column METADATA carries
    # the minhash hasher stamp the probe's _require_index_hasher guard
    # validates — a hardcoded schema would forge that tag.
    _SCHEMAS = {
        "fps": "fp string",
        "grams": "g bigint, nd bigint",
        "docs": "doc_id bigint, n_kept bigint",
        "feats": "doc_id bigint, is_target boolean, b bigint, c bigint",
    }

    def rd(name: str) -> DataFrame:
        reader = spark.read
        if name in _SCHEMAS:
            reader = reader.schema(_SCHEMAS[name])
        return reader.parquet(*[f"{r}/{name}.parquet" for r in roots])

    grams = rd("grams")
    if len(roots) > 1:
        grams = grams.groupBy("g").agg(
            F.sum("nd").cast("bigint").alias("nd")
        )
    return {
        "fps": rd("fps"),
        "sh": rd("sh"),
        "banded": rd("banded"),
        "grams": grams,
        "docs": rd("docs"),
        "feats": rd("feats"),
    }


def _ll100_day_n_over(
    spark: SparkSession,
    delta: DataFrame,
    root: str | list[str],
    state_max_id: int,
) -> dict:
    """The day-N incremental pass over an ARBITRARY delta batch against
    the state at ``root`` (a single day-0 root or the multi-root list
    of an O(delta)-folded state — ``_ll100_state_reads``) — factored
    out of ``_ll100_day_n`` so the streaming twin (ss21) can run one
    micro-batch at a time through the identical code path.
    ``state_max_id`` is the largest doc id the state has absorbed (the
    fixture's ``t`` on day N=1; the previous batch's max thereafter) —
    the monotone-ids invariant makes ``doc_b <= state_max_id`` the
    state-vs-batch split for the CC sentencing and the packing
    continuation."""
    from ..operators import graph
    from ..operators.importance import (
        dsir_doc_features,
        dsir_logweights_from_features,
    )
    from ..operators.relational import exclusive_prefix_sum

    t = state_max_id

    # _spread the batch ONCE before stage 1 (guide §2.6 idle capacity,
    # r14): the delta arrives on the scan's (or the stream feed's) 1-10
    # partitions, serializing the Gopher regex + fingerprint passes
    # onto a fraction of the cores; round-robin to defaultParallelism
    # is a no-op at cluster scale and every downstream consumer is
    # key-based, so emitted rows are partitioning-invariant
    delta = dedup._spread(delta)

    # ---- day-N: delta text + state parquet only from here on ----
    st = _ll100_state_reads(spark, root)
    fps = st["fps"]
    sh_s = st["sh"]
    banded_s = st["banded"]
    gcounts = st["grams"]
    base_docs = st["docs"]
    feats_b = st["feats"]

    # stage 1: rule gate on the batch
    d1 = delta.join(
        _gopher_signal_frame(delta).where(_ll100_kept_pred()).select("doc_id"),
        "doc_id",
    ).withColumn("fp", T.text_fingerprint(F.col("text")))
    # stage 2: snapshot anti-join, then min-id keeper within the batch
    d2 = (
        d1.join(fps, "fp", "left_anti")
        .withColumn("kp", F.min("doc_id").over(W.partitionBy("fp")))
        .where(F.col("doc_id") == F.col("kp"))
        .select("doc_id", "text", "lang")
        # consumers: the index probe + the survivor anti-join
        .localCheckpoint(eager=True)
    )
    # stage 3: probe the persisted index; CC over the delta-delta
    # subgraph; any base neighbor (doc_b <= t — the fixture's monotone
    # id invariant) contaminates its whole delta component
    pairs = dedup.minhash_incremental_pairs(
        None, d2, "doc_id", "text", k=3, threshold=0.4,
        snapshot_index=(sh_s, banded_s),
    ).localCheckpoint(eager=True)
    b_hit = (
        pairs.where(F.col("doc_b") <= t)
        .select(F.col("doc_a").alias("doc_id"))
        .distinct()
    )
    dd = pairs.where(F.col("doc_b") > t).select("doc_a", "doc_b")
    cc = graph.connected_components(dd, src="doc_a", dst="doc_b")
    contaminated = (
        cc.join(b_hit.select(F.col("doc_id").alias("vertex")), "vertex")
        .select("component")
        .distinct()
    )
    dropped = (
        b_hit.unionAll(
            cc.join(contaminated, "component", "left_semi").select(
                F.col("vertex").alias("doc_id")
            )
        )
        .unionAll(
            cc.where(F.col("vertex") != F.col("component")).select(
                F.col("vertex").alias("doc_id")
            )
        )
        .distinct()
    )
    # d3 feeds the excision gram pass, the kept-token side, the narrow
    # count, the cleaned projection, and (in the ss21 fold) the delta
    # gram artifact — 4+ consumers that would each re-run the
    # dropped-anti-join over the CC output (guide §1.2, r14)
    d3 = d2.join(dropped, "doc_id", "left_anti").localCheckpoint(eager=True)
    # stage 4: excision against merged gram counts
    ex = dedup.excise_repeated_spans(
        d3, "doc_id", "text", min_len=8, min_docs=2, emit="text",
        snapshot_gram_counts=gcounts,
    )
    cleaned = (
        d3.select("doc_id", "lang")
        .join(ex, "doc_id", "left")
        .select(
            "doc_id",
            "lang",
            F.coalesce(F.col("n_tokens") - F.col("n_removed"), F.lit(0))
            .cast("bigint")
            .alias("n_kept"),
            F.coalesce("cleaned_text", F.lit("")).alias("ctext"),
        )
        # consumers: delta features + the packing token counts
        .localCheckpoint(eager=True)
    )
    # stage 5: union model from additive feature counts; score base
    # (persisted features) and delta (fresh) under it
    feats_d = dsir_doc_features(
        cleaned.select("doc_id", F.col("ctext").alias("text"), "lang"),
        target=F.col("lang") == "en",
    )
    db_all = feats_b.unionByName(feats_d).localCheckpoint(eager=True)
    ids_all = base_docs.select("doc_id").unionAll(cleaned.select("doc_id"))
    w_all = dsir_logweights_from_features(ids_all, db_all)
    mx = w_all.agg(F.max("log_weight").alias("m"))
    sel = w_all.crossJoin(F.broadcast(mx)).select(
        "doc_id",
        "log_weight",
        F.floor(
            F.least(F.lit(1.0), F.exp(F.col("log_weight") - F.col("m")))
            * F.lit(1000000.0)
        ).alias("thr"),
    )
    coin = dedup.portable_hash40(
        F.concat(F.lit("cpl#"), F.col("doc_id").cast("string"))
    )
    d5 = sel.where(coin % F.lit(1000000) < F.col("thr").cast("bigint")).select(
        "doc_id", "log_weight"
    )
    # stage 6: offsets continue from the selected-base token total
    nk_all = base_docs.select(
        "doc_id", F.col("n_kept").alias("n_tokens")
    ).unionAll(cleaned.select("doc_id", F.col("n_kept").alias("n_tokens")))
    toks = d5.join(nk_all, "doc_id").localCheckpoint(eager=True)
    base_total = toks.where(F.col("doc_id") <= t).agg(
        F.coalesce(F.sum("n_tokens"), F.lit(0)).cast("bigint").alias("bt")
    )
    packed = exclusive_prefix_sum(
        toks.where(F.col("doc_id") > t), "doc_id", "n_tokens"
    )
    out = packed.crossJoin(F.broadcast(base_total)).select(
        "doc_id",
        F.col("n_tokens").cast("bigint").alias("n_tokens"),
        F.col("log_weight").cast("double").alias("log_weight"),
        F.expr(f"(bt + cum) DIV {_LL94_PACK}").cast("bigint").alias("pack_id"),
        ((F.col("bt") + F.col("cum")) % _LL94_PACK)
        .cast("bigint")
        .alias("pack_offset"),
    )
    return {
        "out": out,
        "t": t,
        "root": root,
        # the batch's NEW fingerprints, from the checkpointed d2
        # (guide §1.2, r14): stage 2 anti-joined the state and kept one
        # doc per fp, so fingerprint(d2.text) == d1.fp \ state_fps —
        # state ∪ this set == state ∪ d1_fps, the merged-fold identity
        # _ll100_fold_delta_frames already documents
        "new_fps": d2.select(T.text_fingerprint(F.col("text")).alias("fp")),
        "d2": d2,
        "d3": d3,
        "cleaned": cleaned,
        "feats_d": feats_d,
    }


@query("ll100_incremental_curation", oracle=_LL100_ORACLE)
def ll100_incremental_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INCREMENTAL curation — the form a real 100 TB pipeline runs
    daily (VERDICT r8 item 6; the reference analog is re-running
    PipeLine.scala:7-42 per new definition file): the day-N delta
    flows through ll94's six stages against PERSISTED day-0 state, and
    the verdicts — which delta docs survive, their scores, their
    (pack_id, pack_offset) slots continuing the base packing — are
    pinned EQUAL to a from-scratch ll94 over the union corpus (the
    oracle IS that from-scratch chain filtered to the delta; ll45/ll63
    pin this equality for dedup alone, this pins it for the whole
    pipeline). Stage 3 runs at the no-cutoff grain on both sides
    (ll63's pure-per-document-artifact property).

    Day-N dataflow, stage by stage (state reads are parquet; no base
    text is touched):
      1. Gopher gate on the delta (per-doc, trivially incremental).
      2. Exact dedup: anti-join the fingerprint snapshot, then min-id
         keeper within the batch.
      3. Near dedup: probe the persisted band index
         (minhash_incremental_pairs — snapshot x snapshot candidates
         never generated), then connected components over the
         DELTA-DELTA subgraph only: any base neighbor sentences a
         delta doc (base ids < delta ids, so it can never be its
         component's min), and that sentence propagates through the
         delta component — verdict-equivalent to full-graph CC
         without rebuilding base components.
      4. ExactSubstr excision with the persisted gram counts merged
         into the delta's own (disjoint doc sets make distinct-doc
         counts additive — exactly the union's shared-gram set).
      5. DSIR: union model = persisted base feature counts + delta
         feature counts (additive); base docs RE-SCORE under the
         updated model from their persisted features (a bucket join
         over numbers — no text), delta docs score fresh; the
         max-normalizer and ll89's hash coin run over the union
         scores, exactly as from-scratch.
      6. Packing continuation: delta offsets = total selected base
         tokens (from persisted n_kept) + the within-delta exclusive
         prefix sum.

    Per-day cost: every TEXT stage (tokenize, minhash, grams, hashed
    bigrams) runs on the delta alone — O(delta). The one non-O(delta)
    step is stage 5's re-score of persisted base features under the
    updated model: a numeric bucket-join over the feature snapshot
    (256-bucket ratio broadcast, doc-keyed partial agg), no
    tokenization, no pair joins — the price of exact from-scratch
    equality when the model itself moves with the delta (freeze the
    model and it disappears). Fixture preconditions (delta ids > base
    ids; no delta doc bridges two base CC components; no base gram
    crosses min_docs only via the delta) are what make retroactive
    base changes impossible — each is a documented production
    invariant (monotone ids; re-curate on bridge detection).

    After emitting the batch, ``ll100_updated_state_frames`` folds the
    delta's artifacts into the state for day N+1 — pinned equal to
    rebuilding the state from scratch over the union (tests).

    Returns (doc_id, n_tokens, log_weight, pack_id, pack_offset) for
    every SELECTED delta doc."""
    return _ll100_day_n(spark, sf_dir)["out"]


def ll100_updated_state_frames(
    spark: SparkSession, sf_dir: str
) -> dict[str, DataFrame]:
    """DAY N+1 READINESS — the O(delta) state UPDATE a daily pipeline
    runs after emitting the batch: fold the day-N delta's freshly
    computed artifacts into the persisted day-0 state. Every merge is
    a union or an additive count sum — no snapshot text is touched:

      fps    ∪ the delta d1 fingerprints (set union)
      sh/banded ∪ the delta d2's index artifacts (pure per-document
               functions, ll63's property — union IS a rebuild)
      grams  + the delta d3 gram counts (distinct-doc counts over
               disjoint id sets are additive; full-outer sum)
      docs   ∪ the delta survivors' (doc_id, n_kept)
      feats  ∪ the delta's DSIR feature counts

    Equality contract (pinned in tests/test_llm_ops.py): every merged
    artifact equals ``_ll100_state_frames`` built FROM SCRATCH over
    the union corpus — so the state never degrades across days; day
    N+1 probes state indistinguishable from a full rebuild."""
    fr = _ll100_day_n(spark, sf_dir)
    return _ll100_fold_state(spark, fr["root"], fr)


def _ll100_fold_state(
    spark: SparkSession, root: str | list[str], fr: dict
) -> dict[str, DataFrame]:
    """The O(delta) merge as MERGED FRAMES, over the day-N boundary
    frames ``fr`` and the state at ``root`` — the fully-materialized
    view ``ll100_updated_state_frames`` pins equal to a from-scratch
    rebuild. NOTE the write-amplification caveat (VERDICT r10 item 2):
    persisting THESE frames rewrites the whole state —
    ``_ll100_fold_delta_frames`` is the O(delta)-WRITE path a daily
    pipeline uses; this merged view remains for the equality contract
    and for ``_ll100_compact_state``."""
    st = _ll100_state_reads(spark, root)
    sh_d, banded_d = dedup.build_minhash_index(
        fr["d2"], "doc_id", "text", k=3
    )
    grams_d = dedup.gram_doc_counts(fr["d3"], "doc_id", "text", min_len=8)
    merged_grams = (
        st["grams"]
        .select("g", F.col("nd").alias("nd_base"))
        .join(
            grams_d.select("g", F.col("nd").alias("nd_delta")),
            "g",
            "full_outer",
        )
        .select(
            "g",
            (
                F.coalesce("nd_base", F.lit(0))
                + F.coalesce("nd_delta", F.lit(0))
            )
            .cast("bigint")
            .alias("nd"),
        )
    )
    return {
        "fps": st["fps"].unionAll(fr["new_fps"]).distinct(),
        "sh": st["sh"].unionByName(sh_d),
        "banded": st["banded"].unionByName(banded_d),
        "grams": merged_grams,
        "docs": st["docs"].unionAll(
            fr["cleaned"].select("doc_id", "n_kept")
        ),
        "feats": st["feats"].unionByName(fr["feats_d"]),
    }


def _ll100_fold_delta_frames(fr: dict) -> dict[str, DataFrame]:
    """The O(delta)-WRITE state fold (VERDICT r10 item 2): the six
    artifacts' DELTA INCREMENTS only, each derived from the day-N
    boundary frames alone — a daily pipeline writes these as a new
    fold root next to the existing state (``_ll100_state_reads`` reads
    the union), so bytes written per day scale with the delta, never
    with the accumulated corpus (persisting ``_ll100_fold_state``'s
    merged frames rewrites ~100 TB of state per day at scale; this
    writes the day's few GB):

      fps    — d2's fingerprints: exactly the NEW set (stage 2 already
               anti-joined the state and kept one doc per fp, so
               d1_fps \\ state_fps == fps(d2) — union stays a set with
               no distinct pass and no extra state probe)
      sh/banded — the delta d2's index artifacts (pure per-document,
               disjoint doc ids)
      grams  — the delta d3's own distinct-doc counts, appended as
               additive log rows (aggregated at read)
      docs/feats — the delta survivors' rows (disjoint doc ids)

    Equality with a from-scratch union rebuild is pinned in
    tests/test_llm_ops.py (the multi-root read vs
    ``_ll100_state_frames`` over the union), alongside the
    bytes-scale-with-delta assertion."""
    sh_d, banded_d = dedup.build_minhash_index(
        fr["d2"], "doc_id", "text", k=3
    )
    return {
        "fps": fr["d2"].select(
            T.text_fingerprint(F.col("text")).alias("fp")
        ),
        "sh": sh_d,
        "banded": banded_d,
        "grams": dedup.gram_doc_counts(fr["d3"], "doc_id", "text", min_len=8),
        "docs": fr["cleaned"].select("doc_id", "n_kept"),
        "feats": fr["feats_d"],
    }


def _ll100_compact_state(
    spark: SparkSession, root: str | list[str], new_root: str
) -> str:
    """Periodic COMPACTION of an O(delta)-folded multi-root state:
    materialize the current state view (gram log aggregated, unions
    flattened) into a single fresh root and return it. Bounds the
    fold-root list length and the gram log; after the write commits,
    the superseded roots are dead and the caller deletes them — the
    retention/GC rule for fold roots (VERDICT r10 item 2). Writes to a
    NEW root, never in place, so no plan ever reads a directory being
    overwritten (the ss21 versioned-write discipline)."""
    st = _ll100_state_reads(spark, root)
    write_frames(st, new_root)  # guide §2.6: overlapped independent writes
    return new_root


# ---------------------------------------------------------------------------
# ll104 — bridge detector: ll100's "re-curate on bridge detection"
# production invariant gets its detector (VERDICT r9 item 3)
# ---------------------------------------------------------------------------

# Shared by ll104 (detector) and ll109 (re-curation): base-only
# component labels + the delta->base cross rows, derived from the
# union chain's `pairs` CTE.
_LL104_CTES = (
    # base-only component labels: the union chain's `pairs` CTE
    # restricted to base-base rows (doc_a < doc_b <= t; base ids are
    # all <= t < every delta id — the fixture's monotone invariant),
    # closed with the same recursive min-label device as CC_ORACLE.
    # Cross rows (doc_a <= t < doc_b) ARE the incremental probe's
    # delta->base pair list (the ll45/ll100-pinned equality).
    ", bb AS (SELECT doc_a, doc_b FROM pairs, tsel WHERE doc_b <= t),"
    " bsym AS (SELECT doc_a AS src, doc_b AS dst FROM bb"
    "   UNION SELECT doc_b, doc_a FROM bb),"
    " bnodes AS (SELECT DISTINCT src AS v FROM bsym),"
    " breach(v, lbl) AS ("
    "   SELECT v, v FROM bnodes"
    "   UNION"
    "   SELECT s.dst, r.lbl FROM breach r JOIN bsym s ON s.src = r.v),"
    " blab AS (SELECT v, min(lbl) AS component FROM breach GROUP BY v),"
    " cross0 AS (SELECT doc_b AS doc_id, doc_a AS base_id"
    "   FROM pairs, tsel WHERE doc_a <= t AND doc_b > t)"
)

_LL104_ORACLE = _ll94_ctes(_ll100_aug_ctes(), minhash_cutoff=False) + (
    _LL104_CTES
    + " SELECT doc_id,"
    " CAST(count(DISTINCT coalesce(l.component, c.base_id)) AS BIGINT)"
    "  AS n_base_components,"
    " count(DISTINCT coalesce(l.component, c.base_id)) >= 2 AS is_bridge"
    " FROM cross0 c LEFT JOIN blab l ON l.v = c.base_id"
    " GROUP BY doc_id"
)


@query("ll104_component_bridges", oracle=_LL104_ORACLE)
def ll104_component_bridges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BRIDGE DETECTOR — ll100's documented production trigger
    ("re-curate on bridge detection") made operational (VERDICT r9
    item 3): for every day-N delta doc with base-side near-dup
    neighbors, count the DISTINCT day-0 base components those
    neighbors span. A count >= 2 means the delta doc would MERGE
    independently-frozen base components — the one condition under
    which the incremental path's verdicts diverge from from-scratch,
    so the correct action is re-curation of the touched slice, never
    an in-place state patch.

    Day-0 artifacts (same discipline as ll100's state build, one more
    persistable table): base stages 1-2, the MinHash band index, and
    the base pair graph's component labels. Day-N: delta stages 1-2,
    probe the index (minhash_incremental_pairs — snapshot×snapshot
    never generated), keep the delta→base rows, then ONE equi-join
    against the label table + a grouped count-distinct
    (operators/graph.component_bridges). On the ll100 fixture no doc
    bridges (every base neighbor set is one component — the invariant
    holds), so is_bridge is all-false while n_base_components carries
    real per-doc values; a planted two-component bridge fixture in
    tests/test_llm_ops.py proves the detector fires.

    Oracle: the from-scratch union chain's pair list, split into
    base-base rows (recursive min-label closure → base labels) and
    cross rows (= the incremental probe's output, the ll100-pinned
    equality), then the same join + count-distinct in SQL."""
    from ..operators import graph

    base, delta, t = _ll100_fixture(spark, sf_dir)
    b1 = base.join(
        _gopher_signal_frame(base).where(_ll100_kept_pred()).select("doc_id"),
        "doc_id",
    ).withColumn("fp", T.text_fingerprint(F.col("text")))
    b2 = (
        b1.withColumn("kp", F.min("doc_id").over(W.partitionBy("fp")))
        .where(F.col("doc_id") == F.col("kp"))
        .select("doc_id", "text", "lang")
        # consumers: band index + base pair graph (labels)
        .localCheckpoint(eager=True)
    )
    sh_s, banded_s = dedup.build_minhash_index(b2, "doc_id", "text", k=3)
    bpairs = dedup.minhash_lsh_pairs(
        b2, "doc_id", "text", k=3, threshold=0.4, max_shingle_df=None
    )
    blab = graph.connected_components(bpairs, src="doc_a", dst="doc_b")
    # day-N side: stages 1-2 on the delta, then the index probe
    d1 = delta.join(
        _gopher_signal_frame(delta).where(_ll100_kept_pred()).select("doc_id"),
        "doc_id",
    ).withColumn("fp", T.text_fingerprint(F.col("text")))
    d2 = (
        # base fps from the CHECKPOINTED b2, not b1 (guide §1.2, r14):
        # b2 keeps one doc per fingerprint, so fingerprint(b2.text) IS
        # b1.fp's distinct set — identical anti-join semantics with no
        # re-run of the base gopher gate + fingerprint pass
        d1.join(
            b2.select(T.text_fingerprint(F.col("text")).alias("fp")),
            "fp",
            "left_anti",
        )
        .withColumn("kp", F.min("doc_id").over(W.partitionBy("fp")))
        .where(F.col("doc_id") == F.col("kp"))
        .select("doc_id", "text", "lang")
    )
    pairs = dedup.minhash_incremental_pairs(
        None, d2, "doc_id", "text", k=3, threshold=0.4,
        snapshot_index=(sh_s, banded_s),
    )
    cross = pairs.where(F.col("doc_b") <= t).select(
        F.col("doc_a").alias("doc_id"), F.col("doc_b").alias("base_id")
    )
    return graph.component_bridges(cross, blab)


def ll104_components(spark: SparkSession, sf_dir: str) -> dict:
    """Bench decomposition of ll104 (the ss18/ll100/ll101 device): the
    headline row conflates the DAY-0 artifact build — base stages 1-2,
    the band index, the base pair graph + component labels, which a
    production pipeline persists once alongside ll100's state — with
    the recurring DAY-N detector probe (delta stages 1-2, the index
    probe, one label equi-join + grouped count-distinct). Times them
    separately; the recurring cost is the second number. Not a
    registered query (reports timings); bench.py records it next to
    ll104's headline row."""
    import time as _time

    from ..operators import graph

    base, delta, t = _ll100_fixture(spark, sf_dir)
    t0 = _time.perf_counter()
    b1 = base.join(
        _gopher_signal_frame(base).where(_ll100_kept_pred()).select("doc_id"),
        "doc_id",
    ).withColumn("fp", T.text_fingerprint(F.col("text")))
    b2 = (
        b1.withColumn("kp", F.min("doc_id").over(W.partitionBy("fp")))
        .where(F.col("doc_id") == F.col("kp"))
        .select("doc_id", "text", "lang")
        .localCheckpoint(eager=True)
    )
    sh_s, banded_s = dedup.build_minhash_index(b2, "doc_id", "text", k=3)
    sh_s = sh_s.localCheckpoint(eager=True)
    banded_s = banded_s.localCheckpoint(eager=True)
    bpairs = dedup.minhash_lsh_pairs(
        b2, "doc_id", "text", k=3, threshold=0.4, max_shingle_df=None
    )
    blab = graph.connected_components(
        bpairs, src="doc_a", dst="doc_b"
    ).localCheckpoint(eager=True)
    # fps from the checkpointed b2 (guide §1.2, r14 — see ll104)
    fps = b2.select(
        T.text_fingerprint(F.col("text")).alias("fp")
    ).localCheckpoint(eager=True)
    day0_build_s = _time.perf_counter() - t0

    t0 = _time.perf_counter()
    d1 = delta.join(
        _gopher_signal_frame(delta).where(_ll100_kept_pred()).select("doc_id"),
        "doc_id",
    ).withColumn("fp", T.text_fingerprint(F.col("text")))
    d2 = (
        d1.join(fps, "fp", "left_anti")
        .withColumn("kp", F.min("doc_id").over(W.partitionBy("fp")))
        .where(F.col("doc_id") == F.col("kp"))
        .select("doc_id", "text", "lang")
    )
    pairs = dedup.minhash_incremental_pairs(
        None, d2, "doc_id", "text", k=3, threshold=0.4,
        snapshot_index=(sh_s, banded_s),
    )
    cross = pairs.where(F.col("doc_b") <= t).select(
        F.col("doc_a").alias("doc_id"), F.col("doc_b").alias("base_id")
    )
    n_checked = graph.component_bridges(cross, blab).count()
    day_n_s = _time.perf_counter() - t0
    return {
        "day0_build_s": round(day0_build_s, 4),
        "day_n_s": round(day_n_s, 4),
        "delta_docs_with_base_neighbors": int(n_checked),
    }


# ---------------------------------------------------------------------------
# ll109 — bridge-triggered re-curation (the action half of ll104)
# ---------------------------------------------------------------------------

_LL109_ORACLE = _ll94_ctes(_ll100_aug_ctes(), minhash_cutoff=False) + (
    _LL104_CTES
    # delta-delta components (the ll100 day-N subgraph) ...
    + ", dd AS (SELECT doc_a, doc_b FROM pairs, tsel WHERE doc_a > t),"
    " ddsym AS (SELECT doc_a AS src, doc_b AS dst FROM dd"
    "   UNION SELECT doc_b, doc_a FROM dd),"
    " ddnodes AS (SELECT DISTINCT src AS v FROM ddsym),"
    " ddreach(v, lbl) AS ("
    "   SELECT v, v FROM ddnodes"
    "   UNION"
    "   SELECT s.dst, r.lbl FROM ddreach r JOIN ddsym s ON s.src = r.v),"
    " ddlab AS (SELECT v, min(lbl) AS component FROM ddreach GROUP BY v),"
    # ... the touched base components and the slice's edge set: base
    # edges inside touched components, every cross edge, and the
    # delta-delta edges of every linked delta component ...
    " touched AS (SELECT DISTINCT coalesce(l.component, c.base_id) AS comp"
    "   FROM cross0 c LEFT JOIN blab l ON l.v = c.base_id),"
    " linked AS (SELECT DISTINCT doc_id FROM cross0),"
    " sdd AS (SELECT DISTINCT component FROM ddlab"
    "   JOIN linked ON ddlab.v = linked.doc_id),"
    " sddv AS (SELECT v FROM ddlab"
    "   WHERE component IN (SELECT component FROM sdd)),"
    " bedge AS (SELECT b.doc_a AS src, b.doc_b AS dst FROM bb b"
    "   JOIN blab l ON l.v = b.doc_a"
    "   WHERE l.component IN (SELECT comp FROM touched)),"
    " xedge AS (SELECT base_id AS src, doc_id AS dst FROM cross0),"
    " dedge AS (SELECT doc_a AS src, doc_b AS dst FROM dd"
    "   WHERE doc_a IN (SELECT v FROM sddv)),"
    # ... the merged (re-curated) components over the closed slice ...
    " medge AS (SELECT src, dst FROM bedge UNION SELECT src, dst FROM xedge"
    "   UNION SELECT src, dst FROM dedge),"
    " msym AS (SELECT src, dst FROM medge UNION SELECT dst, src FROM medge),"
    " mnodes AS (SELECT DISTINCT src AS v FROM msym),"
    " mreach(v, lbl) AS ("
    "   SELECT v, v FROM mnodes"
    "   UNION"
    "   SELECT s.dst, r.lbl FROM mreach r JOIN msym s ON s.src = r.v),"
    " mlab AS (SELECT v, min(lbl) AS mcomp FROM mreach GROUP BY v),"
    # ... and the audit rows: every touched base doc (labeled members
    # + cross-edge singletons), day-0 vs re-curated labels/verdicts
    " tdocs AS (SELECT v AS doc_id, component AS comp0 FROM blab"
    "   WHERE component IN (SELECT comp FROM touched)"
    "  UNION SELECT DISTINCT base_id, base_id FROM cross0 c"
    "   WHERE NOT EXISTS (SELECT 1 FROM blab l WHERE l.v = c.base_id))"
    " SELECT td.doc_id, CAST(td.comp0 AS BIGINT) AS component_day0,"
    "  CAST(m.mcomp AS BIGINT) AS component_recurated,"
    "  td.doc_id = td.comp0 AS kept_day0,"
    "  td.doc_id = m.mcomp AS kept_recurated"
    " FROM tdocs td JOIN mlab m ON m.v = td.doc_id"
)


@query("ll109_bridge_recuration", oracle=_LL109_ORACLE)
def ll109_bridge_recuration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BRIDGE-TRIGGERED RE-CURATION (VERDICT r10 item 7): the action
    half of ll104's detect→escalate loop. ll100's incremental path
    freezes base verdicts, which is exact until a delta doc BRIDGES
    two independently-sentenced base components — from-scratch over
    the union would then keep only one of the two day-0 keepers. The
    documented repair is scoped re-curation, never an in-place patch:
    rerun connected components from scratch over every TOUCHED base
    component's slice of the union graph (base edges inside touched
    components + all delta→base cross edges + the delta-delta edges of
    every linked delta component — closed under union connectivity, so
    the scoped labels EQUAL full from-scratch union labels on every
    emitted doc; `operators/graph.recurate_bridged_components`
    docstring carries the closure argument) and emit the corrected
    verdicts per touched base doc: (component_day0,
    component_recurated, kept_day0, kept_recurated).

    On this corpus no delta doc bridges (ll104's all-false is_bridge
    column — the ll100 fixture invariant), so every row re-curates to
    itself — real per-doc values, value-checked; the planted-bridge
    pytest (tests/test_llm_ops.py) shows the divergence case: plain
    incremental keeps both day-0 keepers while incremental +
    re-curation equals from-scratch, which demotes one.

    Day-N cost: keyed equi-joins over the already-bounded pair lists
    + one CC loop over the touched slice — O(touched + delta), never
    O(base); the day-0 artifacts (band index, base pair list, labels)
    are the same persistables as ll104's. Oracle: ll104's base-label
    CTEs extended with the delta-delta closure, the slice edge set,
    and the merged-label recursion — the whole re-curation is
    value-checked in composition."""
    from ..operators import graph

    base, delta, t = _ll100_fixture(spark, sf_dir)
    # day-0 artifacts (ll104's): stages 1-2, band index, pair list,
    # component labels
    b1 = base.join(
        _gopher_signal_frame(base).where(_ll100_kept_pred()).select("doc_id"),
        "doc_id",
    ).withColumn("fp", T.text_fingerprint(F.col("text")))
    b2 = (
        b1.withColumn("kp", F.min("doc_id").over(W.partitionBy("fp")))
        .where(F.col("doc_id") == F.col("kp"))
        .select("doc_id", "text", "lang")
        .localCheckpoint(eager=True)
    )
    sh_s, banded_s = dedup.build_minhash_index(b2, "doc_id", "text", k=3)
    bpairs = dedup.minhash_lsh_pairs(
        b2, "doc_id", "text", k=3, threshold=0.4, max_shingle_df=None
    )
    blab = graph.connected_components(bpairs, src="doc_a", dst="doc_b")
    # day-N: delta stages 1-2, one index probe shared by the cross and
    # delta-delta splits
    d1 = delta.join(
        _gopher_signal_frame(delta).where(_ll100_kept_pred()).select("doc_id"),
        "doc_id",
    ).withColumn("fp", T.text_fingerprint(F.col("text")))
    d2 = (
        # same fps-from-b2 device as ll104 (guide §1.2, r14)
        d1.join(
            b2.select(T.text_fingerprint(F.col("text")).alias("fp")),
            "fp",
            "left_anti",
        )
        .withColumn("kp", F.min("doc_id").over(W.partitionBy("fp")))
        .where(F.col("doc_id") == F.col("kp"))
        .select("doc_id", "text", "lang")
    )
    pairs = dedup.minhash_incremental_pairs(
        None, d2, "doc_id", "text", k=3, threshold=0.4,
        snapshot_index=(sh_s, banded_s),
    ).localCheckpoint(eager=True)
    cross = pairs.where(F.col("doc_b") <= t).select(
        F.col("doc_a").alias("doc_id"), F.col("doc_b").alias("base_id")
    )
    dd = pairs.where(F.col("doc_b") > t).select("doc_a", "doc_b")
    return graph.recurate_bridged_components(bpairs, blab, cross, dd)


# ---------------------------------------------------------------------------
# ll102 — exact integer average-pool image resize (multimodal preprocessing)
# ---------------------------------------------------------------------------

_LL102_ORACLE = (
    # the ll90 raster-reconstruction device (48 md5-derived bytes per
    # 4x4 RGB fixture image), pooled 4x4 -> 2x2 per channel with the
    # operator's exact integer floor-average: output pos p decomposes
    # as cell = p//3 (r = cell//2, c = cell%2), ch = p%3; the four
    # source bytes sit at ((2r+dr)*4 + (2c+dc))*3 + ch
    "WITH base AS (SELECT doc_id,"
    " md5(text) || md5(text || 'a') || md5(text || 'b') AS h"
    " FROM documents),"
    " bytes0 AS (SELECT doc_id, list_transform(range(0, 48),"
    "  k -> CAST(('0x' || substr(h, 2 * k + 1, 2)) AS BIGINT)) AS b"
    "  FROM base)"
    " SELECT doc_id, CAST(p AS INT) AS pos,"
    " CAST((b[(p//3)//2*24 + (p//3)%2*6 + p%3 + 1]"
    "     + b[(p//3)//2*24 + (p//3)%2*6 + p%3 + 4]"
    "     + b[(p//3)//2*24 + (p//3)%2*6 + p%3 + 13]"
    "     + b[(p//3)//2*24 + (p//3)%2*6 + p%3 + 16]) // 4 AS INT)"
    "  AS value"
    " FROM bytes0, (SELECT unnest(range(0, 12)) AS p) ps"
)


@query("ll102_image_resize_pooled", oracle=_LL102_ORACLE)
def ll102_image_resize_pooled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal RESIZE — the downsampling step of an image
    preprocessing pipeline (thumbnail before feature extraction /
    perceptual hashing), run through the REAL decode path: every
    corpus image (the md5-derived 4×4 PPM payloads) is decoded in an
    Arrow-batched mapInPandas and average-pooled to 2×2 RGB with
    EXACT integer arithmetic (floor of the per-channel block mean),
    emitted in the scalar long form (doc_id, pos, value). The oracle
    reconstructs the raster bytes from the same md5 hex (ll90's
    device) and replays the pooling arithmetic byte for byte, so the
    decode → pool path is value-checked — the family completion the
    brief names alongside decode (ll10), feature-extract (ll41/ll44),
    and frame-sample (ll44): dedup-oriented hashing (ll90) and
    training-oriented resizing now share one pooling kernel
    (operators/multimodal.image_resize_pooled, image_ahash's exact
    8×8 grid generalized to arbitrary dims, per channel).

    Scale: heavy bytes cross the Python boundary once per image;
    3·out_w·out_h small ints come back — narrow, no shuffle, the
    mapInPandas batch shape every multimodal op here uses."""
    docs = load(spark, sf_dir, "documents")
    payloads = multimodal.attach_image_payload(docs, "doc_id", "text")
    return multimodal.image_resize_pooled(payloads, out_w=2, out_h=2)


def ll100_components(spark: SparkSession, sf_dir: str) -> dict:
    """Bench decomposition of ll100's headline row (the ss18_components
    device): the headline times day-0 state build + day-N probe
    TOGETHER, which hides the claim that matters at 100 TB — the
    recurring cost is the day-N side alone. Times the two phases
    separately (one run each, warm session): ``day0_build_s`` = stages
    1-4 over the base + the five parquet state writes (paid once per
    snapshot), ``day_n_s`` = the delta pass against the prebuilt state
    (paid per batch). Returns {day0_build_s, day_n_s, delta_rows}."""
    import time as _time

    base, _delta, _t = _ll100_fixture(spark, sf_dir)
    t0 = _time.perf_counter()
    root = _ll100_build_state(spark, base, sf_dir)
    day0 = _time.perf_counter() - t0
    t0 = _time.perf_counter()
    n = _ll100_day_n(spark, sf_dir, root=root)["out"].count()
    day_n = _time.perf_counter() - t0
    return {
        "day0_build_s": round(day0, 4),
        "day_n_s": round(day_n, 4),
        "delta_rows": int(n),
    }


# ---------------------------------------------------------------------------
# ll103 — MULTIMODAL dedup gate (text fingerprint x image perceptual hash)
# ---------------------------------------------------------------------------

_LL103_ORACLE = (
    # three variants per doc: A = original; B (+1e6) = EDITED text with
    # a re-encoded (jittered) image of the ORIGINAL — only the image
    # tier can catch it; C (+2e6) = exact text copy with a DIFFERENT
    # image — only the text tier can. Text keeper = ll4's normalized
    # fingerprint min-id; image keeper = ll90's md5-raster aHash min-id.
    "WITH docs3 AS ("
    " SELECT doc_id, text FROM documents"
    " UNION ALL SELECT doc_id + 1000000, text || ' variant edit'"
    "  FROM documents"
    " UNION ALL SELECT doc_id + 2000000, text FROM documents),"
    " fp AS (SELECT doc_id,"
    "  md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS f"
    "  FROM docs3),"
    " tk AS (SELECT doc_id, min(doc_id) OVER (PARTITION BY f) AS tk"
    "  FROM fp),"
    " himg AS ("
    " SELECT doc_id, md5(text) || md5(text || 'a') || md5(text || 'b')"
    "  AS h, FALSE AS jit FROM documents"
    " UNION ALL SELECT doc_id + 1000000,"
    "  md5(text) || md5(text || 'a') || md5(text || 'b'), TRUE"
    "  FROM documents"
    " UNION ALL SELECT doc_id + 2000000,"
    "  md5(text || ' x') || md5(text || ' xa') || md5(text || ' xb'),"
    "  FALSE FROM documents),"
    " bytes0 AS (SELECT doc_id, jit, list_transform(range(0, 48),"
    "  k -> CAST(('0x' || substr(h, 2 * k + 1, 2)) AS BIGINT)) AS b0"
    "  FROM himg),"
    " bytes1 AS (SELECT doc_id, CASE WHEN jit THEN"
    "  list_append(b0[1:47], (b0[48] + 1) % 256) ELSE b0 END AS b"
    "  FROM bytes0),"
    " grays AS (SELECT doc_id, list_transform(range(0, 16),"
    "  i -> b[3 * i + 1] + b[3 * i + 2] + b[3 * i + 3]) AS g"
    "  FROM bytes1),"
    " hashed AS (SELECT doc_id, list_sum(list_transform(range(0, 16),"
    "  i -> CASE WHEN g[i + 1] * 16 >= list_sum(g)"
    "  THEN (1::BIGINT << i) ELSE 0 END)) AS ahash FROM grays),"
    " ik AS (SELECT doc_id, min(doc_id) OVER (PARTITION BY ahash) AS ik"
    "  FROM hashed)"
    " SELECT t.doc_id,"
    " CASE WHEN t.doc_id <> t.tk THEN t.tk END AS text_dup_of,"
    " CASE WHEN i.doc_id <> i.ik THEN i.ik END AS image_dup_of,"
    " (t.doc_id = t.tk AND i.doc_id = i.ik) AS kept"
    " FROM tk t JOIN ik i USING (doc_id)"
)


@query("ll103_multimodal_dedup_gate", oracle=_LL103_ORACLE)
def ll103_multimodal_dedup_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MULTIMODAL dedup gate — the cross-modality composition a real
    image-text corpus pipeline runs, because each modality's dedup
    tier is blind to the other's duplicates: a doc is dropped when its
    TEXT fingerprint (ll4's normalized md5, exact tier) OR its IMAGE
    perceptual hash (ll90's integer-exact aHash through the real
    decode path) has a smaller-id keeper. The planted fixture makes
    both blind spots observable: B copies (+1e6) carry EDITED text
    with a re-encoded (brightness-jittered) image of the original —
    text dedup misses every one, the aHash tier catches them; C
    copies (+2e6) are exact text copies with a DIFFERENT image —
    the aHash tier misses every one, the fingerprint tier catches
    them. Both keeper rules are the engine's standard min-id greedy
    verdict; 'kept' is their conjunction.

    Scale: one narrow fingerprint pass + one Arrow decode→hash pass,
    then two hash-keyed min windows — the ll4 shape per modality, one
    equi-shuffle each, no pairs anywhere; aHash's 16-bit natural
    collisions (both engines agree on them) are the tier's honest
    false-positive rate, exactly as in ll90.

    Returns (doc_id, text_dup_of, image_dup_of, kept) for all three
    variants of every doc."""
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    b_text = docs.select(
        (F.col("doc_id") + 1000000).alias("doc_id"),
        F.concat("text", F.lit(" variant edit")).alias("text"),
    )
    c_text = docs.select(
        (F.col("doc_id") + 2000000).alias("doc_id"), "text"
    )
    texts = docs.unionAll(b_text).unionAll(c_text)
    a_img = multimodal.attach_image_payload(docs, "doc_id", "text")
    b_img = multimodal.attach_image_payload_jittered(docs, "doc_id", "text")
    c_img = multimodal.attach_image_payload(
        docs.select(
            (F.col("doc_id") + 2000000).alias("doc_id"),
            F.concat("text", F.lit(" x")).alias("text"),
        ),
        "doc_id",
        "text",
    )
    images = (
        a_img.unionByName(b_img)
        .unionByName(c_img)
        .select("doc_id", "payload")
    )
    tk = texts.select(
        "doc_id", T.text_fingerprint(F.col("text")).alias("f")
    ).withColumn("tk", F.min("doc_id").over(W.partitionBy("f")))
    ik = multimodal.image_ahash(images).withColumn(
        "ik", F.min("doc_id").over(W.partitionBy("ahash"))
    )
    return tk.join(ik, "doc_id").select(
        "doc_id",
        F.when(F.col("doc_id") != F.col("tk"), F.col("tk")).alias(
            "text_dup_of"
        ),
        F.when(F.col("doc_id") != F.col("ik"), F.col("ik")).alias(
            "image_dup_of"
        ),
        (
            (F.col("doc_id") == F.col("tk"))
            & (F.col("doc_id") == F.col("ik"))
        ).alias("kept"),
    )
