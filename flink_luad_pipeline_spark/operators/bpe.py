"""Deterministic BPE merge training over a document corpus.

Byte-pair encoding (Sennrich et al. 2016) is THE tokenizer-training
step of an LLM data pipeline: repeatedly find the most frequent
adjacent symbol pair in the corpus vocabulary and fuse it into a new
symbol. ll25 *applies* a BPE-ish tokenizer; this operator *trains* the
merge table itself — and deterministically, so the whole training loop
is value-checkable against a DuckDB oracle (unrolled rounds), not just
rows-only.

Design for scale (the reason BPE training is feasible at 100 TB):
all rounds operate on the DISTINCT-WORD vocabulary weighted by word
count, never the corpus — the corpus is scanned exactly once to build
(word, count). Per merge round:

- pair counting: one explode over the vocab's adjacent symbol pairs +
  a map-side-combinable grouped sum (pair-keyed shuffle of vocab-sized
  data);
- argmax: a 1-row driver boundary (count desc, then lexicographic
  (left, right) tie-break — same k-row contract as the k-means loop);
- merge application: a narrow left-to-right fold over each word's
  symbol string (``F.aggregate``, codegen) — greedy non-overlapping,
  exactly DuckDB's ``list_reduce`` seeded with the first element.

Symbols are '|'-joined inside a word string; the tokenizer's [a-z0-9]
alphabet guarantees the delimiter never collides. Word-end markers
('</w>') are omitted — merges here never cross word boundaries by
construction, which is the semantics the marker exists to enforce.

Reference parity note: the reference has no tokenizer training; this
extends the LLM-pipeline surface like the dedup/ANN families.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.text import tokenize


def _merge_fold(arr: Column, left: str, right: str) -> Column:
    """Greedy left-to-right application of one merge to a symbol array:
    fold seeded with the first symbol (list_reduce semantics); at each
    step, if the accumulator's last symbol is ``left`` and the incoming
    symbol is ``right``, fuse them, else append."""
    merged = left + right

    def step(acc: Column, x: Column) -> Column:
        last = F.element_at(F.split(acc, "\\|"), -1)
        return F.when(
            (last == F.lit(left)) & (x == F.lit(right)),
            F.concat(
                F.substr(acc, F.lit(1), F.length(acc) - F.lit(len(left))),
                F.lit(merged),
            ),
        ).otherwise(F.concat(acc, F.lit("|"), x))

    return F.aggregate(
        F.slice(arr, F.lit(2), F.size(arr) - F.lit(1)),
        F.element_at(arr, 1),
        step,
    )


def bpe_merge_table(
    docs: DataFrame,
    text_col: str = "text",
    n_merges: int = 5,
) -> DataFrame:
    """Train ``n_merges`` BPE merges on the corpus; returns the merge
    table ``DataFrame[merge_idx, left_sym, right_sym, merged,
    pair_count]`` — merge_idx 1-based in training order, pair_count the
    corpus-wide weighted frequency that won the round."""
    spark = docs.sparkSession
    vocab = (
        docs.select(F.explode(tokenize(F.col(text_col))).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    chars = F.transform(
        F.sequence(F.lit(1), F.length("w")),
        lambda i: F.substr(F.col("w"), i, F.lit(1)),
    )
    state = vocab.select(
        F.array_join(chars, "|").alias("s"), "cnt"
    ).localCheckpoint()

    rows = []
    for idx in range(1, n_merges + 1):
        arr = F.split(F.col("s"), "\\|")
        # the >= 2 guard must precede the sequence(1, size-1) transform:
        # on a single-symbol word the descending sequence [1, 0] would
        # hit element_at(arr, 0), an ANSI error, before any later filter
        pairs = (
            state.where(F.size(arr) >= 2)
            .select(
                "cnt",
                F.explode(
                    F.transform(
                        F.sequence(F.lit(1), F.size(arr) - F.lit(1)),
                        lambda i: F.struct(
                            F.element_at(arr, i).alias("l"),
                            F.element_at(arr, i + F.lit(1)).alias("r"),
                        ),
                    )
                ).alias("p"),
            )
            .groupBy(F.col("p.l").alias("l"), F.col("p.r").alias("r"))
            .agg(F.sum("cnt").alias("total"))
        )
        # 1-row driver boundary per round (the kmeans/graph-loop
        # contract): deterministic argmax by (count desc, l, r)
        best = pairs.orderBy(
            F.col("total").desc(), F.col("l"), F.col("r")
        ).limit(1).collect()
        if not best:
            break
        b = best[0]
        rows.append((idx, b["l"], b["r"], b["l"] + b["r"], int(b["total"])))
        state = state.select(
            _merge_fold(F.split(F.col("s"), "\\|"), b["l"], b["r"]).alias("s"),
            "cnt",
        ).localCheckpoint()  # truncate the nested-fold lineage per round

    return spark.createDataFrame(
        rows,
        "merge_idx int, left_sym string, right_sym string,"
        " merged string, pair_count bigint",
    )


def bpe_encode(
    docs: DataFrame,
    merges: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Apply a TRAINED merge table to a corpus — the encode half of
    the BPE train→apply loop (VERDICT r4 item 6), composing with
    ``bpe_merge_table``'s output or the same table read back from
    storage.

    The DISTINCT-WORD vocabulary is encoded once — each merge is one
    narrow fold over the vocab's symbol strings, applied in merge_idx
    order with the trainer's exact greedy left-to-right semantics
    (``_merge_fold``) — and the corpus then joins back on the word, so
    100 TB of text costs one tokenize pass plus one word-keyed join;
    no merge ever touches corpus-sized data. The merge table itself is
    collected to the driver (tokenizer merge tables are bounded,
    ~10^4-10^5 rows — the k-means-centroid/BPE-argmax driver-boundary
    contract), and the fold chain is localCheckpointed every few
    merges to bound expression/lineage depth.

    Returns (doc_id, n_words, n_tokens, enc_md5): words in the doc,
    total symbols after all merges, and an md5 over the encoded stream
    (symbols '|'-joined within words, words ' '-joined in document
    order) so value checks never haul the encoded corpus around.
    """
    mrows = merges.orderBy("merge_idx").collect()
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(tokenize(F.col(text_col))).alias("pos", "w"),
    )
    vocab = toks.select("w").distinct()
    chars = F.transform(
        F.sequence(F.lit(1), F.length("w")),
        lambda i: F.substr(F.col("w"), i, F.lit(1)),
    )
    state = vocab.select("w", F.array_join(chars, "|").alias("s"))
    for i, m in enumerate(mrows):
        state = state.select(
            "w",
            _merge_fold(
                F.split(F.col("s"), "\\|"), m["left_sym"], m["right_sym"]
            ).alias("s"),
        )
        if (i + 1) % 4 == 0:  # bound the nested-fold expression depth
            state = state.localCheckpoint()
    enc = state.select(
        "w", "s", F.size(F.split(F.col("s"), "\\|")).alias("n_sym")
    )
    return (
        toks.join(enc, "w")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.sum("n_sym").cast("bigint").alias("n_tokens"),
            F.md5(
                F.array_join(
                    F.transform(
                        F.array_sort(
                            F.collect_list(F.struct(F.col("pos"), F.col("s")))
                        ),
                        lambda x: x["s"],
                    ),
                    " ",
                )
            ).alias("enc_md5"),
        )
    )
