"""Property tests for rows-only LLM ops (the checks the DuckDB oracle
can't express): MinHash recall vs exact Jaccard, SimHash planted dups,
LSH-ANN score consistency vs brute force, multimodal byte stats."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from flink_luad_pipeline_spark.catalog import load
from flink_luad_pipeline_spark.operators import dedup, multimodal, similarity
from flink_luad_pipeline_spark.plans.llm_queries import _augmented


def test_minhash_pairs_subset_of_exact(spark, sf_dir):
    """Every minhash-verified pair must appear in the exact join with
    the same (exact) Jaccard; planted copies (J=1.0) must be found."""
    aug = _augmented(spark, sf_dir)
    exact = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in dedup.jaccard_pairs(aug, "doc_id", "text", threshold=0.4).collect()
    }
    mh = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in dedup.minhash_lsh_pairs(aug, "doc_id", "text", threshold=0.4).collect()
    }
    assert set(mh) <= set(exact)
    for pair, j in mh.items():
        assert abs(j - exact[pair]) < 1e-9
    planted = {p for p, j in exact.items() if j == 1.0}
    assert planted, "fixture should plant J=1.0 pairs"
    # identical docs have identical signatures -> collide in every band
    assert planted <= set(mh)


def test_simhash_planted_duplicates(spark, sf_dir):
    aug = _augmented(spark, sf_dir)
    pairs = dedup.simhash_pairs(aug, "doc_id", "text").collect()
    got = {(r.doc_a, r.doc_b): r.hamming for r in pairs}
    docs = load(spark, sf_dir, "documents")
    planted_ids = [
        r.doc_id for r in docs.where(F.col("doc_id") % 10 == 0).collect()
    ]
    for i in planted_ids:
        assert got.get((i, i + 1000000)) == 0  # identical text -> distance 0


def test_lsh_ann_scores_match_brute_force(spark, sf_dir):
    emb = load(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 5)
    bf = {
        (r.query_id, r.cand_id): r.sim
        for r in similarity.brute_force_topk(queries, emb, k=1000000).collect()
    }
    ann = similarity.lsh_bucketed_topk(queries, emb, k=10).collect()
    assert len(ann) > 0
    for r in ann:
        # bucketing only restricts candidates; scores must be identical
        assert bf[(r.query_id, r.cand_id)] == r.sim


def test_lsh_neardup_subset_of_exact_with_identical_scores(spark, sf_dir):
    """ll11's bucketed pairs must be a subset of the exact all-pairs
    result with byte-identical similarities (bucketing only restricts
    candidates, never changes a score), and recall must be useful."""
    emb = load(spark, sf_dir, "embeddings")
    exact = {
        (r.doc_a, r.doc_b): r.sim
        for r in similarity.lsh_neardup_pairs(
            emb, threshold=0.35, n_planes=0, n_tables=1
        ).collect()
    }
    lsh = similarity.lsh_neardup_pairs(emb, threshold=0.35).collect()
    assert len(lsh) > 0
    for r in lsh:
        assert exact[(r.doc_a, r.doc_b)] == r.sim
    # theoretical recall at cos≈0.35 with 6 tables × 4 planes is ~60%;
    # floor set below that to absorb fixture-distribution noise
    assert len(lsh) / len(exact) > 0.4


def test_multimodal_features_match_python(spark, sf_dir):
    docs = load(spark, sf_dir, "documents").limit(20)
    binary = multimodal.attach_binary_payload(docs, "doc_id", "text")
    feats = {r.doc_id: r for r in multimodal.extract_features(binary).collect()}
    for row in docs.collect():
        norm = " ".join(row.text.lower().split())
        payload = hashlib.md5(norm.encode()).digest() * 4
        f = feats[row.doc_id]
        assert f.n_bytes == 64
        assert abs(f.byte_mean - sum(payload) / 64) < 1e-9
        assert abs(f.byte_entropy_proxy - len(set(payload)) / 256.0) < 1e-12
        assert f.format == "fake/md5x4"


def test_image_codecs_roundtrip():
    import random

    import pytest as _pytest

    rng = random.Random(7)
    for w, h in [(4, 4), (3, 5), (1, 1), (7, 2)]:
        rgb = bytes(rng.randrange(256) for _ in range(w * h * 3))
        assert multimodal.decode_image(multimodal.encode_ppm(w, h, rgb)) == (
            w, h, 3, rgb,
        )
        # BMP round-trips through row padding + bottom-up BGR storage
        assert multimodal.decode_image(multimodal.encode_bmp(w, h, rgb)) == (
            w, h, 3, rgb,
        )
    # PGM with a header comment
    pgm = b"P5\n# a comment\n4 2\n255\n" + bytes(range(8))
    assert multimodal.decode_image(pgm) == (4, 2, 1, bytes(range(8)))
    with _pytest.raises(ValueError):
        multimodal.decode_image(b"\x00\x01\x02")
    with _pytest.raises(ValueError):
        multimodal.decode_image(b"P6\n4 4\n255\n" + b"\x00" * 10)  # truncated


def test_winnowing_shared_passage_guarantee(spark):
    """The winnowing guarantee: any two documents sharing a run of at
    least window+k-1 tokens (here 4+4-1=7; we plant 10) must share at
    least one fingerprint — some hash window then lies entirely inside
    the shared run and both documents select its minimum. Unrelated
    documents carry no such obligation."""
    import random

    rng = random.Random(3)
    vocab = [f"w{i}" for i in range(200)]
    passage = " ".join(rng.choice(vocab) for _ in range(10))
    docs = []
    for i in range(6):
        pre = " ".join(rng.choice(vocab) for _ in range(rng.randrange(5, 30)))
        post = " ".join(rng.choice(vocab) for _ in range(rng.randrange(5, 30)))
        docs.append((i, f"{pre} {passage} {post}"))
    for i in range(6, 8):  # unrelated controls
        docs.append((i, " ".join(rng.choice(vocab) for _ in range(40))))
    df = spark.createDataFrame(docs, "doc_id long, text string")
    fps = dedup.winnowing_fingerprints(df, "doc_id", "text", k=4, window=4)
    pairs = dedup.winnowing_overlap_pairs(fps, min_shared=1, max_fp_df=None)
    got = {(r.doc_a, r.doc_b) for r in pairs.collect()}
    for a in range(6):
        for b in range(a + 1, 6):
            assert (a, b) in got, f"planted pair ({a},{b}) missing"


def test_wav_codec_roundtrip():
    import random
    import struct

    import pytest as _pytest

    rng = random.Random(11)
    for sr, ch, n in [(8000, 1, 16), (44100, 2, 64), (16000, 1, 1)]:
        samples = [rng.randrange(-32768, 32768) for _ in range(n * ch)]
        payload = multimodal.encode_wav(sr, ch, samples)
        assert multimodal.decode_wav(payload) == (sr, ch, samples)
    # chunk walk must skip unknown chunks (e.g. LIST/INFO) before data
    base = multimodal.encode_wav(8000, 1, [1, -2, 3])
    fmt_chunk = base[12:36]  # "fmt " + size + 16-byte body
    data_chunk = base[36:]
    junk = b"LIST" + struct.pack("<I", 5) + b"INFOx" + b"\x00"  # odd size, padded
    reordered = base[:12] + fmt_chunk + junk + data_chunk
    assert multimodal.decode_wav(reordered) == (8000, 1, [1, -2, 3])
    with _pytest.raises(ValueError):
        multimodal.decode_wav(b"RIFX" + base[4:])  # bad magic
    with _pytest.raises(ValueError):
        multimodal.decode_wav(base[:20])  # truncated
    with _pytest.raises(ValueError):  # 8-bit PCM refused
        bad = bytearray(base)
        bad[34] = 8
        multimodal.decode_wav(bytes(bad))


def test_audio_features_from_real_decode(spark, sf_dir):
    """ll41's Spark-side features must equal a driver-side decode of the
    same payloads — catches Arrow/pandas conversion slips the SQL
    oracle (which recomputes from md5 hex, not from the payload) would
    mask."""
    import math

    docs = load(spark, sf_dir, "documents").limit(20)
    binary = multimodal.attach_audio_payload(docs, "doc_id", "text")
    feats = {
        r["doc_id"]: r
        for r in multimodal.extract_audio_features(binary).collect()
    }
    for row in binary.collect():
        sr, ch, samples = multimodal.decode_wav(row["payload"])
        got = feats[row["doc_id"]]
        assert (sr, ch) == (8000, 1)
        assert got["n_samples"] == len(samples) == 16
        assert got["peak"] == max(abs(s) for s in samples)
        assert got["rms"] == _pytest_approx(
            math.sqrt(sum(s * s for s in samples) / len(samples))
        )


def _pytest_approx(x):
    import pytest as _pytest

    return _pytest.approx(x, rel=1e-12)


def test_image_features_from_real_decode(spark, sf_dir):
    docs = load(spark, sf_dir, "documents").limit(20)
    binary = multimodal.attach_image_payload(docs, "doc_id", "text")
    feats = {r.doc_id: r for r in multimodal.extract_image_features(binary).collect()}
    for row in docs.collect():
        pix = b"".join(
            hashlib.md5((row.text + s).encode()).digest() for s in ("", "a", "b")
        )
        f = feats[row.doc_id]
        assert (f.width, f.height, f.channels, f.format) == (4, 4, 3, "ppm")
        assert abs(f.pix_mean - sum(pix) / 48) < 1e-9
        for c, name in enumerate(("r_mean", "g_mean", "b_mean")):
            assert abs(getattr(f, name) - sum(pix[c::3]) / 16) < 1e-9


def test_frame_sample_plan(spark, sf_dir):
    docs = load(spark, sf_dir, "documents").limit(5)
    binary = multimodal.attach_binary_payload(docs, "doc_id", "text")
    plan = multimodal.frame_sample_plan(binary, every_n=4)
    rows = plan.collect()
    # 64-byte payload -> 16 "frames" -> sampled every 4 -> 4 rows/doc
    per_doc = {}
    for r in rows:
        per_doc.setdefault(r.doc_id, []).append(r.frame_idx)
    assert all(sorted(v) == [0, 4, 8, 12] for v in per_doc.values())


def test_ivf_ann_scores_exact_and_recall(spark, sf_dir):
    emb = load(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 5)
    bf_all = {
        (r.query_id, r.cand_id): r.sim
        for r in similarity.brute_force_topk(queries, emb, k=1000000).collect()
    }
    exact10: dict[int, set[int]] = {}
    for r in similarity.brute_force_topk(queries, emb, k=10).collect():
        exact10.setdefault(r.query_id, set()).add(r.cand_id)
    ivf: dict[int, set[int]] = {}
    rows = similarity.ivf_topk(queries, emb, k=10, centroid_mod=25).collect()
    assert len(rows) > 0
    for r in rows:
        # cell probing only restricts candidates; scores must be exact
        assert bf_all[(r.query_id, r.cand_id)] == r.sim
        ivf.setdefault(r.query_id, set()).add(r.cand_id)
    recalls = [
        len(exact10[q] & ivf.get(q, set())) / len(exact10[q]) for q in exact10
    ]
    # training-free quantizer, nprobe=3 of ~20 cells: ~0.44 measured
    assert sum(recalls) / len(recalls) >= 0.3


def test_lsh_neardup_empty_and_tiny_inputs(spark):
    """Degenerate inputs must not error: empty table -> empty result;
    a single vector -> no pairs; two identical vectors -> one pair with
    sim 1.0 (identical vectors share every bucket)."""
    empty = spark.createDataFrame(
        [], "vec_id BIGINT, embedding ARRAY<FLOAT>"
    )
    assert similarity.lsh_neardup_pairs(empty, threshold=0.5).count() == 0
    one = spark.createDataFrame(
        [(1, [1.0] * 64)], "vec_id BIGINT, embedding ARRAY<FLOAT>"
    )
    assert similarity.lsh_neardup_pairs(one, threshold=0.5).count() == 0
    twin = spark.createDataFrame(
        [(1, [1.0] * 64), (2, [1.0] * 64)],
        "vec_id BIGINT, embedding ARRAY<FLOAT>",
    )
    rows = similarity.lsh_neardup_pairs(twin, threshold=0.5).collect()
    assert [(r.doc_a, r.doc_b, r.sim) for r in rows] == [(1, 2, 1.0)]


def test_jaccard_df_cutoff_is_conservative_subset(spark, sf_dir):
    """With the skew cutoff, pairs must be a subset of the exact result
    with jaccard <= the exact value (dropping index entries only ever
    under-counts intersections), and planted identical copies must
    still surface (they share rare shingles too)."""
    aug = _augmented(spark, sf_dir)
    exact = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in dedup.jaccard_pairs(
            aug, "doc_id", "text", threshold=0.4
        ).collect()
    }
    capped = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in dedup.jaccard_pairs(
            aug, "doc_id", "text", threshold=0.4, max_shingle_df=20
        ).collect()
    }
    assert set(capped) <= set(exact)
    for pair, j in capped.items():
        assert j <= exact[pair] + 1e-12
    planted = {p for p, j in exact.items() if j == 1.0}
    assert planted and planted <= set(capped)


def test_minhash_df_cutoff_kills_boilerplate_buckets(spark):
    """Boilerplate-heavy fixture: every doc shares a large license
    header; each doc body is unique except two planted near-dups.
    Without the cutoff the shared header makes many unrelated docs
    collide; with it, only the planted pair survives at the threshold,
    and the pair's Jaccard equals the exact Jaccard of the
    rare-shingle sets."""
    header = " ".join(f"license clause {i} all rights reserved" for i in range(12))
    docs = [
        (i, f"{header} body{i} " + " ".join(f"w{i}x{j} token{j}" for j in range(15)))
        for i in range(20)
    ]
    # planted near-dup: doc 100/101 share their (unique) body
    body = "the quick brown fox jumps over the lazy dog " * 5
    docs += [(100, f"{header} {body}"), (101, f"{header} {body} extra")]
    df = spark.createDataFrame(docs, "doc_id long, text string")

    with_guard = dedup.minhash_lsh_pairs(
        df, "doc_id", "text", threshold=0.5, max_shingle_df=0.5
    ).collect()
    got = {(r.doc_a, r.doc_b) for r in with_guard}
    assert (100, 101) in got, got
    # unrelated docs share ONLY boilerplate -> no surviving pairs
    assert got == {(100, 101)}, got
    # guard dropped the header shingles (df = 22 > 11 = 0.5*22), so the
    # reported jaccard is over rare-shingle sets — high for the pair
    j = {(r.doc_a, r.doc_b): r.jaccard for r in with_guard}[(100, 101)]
    assert j > 0.5

    # without the guard, boilerplate-only pairs appear at low J but the
    # candidate volume explodes: every doc collides with every other
    unguarded = dedup.minhash_lsh_pairs(
        df, "doc_id", "text", threshold=0.0, max_shingle_df=None
    ).count()
    guarded = dedup.minhash_lsh_pairs(
        df, "doc_id", "text", threshold=0.0, max_shingle_df=0.5
    ).count()
    assert guarded < unguarded


def test_minhash_fast_hasher_same_pair_set(spark, sf_dir):
    """hasher="fast" (xxhash64, the 100 TB path) vs "portable" (md5,
    the oracle-parity default): candidate sampling differs but
    verification is exact Jaccard on the hash-free shingle sets, so
    wherever banding recall holds both modes return identical
    (doc_a, doc_b, jaccard) rows. On the fixture corpus (planted
    copies + sf near-dups at threshold 0.4) recall holds for both."""
    aug = _augmented(spark, sf_dir)
    portable = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in dedup.minhash_lsh_pairs(
            aug, "doc_id", "text", threshold=0.4, hasher="portable"
        ).collect()
    }
    fast = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in dedup.minhash_lsh_pairs(
            aug, "doc_id", "text", threshold=0.4, hasher="fast"
        ).collect()
    }
    assert portable == fast
    assert portable, "fixture should surface at least the planted copies"


def test_lsh_neardup_compact_equals_direct(spark, sf_dir):
    """The pair-dedup-before-scoring variant must produce the exact
    same (doc_a, doc_b, sim) set as the direct path — same buckets,
    same rounded cosine, different shuffle plan."""
    emb = load(spark, sf_dir, "embeddings")
    direct = {
        (r.doc_a, r.doc_b, r.sim)
        for r in similarity.lsh_neardup_pairs(emb, threshold=0.35).collect()
    }
    compact = {
        (r.doc_a, r.doc_b, r.sim)
        for r in similarity.lsh_neardup_pairs_compact(emb, threshold=0.35).collect()
    }
    assert direct == compact and len(direct) > 0


def test_dsir_weights_separate_target_from_offtarget(spark, sf_dir):
    """DSIR log-weights must rank the target slice (English) above the
    rest on average — the 'does the importance ratio actually point at
    the target' acceptance check, independent of the exact-value
    oracle."""
    from flink_luad_pipeline_spark.catalog import load
    from flink_luad_pipeline_spark.operators.importance import dsir_logweights
    from pyspark.sql import functions as F

    docs = load(spark, sf_dir, "documents")
    w = dsir_logweights(docs, target=F.col("lang") == "en")
    j = w.join(docs.select("doc_id", "lang"), "doc_id")
    means = {
        r["is_en"]: r["m"]
        for r in j.groupBy((F.col("lang") == "en").alias("is_en"))
        .agg(F.avg("log_weight").alias("m"))
        .collect()
    }
    assert means[True] > means[False] + 0.5, means


def test_chunking_is_lossless(spark, sf_dir):
    """Reassembling ll13's overlapping chunks (first `stride` tokens of
    each chunk, then the tail of the last) must reproduce every
    document's token sequence exactly — the chunker may not drop or
    duplicate tokens at window boundaries."""
    from flink_luad_pipeline_spark.catalog import load
    from flink_luad_pipeline_spark.functions.text import tokenize
    from flink_luad_pipeline_spark.plans import all_queries
    from flink_luad_pipeline_spark.plans.datapipe_queries import CHUNK_STRIDE
    from pyspark.sql import functions as F

    docs = load(spark, sf_dir, "documents").where(F.col("doc_id") < 200)
    expected = {
        r["doc_id"]: list(r["t"])
        for r in docs.select(
            "doc_id", tokenize(F.col("text")).alias("t")
        ).collect()
    }
    rows = (
        all_queries()["ll13_chunk_documents"](spark, sf_dir)
        .orderBy("doc_id", "chunk_id")
        .collect()
    )
    by_doc: dict = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for doc_id, rs in by_doc.items():
        toks: list = []
        for i, r in enumerate(rs):
            c = r["chunk_text"].split(" ") if r["chunk_text"] else []
            toks.extend(c[:CHUNK_STRIDE] if i < len(rs) - 1 else c)
        assert toks == expected[doc_id], doc_id


def test_segment_removal_vs_python(spark):
    """remove_repeated_segments on random small corpora must equal a
    pure-Python reimplementation (segmentation boundaries, threshold,
    in-order reassembly, empty-result md5)."""
    import hashlib
    import random

    from flink_luad_pipeline_spark.operators.dedup import (
        remove_repeated_segments,
    )

    rng = random.Random(3)
    words = ["alpha", "bravo", "charlie", "delta", "echo"]
    docs = []
    for i in range(30):
        n = rng.randrange(0, 25)
        docs.append((i, " ".join(rng.choice(words) for _ in range(n))))
    # plant an exact repeat so the threshold actually fires
    docs.append((100, docs[0][1]))
    seg_tokens, min_count = 4, 2

    segs: dict[int, list[str]] = {}
    for doc_id, text in docs:
        toks = [t for t in text.lower().split(" ") if t]
        segs[doc_id] = [
            " ".join(toks[i : i + seg_tokens])
            for i in range(0, len(toks), seg_tokens)
        ]
    from collections import Counter

    counts = Counter(s for ss in segs.values() for s in ss)
    expected = {}
    for doc_id, ss in segs.items():
        if not ss:
            continue  # docs with no tokens produce no row
        kept = [s for s in ss if counts[s] < min_count]
        expected[doc_id] = (
            len(ss),
            sum(1 for s in ss if counts[s] >= min_count),
            hashlib.md5(" ".join(kept).encode()).hexdigest(),
        )
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = remove_repeated_segments(
        df, "doc_id", "text", seg_tokens=seg_tokens, min_count=min_count
    )
    got = {
        r["doc_id"]: (r["n_segments"], r["n_dropped"], r["clean_md5"])
        for r in out.collect()
    }
    assert got == expected


def test_compression_ratio_separates_repetitive_text(spark):
    """The zlib signal must rank a highly repetitive document far below
    varied text, match a direct zlib computation exactly, and return
    1.0 for empty strings."""
    import zlib

    from flink_luad_pipeline_spark.functions.text import compression_ratio
    from pyspark.sql import functions as F

    rep = "spam " * 200
    varied = " ".join(f"w{i}x{i * 7 % 13}" for i in range(200))
    df = spark.createDataFrame(
        [(1, rep), (2, varied), (3, "")], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: r["r"]
        for r in df.select(
            "doc_id", compression_ratio(F.col("text")).alias("r")
        ).collect()
    }
    exp = lambda t: len(zlib.compress(t.encode(), 6)) / len(t.encode())
    assert abs(got[1] - exp(rep)) < 1e-12
    assert abs(got[2] - exp(varied)) < 1e-12
    assert got[3] == 1.0
    assert got[1] < 0.3 * got[2]


def test_derive_centroid_mod_tracks_sqrt_n(spark):
    """VERDICT r3 item 3: with centroid_mod=None the IVF family sizes
    its centroid count from the corpus — M ≈ √N — so assignment cost is
    O(N·√N) by construction instead of the fixed default's O(N²/25).
    Checked across a 10× size spread (the sf0.01 vs sf0.1 embedding
    row counts): both mod and the realized centroid count track √N
    within 2×, and the end-to-end derived-mod semantic_dedup runs."""
    import math

    emb_small = load(spark, "/root/testdata/sf0.01", "embeddings")
    emb_big = load(spark, "/root/testdata/sf0.1", "embeddings")
    for emb in (emb_small, emb_big):
        n = emb.count()
        mod = similarity.derive_centroid_mod(emb)
        root = math.sqrt(n)
        assert root / 2 <= mod <= root * 2
        m_real = emb.where(F.col("vec_id") % mod == 0).count()
        assert root / 2 <= m_real <= root * 2
    # 10x the rows must grow the modulus by ~sqrt(10)
    ratio = similarity.derive_centroid_mod(emb_big) / similarity.derive_centroid_mod(emb_small)
    assert 2.0 <= ratio <= 5.0
    out = similarity.semantic_dedup(
        emb_small.where(F.col("vec_id") < 100),
        centroid_mod=None,
        cells="centroid",
    )
    assert out.count() > 0


def test_ivf_trained_centroids_improve_recall(spark, sf_dir):
    """VERDICT r3 item 4: closing the ANN quality loop — k-means
    centroids (ll50's trainer via clustering.kmeans_fit) fed into
    ivf_topk must beat the training-free id-modulo quantizer on
    recall@10 against the exact baseline, same fixture, same k/nprobe
    (measured 0.37 → 0.86 on the sf0.001 embeddings). The modulo path
    stays the oracle-deterministic default; this pins the trained
    variant's wiring AND its reason to exist."""
    from flink_luad_pipeline_spark.operators import clustering

    emb = load(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 20)
    exact10: dict[int, set[int]] = {}
    for r in similarity.brute_force_topk(queries, emb, k=10).collect():
        exact10.setdefault(r.query_id, set()).add(r.cand_id)

    def recall(rows) -> float:
        got: dict[int, set[int]] = {}
        for r in rows:
            got.setdefault(r.query_id, set()).add(r.cand_id)
        per_q = [len(exact10[q] & got.get(q, set())) / 10 for q in exact10]
        return sum(per_q) / len(per_q)

    modulo = recall(
        similarity.ivf_topk(queries, emb, k=10, centroid_mod=25).collect()
    )
    cents = clustering.kmeans_fit(emb, k=20, iters=3).select(
        F.col("cid").alias("centroid_id"), F.col("cv").alias("centv")
    )
    trained = recall(
        similarity.ivf_topk(queries, emb, k=10, centroids=cents).collect()
    )
    assert trained > modulo + 0.1
    assert trained >= 0.6

    # VERDICT r4 item 7: the lift must survive PQ composition — the
    # same trained coarse quantizer wired into ivfpq_topk beats the
    # mod-sampled one on shortlist recall@10. PQ's ADC re-ranking is
    # lossy (sim is a code-level approximation), so the composed
    # recall sits below pure IVF's, but the trained-vs-modulo ordering
    # must hold and the wiring must be live.
    pq_modulo = recall(
        similarity.ivfpq_topk(queries, emb, k=10, centroid_mod=25).collect()
    )
    pq_trained = recall(
        similarity.ivfpq_topk(queries, emb, k=10, centroids=cents).collect()
    )
    assert pq_trained > pq_modulo


def test_kmeans_training_sample_bound(spark, sf_dir):
    """VERDICT r9 item 5: Lloyd TRAINING is bounded at
    k·max_points_per_centroid rows (FAISS's subsampling), while the
    final assignment stays full-corpus. The bound must be inactive at
    fixture N with the default budget (identical centroids — the
    property that keeps the unrolled _kmeans_ctes oracles exact), and
    an artificially tiny budget must still produce k usable centroids
    and a full-coverage assignment."""
    from flink_luad_pipeline_spark.operators import clustering

    emb = load(spark, sf_dir, "embeddings")
    n = emb.count()
    default = clustering.kmeans_fit(emb, k=4, iters=2).collect()
    explicit_off = clustering.kmeans_fit(
        emb, k=4, iters=2, max_points_per_centroid=n  # bound inactive
    ).collect()
    assert sorted(map(tuple, default)) == sorted(map(tuple, explicit_off))

    # tiny budget -> train_mod > 1: still k centroids, deterministic
    bounded = clustering.kmeans_fit(
        emb, k=4, iters=2, max_points_per_centroid=16
    )
    rows = bounded.collect()
    assert len(rows) == 4
    again = clustering.kmeans_fit(
        emb, k=4, iters=2, max_points_per_centroid=16
    ).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))
    # sample-trained centroids differ from full-trained at this N
    # (the bound is real, not a no-op)
    assert sorted(map(tuple, rows)) != sorted(map(tuple, default))
    # assignment is the FULL corpus regardless of the training bound
    asg = clustering.kmeans_assign(
        emb, k=4, iters=2, max_points_per_centroid=16
    )
    assert asg.count() == n
    assert asg.select("vec_id").distinct().count() == n


def test_ll59_exact_values_on_corpus(spark, sf_dir):
    """VERDICT r3 item 6: ll59 has no DuckDB twin (no SQL zlib), so its
    driver row is rows-only by design — but the values ARE
    deterministic, so this test recomputes every document's ratio with
    Python's zlib on the same parquet rows and compares exactly (the
    query rounds to 6 digits; so do we)."""
    import zlib

    import duckdb

    from flink_luad_pipeline_spark.plans.registry import QUERIES

    got = {
        r["doc_id"]: r["zlib_ratio"]
        for r in QUERIES["ll59_compression_ratio"](spark, sf_dir).collect()
    }
    docs = duckdb.sql(
        f"SELECT doc_id, text FROM '{sf_dir}/documents.parquet'"
    ).fetchall()
    assert len(got) == len(docs) > 0
    for doc_id, text in docs:
        raw = text.encode("utf-8")
        exp = len(zlib.compress(raw, 6)) / len(raw) if raw else 1.0
        assert abs(got[doc_id] - round(exp, 6)) < 1e-9, doc_id


def test_containment_asymmetric_on_embedded_doc(spark):
    """A short document embedded verbatim in a long one must score
    containment ~1.0 short->long but far less long->short — the
    asymmetry that is ll61's reason to exist over Jaccard."""
    short = "the quick brown fox jumps over the lazy dog near the river"
    long = (
        "intro words here first " + short + " and then a very long tail "
        + " ".join(f"tail{i} word{i} extra{i}" for i in range(30))
    )
    df = spark.createDataFrame(
        [(1, short), (2, long)], "doc_id long, text string"
    )
    rows = dedup.containment_pairs(df, "doc_id", "text", k=3, threshold=0.0)
    got = {(r.doc_a, r.doc_b): r.containment for r in rows.collect()}
    assert got[(1, 2)] >= 0.9       # short inside long
    assert got[(2, 1)] <= 0.5       # long barely inside short
    assert got[(1, 2)] > 2 * got[(2, 1)]


def test_ivfpq_recall_floor_and_shortlist_subset(spark, sf_dir):
    """IVF-PQ must (a) only ever return candidates from the IVF
    shortlist (the composition contract) and (b) keep a usable
    recall@10 against the exact baseline despite BOTH approximations."""
    emb = load(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 5)
    exact10: dict[int, set[int]] = {}
    for r in similarity.brute_force_topk(queries, emb, k=10).collect():
        exact10.setdefault(r.query_id, set()).add(r.cand_id)
    ivf_all = {
        (r.query_id, r.cand_id)
        for r in similarity.ivf_topk(
            queries, emb, k=10**9, centroid_mod=25
        ).collect()
    }
    got: dict[int, set[int]] = {}
    for r in similarity.ivfpq_topk(
        queries, emb, k=10, centroid_mod=25
    ).collect():
        assert (r.query_id, r.cand_id) in ivf_all
        got.setdefault(r.query_id, set()).add(r.cand_id)
    recalls = [
        len(exact10[q] & got.get(q, set())) / len(exact10[q]) for q in exact10
    ]
    # training-free IVF (~0.37 recall) x training-free 4x16 PQ on
    # near-random 64-dim vectors compounds hard (0.12 measured); the
    # structural subset contract above is the real invariant, the
    # floor just catches total collapse. Trained centroids/codebooks
    # (kmeans_fit) are the quality lever, pinned in the trained-
    # centroid recall test.
    assert sum(recalls) / len(recalls) >= 0.05


def test_persisted_index_verdicts_equal_from_scratch(spark, sf_dir, tmp_path):
    """The frozen-snapshot-index path (build_minhash_index written to
    parquet, delta probes it) must yield verdicts IDENTICAL to the
    in-memory from-scratch path on the same split — the property that
    makes the persisted production flow (ll63) sound. Only holds with
    max_shingle_df=None, which the operator enforces."""
    corpus = _augmented(spark, sf_dir)
    snapshot = corpus.where(F.col("doc_id") % 5 != 0)
    delta = corpus.where(F.col("doc_id") % 5 == 0)

    scratch = {
        (r.doc_id, r.dropped, r.dup_of)
        for r in dedup.minhash_dedup_incremental(
            snapshot, delta, "doc_id", "text", k=3, threshold=0.4
        ).collect()
    }

    sh, banded = dedup.build_minhash_index(snapshot, "doc_id", "text", k=3)
    sh.write.mode("overwrite").parquet(str(tmp_path / "sh.parquet"))
    banded.write.mode("overwrite").parquet(str(tmp_path / "banded.parquet"))
    persisted = {
        (r.doc_id, r.dropped, r.dup_of)
        for r in dedup.minhash_dedup_incremental(
            snapshot, delta, "doc_id", "text", k=3, threshold=0.4,
            snapshot_index=(
                spark.read.parquet(str(tmp_path / "sh.parquet")),
                spark.read.parquet(str(tmp_path / "banded.parquet")),
            ),
        ).collect()
    }
    assert persisted == scratch and len(persisted) > 0

    # the guard: a df-cutoff is a corpus statistic a frozen index
    # cannot reproduce, so combining both must be rejected loudly
    import pytest

    with pytest.raises(ValueError, match="max_shingle_df"):
        dedup.minhash_dedup_incremental(
            snapshot, delta, "doc_id", "text",
            max_shingle_df=0.5, snapshot_index=(sh, banded),
        )


def test_cross_doc_spans_exact_boundaries(spark):
    """Planted fixture for the ExactSubstr tier: a 12-token run shared
    by two docs at different offsets must come back as one maximal
    span per doc with exact 0-based boundaries; a run repeated only
    WITHIN one doc must not trigger (min_docs counts distinct docs);
    docs sharing nothing are absent."""
    shared = " ".join(f"s{i}" for i in range(12))  # 12 shared tokens
    inner = " ".join(f"r{i}" for i in range(9))  # within-doc repeat
    docs = [
        # doc 1: shared run at token offset 3
        (1, "a1 a2 a3 " + shared + " a4 a5"),
        # doc 2: same run at token offset 0
        (2, shared + " b1 b2 b3 b4"),
        # doc 3: 9-token run repeated twice within ONE doc only
        (3, inner + " c1 c2 " + inner),
        # doc 4: nothing shared
        (4, " ".join(f"d{i}" for i in range(20))),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    spans = {
        r.doc_id: (r.span_start, r.span_end, r.span_tokens)
        for r in dedup.cross_doc_repeated_spans(
            df, "doc_id", "text", min_len=8, min_docs=2
        ).collect()
    }
    assert spans == {1: (3, 14, 12), 2: (0, 11, 12)}


def test_cross_doc_spans_merge_adjacent_islands(spark):
    """Two shared runs separated by one unshared token must stay TWO
    spans; back-to-back shared windows must merge into one."""
    run_a = " ".join(f"x{i}" for i in range(8))
    run_b = " ".join(f"y{i}" for i in range(8))
    df = spark.createDataFrame(
        [
            (1, run_a + " gap1 " + run_b),
            (2, run_a + " other tokens here " + run_b),
            # doc 3 shares a 16-token contiguous block with doc 4
            (3, run_a + " " + run_a),
            (4, run_a + " " + run_a + " tail"),
        ],
        "doc_id long, text string",
    )
    got = {}
    for r in dedup.cross_doc_repeated_spans(
        df, "doc_id", "text", min_len=8, min_docs=2
    ).collect():
        got.setdefault(r.doc_id, []).append((r.span_start, r.span_end))
    # docs 1/2: run_a at 0..7; run_b separated by unshared middle
    assert sorted(got[1]) == [(0, 7), (9, 16)]
    assert sorted(got[2]) == [(0, 7), (11, 18)]
    # docs 3/4: the doubled run (16 tokens, windows starting 0..8) is
    # one maximal merged span 0..15
    assert got[3] == [(0, 15)]
    assert got[4] == [(0, 15)]


def test_bpe_encode_matches_python_reference(spark):
    """Train on a tiny corpus, apply with bpe_encode, and reproduce
    every doc's (n_words, n_tokens, enc_md5) with a pure-Python greedy
    fold over the same merge table."""
    import hashlib as _hl
    import re

    docs = [
        (1, "low lower lowest low low"),
        (2, "newer newest new low"),
        (3, "wider wide widest lower"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    from flink_luad_pipeline_spark.operators.bpe import (
        bpe_encode,
        bpe_merge_table,
    )

    table = bpe_merge_table(df, n_merges=6)
    merges = [(m.left_sym, m.right_sym) for m in table.orderBy("merge_idx").collect()]
    assert len(merges) == 6

    def enc_word(w: str) -> list[str]:
        syms = list(w)
        for left, right in merges:
            out = [syms[0]]
            for x in syms[1:]:
                if out[-1] == left and x == right:
                    out[-1] = left + right
                else:
                    out.append(x)
            syms = out
        return syms

    got = {r.doc_id: r for r in bpe_encode(df, table).collect()}
    for doc_id, text in docs:
        words = [w for w in re.split(r"[^a-z0-9]+", text.lower()) if w]
        encs = [enc_word(w) for w in words]
        stream = " ".join("|".join(e) for e in encs)
        r = got[doc_id]
        assert r.n_words == len(words)
        assert r.n_tokens == sum(len(e) for e in encs)
        assert r.enc_md5 == _hl.md5(stream.encode()).hexdigest()


def test_cluster_quality_keeper_prefers_quality_over_id(spark):
    """ll67's policy vs ll23's: when the LOWER-id member of a near-dup
    cluster has the WORSE quality score, ll67 must keep the better doc.
    Doc 1 is a short noisy variant (heavy punctuation tanks the score);
    doc 2 is the longer clean variant sharing its opening run (J >= 0.4
    via shared shingles). Identical-text copies tie on the rounded
    score and fall back to the doc_id tiebreak."""
    from flink_luad_pipeline_spark.functions import text as T
    from flink_luad_pipeline_spark.operators import graph

    base = "the quick brown fox jumps over the lazy dog again and again"
    docs = [
        (1, base + " !!! ,,, ;;; ..."),  # punct-heavy, short
        (2, base + " " + base + " and then the story simply continues"),
        (3, "completely unrelated content about spark physical plans"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    pairs = dedup.minhash_lsh_pairs(df, "doc_id", "text", threshold=0.4)
    got_pairs = {(r.doc_a, r.doc_b) for r in pairs.collect()}
    assert (1, 2) in got_pairs  # fixture really is a near-dup cluster

    comp = graph.connected_components(pairs, src="doc_a", dst="doc_b")
    q = T.quality_features(F.col("text"), T.tokenize(F.col("text")))
    scored = df.select(
        "doc_id",
        F.round(q["quality_score"], 6).cast("decimal(18,6)").alias("qs"),
    )
    from pyspark.sql.window import Window as W

    mem = comp.select(
        F.col("vertex").alias("doc_id"), F.col("component").alias("cluster")
    ).join(scored, "doc_id")
    rk = F.row_number().over(
        W.partitionBy("cluster").orderBy(F.col("qs").desc(), F.col("doc_id"))
    )
    kept = {
        r.doc_id: r.keep
        for r in mem.select("doc_id", (rk == 1).alias("keep")).collect()
    }
    assert kept == {1: False, 2: True}  # quality wins over min-id


def test_cross_doc_spans_match_python_reference_randomized(spark):
    """ll65 vs a brute-force Python reference on random corpora: for
    every doc, the reference marks exactly the 8-gram start positions
    whose gram occurs in >= 2 distinct docs, merges consecutive runs,
    and the operator must return identical span sets. Seeded RNG, two
    corpus draws."""
    import random
    import re

    for seed in (5, 11):
        rng = random.Random(seed)
        vocab = [f"w{i}" for i in range(30)]  # small vocab -> collisions
        docs = []
        for i in range(25):
            n = rng.randrange(8, 40)
            docs.append((i, " ".join(rng.choice(vocab) for _ in range(n))))
        # plant one explicit shared run at random offsets
        run = " ".join(rng.choice(vocab) for _ in range(12))
        docs.append((100, "x1 x2 " + run))
        docs.append((101, run + " y1 y2 y3"))

        # python reference
        grams = {}
        toks = {}
        for i, t in docs:
            w = [x for x in re.split(r"[^a-z0-9]+", t.lower()) if x]
            toks[i] = w
            for p in range(len(w) - 7):
                g = " ".join(w[p : p + 8])
                grams.setdefault(g, set()).add(i)
        expect = set()
        for i, _ in docs:
            hits = sorted(
                p
                for p in range(len(toks[i]) - 7)
                if len(grams[" ".join(toks[i][p : p + 8])]) >= 2
            )
            start = None
            prev = None
            for p in hits + [None]:
                if p is not None and prev is not None and p == prev + 1:
                    prev = p
                    continue
                if prev is not None:
                    expect.add((i, start, prev + 7, prev + 7 - start + 1))
                start = prev = p
        df = spark.createDataFrame(docs, "doc_id long, text string")
        got = {
            (r.doc_id, r.span_start, r.span_end, r.span_tokens)
            for r in dedup.cross_doc_repeated_spans(
                df, "doc_id", "text", min_len=8, min_docs=2
            ).collect()
        }
        assert got == expect, (seed, got ^ expect)


def test_minhash_calibration_planted_and_error_bound(spark, sf_dir):
    """ll72's operator: planted exact copies must calibrate perfectly
    (est = exact = 1.0, err = 0), and the mean estimator error over
    the whole candidate population must respect the MinHash variance
    bound (E|est-J| ~ sqrt(J(1-J)/64) <= 1/16, with slack)."""
    import statistics

    aug = _augmented(spark, sf_dir)
    cal = dedup.minhash_estimate_calibration(
        aug, "doc_id", "text", max_shingle_df=0.5
    ).collect()
    assert cal
    planted = [r for r in cal if r.doc_b == r.doc_a + 1000000]
    assert planted, "candidates should include the planted copies"
    for r in planted:
        assert r.est_jaccard == 1.0
        assert r.exact_jaccard == 1.0
        assert r.abs_err == 0.0
    assert all(0.0 <= r.est_jaccard <= 1.0 for r in cal)
    assert statistics.mean(r.abs_err for r in cal) < 0.15


def test_temperature_rates_flatten_language_distribution(spark, sf_dir):
    """ll71: rate ∝ n^(alpha-1) is strictly decreasing in language
    count — the head language gets the smallest rate, the rarest
    language is kept whole (capped at 1.0), every rate in (0, 1]."""
    from flink_luad_pipeline_spark.plans.llm_queries import (
        ll71_temperature_sample,
    )

    rows = ll71_temperature_sample(spark, sf_dir).collect()
    assert rows
    rate_by_lang = {r.lang: r.rate for r in rows}
    counts = {
        r["lang"]: r["n"]
        for r in load(spark, sf_dir, "documents")
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert set(rate_by_lang) <= set(counts)
    for lang, rate in rate_by_lang.items():
        assert 0.0 < rate <= 1.0
    head = max(counts, key=counts.get)
    tail = min(counts, key=counts.get)
    assert rate_by_lang[head] == min(rate_by_lang.values())
    assert rate_by_lang[head] < 1.0
    # flattening law: uncapped rates scale as n^(alpha-1), so the
    # tail/head rate ratio equals (n_head/n_tail)^0.7 — the rarest
    # language is kept at a strictly higher rate than the head
    assert rate_by_lang[tail] > rate_by_lang[head]
    if rate_by_lang[tail] < 1.0:  # cap not binding on this fixture
        assert (
            abs(
                rate_by_lang[tail] / rate_by_lang[head]
                - (counts[head] / counts[tail]) ** 0.7
            )
            < 1e-3
        )


def test_soft_dedup_weights_conserve_cluster_mass(spark, sf_dir):
    """ll74: every doc with a planted copy sits in a cluster of >= 2
    (weight <= 0.5); weight is exactly round(1/cluster_size, 6); and
    the doc count at each cluster_size is divisible by that size
    (clusters are whole)."""
    from collections import Counter

    from flink_luad_pipeline_spark.plans.llm_queries import (
        ll74_soft_dedup_weights,
    )

    rows = ll74_soft_dedup_weights(spark, sf_dir).collect()
    by_id = {r.doc_id: r for r in rows}
    copies = [d for d in by_id if d >= 1000000]
    assert copies, "augmented corpus should contain planted copies"
    for c in copies:
        assert by_id[c].cluster_size >= 2
        assert by_id[c].weight <= 0.5
        orig = c - 1000000
        assert by_id[orig].cluster_size == by_id[c].cluster_size
    for r in rows:
        assert r.weight == round(1.0 / r.cluster_size, 6)
    size_counts = Counter(r.cluster_size for r in rows)
    for size, n_docs in size_counts.items():
        assert n_docs % size == 0, (size, n_docs)


def test_bigram_lm_matches_python_reference(spark):
    """ll73's operator on a hand-checkable corpus: exact score parity
    with a pure-Python Jelinek-Mercer reference, single-token docs
    drop out, and the repetitive doc scores as more predictable than
    the all-unique one."""
    import math
    from collections import Counter

    from flink_luad_pipeline_spark.operators import importance

    texts = {1: "a b a b a b", 2: "c d e f", 3: "x"}
    df = spark.createDataFrame(
        [(k, v) for k, v in texts.items()], ["doc_id", "text"]
    )
    got = {
        r.doc_id: (r.n_bigrams, r.avg_neg_logprob)
        for r in importance.bigram_lm_scores(df, "doc_id", "text").collect()
    }
    toks = {k: v.split() for k, v in texts.items()}
    uni = Counter(t for ts in toks.values() for t in ts)
    n = sum(uni.values())
    bi = Counter(
        (ts[i], ts[i + 1]) for ts in toks.values() for i in range(len(ts) - 1)
    )
    for d, ts in toks.items():
        events = [(ts[i], ts[i + 1]) for i in range(len(ts) - 1)]
        if not events:
            assert d not in got
            continue
        ref = sum(
            -math.log(0.7 * bi[e] / uni[e[0]] + 0.3 * uni[e[1]] / n)
            for e in events
        ) / len(events)
        nb, score = got[d]
        assert nb == len(events)
        assert abs(score - round(ref, 6)) < 1e-9


def test_frame_dedup_planted_copies(spark, sf_dir):
    """ll75: every planted copy (same text => same payload) must
    duplicate all 4 sampled frames of its original; keeper is the
    original (doc_id < 1e6); fingerprint groups never mix docs with
    different texts (md5 frames collide only on identical content)."""
    from flink_luad_pipeline_spark.plans.llm_queries import ll75_frame_dedup

    rows = ll75_frame_dedup(spark, sf_dir).collect()
    assert rows
    copied = [
        r.doc_id
        for r in load(spark, sf_dir, "documents")
        .where((F.col("doc_id") % 10 == 0) & (F.col("doc_id") < 100))
        .select("doc_id")
        .collect()
    ]
    # 4 sampled frames per copied doc, each a (orig, copy) group
    assert len(rows) == 4 * len(copied)
    for r in rows:
        assert r.n_docs == 2
        assert r.n_frames == 2
        assert r.keeper_doc in copied
        assert r.keeper_frame in (0, 5, 10, 15)


def test_jl_projection_norm_concentration(spark, sf_dir):
    """ll76: the JL lemma's promise on the fixture — norm ratios
    concentrate around 1 (each is a chi-like average of k=16 squared
    N(0,1)-ish terms): mean in [0.8, 1.2], every ratio positive and
    below 2.5."""
    import statistics

    from flink_luad_pipeline_spark.operators import similarity as sim

    rows = sim.jl_project(
        load(spark, sf_dir, "embeddings"), "vec_id", "embedding"
    ).collect()
    assert rows
    ratios = [r.norm_ratio for r in rows]
    assert all(0.0 < x < 2.5 for x in ratios)
    assert 0.8 < statistics.mean(ratios) < 1.2
    assert all(len(r.proj) == 16 for r in rows)


def test_logistic_irls_learns_separable_fixture(spark):
    """c8's trainer on a linearly separable 1-D problem: y = 1 iff
    x > 0.5 (margin 0.2). Three Newton steps must yield a boundary
    inside the margin (perfect training accuracy) with b1 > 0."""
    from flink_luad_pipeline_spark.ml import logistic_irls_1d

    rows = [(1.0, 0.6 + 0.05 * i) for i in range(8)] + [
        (0.0, 0.4 - 0.05 * i) for i in range(8)
    ]
    d = spark.createDataFrame(rows, "y double, x double")
    w = logistic_irls_1d(d, steps=3).collect()[0]
    assert w.b1 > 0
    boundary = -w.b0 / w.b1
    assert 0.4 < boundary < 0.6
    scored = d.withColumn(
        "pred",
        (F.lit(w.b0) + F.lit(w.b1) * F.col("x") > 0).cast("double"),
    )
    assert scored.where(F.col("pred") != F.col("y")).count() == 0


def test_kneser_ney_matches_python_reference_and_sums_to_one(spark):
    """ll80's operator on a hand-checkable corpus: exact score parity
    with a pure-Python KN reference, AND the KN distribution property
    — sum_w P_KN(w|v) over the full vocabulary (unseen bigrams
    included) equals 1 for every context v."""
    import math
    from collections import Counter

    from flink_luad_pipeline_spark.operators import importance

    texts = {1: "a b a b a b", 2: "c d e f a", 3: "x"}
    df = spark.createDataFrame(
        [(k, v) for k, v in texts.items()], ["doc_id", "text"]
    )
    got = {
        r.doc_id: (r.n_bigrams, r.avg_neg_logprob)
        for r in importance.kneser_ney_bigram_scores(
            df, "doc_id", "text"
        ).collect()
    }
    toks = {k: v.split() for k, v in texts.items()}
    d = 0.75
    bi = Counter(
        (ts[i], ts[i + 1]) for ts in toks.values() for i in range(len(ts) - 1)
    )
    cp = Counter()
    fanv = Counter()
    contw = Counter()
    for (v, w), c in bi.items():
        cp[v] += c
        fanv[v] += 1
        contw[w] += 1
    b_total = len(bi)

    def p_kn(v, w):
        return max(bi[(v, w)] - d, 0.0) / cp[v] + d * fanv[v] / cp[v] * contw[
            w
        ] / b_total

    # distribution property: sums to 1 over the continuation vocab
    vocab = set(contw)
    for v in cp:
        assert abs(sum(p_kn(v, w) for w in vocab) - 1.0) < 1e-12

    for doc, ts in toks.items():
        events = [(ts[i], ts[i + 1]) for i in range(len(ts) - 1)]
        if not events:
            assert doc not in got
            continue
        ref = sum(-math.log(p_kn(*e)) for e in events) / len(events)
        nb, score = got[doc]
        assert nb == len(events)
        assert abs(score - round(ref, 6)) < 1e-9


def test_sq8_reconstruction_bounds(spark, sf_dir):
    """ll78: every code in [0,255]; per-component |v - dequant| <=
    scale/2 (half a quantization step, the round-half-up guarantee);
    recon cosine near 1 on the fixture."""
    from flink_luad_pipeline_spark.operators import similarity as sim

    emb = load(spark, sf_dir, "embeddings")
    rows = sim.sq8_quantize(emb, "vec_id", "embedding").collect()
    assert rows
    orig = {r.vec_id: r.embedding for r in emb.collect()}
    for r in rows:
        assert all(0 <= c <= 255 for c in r.codes)
        assert r.recon_cos > 0.995
        v = [float(x) for x in orig[r.vec_id]]
        mn, mx = min(v), max(v)
        scale = (mx - mn) / 255.0
        for x, c in zip(v, r.codes):
            deq = mn + c * scale
            assert abs(x - deq) <= scale / 2 + 1e-12


def test_hashed_embeddings_unit_norm_and_determinism(spark, sf_dir):
    """ll81: every emitted embedding is 64-dim and L2-normalized
    (within 6dp component rounding); n_tokens matches the tokenizer;
    two invocations are bit-identical (hash-derived, no RNG)."""
    import math as m

    from flink_luad_pipeline_spark.functions.text import tokenize
    from flink_luad_pipeline_spark.operators import similarity as sim

    # deterministic slice, not limit(): limit without an ordering may
    # pick different rows on each action, and this test collects the
    # frame three times (ADVICE r10 flake class)
    docs = load(spark, sf_dir, "documents").where(F.col("doc_id") < 200)
    a = sim.hashed_embeddings(docs, "doc_id", "text").collect()
    assert a
    ntok = {
        r.doc_id: r.n
        for r in docs.select(
            "doc_id", F.size(tokenize(F.col("text"))).alias("n")
        ).collect()
    }
    for r in a:
        assert len(r.embedding) == 64
        assert r.n_tokens == ntok[r.doc_id]
        nrm = m.sqrt(sum(x * x for x in r.embedding))
        if nrm > 0:
            assert abs(nrm - 1.0) < 1e-4
    b = {r.doc_id: r.embedding for r in
         sim.hashed_embeddings(docs, "doc_id", "text").collect()}
    assert all(b[r.doc_id] == r.embedding for r in a)


def test_persisted_index_hasher_mismatch_rejected(spark, sf_dir, tmp_path):
    """ADVICE r5: a snapshot index built with one hasher probed with
    another never collides across sets — every cross-set near-dup
    silently missed. build_minhash_index tags its artifacts in column
    metadata (parquet-persistent); the probe validates the tag."""
    import pytest

    corpus = _augmented(spark, sf_dir).where(F.col("doc_id") < 50)
    sh, banded = dedup.build_minhash_index(
        corpus, "doc_id", "text", k=3, hasher="fast"
    )
    assert dedup.index_hasher(banded, "bhash") == "fast"
    assert dedup.index_hasher(sh, "sig") == "fast"

    # the tag survives a parquet round-trip
    banded.write.mode("overwrite").parquet(str(tmp_path / "b.parquet"))
    back = spark.read.parquet(str(tmp_path / "b.parquet"))
    assert dedup.index_hasher(back, "bhash") == "fast"

    with pytest.raises(ValueError, match="hasher"):
        dedup.minhash_dedup_incremental(
            corpus, corpus, "doc_id", "text",
            snapshot_index=(sh, banded), hasher="portable",
        )

    from flink_luad_pipeline_spark.streaming import ops as sops

    with pytest.raises(ValueError, match="hasher"):
        sops.neardup_probe_stream(corpus, sh, banded)


def test_cross_doc_spans_fast_hasher_agrees(spark):
    """ADVICE r5: the full-width xxhash64 gram key ("fast", the
    collision-safe 100 TB path) must find the identical spans as the
    portable 40-bit key on a collision-free fixture."""
    shared = " ".join(f"s{i}" for i in range(12))
    docs = [
        (1, "a1 a2 a3 " + shared + " a4 a5"),
        (2, shared + " b1 b2 b3 b4"),
        (3, " ".join(f"d{i}" for i in range(20))),
    ]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    want = {
        tuple(r)
        for r in dedup.cross_doc_repeated_spans(
            df, "doc_id", "text", min_len=8, hasher="portable"
        ).collect()
    }
    got = {
        tuple(r)
        for r in dedup.cross_doc_repeated_spans(
            df, "doc_id", "text", min_len=8, hasher="fast"
        ).collect()
    }
    assert got == want and len(got) == 2
    prof = {
        tuple(r)
        for r in dedup.gram_duplication_profile(
            df, "doc_id", "text", min_len=8, hasher="fast"
        ).collect()
    }
    prof_p = {
        tuple(r)
        for r in dedup.gram_duplication_profile(
            df, "doc_id", "text", min_len=8, hasher="portable"
        ).collect()
    }
    assert prof == prof_p


def test_logistic_irls_degenerate_inputs_stay_finite(spark):
    """ADVICE r5: constant x makes the 2x2 Hessian singular (det = 0);
    the Newton step must keep the previous betas instead of emitting
    NULL/NaN that poisons downstream accuracy columns."""
    import math

    from flink_luad_pipeline_spark.ml import logistic_irls_1d

    d = spark.createDataFrame(
        [(1.0, 2.5), (0.0, 2.5), (1.0, 2.5), (0.0, 2.5)], ["y", "x"]
    )
    w = logistic_irls_1d(d, steps=3).collect()[0]
    assert w.b0 is not None and w.b1 is not None
    assert math.isfinite(w.b0) and math.isfinite(w.b1)
    # with a singular Hessian from step 1, betas never move off 0
    assert w.b0 == 0.0 and w.b1 == 0.0


def test_compression_stack_recall_scorecard(spark, sf_dir):
    """VERDICT r5 item 7: ONE recall@10 scorecard across the whole
    embedding-compression/index stack against the ll8 brute-force
    ground truth — the table a 100 TB user picks an index tier by
    (mirrored in README.md). Pins a floor per tier plus the ordering
    relations that justify each tier's existence: SQ8 is near-lossless
    (8-bit per-vector range quantization barely moves cosines), the
    trained coarse quantizer beats the mod-sampled one composed with
    PQ, and JL 64->16 on these near-random fixture vectors loses most
    neighbors (the JL lemma's epsilon ~ sqrt(ln n / k) is large at
    k=16 — the honest reading: JL is a storage/scan-cost lever, to be
    recall-validated per corpus, exactly what this scorecard is for)."""
    from flink_luad_pipeline_spark.operators import clustering

    emb = load(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 20)
    exact10: dict[int, set[int]] = {}
    for r in similarity.brute_force_topk(queries, emb, k=10).collect():
        exact10.setdefault(r.query_id, set()).add(r.cand_id)

    def recall(rows) -> float:
        got: dict[int, set[int]] = {}
        for r in rows:
            got.setdefault(r.query_id, set()).add(r.cand_id)
        per_q = [len(exact10[q] & got.get(q, set())) / 10 for q in exact10]
        return sum(per_q) / len(per_q)

    def jl(df):
        return similarity.jl_project(
            df, "vec_id", "embedding", dim=64, k=16
        ).select("vec_id", F.col("proj").alias("embedding"))

    def sq8_deq(df):
        q = similarity.sq8_quantize(df, "vec_id", "embedding")
        return q.select(
            "vec_id",
            F.transform(
                "codes",
                lambda c: F.col("zero_point")
                + c.cast("double") * F.col("scale"),
            ).alias("embedding"),
        )

    cents = clustering.kmeans_fit(emb, k=20, iters=3).select(
        F.col("cid").alias("centroid_id"), F.col("cv").alias("centv")
    )
    # (tier, bytes/vector vs 256 B float32 baseline, recall floor)
    score = {
        "sq8_brute": recall(
            similarity.brute_force_topk(sq8_deq(queries), sq8_deq(emb), k=10)
            .collect()
        ),
        "ivf_trained": recall(
            similarity.ivf_topk(queries, emb, k=10, centroids=cents)
            .collect()
        ),
        "ivfpq_trained": recall(
            similarity.ivfpq_topk(queries, emb, k=10, centroids=cents)
            .collect()
        ),
        "ivfpq_mod": recall(
            similarity.ivfpq_topk(
                queries, emb, k=10, centroid_mod=25
            ).collect()
        ),
        "ivfpq_residual": recall(
            similarity.residual_ivfpq_topk(
                queries, emb, k=10, centroids=cents
            ).collect()
        ),
        "ivfpq_residual_trained": recall(
            similarity.residual_ivfpq_topk(
                queries, emb, k=10, centroids=cents, train_iters=2
            ).collect()
        ),
        "jl16_brute": recall(
            similarity.brute_force_topk(jl(queries), jl(emb), k=10).collect()
        ),
        "jl16_sq8_brute": recall(
            similarity.brute_force_topk(
                sq8_deq(jl(queries)), sq8_deq(jl(emb)), k=10
            ).collect()
        ),
    }
    # floors (measured on the sf0.001 fixture: 0.99 / 0.855 / 0.275 /
    # 0.135 / 0.385 / 0.455 / 0.14 / 0.14 — set with slack for other
    # sf fixtures)
    assert score["sq8_brute"] >= 0.9
    assert score["ivf_trained"] >= 0.6
    assert score["ivfpq_trained"] >= 0.1
    assert score["ivfpq_residual"] >= 0.25
    assert score["ivfpq_residual_trained"] >= 0.3
    assert score["jl16_brute"] >= 0.05
    assert score["jl16_sq8_brute"] >= 0.05
    # ordering relations — each tier's reason to exist
    assert score["sq8_brute"] >= score["ivf_trained"]  # 4x, near-lossless
    assert score["ivfpq_trained"] > score["ivfpq_mod"]  # training helps
    # residual encoding beats raw-vector PQ at the same code budget
    # (FAISS IVFPQ's reason to exist), and codebook training does not
    # give it back (small slack: 20 queries x 10 is a noisy fixture)
    assert score["ivfpq_residual"] >= score["ivfpq_trained"] + 0.05
    assert score["ivfpq_residual_trained"] >= score["ivfpq_residual"] - 0.05
    # SQ8 on top of JL costs (almost) nothing beyond JL itself
    assert abs(score["jl16_sq8_brute"] - score["jl16_brute"]) <= 0.1


def test_image_ahash_robust_to_jitter_exact_dedup_is_not(spark, sf_dir):
    """ll90's point: the +1-subpixel jittered re-encode has DIFFERENT
    bytes (exact/byte dedup misses every pair) but the SAME perceptual
    aHash for the vast majority of images (only near-threshold pixels
    can flip). Pins both facts."""
    from flink_luad_pipeline_spark.catalog import load
    from flink_luad_pipeline_spark.operators import multimodal

    docs = load(spark, sf_dir, "documents").where(F.col("doc_id") < 200)
    orig = multimodal.attach_image_payload(docs, "doc_id", "text")
    jit = multimodal.attach_image_payload_jittered(docs, "doc_id", "text")
    # bytes differ for every pair -> exact dedup finds nothing
    both = orig.unionByName(jit).select(
        (F.col("doc_id") % 1000000).alias("base"), F.md5("payload").alias("fp")
    )
    exact_groups = (
        both.groupBy("base", "fp").count().where(F.col("count") >= 2).count()
    )
    assert exact_groups == 0
    # perceptual hash matches for most pairs
    ah = multimodal.image_ahash(orig.unionByName(jit)).select(
        (F.col("doc_id") % 1000000).alias("base"), "ahash"
    )
    n_docs = docs.count()
    matched = (
        ah.groupBy("base", "ahash").count().where(F.col("count") == 2).count()
    )
    assert matched >= 0.8 * n_docs, (matched, n_docs)


def test_image_ahash_sub8px_dimension_occupancy(spark):
    """ADVICE r7: a >64-pixel image with a dimension under 8 px leaves
    8×8 grid cells with NO source pixels; their vacuous 0 >= 0 compare
    must not set phantom bits. For a 40×2 image only grid rows 0 and 4
    receive pixels (np.arange(2)*8//2 = [0, 4]) — every bit outside
    those 16 cells must be 0, and the real content must still set at
    least one bit (left half bright, right half dark)."""
    from flink_luad_pipeline_spark.operators import multimodal

    w, h = 40, 2
    # left half bright (200), right half dark (10), RGB
    row = bytes([200] * (3 * (w // 2)) + [10] * (3 * (w - w // 2)))
    payload = f"P6\n{w} {h}\n255\n".encode() + row * h
    df = spark.createDataFrame(
        [(1, bytearray(payload))], "doc_id bigint, payload binary"
    )
    ah = multimodal.image_ahash(df).collect()[0].ahash
    bits = ah & ((1 << 64) - 1)  # undo two's-complement view
    occupied = {r * 8 + c for r in (0, 4) for c in range(8)}
    set_bits = {i for i in range(64) if bits >> i & 1}
    assert set_bits, "bright half must set at least one occupied bit"
    assert set_bits <= occupied, (
        f"phantom bits in unoccupied cells: {sorted(set_bits - occupied)}"
    )


def test_image_resize_pooled_general_dims(spark):
    """ll102's pooling kernel on non-square, non-divisible dims: a
    40×2 image pooled to 2×2 must collect each cell's exact 20×1
    block per channel (left half bright, right half dark — known
    floor-averages), and a 3×3 → 2×2 pool must handle the uneven
    2/1-pixel splits the integer grid produces."""
    from flink_luad_pipeline_spark.operators import multimodal

    w, h = 40, 2
    row = bytes([200, 100, 50] * (w // 2) + [10, 20, 30] * (w - w // 2))
    p1 = f"P6\n{w} {h}\n255\n".encode() + row * h
    # 3x3 grayscale-ish: pixel (r,c) value r*3+c on all channels
    p2 = b"P6\n3 3\n255\n" + bytes(
        v for r in range(3) for c in range(3) for v in [r * 3 + c] * 3
    )
    df = spark.createDataFrame(
        [(1, bytearray(p1)), (2, bytearray(p2))],
        "doc_id bigint, payload binary",
    )
    out = {
        (r.doc_id, r.pos): r.value
        for r in multimodal.image_resize_pooled(df, 2, 2).collect()
    }
    # image 1: rows [0,1] -> cells rows 0/1; cols 0..19 -> 0, 20..39 -> 1
    for cell, rgb in [(0, (200, 100, 50)), (1, (10, 20, 30)),
                      (2, (200, 100, 50)), (3, (10, 20, 30))]:
        for ch in range(3):
            assert out[(1, cell * 3 + ch)] == rgb[ch], (cell, ch)
    # image 2: rows/cols map 0,0,1 -> cell(0,0) = pixels {0,1,3,4},
    # cell(0,1) = {2,5}, cell(1,0) = {6,7}, cell(1,1) = {8}
    expected = {0: (0 + 1 + 3 + 4) // 4, 1: (2 + 5) // 2,
                2: (6 + 7) // 2, 3: 8}
    for cell, v in expected.items():
        for ch in range(3):
            assert out[(2, cell * 3 + ch)] == v, (cell, ch)


def test_multimodal_gate_catches_each_tiers_blind_spot(spark, sf_dir):
    """ll103's point: every C copy (+2e6, exact text / different
    image) is caught by the TEXT tier and essentially never by the
    image tier; B copies (+1e6, edited text / re-encoded image) are
    caught by the IMAGE tier for the vast majority (near-threshold
    jitter flips are the known exception, as in ll90) and never by
    the text tier against their originals."""
    from flink_luad_pipeline_spark.plans.llm_queries import (
        ll103_multimodal_dedup_gate,
    )

    rows = ll103_multimodal_dedup_gate(spark, sf_dir).collect()
    n = len(rows) // 3
    b = [r for r in rows if 1000000 <= r.doc_id < 2000000]
    c = [r for r in rows if r.doc_id >= 2000000]
    assert len(b) == len(c) == n
    # C: text tier catches every one (its keeper is the original)
    assert all(r.text_dup_of == r.doc_id - 2000000 for r in c)
    # B: the text tier must NOT see the original as a dup (the text
    # was edited); the image tier catches >= 80% (jitter flips allowed)
    assert all(r.text_dup_of != r.doc_id - 1000000 for r in b)
    img_caught = sum(
        1 for r in b if r.image_dup_of == r.doc_id - 1000000
    )
    assert img_caught >= 0.8 * n, (img_caught, n)
    # the gate conjunction: kept <=> neither tier fired
    for r in rows:
        assert r.kept == (
            r.text_dup_of is None and r.image_dup_of is None
        )


def test_curation_pipeline_every_stage_acts(spark, sf_dir):
    """ll94's planted fixture must be observably processed by every
    stage: exact copies (+1e6) gone, near copies (+2e6) gone,
    boilerplate-carrying survivors lose >= the 11 planted tokens, and
    the packing invariants hold (offsets advance by cleaned lengths
    in doc_id order, modulo the 2048 budget)."""
    from flink_luad_pipeline_spark.plans.llm_queries import (
        _LL94_PACK,
        ll94_curation_pipeline,
    )

    rows = sorted(
        ll94_curation_pipeline(spark, sf_dir).collect(),
        key=lambda r: r.doc_id,
    )
    assert rows, "pipeline should keep some documents"
    ids = {r.doc_id for r in rows}
    # stage 2+3: no planted copy may survive (its original is the
    # min-id keeper/canonical in both tiers)
    assert not {i for i in ids if i >= 1000000}
    # stage 4: survivors whose source doc carried the boilerplate
    # footer must have had it excised — their cleaned token count is
    # strictly below the raw tokenized length of the boilerplated text
    docs = load(spark, sf_dir, "documents")
    from flink_luad_pipeline_spark.functions.text import tokenize

    raw = {
        r.doc_id: r.n_raw
        for r in docs.where(F.col("doc_id") % 7 == 0)
        .select(
            "doc_id", (F.size(tokenize(F.col("text"))) + 11).alias("n_raw")
        )
        .collect()
    }
    boiler_survivors = [r for r in rows if r.doc_id in raw]
    if boiler_survivors:  # the gopher gate may drop them all at tiny SF
        for r in boiler_survivors:
            assert r.n_tokens <= raw[r.doc_id] - 11
    # stage 6: exclusive prefix-sum invariant in doc_id order
    cum = 0
    for r in rows:
        assert r.pack_id == cum // _LL94_PACK
        assert r.pack_offset == cum % _LL94_PACK
        cum += r.n_tokens


def test_semantic_dedup_sized_matches_centroid_tier_quality(spark, sf_dir):
    """ll96's constant-cell-population tier must be SOUND (every drop's
    dup_of is a genuine >=threshold neighbor with a smaller id) and
    must not trade away recall vs the O(N^1.5) centroid tier at test
    scale (measured 0.283 vs 0.294 against the exact all-pairs truth
    on the sf0.001 fixture) — the whole point is that it keeps this
    quality while its pair stage scales linearly."""
    emb = load(spark, sf_dir, "embeddings")
    cent = similarity.semantic_dedup(
        emb, threshold=0.35, centroid_mod=None, cells="centroid"
    ).collect()
    sized = similarity.semantic_dedup_sized(
        emb, threshold=0.35, cell_target=64
    ).collect()
    # exact ground truth: every vector with ANY lower-id neighbor at
    # >= threshold (n_planes=0 degenerates to the all-pairs join)
    truth = {
        r.doc_b
        for r in similarity.lsh_neardup_pairs(
            emb, threshold=0.35, n_planes=0, n_tables=1
        ).collect()
    }
    assert truth, "fixture should contain >=threshold neighbors"
    dc = {r.vec_id for r in cent if r.dropped}
    ds = {r.vec_id: r.dup_of for r in sized if r.dropped}
    # soundness: verified against exact cosine, smaller-id keeper
    import math

    vec = {r.vec_id: list(r.embedding) for r in emb.collect()}

    def cos(a, b):
        d = sum(x * y for x, y in zip(a, b))
        return d / (
            math.sqrt(sum(x * x for x in a)) * math.sqrt(sum(y * y for y in b))
        )

    for v, keeper in ds.items():
        assert keeper < v
        assert round(cos(vec[v], vec[keeper]), 6) >= 0.35
    # recall parity with the centroid tier (small slack: cell shapes
    # differ, so individual drops differ — the RATE must not)
    rc = len(dc & truth) / len(truth)
    rs = len(set(ds) & truth) / len(truth)
    assert rs >= rc - 0.1
    assert rs >= 0.15


def test_semantic_dedup_cells_routing(spark, sf_dir):
    """VERDICT r9 item 1: the scale-safe grain is the DEFAULT — a bare
    ``semantic_dedup``/``semantic_decontaminate`` call must route to
    the linear sized-cell machinery EXACTLY (same rows as calling the
    sized tier directly), an unknown grain must fail loudly, and a
    centroid-tier knob passed alongside the sized grain must raise
    instead of being silently dropped (ADVICE r9)."""
    import pytest as _pytest

    # deterministic subset (ADVICE r9: LIMIT without a sort may pick
    # different rows on re-execution across the two plans)
    emb = load(spark, sf_dir, "embeddings").where(F.col("vec_id") < 200)
    bare = similarity.semantic_dedup(emb).collect()
    direct = similarity.semantic_dedup_sized(emb).collect()
    assert sorted(map(tuple, bare)) == sorted(map(tuple, direct))

    is_eval = F.col("vec_id") % 10 == 0
    dbare = similarity.semantic_decontaminate(emb, is_eval).collect()
    ddirect = similarity.semantic_decontaminate_sized(emb, is_eval).collect()
    assert sorted(map(tuple, dbare)) == sorted(map(tuple, ddirect))

    with _pytest.raises(ValueError, match="cells"):
        similarity.semantic_dedup(emb, cells="bogus")
    with _pytest.raises(ValueError, match="centroid_mod"):
        similarity.semantic_dedup(emb, centroid_mod=25)  # sized default
    with _pytest.raises(ValueError, match="centroid_mod"):
        similarity.semantic_decontaminate(emb, is_eval, centroid_mod=25)


def test_ivf_family_requires_explicit_grain(spark, sf_dir):
    """VERDICT r9 item 1: the IVF family's coarse grain is REQUIRED —
    a bare call must fail loudly naming the options instead of
    silently taking a superlinear sampling policy, and the "sqrt"
    spelling must reproduce the derived-√N grain exactly."""
    import pytest as _pytest

    emb = load(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 3)
    for fn in (
        similarity.ivf_topk,
        similarity.ivfpq_topk,
        similarity.residual_ivfpq_topk,
    ):
        with _pytest.raises(ValueError, match="centroids"):
            fn(queries, emb, k=5)
    # centroids= and centroid_mod= together is ambiguous -> loud
    cents = emb.where(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("centroid_id"), F.col("embedding").alias("centv")
    )
    with _pytest.raises(ValueError, match="not both"):
        similarity.ivf_topk(queries, emb, k=5, centroid_mod=25, centroids=cents)
    # "sqrt" == the explicit derived modulus, row for row
    mod = similarity.derive_centroid_mod(emb)
    via_sqrt = similarity.ivf_topk(
        queries, emb, k=5, centroid_mod="sqrt"
    ).collect()
    via_mod = similarity.ivf_topk(queries, emb, k=5, centroid_mod=mod).collect()
    assert sorted(map(tuple, via_sqrt)) == sorted(map(tuple, via_mod))


def test_ss21_stream_fold_equals_batch_and_multibatch_invariants(
    spark, sf_dir
):
    """ss21's two contracts (VERDICT r9 item 7). (1) Driven as one
    AvailableNow batch, the streaming day-N run emits EXACTLY ll100's
    batch output. (2) Split into id-ordered micro-batches and folded
    sequentially through the same code path, the INDEX/COUNT state
    artifacts — fps set, band index, gram counts — are batching-
    invariant: equal to the single-fold state artifact for artifact
    (set unions and additive counts over disjoint doc sets; the
    verdict-bearing artifacts follow the ss4/ss10 arrival-order
    contract and are only pinned at the daily grain by the oracle)."""
    from flink_luad_pipeline_spark.plans.llm_queries import (
        _ll100_build_state,
        _ll100_day_n_over,
        _ll100_fixture,
        _ll100_fold_state,
    )
    from flink_luad_pipeline_spark.plans.registry import QUERIES

    streamed = QUERIES["ss21_streaming_incremental_curation"](
        spark, sf_dir
    ).collect()
    batch = QUERIES["ll100_incremental_curation"](spark, sf_dir).collect()
    assert sorted(map(tuple, streamed)) == sorted(map(tuple, batch))
    assert len(streamed) > 0

    # multi-batch fold: split the delta at its median id (id-ordered
    # batches — the monotone-arrival production invariant)
    base, delta, t = _ll100_fixture(spark, sf_dir)
    import tempfile

    tmp = tempfile.mkdtemp(prefix="ss21_multibatch_")
    root1 = _ll100_build_state(spark, base, sf_dir, root=f"{tmp}/single")
    fr_all = _ll100_day_n_over(spark, delta, root1, t)
    single = _ll100_fold_state(spark, root1, fr_all)

    mid = delta.approxQuantile("doc_id", [0.5], 0.0)[0]
    lo = delta.where(F.col("doc_id") <= mid)
    hi = delta.where(F.col("doc_id") > mid)
    root2 = _ll100_build_state(spark, base, sf_dir, root=f"{tmp}/multi")
    fr_lo = _ll100_day_n_over(spark, lo, root2, t)
    m1 = _ll100_fold_state(spark, root2, fr_lo)
    root2b = f"{tmp}/multi_v1"
    for name_, df_ in m1.items():
        df_.write.mode("overwrite").parquet(f"{root2b}/{name_}.parquet")
    lo_max = int(lo.agg(F.max("doc_id")).collect()[0][0])
    fr_hi = _ll100_day_n_over(spark, hi, root2b, lo_max)
    m2 = _ll100_fold_state(spark, root2b, fr_hi)

    for art in ("fps", "sh", "banded", "grams"):
        a = sorted(map(tuple, single[art].collect()))
        b = sorted(map(tuple, m2[art].collect()))
        assert a == b, f"{art} diverged under micro-batching"


def test_persisted_ann_index_equals_in_session_and_guards(spark, sf_dir):
    """ll105's contract (VERDICT r9 item 4): answering top-k from the
    index FRAMES alone must equal the in-session residual_ivfpq_topk
    (index build encodes every candidate; the query path encodes only
    shortlisted ones — same codes, so same answers), and a probe whose
    parameters disagree with the index's meta stamp must refuse loudly
    instead of returning plausible wrong neighbors."""
    import pytest as _pytest

    from flink_luad_pipeline_spark.operators import clustering

    emb = load(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 5)
    cents = clustering.kmeans_fit(emb, k=8, iters=3).select(
        F.col("cid").alias("centroid_id"), F.col("cv").alias("centv")
    )
    in_session = similarity.residual_ivfpq_topk(
        queries, emb, k=10, centroids=cents, train_iters=2, train_mod=4
    ).collect()
    frames = similarity.residual_ann_index_frames(
        emb, centroids=cents, train_iters=2, train_mod=4
    )
    probed = similarity.residual_ann_index_topk(
        queries, frames, k=10, train_iters=2, train_mod=4
    ).collect()
    assert sorted(map(tuple, probed)) == sorted(map(tuple, in_session))
    assert len(probed) > 0
    with _pytest.raises(ValueError, match="meta stamp"):
        similarity.residual_ann_index_topk(
            queries, frames, k=10, m=8, train_iters=2, train_mod=4
        )
    with _pytest.raises(ValueError, match="meta stamp"):
        similarity.residual_ann_index_topk(queries, frames, k=10)  # iters=0


def test_ann_index_delta_fold_is_exact_and_associative(spark, sf_dir):
    """ll106's contract: folding a delta into the persisted ANN index
    must (a) leave the base codes byte-identical (frozen artifacts are
    never retro-edited), (b) cover exactly base ∪ delta afterwards,
    (c) be ASSOCIATIVE — two sequential folds equal one combined fold
    (the pure-per-vector property that makes daily absorption exact at
    any batching), and (d) refuse a params-mismatched fold loudly."""
    import pytest as _pytest

    emb = load(spark, sf_dir, "embeddings")
    base = emb.where(F.col("vec_id") % 5 != 0)
    d1 = emb.where(F.col("vec_id") % 10 == 0)
    d2 = emb.where((F.col("vec_id") % 5 == 0) & (F.col("vec_id") % 10 != 0))
    # mod 23: coprime with the %5 split (a %25 sample of the base
    # slice is empty — every multiple of 25 is a multiple of 5)
    index = similarity.residual_ann_index_frames(
        base, centroid_mod=23, train_iters=0
    )
    base_codes = sorted(map(tuple, index["codes"].collect()))
    assert base_codes, "base index must be non-empty"

    two_step = similarity.residual_ann_index_update(
        similarity.residual_ann_index_update(index, d1), d2
    )
    one_step = similarity.residual_ann_index_update(index, d1.unionAll(d2))
    a = sorted(map(tuple, two_step["codes"].collect()))
    b = sorted(map(tuple, one_step["codes"].collect()))
    assert a == b, "delta fold is not associative"
    # base codes unchanged inside the folded table
    folded_base = [
        r for r in a if r[0] % 5 != 0
    ]
    assert folded_base == base_codes
    # coverage: every non-degenerate vector has m=4 code rows exactly
    ids = {r[0] for r in a}
    n = emb.count()
    assert len(ids) <= n
    from collections import Counter

    per_id = Counter(r[0] for r in a)
    assert set(per_id.values()) == {4}
    # delta side present
    assert any(i % 5 == 0 for i in ids)
    with _pytest.raises(ValueError, match="meta stamp"):
        similarity.residual_ann_index_update(index, d1, m=8)


def test_ann_index_fold_overlap_guard(spark, sf_dir):
    """ADVICE r10 medium: re-folding ids the index already encodes
    would duplicate (cand_id, s, code) rows and the probe's
    groupBy+sum(qd) would silently double-count their ADC partials.
    on_overlap='error' (default) must raise on any overlap —
    including an exact replay of an already-folded batch — and
    on_overlap='skip' must make replay a no-op (idempotent
    at-least-once mode: the folded table is identical to folding
    once)."""
    import pytest as _pytest

    emb = load(spark, sf_dir, "embeddings")
    base = emb.where(F.col("vec_id") % 5 != 0)
    d1 = emb.where(F.col("vec_id") % 10 == 0)
    index = similarity.residual_ann_index_frames(
        base, centroid_mod=23, train_iters=0
    )
    # overlap with the BASE encoding set
    with _pytest.raises(ValueError, match="already encoded"):
        similarity.residual_ann_index_update(
            index, emb.where(F.col("vec_id") % 5 != 0).limit(3)
        )
    once = similarity.residual_ann_index_update(index, d1)
    # replaying the same batch: loud under 'error' ...
    with _pytest.raises(ValueError, match="already encoded"):
        similarity.residual_ann_index_update(once, d1)
    # ... and a no-op under 'skip'
    replay = similarity.residual_ann_index_update(once, d1, on_overlap="skip")
    assert sorted(map(tuple, replay["codes"].collect())) == sorted(
        map(tuple, once["codes"].collect())
    )


def test_trained_fold_partition_accumulation_is_batching_invariant(
    spark, sf_dir, tmp_path
):
    """ss23's O(delta) write path at the DataFrame+parquet level:
    sequential per-batch codes partitions — each encoded against the
    index VIEW including all prior partitions (exactly the foreachBatch
    loop) — must accumulate to the one-shot fold's codes table, and
    the probe over the multi-partition read must equal the probe over
    the one-shot fold (the partition layout is invisible to the
    answer). Exercises the encode→write→extend-read-list cycle the
    streaming row drives, without streaming overhead."""
    from flink_luad_pipeline_spark.operators import clustering

    emb = load(spark, sf_dir, "embeddings")
    base = emb.where(F.col("vec_id") % 5 != 0)
    delta = emb.where(F.col("vec_id") % 5 == 0)
    cents = clustering.kmeans_fit(base, k=8, iters=3).select(
        F.col("cid").alias("centroid_id"), F.col("cv").alias("centv")
    )
    frames = similarity.residual_ann_index_frames(
        base, centroids=cents, train_iters=2, train_mod=4
    )
    root = str(tmp_path / "idx")
    for nm, df in frames.items():
        df.write.mode("overwrite").parquet(f"{root}/{nm}.parquet")
    index = {
        nm: spark.read.parquet(f"{root}/{nm}.parquet") for nm in frames
    }
    # three id-split micro-batches partitioning the delta (multiples
    # of 5 are ≡ 0, 5, 10 mod 15)
    paths = [f"{root}/codes.parquet"]
    for i, rem in enumerate((0, 5, 10)):
        cur = dict(index, codes=spark.read.parquet(*paths))
        dc = similarity.residual_ann_index_encode_delta(
            cur, delta.where(F.col("vec_id") % 15 == rem),
            train_iters=2, train_mod=4,
        )
        p = f"{root}/codes_b{i}.parquet"
        dc.write.mode("overwrite").parquet(p)
        paths.append(p)
    multi = dict(index, codes=spark.read.parquet(*paths))
    oneshot = similarity.residual_ann_index_update(
        index, delta, train_iters=2, train_mod=4
    )
    assert sorted(map(tuple, multi["codes"].collect())) == sorted(
        map(tuple, oneshot["codes"].collect())
    )
    qv = emb.where(F.col("vec_id") < 5)
    a = similarity.residual_ann_index_topk(
        qv, multi, k=10, train_iters=2, train_mod=4
    ).collect()
    b = similarity.residual_ann_index_topk(
        qv, oneshot, k=10, train_iters=2, train_mod=4
    ).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    assert a, "probe must return rows"
    # compaction: persisting the accumulated view to a fresh root
    # collapses the partition list without changing a single answer
    # row (the _ll100_compact_state retention device for the ANN tier)
    compact = similarity.residual_ann_index_persist(
        multi, str(tmp_path / "compact")
    )
    c = similarity.residual_ann_index_topk(
        qv, compact, k=10, train_iters=2, train_mod=4
    ).collect()
    assert sorted(map(tuple, c)) == sorted(map(tuple, a))
    assert sorted(map(tuple, compact["codes"].collect())) == sorted(
        map(tuple, multi["codes"].collect())
    )


def test_ann_recall_drift_detected_on_shifted_delta(spark):
    """ll108's reason to exist (VERDICT r10 item 3): the incremental
    fold is exact w.r.t. its frozen quantizers, so the failure mode is
    never fold arithmetic — it is the quantizers' FIT decaying as
    folded deltas drift from the base training distribution, and the
    documented re-train trigger is recall decay on a probe set. Built
    on a hand-planted clustered corpus (seeded, fully deterministic):
    base = 6 well-separated clusters the quantizers train on; an
    UNDRIFTED delta adds points inside those clusters; a DRIFTED delta
    adds points in two UNSEEN clusters. The recall probe over the
    drifted snapshot must read materially lower than over the
    undrifted one — the decay the detector exists to emit."""
    import random

    rng = random.Random(42)
    dim = 64

    def pt(c):
        v = [rng.uniform(-0.05, 0.05) for _ in range(dim)]
        v[c] += 1.0
        return v

    vid = 0
    base_rows, ok_rows, dr_rows = [], [], []
    for c in range(6):
        for _ in range(40):
            base_rows.append((vid, pt(c))); vid += 1
    for c in range(6):
        for _ in range(10):
            ok_rows.append((vid, pt(c))); vid += 1
    for c in (6, 7):
        for _ in range(30):
            dr_rows.append((vid, pt(c))); vid += 1
    schema = "vec_id bigint, embedding array<float>"
    base = spark.createDataFrame(base_rows, schema)
    okd = spark.createDataFrame(ok_rows, schema)
    drd = spark.createDataFrame(dr_rows, schema)

    from flink_luad_pipeline_spark.operators import clustering

    cents = clustering.kmeans_fit(base, k=8, iters=3).select(
        F.col("cid").alias("centroid_id"), F.col("cv").alias("centv")
    )
    frames = similarity.residual_ann_index_frames(
        base, centroids=cents, train_iters=2, train_mod=4
    )
    for nm in frames:
        frames[nm] = frames[nm].localCheckpoint(eager=True)

    def mean_recall(delta, probes):
        snap = similarity.residual_ann_index_update(
            frames, delta, train_iters=2, train_mod=4
        )
        rec = similarity.ann_index_recall_probe(
            probes, base.unionByName(delta), snap, k=10,
            train_iters=2, train_mod=4,
        )
        return rec.agg(F.avg("recall_at_k")).collect()[0][0]

    m_ok = mean_recall(okd, okd.where(F.col("vec_id") % 3 == 0))
    m_dr = mean_recall(drd, drd.where(F.col("vec_id") % 3 == 0))
    # measured 0.28 vs 0.13 on this seeded fixture — the detector's
    # alert condition (decay vs the previous snapshot) fires
    assert m_ok >= 0.25, f"undrifted probe unexpectedly weak: {m_ok}"
    assert m_dr <= m_ok - 0.1, f"drift not detected: {m_dr} vs {m_ok}"


def test_component_bridge_detector_fires_on_planted_bridge(spark):
    """ll104's reason to exist (VERDICT r9 item 3): a delta doc whose
    base neighbors span TWO distinct base components must be flagged
    is_bridge (the re-curation trigger), while a delta doc with
    neighbors in one component — and one whose only neighbor is a
    singleton base doc — must not. Built on a hand-planted corpus:
    base components {1,2} (near-dups) and {3,4} (near-dups), singleton
    base doc 5, delta doc 100 = concat of the two component texts
    (J >= 0.4 with members of BOTH), delta doc 101 a near-dup of doc 1
    only, delta doc 102 a near-dup of singleton 5 only."""
    from flink_luad_pipeline_spark.operators import dedup, graph

    xa = " ".join(f"alpha{i} token{i} word{i}" for i in range(12))
    xb = " ".join(f"beta{i} item{i} gram{i}" for i in range(12))
    xc = " ".join(f"solo{i} only{i} one{i}" for i in range(12))
    base = spark.createDataFrame(
        [
            (1, xa),
            (2, xa + " tail marker"),
            (3, xb),
            (4, xb + " tail marker"),
            (5, xc),
        ],
        "doc_id long, text string",
    )
    delta = spark.createDataFrame(
        [
            (100, xa + " " + xb),          # bridges components 1 and 3
            (101, xa + " small edit"),     # one component
            (102, xc + " small edit"),     # singleton base neighbor
        ],
        "doc_id long, text string",
    )
    # 32 bands of 2 hashes: a bridge doc's Jaccard with EACH side is
    # structurally <= 0.5 (it is their union), and the default 16x4
    # banding has ~50% recall there — r=2 bands push candidate recall
    # to ~1 at J≈0.45 so the detector's input is deterministic-complete
    sh, banded = dedup.build_minhash_index(
        base, "doc_id", "text", k=3, bands=32
    )
    bpairs = dedup.minhash_lsh_pairs(
        base, "doc_id", "text", k=3, threshold=0.4, max_shingle_df=None,
        bands=32,
    )
    blab = graph.connected_components(bpairs, src="doc_a", dst="doc_b")
    pairs = dedup.minhash_incremental_pairs(
        None, delta, "doc_id", "text", k=3, threshold=0.4,
        snapshot_index=(sh, banded), bands=32,
    )
    cross = pairs.where(F.col("doc_b") <= 5).select(
        F.col("doc_a").alias("doc_id"), F.col("doc_b").alias("base_id")
    )
    got = {
        r.doc_id: (r.n_base_components, r.is_bridge)
        for r in graph.component_bridges(cross, blab).collect()
    }
    assert got[100] == (2, True), got
    assert got[101] == (1, False), got
    # singleton base doc: label via coalesce(own id), still counted
    assert got[102] == (1, False), got


def test_bridge_recuration_equals_from_scratch_where_incremental_diverges(
    spark,
):
    """ll109's reason to exist (VERDICT r10 item 7): on a planted
    bridge, PLAIN incremental curation keeps BOTH day-0 component
    keepers (it never retro-edits base verdicts), while from-scratch
    over the union keeps only the smaller one — and incremental +
    re-curation must equal from-scratch on every touched base doc.
    Same planted corpus as the detector test: base components {1,2}
    and {3,4}, singleton 5; delta 100 bridges both components, 101
    near-dups doc 1, 102 near-dups singleton 5."""
    from flink_luad_pipeline_spark.operators import dedup, graph

    xa = " ".join(f"alpha{i} token{i} word{i}" for i in range(12))
    xb = " ".join(f"beta{i} item{i} gram{i}" for i in range(12))
    xc = " ".join(f"solo{i} only{i} one{i}" for i in range(12))
    base = spark.createDataFrame(
        [(1, xa), (2, xa + " tail marker"), (3, xb),
         (4, xb + " tail marker"), (5, xc)],
        "doc_id long, text string",
    )
    delta = spark.createDataFrame(
        [(100, xa + " " + xb), (101, xa + " small edit"),
         (102, xc + " small edit")],
        "doc_id long, text string",
    )
    sh, banded = dedup.build_minhash_index(
        base, "doc_id", "text", k=3, bands=32
    )
    bpairs = dedup.minhash_lsh_pairs(
        base, "doc_id", "text", k=3, threshold=0.4, max_shingle_df=None,
        bands=32,
    )
    blab = graph.connected_components(bpairs, src="doc_a", dst="doc_b")
    pairs = dedup.minhash_incremental_pairs(
        None, delta, "doc_id", "text", k=3, threshold=0.4,
        snapshot_index=(sh, banded), bands=32,
    )
    cross = pairs.where(F.col("doc_b") <= 5).select(
        F.col("doc_a").alias("doc_id"), F.col("doc_b").alias("base_id")
    )
    dd = pairs.where(F.col("doc_b") > 5).select("doc_a", "doc_b")
    out = {
        r.doc_id: r
        for r in graph.recurate_bridged_components(
            bpairs, blab, cross, dd
        ).collect()
    }
    # every touched base doc is audited: both bridged components
    # ({1,2} via 100/101, {3,4} via 100) and the singleton 5 (via 102)
    assert set(out) == {1, 2, 3, 4, 5}, sorted(out)
    # from-scratch ground truth: CC over the full union pair graph
    union_pairs = dedup.minhash_lsh_pairs(
        base.unionAll(delta), "doc_id", "text", k=3, threshold=0.4,
        max_shingle_df=None, bands=32,
    )
    scratch = {
        r.vertex: r.component
        for r in graph.connected_components(
            union_pairs, src="doc_a", dst="doc_b"
        ).collect()
    }
    for doc in (1, 2, 3, 4):
        assert out[doc].component_recurated == scratch[doc], doc
        assert out[doc].kept_recurated == (doc == scratch[doc]), doc
    # the divergence itself: doc 3 was a day-0 keeper (kept_day0) that
    # from-scratch DEMOTES once the bridge merges {1,2} with {3,4} —
    # plain incremental would have kept it forever
    assert out[3].kept_day0 is True and out[3].kept_recurated is False
    assert out[3].component_day0 == 3 and out[3].component_recurated == 1
    # the untouched-verdict rows: keeper 1 survives both, follower 2
    # stays dropped, singleton 5 stays kept (102 can't outrank it)
    assert out[1].kept_day0 and out[1].kept_recurated
    assert not out[2].kept_day0 and not out[2].kept_recurated
    assert out[5].kept_day0 and out[5].kept_recurated


def test_incremental_curation_fixture_acts_and_continues_packing(
    spark, sf_dir
):
    """ll100's planted fixture must be observably processed by every
    STATEFUL stage (its from-scratch equality is already driver-pinned
    by the oracle parity test): exact copies of base (+1e7) die
    against the fingerprint snapshot, near copies of base (+2e7) die
    against the persisted band index, within-batch exact (+3e7) and
    near (+4e7) copies die inside the batch, genuinely-new docs
    survive, and the packing slots CONTINUE from the selected-base
    token total (cum starts above 0 and advances by exactly the
    cleaned token counts in doc_id order)."""
    from flink_luad_pipeline_spark.plans.llm_queries import (
        _LL94_PACK,
        ll100_incremental_curation,
    )

    rows = sorted(
        ll100_incremental_curation(spark, sf_dir).collect(),
        key=lambda r: r.doc_id,
    )
    assert rows, "some delta docs must survive"
    ids = {r.doc_id for r in rows}
    assert not {i for i in ids if i >= 10_000_000}, (
        "every planted copy group (+1e7/+2e7/+3e7/+4e7) must be dropped"
    )
    assert any(i < 10_000_000 for i in ids), "new delta docs must survive"
    # packing continuation: first cum = selected-base total > 0, then
    # the exclusive prefix advances by each survivor's token count
    cum = rows[0].pack_id * _LL94_PACK + rows[0].pack_offset
    assert cum > 0, "offsets must continue from the base packing"
    for r in rows:
        assert r.pack_id * _LL94_PACK + r.pack_offset == cum
        cum += r.n_tokens


def test_incremental_state_update_equals_from_scratch(spark, sf_dir):
    """ll100's day-N+1 readiness: folding the delta's artifacts into
    the persisted day-0 state (union fingerprints, union index
    artifacts, additive gram counts, union docs, union features) must
    reproduce the state built FROM SCRATCH over the union corpus —
    exactly, artifact by artifact — so the incremental state never
    degrades across days."""
    from flink_luad_pipeline_spark.plans.llm_queries import (
        _ll100_fixture,
        _ll100_state_frames,
        ll100_updated_state_frames,
    )

    updated = ll100_updated_state_frames(spark, sf_dir)
    base, delta, _t = _ll100_fixture(spark, sf_dir)
    scratch = _ll100_state_frames(base.unionAll(delta))

    def rows(df):
        def norm(v):
            return tuple(v) if isinstance(v, list) else v

        return sorted(tuple(norm(c) for c in r) for r in df.collect())

    for key in ("fps", "banded", "grams", "docs", "feats", "sh"):
        assert rows(updated[key]) == rows(scratch[key]), key


def test_state_fold_write_is_o_delta_and_exact(spark, sf_dir, tmp_path):
    """VERDICT r10 item 2: the persisted-state fold's WRITE path must
    be O(delta) — a fold writes only the batch's delta artifacts as a
    new fold root (``_ll100_fold_delta_frames``), never a wholesale
    state rewrite. Pins (a) bytes written per fold scale with the
    delta (the fold root is a small fraction of the day-0 root, for a
    ~20% delta), (b) the multi-root state VIEW equals the state built
    from scratch over the union corpus — artifact by artifact, the
    same bar as the merged-frames contract — and (c) compaction
    collapses the root list without changing the view (after which the
    superseded roots are dead: the retention rule)."""
    from pathlib import Path

    from flink_luad_pipeline_spark.plans.llm_queries import (
        _ll100_build_state,
        _ll100_compact_state,
        _ll100_day_n_over,
        _ll100_fixture,
        _ll100_fold_delta_frames,
        _ll100_state_frames,
        _ll100_state_reads,
    )

    base, delta, t = _ll100_fixture(spark, sf_dir)
    root = _ll100_build_state(
        spark, base, sf_dir, root=str(tmp_path / "state")
    )
    fr = _ll100_day_n_over(spark, delta, root, t)
    droot = str(tmp_path / "state_d0")
    for name, df in _ll100_fold_delta_frames(fr).items():
        df.write.mode("overwrite").parquet(f"{droot}/{name}.parquet")

    def du(p):
        return sum(
            f.stat().st_size for f in Path(p).rglob("*") if f.is_file()
        )

    d_bytes, s_bytes = du(droot), du(root)
    assert d_bytes < 0.6 * s_bytes, (
        f"fold root wrote {d_bytes}B vs day-0 {s_bytes}B — not O(delta)"
    )

    def rows(df):
        def norm(v):
            return tuple(v) if isinstance(v, list) else v

        return sorted(tuple(norm(c) for c in r) for r in df.collect())

    scratch = _ll100_state_frames(base.unionAll(delta))
    view = _ll100_state_reads(spark, [root, droot])
    for key in ("fps", "banded", "grams", "docs", "feats", "sh"):
        assert rows(view[key]) == rows(scratch[key]), key

    croot = _ll100_compact_state(
        spark, [root, droot], str(tmp_path / "compact")
    )
    compacted = _ll100_state_reads(spark, croot)
    for key in ("fps", "grams", "docs"):
        assert rows(compacted[key]) == rows(scratch[key]), f"compact:{key}"


def test_learned_quality_scorer_beats_majority_class(spark, sf_dir):
    """ll101's point: the learned gate must actually LEARN — train
    agreement with the weak labels must beat the majority-class
    baseline by a real margin (measured 0.792 vs 0.668 at sf0.01, and
    0.81 separability for the prototype cosine; a random ±1 projection
    collapsed to all-keep, which this test exists to catch), and the
    disagreement rows (the classifier generalizing past the rule
    boundary) must appear on both sides."""
    from flink_luad_pipeline_spark.plans.llm_queries import (
        ll101_learned_quality_scorer,
    )

    rows = ll101_learned_quality_scorer(spark, sf_dir).collect()
    n = len(rows)
    assert n > 0
    pos = sum(1 for r in rows if r.weak_label)
    majority = max(pos, n - pos) / n
    agree = sum(1 for r in rows if bool(r.keep) == bool(r.weak_label)) / n
    assert agree >= majority + 0.05, (agree, majority)
    # the gate is not degenerate: both verdicts occur
    keeps = sum(1 for r in rows if r.keep)
    assert 0 < keeps < n


def test_paragraph_dedup_keeps_first_occurrence_only(spark):
    """ll98's operator on a hand fixture: a boilerplate line shared by
    three docs survives only at its first (doc_id, idx); unique lines
    all survive; a doc of only duplicate lines gets a NULL digest."""
    boiler = "subscribe to our newsletter"
    docs = [
        (1, f"alpha one\n{boiler}\nbeta two"),
        (2, f"{boiler}\ngamma three"),
        (3, f"delta four\n{boiler}"),
        (4, boiler),
        (5, "  \n\n"),  # whitespace-only -> zero paragraphs
    ]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    out = {
        r.doc_id: r for r in dedup.paragraph_dedup(df, "doc_id", "text").collect()
    }
    assert out[1].n_paragraphs == 3 and out[1].n_removed == 0
    assert out[2].n_paragraphs == 2 and out[2].n_removed == 1
    assert out[3].n_paragraphs == 2 and out[3].n_removed == 1
    assert out[4].n_paragraphs == 1 and out[4].n_removed == 1
    assert out[4].cleaned_md5 is None  # nothing survives
    assert out[5].n_paragraphs == 0 and out[5].cleaned_md5 is None
    import hashlib

    assert out[2].cleaned_md5 == hashlib.md5(b"gamma three").hexdigest()
    assert (
        out[1].cleaned_md5
        == hashlib.md5(f"alpha one\n{boiler}\nbeta two".encode()).hexdigest()
    )


def _planted_cluster_fixture(spark):
    """The ll108/ll110 planted-cluster corpus (seeded, deterministic):
    base = 6 well-separated one-hot clusters the quantizers train on;
    a DRIFTED delta adds points in two UNSEEN clusters — the
    distribution shift that decays the frozen quantizers' recall."""
    import random

    rng = random.Random(42)
    dim = 64

    def pt(c):
        v = [rng.uniform(-0.05, 0.05) for _ in range(dim)]
        v[c] += 1.0
        return v

    vid = 0
    base_rows, dr_rows = [], []
    for c in range(6):
        for _ in range(40):
            base_rows.append((vid, pt(c))); vid += 1
    for c in (6, 7):
        for _ in range(30):
            dr_rows.append((vid, pt(c))); vid += 1
    schema = "vec_id bigint, embedding array<float>"
    return spark.createDataFrame(base_rows, schema), spark.createDataFrame(
        dr_rows, schema
    )


def test_ann_retrain_on_drift_recovers_recall(spark, tmp_path):
    """ll110's reason to exist (VERDICT r11 item 1 — the ACTION half
    of the ANN detect→act loop): on the planted-drift fixture where
    ll108 only DETECTS the decay (recall over the drifted snapshot
    reads materially below the undrifted band), ll110's retrain —
    quantizers re-fit over base ∪ folded delta, re-encoded into a
    fresh versioned root — must make recall RECOVER to at least the
    undrifted band. Also pins the decision branch: with the threshold
    below the observed recall, nothing retrains, nothing is written,
    and the report reads recall_after == recall_before."""
    import os

    from flink_luad_pipeline_spark.operators import clustering

    base, drd = _planted_cluster_fixture(spark)
    cents = clustering.kmeans_fit(base, k=8, iters=3).select(
        F.col("cid").alias("centroid_id"), F.col("cv").alias("centv")
    )
    frames = similarity.residual_ann_index_frames(
        base, centroids=cents, train_iters=2, train_mod=4
    )
    for nm in frames:
        frames[nm] = frames[nm].localCheckpoint(eager=True)
    folded = similarity.residual_ann_index_update(
        frames, drd, train_iters=2, train_mod=4
    )
    probes = drd.where(F.col("vec_id") % 3 == 0)
    corpus = base.unionByName(drd)

    res = similarity.ann_index_retrain_on_drift(
        probes, corpus, folded, root=str(tmp_path / "retrained_v2"),
        threshold=0.9, k=10, train_iters=2, train_mod=4,
    )
    assert res["retrained"] is True
    rep = res["report"].toPandas()
    before = rep["recall_before"].mean()
    after = rep["recall_after"].mean()
    # drifted snapshot reads ~0.13 (the ll108 fixture's measured
    # decay); retraining over the union corpus must recover it to at
    # least the undrifted band (~0.28 measured on this fixture)
    assert before <= 0.25, f"fixture lost its planted drift: {before}"
    assert after >= 0.25, f"retrain did not recover recall: {after}"
    assert after >= before + 0.1, f"no material recovery: {before}->{after}"
    assert bool(rep["retrained"].all())
    assert (rep["index_version"] == 2).all()  # act branch bumped the version

    # decision branch: recall above threshold -> NO retrain, no write
    noop_root = str(tmp_path / "should_not_exist")
    res2 = similarity.ann_index_retrain_on_drift(
        probes, corpus, folded, root=noop_root,
        threshold=0.01, k=10, train_iters=2, train_mod=4,
    )
    assert res2["retrained"] is False
    assert not os.path.exists(noop_root)
    rep2 = res2["report"].toPandas()
    assert (rep2["recall_before"] == rep2["recall_after"]).all()
    assert not rep2["retrained"].any()
    assert (rep2["index_version"] == 1).all()  # no-op keeps the version


def test_ann_index_persist_refuses_in_place_compaction(spark, sf_dir, tmp_path):
    """residual_ann_index_persist's never-in-place rule is ENFORCED
    (ADVICE r11): persisting an index whose lazy frames read files
    under the target root would truncate parquet mid-read and corrupt
    the index — it must raise instead; a fresh root must work and
    round-trip the same rows."""
    import pytest as _pytest

    from flink_luad_pipeline_spark.operators import clustering

    emb = load(spark, sf_dir, "embeddings")
    cents = clustering.kmeans_fit(emb, k=8, iters=3).select(
        F.col("cid").alias("centroid_id"), F.col("cv").alias("centv")
    )
    frames = similarity.residual_ann_index_frames(
        emb, centroids=cents, train_iters=2, train_mod=4
    )
    root_a = str(tmp_path / "root_a")
    idx = similarity.residual_ann_index_persist(frames, root_a)
    with _pytest.raises(ValueError, match="under the target root"):
        similarity.residual_ann_index_persist(idx, root_a)
    root_b = str(tmp_path / "root_b")
    idx_b = similarity.residual_ann_index_persist(idx, root_b)
    assert sorted(map(tuple, idx_b["codes"].collect())) == sorted(
        map(tuple, idx["codes"].collect())
    )


def test_uri_norm_scheme_aware():
    """The in-place-persist guard's path normalization is scheme-aware
    (ADVICE r12): a remote URI (hdfs://, s3a://) keeps its scheme +
    authority, so a same-root persist on a remote filesystem still
    matches the prefix check — os.path.abspath would mangle BOTH sides
    of a remote URI and silently bypass the guard; local paths and
    'file:' URIs normalize identically through the filesystem."""
    import os

    from flink_luad_pipeline_spark.operators.similarity import _uri_norm

    # local spellings converge
    assert _uri_norm("/a/b") == "file:///a/b"
    assert _uri_norm("file:/a/b") == "file:///a/b"
    assert _uri_norm("file:///a/b") == "file:///a/b"
    assert _uri_norm("/a/b/../b") == "file:///a/b"
    assert _uri_norm("rel/x") == "file://" + os.path.abspath("rel/x")
    # remote URIs keep scheme+authority; trailing slash stripped
    assert _uri_norm("s3a://bucket/idx/") == "s3a://bucket/idx"
    assert _uri_norm("hdfs://nn:8020/idx") == "hdfs://nn:8020/idx"
    # the guard's prefix relation holds for remote in_files
    root = _uri_norm("s3a://bucket/idx")
    inside = _uri_norm("s3a://bucket/idx/codes.parquet/part-0.parquet")
    outside = _uri_norm("s3a://other/idx/codes.parquet/part-0.parquet")
    assert inside.startswith(root + "/")
    assert not outside.startswith(root + "/")
    # and a local file: in_file against a local root still matches
    assert _uri_norm("file:/a/b/codes.parquet").startswith(
        _uri_norm("/a/b") + "/"
    )
