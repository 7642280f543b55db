"""Hypothesis property tests: the JVM-side text column functions must
agree with straightforward Python reference implementations on
arbitrary (printable) input — the fuzz layer on top of the fixed
oracle checks."""

from __future__ import annotations

import re

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from flink_luad_pipeline_spark.functions import text as T

TEXTS = st.lists(
    st.text(
        alphabet=st.characters(min_codepoint=32, max_codepoint=126),
        max_size=80,
    ),
    min_size=1,
    max_size=8,
)


def py_tokenize(s: str) -> list[str]:
    return [t for t in re.split(r"[^a-z0-9]+", s.lower()) if t != ""]


def py_shingles(tokens: list[str], k: int = 3) -> list[str]:
    if len(tokens) < k:
        return []
    seen, out = set(), []
    for i in range(len(tokens) - k + 1):
        s = " ".join(tokens[i : i + k])
        if s not in seen:
            seen.add(s)
            out.append(s)
    return out


@settings(max_examples=15, deadline=None, suppress_health_check=list(HealthCheck))
@given(TEXTS)
def test_tokenize_matches_python(spark, texts):
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "i INT, t STRING")
    got = {
        r.i: list(r.toks)
        for r in df.select("i", T.tokenize(F.col("t")).alias("toks")).collect()
    }
    for i, t in enumerate(texts):
        assert got[i] == py_tokenize(t), (t, got[i])


@settings(max_examples=15, deadline=None, suppress_health_check=list(HealthCheck))
@given(TEXTS)
def test_shingles_match_python(spark, texts):
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "i INT, t STRING")
    got = {
        r.i: list(r.sh)
        for r in df.select(
            "i", T.word_shingles(T.tokenize(F.col("t"))).alias("sh")
        ).collect()
    }
    for i, t in enumerate(texts):
        assert got[i] == py_shingles(py_tokenize(t)), (t, got[i])


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(TEXTS)
def test_fingerprint_is_normalization_invariant(spark, texts):
    """Whitespace jitter and case changes must not change the
    fingerprint; distinct normalized texts must differ."""
    import hashlib

    rows = []
    for i, t in enumerate(texts):
        rows.append((2 * i, t))
        rows.append((2 * i + 1, "  " + t.upper().replace(" ", "   ") + " "))
    df = spark.createDataFrame(rows, "i INT, t STRING")
    got = {
        r.i: r.fp
        for r in df.select("i", T.text_fingerprint(F.col("t")).alias("fp")).collect()
    }
    for i, t in enumerate(texts):
        norm = " ".join(t.lower().split())
        expected = hashlib.md5(norm.encode()).hexdigest()
        assert got[2 * i] == expected
        assert got[2 * i + 1] == expected


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(TEXTS)
def test_portable_hash40_matches_duckdb(spark, duck, texts):
    """The 40-bit portable hash (foundation of every oracle-checked
    dedup/split/sample op) must agree bit-for-bit with its DuckDB twin
    on arbitrary unicode input."""
    from flink_luad_pipeline_spark.operators.dedup import portable_hash40

    rows = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "i INT, t STRING")
    got = {
        r.i: r.h
        for r in df.select("i", portable_hash40(F.col("t")).alias("h")).collect()
    }
    for i, t in enumerate(texts):
        (expected,) = duck.execute(
            "SELECT CAST('0x' || substr(md5(?), 1, 10) AS BIGINT)", [t]
        ).fetchone()
        assert got[i] == expected, (t, got[i], expected)


def py_ngrams(tokens: list[str], k: int = 3) -> list[str]:
    return [
        " ".join(tokens[i : i + k]) for i in range(len(tokens) - k + 1)
    ] if len(tokens) >= k else []


@given(TEXTS)
@settings(max_examples=20, deadline=None, suppress_health_check=list(HealthCheck))
def test_word_ngrams_matches_python(spark, texts):
    df = spark.createDataFrame([(t,) for t in texts], "text STRING")
    got = [
        r.g
        for r in df.select(
            T.word_ngrams(T.tokenize(F.col("text")), 3).alias("g")
        ).collect()
    ]
    want = [py_ngrams(py_tokenize(t)) for t in texts]
    assert got == want


@given(
    st.lists(
        st.text(
            alphabet=st.characters(min_codepoint=97, max_codepoint=122),
            min_size=1,
            max_size=12,
        ),
        min_size=1,
        max_size=40,
    )
)
@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
def test_dict_encode_distributed_is_dense_rank_on_any_input(spark, names):
    """Fuzz: for arbitrary name bags the distributed tier must produce
    exactly the dense 0-based ids in sorted-distinct order."""
    from flink_luad_pipeline_spark.operators import relational as rel

    df = spark.createDataFrame([(n,) for n in names], "name STRING")
    got = {
        (r.name, r.id)
        for r in rel.dict_encode_distributed(df, "name").collect()
    }
    want = {(n, i) for i, n in enumerate(sorted(set(names)))}
    assert got == want
