"""Property-based tests (hypothesis) for clustering / sampling / packing:
each Spark result is compared against an independent pure-Python reference
implementation on arbitrary small inputs.  Few examples, tiny data — each
example runs real Spark jobs."""

from __future__ import annotations

import hashlib

from hypothesis import given, settings
from hypothesis import strategies as st

from hiveka_spark.operators.clustering import connected_components
from hiveka_spark.operators.sampling import pack_chunks, stratified_sample

EDGE = st.tuples(
    st.integers(min_value=0, max_value=15), st.integers(min_value=0, max_value=15)
).filter(lambda e: e[0] != e[1])


def _uf_components(edges):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for u, v in edges:
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[max(ru, rv)] = min(ru, rv)
    return {n: find(n) for n in parent}


@settings(max_examples=8, deadline=None)
@given(st.lists(EDGE, min_size=1, max_size=24))
def test_connected_components_matches_union_find(spark, edges):
    pairs = spark.createDataFrame(edges, ["id_a", "id_b"])
    got = {r["node"]: r["cluster"] for r in connected_components(pairs).collect()}
    assert got == _uf_components(edges)


@settings(max_examples=8, deadline=None)
@given(st.lists(EDGE, min_size=1, max_size=24))
def test_star_contraction_matches_union_find(spark, edges):
    from hiveka_spark.operators.clustering import connected_components_star

    pairs = spark.createDataFrame(edges, ["id_a", "id_b"])
    star_df, rounds = connected_components_star(pairs)
    got = {r["node"]: r["cluster"] for r in star_df.collect()}
    assert got == _uf_components(edges)
    assert rounds <= 10  # arbitrary graphs on 16 nodes: O(log n) alternations


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.tuples(st.sampled_from(["a", "b"]), st.integers(0, 50), st.integers(1, 9)),
        min_size=1,
        max_size=30,
        unique_by=lambda r: (r[0], r[1]),
    ),
    st.integers(min_value=2, max_value=15),
)
def test_pack_chunks_matches_python_cumsum(spark, rows, budget):
    df = spark.createDataFrame(rows, ["src", "i", "tok"])
    got = {(r["src"], r["i"]): r["chunk"] for r in pack_chunks(df, "src", "i", "tok", budget).collect()}
    expect = {}
    for src in {r[0] for r in rows}:
        cum = 0
        for s, i, tok in sorted(r for r in rows if r[0] == src):
            expect[(src, i)] = cum // budget
            cum += tok
    assert got == expect


def _hash60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


@settings(max_examples=6, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 500), st.sampled_from(["en", "zh", "xx"])),
        min_size=1,
        max_size=40,
        unique_by=lambda r: r[0],
    ),
    st.integers(min_value=0, max_value=100),
)
def test_stratified_sample_matches_python_hash(spark, rows, en_rate):
    rates = {"en": en_rate, "zh": 100}
    df = spark.createDataFrame(rows, ["doc_id", "lang"])
    got = {r["doc_id"] for r in stratified_sample(df, "lang", rates, "doc_id").collect()}
    expect = {
        i
        for i, lang in rows
        if _hash60(str(i)) % 100 < rates.get(lang, 0)
    }
    assert got == expect


@given(
    n_tokens=st.lists(st.integers(min_value=0, max_value=200), min_size=1, max_size=8)
)
@settings(max_examples=15, deadline=None)
def test_chunk_overlap_invariants(spark, n_tokens):
    """For any document length: every token is covered by >=1 window,
    consecutive windows overlap by exactly WIN-STRIDE tokens (when both are
    full), all windows except possibly the last are full, and the window
    count is 1 + ceil(max(n-WIN,0)/STRIDE) (0-token docs emit nothing)."""
    import pyspark.sql.functions as F

    from hiveka_spark.operators.text import tokens
    from hiveka_spark.queries.curation_ext import _STRIDE, _WIN

    docs = [
        (i, " ".join(f"t{i}_{j}" for j in range(n))) for i, n in enumerate(n_tokens)
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    n = F.size("ws")
    n_windows = F.floor((F.greatest(n - _WIN, F.lit(0)) + (_STRIDE - 1)) / _STRIDE)
    seq = F.when(n >= 1, F.sequence(F.lit(0).cast("bigint"), n_windows)).otherwise(
        F.array().cast("array<bigint>")
    )
    start = (F.col("chunk_idx") * _STRIDE + 1).cast("int")
    out = (
        df.select("doc_id", tokens("text").alias("ws"))
        .select("doc_id", "ws", F.explode(seq).alias("chunk_idx"))
        .select(
            "doc_id",
            "chunk_idx",
            F.size(F.slice("ws", start, _WIN)).alias("n_tok"),
            F.array_join(F.slice("ws", start, _WIN), " ").alias("chunk_text"),
        )
        .collect()
    )
    by_doc: dict[int, list] = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r)
    for i, n_tok in enumerate(n_tokens):
        rows = sorted(by_doc.get(i, []), key=lambda r: r.chunk_idx)
        if n_tok == 0:
            assert rows == []
            continue
        expected = 1 + max(0, -(-(max(n_tok - _WIN, 0)) // _STRIDE))
        assert len(rows) == expected
        covered = set()
        for r in rows:
            covered.update(r.chunk_text.split())
        assert len(covered) == n_tok  # full coverage, distinct tokens
        for r in rows[:-1]:
            assert r.n_tok == _WIN  # only the last window may run short
