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
