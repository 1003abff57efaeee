"""connected_components: differential vs a driver-side union-find,
pointer-jumping round bound, and the chain-collapse dedup semantics that
distinguish minhash_dedup_cc from the greedy policy."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from geostatstransforms_jl_spark.functions.graph import connected_components


def _union_find(edges):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # canonical representative = min id per component (what the operator
    # promises); path-compress to roots, then map roots to their min member
    comp_min = {}
    for x in list(parent):
        r = find(x)
        comp_min[r] = min(comp_min.get(r, x), x)
    return {x: comp_min[find(x)] for x in parent}


@pytest.mark.parametrize("seed,n_nodes,n_edges", [(1, 50, 40), (2, 200, 150), (3, 400, 600)])
def test_matches_union_find(spark, seed, n_nodes, n_edges):
    rng = np.random.default_rng(seed)
    edges = [(int(a), int(b)) for a, b in
             rng.integers(0, n_nodes, size=(n_edges, 2)) if a != b]
    df = spark.createDataFrame(edges, "a long, b long")
    got = {r.id: r.component for r in connected_components(df).collect()}
    assert got == _union_find(edges)


def test_pointer_jumping_beats_diameter(spark):
    # a 64-node path has diameter 63; plain neighbor propagation needs ~63
    # rounds, pointer jumping must finish well inside 16
    path = [(i, i + 1) for i in range(63)]
    df = spark.createDataFrame(path, "a long, b long")
    got = {r.id: r.component for r in
           connected_components(df, max_iter=16).collect()}
    assert got == {i: 0 for i in range(64)}


def test_duplicate_edges_self_loops_and_direction(spark):
    df = spark.createDataFrame(
        [(5, 5), (2, 1), (1, 2), (2, 1), (9, 9)], "a long, b long"
    )
    got = {r.id: r.component for r in connected_components(df).collect()}
    # pure self-loop nodes still appear, as their own component
    assert got == {1: 1, 2: 1, 5: 5, 9: 9}


def test_nonconvergence_raises(spark):
    df = spark.createDataFrame([(i, i + 1) for i in range(63)], "a long, b long")
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(df, max_iter=2)


def test_minhash_cc_collapses_star_through_largest_id(spark):
    """Where greedy and cc genuinely differ: a bridge document with the
    LARGEST id links two smaller docs that never match each other.  Greedy
    drops a doc only when it is the larger side of a pair — so doc 2 here
    survives (its only match, 3, is bigger) — while cc keeps one doc per
    component.  (On simple chains ordered by id the two policies agree:
    every non-min chain member is the larger side of some pair.)"""
    from geostatstransforms_jl_spark.textops import minhash_dedup, minhash_dedup_cc

    # deterministic construction (minhash draws no RNG): 62 synthetic words;
    # bridge edits 2 of base's words, far edits 2 more of bridge's.  Probed
    # est-Jaccards: base~bridge 0.859, bridge~far 0.812, base~far 0.734 —
    # threshold 0.75 keeps exactly the two star edges.
    base = [f"w{i:02d}" for i in range(62)]
    bridge = list(base)
    for p in (10, 30):
        bridge[p] += "x"
    far = list(bridge)
    for p in (45, 50):
        far[p] += "y"
    docs = spark.createDataFrame(
        [(1, " ".join(base)), (2, " ".join(far)), (3, " ".join(bridge))],
        "doc_id long, text string",
    )
    greedy = {r.doc_id for r in
              minhash_dedup(docs, threshold=0.75, max_bucket_size=None).collect()}
    cc = {r.doc_id for r in
          minhash_dedup_cc(docs, threshold=0.75, max_bucket_size=None).collect()}
    # sanity on the construction: 1~3 and 2~3 match, 1~2 does not
    from geostatstransforms_jl_spark.textops.dedup import (
        minhash_lsh_pairs, minhash_signatures)
    pairs = {(r.a, r.b) for r in minhash_lsh_pairs(
        minhash_signatures(docs), threshold=0.75, max_bucket_size=None).collect()}
    assert pairs == {(1, 3), (2, 3)}
    assert greedy == {1, 2}   # 2 survives: its only match, 3, has a larger id
    assert cc == {1}          # {1,2,3} is one component; keep the min


def test_components_over_hamming_pair_graph(spark):
    """connected_components is generic over any pair generator: feed it the
    banded-Hamming pair graph on a phash-like signature column (the image
    near-dup path).  Chain 10-11-12 via 1-bit flips plus an isolated far
    signature: at max_hamming=1 the ends (hamming 2) never pair directly,
    but CC collapses the whole chain."""
    from geostatstransforms_jl_spark.textops import hamming_neardup_pairs
    from geostatstransforms_jl_spark.functions.graph import connected_components

    s = 0x0123456789ABCDEF
    rows = [
        (10, s),
        (11, s ^ (1 << 3)),             # 1 bit from 10
        (12, s ^ (1 << 3) ^ (1 << 17)), # 1 bit from 11, 2 bits from 10
        (99, ~s & 0x7FFFFFFFFFFFFFFF),  # far from everything
    ]
    imgs = spark.createDataFrame(rows, "image_id long, phash long")
    pairs = hamming_neardup_pairs(
        imgs, sig_col="phash", id_col="image_id", max_hamming=1,
        max_bucket_size=None,
    )
    assert {(r.a, r.b) for r in pairs.collect()} == {(10, 11), (11, 12)}
    comp = {r.id: r.component for r in
            connected_components(pairs, src="a", dst="b").collect()}
    assert comp == {10: 10, 11: 10, 12: 10}  # node 99 has no edges
