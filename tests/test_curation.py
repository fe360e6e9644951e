"""Connected-components (near-dup clustering) correctness + convergence.

The driver's oracle harness checks ``neardup_clusters`` /
``neardup_clusters_star`` against the recursive-CTE DuckDB oracle at
sf0.01; these tests cover what SQL can't: the O(log n) round bound of
the alternating large-star/small-star algorithm on adversarial chain
graphs (where plain label propagation needs diameter rounds), and
equality against a driver-side union-find on arbitrary random graphs.
"""

import random

import pytest
from pyspark.sql import functions as F

from etl_kafka_project_spark.ops.curation import (
    _star_components,
    neardup_clusters,
    neardup_clusters_star,
)

SF = "/root/testdata/sf0.001"


def _ids(spark, n):
    return spark.range(n).select(F.col("id").cast("long"))


def _pairs(spark, edges):
    if not edges:
        return spark.createDataFrame([], "src long, dst long")
    return spark.createDataFrame(
        [(int(a), int(b)) for a, b in edges], "src long, dst long"
    )


def _union_find(n, edges):
    parent = list(range(n))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # component label = min id in component
    best = {}
    for x in range(n):
        r = find(x)
        best[r] = min(best.get(r, x), x)
    return {x: best[find(x)] for x in range(n)}


def test_star_components_path_graph_logn_rounds(spark):
    """A 256-node path has diameter 255 — plain label propagation would
    need ~255 rounds (and the production loop fail-louds at 25). The
    star algorithm must finish within ~2*log2(n) alternating rounds."""
    n = 256
    edges = [(i, i + 1) for i in range(n - 1)]
    labels = _star_components(_ids(spark, n), _pairs(spark, edges), max_rounds=18)
    got = {r["id"]: r["lbl"] for r in labels.collect()}
    assert got == {i: 0 for i in range(n)}


def test_star_components_random_graph_matches_union_find(spark):
    rng = random.Random(42)
    n = 300
    edges = [
        (rng.randrange(n), rng.randrange(n)) for _ in range(180)
    ]  # sparse: many components, some self-loops
    labels = _star_components(_ids(spark, n), _pairs(spark, edges))
    got = {r["id"]: r["lbl"] for r in labels.collect()}
    assert got == _union_find(n, edges)


def test_star_components_no_edges(spark):
    labels = _star_components(_ids(spark, 10), _pairs(spark, []))
    got = {r["id"]: r["lbl"] for r in labels.collect()}
    assert got == {i: i for i in range(10)}


@pytest.mark.slow
def test_star_matches_label_prop_on_testdata(spark):
    a = {
        (r["doc_id"], r["cluster_id"], r["is_canonical"])
        for r in neardup_clusters(spark, SF).collect()
    }
    b = {
        (r["doc_id"], r["cluster_id"], r["is_canonical"])
        for r in neardup_clusters_star(spark, SF).collect()
    }
    assert a == b and len(a) > 0


def test_semdedup_min_id_per_cluster_always_kept(spark):
    from etl_kafka_project_spark.ops.curation import semdedup_prune

    out = semdedup_prune(spark, SF).collect()
    assert out, "empty result"
    by_cluster = {}
    for r in out:
        by_cluster.setdefault(r["centroid_id"], []).append(r)
    for cid, rows in by_cluster.items():
        head = min(rows, key=lambda r: r["vec_id"])
        # the smallest id in a cluster has no smaller-id member, so it
        # can never be pruned
        assert head["keep"], f"cluster {cid} min-id {head['vec_id']} dropped"
    for r in out:
        # a dropped vector must carry the cosine that condemned it
        if not r["keep"]:
            assert r["max_cos_prior"] is not None
        else:
            assert r["max_cos_prior"] is None


def test_semdedup_k_is_config_and_oracle_twins_at_k8(spark):
    """k is a parameter (round-5 verdict item): at k=8 the Spark form
    must still match the DuckDB oracle generated at the same k — the
    keep semantics (min-id member per high-similarity group survives)
    are identical under any centroid count."""
    from tools.check_oracles import compare, duck_connection

    from etl_kafka_project_spark.ops.curation import semdedup_prune, semdedup_sql

    sf = "/root/testdata/sf0.01"
    con = duck_connection(sf)
    try:
        verdict = compare(
            "semdedup_k8", semdedup_prune(spark, sf, k=8), con, semdedup_sql(8)
        )
    finally:
        con.close()
    assert verdict == "OK", verdict
    # and k actually changes the clustering: 8 distinct centroids appear
    cids = {r["centroid_id"] for r in semdedup_prune(spark, sf, k=8).collect()}
    assert len(cids) == 8


def test_curated_corpus_packed_is_consistent_artifact(spark):
    """The packed artifact (round-5 VERDICT #7) must be a loadable
    training layout: rows are exactly the curated keep-list, offsets are
    gapless per source, and every redacted hash matches redact_pii over
    the same fixture-augmented text."""
    from pyspark.sql import functions as F

    from etl_kafka_project_spark.ops.text import curated_corpus, curated_corpus_packed

    sf = "/root/testdata/sf0.001"
    packed = curated_corpus_packed(spark, sf).cache()
    kept_ids = {r["doc_id"] for r in curated_corpus(spark, sf).select("doc_id").collect()}
    rows = packed.collect()
    assert {r["doc_id"] for r in rows} == kept_ids and len(kept_ids) > 0
    # gapless concat-and-chunk stream per source, in doc_id order
    by_source = {}
    for r in sorted(rows, key=lambda r: (r["source"], r["doc_id"])):
        off = by_source.get(r["source"], 0)
        assert r["start_offset"] == off
        assert r["pack_id"] == off // 512
        by_source[r["source"]] = off + r["n_tokens"]
    packed.unpersist()
