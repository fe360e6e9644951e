"""Corpus-curation operators — the steps BETWEEN detection and a
training set. ``dedup.py`` finds candidate near-dup PAIRS; a real
pretraining pipeline must then (1) group pairs into duplicate CLUSTERS
and elect one canonical document per cluster, (2) assign every document
a deterministic train/val/test split, and (3) draw stratified samples
per stratum for eval sets. (The reference's scope ends at keyed upserts
— ``utils/interfaces/kafka_interface.py`` — these operators extend the
engine along SURVEY §6's training-data axis.)

Scale notes:

* ``neardup_clusters`` is iterative min-label propagation over the LSH
  candidate-pair graph — the textbook distributed connected-components
  loop (each round: one equi-join + one min-aggregate, both shuffling
  on doc_id; lineage truncated per round so plans stay flat). Rounds =
  graph diameter; near-dup graphs are unions of small cliques (docs
  sharing a bucket are pairwise connected), so the diameter is tiny
  and the loop converges in 2-3 rounds regardless of corpus size. For
  adversarial long-chain graphs the alternating large-star/small-star
  variant (Kiveris et al., "Connected Components in MapReduce") drops
  rounds to O(log n); the per-round plan here is the small-star step.
* ``dataset_split_assign`` is a map-only stamp: md5-derived bucket in
  [0, 65536) → 80/10/10 thresholds. Content-independent, seedable,
  reproducible across engines and runs — never ``rand()``, which
  re-rolls per retry/recompute and breaks exactly-once semantics.
* ``stratified_sample_per_group`` is one window over a (stratum,
  md5-order) partitioning: deterministic pseudo-random top-k per
  stratum, one shuffle, no driver-side sampling state.

md5 is the hash family throughout because Spark and DuckDB agree on it
byte-for-byte, keeping every stage oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etl_kafka_project_spark.ops import load
from etl_kafka_project_spark.ops.dedup import LSH_PAIRS_SQL, lsh_candidate_pairs
from etl_kafka_project_spark.ops.similarity import _cosine

#: convergence cap for the label-propagation loop; near-dup graphs are
#: clique-unions with tiny diameter, so hitting this means the input is
#: not a candidate-pair graph (e.g. a path graph) — fail loudly rather
#: than return half-propagated labels.
MAX_CC_ROUNDS = 25


def neardup_clusters(spark: SparkSession, sf: str) -> DataFrame:
    """Connected components over the LSH candidate-pair graph: every
    document gets a ``cluster_id`` (the minimum doc_id reachable through
    near-dup pairs — the cluster's canonical document) and an
    ``is_canonical`` flag. Documents in no pair are their own singleton
    cluster. This is the step that turns pairwise LSH hits into a
    keep/drop decision per document."""
    docs = load(spark, sf, "documents").select("doc_id")
    pairs = lsh_candidate_pairs(spark, sf)
    # undirected: propagate labels both ways; localCheckpoint stages the
    # pair computation once (the 8-hash MinHash lineage must not be
    # re-run every round) and truncates lineage so round-R plans don't
    # nest R copies of the join
    edges = (
        pairs.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
        .union(pairs.select(F.col("doc_b").alias("src"), F.col("doc_a").alias("dst")))
        .localCheckpoint(eager=True)
    )
    labels = docs.select(F.col("doc_id").alias("id"), F.col("doc_id").alias("lbl"))
    for _ in range(MAX_CC_ROUNDS):
        nbr_min = (
            edges.join(labels, edges.src == labels.id)
            .groupBy("dst")
            .agg(F.min("lbl").alias("nbr_lbl"))
        )
        new_labels = (
            labels.join(nbr_min, labels.id == nbr_min.dst, "left")
            .select(
                "id",
                F.least("lbl", F.coalesce("nbr_lbl", "lbl")).alias("lbl"),
                (F.col("nbr_lbl") < F.col("lbl")).alias("_changed"),
            )
            .localCheckpoint(eager=True)
        )
        converged = new_labels.filter(F.col("_changed")).isEmpty()
        labels = new_labels.drop("_changed")
        if converged:
            break
    else:
        raise RuntimeError(f"neardup_clusters did not converge in {MAX_CC_ROUNDS} rounds")
    return labels.select(
        F.col("id").alias("doc_id"),
        F.col("lbl").alias("cluster_id"),
        (F.col("lbl") == F.col("id")).cast("int").alias("is_canonical"),
    )


def _star_components(ids: DataFrame, pairs: DataFrame, max_rounds: int = 60) -> DataFrame:
    """Alternating large-star / small-star connected components
    (Kiveris et al., "Connected Components in MapReduce and Beyond",
    SoCC'14): converges in O(log n) rounds on ANY graph — including the
    adversarial long-chain graphs that defeat plain label propagation's
    diameter-bound loop.

    Per-round plan is JOIN-FREE: each star step is one window-min over a
    ``partitionBy(u)`` of the directed edge list (one shuffle), then a
    projection — no equi-join, no collect_list of neighborhoods (a
    high-degree node never materializes its neighbor list on one task).
    Edge count never grows (each step replaces a node's edges with at
    most as many star edges), so rounds get cheaper as stars collapse.

    ``ids``: one column ``id`` (every node, including isolated ones).
    ``pairs``: columns ``src``/``dst`` (undirected, any orientation).
    Returns ``(id, lbl)`` where ``lbl`` is the component's minimum id.
    """
    # canonical undirected edges, self-loops dropped
    edges = (
        pairs.select(
            F.least("src", "dst").alias("lo"), F.greatest("src", "dst").alias("hi")
        )
        .filter(F.col("lo") != F.col("hi"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    def _unchanged(a: DataFrame, b: DataFrame) -> bool:
        # cheap count gate first; exact set compare only when counts agree
        return a.count() == b.count() and a.subtract(b).isEmpty()

    for _ in range(max_rounds):
        prev = edges
        # -- large-star: for every node u, hang u's LARGER neighbors off
        # the minimum of its neighborhood (∪ {u}); directed view (u, v)
        d = edges.select(F.col("lo").alias("u"), F.col("hi").alias("v")).union(
            edges.select(F.col("hi").alias("u"), F.col("lo").alias("v"))
        )
        wu = Window.partitionBy("u")
        m = F.least(F.min("v").over(wu), F.col("u"))
        edges = (
            d.select(F.col("u").alias("_u"), m.alias("lo"), F.col("v").alias("hi"))
            .filter(F.col("hi") > F.col("_u"))  # large-star emits v > u only
            .select("lo", "hi")  # positional schema must match small-star's
            .filter(F.col("lo") != F.col("hi"))
            .distinct()
            .localCheckpoint(eager=True)
        )
        # -- small-star: orient every edge large→small; hang each node's
        # SMALLER neighbors (and itself) off the minimum one
        d = edges.select(F.col("hi").alias("u"), F.col("lo").alias("v"))
        wu = Window.partitionBy("u")
        m = F.min("v").over(wu)  # all v < u, so min includes the u term trivially
        star = d.select(m.alias("lo"), F.col("v").alias("hi")).union(
            d.select(m.alias("lo"), F.col("u").alias("hi"))
        )
        new_edges = (
            star.filter(F.col("lo") != F.col("hi"))
            .distinct()
            .localCheckpoint(eager=True)
        )
        # true fixpoint = NEITHER step changed the edge set this round
        # (a small-star-only fixpoint like {(0,1),(0,2),(1,3)} is not
        # converged — the next large-star still rewires it)
        if _unchanged(new_edges, edges) and _unchanged(edges, prev):
            edges = new_edges
            break
        edges = new_edges
    else:
        raise RuntimeError(f"_star_components did not converge in {max_rounds} rounds")
    # fixpoint is a star forest: every node's edges point at its
    # component min; isolated nodes label themselves
    root = edges.groupBy(F.col("hi").alias("id")).agg(F.min("lo").alias("_root"))
    return ids.join(root, "id", "left").select(
        "id", F.coalesce("_root", "id").alias("lbl")
    )


def neardup_clusters_star(spark: SparkSession, sf: str) -> DataFrame:
    """``neardup_clusters`` computed by the alternating large-star /
    small-star algorithm instead of diameter-bound label propagation —
    identical output (same oracle), O(log n) rounds on any graph shape.
    This is the variant to reach for when the pair graph isn't known to
    be a clique-union (e.g. transitive chains of near-dups at 100 TB)."""
    docs = load(spark, sf, "documents").select(F.col("doc_id").alias("id"))
    pairs = lsh_candidate_pairs(spark, sf).select(
        F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")
    )
    labels = _star_components(docs, pairs)
    return labels.select(
        F.col("id").alias("doc_id"),
        F.col("lbl").alias("cluster_id"),
        (F.col("lbl") == F.col("id")).cast("int").alias("is_canonical"),
    )


NEARDUP_CLUSTERS_SQL = f"""
WITH RECURSIVE pairs AS ({LSH_PAIRS_SQL}),
edges AS (
  SELECT doc_a AS src, doc_b AS dst FROM pairs
  UNION ALL
  SELECT doc_b AS src, doc_a AS dst FROM pairs
),
reach(id, lbl) AS (
  SELECT doc_id, doc_id FROM documents
  UNION
  SELECT e.dst, r.lbl FROM reach r JOIN edges e ON e.src = r.id
)
SELECT id AS doc_id, min(lbl) AS cluster_id,
       CAST(min(lbl) = id AS INT) AS is_canonical
FROM reach GROUP BY id
"""


# 4 hex digits of md5 -> [0, 65536); thresholds at 80% / 90%
_SPLIT_BUCKETS = 65536
_TRAIN_LT = 52429  # floor(0.8 * 65536) + 1 boundary: [0, 52428] ≈ 80%
_VAL_LT = 58982  # (52429, 58981] ≈ 10%


def dataset_split_assign(spark: SparkSession, sf: str) -> DataFrame:
    """Deterministic 80/10/10 train/val/test assignment per document:
    bucket = first 4 md5 hex digits of a salted doc_id in [0, 65536).
    Map-only, content-independent, stable under retries and engine
    re-runs (no rand()); changing the salt re-deals the split."""
    d = load(spark, sf, "documents")
    bucket = F.conv(
        F.substring(F.md5(F.concat(F.lit("split:"), F.col("doc_id").cast("string"))), 1, 4),
        16,
        10,
    ).cast("long")
    return d.select(
        "doc_id",
        bucket.alias("split_bucket"),
        F.when(bucket < _TRAIN_LT, "train")
        .when(bucket < _VAL_LT, "val")
        .otherwise("test")
        .alias("split"),
    )


SPLIT_ASSIGN_SQL = f"""
SELECT doc_id,
       CAST(('0x' || substr(md5('split:' || CAST(doc_id AS VARCHAR)), 1, 4)) AS BIGINT)
         AS split_bucket,
       CASE
         WHEN CAST(('0x' || substr(md5('split:' || CAST(doc_id AS VARCHAR)), 1, 4)) AS BIGINT)
              < {_TRAIN_LT} THEN 'train'
         WHEN CAST(('0x' || substr(md5('split:' || CAST(doc_id AS VARCHAR)), 1, 4)) AS BIGINT)
              < {_VAL_LT} THEN 'val'
         ELSE 'test'
       END AS split
FROM documents
"""


SAMPLE_PER_STRATUM = 5


def stratified_sample_per_group(spark: SparkSession, sf: str) -> DataFrame:
    """Deterministic stratified sample: the ``SAMPLE_PER_STRATUM``
    documents per (lang, source) stratum that rank first by md5(doc_id)
    — a reproducible pseudo-random draw (md5 order is uncorrelated with
    doc_id order). One window, one shuffle on the stratum key; at 100 TB
    the rank prunes each stratum to k rows before anything wide moves."""
    d = load(spark, sf, "documents")
    rank_key = F.md5(F.concat(F.lit("sample:"), F.col("doc_id").cast("string")))
    w = Window.partitionBy("lang", "source").orderBy(rank_key.asc(), F.col("doc_id").asc())
    return (
        d.select("doc_id", "lang", "source", F.row_number().over(w).alias("sample_rank"))
        .filter(F.col("sample_rank") <= SAMPLE_PER_STRATUM)
    )


STRATIFIED_SAMPLE_SQL = f"""
SELECT doc_id, lang, source, sample_rank
FROM (
  SELECT doc_id, lang, source,
         row_number() OVER (
           PARTITION BY lang, source
           ORDER BY md5('sample:' || CAST(doc_id AS VARCHAR)) ASC, doc_id ASC
         ) AS sample_rank
  FROM documents
)
WHERE sample_rank <= {SAMPLE_PER_STRATUM}
"""


#: context budget for the packing index (tokens per training sequence)
PACK_BUDGET = 512


def pack_layout(df: DataFrame) -> DataFrame:
    """THE single definition of the concat-and-chunk packing convention
    (shared by ``pack_sequences`` and ``curated_corpus_packed`` — a
    drifted copy would silently desynchronize the training artifact from
    the index): over any frame carrying (source, doc_id, n_tokens),
    adds end_offset / start_offset / pack_id / spans_boundary via one
    running-sum window per source. Extra input columns pass through."""
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        df.withColumn("end_offset", F.sum("n_tokens").over(w))
        .withColumn("start_offset", F.col("end_offset") - F.col("n_tokens"))
        .withColumn("pack_id", F.floor(F.col("start_offset") / PACK_BUDGET))
        .withColumn(
            "spans_boundary",
            F.floor((F.col("end_offset") - 1) / PACK_BUDGET) != F.col("pack_id"),
        )
    )


def pack_layout_sql(base_sql: str, extra_select: str = "") -> str:
    """DuckDB twin of :func:`pack_layout`. ``base_sql`` must select
    ``source, doc_id, n_tokens`` (plus any passthrough columns named in
    ``extra_select``, e.g. ``", redacted_sha256"``)."""
    return f"""
WITH _pack_base AS ({base_sql}),
_pack_c AS (
  SELECT *, sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            AS end_offset
  FROM _pack_base
)
SELECT source, doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
       CAST(end_offset - n_tokens AS BIGINT) AS start_offset,
       CAST(floor((end_offset - n_tokens) / {PACK_BUDGET}) AS BIGINT) AS pack_id,
       floor((end_offset - 1) / {PACK_BUDGET})
         != floor((end_offset - n_tokens) / {PACK_BUDGET}) AS spans_boundary{extra_select}
FROM _pack_c
"""


def pack_sequences(spark: SparkSession, sf: str) -> DataFrame:
    """GPT-style concat-and-chunk packing index: documents are laid out
    in deterministic (source, doc_id) order as one token stream per
    source, then chunked into fixed ``PACK_BUDGET``-token training
    sequences. Each doc gets its stream ``start_offset``, its
    ``pack_id`` (the chunk its first token lands in), and a
    ``spans_boundary`` flag (doc crosses a chunk edge — the fraction a
    loader must split). This is the standard pretraining batch layout
    (concatenate-then-chunk), as an index — no content moves.

    Scale shape: one window per source — the layout is order-DEFINED,
    so the cumulative sum is inherently sequential within a source and
    parallel across sources (at 100 TB the packing unit would be the
    shard/file, exactly like this per-source form). The window input is
    3 narrow columns; content never enters the shuffle."""
    d = load(spark, sf, "documents").select(
        "source",
        "doc_id",
        F.size(F.split(F.lower("text"), " ")).alias("n_tokens"),
    )
    return pack_layout(d).select(
        "source", "doc_id", "n_tokens", "start_offset", "pack_id", "spans_boundary"
    )


PACK_SEQUENCES_SQL = pack_layout_sql(
    "SELECT source, doc_id,"
    " len(string_split(lower(text), ' ')) AS n_tokens FROM documents"
)


#: SemDeDup keep threshold — tuned so the synthetic corpus exercises
#: both branches (93/500 dropped at sf0.01); on real embeddings this
#: would sit near 0.95+ (Abbas et al. 2023 use ~1 - 5e-2 .. 1 - 1e-4).
SEMDEDUP_TAU = 0.35

#: Default centroid count at fixture scale. The paper uses k=50k for
#: 1.3e8 embeddings (~10^4 vectors per cluster); k is a PARAMETER of
#: ``semdedup_prune`` / ``semdedup_sql`` and must grow with the corpus
#: so the in-cluster quadratic stays bounded.
SEMDEDUP_K = 4


def semdedup_prune(spark: SparkSession, sf: str, k: int = SEMDEDUP_K) -> DataFrame:
    """SemDeDup (Abbas et al. 2023): semantic deduplication INSIDE
    embedding clusters. Elect ``k`` coarse centroids by a seeded
    deterministic draw (the k vectors ranking first by
    ``md5('cent:' || vec_id)`` — a reproducible pseudo-random sample, in
    place of the paper's k-means, so the DuckDB oracle can mirror it
    exactly), assign every vector to its nearest centroid by cosine,
    then within each cluster drop any vector whose cosine to a
    smaller-id cluster member reaches ``SEMDEDUP_TAU`` — the min-id
    member of every high-similarity group is the keeper, so the decision
    is deterministic and retry/exactly-once safe (never "first seen",
    which re-rolls on recompute). The nearest-centroid ordering uses the
    cosine ROUNDED to 6dp (the same quantization the prune threshold
    uses) so a near-tie between two centroids cannot flip across
    engines' float-summation orders.

    Scale shape: centroid election is a distributed top-k
    (TakeOrdered on k rows — never a global window); the only
    corpus-wide data movement is the equi-join on ``centroid_id``; the
    quadratic pairing is CLUSTER-LOCAL, which is SemDeDup's entire
    design — k is chosen so clusters are ~10^4 vectors, keeping the
    in-cluster all-pairs bounded while the number of clusters scales
    out. Assignment rides a broadcast of the O(k) centroids; vectors
    enter exactly one shuffle (the cluster join), ids-only state goes
    through the window."""
    e = load(spark, sf, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    cent_key = F.md5(F.concat(F.lit("cent:"), F.col("vec_id").cast("string")))
    cents = (
        e.select(F.col("vec_id").alias("centroid_id"), F.col("v").alias("c"),
                 cent_key.alias("_ck"))
        .orderBy("_ck", "centroid_id")
        .limit(k)
        .drop("_ck")
    )
    scored = e.crossJoin(F.broadcast(cents)).select(
        "vec_id", "centroid_id", F.round(_cosine("v", "c"), 6).alias("_cos")
    )
    w = Window.partitionBy("vec_id").orderBy(F.desc("_cos"), "centroid_id")
    assign = (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select("vec_id", "centroid_id")
    )
    a = assign.join(e, "vec_id").select(
        F.col("vec_id").alias("a_id"), "centroid_id", F.col("v").alias("va")
    )
    b = assign.join(e, "vec_id").select(
        F.col("vec_id").alias("b_id"), "centroid_id", F.col("v").alias("vb")
    )
    dups = (
        a.join(b, "centroid_id")
        .filter(F.col("a_id") < F.col("b_id"))
        .select("b_id", F.round(_cosine("va", "vb"), 6).alias("_cos"))
        .filter(F.col("_cos") >= SEMDEDUP_TAU)
        .groupBy("b_id")
        .agg(F.max("_cos").alias("max_cos_prior"))
    )
    return assign.join(dups, assign.vec_id == dups.b_id, "left").select(
        "vec_id",
        "centroid_id",
        F.col("max_cos_prior").isNull().alias("keep"),
        "max_cos_prior",
    )


def semdedup_sql(k: int = SEMDEDUP_K) -> str:
    """DuckDB oracle twin of ``semdedup_prune`` at the same ``k`` —
    identical seeded centroid draw, identical 6dp-rounded assignment."""
    return f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
c AS (SELECT vec_id AS centroid_id, v AS c FROM e
      ORDER BY md5('cent:' || CAST(vec_id AS VARCHAR)), vec_id LIMIT {k}),
scored AS (
  SELECT vec_id, centroid_id,
         row_number() OVER (PARTITION BY vec_id
                            ORDER BY round(list_cosine_similarity(v, c), 6) DESC,
                                     centroid_id) AS rk
  FROM e, c
),
assign AS (SELECT vec_id, centroid_id FROM scored WHERE rk = 1),
dups AS (
  SELECT b.vec_id AS b_id,
         max(round(list_cosine_similarity(ea.v, eb.v), 6)) AS max_cos_prior
  FROM assign a
  JOIN assign b ON a.centroid_id = b.centroid_id AND a.vec_id < b.vec_id
  JOIN e ea ON ea.vec_id = a.vec_id
  JOIN e eb ON eb.vec_id = b.vec_id
  WHERE round(list_cosine_similarity(ea.v, eb.v), 6) >= {SEMDEDUP_TAU}
  GROUP BY b.vec_id
)
SELECT s.vec_id, s.centroid_id, d.max_cos_prior IS NULL AS keep, d.max_cos_prior
FROM assign s LEFT JOIN dups d ON s.vec_id = d.b_id
"""


SEMDEDUP_SQL = semdedup_sql()


QUERIES = {
    "neardup_clusters": neardup_clusters,
    "neardup_clusters_star": neardup_clusters_star,
    "dataset_split_assign": dataset_split_assign,
    "stratified_sample_per_group": stratified_sample_per_group,
    "pack_sequences": pack_sequences,
    "semdedup_prune": semdedup_prune,
}

ORACLES = {
    "neardup_clusters": NEARDUP_CLUSTERS_SQL,
    "neardup_clusters_star": NEARDUP_CLUSTERS_SQL,
    "dataset_split_assign": SPLIT_ASSIGN_SQL,
    "stratified_sample_per_group": STRATIFIED_SAMPLE_SQL,
    "pack_sequences": PACK_SEQUENCES_SQL,
    "semdedup_prune": SEMDEDUP_SQL,
}
