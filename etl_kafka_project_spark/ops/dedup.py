"""Deduplication operators over ``documents`` / ``embeddings`` — the
core of a pretraining-data pipeline at 100 TB:

* **exact** — hash-groupBy on sha256(text): one shuffle, map-side
  partial agg, scales linearly,
* **MinHash + LSH** — word-3-gram shingles → 8 md5-minhashes → 4 bands
  of 2 → candidate pairs = docs sharing a band bucket. The band join is
  an equi-join on the bucket hash, so at scale it shuffles only
  candidates, never the O(n²) pair space,
* **SimHash** — 16-bit fingerprint: per-token md5 bits weighted ±1,
  sign-aggregated per bit (explode × bit grid — associative sums, fully
  parallel),
* **n-gram Jaccard** — exact shingle-set similarity on an explicit pair
  list (here: adjacent doc ids; in production: the LSH candidates),
* **embedding cosine** — near-dup by vector similarity on a pair list.

Everything is built-in JVM expressions (higher-order array functions,
md5, explode); md5 is used as the hash family because Spark and DuckDB
agree on it byte-for-byte, which makes every stage oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etl_kafka_project_spark.ops import load

N_HASHES = 8
N_BANDS = 4  # bands of 2 hashes each

#: Degenerate-bucket guard for the LSH pair explodes. A bucket is a
#: near-dup cluster, so membership SHOULD be small — but a corpus that
#: skipped exact dedup can put millions of byte-identical docs in one
#: bucket, which would grow a single non-spillable ``collect_set`` buffer
#: and an O(n²) explode on one reducer row (the hot-key OOM pattern the
#: fold explicitly avoids). Buckets larger than this are dropped BEFORE
#: the collect (spillable window count over the same hash partitioning —
#: no extra scan or exchange), bounding both the buffer (≤ cap ids) and
#: the explode (≤ cap² pairs). Contract: run ``dedup_exact`` first —
#: exact duplicates always share every band bucket, so after exact dedup
#: a > MAX_LSH_BUCKET bucket is hash-collision noise, not signal.
MAX_LSH_BUCKET = 10_000


def _cap_buckets(bands: DataFrame, cap: int) -> DataFrame:
    """Drop members of oversized (band, bucket) groups before collecting.

    Window count shares the groupBy's hash partitioning, so Catalyst
    plans ONE exchange for count + filter + the downstream collect."""
    n = F.count(F.lit(1)).over(Window.partitionBy("band", "bucket"))
    return bands.withColumn("_n", n).filter(F.col("_n") <= cap).drop("_n")

#: word 3-gram shingles over a pre-staged token-array column ``_toks``
#: (falls back to the whole text for degenerate short docs). The token
#: array MUST be staged in its own projection first (``_grams_staged``):
#: referencing ``split(lower(text), ' ')`` inline here would re-tokenize
#: the full text once per ``element_at`` inside the lambda — Catalyst's
#: subexpression elimination does not hoist across lambda scope, so the
#: inline form is O(words²) per document (measured 9.5x slower at sf0.1).
_GRAMS = (
    "CASE WHEN size(_toks) >= 3 THEN"
    " transform(sequence(1, size(_toks) - 2),"
    "  i -> concat(element_at(_toks, i), ' ',"
    "              element_at(_toks, i + 1), ' ',"
    "              element_at(_toks, i + 2)))"
    " ELSE array(lower(text)) END"
)


def _grams_staged(d: DataFrame) -> DataFrame:
    """Stage ``_toks`` then project ``_grams`` in two steps.

    Two projections on purpose: ``split`` is not cheap, so Spark's
    CollapseProject keeps the stage boundary instead of inlining the
    tokenizer back into every lambda reference."""
    return d.withColumn("_toks", F.split(F.lower("text"), " ")).withColumn(
        "_grams", F.expr(_GRAMS)
    )

_GRAMS_SQL = (
    "CASE WHEN len(string_split(lower(text), ' ')) >= 3 THEN"
    " list_transform(range(1, len(string_split(lower(text), ' ')) - 1),"
    "  i -> string_split(lower(text), ' ')[i] || ' ' ||"
    "       string_split(lower(text), ' ')[i+1] || ' ' ||"
    "       string_split(lower(text), ' ')[i+2])"
    " ELSE [lower(text)] END"
)


def dedup_exact(spark: SparkSession, sf: str) -> DataFrame:
    """Exact dedup: keep the lowest doc_id per identical text."""
    d = load(spark, sf, "documents")
    return (
        d.groupBy(F.sha2("text", 256).alias("content_sha256"))
        .agg(F.min("doc_id").alias("keeper_doc_id"), F.count(F.lit(1)).alias("n_copies"))
    )


DEDUP_EXACT_SQL = """
SELECT sha256(text) AS content_sha256, min(doc_id) AS keeper_doc_id,
       count(*) AS n_copies
FROM documents GROUP BY sha256(text)
"""


def minhash_signatures(spark: SparkSession, sf: str) -> DataFrame:
    """8-hash MinHash signature per document (md5 hash family).

    Tokens and shingles are each staged in ONE column first so the
    tokenizer runs once per document — not once per gram element, and
    the gram builder not once per hash function (measured ~8x less
    expression work at sf0.1 for the gram staging, then another ~9.5x
    for the token staging — see ``_GRAMS``)."""
    d = _grams_staged(load(spark, sf, "documents"))
    mh = [
        F.expr(f"array_min(transform(_grams, g -> md5(concat('{j}:', g))))").alias(f"mh{j}")
        for j in range(N_HASHES)
    ]
    return d.select("doc_id", *mh)


_MH_SQL_COLS = ",\n       ".join(
    f"list_min(list_transform({_GRAMS_SQL}, g -> md5('{j}:' || g))) AS mh{j}"
    for j in range(N_HASHES)
)
MINHASH_SQL = f"SELECT doc_id,\n       {_MH_SQL_COLS}\nFROM documents"


def lsh_candidate_pairs(spark: SparkSession, sf: str) -> DataFrame:
    """LSH banding: docs sharing any (band, bucket) become a candidate
    pair — the scale path for near-dup detection.

    Single-pass shape (round-2 fix): ONE documents scan → signatures →
    exploded band buckets → ``groupBy(band, bucket)`` collecting the
    bucket's doc ids → in-bucket pair explode → distinct. The round-1
    bands⋈bands self-join recomputed the whole 8-hash MinHash lineage
    on BOTH join sides — at 100 TB that doubles the most expensive map
    stage of the pipeline. Bucket membership lists are small by design
    (a bucket is a near-dup cluster), so ``collect_set`` per bucket is
    bounded and the pair explode is quadratic only within a bucket —
    exactly the candidate set LSH promises, never O(n²) overall.
    Degenerate buckets (> MAX_LSH_BUCKET members — possible only when
    exact dedup was skipped) are dropped pre-collect, see _cap_buckets."""
    sig = minhash_signatures(spark, sf)
    band_structs = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.md5(F.concat(F.col(f"mh{2 * b}"), F.col(f"mh{2 * b + 1}"), F.lit(f":{b}"))).alias(
                    "bucket"
                ),
            )
            for b in range(N_BANDS)
        ]
    )
    bands = sig.select("doc_id", F.explode(band_structs).alias("bb")).select(
        "doc_id", "bb.band", "bb.bucket"
    )
    buckets = _cap_buckets(bands, MAX_LSH_BUCKET).groupBy("band", "bucket").agg(
        F.array_sort(F.collect_set("doc_id")).alias("ids")
    )
    pair = F.explode(
        F.expr(
            "flatten(transform(ids, (a, i) ->"
            " transform(slice(ids, i + 2, size(ids)), b ->"
            " struct(a AS doc_a, b AS doc_b))))"
        )
    ).alias("p")
    return (
        buckets.filter(F.size("ids") > 1)
        .select(pair)
        .select("p.doc_a", "p.doc_b")
        .distinct()
    )


_BAND_SQL = "\nUNION ALL\n".join(
    f"SELECT doc_id, {b} AS band, md5(mh{2 * b} || mh{2 * b + 1} || ':{b}') AS bucket FROM sig"
    for b in range(N_BANDS)
)
# The oracle mirrors _cap_buckets: members of (band, bucket) groups
# larger than MAX_LSH_BUCKET are excluded BEFORE pairing, so Spark and
# DuckDB compute the same relation on degenerate corpora too.
LSH_PAIRS_SQL = f"""
WITH sig AS ({MINHASH_SQL}),
bands0 AS ({_BAND_SQL}),
bands AS (
  SELECT doc_id, band, bucket FROM (
    SELECT doc_id, band, bucket,
           count(*) OVER (PARTITION BY band, bucket) AS _n
    FROM bands0
  ) WHERE _n <= {MAX_LSH_BUCKET}
)
SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
FROM bands a JOIN bands b ON a.band = b.band AND a.bucket = b.bucket
WHERE a.doc_id < b.doc_id
"""


def _simhash_df(spark: SparkSession, sf: str, n_bits: int, out_col: str) -> DataFrame:
    """n-bit SimHash: per-token md5-derived hash, each bit weighted ±1
    and sign-aggregated; near-dups land at small hamming distance."""
    d = load(spark, sf, "documents")
    tok = d.select(
        "doc_id", F.explode(F.split(F.lower("text"), " ")).alias("tok")
    ).withColumn(
        "h", F.conv(F.substring(F.md5("tok"), 1, n_bits // 4), 16, 10).cast("long")
    )
    bits = tok.select(
        "doc_id", "h", F.explode(F.sequence(F.lit(0), F.lit(n_bits - 1))).alias("k")
    ).withColumn(
        "contrib",
        2 * F.pmod(F.floor(F.col("h") / F.pow(F.lit(2.0), F.col("k"))).cast("long"), 2) - 1,
    )
    per_bit = bits.groupBy("doc_id", "k").agg(F.sum("contrib").alias("s"))
    return per_bit.groupBy("doc_id").agg(
        F.sum(
            F.when(F.col("s") > 0, F.pow(F.lit(2.0), F.col("k")).cast("long")).otherwise(0)
        ).alias(out_col)
    )


def simhash(spark: SparkSession, sf: str) -> DataFrame:
    """16-bit SimHash (kept at 16 bits for bench continuity; the LSH
    pairing below uses the 32-bit variant for sparser buckets)."""
    return _simhash_df(spark, sf, 16, "simhash16")


def _simhash_sql(n_bits: int, out_col: str) -> str:
    return f"""
WITH tok AS (
  SELECT doc_id, CAST(('0x' || substr(md5(t.tok), 1, {n_bits // 4})) AS BIGINT) AS h
  FROM documents, unnest(string_split(lower(text), ' ')) AS t(tok)
),
bits AS (
  SELECT doc_id, k.k,
         2 * (CAST(floor(h / power(2, k.k)) AS BIGINT) % 2) - 1 AS contrib
  FROM tok, unnest(range(0, {n_bits})) AS k(k)
),
per_bit AS (SELECT doc_id, k, sum(contrib) AS s FROM bits GROUP BY doc_id, k)
SELECT doc_id,
       -- outer CAST: DuckDB sum(BIGINT) -> HUGEINT -> float64 in fetchdf(),
       -- which hash-mismatches Spark's int64; cast back to BIGINT
       CAST(sum(CASE WHEN s > 0 THEN CAST(power(2, k) AS BIGINT) ELSE 0 END) AS BIGINT) AS {out_col}
FROM per_bit GROUP BY doc_id
"""


SIMHASH_SQL = _simhash_sql(16, "simhash16")


def ngram_jaccard_adjacent(spark: SparkSession, sf: str) -> DataFrame:
    """Exact 3-gram Jaccard on an explicit pair list (adjacent ids here;
    the LSH candidates in production — same join shape)."""
    d = _grams_staged(load(spark, sf, "documents")).select(
        "doc_id", F.array_distinct("_grams").alias("grams")
    )
    a, b = d.alias("a"), d.alias("b")
    joined = a.join(b, F.col("b.doc_id") == F.col("a.doc_id") + 1)
    inter = F.size(F.array_intersect(F.col("a.grams"), F.col("b.grams")))
    union = F.size(F.array_union(F.col("a.grams"), F.col("b.grams")))
    jac = F.round(inter.cast("double") / union.cast("double"), 6)
    return joined.select(
        F.col("a.doc_id").alias("doc_a"),
        F.col("b.doc_id").alias("doc_b"),
        jac.alias("jaccard"),
        (jac >= 0.2).alias("near_dup"),
    )


JACCARD_SQL = f"""
WITH g AS (SELECT doc_id, list_distinct({_GRAMS_SQL}) AS grams FROM documents)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       round(CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE)
             / CAST(len(list_distinct(list_concat(a.grams, b.grams))) AS DOUBLE), 6) AS jaccard,
       round(CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE)
             / CAST(len(list_distinct(list_concat(a.grams, b.grams))) AS DOUBLE), 6) >= 0.2 AS near_dup
FROM g a JOIN g b ON b.doc_id = a.doc_id + 1
"""


def embedding_neardup_adjacent(spark: SparkSession, sf: str) -> DataFrame:
    """Embedding-cosine near-dup on an explicit pair list."""
    e = load(spark, sf, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    a, b = e.alias("a"), e.alias("b")
    joined = a.join(b, F.col("b.vec_id") == F.col("a.vec_id") + 1)
    dot = F.expr("aggregate(zip_with(a.v, b.v, (x, y) -> x * y), 0D, (acc, x) -> acc + x)")
    na = F.expr("sqrt(aggregate(a.v, 0D, (acc, x) -> acc + x * x))")
    nb = F.expr("sqrt(aggregate(b.v, 0D, (acc, x) -> acc + x * x))")
    cos = F.round(dot / (na * nb), 6)
    return joined.select(
        F.col("a.vec_id").alias("vec_a"),
        F.col("b.vec_id").alias("vec_b"),
        cos.alias("cosine"),
        (cos >= 0.9).alias("near_dup"),
    )


EMB_NEARDUP_SQL = """
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
       round(list_cosine_similarity(a.v, b.v), 6) AS cosine,
       round(list_cosine_similarity(a.v, b.v), 6) >= 0.9 AS near_dup
FROM e a JOIN e b ON b.vec_id = a.vec_id + 1
"""


def simhash_lsh_pairs(spark: SparkSession, sf: str) -> DataFrame:
    """SimHash near-dup at scale: band a 32-bit fingerprint into 4
    bytes; docs sharing any (band, byte) become candidates; exact
    Hamming distance is computed ONLY on candidates (``bit_count(xor)``)
    — the standard Hamming-LSH composition; any pair within distance d
    collides on >= 1 of 4 bands whenever d <= 3 (pigeonhole), so the
    near-dup set (hamming <= 3) has no false negatives. 32 bits (not
    the 16-bit ``simhash`` query) keeps bands sparse — 4-bit nibble
    buckets over 16 bits measured ~67k candidate pairs on 500 docs.
    Same single-scan ``groupBy(band, bucket)`` + in-bucket pair explode
    shape as the MinHash LSH (no self-join recomputation)."""
    sim = _simhash_df(spark, sf, 32, "simhash32")
    band_structs = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.shiftright(F.col("simhash32"), 8 * b).bitwiseAND(F.lit(255)).alias("bucket"),
            )
            for b in range(4)
        ]
    )
    bands = sim.select(
        F.struct("doc_id", "simhash32").alias("ds"), F.explode(band_structs).alias("bb")
    ).select("ds", "bb.band", "bb.bucket")
    buckets = _cap_buckets(bands, MAX_LSH_BUCKET).groupBy("band", "bucket").agg(
        F.array_sort(F.collect_set("ds")).alias("members")
    )
    pair = F.explode(
        F.expr(
            "flatten(transform(members, (a, i) ->"
            " transform(slice(members, i + 2, size(members)), b ->"
            " struct(a AS a, b AS b))))"
        )
    ).alias("p")
    return (
        buckets.filter(F.size("members") > 1)
        .select(pair)
        .select(
            F.col("p.a.doc_id").alias("doc_a"),
            F.col("p.b.doc_id").alias("doc_b"),
            F.expr("bit_count(p.a.simhash32 ^ p.b.simhash32)").alias("hamming"),
        )
        .distinct()
        .withColumn("near_dup", F.col("hamming") <= 3)
    )


_SIMBANDS_SQL = "\nUNION ALL\n".join(
    f"SELECT doc_id, simhash32, {b} AS band,"
    f" (simhash32 >> {8 * b}) & 255 AS bucket FROM sim"
    for b in range(4)
)
SIMHASH_LSH_SQL = f"""
WITH sim AS ({_simhash_sql(32, 'simhash32')}),
bands AS ({_SIMBANDS_SQL})
SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(bit_count(xor(a.simhash32, b.simhash32)) AS BIGINT) AS hamming,
       CAST(bit_count(xor(a.simhash32, b.simhash32)) AS BIGINT) <= 3 AS near_dup
FROM bands a JOIN bands b ON a.band = b.band AND a.bucket = b.bucket
WHERE a.doc_id < b.doc_id
"""


def embedding_lsh_neardup(spark: SparkSession, sf: str) -> DataFrame:
    """Embedding near-dup at scale: hyperplane-LSH bucket assignment
    (each vector lands in exactly ONE 4-bit bucket) then exact cosine
    only within buckets — the production composition of
    ``ann_lsh_buckets`` + ``embedding_neardup_adjacent``. A plain
    equi-self-join is the right shape HERE (unlike the MinHash LSH):
    membership is single-bucket so each pair appears once, and the
    recomputed lineage is one cheap projection, not an 8-hash tree."""
    from etl_kafka_project_spark.ops.similarity import ann_lsh_buckets

    e = load(spark, sf, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    withb = ann_lsh_buckets(spark, sf).join(e, "vec_id")
    a, b = withb.alias("a"), withb.alias("b")
    dot = F.expr("aggregate(zip_with(a.v, b.v, (x, y) -> x * y), 0D, (acc, x) -> acc + x)")
    na = F.expr("sqrt(aggregate(a.v, 0D, (acc, x) -> acc + x * x))")
    nb = F.expr("sqrt(aggregate(b.v, 0D, (acc, x) -> acc + x * x))")
    cos = F.round(dot / (na * nb), 6)
    return (
        a.join(b, (F.col("a.bucket") == F.col("b.bucket")) & (F.col("a.vec_id") < F.col("b.vec_id")))
        .select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            F.col("a.bucket").alias("bucket"),
            cos.alias("cosine"),
            (cos >= 0.9).alias("near_dup"),
        )
    )


def _emb_lsh_sql() -> str:
    from etl_kafka_project_spark.ops.similarity import ANN_LSH_SQL

    return f"""
WITH buckets AS ({ANN_LSH_SQL}),
ev AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
m AS (SELECT b.vec_id, b.bucket, ev.v FROM buckets b JOIN ev ON b.vec_id = ev.vec_id)
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, a.bucket AS bucket,
       round(list_cosine_similarity(a.v, b.v), 6) AS cosine,
       round(list_cosine_similarity(a.v, b.v), 6) >= 0.9 AS near_dup
FROM m a JOIN m b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
"""


#: span width (words) for the exact-substring pass — the operator
#: DEFAULT is the Lee-et-al-faithful 50 tokens (the paper's suffix-array
#: match threshold).  ``K`` is a parameter of every exact-substring
#: entry point; the REGISTERED fixture queries pin ``k=FIXTURE_SUBSTR_K``
#: because the synthetic corpus's planted near-dups share much shorter
#: runs, so 8 keeps both branches populated at test scale.
SUBSTR_K = 50
FIXTURE_SUBSTR_K = 8


def exact_substring_dup(
    spark: SparkSession, sf: str, k: int = SUBSTR_K
) -> DataFrame:
    """Exact-substring duplication (Lee et al. 2022, "Deduplicating
    Training Data Makes Language Models Better" — ExactSubstr), relaxed
    from suffix arrays to Spark-native fixed-``K``-word span hashing:
    a span duplicated verbatim in ≥2 documents marks copied text that
    MinHash's whole-document similarity misses (e.g. a license header
    pasted into otherwise-distinct files). Emits per document its span
    count, how many of its spans are corpus-duplicated, and the
    duplicated fraction.

    Scale shape: ONE corpus scan, three narrow shuffles. Tokenize +
    hash once (32-hex md5 keys shuffle, never the 8-word strings), then
    (1) ``groupBy(h, doc_id)`` two-phase occurrence count, (2) the
    ≥2-docs test as a window count over ``h`` on the already-collapsed
    (hash, doc) rows, (3) ``groupBy(doc_id)`` conditional-sum rollup.
    The naive three-branch form (dup-set + total + join-back, each a
    separate consumer of the aggregate) re-scans and re-tokenizes the
    corpus three times — Catalyst plans no ReusedExchange across the
    branches — so the single linear pipeline is the shape that survives
    100 TB: scans dominate there, and this does exactly one. Nothing is
    O(n²): a suffix array's arbitrary-length matches are traded for
    fixed-K granularity so the whole pass is hash-partitioned.

    The span hashing is shared with the positional view
    (``_span_hashes_with_pos``) so the rollup and ``exact_substring_spans``
    stay byte-identical on tokenization and the short-doc convention."""
    d = load(spark, sf, "documents").select("doc_id", "text")
    g = _span_hashes_with_pos(d, k).select("doc_id", "h")
    per_doc_h = g.groupBy("h", "doc_id").agg(F.count(F.lit(1)).alias("n_occ"))
    n_docs = F.count(F.lit(1)).over(Window.partitionBy("h"))
    flagged = per_doc_h.withColumn("_dup", n_docs >= 2)
    out = flagged.groupBy("doc_id").agg(
        F.sum("n_occ").alias("n_spans"),
        F.sum(F.when(F.col("_dup"), F.col("n_occ")).otherwise(F.lit(0))).alias(
            "n_dup_spans"
        ),
    )
    frac = F.round(
        F.col("n_dup_spans").cast("double") / F.col("n_spans").cast("double"), 6
    )
    return out.withColumn("dup_span_frac", frac).withColumn(
        "near_exact_dup", F.col("dup_span_frac") >= 0.5
    )


def exact_substr_sql(k: int = SUBSTR_K) -> str:
    """DuckDB oracle twin of ``exact_substring_dup`` at the same ``k``."""
    return f"""
WITH toks AS (SELECT doc_id, text, string_split(lower(text), ' ') AS t FROM documents),
g AS (
  SELECT doc_id,
         CASE WHEN len(t) >= {k}
              THEN md5(list_aggregate(t[i:i+{k - 1}], 'string_agg', ' '))
              ELSE md5(lower(text)) END AS h
  FROM toks, unnest(range(1, greatest(len(t) - {k - 2}, 2))) AS r(i)
  WHERE len(t) >= {k} OR i = 1
),
pdh AS (SELECT h, doc_id, count(*) AS n_occ FROM g GROUP BY h, doc_id),
dup AS (SELECT h FROM pdh GROUP BY h HAVING count(*) >= 2),
tot AS (SELECT doc_id, sum(n_occ) AS n_spans FROM pdh GROUP BY doc_id),
dupc AS (SELECT doc_id, sum(n_occ) AS n_dup_spans
         FROM pdh JOIN dup USING (h) GROUP BY doc_id)
SELECT t.doc_id, CAST(t.n_spans AS BIGINT) AS n_spans,
       CAST(coalesce(d.n_dup_spans, 0) AS BIGINT) AS n_dup_spans,
       round(CAST(coalesce(d.n_dup_spans, 0) AS DOUBLE)
             / CAST(t.n_spans AS DOUBLE), 6) AS dup_span_frac,
       round(CAST(coalesce(d.n_dup_spans, 0) AS DOUBLE)
             / CAST(t.n_spans AS DOUBLE), 6) >= 0.5 AS near_exact_dup
FROM tot t LEFT JOIN dupc d USING (doc_id)
"""


EXACT_SUBSTR_SQL = exact_substr_sql(FIXTURE_SUBSTR_K)


def _span_hashes_with_pos(df: DataFrame, k: int, text_col: str = "text"):
    """Explode ``text_col`` into (pos, h) rows: ``pos`` is the 1-based
    token index where a ``k``-token span starts, ``h`` its md5.  Docs
    shorter than ``k`` tokens contribute one whole-doc hash at pos=1 —
    the same convention as ``exact_substring_dup``.  Row-local: the only
    shuffled payload downstream is the 32-hex hash + two ints."""
    d = df.withColumn("_toks", F.split(F.lower(text_col), " "))
    spans = (
        f"CASE WHEN size(_toks) >= {k} THEN"
        f" transform(sequence(1, size(_toks) - {k - 1}),"
        f"  i -> struct(i AS pos, md5(concat_ws(' ', slice(_toks, i, {k}))) AS h))"
        f" ELSE array(struct(1 AS pos, md5(lower({text_col})) AS h)) END"
    )
    return d.select(
        "*", F.explode(F.expr(spans)).alias("_s")
    ).select(*df.columns, F.col("_s.pos").alias("pos"), F.col("_s.h").alias("h"))


def substring_spans(docs: DataFrame, k: int) -> DataFrame:
    """Positions of corpus-duplicated exact spans over any ``(doc_id,
    text)`` frame — the artifact Lee et al.'s pipeline actually
    consumes: their ExactSubstr pass REMOVES the duplicated bytes
    (keeping one occurrence), rather than dropping whole documents, so
    the dup detector must emit WHERE each duplicate sits, not just
    per-doc counts (`exact_substring_dup` is the rollup view of the
    same spans).

    Emits one row per OCCURRENCE of a span whose hash appears in ≥2
    documents — including repeat occurrences inside one document, which
    a removal pass must also drop: (doc_id, pos [1-based token index],
    span_md5, n_docs, is_keeper).  The keeper — the single occurrence
    corpus-wide spared by a removal pass — is elected deterministically
    as the (min doc_id, min pos) occurrence of each hash, the repo's
    standard min-id convention, so retries and cross-engine runs agree.

    Scale shape: one corpus scan; hashes + two ints shuffle, never
    text.  ``groupBy(h, doc_id)`` collapses per-doc occurrences into a
    bounded position set (≤ tokens-per-doc entries), ONE window over the
    collapsed rows computes n_docs and the keeper rank, and the
    positions re-explode after the ≥2-docs filter — the window input
    stays one row per (hash, doc) regardless of in-doc multiplicity."""
    g = _span_hashes_with_pos(docs.select("doc_id", "text"), k).select(
        "doc_id", "pos", "h"
    )
    per_doc = g.groupBy("h", "doc_id").agg(
        F.min("pos").alias("_min_pos"),
        F.collect_set("pos").alias("_positions"),
    )
    w = Window.partitionBy("h")
    wk = Window.partitionBy("h").orderBy("doc_id", "_min_pos")
    flagged = (
        per_doc.withColumn("n_docs", F.count(F.lit(1)).over(w))
        .withColumn("_rk", F.row_number().over(wk))
        .filter(F.col("n_docs") >= 2)
    )
    return flagged.select(
        "doc_id",
        F.explode("_positions").alias("pos"),
        F.col("h").alias("span_md5"),
        F.col("n_docs").cast("long").alias("n_docs"),
        "_rk",
        "_min_pos",
    ).select(
        "doc_id",
        "pos",
        "span_md5",
        "n_docs",
        ((F.col("_rk") == 1) & (F.col("pos") == F.col("_min_pos"))).alias(
            "is_keeper"
        ),
    )


def exact_substring_spans(
    spark: SparkSession, sf: str, k: int = FIXTURE_SUBSTR_K
) -> DataFrame:
    """`substring_spans` over the ``documents`` table (the registered
    query form — see `substring_spans` for semantics and scale shape)."""
    return substring_spans(load(spark, sf, "documents"), k)


def exact_substr_spans_sql(k: int = FIXTURE_SUBSTR_K) -> str:
    """DuckDB oracle twin of ``exact_substring_spans`` at the same ``k``."""
    return f"""
WITH toks AS (SELECT doc_id, text, string_split(lower(text), ' ') AS t FROM documents),
g AS (
  SELECT doc_id, CAST(i AS BIGINT) AS pos,
         CASE WHEN len(t) >= {k}
              THEN md5(list_aggregate(t[i:i+{k - 1}], 'string_agg', ' '))
              ELSE md5(lower(text)) END AS h
  FROM toks, unnest(range(1, greatest(len(t) - {k - 2}, 2))) AS r(i)
  WHERE len(t) >= {k} OR i = 1
),
pd AS (SELECT h, doc_id, min(pos) AS min_pos FROM g GROUP BY h, doc_id),
ranked AS (
  SELECT doc_id, min_pos, h,
         count(*) OVER (PARTITION BY h) AS n_docs,
         row_number() OVER (PARTITION BY h ORDER BY doc_id, min_pos) AS rk
  FROM pd
)
SELECT g.doc_id, g.pos, g.h AS span_md5, CAST(r.n_docs AS BIGINT) AS n_docs,
       (r.rk = 1 AND g.pos = r.min_pos) AS is_keeper
FROM g JOIN ranked r ON g.h = r.h AND g.doc_id = r.doc_id
WHERE r.n_docs >= 2
"""


def remove_dup_spans(
    docs: DataFrame, spans: DataFrame, k: int, text_col: str = "text"
) -> DataFrame:
    """Span-REMOVAL composition (the second half of Lee et al.'s
    ExactSubstr pipeline): given ``substring_spans`` output, drop from
    each document every token covered by a duplicated-span occurrence it
    does NOT keep, and return the docs with ``dedup_text`` (the
    surviving tokens re-joined, ORIGINAL case — lowercasing exists only
    inside the hash matching, and it never moves token boundaries, so
    the positions index identically into the original-case tokens) plus
    ``n_removed_tokens``.

    Guarantee (exact): every token covered by a non-keeper occurrence
    is removed, so AT MOST one copy of each duplicated span survives
    corpus-wide.  "At most", not "exactly": when two different
    duplicated spans overlap, removing a non-keeper occurrence of one
    can truncate the other's keeper occurrence (e.g. docs ``b c`` /
    ``a b c`` / ``a b`` at k=2 — doc1's non-keeper ``b c`` overlaps its
    keeper ``a b``), and re-joining the survivors can in principle
    form new k-grams; a fixpoint pass re-runs detector + removal until
    no duplicated span remains.  Lee et al.'s own removal has the same
    overlap interactions — the pipeline property that matters is that
    duplicated text mass strictly shrinks.

    Scale shape: one groupBy(doc_id) collapses each doc's non-keeper
    span starts into an array (O(spans-per-doc), bounded by doc length),
    one equi-join back to the docs on doc_id, then the coverage test is
    a row-local higher-order ``filter`` over the token array — text
    never shuffles with the spans, and docs with no duplicated spans
    pass through the left join untouched."""
    starts = (
        spans.filter(~F.col("is_keeper"))
        .groupBy("doc_id")
        .agg(F.collect_set("pos").alias("_starts"))
    )
    d = docs.join(starts, "doc_id", "left").withColumn(
        "_toks", F.split(F.col(text_col), " ")
    )
    # token at 1-based index i survives unless some start s covers it:
    # s <= i < s + k  (a short doc's whole-doc span has s=1, k>=len)
    kept = F.expr(
        "CASE WHEN _starts IS NULL THEN _toks ELSE "
        " filter(transform(_toks, (t, i) ->"
        "   CASE WHEN exists(_starts, s -> s <= i + 1 AND i + 1 < s + "
        f"{k}) THEN NULL ELSE t END), t -> t IS NOT NULL) END"
    )
    return (
        d.withColumn("_kept", kept)
        .withColumn("dedup_text", F.concat_ws(" ", "_kept"))
        .withColumn(
            "n_removed_tokens",
            (F.size("_toks") - F.size("_kept")).cast("long"),
        )
        .drop("_starts", "_toks", "_kept")
    )


def remove_dup_spans_fixpoint(
    docs: DataFrame, k: int, max_iters: int = 8, text_col: str = "text"
) -> DataFrame:
    """Iterate ``substring_spans`` + ``remove_dup_spans`` until no
    duplicated span remains (or ``max_iters``): the closure of the
    single removal pass over its two residual shapes — overlapping
    spans truncating keepers, and re-joined survivors forming new
    k-grams. Each round strictly removes ≥1 token from every doc still
    carrying a non-keeper occurrence, so the loop terminates in at most
    O(max doc tokens / 1) rounds; real corpora converge in 1-2.

    Driver-side loop over fully distributed passes (the standard Spark
    shape for iterative algorithms — each iteration is one scan + the
    narrow span shuffles); the convergence probe is a count() on the
    narrow spans frame, never on text. Returns (doc_id, dedup_text,
    n_removed_tokens [cumulative], n_rounds)."""
    cur = docs.select("doc_id", F.col(text_col).alias("text"))
    removed = None
    rounds = 0
    for _ in range(max_iters):
        spans = substring_spans(cur, k)
        if spans.limit(1).count() == 0:
            break
        rounds += 1
        out = remove_dup_spans(cur, spans, k)
        step = out.select("doc_id", "n_removed_tokens")
        removed = (
            step
            if removed is None
            else removed.join(step.withColumnRenamed("n_removed_tokens", "_r"), "doc_id")
            .select("doc_id", (F.col("n_removed_tokens") + F.col("_r")).alias("n_removed_tokens"))
        )
        # localCheckpoint truncates the growing iterative lineage (the
        # standard guard against plan-depth blowup in driver loops)
        cur = out.select(
            "doc_id", F.col("dedup_text").alias("text")
        ).localCheckpoint(eager=False)
    if removed is None:
        removed = docs.select("doc_id", F.lit(0).cast("long").alias("n_removed_tokens"))
    return (
        cur.join(removed, "doc_id", "left")
        .select(
            "doc_id",
            F.col("text").alias("dedup_text"),
            F.coalesce("n_removed_tokens", F.lit(0)).cast("long").alias("n_removed_tokens"),
            F.lit(rounds).cast("long").alias("n_rounds"),
        )
    )


QUERIES = {
    "dedup_exact": dedup_exact,
    "minhash_signatures": minhash_signatures,
    "lsh_candidate_pairs": lsh_candidate_pairs,
    "simhash": simhash,
    "simhash_lsh_pairs": simhash_lsh_pairs,
    "ngram_jaccard_adjacent": ngram_jaccard_adjacent,
    "embedding_neardup_adjacent": embedding_neardup_adjacent,
    "embedding_lsh_neardup": embedding_lsh_neardup,
    # registered fixture queries pin k=FIXTURE_SUBSTR_K (the operator
    # default is the paper-faithful SUBSTR_K=50, degenerate on the short
    # synthetic docs); the oracles below are generated at the same k
    "exact_substring_dup": lambda spark, sf: exact_substring_dup(
        spark, sf, k=FIXTURE_SUBSTR_K
    ),
    "exact_substring_spans": exact_substring_spans,
}

ORACLES = {
    "dedup_exact": DEDUP_EXACT_SQL,
    "minhash_signatures": MINHASH_SQL,
    "lsh_candidate_pairs": LSH_PAIRS_SQL,
    "simhash": SIMHASH_SQL,
    "simhash_lsh_pairs": SIMHASH_LSH_SQL,
    "ngram_jaccard_adjacent": JACCARD_SQL,
    "embedding_neardup_adjacent": EMB_NEARDUP_SQL,
    "embedding_lsh_neardup": _emb_lsh_sql(),
    "exact_substring_dup": EXACT_SUBSTR_SQL,
    "exact_substring_spans": exact_substr_spans_sql(),
}
