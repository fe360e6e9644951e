"""Text-analysis operators over ``documents`` — the content-bearing
pipeline a training-data engine needs (language-ID, quality scoring,
token counting, fingerprinting, content hashing). All JVM-side built-ins
(split / regexp / higher-order array functions) — no Python in the row
path; the pandas-UDF sha256 variant lives in ``functions/hashing.py`` and
is cross-checked in tests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_kafka_project_spark.ops import load

#: BPE-ish pre-tokenizer: letter runs | digit runs | single punctuation
BPE_RE = r"[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]"

STOPWORDS = ("the", "a", "of", "and", "to", "in")

def _toks() -> F.Column:
    return F.split(F.lower(F.col("text")), " ")


_TOKS_SQL = "string_split(lower(text), ' ')"


def token_stats(spark: SparkSession, sf: str) -> DataFrame:
    """Whitespace + BPE-ish token counts and mean token length."""
    d = load(spark, sf, "documents")
    n_ws = F.size(_toks())
    n_bpe = F.size(F.regexp_extract_all(F.col("text"), F.lit(BPE_RE), 0))
    nospace = F.length(F.regexp_replace(F.col("text"), " ", ""))
    return d.select(
        "doc_id",
        n_ws.alias("n_ws_tokens"),
        n_bpe.alias("n_bpe_tokens"),
        F.round(nospace.cast("double") / n_ws.cast("double"), 4).alias("mean_token_len"),
    )


TOKEN_STATS_SQL = f"""
SELECT doc_id,
       len({_TOKS_SQL}) AS n_ws_tokens,
       len(regexp_extract_all(text, '{BPE_RE}')) AS n_bpe_tokens,
       round(CAST(length(regexp_replace(text, ' ', '', 'g')) AS DOUBLE)
             / CAST(len({_TOKS_SQL}) AS DOUBLE), 4) AS mean_token_len
FROM documents
"""


def quality_score(spark: SparkSession, sf: str) -> DataFrame:
    """Heuristic document quality: length saturation, stopword ratio,
    vocabulary diversity — the usual pretraining-filter features."""
    d = load(spark, sf, "documents")
    n_tok = F.size(_toks())
    stop_list = ", ".join(f"'{w}'" for w in STOPWORDS)
    n_stop = F.expr(
        f"size(filter(split(lower(text), ' '), t -> t IN ({stop_list})))"
    )
    n_uniq = F.size(F.array_distinct(_toks()))
    stop_ratio = F.round(n_stop.cast("double") / n_tok.cast("double"), 4)
    diversity = F.round(n_uniq.cast("double") / n_tok.cast("double"), 4)
    len_sat = F.round(F.least(F.length("text"), F.lit(500)).cast("double") / 500.0, 4)
    # composite score in INTEGER basis (components × 10000) so the two
    # engines never disagree on a round-half boundary; range 0..100000
    si = F.round(stop_ratio * 10000).cast("long")
    di = F.round(diversity * 10000).cast("long")
    li = F.round(len_sat * 10000).cast("long")
    quality = 4 * li + 3 * di + 3 * (10000 - F.least(2 * si, F.lit(10000)))
    return d.select(
        "doc_id",
        n_tok.alias("n_tokens"),
        stop_ratio.alias("stopword_ratio"),
        diversity.alias("diversity"),
        len_sat.alias("len_sat"),
        quality.alias("quality_scaled"),
    )


_STOP_SQL = ", ".join(f"'{w}'" for w in STOPWORDS)
QUALITY_SQL = f"""
SELECT doc_id, n_tokens, stopword_ratio, diversity, len_sat,
       4 * CAST(round(len_sat * 10000) AS BIGINT)
     + 3 * CAST(round(diversity * 10000) AS BIGINT)
     + 3 * (10000 - least(2 * CAST(round(stopword_ratio * 10000) AS BIGINT), 10000))
       AS quality_scaled
FROM (
  SELECT doc_id,
         len(toks) AS n_tokens,
         round(CAST(len(list_filter(toks, t -> t IN ({_STOP_SQL}))) AS DOUBLE)
               / CAST(len(toks) AS DOUBLE), 4) AS stopword_ratio,
         round(CAST(len(list_distinct(toks)) AS DOUBLE)
               / CAST(len(toks) AS DOUBLE), 4) AS diversity,
         round(CAST(least(length(text), 500) AS DOUBLE) / 500.0, 4) AS len_sat
  FROM (SELECT doc_id, text, {_TOKS_SQL} AS toks FROM documents)
)
"""

#: language marker words (n-gram-heuristic language ID). The synthetic
#: corpus is English-ish regardless of its ``lang`` label; the point is a
#: deterministic, cross-engine-checkable classifier shape.
LANG_MARKERS = {
    "en": ("the", "a", "of"),
    "de": ("der", "und", "das"),
    "es": ("el", "que", "los"),
    "fr": ("le", "et", "les"),
}


def language_id(spark: SparkSession, sf: str) -> DataFrame:
    d = load(spark, sf, "documents")
    scores = {}
    for lang, words in LANG_MARKERS.items():
        wl = ", ".join(f"'{w}'" for w in words)
        scores[lang] = F.expr(f"size(filter(split(lower(text), ' '), t -> t IN ({wl})))")
    pred = (
        F.when(scores["en"] >= F.greatest(scores["de"], scores["es"], scores["fr"]), "en")
        .when(scores["de"] >= F.greatest(scores["es"], scores["fr"]), "de")
        .when(scores["es"] >= scores["fr"], "es")
        .otherwise("fr")
    )
    return d.select(
        "doc_id",
        F.col("lang").alias("labeled_lang"),
        pred.alias("pred_lang"),
        *[scores[lang].alias(f"score_{lang}") for lang in LANG_MARKERS],
    )


def _lang_score_sql(lang: str) -> str:
    wl = ", ".join(f"'{w}'" for w in LANG_MARKERS[lang])
    return f"len(list_filter({_TOKS_SQL}, t -> t IN ({wl})))"


LANG_ID_SQL = f"""
SELECT doc_id, lang AS labeled_lang,
       CASE WHEN s_en >= greatest(s_de, s_es, s_fr) THEN 'en'
            WHEN s_de >= greatest(s_es, s_fr) THEN 'de'
            WHEN s_es >= s_fr THEN 'es'
            ELSE 'fr' END AS pred_lang,
       s_en AS score_en, s_de AS score_de, s_es AS score_es, s_fr AS score_fr
FROM (
  SELECT doc_id, lang,
         {_lang_score_sql('en')} AS s_en,
         {_lang_score_sql('de')} AS s_de,
         {_lang_score_sql('es')} AS s_es,
         {_lang_score_sql('fr')} AS s_fr
  FROM documents
)
"""


def sha256_documents(spark: SparkSession, sf: str) -> DataFrame:
    """The engine's per-row content invariant (input_hint) as a query."""
    d = load(spark, sf, "documents")
    return d.select("doc_id", F.sha2("text", 256).alias("content_sha256"))


SHA256_SQL = "SELECT doc_id, sha256(text) AS content_sha256 FROM documents"


def doc_fingerprint(spark: SparkSession, sf: str) -> DataFrame:
    """Winnowing-style fingerprint: the minimum hash over all 8-char
    shingles (one global window), plus a cheap md5 prefix. Robust to
    single-char edits anywhere except at the minimizing shingle."""
    d = load(spark, sf, "documents")
    min_shingle = F.expr(
        "array_min(transform(sequence(1, greatest(length(text) - 7, 1)),"
        " i -> md5(substring(text, i, 8))))"
    )
    return d.select(
        "doc_id",
        min_shingle.alias("winnow_fp"),
        F.substring(F.md5("text"), 1, 8).alias("md5_prefix"),
    )


FINGERPRINT_SQL = """
SELECT doc_id,
       list_min(list_transform(range(1, greatest(length(text) - 7, 1) + 1),
                               i -> md5(substr(text, i, 8)))) AS winnow_fp,
       substr(md5(text), 1, 8) AS md5_prefix
FROM documents
"""


def _quality_cols(text: F.Column) -> dict[str, F.Column]:
    """The quality-score feature expressions over an arbitrary text
    column (the frame-level form of ``quality_score``)."""
    toks = F.split(F.lower(text), " ")
    n_tok = F.size(toks)
    stop_list = ", ".join(f"'{w}'" for w in STOPWORDS)
    n_stop = F.size(F.filter(toks, lambda t: t.isin(*STOPWORDS)))
    n_uniq = F.size(F.array_distinct(toks))
    stop_ratio = F.round(n_stop.cast("double") / n_tok.cast("double"), 4)
    diversity = F.round(n_uniq.cast("double") / n_tok.cast("double"), 4)
    len_sat = F.round(F.least(F.length(text), F.lit(500)).cast("double") / 500.0, 4)
    si = F.round(stop_ratio * 10000).cast("long")
    di = F.round(diversity * 10000).cast("long")
    li = F.round(len_sat * 10000).cast("long")
    quality = 4 * li + 3 * di + 3 * (10000 - F.least(2 * si, F.lit(10000)))
    return {"n_tokens": n_tok, "quality_scaled": quality}


def corpus_filter_frame(
    df: DataFrame,
    id_cols: list[str],
    content_col: str = "text",
    lang_col: str = "lang",
    lang_value: str = "en",
    min_quality: int = 60000,
) -> DataFrame:
    """Frame-level pretraining corpus filter: exact-dedup (keep the
    lowest id tuple per identical content) ∘ language gate ∘ quality
    gate — over ANY content-bearing frame, so the same operator runs on
    the static ``documents`` table AND on the live lake table a CDC
    replay produces (the round-3 end-to-end composition). Gates are
    plain predicates Catalyst pushes to the scan; the dedup keeper is a
    partial-aggregated groupBy + an id equi-join. A single id keeps via
    plain ``min(id)`` — fixed-width buffer, so Catalyst plans
    HashAggregate; composite ids need ``min(struct(ids...))``, which
    hash agg cannot buffer and falls back to sort-based aggregation
    (still map-side partial, but sorts every partition — only paid when
    the key really is composite)."""
    text = F.col(content_col)
    qc = _quality_cols(text)
    grouped = df.groupBy(F.sha2(text, 256).alias("_sha"))
    if len(id_cols) == 1:
        keepers = grouped.agg(F.min(id_cols[0]).alias(id_cols[0])).select(id_cols[0])
    else:
        keepers = grouped.agg(F.min(F.struct(*id_cols)).alias("_keep")).select(
            *[F.col(f"_keep.{c}").alias(c) for c in id_cols]
        )
    return (
        df.join(keepers, id_cols)
        .filter(text.isNotNull() & (F.col(lang_col) == lang_value))
        .select(*id_cols, qc["n_tokens"].alias("n_tokens"), qc["quality_scaled"].alias("quality_scaled"))
        .filter(F.col("quality_scaled") >= min_quality)
    )


def pretrain_corpus_filter(spark: SparkSession, sf: str) -> DataFrame:
    """The pretraining-data pipeline end to end, as one declarative
    plan: exact-dedup (keep the lowest doc_id per identical content) ∘
    language gate (labeled 'en') ∘ quality gate (composite score) —
    i.e. the kept corpus a training run would actually read. Every
    stage is a prior oracle-checked operator; the composition shuffles
    once for the dedup groupBy and once for the keeper join."""
    return corpus_filter_frame(
        load(spark, sf, "documents"), ["doc_id"], "text", "lang", "en", 60000
    )


PRETRAIN_FILTER_SQL = f"""
WITH q AS ({QUALITY_SQL}),
keepers AS (
  SELECT min(doc_id) AS doc_id FROM documents GROUP BY sha256(text)
)
SELECT d.doc_id, q.n_tokens, q.quality_scaled
FROM documents d
JOIN keepers k ON d.doc_id = k.doc_id
JOIN q ON q.doc_id = d.doc_id
WHERE d.lang = 'en' AND q.quality_scaled >= 60000
"""


def distinctive_terms(spark: SparkSession, sf: str) -> DataFrame:
    """Per-document top-3 DISTINCTIVE terms: rank by term frequency in
    the doc (desc) then document frequency across the corpus (asc) then
    term (asc) — the tf-idf ranking with integer keys only, so the
    order (and the oracle hash) is engine-exact with no float-log
    jitter. Shape at scale: tokenize → (doc, term) count → term-level
    df (second small agg) → shuffle join on term → one window per doc.
    The vocabulary grows with the corpus, so the df side joins via
    shuffle (never broadcast); both aggs get map-side partials."""
    from pyspark.sql import Window

    d = load(spark, sf, "documents")
    tok = d.select("doc_id", F.explode(_toks()).alias("term")).filter(
        (F.length("term") >= 3) & ~F.col("term").isin(*STOPWORDS)
    )
    tf = tok.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    df_ = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    w = Window.partitionBy("doc_id").orderBy(
        F.col("tf").desc(), F.col("df").asc(), F.col("term").asc()
    )
    return (
        tf.join(df_, "term")
        .select("doc_id", "term", "tf", "df", F.row_number().over(w).alias("term_rank"))
        .filter(F.col("term_rank") <= 3)
    )


_STOP_SQL = ", ".join(f"'{s}'" for s in STOPWORDS)
DISTINCTIVE_TERMS_SQL = f"""
WITH tok AS (
  SELECT doc_id, t.term
  FROM documents, unnest({_TOKS_SQL}) AS t(term)
  WHERE len(t.term) >= 3 AND t.term NOT IN ({_STOP_SQL})
),
tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY doc_id, term),
df AS (SELECT term, count(*) AS df FROM tf GROUP BY term)
SELECT doc_id, term, tf, df, term_rank FROM (
  SELECT tf.doc_id, tf.term, tf.tf, df.df,
         row_number() OVER (
           PARTITION BY tf.doc_id
           ORDER BY tf.tf DESC, df.df ASC, tf.term ASC
         ) AS term_rank
  FROM tf JOIN df USING (term)
) WHERE term_rank <= 3
"""


#: word bigrams over a pre-staged ``_toks`` column (empty for 1-token
#: docs) — staged for the same lambda-scope reason as ``dedup._GRAMS``
_BIGRAMS = (
    "CASE WHEN size(_toks) >= 2 THEN"
    " transform(sequence(1, size(_toks) - 1),"
    "  i -> concat(element_at(_toks, i), ' ', element_at(_toks, i + 1)))"
    " ELSE array() END"
)

#: the count of the most frequent bigram == the longest equal run in the
#: SORTED bigram array — a row-local fold, so the statistic needs no
#: explode or shuffle
_LONGEST_RUN = (
    "aggregate(array_sort(_bigrams),"
    " struct(cast(0 as int) as run, cast(0 as int) as best,"
    "        cast(null as string) as prev),"
    " (acc, x) -> struct("
    "   CASE WHEN acc.prev = x THEN acc.run + 1 ELSE 1 END as run,"
    "   greatest(acc.best,"
    "            CASE WHEN acc.prev = x THEN acc.run + 1 ELSE 1 END) as best,"
    "   x as prev),"
    " acc -> acc.best)"
)


def repetition_top_bigram(spark: SparkSession, sf: str) -> DataFrame:
    """Gopher-style repetition signal: the fraction of a document's word
    bigrams taken by its single most frequent bigram (Rae et al. 2021's
    "top n-gram fraction" family — heavily repeated n-grams mark boiler-
    plate and low-quality machine text).

    Scale shape: ZERO shuffle. A per-document statistic never needs a
    groupBy — the bigram histogram's max is the longest equal run in the
    doc's SORTED bigram array, computed row-local with ``array_sort`` +
    ``aggregate`` (both whole-stage-codegen built-ins). At 100 TB this
    is a map-only scan; the explode→groupBy(doc_id, bigram) form would
    shuffle every bigram in the corpus twice for the same answer.
    Tokens are staged first (see ``ops/dedup._GRAMS`` for why inline
    tokenization inside a lambda is O(words²))."""
    d = load(spark, sf, "documents").withColumn(
        "_toks", F.split(F.lower("text"), " ")
    )
    frac = F.round(
        F.col("top_bigram_n").cast("double") / F.col("n_bigrams").cast("double"), 6
    )
    return (
        d.withColumn("_bigrams", F.expr(_BIGRAMS))
        .filter(F.size("_bigrams") > 0)
        .select(
            "doc_id",
            F.size("_bigrams").alias("n_bigrams"),
            F.expr(_LONGEST_RUN).alias("top_bigram_n"),
        )
        .withColumn("top_bigram_frac", frac)
        .withColumn("repetitive", F.col("top_bigram_frac") >= 0.05)
    )


REPETITION_SQL = """
WITH toks AS (SELECT doc_id, string_split(lower(text), ' ') AS t FROM documents),
bg AS (
  SELECT doc_id, t[i] || ' ' || t[i+1] AS bg
  FROM toks, unnest(range(1, len(t))) AS r(i)
  WHERE len(t) >= 2
),
cnt AS (SELECT doc_id, bg, count(*) AS n FROM bg GROUP BY doc_id, bg)
SELECT doc_id, CAST(sum(n) AS INT) AS n_bigrams, CAST(max(n) AS INT) AS top_bigram_n,
       round(CAST(max(n) AS DOUBLE) / CAST(sum(n) AS DOUBLE), 6) AS top_bigram_frac,
       round(CAST(max(n) AS DOUBLE) / CAST(sum(n) AS DOUBLE), 6) >= 0.05 AS repetitive
FROM cnt GROUP BY doc_id
"""


def decontamination_overlap(spark: SparkSession, sf: str) -> DataFrame:
    """Benchmark decontamination: for every training document, the
    fraction of its distinct word 3-grams that also appear in a held-out
    benchmark set (here: the ``source = 'src0'`` documents stand in for
    the eval suite). Docs above the threshold are flagged for removal —
    the standard guard against test-set leakage into pretraining data
    (GPT-3 appendix C / PaLM-style n-gram overlap decontamination).

    Scale shape: the benchmark gram set is SMALL by construction (eval
    suites are a few MB), so it broadcasts; the 100-TB corpus side
    streams through one broadcast-hash probe + one ``groupBy(doc_id)``
    partial-aggregated count — no corpus-vs-corpus join anywhere."""
    d = load(spark, sf, "documents").withColumn(
        "_toks", F.split(F.lower("text"), " ")
    )
    grams = (
        "CASE WHEN size(_toks) >= 3 THEN"
        " transform(sequence(1, size(_toks) - 2),"
        "  i -> concat(element_at(_toks, i), ' ', element_at(_toks, i + 1),"
        "              ' ', element_at(_toks, i + 2)))"
        " ELSE array(lower(text)) END"
    )
    g = d.select(
        "doc_id", "source", F.explode(F.array_distinct(F.expr(grams))).alias("gram")
    )
    bench = g.filter(F.col("source") == "src0").select("gram").distinct()
    rest = g.filter(F.col("source") != "src0")
    tot = rest.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_grams"))
    hit = (
        rest.join(F.broadcast(bench), "gram")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_hit"))
    )
    frac = F.round(
        F.col("n_hit").cast("double") / F.col("n_grams").cast("double"), 6
    )
    return (
        tot.join(hit, "doc_id", "left")
        .fillna({"n_hit": 0})
        .withColumn("overlap_frac", frac)
        .withColumn("contaminated", F.col("overlap_frac") >= 0.05)
    )


DECONTAMINATION_SQL = """
WITH toks AS (SELECT doc_id, source, text,
                     string_split(lower(text), ' ') AS t FROM documents),
g AS (
  SELECT doc_id, source, unnest(list_distinct(
    CASE WHEN len(t) >= 3 THEN
      list_transform(range(1, len(t) - 1), i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])
    ELSE [lower(text)] END)) AS gram
  FROM toks
),
bench AS (SELECT DISTINCT gram FROM g WHERE source = 'src0'),
rest AS (SELECT doc_id, gram FROM g WHERE source != 'src0'),
tot AS (SELECT doc_id, count(*) AS n_grams FROM rest GROUP BY doc_id),
hit AS (SELECT r.doc_id, count(*) AS n_hit
        FROM rest r JOIN bench b USING (gram) GROUP BY r.doc_id)
SELECT t.doc_id, CAST(t.n_grams AS BIGINT) AS n_grams,
       CAST(coalesce(h.n_hit, 0) AS BIGINT) AS n_hit,
       round(CAST(coalesce(h.n_hit, 0) AS DOUBLE)
             / CAST(t.n_grams AS DOUBLE), 6) AS overlap_frac,
       round(CAST(coalesce(h.n_hit, 0) AS DOUBLE)
             / CAST(t.n_grams AS DOUBLE), 6) >= 0.05 AS contaminated
FROM tot t LEFT JOIN hit h USING (doc_id)
"""


def corpus_stats_by_source(spark: SparkSession, sf: str) -> DataFrame:
    """Dataset-card rollup: per ingestion source, document count, token
    totals, mean heuristic quality, and the share of repetitive docs —
    the per-corpus report a pretraining pipeline publishes with every
    snapshot (a "data card").

    Scale shape: every per-document signal (tokens, quality features,
    top-bigram repetition) is row-local map work sharing ONE staged
    token array; the rollup is a single partial-aggregated
    ``groupBy(source)`` whose output is O(#sources). Quality is summed
    in its exact integer basis and divided once at the end, so the mean
    is partitioning-independent."""
    d = load(spark, sf, "documents").withColumn(
        "_toks", F.split(F.lower("text"), " ")
    )
    q = _quality_cols(F.col("text"))
    rep_frac = (
        F.when(
            F.size("_bigrams") > 0,
            F.expr(_LONGEST_RUN).cast("double") / F.size("_bigrams").cast("double"),
        )
        .otherwise(F.lit(0.0))
    )
    per_doc = d.withColumn("_bigrams", F.expr(_BIGRAMS)).select(
        "source",
        q["n_tokens"].alias("n_tokens"),
        q["quality_scaled"].alias("quality_scaled"),
        rep_frac.alias("rep_frac"),
    )
    n_docs = F.count(F.lit(1))
    n_rep = F.sum(F.when(F.round(F.col("rep_frac"), 6) >= 0.05, 1).otherwise(0))
    return (
        per_doc.groupBy("source")
        .agg(
            n_docs.alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
            F.round(
                F.sum("quality_scaled").cast("double") / n_docs.cast("double"), 4
            ).alias("mean_quality_scaled"),
            n_rep.alias("n_repetitive"),
        )
        .withColumn(
            "repetitive_share",
            F.round(F.col("n_repetitive").cast("double") / F.col("n_docs").cast("double"), 4),
        )
    )


CORPUS_STATS_SQL = f"""
WITH toks AS (SELECT doc_id, source, text,
                     string_split(lower(text), ' ') AS t FROM documents),
bg AS (
  SELECT doc_id, t[i] || ' ' || t[i+1] AS bg
  FROM toks, unnest(range(1, len(t))) AS r(i)
  WHERE len(t) >= 2
),
cnt AS (SELECT doc_id, bg, count(*) AS n FROM bg GROUP BY doc_id, bg),
rep AS (SELECT doc_id, round(CAST(max(n) AS DOUBLE) / CAST(sum(n) AS DOUBLE), 6) AS rep_frac
        FROM cnt GROUP BY doc_id),
per_doc AS (
  SELECT k.source, len(k.t) AS n_tokens,
         4 * CAST(round(round(CAST(least(length(k.text), 500) AS DOUBLE) / 500.0, 4) * 10000) AS BIGINT)
       + 3 * CAST(round(round(CAST(len(list_distinct(k.t)) AS DOUBLE) / CAST(len(k.t) AS DOUBLE), 4) * 10000) AS BIGINT)
       + 3 * (10000 - least(2 * CAST(round(round(CAST(len(list_filter(k.t, x -> x IN ({_STOP_SQL}))) AS DOUBLE) / CAST(len(k.t) AS DOUBLE), 4) * 10000) AS BIGINT), 10000))
         AS quality_scaled,
         coalesce(r.rep_frac, 0.0) AS rep_frac
  FROM toks k LEFT JOIN rep r USING (doc_id)
)
SELECT source, count(*) AS n_docs,
       CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
       round(CAST(sum(quality_scaled) AS DOUBLE) / CAST(count(*) AS DOUBLE), 4) AS mean_quality_scaled,
       CAST(sum(CASE WHEN rep_frac >= 0.05 THEN 1 ELSE 0 END) AS BIGINT) AS n_repetitive,
       round(CAST(sum(CASE WHEN rep_frac >= 0.05 THEN 1 ELSE 0 END) AS DOUBLE)
             / CAST(count(*) AS DOUBLE), 4) AS repetitive_share
FROM per_doc GROUP BY source
"""


def unigram_surprisal(spark: SparkSession, sf: str) -> DataFrame:
    """CCNet-family LM quality filtering, with the language model the
    corpus itself defines: each token's surprisal is ``-ln(tf/total)``
    under the corpus unigram distribution, and a document's score is its
    mean token surprisal — high-surprisal docs are the gibberish /
    OOV-heavy tail an LM-perplexity gate removes (CCNet buckets corpora
    by KenLM perplexity; the unigram LM is the degenerate-order case and
    needs no external model).

    Engine-exactness: per-token surprisal is quantized to an integer
    basis (``round(-ln(p)·10⁴)``) BEFORE the per-doc sum, so the
    aggregation is exact integer arithmetic — partitioning- and
    order-independent; the two engines only have to agree on one
    single-op ``ln`` per vocab row, at 1e-4 quantization.

    Scale shape: vocab = one token-keyed partial-aggregated groupBy
    (O(vocabulary) output); the corpus total is a partial-aggregated
    ``agg`` over that aggregate broadcast back as a one-row crossJoin —
    no row ever funnels through a single-partition window, so the stage
    parallelizes even when the vocabulary itself is web-scale
    (O(10⁸-10⁹) distinct tokens); scoring is one shuffle join of tokens
    against the vocab (vocab is broadcast-able at real scale) + one
    partial-aggregated groupBy(doc_id)."""
    d = load(spark, sf, "documents")
    tok = d.select("doc_id", F.explode(F.split(F.lower("text"), " ")).alias("tok"))
    vocab = tok.groupBy("tok").agg(F.count(F.lit(1)).alias("tf"))
    vocab = vocab.crossJoin(F.broadcast(vocab.agg(F.sum("tf").alias("total"))))
    surprisal = F.round(
        -F.log(F.col("tf").cast("double") / F.col("total").cast("double")) * 10000
    ).cast("long")
    scored = tok.join(vocab, "tok").select(
        "doc_id", surprisal.alias("surprisal_scaled")
    )
    mean = F.round(
        F.col("total_surprisal_scaled").cast("double")
        / F.col("n_tokens").cast("double")
        / 10000.0,
        4,
    )
    return (
        scored.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum("surprisal_scaled").alias("total_surprisal_scaled"),
        )
        .withColumn("mean_surprisal", mean)
        .withColumn("high_perplexity", F.col("mean_surprisal") >= 3.5)
    )


UNIGRAM_SURPRISAL_SQL = """
WITH tok AS (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS tok FROM documents),
vocab AS (SELECT tok, count(*) AS tf FROM tok GROUP BY tok),
total AS (SELECT count(*) AS n FROM tok),
scored AS (
  SELECT t.doc_id,
         CAST(round(-ln(CAST(v.tf AS DOUBLE) / CAST(total.n AS DOUBLE)) * 10000) AS BIGINT) AS s
  FROM tok t JOIN vocab v USING (tok), total
)
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
       CAST(sum(s) AS BIGINT) AS total_surprisal_scaled,
       round(CAST(sum(s) AS DOUBLE) / CAST(count(*) AS DOUBLE) / 10000.0, 4) AS mean_surprisal,
       round(CAST(sum(s) AS DOUBLE) / CAST(count(*) AS DOUBLE) / 10000.0, 4) >= 3.5
         AS high_perplexity
FROM scored GROUP BY doc_id
"""


def dsir_importance(spark: SparkSession, sf: str) -> DataFrame:
    """DSIR-style importance weighting (Xie et al. 2023, "Data Selection
    for Language Models via Importance Resampling"): score every
    training document by the log-likelihood ratio between a TARGET
    domain's unigram LM (here: the ``src0`` documents stand in for the
    target domain) and the general-corpus LM — documents whose token
    distribution looks like the target score positive and get selected.
    The target LM is Laplace-smoothed over the corpus vocabulary so
    unseen-in-target tokens contribute a finite negative weight.

    Engine-exactness: per-token log-ratio is quantized to an integer
    basis before the per-doc sum (same discipline as
    ``unigram_surprisal``), and the OUTPUT stays in that exact integer
    basis — ``selected`` is ``total ≥ 0``, equivalent to mean ≥ 0, so
    no float ever reaches a compared column.

    Scale shape: two token-keyed partial-aggregated groupBys (corpus
    vocab, target vocab — the target is small by construction), scalar
    totals via a partial-aggregated ``agg`` over the O(vocab) aggregate
    broadcast back as a one-row crossJoin (no single-partition window —
    the stage stays parallel at web-scale vocabularies), one shuffle
    join of corpus tokens against the scored vocab, one
    groupBy(doc_id)."""
    d = load(spark, sf, "documents")
    tok = d.select(
        "doc_id", "source", F.explode(F.split(F.lower("text"), " ")).alias("tok")
    )
    cor = tok.filter(F.col("source") != "src0")
    tgt = tok.filter(F.col("source") == "src0")
    vc = cor.groupBy("tok").agg(F.count(F.lit(1)).alias("tf_cor"))
    vt = tgt.groupBy("tok").agg(F.count(F.lit(1)).alias("tf_tgt"))
    joined = vc.join(vt, "tok", "left").fillna({"tf_tgt": 0})
    totals = joined.agg(
        F.sum("tf_cor").alias("total_cor"),
        F.sum("tf_tgt").alias("total_tgt"),
        F.count(F.lit(1)).alias("vsize"),
    )
    vocab = joined.crossJoin(F.broadcast(totals))
    log_ratio = F.round(
        (
            F.log(
                (F.col("tf_tgt") + 1).cast("double")
                / (F.col("total_tgt") + F.col("vsize")).cast("double")
            )
            - F.log(F.col("tf_cor").cast("double") / F.col("total_cor").cast("double"))
        )
        * 10000
    ).cast("long")
    scored = cor.join(vocab.select("tok", log_ratio.alias("s")), "tok")
    return (
        scored.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum("s").alias("total_logratio_scaled"),
        )
        .withColumn("selected", F.col("total_logratio_scaled") >= 0)
        .select("doc_id", "n_tokens", "total_logratio_scaled", "selected")
    )


DSIR_SQL = """
WITH tok AS (SELECT doc_id, source,
                    unnest(string_split(lower(text), ' ')) AS tok FROM documents),
cor AS (SELECT * FROM tok WHERE source != 'src0'),
tgt AS (SELECT * FROM tok WHERE source = 'src0'),
vc AS (SELECT tok, count(*) AS tf_cor FROM cor GROUP BY tok),
vt AS (SELECT tok, count(*) AS tf_tgt FROM tgt GROUP BY tok),
vocab AS (
  SELECT vc.tok, vc.tf_cor, coalesce(vt.tf_tgt, 0) AS tf_tgt,
         sum(vc.tf_cor) OVER () AS total_cor,
         sum(coalesce(vt.tf_tgt, 0)) OVER () AS total_tgt,
         count(*) OVER () AS vsize
  FROM vc LEFT JOIN vt USING (tok)
),
scored AS (
  SELECT c.doc_id,
         CAST(round((ln(CAST(v.tf_tgt + 1 AS DOUBLE) / CAST(v.total_tgt + v.vsize AS DOUBLE))
                     - ln(CAST(v.tf_cor AS DOUBLE) / CAST(v.total_cor AS DOUBLE))) * 10000)
              AS BIGINT) AS s
  FROM cor c JOIN vocab v USING (tok)
)
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
       CAST(sum(s) AS BIGINT) AS total_logratio_scaled,
       sum(s) >= 0 AS selected
FROM scored GROUP BY doc_id
"""


def curated_corpus(spark: SparkSession, sf: str) -> DataFrame:
    """The full curation pipeline as ONE declarative keep-list — every
    gate this module and ``dedup`` provide, composed the way a real
    pretraining run chains them: exact-dedup keeper (lowest doc_id per
    identical content) ∘ language gate ∘ heuristic-quality gate ∘
    Gopher repetition gate ∘ benchmark decontamination (src0 = the
    held-out eval set, excluded outright; overlapping docs dropped) ∘
    unigram-surprisal perplexity gate. What survives is the corpus a
    training job would actually read.

    Scale shape: each signal is a prior oracle-checked operator; the
    composition is equi-joins on doc_id, so every branch shuffles on
    the SAME key — AQE (or doc_id bucketing on a real table) co-locates
    them, and Catalyst pushes the cheap gates (lang, source) to the one
    documents scan each branch shares."""
    d = load(spark, sf, "documents")
    keepers = d.groupBy(F.sha2("text", 256).alias("_h")).agg(
        F.min("doc_id").alias("doc_id")
    )
    q = quality_score(spark, sf).select("doc_id", "n_tokens", "quality_scaled")
    rep = repetition_top_bigram(spark, sf).select("doc_id", "repetitive")
    dec = decontamination_overlap(spark, sf).select("doc_id", "contaminated")
    sur = unigram_surprisal(spark, sf).select(
        "doc_id", "mean_surprisal", "high_perplexity"
    )
    return (
        d.select("doc_id", "source", "lang")
        .join(keepers.select("doc_id"), "doc_id")
        .join(q, "doc_id")
        .join(rep, "doc_id", "left")
        .join(dec, "doc_id")  # inner: src0 (the benchmark) drops here
        .join(sur, "doc_id")
        .filter(
            (F.col("lang") == "en")
            & (F.col("quality_scaled") >= 60000)
            & ~F.coalesce(F.col("repetitive"), F.lit(False))
            & ~F.col("contaminated")
            & ~F.col("high_perplexity")
        )
        .select("doc_id", "source", "n_tokens", "quality_scaled", "mean_surprisal")
    )


CURATED_CORPUS_SQL = f"""
WITH q AS ({QUALITY_SQL}),
rep AS ({REPETITION_SQL}),
dec AS ({DECONTAMINATION_SQL}),
sur AS ({UNIGRAM_SURPRISAL_SQL}),
keepers AS (SELECT min(doc_id) AS doc_id FROM documents GROUP BY sha256(text))
SELECT d.doc_id, d.source, q.n_tokens, q.quality_scaled, sur.mean_surprisal
FROM documents d
JOIN keepers k ON d.doc_id = k.doc_id
JOIN q ON q.doc_id = d.doc_id
LEFT JOIN rep ON rep.doc_id = d.doc_id
JOIN dec ON dec.doc_id = d.doc_id
JOIN sur ON sur.doc_id = d.doc_id
WHERE d.lang = 'en' AND q.quality_scaled >= 60000
  AND NOT coalesce(rep.repetitive, FALSE)
  AND NOT dec.contaminated
  AND NOT sur.high_perplexity
"""


#: PII patterns shared verbatim by the Spark expressions and the DuckDB
#: oracle — restricted to syntax with identical semantics in Java regex
#: and RE2 (character classes, bounded repetition, ASCII \b / \d).
PII_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_PHONE_RE = r"\b\d{3}-\d{3}-\d{4}\b"
PII_IP_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"

#: Deterministic PII fixture: the synthetic corpus contains no PII, so
#: the ORACLE QUERY (not the operator — see ``redact_pii``) appends
#: doc_id-keyed email/phone/IP strings to a subset of rows before
#: scrubbing. This is test-fixture augmentation (exactly reproducible,
#: identical expression in Spark and SQL), kept strictly outside the
#: operator so a real corpus is never polluted with PII-shaped strings.
_PII_AUGMENT_SQL = (
    "text"
    " || CASE WHEN doc_id % 5 = 0 THEN ' contact user' || CAST(doc_id AS STRING)"
    " || '@example.com' ELSE '' END"
    " || CASE WHEN doc_id % 7 = 0 THEN ' call 555-123-4567' ELSE '' END"
    " || CASE WHEN doc_id % 11 = 0 THEN ' host 10.0.0.' || CAST(doc_id % 256 AS STRING)"
    " ELSE '' END"
)


def redact_pii(df: DataFrame, text_col: str = "text") -> DataFrame:
    """PII scrub OPERATOR: count and redact emails, phone numbers, and
    IPv4 addresses in ``text_col`` — the privacy pass every public-web
    pretraining pipeline runs before tokenization (C4 / Gopher / RefinedWeb
    all ship a regex-redaction stage of exactly this shape). Operates on
    the given column of ANY DataFrame — no fixture logic lives here; the
    registered query (``pii_redaction``) augments the PII-free synthetic
    corpus separately, as a test fixture.

    Returns the input columns plus ``n_emails``/``n_phones``/``n_ips``
    (match counts against the ORIGINAL text), ``has_pii``, and
    ``redacted_text``.

    Scale shape: ZERO shuffle — counts (``regexp_count``) and the chained
    ``regexp_replace`` redaction are row-local JVM built-ins inside one
    whole-stage-codegen map over the scan; at 100 TB this is a pure
    pass-through stream. Replacement order is email → phone → IP and is
    LOAD-BEARING: the patterns can overlap (a phone number inside an
    email local part, '555-123-4567@example.com', matches both the phone
    regex — \\b holds at '@' — and the email regex), so reordering the
    chain changes the redacted bytes, and the per-pattern counts are
    occurrences in the ORIGINAL text, which an earlier replacement in
    the chain may consume. Both engines pin the same order, so the
    output is deterministic and cross-engine equal."""
    t = F.col(text_col)
    redacted = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(t, F.lit(PII_EMAIL_RE), F.lit("<EMAIL>")),
            F.lit(PII_PHONE_RE),
            F.lit("<PHONE>"),
        ),
        F.lit(PII_IP_RE),
        F.lit("<IP>"),
    )
    n_emails = F.regexp_count(t, F.lit(PII_EMAIL_RE))
    n_phones = F.regexp_count(t, F.lit(PII_PHONE_RE))
    n_ips = F.regexp_count(t, F.lit(PII_IP_RE))
    return df.select(
        "*",
        n_emails.alias("n_emails"),
        n_phones.alias("n_phones"),
        n_ips.alias("n_ips"),
        (n_emails + n_phones + n_ips > 0).alias("has_pii"),
        redacted.alias("redacted_text"),
    )


def pii_redaction(spark: SparkSession, sf: str) -> DataFrame:
    """Registered oracle query: the synthetic corpus contains no PII, so
    this wrapper first applies the deterministic doc_id-keyed fixture
    augmentation (``_PII_AUGMENT_SQL`` — mirrored verbatim in the DuckDB
    oracle), then runs the real operator ``redact_pii`` on the augmented
    column and hashes the redacted text so byte-equality is checkable
    without hauling full text through the comparator."""
    d = load(spark, sf, "documents").withColumn("_pii_text", F.expr(_PII_AUGMENT_SQL))
    r = redact_pii(d, "_pii_text")
    return r.select(
        "doc_id",
        "n_emails",
        "n_phones",
        "n_ips",
        "has_pii",
        F.sha2("redacted_text", 256).alias("redacted_sha256"),
    )


_PII_AUGMENT_DUCK = _PII_AUGMENT_SQL.replace("AS STRING", "AS VARCHAR")

PII_REDACTION_SQL = f"""
WITH aug AS (SELECT doc_id, {_PII_AUGMENT_DUCK} AS t FROM documents)
SELECT doc_id,
       CAST(len(regexp_extract_all(t, '{PII_EMAIL_RE}')) AS INT) AS n_emails,
       CAST(len(regexp_extract_all(t, '{PII_PHONE_RE}')) AS INT) AS n_phones,
       CAST(len(regexp_extract_all(t, '{PII_IP_RE}')) AS INT) AS n_ips,
       len(regexp_extract_all(t, '{PII_EMAIL_RE}'))
         + len(regexp_extract_all(t, '{PII_PHONE_RE}'))
         + len(regexp_extract_all(t, '{PII_IP_RE}')) > 0 AS has_pii,
       sha256(regexp_replace(regexp_replace(regexp_replace(t,
           '{PII_EMAIL_RE}', '<EMAIL>', 'g'),
           '{PII_PHONE_RE}', '<PHONE>', 'g'),
           '{PII_IP_RE}', '<IP>', 'g')) AS redacted_sha256
FROM aug
"""


def curated_corpus_packed(spark: SparkSession, sf: str) -> DataFrame:
    """The tokenizable TRAINING ARTIFACT (round-5 VERDICT #7): compose
    the full curation keep-list (``curated_corpus``), the PII scrub
    (``redact_pii`` — the privacy pass runs on the SURVIVING docs, the
    order a real pipeline uses: no point scrubbing text the gates drop),
    and the concat-and-chunk packing index (``pack_sequences``' layout,
    computed over the kept set only, so offsets describe the stream a
    loader actually reads). One row per kept document: its packing
    coordinates against the redacted token stream plus the redacted
    text's sha256 (the byte-equality invariant, checkable without
    hauling text through the comparator). The registered query augments
    the PII-free synthetic corpus with the deterministic fixture
    (``_PII_AUGMENT_SQL``, mirrored in the oracle) so the redaction leg
    is exercised, exactly as ``pii_redaction`` does.

    Scale shape: the keep-list is the already-audited ``curated_corpus``
    plan (one-key equi-joins); redaction is row-local JVM regex in the
    same stage as the scan; packing is one window per source over 3
    narrow columns of the KEPT rows only — content never shuffles, and
    the stream layout is order-defined (source, doc_id), so it is
    deterministic under retries."""
    from etl_kafka_project_spark.ops.curation import pack_layout

    kept = curated_corpus(spark, sf).select("doc_id")
    d = load(spark, sf, "documents").withColumn(
        "_pii_text", F.expr(_PII_AUGMENT_SQL)
    )
    r = redact_pii(d.select("doc_id", "source", "_pii_text"), "_pii_text")
    base = kept.join(r, "doc_id").select(
        "source",
        "doc_id",
        F.size(F.split(F.lower("redacted_text"), " ")).cast("long").alias("n_tokens"),
        F.sha2("redacted_text", 256).alias("redacted_sha256"),
    )
    return pack_layout(base).select(
        "source",
        "doc_id",
        "n_tokens",
        "start_offset",
        "pack_id",
        "spans_boundary",
        "redacted_sha256",
    )


def _curated_packed_sql() -> str:
    from etl_kafka_project_spark.ops.curation import pack_layout_sql

    base = f"""
WITH kept AS ({CURATED_CORPUS_SQL}),
red AS (
  SELECT doc_id, source,
         regexp_replace(regexp_replace(regexp_replace({_PII_AUGMENT_DUCK},
             '{PII_EMAIL_RE}', '<EMAIL>', 'g'),
             '{PII_PHONE_RE}', '<PHONE>', 'g'),
             '{PII_IP_RE}', '<IP>', 'g') AS rt
  FROM documents
)
SELECT r.source, r.doc_id,
       CAST(len(string_split(lower(r.rt), ' ')) AS BIGINT) AS n_tokens,
       sha256(r.rt) AS redacted_sha256
FROM red r JOIN kept k ON r.doc_id = k.doc_id"""
    return pack_layout_sql(base, extra_select=", redacted_sha256")


# --- round-5 additions: learned-filter inference + conditional LM gate ---

#: hashed-feature space for the linear quality classifier
_CLF_BUCKETS = 64
#: Knuth multiplicative constant / a large prime — together they deal a
#: deterministic pseudo-random weight to each hash bucket
_CLF_MULT = 2654435761
_CLF_PRIME = 1000003

#: per-token quantized weight, as one shared SQL-lambda body: bucket =
#: first 4 md5 hex digits mod 64 (md5 is the cross-engine hash family,
#: same as the dataset splitter); weight = a deterministic pseudo-random
#: value in [-0.5, 0.5) from integer arithmetic, quantized to 1e-4
#: BEFORE the per-doc sum so the aggregation is exact integer math.
_CLF_WQ_SPARK = (
    f"CAST(round(((CAST(conv(substring(md5(t), 1, 4), 16, 10) AS BIGINT)"
    f" % {_CLF_BUCKETS}) * {_CLF_MULT} % {_CLF_PRIME})"
    f" * 10000 / {_CLF_PRIME}.0) AS BIGINT) - 5000"
)
_CLF_WQ_DUCK = (
    f"CAST(round(((CAST(('0x' || substr(md5(t), 1, 4)) AS BIGINT)"
    f" % {_CLF_BUCKETS}) * {_CLF_MULT} % {_CLF_PRIME})"
    f" * 10000 / {_CLF_PRIME}.0) AS BIGINT) - 5000"
)


def quality_classifier_score(spark: SparkSession, sf: str) -> DataFrame:
    """Learned-filter INFERENCE: score every document with a linear
    classifier over hashed bag-of-tokens features — the fastText-style
    quality model every public pretraining pipeline runs (CCNet's LM
    filter, GPT-3's WebText-similarity classifier, RedPajama's fasttext
    gates all have this exact serving shape: hash each token into a
    fixed feature space, sum per-feature weights, threshold the margin).
    The weight VECTOR here is a deterministic function of the bucket id
    (integer multiplicative hashing, quantized to 1e-4) so both engines
    materialize the identical model without shipping a file; swapping in
    trained weights is a broadcast map lookup with the same plan.

    Engine-exactness: the per-token weight is an exact integer
    (``round((bucket·M mod P)·10⁴/P) − 5000``, one double division at
    1e-4 quantization), so the per-doc margin is an exact integer sum —
    partitioning- and order-independent; ``kept`` thresholds the integer
    margin, never a float.

    Scale shape: ZERO shuffle — tokenize, hash, weigh, and sum are one
    row-local ``aggregate`` over the token array inside the same
    whole-stage-codegen map as the scan (no explode, no groupBy: the
    token stream never leaves its row). At 100 TB this is a pure
    pass-through scoring pass, the cheapest possible plan for model
    inference over a corpus."""
    d = load(spark, sf, "documents")
    margin = F.expr(
        "aggregate(transform(split(lower(text), ' '),"
        f" t -> {_CLF_WQ_SPARK}),"
        " CAST(0 AS BIGINT), (a, x) -> a + x)"
    )
    n_tok = F.size(_toks())
    return d.select(
        "doc_id",
        n_tok.alias("n_tokens"),
        margin.alias("margin_total_scaled"),
        F.round(
            margin.cast("double") / n_tok.cast("double") / 10000.0, 4
        ).alias("margin_mean"),
        (margin >= 0).alias("kept"),
    )


QUALITY_CLF_SQL = f"""
WITH scored AS (
  SELECT doc_id,
         len(string_split(lower(text), ' ')) AS n_tokens,
         CAST(list_sum(list_transform(string_split(lower(text), ' '),
              t -> {_CLF_WQ_DUCK})) AS BIGINT) AS margin_total_scaled
  FROM documents
)
SELECT doc_id, n_tokens, margin_total_scaled,
       round(CAST(margin_total_scaled AS DOUBLE)
             / CAST(n_tokens AS DOUBLE) / 10000.0, 4) AS margin_mean,
       margin_total_scaled >= 0 AS kept
FROM scored
"""


#: mean bigram surprisal above this is the flagged high-perplexity tail
#: (calibrated to the synthetic corpus: ~p95 of the per-doc means — a
#: real pipeline fits this cut on a held-out sample, exactly as CCNet
#: picks its perplexity buckets per language)
_BIGRAM_PPL_GATE = 3.45


def bigram_surprisal(spark: SparkSession, sf: str) -> DataFrame:
    """Conditional-LM perplexity gate (the CCNet refinement of
    ``unigram_surprisal``): each adjacent token pair's surprisal is
    ``−ln p(w₂|w₁)`` under the corpus's own add-one-smoothed bigram LM
    (``p(w₂|w₁) = (c(w₁,w₂)+1) / (c(w₁)+V)``, V = unigram vocabulary
    size), and a document's score is its mean bigram surprisal — unlike
    the unigram gate this catches locally-incoherent text built from
    individually-common tokens (shuffled words score high here but
    normal there). Documents with fewer than two tokens have no bigrams
    and drop out, identically in both engines.

    Engine-exactness: per-bigram surprisal is quantized to an integer
    basis (``round(−ln(p)·10⁴)``) before the per-doc sum — exact integer
    aggregation, partitioning- and order-independent; the engines only
    agree on one ``ln`` per distinct bigram at 1e-4 quantization.

    Scale shape: bigram construction is a row-local ``zip_with`` of the
    token array against its own tail (no self-join, no positional
    shuffle); counts are partial-aggregated groupBys keyed by bigram and
    by context; V is a partial-aggregated distinct-count broadcast back
    as a one-row crossJoin (no single-partition window); scoring is one
    shuffle join of the bigram stream against the O(distinct-bigrams)
    model + one partial-aggregated groupBy(doc_id)."""
    d = load(spark, sf, "documents")
    pairs = F.expr(
        "zip_with(slice(split(lower(text), ' '), 1, size(split(lower(text), ' ')) - 1),"
        " slice(split(lower(text), ' '), 2, size(split(lower(text), ' ')) - 1),"
        " (a, b) -> struct(a AS w1, b AS w2))"
    )
    bg = (
        d.filter(F.size(_toks()) >= 2)
        .select("doc_id", F.explode(pairs).alias("p"))
        .select("doc_id", F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
    )
    cbg = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c_bg"))
    ctx = cbg.groupBy("w1").agg(F.sum("c_bg").alias("c_ctx"))
    vocab_size = (
        d.select(F.explode(_toks()).alias("tok"))
        .agg(F.count_distinct("tok").alias("v"))
    )
    model = (
        cbg.join(ctx, "w1")
        .crossJoin(F.broadcast(vocab_size))
        .select(
            "w1",
            "w2",
            F.round(
                -F.log(
                    (F.col("c_bg") + 1).cast("double")
                    / (F.col("c_ctx") + F.col("v")).cast("double")
                )
                * 10000
            )
            .cast("long")
            .alias("s"),
        )
    )
    mean = F.round(
        F.col("total_surprisal_scaled").cast("double")
        / F.col("n_bigrams").cast("double")
        / 10000.0,
        4,
    )
    return (
        bg.join(model, ["w1", "w2"])
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.sum("s").alias("total_surprisal_scaled"),
        )
        .withColumn("mean_surprisal", mean)
        .withColumn("high_perplexity", mean >= F.lit(_BIGRAM_PPL_GATE))
    )


BIGRAM_SURPRISAL_SQL = f"""
WITH toks AS (SELECT doc_id, string_split(lower(text), ' ') AS t FROM documents),
bg AS (
  SELECT doc_id, t[i] AS w1, t[i+1] AS w2
  FROM toks, unnest(range(1, len(t))) AS r(i)
  WHERE len(t) >= 2
),
cbg AS (SELECT w1, w2, count(*) AS c_bg FROM bg GROUP BY w1, w2),
ctx AS (SELECT w1, sum(c_bg) AS c_ctx FROM cbg GROUP BY w1),
vocab AS (SELECT count(DISTINCT tok) AS v
          FROM (SELECT unnest(string_split(lower(text), ' ')) AS tok FROM documents)),
scored AS (
  SELECT b.doc_id,
         CAST(round(-ln(CAST(c.c_bg + 1 AS DOUBLE)
                        / CAST(x.c_ctx + vocab.v AS DOUBLE)) * 10000) AS BIGINT) AS s
  FROM bg b JOIN cbg c USING (w1, w2) JOIN ctx x USING (w1), vocab
)
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
       CAST(sum(s) AS BIGINT) AS total_surprisal_scaled,
       round(CAST(sum(s) AS DOUBLE) / CAST(count(*) AS DOUBLE) / 10000.0, 4)
         AS mean_surprisal,
       round(CAST(sum(s) AS DOUBLE) / CAST(count(*) AS DOUBLE) / 10000.0, 4)
         >= {_BIGRAM_PPL_GATE} AS high_perplexity
FROM scored GROUP BY doc_id
"""


QUERIES = {
    "token_stats": token_stats,
    "quality_score": quality_score,
    "language_id": language_id,
    "sha256_documents": sha256_documents,
    # pii_redaction is round-4-new → inside the driver's 50-query cap;
    # doc_fingerprint (driver-green r1-r3) rotates past the cap (it is
    # re-listed at the END of this dict so the rest of the round-4-new
    # text queries keep their in-cap slots).
    "pii_redaction": pii_redaction,
    "pretrain_corpus_filter": pretrain_corpus_filter,
    "distinctive_terms": distinctive_terms,
    "repetition_top_bigram": repetition_top_bigram,
    "decontamination_overlap": decontamination_overlap,
    "corpus_stats_by_source": corpus_stats_by_source,
    "unigram_surprisal": unigram_surprisal,
    "curated_corpus": curated_corpus,
    "curated_corpus_packed": curated_corpus_packed,
    "dsir_importance": dsir_importance,
    "quality_classifier_score": quality_classifier_score,
    "bigram_surprisal": bigram_surprisal,
    "doc_fingerprint": doc_fingerprint,
}

ORACLES = {
    "distinctive_terms": DISTINCTIVE_TERMS_SQL,
    "token_stats": TOKEN_STATS_SQL,
    "quality_score": QUALITY_SQL,
    "language_id": LANG_ID_SQL,
    "sha256_documents": SHA256_SQL,
    "pii_redaction": PII_REDACTION_SQL,
    "doc_fingerprint": FINGERPRINT_SQL,
    "pretrain_corpus_filter": PRETRAIN_FILTER_SQL,
    "repetition_top_bigram": REPETITION_SQL,
    "decontamination_overlap": DECONTAMINATION_SQL,
    "corpus_stats_by_source": CORPUS_STATS_SQL,
    "unigram_surprisal": UNIGRAM_SURPRISAL_SQL,
    "curated_corpus": CURATED_CORPUS_SQL,
    "curated_corpus_packed": _curated_packed_sql(),
    "dsir_importance": DSIR_SQL,
    "quality_classifier_score": QUALITY_CLF_SQL,
    "bigram_surprisal": BIGRAM_SURPRISAL_SQL,
}
