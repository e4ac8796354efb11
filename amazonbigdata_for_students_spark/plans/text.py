"""Text analysis + deduplication over the documents table (north-star
extensions: SURVEY.md §2.10 U2/U6 and the training-data-pipeline surface).

Tokenization contract shared by every query here (and by the oracle twins):
tokens = non-empty pieces of lower(trim(text)) split on \\s+. All heavy
lifting stays JVM-side (split/filter/transform higher-order functions) —
no Python UDFs on these paths.
"""

from __future__ import annotations

from pyspark.sql import Window as W, DataFrame, SparkSession, functions as F

from ..sources.readers import load_table
from .registry import REGISTRY, query

def TOKENS():
    """Spark-side tokens column (array<string>); lazy because Column
    construction needs an active SparkContext."""
    return F.filter(F.split(F.lower(F.trim(F.col("text"))), r"\s+"), lambda x: x != "")
# DuckDB-side twin.
SQL_TOKENS = r"list_filter(string_split_regex(lower(trim(text)), '\s+'), x -> x <> '')"
# Spark-SQL-string twin of TOKENS() for call sites that must embed the
# tokenizer inside a larger F.expr/selectExpr string (the TOKENS/SQL_TOKENS
# "ONE definition" pair extended to the third consumer kind).
SPARK_SQL_TOKENS = (
    "filter(split(lower(trim(text)), '\\\\s+'), x -> x != '')"
)

STOPWORDS = ("the", "a", "an", "and", "or", "of", "to", "in", "is", "it")
_SQL_STOP = ", ".join(f"'{w}'" for w in STOPWORDS)


@query(
    "txt_token_stats",
    oracle=f"""
    SELECT doc_id,
           len({SQL_TOKENS}) AS n_tokens,
           length(text) AS n_chars_measured,
           round(length(text) / greatest(len({SQL_TOKENS}), 1), 6) AS chars_per_token
    FROM documents
    """,
    tags=("U2", "F7"),
    bench=True,
)
def txt_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting (whitespace tokenizer) — the token-budget accounting
    pass of a training-data pipeline. Pure higher-order functions: stays
    inside whole-stage codegen."""
    d = load_table(spark, sf_dir, "documents")
    n_tokens = F.size(TOKENS())
    return d.select(
        "doc_id",
        n_tokens.alias("n_tokens"),
        F.length("text").alias("n_chars_measured"),
        F.round(F.length("text") / F.greatest(n_tokens, F.lit(1)), 6).alias("chars_per_token"),
    )


@query(
    "txt_quality_score",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, text, {SQL_TOKENS} AS toks,
             len({SQL_TOKENS}) AS n_tokens
      FROM documents
    )
    SELECT doc_id,
           n_tokens,
           round(len(list_filter(toks, x -> x IN ({_SQL_STOP}))) / greatest(n_tokens, 1), 6) AS stopword_ratio,
           round((length(text) - length(regexp_replace(text, '[.,!?;:()]', '', 'g'))) / greatest(length(text), 1), 6) AS punct_ratio,
           round(length(replace(text, ' ', '')) / greatest(n_tokens, 1), 6) AS mean_token_len,
           (n_tokens >= 5 AND
            len(list_filter(toks, x -> x IN ({_SQL_STOP}))) / greatest(n_tokens, 1) BETWEEN 0.05 AND 0.7) AS passes_quality
    FROM t
    """,
    tags=("U2",),
)
def txt_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic document-quality scoring (length / punctuation / stopword
    ratios) — the C4-style quality gate, all JVM-side expressions."""
    d = load_table(spark, sf_dir, "documents")
    toks = TOKENS()
    n_tokens = F.size(toks)
    stop_hits = F.size(F.filter(toks, lambda x: x.isin(*STOPWORDS)))
    stop_ratio = F.round(stop_hits / F.greatest(n_tokens, F.lit(1)), 6)
    punct_ratio = F.round(
        (F.length("text") - F.length(F.regexp_replace("text", r"[.,!?;:()]", "")))
        / F.greatest(F.length("text"), F.lit(1)),
        6,
    )
    mean_tok = F.round(
        F.length(F.replace(F.col("text"), F.lit(" "), F.lit("")))
        / F.greatest(n_tokens, F.lit(1)),
        6,
    )
    passes = (n_tokens >= 5) & (stop_hits / F.greatest(n_tokens, F.lit(1))).between(0.05, 0.7)
    return d.select(
        "doc_id",
        n_tokens.alias("n_tokens"),
        stop_ratio.alias("stopword_ratio"),
        punct_ratio.alias("punct_ratio"),
        mean_tok.alias("mean_token_len"),
        passes.alias("passes_quality"),
    )


_GOPHER_STOP = ("the", "be", "to", "of", "and", "that", "have", "with")

# integer pass/fail predicate over the gopher measure columns — shared by
# the standalone query's oracle and corpus-pipeline compositions
_GOPHER_PASS_PRED = (
    "(n_words BETWEEN 10 AND 100000"
    " AND 3 * n_words <= n_chars_in_words"
    " AND n_chars_in_words <= 10 * n_words"
    " AND 10 * n_symbols < n_words"
    " AND 10 * n_alpha_words > 8 * n_words"
    " AND n_stop_present >= 2)"
)


def gopher_measure_cols(stop: tuple[str, ...] = _GOPHER_STOP):
    """Spark twins of gopher_measures_sql_cte's integer measures plus the
    pass predicate — one implementation for the standalone query and the
    corpus-pipeline compositions. ``stop`` mirrors the SQL builder's
    required-function-word parameter."""
    toks = TOKENS()
    n_words = F.size(toks)
    chars_in_words = F.length(F.replace(F.col("text"), F.lit(" "), F.lit("")))
    n_alpha = F.size(F.filter(toks, lambda x: x.rlike("[a-z]")))
    n_symbols = (
        F.length("text")
        - F.length(F.replace(F.col("text"), F.lit("#"), F.lit("")))
        + (
            F.length("text")
            - F.length(F.replace(F.col("text"), F.lit("..."), F.lit("")))
        )
        / F.lit(3)
    ).cast("bigint")
    n_stop = F.size(
        F.filter(
            F.array(*[F.lit(w) for w in stop]),
            lambda s: F.array_contains(toks, s),
        )
    )
    passes = (
        n_words.between(10, 100000)
        & (3 * n_words <= chars_in_words)
        & (chars_in_words <= 10 * n_words)
        & (10 * n_symbols < n_words)
        & (10 * n_alpha > 8 * n_words)
        & (n_stop >= 2)
    )
    return n_words, chars_in_words, n_alpha, n_symbols, n_stop, passes


def gopher_measures_sql_cte(
    src: str, extra_cols: str = "", stop: tuple[str, ...] = _GOPHER_STOP
) -> str:
    """DuckDB CTE ``gm`` computing the integer Gopher measures over
    ``src`` (doc_id + text [+ extra_cols carried through]). ``stop`` is
    the required-function-word inventory — Gopher's published English-web
    set by default; a per-language/per-corpus parameter in practice."""
    carry = f", {extra_cols}" if extra_cols else ""
    return f"""gm AS (
      SELECT doc_id{carry}, n_words, n_chars_in_words,
             len(list_filter(toks, x -> regexp_matches(x, '[a-z]'))) AS n_alpha_words,
             CAST((length(text) - length(replace(text, '#', '')))
                  + (length(text) - length(replace(text, '...', ''))) // 3
                  AS BIGINT) AS n_symbols,
             len(list_filter(['{"','".join(stop)}'],
                             s -> list_contains(toks, s))) AS n_stop_present
      FROM (
        SELECT doc_id, text{carry}, {SQL_TOKENS} AS toks,
               len({SQL_TOKENS}) AS n_words,
               length(replace(text, ' ', '')) AS n_chars_in_words
        FROM {src}
      )
    )"""


@query(
    "quality_gopher_rules",
    oracle=f"""
    WITH {gopher_measures_sql_cte("documents")}
    SELECT doc_id, n_words,
           round(n_chars_in_words / greatest(n_words, 1), 6) AS mean_word_len,
           round(n_alpha_words / greatest(n_words, 1), 6) AS alpha_word_ratio,
           round(n_symbols / greatest(n_words, 1), 6) AS symbol_ratio,
           CAST(n_stop_present AS BIGINT) AS n_stop_present,
           {_GOPHER_PASS_PRED} AS passes_gopher
    FROM gm
    """,
    tags=("U2", "F2"),
)
def quality_gopher_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition/format quality rules (Rae et al. 2021,
    'Scaling Language Models: ... Gopher', Appendix A — the public rule
    set most LLM corpus pipelines start from): word-count bounds, mean
    word length in [3, 10], symbol-to-word ratio (# and ellipsis) < 0.1,
    >80% of words carrying an alphabetic character, and at least two
    distinct members of the required stop-word set present. Every gate
    evaluates as INTEGER cross-multiplication (3·n ≤ chars ≤ 10·n,
    10·symbols < n, 10·alpha > 8·n), so the pass/fail booleans are exact
    cross-engine regardless of float rounding; the reported ratios are
    display-only. Map-only: zero shuffles — at 100 TB this is a pure
    scan-bandwidth filter stage, composing ahead of the dedup/mixing
    stages exactly as in the published pipeline."""
    d = load_table(spark, sf_dir, "documents")
    n_words, chars_in_words, n_alpha, n_symbols, n_stop, passes = (
        gopher_measure_cols()
    )
    denom = F.greatest(n_words, F.lit(1))
    return d.select(
        "doc_id",
        n_words.alias("n_words"),
        F.round(chars_in_words / denom, 6).alias("mean_word_len"),
        F.round(n_alpha / denom, 6).alias("alpha_word_ratio"),
        F.round(n_symbols / denom, 6).alias("symbol_ratio"),
        n_stop.cast("bigint").alias("n_stop_present"),
        passes.alias("passes_gopher"),
    )


_LANG_MARKERS = {
    "en": ("the", "and", "of", "is", "was"),
    "de": ("der", "die", "und", "ist", "das"),
    "fr": ("le", "la", "et", "les", "des"),
    "es": ("el", "los", "las", "una", "es"),
}


def _marker_pred_sql(words: tuple[str, ...]) -> str:
    inlist = ", ".join(f"'{w}'" for w in words)
    return f"len(list_filter({SQL_TOKENS}, x -> x IN ({inlist})))"


# Shared between txt_lang_id and the eval lane (plans/evals.py): the hits
# CTE columns and the argmax CASE — ONE definition of the classifier, so
# the evaluation queries grade exactly the classifier that ships.
LANG_HITS_SQL = ",\n             ".join(
    f"{_marker_pred_sql(words)} AS hits_{lang}" for lang, words in _LANG_MARKERS.items()
)
LANG_PRED_CASE_SQL = """CASE WHEN greatest(hits_en, hits_de, hits_fr, hits_es) = 0 THEN 'und'
                WHEN hits_en >= greatest(hits_de, hits_fr, hits_es) THEN 'en'
                WHEN hits_de >= greatest(hits_fr, hits_es) THEN 'de'
                WHEN hits_fr >= hits_es THEN 'fr'
                ELSE 'es' END"""


def lang_pred_col():
    """Column twin of LANG_HITS_SQL + LANG_PRED_CASE_SQL over TOKENS()."""
    toks = TOKENS()

    def marker_hits(words: tuple[str, ...]):
        return F.size(F.filter(toks, lambda x: x.isin(*words)))

    hits = {lang: marker_hits(words) for lang, words in _LANG_MARKERS.items()}
    best = F.greatest(*hits.values())
    return (
        F.when(best == 0, "und")
        .when(hits["en"] >= F.greatest(hits["de"], hits["fr"], hits["es"]), "en")
        .when(hits["de"] >= F.greatest(hits["fr"], hits["es"]), "de")
        .when(hits["fr"] >= hits["es"], "fr")
        .otherwise("es")
    )


@query(
    "txt_lang_id",
    oracle=f"""
    WITH scored AS (
      SELECT doc_id,
             {LANG_HITS_SQL}
      FROM documents
    )
    SELECT doc_id,
           {LANG_PRED_CASE_SQL} AS lang_pred
    FROM scored
    """,
    tags=("U2",),
)
def txt_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language identification via stopword-marker voting (n-gram-heuristic
    family): argmax of per-language marker-token hits, deterministic
    tie-break by fixed language priority. The prediction expression lives
    in lang_pred_col() so the eval lane grades the identical classifier."""
    d = load_table(spark, sf_dir, "documents")
    return d.select("doc_id", lang_pred_col().alias("lang_pred"))


# Normalized-text fingerprint shared by the dedup queries.
_NORM_SQL = r"md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'))"
def _NORM():
    return F.md5(F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " "))


@query(
    "txt_fingerprint",
    oracle=f"SELECT doc_id, {_NORM_SQL} AS fingerprint FROM documents",
    tags=("U2", "F8"),
)
def txt_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprinting: md5 over whitespace-normalized lowercase
    text — the exact-dedup key."""
    d = load_table(spark, sf_dir, "documents")
    return d.select("doc_id", _NORM().alias("fingerprint"))


@query(
    "dedup_exact_docs",
    oracle=f"""
    SELECT {_NORM_SQL} AS fingerprint,
           min(doc_id) AS canonical_id,
           count(*) AS n_copies
    FROM documents
    GROUP BY 1
    """,
    tags=("U6", "E3"),
    bench=True,
)
def dedup_exact_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: hash-groupBy on the normalized fingerprint, keep the
    lowest doc_id as canonical. One shuffle on the 32-byte digest — at
    100 TB this is the cheapest dedup pass and runs first."""
    d = load_table(spark, sf_dir, "documents")
    return (
        d.select("doc_id", _NORM().alias("fingerprint"))
        .groupBy("fingerprint")
        .agg(F.min("doc_id").alias("canonical_id"), F.count("*").alias("n_copies"))
    )


# Token 3-gram shingles, 1-indexed element_at in Spark / 1-based list index in
# DuckDB so both build identical shingle strings.
_SHINGLES_SPARK = (
    # Guarded: for size(toks) < 3, sequence(1, size-2) would count DOWN
    # (e.g. sequence(1, 0) = [1, 0]) and element_at(toks, 0) throws
    # INVALID_ARRAY_INDEX_IN_ELEMENT_AT — short/empty/null docs must yield
    # an empty shingle list, matching the DuckDB twin's range() semantics.
    "CASE WHEN size(toks) >= 3 THEN transform(sequence(1, size(toks) - 2), "
    "i -> concat(element_at(toks, i), ' ', element_at(toks, i + 1), ' ', element_at(toks, i + 2))) "
    "ELSE array() END"
)
_SHINGLES_SQL = (
    "list_transform(range(1, greatest(len(toks) - 1, 1)), "
    "i -> toks[i] || ' ' || toks[i + 1] || ' ' || toks[i + 2])"
)

# Stop-shingle (document-frequency) threshold for the pairwise Jaccard
# candidate joins: a shingle appearing in more than max(10, 1% of docs)
# documents is corpus boilerplate — it cannot discriminate near-duplicates,
# but at scale ONE such shingle makes the self-join partition quadratic
# (the hot-shingle skew VERDICT r1/r2 flagged). Both engines drop those
# shingles before pairing AND before the per-doc sizes, so the Jaccard is
# exact over the filtered shingle universe on both sides.
_DF_LIMIT_SQL = "greatest(10, floor(0.01 * (SELECT count(*) FROM documents)))"

# Shared candidate-join oracle for the two exact-Jaccard queries (they
# must return identical answers by construction).
_JACCARD_ORACLE = f"""
    WITH toks AS (SELECT doc_id, {SQL_TOKENS} AS toks FROM documents),
         sh0 AS (SELECT doc_id, unnest(list_distinct({_SHINGLES_SQL})) AS shingle FROM toks),
         hot AS (SELECT shingle FROM sh0 GROUP BY shingle
                 HAVING count(*) > {_DF_LIMIT_SQL}),
         sh AS (SELECT * FROM sh0 WHERE shingle NOT IN (SELECT shingle FROM hot)),
         sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
         pairs AS (
           SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
           FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
           GROUP BY 1, 2
         )
    SELECT doc_a, doc_b,
           round(n_common / (sa.n + sb.n - n_common), 6) AS jaccard
    FROM pairs
    JOIN sizes sa ON sa.doc_id = doc_a
    JOIN sizes sb ON sb.doc_id = doc_b
    WHERE n_common / (sa.n + sb.n - n_common) >= 0.5
    """


def _deskewed_shingles(d: DataFrame) -> DataFrame:
    """(doc_id, shingle) pairs, distinct per doc, with hot shingles
    (document frequency > max(10, 1% of docs)) anti-joined away. The hot
    set is tiny by construction — few shingles can exceed a 1% DF — so the
    anti join broadcasts; the DF aggregation itself combines map-side."""
    sh = d.withColumn("toks", TOKENS()).select(
        "doc_id", F.explode(F.array_distinct(F.expr(_SHINGLES_SPARK))).alias("shingle")
    )
    n_docs = d.agg(F.count("*").alias("n_docs"))
    hot = (
        sh.groupBy("shingle")
        .agg(F.count("*").alias("df"))
        .crossJoin(F.broadcast(n_docs))
        .filter(F.col("df") > F.greatest(F.lit(10), F.floor(0.01 * F.col("n_docs"))))
        .select("shingle")
    )
    return sh.join(F.broadcast(hot), "shingle", "left_anti")


@query(
    "dedup_ngram_jaccard",
    oracle=_JACCARD_ORACLE,
    tags=("U6",),
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup detection: token-3-gram shingle Jaccard ≥ 0.5 over the
    DF-filtered shingle universe (stop-shingles with document frequency
    above max(10, 1% of docs) are dropped first — see _deskewed_shingles:
    they carry no near-dup signal but one of them would make a candidate
    partition quadratic at corpus scale). The candidate join is then on
    rare-shingle equality, so the pair explosion stays bounded and no
    single shingle group can exceed ~1% of the corpus; the full O(n²)
    matrix is never materialized."""
    d = load_table(spark, sf_dir, "documents")
    sh = _deskewed_shingles(d)
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n"))
    a = sh.alias("a")
    b = sh.alias("b")
    pairs = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count("*").alias("n_common"))
    )
    sa = sizes.alias("sa")
    sb = sizes.alias("sb")
    jac = F.col("n_common") / (F.col("sa.n") + F.col("sb.n") - F.col("n_common"))
    return (
        pairs.join(sa, F.col("doc_a") == F.col("sa.doc_id"))
        .join(sb, F.col("doc_b") == F.col("sb.doc_id"))
        .filter(jac >= 0.5)
        .select("doc_a", "doc_b", F.round(jac, 6).alias("jaccard"))
    )


# MinHash: k=4 md5-derived permutations over distinct tokens. md5 is the
# cross-engine-stable "random" hash; min over hex digests per seed is the
# signature component.
_MINHASH_K = 4


@query(
    "dedup_minhash_signatures",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, unnest(list_distinct({SQL_TOKENS})) AS tok FROM documents
    )
    SELECT doc_id,
           {", ".join(f"min(md5('{s}|' || tok)) AS sig{s}" for s in range(_MINHASH_K))}
    FROM tok
    GROUP BY doc_id
    """,
    tags=("U6",),
)
def dedup_minhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash signatures (k=4 seeded md5 permutations over distinct
    tokens): the signature stage of MinHash-LSH dedup. MAP-ONLY: each
    signature is array_min over a per-row transform of the token array —
    no explode, no shuffle, no sort-based aggregate. (The earlier
    explode→groupBy(doc).min() shape shuffled one row per (doc, token) and
    fell back to SortAggregate because a string min-buffer isn't a mutable
    fixed-size type; at 100 TB that shuffle is the whole cost of the
    signature stage, and it buys nothing.) Downstream stages shuffle only
    the k×32-char signatures. Zero-token documents carry no signature and
    are dropped — the same semantics as the oracle's unnest (no token
    rows -> no doc row); without the filter their NULL signatures would
    concat to a NULL band key downstream and collapse every empty doc
    into one spurious LSH group."""
    return minhash_signatures(spark, sf_dir)


def minhash_signatures(
    spark: SparkSession, sf_dir: str, extra_cols: tuple[str, ...] = ()
) -> DataFrame:
    """The signature scan with optional carried-through columns — ONE
    definition of the zero-token filter (see the query docstring above
    for why NULL signatures must not reach a band key), so consumers
    that need e.g. the source column (mix_dedup_weighted) cannot fork
    the empty-doc semantics."""
    d = load_table(spark, sf_dir, "documents")
    return d.select("doc_id", *extra_cols, *minhash_sig_cols()).filter(
        F.col("sig0").isNotNull()
    )


def minhash_sig_cols(toks=None) -> list:
    """The k seeded MinHash signature Columns over TOKENS() — shared by
    the signature query, the LSH groupings, and the pipeline compositions
    so every consumer bands on the identical signatures. Pass ``toks``
    (an already-materialized array<string> Column) when the caller has
    tokenized once for several consumers — same signatures, one regex
    pass (the v7 sf100 tuning, VERDICT r9 item 4)."""
    toks = F.array_distinct(TOKENS() if toks is None else toks)

    def sig(seed: int):
        # NB: the lambda must be unary — transform() feeds a second arg the
        # element INDEX, which a default-arg closure would silently absorb
        return F.array_min(
            F.transform(toks, lambda t: F.md5(F.concat(F.lit(f"{seed}|"), t)))
        ).alias(f"sig{seed}")

    return [sig(s) for s in range(_MINHASH_K)]


def minhash_band_col():
    """The LSH band key over a signature table's sig0..sigK columns —
    shared by the LSH dedup, the leakage audit, and the pipeline
    compositions so every consumer bands on the identical key (SQL twin:
    MINHASH_BAND_SQL)."""
    return F.concat(*[F.col(f"sig{s}") for s in range(_MINHASH_K)])


MINHASH_BAND_SQL = " || ".join(f"sig{s}" for s in range(_MINHASH_K))


@query(
    "dedup_minhash_groups",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, unnest(list_distinct({SQL_TOKENS})) AS tok FROM documents
    ),
    sig AS (
      SELECT doc_id,
             {", ".join(f"min(md5('{s}|' || tok)) AS sig{s}" for s in range(_MINHASH_K))}
      FROM tok GROUP BY doc_id
    )
    SELECT {MINHASH_BAND_SQL} AS band_key,
           min(doc_id) AS canonical_id,
           count(*) AS n_members
    FROM sig
    GROUP BY 1
    HAVING count(*) > 1
    """,
    tags=("U6",),
    bench=True,
)
def dedup_minhash_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH banding (one band of width 4): documents sharing the full
    signature are near-dup candidates; groupBy on the band key replaces the
    pairwise join entirely — the 100 TB-friendly dedup reduction."""
    sig = dedup_minhash_signatures(spark, sf_dir)
    return (
        sig.select("doc_id", minhash_band_col().alias("band_key"))
        .groupBy("band_key")
        .agg(F.min("doc_id").alias("canonical_id"), F.count("*").alias("n_members"))
        .filter(F.col("n_members") > 1)
    )


_SIG_SQL = ", ".join(f"min(md5('{s}|' || tok)) AS sig{s}" for s in range(_MINHASH_K))


@query(
    "dedup_connected_components",
    oracle=f"""
    WITH RECURSIVE tok AS (
      SELECT doc_id, unnest(list_distinct({SQL_TOKENS})) AS tok FROM documents
    ),
    sig AS (SELECT doc_id, {_SIG_SQL} FROM tok GROUP BY doc_id),
    ga AS (SELECT doc_id, sig0 || sig1 AS k FROM sig),
    gb AS (SELECT doc_id, sig2 || sig3 AS k FROM sig),
    ea AS (SELECT g.doc_id AS a, m.mn AS b
           FROM ga g JOIN (SELECT k, min(doc_id) AS mn FROM ga GROUP BY k) m USING (k)
           WHERE g.doc_id <> m.mn),
    eb AS (SELECT g.doc_id AS a, m.mn AS b
           FROM gb g JOIN (SELECT k, min(doc_id) AS mn FROM gb GROUP BY k) m USING (k)
           WHERE g.doc_id <> m.mn),
    ed AS (
      SELECT a, b FROM ea UNION SELECT a, b FROM eb
      UNION SELECT b, a FROM ea UNION SELECT b, a FROM eb
    ),
    closure(src, dst) AS (
      SELECT doc_id, doc_id FROM sig
      UNION
      SELECT c.src, e.b FROM closure c JOIN ed e ON c.dst = e.a
    )
    SELECT src AS doc_id, min(dst) AS component FROM closure GROUP BY src
    """,
    tags=("U6",),
)
def dedup_connected_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U6 complete — near-duplicate CLUSTERS, not just candidate pairs:
    two LSH bands (sig0||sig1, sig2||sig3) generate star edges from each
    band-group member to the group's min doc_id (linear in group size —
    never the quadratic within-group clique), then iterative min-label
    propagation over the symmetric edge set converges to connected
    components. Each iteration is one shuffle join + aggregate, lineage
    truncated per round via localCheckpoint — the pattern that scales to
    billions of edges (label propagation / large-star, cf. GraphFrames'
    connectedComponents). The DuckDB oracle computes the same fixpoint
    with a recursive CTE, so this iterative, non-SQL Spark algorithm still
    gets an exact hash-checked gate."""
    sig = dedup_minhash_signatures(spark, sf_dir)
    from pyspark.sql import Window as W

    def star_edges(band_col):
        g = sig.select("doc_id", band_col.alias("k"))
        rep = F.min("doc_id").over(W.partitionBy("k"))
        return (
            g.withColumn("b", rep)
            .filter(F.col("doc_id") != F.col("b"))
            .select(F.col("doc_id").alias("a"), "b")
        )

    ea = star_edges(F.concat(F.col("sig0"), F.col("sig1")))
    eb = star_edges(F.concat(F.col("sig2"), F.col("sig3")))
    fwd = ea.unionByName(eb)
    edges = fwd.unionByName(fwd.select(F.col("b").alias("a"), F.col("a").alias("b"))).distinct()
    edges = edges.localCheckpoint(eager=True)

    labels = sig.select("doc_id", F.col("doc_id").alias("label")).localCheckpoint(eager=True)
    for _ in range(20):
        nbr = (
            edges.join(labels, edges.a == labels.doc_id)
            .groupBy(F.col("b").alias("doc_id"))
            .agg(F.min("label").alias("nlabel"))
        )
        new = (
            labels.join(nbr, "doc_id", "left")
            .select(
                "doc_id",
                F.least(F.col("label"), F.coalesce("nlabel", "label")).alias("label"),
            )
            .localCheckpoint(eager=True)
        )
        changed = (
            new.alias("n")
            .join(labels.alias("o"), "doc_id")
            .filter(F.col("n.label") != F.col("o.label"))
            .count()
        )
        labels = new
        if changed == 0:
            break
    else:
        # Same loud-failure policy as er_resolve_entities: an unconverged
        # exit would silently return split components.
        raise RuntimeError(
            f"dedup_connected_components: label propagation did not converge "
            f"in 20 iterations ({changed} labels still changing)"
        )
    return labels.select("doc_id", F.col("label").alias("component"))


@query(
    "txt_pii_flag",
    oracle=r"""
    SELECT doc_id,
           regexp_matches(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}') AS has_email,
           regexp_matches(text, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b') AS has_ip,
           regexp_matches(text, '\b\d{3}[-. ]\d{3}[-. ]\d{4}\b') AS has_phone
    FROM documents
    """,
    tags=("U2", "F2"),
)
def txt_pii_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-data hygiene: PII detection flags (email / IPv4 / US-phone
    shapes) as JVM-side regexps — the pre-filter step every corpus
    pipeline runs before training. Pure `rlike`, so the scan stays inside
    whole-stage codegen; at 100 TB this is a map-only pass with no
    shuffle."""
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.col("text").rlike(r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}").alias("has_email"),
        F.col("text").rlike(r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b").alias("has_ip"),
        F.col("text").rlike(r"\b\d{3}[-. ]\d{3}[-. ]\d{4}\b").alias("has_phone"),
    )


@query(
    "dedup_jaccard_prefix",
    oracle=_JACCARD_ORACLE,
    tags=("U6",),
)
def dedup_jaccard_prefix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT Jaccard pairs (same answer, same oracle, as
    dedup_ngram_jaccard) via prefix filtering — the ppjoin-family
    optimization that makes exact set-similarity joins feasible at scale:
    under a global canonical shingle order (md5), two docs with
    J >= t MUST share a shingle within their first |A| - ceil(t*|A|) + 1
    shingles, so candidate generation joins only the prefixes (half the
    shingles at t=0.5, and the join cost is quadratic in group size), then
    only surviving candidate pairs pay the full intersection count.
    Exactness (over the same DF-filtered shingle universe as
    dedup_ngram_jaccard — see _deskewed_shingles) is guaranteed by the
    prefix-filter theorem, and the shared oracle verifies it.

    Tradeoff: candidate-generate-then-verify wins when near-duplicates are
    sparse (the realistic corpus regime — candidates << all pairs); on a
    corpus that is mostly copies, candidates ~ true pairs and the
    single-pass join (dedup_ngram_jaccard) is the better plan. Both are
    exact; an engine would pick by duplicate-rate estimate."""
    from pyspark.sql import Window as W

    t = 0.5
    d = load_table(spark, sf_dir, "documents")
    sh = _deskewed_shingles(d).localCheckpoint(eager=True)
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n"))
    w = W.partitionBy("doc_id").orderBy(F.md5("shingle"), "shingle")
    prefix = (
        sh.withColumn("rn", F.row_number().over(w))
        .join(sizes, "doc_id")
        .filter(F.col("rn") <= F.col("n") - F.ceil(F.col("n") * t) + 1)
        .select("doc_id", "shingle")
    )
    a, b = prefix.alias("a"), prefix.alias("b")
    cand = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    common = (
        cand.join(sh.alias("fa"), F.col("doc_a") == F.col("fa.doc_id"))
        .join(
            sh.alias("fb"),
            (F.col("doc_b") == F.col("fb.doc_id")) & (F.col("fa.shingle") == F.col("fb.shingle")),
        )
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("n_common"))
    )
    sa, sb = sizes.alias("sa"), sizes.alias("sb")
    jac = F.col("n_common") / (F.col("sa.n") + F.col("sb.n") - F.col("n_common"))
    return (
        common.join(sa, F.col("doc_a") == F.col("sa.doc_id"))
        .join(sb, F.col("doc_b") == F.col("sb.doc_id"))
        .filter(jac >= t)
        .select("doc_a", "doc_b", F.round(jac, 6).alias("jaccard"))
    )


@query(
    "txt_bpe_token_count",
    oracle=r"""
    SELECT doc_id,
           len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9[:space:]]')) AS n_bpe_tokens,
           len(list_filter(string_split_regex(lower(trim(text)), '\s+'), x -> x <> '')) AS n_ws_tokens
    FROM documents
    """,
    tags=("U2", "F2"),
)
def txt_bpe_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting for training-data budgeting: a BPE-ish pre-tokenizer
    regex (letter runs | digit runs | single punctuation — the shape GPT-2
    style pre-tokenization produces) next to the whitespace count. Pure
    regexp_extract_all + size, JVM-side; the ratio of the two is the
    standard tokens-per-word sanity metric for corpus sizing."""
    d = load_table(spark, sf_dir, "documents")
    low = F.lower(F.col("text"))
    return d.select(
        "doc_id",
        F.size(F.regexp_extract_all(low, F.lit(r"[a-z]+|[0-9]+|[^a-z0-9\s]"), 0)).alias(
            "n_bpe_tokens"
        ),
        F.size(TOKENS()).alias("n_ws_tokens"),
    )


@query(
    "txt_repetition_stats",
    oracle=f"""
    WITH t AS (SELECT doc_id, unnest({SQL_TOKENS}) AS tok FROM documents),
         c AS (SELECT doc_id, tok, count(*) AS c FROM t GROUP BY doc_id, tok)
    SELECT doc_id,
           CAST(sum(c) AS BIGINT) AS n_tokens,
           count(*) AS n_distinct,
           round(1.0 - count(*) / CAST(sum(c) AS DOUBLE), 6) AS dup_word_frac,
           round(max(c) / CAST(sum(c) AS DOUBLE), 6) AS top_word_share
    FROM c
    GROUP BY doc_id
    """,
    tags=("U2", "A3"),
)
def txt_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repetition-based quality signals (the Gopher-rules family): per
    document, the fraction of word occurrences that are repeats and the
    share held by the single most frequent word — the two cheapest
    detectors of boilerplate/keyword-stuffed text that length filters
    miss. Shape: explode to (doc, token), count per pair (map-side
    combine does most of the work — per-doc vocab is far smaller than
    per-doc tokens), then one per-doc rollup. Both shuffles key on
    doc_id(+token), so parallelism is per-document and no stage ever
    holds more than a doc's vocabulary."""
    d = load_table(spark, sf_dir, "documents")
    c = (
        d.select("doc_id", F.explode(TOKENS()).alias("tok"))
        .groupBy("doc_id", "tok")
        .agg(F.count("*").alias("c"))
    )
    n = F.sum("c")
    return c.groupBy("doc_id").agg(
        n.cast("long").alias("n_tokens"),
        F.count("*").alias("n_distinct"),
        F.round(1.0 - F.count("*") / n.cast("double"), 6).alias("dup_word_frac"),
        F.round(F.max("c") / n.cast("double"), 6).alias("top_word_share"),
    )


@query(
    "txt_winnow_fingerprints",
    oracle=f"""
    WITH toks AS (SELECT doc_id, {SQL_TOKENS} AS toks FROM documents),
         grams AS (
           SELECT doc_id, i AS pos,
                  CAST(list_sum(list_transform(range(1, 9),
                    j -> (strpos('0123456789abcdef',
                            substring(md5(toks[i] || ' ' || toks[i + 1] || ' ' || toks[i + 2]), j, 1)) - 1)
                         * CAST(power(16, 8 - j) AS BIGINT))) AS BIGINT) AS h
           FROM toks, unnest(range(1, greatest(len(toks) - 2, 0) + 1)) AS u(i)
         ),
         winmin AS (
           SELECT doc_id,
                  min(h) OVER (PARTITION BY doc_id ORDER BY pos
                               ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS fp
           FROM grams
         ),
         sel AS (SELECT DISTINCT doc_id, fp FROM winmin)
    SELECT doc_id, count(*) AS n_fps, CAST(sum(fp) AS BIGINT) AS fp_checksum
    FROM sel
    GROUP BY doc_id
    """,
    tags=("U2", "U6", "F8", "W3"),
)
def txt_winnow_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing document fingerprints (the MOSS rolling-hash scheme): hash
    every 3-token shingle, slide a 4-position window over the hash
    sequence, keep each window's minimum — the guarantee is that any match
    of >= window+shingle tokens between two documents shares a selected
    fingerprint, at ~1/4 the storage of all-shingles. This is the
    plagiarism/near-dup fingerprinting the brief's 'rolling hash' family
    means. All JVM-side: posexplode, md5-prefix as int64, a per-document
    rows-frame window min, distinct. Parallelism is per-document; the
    selected-set checksum makes the result hash-checkable without
    materializing fingerprint lists."""
    from pyspark.sql import Window as PW

    d = load_table(spark, sf_dir, "documents").select("doc_id", TOKENS().alias("toks"))
    grams = (
        d.select("doc_id", "toks", F.posexplode("toks").alias("pos0", "tok"))
        .filter(F.col("pos0") <= F.size("toks") - 3)
        .select(
            "doc_id",
            (F.col("pos0") + 1).alias("pos"),
            F.conv(
                F.substring(
                    F.md5(
                        F.concat_ws(
                            " ",
                            F.col("tok"),
                            F.element_at("toks", F.col("pos0") + 2),
                            F.element_at("toks", F.col("pos0") + 3),
                        )
                    ),
                    1,
                    8,
                ),
                16,
                10,
            )
            .cast("long")
            .alias("h"),
        )
    )
    w = PW.partitionBy("doc_id").orderBy("pos").rowsBetween(0, 3)
    sel = grams.select("doc_id", F.min("h").over(w).alias("fp")).distinct()
    return sel.groupBy("doc_id").agg(
        F.count("*").alias("n_fps"), F.sum("fp").cast("long").alias("fp_checksum")
    )


@query(
    "vocab_induction",
    oracle=f"""
    WITH tok AS (SELECT unnest({SQL_TOKENS}) AS token FROM documents),
         cnt AS (SELECT token, count(*) AS cnt FROM tok GROUP BY token),
         total AS (SELECT count(*) AS t FROM tok),
         top AS (SELECT token, cnt FROM cnt ORDER BY cnt DESC, token LIMIT 100)
    SELECT token, cnt,
           row_number() OVER (ORDER BY cnt DESC, token) AS rank,
           round(sum(cnt) OVER (ORDER BY cnt DESC, token
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 / CAST(total.t AS DOUBLE), 6) AS cum_coverage
    FROM top, total
    """,
    tags=("U2", "A1", "W3", "O2"),
)
def vocab_induction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer vocabulary induction — the frequency pass every tokenizer
    build starts from: the top-K corpus tokens with the cumulative share
    of all token occurrences each prefix of the vocabulary covers (the
    coverage curve that picks the vocab size). Scale shape: the token
    count is one map-side-combined aggregate; TakeOrderedAndProject caps
    the candidates at K BEFORE the ranking window, so the only global
    window ever sees K rows, not the vocabulary; the total is a 1-row
    broadcast."""
    d = load_table(spark, sf_dir, "documents")
    tok = d.select(F.explode(TOKENS()).alias("token"))
    total = tok.agg(F.count("*").alias("t"))
    top = (
        tok.groupBy("token")
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.col("cnt").desc(), "token")
        .limit(100)
    )
    from pyspark.sql import Window as PW

    w = PW.orderBy(F.col("cnt").desc(), "token")
    return (
        top.crossJoin(F.broadcast(total))
        .select(
            "token",
            "cnt",
            F.row_number().over(w).alias("rank"),
            F.round(
                F.sum("cnt").over(w.rowsBetween(PW.unboundedPreceding, 0))
                / F.col("t").cast("double"),
                6,
            ).alias("cum_coverage"),
        )
    )


@query(
    "txt_tfidf_topk",
    oracle=f"""
    WITH toks AS (SELECT doc_id, unnest({SQL_TOKENS}) AS term FROM documents),
         tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2),
         idf AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
         n AS (SELECT count(*) AS n_docs FROM documents)
    SELECT doc_id, term, tf, df,
           round(CAST(tf * n_docs AS DOUBLE) / df, 6) AS tfidf_lin, rank
    FROM (
      SELECT tf.doc_id, tf.term, tf.tf, idf.df, n.n_docs,
             row_number() OVER (
               PARTITION BY tf.doc_id
               ORDER BY CAST(tf.tf * n.n_docs AS DOUBLE) / idf.df DESC, tf.term
             ) AS rank
      FROM tf JOIN idf USING (term) CROSS JOIN n
    ) WHERE rank <= 3
    """,
    tags=("U2", "A1", "W1", "J1"),
)
def txt_tfidf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF keyword extraction: the top-3 most characteristic terms per
    document, scored with the linear-idf variant tf * N / df. The linear
    form is chosen deliberately: tf*N is exact in int64 and well under
    2^53, so the IEEE division by df is correctly rounded and bit-identical
    across engines — unlike ln(N/df), whose libm differs between the JVM
    and DuckDB, which would make the ranking hash-fragile. Scale shape:
    tf is one (doc,term)-keyed aggregate off the exploded tokens; df
    re-aggregates the (already one-row-per-doc-term) tf table with
    map-side combine, so hot terms cost one counter per partition, not a
    hot shuffle group; the tf<-df join is term-keyed but the tf side
    carries at most one row per (doc,term); the per-doc window is capped
    by WindowGroupLimit (rank<=3 pushes into the shuffle-read)."""
    from pyspark.sql import Window as PW

    d = load_table(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.explode(TOKENS()).alias("term"))
    tf = toks.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    idf = tf.groupBy("term").agg(F.count("*").alias("df"))
    n = d.agg(F.count("*").alias("n_docs"))
    score = (F.col("tf") * F.col("n_docs")).cast("double") / F.col("df")
    w = PW.partitionBy("doc_id").orderBy(score.desc(), "term")
    return (
        tf.join(idf, "term")
        .crossJoin(F.broadcast(n))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
        .select(
            "doc_id", "term", "tf", "df",
            F.round(score, 6).alias("tfidf_lin"), "rank",
        )
    )


_HH_K = 50  # Misra-Gries counter budget => reports every term with freq > n/K


@query(
    "txt_heavy_hitters",
    oracle=f"""
    WITH toks AS (SELECT unnest({SQL_TOKENS}) AS term FROM documents),
         n AS (SELECT count(*) AS n_tokens FROM toks)
    SELECT term, count(*) AS exact_count, n.n_tokens
    FROM toks CROSS JOIN n
    GROUP BY term, n.n_tokens
    HAVING count(*) * {_HH_K} > n.n_tokens
    """,
    tags=("A5", "U3", "A1"),
)
def txt_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heavy-hitter tokens (freq > n/K, K=50) via the two-pass
    Misra-Gries pattern — the sketch answer that is nevertheless EXACT,
    which is what makes it fully hash-checkable: pass 1 runs a K-counter
    Misra-Gries summary per Arrow batch inside mapInPandas (pigeonhole:
    any term with global freq > n/K exceeds its share in at least one
    batch, so the union of per-batch candidates is a superset of the true
    heavy hitters); pass 2 broadcast-semi-joins the tiny candidate set
    back onto the token stream and counts exactly. At 100 TB the final
    shuffle carries only candidate-term rows (<= K per batch), never the
    full vocabulary — the sketch does the pruning, the exact pass does
    the proving."""
    from collections.abc import Iterator

    import pandas as pd
    from pyspark.sql import types as T

    d = load_table(spark, sf_dir, "documents")
    toks = d.select(F.explode(TOKENS()).alias("term"))

    cand_schema = T.StructType([T.StructField("term", T.StringType())])

    def mg(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            counters: dict[str, int] = {}
            for t in pdf["term"]:
                if t in counters:
                    counters[t] += 1
                elif len(counters) < _HH_K:
                    counters[t] = 1
                else:
                    # decrement-all step; drop zeroed counters
                    counters = {k: v - 1 for k, v in counters.items() if v > 1}
            yield pd.DataFrame({"term": list(counters)})

    candidates = toks.mapInPandas(mg, cand_schema).distinct()
    n = toks.agg(F.count("*").alias("n_tokens"))
    return (
        toks.join(F.broadcast(candidates), "term", "left_semi")
        .groupBy("term")
        .agg(F.count("*").alias("exact_count"))
        .crossJoin(F.broadcast(n))
        .filter(F.col("exact_count") * _HH_K > F.col("n_tokens"))
    )


# Hierarchical-blocking CTE text shared by every oracle that consumes the
# blocked fuzzy candidates (join_fuzzy_blocked, er_resolve_entities,
# er_fellegi_sunter) — ONE definition so a cap/prefix change cannot
# silently diverge one consumer's twin (the VARIANT_SQL lesson).
FUZZY_BLOCK_CTES = """t AS (
      SELECT doc_id, substring(lower(trim(text)), 1, 40) AS pfx FROM documents
    ),
    b0 AS (
      SELECT doc_id, pfx,
             string_split(pfx, ' ')[1] AS tok1,
             coalesce(string_split(pfx, ' ')[2], '') AS tok2,
             length(pfx) // 8 AS lb
      FROM t
    ),
    sz AS (SELECT tok1, count(*) AS c FROM b0 GROUP BY tok1),
    b AS (
      SELECT doc_id, pfx,
             CASE WHEN sz.c > 500
                  THEN b0.tok1 || ' ' || b0.tok2 || '|' || CAST(b0.lb AS VARCHAR)
                  ELSE b0.tok1 END AS blk
      FROM b0 JOIN sz USING (tok1)
    )"""


@query(
    "join_fuzzy_blocked",
    oracle=f"""
    WITH {FUZZY_BLOCK_CTES}
    SELECT a.doc_id AS doc_a, c.doc_id AS doc_b,
           levenshtein(a.pfx, c.pfx) AS dist
    FROM b a JOIN b c ON a.blk = c.blk AND a.doc_id < c.doc_id
    WHERE levenshtein(a.pfx, c.pfx) <= 8
    """,
    tags=("U6", "J7", "F2"),
)
def join_fuzzy_blocked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocked fuzzy join — the entity-resolution workhorse (record linkage,
    near-dup titles, address matching): edit-distance joins are O(n^2) x
    O(len^2) if run all-pairs, so candidates are generated by BLOCKING on a
    cheap deterministic key and the expensive levenshtein runs only within
    blocks — the same candidates-then-verify shape as the shingle dedups.
    Blocking is HIERARCHICAL: first token alone, but any block holding more
    than 500 members re-blocks by (first two tokens, prefix-length band) —
    measured on the 10x replica (50k docs over 30 first-token keys) the
    refinement cut this join from 111s back to seconds, the guard every
    production blocker ships for stop-word keys. The size census is one
    tiny aggregate broadcast back onto the stream; at sf<=0.1 no block
    crosses the cap, so the refined and plain keys produce identical
    pairs. Both engines implement the standard Levenshtein DP and the
    identical two-level key, so the surviving (doc_a, doc_b, dist) pairs
    hash-match exactly."""
    cap = 500
    d = load_table(spark, sf_dir, "documents")
    t = (
        d.select("doc_id", F.substring(F.lower(F.trim("text")), 1, 40).alias("pfx"))
        .withColumn("tok1", F.split(F.col("pfx"), " ").getItem(0))
        .withColumn(
            "tok2", F.coalesce(F.split(F.col("pfx"), " ").getItem(1), F.lit(""))
        )
        .withColumn("lb", F.expr("length(pfx) div 8"))
    )
    sizes = t.groupBy("tok1").agg(F.count("*").alias("c"))
    refined = F.when(
        F.col("c") > cap,
        F.concat(
            F.col("tok1"),
            F.lit(" "),
            F.col("tok2"),
            F.lit("|"),
            F.col("lb").cast("string"),
        ),
    ).otherwise(F.col("tok1"))
    # the census is |first-token vocab| rows — grows with the corpus, so
    # no forced broadcast; AQE converts when the runtime size allows
    b = t.join(sizes, "tok1").select("doc_id", "pfx", refined.alias("blk"))
    a = b.select(F.col("doc_id").alias("doc_a"), F.col("pfx").alias("pa"), "blk")
    c = b.select(F.col("doc_id").alias("doc_b"), F.col("pfx").alias("pb"), "blk")
    return (
        a.join(c, "blk")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .withColumn("dist", F.levenshtein("pa", "pb"))
        .filter(F.col("dist") <= 8)
        .select("doc_a", "doc_b", "dist")
    )


@query(
    "dedup_paragraphs",
    oracle=r"""
    WITH para AS (
      SELECT doc_id, trim(p) AS p
      FROM documents,
           unnest(string_split_regex(lower(trim(text)), '\.\s+')) AS t(p)
      WHERE trim(p) <> ''
    )
    SELECT md5(p) AS para_hash,
           min(doc_id) AS first_doc,
           count(*) AS n_occurrences,
           count(DISTINCT doc_id) AS n_docs
    FROM para
    GROUP BY 1
    HAVING count(*) > 1
    """,
    tags=("U6", "E3", "F7"),
)
def dedup_paragraphs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sub-document (paragraph-level) exact dedup — the pass that catches
    boilerplate repeated ACROSS documents that whole-document fingerprints
    miss (headers, disclaimers, navigation chrome — the single biggest
    contamination class in web-scale corpora). Documents explode into
    sentence-ish units (split on '. '), each unit hashes, and one
    map-side-combined groupBy on the 32-byte digest finds units appearing
    more than once corpus-wide with first-seen attribution. At 100 TB the
    shuffle carries (digest, doc_id) pairs only — text never moves."""
    d = load_table(spark, sf_dir, "documents")
    para = (
        d.select(
            "doc_id",
            F.explode(F.split(F.lower(F.trim(F.col("text"))), r"\.\s+")).alias("p"),
        )
        .select("doc_id", F.trim("p").alias("p"))
        .filter(F.col("p") != "")
    )
    return (
        para.groupBy(F.md5("p").alias("para_hash"))
        .agg(
            F.min("doc_id").alias("first_doc"),
            F.count("*").alias("n_occurrences"),
            F.countDistinct("doc_id").alias("n_docs"),
        )
        .filter(F.col("n_occurrences") > 1)
    )


_SPAN_W = 8  # span length in tokens (Lee et al. use 50 on web text; the
# synthetic docs average ~54 tokens, so 8 keeps the span/doc ratio comparable)


def span_cov_sql_ctes(src: str, w: int = _SPAN_W) -> str:
    """DuckDB CTE chain computing duplicated-span coverage for a source
    CTE ``src(doc_id, n_tokens, toks)``. Final CTE: ``span_cov(doc_id,
    n_dup_spans, covered)`` — docs with no duplicated span are absent
    (callers coalesce to 0). Twin of :func:`span_coverage`."""
    return f"""sp_sl AS (
      SELECT doc_id,
             [{{'s': i - 1,
                'span': array_to_string(toks[i:i+{w - 1}], ' ')}}
              for i in generate_series(1, len(toks) - {w - 1})] AS spanlist
      FROM {src} WHERE n_tokens >= {w}
    ),
    sp_flat AS (
      SELECT doc_id, CAST(sp.s AS BIGINT) AS s, sp.span AS span
      FROM (SELECT doc_id, unnest(spanlist) AS sp FROM sp_sl)
    ),
    sp_dups AS (SELECT span FROM sp_flat GROUP BY span HAVING count(*) > 1),
    sp_dsp AS (SELECT doc_id, s FROM sp_flat
               WHERE span IN (SELECT span FROM sp_dups)),
    sp_isl AS (
      SELECT doc_id, s,
             max(s + {w}) OVER (
               PARTITION BY doc_id ORDER BY s
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_end
      FROM sp_dsp
    ),
    span_cov AS (
      SELECT doc_id, count(*) AS n_dup_spans,
             sum(greatest(0, (s + {w}) - greatest(s, coalesce(prev_end, 0)))) AS covered
      FROM sp_isl GROUP BY doc_id
    )"""


def span_coverage(
    docs: DataFrame, w: int = _SPAN_W, hash_spans: bool = False
) -> DataFrame:
    """(doc_id, n_tokens, toks) -> (doc_id, n_dup_spans, covered):
    corpus-wide duplicated W-token spans, per-doc interval-union token
    coverage. Spark twin of :func:`span_cov_sql_ctes`; scale notes on
    the registered dedup_span_ngrams query. ``hash_spans`` switches the
    shuffle key from the ~(5*w)-char span string to its xxhash64 — the
    100 TB path (8-byte keys; collision odds ~N^2/2^64, one-sided
    toward over-deletion)."""
    from pyspark.sql import Window as PW

    span_text = lambda i: F.concat_ws(" ", F.slice("toks", (i + 1).cast("int"), w))  # noqa: E731
    span_key = (
        (lambda i: F.xxhash64(span_text(i))) if hash_spans else span_text
    )
    spans = (
        docs.where(F.col("n_tokens") >= w)
        .select(
            "doc_id",
            F.explode(
                F.transform(
                    F.sequence(F.lit(0).cast("long"), F.col("n_tokens") - w),
                    lambda i: F.struct(i.alias("s"), span_key(i).alias("span")),
                )
            ).alias("sp"),
        )
        .select("doc_id", F.col("sp.s").alias("s"), F.col("sp.span").alias("span"))
        # materialize once: the corpus-wide count (partial-agg exchange)
        # and the semi-join probe (plain exchange) cannot share a reused
        # exchange, so without this the explode-every-W-gram stage — the
        # dominant cost — runs twice
        .localCheckpoint(eager=False)
    )
    dup_spans = (
        spans.groupBy("span").agg(F.count("*").alias("c")).where("c > 1").select("span")
    )
    dsp = spans.join(dup_spans, "span", "left_semi").select("doc_id", "s")
    prev = PW.partitionBy("doc_id").orderBy("s").rowsBetween(PW.unboundedPreceding, -1)
    return (
        dsp.withColumn("prev_end", F.max(F.col("s") + w).over(prev))
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_dup_spans"),
            F.sum(
                F.greatest(
                    F.lit(0).cast("long"),
                    (F.col("s") + w)
                    - F.greatest("s", F.coalesce("prev_end", F.lit(0).cast("long"))),
                )
            ).alias("covered"),
        )
    )


@query(
    "dedup_span_ngrams",
    oracle=rf"""
    WITH t AS (SELECT doc_id, {SQL_TOKENS} AS toks FROM documents),
    b AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tokens, toks FROM t),
    {span_cov_sql_ctes('b')},
    cov AS (SELECT doc_id, n_dup_spans, covered FROM span_cov)
    SELECT b.doc_id, b.n_tokens,
           greatest(b.n_tokens - {_SPAN_W - 1}, 0) AS n_spans,
           CAST(coalesce(cov.n_dup_spans, 0) AS BIGINT) AS n_dup_spans,
           CAST(coalesce(cov.covered, 0) AS BIGINT) AS covered_tokens,
           round(CAST(coalesce(cov.covered, 0) AS BIGINT)
                 / greatest(b.n_tokens, 1), 6) AS dup_token_ratio
    FROM b LEFT JOIN cov ON b.doc_id = cov.doc_id
    """,
    tags=("U6", "F7", "W3"),
)
def dedup_span_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact duplicated-SPAN detection (Lee et al. 2021, "Deduplicating
    Training Data Makes Language Models Better"): every W-token sliding
    window is a span; spans occurring more than once corpus-wide are
    duplicates, and each document reports how many of its token positions
    are covered by at least one duplicated span (interval union via a
    running-max window — no position explosion). This is the pass that
    catches partially-copied text that document- and paragraph-level
    dedup both miss.

    Scale: spans shuffle once on the span key for the corpus-wide count
    (map-side partial agg collapses within-partition repeats), then once
    more for the doc_id-partitioned coverage window — both keyed, no
    all-pairs stage. At 100 TB the span key would be xxhash64(span)
    (8 bytes instead of ~50, collision rate ~N²/2⁶⁴ — negligible and
    one-sided toward over-deletion); here spans stay exact strings so the
    DuckDB twin is bit-identical. Interval-union coverage is O(spans) per
    doc, not O(spans × W)."""
    W = _SPAN_W
    base = _span_base(load_table(spark, sf_dir, "documents"))
    return _span_report(base, span_coverage(base, W), W)


def _span_base(d: DataFrame) -> DataFrame:
    """Tokenized (doc_id, toks, n_tokens) base shared by the two span-dedup
    variants — localCheckpointed because span_coverage AND the final left
    join both consume it (tokenize once)."""
    return (
        d.select("doc_id", TOKENS().alias("toks"))
        .select("doc_id", "toks", F.size("toks").cast("long").alias("n_tokens"))
        .localCheckpoint(eager=False)
    )


def _span_report(base: DataFrame, cov: DataFrame, w: int) -> DataFrame:
    """Shared final projection of the two span-dedup variants."""
    return base.join(cov, "doc_id", "left").select(
        "doc_id",
        "n_tokens",
        F.greatest(F.col("n_tokens") - (w - 1), F.lit(0).cast("long")).alias("n_spans"),
        F.coalesce("n_dup_spans", F.lit(0).cast("long")).alias("n_dup_spans"),
        F.coalesce("covered", F.lit(0).cast("long")).alias("covered_tokens"),
        F.round(
            F.coalesce("covered", F.lit(0).cast("long"))
            / F.greatest("n_tokens", F.lit(1).cast("long")),
            6,
        ).alias("dup_token_ratio"),
    )


@query(
    "dedup_span_ngrams_hashed",
    oracle=None,  # bound below to the exact-string twin's SQL
    tags=("U6", "F7", "F8"),
)
def dedup_span_ngrams_hashed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100 TB path dedup_span_ngrams' docstring promises, registered:
    identical semantics with the corpus-wide span shuffle keyed on
    xxhash64(span) — 8 bytes per key instead of a ~40-char string, which
    at web scale is the difference between shuffling the corpus and
    shuffling a fingerprint of it. The oracle is the EXACT-STRING SQL
    twin: on a deterministic corpus the hashed run either reproduces it
    bit-for-bit or a collision merged two distinct spans (odds
    ~N^2/2^64 ≈ 1e-11 here; and a collision only ever OVER-counts
    duplication — the safe failure direction for a dedup gate). The
    green oracle row is therefore also a standing no-collision proof at
    every tested SF."""
    W = _SPAN_W
    base = _span_base(load_table(spark, sf_dir, "documents"))
    return _span_report(base, span_coverage(base, W, hash_spans=True), W)


REGISTRY["dedup_span_ngrams_hashed"].oracle = REGISTRY["dedup_span_ngrams"].oracle


@query(
    "er_resolve_entities",
    oracle=f"""
    WITH RECURSIVE {FUZZY_BLOCK_CTES},
    pairs AS (
      SELECT a.doc_id AS a, c.doc_id AS b
      FROM b a JOIN b c ON a.blk = c.blk AND a.doc_id < c.doc_id
      WHERE levenshtein(a.pfx, c.pfx) <= 8
    ),
    ed AS (SELECT a, b FROM pairs UNION SELECT b, a FROM pairs),
    closure(src, dst) AS (
      SELECT doc_id, doc_id FROM t
      UNION
      SELECT c.src, e.b FROM closure c JOIN ed e ON c.dst = e.a
    ),
    entity AS (SELECT src AS doc_id, min(dst) AS entity_id FROM closure GROUP BY src)
    SELECT entity_id,
           count(*) AS n_members,
           min(doc_id) AS canonical_doc
    FROM entity
    GROUP BY entity_id
    HAVING count(*) > 1
    """,
    tags=("U6", "J7", "W1"),
)
def er_resolve_entities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end entity resolution — the composed record-linkage pipeline:
    hierarchical blocking → within-block levenshtein match (the
    join_fuzzy_blocked stage) → transitive closure via iterative min-label
    propagation (the dedup_connected_components stage) → one canonical
    entity per group with membership counts. Matching is pairwise but
    resolution must be transitive (A~B, B~C ⇒ one entity ABC even when
    A,C don't match directly) — that closure is what this op adds over the
    pair list, and the recursive-CTE oracle checks the fixpoint exactly.
    Per-iteration cost is one edge join + aggregate, lineage truncated per
    round — the same billions-of-edges shape as the dedup clusters."""
    pairs = join_fuzzy_blocked(spark, sf_dir).select("doc_a", "doc_b")
    fwd = pairs.select(F.col("doc_a").alias("a"), F.col("doc_b").alias("b"))
    edges = (
        fwd.unionByName(fwd.select(F.col("b").alias("a"), F.col("a").alias("b")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    d = load_table(spark, sf_dir, "documents").select("doc_id")
    labels = d.select("doc_id", F.col("doc_id").alias("label")).localCheckpoint(
        eager=True
    )
    for _ in range(20):
        nbr = (
            edges.join(labels, edges.a == labels.doc_id)
            .groupBy(F.col("b").alias("doc_id"))
            .agg(F.min("label").alias("nlabel"))
        )
        new = (
            labels.join(nbr, "doc_id", "left")
            .select(
                "doc_id",
                F.least(F.col("label"), F.coalesce("nlabel", "label")).alias("label"),
            )
            .localCheckpoint(eager=True)
        )
        changed = (
            new.alias("n")
            .join(labels.alias("o"), "doc_id")
            .filter(F.col("n.label") != F.col("o.label"))
            .count()
        )
        labels = new
        if changed == 0:
            break
    else:
        # A component with diameter > 20 would exit the loop unconverged and
        # silently return split entities that hash-mismatch the recursive-CTE
        # oracle. Fail loudly instead: min-label propagation halves the
        # frontier per round on these corpora, so hitting the cap means the
        # edge set is pathological, not that more rounds would be wasteful.
        raise RuntimeError(
            f"er_resolve_entities: label propagation did not converge in 20 "
            f"iterations ({changed} labels still changing)"
        )
    return (
        labels.groupBy(F.col("label").alias("entity_id"))
        .agg(
            F.count("*").alias("n_members"),
            F.min("doc_id").alias("canonical_doc"),
        )
        .filter(F.col("n_members") > 1)
    )


# Number of single-row MinHash bands for the cohort candidate gate. Eight
# md5-seeded components: two docs sharing any component become a candidate
# pair. P(caught) = 1 - (1 - J)^8 where J is the pair's Jaccard over the
# deskewed shingle universe — >= 0.996 at J = 0.5, which is where a 0.6-
# containment pair with comparable sizes sits; the miss risk concentrates
# in tiny-inside-huge pairs, the documented recall tradeoff of any LSH gate.
_COHORT_BANDS = 8


def _containment_signatures(sh: DataFrame) -> DataFrame:
    """Per-doc MinHash signatures over the deskewed shingle universe."""
    return sh.groupBy("doc_id").agg(
        *[
            F.min(F.md5(F.concat(F.lit(f"c{s}|"), F.col("shingle")))).alias(f"s{s}")
            for s in range(_COHORT_BANDS)
        ]
    )


def _containment_bands(sigs: DataFrame) -> DataFrame:
    """Explode signatures into (doc_id, band) rows — one per component."""
    return sigs.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.concat(F.lit(f"{s}|"), F.col(f"s{s}"))
                    for s in range(_COHORT_BANDS)
                ]
            )
        ).alias("band"),
    )


def _containment_auto_strategy(
    sh: DataFrame, sigs: DataFrame | None = None, bands: DataFrame | None = None
) -> str:
    """Pick the cheaper candidate regime from two linear probes (see
    _containment_pair_counts "auto"): dfcap's cost is the exact emission
    of its equality join, Σ_shingle c·(c−1); cohort's is its band join's
    emission Σ_band g·(g−1) charged (1 + avg shingles/doc) for the
    verification fan-out. Bounded collects: one row of longs each."""
    if sigs is None:
        sigs = _containment_signatures(sh)
    if bands is None:
        bands = _containment_bands(sigs)
    vol2 = F.sum(F.col("c") * (F.col("c") - F.lit(1)))
    s_probe = (
        sh.groupBy("shingle")
        .agg(F.count("*").alias("c"))
        .agg(vol2.alias("vol"), F.sum("c").alias("rows"))
        .collect()[0]
    )
    b_probe = (
        bands.groupBy("band").agg(F.count("*").alias("c")).agg(vol2.alias("vol")).collect()[0]
    )
    n_docs = sigs.count()
    avg_n = (s_probe["rows"] or 0) / max(n_docs, 1)
    dfcap_cost = (s_probe["vol"] or 0) / 2  # undirected join emits each pair once
    cohort_cost = (b_probe["vol"] or 0) * (1.0 + avg_n)
    return "cohort" if cohort_cost < dfcap_cost else "dfcap"


def _containment_pair_counts(sh: DataFrame, strategy: str = "dfcap") -> DataFrame:
    """Undirected common-shingle counts over the deskewed shingle universe
    ``sh``: one row per unordered pair, ``(lo, hi, n_common, n_lo, n_hi)``
    with lo < hi and n_lo/n_hi the docs' deskewed shingle-set sizes —
    the candidate stage of the containment dedup, with a SELECTABLE
    generation regime (the VERDICT r5 cohort-gate item, resolved by
    measurement):

    * ``"dfcap"`` (default) — rare-shingle equality self-join on the
      UNDIRECTED pair space (doc_a < doc_b). Halves the r5 directed
      join's emission (VERDICT: "directed pairs double the candidate
      space") with a hash-identical final result; doc sizes ride along on
      the shingle rows (one doc_id-side join BEFORE pairing, 1 long wider)
      so no post-join over the huge pair table is ever needed. EXACT.
      Measured at dense sf1: pair stage 14 s vs 41 s directed.
    * ``"cohort"`` — per-doc MinHash signatures (``_COHORT_BANDS``
      single-row md5 bands) gate candidates to docs agreeing on >= 1
      component; ONE verification join then counts common shingles for
      just those pairs, so false positives never survive. Probabilistic
      recall (see _COHORT_BANDS note). Selectable for corpora where the
      operator owner trades recall for skew-bounded candidate groups.
    * ``"auto"`` — two cheap LINEAR probes measure each regime's expected
      candidate volume (dfcap: Σ_shingle c·(c−1)/2 emission; cohort:
      Σ_band g·(g−1) charged (1 + avg shingles/doc) for verification
      fan-out) and pick the smaller. Kept as a diagnostic, NOT the
      default, because measurement settled the question: a pure
      signature-collision-rate rule mispredicts (50k-word-vocab sf1:
      collision 0.2% yet dfcap ran 6× faster — unique shingles make the
      equality join near-empty), and the volume model shows why dfcap
      dominates for EXACT semantics at every density: a pair's
      band-collision probability IS its Jaccard J, so cohort's cost per
      pair is ~8·J·(1+m) ≈ 4(1+J)× dfcap's n_common — and the one regime
      where cohort's volume would win (tiny doc quoted in a huge one,
      J→0) is exactly where LSH recall collapses. Probing two extra
      aggregates per run to confirm a foregone conclusion is not 100 TB
      behavior, hence dfcap by default.
    """
    if strategy == "auto":
        strategy = _containment_auto_strategy(sh)
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n"))
    sh_n = sh.join(sizes, "doc_id")  # (doc_id, shingle, n) — co-keyed join
    a = sh_n.alias("a")
    b = sh_n.alias("b")
    if strategy == "dfcap":
        # SPAN COLLAPSE (VERDICT r6 perf item: the pair table was the
        # remaining scale risk on boilerplate-heavy corpora). Shingles
        # from a templated span shared by a cohort of documents all carry
        # the IDENTICAL posting list, and each one re-emits the same
        # c·(c-1)/2 doc pairs — a 40-shingle template is 40× the needed
        # volume, and the deskew hot-filter only catches cohorts above
        # ~1% of the corpus. Fix, exactness-preserving: group HEAVY
        # shingles (document frequency above an adaptive cap) by an
        # order-independent posting signature — (df, three independently
        # salted sums of 31-bit doc_id hash residues, min, max); residue
        # sums are a deterministic function of the posting multiset, stay
        # under 2^55 even for 10M-doc postings (no ANSI overflow), and
        # two posting sets colliding on all six components is a
        # ~2^-93-grade event —
        # keep ONE representative shingle per distinct posting with
        # weight w = #collapsed shingles, and let the equality join emit
        # each cohort's pairs once, counting w per match. Light shingles
        # (df <= cap) pair directly with w = 1: their total emission is
        # bounded by cap/2 · |shingle stream| — linear by construction.
        # The cap self-tunes to 4× the mean df (floor 64) via a
        # broadcast scalar, so dense small-vocab corpora (mean df ~90 at
        # sf1) leave the collapse machinery nearly idle while template
        # cohorts (df in the hundreds, unique-tail df ~1 ⇒ tiny mean)
        # always engage it. n_common = Σ w over shared posting groups +
        # #shared light shingles — exactly the shared-shingle count.
        # vocab-sized; materialized once — the census subtree feeds both
        # the mean-df scalar and the heavy filter, and without the cut the
        # full shingle-stream aggregation would run once per consumer
        df_tab = (
            sh.groupBy("shingle")
            .agg(F.count("*").alias("df"))
            .localCheckpoint(eager=True)
        )
        cap = F.greatest(F.lit(64), (4 * F.col("mean_df")).cast("bigint"))
        mean_df = df_tab.agg(F.avg("df").alias("mean_df"))
        heavy = (
            df_tab.crossJoin(F.broadcast(mean_df))
            .filter(F.col("df") > cap)
            .select("shingle")
        )
        def hsum(salt: str):
            return F.sum(
                F.pmod(F.xxhash64("doc_id", F.lit(salt)), F.lit(2**31))
            ).alias(salt)

        sig = (
            sh.join(heavy, "shingle", "left_semi")
            .groupBy("shingle")
            .agg(
                F.count("*").alias("pc"),
                hsum("spanA"),
                hsum("spanB"),
                hsum("spanC"),
                F.min("doc_id").alias("mn"),
                F.max("doc_id").alias("mx"),
            )
        )
        reps = (
            sig.groupBy("pc", "spanA", "spanB", "spanC", "mn", "mx")
            .agg(F.min("shingle").alias("shingle"), F.count("*").alias("w"))
            .select("shingle", "w")
        )
        stream = (
            sh_n.join(heavy, "shingle", "left_anti")
            .withColumn("w", F.lit(1).cast("bigint"))
            .unionByName(sh_n.join(reps, "shingle"))
        )
        a = stream.alias("a")
        b = stream.alias("b")
        return (
            a.join(
                b,
                (F.col("a.shingle") == F.col("b.shingle"))
                & (F.col("a.doc_id") < F.col("b.doc_id")),
            )
            .groupBy(F.col("a.doc_id").alias("lo"), F.col("b.doc_id").alias("hi"))
            .agg(
                # both sides of a match carry the same shingle's weight —
                # summing one side counts each posting group once
                F.sum("a.w").alias("n_common"),
                # constant per group — min() just projects it through the agg
                F.min("a.n").alias("n_lo"),
                F.min("b.n").alias("n_hi"),
            )
        )
    if strategy != "cohort":
        raise ValueError(f"unknown containment strategy: {strategy}")
    sigs = _containment_signatures(sh)
    bands = _containment_bands(sigs)
    x = bands.alias("x")
    y = bands.alias("y")
    cand = (
        x.join(
            y,
            (F.col("x.band") == F.col("y.band"))
            & (F.col("x.doc_id") < F.col("y.doc_id")),
        )
        .select(F.col("x.doc_id").alias("lo"), F.col("y.doc_id").alias("hi"))
        .distinct()
    )
    return (
        cand.join(a, F.col("lo") == F.col("a.doc_id"))
        .join(
            b,
            (F.col("hi") == F.col("b.doc_id"))
            & (F.col("a.shingle") == F.col("b.shingle")),
        )
        .groupBy("lo", "hi")
        .agg(
            F.count("*").alias("n_common"),
            F.min("a.n").alias("n_lo"),
            F.min("b.n").alias("n_hi"),
        )
    )


def _containment_directed(pairs: DataFrame, threshold_pml: int = 600) -> DataFrame:
    """Orient undirected pair counts into qualifying (doc_sub, doc_super,
    containment_pml) rows. Both orientations are scored INSIDE one
    projection and filtered before the explode materializes them, so the
    huge pair table is traversed exactly once and only survivors widen."""
    orient = F.array(
        F.struct(
            F.col("lo").alias("doc_sub"),
            F.col("hi").alias("doc_super"),
            F.expr("CAST((n_common * 1000) div n_lo AS BIGINT)").alias(
                "containment_pml"
            ),
        ),
        F.struct(
            F.col("hi").alias("doc_sub"),
            F.col("lo").alias("doc_super"),
            F.expr("CAST((n_common * 1000) div n_hi AS BIGINT)").alias(
                "containment_pml"
            ),
        ),
    )
    kept = F.filter(orient, lambda r: r["containment_pml"] >= F.lit(threshold_pml))
    return (
        pairs.select(F.explode(kept).alias("r"))
        .select("r.doc_sub", "r.doc_super", "r.containment_pml")
    )


def containment_sql_ctes(src: str) -> str:
    """Reusable DuckDB CTE chain computing the directed containment pairs
    (doc_sub, doc_super, containment_pml >= 600) over ``src`` (any
    relation providing doc_id + text) — shared by the standalone query's
    oracle and the corpus-pipeline compositions so the two can never
    drift. Final CTE name: ``containment``. The deskew hot cutoff counts
    SRC docs, matching _deskewed_shingles run on the same subset."""
    return f"""ctoks AS (SELECT doc_id, {SQL_TOKENS} AS toks FROM {src}),
    csh0 AS (SELECT doc_id, unnest(list_distinct({_SHINGLES_SQL})) AS shingle
             FROM ctoks),
    chot AS (SELECT shingle FROM csh0 GROUP BY shingle
             HAVING count(*) > greatest(10, floor(0.01 * (SELECT count(*) FROM {src})))),
    csh AS (SELECT * FROM csh0 WHERE shingle NOT IN (SELECT shingle FROM chot)),
    csizes AS (SELECT doc_id, count(*) AS n FROM csh GROUP BY doc_id),
    cpairs AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
      FROM csh a JOIN csh b ON a.shingle = b.shingle AND a.doc_id <> b.doc_id
      GROUP BY 1, 2
    ),
    containment AS (
      SELECT doc_a AS doc_sub, doc_b AS doc_super,
             CAST((n_common * 1000) // sa.n AS BIGINT) AS containment_pml
      FROM cpairs
      JOIN csizes sa ON sa.doc_id = doc_a
      WHERE (n_common * 1000) // sa.n >= 600
    )"""


@query(
    "dedup_shingle_containment",
    oracle=f"""
    WITH {containment_sql_ctes("documents")}
    SELECT doc_sub, doc_super, containment_pml FROM containment
    """,
    tags=("U6", "J7"),
)
def dedup_shingle_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric containment dedup — |A∩B| / |A| ≥ 0.6 over the same
    deskewed shingle universe as the Jaccard pass. Containment is the
    measure Jaccard misses: a short document quoted whole inside a long
    one has tiny Jaccard (the union is huge) but containment ≈ 1 — the
    quote-inclusion / boilerplate-envelope case every web-scale dedup
    needs a directed pass for (Broder's original resemblance/containment
    pair). Directed output: (doc_sub ⊂ doc_super). Candidate generation is
    strategy-selectable (_containment_pair_counts): the default DF-capped
    rare-shingle join pairs UNDIRECTED (doc_a < doc_b, half the r5
    directed join's emission) with doc sizes riding on the shingle rows,
    and both orientations are thresholded inside one projection before
    exploding (_containment_directed) — so the pair table is built once,
    aggregated once, and never re-joined. The MinHash-cohort gate + exact
    verification join stays selectable, with measurements (BASELINE.md r6)
    showing why it is not the default at any vocabulary density
    (gen_sf.py --vocab generates the large-vocab corpus those measurements
    used). Exact integer per-mille scoring ((n·1000) DIV |A|) so the
    threshold and the emitted score hash-match with no float anywhere."""
    d = load_table(spark, sf_dir, "documents")
    # checkpointed: the span-collapse candidate stage consumes the shingle
    # stream from several subtrees (census, signature, light/heavy split)
    # — without the cut each consumer would re-run the corpus explode
    sh = _deskewed_shingles(d).localCheckpoint(eager=True)
    return _containment_directed(_containment_pair_counts(sh))


@query(
    "txt_url_canonical",
    oracle="""
    WITH raw AS (
      SELECT doc_id,
             'https://' ||
             (CASE WHEN doc_id % 2 = 0 THEN upper(source) ELSE source END) ||
             '.Example.COM:443/docs/' || lang || '/' || CAST(doc_id % 40 AS VARCHAR) ||
             '?utm_source=feed&page=' || CAST(doc_id % 7 AS VARCHAR) || '&ref=x' AS url
      FROM documents
    ),
    canon AS (
      SELECT doc_id,
             lower(regexp_extract(url, '^[a-z]+://([^/:?]+)', 1))
             || regexp_extract(url, '://[^/?]+(/[^?]*)', 1)
             || '?page=' || regexp_extract(url, '[?&]page=([^&]*)', 1) AS canonical_url
      FROM raw
    )
    SELECT doc_id, canonical_url,
           count(*) OVER (PARTITION BY canonical_url) AS n_same_url
    FROM canon
    """,
    tags=("F2", "F8", "U6"),
)
def txt_url_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL canonicalization — the first dedup pass of every web corpus
    (CommonCrawl-style): lowercase the host, strip the default port,
    drop tracking parameters (utm_*/ref), keep semantic ones — so
    mixed-case hosts and tracking-tagged links that are REALLY the same
    page collapse to one canonical key (n_same_url > 1 = the refetch
    set). Spark side uses the built-in parse_url (HOST/PATH/QUERY
    component extraction — JVM, no regex backtracking on the hot path);
    the oracle re-derives every component from first principles with
    regexes, so the two implementations cross-check each other.
    Map-only except the canonical-key window; at 100 TB the dedup
    groupBy on canonical_url replaces that window and the shuffle
    carries only (url_hash, doc_id)."""
    d = load_table(spark, sf_dir, "documents")
    host_raw = F.when(
        F.col("doc_id") % 2 == 0, F.upper(F.col("source"))
    ).otherwise(F.col("source"))
    url = F.concat(
        F.lit("https://"),
        host_raw,
        F.lit(".Example.COM:443/docs/"),
        F.col("lang"),
        F.lit("/"),
        (F.col("doc_id") % 40).cast("string"),
        F.lit("?utm_source=feed&page="),
        (F.col("doc_id") % 7).cast("string"),
        F.lit("&ref=x"),
    )
    with_url = d.select("doc_id", url.alias("url"))
    canonical = F.concat(
        F.lower(F.parse_url("url", F.lit("HOST"))),
        F.parse_url("url", F.lit("PATH")),
        F.lit("?page="),
        F.parse_url("url", F.lit("QUERY"), F.lit("page")),
    )
    from pyspark.sql import Window as W

    canon = with_url.select("doc_id", canonical.alias("canonical_url"))
    win = W.partitionBy("canonical_url")
    return canon.select(
        "doc_id", "canonical_url", F.count("*").over(win).alias("n_same_url")
    )


_BPE_ITERS = 6


def _bpe_oracle_parts(iters: int = _BPE_ITERS):
    """Unrolled-CTE DuckDB twin of tokenizer_train_bpe: each iteration is
    three CTEs (weighted pair counts, argmax merge, re-segmentation), so
    the oracle replays the EXACT training loop rather than spot-checking
    one pass."""
    parts = [
        f"words AS (SELECT tok AS word, count(*) AS freq FROM"
        f" (SELECT unnest({SQL_TOKENS}) AS tok FROM documents) GROUP BY tok)",
        "seg0 AS (SELECT word, freq,"
        " [word[i] for i in generate_series(1, len(word))] AS seg FROM words)",
    ]
    finals = []
    for k in range(1, iters + 1):
        parts.append(f"""pairs{k} AS (
          SELECT s.a AS a, s.b AS b, CAST(sum(freq) AS BIGINT) AS n
          FROM (SELECT freq, unnest([{{'a': seg[i], 'b': seg[i+1]}}
                       for i in generate_series(1, len(seg)-1)]) AS s
                FROM seg{k-1})
          GROUP BY s.a, s.b)""")
        parts.append(
            f"best{k} AS (SELECT a, b, n FROM pairs{k} WHERE a <> b"
            f" ORDER BY n DESC, a, b LIMIT 1)"
        )
        parts.append(f"""seg{k} AS (
          SELECT word, freq,
                 list_filter([CASE WHEN i < len(seg) AND seg[i] = bst.a AND seg[i+1] = bst.b
                                     THEN seg[i] || seg[i+1]
                                   WHEN i > 1 AND seg[i-1] = bst.a AND seg[i] = bst.b
                                     THEN NULL
                                   ELSE seg[i] END
                              for i in generate_series(1, len(seg))],
                             x -> x IS NOT NULL) AS seg
          FROM seg{k-1}, best{k} bst)""")
        finals.append(
            f"SELECT CAST({k} AS BIGINT) AS step, a AS sym_a, b AS sym_b,"
            f" n AS pair_n FROM best{k}"
        )
    return parts, finals


def _bpe_oracle_sql(iters: int = _BPE_ITERS) -> str:
    parts, finals = _bpe_oracle_parts(iters)
    return "WITH " + ",\n".join(parts) + "\n" + "\nUNION ALL\n".join(finals)


_BPE_BATCH_K = 8


def _bpe_train(spark: SparkSession, sf_dir: str):
    """Shared training core: returns (merges list, final segmentation
    DataFrame) — tokenizer_train_bpe reports the merge table,
    tokenizer_apply_bpe aggregates the resulting subword corpus.

    BPE merge TRAINING (Sennrich et al. 2016, public method) — learn
    the first {n} byte-pair merges, not just apply a fixed tokenizer
    (txt_bpe_token_count's job). The classic scale property holds:
    training runs on the WORD-FREQUENCY table (vocabulary-sized, Heaps'
    law), so the corpus only enters through the initial token count.

    MULTI-MERGE ROUNDS (VERDICT r6 item 5 — the sequential 1-argmax-per-
    merge loop paid one driver round-trip + one vocab-table scan per
    merge): each round computes the pair counts ONCE, then accepts a
    greedy PREFIX of the top-K pairs that is provably identical to
    running the classical one-at-a-time loop. The acceptance rule, with
    counts sorted (n DESC, a, b) and self-pairs excluded from selection:
    accept the next pair (a_i, b_i, n_i) iff
      (1) it shares no symbol with an already-accepted pair this round
          (symbol-disjoint merges can't overlap, and a disjoint pair's
          own count is INVARIANT under the earlier merges: merging (a,b)
          only destroys (x,a)/(b,y) adjacencies and only creates
          (x,ab)/(ab,y) ones, none of which is (c,d)); and
      (2) n_i is STRICTLY greater than every earlier-accepted pair's
          new-pair bound max(max_x occ(x,a), max_y occ(b,y)) — any pair
          the earlier merge CREATES has count <= occ(x,a) or occ(b,y)
          (each new (x,ab) adjacency came from an (x,a) one; bounds
          computed BEFORE the self-pair filter, since (a,a) adjacencies
          also seed new pairs), so nothing the earlier merges introduce
          can out-rank n_i; existing pairs never gain count, and a tie
          at n_i that sequential tie-break would prefer either sorts
          earlier in the same prefix or shares a symbol and stops it.
    The first reject ends the round (sequential semantics is a
    contiguous prefix). Result: identical merge table (same counts too —
    invariance gives the exact per-step n), ~len(prefix) fewer jobs and
    vocab scans per round; tests pin the job budget and the table.

    Determinism: integer pair counts with (count DESC, pair lexicographic)
    tie-break; symbol-disjointness means the batched re-segmentation is
    still one branch-free array transform with no sequential dependency
    (greedy-leftmost == match-all, which also lets the SQL twin unroll
    the classical loop exactly). The learned table (step 6 merges
    'm'+'er' — a merge OF a merge) proves the iteration is real, not one
    frequency pass."""
    words = (
        load_table(spark, sf_dir, "documents")
        .select(F.explode(TOKENS()).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("freq"))
    )
    return _bpe_learn(words, _BPE_ITERS)


def _bpe_learn(words: DataFrame, n_merges: int):
    """The merge-learning loop over a (word, freq) frame — separated from
    the corpus load so the batched-vs-sequential equivalence property can
    drive it on arbitrary corpora (tests/test_property.py)."""
    segs = words.select(
        "word",
        "freq",
        F.expr(
            "transform(sequence(1, length(word)), i -> substring(word, i, 1))"
        ).alias("seg"),
    ).localCheckpoint(eager=False)

    merges: list[tuple[int, str, str, int]] = []
    while len(merges) < n_merges:
        pair = F.explode(
            F.expr(
                "CASE WHEN size(seg) >= 2 THEN"
                " transform(sequence(1, size(seg)-1),"
                "   i -> struct(seg[i-1] AS a, seg[i] AS b))"
                " ELSE array() END"
            )
        )
        # ONE job per round: the full pair-count table is bounded by
        # (alphabet + merges-so-far)^2 — a few thousand rows regardless of
        # corpus size (symbols are single chars plus learned merges, never
        # corpus-dependent) — so collecting it whole is an O(1)-in-data
        # driver fetch, and top-K + bounds become plain Python
        cnt = {
            (r["a"], r["b"]): int(r["n"])
            for r in (
                segs.select("freq", pair.alias("p"))
                .select("freq", "p.a", "p.b")
                .groupBy("a", "b")
                .agg(F.sum("freq").alias("n"))
                .collect()
            )
        }
        top = sorted(
            ((n, a, b) for (a, b), n in cnt.items() if a != b),
            key=lambda t: (-t[0], t[1], t[2]),
        )[:_BPE_BATCH_K]
        if not top:
            break
        # new-pair bounds from the UNFILTERED counts (self-pair (a,a)
        # adjacencies also seed created pairs): m_in[s] = max occ(x, s)
        # bounds created (x, ab); m_out[s] = max occ(s, y) bounds (ab, y)
        m_in: dict[str, int] = {}
        m_out: dict[str, int] = {}
        for (a, b), n in cnt.items():
            m_in[b] = max(m_in.get(b, 0), n)
            m_out[a] = max(m_out.get(a, 0), n)
        accepted: list[tuple[str, str, int]] = []
        used: set[str] = set()
        maxbound = 0
        for n, a, b in top:
            if accepted and (({a, b} & used) or n <= maxbound):
                break
            accepted.append((a, b, n))
            used |= {a, b}
            maxbound = max(maxbound, m_in.get(a, 0), m_out.get(b, 0))
            if len(merges) + len(accepted) >= n_merges:
                break
        for a, b, n in accepted:
            merges.append((len(merges) + 1, a, b, n))

        sz = F.size("seg")

        def sym(i):
            return F.element_at("seg", i)

        def any_match(i_first, i_second):
            cond = F.lit(False)
            for a, b, _ in accepted:
                cond = cond | (
                    (sym(i_first) == F.lit(a)) & (sym(i_second) == F.lit(b))
                )
            return cond

        # simultaneous rewrite of every accepted pair: symbol-disjointness
        # makes matches non-overlapping, so one pass is exact
        merged = F.filter(
            F.transform(
                F.sequence(F.lit(1), sz),
                lambda i: F.when(
                    (i < sz) & any_match(i, i + 1),
                    F.concat(sym(i), sym(i + 1)),
                )
                .when(
                    (i > F.lit(1)) & any_match(i - 1, i),
                    F.lit(None).cast("string"),
                )
                .otherwise(sym(i)),
            ),
            lambda x: x.isNotNull(),
        )
        # truncate lineage so the next round's aggregate reads a flat plan
        segs = segs.withColumn("seg", merged).localCheckpoint(eager=False)

    return merges, segs


@query("tokenizer_train_bpe", oracle=_bpe_oracle_sql(), tags=("U2", "A7", "F7"))
def tokenizer_train_bpe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE merge TRAINING (Sennrich et al. 2016, public method) — learn
    the first merges, not just apply a fixed tokenizer
    (txt_bpe_token_count's job): iteratively count adjacent-symbol pairs
    weighted by word frequency, merge the argmax pair corpus-wide,
    repeat (_bpe_train). The classic scale property holds: training runs
    on the WORD-FREQUENCY table (vocabulary-sized, Heaps' law), so the
    corpus only enters through the initial token count; each iteration
    is one map-side-combined pair aggregate + a 1-row driver argmax (the
    same per-iteration scalar every iterative algorithm pays) + a
    map-only array rewrite, lineage truncated per round with
    localCheckpoint.

    Determinism: integer pair counts with (count DESC, pair
    lexicographic) tie-break; self-pairs (a = b) are excluded from
    selection so merge matches can never overlap and greedy-leftmost
    equals match-all — the re-segmentation is one branch-free array
    transform with no sequential dependency (the property that makes the
    rewrite embarrassingly parallel AND lets the SQL twin unroll the
    loop exactly). The learned table (step 6 merges 'm'+'er' — a merge
    OF a merge) proves the iteration is real, not one frequency pass."""
    merges, _ = _bpe_train(spark, sf_dir)
    return spark.createDataFrame(
        merges, "step long, sym_a string, sym_b string, pair_n long"
    )


_BPE_TOP = 20


@query(
    "tokenizer_apply_bpe",
    oracle="WITH "
    + ",\n".join(_bpe_oracle_parts()[0])
    + f"""
    SELECT CAST(row_number() OVER (ORDER BY n DESC, symbol) AS BIGINT) AS rank,
           symbol, n
    FROM (SELECT s AS symbol, CAST(sum(freq) AS BIGINT) AS n
          FROM (SELECT freq, unnest(seg) AS s FROM seg{_BPE_ITERS})
          GROUP BY s)
    QUALIFY rank <= {_BPE_TOP}
    """,
    tags=("U2", "A7", "F7"),
)
def tokenizer_apply_bpe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Apply the learned BPE merges — the train->apply round trip that
    makes the trainer a usable tokenizer component: after _bpe_train's
    final re-segmentation, every word in the (vocabulary-sized,
    frequency-weighted) word table is a sequence of learned subword
    symbols; this reports the top-{_BPE_TOP} subwords by weighted corpus
    occurrences. Multi-character symbols ranking above bare characters
    in the output is the visible proof the merges composed. One
    explode + one map-side-combined aggregate over the vocabulary
    table; the corpus itself was only ever scanned once, for the word
    counts. The oracle replays the full unrolled training loop and then
    the same weighted subword census."""
    _, segs = _bpe_train(spark, sf_dir)
    from pyspark.sql import Window as PW

    counts = (
        segs.select("freq", F.explode("seg").alias("symbol"))
        .groupBy("symbol")
        .agg(F.sum("freq").alias("n"))
    )
    top = counts.orderBy(F.desc("n"), "symbol").limit(_BPE_TOP)
    return top.select(
        F.row_number()
        .over(PW.orderBy(F.desc("n"), "symbol"))
        .cast("long")
        .alias("rank"),
        "symbol",
        "n",
    )


@query(
    "txt_distinct_ngrams",
    oracle=rf"""
    WITH t AS (SELECT lang, {SQL_TOKENS} AS toks FROM documents),
    grams AS (
      SELECT lang, n, g FROM (
        SELECT lang, 1 AS n, unnest(toks) AS g FROM t
        UNION ALL
        SELECT lang, 2, toks[i] || ' ' || toks[i+1]
        FROM t, unnest(range(1, len(toks))) AS u(i)
        UNION ALL
        SELECT lang, 3, toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
        FROM t, unnest(range(1, len(toks) - 1)) AS u(i)
      )
    )
    SELECT lang, n,
           count(*) AS total_ngrams,
           count(DISTINCT g) AS distinct_ngrams,
           (count(DISTINCT g) * 1000000) // count(*) AS distinct_micro
    FROM grams GROUP BY lang, n
    """,
    tags=("U2", "A4", "F7"),
)
def txt_distinct_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus diversity report — distinct-n ratios (distinct n-grams /
    total n-grams, n = 1..3) per language slice: the repetitiveness
    dashboard every LLM-corpus build watches (a collapsing distinct-2
    under dedup or synthetic-data mixing is the canonical early-warning
    signal). N-grams come from the token array by JVM slicing (no
    Python), all three orders union into ONE (lang, n)-keyed
    distinct+count aggregate, and the ratio is integer micro units. At
    100 TB exact count(DISTINCT) per slice is the honest default (one
    shuffle on the gram); the sketch path is agg_hll_sketch_merge's
    machinery when ±2% is acceptable."""
    d = load_table(spark, sf_dir, "documents").select("lang", TOKENS().alias("toks"))

    def gram_structs(n: int):
        if n == 1:
            return F.transform(
                "toks", lambda t: F.struct(F.lit(1).alias("n"), t.alias("g"))
            )
        cnt = F.size("toks") - (n - 1)
        # guard: Spark's sequence(1, 0) counts DOWN ([1, 0]) — a doc
        # shorter than n tokens must yield an empty gram array, not a
        # slice(toks, 0, n) error
        idx = F.when(cnt >= 1, F.sequence(F.lit(1), cnt)).otherwise(
            F.array().cast("array<int>")
        )
        return F.transform(
            idx,
            lambda i: F.struct(
                F.lit(n).alias("n"),
                F.concat_ws(" ", F.slice("toks", i.cast("int"), n)).alias("g"),
            ),
        )

    # all three orders emit from ONE scan/tokenize: concat the per-order
    # struct arrays and explode once (union-of-three re-ran the scan 3x)
    allg = d.select(
        "lang",
        F.explode(
            F.concat(gram_structs(1), gram_structs(2), gram_structs(3))
        ).alias("p"),
    ).select("lang", F.col("p.n").alias("n"), F.col("p.g").alias("g"))
    return allg.groupBy("lang", "n").agg(
        F.count("*").alias("total_ngrams"),
        F.countDistinct("g").alias("distinct_ngrams"),
        F.expr("(count(DISTINCT g) * 1000000L) div count(*)").alias("distinct_micro"),
    )


# ---------------------------------------------------------------------------
# Unigram-LM Viterbi segmentation (the inference half of SentencePiece-style
# tokenization, Kudo 2018) — exact integer DP, both engines.

_VIT_MAXLEN = 12  # DP unroll depth == max word length segmented
_VIT_MAXTOK = 3  # vocab holds 1..3-grams, bounding the DP inner loop
_VIT_TOPG = 10  # top-k 2-grams and 3-grams admitted to the vocab
_VIT_NEG = -(2**62)  # "minus infinity" for missing-subword candidates


def _viterbi_oracle() -> str:
    """Unrolled-DP DuckDB twin: per word, 36 pivoted substring scores
    (position x token length), then 12 arithmetic dp steps — the exact
    integer recurrence the Spark side evaluates column-wise."""
    score_cols = ",\n             ".join(
        f"max(CASE WHEN i = {i} AND L = {L} THEN w END) AS s{i}_{L}"
        for i in range(1, _VIT_MAXLEN + 1)
        for L in range(1, _VIT_MAXTOK + 1)
        if L <= i
    )
    dp_steps = []
    for i in range(1, _VIT_MAXLEN + 1):
        cands = ", ".join(
            f"coalesce(dp{i - L} + s{i}_{L} - 1, CAST({_VIT_NEG} AS BIGINT))"
            for L in range(1, _VIT_MAXTOK + 1)
            if L <= i
        )
        dp_steps.append(
            f"d{i} AS (SELECT *, CAST(greatest({cands}) AS BIGINT) AS dp{i} FROM d{i - 1})"
        )
    dp_pick = ", ".join(
        f"CASE WHEN length(word) = {i} THEN dp{i} END" for i in range(1, _VIT_MAXLEN + 1)
    )
    dp_chain = ",\n    ".join(dp_steps)
    tok_lens = ", ".join(str(L) for L in range(1, _VIT_MAXTOK + 1))
    return f"""
    WITH words AS (
      SELECT t AS word, CAST(count(*) AS BIGINT) AS freq
      FROM (SELECT unnest({SQL_TOKENS}) AS t FROM documents)
      WHERE length(t) <= {_VIT_MAXLEN}
      GROUP BY 1
    ),
    chars AS (
      SELECT substring(word, i, 1) AS g, CAST(sum(freq) AS BIGINT) AS c
      FROM (SELECT word, freq, unnest(generate_series(1, length(word))) AS i
            FROM words)
      GROUP BY 1
    ),
    g2 AS (
      SELECT g, c FROM (
        SELECT substring(word, i, 2) AS g, CAST(sum(freq) AS BIGINT) AS c
        FROM (SELECT word, freq, unnest(generate_series(1, length(word) - 1)) AS i
              FROM words WHERE length(word) >= 2)
        GROUP BY 1
      ) ORDER BY c DESC, g LIMIT {_VIT_TOPG}
    ),
    g3 AS (
      SELECT g, c FROM (
        SELECT substring(word, i, 3) AS g, CAST(sum(freq) AS BIGINT) AS c
        FROM (SELECT word, freq, unnest(generate_series(1, length(word) - 2)) AS i
              FROM words WHERE length(word) >= 3)
        GROUP BY 1
      ) ORDER BY c DESC, g LIMIT {_VIT_TOPG}
    ),
    vocab AS (
      SELECT g, CAST(c * length(g) * length(g) * 64 AS BIGINT) AS w
      FROM (SELECT * FROM chars UNION ALL SELECT * FROM g2 UNION ALL SELECT * FROM g3)
    ),
    subs AS (
      SELECT s.word, s.freq, s.i, s.L, v.w
      FROM (
        SELECT word, freq, i, L, substring(word, i - L + 1, L) AS sub
        FROM (SELECT word, freq, i, unnest([{tok_lens}]) AS L
              FROM (SELECT word, freq,
                           unnest(generate_series(1, length(word))) AS i
                    FROM words))
        WHERE L <= i
      ) s LEFT JOIN vocab v ON v.g = s.sub
    ),
    d0 AS (
      SELECT word, freq, CAST(0 AS BIGINT) AS dp0,
             {score_cols}
      FROM subs GROUP BY word, freq
    ),
    {dp_chain},
    best AS (
      SELECT word, freq, coalesce({dp_pick}) AS dpv FROM d{_VIT_MAXLEN}
    ),
    seg AS (
      SELECT word, freq,
             64 - (dpv % 64) AS n_tokens,
             (dpv + 64 - (dpv % 64)) // 64 AS score
      FROM best
    )
    SELECT n_tokens,
           CAST(count(*) AS BIGINT) AS n_words,
           CAST(sum(freq) AS BIGINT) AS total_freq,
           CAST(sum(score) AS BIGINT) AS sum_score
    FROM seg
    GROUP BY n_tokens
    """


@query(
    "tokenizer_unigram_viterbi",
    oracle=_viterbi_oracle(),
    tags=("U2", "F2", "F7"),
)
def tokenizer_unigram_viterbi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Viterbi subword segmentation — the inference half of unigram-LM
    tokenization (Kudo 2018, SentencePiece; public method), the DP /
    sequence-labeling operator class the rest of the registry lacks.
    Vocabulary: every character plus the top-{k} 2-grams and 3-grams by
    frequency-weighted corpus count (exact integers, (count DESC, gram)
    tie-break); subword score = count · len² · 64 − 1 per emitted token,
    so the single BIGINT dp value encodes (score, −n_tokens) at once —
    the −1-per-token term makes ties resolve toward FEWER tokens
    deterministically, and n_tokens = 64 − dp mod 64 recovers exactly
    (words cap at {n} chars < 64 tokens). Missing-subword candidates
    clamp to −2⁶² in BOTH engines (greatest() NULL semantics differ
    cross-engine, so NULL never reaches it).

    Scale shape: the DP runs COLUMN-WISE over the distinct-WORD table
    (vocabulary-sized, Heaps' law — the corpus enters only through the
    frequency counts), fully unrolled into {n} whole-stage-codegen
    expression steps with a broadcast map lookup per (position, length)
    — no UDF, no explode of per-position rows, no shuffle beyond the
    word/gram aggregates. The vocab fetch is O(alphabet + 2k) rows —
    O(1) in data, same discipline as the BPE trainer."""
    d = load_table(spark, sf_dir, "documents")
    words = (
        d.select(F.explode(TOKENS()).alias("word"))
        .filter(F.length("word") <= _VIT_MAXLEN)
        .groupBy("word")
        .agg(F.count("*").alias("freq"))
        .localCheckpoint(eager=True)  # words feed vocab AND the DP scan
    )

    def gram_counts(L: int):
        return (
            words.filter(F.length("word") >= L)
            .select(
                F.explode(
                    F.expr(
                        f"transform(sequence(1, length(word) - {L - 1}),"
                        f" i -> substring(word, i, {L}))"
                    )
                ).alias("g"),
                "freq",
            )
            .groupBy("g")
            .agg(F.sum("freq").alias("c"))
        )

    vocab: dict[str, int] = {}
    for r in gram_counts(1).collect():  # full alphabet — bounded
        vocab[r["g"]] = int(r["c"])
    for L in range(2, _VIT_MAXTOK + 1):
        # top-k computed DISTRIBUTED with the oracle's exact (c DESC, g)
        # tie-break; the driver fetch is O(k), as the docstring claims
        for r in (
            gram_counts(L).orderBy(F.desc("c"), "g").limit(_VIT_TOPG).collect()
        ):
            vocab[r["g"]] = int(r["c"])
    score_map = F.create_map(
        *[
            x
            for g, c in sorted(vocab.items())
            for x in (F.lit(g), F.lit(c * len(g) * len(g) * 64))
        ]
    )

    # each dp step materializes as a COLUMN: referencing prior steps as
    # columns keeps the plan linear in MAXLEN — inlining the recurrence
    # as nested expressions would expand ~3^12 terms and stall codegen
    seg = words.withColumn("dp0", F.lit(0).cast("bigint"))
    wlen = F.length("word")
    for i in range(1, _VIT_MAXLEN + 1):
        cands = [
            F.coalesce(
                F.col(f"dp{i - L}")
                + F.element_at(score_map, F.substring("word", i - L + 1, L))
                - F.lit(1),
                F.lit(_VIT_NEG).cast("bigint"),
            )
            for L in range(1, _VIT_MAXTOK + 1)
            if L <= i
        ]
        seg = seg.withColumn(
            f"dp{i}", F.greatest(*cands) if len(cands) > 1 else cands[0]
        )
    dpv = F.coalesce(
        *[F.when(wlen == i, F.col(f"dp{i}")) for i in range(1, _VIT_MAXLEN + 1)]
    )
    n_tokens = F.lit(64) - F.pmod(dpv, F.lit(64))
    # shiftright, not float division: exact at any magnitude (dp values
    # are positive BIGINTs; /64 through a double would round past 2^53)
    score = F.shiftright(dpv + n_tokens, 6)
    return (
        seg.select(
            "freq",
            n_tokens.cast("bigint").alias("n_tokens"),
            score.cast("bigint").alias("score"),
        )
        .groupBy("n_tokens")
        .agg(
            F.count("*").alias("n_words"),
            F.sum("freq").alias("total_freq"),
            F.sum("score").alias("sum_score"),
        )
    )


# --- WordPiece-style greedy longest-match apply ---------------------------
_WP_STEPS = 12  # max word length processed; longer words -> [UNK] (cap is
# part of the operator definition so both engines agree; corpus words are
# <= 10 chars, and production WordPiece caps input words the same way —
# BERT's max_input_chars_per_word=100)
_WP_LMAX = 6  # longest candidate piece probed per position


def _wp_mlen_sql(contains: str, sub: str) -> str:
    """Longest-match CASE chain: probe piece lengths _WP_LMAX..1 at pos.
    ``contains`` formats a membership test, ``sub`` a substring read."""
    branches = " ".join(
        f"WHEN pos + {l - 1} <= length(word) AND {contains.format(piece=sub.format(l=l))} THEN {l}"
        for l in range(_WP_LMAX, 0, -1)
    )
    return (
        f"CASE WHEN NOT failed AND pos <= length(word) THEN "
        f"CASE {branches} ELSE 0 END ELSE 0 END"
    )


def _wordpiece_oracle_sql() -> str:
    parts, _ = _bpe_oracle_parts()
    parts = list(parts)
    parts.append(
        f"wp_vocab AS (SELECT list(DISTINCT s) AS V FROM"
        f" (SELECT unnest(seg) AS s FROM seg{_BPE_ITERS}))"
    )
    parts.append(
        "wp0 AS (SELECT word, freq, V, 1 AS pos,"
        " CAST([] AS VARCHAR[]) AS pieces,"
        f" length(word) > {_WP_STEPS} AS failed FROM words, wp_vocab)"
    )
    mlen = _wp_mlen_sql("list_contains(V, {piece})", "substring(word, pos, {l})")
    for k in range(1, _WP_STEPS + 1):
        parts.append(
            f"wpm{k} AS (SELECT word, freq, V, pos, pieces, failed,"
            f" {mlen} AS ml FROM wp{k-1})"
        )
        parts.append(
            f"""wp{k} AS (SELECT word, freq, V,
              CASE WHEN ml > 0 THEN pos + ml ELSE pos END AS pos,
              CASE WHEN ml > 0 THEN list_append(pieces, substring(word, pos, ml))
                   ELSE pieces END AS pieces,
              failed OR (NOT failed AND pos <= length(word) AND ml = 0) AS failed
              FROM wpm{k})"""
        )
    parts.append(
        f"wp_final AS (SELECT freq, CASE WHEN failed THEN ['[UNK]']"
        f" ELSE pieces END AS pieces FROM wp{_WP_STEPS})"
    )
    return (
        "WITH "
        + ",\n".join(parts)
        + f"""
    SELECT CAST(row_number() OVER (ORDER BY n DESC, symbol) AS BIGINT) AS rank,
           symbol, n
    FROM (SELECT s AS symbol, CAST(sum(freq) AS BIGINT) AS n
          FROM (SELECT freq, unnest(pieces) AS s FROM wp_final)
          GROUP BY s)
    QUALIFY rank <= {_BPE_TOP}
    """
    )


@query("tokenizer_wordpiece_apply", oracle=_wordpiece_oracle_sql(), tags=("U2", "F7", "A7"))
def tokenizer_wordpiece_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WordPiece-style GREEDY LONGEST-MATCH tokenization (Wu et al. 2016,
    the BERT tokenizer's apply algorithm) over the vocabulary the BPE
    trainer learned — the third segmentation algorithm in the tokenizer
    family (BPE replays merge order, unigram-Viterbi global-optimizes,
    WordPiece greedily takes the longest vocab piece at each position;
    a word whose first unmatched position has no vocab piece — or longer
    than 12 (_WP_STEPS) chars — becomes ['[UNK]'], whole-word, as in
    BERT).

    Scale: the greedy loop runs over the WORD-FREQUENCY census
    (vocabulary-sized, Heaps' law — the corpus is scanned once for the
    counts), unrolled into 12 branch-free column steps with the
    learned vocab attached ONCE as a broadcast one-row array column —
    NOT inlined as a literal into every membership probe: the probe
    appears 72x (_WP_STEPS * _WP_LMAX) in the unrolled plan, and
    embedding a vocabulary-sized literal at each site made plan
    analysis/codegen super-linear in (steps x lmax x |vocab|); a single
    column reference keeps the expression tree steps-bounded, and the
    vocab never touches the driver at all. Apply is map-only after the
    broadcast: zero extra shuffles; the census + final piece
    aggregation are the only exchanges. The oracle replays BPE training
    unrolled, then the identical 12-step greedy loop."""
    _, segs = _bpe_train(spark, sf_dir)
    vdf = segs.select(F.explode("seg").alias("s")).agg(
        F.array_sort(F.collect_set("s")).alias("V")
    )
    t = (
        segs.select("word", "freq")
        .crossJoin(F.broadcast(vdf))
        .withColumn("pos", F.lit(1))
        .withColumn("pieces", F.expr("cast(array() as array<string>)"))
        .withColumn("failed", F.expr(f"length(word) > {_WP_STEPS}"))
    )
    mlen = _wp_mlen_sql("array_contains(V, {piece})", "substring(word, pos, {l})")
    for k in range(_WP_STEPS):
        t = (
            t.withColumn("ml", F.expr(mlen))
            .withColumn(
                "pieces",
                F.expr(
                    "CASE WHEN ml > 0 THEN"
                    " array_append(pieces, substring(word, pos, ml))"
                    " ELSE pieces END"
                ),
            )
            .withColumn(
                "failed",
                F.expr("failed OR (NOT failed AND pos <= length(word) AND ml = 0)"),
            )
            .withColumn("pos", F.expr("CASE WHEN ml > 0 THEN pos + ml ELSE pos END"))
        )
        if k % 4 == 3:
            # Plan barrier: without it the optimizer (not execution) spins
            # for minutes — constraint/alias bookkeeping over 12 nested
            # CASE-alias layers ABOVE a join goes super-linear (measured:
            # 4-step chunks optimize in <1 s; the uncut 12-step chain did
            # not finish in 240 s on a 31-row census). The checkpoint cuts
            # the logical plan every 4 steps; the materialized slice is the
            # vocabulary-sized census, so the barrier is O(1) in corpus
            # size — same rationale as _bpe_train's per-round checkpoints.
            t = t.localCheckpoint(eager=False)
    final = t.select(
        "freq",
        F.expr("CASE WHEN failed THEN array('[UNK]') ELSE pieces END").alias(
            "pieces"
        ),
    )
    counts = (
        final.select("freq", F.explode("pieces").alias("symbol"))
        .groupBy("symbol")
        .agg(F.sum("freq").alias("n"))
    )
    from pyspark.sql import Window as PW

    top = counts.orderBy(F.desc("n"), "symbol").limit(_BPE_TOP)
    return top.select(
        F.row_number()
        .over(PW.orderBy(F.desc("n"), "symbol"))
        .cast("long")
        .alias("rank"),
        "symbol",
        "n",
    )


# --- RAKE keyword extraction ---------------------------------------------------
_RAKE_TOP = 20


@query(
    "txt_rake_keywords",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id,
             unnest(toks) AS tok,
             unnest(generate_series(1, len(toks))) AS pos
      FROM (SELECT doc_id, {SQL_TOKENS} AS toks FROM documents)
    ),
    flagged AS (
      SELECT doc_id, pos, tok,
             CASE WHEN tok IN ({_SQL_STOP}) THEN 1 ELSE 0 END AS stop,
             CAST(sum(CASE WHEN tok IN ({_SQL_STOP}) THEN 1 ELSE 0 END)
                  OVER (PARTITION BY doc_id ORDER BY pos) AS BIGINT) AS pid
      FROM tok
    ),
    phrases AS (
      SELECT doc_id, pid,
             string_agg(tok, ' ' ORDER BY pos) AS phrase,
             CAST(count(*) AS BIGINT) AS plen
      FROM flagged WHERE stop = 0
      GROUP BY doc_id, pid
    ),
    wordstats AS (
      SELECT w AS tok,
             CAST(count(*) AS BIGINT) AS freq,
             CAST(sum(plen) AS BIGINT) AS degree
      FROM (SELECT unnest(string_split(phrase, ' ')) AS w, plen FROM phrases)
      GROUP BY w
    ),
    wscore AS (
      SELECT tok,
             CAST(CAST(degree AS HUGEINT) * 1000000 // freq AS BIGINT)
               AS score
      FROM wordstats
    ),
    dphrase AS (
      SELECT phrase, CAST(count(*) AS BIGINT) AS n_occurrences
      FROM phrases GROUP BY phrase
    ),
    pscore AS (
      SELECT d.phrase, d.n_occurrences,
             CAST(sum(ws.score) AS BIGINT) AS score_scaled
      FROM (SELECT phrase, n_occurrences,
                   unnest(string_split(phrase, ' ')) AS w
            FROM dphrase) d
      JOIN wscore ws ON ws.tok = d.w
      GROUP BY d.phrase, d.n_occurrences
    )
    SELECT CAST(row_number() OVER (ORDER BY score_scaled DESC, phrase) AS BIGINT)
             AS rank,
           phrase, n_occurrences, score_scaled
    FROM pscore
    QUALIFY rank <= {_RAKE_TOP}
    """,
    tags=("U2", "F7", "W3", "A1"),
)
def txt_rake_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAKE keyword extraction (Rose et al. 2010, the standard
    unsupervised keyword baseline): candidate phrases are maximal runs
    of non-stopword tokens (the stopword-count running sum is the
    gaps-and-islands key), each word scores degree/freq (degree = sum
    of the lengths of every phrase the word occurs in — co-occurrence
    weight), and a phrase scores the sum of its member word scores.
    Corpus-level: word statistics aggregate over ALL phrase
    occurrences, distinct phrases then rank by score.

    Determinism: word scores are exact 10^6-scaled integer
    floor-divisions (HUGEINT/decimal-lifted — degree*10^6 passes 2^63
    at corpus scale), phrase scores exact integer sums, ranking
    tie-broken by phrase text. Scale: two shuffles over token-ish
    volume (the per-doc phrase grouping and the word aggregate), then
    everything runs on vocabulary/phrase-bounded tables; the
    phrase-word scoring join broadcasts the vocabulary-bounded word
    table."""
    d = load_table(spark, sf_dir, "documents")
    tok = d.select(
        "doc_id", F.posexplode(TOKENS()).alias("pos", "tok")
    )
    stop = F.col("tok").isin(*STOPWORDS)
    flagged = tok.withColumn(
        "pid",
        F.sum(stop.cast("int"))
        .over(W.partitionBy("doc_id").orderBy("pos"))
        .cast("long"),
    ).withColumn("stop", stop)
    phrases = (
        flagged.filter(~F.col("stop"))
        .groupBy("doc_id", "pid")
        .agg(
            F.concat_ws(
                " ", F.transform(F.array_sort(F.collect_list(F.struct("pos", "tok"))), lambda s: s["tok"])
            ).alias("phrase"),
            F.count("*").cast("long").alias("plen"),
        )
        .localCheckpoint(eager=False)  # word stats + distinct phrases
    )
    wscore = (
        phrases.select(F.explode(F.split("phrase", " ")).alias("tok"), "plen")
        .groupBy("tok")
        .agg(
            F.count("*").cast("long").alias("freq"),
            F.sum("plen").cast("long").alias("degree"),
        )
        .select(
            "tok",
            F.expr(
                "CAST(CAST(degree AS DECIMAL(38,0)) * 1000000 div freq AS BIGINT)"
            ).alias("score"),
        )
    )
    dphrase = phrases.groupBy("phrase").agg(
        F.count("*").cast("long").alias("n_occurrences")
    )
    pscore = (
        dphrase.select(
            "phrase", "n_occurrences", F.explode(F.split("phrase", " ")).alias("w")
        )
        .join(F.broadcast(wscore), F.col("w") == F.col("tok"))
        .groupBy("phrase", "n_occurrences")
        .agg(F.sum("score").cast("long").alias("score_scaled"))
    )
    top = pscore.orderBy(F.desc("score_scaled"), "phrase").limit(_RAKE_TOP)
    return top.select(
        F.row_number()
        .over(W.orderBy(F.desc("score_scaled"), "phrase"))
        .cast("long")
        .alias("rank"),
        "phrase",
        "n_occurrences",
        "score_scaled",
    )


@query(
    "lm_good_turing_counts",
    oracle=f"""
    WITH toks AS (
      SELECT unnest({SQL_TOKENS}) AS w FROM documents),
    wc AS (SELECT w, count(*) AS r FROM toks GROUP BY w),
    noc AS (SELECT r, count(*) AS n_r FROM wc GROUP BY r),
    tot AS (SELECT sum(r * n_r) AS n_tokens, sum(n_r) AS vocab FROM noc),
    adj AS (
      SELECT a.r, a.n_r,
             b.n_r AS n_r_next,
             CASE WHEN b.n_r IS NOT NULL
                  THEN (a.r + 1) * b.n_r * 1000000 // a.n_r
                  ELSE a.r * 1000000 END AS r_star_ppm
      FROM noc a LEFT JOIN noc b ON b.r = a.r + 1
      WHERE a.r IN (SELECT r FROM noc ORDER BY r LIMIT 10))
    SELECT adj.r, adj.n_r, adj.r_star_ppm,
           CAST(t.n_tokens AS BIGINT) AS n_tokens,
           (SELECT n_r FROM noc WHERE r = 1) * 1000000
             // CAST(t.n_tokens AS BIGINT) AS p0_ppm
    FROM adj, tot t
    """,
    tags=("U2", "A1", "J6"),
)
def lm_good_turing_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Good-Turing frequency re-estimation — the count-of-counts smoother
    under classical LM probability mass assignment: words seen r times
    behave as if seen r* = (r+1)·N_{r+1}/N_r times, and the probability
    mass reserved for UNSEEN words is N_1/N (Turing's estimate, the
    quantity Kneser-Ney's absolute discount approximates). Emitted per
    observed count r <= 10 (the regime where the estimate matters; the
    adjusted count falls back to r when N_{r+1} = 0, the point the
    'Simple Good-Turing' regression exists to fix) as exact
    floor-scaled ppm — no float in the hash.

    Emitted for the 10 SMALLEST observed counts rather than a fixed
    r <= 10: on a web-scale (sparse, Zipf) vocabulary those are
    literally r = 1..10 and the estimator is live; on the dense
    committed-testdata vocabulary (31 words, every r in the thousands
    and unique) each N_{r+1} is absent and every row reports the
    fallback — degenerate but well-defined in both regimes.

    Scale: two stacked count aggregations — words (vocab-bounded), then
    counts-of-counts (bounded by max frequency, in practice < 1000
    rows) — so everything after the first groupBy moves a table whose
    size is independent of the corpus; the self-join on r+1 is over
    that tiny table. Same shuffle shape at 1 GB and 100 TB."""
    docs = load_table(spark, sf_dir, "documents")
    wc = (
        docs.select(F.explode(TOKENS()).alias("w"))
        .groupBy("w")
        .agg(F.count("*").alias("r"))
    )
    noc = wc.groupBy("r").agg(F.count("*").alias("n_r")).localCheckpoint(eager=False)
    tot = noc.agg(
        F.sum(F.col("r") * F.col("n_r")).cast("long").alias("n_tokens"),
        F.max(F.when(F.col("r") == 1, F.col("n_r"))).alias("n1"),
    )
    nxt = noc.select((F.col("r") - 1).alias("r"), F.col("n_r").alias("n_r_next"))
    low10 = noc.orderBy("r").limit(10).select("r")
    adj = (
        noc.join(F.broadcast(low10), "r", "semi")
        .join(nxt, "r", "left")
        .select(
            "r",
            "n_r",
            F.when(
                F.col("n_r_next").isNotNull(),
                F.expr("(r + 1) * n_r_next * 1000000 div n_r"),
            )
            .otherwise(F.col("r") * 1000000)
            .cast("long")
            .alias("r_star_ppm"),
        )
    )
    return adj.crossJoin(F.broadcast(tot)).select(
        "r",
        "n_r",
        "r_star_ppm",
        "n_tokens",
        F.expr("n1 * 1000000 div n_tokens").alias("p0_ppm"),
    )


@query(
    "txt_heaps_law",
    oracle=f"""
    WITH docs AS (
      SELECT doc_id, len({SQL_TOKENS}) AS nt, {SQL_TOKENS} AS toks
      FROM documents),
    ranked AS (
      SELECT doc_id, nt,
             row_number() OVER (ORDER BY doc_id) AS rk,
             sum(nt) OVER (ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_nt
      FROM docs),
    firsts AS (
      SELECT min(r.rk) AS first_rk
      FROM (SELECT doc_id, unnest(toks) AS tok FROM docs) e
      JOIN ranked r ON r.doc_id = e.doc_id
      GROUP BY e.tok),
    tot AS (SELECT max(rk) AS n_docs FROM ranked),
    pts AS (
      SELECT k.k AS k,
             max(t.n_docs * k.k // 8) AS n_docs_k,
             max((SELECT max(cum_nt) FROM ranked r2
                  WHERE r2.rk <= t.n_docs * k.k // 8)) AS t_k,
             CAST(count(*) FILTER (
               WHERE f.first_rk <= t.n_docs * k.k // 8) AS BIGINT) AS v_k
      FROM firsts f CROSS JOIN tot t
      JOIN unnest(generate_series(1, 8)) AS k(k) ON true
      GROUP BY k.k),
    lns AS (
      -- ln guards: a tiny corpus (< 8 docs) makes early checkpoints
      -- empty (v_k = 0, t_k NULL) and ln(0) = -inf would poison the cast
      SELECT k, n_docs_k, coalesce(CAST(t_k AS BIGINT), 0) AS tokens_k, v_k,
             CASE WHEN v_k >= 1 THEN CAST(floor(
               ln(CAST(v_k AS DOUBLE)) * 1000000000 + 0.5) AS BIGINT)
               ELSE 0 END AS lnv_nano,
             CASE WHEN coalesce(t_k, 0) >= 1 THEN CAST(floor(
               ln(CAST(t_k AS DOUBLE)) * 1000000000 + 0.5) AS BIGINT)
               ELSE 0 END AS lnt_nano
      FROM pts)
    SELECT CAST(k AS BIGINT) AS k, CAST(n_docs_k AS BIGINT) AS n_docs_k,
           tokens_k, v_k, lnv_nano, lnt_nano,
           CASE WHEN lnt_nano <= 0 THEN 0
                ELSE CAST(CAST(lnv_nano AS HUGEINT) * 1000000 // lnt_nano
                     AS BIGINT) END AS beta_ppm
    FROM lns
    """,
    tags=("U2", "A4", "W3", "F7"),
)
def txt_heaps_law(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heaps'-law vocabulary-growth curve (Heaps 1978): how the distinct
    vocabulary V grows with corpus size T — V = K*T^beta, the sublinear
    law every tokenizer-budget and dedup-capacity plan leans on. The
    corpus is consumed in doc_id order; at each of 8 equal-depth
    document checkpoints the query reports the exact token count T_k,
    the exact vocabulary V_k (tokens whose FIRST occurrence falls at or
    before the checkpoint), and the empirical exponent beta =
    ln(V)/ln(T) as an exact scaled ratio of nano-quantized logs (the
    repo's ln discipline).

    Scale: two corpus scans — one narrow (doc_id, token-count) ranking
    pass through the distributed two-pass prefix shape
    (registry.global_prefix), one explode -> min-per-token pass whose
    shuffle is vocabulary-bounded (first_rk via a doc-keyed join against
    the ranked table, then ONE conditional aggregate evaluates all 8
    checkpoints — no per-checkpoint rescan). Nothing ever sorts raw
    token positions globally."""
    from .registry import global_prefix

    d = load_table(spark, sf_dir, "documents")
    docs = d.select("doc_id", TOKENS().alias("toks")).withColumn(
        "nt", F.size("toks")
    )
    ranked = global_prefix(
        docs.select("doc_id", "nt"), [F.col("doc_id")], [("nt", F.col("nt"))]
    ).select("doc_id", "rk", "cum_nt")
    firsts = (
        docs.select("doc_id", F.explode("toks").alias("tok"))
        .join(ranked.select("doc_id", "rk"), "doc_id")
        .groupBy("tok")
        .agg(F.min("rk").alias("first_rk"))
    )
    tot = ranked.agg(F.max("rk").alias("n_docs"))
    vk = firsts.crossJoin(F.broadcast(tot)).agg(
        *[
            F.sum(
                F.expr(f"CASE WHEN first_rk <= n_docs * {k} div 8 THEN 1 ELSE 0 END")
            )
            .cast("long")
            .alias(f"v{k}")
            for k in range(1, 9)
        ],
        F.max("n_docs").alias("n_docs"),
    )
    tk = ranked.crossJoin(F.broadcast(tot)).agg(
        *[
            F.max(
                F.expr(f"CASE WHEN rk <= n_docs * {k} div 8 THEN cum_nt END")
            ).alias(f"t{k}")
            for k in range(1, 9)
        ]
    )
    wide = vk.crossJoin(tk)
    pts = wide.select(
        F.expr(
            "posexplode(arrays_zip("
        + "array(" + ", ".join(f"v{k}" for k in range(1, 9)) + "), "
        + "array(" + ", ".join(f"CAST(t{k} AS BIGINT)" for k in range(1, 9)) + ")"
        + "))"
        ),
        "n_docs",
    ).select(
        (F.col("pos") + 1).cast("long").alias("k"),
        F.expr("CAST(n_docs * (pos + 1) div 8 AS BIGINT)").alias("n_docs_k"),
        F.col("col.1").alias("tokens_k"),
        F.col("col.0").alias("v_k"),
    )
    return pts.select(
        "k",
        "n_docs_k",
        F.expr("coalesce(tokens_k, 0L)").alias("tokens_k"),
        "v_k",
        # ln guards: a tiny corpus (< 8 docs) makes early checkpoints
        # empty (v_k = 0, tokens_k NULL) and ln(0) = -inf poisons the cast
        F.expr(
            "CASE WHEN v_k >= 1 THEN CAST(floor("
            "ln(CAST(v_k AS DOUBLE)) * 1000000000 + 0.5) AS BIGINT)"
            " ELSE 0 END"
        ).alias("lnv_nano"),
        F.expr(
            "CASE WHEN coalesce(tokens_k, 0) >= 1 THEN CAST(floor("
            "ln(CAST(tokens_k AS DOUBLE)) * 1000000000 + 0.5) AS BIGINT)"
            " ELSE 0 END"
        ).alias("lnt_nano"),
    ).withColumn(
        "beta_ppm",
        F.expr(
            "CASE WHEN lnt_nano <= 0 THEN 0"
            " ELSE CAST(CAST(lnv_nano AS DECIMAL(38,0)) * 1000000 div lnt_nano"
            " AS BIGINT) END"
        ),
    )


@query(
    "tokenizer_fertility",
    oracle="WITH "
    + ",\n".join(_bpe_oracle_parts()[0])
    + f""",
    lw AS (
      SELECT lang, tok AS word, CAST(count(*) AS HUGEINT) AS freq_l
      FROM (SELECT lang, unnest({SQL_TOKENS}) AS tok FROM documents)
      GROUP BY 1, 2),
    j AS (
      SELECT l.lang, l.freq_l, CAST(len(s.seg) AS HUGEINT) AS n_sub
      FROM lw l JOIN seg{_BPE_ITERS} s USING (word))
    SELECT lang,
           CAST(sum(freq_l) AS BIGINT) AS n_words,
           CAST(sum(freq_l * n_sub) AS BIGINT) AS n_subtokens,
           CAST(sum(freq_l * n_sub) * 1000000 // sum(freq_l) AS BIGINT)
             AS fertility_ppm,
           CAST((sum(freq_l * n_sub) - sum(freq_l)) * 1000000
                // sum(freq_l * n_sub) AS BIGINT) AS continuation_ppm
    FROM j GROUP BY lang
    """,
    tags=("U2", "A7", "J1"),
)
def tokenizer_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer fertility per language — the multilingual-equity metric
    (Conneau et al. 2020 §A; Rust et al. 2021): how many learned-BPE
    subwords the tokenizer spends per whitespace word of each language.
    High fertility for a language means its documents consume more of
    the sequence budget per unit of content — the quantified 'tokenizer
    tax' that drives vocabulary-size and data-mixing decisions.
    continuation_ppm = share of subword tokens that are non-word-initial
    (the other standard framing of the same budget cost). Uses the SAME
    trained segmentation as tokenizer_train_bpe/apply_bpe (shared
    _bpe_train core), so the metric grades the tokenizer that ships.

    Scale: the corpus enters only through the (lang, word) frequency
    table (vocabulary-bounded per lang, Heaps' law); the segmentation
    join broadcasts the vocabulary-sized word table; fertility is one
    map-side-combined aggregate of exact integers (HUGEINT/decimal
    lifted — freq*len products pass 2^63 at corpus scale)."""
    _, segs = _bpe_train(spark, sf_dir)
    d = load_table(spark, sf_dir, "documents")
    lw = (
        d.select("lang", F.explode(TOKENS()).alias("word"))
        .groupBy("lang", "word")
        .agg(F.count("*").cast("decimal(38,0)").alias("freq_l"))
    )
    j = lw.join(
        F.broadcast(
            segs.select("word", F.size("seg").cast("decimal(38,0)").alias("n_sub"))
        ),
        "word",
    )
    return j.groupBy("lang").agg(
        F.sum("freq_l").cast("long").alias("n_words"),
        F.sum(F.expr("freq_l * n_sub")).cast("long").alias("n_subtokens"),
        F.expr(
            "CAST(sum(freq_l * n_sub) * 1000000 div sum(freq_l) AS BIGINT)"
        ).alias("fertility_ppm"),
        F.expr(
            "CAST((sum(freq_l * n_sub) - sum(freq_l)) * 1000000"
            " div sum(freq_l * n_sub) AS BIGINT)"
        ).alias("continuation_ppm"),
    )


@query(
    "dedup_lsh_precision_audit",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, unnest(list_distinct({SQL_TOKENS})) AS tok FROM documents),
    sig AS (SELECT doc_id, {_SIG_SQL} FROM tok GROUP BY doc_id),
    band AS (SELECT doc_id, {MINHASH_BAND_SQL} AS k FROM sig),
    canon AS (SELECT k, min(doc_id) AS cd FROM band GROUP BY k),
    cand AS (
      SELECT c.cd AS da, b.doc_id AS db
      FROM band b JOIN canon c USING (k)
      WHERE b.doc_id <> c.cd),
    nd AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n FROM tok GROUP BY 1),
    inter AS (
      SELECT c.da, c.db, CAST(count(*) AS BIGINT) AS ni
      FROM cand c
      JOIN tok ta ON ta.doc_id = c.da
      JOIN tok tb ON tb.doc_id = c.db AND tb.tok = ta.tok
      GROUP BY 1, 2),
    j AS (
      SELECT CAST(i.ni * 1000000 // (na.n + nb.n - i.ni) AS BIGINT) AS jac
      FROM inter i
      JOIN nd na ON na.doc_id = i.da
      JOIN nd nb ON nb.doc_id = i.db),
    tot AS (SELECT CAST(count(*) AS HUGEINT) AS n_cand FROM j)
    SELECT CAST(least(jac // 100000, 9) AS BIGINT) AS decile,
           CAST(count(*) AS BIGINT) AS n_pairs,
           min(jac) AS min_jaccard_ppm,
           max(jac) AS max_jaccard_ppm,
           CAST(CAST(count(*) AS HUGEINT) * 1000000 // max(t.n_cand) AS BIGINT)
             AS share_ppm
    FROM j CROSS JOIN tot t
    GROUP BY 1
    """,
    tags=("U6", "A1", "J7"),
)
def dedup_lsh_precision_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Precision audit of the MinHash-LSH dedup — the governance query a
    pipeline runs before it deletes data: for every COLLAPSE the
    shipping dedup would perform (dedup_minhash_groups keeps the
    min-doc_id canonical per full-signature band; every other member is
    dropped in its favor), compute the EXACT Jaccard between the dropped
    member and its canonical, and report the 10-bucket quality
    histogram. Heavy low-decile mass = the banding deletes documents
    that are NOT near-dups of what they collapse into; precision at any
    threshold is the suffix sum of share_ppm. Uses the SAME signature /
    band expressions as the shipping dedup, so the audit grades exactly
    the production decision set.

    Scale — the audit is LINEAR BY CONSTRUCTION: auditing (member,
    canonical) pairs instead of all intra-bucket pairs costs sum(sz-1)
    rows (one per dropped doc — exactly the rows the dedup deletes),
    where all-pairs is sum(sz^2)/2 and measured DEGENERATE on this
    corpus (the dense synthetic vocab collapses bands: at sf1 the 4-sig
    band has a 23k-doc bucket = 281M intra-bucket pairs, while the
    collapse set is just ~60k pairs). Band-mates share their min-hash
    token, so the inner intersection join loses no pair. Output is 10
    rows."""
    sig = dedup_minhash_signatures(spark, sf_dir)
    band = sig.select("doc_id", minhash_band_col().alias("k"))
    canon = band.groupBy("k").agg(F.min("doc_id").alias("cd"))
    cand = (
        band.join(canon, "k")
        .where(F.col("doc_id") != F.col("cd"))
        .select(F.col("cd").alias("da"), F.col("doc_id").alias("db"))
        .localCheckpoint(eager=False)
    )
    d = load_table(spark, sf_dir, "documents")
    tok = d.select(
        "doc_id", F.explode(F.array_distinct(TOKENS())).alias("tok")
    )
    nd = tok.groupBy("doc_id").agg(F.count("*").cast("long").alias("n"))
    ta = tok.select(F.col("doc_id").alias("da"), "tok")
    tb = tok.select(F.col("doc_id").alias("db_t"), F.col("tok").alias("tok_b"))
    inter = (
        cand.join(ta, "da")
        .join(
            tb,
            (F.col("db") == F.col("db_t")) & (F.col("tok") == F.col("tok_b")),
        )
        .groupBy("da", "db")
        .agg(F.count("*").cast("long").alias("ni"))
    )
    j = (
        inter.join(nd.withColumnRenamed("doc_id", "da").withColumnRenamed("n", "na"), "da")
        .join(nd.withColumnRenamed("doc_id", "db").withColumnRenamed("n", "nb"), "db")
        .select(
            F.expr("CAST(ni * 1000000 div (na + nb - ni) AS BIGINT)").alias("jac")
        )
        .localCheckpoint(eager=False)
    )
    tot = j.agg(F.count("*").cast("decimal(38,0)").alias("n_cand"))
    return (
        j.crossJoin(F.broadcast(tot))
        .groupBy(F.expr("least(jac div 100000, 9)").cast("long").alias("decile"))
        .agg(
            F.count("*").cast("long").alias("n_pairs"),
            F.min("jac").alias("min_jaccard_ppm"),
            F.max("jac").alias("max_jaccard_ppm"),
            F.expr(
                "CAST(CAST(count(*) AS DECIMAL(38,0)) * 1000000"
                " div max(n_cand) AS BIGINT)"
            ).alias("share_ppm"),
        )
    )


@query(
    "corpus_dedup_impact",
    oracle=f"""
    WITH base AS (
      SELECT doc_id, source, md5(text) AS ek,
             CAST(len({SQL_TOKENS}) AS BIGINT) AS nt, text
      FROM documents),
    exact_keep AS (
      SELECT b.* FROM base b
      JOIN (SELECT ek, min(doc_id) AS keep FROM base GROUP BY ek) k
        ON b.ek = k.ek AND b.doc_id = k.keep),
    sig AS (
      SELECT doc_id, {_SIG_SQL}
      FROM (SELECT doc_id, unnest(list_distinct({SQL_TOKENS})) AS tok
            FROM exact_keep) GROUP BY doc_id),
    banded AS (
      SELECT e.doc_id, e.source, e.nt, s.{MINHASH_BAND_SQL.replace(" || ", " || s.")} AS bk
      FROM exact_keep e LEFT JOIN sig s USING (doc_id)),
    near_keep AS (
      SELECT b.* FROM banded b
      LEFT JOIN (SELECT bk, min(doc_id) AS keep FROM banded
                 WHERE bk IS NOT NULL GROUP BY bk) k ON b.bk = k.bk
      WHERE b.bk IS NULL OR b.doc_id = k.keep)
    SELECT b.source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(b.nt) AS BIGINT) AS n_tokens,
           CAST(count(*) FILTER (WHERE e.doc_id IS NOT NULL) AS BIGINT)
             AS exact_docs,
           CAST(coalesce(sum(b.nt) FILTER (WHERE e.doc_id IS NOT NULL), 0)
                AS BIGINT) AS exact_tokens,
           CAST(count(*) FILTER (WHERE n.doc_id IS NOT NULL) AS BIGINT)
             AS near_docs,
           CAST(coalesce(sum(b.nt) FILTER (WHERE n.doc_id IS NOT NULL), 0)
                AS BIGINT) AS near_tokens
    FROM base b
    LEFT JOIN exact_keep e ON e.doc_id = b.doc_id
    LEFT JOIN near_keep n ON n.doc_id = b.doc_id
    GROUP BY b.source
    """,
    tags=("U6", "A1", "E3", "A7"),
)
def corpus_dedup_impact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dedup-impact report every corpus release ships: per source,
    documents and tokens at three pipeline stages — raw, after EXACT
    dedup (md5(text) identity, min-doc_id survivor), and after MinHash-
    LSH NEAR dedup applied to the exact survivors (the standard order:
    exact first, it is free; near-dedup on the survivors halves its
    candidate volume). Zero-token documents carry no signature and pass
    near-dedup as singletons (same semantics as the signature stage).
    Uses the SAME signature/band expressions as the shipping dedup, so
    the report describes exactly what the pipeline would delete.

    Scale: exact stage is one md5 groupBy; signatures are map-only over
    the survivors; the band stage shuffles k x 32-char keys; the final
    per-source rollup joins doc-keyed survivor flags back — three
    keyed hash joins, no pairwise anything (LSH's whole point)."""
    d = load_table(spark, sf_dir, "documents")
    base = d.select(
        "doc_id",
        "source",
        F.md5("text").alias("ek"),
        F.size(TOKENS()).cast("long").alias("nt"),
        "text",
    ).localCheckpoint(eager=False)
    ek_min = base.groupBy("ek").agg(F.min("doc_id").alias("keep"))
    exact_keep = (
        base.join(ek_min, "ek")
        .where(F.col("doc_id") == F.col("keep"))
        .select("doc_id", "source", "nt", "text")
        .localCheckpoint(eager=False)
    )
    sig = exact_keep.select("doc_id", *minhash_sig_cols()).filter(
        F.col("sig0").isNotNull()
    )
    banded = exact_keep.join(
        sig.select("doc_id", minhash_band_col().alias("bk")), "doc_id", "left"
    )
    bk_min = (
        banded.where(F.col("bk").isNotNull())
        .groupBy("bk")
        .agg(F.min("doc_id").alias("keep"))
    )
    near_keep = (
        banded.join(bk_min, "bk", "left")
        .where(F.col("bk").isNull() | (F.col("doc_id") == F.col("keep")))
        .select("doc_id")
    )
    flags = (
        base.select("doc_id", "source", "nt")
        .join(
            exact_keep.select("doc_id", F.lit(1).alias("is_exact")), "doc_id", "left"
        )
        .join(near_keep.withColumn("is_near", F.lit(1)), "doc_id", "left")
    )
    return flags.groupBy("source").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("nt").cast("long").alias("n_tokens"),
        F.count("is_exact").cast("long").alias("exact_docs"),
        F.coalesce(F.sum(F.expr("CASE WHEN is_exact = 1 THEN nt END")), F.lit(0))
        .cast("long")
        .alias("exact_tokens"),
        F.count("is_near").cast("long").alias("near_docs"),
        F.coalesce(F.sum(F.expr("CASE WHEN is_near = 1 THEN nt END")), F.lit(0))
        .cast("long")
        .alias("near_tokens"),
    )


_XSRC_TOP = 30


@query(
    "corpus_cross_source_overlap",
    oracle=f"""
    WITH g AS (
      SELECT DISTINCT source,
             toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] AS gram
      FROM (SELECT source, {SQL_TOKENS} AS toks FROM documents),
           unnest(generate_series(1, len(toks) - 2)) AS u(i)),
    sz AS (SELECT source, CAST(count(*) AS BIGINT) AS n FROM g GROUP BY 1),
    shared AS (
      SELECT a.source AS src_a, b.source AS src_b,
             CAST(count(*) AS BIGINT) AS n_shared
      FROM g a JOIN g b ON a.gram = b.gram AND a.source < b.source
      GROUP BY 1, 2),
    scored AS (
      SELECT s.src_a, s.src_b, s.n_shared,
             za.n AS n_a, zb.n AS n_b,
             CAST(CAST(s.n_shared AS HUGEINT) * 1000000
                  // (za.n + zb.n - s.n_shared) AS BIGINT) AS jaccard_ppm
      FROM shared s
      JOIN sz za ON za.source = s.src_a
      JOIN sz zb ON zb.source = s.src_b)
    SELECT CAST(row_number() OVER (ORDER BY jaccard_ppm DESC, src_a, src_b)
                AS BIGINT) AS rank,
           src_a, src_b, n_shared, n_a, n_b, jaccard_ppm
    FROM scored
    QUALIFY rank <= {_XSRC_TOP}
    """,
    tags=("U6", "A4", "J7", "O2"),
)
def corpus_cross_source_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source contamination matrix — which corpus sources share
    content: exact 3-gram-set Jaccard between every source pair, top
    {_XSRC_TOP} most-overlapping pairs. The diagnostic behind source
    weighting and leakage triage (two 'independent' crawls sharing half
    their shingles are one source for mixing purposes, and a benchmark
    source overlapping a training source is contamination by
    definition). Complements decontaminate_overlap (which checks ONE
    ordained train/test boundary) with the full pairwise matrix.

    Scale: grams deduplicate to DISTINCT (source, gram) first — the
    shuffle key is the gram, and per-gram fan-out is bounded by the
    SOURCE-DOMAIN squared, not by document volume; per-source set sizes
    are one count. With thousands of sources, block the gram join by
    hash-prefix; at the reference's source arity the matrix is tiny.
    Exact integers end to end; TakeOrdered top-k."""
    from pyspark.sql import Window as PW

    d = load_table(spark, sf_dir, "documents")
    toks = d.select("source", TOKENS().alias("toks"))
    g = (
        toks.select(
            "source",
            F.explode(
                # sequence(1, 0) DESCENDS ([1, 0]) when the doc has < 3
                # tokens and the transform would index toks[-1]/toks[size]
                # (ANSI INVALID_ARRAY_INDEX) — short docs contribute no
                # grams, same as the oracle's empty generate_series
                F.expr(
                    "IF(size(toks) >= 3,"
                    " transform(sequence(1, size(toks) - 2),"
                    " i -> concat(toks[i-1], ' ', toks[i], ' ', toks[i+1])),"
                    " cast(array() as array<string>))"
                )
            ).alias("gram"),
        )
        .distinct()
        .localCheckpoint(eager=False)
    )
    sz = g.groupBy("source").agg(F.count("*").cast("long").alias("n"))
    a = g.select(F.col("source").alias("src_a"), "gram")
    b = g.select(F.col("source").alias("src_b"), F.col("gram").alias("gram_b"))
    shared = (
        a.join(
            b,
            (F.col("gram") == F.col("gram_b"))
            & (F.col("src_a") < F.col("src_b")),
        )
        .groupBy("src_a", "src_b")
        .agg(F.count("*").cast("long").alias("n_shared"))
    )
    scored = (
        shared.join(
            sz.withColumnRenamed("source", "src_a").withColumnRenamed("n", "n_a"),
            "src_a",
        )
        .join(
            sz.withColumnRenamed("source", "src_b").withColumnRenamed("n", "n_b"),
            "src_b",
        )
        .select(
            "src_a",
            "src_b",
            "n_shared",
            "n_a",
            "n_b",
            F.expr(
                "CAST(CAST(n_shared AS DECIMAL(38,0)) * 1000000"
                " div (n_a + n_b - n_shared) AS BIGINT)"
            ).alias("jaccard_ppm"),
        )
    )
    top = scored.orderBy(F.desc("jaccard_ppm"), "src_a", "src_b").limit(_XSRC_TOP)
    return top.select(
        F.row_number()
        .over(PW.orderBy(F.desc("jaccard_ppm"), "src_a", "src_b"))
        .cast("long")
        .alias("rank"),
        "src_a",
        "src_b",
        "n_shared",
        "n_a",
        "n_b",
        "jaccard_ppm",
    )


_MATTR_W = 25


@query(
    "txt_lexical_diversity",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, {SQL_TOKENS} AS toks, len({SQL_TOKENS}) AS n
      FROM documents),
    m AS (
      SELECT doc_id, n,
             CAST(len(list_distinct(toks)) AS BIGINT) AS n_types,
             CASE WHEN n > {_MATTR_W}
                  THEN CAST(list_sum([len(list_distinct(toks[i:i+{_MATTR_W - 1}]))
                         for i in generate_series(1, n - {_MATTR_W} + 1)])
                       AS BIGINT)
                  ELSE NULL END AS win_types
      FROM t)
    SELECT doc_id, CAST(n AS BIGINT) AS n_tokens, n_types,
           CASE WHEN n = 0 THEN 0
                ELSE CAST(n_types * 1000000 // n AS BIGINT) END AS ttr_ppm,
           CASE WHEN n = 0 THEN 0
                WHEN n <= {_MATTR_W}
                  THEN CAST(n_types * 1000000 // n AS BIGINT)
                ELSE CAST(win_types * 1000000
                          // ({_MATTR_W} * (n - {_MATTR_W} + 1)) AS BIGINT)
                END AS mattr_ppm
    FROM m
    """,
    tags=("U2", "F7", "F4"),
)
def txt_lexical_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lexical diversity per document: the raw type-token ratio plus
    MATTR (Covington & McFall 2010's moving-average TTR over a
    {_MATTR_W}-token sliding window) — the linguistics-standard fix for
    TTR's length bias (long documents always score lower raw TTR, so a
    length-stratified quality filter on TTR silently becomes a length
    filter; MATTR is length-invariant). mattr_ppm is the exact floor of
    (sum over window positions of window type counts) * 1e6 /
    (W * positions); documents at or under the window length fall back
    to raw TTR; zero-token documents report 0s.

    Scale: MAP-ONLY — both statistics are higher-order-function
    expressions over each doc's own token array (O(n*W) distincts
    inside codegen, bounded by the length cap any pretraining corpus
    applies); zero shuffles at any corpus size."""
    d = load_table(spark, sf_dir, "documents")
    t = d.select("doc_id", TOKENS().alias("toks")).withColumn("n", F.size("toks"))
    m = t.select(
        "doc_id",
        "n",
        F.expr("CAST(size(array_distinct(toks)) AS BIGINT)").alias("n_types"),
        F.expr(
            f"CASE WHEN n > {_MATTR_W} THEN CAST(aggregate("
            f"transform(sequence(1, n - {_MATTR_W} + 1),"
            f" i -> size(array_distinct(slice(toks, i, {_MATTR_W})))),"
            " 0L, (a, x) -> a + x) AS BIGINT) ELSE NULL END"
        ).alias("win_types"),
    )
    return m.select(
        "doc_id",
        F.col("n").cast("long").alias("n_tokens"),
        "n_types",
        F.expr(
            "CASE WHEN n = 0 THEN 0"
            " ELSE CAST(n_types * 1000000 div n AS BIGINT) END"
        ).alias("ttr_ppm"),
        F.expr(
            f"CASE WHEN n = 0 THEN 0"
            f" WHEN n <= {_MATTR_W} THEN CAST(n_types * 1000000 div n AS BIGINT)"
            f" ELSE CAST(win_types * 1000000"
            f" div ({_MATTR_W} * (n - {_MATTR_W} + 1)) AS BIGINT) END"
        ).alias("mattr_ppm"),
    )


_VOCAB_COVERAGE_KS = (10, 100, 1000)


@query(
    "tokenizer_vocab_coverage",
    oracle=f"""
    WITH tok AS (
      SELECT unnest({SQL_TOKENS}) AS tok FROM documents),
    freq AS (SELECT tok, CAST(count(*) AS BIGINT) AS n FROM tok GROUP BY tok),
    ranked AS (
      SELECT n,
             row_number() OVER (ORDER BY n DESC, tok) AS rk,
             sum(n) OVER (ORDER BY n DESC, tok
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_n
      FROM freq),
    tot AS (
      SELECT CAST(count(*) AS BIGINT) AS n_types,
             CAST(sum(n) AS BIGINT) AS n_occurrences
      FROM freq),
    ks AS (SELECT unnest([{", ".join(str(k) for k in _VOCAB_COVERAGE_KS)}])
             AS k)
    SELECT CAST(k AS BIGINT) AS k,
           t.n_types, t.n_occurrences,
           CAST(r.cum_n AS BIGINT) AS covered_occurrences,
           CAST(CAST(r.cum_n AS HUGEINT) * 1000000 // t.n_occurrences
                AS BIGINT) AS coverage_ppm
    FROM ks, tot t
    JOIN ranked r
      ON r.rk = CASE WHEN k < t.n_types THEN k ELSE t.n_types END
    ORDER BY k
    """,
    tags=("A1", "O1", "W3"),
)
def tokenizer_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary coverage curve — the engineering number behind every
    tokenizer-budget decision ('how much of the corpus do the top-K
    word types cover?'), the direct complement of the law-fitting
    queries (txt_heaps_law estimates type growth, corpus_zipf_slope the
    rank-frequency exponent; this reports the exact cumulative mass):
    token types ranked by (frequency DESC, token) with an exact
    inclusive prefix sum, read off at K = 10 / 100 / 1000 (clamped to
    the vocabulary size), coverage as exact ppm of all occurrences.

    Scale: one token-count aggregate (map-side combined, vocab-bounded
    output), then the rank + prefix sum runs over the TYPE table via
    the two-pass distributed prefix shape (registry.global_prefix) —
    never a single-node sort of the corpus; the K probe is a broadcast
    join against a 3-row constant table."""
    from .registry import global_prefix

    d = load_table(spark, sf_dir, "documents")
    freq = (
        d.select(F.explode(TOKENS()).alias("tok"))
        .groupBy("tok")
        .agg(F.count("*").cast("long").alias("n"))
    )
    ranked = global_prefix(
        freq, [F.col("n").desc(), F.col("tok")], [("occ", F.col("n"))]
    )
    tot = freq.agg(
        F.count("*").cast("long").alias("n_types"),
        F.sum("n").cast("long").alias("n_occurrences"),
    )
    ks = spark.createDataFrame(
        [(k,) for k in _VOCAB_COVERAGE_KS], "k long"
    ).crossJoin(F.broadcast(tot))
    probe = ks.withColumn(
        "rk_eff",
        F.expr("CASE WHEN k < n_types THEN k ELSE n_types END"),
    )
    return (
        ranked.select("rk", F.col("cum_occ"))
        .join(F.broadcast(probe), F.col("rk") == F.col("rk_eff"))
        .select(
            "k",
            "n_types",
            "n_occurrences",
            F.col("cum_occ").cast("long").alias("covered_occurrences"),
            F.expr(
                "CAST(CAST(cum_occ AS DECIMAL(38,0)) * 1000000"
                " div n_occurrences AS BIGINT)"
            ).alias("coverage_ppm"),
        )
        .orderBy("k")
    )


# --- Fellegi-Sunter probabilistic record linkage ------------------------------
# Shared blocking CTEs (identical text to join_fuzzy_blocked's oracle).
_FS_PAIR_CTES = f"""
    {FUZZY_BLOCK_CTES},
    pairs AS (
      SELECT a.doc_id AS da, c.doc_id AS db,
             levenshtein(a.pfx, c.pfx) AS dist
      FROM b a JOIN b c ON a.blk = c.blk AND a.doc_id < c.doc_id
      WHERE levenshtein(a.pfx, c.pfx) <= 8
    )"""

_FS_FIELDS = ("lang", "source", "lb", "tok1")
_FS_ANCHOR_DIST = 2
_FS_UPPER_MICRO = 2_000_000  # >= 2 nats of evidence => match
_FS_LN = "CAST(floor(ln({x}) * 1000000 + 0.5) AS BIGINT)"


def _fs_weight_sql(i: int) -> str:
    """Agreement/disagreement log-weights for field i from clamped ppm
    m/u — shared text between the Spark plan and the DuckDB oracle
    (both engines take ln of the SAME exact integer)."""
    wa = f"{_FS_LN.format(x=f'm{i}')} - {_FS_LN.format(x=f'u{i}')}"
    wd = (
        f"{_FS_LN.format(x=f'1000000 - m{i}')}"
        f" - {_FS_LN.format(x=f'1000000 - u{i}')}"
    )
    return f"({wa}) AS wa{i}, ({wd}) AS wd{i}"


@query(
    "er_fellegi_sunter",
    oracle=f"""
    WITH {_FS_PAIR_CTES},
    f AS (
      SELECT doc_id, lang, source, n_chars // 100 AS lb,
             string_split(substring(lower(trim(text)), 1, 40), ' ')[1]
               AS tok1
      FROM documents),
    feat AS (
      SELECT p.da, p.db, p.dist,
             CASE WHEN fa.lang = fb.lang THEN 1 ELSE 0 END AS ag1,
             CASE WHEN fa.source = fb.source THEN 1 ELSE 0 END AS ag2,
             CASE WHEN fa.lb = fb.lb THEN 1 ELSE 0 END AS ag3,
             CASE WHEN fa.tok1 = fb.tok1 THEN 1 ELSE 0 END AS ag4
      FROM pairs p JOIN f fa ON p.da = fa.doc_id
                   JOIN f fb ON p.db = fb.doc_id),
    anch AS (
      SELECT CAST(count(*) AS BIGINT) AS na,
             CAST(coalesce(sum(ag1), 0) AS BIGINT) AS s1,
             CAST(coalesce(sum(ag2), 0) AS BIGINT) AS s2,
             CAST(coalesce(sum(ag3), 0) AS BIGINT) AS s3,
             CAST(coalesce(sum(ag4), 0) AS BIGINT) AS s4
      FROM feat WHERE dist <= {_FS_ANCHOR_DIST}),
    nn AS (SELECT CAST(count(*) AS HUGEINT) AS n FROM f),
    uu AS (
      SELECT
        (SELECT sum(CAST(c AS HUGEINT) * c)
         FROM (SELECT count(*) AS c FROM f GROUP BY lang)) AS q1,
        (SELECT sum(CAST(c AS HUGEINT) * c)
         FROM (SELECT count(*) AS c FROM f GROUP BY source)) AS q2,
        (SELECT sum(CAST(c AS HUGEINT) * c)
         FROM (SELECT count(*) AS c FROM f GROUP BY lb)) AS q3,
        (SELECT sum(CAST(c AS HUGEINT) * c)
         FROM (SELECT count(*) AS c FROM f GROUP BY tok1)) AS q4),
    mu AS (
      SELECT
        {", ".join(
            f"CASE WHEN na = 0 THEN 500000 ELSE"
            f" least(greatest(s{i} * 1000000 // na, 1), 999999) END AS m{i},"
            f" least(greatest(CAST(q{i} * 1000000 // (n * n) AS BIGINT),"
            f" 1), 999999) AS u{i}"
            for i in range(1, 5)
        )}
      FROM anch, nn, uu),
    w AS (SELECT {", ".join(_fs_weight_sql(i) for i in range(1, 5))} FROM mu),
    scored AS (
      SELECT feat.*,
             {" + ".join(
                 f"(CASE WHEN ag{i} = 1 THEN wa{i} ELSE wd{i} END)"
                 for i in range(1, 5)
             )} AS score
      FROM feat, w)
    SELECT CASE WHEN score >= {_FS_UPPER_MICRO} THEN 'match'
                WHEN score >= 0 THEN 'possible'
                ELSE 'non_match' END AS decision,
           CAST(count(*) AS BIGINT) AS n_pairs,
           CAST(min(score) AS BIGINT) AS min_score_micro,
           CAST(max(score) AS BIGINT) AS max_score_micro
    FROM scored GROUP BY 1
    """,
    tags=("U6", "J7", "F4"),
)
def er_fellegi_sunter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fellegi-Sunter probabilistic record linkage (JASA 1969) — the
    scoring layer the rule-based resolver (er_resolve_entities) lacks:
    instead of a hard levenshtein cutoff, each blocked candidate pair
    is scored by summed log-likelihood-ratio weights per comparison
    field, with the m-probabilities ESTIMATED from an anchor set
    (near-certain matches: prefix distance <= 2) and the
    u-probabilities from the population field marginals (P(agree |
    random pair) = sum of squared value shares — the textbook
    estimator, exact integer algebra over the marginal counts).
    Weights quantize by the repo ln discipline (ln of an exact clamped
    ppm integer, floor(x*1e6+0.5)), so the match / possible /
    non-match decision counts hash-match cross-engine. Upper threshold
    2 nats; clamping m,u into [1, 999999] ppm keeps both log terms
    finite (the all-agree anchor field would otherwise put ln(0) in
    the disagreement weight).

    Scale: candidate generation is the hierarchical blocked join
    (join_fuzzy_blocked — candidates-then-verify, never all-pairs);
    m/u estimation is two constant-width aggregates (anchor scan +
    field marginals); scoring broadcasts the 1-row weight table onto
    the pair stream."""
    pairs = join_fuzzy_blocked(spark, sf_dir).select(
        F.col("doc_a").alias("da"), F.col("doc_b").alias("db"), "dist"
    )
    f = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        "lang",
        "source",
        F.expr("n_chars div 100").alias("lb"),
        F.split(F.substring(F.lower(F.trim("text")), 1, 40), " ")
        .getItem(0)
        .alias("tok1"),
    )
    fa = f.select(*[F.col(c).alias(f"a_{c}") for c in f.columns])
    fb = f.select(*[F.col(c).alias(f"b_{c}") for c in f.columns])
    feat = (
        pairs.join(fa, pairs.da == fa.a_doc_id)
        .join(fb, pairs.db == fb.b_doc_id)
        .select(
            "da",
            "db",
            "dist",
            *[
                F.when(F.col(f"a_{c}") == F.col(f"b_{c}"), 1)
                .otherwise(0)
                .alias(f"ag{i}")
                for i, c in zip(range(1, 5), _FS_FIELDS)
            ],
        )
        .localCheckpoint(eager=False)
    )
    anch = feat.filter(F.col("dist") <= _FS_ANCHOR_DIST).agg(
        F.count("*").cast("long").alias("na"),
        *[
            F.coalesce(F.sum(f"ag{i}"), F.lit(0)).cast("long").alias(f"s{i}")
            for i in range(1, 5)
        ],
    )
    nn = f.agg(F.count("*").cast("decimal(38,0)").alias("n"))
    us = [
        f.groupBy(c)
        .agg(F.count("*").alias("c"))
        .agg(
            F.sum(F.expr("CAST(c AS DECIMAL(38,0)) * c")).alias(f"q{i}")
        )
        for i, c in zip(range(1, 5), _FS_FIELDS)
    ]
    mu_in = anch.crossJoin(F.broadcast(nn))
    for u in us:
        mu_in = mu_in.crossJoin(F.broadcast(u))
    mu = mu_in.selectExpr(
        *[
            e
            for i in range(1, 5)
            for e in (
                f"CASE WHEN na = 0 THEN 500000 ELSE"
                f" least(greatest(s{i} * 1000000 div na, 1), 999999) END"
                f" AS m{i}",
                f"least(greatest(CAST(q{i} * 1000000 div (n * n) AS BIGINT),"
                f" 1), 999999) AS u{i}",
            )
        ]
    )
    w = mu.selectExpr(
        *[
            e
            for i in range(1, 5)
            for e in (
                f"{_FS_LN.format(x=f'm{i}')}"
                f" - {_FS_LN.format(x=f'u{i}')} AS wa{i}",
                f"{_FS_LN.format(x=f'1000000 - m{i}')}"
                f" - {_FS_LN.format(x=f'1000000 - u{i}')} AS wd{i}",
            )
        ]
    )
    scored = feat.crossJoin(F.broadcast(w)).withColumn(
        "score",
        F.expr(
            " + ".join(
                f"(CASE WHEN ag{i} = 1 THEN wa{i} ELSE wd{i} END)"
                for i in range(1, 5)
            )
        ),
    )
    return scored.groupBy(
        F.expr(
            f"CASE WHEN score >= {_FS_UPPER_MICRO} THEN 'match'"
            " WHEN score >= 0 THEN 'possible'"
            " ELSE 'non_match' END"
        ).alias("decision")
    ).agg(
        F.count("*").cast("long").alias("n_pairs"),
        F.min("score").cast("long").alias("min_score_micro"),
        F.max("score").cast("long").alias("max_score_micro"),
    )


_BIGRAMS_DUCK = (
    f"list_transform(generate_series(2, len({SQL_TOKENS})),"
    f" i -> {SQL_TOKENS}[i-1] || ' ' || {SQL_TOKENS}[i])"
)


@query(
    "eval_rouge_pairs",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, unnest(list_distinct({SQL_TOKENS})) AS tok
      FROM documents),
    sig AS (SELECT doc_id, {_SIG_SQL} FROM tok GROUP BY doc_id),
    band AS (SELECT doc_id, {MINHASH_BAND_SQL} AS k FROM sig),
    canon AS (SELECT k, min(doc_id) AS canonical_id FROM band GROUP BY k),
    pairs AS (
      SELECT b.doc_id, c.canonical_id
      FROM band b JOIN canon c USING (k)
      WHERE b.doc_id <> c.canonical_id),
    uni AS (
      SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS c
      FROM (SELECT doc_id, unnest({SQL_TOKENS}) AS tok FROM documents)
      GROUP BY doc_id, tok),
    big AS (
      SELECT doc_id, bg, CAST(count(*) AS BIGINT) AS c
      FROM (SELECT doc_id, unnest({_BIGRAMS_DUCK}) AS bg FROM documents)
      GROUP BY doc_id, bg),
    sz AS (
      SELECT doc_id, CAST(len({SQL_TOKENS}) AS BIGINT) AS n1,
             CAST(greatest(len({SQL_TOKENS}) - 1, 0) AS BIGINT) AS n2
      FROM documents),
    ov1 AS (
      SELECT p.doc_id, p.canonical_id,
             CAST(sum(least(a.c, b.c)) AS BIGINT) AS ov
      FROM pairs p
      JOIN uni a ON a.doc_id = p.doc_id
      JOIN uni b ON b.doc_id = p.canonical_id AND b.tok = a.tok
      GROUP BY 1, 2),
    ov2 AS (
      SELECT p.doc_id, p.canonical_id,
             CAST(sum(least(a.c, b.c)) AS BIGINT) AS ov
      FROM pairs p
      JOIN big a ON a.doc_id = p.doc_id
      JOIN big b ON b.doc_id = p.canonical_id AND b.bg = a.bg
      GROUP BY 1, 2)
    SELECT p.doc_id, p.canonical_id,
           CAST(coalesce(ov1.ov, 0) * 2 * 1000000
                // (sa.n1 + sb.n1) AS BIGINT) AS rouge1_f1_ppm,
           CASE WHEN sa.n2 + sb.n2 = 0 THEN 0
                ELSE CAST(coalesce(ov2.ov, 0) * 2 * 1000000
                          // (sa.n2 + sb.n2) AS BIGINT)
           END AS rouge2_f1_ppm
    FROM pairs p
    JOIN sz sa ON sa.doc_id = p.doc_id
    JOIN sz sb ON sb.doc_id = p.canonical_id
    LEFT JOIN ov1 ON ov1.doc_id = p.doc_id
                 AND ov1.canonical_id = p.canonical_id
    LEFT JOIN ov2 ON ov2.doc_id = p.doc_id
                 AND ov2.canonical_id = p.canonical_id
    """,
    tags=("U2", "U6", "F7"),
)
def eval_rouge_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROUGE-1/-2 F1 for every near-duplicate candidate against its
    cluster canonical — the n-gram overlap metric (Lin 2004) that
    grades summarization/paraphrase quality, here serving as the
    VERIFY stage of the dedup lane: each MinHash full-band member is
    scored against the group's min-id canonical with clipped-count
    (multiset) overlap, F1 = 2*sum(min(c_a, c_b)) / (|a| + |b|) — one
    exact floor division because clipped P and R share the overlap
    numerator. Pairs are member->canonical (sum(sz-1) per group,
    LINEAR — the same collapse-pair discipline as the LSH precision
    audit, never intra-bucket all-pairs).

    Scale: map-only signatures -> band-keyed canonical join; unigram/
    bigram count tables shuffle on (doc, gram) with map-side combine;
    the overlap joins key on (canonical, gram) — the heavy side is
    bounded by the flagged-pair token mass, not the corpus."""
    d = load_table(spark, sf_dir, "documents")
    band = dedup_minhash_signatures(spark, sf_dir).select(
        "doc_id", minhash_band_col().alias("k")
    )
    canon = band.groupBy("k").agg(F.min("doc_id").alias("canonical_id"))
    pairs = (
        band.join(canon, "k")
        .filter(F.col("doc_id") != F.col("canonical_id"))
        .select("doc_id", "canonical_id")
        .localCheckpoint(eager=False)
    )
    # prune to flagged docs BEFORE building gram tables: only pair
    # members are ever scored, so the gram shuffle must be bounded by
    # the flagged-pair token mass, not the corpus (review finding)
    pair_docs = (
        pairs.select("doc_id")
        .unionAll(pairs.select(F.col("canonical_id").alias("doc_id")))
        .distinct()
    )
    toks = (
        d.select("doc_id", TOKENS().alias("toks"))
        .join(pair_docs, "doc_id", "left_semi")
        .localCheckpoint(eager=False)
    )
    uni = (
        toks.select("doc_id", F.explode("toks").alias("g"))
        .groupBy("doc_id", "g")
        .agg(F.count("*").alias("c"))
    )
    big = (
        toks.select(
            "doc_id",
            F.explode(
                F.expr(
                    "CASE WHEN size(toks) < 2 THEN array()"
                    " ELSE transform(sequence(2, size(toks)),"
                    " i -> concat(toks[i-2], ' ', toks[i-1])) END"
                )
            ).alias("g"),
        )
        .groupBy("doc_id", "g")
        .agg(F.count("*").alias("c"))
    )
    sz = toks.select(
        "doc_id",
        F.size("toks").cast("long").alias("n1"),
        F.greatest(F.size("toks") - 1, F.lit(0)).cast("long").alias("n2"),
    )

    def overlap(grams: DataFrame, name: str) -> DataFrame:
        a = grams.select(
            F.col("doc_id").alias("m_id"), "g", F.col("c").alias("ca")
        )
        b = grams.select(
            F.col("doc_id").alias("c_id"), "g", F.col("c").alias("cb")
        )
        return (
            pairs.join(a, pairs.doc_id == a.m_id)
            .join(
                b,
                (F.col("canonical_id") == b.c_id) & (a.g == b.g),
            )
            .groupBy("doc_id", "canonical_id")
            .agg(F.sum(F.least("ca", "cb")).cast("long").alias(name))
        )

    sa = sz.select(
        F.col("doc_id").alias("da"),
        F.col("n1").alias("na1"),
        F.col("n2").alias("na2"),
    )
    sb = sz.select(
        F.col("doc_id").alias("db"),
        F.col("n1").alias("nb1"),
        F.col("n2").alias("nb2"),
    )
    out = (
        pairs.join(sa, pairs.doc_id == sa.da)
        .join(sb, pairs.canonical_id == sb.db)
        .join(overlap(uni, "ov1"), ["doc_id", "canonical_id"], "left")
        .join(overlap(big, "ov2"), ["doc_id", "canonical_id"], "left")
    )
    return out.select(
        "doc_id",
        "canonical_id",
        F.expr(
            "CAST(coalesce(ov1, 0) * 2 * 1000000 div (na1 + nb1) AS BIGINT)"
        ).alias("rouge1_f1_ppm"),
        F.expr(
            "CASE WHEN na2 + nb2 = 0 THEN 0"
            " ELSE CAST(coalesce(ov2, 0) * 2 * 1000000 div (na2 + nb2)"
            " AS BIGINT) END"
        ).alias("rouge2_f1_ppm"),
    )
