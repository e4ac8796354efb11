"""Retrieval / language-model statistics over the documents table —
the IR-flavored slice of a training-data pipeline (reference parity:
the docs corpus the scaffold's generator emits, generator.py:137-171;
the reference specifies no retrieval engine, so these are the Spark-first
operators a corpus user layers on top).

Cross-engine determinism: scoring never touches floats. BM25's
transcendental idf is replaced by a rational "probabilistic idf"
(2(N-df)+1)/(2df+1) scaled to an integer, and the tf/length
normalization is cleared of fractions by multiplying through by
10·A (A = corpus token count), so every score is a pure BIGINT
expression both engines floor-divide identically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from ..sources.readers import load_table
from .registry import query
from .text import SQL_TOKENS, TOKENS

# Fixed retrieval query (terms from the corpus vocabulary).
_QUERY_TERMS = ("vector", "merge", "window")
_SQL_TERMS = ", ".join(f"'{t}'" for t in _QUERY_TERMS)
_IDF_SCALE = 10_000
_TOP_K = 10


def _bm25_scored(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, n_terms_hit, score_q) for the fixed term query — the
    integer-quantized BM25 core shared by txt_bm25_topk and the RRF
    fusion leg (algebra documented on txt_bm25_topk)."""
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", TOKENS().alias("toks")
    )
    dl = d.select("doc_id", F.size("toks").alias("dl"), "toks")
    stats = dl.agg(
        F.count("*").alias("n_docs"), F.sum("dl").cast("long").alias("a_tokens")
    )
    tf = (
        dl.select("doc_id", "dl", F.explode("toks").alias("tok"))
        .filter(F.col("tok").isin(*_QUERY_TERMS))
        .groupBy("doc_id", "dl", "tok")
        .agg(F.count("*").alias("tf"))
    )
    dfreq = tf.groupBy("tok").agg(F.count("*").alias("df"))
    term_score = F.expr(
        f"(((2 * (n_docs - df) + 1) * {_IDF_SCALE}) div (2 * df + 1))"
        " * (22 * tf * a_tokens)"
        " div (10 * a_tokens * tf + 3 * a_tokens + 9 * dl * n_docs)"
    )
    return (
        tf.join(F.broadcast(dfreq), "tok")
        .crossJoin(F.broadcast(stats))
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_terms_hit"),
            F.sum(term_score).cast("long").alias("score_q"),
            # graded relevance for the eval leg (total term occurrences):
            # rides this aggregate instead of a second corpus scan
            F.sum("tf").cast("long").alias("rel"),
        )
    )


# The BM25 CTE chain, shared verbatim by txt_bm25_topk and txt_ndcg_eval
# so the scorer under evaluation cannot drift from the scorer evaluated.
_BM25_SQL_CTES = f"""dl AS (SELECT doc_id, len({SQL_TOKENS}) AS dl, {SQL_TOKENS} AS toks
                FROM documents),
         stats AS (SELECT count(*) AS n_docs, CAST(sum(dl) AS BIGINT) AS a_tokens
                   FROM dl),
         tf AS (SELECT doc_id, dl, tok, count(*) AS tf
                FROM (SELECT doc_id, dl, unnest(toks) AS tok FROM dl)
                WHERE tok IN ({_SQL_TERMS})
                GROUP BY doc_id, dl, tok),
         dfreq AS (SELECT tok, count(*) AS df FROM tf GROUP BY tok),
         scored AS (
           SELECT t.doc_id,
                  count(*) AS n_terms_hit,
                  CAST(sum(
                    (((2 * (s.n_docs - f.df) + 1) * {_IDF_SCALE}) // (2 * f.df + 1))
                    * (22 * t.tf * s.a_tokens)
                    // (10 * s.a_tokens * t.tf + 3 * s.a_tokens + 9 * t.dl * s.n_docs)
                  ) AS BIGINT) AS score_q
           FROM tf t JOIN dfreq f USING (tok), stats s
           GROUP BY t.doc_id)"""


@query(
    "txt_bm25_topk",
    oracle=f"""
    WITH {_BM25_SQL_CTES}
    SELECT CAST(row_number() OVER (ORDER BY score_q DESC, doc_id) AS BIGINT) AS rank,
           doc_id, n_terms_hit, score_q
    FROM scored
    QUALIFY rank <= {_TOP_K}
    """,
    tags=("U2", "A3", "O2"),
)
def txt_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 top-k retrieval for a fixed term query, integer-quantized so
    both engines agree bit-for-bit: idf(t) = ⌊scale·(2(N−df)+1)/(2df+1)⌋
    (the rational probabilistic-idf — no ln), and the per-term Okapi
    fraction tf·(k1+1)/(tf + k1(1−b+b·dl/avgdl)) with k1=1.2, b=0.75 is
    multiplied through by 10·A (A = corpus tokens, avgdl = A/N) into
    22·tf·A / (10·A·tf + 3·A + 9·dl·N) — BIGINT floor division end to end.
    Plan shape: one tokenize scan feeding (a) a 1-row corpus-stats
    aggregate and (b) a term-filtered tf table; df-per-term is a tiny
    aggregate broadcast back; top-k is orderBy+limit →
    TakeOrderedAndProject, never a global sort. The tf table is
    |query terms| × docs-containing-them — the filter lands before the
    explode's groupBy, so corpus size only enters through the scan. At
    trillion-token scale widen the BIGINTs to decimal(38,0); the floor
    algebra is unchanged."""
    top = _bm25_scored(spark, sf_dir).orderBy(
        F.desc("score_q"), "doc_id"
    ).limit(_TOP_K)
    rank = F.row_number().over(W.orderBy(F.desc("score_q"), "doc_id"))
    return top.select(
        rank.cast("long").alias("rank"), "doc_id", "n_terms_hit", "score_q"
    )


_POSTINGS_HEAD = 8


@query(
    "index_inverted_postings",
    oracle=f"""
    WITH posting AS (
      SELECT tok, doc_id, count(*) AS tf
      FROM (SELECT doc_id, unnest({SQL_TOKENS}) AS tok FROM documents)
      GROUP BY tok, doc_id)
    SELECT tok,
           count(*) AS df,
           CAST(sum(tf) AS BIGINT) AS total_tf,
           array_to_string(
             (list(CAST(doc_id AS VARCHAR) || ':' || CAST(tf AS VARCHAR)
                   ORDER BY doc_id))[1:{_POSTINGS_HEAD}], ' ') AS postings_head
    FROM posting
    GROUP BY tok
    """,
    tags=("A8", "F7", "U2"),
)
def index_inverted_postings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverted-index build — token → (document frequency, total term
    frequency, head of the doc_id-ordered posting list as "doc:tf"
    pairs). The posting list is assembled *inside* the group via
    array_sort on (doc_id, tf) structs — per-token parallelism, no
    global order — and the emitted head is sliced to a constant length
    so a stopword's row stays bounded no matter the corpus size (the
    full list would be the one thing that scales with N; real posting
    files shard it, the capped head is the hash-checkable stand-in).
    Two shuffles: (tok, doc_id) tf counts with map-side combine, then
    the per-token fold. Output cardinality = vocabulary size, not
    corpus size."""
    d = load_table(spark, sf_dir, "documents")
    posting = (
        d.select("doc_id", F.explode(TOKENS()).alias("tok"))
        .groupBy("tok", "doc_id")
        .agg(F.count("*").alias("tf"))
    )
    head = F.array_join(
        F.slice(
            F.transform(
                F.array_sort(F.collect_list(F.struct("doc_id", "tf"))),
                lambda s: F.concat_ws(
                    ":", s["doc_id"].cast("string"), s["tf"].cast("string")
                ),
            ),
            1,
            _POSTINGS_HEAD,
        ),
        " ",
    )
    return posting.groupBy("tok").agg(
        F.count("*").alias("df"),
        F.sum("tf").cast("long").alias("total_tf"),
        head.alias("postings_head"),
    )


@query(
    "lm_bigram_counts",
    oracle=f"""
    WITH toks AS (SELECT doc_id, {SQL_TOKENS} AS toks FROM documents),
         big AS (SELECT toks[i] AS w1, toks[i + 1] AS w2
                 FROM toks, unnest(range(1, len(toks))) AS u(i)),
         cnt AS (SELECT w1, w2, count(*) AS n_bigram FROM big GROUP BY w1, w2)
    SELECT w1, w2, n_bigram,
           CAST(sum(n_bigram) OVER (PARTITION BY w1) AS BIGINT) AS n_prefix
    FROM cnt
    """,
    tags=("F7", "A1", "W3"),
)
def lm_bigram_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram language-model count table — the n-gram statistics pass of
    a corpus build: every adjacent token pair's count plus its prefix
    marginal (the conditional probability n_bigram/n_prefix as the exact
    integer pair, never a float). Bigram extraction is a JVM zip_with of
    the token array against its own shift — no Python, no per-row UDF —
    then one (w1, w2) count with map-side combine. The prefix marginal
    reuses the counted table through a window partitioned by w1: it runs
    over vocabulary² rows (constant for a closed vocab, tiny vs corpus),
    not over the corpus."""
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", TOKENS().alias("toks")
    )
    n1 = F.greatest(F.size("toks") - 1, F.lit(0))
    pairs = F.zip_with(
        F.slice("toks", 1, n1),
        F.expr("slice(toks, 2, greatest(size(toks) - 1, 0))"),
        lambda x, y: F.struct(x.alias("w1"), y.alias("w2")),
    )
    cnt = (
        d.select(F.explode(pairs).alias("p"))
        .select("p.w1", "p.w2")
        .groupBy("w1", "w2")
        .agg(F.count("*").alias("n_bigram"))
    )
    return cnt.withColumn(
        "n_prefix",
        F.sum("n_bigram").over(W.partitionBy("w1")).cast("long"),
    )



# ONE definition of the add-1-smoothed bigram model — SQL CTE chain and
# Spark builder — shared by txt_perplexity_filter and
# quality_perplexity_buckets (the 'same model' invariant held by code,
# not by manual copy-sync — /code-review r9 find).
_PPLX_SQL_CTES = f"""toks AS (SELECT doc_id, {SQL_TOKENS} AS toks FROM documents),
         big AS (SELECT doc_id, toks[i] AS w1, toks[i] || ' ' || toks[i + 1] AS bg
                 FROM toks, unnest(range(1, len(toks))) AS u(i)),
         cb AS (SELECT bg, count(*) AS c FROM big GROUP BY bg),
         cu AS (SELECT w1 AS w, count(*) AS c FROM big GROUP BY w1),
         v AS (SELECT count(DISTINCT u) AS vs FROM
                 (SELECT unnest(toks) AS u FROM toks)),
         scored AS (
           SELECT b.doc_id,
                  CAST(round(ln((cb.c + 1.0) / (cu.c + v.vs)), 6)
                       AS DECIMAL(18,6)) AS lp
           FROM big b JOIN cb ON b.bg = cb.bg
                      JOIN cu ON b.w1 = cu.w, v
         )"""


def _scored_bigrams(d):
    """(doc_id, lp) per bigram occurrence under the add-1-smoothed
    bigram model trained on the corpus itself — the Spark twin of
    _PPLX_SQL_CTES' `scored`. `d` must carry (doc_id, toks)."""
    n1 = F.greatest(F.size("toks") - 1, F.lit(0))
    pairs = F.zip_with(
        F.slice("toks", 1, n1),
        F.expr("slice(toks, 2, greatest(size(toks) - 1, 0))"),
        lambda x, y: F.struct(
            x.alias("w1"), F.concat(x, F.lit(" "), y).alias("bg")
        ),
    )
    big = d.select("doc_id", F.explode(pairs).alias("p")).select(
        "doc_id", "p.w1", "p.bg"
    )
    cb = big.groupBy("bg").agg(F.count("*").alias("cb"))
    cu = big.groupBy("w1").agg(F.count("*").alias("cu"))
    vocab = (
        d.select(F.explode("toks").alias("u"))
        .agg(F.countDistinct("u").alias("vs"))
    )
    lp = F.round(
        F.log((F.col("cb") + F.lit(1.0)) / (F.col("cu") + F.col("vs"))), 6
    ).cast("decimal(18,6)")
    # cb/cu grow with corpus vocabulary (Heaps' law) — no forced
    # broadcast; AQE converts to BHJ at runtime only when they fit
    return (
        big.join(cb, "bg")
        .join(cu, "w1")
        .crossJoin(F.broadcast(vocab))
        .select("doc_id", lp.alias("lp"))
    )


@query(
    "txt_perplexity_filter",
    oracle=f"""
    WITH {_PPLX_SQL_CTES}
    SELECT doc_id,
           count(*) AS n_bigrams,
           CAST(sum(lp) AS DOUBLE) AS total_logprob
    FROM scored
    GROUP BY doc_id
    """,
    tags=("U2", "A7", "F4"),
)
def txt_perplexity_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perplexity-based quality scoring — the model-based corpus filter
    (KenLM-style): train add-1-smoothed bigram statistics on the corpus
    itself, then score every document's total log-probability; low scores
    flag boilerplate/garbled text for removal. Train and score are two
    passes over the same exploded bigrams: counts groupBy (map-side
    combined), then a join of the count tables back onto the bigram
    stream — count-table size follows corpus vocabulary (Heaps' law), so
    the join strategy is left to AQE rather than a forced broadcast. Cross-engine float discipline:
    each bigram's ln() is QUANTIZED to decimal(18,6) immediately, so the
    per-doc reduction is an exact decimal sum — aggregation order can
    never change the answer — and only the final cast returns to double.
    At 100 TB the count tables are |vocab| and |unique bigrams| rows,
    while the corpus stream itself never shuffles on document data."""
    d = load_table(spark, sf_dir, "documents").select("doc_id", TOKENS().alias("toks"))
    scored = _scored_bigrams(d)
    return scored.groupBy("doc_id").agg(
        F.count("*").alias("n_bigrams"),
        F.sum("lp").cast("double").alias("total_logprob"),
    )


@query(
    "dsir_importance_score",
    oracle=f"""
    WITH toks AS (SELECT doc_id, lang, {SQL_TOKENS} AS toks FROM documents),
         u AS (SELECT doc_id, lang, unnest(toks) AS w FROM toks),
         cnt AS (SELECT w, count(*) AS cb,
                        CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS ct
                 FROM u GROUP BY w),
         tot AS (SELECT count(*) AS nb,
                        CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS nt,
                        count(DISTINCT w) AS vs
                 FROM u),
         scored AS (
           SELECT u.doc_id,
                  CAST(round(ln((c.ct + 1.0) / (t.nt + t.vs)), 6) AS DECIMAL(18,6))
                  - CAST(round(ln((c.cb + 1.0) / (t.nb + t.vs)), 6) AS DECIMAL(18,6)) AS lw
           FROM u JOIN cnt c ON u.w = c.w, tot t
         )
    SELECT doc_id,
           count(*) AS n_tokens,
           CAST(sum(lw) AS DOUBLE) AS importance
    FROM scored
    GROUP BY doc_id
    """,
    tags=("U2", "A7", "F4"),
)
def dsir_importance_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR-style importance scoring (Xie et al. 2023, "Data Selection
    for Language Models via Importance Resampling" — public method): rate
    every document by the log-likelihood ratio of a target-domain unigram
    LM (here: the English slice) over the background LM of the whole
    corpus, add-1 smoothed. Positive scores mean "looks like the target
    domain"; downstream selection keeps the top mass. Both count tables
    come out of ONE word-level aggregate (cb = background count,
    ct = conditional target count via sum-of-flag — no second pass), and
    the totals are a 1-row aggregate broadcast. Cross-engine float
    discipline matches txt_perplexity_filter: each per-token ln is
    quantized to decimal(18,6) before the exact decimal per-doc sum, so
    aggregation order can never change the answer. At 100 TB the count
    table is vocabulary-sized (Heaps' law), the token stream shuffles
    only (word, doc_id) pairs, and the join strategy is left to AQE."""
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", F.explode(TOKENS()).alias("w")
    )
    is_t = (F.col("lang") == "en").cast("long")
    cnt = d.groupBy("w").agg(
        F.count("*").alias("cb"), F.sum(is_t).alias("ct")
    )
    # All three totals are marginals of the vocabulary table — deriving
    # them from cnt (nb = Σcb, nt = Σct, vs = |cnt|) reuses its exchange
    # instead of re-exploding the whole token stream a second time.
    tot = cnt.agg(
        F.sum("cb").alias("nb"),
        F.sum("ct").alias("nt"),
        F.count("*").alias("vs"),
    )
    lw = F.round(
        F.log((F.col("ct") + F.lit(1.0)) / (F.col("nt") + F.col("vs"))), 6
    ).cast("decimal(18,6)") - F.round(
        F.log((F.col("cb") + F.lit(1.0)) / (F.col("nb") + F.col("vs"))), 6
    ).cast("decimal(18,6)")
    scored = (
        # cnt is vocabulary-sized — strategy left to AQE, no forced broadcast
        d.join(cnt, "w")
        .crossJoin(F.broadcast(tot))  # 1-row aggregate
        .select("doc_id", lw.alias("lw"))
    )
    return scored.groupBy("doc_id").agg(
        F.count("*").alias("n_tokens"),
        F.sum("lw").cast("double").alias("importance"),
    )


_RRF_K = 60
_RRF_SCALE = 1_000_000_000
_LEG_K = 20


@query(
    "retrieval_rrf_fusion",
    oracle=f"""
    WITH {_BM25_SQL_CTES},
         lex AS (
           SELECT doc_id,
                  CAST(row_number() OVER (ORDER BY score_q DESC, doc_id) AS BIGINT) AS lex_rank
           FROM scored
           QUALIFY lex_rank <= {_LEG_K}),
         e AS (SELECT vec_id,
                      list_transform(embedding,
                        x -> CAST(floor(CAST(x AS DOUBLE) * 1024 + 0.5) AS BIGINT)) AS qv
               FROM embeddings),
         q AS (SELECT vec_id AS qid, qv AS qq FROM e ORDER BY vec_id LIMIT 1),
         vec AS (
           SELECT e.vec_id AS doc_id,
                  CAST(row_number() OVER (
                    ORDER BY CAST(list_sum([e.qv[i] * q.qq[i]
                               for i in generate_series(1, len(e.qv))]) AS BIGINT) DESC,
                      e.vec_id) AS BIGINT) AS vec_rank
           FROM e, q
           QUALIFY vec_rank <= {_LEG_K}),
         fused AS (
           SELECT COALESCE(l.doc_id, v.doc_id) AS doc_id,
                  COALESCE(l.lex_rank, 0) AS lex_rank,
                  COALESCE(v.vec_rank, 0) AS vec_rank,
                  COALESCE({_RRF_SCALE} // ({_RRF_K} + l.lex_rank), 0)
                  + COALESCE({_RRF_SCALE} // ({_RRF_K} + v.vec_rank), 0) AS rrf_scaled
           FROM lex l FULL OUTER JOIN vec v ON l.doc_id = v.doc_id)
    SELECT CAST(row_number() OVER (ORDER BY rrf_scaled DESC, doc_id) AS BIGINT) AS rank,
           doc_id, lex_rank, vec_rank, rrf_scaled
    FROM fused
    QUALIFY rank <= 10
    """,
    tags=("U2", "U5", "O2", "J6"),
)
def retrieval_rrf_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval with Reciprocal Rank Fusion (Cormack et al. 2009,
    public method; the standard lexical+vector fusion in RAG stacks):
    BM25 top-20 over documents (the integer-quantized _bm25_scored core)
    and quantized inner-product top-20 over embeddings (MIPS leg — the
    q=floor(x*1024+0.5) BIGINT-dot discipline from semantic_cells_drops,
    so the ranking can never flip on a float last-bit cross-engine;
    query = lowest-vec_id row, doc_id==vec_id correspondence) are fused by
    score(d) = Σ_legs 1/(60 + rank_leg(d)), kept exact cross-engine as
    BIGINT floor division {_RRF_SCALE}//(60+rank). Plan shape: each leg
    is an independent TakeOrderedAndProject top-k (never a global sort);
    the fusion is a full outer join of two ≤20-row lists — driver-light,
    executor-cheap, and the legs scale independently (the vector leg
    swaps to any vec_ann_* index without touching the fusion). Absent
    legs rank as 0 with zero contribution — a doc found by ONE leg can
    still beat a doc ranked low by both, which is the whole point of
    RRF."""
    lex_top = (
        _bm25_scored(spark, sf_dir)
        .orderBy(F.desc("score_q"), "doc_id")
        .limit(_LEG_K)
    )
    lex = lex_top.select(
        "doc_id",
        F.row_number()
        .over(W.orderBy(F.desc("score_q"), "doc_id"))
        .cast("long")
        .alias("lex_rank"),
    )
    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.transform(
            "embedding",
            lambda x: F.floor(x.cast("double") * 1024 + F.lit(0.5)).cast("long"),
        ).alias("qv"),
    )
    q = e.orderBy("vec_id").limit(1).select(F.col("qv").alias("qq"))
    score = F.aggregate(
        F.zip_with(F.col("qv"), F.col("qq"), lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    vec_top = (
        e.crossJoin(F.broadcast(q))
        .select(F.col("vec_id").alias("doc_id"), score.alias("ip"))
        .orderBy(F.desc("ip"), "doc_id")
        .limit(_LEG_K)
    )
    vec = vec_top.select(
        "doc_id",
        F.row_number()
        .over(W.orderBy(F.desc("ip"), "doc_id"))
        .cast("long")
        .alias("vec_rank"),
    )
    contrib = (
        F.coalesce(F.expr(f"{_RRF_SCALE} div ({_RRF_K} + lex_rank)"), F.lit(0))
        + F.coalesce(F.expr(f"{_RRF_SCALE} div ({_RRF_K} + vec_rank)"), F.lit(0))
    )
    fused = (
        lex.join(vec, "doc_id", "full")
        .select(
            "doc_id",
            F.coalesce("lex_rank", F.lit(0).cast("long")).alias("lex_rank"),
            F.coalesce("vec_rank", F.lit(0).cast("long")).alias("vec_rank"),
            contrib.cast("long").alias("rrf_scaled"),
        )
    )
    top = fused.orderBy(F.desc("rrf_scaled"), "doc_id").limit(10)
    return top.select(
        F.row_number()
        .over(W.orderBy(F.desc("rrf_scaled"), "doc_id"))
        .cast("long")
        .alias("rank"),
        "doc_id",
        "lex_rank",
        "vec_rank",
        "rrf_scaled",
    )


@query(
    "lm_kneser_ney_bigram",
    oracle=f"""
    WITH toks AS (SELECT doc_id, {SQL_TOKENS} AS toks FROM documents),
         big AS (SELECT toks[i] AS w1, toks[i + 1] AS w2
                 FROM toks, unnest(range(1, len(toks))) AS u(i)),
         cnt AS (SELECT w1, w2, count(*) AS c FROM big GROUP BY w1, w2),
         pre AS (SELECT w1, CAST(sum(c) AS BIGINT) AS cw1,
                        count(*) AS n1p
                 FROM cnt GROUP BY w1),
         contw AS (SELECT w2, count(*) AS ncont FROM cnt GROUP BY w2),
         tot AS (SELECT count(*) AS ntypes FROM cnt)
    SELECT c.w1, c.w2, CAST(c.c AS BIGINT) AS n_bigram,
           CAST(((greatest(4 * c.c - 3, 0) * t.ntypes
                  + 3 * p.n1p * w.ncont) * 1000000)
                // (4 * p.cw1 * t.ntypes) AS BIGINT) AS p_kn_micro
    FROM cnt c
    JOIN pre p USING (w1)
    JOIN contw w USING (w2)
    CROSS JOIN tot t
    """,
    tags=("A1", "A3", "F7", "J1"),
)
def lm_kneser_ney_bigram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interpolated Kneser-Ney bigram probabilities — the smoothing that
    makes n-gram LMs usable (and the scoring table behind perplexity
    filtering / contamination scoring of training corpora). Discount
    D = 3/4 is an exact rational, so the whole estimate reduces to one
    integer formula over four count tables:

        P(w2|w1) = max(c-D,0)/cw1 + D*N1+(w1,.)/cw1 * Pcont(w2)
        p_kn_micro = ((max(4c-3,0)*Ntypes + 3*N1p*Ncont) * 1e6)
                       div (4*cw1*Ntypes)

    — numerator/denominator over the common denominator 4*cw1*Ntypes,
    truncating div, zero floats anywhere. The count tables are all
    vocabulary-bounded (prefix marginals, continuation counts, type
    total), so after the one corpus-wide bigram count every join is a
    broadcast of vocab-sized sides; at web scale the longs promote to
    decimal(38,0) before the products (the 1e6 scale keeps sf3 inside
    int64 with >100x headroom, measured in the docstring's own terms:
    4 * corpus_bigrams * Ntypes * 1e6)."""
    d = load_table(spark, sf_dir, "documents").select("doc_id", TOKENS().alias("toks"))
    n1 = F.greatest(F.size("toks") - 1, F.lit(0))
    pairs = F.zip_with(
        F.slice("toks", 1, n1),
        F.expr("slice(toks, 2, greatest(size(toks) - 1, 0))"),
        lambda x, y: F.struct(x.alias("w1"), y.alias("w2")),
    )
    cnt = (
        d.select(F.explode(pairs).alias("p"))
        .select("p.w1", "p.w2")
        .groupBy("w1", "w2")
        .agg(F.count("*").alias("c"))
        # consumed by FOUR plans (prefix marginals, continuation counts,
        # type total, final join) — without this the corpus scan + bigram
        # explode + (w1,w2) shuffle run four times (caught by plan review)
        .localCheckpoint(eager=False)
    )
    pre = cnt.groupBy("w1").agg(
        F.sum("c").cast("long").alias("cw1"), F.count("*").alias("n1p")
    )
    contw = cnt.groupBy("w2").agg(F.count("*").alias("ncont"))
    tot = cnt.agg(F.count("*").alias("ntypes"))
    return (
        cnt.join(pre, "w1")
        .join(contw, "w2")
        .crossJoin(F.broadcast(tot))
        .select(
            "w1",
            "w2",
            F.col("c").cast("long").alias("n_bigram"),
            F.expr(
                "((greatest(4 * c - 3, 0L) * ntypes + 3 * n1p * ncont) * 1000000L)"
                " div (4 * cw1 * ntypes)"
            ).cast("long").alias("p_kn_micro"),
        )
    )


# NDCG log2 discounts in Q20: D_i = round(2^20 / log2(i+1)), computed once
# at import and baked as literals into BOTH engines (same constants, so
# libm never enters the comparison) — the Goertzel-constant discipline.
import math as _math

_NDCG_DISC = tuple(round(2**20 / _math.log2(i + 1)) for i in range(1, _TOP_K + 1))
_SQL_DISC = ", ".join(f"({i + 1}, {d})" for i, d in enumerate(_NDCG_DISC))


@query(
    "txt_ndcg_eval",
    oracle=f"""
    WITH {_BM25_SQL_CTES},
    rel AS (SELECT doc_id, CAST(sum(tf) AS BIGINT) AS rel FROM tf GROUP BY doc_id),
    top AS (
      SELECT doc_id, CAST(row_number() OVER (ORDER BY score_q DESC, doc_id) AS BIGINT) AS rnk
      FROM scored QUALIFY rnk <= {_TOP_K}
    ),
    ideal AS (
      SELECT rel, CAST(row_number() OVER (ORDER BY rel DESC, doc_id) AS BIGINT) AS rnk
      FROM rel QUALIFY rnk <= {_TOP_K}
    ),
    disc AS (SELECT * FROM (VALUES {_SQL_DISC}) AS v(rnk, d)),
    dcg AS (SELECT CAST(sum(r.rel * disc.d) AS BIGINT) AS dcg_q
            FROM top t JOIN rel r USING (doc_id) JOIN disc ON disc.rnk = t.rnk),
    idcg AS (SELECT CAST(sum(i.rel * disc.d) AS BIGINT) AS idcg_q
             FROM ideal i JOIN disc ON disc.rnk = i.rnk)
    SELECT {_TOP_K} AS k, dcg_q, idcg_q,
           (dcg_q * 1000000) // idcg_q AS ndcg_micro
    FROM dcg, idcg
    """,
    tags=("O2", "A3", "F4"),
)
def txt_ndcg_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking-quality evaluation — NDCG@k of the BM25 ranking against a
    graded relevance label (total query-term occurrences per doc), the
    eval leg that closes the retrieval loop (index -> score -> measure).
    Discounts 1/log2(i+1) are Q20 integers computed once at import and
    baked into both engines, so DCG, ideal-DCG, and their ratio are pure
    BIGINT — an eval metric that itself passes a bit-exact oracle, which
    matters because a flaky eval is worse than no eval. The ranking under
    test and the SQL twin share one scorer definition (_bm25_scored /
    _BM25_SQL_CTES), so the metric can never quietly evaluate a different
    ranker than the one served. Cost: the BM25 plan plus two k-row
    ranked heads and a k-row discount join — evaluation rides the
    scorer's own shuffles."""
    # scored carries rel = sum(tf) — one corpus scan serves both the
    # ranking under test and its relevance labels, consumed by three
    # plans (top head, ideal head, dcg join) hence the materialization
    scored = _bm25_scored(spark, sf_dir).localCheckpoint(eager=False)
    rel = scored.select("doc_id", "rel")
    disc_arr = F.array(*[F.lit(int(x)) for x in _NDCG_DISC])
    top = (
        scored.orderBy(F.desc("score_q"), "doc_id")
        .limit(_TOP_K)
        .select(
            "doc_id",
            F.row_number()
            .over(W.orderBy(F.desc("score_q"), "doc_id"))
            .alias("rnk"),
        )
    )
    ideal = (
        rel.orderBy(F.desc("rel"), "doc_id")
        .limit(_TOP_K)
        .select(
            "rel",
            F.row_number().over(W.orderBy(F.desc("rel"), "doc_id")).alias("rnk"),
        )
    )
    dcg = (
        top.join(rel, "doc_id")
        .select((F.col("rel") * F.element_at(disc_arr, F.col("rnk"))).alias("g"))
        .agg(F.sum("g").cast("long").alias("dcg_q"))
    )
    idcg = ideal.select(
        (F.col("rel") * F.element_at(disc_arr, F.col("rnk"))).alias("g")
    ).agg(F.sum("g").cast("long").alias("idcg_q"))
    return (
        dcg.crossJoin(idcg)
        .select(
            F.lit(_TOP_K).alias("k"),
            "dcg_q",
            "idcg_q",
            F.expr("(dcg_q * 1000000L) div idcg_q").alias("ndcg_micro"),
        )
    )


@query(
    "lm_glove_cooccur",
    oracle=f"""
    WITH gtoks AS (SELECT doc_id, {SQL_TOKENS} AS toks FROM documents),
         gpos AS (SELECT doc_id, toks,
                         unnest(generate_series(1, len(toks))) AS i
                  FROM gtoks),
         gposd AS (SELECT doc_id, toks, i, unnest([1, 2]) AS d FROM gpos),
         gpairs AS (SELECT toks[i] AS a, toks[i + d] AS b, 3 - d AS wt
                    FROM gposd WHERE i + d <= len(toks)),
         gund AS (
           SELECT a AS w_center, b AS w_context, wt FROM gpairs
           UNION ALL
           SELECT b AS w_center, a AS w_context, wt FROM gpairs
         )
    SELECT w_center, w_context,
           count(*) AS n_cooccur,
           CAST(sum(wt) AS BIGINT) AS x_scaled_2d
    FROM gund GROUP BY 1, 2
    """,
    tags=("F7", "A1", "U2"),
)
def lm_glove_cooccur(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GloVe co-occurrence matrix build (Pennington et al. 2014, §3:
    context words weighted 1/d by distance, symmetric window — here
    W=2, the matrix-build pass every embedding-pretraining pipeline runs
    before the factorization). The fractional 1/d weights become EXACT
    integers by scaling with lcm(1..W)=2: d=1 -> 2, d=2 -> 1, so
    ``x_scaled_2d`` is the order-independent BIGINT twin of GloVe's
    X_ij * 2 and hashes identically cross-engine.

    Scale: pair emission is a JVM higher-order expression (zip_with of
    the token array against its own d-shift, both orientations emitted
    inside ONE flatten — no self-union, so the token scan is not
    re-executed per direction); the single shuffle is the (center,
    context) count groupBy with map-side combine, and the result is
    vocabulary-squared-bounded (Heaps' law), tiny vs the corpus at
    100 TB."""
    from .text import TOKENS

    d = load_table(spark, sf_dir, "documents").select(TOKENS().alias("toks"))
    arms = []
    for dist in (1, 2):
        wt = 3 - dist
        arms.append(
            f"""flatten(zip_with(
                  slice(toks, 1, greatest(size(toks) - {dist}, 0)),
                  slice(toks, {1 + dist}, greatest(size(toks) - {dist}, 0)),
                  (x, y) -> array(named_struct('c', x, 't', y, 'wt', {wt}),
                                  named_struct('c', y, 't', x, 'wt', {wt}))))"""
        )
    pairs = f"concat({arms[0]}, {arms[1]})"
    return (
        d.select(F.explode(F.expr(pairs)).alias("p"))
        .groupBy(
            F.col("p.c").alias("w_center"), F.col("p.t").alias("w_context")
        )
        .agg(
            F.count("*").alias("n_cooccur"),
            F.sum("p.wt").cast("long").alias("x_scaled_2d"),
        )
    )


@query(
    "txt_mrr_eval",
    oracle=f"""
    WITH {_BM25_SQL_CTES},
    mr_top AS (
      SELECT s.doc_id, s.n_terms_hit,
             CAST(row_number() OVER (ORDER BY s.score_q DESC, s.doc_id) AS BIGINT) AS rnk
      FROM scored s QUALIFY rnk <= {_TOP_K}
    ),
    mr_rel AS (SELECT doc_id FROM scored WHERE n_terms_hit = {len(_QUERY_TERMS)}),
    mr_hits AS (
      SELECT min(t.rnk) AS first_rel_rank,
             count(*) AS n_rel_in_topk
      FROM mr_top t JOIN mr_rel r USING (doc_id)
    ),
    mr_tot AS (SELECT count(*) AS n_rel_total FROM mr_rel)
    SELECT {_TOP_K} AS k,
           CAST(n_rel_total AS BIGINT) AS n_rel_total,
           CAST(coalesce(first_rel_rank, 0) AS BIGINT) AS first_rel_rank,
           CAST(CASE WHEN first_rel_rank IS NULL THEN 0
                     ELSE 1000000 // first_rel_rank END AS BIGINT) AS mrr_micro,
           CAST(CASE WHEN n_rel_total = 0 THEN 0
                     ELSE coalesce(n_rel_in_topk, 0) * 1000000 // n_rel_total
                END AS BIGINT) AS recall_micro
    FROM mr_tot, mr_hits
    """,
    tags=("O2", "A3", "J3"),
)
def txt_mrr_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MRR@k + Recall@k of the BM25 ranking under a binary relevance
    label (docs containing ALL query terms) — the second retrieval-eval
    leg beside txt_ndcg_eval: NDCG grades the whole head, MRR grades
    time-to-first-answer, recall grades coverage; production search
    evals report all three. Same one-scorer discipline: the ranking
    under test and the SQL twin share _bm25_scored / _BM25_SQL_CTES
    verbatim, and both metrics are exact integers (micro-units via
    BIGINT floor division; rank and counts are integers already), so
    the eval itself passes the hash gate. Cost: the scorer's own plan
    plus a k-row head, a semi-join-sized relevant set, and two 1-row
    aggregates."""
    scored = _bm25_scored(spark, sf_dir).localCheckpoint(eager=False)
    top = (
        scored.orderBy(F.desc("score_q"), "doc_id")
        .limit(_TOP_K)
        .select(
            "doc_id",
            F.row_number()
            .over(W.orderBy(F.desc("score_q"), "doc_id"))
            .cast("long")
            .alias("rnk"),
        )
    )
    rel = scored.filter(F.col("n_terms_hit") == len(_QUERY_TERMS)).select("doc_id")
    hits = top.join(rel, "doc_id").agg(
        F.min("rnk").alias("first_rel_rank"),
        F.count("*").alias("n_rel_in_topk"),
    )
    tot = rel.agg(F.count("*").cast("long").alias("n_rel_total"))
    return tot.crossJoin(hits).select(
        F.lit(_TOP_K).alias("k"),
        "n_rel_total",
        F.coalesce(F.col("first_rel_rank"), F.lit(0)).cast("long").alias("first_rel_rank"),
        F.when(F.col("first_rel_rank").isNull(), F.lit(0))
        .otherwise(F.expr("1000000L div first_rel_rank"))
        .cast("long")
        .alias("mrr_micro"),
        F.when(F.col("n_rel_total") == 0, F.lit(0))
        .otherwise(F.expr("coalesce(n_rel_in_topk, 0L) * 1000000L div n_rel_total"))
        .cast("long")
        .alias("recall_micro"),
    )


# --- PMI collocation mining ------------------------------------------------
_PMI_MIN_PAIR = 5  # standard low-frequency cutoff (Church & Hanks 1990)
_PMI_TOP = 50


@query(
    "lm_pmi_collocations",
    oracle=f"""
    WITH toks AS (SELECT doc_id, {SQL_TOKENS} AS toks FROM documents),
         big AS (SELECT toks[i] AS w1, toks[i + 1] AS w2
                 FROM toks, unnest(range(1, len(toks))) AS u(i)),
         cnt AS (SELECT w1, w2, count(*) AS n_pair FROM big GROUP BY w1, w2),
         tot AS (SELECT CAST(sum(n_pair) AS BIGINT) AS n_total FROM cnt),
         marg AS (SELECT w1, w2, n_pair,
                         CAST(sum(n_pair) OVER (PARTITION BY w1) AS BIGINT) AS n_left,
                         CAST(sum(n_pair) OVER (PARTITION BY w2) AS BIGINT) AS n_right
                  FROM cnt),
         sc AS (SELECT w1, w2, CAST(n_pair AS BIGINT) AS n_pair, n_left, n_right,
                       CAST(CAST(n_pair AS HUGEINT) * 1000000 * n_total
                            // (CAST(n_left AS HUGEINT) * n_right) AS BIGINT)
                         AS pmi_ratio_scaled
                FROM marg, tot
                WHERE n_pair >= {_PMI_MIN_PAIR})
    SELECT CAST(row_number() OVER
             (ORDER BY pmi_ratio_scaled DESC, w1, w2) AS BIGINT) AS rank,
           w1, w2, n_pair, n_left, n_right, pmi_ratio_scaled
    FROM sc
    QUALIFY rank <= {_PMI_TOP}
    """,
    tags=("F7", "A1", "W3", "O2"),
)
def lm_pmi_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pointwise-mutual-information collocation mining (Church & Hanks
    1990) — rank adjacent token pairs by how much more often they occur
    together than chance: pmi = ln(P(xy) / (P(x)·P(y))). The standard
    phrase-detection pass of a tokenizer/corpus build (word2vec's phrase
    joining uses the same statistic). ln is monotone, so ranking needs no
    transcendentals: the EXACT scaled ratio n_pair·N·10^6 div
    (n_left·n_right) is a pure integer both engines floor-divide
    identically (numerator lifted to decimal(38,0)/HUGEINT so no
    intermediate overflows even at 10^13 bigrams). n_left / n_right are
    positional marginals (x as first element, y as second), derived from
    the already-counted pair table through vocabulary²-bounded windows —
    the corpus is scanned once, and after the single (w1,w2) count
    shuffle every later stage runs on count tables whose size follows
    vocabulary (Heaps' law), not data. The n_pair >= {_PMI_MIN_PAIR}
    cutoff is the classic low-frequency guard (rare pairs have unboundedly
    noisy PMI). Output: top {_PMI_TOP} by (ratio, w1, w2) — unique keys,
    fully deterministic."""
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", TOKENS().alias("toks")
    )
    n1 = F.greatest(F.size("toks") - 1, F.lit(0))
    pairs = F.zip_with(
        F.slice("toks", 1, n1),
        F.expr("slice(toks, 2, greatest(size(toks) - 1, 0))"),
        lambda x, y: F.struct(x.alias("w1"), y.alias("w2")),
    )
    cnt = (
        d.select(F.explode(pairs).alias("p"))
        .select("p.w1", "p.w2")
        .groupBy("w1", "w2")
        .agg(F.count("*").alias("n_pair"))
        # Two consumers (tot, marg) would otherwise each re-run the corpus
        # explode+count; the checkpointed pair table is vocabulary²-bounded,
        # so materializing it costs nothing at any corpus size.
        .localCheckpoint(eager=False)
    )
    tot = cnt.agg(F.sum("n_pair").cast("long").alias("n_total"))
    marg = cnt.select(
        "w1",
        "w2",
        F.col("n_pair").cast("long").alias("n_pair"),
        F.sum("n_pair").over(W.partitionBy("w1")).cast("long").alias("n_left"),
        F.sum("n_pair").over(W.partitionBy("w2")).cast("long").alias("n_right"),
    )
    sc = (
        marg.filter(F.col("n_pair") >= _PMI_MIN_PAIR)
        .crossJoin(F.broadcast(tot))
        .withColumn(
            "pmi_ratio_scaled",
            F.expr(
                "CAST((CAST(n_pair AS DECIMAL(38,0)) * 1000000 * n_total)"
                " div (CAST(n_left AS DECIMAL(38,0)) * n_right) AS BIGINT)"
            ),
        )
        .drop("n_total")
    )
    top = sc.orderBy(F.desc("pmi_ratio_scaled"), "w1", "w2").limit(_PMI_TOP)
    return top.select(
        F.row_number()
        .over(W.orderBy(F.desc("pmi_ratio_scaled"), "w1", "w2"))
        .cast("long")
        .alias("rank"),
        "w1",
        "w2",
        "n_pair",
        "n_left",
        "n_right",
        "pmi_ratio_scaled",
    )


@query(
    "quality_perplexity_buckets",
    oracle=f"""
    WITH {_PPLX_SQL_CTES},
         per_doc AS (
           SELECT s.doc_id, d.lang,
                  CAST(CAST(sum(s.lp) * 1000000 AS HUGEINT)
                       // count(*) AS BIGINT) AS mlp
           FROM scored s JOIN documents d USING (doc_id)
           GROUP BY 1, 2),
         bucketed AS (
           SELECT lang, mlp,
                  ntile(3) OVER (PARTITION BY lang ORDER BY mlp DESC, doc_id)
                    AS tercile
           FROM per_doc)
    SELECT lang,
           CASE tercile WHEN 1 THEN 'head' WHEN 2 THEN 'middle'
                ELSE 'tail' END AS bucket,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(min(mlp) AS BIGINT) AS min_mlp,
           CAST(max(mlp) AS BIGINT) AS max_mlp
    FROM bucketed
    GROUP BY 1, 2
    """,
    tags=("U2", "W4", "A7"),
)
def quality_perplexity_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style perplexity bucketing (Wenzek et al. 2020): per
    language, rank documents by mean per-bigram log-probability (the
    same add-1-smoothed bigram model as txt_perplexity_filter) and cut
    into head/middle/tail terciles — the standard web-corpus quality
    tiering that downstream mixing weights consume (head = fluent,
    tail = garbled/boilerplate). The per-doc score quantizes to an
    exact integer (sum(lp)*1e6 div n_bigrams, lp already
    decimal(18,6)-quantized per bigram) and the tercile is ntile over
    the deterministic (mlp, doc_id) order, so both engines cut
    identically even on ties.

    Scale: the count tables are vocabulary-bounded (Heaps' law); the
    per-doc reduction is one map-side-combined aggregate. The ntile
    window ranks per LANGUAGE (the corpus-scale sort CCNet itself pays
    at build time); a 100 TB deployment would swap the exact tercile
    for histogram-derived thresholds joined back — the plan downstream
    of the cut is unchanged, which is why the exact form is the one
    checked here."""
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", TOKENS().alias("toks")
    )
    scored = _scored_bigrams(d.select("doc_id", "toks"))
    per_doc = (
        scored.groupBy("doc_id")
        .agg(
            F.expr(
                "CAST(CAST(sum(lp) * 1000000 AS DECIMAL(38,0))"
                " div count(*) AS BIGINT)"
            ).alias("mlp")
        )
        .join(d.select("doc_id", "lang"), "doc_id")
    )
    bucketed = per_doc.select(
        "lang",
        "mlp",
        F.ntile(3)
        .over(W.partitionBy("lang").orderBy(F.desc("mlp"), "doc_id"))
        .alias("tercile"),
    )
    return bucketed.groupBy(
        "lang",
        F.expr(
            "CASE tercile WHEN 1 THEN 'head' WHEN 2 THEN 'middle'"
            " ELSE 'tail' END"
        ).alias("bucket"),
    ).agg(
        F.count("*").cast("long").alias("n_docs"),
        F.min("mlp").cast("long").alias("min_mlp"),
        F.max("mlp").cast("long").alias("max_mlp"),
    )


# --- Rank-biased overlap between two corpus rankings --------------------------
# RBO (Webber et al., TOIS 2010), truncated at depth D with p = 9/10,
# cleared of fractions: rbo = (1-p) * sum_d p^(d-1) * ov_d / d
#                           = NUM / (10^D * lcm(1..D))  with
# NUM = sum_d 9^(d-1) * 10^(D-d) * (lcm/d) * ov_d.  Every weight is a
# precomputed integer literal shared verbatim by both engines, so the
# score is one exact HUGEINT/decimal dot product and a floor division.
_RBO_DEPTH = 10
_RBO_LCM = 2520  # lcm(1..10)
_RBO_W = {
    d: 9 ** (d - 1) * 10 ** (_RBO_DEPTH - d) * (_RBO_LCM // d)
    for d in range(1, _RBO_DEPTH + 1)
}
_RBO_DEN = 10**_RBO_DEPTH * _RBO_LCM
_RBO_W_CASE = (
    "CASE d "
    + " ".join(f"WHEN {d} THEN {w}" for d, w in _RBO_W.items())
    + " END"
)


@query(
    "retrieval_rbo_overlap",
    oracle=f"""
    WITH r1 AS (
      SELECT doc_id, p1 FROM (
        SELECT doc_id, row_number() OVER (ORDER BY n_chars DESC, doc_id)
                 AS p1
        FROM documents) WHERE p1 <= {_RBO_DEPTH}),
    r2 AS (
      SELECT doc_id, p2 FROM (
        SELECT doc_id, row_number()
                 OVER (ORDER BY len({SQL_TOKENS}) DESC, doc_id) AS p2
        FROM documents) WHERE p2 <= {_RBO_DEPTH}),
    m AS (SELECT p1, p2 FROM r1 JOIN r2 USING (doc_id)),
    depths AS (SELECT unnest(generate_series(1, {_RBO_DEPTH})) AS d),
    ov AS (
      SELECT d,
             CAST(count(*) FILTER (WHERE p1 <= d AND p2 <= d) AS BIGINT)
               AS ov
      FROM depths LEFT JOIN m ON TRUE GROUP BY d),
    wt AS (SELECT d, ov, {_RBO_W_CASE} AS w FROM ov)
    SELECT CAST(d AS BIGINT) AS depth, ov AS n_overlap,
           CAST(ov * 1000000 // d AS BIGINT) AS agreement_ppm,
           CAST(sum(CAST(w AS HUGEINT) * ov)
                  OVER (ORDER BY d ROWS UNBOUNDED PRECEDING)
                * 1000000 // {_RBO_DEN} AS BIGINT) AS rbo_cum_ppm
    FROM wt ORDER BY d
    """,
    tags=("O2", "W3", "J3"),
)
def retrieval_rbo_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rank-biased overlap (Webber et al. 2010) between two top-10
    corpus rankings — the top-weighted, non-conjoint similarity measure
    IR teams use to answer 'did the ranker change what users actually
    see?' where Kendall/Spearman (whole-permutation, conjoint) cannot.
    Ranking A orders documents by raw length, ranking B by token count
    — two real quality signals that mostly but not perfectly agree.
    p = 0.9 truncated at depth 10, cleared of ALL fractions: each
    depth's weight 9^(d-1)*10^(10-d)*(2520/d) is a precomputed integer
    literal, so the curve (per-depth overlap, agreement ppm, cumulative
    RBO ppm) is exact integer algebra in both engines.

    Scale: each ranking is a TakeOrdered top-10 (no global sort
    materializes — Spark's orderBy+limit plans as per-partition top-k +
    a 10-row merge); everything downstream (position join, depth grid,
    weighted prefix sum) runs on <= 10-row tables."""
    d = load_table(spark, sf_dir, "documents")
    base = d.select(
        "doc_id", "n_chars", F.size(TOKENS()).alias("n_tokens")
    )
    top1 = base.orderBy(F.col("n_chars").desc(), "doc_id").limit(_RBO_DEPTH)
    top2 = base.orderBy(F.col("n_tokens").desc(), "doc_id").limit(_RBO_DEPTH)
    r1 = top1.select(
        "doc_id",
        F.row_number()
        .over(W.orderBy(F.col("n_chars").desc(), "doc_id"))
        .alias("p1"),
    )
    r2 = top2.select(
        "doc_id",
        F.row_number()
        .over(W.orderBy(F.col("n_tokens").desc(), "doc_id"))
        .alias("p2"),
    )
    m = r1.join(r2, "doc_id").select("p1", "p2")
    depths = spark.range(1, _RBO_DEPTH + 1).select(
        F.col("id").cast("int").alias("d")
    )
    ov = (
        depths.join(F.broadcast(m), F.lit(True), "left")
        .groupBy("d")
        .agg(
            F.count(F.when(F.expr("p1 <= d AND p2 <= d"), 1))
            .cast("long")
            .alias("ov")
        )
    )
    wt = ov.withColumn("w", F.expr(_RBO_W_CASE))
    wcum = W.orderBy("d").rowsBetween(W.unboundedPreceding, W.currentRow)
    return wt.select(
        F.col("d").cast("long").alias("depth"),
        F.col("ov").alias("n_overlap"),
        F.expr("CAST(ov * 1000000 div d AS BIGINT)").alias("agreement_ppm"),
        (
            F.sum(F.expr("CAST(w AS DECIMAL(38,0)) * ov")).over(wcum)
            * F.lit(1000000)
        )
        .cast("decimal(38,0)")
        .alias("_num"),
    ).select(
        "depth",
        "n_overlap",
        "agreement_ppm",
        F.expr(f"CAST(_num div {_RBO_DEN} AS BIGINT)").alias("rbo_cum_ppm"),
    ).orderBy("depth")


# --- Exposure parity of a ranking ---------------------------------------------
# Position-bias weights: round(1e6 / log2(rank+1)) for ranks 1..20,
# precomputed ONCE as integer literals shared by both engines (the RBO
# weight-table discipline) — no engine evaluates a transcendental.
_EXPO_K = 20
_EXPO_W = {
    1: 1000000, 2: 630930, 3: 500000, 4: 430677, 5: 386853, 6: 356207,
    7: 333333, 8: 315465, 9: 301030, 10: 289065, 11: 278943, 12: 270238,
    13: 262650, 14: 255958, 15: 250000, 16: 244651, 17: 239812,
    18: 235409, 19: 231378, 20: 227670,
}
_EXPO_W_CASE = (
    "CASE rk " + " ".join(f"WHEN {r} THEN {w}" for r, w in _EXPO_W.items())
    + " ELSE 0 END"
)


@query(
    "retrieval_exposure_parity",
    oracle=f"""
    WITH ranked AS (
      SELECT doc_id, lang,
             row_number() OVER (ORDER BY n_chars DESC, doc_id) AS rk
      FROM documents),
    top AS (
      SELECT lang, {_EXPO_W_CASE} AS w FROM ranked WHERE rk <= {_EXPO_K}),
    expo AS (
      SELECT lang, CAST(sum(w) AS BIGINT) AS w FROM top GROUP BY lang),
    pop AS (
      SELECT lang, CAST(count(*) AS BIGINT) AS n_docs FROM documents
      GROUP BY lang),
    tot AS (
      SELECT (SELECT sum(w) FROM expo) AS tw,
             (SELECT sum(n_docs) FROM pop) AS tn)
    SELECT p.lang, p.n_docs,
           CAST(coalesce(e.w, 0) AS BIGINT) AS exposure_weight,
           CAST(CAST(coalesce(e.w, 0) AS HUGEINT) * 1000000 // t.tw
                AS BIGINT) AS exposure_share_ppm,
           CAST(CAST(p.n_docs AS HUGEINT) * 1000000 // t.tn AS BIGINT)
             AS corpus_share_ppm,
           CAST(CAST(coalesce(e.w, 0) AS HUGEINT) * 1000000 * t.tn
                // (t.tw * p.n_docs) AS BIGINT) AS parity_ratio_ppm
    FROM pop p LEFT JOIN expo e USING (lang), tot t
    """,
    tags=("O2", "W1", "A3"),
)
def retrieval_exposure_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exposure parity audit of a ranking (Singh-Joachims 2018) — the
    ranking-fairness number NDCG cannot give: how much POSITION-BIASED
    attention each group (language) captures in the top-20 versus its
    share of the corpus. Exposure uses the standard 1/log2(1+rank)
    position bias, precomputed as the shared integer weight table, so
    the audit is exact integer algebra end to end; parity_ratio = 1e6
    means group attention exactly matches corpus share, above/below
    flags over/under-exposure (the quantity fairness-aware re-rankers
    constrain). Groups absent from the top-20 report zero exposure
    explicitly (LEFT join), never silently vanish.

    Scale: the global ranking materializes only its top-20 (TakeOrdered
    in the Spark plan); the corpus-share aggregate is map-side
    combined; everything after runs on |langs|-bounded tables."""
    d = load_table(spark, sf_dir, "documents")
    top = (
        d.select("doc_id", "lang", "n_chars")
        .orderBy(F.col("n_chars").desc(), "doc_id")
        .limit(_EXPO_K)
    )
    ranked = top.select(
        "lang",
        F.row_number()
        .over(W.orderBy(F.col("n_chars").desc(), "doc_id"))
        .alias("rk"),
    )
    # expo and pop each feed two consumers (the join and the tw/tn
    # totals): checkpoint the bounded tables so the corpus scan and the
    # top-20 sort run ONCE (review find: without this the executed plan
    # scanned documents 3x and sorted twice)
    expo = (
        ranked.select("lang", F.expr(_EXPO_W_CASE).alias("w"))
        .groupBy("lang")
        .agg(F.sum("w").cast("long").alias("w"))
        .localCheckpoint(eager=False)
    )
    pop = (
        d.groupBy("lang")
        .agg(F.count("*").cast("long").alias("n_docs"))
        .localCheckpoint(eager=False)
    )
    tw = expo.agg(F.sum("w").cast("decimal(38,0)").alias("tw"))
    tn = pop.agg(F.sum("n_docs").cast("decimal(38,0)").alias("tn"))
    return (
        pop.join(expo, "lang", "left")
        .crossJoin(F.broadcast(tw))
        .crossJoin(F.broadcast(tn))
        .select(
            "lang",
            "n_docs",
            F.coalesce(F.col("w"), F.lit(0)).cast("long").alias(
                "exposure_weight"
            ),
            F.expr(
                "CAST(CAST(coalesce(w, 0) AS DECIMAL(38,0)) * 1000000"
                " div tw AS BIGINT)"
            ).alias("exposure_share_ppm"),
            F.expr(
                "CAST(CAST(n_docs AS DECIMAL(38,0)) * 1000000 div tn"
                " AS BIGINT)"
            ).alias("corpus_share_ppm"),
            F.expr(
                "CAST(CAST(coalesce(w, 0) AS DECIMAL(38,0)) * 1000000 * tn"
                " div (tw * n_docs) AS BIGINT)"
            ).alias("parity_ratio_ppm"),
        )
    )
