"""Deterministic corpus sampling for training-data pipelines.

Beyond the reference surface (SURVEY.md §7.1 M7 scale extensions): corpus
subsetting is a first-class step in any 100-TB data-prep DAG — ablation
subsets, per-language rebalancing, held-out carve-outs. The reference's
only "sampling" is its top-N video slice (``youtube_api_handler.py:536``),
which is rank-based; these operators add the two shapes an LLM pipeline
actually needs:

1. **Hash-threshold Bernoulli sampling** (``sample_corpus_hash``) —
   ``md5(salt || key)`` compared against a fixed-width hex threshold.
   Map-only, shuffle-free, reproducible across engines and runs (no RNG
   state), and composable: the same salt always selects the same rows, a
   different salt draws an independent sample. This is the only sampling
   primitive that survives 100 TB unchanged — every row decides its own
   fate inside whole-stage codegen on the scan.

2. **Exact-k stratified sampling** (``stratified_sample``) — per stratum
   (language), take exactly ``ceil(frac * n)`` rows: the k smallest
   ``md5`` draws. A naive ``row_number() OVER (PARTITION BY lang)`` puts
   an entire stratum in one task — at 100 TB a 20-TB stratum on one
   reducer. Instead the top-k runs in two stages: a salted partial top-k
   per ``(stratum, salt)`` cell (bounded spill per task), then the final
   top-k over the ≤ salt_buckets·k survivors. Identical result to the
   single-window form (each salt cell's contribution to the global top-k
   is at most k), which is exactly what the DuckDB oracle computes.

All hashes are md5 hex compared lexicographically — fixed-width lowercase
hex order equals numeric order, and Spark/DuckDB/Python agree bytewise.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources import load_table, spread

SAMPLE_SALT = "s42:"
# 0.25 of the 32-bit hex space: md5 first 8 nibbles < 0x40000000.
SAMPLE_THRESHOLD = "40000000"
STRAT_SALT = "strat42:"
STRAT_FRAC = 0.2
STRAT_SALT_BUCKETS = 16


def _hash_key(salt: str, key):
    return F.md5(F.concat(F.lit(salt), key.cast("string")))


def salted_two_stage_topk(
    df: DataFrame,
    part_cols: list[str],
    quota_col,
    order_cols: list,
    salt_on,
    n_salts: int = STRAT_SALT_BUCKETS,
    rank_name: str = "sample_rank",
) -> DataFrame:
    """Exact per-partition top-k where no task ever holds a full
    partition: stage 1 ranks within ``(part_cols, salt)`` cells (each at
    most quota survivors), stage 2 ranks the surviving ≤ n_salts·quota
    rows per partition. Provably equal to the single-window rank because
    the global per-partition top-k is a subset of the union of per-cell
    top-ks under the same total order. Shared by ``stratified_sample``
    (strata = languages, per-stratum quota column) and
    ``clustering.cluster_balanced_sample`` (strata = learned cells,
    constant quota)."""
    # withColumn silently REPLACES a same-named column — a caller frame
    # already carrying one of the temp names (or the rank output name)
    # would have its ranking corrupted with no error. Shared
    # infrastructure fails loudly instead.
    clash = {"_salt", "_r1", rank_name}.intersection(df.columns)
    if clash:
        raise ValueError(
            "salted_two_stage_topk: input columns collide with its "
            f"temp/rank names: {sorted(clash)} — rename them or pass a "
            "different rank_name"
        )
    drawn = df.withColumn("_salt", F.pmod(salt_on, F.lit(n_salts)))
    stage1 = drawn.withColumn(
        "_r1",
        F.row_number().over(
            Window.partitionBy(*part_cols, "_salt").orderBy(*order_cols)
        ),
    ).filter(F.col("_r1") <= quota_col)
    final = Window.partitionBy(*part_cols).orderBy(*order_cols)
    return (
        stage1.withColumn(rank_name, F.row_number().over(final))
        .filter(F.col(rank_name) <= quota_col)
        .drop("_salt", "_r1")
    )


def sample_corpus_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic ~25% Bernoulli sample of ``documents``.

    Selection: ``substr(md5('s42:' || doc_id), 1, 8) < '40000000'``.
    The bucket column is kept in the output so downstream stages can
    sub-sample the sample (prefix property: a '20000000' threshold is a
    strict subset of this draw).
    """
    docs = spread(load_table(spark, sf_dir, "documents"))
    bucket = F.substring(_hash_key(SAMPLE_SALT, F.col("doc_id")), 1, 8)
    return (
        docs.withColumn("sample_bucket", bucket)
        .filter(F.col("sample_bucket") < SAMPLE_THRESHOLD)
        .select("doc_id", "lang", "source", "n_chars", "sample_bucket")
    )


ORACLE_SAMPLE_CORPUS_HASH = f"""
SELECT doc_id, lang, source, n_chars,
       substr(md5('{SAMPLE_SALT}' || CAST(doc_id AS VARCHAR)), 1, 8)
         AS sample_bucket
FROM documents
WHERE substr(md5('{SAMPLE_SALT}' || CAST(doc_id AS VARCHAR)), 1, 8)
      < '{SAMPLE_THRESHOLD}'
ORDER BY doc_id
"""


def stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact ``ceil(0.2·n)`` rows per language stratum, by smallest md5 draw.

    Two-stage top-k (see module docstring): stage 1 ranks within
    ``(lang, doc_id % 16)`` salt cells, stage 2 ranks the surviving
    ≤ 16·k rows per stratum. ``sample_rank`` is the final per-stratum
    rank — deterministic via the (hash, doc_id) sort key.
    """
    docs = spread(load_table(spark, sf_dir, "documents"))
    counts = (
        load_table(spark, sf_dir, "documents")
        .groupBy("lang")
        .agg(F.ceil(F.count("*") * F.lit(STRAT_FRAC)).alias("strat_k"))
    )
    drawn = docs.select(
        "doc_id",
        "lang",
        _hash_key(STRAT_SALT, F.col("doc_id")).alias("strat_key"),
    ).join(F.broadcast(counts), "lang")
    return salted_two_stage_topk(
        drawn,
        ["lang"],
        F.col("strat_k"),
        [F.col("strat_key").asc(), F.col("doc_id").asc()],
        salt_on=F.col("doc_id"),
    ).select("doc_id", "lang", "strat_key", "sample_rank")


ORACLE_STRATIFIED_SAMPLE = f"""
WITH k AS (
  SELECT lang, CAST(CEIL(COUNT(*) * {STRAT_FRAC}) AS BIGINT) AS strat_k
  FROM documents GROUP BY lang
),
drawn AS (
  SELECT d.doc_id, d.lang,
         md5('{STRAT_SALT}' || CAST(d.doc_id AS VARCHAR)) AS strat_key,
         k.strat_k
  FROM documents d JOIN k USING (lang)
),
ranked AS (
  SELECT doc_id, lang, strat_key, strat_k,
         ROW_NUMBER() OVER (
           PARTITION BY lang ORDER BY strat_key, doc_id) AS sample_rank
  FROM drawn
)
SELECT doc_id, lang, strat_key, sample_rank
FROM ranked WHERE sample_rank <= strat_k
ORDER BY lang, sample_rank
"""


MIX_SALT = "mix42:"
MIX_C = 12.0
_HASH_SCALE = 4294967296.0  # 2^32: exact power-of-two scale on doubles

# DuckDB-side hex→int (same fold as chunking.oracle_split_by_hash): DuckDB
# has no conv(); fold the 8 hex nibbles explicitly.
def _oracle_hex_int(expr: str) -> str:
    return f"""list_reduce(
           list_transform(
             string_split_regex({expr}, ''),
             c -> CAST(strpos('0123456789abcdef', c) - 1 AS BIGINT)
           ),
           (a, x) -> a * 16 + x
         )"""


def mixture_temperature_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-rebalanced language mixture (α = 0.5) over ``documents``.

    Multilingual-LM sampling flattens the raw language distribution by
    drawing stratum *i* with probability ∝ n_i^α (Conneau & Lample 2019,
    XLM; Devlin 2019 multilingual BERT, both α ≈ 0.5–0.7). Selecting each
    row with rate ``min(1, C / sqrt(n_i))`` realises exactly that: the
    expected stratum sample is ``C·sqrt(n_i)`` — head languages are
    down-sampled, tail languages kept (the cap) — without the global
    normalisation sum, whose float addition order would differ between
    engines.

    Cross-engine determinism is by construction, not by rounding: sqrt and
    division are IEEE correctly-rounded in both Spark and DuckDB, the 2^32
    scale is an exact exponent shift, and floor/least are exact — so the
    per-stratum integer threshold is bit-identical, and acceptance compares
    integers, never floats. Each row decides its own fate from
    ``md5(salt‖doc_id)`` inside whole-stage codegen on the scan; the only
    shuffle is the 5-row stratum count, broadcast back. That is the shape
    that survives 100 TB: one tiny agg + a map-only filter.
    """
    return temperature_sample(
        spread(load_table(spark, sf_dir, "documents")),
        # counts leg reads the un-spread scan: partial agg on the scan +
        # one tiny exchange, never a full-corpus round-robin repartition
        counts_from=load_table(spark, sf_dir, "documents"),
    )


def temperature_sample(
    docs: DataFrame,
    stratum_col: str = "lang",
    c: float = MIX_C,
    counts_from: DataFrame | None = None,
) -> DataFrame:
    """Core of ``mixture_temperature_sample`` over any frame with
    ``doc_id`` and a stratum column — see the query docstring.

    ``counts_from`` optionally supplies a cheaper scan for the stratum
    counts (the gate query passes the un-spread table so the counts leg
    skips the corpus repartition that ``spread`` adds for compute
    parallelism on the map side)."""
    counts = (counts_from if counts_from is not None else docs).groupBy(
        stratum_col
    ).agg(F.count("*").alias("n_docs"))
    plan = counts.select(
        stratum_col,
        "n_docs",
        F.floor(
            F.least(F.lit(1.0), F.lit(c) / F.sqrt(F.col("n_docs")))
            * F.lit(_HASH_SCALE)
        )
        .cast("long")
        .alias("mix_threshold"),
    )
    drawn = docs.select(
        "doc_id",
        stratum_col,
        F.conv(F.substring(_hash_key(MIX_SALT, F.col("doc_id")), 1, 8), 16, 10)
        .cast("long")
        .alias("mix_draw"),
    )
    return (
        drawn.join(F.broadcast(plan), stratum_col)
        .filter(F.col("mix_draw") < F.col("mix_threshold"))
        .select("doc_id", stratum_col, "mix_draw", "mix_threshold")
    )


ORACLE_MIXTURE_TEMPERATURE_SAMPLE = f"""
WITH k AS (
  SELECT lang, COUNT(*) AS n_docs,
         CAST(FLOOR(LEAST(1.0, {MIX_C} / sqrt(COUNT(*))) * {_HASH_SCALE})
              AS BIGINT) AS mix_threshold
  FROM documents GROUP BY lang
),
d AS (
  SELECT doc_id, lang,
         {_oracle_hex_int(f"substr(md5('{MIX_SALT}' || CAST(doc_id AS VARCHAR)), 1, 8)")}
           AS mix_draw
  FROM documents
)
SELECT doc_id, lang, mix_draw, mix_threshold
FROM d JOIN k USING (lang)
WHERE mix_draw < mix_threshold
ORDER BY doc_id
"""


SHARD_SALT = "shard42:"
N_SHARDS = 8


def shard_id_col(doc_id=None):
    """THE shard-assignment expression — single definition shared by
    ``global_shuffle_shards`` and the export manifest, so the manifest
    always describes the shards the writer actually produces."""
    key = F.col("doc_id") if doc_id is None else doc_id
    return F.pmod(
        F.conv(F.substring(_hash_key(SHARD_SALT, key), 1, 8), 16, 10).cast(
            "long"
        ),
        F.lit(N_SHARDS),
    )


def oracle_shard_id_expr() -> str:
    """DuckDB twin of ``shard_id_col`` (same single-definition contract)."""
    return (
        _oracle_hex_int(
            f"substr(md5('{SHARD_SALT}' || CAST(doc_id AS VARCHAR)), 1, 8)"
        )
        + f" % {N_SHARDS}"
    )


def global_shuffle_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic global shuffle + shard assignment for training export.

    Training ingest wants the corpus in N balanced shards with a
    reproducible pseudo-random row order *inside* each shard (sequential
    readers then see an unbiased sample stream). Both come from one hash:
    ``shard_id = hash(doc_id) mod N`` balances shards (binomial deviation
    only), and ranking by the full md5 digest within the shard is the
    shuffle — no RNG state, so re-runs, retries, and engine migrations
    produce byte-identical shards.

    Scale shape: the per-shard ``row_number`` window is how the *plan* is
    attested here; the production writer never materialises a global rank —
    it runs ``df.repartition(N, shard_id).sortWithinPartitions(shuffle_key)
    .write.partitionBy(...)`` (see ``tests/test_spans_mixture.py``'s write
    round-trip), which is exactly one hash shuffle + a per-partition sort.
    Each shard sorts independently; no global sort, no single-reducer
    bottleneck.
    """
    docs = spread(load_table(spark, sf_dir, "documents"))
    keyed = docs.select(
        "doc_id",
        _hash_key(SHARD_SALT, F.col("doc_id")).alias("shuffle_key"),
        shard_id_col().alias("shard_id"),
    )
    w = Window.partitionBy("shard_id").orderBy("shuffle_key", "doc_id")
    return keyed.withColumn(
        "shard_pos", F.row_number().over(w).cast("long")
    ).select("doc_id", "shard_id", "shard_pos", "shuffle_key")


ORACLE_GLOBAL_SHUFFLE_SHARDS = f"""
WITH keyed AS (
  SELECT doc_id,
         md5('{SHARD_SALT}' || CAST(doc_id AS VARCHAR)) AS shuffle_key,
         {oracle_shard_id_expr()} AS shard_id
  FROM documents
)
SELECT doc_id, shard_id,
       CAST(ROW_NUMBER() OVER (
         PARTITION BY shard_id ORDER BY shuffle_key, doc_id) AS BIGINT)
         AS shard_pos,
       shuffle_key
FROM keyed
ORDER BY shard_id, shard_pos
"""


BUDGET_PERMILLE = 600


def token_budget_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Waterfilling token-budget allocation across sources.

    The mixture-design primitive: given per-source capacities (token
    counts) and a global training budget B (here 60% of the corpus),
    find the water level T such that every source contributes
    ``min(capacity, T)`` and the total is exactly B — small sources keep
    everything, large sources are clipped to the common level, and the
    integer remainder goes to the lexicographically-smallest clipped
    sources (one extra token each), so the allocation is exact and
    deterministic. All arithmetic is integer (DIV/MOD), so Spark and
    DuckDB agree bit-for-bit.

    Scale shape: capacities are one map-side-combined aggregate over the
    corpus; the waterfill itself runs windows over the *source* table —
    tens to thousands of rows — so the "global" sort is over an
    aggregate-tiny frame, never the corpus.

    Closed form: with sources sorted by (capacity, source) and
    ``prefix`` = capacity sum strictly before row j of n, the candidate
    level is ``t_j = (B - prefix) DIV (n - j + 1)``; row j is fully
    funded iff ``capacity <= t_j``, and the first unfunded row fixes the
    final level and remainder.
    """
    docs = load_table(spark, sf_dir, "documents")
    caps = docs.groupBy("source").agg(
        F.sum("n_chars").alias("capacity")
    )
    return waterfill(caps)


def waterfill(caps: DataFrame, budget_permille: int = BUDGET_PERMILLE) -> DataFrame:
    """Core waterfill over a (source, capacity) frame — see
    ``token_budget_allocation``."""
    w_all = Window.partitionBy()
    w_ord = Window.partitionBy().orderBy("capacity", "source")
    staged = (
        caps.withColumn(
            "_budget",
            F.expr(f"(sum(capacity) OVER () * {budget_permille}) DIV 1000"),
        )
        .withColumn("_j", F.row_number().over(w_ord))
        .withColumn("_n", F.count("*").over(w_all))
        .withColumn(
            "_prefix",
            F.coalesce(
                F.sum("capacity").over(
                    w_ord.rowsBetween(Window.unboundedPreceding, -1)
                ),
                F.lit(0),
            ),
        )
        .withColumn(
            "_t", F.expr("(_budget - _prefix) DIV (_n - _j + 1)")
        )
        .withColumn("funded", F.col("capacity") <= F.col("_t"))
    )
    resolved = (
        staged.withColumn(
            "_jstar",
            F.min(F.when(~F.col("funded"), F.col("_j"))).over(w_all),
        )
        .withColumn(
            "_level",
            F.max(F.when(F.col("_j") == F.col("_jstar"), F.col("_t"))).over(
                w_all
            ),
        )
        .withColumn(
            "_rem",
            F.max(
                F.when(
                    F.col("_j") == F.col("_jstar"),
                    F.expr("(_budget - _prefix) % (_n - _j + 1)"),
                )
            ).over(w_all),
        )
        .withColumn(
            "_ru",
            F.row_number().over(
                Window.partitionBy("funded").orderBy("source")
            ),
        )
    )
    return resolved.select(
        "source",
        "capacity",
        F.when(F.col("funded"), F.col("capacity"))
        .otherwise(
            F.col("_level")
            + F.when(F.col("_ru") <= F.col("_rem"), 1).otherwise(0)
        )
        .cast("long")
        .alias("allocation"),
        "funded",
        F.col("_budget").alias("budget_total"),
    )


ORACLE_TOKEN_BUDGET_ALLOCATION = f"""
WITH caps AS (
  SELECT source, CAST(SUM(n_chars) AS BIGINT) AS capacity
  FROM documents GROUP BY source
),
staged AS (
  SELECT source, capacity,
         (SUM(capacity) OVER () * {BUDGET_PERMILLE}) // 1000 AS budget,
         ROW_NUMBER() OVER w AS j,
         COUNT(*) OVER () AS n,
         COALESCE(SUM(capacity) OVER (
           ORDER BY capacity, source
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS prefix
  FROM caps
  WINDOW w AS (ORDER BY capacity, source)
),
lvl AS (
  SELECT *, (budget - prefix) // (n - j + 1) AS t,
         capacity <= (budget - prefix) // (n - j + 1) AS funded
  FROM staged
),
r1 AS (
  SELECT *, MIN(CASE WHEN NOT funded THEN j END) OVER () AS jstar
  FROM lvl
),
resolved AS (
  SELECT *,
         MAX(CASE WHEN j = jstar THEN t END) OVER () AS level,
         MAX(CASE WHEN j = jstar
                  THEN (budget - prefix) % (n - j + 1) END) OVER () AS rem,
         ROW_NUMBER() OVER (PARTITION BY funded ORDER BY source) AS ru
  FROM r1
)
SELECT source, capacity,
       CAST(CASE WHEN funded THEN capacity
                 ELSE level + CASE WHEN ru <= rem THEN 1 ELSE 0 END
            END AS BIGINT) AS allocation,
       funded,
       CAST(budget AS BIGINT) AS budget_total
FROM resolved
ORDER BY source
"""


DSIR_SALT = "dsir42:"
DSIR_DRAW_SALT = "dsirdraw42:"
DSIR_BUCKETS = 1024
DSIR_TARGET_LANG = "en"
_DRAW_SPACE = 4294967296  # 2^32: the md5-8-nibble draw space


def dsir_importance_weights(
    spark: SparkSession,
    sf_dir: str,
    n_hash_buckets: int = DSIR_BUCKETS,
    target_lang: str = DSIR_TARGET_LANG,
    checkpoint: bool = True,
) -> DataFrame:
    """Data Selection via Importance Resampling over hashed unigram
    features (Xie et al. 2023, DSIR): fit a 'raw' feature distribution on
    the whole corpus and a 'target' distribution on the target domain
    (here: ``lang = 'en'`` documents), then weight every document by how
    target-like its features are, and RESAMPLE: each doc is kept with
    probability ``weight / max_weight`` via a deterministic md5 draw
    (the paper samples ∝ weight; this is the same acceptance law with
    the normalizer replaced by the exact maximum, keeping every
    quantity integer).

    Transcendental-free analog of DSIR's log-likelihood ratio, same
    policy as ``bigram_lm_quality``'s mean-of-probs: per hash bucket the
    Laplace-smoothed probability ratio in ppm,

        ratio_ppm(b) = round(1e6 · (ct_b+1)(Nr+B) / ((cr_b+1)(Nt+B))),

    a BIGINT; the per-document weight is the count-weighted integer MEAN
    of its buckets' ratios (``SUM(cnt·ratio) DIV SUM(cnt)``) — every
    comparison and aggregate after the one rounding is integer-exact, so
    the ordering is deterministic across engines and partitionings
    (DSIR's sum-of-logs ordering differs, but monotone dominance in the
    common case is preserved; the smoothing exactly mirrors the paper).

    Scale shape: tokenize+hash is map-side (md5→conv, the repo-wide
    cross-engine hash); the (doc, bucket) aggregate is ONE corpus shuffle
    with map-side partials onto at most n_docs·B rows; the bucket stats
    table is ≤ B = 1024 rows — broadcast, fitted in the same
    pass shape as tfidf's df; the final per-doc rollup is the second and
    last corpus shuffle. Nothing is vocabulary- or pair-expanded. Docs
    with zero tokens have no features and are absent (same contract as
    the bigram LM's <2-token exclusion).
    """
    docs = spread(load_table(spark, sf_dir, "documents"))
    from .memo import session_frame
    from .ranking import _tokens

    bucket = (
        F.conv(
            F.substring(_hash_key(DSIR_SALT, F.col("term")), 1, 8), 16, 10
        ).cast("long")
        % n_hash_buckets
    )

    def _build_doc_bucket() -> DataFrame:
        feats = docs.select(
            "doc_id", "lang", F.explode(_tokens()).alias("term")
        ).select("doc_id", "lang", bucket.alias("bucket"))
        return feats.groupBy("doc_id", "lang", "bucket").agg(
            F.count("*").alias("cnt")
        )

    # ONE corpus aggregation at (doc, bucket) grain; the bucket stats roll
    # up FROM it (cr = Σ cnt, ct = Σ cnt over target-lang docs) — the same
    # agg-of-agg idiom as ranking's cu-from-cb. The frame is CHECKPOINTED
    # (and session-memoized — it is the DSIR featurization, a fitted
    # artifact independent of the target domain): before round 7 the
    # "runs once" claim held only through AQE runtime exchange reuse —
    # the static plan embedded this subtree six times across the
    # stats/totals/ratios broadcast branches, and with
    # spark.sql.adaptive.enabled=false the corpus pipeline executed
    # several times (round-6 advice). A checkpoint leaf makes the claim
    # structural, not optimizer-dependent; test_plan_shape pins it.
    if checkpoint:
        doc_bucket = session_frame(
            spark,
            sf_dir,
            f"dsir_doc_bucket_{n_hash_buckets}",
            _build_doc_bucket,
        )
    else:  # plan-shape tests inspect the raw inner chain
        doc_bucket = _build_doc_bucket()
    stats = doc_bucket.groupBy("bucket").agg(
        F.sum("cnt").alias("cr"),
        F.sum(
            F.when(F.col("lang") == target_lang, F.col("cnt")).otherwise(
                F.lit(0)
            )
        ).alias("ct"),
    )
    totals = stats.agg(F.sum("cr").alias("nr"), F.sum("ct").alias("nt"))
    b = float(n_hash_buckets)
    ratios = (
        stats.join(F.broadcast(totals))
        .select(
            "bucket",
            F.round(
                (F.col("ct") + F.lit(1.0))
                * (F.col("nr") + F.lit(b))
                * F.lit(1000000.0)
                / ((F.col("cr") + F.lit(1.0)) * (F.col("nt") + F.lit(b)))
            )
            .cast("long")
            .alias("ratio_ppm"),
        )
    )
    # lazily checkpoint the weights: the max-weight normalizer below is a
    # broadcast whose subtree would otherwise RE-EXECUTE the whole
    # tokenize → doc-bucket → ratio-join → rollup chain a second time per
    # run (the same shared-subtree contract as perplexity_buckets' scored
    # checkpoint — and why this query sits in the registry's
    # _PLAN_CACHE_SKIP)
    weights = _dsir_weight_rollup(
        doc_bucket.join(F.broadcast(ratios), "bucket")
    )
    if checkpoint:  # False only for plan-shape tests of the inner chain
        weights = weights.localCheckpoint(eager=False)
    # The RESAMPLING step that gives DSIR its name: accept each doc with
    # probability weight/max_weight via a deterministic md5 draw —
    # integer-exact (decimal products, never a float division), so the
    # accept/reject boundary is bit-identical across engines. Expected
    # sample rate = mean(w)/max(w); the top-weighted docs are certain.
    wmax = weights.agg(F.max("avg_ratio_ppm").alias("wmax"))
    draw = F.conv(
        F.substring(_hash_key(DSIR_DRAW_SALT, F.col("doc_id")), 1, 8), 16, 10
    ).cast("long")
    return (
        weights.join(F.broadcast(wmax))
        .withColumn("_draw", draw)
        .select(
            "doc_id",
            "n_tokens",
            "avg_ratio_ppm",
            (
                F.col("_draw").cast("decimal(20,0)")
                * F.col("wmax").cast("decimal(20,0)")
                < F.col("avg_ratio_ppm").cast("decimal(20,0)")
                * F.lit(_DRAW_SPACE).cast("decimal(20,0)")
            ).alias("selected"),
        )
    )


def _dsir_weight_rollup(joined: DataFrame) -> DataFrame:
    """Per-doc weight mean over a ``(doc_id, cnt, ratio_ppm)`` frame.

    Weight accumulation is exact decimals: at extreme target rarity
    ``ratio_ppm`` reaches ~1e17, so an int64 Σ cnt·ratio would silently
    wrap on Spark (ANSI off) while the DuckDB twin throws —
    decimal(38,0) products/sums are exact to 1e38 on both engines (the
    twin uses HUGEINT), bit-identical to the int64 path wherever that
    path doesn't overflow. The ``DIV`` quotient itself is a long: exact
    because the mean is bounded by max(ratio_ppm) ≈ 1e6·Nr/B, which
    stays under 2^63 for corpora up to ~10^16 tokens (pinned with
    beyond-int64 accumulators in tests/test_sampling_ranking.py)."""
    return (
        joined.groupBy("doc_id")
        .agg(
            F.sum("cnt").alias("n_tokens"),
            F.sum(
                F.col("cnt").cast("decimal(19,0)")
                * F.col("ratio_ppm").cast("decimal(19,0)")
            ).alias("_w"),
        )
        .select(
            "doc_id",
            "n_tokens",
            F.expr("_w DIV n_tokens").alias("avg_ratio_ppm"),
        )
    )


def oracle_dsir_importance_weights(
    n_hash_buckets: int = DSIR_BUCKETS, target_lang: str = DSIR_TARGET_LANG
) -> str:
    from .ranking import TOKEN_SPLIT_RE

    hex_int = _oracle_hex_int(
        f"substr(md5('{DSIR_SALT}' || term), 1, 8)"
    )
    return f"""
WITH toks AS (
  SELECT doc_id, lang,
         unnest(list_filter(
           regexp_split_to_array(lower(coalesce(text, '')), '{TOKEN_SPLIT_RE}'),
           t -> t <> '')) AS term
  FROM documents
),
feats AS (
  SELECT doc_id, lang, {hex_int} % {n_hash_buckets} AS bucket FROM toks
),
doc_bucket AS (
  SELECT doc_id, lang, bucket, COUNT(*) AS cnt FROM feats GROUP BY 1, 2, 3
),
stats AS (
  SELECT bucket, CAST(SUM(cnt) AS BIGINT) AS cr,
         CAST(SUM(CASE WHEN lang = '{target_lang}' THEN cnt ELSE 0 END)
              AS BIGINT) AS ct
  FROM doc_bucket GROUP BY 1
),
tot AS (
  SELECT CAST(SUM(cr) AS BIGINT) AS nr, CAST(SUM(ct) AS BIGINT) AS nt
  FROM stats
),
ratios AS (
  SELECT bucket,
         CAST(ROUND((ct + 1.0) * (nr + {float(n_hash_buckets)}) * 1000000.0
                    / ((cr + 1.0) * (nt + {float(n_hash_buckets)})))
              AS BIGINT) AS ratio_ppm
  FROM stats, tot
)
,
weights AS (
  SELECT db.doc_id,
         CAST(SUM(db.cnt) AS BIGINT) AS n_tokens,
         CAST(SUM(CAST(db.cnt AS HUGEINT) * r.ratio_ppm) // SUM(db.cnt)
              AS BIGINT) AS avg_ratio_ppm
  FROM doc_bucket db JOIN ratios r USING (bucket)
  GROUP BY db.doc_id
),
wm AS (SELECT MAX(avg_ratio_ppm) AS wmax FROM weights)
SELECT doc_id, n_tokens, avg_ratio_ppm,
       CAST({_oracle_hex_int(f"substr(md5('{DSIR_DRAW_SALT}' || CAST(doc_id AS VARCHAR)), 1, 8)")} AS HUGEINT)
         * wmax
       < CAST(avg_ratio_ppm AS HUGEINT) * {_DRAW_SPACE} AS selected
FROM weights, wm
ORDER BY doc_id
"""


ORACLE_DSIR_IMPORTANCE_WEIGHTS = oracle_dsir_importance_weights()


QUERIES = {
    "corpus_sample_hash": sample_corpus_hash,
    "stratified_sample": stratified_sample,
    "mixture_temperature_sample": mixture_temperature_sample,
    "global_shuffle_shards": global_shuffle_shards,
    "token_budget_allocation": token_budget_allocation,
    "dsir_importance_weights": dsir_importance_weights,
}

ORACLES = {
    "corpus_sample_hash": ORACLE_SAMPLE_CORPUS_HASH,
    "stratified_sample": ORACLE_STRATIFIED_SAMPLE,
    "mixture_temperature_sample": ORACLE_MIXTURE_TEMPERATURE_SAMPLE,
    "global_shuffle_shards": ORACLE_GLOBAL_SHUFFLE_SHARDS,
    "token_budget_allocation": ORACLE_TOKEN_BUDGET_ALLOCATION,
    "dsir_importance_weights": ORACLE_DSIR_IMPORTANCE_WEIGHTS,
}
