"""Corpus sampling, splitting, and packing — the deterministic
selection operators a training-data pipeline runs between dedup and
tokenization. All three are hash/window-deterministic (no RNG), so the
same corpus always yields the same split/sample/packing on any cluster
size and any execution order — a reproducibility property `rand()`-
based sampling cannot give, and the reason every serious pipeline
derives selection from content hashes.

The reference delegates all consumer-side processing (README.md:30-32);
these are part of the north-star LLM-pipeline surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# 16 hex buckets from the first md5 nibble -> split label. md5 is
# identical across engines (lowercase hex) which makes the assignment
# oracle-checkable; 12/2/2 nibbles ~ 75/12.5/12.5.
_TRAIN_NIBBLES = tuple("0123456789ab")
_VAL_NIBBLES = ("c", "d")


def split_key(id_col: str, salt: str = "v1") -> F.Column:
    """Stable content hash driving split/sample decisions. Salted so a
    pipeline can re-split by bumping the salt without touching data."""
    return F.md5(F.concat_ws("|", F.lit(salt), F.col(id_col).cast("string")))


def hash_split(df: DataFrame, id_col: str, salt: str = "v1") -> DataFrame:
    """Assign every row a deterministic train/val/test label.

    Scale: a narrow projection — no shuffle, no state, trivially
    parallel. The hash keys the decision to the ROW, so re-runs,
    retries, and cluster changes never flip an assignment.
    """
    nib = F.substring(split_key(id_col, salt), 1, 1)
    return df.withColumn(
        "split",
        F.when(nib.isin(*_TRAIN_NIBBLES), "train")
        .when(nib.isin(*_VAL_NIBBLES), "val")
        .otherwise("test"),
    )


def sql_hash_split(id_col: str, salt: str = "v1") -> str:
    """DuckDB expression equivalent of :func:`hash_split`'s label."""
    key = f"md5(concat_ws('|', '{salt}', CAST({id_col} AS VARCHAR)))"
    train = ", ".join(f"'{c}'" for c in _TRAIN_NIBBLES)
    val = ", ".join(f"'{c}'" for c in _VAL_NIBBLES)
    return (
        f"CASE WHEN substring({key}, 1, 1) IN ({train}) THEN 'train' "
        f"WHEN substring({key}, 1, 1) IN ({val}) THEN 'val' "
        f"ELSE 'test' END"
    )


def stratified_sample(
    df: DataFrame, stratum: str, id_col: str, n_per_stratum: int, salt: str = "v1"
) -> DataFrame:
    """Exactly-n-per-stratum deterministic sample: rank rows within
    each stratum by content hash (uniform pseudo-order) and keep the
    first n. Unlike ``sampleBy`` this is exact (not binomial) and
    reproducible bit-for-bit.

    Scale: one shuffle on the stratum key. With few large strata the
    window sort is the cost — at warehouse scale swap the window for
    the groupBy + ``min_by(array, n)`` top-n pattern or pre-filter by
    a hash-threshold first pass (keep ~2n by range, then rank).
    """
    w = Window.partitionBy(stratum).orderBy(split_key(id_col, salt), id_col)
    return (
        df.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= n_per_stratum)
        .drop("_rk")
    )


def negative_sample_pairs(
    df: DataFrame,
    id_col: str,
    k: int = 3,
    salt: str = "v1",
) -> DataFrame:
    """Deterministic negative sampling for contrastive training: give
    every row ``k`` pseudo-random partners via a hash ring — bucket
    rows by their first md5 hex pair (256 buckets), order each bucket
    by content hash, and pair row r with rows r+1..r+k cyclically.
    Hash order is uniform, so partners are as good as random draws,
    but the pairing is a pure function of (corpus, salt): re-runs,
    retries, and cluster-size changes reproduce it bit-for-bit, and a
    bumped salt redraws it.

    Scale: the window sorts run per bucket (256-way parallel, no
    global sort), the partner join is an equi-join on
    (bucket, rank) — two shuffles total, both on keys Catalyst
    hash-partitions freely. Raise the bucket-prefix length for more
    parallelism at corpus scale.

    Returns ``(id, neg_id, j)``, j = 1..k; self-pairs (buckets with
    <= j rows) are dropped.
    """
    d = df.select(
        F.col(id_col).alias("_id"), split_key(id_col, salt).alias("_h")
    ).withColumn("_b", F.substring("_h", 1, 2))
    w = Window.partitionBy("_b").orderBy("_h", "_id")
    ranked = d.withColumn("rn", F.row_number().over(w)).withColumn(
        "cnt", F.count("*").over(Window.partitionBy("_b"))
    )
    # j runs to min(k, cnt-1): a bucket smaller than k+1 cannot supply
    # k DISTINCT partners, and letting j wrap the ring again would
    # emit the same (id, neg_id) under two j values — silent duplicate
    # negatives for the contrastive consumer
    withj = ranked.select(
        "_id",
        "_b",
        "rn",
        "cnt",
        F.explode(
            F.expr(f"sequence(1, least({k}, cnt - 1))")
        ).alias("j"),
    ).withColumn("prn", (F.col("rn") - 1 + F.col("j")) % F.col("cnt") + 1)
    partners = ranked.select(
        F.col("_b").alias("_b2"),
        F.col("rn").alias("prn2"),
        F.col("_id").alias("neg_id"),
    )
    return (
        withj.join(
            partners,
            (F.col("_b") == F.col("_b2")) & (F.col("prn") == F.col("prn2")),
        )
        .filter(F.col("neg_id") != F.col("_id"))
        .select(F.col("_id").alias("id"), "neg_id", "j")
    )


def sql_negative_sample_pairs(
    table: str, id_col: str, k: int = 3, salt: str = "v1"
) -> str:
    """DuckDB twin of :func:`negative_sample_pairs`."""
    return f"""
WITH d AS (
  SELECT {id_col} AS id,
         md5(concat_ws('|', '{salt}', CAST({id_col} AS VARCHAR))) AS h
  FROM {table}
),
ranked AS (
  SELECT id, substr(h, 1, 2) AS b,
         ROW_NUMBER() OVER (PARTITION BY substr(h, 1, 2) ORDER BY h, id) AS rn,
         COUNT(*) OVER (PARTITION BY substr(h, 1, 2)) AS cnt
  FROM d
),
withj AS (
  SELECT id, b, rn, cnt, j
  FROM ranked,
       LATERAL (SELECT unnest(generate_series(1, least({k}, CAST(cnt AS INT) - 1))) AS j)
)
SELECT w.id AS id, p.id AS neg_id, w.j AS j
FROM withj w
JOIN ranked p
  ON p.b = w.b AND p.rn = (w.rn - 1 + w.j) % w.cnt + 1
WHERE p.id <> w.id
"""


def sequence_pack(
    df: DataFrame,
    stratum: str,
    order_col: str,
    size_col: str,
    budget: int,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """GPT-style concat-and-chunk packing: documents are concatenated
    in a fixed deterministic order within each stratum and cut every
    ``budget`` units; a document's ``bin`` is the chunk its first unit
    lands in (docs may straddle bins, exactly as pretraining packing
    lets sequences straddle context windows).

    Implemented as an exclusive running sum (window, ROWS UNBOUNDED
    PRECEDING .. 1 PRECEDING) -> ``bin = floor(offset / budget)``.

    Scale: one shuffle on the stratum; within a stratum the running
    sum is a linear scan. Strata (source shards) bound partition size;
    a single giant stratum would need range-partitioned prefix sums —
    at that point pack per shard-of-stratum, which changes nothing
    downstream since bins are already per-stratum.
    """
    # determinism requires a TOTAL order inside the stratum: pass a
    # unique order_col (all in-repo callers use doc_id) or supply
    # tiebreak_col — with ties and no tiebreak, pack_offset at the tie
    # depends on shuffle arrival order and the bit-stability contract
    # is void
    order = [order_col] + ([tiebreak_col] if tiebreak_col else [])
    w = (
        Window.partitionBy(stratum)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offset = F.coalesce(F.sum(size_col).over(w), F.lit(0)).cast("long")
    return df.withColumn("pack_offset", offset).withColumn(
        "bin", F.floor(F.col("pack_offset") / F.lit(budget)).cast("long")
    )


_SHUFFLE_BUCKETS = 256  # first md5 byte — fixed by the bucketing expr


def global_shuffle_index(
    df: DataFrame, id_col: str, salt: str = "v1"
) -> DataFrame:
    """Deterministic global shuffle order for training-data emission:
    every row gets a dense position ``pos`` in [0, n) ordered by a
    salted content hash — the "shuffle once, read sequentially"
    discipline pretraining loaders rely on, reproducible on any
    cluster size and re-saltable per epoch.

    Scale path (NO global window, NO single-partition sort): the hash's
    first byte range-buckets rows into 256 ordered buckets;
    per-bucket counts (256 small ints — driver-safe at any data
    scale) prefix-sum into bucket base offsets, broadcast back; each
    bucket independently ranks by (hash, id) and adds its base. The
    global sort becomes n_buckets independent partition-local sorts —
    the same two-phase shape as Spark's own range-partitioned orderBy,
    but with deterministic hash-derived boundaries instead of sampled
    ones, so positions are bit-stable across runs and cluster layouts.
    """
    from bottledwater_pg_spark.session import persist_tracked

    h = split_key(id_col, salt)
    # persisted: the bucketed frame feeds the driver-side count
    # collect AND the final ranked output — without this the whole
    # upstream pipeline (these run after dedup/filter stages) computes
    # twice, and a nondeterministic upstream would break the dense-
    # permutation property between the two passes
    bucketed = persist_tracked(
        df.withColumn("_h", h).withColumn(
            "_bkt", F.conv(F.substring("_h", 1, 2), 16, 10).cast("int")
        )
    )
    counts = {
        r["_bkt"]: r["c"]
        for r in bucketed.groupBy("_bkt").agg(F.count("*").alias("c")).collect()
    }
    bases, acc = {}, 0
    for b in range(_SHUFFLE_BUCKETS):
        bases[b] = acc
        acc += counts.get(b, 0)
    base_df = df.sparkSession.createDataFrame(
        [(b, bases[b]) for b in range(_SHUFFLE_BUCKETS)], "_bkt int, _base long"
    )
    w = Window.partitionBy("_bkt").orderBy("_h", id_col)
    return (
        bucketed.join(F.broadcast(base_df), "_bkt")
        .withColumn(
            "pos", (F.col("_base") + F.row_number().over(w) - 1).cast("long")
        )
        .drop("_h", "_bkt", "_base")
    )


def sql_global_shuffle_positions(id_col: str, salt: str = "v1") -> str:
    """Oracle fragment: the dense global rank the two-phase plan must
    reproduce exactly."""
    return (
        f"CAST(ROW_NUMBER() OVER (ORDER BY md5('{salt}' || '|' || "
        f"CAST({id_col} AS VARCHAR)), {id_col}) - 1 AS BIGINT)"
    )


def budget_mix(
    df: DataFrame,
    stratum: str,
    id_col: str,
    size_col: str,
    budget: int,
    salt: str = "v1",
) -> DataFrame:
    """Deterministic data-mixture construction: within each stratum
    (source shard), take documents in salted-content-hash order until
    the stratum's cumulative size reaches ``budget`` units — the
    "sample X tokens per source" step that turns per-source corpora
    into a pretraining mixture. Greedy-by-hash makes the selection a
    pure function of (corpus, salt): re-runs, retries, and cluster
    changes keep the mixture identical, and bumping the salt redraws
    it.

    The cut rule uses the EXCLUSIVE prefix sum (a doc is kept iff the
    size already taken before it is < budget), so exactly one doc
    straddles the boundary — same discipline as :func:`sequence_pack`.

    Scale: one shuffle on the stratum; the running sum is a linear
    per-stratum scan. Keeps/filters are decided row-locally from the
    window result — no driver involvement, no collect.
    """
    w = (
        Window.partitionBy(stratum)
        .orderBy(split_key(id_col, salt), id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    taken_before = F.coalesce(F.sum(size_col).over(w), F.lit(0)).cast("long")
    return (
        df.withColumn("_taken_before", taken_before)
        .filter(F.col("_taken_before") < budget)
        .drop("_taken_before")
    )


def sql_budget_mix_cte(
    stratum: str, id_col: str, size_col: str, budget: int,
    table: str = "documents", salt: str = "v1",
) -> str:
    """Oracle CTE producing the same kept set."""
    return f"""
WITH ranked AS (
  SELECT *,
         COALESCE(SUM({size_col}) OVER (
           PARTITION BY {stratum}
           ORDER BY md5('{salt}' || '|' || CAST({id_col} AS VARCHAR)), {id_col}
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
         ), 0) AS _taken_before
  FROM {table}
), kept AS (
  SELECT * FROM ranked WHERE _taken_before < {budget}
)"""


def weighted_systematic_sample(
    df: DataFrame,
    id_col: str,
    weight_col: str,
    n_samples: int,
    salt: str = "v1",
) -> DataFrame:
    """Deterministic weighted sampling without replacement via
    SYSTEMATIC resampling: rows are laid end-to-end on an integer
    weight axis in salted-content-hash order, and every row spanning a
    stride boundary (stride = total_weight div n_samples) is kept —
    inclusion probability proportional to weight (exact for
    w < stride), selection a pure function of (corpus, salt).

    Why not Efraimidis-Spirakis keys (u^(1/w))? That needs pow/ln,
    and libm transcendentals are NOT bit-identical across engines —
    the sample would not be reproducible between Spark and an oracle.
    Systematic resampling is pure integer arithmetic: floor divisions
    of exact prefix sums, so the kept set is bit-stable everywhere.

    The kept count is floor(total/stride) >= n_samples boundaries
    spread over the axis (at most n_samples + 1 rows; a row wider
    than one stride is kept once, never duplicated).

    Scale path: same two-phase prefix-sum discipline as
    :func:`global_shuffle_index` — NO global window. The hash's first
    byte splits the axis into 256 ordered buckets; per-bucket weight
    totals (256 ints, driver-safe at any scale) prefix-sum into
    bucket base offsets broadcast back; the running sum inside a
    bucket is a partition-local window. ``total`` falls out of the
    same 256 sums — no extra pass.

    Returns the sampled rows with ``cum_before`` (exclusive prefix
    weight) and ``sample_pos`` (which stride boundary the row spans).
    """
    from bottledwater_pg_spark.session import persist_tracked

    h = split_key(id_col, salt)
    # persisted for the same two-consumers reason as
    # global_shuffle_index (driver prefix-sum collect + final window)
    bucketed = persist_tracked(
        df.withColumn("_h", h).withColumn(
            "_bkt", F.conv(F.substring("_h", 1, 2), 16, 10).cast("int")
        )
    )
    sums = {
        r["_bkt"]: r["s"]
        for r in bucketed.groupBy("_bkt")
        .agg(
            # a bucket whose weights are ALL null sums to null; the
            # driver-side prefix sum needs 0, like SQL SUM over an
            # empty set after null-skipping
            F.coalesce(F.sum(weight_col), F.lit(0))
            .cast("long")
            .alias("s")
        )
        .collect()
    }
    bases, acc = {}, 0
    for b in range(_SHUFFLE_BUCKETS):
        bases[b] = acc
        acc += sums.get(b, 0)
    stride = max(1, acc // n_samples)
    base_df = df.sparkSession.createDataFrame(
        [(b, bases[b]) for b in range(_SHUFFLE_BUCKETS)], "_bkt int, _base long"
    )
    w = (
        Window.partitionBy("_bkt")
        .orderBy("_h", id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum = (
        F.col("_base")
        + F.coalesce(F.sum(weight_col).over(w), F.lit(0))
    ).cast("long")
    return (
        bucketed.join(F.broadcast(base_df), "_bkt")
        .withColumn("cum_before", cum)
        .filter(
            F.expr(f"cum_before div {stride}")
            < F.expr(f"(cum_before + {weight_col}) div {stride}")
        )
        .withColumn(
            "sample_pos", F.expr(f"(cum_before + {weight_col}) div {stride}")
        )
        .drop("_h", "_bkt", "_base")
    )


def sql_weighted_systematic_cte(
    id_col: str, weight_col: str, n_samples: int,
    table: str = "documents", salt: str = "v1",
) -> str:
    """Oracle CTE: the single-window global formulation the two-phase
    plan must reproduce bit-exactly (kept set AND prefix sums)."""
    return f"""
WITH ranked AS (
  SELECT *,
         CAST(COALESCE(SUM({weight_col}) OVER (
           ORDER BY md5('{salt}' || '|' || CAST({id_col} AS VARCHAR)),
                    {id_col}
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
         ), 0) AS BIGINT) AS cum_before
  FROM {table}
), tot AS (
  SELECT GREATEST(1, CAST(SUM({weight_col}) AS BIGINT) // {n_samples})
    AS stride
  FROM {table}
), kept AS (
  SELECT ranked.*,
         (cum_before + {weight_col}) // stride AS sample_pos
  FROM ranked, tot
  WHERE cum_before // stride < (cum_before + {weight_col}) // stride
)"""


def unimax_allocations(sizes: DataFrame, budget: int, epoch_cap: int,
                       stratum: str = "lang",
                       size_col: str = "n_tokens") -> DataFrame:
    """UniMax budget allocation (Chung et al. 2023, "UniMax: Fairer
    and More Effective Language Sampling for Large-Scale Multilingual
    Pretraining"): distribute a total token ``budget`` across strata
    so that no stratum repeats more than ``epoch_cap`` epochs, and the
    slack the capped (small) strata can't absorb flows to the
    uncapped (large) ones in equal shares — the water-filling rule
    that replaces temperature sampling's arbitrary alpha.

    Closed-form instead of the paper's sequential loop: processed
    ascending by capacity ``c = epoch_cap * size``, the capped set is
    the longest PREFIX whose every stratum i (of n) satisfies
    ``c_i * (n - i + 1) <= budget - prefix_{i-1}`` (prefix of
    capacities). The per-row predicate alone is NOT the capped set —
    past the first failure a later row can satisfy it spuriously
    (its prefix no longer reflects what uncapped strata actually
    consume; a tie fixture with budget == one capacity exposes this)
    — so the flag is the predicate's CUMULATIVE AND down the sort
    order. The residual splits among the m uncapped strata as
    ``R DIV m`` with the remainder going to the first ``R % m`` of
    them in sort order. Every comparison is integer
    cross-multiplication — allocations sum exactly to min(budget,
    total capacity), bit-identical in any engine.

    Scale: the waterfill runs over the PER-STRATUM aggregate (one row
    per language — bounded metadata), so the single-partition window
    is O(#strata); the corpus-sized work is only the upstream size
    aggregation. Returns (stratum, size, capacity, capped,
    allocation, epochs_bp)."""
    c = F.col(size_col) * epoch_cap
    caps = sizes.select(
        F.col(stratum).alias("stratum"),
        F.col(size_col).cast("long").alias("size"),
        c.cast("long").alias("capacity"),
    )
    w = Window.orderBy("capacity", "stratum")
    wall = w.rowsBetween(Window.unboundedPreceding,
                         Window.unboundedFollowing)
    ranked = caps.select(
        "*",
        F.row_number().over(w).alias("i"),
        F.coalesce(
            F.sum("capacity").over(
                w.rowsBetween(Window.unboundedPreceding, -1)
            ),
            F.lit(0),
        ).cast("long").alias("prefix"),
        F.count("*").over(wall).cast("long").alias("n"),
    ).withColumn(
        "pred",
        (F.col("capacity") * (F.col("n") - F.col("i") + 1)
         <= F.lit(budget) - F.col("prefix")).cast("long"),
    ).withColumn(
        # cumulative AND: capped only while every smaller stratum is
        "capped",
        F.min("pred").over(
            Window.orderBy("capacity", "stratum").rowsBetween(
                Window.unboundedPreceding, Window.currentRow
            )
        ).cast("long"),
    )
    tot = ranked.agg(
        F.sum("capped").cast("long").alias("k"),
        F.sum(F.col("capped") * F.col("capacity"))
        .cast("long").alias("prefix_k"),
    )
    return (
        ranked.crossJoin(F.broadcast(tot))
        .withColumn("m", F.col("n") - F.col("k"))
        .withColumn("resid", F.lit(budget) - F.col("prefix_k"))
        .withColumn(
            "allocation",
            F.when(F.col("capped") == 1, F.col("capacity")).otherwise(
                F.expr("resid div m")
                + ((F.col("i") - F.col("k"))
                   <= F.expr("resid % m")).cast("long")
            ).cast("long"),
        )
        .select(
            F.col("stratum").alias(stratum),
            F.col("size").alias(size_col),
            "capacity",
            "capped",
            "allocation",
            F.expr(f"allocation * 10000 div {size_col}")
            .cast("long").alias("epochs_bp"),
        )
    )


def sql_unimax_allocations(budget_expr: str, epoch_cap: int,
                           sizes_cte: str = "sizes",
                           stratum: str = "lang",
                           size_col: str = "n_tokens") -> str:
    """DuckDB twin of :func:`unimax_allocations` — expects a CTE named
    ``sizes_cte`` with (stratum, size_col) in scope and a scalar SQL
    expression for the budget."""
    return f"""
ranked AS (
  SELECT {stratum} AS stratum,
         CAST({size_col} AS BIGINT) AS size,
         CAST({size_col} * {epoch_cap} AS BIGINT) AS capacity,
         ROW_NUMBER() OVER (ORDER BY {size_col} * {epoch_cap}, {stratum})
           AS i,
         CAST(COALESCE(SUM({size_col} * {epoch_cap}) OVER (
           ORDER BY {size_col} * {epoch_cap}, {stratum}
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS BIGINT) AS prefix,
         CAST(COUNT(*) OVER () AS BIGINT) AS n
  FROM {sizes_cte}
),
preds AS (
  SELECT *,
         CAST(capacity * (n - i + 1) <= ({budget_expr}) - prefix
              AS BIGINT) AS pred
  FROM ranked
),
flagged AS (
  SELECT *,
         CAST(MIN(pred) OVER (
           ORDER BY capacity, stratum
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
         ) AS BIGINT) AS capped
  FROM preds
),
tot AS (
  SELECT CAST(SUM(capped) AS BIGINT) AS k,
         CAST(SUM(capped * capacity) AS BIGINT) AS prefix_k
  FROM flagged
),
alloc AS (
  SELECT f.*,
         CASE WHEN f.capped = 1 THEN f.capacity
              ELSE (({budget_expr}) - t.prefix_k) // (f.n - t.k)
                   + CASE WHEN f.i - t.k
                               <= (({budget_expr}) - t.prefix_k)
                                  % (f.n - t.k)
                          THEN 1 ELSE 0 END
         END AS allocation
  FROM flagged f, tot t
)
SELECT stratum AS {stratum}, size AS {size_col}, capacity, capped,
       CAST(allocation AS BIGINT) AS allocation,
       CAST(allocation * 10000 // size AS BIGINT) AS epochs_bp
FROM alloc
"""
