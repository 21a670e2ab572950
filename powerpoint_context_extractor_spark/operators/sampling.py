"""Deterministic corpus-sampling operators for training-data mixtures.

Every training run needs (a) a reproducible train/val/test partition
and (b) domain re-balancing toward target mixture proportions (the
DoReMi / The-Pile-style "domain weights" step — public methods). Both
are HASH-GATED here, never ``rand()``: the decision for a row is a
pure function of its id, so reruns, resumes, and cross-engine oracles
all agree, and adding data never reshuffles existing assignments.

Scale shape: the split is map-only (zero shuffle, scan speed). The
mixture sampler does ONE combiner-friendly count per domain (domains
are a small dimension — thousands at web scale), derives integer
acceptance rates driver-free as a tiny rates table, and broadcasts it
back onto the corpus; the corpus itself never shuffles.

Everything is integer-exact (basis points, ``div``), so both operators
are DuckDB-oracle-checkable. Reference analog: the slide-subset
selection loop at `pptx_extractor/pptx_extract.py:129-143`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import portable_hash


def hash_split(docs: DataFrame, id_col: str = "doc_id",
               train_pct: int = 80, val_pct: int = 10,
               salt: str = "split") -> DataFrame:
    """Deterministic train/val/test assignment: bucket =
    H(salt || id) % 100; [0, train) -> train, [train, train+val) ->
    val, rest -> test. Emits (id, bucket, split)."""
    if not (0 <= train_pct and 0 <= val_pct
            and train_pct + val_pct <= 100):
        raise ValueError("hash_split: percentages must fit in [0, 100]")
    bucket = (portable_hash(
        F.format_string(f"{salt}%d", F.col(id_col))) % 100)
    split = (F.when(F.col("bucket") < train_pct, "train")
             .when(F.col("bucket") < train_pct + val_pct, "val")
             .otherwise("test"))
    return (docs.select(F.col(id_col), bucket.alias("bucket"))
            .withColumn("split", split))


def _domain_rates(docs: DataFrame, domain_col: str, weights_bp: dict,
                  out_fraction_bp: int) -> DataFrame:
    """Per-domain UNCAPPED acceptance rate (basis points) from ONE
    corpus scan: the counts aggregate feeds both the per-domain count
    and — via a global window over the tiny counts table (thousands of
    domain rows at most, so the single-partition window is free) — the
    corpus total. Reusing ``counts`` as two DataFrames would make
    Catalyst duplicate the subtree and scan the corpus twice
    (r5 VERDICT wrong #3); the window keeps one subtree, one scan."""
    from pyspark.sql import Window as W
    counts = docs.groupBy(F.col(domain_col).alias("_dom")).agg(
        F.count(F.lit(1)).alias("_cnt"))
    wmap = F.create_map(
        *[x for d, w in sorted(weights_bp.items())
          for x in (F.lit(d), F.lit(int(w)))])
    return (counts
            .withColumn("_n", F.sum("_cnt").over(
                W.partitionBy(F.lit(1))))
            .withColumn("_w", F.coalesce(
                F.element_at(wmap, F.col("_dom")), F.lit(0)))
            .withColumn("rate_bp", F.expr(
                "(((_n * " + str(int(out_fraction_bp))
                + ") div 10000) * _w div 10000) * 10000 div _cnt"))
            .select("_dom", "rate_bp"))


def mixture_sample(docs: DataFrame, domain_col: str,
                   weights_bp: dict, out_fraction_bp: int = 5000,
                   id_col: str = "doc_id",
                   salt: str = "mix") -> DataFrame:
    """Re-balance a corpus toward target domain proportions: given
    target mixture weights (basis points per domain, summing to <=
    10000) and a target output fraction of the corpus, compute each
    domain's integer acceptance rate and keep a row iff
    ``H(salt || id) % 10000 < rate_bp(domain)``.

    Exact integer derivation (mirrored in the oracle):
      N_out    = (N_total * out_fraction_bp) div 10000
      quota_d  = (N_out * weights_bp[d]) div 10000
      rate_bp_d = least(10000, (quota_d * 10000) div count_d)
    A domain too small for its quota saturates at rate 10000 (keep
    all) — the standard behavior when a target up-weights a scarce
    domain. Domains absent from ``weights_bp`` get rate 0. Emits the
    kept rows as (id, domain, rate_bp)."""
    if not weights_bp or sum(weights_bp.values()) > 10000:
        raise ValueError("mixture_sample: weights_bp must sum to <= 10000")
    rates = (_domain_rates(docs, domain_col, weights_bp, out_fraction_bp)
             .withColumn("rate_bp",
                         F.least(F.lit(10000), F.col("rate_bp"))))
    h = portable_hash(F.format_string(f"{salt}%d", F.col(id_col))) % 10000
    return (docs.select(F.col(id_col), F.col(domain_col).alias("domain"),
                        h.alias("_h"))
            .join(F.broadcast(rates), F.col("domain") == F.col("_dom"))
            .filter(F.col("_h") < F.col("rate_bp"))
            .select(id_col, "domain", "rate_bp"))


def mixture_sample_upsample(docs: DataFrame, domain_col: str,
                            weights_bp: dict, out_fraction_bp: int = 5000,
                            id_col: str = "doc_id",
                            salt: str = "mix") -> DataFrame:
    """Mixture resampling WITH upsampling (r5 VERDICT #4): same integer
    quota derivation as :func:`mixture_sample`, but the per-domain rate
    is NOT capped at 10000 — a scarce domain whose quota exceeds its
    count gets repetition factor > 1, the DoReMi / Pile behavior
    ``mixture_sample`` cannot express.

      rate_bp_d = (quota_d * 10000) div count_d         (uncapped)
      n_copies  = rate_bp div 10000
                  + (1 if H(salt||id) % 10000 < rate_bp % 10000 else 0)

    Each kept row is emitted ``n_copies`` times with ``rep`` in
    [0, n_copies): full copies deterministically, the fractional
    remainder hash-gated — so reruns and resumes emit identical rows.

    Scale shape: identical to ``mixture_sample`` (one combiner count
    per domain + broadcast rates; the corpus never shuffles) plus a
    map-side ``explode`` over a tiny int sequence — rows multiply in
    place on their own partitions, no redistribution."""
    if not weights_bp or sum(weights_bp.values()) > 10000:
        raise ValueError(
            "mixture_sample_upsample: weights_bp must sum to <= 10000")
    rates = _domain_rates(docs, domain_col, weights_bp, out_fraction_bp)
    h = portable_hash(F.format_string(f"{salt}%d", F.col(id_col))) % 10000
    return (docs.select(F.col(id_col), F.col(domain_col).alias("domain"),
                        h.alias("_h"))
            .join(F.broadcast(rates), F.col("domain") == F.col("_dom"))
            .withColumn("_nc", F.expr("rate_bp div 10000")
                        + F.when(F.col("_h") < F.col("rate_bp") % 10000,
                                 F.lit(1)).otherwise(F.lit(0)))
            .filter(F.col("_nc") > 0)
            .select(F.col(id_col), F.col("domain"),
                    F.col("rate_bp").cast("long").alias("rate_bp"),
                    F.explode(F.sequence(
                        F.lit(0).cast("long"),
                        F.col("_nc").cast("long") - 1)).alias("rep")))


def reservoir_sample(docs: DataFrame, stratum_col: str, k: int,
                     id_col: str = "doc_id", salt: str = "res",
                     buckets: int = 32) -> DataFrame:
    """Deterministic fixed-size-k sample per stratum ("reservoir"
    semantics without the sequential reservoir): rows are ranked within
    their stratum by ``(H(salt || id), id)`` and the k smallest win.
    Hash-rank top-k is the distributed, rerun-stable equivalent of
    Vitter's algorithm R — the "random" order is a pure function of the
    row id, so resumes and cross-engine oracles agree, and appending
    new rows can only displace old winners the way a true reservoir
    would. Emits (id, stratum, rk) with rk in [1, k].

    Scale shape: a naive single window over the stratum would sort
    every row of a hot stratum on one task (windows cannot be
    AQE-skew-split).  Instead: two-level exact top-k — stage 1 ranks
    within ``(stratum, id % buckets)`` and keeps k per bucket, so no
    task ever sorts more than ~1/buckets of a hot stratum; stage 2
    ranks the <= buckets*k survivors per stratum.  The global top-k by
    a total order is always contained in the union of per-bucket
    top-ks, so the two-level result is EXACTLY the single-window
    result (the oracle uses the plain one-level formulation)."""
    if k <= 0 or buckets <= 0:
        raise ValueError("reservoir_sample: k and buckets must be > 0")
    from pyspark.sql import Window as W
    h = portable_hash(F.format_string(f"{salt}%d", F.col(id_col)))
    base = docs.select(F.col(id_col),
                       F.col(stratum_col).alias("stratum"),
                       h.alias("_h"),
                       (F.col(id_col) % buckets).alias("_b"))
    w1 = W.partitionBy("stratum", "_b").orderBy("_h", id_col)
    stage1 = (base.withColumn("_r1", F.row_number().over(w1))
              .filter(F.col("_r1") <= k))
    w2 = W.partitionBy("stratum").orderBy("_h", id_col)
    return (stage1.withColumn("rk", F.row_number().over(w2))
            .filter(F.col("rk") <= k)
            .select(id_col, "stratum", F.col("rk").cast("long").alias("rk")))


def temperature_rates(docs: DataFrame, domain_col: str,
                      out_fraction_bp: int = 5000) -> DataFrame:
    """The T=2 per-domain acceptance-rate table behind
    :func:`temperature_sample`, exposed (r7) so composed pipelines
    can carry the temperature share as metadata without re-deriving
    it: emits (_dom, rate_bp) — tiny, broadcast-joinable."""
    from pyspark.sql import Window as W
    counts = docs.groupBy(F.col(domain_col).alias("_dom")).agg(
        F.count(F.lit(1)).alias("_cnt"))
    win = W.partitionBy(F.lit(1))
    return (counts
            .withColumn("_w", F.floor(F.sqrt(F.col("_cnt"))).cast("long"))
            .withColumn("_n", F.sum("_cnt").over(win))
            .withColumn("_sw", F.sum("_w").over(win))
            .withColumn("rate_bp", F.least(F.lit(10000), F.expr(
                f"(((_n * {int(out_fraction_bp)}) div 10000)"
                " * _w div _sw) * 10000 div _cnt")))
            .select("_dom", "rate_bp"))


def temperature_sample(docs: DataFrame, domain_col: str,
                       out_fraction_bp: int = 5000,
                       id_col: str = "doc_id",
                       salt: str = "temp") -> DataFrame:
    """Temperature-flattened mixture sampling (the mT5 / multilingual-
    pretraining rebalance, public method): target domain shares are
    proportional to count^(1/2) — i.e. sampling temperature T=2, the
    common setting — so scarce domains are up-weighted relative to
    their natural share without a hand-written weights table.

    Integer-exact derivation (mirrored in the oracle; ``isqrt`` is
    ``floor(sqrt(x))``, identical in Spark and DuckDB because IEEE-754
    sqrt is correctly rounded and counts < 2^52 are exact doubles):
      w_d      = isqrt(count_d)
      N_out    = (N_total * out_fraction_bp) div 10000
      quota_d  = (N_out * w_d) div sum(w)
      rate_bp  = least(10000, quota_d * 10000 div count_d)
    Keep a row iff ``H(salt || id) % 10000 < rate_bp``.  Emits
    (id, domain, rate_bp).

    Scale shape: same as :func:`mixture_sample` — one combiner count
    per domain, weights derived on the tiny counts table (single-
    partition window over thousands of domain rows is free), rates
    broadcast back; the corpus never shuffles."""
    rates = temperature_rates(docs, domain_col, out_fraction_bp)
    h = portable_hash(F.format_string(f"{salt}%d", F.col(id_col))) % 10000
    return (docs.select(F.col(id_col), F.col(domain_col).alias("domain"),
                        h.alias("_h"))
            .join(F.broadcast(rates), F.col("domain") == F.col("_dom"))
            .filter(F.col("_h") < F.col("rate_bp"))
            .select(id_col, "domain",
                    F.col("rate_bp").cast("long").alias("rate_bp")))


def weighted_reservoir_sample(docs: DataFrame, stratum_col: str,
                              weight_col: str, k: int,
                              id_col: str = "doc_id",
                              salt: str = "wres",
                              buckets: int = 32) -> DataFrame:
    """Deterministic weight-biased fixed-k sample per stratum — the
    integer analog of the Efraimidis–Spirakis A-ES weighted reservoir
    (public method): each row draws priority ``H(salt||id) div w``
    (uniform hash scaled down by weight, so a weight-2w row is twice
    as likely to land among the k smallest as a weight-w row), and the
    k smallest (priority, id) win. Same two-level exact top-k shape as
    :func:`reservoir_sample` — no hot-stratum single-task sort — and
    the one-level formulation is the oracle. Weights must be positive
    integers; rows with NULL or non-positive weight are EXCLUDED up
    front (r6 ADVICE: ``x div 0`` is NULL in Spark and NULLs sort
    first ascending, so a w=0 row would otherwise deterministically
    win a slot, and a negative w would outrank every positive one).
    Emits (id, stratum, w, rk)."""
    if k <= 0 or buckets <= 0:
        raise ValueError(
            "weighted_reservoir_sample: k and buckets must be > 0")
    from pyspark.sql import Window as W
    h = portable_hash(F.format_string(f"{salt}%d", F.col(id_col)))
    base = (docs.select(
        F.col(id_col), F.col(stratum_col).alias("stratum"),
        F.col(weight_col).cast("long").alias("w"),
        h.alias("_h"),
        (F.col(id_col) % buckets).alias("_b"))
        .filter(F.col("w") > 0)
        .withColumn("_pri", F.expr("_h div w")))
    w1 = W.partitionBy("stratum", "_b").orderBy("_pri", id_col)
    stage1 = (base.withColumn("_r1", F.row_number().over(w1))
              .filter(F.col("_r1") <= k))
    w2 = W.partitionBy("stratum").orderBy("_pri", id_col)
    return (stage1.withColumn("rk", F.row_number().over(w2))
            .filter(F.col("rk") <= k)
            .select(id_col, "stratum", "w",
                    F.col("rk").cast("long").alias("rk")))


def global_order_index(docs: DataFrame, order_cols: list,
                       id_col: str = "doc_id",
                       n_parts: int = 32) -> DataFrame:
    """Contiguous global sequence numbers 0..N-1 in a total order —
    the curriculum / dataloader indexing primitive — WITHOUT a
    single-partition global sort.

    Classic distributed rank: (1) range-partition + sort locally on
    the order key (one skew-sampled shuffle; Spark's range sampler
    places boundaries, but the FINAL index is boundary-independent
    because ranges are disjoint and locally sorted); (2) local ranks
    are assigned map-side inside Arrow batches (a running counter per
    partition — no window, no second shuffle); (3) per-partition
    counts (a tiny groupBy) turn into offsets with a window over the
    n_parts-row table, broadcast back. Requires the order key to be
    unique — pass the id as the last order column. Emits
    (id, global_idx)."""
    import pandas as pd
    if not order_cols:
        raise ValueError("global_order_index: order_cols required")
    ranged = (docs.repartitionByRange(n_parts, *[F.col(c) for c in
                                                 order_cols])
              .sortWithinPartitions(*order_cols)
              .withColumn("_pid", F.spark_partition_id()))

    def _local_rank(batches):
        rank = 0                 # running counter across the
        for pdf in batches:      # partition's Arrow batches
            n = len(pdf)
            yield pd.DataFrame({
                "_pid": pdf["_pid"],
                "id": pdf["__id"],
                "_lr": range(rank, rank + n)})
            rank += n

    keyed = ranged.withColumn("__id", F.col(id_col))
    id_type = docs.schema[id_col].dataType.simpleString()
    local = keyed.mapInPandas(
        _local_rank, schema=f"_pid int, id {id_type}, _lr long")
    from pyspark.sql import Window as W
    counts = local.groupBy("_pid").agg(F.count(F.lit(1)).alias("_c"))
    offsets = (counts
               .withColumn("_off", F.coalesce(F.sum("_c").over(
                   W.orderBy("_pid").rowsBetween(
                       W.unboundedPreceding, -1)), F.lit(0)))
               .select("_pid", "_off"))
    return (local.join(F.broadcast(offsets), "_pid")
            .select(F.col("id").alias(id_col),
                    (F.col("_lr") + F.col("_off")).cast("long")
                    .alias("global_idx")))


def global_running_offset(docs: DataFrame, order_cols: list,
                          value_col: str, id_col: str = "doc_id",
                          n_parts: int = 32) -> DataFrame:
    """Exclusive global running sum of ``value_col`` in a total order
    (r7) — the cumulative-offset sibling of :func:`global_order_index`
    and the primitive behind GPT-style sequence packing: row i's
    ``offset`` is the sum of values over all rows strictly before it.

    Same scale shape: range-partition + local sort (one skew-sampled
    shuffle), per-partition exclusive prefix sums map-side inside
    Arrow batches (a running accumulator, no window), per-partition
    TOTALS turned into partition base offsets with a window over the
    n_parts-row table, broadcast back. The order key must be unique
    (pass the id as the last order column). Emits (id, value, offset).
    """
    import pandas as pd
    if not order_cols:
        raise ValueError("global_running_offset: order_cols required")
    ranged = (docs.repartitionByRange(n_parts, *[F.col(c) for c in
                                                 order_cols])
              .sortWithinPartitions(*order_cols)
              .withColumn("_pid", F.spark_partition_id()))

    def _local_cumsum(batches):
        acc = 0                  # running sum across the
        for pdf in batches:      # partition's Arrow batches
            vals = pdf["__v"].astype("int64").tolist()
            offs = []
            for v in vals:
                offs.append(acc)
                acc += v
            yield pd.DataFrame({
                "_pid": pdf["_pid"],
                "id": pdf["__id"],
                "v": vals,
                "_lo": offs})

    keyed = (ranged.withColumn("__id", F.col(id_col))
             .withColumn("__v", F.col(value_col).cast("long")))
    id_type = docs.schema[id_col].dataType.simpleString()
    local = keyed.mapInPandas(
        _local_cumsum,
        schema=f"_pid int, id {id_type}, v long, _lo long")
    from pyspark.sql import Window as W
    totals = local.groupBy("_pid").agg(F.sum("v").alias("_t"))
    offsets = (totals
               .withColumn("_off", F.coalesce(F.sum("_t").over(
                   W.orderBy("_pid").rowsBetween(
                       W.unboundedPreceding, -1)), F.lit(0)))
               .select("_pid", "_off"))
    return (local.join(F.broadcast(offsets), "_pid")
            .select(F.col("id").alias(id_col),
                    F.col("v").cast("long").alias("value"),
                    (F.col("_lo") + F.col("_off")).cast("long")
                    .alias("offset")))


def pack_sequences(docs: DataFrame, seq_len: int,
                   order_cols: list | None = None,
                   tokens_expr=None, id_col: str = "doc_id",
                   text_col: str = "text",
                   n_parts: int = 32) -> DataFrame:
    """GPT-style sequence packing metadata (r7): concatenate every
    document's tokens in one fixed total order and cut the stream
    into fixed ``seq_len`` training sequences — documents SPLIT
    ACROSS pack boundaries, the standard pretraining layout (no
    padding waste, unlike greedy bin packing). Per doc emits
    (id, n_tokens, tok_offset, pack_first, pack_last,
    offset_in_pack):

      tok_offset     = exclusive running sum of n_tokens in order
      pack_first     = tok_offset div seq_len
      pack_last      = (tok_offset + n_tokens - 1) div seq_len
                       (== pack_first - 1 + 0 rows for empty docs:
                        empty docs emit pack_last = pack_first and
                        offset math still holds)
      offset_in_pack = tok_offset % seq_len

    A dataloader seeking pack p reads the docs with
    pack_first <= p <= pack_last — an interval join this table
    serves; the whole derivation is integer math over
    :func:`global_running_offset`, so it is oracle-exact and
    shuffle-bounded by the one range partition."""
    if seq_len <= 0:
        raise ValueError("pack_sequences: seq_len must be > 0")
    if tokens_expr is None:
        from .dedup import tokens_col
        tokens_expr = F.size(tokens_col(text_col))
    if order_cols is None:
        order_cols = [id_col]
    counted = docs.select(F.col(id_col),
                          tokens_expr.cast("long").alias("_nt"))
    off = global_running_offset(counted, order_cols, "_nt",
                                id_col=id_col, n_parts=n_parts)
    return off.select(
        F.col(id_col),
        F.col("value").alias("n_tokens"),
        F.col("offset").alias("tok_offset"),
        F.expr(f"offset div {int(seq_len)}").cast("long")
        .alias("pack_first"),
        F.expr(f"(offset + greatest(value, 1) - 1) div {int(seq_len)}")
        .cast("long").alias("pack_last"),
        (F.col("offset") % seq_len).cast("long")
        .alias("offset_in_pack"))
