package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling and corpus mixing for training-data
  * pipelines.
  *
  * Why not `df.sample()`: Spark's sampler is seeded per-PARTITION —
  * the kept set changes with partitioning, task retries and
  * `repartition()` calls, so a "sampled corpus" is not a stable set
  * (and can silently lose/duplicate rows under retry, the same hazard
  * as a nondeterministic salt). Here every row carries its own
  * uniform variate u(key) = first 8 hex digits of md5(key ++ salt) /
  * 2^32 — a pure function of the ROW, so the kept set is identical
  * across runs, partitionings, engines (md5 is everywhere; the gate
  * oracle recomputes it in SQL) and retries. Keep iff u < fraction.
  *
  * This is the mixture-weighting primitive: pretraining corpora are
  * blended per-source/per-language ([[stratified]]); held-out sets
  * must be disjoint-and-covering forever after ([[trainTestSplit]] —
  * u >= f is exactly the complement of u < f).
  */
object Sampling {

  /** Uniform variate in [0, 1): 32 bits of
    * md5(len(key) ++ ":" ++ key ++ "/" ++ salt). conv() parses the
    * hex; division by 2^32 is exact (both operands integral powers of
    * two apart), so thresholds compare identically in any engine.
    *
    * ENCODING v2 (round 4) — a deliberate one-time break: v1 hashed
    * the bare concat key ++ "/" ++ salt, so EVERY key's variate
    * changes across the upgrade. Splits persisted under v1 must be
    * re-materialized (or re-derived wholesale); mixing v1-persisted
    * and v2-derived splits of one corpus contaminates held-out sets.
    * From v2 on, the "never migrate" contract holds again.
    *
    * The LENGTH PREFIX makes the (key, salt) encoding injective — a
    * bare concat would collide (key="a", salt="b/c") with
    * (key="a/b", salt="c"), silently correlating samples that use
    * '/' in keys. A NULL key hashes as the sentinel "null" (md5(NULL)
    * is NULL, and a null variate fails BOTH u < f and u >= f — rows
    * would vanish from every split, violating the disjoint-and-
    * covering contract). All null-keyed rows share one variate and
    * travel together; use a non-null unique key for per-row
    * uniformity.
    */
  def uniform(key: Column, salt: String = ""): Column = {
    val k = key.cast("string")
    val encoded = concat(
      coalesce(concat(length(k).cast("string"), lit(":"), k), lit("null")),
      lit("/" + salt))
    conv(substring(md5(encoded), 1, 8), 16, 10)
      .cast("long") / lit(4294967296.0)
  }

  /** Keep a deterministic `fraction` of rows, selected by key. */
  def uniformByKey(df: DataFrame, fraction: Double, keyCol: String,
      salt: String = ""): DataFrame = {
    require(fraction >= 0.0 && fraction <= 1.0, s"fraction=$fraction outside [0,1]")
    df.where(uniform(col(keyCol), salt) < fraction)
  }

  /** Per-stratum mixture: keep each stratum at its own fraction
    * (strata absent from the map keep `defaultFraction`). The
    * downsampling tool for corpus blending — e.g. cap boilerplate
    * sources while keeping rare languages whole.
    */
  def stratified(df: DataFrame, stratumCol: String,
      fractions: Map[String, Double], defaultFraction: Double,
      keyCol: String, salt: String = ""): DataFrame = {
    require((defaultFraction +: fractions.values.toSeq)
      .forall(f => f >= 0.0 && f <= 1.0), "fractions must be in [0,1]")
    val threshold = fractions.foldLeft(lit(defaultFraction)) {
      case (acc, (stratum, f)) =>
        when(col(stratumCol) === stratum, lit(f)).otherwise(acc)
    }
    df.where(uniform(col(keyCol), salt) < threshold)
  }

  /** Temperature-based corpus mixing (the multilingual-pretraining
    * rebalance: sample stratum i with probability ∝ p_i^alpha, p_i its
    * corpus share). Realized as downsample-only per-stratum keep
    * fractions f_i = (cnt_min / cnt_i)^(1 - alpha): the SMALLEST
    * stratum keeps everything, bigger strata are cut toward it —
    * alpha = 1 keeps the natural mix (f ≡ 1), alpha = 0 equalizes
    * (every stratum's expected kept count = cnt_min), alpha in
    * between flattens the head without starving the tail. Keep is
    * the [[uniform]] variate test, so the kept set is deterministic
    * across runs/partitionings/engines and NESTED in alpha (a row
    * kept at alpha is kept at every alpha' > alpha — u < f is
    * monotone in f).
    *
    * Cross-engine exactness: alpha = 0.5 routes through sqrt and
    * alpha ∈ {0, 1} through exact arithmetic — all correctly-rounded
    * single IEEE ops, so thresholds compare identically in any
    * engine (the p44 oracle re-derives them in SQL). Other alphas go
    * through `pow`, which is NOT guaranteed correctly rounded across
    * libm implementations — fine within Spark (one binary evaluates
    * both sides), flagged for cross-engine persistence.
    *
    * Scale shape: one count aggregate over the stratum column (tiny
    * output, broadcast back) + one narrow filter scan — no row-level
    * shuffle of the corpus at any size.
    */
  def temperatureMix(df: DataFrame, stratumCol: String, alpha: Double,
      keyCol: String, salt: String = ""): DataFrame = {
    require(alpha >= 0.0 && alpha <= 1.0, s"alpha=$alpha outside [0,1]")
    val counts = df.groupBy(col(stratumCol)).agg(count(lit(1)).as("__cnt"))
    val mn = counts.agg(min(col("__cnt")).as("__mn"))
    val ratio = col("__mn").cast("double") / col("__cnt")
    val keepF =
      if (alpha == 1.0) lit(1.0)
      else if (alpha == 0.5) sqrt(ratio)
      else if (alpha == 0.0) ratio
      else pow(ratio, 1.0 - alpha)
    df.join(broadcast(counts.crossJoin(mn)
        .select(col(stratumCol), keepF.as("__keep_f"))),
        Seq(stratumCol))
      .where(uniform(col(keyCol), salt) < col("__keep_f"))
      .drop("__keep_f")
  }

  /** Weight-proportional Bernoulli subsample: keep each row with
    * probability min(1, w * c), where c = targetFraction * N / ΣW
    * scales the EXPECTED kept fraction of ROWS to `targetFraction`
    * while making each row's keep odds proportional to its weight.
    * With weight = token count this is token-budget-proportional
    * document selection (a kept-row is ~a uniform draw over TOKENS,
    * the standard shape for "select ~X% of the corpus by content,
    * not by document count"); with weight = a quality score it is
    * quality-weighted upsampling.
    *
    * Determinism: the variate is [[uniform]]'s md5 contract; ΣW
    * accumulates as Decimal(38,6) (exact, order-independent — a
    * double sum would vary with partitioning); c is computed once
    * with a pinned operation order `(targetFraction * N) / ΣW` and
    * the keep test `u < least(1, w * c)` is correctly-rounded IEEE
    * ops — so any engine reproduces the kept set exactly. INTEGER
    * weights make the Decimal accumulation lossless; fractional
    * weights round HALF_UP at 6 dp on entry (document if a foreign
    * oracle rounds differently). NULL weights are dropped by an
    * EXPLICIT isNotNull guard — `least(1, NULL * c)` alone would
    * keep the row, because SQL `least` skips NULL arguments and
    * leaves threshold 1.
    *
    * One bounded driver probe (ΣW, N) — the same 1-row aggregate
    * class as the engine's other scalar frames.
    */
  def weightedByKey(df: DataFrame, weightCol: String,
      targetFraction: Double, keyCol: String,
      salt: String = ""): DataFrame = {
    require(targetFraction >= 0.0 && targetFraction <= 1.0,
      s"targetFraction=$targetFraction outside [0,1]")
    val probe = df.agg(
      sum(col(weightCol).cast(
        org.apache.spark.sql.types.DecimalType(38, 6))).as("sw"),
      count(col(weightCol)).as("n")).head()
    if (probe.isNullAt(0) || probe.getDecimal(0).signum() <= 0)
      df.where(lit(false)) // empty / all-null / degenerate weights
    else {
      val c = targetFraction * probe.getLong(1) /
        probe.getDecimal(0).doubleValue()
      df.where(col(weightCol).isNotNull &&
        uniform(col(keyCol), salt) <
          least(lit(1.0), col(weightCol).cast("double") * lit(c)))
    }
  }

  /** Disjoint, covering train/test split: test = u < testFraction,
    * train = the exact complement. Stable across runs and
    * re-partitionings — a document can never migrate between splits.
    */
  def trainTestSplit(df: DataFrame, testFraction: Double, keyCol: String,
      salt: String = ""): (DataFrame, DataFrame) = {
    require(testFraction >= 0.0 && testFraction <= 1.0,
      s"testFraction=$testFraction outside [0,1]")
    val u = uniform(col(keyCol), salt)
    (df.where(u >= testFraction), df.where(u < testFraction))
  }

  /** EXACTLY `k` rows per stratum (all rows when the stratum is
    * smaller): the k smallest md5 variates win, ties broken by key.
    * Fraction sampling can't build fixed-size eval/calibration sets —
    * a 1% draw of a stratum is as big as the stratum happens to be;
    * this is the deterministic reservoir: same k rows on every run,
    * partitioning, retry, engine.
    *
    * Plan: one (stratum)-keyed window ranking by (variate, key) —
    * rank <= k. A hot stratum costs one sort partition (no per-group
    * heap); at the "stratum = half the corpus" extreme, pre-filter
    * with `uniformByKey` at a few x k/|stratum| first and rank the
    * survivors (doc'd escape hatch, not automatic — it needs a
    * cardinality estimate).
    */
  def fixedSizeStratified(df: DataFrame, stratumCol: String, k: Int,
      keyCol: String, salt: String = ""): DataFrame = {
    require(k > 0, s"k=$k must be positive")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(stratumCol))
      .orderBy(uniform(col(keyCol), salt).asc, col(keyCol).asc)
    df.withColumn("__rank", row_number().over(w))
      .where(col("__rank") <= k)
      .drop("__rank")
  }

  /** [[fixedSizeStratified]]'s output via the native bounded-state
    * reservoir aggregate ([[graft.functions.ReservoirKeys]]) instead
    * of the stratum-keyed window: map-side partials keep at most k
    * (variate, key) pairs per stratum, the exchange moves
    * O(strata × k), and merge is a bounded union — where the window
    * shuffles and sorts EVERY row of every stratum. Same kept set
    * exactly: the aggregate ranks by the raw 32-bit md5 integer, and
    * the window's u = h/2^32 scaling is order-preserving. Use this
    * form when a stratum can be a large corpus fraction (the window's
    * hot-stratum sort partition is the 100 TB failure mode its own
    * doc warns about); output is (stratum, key) — join back by key
    * for full rows. Requires a non-null NUMERIC key (cast to long)
    * that is UNIQUE within its stratum: the aggregate's buffer is a
    * set of (rank, key) pairs, so duplicate keys collapse to one
    * entry where the window form's row_number keeps each duplicate
    * row as its own sample — under duplicate keys the agg form
    * returns fewer than k rows and the "same kept set" equivalence
    * no longer holds. Null-keyed rows are skipped (the window form
    * ranks them under the shared "null" variate — use it if either
    * edge matters).
    */
  def fixedSizeStratifiedAgg(df: DataFrame, stratumCol: String, k: Int,
      keyCol: String, salt: String = ""): DataFrame = {
    require(k > 0, s"k=$k must be positive")
    val kc = col(keyCol).cast("string")
    val encoded = concat(
      coalesce(concat(length(kc).cast("string"), lit(":"), kc), lit("null")),
      lit("/" + salt))
    val h = conv(substring(md5(encoded), 1, 8), 16, 10).cast("long")
    df.select(col(stratumCol), h.as("__h"), col(keyCol).cast("long").as("__k"))
      .groupBy(col(stratumCol))
      .agg(graft.functions.SketchFunctions
        .reservoirKeys(col("__h"), col("__k"), k).as("__keys"))
      .select(col(stratumCol), explode(col("__keys")).as(keyCol))
  }

  /** Deterministic per-epoch global shuffle: `epoch_rank` = the
    * row's 1-based position in epoch `epoch`'s training order. The
    * order is the md5 variate keyed by (key, "salt/epoch") — every
    * epoch is an independent reproducible permutation (same corpus +
    * epoch => same order on any partitioning, retry, or cluster
    * size; a data-loader restart resumes mid-epoch by rank).
    *
    * Ranking is [[graft.operators.GlobalOrder.withGlobalRank]]
    * (range-partitioned parallel sort + zip) — never the
    * single-partition `row_number() OVER (ORDER BY ...)` window. The
    * variate is a 32-bit integer scaled by 2^-32 — EXACT in double,
    * so the order (variate, then key for the ~n²/2^33 birthday ties)
    * is total and engine-reproducible, no float caveats.
    */
  def epochShuffle(df: DataFrame, epoch: Int, keyCol: String,
      salt: String = "epoch"): DataFrame =
    graft.operators.GlobalOrder.withGlobalRank(
      df.withColumn("__u", uniform(col(keyCol), s"$salt/$epoch")),
      "epoch_rank",
      Seq(col("__u").asc, col(keyCol).asc))
      .drop("__u")

  /** Raw 32-bit md5 rank of a key — [[uniform]]'s variate BEFORE the
    * 2^-32 scaling (order-identical; the scaling is an exact divide
    * by a power of two). The integer form is what the bounded-state
    * aggregates key their reservoirs on.
    */
  private[pipeline] def rawRank(key: Column, salt: String): Column = {
    val k = key.cast("string")
    val encoded = concat(
      coalesce(concat(length(k).cast("string"), lit(":"), k), lit("null")),
      lit("/" + salt))
    conv(substring(md5(encoded), 1, 8), 16, 10).cast("long")
  }

  /** Per-group approximate quantiles from a bounded uniform sample —
    * the mergeable, fixed-memory alternative to the exact sort-based
    * quantiles ([[graft.operators.Medians]]): per group, keep the k
    * rows with the smallest md5 rank (the
    * [[graft.functions.ReservoirKeys]] reservoir — map-side partials
    * hold <= k pairs, the exchange moves O(groups x k)), join the
    * kept keys back for their values (sample side broadcasts — the
    * corpus is probed once, never shuffled), and read each requested
    * quantile as the sorted sample's floor((n_sample-1) * q) element
    * (lower interpolation: a SELECTION, so every emitted value is an
    * actual data value — engine-exact, no float-summation caveat
    * anywhere).
    *
    * Sampling error, not sketch error: the estimate's rank error is
    * the order statistic's ~ sqrt(q(1-q)/k) — k=1024 gives ~1.5%
    * rank error at the median. Groups with <= k rows sample
    * everything, so their quantiles are EXACT (SampleQuantilesSpec
    * pins both regimes).
    *
    * Contract (inherited from the reservoir aggregate): `keyCol`
    * non-null numeric, unique within its group.
    */
  def sampleQuantiles(df: DataFrame, groupCol: String, valueCol: String,
      keyCol: String, k: Int, qs: Seq[Double],
      salt: String = ""): DataFrame = {
    require(k > 0, s"k=$k must be positive")
    require(qs.nonEmpty && qs.forall(q => q >= 0.0 && q <= 1.0),
      s"quantiles $qs must be in [0,1]")
    val proj = df.select(col(groupCol), rawRank(col(keyCol), salt).as("__h"),
      col(keyCol).cast("long").as("__k"),
      col(valueCol).cast("double").as("__v"))
    val sampled = proj.groupBy(col(groupCol))
      .agg(graft.functions.SketchFunctions
        .reservoirKeys(col("__h"), col("__k"), k).as("__keys"))
      .select(col(groupCol), explode(col("__keys")).as("__k"))
    val quantileCols = qs.map { q =>
      val name = "p" + math.round(q * 100)
      element_at(col("__vals"),
        (floor(lit(q) * (col("n_sample") - 1)) + 1).cast("int")).as(name)
    }
    proj.join(broadcast(sampled), Seq(groupCol, "__k"))
      .groupBy(col(groupCol))
      .agg(sort_array(collect_list(col("__v"))).as("__vals"),
        count(lit(1)).as("n_sample"))
      .select(col(groupCol) +: col("n_sample") +: quantileCols: _*)
  }

  /** Mixture sampling to an absolute TOKEN BUDGET: allocate
    * `budgetFrac` of the corpus' total tokens across strata by
    * `shares` (strata absent from the map get `defaultShare`), then
    * keep each stratum at rate = min(1, allocated / stratum_tokens)
    * via the [[uniform]] variate. The "data mixing" step of a
    * pretraining build — [[temperatureMix]] reshapes RELATIVE
    * frequencies; this hits an ABSOLUTE budget ("train on B tokens,
    * 25% of them src0"), capping at availability (a stratum smaller
    * than its allocation keeps everything — the standard
    * oversubscription rule; budget shares are targets, not
    * guarantees).
    *
    * Scale shape: one integer aggregate over (stratum) — tiny output
    * broadcast back with the 1-row grand total — then a narrow
    * variate-filter scan; the corpus itself never shuffles. Rates
    * are one pinned chain of IEEE ops over exact integer token
    * totals, so the kept set is deterministic across runs,
    * partitionings and engines.
    *
    * Output: the kept rows + their stratum's `rate` (the expected
    * kept fraction — the export manifest's provenance column).
    */
  /** Shared rate scaffold for [[tokenBudgetMix]] and
    * [[epochAllocation]] (the two halves of the pretraining data
    * recipe): per stratum, `share * budgetFrac * total_tokens /
    * stratum_tokens` — UNCAPPED epochs-over-supply; the budget mix
    * caps at 1.0, the epoch allocator floors into repeats. One pinned
    * IEEE chain over exact integer token totals.
    *
    * Zero-supply strata (every doc 0 tokens — e.g. an all-empty
    * source) get NO rate row and their docs drop at the join: they
    * can supply no tokens toward the budget, and the alternative —
    * IEEE x/0 = +Infinity — would turn epochAllocation's
    * floor(rate) into Long.MaxValue repeat counts.
    */
  private def stratumRates(df: DataFrame, stratumCol: String,
      tokenCol: String, shares: Map[String, Double], defaultShare: Double,
      budgetFrac: Double): DataFrame = {
    require(budgetFrac > 0.0, s"budgetFrac=$budgetFrac must be positive")
    require((defaultShare +: shares.values.toSeq).forall(_ >= 0.0),
      "shares must be non-negative")
    val shareCol = shares.foldLeft(lit(defaultShare)) {
      case (acc, (stratum, sh)) =>
        when(col(stratumCol) === stratum, lit(sh)).otherwise(acc)
    }
    val perStratum = df.groupBy(col(stratumCol))
      .agg(sum(col(tokenCol).cast("long")).as("__stratum_tokens"))
    val total = df.agg(
      sum(col(tokenCol).cast("long")).as("__total_tokens"))
    perStratum.where(col("__stratum_tokens") > 0)
      .crossJoin(broadcast(total))
      .select(col(stratumCol),
        (shareCol * (lit(budgetFrac) * col("__total_tokens")) /
          col("__stratum_tokens")).as("rate"))
  }

  def tokenBudgetMix(df: DataFrame, stratumCol: String, tokenCol: String,
      shares: Map[String, Double], defaultShare: Double,
      budgetFrac: Double, keyCol: String, salt: String = ""): DataFrame = {
    val rates = stratumRates(df, stratumCol, tokenCol, shares,
        defaultShare, budgetFrac)
      .select(col(stratumCol), least(lit(1.0), col("rate")).as("rate"))
    df.join(broadcast(rates), Seq(stratumCol))
      .where(uniform(col(keyCol), salt) < col("rate"))
  }

  /** Multi-epoch mixture allocation — [[tokenBudgetMix]]'s
    * oversubscription rule inverted: where the budget mix CAPS a
    * stratum at one pass of its data, this REPEATS it. The
    * pretraining-recipe shape ("train on B tokens, 9% of them src0"
    * where src0 holds far fewer tokens than its allocation): each
    * stratum's allocated tokens `share * budgetFrac * total_tokens`
    * convert to an epoch count over its supply — every doc of the
    * stratum repeats `floor(rate)` times, plus one more for the
    * deterministic `frac = rate - floor(rate)` slice selected by the
    * md5 variate (so the FRACTIONAL epoch is a uniform subsample, the
    * standard final-epoch rule). Output: one row per kept doc with
    * its `n_repeats` (the loader expands; emitting n_repeats instead
    * of physically exploding keeps the export data-proportional —
    * a 40-epoch rare stratum costs one column, not 40 copies).
    *
    * Scale shape: identical to [[tokenBudgetMix]] — one integer
    * aggregate per stratum + a 1-row grand total, rates broadcast
    * back, then a narrow variate test on the scan; the corpus never
    * shuffles. Rates are one pinned IEEE chain over exact integer
    * totals; `floor` and the variate test are engine-exact, so the
    * kept set AND every repeat count are deterministic across
    * engines and partitionings.
    */
  def epochAllocation(df: DataFrame, stratumCol: String, tokenCol: String,
      shares: Map[String, Double], defaultShare: Double,
      budgetFrac: Double, keyCol: String, salt: String = ""): DataFrame = {
    val rates = stratumRates(df, stratumCol, tokenCol, shares,
      defaultShare, budgetFrac)
    df.join(broadcast(rates), Seq(stratumCol))
      .withColumn("n_repeats",
        (floor(col("rate")) +
          when(uniform(col(keyCol), salt) < col("rate") - floor(col("rate")),
            lit(1L)).otherwise(lit(0L))).cast("long"))
      .where(col("n_repeats") > 0)
  }

  /** Per-stratum QUALITY cap: the k best (scoreCol DESC, keyCol ASC)
    * keys of every stratum — the "cap any one domain's contribution,
    * keep its best documents" curation rule (a boilerplate-heavy
    * domain contributes its top k, not its volume).
    *
    * Scale shape: the bounded-state
    * [[graft.functions.TopKByScore]] aggregate — map-side partials
    * hold at most k (score, key) pairs per stratum, the exchange
    * moves O(strata × k), and merge is a bounded union; the
    * window-form equivalent shuffles and sorts EVERY row of a hot
    * stratum. The kept set equals `row_number() OVER (PARTITION BY
    * stratum ORDER BY score DESC, key) <= k` exactly (same total
    * order), so the SQL-window oracle hash-checks it. Join the
    * output (strata × k rows — broadcastable) back by key for full
    * rows.
    *
    * Contract: `keyCol` non-null numeric (cast to long), unique
    * within its stratum; `scoreCol` non-null non-NaN (NaN/null rows
    * are skipped — they carry no ranking information).
    */
  def topKByStratum(df: DataFrame, stratumCol: String, scoreCol: String,
      keyCol: String, k: Int): DataFrame = {
    require(k > 0, s"k=$k must be positive")
    df.select(col(stratumCol), col(scoreCol).cast("double").as("__s"),
        col(keyCol).cast("long").as("__k"))
      .groupBy(col(stratumCol))
      .agg(graft.functions.SketchFunctions
        .topKByScore(col("__s"), col("__k"), k).as("__keys"))
      .select(col(stratumCol), explode(col("__keys")).as(keyCol))
  }

  /** Adaptive per-group spread filter: keep rows whose `valueCol`
    * falls inside the group's OWN [lo, hi] sample quantiles — the
    * data-derived alternative to a global hand-tuned length filter
    * (a terse language's length floor differs from a verbose one's;
    * deriving bounds per group from the corpus is the standard
    * adaptive-threshold curation rule).
    *
    * Built on [[sampleQuantiles]]: bounds come from the k-row md5
    * reservoir (bounded state, every bound an ACTUAL data value —
    * engine-exact, no float-summation caveat), land as a
    * groups-sized frame that BROADCASTS back onto the corpus scan;
    * the corpus itself never shuffles. Inclusive on both ends (the
    * bounds are data values — a group at its own quantile survives).
    * Output: kept rows + their group's `lo`/`hi` provenance columns.
    */
  def adaptiveSpreadFilter(df: DataFrame, groupCol: String, valueCol: String,
      keyCol: String, k: Int, loQ: Double, hiQ: Double,
      salt: String = ""): DataFrame = {
    require(loQ >= 0.0 && hiQ <= 1.0 && loQ <= hiQ,
      s"need 0 <= loQ=$loQ <= hiQ=$hiQ <= 1")
    val loName = "p" + math.round(loQ * 100)
    val hiName = "p" + math.round(hiQ * 100)
    // sampleQuantiles names columns by rounded percent — two
    // quantiles landing on the same name would make the lo/hi selects
    // ambiguous instead of filtering a (degenerate) band
    require(loName != hiName,
      s"loQ=$loQ and hiQ=$hiQ both name column $loName — widen the band " +
        "(quantile columns are named by rounded percent)")
    val bounds = sampleQuantiles(df, groupCol, valueCol, keyCol, k,
        Seq(loQ, hiQ), salt)
      .select(col(groupCol), col(loName).as("lo"), col(hiName).as("hi"))
    df.join(broadcast(bounds), Seq(groupCol))
      .where(col(valueCol).cast("double").between(col("lo"), col("hi")))
  }
}
