package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling for training-data mixes (north-star ops): the
  * "take 10% of web text but 100% of reference code" step of corpus
  * assembly. Hash-based, not RNG-based — every engine, every run, every
  * partitioning picks the SAME rows, so mixes are reproducible and
  * incremental reruns are stable (the property `df.sample()` cannot give).
  */
object Sampling {

  /** Portable per-row sampling bucket in [0, 10000): the first 60 bits of
    * md5(salt ‖ key) mod 10⁴ — reproducible in any engine with md5
    * (DuckDB: `CAST('0x'||substr(md5(...),1,15) AS BIGINT) % 10000`). The
    * salt decorrelates independent sampling stages over the same keys. */
  def sampleBucket(key: Column, salt: String = ""): Column =
    pmod(conv(substring(md5(concat(lit(salt), key.cast("string"))), 1, 15), 16, 10)
      .cast("long"), lit(10000L))

  /** Portable shard assignment in [0, shards): the full 60-bit md5 value mod
    * `shards` — NOT [[sampleBucket]]'s mod-10⁴ (which would cap effective
    * shards at 10000 and correlate shard with any same-salt sampling stage).
    * DuckDB twin: `CAST('0x'||substr(md5(...),1,15) AS BIGINT) % shards`. */
  def hashShard(key: Column, shards: Int, salt: String = ""): Column =
    pmod(conv(substring(md5(concat(lit(salt), key.cast("string"))), 1, 15), 16, 10)
      .cast("long"), lit(shards.toLong))

  /** Uniform deterministic sample: keep rows whose bucket < fraction·10⁴.
    * Basis-point granularity; a pure narrow filter — no shuffle, pushes
    * into the scan alongside any other predicate. */
  def hashSample(df: DataFrame, keyCol: String, fraction: Double,
                 salt: String = ""): DataFrame = {
    require(fraction >= 0 && fraction <= 1, s"fraction $fraction out of [0,1]")
    df.filter(sampleBucket(col(keyCol), salt) < (fraction * 10000).round)
  }

  /** Importance-weighted deterministic sample: per-ROW keep probability from
    * a weight column (clamped to [0,1] — e.g. a quality score, a length
    * prior, a DoReMi-style domain weight). Same portable bucket, so reruns
    * and engines agree row for row; still a pure narrow filter — the weight
    * expression rides into the scan, no shuffle, no RNG state.
    *
    * Weight expressions should avoid exact .5 basis-point boundaries
    * (round-half behavior is the one FP edge engines could disagree on);
    * integer-derived weights like n/500.0 never land there. */
  def weightedHashSample(df: DataFrame, keyCol: String,
                         weight: Column, salt: String = ""): DataFrame =
    df.filter(sampleBucket(col(keyCol), salt) <
      round(least(greatest(weight, lit(0.0)), lit(1.0)) * 10000).cast("long"))

  /** Fixed-BUDGET deterministic sample: exactly min(k, |stratum|) rows per
    * stratum — the k with the smallest ([[sampleBucket]], key) pair — the
    * distributed, rerun-stable replacement for reservoir sampling (rate
    * samples drift in size with the data; eval sets and human-review
    * batches need exact budgets). Skew-proof by the [[Skew]] hierarchy: a
    * bounded partial top-k per (stratum, row-salt) then one merge per
    * stratum, so reducer state is O(salts·k) however hot the stratum.
    * Returns (stratum, key) rows. */
  def fixedKPerStratum(df: DataFrame, stratumCol: String, keyCol: String,
                       k: Int, salt: String = "", salts: Int = 16): DataFrame = {
    require(k >= 1, s"fixed-k sample needs k >= 1, got $k")
    val pair = struct(sampleBucket(col(keyCol), salt).as("b"),
      col(keyCol).as("key"))
    df.withColumn("_salt", pmod(monotonically_increasing_id(), lit(salts.toLong)))
      .groupBy(col(stratumCol), col("_salt"))
      .agg(slice(sort_array(collect_list(pair)), 1, k).as("_part"))
      .groupBy(col(stratumCol))
      .agg(slice(sort_array(flatten(collect_list(col("_part")))), 1, k).as("_sel"))
      .select(col(stratumCol), explode(col("_sel")).as("_s"))
      .select(col(stratumCol), col("_s.key").as(keyCol))
  }

  /** Stratified deterministic sample: per-stratum keep rates (training-mix
    * weights). The rate table is a handful of rows — it rides into the plan
    * as a broadcast join; strata absent from the map keep `defaultFraction`.
    * One narrow filter after the broadcast: no shuffle of the corpus. */
  def stratifiedHashSample(df: DataFrame, stratumCol: String, keyCol: String,
                           fractions: Map[String, Double],
                           defaultFraction: Double = 0.0,
                           salt: String = ""): DataFrame = {
    require((defaultFraction +: fractions.values.toSeq)
      .forall(f => f >= 0 && f <= 1), "fractions must be in [0,1]")
    val spark = df.sparkSession
    import spark.implicits._
    val rates = fractions.toSeq.toDF(stratumCol, "_keep_fraction")
    df.join(broadcast(rates), Seq(stratumCol), "left")
      .withColumn("_keep_bp",
        round(coalesce(col("_keep_fraction"), lit(defaultFraction)) * 10000)
          .cast("long"))
      .filter(sampleBucket(col(keyCol), salt) < col("_keep_bp"))
      .drop("_keep_fraction", "_keep_bp")
  }

  /** Data-constrained epoch planning — how a token budget is split across
    * domains when some domains are small (the repeated-epoch regime):
    * temperature-scaled weights w_d = √(tokens_d) (α = 0.5 — the standard
    * down-weighting of head domains in multilingual/multi-source training),
    * budget share ∝ w_d, and the implied repeat factor per domain, capped
    * at `maxRepeat` (returns on re-read data decay; past a handful of
    * epochs extra repeats are waste, so the cap is the planning knob).
    *
    * One partial-aggregated pass over the corpus (token counting is
    * map-side); everything after is domain-sized. Numeric discipline per
    * the house invariants: √ is correctly-rounded IEEE (identical in any
    * engine), round(·,6) then DECIMAL-cast makes the weight sum
    * associative, and the share/allocation chain is a fixed IEEE sequence
    * over operands both engines hold bit-identically.
    *
    * Returns one row per domain: (domain, n_docs, n_tokens, weight, share,
    * alloc_tokens, epochs, n_repeats). */
  def epochMixPlan(df: DataFrame, domainCol: String, textCol: String,
                   budgetMultiplier: Int = 3, maxRepeat: Int = 16): DataFrame = {
    require(budgetMultiplier >= 1 && maxRepeat >= 1,
      s"budgetMultiplier/maxRepeat must be >= 1")
    val dom = df
      .select(col(domainCol).as("domain"),
        TextAnalysis.tokenCount(col(textCol)).cast("long").as("t"))
      .filter(col("domain").isNotNull)
      .groupBy(col("domain"))
      .agg(count(lit(1)).as("n_docs"), sum(col("t")).as("n_tokens"))
      .withColumn("weight", round(sqrt(col("n_tokens").cast("double")), 6))
    val tot = dom.agg(
      sum(col("weight").cast(org.apache.spark.sql.types.DecimalType(28, 6)))
        .as("sum_w"),
      sum(col("n_tokens")).as("tot_tokens"))
    dom.crossJoin(broadcast(tot))
      .withColumn("share",
        col("weight") / col("sum_w").cast("double"))
      .withColumn("alloc_tokens",
        floor((col("tot_tokens") * budgetMultiplier).cast("double") *
          col("weight") / col("sum_w").cast("double")).cast("long"))
      .withColumn("epochs",
        col("alloc_tokens").cast("double") / col("n_tokens").cast("double"))
      .withColumn("n_repeats",
        least(ceil(col("epochs")).cast("long"), lit(maxRepeat.toLong)))
      .select(col("domain"), col("n_docs"), col("n_tokens"), col("weight"),
        col("share"), col("alloc_tokens"), col("epochs"), col("n_repeats"))
      .orderBy(col("domain"))
  }
}
