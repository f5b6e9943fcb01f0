package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for LLM training pipelines: assign documents to
  * fixed-token-budget training sequences ("pack 512-token context windows").
  * This is the chunk-boundary formulation (every doc lands in the bin where
  * its cumulative token span ends; an oversized doc spans bins but is
  * ASSIGNED to one) — the deterministic, engine-portable variant of greedy
  * first-fit, which is inherently sequential and order-sensitive.
  *
  * Scale shape: packing is sharded by a portable hash of the id
  * ([[Sampling.sampleBucket]]), so the only wide ops are one hash-partition
  * by shard and a per-shard sort — `shards` independent window tasks, no
  * global order. At 1000 executors set `shards` to a few × total cores;
  * each task streams its shard once (cumulative sum is O(n) per shard).
  * A single global window (no shard column) would serialize the corpus
  * through one task — the classic window-function scale killer this
  * construction exists to avoid.
  */
object Packing {

  /** Adds `shard`, `cum_tokens`, `seq_id` to `df`: shard = portable hash of
    * the id mod `shards`; within a shard (ordered by id) docs fill
    * consecutive `budget`-token bins; `seq_id` = bin index of each doc's
    * cumulative END token ((cum−1) div budget — integer-exact in any engine
    * below 2^53 total tokens per shard). */
  def assignBins(df: DataFrame, idCol: String, tokenCol: String,
                 budget: Int, shards: Int, salt: String = ""): DataFrame = {
    require(budget > 0, s"budget $budget must be positive")
    require(shards > 0, s"shards $shards must be positive")
    val w = Window.partitionBy(col("shard")).orderBy(col(idCol))
    // full-width hash shard (NOT the mod-10⁴ sampling bucket — that would cap
    // shards at 10⁴ and correlate with same-salt sampling stages)
    df.withColumn("shard", Sampling.hashShard(col(idCol), shards, salt))
      // null-token docs count as 0 so they never poison the cumulative sum
      .withColumn("cum_tokens", sum(coalesce(col(tokenCol), lit(0))).over(w))
      // exact double division of integers (< 2^53), then floor — identical
      // in every IEEE engine, unlike `/` whose int-vs-float semantics differ;
      // greatest(…, 0) pins zero-token leading docs to bin 0, not bin −1
      .withColumn("seq_id",
        floor(greatest(col("cum_tokens") - 1, lit(0L)) / lit(budget)).cast("long"))
  }

  /** Per-bin packing stats: doc count, token total, id span, fill ratio
    * (single exact int/int double division — no rounding needed). Bins other
    * than a shard's last have fill ≥ 1 − (maxDocTokens−1)/budget; oversized
    * docs push fill above 1 (they span into following bins). */
  def packStats(assigned: DataFrame, idCol: String, tokenCol: String,
                budget: Int): DataFrame =
    assigned.groupBy(col("shard"), col("seq_id"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col(tokenCol)).cast("long").as("n_tokens"),
        min(col(idCol)).as("first_doc"),
        max(col(idCol)).as("last_doc"))
      .withColumn("fill_ratio", col("n_tokens").cast("double") / lit(budget.toDouble))

  /** Epoch-shuffle shard manifest — the GLOBAL SHUFFLE step of training-data
    * prep: every epoch reads the corpus in a different, deterministic,
    * rerun-stable order. Each (epoch, doc) gets a permutation key
    * h = md5₆₀(salt‖epoch‖'|'‖id); shard = h mod `shards`; the within-shard
    * read order is (h, id). That is a fresh pseudorandom permutation per
    * epoch with zero RNG state — any engine, any partitioning, any rerun
    * deals the same order (the property `orderBy(rand())` can never give).
    *
    * The census pins the ENTIRE permutation in exact integers: per
    * (epoch, shard) the row_number-weighted id sum Σ rank·id changes if any
    * two docs swap places, so the oracle's hash match certifies the full
    * order, not just membership. `first_doc` (min-hash doc) differing
    * across epochs is the visible "new deal" evidence.
    *
    * Scale shape: the explode fans the corpus ×epochs (epochs is small);
    * ranking windows partition by (epoch, shard) — `epochs·shards`
    * independent sorted tasks, no global order anywhere. */
  def epochShuffleManifest(df: DataFrame, idCol: String, tokenCol: String,
                           epochs: Int, shards: Int,
                           salt: String = ""): DataFrame = {
    require(epochs > 0 && shards > 0, "epochs and shards must be positive")
    // Column API + lit(salt), NOT string interpolation into expr(): a salt
    // containing a quote would otherwise splice into the SQL text (and any
    // non-identifier idCol would break parsing)
    val h = conv(substring(md5(concat(lit(salt), col("epoch").cast("string"),
      lit("|"), col(idCol).cast("string"))), 1, 15), 16, 10).cast("long")
    val w = Window.partitionBy(col("epoch"), col("shard"))
      .orderBy(col("h"), col(idCol))
    df.select(col(idCol), coalesce(col(tokenCol), lit(0)).as("toks"))
      .withColumn("epoch", explode(sequence(lit(0), lit(epochs - 1))))
      .withColumn("h", h)
      .withColumn("shard", pmod(col("h"), lit(shards.toLong)))
      .withColumn("rank", row_number().over(w))
      .groupBy(col("epoch"), col("shard"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("toks")).cast("long").as("n_tokens"),
        min(struct(col("h"), col(idCol))).getField(idCol).as("first_doc"),
        sum(col("rank") * col(idCol)).as("order_checksum"))
      .orderBy(col("epoch"), col("shard"))
  }
}
