package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Ordered-funnel analysis: how many users complete stage 1 → 2 → … → K
  * IN TIMESTAMP ORDER (each stage strictly after the user's first
  * qualifying hit of the previous stage) — the product-analytics query
  * engines bolt on as MATCH_RECOGNIZE / windowFunnel.
  *
  * Scale shape: NO per-user event-list collection and no sequence window.
  * Stage k is one filter + one equi-join against the (user, t_{k-1})
  * relation + one min-aggregate — every relation after stage 1 only
  * SHRINKS (funnels converge), the joins are key-shuffles AQE can
  * broadcast as stages narrow, and per-user state is a single timestamp
  * however many events a hot user has (combinable min, skew-proof). K
  * stages = K bounded passes over the (already stage-filtered) event
  * stream — at 100 TB each pass prunes on the pushed-down `event_type`
  * predicate before any shuffle.
  *
  * "First qualifying hit" semantics: t_1 = min ts of stage-1 events;
  * t_k = min ts of stage-k events with ts > t_{k-1}. Strict ordering —
  * an event at exactly t_{k-1} does not advance the funnel.
  */
object Funnel {

  /** Per-user stage-completion times: (user, t_1 … t_K nullable). */
  def userStages(events: DataFrame, userCol: String, tsCol: String,
                 typeCol: String, stages: Seq[String]): DataFrame = {
    require(stages.nonEmpty, "funnel needs at least one stage")
    val first = events.filter(col(typeCol) === stages.head)
      .groupBy(col(userCol).as("user"))
      .agg(min(col(tsCol)).as("t_1"))
    stages.zipWithIndex.drop(1).foldLeft(first) { case (prev, (stage, i)) =>
      val k = i + 1
      val next = events.filter(col(typeCol) === stage)
        .select(col(userCol).as("user"), col(tsCol).as("ts"))
        .join(prev.select(col("user"), col(s"t_$i")), Seq("user"))
        .filter(col("ts") > col(s"t_$i"))
        .groupBy(col("user")).agg(min(col("ts")).as(s"t_$k"))
      prev.join(next, Seq("user"), "left")
    }
  }

  /** Funnel census: one row per stage — (stage_no, stage, n_users reaching
    * it in order). n_users is non-increasing by construction. */
  def census(events: DataFrame, userCol: String, tsCol: String,
             typeCol: String, stages: Seq[String]): DataFrame = {
    val us = userStages(events, userCol, tsCol, typeCol, stages)
    val aggs = stages.indices.map(i => count(col(s"t_${i + 1}")).as(s"n_${i + 1}"))
    val counts = us.agg(aggs.head, aggs.tail: _*)
    counts.select(explode(array(stages.zipWithIndex.map { case (stage, i) =>
      struct(lit(i + 1).as("stage_no"), lit(stage).as("stage"),
        col(s"n_${i + 1}").as("n_users"))
    }: _*)).as("s")).select(col("s.stage_no"), col("s.stage"), col("s.n_users"))
  }
}
