package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** D10 prefix-hierarchy maintenance in batch form (reference
  * migrations/tenant/0026-objects-prefixes.sql — `add_prefixes` :26-76,
  * `delete_prefix` :78-108, triggers :113-169; fixed in 0040/0041/0043).
  *
  * The reference keeps a `storage.prefixes(bucket_id, name, level)` table
  * that insert/update/delete triggers maintain row-by-row: inserting
  * `a/b/c.dat` upserts prefixes `a` (level 1) and `a/b` (level 2); deleting
  * an object deletes its parent prefix only when nothing else lives under it,
  * cascading upward (AFTER DELETE on prefixes re-fires the check on the
  * grandparent). The row-at-a-time trigger cascade is exactly a fixed point:
  * a prefix survives iff at least one surviving object sits beneath it.
  *
  * Batch form computes that fixed point directly — derive the prefix set
  * from the object set (one explode + distinct-aggregate, no iteration) and
  * express trigger maintenance as the DELTA between the prefix sets derived
  * before and after a mutation batch. The reference itself later abandoned
  * trigger-time maintenance for query-time derivation (0050:2-10, "WITHOUT
  * prefixes table") — this operator is the stored-table semantics for
  * deployments that still carry it.
  */
object PrefixIndex {

  /** `storage.prefixes` derived from an objects relation: one row per
    * distinct (bucket_id, ancestor-folder), `level` = 1-based segment count
    * (get_level, 0026:1-9). `a/b/c.dat` yields `a` and `a/b` — the leaf is
    * an object, not a prefix. Keeps a per-prefix live-object count (`n_under`)
    * so the delete-side check (delete_prefix, 0026:86-101) is a column read,
    * not a correlated probe. */
  // CASE-guarded: Spark's sequence(1, 0) is DESCENDING [1, 0], not
  // empty, so a root-level name would fabricate bogus prefixes
  private val explodedPrefixes = explode(expr(
    "CASE WHEN size(split(name, '/')) > 1 THEN" +
      " transform(sequence(1, size(split(name, '/')) - 1)," +
      " i -> array_join(slice(split(name, '/'), 1, i), '/'))" +
      " ELSE array() END"))

  def derivePrefixes(objects: DataFrame): DataFrame = {
    objects
      .select(col("bucket_id"), explodedPrefixes.as("prefix"))
      .groupBy(col("bucket_id"), col("prefix"))
      .agg(count(lit(1)).as("n_under"))
      .withColumn("level", size(split(col("prefix"), "/")).cast("long"))
  }

  /** Trigger-cascade delta for a delete batch: given the relation before and
    * after the mutation, returns the prefix rows the cascade would remove
    * (`op = 'delete'`, objects_delete_delete_prefix → delete_prefix upward
    * cascade) and — for an insert batch — the rows `add_prefixes` would
    * create (`op = 'insert'`). Anti-joins of the two derived fixed points;
    * both sides shuffle once on (bucket_id, prefix). */
  def prefixDelta(before: DataFrame, after: DataFrame): DataFrame = {
    val b = derivePrefixes(before).select(col("bucket_id"), col("prefix"), col("level"))
    val a = derivePrefixes(after).select(col("bucket_id"), col("prefix"), col("level"))
    val removed = b.join(a, Seq("bucket_id", "prefix"), "left_anti")
      .withColumn("op", lit("delete"))
    val added = a.join(b, Seq("bucket_id", "prefix"), "left_anti")
      .withColumn("op", lit("insert"))
    removed.unionByName(added)
  }

  /** The same trigger-cascade delta computed from the MUTATION, not the
    * corpus: prefix support can only change at prefixes derived from the
    * doomed or inserted rows, so candidates = derivePrefixes(doomed) ∪
    * derivePrefixes(inserted) — |mutation|-sized — and each candidate is
    * probed for a supporting object ("does any name live under p/?") with
    * a first-segment equi-join + prefix range check. At 100 TB this is the
    * difference between re-exploding every name in the corpus twice per
    * batch (prefixDelta: shuffle ∝ corpus × depth) and work proportional
    * to the mutation (shuffle ∝ |batch|; the corpus is scanned once per
    * probe side with the candidate set broadcast). PrefixIndexSpec pins
    * equivalence with the full diff on randomized mutations.
    *
    *  - removed = prefixes of `doomed` with NO supporter left in `after`
    *    (the upward cascade falls out: a parent prefix of a doomed leaf is
    *    itself a candidate, and survives iff anything else lives under it)
    *  - added = prefixes of `inserted` that had NO supporter in `before`
    */
  def prefixDeltaIncremental(before: DataFrame, after: DataFrame,
                             doomed: DataFrame, inserted: DataFrame): DataFrame = {
    def unsupported(cands: DataFrame, corpus: DataFrame): DataFrame = {
      val c = cands.select(col("bucket_id"), col("prefix"), col("level"))
      // Stream the corpus ONCE: explode each name to its ancestor prefixes
      // map-side and keep only rows hitting the BROADCAST mutation-sized
      // candidate set, so the only shuffle is the distinct over matched
      // candidates (≤ |candidates| after partial aggregation) — never
      // corpus × depth. The previous shape filtered the corpus to "touched
      // first-segment subtrees" but then re-ran the full derivePrefixes
      // groupBy over them; on a flat namespace (few distinct first
      // segments — this fixture has 3) that degenerated to re-aggregating
      // the whole corpus per probe side (r13: 2.55 s → see bench A/B).
      // The broadcast is mutation-sized by the operator's own contract
      // (work ∝ |batch|), the same bound the old seg0 broadcast relied on.
      val matched = corpus
        .select(col("bucket_id"), explodedPrefixes.as("prefix"))
        .join(broadcast(c.select(col("bucket_id"), col("prefix"))),
          Seq("bucket_id", "prefix"), "left_semi")
        .distinct()
      c.join(matched, Seq("bucket_id", "prefix"), "left_anti")
        .select(col("bucket_id"), col("prefix"), col("level"))
    }
    val removed = unsupported(derivePrefixes(doomed), after)
      .withColumn("op", lit("delete"))
    val added = unsupported(derivePrefixes(inserted), before)
      .withColumn("op", lit("insert"))
    removed.unionByName(added)
  }
}
