package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Row-level security as parameterized views (SURVEY §1.2 / §7 hard-part 6,
  * reference src/internal/database/pg-connection.ts:65-74 +
  * src/test/rls_tests.yaml).
  *
  * The reference sets (role, sub-claims, storage.operation) GUCs per
  * connection and lets Postgres policies filter rows. Analytically: every
  * relation carries an implicit predicate parameterized by the request
  * context — here compiled to a plain `filter`, so Catalyst pushes it into
  * the scan like any other predicate.
  */
object Rls {

  final case class Context(role: String, uid: Option[String], operation: String)

  /** Declarative policy, the shape of the reference's policy matrix
    * (src/test/rls_tests.yaml): grants `permission` on rows matching
    * `predicate` to `roles`, optionally gated to specific storage operations
    * (`storage.allow_only_operation`, rls_tests.yaml:70-82). `predicate` is
    * the USING / WITH CHECK content compiled to a Column. */
  final case class Policy(
      name: String,
      roles: Set[String],
      permission: String, // select | insert | update | delete
      predicate: Context => Column,
      operations: Set[String] = Set.empty)

  /** Rows of `df` visible to `ctx` under `policies` for `permission`
    * (USING semantics): the OR of all applicable policy predicates;
    * no applicable policy → nothing. service_role bypasses RLS entirely
    * (the reference's superuser connection). Compiled to a plain filter, so
    * Catalyst pushes it into the scan like any other predicate. */
  def visible(df: DataFrame, policies: Seq[Policy], ctx: Context,
              permission: String = "select"): DataFrame =
    if (ctx.role == "service_role") df
    else df.filter(grant(policies, ctx, permission))

  /** WITH CHECK semantics in batch form: the rows of a write batch that
    * VIOLATE the policy set — "new row violates row-level security policy"
    * is `violations.nonEmpty` (rls_tests.yaml asserts, status 400). */
  def writeViolations(incoming: DataFrame, policies: Seq[Policy], ctx: Context,
                      permission: String): DataFrame =
    if (ctx.role == "service_role") incoming.limit(0)
    else incoming.filter(!grant(policies, ctx, permission))

  /** Per-row grant predicate for one permission — the building block of
    * COMPOUND operations: the reference's move is delete-free but needs
    * select+update, copy needs select+insert, upsert needs insert+update
    * (rls_tests.yaml:440-521 — move/copy succeed under exactly those policy
    * pairs and nothing less). AND the [[can]] columns per required
    * permission to grade a compound request. */
  def can(policies: Seq[Policy], ctx: Context, permission: String): Column =
    if (ctx.role == "service_role") lit(true)
    else grant(policies, ctx, permission)

  private def grant(policies: Seq[Policy], ctx: Context, permission: String): Column = {
    val applicable = policies.filter(p =>
      p.permission == permission && p.roles.contains(ctx.role) &&
        (p.operations.isEmpty || p.operations.contains(ctx.operation)))
    applicable.map(p => coalesce(p.predicate(ctx), lit(false)))
      .reduceOption(_ || _).getOrElse(lit(false))
  }

  /** Policy: service_role sees everything; authenticated users see their own
    * rows plus rows in public buckets; anon sees public-bucket reads only —
    * the policy matrix rls_tests.yaml exercises. `objects` must carry
    * owner_id; `buckets` provides (id, public). */
  def scopedObjects(objects: DataFrame, buckets: DataFrame, ctx: Context): DataFrame = {
    val pub = buckets.select(col("id").as("bucket_id"), col("public"))
    val joined = objects.join(broadcast(pub), Seq("bucket_id"), "left")
    val visible: Column = ctx.role match {
      case "service_role" => lit(true)
      case "authenticated" =>
        coalesce(col("public"), lit(false)) ||
          ctx.uid.map(col("owner_id") === _).getOrElse(lit(false))
      case _ => // anon
        coalesce(col("public"), lit(false)) && lit(ctx.operation == "read")
    }
    joined.filter(visible).drop("public")
  }
}
