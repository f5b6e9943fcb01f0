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
