package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** P1 dynamic column projection — the reference's `selectColumns` compiler
  * with its migration-policy filters (src/storage/database/columns.ts:37-96,
  * semantics mirrored test-for-test from columns.test.ts):
  * user column lists are parsed, trimmed, policy-filtered
  * (user_metadata / multipart metadata / bucket `type`), validated as
  * identifiers, defaulted to `id` when empty, and the synthetic-bucket
  * policy appends `'STANDARD' AS type`.
  */
object Columns {

  final case class Policy(
      excludeUserMetadata: Boolean = false,
      excludeMultipartMetadata: Boolean = false,
      excludeBucketType: Boolean = false,
      syntheticBucketType: Boolean = false)

  object Policy {
    val none: Policy = Policy()
    val objectWithoutUserMetadata: Policy = Policy(excludeUserMetadata = true)
    val multipartWithoutMetadata: Policy = Policy(excludeMultipartMetadata = true)
    val multipartWithoutUserOrMultipartMetadata: Policy =
      Policy(excludeUserMetadata = true, excludeMultipartMetadata = true)
    val bucketWithoutType: Policy = Policy(excludeBucketType = true)
    val syntheticBucket: Policy = Policy(syntheticBucketType = true)
  }

  sealed trait Sel
  case object Star extends Sel
  final case class Named(name: String) extends Sel
  case object SyntheticType extends Sel

  private val ident = "^[A-Za-z_][A-Za-z0-9_$]*$".r

  /** columns.ts:52-92, including the empty-entry bookkeeping that decides
    * whether `'type,'` keeps a default `id` next to the synthetic type. */
  def compile(columns: String, policy: Policy = Policy.none): Seq[Sel] = {
    var selected = Vector.empty[Sel]
    var addSynthetic = false
    var requestedReal = false
    columns.split(",", -1).foreach { v =>
      val c = v.trim
      if (c.isEmpty) {
        if (policy.syntheticBucketType) requestedReal = true
      } else if (c == "user_metadata" && policy.excludeUserMetadata) ()
      else if (c == "metadata" && policy.excludeMultipartMetadata) ()
      else if (c == "type" && policy.syntheticBucketType) addSynthetic = true
      else if (c == "type" && policy.excludeBucketType) ()
      else {
        requestedReal = true
        if (c == "*") selected :+= Star
        else {
          require(ident.matches(c), s"Invalid identifier: $c")
          selected :+= Named(c)
        }
      }
    }
    if (addSynthetic) {
      if (selected.isEmpty && requestedReal) selected :+= Named("id")
      selected :+= SyntheticType
    }
    if (selected.isEmpty) Seq(Named("id")) else selected
  }

  /** Apply a compiled column list as a projection. */
  def project(df: DataFrame, columns: String, policy: Policy = Policy.none): DataFrame =
    df.select(compile(columns, policy).map[Column] {
      case Star => col("*")
      case Named(n) => col(n)
      case SyntheticType => lit("STANDARD").as("type")
    }: _*)
}
