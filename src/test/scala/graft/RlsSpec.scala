package graft

import graft.operators.Rls
import graft.operators.Rls.{Context, Policy}
import org.apache.spark.sql.functions._

/** Declarative RLS matrix, mirroring the reference's policy spec
  * (src/test/rls_tests.yaml: policies × roles × operations). USING = row
  * visibility, WITH CHECK = write-batch violations; service_role bypasses.
  */
class RlsSpec extends SparkTestBase {
  import spark.implicits._

  //  (name, owner, mimetype, content_length, department)
  private val objects = Seq(
    ("a.png", "u1", "image/png", 50000L, "engineering"),
    ("b.pdf", "u1", "application/pdf", 200000L, "sales"),
    ("c.png", "u2", "image/png", 99999L, "engineering"),
    ("d.txt", "u2", "text/plain", 10L, "engineering")).toDF(
    "name", "owner", "mimetype", "content_length", "department")

  // the yaml policies, compiled (rls_tests.yaml:1-83)
  private val readOwn = Policy("read_only_all_objects", Set("authenticated"),
    "select", ctx => col("owner") === ctx.uid.orNull)
  private val insertOwnCheck = Policy("insert_only_all_objects", Set("authenticated"),
    "insert", ctx => lit(ctx.uid.isDefined))
  private val insertImages = Policy("insert_only_images", Set("authenticated"),
    "insert", _ => col("mimetype").startsWith("image/"))
  private val insertMaxSize = Policy("insert_max_size_limit", Set("authenticated"),
    "insert", _ => col("content_length") <= 100000L)
  private val insertDept = Policy("insert_with_metadata_check", Set("authenticated"),
    "insert", _ => col("department") === "engineering")
  private val readListOnly = Policy("read_only_list_objects", Set("authenticated"),
    "select", ctx => col("owner") === ctx.uid.orNull,
    operations = Set("object.list"))

  private def names(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.select("name").collect().map(_.getString(0)).toSeq.sorted

  test("USING: owner-scoped select sees only own rows; other roles see nothing") {
    val u1 = Context("authenticated", Some("u1"), "object.list")
    assert(names(Rls.visible(objects, Seq(readOwn), u1)) == Seq("a.png", "b.pdf"))
    val anon = Context("anon", None, "object.list")
    assert(Rls.visible(objects, Seq(readOwn), anon).isEmpty)
  }

  test("no applicable policy → no rows (deny by default)") {
    val ctx = Context("authenticated", Some("u1"), "object.list")
    assert(Rls.visible(objects, Seq(insertImages), ctx, "select").isEmpty)
  }

  test("service_role bypasses RLS") {
    val ctx = Context("service_role", None, "object.list")
    assert(names(Rls.visible(objects, Nil, ctx)) == Seq("a.png", "b.pdf", "c.png", "d.txt"))
    assert(Rls.writeViolations(objects, Nil, ctx, "insert").isEmpty)
  }

  test("WITH CHECK: no insert policy → every row violates (yaml test 1: upload 400)") {
    val ctx = Context("authenticated", Some("u1"), "upload")
    assert(Rls.writeViolations(objects, Seq(readOwn), ctx, "insert").count() == 4)
    // granting insert_only_all_objects clears the violation (yaml: then 200)
    assert(Rls.writeViolations(objects, Seq(readOwn, insertOwnCheck), ctx, "insert").isEmpty)
  }

  test("WITH CHECK content predicates: mimetype LIKE / size cap / metadata field") {
    val ctx = Context("authenticated", Some("u1"), "upload")
    assert(names(Rls.writeViolations(objects, Seq(insertImages), ctx, "insert"))
      == Seq("b.pdf", "d.txt"))
    assert(names(Rls.writeViolations(objects, Seq(insertMaxSize), ctx, "insert"))
      == Seq("b.pdf"))
    assert(names(Rls.writeViolations(objects, Seq(insertDept), ctx, "insert"))
      == Seq("b.pdf"))
    // policies compose as OR of grants: image OR small
    assert(names(Rls.writeViolations(objects, Seq(insertImages, insertMaxSize),
      ctx, "insert")) == Seq("b.pdf"))
  }

  test("operation-scoped policy (allow_only_operation)") {
    val list = Context("authenticated", Some("u1"), "object.list")
    val get = Context("authenticated", Some("u1"), "object.get")
    assert(names(Rls.visible(objects, Seq(readListOnly), list)) == Seq("a.png", "b.pdf"))
    assert(Rls.visible(objects, Seq(readListOnly), get).isEmpty)
  }

  test("matrix census cells: anon delete-deny, owner-scoped delete, service_role bypass") {
    val policies = Seq(
      Policy("read_public", Set("anon", "authenticated"), "select",
        _ => col("department") === "engineering"),
      Policy("delete_own", Set("authenticated"), "delete",
        ctx => col("owner") === ctx.uid.orNull))
    // anon has a select grant but NO delete policy → delete denies entirely
    assert(names(Rls.visible(objects, policies, Context("anon", None, "object.list")))
      == Seq("a.png", "c.png", "d.txt"))
    assert(Rls.visible(objects, policies, Context("anon", None, "object.list"), "delete").isEmpty)
    assert(names(Rls.visible(objects, policies,
      Context("authenticated", Some("u2"), "object.list"), "delete")) == Seq("c.png", "d.txt"))
    assert(Rls.visible(objects, policies,
      Context("service_role", None, "object.list"), "delete").count() == 4)
  }

  test("cross-owner update-deny: gate-closed operation leaves only the owner grant") {
    val policies = Seq(
      Policy("owner_update", Set("authenticated"), "update",
        ctx => col("owner") === ctx.uid.orNull),
      Policy("upload_window", Set("authenticated"), "update",
        _ => col("mimetype").startsWith("image/"), operations = Set("upload")))
    // operation 'object.get' ≠ 'upload': image window closed, u1 may only
    // touch its own rows — c.png/d.txt (u2's) are denied
    val deny = Context("authenticated", Some("u1"), "object.get")
    assert(names(Rls.writeViolations(objects, policies, deny, "update"))
      == Seq("c.png", "d.txt"))
    // during 'upload' the image window opens: only the cross-owner NON-image
    // row still violates
    val open = Context("authenticated", Some("u1"), "upload")
    assert(names(Rls.writeViolations(objects, policies, open, "update"))
      == Seq("d.txt"))
  }

  test("service_role delete-bypass: the same batch rejects nothing") {
    val policies = Seq(Policy("delete_own", Set("authenticated"), "delete",
      ctx => col("owner") === ctx.uid.orNull))
    val auth = Context("authenticated", Some("u1"), "storage")
    assert(names(Rls.writeViolations(objects, policies, auth, "delete"))
      == Seq("c.png", "d.txt"))
    val svc = Context("service_role", None, "storage")
    assert(Rls.writeViolations(objects, policies, svc, "delete").isEmpty)
  }

  test("compound operations AND the per-permission grants (move=select+update)") {
    val policies = Seq(
      Policy("read_all", Set("authenticated"), "select", _ => lit(true)),
      Policy("update_own", Set("authenticated"), "update",
        ctx => col("owner") === ctx.uid.orNull))
    val ctx = Context("authenticated", Some("u1"), "storage")
    val moveOk = objects
      .filter(Rls.can(policies, ctx, "select") && Rls.can(policies, ctx, "update"))
    // move needs select (granted on all) AND update (owner only): u1's rows
    assert(names(moveOk) == Seq("a.png", "b.pdf"))
    // copy = select+insert: no insert policy in this set -> nothing passes
    val copyOk = objects
      .filter(Rls.can(policies, ctx, "select") && Rls.can(policies, ctx, "insert"))
    assert(copyOk.isEmpty)
    // service_role: every permission short-circuits to true
    val svc = Context("service_role", None, "storage")
    assert(objects.filter(Rls.can(policies, svc, "delete")).count() == 4)
  }

  test("RLS predicate pushes into the scan (no post-filter barrier)") {
    val ctx = Context("authenticated", Some("u1"), "object.list")
    val plan = Rls.visible(objects, Seq(readOwn), ctx)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), "RLS filter must not introduce a shuffle")
  }
}
