package graft

import graft.functions.Validators
import graft.operators.{ObjectStore, Rls}
import org.apache.spark.sql.functions._

/** DML batch semantics (D1–D7), RLS policy matrix, validators, range math. */
class ObjectStoreSpec extends SparkTestBase {
  import spark.implicits._

  private val ts = java.sql.Timestamp.valueOf("2020-01-01 00:00:00")
  private def objs = Seq(
    ("b1", "a", "user-1", 10L, ts, "v1"),
    ("b1", "b", "user-2", 20L, ts, "v1"),
    ("b2", "a", "user-1", 30L, ts, "v1")
  ).toDF("bucket_id", "name", "owner_id", "size", "created_at", "version")

  test("D1 upsert: incoming wins on (bucket, name); others untouched") {
    val incoming = Seq(("b1", "a", "user-9", 99L, ts, "v2"),
      ("b1", "new", "user-9", 5L, ts, "v1"))
      .toDF("bucket_id", "name", "owner_id", "size", "created_at", "version")
    val got = ObjectStore.upsert(objs, incoming)
      .orderBy("bucket_id", "name")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(3), r.getString(5)))
    assert(got.toSeq == Seq(("b1", "a", 99L, "v2"), ("b1", "b", 20L, "v1"),
      ("b1", "new", 5L, "v1"), ("b2", "a", 30L, "v1")))
    // idempotent: re-applying the same batch changes nothing
    val twice = ObjectStore.upsert(ObjectStore.upsert(objs, incoming), incoming)
    assert(twice.count() == 4)
  }

  test("D2 createConflicts flags only existing (bucket, name) pairs") {
    val incoming = Seq(("b1", "a"), ("b1", "zzz")).toDF("bucket_id", "name")
    val got = ObjectStore.createConflicts(objs, incoming)
      .collect().map(r => (r.getString(0), r.getString(1)))
    assert(got.toSeq == Seq(("b1", "a")))
  }

  test("D3 updateWhere rewrites only matching rows") {
    val got = ObjectStore.updateWhere(objs, col("name") === "a",
      Map("version" -> lit("v9"), "size" -> lit(0L)))
      .orderBy("bucket_id", "name")
      .collect().map(r => (r.getString(1), r.getLong(3), r.getString(5)))
    assert(got.toSeq == Seq(("a", 0L, "v9"), ("b", 20L, "v1"), ("a", 0L, "v9")))
  }

  test("D4/D6/D7: delete returning, move, cutoff delete") {
    val (survivors, deleted) = ObjectStore.deleteWhere(objs, col("bucket_id") === "b2")
    assert(survivors.count() == 2 && deleted.count() == 1)
    val moved = ObjectStore.moveObject(objs, "b1", "a", "moved/a", "v2")
    val names = moved.filter(col("bucket_id") === "b1")
      .select("name").collect().map(_.getString(0)).toSet
    assert(names == Set("moved/a", "b"))
    val (_, cut) = ObjectStore.deleteAllBefore(objs, "b1",
      to_timestamp(lit("2021-01-01 00:00:00")))
    assert(cut.count() == 2)
  }

  test("D5 copyObject metadata directives: COPY / REPLACE / preserve") {
    val withMeta = Seq(
      ("b1", "src", "v1", "text/plain", """{"k":"v"}"""),
      ("b1", "other", "v1", "image/png", null)
    ).toDF("bucket_id", "name", "version", "mimetype", "user_metadata")
    def row(df: org.apache.spark.sql.DataFrame, n: String) =
      df.filter(col("name") === n)
        .select("version", "mimetype", "user_metadata").collect().map(r =>
          (r.getString(0), Option(r.getString(1)), Option(r.getString(2)))).head
    // COPY directive: everything verbatim
    val copy = ObjectStore.copyObject(withMeta, "b1", "src", "dst", "v2")
    assert(row(copy, "dst") == ("v2", Some("text/plain"), Some("""{"k":"v"}""")))
    // REPLACE without preserve: unspecified file metadata cleared, new user md
    val repl = ObjectStore.copyObject(withMeta, "b1", "src", "dst", "v2",
      copyMetadata = false, newUserMetadata = Some("""{"n":"1"}"""))
    assert(row(repl, "dst") == ("v2", None, Some("""{"n":"1"}""")))
    // REPLACE with preserve: unspecified mimetype kept from source
    val pres = ObjectStore.copyObject(withMeta, "b1", "src", "dst", "v2",
      copyMetadata = false, preserveUnspecifiedFileMetadata = true)
    assert(row(pres, "dst") == ("v2", Some("text/plain"), None))
    // specified file metadata always wins
    val spec = ObjectStore.copyObject(withMeta, "b1", "src", "dst", "v2",
      copyMetadata = false, newMimetype = Some("text/csv"),
      preserveUnspecifiedFileMetadata = true)
    assert(row(spec, "dst") == ("v2", Some("text/csv"), None))
    // source row untouched in every variant
    assert(row(pres, "src") == ("v1", Some("text/plain"), Some("""{"k":"v"}""")))
  }

  test("RLS policy matrix: service_role / authenticated / anon") {
    val buckets = Seq(("b1", true), ("b2", false)).toDF("id", "public")
    def visible(ctx: Rls.Context): Set[String] =
      Rls.scopedObjects(objs, buckets, ctx)
        .select(concat_ws(":", col("bucket_id"), col("name")))
        .collect().map(_.getString(0)).toSet
    assert(visible(Rls.Context("service_role", None, "read")) ==
      Set("b1:a", "b1:b", "b2:a"))
    assert(visible(Rls.Context("authenticated", Some("user-1"), "read")) ==
      Set("b1:a", "b1:b", "b2:a")) // public b1 + own row in b2
    assert(visible(Rls.Context("authenticated", Some("user-2"), "read")) ==
      Set("b1:a", "b1:b")) // public b1 only (owns nothing in b2)
    assert(visible(Rls.Context("anon", None, "read")) == Set("b1:a", "b1:b"))
    assert(visible(Rls.Context("anon", None, "write")).isEmpty)
  }

  test("P9/P10 validators") {
    assert(Validators.isValidKey("folder/file.txt"))
    assert(!Validators.isValidKey(".."))
    assert(!Validators.isValidKey("/leading"))
    assert(!Validators.isValidKey("a//b"))
    assert(!Validators.isValidKey("bad\u0001key"))
    assert(!Validators.isValidKey("x" * 1025))
    assert(Validators.isValidBucketName("my-bucket.v2"))
    assert(!Validators.isValidBucketName("x" * 101))
    assert(Validators.mimeAllowed("image/png", Seq("image/*")))
    assert(Validators.mimeAllowed("text/plain", Seq("text/plain")))
    assert(!Validators.mimeAllowed("video/mp4", Seq("image/*", "text/plain")))
    assert(Validators.mimeAllowed("anything/else", Nil))
  }

  test("file_size_limit parsing (limits.ts:146-170, 3-sig-digit semantics)") {
    assert(Validators.parseFileSizeToBytes("10mb").contains(1e7))
    assert(Validators.parseFileSizeToBytes("1.5GB").contains(1.5e9))
    assert(Validators.parseFileSizeToBytes("500kb").contains(500000.0))
    assert(Validators.parseFileSizeToBytes("12b").contains(12.0))
    // toPrecision(3): 1024 rounds to 1020 — the reference's exact behavior
    assert(Validators.parseFileSizeToBytes("1024b").contains(1020.0))
    assert(Validators.parseFileSizeToBytes("10.56mb").contains(1.06e7))
    assert(Validators.parseFileSizeToBytes("10 mb").isEmpty)
    assert(Validators.parseFileSizeToBytes("mb").isEmpty)
    assert(Validators.parseFileSizeToBytes("-5mb").isEmpty)
    assert(Validators.parseFileSizeToBytes("10tb").isEmpty)
  }

  test("S4 range math (range.ts:9-56)") {
    assert(Validators.parseRangeHeader("bytes=0-99", 1000).contains((0L, 99L)))
    assert(Validators.parseRangeHeader("bytes=500-", 1000).contains((500L, 999L)))
    assert(Validators.parseRangeHeader("bytes=-100", 1000).contains((900L, 999L)))
    assert(Validators.parseRangeHeader("bytes=0-5000", 1000).contains((0L, 999L)))
    assert(Validators.parseRangeHeader("bytes=2000-", 1000).isEmpty)
    assert(Validators.parseRangeHeader("bytes=5-2", 1000).isEmpty)
    assert(Validators.parseRangeHeader("bytes=-0", 1000).isEmpty)
    assert(Validators.parseRangeHeader("garbage", 1000).isEmpty)
  }
}
