package graft

import graft.operators.Listing
import org.apache.spark.sql.functions._

/** Test-for-test port of the reference's list-v2 sorting matrix
  * (/root/reference/src/test/object-list-v2.test.ts:205-573): 30 `toName`
  * entries (1..3 uppercased — exercising COLLATE "C" byte order, where
  * uppercase sorts before lowercase), folders i<18 with nested children
  * (9 under 'aal', else 3), root objects i>5, created in a deterministic
  * shuffle, then 10 root objects "re-uploaded" so updated_at diverges.
  * Expected orders derive from the CONSTRUCTION (insertion indexes, JS-sort
  * equivalents), not from re-running the operator under test. */
class ListV2SortingSpec extends SparkTestBase {
  import spark.implicits._

  private def toName(n: Int): String = {
    val a = 'a'.toInt
    val s = "" + (a + (n / (26 * 26)) % 26).toChar +
      (a + (n / 26) % 26).toChar + (a + n % 26).toChar
    if (n >= 1 && n <= 3) s.toUpperCase else s
  }

  // fixture construction — mirrors the reference test's beforeAll
  private val sortedObjects = (6 until 30).map(toName(_) + ".txt").sorted
  private val folderNames = (0 until 18).map(toName) // without trailing '/'
  private val nested = folderNames.flatMap { f =>
    val n = if (f == "aal") 9 else 3
    (0 until n).map(j => s"$f/dummy-$f-$j.txt")
  }
  private val allPaths = (sortedObjects ++ nested).sorted
  private val shuffled = new scala.util.Random(7L).shuffle(allPaths.toList)

  private val creationOrderObjects = shuffled.filterNot(_.contains("/"))
  private val creationOrderFolders = shuffled.flatMap(p =>
    if (p.contains("/")) Some(p.split("/")(0)) else None).distinct
  // reference: shift 10 root objects off the front, re-upload, append at back
  private val updateOrderObjects =
    creationOrderObjects.drop(10) ++ creationOrderObjects.take(10)

  private val t0 = java.time.Instant.parse("2024-01-01T00:00:00Z")
  private lazy val objects = {
    val created = shuffled.zipWithIndex.map { case (p, i) =>
      (p, "LV2", java.sql.Timestamp.from(t0.plusSeconds(i.toLong)))
    }
    val updatedAt = creationOrderObjects.take(10).zipWithIndex.map {
      case (p, j) => p -> java.sql.Timestamp.from(t0.plusSeconds(10000L + j))
    }.toMap
    created.map { case (p, b, cts) =>
      (p, b, 0L, cts, updatedAt.getOrElse(p, cts))
    }.toDF("name", "bucket_id", "size", "created_at", "updated_at")
  }

  private def page(sortCol: String, order: String): (Seq[String], Seq[String]) = {
    val rows = Listing.sortedListingV2(objects, "LV2", "", sortCol, order, 1500)
      .select(col("name"), col("is_prefix")).collect()
    (rows.filter(!_.getBoolean(1)).map(_.getString(0)).toSeq,
      rows.filter(_.getBoolean(1)).map(_.getString(0)).toSeq)
  }

  test("name asc/desc: byte order, uppercase folders first (COLLATE C)") {
    val (objsAsc, foldersAsc) = page("name", "asc")
    assert(objsAsc == sortedObjects)
    assert(foldersAsc == folderNames.sorted)
    assert(foldersAsc.take(3) == Seq("AAB", "AAC", "AAD"),
      "uppercase must sort before lowercase in byte order")
    val (objsDesc, foldersDesc) = page("name", "desc")
    assert(objsDesc == sortedObjects.reverse)
    assert(foldersDesc == folderNames.sorted.reverse)
  }

  test("created asc/desc: objects by insertion, folders by first child") {
    val (objsAsc, foldersAsc) = page("created_at", "asc")
    assert(objsAsc == creationOrderObjects)
    assert(foldersAsc == creationOrderFolders)
    val (objsDesc, foldersDesc) = page("created_at", "desc")
    assert(objsDesc == creationOrderObjects.reverse)
    assert(foldersDesc == creationOrderFolders.reverse)
  }

  test("updated asc/desc: re-uploaded objects move to the end; folders keep MIN(created)") {
    val (objsAsc, foldersAsc) = page("updated_at", "asc")
    assert(objsAsc == updateOrderObjects)
    // folders aggregate MIN(child created_at) as updated_at (0050:726), so
    // child updates never move a folder
    assert(foldersAsc == creationOrderFolders)
    val (objsDesc, _) = page("updated_at", "desc")
    assert(objsDesc == updateOrderObjects.reverse)
  }

  test("last_accessed_at sort works without the column (epoch-coalesced)") {
    // regression: the whitelist accepted last_accessed_at but the projection
    // dropped it — the sort now resolves, with every key coalescing to epoch
    // (folders are NULL by 0050:733; this fixture has no column at all), so
    // the order degrades to the byte-ordered name tiebreak
    val rows = Listing.sortedListingV2(objects, "LV2", "", "last_accessed_at",
      "asc", 1500).select("name").collect().map(_.getString(0)).toSeq
    assert(rows == (folderNames ++ sortedObjects).sorted)
  }

  test("O5 cursor pages tile the updated_at desc listing without gaps") {
    val full = Listing.sortedListingV2(objects, "LV2", "", "updated_at", "desc", 1500)
      .select("name").collect().map(_.getString(0)).toSeq
    val p1 = Listing.sortedListingV2(objects, "LV2", "", "updated_at", "desc", 20)
      .collect()
    val last = p1.last
    val lastTs = last.getAs[java.sql.Timestamp]("updated_at")
    val after = Some((Option(lastTs).map(_.toString).getOrElse(""),
      last.getAs[String]("name")))
    val p2 = Listing.sortedListingV2(objects, "LV2", "", "updated_at", "desc", 1500,
      after).select("name").collect().map(_.getString(0)).toSeq
    assert(p1.map(_.getAs[String]("name")).toSeq ++ p2 == full)
  }
}
