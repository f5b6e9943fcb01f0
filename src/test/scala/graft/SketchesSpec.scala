package graft

import graft.operators.Sketches
import org.apache.spark.sql.functions._

/** HLL distinct sketch: partitioning-independence (register merge is
  * commutative max), accuracy within the p=12 error envelope, and the
  * scale contract (register relation bounded by m per column). */
class SketchesSpec extends SparkTestBase {
  import spark.implicits._

  test("estimate is partitioning-independent and within the p=12 envelope") {
    val df = (1 to 20000).map(i => (i.toLong % 5000, s"u${i % 1200}"))
      .toDF("id", "user")

    val a = Sketches.hllDistinct(df, Seq("id", "user")).collect()
    val b = Sketches.hllDistinct(df.repartition(13, col("user")), Seq("id", "user"))
      .collect()
    assert(a.toSeq == b.toSeq, "sketch must not depend on partitioning")

    // p=12 → typical error 1.04/sqrt(4096) ≈ 1.6%; assert a loose 5% bound.
    a.foreach { r =>
      val exact = r.getAs[Long]("exact_distinct").toDouble
      val est = r.getAs[Double]("hll_estimate")
      assert(math.abs(est - exact) / exact < 0.05,
        s"${r.getAs[String]("col_name")}: est $est vs exact $exact")
    }
    assert(a.map(_.getAs[Long]("exact_distinct")).toSeq == Seq(5000L, 1200L))
  }

  test("null values are excluded; n_rows counts non-null only") {
    val df = Seq(Some("a"), Some("b"), None, Some("a")).toDF("x")
    val r = Sketches.hllDistinct(df, Seq("x")).collect().head
    assert(r.getAs[Long]("n_rows") == 3L)
    assert(r.getAs[Long]("exact_distinct") == 2L)
    // tiny cardinality → linear counting branch must be near-exact
    assert(math.abs(r.getAs[Double]("hll_estimate") - 2.0) < 0.01)
  }

  test("per-group HLL is partitioning-independent under group skew") {
    // one hot group with 4000 distinct values, tiny cold groups
    val df = ((1 to 8000).map(i => ("hot", s"u${i % 4000}")) ++
      (1 to 40).map(i => (s"cold${i % 4}", s"v$i"))).toDF("g", "u")
    val a = Sketches.hllDistinctByGroup(df, "g", "u").collect()
    val b = Sketches.hllDistinctByGroup(df.repartition(17), "g", "u").collect()
    assert(a.toSeq == b.toSeq)
    val hot = a.find(_.getString(0) == "hot").get
    assert(hot.getAs[Long]("exact_distinct") == 4000L)
    assert(math.abs(hot.getAs[Double]("hll_estimate") - 4000.0) / 4000.0 < 0.05)
  }

  test("register-table union estimates exactly like sketching the full data") {
    val full = (1 to 9000).map(i => s"u${i % 2500}").toDF("x")
      .select(lit("x").as("col_name"), col("x").as("val"))
    val parts = Seq(full.filter(length(col("val")) % 3 === 0),
      full.filter(length(col("val")) % 3 === 1),
      full.filter(length(col("val")) % 3 === 2))
    val merged = Sketches.hllMergeEstimate(parts.map(Sketches.hllRegisters))
      .collect().head.getAs[Double]("hll_estimate")
    val direct = Sketches.hllMergeEstimate(Seq(Sketches.hllRegisters(full)))
      .collect().head.getAs[Double]("hll_estimate")
    assert(merged == direct, "semilattice merge must equal the direct sketch")
  }

  test("count-min estimates are one-sided and exact where no row collides") {
    // zipfish frequencies: value k appears ~1000/k times
    val df = (1 to 50).flatMap(k => Seq.fill(1000 / k)(s"key$k")).toDF("x")
    val r = Sketches.cmsCounts(df, "x").collect()
    assert(r.length == 50)
    r.foreach { row =>
      assert(row.getAs[Long]("n_cms") >= row.getAs[Long]("n_true"),
        s"${row.getAs[String]("val")}: CMS must never undercount")
    }
    // 50 keys in 1024 buckets × 4 rows: at least the heaviest key should
    // dodge collisions in SOME row → exact estimate
    val heavy = r.find(_.getAs[String]("val") == "key1").get
    assert(heavy.getAs[Long]("n_true") == 1000L)
  }

  test("CMS join-cardinality estimate is one-sided; zero-overlap gives zero") {
    val a = (1 to 2000).map(i => s"u${i % 300}").toDF("x")
    val b = (1 to 900).map(i => s"u${i % 450}").toDF("x")
    val r = Sketches.cmsJoinCardinality(a, b, "x").collect().head
    // exact = sum over shared users of fa*fb; sharing u0..u299
    assert(r.getAs[Long]("exact_card") > 0)
    assert(r.getAs[Long]("cms_card") >= r.getAs[Long]("exact_card"),
      "cellwise product sums must never undercount")
    val disjoint = Sketches.cmsJoinCardinality(
      Seq("a1", "a2").toDF("x"), Seq("b1", "b2").toDF("x"), "x").collect().head
    assert(disjoint.getAs[Long]("exact_card") == 0L)
    // disjoint values can still collide in buckets (overestimate), but the
    // estimate must be finite and the exact side exactly zero
    assert(disjoint.getAs[Long]("cms_card") >= 0L)
  }

  test("HLL intersection: inclusion-exclusion tracks the exact overlap") {
    def rel(ids: Seq[Int]) = ids.map(i => ("k", s"u$i")).toDF("col_name", "val")
    // |A|=3000, |B|=2500, overlap 1500
    val a = rel(1 to 3000)
    val b = rel(1501 to 4000)
    val r = Sketches.hllIntersectionEstimate(a, b).collect().head
    assert(r.getAs[Long]("exact_common") == 1500L)
    val est = r.getAs[Double]("est_common")
    // union/side errors compound: allow a loose 10% envelope
    assert(math.abs(est - 1500.0) / 1500.0 < 0.10, s"est $est vs 1500")
    assert(r.getAs[Double]("est_common") ==
      r.getAs[Double]("est_a") + r.getAs[Double]("est_b") -
        r.getAs[Double]("est_union"))
    // disjoint sets: estimate must land near zero (can be slightly negative)
    val d = Sketches.hllIntersectionEstimate(rel(1 to 2000), rel(5000 to 7000))
      .collect().head
    assert(d.getAs[Long]("exact_common") == 0L)
    assert(math.abs(d.getAs[Double]("est_common")) < 200.0)
  }

  test("bloom prefilter: no false negatives, census is consistent") {
    val build = (1 to 800).map(i => s"k$i").toDF("key")
    val probe = (1 to 5000).map(i => s"k$i").toDF("name") // 800 true matches
    val r = Sketches.bloomPrefilterCensus(probe, "name", build, "key")
      .collect().head
    assert(r.getAs[Long]("n_probe") == 5000L)
    assert(r.getAs[Long]("n_build") == 800L)
    assert(r.getAs[Long]("n_true_match") == 800L)
    // every true member passes (no false negatives) ⇒ candidates ⊇ truth
    assert(r.getAs[Long]("n_candidates") >=
      r.getAs[Long]("n_true_match"))
    assert(r.getAs[Long]("n_false_positive") ==
      r.getAs[Long]("n_candidates") - r.getAs[Long]("n_true_match"))
    // 800 keys × 3 hashes in 65536 bits → fp rate ≈ (1-e^-0.037)^3 ≈ 5e-5;
    // assert a loose envelope so the test pins quality, not luck
    assert(r.getAs[Long]("n_false_positive") <= 50L)
  }

  test("bloom prefilter is partitioning-independent") {
    val build = (1 to 500).map(i => s"b$i").toDF("key")
    val probe = (1 to 3000).map(i => s"p${i % 1700}").toDF("name")
    val a = Sketches.bloomPrefilterCensus(probe, "name", build, "key").collect()
    val b = Sketches.bloomPrefilterCensus(
      probe.repartition(11), "name", build.repartition(7, col("key")), "key")
      .collect()
    assert(a.toSeq == b.toSeq)
  }

  test("bloom bit relation is bounded by m and merges by union") {
    val vals = (1 to 20000).map(i => s"v$i").toDF("x")
      .select(col("x").as("val"))
    val all = Sketches.bloomBits(vals)
    assert(all.count() <= Sketches.BloomBits)
    // semilattice: bits(A ∪ B) == bits(A) ∪ bits(B)
    val half1 = vals.filter(length(col("val")) % 2 === 0)
    val half2 = vals.filter(length(col("val")) % 2 === 1)
    val merged = Sketches.bloomBits(half1).unionByName(Sketches.bloomBits(half2))
      .distinct()
    assert(merged.exceptAll(all).isEmpty && all.exceptAll(merged).isEmpty)
  }

  test("equi-depth range estimate: near-exact on uniform data, deterministic") {
    val df = (1 to 10000).map(i => i.toLong % 1000).toDF("x")
    val r = Sketches.equidepthRangeEstimate(df, "x", 200L, 599L).collect().head
    assert(r.getAs[Long]("n_rows") == 10000L)
    assert(r.getAs[Long]("exact_rows") == 4000L)
    // uniform data: the interpolation assumption holds, error stays small
    assert(math.abs(r.getAs[Long]("err_rows")) <= 200L,
      s"err ${r.getAs[Long]("err_rows")} too large for uniform data")
    val r2 = Sketches.equidepthRangeEstimate(df.repartition(13), "x", 200L, 599L)
      .collect().head
    assert(r.toSeq == r2.toSeq, "estimate must not depend on partitioning")
  }

  test("equi-depth estimate degenerates gracefully on skewed data") {
    // 90% of mass on one value: buckets collapse, estimate must stay finite
    // and the exact side correct
    val df = (Seq.fill(9000)(5L) ++ (1 to 1000).map(_.toLong + 100)).toDF("x")
    val r = Sketches.equidepthRangeEstimate(df, "x", 0L, 50L).collect().head
    assert(r.getAs[Long]("exact_rows") == 9000L)
    assert(r.getAs[Long]("est_rows") >= 0L)
  }

  test("scale contract: the sketch-side shuffle carries register rows only") {
    // The pre-join sketch aggregation must reduce to ≤ m rows per column
    // regardless of input size — that's what makes the formulation a
    // sketch and not a distinct.
    val df = (1 to 30000).map(i => s"v$i").toDF("x")
    val regs = df
      .select(explode(map(lit("x"), col("x"))).as(Seq("col_name", "val")))
      .select(expr("cast(conv(substring(md5(val), 1, 15), 16, 10) as bigint)")
        .as("h"))
      .select(expr("shiftright(h, 48)").as("bucket"))
      .distinct()
    assert(regs.count() <= Sketches.NumRegisters)
  }

  test("KMV: estimates track exact counts; intersection can't go negative") {
    def rel(ids: Seq[Int]) = ids.map(i => s"u$i").toDF("val")
    // |A|=4000, |B|=3000, overlap 2000
    val r = Sketches.kmvIntersectionEstimate(
      rel(1 to 4000), rel(2001 to 5000), k = 64).collect().head
    assert(r.getAs[Long]("exact_a") == 4000L)
    assert(r.getAs[Long]("exact_b") == 3000L)
    assert(r.getAs[Long]("exact_common") == 2000L)
    // k=64 → typical relative error 1/sqrt(62) ≈ 13%; loose 35% envelopes
    assert(math.abs(r.getAs[Double]("kmv_a") - 4000.0) / 4000.0 < 0.35)
    assert(math.abs(r.getAs[Double]("kmv_b") - 3000.0) / 3000.0 < 0.35)
    assert(math.abs(r.getAs[Double]("kmv_union") - 5000.0) / 5000.0 < 0.35)
    assert(math.abs(r.getAs[Double]("kmv_common") - 2000.0) / 2000.0 < 0.5)
    // membership-based intersection is bounded, never negative
    assert(r.getAs[Double]("kmv_common") >= 0.0)
    assert(r.getAs[Double]("kmv_common") <= r.getAs[Double]("kmv_union") + 1e-9)

    // disjoint sets: hardly any union-k-min member is in both → est ≈ 0
    val d = Sketches.kmvIntersectionEstimate(
      rel(1 to 2000), rel(10000 to 12000), k = 64).collect().head
    assert(d.getAs[Long]("exact_common") == 0L)
    assert(d.getAs[Double]("kmv_common") >= 0.0)
    assert(d.getAs[Double]("kmv_common") < 300.0)
  }

  test("bottom-k quantiles: accurate on uniform data, merge law holds") {
    // values 1..10000 with unique keys: true decile d is ~1000·d
    val df = (1 to 10000).map(i => (i.toDouble, s"key-$i")).toDF("v", "key")
    val got = Sketches.bottomKQuantiles(df, k = 256).collect()
    assert(got.length == 9 && got.forall(_.getAs[Long]("sample_n") == 256L))
    got.foreach { r =>
      val d = r.getAs[Long]("decile")
      val est = r.getAs[Double]("est_value")
      // k=256 → binomial sd of the d-th decile rank ≈ sqrt(k·p·q)/k ≤ ~3.2%
      // of the range; assert a loose 12% absolute envelope
      assert(math.abs(est - 1000.0 * d) < 1200.0,
        s"decile $d estimate $est too far from ${1000 * d}")
    }
    // partitioning independence + semilattice: bottom-k of the union ==
    // bottom-k over the parts (TakeOrderedAndProject merges per-task heaps)
    val again = Sketches.bottomKQuantiles(df.repartition(13), k = 256).collect()
    assert(got.map(_.toSeq).toSeq == again.map(_.toSeq).toSeq)
    val halves = Sketches.bottomKQuantiles(
      df.filter(col("v") <= 5000).unionByName(df.filter(col("v") > 5000)),
      k = 256).collect()
    assert(got.map(_.toSeq).toSeq == halves.map(_.toSeq).toSeq)
  }

  test("KMV estimate is partitioning-independent (k-min is a semilattice)") {
    def rel(ids: Seq[Int]) = ids.map(i => s"u$i").toDF("val")
    val a = rel(1 to 3000)
    val b = rel(1000 to 4000)
    val once = Sketches.kmvIntersectionEstimate(a, b, k = 64).collect().toSeq
    val again = Sketches.kmvIntersectionEstimate(
      a.repartition(17), b.repartition(3), k = 64).collect().toSeq
    assert(once == again, "k-min sketch must not depend on partitioning")
  }

  test("sketch_ams_f2: sign sums match a literal md5-parity replay") {
    // Third implementation: java MessageDigest md5 → hex → per-position
    // digit parity, folded in plain Scala Longs. The 16 S_j and both
    // digit-string moments must match the query exactly.
    val row = Registry.all("sketch_ams_f2").fn(spark, sfDir).collect()(0)
    val vs = Tables.events(spark, sfDir)
      .select(col("user_id").cast("string")).collect().map(_.getString(0))
    def hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val sj = Array.fill(16)(0L)
    vs.foreach { v =>
      val h = hex(v)
      (0 until 16).foreach { j =>
        sj(j) += (Integer.parseInt(h.substring(j, j + 1), 16) % 2) * 2 - 1
      }
    }
    val estX16 = sj.map(s => BigInt(s) * s).sum
    val f2 = vs.groupBy(identity).values
      .map(g => BigInt(g.length) * g.length).sum
    assert(row.getAs[Long]("n_rows") == vs.length.toLong)
    assert(row.getAs[String]("f2_exact") == f2.toString, "exact F2 mismatch")
    assert(row.getAs[String]("f2_est_x16") == estX16.toString,
      s"sketch sums diverge: got ${row.getAs[String]("f2_est_x16")}, replay $estX16")
    // tug-of-war sanity: 16 averaged sketches land within a loose 5x band
    val ratio = row.getAs[Double]("est_over_exact")
    assert(ratio > 0.2 && ratio < 5.0, s"estimate degenerate: $ratio")
  }
}
