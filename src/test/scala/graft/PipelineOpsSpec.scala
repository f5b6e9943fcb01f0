package graft

import graft.operators.{Linkage, Packing, Profile, Sampling, TextAnalysis}
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** Round-3 pipeline additions: C4/Gopher filter battery, importance-weighted
  * sampling, unigram-LM surprisal, token-budget sequence packing. */
class PipelineOpsSpec extends SparkTestBase {
  import spark.implicits._

  private val cleanDoc =
    "the cat and the dog sat down on a mat with some other good words here"

  test("c4GopherFilters: clean doc passes every rule") {
    val df = Seq((1L, cleanDoc)).toDF("doc_id", "text")
    val r = TextAnalysis.c4GopherFilters(df, "doc_id", "text").head()
    val flags = Seq("f_words", "f_word_len", "f_lorem", "f_brace", "f_policy",
      "f_symbol", "f_alpha", "f_stopword", "keep")
    flags.foreach(f => assert(r.getAs[Boolean](f), s"$f should pass"))
  }

  test("c4GopherFilters: each contamination trips exactly its rule") {
    val cases = Seq(
      (1L, cleanDoc + " lorem ipsum dolor", "f_lorem"),
      (2L, cleanDoc + " function() { return }", "f_brace"),
      (3L, cleanDoc + " enable javascript now", "f_policy"),
      (4L, cleanDoc + " # # # # # # # # # # # #", "f_symbol"),
      (5L, "the a " + (1 to 20).map(_.toString).mkString(" "), "f_alpha"),
      (6L, "short doc here", "f_words"),
      (7L, "value table merge scan filter hash join sort spill batch", "f_stopword"))
    val df = cases.map { case (id, t, _) => (id, t) }.toDF("doc_id", "text")
    val rows = TextAnalysis.c4GopherFilters(df, "doc_id", "text")
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    cases.foreach { case (id, _, failFlag) =>
      assert(!rows(id).getAs[Boolean](failFlag), s"doc $id should fail $failFlag")
      assert(!rows(id).getAs[Boolean]("keep"), s"doc $id should not be kept")
    }
  }

  test("weightedHashSample: clamped extremes, monotone in weight, partition-stable") {
    val df = Tables.documents(spark, sfDir).select(col("doc_id"))
    val n = df.count()
    assert(Sampling.weightedHashSample(df, "doc_id", lit(1.0), "s").count() == n)
    assert(Sampling.weightedHashSample(df, "doc_id", lit(2.5), "s").count() == n)
    assert(Sampling.weightedHashSample(df, "doc_id", lit(0.0), "s").count() == 0)
    assert(Sampling.weightedHashSample(df, "doc_id", lit(-1.0), "s").count() == 0)
    // same salt ⇒ the kept set is monotone in the weight (same bucket per row)
    val lo = Sampling.weightedHashSample(df, "doc_id", lit(0.3), "s")
      .collect().map(_.getLong(0)).toSet
    val hi = Sampling.weightedHashSample(df, "doc_id", lit(0.7), "s")
      .collect().map(_.getLong(0)).toSet
    assert(lo.subsetOf(hi))
    // physical layout never changes the kept set
    val re = Sampling.weightedHashSample(df.repartition(7), "doc_id", lit(0.3), "s")
      .collect().map(_.getLong(0)).toSet
    assert(re == lo)
  }

  test("unigramSurprisal: rare-word docs score above boilerplate docs") {
    val docs = Seq(
      (1L, "alpha beta alpha beta alpha beta alpha beta"),
      (2L, "alpha beta xylophone quixotic zephyr jackdaw"),
      (3L, "alpha beta alpha beta")).toDF("doc_id", "text")
    val r = TextAnalysis.unigramSurprisal(docs, "doc_id", "text")
      .collect().map(x => x.getAs[Long]("id") ->
        (x.getAs[Long]("n_tokens"), x.getAs[Double]("mean_surprisal"))).toMap
    assert(r(1L)._1 == 8 && r(2L)._1 == 6 && r(3L)._1 == 4)
    // doc 2 holds four corpus-unique words ⇒ strictly higher mean surprisal
    assert(r(2L)._2 > r(1L)._2)
    // docs 1 and 3 are all common words with identical mix ⇒ equal scores
    assert(r(1L)._2 == r(3L)._2)
  }

  test("unigramSurprisalTiered is bit-identical to the single-join form at any head size") {
    val docs = Tables.documents(spark, sfDir).select(col("doc_id"), col("text"))
    val base = TextAnalysis.unigramSurprisal(docs, "doc_id", "text")
      .orderBy(col("id")).collect().toSeq
    for (headSize <- Seq(1, 16, 100000)) {
      val tiered = TextAnalysis.unigramSurprisalTiered(docs, "doc_id", "text", headSize)
        .orderBy(col("id")).collect().toSeq
      assert(tiered == base, s"headSize=$headSize diverged")
    }
  }

  test("docLines segments deterministically; lineDedupStats keeps first occurrence") {
    import spark.implicits._
    val df = Seq(
      (1L, "a b c d e f g h"),        // lines: "a b c d", "e f g h"
      (2L, "a b c d x y z"),          // lines: "a b c d" (dup), "x y z"
      (3L, "p q r")                   // lines: "p q r"
    ).toDF("doc_id", "text")
    val lines = TextAnalysis.docLines(df, "doc_id", "text", 4)
      .orderBy(col("id"), col("line_no"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSeq
    assert(lines == Seq((1L, 0L, "a b c d"), (1L, 1L, "e f g h"),
      (2L, 0L, "a b c d"), (2L, 1L, "x y z"), (3L, 0L, "p q r")))
    val stats = TextAnalysis.lineDedupStats(df, "doc_id", "text", 4)
      .orderBy(col("id"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    // doc 1 keeps both lines (owns the first "a b c d"); doc 2 drops its copy
    assert(stats == Seq((1L, 2L, 2L, 1L), (2L, 2L, 1L, 1L), (3L, 1L, 1L, 0L)))
  }

  test("heavyHitters: exact result, partitioning-independent, superset proof exercised") {
    import spark.implicits._
    val tok = Tables.documents(spark, sfDir)
      .select(explode(TextAnalysis.words(col("text"))).as("item"))
    def run(df: org.apache.spark.sql.DataFrame) =
      TextAnalysis.heavyHitters(df, "item", 200)
        .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val got = run(tok)
    // brute force is the definition
    val n = tok.count()
    val brute = tok.groupBy(col("item")).agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") * 200 >= n)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(got == brute && got.nonEmpty)
    // adversarial re-partitioning must not change the (exact) answer
    assert(run(tok.repartition(17)) == brute)
    assert(run(tok.repartition(1)) == brute)
  }

  test("collocations: exact lift on a hand-computed fixture") {
    // tokens: "a b" ×3, "a c" ×1 → N=8, c_a=4, c_b=3, c_c=1
    val df = Seq((1L, "a b a b"), (2L, "a b"), (3L, "a c")).toDF("doc_id", "text")
    val r = TextAnalysis.collocations(df, "text", 2)
      .collect().map(x => (x.getString(0), x.getString(1), x.getLong(2), x.getDouble(5)))
    // bigrams: (a,b)×3, (b,a)×1, (a,c)×1 — only (a,b) survives minCount=2
    // lift(a,b) = 3*8 / (4*3) = 2.0
    assert(r.toSeq == Seq(("a", "b", 3L, 2.0)))
  }

  test("profile: nulls, exact distinct, native-typed min/max") {
    val df = Seq[(java.lang.Long, String)]((10L, "x"), (9L, "y"), (9L, null), (null, "x"))
      .toDF("k", "s")
    val r = Profile.profile(df, Seq("k", "s")).orderBy("col_name")
      .collect().map(x => (x.getString(0), x.getLong(1), x.getLong(2),
        x.getLong(3), x.getString(4), x.getString(5)))
    // min/max must be native-typed (9 < 10 numerically; "10" < "9" would be wrong)
    assert(r.toSeq == Seq(
      ("k", 4L, 1L, 2L, "9", "10"),
      ("s", 4L, 1L, 2L, "x", "y")))
  }

  test("linkage: rarest-token probe finds best match; out-of-range candidates drop") {
    val clean = Seq((1L, "red widget"), (2L, "blue widget"), (3L, "red bolt"))
      .toDF("id", "name")
    val dirty = Seq((10L, "rd widget"), (11L, "blue bot"), (12L, "red blot"))
      .toDF("did", "dname")
    val r = Linkage.bestMatches(dirty, "did", "dname", clean, "id", "name", 3)
      .orderBy("dirty_id")
      .collect().map(x => (x.getLong(0), x.getString(1), x.getLong(2),
        x.getString(3), x.getInt(4)))
    // 10 probes "widget" (df 2, rarest in-vocab) → best is id 1 at dist 1;
    // 11 probes "blue" but its only candidate is 5 edits away → absent;
    // 12's "blot" is out-of-vocab, probes "red" → id 3 at dist 2.
    assert(r.toSeq == Seq(
      (10L, "rd widget", 1L, "red widget", 1),
      (12L, "red blot", 3L, "red bolt", 2)))
  }

  test("winnowing: shared w+k-1 run shares a fingerprint; density bounds hold") {
    import spark.implicits._
    // k=4, w=5 → guarantee kicks in at shared runs of >= 8 words
    val df = Seq(
      (1L, "aa bb cc dd ee ff gg hh unique tail words here indeed"),
      (2L, "completely different prefix words go first aa bb cc dd ee ff gg hh"),
      (3L, "no overlap at all in this document text body")).toDF("doc_id", "text")
    val fp = TextAnalysis.winnowingFingerprints(df, "doc_id", "text", 4, 5)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getSeq[Long](3).toSet)).toMap
    assert((fp(1L)._3 intersect fp(2L)._3).nonEmpty,
      "shared 8-word run must contribute a shared fingerprint")
    assert((fp(1L)._3 intersect fp(3L)._3).isEmpty)
    // winnowing selects at least one gram per w-window and at most all
    fp.values.foreach { case (m, n, set) =>
      assert(n == set.size && n <= m && n >= (m + 4) / 5)
    }
  }

  test("boilerplateRemoval: within-host threshold, no survivor, text rebuilt") {
    import spark.implicits._
    val df = Seq(
      (1L, "A", "nav bar menu here alpha beta gamma delta"),
      (2L, "A", "nav bar menu here epsilon zeta"),
      (3L, "A", "nav bar menu here"),                      // pure chrome doc
      (4L, "B", "nav bar menu here own content words x"))  // same line, other host
      .toDF("doc_id", "host", "text")
    val got = TextAnalysis.boilerplateRemoval(df, "doc_id", "host", "text", 4, minDocs = 3)
      .orderBy(col("id"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))).toSeq
    assert(got == Seq(
      (1L, 2L, 1L, "alpha beta gamma delta"),
      (2L, 2L, 1L, "epsilon zeta"),
      (3L, 1L, 1L, ""),                                   // boilerplate has NO survivor
      (4L, 2L, 0L, "nav bar menu here own content words x"))) // host B below threshold
  }

  test("exactQuantiles: order statistics match a local sorted recompute") {
    val docs = Tables.documents(spark, sfDir)
    val got = TextAnalysis.exactQuantiles(docs, "n_chars", Seq(1, 50, 90, 99, 100))
      .orderBy(col("pct")).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSeq
    val vals = docs.select(col("n_chars").cast("long")).collect()
      .map(_.getLong(0)).sorted
    val n = vals.length.toLong
    val want = Seq(1, 50, 90, 99, 100).map { p =>
      val rank = ((n * p + 99) / 100).toInt // ⌈n·p/100⌉, 1-based
      (p, vals(rank - 1), n)
    }
    assert(got == want)
    // no global window in the plan (the Prefix helper's whole point)
    val bare = TextAnalysis.exactQuantiles(docs, "n_chars", Seq(50))
      .queryExecution.executedPlan.collect {
        case w: org.apache.spark.sql.execution.window.WindowExec
          if w.partitionSpec.isEmpty => w
      }
    assert(bare.isEmpty)
  }

  test("fixedKPerStratum: exact budget, matches the window formulation, rerun-stable") {
    val docs = Tables.documents(spark, sfDir)
    val got = graft.operators.Sampling.fixedKPerStratum(docs, "lang", "doc_id", 7, "s1")
      .orderBy(col("lang"), col("doc_id")).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    // window/row_number reference (fine at test scale)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("lang"))
      .orderBy(graft.operators.Sampling.sampleBucket(col("doc_id"), "s1"), col("doc_id"))
    val want = docs.withColumn("rn", row_number().over(w)).filter(col("rn") <= 7)
      .select(col("lang"), col("doc_id"))
      .orderBy(col("lang"), col("doc_id")).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got.nonEmpty && got == want)
    // exact budget per stratum (every fixture lang has >= 7 docs)
    assert(got.groupBy(_._1).values.forall(_.size == 7))
    // deterministic across reruns (placement-insensitive partials)
    val again = graft.operators.Sampling.fixedKPerStratum(
      docs.repartition(7), "lang", "doc_id", 7, "s1")
      .orderBy(col("lang"), col("doc_id")).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(again == got)
  }

  test("removeDuplicateSpans: first occurrence kept, spans cut and clipped, text rebuilt") {
    import spark.implicits._
    val df = Seq(
      (1L, "a b c d e"),       // owns the first "a b c" (pos 0)
      (2L, "x a b c y"),       // duplicated 3-gram at pos 1 → cuts words 1-3
      (3L, "a b c"),           // len == n: one exact window, a later copy of doc 1's pos-0 gram
      (4L, "p q r s")          // no duplicated span
    ).toDF("doc_id", "text")
    val got = graft.operators.Dedup.removeDuplicateSpans(df, "doc_id", "text", 3)
      .orderBy(col("doc_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))).toSeq
    // doc 1: pos-0 "a b c" is the corpus keeper (min key) → nothing removed.
    // doc 2: its "a b c" at pos 1 loses to doc 1 → words 1..3 cut → "x y".
    // doc 3: whole doc is a later copy of the same 3-gram → fully removed.
    // doc 4: untouched.
    assert(got == Seq(
      (1L, 5L, 0L, "a b c d e"),
      (2L, 5L, 3L, "x y"),
      (3L, 3L, 3L, ""),
      (4L, 4L, 0L, "p q r s")))
  }

  test("contamination flags exactly the docs sharing an n-gram with the benchmark") {
    import spark.implicits._
    val train = Seq(
      (1L, "one two three four five six seven"),
      (2L, "completely unrelated words in this document"),
      (3L, "zzz one two three four five qqq")).toDF("doc_id", "text")
    val bench = Seq((100L, "one two three four five")).toDF("bench_id", "text")
    val got = graft.operators.Dedup.contamination(
      train, "doc_id", "text", bench, "bench_id", "text", n = 5)
      .orderBy(col("doc_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    // docs 1 and 3 contain the benchmark 5-gram as a contiguous window
    // (doc 3 at positions 2-6); doc 2 shares no 5-gram
    assert(got == Seq((1L, 1L, 1L), (3L, 1L, 1L)))
  }

  test("bigramLm: pair counts, context totals, conditional probabilities") {
    import spark.implicits._
    val df = Seq("a b a b c", "a b").toDF("text")
    val got = TextAnalysis.bigramLm(df, "text")
      .orderBy(col("w1"), col("w2"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getDouble(4))).toSeq
    // bigrams: (a,b)x3, (b,a)x1, (b,c)x1 → p(b|a)=1.0, p(a|b)=0.5, p(c|b)=0.5
    assert(got == Seq(("a", "b", 3L, 3L, 1.0),
      ("b", "a", 1L, 2L, 0.5), ("b", "c", 1L, 2L, 0.5)))
  }

  test("bpePairCounts: histogram-weighted adjacent pairs; 1-char words excluded") {
    import spark.implicits._
    val df = Seq("ab ab cd a", "ab x").toDF("text")
    val got = TextAnalysis.bpePairCounts(df, "text")
      .orderBy(col("n").desc, col("pair"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    // word histogram: ab=3, cd=1, a=1, x=1 → pairs: "ab"x3, "cd"x1
    assert(got == Seq(("ab", 3L), ("cd", 1L)))
  }

  test("qualityClassifierScore: exact weight sums, bias shifts the keep gate") {
    import spark.implicits._
    val df = Seq((1L, "alpha beta"), (2L, "gamma delta epsilon")).toDF("doc_id", "text")
    val weights = Seq.fill(64)(0.5) // uniform → weight_sum = 0.5 * n_words exactly
    val hi = TextAnalysis.qualityClassifierScore(df, "doc_id", "text", weights, 0.1)
      .collect().map(r => r.getLong(0) -> (r.getDouble(2), r.getBoolean(3))).toMap
    assert(hi == Map(1L -> (1.0, true), 2L -> (1.5, true)))
    // bias -0.6: doc 1 gate = 1.0 - 1.2 < 0, doc 2 = 1.5 - 1.8 < 0
    val lo = TextAnalysis.qualityClassifierScore(df, "doc_id", "text", weights, -0.6)
      .collect().map(r => r.getLong(0) -> (r.getDouble(2), r.getBoolean(3))).toMap
    assert(lo == Map(1L -> (1.0, false), 2L -> (1.5, false)))
  }

  test("bpeTrain: merge sequence with run overlap and count ties") {
    import spark.implicits._
    // histogram: aaab x2, ab x1. aaab = (a,a),(a,a),(a,b) weighted 2 →
    // iter1: "a a"=4 beats "a b"=3; greedy left-to-right merge turns
    // "a a a b" into "aa a b" (third a survives — the run-overlap case).
    // iter2: ("aa","a")=2 < ("a","b")=3 → merge "a b".
    // iter3: only pair left is ("aa","ab")=2 ("ab" is word 2 entire).
    val df = Seq("aaab aaab ab").toDF("text")
    val got = TextAnalysis.bpeTrain(df, "text", 3)
      .orderBy(col("iter"))
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
    assert(got == Seq((1, "a a", "aa", 4L), (2, "a b", "ab", 3L),
      (3, "aa ab", "aaab", 2L)))
  }

  test("mergePairGreedy: Sennrich semantics on homogeneous runs (pairs 1-2, 3-4, ...)") {
    import spark.implicits._
    val cases = Seq(
      ("a a",       Seq("aa")),
      ("a a a",     Seq("aa", "a")),
      ("a a a a",   Seq("aa", "aa")),        // the separator-consuming replace got this wrong
      ("a a a a a", Seq("aa", "aa", "a")),
      ("b a a b",   Seq("b", "aa", "b")),
      ("b",         Seq("b")))
    for ((in, want) <- cases) {
      val got = Seq(in).toDF("s")
        .select(TextAnalysis.mergePairGreedy(split(col("s"), " "), "a", "a").as("m"))
        .head.getSeq[String](0).toSeq
      assert(got == want, s"input '$in'")
    }
  }

  test("vocabCoverage: smallest head reaching each cumulative share") {
    import spark.implicits._
    // counts: x=6, y=3, z=1 → total 10; cum: 6 (60%), 9 (90%), 10 (100%)
    val df = Seq("x x x x x x y y y z").toDF("text")
    val got = TextAnalysis.vocabCoverage(df, "text", Seq(50, 90, 99))
      .orderBy(col("threshold_pct"))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == Seq((50, 1L, 6L, 10L), (90, 2L, 9L, 10L), (99, 3L, 10L, 10L)))
  }

  test("semanticNearDupPairs finds spliced exact copies inside their cluster") {
    val e = Tables.embeddings(spark, sfDir)
    val corpus = e.select(col("vec_id"), col("embedding"))
      .unionByName(e.filter(col("vec_id") % 10 === 0)
        .select((col("vec_id") + 100000).as("vec_id"), col("embedding")))
    val centroids = e.filter(col("vec_id") % 97 === 3)
      .orderBy(col("vec_id")).limit(8)
      .select(col("vec_id"), col("embedding").cast("array<double>")).collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toSeq)).toSeq
    val pairs = graft.operators.Dedup.semanticNearDupPairs(
      corpus, "vec_id", "embedding", centroids, 0.99)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // identical vectors always share a cluster (same argmin), so every
    // spliced copy must surface at cos_sim 1.0
    val expected = e.filter(col("vec_id") % 10 === 0)
      .select(col("vec_id")).collect().map(_.getLong(0)).toSet
    val found = pairs.filter(_._3 == 1.0)
      .map { case (a, b, _) => (a, b - 100000) }.filter(p => p._1 == p._2).map(_._1).toSet
    assert(expected.nonEmpty && expected.subsetOf(found))
  }

  test("packing: exhaustive assignment, bin bound, matches local recompute") {
    val budget = 128
    val d = Tables.documents(spark, sfDir).select(col("doc_id"),
      TextAnalysis.tokenCount(col("text")).as("toks"))
    val assigned = Packing.assignBins(d, "doc_id", "toks", budget, 4, "t")
      .select("doc_id", "toks", "shard", "seq_id")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3)))
    // every doc assigned exactly once
    assert(assigned.map(_._1).distinct.length == d.count())
    // local reference: same shard hash, cumulative fill per shard in id order
    val maxDoc = assigned.map(_._2).max
    assigned.groupBy(_._3).foreach { case (_, rows) =>
      var cum = 0L
      rows.sortBy(_._1).foreach { case (_, toks, _, seq) =>
        cum += toks
        assert(seq == (cum - 1) / budget, "bin must be the cumulative-end bin")
      }
    }
    // with all docs under budget, a bin never exceeds budget + maxDoc − 1
    val binTotals = assigned.groupBy(r => (r._3, r._4)).map(_._2.map(_._2.toLong).sum)
    assert(binTotals.forall(_ <= budget + maxDoc - 1))
    // layout-independent: repartition changes nothing
    val re = Packing.assignBins(d.repartition(5), "doc_id", "toks", budget, 4, "t")
      .select("doc_id", "seq_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(re == assigned.map(r => (r._1, r._4)).toSet)
  }

  test("kmeansRefine: matches local Lloyd reference and lowers distortion") {
    import graft.operators.Vectors
    val emb = Tables.embeddings(spark, sfDir)
    val data = emb.select(col("vec_id"), col("embedding").cast("array<double>")).collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
    val init = data.filter(_._1 % 7 == 3).sortBy(_._1).take(4)
      .map { case (id, v) => (id, v.toSeq) }.toSeq

    def assign(cents: Seq[(Long, Seq[Double])]) = data.map { case (_, v) =>
      cents.map { case (cid, cv) =>
        (cv.zip(v).map { case (a, b) => (a - b) * (a - b) }.sum, cid)
      }.min
    }
    def distortion(cents: Seq[(Long, Seq[Double])]) = assign(cents).map(_._1).sum

    val refined = Vectors.kmeansRefine(emb, "embedding", init, 2)
    assert(refined.map(_._1).toSet.subsetOf(init.map(_._1).toSet))
    assert(distortion(refined) < distortion(init), "refinement must lower distortion")

    // one step agrees with a local reference mean (6 dp rounding)
    val step1 = Vectors.kmeansRefine(emb, "embedding", init, 1).toMap
    val members = data.map { case (id, v) =>
      val cid = init.map { case (c, cv) =>
        (cv.zip(v).map { case (a, b) => (a - b) * (a - b) }.sum, c)
      }.min._2
      (cid, v)
    }.groupBy(_._1)
    members.foreach { case (cid, rows) =>
      val mean = rows.map(_._2).transpose.map(ds => ds.sum / ds.length)
      step1(cid).zip(mean).foreach { case (got, want) =>
        assert(math.abs(got - want) < 2e-6, s"centroid $cid mean drift")
      }
    }
  }

  test("chunkDocuments: full coverage, overlap carry-over, short-doc floor") {
    val df = Seq(
      (1L, (1 to 100).map(i => s"w$i").mkString(" ")), // 100 words → 2 chunks
      (2L, "a b c")).toDF("doc_id", "text")             // < overlap → 1 chunk
    val rows = TextAnalysis.chunkDocuments(df, "doc_id", "text", 10, 4)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3)))
    val doc1 = rows.filter(_._1 == 1L).sortBy(_._2)
    // stride 6: ceil((100-4)/6) = 16 chunks; starts 1, 7, 13, …
    assert(doc1.length == 16)
    assert(doc1.map(_._3).toSeq == (0 until 16).map(_ * 6 + 1))
    // all full except the tail (tokens 91..100 = 10 exactly here)
    assert(doc1.forall(_._4 == 10))
    // consecutive chunks overlap by exactly `overlap` token positions
    doc1.sliding(2).foreach { case Array(a, b) =>
      assert(b._3 == a._3 + 6)
    }
    // every token position 1..100 is covered by some chunk
    val covered = doc1.flatMap(c => c._3 until (c._3 + c._4)).toSet
    assert((1 to 100).forall(covered.contains))
    assert(rows.filter(_._1 == 2L).toSeq == Seq((2L, 0, 1, 3)))
  }

  test("incremental minhash == full pass restricted to pairs touching the batch") {
    import graft.operators.Dedup
    val d = Tables.documents(spark, sfDir).select(col("doc_id"), col("text"))
    val newDocs = d.filter(col("doc_id") % 4 === 0)
      .select((col("doc_id") + 500000).as("doc_id"),
        concat(col("text"), lit(" tail words appended here")).as("text"))
    val baseSigs = Dedup.minhashSignatures(d, "doc_id", "text")

    val inc = Dedup.minhashLshIncremental(newDocs, "doc_id", "text", baseSigs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

    val full = Dedup.minhashLshPairs(d.unionByName(newDocs), "doc_id", "text")
      .filter(col("id_a") >= 500000 || col("id_b") >= 500000)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

    assert(inc == full, "incremental contract: same pairs, same estimates")
    assert(inc.nonEmpty, "fixture must produce near-dup pairs")
  }

  test("minhash-LSH recall against exact Jaccard pairs on the near-dup fixture") {
    import graft.operators.Dedup
    val d = Tables.documents(spark, sfDir).select(col("doc_id"), col("text"))
    val corpus = d.unionByName(d.filter(col("doc_id") % 4 === 0)
      .select((col("doc_id") + 500000).as("doc_id"),
        concat(col("text"), lit(" small tail appended")).as("text")))
    val exact = Dedup.jaccardPairs(corpus, "doc_id", "text", 3, 0.5, maxDf = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = Dedup.minhashLshPairs(corpus, "doc_id", "text", 16, 4, 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty, "fixture must contain exact near-dup pairs")
    val recall = (approx & exact).size.toDouble / exact.size
    // 16 bands × 4 rows puts the s-curve midpoint near 0.5; fixture pairs
    // sit well above it, so banding should recover the large majority
    assert(recall >= 0.7, f"LSH recall $recall%.2f below floor")
  }

  test("packStats: totals and fill ratios are consistent") {
    val d = Seq((1L, 100), (2L, 100), (3L, 100), (4L, 100), (5L, 100))
      .toDF("doc_id", "toks")
    // single shard makes the packing sequential: 512-budget fits docs 1-5
    // at cum 100..500 into seq 0
    val stats = Packing.packStats(
      Packing.assignBins(d, "doc_id", "toks", 512, 1, "z"), "doc_id", "toks", 512)
      .collect()
    assert(stats.length == 1)
    val r = stats.head
    assert(r.getAs[Long]("n_docs") == 5 && r.getAs[Long]("n_tokens") == 500)
    assert(r.getAs[Double]("fill_ratio") == 500.0 / 512)
  }

  test("linearTrend recovers an exact fit; degenerate x gives NULL slope") {
    import graft.operators.Profile
    // g1: perfect line y = 3x + 7; g2: all points share one x
    val pts = ((0 to 20).map(x => ("g1", x.toLong, 3L * x + 7L)) ++
      Seq(("g2", 5L, 10L), ("g2", 5L, 20L))).toDF("g", "x", "y")
    val r = Profile.linearTrend(pts, "g", "x", "y").collect()
      .map(x => x.getString(0) -> x).toMap
    assert(r("g1").getAs[Double]("slope") == 3.0)
    assert(r("g1").getAs[Double]("intercept") == 7.0)
    assert(r("g2").isNullAt(r("g2").fieldIndex("slope")))
    // partitioning independence (integer sums are exact in any order)
    val r2 = Profile.linearTrend(pts.repartition(7), "g", "x", "y").collect()
      .map(x => x.getString(0) -> x).toMap
    assert(r("g1").toSeq == r2("g1").toSeq)
  }

  test("madOutliers flags spliced extremes, robust to the outliers themselves") {
    import graft.operators.Profile
    // g1: tight cluster around 100 plus two wild values; g2: clean
    val rows = ((1 to 50).map(i => ("g1", 95L + (i % 11))) ++
      Seq(("g1", 10000L), ("g1", -5000L)) ++
      (1 to 30).map(i => ("g2", 200L + (i % 7)))).toDF("g", "v")
    val r = Profile.madOutliers(rows, "g", "v", k = 3).collect()
      .map(x => x.getString(0) -> x).toMap
    assert(r("g1").getAs[Long]("n_outliers") == 2L,
      "exactly the two spliced extremes must flag")
    assert(r("g2").getAs[Long]("n_outliers") == 0L)
    // robustness: median/MAD must sit in the cluster, unmoved by the wilds
    assert(r("g1").getAs[Long]("median") >= 95L &&
      r("g1").getAs[Long]("median") <= 106L)
    assert(r("g1").getAs[Long]("mad") <= 11L)
    // determinism under repartitioning
    val r2 = Profile.madOutliers(rows.repartition(9), "g", "v", k = 3)
      .collect().map(x => x.getString(0) -> x).toMap
    assert(r.keys == r2.keys &&
      r.forall { case (k2, v) => v.toSeq == r2(k2).toSeq })
  }

  test("epochShuffleManifest: rerun-stable, epoch-distinct, complete") {
    val d = (1 to 300).map(i => (i.toLong, 10)).toDF("doc_id", "toks")
    val a = Packing.epochShuffleManifest(d, "doc_id", "toks", 3, 4, "s1")
      .collect()
    val b = Packing.epochShuffleManifest(d.repartition(7), "doc_id", "toks",
      3, 4, "s1").collect()
    assert(a.toSeq == b.toSeq, "manifest must be partitioning/rerun stable")
    // every epoch covers all docs
    val perEpoch = a.groupBy(_.getAs[Int]("epoch"))
      .map { case (e, rs) => e -> rs.map(_.getAs[Long]("n_docs")).sum }
    assert(perEpoch.values.forall(_ == 300L))
    // different epochs deal different orders: the checksum multiset differs
    val sums = a.groupBy(_.getAs[Int]("epoch"))
      .map { case (e, rs) => e -> rs.map(r => (r.getAs[Long]("shard"),
        r.getAs[Long]("order_checksum"))).toSet }
    assert(sums(0) != sums(1) && sums(1) != sums(2))
  }

  test("epochShuffleManifest: quote-bearing salt is literal data, not SQL text") {
    val d = (1 to 50).map(i => (i.toLong, 10)).toDF("doc_id", "toks")
    // a salt containing quotes/escapes would splice into the hash SQL if it
    // were string-interpolated; as a Column literal it just changes the deal
    val a = Packing.epochShuffleManifest(d, "doc_id", "toks", 1, 2, "o'br\\ien")
      .collect()
    val b = Packing.epochShuffleManifest(d, "doc_id", "toks", 1, 2, "").collect()
    assert(a.map(_.getAs[Long]("n_docs")).sum == 50L)
    val ck = (rs: Array[org.apache.spark.sql.Row]) =>
      rs.map(r => (r.getAs[Long]("shard"), r.getAs[Long]("order_checksum"))).toSet
    assert(ck(a) != ck(b), "different salts must deal different permutations")
  }

  test("kneserNeyBigram matches the hand-computed smoothing on a tiny corpus") {
    val docs = Seq("a b", "c b", "a d").toDF("text")
    val r = TextAnalysis.kneserNeyBigram(docs, "text").collect()
      .map(row => ((row.getString(0), row.getString(1)),
        row.getAs[Double]("p_kn"))).toMap
    // replicate the exact IEEE chain: max(c-d,0)/ctx + (d*nf/ctx)*(nb/N)
    def kn(c: Long, ctx: Long, nf: Long, nb: Long, n: Long): Double =
      math.max(c.toDouble - 0.75, 0.0) / ctx.toDouble +
        (0.75 * nf.toDouble / ctx.toDouble) * (nb.toDouble / n.toDouble)
    assert(r(("a", "b")) == kn(1, 2, 2, 2, 3))
    assert(r(("a", "d")) == kn(1, 2, 2, 1, 3))
    assert(r(("c", "b")) == kn(1, 1, 1, 2, 3))
    // a's observed successors exhaust its mass: P(b|a)+P(d|a) ≈ 1
    assert(math.abs(r(("a", "b")) + r(("a", "d")) - 1.0) < 1e-12)
    // continuation effect: b (2 contexts) backs off higher than d (1)
    assert(r(("a", "b")) > r(("a", "d")))
  }

  test("kneserNeyBigram is partitioning-independent") {
    val docs = (1 to 200).map(i => s"w${i % 9} w${i % 5} w${i % 3} w${i % 7}")
      .toDF("text")
    val a = TextAnalysis.kneserNeyBigram(docs, "text")
      .orderBy(col("w1"), col("w2")).collect()
    val b = TextAnalysis.kneserNeyBigram(docs.repartition(13), "text")
      .orderBy(col("w1"), col("w2")).collect()
    assert(a.toSeq == b.toSeq)
  }

  test("epochMixPlan: shares sum to ~1, α=0.5 compresses skew, cap binds") {
    // three domains with 100:25:4 token skew (ten-word docs)
    val docs = ((1 to 100).map(i => ("web", s"w$i a b c d e f g h i")) ++
      (1 to 25).map(i => ("code", s"c$i a b c d e f g h i")) ++
      (1 to 4).map(i => ("ref", s"r$i a b c d e f g h i")))
      .toDF("domain", "text")
    val plan = Sampling.epochMixPlan(docs, "domain", "text",
      budgetMultiplier = 3, maxRepeat = 4).collect()
    assert(plan.map(_.getAs[String]("domain")).toSeq ==
      Seq("code", "ref", "web"))
    val shares = plan.map(_.getAs[Double]("share"))
    assert(math.abs(shares.sum - 1.0) < 1e-9)
    // α=0.5: token share of web is 100/129 ≈ .78, weight share √100/Σ√ ≈ .59
    val web = plan.find(_.getString(0) == "web").get
    assert(web.getAs[Double]("share") < 0.65)
    // the small domain's implied epochs exceed the cap → n_repeats == cap
    val ref = plan.find(_.getString(0) == "ref").get
    assert(ref.getAs[Double]("epochs") > 4.0)
    assert(ref.getAs[Long]("n_repeats") == 4L)
    // budget conservation: allocations sum to ≤ budget, within one floor
    // per domain of it
    val tot = plan.map(_.getAs[Long]("n_tokens")).sum
    val alloc = plan.map(_.getAs[Long]("alloc_tokens")).sum
    assert(alloc <= 3L * tot && alloc > 3L * tot - plan.length)
  }
  test("pretrainCorpusPlan: funnel monotone, duplicates drop, budget conserved") {
    // 6 docs >= 20 words; docs 5 and 6 are exact word-set duplicates of 4
    val mk = (i: Int) => ("alpha beta gamma delta epsilon zeta eta theta " +
      s"iota kappa lambda mu nu xi omicron pi rho sigma tau upsilon word$i x$i")
    val docs = (Seq((1L, mk(1)), (2L, mk(2)), (3L, mk(3)), (4L, mk(4)),
      (5L, mk(4)), (6L, mk(4))) :+ ((7L, "short doc")))
      .toDF("doc_id", "text")
    val out = TextAnalysis.pretrainCorpusPlan(docs, "doc_id", "text",
      budgetTokens = 1000L, shardTokens = 16).collect()
    val docsIn = out.map(_.getAs[Long]("docs_in")).sum
    val docsQ = out.map(_.getAs[Long]("docs_quality")).sum
    val docsF = out.map(_.getAs[Long]("docs_final")).sum
    assert(docsIn == 7L)
    assert(docsQ == 6L, "the 2-word doc fails the word floor")
    assert(docsF == 4L, "docs 5/6 dedup onto doc 4's fingerprint")
    assert(docsF <= docsQ && docsQ <= docsIn)
    // floor allocation never exceeds the budget; shards cover the alloc
    val alloc = out.map(_.getAs[Long]("alloc_tokens"))
    assert(alloc.sum <= 1000L)
    out.foreach { r =>
      assert(r.getAs[Long]("n_shards") * 16L >= r.getAs[Long]("alloc_tokens"))
    }
  }

  test("group k-fold: no source spans folds; censuses partition the corpus") {
    val docs = Tables.documents(spark, sfDir)
    val folds = Registry.all("sample_group_kfold").fn(spark, sfDir).collect()
    val totalSources = docs.select(countDistinct(col("source"))).head().getLong(0)
    val totalDocs = docs.count()
    assert(folds.map(_.getLong(1)).sum == totalSources,
      "per-fold distinct sources must sum to the global distinct count " +
        "(a source spanning folds would double-count)")
    assert(folds.map(_.getLong(2)).sum == totalDocs)
  }

  test("Poisson bootstrap: per-rep mass concentrates around the corpus size") {
    val docs = Tables.documents(spark, sfDir).count()
    val reps = Registry.all("sample_poisson_bootstrap").fn(spark, sfDir).collect()
    assert(reps.length == 10)
    reps.foreach { r =>
      val (hit, sumW) = (r.getLong(1), r.getLong(2))
      // E[sum_w] = n, sd = sqrt(n); 10 sd is astronomically safe and still
      // catches a broken CDF inversion (all-0 or all-6 weights)
      assert(math.abs(sumW - docs) <= 10 * math.sqrt(docs.toDouble) + 10,
        s"rep ${r.get(0)}: sum_w $sumW vs n $docs")
      // P(w>0) = 1 - 1/e ~ 0.632
      assert(hit > docs / 2 && hit < (docs * 3) / 4,
        s"rep ${r.get(0)}: hit $hit of $docs")
    }
  }

}
