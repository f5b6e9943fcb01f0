package graft
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Interleaved same-JVM A/B of the two rocchioPredict SHAPES (r14): the
  * pinned form that shipped (prof + docVec persisted, explodes 4 -> 2,
  * output localCheckpointed) vs the r13 unpinned form (documents
  * scanned+exploded 4x, no checkpoint). Both arms run the full
  * text_classifier_eval census so the timed action matches the bench.
  * usage: runMain graft.AbRocchio <sfDir> [reps]
  */
object AbRocchio {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val reps = if (args.length > 1) args(1).toInt else 5
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Tuning(SparkSession.builder())
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.warehouse.dir", Warehouse.dir)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.TextAnalysis
    def census(pred: DataFrame) = pred
      .groupBy(col("label_true"), col("label_pred"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("label_true"), col("label_pred"))
    def trainTest() = {
      val d = Tables.documents(spark, sfDir)
      (d.filter(col("doc_id") % 10 < 8), d.filter(col("doc_id") % 10 >= 8))
    }
    // the r13 shape, verbatim (no pins, no checkpoint)
    def oldShape(): DataFrame = {
      val (train, test) = trainTest()
      val buckets = 256
      val prof = TextAnalysis.classProfiles(train, "doc_id", "text", "lang", buckets)
        .select(col("label"), col("bucket"), col("n"))
      val totals = prof.groupBy(col("label")).agg(sum(col("n")).as("nl"))
      val b = (expr("cast(conv(substring(md5(w), 1, 15), 16, 10) as bigint)")
        % buckets).cast("int")
      val docVec = test
        .select(col("doc_id").as("id"), col("lang").as("label_true"),
          explode(TextAnalysis.words(col("text"))).as("w"))
        .select(col("id"), col("label_true"), b.as("bucket"))
        .groupBy(col("id"), col("label_true"), col("bucket"))
        .agg(count(lit(1)).as("c"))
      val scores = docVec.join(broadcast(prof), Seq("bucket"))
        .groupBy(col("id"), col("label"))
        .agg(sum(col("c") * col("n")).as("s"))
      val docs = docVec.select(col("id"), col("label_true")).distinct()
      val dense = docs.crossJoin(broadcast(totals))
        .join(scores, Seq("id", "label"), "left")
        .select(col("id"), col("label_true"), col("label"), col("nl"),
          coalesce(col("s"), lit(0L)).as("s"))
      val a = dense.select(col("id"), col("label_true"), col("label").as("la"),
        col("s").cast("decimal(38,0)").as("sa"),
        col("nl").cast("decimal(38,0)").as("na"))
      val bb = dense.select(col("id"), col("label").as("lb"),
        col("s").cast("decimal(38,0)").as("sb"),
        col("nl").cast("decimal(38,0)").as("nb"))
      val beaten = (col("sb") * col("na") > col("sa") * col("nb")) ||
        (col("sb") * col("na") === col("sa") * col("nb") &&
          col("lb") < col("la"))
      census(a.join(bb, Seq("id"))
        .groupBy(col("id"), col("label_true"), col("la"))
        .agg(sum(when(beaten, 1L).otherwise(0L)).as("losses"))
        .filter(col("losses") === 0)
        .select(col("id"), col("label_true"), col("la").as("label_pred")))
    }
    def newShape(): DataFrame = {
      val (train, test) = trainTest()
      census(TextAnalysis.rocchioPredict(train, test, "doc_id", "text",
        "lang", buckets = 256))
    }
    val arms = Seq("old-unpinned" -> (() => oldShape()),
      "new-pinned" -> (() => newShape()))
    for ((name, f) <- arms) println(s"ABSHAPE warmup $name rows=${f().count()}")
    for (r <- 1 to reps; (name, f) <- arms) {
      val t0 = System.nanoTime()
      f().count()
      println(f"ABSHAPE $name rep=$r sec=${(System.nanoTime() - t0) / 1e9}%.3f")
    }
    spark.stop()
    Warehouse.cleanup()
  }
}
