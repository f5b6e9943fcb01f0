package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Developer loop: dump a SUBSET of registry queries + their oracle SQL in
  * the same layout as [[Verify]], so `tools/check.py <sf> <out>` grades just
  * the queries under iteration instead of the full registry.
  * usage: runMain graft.VerifyOne <sfDir> <outDir> <name>[,<name>...]
  */
object VerifyOne {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir, nameList) = args
    val names = nameList.split(',').toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      math.min(Runtime.getRuntime.availableProcessors, 32).toString)
    val spark = Tuning(SparkSession.builder())
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.warehouse.dir", Warehouse.dir)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val out = new java.io.File(outDir)
    if (out.exists()) {  // stale results would grade as current
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm)
        f.delete()
      }
      rm(out)
    }
    out.mkdirs()
    names.foreach { name =>
      Registry.all(name).fn(spark, sfDir).coalesce(1).write
        .mode("overwrite").parquet(s"$outDir/$name")
    }
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = names.flatMap(n => Registry.all(n).oracle.map(n -> _))
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
    Warehouse.cleanup()
  }
}
