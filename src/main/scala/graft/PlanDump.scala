package graft
import org.apache.spark.sql.SparkSession

/** Dumps `.explain("formatted")` for named queries to files — the
  * optimization-round evidence artifact (plans/r14/<q>_<tag>.txt). Plans
  * are captured AFTER one executed run so AQE's final plan (the one that
  * actually executed: join strategy rewrites, coalesced reads) is what
  * lands in the file, not the pre-execution placeholder.
  *
  * Usage: runMain graft.PlanDump <outDir> <tag> <name1,name2,...>
  * Names accept the same short keys as the bench filter (q140 selects
  * q140_triangle_count).
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length == 3, "usage: PlanDump <outDir> <tag> <names>")
    val Array(outDir, tag, namesCsv) = args
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val names = namesCsv.split(",").map(_.trim).filter(_.nonEmpty).toSet
    val selected = SparkEntry.queries.filter { case (n, _) =>
      names(n) || names(n.takeWhile(_ != '_')) }
    require(selected.nonEmpty, s"no queries match $namesCsv")

    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config(Tables.SpreadScansKey, "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))

    selected.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      spark.sparkContext.setJobDescription(s"plandump: $name")
      val df = fn(spark, sfDir)
      // execute first so explain shows isFinalPlan=true subtrees
      df.count()
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      val p = java.nio.file.Paths.get(outDir, s"${name}_$tag.txt")
      java.nio.file.Files.write(p, txt.getBytes("UTF-8"))
      println(s"WROTE $p (${txt.length} bytes)")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
