package graft.tools

import graft.SparkEntry
import org.apache.spark.sql.SparkSession

import java.nio.file.{Files, Paths}

/** Writes one `<outDir>/<query><suffix>.txt` per named query holding its
  * `.explain("formatted")` output — the per-round before/after plan
  * evidence (`plans/rNN/`). Args: outDir suffix query [query ...]; the
  * data dir defaults to sf0.001 (override with SPARK_GRAFT_SF_DIR).
  * Queries that build-and-destroy fixtures run for real; ones that
  * localCheckpoint their result dump as `Scan ExistingRDD` (recorded in
  * PLANS.md — the operator plans inside those lifecycles are pinned by
  * PlanSpec and the probe tools). */
object DumpPlanFiles {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val suffix = args(1)
    val names = args.drop(2)
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Files.createDirectories(Paths.get(outDir))
    names.foreach { name =>
      val plan =
        try {
          graft.EntryHelpers.takePreCheckpointPlan() // drop any stale capture
          val df = SparkEntry.queries(name)(spark, dir)
          // lifecycle queries checkpoint their result to decouple async
          // fixture teardown; they register the PRE-checkpoint frame so
          // the dump shows the real operators, not `Scan ExistingRDD`
          graft.EntryHelpers.takePreCheckpointPlan().getOrElse(df)
            .queryExecution
            .explainString(org.apache.spark.sql.execution.FormattedMode)
        } catch { case e: Throwable => s"ERROR dumping $name: ${e.getMessage}" }
      Files.writeString(Paths.get(outDir, s"$name$suffix.txt"), plan)
      println(s"[plans] $name$suffix")
    }
    spark.stop()
  }
}
