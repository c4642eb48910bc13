package graft.etl

import org.apache.spark.sql.SparkSession

/** CLI entry: full star-schema batch build (SURVEY §7.1 app/).
  * Usage: runMain graft.etl.BuildMain <sfDir> <outDir>
  * Idempotent: re-running against the same outDir appends nothing. */
object BuildMain {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    StarSchemaBuilder.runFull(spark, sfDir, outDir)
    // sanity counts, mirroring prod_etl/ETL_1.py:504-520
    Seq("dim_code", "dim_payer", "dim_provider_group", "dim_pos_set",
      "xref_pos", "xref_pg_member", "fact_rate").foreach { t =>
      println(s"[build] $t rows=${spark.read.parquet(s"$outDir/$t").count()}")
    }
    spark.stop()
  }
}
