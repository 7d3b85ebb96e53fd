package graft

import org.apache.spark.sql.SparkSession

/** SQL-surface catalog: registers every test table as a temp view so users
  * can run plain `spark.sql` against the same names the reference's SQL
  * uses (and the DuckDB oracle uses) — completing the "switch engines, keep
  * your queries" story. */
object Catalog {
  def registerViews(spark: SparkSession, sfDir: String): Unit =
    Tables.names.foreach { n =>
      Tables.load(spark, sfDir, n).createOrReplaceTempView(n)
    }
}
