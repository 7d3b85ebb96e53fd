package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Cell-occupancy PSI health monitor for the frozen coarse quantizer
  * (VERDICT r9 item 6): stationary appends must not alarm; a planted
  * distribution shift must. */
class IvfHealthSpec extends SparkSpec {
  import spark.implicits._

  private def ring(ids: Range, denom: Int, dim: Int = 8) = ids.map { i =>
    val th = 2 * math.Pi * (i % denom) / denom
    (i.toLong, (Array(math.cos(th).toFloat, math.sin(th).toFloat) ++
      Array.fill(dim - 2)(0.0f)).toSeq)
  }.toDF("id", "v")

  test("stationary appends stay under the retrain threshold; a planted shift trips it") {
    val wh = java.nio.file.Files.createTempDirectory("graft_ivfh").toString
    val store = new ParquetTableStore(spark, wh)
    // build: 64 evenly-spread ring vectors
    IvfIndex.build(store, "ix", ring(0 until 64, 64), "id", "v",
      nCells = 8, iterations = 3)
    val base = IvfIndex.checkHealth(store, "ix")
      .as[(Double, Long, Long, Boolean)].head()
    assert(base._1 == 0.0 && !base._4, s"fresh index must read PSI 0: $base")

    // stationary append: 64 more vectors from the SAME ring distribution
    IvfIndex.append(store, "ix", ring(64 until 128, 64), "id", "v")
    val stat = IvfIndex.checkHealth(store, "ix")
      .as[(Double, Long, Long, Boolean)].head()
    assert(stat._2 == 64L && stat._3 == 128L)
    assert(!stat._4, s"stationary append must not alarm: psi=${stat._1}")
    assert(stat._1 < 0.1, s"stationary PSI should be near 0, got ${stat._1}")

    // planted shift: 192 vectors all at one angle pile into one cell
    val shifted = (200 until 392).map { i =>
      (i.toLong, (Array(1.0f, 0.0f) ++ Array.fill(6)(0.0f)).toSeq)
    }.toDF("id", "v")
    IvfIndex.append(store, "ix", shifted, "id", "v")
    val drift = IvfIndex.checkHealth(store, "ix")
      .as[(Double, Long, Long, Boolean)].head()
    assert(drift._4, s"planted shift must trip retrain: psi=${drift._1}")
    assert(drift._1 > 0.25)
  }

  test("an index built before health tracking fails loudly") {
    val wh = java.nio.file.Files.createTempDirectory("graft_ivfh2").toString
    val store = new ParquetTableStore(spark, wh)
    IvfIndex.build(store, "ix", ring(0 until 32, 32), "id", "v",
      nCells = 4, iterations = 2)
    // simulate a pre-r10 index: drop the health table
    val hp = new java.io.File(store.path("ix_health"))
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rm); f.delete()
    }
    rm(hp)
    val e = intercept[RuntimeException] {
      IvfIndex.checkHealth(store, "ix")
    }
    assert(e.getMessage.contains("health"), e.getMessage)
  }
}
