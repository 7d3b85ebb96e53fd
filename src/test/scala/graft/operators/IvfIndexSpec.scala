package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class IvfIndexSpec extends SparkSpec {
  import spark.implicits._

  // deterministic unit vectors on a ring: id i -> (cos θi, sin θi, 0, 0)
  private def ring(n: Int, dim: Int = 8) = (0 until n).map { i =>
    val th = 2 * math.Pi * i / n
    (i.toLong, (Array(math.cos(th).toFloat, math.sin(th).toFloat) ++
      Array.fill(dim - 2)(0.0f)).toSeq)
  }.toDF("id", "v")

  test("probe from the stored index matches brute-force rank-1 for planted twins") {
    val wh = java.nio.file.Files.createTempDirectory("graft_ivf_ix").toString
    val store = new ParquetTableStore(spark, wh)
    val corpus = ring(64)
    IvfIndex.build(store, "ix", corpus, "id", "v", nCells = 8, iterations = 3)
    // planted twins of ids 3..10 under new ids
    val queries = corpus.filter($"id" >= 3 && $"id" < 11)
      .select(($"id" + 1000L).as("id"), $"v")
    val got = IvfIndex.probe(store, "ix", queries, "id", "v", topK = 1)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toMap
    (3L until 11L).foreach { i =>
      assert(got(i + 1000L) == i, s"twin of $i not retrieved: ${got.get(i + 1000L)}")
    }
  }

  test("probeFiltered: true top-k OF THE ALLOWED SUBSET, never a post-hoc filter") {
    val wh = java.nio.file.Files.createTempDirectory("graft_ivf_filt").toString
    val store = new ParquetTableStore(spark, wh)
    val corpus = ring(64)
    IvfIndex.build(store, "ix", corpus, "id", "v", nCells = 8, iterations = 3)
    val allowed = corpus.filter($"id" % 2 === 0).select($"id")
    // twins of ODD ids: their unfiltered rank-1 (the twin itself) is
    // disallowed, so the filtered answer must be the nearest EVEN
    // neighbor — on the ring, one of the two adjacent even ids
    val queries = corpus.filter($"id" % 2 === 1 && $"id" < 11)
      .select(($"id" + 1000L).as("id"), $"v")
    val got = IvfIndex.probeFiltered(store, "ix", queries, "id", "v",
        allowed, topK = 3, nProbe = 8)
      .select($"query_id", $"rank", $"neighbor_id")
      .as[(Long, Long, Long)].collect().toSeq
    val byQuery = got.groupBy(_._1)
    queries.select($"id").as[Long].collect().foreach { q =>
      val rows = byQuery.getOrElse(q, Seq.empty)
      assert(rows.size == 3, s"query $q: expected the FULL top-3 of the " +
        s"allowed subset, got ${rows.size} rows — post-hoc filtering?")
      assert(rows.forall(_._3 % 2 == 0),
        s"query $q surfaced a disallowed neighbor: $rows")
      val odd = q - 1000L
      val rank1 = rows.find(_._2 == 1L).get._3
      assert(rank1 == odd - 1 || rank1 == odd + 1,
        s"twin of $odd: filtered rank-1 must be an adjacent even id, got $rank1")
    }
    // exhaustive filtered probe == brute force over the filtered corpus
    val exact = Similarity.annBruteForce(queries,
        corpus.filter($"id" % 2 === 0), "id", "v", 3)
      .select($"query_id", $"rank", $"neighbor_id")
      .as[(Long, Long, Long)].collect().toSet
    assert(got.toSet == exact,
      s"exhaustive filtered probe diverges from filtered brute force")
  }

  test("verifyFresh passes on the same corpus (any row order) and fails on a changed one") {
    val wh = java.nio.file.Files.createTempDirectory("graft_ivf_fresh").toString
    val store = new ParquetTableStore(spark, wh)
    val corpus = ring(32)
    IvfIndex.build(store, "ix", corpus, "id", "v", nCells = 4, iterations = 2)
    IvfIndex.verifyFresh(store, "ix", corpus, "id")
    IvfIndex.verifyFresh(store, "ix", corpus.orderBy($"id".desc), "id") // commutative
    // grown corpus: stale
    val grown = corpus.unionByName(ring(33).filter($"id" === 32L))
    val e = intercept[RuntimeException] {
      IvfIndex.verifyFresh(store, "ix", grown, "id")
    }
    assert(e.getMessage.contains("STALE"), e.getMessage)
    // same count, different ids: still stale (fingerprint, not count)
    val swapped = corpus.filter($"id" =!= 0L)
      .unionByName(ring(33).filter($"id" === 32L))
    val e2 = intercept[RuntimeException] {
      IvfIndex.verifyFresh(store, "ix", swapped, "id")
    }
    assert(e2.getMessage.contains("STALE"))
  }

  test("probe prunes the cells table at the partition level (no full-corpus read)") {
    val wh = java.nio.file.Files.createTempDirectory("graft_ivf_prune").toString
    val store = new ParquetTableStore(spark, wh)
    IvfIndex.build(store, "ix", ring(64), "id", "v", nCells = 8, iterations = 2)
    val q = ring(64).filter($"id" === 5L).select(($"id" + 1000L).as("id"), $"v")
    val plan = IvfIndex.probe(store, "ix", q, "id", "v", topK = 1, nProbe = 2)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters"), plan)
    assert(plan.contains("cell"), plan)
    // the isin literal list bounds the partitions actually read
    assert(plan.contains("cell#") || plan.contains("isin") || plan.contains("IN"),
      s"expected a cell membership partition filter:\n$plan")
  }

  test("probe result is identical to annIvf with the same trained centroids") {
    val wh = java.nio.file.Files.createTempDirectory("graft_ivf_eq").toString
    val store = new ParquetTableStore(spark, wh)
    val corpus = ring(48)
    IvfIndex.build(store, "ix", corpus, "id", "v", nCells = 6, iterations = 3)
    val queries = corpus.filter($"id" < 6).select(($"id" + 500L).as("id"), $"v")
    val fromIndex = IvfIndex.probe(store, "ix", queries, "id", "v", topK = 3)
      .orderBy("query_id", "rank")
      .as[(Long, Long, Long, Double)].collect().toSeq
    val direct = Similarity.annIvf(queries, corpus, "id", "v", topK = 3,
        nCells = 6, trainedCentroids = Some(store.read("ix_centroids").get))
      .orderBy("query_id", "rank")
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(fromIndex == direct,
      s"stored-index probe diverges from direct annIvf:\n$fromIndex\nvs\n$direct")
  }

  test("append: appended twins retrievable, replay no-ops, freshness tracks the union") {
    val wh = java.nio.file.Files.createTempDirectory("graft_ivf_app").toString
    val store = new ParquetTableStore(spark, wh)
    val corpus = ring(64)
    IvfIndex.build(store, "ix", corpus.filter($"id" < 40), "id", "v",
      nCells = 8, iterations = 3)
    IvfIndex.append(store, "ix", corpus.filter($"id" >= 40 && $"id" < 52), "id", "v")
    val metaAfter1 = store.read("ix_meta").get.head()
    IvfIndex.append(store, "ix", corpus.filter($"id" >= 40 && $"id" < 52), "id", "v")
    assert(store.read("ix_meta").get.head() == metaAfter1, "replay moved the fingerprint")
    IvfIndex.append(store, "ix", corpus.filter($"id" >= 52), "id", "v")
    IvfIndex.verifyFresh(store, "ix", corpus, "id") // the full union is indexed
    // twins of APPENDED vectors must come back rank-1, like built-in ones
    val queries = corpus.filter($"id" >= 44 && $"id" < 50)
      .select(($"id" + 1000L).as("id"), $"v")
    val got = IvfIndex.probe(store, "ix", queries, "id", "v", topK = 1)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toMap
    (44L until 50L).foreach { i =>
      assert(got(i + 1000L) == i, s"appended twin of $i not retrieved: ${got.get(i + 1000L)}")
    }
    // a stale probe (corpus grew past the index) still fails loudly
    val e = intercept[RuntimeException] {
      IvfIndex.verifyFresh(store, "ix", ring(65), "id")
    }
    assert(e.getMessage.contains("STALE"))
  }

  test("append fails loudly when a re-delivered id's vector moved cells") {
    val wh = java.nio.file.Files.createTempDirectory("graft_ivf_mv").toString
    val store = new ParquetTableStore(spark, wh)
    val corpus = ring(64)
    IvfIndex.build(store, "ix", corpus, "id", "v", nCells = 8, iterations = 3)
    // pick two indexed ids that live in DIFFERENT cells and swap their
    // vectors: the re-delivered ids must re-assign across cells
    val cells = store.read("ix_cells").get
      .select($"id", $"cell").as[(Long, Int)].collect().toMap
    val (idA, cellA) = cells.head
    val idB = cells.collectFirst { case (i, c) if c != cellA => i }.get
    val vOf = corpus.as[(Long, Seq[Float])].collect().toMap
    val swapped = Seq((idA, vOf(idB)), (idB, vOf(idA))).toDF("id", "v")
    val e = intercept[RuntimeException] {
      IvfIndex.append(store, "ix", swapped, "id", "v")
    }
    assert(e.getMessage.contains("CHANGED vector"), e.getMessage)
    // and the failed append left the index intact (guard runs pre-merge)
    IvfIndex.verifyFresh(store, "ix", corpus, "id")
  }
}
