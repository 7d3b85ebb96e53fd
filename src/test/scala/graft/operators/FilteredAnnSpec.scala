package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Filtered search on the COMPRESSED ANN families (VERDICT r13 item 2):
  * [[IvfSq.probeFiltered]] / [[IvfPq.probeFiltered]] must return the true
  * top-k OF THE ALLOWED SUBSET, with the allowed restriction applied
  * BEFORE the shortlist cut — the interaction that does not exist on the
  * uncompressed index and that a post-hoc filter gets silently wrong. */
class FilteredAnnSpec extends SparkSpec {
  import spark.implicits._

  private def unit(theta: Double, dim: Int = 8): Seq[Float] =
    (Array(math.cos(theta).toFloat, math.sin(theta).toFloat) ++
      Array.fill(dim - 2)(0.0f)).toSeq

  /** Corpus with a planted trap: 12 DISALLOWED twins sitting exactly on
    * the query direction (ids 100..111), one allowed near-neighbor at a
    * small angle (id 200), and 30 allowed fillers far away (ids 0..29).
    * Any shortlist smaller than the twin cluster fills entirely with
    * twins unless the filter runs first. */
  private def trapCorpus = {
    val twins = (100 until 112).map(i => (i.toLong, unit(0.0)))
    val near = Seq((200L, unit(0.1)))
    val far = (0 until 30).map(i => (i.toLong, unit(1.0 + i * 0.07)))
    (twins ++ near ++ far).toDF("id", "v")
  }

  private def freshStore() = new ParquetTableStore(spark,
    java.nio.file.Files.createTempDirectory("graft_fann").toString)

  private val query = Seq((9999L, unit(0.0))).toDF("id", "v")

  test("IVF-SQ filtered probe survives a shortlist full of disallowed twins (filter BEFORE shortlist)") {
    val store = freshStore()
    IvfSq.build(store, "sq", trapCorpus, "id", "v", nCells = 4, iterations = 2)
    val allowed = trapCorpus.filter($"id" < 100L || $"id" === 200L).select($"id")
    // shortlist 4 < the 12-twin cluster: a post-shortlist filter would
    // see only twins and return nothing; filter-first must return the
    // allowed near-neighbor rank-1
    val got = IvfSq.probeFiltered(store, "sq", query, "id", "v", allowed,
        topK = 1, nProbe = 4, shortlist = 4)
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect().toSeq
    assert(got == Seq((9999L, 200L)),
      s"expected the allowed near-neighbor 200 at rank 1, got $got")
  }

  test("IVF-PQ filtered probe survives a shortlist full of disallowed twins (filter BEFORE shortlist)") {
    val store = freshStore()
    IvfPq.build(store, "pq", trapCorpus, "id", "v", dim = 8, nCells = 4,
      m = 4, ksub = 8, iterations = 3)
    val allowed = trapCorpus.filter($"id" < 100L || $"id" === 200L).select($"id")
    val got = IvfPq.probeFiltered(store, "pq", query, "id", "v", allowed,
        dim = 8, topK = 1, m = 4, ksub = 8, nProbe = 4, shortlist = 4)
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect().toSeq
    assert(got == Seq((9999L, 200L)),
      s"expected the allowed near-neighbor 200 at rank 1, got $got")
  }

  test("IVF-SQ exhaustive filtered probe == brute force over the allowed subset, full top-k, no disallowed") {
    val store = freshStore()
    IvfSq.build(store, "sq", trapCorpus, "id", "v", nCells = 4, iterations = 2)
    val allowedIds = trapCorpus.filter($"id" % 2 === 0 && $"id" < 100L)
      .select($"id")
    val queries = trapCorpus.filter($"id" >= 1L && $"id" < 6L)
      .select(($"id" + 5000L).as("id"), $"v")
    val got = IvfSq.probeFiltered(store, "sq", queries, "id", "v",
        allowedIds, topK = 3, nProbe = 4, shortlist = 64)
      .select($"query_id", $"rank", $"neighbor_id")
      .as[(Long, Long, Long)].collect().toSeq
    assert(got.groupBy(_._1).forall(_._2.size == 3),
      s"every query must get the FULL top-3 of the allowed subset: $got")
    assert(got.forall(r => r._3 % 2 == 0 && r._3 < 100L),
      s"disallowed neighbor surfaced: $got")
    val exact = Similarity.annBruteForce(queries,
        trapCorpus.filter($"id" % 2 === 0 && $"id" < 100L), "id", "v", 3)
      .select($"query_id", $"rank", $"neighbor_id")
      .as[(Long, Long, Long)].collect().toSet
    assert(got.toSet == exact,
      "exhaustive filtered IVF-SQ probe diverges from filtered brute force")
  }

  test("IVF-PQ exhaustive filtered probe == brute force over the allowed subset") {
    val store = freshStore()
    IvfPq.build(store, "pq", trapCorpus, "id", "v", dim = 8, nCells = 4,
      m = 4, ksub = 8, iterations = 3)
    val allowedIds = trapCorpus.filter($"id" % 2 === 0 && $"id" < 100L)
      .select($"id")
    val queries = trapCorpus.filter($"id" >= 1L && $"id" < 6L)
      .select(($"id" + 5000L).as("id"), $"v")
    val got = IvfPq.probeFiltered(store, "pq", queries, "id", "v",
        allowedIds, dim = 8, topK = 3, m = 4, ksub = 8, nProbe = 4,
        shortlist = 64)
      .select($"query_id", $"rank", $"neighbor_id")
      .as[(Long, Long, Long)].collect().toSet
    val exact = Similarity.annBruteForce(queries,
        trapCorpus.filter($"id" % 2 === 0 && $"id" < 100L), "id", "v", 3)
      .select($"query_id", $"rank", $"neighbor_id")
      .as[(Long, Long, Long)].collect().toSet
    assert(got == exact,
      "exhaustive filtered IVF-PQ probe diverges from filtered brute force")
  }

  test("unfiltered probe is unchanged by the refactor (probe == probeRestricted with no filter)") {
    val store = freshStore()
    IvfSq.build(store, "sq", trapCorpus, "id", "v", nCells = 4, iterations = 2)
    val queries = trapCorpus.filter($"id" < 3L)
      .select(($"id" + 5000L).as("id"), $"v")
    val viaProbe = IvfSq.probe(store, "sq", queries, "id", "v", topK = 2,
        nProbe = 4, shortlist = 64)
      .select($"query_id", $"rank", $"neighbor_id")
      .as[(Long, Long, Long)].collect().toSet
    val exact = Similarity.annBruteForce(queries, trapCorpus, "id", "v", 2)
      .select($"query_id", $"rank", $"neighbor_id")
      .as[(Long, Long, Long)].collect().toSet
    assert(viaProbe == exact)
  }
}
