package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Product quantization for compressed ANN (Jégou, Douze & Schmid,
  * "Product Quantization for Nearest Neighbor Search", TPAMI 2011): the
  * embedding space is split into `m` subspaces, each quantized by its
  * own `ksub`-centroid codebook, and a vector becomes `m` small integer
  * codes — for the default (64-dim float, m=8, ksub=16) that is 256
  * bytes → 8 codes, a 32× memory contraction. Search scores compressed
  * codes WITHOUT decompressing: per query, one distance table of
  * m × ksub subspace distances (the ADC lookup table), then every
  * stored code list scores with m array lookups — no float math per
  * candidate, which is what makes a 10^9-vector corpus scannable.
  *
  * Spark shapes: training is per-subspace Lloyd run as ONE pipeline
  * over an (id, sub, subvec) frame — all m subspaces train in the same
  * hash aggregates, no per-subspace driver loop; the codebook
  * (m × ksub rows) is broadcast everywhere it is used; encoding is one
  * argmin hash aggregate (max_by, no window); ADC scoring keeps the
  * lookup loop in whole-stage codegen via `aggregate`/`transform` over
  * the LUT array. Everything is deterministic: seeds are the first
  * `ksub` vectors by id, argmin tie-breaks to the lowest code.
  *
  * Composition: this is the PQ half of IVF-ADC — [[IvfIndex]] supplies
  * the coarse cells and persistence, this operator compresses each
  * cell's residents; the gate and specs cover the PQ path end to end
  * (shortlist by ADC, exact-rescore the shortlist — the standard
  * re-ranking FAISS calls IndexIVFPQ + refine).
  */
object ProductQuantizer {

  /** Squared L2 distance between two float/double array columns, as a
    * sequential double fold (oracle-reproducible like [[graft.functions.Vectors.dot]]). */
  private def l2sq(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => (x.cast("double") - y.cast("double")) *
        (x.cast("double") - y.cast("double"))),
      lit(0.0), (acc, v) => acc + v)

  /** (id, sub, sv) — every vector exploded into its m subvectors.
    * `slice` is 1-based; subDim = dim / m must divide evenly (checked at
    * the call sites that know the dim). */
  private def subvecs(vectors: DataFrame, idCol: String, vecCol: String,
                      m: Int, subDim: Int): DataFrame =
    vectors.select(col(idCol).as("id"), col(vecCol).as("v"))
      .select(col("id"), explode(sequence(lit(0), lit(m - 1))).as("sub"), col("v"))
      .select(col("id"), col("sub"),
        slice(col("v"), col("sub") * subDim + 1, lit(subDim)).as("sv"))

  /** Train per-subspace codebooks: (sub, code, centroid). One Lloyd
    * iteration = one assign (argmin hash aggregate over the broadcast
    * codebook) + one (sub, code, dim) mean — all m subspaces inside the
    * same two exchanges. Seeds: the first ksub vectors by id supply
    * subspace s's codes 0..ksub-1 (deterministic, like
    * [[Similarity.ivfSeedCentroids]]). Cells that lose every member
    * keep their previous centroid. Train on a bounded sample at scale —
    * the codebook is (m × ksub) rows regardless of corpus size. */
  def train(vectors: DataFrame, idCol: String, vecCol: String, dim: Int,
            m: Int = 8, ksub: Int = 16, iterations: Int = 5): DataFrame = {
    require(dim % m == 0, s"dim $dim not divisible by m $m")
    val subDim = dim / m
    val sv = Checkpoints.materialize(subvecs(vectors, idCol, vecCol, m, subDim))
    val seedIds = vectors.select(col(idCol).as("id"))
      .orderBy(col("id")).limit(ksub)
    // a corpus smaller than ksub would seed fewer codes than the ADC
    // stride assumes, silently mis-indexing every LUT past subspace 0
    val nSeeds = seedIds.count()
    require(nSeeds == ksub,
      s"cannot train $ksub codes per subspace from $nSeeds vectors — " +
        "shrink ksub or grow the training sample")
    var codebook = sv.join(broadcast(seedIds), Seq("id"))
      .withColumn("code",
        (dense_rank().over(org.apache.spark.sql.expressions.Window
          .partitionBy(col("sub")).orderBy(col("id"))) - 1).cast("int"))
      .select(col("sub"), col("code"), col("sv").cast("array<double>").as("centroid"))
      .localCheckpoint() // m × ksub rows
    for (_ <- 1 to iterations) {
      val assigned = assign(sv, codebook)
      val means = assigned
        .select(col("sub"), col("code"), posexplode(col("sv")).as(Seq("p", "x")))
        .groupBy(col("sub"), col("code"), col("p"))
        .agg(avg(col("x")).as("mcomp"))
        .groupBy(col("sub"), col("code"))
        .agg(transform(array_sort(collect_list(struct(col("p"), col("mcomp")))),
          s => s.getField("mcomp")).as("trained"))
      codebook = codebook.as("c")
        .join(means.as("r"), Seq("sub", "code"), "left")
        .select(col("sub"), col("code"),
          coalesce(col("trained"), col("centroid")).as("centroid"))
        .localCheckpoint()
    }
    Checkpoints.release(sv)
    codebook
  }

  /** (id, sub, code, sv): each subvector's argmin-distance code — one
    * hash aggregate, tie-break to the lowest code. The subvector rides
    * through the aggregate (every row of an (id, sub) group carries the
    * identical sv, so `first` is deterministic) — re-joining it back
    * from the source frame would cost a corpus-sized shuffle per Lloyd
    * iteration. */
  private def assign(sv: DataFrame, codebook: DataFrame): DataFrame =
    sv.join(broadcast(codebook), Seq("sub"))
      .select(col("id"), col("sub"), col("code"), col("sv"),
        l2sq(col("sv"), col("centroid")).as("d"))
      .groupBy(col("id"), col("sub"))
      .agg(max_by(col("code"), struct((-col("d")).as("nd"), (-col("code")).as("nc")))
        .as("code"),
        first(col("sv")).as("sv"))

  /** Compress: (id, codes array<int> ordered by subspace). */
  def encode(vectors: DataFrame, idCol: String, vecCol: String, dim: Int,
             codebook: DataFrame, m: Int = 8): DataFrame = {
    require(dim % m == 0, s"dim $dim not divisible by m $m")
    val sv = subvecs(vectors, idCol, vecCol, m, dim / m)
    assign(sv, codebook)
      .groupBy(col("id"))
      .agg(transform(array_sort(collect_list(struct(col("sub"), col("code")))),
        s => s.getField("code")).as("codes"))
  }

  /** ADC top-k: shortlist by asymmetric distance (query subvectors vs
    * codebook centroids — the corpus side never leaves its codes), then
    * exact-rescore the shortlist against the uncompressed vectors and
    * emit the standard (query_id, rank, neighbor_id, score) frame.
    * `shortlist` bounds the exact-rescore fan-in per query (FAISS's
    * refine factor). Scoring itself is m array lookups per candidate —
    * `aggregate` over a per-query LUT array, inside codegen. */
  /** The compressed half of ADC search: LUT build + codes-only scoring
    * + bounded shortlist. `queries`: (lutKeys..., qv); `candCodes`:
    * (lutKeys..., id, codes) — a query-restricted candidate pool
    * ([[IvfPq.probe]]'s probed-cell members) or the full code table
    * fanned out per query ([[searchAdc]]). `lutKeys` names the columns
    * ONE lookup table is built per — `(query_id)` for flat/raw PQ, and
    * `(query_id, cell)` for residual IVF-PQ, where `qv` is the QUERY
    * RESIDUAL against that cell's coarse centroid and the codes are
    * residual codes, so ADC distance stays an estimate of the same
    * ‖q − x‖² in every cell (FAISS `by_residual`: ‖q − x‖² =
    * ‖(q − µc) − r‖²) and the per-QUERY shortlist can rank candidates
    * across probed cells on one scale. The LUT frame stays broadcast-
    * sized either way: queries × nProbe rows of m × ksub doubles.
    * Returns (query_id, neighbor_id), top-`shortlist` per query by
    * ascending ADC distance. */
  private[operators] def adcShortlist(queries: DataFrame, candCodes: DataFrame,
                                      codebook: DataFrame, dim: Int, m: Int,
                                      ksub: Int, shortlist: Int,
                                      lutKeys: Seq[String] = Seq("query_id")): DataFrame = {
    require(dim % m == 0, s"dim $dim not divisible by m $m")
    // the ADC stride must match the codebook's actual geometry or every
    // LUT slot past subspace 0 reads the wrong subspace's distances —
    // silently. Both checks are one action on the (m × ksub)-row frame.
    val geom = codebook.agg(max(col("code")), countDistinct(col("sub"))).head()
    require(geom.getInt(0) + 1 == ksub,
      s"codebook holds ${geom.getInt(0) + 1} codes per subspace, ADC called with ksub=$ksub")
    require(geom.getLong(1) == m,
      s"codebook spans ${geom.getLong(1)} subspaces, ADC called with m=$m")
    val subDim = dim / m
    // ADC lookup table, one per lut key: flat array of m*ksub squared
    // distances, index = sub*ksub + code. The key rides through subvecs
    // packed as one struct (subvecs' id slot), unpacked by the join.
    val packKey = struct(lutKeys.map(col): _*)
    val lut = subvecs(queries.select(packKey.as("_qk"), col("qv")),
        "_qk", "qv", m, subDim)
      .join(broadcast(codebook), Seq("sub"))
      .select(col("id").as("_qk"), (col("sub") * ksub + col("code")).as("slot"),
        l2sq(col("sv"), col("centroid")).as("d"))
      .groupBy(col("_qk"))
      .agg(transform(array_sort(collect_list(struct(col("slot"), col("d")))),
        s => s.getField("d")).as("lut"))
    val scored = candCodes.withColumn("_qk", packKey)
      .join(broadcast(lut), Seq("_qk"))
      .filter(col("id") =!= col("query_id"))
      .select(col("query_id"), col("id").as("neighbor_id"),
        aggregate(
          zip_with(col("codes"), sequence(lit(0), lit(m - 1)),
            (c, s) => element_at(col("lut"), (s * ksub + c + 1).cast("int"))),
          lit(0.0), (acc, v) => acc + v).as("adc_dist"))
    scored.groupBy(col("query_id"))
      .agg(graft.functions.TopK.topK(shortlist)(
        col("neighbor_id"), -col("adc_dist")).as("tk"))
      .select(col("query_id"), explode(col("tk")).as("c"))
      .select(col("query_id"), col("c._1").as("neighbor_id"))
  }

  def searchAdc(queries: DataFrame, codes: DataFrame, vectors: DataFrame,
                idCol: String, vecCol: String, codebook: DataFrame,
                dim: Int, topK: Int, m: Int = 8, ksub: Int = 16,
                shortlist: Int = 32): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
    // full-scan variant: every code row is a candidate for every query
    val candCodes = codes.crossJoin(broadcast(q.select(col("query_id"))))
      .select(col("query_id"), col("id"), col("codes"))
    val short = adcShortlist(q, candCodes, codebook, dim, m, ksub, shortlist)
    // exact re-rank of the bounded shortlist
    val rescored = short
      .join(vectors.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv")),
        Seq("neighbor_id"))
      .join(broadcast(q), Seq("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        graft.functions.Vectors.dotNative(col("qv"), col("cv")).as("score"))
    Similarity.takeTopK(rescored, topK)
  }
}
