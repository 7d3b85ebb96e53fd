package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Closed-form linear regression (OLS / ridge) trained in ONE
  * distributed pass: accumulate the normal-equation moments
  * Gᵢⱼ = Σ xᵢxⱼ and bᵢ = Σ xᵢy as a single hash aggregate (map-side
  * partials — the only thing that ever touches the data), then solve
  * the (p+1)×(p+1) system (G + λI)w = b on the driver. This is the
  * scalable shape for fitting the linear quality models a curation
  * pipeline actually uses (predict a quality proxy from cheap document
  * features, price from order features): the 100 TB fact table is read
  * once, the driver solves a handful-of-doubles system, and scoring is
  * a codegen'd column expression — no gradient loop, no collect of
  * rows, no ML library.
  *
  * R² and RMSE come from the SAME pass via the normal-equation
  * identity SSE = Σy² − wᵀ(Xᵀy): no second scan to score residuals.
  *
  * Numerics: moments accumulate in DOUBLE — the one-pass headroom
  * contract of [[IncrementalAgg.partialState]]'s `_sumsq` (loses
  * ~log10(κ·n·mean²/var) of 15-16 digits); callers with wildly scaled
  * features should rescale them into comparable ranges first (the
  * condition number of XᵀX squares the feature-scale ratio). The
  * driver solve is Gaussian elimination with partial pivoting; a
  * singular system (collinear features, constant column next to the
  * intercept) FAILS LOUDLY instead of returning garbage weights.
  *
  * Rows with a null in any feature or the target are excluded up front
  * (a null would silently zero a moment, biasing every weight). */
object LinearFit {

  /** Fitted model: `weights(0)` is the intercept, `weights(i)` the
    * coefficient of `features(i-1)`; `r2` in [0,1] (1 − SSE/SST, 0 when
    * the target is constant), `rmse` = √(SSE/n), `n` = rows fitted. */
  final case class Model(features: Seq[String], weights: Array[Double],
                         r2: Double, rmse: Double, n: Long) {
    /** The fitted ŷ as a codegen'd column over `df`'s feature columns —
      * associated left-to-right as w0 + w1·x1 + … (the oracle's op
      * order). */
    def prediction: Column =
      features.zipWithIndex.foldLeft(lit(weights(0))) { case (acc, (f, i)) =>
        acc + lit(weights(i + 1)) * col(f).cast("double")
      }
  }

  /** Fit y = w0 + Σ wᵢ·xᵢ (+ ridge λ on the non-intercept diagonal).
    * One aggregate over `df`; O(p²) driver state; p = features.size. */
  def fit(df: DataFrame, features: Seq[String], targetCol: String,
          ridge: Double = 0.0): Model =
    fitFromState(state(df, features, targetCol), features, ridge)

  /** One-row mergeable moment state — the upper triangle of
    * [1 X y]ᵀ[1 X y] (`_n`, `_mi_j` for i ≤ j): everything a fit needs,
    * and every component merges by PLAIN SUM, so the model folds
    * through [[IncrementalAgg.foldStateIntoStore]] like any other
    * mergeable state — the fitted model stays current per ingest
    * micro-batch with no history rescan (q143's gate: fold ≡ one-shot
    * train to coefficient precision). */
  def state(df: DataFrame, features: Seq[String], targetCol: String): DataFrame = {
    require(features.nonEmpty, "fit needs at least one feature")
    val p = features.size + 1 // + intercept
    val cols: Seq[Column] =
      lit(1.0) +: features.map(col(_).cast("double")) :+ col(targetCol).cast("double")
    val clean = df.filter((features :+ targetCol)
      .map(col(_).isNotNull).reduce(_ && _))
    clean.agg(
      count(lit(1)).as("_n"),
      (for (i <- 0 until (p + 1); j <- i until (p + 1))
        yield sum(cols(i) * cols(j)).as(s"_m${i}_$j")): _*)
  }

  /** Fold moment states: every component is a sum. Null moments (an
    * all-null batch contributes zero rows) coalesce to 0 so an empty
    * delta is the identity. */
  def mergeStates(states: DataFrame*): DataFrame = {
    require(states.nonEmpty, "mergeStates needs at least one state frame")
    val u = states.reduce(_.unionByName(_))
    u.agg(
      sum(col("_n")).as("_n"),
      u.columns.filter(_.startsWith("_m")).toSeq
        .map(c => coalesce(sum(col(c)), lit(0.0)).as(c)): _*)
  }

  /** Solve the model from a moment state frame — O(p³) driver work,
    * no data touch. */
  def fitFromState(stateDf: DataFrame, features: Seq[String],
                   ridge: Double = 0.0): Model = {
    require(ridge >= 0.0, "ridge must be non-negative")
    val p = features.size + 1
    val sums = stateDf.head()
    val n = sums.getLong(sums.fieldIndex("_n"))
    if (n == 0) sys.error(
      s"LinearFit.fit: no rows with non-null (${features.mkString(", ")}, " +
        "target) — cannot fit on an empty input.")
    def m(i: Int, j: Int): Double = {
      val (a, b) = if (i <= j) (i, j) else (j, i)
      sums.getDouble(sums.fieldIndex(s"_m${a}_$b"))
    }
    val g = Array.tabulate(p, p)((i, j) =>
      m(i, j) + (if (i == j && i > 0) ridge else 0.0))
    val b = Array.tabulate(p)(i => m(i, p))
    val syy = m(p, p)
    val w = solve(g, b, features)
    val sse = math.max(0.0, syy - (0 until p).map(i => w(i) * b(i)).sum)
    val sst = math.max(0.0, syy - m(0, p) * m(0, p) / n)
    val r2 = if (sst == 0.0) 0.0 else math.max(0.0, 1.0 - sse / sst)
    Model(features, w, r2, math.sqrt(sse / n), n)
  }

  /** Replay-idempotent streaming maintenance of the moment state — the
    * fitted model is then [[fitFromState]] at any read point. */
  def foldIntoStore(store: ParquetTableStore, name: String, batch: DataFrame,
                    features: Seq[String], targetCol: String,
                    batchId: Long, epoch: String): Unit =
    IncrementalAgg.foldStateIntoStore(store, name,
      state(batch, features, targetCol),
      (p, d) => mergeStates(p, d), batchId, epoch)

  // --------------------------------------------------- per-group fit

  /** [[state]] per `groupCol` value — one moment row per group; merges
    * by group-keyed sum, so the per-group family composes with the
    * fold protocol exactly like the global state. */
  def statePerGroup(df: DataFrame, groupCol: String, features: Seq[String],
                    targetCol: String): DataFrame = {
    require(features.nonEmpty, "fit needs at least one feature")
    val p = features.size + 1
    val cols: Seq[Column] =
      lit(1.0) +: features.map(col(_).cast("double")) :+ col(targetCol).cast("double")
    df.filter((features :+ targetCol).map(col(_).isNotNull).reduce(_ && _))
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("_n"),
        (for (i <- 0 until (p + 1); j <- i until (p + 1))
          yield sum(cols(i) * cols(j)).as(s"_m${i}_$j")): _*)
  }

  /** One fitted model per group from a per-group moment frame:
    * (group, n, w array<double> — intercept first — r2, rmse). The
    * moment rows are collected driver-side — bounded by GROUP
    * CARDINALITY × O(p²) doubles, never data (the same bound as any
    * per-group driver solve; a million groups of 10 moments is 80 MB,
    * at which point fit fewer, coarser models). A singular group fails
    * loudly BY NAME — one degenerate stratum must not yield silent
    * garbage weights inside an otherwise-good model table. */
  def fitPerGroup(stateDf: DataFrame, groupCol: String, features: Seq[String],
                  ridge: Double = 0.0): DataFrame = {
    require(ridge >= 0.0, "ridge must be non-negative")
    val p = features.size + 1
    val spark = stateDf.sparkSession
    val rows = stateDf.collect()
    val out = rows.map { r =>
      def m(i: Int, j: Int): Double = {
        val (a, b) = if (i <= j) (i, j) else (j, i)
        r.getDouble(r.fieldIndex(s"_m${a}_$b"))
      }
      val n = r.getLong(r.fieldIndex("_n"))
      val g = Array.tabulate(p, p)((i, j) =>
        m(i, j) + (if (i == j && i > 0) ridge else 0.0))
      val b = Array.tabulate(p)(i => m(i, p))
      val w =
        try solve(g, b, features)
        catch { case e: RuntimeException => sys.error(
          s"LinearFit.fitPerGroup: group ${groupCol}=${r.get(0)}: ${e.getMessage}")
        }
      val syy = m(p, p)
      val sse = math.max(0.0, syy - (0 until p).map(i => w(i) * b(i)).sum)
      val sst = math.max(0.0, syy - m(0, p) * m(0, p) / n)
      val r2 = if (sst == 0.0) 0.0 else math.max(0.0, 1.0 - sse / sst)
      org.apache.spark.sql.Row(r.get(0), n, w.toSeq, r2, math.sqrt(sse / n))
    }
    spark.createDataFrame(
      java.util.Arrays.asList(out: _*),
      org.apache.spark.sql.types.StructType(Seq(
        stateDf.schema.fields.head,
        org.apache.spark.sql.types.StructField("n",
          org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField("w",
          org.apache.spark.sql.types.ArrayType(
            org.apache.spark.sql.types.DoubleType, containsNull = false),
          nullable = false),
        org.apache.spark.sql.types.StructField("r2",
          org.apache.spark.sql.types.DoubleType, nullable = false),
        org.apache.spark.sql.types.StructField("rmse",
          org.apache.spark.sql.types.DoubleType, nullable = false))))
  }

  /** Score `df` against a per-group model table IN-PLAN: broadcast-join
    * the (group → weights) frame and evaluate w0 + Σ wᵢ·xᵢ as a column
    * expression — the grouped analog of [[Model.prediction]]. Rows
    * whose group has no model get a null prediction. */
  def predictPerGroup(df: DataFrame, models: DataFrame, groupCol: String,
                      features: Seq[String]): DataFrame = {
    val pred = features.zipWithIndex.foldLeft(element_at(col("w"), 1)) {
      case (acc, (f, i)) =>
        acc + element_at(col("w"), i + 2) * col(f).cast("double")
    }
    df.join(broadcast(models.select(col(groupCol), col("w"))),
        Seq(groupCol), "left")
      .withColumn("prediction", pred)
      .drop("w")
  }

  /** Gaussian elimination with partial pivoting over the p×p normal
    * matrix — O(p³) driver work on a handful of doubles. */
  private def solve(g: Array[Array[Double]], b: Array[Double],
                    features: Seq[String]): Array[Double] = {
    val p = b.length
    val a = Array.tabulate(p)(i => g(i).clone() :+ b(i))
    for (c <- 0 until p) {
      val piv = (c until p).maxBy(r => math.abs(a(r)(c)))
      if (math.abs(a(piv)(c)) < 1e-10 * (1.0 + a.map(r => math.abs(r(c))).max))
        sys.error(
          s"LinearFit.fit: normal matrix is singular at column $c — features " +
            s"(${features.mkString(", ")}) are collinear (or one is constant, " +
            "duplicating the intercept). Drop or recombine the offending " +
            "feature; a silent pseudo-inverse would return arbitrary weights.")
      val t = a(c); a(c) = a(piv); a(piv) = t
      for (r <- c + 1 until p) {
        val f = a(r)(c) / a(c)(c)
        for (k <- c to p) a(r)(k) -= f * a(c)(k)
      }
    }
    val w = new Array[Double](p)
    for (r <- p - 1 to 0 by -1)
      w(r) = (a(r)(p) - (r + 1 until p).map(k => a(r)(k) * w(k)).sum) / a(r)(r)
    w
  }
}
