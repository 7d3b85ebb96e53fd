package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Int8 scalar quantization (SQ8) for the ANN family — the
  * memory-bandwidth lever between full floats and PQ codes: each
  * vector stores one double scale (its max |component|) plus one int8
  * code per dimension, code_i = round(v_i / scale · 127), so a scan
  * reads ~1/4 of the float bytes and the dot product runs in INTEGER
  * arithmetic, rescaled once per pair:
  *
  *   ⟨a, b⟩ ≈ (Σ codeA_i · codeB_i) · (scaleA · scaleB / 127²)
  *
  * This is FAISS's ScalarQuantizer QT_8bit idea re-expressed as plain
  * columns (codes: array<int>, scale: double). Everything is
  * deterministic double→round arithmetic — no training, no codebook —
  * so an oracle replays every code and every score exactly; compare
  * [[ProductQuantizer]], whose codebook needs k-means training and
  * whose gate therefore pins containment rather than scores.
  *
  * Scale shape: encode is one narrow projection (no shuffle); search
  * is the same broadcast-queries × codes-scan plan as
  * [[Similarity.annBruteForce]] but over the compressed table — at
  * 100 TB the corpus pass is the cost, and SQ8 cuts its bytes 4×
  * while keeping per-dimension resolution IVF cells can refine
  * against. Zero vectors quantize to all-zero codes with scale 0
  * (score 0 against everything) rather than dividing by zero. */
object ScalarQuantizer {

  /** (id, scale, codes): scale = max |v_i| (double), codes =
    * round((v_i / scale) · 127) as int — round half away from zero,
    * the shared Spark/DuckDB semantics, so codes replay bit-exact. */
  def encode(df: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val asD = transform(col(vecCol), x => x.cast("double"))
    val scale = array_max(transform(asD, x => abs(x)))
    df.select(col(idCol).as("id"), asD.as("_v"), scale.as("scale"))
      .select(col("id"), col("scale"),
        transform(col("_v"), x =>
          when(col("scale") > 0, round(x / col("scale") * 127, 0))
            .otherwise(lit(0.0)).cast("int")).as("codes"))
  }

  /** Brute-force top-k over SQ8 codes: integer dot per pair, one
    * double rescale. `codes` is [[encode]]'s output for the corpus;
    * queries encode on the fly (tiny side, broadcast). Returns
    * (query_id, rank, neighbor_id, score) like the rest of the ANN
    * family; score is the RECONSTRUCTED approximate dot, rounded 4. */
  def search(queries: DataFrame, codes: DataFrame, idCol: String,
             vecCol: String, topK: Int): DataFrame = {
    val q = encode(queries, idCol, vecCol)
      .select(col("id").as("query_id"), col("scale").as("_qs"),
        col("codes").as("_qc"))
    val intDot = aggregate(
      zip_with(col("_qc"), col("codes"), (a, b) => a.cast("long") * b),
      lit(0L), (acc, x) => acc + x)
    val scored = codes
      .select(col("id").as("neighbor_id"), col("scale"), col("codes"))
      .crossJoin(broadcast(q))
      .filter(col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        (intDot.cast("double") *
          (col("_qs") * col("scale") / lit(16129.0))).as("score"))
    Similarity.takeTopK(scored, topK)
  }
}
