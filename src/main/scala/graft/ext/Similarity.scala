package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`array<float>`).
  *
  * Brute-force cosine top-k is the exact baseline: broadcast the (small)
  * query set against the corpus — a map-side nested loop, no shuffle except
  * the final per-query top-k. The LSH variant buckets by random-hyperplane
  * signatures so the join only touches colliding buckets — the 100 TB path
  * (candidates ∝ rows × tables, not rows²).
  *
  * All vector math is higher-order-function expressions (`zip_with` +
  * `aggregate`) — stays inside whole-stage codegen, no UDF.
  */
object Similarity {

  /** Cast array<float> → array<double> (exact; keeps fold order stable). */
  def toDouble(v: Column): Column = transform(v, _.cast("double"))

  /** Sequential-fold dot product — matches a left-to-right summation. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def l2Norm(v: Column): Column = sqrt(dot(v, v))

  /** Native one-pass expression (graft.functions.VectorExprs): identical
    * IEEE semantics to the sequential-fold HOF formulation, ~50× cheaper
    * (HOFs are interpreted). A zero-norm vector yields null similarity
    * (ranked last) instead of an ANSI divide-by-zero error. */
  def cosine(a: Column, b: Column): Column =
    graft.functions.VectorExprs.cosineSim(a, b)

  /** Exact brute-force top-k: for each query row, the k nearest corpus rows
    * by cosine (ties broken by corpus id asc). `queries` must be small
    * enough to broadcast. */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame, k: Int,
                     qId: String = "query_id", cId: String = "neighbor_id"): DataFrame = {
    val q = broadcast(queries.select(col("vec_id").as(qId), toDouble(col("embedding")).as("__qv")))
    val c = corpus.select(col("vec_id").as(cId), toDouble(col("embedding")).as("__cv"))
    val w = Window.partitionBy(col(qId)).orderBy(col("sim").desc, col(cId).asc)
    c.join(q, col(qId) =!= col(cId))
      .withColumn("sim", cosine(col("__qv"), col("__cv")))
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= k)
      .select(col(qId), col("rk"), col(cId), col("sim"))
  }

  /** Deterministic pseudo-random hyperplanes: `tables` independent sets of
    * `bits` hyperplanes over `dim` dimensions, seeded. */
  def hyperplanes(dim: Int, bits: Int, tables: Int, seed: Long = 42L): Array[Array[Array[Double]]] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(tables, bits, dim)(rnd.nextGaussian())
  }

  /** Approximate top-k via multi-table random-hyperplane LSH: candidates are
    * corpus rows sharing a bucket with the query in ANY table, scored
    * exactly, top-k per query. Recall grows with `tables`; cost is
    * #tables equi-joins instead of a full cross product. Signatures for all
    * tables × bits come from one native expression pass
    * (graft.functions.VectorExprs.hyperplaneSigs). */
  def lshTopK(queries: DataFrame, corpus: DataFrame, k: Int,
              dim: Int, bits: Int = 8, tables: Int = 8, seed: Long = 42L): DataFrame = {
    val planes = hyperplanes(dim, bits, tables, seed)
    def bucketed(df: DataFrame, idAs: String, vAs: String): DataFrame = {
      val v = toDouble(col("embedding"))
      df.select(col("vec_id").as(idAs), v.as(vAs),
          posexplode(graft.functions.VectorExprs.hyperplaneSigs(v, planes)).as(Seq("__t", "__b")))
    }
    val q = broadcast(bucketed(queries, "query_id", "__qv"))
    val c = bucketed(corpus, "neighbor_id", "__cv")
    val w = Window.partitionBy(col("query_id")).orderBy(col("sim").desc, col("neighbor_id").asc)
    q.as("q").join(c.as("c"),
        col("q.__t") === col("c.__t") && col("q.__b") === col("c.__b")
          && col("q.query_id") =!= col("c.neighbor_id"))
      .select(col("q.query_id"), col("c.neighbor_id"), col("q.__qv").as("__qv"), col("c.__cv").as("__cv"))
      .distinct()
      .withColumn("sim", cosine(col("__qv"), col("__cv")))
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= k)
      .select(col("query_id"), col("rk"), col("neighbor_id"), col("sim"))
  }

  /** Exact cosine near-duplicate pairs (sim ≥ threshold) among all rows —
    * brute force within blocks for verification; LSH at scale. */
  def cosineNearDups(df: DataFrame, threshold: Double): DataFrame = {
    val p = df.select(col("vec_id").as("__id"), toDouble(col("embedding")).as("__v"))
    p.as("a").join(p.as("b"), col("a.__id") < col("b.__id"))
      .withColumn("sim", cosine(col("a.__v"), col("b.__v")))
      .filter(col("sim") >= threshold)
      .select(col("a.__id").as("id_a"), col("b.__id").as("id_b"), col("sim"))
  }
}
