package graft.sim

import graft.sketch.Murmur3x64
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Approximate nearest neighbor search over an embedding column.
  *
  * Engine-new (training-data pipeline requirement): brute-force cosine
  * top-k as the exactness baseline (see SparkEntry q_ann_bruteforce — a
  * broadcast cross join scored inside codegen), and a random-hyperplane
  * LSH variant as the scale path: sign-bit signatures bucket the vectors,
  * candidates come from an equi-join on (table, bucket) — at 10^12 rows
  * that join is shuffle-partitioned by bucket instead of comparing all
  * pairs, and table count / plane count trade recall for cost.
  */
object Ann {

  /** Deterministic ±1 hyperplane component for (table, plane, dim). */
  @inline private def planeSign(table: Int, plane: Int, dim: Int): Double = {
    val h = Murmur3x64.mix64((table.toLong << 40) ^ (plane.toLong << 20) ^ dim.toLong ^ 0x5EEDL)
    if ((h & 1L) == 0L) 1.0 else -1.0
  }

  /** Pack sign bits of `planes` random projections into one bucket int. */
  private def sigBits(v: Seq[Float], table: Int, planes: Int): Int = {
    var bits = 0
    var p = 0
    while (p < planes) {
      var dot = 0.0
      var d = 0
      while (d < v.length) { dot += v(d) * planeSign(table, p, d); d += 1 }
      if (dot > 0) bits |= (1 << p)
      p += 1
    }
    bits
  }

  /** Top-k neighbors of query vectors (vec_id < 3, mirroring the brute
    * force baseline) from LSH buckets, exact-cosine reranked. */
  def lshTopK(spark: SparkSession, emb: DataFrame, kNeighbors: Int, planes: Int, tables: Int): DataFrame = {
    val sig = udf((v: Seq[Float], t: Int) => sigBits(v, t, planes))
    val tablesCol = explode(sequence(lit(0), lit(tables - 1))).as("t")
    val bucketed = emb.select(col("vec_id"), col("embedding"), tablesCol)
      .withColumn("bucket", sig(col("embedding"), col("t")))
    val qb = bucketed.where(col("vec_id") < 3)
      .select(col("t"), col("bucket"), col("vec_id").as("qid"), col("embedding").as("qv"))
    val cands = bucketed.join(qb, Seq("t", "bucket"))
      .where(col("vec_id") =!= col("qid"))
      .select(col("qid"), col("qv"), col("vec_id"), col("embedding"))
      .distinct()
    val dot = expr("aggregate(zip_with(embedding, qv, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), CAST(0 AS DOUBLE), (acc, v) -> acc + v)")
    val na = expr("sqrt(aggregate(embedding, CAST(0 AS DOUBLE), (acc, v) -> acc + CAST(v AS DOUBLE) * CAST(v AS DOUBLE)))")
    val nb = expr("sqrt(aggregate(qv, CAST(0 AS DOUBLE), (acc, v) -> acc + CAST(v AS DOUBLE) * CAST(v AS DOUBLE)))")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("qid")).orderBy(desc("cos"), col("vec_id"))
    cands.withColumn("cos", round(dot / (na * nb), 6))
      .withColumn("rk", row_number().over(w))
      .where(col("rk") <= kNeighbors)
      .select(col("qid"), col("vec_id"), col("cos"), col("rk"))
  }
}
