package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Approximate-nearest-neighbor search over an embedding column (array<float>).
 * Brute-force cosine is the exact baseline (one scan, no shuffle until top-k);
 * the LSH-bucketed variant is the 10^12-row scale path (bucket prune, then exact
 * rerank inside candidate buckets only).
 */
object Similarity {

  /** dot(a, b) via zip_with + aggregate — stays inside Catalyst, no UDF. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0d), (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = {
    val d = norm(a) * norm(b)
    when(d === 0.0, lit(0.0)).otherwise(dot(a, b) / d)
  }

  /**
   * Deterministic pseudo-random hyperplane component for (plane p, dim i):
   * a fixed hash mapped to [-1, 1). Pure function — every executor derives the same
   * planes with no broadcast state.
   */
  private def planeComponent(p: Column, i: Column): Column =
    (xxhash64(p, i).cast("double") / lit(Long.MaxValue.toDouble))

  /** Sign-LSH bucket id from `planes` hyperplanes (bit p = sign of dot(v, plane_p)). */
  def lshBucket(vec: Column, planes: Int): Column =
    (0 until planes).map { p =>
      val s = aggregate(
        zip_with(vec, sequence(lit(0), size(vec) - 1), (x, i) => x * planeComponent(lit(p), i)),
        lit(0.0d), (acc, v) => acc + v)
      when(s > 0.0, lit(1L << p)).otherwise(lit(0L))
    }.reduce(_ bitwiseOR _)

  /**
   * Exact brute-force top-k by cosine against one query vector.
   * Scan + narrow projection; the only exchange is the final global top-k
   * (`orderBy.limit`, which Spark executes as per-partition top-k + merge).
   */
  def bruteForceTopK(df: DataFrame, idCol: String, vecCol: String,
                     query: Array[Float], k: Int): DataFrame = {
    val q = typedLit(query.map(_.toDouble))
    val vecD = transform(col(vecCol), x => x.cast("double"))
    df.select(col(idCol), cosine(vecD, q).as("cosine"))
      .orderBy(desc("cosine"), col(idCol))
      .limit(k)
  }

  /**
   * ANN top-k: probe the query's LSH bucket (plus all buckets within Hamming 1 for
   * recall), exact cosine rerank inside candidates only. At 10^12 rows the bucketed
   * table is the precomputed index (written once, reused per query batch).
   */
  def annTopK(df: DataFrame, idCol: String, vecCol: String,
              query: Array[Float], k: Int, planes: Int = 8): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val indexed = df.withColumn("bucket", lshBucket(transform(col(vecCol), _.cast("double")), planes))
    val qDf = spark.range(1).select(typedLit(query.map(_.toDouble)).as("qv"))
      .withColumn("bucket", lshBucket($"qv", planes))
    val qBucket = qDf.select($"bucket").as[Long].head()
    val probe = qBucket +: (0 until planes).map(p => qBucket ^ (1L << p))
    val q = typedLit(query.map(_.toDouble))
    indexed.where($"bucket".isin(probe: _*))
      .select(col(idCol), cosine(transform(col(vecCol), _.cast("double")), q).as("cosine"))
      .orderBy(desc("cosine"), col(idCol))
      .limit(k)
  }
}
