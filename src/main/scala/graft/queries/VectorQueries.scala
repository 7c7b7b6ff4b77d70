package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import Q.table

/** Similarity search over the `embeddings` table (builder prompt: brute-force
  * cosine top-k baseline + LSH-bucketed scale path; embedding near-dup).
  *
  * Determinism protocol: float components are widened to double and QUANTIZED
  * (`floor(x*1000)` as BIGINT) before any arithmetic, so dot products and
  * norms are exact integer sums — no float-summation-order hazard between
  * Spark and DuckDB. Cosines are then single IEEE double ops on identical
  * integers → bit-identical. */
object VectorQueries {

  /** quantized embedding as array<bigint> */
  private def quantized(s: SparkSession, dir: String): DataFrame =
    table(s, dir, "embeddings").select(col("vec_id"), col("label"),
      expr("transform(cast(embedding as array<double>), x -> cast(floor(x * 1000) as bigint))")
        .as("q"))

  private val QUANT_SQL =
    """q AS (
      |  SELECT vec_id, label,
      |    list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS q
      |  FROM embeddings
      |)""".stripMargin

  private def dotCol(a: String, b: String) =
    expr(s"aggregate(zip_with($a, $b, (x, y) -> x * y), 0L, (acc, v) -> acc + v)")

  val all: Seq[Q] = Seq(

    // quantized L2 norm per vector (the shared building block)
    Q("emb_norm",
      s"""WITH $QUANT_SQL
         | SELECT vec_id, SUM(x * x) AS norm2
         | FROM (SELECT vec_id, unnest(q) AS x FROM q) t GROUP BY vec_id""".stripMargin)(
      (s, dir) => quantized(s, dir).select(col("vec_id"),
        dotCol("q", "q").as("norm2"))),

    // per-label centroid accumulator (posexplode → per-dimension sums)
    Q("emb_centroid",
      s"""WITH $QUANT_SQL,
         | e AS (SELECT label, CAST(generate_subscripts(q, 1) AS BIGINT) AS pos,
         |        unnest(q) AS x FROM q)
         | SELECT label, pos, SUM(x) AS s FROM e GROUP BY label, pos""".stripMargin)(
      (s, dir) => quantized(s, dir)
        .select(col("label"), posexplode(col("q")).as(Seq("pos0", "x")))
        .groupBy(col("label"), (col("pos0") + 1).cast("long").as("pos"))
        .agg(sum("x").as("s"))),

    // brute-force cosine top-k: queries vec_id < 10, k = 5
    Q("ann_topk_bruteforce",
      s"""WITH $QUANT_SQL,
         | pairs AS (
         |  SELECT a.vec_id AS qid, b.vec_id AS vec_id,
         |    SUM(x * y) AS dot
         |  FROM (SELECT vec_id, unnest(q) AS x,
         |          CAST(generate_subscripts(q, 1) AS BIGINT) AS i FROM q
         |        WHERE vec_id < 10) a
         |  JOIN (SELECT vec_id, unnest(q) AS y,
         |          CAST(generate_subscripts(q, 1) AS BIGINT) AS i FROM q
         |        WHERE vec_id >= 10) b ON a.i = b.i
         |  GROUP BY 1, 2),
         | norms AS (SELECT vec_id, SUM(x * x) AS n2
         |   FROM (SELECT vec_id, unnest(q) AS x FROM q) t GROUP BY vec_id)
         | SELECT qid, vec_id, rank, cosine FROM (
         |  SELECT qid, p.vec_id,
         |    CAST(dot AS DOUBLE) / (sqrt(CAST(na.n2 AS DOUBLE)) * sqrt(CAST(nb.n2 AS DOUBLE))) AS cosine,
         |    CAST(row_number() OVER (PARTITION BY qid ORDER BY
         |      CAST(dot AS DOUBLE) / (sqrt(CAST(na.n2 AS DOUBLE)) * sqrt(CAST(nb.n2 AS DOUBLE))) DESC,
         |      p.vec_id) AS BIGINT) AS rank
         |  FROM pairs p JOIN norms na ON na.vec_id = p.qid
         |    JOIN norms nb ON nb.vec_id = p.vec_id) t
         | WHERE rank <= 5""".stripMargin)(
      (s, dir) => {
        val q = quantized(s, dir)
        val queries = q.filter(col("vec_id") < 10)
          .select(col("vec_id").as("qid"), col("q").as("qa"))
        val cands = q.filter(col("vec_id") >= 10)
          .select(col("vec_id"), col("q").as("qb"))
        val norms = quantized(s, dir).select(col("vec_id").as("nid"),
          dotCol("q", "q").as("n2"))
        val pairs = broadcast(queries).crossJoin(cands)
          .withColumn("dot", dotCol("qa", "qb"))
          .join(norms.withColumnRenamed("nid", "qid").withColumnRenamed("n2", "na2"), "qid")
          .join(norms.withColumnRenamed("nid", "vec_id").withColumnRenamed("n2", "nb2"), "vec_id")
          .withColumn("cosine", col("dot").cast("double") /
            (sqrt(col("na2").cast("double")) * sqrt(col("nb2").cast("double"))))
        pairs.withColumn("rank", row_number().over(
            Window.partitionBy("qid").orderBy(col("cosine").desc, col("vec_id"))).cast("long"))
          .filter(col("rank") <= 5)
          .select("qid", "vec_id", "rank", "cosine")
      }),

    // LSH bucketing: sign bits of the first 8 dims (the scale path: cosine
    // search only within buckets → bounded candidate sets)
    Q("ann_lsh_buckets",
      { val bits = (1 to 8).map(i =>
          s"CASE WHEN embedding[$i] >= 0 THEN '1' ELSE '0' END").mkString(" || ")
        s"SELECT vec_id, $bits AS bucket FROM embeddings" })(
      (s, dir) => {
        val bits = (1 to 8).map(i =>
          when(element_at(col("embedding"), i) >= 0, "1").otherwise("0"))
        table(s, dir, "embeddings").select(col("vec_id"), concat(bits: _*).as("bucket"))
      }),

    // near-dup by embedding cosine within LSH bucket (threshold 0.5)
    Q("emb_neardup",
      { val bits = (1 to 8).map(i =>
          s"CASE WHEN embedding[$i] >= 0 THEN '1' ELSE '0' END").mkString(" || ")
        s"""WITH b AS (
           |  SELECT vec_id, $bits AS bucket,
           |    list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS q
           |  FROM embeddings),
           | pairs AS (
           |  SELECT a.vec_id AS id_a, b2.vec_id AS id_b, a.bucket,
           |    (SELECT SUM(x * y) FROM (SELECT unnest(a.q) AS x, unnest(b2.q) AS y) z) AS dot,
           |    (SELECT SUM(x * x) FROM (SELECT unnest(a.q) AS x) z) AS na2,
           |    (SELECT SUM(y * y) FROM (SELECT unnest(b2.q) AS y) z) AS nb2
           |  FROM b a JOIN b b2 ON a.bucket = b2.bucket AND a.vec_id < b2.vec_id)
           | SELECT id_a, id_b,
           |   CAST(dot AS DOUBLE) / (sqrt(CAST(na2 AS DOUBLE)) * sqrt(CAST(nb2 AS DOUBLE))) AS cosine
           | FROM pairs
           | WHERE CAST(dot AS DOUBLE) / (sqrt(CAST(na2 AS DOUBLE)) * sqrt(CAST(nb2 AS DOUBLE))) >= 0.5""".stripMargin })(
      (s, dir) => {
        val bits = (1 to 8).map(i =>
          when(element_at(col("embedding"), i) >= 0, "1").otherwise("0"))
        val b = table(s, dir, "embeddings").select(col("vec_id"),
          concat(bits: _*).as("bucket"),
          expr("transform(cast(embedding as array<double>), x -> cast(floor(x * 1000) as bigint))")
            .as("q"))
        val a2 = b.select(col("vec_id").as("id_a"), col("bucket"), col("q").as("qa"))
        val b2 = b.select(col("vec_id").as("id_b"), col("bucket").as("bucket_b"),
          col("q").as("qb"))
        a2.join(b2, col("bucket") === col("bucket_b") && col("id_a") < col("id_b"))
          .withColumn("dot", dotCol("qa", "qb"))
          .withColumn("na2", dotCol("qa", "qa"))
          .withColumn("nb2", dotCol("qb", "qb"))
          .withColumn("cosine", col("dot").cast("double") /
            (sqrt(col("na2").cast("double")) * sqrt(col("nb2").cast("double"))))
          .filter(col("cosine") >= 0.5)
          .select("id_a", "id_b", "cosine")
      })
  )
}
