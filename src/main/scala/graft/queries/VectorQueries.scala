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

  // ---- random-hyperplane LSH (the scale path, VERDICT r1 item 7) --------
  // The fixed-first-8-dims sign bucketing of ann_lsh_buckets caps at 256
  // buckets; real recall/scale needs b bands × r seeded random hyperplanes.
  // Hyperplane components are DETERMINISTIC ±1 draws from an integer LCG on
  // (plane, dim) — exact in both engines, no float RNG:
  //   bit(p,d) = ((1103515245*(p*4096+d) + 12345) mod 2^31) div 2^15 mod 2
  //   s(p,d)   = +1 if bit = 0 else -1
  val HP_BANDS = 4
  val HP_BITS = 4 // r bits per band → 16 planes

  private def hpSignSql(p: Int): String =
    s"(CASE WHEN ((1103515245::BIGINT * (${p * 4096} + pos) + 12345) % 2147483648) // 32768 % 2 = 0 THEN 1 ELSE -1 END)"

  /** (vec_id, s0..s15) plane projections over the quantized embedding. */
  private def hpProjections(s: SparkSession, dir: String): DataFrame = {
    val e = quantized(s, dir)
      .select(col("vec_id"), posexplode(col("q")).as(Seq("pos0", "x")))
      .select(col("vec_id"), (col("pos0") + 1).cast("long").as("pos"), col("x"))
    val sums = (0 until HP_BANDS * HP_BITS).map { p =>
      val bit = expr(s"((1103515245L * (${p * 4096} + pos) + 12345) % 2147483648) div 32768 % 2")
      sum(col("x") * when(bit === 0, 1).otherwise(-1)).as(s"s$p")
    }
    e.groupBy("vec_id").agg(sums.head, sums.tail: _*)
  }

  private val HP_PROJ_SQL: String = {
    val sums = (0 until HP_BANDS * HP_BITS).map { p =>
      s"SUM(x * ${hpSignSql(p)}) AS s$p"
    }.mkString(",\n      ")
    s"""e AS (SELECT vec_id, CAST(generate_subscripts(q, 1) AS BIGINT) AS pos,
       |       unnest(q) AS x FROM q),
       | proj AS (SELECT vec_id, $sums FROM e GROUP BY vec_id)""".stripMargin
  }

  /** one row per (vec_id, band) with the band's r-bit bucket string */
  private def hpBuckets(s: SparkSession, dir: String): DataFrame = {
    val proj = hpProjections(s, dir)
    val bandStructs = (0 until HP_BANDS).map { b =>
      val bits = (0 until HP_BITS).map(i =>
        when(col(s"s${b * HP_BITS + i}") >= 0, "1").otherwise("0"))
      struct(lit(b).as("band"), concat(bits: _*).as("bucket"))
    }
    proj.select(col("vec_id"), explode(array(bandStructs: _*)).as("bb"))
      .select(col("vec_id"), col("bb.band").as("band"), col("bb.bucket").as("bucket"))
  }

  private val HP_BUCKETS_SQL: String = {
    val bands = (0 until HP_BANDS).map { b =>
      val bits = (0 until HP_BITS).map(i =>
        s"(CASE WHEN s${b * HP_BITS + i} >= 0 THEN '1' ELSE '0' END)").mkString(" || ")
      s"SELECT vec_id, CAST($b AS INTEGER) AS band, $bits AS bucket FROM proj"
    }.mkString("\n  UNION ALL ")
    s"buckets AS (\n  $bands\n)"
  }

  val all: Seq[Q] = Seq(

    // quantized L2 norm per vector (the shared building block)
    Q("emb_norm",
      // CAST: DuckDB widens SUM(BIGINT) to HUGEINT (serialized as float64);
      // Spark emits LONG — cast so both engines hash int64 (VERDICT r1 fix)
      s"""WITH $QUANT_SQL
         | SELECT vec_id, CAST(SUM(x * x) AS BIGINT) AS norm2
         | FROM (SELECT vec_id, unnest(q) AS x FROM q) t GROUP BY vec_id""".stripMargin)(
      (s, dir) => quantized(s, dir).select(col("vec_id"),
        dotCol("q", "q").as("norm2"))),

    // per-label centroid accumulator (posexplode → per-dimension sums)
    Q("emb_centroid",
      s"""WITH $QUANT_SQL,
         | e AS (SELECT label, CAST(generate_subscripts(q, 1) AS BIGINT) AS pos,
         |        unnest(q) AS x FROM q)
         | SELECT label, pos, CAST(SUM(x) AS BIGINT) AS s FROM e GROUP BY label, pos""".stripMargin)(
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
      }),

    // random-hyperplane LSH buckets: b bands × r seeded-projection sign bits
    // (the scale replacement for ann_lsh_buckets' fixed-dim signs)
    Q("ann_lsh_hyperplane",
      s"""WITH $QUANT_SQL,
         | $HP_PROJ_SQL,
         | $HP_BUCKETS_SQL
         | SELECT vec_id, band, bucket FROM buckets""".stripMargin)(
      (s, dir) => hpBuckets(s, dir)),

    // near-dup via hyperplane LSH with a PER-BUCKET CANDIDATE CAP: within a
    // (band, bucket) only the first 16 vectors (by vec_id) pair up, so a hot
    // bucket can never go quadratic at scale; pairs found by several bands
    // dedup; exact cosine (quantized ints) confirms
    Q("emb_neardup_hp",
      s"""WITH $QUANT_SQL,
         | $HP_PROJ_SQL,
         | $HP_BUCKETS_SQL,
         | capped AS (
         |  SELECT vec_id, band, bucket,
         |    row_number() OVER (PARTITION BY band, bucket ORDER BY vec_id) AS rn
         |  FROM buckets),
         | pairs AS (
         |  SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
         |  FROM capped a JOIN capped b ON a.band = b.band AND a.bucket = b.bucket
         |    AND a.vec_id < b.vec_id AND a.rn <= 16 AND b.rn <= 16),
         | j AS (
         |  SELECT p.id_a, p.id_b,
         |   (SELECT SUM(x * y) FROM (SELECT unnest(qa.q) AS x, unnest(qb.q) AS y) z) AS dot,
         |   (SELECT SUM(x * x) FROM (SELECT unnest(qa.q) AS x) z) AS na2,
         |   (SELECT SUM(y * y) FROM (SELECT unnest(qb.q) AS y) z) AS nb2
         |  FROM pairs p JOIN q qa ON qa.vec_id = p.id_a JOIN q qb ON qb.vec_id = p.id_b)
         | SELECT id_a, id_b,
         |   CAST(dot AS DOUBLE) / (sqrt(CAST(na2 AS DOUBLE)) * sqrt(CAST(nb2 AS DOUBLE))) AS cosine
         | FROM j
         | WHERE CAST(dot AS DOUBLE) / (sqrt(CAST(na2 AS DOUBLE)) * sqrt(CAST(nb2 AS DOUBLE))) >= 0.5""".stripMargin)(
      (s, dir) => {
        // the window caps on NARROW (vec_id, band, bucket) rows, then ONE
        // vec_id join attaches the quantized vector to the capped survivors
        // so pairs score in place: no post-pair re-joins of the embeddings
        // table (two shuffle joins keyed by pair ids), no DISTINCT over
        // unscored pairs. Cross-band dedup happens on the (bounded,
        // cap²/2-per-bucket) scored pairs; cosine is a pure pair function
        // so min == the value.
        val capped = hpBuckets(s, dir)
          .withColumn("rn", row_number().over(
            Window.partitionBy("band", "bucket").orderBy("vec_id")))
          .filter(col("rn") <= 16)
          .join(quantized(s, dir).select(col("vec_id"), col("q")), "vec_id")
        val a = capped.select(col("vec_id").as("id_a"), col("band"),
          col("bucket"), col("q").as("qa"))
        val b = capped.select(col("vec_id").as("id_b"), col("band").as("band_b"),
          col("bucket").as("bucket_b"), col("q").as("qb"))
        a.join(b, col("band") === col("band_b") &&
            col("bucket") === col("bucket_b") && col("id_a") < col("id_b"))
          .withColumn("dot", dotCol("qa", "qb"))
          .withColumn("na2", dotCol("qa", "qa"))
          .withColumn("nb2", dotCol("qb", "qb"))
          .withColumn("cosine", col("dot").cast("double") /
            (sqrt(col("na2").cast("double")) * sqrt(col("nb2").cast("double"))))
          .filter(col("cosine") >= 0.5)
          .groupBy("id_a", "id_b").agg(min("cosine").as("cosine"))
      })
  )
}
