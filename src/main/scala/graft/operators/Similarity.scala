package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * `bruteTopK` is the exact baseline: broadcast the (small) query set
  * against the corpus, one window per query for top-k — the corpus is
  * never shuffled by pair. `lshTopK` is the scale path: random-
  * hyperplane signatures bucket the corpus so each query only scores
  * its own bucket's candidates; recall vs the exact baseline is
  * spec-tested.
  */
object Similarity {

  /** Deterministic pseudo-random hyperplane component: a value in
    * [-0.5, 0.5) derived from md5(plane:dim) — reproducible across
    * runs and engines, no RNG state.
    */
  private def planeComponent(plane: Column, dim: Column): Column =
    (Dedup.md5Hash60(concat(lit("plane-"), plane.cast("string")), dim.cast("string"))
      .cast("double") / lit((1L << 60).toDouble)) - lit(0.5)

  /** Sign-bit signature of a vector against `numPlanes` hyperplanes,
    * packed into a long. Pure expression — computed in the scan.
    */
  def hyperplaneSignature(vec: Column, numPlanes: Int): Column =
    (0 until numPlanes).map { p =>
      val dotP = aggregate(
        zip_with(vec,
          transform(sequence(lit(0), size(vec) - 1),
            d => planeComponent(lit(p), d)),
          (x, h) => x.cast("double") * h),
        lit(0.0), (acc, v) => acc + v)
      when(dotP >= 0, lit(1L)).otherwise(lit(0L)) * lit(1L << p)
    }.reduce(_ + _)

  /** s1 — exact brute-force cosine top-k. `queries` is expected to be
    * small (broadcast); the corpus side streams through one scan and a
    * per-query top-k window. At 100 TB the corpus never shuffles: the
    * broadcast-nested-loop scores in the scan and the window reduces
    * k·|queries| rows.
    */
  def bruteTopK(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val q = queries.select(col("vec_id").as("query_id"),
      col("embedding").as("qv"),
      sqrt(Dedup.dot(col("embedding"), col("embedding"))).as("qn"))
    val c = corpus.select(col("vec_id").as("neighbor_id"),
      col("embedding").as("cv"),
      sqrt(Dedup.dot(col("embedding"), col("embedding"))).as("cn"))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("cos",
        Dedup.cosineWithNorms(col("qv"), col("cv"), col("qn"), col("cn")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    scored
      .withColumn("rank", row_number().over(w).cast("bigint"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"),
        round(col("cos"), 6).as("cos"), col("rank"))
  }

  /** s2 — LSH-bucketed ANN: corpus and queries are both signed against
    * the same hyperplanes; each query scores only candidates sharing
    * its bucket. Recall is tunable via numPlanes (fewer planes → bigger
    * buckets → higher recall, more work). Multi-probe (hamming-1
    * neighbors of the query signature) lifts recall without growing
    * buckets.
    */
  def lshTopK(
      corpus: DataFrame,
      queries: DataFrame,
      k: Int,
      numPlanes: Int = 8): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val c = corpus.select(col("vec_id").as("neighbor_id"),
      col("embedding").as("cv"),
      sqrt(Dedup.dot(col("embedding"), col("embedding"))).as("cn"),
      hyperplaneSignature(col("embedding"), numPlanes).as("bucket"))
    // multi-probe: query probes its own bucket plus all hamming-1 buckets
    val q = queries.select(col("vec_id").as("query_id"),
      col("embedding").as("qv"),
      sqrt(Dedup.dot(col("embedding"), col("embedding"))).as("qn"),
      hyperplaneSignature(col("embedding"), numPlanes).as("sig"))
      .select(col("query_id"), col("qv"), col("qn"),
        explode(concat(array(col("sig")),
          transform(sequence(lit(0), lit(numPlanes - 1)),
            p => Similarity.flipBit(col("sig"), p)))).as("bucket"))
    val scored = c.join(broadcast(q), Seq("bucket"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("cos",
        Dedup.cosineWithNorms(col("qv"), col("cv"), col("qn"), col("cn")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    scored
      .select(col("query_id"), col("neighbor_id"), col("cos")).distinct()
      .withColumn("rank", row_number().over(w).cast("bigint"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"),
        round(col("cos"), 6).as("cos"), col("rank"))
  }

  /** sig with bit `bit` flipped; 2^bit via pow (exact for bit < 53). */
  private[operators] def flipBit(sig: Column, bit: Column): Column =
    sig.bitwiseXOR(pow(lit(2.0), bit).cast("long"))

  /** Centroid builder for IVF: elementwise mean per partition key (a
    * batch job, like training a coarse quantizer). posexplode →
    * per-(key, dim) mean → re-assemble ordered arrays.
    */
  def centroids(embeddings: DataFrame, key: Column): DataFrame =
    embeddings
      .select(key.as("list_id"), posexplode(col("embedding")))
      .groupBy(col("list_id"), col("pos"))
      .agg(avg(col("col")).as("m"))
      .groupBy(col("list_id"))
      .agg(transform(array_sort(collect_list(struct(col("pos"), col("m")))),
        e => e.getField("m")).as("centroid"))

  /** s3 — IVF ANN: corpus vectors assign to their nearest centroid
    * (one scan against the broadcast centroid table — the inverted
    * lists); each query probes the `nProbe` nearest lists and scores
    * only those lists' members. The 100 TB shape: the corpus is
    * range-free — no global structure beyond the list id, assignment
    * and search are both broadcast joins + one top-k window.
    */
  def ivfTopK(
      corpus: DataFrame,
      queries: DataFrame,
      cents: DataFrame,
      k: Int,
      nProbe: Int = 2): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    def best(df: DataFrame, idCol: String, keep: Int): DataFrame = {
      val w = Window.partitionBy(col(idCol))
        .orderBy(col("d").desc, col("list_id").asc)
      df.crossJoin(broadcast(cents))
        .withColumn("d", Dedup.cosine(col("embedding"), col("centroid")))
        .withColumn("r", row_number().over(w))
        .filter(col("r") <= keep)
        .drop("centroid", "d", "r")
    }
    val assigned = best(
      corpus.select(col("vec_id").as("neighbor_id"), col("embedding")),
      "neighbor_id", 1)
      .select(col("list_id"), col("neighbor_id"),
        col("embedding").as("cv"),
        sqrt(Dedup.dot(col("embedding"), col("embedding"))).as("cn"))
    val probes = best(
      queries.select(col("vec_id").as("query_id"), col("embedding")),
      "query_id", nProbe)
      .select(col("list_id"), col("query_id"),
        col("embedding").as("qv"),
        sqrt(Dedup.dot(col("embedding"), col("embedding"))).as("qn"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    assigned.join(broadcast(probes), Seq("list_id"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("cos",
        Dedup.cosineWithNorms(col("qv"), col("cv"), col("qn"), col("cn")))
      .select(col("query_id"), col("neighbor_id"), col("cos")).distinct()
      .withColumn("rank", row_number().over(w).cast("bigint"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"),
        round(col("cos"), 6).as("cos"), col("rank"))
  }
}
