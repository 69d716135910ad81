package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{DoubleMetaphone, DoubleMetaphoneExpression, MetaphoneExpression, Phonetics}

/** Specs for the phonetic/normalization functions, including the
  * native Catalyst metaphone expression (codegen path + SQL
  * registration).
  */
class FunctionsSpec extends AnyFunSuite {
  import SparkTestSession._

  test("fingerprint matches the reference test vector") {
    // /root/reference/tests/test_store.py:55
    import spark.implicits._
    val out = Seq("Tchibo Holding AG").toDF("name")
      .select(Phonetics.fingerprint(col("name"))).collect()(0).getString(0)
    assert(out == "ag holding tchibo")
  }

  test("native fingerprint/fpx-tokens == composed forms on real values") {
    // the native one-pass forms must be value-identical to the
    // composed HOF twins on every real name, and on unicode/edge
    // inputs (accents are separators under [^a-z0-9]+, like the regex)
    import spark.implicits._
    val names = Tables.load(spark, sf, "part").select(col("p_name"))
      .union(Seq("Tchibo Holding AG", "  Ünïcode  Nämé 123  ", "", "  ",
        "ONE-token", "sevenchars x", "a b c a b").toDF("p_name"))
    val diff = names.select(
      Phonetics.fingerprint(col("p_name")).as("nfp"),
      Phonetics.fingerprintComposed(col("p_name")).as("cfp"))
      .withColumn("nt", Phonetics.fpxTokens(col("nfp")))
      .withColumn("ct", Phonetics.fpxTokensComposed(col("cfp")))
      .filter(col("nfp") =!= col("cfp") || col("nt") =!= col("ct"))
    assert(diff.count() == 0)
    // the SQL function accepts ARBITRARY strings, not just (ASCII)
    // fingerprints: the >5 length test must count CHARACTERS — "münch"
    // is 5 chars but 6 UTF-8 bytes and must be excluded, like the
    // composed twin's length(t) > 5
    val raw = Seq("münch berlin x", "朝日新聞社デジタル x y")
      .toDF("s")
    val rawDiff = raw.select(
      Phonetics.fpxTokens(col("s")).as("nt"),
      Phonetics.fpxTokensComposed(col("s")).as("ct"))
      .filter(col("nt") =!= col("ct"))
    assert(rawDiff.count() == 0)
  }

  test("soundex tokens: classic examples") {
    import spark.implicits._
    val out = Seq("robert rupert ashcraft").toDF("fp")
      .select(Phonetics.soundexTokens(col("fp"))).collect()(0)
      .getSeq[String](0)
    assert(out == Seq("R163", "R163", "A261")) // Spark soundex variant
  }

  test("metaphone scala impl: deterministic canonical vectors") {
    // classic-metaphone rules as implemented: TH→0, initial KN→N,
    // CH→X, initial X→S
    assert(Phonetics.metaphone("thompson") == "0MPSN")
    assert(Phonetics.metaphone("knight") == "NT")
    assert(Phonetics.metaphone("school") == "SXL")
    assert(Phonetics.metaphone("xavier") == "SFR")
    assert(Phonetics.metaphone("") == "")
  }

  test("native expression == UDF on real part names (codegen path)") {
    import spark.implicits._
    // test-scoped UDF twin of the imperative reference implementation
    // (the query path is the codegen'd expression; no UDF in main source)
    val metaphoneUdf = udf((s: String) =>
      if (s == null) null else Phonetics.metaphone(s))
    val toks = Tables.load(spark, sf, "part")
      .select(explode(split(Phonetics.fingerprint(col("p_name")), " "))
        .as("tok"))
    val diff = toks
      .select(col("tok"),
        MetaphoneExpression.metaphone(col("tok")).as("native"),
        metaphoneUdf(col("tok")).as("viaUdf"))
      .filter(col("native") =!= col("viaUdf"))
    assert(diff.count() == 0)
  }

  test("double metaphone: published algorithm vectors (primary, secondary)") {
    // canonical examples from Philips' published algorithm; secondary is
    // "" when identical to the primary (the reference package's contract)
    val vectors = Seq(
      "smith" -> ("SM0", "XMT"),
      "schmidt" -> ("XMT", "SMT"),
      "snider" -> ("SNTR", "XNTR"),
      "school" -> ("SKL", ""),
      "knight" -> ("NT", ""),
      "gnome" -> ("NM", ""),
      "wright" -> ("RT", ""),
      "jose" -> ("HS", ""),
      "cambrillo" -> ("KMPRL", "KMPR"), // full-length codes, no 4-char cap
      "otto" -> ("AT", ""),
      "aubrey" -> ("APR", ""),
      "maurice" -> ("MRS", ""),
      "katherine" -> ("K0RN", "KTRN"),
      "richard" -> ("RXRT", "RKRT"),
      "xavier" -> ("SF", "SFR"),
      "" -> ("", ""),
      "123" -> ("", ""))
    for ((in, expected) <- vectors)
      assert(DoubleMetaphone.encode(in) == expected, s"input: '$in'")
    // case-insensitive
    assert(DoubleMetaphone.encode("SMITH") == DoubleMetaphone.encode("smith"))
  }

  test("native double-metaphone expression == scala encoder; SQL + nulls") {
    import spark.implicits._
    val toks = Tables.load(spark, sf, "part")
      .select(explode(split(Phonetics.fingerprint(col("p_name")), " "))
        .as("tok"))
    val viaUdf = udf((s: String) => {
      val (p, sec) = DoubleMetaphone.encode(s); Seq(p, sec)
    })
    val diff = toks
      .select(col("tok"),
        DoubleMetaphoneExpression.doubleMetaphone(col("tok")).as("native"),
        viaUdf(col("tok")).as("viaScala"))
      .filter(to_json(col("native")) =!= to_json(col("viaScala")))
    assert(diff.count() == 0)
    val n = Seq(Option.empty[String]).toDF("s")
      .select(DoubleMetaphoneExpression.doubleMetaphone(col("s"))).collect()(0)
    assert(n.isNullAt(0))
    DoubleMetaphoneExpression.register(spark)
    val viaSql = spark.sql("SELECT graft_double_metaphone('smith')").collect()(0)
    assert(viaSql.getSeq[String](0) == Seq("SM0", "XMT"))
  }

  test("sorted_contains == array_contains on sorted doc hashes") {
    import graft.functions.SortedContainsExpression.sortedContains
    import graft.operators.Dedup.{md5Hash60, words}
    // every doc's every token hash probed against every other doc's
    // sorted hash array — member and non-member cases both abound
    val hs = Tables.load(spark, sf, "documents")
      .select(col("doc_id"),
        array_sort(transform(array_distinct(words(col("text"))),
          w => md5Hash60(lit(0), w))).as("hs"))
      .filter(col("doc_id") < 20)
    val probes = hs.select(explode(col("hs")).as("v"))
      .crossJoin(hs.select(col("hs")))
    val diff = probes.select(
        sortedContains(col("v"), col("hs")).as("native"),
        array_contains(col("hs"), col("v")).as("builtin"))
      .filter(col("native") =!= col("builtin"))
    assert(diff.count() == 0)
    import spark.implicits._
    val edge = Seq((5L, Seq.empty[Long]), (5L, Seq(5L)), (4L, Seq(5L)),
      (6L, Seq(5L)), (5L, Seq(1L, 5L, 9L)), (0L, Seq(1L, 5L, 9L)),
      (10L, Seq(1L, 5L, 9L)))
      .toDF("v", "hs")
      .select(col("v"), col("hs"), sortedContains(col("v"), col("hs")).as("got"))
      .collect().map(r => r.getBoolean(2)).toSeq
    assert(edge == Seq(false, true, false, false, true, false, false))
    // null elements (array_sort puts them last) are skipped, not read
    // as garbage: 0 must not "match" a null slot
    val withNulls = Seq((0L, Seq[Option[Long]](Some(1L), Some(5L), None)),
      (5L, Seq[Option[Long]](Some(1L), Some(5L), None)),
      (0L, Seq[Option[Long]](None, None)))
      .toDF("v", "hs")
      .select(sortedContains(col("v"), col("hs")).as("got"))
      .collect().map(_.getBoolean(0)).toSeq
    assert(withNulls == Seq(false, true, false))
  }

  test("sorted_intersect_size == size(array_intersect) on sorted doc hashes") {
    import graft.functions.SortedIntersectSizeExpression.sortedIntersectSize
    import graft.operators.Dedup.{md5Hash60, words}
    // real document token-hash arrays, all pairs within a small sample
    val hs = Tables.load(spark, sf, "documents")
      .select(col("doc_id"),
        array_sort(transform(array_distinct(words(col("text"))),
          w => md5Hash60(lit(0), w))).as("hs"))
      .filter(col("doc_id") < 40)
    val pairs = hs.select(col("doc_id").as("lid"), col("hs").as("a"))
      .crossJoin(hs.select(col("doc_id").as("rid"), col("hs").as("b")))
    val diff = pairs.select(
        sortedIntersectSize(col("a"), col("b")).as("native"),
        size(array_intersect(col("a"), col("b"))).cast("long").as("builtin"))
      .filter(col("native") =!= col("builtin"))
    assert(diff.count() == 0)
    // empty-side and null behavior
    import spark.implicits._
    val edge = Seq((Seq(1L, 2L), Seq.empty[Long]))
      .toDF("a", "b")
      .select(sortedIntersectSize(col("a"), col("b"))).collect()(0)
    assert(edge.getLong(0) == 0L)
    val nul = Seq((Some(Seq(1L)), Option.empty[Seq[Long]])).toDF("a", "b")
      .select(sortedIntersectSize(col("a"), col("b"))).collect()(0)
    assert(nul.isNullAt(0))
  }

  test("vec_dot == declarative zip_with fold on real embeddings") {
    import graft.operators.Dedup
    // float·float on real vectors: all pairs within a sample — bitwise
    // equality required (same fold order, same double adds)
    val e = Tables.load(spark, sf, "embeddings").filter(col("vec_id") < 40)
    val pairs = e.select(col("vec_id").as("l"), col("embedding").as("a"))
      .crossJoin(e.select(col("vec_id").as("r"), col("embedding").as("b")))
    val diffFF = pairs.select(
        Dedup.dot(col("a"), col("b")).as("native"),
        Dedup.dotExpr(col("a"), col("b")).as("twin"))
      .filter(col("native") =!= col("twin"))
    assert(diffFF.count() == 0)
    // float·double (the IVF assignment shape: embedding vs avg centroid)
    val cents = graft.operators.Similarity.centroids(e, col("vec_id") % 3)
    val diffFD = e.crossJoin(cents).select(
        Dedup.dot(col("embedding"), col("centroid")).as("native"),
        Dedup.dotExpr(col("embedding"), col("centroid")).as("twin"))
      .filter(col("native") =!= col("twin"))
    assert(diffFD.count() == 0)
    // null array propagates null
    import spark.implicits._
    val nul = Seq((Some(Seq(1f)), Option.empty[Seq[Float]])).toDF("a", "b")
      .select(Dedup.dot(col("a"), col("b"))).collect()(0)
    assert(nul.isNullAt(0))
  }

  test("tree quantizer expressions == declarative round/argmin twins, randomized") {
    // the native TreeMatrix descent must be BITWISE the declarative
    // form it replaced (typedLit centroids + Spark round + struct
    // argmin): same dot fold, same BigDecimal HALF_UP rounding, same
    // (nd, id) tie-breaks. Randomized vectors exercise the rounding on
    // thousands of arbitrary doubles — any drift in round4 flips an nd
    // bit and fails the join below.
    import graft.functions.{TreeMatrix, TreeQuantizerExpression}
    import graft.operators.Dedup
    import org.apache.spark.sql.types.IntegerType
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val dim = 16
    var nextLeaf = 100
    val leaves: Map[Long, Seq[(Any, Seq[Double], Double)]] =
      (0L to 2L).map { t =>
        t -> (0 until 2 + rnd.nextInt(3)).map { _ =>
          val c = Seq.fill(dim)(rnd.nextDouble() * 2 - 1)
          nextLeaf += 1
          (nextLeaf: Any, c, math.sqrt(c.map(x => x * x).sum))
        }
      }.toMap
    val tops: Seq[(Long, Seq[Double], Double)] = (0L to 2L).map { t =>
      val c = Seq.fill(dim)(rnd.nextDouble() * 2 - 1)
      (t, c, math.sqrt(c.map(x => x * x).sum))
    }
    val tm = TreeMatrix.build(IntegerType, tops, leaves)
    val rows = (0 until 400).map { i =>
      (i.toLong, Seq.fill(dim)(rnd.nextFloat() * 2 - 1))
    }.toDF("vec_id", "embedding")
      .withColumn("__n", sqrt(Dedup.dot(col("embedding"), col("embedding"))))
      .localCheckpoint()
    def ndOf(c: Seq[Double], cn: Double, norm: org.apache.spark.sql.Column) =
      -round(Dedup.dot(col("embedding"), typedLit(c)) / (norm * lit(cn)), 4)
    def topStructs(norm: org.apache.spark.sql.Column) = tops.map { case (t, c, cn) =>
      struct(ndOf(c, cn, norm).as("nd"), lit(t).as("id")) }
    def leafStructs(t: Long, norm: org.apache.spark.sql.Column) = leaves(t).map {
      case (id, c, cn) => struct(ndOf(c, cn, norm).as("nd"), lit(id).as("id")) }
    // assign twin: stage-1 struct argmin, stage-2 when-chain by top
    val topPick = array_min(array(topStructs(col("__n")): _*)).getField("id")
    val assignTwin = (0L to 1L).foldRight(
      array_min(array(leafStructs(2L, col("__n")): _*)).getField("id")) {
      (t, acc) => when(col("__pick") === lit(t),
        array_min(array(leafStructs(t, col("__n")): _*)).getField("id"))
        .otherwise(acc)
    }
    val cmp = rows.withColumn("__pick", topPick)
      .withColumn("twin", assignTwin)
      .withColumn("native", TreeQuantizerExpression.treeAssign(
        col("embedding"), col("__n"), tm))
    assert(cmp.filter(col("twin") =!= col("native")).count() == 0)
    assert(cmp.select(countDistinct(col("native"))).head().getLong(0) > 1,
      "degenerate spec: every row picked the same leaf")
    // probe twin (raw AND unit arithmetic): the probed candidate set
    // of the 2 best subtrees, nd compared bitwise per (row, leaf)
    for (norm <- Seq(col("__n"), lit(1.0))) {
      val pick2 = slice(array_sort(array(topStructs(norm): _*)), 1, 2)
      def branch(slot: Int) = (0L to 1L).foldRight(
        array(leafStructs(2L, norm): _*)) { (t, acc) =>
        when(element_at(pick2, slot).getField("id") === lit(t),
          array(leafStructs(t, norm): _*)).otherwise(acc)
      }
      val twinP = rows.select(col("vec_id"),
        explode(concat(branch(1), branch(2))).as("c"))
        .select(col("vec_id"), col("c.nd").as("nd"), col("c.id").as("list_id"))
      val nativeP = rows.select(col("vec_id"),
        explode(TreeQuantizerExpression.treeProbe(
          col("embedding"), norm, tm, 2)).as("c"))
        .select(col("vec_id"), col("c.nd").as("nd2"),
          col("c.list_id").as("list_id"))
      val joined = twinP.join(nativeP, Seq("vec_id", "list_id"), "full")
      assert(joined.filter(col("nd").isNull || col("nd2").isNull ||
        col("nd") =!= col("nd2")).count() == 0,
        "probed candidate sets or nd values drifted")
    }
    // NaN-poisoned row (a NaN element → dot = NaN → norm = NaN): the
    // declarative form survives it (NaN divisor passes ANSI's
    // zero-check, Spark's round passes NaN through, NaN sorts last so
    // the struct argmin falls to the id-ascending head). The native
    // round4 must do the same instead of throwing
    // NumberFormatException from BigDecimal.valueOf — one bad row
    // must never kill an append / migrate / streaming micro-batch.
    val nrow = Seq((0L, Float.NaN +: Seq.fill(dim - 1)(0.5f)))
      .toDF("vec_id", "embedding")
      .withColumn("__n", sqrt(Dedup.dot(col("embedding"), col("embedding"))))
      .localCheckpoint()
    val ncmp = nrow.withColumn("__pick", topPick)
      .withColumn("twin", assignTwin)
      .withColumn("native", TreeQuantizerExpression.treeAssign(
        col("embedding"), col("__n"), tm))
      .head()
    assert(ncmp.getAs[Int]("native") == ncmp.getAs[Int]("twin"),
      "NaN-norm assign diverged from the declarative twin")
    // A zero-norm row (all-zero embedding) has NO declarative twin —
    // ANSI Divide throws on the exact-0.0 divisor — but the native
    // path divides in Java (NaN), so it must still assign/probe
    // deterministically: all scores NaN → id-ascending head.
    val zrow = Seq((0L, Seq.fill(dim)(0f))).toDF("vec_id", "embedding")
      .withColumn("__n", sqrt(Dedup.dot(col("embedding"), col("embedding"))))
    val zAssign = zrow.select(TreeQuantizerExpression.treeAssign(
      col("embedding"), col("__n"), tm)).head().getInt(0)
    assert(zAssign == leaves(0L).map(_._1.asInstanceOf[Int]).min,
      "zero-norm assign is not the id-ascending head leaf")
    // probe must also survive the all-NaN selection (taken(-1) guard):
    // every leaf of the 2 id-ascending-first tops, nd = NaN
    val zprobe = zrow.select(explode(TreeQuantizerExpression.treeProbe(
      col("embedding"), col("__n"), tm, 2)).as("c"))
      .select(col("c.nd"), col("c.list_id")).collect()
    assert(zprobe.length == leaves(0L).length + leaves(1L).length,
      "zero-norm probe candidate set is not the 2 first tops' leaves")
    assert(zprobe.forall(r => r.getDouble(0).isNaN))
    assert(zprobe.map(_.getInt(1)).toSet ==
      (leaves(0L) ++ leaves(1L)).map(_._1.asInstanceOf[Int]).toSet)
  }

  test("kmv sketch algebra composes in plain SQL (r13 union/estimate faces)") {
    import spark.implicits._
    import graft.functions.Kmv
    GraftFunctionRegistry.registerAll(spark)
    val k = 16
    // per-(source, part) sketch rows — the stored shape (SketchStore)
    val rows = Seq(
      ("a", 0, Seq("x1", "x2", "x3", "shared1", "shared2")),
      ("a", 1, Seq("x4", "shared1", "x5")),
      ("b", 0, Seq("y1", "shared1", "shared2", "y2")),
      ("b", 1, Seq("y3", "y4")))
      .toDF("source", "part", "vals")
      .select(col("source"), col("part"), explode(col("vals")).as("v"))
      .groupBy(col("source"), col("part"))
      .agg(Kmv.kmvSketch(col("v"), k).as("sk"))
      .localCheckpoint()
    rows.createOrReplaceTempView("sk_rows")
    // 1) the union AGGREGATE folds stored rows to the sketch of the
    // full history — identical to one kmvSketch over all values
    val foldedSql = spark.sql(
      s"SELECT source, graft_kmv_union(sk, $k) AS sk FROM sk_rows GROUP BY source")
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    val direct = Seq(
      ("a", Seq("x1", "x2", "x3", "shared1", "shared2", "x4", "x5")),
      ("b", Seq("y1", "shared1", "shared2", "y2", "y3", "y4")))
      .toDF("source", "vals")
      .select(col("source"), explode(col("vals")).as("v"))
      .groupBy(col("source")).agg(Kmv.kmvSketch(col("v"), k).as("sk"))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    assert(foldedSql == direct,
      "union-aggregate fold must equal the one-pass sketch")
    // 2) scalar faces == the Scala column algebra, and == exact set
    // algebra in the unsaturated regime
    val sqlPair = spark.sql(
      s"""SELECT graft_kmv_estimate(graft_kmv_union2(a.sk, b.sk, $k), $k) AS u,
         |  graft_kmv_intersect(a.sk, b.sk, $k) AS i,
         |  graft_kmv_jaccard(a.sk, b.sk, $k) AS j
         |FROM (SELECT sk FROM (SELECT source, graft_kmv_union(sk, $k) AS sk
         |  FROM sk_rows GROUP BY source) WHERE source = 'a') a,
         |  (SELECT sk FROM (SELECT source, graft_kmv_union(sk, $k) AS sk
         |  FROM sk_rows GROUP BY source) WHERE source = 'b') b""".stripMargin)
      .head()
    // ground truth: |A|=7, |B|=6, shared = {shared1, shared2} = 2
    assert(sqlPair.getLong(0) == 11L, s"union estimate: $sqlPair")
    assert(sqlPair.getLong(1) == 2L, s"intersect estimate: $sqlPair")
    assert(math.abs(sqlPair.getDouble(2) - 2.0 / 11.0) < 1e-9)
    // 3) the d15-style audit as ONE SQL statement over stored sketches
    // equals the Scala pair algebra
    val viaSql = spark.sql(
      s"""WITH folded AS (
         |  SELECT source, graft_kmv_union(sk, $k) AS sk
         |  FROM sk_rows GROUP BY source)
         |SELECT a.source AS source_a, b.source AS source_b,
         |  graft_kmv_intersect(a.sk, b.sk, $k) AS shared,
         |  round(graft_kmv_jaccard(a.sk, b.sk, $k), 6) AS jaccard
         |FROM folded a JOIN folded b ON a.source < b.source""".stripMargin)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getDouble(3))).toSet
    val viaScala = {
      val f = rows.groupBy(col("source"))
        .agg(Kmv.kmvUnion(col("sk"), k).as("sk"))
      val a = f.select(col("source").as("source_a"), col("sk").as("ska"))
      val b = f.select(col("source").as("source_b"), col("sk").as("skb"))
      a.join(b, col("source_a") < col("source_b"))
        .select(col("source_a"), col("source_b"),
          Kmv.intersectEstimate(col("ska"), col("skb"), k).as("shared"),
          round(Kmv.jaccardEstimate(col("ska"), col("skb"), k), 6)
            .as("jaccard"))
        .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
          r.getDouble(3))).toSet
    }
    assert(viaSql == viaScala && viaSql.nonEmpty)
  }

  test("function registry exposes the full surface to SQL") {
    import graft.operators.Dedup.words
    GraftFunctionRegistry.registerAll(spark)
    assert(spark.sql("SELECT graft_fingerprint('Tchibo Holding AG') AS fp")
      .collect()(0).getString(0) == "ag holding tchibo")
    assert(spark.sql(
      "SELECT graft_fpx_tokens(graft_fingerprint('Tchibo Holding AG')) AS t")
      .collect()(0).getSeq[String](0).toSet ==
      Set("ag holding tchibo", "holding", "tchibo"))
    // SQL forms match the column forms exactly
    val doc = "the quick brown fox jumps over the lazy dog"
    val viaSqlMh = spark.sql(
      s"SELECT graft_minhash(array('a','b','c'), 16) AS mh")
      .collect()(0).getSeq[Long](0)
    val viaColMh = graft.functions.MinHashSignatureExpression
      .minhash(array(lit("a"), lit("b"), lit("c")), 16)
    assert(viaSqlMh ==
      spark.range(1).select(viaColMh).collect()(0).getSeq[Long](0))
    assert(viaSqlMh.length == 16)
    val sqlSim = spark.sql(
      s"SELECT graft_simhash(array('x','y')) AS sh").collect()(0).getLong(0)
    val colSim = spark.range(1)
      .select(graft.functions.SimHashExpression.simhash(
        array(lit("x"), lit("y")))).collect()(0).getLong(0)
    assert(sqlSim == colSim)
    // aggregate function: sums elementwise, skips nulls, null on empty
    val vs = spark.sql(
      "SELECT graft_vec_sum(v) FROM VALUES (array(1.0d, 2.0d)), " +
        "(array(0.5d, -1.0d)), (CAST(NULL AS ARRAY<DOUBLE>)) AS t(v)")
      .collect()(0).getSeq[Double](0)
    assert(vs == Seq(1.5, 1.0))
    assert(spark.sql(
      "SELECT graft_vec_sum(v) FROM VALUES (CAST(NULL AS ARRAY<DOUBLE>)) " +
        "AS t(v)").collect()(0).isNullAt(0))
    assert(spark.sql(
      "SELECT graft_vec_dot(array(1.0d, 2.0d), array(3.0d, 0.5d)) AS d")
      .collect()(0).getDouble(0) == 4.0)
  }

  test("native expression handles nulls and registers as SQL function") {
    import spark.implicits._
    val n = Seq(Option.empty[String]).toDF("s")
      .select(MetaphoneExpression.metaphone(col("s"))).collect()(0)
    assert(n.isNullAt(0))
    MetaphoneExpression.register(spark)
    val viaSql = spark.sql("SELECT graft_metaphone('Tchibo')").collect()(0)
    assert(viaSql.getString(0) == Phonetics.metaphone("Tchibo"))
  }

  test("top_k sketch: exact under capacity, MG-bounded past it, merge-stable") {
    import spark.implicits._
    import graft.functions.TopKAggregate
    // approx regime: zipf-ish stream with distinct >> capacity —
    // counts must be underestimates within N/(capacity+1), and the
    // heavy head must survive
    val rnd = new scala.util.Random(11)
    val stream = Seq.fill(2000)("head") ++
      Seq.fill(600)("second") ++
      (1 to 3000).map(_ => s"tail${rnd.nextInt(800)}")
    val truth = stream.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val n = stream.size.toLong
    val cap = 16
    val df = rnd.shuffle(stream).toDF("v")
    val got = df.agg(TopKAggregate.topK(col("v"), 5, cap).as("top"))
      .select(explode(col("top"))).select("col.value", "col.n")
      .collect().map(r => r.getString(0) -> r.getLong(1))
    assert(got.map(_._1).take(2).toSet == Set("head", "second"),
      s"heavy head must survive the sketch: ${got.toSeq}")
    got.foreach { case (v, c) =>
      assert(c <= truth(v), s"$v: MG counts are underestimates")
      assert(c >= truth(v) - n / (cap + 1),
        s"$v: count $c breaches the N/(cap+1) bound vs ${truth(v)}")
    }
    // merge stability: in the EXACT regime (distinct <= capacity) the
    // result is identical at any parallelism
    val small = (1 to 500).map(i => s"w${i % 20}").toDF("v")
    def run(parts: Int) = small.repartition(parts)
      .agg(TopKAggregate.topK(col("v"), 20, 64).as("t"))
      .select(explode(col("t"))).select("col.value", "col.n")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(run(1) == run(8))
    assert(run(1).map(_._2).sum == 500L, "exact regime counts sum to N")
    // SQL registration
    val viaSql = spark.sql(
      "SELECT graft_top_k(v, 1) FROM VALUES ('a'),('b'),('a') AS t(v)")
      .collect()(0).getSeq[org.apache.spark.sql.Row](0)
    assert(viaSql.head.getString(0) == "a" && viaSql.head.getLong(1) == 2L)
  }

  test("top_k_weighted: exact under capacity, W-bounded past it, w=1 = topK") {
    import spark.implicits._
    import graft.functions.TopKAggregate
    // approx regime: skewed WEIGHTED stream with distinct >> capacity
    // — estimates must be underestimates within W/(capacity+1) (W =
    // total weight), and the weight-heavy head must survive even
    // though it is row-count-light (the case row-count topK misses)
    val rnd = new scala.util.Random(23)
    val stream = Seq.fill(20)(("head", 500L)) ++          // few rows, heavy
      Seq.fill(400)(("second", 20L)) ++                   // many rows, medium
      (1 to 3000).map(_ => (s"tail${rnd.nextInt(800)}", 3L))
    val truth = stream.groupBy(_._1).view
      .mapValues(_.map(_._2).sum).toMap
    val totalW = stream.map(_._2).sum
    val cap = 16
    val df = rnd.shuffle(stream).toDF("v", "w")
    val got = df
      .agg(TopKAggregate.topKWeighted(col("v"), col("w"), 5, cap).as("top"))
      .select(explode(col("top"))).select("col.value", "col.n")
      .collect().map(r => r.getString(0) -> r.getLong(1))
    assert(got.map(_._1).take(2).toSet == Set("head", "second"),
      s"weight-heavy head must survive the sketch: ${got.toSeq}")
    got.foreach { case (v, c) =>
      assert(c <= truth(v), s"$v: weighted MG counts are underestimates")
      assert(c >= truth(v) - totalW / (cap + 1),
        s"$v: count $c breaches the W/(cap+1) bound vs ${truth(v)}")
    }
    // exact regime: distinct <= capacity → exact sums at any
    // parallelism, and w = 1 reproduces the unweighted sketch
    val small = (1 to 500).map(i => (s"w${i % 20}", (i % 7 + 1).toLong))
      .toDF("v", "w")
    def run(parts: Int) = small.repartition(parts)
      .agg(TopKAggregate.topKWeighted(col("v"), col("w"), 20, 64).as("t"))
      .select(explode(col("t"))).select("col.value", "col.n")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(run(1) == run(8))
    val exactSums = (1 to 500).map(i => (s"w${i % 20}", (i % 7 + 1).toLong))
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    run(1).foreach { case (v, c) => assert(c == exactSums(v)) }
    val ones = (1 to 500).map(i => (s"w${i % 20}", 1L)).toDF("v", "w")
    val viaWeighted = ones
      .agg(TopKAggregate.topKWeighted(col("v"), col("w"), 20, 64).as("t"))
      .select(explode(col("t"))).select("col.value", "col.n")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val viaPlain = ones
      .agg(TopKAggregate.topK(col("v"), 20, 64).as("t"))
      .select(explode(col("t"))).select("col.value", "col.n")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(viaWeighted == viaPlain)
    // null/non-positive weights skip; SQL registration
    val viaSql = spark.sql(
      "SELECT graft_top_k_weighted(v, w, 1) FROM VALUES " +
        "('a', 5L),('b', 2L),('a', CAST(NULL AS BIGINT)),('b', 0L) AS t(v, w)")
      .collect()(0).getSeq[org.apache.spark.sql.Row](0)
    assert(viaSql.head.getString(0) == "a" && viaSql.head.getLong(1) == 5L)
  }

  test("native word_stats == composed hit/fold passes on docs and unicode") {
    import spark.implicits._
    import graft.functions.WordStatsExpression
    import graft.operators.{Dedup, TextAnalysis}
    // t1 full-row parity on the real corpus: the native single-pass
    // counts drive the same argmax the composed four-filter form did
    val docs = Tables.load(spark, sf, "documents")
    val nat = TextAnalysis.langId(docs).collect().map(_.toSeq).toSet
    val comp = TextAnalysis.langIdComposed(docs).collect().map(_.toSeq).toSet
    assert(nat == comp)
    // synthetic corpus mixing stopwords, unicode words, digits, runs of
    // whitespace and empties — the struct vs composed counters AND a
    // pure-Scala model of the per-language hits
    val stops = TextAnalysis.stopwords.flatMap(_._2)
    val rnd = new scala.util.Random(7)
    val texts = (0L until 300L).map { i =>
      val k = rnd.nextInt(30)
      (i, (0 until k).map { _ =>
        rnd.nextInt(4) match {
          case 0 => stops(rnd.nextInt(stops.size))
          case 1 => "ä中é" + rnd.nextInt(10)
          case _ => (1 to 1 + rnd.nextInt(6))
            .map(_ => ('a' + rnd.nextInt(26)).toChar).mkString
        }
      }.mkString(if (rnd.nextBoolean()) " " else "  \t"))
    }
    val df = texts.toDF("doc_id", "text")
    val natRows = df.select(col("doc_id"),
      WordStatsExpression.wordStats(Dedup.words(col("text"))).as("st"))
      .select(col("doc_id"), col("st.en_hits"), col("st.de_hits"),
        col("st.es_hits"), col("st.fr_hits"), col("st.stop_hits"),
        col("st.char_sum"), col("st.n_words"))
      .collect().map(r => r.getLong(0) ->
        (1 to 7).map(r.getLong).toVector).toMap
    val compRows = TextAnalysis.countedMetricsComposed(df)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    texts.foreach { case (id, text) =>
      val ws = text.toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq
      val model = TextAnalysis.stopwords.map { case (_, list) =>
        ws.count(list.contains).toLong }
      val got = natRows(id)
      assert(got.take(4) == model, s"doc $id: '$text'")
      assert(got(4) == ws.count(stops.contains).toLong)
      // composed twin agrees on (n_words, stop_hits, char_sum)
      assert(compRows(id) == ((got(6), got(4), got(5))))
    }
    // SQL registration
    val viaSql = spark.sql(
      "SELECT graft_word_stats(array('the', 'der', 'xyz')).stop_hits")
      .collect()(0)
    assert(viaSql.getLong(0) == 2L)
  }

  // r11: the BPE trainer behind the checked-in merges fixture
  test("Bpe.train: hand-checked merges, tie-break determinism, saturation") {
    import graft.functions.Bpe
    // "abab"×3 + "abc"×1: pair counts a-b=7, b-a=3, b-c=1 → merge
    // (a,b); then ab-ab=3, ab-c=1 → (ab,ab); then abab exhausted,
    // (ab,c) last → saturated before numMerges
    val m = Bpe.train(Seq(("abab", 3L), ("abc", 1L)), numMerges = 10)
    assert(m == IndexedSeq(("a", "b"), ("ab", "ab"), ("ab", "c")))
    // count tie → lexicographically least pair wins, regardless of
    // input order
    val t1 = Bpe.train(Seq(("xy", 2L), ("pq", 2L)), 1)
    val t2 = Bpe.train(Seq(("pq", 2L), ("xy", 2L)), 1)
    assert(t1 == IndexedSeq(("p", "q")) && t2 == t1)
  }

  test("the checked-in merges fixture IS the sf0.01 training output") {
    import spark.implicits._
    import graft.functions.Bpe
    // regeneration guarantee: training on the corpus the fixture's
    // class doc names, at the fixture's own merge count, reproduces
    // the classpath table byte-for-byte — the fixture can never
    // silently drift from its trainer (the count itself is part of
    // the fixture: 80 merges, stopping short of the full-word
    // saturation this vocabulary reaches at 127)
    val wordFreq = Tables.load(spark, "/root/testdata/sf0.01", "documents")
      .select(col("text")).as[String]
      .flatMap(t => Bpe.preTokens(t))
      .groupBy(col("value").as("w")).agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val trained = Bpe.train(wordFreq, numMerges = Bpe.defaultMerges.length)
    assert(trained == Bpe.defaultMerges)
  }

  // r12: the incremental trainer (occurrence-indexed pair counts +
  // lazy-deletion heap — what makes a 32k-merge vocabulary tractable)
  // must be output-IDENTICAL to the naive full-recount reference on
  // randomized corpora, including count ties, overlapping pairs
  // (aaa-style), and saturation
  test("Bpe.train incremental ≡ naive reference over randomized corpora") {
    import graft.functions.Bpe
    val rnd = new scala.util.Random(12)
    for (trial <- 1 to 30) {
      val alphabet = "abcd".take(2 + rnd.nextInt(3))
      val words = (0 until 3 + rnd.nextInt(12)).map { _ =>
        val len = 1 + rnd.nextInt(8)
        val w = (0 until len)
          .map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
        (w, 1L + rnd.nextInt(5))
      }.groupBy(_._1).map { case (w, g) => (w, g.map(_._2).sum) }.toSeq
      val k = 1 + rnd.nextInt(25)
      val fast = Bpe.train(words, k)
      val slow = Bpe.trainReference(words, k)
      assert(fast == slow,
        s"trial $trial diverged on $words at $k merges:\n$fast\n$slow")
    }
  }

  // ---- KMV distinct sketch (q25) ----

  test("kmv exact regime: estimate == countDistinct while under k") {
    import graft.functions.Kmv
    import spark.implicits._
    val rnd = new scala.util.Random(3)
    val rows = (0 until 5000).map(_ =>
      (s"g${rnd.nextInt(4)}", s"v${rnd.nextInt(200)}"))
    val df = rows.toDF("g", "v").repartition(7)
    val got = df.groupBy(col("g"))
      .agg(Kmv.kmvDistinct(col("v"), 1024).as("est"),
        countDistinct(col("v")).as("exact"))
      .collect()
    assert(got.nonEmpty)
    got.foreach(r => assert(r.getLong(1) == r.getLong(2),
      s"${r.getString(0)}: est ${r.getLong(1)} != exact ${r.getLong(2)}"))
  }

  test("kmv boundary: EXACTLY k distinct answers exactly (the dropped flag)") {
    import graft.functions.Kmv
    import spark.implicits._
    // k distinct values fill the buffer WITHOUT dropping anything —
    // the estimate must be the exact k, not the (k-1)/θ estimator
    // (the off-by-one a flag-less full-buffer check gets wrong), and
    // it must survive merge shapes (partials full but complete)
    val k = 64
    val df = (0 until k).flatMap(i => Seq.fill(3)(s"v$i")).toDF("v")
    assert(df.repartition(1).agg(Kmv.kmvDistinct(col("v"), k))
      .collect()(0).getLong(0) == k.toLong)
    assert(df.repartition(9).agg(Kmv.kmvDistinct(col("v"), k))
      .collect()(0).getLong(0) == k.toLong)
    // one past k saturates: estimate runs (and is near, not exact-k+1)
    val over = (0 to k).map(i => s"v$i").toDF("v")
    val est = over.agg(Kmv.kmvDistinct(col("v"), k)).collect()(0).getLong(0)
    assert(est > 0, s"saturated estimate $est")
  }

  test("windowFunnel ignores corrupt BIGINT steps instead of truncating them") {
    import graft.functions.WindowFunnelAggregate.windowFunnel
    import spark.implicits._
    // 2^32 + 1 would truncate to step 1 under a narrowing intValue —
    // it must be ignored like any unmatched condition
    val df = Seq((1L, 10L, 4294967297L), (1L, 20L, 2L))
      .toDF("user_id", "ts_us", "step")
    val d = df.groupBy(col("user_id"))
      .agg(windowFunnel(col("ts_us"), col("step").cast("long"), 3, 100L))
      .collect()(0).getLong(1)
    assert(d == 0L, s"corrupt step must not open a funnel: depth $d")
  }

  test("kmv saturated regime: bounded relative error, partition-invariant") {
    import graft.functions.Kmv
    import spark.implicits._
    // 50k distinct values >> k=512; the sketch is a deterministic
    // function of the value SET, so the estimate must be bit-identical
    // under any partitioning/merge shape, and within the KMV
    // ~1/sqrt(k-2) relative standard error of the truth
    val df = (0 until 50000).map(i => s"val_$i").toDF("v")
    val est1 = df.repartition(1)
      .agg(Kmv.kmvDistinct(col("v"), 512)).collect()(0).getLong(0)
    val est13 = df.repartition(13)
      .agg(Kmv.kmvDistinct(col("v"), 512)).collect()(0).getLong(0)
    assert(est1 == est13, s"partitioning changed the estimate: $est1 / $est13")
    val relErr = math.abs(est1 - 50000.0) / 50000.0
    assert(relErr < 0.15, s"estimate $est1 off by ${relErr * 100}%")
  }

  test("kmv sketch set ops: exact in the unsaturated regime, bounded saturated") {
    import graft.functions.Kmv
    import spark.implicits._
    // A = 0..599, B = 400..999 → |A∩B| = 200, |A∪B| = 1000, J = 0.2
    val rows = (0 until 600).map(i => ("A", s"x$i")) ++
      (400 until 1000).map(i => ("B", s"x$i"))
    val sk = rows.toDF("s", "v").repartition(5).groupBy(col("s"))
      .agg(Kmv.kmvSketch(col("v"), 2048).as("sk"))
    val both = sk.filter(col("s") === "A").select(col("sk").as("a"))
      .crossJoin(sk.filter(col("s") === "B").select(col("sk").as("b")))
    // unsaturated (600 < k): the sketches hold every hash — set
    // estimates are EXACT
    val r = both.select(
      Kmv.jaccardEstimate(col("a"), col("b"), 2048).as("j"),
      Kmv.intersectEstimate(col("a"), col("b"), 2048).as("i"))
      .collect()(0)
    assert(math.abs(r.getDouble(0) - 0.2) < 1e-12, s"jaccard ${r.getDouble(0)}")
    assert(r.getLong(1) == 200L, s"intersect ${r.getLong(1)}")
    // saturated (k=64): deterministic estimates within a loose bound
    val sk64 = rows.toDF("s", "v").groupBy(col("s"))
      .agg(Kmv.kmvSketch(col("v"), 64).as("sk"))
    val r64 = sk64.filter(col("s") === "A").select(col("sk").as("a"))
      .crossJoin(sk64.filter(col("s") === "B").select(col("sk").as("b")))
      .select(Kmv.jaccardEstimate(col("a"), col("b"), 64).as("j"),
        Kmv.intersectEstimate(col("a"), col("b"), 64).as("i"))
      .collect()(0)
    assert(math.abs(r64.getDouble(0) - 0.2) < 0.15, s"jaccard64 ${r64.getDouble(0)}")
    assert(math.abs(r64.getLong(1) - 200.0) < 150.0, s"intersect64 ${r64.getLong(1)}")
  }

  // ---- window funnel (q26) ----

  test("windowFunnel greedy ≡ brute-force exists on randomized streams") {
    import graft.functions.WindowFunnelAggregate
    // exists semantics, evaluated literally: depth >= k iff a chain
    // e1..ek with steps 1..k, non-decreasing ts, all within window of
    // e1 exists
    def brute(ev: Seq[(Long, Int)], n: Int, win: Long): Long = {
      def chainOf(k: Int): Boolean = {
        def ext(startTs: Long, lastTs: Long, step: Int): Boolean =
          if (step > k) true
          else ev.exists { case (t, s) =>
            s == step && t >= lastTs && t - startTs <= win &&
              ext(startTs, t, step + 1)
          }
        ev.exists { case (t, s) => s == 1 && ext(t, t, 2) }
      }
      (1 to n).reverse.find(chainOf).getOrElse(0).toLong
    }
    val rnd = new scala.util.Random(21)
    for (trial <- 1 to 200) {
      val n = 3
      val win = 1 + rnd.nextInt(20)
      val ev = Seq.fill(rnd.nextInt(14))(
        (rnd.nextInt(30).toLong, 1 + rnd.nextInt(n)))
      val got = WindowFunnelAggregate.depth(ev, n, win.toLong)
      val want = brute(ev, n, win.toLong)
      assert(got == want,
        s"trial $trial: greedy $got != brute $want on win=$win ev=$ev")
    }
  }

  test("windowFunnel strict_increase ≡ brute-force strict exists on randomized streams") {
    import graft.functions.WindowFunnelAggregate
    // the strict twin: chain timestamps must strictly grow (the small
    // ts domain below makes same-ts collisions COMMON, which is
    // exactly the regime the mode changes)
    def brute(ev: Seq[(Long, Int)], n: Int, win: Long): Long = {
      def chainOf(k: Int): Boolean = {
        def ext(startTs: Long, lastTs: Long, step: Int): Boolean =
          if (step > k) true
          else ev.exists { case (t, s) =>
            s == step && t > lastTs && t - startTs <= win &&
              ext(startTs, t, step + 1)
          }
        ev.exists { case (t, s) => s == 1 && ext(t, t, 2) }
      }
      (1 to n).reverse.find(chainOf).getOrElse(0).toLong
    }
    val rnd = new scala.util.Random(22)
    for (trial <- 1 to 200) {
      val n = 3
      val win = 1 + rnd.nextInt(20)
      val ev = Seq.fill(rnd.nextInt(14))(
        (rnd.nextInt(12).toLong, 1 + rnd.nextInt(n)))
      val got = WindowFunnelAggregate.depth(ev, n, win.toLong,
        strictIncrease = true)
      val want = brute(ev, n, win.toLong)
      assert(got == want,
        s"trial $trial: strict $got != brute $want on win=$win ev=$ev")
      // and strictness can only lose depth vs the default mode
      assert(got <= WindowFunnelAggregate.depth(ev, n, win.toLong))
    }
  }

  test("windowFunnel: partition-invariant, tie chains, window edge, SQL face") {
    import graft.functions.WindowFunnelAggregate.windowFunnel
    import spark.implicits._
    // exact window edge: purchase at start + win chains; +1 beyond drops
    val edge = Seq((1L, 0L, 1), (1L, 50L, 2), (1L, 100L, 3),
      (2L, 0L, 1), (2L, 50L, 2), (2L, 101L, 3),
      (3L, 10L, 1), (3L, 10L, 2), (3L, 10L, 3)) // ties chain (≤ rule)
      .toDF("user_id", "ts_us", "step")
    def run(df: org.apache.spark.sql.DataFrame): Map[Long, Long] =
      df.groupBy(col("user_id"))
        .agg(windowFunnel(col("ts_us"), col("step"), 3, 100L).as("d"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val got = run(edge)
    assert(got == Map(1L -> 3L, 2L -> 2L, 3L -> 3L), got.toString)
    assert(run(edge.repartition(7)) == got, "repartition moved the depth")
    GraftFunctionRegistry.registerAll(spark)
    edge.createOrReplaceTempView("funnel_in")
    val viaSql = spark.sql(
      """SELECT user_id, graft_window_funnel(ts_us, step, 3, 100L) AS d
        |FROM funnel_in GROUP BY user_id""".stripMargin)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaSql == got)
    // 5-arg strict form must accept an INT window literal like the
    // 4-arg form does (r14 advisor: `100` parses as Int, not Long, and
    // the strict case only matched Long) — strict=false ≡ 4-arg result
    val viaSqlIntWin = spark.sql(
      """SELECT user_id, graft_window_funnel(ts_us, step, 3, 100, false) AS d
        |FROM funnel_in GROUP BY user_id""".stripMargin)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaSqlIntWin == got, "Int window literal in the 5-arg form")
    // and the tie-chain user loses depth under strict_increase, proving
    // the strict flag actually reached the aggregate
    val viaSqlStrict = spark.sql(
      """SELECT user_id, graft_window_funnel(ts_us, step, 3, 100, true) AS d
        |FROM funnel_in GROUP BY user_id""".stripMargin)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaSqlStrict(3L) < 3L, "strict mode must break the tie chain")
  }

  test("graft_top_k_merge: folded stored summaries == one-pass topK (exact regime)") {
    GraftFunctionRegistry.registerAll(spark)
    import spark.implicits._
    // 23 distinct values ≤ capacity 64 → every per-shard summary is an
    // exact subset and the merged fold is EXACT = the one-pass sketch
    (0 until 300).map(i => (i % 4, s"t${i % 23}"))
      .toDF("shard", "v").createOrReplaceTempView("tkm_in")
    def render(r: org.apache.spark.sql.Row): Seq[(String, Long)] =
      r.getSeq[org.apache.spark.sql.Row](0)
        .map(x => (x.getString(0), x.getLong(1))).toSeq
    val direct = render(spark.sql(
      "SELECT graft_top_k(v, 5, 64) FROM tkm_in").collect()(0))
    val folded = render(spark.sql(
      """WITH s AS (
        |  SELECT shard, graft_top_k(v, 64, 64) AS sk
        |  FROM tkm_in GROUP BY shard)
        |SELECT graft_top_k_merge(sk, 5, 64) FROM s""".stripMargin)
      .collect()(0))
    assert(folded == direct, s"folded $folded != direct $direct")
    // null summaries are skipped like count(col)
    val withNull = render(spark.sql(
      """WITH s AS (
        |  SELECT shard, graft_top_k(v, 64, 64) AS sk
        |  FROM tkm_in GROUP BY shard
        |  UNION ALL SELECT 99, NULL)
        |SELECT graft_top_k_merge(sk, 5, 64) FROM s""".stripMargin)
      .collect()(0))
    assert(withNull == direct)
  }

  test("uniqUpTo: exact below cap, pinned N+1 above, merge-stable, both input types") {
    import graft.functions.UniqUpToAggregate.uniqUpTo
    import spark.implicits._
    // group 1: 5 distinct (< cap 8) → exact; group 2: 20 distinct → 9
    val df = ((1 to 40).map(i => (1L, (i % 5).toLong)) ++
      (1 to 60).map(i => (2L, (i % 20).toLong)))
      .toDF("g", "v")
    def run(d: org.apache.spark.sql.DataFrame): Map[Long, Long] =
      d.groupBy(col("g")).agg(uniqUpTo(col("v"), 8).as("n"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val got = run(df)
    assert(got == Map(1L -> 5L, 2L -> 9L), got.toString)
    // any parallelism: partials with disjoint value subsets still cap
    // to exactly min(true_distinct, n+1)
    assert(run(df.repartition(13)) == got, "repartition moved the count")
    // string face + null skip + SQL face
    val sdf = Seq((1L, "a"), (1L, "b"), (1L, "a"), (1L, null),
      (2L, "x"), (2L, "y"), (2L, "z"))
      .toDF("g", "s")
    val sgot = sdf.groupBy(col("g")).agg(uniqUpTo(col("s"), 2).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sgot == Map(1L -> 2L, 2L -> 3L), sgot.toString)
    GraftFunctionRegistry.registerAll(spark)
    sdf.createOrReplaceTempView("uut_in")
    val viaSql = spark.sql(
      "SELECT g, graft_uniq_upto(s, 2) AS n FROM uut_in GROUP BY g")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaSql == sgot)
  }

  // ---- sequence match / count (q27, q27b) ----

  test("sequenceMatch scan ≡ brute-force exists on randomized streams") {
    import graft.functions.SequenceAggregate
    // exists semantics, evaluated literally: a chain e1..en with
    // steps 1..n, non-decreasing ts, EVERY adjacent hop ≤ gap
    def brute(ev: Seq[(Long, Int)], n: Int, gap: Long): Boolean = {
      def ext(lastTs: Long, step: Int): Boolean =
        if (step > n) true
        else ev.exists { case (t, s) =>
          s == step && t >= lastTs && t - lastTs <= gap &&
            ext(t, step + 1)
        }
      ev.exists { case (t, s) => s == 1 && ext(t, 2) }
    }
    val rnd = new scala.util.Random(27)
    for (trial <- 1 to 200) {
      val n = 1 + rnd.nextInt(3)
      val gap = rnd.nextInt(15).toLong
      val ev = Seq.fill(rnd.nextInt(14))(
        (rnd.nextInt(30).toLong, 1 + rnd.nextInt(n)))
      val got = SequenceAggregate.scan(ev, n, gap)._1
      val want = brute(ev, n, gap)
      assert(got == want,
        s"trial $trial: scan $got != brute $want on n=$n gap=$gap ev=$ev")
    }
  }

  test("sequenceCount greedy-reset ≡ brute-force max disjoint chains") {
    import graft.functions.SequenceAggregate
    // brute force over the SORTED stream: the maximum number of chains
    // where each later chain's events all follow the earlier chain's
    // completing event in (ts, step) order — the ClickHouse
    // search-restarts-after-a-match rule, by exhaustive recursion
    def brute(ev: Seq[(Long, Int)], n: Int, gap: Long): Long = {
      val s = ev.sortBy(identity).toIndexedSeq
      val memo = scala.collection.mutable.HashMap.empty[Int, Long]
      def chainsFrom(from: Int, lastTs: Long, step: Int): Seq[Int] =
        // end indices of chains whose remaining steps step..n fit in
        // s(from..) continuing from lastTs (-1 = chain not started)
        if (step > n) Seq(from - 1)
        else (from until s.length).flatMap { i =>
          val (t, st) = s(i)
          val ok =
            if (step == 1) st == 1
            else st == step && t >= lastTs && t - lastTs <= gap
          if (ok) chainsFrom(i + 1, t, step + 1) else Seq.empty
        }
      def best(from: Int): Long = memo.getOrElseUpdate(from, {
        if (from >= s.length) 0L
        else chainsFrom(from, -1L, 1)
          .map(end => 1L + best(end + 1))
          .foldLeft(0L)(math.max)
      })
      best(0)
    }
    val rnd = new scala.util.Random(33)
    for (trial <- 1 to 150) {
      val n = 1 + rnd.nextInt(3)
      val gap = rnd.nextInt(12).toLong
      val ev = Seq.fill(rnd.nextInt(12))(
        (rnd.nextInt(24).toLong, 1 + rnd.nextInt(n)))
      val got = SequenceAggregate.scan(ev, n, gap)._2
      val want = brute(ev, n, gap)
      assert(got == want,
        s"trial $trial: greedy $got != brute $want on n=$n gap=$gap ev=$ev")
    }
  }

  test("sequence aggregates: adjacency≠funnel, resets, ties, SQL faces") {
    import graft.functions.SequenceAggregate
    import graft.functions.WindowFunnelAggregate
    // the semantic DISCRIMINATION between q27 and q26: a steady chain
    // of small hops matches adjacency but exceeds a whole-chain
    // window; a late burst fits the window but fails adjacency
    val steady = Seq((0L, 1), (25L, 2), (50L, 3)) // hops 25,25; span 50
    assert(SequenceAggregate.scan(steady, 3, 30L)._1,
      "25-hop chain must match gap 30")
    assert(WindowFunnelAggregate.depth(steady, 3, 40L) < 3L,
      "span-50 chain must fail window 40")
    val burst = Seq((0L, 1), (95L, 2), (100L, 3)) // hop1 = 95; span 100
    assert(!SequenceAggregate.scan(burst, 3, 30L)._1,
      "95-hop chain must fail gap 30")
    assert(WindowFunnelAggregate.depth(burst, 3, 100L) == 3L,
      "span-100 chain must match window 100")
    // greedy reset: back-to-back chains count 2; a second purchase
    // with no fresh prefix does not
    assert(SequenceAggregate.scan(
      Seq((0L, 1), (1L, 2), (2L, 3), (3L, 1), (4L, 2), (5L, 3)),
      3, 10L)._2 == 2L)
    assert(SequenceAggregate.scan(
      Seq((0L, 1), (1L, 2), (2L, 3), (3L, 3)), 3, 10L)._2 == 1L)
    // ties chain (≤ rule, lower step first at equal ts)
    assert(SequenceAggregate.scan(
      Seq((7L, 1), (7L, 2), (7L, 3)), 3, 0L)._2 == 1L)
    // nSteps = 1: every step-1 event is a chain
    assert(SequenceAggregate.scan(
      Seq((1L, 1), (2L, 1), (9L, 1)), 1, 0L)._2 == 3L)
    // DataFrame + SQL faces, partition invariance, corrupt wide step
    import spark.implicits._
    val df = Seq((1L, 0L, 1L), (1L, 25L, 2L), (1L, 50L, 3L),
      (2L, 0L, 1L), (2L, 95L, 2L), (2L, 100L, 3L),
      (3L, 0L, (1L << 32) + 1L)) // corrupt step must be ignored
      .toDF("user_id", "ts_us", "step")
    def run(d: org.apache.spark.sql.DataFrame): Map[Long, (Boolean, Long)] =
      d.groupBy(col("user_id"))
        .agg(SequenceAggregate
            .sequenceMatch(col("ts_us"), col("step"), 3, 30L).as("m"),
          SequenceAggregate
            .sequenceCount(col("ts_us"), col("step"), 3, 30L).as("c"))
        .collect()
        .map(r => r.getLong(0) -> ((r.getBoolean(1), r.getLong(2)))).toMap
    val got = run(df)
    assert(got == Map(1L -> ((true, 1L)), 2L -> ((false, 0L)),
      3L -> ((false, 0L))), got.toString)
    assert(run(df.repartition(7)) == got, "repartition moved the result")
    GraftFunctionRegistry.registerAll(spark)
    df.createOrReplaceTempView("seq_in")
    val viaSql = spark.sql(
      """SELECT user_id, graft_sequence_match(ts_us, step, 3, 30L) AS m,
        |  graft_sequence_count(ts_us, step, 3, 30L) AS c
        |FROM seq_in GROUP BY user_id""".stripMargin)
      .collect()
      .map(r => r.getLong(0) -> ((r.getBoolean(1), r.getLong(2)))).toMap
    assert(viaSql == got)
  }

  test("kmv SQL faces registered: graft_kmv_distinct / graft_kmv_sketch") {
    GraftFunctionRegistry.registerAll(spark)
    import spark.implicits._
    (0 until 300).map(i => s"u${i % 97}").toDF("v")
      .createOrReplaceTempView("kmv_in")
    val est = spark.sql(
      "SELECT graft_kmv_distinct(v, 512) FROM kmv_in").collect()(0).getLong(0)
    assert(est == 97L)
    val sk = spark.sql(
      "SELECT graft_kmv_sketch(v, 512) FROM kmv_in").collect()(0).getSeq[Long](0)
    assert(sk.length == 97 && sk == sk.sorted)
  }

  // ---- exact bitmaps (q33, BitmapStore, st23) ----

  test("bitmap: set-exact across container kinds, merge-shape invariant, algebra vs sets") {
    import graft.functions.Bitmap
    import spark.implicits._
    val rnd = new scala.util.Random(34)
    // group 1 dense in one chunk (> 4096 → bitset container), group 2
    // sparse across far chunks (array containers), group 3 straddles
    val rows =
      (1 to 9000).map(_ => (1L, rnd.nextInt(60000).toLong)) ++
      (1 to 300).map(_ => (2L, rnd.nextInt(50).toLong * 1000003L)) ++
      (1 to 2000).map(_ => (3L, rnd.nextInt(200000).toLong))
    val sets = rows.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val df = rows.toDF("g", "v")
    def flat(d: org.apache.spark.sql.DataFrame): Map[Long, Seq[Long]] =
      d.groupBy(col("g")).agg(Bitmap.bitmap(col("v")).as("bm"))
        .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val bms = flat(df)
    // deterministic function of the value SET: any partitioning, any
    // merge shape, duplicates included — same bits
    assert(flat(df.repartition(17)) == bms)
    assert(flat(df.union(df)) == bms)
    // counts decode back to the exact set sizes
    val counted = bms.map { case (g, fl) =>
      g -> spark.range(1).select(
        Bitmap.bitmapCount(typedLit(fl)).as("c")).collect()(0).getLong(0)
    }
    assert(counted == sets.view.mapValues(_.size.toLong).toMap)
    // pairwise intersection/difference against literal set algebra
    for (a <- 1L to 3L; b <- 1L to 3L if a < b) {
      val row = spark.range(1).select(
        Bitmap.bitmapAndCount(typedLit(bms(a)), typedLit(bms(b))).as("i"),
        Bitmap.bitmapCount(Bitmap.bitmapAndNot(
          typedLit(bms(a)), typedLit(bms(b)))).as("d")).collect()(0)
      assert(row.getLong(0) == (sets(a) & sets(b)).size.toLong,
        s"and($a,$b)")
      assert(row.getLong(1) == (sets(a) -- sets(b)).size.toLong,
        s"andnot($a,$b)")
    }
    // or-fold of stored bitmaps == bitmap over the concatenation
    val folded = df.groupBy(col("g"))
      .agg(Bitmap.bitmap(col("v")).as("bm"))
      .agg(Bitmap.bitmapOr(col("bm")).as("bm"))
      .select(col("bm")).collect()(0).getSeq[Long](0)
    val direct = df.agg(Bitmap.bitmap(col("v")).as("bm"))
      .select(col("bm")).collect()(0).getSeq[Long](0)
    assert(folded == direct)
    // null values skipped; negatives rejected loudly
    val withNull = Seq[java.lang.Long](1L, null, 2L).toDF("v")
      .select(col("v").cast("long").as("v"))
      .agg(Bitmap.bitmapCount(Bitmap.bitmap(col("v"))).as("c"))
      .collect()(0).getLong(0)
    assert(withNull == 2L)
    val neg = intercept[Exception] {
      Seq(-1L).toDF("v").agg(Bitmap.bitmap(col("v"))).collect()
    }
    assert(neg.getMessage != null)
    // SQL faces
    GraftFunctionRegistry.registerAll(spark)
    df.createOrReplaceTempView("bm_in")
    val viaSql = spark.sql(
      """WITH s AS (SELECT g, graft_bitmap(v) AS bm FROM bm_in GROUP BY g)
        |SELECT a.g, b.g, graft_bitmap_and_count(a.bm, b.bm) AS i,
        |  graft_bitmap_count(graft_bitmap_andnot(a.bm, b.bm)) AS d
        |FROM s a JOIN s b ON a.g < b.g ORDER BY a.g, b.g""".stripMargin)
      .collect().map(r => ((r.getLong(0), r.getLong(1)),
        (r.getLong(2), r.getLong(3)))).toMap
    for (((a, b), (i, d)) <- viaSql) {
      assert(i == (sets(a) & sets(b)).size.toLong)
      assert(d == (sets(a) -- sets(b)).size.toLong)
    }
  }

  // ---- decayed running sum (q32) ----

  test("decayedSum: matches driver fold, null decays without adding, SQL face") {
    import graft.functions.DecayedSumExpression.decayedSumOver
    import spark.implicits._
    val rnd = new scala.util.Random(33)
    val rows = (1 to 3).flatMap(g =>
      (1 to 200).map(i => (g.toLong, i.toLong, rnd.nextInt(50).toLong * 1024L)))
    def reference(xs: Seq[Long], shift: Int): Seq[Long] =
      xs.scanLeft(0L)((s, x) => (s >> shift) + x).tail
    val want = rows.groupBy(_._1).view.mapValues(rs =>
      reference(rs.sortBy(_._2).map(_._3), 2)).toMap
    val got = rows.toDF("g", "i", "x")
      .repartition(7) // the window sorts; input partitioning is moot
      .withColumn("ema",
        decayedSumOver(col("x"), 2, Seq(col("g")), Seq(col("i"))))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3)))
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(_._3).toSeq).toMap
    assert(got == want)
    // null input: the state still decays one step, contributes 0
    val n = Seq((1L, java.lang.Long.valueOf(1024L)),
      (2L, null.asInstanceOf[java.lang.Long]), (3L, java.lang.Long.valueOf(0L)))
      .toDF("i", "x")
      .withColumn("ema",
        decayedSumOver(col("x"), 1, Seq(lit(1)), Seq(col("i"))))
      .orderBy(col("i")).collect().map(_.getLong(2)).toSeq
    assert(n == Seq(1024L, 512L, 256L), n.toString)
    // SQL face with a real OVER clause == the column face
    GraftFunctionRegistry.registerAll(spark)
    rows.toDF("g", "i", "x").createOrReplaceTempView("ds_in")
    val viaSql = spark.sql(
      """SELECT g, i, graft_decayed_sum(x, 2)
        |  OVER (PARTITION BY g ORDER BY i) AS ema
        |FROM ds_in""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(_._3).toSeq).toMap
    assert(viaSql == want)
  }

  // ---- KLL quantile sketch (q30, QuantileStore, st22) ----

  test("kll exact regime: quantiles == quantile_disc rank rule, merge-shape invariant") {
    import graft.functions.Kll
    import spark.implicits._
    val rnd = new scala.util.Random(30)
    // three groups of different sizes, all < k = 512 → never compacts
    val rows = (1 to 400).map(i => (1L, rnd.nextInt(100000).toLong)) ++
      (1 to 57).map(i => (2L, rnd.nextLong() % 1000L)) ++
      Seq((3L, 42L)) // single-row group
    val df = rows.toDF("g", "v")
    val ps = Seq(0.01, 0.25, 0.5, 0.9, 0.99, 1.0)
    def exact(vs: Seq[Long], p: Double): Long = {
      val sorted = vs.sorted
      sorted(math.max(1, math.ceil(p * vs.size).toLong).toInt - 1)
    }
    val want = rows.groupBy(_._1).map { case (g, vs) =>
      g -> ps.map(p => exact(vs.map(_._2), p))
    }
    def run(d: org.apache.spark.sql.DataFrame): Map[Long, Seq[Long]] =
      d.groupBy(col("g")).agg(Kll.quantileSketch(col("v"), 512).as("sk"))
        .select(col("g") +: ps.zipWithIndex.map { case (p, i) =>
          Kll.quantileValue(col("sk"), p).as(s"q$i") }: _*)
        .collect()
        .map(r => r.getLong(0) -> ps.indices.map(i => r.getLong(i + 1)))
        .toMap
    val got = run(df)
    assert(got == want, s"$got != $want")
    // unsaturated = the complete multiset: no partitioning/merge shape
    // can move any quantile
    assert(run(df.repartition(13)) == want)
    assert(run(df.repartition(1)) == want)
  }

  test("kll merge face: fold of stored sketches == one sketch, exact regime bit-identical") {
    import graft.functions.Kll
    import spark.implicits._
    val rnd = new scala.util.Random(31)
    val vs = Seq.fill(300)(rnd.nextInt(10000).toLong)
    val df = vs.zipWithIndex.map { case (v, i) => (i % 7, v) }.toDF("shard", "v")
    // per-shard stored sketches → merge fold
    val folded = df.groupBy(col("shard"))
      .agg(Kll.quantileSketch(col("v"), 512).as("sk"))
      .agg(Kll.quantileMerge(col("sk"), 512).as("sk"))
      .select(col("sk")).collect()(0).getSeq[Long](0)
    val direct = df.agg(Kll.quantileSketch(col("v"), 512).as("sk"))
      .select(col("sk")).collect()(0).getSeq[Long](0)
    // both unsaturated → both are the complete sorted multiset
    assert(folded == direct)
    assert(folded(0) == 300L, "n header")
    // null sketch rows are skipped, like count(col)
    val withNull = df.groupBy(col("shard"))
      .agg(Kll.quantileSketch(col("v"), 512).as("sk"))
      .union(Seq(99).toDF("shard").select(col("shard"),
        org.apache.spark.sql.functions.lit(null)
          .cast("array<bigint>").as("sk")))
      .agg(Kll.quantileMerge(col("sk"), 512).as("sk"))
      .select(col("sk")).collect()(0).getSeq[Long](0)
    assert(withNull == direct)
  }

  test("kll saturated regime: rank error within bound, fold-shape stressed") {
    import graft.functions.Kll
    import spark.implicits._
    val n = 50000
    val k = 256
    val rnd = new scala.util.Random(32)
    // adversarial-ish mix: heavy ties + uniform + a spike
    val vs = Array.fill(n)(rnd.nextInt(4) match {
      case 0 => rnd.nextInt(50).toLong
      case 1 => 1000000L
      case _ => rnd.nextInt(1000000).toLong
    })
    val sorted = vs.sorted
    val df = vs.toSeq.toDF("v")
    val ps = Seq(0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99)
    // KLL rank error for k=256 at n/k ≈ 195: well under 2% of n in
    // practice; gate at 3% (the bound is probabilistic, the coin is
    // derandomized, the data is seeded — deterministic in CI)
    val eps = 0.03
    def rankErr(q: Long, p: Double): Long = {
      val target = math.max(1L, math.ceil(p * n).toLong)
      val lo = sorted.count(_ < q) + 1L // rank span covered by ties of q
      val hi = sorted.count(_ <= q).toLong
      if (target < lo) lo - target else if (target > hi) target - hi else 0L
    }
    def check(d: org.apache.spark.sql.DataFrame, label: String): Unit = {
      val row = d.agg(Kll.quantileSketch(col("v"), k).as("sk"))
        .select(ps.zipWithIndex.map { case (p, i) =>
          Kll.quantileValue(col("sk"), p).as(s"q$i") }: _*)
        .collect()(0)
      ps.zipWithIndex.foreach { case (p, i) =>
        val err = rankErr(row.getLong(i), p)
        assert(err <= (eps * n).toLong,
          s"$label p=$p: rank error $err > ${(eps * n).toLong}")
      }
    }
    check(df, "one partition")
    check(df.repartition(37), "37-way fold")
    // stored-sketch fold across shards keeps the bound (mergeability)
    val viaStore = df.withColumn("shard",
      org.apache.spark.sql.functions.pmod(col("v"), lit(11)))
      .groupBy(col("shard"))
      .agg(Kll.quantileSketch(col("v"), k).as("sk"))
    val row = viaStore.agg(Kll.quantileMerge(col("sk"), k).as("sk"))
      .select(ps.zipWithIndex.map { case (p, i) =>
        Kll.quantileValue(col("sk"), p).as(s"q$i") }: _*)
      .collect()(0)
    ps.zipWithIndex.foreach { case (p, i) =>
      val err = rankErr(row.getLong(i), p)
      assert(err <= (eps * n).toLong, s"stored fold p=$p: rank error $err")
    }
    // space: the flat summary stays O(k·levels), nowhere near n
    val flat = df.agg(Kll.quantileSketch(col("v"), k).as("sk"))
      .select(org.apache.spark.sql.functions.size(col("sk")))
      .collect()(0).getInt(0)
    assert(flat < 4 * k, s"summary grew past O(k): $flat")
  }

  test("kll rank face, null skip, empty sketch, SQL registration") {
    import graft.functions.Kll
    import spark.implicits._
    val df = Seq[java.lang.Long](10L, 20L, 30L, null, 40L).toDF("v")
      .select(col("v").cast("long").as("v"))
    val sk = df.agg(Kll.quantileSketch(col("v"), 64).as("sk"))
    // nulls skipped: n = 4
    assert(sk.select(col("sk")(0)).collect()(0).getLong(0) == 4L)
    // exact ranks: weight of items <= v
    val ranks = sk.select(
      Kll.quantileRank(col("sk"), lit(5L)).as("r0"),
      Kll.quantileRank(col("sk"), lit(10L)).as("r1"),
      Kll.quantileRank(col("sk"), lit(25L)).as("r2"),
      Kll.quantileRank(col("sk"), lit(99L)).as("r3")).collect()(0)
    assert((ranks.getLong(0), ranks.getLong(1), ranks.getLong(2),
      ranks.getLong(3)) == ((0L, 1L, 2L, 4L)))
    // empty group → empty sketch → null quantile
    val empty = df.filter(col("v") > 1000L)
      .agg(Kll.quantileSketch(col("v"), 64).as("sk"))
      .select(Kll.quantileValue(col("sk"), 0.5).as("q"))
      .collect()(0)
    assert(empty.isNullAt(0))
    // SQL faces are value-identical to the column faces
    GraftFunctionRegistry.registerAll(spark)
    ((1 to 100).map(i => (i % 5, i.toLong))).toDF("g", "v")
      .createOrReplaceTempView("kll_in")
    val viaSql = spark.sql(
      """WITH s AS (
        |  SELECT g, graft_quantile_sketch(v, 512) AS sk
        |  FROM kll_in GROUP BY g),
        |m AS (SELECT graft_quantile_value(
        |  graft_quantile_merge(sk, 512), 0.5D) AS g50 FROM s)
        |SELECT g, graft_quantile_value(sk, 0.5D) AS p50,
        |  graft_quantile_rank(sk, 50L) AS r, m.g50
        |FROM s CROSS JOIN m ORDER BY g""".stripMargin)
    val viaCol = ((1 to 100).map(i => (i % 5, i.toLong))).toDF("g", "v")
      .groupBy(col("g"))
      .agg(Kll.quantileSketch(col("v"), 512).as("sk"))
      .select(col("g"), Kll.quantileValue(col("sk"), 0.5).as("p50"),
        Kll.quantileRank(col("sk"), lit(50L)).as("r"))
      .orderBy(col("g"))
    val sqlRows = viaSql.collect()
    val colRows = viaCol.collect()
    assert(sqlRows.map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
      .toSeq == colRows.map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
      .toSeq)
    // the windowed global merge sees all 100 values: p50 = 50
    assert(sqlRows.forall(_.getLong(3) == 50L))
  }

  test("deflate stats: bit-exact vs fresh-Deflater recompute, gate band") {
    import spark.implicits._
    import graft.functions.DeflateStatsExpression
    import graft.operators.TextAnalysis
    // fresh-Deflater reference (NOT the kernel's thread-local reuse
    // path — reset-reuse must be byte-identical to a cold instance)
    def ref(text: String): (Long, Long) = {
      val bytes = text.getBytes("UTF-8")
      val d = new java.util.zip.Deflater(6, true)
      d.setInput(bytes); d.finish()
      var n = 0L; val buf = new Array[Byte](8192)
      while (!d.finished()) n += d.deflate(buf)
      d.end()
      (bytes.length.toLong, n)
    }
    val rnd = new scala.util.Random(11)
    val synth = (0L until 200L).map { i =>
      val kind = i % 4
      val text = kind match {
        case 0 => "spam boilerplate row " * (1 + rnd.nextInt(50))
        case 1 => (1 to 20 + rnd.nextInt(400))
          .map(_ => ('a' + rnd.nextInt(26)).toChar).mkString
        case 2 => "ä中é " * (1 + rnd.nextInt(80)) + rnd.nextInt(100)
        case _ => (1 to 1 + rnd.nextInt(10))
          .map(_ => ('!' + rnd.nextInt(94)).toChar).mkString
      }
      (i, text)
    }
    val corpus = Tables.load(spark, sf, "documents")
      .select(col("doc_id"), col("text"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    val all = (synth ++ corpus.map { case (id, t) => (id + 100000L, t) })
      .toDF("doc_id", "text")
    val got = all.select(col("doc_id"),
      DeflateStatsExpression.deflateStats(col("text")).as("st"))
      .select(col("doc_id"), col("st.raw_bytes"), col("st.deflate_bytes"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    (synth ++ corpus.map { case (id, t) => (id + 100000L, t) }).foreach {
      case (id, text) => assert(got(id) == ref(text), s"doc $id drifted")
    }
    // the gate: repetition sinks the ratio, prose sits in the band,
    // and a tiny doc pays the DEFLATE block overhead past the top
    val gate = TextAnalysis.compressionGate(Seq(
      (1L, "spam boilerplate row " * 400),
      (2L, "The quarterly filing shows a modest increase in cross-border " +
        "holdings, with two subsidiaries reporting revised ownership " +
        "structures and one dormant entity struck from the register."),
      (3L, "xq7")).toDF("doc_id", "text"))
      .collect().map(r => r.getLong(0) ->
        ((r.getDouble(3), r.getBoolean(4)))).toMap
    assert(gate(1L)._1 < 0.30 && !gate(1L)._2, s"repetitive kept: ${gate(1L)}")
    assert(gate(2L)._2, s"prose dropped: ${gate(2L)}")
    assert(gate(3L)._1 > 0.98 && !gate(3L)._2, s"tiny doc kept: ${gate(3L)}")
    // keep verdict == exact rational band membership on every corpus doc
    val full = TextAnalysis.compressionGate(all)
      .collect().foreach { r =>
      val (raw, defl, keep) = (r.getLong(1), r.getLong(2), r.getBoolean(4))
      val lo = BigInt(defl) * 10000 >= BigInt(raw) * 3000
      val hi = BigInt(defl) * 10000 <= BigInt(raw) * 9800
      assert(keep == (lo && hi), s"gate drift at raw=$raw defl=$defl")
    }
    // SQL registration
    val viaSql = spark.sql(
      "SELECT graft_deflate_stats(repeat('ab', 100)).deflate_bytes," +
        " graft_deflate_stats(repeat('ab', 100)).raw_bytes").collect()(0)
    assert(viaSql.getLong(1) == 200L)
    assert(viaSql.getLong(0) == ref("ab" * 100)._2)
  }

  test("lttb: invariants + per-step argmax vs independent recompute") {
    import spark.implicits._
    import graft.functions.LttbAggregate
    val rnd = new scala.util.Random(23)
    // passthrough: short series come back complete, sorted
    val short = Seq((5L, 2L), (1L, 9L), (3L, 4L))
    assert(LttbAggregate.select(short, 20) == short.sorted)
    // randomized series: structural invariants + every greedy step
    // re-verified against independently recomputed buckets/centroids
    for (_ <- 1 to 200) {
      val n = 3 + rnd.nextInt(200)
      val nOut = 3 + rnd.nextInt(18)
      val pts = (0 until n).map(i =>
        (i.toLong * (1 + rnd.nextInt(3)) + rnd.nextInt(2),
          rnd.nextInt(1000).toLong))
        .distinct.sorted
      val sel = LttbAggregate.select(pts, nOut)
      assert(sel.size == math.min(pts.size, nOut))
      assert(sel.head == pts.head && sel.last == pts.last)
      assert(sel == sel.sorted, "selection not in t order")
      assert(sel.forall(pts.contains), "selected a non-member")
      if (pts.size > nOut) {
        // independent bucket partition: middle 1-based index i → k
        val mid = nOut - 2
        val nMid = pts.size - 2
        val buckets = (1 to nMid).groupBy(i => ((i - 1) * mid) / nMid)
        for (k <- 0 until mid) {
          val cand = buckets(k).map(i => pts(i))
          val prev = sel(k) // selection k+1 follows selection k
          val (tcs, vcs, m) =
            if (k == mid - 1) (pts.last._1, pts.last._2, 1L)
            else {
              val nx = buckets(k + 1).map(i => pts(i))
              (nx.map(_._1).sum, nx.map(_._2).sum, nx.size.toLong)
            }
          def score(b: (Long, Long)): Long = math.abs(
            (prev._1 * m - tcs) * (b._2 - prev._2) -
              (prev._1 - b._1) * (vcs - prev._2 * m))
          val want = cand.maxBy(b => (score(b), -b._1))
          assert(sel(k + 1) == want,
            s"bucket $k: ${sel(k + 1)} != $want (n=$n, nOut=$nOut)")
        }
      }
    }
    // a lone spike on a flat series always survives
    val flat = (0 until 100).map(i => (i.toLong, 10L)).toVector
    val spiked = flat.updated(57, (57L, 5000L))
    assert(LttbAggregate.select(spiked, 10).contains((57L, 5000L)))
    // partition invariance: the aggregate's merge-concat state makes
    // the result independent of input split
    val df = spiked.toDF("t", "v")
    def agg(d: org.apache.spark.sql.DataFrame) =
      d.agg(LttbAggregate.lttb(col("t"), col("v"), 10).as("sel"))
        .collect()(0).getSeq[org.apache.spark.sql.Row](0)
        .map(r => (r.getLong(0), r.getLong(1)))
    assert(agg(df) == agg(df.repartition(13)))
    assert(agg(df) == LttbAggregate.select(spiked, 10))
    // SQL face
    val viaSql = spark.sql(
      "SELECT graft_lttb(t, v, 5) FROM VALUES (1L, 1L), (2L, 9L), " +
        "(3L, 1L), (4L, 4L), (5L, 2L), (6L, 8L), (7L, 3L) AS x(t, v)")
      .collect()(0).getSeq[org.apache.spark.sql.Row](0)
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(viaSql == LttbAggregate.select(
      Seq((1L, 1L), (2L, 9L), (3L, 1L), (4L, 4L), (5L, 2L), (6L, 8L),
        (7L, 3L)), 5))
  }
}
