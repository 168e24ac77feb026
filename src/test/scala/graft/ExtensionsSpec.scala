package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{ContentChecksum, GraftFunctions}
import graft.operators.Multimodal

/** Tests for the extension surface: multimodal binary plumbing, the
  * ContentChecksum Aggregator (U-2), and the DocFlatten Generator (U-3).
  */
class ExtensionsSpec extends AnyFunSuite {
  lazy val spark = graft.core.Sessions.local(4, "ext-spec")
  val sf = "/root/testdata/sf0.001"

  test("asset table: binary column, typed metadata, kind partitioning") {
    val a = Multimodal.assets(spark, sf)
    assert(a.schema("bytes").dataType == org.apache.spark.sql.types.BinaryType)
    val kinds = a.groupBy("kind").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(kinds.keySet == Set("image", "audio", "video"))
    // metadata-only query over a MATERIALIZED asset table must not read the
    // blob column: parquet ReadSchema excludes `bytes` (column pruning —
    // at 100 TB this is the difference between a metadata scan and reading
    // every pixel)
    val dir = java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get("target"), "assets").toString
    a.write.mode("overwrite").parquet(dir)
    val stored = spark.read.parquet(dir)
    val metaPlan = stored.select("asset_id", "meta.n_bytes")
      .filter(col("meta.n_bytes") > 100)
      .queryExecution.executedPlan.toString
    val readSchema = metaPlan.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(!readSchema.contains("bytes:binary") && !readSchema.contains("origin"),
      s"metadata query should prune blob column and unused meta fields: $readSchema")
  }

  test("decodeFeatures: batched per-partition decode preserves every asset") {
    val a = Multimodal.assets(spark, sf)
    val f = Multimodal.decodeFeatures(a)
    assert(f.count() == a.count())
    // fingerprint agrees with the SQL md5 path (the oracle's definition)
    val viaSql = a.selectExpr("asset_id",
      s"${graft.functions.Hashing.md5h32("cast(bytes as string)")} AS fp")
    val joined = f.join(viaSql.withColumnRenamed("fp", "fp_sql"), "asset_id")
    assert(joined.filter(col("fp") =!= col("fp_sql")).count() == 0)
  }

  test("sampleFrames: video-only fan-out, FrameCount frames per asset, no shuffle") {
    val a = Multimodal.assets(spark, sf)
    val frames = Multimodal.sampleFrames(a)
    val nVideo = a.filter(col("kind") === "video").count()
    assert(frames.count() == nVideo * Multimodal.FrameCount)
    val plan = frames.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"frame sampling must not shuffle:\n$plan")
  }

  test("resize: image-only, bounded output size, no shuffle") {
    val a = Multimodal.assets(spark, sf)
    val r = Multimodal.resize(a)
    assert(r.count() == a.filter(col("kind") === "image").count())
    val maxLen = r.agg(max("r_len")).head.getLong(0)
    assert(maxLen <= Multimodal.TargetBytes,
      s"downsampled blobs must be <= ${Multimodal.TargetBytes} bytes, got $maxLen")
    val plan = r.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"resize must not shuffle:\n$plan")
  }

  test("ContentChecksum is order- and partitioning-independent (U-2)") {
    val df = graft.core.Tables.orders(spark, sf)
    val base = df.select(ContentChecksum.ofFrame(df).as("h")).head.getLong(0)
    val shuffled = df.repartition(13).sortWithinPartitions("o_totalprice")
    val h2 = shuffled.select(ContentChecksum.ofFrame(shuffled).as("h")).head.getLong(0)
    assert(base == h2)
    // equals the plain SQL bit_xor-of-hashes path (same definition, B5 fix)
    val viaSql = df.select(xxhash64(df.columns.sorted.map(col).toIndexedSeq: _*).as("h"))
      .agg(expr("bit_xor(h)")).head.getLong(0)
    assert(base == viaSql)
    // any single-row change must move the checksum
    val mutated = df.limit(1).withColumn("o_totalprice", lit(-1.0))
      .union(df.exceptAll(df.limit(1)))
    val h3 = mutated.select(ContentChecksum.ofFrame(mutated).as("h")).head.getLong(0)
    assert(base != h3)
  }

  test("DocFlatten walks structs, arrays, maps; nulls stay null (U-3)") {
    GraftFunctions.register(spark)
    val df = spark.read.json(spark.createDataset(Seq(
      """{"a":{"b":[{"c":1},{"c":2}],"d":"x"},"e":null}"""))(
      org.apache.spark.sql.Encoders.STRING))
    val rows = df.selectExpr("flatten_doc(struct(a, e))")
      .collect().map(r => (r.getString(0), Option(r.getString(1)))).toSeq.sorted
    assert(rows == Seq(
      ("a.b[0].c", Some("1")),
      ("a.b[1].c", Some("2")),
      ("a.d", Some("x")),
      ("e", None)))
  }

  test("LSH ANN: exact precision, bounded recall loss vs brute force") {
    import graft.operators.{Dedup, Similarity}
    val lsh = Similarity.qSim2(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // qD7 is the exact baseline on its DECLARED bound (a_id < 200); compare
    // precision on the shared domain
    val brute = Dedup.qD7(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh.filter(_._1 < 200).subsetOf(brute),
      "every LSH pair must be a true >=0.4 pair (candidates scored exactly)")
    assert(brute.isEmpty || lsh.nonEmpty,
      "LSH should recover at least some true pairs")
    // the banded variant (qD8) widens recall over the single-band qSim2:
    // same exact-rescore contract, more bands -> strictly more candidates
    val banded = Dedup.qD8(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(banded.filter(_._1 < 200).subsetOf(brute),
      "every banded-LSH pair must be a true >=0.4 pair")
  }

  test("SparkSessionExtensions registration exposes custom functions in SQL") {
    import org.apache.spark.sql.SparkSession
    spark.sparkContext // ensure the shared context exists
    // force a SIBLING session (same SparkContext, fresh sessionState built
    // through the extensions hook); never stop it — the context is shared
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s2 = SparkSession.builder()
        .withExtensions(new graft.functions.GraftExtensions)
        .getOrCreate()
      assert(s2 ne spark, "must be a fresh session, not the shared one")
      val r = s2.sql(
        "SELECT round(cosine_sim(array(1.0D, 0.0D), array(1.0D, 0.0D)), 4) AS c")
        .head.getDouble(0)
      assert(r == 1.0)
      val f = s2.sql("SELECT flatten_doc(named_struct('a', 1, 'b', 'x'))")
        .collect().map(r0 => (r0.getString(0), r0.getString(1))).toSeq
      assert(f == Seq(("a", "1"), ("b", "x")))
      // the fused sketch kernels ride the same extension surface
      val sk = s2.sql(
        "SELECT simhash32('a b a') AS sh, minhash_sig('a b c d', 3).m1 AS m1, " +
          "lsh_band_sig(cast(array(1.0, -1.0) as array<float>), 0, 2) AS bs, " +
          "lang_hits('the cat') AS lh")
        .head()
      assert(!sk.isNullAt(0) && !sk.isNullAt(1) && !sk.isNullAt(2) && !sk.isNullAt(3))
    } finally {
      SparkSession.setDefaultSession(spark)
      SparkSession.setActiveSession(spark)
    }
  }

  test("IVF ANN: exact rescoring, valid ranks, sims agree with brute force") {
    import graft.operators.Similarity
    GraftFunctions.register(spark)
    val ivf = Similarity.qSim3(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getDouble(2), r.getInt(3))).toMap
    assert(ivf.nonEmpty)
    // at most 3 per query, ranks contiguous from 1
    ivf.keys.groupBy(_._1).foreach { case (q, ks) =>
      val ranks = ks.map(k => ivf(k)._2).toSeq.sorted
      assert(ranks == (1 to ranks.size), s"ranks for q=$q: $ranks")
    }
    // every reported sim is the EXACT cosine (IVF approximates the candidate
    // set, never the score): compare against an all-pairs brute scorer
    val e = graft.core.Tables.embeddings(spark, sf)
    val brute = e.selectExpr("vec_id AS q_id", "embedding AS eq")
      .where(col("q_id") < 10)
      .crossJoin(e.selectExpr("vec_id AS n_id", "embedding AS en"))
      .where(col("q_id") =!= col("n_id"))
      .selectExpr("q_id", "n_id", "ROUND(cosine_sim(eq, en), 4) AS sim")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    ivf.foreach { case (k, (sim, _)) => assert(brute(k) == sim, s"pair $k") }
  }

  test("Q-V3 sketch verification: HLL estimate tracks the exact count") {
    val r = graft.operators.Relational.qV3(spark, sf).head
    val exact = r.getLong(0)
    assert(exact > 0)
    // the query itself carries the 5% (2.5 sigma at 0.02 rsd) bound check —
    // the same boolean the DuckDB oracle asserts is `true`
    assert(r.getBoolean(1), s"HLL estimate drifted >5% from exact=$exact")
  }

  test("trained IVF: Lloyd step moves centroids, rescoring stays exact") {
    import graft.operators.Similarity
    GraftFunctions.register(spark)
    val ivf = Similarity.qSim4(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(ivf.nonEmpty)
    // training must not break the exact-rescoring invariant
    val e = graft.core.Tables.embeddings(spark, sf)
    val brute = e.selectExpr("vec_id AS q_id", "embedding AS eq")
      .where(col("q_id") < 10)
      .crossJoin(e.selectExpr("vec_id AS n_id", "embedding AS en"))
      .where(col("q_id") =!= col("n_id"))
      .selectExpr("q_id", "n_id", "ROUND(cosine_sim(eq, en), 4) AS sim")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    ivf.foreach { case (k, sim) => assert(brute(k) == sim, s"pair $k") }
  }

  test("word_shingles == composable zip_with form; edge cases") {
    GraftFunctions.register(spark)
    val docs = graft.core.Tables.documents(spark, sf)
      .selectExpr("doc_id", "split(lower(text), ' ') AS w")
      .selectExpr("doc_id",
        "array_distinct(filter(" +
          "zip_with(zip_with(w, slice(w, 2, size(w)), (a, b) -> concat(a, ' ', b)), " +
          "slice(w, 3, size(w)), (ab, c) -> concat(ab, ' ', c)), x -> x IS NOT NULL)) AS ref")
      .join(graft.core.Tables.documents(spark, sf)
        .selectExpr("doc_id", "word_shingles(text, 3) AS got"), "doc_id")
    // same elements, same first-occurrence order (array_distinct keeps order)
    assert(docs.filter(col("ref") =!= col("got")).count() == 0)
    // short docs -> empty; null -> null; n=1 -> distinct words
    val edge = spark.sql(
      "SELECT word_shingles('one two', 3) a, word_shingles(NULL, 3) b, " +
        "word_shingles('X x y', 1) c").head
    assert(edge.getSeq[String](0).isEmpty)
    assert(edge.isNullAt(1))
    assert(edge.getSeq[String](2) == Seq("x", "y"))
  }

  test("salted aggregation equals plain aggregation (skew path)") {
    import graft.operators.Skew
    val ev = graft.core.Tables.events(spark, sf)
    val plain = ev.groupBy("user_id").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val salted = Skew.saltedCount(ev, "user_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(salted == plain)
    val cs = Skew.saltedCollectSet(ev, "user_id", "event_type")
      .filter(col("user_id") === plain.keys.head)
      .head.getSeq[String](1).toSet
    val plainSet = ev.filter(col("user_id") === plain.keys.head)
      .select("event_type").distinct().collect().map(_.getString(0)).toSet
    assert(cs == plainSet)
  }

  test("DocFlatten round-trip: every scalar leaf appears exactly once") {
    GraftFunctions.register(spark)
    val doc = graft.core.Tables.documents(spark, sf).limit(10)
    val flat = doc.select(col("doc_id"),
      expr("flatten_doc(struct(lang, n_chars, source, text))"))
    assert(flat.count() == doc.count() * 4)
    assert(flat.groupBy("doc_id").count().filter(col("count") =!= 4).count() == 0)
  }
}
