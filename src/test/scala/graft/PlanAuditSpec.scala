package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Joins, Relational}

/** Plan-shape audit (the 100 TB posture, SURVEY.md §4.2): the operators must
  * produce the plan a 1000-executor cluster needs, not merely a correct one.
  * Checked structurally on the optimized/executed plans at sf0.001 — plan
  * shape is SF-independent for these queries (broadcast threshold: nation is
  * 25 rows at every SF).
  */
class PlanAuditSpec extends AnyFunSuite {
  lazy val spark = graft.core.Sessions.local(4, "plan-audit")
  val sf = "/root/testdata/sf0.001"

  test("Q-S1 projection prunes to the selected columns at the scan") {
    val plan = Relational.qS1(spark, sf).queryExecution.executedPlan.toString
    val readSchema = plan.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(readSchema.contains("l_orderkey") && !readSchema.contains("l_extendedprice"),
      s"scan must read only projected columns: $readSchema")
  }

  test("Q-F1 filter is pushed down to the parquet scan") {
    val plan = Relational.qF1(spark, sf).queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [") &&
      (plan.contains("GreaterThan(l_discount") || plan.contains("EqualTo(l_returnflag")),
      s"predicates must reach the scan:\n${plan.linesIterator.filter(_.contains("PushedFilters")).mkString("\n")}")
  }

  test("Q-J1 small-dim join broadcasts (no shuffle of the fact side on the dim key)") {
    val plan = Joins.qJ1(spark, sf).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      "25-row nation dim must broadcast, not sort-merge")
  }

  test("Q-A2 aggregates partially before the shuffle (map-side combine)") {
    val plan = Relational.qA2(spark, sf).queryExecution.executedPlan.toString
    val aggs = plan.linesIterator.filter(_.contains("HashAggregate")).toSeq
    assert(aggs.exists(_.contains("partial_")),
      s"hash agg must have a partial phase:\n${aggs.mkString("\n")}")
  }

  test("Q-O1 top-k uses TakeOrderedAndProject, not a global sort") {
    val plan = Relational.qO1(spark, sf).queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      "LIMIT 10 over ORDER BY must be top-k, not a full sort")
  }

  test("Q-SIM3 IVF: corpus never shuffles — probe side broadcasts") {
    val q = graft.operators.Similarity.qSim3(spark, sf)
    q.collect()
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      "probe->cell candidate join must be a broadcast hash join")
    // the only Exchanges allowed are the broadcast itself and the tiny
    // candidate-side shuffle into the per-query ranking window + final sort
    val shuffles = plan.linesIterator.filter(l =>
      l.contains("Exchange") && !l.contains("BroadcastExchange")).toSeq
    assert(shuffles.forall(l => l.contains("hashpartitioning(q_id") ||
      l.contains("rangepartitioning")),
      s"corpus-side shuffle detected:\n${shuffles.mkString("\n")}")
  }

  test("Q-SIM3/4 probe reuses the built index: zero corpus-wide passes") {
    val idx = graft.operators.Similarity.IvfIndex.build(spark, sf, lloydIters = 1)
    val q = graft.operators.Similarity.IvfIndex.probe(spark, sf, idx)
    q.collect()
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("InMemoryTableScan"),
      s"assignment must come from the cached index, not a corpus rebuild:\n$plan")
    // live final plan only: the InMemoryRelation node re-prints its STORED
    // build plan (incl. its FileScan), and AQE appends the initial plan —
    // neither executes. Everything before the first InMemoryRelation marker
    // is what actually runs, and it may touch parquet exactly once: the
    // pushed-down vec_id<10 probe-side scan.
    val live = plan.split("== Initial Plan ==").head.split("InMemoryRelation").head
    val scans = live.linesIterator.filter(_.contains("FileScan parquet")).toSeq
    assert(scans.size == 1 && scans.head.contains("LessThan(vec_id,10)"),
      s"only the tiny query-side scan may touch parquet:\n${scans.mkString("\n")}")
  }

  test("Q-SIM11 int8 probe serves the quantized lane: cached index, one tiny parquet scan") {
    val idx = graft.operators.Similarity.IvfIndex.build(spark, sf, lloydIters = 0)
    val q = graft.operators.Similarity.IvfIndex.probeInt8(spark, sf, idx)
    q.collect()
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("InMemoryTableScan"),
      s"int8 assignment must come from the cached index:\n$plan")
    // live plan may touch parquet exactly once (the vec_id<10 probe scan) —
    // the candidate side comes from the cached int8 lane, and the backing
    // files of THAT cache are assignment_int8, not the float lane
    val live = plan.split("== Initial Plan ==").head.split("InMemoryRelation").head
    val scans = live.linesIterator.filter(_.contains("FileScan parquet")).toSeq
    assert(scans.size == 1 && scans.head.contains("LessThan(vec_id,10)"),
      s"only the tiny query-side scan may touch parquet:\n${scans.mkString("\n")}")
    val files = idx.qassigned.queryExecution.analyzed.collect {
      case l: org.apache.spark.sql.execution.datasources.LogicalRelation =>
        l.relation.asInstanceOf[org.apache.spark.sql.execution.datasources
          .HadoopFsRelation].location.inputFiles.toSeq
    }.flatten
    assert(files.nonEmpty && files.forall(_.contains("assignment_int8")),
      s"the served candidates must read the int8 lane: ${files.take(3)}")
  }

  test("IVF index is durable: a fresh session probes from the on-disk index") {
    import graft.operators.Similarity
    // ensure the index exists on disk (first call in this JVM builds+writes)
    Similarity.qSim4(spark, sf).collect()
    // a FRESH session misses the in-process memo and must LOAD, not rebuild:
    // its assignment reads only index files — zero corpus-wide passes
    val s2 = spark.newSession()
    val idx = Similarity.IvfIndex.build(s2, sf, lloydIters = 1)
    // cache substitution hides the relation from Dataset.inputFiles — read
    // the backing files off the ANALYZED plan, which keeps it
    val files = idx.assigned.queryExecution.analyzed.collect {
      case l: org.apache.spark.sql.execution.datasources.LogicalRelation =>
        l.relation.asInstanceOf[org.apache.spark.sql.execution.datasources
          .HadoopFsRelation].location.inputFiles.toSeq
    }.flatten
    assert(files.nonEmpty && files.forall(_.contains("ivf-index")),
      s"fresh-session assignment must come from the durable index, got: ${files.take(3)}")
    val fresh = Similarity.IvfIndex.probe(s2, sf, idx).collect().map(_.toString).toSeq
    val orig = Similarity.qSim4(spark, sf).collect().map(_.toString).toSeq
    assert(fresh == orig, "durable-index probe must match the building session")
  }

  test("pq_encode / int_dot match their HOF formulations bit-for-bit and stay in codegen") {
    import org.apache.spark.sql.functions.{col, typedLit}
    graft.functions.GraftFunctions.register(spark)
    val e = graft.core.Tables.embeddings(spark, sf)
    // materialization boundary below the kernels (the qSim13 shape: the
    // quantize HOF runs upstream of a persist) — otherwise projection
    // collapse puts the non-codegen lambda into the same Project and the
    // whole node falls out of codegen regardless of the kernel
    val qz = e.selectExpr("vec_id",
      "transform(embedding, x -> CAST(FLOOR(CAST(x AS DOUBLE) * 50.0) AS BIGINT)) AS qv")
      .localCheckpoint(true)
    val cb: Array[Array[Long]] = qz.where(col("vec_id") < 16).orderBy("vec_id")
      .select("qv").collect().map(_.getSeq[Long](0).toArray)
    val native = qz.select(col("vec_id"),
      org.apache.spark.sql.GraftColumn.of(graft.functions.PqEncode(
        org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute("qv"), cb, 8))
        .cast("array<bigint>").as("codes"))
    val hof = qz.withColumn("cb", typedLit(cb.map(_.toSeq).toSeq)).selectExpr("vec_id",
      """transform(sequence(0, 7), m ->
        |  array_min(transform(sequence(0, 15), cc -> named_struct(
        |    'd', aggregate(sequence(1, 8), 0L, (acc, j) ->
        |           acc + (element_at(qv, m*8+j) - element_at(element_at(cb, cc+1), m*8+j))
        |               * (element_at(qv, m*8+j) - element_at(element_at(cb, cc+1), m*8+j))),
        |    'c', CAST(cc AS BIGINT)))).c) AS codes""".stripMargin)
    assert(native.orderBy("vec_id").collect().map(_.toString).toSeq ==
      hof.orderBy("vec_id").collect().map(_.toString).toSeq,
      "PqEncode must replay the HOF argmin (ties to lowest code) exactly")
    val nd = qz.selectExpr("vec_id", "int_dot(qv, qv) AS d")
    val hd = qz.selectExpr("vec_id",
      "aggregate(zip_with(qv, qv, (x, y) -> x * y), 0L, (a, b) -> a + b) AS d")
    assert(nd.orderBy("vec_id").collect().map(_.toString).toSeq ==
      hd.orderBy("vec_id").collect().map(_.toString).toSeq)
    // both kernels must live inside a WholeStageCodegen span
    val plan = native.queryExecution.executedPlan.toString
    assert(plan.linesIterator.exists(l => l.contains("pqencode") && l.contains("*(")),
      s"PqEncode fell out of codegen:\n$plan")
    val dplan = nd.queryExecution.executedPlan.toString
    assert(dplan.linesIterator.exists(l => l.contains("intdot") && l.contains("*(")),
      s"IntDot fell out of codegen:\n$dplan")
  }

  test("pq_encode contract errors: empty codebook and wrong-length input (ADVICE r10)") {
    import org.apache.spark.sql.functions.col
    // empty codebook must die with the CONTRACT message, not a raw
    // NoSuchElementException from codebook.head
    val e1 = intercept[IllegalArgumentException] {
      graft.functions.PqEncode(
        org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute("qv"),
        Array.empty[Array[Long]], 8)
    }
    assert(e1.getMessage.contains("codebook must be non-empty"), e1.getMessage)
    // a short input surfaces as the documented length error (from generated
    // code AND interpreted eval), never an ArrayIndexOutOfBounds
    import spark.implicits._
    val cb = Array(Array(0L, 0L, 0L, 0L), Array(1L, 1L, 1L, 1L))
    val short = Seq((1L, Seq(1L, 2L))).toDF("vec_id", "qv")
    val thrown = intercept[Throwable] {
      short.select(org.apache.spark.sql.GraftColumn.of(graft.functions.PqEncode(
        org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute("qv"),
        cb, 2)).as("codes")).collect()
    }
    def chain(t: Throwable): Seq[Throwable] =
      if (t == null) Seq.empty else t +: chain(t.getCause)
    assert(chain(thrown).exists(c =>
      c.getMessage != null && c.getMessage.contains("input length 2") &&
        c.getMessage.contains("codebook vector length 4")),
      s"expected the contract message in: ${chain(thrown).map(_.getMessage)}")
    // and a well-formed input on the same codebook still encodes
    val ok = Seq((1L, Seq(1L, 1L, 1L, 1L))).toDF("vec_id", "qv")
      .select(org.apache.spark.sql.GraftColumn.of(graft.functions.PqEncode(
        org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute("qv"),
        cb, 2)).as("codes")).head().getSeq[Int](0)
    assert(ok == Seq(1, 1))
  }

  test("lsh_band_sig matches the HOF formulation bit-for-bit and stays in codegen") {
    import org.apache.spark.sql.functions._
    graft.functions.GraftFunctions.register(spark)
    val e = graft.core.Tables.embeddings(spark, sf)
    // the zip_with+aggregate form the codegen'd kernel replaced — same
    // planes, same fold order, same promotion
    val hof = (0 until 8).map { p =>
      val plane = array((1 to 64).map(i =>
        lit(graft.functions.LshBandSignature.planeSign(p, i))): _*)
      val dot = aggregate(
        zip_with(col("embedding"), plane, (x, y) => x * y),
        lit(0.0), (acc, v) => acc + v)
      when(dot >= 0, lit(1L << p)).otherwise(lit(0L))
    }.reduce(_ + _)
    val q = e.select(hof.as("a"), expr("lsh_band_sig(embedding, 0, 8)").as("b"))
    assert(q.filter(col("a") =!= col("b")).count() == 0,
      "fused kernel must reproduce the HOF signature bit-for-bit")
    val plan = graft.operators.Similarity.qSim2(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("lshbandsignature") || plan.contains("lsh_band_sig"),
      s"signature must come from the fused kernel:\n$plan")
  }

  test("IVF append: new vectors join the durable index via a delta-sized job") {
    import org.apache.spark.sql.functions._
    import graft.operators.Similarity
    // isolated index root: appends must not pollute the shared durable
    // index other tests (and the oracle queries) probe
    val prevRoot = sys.props.get("graft.ivf.root")
    sys.props("graft.ivf.root") = java.nio.file.Files
      .createTempDirectory(java.nio.file.Paths.get("target"), "ivf-append").toString
    try {
      // a new vector with EXACTLY query 5's embedding: after the append it
      // must surface as query 5's top-1 neighbor at similarity 1.0
      val delta = graft.core.Tables.embeddings(spark, sf)
        .where(col("vec_id") === 5)
        .select(lit(900001L).as("vec_id"), col("embedding"))
      val idx = Similarity.IvfIndex.append(spark, sf, lloydIters = 0, delta, cells = 8)
      val top = Similarity.IvfIndex.probe(spark, sf, idx, nprobe = 8, topK = 1)
        .where(col("q_id") === 5).head()
      assert(top.getLong(top.fieldIndex("n_id")) == 900001L &&
        top.getDouble(top.fieldIndex("sim")) == 1.0,
        s"appended twin must be query 5's exact top-1: $top")
      // the refreshed assignment still reads only index files
      val files = idx.assigned.queryExecution.analyzed.collect {
        case l: org.apache.spark.sql.execution.datasources.LogicalRelation =>
          l.relation.asInstanceOf[org.apache.spark.sql.execution.datasources
            .HadoopFsRelation].location.inputFiles.toSeq
      }.flatten
      assert(files.nonEmpty && files.forall(_.contains("ivf-append")),
        s"assignment must read the appended durable index: ${files.take(3)}")
      // the int8 lane followed the append, row-aligned: the twin is in the
      // quantized assignment with EXACTLY vector 5's quantization (the
      // frozen-scale quantizer is deterministic, so identical floats give
      // identical TINYINT vectors)
      def qvOf(id: Long): Seq[Byte] = idx.qassigned
        .where(col("vec_id") === id).select("qv").head().getSeq[Byte](0)
      assert(qvOf(900001L) == qvOf(5L),
        "appended twin must carry vector 5's exact int8 quantization")
    } finally {
      prevRoot match {
        case Some(p) => sys.props("graft.ivf.root") = p
        case None    => sys.props.remove("graft.ivf.root")
      }
    }
  }

  test("LSH plane width is tunable: a coarser width only adds pairs") {
    import graft.operators.Similarity
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val p8 = pairs(Similarity.qSim2(spark, sf))
    val p4 = pairs(Similarity.lshPairs(spark, sf, planes = 4))
    // width p buckets on the first p bits of the same signature family, so
    // every pair co-bucketed at width 8 is co-bucketed at width 4
    assert(p8.subsetOf(p4),
      s"width-8 pairs lost at width 4: ${(p8 -- p4).take(5)}")
  }

  test("IVF probe plan carries no centroid text, and K=256 builds without blowup") {
    import graft.operators.Similarity
    val idx = Similarity.IvfIndex.build(spark, sf, lloydIters = 0)
    val q = Similarity.IvfIndex.probe(spark, sf, idx)
    q.collect()
    val plan = q.queryExecution.executedPlan.toString
    // pre-fix the plan embedded K separate cosine_sim(embedding, <K×dim
    // literal array>) calls; now the quantizer is ONE registered expression
    // over a driver-held matrix
    assert(!plan.contains("named_struct"),
      s"probe plan must not inline centroid structs:\n$plan")
    assert(!plan.contains("cosine_sim(embedding, ["),
      "probe plan must not inline centroid arrays")
    assert(plan.contains("ivfrankcells") || plan.contains("ivf_cells_"),
      s"cell ranking must come from the bound expression:\n$plan")
    // K=256: with literal SQL this was megabytes of plan text and K codegen'd
    // loops; with the bound expression plan size is O(1) in K
    val big = Similarity.IvfIndex.build(spark, "/root/testdata/sf0.01",
      lloydIters = 0, cells = 256)
    assert(big.cents.length > 200, "build must produce the requested quantizer")
    val bigProbe = Similarity.IvfIndex.probe(spark, "/root/testdata/sf0.01", big)
    assert(bigProbe.collect().nonEmpty)
    val bigPlan = bigProbe.queryExecution.executedPlan.toString
    assert(bigPlan.length < 100000,
      s"K=256 probe plan blew up: ${bigPlan.length} chars")
  }

  test("a crashed holder's stale index lock is taken over, not fatal") {
    import org.apache.spark.sql.functions._
    import graft.operators.Similarity
    val prevRoot = sys.props.get("graft.ivf.root")
    val tmpRoot = java.nio.file.Files
      .createTempDirectory(java.nio.file.Paths.get("target"), "ivf-stale")
    sys.props("graft.ivf.root") = tmpRoot.toString
    try {
      Similarity.IvfIndex.build(spark, sf, lloydIters = 0, cells = 8)
      // simulate a holder that died mid-mutation: a lock file with an
      // ancient timestamp next to the published index dir
      import scala.jdk.CollectionConverters._
      val idxDir = java.nio.file.Files.list(tmpRoot).iterator().asScala
        .find(_.getFileName.toString.startsWith("v")).get
      val lock = tmpRoot.resolve(idxDir.getFileName.toString + ".lock")
      java.nio.file.Files.writeString(lock, "0")
      // append must take the stale lock over (no 60 s spin-then-throw)
      val delta = graft.core.Tables.embeddings(spark, sf)
        .where(col("vec_id") === 1)
        .select(lit(920001L).as("vec_id"), col("embedding"))
      val idx = Similarity.IvfIndex.append(spark, sf, lloydIters = 0, delta, cells = 8)
      assert(idx.assigned.where(col("vec_id") === 920001L).count() == 1,
        "append must succeed after taking over the stale lock")
      assert(!java.nio.file.Files.exists(lock), "lock must be released")
    } finally {
      prevRoot match {
        case Some(p) => sys.props("graft.ivf.root") = p
        case None    => sys.props.remove("graft.ivf.root")
      }
    }
  }

  test("concurrent IVF builds race safely: one atomic publish wins, both serve it") {
    import graft.operators.Similarity
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val prevRoot = sys.props.get("graft.ivf.root")
    val tmpRoot = java.nio.file.Files
      .createTempDirectory(java.nio.file.Paths.get("target"), "ivf-race")
    sys.props("graft.ivf.root") = tmpRoot.toString
    try {
      // two sessions → two cache keys → both threads run loadOrBuild and
      // race the rename; the loser must discard its staging dir and load
      // the winner's index
      val (s1, s2) = (spark.newSession(), spark.newSession())
      val fs = Seq(s1, s2).map(s => Future {
        Similarity.IvfIndex.probe(s, sf,
          Similarity.IvfIndex.build(s, sf, lloydIters = 0, cells = 8),
          nprobe = 2, topK = 2).collect().map(_.toString).toSeq
      })
      val results = fs.map(Await.result(_, 5.minutes))
      assert(results(0) == results(1), "racing builders must serve one index")
      // exactly one published index, zero staging leftovers
      import scala.jdk.CollectionConverters._
      val dirs = java.nio.file.Files.list(tmpRoot).iterator().asScala
        .map(_.getFileName.toString).toSeq
      assert(dirs.count(_.startsWith("v")) == 1 &&
        !dirs.exists(_.contains(".tmp-")),
        s"publish must be atomic, staging cleaned: $dirs")
    } finally {
      prevRoot match {
        case Some(p) => sys.props("graft.ivf.root") = p
        case None    => sys.props.remove("graft.ivf.root")
      }
    }
  }

  test("IVF cell count is tunable: probing every cell reproduces exact brute force") {
    import graft.operators.Similarity
    val idx = Similarity.IvfIndex.build(spark, sf, lloydIters = 0, cells = 8)
    val viaIvf = Similarity.IvfIndex.probe(spark, sf, idx, nprobe = 8, topK = 3)
      .collect().map(_.toString).toSeq
    val brute = Similarity.qSim1(spark, sf).collect().map(_.toString).toSeq
    assert(viaIvf == brute,
      "nprobe = cells must degrade IVF to the exact brute-force result")
  }

  test("Q-M4 raw merge: canonical hashing below the join, no UDF barrier") {
    val q = graft.operators.RawMerge.qM4(spark, sf)
    q.collect()
    val plan = q.queryExecution.executedPlan.toString
    // the JSON kernels are codegen'd expressions, not UDF barriers
    assert(!plan.contains("ScalaUDF"), "raw merge must not use UDFs")
    assert(plan.contains("jsondockeys"),
      s"the parse-once struct kernel must drive the merge keys:\n$plan")
    // the key match is an equi-join: hash-shuffled on the merge key at scale,
    // or broadcast when AQE sees a small target — never a nested loop
    assert(plan.contains("BroadcastHashJoin") ||
      plan.contains("Exchange hashpartitioning(__id"),
      s"merge must equi-join on the key:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"),
      s"merge join degenerated to a nested loop:\n$plan")
  }

  test("Q-J7 bucketed co-join: no shuffle above either scan, bucketed reads") {
    val q = graft.operators.Bucketing.qJ7(spark, sf)
    q.collect()
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("Bucketed: true"),
      s"scans must read bucketed tables:\n$plan")
    val shuffles = plan.linesIterator.filter(l =>
      l.contains("Exchange") && !l.contains("BroadcastExchange")).toSeq
    assert(shuffles.forall(_.contains("rangepartitioning")),
      s"join+agg must be shuffle-free (only the ORDER BY range exchange is allowed):\n${shuffles.mkString("\n")}")
  }

  test("Q-A6 pivot: declared values -> single scan, partial agg before shuffle") {
    val q = Relational.qA6(spark, sf)
    val plan = q.queryExecution.executedPlan.toString
    val aggs = plan.linesIterator.filter(_.contains("HashAggregate")).toSeq
    assert(aggs.exists(_.contains("partial_")),
      s"pivot agg must combine map-side:\n${aggs.mkString("\n")}")
    // declared value list means no second job to discover distinct values:
    // exactly one scan of events in the plan
    assert(plan.linesIterator.count(_.contains("Scan parquet")) == 1,
      "pivot must scan the table once")
  }

  test("Q-D7 bounded exact near-dup: bounded side broadcasts, corpus streams map-only") {
    val q = graft.operators.Dedup.qD7(spark, sf)
    q.collect()
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastExchange"),
      "the declared-bound side must broadcast (qSim1 shape)")
    // the corpus side must never shuffle: the only non-broadcast exchange is
    // the final ORDER BY range partitioning — an unbounded all-pairs join
    // would show a hashpartitioning exchange or an unbroadcast nested loop
    val shuffles = plan.linesIterator.filter(l =>
      l.contains("Exchange") && !l.contains("BroadcastExchange")).toSeq
    assert(shuffles.forall(_.contains("rangepartitioning")),
      s"corpus-side shuffle detected:\n${shuffles.mkString("\n")}")
    // the declared bound must reach the parquet scan
    assert(plan.linesIterator.exists(l =>
      l.contains("PushedFilters") && l.contains("LessThan(vec_id,200)")),
      "a_id < 200 bound must push down to the scan")
  }

  test("Q-D8 LSH near-dup: band-key equi-join, never a nested-loop pair join") {
    val q = graft.operators.Dedup.qD8(spark, sf)
    q.collect()
    val plan = q.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"),
      s"full-corpus near-dup must equi-join on band keys:\n$plan")
  }

  test("Q-D4 signature pass is fused and map-only; verify stays candidate-bounded") {
    val q = graft.operators.Dedup.qD4(spark, sf)
    q.collect()
    // only the final adaptive plan executes — drop the re-printed initial one
    val plan = q.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    // the fused MinhashSig kernel replaced the explode → md5 → partial-agg
    // signature shape: no gram explode and no aggregation may appear below
    // the band join — the signature is a map-only projection
    assert(plan.linesIterator.count(_.contains("Generate explode(g#")) == 0,
      s"gram explode must be fused into the kernel:\n$plan")
    assert(plan.contains("minhashsig") || plan.contains("minhash_sig"),
      s"signature must come from the fused kernel:\n$plan")
    // the band self-join is DECLARED merge (an O(corpus) frame must never
    // be a broadcast build side), which also makes both sides identical
    // shuffle subtrees: ReuseExchange computes the signature pass once
    assert(plan.contains("ReusedExchange"),
      "the second band side must reuse the signature shuffle, not recompute it")
    // the Jaccard verify must not re-tokenize the corpus: every documents
    // scan beyond the signature one feeds a broadcast join, with
    // word_shingles projected ABOVE the join (matched rows only)
    val docScans = plan.linesIterator.count(l =>
      l.contains("Scan parquet") && l.contains("documents"))
    assert(docScans <= 3, s"expected <=3 documents scans (1 sig + 2 verify), saw $docScans")
  }

  test("Q-D6 verifies before deduplicating: distinct runs on surviving pairs") {
    val plan = graft.operators.Dedup.qD6(spark, sf)
      .queryExecution.executedPlan.toString
    // ham is computed+filtered below the distinct, so the distinct aggregate
    // keys include ham (pre-fix they were (a_id, b_id, sa, sb) pre-filter)
    assert(plan.linesIterator.exists(l =>
      l.contains("HashAggregate") && l.contains("ham")),
      "distinct must key on the post-filter (a_id, b_id, ham) rows")
  }

  test("classifyAll: one src-tgt join feeds counters, sink, and verification") {
    import org.apache.spark.sql.functions.col
    graft.functions.GraftFunctions.register(spark)
    import spark.implicits._
    val src = (0 until 50).map(i => s"""{"id":"d$i","pk":"p${i % 3}","v":$i}""").toDF("raw")
    val tgt = (0 until 40).map(i => s"""{"id":"d$i","pk":"p${i % 3}","v":${i % 7}}""").toDF("raw")
    val all = graft.operators.RawMerge.classifyAll(spark, src, tgt, Seq("/pk"))
      .cache() // as the orchestrator holds it
    all.collect()
    // AQE re-prints the pre-adaptive plan after "== Initial Plan ==" — only
    // the final plan executes, so count joins there alone
    val plan = all.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    val joins = plan.linesIterator.count(l =>
      l.contains("SortMergeJoin") || l.contains("ShuffledHashJoin") ||
        l.contains("BroadcastHashJoin"))
    assert(joins == 1, s"classifyAll must run exactly one merge join:\n$plan")
    // the expected-state derivation adds NO join on top of the shared frame
    val expected = graft.operators.RawMerge.mergedStateOf(
      all, Seq("/pk"), sanitize = false)
    // the live portion of the plan reads the cache; the InMemoryRelation
    // node only re-prints its stored build plan (which holds the one join)
    val eplan = expected.queryExecution.optimizedPlan.toString
    assert(!eplan.split("InMemoryRelation").head.contains("Join"),
      s"verification must not re-join:\n$eplan")
    // state correctness of the single pass: mirrors the two-join result
    val viaTwo = graft.operators.RawMerge.mergedState(spark, src, tgt, Seq("/pk"))
    assert(expected.select("raw").collect().map(_.getString(0)).sorted.toSeq ==
      viaTwo.select("raw").collect().map(_.getString(0)).sorted.toSeq)
    assert(all.filter(col("action") === "target").count() == 0 &&
      all.filter(col("action") === "update").count() > 0)
    all.unpersist()
  }

  test("Q-J8 skewed join: shuffle join (never broadcast) and AQE splits the hot key") {
    // Multi-file copy of the inputs: AQE's skew split subdivides a reduce
    // partition by MAPPER ranges, so a split needs >1 map task feeding the
    // shuffle. At 100 TB any table is thousands of files; the single-file
    // test parquet (one row group → one mapper) is the artifact, so the spec
    // recreates the realistic layout.
    val dir = "target/skew-sf"
    graft.core.Tables.events(spark, "/root/testdata/sf0.01").repartition(8)
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    graft.core.Tables.orders(spark, "/root/testdata/sf0.01").repartition(4)
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val conf = spark.conf
    val keys = Seq(
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.coalescePartitions.minPartitionSize",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.forceOptimizeSkewedJoin")
    val saved = keys.map(k => k -> conf.getOption(k))
    try {
      // cluster-scale thresholds scaled to the test SF: the ~90%-of-events
      // hot partition stands in for the multi-GB partition a 1000-executor
      // run would see (same trick as SkewSpec). minPartitionSize must scale
      // with the advisory size (its 1 MB default would forbid sub-2k splits),
      // and the per-key agg above the join reuses the join's partitioning,
      // which makes AQE skip the free split — forceOptimizeSkewedJoin is the
      // declared 100 TB posture for this shape: one extra
      // key-cardinality-sized post-agg exchange buys splitting the multi-GB
      // hot partition.
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "2k")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "2k")
      conf.set("spark.sql.adaptive.coalescePartitions.minPartitionSize", "1k")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2.0")
      conf.set("spark.sql.adaptive.forceOptimizeSkewedJoin", "true")
      val q = Joins.qJ8(spark, dir)
      val got = q.collect().map(_.toString).toSeq
      val plan = q.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"),
        s"both sides are fact-scale — the join must shuffle, not broadcast:\n$plan")
      assert(plan.contains("skew=true") || plan.contains("skewed"),
        s"AQE skew-join split must fire on the hot key:\n$plan")
      // the split must not change the result
      val want = Joins.qJ8(spark, "/root/testdata/sf0.01").collect().map(_.toString).toSeq
      assert(got == want, "skew-split result must match the single-file run")
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None)    => conf.unset(k)
    }
  }

  test("Q-J9 as-of join plans as union+window: one key shuffle, never a range/nested-loop join") {
    val q = Joins.qJ9(spark, sf)
    q.collect()
    val plan = q.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct") && !plan.contains("SortMergeJoin"),
      s"as-of must be the union+window shape, not a join:\n$plan")
    assert(plan.contains("Window"), "the as-of pick must be a window function")
    // exchanges: the right-side (custkey, date) dedup agg (partial-combined,
    // one row per key-date after the map side), the key partitioning for
    // the window, and the final ORDER BY — nothing else
    val shuffles = plan.linesIterator.filter(l =>
      l.contains("Exchange") && !l.contains("BroadcastExchange")).toSeq
    assert(shuffles.forall(l =>
      l.contains("hashpartitioning(k") || l.contains("rangepartitioning") ||
        l.contains("hashpartitioning(o_custkey")),
      s"unexpected exchange in the as-of plan:\n${shuffles.mkString("\n")}")
  }

  test("Q-A7 TPC-H Q3 shape: filtered dim broadcasts, dates push down, top-k not global sort") {
    val q = Relational.qA7(spark, sf)
    q.collect()
    val plan = q.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
    assert(plan.contains("BroadcastHashJoin"),
      s"the segment-filtered customer side must broadcast:\n$plan")
    assert(plan.linesIterator.exists(l => l.contains("PushedFilters") &&
      (l.contains("LessThan(o_orderdate") || l.contains("GreaterThan(l_shipdate"))),
      "date predicates must reach the parquet scans")
    assert(plan.contains("TakeOrderedAndProject"),
      "final top-10 must be top-k, not a global sort")
  }

  test("Q-J10 banded range join: equi-join on the band, never a nested loop") {
    val q = Joins.qJ10(spark, sf)
    q.collect()
    val plan = q.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"),
      s"a pure range predicate must band into an equi-join:\n$plan")
    assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"),
      s"band key must drive a shuffle equi-join:\n$plan")
  }

  test("Q-MM metadata-only query never reads the blob column") {
    import graft.operators.Multimodal
    // kind/count over the asset table must prune the blob ('text' backs
    // the bytes column) out of the parquet scan — at 100 TB a metadata
    // query that drags the pixels through the scan is the multimodal
    // anti-pattern (Multimodal.scala's column-pruning contract)
    val q = Multimodal.assets(spark, sf).groupBy("kind").count()
    q.collect()
    val plan = q.queryExecution.executedPlan.toString
    val readSchema = plan.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(readSchema.nonEmpty && !readSchema.contains("text"),
      s"metadata-only query must not scan the blob column: $readSchema")
  }

  test("Q-MM decode is mapPartitions-batched with no encoder-induced exchange") {
    import graft.operators.Multimodal
    // the decode pass itself (no orderBy) must be a NARROW plan: typed
    // mapPartitions over the scan, zero Exchange of blob bytes — one input
    // row fans out executor-side and bytes never cross the network
    for ((name, df) <- Seq(
      "decodeFeatures" -> Multimodal.decodeFeatures(Multimodal.assets(spark, sf)),
      "sampleFrames" -> Multimodal.sampleFrames(Multimodal.assets(spark, sf)),
      "frameFeatures" -> Multimodal.frameFeatures(
        Multimodal.gifAssets(spark, sf), Multimodal.GifFrameDecoder),
      "keyframes" -> Multimodal.keyframes(
        Multimodal.gifAssets(spark, sf), Multimodal.GifFrameDecoder),
      "audioVad" -> Multimodal.audioVad(
        Multimodal.wavAssets(spark, sf), Multimodal.WavDecoder),
      "sampleY4mFrames" -> Multimodal.sampleY4mFrames(
        Multimodal.y4mAssets(spark, sf), Multimodal.FrameSampleStride),
      "mp4Meta" -> Multimodal.mp4Meta(Multimodal.mp4Assets(spark, sf)),
      "mp4KeyframeMap" ->
        Multimodal.mp4KeyframeMap(Multimodal.mp4Assets(spark, sf)),
      "mkvMeta" -> Multimodal.mkvMeta(Multimodal.mkvAssets(spark, sf)),
      "mkvKeyframeMap" ->
        Multimodal.mkvKeyframeMap(Multimodal.mkvAssets(spark, sf)),
      "mp3Meta" -> Multimodal.mp3Meta(Multimodal.mp3Assets(spark, sf)),
      "flacMeta" -> Multimodal.flacMeta(Multimodal.flacAssets(spark, sf)),
      "warcRecordMap" ->
        graft.operators.Warc.warcRecordMap(
          graft.operators.Warc.warcAssets(spark, sf)),
      "warcHttpMap" ->
        graft.operators.Warc.warcHttpMap(
          graft.operators.Warc.warcAssets(spark, sf)),
      "tarMemberMap" ->
        graft.operators.Tar.tarMemberMap(
          graft.operators.Tar.tarAssets(spark, sf)),
      "sniffProfile" ->
        graft.operators.Profile.sniffProfile(
          graft.operators.Profile.mixedAssets(spark, sf)))) {
      df.collect()
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("MapPartitions"),
        s"$name must run as batched mapPartitions:\n$plan")
      assert(!plan.contains("Exchange"),
        s"$name must not shuffle blob bytes:\n$plan")
    }
    // the full query adds EXACTLY the deterministic-output sort — a range
    // exchange over the small feature rows, never the blobs
    val q = Multimodal.qMm1(spark, sf)
    q.collect()
    val full = q.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
    val exchanges = full.linesIterator.filter(l =>
      l.contains("Exchange") && !l.contains("InMemory")).toSeq
    assert(exchanges.forall(_.contains("rangepartitioning")),
      s"q_mm1 may only range-partition its feature rows:\n${exchanges.mkString("\n")}")
  }

  test("Q-D10 blocking join shuffles on the block key, never cartesian") {
    val q = graft.operators.Dedup.qD10(spark, sf)
    q.collect()
    val plan = q.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"block-key candidate join must be an equi-join:\n$plan")
  }

  test("Q-D11 edit verify is candidate-bounded: bare pairs broadcast, banded DP") {
    val q = graft.operators.Dedup.qD11(spark, sf)
    q.collect()
    val plan = q.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
    // the candidate pairs broadcast into documents (qD4's forward-flow
    // verify shape) — the corpus text is never the build side
    assert(plan.contains("BroadcastHashJoin"),
      s"candidate pairs must broadcast into documents:\n$plan")
    // the threshold form of levenshtein (banded O(len*k) DP) is in the
    // plan, not the O(len^2) full form
    assert(plan.contains("levenshtein") && plan.contains("Some(30)"),
      s"edit distance must run the threshold-banded form:\n$plan")
    // the qD6 candidate pipeline must appear ONCE: the chained-broadcast
    // shape computes candidates a single time, where the old two-sided
    // join recomputed the whole simhash + band join per text fetch. One
    // qD6 instance carries exactly 2 band generators (`stack(3, ...)` on
    // its a/b sides); a duplicated pipeline shows 4.
    val bandGenerators = "Generate stack\\(3".r.findAllIn(plan).length
    assert(bandGenerators <= 2,
      s"candidate generation duplicated ($bandGenerators band generators):\n$plan")
  }

  test("Q-T11 decontamination: eval grams broadcast, corpus streams map-only") {
    val q = graft.operators.TextAnalysis.qT11(spark, sf)
    q.collect()
    val plan = q.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
    // the eval-set gram join must be a broadcast hash join (corpus streams
    // through it map-only) — never a shuffle of the corpus gram stream on
    // the gram string, and never any nested-loop/cartesian shape
    assert(plan.contains("BroadcastHashJoin"),
      s"eval grams must broadcast:\n$plan")
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"decontamination join must be an equi-join:\n$plan")
    // gram-keyed exchanges: exactly ONE (the EVAL side's distinct —
    // eval-set-sized, feeding the broadcast). The corpus gram stream must
    // reach the join exchange-free; its only shuffles are post-join
    // match-sized doc_id aggregations. A second bare-gram exchange would
    // mean the corpus-sized gram stream went through the wire.
    val gramOnly = plan.linesIterator
      .filter(l => l.contains("Exchange hashpartitioning") &&
        l.contains("gram") && !l.contains("doc_id")).toSeq
    assert(gramOnly.size <= 1,
      s"corpus grams must not shuffle on the gram string:\n${gramOnly.mkString("\n")}")
  }

  test("Q-T12 repetition: token counts map-side combine, one doc-keyed agg") {
    val q = graft.operators.TextAnalysis.qT12(spark, sf)
    q.collect()
    val plan = q.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
    val aggs = plan.linesIterator.filter(_.contains("HashAggregate")).toSeq
    assert(aggs.exists(_.contains("partial_")),
      s"token counting must map-side combine:\n${aggs.mkString("\n")}")
    // no window operator: total and top term come from the same doc-keyed
    // aggregation (min(struct(-c, t))), not a second pass
    assert(!plan.contains("Window"),
      s"top-term pick must not need a window pass:\n$plan")
  }

  test("Q-T9 tf-idf: partial agg before the tf shuffle, window stays partitioned") {
    val q = graft.operators.TextAnalysis.qT9(spark, sf)
    q.collect()
    val plan = q.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
    val aggs = plan.linesIterator.filter(_.contains("HashAggregate")).toSeq
    assert(aggs.exists(_.contains("partial_")),
      s"tf aggregation must map-side combine:\n${aggs.mkString("\n")}")
    // the top-3 window partitions by doc_id — no single-partition window
    // (an empty PARTITION BY would serialize the corpus through one task)
    val windows = plan.linesIterator.filter(_.contains("Window")).toSeq
    assert(windows.forall(!_.contains("SinglePartition")),
      s"per-doc ranking must not use a global window:\n${windows.mkString("\n")}")
  }

  test("Q-W6 interval merge reuses ONE exchange for both window passes") {
    val q = graft.operators.Windows.qW6(spark, sf)
    q.collect()
    val plan = q.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
    // both windows + the island aggregation hash-partition on o_custkey;
    // allowed exchanges: one hashpartitioning(o_custkey) (+ the final
    // deterministic-output range sort)
    val hashEx = plan.linesIterator.filter(l =>
      l.contains("Exchange hashpartitioning")).toSeq
    assert(hashEx.size <= 1,
      s"window passes must share one customer exchange:\n${hashEx.mkString("\n")}")
  }

  test("q_x8 sessionization: both window passes and the session agg share one user exchange") {
    val q = graft.operators.Windows.qX8(spark, sf)
    q.collect()
    val plan = q.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
    // lag, the running break-sum, and the (user_id, sess) aggregation all
    // partition by user_id: allowed hash exchanges are that ONE, plus the
    // metadata-sized histogram regroup on events_n
    val hashEx = plan.linesIterator.filter(l =>
      l.contains("Exchange hashpartitioning")).toSeq
    assert(hashEx.size <= 2 &&
        hashEx.count(_.contains("user_id")) <= 1,
      s"sessionization must reuse one user exchange:\n${hashEx.mkString("\n")}")
    val windows = plan.linesIterator.filter(_.contains("Window")).toSeq
    assert(windows.forall(!_.contains("SinglePartition")),
      s"session windows must not serialize through one task:\n${windows.mkString("\n")}")
  }

  test("q_d12 chunk dedup shuffles hashes, never text") {
    val q = graft.operators.Dedup.qD12(spark, sf)
    q.collect()
    val plan = q.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
    // the (doc_id, md5) projection must happen BELOW both exchanges: a
    // text-carrying shuffle would move the whole corpus twice
    val exchanges = plan.linesIterator.filter(_.contains("Exchange")).toSeq
    assert(exchanges.nonEmpty)
    assert(exchanges.forall(l => !l.contains("text")),
      s"chunk text must not cross an exchange:\n${exchanges.mkString("\n")}")
  }

  test("q_sim7 centroid assignment is map-only: no join, label-sized exchanges only") {
    val q = graft.operators.Similarity.qSim7(spark, sf)
    q.collect()
    val plan = q.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
    // the centroid matrix is a driver-side literal, so the returned plan
    // must assign via pure projection: corpus scan -> transform/array_max
    // -> label rollup; no join operator, and the only exchanges are the
    // classes-sized label agg + the final ORDER BY
    assert(!plan.contains("Join"), s"assignment must not join:\n$plan")
    val exchanges = plan.linesIterator.filter(_.contains("Exchange")).toSeq
    assert(exchanges.size <= 2,
      s"only the label rollup + sort may exchange:\n${exchanges.mkString("\n")}")
  }

  test("q_mm9 image-hash dedup shuffles 5-long hash rows, never image bytes") {
    val q = graft.operators.Multimodal.qMm9(spark, sf)
    q.collect()
    val plan = q.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
    val exchanges = plan.linesIterator.filter(_.contains("Exchange")).toSeq
    assert(exchanges.nonEmpty)
    assert(exchanges.forall(l => !l.contains("bytes")),
      s"decoded blobs must stay on their executor:\n${exchanges.mkString("\n")}")
  }

  test("q_mm13 JPEG lane: decode error within declared headroom, every level recovered") {
    import graft.operators.Multimodal
    // the oracle's decision margin is ±8 gray units; pin 2× headroom (≤ 4)
    // on the MEASURED mean round-trip error of every canvas, so a codec
    // drift shows up here long before it could flip an oracle level
    val rows = Multimodal.pixelFeatures(
      Multimodal.jpegAssets(spark, sf), Multimodal.ImageIoDecoder).collect()
    assert(rows.length == 200, s"all JPEG blobs must decode: ${rows.length}")
    for (r <- rows) {
      val id = r.getAs[Long]("asset_id")
      val g = Multimodal.jpegLevel(id) * 16 + 24
      val avg = r.getAs[Long]("px_sum").toDouble / (8 * 8 * 3)
      assert(math.abs(avg - g) <= 4.0,
        s"asset $id: decoded mean $avg vs encoded $g exceeds headroom")
    }
    val lv = Multimodal.qMm13(spark, sf).collect()
    assert(lv.length == 200 && lv.forall(r =>
      r.getAs[Long]("lvl") == Multimodal.jpegLevel(r.getAs[Long]("asset_id"))),
      "recovered levels must replay the closed form")
  }

  test("q_mm13 adversarial boundary canvas: fold direction deterministic, error contract holds at the level edge") {
    import graft.operators.Multimodal
    // production canvases sit at g = lvl*16 + 24 — the MIDPOINT between
    // decision boundaries (…32, 48…), 8 gray units of margin each way.
    // This canvas sits ON the boundary (g = 32, the lvl 0/1 edge): the
    // worst case a drifted JDK decoder would hit first. Pinned here:
    // (a) the ±4 mean-error contract holds even at the edge, (b) decode
    // is bit-deterministic (same blob → same samples), and (c) the fold
    // of the integer formula is floor-division's — computed from the
    // DECODED sum, with no rounding ambiguity the engine could introduce.
    // A JDK upgrade that grows decode error past the contract fails THIS
    // spec loudly instead of silently flipping a production oracle level.
    val side = 8
    val g = 32 // exact decision boundary between lvl 0 and lvl 1
    val img = new java.awt.image.BufferedImage(
      side, side, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until side; x <- 0 until side)
      img.setRGB(x, y, (g << 16) | (g << 8) | g)
    val bos = new java.io.ByteArrayOutputStream()
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("jpeg").next()
    val p = writer.getDefaultWriteParam
    p.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
    p.setCompressionQuality(0.95f)
    val out = new javax.imageio.stream.MemoryCacheImageOutputStream(bos)
    try {
      writer.setOutput(out)
      writer.write(null, new javax.imageio.IIOImage(img, null, null), p)
    } finally { writer.dispose(); out.close() }
    val blob = bos.toByteArray
    val d1 = Multimodal.ImageIoDecoder.decode(blob).get
    val d2 = Multimodal.ImageIoDecoder.decode(blob).get
    assert(java.util.Arrays.equals(d1.samples, d2.samples),
      "decoding the same blob twice must be bit-identical")
    val n = d1.width * d1.height * d1.channels
    val sum = d1.samples.map(_.toLong).sum
    val mean = sum.toDouble / n
    assert(math.abs(mean - g) <= 4.0,
      s"boundary canvas decoded mean $mean vs encoded $g exceeds the " +
        "error contract — the JDK decoder drifted; re-audit qMm13's oracle")
    // the fold: floor division of the decoded integer mean — exact
    // boundary folds UP (mean 32.0 → lvl 1), anything below folds DOWN.
    // Restated from first principles so an engine-side rounding change
    // (e.g. DIV → round-half-up) would diverge here
    val lvl = ((sum / n) - 16) / 16
    val expected = if (sum / n >= 32) 1L else 0L
    assert(lvl == expected,
      s"fold direction changed: decoded integer mean ${sum / n} → lvl $lvl")
  }

  test("q_t28 BPE pairs: vocabulary-sized pair stage, map-side combine, TakeOrdered top-20") {
    val q = graft.operators.TextAnalysis.qT28(spark, sf)
    q.collect()
    val plan = q.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
    assert(plan.contains("TakeOrderedAndProject"),
      s"top-20 must be a TakeOrdered, never a global sort:\n$plan")
    assert(!plan.contains("Sort ") || plan.contains("TakeOrdered"),
      s"no global sort allowed:\n$plan")
    // both aggregations (word-frequency, pair mass) must partial-aggregate
    // before their exchanges — the token stream reduces map-side
    val aggs = plan.linesIterator.filter(_.contains("HashAggregate")).toSeq
    assert(aggs.count(_.contains("partial")) >= 2,
      s"both stages must map-side combine:\n${aggs.mkString("\n")}")
  }

  test("q_t29 bigram LM: native pairing kernel in codegen, map-combined reduce, equal to the HOF form") {
    val q = graft.operators.TextAnalysis.qT29(spark, sf)
    q.collect()
    val plan = q.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
    assert(!plan.contains("Window") && !plan.contains("CartesianProduct"),
      s"bigram scoring is joins + aggs only:\n$plan")
    // the (doc, bigram) tf frame, the bigram table, the left-unigram table
    // and the per-doc rollup must all partial-aggregate before exchanging —
    // the token stream reduces map-side everywhere
    val aggs = plan.linesIterator.filter(_.contains("HashAggregate")).toSeq
    assert(aggs.count(_.contains("partial")) >= 3,
      s"bigram stages must map-side combine:\n${aggs.mkString("\n")}")
    // the pairing runs in the WordBigrams kernel INSIDE a codegen span —
    // the interpreted-HOF formulation de-codegens the scan projection
    assert(plan.linesIterator.exists(l =>
        l.contains("wordbigrams") && l.contains("*(")),
      s"word_bigrams fell out of codegen:\n$plan")
    // and the kernel is bit-equal to the composable HOF form
    val hof = graft.operators.TextAnalysis.qT29Hof(spark, sf)
    assert(q.collect().map(_.toString).toSeq ==
      hof.collect().map(_.toString).toSeq,
      "word_bigrams kernel must replay the HOF bigram scoring exactly")
  }

  test("q_sim14 IVF-PQ: probes broadcast, candidates from the cached int8 lane, no corpus shuffle-join") {
    val q = graft.operators.Similarity.qSim14(spark, sf)
    q.collect()
    val plan = q.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastNestedLoopJoin"),
      s"probe LUTs must broadcast into the coded corpus:\n$plan")
    assert(plan.contains("InMemoryTableScan"),
      s"codes must encode off the cached int8 assignment, not a corpus rebuild:\n$plan")
    // the only live parquet scan is the tiny probe side (vec_id < 10)
    val live = plan.split("InMemoryRelation").head
    val scans = live.linesIterator.filter(_.contains("FileScan parquet")).toSeq
    assert(scans.forall(_.contains("LessThan(vec_id,10)")),
      s"only the probe-side scan may touch parquet:\n${scans.mkString("\n")}")
  }

  test("q_sim16 rerank: shortlist broadcasts into the vector fetch, no corpus shuffle join") {
    val q = graft.operators.Similarity.qSim16(spark, sf)
    q.collect()
    val plan = q.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
    // stage 2 must be: bounded shortlist BROADCAST into one corpus vector
    // fetch — a shuffle join or a re-ranking of the whole corpus would
    // throw away the refine stage's entire point
    assert(plan.contains("BroadcastHashJoin"),
      s"shortlist must broadcast into the embedding fetch:\n$plan")
    assert(!plan.contains("SortMergeJoin") && !plan.contains("CartesianProduct"),
      s"rerank must never shuffle-join or cross the corpus:\n$plan")
    // the ranking window partitions on q_id — bounded 100-row partitions
    val windows = plan.linesIterator.filter(_.contains("Window")).toSeq
    assert(windows.forall(!_.contains("SinglePartition")),
      s"rerank window must stay partitioned:\n${windows.mkString("\n")}")
  }

  test("q_x9 retention: distinct-then-window, no self-join, metadata rollup") {
    val q = graft.operators.Windows.qX9(spark, sf)
    q.collect()
    val plan = q.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
    // cohort day is a window MIN over the already-reduced (user, day)
    // frame — a join formulation would pass over events twice
    assert(!plan.contains("Join"), s"retention must not self-join:\n$plan")
    val hashEx = plan.linesIterator.filter(_.contains("Exchange hashpartitioning")).toSeq
    assert(hashEx.size <= 3 && hashEx.count(_.contains("user_id")) <= 2,
      s"distinct + user window + rollup only:\n${hashEx.mkString("\n")}")
    val windows = plan.linesIterator.filter(_.contains("Window")).toSeq
    assert(windows.forall(!_.contains("SinglePartition")),
      s"cohort window must stay partitioned:\n${windows.mkString("\n")}")
  }

  test("q_d13 estimator audit: bare pairs broadcast, shingles never on the build side") {
    val q = graft.operators.Dedup.qD13(spark, sf)
    q.collect()
    val plan = q.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
    assert(plan.contains("BroadcastHashJoin"),
      s"candidate pairs must broadcast into documents:\n$plan")
    // qD4's verify contract: broadcast sides carry only (a_id, b_id) —
    // text/shingle-bearing frames meet in an equi-join, never a broadcast
    val bc = plan.linesIterator.filter(_.contains("BroadcastExchange")).toSeq
    assert(bc.nonEmpty && bc.forall(l => !l.contains("text")),
      s"broadcast must be bare pairs:\n${bc.mkString("\n")}")
  }

  test("q_t14 pii scan and q_sim8 norm profile are scan-bound: one agg exchange plus the sort") {
    for (q <- Seq(graft.operators.TextAnalysis.qT14(spark, sf),
        graft.operators.Similarity.qSim8(spark, sf))) {
      q.collect()
      val plan = q.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
      assert(!plan.contains("Join"), s"profile must not join:\n$plan")
      val hashEx = plan.linesIterator.filter(_.contains("Exchange hashpartitioning")).toSeq
      assert(hashEx.size <= 1,
        s"per-row kernel + one rollup only:\n${hashEx.mkString("\n")}")
    }
  }

  test("q_mm10 metadata fast path: header parse is map-only — no shuffle before the sort") {
    val q = graft.operators.Multimodal.qMm10(spark, sf)
    q.collect()
    val plan = q.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
    // geometry comes from 26 header bytes via codegen'd expressions: the
    // plan must show NO aggregation/join and no hash exchange — only the
    // asset generator and the final presentation sort
    assert(!plan.contains("Join") && !plan.contains("HashAggregate"),
      s"metadata parse must not aggregate or join:\n$plan")
    assert(!plan.contains("Exchange hashpartitioning"),
      s"metadata parse must be map-only before the sort:\n$plan")
  }

  test("q_v9 heavy hitters: sketch summaries broadcast, exact side one token exchange") {
    val q = Relational.qV9(spark, sf)
    val rows = q.collect()
    val plan = q.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
    // the MG summaries (≤ 31 rows/partition) and the 1-row total are the
    // broadcast sides; the corpus-sized token stream must never sort-merge
    assert(!plan.contains("SortMergeJoin"),
      s"metadata-sized frames must broadcast, not SMJ:\n$plan")
    assert(plan.contains("BroadcastExchange"),
      s"sketch candidate set must broadcast into the exact side:\n$plan")
    // the guarantee the oracle pins, re-checked here at sf0.001 where the
    // vocabulary (~1000 tokens) far exceeds k-1=31 counters per partition,
    // so decrement rounds demonstrably happened and the bound is exercised
    assert(rows.nonEmpty)
    assert(rows.forall(r => r.getBoolean(2) && r.getBoolean(3)),
      "MG guarantee violated: a true heavy hitter was lost or out of bound")
  }

  test("q_t15 split assignment: no join, rollup + language-sized window only") {
    val q = graft.operators.TextAnalysis.qT15(spark, sf)
    val rows = q.collect()
    val plan = q.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
    assert(!plan.contains("Join"), s"derived split column must not join:\n$plan")
    val hashEx = plan.linesIterator.filter(_.contains("Exchange hashpartitioning")).toSeq
    assert(hashEx.size <= 2,
      s"one rollup + one language-keyed window exchange only:\n${hashEx.mkString("\n")}")
    // every document lands in exactly one split
    val total = rows.map(_.getLong(2)).sum
    val docs = graft.core.Tables.documents(spark, sf).count()
    assert(total == docs, s"split counts $total != corpus $docs")
    assert(rows.map(_.getString(1)).toSet.subsetOf(Set("train", "val", "test")))
  }

  test("q_d14 containment verify: block-key equi-join, containment >= jaccard, supersets q_d10") {
    val q = graft.operators.Dedup.qD14(spark, sf)
    val rows = q.collect()
    val plan = q.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"containment candidate join must be an equi-join:\n$plan")
    // containment >= jaccard pointwise (min(|A|,|B|) <= |A∪B|), and the
    // symmetric-threshold pairs are a subset of the containment pairs
    assert(rows.forall(r => r.getLong(2) >= r.getLong(3)))
    val cont = rows.map(r => (r.getLong(0), r.getLong(1))).toSet
    val d10 = graft.operators.Dedup.qD10(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(d10.subsetOf(cont),
      s"q_d10 pairs missing from containment set: ${d10 -- cont}")
  }

  test("q_sim9 int8 recall: both lanes broadcast bounded probes, corpus streams once each") {
    val q = graft.operators.Similarity.qSim9(spark, sf)
    val rows = q.collect()
    val plan = q.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
    assert(!plan.contains("CartesianProduct"),
      s"probe x corpus must be broadcast-nested-loop on bounded probes, not cartesian:\n$plan")
    assert(plan.contains("BroadcastExchange"),
      s"the 10-probe sides and the 1-row scale must broadcast:\n$plan")
    // the audit's semantic floor: 10 probes, overlap within [0, 10]
    assert(rows.length == 10)
    assert(rows.forall(r => r.getLong(1) >= 0L && r.getLong(1) <= 10L))
  }

  test("q_v10 quality battery: fused lineitem pass, broadcast anti-join RI check") {
    val q = Relational.qV10(spark, sf)
    q.collect()
    val plan = q.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
    // the three lineitem checks fuse into ONE scan
    assert(plan.linesIterator.count(l =>
        l.contains("FileScan") && l.contains("lineitem")) <= 1,
      s"lineitem checks must share one pass:\n$plan")
    // referential integrity: the dim broadcasts under a LEFT ANTI join
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftAnti"),
      s"RI check must broadcast the dim into an anti-join:\n$plan")
    assert(!plan.contains("CartesianProduct"), "1-row stacks must broadcast")
  }

  test("q_w8 spike detection: calendar-sized agg + type-partitioned lag, no join") {
    val q = graft.operators.Windows.qW8(spark, sf)
    q.collect()
    val plan = q.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
    assert(!plan.contains("Join"), s"spike detection must not join:\n$plan")
    val hashEx = plan.linesIterator.filter(_.contains("Exchange hashpartitioning")).toSeq
    assert(hashEx.size <= 2,
      s"one (type, day) agg exchange + one type window exchange:\n${hashEx.mkString("\n")}")
  }

  test("q_w9 robust spike: calendar-sized agg, partitioned bounded window, no join") {
    val q = graft.operators.Windows.qW9(spark, sf)
    q.collect()
    val plan = q.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
    assert(!plan.contains("Join"), s"robust spike detection must not join:\n$plan")
    val hashEx = plan.linesIterator.filter(_.contains("Exchange hashpartitioning")).toSeq
    assert(hashEx.size <= 2,
      s"one (type, day) agg exchange + one type window exchange:\n${hashEx.mkString("\n")}")
    // the collect_list window must stay event_type-partitioned — a global
    // window would single-task the calendar frame
    assert(plan.linesIterator.filter(_.contains("windowspecdefinition"))
      .forall(_.contains("event_type")), s"window must partition by type:\n$plan")
  }

  test("q_a9 correlated-aggregate gate: part dim broadcasts, no cartesian, one row out") {
    val q = graft.operators.Relational.qA9(spark, sf)
    val rows = q.collect()
    val plan = q.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
    assert(!plan.contains("CartesianProduct"), s"gate must stay keyed:\n$plan")
    // the brand-filtered part key set is the semi-join build side
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftSemi"),
      s"pruned part dim must broadcast as a semi-join:\n$plan")
    assert(rows.length == 1)
    val r = rows.head
    // every gated lineitem has quantity >= 1, so qty_sum >= n_small
    assert(r.getLong(0) >= 0L && (r.isNullAt(1) || r.getLong(1) >= r.getLong(0)))
  }

  test("q_d18 substring removal: keyed gram join, one row per document, kept_pm bounds") {
    val q = graft.operators.Dedup.qD18(spark, sf)
    val rows = q.collect()
    val plan = q.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
    assert(!plan.contains("CartesianProduct"),
      s"gram marking must be a keyed equi-join, never all-pairs:\n$plan")
    val nDocs = graft.core.Tables.documents(spark, sf).count()
    assert(rows.length == nDocs, "every document gets a removal verdict")
    rows.foreach { r =>
      val n = r.getLong(1); val cov = r.getLong(2); val kept = r.getLong(3)
      assert(cov >= 0 && cov <= n, s"coverage within [0, n]: $r")
      assert(kept >= 0 && kept <= 1000, s"kept_pm within [0, 1000]: $r")
    }
  }

  test("q_d19 substring clean: keyed joins only, every doc rebuilt, untouched docs round-trip") {
    val q = graft.operators.Dedup.qD19(spark, sf)
    val rows = q.collect()
    val plan = q.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
    assert(!plan.contains("CartesianProduct"),
      s"coverage and rebuild must be keyed joins, never all-pairs:\n$plan")
    val docs = graft.core.Tables.documents(spark, sf)
      .selectExpr("doc_id", "lower(text) AS lt").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(rows.length == docs.size, "every document gets a cleaned form")
    rows.foreach { r =>
      val (n, kept, txt) = (r.getLong(1), r.getLong(2), r.getString(3))
      assert(kept >= 0 && kept <= n, s"kept within [0, n]: $r")
      // the rebuild's content contract: an UNTOUCHED doc (kept == n)
      // round-trips to its lowercased text exactly; a cleaned one is a
      // subsequence with kept-1 joining spaces (empty when kept == 0)
      if (kept == n) assert(txt == docs(r.getLong(0)),
        s"untouched doc ${r.getLong(0)} must round-trip")
      else if (kept == 0L) assert(txt.isEmpty)
    }
    assert(rows.exists(r => r.getLong(2) < r.getLong(1)),
      "fixture corpus must exercise actual removal")
  }

  test("q_t16 leakage audit: test grams broadcast, train gram stream never builds a hash side") {
    val q = graft.operators.TextAnalysis.qT16(spark, sf)
    q.collect()
    val plan = q.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
    // the ~5% test-split gram set is the build side; the train-side gram
    // stream (the corpus-sized frame) must never be exchanged for the join
    assert(plan.contains("BroadcastHashJoin"),
      s"test grams must broadcast into the train stream:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"corpus-sized gram frames must not sort-merge:\n$plan")
  }

  test("q_t17 packing: the prefix sum runs in a language-PARTITIONED window") {
    val q = graft.operators.TextAnalysis.qT17(spark, sf)
    q.collect()
    val plan = q.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
    assert(!plan.contains("Join"), s"packing stats must not join:\n$plan")
    // a global (unpartitioned) window would single-task the corpus — the
    // shard-local design means every window spec carries the lang key
    assert(!plan.contains("WindowExec: No Partition") &&
      plan.linesIterator.filter(_.contains("Window"))
        .forall(l => !l.contains("windowspecdefinition()") ),
      s"window must stay partitioned:\n$plan")
    val hashEx = plan.linesIterator.filter(_.contains("Exchange hashpartitioning")).toSeq
    assert(hashEx.forall(_.contains("lang")),
      s"only language-keyed exchanges expected:\n${hashEx.mkString("\n")}")
  }

  test("Q-J11 NOT IN plans as a broadcast NAAJ, never a nested-loop join") {
    val q = Joins.qJ11(spark, sf)
    q.collect()
    val plan = q.queryExecution.executedPlan.toString
    // BroadcastHashJoinExec prints its isNullAwareAntiJoin flag as the
    // trailing boolean: "... LeftAnti, BuildRight, true"
    assert(plan.contains("LeftAnti, BuildRight, true"),
      s"NOT IN must plan as a null-aware BroadcastHashJoin:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      "the NAAJ optimization must apply — nested-loop consults the whole " +
        s"build side per probe row:\n$plan")
  }

  test("Q-D15 semantic dedup runs off the cached IVF assignment — no corpus pass") {
    val q = graft.operators.Dedup.qD15(spark, sf)
    q.collect()
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("InMemoryTableScan"),
      s"cells must come from the durable index's cached assignment:\n$plan")
    // live plan (before the InMemoryRelation nodes re-print their stored
    // build plans): zero parquet scans — unlike the probe queries there is
    // no query side, so NOTHING may touch parquet here
    val live = plan.split("== Initial Plan ==").head.split("InMemoryRelation").head
    val scans = live.linesIterator.filter(_.contains("FileScan parquet")).toSeq
    assert(scans.isEmpty,
      s"the dedup pass must add zero corpus reads:\n${scans.mkString("\n")}")
  }

  test("Q-T20 unigram model: map-side combine on both aggregation passes") {
    val q = graft.operators.TextAnalysis.qT20(spark, sf)
    q.collect()
    val plan = q.queryExecution.executedPlan.toString
    // tf: partial_count below the (doc_id, w) exchange; doc score:
    // partial_sum below the doc_id exchange — the token stream shuffles once
    assert(plan.contains("partial_count"), s"tf must combine map-side:\n$plan")
    assert(plan.contains("partial_sum"), s"doc score must combine map-side:\n$plan")
    assert(!plan.contains("ScalaUDF"), "floor-log2 must stay in builtin expressions")
  }

  test("Q-T21 BM25: query terms broadcast, top-20 is TakeOrdered, tf combines map-side") {
    val q = graft.operators.TextAnalysis.qT21(spark, sf)
    q.collect()
    val plan = q.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
    assert(plan.contains("BroadcastHashJoin"),
      s"the 3-term query set and (N,T) totals must broadcast:\n$plan")
    assert(plan.contains("TakeOrderedAndProject"),
      s"top-20 must be a TakeOrdered, not a global sort:\n$plan")
    assert(plan.contains("partial_count"),
      s"tf must combine map-side before the (doc_id, w) exchange:\n$plan")
    // the (N, T) totals ride 1-row broadcast crosses (BroadcastNestedLoop
    // Cross over a single-row side — fine at any scale); what must never
    // appear is an unbroadcast cartesian
    assert(!plan.contains("CartesianProduct"),
      s"scoring joins must stay broadcast-shaped:\n$plan")
  }

  test("Q-T24 fuzzy decontamination: eval bands broadcast, no band self-join shuffle") {
    val q = graft.operators.TextAnalysis.qT24(spark, sf)
    q.collect()
    val plan = q.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
    assert(plan.contains("BroadcastHashJoin"),
      s"the benchmark-sized eval band keys must broadcast:\n$plan")
    // unlike qD4's corpus self-join there must be NO sort-merge join at
    // all: the corpus band stream meets only broadcast sides
    assert(!plan.contains("SortMergeJoin"),
      s"corpus bands must never shuffle into a self-join:\n$plan")
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"candidate generation must be an equi-join:\n$plan")
  }

  test("Q-SIM12 range search: probes broadcast, corpus streams with no ranking state") {
    val q = graft.operators.Similarity.qSim12(spark, sf)
    q.collect()
    val plan = q.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
    assert(plan.contains("BroadcastHashJoin") ||
      plan.contains("BroadcastNestedLoopJoin"), // q_id =!= n_id is the only key
      s"the probe side must broadcast:\n$plan")
    assert(!plan.contains("Window"),
      s"radius search must carry no per-query ranking state:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"the corpus must not shuffle for the probe join:\n$plan")
  }

  test("Q-D16 boilerplate: per-doc distinct folds into the first agg, top-20 TakeOrdered") {
    val q = graft.operators.Dedup.qD16(spark, sf)
    q.collect()
    val plan = q.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
    assert(plan.contains("partial_"),
      s"the gram stream must combine map-side before any exchange:\n$plan")
    assert(plan.contains("TakeOrderedAndProject"),
      s"top-20 must be a TakeOrdered, not a global sort:\n$plan")
  }

  test("Q-O2 diversified top-k: language-partitioned window, global top-20 TakeOrdered") {
    val q = graft.operators.Relational.qO2(spark, sf)
    q.collect()
    val plan = q.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
    assert(plan.contains("Window"), s"the per-group cap must be a window:\n$plan")
    // the cap ranks INSIDE each language shard — never an unpartitioned
    // global window (the rank-everything-then-filter trap)
    assert(!plan.contains("Window [row_number() windowspecdefinition(n_chars"),
      s"the window must partition by lang, not rank globally:\n$plan")
    assert(plan.contains("TakeOrderedAndProject"),
      s"the global top-20 must be a TakeOrdered, not a full sort:\n$plan")
  }

  test("Q-D17 dup-gram mass: map-side combine, no join, no window") {
    val q = graft.operators.Dedup.qD17(spark, sf)
    q.collect()
    val plan = q.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
    assert(plan.contains("partial_"),
      s"the gram stream must combine map-side before any exchange:\n$plan")
    assert(!plan.contains("Join"), s"pure aggregation — no join belongs here:\n$plan")
    assert(!plan.contains("Window"), s"no per-row ranking state belongs here:\n$plan")
  }

  test("Q-T25 token spectrum: vocabulary reduces to bins, totals broadcast back") {
    val q = graft.operators.TextAnalysis.qT25(spark, sf)
    q.collect()
    val plan = q.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
    assert(plan.contains("partial_"),
      s"the token stream must combine map-side before any exchange:\n$plan")
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastHashJoin"),
      s"the 1-row totals must broadcast into the bin frame:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"nothing here is big enough to shuffle-join:\n$plan")
  }

  test("Q-SIM13 PQ ADC: codebook is a literal, corpus never shuffle-joins") {
    val q = graft.operators.Similarity.qSim13(spark, sf)
    q.collect()
    val plan = q.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
    // encoding and ADC ride broadcast joins (probes/LUTs are bounded);
    // the corpus side must never build a shuffle join for scoring
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastHashJoin"),
      s"probe LUTs must broadcast into the coded corpus:\n$plan")
    assert(!plan.contains("CartesianProduct"),
      s"no unbounded cartesian belongs in the scoring join:\n$plan")
    for (r <- q.collect()) {
      val f = r.getAs[Long]("overlap_at_10"); val i = r.getAs[Long]("overlap_vs_int8")
      assert(f >= 0 && f <= 10 && i >= 0 && i <= 10, s"overlap out of range: $r")
    }
  }

  test("Q-J12 bloom prejoin: probe filtered below the shuffle join, in codegen") {
    val q = Joins.qJ12(spark, sf)
    q.collect()
    val plan = q.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert(plan.contains("SortMergeJoin"),
      "fact-fact contract: the exact join must be a shuffle join, not broadcast")
    // the probe must run INSIDE a whole-stage-codegen span ("*(n) Filter"),
    // below the exchange — that placement is the whole point of the operator
    val probeLine = plan.linesIterator.find(_.contains("bloommightcontain"))
    assert(probeLine.exists(_.contains("Filter")),
      s"bloom probe must be a Filter on the probe side:\n$plan")
    assert(probeLine.exists(_.contains("*(")),
      s"bloom probe fell out of codegen: ${probeLine.getOrElse("")}")
    val probeIdx = plan.linesIterator.indexWhere(_.contains("bloommightcontain"))
    val joinIdx = plan.linesIterator.indexWhere(_.contains("SortMergeJoin"))
    assert(probeIdx > joinIdx,
      "probe filter must sit below the join (map side of the exchange)")
    // the filter BINDS AS BYTES (GraftColumn.of + addReferenceObj), never as
    // SQL text: every plan representation must be O(1) in dim cardinality.
    // The old hex-literal path put ~2.4 bytes/dim-key into the parsed plan
    // (multi-MB at a 1M-key dim); a 500-hex-char run is the detector.
    val hexRun = "[0-9a-fA-F]{500}".r
    for ((repr, what) <- Seq(
        (q.queryExecution.logical.toString, "parsed/logical"),
        (q.queryExecution.analyzed.toString, "analyzed"),
        (q.queryExecution.optimizedPlan.toString, "optimized"),
        (plan, "executed"))) {
      assert(hexRun.findFirstIn(repr).isEmpty,
        s"$what plan carries the serialized bloom filter as text")
      assert(repr.length < 64 * 1024,
        s"$what plan text not O(1) in dim cardinality: ${repr.length} chars")
    }
  }

  test("Q-O3 weighted sample: TakeOrdered top-k, map-only (no exchange below it)") {
    val q = Relational.qO3(spark, sf)
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      "priority top-20 must be a TakeOrdered, not a global sort")
    assert(!plan.contains("hashpartitioning"),
      s"one corpus pass, zero shuffle:\n$plan")
  }

  test("Q-T19/Q-G4 warm: zero corpus passes — every file source is the dup-cluster artifact") {
    graft.operators.DupClusters.build(spark, sf) // ensure built (idempotent)
    def sources(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.queryExecution.analyzed.collect {
        case l: org.apache.spark.sql.execution.datasources.LogicalRelation =>
          l.relation.asInstanceOf[org.apache.spark.sql.execution.datasources
            .HadoopFsRelation].location.inputFiles.toSeq
      }.flatten
    // graph-only consumers: NOTHING outside the artifact may be read —
    // the qD6 re-mining these queries used to pay is structurally gone
    for ((q, name) <- Seq(
        (graft.operators.TextAnalysis.qT19(spark, sf), "qT19"),
        (graft.operators.Dedup.qG4(spark, sf), "qG4"))) {
      val files = sources(q)
      assert(files.nonEmpty && files.forall(_.contains("dup-index")),
        s"$name warm run must read ONLY the artifact: ${files.filterNot(_.contains("dup-index")).take(3)}")
    }
    // corpus-touching consumers: documents may appear ONLY for the work the
    // query itself defines (split assignment / token accounting), and the
    // artifact must appear — never a signature re-mine (which would read
    // documents through a simhash projection; structural check: each
    // documents scan in the OPTIMIZED plan must not feed simhash32)
    for ((q, name) <- Seq(
        (graft.operators.TextAnalysis.qT18(spark, sf), "qT18"),
        (graft.operators.TextAnalysis.qT26(spark, sf), "qT26"))) {
      val files = sources(q)
      assert(files.exists(_.contains("dup-index")),
        s"$name must consume the artifact")
      assert(files.forall(f => f.contains("dup-index") || f.contains("documents.parquet")),
        s"$name reads unexpected sources: ${files.take(3)}")
      assert(!q.queryExecution.optimizedPlan.toString.contains("simhash32"),
        s"$name must not re-mine signatures from the corpus")
    }
  }

  test("q_mm19/q_mm20 warm: zero decode passes — every file source is a " +
    "durable index artifact (the mm family bridge, VERDICT r14 task 2)") {
    graft.operators.MmIvf.build(spark, sf) // ensure built (idempotent)
    graft.operators.DupClusters.build(spark, sf)
    def sources(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.queryExecution.analyzed.collect {
        case l: org.apache.spark.sql.execution.datasources.LogicalRelation =>
          l.relation.asInstanceOf[org.apache.spark.sql.execution.datasources
            .HadoopFsRelation].location.inputFiles.toSeq
      }.flatten
    // image ANN: the feature index alone — no documents scan, no
    // executor-side PNG encode/decode on the warm path
    val f19 = sources(graft.operators.MmIvf.qMm19(spark, sf))
    assert(f19.nonEmpty && f19.forall(_.contains("mm-index")),
      s"qMm19 warm must read ONLY the mm index: ${f19.filterNot(_.contains("mm-index")).take(3)}")
    // cross-artifact audit: the mm index + the dup-cluster artifact,
    // nothing else (cached cluster frames may hide behind InMemoryScan —
    // whatever file relations survive must be artifact files)
    val f20 = sources(graft.operators.MmIvf.qMm20(spark, sf))
    assert(f20.exists(_.contains("mm-index")), "qMm20 must consume the mm index")
    assert(f20.forall(f => f.contains("mm-index") || f.contains("dup-index")),
      s"qMm20 reads unexpected sources: ${f20.filterNot(f => f.contains("mm-index") || f.contains("dup-index")).take(3)}")
    // external-vector lane (round 16): warm serving reads the index only —
    // no embeddings scan, no quantize pass on the warm path
    val f22 = sources(graft.operators.MmIvf.qMm22(spark, sf))
    assert(f22.nonEmpty && f22.forall(_.contains("mm-index")),
      s"qMm22 warm must read ONLY the mm index: ${f22.filterNot(_.contains("mm-index")).take(3)}")
  }

  test("served Jaccard lane is candidate-bounded: no nested-loop anywhere, window fed by the candidate agg") {
    // VERDICT r11 task 1: the q_sim15 served lexical lane must rank the
    // posting-join candidate set, never probe × N(docs). Proof obligations:
    // (a) the plan contains NO BroadcastNestedLoopJoin / CartesianProduct —
    //     the pad fan-out is keyed on a constant so it stays a hash join;
    // (b) the ranking window's input flows from the (q_id, n_id)-keyed
    //     candidate aggregate, not from a raw doclen scan.
    val q = graft.operators.LexIndex.jaccardTopDocs(spark, sf)
    q.collect()
    val plan = q.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"),
      s"served Jaccard must not nested-loop against doclen:\n$plan")
    val opt = q.queryExecution.optimizedPlan
    val windows = opt.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window => w
    }
    assert(windows.nonEmpty, "ranking window missing from the plan")
    assert(windows.forall(_.exists {
      case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate =>
        a.groupingExpressions.size == 2
      case _ => false
    }), "the ranking window must be fed by the pair-keyed candidate aggregate")
  }

  // walk the EXECUTED plan including AQE wrappers and materialized stages
  // (QueryStageExec is a leaf — plain collect won't descend); cached
  // relations (InMemoryTableScan) are leaves and correctly NOT descended —
  // their stored build plans never execute
  private def executedScans(p: org.apache.spark.sql.execution.SparkPlan)
      : Seq[org.apache.spark.sql.execution.FileSourceScanExec] = {
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    val here = p match {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => Seq(f)
      case _ => Seq.empty
    }
    val kids = p match {
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case q: QueryStageExec => Seq(q.plan)
      case r: org.apache.spark.sql.execution.exchange.ReusedExchangeExec =>
        Seq(r.child)
      case other => other.children
    }
    here ++ kids.flatMap(executedScans)
  }

  test("q_sim22: the corpus total rides the plan as a one-row totals crossJoin (no plan-build corpus count job)") {
    // VERDICT r15 item 6: the scan_pm denominator previously came from a
    // standalone embeddings.count() at plan-build; it now attaches as a
    // broadcast one-row aggregate of the CACHED assignment — the witness
    // is the BroadcastNestedLoopJoin in the executed plan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec
    graft.operators.Similarity.IvfIndex.build(spark, sf, lloydIters = 0)
    val df = graft.operators.Similarity.qSim22(spark, sf)
    df.collect()
    def nodes(p: org.apache.spark.sql.execution.SparkPlan)
        : Seq[org.apache.spark.sql.execution.SparkPlan] = {
      val kids = p match {
        case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
        case q: QueryStageExec => Seq(q.plan)
        case r: org.apache.spark.sql.execution.exchange.ReusedExchangeExec =>
          Seq(r.child)
        case other => other.children
      }
      p +: kids.flatMap(nodes)
    }
    assert(nodes(df.queryExecution.executedPlan)
      .exists(_.isInstanceOf[BroadcastNestedLoopJoinExec]),
      "the one-row totals crossJoin must be in the executed plan")
  }

  test("served hybrid (q_sim17) warm: every executed scan is an index file or a pushed probe fetch") {
    // VERDICT r11 task 2: with both lanes on warm durable indexes, the
    // only parquet the query may touch is (a) lex-index files and (b) the
    // vec_id < 5 probe fetches (pushed down) — vector candidates come from
    // the cached int8 assignment, never a corpus-wide embedding scan
    graft.operators.Similarity.qSim17(spark, sf).collect() // warm indexes
    val q = graft.operators.Similarity.qSim17(spark, sf)
    q.collect()
    val scans = executedScans(q.queryExecution.executedPlan)
    assert(scans.nonEmpty, "expected executed file scans in the plan")
    for (sc <- scans) {
      val files = sc.relation.location.inputFiles.toSeq
      val isLex = files.forall(_.contains("lex-index"))
      val isProbe = files.forall(_.contains("embeddings.parquet")) &&
        sc.metadata.getOrElse("PushedFilters", "").contains("LessThan(vec_id,5)")
      assert(isLex || isProbe,
        s"corpus-wide scan in the served hybrid: ${files.take(2)} " +
          s"pushed=${sc.metadata.get("PushedFilters")}")
    }
  }

  test("q_sim17 warm after a gated advanceAnn batch: index files + pushed probe fetch only (VERDICT r12 task 3)") {
    // a streaming-ingested corpus (docs + embeddings landed through the
    // gate, all three artifacts advanced under the batch marker) must
    // serve the hybrid exactly like a statically-indexed one: zero corpus
    // passes warm — the ANN lane resolves the post-delta fingerprint from
    // appendFor's published dir, never a rebuild
    import java.nio.file.{Files, Paths}
    val store = Files.createTempDirectory(Paths.get("target"), "gate-s17").toString
    val root = Files.createTempDirectory("graft-s17corpus").toString
    val props = Seq("graft.ivf.root", "graft.lexindex.root", "graft.dupindex.root")
    val prev = props.map(p => p -> sys.props.get(p)).toMap
    props.foreach(p => sys.props(p) =
      Files.createTempDirectory(Paths.get("target"), "s17-idx").toString)
    try {
      val all = graft.core.Tables.documents(spark, sf)
      val allE = graft.core.Tables.embeddings(spark, sf)
      all.where(org.apache.spark.sql.functions.col("doc_id") < 400).write.parquet(s"$root/documents.parquet")
      allE.where(org.apache.spark.sql.functions.col("vec_id") < 400).write.parquet(s"$root/embeddings.parquet")
      graft.functions.GraftFunctions.register(spark)
      val batch = all.where(org.apache.spark.sql.functions.col("doc_id") >= 400 &&
        org.apache.spark.sql.functions.col("doc_id") < 450)
        .select("doc_id", "text")
        .join(allE.selectExpr("vec_id AS doc_id", "embedding"), "doc_id")
      val (a, r) = graft.streaming.Streams.dedupGateBatch(
        spark, store, batch, 0L, advanceIndex = true, corpusDir = Some(root),
        advanceLex = true, advanceAnn = true)
      assert(a + r == 50)
      // fresh-session shape: drop the memos so the query goes through the
      // durable-load path (what a consumer session would do)
      graft.operators.Similarity.IvfIndex.evictSession(spark)
      graft.operators.LexIndex.evictSession(spark)
      graft.operators.Similarity.qSim17(spark, root).collect() // warm load
      val q = graft.operators.Similarity.qSim17(spark, root)
      q.collect()
      val scans = executedScans(q.queryExecution.executedPlan)
      assert(scans.nonEmpty, "expected executed file scans in the plan")
      for (sc <- scans) {
        val files = sc.relation.location.inputFiles.toSeq
        val isIdx = files.forall(f =>
          f.contains("s17-idx") || f.contains("lex-index") || f.contains("ivf-index"))
        val isProbe = files.forall(_.contains("embeddings.parquet")) &&
          sc.metadata.getOrElse("PushedFilters", "").contains("LessThan(vec_id,5)")
        assert(isIdx || isProbe,
          s"corpus-wide scan after gated ingestion: ${files.take(2)} " +
            s"pushed=${sc.metadata.get("PushedFilters")}")
      }
      // VERDICT r13 task 8: the index-health audits round 13 added answer
      // from the ADVANCED index too — the consistency story applied to the
      // queries that monitor it. q_sim19 may touch index files only (its
      // cell counts come from the cached assignment); q_sim20 adds exactly
      // the documents scan its lang kernel defines; NEITHER re-reads the
      // embeddings corpus.
      val q19 = graft.operators.Similarity.qSim19(spark, root)
      q19.collect()
      for (sc <- executedScans(q19.queryExecution.executedPlan)) {
        val files = sc.relation.location.inputFiles.toSeq
        assert(files.forall(f => f.contains("s17-idx") || f.contains("ivf-index")),
          s"q_sim19 warm must read ONLY index files: ${files.take(2)}")
      }
      val q20 = graft.operators.Similarity.qSim20(spark, root)
      q20.collect()
      for (sc <- executedScans(q20.queryExecution.executedPlan)) {
        val files = sc.relation.location.inputFiles.toSeq
        assert(files.forall(f => f.contains("s17-idx") ||
          f.contains("ivf-index") || f.contains("documents.parquet")),
          s"q_sim20 warm reads index files + its documents lang scan only: ${files.take(2)}")
      }
      // the round-14 served decontam lane rides the same advanced index:
      // index files + the pushed eval probe fetch, zero training passes
      val q36 = graft.operators.TextAnalysis.qT36(spark, root)
      q36.collect()
      for (sc <- executedScans(q36.queryExecution.executedPlan)) {
        val files = sc.relation.location.inputFiles.toSeq
        val isIdx = files.forall(f =>
          f.contains("s17-idx") || f.contains("ivf-index"))
        val isProbe = files.forall(_.contains("embeddings.parquet")) &&
          sc.metadata.getOrElse("PushedFilters", "").contains("LessThan(vec_id,20)")
        assert(isIdx || isProbe,
          s"q_t36 warm must read index files + the pushed eval fetch only: " +
            s"${files.take(2)} pushed=${sc.metadata.get("PushedFilters")}")
      }
    } finally {
      props.foreach(p => prev(p) match {
        case Some(v) => sys.props(p) = v
        case None    => sys.props.remove(p); ()
      })
      graft.operators.Similarity.IvfIndex.evictSession(spark)
      graft.operators.LexIndex.evictSession(spark)
      graft.operators.DupClusters.evictSession(spark)
    }
  }

  test("q_t30 BPE apply: segmentation is vocabulary-map-only, rejoin is an equi-join, codegen holds") {
    val q = graft.operators.TextAnalysis.qT30(spark, sf)
    q.collect()
    val plan = q.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"BPE rejoin must be an equi-join:\n$plan")
    // the 40-replace fold is ordinary string expressions — never a UDF
    assert(!plan.contains("ScalaUDF"), "segmentation must stay in codegen'd expressions")
  }

  test("q_t31 eval contamination: the eval side broadcasts, training streams map-only") {
    val q = graft.operators.TextAnalysis.qT31(spark, sf)
    q.collect()
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      "eval gram set must broadcast into the training stream")
    // no corpus-sized shuffle: every non-broadcast exchange keys on the
    // bounded eval frames (gram hit-set distinct / per-eval-doc count)
    val shuffles = plan.linesIterator.filter(l =>
      l.contains("Exchange") && !l.contains("BroadcastExchange")).toSeq
    assert(shuffles.forall(l => l.contains("hashpartitioning(gram") ||
      l.contains("hashpartitioning(doc_id") || l.contains("rangepartitioning")),
      s"unexpected corpus-side shuffle:\n${shuffles.mkString("\n")}")
  }

  test("q_t33 DSIR weights: every shuffle is vocab- or doc-keyed; corpus text stays map-side") {
    val q = graft.operators.TextAnalysis.qT33(spark, sf)
    q.collect()
    val plan = q.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    // the token stream reduces ONCE per side into (doc, w) tf frames; the
    // model/full-outer/scoring joins and the final per-doc reduce key on
    // the term or the doc id — no exchange ever carries text, and the only
    // nested-loop is the broadcast-one-row totals crossJoin
    val shuffles = plan.linesIterator.filter(l =>
      l.contains("Exchange") && !l.contains("BroadcastExchange") &&
        !l.contains("InMemory")).toSeq
    assert(shuffles.nonEmpty)
    assert(shuffles.forall(l => l.contains("hashpartitioning(w") ||
      l.contains("hashpartitioning(doc_id") || l.contains("rangepartitioning") ||
      l.contains("SinglePartition")),
      s"unexpected shuffle key in q_t33:\n${shuffles.mkString("\n")}")
    assert(!plan.linesIterator.exists(l =>
      l.contains("Exchange") && l.contains("text#")),
      "corpus text crossed an exchange in q_t33")
  }

  test("q_t35 semantic decontam: per-eval argmax is a partial max_by — no window, no sort over the joined frame (VERDICT r13 task 1)") {
    val q = graft.operators.TextAnalysis.qT35(spark, sf)
    q.collect()
    val plan = q.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    // the round-13 defect this pins: a rank-everything window shuffled all
    // |eval| x N joined rows into <= |eval| partitions and SORTED each
    // partition's corpus-sized candidate list — parallelism capped at the
    // eval-doc count. The argmax must be a partial-aggregable max_by.
    assert(!plan.contains("Window"),
      s"q_t35 must not rank with a window:\n$plan")
    assert(plan.contains("max_by"), "q_t35's argmax must be max_by")
    assert(plan.linesIterator.exists(l =>
      l.contains("Aggregate") && l.contains("partial_max_by")),
      s"q_t35's argmax must combine map-side (partial aggregate):\n$plan")
    // nothing may sort the joined frame: the only Sort is the final
    // |eval|-row presentation orderBy on q_id — never on the similarity
    val sorts = plan.linesIterator.filter(_.contains("Sort ")).toSeq
    assert(sorts.forall(l => !l.contains("sim_raw") && !l.contains("sim#")),
      s"q_t35 sorted the candidate frame:\n${sorts.mkString("\n")}")
    // every non-broadcast exchange keys on the bounded eval frame
    val shuffles = plan.linesIterator.filter(l =>
      l.contains("Exchange") && !l.contains("BroadcastExchange")).toSeq
    assert(shuffles.forall(l => l.contains("hashpartitioning(q_id") ||
      l.contains("rangepartitioning") || l.contains("SinglePartition")),
      s"unexpected shuffle in q_t35:\n${shuffles.mkString("\n")}")
  }

  test("q_st11 drift: events reduce once to the hourly counts frame; no exchange carries event payloads") {
    val q = graft.streaming.Streams.qSt11(spark, sf)
    q.collect()
    val plan = q.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    val exchanges = plan.linesIterator.filter(_.contains("Exchange")).toSeq
    assert(exchanges.nonEmpty)
    assert(exchanges.forall(l => !l.contains("props#") && !l.contains("event_id#")
      && !l.contains("user_id#")),
      s"event payloads crossed an exchange in q_st11:\n${exchanges.mkString("\n")}")
  }

  test("q_t32 curation funnel: one window, text never crosses an exchange (VERDICT r12 task 6)") {
    val q = graft.operators.TextAnalysis.qT32(spark, sf)
    q.collect()
    val plan = q.queryExecution.executedPlan
    // the scaladoc's scan accounting, pinned: two corpus passes (signals,
    // doc-intrinsic gram flag) + the bounded eval side — never more
    val docScans = executedScans(plan).filter(
      _.relation.location.rootPaths.mkString.contains("documents"))
    assert(docScans.size == 3,
      s"expected signals + gram + eval scans, got ${docScans.size}")
    // the dedup keeper's window runs ONCE (the gram lane must not
    // re-derive the survivor set)
    def walkAll(p: org.apache.spark.sql.execution.SparkPlan)
        : Seq[org.apache.spark.sql.execution.SparkPlan] = {
      import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
      val kids = p match {
        case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
        case qs: QueryStageExec => Seq(qs.plan)
        case r: org.apache.spark.sql.execution.exchange.ReusedExchangeExec =>
          Seq(r.child)
        case _ => p.children
      }
      p +: kids.flatMap(walkAll)
    }
    val nodes = walkAll(plan)
    assert(nodes.count(
      _.isInstanceOf[org.apache.spark.sql.execution.window.WindowExec]) == 1,
      "the chash keeper window must execute exactly once")
    // the 100 TB invariant: corpus text is consumed map-side only — no
    // shuffle exchange ships the text column
    val exchanges = nodes.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
    }
    assert(exchanges.nonEmpty)
    assert(exchanges.forall(!_.output.exists(_.name == "text")),
      s"corpus text crossed an exchange: ${exchanges.map(_.output.map(_.name))}")
  }

  test("Q-G7 k-core: peel is shrink-only and converges on the fixture graph") {
    val rows = graft.operators.Dedup.qG7(spark, sf).collect()
    assert(rows.length == graft.operators.Dedup.KCoreIters + 1)
    val edges = rows.map(_.getAs[Long]("n_edges"))
    val nodes = rows.map(_.getAs[Long]("n_nodes"))
    assert(edges.zip(edges.tail).forall { case (a, b) => b <= a },
      s"peel must never add edges: ${edges.mkString(",")}")
    assert(nodes.zip(nodes.tail).forall { case (a, b) => b <= a },
      s"peel must never add nodes: ${nodes.mkString(",")}")
  }

  test("hot-path queries stay inside whole-stage codegen") {
    for ((name, q) <- Seq(
      "q_a2" -> Relational.qA2(spark, sf),
      "q_j2" -> Joins.qJ2(spark, sf))) {
      q.collect() // materialize so AQE finalizes the plan (isFinalPlan=true)
      val plan = q.queryExecution.executedPlan.toString
      // "*(n)" prefixes mark WholeStageCodegen spans in the plan string
      assert(plan.contains("*("), s"$name fell out of codegen")
      assert(!plan.contains("ScalaUDF"), s"$name contains a UDF barrier")
    }
  }
}
