package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

class SimilaritySpec extends AnyFunSuite {

  test("native dot product is bit-identical to the zip_with/aggregate fold") {
    val spark0 = graft.TestSpark.spark
    import spark0.implicits._
    import org.apache.spark.sql.functions._
    val df = Seq(
      (Array(1.5f, -2.25f, 3.125f), Array(0.5f, 4.0f, -1.75f)),
      (Array(0.1f, 0.2f, 0.3f), Array(0.7f, 0.8f, 0.9f)),
      (Array.empty[Float], Array.empty[Float])
    ).toDF("a", "b")
    val rows = df.select(
      Similarity.dot(col("a"), col("b")).as("native"),
      aggregate(zip_with(col("a"), col("b"),
        (x, y) => x.cast("double") * y.cast("double")),
        lit(0.0), (acc, v) => acc + v).as("hof")).collect()
    rows.foreach(r => assert(r.getDouble(0) == r.getDouble(1)))
    // length mismatch -> NULL, exactly like zip_with's null padding
    val mm = Seq((Array(1.0f, 2.0f), Array(1.0f))).toDF("a", "b")
      .select(Similarity.dot(col("a"), col("b")).as("d")).collect()
    assert(mm.head.isNullAt(0))
    // double-typed side (hyperplane literals)
    val planes = Seq((Array(1.0f, 2.0f), Array(0.25, -0.5))).toDF("a", "p")
      .select(Similarity.dot(col("a"), col("p")).as("d")).collect()
    assert(planes.head.getDouble(0) == 1.0 * 0.25 + 2.0 * -0.5)
  }
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // deterministic corpus of independent 64-dim vectors + a planted
  // near-copy of #0 (seeded per-id Gaussians: no accidental duplicates)
  def vec(i: Int): Array[Float] = {
    val r = new scala.util.Random(i * 7919 + 13)
    Array.fill(64)(r.nextGaussian().toFloat)
  }

  lazy val corpus = ((0 until 50).map(i => (i.toLong, vec(i))) :+
    (999L, vec(0).map(_ * 1.01f))).toDF("vec_id", "embedding")

  def cosineLocal(a: Array[Float], b: Array[Float]): Double = {
    val dot = a.zip(b).map { case (x, y) => x.toDouble * y.toDouble }.sum
    val na = math.sqrt(a.map(x => x.toDouble * x).sum)
    val nb = math.sqrt(b.map(x => x.toDouble * x).sum)
    dot / (na * nb)
  }

  test("brute-force top-k matches a local oracle exactly") {
    val q = corpus.filter(col("vec_id") === 0)
    val got = Similarity.bruteForceTopK(corpus, q, k = 5)
      .orderBy("rank").select("corpus_id").as[Long].collect().toSeq
    val all = ((0 until 50).map(i => (i.toLong, vec(i))) :+
      (999L, vec(0).map(_ * 1.01f)))
    val expected = all.filter(_._1 != 0L)
      .map { case (id, v) => (id, cosineLocal(vec(0), v)) }
      .sortBy { case (id, c) => (-c, id) }.take(5).map(_._1)
    assert(got == expected)
    assert(got.head == 999L) // the planted near-copy is rank 1
  }

  test("LSH top-k finds the planted copy (same bucket by construction)") {
    val q = corpus.filter(col("vec_id") === 0)
    val got = Similarity.lshTopK(corpus, q, k = 5, dim = 64,
      bitsPerTable = 8, nTables = 4)
      .orderBy("rank").select("corpus_id", "cos").as[(Long, Double)].collect()
    assert(got.nonEmpty)
    assert(got.head._1 == 999L && got.head._2 > 0.9999)
  }

  test("IVF top-k finds the planted copy (same k-means cell)") {
    val q = corpus.filter(col("vec_id") === 0)
    val got = Similarity.ivfTopK(corpus, q, k = 5, nCentroids = 8, nProbe = 3)
      .orderBy("rank").select("corpus_id", "cos").as[(Long, Double)].collect()
    assert(got.nonEmpty)
    // the scaled copy is cosine-1 and quantizes to the same cell
    assert(got.head._1 == 999L && got.head._2 > 0.9999)
  }

  test("semantic dedup pairs == local per-cell oracle; planted pair found") {
    val got = Similarity.semanticDedupPairs(corpus, nCells = 16, minCos = 0.9)
      .select("id_a", "id_b", "cell").as[(Long, Long, Int)].collect().toSet
    graft.ops.CacheRegistry.releaseAll()
    // local oracle: same deterministic quantizer (centroids = ids < 16),
    // argmax-cosine assignment (ties to lowest cell), within-cell pairs
    val all = ((0 until 50).map(i => (i.toLong, vec(i))) :+
      (999L, vec(0).map(_ * 1.01f)))
    val centers = all.filter(_._1 < 16).sortBy(_._1)
    def cellOf(v: Array[Float]): Int =
      centers.maxBy { case (cid, c) => (cosineLocal(v, c), -cid) }._1.toInt
    val assigned = all.map { case (id, v) => (id, v, cellOf(v)) }
    val expected = (for {
      (ia, va, ca) <- assigned
      (ib, vb, cb) <- assigned
      if ia < ib && ca == cb && cosineLocal(va, vb) >= 0.9
    } yield (ia, ib, ca)).toSet
    assert(got == expected)
    // the planted scaled copy of vector 0 shares cell 0 with it
    assert(got.contains((0L, 999L, 0)))
    // and nothing outside a shared cell was compared (pairs only within)
    assert(got.forall { case (a, b, c) =>
      assigned.find(_._1 == a).get._3 == c &&
        assigned.find(_._1 == b).get._3 == c })
  }

  test("semantic decontamination flags exactly the cell-local leaks") {
    // bench = scaled copies of vectors 0 and 7 (paraphrased-leak stand-in)
    val bench = corpus.filter(col("vec_id").isin(0L, 7L))
      .select(transform(col("embedding"), x => x * lit(1.01f))
        .as("embedding"))
    val got = Similarity.semanticDecontaminate(corpus, bench,
      nCells = 16, minCos = 0.95)
      .select("id", "n_hits", "max_cos")
      .as[(Long, Long, Double)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    graft.ops.CacheRegistry.releaseAll()
    // local oracle: same quantizer, same cell-scoped comparison
    val all = ((0 until 50).map(i => (i.toLong, vec(i))) :+
      (999L, vec(0).map(_ * 1.01f)))
    val centers = all.filter(_._1 < 16).sortBy(_._1)
    def cellOf(v: Array[Float]): Int =
      centers.maxBy { case (cid, c) => (cosineLocal(v, c), -cid) }._1.toInt
    val benchLocal = Seq(vec(0), vec(7)).map(_.map(x => x * 1.01f))
      .map(b => (cellOf(b), b))
    val expected = all.flatMap { case (id, v) =>
      val hits = benchLocal.filter(_._1 == cellOf(v))
        .map(b => cosineLocal(v, b._2)).filter(_ >= 0.95)
      if (hits.isEmpty) None
      else Some(id -> (hits.size.toLong,
        math.round(hits.max * 1e6) / 1e6))
    }.toMap
    assert(got.keySet == expected.keySet)
    expected.foreach { case (id, (n, mc)) =>
      assert(got(id)._1 == n)
      assert(math.abs(got(id)._2 - mc) < 2e-6, s"max_cos for $id") }
    // the source of each leak is flagged, and so is the source's own
    // scaled near-copy (999 sits in cell 0 with bench-leak 0)
    assert(got.contains(0L) && got.contains(999L) && got.contains(7L))
    // unrelated vectors are not flagged
    assert(!got.contains(23L))
  }

  test("PQ encode + ADC top-k == full local replay; planted copy rank 1") {
    val nSub = 8; val dsub = 8; val ksub = 16
    val all = ((0 until 50).map(i => (i.toLong, vec(i))) :+
      (999L, vec(0).map(_ * 1.01f)))
    // local codebooks: subvectors of the ksub lowest-id vectors
    val seeds = all.filter(_._1 < ksub).sortBy(_._1).map(_._2)
    def sqDist(a: Array[Float], off: Int, c: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < c.length) {
        val d = a(off + i).toDouble - c(i); s += d * d; i += 1
      }
      s
    }
    val cb: Array[Array[Array[Double]]] = Array.tabulate(nSub)(m =>
      seeds.map(_.slice(m * dsub, (m + 1) * dsub).map(_.toDouble)).toArray)
    def encode(v: Array[Float]): Array[Int] = Array.tabulate(nSub) { m =>
      (0 until ksub).minBy(j => (sqDist(v, m * dsub, cb(m)(j)), j))
    }
    // engine codes equal the local encode (exact: same fold order)
    val gotCodes = Similarity
      .pqEncode(col("embedding"), Similarity.pqCodebooks(corpus, 64, nSub, ksub))
    val codeRows = corpus.select(col("vec_id"), gotCodes.as("codes"))
      .as[(Long, Seq[Int])].collect().toMap
    all.foreach { case (id, v) =>
      assert(codeRows(id) == encode(v).toSeq, s"codes differ for $id") }
    // the planted scaled copy collapses to vector 0's codes
    assert(codeRows(999L) == codeRows(0L))
    // ADC top-k for query 0 equals the local replay
    val q = corpus.filter(col("vec_id") === 0)
    val got = Similarity.pqTopK(corpus, q, k = 5, dim = 64, nSub, ksub)
      .orderBy("rank")
      .select("corpus_id", "rank", "adist").as[(Long, Int, Double)].collect()
    val lut: Array[Array[Double]] = Array.tabulate(nSub)(m =>
      (0 until ksub).map(j => sqDist(vec(0), m * dsub, cb(m)(j))).toArray)
    val expected = all.filter(_._1 != 0L).map { case (id, v) =>
      val codes = encode(v)
      var s = 0.0; var m = 0
      while (m < nSub) { s += lut(m)(codes(m)); m += 1 }
      (id, s)
    }.sortBy { case (id, s) => (s, id) }.take(5)
    assert(got.map(_._1).toSeq == expected.map(_._1))
    got.zip(expected).foreach { case ((_, _, a), (_, e)) =>
      assert(a == math.round(e * 1e6) / 1e6.toDouble ||
        math.abs(a - e) < 1e-6, s"adist $a vs $e") }
    // the planted near-copy of the query vector wins with adist ~ 0
    assert(got.head._1 == 999L && got.head._3 < 1e-3)
  }

  test("IVFADC finds the planted copy; candidates stay inside probed cells") {
    val q = corpus.filter(col("vec_id") === 0)
    val got = Similarity.ivfPqTopK(corpus, q, k = 5, dim = 64,
      nSub = 8, ksub = 16, nCentroids = 8, nProbe = 3)
      .orderBy("rank")
      .select("corpus_id", "rank", "adist").as[(Long, Int, Double)].collect()
    assert(got.nonEmpty)
    // the scaled copy lands in the query's own k-means cell and shares
    // vector 0's PQ codes, so its ADC distance is the LUT's near-zero row
    assert(got.head._1 == 999L && got.head._3 < 1e-3)
    // cell restriction changes WHICH candidates are ranked, never their
    // ADC distance: every returned (id, adist) must agree with the
    // unrestricted PQ scan's distance for that id
    val full = Similarity.pqTopK(corpus, q, k = 51, dim = 64, 8, 16)
      .select("corpus_id", "adist").as[(Long, Double)].collect().toMap
    got.foreach { case (id, _, a) =>
      assert(full(id) == a, s"adist mismatch for $id: $a vs ${full(id)}") }
  }

  test("persisted IVF-PQ index: reloaded probe == per-call ivfPqTopK") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ivfpq").toString
    try {
      Similarity.buildIvfPqIndex(corpus, dir, dim = 64,
        nCentroids = 8, nSub = 8, ksub = 16)
      val q = corpus.filter(col("vec_id") === 0)
      val fromIndex = Similarity.queryIvfPqIndex(spark, dir, q,
        k = 5, nProbe = 3)
        .select("query_id", "corpus_id", "rank", "adist")
        .as[(Long, Long, Int, Double)].collect().sortBy(_._3)
      val oneShot = Similarity.ivfPqTopK(corpus, q, k = 5, dim = 64,
        nSub = 8, ksub = 16, nCentroids = 8, nProbe = 3)
        .select("query_id", "corpus_id", "rank", "adist")
        .as[(Long, Long, Int, Double)].collect().sortBy(_._3)
      assert(fromIndex.toSeq == oneShot.toSeq)
      assert(fromIndex.head._2 == 999L) // planted copy still rank 1
      // the stored corpus payload really is codes-only: no vector column
      val schema = spark.read.parquet(s"$dir/assignments").schema
      assert(schema.fieldNames.toSet == Set("corpus_id", "codes", "cell"))
    } finally {
      graft.sources.GridExports.deleteStore(spark, dir)
    }
  }

  test("persisted IVF index: build, reload, query == per-call ivfTopK") {
    val dir = TestSpark.tmpDir("ivf_index")
    Similarity.buildIvfIndex(corpus, dir, nCentroids = 8)
    // index really is on disk as parquet, assignments partitioned by cell
    assert(new java.io.File(s"$dir/centroids").exists())
    assert(new java.io.File(s"$dir/assignments").listFiles()
      .exists(_.getName.startsWith("cell=")))
    val q = corpus.filter(col("vec_id") === 0)
    val got = Similarity.queryIvfIndex(spark, dir, q, k = 5, nProbe = 3)
      .orderBy("rank").select("corpus_id", "cos").as[(Long, Double)].collect()
    assert(got.nonEmpty)
    assert(got.head._1 == 999L && got.head._2 > 0.9999)
    // same quantizer seed + data -> identical output to the one-shot form
    val oneShot = Similarity.ivfTopK(corpus, q, k = 5, nCentroids = 8,
      nProbe = 3)
      .orderBy("rank").select("corpus_id", "cos").as[(Long, Double)].collect()
    assert(got.toSeq == oneShot.toSeq)
  }

  test("int8-quantized IVF index: packed binary storage, full-probe == brute") {
    val dir = TestSpark.tmpDir("ivf_index_int8")
    Similarity.buildIvfIndex(corpus, dir, nCentroids = 8, quantize = true)
    // the compression claim, measured at the COLUMN-CHUNK level (file
    // sizes would mostly compare parquet footers on this micro fixture:
    // 23 tiny files x ~1.3 KB of metadata vs ~75 B/row of data): the
    // stored vector bytes must shrink >= 3x vs the float layout
    val fdir = TestSpark.tmpDir("ivf_index_f32")
    Similarity.buildIvfIndex(corpus, fdir, nCentroids = 8)
    def vecBytes(d: String, colName: String): Long = {
      import scala.jdk.CollectionConverters._
      new java.io.File(s"$d/assignments").listFiles.filter(_.isDirectory)
        .flatMap(_.listFiles).filter(_.getName.endsWith(".parquet"))
        .map { f =>
          val rd = org.apache.parquet.hadoop.ParquetFileReader.open(
            org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
              new org.apache.hadoop.fs.Path(f.getAbsolutePath),
              new org.apache.hadoop.conf.Configuration()))
          val n = rd.getFooter.getBlocks.asScala
            .flatMap(_.getColumns.asScala)
            .filter(_.getPath.toDotString.startsWith(colName))
            .map(_.getTotalSize).sum
          rd.close(); n
        }.sum
    }
    val f32 = vecBytes(fdir, "cvec")
    val i8 = vecBytes(dir, "cvec_q")
    assert(f32 > 3 * i8, s"float vector bytes $f32 vs int8 $i8")
    // storage really is int8: one raw BINARY byte per component (a
    // tinyint array would be parquet physical INT32 — measured larger
    // than the float array)
    val stored = spark.read.parquet(s"$dir/assignments")
    assert(stored.schema("cvec_q").dataType ==
      org.apache.spark.sql.types.BinaryType)
    val oneVec = stored.select("cvec_q").head.getAs[Array[Byte]](0)
    assert(oneVec.length == 64)
    // planted near-copy survives quantization + probing
    val q = corpus.filter(col("vec_id") === 0)
    val got = Similarity.queryIvfIndex(spark, dir, q, k = 5, nProbe = 3)
      .orderBy("rank").select("corpus_id", "cos").as[(Long, Double)].collect()
    assert(got.head._1 == 999L && got.head._2 > 0.999)
    // probing ALL cells makes IVF exhaustive: must equal brute force of
    // the RAW queries against the dequantized corpus (the index stores
    // int8; queries arrive unquantized; ranking is exact post-dequantize)
    val full = Similarity.queryIvfIndex(spark, dir, q, k = 5, nProbe = 8)
      .select("corpus_id", "rank", "cos").as[(Long, Int, Double)]
      .collect().sortBy(_._2)
    val deq = corpus.select(col("vec_id"),
      Similarity.dequantizeInt8(
        Similarity.quantizeInt8(col("embedding")),
        Similarity.int8Scale(col("embedding"))).as("embedding"))
    val brute = Similarity.bruteForceTopK(deq, q, k = 5)
      .select("corpus_id", "rank", "cos").as[(Long, Int, Double)]
      .collect().sortBy(_._2)
    assert(full.toSeq == brute.toSeq)
  }

  test("int8 quantize: bounded error round-trip, zero vector safe") {
    val withZero = corpus.union(
      Seq((500L, Array.fill(64)(0.0f))).toDF("vec_id", "embedding"))
    val rows = withZero.select(col("vec_id"),
      Similarity.int8Scale(col("embedding")).as("scale"),
      col("embedding"),
      Similarity.quantizeInt8(col("embedding")).as("q"))
      .withColumn("deq", Similarity.dequantizeInt8(col("q"), col("scale")))
      .collect()
    rows.foreach { r =>
      val scale = r.getDouble(1)
      val orig = r.getSeq[Float](2)
      val q = r.getSeq[Byte](3)
      val deq = r.getSeq[Double](4)
      assert(q.forall(v => v >= -127 && v <= 127), s"vec ${r.getLong(0)}")
      // round-to-nearest: per-component error bounded by scale/2
      orig.zip(deq).foreach { case (o, d) =>
        assert(math.abs(o.toDouble - d) <= scale / 2 + 1e-12,
          s"vec ${r.getLong(0)}: $o vs $d (scale $scale)")
      }
      if (r.getLong(0) == 500L)
        assert(scale == 0.0 && q.forall(_ == 0) && deq.forall(_ == 0.0))
    }
    // native pack->unpack is bit-identical to the Column
    // quantize->dequantize chain (swapping the storage path cannot
    // move a value)
    val pu = corpus.select(
      Similarity.dequantizeInt8(
        Similarity.quantizeInt8(col("embedding")),
        Similarity.int8Scale(col("embedding"))).as("col_form"),
      graft.functions.UnpackInt8Expr(
        graft.functions.PackInt8Expr(
          Similarity.quantizeInt8(col("embedding"))),
        Similarity.int8Scale(col("embedding"))).as("native_form"))
      .collect()
    pu.foreach(r =>
      assert(r.getSeq[Double](0) == r.getSeq[Double](1)))
    // the quantized corpus still resolves the planted near-copy: cosine
    // over dequantized vectors keeps 999 as rank-1 neighbor of 0
    val deqCorpus = corpus.select(col("vec_id"),
      Similarity.dequantizeInt8(
        Similarity.quantizeInt8(col("embedding")),
        Similarity.int8Scale(col("embedding")))
        .as("embedding"))
    val top = Similarity.bruteForceTopK(deqCorpus,
      deqCorpus.filter(col("vec_id") === 0), k = 1)
      .select("corpus_id").as[Long].head()
    assert(top == 999L)
  }

  test("cosine near-dup pairs = exactly the planted pair at cos>=0.999") {
    val pairs = Similarity.cosineNearDups(corpus, dim = 64, minCos = 0.999)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs == Set((0L, 999L)))
  }

  // 4 tight clusters on orthogonal axes, 6 members each, ids
  // INTERLEAVED (id = j*4 + c) so lowestIdCenters(_, 4) = ids 0..3 =
  // one center per cluster; labels alternate INSIDE each cluster, so
  // every anchor's hardest negative (nearest different-label vector)
  // sits in its OWN cell — the structure an IVF-routed miner must
  // recover exactly.
  private def clusteredLabeled = {
    val rows = for (c <- 0 until 4; j <- 0 until 6) yield {
      val r = new scala.util.Random(c * 100 + j)
      val v = Array.tabulate(8)(i =>
        (if (i == c) 1.0f else 0.0f) + r.nextGaussian().toFloat * 0.05f)
      ((j * 4 + c).toLong, v, if (j % 2 == 0) "A" else "B")
    }
    rows.toDF("vec_id", "embedding", "label")
  }

  test("ANN miners: IVF route recovers the brute miners' top-1 on " +
    "clustered structure; positives agree too") {
    val vecs = clusteredLabeled
    val dir = TestSpark.tmpDir("ivf_miner")
    Similarity.buildIvfIndex(vecs, dir, nCentroids = 4,
      labelCol = Some("label"),
      centers = Some(Similarity.lowestIdCenters(vecs, 4)))
    def top1(df: org.apache.spark.sql.DataFrame): Map[Long, Long] =
      df.filter(col("rank") === 1)
        .select(col("query_id").cast("long"), col("corpus_id").cast("long"))
        .as[(Long, Long)].collect().toMap
    // anchors = the WHOLE corpus (the real mining shape)
    val bruteHn = top1(Similarity.hardNegatives(vecs, vecs, k = 3))
    val annHn = top1(Similarity.hardNegativesAnn(spark, dir, vecs,
      k = 3, nProbe = 2))
    assert(annHn == bruteHn,
      s"ANN hard-negative top-1 diverged: $annHn vs $bruteHn")
    val brutePp = top1(Similarity.positivePairs(vecs, vecs, k = 3))
    val annPp = top1(Similarity.positivePairsAnn(spark, dir, vecs,
      k = 3, nProbe = 2))
    assert(annPp == brutePp)
    // the mined negative really is cross-label on every anchor
    val labels = vecs.select(col("vec_id"), col("label"))
      .as[(Long, String)].collect().toMap
    annHn.foreach { case (q, c) => assert(labels(q) != labels(c)) }
    // an unlabeled index refuses to mine (fail loudly, not empty)
    val bare = TestSpark.tmpDir("ivf_nolabel")
    Similarity.buildIvfIndex(vecs, bare, nCentroids = 4,
      centers = Some(Similarity.lowestIdCenters(vecs, 4)))
    assertThrows[IllegalArgumentException] {
      Similarity.hardNegativesAnn(spark, bare, vecs, k = 1)
    }
  }

  test("appendToIvfIndex: append == full rebuild (same quantizer); " +
    "files only ever added; quantized + labeled layouts detected") {
    val full = corpus
    val build = full.filter(col("vec_id") % 5 =!= 0)
    val batch = full.filter(col("vec_id") % 5 === 0)
    val centers = Similarity.lowestIdCenters(build, 8)
    val appended = TestSpark.tmpDir("ivf_append")
    Similarity.buildIvfIndex(build, appended, nCentroids = 8,
      centers = Some(centers))
    def files(d: String): Set[String] =
      new java.io.File(s"$d/assignments").listFiles.filter(_.isDirectory)
        .flatMap(_.listFiles).map(_.getPath.stripPrefix(d))
        .filter(_.endsWith(".parquet")).toSet
    val before = files(appended)
    Similarity.appendToIvfIndex(batch, appended)
    // pure append: every pre-existing file still present, new ones added
    val after = files(appended)
    assert(before.subsetOf(after) && after.size > before.size)
    // equality oracle: an index built over EVERYTHING with the same
    // centers answers identically
    val rebuilt = TestSpark.tmpDir("ivf_rebuild")
    Similarity.buildIvfIndex(full, rebuilt, nCentroids = 8,
      centers = Some(centers))
    val q = full.filter(col("vec_id") < 4)
    def ranked(d: String) =
      Similarity.queryIvfIndex(spark, d, q, k = 5, nProbe = 3)
        .select("query_id", "corpus_id", "rank", "cos")
        .as[(Long, Long, Int, Double)].collect().sortBy(r => (r._1, r._3))
    assert(ranked(appended).toSeq == ranked(rebuilt).toSeq)
    // int8 layout: the append detects cvec_q and stores quantized
    val qdir = TestSpark.tmpDir("ivf_append_q")
    Similarity.buildIvfIndex(build, qdir, nCentroids = 8,
      quantize = true, centers = Some(centers))
    Similarity.appendToIvfIndex(batch, qdir)
    val qdf = spark.read.parquet(s"$qdir/assignments")
    assert(qdf.schema("cvec_q").dataType ==
      org.apache.spark.sql.types.BinaryType)
    assert(qdf.count() == full.count())
    // labeled layout: the label column survives the append
    val labeled = clusteredLabeled
    val ldir = TestSpark.tmpDir("ivf_append_l")
    Similarity.buildIvfIndex(labeled.filter(col("vec_id") < 12), ldir,
      nCentroids = 4, labelCol = Some("label"),
      centers = Some(Similarity.lowestIdCenters(labeled, 4)))
    Similarity.appendToIvfIndex(labeled.filter(col("vec_id") >= 12), ldir)
    val ldf = spark.read.parquet(s"$ldir/assignments")
    assert(ldf.columns.contains("label") && ldf.count() == 24 &&
      ldf.filter(col("label").isNull).count() == 0)
  }

  test("IVF index: non-default label column name, quantized + labeled") {
    // labelCol other than "label" must work for build (incl. the
    // quantized layout, where the stored column is already renamed)
    // and for append (whose batch carries the caller's column name)
    val renamed = clusteredLabeled.withColumnRenamed("label", "lang")
    val centers = Some(Similarity.lowestIdCenters(renamed, 4))
    val dir = TestSpark.tmpDir("ivf_lbl_q")
    Similarity.buildIvfIndex(renamed.filter(col("vec_id") < 12), dir,
      nCentroids = 4, quantize = true, labelCol = Some("lang"),
      centers = centers)
    Similarity.appendToIvfIndex(renamed.filter(col("vec_id") >= 12), dir,
      labelCol = "lang")
    val df = spark.read.parquet(s"$dir/assignments")
    assert(df.columns.contains("label") && df.columns.contains("cvec_q"))
    assert(df.count() == 24 && df.filter(col("label").isNull).count() == 0)
  }

  test("hardNegatives: same-label near-twin excluded, hardest " +
    "different-label vector ranks first") {
    import org.apache.spark.sql.functions.col
    // anchor 0 (label A) has a same-label NEAR-TWIN 1 (cos ~1, must be
    // excluded) and a different-label near vector 2 (the hard negative
    // that must rank 1); 3 is a far different-label vector
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f), "A"),
      (1L, Array(0.999f, 0.01f, 0.0f), "A"),   // near-twin, same label
      (2L, Array(0.9f, 0.4f, 0.0f), "B"),      // hard negative
      (3L, Array(0.0f, 0.0f, 1.0f), "B"),      // easy negative
      (4L, Array(0.5f, 0.5f, 0.1f), "A"))
      .toDF("vec_id", "embedding", "label")
    val out = Similarity.hardNegatives(vecs,
        vecs.filter(col("vec_id") === 0L), k = 2)
      .collect().map(r => (r.getLong(1), r.getInt(2), r.getString(4)))
    assert(out.map(_._1).toSeq == Seq(2L, 3L),
      s"expected hard negative 2 then easy 3, got ${out.toSeq}")
    assert(out.forall(_._3 == "B"), "every mined negative is cross-label")
  }

  test("appended planted near-copy is immediately retrievable " +
    "(planted-structure top-1 survives appends)") {
    // the drift guard behind tools/AnnRecall's N-batch rows: a near-copy
    // arriving through the APPEND path (stale quantizer, new rows) must
    // surface as its source's top-1, or the unrefit-quantizer trade
    // would silently break retrieval rather than merely eroding recall
    val build = corpus.filter(col("vec_id") < 50)
    val dir = TestSpark.tmpDir("ivf_append_plant")
    Similarity.buildIvfIndex(build, dir, nCentroids = 8)
    Similarity.appendToIvfIndex(corpus.filter(col("vec_id") === 999), dir)
    val got = Similarity.queryIvfIndex(spark, dir,
        corpus.filter(col("vec_id") === 0), k = 1, nProbe = 3)
      .select("corpus_id").as[Long].collect()
    assert(got.toSeq == Seq(999L),
      s"planted near-copy not top-1 through the appended index: $got")
  }

  test("ivfRecallCanary == local set recall; maintainIvfIndex rebuilds " +
    "only below the floor and preserves layout") {
    val vecs = corpus.filter(col("vec_id") < 50)
    val dir = TestSpark.tmpDir("ivf_canary")
    Similarity.buildIvfIndex(vecs, dir, nCentroids = 8)
    val canary = vecs.filter(col("vec_id") < 6)
    def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select(col("query_id").cast("long"), col("corpus_id").cast("long"))
        .as[(Long, Long)].collect().toSet
    val r = Similarity.ivfRecallCanary(spark, dir, canary, k = 5, nProbe = 2)
    CacheRegistry.releaseAll()
    val exact = pairs(Similarity.bruteForceTopK(vecs, canary, 5))
    val approx = pairs(Similarity.queryIvfIndex(spark, dir, canary, 5,
      nProbe = 2))
    assert(r == (approx & exact).size.toDouble / exact.size)
    // floor not breached: no rebuild, files untouched
    def files(): Set[String] =
      new java.io.File(s"$dir/assignments").listFiles.filter(_.isDirectory)
        .flatMap(_.listFiles).map(_.getPath).toSet
    val before = files()
    val (r0, rebuilt0) = Similarity.maintainIvfIndex(spark, dir, canary,
      minRecall = 0.0, k = 5, nProbe = 2)
    assert(!rebuilt0 && r0 == r && files() == before)
    // forced rebuild: rows preserved; the centroid COUNT is detected
    // from the standing quantizer (no parameter — a fixed default
    // would silently resize a production index); a full-probe canary
    // of the refit index is exact
    val (r1, rebuilt1) = Similarity.maintainIvfIndex(spark, dir, canary,
      minRecall = 1.01, k = 5, nProbe = 2)
    assert(rebuilt1 && r1 == r)
    // the rebuild is an atomic VERSION FLIP: v=1 published, the old
    // flat tree untouched (probes in flight keep a complete snapshot)
    assert(IndexVersions.currentVersion(dir).contains(1))
    assert(files() == before, "old snapshot must be untouched")
    val root1 = IndexVersions.resolve(dir)
    assert(spark.read.parquet(s"$root1/assignments").count() == 50)
    assert(spark.read.parquet(s"$root1/centroids").count() == 8)
    assert(Similarity.ivfRecallCanary(spark, dir, canary, k = 5,
      nProbe = 8) == 1.0)
    CacheRegistry.releaseAll()
    // pruneKeep GC: with versions {1,2} keep=2 deletes nothing (the
    // previous snapshot stays for in-flight probes); the THIRD rebuild
    // prunes v=1. The legacy flat tree is never touched.
    val (_, r2) = Similarity.maintainIvfIndex(spark, dir, canary,
      minRecall = 1.01, k = 5, nProbe = 2, pruneKeep = Some(2))
    assert(r2 && IndexVersions.currentVersion(dir).contains(2))
    assert(new java.io.File(s"$dir/v=1").exists(),
      "keep=2 must retain the previous snapshot")
    val (_, r3) = Similarity.maintainIvfIndex(spark, dir, canary,
      minRecall = 1.01, k = 5, nProbe = 2, pruneKeep = Some(2))
    assert(r3 && IndexVersions.currentVersion(dir).contains(3))
    assert(!new java.io.File(s"$dir/v=1").exists(),
      "the third rebuild with keep=2 must delete v=1")
    assert(new java.io.File(s"$dir/v=2").exists() &&
      new java.io.File(s"$dir/v=3").exists())
    assert(files() == before, "the legacy flat tree is never pruned")
    CacheRegistry.releaseAll()
    // quantized + labeled layout survives the rebuild
    val labeled = clusteredLabeled
    val qdir = TestSpark.tmpDir("ivf_canary_q")
    Similarity.buildIvfIndex(labeled, qdir, nCentroids = 4,
      quantize = true, labelCol = Some("label"),
      centers = Some(Similarity.lowestIdCenters(labeled, 4)))
    val (_, rq) = Similarity.maintainIvfIndex(spark, qdir,
      labeled.filter(col("vec_id") < 4), minRecall = 1.01, k = 3,
      nProbe = 2)
    assert(rq)
    val qroot = IndexVersions.resolve(qdir)
    val qdf = spark.read.parquet(s"$qroot/assignments")
    assert(qdf.columns.contains("cvec_q") && qdf.columns.contains("label"))
    assert(spark.read.parquet(s"$qroot/centroids").count() == 4)
    assert(qdf.count() == labeled.count() &&
      qdf.filter(col("label").isNull).count() == 0)
    CacheRegistry.releaseAll()
  }

  test("compactIvfCells: file fan-in stays bounded across 20 appends; " +
    "probe results identical to the uncompacted twin") {
    val build = corpus.filter(col("vec_id") < 50)
    val centers = Similarity.lowestIdCenters(build, 8)
    val compacted = TestSpark.tmpDir("ivf_compact")
    val loose = TestSpark.tmpDir("ivf_loose")
    for (d <- Seq(compacted, loose))
      Similarity.buildIvfIndex(build, d, nCentroids = 8,
        centers = Some(centers))
    def batch(b: Int) = (0 until 5)
      .map(j => (10000L + b * 5 + j, vec(2000 + b * 5 + j)))
      .toDF("vec_id", "embedding")
    def maxFilesPerCell(d: String): Int =
      new java.io.File(s"${IndexVersions.resolve(d)}/assignments").listFiles
        .filter(f => f.isDirectory && f.getName.startsWith("cell="))
        .map(_.listFiles.count(_.getName.endsWith(".parquet"))).max
    val threshold = 3
    for (b <- 0 until 20) {
      Similarity.appendToIvfIndex(batch(b), compacted,
        compactOver = Some(threshold))
      Similarity.appendToIvfIndex(batch(b), loose)
      // the policy's invariant: after every batch hook, no cell exceeds
      // the threshold (over-threshold cells just compacted back to 1)
      assert(maxFilesPerCell(compacted) <= threshold,
        s"batch $b: fan-in ${maxFilesPerCell(compacted)} > $threshold")
    }
    // the bound is real: the unmaintained twin's fan-in grew past it
    assert(maxFilesPerCell(loose) > threshold,
      s"loose twin never exceeded the threshold — test is vacuous")
    // probe equality: rows were only rewritten, never changed
    val q = corpus.filter(col("vec_id") < 4)
    def ranked(d: String) =
      Similarity.queryIvfIndex(spark, d, q, k = 5, nProbe = 3)
        .select("query_id", "corpus_id", "rank", "cos")
        .as[(Long, Long, Int, Double)].collect().sortBy(r => (r._1, r._3)).toSeq
    assert(ranked(compacted) == ranked(loose))
    // whole-index compaction of the loose twin: files drop, answers don't
    val (before, after) = Similarity.compactIvfCells(spark, loose)
    assert(after < before, s"expected fewer files, got $before -> $after")
    assert(maxFilesPerCell(loose) == 1)
    assert(ranked(compacted) == ranked(loose))
  }

  test("whole-index rewrites fold rows appended between snapshot and " +
    "publish — zero row loss under a concurrent writer") {
    val build = corpus.filter(col("vec_id") < 40)
    val centers = Similarity.lowestIdCenters(build, 4)
    val dir = TestSpark.tmpDir("ivf_concurrent")
    Similarity.buildIvfIndex(build, dir, nCentroids = 4,
      centers = Some(centers))
    def idsNow: Set[Long] = spark.read
      .parquet(s"${IndexVersions.resolve(dir)}/assignments")
      .select("corpus_id").as[Long].collect().toSet
    // compaction: the append lands AFTER the snapshot listing is
    // pinned — the lost-append window the delta-file guard closes
    // (losing it would be permanent: vecs_seen refuses re-appends)
    val late1 = (0 until 7).map(j => (50000L + j, vec(3000 + j)))
      .toDF("vec_id", "embedding")
    Similarity.compactIvfCells(spark, dir, None,
      () => Similarity.appendToIvfIndex(late1, dir))
    val ids1 = idsNow
    assert(ids1.size == 47 && (50000L until 50007L).forall(ids1),
      s"compaction lost appended rows: ${ids1.size}")
    // rebuild (forced via an unreachable recall floor): the append
    // lands after the rebuild consumed its pinned snapshot — the delta
    // anti-join must carry it through the NEW quantizer before publish
    val late2 = (0 until 5).map(j => (60000L + j, vec(4000 + j)))
      .toDF("vec_id", "embedding")
    val (_, rebuilt) = Similarity.maintainIvfIndex(spark, dir,
      corpus.filter(col("vec_id") < 3), 1.01, 5, 4, None,
      "vec_id", "embedding", None,
      () => Similarity.appendToIvfIndex(late2, dir))
    assert(rebuilt)
    val ids2 = idsNow
    assert(ids2 == ids1 ++ (60000L until 60005L),
      "rebuild lost rows appended during the snapshot window")
    // and a mid-rebuild vector is actually retrievable post-flip (the
    // probe excludes self-matches, so ask with a near-copy under a
    // fresh query id: top-1 must be the vector appended mid-rebuild)
    val nearCopy = Seq((7777L, vec(4000).map(_ * 1.01f)))
      .toDF("vec_id", "embedding")
    val hit = Similarity.queryIvfIndex(spark, dir, nearCopy,
        k = 1, nProbe = 4)
      .select("corpus_id").as[Long].head()
    assert(hit == 60000L)
    CacheRegistry.releaseAll()
  }
}
