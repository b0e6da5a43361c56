package graft

import graft.core.Lcg
import graft.functions.ColumnFns
import graft.ops.{Dedup, Multimodal, Packing, PassageDedup, Sampling, Similarity, TextAnalysis}
import org.apache.spark.sql.{DataFrame, SparkSession, functions => F}
import org.scalatest.funsuite.AnyFunSuite

/** Correctness of the training-data ops that have no SQL oracle: LSH
  * candidate recall vs brute force, ANN recall on clustered vectors,
  * custom expressions, multimodal stub plumbing. */
class OpsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("ops-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  // vocab must be large vs doc length, else unrelated docs share most of
  // their token sets and "near-dup" loses meaning
  private val words: Vector[String] = (0 until 300).map(i => s"w$i").toVector

  /** 40 base docs; ids 1000+i are near-dup copies of base i<20 (each 10th
    * token dropped); ids 2000+ are unrelated. */
  private def nearDupCorpus(): DataFrame = {
    import spark.implicits._
    val r = new Lcg(99L)
    val base = (0 until 40).map { i =>
      (i.toLong, (0 until 80).map(_ => words(r.nextInt(words.length))).mkString(" "))
    }
    val copies = base.take(20).map { case (i, t) =>
      (1000L + i, t.split(" ").zipWithIndex.collect { case (w, j) if j % 20 != 7 => w }.mkString(" "))
    }
    (base ++ copies).toDF("doc_id", "text")
  }

  /** Ground truth on the SAME similarity the operator targets: w-shingle
    * Jaccard, computed brute-force over all pairs. */
  private def trueJaccardPairs(df: DataFrame, minMilli: Long): Set[(Long, Long)] = {
    import spark.implicits._
    val t = df.select($"doc_id".as("id"),
      Dedup.shinglesCol(Dedup.tokensCol($"text"), 3).as("tk"))
    val a = t.select($"id".as("id_a"), $"tk".as("tk_a"))
    val b = t.select($"id".as("id_b"), $"tk".as("tk_b"))
    a.crossJoin(b).filter($"id_a" < $"id_b")
      .select($"id_a", $"id_b",
        F.floor(F.size(F.array_intersect($"tk_a", $"tk_b")) * 1000L /
          F.size(F.array_union($"tk_a", $"tk_b"))).as("jm"))
      .filter($"jm" >= minMilli)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
  }

  test("minhash LSH finds every true near-dup pair (jaccard >= 0.7)") {
    val corpus = nearDupCorpus()
    val truth = trueJaccardPairs(corpus, 700L)
    assert(truth.size >= 18, s"corpus should contain >=18 true near-dup pairs, got ${truth.size}")
    val found = Dedup.minhashCandidates(corpus, "doc_id", "text", w = 3, minJaccardMilli = 500L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val missed = truth -- found
    assert(missed.isEmpty, s"LSH missed true pairs: $missed")
  }

  test("minhash candidates report exact Jaccard (verified against brute force)") {
    import spark.implicits._
    val corpus = nearDupCorpus()
    val cand = Dedup.minhashCandidates(corpus, "doc_id", "text", w = 3, minJaccardMilli = 0L)
    // every reported pair's shingle-jaccard must be internally consistent
    // (recompute one pair by hand)
    val row = cand.orderBy($"id_a", $"id_b").first()
    val (ia, ib) = (row.getLong(0), row.getLong(1))
    val texts = corpus.filter($"doc_id".isin(ia, ib)).orderBy($"doc_id")
      .collect().map(_.getString(1))
    def sh(t: String) = t.split("\\s+").filter(_.nonEmpty).sliding(3).map(_.mkString(" ")).toSet
    val (sa, sb) = (sh(texts(0)), sh(texts(1)))
    val exp = (sa.intersect(sb).size * 1000L) / sa.union(sb).size
    assert(row.getLong(2) == exp, s"pair ($ia,$ib): got ${row.getLong(2)} want $exp")
  }

  test("simhash finds near-identical docs, not unrelated ones") {
    import spark.implicits._
    val corpus = nearDupCorpus()
    val found = Dedup.simhashCandidates(corpus, "doc_id", "text", maxHamming = 12)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // copies differ by ~8 of 80 tokens -> small hamming; unrelated pairs ~32
    val copies = (0 until 20).map(i => (i.toLong, 1000L + i)).toSet
    val foundCopies = copies.intersect(found)
    assert(foundCopies.size >= 16, s"only ${foundCopies.size}/20 copy pairs found")
    val unrelated = found.filter { case (a, b) => b < 1000 || a >= 1000 }
    assert(unrelated.isEmpty, s"false positives among unrelated docs: $unrelated")
  }

  test("exact dedup groups verbatim copies only") {
    import spark.implicits._
    val base = nearDupCorpus()
    val dup = base.filter($"doc_id" < 5).select(($"doc_id" + 5000L).as("doc_id"), $"text")
    val groups = Dedup.exactGroups(base.unionByName(dup), "doc_id", "text").collect()
    assert(groups.length == 5)
    assert(groups.forall(_.getLong(1) == 2L))
  }

  /** 30 clusters x 12 vectors around seeded centers — ANN ground truth is
    * in-cluster. */
  private def clusteredVectors(): DataFrame = {
    import spark.implicits._
    val r = new Lcg(7L)
    def unit(): Array[Float] = {
      val v = Array.fill(16)(((r.nextLong() >>> 11).toDouble / (1L << 53).toDouble - 0.5))
      val n = math.sqrt(v.map(x => x * x).sum)
      v.map(x => (x / n).toFloat)
    }
    val rows = (0 until 30).flatMap { c =>
      val center = unit()
      (0 until 12).map { j =>
        val noise = unit()
        val v = center.zip(noise).map { case (a, b) => a + 0.15f * b }
        ((c * 12 + j).toLong, v)
      }
    }
    rows.toDF("vec_id", "embedding")
  }

  test("brute-force top-k is exact and ANN recall is high on clustered vectors") {
    import spark.implicits._
    val vecs = clusteredVectors()
    val queries = vecs.filter($"vec_id" % 12 === 0) // one per cluster
    val exact = Similarity.bruteForceTopK(vecs, queries, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // exact top-5 of a cluster-member query must be dominated by its cluster
    val inCluster = exact.count { case (q, v) => q / 12 == v / 12 }
    assert(inCluster.toDouble / exact.size >= 0.9, s"exact top-k not cluster-dominated: $inCluster/${exact.size}")

    val ann = Similarity.annTopK(vecs, queries, k = 5, dim = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = exact.intersect(ann).size.toDouble / exact.size
    assert(recall >= 0.6, s"ANN recall@5 too low: $recall")
  }

  test("IVF ANN recall is high on clustered vectors") {
    import spark.implicits._
    val vecs = clusteredVectors()
    val queries = vecs.filter($"vec_id" % 12 === 0)
    val exact = Similarity.bruteForceTopK(vecs, queries, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = Similarity.ivfTopK(vecs, queries, k = 5, dim = 16, nCells = 8, nProbe = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = exact.intersect(ivf).size.toDouble / exact.size
    assert(recall >= 0.6, s"IVF recall@5 too low: $recall")
  }

  test("embedding near-dup pairs find injected exact copies") {
    import spark.implicits._
    val vecs = clusteredVectors()
    val copies = vecs.filter($"vec_id" % 36 === 0)
      .select(($"vec_id" + 10000L).as("vec_id"), $"embedding")
    val pairs = Similarity.nearDupPairs(vecs.unionByName(copies), dim = 16, minCosMilli = 990L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val expected = vecs.filter($"vec_id" % 36 === 0).collect()
      .map(r => (r.getLong(0), r.getLong(0) + 10000L)).toSet
    assert(expected.subsetOf(pairs), s"missing exact-copy pairs: ${expected -- pairs}")
  }

  test("embedding near-dup recall >= 0.9 on MUTATED (cos ~0.95, not identical) vectors") {
    import spark.implicits._
    val r = new Lcg(41L)
    def unit(dim: Int): Array[Double] = {
      val v = Array.fill(dim)((r.nextLong() >>> 11).toDouble / (1L << 53).toDouble - 0.5)
      val n = math.sqrt(v.map(x => x * x).sum)
      v.map(_ / n)
    }
    val dim = 16
    // 150 base vectors + a perturbed copy of each: v' = v + eps*noise has
    // cos(v, v') = 1/sqrt(1+eps^2) for orthogonal-ish noise; eps chosen so
    // cos lands ~0.95-0.97 — a TRUE near-dup, never bit-identical in LSH
    val rows = (0 until 150).flatMap { i =>
      val v = unit(dim)
      val noise = unit(dim)
      val eps = 0.28
      val m = v.zip(noise).map { case (a, b) => a + eps * b }
      Seq((i.toLong, v.map(_.toFloat)), (10000L + i, m.map(_.toFloat)))
    }
    val vecs = rows.toDF("vec_id", "embedding")
    // ground truth: brute-force cosine over the injected pairs
    val truth = rows.grouped(2).flatMap { g =>
      val (va, vb) = (g(0)._2.map(_.toDouble), g(1)._2.map(_.toDouble))
      val dot = va.zip(vb).map { case (x, y) => x * y }.sum
      val cos = dot / (math.sqrt(va.map(x => x * x).sum) * math.sqrt(vb.map(x => x * x).sum))
      if (math.floor(cos * 1000) >= 950) Some((g(0)._1, g(1)._1)) else None
    }.toSet
    assert(truth.size >= 50, s"need a meaningful truth set, got ${truth.size}")
    val found = Similarity.nearDupPairs(vecs, dim = dim, minCosMilli = 950L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = truth.intersect(found).size.toDouble / truth.size
    assert(recall >= 0.9, s"near-dup recall too low: $recall (${truth.size - truth.intersect(found).size} missed)")
    // precision is exact by construction: every reported pair passed the
    // cosine verify, so no pair below threshold may appear
    val below = found.filter { case (a, b) => !truth.contains((a, b)) && b == a + 10000L }
    assert(below.isEmpty, s"pairs below the cosine threshold reported: $below")
  }

  test("giant-bucket guard: oversized buckets emit linear star pairs; small buckets unchanged") {
    import graft.ops.Banding
    import spark.implicits._
    // one giant bucket (500 members), plus small buckets of 2 and 3
    val giant = (0 until 500).map(i => (0, 7L, 100L + i))
    val smalls = Seq((1, 8L, 1L), (1, 8L, 2L), (2, 9L, 3L), (2, 9L, 4L), (2, 9L, 5L))
    val banded = (giant ++ smalls).toDF("band_id", "band_hash", "id")
    val guarded = Banding.guardedPairs(banded, Seq("band_id", "band_hash"), "id",
        maxBucket = 50, "test-guard")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val star = (1 until 500).map(i => (100L, 100L + i)).toSet // anchored at min id
    val small = Set((1L, 2L), (3L, 4L), (3L, 5L), (4L, 5L))
    assert(guarded == star ++ small,
      s"want ${star.size} star + ${small.size} clique pairs, got ${guarded.size}")
    val stats = Banding.lastCapStats("test-guard").get
    assert(stats.nCappedBuckets == 1L && stats.nRowsInCapped == 500L &&
      stats.maxBucketSize == 500L)
    // with a high cap the same frame produces the full cliques and records
    // an (uncapped) stats row — the metric never goes silent
    val unguarded = Banding.guardedPairs(banded, Seq("band_id", "band_hash"), "id",
      maxBucket = 1000, "test-guard").count()
    assert(unguarded == 500L * 499L / 2L + small.size)
    assert(Banding.lastCapStats("test-guard").get.nCappedBuckets == 0L)
  }

  test("guard carryCols: pair rows carry both sides' values, incl. the capped star's anchor") {
    import graft.ops.Banding
    import spark.implicits._
    // value = id * 1000 so misattribution is loud; one capped bucket (6
    // members, cap 4) exercises the _anchor_<c> min_by path, small
    // buckets the self-join path
    val rows = ((0 until 6).map(i => (0, 7L, 10L + i, (10L + i) * 1000)) ++
      Seq((1, 8L, 1L, 1000L), (1, 8L, 2L, 2000L))).toDF("band_id", "band_hash", "id", "v")
    val got = Banding.guardedPairs(rows, Seq("band_id", "band_hash"), "id",
        maxBucket = 4, "test-carry", carryCols = Seq("v"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val star = (11 to 15).map(i => (10L, i.toLong, 10000L, i * 1000L)).toSet
    val small = Set((1L, 2L, 1000L, 2000L))
    assert(got == star ++ small, s"carry mismatch: $got")
  }

  test("guarded query construction and planning run no Spark jobs (lazy guard)") {
    import graft.ops.Banding
    import spark.implicits._
    // job-start times observed from the listener bus; FIFO delivery means
    // that once the count()'s own job events have arrived, any earlier
    // (construction-time) job event would already be in the queue
    val jobTimes = new java.util.concurrent.ConcurrentLinkedQueue[java.lang.Long]()
    val l = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobTimes.add(js.time)
    }
    spark.sparkContext.addSparkListener(l)
    try {
      val banded = Seq((0, 1L, 1L), (0, 1L, 2L), (0, 1L, 3L))
        .toDF("band_id", "band_hash", "id")
      val guarded = Banding.guardedPairs(banded, Seq("band_id", "band_hash"), "id",
        maxBucket = 2, "lazy-test")
      guarded.queryExecution.executedPlan // explain/planning must not run jobs either
      Thread.sleep(20)
      val tEnd = System.currentTimeMillis()
      // bucket of 3 > cap 2: the one bucket star-routes through anchor 1
      assert(guarded.collect().map(r => (r.getLong(0), r.getLong(1))).toSet ==
        Set((1L, 2L), (1L, 3L)))
      val deadline = System.nanoTime() + 30000000000L
      while (jobTimes.isEmpty && System.nanoTime() < deadline) Thread.sleep(5)
      assert(!jobTimes.isEmpty, "listener must observe the collect()'s jobs")
      val early = jobTimes.toArray(Array.empty[java.lang.Long]).filter(_ < tEnd)
      assert(early.isEmpty,
        s"constructing/planning a guarded query must run no Spark jobs, saw ${early.length}")
    } finally spark.sparkContext.removeSparkListener(l)
  }

  test("cap stats of a capped run are committed to a durable audit table") {
    import graft.ops.Banding
    import spark.implicits._
    val banded = (0 until 100).map(i => (0, 7L, 100L + i)).toDF("band_id", "band_hash", "id")
    assert(Banding.guardedPairs(banded, Seq("band_id", "band_hash"), "id",
      maxBucket = 10, "audit-test").count() == 99L) // star fan-out
    val dir = java.nio.file.Files.createTempDirectory("banding-audit").toString
    // tiers that never ran are skipped, not written as garbage rows
    assert(Banding.commitStats(spark, dir, Seq("audit-test", "never-ran")) == 0L)
    val r = Banding.readStats(spark, dir).get.collect()
    assert(r.length == 1)
    assert(r.head.getAs[String]("tier") == "audit-test"
      && r.head.getAs[Long]("n_capped_buckets") == 1L
      && r.head.getAs[Long]("n_rows_in_capped") == 100L
      && r.head.getAs[Long]("max_bucket_size") == 100L
      && r.head.getAs[Boolean]("stats_fresh"))
    assert(Banding.seenTiers.contains("audit-test"),
      "the drift-proof tier list must cover every constructed tier")
    // a later uncapped run commits a new snapshot; readStats serves the
    // newest — the metric never goes silent, it reads 0 capped buckets
    Banding.guardedPairs(banded, Seq("band_id", "band_hash"), "id",
      maxBucket = 1000, "audit-test").count()
    assert(Banding.commitStats(spark, dir, Seq("audit-test")) == 1L)
    assert(Banding.readStats(spark, dir).get.collect()
      .head.getAs[Long]("n_capped_buckets") == 0L)
  }

  test("minhash bucket guard: a boilerplate cluster stays linear; decisions match the unguarded clique") {
    import graft.ops.Banding
    import spark.implicits._
    val r = new Lcg(5L)
    val base = (0 until 120).map(_ => words(r.nextInt(words.length)))
    // an adversarial near- (not exact-) identical cluster: 1200 docs, each
    // dropping one rotating token position (pairwise Jaccard ~0.95), plus
    // unrelated docs — the web-corpus boilerplate shape the guard exists for
    val cluster = (0 until 1200).map { i =>
      (i.toLong, base.zipWithIndex.collect { case (w, j) if j != i % 120 => w }.mkString(" "))
    }
    val unrelated = (0 until 30).map(i =>
      (100000L + i, (0 until 80).map(_ => words(r.nextInt(words.length))).mkString(" ")))
    val corpus = (cluster ++ unrelated).toDF("doc_id", "text")
    val guarded = Dedup.minhashCandidates(corpus, "doc_id", "text",
      w = 3, minJaccardMilli = 700L, maxBucket = 100)
    val nPairs = guarded.count()
    // bounded: linear-ish in cluster size — nowhere near the ~720k clique
    assert(nPairs < 60000L, s"guarded candidate count should stay linear-ish: $nPairs")
    val stats = Banding.lastCapStats("minhash").get
    assert(stats.nCappedBuckets >= 1L, "the cluster must trip the cap")
    // keeper decisions: CC over the guarded pairs groups the whole cluster
    // under keeper 0, identically to the unguarded clique on this instance
    val comps = Dedup.connectedComponents(guarded)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    (0 until 1200).foreach(i =>
      assert(comps.get(i.toLong).contains(0L), s"doc $i not grouped under keeper 0"))
    val unguardedComps = Dedup.connectedComponents(
        Dedup.minhashCandidates(corpus, "doc_id", "text", w = 3, minJaccardMilli = 700L))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(comps == unguardedComps, "guarded and unguarded components must agree here")
  }

  test("simhash + embed tiers run through the same guard (capped calls recorded)") {
    import graft.ops.Banding
    import spark.implicits._
    // exact-identical texts share ALL simhash bands: 300 copies with cap 40
    val cluster = (0 until 300).map(i => (i.toLong, "alpha beta gamma delta epsilon"))
    val corpus = (cluster ++ Seq((9000L, "zeta eta theta iota kappa"))).toDF("doc_id", "text")
    val pairs = Dedup.simhashCandidates(corpus, "doc_id", "text", maxHamming = 3, maxBucket = 40)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(Banding.lastCapStats("simhash").get.nCappedBuckets >= 1L)
    // all four bands collapse to one bucket each -> the star is exactly the
    // (0, i) fan; every star pair passes the Hamming verify (distance 0)
    assert(pairs == (1 until 300).map(i => (0L, i.toLong)).toSet)
    // embed tier: identical vectors share all sign-LSH buckets
    val v = Array.fill(16)(0.1f)
    val vecs = ((0 until 200).map(i => (i.toLong, v)) :+ (5000L, v.map(x => -x)))
      .toDF("vec_id", "embedding")
    val epairs = Similarity.nearDupPairs(vecs, dim = 16, minCosMilli = 950L, maxBucket = 30)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(Banding.lastCapStats("embed").get.nCappedBuckets >= 1L)
    assert(epairs == (1 until 200).map(i => (0L, i.toLong)).toSet)
  }

  test("IVF centroid sample is layout-independent: repartition cannot change centroids") {
    import spark.implicits._
    val vecs = clusteredVectors() // 360 rows; sampleN below forces a real top-k sample
    val c1 = Similarity.trainCentroids(vecs, dim = 16, k = 8, sampleN = 100)
    val c2 = Similarity.trainCentroids(vecs.repartition(13), dim = 16, k = 8, sampleN = 100)
    val c3 = Similarity.trainCentroids(vecs.repartition(1), dim = 16, k = 8, sampleN = 100)
    assert(c1 == c2 && c1 == c3,
      "the coarse quantizer must be a pure function of the data, not the layout")
    // and the >=-table case (the oracle's assumption) is the whole table
    // in id order — also layout-independent
    val full1 = Similarity.trainCentroids(vecs, dim = 16, k = 8, sampleN = 4096)
    val full2 = Similarity.trainCentroids(vecs.repartition(7), dim = 16, k = 8, sampleN = 4096)
    assert(full1 == full2)
  }

  test("connected components merge transitive dup chains; min id labels the component") {
    import spark.implicits._
    // chain 1-2-3 (no direct 1-3 edge), isolated pair 10-11, and 20-21-22
    // star centered on 21
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L), (21L, 20L), (21L, 22L))
      .toDF("id_a", "id_b")
    val comps = graft.ops.Dedup.connectedComponents(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(comps == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L,
      20L -> 20L, 21L -> 20L, 22L -> 20L))
  }

  test("connected components: driver and distributed paths agree on a 60-hop chain") {
    import spark.implicits._
    // a templated near-dup ladder: 60 docs where each is a near-dup of the
    // next — diameter 59, far beyond any per-round propagation budget
    val n = 60
    val pairs = (1 until n).map(i => (i.toLong, (i - 1).toLong)).toDF("id_a", "id_b")
    val expected = (0 until n).map(i => i.toLong -> 0L).toMap
    val viaUnionFind = graft.ops.Dedup.connectedComponents(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaUnionFind == expected)
    // force the distributed path; pointer jumping contracts the 59-hop
    // chain in O(log d) rounds, so 12 iterations must suffice
    val viaPropagation = graft.ops.Dedup.connectedComponents(
        pairs, maxIter = 12, collectThreshold = 0L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaPropagation == expected)
  }

  test("connected components: distributed path fails loudly on iteration exhaustion") {
    import spark.implicits._
    val pairs = (1 until 40).map(i => (i.toLong, (i - 1).toLong)).toDF("id_a", "id_b")
    val e = intercept[IllegalStateException] {
      graft.ops.Dedup.connectedComponents(pairs, maxIter = 1, collectThreshold = 0L)
    }
    assert(e.getMessage.contains("did not converge"))
  }

  test("connected components: string ids work on both paths") {
    import spark.implicits._
    val pairs = Seq(("doc-b", "doc-a"), ("doc-c", "doc-b"), ("doc-x", "doc-y"))
      .toDF("id_a", "id_b")
    val expected = Map("doc-a" -> "doc-a", "doc-b" -> "doc-a", "doc-c" -> "doc-a",
      "doc-x" -> "doc-x", "doc-y" -> "doc-x")
    val uf = graft.ops.Dedup.connectedComponents(pairs)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(uf == expected)
    val prop = graft.ops.Dedup.connectedComponents(pairs, collectThreshold = 0L)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(prop == expected)
  }

  test("custom Fnv64 expression matches the reference FNV-1a and is deterministic") {
    import spark.implicits._
    def fnvRef(s: String): Long = {
      var h = 0xcbf29ce484222325L
      s.getBytes("UTF-8").foreach { b => h ^= (b & 0xffL); h *= 0x100000001b3L }
      h
    }
    val df = Seq("hello", "", "spark élève", "a b c").toDF("t")
    val got = df.select(ColumnFns.fnv64($"t")).collect().map(_.getLong(0))
    val exp = Seq("hello", "", "spark élève", "a b c").map(fnvRef)
    assert(got.toSeq == exp)
  }

  test("simhash64 expression: identical token arrays get identical signatures; order-insensitive-ish") {
    import spark.implicits._
    val df = Seq(
      Seq("a", "b", "c", "d"),
      Seq("a", "b", "c", "d"),
      Seq("x", "y", "z", "w")).toDF("toks")
    val sigs = df.select(Dedup.simhash64($"toks")).collect().map(_.getLong(0))
    assert(sigs(0) == sigs(1))
    assert(sigs(0) != sigs(2))
  }

  test("multimodal stubs: batched decode metadata + frame sampling are deterministic") {
    import spark.implicits._
    val df = Seq((1L, "hello world"), (2L, ""), (3L, "x" * 1000)).toDF("doc_id", "text")
    val meta = Multimodal.decodeMeta(spark, Multimodal.withBlob(df, "doc_id", "text"))
      .collect().map(m => m.id -> m).toMap
    assert(meta(1L).n_bytes == 11 && meta(1L).width == 320 + (11 % 16) * 64)
    assert(meta(3L).n_bytes == 1000 && meta(3L).format == (1000 % 3 match {
      case 0 => "png"; case 1 => "jpeg"; case _ => "webp" }))
    val frames = Multimodal.frameSample(spark, Multimodal.withBlob(df, "doc_id", "text"))
      .collect().map(f => f.id -> f).toMap
    assert(frames(3L).n_frames == 4) // 1000 bytes / 256 stride
    assert(frames(3L).sample_hex == "78787878") // 'x' at each stride
    val resized = Multimodal.resizeStub(spark, Multimodal.withBlob(df, "doc_id", "text"))
      .collect().map(r => r.getLong(0) -> r.getAs[Array[Byte]](1)).toMap
    assert(resized(3L).length == 250)
  }

  test("BPE token count: fixed merge table applied as left-to-right scans") {
    import graft.functions.BpeTokenCount
    import spark.implicits._
    // hand-traced merges: "the" -> t,h,e -> th,e -> the (1 symbol);
    // "there" -> the,r,e -> the,re (t+h, th+e, r+e) = 2;
    // "cat" -> c,a,t -> c,at = 2; "don't" -> [don]['][t] -> d,on | ' | t = 4
    assert(BpeTokenCount.countTokens("the") == 1)
    assert(BpeTokenCount.countTokens("there") == 2)
    assert(BpeTokenCount.countTokens("cat") == 2)
    assert(BpeTokenCount.countTokens("don't") == 4)
    assert(BpeTokenCount.countTokens("") == 0)
    assert(BpeTokenCount.countTokens("   ") == 0)
    // scan semantics: a merged symbol is not re-paired leftward in the
    // same pass — "ththth" merges pairwise to th,th,th (3), never th,thth
    assert(BpeTokenCount.countTokens("ththth") == 3)
    // column + SQL registration parity, and the lowercase contract
    val df = Seq("The cat", "THERE").toDF("text")
    val viaCol = df.select(TextAnalysis.tokenCountBpe(F.col("text"))).collect().map(_.getInt(0))
    assert(viaCol.toSeq == Seq(3, 2)) // "the"(1)+"cat"(2); "there"(2)
    val sqlSess = spark.newSession()
    graft.functions.GraftExtensions.register(sqlSess)
    assert(sqlSess.sql("SELECT graft_bpe_count('the cat')").first().getInt(0) == 3)
  }

  test("lang-id heuristic picks marker-dominant language; token counts handle edge cases") {
    import spark.implicits._
    val df = Seq(
      ("the cat and the dog is here", "en"),
      ("der hund und die katze ist", "de"),
      ("xyzzy plugh", "und"),
      ("", "und")).toDF("text", "expected")
    val got = df.select($"expected", TextAnalysis.langId($"text")).collect()
    got.foreach(r => assert(r.getString(0) == r.getString(1), r.toString))
    val counts = df.select(TextAnalysis.tokenCount($"text")).collect().map(_.getInt(0))
    assert(counts.toSeq == Seq(7, 6, 2, 0))
  }

  test("extToMime mirrors the reference suffix map incl. Path.suffix edge cases") {
    import spark.implicits._
    // reference examples/test_local_file.py:201-227; Python Path.suffix
    // returns '' for dotfiles and extension-less names
    val cases = Seq(
      ("scan.jpg", "image/jpeg"), ("scan.JPEG", "image/jpeg"),
      ("a/b/doc.PDF", "application/pdf"), ("x.tar.tif", "image/tiff"),
      ("deck.pptx", "application/vnd.openxmlformats-officedocument.presentationml.presentation"),
      ("sheet.xlsx", "application/vnd.openxmlformats-officedocument.spreadsheetml.sheet"),
      ("word.docx", "application/vnd.openxmlformats-officedocument.wordprocessingml.document"),
      ("photo.webp", "image/webp"), ("pic.bmp", "image/bmp"),
      ("notes.txt", "application/octet-stream"), // unknown extension
      ("README", "application/octet-stream"),    // no extension
      (".bashrc", "application/octet-stream"),   // dotfile: suffix is ''
      ("dir/.hidden", "application/octet-stream"),
      ("scan..tif", "image/tiff"),               // Path('scan..tif').suffix == '.tif'
      ("..tif", "image/tiff"))                   // Path('..tif').suffix == '.tif' (dot not at name[0])
    val got = cases.map(_._1).toDF("path")
      .select($"path", ColumnFns.extToMime($"path").as("mime"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    cases.foreach { case (p, want) => assert(got(p) == want, s"path=$p") }
  }

  test("driver contract: every query carries an oracle or sits on the explicit no-oracle list") {
    // the one surface SQL cannot replay: the HTML/PDF extractors over the
    // Scala-generated fixture corpus (golden-suite domain). Adding a query
    // without an oracle must be a CONSCIOUS decision that updates this
    // list, not an accident.
    val knownNoOracle = Set("extract_fixture")
    val queries = SparkEntry.queries.keySet
    val oracles = SparkEntry.oracleSql.keySet
    assert(oracles.subsetOf(queries),
      s"oracles without a query: ${oracles -- queries}")
    assert(queries -- oracles == knownNoOracle,
      s"queries missing an oracle beyond the known list: ${queries -- oracles -- knownNoOracle}")
    // every oracle is non-empty, single-statement-ish, and ends in a
    // deterministic ORDER BY (the driver compare sorts, but a stable
    // oracle keeps diffs reproducible)
    SparkEntry.oracleSql.foreach { case (name, sql) =>
      assert(sql.trim.nonEmpty && sql.toUpperCase.contains("ORDER BY"), s"$name oracle malformed")
    }
  }

  test("repetition metrics: exact dup-line and top-n-gram fractions") {
    import spark.implicits._
    // "a b a b a": bigrams ab,ba,ab,ba -> top 2 of 4 = 500; trigrams
    // aba,bab,aba -> top 2 of 3 = 666
    val df = Seq(
      ("a b a b a", "x\ny\nx"),
      ("only", "single")).toDF("toks_text", "lines_text")
    val got = df.select(
      TextAnalysis.topNgramFracMilli(Dedup.tokensCol($"toks_text"), 2),
      TextAnalysis.topNgramFracMilli(Dedup.tokensCol($"toks_text"), 3),
      TextAnalysis.dupLineFracMilli($"lines_text")).collect()
    assert(got(0).getLong(0) == 500L)
    assert(got(0).getLong(1) == 666L)
    assert(got(0).getLong(2) == 333L, "x,y,x -> 1 dup of 3 lines")
    assert(got(1).getLong(0) == 0L, "one token holds no bigram")
    assert(got(1).getLong(2) == 0L, "single line: no dups")
    // SQL registration parity
    val viaSql = spark.newSession()
    graft.functions.GraftExtensions.register(viaSql)
    assert(viaSql.sql("SELECT graft_top_ngram_frac(array('a','b','a','b'), 2)")
      .first().getLong(0) == 666L) // ab,ba,ab -> top 2 of 3
  }

  test("hash sampling is deterministic, rate-accurate, and partition-independent") {
    import graft.ops.Sampling
    import spark.implicits._
    val df = spark.range(20000).select($"id".as("doc_id"))
    val a = Sampling.hashSample(df, "doc_id", "s1", 0.1).collect().map(_.getLong(0)).toSet
    // same ids on a different partitioning and a re-run (pure function of id)
    val b = Sampling.hashSample(df.repartition(17), "doc_id", "s1", 0.1)
      .collect().map(_.getLong(0)).toSet
    assert(a == b, "sample must not depend on partitioning or run")
    val rate = a.size.toDouble / 20000
    assert(rate > 0.08 && rate < 0.12, s"10% sample off: $rate")
    // different salts draw independent samples
    val c = Sampling.hashSample(df, "doc_id", "s2", 0.1).collect().map(_.getLong(0)).toSet
    val overlap = a.intersect(c).size.toDouble / a.size
    assert(overlap < 0.2, s"salts must be independent: overlap $overlap")
    // rate 1.0 keeps EVERY doc (the "g" sentinel beats any hex key —
    // "ffffffff" with strict < would drop keys equal to the max)
    assert(Sampling.hashSample(df, "doc_id", "s1", 1.0).count() == 20000L)
    assert(Sampling.thresholdFor(1.0) == "g")
    assert(Sampling.hashSample(df, "doc_id", "s1", 0.0).count() == 0L)
  }

  test("weighted sampling keeps each doc with probability equal to its weight") {
    import graft.ops.Sampling
    import spark.implicits._
    val df = spark.range(30000).select($"id".as("doc_id"),
      F.when($"id" % 3 === 0, 0.1).when($"id" % 3 === 1, 0.5).otherwise(1.0).as("w"))
    val kept = Sampling.weightedSample(df, "doc_id", "wtest", F.col("w"))
      .groupBy("w").count().collect().map(r => r.getDouble(0) -> r.getLong(1)).toMap
    assert(kept(1.0) == 10000L, "weight 1.0 keeps every doc (sentinel threshold)")
    assert(kept(0.5) > 4600 && kept(0.5) < 5400, s"weight 0.5 ~50%: $kept")
    assert(kept(0.1) > 800 && kept(0.1) < 1200, s"weight 0.1 ~10%: $kept")
    assert(Sampling.weightedSample(df, "doc_id", "wtest", F.lit(0.0)).count() == 0L)
  }

  test("weighted sampling fails loudly on NULL weights instead of silently dropping") {
    import graft.ops.Sampling
    import spark.implicits._
    val df = spark.range(10).select($"id".as("doc_id"),
      F.when($"id" % 2 === 0, 1.0).as("w")) // odd ids -> NULL weight
    val e = intercept[Exception] {
      Sampling.weightedSample(df, "doc_id", "wnull", F.col("w")).count()
    }
    def messages(t: Throwable): String =
      if (t == null) "" else t.getMessage + "\n" + messages(t.getCause)
    assert(messages(e).contains("NULL weight"),
      s"expected the explicit NULL-weight error, got: ${messages(e)}")
  }

  test("stratified sampling applies per-stratum rates; unlisted strata drop") {
    import graft.ops.Sampling
    import spark.implicits._
    val df = spark.range(30000)
      .select($"id".as("doc_id"),
        F.when($"id" % 3 === 0, "en").when($"id" % 3 === 1, "de").otherwise("xx").as("lang"))
    val got = Sampling.stratifiedSample(df, "doc_id", "lang", "mix",
      Seq("en" -> 0.2, "de" -> 0.9)).groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(!got.contains("xx"), "unlisted stratum must drop")
    assert(got("en") > 1600 && got("en") < 2400, s"en ~20% of 10000: $got")
    assert(got("de") > 8600 && got("de") < 9400, s"de ~90% of 10000: $got")
  }

  test("decontamination flags n-gram overlap with the benchmark, not unrelated docs") {
    import graft.ops.Decontaminate
    import spark.implicits._
    val r = new Lcg(123L)
    def text(n: Int) = (0 until n).map(_ => words(r.nextInt(words.length))).mkString(" ")
    val bench = (0 until 5).map(i => (1000L + i, text(60))).toDF("doc_id", "text")
    val benchRows = bench.collect().map(r => r.getLong(0) -> r.getString(1))
    // corpus: unrelated docs + one doc quoting 10 consecutive benchmark
    // tokens (≥ 3 intact 8-grams) + one doc with only a 5-token quote
    // (no intact 8-gram)
    val quote10 = benchRows.head._2.split(" ").slice(20, 30).mkString(" ")
    val quote5 = benchRows.head._2.split(" ").slice(40, 45).mkString(" ")
    val corpus = ((0 until 20).map(i => (i.toLong, text(60))) ++ Seq(
      (500L, text(20) + " " + quote10 + " " + text(20)),
      (501L, text(20) + " " + quote5 + " " + text(20)))).toDF("doc_id", "text")
    val got = Decontaminate.flag(corpus, bench, "doc_id", "text", w = 8)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(2)))).toMap
    assert(got(500L)._2, s"10-token quote must be contaminated: ${got(500L)}")
    assert(got(500L)._1 >= 3, s"10 consecutive tokens contain >= 3 distinct 8-grams: ${got(500L)}")
    assert(!got(501L)._2, s"5-token quote holds no intact 8-gram: ${got(501L)}")
    // empty benchmark: every doc comes back clean (0 hits), nothing throws
    val clean = Decontaminate.flag(corpus, bench.filter($"doc_id" < 0), "doc_id", "text", w = 8)
      .agg(F.sum("n_hits"), F.count(F.lit(1))).first()
    assert(clean.getLong(0) == 0L && clean.getLong(1) == 22L)
  }

  test("sampling and decontamination keep their scale-critical plan shapes") {
    import org.apache.spark.sql.execution.FormattedMode
    // sampling: column-pruned scan + one codegen'd filter; the only
    // exchange is the output sort
    val sample = SparkEntry.queries("q_sample_stratified")(spark, "/root/testdata/sf0.001")
    val sPlan = sample.queryExecution.explainString(FormattedMode)
    assert(sPlan.contains("ReadSchema: struct<doc_id:bigint,lang:string>"),
      "sample scan must prune to (doc_id, lang)")
    // the operator itself is shuffle-free: the only exchange is the output
    // ORDER BY's range partitioning — no hash shuffle, no broadcast
    assert(!sPlan.contains("BroadcastExchange"), "sampling must not broadcast anything")
    assert(!sPlan.contains("hashpartitioning"), "sampling must not hash-shuffle")
    // decontamination: bench grams broadcast; corpus grams join map-side
    val decon = SparkEntry.queries("q_decontaminate")(spark, "/root/testdata/sf0.001")
    val dPlan = decon.queryExecution.explainString(FormattedMode)
    assert(dPlan.contains("BroadcastHashJoin Inner BuildRight"),
      "corpus-side gram join must build on the broadcast bench side")
    assert(dPlan.contains("BroadcastExchange"),
      "bench gram set must broadcast")
  }

  test("q_ann_recall: recall@5 of both ANN paths >= 0.9 on the real embeddings table") {
    val rows = SparkEntry.queries("q_ann_recall")(spark, "/root/testdata/sf0.001")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rows.keySet == Set("ivf", "lsh"))
    rows.foreach { case (m, milli) =>
      assert(milli >= 900L, s"$m recall@5 = ${milli / 1000.0} < 0.9")
    }
  }

  test("semdedup: transitive within-cell components keep the min id; distant vectors survive") {
    import spark.implicits._
    def v(x: Double, y: Double, z: Double): Array[Float] =
      Array(x.toFloat, y.toFloat, z.toFloat, 0f)
    val c15 = math.cos(math.toRadians(15)); val s15 = math.sin(math.toRadians(15))
    val c30 = math.cos(math.toRadians(30)); val s30 = math.sin(math.toRadians(30))
    // x-plane chain 1-2-3: cos(1,2)=cos(2,3)=cos15deg≈0.966 >= 0.95 but
    // cos(1,3)=cos30deg≈0.866 < 0.95 — the component exists only through
    // transitivity; 4 is an exact dup of 1; 10/11 are a separate z-axis
    // near-dup pair
    val rows = Seq(
      1L -> v(1, 0, 0), 2L -> v(c15, s15, 0), 3L -> v(c30, s30, 0),
      4L -> v(1, 0, 0), 10L -> v(0, 0, 1), 11L -> v(0.1, 0, 1))
    val df = rows.toDF("vec_id", "embedding")
    val got = Similarity.semDedup(df, dim = 4, minCosMilli = 950L, nCells = 2)
      .collect().map(r => r.getLong(0) -> ((r.getLong(2), r.getString(3)))).toMap
    assert(got(1L) == ((1L, "kept")))
    assert(got(2L) == ((1L, "dropped")))
    assert(got(3L) == ((1L, "dropped")), "1~2~3 is ONE component though cos(1,3) < 0.95")
    assert(got(4L) == ((1L, "dropped")))
    assert(got(10L) == ((10L, "kept")))
    assert(got(11L) == ((10L, "dropped")))
    // decisions are a pure function of the data, not the layout
    val shuffled = Similarity.semDedup(df.repartition(5, $"vec_id"), dim = 4,
        minCosMilli = 950L, nCells = 2)
      .collect().map(r => r.getLong(0) -> ((r.getLong(2), r.getString(3)))).toMap
    assert(shuffled == got)
  }

  test("passage dedup: shared windows found at shifted alignment; owner reports zero") {
    import spark.implicits._
    // doc 1: 20 unique tokens a0..a19. doc 2: its own prefix/suffix with
    // doc 1's tokens a5..a16 embedded at offset 3 — a 12-token verbatim
    // passage at an alignment that is NOT a multiple of k. doc 3: < k
    // tokens. doc 4: verbatim copy of doc 1 (all windows shared).
    val a = (0 until 20).map(i => s"a$i")
    val doc1 = a.mkString(" ")
    val doc2 = (Seq("x0", "x1", "x2") ++ a.slice(5, 17) ++ Seq("y0", "y1", "y2")).mkString(" ")
    val doc3 = "short doc only six tokens here"
    val doc4 = doc1
    val df = Seq((1L, doc1), (2L, doc2), (3L, doc3), (4L, doc4)).toDF("doc_id", "text")
    val got = PassageDedup.stats(df, "doc_id", "text", k = 8)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // doc1: 13 windows (20-8+1), owner of everything it shares -> 0 shared
    assert(got(1L) == ((13L, 0L)), s"doc1: ${got(1L)}")
    // doc2: 18 tokens -> 11 windows; shared = windows fully inside the
    // 12-token embedded passage = 12-8+1 = 5
    assert(got(2L) == ((11L, 5L)), s"doc2: ${got(2L)}")
    assert(got(3L) == ((0L, 0L)), s"doc3 (< k tokens): ${got(3L)}")
    assert(got(4L) == ((13L, 13L)), s"doc4 (verbatim copy): ${got(4L)}")
  }

  test("passage dedup: decisions are partition-layout-independent") {
    import spark.implicits._
    val r = new Lcg(7L)
    val docs = (0 until 60).map { i =>
      (i.toLong, (0 until 30).map(_ => words(r.nextInt(words.length))).mkString(" "))
    } ++ Seq((100L, "chimera start " + (0 until 30).map(i => s"c$i").mkString(" ")),
             (101L, "other head " + (5 until 25).map(i => s"c$i").mkString(" ")))
    val df = docs.toDF("doc_id", "text")
    val base = PassageDedup.stats(df, "doc_id", "text", k = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val shuffled = PassageDedup.stats(df.repartition(7, $"text"), "doc_id", "text", k = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(base == shuffled)
    // the c5..c24 overlap: 20 shared tokens -> 13 shared windows for 101
    assert(base.exists { case (id, _, sh) => id == 101L && sh == 13L },
      s"expected doc 101 to share 13 windows: ${base.filter(_._1 == 101L)}")
  }

  test("passage removal: drop decision thresholds shared_milli; excision cuts owned spans in order") {
    import spark.implicits._
    // the stats test's fixture: doc2 embeds doc1's a5..a16 at offset 3;
    // doc4 is a verbatim copy of doc1; doc3 is shorter than k
    val a = (0 until 20).map(i => s"a$i")
    val doc1 = a.mkString(" ")
    val doc2 = (Seq("x0", "x1", "x2") ++ a.slice(5, 17) ++ Seq("y0", "y1", "y2")).mkString(" ")
    val doc3 = "short doc only six tokens here"
    val df = Seq((1L, doc1), (2L, doc2), (3L, doc3), (4L, doc1)).toDF("doc_id", "text")

    // doc2 shares 5/11 windows = 454‰ < 500 -> kept; doc4 1000‰ -> dropped
    val decisions = PassageDedup.dropByShared(df, "doc_id", "text", k = 8, dropMilli = 500L)
      .collect().map(r => r.getLong(0) -> ((r.getLong(3), r.getString(4)))).toMap
    assert(decisions == Map(1L -> ((0L, "kept")), 2L -> ((454L, "kept")),
      3L -> ((0L, "kept")), 4L -> ((1000L, "dropped"))))

    // excision: owner and short docs pass through verbatim; doc2 loses
    // exactly the embedded passage (covered tokens 3..14, order kept);
    // doc4 is cut to nothing
    val cut = PassageDedup.excise(df, "doc_id", "text", k = 8)
      .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2), r.getString(3)))).toMap
    assert(cut(1L) == ((20, 0, doc1)))
    assert(cut(2L) == ((18, 12, "x0 x1 x2 y0 y1 y2")), s"doc2: ${cut(2L)}")
    assert(cut(3L) == ((6, 0, doc3)))
    assert(cut(4L) == ((20, 20, "")))

    // layout-independence: decisions are a pure function of (id, text)
    val shuffled = PassageDedup.excise(df.repartition(5, $"text"), "doc_id", "text", k = 8)
      .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2), r.getString(3)))).toMap
    assert(shuffled == cut)
  }

  test("passage excise: equals an independent brute-force replay on a randomized spliced corpus") {
    import spark.implicits._
    val k = 8
    val r = new Lcg(97L)
    val vocab = (0 until 120).map(i => s"w$i").toVector
    def rndText(n: Int) = (0 until n).map(_ => vocab(r.nextInt(vocab.length))).mkString(" ")
    // random docs + spliced chimeras: each chimera embeds a random slice
    // of a random base at a random alignment behind random padding
    val bases = (0 until 40).map(i => (i.toLong, rndText(12 + r.nextInt(40))))
    val chimeras = (0 until 20).map { i =>
      val (_, srcText) = bases(r.nextInt(bases.length))
      val tk = srcText.split(" ")
      val from = r.nextInt(math.max(1, tk.length - 10))
      val mid = tk.slice(from, from + math.min(tk.length - from, 9 + r.nextInt(12)))
      ((100 + i).toLong,
        (rndText(r.nextInt(6)) + " " + mid.mkString(" ") + " " + rndText(r.nextInt(6))).trim)
    }
    val docs = bases ++ chimeras
    val got = PassageDedup.excise(docs.toDF("doc_id", "text"), "doc_id", "text", k = k)
      .collect().map(row => row.getLong(0) -> ((row.getInt(1), row.getInt(2), row.getString(3)))).toMap

    // independent replay from the public definitions: FNV-1a 64, the
    // whitespace tokenizer, stride-1 windows, distinct-per-doc min-id
    // ownership, covered-position union, ordered cut
    def fnvRef(s: String): Long = {
      var h = 0xcbf29ce484222325L
      s.getBytes("UTF-8").foreach { b => h ^= (b & 0xffL); h *= 0x100000001b3L }
      h
    }
    def toksRef(t: String): Vector[String] =
      t.toLowerCase.replaceAll("\\s+", " ").split(" ").filter(_.nonEmpty).toVector
    val tokMap = docs.map { case (id, t) => id -> toksRef(t) }.toMap
    val winOf = tokMap.map { case (id, tk) =>
      id -> (if (tk.length >= k)
        (0 to tk.length - k).map(p => p -> fnvRef(tk.slice(p, p + k).mkString(" ")))
      else Seq.empty[(Int, Long)])
    }
    val owners = winOf.toSeq
      .flatMap { case (id, ws) => ws.map(_._2).distinct.map(h => h -> id) }
      .groupBy(_._1)
      .collect { case (h, xs) if xs.map(_._2).distinct.size > 1 => h -> xs.map(_._2).min }
    var nonTrivial = 0
    docs.foreach { case (id, _) =>
      val tk = tokMap(id)
      val covered = winOf(id)
        .collect { case (p, h) if owners.get(h).exists(_ < id) => p until (p + k) }
        .flatten.toSet
      if (covered.nonEmpty && covered.size < tk.length) nonTrivial += 1
      val kept = tk.indices.filterNot(covered).map(tk)
      assert(got(id) == ((tk.length, tk.length - kept.length, kept.mkString(" "))), s"doc $id")
    }
    assert(nonTrivial >= 10, s"corpus must exercise PARTIAL cuts, got $nonTrivial")
  }

  test("per-group cap: equals the single-window rank; exact, skew-phase invisible") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val rows = (0 until 85).map { i =>
      val g = if (i < 50) "big" else if (i < 80) "mid" else "tiny"
      (i.toLong, g)
    }
    val df = rows.toDF("doc_id", "grp")
    val got = Sampling.cappedPerGroup(df, "doc_id", "grp", "t1", cap = 10, nShards = 4)
      .select($"doc_id", $"grp", $"rank")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2))).toSet
    // naive single-window reference (the semantics, minus the scale plan)
    val key = Sampling.sampleKey($"doc_id", "t1")
    val ref = df.withColumn("rank",
        F.row_number().over(Window.partitionBy($"grp").orderBy(key, $"doc_id")))
      .filter($"rank" <= 10)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2))).toSet
    assert(got == ref)
    assert(got.count(_._2 == "big") == 10 && got.count(_._2 == "mid") == 10)
    // under-cap group keeps everything, ranks 1..5
    assert(got.filter(_._2 == "tiny").map(_._3) == Set(1, 2, 3, 4, 5))
    // layout-independence
    val re = Sampling.cappedPerGroup(df.repartition(5, $"grp"), "doc_id", "grp", "t1",
        cap = 10, nShards = 4)
      .select($"doc_id", $"grp", $"rank")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2))).toSet
    assert(re == got)
  }

  test("sequence packing: exclusive-cumsum layout, budget-bounded offsets, deterministic") {
    import spark.implicits._
    val r = new Lcg(13L)
    val df = (0 until 200).map(i => (i.toLong, (0 until (5 + r.nextInt(60))).map(_ => "t").mkString(" ")))
      .toDF("doc_id", "text")
    val got = Packing.packSequences(df, "doc_id", TextAnalysis.tokenCount($"text"),
        budget = 64L, nShards = 4)
      .select($"doc_id", $"shard", $"n_tokens", $"seq_id", $"seq_offset")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(got.length == 200)
    // reference layout computed imperatively per shard
    val byShard = got.groupBy(_._2)
    byShard.foreach { case (shard, ds) =>
      var start = 0L
      ds.sortBy(_._1).foreach { case (id, _, n, seqId, off) =>
        assert(seqId == start / 64L, s"doc $id in shard $shard: seq $seqId != ${start / 64}")
        assert(off == start % 64L, s"doc $id: offset $off != ${start % 64}")
        start += n
      }
    }
    assert(got.forall(_._5 < 64L))
    val re = Packing.packSequences(df.repartition(9, $"text"), "doc_id",
        TextAnalysis.tokenCount($"text"), budget = 64L, nShards = 4)
      .select($"doc_id", $"shard", $"n_tokens", $"seq_id", $"seq_offset")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(re.toSet == got.toSet)
  }

  test("packSequences: duplicate ids fail loudly; non-power-of-two budgets stay exact") {
    import spark.implicits._
    // a duplicate id inside a shard would lump the tied rows into one
    // cumulative bucket (overlapping offsets) — it must abort, not corrupt
    val dup = Seq((8L, "a b c"), (8L, "d e f"), (3L, "g h")).toDF("doc_id", "text")
    val e = intercept[Exception] {
      Packing.packSequences(dup, "doc_id", TextAnalysis.tokenCount($"text"),
        budget = 64L, nShards = 2).collect()
    }
    val msgs = Iterator.iterate[Throwable](e)(_.getCause).takeWhile(_ != null)
      .map(t => Option(t.getMessage).getOrElse("")).mkString(" | ")
    assert(msgs.contains("duplicate id within shard"), s"unexpected error: $msgs")
    // integer div/pmod layout: exact for ANY positive budget (the former
    // floating-point division needed a power-of-two budget to stay exact)
    val r = new Lcg(17L)
    val docs = (0 until 150).map(i =>
      (i.toLong, (0 to r.nextInt(40)).map(_ => "tok").mkString(" "))).toDF("doc_id", "text")
    val got = Packing.packSequences(docs, "doc_id", TextAnalysis.tokenCount($"text"),
        budget = 100L, nShards = 3)
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("shard"),
        r.getAs[Long]("n_tokens"), r.getAs[Long]("seq_id"), r.getAs[Long]("seq_offset")))
    got.groupBy(_._2).foreach { case (shard, ds) =>
      var start = 0L
      ds.sortBy(_._1).foreach { case (id, _, n, seqId, off) =>
        assert(seqId == start / 100L && off == start % 100L,
          s"doc $id in shard $shard: ($seqId, $off) != (${start / 100}, ${start % 100})")
        start += n
      }
    }
  }

  test("FrameCache: a different-corpus invocation is recomputed, not served stale") {
    import spark.implicits._
    // both calls route through the SAME FrameCache key ("simhash"); the
    // second corpus has different content under the same schema, so
    // sameSemantics must fail and the result must reflect corpus B
    val corpusA = Seq((1L, "alpha beta gamma delta"), (2L, "alpha beta gamma delta"))
      .toDF("doc_id", "text")
    val corpusB = Seq((1L, "zeta eta theta iota"), (3L, "omicron pi rho sigma"))
      .toDF("doc_id", "text")
    val a = Dedup.simhashCandidates(corpusA, "doc_id", "text", maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(a == Set((1L, 2L)), s"corpus A pairs: $a")
    val b = Dedup.simhashCandidates(corpusB, "doc_id", "text", maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(b.isEmpty, s"corpus B has no identical docs; stale cache would report A's pair: $b")
  }

  test("fused expressions equal their composed built-in forms bit-for-bit") {
    // r06 optimization: CosineDouble / DotLong / IntersectCount replace
    // aggregate(zip_with(...)) / size(array_intersect(...)) in the verify
    // hot paths — this pins value identity on randomized data, including
    // the IEEE fold order of the cosine accumulators
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val r = new Lcg(123L)
    val rows = (0 until 200).map { i =>
      val a = (0 until 64).map(_ => ((r.nextLong() >>> 11).toDouble / (1L << 53) - 0.5).toFloat)
      val b = (0 until 64).map(_ => ((r.nextLong() >>> 11).toDouble / (1L << 53) - 0.5).toFloat)
      val qa = (0 until 64).map(_ => (r.nextLong() % 2000L))
      val qb = (0 until 64).map(_ => (r.nextLong() % 2000L))
      val ta = (0 until 30).map(_ => words(r.nextInt(words.length))).distinct
      val tb = (0 until 30).map(_ => words(r.nextInt(words.length))).distinct
      (i.toLong, a, b, qa, qb, ta, tb)
    }
    val df = rows.toDF("id", "a", "b", "qa", "qb", "ta", "tb")
    def composedDot(x: org.apache.spark.sql.Column, y: org.apache.spark.sql.Column) =
      aggregate(zip_with(x, y, (p, q) => p.cast("double") * q.cast("double")),
        lit(0.0), (acc, v) => acc + v)
    def composedNorm(x: org.apache.spark.sql.Column) =
      sqrt(aggregate(x, lit(0.0), (acc, v) => acc + v.cast("double") * v.cast("double")))
    val out = df.select(
      ColumnFns.cosineDouble($"a", $"b").as("cos_fused"),
      (composedDot($"a", $"b") / (composedNorm($"a") * composedNorm($"b"))).as("cos_composed"),
      ColumnFns.dotLong($"qa", $"qb").as("dot_fused"),
      aggregate(zip_with($"qa", $"qb", (x, y) => x * y), lit(0L), (acc, v) => acc + v)
        .as("dot_composed"),
      ColumnFns.intersectCount($"ta", $"tb").as("ic_fused"),
      size(array_intersect($"ta", $"tb")).as("ic_composed")).collect()
    out.foreach { row =>
      // bit-for-bit: compare raw double bits, not within-epsilon
      assert(java.lang.Double.doubleToRawLongBits(row.getDouble(0)) ==
        java.lang.Double.doubleToRawLongBits(row.getDouble(1)),
        s"cosine diverged: ${row.getDouble(0)} vs ${row.getDouble(1)}")
      assert(row.getLong(2) == row.getLong(3))
      assert(row.getInt(4) == row.getInt(5))
    }
    // distinct + null-element semantics of IntersectCount match array_intersect
    val edge = Seq(
      (Seq("x", "x", "y", null), Seq("x", "x", null, null, "z")),
      (Seq.empty[String], Seq("a")),
      (Seq("a", "b"), Seq.empty[String])).toDF("ta", "tb")
    edge.select(ColumnFns.intersectCount($"ta", $"tb").as("f"),
        size(array_intersect($"ta", $"tb")).as("c")).collect()
      .foreach(row => assert(row.getInt(0) == row.getInt(1)))
  }

  test("fused LSH bucket / centroid distance projections equal the composed forms") {
    // r06: SignLshBuckets / CellDistances replace the nTables·nPlanes
    // aggregate(zip_with(typedLit…)) trees; signs, IEEE fold order, and
    // tie semantics must be bit-identical or the frozen LSH/IVF oracles
    // (which replay the composed arithmetic in SQL) would diverge
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val r = new Lcg(77L)
    val dim = 64
    val rows = (0 until 300).map { i =>
      (i.toLong, (0 until dim).map(_ => ((r.nextLong() >>> 11).toDouble / (1L << 53) - 0.5).toFloat))
    }
    val df = rows.toDF("vec_id", "embedding")
    val tables = (0 until 6).map(t => Similarity.hyperplanes(dim, 8, 7L + 1009L * t))
    def composedDot(x: org.apache.spark.sql.Column, p: Seq[Double]) =
      aggregate(zip_with(x, typedLit(p), (a, b) => a.cast("double") * b.cast("double")),
        lit(0.0), (acc, v) => acc + v)
    val composedBuckets = array(tables.map(p =>
      p.zipWithIndex.map { case (pl, i) =>
        when(composedDot($"embedding", pl) >= 0, lit(1 << i)).otherwise(lit(0))
      }.reduce(_ + _)): _*)
    val centroids = Similarity.trainCentroids(df, dim, 16)
    val composedDists = array(centroids.map { c =>
      aggregate(zip_with($"embedding", typedLit(c),
          (x, y) => (x.cast("double") - y) * (x.cast("double") - y)),
        lit(0.0), (acc, v) => acc + v)
    }: _*)
    val out = df.select(
      ColumnFns.signLshBuckets($"embedding", tables).as("b_fused"),
      composedBuckets.as("b_composed"),
      ColumnFns.cellDistances($"embedding", centroids).as("d_fused"),
      composedDists.as("d_composed")).collect()
    out.foreach { row =>
      assert(row.getSeq[Int](0) == row.getSeq[Int](1), "bucket keys diverged")
      val df1 = row.getSeq[Double](2); val df2 = row.getSeq[Double](3)
      assert(df1.length == df2.length)
      df1.zip(df2).foreach { case (x, y) =>
        assert(java.lang.Double.doubleToRawLongBits(x) ==
          java.lang.Double.doubleToRawLongBits(y), s"distance diverged: $x vs $y")
      }
    }
    // null-embedding and NaN-dot fidelity (r06 review): the composed form
    // maps a NULL embedding to the all-zero bucket array (never a null
    // row), and Spark's nan-safe >= SETS a plane bit on a NaN dot
    val weird = Seq(
      (1L, Option.empty[Seq[Float]]),
      (2L, Some(Seq.fill(dim)(Float.NaN)))).toDF("vec_id", "embedding")
    val wOut = weird.select(
      ColumnFns.signLshBuckets($"embedding", tables).as("fused"),
      composedBuckets.as("composed")).collect()
    wOut.foreach { row =>
      assert(!row.isNullAt(0), "fused buckets must never be null")
      assert(row.getSeq[Int](0) == row.getSeq[Int](1),
        s"null/NaN bucket divergence: ${row.getSeq[Int](0)} vs ${row.getSeq[Int](1)}")
    }
  }
}
