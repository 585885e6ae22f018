package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Measured ANN recall curves — the evidence behind the production
  * parameter defaults recorded in BASELINE.md (recall@10 vs nprobe
  * for IVF at a production-shaped nlist, and vs bits/probes for
  * sign-LSH), computed against exact brute force over a PINNED query
  * batch (every 311th vector — a production eval pins Q; recall is a
  * property of the parameters, not of how many queries you ask).
  *
  * Run: SPARK_GRAFT_SF_DIR=<corpus> sbt "runMain graft.RecallCurve"
  * Prints one JSON line per configuration:
  *   {"family":"ivf","nlist":64,"nprobe":4,"mean_recall":0.93,"q":65}
  */
object RecallCurve {

  /** Deterministic CLUSTERED reference corpus for recall evaluation —
    * the geometry real embedding models produce (semantic neighbors
    * concentrate), in contrast to the driver's isotropic random
    * vectors, on which NO cell-probing index can concentrate a
    * query's true neighbors (the curse-of-dimensionality regime:
    * random points' top-k spread uniformly over cells, so recall is
    * bounded by roughly the probed corpus fraction — measure it on
    * both and the pair brackets a deployment). md5-folded, no RNG:
    * any engine re-derives the identical corpus.
    *
    * `clusters` cluster centers with +-1 (Rademacher-ish) components;
    * member = center + jitter * u, u in [-1, 1) per (id, dim).
    */
  def clusteredCorpus(spark: org.apache.spark.sql.SparkSession,
      n: Long, dim: Int, clusters: Int,
      jitter: Float = 0.2f): DataFrame = {
    import spark.implicits._
    def fold(seed: String, d: Int): Float = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val h = md.digest(s"$seed:$d".getBytes("UTF-8"))
      ((h(0) & 0xFF) / 127.5f) - 1.0f // [-1, 1)
    }
    spark.range(n).map { id =>
      val c = (id % clusters).toInt
      val v = Array.tabulate(dim) { d =>
        val center = if (fold(s"rc-center:$c", d) >= 0) 1.0f else -1.0f
        center + jitter * fold(s"rc-member:$id", d)
      }
      (id, v)
    }.toDF("vec_id", "embedding")
      .withColumn("embedding", col("embedding").cast("array<float>"))
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    Engine.configure(spark)
    spark.sparkContext.setLogLevel("WARN")
    import graft.pipeline.Similarity

    // scope to a family subset for iteration (the recorded artifact
    // is a full run): SPARK_GRAFT_RECALL_FAMILIES=nsw_filtered,...
    val fams = sys.env.get("SPARK_GRAFT_RECALL_FAMILIES")
      .map(_.split(",").map(_.trim).toSet)
    def fam(name: String): Boolean = fams.forall(_.contains(name))

    // corpus: the driver tables (isotropic) by default; set
    // SPARK_GRAFT_RECALL_CORPUS=clustered:<n>:<dim>:<clusters> for the
    // clustered reference geometry at any scale
    val emb = (sys.env.get("SPARK_GRAFT_RECALL_CORPUS") match {
      case Some(s"clustered:$n:$d:$c") =>
        clusteredCorpus(spark, n.toLong, d.toInt, c.toInt)
      case _ => Tables.embeddings(spark, sfDir)
    }).persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val queries = emb.where(col("vec_id") % 311 === 0)
      .select(col("vec_id").as("query_id"), col("embedding").as("query_vec"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nQ = queries.count()

    def meanRecall(approx: DataFrame, truth: DataFrame): Double = {
      val a = approx.select(col("query_id"), col("vec_id"), lit(1L).as("__hit"))
      val per = truth.select(col("query_id"), col("vec_id"))
        .join(a, Seq("query_id", "vec_id"), "left")
        .groupBy(col("query_id"))
        .agg((sum(coalesce(col("__hit"), lit(0L))) /
          count(lit(1))).as("recall"))
      per.agg(avg(col("recall"))).head().getDouble(0)
    }

    val k = 10
    val truth = Similarity.bruteSearchAll(emb, queries, k)
      .select(col("query_id"), col("vec_id"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    truth.count()

    // IVF: production-shaped nlist (~sqrt N, k-means-refined), sweep
    // nprobe. ivfSearchAll is the batched deployment path.
    val nlist = 64
    if (fam("ivf")) {
    val centroids = Similarity.kmeansCentroids(emb, nlist = nlist, iters = 2)
    Seq(1, 2, 4, 8, 16).foreach { nprobe =>
      val r = meanRecall(
        Similarity.ivfSearchAll(emb, queries, centroids, k, nprobe), truth)
      println(s"""{"family":"ivf","nlist":$nlist,"nprobe":$nprobe,"mean_recall":$r,"q":$nQ}""")
      Console.out.flush()
    }
    }

    // sign-LSH: sweep bits at single probe, then probes at the
    // chosen bits (multi-probe is the recall lever that does NOT
    // shrink buckets).
    val dim = emb.select(size(col("embedding"))).head().getInt(0)
    if (fam("lsh")) {
    for (bits <- Seq(2, 4, 6, 8)) {
      val r = meanRecall(
        Similarity.lshSearchAll(emb, queries, k, bits = bits,
          dim = Some(dim)), truth)
      println(s"""{"family":"lsh","bits":$bits,"probes":1,"mean_recall":$r,"q":$nQ}""")
      Console.out.flush()
    }
    for (probes <- Seq(2, 3, 5)) {
      val r = meanRecall(
        Similarity.lshSearchAll(emb, queries, k, bits = 4, probes = probes,
          dim = Some(dim)), truth)
      println(s"""{"family":"lsh","bits":4,"probes":$probes,"mean_recall":$r,"q":$nQ}""")
      Console.out.flush()
    }
    }

    val n = Some(emb.count())

    // Graph ANN (NSW): hub layer ~ sqrt N (SPARK_GRAFT_NSW_HUBS
    // overrides), sweep beam x rounds — the navigability evidence
    // behind GraphAnn's defaults (one edge build, reused across the
    // sweep, like a deployment would).
    import graft.pipeline.GraphAnn
    // the edge build is the most expensive step in this file — skip
    // it entirely unless an nsw-family sweep is selected
    val nswNeeded = fam("nsw") || fam("nsw_filtered") ||
      fam("nsw_filtered_acorn")
    val nHubs = sys.env.get("SPARK_GRAFT_NSW_HUBS").map(_.toInt)
      .getOrElse(math.max(16, math.sqrt(n.get.toDouble).toInt))
    lazy val hubs = Similarity.sampleCentroids(emb, nHubs, knownCount = n)
    lazy val edges = {
      val e = GraphAnn.buildEdges(emb, hubs, dim = Some(dim))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      e.count()
      e
    }
    if (fam("nsw")) for (beam <- Seq(4, 8, 16); rounds <- Seq(2, 3)) {
      val r = meanRecall(GraphAnn.searchAll(edges, hubs, queries, k,
        beam = beam, rounds = rounds), truth)
      println(s"""{"family":"nsw","hubs":$nHubs,"beam":$beam,"rounds":$rounds,"mean_recall":$r,"q":$nQ}""")
      Console.out.flush()
    }

    // Lifecycle recall at PRODUCTION DEFAULTS (round 17): the index a
    // deployment actually serves is write(base) + append(batches) —
    // since both now default to the corpus-density sub-bucketed
    // candidate step, this measures the recall of that real lifecycle
    // path against the unsplit comparator (search settings identical).
    if (fam("nsw_append")) {
      def lifecycleRecall(split: Option[Long], tag: String): Double = {
        val path = java.nio.file.Files
          .createTempDirectory(s"rc-nsw-append-$tag").toString + "/idx"
        val base = emb.where(col("vec_id") % 2 === 0)
        val batch = emb.where(col("vec_id") % 2 =!= 0)
        GraphAnn.writeIndex(base, hubs, path, dim = Some(dim),
          splitBucket = split)
        GraphAnn.appendToIndex(batch, emb, hubs, path, batchId = "b1",
          dim = Some(dim), splitBucket = split)
        meanRecall(GraphAnn.searchAll(
          GraphAnn.readEdges(spark, path), hubs, queries, k), truth)
      }
      for ((tag, split) <- Seq(
          ("default", Some(GraphAnn.AutoSplit)), ("unsplit", None))) {
        val r = lifecycleRecall(split, tag)
        println(s"""{"family":"nsw_append_$tag","hubs":$nHubs,"mean_recall":$r,"q":$nQ}""")
        Console.out.flush()
      }
    }

    // FILTERED graph search: beam x selectivity — the tuning evidence
    // behind p139's "raise beam with predicate selectivity" guidance.
    // The beam routes through every node but only 1/m of the corpus
    // may rank, so at fixed beam the visited set holds fewer MATCHES
    // as m grows; truth is brute force over the filtered corpus.
    if (fam("nsw_filtered") || fam("nsw_filtered_acorn"))
    for (m <- Seq(2L, 4L, 8L)) {
      // the filtered ground truth depends only on the selectivity —
      // hoist it out of the beam loop (one brute-force job per m)
      val allowed = emb.where(col("vec_id") % m === 0).select(col("vec_id"))
      val ftruth = Similarity.bruteSearchAll(
        emb.where(col("vec_id") % m === 0), queries, k)
        .select(col("query_id"), col("vec_id"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      ftruth.count()
      if (fam("nsw_filtered")) for (beam <- Seq(8, 16, 32)) {
        val r = meanRecall(GraphAnn.searchAll(edges, hubs, queries, k,
          beam = beam, rounds = 3, allowed = Some(allowed)), ftruth)
        println(s"""{"family":"nsw_filtered","selectivity":"1/$m","beam":$beam,"rounds":3,"mean_recall":$r,"q":$nQ}""")
        Console.out.flush()
      }
      // ACORN predicate-aware walk (round 15): same index, same
      // truth — the two-hop rule + passing-hub entry must hold
      // recall at bounded beam where route-all collapses
      if (fam("nsw_filtered_acorn"))
      for ((beam, rounds) <- Seq((8, 3), (16, 3), (16, 4), (32, 3))) {
        val r = meanRecall(GraphAnn.searchAllAcorn(edges, hubs, queries,
          allowed, k, beam = beam, rounds = rounds), ftruth)
        println(s"""{"family":"nsw_filtered_acorn","selectivity":"1/$m","beam":$beam,"rounds":$rounds,"mean_recall":$r,"q":$nQ}""")
        Console.out.flush()
      }
      // the AUTO path (selectivity-measured beam) — the deployment
      // default's recall, recorded next to the explicit sweep
      if (fam("nsw_filtered_acorn")) {
        val beamChosen = GraphAnn.acornAutoBeam(1.0 / m)
        val r = meanRecall(GraphAnn.searchAllAcornAuto(edges, hubs,
          queries, allowed, k, corpusSize = n), ftruth)
        println(s"""{"family":"nsw_filtered_acorn_auto","selectivity":"1/$m","beam":$beamChosen,"rounds":3,"mean_recall":$r,"q":$nQ}""")
        Console.out.flush()
      }
      ftruth.unpersist()
    }
    if (nswNeeded) edges.unpersist()

    // Quantized paths at production defaults — the honesty artifact
    // behind the compression knobs: how much recall each code budget
    // actually costs on this geometry.
    import graft.pipeline.Quantization
    // int8 scalar quantization: full-precision geometry at 1/4 the
    // bytes — the near-free baseline
    if (fam("quant")) {
    val rInt8 = meanRecall(
      Quantization.quantizedSearchAll(emb, queries, k), truth)
    println(s"""{"family":"int8","mean_recall":$rInt8,"q":$nQ}""")
    Console.out.flush()
    // PQ-ADC: sweep subspace count at the default ksub (code budget =
    // m bytes/vector). PQ approximates the inner product, so it
    // indexes the NORMALIZED corpus (cosine deployment recipe; truth
    // is norm-invariant). Two metrics per config: recall@10 (the raw
    // resolution, floored by code-granularity ties on clustered
    // geometry) and truth@10-in-top50 — the shortlist coverage the
    // standard ADC-shortlist -> exact-rerank pipeline actually needs.
    val nemb = Quantization.l2Normalize(emb)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nq2 = nemb.join(queries.select(col("query_id")),
        col("vec_id") === col("query_id"))
      .select(col("query_id"), col("embedding").as("query_vec"))
    for (m <- Seq(4, 8, 16) if dim % m == 0) {
      val rPq = meanRecall(
        Quantization.pqSearchAll(nemb, nq2, k, m = m, ksub = 16,
          knownCount = n), truth)
      val rSl = meanRecall(
        Quantization.pqSearchAll(nemb, nq2, 50, m = m, ksub = 16,
          knownCount = n), truth)
      println(s"""{"family":"pq","m":$m,"ksub":16,"mean_recall":$rPq,"shortlist50_coverage":$rSl,"q":$nQ}""")
      Console.out.flush()
    }
    }
    spark.stop()
  }
}
