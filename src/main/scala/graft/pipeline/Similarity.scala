package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** One packed tile of the corpus for the blocked all-pairs kernel
  * ([[Similarity.blockedNearDupPairs]]); top-level so the Product encoder
  * codegens. */
final case class SimTile(bid: Int, ids: Array[Long],
    data: Array[Double], norms: Array[Double])

/** Similarity search over an embedding column (`array<float>`).
  *
  * Baseline: brute-force cosine top-k — a broadcast join of the (small)
  * query set against the corpus, fully codegen (`zip_with` + `aggregate`
  * higher-order functions, no UDF), then a per-query top-k window. At scale
  * the corpus side streams map-side: no shuffle of the corpus, only of the
  * (q × k) candidate rows.
  *
  * Scale path: sign-LSH (random hyperplanes) bucketing — signature from
  * deterministic pseudo-random ±1 planes, candidates restricted to the
  * query's bucket (multi-probe over Hamming-1 neighbors for recall), exact
  * cosine rerank inside the bucket. Bucket sizes are ~n/2^bits: tunable so
  * per-bucket rerank is bounded.
  *
  * All dot products fold left in DOUBLE over the float pairs — bit-identical
  * to a SQL oracle using the same fold order.
  */
object Similarity {

  private def ensureRegistered(): Unit =
    org.apache.spark.sql.SparkSession.getActiveSession
      .foreach(graft.tokenize.GraftFunctions.register)

  /** Exact left-fold dot product of two float-array columns in double —
    * the native codegen [[GraftDot]] (the `aggregate(zip_with(...))` HOF
    * form evaluated its lambdas interpreted, per element per candidate
    * pair); identical fold order, so oracles stay bit-exact. */
  def dotCol(a: Column, b: Column): Column = {
    ensureRegistered()
    call_function("graft_dot", a, b)
  }

  /** Exact left-fold squared norm ([[GraftNorm2]], same fold). */
  def norm2Col(a: Column): Column = {
    ensureRegistered()
    call_function("graft_norm2", a)
  }

  def cosineCol(a: Column, b: Column, n2a: Column, n2b: Column): Column =
    dotCol(a, b) / (sqrt(n2a) * sqrt(n2b))

  /** Brute-force cosine top-k: for each query vector (rows of `queries`),
    * the k nearest corpus rows by cosine, rank-deterministic via (cos desc,
    * id asc). Output: (query_id, neighbor_id, rank). */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      id: String = "vec_id", vec: String = "embedding"): DataFrame = {
    graft.tokenize.GraftFunctions.register(corpus.sparkSession)
    val q = broadcast(queries.select(col(id).as("query_id"),
      col(vec).as("qv"), norm2Col(col(vec)).as("qn")))
    val c = corpus.select(col(id).as("neighbor_id"), col(vec).as("cv"),
      norm2Col(col(vec)).as("cn"))
    val scored = c.crossJoin(q)
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("cos", cosineCol(col("qv"), col("cv"), col("qn"), col("cn")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank").cast("long"))
  }

  /** Deterministic ±1 hyperplane component for (plane, dim): murmur3 of the
    * pair (Spark's `hash`), stable across runs. (The r1 parity mix
    * `(dim*odd + plane*odd) % 2` collapsed to `(dim+plane) % 2` — every
    * even plane identical, every odd plane its complement, so an "8-bit"
    * signature had 1 effective bit.) */
  private def planeSign(plane: Int, dim: Column): Column =
    when(pmod(hash(lit(plane), dim), lit(2)) === 0, lit(1.0))
      .otherwise(lit(-1.0))

  /** Sign-LSH bucket signature (`bits` hyperplanes) of a vector column. */
  def lshBucketCol(vec: Column, bits: Int): Column =
    (0 until bits).map { p =>
      val proj = aggregate(
        transform(vec, (x, i) => x.cast("double") * planeSign(p, i)),
        lit(0.0), (acc, v) => acc + v)
      when(proj > 0, lit(1L << p)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** LSH-bucketed ANN top-k: candidates share the query's bucket or any
    * Hamming-1 probe bucket; exact cosine rerank within candidates.
    * Output schema matches [[bruteForceTopK]]. */
  def lshTopK(corpus: DataFrame, queries: DataFrame, k: Int, bits: Int = 8,
      id: String = "vec_id", vec: String = "embedding"): DataFrame = {
    graft.tokenize.GraftFunctions.register(corpus.sparkSession)
    val c = corpus.select(col(id).as("neighbor_id"), col(vec).as("cv"),
      norm2Col(col(vec)).as("cn"), lshBucketCol(col(vec), bits).as("bucket"))
    // query probes: own bucket + all Hamming-1 buckets
    val probes = (0 until bits).foldLeft(array(col("b0"))) { (acc, p) =>
      concat(acc, array(expr(s"b0 ^ ${1L << p}")))
    }
    val q = queries.select(col(id).as("query_id"), col(vec).as("qv"),
        norm2Col(col(vec)).as("qn"), lshBucketCol(col(vec), bits).as("b0"))
      .withColumn("bucket", explode(probes))
      .drop("b0")
    val scored = broadcast(q).join(c, Seq("bucket"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("cos", cosineCol(col("qv"), col("cv"), col("qn"), col("cn")))
      // a candidate can appear via several probes — keep one
      .dropDuplicates(Seq("query_id", "neighbor_id"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank").cast("long"))
  }

  /** Shared IVF coarse-quantizer fit ([[ivfTopK]], [[ivfNearDupPairs]]):
    * seed-stable bounded driver-side sample → [[kmeansFit]]. Null or
    * empty embeddings are excluded from the SAMPLE here (they would NPE
    * the driver fit); on the assignment side the malformed-row contract
    * is `graft_argmin_cell`'s null return, which drops those rows from
    * every cell join. An all-null/empty column fails loudly via
    * kmeansFit's non-empty requirement. */
  private def fitQuantizer(corpus: DataFrame, vec: String, nLists: Int,
      maxFitRows: Int, fitSample: Double = 1.0): Array[Array[Double]] = {
    graft.tokenize.GraftFunctions.register(corpus.sparkSession)
    kmeansFit(fitRows(corpus, vec, maxFitRows, fitSample), nLists,
      iters = 10, seed = 42L)
  }

  /** The bounded, seed-stable driver-side fit sample shared by the coarse
    * quantizer and the PQ codebooks ([[pqTopK]]) — cost capped at
    * `maxFitRows` rows at ANY corpus size. */
  private def fitRows(corpus: DataFrame, vec: String, maxFitRows: Int,
      fitSample: Double): Array[Array[Double]] = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val fitInput = if (fitSample >= 1.0) corpus
      else corpus.sample(withReplacement = false, fitSample, 42L)
    val rows = fitInput
      .filter(col(vec).isNotNull && size(col(vec)) > 0)
      .select(col(vec).cast("array<double>"))
      .limit(maxFitRows).as[Seq[Double]].collect().map(_.toArray)
    if (rows.isEmpty) return rows
    // a wrong-dimension row in the sample would AIOOBE the k-means fit:
    // keep the modal dimension (deterministic tie-break toward smaller) —
    // assignment-side malformed rows already drop via the argmin/size
    // contracts, this applies the same posture to the fit
    val dim = rows.groupBy(_.length)
      .maxBy { case (l, g) => (g.length, -l) }._1
    rows.filter(_.length == dim)
  }

  /** Distributed Lloyd refinement of driver-seeded centroids over the
    * FULL corpus — the 100-TB complement to [[fitQuantizer]]'s bounded
    * driver-side sample fit: seed on the sample (bounded cost at any
    * corpus size), then let every vector vote. Each iteration is one
    * map-side native argmin assignment plus ONE typed partial aggregation
    * whose combine is elementwise (sum, count) — k·dim doubles cross the
    * wire per partition, never the corpus — and a driver-side mean over k
    * rows. Cells no vector chose keep their centroid (the same emptied-
    * cluster rule as the local fit); malformed vectors fall out through
    * `graft_argmin_cell`'s null contract.
    *
    * Floating sums are partition-order dependent, so refined centroids
    * are deterministic only up to ~1 ulp per add — callers needing
    * bit-stable output across cluster layouts keep `refineIters = 0`
    * (PipelineSpec pins the refinement against a local Lloyd step at
    * 1e-6 absolute tolerance on unit-scale values, not bit equality). */
  def kmeansRefine(corpus: DataFrame, centroids: Array[Array[Double]],
      iters: Int = 1, vec: String = "embedding"): Array[Array[Double]] = {
    require(centroids.nonEmpty, "kmeansRefine needs seed centroids")
    val spark = corpus.sparkSession
    import spark.implicits._
    graft.tokenize.GraftFunctions.register(spark)
    val dim = centroids.head.length
    val vecs = corpus
      .filter(col(vec).isNotNull && size(col(vec)) === dim)
      .select(col(vec).cast("array<double>").as("v"))
    var c = centroids
    var it = 0
    while (it < iters) {
      val stats = vecs
        .select(cellCol(c, col("v")).as("cell"), col("v"))
        .filter(col("cell").isNotNull)
        .as[(Int, Array[Double])]
        .groupByKey(_._1)
        .mapValues { case (_, v) => (v, 1L) }
        .reduceGroups { (x, y) =>
          val s = new Array[Double](dim)
          var i = 0
          while (i < dim) { s(i) = x._1(i) + y._1(i); i += 1 }
          (s, x._2 + y._2)
        }
        .collect() // k rows of (cell, (sumVec, n)) — tiny at any scale
      val next = c.map(_.clone())
      stats.foreach { case (cell, (sum, n)) =>
        var i = 0
        while (i < dim) { next(cell)(i) = sum(i) / n; i += 1 }
      }
      c = next
      it += 1
    }
    c
  }

  /** Native codegen argmin cell assignment over the fitted centroid
    * matrix (folded into the plan as a literal → reference object) — the
    * corpus-wide pass stays inside whole-stage codegen with zero
    * boxing. */
  private def cellCol(centroids: Array[Array[Double]],
      vecCol: Column): Column =
    call_function("graft_argmin_cell", vecCol,
      lit(centroids.flatten), lit(centroids.head.length))

  /** Deterministic Lloyd k-means with k-means++ seeding over a local point
    * set (the coarse-quantizer fit — points are the bounded fit sample,
    * never the corpus). */
  private[pipeline] def kmeansFit(points: Array[Array[Double]], k: Int,
      iters: Int, seed: Long): Array[Array[Double]] = {
    require(points.nonEmpty, "kmeans fit needs at least one point")
    val dim = points.head.length
    val rnd = new scala.util.Random(seed)
    def d2(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < dim) { val d = a(i) - b(i); s += d * d; i += 1 }
      s
    }
    // k-means++ seeding with incremental min-distance tracking: each new
    // center updates dmin in O(n·dim) instead of recomputing the min over
    // every center (O(k·n·dim) per pick) — same values, same rnd sequence,
    // BIT-IDENTICAL centroids; the old quadratic pick dominated the fit
    // wall at k in the hundreds (semdedup nLists=128: fit 7.6 s, mostly
    // seeding)
    val cents = scala.collection.mutable.ArrayBuffer(
      points(rnd.nextInt(points.length)).clone())
    val dmin = points.map(p => d2(p, cents.head))
    while (cents.length < k) {
      val total = dmin.sum
      val next =
        if (total <= 0) points(rnd.nextInt(points.length)).clone()
        else {
          var r = rnd.nextDouble() * total; var i = 0
          while (i < points.length - 1 && r > dmin(i)) { r -= dmin(i); i += 1 }
          points(i).clone()
        }
      cents += next
      var i = 0
      while (i < points.length) {
        val d = d2(points(i), next)
        if (d < dmin(i)) dmin(i) = d
        i += 1
      }
    }
    val c = cents.toArray
    // Lloyd iterations; an emptied cluster keeps its previous centroid
    (1 to iters).foreach { _ =>
      val sums = Array.fill(k)(new Array[Double](dim))
      val counts = new Array[Long](k)
      points.foreach { p =>
        var best = 0; var bd = d2(p, c(0)); var j = 1
        while (j < k) { val dj = d2(p, c(j)); if (dj < bd) { bd = dj; best = j }; j += 1 }
        counts(best) += 1
        var i = 0
        while (i < dim) { sums(best)(i) += p(i); i += 1 }
      }
      var j = 0
      while (j < k) {
        if (counts(j) > 0) {
          var i = 0
          while (i < dim) { c(j)(i) = sums(j)(i) / counts(j); i += 1 }
        }
        j += 1
      }
    }
    c
  }

  /** IVF (inverted-file) ANN top-k: a seeded k-means++ coarse quantizer
    * buckets the corpus into nLists inverted lists; each query probes its
    * nProbe nearest centroids and reranks exactly (cosine) within those
    * lists — the classic IVF-Flat layout. At scale the lists are the
    * partitioning key: a query touches nProbe/nLists of the corpus, and the
    * (tiny) centroid table broadcasts.
    *
    * The quantizer fits on a SEED-STABLE sample capped at `maxFitRows`
    * (coarse centroids need ~100-1000 points per list, not the corpus) and
    * the fit runs driver-local in one collect — at ANY corpus size the fit
    * cost is bounded by the cap, and the per-row work (assignment) is one
    * broadcast argmin pass, the same shape FAISS's IVF training uses
    * (r2 shipped this as a 10-iteration MLlib fit: ~20 driver-coordinated
    * jobs of launch overhead for the same bounded sample). */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, k: Int, nLists: Int = 16,
      nProbe: Int = 4, id: String = "vec_id",
      vec: String = "embedding", fitSample: Double = 1.0,
      maxFitRows: Int = 100000, refineIters: Int = 0): DataFrame = {
    val spark = corpus.sparkSession
    val seed = fitQuantizer(corpus, vec, nLists, maxFitRows, fitSample)
    val centroids = if (refineIters > 0)
      kmeansRefine(corpus, seed, refineIters, vec) else seed
    val lists = corpus
      .select(cellCol(centroids, col(vec)).as("list_id"),
        col(id).as("neighbor_id"),
        col(vec).as("cv"), norm2Col(col(vec)).as("cn"))
    val probes = probeCells(queries, centroids, nProbe, id, vec)
      .drop("centroid") // IVF-Flat reranks exact; only PQ's ADC needs it
    val scored = broadcast(probes).join(lists, Seq("list_id"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("cos", cosineCol(col("qv"), col("cv"), col("qn"), col("cn")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank").cast("long"))
  }

  /** Per-query probe list: the `nProbe` coarse cells nearest each query —
    * (query_id, qv, qn, list_id). The centroid table is quantizer-sized,
    * so it broadcasts; queries stay distributed (shared by [[ivfTopK]]
    * and [[pqTopK]]). */
  private def probeCells(queries: DataFrame,
      centroids: Array[Array[Double]], nProbe: Int,
      id: String, vec: String): DataFrame = {
    val spark = queries.sparkSession
    val cents = spark.createDataFrame(
      centroids.toSeq.zipWithIndex.map { case (c, i) =>
        (i, c.map(_.toFloat))
      }).toDF("list_id", "centroid")
    val q = queries.select(col(id).as("query_id"), col(vec).as("qv"),
      norm2Col(col(vec)).as("qn"))
    val qDist = q.crossJoin(broadcast(cents))
      .withColumn("dist",
        aggregate(zip_with(col("qv"), col("centroid"),
          (x, c) => (x.cast("double") - c.cast("double")) *
            (x.cast("double") - c.cast("double"))),
          lit(0.0), (acc, v) => acc + v))
    val probeW = Window.partitionBy(col("query_id"))
      .orderBy(col("dist"), col("list_id"))
    qDist.withColumn("pr", row_number().over(probeW))
      .filter(col("pr") <= nProbe)
      .select(col("query_id"), col("qv"), col("qn"), col("list_id"),
        col("centroid"))
  }

  /** IVF-PQ ANN top-k (product quantization, Jégou/Douze/Schmid 2011):
    * [[ivfTopK]]'s coarse quantizer plus a product-quantized code in
    * place of the raw vector on the scan side. The dimension splits into
    * `m` subspaces; per subspace a `ksub`-centroid codebook (fit on the
    * same bounded driver sample) quantizes the sub-vector to one small
    * int, so a D-dim float vector scans as m ints + one stored norm —
    * the 100-TB memory/IO lever: probed lists read ~m bytes per row
    * instead of 4·D (16 vs 256 bytes at D=64, m=16), and the codes
    * column is a pure map-side projection of the corpus (encode = m
    * native `graft_argmin_cell` passes over sliced sub-vectors, all
    * inside whole-stage codegen).
    *
    * Scoring is ADC (asymmetric distance computation): per query, the
    * m×ksub table of exact sub-dot-products query·codebook is computed
    * ONCE (a queries × broadcast(codebook) join — nq·m·ksub rows, never
    * the corpus) and reshaped to an array-of-arrays carried on the
    * broadcast probe row; a candidate's approximate dot is then m array
    * lookups (`zip_with(codes, tab)` + fold — O(m) per row, builtin
    * codegen). Approximate cosine divides by the EXACT stored norm, so
    * only the numerator is quantized. The top `refineFactor·k` ADC
    * candidates rerank with exact cosine against the raw vectors (the
    * standard refine step — a selective join back to the corpus by id,
    * reading full vectors for candidates only). Output is
    * (query_id, neighbor_id, rank) like [[ivfTopK]]; recall vs the
    * brute-force oracle is PqSpec's job (rows-only at the gate — the
    * k-means codebooks are outside SQL). */
  def pqTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      nLists: Int = 16, nProbe: Int = 4, m: Int = 8, ksub: Int = 16,
      refineFactor: Int = 8, id: String = "vec_id",
      vec: String = "embedding", fitSample: Double = 1.0,
      maxFitRows: Int = 100000): DataFrame = {
    val spark = corpus.sparkSession
    graft.tokenize.GraftFunctions.register(spark)
    val sample = fitRows(corpus, vec, maxFitRows, fitSample)
    require(sample.nonEmpty, "pqTopK: fit sample is empty")
    val dim = sample.head.length
    require(m >= 1 && dim % m == 0, s"pqTopK: m=$m must divide dim=$dim")
    val dsub = dim / m
    val coarse = kmeansFit(sample, nLists, iters = 10, seed = 42L)
    // RESIDUAL encoding (Jégou §IV: quantize x − c(x), not x): within a
    // coarse cell every vector shares the centroid, so the codebooks
    // spend their resolution on the small residual ball instead of the
    // whole space. Measured on the bench's clustered ann rows, the
    // non-residual variant collapses to recall@10 ≈ 0.05 at 20k vectors
    // (within-cluster ordering is entirely inside the quantization
    // noise) — residual coding is what makes IVF-PQ usable.
    def nearestCoarse(p: Array[Double]): Array[Double] = {
      var best = 0; var bd = Double.MaxValue; var j = 0
      while (j < nLists) {
        var s2 = 0.0; var i = 0
        while (i < dim) {
          val d = p(i) - coarse(j)(i); s2 += d * d; i += 1
        }
        if (s2 < bd) { bd = s2; best = j }
        j += 1
      }
      coarse(best)
    }
    val resSample = sample.map { p =>
      val c = nearestCoarse(p)
      Array.tabulate(dim)(i => p(i) - c(i))
    }
    // per-subspace codebooks over the residual sample (seed offset per
    // subspace: identical sub-distributions still seed independently)
    val books = Array.tabulate(m) { s =>
      kmeansFit(resSample.map(_.slice(s * dsub, (s + 1) * dsub)), ksub,
        iters = 10, seed = 42L + s)
    }
    // encode: list assignment + residual + m sub-codes, one map-side
    // pass; rows of the wrong dimension drop here, all-NaN vectors drop
    // via the argmin null contract (null list_id never joins a probe)
    val coarseLit = typedLit(coarse.map(_.toSeq).toSeq)
    val withList = corpus
      .filter(col(vec).isNotNull && size(col(vec)) === dim)
      .select(cellCol(coarse, col(vec)).as("list_id"),
        col(id).as("neighbor_id"), col(vec).as("v"),
        norm2Col(col(vec)).as("cn"))
    val residual = zip_with(col("v"),
      element_at(coarseLit, col("list_id") + 1),
      (x, c) => x.cast("double") - c)
    val codeCols = (0 until m).map { s =>
      cellCol(books(s), slice(residual, s * dsub + 1, dsub))
    }
    val codes = withList.select(col("list_id"), col("neighbor_id"),
      array(codeCols: _*).as("codes"), col("cn"))
    // ADC tables: (query_id, sub, code, dot) -> per-query array-of-arrays
    // over the SHARED residual codebooks (one codebook set for all cells,
    // the standard IVFADC layout)
    val bookDf = spark.createDataFrame(
      for (s <- 0 until m; c <- 0 until ksub)
        yield (s, c, books(s)(c))).toDF("sub", "code", "cent")
    val tabs = queries
      .select(col(id).as("query_id"), col(vec).as("qv"))
      .crossJoin(broadcast(bookDf))
      .withColumn("dot",
        aggregate(zip_with(
            slice(col("qv"), col("sub") * dsub + 1, lit(dsub)), col("cent"),
            (x, c) => x.cast("double") * c),
          lit(0.0), (acc, v) => acc + v))
      .groupBy(col("query_id"))
      .agg(array_sort(collect_list(
        struct(col("sub"), col("code"), col("dot")))).as("es"))
      // es is (sub, code)-sorted, so entry s*ksub + c is subspace s code c
      .withColumn("tab", expr(
        s"""transform(sequence(0, ${m - 1}),
              s -> transform(sequence(0, $ksub - 1),
                c -> es[s * $ksub + c].dot))"""))
      .select(col("query_id"), col("tab"))
    // probe rows carry the probed centroid: the residual decomposition
    // dot(q, x) ≈ dot(q, c_list) + Σ_s dot(q_s, book_s[code_s]) needs the
    // exact query·centroid term per (query, list)
    val probes = probeCells(queries, coarse, nProbe, id, vec)
      .withColumn("qc",
        aggregate(zip_with(col("qv"), col("centroid"),
            (x, c) => x.cast("double") * c.cast("double")),
          lit(0.0), (acc, v) => acc + v))
      .drop("centroid")
      .join(tabs, Seq("query_id")) // nq·nProbe rows — stays broadcastable
    val refineK = math.max(k, k * refineFactor)
    val adc = broadcast(probes).join(codes, Seq("list_id"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("approx",
        (col("qc") + aggregate(zip_with(col("codes"), col("tab"),
            (cd, t) => element_at(t, cd + 1)),
          lit(0.0), (acc, v) => acc + v)) /
        (sqrt(col("qn")) * sqrt(col("cn"))))
    val aw = Window.partitionBy(col("query_id"))
      .orderBy(col("approx").desc, col("neighbor_id"))
    val cands = adc.withColumn("ar", row_number().over(aw))
      .filter(col("ar") <= refineK)
      .select(col("query_id"), col("neighbor_id"), col("qv"), col("qn"))
    // exact rerank: the refine join reads raw vectors for candidates only
    val raw = corpus.select(col(id).as("neighbor_id"), col(vec).as("cv"),
      norm2Col(col(vec)).as("rn"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    cands.join(raw, Seq("neighbor_id"))
      .withColumn("cos",
        cosineCol(col("qv"), col("cv"), col("qn"), col("rn")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank").cast("long"))
  }

  /** Brute-force embedding near-duplicate pairs: every (a, b) with
    * cosine >= minCos — the exact baseline (O(n²) pair generation; use
    * [[cosineNearDupPairs]] for the LSH-blocked scale path). */
  def bruteNearDupPairs(corpus: DataFrame, minCos: Double,
      id: String = "vec_id", vec: String = "embedding"): DataFrame = {
    graft.tokenize.GraftFunctions.register(corpus.sparkSession)
    val sig = corpus.select(col(id), col(vec), norm2Col(col(vec)).as("n2"))
    val l = sig.select(col(id).as("id_a"), col(vec).as("va"),
      col("n2").as("na"))
    val r = sig.select(col(id).as("id_b"), col(vec).as("vb"),
      col("n2").as("nb"))
    l.crossJoin(r).filter(col("id_a") < col("id_b"))
      .withColumn("cos", cosineCol(col("va"), col("vb"), col("na"), col("nb")))
      .filter(col("cos") >= minCos)
      .select(col("id_a"), col("id_b"), col("cos"))
  }

  /** Exact embedding near-duplicate pairs via tiled block products — the
    * scale shape for EXACT all-pairs ≥ minCos over dense vectors.
    *
    * Exact all-pairs is inherently O(n²·d) FLOPs at ANY threshold low
    * enough that LSH can't separate pairs from background (here minCos 0.42
    * sits just above the background cosine p99 ≈ 0.29: per-hyperplane
    * collision is 0.64 at the threshold vs ~0.55 for random pairs, so no
    * banding scheme reaches recall 1 with useful selectivity — measured on
    * the driver testdata). What CAN be fixed is the constant and the data
    * movement: instead of a row-exploded cross join (r1: one (va, vb) row
    * per candidate pair, 11.3 s at sf0.1), vectors pack into B = n/tileRows
    * dense tiles; each unordered tile pair meets once in a shuffle of
    * O(B·n·d / tileRows) packed bytes and runs a cache-friendly primitive
    * dot-product loop. The inner loop folds dims left in doubles — the SAME
    * addition order as the SQL oracle, so results stay bit-exact.
    */
  def blockedNearDupPairs(corpus: DataFrame, minCos: Double,
      tileRows: Int = 2048, id: String = "vec_id",
      vec: String = "embedding"): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    graft.tokenize.GraftFunctions.register(spark)
    val n = corpus.count()
    val nTiles = math.max(1, ((n + tileRows - 1) / tileRows).toInt)
    val tiles = corpus
      .select(col(id).cast("long").as("id"),
        col(vec).cast("array<double>").as("v"), norm2Col(col(vec)).as("n2"))
      .as[(Long, Seq[Double], Double)]
      // floor-mod: ids may be negative; with sparse ids some residue tiles
      // can be empty or uneven (bounded skew) — the pair loop below skips
      // absent tiles rather than assuming a dense id space
      .groupByKey { case (i, _, _) => (((i % nTiles) + nTiles) % nTiles).toInt }
      .mapGroups { (bid, rows) =>
        val rs = rows.toArray.sortBy(_._1)
        val d = if (rs.isEmpty) 0 else rs.head._2.length
        val data = new Array[Double](rs.length * d)
        var i = 0
        while (i < rs.length) {
          val v = rs(i)._2; var j = 0
          while (j < d) { data(i * d + j) = v(j); j += 1 }
          i += 1
        }
        SimTile(bid, rs.map(_._1), data, rs.map(_._3))
      }
    // every unordered tile pair (a <= b) meets exactly once
    val routed = tiles.flatMap { t =>
      (0 until nTiles).iterator.collect {
        case o if o >= t.bid => ((t.bid, o), t)
        case o if o < t.bid => ((o, t.bid), t)
      }
    }
    routed.groupByKey(_._1).flatMapGroups { (key, it) =>
      val (a, b) = key
      val ts = it.map(_._2).toArray
      // either tile of the pair may be absent (empty residue class under
      // sparse ids): no rows on that side, so no pairs
      val ta = ts.find(_.bid == a).orNull
      val tb = if (a == b) ta else ts.find(_.bid == b).orNull
      if (ta == null || tb == null) Iterator.empty
      else emitTilePairs(a, b, ta, tb, minCos)
    }.toDF("id_a", "id_b", "cos")
  }

  /** Cache-friendly primitive dot loop over one (unordered) tile pair. */
  private def emitTilePairs(a: Int, b: Int, ta: SimTile, tb: SimTile,
      minCos: Double): Iterator[(Long, Long, Double)] = {
      val d = if (ta.ids.nonEmpty) ta.data.length / ta.ids.length else 0
      val out = Seq.newBuilder[(Long, Long, Double)]
      var i = 0
      while (i < ta.ids.length) {
        var j = if (a == b) i + 1 else 0
        while (j < tb.ids.length) {
          val ia = ta.ids(i); val ib = tb.ids(j)
          if (ia != ib) {
            var dot = 0.0
            var p = 0
            while (p < d) { dot += ta.data(i * d + p) * tb.data(j * d + p); p += 1 }
            val cos = dot / (math.sqrt(ta.norms(i)) * math.sqrt(tb.norms(j)))
            if (cos >= minCos)
              out += (if (ia < ib) (ia, ib, cos) else (ib, ia, cos))
          }
          j += 1
        }
        i += 1
      }
      out.result().iterator
  }

  /** Embedding near-duplicate pairs: cosine >= minCos, LSH-blocked with
    * Hamming-1 probing, exact cosine verification. Probabilistic recall —
    * use for high thresholds (>= ~0.8) where sign-LSH separates; see
    * [[blockedNearDupPairs]] for the exact path. */
  def cosineNearDupPairs(corpus: DataFrame, minCos: Double, bits: Int = 8,
      id: String = "vec_id", vec: String = "embedding"): DataFrame = {
    graft.tokenize.GraftFunctions.register(corpus.sparkSession)
    val sig = corpus.select(col(id), col(vec),
      norm2Col(col(vec)).as("n2"), lshBucketCol(col(vec), bits).as("b0"))
    val probed = sig.withColumn("bucket",
      explode((0 until bits).foldLeft(array(col("b0"))) { (acc, p) =>
        concat(acc, array(expr(s"b0 ^ ${1L << p}")))
      }))
    val l = probed.select(col("bucket"), col(id).as("id_a"),
      col(vec).as("va"), col("n2").as("na"))
    val r = sig.select(col("b0").as("bucket"), col(id).as("id_b"),
      col(vec).as("vb"), col("n2").as("nb"))
    l.join(r, Seq("bucket")).filter(col("id_a") < col("id_b"))
      .dropDuplicates(Seq("id_a", "id_b"))
      .withColumn("cos", cosineCol(col("va"), col("vb"), col("na"), col("nb")))
      .filter(col("cos") >= minCos)
      .select(col("id_a"), col("id_b"), col("cos"))
  }

  /** Embedding near-duplicate pairs WITHIN coarse-quantizer cells: the
    * candidate generator of [[semDedup]]. The IVF quantizer (same
    * seed-stable bounded fit as [[ivfTopK]]) assigns every vector a cell
    * via the native argmin kernel; only same-cell pairs are compared,
    * with exact cosine — so precision is 1.0 by construction and recall
    * is governed by how often a near-dup pair straddles a cell boundary
    * (SemDeDup's own approximation; measured in PipelineSpec on clustered
    * data).
    *
    * Shape at scale: assignment is a map-side codegen pass; the self-join
    * shuffles each side once by cell id — cost Σ|cell|², the quadratic
    * bounded per cell instead of per corpus. Raise nLists to shrink
    * cells; a pathologically dense cell is the [[blockedNearDupPairs]]
    * regime (run it per cell) — not composed here because balanced cells
    * are the operating point the quantizer fit targets. */
  def ivfNearDupPairs(corpus: DataFrame, minCos: Double, nLists: Int = 16,
      id: String = "vec_id", vec: String = "embedding",
      maxFitRows: Int = 100000, refineIters: Int = 0,
      quantizer: Option[Array[Array[Double]]] = None): DataFrame = {
    // `quantizer`: run over a GIVEN (frozen) centroid matrix — the full-
    // recompute reference point of the incremental family's identity
    // contract ([[ivfNearDupPairsIncremental]]); otherwise the one shared
    // fit path ([[fitCentroids]]: bounded sample seed + optional
    // full-corpus Lloyd refinement)
    val centroids = quantizer.getOrElse(
      fitCentroids(corpus, nLists, vec, maxFitRows, refineIters))
    val assigned = corpus.select(
      cellCol(centroids, col(vec)).as("list_id"),
      col(id), col(vec), norm2Col(col(vec)).as("n2"))
    val l = assigned.select(col("list_id"), col(id).as("id_a"),
      col(vec).as("va"), col("n2").as("na"))
    val r = assigned.select(col("list_id"), col(id).as("id_b"),
      col(vec).as("vb"), col("n2").as("nb"))
    l.join(r, Seq("list_id")).filter(col("id_a") < col("id_b"))
      .withColumn("cos", cosineCol(col("va"), col("vb"), col("na"), col("nb")))
      .filter(col("cos") >= minCos)
      .select(col("id_a"), col("id_b"), col("cos"))
  }

  /** Semantic dedup (SemDeDup, Abbas et al. 2023 — public literature's
    * complement to lexical dedup): cluster embeddings with the IVF coarse
    * quantizer, find within-cluster pairs at cosine ≥ minCos
    * ([[ivfNearDupPairs]]), and keep ONE doc per duplicate group.
    * Verdicts mirror [[Dedup.survivors]]: (id, rep_id, is_survivor) with
    * rep_id = the connected component's minimum id and the survivor = the
    * minimum id (deterministic keep order: id ascending — the stable
    * variant of the paper's keep-one-per-group; components rather than
    * per-pair drops because near-duplication is not transitive). Docs in
    * no pair are implicit survivors (not emitted — the frame is
    * pair-selective, like survivors). */
  def semDedup(corpus: DataFrame, minCos: Double, nLists: Int = 16,
      id: String = "vec_id", vec: String = "embedding",
      maxFitRows: Int = 100000, refineIters: Int = 0): DataFrame = {
    val comp = Dedup.components(
      ivfNearDupPairs(corpus, minCos, nLists, id, vec, maxFitRows,
        refineIters))
    comp.select(col("id").as(id), col("rep_id"),
      (col("id") === col("rep_id")).as("is_survivor"))
  }

  // ---- incremental semantic dedup (the embedding arrival loop) -------------

  /** Persistable form of a fitted coarse quantizer: (cell, centroid) —
    * the FROZEN state incremental semantic dedup composes over (cell
    * assignment depends only on the centroids, so per-batch assignment
    * composes exactly iff every batch uses the same matrix; refitting
    * mid-stream is a compaction-cadence event that rebuilds the assigned
    * table). */
  def centroidTable(spark: org.apache.spark.sql.SparkSession,
      centroids: Array[Array[Double]]): DataFrame = {
    import spark.implicits._
    centroids.zipWithIndex.toSeq.map { case (c, i) => (i, c.toSeq) }
      .toDF("cell", "centroid")
  }

  /** Read a [[centroidTable]] frame back into the driver-side matrix
    * (k·dim doubles — tiny at any corpus scale). */
  def centroidsFrom(table: DataFrame): Array[Array[Double]] =
    table.orderBy(col("cell"))
      .select(col("centroid").cast("array<double>"))
      .collect().map(_.getSeq[Double](0).toArray)

  /** Fit a quantizer for the incremental family: the bounded sample fit
    * (optionally full-corpus-refined) exposed as a public state builder. */
  def fitCentroids(corpus: DataFrame, nLists: Int = 16,
      vec: String = "embedding", maxFitRows: Int = 100000,
      refineIters: Int = 0): Array[Array[Double]] = {
    val seed = fitQuantizer(corpus, vec, nLists, maxFitRows)
    if (refineIters > 0) kmeansRefine(corpus, seed, refineIters, vec)
    else seed
  }

  /** The assigned-cell state table: (list_id, id, vec, n2) — one map-side
    * codegen pass, appended per batch (kept rows only, in the arrival
    * loop). Malformed embeddings fall out via `graft_argmin_cell`'s null
    * contract, mirroring the full op. */
  def assignCells(corpus: DataFrame, centroids: Array[Array[Double]],
      id: String = "vec_id", vec: String = "embedding"): DataFrame = {
    ensureRegistered()
    graft.tokenize.GraftFunctions.register(corpus.sparkSession)
    corpus.select(cellCol(centroids, col(vec)).as("list_id"),
        col(id), col(vec), norm2Col(col(vec)).as("n2"))
      .filter(col("list_id").isNotNull)
  }

  /** Incremental within-cell near-dup pairs: pairs TOUCHING an arriving
    * batch, given the frozen quantizer and the persisted assigned table
    * of everything before it. Output rows are IDENTICAL to
    * `ivfNearDupPairs(base ∪ batch)` restricted to pairs touching the
    * batch, PROVIDED the full run uses the same centroid matrix (the
    * composability condition the state exists to pin).
    *
    * Shape at scale: batch assignment is map-side; batch-internal pairs
    * are a Θ(batch) cell self-join; cross pairs SCAN the base assigned
    * table under a broadcast of the batch's assigned rows — exact cosine
    * evaluates inside the probe join's projection, the base side pays
    * zero exchange. `broadcastAssigned=false` degrades to an SMJ of
    * fixed-width (dim-float) assigned rows for a batch that outgrows the
    * broadcast limit. */
  def ivfNearDupPairsIncremental(batch: DataFrame, baseAssigned: DataFrame,
      centroids: Array[Array[Double]], minCos: Double,
      id: String = "vec_id", vec: String = "embedding",
      broadcastAssigned: Boolean = true): DataFrame = {
    val ba = assignCells(batch, centroids, id, vec)
    val probe = if (broadcastAssigned) broadcast(ba) else ba
    val intra = ba.select(col("list_id"), col(id).as("id_a"),
        col(vec).as("va"), col("n2").as("na"))
      .join(probe.select(col("list_id"), col(id).as("id_b"),
        col(vec).as("vb"), col("n2").as("nb")), Seq("list_id"))
      .filter(col("id_a") < col("id_b"))
    val cross = baseAssigned.select(col("list_id"), col(id).as("base_id"),
        col(vec).as("bv"), col("n2").as("bn"))
      .join(probe.select(col("list_id"), col(id).as("batch_id"),
        col(vec).as("qv"), col("n2").as("qn")), Seq("list_id"))
      .select(least(col("base_id"), col("batch_id")).as("id_a"),
        greatest(col("base_id"), col("batch_id")).as("id_b"),
        col("bv").as("va"), col("qv").as("vb"),
        col("bn").as("na"), col("qn").as("nb"))
    intra.select(col("id_a"), col("id_b"), col("va"), col("vb"),
        col("na"), col("nb"))
      .unionByName(cross)
      .withColumn("cos", cosineCol(col("va"), col("vb"), col("na"),
        col("nb")))
      .filter(col("cos") >= minCos)
      .select(col("id_a"), col("id_b"), col("cos"))
  }

  /** Arrival-order semantic dedup verdicts for a batch — the online
    * analog of [[semDedup]] (and the embedding member of the incremental
    * dedup family): a batch doc is KEPT iff it near-dups no doc of the
    * persisted kept state and no lower-id KEPT doc of its own batch (the
    * greedy keep rule every dedup-on-ingest loop implements; exact dup is
    * transitive so [[Dedup.exactIncremental]]'s first-occurrence rule is
    * this same greedy — near-duplication is not, so greedy and
    * batch-holistic components genuinely differ on chains and the ONLINE
    * semantics is the one the state can answer at Θ(batch)).
    * Returns one verdict row per batch doc with a non-null cell:
    * (id, is_new). Append `assignCells(kept rows)` to the state table
    * afterwards — the loop [[graft.streaming.StreamingDedup]] runs for
    * digests.
    *
    * The within-batch greedy chain is resolved on the driver over the
    * batch-internal pair list (Θ(batch dups), the [[Dedup.components]]
    * union-find regime — greedy keep is inherently sequential in id
    * order, so a distributed fixpoint would iterate chain-length times
    * over a pair list this small anyway). */
  def semDedupIncremental(batch: DataFrame, baseAssigned: DataFrame,
      centroids: Array[Array[Double]], minCos: Double,
      id: String = "vec_id", vec: String = "embedding",
      broadcastAssigned: Boolean = true): DataFrame = {
    val spark = batch.sparkSession
    import spark.implicits._
    val ba = assignCells(batch, centroids, id, vec)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val probe = if (broadcastAssigned) broadcast(ba) else ba
      // batch docs hit by ANY kept base doc: distributed, zero base
      // exchange (base table scanned under the broadcast probe); the
      // frame is batch-dup-bounded, stays distributed, and is consumed
      // EXACTLY ONCE — by the returned verdict join — so the full base
      // scan is paid once per arriving batch
      def hitProbe(batchSide: DataFrame): DataFrame =
        baseAssigned.select(col("list_id"),
            col(vec).as("bv"), col("n2").as("bn"))
          .join(batchSide, Seq("list_id"))
          .filter(cosineCol(col("bv"), col("qv"), col("bn"), col("qn"))
            >= minCos)
          .select(col("bid")).distinct()
      val baseHit = hitProbe(probe.select(col("list_id"),
        col(id).as("bid"), col(vec).as("qv"), col("n2").as("qn")))
      // batch-internal near-dup pairs: ONLY docs in this pair list need
      // the sequential greedy — everything else is decided by baseHit
      // alone, so the driver sees the Θ(batch dups) chain, never the batch
      val intra = ba.select(col("list_id"), col(id).as("id_a"),
          col(vec).as("va"), col("n2").as("na"))
        .join(probe.select(col("list_id"), col(id).as("id_b"),
          col(vec).as("vb"), col("n2").as("nb")), Seq("list_id"))
        .filter(col("id_a") < col("id_b"))
        .filter(cosineCol(col("va"), col("vb"), col("na"), col("nb"))
          >= minCos)
        .select(col("id_a"), col("id_b")).as[(Long, Long)].collect()
      val chainIds = intra.flatMap(p => Seq(p._1, p._2)).distinct.sorted
      // the chain's own base-hit flags come from a NARROW probe carrying
      // only the chain docs' vectors (chain ≪ batch) — not by forcing
      // the full baseHit frame early, which would make the caller's
      // verdict action re-scan the base table a second time
      val chainHit: Set[Long] = if (chainIds.isEmpty) Set.empty
        else hitProbe(broadcast(ba.join(
            broadcast(chainIds.toSeq.toDF(id)), Seq(id), "left_semi")
          .select(col("list_id"), col(id).as("bid"),
            col(vec).as("qv"), col("n2").as("qn"))))
          .as[Long].collect().toSet
      val nbrs = intra.groupBy(_._2).view
        .mapValues(_.map(_._1).toSet).toMap // lower-id neighbours
      val kept = scala.collection.mutable.Set.empty[Long]
      val chainDropped = scala.collection.mutable.Set.empty[Long]
      chainIds.foreach { i =>
        val ok = !chainHit.contains(i) &&
          !nbrs.getOrElse(i, Set.empty).exists(kept.contains)
        if (ok) kept += i else chainDropped += i
      }
      // final verdicts distributed: is_new = no base hit AND not dropped
      // by the greedy chain (both predicates batch-dup-bounded). The
      // returned frame may recompute ba after the unpersist below —
      // a deterministic map-side assign, so recompute-over-leak (the
      // Searcher cache convention)
      val droppedDf = broadcast(chainDropped.toSeq.toDF("did"))
      ba.select(col(id))
        .join(baseHit.withColumnRenamed("bid", id)
          .withColumn("hit", lit(true)), Seq(id), "left_outer")
        .join(droppedDf.withColumnRenamed("did", id)
          .withColumn("chain_drop", lit(true)), Seq(id), "left_outer")
        .select(col(id),
          (coalesce(col("hit"), lit(false)) === false &&
            coalesce(col("chain_drop"), lit(false)) === false).as("is_new"))
    } finally ba.unpersist(blocking = false)
  }
}
