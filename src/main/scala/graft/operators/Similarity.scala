package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.CosineSimilarity

/** Embedding similarity operators (SURVEY.md §2.3 #29-31): near-dup
  * detection, brute-force cosine top-k ANN, and IVF ANN.
  *
  * All cosine math goes through the codegen'd [[CosineSimilarity]]
  * expression — a single fused ascending-index loop whose result is
  * bit-identical to the DuckDB oracle's `list_reduce` left folds, so
  * float outputs need no rounding to hash-match.
  *
  * Scale design (SURVEY.md §5):
  * - #29 is candidate-join shaped: deterministic random-hyperplane LSH
  *   buckets (8 bands × 4 sign bits) are the only pair-producing join
  *   key; exact cosine verification touches candidates only. Band/bit
  *   counts are parameters — at 100 TB you raise bits-per-band so
  *   bucket occupancy stays bounded; recall near τ here is ≈80%
  *   (identical, deterministically, in both engines).
  * - #30 brute top-k broadcasts the small query set (never the corpus)
  *   and keeps a per-query heap via window rank — one corpus scan, one
  *   shuffle on q_id. It is the exact baseline; #31 is the scale path.
  * - #31 IVF bounds the scanned fraction: nearest-of-10-centroids cell
  *   assignment (broadcast centroids), probe the top-2 cells per query
  *   → ~20% of the corpus scanned per query at any scale.
  */
object Similarity {

  private val CosineTau = 0.45
  private val Dim = 64
  private val Bands = 8
  /** Sign bits per band = log2(buckets per band). 4 (16 buckets/band)
    * is tuned for the small test corpus: random bucket collisions grow
    * as n²/2^bits per band, so at 10^6+ vectors this knob RISES to
    * keep occupancy bounded (docs/SCALING.md probe 4 measures the
    * cliff and the remedy). Raising it trades recall near τ for
    * bounded candidate counts — the standard sign-LSH dial; both the
    * operator and its generated oracle derive from the same constant,
    * so they can never drift apart.
    */
  private val BitsPerBand = 4
  private val TopK = 5
  private val NQueries = 10

  /** Deterministic LCG "random" hyperplanes, exactly representable as
    * doubles (denominator 2^31) so the literal values embedded in the
    * oracle SQL round-trip bit-identically. Generated on demand for
    * any (band, bit) index, so probe variants with more bits per band
    * draw from the same family.
    */
  private def hyperplane(p: Int): Array[Double] =
    Array.tabulate(Dim) { d =>
      ((1103515245L * (p * Dim + d) + 12345L) % 2147483648L).toDouble / 2147483648.0 - 0.5
    }

  /** The codegen'd expression, via the session registry (public API). */
  private def cosine(a: Column, b: Column): Column =
    call_function("cosine_sim", a, b)

  /** embeddings with the float vector cast to array<double> (column v);
    * also (idempotently) registers the cosine_sim expression.
    */
  private def emb(spark: SparkSession, dir: String): DataFrame = {
    CosineSimilarity.register(spark)
    graft.functions.DotProduct.register(spark)
    graft.functions.UsableVec.register(spark)
    Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
  }

  /** Ascending left-fold dot product with a literal hyperplane, via the
    * codegen'd [[graft.functions.DotProduct]] — the built-in
    * `aggregate(zip_with(...))` pipeline runs interpreted and dominated
    * bucket computation (32 plane dots per vector). Fold order is
    * identical, so it still matches the oracle's
    * `list_reduce(list_prepend(0.0, ...))` bit-for-bit.
    */
  private def planeDot(v: Column, p: Int): Column =
    call_function("dot_product", v, array(hyperplane(p).map(lit).toSeq: _*))

  /** Per-band integer bucket from the sign bits of 4 plane dots. */
  private def bandBucket(v: Column, band: Int, bits: Int = BitsPerBand): Column =
    (0 until bits).map { r =>
      when(planeDot(v, band * bits + r) > 0, lit(1 << r)).otherwise(lit(0))
    }.reduce(_ + _)

  /** #29 — embedding near-dup pairs: sign-LSH candidates, exact cosine
    * ≥ τ verification on candidates only.
    */
  def qDedupEmbedding(spark: SparkSession, dir: String): DataFrame =
    dedupEmbeddingWithBits(spark, dir, BitsPerBand)

  /** #29 generalized over the bits-per-band dial — the scale knob the
    * scaladoc on [[BitsPerBand]] describes, exposed so probes/specs can
    * measure the occupancy-vs-recall trade (docs/SCALING.md probe 4)
    * without touching the oracle-checked default.
    */
  def dedupEmbeddingWithBits(spark: SparkSession, dir: String, bits: Int): DataFrame = {
    // bucket values are built from Int bit flags (1 << r); past 31 the
    // shift overflows to colliding/negative buckets SILENTLY
    require(bits > 0 && bits <= 31, s"bits-per-band must be in [1, 31], got $bits")
    // USABLE vectors only (review r15): rankings/pairs run over the
    // validated corpus — a NULL-element vector read as 0.0 here while
    // the oracle's NULL arithmetic voided its cosines, and a
    // NaN-poisoned one would top DuckDB's DESC sort (NaN compares
    // greatest there). The #102 validator is the executable upstream
    // of this contract; the gate now enforces it on both engines.
    val e = embUsable(spark, dir)
    val buckets = e.select(col("vec_id"), col("v"),
      posexplode(array((0 until Bands).map(b => bandBucket(col("v"), b, bits)): _*))
        .as(Seq("band", "bucket")))
    // cosine is verified INLINE on the band-join output — candidate rows
    // (and their vectors) stay pipelined inside the stage and only the
    // tiny ≥τ survivor set reaches the distinct shuffle. No vector ever
    // crosses a pair-keyed shuffle.
    buckets.select(col("vec_id").as("vec_a"), col("v").as("va"),
        col("band"), col("bucket"))
      .join(buckets.select(col("vec_id").as("vec_b"), col("v").as("vb"),
        col("band"), col("bucket")), Seq("band", "bucket"))
      .where(col("vec_a") < col("vec_b"))
      .withColumn("cos", cosine(col("va"), col("vb")))
      .where(col("cos") >= CosineTau)
      .select("vec_a", "vec_b", "cos").distinct()
      .orderBy("vec_a", "vec_b")
  }

  /** Oracle-side SQL fragments: hyperplane literals + identical folds. */
  private def hpSqlLiteral(p: Int): String =
    hyperplane(p).mkString("[", ", ", "]")

  private def planeDotSql(v: String, p: Int): String =
    s"list_reduce(list_prepend(0.0, list_transform(range(1, ${Dim + 1}), i -> $v[i] * (${hpSqlLiteral(p)})[i])), (acc, x) -> acc + x)"

  private def bandBucketSql(v: String, band: Int): String =
    (0 until BitsPerBand).map { r =>
      s"(CASE WHEN ${planeDotSql(v, band * BitsPerBand + r)} > 0 THEN ${1 << r} ELSE 0 END)"
    }.mkString(" + ")

  private val cosineSqlAB =
    s"""list_reduce(list_prepend(0.0, list_transform(range(1, ${Dim + 1}), i -> va[i] * vb[i])), (acc, x) -> acc + x)
       | / (sqrt(list_reduce(list_prepend(0.0, list_transform(range(1, ${Dim + 1}), i -> va[i] * va[i])), (acc, x) -> acc + x))
       |    * sqrt(list_reduce(list_prepend(0.0, list_transform(range(1, ${Dim + 1}), i -> vb[i] * vb[i])), (acc, x) -> acc + x)))""".stripMargin

  val qDedupEmbeddingSql: String = {
    val bucketRows = (0 until Bands).map(b =>
      s"SELECT vec_id, v, $b AS band, ${bandBucketSql("v", b)} AS bucket FROM e")
      .mkString("\nUNION ALL\n")
    s"""WITH e AS (
       |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
       |  FROM embeddings
       |  WHERE len(embedding) = $Dim
       |    AND NOT EXISTS (SELECT 1 FROM unnest(embedding) AS t(x) WHERE x IS NULL)
       |    AND isfinite(list_reduce(list_prepend(0.0, list_transform(range(1, ${Dim + 1}), i -> v[i] * v[i])), (acc, x) -> acc + x)) AND list_reduce(list_prepend(0.0, list_transform(range(1, ${Dim + 1}), i -> v[i] * v[i])), (acc, x) -> acc + x) > 0),
       |buckets AS (
       |$bucketRows),
       |cand AS (
       |  SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
       |  FROM buckets a JOIN buckets b
       |    ON a.band = b.band AND a.bucket = b.bucket AND a.vec_id < b.vec_id),
       |scored AS (
       |  SELECT vec_a, vec_b, $cosineSqlAB AS cos
       |  FROM (SELECT vec_a, vec_b, ea.v AS va, eb.v AS vb
       |        FROM cand JOIN e ea ON vec_a = ea.vec_id JOIN e eb ON vec_b = eb.vec_id))
       |SELECT vec_a, vec_b, cos FROM scored
       |WHERE cos >= $CosineTau ORDER BY vec_a, vec_b""".stripMargin
  }

  /** #30 — brute-force cosine top-k: broadcast the 10-query set against
    * the corpus (BroadcastNestedLoopJoin — linear in corpus size, the
    * exact-answer baseline), rank per query, keep k=5.
    */
  def qAnnCosineTopk(spark: SparkSession, dir: String): DataFrame = {
    // usable vectors only — the #29 contract (review r15)
    val e = embUsable(spark, dir)
    val q = e.where(col("vec_id") < NQueries)
      .select(col("vec_id").as("q_id"), col("v").as("qv"))
    val w = Window.partitionBy("q_id").orderBy(col("cos").desc, col("vec_id"))
    e.crossJoin(broadcast(q))
      .where(col("vec_id") =!= col("q_id"))
      .withColumn("cos", cosine(col("qv"), col("v")))
      .withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= TopK)
      .select("q_id", "rank", "vec_id", "cos")
      .orderBy("q_id", "rank")
  }

  val qAnnCosineTopkSql: String =
    s"""WITH e AS (
       |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
       |  FROM embeddings
       |  WHERE len(embedding) = $Dim
       |    AND NOT EXISTS (SELECT 1 FROM unnest(embedding) AS t(x) WHERE x IS NULL)
       |    AND isfinite(list_reduce(list_prepend(0.0, list_transform(range(1, ${Dim + 1}), i -> v[i] * v[i])), (acc, x) -> acc + x)) AND list_reduce(list_prepend(0.0, list_transform(range(1, ${Dim + 1}), i -> v[i] * v[i])), (acc, x) -> acc + x) > 0),
       |q AS (SELECT vec_id AS q_id, v AS qv FROM e WHERE vec_id < $NQueries),
       |scored AS (
       |  SELECT q_id, vec_id,
       |    list_reduce(list_prepend(0.0, list_transform(range(1, ${Dim + 1}), i -> qv[i] * v[i])), (acc, x) -> acc + x)
       |     / (sqrt(list_reduce(list_prepend(0.0, list_transform(range(1, ${Dim + 1}), i -> qv[i] * qv[i])), (acc, x) -> acc + x))
       |        * sqrt(list_reduce(list_prepend(0.0, list_transform(range(1, ${Dim + 1}), i -> v[i] * v[i])), (acc, x) -> acc + x))) AS cos
       |  FROM q JOIN e ON vec_id <> q_id),
       |ranked AS (
       |  SELECT q_id, vec_id, cos,
       |    row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, vec_id) AS rank
       |  FROM scored)
       |SELECT q_id, rank, vec_id, cos FROM ranked
       |WHERE rank <= $TopK ORDER BY q_id, rank""".stripMargin

  /** #31 — deterministic IVF ANN (rows-only gate): centroids = the 10
    * vectors with vec_id % 50 == 0; every vector is assigned to its
    * nearest centroid (broadcast argmax); each query probes its top-2
    * centroid cells and scans only those cells (~20% of the corpus).
    * The spec checks recall against the #30 exact baseline.
    */
  def qAnnIvf(spark: SparkSession, dir: String): DataFrame =
    annIvfWithProbes(spark, dir, nprobe = 2)

  /** The gated query's deterministic centroid rule, sized for scale:
    * seeds are ids ≡ 0 (mod this), so cells ≈ n / mod. The mod is
    * n / ⌈√n⌉ (⟹ ~√n cells — the standard IVF sizing: assignment
    * cost n·√n, never n²) FLOORED AT 50 so gate-SF behavior is
    * unchanged (500 vectors → 10 cells at sf0.01, where AnnSpec's
    * recall pins live). Probe 17 caught the unsized rule: a fixed
    * mod ties cell count to n LINEARLY, making assignment n²/50 —
    * 142× for a 16× corpus; √n sizing restores sub-quadratic growth.
    * (The SERVING path — ivfIndex/kmeansCentroids — always took k
    * from the caller and never had this flaw.)
    */
  private[graft] def centroidMod(n: Long): Long =
    math.max(50L, n / math.max(1L, math.ceil(math.sqrt(n.toDouble)).toLong))

  /** Row count of the embeddings store from parquet FOOTER metadata —
    * driver-side I/O over O(#files) footers, no Spark job. The
    * previous `e.count()` sizing ran a full extra job (an entire
    * corpus pass at 100 TB) just to pick the centroid modulus
    * (VERDICT r11 item 2); the store already knows its cardinality.
    * The serving path (ivfIndex) never needed this — it takes k from
    * the caller.
    */
  private[graft] def embeddingRowCount(spark: SparkSession, dir: String): Long = {
    import org.apache.hadoop.fs.Path
    val conf = spark.sparkContext.hadoopConfiguration
    val root = new Path(s"$dir/embeddings.parquet")
    val fs = root.getFileSystem(conf)
    // recursive listing: a partitioned store nests part files under
    // key=value subdirectories a top-level listStatus would miss —
    // and a silent 0 here would quietly shrink the centroid modulus
    // away from the oracle's count(*), so an empty store fails loudly
    val statuses =
      if (fs.getFileStatus(root).isFile) Array(fs.getFileStatus(root))
      else {
        val it = fs.listFiles(root, /*recursive=*/ true)
        val buf = scala.collection.mutable.ArrayBuffer
          .empty[org.apache.hadoop.fs.FileStatus]
        // skip uncommitted/hidden subtrees (_temporary/.staging/...)
        // exactly like the Spark and DuckDB table readers do — a
        // crashed write's leftover part file must not skew the
        // centroid modulus away from the oracle's count(*). The walk
        // stops at the QUALIFIED store root (listing paths come back
        // scheme-qualified; comparing against the raw root would
        // never match, and a dotted ANCESTOR of the store — e.g. a
        // ~/.cache corpus home — would wrongly hide every file)
        val qRoot = fs.makeQualified(root)
        def hidden(p: org.apache.hadoop.fs.Path): Boolean = {
          var q = p.getParent
          var h = false
          while (q != null && q != qRoot && !h) {
            val n = q.getName
            h = n.startsWith("_") || n.startsWith(".")
            q = q.getParent
          }
          h
        }
        while (it.hasNext) {
          val s = it.next()
          val n = s.getPath.getName
          if (n.endsWith(".parquet") && !n.startsWith("_") &&
              !n.startsWith(".") && !hidden(s.getPath)) buf += s
        }
        buf.toArray
      }
    require(statuses.nonEmpty,
      s"embeddingRowCount: no parquet files under $root — " +
        "cannot size the IVF centroid modulus from an empty store")
    statuses.map { s =>
      val rdr = org.apache.parquet.hadoop.ParquetFileReader.open(
        org.apache.parquet.hadoop.util.HadoopInputFile.fromStatus(s, conf))
      try rdr.getRecordCount finally rdr.close()
    }.sum
  }

  /** The gate IVF's usable-vector frame and its deterministic
    * cell assignment, shared by #31 and the #164 balance readout so
    * the two can never disagree about what "the index" is. Returns
    * (usable frame `(vec_id, v)`, centroid frame `(cent_id, cv)`,
    * assigned frame `(vec_id, v, cell)`).
    *
    * Usable-vector filter (declared dim, no null elements, positive
    * norm — the #161/validateEmbeddings convention): poisoned vectors
    * can neither seed a centroid nor rank as neighbors, and — stated
    * identically in the oracle — it is what lets these queries carry
    * a HASH gate on dirty corpora (null cosines order differently
    * under the two engines' null rules; rows that never score cannot
    * diverge). The centroid mod still derives from the RAW store
    * cardinality (parquet footers), matching the oracle's count(*).
    *
    * Plan shape: the ~√n centroid cosines evaluate inline per row
    * (broadcast cross join) and max_by picks the cell (ties → lowest
    * cent_id via the negated id in the ordering struct). The
    * groupBy(vec_id) argmax DOES exchange the corpus rows once — ids
    * are unique, so partial aggregation contracts nothing (r20
    * honesty pass). This is the GATE-replay shape, kept join-formed
    * so it mirrors the oracle CTEs stage for stage; the SERVING path
    * — [[graft.api.Graft.ivfIndex]]/`ivfResiduals` — assigns with a
    * zero-exchange map-side argmax over the collected centroid
    * literal, and is what a corpus-scale deployment runs.
    */
  private def ivfGateAssigned(spark: SparkSession,
      dir: String): (DataFrame, DataFrame, DataFrame) = {
    // the shared usableVec predicate (review r15: a bare dot>0 KEPT
    // inf-norm vectors whose downstream Spark cosines all went NULL
    // while DuckDB kept ranking inf arithmetic, and NaN-norm diverged
    // outright — DuckDB NaN compares greater than everything)
    val e = emb(spark, dir).where(usableVec(col("v")))
    val cents = e.where(col("vec_id") % centroidMod(embeddingRowCount(spark, dir)) === 0)
      .select(col("vec_id").as("cent_id"), col("v").as("cv"))
    val assigned = e.crossJoin(broadcast(cents))
      .withColumn("ccos", cosine(col("cv"), col("v")))
      .groupBy("vec_id")
      .agg(
        first(col("v")).as("v"),
        max_by(col("cent_id"),
          struct(col("ccos"), (-col("cent_id")).as("tie"))).as("cell"))
    (e, cents, assigned)
  }

  /** #164 — `q_ivf_cell_balance`: the per-cell population of the gate
    * IVF index — `(cell, n_vecs, share)` with `share` the cell's
    * fraction of usable vectors (integer ratio, ONE final double
    * division → bit-identical across engines). This is the balance
    * readout an ANN deployment checks BEFORE serving: IVF probe cost
    * is `nprobe × E[cell size | probed]`, so a skewed assignment
    * silently turns a 2-probe query into a near-full scan (the FAISS
    * imbalance-factor diagnostic; [[graft.api.Graft.ivfImbalance]]
    * contracts this frame to the scalar k·Σshare²). Composes the
    * SHARED [[ivfGateAssigned]] stage, so the readout describes
    * exactly the index #31 serves from.
    *
    * Scale: the assignment's broadcast argmax (no corpus shuffle) +
    * ONE contraction to ≤ √n cell rows; the share window runs on the
    * contracted frame only. At 100 TB the same readout runs off a
    * stored [[graft.api.Graft.ivfIndex]] table via the facade form
    * instead of re-assigning.
    */
  def qIvfCellBalance(spark: SparkSession, dir: String): DataFrame = {
    val (_, _, assigned) = ivfGateAssigned(spark, dir)
    cellBalance(assigned.select(col("vec_id").as("id"), col("cell")))
      .orderBy("cell")
  }

  /** #164 over any `(id, cell)` assignment — the form a deployment
    * points at its stored index table. */
  private[graft] def cellBalance(index: DataFrame): DataFrame =
    cellBalanceFromCounts(
      index.groupBy("cell").agg(count(lit(1)).as("n_vecs")))

  /** The share tail over an already-contracted `(cell, n_vecs)` frame —
    * shared with the streaming fold ([[graft.streaming.Streams
    * .ivfBalanceState]]), whose per-batch integer partials sum to
    * exactly this input. */
  private[graft] def cellBalanceFromCounts(perCell: DataFrame): DataFrame = {
    // global total via a window over the CONTRACTED frame. This DOES
    // fold the cell rows into one partition (Spark warns) — and that
    // is the right plan: the frame is ≤ #cells ≈ √n rows (3×10⁵ at
    // 10¹¹ vectors), while the tempting broadcast-total cross join
    // references perCell twice and DUPLICATES the whole upstream
    // assignment (two full corpus scans + two broadcast argmaxes —
    // plan-audited, round 13). One bounded single-partition window
    // beats two corpus passes at any scale.
    perCell
      .withColumn("n_total", sum("n_vecs").over(
        Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
      .select(col("cell"), col("n_vecs"),
        (col("n_vecs").cast("double") / col("n_total")).as("share"))
  }

  val qIvfCellBalanceSql: String = {
    def fold(a: String, b: String) =
      s"list_reduce(list_prepend(0.0, list_transform(range(1, ${Dim + 1}), i -> $a[i] * $b[i])), (acc, x) -> acc + x)"
    def cos(a: String, b: String) =
      s"${fold(a, b)} / (sqrt(${fold(a, a)}) * sqrt(${fold(b, b)}))"
    s"""WITH e AS (
       |  SELECT vec_id,
       |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
       |  FROM embeddings
       |  WHERE len(embedding) = $Dim
       |    AND NOT EXISTS (SELECT 1 FROM unnest(embedding) AS t(x) WHERE x IS NULL)
       |    AND isfinite(${fold("v", "v")}) AND ${fold("v", "v")} > 0),
       |m AS (
       |  SELECT greatest(50, CAST(n // CAST(ceil(sqrt(n)) AS BIGINT) AS BIGINT)) AS md
       |  FROM (SELECT CAST(count(*) AS BIGINT) AS n FROM embeddings)),
       |cents AS (
       |  SELECT vec_id AS cent_id, v AS cv FROM e, m
       |  WHERE ((vec_id % md) + md) % md = 0),
       |assigned AS (
       |  SELECT vec_id, cell FROM (
       |    SELECT e.vec_id, c.cent_id AS cell,
       |      row_number() OVER (PARTITION BY e.vec_id
       |        ORDER BY ${cos("c.cv", "e.v")} DESC, c.cent_id) AS ar
       |    FROM e CROSS JOIN cents c) WHERE ar = 1)
       |SELECT cell, CAST(count(*) AS BIGINT) AS n_vecs,
       |  CAST(count(*) AS DOUBLE)
       |    / (SELECT count(*) FROM assigned) AS share
       |FROM assigned GROUP BY cell ORDER BY cell""".stripMargin
  }

  /** #31 generalized over the nprobe dial — the IVF recall/cost knob
    * (scan fraction ≈ nprobe / n_cells), exposed so AnnSpec can sweep
    * recall against the exact baseline without touching the gated
    * default. */
  def annIvfWithProbes(spark: SparkSession, dir: String, nprobe: Int): DataFrame = {
    require(nprobe > 0, s"nprobe must be positive, got $nprobe")
    val NProbe = nprobe
    val (e, cents, assigned) = ivfGateAssigned(spark, dir)
    val q = e.where(col("vec_id") < NQueries)
      .select(col("vec_id").as("q_id"), col("v").as("qv"))
    val wProbe = Window.partitionBy("q_id").orderBy(col("ccos").desc, col("cent_id"))
    val probes = q.crossJoin(broadcast(cents))
      .withColumn("ccos", cosine(col("cv"), col("qv")))
      .withColumn("crank", row_number().over(wProbe))
      .where(col("crank") <= NProbe)
      .select(col("q_id"), col("qv"), col("cent_id").as("cell"))
    val wTop = Window.partitionBy("q_id").orderBy(col("cos").desc, col("vec_id"))
    assigned.join(broadcast(probes), "cell")
      .where(col("vec_id") =!= col("q_id"))
      .withColumn("cos", cosine(col("qv"), col("v")))
      .withColumn("rank", row_number().over(wTop))
      .where(col("rank") <= TopK)
      .select("q_id", "rank", "vec_id", "cos")
      .orderBy("q_id", "rank")
  }

  /** Cluster count for [[qDedupSemantic]]. 8 keeps test-corpus cells
    * at a few hundred vectors; at scale this knob RISES with the
    * corpus (k ≈ n / target-cell-size, the published SemDeDup setting
    * uses cells of a few thousand) so the within-cell pair work stays
    * n²/k-bounded per cell and the whole pass is one cell-keyed
    * exchange regardless of corpus size.
    */
  private val SemClusters = 8
  private val SemIters = 3

  /** #103 — `q_dedup_semantic`: SemDeDup-style cluster-then-prune
    * (Abbas et al. 2023, "SemDeDup: Data-efficient learning at
    * web-scale through semantic deduplication"): spherical k-means
    * partitions the embedding space, then semantic duplicates are
    * found by exact cosine WITHIN each cluster only — the published
    * recipe for embedding-level dedup on web-scale corpora, where
    * all-pairs is impossible and sign-LSH (#29) keys on bit-equality
    * rather than neighborhood structure.
    *
    * Pipeline (every stage an existing gated primitive): centroids =
    * [[graft.api.Graft.kmeansCentroids]] (deterministic lowest-id
    * seeds, fixed Lloyd rounds, only k×dim doubles ever reach the
    * driver); assignment = [[graft.api.Graft.ivfIndex]] (broadcast
    * centroids + map-side max_by — the corpus never shuffles to get
    * its cell); pairs = self-join keyed on `cell`, the ONLY
    * corpus-sized exchange, with exact cosine verified inline and the
    * smaller-id vector of each ≥τ pair elected keeper. Output: one
    * row per DROPPED vector with its cell, how many kept/smaller-id
    * semantic twins it has, and its strongest cosine — the readout a
    * curation run consumes as a drop-list.
    *
    * HASH-GATED since r15 (previously rows-only): the oracle
    * re-derives the ENTIRE spherical k-means fit — seeds, 3 unrolled
    * Lloyd rounds with the #75 decimal fixed-point means, final
    * assignment — as MATERIALIZED CTE stages (the #171 BPE-fit /
    * #184 k-center discipline), then the within-cell ≥τ pairs and the
    * drop-list aggregate on top. Two things make the fit
    * cross-engine-exact: the seed draw orders by the MINSTD spread
    * ([[minstdSpread]] — same decorrelation job as xxhash64, which
    * DuckDB lacks), and each centroid mean leaves fixed-point as ONE
    * IEEE-correctly-rounded division of exactly-representable
    * integers. The gate also pre-filters to dimension-complete usable
    * vectors ([[embUsable]]): a dim-skewed vector can neither vote
    * nor pair (cross-dim cosine is NULL) but COULD previously occupy
    * a dead seed, which no SQL engine could reproduce without the
    * same quirk. AnnSpec still pins determinism, exact-dup recall
    * (identical vectors always share a cell, so verbatim duplicates
    * cannot escape), agreement with the brute-force pair set within
    * cells, and null-safety on poisoned embeddings.
    */
  def qDedupSemantic(spark: SparkSession, dir: String): DataFrame =
    semanticDropList(embUsable(spark, dir), SemClusters, SemIters, CosineTau,
      seedSpread = minstdSpread)

  /** #103 generalized over (k, iters, τ, maxCell) so specs can plant
    * corpora and sweep the dials without touching the gated default.
    * Input: `(vec_id, v)` with `v: array<double>`.
    *
    * `maxCell` is the probe-13 imbalance guard: a skewed k-means fit
    * can hand one cell a quadratic share of the pair work (one
    * runaway cell owns the tail — docs/SCALING.md probe 13). Cells
    * above the cap are SALTED into ⌈size/maxCell⌉ sub-cells keyed by
    * a hash OF THE VECTOR, so identical vectors always co-salt — the
    * verbatim-copy guarantee survives capping unconditionally; what
    * the cap trades is near-dup recall between DIFFERENT vectors that
    * land in different salts of a pathological cell (the #47 df-cap
    * discipline: bound the quadratic term, document the recall
    * trade). Balanced cells get salt 0 and are untouched.
    */
  def semanticDropList(e: DataFrame, k: Int, iters: Int,
      tau: Double, maxCell: Int = Int.MaxValue,
      seedSpread: Column => Column = xxhash64(_)): DataFrame = {
    require(maxCell > 0, s"maxCell must be positive, got $maxCell")
    val cents = graft.api.Graft.kmeansCentroids(e, "vec_id", "v", k, iters,
      seedSpread)
    val idx0 = graft.api.Graft.ivfIndex(e, "vec_id", "v",
      cents, "cent_id", "cv")
    val idx =
      if (maxCell == Int.MaxValue) idx0.withColumn("salt", lit(0L))
      else {
        // the size window shuffles on cell — the same key the pair
        // join needs, so the exchange is reused, not added
        val wCell = Window.partitionBy("cell")
        idx0.withColumn("csz", count(lit(1)).over(wCell))
          .withColumn("salt",
            when(col("csz") > maxCell,
              pmod(hash(col("vec")).cast("long"),
                ceil(col("csz") / maxCell).cast("long")))
              .otherwise(lit(0L)))
          .drop("csz")
      }
    val pairs = idx.select(col("cell"), col("salt"), col("id").as("vec_a"),
        col("vec").as("va"))
      .join(idx.select(col("cell"), col("salt"), col("id").as("vec_b"),
        col("vec").as("vb")), Seq("cell", "salt"))
      .where(col("vec_a") < col("vec_b"))
      .withColumn("cos", cosine(col("va"), col("vb")))
      .where(col("cos") >= tau)
    // drop rule: a vector leaves the corpus iff a smaller-id semantic
    // twin shares its cell — one tiny aggregate over the survivor
    // pairs, no connected components needed (the keeper of each dup
    // group is simply its minimum id, and transitive chains all point
    // at smaller ids by construction)
    pairs.groupBy(col("vec_b").as("vec_id"))
      .agg(first(col("cell")).as("cell"),
        count(lit(1)).as("dup_of_ct"),
        max(col("cos")).cast("double").as("max_cos"))
      .orderBy("vec_id")
  }

  /** MINSTD (Park–Miller) multiplicative spread for seed draws that
    * must reproduce cross-engine: h(id) = (id mod M)·48271 mod M,
    * M = 2³¹−1. The same decorrelation job xxhash64 does for the #75
    * default (a uniform draw without randomness, so seeds don't all
    * come from one crawl slice), but one line of integer arithmetic
    * any SQL dialect evaluates identically — which is what lets the
    * k-means oracle re-derive the seed set. Overflow-free for every
    * long id ((2³¹)·48271 < 2⁴⁷); ids congruent mod M fall back to
    * the (spread, id) tiebreak the draw already carries.
    */
  private[graft] def minstdSpread(id: Column): Column =
    pmod(pmod(id, lit(2147483647L)) * lit(48271L), lit(2147483647L))
  private val minstdSpreadSql =
    // pmod-wrapped (review r15): DuckDB % keeps the dividend's sign,
    // so a negative vec_id would reorder the seed draw vs Spark's pmod
    "((((vec_id % 2147483647) + 2147483647) % 2147483647) * 48271) % 2147483647"

  /** The usable-vector predicate every embedding gate shares (review
    * r15) — Spark twin of the oracles' `len = Dim AND no-null AND
    * isfinite(fold) AND fold > 0`, as the single-pass codegen'd
    * [[graft.functions.UsableVec]] expression (the HOF `exists` +
    * fold formulation evaluated interpreted per element and taxed the
    * brute ANN scans). The no-null check is explicit inside the
    * expression: a fold reads a NULL slot as 0.0, so a null-element
    * vector can carry a finite positive self-dot.
    */
  private def usableVec(v: Column): Column =
    call_function("usable_vec", v, lit(Dim))

  /** Usable AND dimension-complete embeddings — exactly the oracle's
    * `e` CTE: length = [[Dim]], no NULL element, positive finite
    * norm. [[emb]] plus the self-cosine dirty rule plus the length
    * check (a short-but-clean vector has a defined self-cosine yet no
    * defined cosine against anything full-width).
    */
  private def embUsable(spark: SparkSession, dir: String): DataFrame =
    emb(spark, dir).where(usableVec(col("v")))

  /** The spherical k-means fit as unrolled MATERIALIZED CTE stages —
    * shared by the #103 and #187 oracles. Emits CTEs: `e` (usable
    * dimension-complete vectors), `c0` (MINSTD-spread seed centroids),
    * per round i: `a_i` (argmax-cosine assignment, ties → lowest
    * cent_id — the max_by struct order), `m_i` (per-(cell, pos)
    * decimal(8,6) fixed-point unit-direction sums, mean as one
    * integer-exact double division), `c_i` (new centroids, empty
    * cells carry the previous one), and `afin` (final assignment
    * against `c_iters`). Every cosine is the #30 ascending left fold,
    * bit-identical to the codegen'd [[CosineSimilarity]].
    */
  private def kmeansFitCtesSql(k: Int, iters: Int): String = {
    def fold(a: String, b: String) =
      s"list_reduce(list_prepend(0.0, list_transform(range(1, ${Dim + 1}), i -> $a[i] * $b[i])), (acc, x) -> acc + x)"
    def cos(a: String, b: String) =
      s"${fold(a, b)} / (sqrt(${fold(a, a)}) * sqrt(${fold(b, b)}))"
    def assignCte(name: String, cents: String) =
      s"""$name AS MATERIALIZED (
         |  SELECT vec_id, v, cell, nrm FROM (
         |    SELECT vec_id, v, cell, nrm,
         |      row_number() OVER (PARTITION BY vec_id
         |        ORDER BY ccos DESC, cell) AS rk
         |    FROM (
         |      SELECT e.vec_id, e.v, c.cent_id AS cell,
         |        sqrt(${fold("e.v", "e.v")}) AS nrm,
         |        ${cos("c.cv", "e.v")} AS ccos
         |      FROM e CROSS JOIN $cents c)
         |    WHERE ccos IS NOT NULL) WHERE rk = 1)""".stripMargin
    val rounds = (1 to iters).map { i =>
      s"""${assignCte(s"a$i", s"c${i - 1}")},
         |m$i AS MATERIALIZED (
         |  SELECT cell, p.pos AS pos,
         |    CAST(CAST(sum(CAST(a.v[p.pos + 1] / a.nrm AS DECIMAL(8,6))) * 1000000 AS BIGINT) AS DOUBLE)
         |      / (count(*) * 1000000) AS m
         |  FROM a$i a CROSS JOIN (SELECT CAST(r.range AS INT) AS pos FROM range(0, $Dim) r) p
         |  GROUP BY cell, p.pos),
         |mc$i AS MATERIALIZED (
         |  SELECT cell, list(m ORDER BY pos) AS cv FROM m$i GROUP BY cell),
         |c$i AS MATERIALIZED (
         |  SELECT p.cent_id, coalesce(n.cv, p.cv) AS cv
         |  FROM c${i - 1} p LEFT JOIN mc$i n ON n.cell = p.cent_id)""".stripMargin
    }.mkString(",\n")
    s"""e AS MATERIALIZED (
       |  SELECT vec_id,
       |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
       |  FROM embeddings
       |  WHERE len(embedding) = $Dim
       |    AND NOT EXISTS (SELECT 1 FROM unnest(embedding) AS t(x) WHERE x IS NULL)
       |    AND isfinite(${fold("v", "v")}) AND ${fold("v", "v")} > 0),
       |c0 AS MATERIALIZED (
       |  SELECT CAST(row_number() OVER (ORDER BY $minstdSpreadSql, vec_id) - 1 AS BIGINT) AS cent_id,
       |    v AS cv
       |  FROM e QUALIFY row_number() OVER (ORDER BY $minstdSpreadSql, vec_id) <= $k),
       |$rounds,
       |${assignCte("afin", s"c$iters")}""".stripMargin
  }

  /** #187 — `q_kmeans_cells`: the FITTED-centroid IVF gate (VERDICT
    * r14 item 1) — one row per (centroid, dimension) with the fitted
    * component and the centroid's final cell population:
    * `(cent_id, pos, comp, n_vecs)`. This pins the #75 fit ITSELF —
    * seeds, every Lloyd round's fixed-point means, the final
    * broadcast-argmax assignment — not just a readout over it, the
    * way #171/#172 pin the BPE fit. Same (k, iters) as #103, so one
    * green gate certifies the exact fit #103's drop-list builds on.
    *
    * Scale: the Spark side is [[graft.api.Graft.kmeansCentroids]] +
    * [[graft.api.Graft.ivfIndex]] verbatim — per round one broadcast
    * assignment pass and a (cell, dim)-keyed partial-agg exchange;
    * output is k×dim rows regardless of corpus size.
    */
  def qKmeansCells(spark: SparkSession, dir: String): DataFrame = {
    val e = embUsable(spark, dir)
    val cents = graft.api.Graft.kmeansCentroids(e, "vec_id", "v",
      SemClusters, SemIters, minstdSpread)
    val idx = graft.api.Graft.ivfIndex(e, "vec_id", "v",
      cents, "cent_id", "cv")
    val counts = idx.groupBy("cell").agg(count(lit(1)).as("n_vecs"))
    cents.select(col("cent_id"),
        posexplode(col("cv")).as(Seq("pos", "comp")))
      .join(counts.withColumnRenamed("cell", "cent_id"), Seq("cent_id"), "left")
      .select(col("cent_id"), col("pos"), col("comp"),
        coalesce(col("n_vecs"), lit(0L)).as("n_vecs"))
      .orderBy("cent_id", "pos")
  }

  val qKmeansCellsSql: String =
    s"""WITH ${kmeansFitCtesSql(SemClusters, SemIters)},
       |pop AS (
       |  SELECT cell, CAST(count(*) AS BIGINT) AS n_vecs
       |  FROM afin GROUP BY cell)
       |SELECT c.cent_id, p.pos, c.cv[p.pos + 1] AS comp,
       |  coalesce(n.n_vecs, 0) AS n_vecs
       |FROM c$SemIters c
       |CROSS JOIN (SELECT CAST(r.range AS INT) AS pos FROM range(0, $Dim) r) p
       |LEFT JOIN pop n ON n.cell = c.cent_id
       |ORDER BY c.cent_id, p.pos""".stripMargin

  /** #103's oracle — the shared fit CTEs, then the within-cell ≥τ
    * pair set and the smaller-id-keeper drop aggregate.
    */
  val qDedupSemanticSql: String = {
    def fold(a: String, b: String) =
      s"list_reduce(list_prepend(0.0, list_transform(range(1, ${Dim + 1}), i -> $a[i] * $b[i])), (acc, x) -> acc + x)"
    def cos(a: String, b: String) =
      s"${fold(a, b)} / (sqrt(${fold(a, a)}) * sqrt(${fold(b, b)}))"
    s"""WITH ${kmeansFitCtesSql(SemClusters, SemIters)},
       |pairs AS (
       |  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, b.cell AS cell,
       |    ${cos("a.v", "b.v")} AS cos
       |  FROM afin a JOIN afin b ON a.cell = b.cell AND a.vec_id < b.vec_id
       |  WHERE cos >= $CosineTau)
       |SELECT vec_b AS vec_id, cell, CAST(count(*) AS BIGINT) AS dup_of_ct,
       |  max(cos) AS max_cos
       |FROM pairs GROUP BY vec_b, cell ORDER BY vec_id""".stripMargin
  }

  /** #31's oracle — the full deterministic IVF pipeline in SQL:
    * the √n centroid rule from count(*), argmax-cosine cell
    * assignment (ties → lowest cent_id, the max_by struct order),
    * top-`nprobe` probe cells per query, and the per-query rank over
    * probed cells only — every cosine from the #30 ascending left
    * folds, every stage over the same usable-vector filter as the
    * Spark side.
    */
  val qAnnIvfSql: String = {
    def fold(a: String, b: String) =
      s"list_reduce(list_prepend(0.0, list_transform(range(1, ${Dim + 1}), i -> $a[i] * $b[i])), (acc, x) -> acc + x)"
    def cos(a: String, b: String) =
      s"${fold(a, b)} / (sqrt(${fold(a, a)}) * sqrt(${fold(b, b)}))"
    s"""WITH e AS (
       |  SELECT vec_id,
       |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
       |  FROM embeddings
       |  WHERE len(embedding) = $Dim
       |    AND NOT EXISTS (SELECT 1 FROM unnest(embedding) AS t(x) WHERE x IS NULL)
       |    AND isfinite(${fold("v", "v")}) AND ${fold("v", "v")} > 0),
       |m AS (
       |  SELECT greatest(50, CAST(n // CAST(ceil(sqrt(n)) AS BIGINT) AS BIGINT)) AS md
       |  FROM (SELECT CAST(count(*) AS BIGINT) AS n FROM embeddings)),
       |cents AS (
       |  SELECT vec_id AS cent_id, v AS cv FROM e, m
       |  WHERE ((vec_id % md) + md) % md = 0),
       |assigned AS (
       |  SELECT vec_id, v, cell FROM (
       |    SELECT e.vec_id, e.v, c.cent_id AS cell,
       |      row_number() OVER (PARTITION BY e.vec_id
       |        ORDER BY ${cos("c.cv", "e.v")} DESC, c.cent_id) AS ar
       |    FROM e CROSS JOIN cents c) WHERE ar = 1),
       |q AS (SELECT vec_id AS q_id, v AS qv FROM e WHERE vec_id < $NQueries),
       |exact AS (
       |  SELECT q_id, vec_id FROM (
       |    SELECT q_id, vec_id,
       |      row_number() OVER (PARTITION BY q_id
       |        ORDER BY ${cos("qv", "v")} DESC, vec_id) AS rank
       |    FROM q JOIN e ON vec_id <> q_id)
       |  WHERE rank <= $TopK),
       |probes AS (
       |  SELECT q_id, qv, cell FROM (
       |    SELECT q.q_id, q.qv, c.cent_id AS cell,
       |      row_number() OVER (PARTITION BY q.q_id
       |        ORDER BY ${cos("c.cv", "q.qv")} DESC, c.cent_id) AS crank
       |    FROM q CROSS JOIN cents c) WHERE crank <= 2),
       |ranked AS (
       |  SELECT q_id, vec_id, cos,
       |    row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, vec_id) AS rank
       |  FROM (
       |    SELECT p.q_id, a.vec_id, ${cos("p.qv", "a.v")} AS cos
       |    FROM probes p JOIN assigned a USING (cell)
       |    WHERE a.vec_id <> p.q_id))
       |SELECT q_id, rank, vec_id, cos FROM ranked
       |WHERE rank <= $TopK ORDER BY q_id, rank""".stripMargin
  }

  /** #170 — `q_ann_recall`: recall@k of the IVF index (#31, nprobe=2)
    * against the exact brute-force baseline (#30), as a GATED query —
    * the ANN quality dial next to the #164 balance dial (an index can
    * be perfectly balanced and still recall nothing; a deployment
    * reads BOTH before trusting served neighbors). Per query: `hits`
    * = how many of the exact top-k the IVF probe returned, `expected`
    * = the exact top-k size, `recall` = hits/expected; plus ONE total
    * row (`q_id = -1`, real ids are non-negative) aggregating the
    * integer counts — so the mean recall is a single integer/integer
    * division, bit-identical across engines (the #148 ratio rule).
    * Previously this lived only as an AnnSpec assertion (VERDICT r13
    * item 5); the gate makes it a driver-visible number.
    *
    * Scale: the two composed branches are the #30/#31 shapes
    * unchanged (broadcast query side, linear corpus scans, no
    * corpus shuffle); the recall join is TopK×NQueries rows. At
    * 100 TB you run this on a SAMPLE of queries — the probe-set
    * size is the dial, never the corpus.
    */
  def qAnnRecall(spark: SparkSession, dir: String): DataFrame = {
    val exact = qAnnCosineTopk(spark, dir).select(col("q_id"), col("vec_id"))
    val approx = annIvfWithProbes(spark, dir, nprobe = 2)
      .select(col("q_id"), col("vec_id"), lit(1L).as("hit"))
    val perQ = exact.join(broadcast(approx), Seq("q_id", "vec_id"), "left")
      .groupBy("q_id")
      .agg(count(lit(1)).as("expected"),
        coalesce(sum("hit"), lit(0L)).as("hits"))
    def recallOf(d: DataFrame) = d.withColumn("recall",
      when(col("expected") === 0, lit(null).cast("double"))
        .otherwise(col("hits").cast("double") / col("expected")))
      .select("q_id", "hits", "expected", "recall")
    val total = perQ.agg(
      coalesce(sum("hits"), lit(0L)).as("hits"),
      coalesce(sum("expected"), lit(0L)).as("expected"))
      .select(lit(-1L).as("q_id"), col("hits"), col("expected"))
    recallOf(perQ).unionByName(recallOf(total)).orderBy("q_id")
  }

  /** SQL twin of #170 — the #30 and #31 CTE chains verbatim (each
    * branch mirrors ITS OWN gate's vector filter: the exact baseline
    * ranks the raw store, the IVF branch the usable slice — exactly
    * what the composed Spark queries do), then the integer recall
    * join + total row. */
  val qAnnRecallSql: String = {
    def fold(a: String, b: String) =
      s"list_reduce(list_prepend(0.0, list_transform(range(1, ${Dim + 1}), i -> $a[i] * $b[i])), (acc, x) -> acc + x)"
    def cos(a: String, b: String) =
      s"${fold(a, b)} / (sqrt(${fold(a, a)}) * sqrt(${fold(b, b)}))"
    s"""WITH eraw AS (
       |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
       |  FROM embeddings),
       |e AS (
       |  SELECT vec_id, v FROM eraw
       |  WHERE len(v) = $Dim
       |    AND NOT EXISTS (SELECT 1 FROM unnest(v) AS t(x) WHERE x IS NULL)
       |    AND isfinite(${fold("v", "v")}) AND ${fold("v", "v")} > 0),
       |m AS (
       |  SELECT greatest(50, CAST(n // CAST(ceil(sqrt(n)) AS BIGINT) AS BIGINT)) AS md
       |  FROM (SELECT CAST(count(*) AS BIGINT) AS n FROM embeddings)),
       |cents AS (
       |  SELECT vec_id AS cent_id, v AS cv FROM e, m
       |  WHERE ((vec_id % md) + md) % md = 0),
       |assigned AS (
       |  SELECT vec_id, v, cell FROM (
       |    SELECT e.vec_id, e.v, c.cent_id AS cell,
       |      row_number() OVER (PARTITION BY e.vec_id
       |        ORDER BY ${cos("c.cv", "e.v")} DESC, c.cent_id) AS ar
       |    FROM e CROSS JOIN cents c) WHERE ar = 1),
       |q AS (SELECT vec_id AS q_id, v AS qv FROM e WHERE vec_id < $NQueries),
       |exact AS (
       |  SELECT q_id, vec_id FROM (
       |    SELECT q_id, vec_id,
       |      row_number() OVER (PARTITION BY q_id
       |        ORDER BY ${cos("qv", "v")} DESC, vec_id) AS rank
       |    FROM q JOIN e ON vec_id <> q_id)
       |  WHERE rank <= $TopK),
       |probes AS (
       |  SELECT q_id, qv, cell FROM (
       |    SELECT q.q_id, q.qv, c.cent_id AS cell,
       |      row_number() OVER (PARTITION BY q.q_id
       |        ORDER BY ${cos("c.cv", "q.qv")} DESC, c.cent_id) AS crank
       |    FROM q CROSS JOIN cents c) WHERE crank <= 2),
       |approx AS (
       |  SELECT q_id, vec_id FROM (
       |    SELECT p.q_id, a.vec_id,
       |      row_number() OVER (PARTITION BY p.q_id
       |        ORDER BY ${cos("p.qv", "a.v")} DESC, a.vec_id) AS rank
       |    FROM probes p JOIN assigned a USING (cell)
       |    WHERE a.vec_id <> p.q_id)
       |  WHERE rank <= $TopK),
       |perq AS (
       |  SELECT x.q_id,
       |    CAST(coalesce(sum(CASE WHEN a.vec_id IS NOT NULL THEN 1 ELSE 0 END), 0) AS BIGINT) AS hits,
       |    CAST(count(*) AS BIGINT) AS expected
       |  FROM exact x LEFT JOIN approx a USING (q_id, vec_id)
       |  GROUP BY 1)
       |SELECT q_id, hits, expected,
       |  CAST(hits AS DOUBLE) / nullif(expected, 0) AS recall
       |FROM perq
       |UNION ALL
       |SELECT CAST(-1 AS BIGINT) AS q_id,
       |  CAST(coalesce(sum(hits), 0) AS BIGINT) AS hits,
       |  CAST(coalesce(sum(expected), 0) AS BIGINT) AS expected,
       |  CAST(coalesce(sum(hits), 0) AS DOUBLE) / nullif(sum(expected), 0) AS recall
       |FROM perq
       |ORDER BY q_id""".stripMargin
  }

  /** Probe-sample rate dial for #161: purity is estimated on the
    * deterministic hash sample `vec_id % mod == 0` — the standard
    * sampled-probe estimator, and the knob that keeps the exact-KNN
    * cost at n²/mod instead of n². The SQL twin embeds the same
    * literal.
    */
  private val PurityProbeMod = 10L

  private val PurityK = 5

  /** #161 — `q_knn_label_purity`: embedding-space LABEL CONSISTENCY —
    * for a deterministic sample of probe vectors, the fraction of
    * their k=5 exact nearest neighbors (cosine, self excluded)
    * sharing the probe's label, aggregated per label. This is the
    * standard label-noise / embedding-quality diagnostic a curation
    * run reads before trusting a labeled embedding set (low purity
    * for one label = mislabeled cluster or an encoder that cannot
    * separate it), and the first consumer of the embeddings table's
    * `label` column.
    *
    * Plan shape: the probe sample (1/10 of vectors) broadcasts into a
    * LINEAR corpus scan — the #30 exact-baseline shape with a bounded
    * probe side; the corpus side never shuffles before the per-probe
    * rank. Vectors enter only if USABLE (dim 64, no null elements,
    * positive norm — the validateEmbeddings convention, stated
    * identically in the oracle), so dirty corpora cannot poison the
    * ranking in either engine. Purity = integer match counts with ONE
    * final division — bit-identical doubles. At 100 TB: lower the
    * sample dial, or feed the probes through the #73 IVF index
    * (cell-local KNN) and accept recall-bounded purity — the same
    * exact/approx pairing as #30/#31.
    */
  def qKnnLabelPurity(spark: SparkSession, dir: String): DataFrame = {
    CosineSimilarity.register(spark)
    graft.functions.UsableVec.register(spark)
    val e = Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("label"),
        col("embedding").cast("array<double>").as("v"))
      .where(usableVec(col("v")))
    val q = e.where(col("vec_id") % PurityProbeMod === 0)
      .select(col("vec_id").as("q_id"), col("label").as("q_label"),
        col("v").as("qv"))
    val w = Window.partitionBy("q_id").orderBy(col("cos").desc, col("vec_id"))
    val neighbors = e.crossJoin(broadcast(q))
      .where(col("vec_id") =!= col("q_id"))
      .withColumn("cos", cosine(col("qv"), col("v")))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= PurityK)
    neighbors.groupBy(col("q_label").as("label"))
      .agg(
        countDistinct(col("q_id")).as("n_probes"),
        count(lit(1)).as("n_neighbors"),
        sum(when(col("label") === col("q_label"), 1L).otherwise(0L))
          .as("knn_matches"))
      .select(col("label"), col("n_probes"), col("n_neighbors"),
        col("knn_matches"),
        (col("knn_matches").cast("double") / col("n_neighbors"))
          .as("purity"))
      .orderBy("label")
  }

  /** #161 oracle — same usable-vector filter, probe sample, ranking,
    * and integer-sums-then-one-division tail; cosine from the #30
    * ascending left folds.
    */
  val qKnnLabelPuritySql: String = {
    def fold(terms: String) =
      s"list_reduce(list_prepend(0.0, list_transform(range(1, ${Dim + 1}), i -> $terms)), (acc, x) -> acc + x)"
    s"""WITH e AS (
       |  SELECT vec_id, label,
       |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
       |  FROM embeddings
       |  WHERE len(embedding) = $Dim
       |    AND NOT EXISTS (SELECT 1 FROM unnest(embedding) AS t(x) WHERE x IS NULL)
       |    AND isfinite(${fold("v[i] * v[i]")}) AND ${fold("v[i] * v[i]")} > 0),
       |q AS (
       |  SELECT vec_id AS q_id, label AS q_label, v AS qv FROM e
       |  WHERE ((vec_id % $PurityProbeMod) + $PurityProbeMod) % $PurityProbeMod = 0),
       |scored AS (
       |  SELECT q_id, q_label, e.vec_id, e.label,
       |    ${fold("qv[i] * v[i]")}
       |     / (sqrt(${fold("qv[i] * qv[i]")}) * sqrt(${fold("v[i] * v[i]")})) AS cos
       |  FROM q JOIN e ON e.vec_id <> q_id),
       |ranked AS (
       |  SELECT q_id, q_label, label,
       |    row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, vec_id) AS rank
       |  FROM scored)
       |SELECT q_label AS label,
       |  CAST(COUNT(DISTINCT q_id) AS BIGINT) AS n_probes,
       |  CAST(COUNT(*) AS BIGINT) AS n_neighbors,
       |  CAST(SUM(CASE WHEN label = q_label THEN 1 ELSE 0 END) AS BIGINT) AS knn_matches,
       |  CAST(SUM(CASE WHEN label = q_label THEN 1 ELSE 0 END) AS DOUBLE)
       |    / COUNT(*) AS purity
       |FROM ranked WHERE rank <= $PurityK
       |GROUP BY q_label ORDER BY label""".stripMargin
  }

  // --------------------------------------------------------------------
  // Product quantization (#177/#178): the memory-bounded ANN serving
  // path. A vector is split into PqM subvectors; each subvector is
  // replaced by the id of its nearest codeword (argmin L2), so the
  // stored index is PqM small ints per vector instead of Dim doubles —
  // the 100 TB compression story (Jégou/Douze/Schmid, TPAMI 2011).
  // Queries stay full-precision and score against the RECONSTRUCTED
  // corpus (asymmetric distance computation). As with #31, the GATE
  // flavor uses the deterministic seed rule (ids ≡ 0 mod ~n/√n) as the
  // per-subspace codebook so the DuckDB oracle re-derives the whole
  // index from scratch; the k-means-fitted serving flavor lives in
  // [[graft.api.Graft.pqCodebooks]]/pqEncode/pqQuery.
  // --------------------------------------------------------------------

  /** Subspace count: 64 dims → 8 subvectors of 8. The code id per
    * subspace fits a byte at k ≤ 256, so the encoded corpus is
    * ~PqM bytes/vector — 64× smaller than the double store it ranks
    * for, which is what lets an ANN tier hold the WHOLE index in
    * memory at corpus sizes where the raw vectors cannot even fit on
    * one machine's disk.
    */
  private[graft] val PqM = 8
  private[graft] val PqSubDim = Dim / PqM

  /** The gate PQ index: usable vectors (the #31 filter), the #31 seed
    * rule as the per-subspace codebook, argmin squared-L2 assignment
    * per subspace (tie → lowest seed id). Since ‖sub‖² is constant
    * across codes, the argmin key is ‖cw‖² − 2·(sub·cw) — two
    * codegen'd dot folds, stated identically in the oracle. Returns
    * `(vec_id, v, recon, codes)` where `recon` is the concatenated
    * chosen codewords (the decoded quantization) and `codes` the PqM
    * code ids. One broadcast cross join + one per-vector argmin
    * aggregate; like [[ivfGateAssigned]] the groupBy(vec_id)
    * exchanges the corpus rows once (unique keys — the gate-replay
    * shape mirroring the oracle CTEs); the SERVING encode
    * ([[graft.api.Graft.pqEncode]]) is the production path.
    */
  private def pqGateEncoded(spark: SparkSession, dir: String): DataFrame = {
    val (e, cents, _) = ivfGateAssigned(spark, dir)
    val picks = (0 until PqM).map { s =>
      val sub = slice(col("v"), s * PqSubDim + 1, PqSubDim)
      val cw = slice(col("cv"), s * PqSubDim + 1, PqSubDim)
      val key = call_function("dot_product", cw, cw) -
        lit(2.0) * call_function("dot_product", sub, cw)
      min_by(struct(col("cent_id").as("code"), cw.as("cw")),
        struct(key.as("k"), col("cent_id").as("t"))).as(s"p$s")
    }
    e.crossJoin(broadcast(cents))
      .groupBy("vec_id")
      .agg(first(col("v")).as("v"), picks: _*)
      .select(col("vec_id"), col("v"),
        concat((0 until PqM).map(s => col(s"p$s").getField("cw")): _*).as("recon"),
        array((0 until PqM).map(s => col(s"p$s").getField("code")): _*).as("codes"))
  }

  /** #177 — `q_ann_pq`: PQ-compressed top-k ANN. Queries (full
    * precision, the #30 query set) rank the corpus by the asymmetric
    * inner product q·recon(v) — one codegen'd 64-wide fold per
    * (query, vector), broadcast query side, per-query window top-k.
    * rank ties break by vec_id; `adc` is a single fixed-order fold so
    * it hashes bit-identically cross-engine.
    *
    * Scale: scoring reads the ENCODED corpus (PqM codes/vector +
    * a broadcast codebook), never the raw vectors — linear scan like
    * #30 but over a 64×-smaller operand; compose with the #31 cell
    * routing for sublinear probes (the serving path's ivf+pq).
    */
  def qAnnPq(spark: SparkSession, dir: String): DataFrame = {
    // the query side deliberately re-derives from the USABLE frame,
    // not from pqGateEncoded's output: the vec_id < 10 predicate
    // pushes down to the parquet scan (row-group pruned, ~free at any
    // corpus size), whereas hanging the query set off the encoded
    // subtree would plan the whole broadcast-encode aggregate TWICE
    val (e, _, _) = ivfGateAssigned(spark, dir)
    val q = e.where(col("vec_id") < NQueries)
      .select(col("vec_id").as("q_id"), col("v").as("qv"))
    val w = Window.partitionBy("q_id").orderBy(col("adc").desc, col("vec_id"))
    pqGateEncoded(spark, dir)
      .crossJoin(broadcast(q))
      .where(col("vec_id") =!= col("q_id"))
      .withColumn("adc", call_function("dot_product", col("qv"), col("recon")))
      .withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= TopK)
      .select("q_id", "rank", "vec_id", "adc")
      .orderBy("q_id", "rank")
  }

  /** Shared oracle text: the usable frame, seed codebook, and the
    * per-(vector, subspace) argmin-L2 pick — the PQ twin of the #31
    * CTE stack. fold8 is the ascending 8-wide dot fold matching the
    * codegen'd dot_product bit-for-bit.
    */
  private def pqPickedCteSql: String = {
    def fold8(a: String, b: String) =
      s"list_reduce(list_prepend(0.0, list_transform(range(1, ${PqSubDim + 1}), i -> $a[i] * $b[i])), (acc, x) -> acc + x)"
    def fold64(a: String, b: String) =
      s"list_reduce(list_prepend(0.0, list_transform(range(1, ${Dim + 1}), i -> $a[i] * $b[i])), (acc, x) -> acc + x)"
    s"""e AS MATERIALIZED (
       |  SELECT vec_id,
       |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
       |  FROM embeddings
       |  WHERE len(embedding) = $Dim
       |    AND NOT EXISTS (SELECT 1 FROM unnest(embedding) AS t(x) WHERE x IS NULL)
       |    AND isfinite(${fold64("v", "v")}) AND ${fold64("v", "v")} > 0),
       |m AS (
       |  SELECT greatest(50, CAST(n // CAST(ceil(sqrt(n)) AS BIGINT) AS BIGINT)) AS md
       |  FROM (SELECT CAST(count(*) AS BIGINT) AS n FROM embeddings)),
       |cents AS MATERIALIZED (
       |  SELECT vec_id AS cent_id, v AS cv FROM e, m
       |  WHERE ((vec_id % md) + md) % md = 0),
       |grid AS (
       |  SELECT e.vec_id, c.cent_id, ss.s AS sub_s,
       |    e.v[ss.s * $PqSubDim + 1 : ss.s * $PqSubDim + $PqSubDim] AS sv,
       |    c.cv[ss.s * $PqSubDim + 1 : ss.s * $PqSubDim + $PqSubDim] AS cw
       |  FROM e CROSS JOIN cents c
       |  CROSS JOIN (SELECT unnest(range(0, $PqM)) AS s) ss),
       |picked AS MATERIALIZED (
       |  SELECT vec_id, sub_s, cent_id AS code, cw FROM (
       |    SELECT vec_id, sub_s, cent_id, cw,
       |      row_number() OVER (PARTITION BY vec_id, sub_s
       |        ORDER BY ${fold8("cw", "cw")} - 2 * ${fold8("sv", "cw")}, cent_id) AS pr
       |    FROM grid) WHERE pr = 1)""".stripMargin
  }

  val qAnnPqSql: String = {
    def fold64(a: String, b: String) =
      s"list_reduce(list_prepend(0.0, list_transform(range(1, ${Dim + 1}), i -> $a[i] * $b[i])), (acc, x) -> acc + x)"
    s"""WITH $pqPickedCteSql,
       |recon AS (
       |  SELECT vec_id, flatten(list(cw ORDER BY sub_s)) AS rv
       |  FROM picked GROUP BY vec_id),
       |q AS (SELECT vec_id AS q_id, v AS qv FROM e WHERE vec_id < $NQueries),
       |ranked AS (
       |  SELECT q_id, vec_id, adc,
       |    row_number() OVER (PARTITION BY q_id ORDER BY adc DESC, vec_id) AS rank
       |  FROM (
       |    SELECT q.q_id, r.vec_id, ${fold64("q.qv", "r.rv")} AS adc
       |    FROM q JOIN recon r ON r.vec_id <> q.q_id))
       |SELECT q_id, CAST(rank AS BIGINT) AS rank, vec_id, adc FROM ranked
       |WHERE rank <= $TopK ORDER BY q_id, rank""".stripMargin
  }

  /** #200 — `q_ann_sq`: top-k serving under the SQ8 SCALAR quantizer
    * (QT_8bit-style; NOT bit-compatible with FAISS, whose Codec8bit
    * scales by 255 where this variant floors over 256 levels with a
    * clamp at 255) — per-dimension exact
    * min/max bounds, each element quantized to one of 256 levels
    * (`floor((v_d − lo_d)/span_d × 256)` clamped to [0, 255]), scored
    * by `q·v̂` against the mid-level reconstruction `v̂_d = lo_d +
    * (level + ½)·span_d/256`. Output `(q_id, rank, vec_id, score)`,
    * the #177 shape. The production twin is [[graft.api.Graft
    * .sqBounds]]/[[graft.api.Graft.sqEncode]]/[[graft.api.Graft
    * .sqQuery]] (codes stored as literal int8 — dim BYTES per vector).
    *
    * Why SQ is in the ladder between flat and PQ: at 64 dims it
    * spends 64 bytes/vector (vs m=8 PQ's 8) to keep PER-DIMENSION
    * resolution, so its recall sits near the flat scan's (PqSpec pins
    * SQ ≥ PQ on the gate corpus) while still cutting scan I/O 8×
    * against float64 — the right first stop when memory allows it,
    * before PQ + rerank. Unlike PQ there is NO trained codebook: the
    * bounds are exact order-free min/max, so the fit is bit-
    * deterministic under any partitioning with no seed rule.
    *
    * Scale: the bounds contraction is dim-bounded (map-side partial
    * min/max); encode/serve are one corpus pass each with the 1-row
    * bounds and the query set broadcast; compose with [[graft.api
    * .Graft.ivfIndex]] routing for sublinearity exactly like pqQuery.
    */
  def qAnnSq(spark: SparkSession, dir: String): DataFrame = {
    val (e, _, _) = ivfGateAssigned(spark, dir)
    val q = e.where(col("vec_id") < NQueries)
      .select(col("vec_id").as("q_id"), col("v").as("qv"))
    val bArr = e.select(posexplode(col("v")).as(Seq("d", "x")))
      .groupBy("d").agg(min("x").as("lo"), max("x").as("hi"))
      .agg(
        transform(array_sort(collect_list(struct(col("d"), col("lo")))),
          t => t.getField("lo")).as("lo"),
        transform(array_sort(collect_list(struct(col("d"),
            (col("hi") - col("lo")).as("sp")))),
          t => t.getField("sp")).as("span"))
    val w = Window.partitionBy("q_id").orderBy(col("score").desc, col("vec_id"))
    e.crossJoin(broadcast(bArr))
      .select(col("vec_id"),
        zip_with(col("v"),
          zip_with(col("lo"), col("span"),
            (l, s) => struct(l.as("lo"), s.as("sp"))),
          (x, b) => when(b.getField("sp") === 0d, b.getField("lo"))
            .otherwise(b.getField("lo") +
              (least(lit(255.0), greatest(lit(0.0),
                floor((x - b.getField("lo")) / b.getField("sp") *
                  lit(256.0)))) + lit(0.5)) *
                b.getField("sp") / lit(256.0))).as("recon"))
      .crossJoin(broadcast(q))
      .where(col("vec_id") =!= col("q_id"))
      .withColumn("score",
        call_function("dot_product", col("qv"), col("recon")))
      .withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= TopK)
      .select("q_id", "rank", "vec_id", "score")
      .orderBy("q_id", "rank")
  }

  /** #200's oracle: the shared usable frame, the per-dimension
    * min/max bounds, the clamped-floor level pick and mid-level
    * reconstruction stated in the same op order as the Spark plan,
    * one ascending dot fold.
    */
  val qAnnSqSql: String = {
    def fold64(a: String, b: String) =
      s"list_reduce(list_prepend(0.0, list_transform(range(1, ${Dim + 1}), i -> $a[i] * $b[i])), (acc, x) -> acc + x)"
    s"""WITH e AS MATERIALIZED (
       |  SELECT vec_id,
       |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
       |  FROM embeddings
       |  WHERE len(embedding) = $Dim
       |    AND NOT EXISTS (SELECT 1 FROM unnest(embedding) AS t(x) WHERE x IS NULL)
       |    AND isfinite(${fold64("v", "v")}) AND ${fold64("v", "v")} > 0),
       |bd AS (
       |  SELECT i, min(v[i]) AS lo, max(v[i]) AS hi
       |  FROM e CROSS JOIN (SELECT unnest(range(1, ${Dim + 1})) AS i)
       |  GROUP BY i),
       |b AS (
       |  SELECT list(lo ORDER BY i) AS lo,
       |    list(hi - lo ORDER BY i) AS span
       |  FROM bd),
       |recon AS MATERIALIZED (
       |  SELECT vec_id, list_transform(range(1, ${Dim + 1}), i ->
       |    CASE WHEN b.span[i] = 0 THEN b.lo[i]
       |         ELSE b.lo[i] +
       |           (least(255.0, greatest(0.0,
       |              floor((e.v[i] - b.lo[i]) / b.span[i] * 256.0))) + 0.5)
       |           * b.span[i] / 256.0 END) AS rv
       |  FROM e CROSS JOIN b),
       |q AS (SELECT vec_id AS q_id, v AS qv FROM e WHERE vec_id < $NQueries),
       |ranked AS (
       |  SELECT q_id, vec_id, score,
       |    row_number() OVER (PARTITION BY q_id ORDER BY score DESC, vec_id) AS rank
       |  FROM (
       |    SELECT q.q_id, r.vec_id, ${fold64("q.qv", "r.rv")} AS score
       |    FROM q JOIN recon r ON r.vec_id <> q.q_id))
       |SELECT q_id, CAST(rank AS BIGINT) AS rank, vec_id, score FROM ranked
       |WHERE rank <= $TopK ORDER BY q_id, rank""".stripMargin
  }

  /** #205 — `q_ann_ivf_sq`: the IVF × SQ8 composed rung — the
    * quantizer ladder's best-recall-per-byte SERVING point (probe 33
    * measured flat SQ8 at recall 1.000 and 7.54× compression; this
    * gate adds the IVF routing that makes the scan sublinear, the
    * composition the SQ docs promise and FAISS ships as
    * IndexIVFScalarQuantizer). Each usable vector's RESIDUAL against
    * its cell centroid (`r = v − c(cell)`; residual spans are far
    * tighter than raw, so the 256 levels quantize finer — the IVFADC
    * argument applied to SQ) is quantized by per-dimension exact
    * min/max bounds over ALL residuals; each query probes its top-2
    * centroid cells and ranks only those cells' vectors by ONE dot
    * fold `q·(c + recon(r))`. Output `(q_id, rank, vec_id, score)`,
    * the #200 shape. Production twin: [[graft.api.Graft.ivfSqBounds]]
    * / [[graft.api.Graft.ivfSqIndex]] / [[graft.api.Graft
    * .ivfSqQuery]] (codes stored as literal int8, cell-bucketed;
    * PqSpec pins gate ≡ API bit-equality and the flavor refusals).
    *
    * HASH-GATED: every stage is exact arithmetic — the deterministic
    * mod-rule centroids, the argmax assignment, the residual
    * subtraction, order-free min/max bounds, the clamped-floor level
    * pick, the mid-level reconstruction, one ascending dot fold — so
    * the DuckDB oracle replays the ENTIRE index build + serve
    * bit-for-bit (the #103 whole-pipeline-as-CTEs discipline).
    *
    * Scale: assignment is the shared broadcast argmax (no corpus
    * shuffle); the bounds fit is one dim-bounded contraction; serving
    * scans only probed cells with queries + bounds broadcast. At
    * 100 TB the same shape runs off a stored cell-bucketed
    * [[graft.api.Graft.ivfSqIndex]] table — scan I/O is dim BYTES per
    * vector (8× less than float64) on ~nprobe/cells of the corpus.
    */
  def qAnnIvfSq(spark: SparkSession, dir: String): DataFrame = {
    val (e, cents, assigned) = ivfGateAssigned(spark, dir)
    val withCv = assigned
      .join(broadcast(cents.select(col("cent_id").as("cell"), col("cv"))),
        "cell")
      .withColumn("r", zip_with(col("v"), col("cv"), (x, c) => x - c))
    val bArr = withCv.select(posexplode(col("r")).as(Seq("d", "x")))
      .groupBy("d").agg(min("x").as("lo"), max("x").as("hi"))
      .agg(
        transform(array_sort(collect_list(struct(col("d"), col("lo")))),
          t => t.getField("lo")).as("lo"),
        transform(array_sort(collect_list(struct(col("d"),
            (col("hi") - col("lo")).as("sp")))),
          t => t.getField("sp")).as("span"))
    // v̂ = c + recon(r), one array — so the score below is ONE
    // ascending fold over (c[i] + recon[i]), the oracle's op order
    val recon = withCv.crossJoin(broadcast(bArr))
      .select(col("vec_id"), col("cell"),
        zip_with(
          zip_with(col("r"),
            zip_with(col("lo"), col("span"),
              (l, s) => struct(l.as("lo"), s.as("sp"))),
            (x, b) => struct(x.as("x"), b.getField("lo").as("lo"),
              b.getField("sp").as("sp"))),
          col("cv"),
          (z, c) => c + (when(z.getField("sp") === 0d, z.getField("lo"))
            .otherwise(z.getField("lo") +
              (least(lit(255.0), greatest(lit(0.0),
                floor((z.getField("x") - z.getField("lo")) /
                  z.getField("sp") * lit(256.0)))) + lit(0.5)) *
                z.getField("sp") / lit(256.0)))).as("vhat"))
    val q = e.where(col("vec_id") < NQueries)
      .select(col("vec_id").as("q_id"), col("v").as("qv"))
    val wProbe = Window.partitionBy("q_id")
      .orderBy(col("ccos").desc, col("cent_id"))
    val probes = q.crossJoin(broadcast(cents))
      .withColumn("ccos", cosine(col("cv"), col("qv")))
      .withColumn("crank", row_number().over(wProbe))
      .where(col("crank") <= 2)
      .select(col("q_id"), col("qv"), col("cent_id").as("cell"))
    val wTop = Window.partitionBy("q_id").orderBy(col("score").desc, col("vec_id"))
    recon.join(broadcast(probes), "cell")
      .where(col("vec_id") =!= col("q_id"))
      .withColumn("score",
        call_function("dot_product", col("qv"), col("vhat")))
      .withColumn("rank", row_number().over(wTop).cast("long"))
      .where(col("rank") <= TopK)
      .select("q_id", "rank", "vec_id", "score")
      .orderBy("q_id", "rank")
  }

  /** #205's oracle: the shared usable/centroid/assignment CTEs (the
    * #31 stages), residuals, per-dimension min/max over residuals,
    * clamped-floor levels + mid-level reconstruction ADDED BACK onto
    * the centroid, top-2 probes, one ascending fold — every float op
    * in the same order as the Spark plan.
    */
  val qAnnIvfSqSql: String = {
    def fold(a: String, b: String) =
      s"list_reduce(list_prepend(0.0, list_transform(range(1, ${Dim + 1}), i -> $a[i] * $b[i])), (acc, x) -> acc + x)"
    def cos(a: String, b: String) =
      s"${fold(a, b)} / (sqrt(${fold(a, a)}) * sqrt(${fold(b, b)}))"
    s"""WITH e AS (
       |  SELECT vec_id,
       |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
       |  FROM embeddings
       |  WHERE len(embedding) = $Dim
       |    AND NOT EXISTS (SELECT 1 FROM unnest(embedding) AS t(x) WHERE x IS NULL)
       |    AND isfinite(${fold("v", "v")}) AND ${fold("v", "v")} > 0),
       |m AS (
       |  SELECT greatest(50, CAST(n // CAST(ceil(sqrt(n)) AS BIGINT) AS BIGINT)) AS md
       |  FROM (SELECT CAST(count(*) AS BIGINT) AS n FROM embeddings)),
       |cents AS (
       |  SELECT vec_id AS cent_id, v AS cv FROM e, m
       |  WHERE ((vec_id % md) + md) % md = 0),
       |assigned AS MATERIALIZED (
       |  SELECT vec_id, v, cell FROM (
       |    SELECT e.vec_id, e.v, c.cent_id AS cell,
       |      row_number() OVER (PARTITION BY e.vec_id
       |        ORDER BY ${cos("c.cv", "e.v")} DESC, c.cent_id) AS ar
       |    FROM e CROSS JOIN cents c) WHERE ar = 1),
       |resid AS MATERIALIZED (
       |  SELECT a.vec_id, a.cell, c.cv,
       |    list_transform(range(1, ${Dim + 1}), i -> a.v[i] - c.cv[i]) AS r
       |  FROM assigned a JOIN cents c ON c.cent_id = a.cell),
       |bd AS (
       |  SELECT i, min(r[i]) AS lo, max(r[i]) AS hi
       |  FROM resid CROSS JOIN (SELECT unnest(range(1, ${Dim + 1})) AS i)
       |  GROUP BY i),
       |b AS (
       |  SELECT list(lo ORDER BY i) AS lo,
       |    list(hi - lo ORDER BY i) AS span
       |  FROM bd),
       |recon AS MATERIALIZED (
       |  SELECT vec_id, cell, list_transform(range(1, ${Dim + 1}), i ->
       |    cv[i] + CASE WHEN b.span[i] = 0 THEN b.lo[i]
       |         ELSE b.lo[i] +
       |           (least(255.0, greatest(0.0,
       |              floor((resid.r[i] - b.lo[i]) / b.span[i] * 256.0))) + 0.5)
       |           * b.span[i] / 256.0 END) AS vhat
       |  FROM resid CROSS JOIN b),
       |q AS (SELECT vec_id AS q_id, v AS qv FROM e WHERE vec_id < $NQueries),
       |probes AS (
       |  SELECT q_id, qv, cell FROM (
       |    SELECT q.q_id, q.qv, c.cent_id AS cell,
       |      row_number() OVER (PARTITION BY q.q_id
       |        ORDER BY ${cos("c.cv", "q.qv")} DESC, c.cent_id) AS crank
       |    FROM q CROSS JOIN cents c) WHERE crank <= 2),
       |ranked AS (
       |  SELECT q_id, vec_id, score,
       |    row_number() OVER (PARTITION BY q_id ORDER BY score DESC, vec_id) AS rank
       |  FROM (
       |    SELECT p.q_id, r.vec_id, ${fold("p.qv", "r.vhat")} AS score
       |    FROM probes p JOIN recon r USING (cell)
       |    WHERE r.vec_id <> p.q_id))
       |SELECT q_id, CAST(rank AS BIGINT) AS rank, vec_id, score FROM ranked
       |WHERE rank <= $TopK ORDER BY q_id, rank""".stripMargin
  }

  /** #211 — `q_ann_ivf_sq_cell`: the IVF × SQ8 rung with PER-CELL
    * quantizer windows — #205 with the bounds fitted per cell
    * (`(cell, d) → min/max` over that cell's residuals) instead of
    * corpus-wide. Probe 37 is the justification: under any REAL
    * spherical fit the global residual window never contracts (the
    * unit-normalized centroid leaves a norm-dependent per-cell
    * offset in every residual — ×1.2 vs the planted fit's ×18, even
    * with perfect-coverage k-center seeding), while per-cell spans
    * sit uniformly at noise scale (p99 0.034 vs 0.83 global) — so
    * the per-cell window buys ×20-class finer quantizer steps from
    * the SAME byte budget. FAISS ships this layout as
    * IndexIVFScalarQuantizer's per-list trained quantizer.
    * Production twin: [[graft.api.Graft.ivfSqBoundsPerCell]] +
    * [[graft.api.Graft.ivfSqIndex]]/[[graft.api.Graft.ivfSqQuery]]
    * (which detect the `cell` column in the bounds frame; PqSpec
    * pins gate ≡ API bit-equality and the raw-flavor refusal).
    *
    * HASH-GATED like #205: exact arithmetic end-to-end, so the
    * oracle replays build + serve bit-for-bit with the bounds CTE at
    * (cell, dim) grain. Scale: identical to #205 — the only delta is
    * the bounds frame at k×dim rows (still a broadcast) joined by
    * cell instead of a 1-row cross join.
    */
  def qAnnIvfSqCell(spark: SparkSession, dir: String): DataFrame = {
    val (e, cents, assigned) = ivfGateAssigned(spark, dir)
    val withCv = assigned
      .join(broadcast(cents.select(col("cent_id").as("cell"), col("cv"))),
        "cell")
      .withColumn("r", zip_with(col("v"), col("cv"), (x, c) => x - c))
    val bArr = withCv.select(col("cell"), posexplode(col("r")).as(Seq("d", "x")))
      .groupBy("cell", "d").agg(min("x").as("lo"), max("x").as("hi"))
      .groupBy("cell").agg(
        transform(array_sort(collect_list(struct(col("d"), col("lo")))),
          t => t.getField("lo")).as("lo"),
        transform(array_sort(collect_list(struct(col("d"),
            (col("hi") - col("lo")).as("sp")))),
          t => t.getField("sp")).as("span"))
    val recon = withCv.join(broadcast(bArr), "cell")
      .select(col("vec_id"), col("cell"),
        zip_with(
          zip_with(col("r"),
            zip_with(col("lo"), col("span"),
              (l, s) => struct(l.as("lo"), s.as("sp"))),
            (x, b) => struct(x.as("x"), b.getField("lo").as("lo"),
              b.getField("sp").as("sp"))),
          col("cv"),
          (z, c) => c + (when(z.getField("sp") === 0d, z.getField("lo"))
            .otherwise(z.getField("lo") +
              (least(lit(255.0), greatest(lit(0.0),
                floor((z.getField("x") - z.getField("lo")) /
                  z.getField("sp") * lit(256.0)))) + lit(0.5)) *
                z.getField("sp") / lit(256.0)))).as("vhat"))
    val q = e.where(col("vec_id") < NQueries)
      .select(col("vec_id").as("q_id"), col("v").as("qv"))
    val wProbe = Window.partitionBy("q_id")
      .orderBy(col("ccos").desc, col("cent_id"))
    val probes = q.crossJoin(broadcast(cents))
      .withColumn("ccos", cosine(col("cv"), col("qv")))
      .withColumn("crank", row_number().over(wProbe))
      .where(col("crank") <= 2)
      .select(col("q_id"), col("qv"), col("cent_id").as("cell"))
    val wTop = Window.partitionBy("q_id").orderBy(col("score").desc, col("vec_id"))
    recon.join(broadcast(probes), "cell")
      .where(col("vec_id") =!= col("q_id"))
      .withColumn("score",
        call_function("dot_product", col("qv"), col("vhat")))
      .withColumn("rank", row_number().over(wTop).cast("long"))
      .where(col("rank") <= TopK)
      .select("q_id", "rank", "vec_id", "score")
      .orderBy("q_id", "rank")
  }

  /** #211's oracle: the #205 CTE chain with the bounds stage at
    * (cell, dim) grain and the reconstruction joining its row's cell
    * window — every float op in the same order as the Spark plan.
    */
  val qAnnIvfSqCellSql: String = {
    def fold(a: String, b: String) =
      s"list_reduce(list_prepend(0.0, list_transform(range(1, ${Dim + 1}), i -> $a[i] * $b[i])), (acc, x) -> acc + x)"
    def cos(a: String, b: String) =
      s"${fold(a, b)} / (sqrt(${fold(a, a)}) * sqrt(${fold(b, b)}))"
    s"""WITH e AS (
       |  SELECT vec_id,
       |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
       |  FROM embeddings
       |  WHERE len(embedding) = $Dim
       |    AND NOT EXISTS (SELECT 1 FROM unnest(embedding) AS t(x) WHERE x IS NULL)
       |    AND isfinite(${fold("v", "v")}) AND ${fold("v", "v")} > 0),
       |m AS (
       |  SELECT greatest(50, CAST(n // CAST(ceil(sqrt(n)) AS BIGINT) AS BIGINT)) AS md
       |  FROM (SELECT CAST(count(*) AS BIGINT) AS n FROM embeddings)),
       |cents AS (
       |  SELECT vec_id AS cent_id, v AS cv FROM e, m
       |  WHERE ((vec_id % md) + md) % md = 0),
       |assigned AS MATERIALIZED (
       |  SELECT vec_id, v, cell FROM (
       |    SELECT e.vec_id, e.v, c.cent_id AS cell,
       |      row_number() OVER (PARTITION BY e.vec_id
       |        ORDER BY ${cos("c.cv", "e.v")} DESC, c.cent_id) AS ar
       |    FROM e CROSS JOIN cents c) WHERE ar = 1),
       |resid AS MATERIALIZED (
       |  SELECT a.vec_id, a.cell, c.cv,
       |    list_transform(range(1, ${Dim + 1}), i -> a.v[i] - c.cv[i]) AS r
       |  FROM assigned a JOIN cents c ON c.cent_id = a.cell),
       |bd AS (
       |  SELECT cell, i, min(r[i]) AS lo, max(r[i]) AS hi
       |  FROM resid CROSS JOIN (SELECT unnest(range(1, ${Dim + 1})) AS i)
       |  GROUP BY cell, i),
       |b AS (
       |  SELECT cell, list(lo ORDER BY i) AS lo,
       |    list(hi - lo ORDER BY i) AS span
       |  FROM bd GROUP BY cell),
       |recon AS MATERIALIZED (
       |  SELECT vec_id, resid.cell, list_transform(range(1, ${Dim + 1}), i ->
       |    cv[i] + CASE WHEN b.span[i] = 0 THEN b.lo[i]
       |         ELSE b.lo[i] +
       |           (least(255.0, greatest(0.0,
       |              floor((resid.r[i] - b.lo[i]) / b.span[i] * 256.0))) + 0.5)
       |           * b.span[i] / 256.0 END) AS vhat
       |  FROM resid JOIN b ON b.cell = resid.cell),
       |q AS (SELECT vec_id AS q_id, v AS qv FROM e WHERE vec_id < $NQueries),
       |probes AS (
       |  SELECT q_id, qv, cell FROM (
       |    SELECT q.q_id, q.qv, c.cent_id AS cell,
       |      row_number() OVER (PARTITION BY q.q_id
       |        ORDER BY ${cos("c.cv", "q.qv")} DESC, c.cent_id) AS crank
       |    FROM q CROSS JOIN cents c) WHERE crank <= 2),
       |ranked AS (
       |  SELECT q_id, vec_id, score,
       |    row_number() OVER (PARTITION BY q_id ORDER BY score DESC, vec_id) AS rank
       |  FROM (
       |    SELECT p.q_id, r.vec_id, ${fold("p.qv", "r.vhat")} AS score
       |    FROM probes p JOIN recon r USING (cell)
       |    WHERE r.vec_id <> p.q_id))
       |SELECT q_id, CAST(rank AS BIGINT) AS rank, vec_id, score FROM ranked
       |WHERE rank <= $TopK ORDER BY q_id, rank""".stripMargin
  }

  /** #208 — `q_ann_ivf_sq_recall`: recall@k of the IVF × SQ8 rung
    * (#205) against the exact brute-force baseline (#30) — the
    * quality dial every other ladder rung carries (#170 IVF, #182 PQ,
    * #191 IVFPQ, #199 rerank), closing the symmetry. Per query
    * integer (hits, expected) + ONE total row (q_id = −1), recalls by
    * single integer division (the #148 ratio rule). On the gate
    * corpus the readout shows the rung's contract: SQ8's half-level
    * reconstruction noise costs no recall vs the raw-vector IVF scan
    * at the same routing (AnnSpec pins #208 total ≥ #170 total), so
    * the only recall loss is routing — exactly the probe-36 finding
    * at mass.
    *
    * Scale: the two branches are the #30/#205 shapes unchanged; the
    * recall join is TopK×NQueries rows. At 100 TB this runs on a
    * query SAMPLE — the probe-set size is the dial, never the corpus.
    */
  def qAnnIvfSqRecall(spark: SparkSession, dir: String): DataFrame = {
    val exact = qAnnCosineTopk(spark, dir).select(col("q_id"), col("vec_id"))
    val approx = qAnnIvfSq(spark, dir)
      .select(col("q_id"), col("vec_id"), lit(1L).as("hit"))
    val perQ = exact.join(broadcast(approx), Seq("q_id", "vec_id"), "left")
      .groupBy("q_id")
      .agg(count(lit(1)).as("expected"),
        coalesce(sum("hit"), lit(0L)).as("hits"))
    def recallOf(d: DataFrame) = d.withColumn("recall",
      when(col("expected") === 0, lit(null).cast("double"))
        .otherwise(col("hits").cast("double") / col("expected")))
      .select("q_id", "hits", "expected", "recall")
    val total = perQ.agg(
      coalesce(sum("hits"), lit(0L)).as("hits"),
      coalesce(sum("expected"), lit(0L)).as("expected"))
      .select(lit(-1L).as("q_id"), col("hits"), col("expected"))
    recallOf(perQ).unionByName(recallOf(total)).orderBy("q_id")
  }

  /** SQL twin of #208: the #205 chain verbatim (through `ranked`),
    * the #30 exact branch, then the integer recall join + total row
    * (the #170/#182 tail). */
  val qAnnIvfSqRecallSql: String = {
    def fold(a: String, b: String) =
      s"list_reduce(list_prepend(0.0, list_transform(range(1, ${Dim + 1}), i -> $a[i] * $b[i])), (acc, x) -> acc + x)"
    def cos(a: String, b: String) =
      s"${fold(a, b)} / (sqrt(${fold(a, a)}) * sqrt(${fold(b, b)}))"
    val ivfSqChain = qAnnIvfSqSql
      .stripPrefix("WITH ")
      .split("\\nSELECT q_id, CAST\\(rank AS BIGINT\\)")(0)
    s"""WITH $ivfSqChain,
       |approx AS (
       |  SELECT q_id, vec_id FROM ranked WHERE rank <= $TopK),
       |exact AS (
       |  SELECT q_id, vec_id FROM (
       |    SELECT q_id, vec_id,
       |      row_number() OVER (PARTITION BY q_id
       |        ORDER BY ${cos("qv", "v")} DESC, vec_id) AS rank
       |    FROM q JOIN e ON vec_id <> q_id)
       |  WHERE rank <= $TopK),
       |perq AS (
       |  SELECT x.q_id,
       |    CAST(coalesce(sum(CASE WHEN a.vec_id IS NOT NULL THEN 1 ELSE 0 END), 0) AS BIGINT) AS hits,
       |    CAST(count(*) AS BIGINT) AS expected
       |  FROM exact x LEFT JOIN approx a USING (q_id, vec_id)
       |  GROUP BY 1)
       |SELECT q_id, hits, expected,
       |  CAST(hits AS DOUBLE) / nullif(expected, 0) AS recall
       |FROM perq
       |UNION ALL
       |SELECT CAST(-1 AS BIGINT) AS q_id,
       |  CAST(coalesce(sum(hits), 0) AS BIGINT) AS hits,
       |  CAST(coalesce(sum(expected), 0) AS BIGINT) AS expected,
       |  CAST(coalesce(sum(hits), 0) AS DOUBLE) / nullif(sum(expected), 0) AS recall
       |FROM perq
       |ORDER BY q_id""".stripMargin
  }

  /** Coreset size for the k-center gate (#184). */
  private[graft] val CoresetK = 8

  /** #184 — `q_coreset_kcenter`: GREEDY K-CENTER coreset selection
    * (Gonzalez 1985, the 2-approximation for minimax facility
    * placement) — the diverse-subset primitive data-pruning pipelines
    * use to pick maximally-spread representatives (eval seeds,
    * prototype sets, the "keep the spread, drop the bulk" side of
    * SemDeDup #103). Deterministic: seed = lowest usable vec_id, then
    * k−1 rounds of "pick the vector FARTHEST (cosine distance
    * 1 − cos) from everything picked so far" (ties → lowest vec_id).
    * Output per center: `(round, center_id, n_assigned, radius)` —
    * `radius` is the distance at which the center was picked, i.e.
    * the COVERAGE RADIUS of the first `round` centers (the k-center
    * objective; non-increasing, spec-pinned), and `n_assigned` the
    * final nearest-center population (ties → earliest round).
    *
    * Scale: k broadcast-argmax corpus scans (each round broadcasts ≤k
    * centers and keeps a per-row running `least`), k single-row
    * collects — the kmeansCentroids convention; nothing corpus-sized
    * ever shuffles or collects. The DuckDB oracle re-derives the whole
    * greedy trajectory from scratch through k unrolled MATERIALIZED
    * CTE stages (the #171 BPE-fit discipline), so the gate pins the
    * full selection, not just its shape.
    */
  def qCoresetKcenter(spark: SparkSession, dir: String): DataFrame = {
    val (e0, _, _) = ivfGateAssigned(spark, dir)
    kcenterCore(e0.select("vec_id", "v"), CoresetK)
  }

  /** The greedy loop over an arbitrary usable `(vec_id, v)` frame —
    * the gate binds it to the embeddings table at k = [[CoresetK]];
    * [[graft.api.Graft.kcenterCoreset]] re-exports it. The caller owns
    * the usable filter (vectors must have a defined positive norm).
    */
  /** The greedy farthest-point pick loop shared by [[kcenterCore]]
    * and the [[graft.api.Graft.kmeansCentroids]] `seedMode = kcenter`
    * seeding (r18 verdict item 1): deterministic given the vec_id
    * tie-break — same input set → same picks under any partitioning.
    * `e` is `(vec_id, v)`, usable rows only; the CALLER persists it
    * (every round scans it). Returns (round, id, vector, radius).
    */
  private[graft] def kcenterPicks(e: DataFrame,
      k: Int): Vector[(Int, Long, Seq[Double], Option[Double])] = {
    val seedRows = e.orderBy("vec_id").limit(1).collect()
    if (seedRows.isEmpty) return Vector.empty
    val seedRow = seedRows(0)
    var picks = Vector[(Int, Long, Seq[Double], Option[Double])](
      (0, seedRow.getLong(0), seedRow.getSeq[Double](1), None))
    def vlit(v: Seq[Double]) = array(v.map(lit): _*)
    var p = e.where(col("vec_id") =!= picks.head._2)
      .withColumn("mind", lit(1.0) - cosine(col("v"), vlit(picks.head._3)))
    // a corpus smaller than k simply yields fewer centers (the
    // oracle's LIMIT-1 stages go empty the same way)
    var r = 1
    var exhausted = false
    while (r < k && !exhausted) {
      val rows = p.orderBy(col("mind").desc, col("vec_id")).limit(1).collect()
      if (rows.isEmpty) exhausted = true
      else {
        val top = rows(0)
        picks = picks :+ ((r, top.getLong(0), top.getSeq[Double](1),
          Some(top.getDouble(2))))
        p = p.where(col("vec_id") =!= top.getLong(0))
          .withColumn("mind",
            least(col("mind"), lit(1.0) - cosine(col("v"), vlit(top.getSeq[Double](1)))))
        // truncate the lineage every 32 rounds: each pick chains one
        // more filter + least() onto the plan, and past a few dozen
        // rounds analysis time (and eventually the plan-size limit)
        // dominates the actual scan — the facade's maxK admits k up
        // to 512 (r17 verdict hardening)
        if (r % 32 == 0) p = p.localCheckpoint(true)
        r += 1
      }
    }
    picks
  }

  private[graft] def kcenterCore(e0: DataFrame, k: Int): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val spark = e0.sparkSession
    CosineSimilarity.register(spark)
    val e = e0.persist()
    try {
      import spark.implicits._
      val picks = kcenterPicks(e, k)
      if (picks.isEmpty)
        return Seq.empty[(Int, Long, Long, Option[Double])]
          .toDF("round", "center_id", "n_assigned", "radius")
      val cents = picks.map { case (r, id, v, rad) => (r, id, v, rad) }
        .toDF("round", "center_id", "cv", "radius")
      val assigned = e.crossJoin(broadcast(cents.select("round", "cv")))
        .withColumn("d", lit(1.0) - cosine(col("cv"), col("v")))
        // a vector with no defined distance to any center (facade
        // callers may pass dim-skewed rows whose cross-dim cosine is
        // NULL) cannot be counted in a population deterministically
        .where(col("d").isNotNull)
        .groupBy("vec_id")
        .agg(min_by(col("round"), struct(col("d"), col("round"))).as("round"))
        .groupBy("round").agg(count(lit(1)).as("n_assigned"))
      cents.select("round", "center_id", "radius")
        .join(broadcast(assigned), Seq("round"), "left")
        .select(col("round"), col("center_id"),
          coalesce(col("n_assigned"), lit(0L)).as("n_assigned"), col("radius"))
        .orderBy("round")
    } finally { e.unpersist(); () }
  }

  /** The k unrolled greedy stages, shared with nothing — the oracle
    * re-derives every pick: stage i keeps the running min-distance
    * frame p_i and extracts its argmax as center c_i.
    */
  val qCoresetKcenterSql: String = {
    def fold(a: String, b: String) =
      s"list_reduce(list_prepend(0.0, list_transform(range(1, ${Dim + 1}), i -> $a[i] * $b[i])), (acc, x) -> acc + x)"
    def cos(a: String, b: String) =
      s"${fold(a, b)} / (sqrt(${fold(a, a)}) * sqrt(${fold(b, b)}))"
    val stages = (1 until CoresetK).map { r =>
      val pSrc = if (r == 1)
        s"""p1 AS MATERIALIZED (
           |  SELECT e.vec_id, e.v, 1 - ${cos("e.v", "c0.v")} AS mind
           |  FROM e, c0 WHERE e.vec_id <> c0.vec_id)""".stripMargin
      else
        s"""p$r AS MATERIALIZED (
           |  SELECT p.vec_id, p.v,
           |    least(p.mind, 1 - ${cos("p.v", s"c${r - 1}.v")}) AS mind
           |  FROM p${r - 1} p, c${r - 1} WHERE p.vec_id <> c${r - 1}.vec_id)""".stripMargin
      s"""$pSrc,
         |c$r AS MATERIALIZED (
         |  SELECT vec_id, v, mind FROM p$r
         |  ORDER BY mind DESC, vec_id LIMIT 1)""".stripMargin
    }.mkString(",\n")
    val centRows = (0 until CoresetK).map { r =>
      if (r == 0)
        s"SELECT 0 AS round, vec_id AS center_id, v AS cv, CAST(NULL AS DOUBLE) AS radius FROM c0"
      else
        s"SELECT $r AS round, vec_id AS center_id, v AS cv, mind AS radius FROM c$r"
    }.mkString("\nUNION ALL\n")
    s"""WITH e AS MATERIALIZED (
       |  SELECT vec_id,
       |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
       |  FROM embeddings
       |  WHERE len(embedding) = $Dim
       |    AND NOT EXISTS (SELECT 1 FROM unnest(embedding) AS t(x) WHERE x IS NULL)
       |    AND isfinite(${fold("v", "v")}) AND ${fold("v", "v")} > 0),
       |c0 AS MATERIALIZED (
       |  SELECT vec_id, v FROM e ORDER BY vec_id LIMIT 1),
       |$stages,
       |cents AS MATERIALIZED (
       |$centRows),
       |assigned AS (
       |  SELECT vec_id, round FROM (
       |    SELECT e.vec_id, c.round,
       |      row_number() OVER (PARTITION BY e.vec_id
       |        ORDER BY 1 - ${cos("c.cv", "e.v")}, c.round) AS ar
       |    FROM e CROSS JOIN cents c) WHERE ar = 1),
       |pop AS (
       |  SELECT round, CAST(count(*) AS BIGINT) AS n_assigned
       |  FROM assigned GROUP BY round)
       |SELECT c.round AS round, c.center_id, coalesce(p.n_assigned, 0) AS n_assigned,
       |  c.radius
       |FROM cents c LEFT JOIN pop p ON c.round = p.round
       |ORDER BY 1""".stripMargin
  }

  /** #182 — `q_ann_pq_recall`: recall@k of the PQ gate (#177) against
    * the exact INNER-PRODUCT top-k over the same usable universe —
    * quantization loss isolated from filter/metric differences (ADC
    * approximates the inner product, so the baseline ranks by the
    * inner product; #170 plays the same role for the IVF/cosine
    * pair). Output mirrors #170: per-query integer `hits`/`expected`
    * plus ONE total row (`q_id = -1`) so the mean recall is a single
    * integer division — bit-identical across engines. The
    * quantization-quality dial next to the #178 usage dial: together
    * they say whether the codebook is both BALANCED and FAITHFUL.
    *
    * Scale: both branches are broadcast-query linear scans (#30's
    * shape); the recall join is TopK×NQueries rows. Run on a query
    * SAMPLE at corpus scale — the probe set is the dial.
    */
  def qAnnPqRecall(spark: SparkSession, dir: String): DataFrame = {
    val (e, _, _) = ivfGateAssigned(spark, dir)
    val q = e.where(col("vec_id") < NQueries)
      .select(col("vec_id").as("q_id"), col("v").as("qv"))
    val w = Window.partitionBy("q_id").orderBy(col("dot").desc, col("vec_id"))
    val exact = e.crossJoin(broadcast(q))
      .where(col("vec_id") =!= col("q_id"))
      .withColumn("dot", call_function("dot_product", col("qv"), col("v")))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= TopK)
      .select(col("q_id"), col("vec_id"))
    val approx = qAnnPq(spark, dir)
      .select(col("q_id"), col("vec_id"), lit(1L).as("hit"))
    val perQ = exact.join(broadcast(approx), Seq("q_id", "vec_id"), "left")
      .groupBy("q_id")
      .agg(count(lit(1)).as("expected"),
        coalesce(sum("hit"), lit(0L)).as("hits"))
    def recallOf(d: DataFrame) = d.withColumn("recall",
      when(col("expected") === 0, lit(null).cast("double"))
        .otherwise(col("hits").cast("double") / col("expected")))
      .select("q_id", "hits", "expected", "recall")
    val total = perQ.agg(
      coalesce(sum("hits"), lit(0L)).as("hits"),
      coalesce(sum("expected"), lit(0L)).as("expected"))
      .select(lit(-1L).as("q_id"), col("hits"), col("expected"))
    recallOf(perQ).unionByName(recallOf(total)).orderBy("q_id")
  }

  val qAnnPqRecallSql: String = {
    def fold64(a: String, b: String) =
      s"list_reduce(list_prepend(0.0, list_transform(range(1, ${Dim + 1}), i -> $a[i] * $b[i])), (acc, x) -> acc + x)"
    s"""WITH $pqPickedCteSql,
       |recon AS (
       |  SELECT vec_id, flatten(list(cw ORDER BY sub_s)) AS rv
       |  FROM picked GROUP BY vec_id),
       |q AS MATERIALIZED (SELECT vec_id AS q_id, v AS qv FROM e WHERE vec_id < $NQueries),
       |approx AS (
       |  SELECT q_id, vec_id FROM (
       |    SELECT q.q_id, r.vec_id,
       |      row_number() OVER (PARTITION BY q.q_id
       |        ORDER BY ${fold64("q.qv", "r.rv")} DESC, r.vec_id) AS rank
       |    FROM q JOIN recon r ON r.vec_id <> q.q_id)
       |  WHERE rank <= $TopK),
       |exact AS (
       |  SELECT q_id, vec_id FROM (
       |    SELECT q.q_id, e.vec_id,
       |      row_number() OVER (PARTITION BY q.q_id
       |        ORDER BY ${fold64("q.qv", "e.v")} DESC, e.vec_id) AS rank
       |    FROM q JOIN e ON e.vec_id <> q.q_id)
       |  WHERE rank <= $TopK),
       |perq AS (
       |  SELECT x.q_id,
       |    CAST(coalesce(sum(CASE WHEN a.vec_id IS NOT NULL THEN 1 ELSE 0 END), 0) AS BIGINT) AS hits,
       |    CAST(count(*) AS BIGINT) AS expected
       |  FROM exact x LEFT JOIN approx a USING (q_id, vec_id)
       |  GROUP BY 1)
       |SELECT q_id, hits, expected,
       |  CAST(hits AS DOUBLE) / nullif(expected, 0) AS recall
       |FROM perq
       |UNION ALL
       |SELECT CAST(-1 AS BIGINT) AS q_id,
       |  CAST(coalesce(sum(hits), 0) AS BIGINT) AS hits,
       |  CAST(coalesce(sum(expected), 0) AS BIGINT) AS expected,
       |  CAST(coalesce(sum(hits), 0) AS DOUBLE) / nullif(sum(expected), 0) AS recall
       |FROM perq
       |ORDER BY q_id""".stripMargin
  }

  /** #178 — `q_pq_code_usage`: the codebook-health histogram —
    * `(subspace, code, n_vecs, share)` per codeword of the gate PQ
    * index, `share` one integer division by the usable-vector count.
    * The PQ twin of the #164 IVF balance dial: dead codewords waste
    * index bits and skewed usage means the quantizer is paying for
    * resolution where the data isn't — the two numbers a deployment
    * reads before trusting ADC scores. Integer counts → hash gate.
    */
  def qPqCodeUsage(spark: SparkSession, dir: String): DataFrame = {
    // the share denominator comes from the m×k aggregate ITSELF (every
    // usable vector carries exactly one code per subspace, so each
    // subspace's count-sum IS the usable total) — a window over ≤ m×k
    // rows instead of a second corpus scan (review r14)
    val wSub = Window.partitionBy("subspace")
    pqGateEncoded(spark, dir)
      .select(posexplode(col("codes")).as(Seq("subspace", "code")))
      .groupBy("subspace", "code")
      .agg(count(lit(1)).as("n_vecs"))
      .withColumn("share",
        col("n_vecs").cast("double") / sum("n_vecs").over(wSub))
      .select(col("subspace").cast("int").as("subspace"), col("code"),
        col("n_vecs"), col("share"))
      .orderBy("subspace", "code")
  }

  val qPqCodeUsageSql: String =
    s"""WITH $pqPickedCteSql,
       |cnt AS (
       |  SELECT CAST(sub_s AS INT) AS subspace, code,
       |    CAST(count(*) AS BIGINT) AS n_vecs
       |  FROM picked GROUP BY 1, 2)
       |SELECT subspace, code, n_vecs,
       |  CAST(n_vecs AS DOUBLE) / sum(n_vecs) OVER (PARTITION BY subspace) AS share
       |FROM cnt ORDER BY 1, 2""".stripMargin

  // --------------------------------------------------------------------
  // IVFADC with RESIDUAL encoding (#191): the Jégou et al. recipe
  // proper. The gate composes the #31 cell assignment with a PQ
  // codebook fitted on COARSE RESIDUALS (vec − centroid(cell)) — the
  // encoding FAISS IndexIVFPQ uses by default, worth real recall at
  // equal bits because residuals concentrate around the origin. The
  // serving score adds the per-(query, cell) q·c constant back:
  // adc = q·(centroid + recon(residual)). The k-means/Lloyd-fitted
  // serving flavor lives in [[graft.api.Graft.ivfPqCodebooks]]/
  // ivfPqIndex/ivfPqQuery (residual = true); this gate pins the same
  // math with the deterministic seed rule so the DuckDB oracle can
  // re-derive the whole index — codewords are the residuals of the
  // vectors at vec_id ≡ 1 (mod the #31 centroid modulus), offset from
  // the centroid rule's ≡ 0 because a centroid's own residual is ~0
  // (a degenerate codeword).
  // --------------------------------------------------------------------

  /** Probed cells per query for the #191 gate — the routed (sublinear)
    * regime, matching the PqSpec dial the raw-vs-residual comparison
    * is measured at.
    */
  private[graft] val AdcNProbe = 3

  /** The gate residual-IVFADC encoded frame: `(vec_id, cell, rhat)`
    * with `rhat = centroid(cell) + recon(residual)` — the decoded
    * approximation the ADC score folds against. Scale shape: the
    * residual join broadcasts the ≤√n centroid frame, the codebook
    * (seed residuals) broadcasts, and the per-(vector, subspace)
    * argmin folds through ONE per-vector aggregate (which, unique
    * keys, exchanges the corpus rows once — the [[pqGateEncoded]]
    * gate-replay caveat; the serving twin is
    * [[graft.api.Graft.ivfPqIndex]]).
    */
  private def ivfPqGateEncoded(spark: SparkSession, dir: String): DataFrame = {
    val (_, cents, assigned) = ivfGateAssigned(spark, dir)
    val md = centroidMod(embeddingRowCount(spark, dir))
    val withRes = assigned
      .join(broadcast(cents.select(col("cent_id").as("cell"), col("cv"))),
        "cell")
      .select(col("vec_id"), col("cell"), col("cv"),
        zip_with(col("v"), col("cv"), (x, c) => x - c).as("rv"))
    // residual codebook: the residuals of the seed set vec_id ≡ 1
    // (mod md) — pmod on the Spark side so negative ids agree with the
    // oracle's ((x % md) + md) % md residue
    val seeds = withRes.where(pmod(col("vec_id"), lit(md)) === 1)
      .select(col("vec_id").as("code"), col("rv").as("cbv"))
    val picks = (0 until PqM).map { s =>
      val sub = slice(col("rv"), s * PqSubDim + 1, PqSubDim)
      val cw = slice(col("cbv"), s * PqSubDim + 1, PqSubDim)
      val key = call_function("dot_product", cw, cw) -
        lit(2.0) * call_function("dot_product", sub, cw)
      min_by(cw, struct(key.as("k"), col("code").as("t"))).as(s"p$s")
    }
    withRes.crossJoin(broadcast(seeds))
      .groupBy("vec_id")
      .agg(first(col("cell")).as("cell"),
        (first(col("cv")).as("cv") +: picks): _*)
      // rhat = cv + concat(chosen codewords): element-wise double adds
      // in ascending index order — stated identically in the oracle, so
      // the downstream one-fold ADC hashes bit-identically
      .select(col("vec_id"), col("cell"),
        zip_with(col("cv"), concat((0 until PqM).map(s => col(s"p$s")): _*),
          (a, b) => a + b).as("rhat"))
  }

  /** #191 — `q_ann_ivfpq_recall`: recall@k of RESIDUAL-encoded IVFADC
    * serving (routed: [[AdcNProbe]] probed cells per query; scored:
    * one `q·rhat` fold against the decoded centroid+residual
    * approximation) against the exact inner-product top-k over the
    * same usable universe — the #182 readout for the composed
    * sublinear path, making the residual recipe's quality
    * driver-visible (VERDICT r15 item 1). Output mirrors #170/#182:
    * per-query integer `hits`/`expected` plus ONE total row
    * (`q_id = -1`); `recall` is a single integer division.
    *
    * Scale: the encoded frame is the [[ivfPqGateEncoded]]
    * broadcast-only composition; both serving branches are
    * broadcast-query scans (approx reads only probed cells on a
    * bucketed store); the recall join is TopK×NQueries rows. The
    * production twin is [[graft.api.Graft.ivfPqQuery]] with
    * `residual = true` over a fitted [[graft.api.Graft
    * .ivfPqCodebooks]] — PqSpec pins that flavor's dominance over raw
    * encoding at equal dials.
    */
  def qAnnIvfPqRecall(spark: SparkSession, dir: String): DataFrame = {
    val (e, cents, _) = ivfGateAssigned(spark, dir)
    val q = e.where(col("vec_id") < NQueries)
      .select(col("vec_id").as("q_id"), col("v").as("qv"))
    val wProbe = Window.partitionBy("q_id")
      .orderBy(col("ccos").desc, col("cent_id"))
    val probes = q.crossJoin(broadcast(cents))
      .withColumn("ccos", cosine(col("cv"), col("qv")))
      .withColumn("crank", row_number().over(wProbe))
      .where(col("crank") <= AdcNProbe)
      .select(col("q_id"), col("qv"), col("cent_id").as("cell"))
    val wAdc = Window.partitionBy("q_id").orderBy(col("adc").desc, col("vec_id"))
    val approx = ivfPqGateEncoded(spark, dir)
      .join(broadcast(probes), "cell")
      .where(col("vec_id") =!= col("q_id"))
      .withColumn("adc", call_function("dot_product", col("qv"), col("rhat")))
      .withColumn("rank", row_number().over(wAdc))
      .where(col("rank") <= TopK)
      .select(col("q_id"), col("vec_id"), lit(1L).as("hit"))
    val wDot = Window.partitionBy("q_id").orderBy(col("dot").desc, col("vec_id"))
    val exact = e.crossJoin(broadcast(q))
      .where(col("vec_id") =!= col("q_id"))
      .withColumn("dot", call_function("dot_product", col("qv"), col("v")))
      .withColumn("rank", row_number().over(wDot))
      .where(col("rank") <= TopK)
      .select(col("q_id"), col("vec_id"))
    // the recall join is TopK×NQueries rows — broadcast it so the
    // whole gate plan stays shuffle-join-free (PlanSpec pins it)
    val perQ = exact.join(broadcast(approx), Seq("q_id", "vec_id"), "left")
      .groupBy("q_id")
      .agg(count(lit(1)).as("expected"),
        coalesce(sum("hit"), lit(0L)).as("hits"))
    def recallOf(d: DataFrame) = d.withColumn("recall",
      when(col("expected") === 0, lit(null).cast("double"))
        .otherwise(col("hits").cast("double") / col("expected")))
      .select("q_id", "hits", "expected", "recall")
    val total = perQ.agg(
      coalesce(sum("hits"), lit(0L)).as("hits"),
      coalesce(sum("expected"), lit(0L)).as("expected"))
      .select(lit(-1L).as("q_id"), col("hits"), col("expected"))
    recallOf(perQ).unionByName(recallOf(total)).orderBy("q_id")
  }

  /** #191's oracle: the #31 usable/centroid/assignment stack, the
    * residual frame, the seed-residual codebook, the per-(vector,
    * subspace) argmin, then rhat = cv + flattened picks and ONE
    * ascending fold per (query, candidate) — every float op stated in
    * the same order as the Spark plan's.
    */
  val qAnnIvfPqRecallSql: String = {
    def fold8(a: String, b: String) =
      s"list_reduce(list_prepend(0.0, list_transform(range(1, ${PqSubDim + 1}), i -> $a[i] * $b[i])), (acc, x) -> acc + x)"
    def fold64(a: String, b: String) =
      s"list_reduce(list_prepend(0.0, list_transform(range(1, ${Dim + 1}), i -> $a[i] * $b[i])), (acc, x) -> acc + x)"
    def cos(a: String, b: String) =
      s"${fold64(a, b)} / (sqrt(${fold64(a, a)}) * sqrt(${fold64(b, b)}))"
    s"""WITH e AS MATERIALIZED (
       |  SELECT vec_id,
       |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
       |  FROM embeddings
       |  WHERE len(embedding) = $Dim
       |    AND NOT EXISTS (SELECT 1 FROM unnest(embedding) AS t(x) WHERE x IS NULL)
       |    AND isfinite(${fold64("v", "v")}) AND ${fold64("v", "v")} > 0),
       |m AS (
       |  SELECT greatest(50, CAST(n // CAST(ceil(sqrt(n)) AS BIGINT) AS BIGINT)) AS md
       |  FROM (SELECT CAST(count(*) AS BIGINT) AS n FROM embeddings)),
       |cents AS MATERIALIZED (
       |  SELECT vec_id AS cent_id, v AS cv FROM e, m
       |  WHERE ((vec_id % md) + md) % md = 0),
       |assigned AS MATERIALIZED (
       |  SELECT vec_id, v, cell, cv FROM (
       |    SELECT e.vec_id, e.v, c.cent_id AS cell, c.cv,
       |      row_number() OVER (PARTITION BY e.vec_id
       |        ORDER BY ${cos("c.cv", "e.v")} DESC, c.cent_id) AS ar
       |    FROM e CROSS JOIN cents c) WHERE ar = 1),
       |wres AS MATERIALIZED (
       |  SELECT vec_id, cell, cv,
       |    list_transform(range(1, ${Dim + 1}), i -> v[i] - cv[i]) AS rv
       |  FROM assigned),
       |seeds AS MATERIALIZED (
       |  SELECT vec_id AS code, rv AS cbv FROM wres, m
       |  WHERE ((vec_id % md) + md) % md = 1),
       |grid AS (
       |  SELECT w.vec_id, s.code, ss.s AS sub_s,
       |    w.rv[ss.s * $PqSubDim + 1 : ss.s * $PqSubDim + $PqSubDim] AS sv,
       |    s.cbv[ss.s * $PqSubDim + 1 : ss.s * $PqSubDim + $PqSubDim] AS cw
       |  FROM wres w CROSS JOIN seeds s
       |  CROSS JOIN (SELECT unnest(range(0, $PqM)) AS s) ss),
       |picked AS MATERIALIZED (
       |  SELECT vec_id, sub_s, cw FROM (
       |    SELECT vec_id, sub_s, code, cw,
       |      row_number() OVER (PARTITION BY vec_id, sub_s
       |        ORDER BY ${fold8("cw", "cw")} - 2 * ${fold8("sv", "cw")}, code) AS pr
       |    FROM grid) WHERE pr = 1),
       |hat AS MATERIALIZED (
       |  SELECT w.vec_id, w.cell,
       |    list_transform(range(1, ${Dim + 1}),
       |      i -> w.cv[i] + r.rrec[i]) AS rhat
       |  FROM wres w JOIN (
       |    SELECT vec_id, flatten(list(cw ORDER BY sub_s)) AS rrec
       |    FROM picked GROUP BY vec_id) r USING (vec_id)),
       |q AS MATERIALIZED (
       |  SELECT vec_id AS q_id, v AS qv FROM e WHERE vec_id < $NQueries),
       |probes AS (
       |  SELECT q_id, qv, cell FROM (
       |    SELECT q.q_id, q.qv, c.cent_id AS cell,
       |      row_number() OVER (PARTITION BY q.q_id
       |        ORDER BY ${cos("c.cv", "q.qv")} DESC, c.cent_id) AS crank
       |    FROM q CROSS JOIN cents c) WHERE crank <= $AdcNProbe),
       |approx AS (
       |  SELECT q_id, vec_id FROM (
       |    SELECT p.q_id, h.vec_id,
       |      row_number() OVER (PARTITION BY p.q_id
       |        ORDER BY ${fold64("p.qv", "h.rhat")} DESC, h.vec_id) AS rank
       |    FROM probes p JOIN hat h ON h.cell = p.cell AND h.vec_id <> p.q_id)
       |  WHERE rank <= $TopK),
       |exact AS (
       |  SELECT q_id, vec_id FROM (
       |    SELECT q.q_id, e.vec_id,
       |      row_number() OVER (PARTITION BY q.q_id
       |        ORDER BY ${fold64("q.qv", "e.v")} DESC, e.vec_id) AS rank
       |    FROM q JOIN e ON e.vec_id <> q.q_id)
       |  WHERE rank <= $TopK),
       |perq AS (
       |  SELECT x.q_id,
       |    CAST(coalesce(sum(CASE WHEN a.vec_id IS NOT NULL THEN 1 ELSE 0 END), 0) AS BIGINT) AS hits,
       |    CAST(count(*) AS BIGINT) AS expected
       |  FROM exact x LEFT JOIN approx a USING (q_id, vec_id)
       |  GROUP BY 1)
       |SELECT q_id, hits, expected,
       |  CAST(hits AS DOUBLE) / nullif(expected, 0) AS recall
       |FROM perq
       |UNION ALL
       |SELECT CAST(-1 AS BIGINT) AS q_id,
       |  CAST(coalesce(sum(hits), 0) AS BIGINT) AS hits,
       |  CAST(coalesce(sum(expected), 0) AS BIGINT) AS expected,
       |  CAST(coalesce(sum(hits), 0) AS DOUBLE) / nullif(sum(expected), 0) AS recall
       |FROM perq
       |ORDER BY q_id""".stripMargin
  }

  /** The #199 ADC shortlist size: 4× [[TopK]] — the "shortlist buys
    * back quantizer resolution" dial at its usual low end.
    */
  private[graft] val RerankShort = 20

  /** #199 — `q_ann_rerank`: recall@k of the IVFADC + EXACT-RERANK
    * serving pipeline against the ADC-only path, side by side. The
    * first stage is exactly #191's routed residual-ADC scan, but it
    * keeps a [[RerankShort]]-deep shortlist instead of top-k; the
    * second stage re-scores the shortlist by the TRUE inner product
    * (one broadcast join back to the raw vectors — [[graft.api.Graft
    * .rerankExact]] is the production twin) and takes the top-k of
    * that. Output per query: integer `hits_adc` / `hits_rerank` /
    * `expected` plus the two single-division recalls, and ONE total
    * row (`q_id = -1`).
    *
    * Why this is a first-class gate and not a bench note: ADC recall
    * is capped by reconstruction error — probe 33 measured recall
    * FALLING as nprobe rose, because each extra probed cell adds
    * noise-ranked competitors. The rerank converts that regime into
    * "did the true neighbor reach the shortlist at all", which the
    * routing dials control, at the cost of `queries × shortlist` raw
    * vector reads. `recall_rerank ≥ recall_adc` row-by-row is pinned
    * in PqSpec (the rerank can only fix ADC mistakes inside the
    * shortlist, never introduce new ones: the ADC top-k IS a subset
    * of the shortlist it reorders).
    *
    * Scale: the shortlist frame is NQueries × [[RerankShort]] rows —
    * it broadcasts into one corpus-store pass for the exact re-score;
    * everything else is #191's broadcast-only composition. The recall
    * joins are TopK×NQueries rows, broadcast.
    */
  def qAnnRerankRecall(spark: SparkSession, dir: String): DataFrame = {
    val (e, cents, _) = ivfGateAssigned(spark, dir)
    val q = e.where(col("vec_id") < NQueries)
      .select(col("vec_id").as("q_id"), col("v").as("qv"))
    val wProbe = Window.partitionBy("q_id")
      .orderBy(col("ccos").desc, col("cent_id"))
    val probes = q.crossJoin(broadcast(cents))
      .withColumn("ccos", cosine(col("cv"), col("qv")))
      .withColumn("crank", row_number().over(wProbe))
      .where(col("crank") <= AdcNProbe)
      .select(col("q_id"), col("qv"), col("cent_id").as("cell"))
    val wAdc = Window.partitionBy("q_id").orderBy(col("adc").desc, col("vec_id"))
    val short = ivfPqGateEncoded(spark, dir)
      .join(broadcast(probes), "cell")
      .where(col("vec_id") =!= col("q_id"))
      .withColumn("adc", call_function("dot_product", col("qv"), col("rhat")))
      .withColumn("rank", row_number().over(wAdc))
      .where(col("rank") <= RerankShort)
      .select(col("q_id"), col("vec_id"), col("rank"))
    val adcTop = short.where(col("rank") <= TopK)
      .select(col("q_id"), col("vec_id"), lit(1L).as("hit_adc"))
    // the exact re-score: ONE corpus pass with the broadcast shortlist
    // (the rerankExact shape), stated inline so every float op and
    // tie-break matches the oracle's fold order
    val wRer = Window.partitionBy("q_id").orderBy(col("dot").desc, col("vec_id"))
    val rer = e.select(col("vec_id"), col("v"))
      .join(broadcast(short.join(q, "q_id")
        .select(col("q_id"), col("qv"), col("vec_id"))), "vec_id")
      .withColumn("dot", call_function("dot_product", col("qv"), col("v")))
      .withColumn("rrank", row_number().over(wRer))
      .where(col("rrank") <= TopK)
      .select(col("q_id"), col("vec_id"), lit(1L).as("hit_rer"))
    val wDot = Window.partitionBy("q_id").orderBy(col("dot").desc, col("vec_id"))
    val exact = e.crossJoin(broadcast(q))
      .where(col("vec_id") =!= col("q_id"))
      .withColumn("dot", call_function("dot_product", col("qv"), col("v")))
      .withColumn("rank", row_number().over(wDot))
      .where(col("rank") <= TopK)
      .select(col("q_id"), col("vec_id"))
    val perQ = exact.join(broadcast(adcTop), Seq("q_id", "vec_id"), "left")
      .join(broadcast(rer), Seq("q_id", "vec_id"), "left")
      .groupBy("q_id")
      .agg(count(lit(1)).as("expected"),
        coalesce(sum("hit_adc"), lit(0L)).as("hits_adc"),
        coalesce(sum("hit_rer"), lit(0L)).as("hits_rerank"))
    def shape(d: DataFrame) = d
      .withColumn("recall_adc",
        when(col("expected") === 0, lit(null).cast("double"))
          .otherwise(col("hits_adc").cast("double") / col("expected")))
      .withColumn("recall_rerank",
        when(col("expected") === 0, lit(null).cast("double"))
          .otherwise(col("hits_rerank").cast("double") / col("expected")))
      .select("q_id", "hits_adc", "hits_rerank", "expected",
        "recall_adc", "recall_rerank")
    val total = perQ.agg(
      coalesce(sum("hits_adc"), lit(0L)).as("hits_adc"),
      coalesce(sum("hits_rerank"), lit(0L)).as("hits_rerank"),
      coalesce(sum("expected"), lit(0L)).as("expected"))
      .select(lit(-1L).as("q_id"), col("expected"),
        col("hits_adc"), col("hits_rerank"))
    shape(perQ).unionByName(shape(total)).orderBy("q_id")
  }

  /** #199's oracle: the #191 CTE chain (usable/centroid/assignment,
    * residual seed codebook, per-(vector, subspace) argmin, rhat)
    * with the ADC rank kept to [[RerankShort]] depth, then the exact
    * re-score of the shortlist joined back to `e` — every float op
    * stated in the same fold order as the Spark plan's.
    */
  val qAnnRerankRecallSql: String = {
    def fold8(a: String, b: String) =
      s"list_reduce(list_prepend(0.0, list_transform(range(1, ${PqSubDim + 1}), i -> $a[i] * $b[i])), (acc, x) -> acc + x)"
    def fold64(a: String, b: String) =
      s"list_reduce(list_prepend(0.0, list_transform(range(1, ${Dim + 1}), i -> $a[i] * $b[i])), (acc, x) -> acc + x)"
    def cos(a: String, b: String) =
      s"${fold64(a, b)} / (sqrt(${fold64(a, a)}) * sqrt(${fold64(b, b)}))"
    s"""WITH e AS MATERIALIZED (
       |  SELECT vec_id,
       |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
       |  FROM embeddings
       |  WHERE len(embedding) = $Dim
       |    AND NOT EXISTS (SELECT 1 FROM unnest(embedding) AS t(x) WHERE x IS NULL)
       |    AND isfinite(${fold64("v", "v")}) AND ${fold64("v", "v")} > 0),
       |m AS (
       |  SELECT greatest(50, CAST(n // CAST(ceil(sqrt(n)) AS BIGINT) AS BIGINT)) AS md
       |  FROM (SELECT CAST(count(*) AS BIGINT) AS n FROM embeddings)),
       |cents AS MATERIALIZED (
       |  SELECT vec_id AS cent_id, v AS cv FROM e, m
       |  WHERE ((vec_id % md) + md) % md = 0),
       |assigned AS MATERIALIZED (
       |  SELECT vec_id, v, cell, cv FROM (
       |    SELECT e.vec_id, e.v, c.cent_id AS cell, c.cv,
       |      row_number() OVER (PARTITION BY e.vec_id
       |        ORDER BY ${cos("c.cv", "e.v")} DESC, c.cent_id) AS ar
       |    FROM e CROSS JOIN cents c) WHERE ar = 1),
       |wres AS MATERIALIZED (
       |  SELECT vec_id, cell, cv,
       |    list_transform(range(1, ${Dim + 1}), i -> v[i] - cv[i]) AS rv
       |  FROM assigned),
       |seeds AS MATERIALIZED (
       |  SELECT vec_id AS code, rv AS cbv FROM wres, m
       |  WHERE ((vec_id % md) + md) % md = 1),
       |grid AS (
       |  SELECT w.vec_id, s.code, ss.s AS sub_s,
       |    w.rv[ss.s * $PqSubDim + 1 : ss.s * $PqSubDim + $PqSubDim] AS sv,
       |    s.cbv[ss.s * $PqSubDim + 1 : ss.s * $PqSubDim + $PqSubDim] AS cw
       |  FROM wres w CROSS JOIN seeds s
       |  CROSS JOIN (SELECT unnest(range(0, $PqM)) AS s) ss),
       |picked AS MATERIALIZED (
       |  SELECT vec_id, sub_s, cw FROM (
       |    SELECT vec_id, sub_s, code, cw,
       |      row_number() OVER (PARTITION BY vec_id, sub_s
       |        ORDER BY ${fold8("cw", "cw")} - 2 * ${fold8("sv", "cw")}, code) AS pr
       |    FROM grid) WHERE pr = 1),
       |hat AS MATERIALIZED (
       |  SELECT w.vec_id, w.cell,
       |    list_transform(range(1, ${Dim + 1}),
       |      i -> w.cv[i] + r.rrec[i]) AS rhat
       |  FROM wres w JOIN (
       |    SELECT vec_id, flatten(list(cw ORDER BY sub_s)) AS rrec
       |    FROM picked GROUP BY vec_id) r USING (vec_id)),
       |q AS MATERIALIZED (
       |  SELECT vec_id AS q_id, v AS qv FROM e WHERE vec_id < $NQueries),
       |probes AS (
       |  SELECT q_id, qv, cell FROM (
       |    SELECT q.q_id, q.qv, c.cent_id AS cell,
       |      row_number() OVER (PARTITION BY q.q_id
       |        ORDER BY ${cos("c.cv", "q.qv")} DESC, c.cent_id) AS crank
       |    FROM q CROSS JOIN cents c) WHERE crank <= $AdcNProbe),
       |short AS MATERIALIZED (
       |  SELECT q_id, vec_id, rank FROM (
       |    SELECT p.q_id, h.vec_id,
       |      row_number() OVER (PARTITION BY p.q_id
       |        ORDER BY ${fold64("p.qv", "h.rhat")} DESC, h.vec_id) AS rank
       |    FROM probes p JOIN hat h ON h.cell = p.cell AND h.vec_id <> p.q_id)
       |  WHERE rank <= $RerankShort),
       |adctop AS (SELECT q_id, vec_id FROM short WHERE rank <= $TopK),
       |rer AS (
       |  SELECT q_id, vec_id FROM (
       |    SELECT s.q_id, s.vec_id,
       |      row_number() OVER (PARTITION BY s.q_id
       |        ORDER BY ${fold64("q.qv", "e.v")} DESC, s.vec_id) AS rrank
       |    FROM short s JOIN q USING (q_id) JOIN e ON e.vec_id = s.vec_id)
       |  WHERE rrank <= $TopK),
       |exact AS (
       |  SELECT q_id, vec_id FROM (
       |    SELECT q.q_id, e.vec_id,
       |      row_number() OVER (PARTITION BY q.q_id
       |        ORDER BY ${fold64("q.qv", "e.v")} DESC, e.vec_id) AS rank
       |    FROM q JOIN e ON e.vec_id <> q.q_id)
       |  WHERE rank <= $TopK),
       |perq AS (
       |  SELECT x.q_id,
       |    CAST(coalesce(sum(CASE WHEN a.vec_id IS NOT NULL THEN 1 ELSE 0 END), 0) AS BIGINT) AS hits_adc,
       |    CAST(coalesce(sum(CASE WHEN r.vec_id IS NOT NULL THEN 1 ELSE 0 END), 0) AS BIGINT) AS hits_rerank,
       |    CAST(count(*) AS BIGINT) AS expected
       |  FROM exact x LEFT JOIN adctop a USING (q_id, vec_id)
       |    LEFT JOIN rer r USING (q_id, vec_id)
       |  GROUP BY 1)
       |SELECT q_id, hits_adc, hits_rerank, expected,
       |  CAST(hits_adc AS DOUBLE) / nullif(expected, 0) AS recall_adc,
       |  CAST(hits_rerank AS DOUBLE) / nullif(expected, 0) AS recall_rerank
       |FROM perq
       |UNION ALL
       |SELECT CAST(-1 AS BIGINT) AS q_id,
       |  CAST(coalesce(sum(hits_adc), 0) AS BIGINT) AS hits_adc,
       |  CAST(coalesce(sum(hits_rerank), 0) AS BIGINT) AS hits_rerank,
       |  CAST(coalesce(sum(expected), 0) AS BIGINT) AS expected,
       |  CAST(coalesce(sum(hits_adc), 0) AS DOUBLE) / nullif(sum(expected), 0) AS recall_adc,
       |  CAST(coalesce(sum(hits_rerank), 0) AS DOUBLE) / nullif(sum(expected), 0) AS recall_rerank
       |FROM perq
       |ORDER BY q_id""".stripMargin
  }
}
