package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

// disposable probe main (not part of the library): probe 27 — the r14
// newcomers at ×64 mass (VERDICT r14 item 5). Four questions the sf
// gates can't answer:
//   1. winnow pairing under the verbatim-copy pathology: 64 copies of
//      every doc put each surviving fingerprint at df=64 — exactly the
//      df-cap boundary — so the candidate join fans out df² per
//      fingerprint. Does the pipeline stay df²-bounded (linear in
//      groups), and what does the dfCap dial buy?
//   2. k-center's k-scan driver loop: cost is k broadcast-argmax
//      corpus scans by construction — measure that it is LINEAR in k
//      and survives ×64 corpus mass.
//   3. IVFADC serving at ×64 vectors: does nprobe/cells routing beat
//      the flat ADC scan once the corpus outgrows fixed overheads
//      (probe 26 saw parity at ×16 — the crossover question)?
//   4. the BPE fit at ×64 corpus mass (same dictionary): the fit cost
//      is the word-count aggregate + a Vocab-bounded driver loop, so
//      ×64 mass must move only the aggregate.
object ProbeScale64 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = if (args.length > 1) args(1).toInt else 2
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time(tag: String)(body: => Unit): Double = {
      var best = Double.MaxValue
      for (_ <- 1 to reps) {
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        body
        val s = (System.nanoTime() - t0) / 1e9
        best = math.min(best, s)
        println(f"$tag: $s%.2f s")
      }
      best
    }
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    // ---- corpora ----------------------------------------------------
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), col("text")).localCheckpoint(true)
    val nDocs = docs.count()
    def docsX(scale: Int, verbatim: Boolean): DataFrame =
      (0 until scale).map { c =>
        docs.select((col("doc_id") + lit(c.toLong * 10000000L)).as("doc_id"),
          if (verbatim || c == 0) col("text")
          else concat(col("text"), lit(s" copysuffix$c")).as("text"))
      }.reduce(_ unionByName _).localCheckpoint(true)

    val emb = Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .localCheckpoint(true)
    def embX(scale: Int): DataFrame =
      (0 until scale).map { c =>
        emb.select((col("vec_id") + lit(c.toLong * 1000000L)).as("vec_id"),
          transform(col("v"), (x, i) =>
            when(i === 0, x + lit(c * 1e-3)).otherwise(x)).as("v"))
      }.reduce(_ unionByName _).localCheckpoint(true)

    import graft.api.Graft

    // ---- 1. winnow pairing ------------------------------------------
    val d64v = docsX(64, verbatim = true)
    println(s"docs x64 verbatim: ${d64v.count()} rows (base $nDocs)")
    time("winnow x1")(noop(Graft.winnowPairs(docs, "doc_id", "text")))
    val d16v = docsX(16, verbatim = true)
    time("winnow x16 verbatim")(noop(
      Graft.winnowPairs(d16v, "doc_id", "text")))
    time("winnow x64 verbatim df<=64")(noop(
      Graft.winnowPairs(d64v, "doc_id", "text")))
    // the dial: halve the cap below the copy count and the df=64
    // boilerplate fingerprints leave candidate generation entirely
    time("winnow x64 verbatim df<=32")(noop(
      Graft.winnowPairs(d64v, "doc_id", "text", dfCap = 32L)))

    // ---- 2. k-center k-scan -----------------------------------------
    val e64 = embX(64)
    println(s"emb x64: ${e64.count()} vectors")
    time("kcenter x1 k=8")(noop(Graft.kcenterCoreset(emb, "vec_id", "v", 8)))
    time("kcenter x64 k=8")(noop(Graft.kcenterCoreset(e64, "vec_id", "v", 8)))
    time("kcenter x64 k=16")(noop(Graft.kcenterCoreset(e64, "vec_id", "v", 16)))

    // ---- 3. IVFADC routed vs flat at x64 ----------------------------
    val books = Graft.pqCodebooks(e64, "vec_id", "v", 64, 8, 64, 3)
      .localCheckpoint(true)
    val cents = Graft.kmeansCentroids(e64, "vec_id", "v", k = 32)
      .localCheckpoint(true)
    val codes = Graft.pqEncode(e64, "vec_id", "v", books).localCheckpoint(true)
    // residual = false on both legs: `books` is raw-fitted, and the
    // probe compares routed vs flat over ONE quantizer (probe 30 /
    // ProbeScale256 prices the residual flavor at ×256)
    val ivfpq = Graft.ivfPqIndex(e64, "vec_id", "v",
      cents, "cent_id", "cv", books, residual = false).localCheckpoint(true)
    val queries = emb.where(col("vec_id") < 64).localCheckpoint(true)
    time("pq flat top-20 x64")(noop(
      Graft.pqQuery(codes, books, queries, "vec_id", "v", 20)))
    time("ivfpq routed 3/32 x64")(noop(
      Graft.ivfPqQuery(ivfpq, cents, "cent_id", "cv", books,
        queries, "vec_id", "v", 20, 3, residual = false)))

    // ---- 4. BPE fit at x64 corpus mass ------------------------------
    time("bpe fit+encode x1")(noop(Graft.bpeTokenize(docs)))
    time("bpe fit+encode x64 verbatim")(noop(Graft.bpeTokenize(d64v)))

    spark.stop()
  }
}
