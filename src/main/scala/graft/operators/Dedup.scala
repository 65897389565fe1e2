package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Deduplication operators for training-data pipelines (SURVEY.md §2.3
  * #25-28): exact hash dedup, n-gram Jaccard near-dup, MinHash+LSH,
  * SimHash.
  *
  * Scale design (SURVEY.md §5): nothing here is all-pairs. Exact dedup
  * is one hash-partitioned window (shuffle on the fingerprint). The
  * near-dup family is candidate-join shaped: explode shingles → join on
  * the shingle/bucket key → verify ONLY candidate pairs. At 100 TB the
  * candidate key (shingle, LSH band bucket, simhash chunk) is the only
  * shuffle key, per-key fan-out is bounded by band width / chunk size,
  * and the exact verification step touches candidates only — never the
  * full cross product. For web-scale corpora one additionally drops
  * ultra-frequent shingles (document-frequency cap) before the
  * candidate join; at test SF the cap never triggers so it is noted
  * here rather than wired into the oracle-checked semantics.
  */
object Dedup {

  /** Jaccard threshold for "near-duplicate" (the test corpus has a
    * clean gap: planted near-dups sit at ≥0.97, background pairs <0.3).
    */
  private val JaccardTau = 0.8

  private val normText = trim(regexp_replace(lower(col("text")), " +", " "))

  /** #25 — exact dedup: canonical doc (min doc_id) per normalized-text
    * md5 group. Reference analogue: UniqueVisitApp's keyed first-wins
    * dedup (UniqueVisitApp.java:37-71) applied to content identity.
    * One shuffle on the fingerprint; at 100 TB this is a plain
    * hash-partitioned window with map-side-prunable input (doc_id +
    * 32-byte hash only).
    */
  def qDedupExact(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("fp")
    Tables.documents(spark, dir)
      .select(col("doc_id"), md5(normText).as("fp"))
      .withColumn("canonical_id", min("doc_id").over(w))
      .withColumn("group_size", count(lit(1)).over(w))
      .withColumn("is_dup", col("doc_id") =!= col("canonical_id"))
      .select("doc_id", "fp", "canonical_id", "group_size", "is_dup")
      .orderBy("doc_id")
  }

  val qDedupExactSql: String =
    """WITH t AS (
      |  SELECT doc_id, md5(trim(regexp_replace(lower(text), ' +', ' ', 'g'))) AS fp
      |  FROM documents)
      |SELECT doc_id, fp,
      |  min(doc_id) OVER (PARTITION BY fp) AS canonical_id,
      |  count(*) OVER (PARTITION BY fp) AS group_size,
      |  doc_id <> min(doc_id) OVER (PARTITION BY fp) AS is_dup
      |FROM t ORDER BY doc_id""".stripMargin

  /** Per-doc distinct word-3-gram shingle sets: (doc_id, shingles,
    * n_shingles). Both engines generate shingles with the identical
    * 1-based sliding window over non-empty whitespace tokens.
    *
    * Shingling runs through the codegen'd [[graft.functions.WordShingles]]
    * expression (the built-in HOF pipeline interpreted at ~1.8 ms/doc and
    * dominated the dedup bench). Persisted because every consumer
    * references the frame 2-3 times (both sides of the candidate
    * self-join + verification) and Spark re-executes each reference;
    * CacheManager keys on the canonical plan, so ngram-jaccard and
    * minhash-LSH share one cached copy — the same pattern Spark MLlib's
    * MinHashLSH applies to its input.
    */
  private def shingleSets(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.WordShingles.register(spark)
    Tables.documents(spark, dir)
      .select(col("doc_id"), expr("word_shingles(text, 3)").as("shingles"))
      .withColumn("n_shingles", size(col("shingles")).cast("long"))
      .persist()
  }

  private def shingleExploded(spark: SparkSession, dir: String): DataFrame =
    shingleSets(spark, dir)
      .select(col("doc_id"), explode(col("shingles")).as("shingle"))

  /** #26 — n-gram Jaccard near-dup: docs sharing ≥1 shingle are
    * candidates (join on the shingle key — the only shuffle); exact
    * Jaccard = |∩| / (|A|+|B|−|∩|) filtered at τ. Integer counts →
    * one double division → bit-identical to the DuckDB oracle.
    */
  def qDedupNgramJaccard(spark: SparkSession, dir: String): DataFrame = {
    val ex = shingleExploded(spark, dir)
    val a = ex.select(col("doc_id").as("doc_a"), col("shingle"))
    val b = ex.select(col("doc_id").as("doc_b"), col("shingle"))
    // |∩| via the codegen'd hash aggregate on the (long, long) pair key
    // — after the shingle join no string array crosses a shuffle; the
    // per-doc sizes re-attach as two broadcast joins of a tiny frame.
    val inter = a.join(b, "shingle")
      .where(col("doc_a") < col("doc_b"))
      .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("inter"))
    val cnt = shingleSets(spark, dir).select("doc_id", "n_shingles")
    inter
      .join(broadcast(cnt.select(col("doc_id").as("doc_a"),
        col("n_shingles").as("na"))), "doc_a")
      .join(broadcast(cnt.select(col("doc_id").as("doc_b"),
        col("n_shingles").as("nb"))), "doc_b")
      .withColumn("jaccard",
        col("inter").cast("double") / (col("na") + col("nb") - col("inter")))
      .where(col("jaccard") >= JaccardTau)
      .select("doc_a", "doc_b", "inter", "jaccard")
      .orderBy("doc_a", "doc_b")
  }

  val qDedupNgramJaccardSql: String =
    s"""WITH toks AS (
       |  SELECT doc_id, list_filter(string_split(text, ' '), t -> t <> '') AS t
       |  FROM documents),
       |sh AS (
       |  SELECT doc_id,
       |    CASE WHEN len(t) >= 3
       |      THEN list_distinct(list_transform(range(1, len(t) - 1),
       |             i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))
       |      ELSE CAST([] AS VARCHAR[]) END AS shingles
       |  FROM toks),
       |cnt AS (SELECT doc_id, CAST(len(shingles) AS BIGINT) AS n FROM sh),
       |ex AS (SELECT doc_id, unnest(shingles) AS shingle FROM sh),
       |pairs AS (
       |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
       |  FROM ex a JOIN ex b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2)
       |SELECT doc_a, doc_b, inter,
       |  CAST(inter AS DOUBLE) / (ca.n + cb.n - inter) AS jaccard
       |FROM pairs
       |JOIN cnt ca ON doc_a = ca.doc_id
       |JOIN cnt cb ON doc_b = cb.doc_id
       |WHERE CAST(inter AS DOUBLE) / (ca.n + cb.n - inter) >= $JaccardTau
       |ORDER BY doc_a, doc_b""".stripMargin

  /** #27 — MinHash + banded LSH (rows-only gate: seeded xxhash64 has no
    * DuckDB equivalent). k=64 signature = per-doc min of
    * xxhash64(seed_i, shingle) — computed as ONE partial-aggregable
    * groupBy over the exploded shingles (map-side combine; no per-pair
    * work). 16 bands × 4 rows: docs sharing any band bucket become
    * candidates; candidates only are verified with exact Jaccard via
    * array_intersect of the two (small) shingle sets. At 100 TB the
    * band-bucket join is the sole pair-producing shuffle and its
    * fan-out is bounded by bucket occupancy, not corpus size.
    */
  def qDedupMinhashLsh(spark: SparkSession, dir: String): DataFrame = {
    val K = 64; val Bands = 16; val RowsPerBand = K / Bands
    val hashAggs = (0 until K).map(i =>
      min(xxhash64(lit(i), col("shingle"))).as(s"h$i"))
    val sigs = shingleExploded(spark, dir)
      .groupBy("doc_id").agg(hashAggs.head, hashAggs.tail: _*)
      .withColumn("sig", array((0 until K).map(i => col(s"h$i")): _*))
    val bandCols = (0 until Bands).map { j =>
      xxhash64((0 until RowsPerBand).map(r => col(s"h${j * RowsPerBand + r}")): _*)
    }
    val bands = sigs
      .select(col("doc_id"), col("sig"),
        posexplode(array(bandCols: _*)).as(Seq("band", "bucket")))
    // est_jaccard is computed inline on the band join (signatures never
    // survive a shuffle); only (pair, est) reaches the distinct.
    val cand = bands.select(col("doc_id").as("doc_a"), col("sig").as("sig_a"),
        col("band"), col("bucket"))
      .join(bands.select(col("doc_id").as("doc_b"), col("sig").as("sig_b"),
        col("band"), col("bucket")), Seq("band", "bucket"))
      .where(col("doc_a") < col("doc_b"))
      .withColumn("est_jaccard",
        size(filter(zip_with(col("sig_a"), col("sig_b"), (x, y) => x === y),
          b => b)).cast("double") / K)
      .select("doc_a", "doc_b", "est_jaccard").distinct()
    val sets = shingleSets(spark, dir)
    cand
      .join(sets.select(col("doc_id").as("doc_a"), col("shingles").as("sh_a"),
        col("n_shingles").as("na")), "doc_a")
      .join(sets.select(col("doc_id").as("doc_b"), col("shingles").as("sh_b"),
        col("n_shingles").as("nb")), "doc_b")
      .withColumn("inter", size(array_intersect(col("sh_a"), col("sh_b"))).cast("long"))
      .withColumn("jaccard",
        col("inter").cast("double") / (col("na") + col("nb") - col("inter")))
      .where(col("jaccard") >= JaccardTau)
      .select("doc_a", "doc_b", "est_jaccard", "jaccard")
      .orderBy("doc_a", "doc_b")
  }

  /** #28 — 64-bit SimHash (rows-only gate). Per-token xxhash64; bit i
    * of the signature = sign of Σ(±1) over tokens (token multiplicity
    * weighted). Candidate generation by the pigeonhole split of the 64
    * bits into 4 × 16-bit chunks: any pair within Hamming distance 3
    * shares at least one chunk verbatim, so the chunk-equality join has
    * perfect recall at radius 3. Verification = bit_count(XOR) ≤ 3 on
    * candidates only.
    */
  def qDedupSimhash(spark: SparkSession, dir: String): DataFrame = {
    val HammingMax = 3
    val bitAggs = (0 until 64).map(i =>
      sum(when(col("h").bitwiseAND(lit(1L << i)) =!= 0, 1).otherwise(-1)).as(s"b$i"))
    val sim = Tables.documents(spark, dir)
      .select(col("doc_id"),
        explode(expr("filter(split(text, ' '), t -> t <> '')")).as("token"))
      .withColumn("h", xxhash64(col("token")))
      .groupBy("doc_id").agg(bitAggs.head, bitAggs.tail: _*)
      .withColumn("simhash",
        (0 until 64).map(i => when(col(s"b$i") > 0, lit(1L << i)).otherwise(lit(0L)))
          .reduce((a, b) => a.bitwiseOR(b)))
      .select("doc_id", "simhash")
    val chunkCols = (0 until 4).map(j =>
      shiftrightunsigned(col("simhash"), 16 * j).bitwiseAND(lit(0xFFFFL)))
    val chunks = sim.select(col("doc_id"), col("simhash"),
      posexplode(array(chunkCols: _*)).as(Seq("chunk_idx", "chunk_val")))
    chunks.select(col("doc_id").as("doc_a"), col("simhash").as("sim_a"),
        col("chunk_idx"), col("chunk_val"))
      .join(chunks.select(col("doc_id").as("doc_b"), col("simhash").as("sim_b"),
        col("chunk_idx"), col("chunk_val")), Seq("chunk_idx", "chunk_val"))
      .where(col("doc_a") < col("doc_b"))
      .groupBy("doc_a", "doc_b")
      .agg(first(col("sim_a")).as("sim_a"), first(col("sim_b")).as("sim_b"))
      .withColumn("hamming", bit_count(col("sim_a").bitwiseXOR(col("sim_b"))))
      .where(col("hamming") <= HammingMax)
      .select("doc_a", "doc_b", "hamming")
      .orderBy("doc_a", "doc_b")
  }
}
