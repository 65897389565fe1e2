package graft.api

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The user-facing DataFrame-in / DataFrame-out surface of the engine.
  *
  * The gated queries in [[graft.SparkEntry]] bind these semantics to
  * the test star schema for the correctness harness; this facade
  * exposes the same operators over ARBITRARY frames, so a user of the
  * reference warehouse can point them at their own tables. Each method
  * documents its shuffle budget; `GraftApiSpec` pins each one to the
  * corresponding gated query's output on the test tables, so the two
  * surfaces cannot drift apart.
  *
  * All heavy lifting is declarative DataFrame code — Catalyst sees
  * through the facade exactly as it sees the gated queries (pushdown,
  * AQE join selection, whole-stage codegen all apply unchanged).
  */
object Graft {

  /** Exact content dedup: one row per input row with its content
    * fingerprint, canonical id (min id per fingerprint group), group
    * size, and dup flag. One shuffle on the fingerprint.
    *
    * `fingerprint` defaults to md5 of space-normalized lowercased
    * `textCol` — pass your own Column to change content identity.
    */
  def exactDedup(docs: DataFrame, idCol: String, textCol: String,
      fingerprint: Option[Column] = None): DataFrame = {
    val fp = fingerprint.getOrElse(
      md5(trim(regexp_replace(lower(col(textCol)), " +", " "))))
    val w = Window.partitionBy("fp")
    docs.select(col(idCol).as("id"), fp.as("fp"))
      .withColumn("canonical_id", min("id").over(w))
      .withColumn("group_size", count(lit(1)).over(w))
      .withColumn("is_dup", col("id") =!= col("canonical_id"))
  }

  /** Near-duplicate pairs by word-n-gram Jaccard: candidates share at
    * least one (df-capped) shingle; exact Jaccard ≥ tau on candidates
    * only. Two corpus-scale shuffles (shingle-hash candidate join,
    * pair aggregate). `dfCap` bounds per-shingle pair fan-out at
    * dfCap² — set it on corpora with boilerplate (docs/SCALING.md
    * probe 3); `Int.MaxValue` disables it.
    */
  def ngramJaccardPairs(docs: DataFrame, idCol: String, textCol: String,
      n: Int = 3, tau: Double = 0.8, dfCap: Int = Int.MaxValue): DataFrame = {
    graft.functions.WordShingles.register(docs.sparkSession)
    val sets = docs
      .select(col(idCol).as("id"),
        expr(s"word_shingles($textCol, $n)").as("shingles"))
      .persist()
    val ex0 = sets.select(col("id"), explode(col("shingles")).as("shingle"))
      .select(col("id"), xxhash64(col("shingle")).as("shingle"))
    val ex =
      if (dfCap == Int.MaxValue) ex0
      else {
        val rare = ex0.groupBy("shingle").agg(count(lit(1)).as("df"))
          .where(col("df") <= dfCap).select("shingle")
        ex0.join(rare, "shingle").persist()
      }
    val cnt = ex.groupBy("id").agg(count(lit(1)).as("n"))
    val a = ex.select(col("id").as("id_a"), col("shingle"))
    val b = ex.select(col("id").as("id_b"), col("shingle"))
    a.join(b, "shingle")
      .where(col("id_a") < col("id_b"))
      .groupBy("id_a", "id_b").agg(count(lit(1)).as("inter"))
      .join(cnt.select(col("id").as("id_a"), col("n").as("na")), "id_a")
      .join(cnt.select(col("id").as("id_b"), col("n").as("nb")), "id_b")
      .withColumn("jaccard",
        col("inter").cast("double") / (col("na") + col("nb") - col("inter")))
      .where(col("jaccard") >= tau)
      .select("id_a", "id_b", "inter", "jaccard")
  }

  /** Connected components over an undirected edge list: every vertex
    * appearing in `edges` labeled with its component's min vertex id
    * and component size. Iterative min-label propagation — EAGER (like
    * an MLlib fit): rounds = component diameter, one join + one
    * aggregate per round, loud failure at the round cap.
    */
  def connectedComponents(edges: DataFrame, srcCol: String, dstCol: String,
      maxRounds: Int = 64): DataFrame = {
    val sym = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .unionAll(edges.select(col(dstCol).as("src"), col(srcCol).as("dst")))
      .persist()
    var labels = sym.select(col("src").as("v")).distinct()
      .select(col("v"), col("v").as("label"))
      .persist()
    def labelSum(df: DataFrame): BigDecimal = {
      val r = df.agg(sum(col("label").cast("decimal(38,0)"))).collect()(0)
      if (r.isNullAt(0)) BigDecimal(0) else BigDecimal(r.getDecimal(0))
    }
    var total = labelSum(labels)
    var changed = true
    var rounds = 0
    while (changed && rounds < maxRounds) {
      val nbrMin = sym.join(labels, sym("dst") === labels("v"))
        .groupBy("src").agg(min("label").as("nbr_label"))
      val next = labels.join(nbrMin, labels("v") === nbrMin("src"), "left")
        .select(labels("v"),
          least(col("label"), coalesce(col("nbr_label"), col("label"))).as("label"))
        .persist()
      val newTotal = labelSum(next)
      changed = newTotal < total
      total = newTotal
      labels.unpersist()
      labels = next
      rounds += 1
    }
    if (changed) throw new IllegalStateException(
      s"connectedComponents did not converge after $rounds rounds")
    val finalLabels = labels.localCheckpoint(true)
    labels.unpersist()
    sym.unpersist()
    finalLabels
      .withColumn("component_size", count(lit(1)).over(Window.partitionBy("label")))
      .select(col("v").as("id"), col("label").as("component_id"),
        col("component_size"))
  }

  /** As-of join via the union trick: each `left` row gains the columns
    * of the latest `right` row with the same key at-or-before its
    * time (NULLs when none). Zero joins in the plan; shuffles move
    * each input once (tie-break window on (key, rightTime), as-of
    * window on key). `rightCols` are the right-side columns to carry
    * (they must not collide with left's column names).
    */
  def asofJoin(left: DataFrame, right: DataFrame, keyCol: String,
      leftTimeCol: String, rightTimeCol: String,
      rightCols: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    // one right row per (key, time): keep the last by the carried
    // columns' struct order — ties are otherwise nondeterministic
    val r = right
      .withColumn("_rn", row_number().over(
        Window.partitionBy(keyCol, rightTimeCol)
          .orderBy(struct(rightCols.map(col): _*).desc)))
      .filter(col("_rn") === 1).drop("_rn")
    val tagged = r.select(
        Seq(col(keyCol).as("_k"), col(rightTimeCol).as("_t"), lit(0).as("_tag")) ++
          rightCols.map(c => col(c).as(s"_r_$c")) ++
          leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(c)): _*)
      .unionByName(left.select(
        Seq(col(keyCol).as("_k"), col(leftTimeCol).as("_t"), lit(1).as("_tag")) ++
          rightCols.map(c => lit(null).cast(r.schema(c).dataType).as(s"_r_$c")) ++
          leftCols.map(col): _*))
    val w = Window.partitionBy("_k").orderBy("_t", "_tag")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = rightCols.foldLeft(tagged) { (df, c) =>
      df.withColumn(c, last(s"_r_$c", ignoreNulls = true).over(w))
    }
    carried.filter(col("_tag") === 1)
      .select((leftCols ++ rightCols).map(col): _*)
  }

  /** Gap-based sessionization: rows keyed by `keyCol`, ordered by the
    * epoch-time column; a gap > `gapUs` starts a new session. One
    * shuffle on the key (both window passes share it).
    */
  def sessionize(events: DataFrame, keyCol: String, tsUsCol: String,
      gapUs: Long): DataFrame = {
    val w = Window.partitionBy(keyCol).orderBy(tsUsCol)
    events
      .withColumn("_prev", lag(tsUsCol, 1).over(w))
      .withColumn("_new",
        when(col("_prev").isNull || col(tsUsCol) - col("_prev") > gapUs, 1L)
          .otherwise(0L))
      .withColumn("session_seq", sum("_new").over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col(keyCol), col("session_seq"))
      .agg(
        min(tsUsCol).as("session_start_us"),
        count(lit(1)).as("n_events"),
        (max(tsUsCol) - min(tsUsCol)).as("duration_us"))
  }

  /** Top-k rows per group by `orderBy` columns (descending-first order
    * is the caller's via the Columns). Plans with WindowGroupLimit:
    * each map task keeps its local top-k before the exchange.
    */
  def topKPerGroup(df: DataFrame, k: Int, groupCols: Seq[String],
      orderCols: Seq[Column]): DataFrame =
    df.withColumn("rank", row_number().over(
        Window.partitionBy(groupCols.map(col): _*).orderBy(orderCols: _*)).cast("long"))
      .where(col("rank") <= k)

  /** Salted exact count-distinct per key (see
    * [[graft.operators.Stats.distinctPerKeySalted]]). */
  def saltedDistinct(df: DataFrame, keyCol: String, idCol: String,
      salts: Int): DataFrame =
    graft.operators.Stats.distinctPerKeySalted(df, keyCol, idCol, salts)
}
