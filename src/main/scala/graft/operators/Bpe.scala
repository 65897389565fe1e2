package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** #171 — a REAL subword tokenizer as a gated operator: byte-pair
  * encoding (Sennrich, Haddow & Birch 2016, "Neural Machine
  * Translation of Rare Words with Subword Units") learned FROM THE
  * CORPUS deterministically and replayed as a greedy rank-order
  * encode — replacing the "BPE-ish regex" stand-in (#34/#148) with
  * what a training pipeline actually measures: merge tables, subword
  * token counts, per-doc fertility. (The reference's tokenization —
  * KeywordUtil.java:20-40 — is word-grain IK analysis; subword BPE is
  * the LLM-era counterpart this engine's curation operators need.)
  *
  * Determinism contract (what makes this ORACLE-CHECKABLE in DuckDB,
  * unlike every published BPE implementation): the whole algorithm is
  * stated over PADDED SEGMENTATION STRINGS — a word's symbols joined
  * by single spaces with a leading/trailing space — and one merge
  * application = literal string replace of " a b " by " ab ", run
  * TWICE. Both engines have the identical left-to-right
  * non-overlapping `replace`, and the double pass reaches the
  * merge-all fixpoint: pass one can only skip an occurrence whose
  * leading space was consumed by the match before it, such skipped
  * occurrences are never adjacent to each other, and merging (a,b)
  * can never CREATE a new " a b " occurrence (the merged symbol `ab`
  * ≠ `b` and never ends in " a"), so pass two catches exactly the
  * skipped ones. Pair counting is every adjacent symbol position
  * (Sennrich's statistic); the argmax tie-break is (count desc, left
  * asc, right asc) over ASCII — identical under Java string order
  * and DuckDB binary collation.
  *
  * Learning corpus: the top-[[Vocab]] most frequent lowercase-alpha
  * words (freq desc, word asc — deterministic), the standard
  * bounded-sample BPE recipe (nobody fits merges on 100 TB; the
  * vocab table is the sample). Words = split on single space after
  * lower(); only `^[a-z]+$` words enter (keeps the symbol alphabet
  * disjoint from the space separator and the learning signal clean —
  * the same normalization gate both engines state identically).
  *
  * Scale shape: learning = ONE word-frequency aggregate (map-side
  * combined, corpus-sized shuffle of tiny (word, count) pairs) + a
  * driver loop over ≤ [[Vocab]] collected rows (k-bounded collect,
  * the kmeansCentroids convention) costing O(Vocab × Merges) string
  * ops; encoding = MAP-ONLY — the merge list broadcasts as one array
  * literal and every doc folds it over its words inside whole-stage
  * codegen. No join, no second shuffle, nothing corpus-sized leaves
  * its partition. At 100 TB raise Vocab/Merges and (optionally) fit
  * on a hash-sample of documents; the encode side is unchanged.
  */
object Bpe {

  /** Merge-table size. 64 is sized for the gate corpora (oracle
    * replays all of them as unrolled SQL stages); production vocabs
    * use thousands — the dial rises, the algorithm does not change. */
  val Merges = 64

  /** Learning vocabulary: top-V words by (freq desc, word asc). */
  val Vocab = 512

  private[graft] def segInit(w: String): String =
    w.toCharArray.mkString(" ", " ", " ")

  private def applyMerge(seg: String, a: String, b: String): String = {
    val p = s" $a $b "
    val r = s" $a$b "
    seg.replace(p, r).replace(p, r)
  }

  /** The driver-side fit over a collected (word, freq) table: at most
    * `n` merges, each the (count desc, pair asc) argmax of adjacent
    * symbol pair frequencies, applied by the shared replace rule.
    * Pure function — the spec replays it against hand-computed
    * merges and the DuckDB unrolled twin replays it in SQL.
    *
    * Since r15 this is the INCREMENTAL structure the original BPE
    * implementation uses (Sennrich et al. 2016 — SCALING probe 28's
    * named upgrade path): a pair→count map kept consistent by DELTA
    * updates of only the words a merge touched (a pair→word-set index
    * says which), with the (count desc, pair asc) argmax served by an
    * ordered set instead of a full recount-and-scan per round. Each
    * word's new segmentation still comes from the SAME [[applyMerge]]
    * double-replace rule, so the learned table is bit-identical to
    * the naive recount fit ([[learnMergesNaive]], kept as the spec's
    * reference implementation and pinned equal on real and
    * adversarial vocabularies). O((V·len + merges·touched)·log)
    * instead of O(merges·V·len).
    */
  private[graft] def learnMerges(vocab: Seq[(String, Long)],
      n: Int): Seq[(String, String)] = {
    import scala.collection.mutable
    val segs = mutable.ArrayBuffer.from(vocab.map { case (w, _) => segInit(w) })
    val freqs = vocab.map(_._2).toArray
    // adjacent-pair multiset of one segmentation (unweighted)
    def pairsOf(seg: String): mutable.HashMap[(String, String), Long] = {
      val m = mutable.HashMap.empty[(String, String), Long]
      val syms = seg.split(" ").filter(_.nonEmpty)
      var i = 0
      while (i < syms.length - 1) {
        val k = (syms(i), syms(i + 1))
        m.update(k, m.getOrElse(k, 0L) + 1L)
        i += 1
      }
      m
    }
    val counts = mutable.HashMap.empty[(String, String), Long]
    val occ = mutable.HashMap.empty[(String, String), mutable.Set[Int]]
    // the argmax order: count DESC, then pair ASC — exactly the naive
    // fit's minBy((-c, a, b)) tie-break
    implicit val ord: Ordering[(Long, String, String)] =
      Ordering.Tuple3(Ordering.Long.reverse, Ordering.String, Ordering.String)
    val sorted = mutable.TreeSet.empty[(Long, String, String)]
    // counts + the ordered set move together; occ is maintained at the
    // call sites (membership is about the word's CURRENT segmentation,
    // not the sign of a delta)
    def bump(k: (String, String), delta: Long): Unit = {
      val old = counts.getOrElse(k, 0L)
      val nw = old + delta
      if (old != 0L) sorted.remove((old, k._1, k._2))
      if (nw != 0L) { counts.update(k, nw); sorted.add((nw, k._1, k._2)) }
      else counts.remove(k)
    }
    def occAdd(k: (String, String), w: Int): Unit =
      occ.getOrElseUpdate(k, mutable.Set.empty[Int]).add(w)
    // index build: one pass over the initial segmentations
    var w = 0
    while (w < segs.length) {
      pairsOf(segs(w)).foreach { case (k, c) =>
        bump(k, c * freqs(w)); occAdd(k, w)
      }
      w += 1
    }
    val merges = mutable.ArrayBuffer.empty[(String, String)]
    while (merges.size < n && sorted.nonEmpty) {
      val (_, a, b) = sorted.head
      val best = (a, b)
      merges += best
      val affected = occ.getOrElse(best, mutable.Set.empty[Int]).toArray
      affected.foreach { w =>
        val before = pairsOf(segs(w))
        val newSeg = applyMerge(segs(w), a, b)
        segs(w) = newSeg
        val after = pairsOf(newSeg)
        (before.keySet ++ after.keySet).foreach { k =>
          val d = after.getOrElse(k, 0L) - before.getOrElse(k, 0L)
          if (d != 0L) bump(k, d * freqs(w))
          if (after.contains(k)) occAdd(k, w)
          else occ.get(k).foreach(_.remove(w))
        }
      }
      // the merged pair must be fully consumed by its own merge — the
      // double-replace fixpoint guarantees no " a b " survives. A plain
      // assert is elided under -Xdisable-assertions, which would let a
      // counts/occ inconsistency silently corrupt the merge table;
      // this invariant must fail loudly in every build (ADVICE r15)
      if (counts.contains(best))
        throw new IllegalStateException(
          s"merge $best left residual occurrences — applyMerge fixpoint broken")
      occ.remove(best)
    }
    merges.toSeq
  }

  /** The straightforward recount-every-round fit — the REFERENCE
    * implementation [[learnMerges]] is spec-pinned against (BpeSpec
    * proves bit-equality on the gate vocab, a 5 k synthetic Zipf
    * vocab, and the overlap/tie traps). Kept because the incremental
    * structure's correctness argument IS "equal to this".
    */
  private[graft] def learnMergesNaive(vocab: Seq[(String, Long)],
      n: Int): Seq[(String, String)] = {
    var segs = vocab.map { case (w, f) => (segInit(w), f) }
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var exhausted = false
    while (merges.size < n && !exhausted) {
      val counts = scala.collection.mutable.HashMap.empty[(String, String), Long]
      segs.foreach { case (s, f) =>
        val syms = s.split(" ").filter(_.nonEmpty)
        var i = 0
        while (i < syms.length - 1) {
          val k = (syms(i), syms(i + 1))
          counts.update(k, counts.getOrElse(k, 0L) + f)
          i += 1
        }
      }
      if (counts.isEmpty) exhausted = true
      else {
        val best = counts.minBy { case ((a, b), c) => (-c, a, b) }._1
        merges += best
        segs = segs.map { case (s, f) =>
          (applyMerge(s, best._1, best._2), f)
        }
      }
    }
    merges.toSeq
  }

  /** The learning-word normalization, shared by fit and encode (one
    * definition — the merge table and the encoded stream can never
    * disagree about what a word is). Anchors are ABSOLUTE (`\A`/`\z`)
    * because Java's `$` matches before a trailing newline — a word
    * like `"thirteen\n"` would pass `^[a-z]+$` here but fail DuckDB's
    * RE2 full match, skewing the learned merge table corpus-wide
    * (caught by the nasty-corpus parity probe).
    */
  private def alphaWords(textCol: Column): Column =
    filter(split(lower(textCol), " "), w => w.rlike("\\A[a-z]+\\z"))

  /** Fit the merge table from a corpus directory's documents table.
    * Eager like an MLlib fit (one aggregate job + a Vocab-bounded
    * collect); call it index-build-time, not per row.
    */
  def learnFromCorpus(spark: SparkSession, dir: String): Seq[(String, String)] =
    learnFromWords(Tables.documents(spark, dir))

  /** The fit over any frame with a `text` column. `vocab`/`merges`
    * are the production dials (r19 verdict item 4): the fit's pair
    * statistics are weighted by EXACT word frequencies, so the only
    * bias the vocab cap can introduce is the tail mass below rank
    * `vocab` — on the gate corpora the cap is vacuous (31 distinct
    * words), and probe 42 measures the bias on a rich Zipf
    * vocabulary (bench_evidence/probe42_bpe_vocab_bias.log). The cap
    * exists because the dictionary collects to the driver loop
    * (probe 28 priced that loop to V=50k/M=2000); past tens of
    * millions of distinct words, pre-filter the dictionary by a
    * frequency floor instead of a rank cap.
    */
  def learnFromWords(docs: DataFrame, vocab: Int = Vocab,
      merges: Int = Merges): Seq[(String, String)] = {
    val voc = docs.where(col("text").isNotNull)
      .select(explode(alphaWords(col("text"))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("freq"))
      .orderBy(col("freq").desc, col("w")).limit(vocab)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    learnMerges(voc, merges)
  }

  /** Greedy rank-order BPE token count of one word column, as a pure
    * codegen'd fold: the merge list rides along as ONE array literal
    * (constant-folded — never rebuilt per row) of
    * `"<pat>\t<rep>"` elements, each applied by the shared
    * double-replace rule.
    */
  private def encodeCount(w: Column, merges: Seq[(String, String)]): Column = {
    val mlits = typedLit(merges.map { case (a, b) => s" $a $b \t $a$b " })
    val init = concat(lit(" "),
      array_join(filter(split(w, ""), c => c =!= ""), " "), lit(" "))
    val folded = aggregate(mlits, init, (acc, m) => {
      val p = substring_index(m, "\t", 1)
      val r = substring_index(m, "\t", -1)
      replace(replace(acc, p, r), p, r)
    })
    size(filter(split(folded, " "), s => s =!= ""))
  }

  /** Per-doc BPE readout over any documents frame:
    * `(doc_id, alpha_words, bpe_tokens, fertility)` — fertility =
    * subword tokens per word, the per-doc form of the #148 dashboard
    * measured with a REAL tokenizer. NULL-text docs are excluded (the
    * chunking-family dirty-record rule); a doc with no alpha words
    * stays visible with 0 counts and NULL fertility.
    *
    * Plan shape — encode the DICTIONARY, not the stream: the fold is
    * 2×[[Merges]] string replaces per input, so running it per word
    * OCCURRENCE multiplies the work by the corpus' repetition factor
    * (measured 15.3 s → 0.9 s at sf0.1, where 270 k occurrences
    * collapse to 31 distinct words — and a real corpus still
    * collapses ~1000×). Stages: explode → (doc, word) counts (ONE
    * map-side-combined exchange of tiny pairs) → word-grain dictionary
    * (contracted again; also FEEDS the fit, so the corpus is scanned
    * once for both learning and encoding) → encode the dictionary →
    * join the counts back (dictionary-sized build side — AQE
    * broadcasts it when small) → doc-grain integer fold. Nothing
    * corpus-sized is ever encoded or re-shuffled.
    */
  def bpeTokenize(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", vocab: Int = Vocab,
      nMerges: Int = Merges): DataFrame = {
    val base = docs.where(col(textCol).isNotNull)
    val dw = base
      .select(col(idCol).as("doc_id"), explode(alphaWords(col(textCol))).as("w"))
      .groupBy("doc_id", "w").agg(count(lit(1)).as("cnt"))
      // staging frame consumed twice (dictionary + join-back); bench
      // reps clearCache() between runs so each timing refills it
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val dict = dw.groupBy("w").agg(sum("cnt").as("freq"))
    val voc = dict.orderBy(col("freq").desc, col("w")).limit(vocab)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val merges = learnMerges(voc, nMerges)
    val dictTok = dict.select(col("w"),
      encodeCount(col("w"), merges).cast("long").as("tok"))
    val perDoc = dw.join(dictTok, "w")
      .groupBy("doc_id")
      .agg(sum("cnt").as("aw"),
        sum(col("cnt") * col("tok")).as("bt"))
    // the per-doc READOUT needs a usable id (the join-back key); a
    // null-id doc still contributes its words to the dictionary and
    // the fit above, but has no per-doc row — stated identically in
    // the oracle. Ids must be UNIQUE (the packAssign contract): a
    // duplicated id would fan the summed counts out to every copy.
    base.where(col(idCol).isNotNull)
      .select(col(idCol).as("doc_id"))
      .join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("aw"), lit(0L)).as("alpha_words"),
        coalesce(col("bt"), lit(0L)).as("bpe_tokens"))
      .withColumn("fertility",
        when(col("alpha_words") === 0, lit(null).cast("double"))
          .otherwise(col("bpe_tokens").cast("double") / col("alpha_words")))
  }

  /** #171 — `q_bpe_tokenize`: fit [[Merges]] merges on the corpus'
    * top-[[Vocab]] words, then encode every document.
    */
  def qBpeTokenize(spark: SparkSession, dir: String): DataFrame =
    bpeTokenize(Tables.documents(spark, dir))
      .orderBy("doc_id")

  /** The #148 dashboard's totals at (lang, source) grain, measured
    * with a FROZEN merge table — the per-batch partial the streaming
    * twin ([[graft.streaming.Streams.bpeFertilitySink]]) lands:
    * `(lang, source, docs, alpha_words, bpe_tokens)`, all integers,
    * ADDITIVE under any corpus split (merges are frozen inputs, so
    * nothing depends on arrival order — the #128/#156 histogram
    * rule). Encode rides the per-slice word DICTIONARY exactly like
    * [[bpeTokenize]]; `docs` counts every non-null-text row of the
    * stratum.
    */
  private[graft] def bpeFertilityTotals(df: DataFrame,
      merges: Seq[(String, String)]): DataFrame = {
    val base = df.where(col("text").isNotNull)
    val dw = base
      .select(col("lang"), col("source"),
        explode(alphaWords(col("text"))).as("w"))
      .groupBy("lang", "source", "w").agg(count(lit(1)).as("cnt"))
    val dictTok = dw.select("w").distinct()
      .select(col("w"), encodeCount(col("w"), merges).cast("long").as("tok"))
    val wordSide = dw.join(dictTok, "w")
      .groupBy("lang", "source")
      .agg(sum("cnt").as("aw"), sum(col("cnt") * col("tok")).as("bt"))
    base.groupBy("lang", "source").agg(count(lit(1)).as("docs"))
      .join(wordSide, Seq("lang", "source"), "left")
      .select(col("lang"), col("source"), col("docs"),
        coalesce(col("aw"), lit(0L)).as("alpha_words"),
        coalesce(col("bt"), lit(0L)).as("bpe_tokens"))
  }

  /** The ratio tail over (possibly folded) totals — shared by the
    * batch readout and the streaming fold so they cannot drift. */
  private[graft] def bpeFertilityFromTotals(totals: DataFrame): DataFrame =
    totals.select(col("lang"), col("source"), col("docs"),
      col("alpha_words"), col("bpe_tokens"),
      when(col("alpha_words") === 0, lit(null).cast("double"))
        .otherwise(col("bpe_tokens").cast("double") / col("alpha_words"))
        .as("fertility"))

  /** #172 — `q_bpe_vocab`: the fitted MERGE TABLE itself as a gated
    * query — `(rank, left, right, merged)`, the artifact a tokenizer
    * ships (merges.txt in every BPE distribution) and the thing a
    * reviewer audits when token counts look wrong. Hash-gating it
    * pins the FIT (tie-breaks, weighting, the double-replace rule)
    * independently of the encode: #171 could mask a fit bug with a
    * compensating encode bug; this cannot. Same one-scan fit as
    * #171; output is [[Merges]] rows.
    */
  def qBpeVocab(spark: SparkSession, dir: String): DataFrame = {
    val merges = learnFromCorpus(spark, dir)
    val spark2 = spark
    import spark2.implicits._
    merges.zipWithIndex
      .map { case ((a, b), r) => (r.toLong, a, b, a + b) }
      .toDF("rank", "left", "right", "merged")
      .orderBy("rank")
  }

  /** SQL twin of #172 — the same unrolled learning stages as #171's
    * oracle, reading out the merge rows instead of encoding. */
  val qBpeVocabSql: String = {
    val stages = (0 until Merges).map { i =>
      s"""pc$i AS MATERIALIZED (
         |  SELECT z[1] AS a, z[2] AS b, sum(freq) AS c
         |  FROM (SELECT freq, unnest(list_zip(l, l[2:])) AS z
         |        FROM (SELECT freq, list_filter(string_split(seg, ' '), s -> s <> '') AS l
         |              FROM s$i))
         |  WHERE z[2] IS NOT NULL GROUP BY 1, 2),
         |b$i AS MATERIALIZED (SELECT a, b FROM pc$i ORDER BY c DESC, a, b LIMIT 1),
         |s${i + 1} AS MATERIALIZED (
         |  SELECT w, freq, replace(replace(seg,
         |    coalesce((SELECT ' ' || a || ' ' || b || ' ' FROM b$i), chr(1)),
         |    coalesce((SELECT ' ' || a || b || ' ' FROM b$i), chr(1))),
         |    coalesce((SELECT ' ' || a || ' ' || b || ' ' FROM b$i), chr(1)),
         |    coalesce((SELECT ' ' || a || b || ' ' FROM b$i), chr(1))) AS seg
         |  FROM s$i)""".stripMargin
    }
    val mergeRows = (0 until Merges)
      .map(i => s"SELECT $i AS r, a, b FROM b$i").mkString(" UNION ALL ")
    s"""WITH w0 AS (
       |  SELECT w, CAST(count(*) AS BIGINT) AS freq FROM (
       |    SELECT unnest(list_filter(string_split(lower(text), ' '),
       |      x -> regexp_full_match(x, '[a-z]+'))) AS w
       |    FROM documents WHERE text IS NOT NULL)
       |  GROUP BY 1),
       |v AS (SELECT w, freq FROM w0 ORDER BY freq DESC, w LIMIT $Vocab),
       |s0 AS MATERIALIZED (SELECT w, freq,
       |  ' ' || array_to_string(string_split(w, ''), ' ') || ' ' AS seg FROM v),
       |${stages.mkString(",\n")}
       |SELECT CAST(r AS BIGINT) AS rank, a AS "left", b AS "right",
       |  a || b AS merged
       |FROM ($mergeRows) ORDER BY rank""".stripMargin
  }

  /** SQL twin of #171: the learning loop UNROLLED as [[Merges]]
    * materialized CTE stages (pair-count → argmax → double-replace),
    * then the same fold per document — DuckDB replays the ENTIRE
    * fit+encode, not just the encode, so the merge table itself is
    * oracle-checked. `MATERIALIZED` is load-bearing: each stage
    * references its predecessor five times, and inlining would blow
    * the expression tree up 5^Merges-fold.
    */
  val qBpeTokenizeSql: String = {
    val stages = (0 until Merges).map { i =>
      s"""pc$i AS MATERIALIZED (
         |  SELECT z[1] AS a, z[2] AS b, sum(freq) AS c
         |  FROM (SELECT freq, unnest(list_zip(l, l[2:])) AS z
         |        FROM (SELECT freq, list_filter(string_split(seg, ' '), s -> s <> '') AS l
         |              FROM s$i))
         |  WHERE z[2] IS NOT NULL GROUP BY 1, 2),
         |b$i AS MATERIALIZED (SELECT a, b FROM pc$i ORDER BY c DESC, a, b LIMIT 1),
         |s${i + 1} AS MATERIALIZED (
         |  SELECT w, freq, replace(replace(seg,
         |    coalesce((SELECT ' ' || a || ' ' || b || ' ' FROM b$i), chr(1)),
         |    coalesce((SELECT ' ' || a || b || ' ' FROM b$i), chr(1))),
         |    coalesce((SELECT ' ' || a || ' ' || b || ' ' FROM b$i), chr(1)),
         |    coalesce((SELECT ' ' || a || b || ' ' FROM b$i), chr(1))) AS seg
         |  FROM s$i)""".stripMargin
    }
    val mergeRows = (0 until Merges)
      .map(i => s"SELECT $i AS r, a, b FROM b$i").mkString(" UNION ALL ")
    s"""WITH w0 AS (
       |  SELECT w, CAST(count(*) AS BIGINT) AS freq FROM (
       |    SELECT unnest(list_filter(string_split(lower(text), ' '),
       |      x -> regexp_full_match(x, '[a-z]+'))) AS w
       |    FROM documents WHERE text IS NOT NULL)
       |  GROUP BY 1),
       |v AS (SELECT w, freq FROM w0 ORDER BY freq DESC, w LIMIT $Vocab),
       |s0 AS MATERIALIZED (SELECT w, freq,
       |  ' ' || array_to_string(string_split(w, ''), ' ') || ' ' AS seg FROM v),
       |${stages.mkString(",\n")},
       |mlist AS (
       |  SELECT coalesce(list((' ' || a || ' ' || b || ' ') || chr(9) || (' ' || a || b || ' ')
       |    ORDER BY r), []) AS ml FROM ($mergeRows)),
       |docw AS (
       |  SELECT doc_id, list_filter(string_split(lower(text), ' '),
       |    x -> regexp_full_match(x, '[a-z]+')) AS ws, ml
       |  FROM documents CROSS JOIN mlist
       |  WHERE text IS NOT NULL AND doc_id IS NOT NULL),
       |enc AS (
       |  SELECT doc_id, CAST(len(ws) AS BIGINT) AS alpha_words,
       |    CAST(coalesce(list_sum(list_transform(ws, w ->
       |      len(list_filter(string_split(
       |        list_reduce(
       |          list_prepend(' ' || array_to_string(string_split(w, ''), ' ') || ' ', ml),
       |          (acc, m) -> replace(replace(acc,
       |            split_part(m, chr(9), 1), split_part(m, chr(9), 2)),
       |            split_part(m, chr(9), 1), split_part(m, chr(9), 2))),
       |        ' '), s -> s <> '')))), 0) AS BIGINT) AS bpe_tokens
       |  FROM docw)
       |SELECT doc_id, alpha_words, bpe_tokens,
       |  CAST(bpe_tokens AS DOUBLE) / nullif(alpha_words, 0) AS fertility
       |FROM enc ORDER BY doc_id""".stripMargin
  }
}
