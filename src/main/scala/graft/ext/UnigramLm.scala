package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unigram-LM (SentencePiece-style) tokenizer induction — the second
  * tokenizer family production pipelines train (Kudo 2018,
  * arXiv:1804.10959), next to [[Bpe]]. Hard-EM variant: the E-step is
  * VITERBI segmentation (each word takes its single best segmentation
  * under the current piece log-probabilities) and the M-step counts
  * piece usage; pruning drops the least-used pieces per round. Kudo's
  * full recipe uses forward-backward expected counts and a
  * likelihood-drop prune — the hard-EM/usage-prune simplification is
  * the widely-used deterministic variant (it is what most from-scratch
  * reimplementations ship) and keeps every quantity an exact
  * frequency-weighted integer count, so the fit is bit-reproducible
  * under any partitioning (UnigramLmSpec pins it against an
  * independent pure-Scala reference).
  *
  * Distribution shape (mirrors [[Bpe]]):
  *  - one corpus-scale pass ([[Bpe.wordFreqs]]) builds the (word,
  *    freq) vocabulary; everything after runs over the VOCABULARY,
  *    frequency-weighted;
  *  - the seed inventory is one substring-explode + hash aggregate
  *    over the vocab;
  *  - each EM round is ONE distributed job: Viterbi-segment every word
  *    with the model as a broadcast-literal kernel
  *    ([[UnigramLm.UnigramViterbi]] — the [[Ivf.assign]] "model rides
  *    the plan" pattern), explode, count, collect the MODEL-sIZED
  *    (piece, count) table (bounded by the seed size, ≤ ~100k rows —
  *    the documented model-collect discipline). EM rounds amortize far
  *    better than BPE's merge rounds: one round refits EVERY piece
  *    probability, where a BPE round learns a handful of merges.
  *  - applying the tokenizer is the same broadcast segment-table join
  *    [[Bpe.tokenize]] uses — corpus tokenization never re-runs EM.
  */
object UnigramLm {

  final case class Piece(piece: String, logp: Double)
  final case class Model(pieces: Seq[Piece], maxPieceLen: Int) {
    def table: Array[(String, Double)] =
      pieces.map(p => (p.piece, p.logp)).toArray
  }

  private[ext] def buildTable(
      pieces: Array[(String, Double)]): java.util.HashMap[String, java.lang.Double] = {
    val m = new java.util.HashMap[String, java.lang.Double](pieces.length * 2)
    pieces.foreach { case (p, lp) => m.put(p, lp) }
    m
  }

  /** Log-prob assigned to an out-of-model single character so unknown
    * input stays segmentable (standard UNK floor; any in-model
    * segmentation beats any segmentation using it). */
  val UnkLogp: Double = -1e9

  // -- Viterbi kernel -----------------------------------------------------

  /** Best-first segmentation of `w` under `table`: maximizes the summed
    * piece log-prob; ties prefer the LONGER piece at each boundary
    * (then the earlier boundary transitively) — a total, deterministic
    * rule. Out-of-model single chars get [[UnkLogp]]. */
  def segment(w: String, table: java.util.HashMap[String, java.lang.Double],
      maxPieceLen: Int): Array[String] = {
    val n = w.length
    if (n == 0) return Array.empty
    val best = new Array[Double](n + 1)
    val back = new Array[Int](n + 1)
    java.util.Arrays.fill(best, Double.NegativeInfinity)
    best(0) = 0.0
    var i = 1
    while (i <= n) {
      var j = math.max(0, i - maxPieceLen)
      while (j < i) {
        if (best(j) > Double.NegativeInfinity) {
          val lp = table.get(w.substring(j, i))
          val s =
            if (lp != null) best(j) + lp.doubleValue()
            else if (i - j == 1) best(j) + UnkLogp
            else Double.NegativeInfinity
          // strict >: the first (longest-piece) candidate wins ties
          if (s > best(i)) { best(i) = s; back(i) = j }
        }
        j += 1
      }
      i += 1
    }
    var out = List.empty[String]
    var pos = n
    while (pos > 0) { out = w.substring(back(pos), pos) :: out; pos = back(pos) }
    out.toArray
  }

  /** Viterbi segmentation as a native expression: the model ships as a
    * plan-literal reference object (built once per task via the lazy
    * map — no per-row table construction), the DP is one JIT-able
    * method per word. */
  final case class UnigramViterbi(child: Expression,
      pieces: Array[(String, Double)], maxPieceLen: Int)
      extends UnaryExpression with ExpectsInputTypes {
    override def inputTypes = Seq(StringType)
    override def dataType: DataType = ArrayType(StringType, containsNull = false)
    override def prettyName: String = "graft_unigram_viterbi"

    @transient private lazy val table = UnigramLm.buildTable(pieces)

    def segmentRow(w: UTF8String): GenericArrayData =
      new GenericArrayData(
        UnigramLm.segment(w.toString, table, maxPieceLen)
          .map(s => UTF8String.fromString(s): Any))

    override def nullSafeEval(input: Any): Any =
      segmentRow(input.asInstanceOf[UTF8String])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, w => {
        val ref = ctx.addReferenceObj("viterbi", this, classOf[UnigramViterbi].getName)
        s"${ev.value} = $ref.segmentRow($w);"
      })

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  def viterbi(word: Column, model: Model): Column =
    ColumnBridge.column(
      UnigramViterbi(ColumnBridge.expr(word), model.table, model.maxPieceLen))

  // -- forward–backward expected counts (the FULL EM E-step) --------------

  /** Per-word expected piece counts under the current model — Kudo's
    * actual E-step (marginal piece posteriors over ALL segmentations
    * via forward–backward in log space), where [[segment]] is the
    * hard-EM approximation. Also returns the word's total
    * log-likelihood (the forward value at the end), which [[fitEm]]
    * uses for the monotonicity contract. Deterministic: fixed
    * iteration order, log-sum-exp with the max factored out. */
  def expectedCounts(w: String,
      table: java.util.HashMap[String, java.lang.Double],
      maxPieceLen: Int): (Array[(String, Double)], Double) = {
    val n = w.length
    if (n == 0) return (Array.empty, 0.0)
    def lse(a: Double, b: Double): Double =
      if (a == Double.NegativeInfinity) b
      else if (b == Double.NegativeInfinity) a
      else { val m = math.max(a, b); m + math.log(math.exp(a - m) + math.exp(b - m)) }
    def lpOf(j: Int, i: Int): Double = {
      val lp = table.get(w.substring(j, i))
      if (lp != null) lp.doubleValue()
      else if (i - j == 1) UnkLogp
      else Double.NegativeInfinity
    }
    val alpha = new Array[Double](n + 1)
    val beta = new Array[Double](n + 1)
    java.util.Arrays.fill(alpha, Double.NegativeInfinity)
    java.util.Arrays.fill(beta, Double.NegativeInfinity)
    alpha(0) = 0.0; beta(n) = 0.0
    var i = 1
    while (i <= n) {
      var j = math.max(0, i - maxPieceLen)
      while (j < i) { alpha(i) = lse(alpha(i), alpha(j) + lpOf(j, i)); j += 1 }
      i += 1
    }
    var j2 = n - 1
    while (j2 >= 0) {
      var i2 = j2 + 1
      val hi = math.min(n, j2 + maxPieceLen)
      while (i2 <= hi) { beta(j2) = lse(beta(j2), lpOf(j2, i2) + beta(i2)); i2 += 1 }
      j2 -= 1
    }
    val total = alpha(n)
    if (total == Double.NegativeInfinity) return (Array.empty, total)
    val acc = new java.util.LinkedHashMap[String, java.lang.Double]()
    var jj = 0
    while (jj < n) {
      var ii = jj + 1
      val hi = math.min(n, jj + maxPieceLen)
      while (ii <= hi) {
        val lp = lpOf(jj, ii)
        if (lp > Double.NegativeInfinity) {
          val post = math.exp(alpha(jj) + lp + beta(ii) - total)
          if (post > 0.0) {
            val piece = w.substring(jj, ii)
            val cur = acc.get(piece)
            acc.put(piece, if (cur == null) post else cur.doubleValue() + post)
          }
        }
        ii += 1
      }
      jj += 1
    }
    val out = new Array[(String, Double)](acc.size())
    val it = acc.entrySet().iterator()
    var k = 0
    while (it.hasNext) {
      val e = it.next(); out(k) = (e.getKey, e.getValue.doubleValue()); k += 1
    }
    (out, total)
  }

  /** [[expectedCounts]] as a native expression: per word, an array of
    * (piece, weight) posteriors plus the word log-likelihood — one
    * kernel call per vocab row, model as a plan literal (the
    * [[UnigramViterbi]] pattern). Weights are 9-decimal-rounded HERE
    * so the distributed M-step can sum them as exact decimals
    * (partition-order invariance — the house determinism discipline;
    * fractional doubles summed raw would be order-dependent). */
  final case class UnigramEmCounts(child: Expression,
      pieces: Array[(String, Double)], maxPieceLen: Int)
      extends UnaryExpression with ExpectsInputTypes {
    override def inputTypes = Seq(StringType)
    override def dataType: DataType =
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("counts",
          ArrayType(org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("piece", StringType, nullable = false),
            org.apache.spark.sql.types.StructField("w",
              org.apache.spark.sql.types.DoubleType, nullable = false))),
            containsNull = false), nullable = false),
        org.apache.spark.sql.types.StructField("ll",
          org.apache.spark.sql.types.DoubleType, nullable = false)))
    override def prettyName: String = "graft_unigram_em_counts"

    @transient private lazy val table = UnigramLm.buildTable(pieces)

    def emRow(w: UTF8String): Any = {
      val (counts, ll) = UnigramLm.expectedCounts(w.toString, table, maxPieceLen)
      val arr = new GenericArrayData(counts.map { case (p, wt) =>
        val rounded = math.rint(wt * 1e9) / 1e9
        new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
          Array[Any](UTF8String.fromString(p), rounded)): Any
      })
      new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        Array[Any](arr, ll))
    }

    override def nullSafeEval(input: Any): Any =
      emRow(input.asInstanceOf[UTF8String])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, w => {
        val ref = ctx.addReferenceObj("em", this, classOf[UnigramEmCounts].getName)
        s"${ev.value} = (org.apache.spark.sql.catalyst.InternalRow) $ref.emRow($w);"
      })

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  def emCountsCol(word: Column, model: Model): Column =
    ColumnBridge.column(
      UnigramEmCounts(ColumnBridge.expr(word), model.table, model.maxPieceLen))

  // -- Induction ----------------------------------------------------------

  /** Seed inventory: the `seedSize` most frequent substrings (length
    * 2..maxPieceLen, weighted by word freq, every occurrence counted)
    * PLUS every single character (segmentation closure). One
    * substring-explode + hash aggregate over the vocab; the tie rule
    * (count desc, piece asc) is total. */
  def seedPieces(vocab: DataFrame, seedSize: Int, maxPieceLen: Int): DataFrame = {
    val subs = vocab.select(col("freq"), explode(substringsCol(col("word"), maxPieceLen)).as("piece"))
      .groupBy("piece").agg(sum(col("freq")).as("cnt"))
    val chars = subs.filter(length(col("piece")) === 1)
    val multi = subs.filter(length(col("piece")) > 1)
      .orderBy(col("cnt").desc, col("piece")).limit(seedSize)
    chars.unionByName(multi)
  }

  /** All substrings of `word` with length 1..maxLen, as a column
    * (higher-order exprs — no UDF): for each 1-based start position,
    * the substrings of length 1..min(maxLen, n−start+1) starting
    * there. */
  private def substringsCol(word: Column, maxLen: Int): Column =
    flatten(transform(sequence(lit(1), length(word)),
      start => transform(
        sequence(lit(1), least(lit(maxLen), length(word) - start + 1)),
        len => word.substr(start, len))))

  /** Fit a unigram-LM tokenizer: EM rounds with per-round pruning until
    * `targetSize` pieces remain, then `finalRounds` pure-EM refits.
    * Every round is one distributed Viterbi + count job and a
    * model-sized collect. Single characters are never pruned (the
    * target is met in multi-char pieces; an alphabet larger than the
    * target keeps the alphabet). */
  def fit(vocab: DataFrame, targetSize: Int, seedSize: Int = 8192,
      maxPieceLen: Int = 8, shrink: Double = 0.75,
      finalRounds: Int = 2): Model = {
    require(shrink > 0 && shrink < 1, "shrink must be in (0, 1)")
    val words = vocab.select(col("word"), col("freq")).localCheckpoint(true)
    try {
    // model-sized collect: ≤ seedSize + |alphabet| rows by construction
    val seed = seedPieces(words, seedSize, maxPieceLen).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    var model = toModel(seed, maxPieceLen)
    // prune phase: each round refits usage and keeps the best
    // max(target, ceil(size·shrink)) pieces — geometric, so the round
    // count is log(seed/target)/log(1/shrink), NOT one per dropped
    // piece (the amortization BPE merges cannot have)
    while (model.pieces.size > targetSize &&
        model.pieces.exists(_.piece.length > 1)) {
      model = toModel(prune(emCounts(words, model), targetSize, shrink), maxPieceLen)
    }
    var i = 0
    while (i < finalRounds) {
      model = toModel(emCounts(words, model), maxPieceLen)
      i += 1
    }
    model
    } finally words.unpersist(): Unit
  }

  /** One E+M round: Viterbi-segment the vocab under `model`, count
    * piece usage (freq-weighted exact longs), collect the model-sized
    * table. Pieces with zero usage drop out (they can never win a
    * Viterbi path again); single chars are retained with count 0 so
    * closure survives. */
  def emCounts(words: DataFrame, model: Model): Array[(String, Long)] = {
    val counted = words
      .select(col("freq"), explode(viterbi(col("word"), model)).as("piece"))
      .groupBy("piece").agg(sum(col("freq")).as("cnt"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    model.pieces.toArray.map(p => (p.piece, counted.getOrElse(p.piece, 0L)))
      .filter { case (p, c) => c > 0 || p.length == 1 }
  }

  /** Long-count prune: one exact Double round-trip into [[pruneD]] so
    * the shrink/stall-guard logic lives once (counts are far below
    * 2^53; the ordering is identical). */
  private def prune(counts: Array[(String, Long)], target: Int,
      shrink: Double): Array[(String, Long)] =
    pruneD(counts.map { case (p, c) => (p, c.toDouble) }, target, shrink)
      .map { case (p, c) => (p, c.toLong) }

  /** Counts → log-probs: logp = ln(count / total) over smoothed counts
    * (+1 so zero-count retained chars stay finite). Deterministic: the
    * piece list is sorted (piece asc) before the IEEE sums. */
  private def toModel(counts: Array[(String, Long)], maxPieceLen: Int): Model = {
    val sorted = counts.sortBy(_._1)
    val total = sorted.foldLeft(0.0) { case (s, (_, c)) => s + (c + 1).toDouble }
    Model(sorted.toIndexedSeq.map { case (p, c) =>
      Piece(p, math.log((c + 1).toDouble / total))
    }, maxPieceLen)
  }

  final case class EmFit(model: Model, logLikelihoods: Seq[Double])

  /** FULL soft-EM fit (Kudo's published recipe; [[fit]] is the hard-EM
    * variant): each round computes forward–backward expected counts
    * over every segmentation of every word — one distributed kernel
    * job + a model-sized collect — and the M-step renormalizes from
    * those posteriors. Pruning uses expected usage (chars never
    * pruned), then `finalRounds` pure-EM refits whose corpus
    * log-likelihoods are returned: EM's defining contract is that they
    * never decrease (UnigramLmSpec asserts it), which the
    * hard-EM/Viterbi approximation cannot promise.
    *
    * Determinism discipline: per-word posteriors are IEEE-deterministic
    * (fixed fold order), 9-decimal-rounded IN the kernel, and the
    * cross-word sums run as exact DECIMAL aggregations — the fitted
    * model is partition-order invariant like the hard-EM one. */
  def fitEm(vocab: DataFrame, targetSize: Int, seedSize: Int = 8192,
      maxPieceLen: Int = 8, shrink: Double = 0.75,
      finalRounds: Int = 2): EmFit = {
    require(shrink > 0 && shrink < 1, "shrink must be in (0, 1)")
    val words = vocab.select(col("word"), col("freq")).localCheckpoint(true)
    try {
    val seed = seedPieces(words, seedSize, maxPieceLen).collect()
      .map(r => (r.getString(0), r.getLong(1).toDouble))
    var model = toModelD(seed, maxPieceLen)
    while (model.pieces.size > targetSize &&
        model.pieces.exists(_.piece.length > 1)) {
      val (counts, _) = emExpected(words, model)
      model = toModelD(pruneD(counts, targetSize, shrink), maxPieceLen)
    }
    val lls = scala.collection.mutable.ArrayBuffer[Double]()
    var i = 0
    while (i < finalRounds) {
      val (counts, ll) = emExpected(words, model)
      lls += ll
      model = toModelD(counts, maxPieceLen)
      i += 1
    }
    EmFit(model, lls.toSeq)
    } finally words.unpersist(): Unit
  }

  /** One distributed E-step: freq-weighted expected counts per piece
    * (exact decimal sums of the kernel's 9-rounded posteriors) and the
    * corpus log-likelihood. Zero-count multi-char pieces drop; chars
    * are retained at zero (closure). Model-sized collect. */
  def emExpected(words: DataFrame, model: Model): (Array[(String, Double)], Double) = {
    import org.apache.spark.sql.types.DecimalType
    val st = words
      .select(col("freq"), emCountsCol(col("word"), model).as("em"))
      .localCheckpoint(true) // referenced twice; the kernel must run once
    try {
      // round the DOUBLE product to 9 decimals BEFORE the decimal cast:
      // Decimal(28,9) * long promotes to Decimal(38,6) under Spark's
      // precision adjustment, silently truncating every per-row
      // posterior at 1e-6 and eating the monotonicity margin
      val counted = st
        .select(col("freq"), explode(col("em.counts")).as("c"))
        .groupBy(col("c.piece").as("piece"))
        .agg(sum(round(col("c.w") * col("freq"), 9)
          .cast(DecimalType(38, 9))).as("cnt"))
        .collect().map(r => (r.getString(0), r.getDecimal(1).doubleValue())).toMap
      // global sum over ZERO rows is a NULL decimal — empty vocab must
      // yield an empty fit, not an NPE
      val ll = Option(st
        .select(sum(round(col("em.ll") * col("freq"), 9).cast(DecimalType(38, 9))))
        .head.getDecimal(0)).map(_.doubleValue()).getOrElse(0.0)
      val kept = model.pieces.toArray.map(p =>
          (p.piece, counted.getOrElse(p.piece, 0.0)))
        .filter { case (p, c) => c > 0 || p.length == 1 }
      (kept, ll)
    } finally st.unpersist(): Unit // don't pin one copy per EM round
  }

  /** UNSMOOTHED M-step: p = c / Σc — the exact complete-data maximizer,
    * which is what makes EM's log-likelihood monotone (the hard-EM
    * [[toModel]]'s +1 smoothing would break the guarantee). Retained
    * zero-count chars take the UNK floor instead of a smoothed share:
    * they stay segmentable without distorting the distribution. */
  private def toModelD(counts: Array[(String, Double)], maxPieceLen: Int): Model = {
    val sorted = counts.sortBy(_._1)
    val total = sorted.foldLeft(0.0) { case (s, (_, c)) => s + c }
    Model(sorted.toIndexedSeq.map { case (p, c) =>
      Piece(p, if (c > 0 && total > 0) math.log(c / total) else UnkLogp)
    }, maxPieceLen)
  }

  private def pruneD(counts: Array[(String, Double)], target: Int,
      shrink: Double): Array[(String, Double)] = {
    val (chars, multi) = counts.partition(_._1.length == 1)
    val newTotal = math.max(target,
      math.min(counts.length - 1, math.ceil(counts.length * shrink).toInt))
    val keepMulti = math.max(newTotal - chars.length, 0)
    chars ++ multi.sortBy { case (p, c) => (-c, p) }.take(keepMulti)
  }

  // -- Application --------------------------------------------------------

  /** (word, subwords) segment table under a fitted model — the same
    * broadcastable shape [[Bpe.segmentTable]] produces, so
    * [[Bpe.tokenize]]-style corpus tokenization applies unchanged. */
  def segmentTable(vocab: DataFrame, model: Model): DataFrame =
    vocab.select(col("word"), viterbi(col("word"), model).as("subwords"))

  /** Tokenize a corpus: explode words, broadcast-join the segment
    * table; unknown words Viterbi-segment on the fly (the model kernel
    * handles any string, so no fallback row is ever dropped). */
  def tokenize(df: DataFrame, idCol: String, textCol: String,
      segments: DataFrame, model: Model): DataFrame =
    df.select(col(idCol),
        posexplode(split(trim(lower(col(textCol))), "\\s+")).as(Seq("pos", "word")))
      .filter(col("word") =!= "")
      .join(broadcast(segments), Seq("word"), "left")
      .select(col(idCol), col("pos"),
        posexplode(coalesce(col("subwords"), viterbi(col("word"), model)))
          .as(Seq("subpos", "subword")))
}
