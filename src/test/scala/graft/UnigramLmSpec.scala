package graft

import org.apache.spark.sql.functions._

import graft.ext.{Bpe, UnigramLm}
import graft.ext.UnigramLm.{Model, Piece}

/** Unigram-LM induction vs an INDEPENDENT pure-Scala reference of the
  * same hard-EM recipe (plain Maps and loops, no Spark) — seed, EM
  * counts, prune, smoothing and the Viterbi tie rule all re-derived
  * from the scaladoc contract. Equality is exact (same pieces, same
  * IEEE log-probs, same segmentations). */
class UnigramLmSpec extends SparkTestBase {
  import spark.implicits._

  // -- pure-Scala reference ----------------------------------------------

  private def refSeed(freqs: Map[String, Long], seedSize: Int,
      maxLen: Int): Array[(String, Long)] = {
    val cnt = scala.collection.mutable.Map.empty[String, Long]
    for ((w, f) <- freqs; start <- 0 until w.length;
         len <- 1 to math.min(maxLen, w.length - start)) {
      val s = w.substring(start, start + len)
      cnt(s) = cnt.getOrElse(s, 0L) + f
    }
    val (chars, multi) = cnt.toArray.partition(_._1.length == 1)
    chars ++ multi.sortBy { case (p, c) => (-c, p) }.take(seedSize)
  }

  private def refModel(counts: Array[(String, Long)], maxLen: Int): Model = {
    val sorted = counts.sortBy(_._1)
    val total = sorted.foldLeft(0.0) { case (s, (_, c)) => s + (c + 1).toDouble }
    Model(sorted.toIndexedSeq.map { case (p, c) =>
      Piece(p, math.log((c + 1).toDouble / total))
    }, maxLen)
  }

  private def refSegment(w: String, m: Model): Seq[String] = {
    val t = m.pieces.map(p => p.piece -> p.logp).toMap
    val n = w.length
    val best = Array.fill(n + 1)(Double.NegativeInfinity)
    val back = new Array[Int](n + 1)
    best(0) = 0.0
    for (i <- 1 to n; j <- math.max(0, i - m.maxPieceLen) until i
         if best(j) > Double.NegativeInfinity) {
      val sub = w.substring(j, i)
      val s = t.get(sub) match {
        case Some(lp) => best(j) + lp
        case None if i - j == 1 => best(j) + UnigramLm.UnkLogp
        case None => Double.NegativeInfinity
      }
      if (s > best(i)) { best(i) = s; back(i) = j }
    }
    var out = List.empty[String]; var pos = n
    while (pos > 0) { out = w.substring(back(pos), pos) :: out; pos = back(pos) }
    out
  }

  private def refEmCounts(freqs: Map[String, Long], m: Model): Array[(String, Long)] = {
    val cnt = scala.collection.mutable.Map.empty[String, Long]
    for ((w, f) <- freqs; p <- refSegment(w, m))
      cnt(p) = cnt.getOrElse(p, 0L) + f
    m.pieces.toArray.map(p => (p.piece, cnt.getOrElse(p.piece, 0L)))
      .filter { case (p, c) => c > 0 || p.length == 1 }
  }

  private def refPrune(counts: Array[(String, Long)], target: Int,
      shrink: Double): Array[(String, Long)] = {
    val (chars, multi) = counts.partition(_._1.length == 1)
    val newTotal = math.max(target,
      math.min(counts.length - 1, math.ceil(counts.length * shrink).toInt))
    chars ++ multi.sortBy { case (p, c) => (-c, p) }
      .take(math.max(newTotal - chars.length, 0))
  }

  private def refFit(freqs: Map[String, Long], target: Int, seedSize: Int,
      maxLen: Int, shrink: Double, finalRounds: Int): Model = {
    var m = refModel(refSeed(freqs, seedSize, maxLen), maxLen)
    while (m.pieces.size > target && m.pieces.exists(_.piece.length > 1))
      m = refModel(refPrune(refEmCounts(freqs, m), target, shrink), maxLen)
    for (_ <- 1 to finalRounds) m = refModel(refEmCounts(freqs, m), maxLen)
    m
  }

  // -- fixtures -----------------------------------------------------------

  private val freqs = Map(
    "low" -> 5L, "lower" -> 2L, "lowest" -> 1L,
    "newest" -> 6L, "newer" -> 3L, "widest" -> 3L, "wider" -> 2L)
  private def corpusDf = {
    val corpus = freqs.toSeq.flatMap { case (w, f) => Seq.fill(f.toInt)(w) }
    corpus.zipWithIndex.map { case (w, i) => (i.toLong, w) }.toDF("id", "text")
  }

  test("distributed fit == pure-Scala reference, exactly") {
    val vocab = Bpe.wordFreqs(corpusDf, "text").localCheckpoint(true)
    val got = UnigramLm.fit(vocab, targetSize = 20, seedSize = 40,
      maxPieceLen = 6, shrink = 0.75, finalRounds = 2)
    val want = refFit(freqs, target = 20, seedSize = 40,
      maxLen = 6, shrink = 0.75, finalRounds = 2)
    assert(got.pieces.map(_.piece) == want.pieces.map(_.piece),
      s"piece sets differ:\n got ${got.pieces.map(_.piece)}\nwant ${want.pieces.map(_.piece)}")
    // IEEE-exact log-probs (same counts, same summation order)
    got.pieces.zip(want.pieces).foreach { case (g, w) =>
      assert(g.logp == w.logp, s"${g.piece}: ${g.logp} != ${w.logp}")
    }
    // and identical segmentations for every vocab word
    val seg = UnigramLm.segmentTable(vocab, got)
      .as[(String, Seq[String])].collect().toMap
    freqs.keys.foreach { w =>
      assert(seg(w) == refSegment(w, want), s"$w: ${seg(w)} vs ${refSegment(w, want)}")
    }
  }

  test("fit is partition-order invariant") {
    val vocab = Bpe.wordFreqs(corpusDf, "text").localCheckpoint(true)
    val a = UnigramLm.fit(vocab, 20, 40, 6)
    val b = UnigramLm.fit(vocab.repartition(13), 20, 40, 6)
    assert(a == b)
  }

  test("fit on real corpus words converges and segments round-trip") {
    val docs = graft.store.Tables.documents(spark, "/root/testdata/sf0.001")
    val vocab = Bpe.wordFreqs(docs, "text").localCheckpoint(true)
    val model = UnigramLm.fit(vocab, targetSize = 300, seedSize = 1000,
      maxPieceLen = 6)
    assert(model.pieces.size <= math.max(300,
      model.pieces.count(_.piece.length == 1)))
    val seg = UnigramLm.segmentTable(vocab, model)
    // every word reassembles from its pieces
    val bad = seg.select(col("word"),
        concat_ws("", col("subwords")).as("joined"))
      .filter(col("word") =!= col("joined")).count()
    assert(bad == 0)
    // frequent whole words should be single pieces under a 300-piece
    // budget on this small vocab
    val asOne = seg.filter(size(col("subwords")) === 1).count()
    assert(asOne > 0)
  }

  test("soft-EM: expected counts == brute-force enumeration; corpus log-likelihood never decreases") {
    // brute-force: enumerate ALL segmentations of a short word, weight
    // each by its probability, count pieces — must equal the
    // forward-backward posteriors to float precision
    val vocab = Bpe.wordFreqs(corpusDf, "text").localCheckpoint(true)
    val m = UnigramLm.fit(vocab, 20, 40, 6)
    val table = new java.util.HashMap[String, java.lang.Double]()
    m.pieces.foreach(p => table.put(p.piece, p.logp))
    def lpOf(s: String): Double = Option(table.get(s)).map(_.doubleValue())
      .getOrElse(if (s.length == 1) UnigramLm.UnkLogp else Double.NegativeInfinity)
    def allSegs(w: String): Seq[Seq[String]] =
      if (w.isEmpty) Seq(Seq.empty)
      else (1 to math.min(m.maxPieceLen, w.length)).flatMap { l =>
        val (h, t) = w.splitAt(l)
        if (lpOf(h) > Double.NegativeInfinity) allSegs(t).map(h +: _) else Seq.empty
      }
    for (w <- Seq("lowest", "newer", "wider")) {
      val segs = allSegs(w)
      val probs = segs.map(s => math.exp(s.map(lpOf).sum))
      val z = probs.sum
      val brute = segs.zip(probs).flatMap { case (s, p) => s.map(_ -> p / z) }
        .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
      val (got, ll) = UnigramLm.expectedCounts(w, table, m.maxPieceLen)
      assert(math.abs(math.exp(ll) - z) <= z * 1e-9, s"$w: Z ${math.exp(ll)} vs $z")
      val gotMap = got.toMap
      assert(gotMap.keySet == brute.keySet, s"$w: ${gotMap.keySet} vs ${brute.keySet}")
      brute.foreach { case (p, c) =>
        assert(math.abs(gotMap(p) - c) <= 1e-9, s"$w/$p: ${gotMap(p)} vs $c")
      }
    }
    // EM's defining contract on the refit rounds
    val fitted = UnigramLm.fitEm(vocab, targetSize = 20, seedSize = 40,
      maxPieceLen = 6, finalRounds = 4)
    val lls = fitted.logLikelihoods
    assert(lls.size == 4)
    lls.sliding(2).foreach { case Seq(a, b) =>
      assert(b >= a - 1e-6, s"log-likelihood decreased: $lls")
    }
    // and the fitted model still segments every vocab word losslessly
    val seg = UnigramLm.segmentTable(vocab, fitted.model)
    assert(seg.select(col("word"), concat_ws("", col("subwords")).as("j"))
      .filter(col("word") =!= col("j")).count() == 0)
  }

  test("soft-EM fit is partition-order invariant") {
    val vocab = Bpe.wordFreqs(corpusDf, "text").localCheckpoint(true)
    val a = UnigramLm.fitEm(vocab, 20, 40, 6)
    val b = UnigramLm.fitEm(vocab.repartition(13), 20, 40, 6)
    assert(a.model == b.model && a.logLikelihoods == b.logLikelihoods)
  }

  test("fit terminates on a tiny targetSize (the ceil(n*shrink)==n stall)") {
    val vocab = Bpe.wordFreqs(Seq((1L, "ab ab ab cd")).toDF("id", "text"), "text")
      .localCheckpoint(true)
    // alphabet {a,b,c,d} alone exceeds target 2: the prune must still
    // make strict progress each round and stop at chars-only
    val m = UnigramLm.fit(vocab, targetSize = 2, seedSize = 10, maxPieceLen = 3)
    assert(m.pieces.nonEmpty)
    assert(m.pieces.count(_.piece.length > 1) == 0 || m.pieces.size <= 2)
  }

  test("tokenize handles unknown words via on-the-fly Viterbi with UNK chars") {
    val vocab = Bpe.wordFreqs(corpusDf, "text").localCheckpoint(true)
    val model = UnigramLm.fit(vocab, 20, 40, 6)
    val seg = UnigramLm.segmentTable(vocab, model)
    val toks = UnigramLm.tokenize(
        Seq((1L, "newest zq")).toDF("id", "text"), "id", "text", seg, model)
      .orderBy("pos", "subpos")
      .select("subword").as[String].collect().toSeq
    assert(toks.head == "newest" || toks.take(2).mkString("") == "newest")
    // 'z'/'q' are out-of-alphabet: char-level UNK fallback, nothing dropped
    assert(toks.takeRight(2) == Seq("z", "q") || toks.contains("zq") == false)
  }
}
