package graft.ext

import org.apache.spark.sql.SparkSession

/** PERSISTENCE for the learned pipeline models — the artifact
  * discipline a production corpus pipeline runs on: a tokenizer /
  * language-ID / quality model is TRAINED ONCE (one distributed fit),
  * shipped as a versioned artifact, and applied by every subsequent
  * job — re-fitting per job would make corpus snapshots
  * irreproducible (a later fit over a grown corpus yields a different
  * vocabulary) and waste the fit. Each model lands as plain parquet
  * (weights/pieces table + a one-row meta table), so the artifact is
  * engine-inspectable, survives any Hadoop FS, and loads without
  * custom serialization. Model identity round-trips EXACTLY
  * (ModelStoreSpec: loaded == fitted, field for field — doubles are
  * bit-preserved by parquet).
  *
  * Reference: rearview persists monitors in Rails
  * (`db/schema.rb:23-37`) and delegates all modeling to Graphite;
  * model artifacts are extension surface for the pipeline mandate. */
object ModelStore {

  // -- byte/char BPE merges -------------------------------------------------

  def saveBpeMerges(spark: SparkSession, merges: Seq[Bpe.Merge],
      path: String): Unit = {
    import spark.implicits._
    merges.toDF("rank", "left", "right")
      .repartition(1).write.mode("overwrite").parquet(path)
  }

  def loadBpeMerges(spark: SparkSession, path: String): Seq[Bpe.Merge] = {
    import spark.implicits._
    spark.read.parquet(path)
      .select("rank", "left", "right").as[(Int, String, String)]
      .collect().sortBy(_._1)
      .map { case (r, l, rt) => Bpe.Merge(r, l, rt) }.toSeq
  }

  // -- unigram LM (SentencePiece-style) -------------------------------------

  def saveUnigram(spark: SparkSession, model: UnigramLm.Model,
      path: String): Unit = {
    import spark.implicits._
    model.pieces.zipWithIndex.map { case (p, pos) => (pos, p.piece, p.logp) }
      .toDF("pos", "piece", "logp")
      .repartition(1).write.mode("overwrite").parquet(s"$path/pieces")
    Seq(model.maxPieceLen).toDF("max_piece_len")
      .repartition(1).write.mode("overwrite").parquet(s"$path/meta")
  }

  def loadUnigram(spark: SparkSession, path: String): UnigramLm.Model = {
    import spark.implicits._
    val pieces = spark.read.parquet(s"$path/pieces")
      .select("pos", "piece", "logp").as[(Int, String, Double)]
      .collect().sortBy(_._1)
      .map { case (_, p, lp) => UnigramLm.Piece(p, lp) }.toSeq
    val maxLen = spark.read.parquet(s"$path/meta")
      .select("max_piece_len").as[Int].head()
    UnigramLm.Model(pieces, maxLen)
  }

  // -- trained language ID --------------------------------------------------

  def saveLangId(spark: SparkSession, model: LangId.Model,
      path: String): Unit = {
    import spark.implicits._
    Seq((model.dim, model.minN, model.maxN)).toDF("dim", "min_n", "max_n")
      .repartition(1).write.mode("overwrite").parquet(s"$path/meta")
    // lang ORDER is semantic (it indexes the weight vectors) — persist
    // the position explicitly rather than trusting row order
    model.langs.zip(model.intercepts).zipWithIndex
      .map { case ((l, i), pos) => (pos, l, i) }
      .toDF("pos", "lang", "intercept")
      .repartition(1).write.mode("overwrite").parquet(s"$path/intercepts")
    model.weights.toSeq
      .flatMap { case (idx, ws) => model.langs.zip(ws).map {
        case (lang, w) => (idx, lang, w) } }
      .toDF("idx", "lang", "w")
      .repartition(1).write.mode("overwrite").parquet(s"$path/weights")
  }

  def loadLangId(spark: SparkSession, path: String): LangId.Model = {
    import spark.implicits._
    val (dim, minN, maxN) = spark.read.parquet(s"$path/meta")
      .select("dim", "min_n", "max_n").as[(Int, Int, Int)].head()
    // langs in their TRAINED order (explicit positions — row order of
    // a parquet read is not a contract)
    val li = spark.read.parquet(s"$path/intercepts")
      .select("pos", "lang", "intercept").as[(Int, String, Double)]
      .collect().sortBy(_._1).map(r => (r._2, r._3))
    val langs = li.map(_._1).toSeq
    val byLang = langs.zipWithIndex.toMap
    val weights = spark.read.parquet(s"$path/weights")
      .select("idx", "lang", "w").as[(Int, String, Double)].collect()
      .groupBy(_._1).map { case (idx, rows) =>
        val arr = new Array[Double](langs.size)
        rows.foreach { case (_, lang, w) => arr(byLang(lang)) = w }
        idx -> arr.toSeq
      }
    LangId.Model(dim, minN, maxN, langs, li.map(_._2).toSeq, weights)
  }

  // -- quality classifier ---------------------------------------------------

  def saveQuality(spark: SparkSession, model: QualityClassifier.Model,
      path: String): Unit = {
    import spark.implicits._
    Seq((model.dim, model.intercept)).toDF("dim", "intercept")
      .repartition(1).write.mode("overwrite").parquet(s"$path/meta")
    model.weights.toSeq.toDF("idx", "w")
      .repartition(1).write.mode("overwrite").parquet(s"$path/weights")
  }

  def loadQuality(spark: SparkSession, path: String): QualityClassifier.Model = {
    import spark.implicits._
    val (dim, intercept) = spark.read.parquet(s"$path/meta")
      .select("dim", "intercept").as[(Int, Double)].head()
    val weights = spark.read.parquet(s"$path/weights")
      .select("idx", "w").as[(Int, Double)].collect().toMap
    QualityClassifier.Model(dim, intercept, weights)
  }
}
