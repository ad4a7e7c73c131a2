package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge

import graft.compile.{HashedFeatures, LinearScoreMicro}

/** Hashed LOGISTIC-REGRESSION document classifier, trained by
  * distributed full-batch gradient descent — the FineWeb-Edu-style
  * model-based quality filter (the trained-linear-model sibling of the
  * generative [[QualityClassifier]] NB model: LR directly optimizes the
  * separating plane, which is the published preference when the
  * reference/crawl classes overlap heavily). Features are binary
  * presence of fastText-shape hashed buckets (word unigrams + adjacent
  * bigrams over [[TextAnalysis.words]], hashed by the portable
  * [[TextAnalysis.fingerprint]] polynomial — the
  * [[QualityClassifier]] feature space with counts collapsed to
  * presence).
  *
  * Determinism contract (what lets a SQL oracle restate TRAINING, not
  * just scoring): weights live in integer MICRO-units (1e-6), so the
  * per-document score is an order-free integer sum; the sigmoid is
  * rounded to 6 decimals so residuals are exact decimals; per-bucket
  * residual sums aggregate as decimal(38,6) (exact); and each weight
  * update is `floor(lr·(grad/N)·1e6 + 0.5)` — floor half-up, the
  * [[Similarity.int8Quantize]] IEEE-exact discipline. Every step is
  * either integer math or one correctly-rounded double op, so T
  * unrolled iterations replay bit-identically in DuckDB.
  *
  * Scale shape:
  *  - each training iteration is ONE aggregation job over the labeled
  *    corpus: a narrow [[LinearScoreMicro]] scan (current weights as
  *    plan literals — the [[Similarity.refineCentroids]] pattern)
  *    computes residuals, a sentinel bucket prepended to each doc's
  *    distinct-bucket list folds the bias gradient into the same
  *    hash aggregate, and the collect is model-sized (≤ buckets+1
  *    rows), never corpus-sized;
  *  - scoring is a pure narrow projection with the final weights as
  *    plan literals — zero joins, zero shuffle, scan speed at 100 TB.
  */
object LrClassifier {

  /** Trained model: dense per-bucket weights + bias in exact 1e-6
    * units. `prob(zmicro) = σ(zmicro/1e6)`. */
  final case class Model(
      buckets: Int,
      mult: Long,
      iters: Int,
      lr: Double,
      biasMicro: Long,
      weightsMicro: Array[Long]) {
    require(buckets >= 2, "lr model: buckets must be >= 2")
    require(weightsMicro.length == buckets, "lr model: one weight per bucket")

    /** Versioned blob (the [[QualityClassifier.Model]] discipline). */
    def serialize: Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      val out = new java.io.DataOutputStream(bos)
      out.writeInt(Model.Magic)
      out.writeByte(Model.Version)
      out.writeInt(buckets); out.writeLong(mult)
      out.writeInt(iters); out.writeDouble(lr)
      out.writeLong(biasMicro)
      weightsMicro.foreach(out.writeLong)
      out.flush()
      bos.toByteArray
    }
  }

  object Model {
    private[ops] val Magic = 0x474c5231 // "GLR1"
    private[ops] val Version = 1

    def deserialize(blob: Array[Byte]): Model = {
      val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(blob))
      try {
        require(in.readInt() == Magic, "lr blob: bad magic")
        require(in.readByte() == Version, "lr blob: unsupported version")
        val buckets = in.readInt(); val mult = in.readLong()
        val iters = in.readInt(); val lr = in.readDouble()
        val bias = in.readLong()
        require(buckets >= 2 && buckets.toLong * 8 <= blob.length,
          s"lr blob: implausible bucket count $buckets for ${blob.length} bytes")
        val w = Array.fill(buckets)(in.readLong())
        Model(buckets, mult, iters, lr, bias, w)
      } catch {
        case e: java.io.EOFException =>
          throw new IllegalArgumentException("lr blob: truncated", e)
      }
    }
  }

  /** The raw (n_features, zmicro) struct Column under `model`'s
    * weights. NULL text is scored as empty (z = bias). */
  def scoreRaw(text: Column, model: Model): Column =
    ColumnBridge.column(LinearScoreMicro(
      ColumnBridge.expression(TextAnalysis.words(coalesce(text, lit("")))),
      model.buckets, model.mult, model.weightsMicro.toSeq, model.biasMicro))

  /** σ(zmicro/1e6) rounded to 6 — the document's P(positive). */
  def probOf(zmicro: Column): Column =
    Rounding.roundAt(lit(1.0) /
      (lit(1.0) + exp(-(zmicro.cast("double") / lit(1000000.0)))), 6)

  /** Train on a labeled corpus: `labelCol` TRUE rows are the positive
    * (reference) class; NULL labels are dropped; NULL texts train as
    * empty documents (they still push the bias toward their class).
    * `lr` should be a small power of two (4.0 default) so the update's
    * float multiplications are exact. */
  def train(df: DataFrame, textCol: String, labelCol: Column,
            buckets: Int = 4096, mult: Long = 31L,
            iters: Int = 2, lr: Double = 4.0): Model = {
    require(iters >= 1, s"lr train: iters ($iters) must be >= 1")
    val labeled = df
      .select(coalesce(col(textCol), lit("")).as("_t"),
        labelCol.cast("boolean").as("_y"))
      .where(col("_y").isNotNull)
      .persist()

    var n = 0L
    var bias = 0L
    var w = new Array[Long](buckets)
    (0 until iters).foreach { it =>
      val zc = scoreRaw(col("_t"), Model(buckets, mult, iters, lr, bias, w))
      // residual r = σ(z) - y, exact at 6 decimals; the sentinel bucket
      // -1 rides every doc's distinct-bucket list so the bias gradient
      // comes out of the SAME hash aggregate (empty docs keep their row)
      val feats = ColumnBridge.column(HashedFeatures(
        ColumnBridge.expression(TextAnalysis.words(col("_t"))),
        buckets, mult))
      // bind residual and bucket list in their OWN projection: a
      // generator in the same select re-evaluates sibling expressions
      // per EMITTED row, turning the per-doc sigmoid+kernel into a
      // per-bucket-element one (~200× at web doc sizes — r6 diag)
      val gradsDf = labeled
        .select(
          (probOf(zc.getField("zmicro")) -
            when(col("_y"), lit(1.0)).otherwise(lit(0.0)))
            .cast("decimal(38,6)").as("_r"),
          concat(array(lit(-1)),
            coalesce(map_keys(feats), array())).as("_bs"))
        .select(col("_r"), explode(col("_bs")).as("_b"))
        .groupBy("_b").agg(sum("_r").as("_g"))
      // the labeled-row count rides the FIRST iteration's collect as a
      // tagged union row (sentinel bucket -2) instead of a dedicated
      // count() job — the driver update needs n only after the
      // gradients are in hand, and later iterations reuse it
      val grads = (if (it == 0)
          gradsDf.unionByName(labeled
            .agg(count(lit(1)).cast("decimal(38,6)").as("_g"))
            .select(lit(-2).as("_b"), col("_g")))
        else gradsDf)
        .collect() // bounded: ≤ buckets + 2 rows
      if (it == 0) {
        n = grads.find(_.getInt(0) == -2)
          .map(_.getDecimal(1).longValue()).getOrElse(0L)
        require(n > 0, "lr train: no labeled rows")
      }
      val next = w.clone()
      grads.foreach { row =>
        val b = row.getInt(0)
        if (b != -2) {
          val g = row.getDecimal(1).doubleValue()
          // floor half-up in micro-units: every factor is one correctly-
          // rounded IEEE op (g/N exact-rounded, lr a power of two, 1e6
          // exact), so the update replays bit-identically in SQL
          val step = math.floor(lr * (g / n) * 1000000.0 + 0.5).toLong
          if (b == -1) bias -= step else next(b) = next(b) - step
        }
      }
      w = next
    }
    labeled.unpersist(false)
    Model(buckets, mult, iters, lr, bias, w)
  }

  /** Score a corpus: adds (n_features, lr_zmicro, lr_prob). One narrow
    * kernel pass, weights as plan literals. */
  def score(df: DataFrame, textCol: String, model: Model): DataFrame = {
    val s = scoreRaw(col(textCol), model)
    df.withColumn("_s", s)
      .withColumn("n_features", col("_s.n_features"))
      .withColumn("lr_zmicro", col("_s.zmicro"))
      .withColumn("lr_prob", probOf(col("_s.zmicro")))
      .drop("_s")
  }

  /** Keep documents whose P(positive) reaches `minProb` — the quality
    * gate shape (FineWeb keeps score ≥ threshold; importance-sampling
    * callers use [[score]] + [[Sampling]] instead). */
  def filterByProb(df: DataFrame, textCol: String, model: Model,
                   minProb: Double): DataFrame =
    score(df, textCol, model).where(col("lr_prob") >= minProb)
}
