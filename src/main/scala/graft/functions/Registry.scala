package graft.functions

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

/** SQL registration for the graft expressions, so `spark.sql` users get
  * the same kernels as the Column API:
  *
  *   SELECT iceberg_bucket(o_orderkey, 16), simhash64(text), ...
  *
  * Two paths: `GraftExtensions` for session construction
  * (`.withExtensions(new GraftExtensions)` or the
  * spark.sql.extensions conf), `Registry.register` for an existing
  * session.
  */
object Registry {

  private def intArg(e: Expression, name: String): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$name expects an integer literal, got $other")
  }

  val functions: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "iceberg_bucket" -> (args => IcebergBucket(args(0), intArg(args(1), "iceberg_bucket"))),
    "simhash64" -> (args => SimHash64(args(0))),
    "nfc_normalize" -> (args => NfcNormalize(args(0))),
    "doc_fingerprint" -> (args => DocFingerprint(args(0))),
    "cosine_sim" -> (args => CosineSim(args(0), args(1))),
    "jaccard_sim" -> (args => JaccardSim(args(0), args(1))),
    "minhash_bands" -> (args => MinHashBands(args(0),
      intArg(args(1), "minhash_bands"), intArg(args(2), "minhash_bands"))),
    "zorder2" -> (args => ZOrder2(args(0), args(1))),
    "zorder" -> (args => ZOrderBytes(args)),
    // the SQL surface honors the same session recall dial as the
    // DataFrame operators (graft.ann.lshPreset) — mixed SQL/DataFrame
    // bucket keys in one session must agree or joins between them
    // silently match nothing.
    // PERSISTENCE HAZARD: the dial binds at ANALYSIS time, so bucket
    // keys MATERIALIZED to a table embed the preset they were computed
    // under; a later session joining stored keys under a different
    // preset gets empty results, not an error. Use the stamped pair
    // Similarity.persistBucketKeys / loadBucketKeys / appendBucketKeys
    // (the table property `graft.ann.lshPreset` is written at create
    // and ASSERTED on every load/append); hand-materialized key tables
    // must stamp the same property — see README "ANN recall dial"
    "lsh_bucket_keys" -> (args => {
      val (t, p) = LshKernel.presetOf(SparkSession.active)
      LshBucketKeys(args(0), t, p)
    }))

  /** Register on a live session (temp functions). */
  def register(spark: SparkSession): Unit =
    functions.foreach { case (name, builder) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(name, builder, "built-in")
    }
}

/** Session-extension registration: SQL functions (injectFunction),
  * the automatic range-join rewrite (injectOptimizerRule) — interval
  * overlap joins become bucket equi-joins instead of nested loops —
  * and the V2 view SQL surface (injectParser rewrites view DDL aimed
  * at graft catalogs; injectResolutionRule inlines view reads), since
  * Spark 4.1 ships the ViewCatalog SPI with no built-in wiring. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    Registry.functions.foreach { case (name, builder) =>
      ext.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo("graft.functions", name),
        builder))
    }
    ext.injectOptimizerRule(session => graft.plans.RangeJoinRewrite(session))
    ext.injectParser((session, delegate) =>
      new graft.spark.GraftSqlParser(session, delegate))
    ext.injectResolutionRule(session => graft.spark.GraftViewRead(session))
  }
}
