package graft.functions

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.expressions.Expression

/** SQL registration for graft's native expressions, two ways:
  *
  *  - `GraftFunctions.register(spark)` on a live session;
  *  - `.withExtensions(new GraftExtensions)` /
  *    `spark.sql.extensions=graft.functions.GraftExtensions` at build
  *    time (the standard SparkSessionExtensions injection point, where
  *    a custom planner Strategy would also go — none is needed for
  *    parity, SURVEY §4).
  *
  * After registration plain SQL can use the kernels:
  * `SELECT poly_hash(text), float_vector_dot(a, b) FROM ...`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit =
    GraftFunctions.builders.foreach { case (name, builder) =>
      e.injectFunction(
        (org.apache.spark.sql.catalyst.FunctionIdentifier(name),
          new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
            "graft.functions", name),
          builder))
    }
}

object GraftFunctions {

  val builders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "poly_hash" -> (args => PolyHash(args.head)),
    "poly_hash_wide" -> (args => PolyHashWide(args.head)),
    "hll_rho" -> (args => HllRho(args.head)),
    "shingle_hashes" -> (args => ShingleHashes(args.head)),
    "fingerprint8" -> (args => Fingerprint8(args.head)),
    "float_vector_dot" -> (args => FloatVectorDot(args(0), args(1))),
    "bitset_and_count" -> (args => BitsetAndCount(args(0), args(1))),
    "morton_interleave" -> (args => {
      if (args.length != 3) throw new IllegalArgumentException(
        s"morton_interleave expects 3 arguments (x, y, bits literal); " +
          s"got ${args.length}")
      val bits = args(2) match {
        case org.apache.spark.sql.catalyst.expressions.Literal(b: Int, _) => b
        case org.apache.spark.sql.catalyst.expressions.Literal(b: Long, _) =>
          b.toInt
        case other => throw new IllegalArgumentException(
          s"morton_interleave bits must be an integer literal, got $other")
      }
      MortonInterleave(args(0), args(1), bits)
    }))

  def register(spark: SparkSession): Unit = {
    builders.foreach { case (name, builder) =>
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        name, builder, "scala_udf")
    }
    // typed aggregators register through the UDF registry
    spark.udf.register("kmv64", KmvF.kmv(64))
    spark.udf.register("hll256", HllF.hll)
  }
}
