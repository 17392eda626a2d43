package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression}
import org.apache.spark.sql.graftbridge
import org.apache.spark.sql.types.{ArrayType, DoubleType}

import graft.functions.{SrpKeys, VectorDot}
import graft.operators.Dedup

/** SQL surface for graft's custom Catalyst expressions: after
  * `GraftFunctions.register(spark)`, plain `spark.sql` text can call
  * `vec_dot`, `minhash_sig`, `srp_keys`, `word_shingle_hashes`,
  * `char_shingle_hashes` — the engine's extensions behave like
  * built-ins for SQL users.
  */
object GraftFunctions {

  private def toDoubleArray(e: Expression): Expression =
    Cast(e, ArrayType(DoubleType))

  /** Name → builder for every SQL-callable graft expression — shared by
    * [[register]] (temp functions on an existing session) and
    * [[GraftExtensions]] (catalog injection at session build).
    */
  val all: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "vec_dot" -> (es => VectorDot(toDoubleArray(es(0)), toDoubleArray(es(1)))),
    "minhash_sig" -> (es => Dedup.MinHashSig(es.head, 64, 42L)),
    "srp_keys" -> (es => SrpKeys(toDoubleArray(es.head), 64, 6, 12, 42L)),
    "word_shingle_hashes" -> (es => Dedup.ShingleHashes(es.head, 3, word = true)),
    "char_shingle_hashes" -> (es => Dedup.ShingleHashes(es.head, 5, word = false)))

  def register(spark: SparkSession): Unit =
    all.foreach { case (name, builder) =>
      graftbridge.registerFunction(spark, name, builder)
    }
}
