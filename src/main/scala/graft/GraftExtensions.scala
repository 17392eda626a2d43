package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** Session-build-time injection of graft's SQL functions — the
  * deployment shape for a shared cluster, where the library is enabled
  * for EVERY session (including pure-SQL clients that never touch the
  * Scala API) via config alone:
  *
  * {{{
  * spark-submit --conf spark.sql.extensions=graft.GraftExtensions ...
  * // or
  * SparkSession.builder().withExtensions(new GraftExtensions) ...
  * }}}
  *
  * Injected functions are registered in the session's catalog as
  * built-ins (visible to `SHOW FUNCTIONS`, usable from any SQL text),
  * unlike [[GraftFunctions.register]]'s per-session temp functions —
  * keep the latter for notebook/REPL use on an existing session.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit =
    GraftFunctions.all.foreach { case (name, builder) =>
      ext.injectFunction((
        new FunctionIdentifier(name),
        new ExpressionInfo(classOf[GraftExtensions].getName, name),
        builder))
    }
}
