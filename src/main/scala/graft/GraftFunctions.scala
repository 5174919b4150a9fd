package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

import graft.functions.{MinHashSignature, ShingleHashes, SimHash64}

/** SQL surface for the custom codegen expressions — the (c)-tier extension
  * point: `spark.sql("SELECT shingle_hashes(text, 5) ...")` runs the SAME
  * Catalyst expression (same `doGenCode`, bit-identical output) as the
  * Column API, so SQL-only users get the dedup kernels without touching
  * Scala.
  *
  * Two registration paths, same builders:
  *  - [[GraftFunctions.register]] on any live session (notebooks, tests);
  *  - `spark.sql.extensions=graft.GraftExtensions` at session build time
  *    (clusters) via [[GraftExtensions]] — the injection survives
  *    `newSession()` clones, which per-session registration does not.
  */
object GraftFunctions {

  private def intLit(e: Expression, fn: String, pos: Int): Int = e match {
    case Literal(v: Int, _) => v
    case Literal(v: Long, _) => v.toInt
    case other => throw new IllegalArgumentException(
      s"$fn: argument $pos must be an integer literal, got $other")
  }

  /** (identifier, info, builder) triples — the exact shape
    * `SparkSessionExtensions.injectFunction` takes.
    */
  val all: Seq[(FunctionIdentifier, ExpressionInfo,
                Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("shingle_hashes"),
      new ExpressionInfo(classOf[ShingleHashes].getName, "shingle_hashes"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "usage: shingle_hashes(text, k)")
        ShingleHashes(args.head, intLit(args(1), "shingle_hashes", 2))
      }),
    (FunctionIdentifier("minhash_signature"),
      new ExpressionInfo(classOf[MinHashSignature].getName, "minhash_signature"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "usage: minhash_signature(hashes, numHashes)")
        MinHashSignature(args.head, intLit(args(1), "minhash_signature", 2))
      }),
    (FunctionIdentifier("simhash64"),
      new ExpressionInfo(classOf[SimHash64].getName, "simhash64"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "usage: simhash64(text)")
        SimHash64(args.head)
      }))

  /** Register every function on a live session (idempotent overwrite). */
  def register(spark: SparkSession): Unit =
    all.foreach { case (id, info, builder) =>
      spark.sessionState.functionRegistry.registerFunction(id, info, builder)
    }
}

/** `spark.sql.extensions` entry point — see [[GraftFunctions]]. Besides
  * the function surface it injects the optimizer rules: banded-levenshtein
  * comparison rewrite ([[graft.plans.BandedLevenshteinRule]]).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftFunctions.all.foreach(ext.injectFunction)
    ext.injectOptimizerRule(_ => graft.plans.BandedLevenshteinRule)
  }
}
