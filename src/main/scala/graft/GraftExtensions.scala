package graft

import graft.functions.kernels._
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions entry point: registers the codegen vector kernels
  * as SQL functions at session build time —
  * `spark.sql.extensions=graft.GraftExtensions` or
  * `SparkSession.builder().withExtensions(new GraftExtensions)`.
  * (Per-session registration is also available via
  * [[graft.functions.VectorExpressions.register]].)
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  private def info(name: String, usage: String) =
    new ExpressionInfo(classOf[GraftExtensions].getName, name, usage)

  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((FunctionIdentifier("vec_dot"),
      info("vec_dot", "dot product of two float arrays"),
      (es: Seq[Expression]) => DotProduct(es(0), es(1))))
    e.injectFunction((FunctionIdentifier("vec_l2"),
      info("vec_l2", "Euclidean distance of two float arrays"),
      (es: Seq[Expression]) => EuclideanDistance(es(0), es(1))))
    e.injectFunction((FunctionIdentifier("vec_cosine"),
      info("vec_cosine", "cosine similarity of two float arrays (zero-norm => 0)"),
      (es: Seq[Expression]) => CosineSimilarity(es(0), es(1))))
    e.injectFunction((FunctionIdentifier("vec_norm"),
      info("vec_norm", "L2 norm of a float array"),
      (es: Seq[Expression]) => VectorNorm(es.head)))
  }
}
