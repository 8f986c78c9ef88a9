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
    // text-analysis surface (composite Column functions through the
    // Column<->Expression bridge; same builders as TextFunctions.register)
    import graft.functions.TextFunctions
    import org.apache.spark.sql.graft.ColumnBridge
    def textFn(name: String, usage: String)(
        f: org.apache.spark.sql.Column => org.apache.spark.sql.Column): Unit =
      e.injectFunction((FunctionIdentifier(name), info(name, usage),
        (es: Seq[Expression]) =>
          ColumnBridge.eagerExpression(f(ColumnBridge.column(es.head)))))
    textFn("quality_score", "pretraining quality score in [0,1]")(
      TextFunctions.qualityScore)
    textFn("lang_id", "heuristic language id: 'en' or 'unk'")(
      TextFunctions.langId(_))
    textFn("token_count", "whitespace token count")(TextFunctions.tokenCount)
    textFn("bpe_token_count", "BPE-ish pre-tokenization token count")(
      TextFunctions.bpeTokenCount)
    textFn("content_fingerprint", "md5 of whitespace-normalized text")(
      TextFunctions.contentFingerprint)
  }
}
