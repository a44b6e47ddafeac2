package graft.plans

import graft.functions._
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule

/** Algebraic rewrite over the graft vector expressions:
  * `vec_dot(a, a)` → `vec_norm_sq(a)` — a self-dot IS the squared norm
  * (identical left-to-right double arithmetic, so the rewrite is
  * bit-exact; PlanSuite pins both the firing and the values). Guarded on
  * determinism: rewriting a non-deterministic child would collapse two
  * evaluations into one and change semantics.
  *
  * Deliberately a tiny rule — its job is to demonstrate the optimizer
  * extension seam the engine reserves for plan-level work that
  * per-expression registration can't reach (SURVEY §2.2): the same
  * injection point would carry e.g. a pushdown of hamming-band filters
  * into the scan, or a join-to-broadcast promotion keyed on sketch
  * cardinalities.
  */
object VecSelfDotRule extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case VecDot(a, b) if a.deterministic && a.semanticEquals(b) =>
        VecNormSq(a)
    }
}

/** `spark.sql.extensions=graft.plans.GraftExtensions` wires the whole
  * library into a session at build time — every custom function plus the
  * optimizer rule — with no imperative `Tables.conf` call. This is the
  * integration path for a cluster deployment (spark-defaults.conf /
  * spark-submit --conf); the imperative registration in `Tables.conf`
  * remains for driver-built sessions that predate the config.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String) =
    new ExpressionInfo("graft", null, name, usage, "")

  private val functions: Seq[(String, String, Seq[Expression] => Expression)] = Seq(
    ("vec_dot", "vec_dot(a, b) - dot product of two float vectors",
      es => VecDot(es(0), es(1))),
    ("vec_norm_sq", "vec_norm_sq(a) - squared L2 norm of a float vector",
      es => VecNormSq(es(0))),
    ("simhash60", "simhash60(hs) - 60-bit SimHash over token hashes",
      es => SimHash60(es(0))),
    ("sorted_intersect_size",
      "sorted_intersect_size(a, b) - |a ∩ b| of two sorted long arrays",
      es => SortedLongIntersectSize(es(0), es(1))),
    ("minhash_signature",
      "minhash_signature(arr, k) - k-slot MinHash signature of a hash array",
      es => MinHashSignature(es(0), es(1).eval().asInstanceOf[Int])),
    ("minhash_sketch",
      "minhash_sketch(th, k) - k-slot MinHash sketch aggregate over hashes",
      es => MinHashSketchAgg(es(0), es(1).eval().asInstanceOf[Int])))

  override def apply(ext: SparkSessionExtensions): Unit = {
    functions.foreach { case (name, usage, builder) =>
      ext.injectFunction((FunctionIdentifier(name), info(name, usage), builder))
    }
    ext.injectOptimizerRule(_ => VecSelfDotRule)
    ext.injectPlannerStrategy(_ => AsOfJoinStrategy)
  }
}
