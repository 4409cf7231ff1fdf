package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType}

/** Optimizer rule: rewrite the standard Spark idiom for a squared norm —
  *
  * {{{ aggregate(zip_with(v, v, (x, y) -> x * y), 0.0D, (s, t) -> s + t) }}}
  *
  * — into the codegen [[ArrayDot]] expression, so a user writing plain
  * higher-order functions gets the compiled primitive loop automatically
  * (HOF lambdas evaluate INTERPRETED, one boxed closure call per element).
  *
  * Soundness bounds the match deliberately:
  *  - both zip_with sides must be semantically EQUAL (the self product) —
  *    that is the only case where equal length is provable statically;
  *    for different arrays `zip_with` null-pads the shorter side and the
  *    whole fold returns null, while ArrayDot bounds by the shorter
  *    length, so a general rewrite would change results;
  *  - the element type must be `array<double>` with containsNull = false —
  *    a null element nulls the HOF fold but reads as 0.0 through
  *    ArrayDot's unsafe getter;
  *  - the multiply/add lambdas must reference their lambda variables in
  *    the canonical order (left-to-right fold, bit-identical float result).
  *
  * Registered two ways: [[GraftExtensions]] for
  * `spark.sql.extensions`-configured sessions, and appended to
  * `spark.experimental.extraOptimizations` by [[GraftFunctions.register]]
  * for already-built sessions (both land in the user-provided optimizer
  * batch, after constant folding has canonicalized the zero literal).
  */
object ArrayFoldRewrite extends Rule[LogicalPlan] {

  private def strictDoubleArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(DoubleType, false) => true
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case ArrayAggregate(
            ZipWith(a, b, LambdaFunction(Multiply(mx, my, _), Seq(zx, zy), _)),
            Literal(0.0, DoubleType),
            LambdaFunction(Add(ax, av, _), Seq(sa, sv), _),
            LambdaFunction(fin, Seq(sf), _))
          if a.semanticEquals(b) && strictDoubleArray(a) &&
            mx.semanticEquals(zx) && my.semanticEquals(zy) &&
            ax.semanticEquals(sa) && av.semanticEquals(sv) &&
            fin.semanticEquals(sf) =>
        ArrayDot(a, b)
    }
}

/** `spark.sql.extensions` entry point wiring graft's Catalyst extensions
  * into a session at build time.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectOptimizerRule(_ => ArrayFoldRewrite)
  }
}
