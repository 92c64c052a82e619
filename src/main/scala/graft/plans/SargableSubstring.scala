package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Rewrite `substring(s, 1, n) = 'lit'` into a sargable prefix predicate
  * (reference: test/sql/query/substr_filter_pushdown.test:1 — the
  * reference compiles the same shape into a `$substrCP` Mongo `$expr` so
  * its scan can evaluate it server-side; Spark's filter translation has
  * no substring form at all, so without this rule the predicate stays
  * residual above EVERY scan).
  *
  * Exact by case analysis on the literal's char length vs the window:
  *   - len(lit) == n  →  `StartsWith(s, lit)` (char-prefix equality is
  *     byte-prefix equality under default UTF8 binary collation; both
  *     forms null-propagate on s identically)
  *   - len(lit) <  n  →  `s = lit` (the window reaches past the string's
  *     end only when the whole string was shorter than n, in which case
  *     substring returns the whole string)
  *   - len(lit) >  n  →  can never match; left alone (no scan benefit,
  *     and rewriting to FALSE would have to preserve null-on-null-input)
  *
  * Runs in the operator-optimization batch (injected via
  * `injectOptimizerRule`), BEFORE early scan pushdown — so the rewritten
  * `StartsWith`/`EqualTo` translates into the v1/v2 filter forms both
  * the parquet source and the docstore source already push.
  *
  * Only default-collation strings rewrite (a collated StringType does
  * not pattern-match the default singleton) — collation-aware prefix
  * semantics differ from byte prefixes.
  */
object SargableSubstring extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressionsWithPruning(
      _.containsPattern(org.apache.spark.sql.catalyst.trees.TreePattern.BINARY_COMPARISON)) {
      case eq @ EqualTo(
          Substring(s, Literal(1, IntegerType), Literal(n: Int, IntegerType)),
          l @ Literal(v: UTF8String, StringType)) if v != null && n >= 1 =>
        rewrite(s, n, v, l).getOrElse(eq)
      case eq @ EqualTo(
          l @ Literal(v: UTF8String, StringType),
          Substring(s, Literal(1, IntegerType), Literal(n: Int, IntegerType)))
          if v != null && n >= 1 =>
        rewrite(s, n, v, l).getOrElse(eq)
      // The MQL path: the docstore filter/pipeline compiler renders Mongo
      // `$eq` as null-SAFE equality (`<=>`, Mongo's null==null contract —
      // reference mongo_expr_pushdown.cpp compiles `$substrCP`-in-`$expr`
      // server-side the same way). For a NON-null literal the null-safe
      // form differs from EqualTo only on null input, where it is false —
      // exactly `IsNotNull(s) AND <EqualTo-rewrite>`, both conjuncts of
      // which are standard pushable filter shapes.
      case eq @ EqualNullSafe(
          Substring(s, Literal(1, IntegerType), Literal(n: Int, IntegerType)),
          l @ Literal(v: UTF8String, StringType)) if v != null && n >= 1 =>
        rewrite(s, n, v, l).map(And(IsNotNull(s), _)).getOrElse(eq)
      case eq @ EqualNullSafe(
          l @ Literal(v: UTF8String, StringType),
          Substring(s, Literal(1, IntegerType), Literal(n: Int, IntegerType)))
          if v != null && n >= 1 =>
        rewrite(s, n, v, l).map(And(IsNotNull(s), _)).getOrElse(eq)
    }

  private def rewrite(s: Expression, n: Int, v: UTF8String,
      l: Literal): Option[Expression] =
    if (s.dataType != StringType) None
    else if (v.numChars == n) Some(StartsWith(s, l))
    else if (v.numChars < n) Some(EqualTo(s, l))
    else None
}
