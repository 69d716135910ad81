package graft.plans

import org.apache.spark.sql.catalyst.expressions.{
  Alias, Attribute, AttributeReference, AttributeSet, CreateArray,
  CreateNamedStruct, Explode, Expression, GetStructField, Literal,
  PredicateHelper}
import org.apache.spark.sql.catalyst.plans.logical.{
  Filter, Generate, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule

/** Filter pushdown THROUGH an explode of statically-tagged structs.
  *
  * The statement write path unpivots wide rows through
  * `explode(array(struct(value, prop-literal, prop_type-literal, …)))`
  * (Statements.unpivot). A downstream filter on the literal tag
  * columns — `prop_type = 'name'`, `prop = 'country'` — reaches the
  * Generate and stops: Catalyst never looks INSIDE the array literal
  * structure, so a names-only query still evaluates and scans every
  * property element (measured: f6's customer scan read all 5 prop
  * columns for a names-only fpx feed).
  *
  * This rule evaluates each filter conjunct against each array element
  * by substituting the element's field expressions for the generator
  * output's `GetStructField`s; conjuncts whose substitution folds to a
  * constant are decided statically, and elements decided false (or
  * null — Filter drops those rows anyway) are removed from the array.
  * Column pruning then drops the dead elements' input columns from the
  * scan in the same fixed point — the 100 TB payoff: a names-only
  * query reads ONE property column instead of all of them.
  *
  * Conservative by construction: an element is only dropped when every
  * reference to the generator output resolves to a foldable expression
  * and the conjunct evaluates without the row; anything else keeps the
  * element and the Filter stays in place regardless (pruning only
  * removes rows the Filter was about to discard).
  */
object PruneStaticExplodeFilter extends Rule[LogicalPlan] with PredicateHelper {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond,
        g @ Generate(Explode(ca: CreateArray), _, false, _, out, _))
        if out.size == 1 && ca.children.size > 1 =>
      val attr = out.head
      val conjuncts = splitConjunctivePredicates(cond)
      val kept = ca.children.filter { elem =>
        conjuncts.forall(c => staticEval(c, attr, elem).getOrElse(true))
      }
      if (kept.size == ca.children.size) f
      else {
        val pruned =
          if (kept.nonEmpty) CreateArray(kept, ca.useStringTypeWhenEmpty)
          else Literal.create(Seq.empty[Any], ca.dataType)
        val newGen = Explode(pruned)
        // ColumnPruning won't revisit this Generate (by the time we fire,
        // its unrequiredChildIndex is set and the Project above it has
        // been collapsed), so push the narrowing into the child ourselves:
        // keep only the pass-through attrs plus what the pruned generator
        // still reads, and recompute unrequiredChildIndex against the new
        // child output. This is what lets the scan drop the dead columns.
        val passThrough = AttributeSet(g.requiredChildOutput)
        val needed = passThrough ++ newGen.references
        val newChild =
          if ((g.child.outputSet -- needed).isEmpty) g.child
          else Project(g.child.output.filter(needed.contains), g.child)
        val newUnrequired = newChild.output.zipWithIndex
          .collect { case (a, i) if !passThrough.contains(a) => i }
        Filter(cond, g.copy(generator = newGen, child = newChild,
          unrequiredChildIndex = newUnrequired))
      }
  }

  /** Statically decide `conjunct` for one array element: Some(verdict)
    * when every generator-output reference substitutes to a foldable
    * expression (null verdict = false — Filter drops nulls), None when
    * the conjunct depends on row data.
    */
  private def staticEval(
      conjunct: Expression,
      attr: Attribute,
      elem: Expression): Option[Boolean] = {
    var decidable = true
    // top-down: the GetStructField case must claim the node before the
    // bare-attribute case sees the attr reference inside it
    val substituted = conjunct.transformDown {
      case GetStructField(a: AttributeReference, ord, _)
          if a.exprId == attr.exprId =>
        elem match {
          case s: CreateNamedStruct => s.valExprs(ord) match {
            case Alias(child, _) => child
            case e => e
          }
          case _ => decidable = false; a
        }
      case a: AttributeReference if a.exprId == attr.exprId =>
        decidable = false; a
    }
    if (!decidable || substituted.references.nonEmpty || !substituted.foldable)
      None
    else substituted.eval(null) match {
      case b: java.lang.Boolean => Some(b.booleanValue())
      case null => Some(false)
      case _ => None
    }
  }
}
