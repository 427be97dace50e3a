package graft.spark

import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.IntegerType

/** H3-aware algebraic rewrites.
  *
  * - parent-of-parent collapse: `h3_cell_to_parent(h3_cell_to_parent(c, r1), r2)`
  *   with literal r2 <= r1 is `h3_cell_to_parent(c, r2)` — naive tile
  *   pyramids written against the base cell column lose a kernel call per
  *   level without this.
  * - resolution-of-index shortcut: `h3_get_resolution(h3_latlng_to_cell(_, _, r))`
  *   is `r` for a literal in-range r (the projection is then pruned away
  *   entirely if the cell isn't otherwise used). Nullability is preserved:
  *   the shortcut only fires when the inputs are non-nullable.
  */
object H3OptimizerRule extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case CellToParent(CellToParent(cell, Literal(r1: Int, IntegerType)),
                        outer @ Literal(r2: Int, IntegerType))
          if r2 <= r1 && r2 >= 0 =>
        CellToParent(cell, outer)

      case CellResolution(LatLngToCell(lat, lng, Literal(r: Int, IntegerType)))
          if r >= 0 && r <= 15 && !lat.nullable && !lng.nullable =>
        Literal(r, IntegerType)
    }
}
