package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.col

package object operators {
  /** `$"name"` column interpolator without needing a SparkSession's
    * `implicits._` in scope (operators are session-agnostic builders).
    */
  implicit class ColumnInterpolator(private val sc: StringContext) extends AnyVal {
    def $(args: Any*): Column = col(sc.s(args: _*))
  }
}
