package graft.plans;

import org.apache.spark.sql.Column;
import org.apache.spark.sql.catalyst.expressions.Expression;

/**
 * Bridge between raw Catalyst {@link Expression}s and the public
 * {@link Column} API. Spark 4 scopes ExpressionUtils as
 * {@code private[sql]}, which Scala enforces at compile time but the
 * bytecode (public static methods) does not — plain Java can call it, the
 * supported pattern for third-party Catalyst expressions without forking a
 * package into {@code org.apache.spark.sql}.
 */
public final class ColumnBridge {
  private ColumnBridge() {}

  public static Column column(Expression e) {
    return org.apache.spark.sql.classic.ExpressionUtils.column(e);
  }

  public static Expression expression(Column c) {
    return org.apache.spark.sql.classic.ExpressionUtils.expression(c);
  }
}
