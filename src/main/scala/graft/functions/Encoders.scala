package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder

/** Shared typed-aggregator buffer encoders (CountMin, BottomK, …) —
  * a home of its own so no aggregator's compile silently depends on an
  * unrelated aggregator's source file. */
private[functions] object ExpressionEncoderHelp {
  implicit val longArray: Encoder[Array[Long]] =
    ExpressionEncoder[Array[Long]]()
}
