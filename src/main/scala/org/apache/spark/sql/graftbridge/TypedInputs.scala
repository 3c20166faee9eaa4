package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression}
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, LongType, StringType}

/** Analysis-time input-type contracts for custom expressions.
  *
  * `AbstractDataType` (the element type of `ExpectsInputTypes.inputTypes`)
  * is `private[sql]` in Spark 4, so an expression living in the `graft`
  * package can't write the override itself. These traits live under
  * `org.apache.spark.sql` solely to regain that access — same rationale as
  * [[ColumnBridge]] — and let misuse (e.g. a LONG child under a
  * string-hash expression) fail as an AnalysisException instead of a
  * runtime codegen/ClassCastException.
  */
trait ExpectsStringInput extends ExpectsInputTypes { self: Expression =>
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
}

trait ExpectsStringArrayInput extends ExpectsInputTypes { self: Expression =>
  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
}

trait ExpectsLongInput extends ExpectsInputTypes { self: Expression =>
  override def inputTypes: Seq[AbstractDataType] = Seq(LongType)
}
