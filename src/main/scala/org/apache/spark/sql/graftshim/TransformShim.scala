package org.apache.spark.sql.graftshim

import org.apache.spark.sql.connector.expressions.{FieldReference, IdentityTransform, Transform}

/** The DSv2 transform case classes (`IdentityTransform`, `FieldReference`)
  * are `private[sql]`; connectors outside the sql namespace can only see
  * the `Transform` interface. This shim re-exports the one match graft's
  * interop providers need — "is this PARTITIONED BY entry a plain
  * top-level identity column?" — for CREATE-on-first-write table
  * creation. No Spark internals are modified. */
object TransformShim {
  /** Some(column) for `identity(col)` over a single-part field; None for
    * any other transform (bucket/days/…), which callers reject loudly. */
  def identityColumn(t: Transform): Option[String] = t match {
    case IdentityTransform(FieldReference(parts)) if parts.length == 1 =>
      Some(parts.head)
    case _ => None
  }
}
