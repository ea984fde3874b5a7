package org.apache.spark.sql.graft

import org.apache.spark.sql.connector.expressions.filter.Predicate
import org.apache.spark.sql.sources.Filter

/** `private[sql]` door #2: `PredicateUtils.toV1` is Spark's own
  * DSv2-predicate → V1-filter lowering (the exact translation
  * `SupportsDelete` connectors consumed for years). Re-deriving it
  * outside would mean re-implementing the V2 expression tree walk and
  * drifting from Spark's semantics; exposing the one method from this
  * package keeps the manifest catalog's DELETE translation bit-equal
  * to what Spark hands every other V1-filter consumer. */
object PredicateShim {
  def toV1(p: Predicate): Option[Filter] =
    org.apache.spark.sql.internal.connector.PredicateUtils.toV1(p)
}
