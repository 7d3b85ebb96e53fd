package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Reproducible keep/drop predicates for corpus mixing. */
object Mix {

  /** Keep a row iff its key hashes below `pct` (0-100): Knuth
    * multiplicative hashing decorrelates the predicate from raw id
    * ranges, and the arithmetic is OVERFLOW-CRITICAL — the key is
    * reduced mod a prime BEFORE the multiply so the product stays
    * within 2^63 for any 64-bit id. Spark would wrap silently where
    * DuckDB's BIGINT errors, so both engines must run the identical
    * never-overflowing expression (`((key % 100000007) * 2654435761) %
    * 100 < pct` in the oracles). Single source of truth for q47 and
    * [[graft.operators.TrainingShards]] — do not re-inline. */
  def keepPredicate(key: Column, pct: Column): Column =
    pmod(pmod(key, lit(100000007L)) * 2654435761L, lit(100L)) < pct
}
