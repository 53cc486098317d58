package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted equi-join — the manual skew remedy for when one join key
  * carries a disproportionate share of the fact table and AQE's
  * skew-join split cannot apply (e.g. the skewed side feeds an
  * aggregation that must stay co-partitioned). The fact side fans its
  * rows across `salts` sub-keys via a deterministic per-row salt; the
  * (small) dim side replicates `salts`×. The join result is
  * row-identical to the plain equi-join — salting only changes the
  * partitioning, splitting each hot key's rows over `salts` reducers.
  */
object SkewJoin {

  /** `saltBy` must be a deterministic per-row expression on the FACT
    * side with decent spread inside a key group (a row id, not the join
    * key itself — salting by the join key keeps every hot-key row on
    * one reducer and defeats the point). */
  def saltedJoin(fact: DataFrame, factKey: String, dim: DataFrame,
      dimKey: String, salts: Int, saltBy: Column): DataFrame = {
    require(salts >= 2, "salting below 2 is a plain join")
    val fs = fact.withColumn("__salt", pmod(saltBy, lit(salts.toLong)))
    val ds = dim.withColumn("__salt",
      explode(sequence(lit(0L), lit(salts.toLong - 1))))
    fs.join(ds, fs(factKey) === ds(dimKey) && fs("__salt") === ds("__salt"))
      .drop("__salt")
  }
}
