package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** Deterministic sampled-oracle stratum, shared by every reader of the
  * doc-keyed tables: when SPARK_GRAFT_STRATUM="m:r" is set, restrict to
  * key % m = r. compare_oracles.py applies the identical predicate when
  * registering its DuckDB views (STRATUM env), so the quadratic
  * brute-force oracles (all-pairs simhash/ngram, recursive clustering,
  * per-row minhash lambdas) can be hash-compared bit-exactly at sf0.1 on
  * a stratum instead of being skipped outright. Unset, a no-op. */
object Stratum {
  def apply(df: DataFrame, key: String): DataFrame =
    sys.env.get("SPARK_GRAFT_STRATUM") match {
      case Some(s) =>
        val Array(m, r) = s.split(":").map(_.toLong)
        df.filter(col(key) % m === r)
      case None => df
    }
}
