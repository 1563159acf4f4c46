package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.types.{ArrayType, DataType, MapType, StructType}

/** Schema-evolution seam for append-mode parquet tables — the
  * lakehouse answer to the reference's device-template evolution (an
  * IoT Central template gains a sensor → the telemetry envelope gains
  * a field; `raw-data-template.json` vs later vintages). Parquet
  * happily appends files of DIFFERENT schemas into one directory, and
  * a plain `spark.read.parquet` then picks ONE footer's schema — which
  * files win depends on listing order, so a grown column silently
  * vanishes from some reads. This seam makes the two safe moves
  * explicit:
  *
  *  - [[read]]: union-of-schemas read (`mergeSchema`) — rows from
  *    files written before a column existed surface it as NULL, and
  *    irreconcilable TYPE conflicts fail the read loudly (Spark's
  *    merge refusal) instead of coercing.
  *  - [[append]]: schema-checked append — the batch must carry every
  *    existing column at the IDENTICAL type (supersets allowed: new
  *    columns may be added, existing ones never dropped or retyped).
  *    The check reads one merged-schema footprint, not the data, so
  *    it is metadata-priced at any table size. A violating batch
  *    refuses BEFORE any file lands — the table never enters the
  *    mixed-type state that poisons later reads.
  *
  * Columns may only be ADDED over a table's lifetime, never renamed or
  * retyped — rename = add new + backfill, the boring-but-safe protocol
  * every production lakehouse runs. Type WIDENING (int → long) is
  * deliberately refused too: parquet readers cannot merge the physical
  * types, so widening requires a rewrite (`Maintenance.atomicSwap` is
  * the tool), not an append. */
object Evolving {

  /** Union-of-schemas read: every column ever written, older rows
    * null-filled for columns they predate. */
  def read(spark: SparkSession, dir: String): DataFrame =
    spark.read.option("mergeSchema", "true").parquet(dir)

  /** Fields in `table` that `batch` is missing or retypes (nullability
    * differences are not violations — parquet stats make every column
    * optional per file anyway). The compare is nullability-INSENSITIVE
    * at every nesting level (`asNullable` both sides), not just the
    * top field: write/read round-trips routinely flip
    * `ArrayType.containsNull` and nested StructField nullability, and
    * a legitimate array/struct append must not be refused for that. */
  private def violations(table: StructType, batch: StructType): Seq[String] =
    table.fields.toSeq.flatMap { f =>
      batch.fields.find(_.name.equalsIgnoreCase(f.name)) match {
        case None => Some(s"${f.name}: dropped (existing ${f.dataType.sql})")
        case Some(b) if normalize(b.dataType) != normalize(f.dataType) =>
          Some(s"${f.name}: ${f.dataType.sql} -> ${b.dataType.sql}")
        case _ => None
      }
    }

  /** Recursively force every nullability flag true, so the compare
    * sees only the value types. */
  private def normalize(dt: DataType): DataType = dt match {
    case StructType(fs) => StructType(fs.map(f =>
      f.copy(dataType = normalize(f.dataType), nullable = true,
        metadata = org.apache.spark.sql.types.Metadata.empty)))
    case ArrayType(et, _) => ArrayType(normalize(et), containsNull = true)
    case MapType(kt, vt, _) =>
      MapType(normalize(kt), normalize(vt), valueContainsNull = true)
    case other => other
  }

  /** Append `batch` to `dir`, refusing loudly unless the batch schema
    * is a same-typed SUPERSET of everything already written. First
    * write (no table yet) establishes the schema. */
  def append(batch: DataFrame, dir: String): Unit = {
    val spark = batch.sparkSession
    val existing: Option[StructType] =
      try Some(read(spark, dir).schema)
      catch {
        case e: org.apache.spark.sql.AnalysisException
            if Set("PATH_NOT_FOUND", "UNABLE_TO_INFER_SCHEMA")
              .contains(e.getCondition) => None
      }
    existing.foreach { t =>
      val bad = violations(t, batch.schema)
      require(bad.isEmpty,
        s"schema evolution refused for $dir — columns may only be ADDED " +
          s"(rename = add + backfill; widen = rewrite via atomicSwap): " +
          bad.mkString("; "))
    }
    batch.write.mode(SaveMode.Append).parquet(dir)
  }
}
