package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Bronze (RDV) stage: raw CSV → typed → one-country/date-range slice.
  *
  * Reference: `/root/reference/notebooks/ETL_Entregas_Base.ipynb:474-507`
  * (`procesar_pais_rdv`). Declarative scan→project→filter; Catalyst pushes the
  * country equality down to the CSV scan, the date predicates stay above the
  * projection because `fecha_proceso` is derived by `to_date`.
  */
object Bronze {

  /** CSV scan with the fixed 9-column schema, header on, inference off
    * (`:477-480`). Permissive mode keeps malformed rows as NULL-padded rows.
    */
  def readRaw(spark: SparkSession, csvPath: String): DataFrame =
    spark.read
      .schema(Schemas.csvSchema)
      .option("header", "true")
      .option("inferSchema", "false")
      .option("mode", "PERMISSIVE")
      .csv(csvPath)

  /** Typing projection (`:482-491`):
    *   - `fecha_proceso`: strip embedded whitespace, parse `yyyyMMdd`
    *     (`regexp_replace` + `to_date`, `:484`) — unparseable → NULL (ANSI off).
    *   - `precio`/`cantidad`: double → decimal(21,2) (`:489-490`).
    */
  def typed(raw: DataFrame): DataFrame =
    raw.select(
      col("pais"),
      to_date(regexp_replace(col("fecha_proceso"), "\\s+", ""), "yyyyMMdd")
        .as("fecha_proceso"),
      col("transporte"),
      col("ruta"),
      col("tipo_entrega"),
      col("material"),
      col("precio").cast(Schemas.money).as("precio"),
      col("cantidad").cast(Schemas.qty).as("cantidad"),
      col("unidad")
    )

  /** The only WHERE in the reference (`:496-499`): country equality plus an
    * inclusive date range. Rows whose date failed to parse have NULL
    * `fecha_proceso`, fail the range predicate, and are silently dropped —
    * semantics to preserve.
    */
  def slice(df: DataFrame, country: String, startDate: String, endDate: String): DataFrame =
    df.filter(
      col("pais") === country &&
        col("fecha_proceso").between(to_date(lit(startDate)), to_date(lit(endDate)))
    )

  /** Full Bronze read for one country run. */
  def apply(
      spark: SparkSession,
      csvPath: String,
      country: String,
      startDate: String,
      endDate: String
  ): DataFrame =
    slice(typed(readRaw(spark, csvPath)), country, startDate, endDate)
}
