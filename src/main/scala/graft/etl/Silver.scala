package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.config.EtlConfig

/** Silver (UDV) stage: rename → enrich → quality-split.
  *
  * Reference: `/root/reference/notebooks/ETL_Entregas_Base.ipynb:580-677`
  * (`procesar_pais_udv`). Two stacked projections (collapsed by Catalyst's
  * `CollapseProject`) followed by complementary filters on `motivo_obs` —
  * a split, not a join/union, so the whole stage stays shuffle-free.
  */
object Silver {

  /** Snake-case / prefixed renames (`:588-597`; README req. 8). */
  def renamed(bronze: DataFrame): DataFrame =
    bronze.select(
      col("pais").as("cod_pais"),
      col("fecha_proceso").as("fec_proceso"),
      col("transporte").as("cod_transporte"),
      col("ruta").as("cod_ruta"),
      col("tipo_entrega").as("cod_tipo_entrega"),
      col("material").as("cod_material"),
      col("precio").as("mto_venta"),
      col("cantidad").as("cant_uni_medida"),
      col("unidad").as("cod_unidad_medida")
    )

  /** Enrichment projection (`:600-632`):
    *   - `precio_unitario_unidades = round(mto_venta / (cant * factor), 3)`
    *     guarded: NULL unless factor known ∧ cant > 0 ∧ venta non-null (`:607-615`);
    *   - `cant_unidades = round(cant * factor, 2)` guarded on factor ∧ cant > 0 (`:619-623`);
    *   - 3-valued `ind_rutina`/`ind_bonificacion`: NULL when the type is in
    *     neither list (`:624-629`) — such rows always carry
    *     ERR_TIPO_ENTREGA_NO_CONSIDERADA so the clean table never has NULL flags;
    *   - audit columns `des_fuente`, `fec_actualizacion_registro` (`:630-631`);
    *   - `motivo_obs` (Quality rule engine, `:566-576,632`).
    *
    * `auditTs` is injectable (defaults to `current_timestamp()`) so tests and
    * the oracle gate stay deterministic — divergence from the reference's bare
    * `current_timestamp()` documented in SURVEY §7.6.
    */
  def enriched(
      df: DataFrame,
      cfg: EtlConfig,
      sourcePath: String,
      auditTs: Column = current_timestamp()
  ): DataFrame = {
    val factor = Quality.factorExpr(col("cod_unidad_medida"), cfg.unitFactors)
    val cant = col("cant_uni_medida")
    val venta = col("mto_venta")
    val tipoNorm = upper(trim(col("cod_tipo_entrega")))

    val precioUnitario = when(
      factor.isNotNull && cant.isNotNull && cant > 0 && venta.isNotNull,
      round(venta / (cant * factor), 3)
    ).otherwise(lit(null)).cast(Schemas.unitPrice)

    val cantUnidades = when(
      factor.isNotNull && cant.isNotNull && cant > 0,
      round(cant * factor, 2)
    ).otherwise(lit(null)).cast(Schemas.qty)

    val indRutina = when(tipoNorm.isin(cfg.routineTypes: _*), lit(true))
      .when(tipoNorm.isin(cfg.bonusTypes: _*), lit(false))
      .otherwise(lit(null).cast("boolean"))

    val indBonificacion = when(tipoNorm.isin(cfg.bonusTypes: _*), lit(true))
      .when(tipoNorm.isin(cfg.routineTypes: _*), lit(false))
      .otherwise(lit(null).cast("boolean"))

    df.select(
      col("cod_pais"),
      col("fec_proceso"),
      col("cod_transporte"),
      col("cod_ruta"),
      col("cod_tipo_entrega"),
      col("cod_material"),
      venta,
      cant,
      col("cod_unidad_medida"),
      precioUnitario.as("precio_unitario_unidades"),
      cantUnidades.as("cant_unidades"),
      indRutina.as("ind_rutina"),
      indBonificacion.as("ind_bonificacion"),
      lit(sourcePath).as("des_fuente"),
      date_format(auditTs, "yyyy-MM-dd HH:mm:ss").as("fec_actualizacion_registro"),
      Quality.motivoObs(cfg).as("motivo_obs")
    )
  }

  /** Clean branch: no rule fired → drop the reason column (`:635-637`). */
  def clean(enriched: DataFrame): DataFrame =
    enriched.filter(col("motivo_obs").isNull).drop("motivo_obs")

  /** Quarantine branch: ≥1 rule fired → every column degraded to STRING so
    * unparseable values survive verbatim (`:655-669`).
    */
  def quarantine(enriched: DataFrame): DataFrame = {
    val allString = enriched.columns.map(c => col(c).cast("string").as(c))
    enriched.select(allString.toIndexedSeq: _*).filter(col("motivo_obs").isNotNull)
  }
}
