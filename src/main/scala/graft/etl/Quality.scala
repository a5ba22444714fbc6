package graft.etl

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.config.EtlConfig

/** The config-compiled expressions at the heart of the reference pipeline:
  * the unit-factor lookup and the six data-quality rules folded into a single
  * pipe-joined reason string (`/root/reference/notebooks/ETL_Entregas_Base.ipynb:561-576,632`).
  *
  * Everything here is a pure `Column` expression — config compiles into the
  * plan (constant-folded literal map / isin lists), so there is no join, no
  * UDF, and no shuffle: the whole rule engine rides inside whole-stage codegen.
  */
object Quality {

  /** Literal unit→factor map (`map_from_arrays` over config,
    * `ETL_Entregas_Base.ipynb:222-224`). `element_at` on a missing key yields
    * NULL — load-bearing: NULL factor feeds rule R4 and the derived-column
    * guards.
    */
  def factorMap(unitFactors: Map[String, Double]): Column =
    typedLit(unitFactors)

  /** Normalized unit code: `upper(trim(...))` (`:563`). */
  def normUnit(unit: Column): Column = upper(trim(unit))

  /** factor_expr (`:561-563`): NULL when the unit is unknown. */
  def factorExpr(unit: Column, unitFactors: Map[String, Double]): Column =
    element_at(factorMap(unitFactors), normUnit(unit))

  /** Error codes, declaration order = order in the reason string (`:568-576`). */
  val ErrCantNull = "ERR_CANT_NULL"
  val ErrCantNoPositiva = "ERR_CANT_NO_POSITIVA"
  val ErrSinMaterial = "ERR_SIN_MATERIAL_CONOCIDO"
  val ErrUnidadDesconocida = "ERR_UNIDAD_DESCONOCIDA"
  val ErrVentaNoPositiva = "ERR_VENTA_NO_POSITIVA"
  val ErrTipoEntrega = "ERR_TIPO_ENTREGA_NO_CONSIDERADA"

  /** The six rules over the renamed (silver-shaped) columns, expressed on the
    * generalized [[graft.ops.RuleEngine]] (one fold implementation, not two):
    * each is `when(cond, code)`, NULL-skipped by `concat_ws("|")`, pipe-joined
    * in declaration order (`:566-576`), NULL when no rule fires (`:632`).
    *
    * Semantics pinned by the reference:
    *   - NULL `mto_venta` is NOT an error — only `<= 0` is (`:573-574`).
    *   - `cant <= 0` fires only when cant IS NOT NULL (`:569-570`).
    *   - type membership is on `upper(trim(...))` (`:575`).
    *
    * Deliberate divergence: a NULL delivery type fires
    * ERR_TIPO_ENTREGA_NO_CONSIDERADA. In the reference `~isin(...)` is NULL
    * for NULL input, so such rows slip into the CLEAN table with NULL
    * indicator flags — contradicting its own invariant that clean rows always
    * have non-null flags. We quarantine them instead.
    */
  def rules(
      cantUniMedida: Column,
      codMaterial: Column,
      codUnidadMedida: Column,
      mtoVenta: Column,
      codTipoEntrega: Column,
      cfgFactors: Map[String, Double],
      knownTypes: Seq[String]
  ): Seq[graft.ops.RuleEngine.Rule] = {
    import graft.ops.RuleEngine.Rule
    val factor = factorExpr(codUnidadMedida, cfgFactors)
    val tipoNorm = upper(trim(codTipoEntrega))
    Seq(
      Rule(ErrCantNull, cantUniMedida.isNull),
      Rule(ErrCantNoPositiva, cantUniMedida.isNotNull && cantUniMedida <= 0),
      Rule(ErrSinMaterial, codMaterial.isNull),
      Rule(ErrUnidadDesconocida, factor.isNull),
      Rule(ErrVentaNoPositiva, mtoVenta.isNotNull && mtoVenta <= 0),
      Rule(ErrTipoEntrega, tipoNorm.isNull || !tipoNorm.isin(knownTypes: _*))
    )
  }

  def motivoObs(
      cantUniMedida: Column,
      codMaterial: Column,
      codUnidadMedida: Column,
      mtoVenta: Column,
      codTipoEntrega: Column,
      cfgFactors: Map[String, Double],
      knownTypes: Seq[String]
  ): Column =
    graft.ops.RuleEngine.reasons(
      rules(cantUniMedida, codMaterial, codUnidadMedida, mtoVenta, codTipoEntrega,
        cfgFactors, knownTypes))

  /** Convenience: build motivo_obs from an [[EtlConfig]]. */
  def motivoObs(cfg: EtlConfig): Column =
    motivoObs(
      col("cant_uni_medida"),
      col("cod_material"),
      col("cod_unidad_medida"),
      col("mto_venta"),
      col("cod_tipo_entrega"),
      cfg.unitFactors,
      cfg.knownTypes
    )
}
