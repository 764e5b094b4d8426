package graft.build

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** SI unit conversion shadow fields (reference: convertUnits/convertValue,
  * Lucene.java:1650-1692 — whenever a parameter's `type.units` is set,
  * `numericValue`/`rangeTop`/`rangeBottom` are converted to SI and added
  * as `*SI` fields next to a `type.unitsSI` keyword). The reference
  * delegates the algebra to a units library configured by the
  * `units` property (`run.properties:12`:
  * `J: eV 1.602176634e-19; ℃: celsius, degC; K: kelvin`); this
  * from-scratch table carries the same enabled conversions as
  * (alias → SI unit, scale, offset) with value_si = value·scale + offset.
  */
object Units {

  final case class SiValue(units: String, value: Double)

  /** alias → (SI unit symbol, scale, offset). */
  val conversions: Map[String, (String, Double, Double)] = Map(
    "J"       -> ("J", 1.0, 0.0),
    "eV"      -> ("J", 1.602176634e-19, 0.0),
    "celsius" -> ("K", 1.0, 273.15),
    "degC"    -> ("K", 1.0, 273.15),
    "℃"  -> ("K", 1.0, 273.15),
    "K"       -> ("K", 1.0, 0.0),
    "kelvin"  -> ("K", 1.0, 0.0))

  /** Driver-side conversion (the reference's convertValueToSiUnits
    * shape): None when the unit is not enabled — the reference then adds
    * no SI fields. */
  def convertValueToSiUnits(value: Double, units: String): Option[SiValue] =
    conversions.get(units).map { case (si, scale, offset) =>
      SiValue(si, value * scale + offset)
    }

  /** SI unit symbol column for a unit-alias column (null when unknown). */
  def siUnitsCol(unitCol: Column): Column =
    conversions.foldLeft(lit(null).cast("string")) { case (acc, (alias, (si, _, _))) =>
      when(unitCol === alias, si).otherwise(acc)
    }

  /** Converted-value column (null when the unit is unknown — mirroring
    * the reference skipping the SI fields). Chained `when` over the small
    * enabled-conversions table: pure codegen, no UDF, no join. */
  def siValueCol(valueCol: Column, unitCol: Column): Column =
    conversions.foldLeft(lit(null).cast("double")) {
      case (acc, (alias, (_, scale, offset))) =>
        when(unitCol === alias, valueCol * scale + offset).otherwise(acc)
    }

  /** Add the reference's shadow fields: `unitsSI` plus `<f>SI` for every
    * requested numeric field (numericValue/rangeTop/rangeBottom in the
    * reference; any numeric columns here). */
  def withSiColumns(df: DataFrame, unitCol: String, fields: Seq[String]): DataFrame = {
    val withUnits = df.withColumn("unitsSI", siUnitsCol(col(unitCol)))
    fields.foldLeft(withUnits) { (d, f) =>
      d.withColumn(s"${f}SI", siValueCol(col(f), col(unitCol)))
    }
  }
}
