package graft.functions

import java.math.{BigDecimal => JBigDecimal}

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Exact decimal accumulator for [[WeightedMean]]: Σ(w·x) and Σw as
  * arbitrary-precision decimals — addition is associative and
  * commutative, so partial (map-side) and final aggregation compose in
  * any order with a bit-identical result. */
case class WSum(sumWX: JBigDecimal, sumW: JBigDecimal)

/** Weighted mean as a typed `Aggregator[IN, BUF, OUT]` — the rebuild's
  * UDAF surface (SURVEY.md §2c "UDAF" row).
  *
  * The reference's only aggregation surface is `Reduce(k2, V2_VEC)`
  * over a fully materialized group (MapReduceClient.h:50) — a "naive
  * UDAF" with no partial aggregation. An `Aggregator` is the idiomatic
  * Spark upgrade: Catalyst plans it as partial+final hash aggregation,
  * so each map task ships one 2-decimal buffer per group across the
  * exchange instead of the whole group — the difference between an
  * O(rows) and O(groups) shuffle at 100 TB.
  *
  * Numerics: inputs arrive as DECIMAL (already rounded through
  * decimal(38,6) by the caller, the cross-engine-exact convention in
  * [[graft.Num]]); sums are exact BigDecimal adds; the finish step is
  * one IEEE double division — identical in any engine.
  */
object WeightedMean extends Aggregator[(JBigDecimal, JBigDecimal), WSum, Double] {
  private val Z = JBigDecimal.ZERO

  override def zero: WSum = WSum(Z, Z)

  override def reduce(b: WSum, in: (JBigDecimal, JBigDecimal)): WSum =
    if (in._1 == null || in._2 == null) b
    else WSum(b.sumWX.add(in._1.multiply(in._2)), b.sumW.add(in._2))

  override def merge(a: WSum, b: WSum): WSum =
    WSum(a.sumWX.add(b.sumWX), a.sumW.add(b.sumW))

  override def finish(b: WSum): Double =
    if (b.sumW.signum == 0) Double.NaN
    else b.sumWX.doubleValue() / b.sumW.doubleValue()

  override def bufferEncoder: Encoder[WSum] = Encoders.product[WSum]
  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble

  /** Input encoder for `functions.udaf`: (x, w) as two DECIMAL args. */
  val inputEncoder: Encoder[(JBigDecimal, JBigDecimal)] =
    Encoders.tuple(Encoders.DECIMAL, Encoders.DECIMAL)
}
