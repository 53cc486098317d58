package graft.exprs

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.udf

/** C-math tail for the jq builtin surface (`lib/processor/jq.go` embeds
  * gojq, whose math.go binds libm 1:1). Like [[JqStrings]], these are
  * rarely-hot correctness surface — plain UDFs over `java.lang.Math`
  * where the JVM has the exact libm counterpart, and a Lanczos
  * approximation for the gamma family (the JVM has none; coefficients
  * are the standard published g=7, n=9 set). Hot paths never touch
  * these; the common math (`sqrt`/`pow`/`exp`/`log*`/trig) stays native
  * Catalyst in the Bloblang compiler.
  */
object JqMath {

  // Lanczos approximation, g = 7, n = 9 (the widely published
  // double-precision coefficient set; ~15 significant digits).
  private val g = 7.0
  private val c = Array(
    0.99999999999980993, 676.5203681218851, -1259.1392167224028,
    771.32342877765313, -176.61502916214059, 12.507343278686905,
    -0.13857109526572012, 9.9843695780195716e-6, 1.5056327351493116e-7)

  /** True gamma Γ(x); reflection formula below 0.5. Poles (x a
    * non-positive integer) return NaN like C tgamma on -n. */
  def tgammaD(x: Double): Double =
    if (x.isNaN) Double.NaN
    else if (x <= 0.0 && x == Math.floor(x)) Double.NaN
    else if (x < 0.5) Math.PI / (Math.sin(Math.PI * x) * tgammaD(1.0 - x))
    else {
      val z = x - 1.0
      var a = c(0)
      val t = z + g + 0.5
      var i = 1
      while (i < c.length) { a += c(i) / (z + i); i += 1 }
      Math.sqrt(2.0 * Math.PI) * Math.pow(t, z + 0.5) * Math.exp(-t) * a
    }

  /** log|Γ(x)| — what C lgamma (and therefore jq's `lgamma`, and jq's
    * `gamma`, an lgamma alias in libm tradition) returns. Computed in
    * log form so large x doesn't overflow. */
  def lgammaD(x: Double): Double =
    if (x.isNaN) Double.NaN
    else if (x == 1.0 || x == 2.0) 0.0 // Γ(1) = Γ(2) = 1, exact like libm
    else if (x <= 0.0 && x == Math.floor(x)) Double.PositiveInfinity
    else if (x < 0.5)
      Math.log(Math.PI / Math.abs(Math.sin(Math.PI * x))) - lgammaD(1.0 - x)
    else {
      val z = x - 1.0
      var a = c(0)
      val t = z + g + 0.5
      var i = 1
      while (i < c.length) { a += c(i) / (z + i); i += 1 }
      0.5 * Math.log(2.0 * Math.PI) + (z + 0.5) * Math.log(t) - t +
        Math.log(Math.abs(a))
    }

  /** C frexp: x = m·2^e with 0.5 ≤ |m| < 1; zeros/NaN/±inf pass through
    * with e = 0 (C). Exponent returned as a double (jq numbers). */
  def frexpD(x: Double): Seq[Double] =
    if (x == 0.0 || x.isNaN || x.isInfinite) Seq(x, 0.0)
    else {
      // getExponent is floor(log2|x|) for normals; normalize subnormals
      // first so the same path is exact for them too
      val p54 = 1.8014398509481984e16 // 2^54 (Scala has no hex-float literals)
      val scaled = if (Math.abs(x) < java.lang.Double.MIN_NORMAL) x * p54 else x
      val bias = if (Math.abs(x) < java.lang.Double.MIN_NORMAL) 54 else 0
      val e = Math.getExponent(scaled) + 1 - bias
      Seq(Math.scalb(x, -e), e.toDouble)
    }

  /** C modf: [fractional, integral], both carrying x's sign;
    * modf(±inf) = [±0, ±inf]. */
  def modfD(x: Double): Seq[Double] =
    if (x.isNaN) Seq(Double.NaN, Double.NaN)
    else if (x.isInfinite) Seq(0.0 * Math.signum(x), x)
    else { val i = if (x >= 0) Math.floor(x) else Math.ceil(x); Seq(x - i, i) }

  val tgammaU = udf(tgammaD _)
  val lgammaU = udf(lgammaD _)
  val frexpU = udf(frexpD _)
  val modfU = udf(modfD _)
  val dremU = udf((x: Double, y: Double) => Math.IEEEremainder(x, y))
  val ldexpU = udf((x: Double, e: Double) => Math.scalb(x, e.toInt))
  val nextafterU = udf((x: Double, y: Double) => Math.nextAfter(x, y))
  val copysignU = udf((x: Double, y: Double) => Math.copySign(x, y))
  // C fmin/fmax ignore a NaN side (unlike Java Math.min/max)
  val fminU = udf((x: Double, y: Double) =>
    if (x.isNaN) y else if (y.isNaN) x else Math.min(x, y))
  val fmaxU = udf((x: Double, y: Double) =>
    if (x.isNaN) y else if (y.isNaN) x else Math.max(x, y))
  val fdimU = udf((x: Double, y: Double) =>
    if (x.isNaN || y.isNaN) Double.NaN else if (x > y) x - y else 0.0)
  val fmaU = udf((a: Double, b: Double, cc: Double) => Math.fma(a, b, cc))

  def tgamma(x: Column): Column = tgammaU(x)
  def lgamma(x: Column): Column = lgammaU(x)
  def frexp(x: Column): Column = frexpU(x)
  def modf(x: Column): Column = modfU(x)
}
