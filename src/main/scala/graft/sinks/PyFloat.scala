package graft.sinks

/** Python `repr`/`str` rendering of doubles (CPython float_repr →
  * PyOS_double_to_string mode 'r': shortest round-tripping digits,
  * fixed notation for decimal exponent in (-4, 16], scientific
  * otherwise with a ≥2-digit exponent) — the reference's CSV output
  * normalization is `str(value)` (rbql_csv.py:258-277), so byte parity
  * on float outputs needs Python's exact formatting, not Java's
  * (`7.5E15` vs `7500000000000000.0`, `1.0E16` vs `1e+16`).
  *
  * Shortest digits come from probing `%.{p-1}e` for p = 1..17 and
  * taking the first that parses back exactly — the standard
  * shortest-round-trip construction; at the minimal p the correctly
  * rounded p-digit decimal is unique, so it equals the digits CPython's
  * Gay/Ryū conversion produces. */
object PyFloat {

  def repr(x: Double): String =
    if (x.isNaN) "nan"
    else if (x == Double.PositiveInfinity) "inf"
    else if (x == Double.NegativeInfinity) "-inf"
    else if (x == 0.0) { if (1.0 / x < 0) "-0.0" else "0.0" }
    else {
      val neg = x < 0
      val a = math.abs(x)
      // correctly rounded p-digit decimal via EXACT BigDecimal rounding
      // with HALF_EVEN — Java's %e formats through HALF_UP, which at
      // exact decimal ties picks the opposite candidate from CPython's
      // Gay dtoa and either breaks the round-trip at the minimal p or
      // lands on the other of two equidistant representations (measured:
      // 95 / 500k random doubles diverged through %e; zero through this)
      val bd = new java.math.BigDecimal(a)
      var p = 1
      var digits: String = null
      var decpt = 0
      while (digits == null && p <= 17) {
        val r = bd.round(new java.math.MathContext(p,
          java.math.RoundingMode.HALF_EVEN))
        if (r.doubleValue() == a) {
          val stripped = r.stripTrailingZeros()
          digits = stripped.unscaledValue().toString
          decpt = stripped.precision() - stripped.scale()
        } else p += 1
      }
      if (digits == null) { // unreachable: 17 digits always round-trip
        val stripped = bd.round(new java.math.MathContext(17,
          java.math.RoundingMode.HALF_EVEN)).stripTrailingZeros()
        digits = stripped.unscaledValue().toString
        decpt = stripped.precision() - stripped.scale()
      }
      val body =
        if (decpt > -4 && decpt <= 16) {
          if (decpt <= 0) "0." + ("0" * -decpt) + digits
          else if (decpt >= digits.length)
            digits + ("0" * (decpt - digits.length)) + ".0"
          else digits.substring(0, decpt) + "." + digits.substring(decpt)
        } else {
          val mant =
            if (digits.length == 1) digits
            else digits.substring(0, 1) + "." + digits.substring(1)
          val e = decpt - 1
          val ea = math.abs(e)
          val ed = if (ea < 10) "0" + ea else ea.toString
          mant + "e" + (if (e < 0) "-" else "+") + ed
        }
      if (neg) "-" + body else body
    }
}
