package graft.functions

import org.apache.spark.sql.{Column, functions => F}
import org.apache.spark.sql.types._

/** Business-day arithmetic (reference: tableframe/functions/datetime.py:22).
  * Pure expression formula (no UDF): adding n business days to a weekday-start
  * date is `floor(n/5)` full weeks plus the remainder, plus a 2-day weekend
  * hop when the remainder crosses Saturday. Weekend starts roll forward to
  * Monday first (Polars `roll="raise"` relaxed to `"forward"` — documented). */
object BusinessDays {
  def add(col: Column, n: Int): Column = {
    // 0=Monday..6=Sunday
    val dow = (F.dayofweek(col) + 5) % 7
    // roll weekend starts forward to Monday
    val rolled = F.when(dow === 5, F.date_add(col, 2))
      .when(dow === 6, F.date_add(col, 1))
      .otherwise(F.to_date(col))
    val rolledDow = (F.dayofweek(rolled) + 5) % 7
    val weeks = n / 5
    val rem = n % 5
    if (rem >= 0) {
      val crossesWeekend = (rolledDow + rem) >= 5
      F.date_add(rolled, F.when(crossesWeekend, weeks * 7 + rem + 2)
        .otherwise(F.lit(weeks * 7 + rem)))
    } else {
      val crossesWeekend = (rolledDow + rem) < 0
      F.date_add(rolled, F.when(crossesWeekend, weeks * 7 + rem - 2)
        .otherwise(F.lit(weeks * 7 + rem)))
    }
  }
}

/** Timezone-rule introspection (reference: datetime.py:252-256). Needs the JVM
  * ZoneRules database — a (rarely hot) Scala UDF is the right tool here. */
object TzFunctions {
  private def offsets(tz: String): java.time.Instant => (Int, Int) = {
    inst => {
      val rules = java.time.ZoneId.of(tz).getRules
      val std = rules.getStandardOffset(inst).getTotalSeconds
      val act = rules.getOffset(inst).getTotalSeconds
      (std, act - std)
    }
  }

  def baseUtcOffsetSeconds(col: Column, tz: String): Column = {
    val f = F.udf((ts: java.sql.Timestamp) =>
      if (ts == null) null.asInstanceOf[java.lang.Integer]
      else Int.box(offsets(tz)(ts.toInstant)._1))
    f(col.cast(TimestampType))
  }

  def dstOffsetSeconds(col: Column, tz: String): Column = {
    val f = F.udf((ts: java.sql.Timestamp) =>
      if (ts == null) null.asInstanceOf[java.lang.Integer]
      else Int.box(offsets(tz)(ts.toInstant)._2))
    f(col.cast(TimestampType))
  }
}
