package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Session-timezone-invariant datetime columns.
  *
  * The driver parquet stores event times as `timestamp[us]` with no UTC flag,
  * which Spark 4 reads as TIMESTAMP_NTZ (a wall-clock, no instant). A plain
  * `cast("timestamp").cast("long")` injects the *session* timezone into the
  * epoch — non-constant across DST transitions, so gap-based logic (e.g.
  * sessionization) silently changes answers when the harness runs under a
  * non-UTC zone. Every epoch extraction in this repo goes through
  * [[ntzEpochSeconds]], which is pure field arithmetic on the wall-clock:
  * identical under any `spark.sql.session.timeZone`, and identical to DuckDB's
  * `floor(epoch(ts))` on the same naive timestamp.
  */
object TimeCols {

  /** Wall-clock epoch seconds of a TIMESTAMP_NTZ column, FLOORED (the
    * sub-second part rounds toward negative infinity, since `second()` of a
    * pre-epoch timestamp still counts forward within its minute) — exactly
    * DuckDB's `floor(epoch(ts))`, the oracle parity target. TZ-free by
    * construction: `to_date`, `hour`, `minute`, `second` on NTZ extract local
    * fields with no zone conversion, and date arithmetic has none either. */
  def ntzEpochSeconds(ts: Column): Column =
    datediff(to_date(ts), to_date(lit("1970-01-01"))).cast("long") * 86400L +
      hour(ts).cast("long") * 3600L + minute(ts).cast("long") * 60L + second(ts).cast("long")

  /** A TIMESTAMP (instant) whose UTC wall-clock equals the NTZ wall-clock —
    * i.e. "interpret the naive value as UTC", independent of session TZ.
    * Needed where Spark insists on TIMESTAMP (streaming watermarks). */
  def ntzAsUtcInstant(ts: Column): Column = timestamp_seconds(ntzEpochSeconds(ts))
}
