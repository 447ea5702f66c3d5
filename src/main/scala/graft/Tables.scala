package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated parquet tables (TESTDATA.md).
  *
  * Scale posture: every loader is a plain parquet scan — Catalyst prunes
  * columns and pushes predicates into the scan, so callers should express
  * projections/filters declaratively and NOT pre-materialize. On a real
  * cluster these paths would be a partitioned table root; nothing here
  * assumes single-file layout.
  */
final case class Env(spark: SparkSession, dir: String) {
  // events.parquet carries TIMESTAMP(NANOS) which Spark's vectorized
  // reader rejects; read nanos as long (ns since epoch). Comparisons and
  // min/max on the long are order-identical to the native timestamp, and
  // wall-clock projections convert explicitly (see Env.events scaladoc).
  spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
  // The events.ts normalization below interprets a TIMESTAMP_NTZ wall
  // clock in the session time zone; DuckDB's epoch_ns reads the same
  // wall clock as UTC. Pin UTC HERE — at the loader — so the invariant
  // holds for every entry point (Bench/Verify pin it too; dev tools
  // like Explain/ScaleUp get it for free instead of by convention).
  spark.conf.set("spark.sql.session.timeZone", "UTC")

  def table(name: String): DataFrame = spark.read.parquet(s"$dir/$name.parquet")

  def region: DataFrame     = table("region")
  def nation: DataFrame     = table("nation")
  def customer: DataFrame   = table("customer")
  def supplier: DataFrame   = table("supplier")
  def part: DataFrame       = table("part")
  def orders: DataFrame     = table("orders")
  def lineitem: DataFrame   = table("lineitem")

  /** `ts` is LongType = nanoseconds since epoch. Use `Tables.eventTs`
    * for a TimestampType view (microsecond truncation).
    *
    * The driver has generated `events.parquet` with two physical `ts`
    * types across rounds: TIMESTAMP(NANOS) (read as a long via the
    * nanosAsLong conf above) and plain timestamp[us] (read as
    * TIMESTAMP_NTZ, to which that conf does not apply). Downstream
    * plans and every DuckDB oracle (`epoch_ns(ts)`) assume the long
    * view, so normalize here: a timestamp-typed `ts` is converted to
    * ns since epoch. The NTZ→epoch cast interprets the wall clock in
    * the session time zone, which this loader pins to UTC above —
    * matching DuckDB's naive-timestamp-as-UTC `epoch_ns`.
    */
  def events: DataFrame = {
    import org.apache.spark.sql.functions.{col, unix_micros}
    import org.apache.spark.sql.types.{LongType, TimestampType}
    val df = table("events")
    df.schema("ts").dataType match {
      case LongType => df
      case _ => df.withColumn(
        "ts", unix_micros(col("ts").cast(TimestampType)) * 1000L)
    }
  }
  def documents: DataFrame  = table("documents")
  def embeddings: DataFrame = table("embeddings")

  /** The driver's single-file tables carry ONE parquet row group each,
    * so a scan is ONE task regardless of `files.maxPartitionBytes` —
    * any per-row compute-heavy plan (codec decode, per-doc hashing,
    * regex batteries) would run on a single core. Spreading the few-MB
    * input across the default parallelism first costs a trivial
    * shuffle and buys full-width map stages. A real corpus arrives in
    * thousands of row groups and needs no such step — use this at the
    * QUERY layer (bench shape), never inside operators.
    */
  def spread(df: DataFrame): DataFrame =
    df.repartition(spark.sparkContext.defaultParallelism)
}

object Tables {
  /** Nanos-since-epoch long → TimestampType (micros; truncates
    * sub-micro). The ns→µs division goes through decimal, not `/`
    * (double division): epoch-2024 µs values sit near 1.7e15 where a
    * double's ULP is 0.25, so `(c / 1000L).cast("long")` truncates to
    * the wrong µs for ~1 in 4 timestamps. */
  def eventTs(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    org.apache.spark.sql.functions.timestamp_micros(
      (c.cast("decimal(25,0)") / 1000).cast("long"))

  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Dimension tables small enough to broadcast at any realistic scale
    * factor (region: 5 rows, nation: 25 — fixed-size dims in TPC-H-like
    * generators regardless of SF).
    */
  val broadcastableDims: Set[String] = Set("region", "nation")
}
