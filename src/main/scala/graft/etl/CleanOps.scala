package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Column-level cleaning / derivation operators.
  *
  * Re-expresses the reference's per-entity polars transforms
  * (`/root/reference/src/transformation_layer.py`) as pure
  * `Column`/`DataFrame` combinators over built-in Catalyst expressions —
  * everything stays inside whole-stage codegen, no UDFs. Null semantics
  * follow polars `strict=False`: bad casts/parses yield null (requires
  * `spark.sql.ansi.enabled=false`).
  */
object CleanOps {

  /** P1 — drop columns whose name contains a marker substring
    * (reference drops polars' `*_duplicated_*` auto-renames,
    * transformation_layer.py:38-40).
    */
  def dropColsMatching(df: DataFrame, marker: String): DataFrame =
    df.select(df.columns.filterNot(_.contains(marker)).map(col).toIndexedSeq: _*)

  /** P2 — percent-string → rate: strip `\s*%`, trim, cast (bad → null),
    * divide by 1e7 (transformation_layer.py:43-52 divides by 100*100000;
    * the code, not its comment, is the contract).
    */
  def percentToRate(c: Column): Column =
    trim(regexp_replace(c, "\\s*%", "")).cast(DoubleType) / lit(1e7)

  /** P3 — multi-format date normalization: trim, drop a time part,
    * `-` and `.` separators → `/`, then parse `dd/MM/yyyy` (unparseable
    * → null). transformation_layer.py:55-64.
    */
  def normalizeDate(c: Column): Column =
    to_date(
      regexp_replace(regexp_replace(split(trim(c), " ").getItem(0), "-", "/"), "\\.", "/"),
      "dd/MM/yyyy")

  /** P4 — whole days between two dates as Int64 (transformation_layer.py:67-72). */
  def daysBetween(end: Column, start: Column): Column =
    datediff(end, start).cast(LongType)

  /** P6 — waiting time: only when `giro` is still null; no otherwise, so
    * rows with a value get null (transformation_layer.py:84-92 has no
    * else branch — code semantics kept).
    */
  def waitingTime(giro: Column, solicitud: Column, today: Column): Column =
    when(giro.isNull, datediff(today, solicitud).cast(LongType))

  /** P7 — decimal-comma fix: `,` → `.` then cast double
    * (transformation_layer.py:95-99).
    */
  def commaDecimal(c: Column): Column =
    translate(c, ",", ".").cast(DoubleType)

  /** P8 — type-driven export formatting: every DateType column →
    * `yyyy-MM-dd` string, every timestamp column → `yyyy-MM-dd HH:mm:ss`
    * (transformation_layer.py:108-112).
    */
  def formatTemporals(df: DataFrame): DataFrame = {
    val exprs = df.schema.fields.map { f =>
      f.dataType match {
        case DateType => date_format(col(f.name), "yyyy-MM-dd").as(f.name)
        case TimestampType | TimestampNTZType =>
          date_format(col(f.name), "yyyy-MM-dd HH:mm:ss").as(f.name)
        case _ => col(f.name)
      }
    }
    df.select(exprs.toIndexedSeq: _*)
  }

  /** P9 — float NaN → null on every double column
    * (transformation_layer.py:114-118).
    */
  def nanToNull(df: DataFrame): DataFrame = {
    val exprs = df.schema.fields.map { f =>
      f.dataType match {
        case DoubleType | FloatType =>
          nanvl(col(f.name), lit(null).cast(f.dataType)).as(f.name)
        case _ => col(f.name)
      }
    }
    df.select(exprs.toIndexedSeq: _*)
  }

  /** P10 — minute-precision datetime parse, null on failure
    * (transformation_layer.py:126-128, `%d/%m/%Y %H:%M`). Result is
    * session-TZ-free (NTZ) so parquet round-trips match the oracle.
    */
  def parseDatetimeMinutes(c: Column): Column =
    to_timestamp(c, "dd/MM/yyyy HH:mm").cast(TimestampNTZType)

  /** P11 — conditional 3-way split of a `-`-delimited designation into
    * (cargo, codGrupo, funcionario); strings without the delimiter get
    * the constant (null, "GAUEGI", null) (transformation_layer.py:130-146).
    *
    * Split uses limit=3 so a hyphen-rich person name stays intact in the
    * third field (polars `split_exact("-", 2)` drops the remainder; the
    * dictionary says field 3 is a free-text name, so keeping it is the
    * coherent semantic — SURVEY.md §7.3).
    */
  def splitDesignation(df: DataFrame, src: String,
      names: (String, String, String) = ("cargo_destino", "cod_grupo_destino", "funcionario_destino")): DataFrame = {
    val parts = split(col(src), "-", 3)
    val has = col(src).contains("-")
    df.withColumn(names._1, when(has, parts.getItem(0)))
      .withColumn(names._2, when(has, parts.getItem(1)).otherwise(lit("GAUEGI")))
      .withColumn(names._3, when(has, parts.getItem(2)))
  }

  /** P12 — code → name mapping via broadcast join against a small code
    * table; unmapped codes → null (transformation_layer.py:148-153,
    * `replace_strict(default=None)` over the 21-entry working_group_dict).
    * A broadcast left join is the 100 TB-safe equivalent of a literal
    * dict: the fact side never shuffles.
    */
  def codeLookup(df: DataFrame, key: String, codes: DataFrame,
      codeCol: String, nameCol: String, out: String): DataFrame =
    df.join(broadcast(codes.select(col(codeCol).as("__code"), col(nameCol).as(out))),
        df(key) === col("__code"), "left")
      .drop("__code")

  /** P14 — empty string → null on every string column
    * (transformation_layer.py:163-168).
    */
  def emptyToNull(df: DataFrame): DataFrame = {
    val exprs = df.schema.fields.map { f =>
      f.dataType match {
        case StringType =>
          when(col(f.name) === "", lit(null).cast(StringType))
            .otherwise(col(f.name)).as(f.name)
        case _ => col(f.name)
      }
    }
    df.select(exprs.toIndexedSeq: _*)
  }

  /** P20 — cast every column to string (schema harmonization before
    * union, log_handler.py:119-125). Temporal columns are formatted
    * explicitly so output is engine-portable.
    */
  def castAllToString(df: DataFrame): DataFrame = {
    val exprs = df.schema.fields.map(f => stringify(col(f.name), f.dataType).as(f.name))
    df.select(exprs.toIndexedSeq: _*)
  }

  /** One column's [[castAllToString]] rule, for callers that stringify
    * columns of a wider frame in place (the single-join merge).
    */
  def stringify(c: Column, dt: DataType): Column = dt match {
    case DateType => date_format(c, "yyyy-MM-dd")
    case TimestampType | TimestampNTZType => date_format(c, "yyyy-MM-dd HH:mm:ss")
    case _ => c.cast(StringType)
  }
}
