package graft.queries

import graft.etl.{CleanOps, DictColumn, DictionaryOps, Tables}
import org.apache.spark.sql.functions._

/** Reference-parity operators (SURVEY.md §2.2) exercised on the driver's
  * testdata stand-ins (FIXTURES.md §6). Each query builds the reference's
  * raw-input shape from a deterministic expression over the testdata,
  * applies the CleanOps combinator, and is twinned with DuckDB oracle SQL.
  *
  * Every query ends in a deterministic ORDER BY on a unique key so the
  * compare is order-stable in both engines (Catalyst's EliminateSorts
  * drops the sort under Bench's count()).
  */
object Parity {

  /** P1 — drop-by-name-marker projection (transformation_layer.py:38-40). */
  val p01 = Q(
    "p01_drop_marked_cols",
    (s, dir) => {
      val o = Tables(s, dir, "orders").withColumn("junk_duplicated_0", lit("x"))
      CleanOps.dropColsMatching(o, "duplicated").orderBy(col("o_orderkey"))
    },
    Some("SELECT * FROM orders ORDER BY o_orderkey"))

  /** P2 — percent-string → rate with null-on-bad-cast (transformation_layer.py:43-52). */
  val p02 = Q(
    "p02_percent_rate",
    (s, dir) => {
      val li = Tables(s, dir, "lineitem")
      li.select(
          col("l_orderkey"), col("l_linenumber"),
          when(col("l_partkey") % 5 === 0, lit("bad%"))
            .otherwise(concat(col("l_quantity").cast("string"), lit(" %"))).as("rate_str"))
        .withColumn("rate", CleanOps.percentToRate(col("rate_str")))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    },
    Some("""
      SELECT l_orderkey, l_linenumber, rate_str,
             TRY_CAST(trim(regexp_replace(rate_str, '\s*%', '', 'g')) AS DOUBLE) / 10000000.0 AS rate
      FROM (SELECT l_orderkey, l_linenumber,
                   CASE WHEN l_partkey % 5 = 0 THEN 'bad%'
                        ELSE l_quantity::VARCHAR || ' %' END AS rate_str
            FROM lineitem)
      ORDER BY l_orderkey, l_linenumber
    """.trim))

  /** P3 — multi-format date normalization (transformation_layer.py:55-64). */
  val p03 = Q(
    "p03_date_multiformat",
    (s, dir) => {
      val o = Tables(s, dir, "orders")
      o.select(
          col("o_orderkey"),
          when(col("o_orderkey") % 4 === 0, date_format(col("o_orderdate"), "dd/MM/yyyy"))
            .when(col("o_orderkey") % 4 === 1, date_format(col("o_orderdate"), "dd-MM-yyyy"))
            .when(col("o_orderkey") % 4 === 2,
              concat(date_format(col("o_orderdate"), "dd.MM.yyyy"), lit(" 08:30")))
            .otherwise(lit("not a date")).as("raw_date"))
        .withColumn("fecha", CleanOps.normalizeDate(col("raw_date")))
        .orderBy(col("o_orderkey"))
    },
    Some("""
      SELECT o_orderkey, raw_date,
             CAST(try_strptime(
               replace(replace(split_part(trim(raw_date), ' ', 1), '-', '/'), '.', '/'),
               '%d/%m/%Y') AS DATE) AS fecha
      FROM (SELECT o_orderkey,
                   CASE o_orderkey % 4
                     WHEN 0 THEN strftime(o_orderdate, '%d/%m/%Y')
                     WHEN 1 THEN strftime(o_orderdate, '%d-%m-%Y')
                     WHEN 2 THEN strftime(o_orderdate, '%d.%m.%Y') || ' 08:30'
                     ELSE 'not a date' END AS raw_date
            FROM orders)
      ORDER BY o_orderkey
    """.trim))

  /** P4 — date-diff derivation over a join (transformation_layer.py:67-72). */
  val p04 = Q(
    "p04_datediff_days",
    (s, dir) => {
      val li = Tables(s, dir, "lineitem")
      val o = Tables(s, dir, "orders")
      li.join(o, li("l_orderkey") === o("o_orderkey"))
        .select(col("l_orderkey"), col("l_linenumber"),
          CleanOps.daysBetween(col("l_shipdate"), col("o_orderdate")).as("tiempo_ship"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    },
    Some("""
      SELECT l_orderkey, l_linenumber,
             date_diff('day', CAST(o_orderdate AS DATE), CAST(l_shipdate AS DATE)) AS tiempo_ship
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      ORDER BY l_orderkey, l_linenumber
    """.trim))

  /** P5 + P6 — injected current-date literal and when-without-otherwise
    * waiting time (transformation_layer.py:75-92).
    */
  val p06 = Q(
    "p06_waiting_time",
    (s, dir) => {
      val o = Tables(s, dir, "orders")
      val today = lit(java.sql.Date.valueOf("2026-08-12"))
      o.select(col("o_orderkey"),
          when(col("o_orderkey") % 3 === 0, lit(null).cast("date"))
            .otherwise(to_date(col("o_orderdate"))).as("fecha_giro"),
          to_date(col("o_orderdate")).as("fecha_solicitud"))
        .withColumn("fecha_actual", today)
        .withColumn("tiempo_de_espera",
          CleanOps.waitingTime(col("fecha_giro"), col("fecha_solicitud"), today))
        .orderBy(col("o_orderkey"))
    },
    Some("""
      SELECT o_orderkey,
             CASE WHEN o_orderkey % 3 = 0 THEN NULL ELSE CAST(o_orderdate AS DATE) END AS fecha_giro,
             CAST(o_orderdate AS DATE) AS fecha_solicitud,
             DATE '2026-08-12' AS fecha_actual,
             CASE WHEN o_orderkey % 3 = 0
                  THEN date_diff('day', CAST(o_orderdate AS DATE), DATE '2026-08-12') END AS tiempo_de_espera
      FROM orders ORDER BY o_orderkey
    """.trim))

  /** P7 — decimal-comma fix (transformation_layer.py:95-99). */
  val p07 = Q(
    "p07_comma_decimal",
    (s, dir) => {
      val li = Tables(s, dir, "lineitem")
      li.select(col("l_orderkey"), col("l_linenumber"),
          translate(col("l_extendedprice").cast("string"), ".", ",").as("monto_str"))
        .withColumn("monto", CleanOps.commaDecimal(col("monto_str")))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    },
    Some("""
      SELECT l_orderkey, l_linenumber, monto_str,
             TRY_CAST(replace(monto_str, ',', '.') AS DOUBLE) AS monto
      FROM (SELECT l_orderkey, l_linenumber,
                   replace(l_extendedprice::VARCHAR, '.', ',') AS monto_str
            FROM lineitem)
      ORDER BY l_orderkey, l_linenumber
    """.trim))

  /** P8 — type-driven temporal formatting for export (transformation_layer.py:108-112). */
  val p08 = Q(
    "p08_format_temporals",
    (s, dir) =>
      CleanOps.formatTemporals(Tables(s, dir, "orders")).orderBy(col("o_orderkey")),
    Some("""
      SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
             strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS o_orderdate,
             o_orderpriority
      FROM orders ORDER BY o_orderkey
    """.trim))

  /** P9 — NaN → null over double columns (transformation_layer.py:114-118). */
  val p09 = Q(
    "p09_nan_to_null",
    (s, dir) => {
      val li = Tables(s, dir, "lineitem")
      CleanOps.nanToNull(
          li.select(col("l_orderkey"), col("l_linenumber"),
            when(col("l_tax") > 0.05, lit(Double.NaN)).otherwise(col("l_tax")).as("tax_or_nan")))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    },
    Some("""
      SELECT l_orderkey, l_linenumber,
             CASE WHEN l_tax > 0.05 THEN NULL ELSE l_tax END AS tax_or_nan
      FROM lineitem ORDER BY l_orderkey, l_linenumber
    """.trim))

  /** P10 — minute-precision datetime parse, null on garbage (transformation_layer.py:126-128). */
  val p10 = Q(
    "p10_parse_datetime",
    (s, dir) => {
      val ev = Tables(s, dir, "events")
      ev.select(col("event_id"),
          when(col("event_type") === "error", lit("not a datetime"))
            .otherwise(date_format(col("ts"), "dd/MM/yyyy HH:mm")).as("raw_ts"))
        .withColumn("fecha_radicacion", CleanOps.parseDatetimeMinutes(col("raw_ts")))
        .orderBy(col("event_id"))
    },
    Some("""
      SELECT event_id, raw_ts, try_strptime(raw_ts, '%d/%m/%Y %H:%M') AS fecha_radicacion
      FROM (SELECT event_id,
                   CASE WHEN event_type = 'error' THEN 'not a datetime'
                        ELSE strftime(ts, '%d/%m/%Y %H:%M') END AS raw_ts
            FROM events)
      ORDER BY event_id
    """.trim))

  /** P11 — conditional designation split into 3 fields (transformation_layer.py:130-146). */
  val p11 = Q(
    "p11_split_designation",
    (s, dir) => {
      val c = Tables(s, dir, "customer")
      val n = Tables(s, dir, "nation")
      val d = c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .select(col("c_custkey"),
          when(col("c_custkey") % 5 === 0, col("c_name"))
            .otherwise(concat_ws("-", col("c_mktsegment"), col("n_name"), col("c_name")))
            .as("destino"))
      CleanOps.splitDesignation(d, "destino").orderBy(col("c_custkey"))
    },
    Some("""
      WITH d AS (
        SELECT c_custkey,
               CASE WHEN c_custkey % 5 = 0 THEN c_name
                    ELSE c_mktsegment || '-' || n_name || '-' || c_name END AS destino
        FROM customer JOIN nation ON c_nationkey = n_nationkey)
      SELECT c_custkey, destino,
             CASE WHEN contains(destino, '-') THEN str_split(destino, '-')[1] END AS cargo_destino,
             CASE WHEN contains(destino, '-') THEN str_split(destino, '-')[2]
                  ELSE 'GAUEGI' END AS cod_grupo_destino,
             CASE WHEN contains(destino, '-')
                  THEN array_to_string(str_split(destino, '-')[3:], '-') END AS funcionario_destino
      FROM d ORDER BY c_custkey
    """.trim))

  /** P12/J5 — code → name broadcast lookup, unmapped → null (transformation_layer.py:148-153). */
  val p12 = Q(
    "p12_code_lookup",
    (s, dir) => {
      val c = Tables(s, dir, "customer")
      val codes = Tables(s, dir, "nation").filter(col("n_nationkey") < 20)
      CleanOps.codeLookup(c, "c_nationkey", codes, "n_nationkey", "n_name", "grupo_destino")
        .select(col("c_custkey"), col("c_nationkey"), col("grupo_destino"))
        .orderBy(col("c_custkey"))
    },
    Some("""
      SELECT c_custkey, c_nationkey, n_name AS grupo_destino
      FROM customer LEFT JOIN (SELECT * FROM nation WHERE n_nationkey < 20)
        ON c_nationkey = n_nationkey
      ORDER BY c_custkey
    """.trim))

  /** P13 + P14 — empty-string → null then string → Int64 casts
    * (transformation_layer.py:156-168), plus a regex field extraction.
    */
  val p13 = Q(
    "p13_cast_empty_null",
    (s, dir) => {
      val ev = Tables(s, dir, "events")
      val shaped = ev.select(col("event_id"),
        when(col("event_type") === "signup", lit("")).otherwise(col("user_id").cast("string"))
          .as("user_str"),
        regexp_extract(col("props"), "\"k\": (\\d+)", 1).as("k_str"))
      CleanOps.emptyToNull(shaped)
        .select(col("event_id"),
          col("user_str").cast("long").as("user_cast"),
          col("k_str").cast("long").as("k"))
        .orderBy(col("event_id"))
    },
    Some("""
      SELECT event_id,
             TRY_CAST(NULLIF(CASE WHEN event_type = 'signup' THEN ''
                                  ELSE user_id::VARCHAR END, '') AS BIGINT) AS user_cast,
             TRY_CAST(NULLIF(regexp_extract(props, '"k": (\d+)', 1), '') AS BIGINT) AS k
      FROM events ORDER BY event_id
    """.trim))

  /** Dictionary used by the p15 stand-in: mirrors the reference's
    * Diccionario shape, including the Bool→String quirk and a column
    * absent from the frame (skip-and-warn, log_handler.py:34-36).
    */
  val eventsDict: Seq[DictColumn] = Seq(
    DictColumn("event_id", "Integer", jerarquia = "PK"),
    DictColumn("ts", "Timestamp"),
    DictColumn("user_id", "Integer", jerarquia = "FK"),
    DictColumn("event_type", "String"),
    DictColumn("value", "Float", audit = true),
    DictColumn("high_value", "Bool"),
    DictColumn("ghost_col", "String"))

  /** P15 — dictionary-driven cast pass over an all-string snapshot
    * (log_handler.py:7-40).
    */
  val p15 = Q(
    "p15_dictionary_cast",
    (s, dir) => {
      val ev = Tables(s, dir, "events")
      val strSnap = ev.select(
        col("event_id").cast("string").as("event_id"),
        date_format(col("ts"), "dd/MM/yyyy").as("ts"),
        col("user_id").cast("string").as("user_id"),
        col("event_type"),
        col("value").cast("string").as("value"),
        (col("value") > 100.0).as("high_value"))
      DictionaryOps.castByDictionary(strSnap, eventsDict).orderBy(col("event_id"))
    },
    Some("""
      SELECT event_id::VARCHAR::BIGINT AS event_id,
             try_strptime(strftime(ts, '%d/%m/%Y'), '%d/%m/%Y') AS ts,
             user_id::VARCHAR::BIGINT AS user_id,
             event_type,
             value::VARCHAR::DOUBLE AS value,
             (value > 100.0)::VARCHAR AS high_value
      FROM events ORDER BY event_id
    """.trim))

  /** P21 — column rename (log_handler.py:113). */
  val p21 = Q(
    "p21_rename",
    (s, dir) =>
      Tables(s, dir, "events")
        .select(col("event_id"), col("ts"))
        .withColumnRenamed("ts", "Fecha Radicacion")
        .orderBy(col("event_id")),
    Some("""SELECT event_id, ts AS "Fecha Radicacion" FROM events ORDER BY event_id"""))

  def all: Seq[Q] = Seq(p01, p02, p03, p04, p06, p07, p08, p09, p10, p11, p12, p13, p15, p21)
}
