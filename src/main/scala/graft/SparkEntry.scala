package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.GF
import graft.model.Frequency
import graft.operators._
import graft.sources.{CatalogReader, CellGrid}

/** Driver contract (see SURVEY.md §2 / §7 + builder prompt).
  *
  * Every operator from the SURVEY §2 inventory (plus the north-star
  * LLM-pipeline operators) is exposed as a named query over the driver's
  * parquet tables, with a DuckDB-equivalent oracle in [[oracleSql]].
  * Column names are aliased identically on both sides; all floating
  * outputs are rounded; every query is deterministically ordered.
  */
object SparkEntry {

  /** Flagship query on sf=0.001: the star-schema revenue rollup
    * (broadcast dims, one fact shuffle). Driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    qStarRevenue(spark, "/root/testdata/sf0.001")

  // -------------------------------------------------------------------
  // Reference-parity queries (SURVEY §2). Names sort in inventory order.
  // -------------------------------------------------------------------

  /** A1-A4/F10 — grouped conditional aggregation (pricing summary). */
  private def qPricingSummary(s: SparkSession, dir: String): DataFrame = {
    val t = Tables(s, dir)
    t.lineitem
      .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        round(sum(col("l_quantity")), 2).as("sum_qty"),
        round(sum(col("l_extendedprice")), 2).as("sum_base_price"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
          .as("sum_disc_price"),
        round(avg(col("l_quantity")), 4).as("avg_qty"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  /** A1/A2/A3 — the indicator summary row over synthesized status
    * reports (Reports.indicators; reference base.py:1007-1018). */
  private def qIndicators(s: SparkSession, dir: String): DataFrame = {
    val t = Tables(s, dir)
    val datasetReport = t.orders.withColumn("dataset_status",
      when(col("o_orderstatus") === "F", "OK")
        .when(col("o_orderstatus") === "O", "WARNING").otherwise("ERROR"))
    val distributionReport = t.lineitem.withColumn("distribution_status",
      when(col("l_returnflag") === "N", "OK")
        .when(col("l_returnflag") === "R", "WARNING").otherwise("ERROR"))
    Reports.indicators(datasetReport, distributionReport)
  }

  /** P5/F2 — method classification of a distribution manifest
    * (CatalogReader.withMethod; reference base.py:123-153). */
  private def qMethodClassify(s: SparkSession, dir: String): DataFrame = {
    val t = Tables(s, dir)
    val manifest = t.documents.select(
      col("doc_id"),
      when(col("doc_id") % 5 === 0,
        concat(lit("http://x/"), col("source"), lit(".csv")))
        .as("downloadURL"),
      concat(lit("http://y/"), col("source"), lit("."),
        element_at(array(lit("txt"), lit("TXT"), lit("xlsx"), lit("XLS"),
          lit("zip")), (col("doc_id") % 5 + 1).cast("int")))
        .as("scrapingFileURL"))
    CatalogReader.withMethod(manifest)
      .groupBy(col("method")).agg(count(lit(1)).as("n"))
      .orderBy(col("method"))
  }

  /** J2 — left-semi join: customers having orders, by market segment. */
  private def qSemiJoin(s: SparkSession, dir: String): DataFrame = {
    val t = Tables(s, dir)
    t.customer.join(t.orders.select(col("o_custkey").as("c_custkey")),
        Seq("c_custkey"), "left_semi")
      .groupBy(col("c_mktsegment")).agg(count(lit(1)).as("n_customers"))
      .orderBy(col("c_mktsegment"))
  }

  /** P9 — anti-join (skip-if-exists semantics): customers with no
    * orders, by nation (broadcast dim join). */
  private def qAntiJoin(s: SparkSession, dir: String): DataFrame = {
    val t = Tables(s, dir)
    t.customer.join(t.orders.select(col("o_custkey").as("c_custkey")),
        Seq("c_custkey"), "left_anti")
      .join(broadcast(t.nation),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name")).agg(count(lit(1)).as("n_customers"))
      .orderBy(col("n_name"))
  }

  /** J3/J4 — star-schema revenue: fact joined to broadcast dims. */
  private def qStarRevenue(s: SparkSession, dir: String): DataFrame = {
    val t = Tables(s, dir)
    t.lineitem
      .join(t.orders, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(t.customer), col("o_custkey") === col("c_custkey"))
      .join(broadcast(t.nation), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(t.region), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
          .as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy(col("r_name"), col("n_name"))
  }

  /** J1 — pivot/align: daily event values pivoted by event type (the
    * reference's concat-on-time-index, SURVEY §2.4 J1). Pivot values are
    * pinned so no extra distinct job runs. */
  private def qPivotDaily(s: SparkSession, dir: String): DataFrame = {
    val t = Tables(s, dir)
    t.events
      .withColumn("day", to_date(col("ts")))
      .groupBy(col("day"))
      .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
      .agg(round(sum(col("value")), 2))
      .orderBy(col("day"))
  }

  /** D1/D2 — dedup via distinct: distinct event types seen per user. */
  private def qDistinct(s: SparkSession, dir: String): DataFrame = {
    val t = Tables(s, dir)
    t.events.select(col("user_id"), col("event_type")).distinct()
      .groupBy(col("user_id")).agg(count(lit(1)).as("n_types"))
      .orderBy(col("user_id"))
  }

  /** U1 — report accumulation: union of two status projections. */
  private def qUnionReport(s: SparkSession, dir: String): DataFrame = {
    val t = Tables(s, dir)
    val a = t.orders.select(col("o_orderstatus").as("label"))
    val b = t.lineitem.select(col("l_returnflag").as("label"))
    a.union(b).groupBy(col("label")).agg(count(lit(1)).as("n"))
      .orderBy(col("label"))
  }

  /** O1 — ordered-categorical status sort (Reports.statusRank). */
  private def qStatusSort(s: SparkSession, dir: String): DataFrame = {
    val t = Tables(s, dir)
    val report = t.orders.withColumn("distribution_status",
      when(col("o_orderkey") % 10 < 6, "OK")
        .when(col("o_orderkey") % 10 < 9, "WARNING").otherwise("ERROR"))
    Reports.sortByStatus(
      report.groupBy(col("distribution_status")).agg(count(lit(1)).as("n")))
      .withColumn("rank", Reports.statusRank(col("distribution_status")))
  }

  /** P4/O3 — harvest filter + first-element limit: first valid customer
    * (positive balance) that has orders. */
  private def qFirstValid(s: SparkSession, dir: String): DataFrame = {
    val t = Tables(s, dir)
    t.customer.filter(col("c_acctbal") > 0)
      .join(t.orders.select(col("o_custkey").as("c_custkey")),
        Seq("c_custkey"), "left_semi")
      .orderBy(col("c_custkey"))
      .limit(1)
      .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
  }

  /** F1/F2/F3 — string functions: strip, extension, basename. */
  private def qStringFuncs(s: SparkSession, dir: String): DataFrame = {
    val t = Tables(s, dir)
    t.part.select(
        col("p_partkey"),
        GF.stripSpaces(col("p_name")).as("name_nospace"),
        GF.fileExtension(concat(lit("a/b/"), col("p_brand"), lit("."),
          col("p_size").cast("string"))).as("ext"),
        GF.basename(concat(lit("http://h/x/"), col("p_brand"), lit("/"),
          col("p_name"))).as("base"))
      .orderBy(col("p_partkey"))
  }

  /** F4 — cell-coordinate parsing: "BA37" -> row 37, col 53. */
  private def qCellCoords(s: SparkSession, dir: String): DataFrame = {
    val t = Tables(s, dir)
    t.part.select(col("p_partkey"),
        concat(
          when(col("p_partkey") % 3 === 0, expr("chr(65 + p_partkey % 26)"))
            .otherwise(lit("")),
          expr("chr(65 + p_partkey % 5)"),
          (col("p_partkey") % 90 + 1).cast("string")).as("coord"))
      .withColumn("row_num", GF.cellRow(col("coord")))
      .withColumn("col_num", GF.cellColIndex(col("coord")))
      .orderBy(col("p_partkey"))
  }

  /** F5 — ISO repeat-duration -> frequency code (Frequency ADT). */
  private def qFreqMap(s: SparkSession, dir: String): DataFrame = {
    val t = Tables(s, dir)
    val isos = Frequency.all.map(f => lit(f.iso)) :+ lit(null).cast("string")
    t.orders.select(
        element_at(array(isos: _*), (col("o_orderkey") % 6 + 1).cast("int")
          ).as("freq_iso")) // index 6 -> null iso exercises the unknown path
      .withColumn("freq_code", GF.freqCode(col("freq_iso")))
      .groupBy(col("freq_iso"), col("freq_code"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("freq_iso"))
  }

  /** F6 — missing-token normalization over a dirty value column. */
  private def qMissingNorm(s: SparkSession, dir: String): DataFrame = {
    val t = Tables(s, dir)
    val tokens = GF.MissingTokens.map(lit(_))
    val raw = when(col("event_id") % 7 === 0,
      element_at(array(tokens: _*), (col("event_id") % 19 + 1).cast("int")))
      .otherwise(col("value").cast("decimal(12,2)").cast("string"))
    t.events.select(col("event_type"), raw.as("raw"))
      .withColumn("v", GF.normalizeValue(col("raw")))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_rows"),
        count(col("v")).as("n_values"),
        round(sum(col("v")), 2).as("sum_value"))
      .orderBy(col("event_type"))
  }

  /** F7 — output downloadURL rewrite (GF.rewriteDownloadUrl). */
  private def qUrlRewrite(s: SparkSession, dir: String): DataFrame = {
    val t = Tables(s, dir)
    val path = when(col("doc_id") % 2 === 0,
      concat(lit("/data/output/catalog/"), col("source"), lit("/file.csv")))
      .otherwise(concat(lit("/tmp/"), col("source")))
    t.documents.select(col("doc_id"), path.as("path"))
      .withColumn("url",
        GF.rewriteDownloadUrl(col("path"), "/data/output", "https://h"))
      .orderBy(col("doc_id"))
  }

  /** F8 — nested output path assembly with fileName fallback. */
  private def qPathAssembly(s: SparkSession, dir: String): DataFrame = {
    val t = Tables(s, dir)
    t.documents.select(col("doc_id"), col("source"))
      .withColumn("distribution_id",
        concat(col("source"), lit("."), (col("doc_id") % 7).cast("string")))
      .withColumn("file_name",
        when(col("doc_id") % 3 === 0, concat(lit("f"), col("doc_id"), lit(".csv"))))
      .withColumn("path", GF.distributionPath(lit("cat1"), col("source"),
        col("distribution_id"), col("file_name")))
      .select(col("doc_id"), col("path"))
      .orderBy(col("doc_id"))
  }

  /** T4 — monotonic/distinct-index violations per series key
    * (TimeSeriesOps.monotonicViolations; day-granular event times force
    * duplicates). */
  private def qMonotonic(s: SparkSession, dir: String): DataFrame = {
    val t = Tables(s, dir)
    val series = t.events.select(
      col("user_id").cast("string").as("serie_id"),
      to_date(col("ts")).as("indice_tiempo"),
      col("value").as("valor"))
    TimeSeriesOps.monotonicViolations(series)
      .groupBy(col("serie_id")).agg(count(lit(1)).as("n_violations"))
      .orderBy(col("serie_id").cast("long"))
  }

  /** T3 — frequency-gap detection on a monthly series with holes
    * (TimeSeriesOps.frequencyGaps). */
  private def qFreqGaps(s: SparkSession, dir: String): DataFrame = {
    val t = Tables(s, dir)
    val series = t.lineitem
      .select(col("l_returnflag").as("serie_id"),
        trunc(to_date(col("l_shipdate")), "month").as("indice_tiempo"))
      .distinct()
      .filter(month(col("indice_tiempo")) % 5 =!= 0) // punch holes
      .withColumn("valor", lit(1.0))
    TimeSeriesOps.frequencyGaps(series, Frequency.Monthly)
      .select(col("serie_id"), col("prev_tiempo"), col("indice_tiempo"),
        col("step_periods").cast("int").as("gap_periods"))
      .orderBy(col("serie_id"), col("indice_tiempo"))
  }

  /** §2.9 — the validation battery as one summary query
    * (TimeSeriesOps.validationSummary). */
  private def qValidationSummary(s: SparkSession, dir: String): DataFrame = {
    val t = Tables(s, dir)
    val series = t.events.select(
      col("event_type").as("serie_id"),
      to_date(col("ts")).as("indice_tiempo"),
      when(col("value") >= 10, col("value")).as("valor"))
    TimeSeriesOps.validationSummary(series)
      .select(col("serie_id"), col("n_rows"), col("n_values"),
        col("n_not_increasing"), col("n_periods"), col("first_period"),
        col("last_period"), col("missing_ratio"), col("is_monotonic"),
        col("is_distinct"), col("is_valid"))
      .orderBy(col("serie_id"))
  }

  /** T3/§2.8 — complete-calendar resampling: observed monthly series
    * left-joined onto the generated full calendar
    * (TimeSeriesOps.completeCalendar). */
  private def qCompleteCalendar(s: SparkSession, dir: String): DataFrame = {
    val t = Tables(s, dir)
    val series = t.lineitem
      .select(col("l_returnflag").as("serie_id"),
        trunc(to_date(col("l_shipdate")), "month").as("indice_tiempo"))
      .distinct()
      .filter(month(col("indice_tiempo")) % 5 =!= 0)
      .withColumn("valor", lit(1.0))
    TimeSeriesOps.completeCalendar(series, Frequency.Monthly)
      .select(col("serie_id"), col("indice_tiempo"),
        col("valor").isNotNull.as("has_value"))
      .orderBy(col("serie_id"), col("indice_tiempo"))
  }

  /** S7/T1/J1 — coordinate scrape of a synthesized cell grid
    * (CellGrid.scrapeDistribution): time labels in column A, five value
    * series in columns B..F, missing tokens sprinkled in. */
  private def qScrapeGrid(s: SparkSession, dir: String): DataFrame = {
    val t = Tables(s, dir)
    val grid = scrapeFixtureGrid(t)
    val series = (2 to 6).map(c =>
      CellGrid.SeriesSpec(s"s$c", cell(c, 1), cell(c, 2)))
    CellGrid.scrapeDistribution(grid, "hoja", "A1", "A2",
        Frequency.Monthly, series)
      .orderBy(col("serie_id"), col("indice_tiempo"))
  }

  /** J1 — wide alignment of the scraped long form (pivot on serie_id). */
  private def qScrapeWide(s: SparkSession, dir: String): DataFrame = {
    val t = Tables(s, dir)
    val grid = scrapeFixtureGrid(t)
    val series = (2 to 6).map(c =>
      CellGrid.SeriesSpec(s"s$c", cell(c, 1), cell(c, 2)))
    val long = CellGrid.scrapeDistribution(grid, "hoja", "A1", "A2",
      Frequency.Monthly, series)
    TimeSeriesOps.alignWide(long, (2 to 6).map(c => s"s$c"))
  }

  private def cell(colIdx: Int, row: Int): String =
    s"${('A' + colIdx - 1).toChar}$row"

  /** A deterministic "workbook" grid built from the events table:
    * 200 data rows; col 1 = "YYYY-MM" month labels (T1 composed parse),
    * cols 2..6 = decimal strings with the reference's missing tokens
    * (F6) every 13th cell. Header row 1 carries serie ids. */
  private def scrapeFixtureGrid(t: Tables): DataFrame = {
    val e = t.events.filter(col("event_id") < 1000)
    val headers = t.events.filter(col("event_id") < 6)
      .select(lit("hoja").as("sheet"), lit(1).as("row"),
        (col("event_id") + 1).cast("int").as("col"),
        when(col("event_id") === 0, lit("indice_tiempo"))
          .otherwise(concat(lit("s"), (col("event_id") + 1).cast("string")))
          .as("value"))
    val data = e.select(
      lit("hoja").as("sheet"),
      (col("event_id") % 200 + 2).cast("int").as("row"),
      (floor(col("event_id") / 200) + 1).cast("int").as("col"),
      col("event_id"), col("value"))
    val tokens = GF.MissingTokens.map(lit(_))
    val body = data.withColumn("value",
      when(col("col") === 1,
        concat(lit("20"),
          lpad(floor((col("row") - 2) / 12).cast("int").cast("string"), 2, "0"),
          lit("-"), lpad(((col("row") - 2) % 12 + 1).cast("string"), 2, "0")))
        .when(col("event_id") % 13 === 0,
          element_at(array(tokens: _*), (col("event_id") % 19 + 1).cast("int")))
        .otherwise(col("value").cast("decimal(12,2)").cast("string")))
      .select(col("sheet"), col("row"), col("col"), col("value"))
    headers.union(body)
  }

  // -------------------------------------------------------------------
  // Registry
  // -------------------------------------------------------------------

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q01_pricing_summary" -> (qPricingSummary _),
    "q02_indicators" -> (qIndicators _),
    "q03_method_classify" -> (qMethodClassify _),
    "q04_semi_join" -> (qSemiJoin _),
    "q05_anti_join" -> (qAntiJoin _),
    "q06_star_revenue" -> (qStarRevenue _),
    "q07_pivot_daily" -> (qPivotDaily _),
    "q08_distinct" -> (qDistinct _),
    "q09_union_report" -> (qUnionReport _),
    "q10_status_sort" -> (qStatusSort _),
    "q11_first_valid" -> (qFirstValid _),
    "q12_string_funcs" -> (qStringFuncs _),
    "q13_cell_coords" -> (qCellCoords _),
    "q14_freq_map" -> (qFreqMap _),
    "q15_missing_norm" -> (qMissingNorm _),
    "q16_url_rewrite" -> (qUrlRewrite _),
    "q17_path_assembly" -> (qPathAssembly _),
    "q18_monotonic" -> (qMonotonic _),
    "q19_freq_gaps" -> (qFreqGaps _),
    "q20_validation_summary" -> (qValidationSummary _),
    "q21_complete_calendar" -> (qCompleteCalendar _),
    "q22_scrape_grid" -> (qScrapeGrid _),
    "q23_scrape_wide" -> (qScrapeWide _),
  )

  // -------------------------------------------------------------------
  // DuckDB oracles — same table names, same aliases, same rounding.
  // -------------------------------------------------------------------

  private val missingTokensSqlList: String =
    GF.MissingTokens.map(t => "'" + t + "'").mkString("[", ", ", "]")

  private val scrapeGridSql: String =
    s"""grid AS (
       |  SELECT 'hoja' AS sheet, 1 AS row, CAST(event_id + 1 AS INT) AS col,
       |         CASE WHEN event_id = 0 THEN 'indice_tiempo'
       |              ELSE 's' || CAST(event_id + 1 AS VARCHAR) END AS value
       |  FROM events WHERE event_id < 6
       |  UNION ALL
       |  SELECT 'hoja', CAST(event_id % 200 + 2 AS INT) AS row,
       |         CAST(event_id // 200 + 1 AS INT) AS col,
       |         CASE WHEN event_id // 200 + 1 = 1 THEN
       |             '20' || lpad(CAST((event_id % 200) // 12 AS VARCHAR), 2, '0') ||
       |             '-' || lpad(CAST((event_id % 200) % 12 + 1 AS VARCHAR), 2, '0')
       |           WHEN event_id % 13 = 0 THEN
       |             $missingTokensSqlList[CAST(event_id % 19 + 1 AS INT)]
       |           ELSE CAST(CAST(value AS DECIMAL(12,2)) AS VARCHAR) END AS value
       |  FROM events WHERE event_id < 1000
       |)""".stripMargin

  private val scrapeLongSql: String =
    s"""WITH $scrapeGridSql,
       |tm AS (
       |  SELECT row, CAST(value || '-01' AS DATE) AS indice_tiempo
       |  FROM grid WHERE sheet = 'hoja' AND col = 1 AND row >= 2
       |    AND regexp_matches(trim(value), '^\\d{4}-\\d{2}$$')
       |),
       |vals AS (
       |  SELECT row, 's' || CAST(col AS VARCHAR) AS serie_id,
       |         CASE WHEN value IS NULL OR list_contains($missingTokensSqlList, trim(value)) THEN NULL
       |              ELSE TRY_CAST(trim(value) AS DOUBLE) END AS valor
       |  FROM grid WHERE sheet = 'hoja' AND col >= 2 AND row >= 2
       |)
       |SELECT serie_id, indice_tiempo, valor
       |FROM tm JOIN vals USING (row)""".stripMargin

  def oracleSql: Map[String, String] = Map(
    "q01_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  round(sum(l_quantity), 2) AS sum_qty,
        |  round(sum(l_extendedprice), 2) AS sum_base_price,
        |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
        |  round(avg(l_quantity), 4) AS avg_qty,
        |  count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q02_indicators" ->
      """WITH ds AS (
        |  SELECT count(*) AS datasets,
        |    count(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS datasets_ok,
        |    count(CASE WHEN o_orderstatus NOT IN ('F','O') THEN 1 END) AS datasets_error
        |  FROM orders),
        |dist AS (
        |  SELECT count(*) AS distributions,
        |    count(CASE WHEN l_returnflag = 'N' THEN 1 END) AS distributions_ok,
        |    count(CASE WHEN l_returnflag NOT IN ('N','R') THEN 1 END) AS distributions_error
        |  FROM lineitem)
        |SELECT ds.*, dist.*,
        |  coalesce(round(distributions_ok * 100.0 / nullif(distributions, 0), 3), 0.0)
        |    AS distributions_percentage
        |FROM ds, dist""".stripMargin,

    "q03_method_classify" ->
      """WITH manifest AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 5 = 0 THEN 'http://x/' || source || '.csv' END AS downloadURL,
        |    'http://y/' || source || '.' ||
        |      (['txt','TXT','xlsx','XLS','zip'])[CAST(doc_id % 5 + 1 AS INT)] AS scrapingFileURL
        |  FROM documents),
        |m AS (
        |  SELECT CASE
        |    WHEN downloadURL IS NOT NULL THEN 'csv_file'
        |    WHEN lower(list_extract(string_split(scrapingFileURL, '.'), -1)) = 'txt' THEN 'text_file'
        |    WHEN lower(list_extract(string_split(scrapingFileURL, '.'), -1)) IN ('xls','xlsx') THEN 'excel_file'
        |    END AS method
        |  FROM manifest)
        |SELECT method, count(*) AS n FROM m GROUP BY method ORDER BY method""".stripMargin,

    "q04_semi_join" ->
      """SELECT c_mktsegment, count(*) AS n_customers
        |FROM customer c
        |WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,

    "q05_anti_join" ->
      """SELECT n_name, count(*) AS n_customers
        |FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
        |WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
        |GROUP BY n_name ORDER BY n_name""".stripMargin,

    "q06_star_revenue" ->
      """SELECT r_name, n_name,
        |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
        |  count(*) AS n_items
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name, n_name ORDER BY r_name, n_name""".stripMargin,

    "q07_pivot_daily" ->
      """SELECT CAST(ts AS DATE) AS day,
        |  round(sum(CASE WHEN event_type = 'click' THEN value END), 2) AS click,
        |  round(sum(CASE WHEN event_type = 'error' THEN value END), 2) AS error,
        |  round(sum(CASE WHEN event_type = 'purchase' THEN value END), 2) AS purchase,
        |  round(sum(CASE WHEN event_type = 'signup' THEN value END), 2) AS signup,
        |  round(sum(CASE WHEN event_type = 'view' THEN value END), 2) AS view
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,

    "q08_distinct" ->
      """SELECT user_id, count(*) AS n_types FROM (
        |  SELECT DISTINCT user_id, event_type FROM events)
        |GROUP BY user_id ORDER BY user_id""".stripMargin,

    "q09_union_report" ->
      """SELECT label, count(*) AS n FROM (
        |  SELECT o_orderstatus AS label FROM orders
        |  UNION ALL SELECT l_returnflag FROM lineitem)
        |GROUP BY label ORDER BY label""".stripMargin,

    "q10_status_sort" ->
      """SELECT distribution_status, count(*) AS n,
        |  CASE distribution_status WHEN 'ERROR' THEN 0 WHEN 'WARNING' THEN 1
        |    WHEN 'OK' THEN 2 ELSE 3 END AS rank
        |FROM (SELECT CASE WHEN o_orderkey % 10 < 6 THEN 'OK'
        |        WHEN o_orderkey % 10 < 9 THEN 'WARNING' ELSE 'ERROR' END
        |        AS distribution_status FROM orders)
        |GROUP BY distribution_status ORDER BY rank""".stripMargin,

    "q11_first_valid" ->
      """SELECT c_custkey, c_name, c_mktsegment FROM customer c
        |WHERE c_acctbal > 0
        |  AND EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
        |ORDER BY c_custkey LIMIT 1""".stripMargin,

    "q12_string_funcs" ->
      """SELECT p_partkey, replace(p_name, ' ', '') AS name_nospace,
        |  lower(list_extract(string_split('a/b/' || p_brand || '.' ||
        |    CAST(p_size AS VARCHAR), '.'), -1)) AS ext,
        |  list_extract(string_split('http://h/x/' || p_brand || '/' || p_name,
        |    '/'), -1) AS base
        |FROM part ORDER BY p_partkey""".stripMargin,

    "q13_cell_coords" ->
      """WITH c AS (
        |  SELECT p_partkey,
        |    (CASE WHEN p_partkey % 3 = 0 THEN chr(CAST(65 + p_partkey % 26 AS INT)) ELSE '' END)
        |    || chr(CAST(65 + p_partkey % 5 AS INT))
        |    || CAST(p_partkey % 90 + 1 AS VARCHAR) AS coord
        |  FROM part),
        |p AS (
        |  SELECT p_partkey, coord,
        |    string_split(upper(regexp_extract(coord, '^([A-Za-z]+)[0-9]+$', 1)), '')
        |      AS letters
        |  FROM c)
        |SELECT p_partkey, coord,
        |  CAST(nullif(regexp_extract(coord, '^[A-Za-z]+([0-9]+)$', 1), '') AS INT)
        |    AS row_num,
        |  CAST(list_sum(list_transform(letters,
        |    (ch, i) -> (ascii(ch) - 64) * (26 ** (len(letters) - i)))) AS INT)
        |    AS col_num
        |FROM p ORDER BY p_partkey""".stripMargin,

    "q14_freq_map" ->
      """WITH f AS (
        |  SELECT (['R/P1Y','R/P6M','R/P3M','R/P1M','R/P1D',NULL])
        |    [CAST(o_orderkey % 6 + 1 AS INT)] AS freq_iso
        |  FROM orders)
        |SELECT freq_iso,
        |  CASE freq_iso WHEN 'R/P1Y' THEN 'Y' WHEN 'R/P6M' THEN 'S'
        |    WHEN 'R/P3M' THEN 'Q' WHEN 'R/P1M' THEN 'M' WHEN 'R/P1D' THEN 'D'
        |    END AS freq_code,
        |  count(*) AS n
        |FROM f GROUP BY freq_iso, freq_code ORDER BY freq_iso""".stripMargin,

    "q15_missing_norm" ->
      s"""WITH raw AS (
         |  SELECT event_type,
         |    CASE WHEN event_id % 7 = 0
         |      THEN $missingTokensSqlList[CAST(event_id % 19 + 1 AS INT)]
         |      ELSE CAST(CAST(value AS DECIMAL(12,2)) AS VARCHAR) END AS raw
         |  FROM events),
         |norm AS (
         |  SELECT event_type,
         |    CASE WHEN raw IS NULL OR list_contains($missingTokensSqlList, trim(raw))
         |      THEN NULL ELSE TRY_CAST(trim(raw) AS DOUBLE) END AS v
         |  FROM raw)
         |SELECT event_type, count(*) AS n_rows, count(v) AS n_values,
         |  round(sum(v), 2) AS sum_value
         |FROM norm GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q16_url_rewrite" ->
      """WITH p AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 2 = 0
        |      THEN '/data/output/catalog/' || source || '/file.csv'
        |      ELSE '/tmp/' || source END AS path
        |  FROM documents)
        |SELECT doc_id, path,
        |  CASE WHEN starts_with(path, '/data/output')
        |    THEN 'https://h' || substring(path, 13)
        |    ELSE '' END AS url
        |FROM p ORDER BY doc_id""".stripMargin,

    "q17_path_assembly" ->
      """SELECT doc_id,
        |  concat_ws('/', 'catalog', 'cat1', 'dataset', source, 'distribution',
        |    source || '.' || CAST(doc_id % 7 AS VARCHAR), 'download',
        |    coalesce(CASE WHEN doc_id % 3 = 0 THEN 'f' || CAST(doc_id AS VARCHAR) || '.csv' END,
        |      source || '.' || CAST(doc_id % 7 AS VARCHAR) || '.csv')) AS path
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q18_monotonic" ->
      """SELECT CAST(user_id AS VARCHAR) AS serie_id,
        |  count(*) - count(DISTINCT CAST(ts AS DATE)) AS n_violations
        |FROM events GROUP BY user_id
        |HAVING count(*) - count(DISTINCT CAST(ts AS DATE)) > 0
        |ORDER BY user_id""".stripMargin,

    "q19_freq_gaps" ->
      """WITH months AS (
        |  SELECT DISTINCT l_returnflag AS serie_id,
        |    CAST(date_trunc('month', l_shipdate) AS DATE) AS indice_tiempo
        |  FROM lineitem),
        |holed AS (
        |  SELECT * FROM months WHERE month(indice_tiempo) % 5 <> 0),
        |lagged AS (
        |  SELECT serie_id, indice_tiempo,
        |    lag(indice_tiempo) OVER (PARTITION BY serie_id ORDER BY indice_tiempo)
        |      AS prev_tiempo
        |  FROM holed)
        |SELECT serie_id, prev_tiempo, indice_tiempo,
        |  date_diff('month', prev_tiempo, indice_tiempo) AS gap_periods
        |FROM lagged
        |WHERE prev_tiempo IS NOT NULL
        |  AND date_diff('month', prev_tiempo, indice_tiempo) <> 1
        |ORDER BY serie_id, indice_tiempo""".stripMargin,

    "q20_validation_summary" ->
      """WITH series AS (
        |  SELECT event_type AS serie_id, CAST(ts AS DATE) AS indice_tiempo,
        |    CASE WHEN value >= 10 THEN value END AS valor
        |  FROM events),
        |agg AS (
        |  SELECT serie_id, count(*) AS n_rows, count(valor) AS n_values,
        |    count(*) - count(DISTINCT indice_tiempo) AS n_not_increasing,
        |    count(DISTINCT indice_tiempo) AS n_periods,
        |    min(indice_tiempo) AS first_period, max(indice_tiempo) AS last_period
        |  FROM series GROUP BY serie_id)
        |SELECT serie_id, n_rows, n_values, n_not_increasing, n_periods,
        |  first_period, last_period,
        |  round(1.0 - n_values / CAST(n_rows AS DOUBLE), 6) AS missing_ratio,
        |  n_not_increasing = 0 AS is_monotonic,
        |  n_periods = n_rows AS is_distinct,
        |  (n_rows > 0 AND n_not_increasing = 0 AND n_periods = n_rows
        |    AND 1.0 - n_values / CAST(n_rows AS DOUBLE) <= 0.5) AS is_valid
        |FROM agg ORDER BY serie_id""".stripMargin,

    "q21_complete_calendar" ->
      """WITH months AS (
        |  SELECT DISTINCT l_returnflag AS serie_id,
        |    CAST(date_trunc('month', l_shipdate) AS DATE) AS indice_tiempo
        |  FROM lineitem),
        |holed AS (
        |  SELECT * FROM months WHERE month(indice_tiempo) % 5 <> 0),
        |bounds AS (
        |  SELECT serie_id, min(indice_tiempo) AS lo, max(indice_tiempo) AS hi
        |  FROM holed GROUP BY serie_id),
        |cal AS (
        |  SELECT b.serie_id, CAST(gs.d AS DATE) AS indice_tiempo
        |  FROM bounds b,
        |    LATERAL (SELECT unnest(generate_series(b.lo::TIMESTAMP,
        |      b.hi::TIMESTAMP, INTERVAL 1 MONTH)) AS d) gs)
        |SELECT c.serie_id, c.indice_tiempo,
        |  h.indice_tiempo IS NOT NULL AS has_value
        |FROM cal c LEFT JOIN holed h
        |  ON c.serie_id = h.serie_id AND c.indice_tiempo = h.indice_tiempo
        |ORDER BY c.serie_id, c.indice_tiempo""".stripMargin,

    "q22_scrape_grid" ->
      (scrapeLongSql + "\nORDER BY serie_id, indice_tiempo"),

    "q23_scrape_wide" ->
      s"""WITH long_form AS ($scrapeLongSql)
         |SELECT indice_tiempo,
         |  max(CASE WHEN serie_id = 's2' THEN valor END) AS s2,
         |  max(CASE WHEN serie_id = 's3' THEN valor END) AS s3,
         |  max(CASE WHEN serie_id = 's4' THEN valor END) AS s4,
         |  max(CASE WHEN serie_id = 's5' THEN valor END) AS s5,
         |  max(CASE WHEN serie_id = 's6' THEN valor END) AS s6
         |FROM long_form GROUP BY indice_tiempo ORDER BY indice_tiempo""".stripMargin,
  )
}
