package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Ingestion connector layer (SURVEY.md §2.1 S1-S4, S18, S23): the
  * reference's scrape pipeline re-shaped for Spark. Network I/O is
  * driver-external by design — the engine consumes deterministic
  * snapshots; the connector here is the executor-parallel fetch frame
  * with a PLUGGABLE fetch function, so tests (and offline runs) inject
  * a deterministic fake exactly like the reference's mock fallback
  * (scrape_tickers.py:429-457).
  *
  * Scale notes: fetch fan-out is partition parallelism (S4's thread
  * pool → mapPartitions over a keys Dataset); retry/backoff is
  * task-local (S1's retry loop); rate limiting stays a connector
  * concern (per-partition, never inside relational operators).
  */
object Ingest {

  case class Ticker(symbol: String, name: String, sector: String, url: String)

  /** S18: the reference's deterministic 22-row mock table
    * (scrape_tickers.py:430-455) as a LocalRelation. */
  val mockTickers: Seq[Ticker] = Seq(
    Ticker("HBL", "Habib Bank Limited", "Commercial Banks", "https://dps.psx.com.pk/company/HBL"),
    Ticker("ENGRO", "Engro Corporation Limited", "Fertilizer", "https://dps.psx.com.pk/company/ENGRO"),
    Ticker("PSO", "Pakistan State Oil Company Limited", "Oil & Gas Marketing Companies", "https://dps.psx.com.pk/company/PSO"),
    Ticker("LUCK", "Lucky Cement Limited", "Cement", "https://dps.psx.com.pk/company/LUCK"),
    Ticker("OGDC", "Oil & Gas Development Company Limited", "Oil & Gas Exploration Companies", "https://dps.psx.com.pk/company/OGDC"),
    Ticker("PPL", "Pakistan Petroleum Limited", "Oil & Gas Exploration Companies", "https://dps.psx.com.pk/company/PPL"),
    Ticker("UBL", "United Bank Limited", "Commercial Banks", "https://dps.psx.com.pk/company/UBL"),
    Ticker("MCB", "MCB Bank Limited", "Commercial Banks", "https://dps.psx.com.pk/company/MCB"),
    Ticker("FFC", "Fauji Fertilizer Company Limited", "Fertilizer", "https://dps.psx.com.pk/company/FFC"),
    Ticker("EFERT", "Engro Fertilizers Limited", "Fertilizer", "https://dps.psx.com.pk/company/EFERT"),
    Ticker("BAHL", "Bank AL Habib Limited", "Commercial Banks", "https://dps.psx.com.pk/company/BAHL"),
    Ticker("MEBL", "Meezan Bank Limited", "Commercial Banks", "https://dps.psx.com.pk/company/MEBL"),
    Ticker("CNERGY", "Cnergyico PK Limited", "Refinery", "https://dps.psx.com.pk/company/CNERGY"),
    Ticker("KEL", "K-Electric Limited", "Power Generation & Distribution", "https://dps.psx.com.pk/company/KEL"),
    Ticker("SSGC", "Sui Southern Gas Company Limited", "Oil & Gas Marketing Companies", "https://dps.psx.com.pk/company/SSGC"),
    Ticker("PIBTL", "Pakistan International Bulk Terminal Limited", "Transport", "https://dps.psx.com.pk/company/PIBTL"),
    Ticker("MLCF", "Maple Leaf Cement Factory Limited", "Cement", "https://dps.psx.com.pk/company/MLCF"),
    Ticker("PAEL", "Pak Elektron Limited", "Cable & Electrical Goods", "https://dps.psx.com.pk/company/PAEL"),
    Ticker("FCCL", "Fauji Cement Company Limited", "Cement", "https://dps.psx.com.pk/company/FCCL"),
    Ticker("WTL", "Worldcall Telecom Limited", "Technology & Communication", "https://dps.psx.com.pk/company/WTL"),
    Ticker("CPHL", "Citi Pharma Limited", "Pharmaceuticals", "https://dps.psx.com.pk/company/CPHL"),
    Ticker("SNGP", "Sui Northern Gas Pipelines Limited", "Oil & Gas Marketing Companies", "https://dps.psx.com.pk/company/SNGP"))

  def mockTickerTable(s: SparkSession): Dataset[Ticker] = {
    import s.implicits._
    s.createDataset(mockTickers)
  }

  /** S1+S4: executor-parallel per-key fetch with task-local retry and
    * exponential backoff (scrape_tickers.py:48-85's semantics, minus
    * the live socket — `fetch` is injected). Returns (key, payload?)
    * with None after maxRetries failures (reference: log + skip). */
  def fetchPerKey[K](keys: Dataset[K], parallelism: Int,
                     maxRetries: Int = 3, retryDelayMs: Long = 0L)
                    (fetch: K => String)
                    (implicit enc: org.apache.spark.sql.Encoder[(K, Option[String])])
      : Dataset[(K, Option[String])] = {
    keys.repartition(parallelism).mapPartitions { it =>
      it.map { k =>
        var attempt = 0
        var out: Option[String] = None
        while (out.isEmpty && attempt < maxRetries) {
          // NonFatal only: InterruptedException must propagate so task
          // cancellation kills the retry loop instead of being retried
          // a failed attempt backs off identically whether it failed by
          // THROWING or by returning null (the HTTP-429-mapped-to-null
          // case) — a null-returning rate limiter must not be hammered
          // in a zero-delay loop
          def backoff(): Unit = {
            attempt += 1
            if (retryDelayMs > 0 && attempt < maxRetries)
              Thread.sleep(retryDelayMs << (attempt - 1)) // exp backoff
          }
          try {
            val payload = fetch(k)
            if (payload != null) out = Some(payload)
            else backoff() // null payload = failed attempt, not data
          } catch {
            case scala.util.control.NonFatal(_) => backoff()
          }
        }
        (k, out)
      }
    }
  }

  /** S2 core loop: the market-watch TABLE scan (scrape_tickers.py:243-308)
    * as pure column expressions — find the <table> whose header mentions
    * SYMBOL, map header names → column ordinals, iterate tbody rows, and
    * resolve relative hrefs against `baseUrl`. No UDF, no external
    * parser: every step is a codegen'd regexp/HOF column expression, so
    * a million fetched pages parse partition-parallel with zero
    * serialization boundary.
    *
    * Header → ordinal mapping mirrors the reference exactly: SYMBOL,
    * CURRENT|PRICE, VOLUME, SECTOR matched case-insensitively on the
    * stripped <th> texts; a missing SYMBOL header falls back to column 0
    * (scrape_tickers.py:283-285). Rows with <2 cells, empty/1-char
    * symbols or 'SELECT' placeholders are dropped (same guards). */
  def parseMarketWatch(pages: DataFrame, baseUrl: String): DataFrame = {
    // 1. the candidate table: first <table> whose <th> texts mention SYMBOL
    val withTbl = pages.withColumn("mw_tbl", expr(
      """get(filter(regexp_extract_all(html, '(?s)<table[^>]*>.*?</table>', 0),
               t -> exists(regexp_extract_all(t, '(?s)<th[^>]*>(.*?)</th>', 1),
                           h -> upper(trim(regexp_replace(h, '<[^>]*>', ''))) LIKE '%SYMBOL%')), 0)"""))
      .filter(col("mw_tbl").isNotNull)
    // 2. header texts (thead th when present, else all th), uppercased
    val withHdrs = withTbl
      .withColumn("mw_head", expr(
        """CASE WHEN regexp_extract(mw_tbl, '(?s)<thead[^>]*>(.*?)</thead>', 1) = ''
                THEN mw_tbl
                ELSE regexp_extract(mw_tbl, '(?s)<thead[^>]*>(.*?)</thead>', 1) END"""))
      .withColumn("hdrs", expr(
        """transform(regexp_extract_all(mw_head, '(?s)<th[^>]*>(.*?)</th>', 1),
                     h -> upper(trim(regexp_replace(h, '<[^>]*>', ''))))"""))
    // header-name → ordinal (0-based), null when the header is absent
    def ordinal(pred: String) = expr(
      s"get(filter(transform(hdrs, (h, i) -> struct(i AS i, h AS h)), x -> $pred), 0).i")
    val withOrds = withHdrs
      .withColumn("sym_ord", ordinal("x.h LIKE '%SYMBOL%'"))
      .withColumn("price_ord", ordinal("x.h LIKE '%CURRENT%' OR x.h LIKE '%PRICE%'"))
      .withColumn("vol_ord", ordinal("x.h LIKE '%VOLUME%'"))
      .withColumn("sector_ord", ordinal("x.h LIKE '%SECTOR%'"))
    // 3. tbody rows → td cell arrays
    val cellText = (c: org.apache.spark.sql.Column) =>
      trim(regexp_replace(c, "<[^>]*>", ""))
    val rows = withOrds
      .withColumn("mw_row", explode(expr(
        """regexp_extract_all(
             CASE WHEN regexp_extract(mw_tbl, '(?s)<tbody[^>]*>(.*?)</tbody>', 1) = ''
                  THEN mw_tbl
                  ELSE regexp_extract(mw_tbl, '(?s)<tbody[^>]*>(.*?)</tbody>', 1) END,
             '(?s)<tr[^>]*>(.*?)</tr>', 1)""")))
      .withColumn("cells", expr("regexp_extract_all(mw_row, '(?s)<td[^>]*>(.*?)</td>', 1)"))
      .filter(size(col("cells")) >= 2) // reference: need symbol + ≥1 datum
      .withColumn("sym_cell", expr("get(cells, coalesce(sym_ord, 0))"))
    // 4. symbol normalization + relative-href resolution
    rows
      .withColumn("symbol",
        graft.operators.Relational.normalizeSymbol(cellText(col("sym_cell"))))
      .withColumn("href", regexp_extract(col("sym_cell"), "href=\"([^\"]*)\"", 1))
      .withColumn("url",
        when(col("href") === "", lit(""))
          .when(col("href").startsWith("/"), concat(lit(baseUrl), col("href")))
          .when(col("href").startsWith("http"), col("href"))
          .otherwise(concat(lit(baseUrl), lit("/"), col("href"))))
      .withColumn("price", expr(
        "try_cast(regexp_replace(trim(regexp_replace(get(cells, price_ord), '<[^>]*>', '')), ',', '') AS DOUBLE)"))
      .withColumn("volume", expr(
        "try_cast(regexp_replace(trim(regexp_replace(get(cells, vol_ord), '<[^>]*>', '')), ',', '') AS BIGINT)"))
      .withColumn("sector", expr(
        "trim(regexp_replace(get(cells, sector_ord), '<[^>]*>', ''))"))
      .filter(length(col("symbol")) > 1 && !upper(col("symbol")).contains("SELECT"))
      .select("symbol", "url", "price", "volume", "sector")
  }

  /** S20/S1 degradation ladder (scrape_tickers.py:222-457): try each
    * source in order, accept the first yielding ≥1 row, else fall back
    * to the deterministic mock table — every row tagged with its
    * provenance. The 1-row existence probe is a bounded connector-layer
    * orchestration action (it decides WHICH plan to run), not a data
    * collect inside an operator. */
  def loadTickersWithFallback(s: SparkSession,
      attempts: Seq[(String, () => DataFrame)]): DataFrame =
    attempts.iterator.flatMap { case (prov, load) =>
      try {
        val df = load()
        if (!df.isEmpty) Some(df.withColumn("provenance", lit(prov))) else None
      } catch { case scala.util.control.NonFatal(_) => None }
    }.nextOption().getOrElse(
      mockTickerTable(s).toDF().withColumn("provenance", lit("mock")))

  /** S3: extract ticker rows from company-page-shaped HTML — the
    * reference's detail-page scan (scrape_tickers.py:88-180) as pure
    * column expressions (regexp over the page text, no UDF, no external
    * parser). Input: (symbol?, html) rows; output parsed fields. */
  def parseCompanyPages(pages: DataFrame): DataFrame =
    pages.select(
      upper(trim(regexp_extract(col("html"),
        "(?s)<h1[^>]*class=\"quote__symbol\"[^>]*>([^<]+)</h1>", 1))).as("symbol"),
      trim(regexp_extract(col("html"),
        "(?s)<h2[^>]*class=\"quote__name\"[^>]*>([^<]+)</h2>", 1)).as("name"),
      trim(regexp_extract(col("html"),
        "(?s)<span[^>]*class=\"quote__sector\"[^>]*>([^<]+)</span>", 1)).as("sector"))
      .withColumn("name", when(col("name") === "", lit("No record found")).otherwise(col("name")))
      .withColumn("sector", when(col("sector") === "", lit("Unknown")).otherwise(col("sector")))
      .filter(length(col("symbol")) > 1 && !col("symbol").contains("SELECT"))
}
