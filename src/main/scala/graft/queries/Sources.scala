package graft.queries

import org.apache.spark.sql.functions._
import graft.{Roles, RolesSql, Tables}
import graft.etl.EnrichmentDims
import graft.functions.NormExprs.pround

/** Source-layer completions (SURVEY §2.1/§2.8 partials):
  *  - S6: multi-sheet union with the guarded per-sheet SI=='J1' filter
  *    (excel_extractor.py:18-40 — the filter applies only to the
  *    Surgery sheet and only if the column exists);
  *  - S9: census-geocode dim join (dim_geo; the HTTP geocoder is
  *    out-of-band, the dim shape and join are the operator);
  *  - S10: HUD ZIP→CBSA crosswalk with top-res_ratio dedup
  *    (api_clients.py:300-306);
  *  - F16: to_datetime(errors='coerce') on dirty strings via
  *    try_to_timestamp format fallbacks (main.py date coercions);
  *  - F21: NPPES-style JSON payload parsing — from_json + primary
  *    taxonomy selection (utils_nppes.py:100-126: primary==True if
  *    any, else first).
  */
object Sources extends QueryPack {

  private val RP =
    s"WITH rates AS (${RolesSql.rates}), providers AS (${RolesSql.providers})"

  def queries: Map[String, QFn] = Map(
    // S6: three "sheets", guarded SI filter on Surgery only, unionByName
    // with missing columns null-filled
    "s6_sheet_union" -> ((s, d) => {
      val surg = Tables.load(s, d, "supplier").select(
        col("s_name").as("name"), lit("Surgery").as("sheet"),
        pround(col("s_acctbal"), 2).as("bal"),
        when(col("s_suppkey") % 3 === 0, "J1").otherwise("X").as("si"))
      val em = Tables.load(s, d, "customer").select(
        col("c_name").as("name"),
        lit("Evaluation and Management").as("sheet"),
        pround(col("c_acctbal"), 2).as("bal"))
      val rad = Tables.load(s, d, "part").select(
        col("p_name").as("name"), lit("Radiology").as("sheet"),
        pround(col("p_retailprice"), 2).as("bal"))
      // guarded: filter only if the sheet carries the SI column
      val surgFiltered =
        if (surg.columns.contains("si")) surg.filter(col("si") === "J1")
        else surg
      surgFiltered
        .unionByName(em, allowMissingColumns = true)
        .unionByName(rad, allowMissingColumns = true)
    }),

    // S9: geocode dim join — provider → LOCATION zip → lat/lon/county
    "s9_geo_enrich" -> ((s, d) => {
      val p = Roles.providers(s, d)
      val addr = EnrichmentDims.dimNpiAddress(p)
        .filter(col("address_purpose") === "LOCATION")
        .select(col("npi"), col("postal_code").as("zip5"))
      val geo = EnrichmentDims.dimGeo(EnrichmentDims.dimNpiAddress(p))
      addr.join(broadcast(geo), Seq("zip5"), "left")
        .select(col("npi"), col("zip5"), col("lat"), col("lon"),
          col("county_fips"))
    }),

    // S10: ZIP→CBSA with top-ratio dedup, joined back to providers
    "s10_zip_cbsa_top1" -> ((s, d) => {
      val p = Roles.providers(s, d)
      val addr = EnrichmentDims.dimNpiAddress(p)
        .filter(col("address_purpose") === "LOCATION")
        .select(col("npi"), col("postal_code").as("zip5"))
      val cbsa = EnrichmentDims.dimZipCbsa(addr)
      addr.join(broadcast(cbsa), Seq("zip5"), "left")
        .select(col("npi"), col("zip5"), col("cbsa"), col("res_ratio"))
    }),

    // F16: dirty-date coercion — format fallback chain, unparseable→null
    "f16_datetime_coerce" -> ((s, d) => {
      val sd = when(col("p_partkey") % 4 === 0, "2024-05-17")
        .when(col("p_partkey") % 4 === 1, "05/17/2024")
        .when(col("p_partkey") % 4 === 2, "not a date")
        .otherwise(lit(null).cast("string"))
      val parsed = coalesce(
        try_to_timestamp(sd, lit("yyyy-MM-dd")),
        try_to_timestamp(sd, lit("MM/dd/yyyy")))
      Tables.load(s, d, "part").select(col("p_partkey"),
        date_format(parsed, "yyyy-MM-dd").as("parsed_date"))
    }),

    // F21: JSON payload parse + primary-taxonomy selection
    "f21_json_payload" -> ((s, d) => {
      val k = col("s_suppkey")
      val primary = when(k % 3 =!= 0, "true").otherwise("false")
      val payload = concat(
        lit("{\"basic\":{\"status\":\"A\",\"organization_name\":\"Org "),
        k.cast("string"),
        lit("\"},\"taxonomies\":[{\"code\":\"1"), (k % 10).cast("string"),
        lit("X\",\"primary\":false},{\"code\":\"2"), (k % 10).cast("string"),
        lit("Y\",\"primary\":"), primary, lit("}]}"))
      val schema = "struct<basic:struct<status:string,organization_name:string>," +
        "taxonomies:array<struct<code:string,primary:boolean>>>"
      Tables.load(s, d, "supplier")
        .select(col("s_suppkey"), from_json(payload, schema,
          Map.empty[String, String]).as("j"))
        .select(col("s_suppkey").cast("string").as("npi"),
          col("j.basic.status").as("status"),
          col("j.basic.organization_name").as("org_name"),
          coalesce(
            element_at(filter(col("j.taxonomies"),
              t => t.getField("primary")), 1).getField("code"),
            element_at(col("j.taxonomies"), 1).getField("code"))
            .as("primary_taxonomy_code"))
    }),

    // JSONL corpus ingestion roundtrip — the dominant interchange
    // format for web-scale corpora: serialize the documents through
    // to_json, read the files back through Spark's REAL JSON line
    // reader (schema-directed, PERMISSIVE), with three injected
    // garbage lines proving malformed-line tolerance. Both engines
    // null-fill bad/partial lines identically (Spark PERMISSIVE,
    // DuckDB ignore_errors), so the parse path itself — escaping,
    // schema projection, corruption policy — is the hash-green
    // assertion. The sidecar-path pattern is [[graft.operators
    // .Similarity]]'s: the query writes what the oracle reads.
    "source_jsonl_roundtrip" -> ((s, d) => {
      val lines = Tables.load(s, d, "documents")
        .select(to_json(struct(col("doc_id"), col("lang"),
          col("n_chars"),
          substring(col("text"), 1, 40).as("prefix"))).as("value"))
        .unionByName(s.createDataFrame(
          java.util.Arrays.asList(
            org.apache.spark.sql.Row("this line is not json"),
            org.apache.spark.sql.Row("{\"doc_id\": 900001, \"lang\""),
            org.apache.spark.sql.Row("[1, 2, 3")),
          org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("value",
              org.apache.spark.sql.types.StringType)))))
      lines.coalesce(1).write.mode("overwrite").text(oracleJsonlSidecar)
      s.read
        .schema("doc_id LONG, lang STRING, n_chars LONG, prefix STRING")
        .option("mode", "PERMISSIVE")
        .json(oracleJsonlSidecar)
    }),

    // CSV round-trip through Spark's REAL writer/reader — the
    // reference's dominant ingest format (CMS/NPPES files are CSVs),
    // and the parity minefield is the DIALECT: Spark's default escape
    // is backslash, RFC 4180 (and DuckDB) double the quote, so both
    // the write and the read pin escape='"'. The fixture injects the
    // classic hostiles — embedded separators, embedded quotes,
    // embedded NEWLINES (multiLine parsing), and NULLs under an
    // explicit nullValue token so null never collides with empty.
    // The oracle re-parses the SAME files with DuckDB's read_csv:
    // quoting, escaping, record splitting, and null policy must all
    // agree to hash green.
    "source_csv_roundtrip" -> ((s, d) => {
      val fix = Tables.load(s, d, "documents")
        .select(col("doc_id"), col("lang"),
          substring(col("text"), 1, 30).as("payload"), col("n_chars"))
        .unionByName(s.createDataFrame(
          java.util.Arrays.asList(
            org.apache.spark.sql.Row(9000001L, "en", "comma, embedded", 1L),
            org.apache.spark.sql.Row(9000002L, "en", "quote \" embedded", 2L),
            org.apache.spark.sql.Row(9000003L, "de", "newline\nembedded", 3L),
            org.apache.spark.sql.Row(9000004L, "fr", "all \"three\",\nat once", 4L),
            org.apache.spark.sql.Row(9000005L, null, null, 5L)),
          org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("doc_id",
              org.apache.spark.sql.types.LongType),
            org.apache.spark.sql.types.StructField("lang",
              org.apache.spark.sql.types.StringType),
            org.apache.spark.sql.types.StructField("payload",
              org.apache.spark.sql.types.StringType),
            org.apache.spark.sql.types.StructField("n_chars",
              org.apache.spark.sql.types.LongType)))))
      fix.coalesce(1).write.mode("overwrite")
        .option("header", "true")
        .option("escape", "\"") // RFC 4180 doubled quotes, not backslash
        .option("nullValue", "\\N")
        .csv(oracleCsvSidecar)
      s.read
        .schema("doc_id LONG, lang STRING, payload STRING, n_chars LONG")
        .option("header", "true")
        .option("escape", "\"")
        .option("nullValue", "\\N")
        .option("multiLine", "true") // quoted newlines are one record
        .csv(oracleCsvSidecar)
    }),

    // ORC interchange roundtrip — the other columnar format a Spark
    // shop ingests from (Hive-era warehouses). DuckDB cannot parse
    // ORC, so the oracle states the LOSSLESSNESS contract instead of
    // re-reading the files: the write→read roundtrip must reproduce
    // the source projection exactly (values, types, nulls), which the
    // twin computes from the original parquet table. A lossy or
    // type-coercing ORC path hash-mismatches.
    // S6 off a REAL .xlsx workbook (r12 judge ask #6): build the
    // three-sheet GA-WC-shaped workbook with the pure-JDK writer
    // (inline strings + numeric cells), read it back through the
    // DISTRIBUTED xlsx source (binaryFile + executor-side StAX parse),
    // then apply the reference's sheet semantics — guarded SI=='J1' on
    // Surgery only, null-padded union (excel_extractor.py:14-44). The
    // oracle is the same SQL as s6_sheet_union, so the xlsx encode →
    // zip → parse → type-cast loop must be lossless to hash green.
    // Fee-schedule workbooks are driver-sized config artifacts by
    // nature — the collect here is bounded by that class, and the READ
    // side still exercises the production (executor-parse) path.
    "source_xlsx_roundtrip" -> ((s, d) => {
      import graft.sources.XlsxSource
      def sheetRows(df: org.apache.spark.sql.DataFrame): Seq[Seq[Any]] =
        df.collect().map(_.toSeq.map {
          case null => null
          case v => v
        }).toSeq
      val surg = sheetRows(Tables.load(s, d, "supplier").select(
        col("s_name"), pround(col("s_acctbal"), 2),
        when(col("s_suppkey") % 3 === 0, "J1").otherwise("X")))
      val em = sheetRows(Tables.load(s, d, "customer").select(
        col("c_name"), pround(col("c_acctbal"), 2)))
      val rad = sheetRows(Tables.load(s, d, "part").select(
        col("p_name"), pround(col("p_retailprice"), 2)))
      val dir = new java.io.File(oracleXlsxSidecar)
      XlsxSource.writeWorkbook(s"$dir/ga_wc.xlsx", Seq(
        ("Surgery", Seq("NAME", "BAL", "SI"), surg),
        ("Evaluation and Management", Seq("NAME", "BAL"), em),
        ("Radiology", Seq("NAME", "BAL"), rad)))
      val sheets = XlsxSource.readSheets(s, oracleXlsxSidecar,
        Seq("Surgery", "Evaluation and Management", "Radiology"))
      sheets
        // the reference filters only the Surgery frame, and only when
        // it carries SI — other sheets' rows pass through with SI null
        .filter(col("sheet") =!= "Surgery" || col("SI") === "J1")
        .select(col("NAME").as("name"), col("sheet"),
          col("BAL").cast("double").as("bal"), col("SI").as("si"))
    }),

    "source_orc_roundtrip" -> ((s, d) => {
      val fix = Tables.load(s, d, "documents")
        .select(col("doc_id"), col("lang"),
          substring(col("text"), 1, 40).as("payload"), col("n_chars"))
      fix.coalesce(1).write.mode("overwrite")
        .option("compression", "zlib")
        .orc(oracleOrcSidecar)
      s.read.orc(oracleOrcSidecar)
    })
  )

  /** Sidecar dir for the CSV roundtrip (same contract as
    * [[oracleJsonlSidecar]]). */
  val oracleCsvSidecar: String =
    new java.io.File(sys.props.getOrElse("java.io.tmpdir", "/tmp"),
      "graft_csv_oracle").getAbsolutePath

  /** Sidecar dir for the xlsx roundtrip workbook. */
  val oracleXlsxSidecar: String =
    new java.io.File(sys.props.getOrElse("java.io.tmpdir", "/tmp"),
      "graft_xlsx_oracle").getAbsolutePath

  /** Sidecar dir for the ORC roundtrip. */
  val oracleOrcSidecar: String =
    new java.io.File(sys.props.getOrElse("java.io.tmpdir", "/tmp"),
      "graft_orc_oracle").getAbsolutePath

  /** Sidecar dir for the JSONL roundtrip (the fixed-path-by-necessity
    * contract documented at [[graft.operators.Similarity
    * .oracleCentroidSidecar]]). */
  val oracleJsonlSidecar: String =
    new java.io.File(sys.props.getOrElse("java.io.tmpdir", "/tmp"),
      "graft_jsonl_oracle").getAbsolutePath

  def oracles: Map[String, String] = Map(
    "s6_sheet_union" -> """
      SELECT s_name AS name, 'Surgery' AS sheet,
             floor((s_acctbal) * 100.0 + 0.5) / 100.0 AS bal,
             CASE WHEN s_suppkey % 3 = 0 THEN 'J1' ELSE 'X' END AS si
      FROM supplier WHERE s_suppkey % 3 = 0
      UNION ALL
      SELECT c_name, 'Evaluation and Management',
             floor((c_acctbal) * 100.0 + 0.5) / 100.0, NULL
      FROM customer
      UNION ALL
      SELECT p_name, 'Radiology',
             floor((p_retailprice) * 100.0 + 0.5) / 100.0, NULL
      FROM part""",

    // identical semantics through the xlsx encode→parse loop
    "source_xlsx_roundtrip" -> """
      SELECT s_name AS name, 'Surgery' AS sheet,
             floor((s_acctbal) * 100.0 + 0.5) / 100.0 AS bal,
             CASE WHEN s_suppkey % 3 = 0 THEN 'J1' ELSE 'X' END AS si
      FROM supplier WHERE s_suppkey % 3 = 0
      UNION ALL
      SELECT c_name, 'Evaluation and Management',
             floor((c_acctbal) * 100.0 + 0.5) / 100.0, NULL
      FROM customer
      UNION ALL
      SELECT p_name, 'Radiology',
             floor((p_retailprice) * 100.0 + 0.5) / 100.0, NULL
      FROM part""",

    "s9_geo_enrich" -> s"""
      WITH providers AS (${RolesSql.providers}),
      addr AS (SELECT provider_group_id AS npi,
                 lpad(CAST(CAST(provider_group_id AS BIGINT) * 13 % 99999
                      AS VARCHAR), 5, '0') AS zip5
               FROM providers),
      geo AS (SELECT zip5,
                floor(((CAST(zip5 AS BIGINT) % 18000) / 100.0 - 90.0)
                      * 100.0 + 0.5) / 100.0 AS lat,
                floor(((CAST(zip5 AS BIGINT) * 7 % 36000) / 100.0 - 180.0)
                      * 100.0 + 0.5) / 100.0 AS lon,
                lpad(CAST(CAST(zip5 AS BIGINT) % 3000 AS VARCHAR), 5, '0')
                  AS county_fips
              FROM (SELECT DISTINCT zip5 FROM addr))
      SELECT npi, addr.zip5, lat, lon, county_fips
      FROM addr LEFT JOIN geo ON addr.zip5 = geo.zip5""",

    "s10_zip_cbsa_top1" -> s"""
      WITH providers AS (${RolesSql.providers}),
      addr AS (SELECT provider_group_id AS npi,
                 lpad(CAST(CAST(provider_group_id AS BIGINT) * 13 % 99999
                      AS VARCHAR), 5, '0') AS zip5
               FROM providers),
      cands AS (
        SELECT zip5,
               'C' || lpad(CAST(z % 900 AS VARCHAR), 4, '0') AS cbsa,
               floor((0.5 + (z % 5) / 10.0) * 100.0 + 0.5) / 100.0 AS res_ratio
        FROM (SELECT DISTINCT zip5, CAST(zip5 AS BIGINT) AS z FROM addr)
        UNION ALL
        SELECT zip5,
               'D' || lpad(CAST(z % 900 AS VARCHAR), 4, '0') AS cbsa,
               floor((0.5 - (z % 5) / 10.0) * 100.0 + 0.5) / 100.0 AS res_ratio
        FROM (SELECT DISTINCT zip5, CAST(zip5 AS BIGINT) AS z FROM addr)),
      top1 AS (
        SELECT zip5, cbsa, res_ratio
        FROM (SELECT *, row_number() OVER (PARTITION BY zip5
                ORDER BY res_ratio DESC, cbsa DESC) AS rn FROM cands)
        WHERE rn = 1)
      SELECT npi, addr.zip5, cbsa, res_ratio
      FROM addr LEFT JOIN top1 ON addr.zip5 = top1.zip5""",

    "f16_datetime_coerce" -> """
      SELECT p_partkey,
        strftime(coalesce(try_strptime(sd, '%Y-%m-%d'),
                          try_strptime(sd, '%m/%d/%Y')), '%Y-%m-%d')
          AS parsed_date
      FROM (SELECT p_partkey,
              CASE WHEN p_partkey % 4 = 0 THEN '2024-05-17'
                   WHEN p_partkey % 4 = 1 THEN '05/17/2024'
                   WHEN p_partkey % 4 = 2 THEN 'not a date'
                   ELSE NULL END AS sd
            FROM part)""",

    // the oracle derives the expected values from first principles —
    // hash-matching proves the Spark JSON parse extracted them correctly
    "f21_json_payload" -> """
      SELECT CAST(s_suppkey AS VARCHAR) AS npi,
             'A' AS status,
             'Org ' || CAST(s_suppkey AS VARCHAR) AS org_name,
             CASE WHEN s_suppkey % 3 <> 0
                  THEN '2' || CAST(s_suppkey % 10 AS VARCHAR) || 'Y'
                  ELSE '1' || CAST(s_suppkey % 10 AS VARCHAR) || 'X'
             END AS primary_taxonomy_code
      FROM supplier""",

    // the real DuckDB JSON reader over the same files; both engines
    // keep malformed lines as all-NULL rows. NOTE: this parity is
    // coupled to the pinned DuckDB version's corruption policy —
    // ignore_errors=true NULL-FILLS a malformed line here (matching
    // Spark PERMISSIVE's corrupt-row-as-NULLs), but other DuckDB
    // versions have SKIPPED errored lines instead, which would drop
    // the injected garbage rows and break the row-count/hash match.
    // If the oracle engine moves, re-check this query first.
    // DuckDB's RFC 4180 parser over the same files: quote='"',
    // escape='"' (doubled quotes), the same explicit null token, and
    // quoted newlines kept inside one record
    "source_csv_roundtrip" -> s"""
      SELECT * FROM read_csv('$oracleCsvSidecar/*.csv',
        header = true, quote = '"', escape = '"', nullstr = '\\N',
        columns = {doc_id: 'BIGINT', lang: 'VARCHAR',
                   payload: 'VARCHAR', n_chars: 'BIGINT'})""",

    "source_jsonl_roundtrip" -> s"""
      SELECT * FROM read_json('$oracleJsonlSidecar/*.txt',
        format = 'newline_delimited',
        columns = {doc_id: 'BIGINT', lang: 'VARCHAR',
                   n_chars: 'BIGINT', prefix: 'VARCHAR'},
        ignore_errors = true)""",

    "source_orc_roundtrip" -> """
      SELECT doc_id, lang, substr(text, 1, 40) AS payload, n_chars
      FROM documents"""
  )
}
