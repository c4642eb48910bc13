package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Three-level CPT/HCPCS procedure taxonomy
  * (procedure_set, procedure_class, procedure_group).
  *
  * Semantics from the reference's bespoke categorizer
  * (src/transformers/categorizer.py:69-254, duplicated at
  * main.py:1019-1160): 'G' prefix → HCPCS/Medicare Specific/G-Codes,
  * 'IME' prefix → HCPCS/Facility Specific/IME Codes, then ~40 integer
  * range rules over 10000-99999; non-numeric → Unknown; numeric out of
  * range → Other/Miscellaneous/Unspecified. Dispatch order matters:
  * E&M (99000-99999) is checked before Medicine (90000-98999).
  *
  * Implemented as a single `when`-chain over built-ins so it stays in
  * whole-stage codegen — no UDF, no driver-side lookup, scales to any
  * input size. The prod crosswalk alternative (dim_code_cat broadcast
  * join; prod_etl/create_dim_proc_cat.ipynb) is in etl.EnrichmentDims.
  */
object Categorizer {

  private def t(s: String, c: String, g: String): Column =
    struct(lit(s).as("proc_set"), lit(c).as("proc_class"), lit(g).as("proc_group"))

  /** code column (any type) → struct(proc_set, proc_class, proc_group). */
  def categorize(codeCol: Column): Column = {
    val s = trim(codeCol.cast("string"))
    // int(code) equivalent: digits-only strings parse, else null (Unknown).
    // {1,18} keeps the cast inside Long range (and the oracle's BIGINT).
    val n = when(s.rlike("^[0-9]{1,18}$"), s.cast("long"))

    def in(lo: Int, hi: Int): Column = n >= lo && n <= hi

    val radiology =
      when(in(70000, 70559), t("Radiology", "Head and Neck Imaging", "Skull and Brain"))
      .when(in(70560, 70999), t("Radiology", "Head and Neck Imaging", "Spine and Neck"))
      .when(in(71000, 71999), t("Radiology", "Chest Imaging", "Thoracic Studies"))
      .when(in(72000, 72159), t("Radiology", "Spine Imaging", "Spinal Radiography"))
      .when(in(72160, 72999), t("Radiology", "Spine Imaging", "Spinal CT/MRI"))
      .when(in(73000, 73225), t("Radiology", "Extremity Imaging", "Upper Extremity"))
      .when(in(73226, 73999), t("Radiology", "Extremity Imaging", "Lower Extremity"))
      .when(in(74000, 74999), t("Radiology", "Abdomen/GI Imaging", "Abdominal Studies"))
      .when(in(75000, 75999), t("Radiology", "Vascular Imaging", "Angiography"))
      .when(in(76000, 76499), t("Radiology", "Other Imaging", "Fluoroscopy"))
      .when(in(76500, 76999), t("Radiology", "Other Imaging", "Ultrasound"))
      .when(in(77000, 77099), t("Radiology", "Radiation Oncology", "Treatment Planning"))
      .when(in(77100, 77999), t("Radiology", "Radiation Oncology", "Treatment Delivery"))
      .when(in(78000, 78999), t("Radiology", "Nuclear Medicine", "Nuclear Studies"))
      .otherwise(t("Radiology", "Radiopharmaceutical", "Therapeutic Nuclear"))

    val surgery =
      when(in(10000, 17999), t("Surgery", "Integumentary System", "Skin Procedures"))
      .when(in(18000, 19999), t("Surgery", "Integumentary System", "Breast Procedures"))
      .when(in(20000, 25999), t("Surgery", "Musculoskeletal System", "General Orthopedic"))
      .when(in(26000, 29999), t("Surgery", "Musculoskeletal System", "Hand/Wrist Surgery"))
      .when(in(30000, 32999), t("Surgery", "Respiratory System", "Pulmonary Procedures"))
      .when(in(33000, 37999), t("Surgery", "Cardiovascular System", "Cardiac/Vascular Surgery"))
      .when(in(38000, 41999), t("Surgery", "Hemic/Lymphatic System", "Blood/Lymph Procedures"))
      .when(in(42000, 43999), t("Surgery", "Digestive System", "Upper GI Surgery"))
      .when(in(44000, 49999), t("Surgery", "Digestive System", "Lower GI Surgery"))
      .when(in(50000, 54999), t("Surgery", "Urinary System", "Urological Surgery"))
      .when(in(55000, 59999), t("Surgery", "Genital System", "Reproductive Surgery"))
      .when(in(60000, 64999), t("Surgery", "Endocrine/Nervous System", "Specialized Surgery"))
      .otherwise(t("Surgery", "Eye/Ear System", "Sensory Surgery"))

    val em =
      when(n === 99091, t("Evaluation & Management", "Remote Monitoring", "Digital Health"))
      .when(in(99202, 99215), t("Evaluation & Management", "Office Visits", "Outpatient E&M"))
      .when(in(99221, 99239), t("Evaluation & Management", "Hospital Care", "Inpatient E&M"))
      .when(in(99242, 99255), t("Evaluation & Management", "Consultations", "Consultation E&M"))
      .when(in(99281, 99288), t("Evaluation & Management", "Emergency Care", "Emergency E&M"))
      .when(in(99291, 99292), t("Evaluation & Management", "Critical Care", "Intensive Care E&M"))
      .when(in(99304, 99318), t("Evaluation & Management", "Nursing Facility", "Long-term Care E&M"))
      .when(in(99341, 99350), t("Evaluation & Management", "Home Visits", "Home Care E&M"))
      .when(in(99358, 99499), t("Evaluation & Management", "Special Services", "Miscellaneous E&M"))
      .otherwise(t("Evaluation & Management", "Other E&M", "General E&M"))

    val pathLab =
      when(in(80000, 84999), t("Pathology & Laboratory", "Chemistry", "Clinical Chemistry"))
      .when(in(85000, 85999), t("Pathology & Laboratory", "Hematology", "Blood Studies"))
      .when(in(86000, 86999), t("Pathology & Laboratory", "Immunology", "Immune System Tests"))
      .when(in(87000, 87999), t("Pathology & Laboratory", "Microbiology", "Infectious Disease"))
      .when(in(88000, 88999), t("Pathology & Laboratory", "Anatomic Pathology", "Tissue Studies"))
      .otherwise(t("Pathology & Laboratory", "Other Laboratory", "Miscellaneous Lab"))

    val medicine =
      when(in(90000, 90999), t("Medicine", "Immunizations", "Vaccines and Injections"))
      .when(in(91000, 91999), t("Medicine", "Gastroenterology", "GI Procedures"))
      .when(in(92000, 92499), t("Medicine", "Ophthalmology", "Eye Procedures"))
      .when(in(92500, 92999), t("Medicine", "Otolaryngology", "ENT Procedures"))
      .when(in(93000, 93999), t("Medicine", "Cardiovascular", "Cardiac Procedures"))
      .when(in(94000, 94999), t("Medicine", "Pulmonary", "Lung Function Tests"))
      .when(in(95000, 95999), t("Medicine", "Neurology", "Neurological Tests"))
      .when(in(96000, 96999), t("Medicine", "Psychiatry", "Mental Health Services"))
      .when(in(97000, 97999), t("Medicine", "Physical Medicine", "Rehabilitation"))
      .otherwise(t("Medicine", "Other Medicine", "Miscellaneous Medicine"))

    when(codeCol.isNull, t("Unknown", "Unknown", "Unknown"))
      .when(s.startsWith("G"), t("HCPCS", "Medicare Specific", "G-Codes"))
      .when(s.startsWith("IME"), t("HCPCS", "Facility Specific", "IME Codes"))
      .when(n.isNull, t("Unknown", "Unknown", "Unknown"))
      .when(in(70000, 79999), radiology)
      .when(in(10000, 69999), surgery)
      .when(in(99000, 99999), em)
      .when(in(80000, 89999), pathLab)
      .when(in(90000, 98999), medicine)
      .otherwise(t("Other", "Miscellaneous", "Unspecified"))
  }

  /** The same dispatch as ANSI SQL CASE text, usable as a DuckDB oracle
    * fragment: yields three expressions (set, class, group) over `code`. */
  def sqlCase(codeExpr: String): (String, String, String) = {
    val s = s"trim(CAST($codeExpr AS VARCHAR))"
    val n = s"(CASE WHEN regexp_matches($s, '^[0-9]{1,18}$$') THEN CAST($s AS BIGINT) END)"
    def lvl(idx: Int): String = {
      def p(set: String, cls: String, grp: String) =
        Seq(set, cls, grp)(idx).replace("'", "''")
      def w(cond: String, set: String, cls: String, grp: String) =
        s"WHEN $cond THEN '${p(set, cls, grp)}'"
      def in(lo: Int, hi: Int) = s"$n BETWEEN $lo AND $hi"
      Seq(
        s"CASE WHEN $codeExpr IS NULL THEN '${p("Unknown", "Unknown", "Unknown")}'",
        w(s"$s LIKE 'G%'", "HCPCS", "Medicare Specific", "G-Codes"),
        w(s"$s LIKE 'IME%'", "HCPCS", "Facility Specific", "IME Codes"),
        w(s"$n IS NULL", "Unknown", "Unknown", "Unknown"),
        // Radiology
        w(in(70000, 70559), "Radiology", "Head and Neck Imaging", "Skull and Brain"),
        w(in(70560, 70999), "Radiology", "Head and Neck Imaging", "Spine and Neck"),
        w(in(71000, 71999), "Radiology", "Chest Imaging", "Thoracic Studies"),
        w(in(72000, 72159), "Radiology", "Spine Imaging", "Spinal Radiography"),
        w(in(72160, 72999), "Radiology", "Spine Imaging", "Spinal CT/MRI"),
        w(in(73000, 73225), "Radiology", "Extremity Imaging", "Upper Extremity"),
        w(in(73226, 73999), "Radiology", "Extremity Imaging", "Lower Extremity"),
        w(in(74000, 74999), "Radiology", "Abdomen/GI Imaging", "Abdominal Studies"),
        w(in(75000, 75999), "Radiology", "Vascular Imaging", "Angiography"),
        w(in(76000, 76499), "Radiology", "Other Imaging", "Fluoroscopy"),
        w(in(76500, 76999), "Radiology", "Other Imaging", "Ultrasound"),
        w(in(77000, 77099), "Radiology", "Radiation Oncology", "Treatment Planning"),
        w(in(77100, 77999), "Radiology", "Radiation Oncology", "Treatment Delivery"),
        w(in(78000, 78999), "Radiology", "Nuclear Medicine", "Nuclear Studies"),
        w(in(79000, 79999), "Radiology", "Radiopharmaceutical", "Therapeutic Nuclear"),
        // Surgery
        w(in(10000, 17999), "Surgery", "Integumentary System", "Skin Procedures"),
        w(in(18000, 19999), "Surgery", "Integumentary System", "Breast Procedures"),
        w(in(20000, 25999), "Surgery", "Musculoskeletal System", "General Orthopedic"),
        w(in(26000, 29999), "Surgery", "Musculoskeletal System", "Hand/Wrist Surgery"),
        w(in(30000, 32999), "Surgery", "Respiratory System", "Pulmonary Procedures"),
        w(in(33000, 37999), "Surgery", "Cardiovascular System", "Cardiac/Vascular Surgery"),
        w(in(38000, 41999), "Surgery", "Hemic/Lymphatic System", "Blood/Lymph Procedures"),
        w(in(42000, 43999), "Surgery", "Digestive System", "Upper GI Surgery"),
        w(in(44000, 49999), "Surgery", "Digestive System", "Lower GI Surgery"),
        w(in(50000, 54999), "Surgery", "Urinary System", "Urological Surgery"),
        w(in(55000, 59999), "Surgery", "Genital System", "Reproductive Surgery"),
        w(in(60000, 64999), "Surgery", "Endocrine/Nervous System", "Specialized Surgery"),
        w(in(65000, 69999), "Surgery", "Eye/Ear System", "Sensory Surgery"),
        // E&M (checked before Medicine, as in the reference)
        w(s"$n = 99091", "Evaluation & Management", "Remote Monitoring", "Digital Health"),
        w(in(99202, 99215), "Evaluation & Management", "Office Visits", "Outpatient E&M"),
        w(in(99221, 99239), "Evaluation & Management", "Hospital Care", "Inpatient E&M"),
        w(in(99242, 99255), "Evaluation & Management", "Consultations", "Consultation E&M"),
        w(in(99281, 99288), "Evaluation & Management", "Emergency Care", "Emergency E&M"),
        w(in(99291, 99292), "Evaluation & Management", "Critical Care", "Intensive Care E&M"),
        w(in(99304, 99318), "Evaluation & Management", "Nursing Facility", "Long-term Care E&M"),
        w(in(99341, 99350), "Evaluation & Management", "Home Visits", "Home Care E&M"),
        w(in(99358, 99499), "Evaluation & Management", "Special Services", "Miscellaneous E&M"),
        w(in(99000, 99999), "Evaluation & Management", "Other E&M", "General E&M"),
        // Pathology & Laboratory
        w(in(80000, 84999), "Pathology & Laboratory", "Chemistry", "Clinical Chemistry"),
        w(in(85000, 85999), "Pathology & Laboratory", "Hematology", "Blood Studies"),
        w(in(86000, 86999), "Pathology & Laboratory", "Immunology", "Immune System Tests"),
        w(in(87000, 87999), "Pathology & Laboratory", "Microbiology", "Infectious Disease"),
        w(in(88000, 88999), "Pathology & Laboratory", "Anatomic Pathology", "Tissue Studies"),
        w(in(89000, 89999), "Pathology & Laboratory", "Other Laboratory", "Miscellaneous Lab"),
        // Medicine
        w(in(90000, 90999), "Medicine", "Immunizations", "Vaccines and Injections"),
        w(in(91000, 91999), "Medicine", "Gastroenterology", "GI Procedures"),
        w(in(92000, 92499), "Medicine", "Ophthalmology", "Eye Procedures"),
        w(in(92500, 92999), "Medicine", "Otolaryngology", "ENT Procedures"),
        w(in(93000, 93999), "Medicine", "Cardiovascular", "Cardiac Procedures"),
        w(in(94000, 94999), "Medicine", "Pulmonary", "Lung Function Tests"),
        w(in(95000, 95999), "Medicine", "Neurology", "Neurological Tests"),
        w(in(96000, 96999), "Medicine", "Psychiatry", "Mental Health Services"),
        w(in(97000, 97999), "Medicine", "Physical Medicine", "Rehabilitation"),
        w(in(98000, 98999), "Medicine", "Other Medicine", "Miscellaneous Medicine"),
        s"ELSE '${p("Other", "Miscellaneous", "Unspecified")}' END"
      ).mkString(" ")
    }
    (lvl(0), lvl(1), lvl(2))
  }
}
