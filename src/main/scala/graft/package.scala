package object graft {
  /** A declared query: (session, scale-factor dir) => result DataFrame.
    * Every query must produce a deterministic, totally-ordered result so the
    * driver's DuckDB hash-compare is stable (SURVEY.md §2 footer).
    */
  type Q = (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame
}
