package graft.operators

import org.apache.spark.sql.DataFrame

/** The schema-evolution CONTRACT error of the persisted index families
  * (round-16 verdict task 6): an append whose input batch lacks a
  * required column fails with THIS exception — named, listing exactly
  * what is missing and what arrived — instead of whatever
  * AnalysisException the first downstream projection happens to raise
  * (or, worse for the vector tree, whatever schema drift a raw parquet
  * Append would commit).
  *
  * The contract, uniform across [[Dedup.appendToDedupIndex]],
  * [[Search.appendToSearchIndex]], [[Similarity.appendToIvfIndex]] and
  * [[Similarity.appendToPqIndex]]:
  *
  *   - ADDED columns are legal and IGNORED: every append projects the
  *     family's canonical columns before writing, so a batch that grew a
  *     payload column appends cleanly and the persisted index schema
  *     never drifts (no mergeSchema reads, no per-file schema variance
  *     in the cell tree).
  *   - MISSING required columns (present-but-renamed included) throw
  *     [[IndexSchemaException]] BEFORE any table or ledger is touched —
  *     the index is left exactly as it was, so the recovery is "fix the
  *     batch and re-append", never "heal a half-written generation".
  *     Required columns cannot be defaulted: a null/absent `text` or
  *     `embedding` has no meaningful fingerprint/posting/cell.
  */
final class IndexSchemaException(val family: String, val missing: Seq[String],
                                 val actual: Seq[String])
  extends IllegalArgumentException(
    s"$family index append: input batch is missing required column(s) " +
      s"[${missing.mkString(", ")}] (batch columns: [${actual.mkString(", ")}]). " +
      "Added columns are ignored by projection; missing ones cannot be " +
      "defaulted — rename or backfill them before appending.")

private[operators] object IndexSchema {

  /** Validate that `df` carries every `required` column (Spark's
    * case-insensitive resolution), throwing the named contract error
    * otherwise. Validation only — the append verbs keep their own
    * canonical projections, which is what makes ADDED columns safe. */
  def requireColumns(df: DataFrame, family: String, required: Seq[String]): Unit = {
    val have = df.columns.map(_.toLowerCase(java.util.Locale.ROOT)).toSet
    val missing = required.filterNot(c => have(c.toLowerCase(java.util.Locale.ROOT)))
    if (missing.nonEmpty)
      throw new IndexSchemaException(family, missing, df.columns.toSeq)
  }
}
