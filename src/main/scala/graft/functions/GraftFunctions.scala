package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.udf

/** UDF registration for the scalar-function layer (SURVEY.md §2.7,
  * §2.10). Every UDF wraps a pure function from this package —
  * `asNondeterministic` is never needed, and Catalyst can freely
  * re-order/duplicate the calls.
  *
  * Scale note: these are JVM Scala UDFs — codegen'd call sites with no
  * serialization fence (unlike Python UDFs). Hot-path candidates for a
  * native Expression are the fuzzy ratios (see graft.plans).
  */
object GraftFunctions {

  val parseLifespan = udf((s: String) => {
    val p = Names.parseLifespan(s)
    (p.name, p.birth.orNull, p.death.orNull)
  })
  val wikipediaToDisplay = udf(Names.wikipediaNameToDisplayName _)
  val primaryAuthor      = udf(Names.primaryAuthorName _)
  val displayToSort      = udf(Names.displayNameToSortName _)
  val nameTidy           = udf(Names.nameTidy _)
  val isCorporate        = udf(Names.isCorporateName _)

  val levenshteinRatio   = udf(Fuzzy.ratio _)
  val tokenSortRatio     = udf(Fuzzy.tokenSortRatio _)
  val nameMatchRatio     = udf(Fuzzy.contributorNameMatchRatio _)
  val titleMatchRatio    = udf(Fuzzy.titleMatchRatio _)

  val unfluffTitle       = udf(TextNorm.unfluffTitle _)
  val isAnthologyTitle   = udf(TextNorm.isAnthologyTitle _)
  val titleSimilarity    = udf(TextNorm.titleSimilarity _)

  val nfkdLower          = udf(TextNorm.nfkdLower _)
  val normalizeMatch     = udf(TextNorm.normalizeForMatching _)
  val permanentWorkId    = udf(TextNorm.permanentWorkId _)
  val extractYear        = udf(TextNorm.extractYear _)

  val toIsbn13           = udf(Isbn.toIsbn13 _)
  val isbn10FromCore     = udf(Isbn.isbn10FromCore _)
  val isValidIsbn13      = udf(Isbn.isValidIsbn13 _)

  val parseContributors = udf((s: String) =>
    Roles.parseMultiple(s).map(c =>
      (c.name, c.birth.orNull, c.death.orNull, c.roles)))

  /** Register everything for SQL use (`SELECT graft_work_id(...)`). */
  def register(spark: SparkSession): Unit = {
    spark.udf.register("graft_parse_lifespan", parseLifespan)
    spark.udf.register("graft_wikipedia_to_display", wikipediaToDisplay)
    spark.udf.register("graft_primary_author", primaryAuthor)
    spark.udf.register("graft_display_to_sort", displayToSort)
    spark.udf.register("graft_name_tidy", nameTidy)
    spark.udf.register("graft_is_corporate", isCorporate)
    spark.udf.register("graft_lev_ratio", levenshteinRatio)
    spark.udf.register("graft_token_sort_ratio", tokenSortRatio)
    spark.udf.register("graft_name_match_ratio", nameMatchRatio)
    spark.udf.register("graft_title_match_ratio", titleMatchRatio)
    spark.udf.register("graft_nfkd_lower", nfkdLower)
    spark.udf.register("graft_normalize_match", normalizeMatch)
    spark.udf.register("graft_work_id", permanentWorkId)
    spark.udf.register("graft_extract_year", extractYear)
    spark.udf.register("graft_to_isbn13", toIsbn13)
    spark.udf.register("graft_parse_contributors", parseContributors)
  }
}
