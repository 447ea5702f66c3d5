package graft.queries

import graft.{Env, Q}
import graft.syntax._
import graft.functions.GraftFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Correctness queries for the scalar-function layer (SURVEY.md §2.7).
  * The testdata has no bibliographic strings, so each query first
  * CONSTRUCTS deterministic messy inputs from the TPC-H-ish tables (same
  * construction in the oracle), then applies the function under test.
  * Where the oracle can compute the expected value constructively
  * (f1, f9) it does — an independent ground truth, not a mirrored
  * implementation.
  */
object Functions {

  /** F1 lifespan extraction through the UDF over synthesized
    * "Name, birth-death" strings (4 shapes incl. no-lifespan and
    * unknown-birth, ref `viaf.py:71-96`). */
  def f1Lifespan(env: Env): DataFrame = {
    val birth = (lit(1900) + $"c_custkey" % 100).cast("string")
    val death = (lit(1980) + $"c_custkey" % 40).cast("string")
    val styled = when($"c_custkey" % 4 === 0, concat($"c_name", lit(", "), birth, lit("-")))
      .when($"c_custkey" % 4 === 1, concat($"c_name", lit(", "), birth, lit("-"), death))
      .when($"c_custkey" % 4 === 2, concat($"c_name", lit(", -"), death))
      .otherwise($"c_name")
    val parsed = GraftFunctions.parseLifespan(styled)
    env.customer
      .select($"c_custkey", styled.as("raw"), parsed.as("p"))
      .select($"c_custkey", $"raw",
        $"p._1".as("name"), $"p._2".as("birth"), $"p._3".as("death"))
      .orderBy($"c_custkey")
  }

  /** F3 fuzzy-similarity blocked self-join (J10 shape, ref
    * `oclc/classify.py:1340-1346`, `canonicalize.py:320-321`): part
    * names ≥ 80 similar within a (brand, first-token) block — never an
    * all-pairs cross join. The DataFrame layer does DISTRIBUTION
    * (group sub-blocks, one shuffle); the inner comparison runs in a
    * compiled per-cell kernel — the VectorSearch/m5 split; measured
    * 2.2µs/pair as a joined `levenshtein` expression vs ~0.3µs here.
    *
    * Scale shape: the reference's (author, title-token) key is a FIXED
    * vocabulary, so raw block size grows linearly with rows and pair
    * work quadratically (measured 17× time for 10× rows at sf1 before
    * this fix). Two semantics-preserving bounds restore ~linear work:
    *
    *  - GEOMETRIC LENGTH-BAND SUB-BLOCKING. ratio ≥ 80 (HALF_UP) ⇔
    *    lev ≤ 0.205·maxlen, and lev ≥ |Δlen|, so a qualifying pair has
    *    maxlen/minlen ≤ 1/0.795 < 1.26. Banding by
    *    band = ⌊ln len / ln 1.26⌋ therefore puts every qualifying pair
    *    in the same or adjacent bands; each row is shuffled to buckets
    *    {band, band−1} and a pair is compared exactly once, in the
    *    bucket equal to its SMALLER band (for bands only k and k+1
    *    co-occur in bucket k, so "at least one endpoint is home" is
    *    that rule). The sub-block key cardinality now grows with the
    *    length spread, capping both per-task memory and kernel m².
    *  - EXACT-DUP GROUPING + LENGTH-WINDOW SCAN inside the cell.
    *    Entity-resolution corpora are duplicate-heavy (measured: the
    *    sf1 point has every name 10×, and the TRUE output grows 107×
    *    for 10× rows — the output itself is quadratic, so the floor
    *    for any correct plan is output-linear work). Members group by
    *    name first, the DP runs once per DISTINCT-name pair
    *    (length-sorted scan, breaking at the first j with
    *    (len_j−len_i)·1000 > 210·len_j — monotone, and such pairs fail
    *    the |Δlen| ≤ lev prune, so the break loses nothing), and a
    *    qualifying name pair expands to its key pairs at emit time —
    *    pure output, no per-key-pair DP. Identical-name groups emit
    *    their intra-group pairs at ratio 100 directly.
    *
    * All prunes are sound (integer arithmetic, no float boundary): the
    * emitted pair set is bit-identical to the unbanded all-pairs form,
    * which the unchanged DuckDB oracle verifies.
    */
  def f3BlockedSimilarity(env: Env): DataFrame = f3Banded(env.part)

  /** The banded plan over an explicit parts frame — split out so
    * FunctionsPropertySpec can drive it with adversarial inputs (empty
    * names, extreme length gaps, heavy duplicates) against a local
    * brute-force reference. */
  private[graft] def f3Banded(parts: DataFrame): DataFrame = {
    val spark = parts.sparkSession
    import org.apache.spark.sql.Encoders
    implicit val cellEnc = Encoders.product[(Int, Seq[(String, Seq[Long], Int)])]
    implicit val outEnc = Encoders.product[(Long, Long, String, String, Int)]
    // ln(1/0.795) = 0.2294 < ln 1.26 = 0.2311 → qualifying pairs span ≤ 1 band.
    // Length must be UTF-16 units (octet_length of UTF-16BE / 2) to match
    // the kernel's String.length — Spark's length() counts CODE POINTS,
    // which diverges on supplementary-plane characters and could band a
    // kernel-qualifying pair ≥ 2 bands apart (silently dropping it).
    val len16 = octet_length(encode($"p_name", "UTF-16BE")) / 2
    val band = floor(log(greatest(len16, lit(1)).cast("double"))
                       / lit(math.log(1.26))).cast("int")
    val cells = parts
      .groupBy($"p_brand", $"p_name")
      .agg(sort_array(collect_list($"p_partkey")).as("keys"))
      .select($"p_name", $"keys",
              split($"p_name", " ").getItem(0).as("tok0"), $"p_brand",
              band.as("band"))
      .select($"p_name", $"keys", $"tok0", $"p_brand", $"band",
              explode(array($"band", $"band" - 1)).as("bucket"))
      .groupBy($"p_brand", $"tok0", $"bucket")
      .agg(collect_list(struct($"p_name", $"keys", $"band")).as("members"))
      .select($"bucket", $"members")
      .as[(Int, Seq[(String, Seq[Long], Int)])]
    cells.flatMap { case (bucket, members) =>
      // distinct names within the cell (grouped upstream), length-sorted
      val ms = members.sortBy(m => (m._1.length, m._1)).toArray
      val names = ms.map(_._1)
      val keyArrs = ms.map(_._2.toArray)
      val bands = ms.map(_._3)
      val out = Seq.newBuilder[(Long, Long, String, String, Int)]
      var i = 0
      while (i < names.length) {
        val na = names(i); val la = na.length; val ka = keyArrs(i)
        // identical-name pairs: ratio 100, same band → home bucket only
        if (bands(i) == bucket) {
          var x = 0
          while (x < ka.length) {
            var y = x + 1
            while (y < ka.length) { // keys pre-sorted ascending
              out += ((ka(x), ka(y), na, na, 100)); y += 1
            }
            x += 1
          }
        }
        var j = i + 1
        var inWindow = true
        while (j < names.length && inWindow) {
          val nb = names(j); val lb = nb.length // ≥ la (length-sorted)
          if ((lb - la) * 1000 > 210 * lb) inWindow = false
          else if (bands(i) == bucket || bands(j) == bucket) {
            // distinct names by construction → DP once per name pair
            val lev = graft.functions.Fuzzy.levenshtein(na, nb)
            // replicate levenshteinRatio: round(100·(1−d/max)) HALF_UP
            val ratio = java.math.BigDecimal
              .valueOf(100.0 * (1.0 - lev.toDouble / lb))
              .setScale(0, java.math.RoundingMode.HALF_UP).intValue()
            if (ratio >= 80) {
              val kb = keyArrs(j)
              var x = 0
              while (x < ka.length) {
                var y = 0
                while (y < kb.length) {
                  if (ka(x) < kb(y)) out += ((ka(x), kb(y), na, nb, ratio))
                  else out += ((kb(y), ka(x), nb, na, ratio))
                  y += 1
                }
                x += 1
              }
            }
          }
          j += 1
        }
        i += 1
      }
      out.result()
    }.toDF("key_a", "key_b", "name_a", "name_b", "ratio")
      .orderBy($"key_a", $"key_b")
  }

  /** F7 — title unfluff / anthology flag / title similarity (ref
    * `viaf.py:235-273`, `oclc/classify.py:816-839`): article-prefixed
    * and punctuation-suffixed variants of each part name (including a
    * nested "an the" prefix and an " ; " anthology form), compared
    * against the clean name. ASCII inputs by construction, so the
    * oracle's lower() matches the UDF's NFKD-lowercase. */
  def f7TitleUnfluff(env: Env): DataFrame = {
    val title = when($"p_partkey" % 4 === 0, concat(lit("The "), $"p_name", lit(".")))
      .when($"p_partkey" % 4 === 1, concat(lit("A "), $"p_name"))
      .when($"p_partkey" % 4 === 2, concat(lit("An the "), $"p_name", lit("!!")))
      .otherwise(concat($"p_name", lit(" ; other works")))
    env.part
      .select($"p_partkey", title.as("raw"),
        GraftFunctions.unfluffTitle(title).as("unfluffed"),
        GraftFunctions.isAnthologyTitle(title).as("is_anthology"),
        GraftFunctions.titleSimilarity(title, $"p_name").as("sim"))
      .orderBy($"p_partkey")
  }

  /** F8 permanent work id (ref `scripts.py:396-415`): md5 over the
    * normalized "title|author" key, via the UDF. */
  def f8WorkId(env: Env): DataFrame =
    env.part
      .select($"p_partkey",
        GraftFunctions.permanentWorkId($"p_name", $"p_brand").as("work_id"))
      .orderBy($"p_partkey")

  /** F9 year extraction from messy date strings (ref
    * `oclc/linked_data.py:408-432`): three formats round-robin by key;
    * oracle computes the expected year constructively. */
  def f9YearExtract(env: Env): DataFrame = {
    val messy = when($"o_orderkey" % 3 === 0,
        concat(date_format($"o_orderdate", "yyyy"), lit(",")))
      .when($"o_orderkey" % 3 === 1, date_format($"o_orderdate", "yyyyMMdd"))
      .otherwise(date_format($"o_orderdate", "yyyy-MM-dd"))
    env.orders
      .select($"o_orderkey", messy.as("raw"),
        GraftFunctions.extractYear(messy).as("year"))
      .orderBy($"o_orderkey")
  }

  /** F10 ISBN-10 → ISBN-13 (ref `oclc/linked_data.py:693-702`,
    * `monitor.py:93`): a deterministic 9-digit core per part key →
    * ISBN-10 (check digit may be X) → ISBN-13. The oracle recomputes
    * both check digits with SQL arithmetic.
    */
  def f10Isbn13(env: Env): DataFrame = {
    val core = lpad((($"p_partkey" * 7919) % 1000000000).cast("string"), 9, "0")
    env.part
      .select($"p_partkey",
        GraftFunctions.isbn10FromCore(core).as("isbn10"),
        GraftFunctions.toIsbn13(GraftFunctions.isbn10FromCore(core)).as("isbn13"))
      .orderBy($"p_partkey")
  }

  val entries: Seq[Q] = Seq(
    Q.sql("f1_lifespan", f1Lifespan,
      """SELECT c_custkey,
        |  CASE c_custkey % 4
        |    WHEN 0 THEN c_name || ', ' || (1900 + c_custkey % 100) || '-'
        |    WHEN 1 THEN c_name || ', ' || (1900 + c_custkey % 100) || '-'
        |                       || (1980 + c_custkey % 40)
        |    WHEN 2 THEN c_name || ', -' || (1980 + c_custkey % 40)
        |    ELSE c_name END AS raw,
        |  c_name AS name,
        |  CASE WHEN c_custkey % 4 IN (0, 1)
        |       THEN CAST(1900 + c_custkey % 100 AS VARCHAR) END AS birth,
        |  CASE WHEN c_custkey % 4 IN (1, 2)
        |       THEN CAST(1980 + c_custkey % 40 AS VARCHAR) END AS death
        |FROM customer
        |ORDER BY c_custkey""".stripMargin),

    Q.sql("f3_blocked_similarity", f3BlockedSimilarity,
      """SELECT a.p_partkey AS key_a, b.p_partkey AS key_b,
        |       a.p_name AS name_a, b.p_name AS name_b,
        |       CAST(round(100.0 * (1.0 - levenshtein(a.p_name, b.p_name)
        |         / greatest(length(a.p_name), length(b.p_name)))) AS INT) AS ratio
        |FROM part a JOIN part b
        |  ON a.p_brand = b.p_brand
        | AND string_split(a.p_name, ' ')[1] = string_split(b.p_name, ' ')[1]
        | AND a.p_partkey < b.p_partkey
        |WHERE CAST(round(100.0 * (1.0 - levenshtein(a.p_name, b.p_name)
        |         / greatest(length(a.p_name), length(b.p_name)))) AS INT) >= 80
        |ORDER BY key_a, key_b""".stripMargin),

    Q.sql("f7_title_unfluff", f7TitleUnfluff,
      """WITH t AS (
        |  SELECT p_partkey, p_name,
        |    CASE p_partkey % 4
        |      WHEN 0 THEN 'The ' || p_name || '.'
        |      WHEN 1 THEN 'A ' || p_name
        |      WHEN 2 THEN 'An the ' || p_name || '!!'
        |      ELSE p_name || ' ; other works' END AS raw
        |  FROM part),
        |u AS (
        |  SELECT p_partkey, p_name, raw,
        |    trim(regexp_replace(
        |      regexp_replace(lower(raw), '^((the|a|an) )+', ''),
        |      '[[:punct:]]+$', '')) AS unfluffed
        |  FROM t)
        |SELECT p_partkey, raw, unfluffed,
        |  contains(raw, ' ; ') AS is_anthology,
        |  CAST(round(100.0 * (1.0 -
        |      CAST(levenshtein(unfluffed, p_name) AS DOUBLE)
        |      / greatest(length(unfluffed), length(p_name)))) AS INT) / 100.0
        |    AS sim
        |FROM u
        |ORDER BY p_partkey""".stripMargin),

    Q.sql("f8_work_id", f8WorkId,
      """SELECT p_partkey,
        |  md5(trim(regexp_replace(lower(p_name),  '[^a-z0-9]+', ' ', 'g')) || '|' ||
        |      trim(regexp_replace(lower(p_brand), '[^a-z0-9]+', ' ', 'g'))) AS work_id
        |FROM part
        |ORDER BY p_partkey""".stripMargin),

    Q.sql("f9_year_extract", f9YearExtract,
      """SELECT o_orderkey,
        |  CASE o_orderkey % 3
        |    WHEN 0 THEN strftime(o_orderdate, '%Y') || ','
        |    WHEN 1 THEN strftime(o_orderdate, '%Y%m%d')
        |    ELSE strftime(o_orderdate, '%Y-%m-%d') END AS raw,
        |  strftime(o_orderdate, '%Y') AS year
        |FROM orders
        |ORDER BY o_orderkey""".stripMargin),

    Q.sql("f10_isbn13", f10Isbn13,
      """WITH core AS (
        |  SELECT p_partkey,
        |         lpad(CAST((p_partkey * 7919) % 1000000000 AS VARCHAR), 9, '0') AS s
        |  FROM part),
        |c10 AS (
        |  SELECT p_partkey, s,
        |         (11 - list_sum(list_transform(range(1, 10),
        |            i -> CAST(s[i] AS INT) * (11 - i))) % 11) % 11 AS r
        |  FROM core)
        |SELECT p_partkey,
        |  s || CASE WHEN r = 10 THEN 'X' ELSE CAST(r AS VARCHAR) END AS isbn10,
        |  '978' || s || CAST((10 - list_sum(list_transform(range(1, 13),
        |     i -> CAST(('978' || s)[i] AS INT)
        |          * (CASE WHEN i % 2 = 1 THEN 1 ELSE 3 END))) % 10) % 10 AS VARCHAR)
        |    AS isbn13
        |FROM c10
        |ORDER BY p_partkey""".stripMargin),
  )
}
