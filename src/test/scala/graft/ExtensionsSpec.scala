package graft

/** The native expressions are SQL-callable after registration (via
  * GraftExtensions for new sessions, installInto for live ones). */
class ExtensionsSpec extends SparkSpecBase {

  test("native expressions are callable from SQL") {
    GraftExtensions.installInto(spark)
    val dot = spark.sql("SELECT dot_product(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d")
      .collect()(0).getDouble(0)
    assert(dot == 11.0)
    val jac = spark.sql("SELECT jaccard_sim(array('a','b','c'), array('b','c','d')) AS j")
      .collect()(0).getDouble(0)
    assert(math.abs(jac - 0.5) < 1e-12)
    val nsh = spark.sql("SELECT size(char_shingles('abcdef', 5)) AS n")
      .collect()(0).getInt(0)
    assert(nsh == 2) // 'abcde', 'bcdef'
    val sig = spark.sql("SELECT size(minhash_sig(char_shingles('hello world!', 5))) AS n")
      .collect()(0).getInt(0)
    assert(sig == 64)
    val sh = spark.sql("SELECT simhash64(array('a','b')) AS h").collect()(0).getLong(0)
    val sh2 = spark.sql("SELECT simhash64(array('b','a')) AS h").collect()(0).getLong(0)
    assert(sh == sh2, "simhash is order-independent")
    val rep = spark.sql(
      "SELECT repetition_stats(array('a','b','a','b')).top_2gram_count AS c")
      .collect()(0).getLong(0)
    assert(rep == 2, "'a b' occurs twice")
    val csh = spark.sql("SELECT size(char_shingle_hashes('abcdef', 5)) AS n")
      .collect()(0).getInt(0)
    assert(csh == 2) // hashes of 'abcde', 'bcdef'
    val mst = spark.sql("SELECT size(minhash_sig_text('hello world!', 5, 32)) AS n")
      .collect()(0).getInt(0)
    assert(mst == 32)
    val lmf = spark.sql(
      "SELECT long_match_frac(array(1L,2L,3L,4L), array(1L,9L,3L,9L)) AS f")
      .collect()(0).getDouble(0)
    assert(math.abs(lmf - 0.5) < 1e-12)
    val hb = spark.sql(
      "SELECT hyperplane_bucket(array(0.1D, -0.5D, 2.0D), 8) AS b")
      .collect()(0).getLong(0)
    assert(hb >= 0 && hb < 256)
    val bl = spark.sql("SELECT bounded_levenshtein('kitten', 'sitting', 2) AS d")
      .collect()(0).getLong(0)
    assert(bl == 3L, "distance 3 exceeds cap 2 -> reported as max+1")
    val bl2 = spark.sql("SELECT bounded_levenshtein('kitten', 'sitten', 2) AS d")
      .collect()(0).getLong(0)
    assert(bl2 == 1L)
    val tk = spark.sql(
      """SELECT topk_by(s, i, 2) AS tk FROM VALUES
         (1.0D, 10L), (5.0D, 20L), (3.0D, 30L) AS t(s, i)""")
      .collect()(0).getSeq[org.apache.spark.sql.Row](0)
    assert(tk.map(r => r.getLong(0)) == Seq(20L, 30L), "top-2 ids by score desc")
    val dr = spark.sql(
      "SELECT deflate_ratio(repeat('lorem ipsum ', 100)) AS r")
      .collect()(0).getDouble(0)
    assert(dr > 0.0 && dr < 0.2, s"repeated text must compress hard: $dr")
    val smc = spark.sql("SELECT splitmix_comp(42L) AS c").collect()(0).getLong(0)
    val h42 = graft.functions.HyperplaneBucket.mix64(42L)
    assert(smc == ((h42 % 2000003L) + 2000003L) % 2000003L - 1000001L)
  }
}
