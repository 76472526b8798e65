package graft

import org.apache.spark.sql.functions._

/** Semantic properties of the dataset-assembly family that the DuckDB
  * oracle's value-hash cannot express: the mixture actually honors its
  * token recipe, upsampling emits the promised fractional epochs, the
  * split never separates duplicate content, and the shuffle index is a
  * true permutation. All expectations derive from the fixture itself, so
  * the tests hold at any scale factor.
  */
class AssemblySpec extends SparkSpec {

  private def run(name: String) = SparkEntry.queries(name)(spark, sfDir)

  test("doc_mix_tokens keeps token mass proportional to the recipe weights") {
    val weights = Map("en" -> 4L, "de" -> 3L, "fr" -> 2L, "es" -> 2L, "zh" -> 1L)
    val kept = run("doc_mix_tokens")
      .groupBy("lang").agg(sum("n_tok").as("kept")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val totals = Tables.table(spark, sfDir, "documents")
      .select(col("lang"), size(split(col("text"), " ")).cast("long").as("n"))
      .groupBy("lang").agg(sum("n").as("t")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val spread = Tables.table(spark, sfDir, "documents")
      .select(col("lang"), size(split(col("text"), " ")).cast("long").as("n"))
      .groupBy("lang").agg(sum(col("n") * col("n")).as("s2"), max("n").as("mx"))
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val tUnits = weights.keys.map(l => totals(l) / weights(l)).min
    for ((lang, wt) <- weights) {
      val expected = (tUnits * wt).toDouble
      val got = kept.getOrElse(lang, 0L).toDouble
      // whole docs keep or drop together, so the kept-token count is a
      // sum of per-doc Bernoullis weighted by n_tok: σ² = p(1−p)·Σn_tok².
      // A 5σ band plus a 3-max-doc quantization floor is the honest
      // tolerance at ANY scale factor: the md5 buckets are one FIXED draw
      // per fixture, so near p≈1 a single tail-bucket doc can realize a
      // many-σ deviation of at most a few doc sizes (observed: de drops
      // one 90-token doc at sf0.001 where 5σ is 59 tokens).
      val p = math.min(1.0, expected / totals(lang).toDouble)
      val (s2, mx) = spread(lang)
      val sigma = math.sqrt(p * (1 - p) * s2.toDouble)
      assert(math.abs(got - expected) <= 5 * sigma + 3 * mx,
        s"$lang kept $got expected ~$expected (5σ=${5 * sigma}, max=$mx)")
      // never overshoot the domain's own supply
      assert(got <= totals(lang).toDouble)
    }
    // the bottleneck domain (smallest t/wt) is kept near-entirely
    val bottleneck = weights.keys.minBy(l => totals(l) / weights(l))
    assert(kept(bottleneck).toDouble >= 0.6 * totals(bottleneck))
  }

  test("doc_mix_tokens_exact keeps a maximal within-budget hash-order prefix") {
    val weights = Map("en" -> 4L, "de" -> 3L, "fr" -> 2L, "es" -> 2L, "zh" -> 1L)
    val docs = Tables.table(spark, sfDir, "documents")
      .select(col("doc_id"), col("lang"),
        size(split(col("text"), " ")).cast("long").as("n_tok"),
        pmod(conv(substring(md5(col("doc_id").cast("string")), 1, 8), 16, 10)
          .cast("long"), lit(1000000L)).as("b"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val totals = docs.groupBy(_._2).map { case (l, ds) => l -> ds.map(_._3).sum }
    val tUnits = weights.keys.map(l => totals(l) / weights(l)).min
    val kept = run("doc_mix_tokens_exact").collect()
      .map(r => r.getLong(0)).toSet
    for ((lang, wt) <- weights) {
      val budget = tUnits * wt
      val ordered = docs.filter(_._2 == lang).sortBy(d => (d._4, d._1))
      // the kept set IS the greedy prefix: within budget, and maximal
      // (the first excluded doc would overflow it)
      var cum = 0L
      var stopped = false
      for (d <- ordered) {
        if (!stopped && cum + d._3 <= budget) {
          cum += d._3
          assert(kept.contains(d._1), s"$lang: prefix doc ${d._1} missing")
        } else {
          stopped = true // monotone cumsum: once over, everything after is out
          assert(!kept.contains(d._1), s"$lang: doc ${d._1} beyond the budget kept")
        }
      }
      assert(cum <= budget)
    }
  }

  test("doc_upsample emits floor(w) or floor(w)+1 contiguous epochs per doc") {
    val weights = Map("en" -> 1000000L, "de" -> 2000000L, "fr" -> 2500000L,
      "es" -> 3250000L, "zh" -> 4000000L)
    val perDoc = run("doc_upsample")
      .groupBy("doc_id", "lang")
      .agg(count(lit(1)).as("n"), max("epoch").as("mx"), min("epoch").as("mn"))
      .collect()
    assert(perDoc.nonEmpty)
    for (r <- perDoc) {
      val (lang, n, mx, mn) =
        (r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4))
      val w = weights(lang)
      assert(n == w / 1000000 || n == w / 1000000 + 1, s"$lang copies=$n")
      assert(mn == 0L && mx == n - 1, s"epochs not contiguous: $r")
    }
    // fractional part realized in aggregate: mean copies ≈ w/1e6 per lang
    val byLang = perDoc.groupBy(_.getString(1)).map { case (l, rs) =>
      l -> rs.map(_.getLong(2)).sum.toDouble / rs.length
    }
    for ((lang, mean) <- byLang) {
      val w = weights(lang) / 1e6
      assert(math.abs(mean - w) <= 0.25 * w + 0.1, s"$lang mean=$mean want~$w")
    }
  }

  test("doc_split never separates exact-duplicate content") {
    val docs = Tables.table(spark, sfDir, "documents")
      .select(col("doc_id"),
        md5(trim(regexp_replace(lower(col("text")), "[^a-z0-9]+", " ")))
          .as("fp"))
    val joined = run("doc_split").join(docs, "doc_id")
    val splitPerFp = joined.groupBy("fp")
      .agg(countDistinct("split").as("k")).agg(max("k")).head().getLong(0)
    assert(splitPerFp == 1L, "a fingerprint spans more than one split")
    val shares = joined.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // 96/2/2 recipe: train strictly dominates
    assert(shares.getOrElse("train", 0L) > shares.getOrElse("valid", 0L))
    assert(shares.getOrElse("train", 0L) > shares.getOrElse("test", 0L))
  }

  test("doc_shuffle_index assigns a contiguous permutation 0..n-1") {
    val df = run("doc_shuffle_index")
    val n = df.count()
    val stats = df.agg(min("pos"), max("pos"), countDistinct("pos")).head()
    assert(stats.getLong(0) == 0L)
    assert(stats.getLong(1) == n - 1)
    assert(stats.getLong(2) == n)
  }

  test("doc_shard_plan bounds every file_id by its source's file count") {
    val bad = run("doc_shard_plan")
      .filter(col("file_id") < 0 || col("file_id") >= col("n_files") ||
        col("n_files") < 1)
      .count()
    assert(bad == 0L)
  }
}
