package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.Curation

class CurationSpec extends AnyFunSuite {
  import TestSpark._

  private lazy val docs = Fixtures.readParquet(spark, sfDir, "documents")

  test("chunking covers every doc with the right chunk count and overlap") {
    val size = 120
    val stride = 100
    val perDoc = Curation.chunk(docs, size, stride)
      .groupBy("doc_id").agg(count(lit(1)).as("nc"), sum("n").as("chars"))
      .join(docs.select(col("doc_id"), length(col("text")).cast("long").as("len")), "doc_id")
      .collect()
    assert(perDoc.nonEmpty)
    perDoc.foreach { r =>
      val (nc, chars, len) =
        (r.getAs[Long]("nc"), r.getAs[Long]("chars"), r.getAs[Long]("len"))
      val expected = (math.max(len - size, 0) + stride - 1) / stride + 1
      assert(nc == expected, s"doc ${r.getAs[Long]("doc_id")}: $nc chunks, want $expected")
      // total chunk chars = len + overlap re-reads: (nc-1) windows overlap
      // by (size-stride) except a short final chunk absorbs the remainder
      assert(chars >= len, "chunks must cover the whole doc")
      assert(chars <= len + (nc - 1) * (size - stride))
    }
  }

  test("decontaminate flags a planted copy of a benchmark doc and only true overlaps") {
    // plant: doc 90031 is a verbatim copy of benchmark doc 31 (31 % 31 == 0)
    val benchText = docs.where(col("doc_id") === 31).select("text")
      .collect()(0).getString(0)
    val planted = docs.select(col("doc_id"), col("text"))
      .unionByName(spark.range(1).select(
        lit(90031L).as("doc_id"), lit(benchText).as("text")))
    val flagged = Curation.decontaminate(planted, n = 5, benchMod = 31)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n_shared")).toMap
    assert(flagged.contains(90031L), "verbatim benchmark copy must be flagged")
    val benchGrams = math.max(benchText.trim.split("\\s+").length - 4, 0)
    assert(flagged(90031L) <= benchGrams)
    assert(flagged(90031L) >= benchGrams / 2,
      s"copy shares ${flagged(90031L)} of $benchGrams grams")
    // benchmark docs themselves are never reported
    assert(flagged.keys.forall(_ % 31 != 0))
  }

  test("bloom-prefiltered decontaminate is EXACTLY equal to the exact path " +
       "and prefilters on a scan-side might_contain predicate") {
    val exact = Curation.decontaminate(docs, n = 5, benchMod = 31).collect().toSeq
    val bloom = Curation.decontaminateBloom(docs, n = 5, benchMod = 31)
    assert(bloom.collect().toSeq == exact,
      "bloom false positives must be removed by the verify join")
    // the prefilter sits in the plan as a BloomFilterMightContain predicate
    // (codegen'd scan-side filter, not a join)
    val hasMightContain = bloom.queryExecution.optimizedPlan.collect {
      case f: org.apache.spark.sql.catalyst.plans.logical.Filter
        if f.condition.exists(
          _.isInstanceOf[org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain]) => f
    }.nonEmpty
    assert(hasMightContain, "expected a BloomFilterMightContain prefilter in the plan")
  }

  test("token-budget shards are contiguous and within one doc of the budget") {
    val budget = 2000L
    val shards = Curation.shardByTokenBudget(docs, budget).collect()
    assert(shards.length > 1)
    val maxDocToks = docs
      .select(size(graft.pipeline.TextOps.tokens(col("text"))).cast("long").as("nt"))
      .agg(max("nt")).collect()(0).getLong(0)
    // doc ranges partition the id space contiguously in shard order
    shards.sliding(2).foreach { case Array(a, b) =>
      assert(a.getAs[Long]("last_doc") + 1 == b.getAs[Long]("first_doc"))
    }
    // every shard except the last holds ≥ budget - maxDocToks and crosses
    // its boundary by < maxDocToks
    shards.init.foreach { r =>
      val t = r.getAs[Long]("toks")
      assert(t >= budget - maxDocToks && t <= budget + maxDocToks,
        s"shard ${r.getAs[Long]("shard")}: $t tokens vs budget $budget (maxDoc $maxDocToks)")
    }
    // two-level prefix sum == the naive global-window definition
    val naive = {
      import org.apache.spark.sql.expressions.Window
      val w = Window.orderBy("doc_id").rowsBetween(Window.unboundedPreceding, -1)
      docs.select(col("doc_id"),
          size(graft.pipeline.TextOps.tokens(col("text"))).cast("long").as("nt"))
        .withColumn("bef", coalesce(sum("nt").over(w), lit(0L)))
        .select(col("doc_id"), expr(s"bef div $budget").as("shard"), col("nt"))
        .groupBy("shard").agg(count(lit(1)).as("n_docs"), sum("nt").as("toks"))
        .orderBy("shard").collect()
        .map(r => (r.getAs[Long]("shard"), r.getAs[Long]("n_docs"), r.getAs[Long]("toks")))
    }
    val got = shards.map(r =>
      (r.getAs[Long]("shard"), r.getAs[Long]("n_docs"), r.getAs[Long]("toks")))
    assert(got.toSeq == naive.toSeq)
  }

  test("unigram surprisal: duplicates identical, rare-token docs score higher per token") {
    val s = Curation.unigramSurprisal(docs)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("surprisal")).toMap
    assert(s.size == docs.count())
    // planted exact duplicates (dedup_exact finds copies>1) score identically
    val dupPair = graft.pipeline.Dedup.exact(docs).where(col("copies") > 1)
      .collect().headOption.map(_.getAs[Long]("doc_id"))
    dupPair.foreach { keep =>
      val dupIds = docs.as("a").join(docs.as("b"),
          col("a.text") === col("b.text") && col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id"), col("b.doc_id")).collect()
        .flatMap(r => Seq(r.getLong(0), r.getLong(1))).distinct
      if (dupIds.length >= 2)
        assert(s(dupIds(0)) == s(dupIds(1)), "identical texts must score identically")
    }
    // every surprisal is positive (ln(T/c) > 0 whenever c < T)
    assert(s.values.forall(_ > 0))
  }

  test("unigram surprisal carries no forced vocab broadcast (web-scale vocab)") {
    // a web corpus has billions of unique tokens: a mandatory broadcast of
    // the vocab count table is a driver OOM — the plan must leave the join
    // strategy to AQE (no ResolvedHint anywhere in this pipeline)
    val s = Curation.unigramSurprisal(docs)
    val hints = s.queryExecution.analyzed.collect {
      case h: org.apache.spark.sql.catalyst.plans.logical.ResolvedHint => h
    }
    assert(hints.isEmpty, s"vocab join must not be hint-forced:\n${hints.mkString("\n")}")
  }

  test("verdict: flag sets attach via plain joins — no forced broadcast on " +
       "corpus-proportional sets") {
    val v = Curation.verdict(docs)
    // the only broadcast hint allowed in the whole composition is
    // decontaminate's benchmark n-gram set (small by design); the four flag
    // sets are corpus-proportional in the worst case and must not carry one
    val hints = v.queryExecution.analyzed.collect {
      case h: org.apache.spark.sql.catalyst.plans.logical.ResolvedHint => h
    }
    assert(hints.size <= 1,
      s"flag joins must not be hint-forced (${hints.size} broadcast hints)")
    val rows = v.collect()
    assert(rows.nonEmpty)
    // composition semantics unchanged: keep == empty reasons; short docs
    // carry the short flag
    rows.foreach(r =>
      assert(r.getAs[Boolean]("keep") == r.getAs[String]("reasons").isEmpty))
    val byId = rows.map(r =>
      r.getAs[Long]("doc_id") -> r.getAs[String]("reasons")).toMap
    docs.where(col("n_chars") < 50).select("doc_id").collect()
      .map(_.getLong(0)).foreach { id =>
        assert(byId(id).contains("short"), s"doc $id should be flagged short")
      }
  }
}
