package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.{TextFns, VecFns}

/** The native Catalyst expressions must be VALUE-IDENTICAL to the
  * declarative built-in forms (the DuckDB oracles restate the
  * declarative forms, so any divergence breaks the correctness gate).
  */
class NativeExprParitySpec extends SparkSpec {

  test("native minhash == declarative minhash") {
    import spark.implicits._
    val sh = TextFns.shingles(TextFns.tokens($"text"), 3)
    val df = Tables.load(spark, sf0001, "documents")
      .select($"doc_id",
        TextFns.minhashSignature(sh, 16).as("native"),
        TextFns.minhashSignatureDeclarative(sh, 16).as("decl"))
    assert(df.filter(not($"native" <=> $"decl")).count() == 0)
  }

  test("native simhash == declarative simhash") {
    import spark.implicits._
    val w = TextFns.tokens($"text")
    val df = Tables.load(spark, sf0001, "documents")
      .select(TextFns.simhashBits(w, 32).as("native"),
        TextFns.simhashBitsDeclarative(w, 32).as("decl"))
    assert(df.filter(not($"native" <=> $"decl")).count() == 0)
  }

  test("native word_shingles == declarative tokens+shingles") {
    import spark.implicits._
    import graft.expressions.NativeFns
    val df = Tables.load(spark, sf0001, "documents")
      .select(NativeFns.word_shingles($"text", 3).as("native"),
        TextFns.shingles(TextFns.tokens($"text"), 3).as("decl"))
    assert(df.filter(not($"native" <=> $"decl")).count() == 0)
    // edge shapes: empty, short, separator-heavy
    val edge = Seq("", "one", "one two", "  --a__b   c-d  ", "ALL CAPS 42")
      .toDF("text")
      .select(NativeFns.word_shingles($"text", 3).as("native"),
        TextFns.shingles(TextFns.tokens($"text"), 3).as("decl"))
    assert(edge.filter(not($"native" <=> $"decl")).count() == 0)
  }

  test("native word_stats == explode+aggregate token statistics") {
    import spark.implicits._
    import graft.expressions.NativeFns
    val stop = Seq("the", "a", "and", "of", "to", "is")
    val docs = Tables.load(spark, sf0001, "documents")
      .select($"doc_id", $"text")
      .unionByName(Seq((-1L, ""), (-2L, null.asInstanceOf[String]),
        (-3L, "the THE the"), (-4L, "  --x__y   42  ")).toDF("doc_id", "text"))
    val agg = docs
      .select($"doc_id", explode(TextFns.tokens($"text")).as("w"))
      .groupBy($"doc_id", $"w").agg(count(lit(1)).as("c"))
      .groupBy($"doc_id")
      .agg(sum($"c").as("n_tok"), max($"c").as("max_c"),
        sum($"c" * length($"w")).as("len_sum"),
        sum(when($"w".isin(stop: _*), $"c").otherwise(0L)).as("stop_hits"))
    val native = docs
      .withColumn("_st", NativeFns.word_stats($"text", stop))
      .filter($"_st".isNotNull) // zero-token docs: no group in the agg form
      .select($"doc_id", $"_st.n_tok", $"_st.max_c", $"_st.len_sum", $"_st.stop_hits")
    val diff = native.join(agg, Seq("doc_id"), "full_outer")
      .filter(not(native("n_tok") <=> agg("n_tok")) ||
        not(native("max_c") <=> agg("max_c")) ||
        not(native("len_sum") <=> agg("len_sum")) ||
        not(native("stop_hits") <=> agg("stop_hits")))
    assert(diff.count() == 0, "word_stats must match the aggregate form per doc")
    assert(native.filter($"doc_id" === -3L).select($"max_c").as[Long].head() == 3L)

    // the fused verdict must equal the four-condition filter over the
    // struct form (null/zero-token text drops on both sides)
    val byStruct = docs
      .withColumn("_st", NativeFns.word_stats($"text", stop))
      .filter($"_st".isNotNull && $"_st.n_tok" >= 10 &&
        $"_st.len_sum".cast("double") / $"_st.n_tok" >= 2.0 &&
        $"_st.len_sum".cast("double") / $"_st.n_tok" <= 8.0 &&
        $"_st.max_c".cast("double") / $"_st.n_tok" <= 0.3 &&
        $"_st.stop_hits" >= 1)
      .select($"doc_id")
    val byKeep = docs
      .filter(NativeFns.gopher_keep($"text", stop, 10L, 2.0, 8.0, 0.3, 1L))
      .select($"doc_id")
    assert(byStruct.exceptAll(byKeep).isEmpty && byKeep.exceptAll(byStruct).isEmpty,
      "gopher_keep verdict must equal the struct-filter form")
    assert(byKeep.count() > 0)
  }

  test("native winnow_fp == declarative sorted-md5-grams chain") {
    import spark.implicits._
    import graft.expressions.NativeFns
    def decl(norm: org.apache.spark.sql.Column) = {
      val grams = transform(
        sequence(lit(1), greatest(length(norm) - 7, lit(1))),
        i => md5(norm.substr(i, lit(8))))
      array_join(slice(array_sort(grams), 1, 3), ",")
    }
    val df = Tables.load(spark, sf0001, "documents")
      .select(NativeFns.winnow_fp(TextFns.normalizeText($"text"), 3, 8).as("native"),
        decl(TextFns.normalizeText($"text")).as("decl"))
    assert(df.filter(not($"native" <=> $"decl")).count() == 0)
    // edge shapes the window arithmetic must match exactly: empty
    // (md5("") once), shorter than one gram, exactly one gram, one
    // char over, fewer than k grams, duplicate-gram text, multibyte
    // (char-based substr fallback)
    // the last two are supplementary-plane (non-BMP): surrogate pairs
    // make UTF-16 length != codepoint count, so they pin the
    // codepoint-offset walk in the multibyte fallback against substr
    val edge = Seq("", "abc", "abcdefgh", "abcdefghi", "abcdefghij",
      "aaaaaaaaaaaaaaaa", "héllo wörld çharacters beyond ascii",
      "emoji 😀 mid🚀string tail 🍕",
      "😀🚀🍕🐍🌍 pure plane two")
      .toDF("t")
      .select(NativeFns.winnow_fp($"t", 3, 8).as("native"), decl($"t").as("decl"))
    assert(edge.filter(not($"native" <=> $"decl")).count() == 0)
  }

  test("native word_chunks (text + hashed) == declarative chunk chain") {
    import spark.implicits._
    import graft.expressions.NativeFns
    def declText(text: org.apache.spark.sql.Column) = {
      val words = TextFns.tokens(text)
      val nChunks = ceil(size(words) / lit(8.0)).cast("int")
      when(nChunks > 0,
        transform(sequence(lit(0), nChunks - 1),
          i => array_join(slice(words, i * 8 + 1, lit(8)), " ")))
        .otherwise(array().cast("array<string>"))
    }
    def declHash(text: org.apache.spark.sql.Column) =
      transform(declText(text), c => md5(c))
    val df = Tables.load(spark, sf0001, "documents")
      .select(NativeFns.word_chunks($"text", 8).as("nt"),
        declText($"text").as("dt"),
        NativeFns.word_chunks($"text", 8, hashed = true).as("nh"),
        declHash($"text").as("dh"))
    assert(df.filter(not($"nt" <=> $"dt") || not($"nh" <=> $"dh")).count() == 0)
    // edges: empty -> EMPTY array (no phantom chunk), sub-chunk, exact
    // chunk, one over, separators, caps
    val edge = Seq("", "   --  ", "one two", "a b c d e f g h",
      "a b c d e f g h i", "Mixed CASE and-42 seps")
      .toDF("text")
      .select(NativeFns.word_chunks($"text", 8).as("nt"),
        declText($"text").as("dt"),
        NativeFns.word_chunks($"text", 8, hashed = true).as("nh"),
        declHash($"text").as("dh"))
    assert(edge.filter(not($"nt" <=> $"dt") || not($"nh" <=> $"dh")).count() == 0)
  }

  test("native jaccard == declarative jaccard") {
    import spark.implicits._
    val sh = TextFns.shingles(TextFns.tokens($"text"), 3)
    val docs = Tables.load(spark, sf0001, "documents").select($"doc_id", sh.as("sh"))
    val a = docs.toDF("ida", "sha").filter($"ida" % 7 === 0)
    val b = docs.toDF("idb", "shb").filter($"idb" % 11 === 0)
    val pairs = a.crossJoin(b)
      .select(TextFns.jaccardSim($"sha", $"shb").as("native"),
        TextFns.jaccardSimDeclarative($"sha", $"shb").as("decl"))
    assert(pairs.filter(not($"native" <=> $"decl")).count() == 0)
  }

  test("sorted-merge jaccard == hash-set jaccard on sorted-distinct inputs") {
    import spark.implicits._
    import graft.expressions.NativeFns
    val sh = array_sort(array_distinct(NativeFns.word_shingles($"text", 3)))
    val docs = Tables.load(spark, sf0001, "documents").select($"doc_id", sh.as("sh"))
    val a = docs.toDF("ida", "sha").filter($"ida" % 7 === 0)
    val b = docs.toDF("idb", "shb").filter($"idb" % 11 === 0)
    val pairs = a.crossJoin(b)
      .select(NativeFns.jaccard_sim_sorted($"sha", $"shb").as("merged"),
        NativeFns.jaccard_sim($"sha", $"shb").as("hashed"))
    assert(pairs.count() > 0)
    assert(pairs.filter(not($"merged" <=> $"hashed")).count() == 0)
    // empty-vs-empty is null (0/0), empty-vs-nonempty is 0.0, null in = null out
    val edge = Seq((Some(Seq[String]()), Some(Seq[String]())),
      (Some(Seq[String]()), Some(Seq("a b c"))),
      (None, Some(Seq("a b c")))).toDF("x", "y")
      .select(NativeFns.jaccard_sim_sorted($"x", $"y").as("merged"),
        NativeFns.jaccard_sim($"x", $"y").as("hashed"))
    assert(edge.filter(not($"merged" <=> $"hashed")).count() == 0)
  }

  test("native range_bucket == chained-when fold, including boundary hits") {
    import spark.implicits._
    import graft.expressions.NativeFns
    val bounds = Array(-3.5, 0.0, 1.0, 2.25, 7.0, 100.5)
    def foldForm(ord: org.apache.spark.sql.Column) =
      bounds.foldLeft(lit(0)) { (acc, b) =>
        acc + when(ord >= lit(b), 1).otherwise(0) }
    // exact boundary values, between-values, extremes, null
    val probes = (bounds ++ bounds.map(_ - 1e-9) ++ bounds.map(_ + 1e-9) ++
      Array(Double.MinValue, Double.MaxValue, -1e300, 1e300))
      .map(Option(_)).toSeq :+ Option.empty[Double]
    val df = probes.toDF("v")
      .select($"v", NativeFns.range_bucket($"v", bounds).as("native"),
        foldForm($"v").as("fold"))
    assert(df.filter(not($"native" <=> $"fold") &&
      $"v".isNotNull).count() == 0)
    // the engine maps null -> 0 via coalesce, matching the fold's 0
    assert(df.filter($"v".isNull).select(coalesce($"native", lit(0)))
      .head().getInt(0) == 0)
    // scale probe: 4096 buckets stays inside whole-stage codegen —
    // the chained-when fold at this width would fall back to
    // interpreted eval (generated method past the JIT limit).
    // CODEGEN_ONLY turns any runtime Janino failure into a test
    // failure; spark.range's id is NON-nullable, so this also pins the
    // nullable=false branch of the delegate codegen (r3's fix emitted
    // an undeclared ev.isNull there and silently fell back).
    withCodegenOnly {
      val wide = (1 until 4096).map(_.toDouble).toArray
      val probe = spark.range(0, 100000).select(($"id" % 5000).cast("double").as("v"))
        .select($"v", NativeFns.range_bucket($"v", wide).as("b"))
      val expected = probe.selectExpr("v", "b",
        "least(greatest(cast(floor(v) as int), 0), 4095) as ref")
        .filter($"v" >= 1 && $"v" < 4096)
      assert(expected.filter($"b" =!= $"ref").count() == 0)
      // '*(n)' is the whole-stage-codegen marker; the projection holding
      // range_bucket must carry it
      val codegenSpans = probe.queryExecution.executedPlan.toString
      assert(codegenSpans.linesIterator.exists(l =>
          l.contains("range_bucket") && l.contains("*(")),
        s"range_bucket fell out of codegen:\n$codegenSpans")
    }
  }

  test("all native expressions execute under CODEGEN_ONLY on non-nullable input") {
    import spark.implicits._
    import graft.expressions.NativeFns
    withCodegenOnly {
      // lit()/array() literals are non-nullable, so every delegate
      // expression here has nullable=false and must compile its
      // throw-branch (not assign an undeclared isNull)
      val df = spark.range(0, 1000).select(
        NativeFns.word_shingles(concat_ws(" ", lit("alpha beta gamma delta"),
          $"id".cast("string")), 3).as("sh"),
        NativeFns.range_bucket($"id".cast("double"), Array(10.0, 100.0, 500.0)).as("rb"),
        NativeFns.word_stats(concat_ws(" ", lit("alpha beta the"),
          $"id".cast("string")), Seq("the")).as("ws"))
        .select(
          TextFns.minhashSignature($"sh", 8).as("mh"),
          NativeFns.jaccard_sim($"sh", $"sh").as("js"),
          NativeFns.simhash_bits($"sh", 32).as("sim"),
          NativeFns.winnow_fp(lit("alpha beta gamma delta"), 3, 8).as("wf"),
          $"ws", $"rb")
      assert(df.filter($"js" === 1.0 && $"rb".isNotNull && length($"wf") === 98 &&
          $"ws.n_tok" === 4L && $"ws.stop_hits" === 1L)
        .count() == 1000)
    }
  }

  test("native cosine == declarative cosine (bitwise)") {
    import spark.implicits._
    val e = Tables.load(spark, sf0001, "embeddings")
    val a = e.select($"vec_id".as("id_a"), $"embedding".as("va"), ($"vec_id" % 10).as("m"))
    val b = e.select($"vec_id".as("id_b"), $"embedding".as("vb"), ($"vec_id" % 10).as("m"))
    val pairs = a.join(b, "m").filter($"id_a" < $"id_b").limit(5000)
      .select(VecFns.cosine($"va", $"vb").as("native"),
        VecFns.cosineDeclarative($"va", $"vb").as("decl"))
    // bitwise equality, not approx — oracles depend on it
    assert(pairs.filter(not($"native" <=> $"decl")).count() == 0)
  }

  test("dot_product/(vec_norm*vec_norm) == cosine_sim (bitwise, incl. codegen)") {
    import spark.implicits._
    import graft.expressions.NativeFns
    // embeddingPairs hoists the norms out of its pair kernel on the
    // claim that the decomposed form is IEEE-identical to the fused
    // CosineSim fold — d05's oracle hash rests on this equality.
    val e = Tables.load(spark, sf0001, "embeddings")
    val a = e.select($"vec_id".as("id_a"), $"embedding".as("va"), ($"vec_id" % 10).as("m"))
      .withColumn("na", NativeFns.vec_norm($"va"))
    val b = e.select($"vec_id".as("id_b"), $"embedding".as("vb"), ($"vec_id" % 10).as("m"))
      .withColumn("nb", NativeFns.vec_norm($"vb"))
    def cmp(): Long = a.join(b, "m").filter($"id_a" < $"id_b").limit(5000)
      .select(
        (NativeFns.dot_product($"va", $"vb") / ($"na" * $"nb")).as("decomposed"),
        VecFns.cosine($"va", $"vb").as("fused"))
      .filter(not($"decomposed" <=> $"fused")).count()
    assert(cmp() == 0)
    withCodegenOnly { assert(cmp() == 0) }
    // unequal lengths: CosineSim folds trailing elements of the longer
    // array into its norm; vec_norm runs the full array — same values
    val ragged = Seq(
      (Array(1.0f, 2.0f, 3.0f), Array(0.5f, -1.0f)),
      (Array(0.1f), Array(0.2f, 0.9f, -0.4f, 7.0f))).toDF("x", "y")
      .select(
        (NativeFns.dot_product($"x", $"y") /
          (NativeFns.vec_norm($"x") * NativeFns.vec_norm($"y"))).as("decomposed"),
        VecFns.cosine($"x", $"y").as("fused"))
    assert(ragged.filter(not($"decomposed" <=> $"fused")).count() == 0)
  }

  test("scored_pairs generator == join + round(cosine) (bitwise), incl. split cells") {
    import spark.implicits._
    import graft.operators.Dedup
    // embeddingPairs scores pairs inside the ScoredPairs generator:
    // ids, rounding, survivor test, and the cosine itself must match
    // the declarative join formulation BIT FOR BIT — d05's oracle and
    // the sf10 checksum rest on it.
    val e = Tables.load(spark, sf0001, "embeddings")
    def reference(minCos: Double): DataFrame = {
      val s = e.select($"vec_id".as("id"), $"embedding".as("v"), $"label".as("cell"))
      val a = s.toDF("id_a", "v_a", "cell")
      val b = s.toDF("id_b", "v_b", "cell")
      a.join(b, "cell").filter($"id_a" < $"id_b")
        .withColumn("cos", round(VecFns.cosine($"v_a", $"v_b"), 6))
        .filter($"cos" > minCos)
        .select($"cell", $"id_a", $"id_b", $"cos")
    }
    for (cap <- Seq(Int.MaxValue, 40)) { // unsplit cells AND the triangle path
      val got = Dedup.embeddingPairs(e, $"vec_id", $"embedding", $"label",
        minCos = 0.3, cellCap = cap)
      val diff = got.toDF("cell", "id_a", "id_b", "cos_g")
        .join(reference(0.3), Seq("cell", "id_a", "id_b"), "full_outer")
        .filter(not($"cos_g" <=> $"cos"))
      assert(diff.count() == 0, s"cellCap=$cap diverged")
      assert(got.count() > 0)
    }
  }

  test("sketch_project == array(dot_product(vec, lit(row)) cast float) (bitwise)") {
    import spark.implicits._
    import graft.expressions.NativeFns
    import graft.operators.Similarity
    // s06's oracle restates the dot-literal form; the serve path runs
    // the fused kernel — the two must agree float for float, at a
    // sketchDim past the composed form's codegen comfort zone.
    val e = Tables.load(spark, sf0001, "embeddings")
    for (sd <- Seq(8, 32)) {
      val r = Similarity.sketchMatrix(dim = 64, sketchDim = sd, seed = 20260814L)
      val composed = array(r.toIndexedSeq.map(row =>
        NativeFns.dot_product($"embedding", typedLit(row.toSeq)).cast("float")): _*)
      val diff = e.select(
          NativeFns.sketch_project($"embedding", r).as("fused"),
          composed.as("composed"))
        .filter(not($"fused" <=> $"composed"))
      assert(diff.count() == 0, s"sketchDim=$sd diverged")
    }
    // null vector in -> null sketch out
    val nulls = Seq((1L, None: Option[Seq[Float]])).toDF("id", "v")
      .select(NativeFns.sketch_project($"v",
        Similarity.sketchMatrix(4, 2, 1L)).as("sk"))
    assert(nulls.filter($"sk".isNotNull).count() == 0)
  }
}
