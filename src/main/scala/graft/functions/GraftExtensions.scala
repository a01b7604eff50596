package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.{ArrayType, BinaryType, DoubleType, FloatType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Engine extension point, registered via `spark.sql.extensions` (the
  * public `SparkSessionExtensions` API — SURVEY §7.3's prescribed seam for
  * custom expressions). Currently injects:
  *
  *  - `graft_dot(a, b)` → [[DotProduct]]: native codegen'd float/double
  *    array dot product, the hot scalar of every similarity join;
  *  - `graft_cosine(a, b)` → [[CosineSim]]: fused one-pass cosine
  *    (dot + both norms in one loop), bit-equal to the composed
  *    `graft_dot` form — ALSO the planner marker: comparing it against a
  *    literal threshold inside a join condition is the declarative
  *    similarity join [[graft.plans.SimilarityJoinStrategy]] plans into
  *    the LSH physical shape (opt-in by conf);
  *  - `graft_shingles(text, n)` → [[WordShingles]]: distinct word n-grams,
  *    the input of every inverted-index build;
  *  - `graft_winnow(text, k, w)` → [[WinnowFingerprints]]: fused one-pass
  *    winnowing document fingerprint. Algorithm parameters (n, k, w) must
  *    be integer literals — they are parameters, not data.
  * and one optimizer rule ([[TokenCountRewrite]], via
  * `injectOptimizerRule`): `size(split(s, " ", -1))` → [[TokenCount]],
  * the allocation-free token count, substituted plan-wide.
  *
  * One native AGGREGATE (the `TypedImperativeAggregate` rung):
  *
  *  - `graft_topk(item, k, capacity)` / `graft_topk(item, weight, k,
  *    capacity)` → [[TopKAgg]]: space-saving heavy-hitters top-k with a
  *    bounded serialized sketch buffer — the one-aggregation replacement
  *    for the agg→window→filter top-n-per-group pattern (the weighted
  *    form ranks a pre-aggregated count table). k and capacity must be
  *    integer literals.
  *  - `graft_topk_rows(key, id, k)` → [[TopKRowsAgg]]: EXACT bounded-heap
  *    top-k rows per group by (key asc, id asc) — the billion-group
  *    replacement for window-rank-filter with no approximation regime
  *    (min-k composes exactly under any merge order); k must be an
  *    integer literal.
  *
  *  - `graft_ngrams(text, n)` → [[TokenNgrams]]: every word n-gram
  *    occurrence as a zero-copy byte slice — the LM counting form;
  *  - `graft_winhash(text, w)` → [[TokenWindowHashes]]: per-position
  *    xxhash64 of every w-token window, hashed in place over the text's
  *    byte ranges — the span-dedup candidate generator;
  *  - `graft_normtext(text)` → [[NormalizeText]]: fused Unicode NFC +
  *    diacritic strip + root-locale lowercase + whitespace collapse;
  *  - `graft_rproject(vec, outDim, seed)` → [[RandomProject]]: sign
  *    random projection (JL) of an embedding to `outDim` integer-
  *    millionth components — the pre-ANN dimensionality reduction;
  *  - `graft_hash_embed(text, buckets, outDim, seed)` → [[HashEmbed]]:
  *    model-free document embedding — the hashing trick over the DSIR
  *    uni+bigram feature space composed with the sign projection, fused
  *    into one pass over the text;
  *  - `graft_bloom_contains(h, bloomBytes)` → [[BloomContains]]:
  *    Bloom-filter membership over a 64-bit hash — the broadcast-set
  *    map-side prefilter for semi/anti-joins against a small keyset.
  *    `bloomBytes` must be a binary LITERAL (a driver-built serialized
  *    filter), parsed once at plan time;
  *  - `graft_bpe(token, merges)` → [[BpeEncode]]: BPE subword segmentation
  *    with a trained merge table. `merges` must be a string LITERAL in
  *    merges.txt layout (one `left right` pair per line, rank order) — it
  *    is parsed ONCE at plan time into the expression's constant rank
  *    table, not evaluated per row.
  *
  * Being registered functions (not Column helpers) also makes the
  * expressions available to plain SQL users: `SELECT graft_dot(x, y)`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def litInt(e: Expression, fn: String, arg: String): Int = e match {
    case Literal(v: Int, IntegerType) => v
    case other => throw new IllegalArgumentException(
      s"$fn: $arg must be an integer literal, got $other")
  }

  override def apply(ext: SparkSessionExtensions): Unit = {
    // the Rule[LogicalPlan] rung: size(split(s," ",-1)) → TokenCount —
    // every token-count call site gets the allocation-free native form
    // without being edited (see TokenCountRewrite)
    ext.injectOptimizerRule(_ => new TokenCountRewrite)
    // the document source's array-element `$match` pushdown: predicates
    // on fixed array elements (items[0].qty) translate to bracket-path
    // v1 filters and bake into the scan — Spark's own translation can't
    // hand GetArrayItem to pushFilters (see ArrayMatchPushdown)
    ext.injectOptimizerRule(_ => new graft.ingest.v2.ArrayMatchPushdown)
    // ...and the projection half: when every use of an array column is a
    // fixed ordinal (or null check), the parser stops materializing the
    // array past the highest referenced element (see ArrayHeadProjection)
    ext.injectOptimizerRule(_ => new graft.ingest.v2.ArrayHeadProjection)
    // the SparkStrategy rung: joins on `graft_cosine(a,b) >= t` plan as
    // the sign-bucket LSH physical shape instead of a nested-loop scan —
    // opt-in via spark.graft.similarityJoin.enabled (approximation must
    // never be silent); see graft.plans.SimilarityJoinStrategy
    ext.injectPlannerStrategy(session =>
      new graft.plans.SimilarityJoinStrategy(session))
    // exchange-free global ORDER BY over range-landed drops: when the
    // zone-map sidecar proves strictly-disjoint sorted bands, the sort
    // IS the layout — no SortExec, no range Exchange. EXACT (unlike the
    // similarity join), so no opt-in conf; unprovable falls through.
    ext.injectPlannerStrategy(session =>
      new graft.plans.OrderedScanStrategy(session))
    // zero-exchange, zero-sort equi-join of two range-landed drops over
    // band-aligned partitions (the range analogue of the storage-
    // partitioned join). EXACT; a user join hint refuses.
    ext.injectPlannerStrategy(session =>
      new graft.plans.RangeMergeJoinStrategy(session))
    // interval-overlap join (iv.s <= p.k AND p.k <= iv.e) of two
    // range-landed drops as a bounded one-pass sweep — the shape Spark
    // can only nested-loop. EXACT; refuses without sidecar width
    // bounds or past the active-set cap.
    ext.injectPlannerStrategy(session =>
      new graft.plans.RangeIntervalJoinStrategy(session))
    // one-stage GROUP BY over a range-landed drop (rangeAggregation
    // read option): the band layout satisfies the final aggregate's
    // clustered distribution, so partial+final run with zero exchange.
    ext.injectPlannerStrategy(session =>
      new graft.plans.RangeAggStrategy(session))
    // exchange-free global running windows (SUM/COUNT/MIN/MAX OVER
    // (ORDER BY key), row_number, rank) over range-landed drops: the
    // no-PARTITION-BY window's single-partition collapse becomes per-band
    // local running aggregation + a per-band prefix (sidecar metadata
    // when provable, else one narrow totals pass). EXACT; unprovable
    // shapes fall through to Spark's WindowExec.
    ext.injectPlannerStrategy(session =>
      new graft.plans.RangeWindowStrategy(session))
    ext.injectFunction((
      new FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
      (children: Seq[Expression]) => {
        require(children.length == 2, "graft_dot takes exactly 2 arguments")
        DotProduct(children.head, children(1))
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_cosine"),
      new ExpressionInfo(classOf[CosineSim].getName, "graft_cosine"),
      (children: Seq[Expression]) => {
        require(children.length == 2, "graft_cosine takes exactly 2 arguments")
        CosineSim(children.head, children(1))
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_cosine_approx"),
      new ExpressionInfo(classOf[CosineSim].getName, "graft_cosine_approx"),
      (children: Seq[Expression]) => {
        require(children.length == 2,
          "graft_cosine_approx takes exactly 2 arguments")
        // same evaluation as graft_cosine; the flag is the PER-JOIN
        // opt-in SimilarityJoinStrategy honors without any session conf
        CosineSim(children.head, children(1), approxHint = true)
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_shingles"),
      new ExpressionInfo(classOf[WordShingles].getName, "graft_shingles"),
      (children: Seq[Expression]) => {
        require(children.length == 2, "graft_shingles takes exactly 2 arguments")
        WordShingles(children.head, litInt(children(1), "graft_shingles", "n"))
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_normtext"),
      new ExpressionInfo(classOf[NormalizeText].getName, "graft_normtext"),
      (children: Seq[Expression]) => {
        require(children.length == 1, "graft_normtext takes exactly 1 argument")
        NormalizeText(children.head)
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_bpe"),
      new ExpressionInfo(classOf[BpeEncode].getName, "graft_bpe"),
      (children: Seq[Expression]) => {
        require(children.length == 2, "graft_bpe takes exactly 2 arguments")
        val spec = children(1) match {
          case Literal(v: UTF8String, StringType) => v.toString
          case other => throw new IllegalArgumentException(
            s"graft_bpe: merges must be a string literal, got $other")
        }
        BpeEncode(children.head, BpeTable.parse(spec))
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_topk"),
      new ExpressionInfo(classOf[TopKAgg].getName, "graft_topk"),
      (children: Seq[Expression]) => children.length match {
        case 3 => TopKAgg(children.head, None,
          litInt(children(1), "graft_topk", "k"),
          litInt(children(2), "graft_topk", "capacity"))
        case 4 => TopKAgg(children.head, Some(children(1)),
          litInt(children(2), "graft_topk", "k"),
          litInt(children(3), "graft_topk", "capacity"))
        case n => throw new IllegalArgumentException(
          s"graft_topk takes (item, k, capacity) or (item, weight, k, capacity), got $n args")
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_topk_rows"),
      new ExpressionInfo(classOf[TopKRowsAgg].getName, "graft_topk_rows"),
      (children: Seq[Expression]) => {
        require(children.length == 3,
          "graft_topk_rows takes exactly (key, id, k)")
        TopKRowsAgg(children(0), children(1),
          litInt(children(2), "graft_topk_rows", "k"))
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_winnow"),
      new ExpressionInfo(classOf[WinnowFingerprints].getName, "graft_winnow"),
      (children: Seq[Expression]) => {
        require(children.length == 3, "graft_winnow takes exactly 3 arguments")
        WinnowFingerprints(children.head,
          litInt(children(1), "graft_winnow", "k"),
          litInt(children(2), "graft_winnow", "w"))
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_ngrams"),
      new ExpressionInfo(classOf[TokenNgrams].getName, "graft_ngrams"),
      (children: Seq[Expression]) => {
        require(children.length == 2, "graft_ngrams takes exactly 2 arguments")
        TokenNgrams(children.head, litInt(children(1), "graft_ngrams", "n"))
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_winhash"),
      new ExpressionInfo(classOf[TokenWindowHashes].getName, "graft_winhash"),
      (children: Seq[Expression]) => {
        require(children.length == 2, "graft_winhash takes exactly 2 arguments")
        TokenWindowHashes(children.head,
          litInt(children(1), "graft_winhash", "w"))
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_dsir_buckets"),
      new ExpressionInfo(classOf[DsirBuckets].getName, "graft_dsir_buckets"),
      (children: Seq[Expression]) => {
        require(children.length == 2,
          "graft_dsir_buckets takes exactly 2 arguments")
        DsirBuckets(children.head,
          litInt(children(1), "graft_dsir_buckets", "buckets"))
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_rproject"),
      new ExpressionInfo(classOf[RandomProject].getName, "graft_rproject"),
      (children: Seq[Expression]) => {
        require(children.length == 3,
          "graft_rproject takes exactly 3 arguments")
        RandomProject(children.head,
          litInt(children(1), "graft_rproject", "outDim"),
          litInt(children(2), "graft_rproject", "seed").toLong)
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_hash_embed"),
      new ExpressionInfo(classOf[HashEmbed].getName, "graft_hash_embed"),
      (children: Seq[Expression]) => {
        require(children.length == 4,
          "graft_hash_embed takes exactly 4 arguments")
        HashEmbed(children.head,
          litInt(children(1), "graft_hash_embed", "buckets"),
          litInt(children(2), "graft_hash_embed", "outDim"),
          litInt(children(3), "graft_hash_embed", "seed").toLong)
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_bloom_contains"),
      new ExpressionInfo(classOf[BloomContains].getName, "graft_bloom_contains"),
      (children: Seq[Expression]) => {
        require(children.length == 2,
          "graft_bloom_contains takes exactly 2 arguments")
        val bytes = children(1) match {
          case Literal(v: Array[Byte], BinaryType) => v
          case other => throw new IllegalArgumentException(
            s"graft_bloom_contains: filter must be a binary literal, got $other")
        }
        BloomContains(children.head, new BloomRef(bytes))
      }))
    // PQ kernels: the codebook (array<double> literal) folds into ONE
    // constant PqRef at plan time — the naive m·k-subexpression literal
    // tree costs ~10 s of planning+Janino per query (measured), which is
    // the entire reason these are native
    def pqRefOf(fn: String, children: Seq[Expression]): PqRef = {
      require(children.length == 4, s"$fn takes exactly 4 arguments")
      val flat = children(1) match {
        case Literal(v: org.apache.spark.sql.catalyst.util.ArrayData,
            ArrayType(DoubleType, _)) => v.toDoubleArray()
        case other => throw new IllegalArgumentException(
          s"$fn: books must be an array<double> literal, got $other")
      }
      new PqRef(litInt(children(2), fn, "m"), litInt(children(3), fn, "k"), flat)
    }
    ext.injectFunction((
      new FunctionIdentifier("graft_pq_encode"),
      new ExpressionInfo(classOf[PqEncode].getName, "graft_pq_encode"),
      (children: Seq[Expression]) =>
        PqEncode(children.head, pqRefOf("graft_pq_encode", children))))
    ext.injectFunction((
      new FunctionIdentifier("graft_pq_dtab"),
      new ExpressionInfo(classOf[PqDistTable].getName, "graft_pq_dtab"),
      (children: Seq[Expression]) =>
        PqDistTable(children.head, pqRefOf("graft_pq_dtab", children))))
    // residual-mode kernels carry the coarse centroid table as a second
    // array<double> literal folded into the same PqRef
    def pqResRefOf(fn: String, children: Seq[Expression]): PqRef = {
      require(children.length == 6, s"$fn takes exactly 6 arguments")
      def arr(e: Expression, what: String): Array[Double] = e match {
        case Literal(v: org.apache.spark.sql.catalyst.util.ArrayData,
            ArrayType(DoubleType, _)) => v.toDoubleArray()
        case other => throw new IllegalArgumentException(
          s"$fn: $what must be an array<double> literal, got $other")
      }
      new PqRef(litInt(children(4), fn, "m"), litInt(children(5), fn, "k"),
        arr(children(3), "books"), arr(children(2), "coarse"))
    }
    ext.injectFunction((
      new FunctionIdentifier("graft_pq_encode_res"),
      new ExpressionInfo(classOf[PqEncodeRes].getName, "graft_pq_encode_res"),
      (children: Seq[Expression]) =>
        PqEncodeRes(children(0), children(1),
          pqResRefOf("graft_pq_encode_res", children))))
    ext.injectFunction((
      new FunctionIdentifier("graft_pq_dtab_res"),
      new ExpressionInfo(classOf[PqDistTableRes].getName, "graft_pq_dtab_res"),
      (children: Seq[Expression]) =>
        PqDistTableRes(children(0), children(1),
          pqResRefOf("graft_pq_dtab_res", children))))
    ext.injectFunction((
      new FunctionIdentifier("graft_pq_adc"),
      new ExpressionInfo(classOf[PqAdc].getName, "graft_pq_adc"),
      (children: Seq[Expression]) => {
        require(children.length == 4, "graft_pq_adc takes exactly 4 arguments")
        PqAdc(children(0), children(1),
          litInt(children(2), "graft_pq_adc", "m"),
          litInt(children(3), "graft_pq_adc", "k"))
      }))
    // IVF routing kernels (r20): the coarse centroid table (array<float>
    // literal) folds into ONE constant IvfRef at plan time — the struct-
    // literal composition it replaces (array_max/array_sort over
    // cells × dim literal trees) measured 2-3 s of driver-side planning
    // per ANN query and 2.2 MiB task binaries per stage at sf0.1
    def ivfRefOf(fn: String, children: Seq[Expression]): IvfRef = {
      val flat = children(1) match {
        case Literal(v: org.apache.spark.sql.catalyst.util.ArrayData,
            ArrayType(FloatType, _)) => v.toFloatArray()
        // a SQL caller's foldable constructor (array(...f), a cast) is a
        // plan-time constant too — eval it at build time instead of
        // throwing an opaque builder error during analysis
        case e if e.foldable && (e.dataType match {
          case ArrayType(FloatType, _) => true
          case _ => false
        }) && e.eval() != null =>
          e.eval().asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
            .toFloatArray()
        case other => throw new IllegalArgumentException(
          s"$fn: cents (argument 2) must be an array<float> plan-time " +
            s"constant, got $other")
      }
      new IvfRef(litInt(children(2), fn, "dim"), flat)
    }
    ext.injectFunction((
      new FunctionIdentifier("graft_ivf_cell"),
      new ExpressionInfo(classOf[IvfCell].getName, "graft_ivf_cell"),
      (children: Seq[Expression]) => {
        require(children.length == 3, "graft_ivf_cell takes exactly 3 arguments")
        IvfCell(children.head, ivfRefOf("graft_ivf_cell", children))
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_ivf_score"),
      new ExpressionInfo(classOf[IvfBestScore].getName, "graft_ivf_score"),
      (children: Seq[Expression]) => {
        require(children.length == 3, "graft_ivf_score takes exactly 3 arguments")
        IvfBestScore(children.head, ivfRefOf("graft_ivf_score", children))
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_ivf_probes"),
      new ExpressionInfo(classOf[IvfProbes].getName, "graft_ivf_probes"),
      (children: Seq[Expression]) => {
        require(children.length == 4, "graft_ivf_probes takes exactly 4 arguments")
        IvfProbes(children.head,
          litInt(children(3), "graft_ivf_probes", "nProbe"),
          ivfRefOf("graft_ivf_probes", children))
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_pq_residual"),
      new ExpressionInfo(classOf[PqResidualVec].getName, "graft_pq_residual"),
      (children: Seq[Expression]) => {
        require(children.length == 4,
          "graft_pq_residual takes exactly 4 arguments")
        val coarse = children(2) match {
          case Literal(v: org.apache.spark.sql.catalyst.util.ArrayData,
              ArrayType(DoubleType, _)) => v.toDoubleArray()
          case other => throw new IllegalArgumentException(
            s"graft_pq_residual: coarse must be an array<double> literal, got $other")
        }
        PqResidualVec(children(0), children(1),
          new CoarseRef(litInt(children(3), "graft_pq_residual", "dim"), coarse))
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_sq8"),
      new ExpressionInfo(classOf[Sq8Codes].getName, "graft_sq8"),
      (children: Seq[Expression]) => {
        require(children.length == 3, "graft_sq8 takes exactly 3 arguments")
        def arr(e: Expression, what: String): Array[Double] = e match {
          case Literal(v: org.apache.spark.sql.catalyst.util.ArrayData,
              ArrayType(DoubleType, _)) => v.toDoubleArray()
          case other => throw new IllegalArgumentException(
            s"graft_sq8: $what must be an array<double> literal, got $other")
        }
        Sq8Codes(children.head,
          new SqRef(arr(children(1), "mn"), arr(children(2), "mx")))
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_opq_rotate"),
      new ExpressionInfo(classOf[OpqRotate].getName, "graft_opq_rotate"),
      (children: Seq[Expression]) => {
        require(children.length == 3,
          "graft_opq_rotate takes exactly 3 arguments")
        val mat = children(1) match {
          case Literal(v: org.apache.spark.sql.catalyst.util.ArrayData,
              ArrayType(DoubleType, _)) => v.toDoubleArray()
          case other => throw new IllegalArgumentException(
            s"graft_opq_rotate: mat must be an array<double> literal, got $other")
        }
        OpqRotate(children.head,
          new RotRef(litInt(children(2), "graft_opq_rotate", "dim"), mat))
      }))
  }
}
