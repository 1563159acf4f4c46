package graft.relational

import graft.{SparkEntry, SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Independent re-computations for the round-8 audit queries. The
  * DuckDB oracle proves Spark ≡ DuckDB on the same SQL rendering; these
  * pins prove the rendering computes the intended MATH, via a second
  * path that shares no plan shape with the query:
  *  - q195's "actual" is checked against the physically expanded join
  *    (the thing the count-then-join shape exists to avoid);
  *  - q196's replica means/CI against a from-scratch driver-side md5 →
  *    Poisson-CDF → weighted-mean reimplementation;
  *  - q197's S / n_pairs / Theil–Sen median against brute-force pair
  *    enumeration over the collected daily counts. */
class StatsAuditSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"
  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  test("q195: 'actual_rows' equals the truly expanded join; derived columns consistent") {
    val row = run("q195_join_size_estimate").collect().head
    val est = row.getAs[Long]("est_rows")
    val act = row.getAs[Long]("actual_rows")
    val expanded = Tables.events(spark, sf).select(col("user_id"))
      .join(Tables.orders(spark, sf).select(col("o_custkey")),
        col("user_id") === col("o_custkey")).count()
    assert(act == expanded,
      s"count-then-join ($act) must equal expand-then-count ($expanded)")
    assert(row.getAs[Long]("abs_err") == math.abs(est - act))
    // BigInt product = the exact floor the two-step split must equal
    assert(row.getAs[Long]("est_ratio_micro") ==
      ((BigInt(est) * 1000000) / BigInt(act)).toLong)
    // the estimator must be useful, not just well-formed: on the
    // near-uniform fixture keyspace the containment assumption holds
    // to well within 2× (measured ~1.03 at sf0.01)
    assert(est > act / 2 && est < act * 2,
      s"estimate $est implausibly far from actual $act on a uniform fixture")
  }

  test("q196: point/replica means/CI reproduce a from-scratch reimplementation") {
    val row = run("q196_bootstrap_ci").collect().head
    val docs = Tables.documents(spark, sf).select("doc_id", "text").collect()
      // split with limit -1: Spark's split / DuckDB's string_split keep
      // trailing empty fields; Scala's 1-arg split drops them
      .map(r => (r.getLong(0), r.getString(1).split(" ", -1).length.toLong))
    // BigInt product = the exact floor the two-step split must equal
    def microMean(sum: Long, cnt: Long): Long =
      ((BigInt(sum) * 1000000) / BigInt(cnt)).toLong
    val point = microMean(docs.map(_._2).sum, docs.length.toLong)
    assert(row.getAs[Long]("point_micro") == point)
    def uniform(doc: Long, b: Int): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$doc#$b".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(6)
      java.lang.Long.parseLong(hex, 16) % 1000000L
    }
    val cdf = Array(367879L, 735759L, 919699L, 981012L,
      996340L, 999406L, 999917L, 999990L)
    def weight(u: Long): Long = {
      val i = cdf.indexWhere(u < _); if (i < 0) 8L else i.toLong
    }
    val means = (0 until 32).map { b =>
      val (sw, swx) = docs.foldLeft((0L, 0L)) { case ((sw, swx), (id, x)) =>
        val w = weight(uniform(id, b)); (sw + w, swx + w * x)
      }
      assert(sw > 0, s"replica $b drew all-zero weights on a 60-doc fixture")
      (microMean(swx, sw), b)
    }.sorted
    assert(row.getAs[Long]("lo_micro") == means.head._1)
    assert(row.getAs[Long]("hi_micro") == means(30)._1)
    assert(means.head._1 < means(30)._1,
      "degenerate fixture: zero-width CI proves nothing")
    assert(means.head._1 <= point && point <= means(30)._1,
      "bootstrap CI should bracket the point estimate on this fixture")
  }

  test("q197: S, n_pairs, n_days, Theil–Sen median match brute-force pair enumeration") {
    val row = run("q197_trend_test").collect().head
    val daily = Tables.events(spark, sf)
      .groupBy(col("ts").cast("date").as("day"))
      .agg(count(lit(1)).as("n")).collect()
      .map(r => (r.getDate(0).toLocalDate.toEpochDay, r.getLong(1)))
    val d0 = daily.map(_._1).min
    val d = daily.map { case (day, n) => (day - d0, n) }.sortBy(_._1)
    assert(d.length >= 3, "fixture too small to exercise the pair pass")
    val pairs = for {
      (i, ni) <- d.toSeq; (j, nj) <- d.toSeq if i < j
    } yield (i, ni, j, nj)
    val s = pairs.map { case (_, ni, _, nj) =>
      java.lang.Long.signum(nj - ni).toLong }.sum
    val nPairs = pairs.length.toLong
    assert(nPairs == d.length.toLong * (d.length - 1) / 2)
    // same tie-break, same single IEEE division as the plan
    val slopes = pairs
      .map { case (i, ni, j, nj) => ((nj - ni).toDouble / (j - i), i, j) }
      .sortBy(identity)
    val median = slopes(((nPairs + 1) / 2 - 1).toInt)._1
    assert(row.getAs[Long]("mk_s") == s)
    assert(row.getAs[Long]("n_days") == d.length.toLong)
    assert(row.getAs[Long]("n_pairs") == nPairs)
    assert(row.getAs[Double]("theil_sen_slope") == median,
      "lower-median slope must match bit-exactly (identical IEEE division)")
  }

  test("q198: KS statistic and argmax match brute-force ECDF comparison") {
    val row = run("q198_ks_split_drift").collect().head
    def bucket(doc: Long): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(doc.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(4)
      java.lang.Long.parseLong(hex, 16) % 10
    }
    val docs = Tables.documents(spark, sf).select("doc_id", "n_chars")
      .collect().map(r => (bucket(r.getLong(0)), r.getLong(1)))
    val tr = docs.collect { case (b, v) if b < 8 => v }.sorted
    val te = docs.collect { case (b, v) if b == 9 => v }.sorted
    assert(tr.length > 10 && te.length > 3, "split fixture too thin")
    val (dNum, atValue) = (tr ++ te).distinct.sorted.map { v =>
      val diff = math.abs(
        tr.count(_ <= v).toLong * te.length -
          te.count(_ <= v).toLong * tr.length)
      (diff, v)
    }.maxBy { case (diff, v) => (diff, -v) } // max diff, smallest v
    assert(row.getAs[Long]("d_num") == dNum)
    assert(row.getAs[Long]("at_value") == atValue)
    assert(row.getAs[Long]("n_train") == tr.length.toLong)
    assert(row.getAs[Long]("n_test") == te.length.toLong)
    assert(row.getAs[Long]("ks_micro") ==
      Math.floorDiv(dNum * 1000000L, tr.length.toLong * te.length))
  }

  test("q199: two-step micro division ≡ exact floor(s·10⁶/n); jackknife identity holds") {
    val rows = run("q199_source_influence").collect()
    val g = Tables.documents(spark, sf).select("source", "n_chars")
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1).view
      .mapValues(vs => (vs.length.toLong, vs.map(_._2).sum)).toMap
    val n = g.values.map(_._1).sum
    val s = g.values.map(_._2).sum
    def microMean(sum: Long, cnt: Long): Long =
      ((BigInt(sum) * 1000000) / BigInt(cnt)).toLong // the direct product form
    assert(rows.length == g.size)
    rows.foreach { r =>
      val (nG, sG) = g(r.getAs[String]("source"))
      assert(r.getAs[Long]("n_g") == nG)
      assert(r.getAs[Long]("full_mean_micro") == microMean(s, n),
        "overflow-safe split must equal the direct BigInt product")
      assert(r.getAs[Long]("loo_mean_micro") == microMean(s - sG, n - nG))
      assert(r.getAs[Long]("delta_micro") ==
        microMean(s - sG, n - nG) - microMean(s, n))
    }
    // the fixture must actually discriminate: some source moves the mean
    assert(rows.exists(_.getAs[Long]("delta_micro") != 0L))
  }

  test("q202: decile order statistics match a driver-side sorted-selection recompute") {
    val rows = run("q202_quantile_drift").collect()
      .map(r => (r.getAs[Long]("decile"), r.getAs[Long]("q_train"),
        r.getAs[Long]("q_test"), r.getAs[Long]("drift"))).sortBy(_._1)
    assert(rows.map(_._1).toSeq == (1L to 9L))
    def bucket(doc: Long): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(doc.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(4)
      java.lang.Long.parseLong(hex, 16) % 10
    }
    val docs = Tables.documents(spark, sf).select("doc_id", "n_chars")
      .collect().map(r => (bucket(r.getLong(0)), r.getLong(1), r.getLong(0)))
    def side(p: Long => Boolean) =
      docs.collect { case (b, v, id) if p(b) => (v, id) }.sorted.map(_._1)
    val (tr, te) = (side(_ < 8), side(_ == 9))
    rows.foreach { case (d, qTr, qTe, drift) =>
      val kTr = ((tr.length - 1) * d / 10).toInt // k−1, zero-based
      val kTe = ((te.length - 1) * d / 10).toInt
      assert(qTr == tr(kTr), s"decile $d train")
      assert(qTe == te(kTe), s"decile $d test")
      assert(drift == qTe - qTr)
    }
  }

  test("q203/q204: burstiness and autocorrelation match driver-side moment recomputes") {
    val daily = Tables.events(spark, sf)
      .groupBy(col("event_type").as("t"), col("ts").cast("date").as("day"))
      .agg(count(lit(1)).as("x")).collect()
      .map(r => (r.getString(0), r.getDate(1).toLocalDate.toEpochDay,
        r.getLong(2)))
    // q203: per-type Fano over the calendar span (zero days implicit)
    val fano = run("q203_fano_burstiness").collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[Long]("n_days"),
        r.getAs[Long]("n_events"), r.getAs[Double]("fano")))
    assert(fano.nonEmpty)
    fano.foreach { case (t, n, sxTot, f) =>
      val xs = daily.filter(_._1 == t)
      val span = xs.map(_._2).max - xs.map(_._2).min + 1
      val sx = xs.map(_._3).sum
      val sxx = xs.map(v => v._3 * v._3).sum
      assert(n == span && sxTot == sx)
      val expect = (span.toDouble * sxx.toDouble - sx.toDouble * sx.toDouble) /
        ((span - 1).toDouble * sx.toDouble)
      assert(f == expect, s"$t: identical IEEE formula on exact sums")
    }
    // q204: lag-1 Pearson over the ZERO-FILLED global day series
    val row = run("q204_autocorrelation").collect().head
    val byDay = daily.groupBy(_._2).view.mapValues(_.map(_._3).sum).toMap
    val (d0, d1) = (byDay.keys.min, byDay.keys.max)
    val series = (d0 to d1).map(byDay.getOrElse(_, 0L))
    val pairs = series.zip(series.tail)
    val n = pairs.length.toLong
    assert(row.getAs[Long]("n_pairs") == n)
    assert(n == d1 - d0, "zero-fill must make pairs = span − 1")
    val (sx, sy) = (pairs.map(_._1).sum, pairs.map(_._2).sum)
    val sxx = pairs.map(p => p._1 * p._1).sum
    val syy = pairs.map(p => p._2 * p._2).sum
    val sxy = pairs.map(p => p._1 * p._2).sum
    val expect = (n.toDouble * sxy.toDouble - sx.toDouble * sy.toDouble) /
      (math.sqrt(n.toDouble * sxx.toDouble - sx.toDouble * sx.toDouble) *
        math.sqrt(n.toDouble * syy.toDouble - sy.toDouble * sy.toDouble))
    assert(row.getAs[Double]("acf1") == expect,
      "lag-1 Pearson bit-exact: same IEEE ops on identical integer sums")
  }

  test("q205: report ≡ driver-side aggregation of q33's predictions against labels") {
    val rows = run("q205_langid_report").collect()
      .map(r => (r.getAs[String]("lang"), r.getAs[Long]("n_true"),
        r.getAs[Long]("n_pred"), r.getAs[Long]("tp"),
        Option(r.getAs[java.lang.Long]("precision_micro")).map(_.toLong),
        r.getAs[Long]("recall_micro"), r.getAs[Long]("f1_micro"),
        r.getAs[Long]("accuracy_micro"))).sortBy(_._1)
    val preds = run("q33_lang_id").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("pred_lang")).toMap
    val truth = Tables.documents(spark, sf).select("doc_id", "lang")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val pairs = truth.map { case (id, t) => (t, preds(id)) }
    val acc = pairs.count(p => p._1 == p._2).toLong * 1000000L / pairs.length
    assert(rows.map(_._1).toSeq == pairs.map(_._1).distinct.sorted.toSeq)
    rows.foreach { case (c, nT, nP, tp, prec, rec, f1, a) =>
      val eT = pairs.count(_._1 == c).toLong
      val eP = pairs.count(_._2 == c).toLong
      val eTp = pairs.count(p => p._1 == c && p._2 == c).toLong
      assert((nT, nP, tp) == ((eT, eP, eTp)), s"$c: counts")
      assert(prec == (if (eP == 0) None else Some(eTp * 1000000L / eP)),
        s"$c: precision (NULL when the class is never predicted)")
      assert(rec == eTp * 1000000L / eT)
      assert(f1 == 2 * eTp * 1000000L / (eT + eP))
      assert(a == acc)
    }
    // the fixture must exercise the audit's point: some class is
    // never predicted (NULL precision) while accuracy stays > 0
    assert(rows.exists(_._5.isEmpty) && acc > 0L)
  }

  test("q206: yield curve ≡ driver-side TTR bucketing; cumulative masses conserve") {
    val rows = run("q206_quality_yield_curve").collect()
      .map(r => (r.getAs[Long]("ttr_decile"), r.getAs[Long]("n_docs"),
        r.getAs[Long]("n_tokens"), r.getAs[Long]("cum_docs"),
        r.getAs[Long]("cum_tokens"), r.getAs[Long]("kept_mass_micro")))
      .sortBy(_._1)
    val docs = Tables.documents(spark, sf).select("text").collect()
      .map { r =>
        val t = r.getString(0).split(" ", -1)
        (t.length.toLong, t.distinct.length.toLong)
      }
    val buckets = docs.map { case (n, d) =>
      (math.min(9L, d * 1000000L / n / 100000L), n)
    }
    val byB = buckets.groupBy(_._1).view
      .mapValues(v => (v.length.toLong, v.map(_._2).sum)).toMap
    val total = docs.map(_._1).sum
    assert(rows.map(_._1).toSeq == byB.keys.toSeq.sorted)
    rows.foreach { case (b, nD, nT, cD, cT, km) =>
      val (eD, eT) = byB(b)
      assert((nD, nT) == ((eD, eT)), s"bucket $b")
      val kept = byB.filter(_._1 >= b).values
      assert(cD == kept.map(_._1).sum && cT == kept.map(_._2).sum,
        s"bucket $b: cumulative-from-best")
      assert(km == cT * 1000000L / total)
    }
    assert(rows.map(_._3).sum == total, "buckets partition the token mass")
  }

  test("q207: FD audit ≡ driver-side distinct-value fan-out per key") {
    val rows = run("q207_fd_audit").collect()
      .map(r => r.getAs[String]("fd") -> (r.getAs[Long]("n_keys"),
        r.getAs[Long]("n_violating"), r.getAs[Long]("max_fanout"),
        r.getAs[Long]("violation_share_micro"))).toMap
    def audit(pairs: Seq[(String, String)]): (Long, Long, Long, Long) = {
      val g = pairs.groupBy(_._1).view
        .mapValues(_.map(_._2).distinct.length.toLong).toMap
      val nk = g.size.toLong
      val nv = g.values.count(_ > 1).toLong
      (nk, nv, g.values.max, nv * 1000000L / nk)
    }
    val docs = Tables.documents(spark, sf).select("source", "lang")
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    assert(rows("documents: source->lang") == audit(docs))
    val ev = Tables.events(spark, sf).select("user_id", "event_type")
      .collect().map(r => (r.getLong(0).toString, r.getString(1))).toSeq
    assert(rows("events: user_id->event_type") == audit(ev))
    val ord = Tables.orders(spark, sf)
      .select("o_custkey", "o_orderpriority")
      .collect().map(r => (r.getLong(0).toString, r.getString(1))).toSeq
    assert(rows("orders: o_custkey->o_orderpriority") == audit(ord))
    // the audit must find real violations on this fixture (all three
    // candidate FDs are false there — shares within (0, 1])
    assert(rows.values.forall(v => v._4 > 0L && v._4 <= 1000000L))
    assert(rows.values.exists(_._3 > 1L), "some key must truly fan out")
  }

  test("q208: Chapman estimate matches driver-side capture counts; estimator identities hold") {
    val row = run("q208_capture_recapture").collect().head
    val byUser = Tables.events(spark, sf).select("user_id", "event_type")
      .collect().map(r => (r.getLong(0), r.getString(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val n1 = byUser.values.count(_.contains("click")).toLong
    val n2 = byUser.values.count(_.contains("view")).toLong
    val m = byUser.values.count(s => s.contains("click") && s.contains("view")).toLong
    val chapman = (n1 + 1) * (n2 + 1) / (m + 1) - 1
    assert(row.getAs[Long]("n_capture1") == n1)
    assert(row.getAs[Long]("n_capture2") == n2)
    assert(row.getAs[Long]("n_both") == m)
    assert(row.getAs[Long]("n_observed") == byUser.size.toLong)
    assert(row.getAs[Long]("chapman_estimate") == chapman)
    assert(row.getAs[Long]("est_unseen") ==
      math.max(0L, chapman - byUser.size))
    // estimator sanity: N̂ can never fall below the larger capture
    assert(chapman >= math.max(n1, n2))
  }

  test("q209: Good–Turing masses match a driver-side frequency-of-frequencies recompute") {
    val row = run("q209_good_turing").collect().head
    val counts = Tables.documents(spark, sf).select("text").collect()
      .map(_.getString(0).split(" ", -1)).filter(_.length >= 3)
      .flatMap(_.sliding(3).map(_.mkString(" ")))
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val nTok = counts.values.sum
    val n1 = counts.values.count(_ == 1L).toLong
    val n2 = counts.values.count(_ == 2L).toLong
    assert(row.getAs[Long]("n_tokens") == nTok)
    assert(row.getAs[Long]("n_vocab") == counts.size.toLong)
    assert(row.getAs[Long]("n_singletons") == n1)
    assert(row.getAs[Long]("n_doubletons") == n2)
    assert(row.getAs[Long]("unseen_mass_micro") == n1 * 1000000L / nTok)
    assert(row.getAs[Long]("singleton_share_micro") ==
      n1 * 1000000L / counts.size)
    // the trigram domain must actually be open-vocabulary here
    assert(n1 > 0, "no singletons: the unseen-mass estimate is untested")
  }

  test("q200: median, k, and conformal threshold match a driver-side order-statistic recompute") {
    val rows = run("q200_conformal_threshold").collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[Long]("n"),
        r.getAs[Long]("k"), r.getAs[Double]("median_value"),
        r.getAs[Double]("threshold"))).sortBy(_._1)
    val byType = Tables.events(spark, sf)
      .filter(col("value").isNotNull)
      .select("event_type", "event_id", "value").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
      .groupBy(_._1)
    assert(rows.nonEmpty && rows.length == byType.size)
    rows.foreach { case (t, n, k, med, thr) =>
      val vs = byType(t).map { case (_, id, v) => (v, id) }.sorted
      assert(n == vs.length.toLong)
      assert(k == ((n + 1) * 9 + 9) / 10)
      val expectMed = vs(((n + 1) / 2 - 1).toInt)._1
      assert(med == expectMed, s"$t: lower median")
      val scores = byType(t)
        .map { case (_, id, v) => (math.abs(v - expectMed), id) }.sorted
      assert(thr == scores((k - 1).toInt)._1,
        s"$t: k-th smallest nonconformity (bit-exact IEEE subtraction)")
      // the guarantee the threshold exists for: at most ~10% of the
      // calibration scores exceed it
      val above = scores.count(_._1 > thr)
      assert(above <= (n + 9) / 10, s"$t: coverage violated on calibration set")
    }
  }
}
