package graft

import org.apache.spark.sql.functions._

/** Round-10 gates: the multi-probe IVF recall curve (the round-9 verdict's
  * top ask — v10's measured recall@5 = 0.48 at nprobe = 1 needed a tunable
  * repair path), plus regressions for this round's additions.
  */
class Round10Spec extends SparkSpec {

  test("v10b: multi-probe IVF recall curve is monotone, exact at full probe, >=0.9 before it") {
    val rows = graft.queries.VectorQueries.all.find(_.name == "v10b_ivf_nprobe_curve").get
      .fn(spark, sf).collect()
      .map(r => (r.getInt(0), r.getDouble(2), r.getDouble(3)))
      .sortBy(_._1)
    assert(rows.map(_._1).toSeq == Seq(1, 2, 4, 6, 7, 8))

    // recall climbs with nprobe (a flat curve would mean probing is a no-op)
    rows.sliding(2).foreach { case Array((pa, ra, sa), (pb, rb, sb)) =>
      assert(rb >= ra, s"recall must be nondecreasing: nprobe $pa -> $pb went $ra -> $rb")
      assert(sb > sa, s"scanned fraction must grow with nprobe: $pa -> $pb went $sa -> $sb")
    }
    // nprobe = 8 of 8 degrades to brute force: recall is EXACTLY 1.0 (the
    // machinery's sanity anchor, not a float-tolerance check)
    val (_, rFull, _) = rows.last
    assert(rFull == 1.0, s"full-probe recall must be exactly 1.0, got $rFull")
    // the repair the verdict asked for: some nprobe < #cells reaches 0.9
    val repaired = rows.init.filter(_._2 >= 0.9)
    assert(repaired.nonEmpty,
      s"no sub-full nprobe reached recall 0.9: ${rows.mkString(", ")}")
    // and it genuinely prunes: that probe level scans < 95% of the corpus
    assert(repaired.head._3 < 0.95,
      s"the 0.9-recall probe level must still prune, scanned ${repaired.head._3}")
    // single-probe is the honest baseline the curve repairs (isotropic
    // fixture: ~1/8 of the corpus scanned, recall far below 0.9)
    assert(rows.head._2 < 0.9 && rows.head._3 < 0.2)
  }
}
