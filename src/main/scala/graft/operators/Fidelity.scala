package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The reference's one hard-coded query (SURVEY.md §0):
  *
  *   SELECT d.donor_state, SUM(dn.amount)
  *   FROM donations dn JOIN donors d USING (donor_id)
  *   GROUP BY d.donor_state
  *
  * plus its strict-FK variant: the reference *throws* on a donation whose
  * donor is missing (`/root/reference/D/Program.cs:310`,
  * KeyNotFoundException) — integrity asserted, not filtered.
  */
object Fidelity {

  /** Inner-join + group-sum, the reference's O11-O14 pipeline. On Spark the
    * donor dimension broadcasts when small; at scale both sides hash-shuffle
    * on donor_id — exactly the reference's range shuffle (O8/O9) chosen
    * adaptively instead of by hand.
    */
  def donationTotalByState(donors: DataFrame, donations: DataFrame): DataFrame =
    donations
      .join(donors, Seq("donor_id"))
      .groupBy($"donor_state")
      .agg(round(sum($"amount"), 2).as("total"))
      .orderBy($"donor_state")

  /** Strict variant (O12): any orphan donation fails the job, mirroring the
    * reference's throw. Left join + raise_error keeps the plan fully
    * codegen'd until the error branch fires.
    *
    * Orphan detection uses an explicit match sentinel, NOT
    * `donor_state IS NULL`: a donor row whose state *field* is blank also
    * yields a null state after the join, and the reference throws only on a
    * missing donor_id key (`D/Program.cs:310`) — a blank state is a
    * legitimate group value there, so it must be here too.
    */
  def donationTotalByStateStrict(donors: DataFrame, donations: DataFrame): DataFrame =
    donations
      .join(donors.withColumn("_matched", lit(true)), Seq("donor_id"), "left_outer")
      .select(
        when($"_matched".isNull,
          raise_error(concat(lit("orphan donation: donor_id="), $"donor_id")))
          .otherwise($"donor_state").as("donor_state"),
        $"amount")
      .groupBy($"donor_state")
      .agg(round(sum($"amount"), 2).as("total"))
      .orderBy($"donor_state")

  /** O8/O9 made explicit: range-repartition both sides by the join key so
    * the join is co-partitioned — the declarative analog of the reference's
    * cutoff-vector shuffle (`D/Program.cs:63-149`). Rarely needed (Catalyst
    * inserts the right Exchange itself); exposed for tests and for reuse of
    * one partitioning across stages.
    */
  def rangeCoPartition(donors: DataFrame, donations: DataFrame, partitions: Int)
      : (DataFrame, DataFrame) =
    (donors.repartitionByRange(partitions, $"donor_id"),
     donations.repartitionByRange(partitions, $"donor_id"))
}
