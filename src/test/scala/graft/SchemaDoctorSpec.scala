package graft

import graft.tools.SchemaDoctor

/** Testdata schema tripwire (see SchemaDoctor's scaladoc): when the
  * driver regenerates /root/testdata with a changed physical schema,
  * THIS is the spec that should fail — with a message naming the table
  * and both schema forms — instead of a scatter of downstream
  * type-mismatch analysis errors pointing nowhere near the cause. */
class SchemaDoctorSpec extends SparkSpec {

  test("raw testdata parquet schemas match the committed baseline (tools/schemas.txt)") {
    val base = SchemaDoctor.baseline()
    assert(base.nonEmpty, s"missing ${SchemaDoctor.baselinePath()}; run " +
      "`runMain graft.tools.SchemaDoctor /root/testdata/sf0.001 --write` to create it")
    val drift = SchemaDoctor.diff(base.get, SchemaDoctor.snapshot(spark, Sf0001))
    assert(drift.isEmpty,
      s"""TESTDATA SCHEMA DRIFT — the driver regenerated /root/testdata with a new
         |physical schema. Adapt graft.Tables' loader for the changed table(s)
         |(see Tables.events for the schema-adaptive pattern), re-baseline via
         |`runMain graft.tools.SchemaDoctor /root/testdata/sf0.001 --write`,
         |and re-run the full suite. Drift:
         |$drift""".stripMargin)
  }
}
