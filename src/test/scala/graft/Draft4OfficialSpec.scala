package graft

import graft.compile.ValidatorOptions
import graft.json._
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions.col

/** Reconstruction of the official JSON-Schema-Test-Suite draft-4 corpus —
  * the reference's primary conformance instrument
  * (/root/reference/test/x-draft4-test-suite.js:4,120-135 walks every
  * JSON file under tests/draft4 of the pinned
  * `json-schema-test-suite@0.0.10`, excluding only
  * `optional/zeroTerminatedFloats`, and maps the suite's
  * localhost:1234 remotes to local fixtures).
  *
  * The suite itself is not vendorable in this sandbox (no package cache,
  * no egress), so `src/test/resources/draft4_official/` carries a
  * from-scratch reconstruction of the suite's draft-4 files: same file
  * names, group structure, schemas, and expected verdicts, re-authored
  * from the published suite's public content. Where the engine's typed
  * data model cannot carry a case it is either re-typed with the same
  * discriminating power (tuple-items groups re-typed homogeneous,
  * required-presence payloads using 0 instead of null — each marked with
  * a `note` on the group) or skipped and counted ([[Draft4Harness]]
  * limits: heterogeneous arrays, >Long whole numbers).
  *
  * Exclusion list (vs the reference's single `zeroTerminatedFloats`):
  *  - `optional/zeroTerminatedFloats` — excluded by the reference too;
  *  - `optional/bignum` — whole numbers past 2^63 have no Spark column
  *    type (JS doubles silently lose the same precision).
  * Per-case skips: currently ZERO (the coverage test bounds any that a
  * future fixture edit introduces).
  *
  * Fidelity audit (r7): every group name in the published draft-4
  * suite's canonical per-file inventory was re-checked against the
  * reconstruction; gaps closed this round: enum's four array-form
  * boolean/number groups ([false]≠[0] etc.), uniqueItems' three
  * false/tuple-items/additionalItems variants, ref's RFC 6901
  * empty-token pointer group, items/additionalItems null-instance-
  * element groups, additionalItems' starting-index group (re-typed
  * homogeneous, note on the group), and oneOf's missing-optional-
  * property group — 160 groups / 588 cases total. Known remaining
  * deltas, all outside the reference runner's reach: refRemote groups
  * that need remotes beyond the three the reference maps
  * (x-draft4-test-suite.js:17-20 — e.g. subSchemas-defs.json,
  * locationIndependentIdentifier*.json), and post-draft-4 keyword
  * groups the suite backported for other drafts.
  *
  * EVERY representable case runs FOUR ways — v1 Column tree and v2 fused
  * kernel, greedy and non-greedy — asserting the expected verdict in
  * each and v1/v2 error-array parity per mode (the official suite only
  * asserts `valid`; the parity assertion is this engine's stricter
  * internal contract, KernelParitySpec's discipline applied to the whole
  * suite).
  */
class Draft4OfficialSpec extends SparkSpec with Draft4Harness {

  private val files = Seq(
    "additionalItems", "additionalProperties", "allOf", "anyOf", "default",
    "definitions", "dependencies", "enum", "items", "maxItems", "maxLength",
    "maxProperties", "maximum", "minItems", "minLength", "minProperties",
    "minimum", "multipleOf", "not", "oneOf", "pattern", "patternProperties",
    "properties", "ref", "refRemote", "required", "type", "uniqueItems",
    "optional/format")

  // swept totals, asserted by the final coverage test (object init order:
  // per-file tests register first, the coverage test runs last)
  private var ran = 0
  private var skips = Vector.empty[String]

  files.foreach { f =>
    test(s"official draft-4 suite: ${f.replace('/', '_')}") {
      val groups = loadFixture("draft4_official", f)
      assert(groups.nonEmpty)
      groups.foreach { g =>
        val desc = g.str("description").getOrElse("?")
        val schema = g.obj("schema").getOrElse(fail(s"$f/$desc: no schema"))
        val registry = g.obj("schemas") // per-group remote-ref fixtures
        val tests = g.arr("tests").getOrElse(fail(s"$f/$desc: no tests"))
        tests.collect { case t: JObj => t }.foreach { t =>
          val tdesc = t.str("description").getOrElse("?")
          val data = t.get("data").getOrElse(JNull)
          val expect = t.bool("valid").getOrElse(fail(s"$f/$desc/$tdesc: no valid"))
          val dt =
            try inferType(data)
            catch {
              case Draft4Harness.Unrepresentable(reason) =>
                skips :+= s"$f / $desc / $tdesc ($reason)"
                null
            }
          if (dt != null) {
            val df = valueDf(toValue(data, dt), dt)
            val specJson = Json.render(schema)
            // 4 configurations in ONE projection/job per case
            val cols = for {
              greedy <- Seq(true, false)
              fused <- Seq(false, true)
            } yield {
              val v = Validator(specJson, ValidatorOptions(
                greedy = greedy, useFusedErrors = fused, schemas = registry))
              v.forValue(df.col("x"), dt)
            }
            val row = df.select(cols.zipWithIndex.flatMap { case ((v, e), i) =>
              Seq(v.as(s"v$i"), e.as(s"e$i")) }: _*).head()
            for (i <- 0 until 4) {
              val mode = Seq("greedy/v1", "greedy/v2", "first/v1", "first/v2")(i)
              assert(row.getBoolean(2 * i) == expect,
                s"[$f] $desc / $tdesc [$mode]: got ${row.getBoolean(2 * i)} want $expect")
            }
            // v1/v2 error-array parity per mode (byte-identical records)
            def errs(i: Int) = row.getSeq[Row](2 * i + 1)
              .map(r => (r.getString(0), r.getString(1), r.getString(2), r.getString(3)))
            assert(errs(0) == errs(1),
              s"[$f] $desc / $tdesc: greedy v1/v2 diverge:\n  ${errs(0)}\n  ${errs(1)}")
            assert(errs(2) == errs(3),
              s"[$f] $desc / $tdesc: non-greedy v1/v2 diverge:\n  ${errs(2)}\n  ${errs(3)}")
            ran += 1
          }
        }
      }
    }
  }

  test("official draft-4 suite: coverage floor and bounded exclusions") {
    info(s"ran $ran cases x 4 configurations; skipped ${skips.size}")
    skips.foreach(s => info(s"  skipped: $s"))
    assert(ran >= 588, s"suite coverage floor: ran only $ran cases")
    assert(skips.isEmpty,
      s"unrepresentable-case budget exceeded:\n${skips.mkString("\n")}")
  }
}
