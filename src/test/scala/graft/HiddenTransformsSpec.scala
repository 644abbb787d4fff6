package graft

import java.sql.Timestamp

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

/**
 * B237 extension — hidden `days(ts)` / `truncate(w,col)` partition
 * transforms (the rest of the Iceberg transform set after bucket). The
 * invariants mirror HiddenBucketSpec: the source column stays IN the data,
 * predicates on the source prune to the derived directories (proved by
 * VANDALIZING every directory the plan must not open), nulls route to the
 * null directory, the spec machinery (evolution, guards, OPTIMIZE) treats
 * the canonical string like any other entry, and the mask-vs-path guard
 * covers the new transforms' sources.
 */
class HiddenTransformsSpec extends GraftSuite {

  private lazy val root = {
    val r = tmpDir("graft_ht")
    spark.conf.set("spark.sql.catalog.ght", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.ght.root", r)
    r
  }

  private def freshTable(name: String): String = {
    val _ = root
    spark.sql(s"DROP TABLE IF EXISTS ght.$name")
    s"ght.$name"
  }

  private def manifest(name: String) = {
    val dir = new Path(root, name)
    val conf = spark.sessionState.newHadoopConf()
    graft.sources.GraftManifest.load(dir,
      graft.sources.GraftManifest.currentGen(dir, conf), conf)
  }

  private def fs = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Overwrite every data file outside `keepDirs` with garbage — any scan
    * that opens one fails loudly, which is what makes the pruning pins
    * vandalism-proof rather than plan-string trusting. */
  private def vandalizeExcept(table: String, keepDirs: Set[String]): Int = {
    val bad = fs.globStatus(new Path(new Path(root, table), "gen-*/*/*.parquet"))
      .filterNot(st => keepDirs.contains(st.getPath.getParent.getName))
    bad.foreach { st =>
      val out = fs.create(st.getPath, true)
      try out.write("not parquet".getBytes) finally out.close()
    }
    bad.length
  }

  /** 200 rows over 10 days (20/day, every 13th ts NULL): ts = day*86400s +
    * (i%20)*1000s, v = i. Day ordinals are 19723 + 0..9 (2024-01-01 base). */
  private val Day0 = 19723L // 2024-01-01
  private def seedDays(t: String): Unit = {
    import spark.implicits._
    (0L until 200L).map { i =>
      val ts = if (i % 13 == 0) None
      else Some(new Timestamp(((Day0 + i / 20) * 86400L + (i % 20) * 1000L) * 1000L))
      (ts, i)
    }.toDF("ts", "v").writeTo(t).partitionedBy(days(col("ts"))).create()
  }

  test("days layout: directories keyed by the canonical transform; ts stays in data") {
    val t = freshTable("dlay"); seedDays(t)
    val m = manifest("dlay")
    assert(m.partCols === Seq("days(ts)"))
    assert(m.specUniform)
    val keys = m.entries.map(_._1).distinct.sorted
    assert(keys.length === 11, s"10 day dirs + null dir, got $keys")
    assert(keys.forall(_.startsWith("days(ts)=")))
    val one = fs.globStatus(
      new Path(new Path(root, "dlay"), s"gen-*/days(ts)=${Day0 + 3}/*.parquet"))
    assert(one.nonEmpty)
    val raw = spark.read.parquet(one.head.getPath.toString)
    assert(raw.columns.contains("ts"), "hidden partitioning must keep the source column in data")
  }

  test("days: time-RANGE predicates prune to the covered day directories (vandalism-proof)") {
    val t = freshTable("drange"); seedDays(t)
    // Keep ONLY days 3 and 4 readable; everything else is garbage.
    val n = vandalizeExcept("drange",
      Set(s"days(ts)=${Day0 + 3}", s"days(ts)=${Day0 + 4}"))
    assert(n >= 9)
    val lo = new Timestamp((Day0 + 3) * 86400L * 1000L)          // day-3 midnight
    val hi = new Timestamp((Day0 + 5) * 86400L * 1000L)          // day-5 midnight
    // ts >= day3 AND ts < day5 (exact boundaries): must open days 3-4 ONLY —
    // the boundary-exact LessThan drops day 5 too (it is vandalized).
    val got = spark.table(t)
      .filter(col("ts") >= lit(lo) && col("ts") < lit(hi))
      .agg(count(lit(1)), sum(col("v"))).head()
    val expect = (0L until 200L).filter(i => i % 13 != 0 && i / 20 >= 3 && i / 20 <= 4)
    assert(got.getLong(0) === expect.size.toLong)
    assert(got.getLong(1) === expect.sum)
    // A range reaching one vandalized day must fail — pruning keeps exactly
    // its days, never silently more or fewer.
    intercept[Exception] {
      spark.table(t).filter(col("ts") >= lit(lo) &&
        col("ts") < lit(new Timestamp(((Day0 + 5) * 86400L + 1L) * 1000L)))
        .agg(sum(col("v") * col("v"))).collect()
    }
    // Point equality prunes to one day.
    val mid = new Timestamp(((Day0 + 4) * 86400L + 5000L) * 1000L) // i=105-ish
    assert(spark.table(t).filter(col("ts") === lit(mid)).count() === 1L)
  }

  test("days: IS NULL routes to the null dir; IS NOT NULL prunes it away") {
    val t = freshTable("dnull"); seedDays(t)
    assert(spark.table(t).filter(col("ts").isNull).count() ===
      (0L until 200L).count(_ % 13 == 0).toLong)
    val n = vandalizeExcept("dnull",
      (0L until 10L).map(d => s"days(ts)=${Day0 + d}").toSet)
    assert(n === 1) // exactly the null dir
    val sumV = spark.table(t).filter(col("ts").isNotNull)
      .agg(sum(col("v"))).head().getLong(0)
    assert(sumV === (0L until 200L).filter(_ % 13 != 0).sum)
  }

  test("truncate(int): SQL DDL creation, bin layout, equality + RANGE pruning (vandalism-proof)") {
    val t = freshTable("tlong")
    spark.sql(s"CREATE TABLE $t PARTITIONED BY (truncate(100, k)) AS " +
      "SELECT CASE WHEN id % 11 = 0 THEN NULL ELSE id * 10 END AS k, id AS v " +
      "FROM range(120)")
    val m = manifest("tlong")
    assert(m.partCols === Seq("truncate(100,k)"))
    val keys = m.entries.map(_._1).distinct
    assert(keys.forall(_.startsWith("truncate(100,k)=")))
    // k in 0..1190 step 10 -> bins 0,100,...,1100 (12) + null dir.
    assert(keys.length === 13, s"12 bins + null dir, got ${keys.sorted}")
    // Keep only bins 300 and 400; equality and the covering range must work.
    val n = vandalizeExcept("tlong", Set("truncate(100,k)=300", "truncate(100,k)=400"))
    assert(n >= 10)
    assert(spark.table(t).filter(col("k") === 350L).count() === 1L)
    val got = spark.table(t).filter(col("k") >= 300L && col("k") < 500L)
      .agg(count(lit(1)), sum(col("v"))).head()
    val expect = (0L until 120L).filter(i => i % 11 != 0 && i * 10 >= 300 && i * 10 < 500)
    assert(got.getLong(0) === expect.size.toLong)
    assert(got.getLong(1) === expect.sum)
    // One past the bin edge must hit the vandalism (bin 500 opens).
    intercept[Exception] {
      spark.table(t).filter(col("k") >= 300L && col("k") <= 500L)
        .agg(sum(col("v") * col("v"))).collect()
    }
  }

  test("truncate near Long.MinValue saturates: range predicates keep the lowest bin") {
    // v - floorMod(v,w) underflows for v within w-1 of Long.MinValue; a
    // wrapped (huge positive) directory key would be dropped by `k < 0`
    // range pruning — rows silently vanishing. truncLong saturates the bin
    // floor at Long.MinValue identically in writer, pruner, and function.
    val t = freshTable("tsat")
    spark.sql(s"CREATE TABLE $t PARTITIONED BY (truncate(10, k)) AS " +
      s"SELECT k, CAST(1 AS BIGINT) AS v FROM VALUES " +
      s"(CAST(${Long.MinValue} AS BIGINT)), (CAST(${Long.MinValue + 3L} AS BIGINT)), " +
      s"(CAST(-5 AS BIGINT)), (CAST(7 AS BIGINT)) AS t(k)")
    val keys = manifest("tsat").entries.map(_._1).distinct.sorted
    assert(keys.exists(_ == s"truncate(10,k)=${Long.MinValue}"),
      s"saturated lowest bin expected, got $keys")
    assert(!keys.exists(_.contains("9223372036854775806")),
      s"wrapped positive bin key must not exist: $keys")
    // The range read that a wrapped key would lose rows from:
    assert(spark.table(t).filter(col("k") < 0L).count() === 3L)
    // Equality probes agree with the saturated layout on both sides.
    assert(spark.table(t).filter(col("k") === Long.MinValue).count() === 1L)
    assert(spark.table(t).filter(col("k") === (Long.MinValue + 3L)).count() === 1L)
    assert(graft.sources.GraftTransforms.truncLong(Long.MinValue, 10) === Long.MinValue)
    assert(graft.sources.GraftTransforms.truncLong(Long.MinValue + 3L, 10) === Long.MinValue)
  }

  test("catalog truncate/temporal functions answer in Long, matching directory keys") {
    // An INT column's bin floor can lie below Int.MinValue (the writer's
    // directory key is the Long-space floor) — the catalog function must
    // answer the SAME value, not a narrowed wrap.
    import org.apache.spark.sql.types._
    import org.apache.spark.sql.catalyst.InternalRow
    val f = graft.sources.GraftTruncateFunction.bind(
      StructType(Seq(StructField("w", IntegerType), StructField("v", IntegerType))))
      .asInstanceOf[org.apache.spark.sql.connector.catalog.functions.ScalarFunction[AnyRef]]
    assert(f.resultType() === LongType)
    val got = f.produceResult(InternalRow(1000, Int.MinValue))
    assert(got === java.lang.Long.valueOf(-2147484000L),
      s"expected the writer's Long-space floor, got $got")
    // hours ordinal past Int range: year ~246953 — Long result carries it.
    val h = graft.sources.GraftTemporalFunction("hours").bind(
      StructType(Seq(StructField("ts", TimestampType))))
      .asInstanceOf[org.apache.spark.sql.connector.catalog.functions.ScalarFunction[java.lang.Long]]
    assert(h.resultType() === LongType)
    val farMicros = 9000000000000000000L // ~year 287000
    assert(h.produceResult(InternalRow(farMicros)) ===
      java.lang.Long.valueOf(farMicros / 3600000000L))
  }

  test("truncate(string): prefix layout, equality + StartsWith pruning (vandalism-proof)") {
    val t = freshTable("tstr")
    spark.sql(s"CREATE TABLE $t PARTITIONED BY (truncate(2, s)) AS " +
      "SELECT concat(CASE WHEN id % 3 = 0 THEN 'aa' WHEN id % 3 = 1 THEN 'ab' " +
      "ELSE 'bc' END, CAST(id AS STRING)) AS s, id AS v FROM range(90)")
    val m = manifest("tstr")
    assert(m.entries.map(_._1).distinct.sorted ===
      Seq("truncate(2,s)=aa", "truncate(2,s)=ab", "truncate(2,s)=bc"))
    val n = vandalizeExcept("tstr", Set("truncate(2,s)=ab"))
    assert(n === 2)
    // Equality prunes to s's own prefix dir.
    assert(spark.table(t).filter(col("s") === "ab1").count() === 1L)
    // StartsWith longer than the width prunes to prefix.take(2).
    val c1 = spark.table(t).filter(col("s").startsWith("ab1"))
      .agg(count(lit(1))).head().getLong(0)
    assert(c1 === (0L until 90L).count(i => i % 3 == 1 && i.toString.startsWith("1")).toLong)
    // StartsWith shorter than the width keeps every matching prefix dir —
    // 'a' spans aa+ab, and aa is vandalized, so this must fail.
    intercept[Exception] {
      spark.table(t).filter(col("s").startsWith("a"))
        .agg(sum(col("v") * col("v"))).collect()
    }
  }

  test("hours/months/years: calendar layout and range pruning (vandalism-proof)") {
    // 40 rows over 2024-01-15 .. 2025-02-27 in 10.3-day steps: spans 14
    // calendar months across 2 years, several hours within the first day.
    val t = freshTable("cal")
    spark.sql(s"CREATE TABLE $t PARTITIONED BY (months(ts)) AS " +
      "SELECT timestamp'2024-01-15 00:00:00' + make_interval(0,0,0,0," +
      "CAST(id * 247 AS INT),0,0) AS ts, id AS v FROM range(40)")
    val m = manifest("cal")
    assert(m.partCols === Seq("months(ts)"))
    val keys = m.entries.map(_._1).distinct.sorted
    assert(keys.forall(_.startsWith("months(ts)=")))
    // months ordinal: Jan-2024 = (2024-1970)*12 + 0 = 648.
    assert(keys.contains("months(ts)=648"), keys.mkString(","))
    // Keep only Mar+Apr 2024 (650, 651); a month-range query must not open
    // the vandalized rest, and the boundary-exact upper bound drops May.
    val n = vandalizeExcept("cal", Set("months(ts)=650", "months(ts)=651"))
    assert(n >= 5)
    val got = spark.table(t).filter(
      expr("ts >= timestamp'2024-03-01 00:00:00' AND " +
        "ts < timestamp'2024-05-01 00:00:00'"))
      .agg(count(lit(1)), sum(col("v"))).head()
    assert(got.getLong(0) > 0)
    intercept[Exception] { // reaching one hour past the boundary opens May
      spark.table(t).filter(
        expr("ts >= timestamp'2024-03-01 00:00:00' AND " +
          "ts < timestamp'2024-05-01 01:00:00'"))
        .agg(sum(col("v") * col("v"))).collect()
    }
    // years twin: one metadata-only evolution, append, cross-vintage count.
    spark.sql("CALL ght.system.set_partition_spec(table => 'cal', cols => 'years(ts)')")
    spark.sql(s"INSERT INTO $t SELECT timestamp'2026-06-01 12:00:00' AS ts, " +
      "id + 100 AS v FROM range(3)")
    val after = manifest("cal")
    assert(after.entries.exists(_._1 == "years(ts)=56")) // 2026 - 1970
    // hours: DATE source refuses; TIMESTAMP works with hour-granular dirs.
    val h = freshTable("hrs")
    spark.sql(s"CREATE TABLE $h PARTITIONED BY (hours(ts)) AS " +
      "SELECT timestamp'2024-01-01 00:30:00' + make_interval(0,0,0,0," +
      "CAST(id AS INT),0,0) AS ts, id AS v FROM range(6)")
    val hm = manifest("hrs")
    // 2024-01-01 00:30 UTC = epoch hour 473352.
    assert(hm.entries.map(_._1).distinct.sorted.head === "hours(ts)=473352",
      hm.entries.map(_._1).distinct.sorted.mkString(","))
    assert(spark.table(h).filter(
      expr("ts >= timestamp'2024-01-01 02:00:00' AND " +
        "ts < timestamp'2024-01-01 04:00:00'")).count() === 2L)
    intercept[Exception] {
      spark.sql("CALL ght.system.set_partition_spec(table => 'hrs', cols => 'hours(v)')")
    }
  }

  test("validation: wrong source types and bad widths refuse at CREATE / evolution") {
    import spark.implicits._
    val t = freshTable("tval")
    intercept[Exception] { // days over a non-temporal source
      Seq((1L, 1L)).toDF("k", "v").writeTo(t).partitionedBy(days(col("k"))).create()
    }
    intercept[Exception] { // truncate over DOUBLE
      spark.sql(s"CREATE TABLE $t PARTITIONED BY (truncate(2, x)) AS " +
        "SELECT CAST(id AS DOUBLE) AS x, id AS v FROM range(5)")
    }
    spark.sql(s"DROP TABLE IF EXISTS ght.tval")
    Seq((new Timestamp(0L), 1L)).toDF("ts", "v").writeTo(t).create()
    assert(intercept[Exception] {
      spark.sql("CALL ght.system.set_partition_spec(table => 'tval', cols => 'truncate(0,v)')")
    }.getMessage.contains("positive"))
    assert(intercept[Exception] {
      spark.sql("CALL ght.system.set_partition_spec(table => 'tval', cols => 'days(v)')")
    }.getMessage.contains("TIMESTAMP or DATE"))
  }

  test("spec evolution onto days/truncate is metadata-only; reads span vintages") {
    val t = freshTable("tevo")
    spark.sql(s"CREATE TABLE $t AS SELECT timestamp'2024-01-01 12:00:00' + " +
      "make_interval(0,0,0,CAST(id AS INT),0,0,0) AS ts, id AS v FROM range(10)")
    spark.sql("CALL ght.system.set_partition_spec(table => 'tevo', cols => 'days(ts)')")
    spark.sql(s"INSERT INTO $t SELECT timestamp'2024-03-01 12:00:00' + " +
      "make_interval(0,0,0,CAST(id AS INT),0,0,0) AS ts, id + 100 AS v FROM range(10)")
    assert(!manifest("tevo").specUniform)
    assert(spark.table(t).count() === 20L)
    // The new vintage's day dirs exist; the old files keep their layout.
    val m = manifest("tevo")
    assert(m.entries.exists(_._1.startsWith("days(ts)=")))
    spark.sql("CALL ght.system.optimize(table => 'tevo')")
    val after = manifest("tevo")
    assert(after.specUniform && after.entries.forall(_._1.startsWith("days(ts)=")))
    assert(spark.table(t).count() === 20L)
  }

  test("mask-vs-path guard covers days/truncate sources; overwrite guards fire") {
    val t = freshTable("tguard")
    spark.sql(s"CREATE TABLE $t PARTITIONED BY (days(ts)) AS " +
      "SELECT timestamp'2024-01-01 00:00:00' AS ts, id AS v FROM range(5)")
    // Masking the SOURCE column would bake raw values into directory names.
    assert(intercept[Exception] {
      spark.sql(s"ALTER TABLE $t SET TBLPROPERTIES" +
        "('graft.mask.ts' = 'CAST(NULL AS TIMESTAMP)')")
    }.getMessage.contains("partition column"))
    // Evolving a masked column's table onto a transform of it refuses too.
    val u = freshTable("tguard2")
    spark.sql(s"CREATE TABLE $u AS SELECT timestamp'2024-01-01 00:00:00' AS ts, " +
      "id AS v FROM range(5)")
    spark.sql(s"ALTER TABLE $u SET TBLPROPERTIES" +
      "('graft.mask.ts' = 'CAST(NULL AS TIMESTAMP)')")
    assert(intercept[Exception] {
      spark.sql("CALL ght.system.set_partition_spec(table => 'tguard2', cols => 'days(ts)')")
    }.getMessage.contains("masked"))
    // Dynamic overwrite refuses on a transform-partitioned table.
    import spark.implicits._
    val e = intercept[Exception] {
      Seq((new Timestamp(0L), 9L)).toDF("ts", "v").writeTo(t).overwritePartitions()
    }
    assert(e.getMessage.contains("transform-partitioned"), e.getMessage)
    // Static overwrite on the SOURCE column steers to replaceWhere.
    val e2 = intercept[Exception] {
      Seq((new Timestamp(0L), 9L)).toDF("ts", "v").writeTo(t)
        .overwrite(col("ts") === lit(new Timestamp(0L)))
    }
    assert(e2.getMessage.contains("replaceWhere"), e2.getMessage)
    assert(e2.getMessage.contains("SOURCE"), e2.getMessage)
  }
}
