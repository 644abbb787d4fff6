package graft

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

/**
 * B237 — hidden bucket partitioning (Iceberg partition transforms, bucket
 * v1). The invariants: the source column stays IN the data (queries filter
 * on the real column, never a derived one), point predicates prune to the
 * matching bucket directory, path-granular operations that would be
 * bucket-granular refuse, and the spec machinery (evolution, guards,
 * OPTIMIZE migration) treats the canonical `bucket(n,col)` entry like any
 * other spec.
 */
class HiddenBucketSpec extends GraftSuite {

  private lazy val root = {
    val r = tmpDir("graft_hb")
    spark.conf.set("spark.sql.catalog.ghb", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.ghb.root", r)
    r
  }

  private def freshTable(name: String): String = {
    val _ = root
    spark.sql(s"DROP TABLE IF EXISTS ghb.$name")
    s"ghb.$name"
  }

  private def manifest(name: String) = {
    val dir = new Path(root, name)
    val conf = spark.sessionState.newHadoopConf()
    graft.sources.GraftManifest.load(dir,
      graft.sources.GraftManifest.currentGen(dir, conf), conf)
  }

  /** 200 rows, k 0..199 (every 13th k NULL), v = k*7%101. */
  private def seed(t: String): Unit = {
    import spark.implicits._
    (0L until 200L).map(i =>
        (if (i % 13 == 0) None: Option[Long] else Some(i), i * 7 % 101))
      .toDF("k", "v")
      .writeTo(t).partitionedBy(bucket(8, col("k"))).create()
  }

  test("layout: bucket directories keyed by the canonical transform; source col stays in data") {
    val t = freshTable("lay"); seed(t)
    val m = manifest("lay")
    assert(m.partCols === Seq("bucket(8,k)"))
    assert(m.specUniform)
    val keys = m.entries.map(_._1).distinct.sorted
    assert(keys.length === 9, s"8 buckets + null bucket, got $keys") // 0..7 + null
    assert(keys.forall(_.startsWith("bucket(8,k)=")))
    // The data files carry k — read one file RAW and find the column.
    val fs = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val one = fs.globStatus(new Path(new Path(root, "lay"), "gen-*/bucket(8,k)=3/*.parquet"))
    assert(one.nonEmpty)
    val raw = spark.read.parquet(one.head.getPath.toString)
    assert(raw.columns.contains("k"), "hidden partitioning must keep the source column in data")
    assert(raw.select("k").collect().forall(r => r.getLong(0) % 8 == 3))
  }

  test("point predicates prune to the bucket: other buckets are never opened") {
    val t = freshTable("prune"); seed(t)
    // Vandalize every bucket EXCEPT k=42's (42 % 8 = 2).
    val fs = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val bad = fs.globStatus(new Path(new Path(root, "prune"), "gen-*/bucket(8,k)=*/*.parquet"))
      .filterNot(_.getPath.getParent.getName == "bucket(8,k)=2")
    assert(bad.nonEmpty)
    bad.foreach { st =>
      val out = fs.create(st.getPath, true)
      try out.write("not parquet".getBytes) finally out.close()
    }
    val row = spark.table(t).filter(col("k") === 42L)
      .agg(count(lit(1)), sum(col("v"))).head
    assert(row.getLong(0) === 1L && row.getLong(1) === 42L * 7 % 101)
    // IN across two buckets (42 -> 2, 43 -> 3): 43's bucket is vandalized,
    // so the IN must fail — proving IN pruning keeps exactly its buckets.
    intercept[Exception] {
      spark.table(t).filter(col("k").isin(42L, 43L)).agg(sum(col("v") * col("v"))).collect()
    }
    // And an unfiltered expression aggregate must hit the vandalism.
    intercept[Exception] {
      spark.table(t).agg(sum(col("v") * col("v"))).collect()
    }
  }

  test("IS NULL prunes to the null bucket; IS NOT NULL prunes it away") {
    val t = freshTable("nulls"); seed(t)
    val nNull = spark.table(t).filter(col("k").isNull).count()
    assert(nNull === (0L until 200L).count(_ % 13 == 0))
    // Vandalize the null bucket — IS NOT NULL must never open it.
    val fs = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val nb = fs.globStatus(new Path(new Path(root, "nulls"),
      "gen-*/bucket(8,k)=__HIVE_DEFAULT_PARTITION__/*.parquet"))
    assert(nb.nonEmpty)
    nb.foreach { st =>
      val out = fs.create(st.getPath, true)
      try out.write("x".getBytes) finally out.close()
    }
    val n = spark.table(t).filter(col("k").isNotNull)
      .agg(sum(col("v") * lit(1L))).head.getLong(0)
    assert(n === (0L until 200L).filter(_ % 13 != 0).map(_ * 7 % 101).sum)
  }

  test("guards: source column refuses rename/drop/mask; bucket-granular ops refuse") {
    val t = freshTable("guards"); seed(t)
    assert(intercept[Exception] {
      spark.sql(s"ALTER TABLE $t RENAME COLUMN k TO k2") }
      .getMessage.contains("partition column"))
    assert(intercept[Exception] {
      spark.sql(s"ALTER TABLE $t DROP COLUMN k") }
      .getMessage.contains("partition column"))
    assert(intercept[Exception] {
      spark.sql(s"ALTER TABLE $t SET TBLPROPERTIES('graft.mask.k' = '0')") }
      .getMessage.contains("partition column"))
    import spark.implicits._
    val e = intercept[Exception] {
      Seq((1L, 2L)).toDF("k", "v").writeTo(t).overwritePartitions() }
    assert(e.getMessage.contains("bucket"), e.getMessage)
    assert(intercept[Exception] {
      spark.sql("CALL ghb.system.zorder(table => 'guards', col_x => 'k', col_y => 'v')") }
      .getMessage.contains("bucket"))
  }

  test("row-level DML and full OPTIMIZE work; OPTIMIZE preserves the bucket layout") {
    val t = freshTable("dml"); seed(t)
    spark.sql(s"DELETE FROM $t WHERE v < 10")
    val expect = (0L until 200L).filter(i => i * 7 % 101 >= 10)
    assert(spark.table(t).count() === expect.size)
    spark.sql("CALL ghb.system.optimize(table => 'dml')")
    val m = manifest("dml")
    assert(m.entries.forall(_._1.startsWith("bucket(8,k)=")),
      "full OPTIMIZE must rewrite under the bucket spec")
    assert(spark.table(t).count() === expect.size)
    assert(spark.table(t).filter(col("k") === 42L).count() ===
      (if (42L * 7 % 101 >= 10) 1 else 0))
  }

  test("spec evolution re-buckets metadata-only; OPTIMIZE migrates") {
    val t = freshTable("evo"); seed(t)
    spark.sql("CALL ghb.system.set_partition_spec(table => 'evo', cols => 'bucket(4,k)')")
    import spark.implicits._
    (200L until 240L).map(i => (Some(i): Option[Long], i * 7 % 101)).toDF("k", "v")
      .writeTo(t).append()
    assert(!manifest("evo").specUniform)
    // Reads across both bucket vintages stay exact.
    assert(spark.table(t).filter(col("k") === 42L).count() === 1L)
    assert(spark.table(t).filter(col("k") === 202L).count() === 1L)
    assert(spark.table(t).count() === 240L)
    spark.sql("CALL ghb.system.optimize(table => 'evo')")
    val m = manifest("evo")
    assert(m.specUniform && m.entries.forall(_._1.startsWith("bucket(4,k)=")))
    assert(spark.table(t).count() === 240L)
  }

  test("validation: non-integral source and bad counts refuse") {
    import spark.implicits._
    val t = freshTable("valid")
    intercept[Exception] {
      Seq(("a", 1L)).toDF("s", "v").writeTo(t)
        .partitionedBy(bucket(8, col("s"))).create()
    }
    Seq((1L, 1L)).toDF("k", "v").writeTo(t).create()
    assert(intercept[Exception] {
      spark.sql("CALL ghb.system.set_partition_spec(table => 'valid', cols => 'bucket(0,k)')")
    }.getMessage.contains("positive"))
  }
}
