package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.gold.{Erasure, SnapshotStore}

/** Right-to-erasure semantics: subject rows physically gone (including
  * retired snapshot generations), bystanders bit-identical, untouched
  * partitions' files never rewritten, all-erased partitions removed,
  * receipts exact including zeros, null keys never erased.
  */
class ErasureSpec extends SparkSpec {
  import spark.implicits._

  private def table(): DataFrame = Seq(
    (1L, 101L, "2024-01-01", 10.0),
    (2L, 102L, "2024-01-01", 20.0),
    (3L, 101L, "2024-01-02", 30.0),
    (4L, 101L, "2024-01-03", 40.0), // 101 is the ONLY user on day 3
    (5L, 103L, "2024-01-02", 50.0)
  ).toDF("row_id", "user_id", "day", "amount")

  private def nRowsUnder(dir: java.io.File): Int =
    Option(dir.listFiles()).map(_.length).getOrElse(0)

  test("partitioned erasure: subjects gone, bystanders intact, receipts exact") {
    val root = tmpDir("erase-part") + "/t"
    table().write.partitionBy("day").parquet(root)
    val receipt = Erasure.erasePartitioned(spark, root, "day", "user_id",
      Seq(101L, 999L).toDF("user_id"))
    val back = spark.read.parquet(root)
    assert(back.filter($"user_id" === 101L).isEmpty, "subject rows survived")
    assert(back.count() == 2)
    assert(back.filter($"row_id" === 2L && $"amount" === 20.0).count() == 1)
    // receipt: 3 rows for 101, explicit 0 for the unknown subject
    val r = receipt.collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(r == Map(101L -> 3L, 999L -> 0L))
    // the all-101 partition day=2024-01-03 must be deleted outright
    assert(!new java.io.File(s"$root/day=2024-01-03").exists(),
      "all-erased partition directory survived")
  }

  test("partitioned erasure: untouched partitions' files are never rewritten") {
    val root = tmpDir("erase-files") + "/t"
    table().write.partitionBy("day").parquet(root)
    val d1 = new java.io.File(s"$root/day=2024-01-01")
    val before = d1.listFiles().map(f => f.getName -> f.lastModified()).toMap
    // subject 103 lives only in day=2024-01-02
    Erasure.erasePartitioned(spark, root, "day", "user_id",
      Seq(103L).toDF("user_id"))
    val after = d1.listFiles().map(f => f.getName -> f.lastModified()).toMap
    assert(after == before, "untouched partition was rewritten")
    assert(spark.read.parquet(root).filter($"user_id" === 103L).isEmpty)
  }

  test("partitioned erasure: null-keyed rows are always retained") {
    val root = tmpDir("erase-null") + "/t"
    Seq((1L, Some(101L), "2024-01-01"), (2L, Option.empty[Long], "2024-01-01"))
      .toDF("row_id", "user_id", "day")
      .write.partitionBy("day").parquet(root)
    Erasure.erasePartitioned(spark, root, "day", "user_id",
      Seq(101L).toDF("user_id"))
    val back = spark.read.parquet(root)
    assert(back.count() == 1 && back.head().getLong(0) == 2L,
      "null-keyed bystander must survive")
  }

  test("partitioned erasure: no subject present anywhere is a no-op") {
    val root = tmpDir("erase-noop") + "/t"
    table().write.partitionBy("day").parquet(root)
    val allFiles = new java.io.File(root).listFiles()
      .filter(_.isDirectory)
      .flatMap(d => d.listFiles().map(f => f.getPath -> f.lastModified())).toMap
    val receipt = Erasure.erasePartitioned(spark, root, "day", "user_id",
      Seq(777L).toDF("user_id"))
    assert(receipt.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap ==
      Map(777L -> 0L))
    val after = new java.io.File(root).listFiles()
      .filter(_.isDirectory)
      .flatMap(d => d.listFiles().map(f => f.getPath -> f.lastModified())).toMap
    assert(after == allFiles, "no-op erasure rewrote files")
  }

  test("snapshot erasure: atomic flip, retired generations physically vacuumed") {
    val root = tmpDir("erase-snap") + "/t"
    SnapshotStore.publish(table(), root)
    // build some history so retention would normally keep a generation
    SnapshotStore.publish(table(), root)
    val receipt = Erasure.eraseSnapshot(spark, root, "user_id",
      Seq(101L).toDF("user_id"))
    assert(receipt.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap ==
      Map(101L -> 3L))
    val back = SnapshotStore.read(spark, root)
    assert(back.filter($"user_id" === 101L).isEmpty && back.count() == 2)
    // only the committed generation's directory may remain — the bytes of
    // every pre-erasure generation are gone
    val gens = new java.io.File(root).listFiles()
      .map(_.getName).filter(_.startsWith("gen=")).toSeq
    val cur = SnapshotStore.currentGen(spark, root).get
    assert(gens == Seq(s"gen=$cur"),
      s"retired generations survived the vacuum: $gens")
  }

  test("coordinated erasure: one atomic flip across dim, fact, and delta-fact members") {
    import graft.gold.{BaseDelta, MultiSnapshot}
    val root = tmpDir("erase-coord") + "/r"
    val dim = Seq((1L, "alice"), (2L, "bob"), (3L, "carol"))
      .toDF("customer_id", "name")
    val orders = Seq((10L, 1L), (11L, 2L), (12L, 2L), (13L, 3L))
      .toDF("order_id", "customer_id")
    val audit = Seq((1L, "x")).toDF("audit_id", "note") // no subject column
    MultiSnapshot.publish(spark, root, Map(
      "customers" -> dim, "orders" -> orders, "audit" -> audit))
    // an O(batch) fact member committed by pointer
    val dt = BaseDelta.Table(s"$root/_delta/txns", Seq("txn_id"),
      Seq("seq"), None)
    BaseDelta.append(spark, dt,
      Seq((100L, 1L, 1L), (101L, 2L, 2L), (102L, 3L, 3L), (103L, 2L, 4L))
        .toDF("txn_id", "customer_id", "seq"), 0L)
    MultiSnapshot.publish(spark, root, Map.empty[String, org.apache.spark.sql.DataFrame],
      pointers = Map("txns" -> 0L))

    val receipts = graft.gold.Erasure.eraseCoordinated(spark, root,
      keyCols = Map("customers" -> "customer_id", "orders" -> "customer_id",
        "txns" -> "customer_id"),
      subjects = Seq(2L, 9L).toDF("s"),
      deltaMembers = Map("txns" -> dt))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(receipts == Map(
      ("customers", "2") -> 1L, ("customers", "9") -> 0L,
      ("orders", "2") -> 2L, ("orders", "9") -> 0L,
      ("txns", "2") -> 2L, ("txns", "9") -> 0L), receipts)

    // one consistent post-erasure commit: subject 2 gone EVERYWHERE
    val c = MultiSnapshot.currentCommit(spark, root).get
    val t = MultiSnapshot.readAll(spark, root)
    assert(t("customers").select("customer_id").collect()
      .map(_.getLong(0)).toSet == Set(1L, 3L))
    assert(t("orders").select("order_id").collect()
      .map(_.getLong(0)).toSet == Set(10L, 13L))
    assert(t("audit").count() == 1L, "member without a key column carries forward")
    val ptr = MultiSnapshot.pointer(c, "txns").get
    assert(BaseDelta.readAt(spark, dt, ptr).select("txn_id").collect()
      .map(_.getLong(0)).toSet == Set(100L, 102L))

    // bytes: pre-erasure generations and old commit pointers are GONE
    val f = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    Seq("customers", "orders").foreach { tbl =>
      val gens = f.listStatus(new org.apache.hadoop.fs.Path(s"$root/$tbl"))
        .map(_.getPath.getName).filter(_.startsWith("gen=")).toSeq
      assert(gens == Seq(s"gen=${c.gens(tbl)}"),
        s"$tbl pre-erasure generations survived: $gens")
    }
    assert(f.listStatus(new org.apache.hadoop.fs.Path(s"$root/_commit"))
      .map(_.getPath.getName).count(_.startsWith("v")) == 1,
      "old commit pointers must not survive an erasure vacuum")

    // erased state must be UNREACHABLE through time travel too: the
    // pre-erasure commit version refuses rather than resolving
    val preErasure = c.version - 1
    val tt = intercept[IllegalArgumentException](
      MultiSnapshot.commitAt(spark, root, preErasure))
    assert(tt.getMessage.contains("not retained"), tt.getMessage)
  }

  test("deferred coordinated erasure: immediate unreachability, delta member unrewritten until materialization") {
    import graft.gold.{BaseDelta, MultiSnapshot}
    val root = tmpDir("erase-coord-d") + "/r"
    val dim = Seq((1L, "alice"), (2L, "bob"), (3L, "carol"))
      .toDF("customer_id", "name")
    MultiSnapshot.publish(spark, root, Map("customers" -> dim))
    val dt = BaseDelta.Table(s"$root/_delta/txns", Seq("txn_id"),
      Seq("seq"), None)
    BaseDelta.append(spark, dt,
      Seq((100L, 1L, 1L), (101L, 2L, 2L), (102L, 3L, 3L), (103L, 2L, 4L))
        .toDF("txn_id", "customer_id", "seq"), 0L)
    MultiSnapshot.publish(spark, root,
      Map.empty[String, org.apache.spark.sql.DataFrame],
      pointers = Map("txns" -> 0L))

    val receipts = graft.gold.Erasure.eraseCoordinated(spark, root,
      keyCols = Map("customers" -> "customer_id", "txns" -> "customer_id"),
      subjects = Seq(2L).toDF("s"),
      deltaMembers = Map("txns" -> dt), deferred = true)
      .collect().map(r => r.getString(0) -> ((r.getLong(2), r.getString(3))))
      .toMap
    assert(receipts == Map(
      "customers" -> ((1L, "erased")), "txns" -> ((2L, "pending"))), receipts)

    // unreachable NOW through the coordinator-resolved views — the
    // staged member by rewrite, the delta member by tombstone ledger
    val c = MultiSnapshot.currentCommit(spark, root).get
    assert(MultiSnapshot.readAll(spark, root)("customers")
      .select("customer_id").collect().map(_.getLong(0)).toSet == Set(1L, 3L))
    val ptr = MultiSnapshot.pointer(c, "txns").get
    assert(BaseDelta.readAt(spark, dt, ptr).select("txn_id").collect()
      .map(_.getLong(0)).toSet == Set(100L, 102L))
    // …but the delta member was NOT rewritten (that is the ack-latency
    // win): no compacted base, ledger pending
    assert(BaseDelta.currentBasePath(spark, dt).isEmpty)
    assert(BaseDelta.pendingTombstones(spark, dt).keySet == Set("customer_id"))
    // materialization at the scheduled slot: bytes rewritten, ledger
    // clears, the committed view is unchanged
    assert(BaseDelta.materializeErasures(spark, dt).nonEmpty)
    assert(BaseDelta.pendingTombstones(spark, dt).isEmpty)
    assert(BaseDelta.readAt(spark, dt, ptr).select("txn_id").collect()
      .map(_.getLong(0)).toSet == Set(100L, 102L))
  }
}
