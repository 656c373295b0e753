package graft.lakehouse

import java.io.{ObjectInputStream, ObjectOutputStream}

import scala.collection.mutable
import scala.util.control.NonFatal

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BoundReference, Cast, EvalMode, Literal, XxHash64}
import org.apache.spark.sql.execution.datasources.{WriteJobStatsTracker, WriteTaskStats, WriteTaskStatsTracker}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Write-task-side per-file statistics (Delta's WriteJobStatsTracker shape):
  * the same per-file min/max/nullCount/rowCount/byte-size/exact-SUM/Bloom
  * numbers [[TableIO.collectFileStats]] derives by RE-READING a staged
  * write, accumulated here inside the write tasks themselves — one Spark
  * job per commit instead of two.
  *
  * Equivalence to the read-back aggregation (the stats are
  * correctness-bearing — manifest-answerable queries hash their values):
  *
  *   - min/max compare in SQL semantics (NaN greatest, -0.0 == 0.0 keeps
  *     the earlier value — the exact `least`/`greatest` accumulator rule,
  *     over the same row order the file scan replays);
  *   - the recorded strings come from evaluating Spark's own `Cast(_,
  *     StringType)` on the internal value, with the session timezone —
  *     bit-identical to `min(col).cast("string")`;
  *   - integral sums accumulate exactly (long with overflow escalation to
  *     BigInteger — the same values DECIMAL(38,0) summation yields);
  *   - Bloom bits hash `xxhash64(col)` by evaluating the XxHash64
  *     expression itself (a null value hashes to the seed, as in the agg).
  *
  * Any per-row/per-file failure POISONS the tracker instead of failing the
  * write: the caller then falls back to the read-back job, so this path can
  * only ever remove work, never change results. */
private[lakehouse] object WriteStats {

  /** Serializable Hadoop Configuration carrier (Spark's own wrapper is
    * private[spark]; this is the standard extension-library pattern). */
  final class SerializableConf(@transient var value: Configuration)
      extends Serializable {
    private def writeObject(out: ObjectOutputStream): Unit = {
      out.defaultWriteObject()
      value.write(out)
    }
    private def readObject(in: ObjectInputStream): Unit = {
      in.defaultReadObject()
      value = new Configuration(false)
      value.readFields(in)
    }
  }

  /** One staged file's raw stats, before JSON rendering. min/max are the
    * cast-to-string renderings (null = no non-null value seen); sums are
    * exact integral sums (null = all-null file). */
  final case class FileStatsRaw(
      rows: Long,
      mins: Array[String],
      maxs: Array[String],
      nullCounts: Array[Long],
      blooms: Array[Array[Byte]],
      bytes: Long,
      sums: Array[String])

  private final case class TaskStats(files: Seq[(String, FileStatsRaw)],
      poisoned: Boolean) extends WriteTaskStats

  /** SQL comparison semantics for min/max accumulation: NaN greater than
    * everything, -0.0 == 0.0 (so equal values keep the incumbent — the
    * `least`/`greatest` rule). */
  private def comparatorFor(dt: DataType): (Any, Any) => Int = dt match {
    case BooleanType => (a, b) =>
      java.lang.Boolean.compare(a.asInstanceOf[Boolean], b.asInstanceOf[Boolean])
    case ByteType => (a, b) =>
      java.lang.Byte.compare(a.asInstanceOf[Byte], b.asInstanceOf[Byte])
    case ShortType => (a, b) =>
      java.lang.Short.compare(a.asInstanceOf[Short], b.asInstanceOf[Short])
    case IntegerType | DateType => (a, b) =>
      java.lang.Integer.compare(a.asInstanceOf[Int], b.asInstanceOf[Int])
    case LongType | TimestampType => (a, b) =>
      java.lang.Long.compare(a.asInstanceOf[Long], b.asInstanceOf[Long])
    case FloatType => (a, b) => {
      val x = a.asInstanceOf[Float]; val y = b.asInstanceOf[Float]
      if (x == y) 0 else java.lang.Float.compare(x, y)
    }
    case DoubleType => (a, b) => {
      val x = a.asInstanceOf[Double]; val y = b.asInstanceOf[Double]
      if (x == y) 0 else java.lang.Double.compare(x, y)
    }
    case StringType => (a, b) =>
      a.asInstanceOf[UTF8String].compareTo(b.asInstanceOf[UTF8String])
    case _: DecimalType => (a, b) =>
      a.asInstanceOf[org.apache.spark.sql.types.Decimal]
        .compareTo(b.asInstanceOf[org.apache.spark.sql.types.Decimal])
    case other => throw new IllegalArgumentException(
      s"no stats comparator for $other")
  }

  /** Copy a value out of a (possibly buffer-backed, reused) InternalRow
    * before retaining it across rows. */
  private def retained(v: Any): Any = v match {
    case s: UTF8String => s.clone()
    case other => other
  }

  /** The staged file's path relative to the staging root: everything after
    * the commit protocol's task-attempt directory
    * (`.../_temporary/<app>/_temporary/<attempt>/<rel>`). */
  private def relOf(path: String): Option[String] = {
    val segs = path.split('/')
    val i = segs.lastIndexWhere(_ == "_temporary")
    if (i < 0 || i + 2 >= segs.length) None
    else Some(segs.drop(i + 2).mkString("/"))
  }

  final class Tracker(
      schema: StructType,
      statsColNames: Seq[String],
      bloomColNames: Seq[String],
      zoneId: String,
      conf: SerializableConf) extends WriteJobStatsTracker {

    @volatile private var collected: Map[String, FileStatsRaw] = null
    @volatile private var anyPoisoned = false

    /** None when any task poisoned (caller falls back to the read-back
      * stats job); Some(per-rel raw stats) otherwise. */
    def result: Option[Map[String, FileStatsRaw]] =
      if (anyPoisoned || collected == null) None else Some(collected)

    override def newTaskInstance(): WriteTaskStatsTracker =
      new TaskTracker(schema, statsColNames, bloomColNames, zoneId, conf)

    override def processStats(stats: Seq[WriteTaskStats],
        jobCommitTime: Long): Unit = {
      val m = Map.newBuilder[String, FileStatsRaw]
      var poisoned = false
      stats.foreach {
        case TaskStats(files, p) => if (p) poisoned = true else m ++= files
        case _ => poisoned = true
      }
      anyPoisoned = poisoned
      collected = m.result()
    }
  }

  private final class TaskTracker(
      schema: StructType,
      statsColNames: Seq[String],
      bloomColNames: Seq[String],
      zoneId: String,
      conf: SerializableConf) extends WriteTaskStatsTracker {

    private val n = statsColNames.length
    private val ords = new Array[Int](n)
    private val dts = new Array[DataType](n)
    private val cmps = new Array[(Any, Any) => Int](n)
    // sumIdx(i) >= 0 marks an integral stats column with its slot in the
    // sum arrays (same order [[TableIO.collectFileStats]] emits __sum_)
    private val sumIdx = new Array[Int](n)
    private var nSums = 0
    statsColNames.zipWithIndex.foreach { case (name, i) =>
      val ord = schema.fieldIndex(name)
      ords(i) = ord
      dts(i) = schema(ord).dataType
      cmps(i) = comparatorFor(dts(i))
      sumIdx(i) = dts(i) match {
        case ByteType | ShortType | IntegerType | LongType =>
          val s = nSums; nSums += 1; s
        case _ => -1
      }
    }
    private val bloomHashers: Array[XxHash64] = bloomColNames.map { name =>
      val ord = schema.fieldIndex(name)
      // seed 42 = the xxhash64() SQL function's seed (what the read-back
      // aggregation hashes with)
      XxHash64(Seq(BoundReference(ord, schema(ord).dataType,
        nullable = schema(ord).nullable)), 42L)
    }.toArray
    private val bloomWordsLen = Bloom.DefaultBits >>> 6

    private final class FileAcc {
      var rows = 0L
      val mins = new Array[Any](n)
      val maxs = new Array[Any](n)
      val nulls = new Array[Long](n)
      val sumLong = new Array[Long](nSums)
      val sumBig = new Array[java.math.BigInteger](nSums)
      val sumSeen = new Array[Boolean](nSums)
      val bloomWords: Array[Array[Long]] =
        Array.fill(bloomHashers.length)(new Array[Long](bloomWordsLen))
      var bytes = 0L
    }

    private val files = mutable.LinkedHashMap.empty[String, FileAcc]
    private var currentPath: String = null
    private var current: FileAcc = null
    private var poisoned = false

    override def newPartition(partitionValues: InternalRow): Unit = ()

    override def newFile(filePath: String): Unit = {
      if (poisoned) return
      try {
        current = new FileAcc
        currentPath = filePath
        files.put(filePath, current)
        ()
      } catch { case NonFatal(_) => poisoned = true }
    }

    override def closeFile(filePath: String): Unit = {
      if (poisoned) return
      try {
        val acc = files.getOrElse(filePath, null)
        if (acc == null) { poisoned = true; return }
        val p = new Path(filePath)
        acc.bytes = p.getFileSystem(conf.value).getFileStatus(p).getLen
      } catch { case NonFatal(_) => poisoned = true }
    }

    override def newRow(filePath: String, row: InternalRow): Unit = {
      if (poisoned) return
      try {
        val acc =
          if (filePath == currentPath) current
          else files.getOrElse(filePath, null)
        if (acc == null) { poisoned = true; return }
        acc.rows += 1
        var i = 0
        while (i < n) {
          val ord = ords(i)
          if (row.isNullAt(ord)) acc.nulls(i) += 1
          else {
            val v = row.get(ord, dts(i))
            val cmp = cmps(i)
            if (acc.mins(i) == null) {
              val kept = retained(v)
              acc.mins(i) = kept
              acc.maxs(i) = kept
            } else {
              if (cmp(v, acc.mins(i)) < 0) acc.mins(i) = retained(v)
              if (cmp(v, acc.maxs(i)) > 0) acc.maxs(i) = retained(v)
            }
            val s = sumIdx(i)
            if (s >= 0) {
              val x: Long = dts(i) match {
                case ByteType => row.getByte(ord).toLong
                case ShortType => row.getShort(ord).toLong
                case IntegerType => row.getInt(ord).toLong
                case _ => row.getLong(ord)
              }
              acc.sumSeen(s) = true
              if (acc.sumBig(s) == null) {
                val prev = acc.sumLong(s)
                val next = prev + x
                // overflow check (Math.addExact semantics without throw)
                if (((prev ^ next) & (x ^ next)) < 0)
                  acc.sumBig(s) = java.math.BigInteger.valueOf(prev)
                    .add(java.math.BigInteger.valueOf(x))
                else acc.sumLong(s) = next
              } else acc.sumBig(s) =
                acc.sumBig(s).add(java.math.BigInteger.valueOf(x))
            }
          }
          i += 1
        }
        var b = 0
        while (b < bloomHashers.length) {
          val h = bloomHashers(b).eval(row).asInstanceOf[Long]
          val ps = Bloom.positions(h, Bloom.DefaultBits)
          var k = 0
          while (k < ps.length) {
            Bloom.set(acc.bloomWords(b), ps(k)); k += 1
          }
          b += 1
        }
      } catch { case NonFatal(_) => poisoned = true }
    }

    /** Render an internal value with Spark's own string cast — identical to
      * `.cast("string")` in the read-back aggregation. */
    private def renderString(v: Any, dt: DataType): String =
      if (v == null) null
      else Cast(Literal(v, dt), StringType, Option(zoneId), EvalMode.LEGACY)
        .eval(null).asInstanceOf[UTF8String].toString

    override def getFinalStats(taskCommitTime: Long): WriteTaskStats = {
      if (poisoned) return TaskStats(Nil, poisoned = true)
      try {
        val entries = files.toSeq.map { case (path, acc) =>
          (relOf(path), acc)
        }
        if (entries.exists(_._1.isEmpty))
          return TaskStats(Nil, poisoned = true)
        val out = entries.map { case (relOpt, acc) =>
          val rel = relOpt.get
          val mins = new Array[String](n)
          val maxs = new Array[String](n)
          var i = 0
          while (i < n) {
            mins(i) = renderString(acc.mins(i), dts(i))
            maxs(i) = renderString(acc.maxs(i), dts(i))
            i += 1
          }
          val sums = new Array[String](nSums)
          var s = 0
          while (s < nSums) {
            sums(s) =
              if (!acc.sumSeen(s)) null
              else if (acc.sumBig(s) != null) acc.sumBig(s).toString
              else acc.sumLong(s).toString
            s += 1
          }
          val blooms: Array[Array[Byte]] = acc.bloomWords.map { words =>
            val bb = java.nio.ByteBuffer.allocate(words.length * 8)
            words.foreach(bb.putLong)
            bb.array()
          }
          rel -> FileStatsRaw(acc.rows, mins, maxs, acc.nulls, blooms,
            acc.bytes, sums)
        }
        TaskStats(out, poisoned = false)
      } catch { case NonFatal(_) => TaskStats(Nil, poisoned = true) }
    }
  }
}
