package graft.core

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types._

/** ONE distributed theta-sketch pass over a frame's columns — the
  * ANALYZE primitive shared by the Iceberg Puffin statistics path and
  * the Delta `graft.statistics` domain ([[graft.interop.Iceberg
  * .analyzeTable]], [[graft.interop.DeltaLake.analyzeTable]]).
  *
  * mapPartitions builds one update sketch per column per partition and
  * emits only the COMPACT sketch bytes; the driver unions compact
  * sketches — column values never leave the executors, and the driver
  * traffic is O(partitions × columns × sketch size), independent of
  * row count. The mapPartitions is justified: datasketches has no
  * Catalyst expression, and the per-partition sketch is the canonical
  * distributed form. */
object ThetaNdv {

  /** The primitive column types a theta sketch can hash stably. */
  def sketchable(schema: StructType): Seq[String] =
    schema.fields.filter(f => f.dataType match {
      case _: ByteType | _: ShortType | _: IntegerType | _: LongType | _: StringType |
          _: FloatType | _: DoubleType | _: BooleanType | _: DateType |
          _: TimestampType | _: TimestampNTZType | _: DecimalType => true
      case _ => false
    }).map(_.name).toSeq

  /** Per-column compact sketch bytes plus the exact row count, in one
    * pass. The frame must be non-empty (callers special-case empty
    * tables with [[emptySketch]]). */
  def columnSketches(df: DataFrame, cols: Seq[String]): (Array[Array[Byte]], Long) = {
    val nCols = cols.size
    df.select(cols.map(org.apache.spark.sql.functions.col): _*).rdd.mapPartitions { it =>
      val sks = Array.fill(nCols)(
        org.apache.datasketches.theta.UpdateSketch.builder().build())
      var n = 0L
      it.foreach { r =>
        n += 1
        var i = 0
        while (i < nCols) {
          if (!r.isNullAt(i)) r.get(i) match {
            case v: java.lang.Long => sks(i).update(v.longValue())
            case v: java.lang.Integer => sks(i).update(v.longValue())
            case v: java.lang.Short => sks(i).update(v.longValue())
            case v: java.lang.Byte => sks(i).update(v.longValue())
            case v: String => sks(i).update(v)
            case v: java.lang.Double => sks(i).update(v.doubleValue())
            case v: java.lang.Float => sks(i).update(v.doubleValue())
            case v: java.lang.Boolean => sks(i).update(if (v) 1L else 0L)
            case v: java.sql.Date => sks(i).update(v.toLocalDate.toEpochDay)
            case v: java.sql.Timestamp => sks(i).update(v.getTime)
            case v: java.time.LocalDateTime =>
              sks(i).update(v.toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L +
                v.getNano / 1000L)
            case v: java.math.BigDecimal => sks(i).update(v.toPlainString)
            case v => sks(i).update(String.valueOf(v))
          }
          i += 1
        }
      }
      Iterator.single((sks.map(_.compact().toByteArray), n))
    }.reduce { (a, b) =>
      (a._1.zip(b._1).map { case (x, y) =>
        val u = org.apache.datasketches.theta.SetOperation.builder().buildUnion()
        u.union(org.apache.datasketches.theta.Sketches.wrapSketch(
          org.apache.datasketches.memory.Memory.wrap(x)))
        u.union(org.apache.datasketches.theta.Sketches.wrapSketch(
          org.apache.datasketches.memory.Memory.wrap(y)))
        u.getResult.toByteArray
      }, a._2 + b._2)
    }
  }

  /** Per-GROUP compact sketches of `valueCol` in ONE distributed pass:
    * each partition keeps one update sketch per group it sees, emits
    * (group, compact bytes), and partial sketches UNION on the way
    * back — O(partitions × groups × sketch) shuffle, never values.
    * This is the mergeable-rollup primitive: the returned per-group
    * sketches union again (day → week → total) without re-touching a
    * row, which is what makes distinct-count rollups O(sketches) at
    * 100 TB instead of one full scan per window. */
  def groupedSketches(df: DataFrame, groupCol: String,
      valueCol: String, nominalEntries: Int = 4096): Map[String, Array[Byte]] = {
    import org.apache.spark.sql.functions.col
    df.select(col(groupCol).cast("string"), col(valueCol)).rdd.mapPartitions { it =>
      val m = scala.collection.mutable.Map.empty[
        String, org.apache.datasketches.theta.UpdateSketch]
      it.foreach { r =>
        if (!r.isNullAt(0) && !r.isNullAt(1)) {
          val sk = m.getOrElseUpdate(r.getString(0),
            org.apache.datasketches.theta.UpdateSketch.builder()
              .setNominalEntries(nominalEntries).build())
          r.get(1) match {
            case v: java.lang.Long => sk.update(v.longValue())
            case v: java.lang.Integer => sk.update(v.longValue())
            case v: String => sk.update(v)
            case v => sk.update(String.valueOf(v))
          }
        }
      }
      m.iterator.map { case (g, sk) => (g, sk.compact().toByteArray) }
    }.reduceByKey(union(_, _, nominalEntries)).collect().toMap
  }

  /** Union two compact sketches — the merge the rollup rides. The
    * union gate must be AT LEAST as wide as the inputs' build size:
    * a default-width union of wider exact sketches would downsample
    * them back into estimation mode. */
  def union(a: Array[Byte], b: Array[Byte], nominalEntries: Int = 4096): Array[Byte] = {
    val u = org.apache.datasketches.theta.SetOperation.builder()
      .setNominalEntries(nominalEntries).buildUnion()
    u.union(org.apache.datasketches.theta.Sketches.wrapSketch(
      org.apache.datasketches.memory.Memory.wrap(a)))
    u.union(org.apache.datasketches.theta.Sketches.wrapSketch(
      org.apache.datasketches.memory.Memory.wrap(b)))
    u.getResult.toByteArray
  }

  /** True while the sketch never sampled (theta == 1.0): every hash is
    * retained and `estimate` IS the exact distinct count — the
    * exact-under-capacity property that turns a sketch entry into a
    * hash-oracle-able one (the a13 pattern applied to distinct
    * counting). */
  def isExact(bytes: Array[Byte]): Boolean =
    !org.apache.datasketches.theta.Sketches.wrapSketch(
      org.apache.datasketches.memory.Memory.wrap(bytes)).isEstimationMode

  def emptySketch(): Array[Byte] =
    org.apache.datasketches.theta.UpdateSketch.builder().build().compact().toByteArray

  def estimate(bytes: Array[Byte]): Long =
    math.round(org.apache.datasketches.theta.Sketches.wrapSketch(
      org.apache.datasketches.memory.Memory.wrap(bytes)).getEstimate)
}
