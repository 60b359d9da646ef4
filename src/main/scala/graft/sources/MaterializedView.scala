package graft.sources

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, count, lit, max, min, sum}
import scala.jdk.CollectionConverters._

/** Incrementally-maintained aggregate views over VersionedTable bases.
  *
  * The view is itself a VersionedTable holding the aggregated state
  * plus (in its manifest) the view definition and the base version it
  * reflects. `refresh` diffs the base's manifests: when the base only
  * APPENDED files since the last refresh, it aggregates just the new
  * files and folds the partial into the stored state — classic
  * incremental view maintenance restricted to the re-aggregable
  * (commutative-monoid) fragment: count / sum / min / max, which is
  * what makes the fold correct (avg = sum/count at read time; sum is
  * accepted over integral/decimal only — FP addition is not
  * associative, see [[validateIncremental]]). Any
  * non-append base change (overwrite, delete, compact rewrote files)
  * falls back to a full recompute — detected structurally, because
  * manifests name every live file.
  *
  * Round 9: views created WITH the base's key columns additionally
  * maintain through updates and deletes via the row-level
  * [[VersionedTable.changeFeed]] — the ABELIAN-GROUP fragment
  * (count / sum are invertible: insert/update_postimage add,
  * delete/update_preimage subtract; a count(*) spec is required so
  * emptied groups can be DROPPED, matching what a full recompute
  * never materializes). min/max are monoid-only (deleting the
  * minimum needs a rescan), so their presence keeps the full-
  * recompute fallback — the classic IVM dichotomy, stated instead
  * of silently approximated. At 100 TB a MERGE that touched one
  * day's rows refreshes the view at O(delta-join) cost instead of
  * re-scanning the world.
  *
  * At 100 TB this is the difference between re-scanning the world on
  * every dashboard tick and scanning one day's appended files; the
  * same manifest diff is what streaming table sources (Delta CDF's
  * simple case) are built on.
  */
object MaterializedView {

  /** One aggregate column: fn in {count,sum,min,max}; count uses
    * col="*". Output column name is `as`. */
  case class AggSpec(fn: String, col: String, as: String) {
    require(Set("count", "sum", "min", "max")(fn), s"unsupported agg fn '$fn'")
  }

  private val mapper = new ObjectMapper()
  private val DefKey = "mvDef"

  private def aggColumn(a: AggSpec): Column = a.fn match {
    case "count" => count(if (a.col == "*") lit(1) else col(a.col)).as(a.as)
    case "sum" => sum(col(a.col)).as(a.as)
    case "min" => min(col(a.col)).as(a.as)
    case "max" => max(col(a.col)).as(a.as)
  }

  /** The fold of two partial states: counts and sums add, min/max
    * re-minimize — the monoid op per aggregate. Additive results are
    * cast back to the stored state's column type (the "anchor"):
    * Spark's sum over DECIMAL(p,s) widens to DECIMAL(p+10,s), so an
    * un-anchored incremental refresh would widen the view schema on
    * every fold while a full recompute widens once — the two paths
    * must produce the SAME schema. Overflow parity holds too: the
    * anchor cast overflows iff the true total needs more than p+10
    * digits, which is exactly when a full recompute's sum (whose
    * analyzer-fixed result type is the same DECIMAL(p+10, s))
    * overflows — incremental never fails where full would succeed. */
  private def combineColumn(a: AggSpec, anchor: org.apache.spark.sql.types.StructType)
      : Column = a.fn match {
    case "count" | "sum" => sum(col(a.as)).cast(anchor(a.as).dataType).as(a.as)
    case "min" => min(col(a.as)).as(a.as)
    case "max" => max(col(a.as)).as(a.as)
  }

  private def aggregate(df: DataFrame, groupCols: Seq[String],
      aggs: Seq[AggSpec]): DataFrame = {
    val cols = aggs.map(aggColumn)
    df.groupBy(groupCols.map(col): _*).agg(cols.head, cols.tail: _*)
  }

  private def combine(parts: DataFrame, groupCols: Seq[String],
      aggs: Seq[AggSpec]): DataFrame = {
    val cols = aggs.map(combineColumn(_, parts.schema))
    parts.groupBy(groupCols.map(col): _*).agg(cols.head, cols.tail: _*)
  }

  /** The fold re-associates additions, so `sum` is only exact where
    * addition IS associative: integral and decimal inputs. A
    * float/double sum would drift from the promised full-recompute
    * equality — rejected up front rather than silently approximated;
    * cast the base column to DECIMAL for an exact incremental view. */
  private def validateIncremental(state: DataFrame, aggs: Seq[AggSpec]): Unit =
    aggs.filter(_.fn == "sum").foreach { a =>
      state.schema(a.as).dataType match {
        case _: org.apache.spark.sql.types.FloatType |
             _: org.apache.spark.sql.types.DoubleType =>
          throw new IllegalArgumentException(
            s"sum(${a.col}) over a float/double column is not incrementally " +
            "maintainable (FP addition is non-associative); cast to DECIMAL " +
            "in the base table for an exact view")
        case _ =>
      }
    }

  private def defJson(baseRoot: String, baseVersion: Long,
      groupCols: Seq[String], aggs: Seq[AggSpec],
      keys: Seq[String]): String = {
    val m = new java.util.LinkedHashMap[String, Object]()
    m.put("baseRoot", baseRoot)
    m.put("baseVersion", Long.box(baseVersion))
    m.put("groupCols", new java.util.ArrayList[Object](groupCols.asJava))
    val as = new java.util.ArrayList[Object]()
    aggs.foreach { a =>
      val am = new java.util.LinkedHashMap[String, Object]()
      am.put("fn", a.fn); am.put("col", a.col); am.put("as", a.as)
      as.add(am)
    }
    m.put("aggs", as)
    if (keys.nonEmpty)
      m.put("keys", new java.util.ArrayList[Object](keys.asJava))
    mapper.writeValueAsString(m)
  }

  private def parseDef(json: String)
      : (String, Long, Seq[String], Seq[AggSpec], Seq[String]) = {
    val m = mapper.readValue(json, classOf[java.util.Map[String, Object]])
    val aggs = m.get("aggs").asInstanceOf[java.util.List[Object]].asScala.toSeq
      .map(_.asInstanceOf[java.util.Map[String, Object]])
      .map(am => AggSpec(am.get("fn").toString, am.get("col").toString,
        am.get("as").toString))
    // `keys` is a round-9 field: older view manifests lack it and
    // simply keep the full-recompute fallback for non-append changes
    val keys = Option(m.get("keys"))
      .map(_.asInstanceOf[java.util.List[Object]].asScala.toSeq.map(_.toString))
      .getOrElse(Seq.empty)
    (m.get("baseRoot").toString,
      m.get("baseVersion").asInstanceOf[Number].longValue(),
      m.get("groupCols").asInstanceOf[java.util.List[Object]].asScala.toSeq.map(_.toString),
      aggs, keys)
  }

  /** Commit new view state. `requireViewBase` pins the view version the
    * state was computed FROM — a refresh is a snapshot-replacing op, so
    * two concurrent refreshes folding the same delta must conflict
    * (the loser gets ConcurrentModificationException and simply
    * re-runs; without the pin it would fold the delta a second time
    * into a state that already contains it — silent double counting). */
  private def writeState(spark: SparkSession, viewRoot: String, state: DataFrame,
      baseRoot: String, baseVersion: Long, groupCols: Seq[String],
      aggs: Seq[AggSpec], keys: Seq[String], op: String,
      requireViewBase: Option[Long]): Long = {
    val files = VersionedTable.writeData(spark, viewRoot, state)
    val extra = Map[String, Object](
      DefKey -> defJson(baseRoot, baseVersion, groupCols, aggs, keys))
    VersionedTable.commit(spark, viewRoot, extra, requireViewBase) { _ =>
      (op, state.schema, files) }
  }

  /** Materialize `aggs` grouped by `groupCols` over the base table's
    * current snapshot. */
  def create(spark: SparkSession, viewRoot: String, baseRoot: String,
      groupCols: Seq[String], aggs: Seq[AggSpec],
      keys: Seq[String] = Seq.empty): Long = {
    require(groupCols.nonEmpty && aggs.nonEmpty, "need group columns and aggregates")
    require(VersionedTable.versions(spark, viewRoot).isEmpty,
      s"view already exists at $viewRoot")
    val baseV = VersionedTable.versions(spark, baseRoot).lastOption.getOrElse(
      throw new IllegalArgumentException(s"no base table at $baseRoot"))
    val base = VersionedTable.read(spark, baseRoot, Some(baseV))
    keys.foreach(k => require(base.columns.contains(k),
      s"key column '$k' is not in the base table"))
    val state = aggregate(base, groupCols, aggs)
    validateIncremental(state, aggs)
    writeState(spark, viewRoot, state, baseRoot, baseV, groupCols, aggs, keys,
      "create", None)
  }

  /** The view's current state (a plain snapshot read). */
  def read(spark: SparkSession, viewRoot: String): DataFrame =
    VersionedTable.read(spark, viewRoot)

  /** Bring the view up to the base's head. Returns
    * (viewVersion, filesScanned, mode): mode "noop" when the base has
    * not moved, "incremental" when only appended files were read,
    * "full" when a non-append base change forced a recompute. */
  def refresh(spark: SparkSession, viewRoot: String): (Long, Int, String) = {
    val (viewV, viewMan) = VersionedTable.loadHead(spark, viewRoot).getOrElse(
      throw new IllegalArgumentException(s"no view at $viewRoot"))
    val defStr = Option(viewMan.get(DefKey)).map(_.toString).getOrElse(
      throw new IllegalStateException(s"$viewRoot is not a materialized view"))
    val (baseRoot, lastBaseV, groupCols, aggs, keys) = parseDef(defStr)
    val baseV = VersionedTable.versions(spark, baseRoot).last
    if (baseV == lastBaseV) return (viewV, 0, "noop")
    def filesAt(v: Long): Seq[String] =
      VersionedTable.manifestFiles(VersionedTable.readManifest(spark, baseRoot, v))
        .map(_.get("path").asInstanceOf[String])
    // the reflected base manifest may have been vacuumed away — the
    // diff is then unknowable, which is just the full-recompute case
    val oldFiles = try filesAt(lastBaseV) catch { case _: java.io.IOException => null }
    val newFiles = filesAt(baseV)
    val appended =
      if (oldFiles == null) newFiles else newFiles.filterNot(oldFiles.toSet)
    val appendOnly = oldFiles != null && oldFiles.toSet.subsetOf(newFiles.toSet)
    val baseSchema = VersionedTable.manifestSchema(
      VersionedTable.readManifest(spark, baseRoot, baseV))
    if (appendOnly) {
      if (appended.isEmpty) {
        // metadata-only base commit: advance the cursor by carrying the
        // view's existing file entries forward — O(1), no state rewrite
        val v = VersionedTable.commit(spark, viewRoot,
          Map[String, Object](DefKey -> defJson(baseRoot, baseV, groupCols, aggs, keys)),
          Some(viewV)) { _ =>
          ("refresh_cursor", VersionedTable.manifestSchema(viewMan),
            VersionedTable.manifestFiles(viewMan).map(fm =>
              (fm.get("path").asInstanceOf[String], fm)))
        }
        return (v, 0, "incremental")
      }
      val delta = aggregate(
        spark.read.schema(baseSchema).parquet(appended: _*), groupCols, aggs)
      val folded = combine(read(spark, viewRoot).unionByName(delta), groupCols, aggs)
      // writeState's data write executes eagerly while the view's old
      // files still exist (commits never delete data files — vacuum
      // does), so the lazy self-read is safe
      val v = writeState(spark, viewRoot, folded,
        baseRoot, baseV, groupCols, aggs, keys, "refresh_incremental", Some(viewV))
      (v, appended.size, "incremental")
    } else {
      // round 9: a non-append change with declared keys and an
      // invertible spec maintains through the row-level change feed
      // instead of rescanning the base (see object scaladoc)
      val invertible = aggs.forall(a => a.fn == "count" || a.fn == "sum") &&
        aggs.exists(a => a.fn == "count" && a.col == "*")
      if (keys.nonEmpty && invertible && oldFiles != null) {
        import org.apache.spark.sql.functions.when
        val feed = VersionedTable.changeFeed(spark, baseRoot, lastBaseV, baseV, keys)
        val sign = when(
          col("_change_type").isin("insert", "update_postimage"), 1L)
          .otherwise(-1L)
        val state = read(spark, viewRoot)
        // signed partial aggregates, anchored to the stored state's
        // column types (same schema-parity rationale as combineColumn)
        val deltaCols = aggs.map { a =>
          val term = a.fn match {
            case "count" if a.col == "*" => sum(sign)
            case "count" => sum(when(col(a.col).isNotNull, sign).otherwise(0L))
            case "sum" => sum(when(col(a.col).isNotNull,
              col(a.col).cast(state.schema(a.as).dataType) * sign).otherwise(lit(null)))
          }
          term.cast(state.schema(a.as).dataType).as(a.as)
        }
        val delta = feed.groupBy(groupCols.map(col): _*)
          .agg(deltaCols.head, deltaCols.tail: _*)
        val liveness = aggs.find(a => a.fn == "count" && a.col == "*").get.as
        val folded = combine(state.unionByName(delta), groupCols, aggs)
          // a group whose row count reached zero no longer exists —
          // exactly what a full recompute would (not) materialize
          .filter(col(liveness) =!= 0L)
        val v = writeState(spark, viewRoot, folded,
          baseRoot, baseV, groupCols, aggs, keys, "refresh_delta", Some(viewV))
        return (v, newFiles.size, "delta")
      }
      val state = aggregate(
        VersionedTable.read(spark, baseRoot, Some(baseV)), groupCols, aggs)
      val v = writeState(spark, viewRoot, state,
        baseRoot, baseV, groupCols, aggs, keys, "refresh_full", Some(viewV))
      (v, newFiles.size, "full")
    }
  }
}
