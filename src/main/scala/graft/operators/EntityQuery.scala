package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.model.Statements

/** Fluent entity query over a statement table — the Spark twin of the
  * ftmq `Query` surface the reference serves through ClickHouse
  * (exercised in /root/reference/tests/test_store.py:120-260:
  * dataset/schema filters, prop-value filters with comparators,
  * full-text search, order_by on property values, slicing).
  *
  * Semantics:
  *   - each `where` clause selects entities having SOME statement of
  *     that prop whose value matches the comparator; clauses AND.
  *     Values compare as STRINGS, like the reference's `value String`
  *     column in ClickHouse.
  *   - `search` selects entities with any value containing the needle
  *     (case-insensitive).
  *   - `orderByProp` orders entities by their minimum value of a prop
  *     (deterministic for multi-valued props), tiebreak canonical_id.
  *
  * Plan shape (scale): one conditional aggregation over the filtered
  * statements computes every where/search flag AND the sort key in a
  * single shuffle on canonical_id; assembly joins back on the same key
  * — with the statement store bucketed by canonical_id both shuffles
  * are elided. No collect, no per-clause pass.
  */
final case class EntityQuery(
    statements: DataFrame,
    datasetF: Option[String] = None,
    schemaF: Option[String] = None,
    wheres: Seq[(String, String, Seq[String])] = Nil,
    ids: Seq[(String, String, String)] = Nil,
    reverses: Seq[String] = Nil,
    searchQ: Option[String] = None,
    order: Option[(String, Boolean)] = None,
    off: Int = 0,
    lim: Int = -1) {

  def dataset(d: String): EntityQuery = copy(datasetF = Some(d))
  def schema(s: String): EntityQuery = copy(schemaF = Some(s))

  /** Point/prefix filters on the id columns — statement-level
    * predicates, pushed to the scan (bucket-prunable on canonical_id
    * when the store is bucketed). Mirrors ftmq `entity_id=`,
    * `entity_id__startswith=` etc. (test_store.py:264-279).
    */
  def entityId(id: String, comparator: String = "eq"): EntityQuery =
    copy(ids = ids :+ (("entity_id", comparator, id)))
  def canonicalId(id: String, comparator: String = "eq"): EntityQuery =
    copy(ids = ids :+ (("canonical_id", comparator, id)))

  /** comparator ∈ eq, gt, gte, lt, lte, in, startswith, like, ilike. */
  def where(prop: String, comparator: String, values: String*): EntityQuery =
    copy(wheres = wheres :+ ((prop, comparator, values.toSeq)))

  /** Reverse lookup (`Query.where(reverse=id)`,
    * test_store.py:241-255): entities having an entity-type prop
    * pointing at `id`. Composes with every other clause.
    */
  def reverse(id: String): EntityQuery = copy(reverses = reverses :+ id)

  def search(needle: String): EntityQuery = copy(searchQ = Some(needle))

  def orderByProp(prop: String, desc: Boolean = false): EntityQuery =
    copy(order = Some((prop, desc)))

  def slice(offset: Int, limit: Int): EntityQuery =
    copy(off = offset, lim = limit)

  private def cmp(op: String, v: Column, values: Seq[String]): Column =
    op match {
      case "eq" => v === values.head
      case "gt" => v > values.head
      case "gte" => v >= values.head
      case "lt" => v < values.head
      case "lte" => v <= values.head
      case "in" => v.isin(values: _*)
      case "startswith" => v.startsWith(values.head)
      case "like" => v.like(values.head)
      case "ilike" => lower(v).like(values.head.toLowerCase)
      case other => throw new IllegalArgumentException(s"comparator: $other")
    }

  /** The filtered statement set (dataset/schema pushed to the scan). */
  private def base: DataFrame = {
    var df = statements
    datasetF.foreach(d => df = df.filter(col("dataset") === d))
    schemaF.foreach(s => df = df.filter(col("schema") === s))
    ids.foreach { case (c, op, v) => df = df.filter(cmp(op, col(c), Seq(v))) }
    df
  }

  /** canonical_ids passing all where/search clauses, with the sort key.
    * One conditional aggregation — every clause is a max(flag).
    */
  private def selected: DataFrame = {
    val flagCols = wheres.zipWithIndex.map { case ((prop, op, vs), i) =>
      max(when(col("prop") === prop && cmp(op, col("value"), vs), 1)
        .otherwise(0)).as(s"__f$i")
    }
    val searchCol = searchQ.map(q =>
      max(when(lower(col("value")).contains(q.toLowerCase), 1)
        .otherwise(0)).as("__fs")).toSeq
    val revCols = reverses.zipWithIndex.map { case (id, i) =>
      max(when(col("prop_type") === "entity" && col("value") === id, 1)
        .otherwise(0)).as(s"__r$i")
    }
    val ordCol = order.map { case (prop, _) =>
      min(when(col("prop") === prop, col("value"))).as("__ord")
    }.toSeq
    val aggs = flagCols ++ searchCol ++ revCols ++ ordCol
    // With no full-text search, the selection aggregate only consumes
    // rows whose prop a where/order clause names (plus entity-typed
    // rows for reverse lookups) — other rows contribute nothing to any
    // flag. Pre-filtering is semantics-preserving exactly when a where
    // clause exists (every surviving entity then has at least one
    // matching row), and it lets PruneStaticExplodeFilter strike the
    // dead unpivot branches, so the selection's scan reads only the
    // clause columns instead of every property column.
    val narrowed =
      if (searchQ.isEmpty && wheres.nonEmpty) {
        val props = (wheres.map(_._1) ++ order.map(_._1)).distinct
        val propF = col("prop").isin(props: _*)
        base.filter(
          if (reverses.nonEmpty) propF || col("prop_type") === "entity"
          else propF)
      } else base
    val grouped =
      if (aggs.isEmpty) base.groupBy(col("canonical_id")).agg(count(lit(1)))
      else narrowed.groupBy(col("canonical_id")).agg(aggs.head, aggs.tail: _*)
    val passed = (0 until wheres.size).map(i => col(s"__f$i") === 1) ++
      searchQ.map(_ => col("__fs") === 1).toSeq ++
      (0 until reverses.size).map(i => col(s"__r$i") === 1)
    passed.foldLeft(grouped)((df, c) => df.filter(c))
  }

  /** Assembled entities, ordered and sliced. */
  def entities(): DataFrame = {
    val sel = selected
    val assembled = Statements.assemble(
      base.join(sel.select("canonical_id"), Seq("canonical_id"), "left_semi"))
    val withOrd = order match {
      case Some((_, desc)) =>
        val o = assembled.join(sel.select(col("canonical_id"), col("__ord")),
          Seq("canonical_id"))
        val ordCol = if (desc) col("__ord").desc else col("__ord").asc
        o.orderBy(ordCol, col("canonical_id").asc)
      case None => assembled.orderBy(col("canonical_id").asc)
    }
    val sliced =
      if (lim >= 0) withOrd.offset(off).limit(lim)
      else if (off > 0) withOrd.offset(off)
      else withOrd
    sliced.drop("__ord")
  }

  /** Raw statements of the selected entities — the reference's
    * `iterate`/statement export path: same selection plan, no
    * assembly fold.
    */
  def statementsOut(): DataFrame =
    base.join(selected.select("canonical_id"), Seq("canonical_id"),
      "left_semi")

  /** Stats over the query selection (`view.stats(q)`,
    * test_store.py:128-143): per dataset/schema entity + statement
    * counts of the selected entities.
    */
  def stats(): DataFrame = Statements.stats(statementsOut())

  /** Multiple aggregates in one pass — ftmq
    * `.aggregate("max", "date").aggregate("min", "date")`
    * (test_store.py:169-171). Each (func, prop) becomes one
    * conditional aggregate column in a single shuffle.
    */
  def aggregateProps(aggsIn: Seq[(String, String)]): DataFrame = {
    val stmts = statementsOut()
    val cols = aggsIn.map { case (func, prop) =>
      val v = when(col("prop") === prop, col("value").cast("double"))
      // integer-cent sums: exact, associative, primitive agg buffer —
      // the engine-wide money-sum recipe (see Queries class doc)
      val c = func match {
        case "sum" => sum(round(v * 100).cast("long")) / 100.0
        case "min" => min(v)
        case "max" => max(v)
        case "avg" => sum(round(v * 100).cast("long")) / 100.0 /
          count(when(v.isNotNull, 1))
        case "count" => count(when(v.isNotNull, 1)).cast("double")
        case other => throw new IllegalArgumentException(s"func: $other")
      }
      c.as(s"${func}_$prop")
    }
    stmts.agg(cols.head, cols.tail: _*)
  }

  /** Aggregate a numeric prop over the selected entities:
    * func ∈ sum, min, max, avg, count; optional grouping by another
    * prop's value (ftmq `aggregate(func, prop, groups=...)`,
    * test_store.py:171-236).
    */
  def aggregateProp(
      func: String,
      prop: String,
      groupByProp: Option[String] = None): DataFrame = {
    val sel = selected.select("canonical_id")
    val stmts = base.join(sel, Seq("canonical_id"), "left_semi")
    val vals = stmts.filter(col("prop") === prop)
      .select(col("canonical_id"), col("value").cast("double").as("v"))
    val withG = groupByProp match {
      case Some(g) =>
        val gv = stmts.filter(col("prop") === g)
          .select(col("canonical_id"), col("value").as("g"))
        vals.join(gv, Seq("canonical_id"))
      case None => vals.withColumn("g", lit("all"))
    }
    val aggCol = func match {
      case "sum" => sum(round(col("v") * 100).cast("long")) / 100.0
      case "min" => min(col("v"))
      case "max" => max(col("v"))
      case "avg" => (sum(round(col("v") * 100).cast("long")) / 100.0 /
        count(lit(1)))
      case "count" => count(lit(1)).cast("double")
      case other => throw new IllegalArgumentException(s"func: $other")
    }
    withG.groupBy(col("g")).agg(aggCol.as(func))
  }
}

/** Graph adjacency over statements — nomenklatura `View.get_inverted` /
  * `get_adjacent`: entity-type props are edges; adjacency is outgoing
  * (props on the entity) plus incoming (statements elsewhere pointing
  * at it).
  */
object Adjacency {

  /** All edges in both directions for entities of `targetSchema`.
    * Output: (entity_id, prop, adjacent_id, direction). Edge statements
    * are prop_type='entity' rows whose value is the referenced id —
    * a single filtered scan, direction is a constant per branch, and
    * the union stays one stage (no shuffle at all).
    */
  def adjacent(statements: DataFrame, targetSchema: String): DataFrame = {
    val edges = statements.filter(col("prop_type") === "entity")
    val targets = statements.filter(col("schema") === targetSchema)
      .select(col("entity_id")).distinct()
    val outgoing = edges
      .join(broadcast(targets), Seq("entity_id"), "left_semi")
      .select(col("entity_id"), col("prop"),
        col("value").as("adjacent_id"), lit("out").as("direction"))
    val incoming = edges
      .join(broadcast(targets.select(col("entity_id").as("value"))),
        Seq("value"), "left_semi")
      .select(col("value").as("entity_id"), col("prop"),
        col("entity_id").as("adjacent_id"), lit("in").as("direction"))
    outgoing.unionByName(incoming)
  }
}
