package graft.core

import org.apache.spark.sql.catalyst.expressions.{AttributeReference, Exists, Expression, GetStructField, Literal, OuterReference}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, ReplaceData}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation

import graft.functions.JsonDocKeys

/** Makes `MERGE INTO graft.db.c t USING s ON t._id = s.id ...` work.
  *
  * Spark 4.1's group-based MERGE rewrite
  * (`RewriteMergeIntoTable.toGroupFilterCondition`) builds the runtime
  * group-filter `Exists(Filter(cond, source))` by wrapping target-side
  * attributes of the merge condition as `OuterReference` — but only those
  * in the original relation's `outputSet`. A condition on the `_id`/`_key`
  * METADATA columns resolves against the relation's `metadataOutput`
  * instead, so those references are left bare inside the subquery and
  * CheckAnalysis rejects the whole statement with
  * MISSING_ATTRIBUTES.RESOLVED_ATTRIBUTE_MISSING_FROM_INPUT — forcing
  * users into the `get_json_object(raw,'$.id')` spelling the metadata
  * columns exist to replace.
  *
  * The repair (post-hoc resolution, i.e. after the rewrite, before
  * CheckAnalysis): in a [[ReplaceData]] over a [[ContainerTable]], rewrite
  * every bare `_id`/`_key` reference inside the group-filter condition to
  * the SAME raw-derived expression the scan computes those columns from
  * ([[JsonDocKeys]] over `OuterReference(raw)` — parse-once, codegen'd),
  * which is exactly the shape the rewrite produces for data-column
  * conditions. The MergeRows join itself is untouched: it reads `_id`/
  * `_key` as real scan output columns, which is valid as written. The
  * group filter is a PRUNING predicate (which bucket groups to read and
  * replace), so the semantics stay those of the scan-computed columns; the
  * one divergence — concat_ws yields "" where the scan yields null for a
  * malformed document — can only over-select groups, never drop one.
  */
object MergeMetaRepair extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan resolveOperatorsDown {
    case rd: ReplaceData if rd.groupFilterCondition.isDefined =>
      containerOf(rd) match {
        case Some(ct) =>
          val metaIds = metaAttrIds(rd)
          if (metaIds.isEmpty) rd
          else rawAttrOf(rd) match {
            case Some(raw) =>
              val pkPaths = ct.props.pkPaths.map(_.stripPrefix("/"))
              def hasMeta(cond: Expression): Boolean = cond.exists {
                case a: AttributeReference => metaIds.contains(a.exprId)
                case _ => false
              }
              def fix(cond: Expression): Expression = cond.transformUp {
                case a: AttributeReference if metaIds.contains(a.exprId) =>
                  fromRaw(a.name, OuterReference(raw), pkPaths)
              }
              // ONLY the MERGE form — Exists(Filter(cond, source)) — is
              // broken: there the condition lives in a correlated subquery
              // plan, where target-side references must be OuterReferences
              // (which the Spark rewrite grants data columns but not
              // metadata columns). The broken references live in the
              // SUBQUERY PLAN's filter, which expression transforms do not
              // descend into — rewrite it explicitly, and record `raw` as
              // an outer attribute so the correlation machinery sees the
              // new OuterReference. UPDATE/DELETE group filters are plain
              // conditions evaluated directly against the read relation
              // (metadata columns are legal there) and must NOT be
              // wrapped: strict no-op for them and for any merge whose
              // condition never touches the metadata columns.
              rd.groupFilterCondition match {
                case Some(ex @ Exists(f: Filter, _, _, _, _))
                    if hasMeta(f.condition) =>
                  rd.copy(groupFilterCondition = Some(ex.copy(
                    plan = f.copy(condition = fix(f.condition)),
                    outerAttrs = (ex.outerAttrs :+ raw).distinct)))
                case _ => rd
              }
            case None => rd
          }
        case None => rd
      }
  }

  /** The graft container this ReplaceData targets, if any (the rewrite's
    * `originalTable` is the pre-rewrite relation, which holds the
    * connector Table directly; any other source is left untouched). */
  private def containerOf(rd: ReplaceData): Option[ContainerTable] =
    rd.originalTable match {
      case r: DataSourceV2Relation => r.table match {
        case ct: ContainerTable => Some(ct)
        case _ => None
      }
      case _ => None
    }

  // RowLevelOperationTable is private[sql]; the read relation the rewrite
  // builds is recognized by its table's class name instead
  private val RowLevelOpTable =
    "org.apache.spark.sql.connector.write.RowLevelOperationTable"

  /** ExprIds of the `_id`/`_key` columns of the rewrite's READ relation —
    * the ids the broken group filter references. Matching by exprId (not
    * name) means a source-side column that happens to be called `_id`
    * can never be rewritten. */
  private def metaAttrIds(rd: ReplaceData) =
    rd.query.collect {
      case r: DataSourceV2Relation
          if r.table != null && r.table.getClass.getName == RowLevelOpTable =>
        r.output.filter(a => a.name == "_id" || a.name == "_key").map(_.exprId)
    }.flatten.toSet

  private def rawAttrOf(rd: ReplaceData) =
    rd.originalTable.output.collectFirst {
      case a: AttributeReference if a.name == "raw" => a
    }

  /** The scan's metadata-column derivation as an expression over `raw`:
    * keys = json_doc_keys(raw) (struct (w, id, pk0..pkN), null when
    * malformed); `_id` = keys.id; `_key` = concat_ws('', id, pk0..pkN)
    * (null-skipping, like the reader's builder loop). */
  private def fromRaw(name: String, raw: Expression,
                      pkPaths: Seq[String]): Expression = {
    val keys = JsonDocKeys(raw, pkPaths, inject = false)
    name match {
      case "_id" => GetStructField(keys, 1, Some("id"))
      case _ =>
        val parts = (1 until 2 + pkPaths.length).map(GetStructField(keys, _))
        new org.apache.spark.sql.catalyst.expressions.ConcatWs(
          Literal.create("",
            org.apache.spark.sql.types.StringType) +: parts)
    }
  }
}
