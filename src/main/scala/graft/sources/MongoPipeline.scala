package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftshim.toColumn

/** MongoDB aggregation-pipeline → DataFrame compiler.
  *
  * The reference's SQL layer internally *generates* `$match`/`$group`
  * pipelines for pushdown (reference: src/mongo_optimizer.cpp:1,
  * test/sql/query/groupby_pushdown.test:1). Spark-first, the useful
  * surface is the inverse: let a user who already has Mongo aggregation
  * pipelines run them unchanged against any DataFrame — each stage
  * becomes declarative DataFrame algebra, so Catalyst optimizes the
  * whole pipeline exactly like hand-written Spark code ($match filters
  * push into scans, $group gets partial aggregation, $sort+$limit plans
  * as TopN, $lookup joins participate in broadcast planning).
  *
  * Supported stages: `$match` (full [[MongoFilter]] grammar), `$project`
  * (inclusion / exclusion / computed), `$addFields`/`$set`, `$group`
  * (`$sum $avg $min $max $count $push $addToSet`), `$sort`, `$limit`,
  * `$skip`, `$unwind` (string and document forms incl.
  * `preserveNullAndEmptyArrays`), `$count`, `$sortByCount`, `$lookup`
  * (equality form, via a collection resolver).
  *
  * Expression operators (the aggregation expression language):
  * `"$field"` paths, `$literal`, arithmetic (`$add $subtract $multiply
  * $divide $mod $abs $round $floor $ceil`), string (`$concat $toUpper
  * $toLower $trim $strLenCP $substrCP $split`), date parts (`$year
  * $month $dayOfMonth $hour $minute $second`), comparison (`$eq $ne
  * $gt $gte $lt $lte`), boolean (`$and $or $not`), conditional
  * (`$cond $ifNull`), array (`$size $arrayElemAt $first $last`),
  * document-literal → struct.
  *
  * Scale: output is pure declarative DataFrame algebra — no UDFs, no
  * driver loops; a pipeline is exactly as fast as the equivalent
  * hand-written query.
  */
object MongoPipeline {
  import DocValue._

  /** Run a pipeline (extended-JSON array of stage documents) against a
    * DataFrame. `resolver` maps `$lookup.from` collection names to
    * DataFrames (pass the catalog/Tables accessor of your deployment).
    */
  def aggregate(df: DataFrame, pipelineJson: String,
      resolver: String => DataFrame = null): DataFrame = {
    val parsed = ExtJson.parse(s"""{"p": $pipelineJson}""")
    val stages = parsed.fields.toMap.get("p") match {
      case Some(DArray(items)) if items.forall(_.isInstanceOf[DDoc]) =>
        items.map(_.asInstanceOf[DDoc])
      case other => throw bad(s"pipeline must be an array of stages, got $other")
    }
    stages.foldLeft(df)((acc, st) => applyStage(acc, st, resolver))
  }

  private def applyStage(df: DataFrame, stage: DDoc,
      resolver: String => DataFrame): DataFrame = stage.fields.toList match {
    case (op, spec) :: Nil => op match {
      case "$match" => spec match {
        case d: DDoc => df.filter(toColumn(MongoFilter.compileDoc(d)))
        case other   => throw bad(s"$$match needs a document, got $other")
      }

      case "$project" => spec match {
        case d: DDoc =>
          val (excl, rest) = d.fields.partition { case (_, v) =>
            v == DLong(0) || v == DBool(false) }
          if (excl.nonEmpty && rest.isEmpty)
            df.drop(excl.map(_._1): _*) // pure exclusion form
          else if (excl.exists(_._1 != "_id"))
            throw bad("$project cannot mix inclusion and exclusion")
          else df.select(rest.map {
            case (f, v) if v == DLong(1) || v == DBool(true) => col(f)
            case (f, v) => valueExpr(v).as(f) // rename / computed
          }: _*)
        case other => throw bad(s"$$project needs a document, got $other")
      }

      case "$addFields" | "$set" => spec match {
        case d: DDoc => d.fields.foldLeft(df) { case (acc, (f, v)) =>
          acc.withColumn(f, valueExpr(v)) }
        case other => throw bad(s"$op needs a document, got $other")
      }

      case "$group" => spec match {
        case d: DDoc =>
          val fs = d.fields.toMap
          val idSpec = fs.getOrElse("_id", throw bad("$group needs _id"))
          val aggs = d.fields.filter(_._1 != "_id").map { case (alias, aspec) =>
            groupAccumulator(aspec).as(alias) }
          val grouped = idSpec match {
            case DNull => df.groupBy() // global aggregate
            case v     => df.groupBy(valueExpr(v).as("_id"))
          }
          if (aggs.isEmpty) grouped.agg(count(lit(1)).as("__n")).drop("__n")
          else grouped.agg(aggs.head, aggs.tail: _*)
        case other => throw bad(s"$$group needs a document, got $other")
      }

      case "$sort" => spec match {
        case d: DDoc => df.orderBy(d.fields.map {
          case (f, DLong(1))  => col(f).asc
          case (f, DLong(-1)) => col(f).desc
          case (f, v) => throw bad(s"$$sort $f needs 1 or -1, got $v")
        }: _*)
        case other => throw bad(s"$$sort needs a document, got $other")
      }

      case "$limit" => spec match {
        case DLong(n) => df.limit(n.toInt)
        case other    => throw bad(s"$$limit needs an integer, got $other")
      }
      case "$skip" => spec match {
        case DLong(n) => df.offset(n.toInt)
        case other    => throw bad(s"$$skip needs an integer, got $other")
      }

      case "$unwind" =>
        val (path, preserve) = spec match {
          case DString(p) => (fieldPath(p), false)
          case d: DDoc =>
            val m = d.fields.toMap
            val p = m.get("path") match {
              case Some(DString(s)) => fieldPath(s)
              case other => throw bad(s"$$unwind.path needs a string, got $other")
            }
            (p, m.get("preserveNullAndEmptyArrays") == Some(DBool(true)))
          case other => throw bad(s"$$unwind needs a path, got $other")
        }
        // Mongo replaces the array field with each element in place
        df.withColumn(path,
          if (preserve) explode_outer(col(path)) else explode(col(path)))

      case "$count" => spec match {
        case DString(name) => df.agg(count(lit(1)).as(name))
        case other => throw bad(s"$$count needs a string, got $other")
      }

      case "$sortByCount" =>
        df.groupBy(valueExpr(spec).as("_id")).agg(count(lit(1)).as("count"))
          .orderBy(col("count").desc, col("_id"))

      case "$bucket" => spec match {
        case d: DDoc =>
          val m = d.fields.toMap
          val gb = valueExpr(m.getOrElse("groupBy",
            throw bad("$bucket needs groupBy")))
          val bounds = m.get("boundaries") match {
            case Some(DArray(bs)) if bs.size >= 2 => bs.map(valueExpr)
            case other => throw bad(s"$$bucket needs >=2 boundaries, got $other")
          }
          // bucket label = its inclusive lower bound; out-of-range rows
          // need `default` (Mongo errors without one — here they error at
          // analysis time only if no default and a row misses, which we
          // can't check statically, so require default like Mongo's
          // strict mode would)
          val inBuckets = bounds.sliding(2).toSeq.foldLeft(
            lit(null).cast("string").as("x")) { case (acc, Seq(lo, hi)) =>
            when(gb >= lo && gb < hi, lo.cast("string")).otherwise(acc)
          }
          val bucketed = m.get("default") match {
            case Some(dflt) => coalesce(inBuckets, valueExpr(dflt).cast("string"))
            case None       => inBuckets
          }
          val outs = m.get("output") match {
            case Some(o: DDoc) => o.fields.map { case (alias, aspec) =>
              groupAccumulator(aspec).as(alias) }
            case None    => Seq(count(lit(1)).as("count"))
            case Some(x) => throw bad(s"$$bucket.output needs a document, got $x")
          }
          df.groupBy(bucketed.as("_id")).agg(outs.head, outs.tail: _*)
            .orderBy(col("_id"))
        case other => throw bad(s"$$bucket needs a document, got $other")
      }

      case "$lookup" => spec match {
        case d: DDoc =>
          if (resolver == null) throw bad("$lookup needs a collection resolver")
          val m = d.fields.toMap
          def str(k: String): String = m.get(k) match {
            case Some(DString(s)) => s
            case other => throw bad(s"$$lookup.$k needs a string, got $other")
          }
          val (from, local, foreign, as) =
            (str("from"), str("localField"), str("foreignField"), str("as"))
          val fdf = resolver(from)
          // Mongo semantics: `as` becomes the ARRAY of matching foreign
          // docs (empty array when none). Group the foreign side first so
          // the join is 1:1 — no row multiplication, broadcast-eligible.
          val key = "__graft_lookup_key"
          val matched = fdf
            .groupBy(col(foreign).as(key))
            .agg(collect_list(struct(fdf.columns.map(col): _*)).as(as))
          df.join(matched, col(local) === col(key), "left_outer")
            .drop(key)
            .withColumn(as, coalesce(col(as), array()))
        case other => throw bad(s"$$lookup needs a document, got $other")
      }

      case other => throw bad(s"unsupported stage $other")
    }
    case other => throw bad(s"each stage must have exactly one operator, got $other")
  }

  private def groupAccumulator(spec: DocValue): Column = spec match {
    case DDoc(Seq((op, operand))) => op match {
      case "$sum" => operand match {
        case DLong(n)   => sum(lit(n))   // $sum: 1 is Mongo's COUNT idiom
        case DDouble(x) => sum(lit(x))
        case v          => sum(valueExpr(v))
      }
      case "$avg"      => avg(valueExpr(operand))
      case "$min"      => min(valueExpr(operand))
      case "$max"      => max(valueExpr(operand))
      case "$push"     => collect_list(valueExpr(operand))
      // sorted for determinism — Mongo leaves set order undefined
      case "$addToSet" => array_sort(collect_set(valueExpr(operand)))
      case "$count"    => operand match {
        case DDoc(Seq()) => count(lit(1))
        case other       => throw bad(s"$$count takes {}, got $other")
      }
      case other => throw bad(s"unsupported accumulator $other")
    }
    case other => throw bad(s"accumulator must be {op: operand}, got $other")
  }

  /** Aggregation expression language → Column. */
  def valueExpr(v: DocValue): Column = v match {
    case DString(s) if s.startsWith("$$") => lit(s) // system vars unsupported → literal
    case DString(s) if s.startsWith("$")  => col(fieldPath(s))
    case DString(s)     => lit(s)
    case DLong(l)       => lit(l)
    case DDouble(d)     => lit(d)
    case DBool(b)       => lit(b)
    case DNull          => lit(null)
    case DTimestamp(us) => toColumn(
      org.apache.spark.sql.catalyst.expressions.Literal(us,
        org.apache.spark.sql.types.TimestampType))
    case DArray(items)  => array(items.map(valueExpr): _*)
    case DDoc(Seq((op, operand))) if op.startsWith("$") => opExpr(op, operand)
    case d: DDoc => struct(d.fields.map { case (k, fv) =>
      valueExpr(fv).as(k) }: _*) // document literal → struct
    case other => throw bad(s"unsupported expression $other")
  }

  private def args(operand: DocValue): Seq[Column] = operand match {
    case DArray(items) => items.map(valueExpr)
    case single        => Seq(valueExpr(single))
  }
  private def arg2(op: String, operand: DocValue): (Column, Column) =
    args(operand) match {
      case Seq(a, b) => (a, b)
      case other     => throw bad(s"$op needs exactly 2 arguments, got ${other.size}")
    }

  private def opExpr(op: String, operand: DocValue): Column = op match {
    case "$literal"  => operand match {
      case DString(s) => lit(s)
      case v          => valueExpr(v) // non-string literals carry no $-meaning
    }
    // arithmetic
    case "$add"      => args(operand).reduce(_ + _)
    case "$multiply" => args(operand).reduce(_ * _)
    case "$subtract" => { val (a, b) = arg2(op, operand); a - b }
    case "$divide"   => { val (a, b) = arg2(op, operand); a / b }
    case "$mod"      => { val (a, b) = arg2(op, operand); a % b }
    case "$abs"      => abs(valueExpr(operand))
    case "$floor"    => floor(valueExpr(operand))
    case "$ceil"     => ceil(valueExpr(operand))
    case "$round"    => operand match {
      case DArray(Seq(e, DLong(d))) => round(valueExpr(e), d.toInt)
      case DArray(Seq(e))           => round(valueExpr(e), 0)
      case other => throw bad(s"$$round needs [expr, digits], got $other")
    }
    // string
    case "$concat"   => concat(args(operand): _*)
    case "$toUpper"  => upper(valueExpr(operand))
    case "$toLower"  => lower(valueExpr(operand))
    case "$trim"     => operand match {
      case d: DDoc => d.fields.toMap.get("input") match {
        case Some(in) => trim(valueExpr(in))
        case None     => throw bad("$trim needs {input: ...}")
      }
      case v => trim(valueExpr(v))
    }
    case "$strLenCP" => length(valueExpr(operand))
    case "$substrCP" => operand match {
      // Mongo is 0-based, Spark substring is 1-based
      case DArray(Seq(s, start, len)) =>
        substring(valueExpr(s), lit(1) + valueExpr(start), valueExpr(len))
      case other => throw bad(s"$$substrCP needs [str, start, len], got $other")
    }
    case "$split"    => { val (a, b) = arg2(op, operand); split(a, b.toString) }
    // date parts
    case "$year"       => year(valueExpr(operand))
    case "$month"      => month(valueExpr(operand))
    case "$dayOfMonth" => dayofmonth(valueExpr(operand))
    case "$hour"       => hour(valueExpr(operand))
    case "$minute"     => minute(valueExpr(operand))
    case "$second"     => second(valueExpr(operand))
    // comparison (expression context: always 2-arg)
    case "$eq"  => { val (a, b) = arg2(op, operand); a === b }
    case "$ne"  => { val (a, b) = arg2(op, operand); a =!= b }
    case "$gt"  => { val (a, b) = arg2(op, operand); a > b }
    case "$gte" => { val (a, b) = arg2(op, operand); a >= b }
    case "$lt"  => { val (a, b) = arg2(op, operand); a < b }
    case "$lte" => { val (a, b) = arg2(op, operand); a <= b }
    // boolean
    case "$and" => args(operand).reduce(_ && _)
    case "$or"  => args(operand).reduce(_ || _)
    case "$not" => !valueExpr(operand match {
      case DArray(Seq(x)) => x
      case x              => x
    })
    // conditional
    case "$cond" => operand match {
      case DArray(Seq(i, t, e)) => when(valueExpr(i), valueExpr(t))
        .otherwise(valueExpr(e))
      case d: DDoc =>
        val m = d.fields.toMap
        (m.get("if"), m.get("then"), m.get("else")) match {
          case (Some(i), Some(t), Some(e)) =>
            when(valueExpr(i), valueExpr(t)).otherwise(valueExpr(e))
          case _ => throw bad("$cond needs if/then/else")
        }
      case other => throw bad(s"$$cond needs [if,then,else], got $other")
    }
    case "$ifNull" => coalesce(args(operand): _*)
    // array
    case "$size"        => size(valueExpr(operand))
    // try_element_at: Mongo returns "missing" (null) out of bounds, but
    // ANSI-mode element_at throws
    case "$arrayElemAt" => operand match {
      // Mongo is 0-based (negative = from the end); Spark is 1-based
      case DArray(Seq(a, DLong(i))) =>
        val arr = valueExpr(a)
        if (i >= 0) try_element_at(arr, lit(i.toInt + 1))
        else try_element_at(arr, lit(i.toInt))
      case other => throw bad(s"$$arrayElemAt needs [array, idx], got $other")
    }
    case "$first" => try_element_at(valueExpr(operand), lit(1))
    case "$last"  => try_element_at(valueExpr(operand), lit(-1))
    case other => throw bad(s"unsupported expression operator $other")
  }

  /** `"$a.b"` → `a.b` column path (Spark resolves dots as nested access). */
  private def fieldPath(ref: String): String =
    if (ref.startsWith("$")) ref.drop(1) else ref

  private def bad(msg: String) =
    new IllegalArgumentException(s"mongo pipeline: $msg")
}
