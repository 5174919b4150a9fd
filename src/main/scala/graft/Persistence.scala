package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.ml.PipelineModel
import org.apache.spark.sql.SparkSession

import graft.idx.{CosSimIndexer, NameIndexer, SniIndexer}
import graft.ml.{SupervisedLayer, SupervisedModel}

/** Model persistence: parameters as JSON, ground truth as parquet, the
  * supervised pipeline via Spark ML's native writer.
  *
  * The reference persists Spark sub-objects + DataFrames as parquet and
  * non-spark objects via joblib (emm/helper/spark_custom_reader_writer.py:
  * 36-120). Here the fitted state that matters is (gt, indexer configs,
  * optional classifier); indexers are re-fit deterministically from the
  * persisted GT on load — the broadcast index is derived state, cheaper to
  * rebuild than to serialize.
  */
object Persistence {

  /** Escape for values embedded in the params JSON (user-supplied column
    * names / blacklist entries may contain quotes or backslashes).
    */
  private def esc(s: String): String =
    s.replace("\\", "\\\\").replace("\"", "\\\"")

  private def indexerToJson(ix: NameIndexer): String = ix match {
    case c: CosSimIndexer =>
      s"""{"type":"cossim","tokenizer":"${c.tokenizer}","ngram":${c.ngram},
         |"binary":${c.binary},"numCandidates":${c.numCandidates},
         |"lowerBound":${c.lowerBound},"vocabSize":${c.vocabSize},
         |"blocking":${c.blockingFunc.map("\"" + _ + "\"").getOrElse("null")}}"""
        .stripMargin.replaceAll("\n", "")
    case s: SniIndexer =>
      require(s.mappingFunc.isEmpty,
        "an SNI mappingFunc is an arbitrary closure and cannot be persisted")
      s"""{"type":"sni","window":${s.window},"maxGtPerName":${s.maxGtPerName}}"""
    case other =>
      throw new IllegalArgumentException(s"cannot persist indexer ${other.getClass}")
  }

  private def indexerFromJson(j: ujsonLite.Obj): NameIndexer =
    j.str("type") match {
      case "cossim" => new CosSimIndexer(
        tokenizer = j.str("tokenizer"), ngram = j.int("ngram"),
        binary = j.bool("binary"), numCandidates = j.int("numCandidates"),
        lowerBound = j.dbl("lowerBound"), vocabSize = j.int("vocabSize"),
        blockingFunc = j.strOpt("blocking"))
      case "sni" => new SniIndexer(window = j.int("window"), maxGtPerName = j.int("maxGtPerName"))
      case t => throw new IllegalArgumentException(s"unknown indexer type $t")
    }

  def save(model: EntityMatchingModel, path: String): Unit = {
    Files.createDirectories(Paths.get(path))
    val p  = model.matcher.params
    val ixs = model.matcher.indexers.map(indexerToJson).mkString("[", ",", "]")
    def strArr(xs: Seq[String]): String = xs.map("\"" + esc(_) + "\"").mkString("[", ",", "]")
    val extraCols = model.supervised.map(_.layer.extraFeatureCols).getOrElse(Nil)
    val json =
      s"""{"preprocessPipeline":"${esc(p.preprocessPipeline)}","nameCol":"${esc(p.nameCol)}",
         |"entityIdCol":"${esc(p.entityIdCol)}","uidCol":"${esc(p.uidCol)}",
         |"accountCol":"${esc(p.accountCol)}","freqCol":"${esc(p.freqCol)}",
         |"carryOnCols":${strArr(p.carryOnCols)},
         |"aggregationMethod":${model.effectiveAggregationMethod.map("\"" + esc(_) + "\"").getOrElse("null")},
         |"aggregationBlacklist":${strArr(p.aggregationBlacklist)},
         |"keepAllCols":${p.keepAllCols},"checkUid":${p.checkUid},
         |"partitionSize":${p.partitionSize.getOrElse(-1)},
         |"withNoMatches":${p.withNoMatches},"indexers":$ixs,
         |"extraFeatureCols":${strArr(extraCols)},
         |"hasSupervised":${model.supervised.isDefined}}"""
        .stripMargin.replaceAll("\n", "")
    Files.writeString(Paths.get(s"$path/params.json"), json)
    model.gt.write.mode("overwrite").parquet(s"$path/gt.parquet")
    model.supervised.foreach { sm =>
      sm.pipeline.write.overwrite().save(s"$path/supervised")
      // vocabulary as a flat word<TAB>tier list (fitted state, not derivable
      // from GT alone: the reference fits it on the training pairs)
      val vocabLines =
        sm.vocabulary.veryCommon.toSeq.sorted.map(w => s"$w\tvery_common") ++
        sm.vocabulary.common.toSeq.sorted.map(w => s"$w\tcommon")
      Files.writeString(Paths.get(s"$path/vocabulary.tsv"), vocabLines.mkString("\n"))
    }
  }

  def load(spark: SparkSession, path: String): EntityMatchingModel = {
    val j = ujsonLite.parse(Files.readString(Paths.get(s"$path/params.json")))
    val params = EmParams(
      preprocessPipeline = j.str("preprocessPipeline"),
      nameCol = j.str("nameCol"), entityIdCol = j.str("entityIdCol"),
      uidCol = j.str("uidCol"),
      accountCol = j.fields.get("accountCol").map(_ => j.str("accountCol"))
        .getOrElse(Cols.Account),
      freqCol = j.fields.get("freqCol").map(_ => j.str("freqCol"))
        .getOrElse(Cols.Freq),
      carryOnCols = j.strArr("carryOnCols"),
      aggregationMethod = j.strOpt("aggregationMethod"),
      aggregationBlacklist = j.strArr("aggregationBlacklist"),
      keepAllCols = j.fields.get("keepAllCols").exists(_ => j.bool("keepAllCols")),
      checkUid = j.fields.get("checkUid").exists(_ => j.bool("checkUid")),
      partitionSize = j.fields.get("partitionSize").map(_ => j.int("partitionSize"))
        .filter(_ > 0),
      withNoMatches = j.bool("withNoMatches"))
    val indexers = j.arr("indexers").map(indexerFromJson)
    val gt = spark.read.parquet(s"$path/gt.parquet")
    // gt.parquet is already normalized (uid/name/preprocessed) — refit directly
    val cs = new idx.CandidateSelection(indexers, params.carryOnCols,
      params.withNoMatches).fit(gt)
    val model = new EntityMatchingModel(new EntityMatcher(params, indexers), gt, cs)
    if (j.bool("hasSupervised")) {
      val pipeline = PipelineModel.load(s"$path/supervised")
      val scoreCols = indexers.indices.map(Cols.score)
      val extraCols = j.strArr("extraFeatureCols")
      val vocabPath = Paths.get(s"$path/vocabulary.tsv")
      val entries =
        if (Files.exists(vocabPath))
          Files.readString(vocabPath).split("\n").toSeq
            .filter(_.contains("\t")).map { l =>
              val Array(w, tier) = l.split("\t", 2); (w, tier)
            }
        else Nil
      val vocab = features.VocabularyModel(
        veryCommon = entries.collect { case (w, "very_common") => w }.toSet,
        common     = entries.collect { case (w, "common") => w }.toSet)
      model.supervised = Some(new SupervisedModel(
        new SupervisedLayer(scoreCols, extraFeatureCols = extraCols), pipeline, vocab))
    }
    model
  }
}

/** Minimal JSON reader for our own flat persistence format (no external deps
  * available offline; this is NOT a general JSON parser).
  */
private[graft] object ujsonLite {
  private def unescape(s: String): String =
    s.replace("\\\"", "\"").replace("\\\\", "\\")

  final case class Obj(fields: Map[String, String]) {
    def str(k: String): String =
      unescape(fields(k).stripPrefix("\"").stripSuffix("\""))
    def strOpt(k: String): Option[String] =
      fields.get(k).filter(_ != "null")
        .map(v => unescape(v.stripPrefix("\"").stripSuffix("\"")))
    def int(k: String): Int     = fields(k).toInt
    def dbl(k: String): Double  = fields(k).toDouble
    def bool(k: String): Boolean = fields(k).toBoolean
    def arr(k: String): Seq[Obj] = splitTopLevel(fields(k).stripPrefix("[").stripSuffix("]"))
      .filter(_.nonEmpty).map(s => parseObj(s))
    def strArr(k: String): Seq[String] = fields.get(k) match {
      case None => Nil
      case Some(v) => splitTopLevel(v.stripPrefix("[").stripSuffix("]"))
        .filter(_.nonEmpty).map(s => unescape(s.trim.stripPrefix("\"").stripSuffix("\"")))
    }
  }

  def parse(s: String): Obj = parseObj(s.trim)

  private def parseObj(s: String): Obj = {
    val body = s.trim.stripPrefix("{").stripSuffix("}")
    val fields = splitTopLevel(body).filter(_.contains(":")).map { kv =>
      val i = kv.indexOf(':')
      val k = kv.take(i).trim.stripPrefix("\"").stripSuffix("\"")
      k -> kv.drop(i + 1).trim
    }.toMap
    Obj(fields)
  }

  /** Split on commas not nested inside {} [] "" (escape-aware: a \" inside a
    * string must not toggle the string state).
    */
  private def splitTopLevel(s: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    val cur = new StringBuilder
    var depth = 0
    var inStr = false
    var escaped = false
    s.foreach { c =>
      if (escaped) { cur += c; escaped = false }
      else c match {
        case '\\' if inStr => cur += c; escaped = true
        case '"' => inStr = !inStr; cur += '"'
        case '{' | '[' if !inStr => depth += 1; cur += c
        case '}' | ']' if !inStr => depth -= 1; cur += c
        case ',' if depth == 0 && !inStr => out += cur.toString.trim; cur.clear()
        case _ => cur += c
      }
    }
    if (cur.nonEmpty) out += cur.toString.trim
    out.toSeq
  }
}
