package graft.sources

import org.apache.thrift.protocol.{TBinaryProtocol, TField, TList, TMap, TProtocol, TProtocolUtil, TStruct, TType}
import org.apache.thrift.transport.TMemoryBuffer
import org.apache.spark.sql.{Dataset, SparkSession}

import graft.model._

/** Compatibility codec for the reference's on-disk corpus format: one
  * Thrift-`TBinaryProtocol`-encoded `Record` per file
  * (`/root/reference/src/.../SerializationHandler.java:64-72`,
  * `HadoopCuratorClient.java:83-104`; struct layout
  * `curator-interfaces/curator.thrift:29-44` and the generated base types).
  *
  * Hand-rolled field walker (no generated classes): unknown fields are
  * skipped, absent optionals default (`source=""`, `score=0.0`), and the
  * per-view `rawText` copies the reference duplicates into every view are
  * dropped on read — the engine keeps one canonical `rawText` per record.
  *
  * This is a *boundary* codec: corpora are converted to Parquet on ingest
  * (columnar, splittable); Thrift files are only read/written at the edges.
  */
object ThriftCompat {

  // ------------------------------------------------------------------ read

  def readRecord(bytes: Array[Byte]): Record = {
    val proto = new TBinaryProtocol(
      new org.apache.thrift.transport.TMemoryInputTransport(bytes))
    readRecordStruct(proto)
  }

  private def readRecordStruct(p: TProtocol): Record = {
    var identifier = ""; var rawText = ""; var whitespaced = false
    var labelViews = Map.empty[String, Labeling]
    var clusterViews = Map.empty[String, Clustering]
    var parseViews = Map.empty[String, Forest]
    var views = Map.empty[String, GView]
    foreachField(p) { f =>
      (f.id, f.`type`) match {
        case (1, TType.STRING) => identifier = p.readString()
        case (2, TType.STRING) => rawText = p.readString()
        case (3, TType.MAP) => labelViews = readViewMap(p, readLabeling)
        case (4, TType.MAP) => clusterViews = readViewMap(p, readClustering)
        case (5, TType.MAP) => parseViews = readViewMap(p, readForest)
        case (6, TType.MAP) => views = readViewMap(p, readView)
        case (7, TType.BOOL) => whitespaced = p.readBool()
        case _ => TProtocolUtil.skip(p, f.`type`)
      }
    }
    Record(identifier, rawText, labelViews, clusterViews, parseViews, views, whitespaced)
  }

  private def foreachField(p: TProtocol)(handle: TField => Unit): Unit = {
    p.readStructBegin()
    var f = p.readFieldBegin()
    while (f.`type` != TType.STOP) {
      handle(f)
      p.readFieldEnd()
      f = p.readFieldBegin()
    }
    p.readStructEnd()
  }

  private def readViewMap[T](p: TProtocol, readValue: TProtocol => T): Map[String, T] = {
    val m = p.readMapBegin()
    val out = Map.newBuilder[String, T]
    for (_ <- 0 until m.size) out += (p.readString() -> readValue(p))
    p.readMapEnd()
    out.result()
  }

  private def readList[T](p: TProtocol, readElem: TProtocol => T): Vector[T] = {
    val l = p.readListBegin()
    val out = Vector.newBuilder[T]
    for (_ <- 0 until l.size) out += readElem(p)
    p.readListEnd()
    out.result()
  }

  private def readSpan(p: TProtocol): Span = {
    var start = 0; var ending = 0; var label = ""; var score = 0.0; var source = ""
    var attributes = Map.empty[String, String]
    foreachField(p) { f =>
      (f.id, f.`type`) match {
        case (1, TType.I32) => start = p.readI32()
        case (2, TType.I32) => ending = p.readI32()
        case (3, TType.STRING) => label = p.readString()
        case (4, TType.DOUBLE) => score = p.readDouble()
        case (5, TType.STRING) => source = p.readString()
        case (6, TType.MAP) =>
          val m = p.readMapBegin()
          val b = Map.newBuilder[String, String]
          for (_ <- 0 until m.size) b += (p.readString() -> p.readString())
          p.readMapEnd()
          attributes = b.result()
        case _ => TProtocolUtil.skip(p, f.`type`) // 7: multiIndex (dropped)
      }
    }
    Span(start, ending, label, score, source, attributes)
  }

  private def readLabeling(p: TProtocol): Labeling = {
    var labels = Vector.empty[Span]; var source = ""; var score = 0.0
    foreachField(p) { f =>
      (f.id, f.`type`) match {
        case (1, TType.LIST) => labels = readList(p, readSpan)
        case (2, TType.STRING) => source = p.readString()
        case (3, TType.DOUBLE) => score = p.readDouble()
        case _ => TProtocolUtil.skip(p, f.`type`) // 4: per-view rawText copy
      }
    }
    Labeling(labels, source, score)
  }

  private def readClustering(p: TProtocol): Clustering = {
    var clusters = Vector.empty[Labeling]; var source = ""; var score = 0.0
    foreachField(p) { f =>
      (f.id, f.`type`) match {
        case (1, TType.LIST) => clusters = readList(p, readLabeling)
        case (2, TType.STRING) => source = p.readString()
        case (3, TType.DOUBLE) => score = p.readDouble()
        case _ => TProtocolUtil.skip(p, f.`type`)
      }
    }
    Clustering(clusters, source, score)
  }

  private def readNode(p: TProtocol): TreeNode = {
    var label = ""; var span: Span = Span(0, 0, "", 0.0, "", Map.empty)
    var children = Map.empty[Int, String]; var score = 0.0
    foreachField(p) { f =>
      (f.id, f.`type`) match {
        case (1, TType.STRING) => label = p.readString()
        case (2, TType.STRUCT) => span = readSpan(p)
        case (3, TType.MAP) =>
          val m = p.readMapBegin()
          val b = Map.newBuilder[Int, String]
          for (_ <- 0 until m.size) b += (p.readI32() -> p.readString())
          p.readMapEnd()
          children = b.result()
        case (5, TType.DOUBLE) => score = p.readDouble()
        case _ => TProtocolUtil.skip(p, f.`type`) // 4: node source
      }
    }
    TreeNode(label, span, children, score)
  }

  private def readTree(p: TProtocol): Tree = {
    var nodes = Vector.empty[TreeNode]; var top = 0; var score = 0.0
    foreachField(p) { f =>
      (f.id, f.`type`) match {
        case (1, TType.LIST) => nodes = readList(p, readNode)
        case (2, TType.I32) => top = p.readI32()
        case (4, TType.DOUBLE) => score = p.readDouble()
        case _ => TProtocolUtil.skip(p, f.`type`) // 3: tree source
      }
    }
    Tree(nodes, top, score)
  }

  private def readForest(p: TProtocol): Forest = {
    var trees = Vector.empty[Tree]; var source = ""
    foreachField(p) { f =>
      (f.id, f.`type`) match {
        case (1, TType.LIST) => trees = readList(p, readTree)
        case (3, TType.STRING) => source = p.readString()
        case _ => TProtocolUtil.skip(p, f.`type`) // 2: rawText copy
      }
    }
    Forest(trees, source)
  }

  private def readRelation(p: TProtocol): SpanRelation = {
    var start = 0; var ending = 0; var label = ""; var score = 0.0
    foreachField(p) { f =>
      (f.id, f.`type`) match {
        case (1, TType.I32) => start = p.readI32()
        case (2, TType.I32) => ending = p.readI32()
        case (3, TType.STRING) => label = p.readString()
        case (5, TType.DOUBLE) => score = p.readDouble()
        case _ => TProtocolUtil.skip(p, f.`type`)
      }
    }
    SpanRelation(start, ending, label, score)
  }

  private def readView(p: TProtocol): GView = {
    var spans = Vector.empty[Span]; var relations = Vector.empty[SpanRelation]
    var source = ""; var score = 0.0
    foreachField(p) { f =>
      (f.id, f.`type`) match {
        case (1, TType.LIST) => spans = readList(p, readSpan)
        case (2, TType.LIST) => relations = readList(p, readRelation)
        case (4, TType.STRING) => source = p.readString()
        case (5, TType.DOUBLE) => score = p.readDouble()
        case _ => TProtocolUtil.skip(p, f.`type`)
      }
    }
    GView(spans, relations, source, score)
  }

  // ----------------------------------------------------------------- write

  def writeRecord(r: Record): Array[Byte] = {
    val buf = new TMemoryBuffer(4096)
    val p = new TBinaryProtocol(buf)
    writeRecordStruct(p, r)
    java.util.Arrays.copyOf(buf.getArray, buf.length())
  }

  private def writeRecordStruct(p: TProtocol, r: Record): Unit = {
    p.writeStructBegin(new TStruct("Record"))
    writeStr(p, 1, r.identifier)
    writeStr(p, 2, r.rawText)
    writeMap(p, 3, r.labelViews)(writeLabeling)
    writeMap(p, 4, r.clusterViews)(writeClustering)
    writeMap(p, 5, r.parseViews)(writeForest)
    writeMap(p, 6, r.views)(writeView)
    p.writeFieldBegin(new TField("whitespaced", TType.BOOL, 7))
    p.writeBool(r.whitespaced)
    p.writeFieldEnd()
    p.writeFieldStop()
    p.writeStructEnd()
  }

  private def writeStr(p: TProtocol, id: Short, v: String): Unit = {
    p.writeFieldBegin(new TField("", TType.STRING, id))
    p.writeString(v)
    p.writeFieldEnd()
  }
  private def writeDbl(p: TProtocol, id: Short, v: Double): Unit = {
    p.writeFieldBegin(new TField("", TType.DOUBLE, id))
    p.writeDouble(v)
    p.writeFieldEnd()
  }
  private def writeI32(p: TProtocol, id: Short, v: Int): Unit = {
    p.writeFieldBegin(new TField("", TType.I32, id))
    p.writeI32(v)
    p.writeFieldEnd()
  }
  private def writeMap[T](p: TProtocol, id: Short, m: Map[String, T])(writeValue: (TProtocol, T) => Unit): Unit = {
    p.writeFieldBegin(new TField("", TType.MAP, id))
    p.writeMapBegin(new TMap(TType.STRING, TType.STRUCT, m.size))
    // deterministic bytes: sort map keys
    for ((k, v) <- m.toSeq.sortBy(_._1)) { p.writeString(k); writeValue(p, v) }
    p.writeMapEnd()
    p.writeFieldEnd()
  }
  private def writeList[T](p: TProtocol, id: Short, xs: Seq[T])(writeElem: (TProtocol, T) => Unit): Unit = {
    p.writeFieldBegin(new TField("", TType.LIST, id))
    p.writeListBegin(new TList(TType.STRUCT, xs.size))
    xs.foreach(writeElem(p, _))
    p.writeListEnd()
    p.writeFieldEnd()
  }

  private def writeSpan(p: TProtocol, s: Span): Unit = {
    p.writeStructBegin(new TStruct("Span"))
    writeI32(p, 1, s.start)
    writeI32(p, 2, s.ending)
    writeStr(p, 3, s.label)
    writeDbl(p, 4, s.score)
    writeStr(p, 5, s.source)
    if (s.attributes.nonEmpty) {
      p.writeFieldBegin(new TField("", TType.MAP, 6))
      p.writeMapBegin(new TMap(TType.STRING, TType.STRING, s.attributes.size))
      for ((k, v) <- s.attributes.toSeq.sortBy(_._1)) { p.writeString(k); p.writeString(v) }
      p.writeMapEnd()
      p.writeFieldEnd()
    }
    p.writeFieldStop()
    p.writeStructEnd()
  }

  private def writeLabeling(p: TProtocol, l: Labeling): Unit = {
    p.writeStructBegin(new TStruct("Labeling"))
    writeList(p, 1, l.labels)(writeSpan)
    writeStr(p, 2, l.source)
    writeDbl(p, 3, l.score)
    p.writeFieldStop()
    p.writeStructEnd()
  }

  private def writeClustering(p: TProtocol, c: Clustering): Unit = {
    p.writeStructBegin(new TStruct("Clustering"))
    writeList(p, 1, c.clusters)(writeLabeling)
    writeStr(p, 2, c.source)
    writeDbl(p, 3, c.score)
    p.writeFieldStop()
    p.writeStructEnd()
  }

  private def writeNode(p: TProtocol, n: TreeNode): Unit = {
    p.writeStructBegin(new TStruct("Node"))
    writeStr(p, 1, n.label)
    p.writeFieldBegin(new TField("", TType.STRUCT, 2))
    writeSpan(p, n.span)
    p.writeFieldEnd()
    if (n.children.nonEmpty) {
      p.writeFieldBegin(new TField("", TType.MAP, 3))
      p.writeMapBegin(new TMap(TType.I32, TType.STRING, n.children.size))
      for ((k, v) <- n.children.toSeq.sortBy(_._1)) { p.writeI32(k); p.writeString(v) }
      p.writeMapEnd()
      p.writeFieldEnd()
    }
    writeDbl(p, 5, n.score)
    p.writeFieldStop()
    p.writeStructEnd()
  }

  private def writeTree(p: TProtocol, t: Tree): Unit = {
    p.writeStructBegin(new TStruct("Tree"))
    writeList(p, 1, t.nodes)(writeNode)
    writeI32(p, 2, t.top)
    writeDbl(p, 4, t.score)
    p.writeFieldStop()
    p.writeStructEnd()
  }

  private def writeForest(p: TProtocol, f: Forest): Unit = {
    p.writeStructBegin(new TStruct("Forest"))
    writeList(p, 1, f.trees)(writeTree)
    writeStr(p, 3, f.source)
    p.writeFieldStop()
    p.writeStructEnd()
  }

  private def writeRelation(p: TProtocol, r: SpanRelation): Unit = {
    p.writeStructBegin(new TStruct("Relation"))
    writeI32(p, 1, r.start)
    writeI32(p, 2, r.ending)
    writeStr(p, 3, r.label)
    writeDbl(p, 5, r.score)
    p.writeFieldStop()
    p.writeStructEnd()
  }

  private def writeView(p: TProtocol, v: GView): Unit = {
    p.writeStructBegin(new TStruct("View"))
    writeList(p, 1, v.spans)(writeSpan)
    writeList(p, 2, v.relations)(writeRelation)
    writeStr(p, 4, v.source)
    writeDbl(p, 5, v.score)
    p.writeFieldStop()
    p.writeStructEnd()
  }

  // --------------------------------------------------------- Spark source

  /** D1+D2 compat: read a directory of per-document Thrift record files as a
    * Dataset[Record]. `binaryFile` gives one row per file with locality, the
    * decode is a narrow map. */
  def readThriftDir(spark: SparkSession, dir: String): Dataset[Record] = {
    import spark.implicits._
    spark.read.format("binaryFile").load(dir)
      .select("content").as[Array[Byte]]
      .map(readRecord)
  }

  /** D7 compat sink: one `<identifier>.txt` Thrift file per record
    * (`HadoopCuratorClient.java:119-121`). Per-partition writers, no
    * driver-side loop. */
  def writeThriftDir(ds: Dataset[Record], dir: String): Unit = {
    val d = dir
    ds.foreachPartition { (it: Iterator[Record]) =>
      val hconf = new org.apache.hadoop.conf.Configuration()
      val base = new org.apache.hadoop.fs.Path(d)
      val fs = base.getFileSystem(hconf)
      fs.mkdirs(base)
      it.foreach { r =>
        val out = fs.create(new org.apache.hadoop.fs.Path(base, s"${r.identifier}.txt"), true)
        try out.write(writeRecord(r)) finally out.close()
      }
    }
  }
}
