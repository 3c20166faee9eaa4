package graft.sources

import org.apache.avro.{Schema, SchemaBuilder}
import org.apache.avro.generic.{GenericData, GenericRecord}
import org.apache.avro.mapred.AvroKey
import org.apache.avro.mapreduce.{AvroJob, AvroKeyInputFormat, AvroKeyOutputFormat}
import org.apache.hadoop.io.NullWritable
import org.apache.hadoop.mapreduce.Job
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Avro container-file source/sink over the Hadoop Avro formats.
  *
  * This Spark distribution ships avro core + avro-mapred but NOT the
  * `spark-avro` DataFrame connector, so the format is wired up the way any
  * external Hadoop format is: `newAPIHadoopFile` / `saveAsNewAPIHadoopFile`
  * with `AvroKey[GenericRecord]` and an explicit row↔record codec. RDD
  * usage here is the legitimate kind (a per-partition file codec, exactly
  * like the media codecs in [[graft.ext.Multimodal]]): records are created
  * and consumed INSIDE the task that reads/writes them — nothing
  * non-serializable crosses a stage boundary, no shuffle is introduced,
  * and the surrounding query remains declarative DataFrames.
  *
  * Supported column types: the primitive lanes a TPC-H-ish fixture needs
  * (LONG/INT/DOUBLE/FLOAT/BOOLEAN/STRING/BINARY), nullable via the
  * standard `union {null, T}`. Timestamps/decimals would take Avro logical
  * types — out of scope until a fixture needs them.
  */
object AvroTable {

  def avroSchema(st: StructType, name: String = "graft_record"): Schema = {
    val fields = SchemaBuilder.record(name).namespace("graft").fields()
    st.fields.foldLeft(fields) { (fs, f) =>
      val base = f.dataType match {
        case LongType => Schema.create(Schema.Type.LONG)
        case IntegerType => Schema.create(Schema.Type.INT)
        case DoubleType => Schema.create(Schema.Type.DOUBLE)
        case FloatType => Schema.create(Schema.Type.FLOAT)
        case BooleanType => Schema.create(Schema.Type.BOOLEAN)
        case StringType => Schema.create(Schema.Type.STRING)
        case BinaryType => Schema.create(Schema.Type.BYTES)
        case other => throw new IllegalArgumentException(
          s"unsupported Avro column type $other for field ${f.name}")
      }
      // null is only a legal default for the nullable union — Avro rejects
      // withDefault(null) on a plain primitive field (AvroTypeException at
      // write time), so non-nullable fields take noDefault()
      if (f.nullable)
        fs.name(f.name)
          .`type`(Schema.createUnion(Schema.create(Schema.Type.NULL), base))
          .withDefault(null)
      else fs.name(f.name).`type`(base).noDefault()
    }.endRecord()
  }

  private def toAvro(v: Any): AnyRef = v match {
    case null => null
    case b: Array[Byte] => java.nio.ByteBuffer.wrap(b)
    case other => other.asInstanceOf[AnyRef] // boxed primitives + String
  }

  private def fromAvro(v: Any, dt: DataType): Any = (v, dt) match {
    case (null, _) => null
    case (u: org.apache.avro.util.Utf8, StringType) => u.toString
    case (s: CharSequence, StringType) => s.toString
    case (bb: java.nio.ByteBuffer, BinaryType) =>
      val b = new Array[Byte](bb.remaining()); bb.duplicate().get(b); b
    case (other, _) => other
  }

  /** Write `df` as Avro container files at `path` (overwrite). */
  def write(df: DataFrame, path: String): Unit = {
    val st = df.schema
    val schemaJson = avroSchema(st).toString
    val sc = df.sparkSession.sparkContext
    val job = Job.getInstance(sc.hadoopConfiguration)
    AvroJob.setOutputKeySchema(job, new Schema.Parser().parse(schemaJson))
    val out = new org.apache.hadoop.fs.Path(path)
    val fs = out.getFileSystem(sc.hadoopConfiguration)
    if (fs.exists(out)) fs.delete(out, true)
    df.rdd.mapPartitions { it =>
      val schema = new Schema.Parser().parse(schemaJson) // per-task parse
      it.map { row =>
        val rec = new GenericData.Record(schema)
        var i = 0
        while (i < row.length) {
          rec.put(i, toAvro(if (row.isNullAt(i)) null else row.get(i)))
          i += 1
        }
        (new AvroKey[GenericRecord](rec), NullWritable.get())
      }
    }.saveAsNewAPIHadoopFile(path, classOf[AvroKey[GenericRecord]],
      classOf[NullWritable], classOf[AvroKeyOutputFormat[GenericRecord]],
      job.getConfiguration)
  }

  /** Read Avro container files at `path` into rows of `schema` (the reader
    * schema — Avro resolves it against each file's writer schema, so adding
    * trailing nullable columns later stays compatible). */
  def read(spark: SparkSession, path: String, schema: StructType): DataFrame = {
    val schemaJson = avroSchema(schema).toString
    val job = Job.getInstance(spark.sparkContext.hadoopConfiguration)
    AvroJob.setInputKeySchema(job, new Schema.Parser().parse(schemaJson))
    val fields = schema.fields.map(f => (f.name, f.dataType))
    val rdd = spark.sparkContext.newAPIHadoopFile(path,
      classOf[AvroKeyInputFormat[GenericRecord]],
      classOf[AvroKey[GenericRecord]], classOf[NullWritable],
      job.getConfiguration)
      .mapPartitions { it =>
        // the record reader reuses its datum: extract plain JVM values
        // immediately, never let the GenericRecord escape this iterator
        it.map { case (k, _) =>
          val rec = k.datum()
          Row.fromSeq(fields.toIndexedSeq.map { case (n, dt) =>
            fromAvro(rec.get(n), dt)
          })
        }
      }
    spark.createDataFrame(rdd, schema)
  }
}
