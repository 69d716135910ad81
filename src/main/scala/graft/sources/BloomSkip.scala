package graft.sources

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.column.Encoding
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.parquet.io.api.Binary

import scala.jdk.CollectionConverters._

/** Footer-level POINT-LOOKUP skip measurement — the equality half of
  * the skip-index story, next to [[ZOrderLayout]]'s min/max half.
  *
  * Min/max statistics prune RANGE predicates on clustered columns; a
  * point lookup on a high-cardinality id inside a file that is NOT
  * sorted by that id (a z-ordered store file, a bucket file holding
  * thousands of interleaved entities) gets nothing from min/max — the
  * id domain spans every row group. Parquet gives the scan two
  * footer/chunk-local answers to "is this exact value definitely
  * absent from this row group?", and parquet-mr's own row-group
  * filters consult BOTH, so this probe does too:
  *
  *   - split-block BLOOM filters (the ClickHouse `bloom_filter`
  *     skip-index class) on chunks that have non-dictionary pages —
  *     the stores write them on their id columns (canonical_id /
  *     doc_id; [[StatementStore]], [[DocStore]]);
  *   - the DICTIONARY page itself, when every data page of the chunk
  *     is dictionary-encoded — an EXACT membership test, which is
  *     precisely why parquet-mr declines to write a bloom filter for
  *     such chunks (measured: fully-dict chunks carry no bloom).
  *
  * This is measurement-side only: Spark's parquet reader applies the
  * same dictionary/bloom row-group filters when a query pushes an
  * equality predicate, so the probe quantifies what production scans
  * skip.
  */
object BloomSkip {

  /** For every row group of every parquet file under `dir`: can the
    * `column`'s bloom filter OR its full dictionary prove `value`
    * absent? Returns (skippable, covered, total) — row groups provably
    * value-free, row groups carrying either filter kind, and all row
    * groups. `value` may be a String or a Long (the stores' id types).
    */
  def skippableRowGroups(
      dir: String, column: String, value: Any): (Int, Int, Int) = {
    val conf = new Configuration()
    val dirPath = new Path(dir)
    val fs = dirPath.getFileSystem(conf)
    val files = fs.listStatus(dirPath)
      .filter(st => st.isFile && st.getPath.getName.endsWith(".parquet"))
      .sortBy(_.getPath.getName)
    var skippable = 0; var covered = 0; var total = 0
    files.foreach { f =>
      val reader = ParquetFileReader.open(HadoopInputFile.fromPath(
        f.getPath, conf))
      try {
        val schema = reader.getFooter.getFileMetaData.getSchema
        reader.getFooter.getBlocks.asScala.foreach { block =>
          total += 1
          block.getColumns.asScala
            .find(_.getPath.toDotString == column)
            .foreach { chunk =>
              val bloom = reader.getBloomFilterDataReader(block)
                .readBloomFilter(chunk)
              val stats = chunk.getEncodingStats
              val fullyDict = stats != null &&
                !stats.hasNonDictionaryEncodedPages()
              // probe-value type vs the column's PHYSICAL type, checked
              // up front: a String probe on an INT64 column (or any
              // unknown value type) must yield the documented
              // conservative answer — covered but unproven — not a
              // ClassCastException out of parquet's hash/decode
              // internals
              import org.apache.parquet.schema.PrimitiveType.{PrimitiveTypeName => P}
              val ptype = schema.getColumnDescription(
                chunk.getPath.toArray).getPrimitiveType.getPrimitiveTypeName
              if (bloom != null) {
                covered += 1
                val h: Option[Long] = (value, ptype) match {
                  case (s: String, P.BINARY) =>
                    Some(bloom.hash(Binary.fromString(s)))
                  case (l: Long, P.INT64) => Some(bloom.hash(l))
                  case (i: Int, P.INT32) => Some(bloom.hash(i))
                  case _ => None // type mismatch: cannot prove absent
                }
                if (h.exists(x => !bloom.findHash(x))) skippable += 1
              } else if (fullyDict) {
                covered += 1
                val desc = schema.getColumnDescription(
                  chunk.getPath.toArray)
                // the concrete DictionaryPageReader is package-private;
                // go through its public DictionaryPageReadStore face
                val store: org.apache.parquet.column.page.DictionaryPageReadStore =
                  reader.getDictionaryReader(block)
                val page = store.readDictionaryPage(desc)
                if (page != null) {
                  val dict = page.getEncoding match {
                    case Encoding.PLAIN_DICTIONARY | Encoding.PLAIN =>
                      Encoding.PLAIN_DICTIONARY.initDictionary(desc, page)
                    case e => e.initDictionary(desc, page)
                  }
                  val n = dict.getMaxId
                  val found = (value, ptype) match {
                    case (s: String, P.BINARY) =>
                      val b = Binary.fromString(s)
                      (0 to n).exists(i => dict.decodeToBinary(i) == b)
                    case (l: Long, P.INT64) => (0 to n).exists(i =>
                      dict.decodeToLong(i) == l)
                    case (i0: Int, P.INT32) => (0 to n).exists(i =>
                      dict.decodeToInt(i) == i0)
                    case _ => true // type mismatch: cannot prove absent
                  }
                  if (!found) skippable += 1
                }
              }
            }
        }
      } finally reader.close()
    }
    (skippable, covered, total)
  }
}
