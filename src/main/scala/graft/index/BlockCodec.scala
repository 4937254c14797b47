package graft.index

import java.io.ByteArrayOutputStream

/** Varint (unsigned LEB128) + gap encoding for posting blocks.
  *
  * The reference gap-encodes docIDs and gob-serializes the list
  * (`/root/reference/storage_rdb_Impl.go:192-248`); here each fixed-size
  * block packs docID deltas, term frequencies and document lengths as
  * varints into BinaryType columns, with Parquet zstd page compression on
  * top. decode(encode(x)) == x is property-tested (BlockCodecSpec).
  */
object BlockCodec {

  def writeVarint(out: ByteArrayOutputStream, v0: Long): Unit = {
    require(v0 >= 0, s"varint value must be non-negative, got $v0")
    var v = v0
    while ((v & ~0x7fL) != 0) {
      out.write(((v & 0x7f) | 0x80).toInt)
      v >>>= 7
    }
    out.write(v.toInt)
  }

  /** Pack values as raw varints. */
  def packVarints(values: Array[Long]): Array[Byte] = {
    val out = new ByteArrayOutputStream(values.length * 2)
    var i = 0
    while (i < values.length) { writeVarint(out, values(i)); i += 1 }
    out.toByteArray
  }

  /** Pack ascending values as gaps (first value absolute). */
  def packDeltas(values: Array[Long]): Array[Byte] = {
    val out = new ByteArrayOutputStream(values.length * 2)
    var prev = 0L
    var i = 0
    while (i < values.length) {
      val v = values(i)
      require(v >= prev, s"packDeltas requires ascending input ($prev -> $v)")
      writeVarint(out, v - prev)
      prev = v
      i += 1
    }
    out.toByteArray
  }

  def unpackVarints(bytes: Array[Byte], n: Int): Array[Long] = {
    val out = new Array[Long](n)
    var bi = 0
    var i = 0
    while (i < n) {
      var v = 0L
      var shift = 0
      var b = 0
      do {
        b = bytes(bi) & 0xff
        v |= (b & 0x7fL) << shift
        shift += 7
        bi += 1
      } while ((b & 0x80) != 0)
      out(i) = v
      i += 1
    }
    out
  }

  /** Inverse of packDeltas: prefix-sum the gaps back to absolute values. */
  def unpackDeltas(bytes: Array[Byte], n: Int): Array[Long] = {
    val out = unpackVarints(bytes, n)
    var i = 1
    while (i < n) { out(i) += out(i - 1); i += 1 }
    out
  }
}
