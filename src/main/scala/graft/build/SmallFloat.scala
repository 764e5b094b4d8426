package graft.build

/** Lucene-compatible 1-byte length-norm quantization ("SmallFloat"
  * 4-bit-mantissa float, as used by Lucene 8's default similarity for the
  * per-document field-length norm). The reference never configures a
  * Similarity, so its scores use exactly this quantization
  * (reference: Lucene.java — no setSimilarity anywhere; BM25 default).
  *
  * Encoding: values 0..7 are stored verbatim ("subnormal"); larger values
  * keep their 4 most significant bits (top bit implicit) plus a shift,
  * i.e. lengths are rounded DOWN to 4-bit precision. Decode is exact on
  * encoded values. Replicating this is required for rank-identical BM25
  * on long documents (SURVEY.md §2.8, §7.3).
  */
object SmallFloat {

  /** Encode a non-negative int (document position count) to one byte. */
  def intToByte4(i: Int): Byte = {
    require(i >= 0, s"negative length $i")
    val numBits = 32 - Integer.numberOfLeadingZeros(i)
    if (numBits < 4) i.toByte
    else {
      val shift = numBits - 4
      var encoded = (i >>> shift) & 0x07 // drop the implicit top bit
      encoded |= (shift + 1) << 3
      encoded.toByte
    }
  }

  /** Decode a norm byte back to the quantized length. */
  def byte4ToInt(b: Byte): Int = {
    val i = b & 0xff
    val bits = i & 0x07
    val shift = (i >>> 3) - 1
    if (shift == -1) bits else (bits | 0x08) << shift
  }

  /** Quantized length: encode-then-decode. */
  def quantize(len: Int): Int = byte4ToInt(intToByte4(len))
}
