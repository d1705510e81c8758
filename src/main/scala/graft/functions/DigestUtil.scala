package graft.functions

/** Shared md5 plumbing for the engine-portable hash families (SimHash's
  * token hash, MinHash's double-hash pair): one thread-local digest and
  * one big-endian 8-byte parse, so the two families cannot diverge in
  * digest handling or endianness.
  */
private[functions] object DigestUtil {
  // MessageDigest is stateful and not thread-safe; one per executor thread
  val md5 = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** Big-endian signed long from 8 digest bytes at `o` — the value of
    * hex chars [2o+1, 2o+16] of the printed digest, which is what the
    * SQL oracles parse positionally.
    */
  @inline def beLong(d: Array[Byte], o: Int): Long =
    ((d(o) & 0xffL) << 56) | ((d(o + 1) & 0xffL) << 48) |
      ((d(o + 2) & 0xffL) << 40) | ((d(o + 3) & 0xffL) << 32) |
      ((d(o + 4) & 0xffL) << 24) | ((d(o + 5) & 0xffL) << 16) |
      ((d(o + 6) & 0xffL) << 8) | (d(o + 7) & 0xffL)
}
