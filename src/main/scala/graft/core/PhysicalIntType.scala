package graft.core

/**
 * Descriptor for the eight physical integer widths the codec family supports.
 *
 * Mirrors the reference's `data_type` enum (reference: util/golomb.cpp:353-363) and the
 * `std::integral` type family accepted by the codec (reference: src/golomb.h:43-57).
 * The JVM has only signed integrals, so values of every width/signedness ride in a
 * `Long`: signed values are sign-extended, unsigned values are zero-extended, and u64
 * is a raw 64-bit pattern whose comparisons must use `java.lang.Long.compareUnsigned`.
 */
sealed abstract class PhysicalIntType(
    val id: Byte,
    val name: String,
    val width: Int,
    val signed: Boolean) extends Serializable {

  /** Low-`width` bits mask (all ones for width 64). */
  val widthMask: Long = if (width == 64) -1L else (1L << width) - 1L

  /** Sign-extend an in-range raw pattern back to the logical Long value. */
  @inline final def extend(raw: Long): Long =
    if (signed && width < 64) (raw << (64 - width)) >> (64 - width)
    else if (width < 64) raw & widthMask
    else raw

  /**
   * Zigzag-map a logical value to its unsigned w-bit pattern.
   * Signed: `s<0 -> (~s<<1)+1`, `s>=0 -> s<<1` (reference: src/golomb.h:118-129);
   * identity for unsigned (src/golomb.h:131-135). The arithmetic is done in Long and
   * masked to `width` bits, which equals the reference's in-type computation because
   * sign-extension preserves the w-bit two's-complement pattern.
   */
  @inline final def toUnsigned(v: Long): Long =
    if (signed) (((v << 1) ^ (v >> 63))) & widthMask
    else v & widthMask

  /**
   * Inverse of [[toUnsigned]]: odd -> negative (reference: src/golomb.h:137-149),
   * identity for unsigned (src/golomb.h:151-155). Returns the logical Long value.
   */
  @inline final def toIntegral(u: Long): Long =
    if (signed) extend((u >>> 1) ^ -(u & 1L))
    else u & widthMask
}

object PhysicalIntType {
  case object I8  extends PhysicalIntType(0, "i8",  8,  signed = true)
  case object U8  extends PhysicalIntType(1, "u8",  8,  signed = false)
  case object I16 extends PhysicalIntType(2, "i16", 16, signed = true)
  case object U16 extends PhysicalIntType(3, "u16", 16, signed = false)
  case object I32 extends PhysicalIntType(4, "i32", 32, signed = true)
  case object U32 extends PhysicalIntType(5, "u32", 32, signed = false)
  case object I64 extends PhysicalIntType(6, "i64", 64, signed = true)
  case object U64 extends PhysicalIntType(7, "u64", 64, signed = false)

  val all: Seq[PhysicalIntType] = Seq(I8, U8, I16, U16, I32, U32, I64, U64)

  private val byName: Map[String, PhysicalIntType] = all.map(t => t.name -> t).toMap
  private val byId: Array[PhysicalIntType] = all.sortBy(_.id).toArray

  def fromName(name: String): PhysicalIntType =
    byName.getOrElse(name.toLowerCase,
      throw new IllegalArgumentException(s"unknown physical int type '$name'"))

  def fromId(id: Byte): PhysicalIntType = {
    require(id >= 0 && id < byId.length, s"unknown physical int type id $id")
    byId(id)
  }
}
