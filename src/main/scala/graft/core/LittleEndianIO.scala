package graft.core

import java.nio.{ByteBuffer, ByteOrder}

/**
 * Little-endian fixed-width (de)serialization of logical Long values — the layout of
 * the reference's raw binary file source/sink (reference: util/golomb.cpp:108-244,
 * native little-endian values) and of our PLAIN codec payload.
 */
object LittleEndianIO {

  def read(bytes: Array[Byte], t: PhysicalIntType): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val n = bytes.length / (t.width / 8)
    val out = new Array[Long](n)
    var i = 0
    t.width match {
      case 8  => while (i < n) { out(i) = t.extend(bb.get().toLong & 0xffL); i += 1 }
      case 16 => while (i < n) { out(i) = t.extend(bb.getShort().toLong & 0xffffL); i += 1 }
      case 32 => while (i < n) { out(i) = t.extend(bb.getInt().toLong & 0xffffffffL); i += 1 }
      case 64 => while (i < n) { out(i) = bb.getLong(); i += 1 }
    }
    out
  }

  def write(values: Array[Long], t: PhysicalIntType): Array[Byte] = {
    val bb = ByteBuffer.allocate(values.length * (t.width / 8)).order(ByteOrder.LITTLE_ENDIAN)
    var i = 0
    t.width match {
      case 8  => while (i < values.length) { bb.put(values(i).toByte); i += 1 }
      case 16 => while (i < values.length) { bb.putShort(values(i).toShort); i += 1 }
      case 32 => while (i < values.length) { bb.putInt(values(i).toInt); i += 1 }
      case 64 => while (i < values.length) { bb.putLong(values(i)); i += 1 }
    }
    bb.array()
  }
}
