package graft.functions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodegenFallback, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.sql.graftshim.ShimTypes
import org.apache.spark.unsafe.types.UTF8String

import graft.codec.{IntBlockCodec, StringBlockCodec}
import graft.core.{GolombCodec, PhysicalIntType}

/**
 * Catalyst expressions exposing the codec family to SQL/DataFrame plans
 * (the UDF/UDAF surface mandated by SURVEY.md §2.2; reference CLI contract
 * util/golomb.cpp:253-329 maps to the (k, type-string) arguments).
 *
 * The heavy work is array-kernel sized (one call per block, not per scalar), so
 * CodegenFallback costs nothing measurable; the scalar zigzag pair implements
 * doGenCode and stays inside whole-stage codegen.
 */
object GraftExprUtil {
  /** The integral array shapes every codec expression accepts (analysis-time). */
  val IntegralArrays: ShimTypes.AbstractDataType = ShimTypes.typeCollection(
    ArrayType(LongType), ArrayType(IntegerType), ArrayType(ShortType), ArrayType(ByteType))

  def elementTypeOf(dt: DataType): PhysicalIntType = dt match {
    case ArrayType(LongType, _) => PhysicalIntType.I64
    case ArrayType(IntegerType, _) => PhysicalIntType.I32
    case ArrayType(ShortType, _) => PhysicalIntType.I16
    case ArrayType(ByteType, _) => PhysicalIntType.I8
    case other => throw new IllegalArgumentException(s"unsupported element type $other")
  }

  @inline private def getter(arr: ArrayData, dt: DataType): Int => Long = dt match {
    case ArrayType(LongType, _) => arr.getLong
    case ArrayType(IntegerType, _) => i => arr.getInt(i).toLong
    case ArrayType(ShortType, _) => i => arr.getShort(i).toLong
    case ArrayType(ByteType, _) => i => arr.getByte(i).toLong
    case other => throw new IllegalArgumentException(s"unsupported element type $other")
  }

  /** Values for a NULL-FREE bitstream. ArrayData.toLongArray & friends IGNORE
    * validity bits (an unsafe array's null slot reads as garbage/0), so null
    * elements must be rejected loudly here — silently encoding null as 0 is
    * data corruption. */
  def toLongs(arr: ArrayData, dt: DataType, exprName: String): Array[Long] = {
    val n = arr.numElements()
    val get = getter(arr, dt)
    val out = new Array[Long](n)
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i))
        throw new IllegalArgumentException(
          s"$exprName: array element $i is NULL — the bare reference bitstream has no " +
          "validity; filter nulls out, or use graft_encode/graft_decode (nullable blocks)")
      out(i) = get(i)
      i += 1
    }
    out
  }

  /** Analysis-time validation of a FOLDABLE type-name argument: a typo like
    * 'int64' should be a named analysis error, not an IllegalArgumentException
    * thrown from the first executed task of a distributed job (and re-thrown
    * per retry). The empty string is the infer-from-element-type sentinel and
    * passes; non-foldable type expressions stay runtime-checked. */
  def checkTypeName(typeExpr: Expression, pretty: String)
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    if (typeExpr.foldable) {
      val v = typeExpr.eval()
      if (v != null && v.toString.nonEmpty) {
        try PhysicalIntType.fromName(v.toString)
        catch {
          case e: IllegalArgumentException =>
            return TypeCheckResult.TypeCheckFailure(s"$pretty: ${e.getMessage}")
        }
      }
    }
    TypeCheckResult.TypeCheckSuccess
  }

  /** (values, validity) honoring element nulls (graft block format path). */
  def toLongsNullable(arr: ArrayData, dt: DataType): (Array[Long], Array[Boolean]) = {
    val n = arr.numElements()
    val get = getter(arr, dt)
    val out = new Array[Long](n)
    val ok = new Array[Boolean](n)
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) { ok(i) = true; out(i) = get(i) }
      i += 1
    }
    (out, ok)
  }
}

/** eg_encode(array<integral>, k [, 'i8'..'u64']) -> binary (bare reference
  * bitstream; with no type argument the physical type is INFERRED from the
  * array element type — same default as eg_encode_adaptive). */
case class EgEncode(child: Expression, kExpr: Expression, typeExpr: Expression)
    extends TernaryExpression with CodegenFallback with ImplicitCastInputTypes {
  def this(child: Expression, kExpr: Expression) =
    this(child, kExpr, Literal(UTF8String.fromString(""), StringType))

  override def first: Expression = child
  override def second: Expression = kExpr
  override def third: Expression = typeExpr
  override def inputTypes: Seq[ShimTypes.AbstractDataType] =
    Seq(GraftExprUtil.IntegralArrays, IntegerType, StringType)
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val base = super.checkInputDataTypes()
    if (!base.isSuccess) base else GraftExprUtil.checkTypeName(typeExpr, prettyName)
  }
  override def dataType: DataType = BinaryType
  override def nullSafeEval(arr: Any, k: Any, typ: Any): Any = {
    val t = typ.toString match {
      case "" => GraftExprUtil.elementTypeOf(child.dataType)
      case s => PhysicalIntType.fromName(s)
    }
    val values = GraftExprUtil.toLongs(arr.asInstanceOf[ArrayData], child.dataType, prettyName)
    GolombCodec.encode(values, k.asInstanceOf[Number].intValue(), t)
  }
  override protected def withNewChildrenInternal(f: Expression, s: Expression, t: Expression) =
    copy(child = f, kExpr = s, typeExpr = t)
  override def prettyName: String = "eg_encode"
}

/** eg_decode(binary, k, 'i8'..'u64') -> array<long> (reference decode semantics). */
case class EgDecode(child: Expression, kExpr: Expression, typeExpr: Expression)
    extends TernaryExpression with CodegenFallback with ImplicitCastInputTypes {
  override def first: Expression = child
  override def second: Expression = kExpr
  override def third: Expression = typeExpr
  override def inputTypes: Seq[ShimTypes.AbstractDataType] = Seq(BinaryType, IntegerType, StringType)
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val base = super.checkInputDataTypes()
    if (!base.isSuccess) base else GraftExprUtil.checkTypeName(typeExpr, prettyName)
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(bin: Any, k: Any, typ: Any): Any = {
    val t = PhysicalIntType.fromName(typ.toString)
    val values = GolombCodec.decode(bin.asInstanceOf[Array[Byte]], k.asInstanceOf[Number].intValue(), t)
    new GenericArrayData(values)
  }
  override protected def withNewChildrenInternal(f: Expression, s: Expression, t: Expression) =
    copy(child = f, kExpr = s, typeExpr = t)
  override def prettyName: String = "eg_decode"
}

/** eg_encode_adaptive(array<integral>, k, a [, type]) -> binary (util/golomb.cpp:432-462). */
case class EgEncodeAdaptive(children: Seq[Expression])
    extends Expression with CodegenFallback {
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = children.exists(_.nullable)
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    val shape = children.map(_.dataType)
    val ok = (children.length == 3 || children.length == 4) &&
      ShimTypes.accepts(GraftExprUtil.IntegralArrays, shape(0)) &&
      Seq(shape(1), shape(2)).forall(t =>
        t == IntegerType || t == LongType || t == ShortType || t == ByteType) &&
      (children.length == 3 || shape(3) == StringType)
    if (!ok) TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects (array<integral>, k int, a int [, type string]), got " +
      shape.map(_.simpleString).mkString("(", ", ", ")"))
    else if (children.length == 4) GraftExprUtil.checkTypeName(children(3), prettyName)
    else TypeCheckResult.TypeCheckSuccess
  }
  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val vs = children.map(_.eval(input))
    if (vs.exists(_ == null)) return null
    val t = if (children.length > 3) PhysicalIntType.fromName(vs(3).toString)
            else GraftExprUtil.elementTypeOf(children.head.dataType)
    val values = GraftExprUtil.toLongs(vs(0).asInstanceOf[ArrayData],
      children.head.dataType, prettyName)
    GolombCodec.adaptiveEncode(values,
      vs(1).asInstanceOf[Number].intValue(), vs(2).asInstanceOf[Number].intValue(), t)
  }
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]) = copy(children = c)
  override def prettyName: String = "eg_encode_adaptive"
}

/** eg_decode_adaptive(binary, k, a, 'type') -> array<long>. */
case class EgDecodeAdaptive(children: Seq[Expression])
    extends Expression with CodegenFallback with ImplicitCastInputTypes {
  override def inputTypes: Seq[ShimTypes.AbstractDataType] =
    Seq(BinaryType, IntegerType, IntegerType, StringType)
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    // explicit arity first: checkInputDataTypes zips children with inputTypes
    // (truncating), so a 3-child instance would pass analysis and then throw a
    // raw IndexOutOfBounds per ROW at vs(3) — the sibling encode guards too
    if (children.length != 4) TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects (binary, k int, a int, type string), got ${children.length} arguments")
    else {
      val base = super.checkInputDataTypes()
      if (!base.isSuccess) base else GraftExprUtil.checkTypeName(children(3), prettyName)
    }
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = children.exists(_.nullable)
  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val vs = children.map(_.eval(input))
    if (vs.exists(_ == null)) return null
    val t = PhysicalIntType.fromName(vs(3).toString)
    new GenericArrayData(GolombCodec.adaptiveDecode(vs(0).asInstanceOf[Array[Byte]],
      vs(1).asInstanceOf[Number].intValue(), vs(2).asInstanceOf[Number].intValue(), t))
  }
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]) = copy(children = c)
  override def prettyName: String = "eg_decode_adaptive"
}

/** graft_encode(array<integral> [, type]) -> binary self-describing block, auto codec. */
case class GraftEncode(child: Expression, typeExpr: Expression)
    extends BinaryExpression with CodegenFallback with ImplicitCastInputTypes {
  def this(child: Expression) = this(child, Literal(UTF8String.fromString(""), StringType))
  override def left: Expression = child
  override def right: Expression = typeExpr
  override def inputTypes: Seq[ShimTypes.AbstractDataType] =
    Seq(GraftExprUtil.IntegralArrays, StringType)
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val base = super.checkInputDataTypes()
    if (!base.isSuccess) base else GraftExprUtil.checkTypeName(typeExpr, prettyName)
  }
  override def dataType: DataType = BinaryType
  override def nullSafeEval(arr: Any, typ: Any): Any = {
    val t = typ.toString match {
      case "" => GraftExprUtil.elementTypeOf(child.dataType)
      case s => PhysicalIntType.fromName(s)
    }
    // element nulls ride the block format's validity bitmap (all-valid blocks
    // are byte-identical to the plain format), round-tripping via graft_decode
    val (values, valid) = GraftExprUtil.toLongsNullable(arr.asInstanceOf[ArrayData], child.dataType)
    IntBlockCodec.encodeNullable(values, valid, t)
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(child = l, typeExpr = r)
  override def prettyName: String = "graft_encode"
}

/** graft_decode(binary) -> array<long>; the block is self-describing (null elements
  * restored from the validity bitmap of nullable blocks). */
case class GraftDecode(child: Expression) extends UnaryExpression with CodegenFallback
    with ImplicitCastInputTypes {
  override def inputTypes: Seq[ShimTypes.AbstractDataType] = Seq(BinaryType)
  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def nullSafeEval(bin: Any): Any = {
    val (vs, ok) = IntBlockCodec.decodeNullable(bin.asInstanceOf[Array[Byte]])
    val out = new Array[Any](vs.length)
    var i = 0
    while (i < vs.length) { if (ok(i)) out(i) = vs(i); i += 1 }
    new GenericArrayData(out)
  }
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
  override def prettyName: String = "graft_decode"
}

/** graft_codec(binary) -> string describing the chosen codec tree. */
case class GraftCodecName(child: Expression) extends UnaryExpression with CodegenFallback
    with ImplicitCastInputTypes {
  override def inputTypes: Seq[ShimTypes.AbstractDataType] = Seq(BinaryType)
  override def dataType: DataType = StringType
  override def nullSafeEval(bin: Any): Any = {
    val bs = bin.asInstanceOf[Array[Byte]]
    val name =
      if (StringBlockCodec.isStringBlock(bs)) StringBlockCodec.codecName(bs)
      else IntBlockCodec.info(bs).codecName
    UTF8String.fromString(name)
  }
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
  override def prettyName: String = "graft_codec"
}

/** graft_encode_str(array<string>) -> binary string block (dict/FSST/plain auto). */
case class GraftEncodeStr(child: Expression) extends UnaryExpression with CodegenFallback
    with ImplicitCastInputTypes {
  override def inputTypes: Seq[ShimTypes.AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = BinaryType
  override def nullSafeEval(arr: Any): Any = {
    val a = arr.asInstanceOf[ArrayData]
    val n = a.numElements()
    val strs = new Array[Array[Byte]](n)
    var i = 0
    while (i < n) {
      strs(i) = if (a.isNullAt(i)) null else a.getUTF8String(i).getBytes
      i += 1
    }
    StringBlockCodec.encode(strs)
  }
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
  override def prettyName: String = "graft_encode_str"
}

/** graft_decode_str(binary) -> array<string> (null elements preserved). */
case class GraftDecodeStr(child: Expression) extends UnaryExpression with CodegenFallback
    with ImplicitCastInputTypes {
  override def inputTypes: Seq[ShimTypes.AbstractDataType] = Seq(BinaryType)
  override def dataType: DataType = ArrayType(StringType, containsNull = true)
  override def nullSafeEval(bin: Any): Any = {
    val decoded = StringBlockCodec.decode(bin.asInstanceOf[Array[Byte]])
    new GenericArrayData(decoded.map(bs =>
      if (bs == null) null else UTF8String.fromBytes(bs)): Array[Any])
  }
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
  override def prettyName: String = "graft_decode_str"
}

/**
 * range_bucket(url) -> int: binary search of a string against sorted range
 * boundaries (+offset), the encode job's work-unit id. Implements doGenCode so the
 * pre-shuffle projection stays inside whole-stage codegen — the previous Scala UDF
 * forced a codegen break and blocked pushdown through the projection. Null sorts
 * first (bucket 0). The boundary array rides to executors via
 * `ctx.addReferenceObj` — serialized with each task's plan references (NOT a
 * broadcast; fine at the parts-1 boundary counts this job uses).
 */
case class RangeBucketId(child: Expression, boundaries: Seq[String], offset: Int)
    extends UnaryExpression with org.apache.spark.sql.catalyst.expressions.ExpectsInputTypes {
  // ExpectsInputTypes (no implicit casts): a numeric child must FAIL analysis —
  // implicit-cast-to-string would silently bucket numbers in lexicographic
  // order, and without any declaration the codegen emitted uncompilable
  // `.toString()` on a primitive
  override def inputTypes: Seq[ShimTypes.AbstractDataType] = Seq(StringType)
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = false

  // Seq field (not Array): case-class equality stays structural, so two
  // expressions built from the same BOUNDARIES file compare semanticEquals and
  // common-subexpression elimination can dedup them
  @transient private lazy val boundaryArr: Array[String] = boundaries.toArray

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    offset + RangeBucketId.bucket(boundaryArr, if (v == null) null else v.toString)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    import org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral
    val bRef = ctx.addReferenceObj("boundaries", boundaryArr, "java.lang.String[]")
    val childGen = child.genCode(ctx)
    val call =
      s"int ${ev.value} = $offset + graft.functions.RangeBucketId$$.MODULE$$.bucket(" +
      s"$bRef, ${childGen.isNull} ? null : ${childGen.value}.toString());"
    ev.copy(code = childGen.code + code"$call", isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(c: Expression) = copy(child = c)
  override def prettyName: String = "range_bucket"
}

object RangeBucketId {
  /** Boundary binary search; bucket i holds urls in [boundaries(i-1), boundaries(i)). */
  def bucket(boundaries: Array[String], url0: String): Int = {
    val url = if (url0 == null) "" else url0
    var lo = 0
    var hi = boundaries.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (url.compareTo(boundaries(mid)) < 0) hi = mid else lo = mid + 1
    }
    lo
  }
}

/** zigzag_encode(bigint) -> bigint, codegen-capable (src/golomb.h:118-129 for i64).
  * inputTypes coerces narrower integrals to long: without it, int input threw
  * ClassCastException interpreted and silently computed 32-bit-wrapped values
  * under codegen (shift counts masked mod 32). */
case class ZigZagEncode(child: Expression) extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes = Seq(LongType)
  override def dataType: DataType = LongType
  override def nullSafeEval(v: Any): Any = {
    val s = v.asInstanceOf[Long]
    (s << 1) ^ (s >> 63)
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"(($c << 1) ^ ($c >> 63))")
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
  override def prettyName: String = "zigzag_encode"
}

/** zigzag_decode(bigint) -> bigint (src/golomb.h:137-149 for i64). */
case class ZigZagDecode(child: Expression) extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes = Seq(LongType)
  override def dataType: DataType = LongType
  override def nullSafeEval(v: Any): Any = {
    val u = v.asInstanceOf[Long]
    (u >>> 1) ^ -(u & 1L)
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"(($c >>> 1) ^ -($c & 1L))")
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
  override def prettyName: String = "zigzag_decode"
}
