package graft.plans

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType}
import org.apache.spark.util.sketch.BloomFilter

/** Membership probe against a pre-built Bloom filter — the runtime-filter
  * building block for q89's bloom-pruned join.
  *
  * The filter is carried as its SERIALIZED bytes (a plain `Array[Byte]`,
  * trivially Java-serializable with the expression tree) and rebuilt once
  * per JVM via a transient lazy val — the same ship-bytes / rehydrate-once
  * pattern Spark's own `InSet`/runtime-filter machinery uses. Codegen
  * references the expression instance itself (`addReferenceObj`) and calls
  * [[mightContain]], so the surrounding stage stays inside
  * WholeStageCodegen: one virtual call per row against a bit array —
  * no interpreter fallback, no per-row deserialization.
  *
  * False positives are the caller's contract: a probe that returns true may
  * be wrong (rate = the fpp the filter was built with), a probe that
  * returns false is NEVER wrong. q89 therefore uses this only as a
  * PREFILTER in front of an exact join — wrong-trues are dropped by the
  * join; wrong-falses cannot occur, so the composed result is exact.
  */
case class BloomMightContain(child: Expression, bloomBytes: Array[Byte]) extends UnaryExpression {

  override def dataType: DataType = BooleanType

  // Case-class equals/hashCode on an Array field are reference-based, which
  // breaks expression canonicalization and subexpression elimination (two
  // probes with identical bytes would never compare equal) — compare the
  // filter bytes by content.
  override def equals(other: Any): Boolean = other match {
    case BloomMightContain(c, b) => c == child && java.util.Arrays.equals(b, bloomBytes)
    case _                       => false
  }

  override def hashCode(): Int =
    31 * child.hashCode() + java.util.Arrays.hashCode(bloomBytes)

  @transient private lazy val bloom: BloomFilter =
    BloomFilter.readFrom(new ByteArrayInputStream(bloomBytes))

  /** Public for generated code. */
  def mightContain(v: Long): Boolean = bloom.mightContainLong(v)

  override def nullSafeEval(v: Any): Any = mightContain(v.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("bloomExpr", this, classOf[BloomMightContain].getName)
    nullSafeCodeGen(ctx, ev, v => s"${ev.value} = $self.mightContain($v);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object BloomExpressions {

  def serialize(bf: BloomFilter): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    bf.writeTo(out)
    out.toByteArray
  }

  /** `mightContain(bf, keyCol)` as a Column over a LONG key. */
  def mightContain(bf: BloomFilter, key: Column): Column =
    GraftBridge.column(BloomMightContain(GraftBridge.expression(key), serialize(bf)))
}
