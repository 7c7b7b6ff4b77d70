package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.graft.VectorKernels

/** graft-side facade over the native Catalyst vector kernels. The actual
  * expressions live in `org.apache.spark.sql.graft.VectorKernels` (the
  * Expression → Column bridge and `AbstractDataType` are `private[sql]`);
  * see that file for the why-native rationale and determinism notes. */
object VectorExpr {

  /** exact integer dot product of two array<bigint> columns — a codegen'd
    * primitive loop, safe to evaluate inside join conditions */
  def dotL(a: Column, b: Column): Column = VectorKernels.dotL(a, b)

  /** signed hyperplane projection of a quantized vector (md5-derived sign
    * family — see `org.apache.spark.sql.graft.HpSigns`) */
  def hpSignedSum(q: Column, plane: Int): Column =
    VectorKernels.hpSignedSum(q, plane)

  /** the determinism protocol's `floor(x*1000)` quantization as one
    * codegen'd loop (replaces the CodegenFallback `transform` lambda) */
  def quantizeMilli(a: Column): Column = VectorKernels.quantizeMilli(a)
}
