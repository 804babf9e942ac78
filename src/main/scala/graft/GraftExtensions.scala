package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.expressions.{AHash, ByteEntropy, CosineSimilarity, DHash, HashVector, HilbertIndex, HllRho, LshBucket, WinnowFingerprints}

/** Engine extension point (`spark.sql.extensions=graft.GraftExtensions`):
  * registers the native expressions so they are callable from SQL and via
  * `call_function`. Every session builder in this library sets it; an
  * embedding application adds the same config line.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("graft_cosine"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "graft_cosine"),
      (children: Seq[Expression]) =>
        CosineSimilarity(children.head, children(1))))
    ext.injectFunction((
      FunctionIdentifier("graft_lsh_bucket"),
      new ExpressionInfo(classOf[LshBucket].getName, "graft_lsh_bucket"),
      (children: Seq[Expression]) =>
        LshBucket(children.head, children(1))))
    ext.injectFunction((
      FunctionIdentifier("graft_winnow"),
      new ExpressionInfo(classOf[WinnowFingerprints].getName, "graft_winnow"),
      (children: Seq[Expression]) =>
        WinnowFingerprints(children.head, children(1), children(2))))
    ext.injectFunction((
      FunctionIdentifier("graft_hash_vector"),
      new ExpressionInfo(classOf[HashVector].getName, "graft_hash_vector"),
      (children: Seq[Expression]) =>
        HashVector(children.head, children(1))))
    ext.injectFunction((
      FunctionIdentifier("graft_hll_rho"),
      new ExpressionInfo(classOf[HllRho].getName, "graft_hll_rho"),
      (children: Seq[Expression]) => HllRho(children.head)))
    ext.injectFunction((
      FunctionIdentifier("graft_byte_entropy"),
      new ExpressionInfo(classOf[ByteEntropy].getName, "graft_byte_entropy"),
      (children: Seq[Expression]) => ByteEntropy(children.head)))
    ext.injectFunction((
      FunctionIdentifier("graft_ahash"),
      new ExpressionInfo(classOf[AHash].getName, "graft_ahash"),
      (children: Seq[Expression]) =>
        AHash(children.head, children(1))))
    ext.injectFunction((
      FunctionIdentifier("graft_dhash"),
      new ExpressionInfo(classOf[DHash].getName, "graft_dhash"),
      (children: Seq[Expression]) =>
        DHash(children.head, children(1))))
    ext.injectFunction((
      FunctionIdentifier("graft_hilbert"),
      new ExpressionInfo(classOf[HilbertIndex].getName, "graft_hilbert"),
      (children: Seq[Expression]) =>
        HilbertIndex(children.head, children(1))))
  }
}
