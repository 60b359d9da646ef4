package graft

import org.scalacheck.{Gen, Prop, Properties}

/** ScalaCheck properties for the pure kernel of the cosine expression
  * (the distributed path is covered in EngineSpec/QuerySuiteSpec). */
object CosineProps extends Properties("CosineSimilarity") {

  private def evalCosine(a: Array[Float], b: Array[Float]): Double =
    graft.functions.CosineSimilarity(
      org.apache.spark.sql.catalyst.expressions.Literal.create(a,
        org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.FloatType)),
      org.apache.spark.sql.catalyst.expressions.Literal.create(b,
        org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.FloatType)))
      .eval(null).asInstanceOf[Double]

  private val genVec: Gen[List[Float]] =
    Gen.chooseNum(1, 64).flatMap(n => Gen.listOfN(n, Gen.choose(-10.0f, 10.0f)))
  private val nonZero = genVec.suchThat(_.exists(_ != 0f))

  property("matches naive double reference") = Prop.forAll(nonZero, nonZero) { (a, b) =>
    val n = math.min(a.length, b.length)
    val (ax, bx) = (a.take(n), b.take(n))
    val dot = ax.zip(bx).map { case (x, y) => x.toDouble * y.toDouble }.sum
    val na = ax.map(x => x.toDouble * x.toDouble).sum
    val nb = bx.map(x => x.toDouble * x.toDouble).sum
    val ref = dot / math.sqrt(na * nb)
    val got = evalCosine(a.toArray, b.toArray)
    (ref.isNaN && got.isNaN) || math.abs(got - ref) < 1e-9
  }

  property("bounded by [-1, 1]") = Prop.forAll(nonZero) { a =>
    val got = evalCosine(a.toArray, a.toArray)
    math.abs(got - 1.0) < 1e-9
  }

  property("symmetric") = Prop.forAll(nonZero, nonZero) { (a, b) =>
    val x = evalCosine(a.toArray, b.toArray)
    val y = evalCosine(b.toArray, a.toArray)
    (x.isNaN && y.isNaN) || x == y
  }
}
