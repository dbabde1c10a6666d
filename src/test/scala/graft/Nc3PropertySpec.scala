package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Nc3
import graft.sources.Nc3.{Att, Dim, VarDecl, VarSpec}

/** ScalaCheck fuzz for the NetCDF-3 writer/reader pair: Nc3Spec pins
  * hand-picked layouts against hand-built spec bytes; this spec hammers
  * the padding/offset arithmetic with ARBITRARY layouts — random dim
  * counts and extents, scalar vars, odd-length NC_CHAR slabs (4-byte
  * padding), record blocks (incl. the single-record-var unpadded slab
  * rule), CDF-1 vs CDF-2 offsets, and IEEE edge values (NaN, ±Inf, -0.0,
  * integer extremes) — where off-by-one bugs in binary format code live.
  */
class Nc3PropertySpec extends AnyFunSuite {
  private def check(p: Prop): Unit = {
    val r = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(150), p)
    assert(r.passed, r.status.toString)
  }

  private val ident: Gen[String] = for {
    h <- Gen.alphaLowerChar
    n <- Gen.choose(0, 6)
    t <- Gen.listOfN(n, Gen.frequency(
      (8, Gen.alphaLowerChar), (2, Gen.numChar), (1, Gen.const('_'))))
  } yield (h +: t).mkString

  /** Distinct names: random stems, index-suffixed so they can't collide. */
  private def distinctIdents(n: Int): Gen[List[String]] =
    Gen.listOfN(n, ident).map(_.zipWithIndex.map { case (s, i) => s"${s}_$i" })

  private def genAll[T](gs: List[Gen[T]]): Gen[List[T]] =
    gs.foldRight(Gen.const(List.empty[T]))((g, acc) =>
      for { h <- g; t <- acc } yield h :: t)

  private val numericType: Gen[Int] =
    Gen.oneOf(Nc3.NcByte, Nc3.NcShort, Nc3.NcInt, Nc3.NcFloat, Nc3.NcDouble)
  private val anyType: Gen[Int] =
    Gen.frequency((5, numericType), (2, Gen.const(Nc3.NcChar)))

  private def dataFor(t: Int, n: Int): Gen[AnyRef] = t match {
    case Nc3.NcByte | Nc3.NcChar =>
      Gen.listOfN(n, Gen.choose(-128, 127).map(_.toByte)).map(_.toArray)
    case Nc3.NcShort =>
      Gen.listOfN(n, Gen.choose(-32768, 32767).map(_.toShort)).map(_.toArray)
    case Nc3.NcInt =>
      Gen.listOfN(n, Gen.frequency(
        (8, Gen.choose(Int.MinValue, Int.MaxValue)),
        (2, Gen.oneOf(0, -1, Int.MinValue, Int.MaxValue)))).map(_.toArray)
    case Nc3.NcFloat =>
      Gen.listOfN(n, Gen.frequency(
        (8, Gen.choose(-1e30f, 1e30f)),
        (2, Gen.oneOf(Float.NaN, Float.PositiveInfinity,
          Float.NegativeInfinity, -0.0f, Float.MinPositiveValue)))).map(_.toArray)
    case Nc3.NcDouble =>
      Gen.listOfN(n, Gen.frequency(
        (8, Gen.choose(-1e300, 1e300)),
        (2, Gen.oneOf(Double.NaN, Double.PositiveInfinity,
          Double.NegativeInfinity, -0.0, Double.MinPositiveValue)))).map(_.toArray)
  }

  private def attFor(name: String): Gen[Att] = anyType.flatMap {
    case Nc3.NcChar => Gen.choose(0, 9)
      .flatMap(n => Gen.listOfN(n, Gen.alphaNumChar))
      .map(cs => Att(name, Nc3.NcChar, cs.mkString))
    case nt => Gen.choose(1, 3).flatMap(n => dataFor(nt, n))
      .map(a => Att(name, nt, a))
  }

  private def attList(prefix: String): Gen[List[Att]] = for {
    n <- Gen.choose(0, 2)
    names <- distinctIdents(n)
    atts <- genAll(names.map(nm => attFor(s"$prefix$nm")))
  } yield atts

  private case class FileCase(dims: Seq[Dim], gatts: Seq[Att],
                              vars: Seq[VarSpec], version: Int, numRecs: Int)

  private def fileGen(allowRec: Boolean): Gen[FileCase] = for {
    nd <- Gen.choose(1, 3)
    dimNames <- distinctIdents(nd + 1)
    dimLens <- Gen.listOfN(nd, Gen.choose(1, 5))
    hasRec <- if (allowRec) Gen.oneOf(true, false) else Gen.const(false)
    numRecs <- if (hasRec) Gen.choose(1, 3) else Gen.const(0)
    nv <- Gen.choose(1, 4)
    varNames <- distinctIdents(nv)
    fixedDims = dimNames.take(nd).zip(dimLens).map { case (nm, l) => Dim(nm, l) }
    recDim = Dim(dimNames.last, 0)
    dims = if (hasRec) fixedDims :+ recDim else fixedDims
    vars <- genAll(varNames.map { vn =>
      for {
        t <- anyType
        k <- Gen.choose(0, fixedDims.length) // k = 0 → scalar variable
        vdims <- Gen.pick(k, fixedDims).map(_.toList)
        isRec <- if (hasRec) Gen.oneOf(true, false) else Gen.const(false)
        per = vdims.map(_.length.toLong).product.toInt
        data <- dataFor(t, if (isRec) numRecs * per else per)
        atts <- attList(vn.take(2))
      } yield VarSpec(vn,
        (if (isRec) recDim +: vdims else vdims).map(_.name), atts, t, data)
    })
    gatts <- attList("g")
    version <- Gen.oneOf(1, 2)
  } yield FileCase(dims, gatts, vars, version, numRecs)

  private def widen(a: AnyRef): Array[Double] = a match {
    case x: Array[Byte]   => x.map(_.toDouble)
    case x: Array[Short]  => x.map(_.toDouble)
    case x: Array[Int]    => x.map(_.toDouble)
    case x: Array[Float]  => x.map(_.toDouble)
    case x: Array[Double] => x
  }

  private def bitEq(got: Array[Double], want: Array[Double]): Boolean =
    got.length == want.length && got.indices.forall(i =>
      java.lang.Double.doubleToLongBits(got(i)) ==
        java.lang.Double.doubleToLongBits(want(i)))

  private def attsEq(got: Seq[Att], want: Seq[Att]): Boolean =
    got.length == want.length && got.zip(want).forall { case (g, w) =>
      g.name == w.name && g.ncType == w.ncType && ((g.value, w.value) match {
        case (a: String, b: String)       => a == b
        case (a: Array[_], b: Array[_])   =>
          bitEq(widen(a.asInstanceOf[AnyRef]), widen(b.asInstanceOf[AnyRef]))
        case _                            => false
      })
    }

  test("write → read round-trips arbitrary fuzzed layouts bit-exactly") {
    check(Prop.forAll(fileGen(allowRec = true)) { fc =>
      val bytes = Nc3.write(fc.dims, fc.gatts, fc.vars, fc.version, fc.numRecs)
      val nc = new Nc3.NcFile(bytes)
      val header = nc.version == fc.version &&
        nc.dims.map(d => (d.name, d.length)) ==
          fc.dims.map(d => (d.name, d.length)) &&
        attsEq(nc.gatts, fc.gatts)
      val body = fc.vars.forall { vs =>
        val v = nc.variable(vs.name)
        val isRec = vs.dimNames.headOption
          .exists(dn => fc.dims.exists(d => d.name == dn && d.isRecord))
        val meta = v.ncType == vs.ncType && attsEq(v.atts, vs.atts)
        val data =
          if (vs.ncType == Nc3.NcChar) {
            val got = if (isRec) nc.readCharsRec(vs.name) else nc.readChars(vs.name)
            java.util.Arrays.equals(got, vs.data.asInstanceOf[Array[Byte]])
          } else {
            val got = if (isRec) nc.readDoublesRec(vs.name) else nc.readDoubles(vs.name)
            bitEq(got, widen(vs.data))
          }
        meta && data
      }
      header && body
    })
  }

  test("streaming writer stays byte-identical to the in-memory writer on fuzzed layouts") {
    check(Prop.forAll(fileGen(allowRec = false)) { fc =>
      val mem = Nc3.write(fc.dims, fc.gatts, fc.vars, fc.version, numRecs = 0)
      val bos = new java.io.ByteArrayOutputStream()
      val byName: Map[String, AnyRef] = fc.vars.map(v => v.name -> v.data).toMap
      Nc3.writeStreaming(bos, fc.dims, fc.gatts, fc.vars.map(_.decl),
        fc.version)((d: VarDecl) => byName(d.name))
      java.util.Arrays.equals(mem, bos.toByteArray)
    })
  }
}
