package graft

import java.nio.ByteBuffer

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Nc3

/** The reader is validated against bytes assembled BY HAND from the
  * public NetCDF classic format spec (not via Nc3.write), so a shared
  * misreading of the spec can't self-certify; the writer is then pinned by
  * round-trip through that independently-validated reader. */
class Nc3Spec extends AnyFunSuite {

  private def handBuiltFile(): Array[Byte] = {
    val bb = ByteBuffer.allocate(512)
    def putName(s: String): Unit = {
      bb.putInt(s.length)
      bb.put(s.getBytes("UTF-8"))
      while ((bb.position() & 3) != 0) bb.put(0.toByte)
    }
    bb.put("CDF".getBytes("UTF-8")).put(1.toByte)
    bb.putInt(0) // numrecs
    bb.putInt(0x0A).putInt(2) // NC_DIMENSION, 2 dims
    putName("x"); bb.putInt(2)
    putName("y"); bb.putInt(3)
    bb.putInt(0x0C).putInt(1) // NC_ATTRIBUTE, 1 global att
    putName("title"); bb.putInt(2).putInt(5) // NC_CHAR, len 5
    bb.put("hello".getBytes("UTF-8"))
    while ((bb.position() & 3) != 0) bb.put(0.toByte)
    bb.putInt(0x0B).putInt(1) // NC_VARIABLE, 1 var
    putName("v")
    bb.putInt(2).putInt(0).putInt(1) // 2 dims: x, y
    bb.putInt(0).putInt(0) // empty var att list (ABSENT)
    bb.putInt(5) // NC_FLOAT
    bb.putInt(24) // vsize = 6 floats
    val beginSlot = bb.position()
    bb.putInt(0) // begin, patched below
    val begin = bb.position()
    bb.putInt(beginSlot, begin)
    (1 to 6).foreach(i => bb.putFloat(i.toFloat))
    java.util.Arrays.copyOf(bb.array(), bb.position())
  }

  test("reader parses a hand-built spec-conformant file") {
    val nc = new Nc3.NcFile(handBuiltFile())
    assert(nc.version === 1)
    assert(nc.dims.map(d => (d.name, d.length)) === Seq(("x", 2), ("y", 3)))
    assert(nc.gatt("title") === Some("hello"))
    val v = nc.variable("v")
    assert(v.ncType === Nc3.NcFloat)
    assert(v.shape.toSeq === Seq(2, 3))
    assert(nc.readDoubles("v").toSeq === Seq(1.0, 2.0, 3.0, 4.0, 5.0, 6.0))
  }

  test("writer output round-trips through the reader (all types, atts, padding)") {
    val dims = Seq(Nc3.Dim("a", 3), Nc3.Dim("b", 2), Nc3.Dim("s", 4))
    val gatts = Seq(
      Nc3.Att("title", Nc3.NcChar, "atlas"), // length 5 exercises padding
      Nc3.Att("domain", Nc3.NcDouble, Array(-20.0, 50.0, -50.0, -20.0)),
      Nc3.Att("count", Nc3.NcInt, Array(7)))
    val vars = Seq(
      Nc3.VarSpec("f", Seq("a", "b"),
        Seq(Nc3.Att("units", Nc3.NcChar, "°C")), Nc3.NcFloat,
        Array(1.5f, -2.5f, 3f, 4f, 5f, 6f)),
      Nc3.VarSpec("d", Seq("a"), Nil, Nc3.NcDouble, Array(0.1, 0.2, 0.3)),
      Nc3.VarSpec("i", Seq("b"), Nil, Nc3.NcInt, Array(41, 42)),
      Nc3.VarSpec("sh", Seq("a"), Nil, Nc3.NcShort, // 6 B data → 2 B pad
        Array(1.toShort, 2.toShort, 3.toShort)),
      Nc3.VarSpec("by", Seq("a"), Nil, Nc3.NcByte, // 3 B data → 1 B pad
        Array(7.toByte, 8.toByte, 9.toByte)),
      Nc3.VarSpec("c", Seq("b", "s"), Nil, Nc3.NcChar,
        "DDR A   ".getBytes("UTF-8")))
    val nc = new Nc3.NcFile(Nc3.write(dims, gatts, vars))
    assert(nc.dims === dims.toIndexedSeq)
    assert(nc.gatt("title") === Some("atlas"))
    assert(nc.gatt("domain").get.asInstanceOf[Array[Double]].toSeq ===
      Seq(-20.0, 50.0, -50.0, -20.0))
    assert(nc.gatt("count").get.asInstanceOf[Array[Int]].toSeq === Seq(7))
    assert(nc.variable("f").atts.head === Nc3.Att("units", Nc3.NcChar, "°C"))
    assert(nc.readDoubles("f").toSeq === Seq(1.5, -2.5, 3, 4, 5, 6))
    assert(nc.readDoubles("d").toSeq === Seq(0.1, 0.2, 0.3))
    assert(nc.readDoubles("i").toSeq === Seq(41.0, 42.0))
    assert(nc.readDoubles("sh").toSeq === Seq(1.0, 2.0, 3.0))
    assert(nc.readDoubles("by").toSeq === Seq(7.0, 8.0, 9.0))
    assert(new String(nc.readChars("c"), "UTF-8") === "DDR A   ")
    // data slabs stay 4-byte aligned even after odd-sized variables
    nc.vars.foreach(v => assert((v.begin & 3) === 0, s"${v.name} misaligned"))
  }

  test("reader rejects non-NetCDF bytes and record-variable reads") {
    intercept[IllegalArgumentException] {
      new Nc3.NcFile("PAR1notnetcdf".getBytes("UTF-8"))
    }
  }

  /** Record block assembled BY HAND per the spec: two record variables →
    * each per-record slab padded to 4; records interleave in variable
    * order. A short (2-byte) slab pins the padding rule. */
  private def handBuiltRecordFile(): Array[Byte] = {
    val bb = ByteBuffer.allocate(512)
    def putName(s: String): Unit = {
      bb.putInt(s.length)
      bb.put(s.getBytes("UTF-8"))
      while ((bb.position() & 3) != 0) bb.put(0.toByte)
    }
    bb.put("CDF".getBytes("UTF-8")).put(1.toByte)
    bb.putInt(3) // numrecs
    bb.putInt(0x0A).putInt(2) // 2 dims
    putName("rec"); bb.putInt(0) // record dim
    putName("x"); bb.putInt(2)
    bb.putInt(0).putInt(0) // no global atts (ABSENT)
    bb.putInt(0x0B).putInt(2) // 2 vars, both record
    putName("f") // f(rec, x): per-record slab 2 floats = 8 B
    bb.putInt(2).putInt(0).putInt(1)
    bb.putInt(0).putInt(0)
    bb.putInt(5) // NC_FLOAT
    bb.putInt(8) // vsize
    val fBeginSlot = bb.position(); bb.putInt(0)
    putName("s") // s(rec): per-record slab 1 short = 2 B → padded to 4
    bb.putInt(1).putInt(0)
    bb.putInt(0).putInt(0)
    bb.putInt(3) // NC_SHORT
    bb.putInt(4) // vsize (padded)
    val sBeginSlot = bb.position(); bb.putInt(0)
    val recStart = bb.position()
    bb.putInt(fBeginSlot, recStart)
    bb.putInt(sBeginSlot, recStart + 8)
    // recSize = 8 + 4 = 12; 3 records
    (0 until 3).foreach { r =>
      bb.putFloat(10f * r); bb.putFloat(10f * r + 1) // f slab
      bb.putShort((100 + r).toShort); bb.putShort(0) // s slab + pad
    }
    java.util.Arrays.copyOf(bb.array(), bb.position())
  }

  test("reader materializes record variables (hand-built interleaved block)") {
    val nc = new Nc3.NcFile(handBuiltRecordFile())
    assert(nc.numRecs === 3)
    assert(nc.recSize === 12)
    val f = nc.variable("f")
    assert(f.isRecord && f.shape.toSeq === Seq(3, 2))
    assert(nc.readDoublesRec("f").toSeq ===
      Seq(0.0, 1.0, 10.0, 11.0, 20.0, 21.0))
    assert(nc.readDoublesRec("s").toSeq === Seq(100.0, 101.0, 102.0))
    intercept[IllegalArgumentException] { nc.readDoubles("f") }
  }

  test("writer round-trips record variables incl. the single-var unpadded case") {
    // two record vars: strides padded per-variable
    val dims = Seq(Nc3.Dim("rec", 0), Nc3.Dim("x", 2))
    val vars = Seq(
      Nc3.VarSpec("f", Seq("rec", "x"), Nil, Nc3.NcFloat,
        Array(0f, 1f, 10f, 11f, 20f, 21f)),
      Nc3.VarSpec("s", Seq("rec"), Nil, Nc3.NcShort,
        Array(100.toShort, 101.toShort, 102.toShort)),
      Nc3.VarSpec("base", Seq("x"), Nil, Nc3.NcInt, Array(7, 8)))
    val nc = new Nc3.NcFile(Nc3.write(dims, Nil, vars, numRecs = 3))
    assert(nc.readDoubles("base").toSeq === Seq(7.0, 8.0))
    assert(nc.readDoublesRec("f").toSeq ===
      Seq(0.0, 1.0, 10.0, 11.0, 20.0, 21.0))
    assert(nc.readDoublesRec("s").toSeq === Seq(100.0, 101.0, 102.0))
    assert(nc.recSize === 12)
    // single record variable: stride NOT padded (spec special case) — a
    // 2-byte slab gives an odd stride a padded layout would never produce
    val nc1 = new Nc3.NcFile(Nc3.write(Seq(Nc3.Dim("rec", 0)), Nil,
      Seq(Nc3.VarSpec("s", Seq("rec"), Nil, Nc3.NcShort,
        Array(1.toShort, 2.toShort, 3.toShort))), numRecs = 3))
    assert(nc1.recSize === 2)
    assert(nc1.readDoublesRec("s").toSeq === Seq(1.0, 2.0, 3.0))
  }

  test("reader derives the record count from file length under the STREAMING sentinel") {
    // numrecs = 0xFFFFFFFF is spec-legal (streaming writer): readers must
    // compute the count from the bytes past the record start
    val bytes = handBuiltRecordFile()
    val bb = ByteBuffer.wrap(bytes)
    bb.putInt(4, -1) // overwrite numrecs with the sentinel
    val nc = new Nc3.NcFile(bytes)
    assert(nc.numRecs === 3)
    assert(nc.variable("f").shape.toSeq === Seq(3, 2))
    assert(nc.readDoublesRec("f").toSeq ===
      Seq(0.0, 1.0, 10.0, 11.0, 20.0, 21.0))
    assert(nc.readDoublesRec("s").toSeq === Seq(100.0, 101.0, 102.0))
  }

  test("writer rejects a record dimension that is not outermost") {
    // the spec requires the unlimited dim first; writing it elsewhere
    // would emit a header/data mismatch (silently corrupt file)
    val ex = intercept[IllegalArgumentException] {
      Nc3.write(Seq(Nc3.Dim("x", 2), Nc3.Dim("rec", 0)), Nil,
        Seq(Nc3.VarSpec("v", Seq("x", "rec"), Nil, Nc3.NcFloat,
          Array(1f, 2f))), numRecs = 3)
    }
    assert(ex.getMessage.contains("record dimension must be the first"))
  }

  test("CDF-2 (64-bit offset) writer round-trips and reports version 2") {
    val dims = Seq(Nc3.Dim("x", 3))
    val vars = Seq(
      Nc3.VarSpec("a", Seq("x"), Nil, Nc3.NcDouble, Array(1.0, 2.0, 3.0)),
      Nc3.VarSpec("b", Seq("x"), Nil, Nc3.NcInt, Array(4, 5, 6)))
    val bytes = Nc3.write(dims, Seq(Nc3.Att("title", Nc3.NcChar, "v2")),
      vars, version = 2)
    assert(bytes(3) === 2.toByte)
    val nc = new Nc3.NcFile(bytes)
    assert(nc.version === 2)
    assert(nc.gatt("title") === Some("v2"))
    assert(nc.readDoubles("a").toSeq === Seq(1.0, 2.0, 3.0))
    assert(nc.readDoubles("b").toSeq === Seq(4.0, 5.0, 6.0))
  }

  test("streaming writer emits byte-identical files to the in-memory writer") {
    // Shared Layout means the two writers agree on header/offsets BY
    // CONSTRUCTION; this pins the slab serialization too — including the
    // odd-length char slab whose pad bytes the streaming path must emit
    // explicitly (the in-memory path gets them free from the zeroed
    // whole-file buffer).
    val dims = Seq(Nc3.Dim("x", 3), Nc3.Dim("s", 5))
    val gatts = Seq(Nc3.Att("title", Nc3.NcChar, "stream"))
    val vars = Seq(
      Nc3.VarSpec("c", Seq("x", "s"), Nil, Nc3.NcChar,
        "abcdefghijklmno".getBytes("UTF-8")), // 15 bytes → 1 pad byte
      Nc3.VarSpec("a", Seq("x"), Seq(Nc3.Att("units", Nc3.NcChar, "m")),
        Nc3.NcDouble, Array(1.5, -2.0, 3.25)),
      Nc3.VarSpec("b", Seq("x"), Nil, Nc3.NcShort, Array[Short](7, 8, 9)))
    for (version <- Seq(1, 2)) {
      val inMem = Nc3.write(dims, gatts, vars, version = version)
      val fetched = scala.collection.mutable.ArrayBuffer.empty[String]
      val bos = new java.io.ByteArrayOutputStream()
      Nc3.writeStreaming(bos, dims, gatts, vars.map(_.decl), version) { d =>
        fetched += d.name
        vars.find(_.name == d.name).get.data
      }
      assert(bos.toByteArray.toSeq === inMem.toSeq, s"version $version differs")
      // one fetch per variable, in file order — the memory-bound contract
      assert(fetched.toSeq === Seq("c", "a", "b"))
    }
  }
}
