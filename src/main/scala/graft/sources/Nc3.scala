package graft.sources

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets

/** NetCDF-3 "classic" container format, pure Scala, from the public file
  * format specification (the CDL/CDF-1 and CDF-2 layouts published in the
  * NetCDF User's Guide appendix: big-endian header of dim/gatt/var lists,
  * then 4-byte-aligned fixed variable slabs, then record blocks).
  *
  * This is S2's wire format: the reference's only real input path is the
  * GDAC's `<dac>/<wmo>/<wmo>_prof.nc` files (toctools.py:117-118,
  * interpolation.py:182-197 via xarray), and its atlas sink writes NetCDF
  * too (atlas.py:611-636). Implementing the classic format directly — no
  * native library exists for the JVM classpath here — gives the engine a
  * self-contained reader for executors ([[ArgoNetCDF]]) and a writer for
  * the atlas export ([[graft.argo.AtlasSink]].writeNetcdf).
  *
  * Scope: CDF-1 and CDF-2 (64-bit offset) headers, all six classic types,
  * fixed-size variables read/write. Record (unlimited-dimension) variables
  * are parsed in the header but not materialized — Argo `_prof.nc` files
  * keep their science variables on fixed dims (N_PROF × N_LEVELS); only
  * the HISTORY block is record-structured, and nothing downstream reads
  * it. NetCDF-4/HDF5 files are out of scope (the GDAC distributes classic).
  */
object Nc3 {
  val NcByte = 1; val NcChar = 2; val NcShort = 3
  val NcInt = 4; val NcFloat = 5; val NcDouble = 6

  private val TagDimension = 0x0A
  private val TagVariable = 0x0B
  private val TagAttribute = 0x0C

  def typeSize(t: Int): Int = t match {
    case NcByte | NcChar => 1
    case NcShort => 2
    case NcInt | NcFloat => 4
    case NcDouble => 8
    case _ => throw new IllegalArgumentException(s"bad nc_type $t")
  }

  private def pad4(n: Long): Long = (n + 3L) & ~3L

  final case class Dim(name: String, length: Int) {
    def isRecord: Boolean = length == 0
  }

  /** Attribute value: a String (NC_CHAR) or an Array of a numeric type. */
  final case class Att(name: String, ncType: Int, value: Any)

  final class Var(
      val name: String,
      val dimIds: Array[Int],
      val atts: Seq[Att],
      val ncType: Int,
      val vsize: Long,
      val begin: Long,
      val shape: Array[Int],
      val isRecord: Boolean)

  // ---- reader -------------------------------------------------------------

  final class NcFile(bytes: Array[Byte]) {
    private val bb = ByteBuffer.wrap(bytes) // big-endian by default

    require(bb.get() == 'C'.toByte && bb.get() == 'D'.toByte &&
      bb.get() == 'F'.toByte, "not a NetCDF classic file (bad magic)")
    val version: Int = bb.get().toInt
    require(version == 1 || version == 2,
      s"unsupported NetCDF version byte $version (classic CDF-1/2 only)")

    val numRecs: Int = bb.getInt()

    private def readName(): String = {
      val n = bb.getInt()
      val b = new Array[Byte](n)
      bb.get(b)
      bb.position((pad4(bb.position().toLong) ).toInt)
      new String(b, StandardCharsets.UTF_8)
    }

    private def readTagList(expected: Int): Int = {
      val tag = bb.getInt()
      val n = bb.getInt()
      require((tag == expected && n >= 0) || (tag == 0 && n == 0),
        s"bad tag list: tag=$tag n=$n expected=$expected")
      n
    }

    private def readAtts(): Seq[Att] =
      (0 until readTagList(TagAttribute)).map { _ =>
        val name = readName()
        val t = bb.getInt()
        val n = bb.getInt()
        val value: Any = t match {
          case NcChar =>
            val b = new Array[Byte](n)
            bb.get(b)
            new String(b, StandardCharsets.UTF_8)
          case NcByte => Array.fill(n)(bb.get())
          case NcShort => Array.fill(n)(bb.getShort())
          case NcInt => Array.fill(n)(bb.getInt())
          case NcFloat => Array.fill(n)(bb.getFloat())
          case NcDouble => Array.fill(n)(bb.getDouble())
          case other => throw new IllegalArgumentException(
            s"attribute $name has bad nc_type $other (corrupt header?)")
        }
        bb.position(pad4(bb.position().toLong).toInt)
        Att(name, t, value)
      }

    val dims: IndexedSeq[Dim] =
      (0 until readTagList(TagDimension)).map { _ =>
        Dim(readName(), bb.getInt())
      }

    val gatts: Seq[Att] = readAtts()

    val vars: IndexedSeq[Var] =
      (0 until readTagList(TagVariable)).map { _ =>
        val name = readName()
        val nd = bb.getInt()
        val dimIds = Array.fill(nd)(bb.getInt())
        val atts = readAtts()
        val t = bb.getInt()
        val vsize = bb.getInt().toLong & 0xffffffffL
        val begin = if (version == 2) bb.getLong()
          else bb.getInt().toLong & 0xffffffffL
        val isRec = dimIds.nonEmpty && dims(dimIds(0)).isRecord
        val shape = dimIds.map(i =>
          if (dims(i).isRecord) numRecs else dims(i).length)
        new Var(name, dimIds, atts, t, vsize, begin, shape, isRec)
      }

    private val byName: Map[String, Var] = vars.map(v => v.name -> v).toMap

    def has(name: String): Boolean = byName.contains(name)
    def variable(name: String): Var =
      byName.getOrElse(name, throw new NoSuchElementException(
        s"no variable $name (have ${vars.map(_.name).mkString(", ")})"))
    def gatt(name: String): Option[Any] =
      gatts.find(_.name == name).map(_.value)

    /** Fixed variable → flattened row-major numeric array (widened to
      * Double; NC_CHAR refused — use [[readChars]]). */
    def readDoubles(name: String): Array[Double] = {
      val v = fixed(name)
      require(v.ncType != NcChar, s"$name is NC_CHAR; use readChars")
      val n = v.shape.foldLeft(1L)(_ * _).toInt
      val out = new Array[Double](n)
      val db = bb.duplicate().position(v.begin.toInt)
      var i = 0
      v.ncType match {
        case NcByte => while (i < n) { out(i) = db.get(); i += 1 }
        case NcShort => while (i < n) { out(i) = db.getShort(); i += 1 }
        case NcInt => while (i < n) { out(i) = db.getInt(); i += 1 }
        case NcFloat => while (i < n) { out(i) = db.getFloat(); i += 1 }
        case NcDouble => while (i < n) { out(i) = db.getDouble(); i += 1 }
      }
      out
    }

    /** Fixed NC_CHAR variable → raw bytes, row-major. */
    def readChars(name: String): Array[Byte] = {
      val v = fixed(name)
      require(v.ncType == NcChar, s"$name is not NC_CHAR")
      val n = v.shape.foldLeft(1L)(_ * _).toInt
      val out = new Array[Byte](n)
      bb.duplicate().position(v.begin.toInt).get(out)
      out
    }

    private def fixed(name: String): Var = {
      val v = variable(name)
      require(!v.isRecord,
        s"$name is a record variable — not supported (HISTORY block)")
      v
    }
  }

  // ---- writer -------------------------------------------------------------

  /** One fixed variable to write: `data` length must equal the dim product
    * (an Array of the JVM type matching `ncType`; NC_CHAR = Array[Byte]). */
  final case class VarSpec(name: String, dimNames: Seq[String],
                           atts: Seq[Att], ncType: Int, data: AnyRef)

  /** Serialize a CDF-1 classic file (fixed variables only). */
  def write(dims: Seq[Dim], gatts: Seq[Att], vars: Seq[VarSpec]): Array[Byte] = {
    require(dims.forall(!_.isRecord), "writer supports fixed dims only")
    val dimIdx = dims.map(_.name).zipWithIndex.toMap

    def nameLen(s: String) = 4 + pad4(s.getBytes(StandardCharsets.UTF_8).length.toLong)
    def attLen(a: Att): Long = {
      val n = a.value match {
        case s: String => s.getBytes(StandardCharsets.UTF_8).length
        case arr: Array[_] => arr.length
      }
      nameLen(a.name) + 8 + pad4(n.toLong * typeSize(a.ncType))
    }
    def attListLen(as: Seq[Att]): Long = 8 + as.map(attLen).sum

    def shapeOf(v: VarSpec): Array[Int] =
      v.dimNames.map(d => dims(dimIdx(d)).length).toArray
    def vsizeOf(v: VarSpec): Long =
      pad4(shapeOf(v).foldLeft(1L)(_ * _) * typeSize(v.ncType))
    // a mismatched array would silently overflow into the next variable's
    // slab (or read back zero padding as data) — fail fast instead
    vars.foreach { v =>
      val want = shapeOf(v).foldLeft(1L)(_ * _)
      val got = v.data match { case a: Array[_] => a.length.toLong }
      require(got == want,
        s"variable ${v.name}: data length $got != dim product $want")
    }

    val headerLen: Long = 4 + 4 + // magic + numrecs
      8 + dims.map(d => nameLen(d.name) + 4).sum + // dim list
      attListLen(gatts) +
      8 + vars.map(v => nameLen(v.name) + 4 + 4L * v.dimNames.length +
        attListLen(v.atts) + 4 + 4 + 4).sum

    val begins = vars.scanLeft(pad4(headerLen))((off, v) => off + vsizeOf(v))
    val total = begins.last
    require(total <= Int.MaxValue, "CDF-1 writer limited to <2 GiB")
    val bb = ByteBuffer.allocate(total.toInt)

    def putName(s: String): Unit = {
      val b = s.getBytes(StandardCharsets.UTF_8)
      bb.putInt(b.length)
      bb.put(b)
      while ((bb.position() & 3) != 0) bb.put(0.toByte)
    }
    def putAttValue(t: Int, value: Any): Unit = {
      value match {
        case s: String => bb.put(s.getBytes(StandardCharsets.UTF_8))
        case a: Array[Byte] => bb.put(a)
        case a: Array[Short] => a.foreach(bb.putShort)
        case a: Array[Int] => a.foreach(bb.putInt)
        case a: Array[Float] => a.foreach(bb.putFloat)
        case a: Array[Double] => a.foreach(bb.putDouble)
      }
      while ((bb.position() & 3) != 0) bb.put(0.toByte)
    }
    def putAttList(as: Seq[Att]): Unit = {
      bb.putInt(if (as.isEmpty) 0 else TagAttribute)
      bb.putInt(as.length)
      as.foreach { a =>
        putName(a.name)
        bb.putInt(a.ncType)
        val n = a.value match {
          case s: String => s.getBytes(StandardCharsets.UTF_8).length
          case arr: Array[_] => arr.length
        }
        bb.putInt(n)
        putAttValue(a.ncType, a.value)
      }
    }

    bb.put('C'.toByte).put('D'.toByte).put('F'.toByte).put(1.toByte)
    bb.putInt(0) // numrecs
    bb.putInt(if (dims.isEmpty) 0 else TagDimension)
    bb.putInt(dims.length)
    dims.foreach { d => putName(d.name); bb.putInt(d.length) }
    putAttList(gatts)
    bb.putInt(if (vars.isEmpty) 0 else TagVariable)
    bb.putInt(vars.length)
    vars.zip(begins).foreach { case (v, begin) =>
      putName(v.name)
      bb.putInt(v.dimNames.length)
      v.dimNames.foreach(d => bb.putInt(dimIdx(d)))
      putAttList(v.atts)
      bb.putInt(v.ncType)
      bb.putInt(vsizeOf(v).toInt)
      bb.putInt(begin.toInt)
    }
    vars.zip(begins).foreach { case (v, begin) =>
      bb.position(begin.toInt)
      v.data match {
        case a: Array[Byte] => bb.put(a)
        case a: Array[Short] => a.foreach(bb.putShort)
        case a: Array[Int] => a.foreach(bb.putInt)
        case a: Array[Float] => a.foreach(bb.putFloat)
        case a: Array[Double] => a.foreach(bb.putDouble)
      }
    }
    bb.array()
  }
}
