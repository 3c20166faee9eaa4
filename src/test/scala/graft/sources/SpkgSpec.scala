package graft.sources

import org.scalatest.funsuite.AnyFunSuite

/** Golden wire bytes for the `.spkg` Package reader (read_package parity,
  * reference `src/main.rs:312-315`). Vectors hand-derived from the public
  * protobuf wire spec and the Package/Modules/Module field numbers in the
  * reference's generated types (`src/pb/sf.substreams.v1.rs`). */
class SpkgSpec extends AnyFunSuite {

  private def hex(s: String): Array[Byte] =
    s.replaceAll("\\s", "").grouped(2).map(Integer.parseInt(_, 16).toByte).toArray

  // Package{version:1, modules:{modules:[Module{name:"db_out",
  //   kind:map{output_type:"proto:Changes"}, output:{type:"proto:Changes"},
  //   initial_block:12}]}, network:"mainnet", sink_module:"db_out"}
  private val golden = hex(
    "2801" +                                            // version = 1
    "322e" +                                            // modules, len 46
    "0a2c" +                                            //   Module, len 44
    "0a06 64625f6f7574" +                               //     name "db_out"
    "120f 0a0d 70726f746f3a4368616e676573" +            //     kind map{output_type}
    "3a0f 0a0d 70726f746f3a4368616e676573" +            //     output{type}
    "400c" +                                            //     initial_block 12
    "4a07 6d61696e6e6574" +                             // network "mainnet"
    "5a06 64625f6f7574")                                // sink_module "db_out"

  test("golden package decodes every operationally relevant field") {
    val p = Spkg.decodePackage(golden)
    assert(p.version === 1L)
    assert(p.network === "mainnet")
    assert(p.sinkModule === "db_out")
    assert(p.modules === Seq(
      Spkg.ModuleInfo("db_out", "map", "proto:Changes", 12L)))
  }

  test("store modules and unknown fields are handled") {
    // Module{name:"idx"(0a03 696478), kind:store{}(1a00)} + an unknown
    // Package field 99 varint (tag 99<<3 = 792 -> varint 0x98 0x06, value 7)
    val bytes = hex("3209 0a07 0a03696478 1a00" + "9806 07")
    val p = Spkg.decodePackage(bytes)
    assert(p.modules === Seq(Spkg.ModuleInfo("idx", "store", "", 0L)))
    assert(p.version === 0L)
  }

  test("truncated package raises") {
    intercept[IllegalArgumentException] { Spkg.decodePackage(golden.take(5)) }
  }

  test("readFile round-trips through the filesystem") {
    val f = java.nio.file.Files.createTempFile("pkg", ".spkg")
    java.nio.file.Files.write(f, golden)
    assert(Spkg.readFile(f.toString).sinkModule === "db_out")
  }
}
