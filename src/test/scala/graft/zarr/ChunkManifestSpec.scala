package graft.zarr

import org.scalatest.funsuite.AnyFunSuite

/** Unit pins for the chunk-manifest document: type-strict parsing
  * (Jackson's asLong/asInt silently coerce non-numeric nodes to 0, which
  * would remap ordinal 0 to a bogus directory) and structural
  * transformer detection (a substring probe would refuse valid stores
  * whose attributes merely mention the transformer name). */
class ChunkManifestSpec extends AnyFunSuite {

  private def root(manifestJson: String): String =
    s"""{"zarr_format":3,"node_type":"group",
       |"attributes":{"${ChunkManifest.attrName}":$manifestJson}}""".stripMargin

  test("well-formed manifest parses and resolves ordinals") {
    val m = ChunkManifest.parse(root("""[[0,"c.partA-0",3],[3,"c.partA-1",2]]"""))
    assert(m.parts.length == 2)
    assert(m.keyFor(0L).contains("c.partA-0/0"))
    assert(m.keyFor(4L).contains("c.partA-1/1"))
    assert(m.keyFor(5L).isEmpty)
  }

  test("one malformed entry invalidates the WHOLE manifest (all-or-nothing)") {
    // non-numeric first ordinal would coerce to 0 under asLong
    assert(ChunkManifest.parse(root("""[["x","c.partA-0",3]]""")).isEmpty)
    // float ordinal
    assert(ChunkManifest.parse(root("""[[0.5,"c.partA-0",3]]""")).isEmpty)
    // non-text dir
    assert(ChunkManifest.parse(root("""[[0,7,3]]""")).isEmpty)
    // non-numeric count
    assert(ChunkManifest.parse(root("""[[0,"c.partA-0","3"]]""")).isEmpty)
    // wrong arity
    assert(ChunkManifest.parse(root("""[[0,"c.partA-0"]]""")).isEmpty)
    // a good entry does NOT survive alongside a bad one — dropping only
    // the bad entry would fall back to canonical keys for its range
    assert(ChunkManifest.parse(
      root("""[[0,"c.partA-0",3],["x","c.partA-1",2]]""")).isEmpty)
  }

  test("transformer detection parses storage_transformers, not substrings") {
    val marked =
      s"""{"zarr_format":3,"node_type":"array",
         |"storage_transformers":[{"name":"${ChunkManifest.transformerName}"}]}"""
        .stripMargin
    assert(ChunkManifest.declaresTransformer(marked))
    // an attribute VALUE mentioning the name must not trigger the
    // must-understand refusal for a canonical-keyed store
    val mention =
      s"""{"zarr_format":3,"node_type":"array",
         |"attributes":{"notes":"migrated off ${ChunkManifest.transformerName} layout"}}"""
        .stripMargin
    assert(!ChunkManifest.declaresTransformer(mention))
    // a DIFFERENT transformer stays undetected here (ZarrMeta.parse
    // rejects it as must-understand separately)
    val other =
      """{"zarr_format":3,"node_type":"array",
        |"storage_transformers":[{"name":"other-transformer"}]}""".stripMargin
    assert(!ChunkManifest.declaresTransformer(other))
  }

  test("validateRequired hard-fails a manifest-keyed store with an empty manifest") {
    val marked =
      s"""{"zarr_format":3,"node_type":"array",
         |"storage_transformers":[{"name":"${ChunkManifest.transformerName}"}]}"""
        .stripMargin
    val e = intercept[ZarrException] {
      ChunkManifest.validateRequired("memory://s", Seq(marked), ChunkManifest.empty)
    }
    assert(e.getMessage.contains("manifest-keyed"))
    // unmarked metadata with an empty manifest is fine (canonical keys)
    assert(ChunkManifest.validateRequired("memory://s",
      Seq("""{"zarr_format":3,"node_type":"array"}"""), ChunkManifest.empty).isEmpty)
  }
}
