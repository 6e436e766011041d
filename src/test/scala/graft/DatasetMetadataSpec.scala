package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.meta.{DatasetMetadata, DenseModelMetadata, SparseModelMetadata}

class DatasetMetadataSpec extends AnyFunSuite {

  private val minimal =
    """{"name": "test_dataset", "created_at": "2021-01-01 00:00:00.000000",
      | "documents": 2, "queries": 2,
      | "dense_model": {"name": "ada", "dimension": 3}}""".stripMargin

  test("minimal valid descriptor parses") {
    val m = DatasetMetadata.fromJson(minimal)
    assert(m.name == "test_dataset")
    assert(m.documents == 2 && m.queries == 2)
    assert(m.dense_model == DenseModelMetadata("ada", None, 3))
    assert(m.sparse_model.isEmpty && m.tags.isEmpty)
  }

  test("missing required fields raise with field names") {
    val e = intercept[DatasetMetadata.MetadataValidationError] {
      DatasetMetadata.fromJson("""{"name": "x"}""")
    }
    assert(e.errors.exists(_.startsWith("created_at")))
    assert(e.errors.exists(_.startsWith("documents")))
    assert(e.errors.exists(_.startsWith("dense_model")))
  }

  test("wrong types raise") {
    val e = intercept[DatasetMetadata.MetadataValidationError] {
      DatasetMetadata.fromJson(
        """{"name": 5, "created_at": "t", "documents": "two", "queries": 0,
          | "dense_model": {"name": "m", "dimension": 3}}""".stripMargin)
    }
    assert(e.errors.exists(_.contains("name")))
    assert(e.errors.exists(_.contains("documents")))
  }

  test("non-object json raises") {
    intercept[DatasetMetadata.MetadataValidationError] {
      DatasetMetadata.fromJson("""[1,2,3]""")
    }
  }

  test("full descriptor round-trips through render/parse") {
    val m = DatasetMetadata(
      name = "ds", created_at = "2021-01-01 00:00:00.000000",
      documents = 10, queries = 5,
      source = Some("src"), license = Some("mit"), bucket = Some("b"),
      task = Some("qa"),
      dense_model = DenseModelMetadata("ada", Some("tok"), 768),
      sparse_model = Some(SparseModelMetadata("splade", None)),
      description = Some("d"), tags = Some(List("a", "b")))
    val back = DatasetMetadata.fromJson(m.toJson)
    assert(back == m)
  }

  test("empty() is empty") {
    assert(DatasetMetadata.empty.isEmpty)
    assert(!DatasetMetadata.fromJson(minimal).isEmpty)
  }

  test("unicode survives the round trip") {
    val m = DatasetMetadata.fromJson(minimal).copy(description = Some("héllo — 日本語"))
    assert(DatasetMetadata.fromJson(m.toJson).description.contains("héllo — 日本語"))
  }
}
