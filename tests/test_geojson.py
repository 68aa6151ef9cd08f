"""GeoJSON output parity: the engine's to_geojson must reproduce the
reference's golden Feature dict byte-for-byte in content (the reference test
fixture `geojson_output` at /root/reference/tests/test_bufr2geojson.py:82-226,
extracted at runtime via ast so no fixture is copied into this repo). The
reference test itself normalizes the two wall-clock fields before comparing
(:261-262); here they are injected deterministically instead and compared
exactly."""

import ast
import json

import pytest

from bufr2geojson_spark.functions.geojson import to_geojson, write_geojson
from bufr2geojson_spark.functions.cells import with_cells
from bufr2geojson_spark.operators.decode import decode_documents
from bufr2geojson_spark.sources.synth import golden_documents, synth_documents

REF_TEST = "/root/reference/tests/test_bufr2geojson.py"


def _reference_golden_feature() -> dict:
    """Extract the reference's expected-GeoJSON dict literal at runtime."""
    tree = ast.parse(open(REF_TEST).read())
    for node in ast.walk(tree):
        if isinstance(node, ast.FunctionDef) and node.name == "geojson_output":
            ret = node.body[-1]
            assert isinstance(ret, ast.Return)
            return ast.literal_eval(ret.value)
    raise AssertionError("geojson_output fixture not found in reference")


@pytest.fixture(scope="module")
def golden_geojson(spark):
    docs = golden_documents(spark)
    feats = decode_documents(docs).filter("error is null")
    out = to_geojson(feats, keep_cols=("feature_id", "doc_id"))
    rows = out.filter("doc_id = 'golden-sherkin-island'").collect()
    assert len(rows) == 1
    return json.loads(rows[0].geojson)


def test_geojson_matches_reference_fixture(golden_geojson):
    expected = _reference_golden_feature()
    # the reference normalizes its two wall-clock fields before comparing
    # (test_bufr2geojson.py:261-262); our engine injects the same fixed
    # timestamp the fixture carries, so compare fully and exactly
    assert golden_geojson == expected


def test_geojson_schema_keys_complete(golden_geojson):
    props = golden_geojson["properties"]
    for k in ("host", "observer", "observationType", "observedProperty",
              "observingProcedure", "phenomenonTime", "resultTime",
              "validTime", "result", "resultQuality", "parameter",
              "featureOfInterest", "index"):
        assert k in props
    assert golden_geojson["type"] == "Feature"
    assert golden_geojson["conformsTo"] == [
        "https://wis.wmo.int/spec/wccdm-obs/1/conf/observation"
    ]


def test_geojson_code_table_value_shape(spark):
    """A CODE TABLE result must serialize as the codetable struct, not a
    number (reference :1015-1022)."""
    docs = golden_documents(spark)
    feats = decode_documents(docs).filter("error is null").filter(
        "result_code is not null"
    )
    out = to_geojson(feats, keep_cols=("feature_id",)).collect()
    assert out
    for r in out:
        v = json.loads(r.geojson)["properties"]["result"]["value"]
        assert isinstance(v, dict) and "codetable" in v


def test_write_geojson_partitioned(spark, tmp_path):
    docs = synth_documents(spark, 40, partitions=2)
    feats = with_cells(decode_documents(docs).filter("error is null"))
    path = str(tmp_path / "geo_out")
    write_geojson(feats, path)
    back = spark.read.text(f"{path}/*/*.txt")
    n = back.count()
    assert n == feats.count()
    first = json.loads(back.limit(1).collect()[0].value)
    assert first["type"] == "Feature"
