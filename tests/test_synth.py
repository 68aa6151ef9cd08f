"""Synthesized-corpus tests: determinism, shape, skew realism (N11)."""

from pyspark.sql import functions as F

from bufr2geojson_spark.operators.decode import decode_documents
from bufr2geojson_spark.sources.synth import (
    default_n_stations,
    synth_documents,
    synth_region_polygons,
    synth_stations,
)


def test_synth_shape_and_determinism(spark):
    docs = synth_documents(spark, 200, partitions=4)
    assert docs.schema["doc_id"].dataType.typeName() == "string"
    a = docs.orderBy("doc_id").collect()
    b = synth_documents(spark, 200, partitions=2).orderBy("doc_id").collect()
    # same rows regardless of partitioning (hash-derived, no rand())
    assert a == b
    assert len(a) == 200
    for r in a[:20]:
        offsets = [s.offset for s in r.spans]
        assert offsets == sorted(offsets)
        kinds = {s.kind for s in r.spans}
        assert kinds <= {"header", "element", "media"}
        assert [s.kind for s in r.spans][0] == "header"


def test_synth_decodes_cleanly(spark):
    docs = synth_documents(spark, 300, partitions=4)
    feats = decode_documents(docs).cache()
    errors = feats.filter("error is not null").count()
    assert errors == 0
    n = feats.count()
    assert n >= 300 * 4  # at least 4 data elements per doc
    # every feature has a geometry (synth always provides lat/lon/heights)
    assert feats.filter("lat is null or lon is null").count() == 0
    feats.unpersist()


def test_synth_skew(spark):
    """Hot stations must concentrate documents (north_star station clusters)."""
    docs = synth_documents(spark, 2000, partitions=4)
    feats = decode_documents(docs)
    by_host = feats.groupBy("host").count()
    stats = by_host.agg(
        F.max("count").alias("mx"), F.expr("percentile(count, 0.5)").alias("med")
    ).collect()[0]
    assert stats.mx >= 5 * stats.med


def test_stations_match_documents(spark):
    n_docs = 300
    n_st = default_n_stations(n_docs)
    stations = synth_stations(spark, n_st)
    assert stations.count() == n_st
    st_ids = {r.station_id for r in stations.collect()}
    feats = decode_documents(synth_documents(spark, n_docs))
    hosts = {r.host for r in feats.select("host").distinct().collect()}
    assert hosts <= st_ids


def test_region_polygons(spark):
    regs = synth_region_polygons(spark)
    rows = {r.region_id: r for r in regs.collect()}
    assert set(rows) == {"R1", "R2", "R3", "R4", "R5", "R6", "T1"}
    # antimeridian polygon stored unwrapped
    assert rows["R5"].bbox.maxx > 180
    # rings closed
    for r in rows.values():
        assert r.ring[0] == r.ring[-1]
