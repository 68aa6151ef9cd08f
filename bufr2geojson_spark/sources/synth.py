"""Deterministic synthesis of the interleaved text+media document corpus.

BASELINE.json's ``input_hint`` fixes the input shape::

    doc_id: string, spans: array<struct<kind,text,media_ref,offset:int>>

and the north rule targets a 10^12-document corpus; this module generates the
same *shape* at any scale, fully deterministically (hash-derived, no
``rand()``, no wall clock — a re-run at any parallelism produces byte-identical
rows, which the resume/lineage tests rely on).

One document == one BUFR subset report, mirroring the reference's
message/subset explosion (``bufr2geojson/__init__.py:1224-1232``): a single
``header`` span (JSON of the 22 ecCodes header keys + the ``sequence`` string,
see ``HEADERS`` at ``__init__.py:96-103`` and sequence assembly at
``:898-907``), followed by ``element`` spans in descriptor order (the qualifier
state machine at ``__init__.py:216-254,1054-1088`` must see class 01/04/05/06/07
qualifiers before the data elements), with ``media`` spans interleaved at
arbitrary offsets (north_rule: interleaved text + media).

Element span text is pipe-separated::

    fxxyyy|key|value|units|scale|reference|width|description|af_sig|af_value

where empty string encodes null; ``af_*`` carry the ecCodes associated-field
(``key->associatedField``) that the reference reads at ``__init__.py:944-948``.

Skew realism (north_star "synop/temp station clusters"): a configurable share
of documents concentrates on a small set of clustered stations so the salted
tile aggregation actually has hot cells to handle.

Generation is distributed: ``spark.range(n) → mapInPandas`` so a 10^12-row
synthesis would scale across executors; nothing is collected on the driver.
"""

from __future__ import annotations

import json
from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession

from bufr2geojson_spark.schemas import (
    DOCUMENT_SCHEMA,
    REGION_POLYGON_SCHEMA,
    STATION_SCHEMA,
)

GOLDEN_REPORT_ID = "1ec58338aab209c8ab22f05309315b71"

# ---------------------------------------------------------------------------
# hash-derived determinism (splitmix64; public-domain algorithm)
# ---------------------------------------------------------------------------

_M = np.uint64(0xFF51AFD7ED558CCD)
_N = np.uint64(0xC4CEB9FE1A85EC53)


def _mix(x: np.ndarray) -> np.ndarray:
    x = np.asarray(x, dtype=np.uint64)
    x = (x + np.uint64(0x9E3779B97F4A7C15)) & np.uint64(0xFFFFFFFFFFFFFFFF)
    x ^= x >> np.uint64(30)
    x = (x * _M) & np.uint64(0xFFFFFFFFFFFFFFFF)
    x ^= x >> np.uint64(27)
    x = (x * _N) & np.uint64(0xFFFFFFFFFFFFFFFF)
    x ^= x >> np.uint64(31)
    return x


def _h(ids: np.ndarray, seed: int, stream: int) -> np.ndarray:
    """64-bit hash stream keyed by (seed, stream) over integer ids."""
    mask = (1 << 64) - 1
    base = np.uint64(
        ((seed * 0x9E3779B97F4A7C15) ^ (stream * 0xC4CEB9FE1A85EC53)) & mask
    )
    return _mix(np.asarray(ids, dtype=np.uint64) ^ base)


def _uni(ids: np.ndarray, seed: int, stream: int) -> np.ndarray:
    """Deterministic uniform(0,1) per id."""
    return (_h(ids, seed, stream) >> np.uint64(11)).astype(np.float64) * (2.0**-53)


# ---------------------------------------------------------------------------
# element span encoding
# ---------------------------------------------------------------------------


def element_text(
    fxxyyy: str,
    key: str,
    value=None,
    units: str = "Numeric",
    scale=0,
    reference=0,
    width=8,
    description=None,
    af_sig=None,
    af_value=None,
) -> str:
    def fmt(v):
        if v is None:
            return ""
        if isinstance(v, float):
            return repr(v)
        return str(v)

    return "|".join(
        [
            fxxyyy,
            key,
            fmt(value),
            units,
            fmt(scale),
            fmt(reference),
            fmt(width),
            "" if description is None else str(description),
            fmt(af_sig),
            fmt(af_value),
        ]
    )


def _span(kind: str, text: str, offset: int, media_ref=None) -> dict:
    return {"kind": kind, "text": text, "media_ref": media_ref, "offset": offset}


def _header_json(
    *,
    year: int,
    month: int,
    day: int,
    hour: int,
    minute: int = 0,
    data_category: int = 0,
    intl_sub_category: int = 1,
    sequence: str = "307080",
    report_identifier: str | None = None,
    source_identifier: str | None = None,
    centre: int = 233,
    table_version: int = 14,
    number_of_subsets: int = 1,
    subset_number: int = 1,
) -> str:
    headers = {
        "edition": 4,
        "masterTableNumber": 0,
        "bufrHeaderCentre": centre,
        "bufrHeaderSubCentre": 0,
        "updateSequenceNumber": 0,
        "dataCategory": data_category,
        "internationalDataSubCategory": intl_sub_category,
        "dataSubCategory": 0,
        "masterTablesVersionNumber": table_version,
        "localTablesVersionNumber": 0,
        "typicalYear": year,
        "typicalMonth": month,
        "typicalDay": day,
        "typicalHour": hour,
        "typicalMinute": minute,
        "typicalSecond": 0,
        "typicalDate": f"{year:04d}{month:02d}{day:02d}",
        "typicalTime": f"{hour:02d}{minute:02d}00",
        "numberOfSubsets": number_of_subsets,
        "observedData": 1,
        "compressedData": 0,
        "subsetNumber": subset_number,
        "sequence": sequence,
    }
    if report_identifier is not None:
        headers["reportIdentifier"] = report_identifier
    if source_identifier is not None:
        headers["sourceIdentifier"] = source_identifier
    return json.dumps(headers)


def _qualifier_spans(
    *,
    block: int | None,
    station: int | None,
    callsign: str | None,
    wigos: tuple | None = None,
    year: int,
    month: int,
    day: int,
    hour: int,
    minute: int,
    lat: float,
    lon: float,
    ground_m: float,
    barometer_m: float,
    station_name: str | None = None,
    start_offset: int = 1,
) -> list[dict]:
    """Identification + time + location qualifier spans in descriptor order
    (mirrors a SYNOP 307080 prefix; the state machine consumes them before the
    data elements, bufr2geojson/__init__.py:1054-1068)."""
    off = start_offset
    spans = []

    def add(text):
        nonlocal off
        spans.append(_span("element", text, off))
        off += 1

    if wigos is not None:
        series, issuer, issue, local = wigos
        add(element_text("001125", "#1#wigosIdentifierSeries", series, "Numeric", 0, 0, 4))
        add(element_text("001126", "#1#wigosIssuerOfIdentifier", issuer, "Numeric", 0, 0, 16))
        add(element_text("001127", "#1#wigosIssueNumber", issue, "Numeric", 0, 0, 16))
        add(
            element_text(
                "001128",
                "#1#wigosLocalIdentifierCharacter",
                None,
                "CCITT IA5",
                0,
                0,
                128,
                description=str(local),
            )
        )
    elif block is not None:
        add(element_text("001001", "#1#blockNumber", block, "Numeric", 0, 0, 7))
        add(element_text("001002", "#1#stationNumber", station, "Numeric", 0, 0, 10))
    elif callsign is not None:
        add(
            element_text(
                "001011",
                "#1#shipOrMobileLandStationIdentifier",
                None,
                "CCITT IA5",
                0,
                0,
                72,
                description=callsign,
            )
        )
    if station_name is not None:
        add(
            element_text(
                "001015",
                "#1#stationOrSiteName",
                None,
                "CCITT IA5",
                0,
                0,
                160,
                description=station_name,
            )
        )
    add(element_text("002001", "#1#stationType", 0, "CODE TABLE", 0, 0, 2))
    add(element_text("004001", "#1#year", year, "a", 0, 0, 12))
    add(element_text("004002", "#1#month", month, "mon", 0, 0, 4))
    add(element_text("004003", "#1#day", day, "d", 0, 0, 6))
    add(element_text("004004", "#1#hour", hour, "h", 0, 0, 5))
    add(element_text("004005", "#1#minute", minute, "min", 0, 0, 6))
    add(element_text("005001", "#1#latitude", float(lat), "deg", 5, -9000000, 25))
    add(element_text("006001", "#1#longitude", float(lon), "deg", 5, -18000000, 26))
    add(
        element_text(
            "007030",
            "#1#heightOfStationGroundAboveMeanSeaLevel",
            float(ground_m),
            "m",
            1,
            -4000,
            17,
        )
    )
    add(
        element_text(
            "007031",
            "#1#heightOfBarometerAboveMeanSeaLevel",
            float(barometer_m),
            "m",
            1,
            -4000,
            17,
        )
    )
    return spans


# catalog of data elements the scaled generator cycles through:
# (fxxyyy, ecCodes key, units, scale, width, value_lo, value_hi)
_DATA_CATALOG = [
    ("010004", "#1#nonCoordinatePressure", "Pa", -1, 14, 95000.0, 104000.0),
    ("010051", "#1#pressureReducedToMeanSeaLevel", "Pa", -1, 14, 98000.0, 104000.0),
    ("012101", "#1#airTemperature", "K", 2, 16, 233.0, 315.0),
    ("012103", "#1#dewpointTemperature", "K", 2, 16, 230.0, 305.0),
    ("013003", "#1#relativeHumidity", "%", 0, 7, 5.0, 100.0),
    ("020001", "#1#horizontalVisibility", "m", -1, 13, 100.0, 60000.0),
    ("011001", "#1#windDirection", "deg", 0, 9, 0.0, 360.0),
    ("011002", "#1#windSpeed", "m/s", 1, 12, 0.0, 45.0),
    ("013011", "#1#totalPrecipitationOrTotalWaterEquivalent", "kg m-2", 1, 14, 0.0, 80.0),
    ("020010", "#1#cloudCoverTotal", "%", 0, 7, 0.0, 100.0),
    ("012113", "#1#groundMinimumTemperaturePast12Hours", "K", 2, 16, 230.0, 300.0),
    ("013009", "#1#relativeHumidity2", "%", 1, 10, 5.0, 100.0),
]

_PRESENT_WEATHER_ENTRIES = [0, 1, 2, 3, 10, 21, 25, 45, 60, 61, 71, 80, 95]


# ---------------------------------------------------------------------------
# station dimension (shared derivation between docs and the stations table)
# ---------------------------------------------------------------------------


def _station_arrays(n_stations: int, seed: int = 7) -> dict[str, np.ndarray]:
    """Deterministic station set. The first 10% of stations sit in tight
    geographic clusters (0.5-degree spread) — these are the hot 'synop/temp
    station cluster' cells of the north_star; the rest are uniform."""
    s = np.arange(n_stations, dtype=np.uint64)
    n_hot = max(1, n_stations // 10)
    n_clusters = max(1, n_hot // 25)

    # cluster centers, hash-placed
    c = np.arange(n_clusters, dtype=np.uint64)
    c_lat = -50.0 + 110.0 * _uni(c, seed, 101)
    c_lon = -170.0 + 340.0 * _uni(c, seed, 102)

    lat = -60.0 + 130.0 * _uni(s, seed, 11)
    lon = -175.0 + 350.0 * _uni(s, seed, 12)
    hot = s < n_hot
    cid = (s % np.uint64(n_clusters)).astype(np.int64)
    lat = np.where(hot, c_lat[cid] + (_uni(s, seed, 13) - 0.5), lat)
    lon = np.where(hot, c_lon[cid] + (_uni(s, seed, 14) - 0.5), lon)

    elevation = np.round(2000.0 * _uni(s, seed, 15), 1)
    kind = (_h(s, seed, 16) % np.uint64(10)).astype(np.int64)  # 0-6 land, 7-8 ship, 9 wigos
    block = (s.astype(np.int64) // 999 + 1).astype(np.int64)
    stnum = (s.astype(np.int64) % 999).astype(np.int64)

    tsi = np.empty(n_stations, dtype=object)
    wsi = np.empty(n_stations, dtype=object)
    for i in range(n_stations):
        if kind[i] <= 6:
            t = f"{block[i]:02d}{stnum[i]:03d}"
            tsi[i] = t
            wsi[i] = f"0-20000-0-{t}"
        elif kind[i] <= 8:
            t = f"SHIP{i:05d}"
            tsi[i] = t
            wsi[i] = f"0-20004-0-{t}"
        else:
            t = f"{i:05d}"
            tsi[i] = t
            wsi[i] = f"0-20008-0-{t}"

    region = np.minimum(6, 1 + (lon + 180.0) // 60.0).astype(np.int32)
    return {
        "station_id": wsi,
        "tsi": tsi,
        "lat": np.round(lat, 5),
        "lon": np.round(lon, 5),
        "elevation_m": elevation,
        "wmo_region": region,
        "kind": kind,
        "block": block,
        "stnum": stnum,
        "n_hot": n_hot,
    }


def default_n_stations(n_docs: int) -> int:
    return max(50, min(20000, n_docs // 20))


def synth_stations(spark: SparkSession, n_stations: int, seed: int = 7) -> DataFrame:
    a = _station_arrays(n_stations, seed)
    pdf = pd.DataFrame(
        {
            "station_id": a["station_id"],
            "tsi": a["tsi"],
            "lat": a["lat"],
            "lon": a["lon"],
            "elevation_m": a["elevation_m"],
            "wmo_region": a["wmo_region"],
        }
    )
    return spark.createDataFrame(pdf, schema=STATION_SCHEMA)


# ---------------------------------------------------------------------------
# region polygons (PIP dimension; FIXTURES.md §3)
# ---------------------------------------------------------------------------


def synth_region_polygons(spark: SparkSession) -> DataFrame:
    """Six simplified WMO-region-style polygons + adversarial test shapes:
    a concave polygon, an antimeridian-crossing polygon (stored with lon
    unwrapped past 180), and a tiny polygon containing only the golden
    sherkin-island point (-9.42, 51.47)."""

    def ring(pts):
        return [{"lon": float(x), "lat": float(y)} for x, y in pts]

    def bbox(pts):
        xs = [p[0] for p in pts]
        ys = [p[1] for p in pts]
        return {
            "minx": float(min(xs)),
            "miny": float(min(ys)),
            "maxx": float(max(xs)),
            "maxy": float(max(ys)),
        }

    shapes = []

    def add(rid, name, pts):
        shapes.append(
            {"region_id": rid, "region_name": name, "ring": ring(pts), "bbox": bbox(pts)}
        )

    # simplified WMO regions (boxes / simple polygons, CCW)
    add("R1", "africa", [(-25, -40), (60, -40), (60, 35), (-25, 35), (-25, -40)])
    # concave Asia: a notch cut out of the south edge
    add(
        "R2",
        "asia",
        [
            (60, 0),
            (100, 0),
            (100, 25),
            (120, 25),
            (120, 0),
            (178, 0),
            (178, 80),
            (60, 80),
            (60, 0),
        ],
    )
    add("R3", "south-america", [(-90, -60), (-30, -60), (-30, 12), (-90, 12), (-90, -60)])
    add("R4", "north-america", [(-170, 12), (-50, 12), (-50, 85), (-170, 85), (-170, 12)])
    # antimeridian-crossing: lon stored unwrapped in [110, 240] == [110,180]∪[-180,-120]
    add("R5", "sw-pacific", [(110, -60), (240, -60), (240, 0), (110, 0), (110, -60)])
    add("R6", "europe", [(-25, 35), (60, 35), (60, 85), (-25, 85), (-25, 35)])
    # tiny polygon containing exactly the golden fixture point
    add(
        "T1",
        "sherkin-island",
        [(-9.47, 51.42), (-9.37, 51.42), (-9.37, 51.52), (-9.47, 51.52), (-9.47, 51.42)],
    )
    return spark.createDataFrame(pd.DataFrame(shapes), schema=REGION_POLYGON_SCHEMA)


# ---------------------------------------------------------------------------
# golden fixture documents (FIXTURES.md §4)
# ---------------------------------------------------------------------------


def sherkin_island_document() -> dict:
    """Document whose first decoded feature must deep-equal the reference
    golden fixture (tests/test_bufr2geojson.py:83-226): geometry
    [-9.42, 51.47, 21.0], WSI 0-20000-0-03951, phenomenonTime
    2022-03-20T21:00:00Z, result 1019.3 hPa, reportType 000001, zCoordinate
    height_above_local_ground 1.0 m."""
    spans = [
        _span(
            "header",
            _header_json(
                year=2022,
                month=3,
                day=20,
                hour=21,
                sequence="307080",
                report_identifier=GOLDEN_REPORT_ID,
            ),
            0,
        )
    ]
    spans += _qualifier_spans(
        block=3,
        station=951,
        callsign=None,
        year=2022,
        month=3,
        day=20,
        hour=21,
        minute=0,
        lat=51.47,
        lon=-9.42,
        ground_m=20.0,
        barometer_m=21.0,
        station_name="SHERKIN ISLAND",
        start_offset=1,
    )
    off = spans[-1]["offset"] + 1
    spans.append(
        _span(
            "element",
            element_text(
                "010004", "#1#nonCoordinatePressure", 101930.0, "Pa", -1, 0, 14
            ),
            off,
        )
    )
    return {"doc_id": "golden-sherkin-island", "spans": spans}


def _data_block(off: int, u) -> list[dict]:
    """24 data-element spans (plus their inline qualifiers) used by the
    multi-message fixture: numeric, code-table, flag-table, time-period
    displaced, statistic-qualified, associated-field, and one missing-value
    element (suppressed per bufr2geojson/__init__.py:1090)."""
    spans = []

    def add(text):
        nonlocal off
        spans.append(_span("element", text, off))
        off += 1

    k = 0
    # 17 plain numeric data elements from the catalog (cycled)
    for i in range(17):
        f, key, units, scale, width, lo, hi = _DATA_CATALOG[i % len(_DATA_CATALOG)]
        if i >= len(_DATA_CATALOG):
            key = key.replace("#1#", "#2#")
        val = round(lo + (hi - lo) * u(50 + i), 2)
        add(element_text(f, key, float(val), units, scale, 0, width))
        k += 1
    # code-table data element (present weather)
    pw = _PRESENT_WEATHER_ENTRIES[int(u(70) * len(_PRESENT_WEATHER_ENTRIES))]
    add(element_text("020003", "#1#presentWeather", pw, "CODE TABLE", 0, 0, 9))
    k += 1
    # flag-table data element (type of precipitation, bits 1+3 set)
    add(element_text("020021", "#1#typeOfPrecipitation", 671088640, "FLAG TABLE", 0, 0, 30))
    k += 1
    # time-period displaced pair: avg wind over preceding 10 minutes
    add(element_text("004025", "#2#timePeriod", -10, "min", 0, -2048, 12))
    add(element_text("011001", "#2#windDirection", float(round(360 * u(71))), "deg", 0, 0, 9))
    k += 1
    add(
        element_text(
            "011002",
            "#2#windSpeed",
            float(round(40 * u(72), 1)),
            "m/s",
            1,
            0,
            12,
            af_sig=1,
            af_value=0,
        )
    )
    k += 1
    # clear the time period (null value deletes the qualifier, __init__.py:236-238)
    add(element_text("004025", "#3#timePeriod", None, "min", 0, -2048, 12))
    # statistic-qualified element: maximum temperature
    add(element_text("008023", "#1#firstOrderStatistics", 2, "CODE TABLE", 0, 0, 6))
    add(
        element_text(
            "012111",
            "#1#maximumTemperatureAtHeightAndOverPeriodSpecified",
            float(round(280 + 30 * u(73), 2)),
            "K",
            2,
            0,
            16,
        )
    )
    k += 1
    add(element_text("008023", "#2#firstOrderStatistics", None, "CODE TABLE", 0, 0, 6))
    # two more numerics to land on exactly 24 emitted features
    add(element_text("010052", "#1#altimeterSettingQnh", float(round(98000 + 5000 * u(74), 0)), "Pa", -1, 0, 14))
    k += 1
    add(element_text("012102", "#1#wetBulbTemperature", float(round(250 + 40 * u(75), 2)), "K", 2, 0, 16))
    k += 1
    # a missing-value element — must NOT emit a feature
    add(element_text("013003", "#2#relativeHumidity", None, "%", 0, 0, 7))
    assert k == 24, k
    return spans


def multi_message_documents() -> list[dict]:
    """Two documents that decode to exactly 48 features total (24 each),
    mirroring the reference cardinality fixture
    (tests/test_bufr2geojson.py:229-238)."""
    docs = []
    for d in range(2):
        ids = np.array([d], dtype=np.uint64)

        def u(stream, _ids=ids):
            return float(_uni(_ids, 42, stream)[0])

        spans = [
            _span(
                "header",
                _header_json(
                    year=2022, month=3, day=20, hour=15 + d, sequence="307080"
                ),
                0,
            )
        ]
        spans += _qualifier_spans(
            block=d + 1,
            station=100 + d,
            callsign=None,
            year=2022,
            month=3,
            day=20,
            hour=15 + d,
            minute=0,
            lat=round(40.0 + 10 * u(1), 2),
            lon=round(-20.0 + 40 * u(2), 2),
            ground_m=round(500 * u(3), 1),
            barometer_m=round(500 * u(3) + 1.5, 1),
            start_offset=1,
        )
        off = spans[-1]["offset"] + 1
        # interleave a media span mid-document (north_rule: interleaved media)
        spans.append(
            _span("media", f"radar composite {d}", off, f"synthetic://img/multi/{d}.png")
        )
        spans += _data_block(off + 1, u)
        docs.append({"doc_id": f"multi-{d}", "spans": spans})
    return docs


def golden_documents(spark: SparkSession) -> DataFrame:
    rows = [sherkin_island_document()] + multi_message_documents()
    return spark.createDataFrame(rows, schema=DOCUMENT_SCHEMA)


# ---------------------------------------------------------------------------
# scaled corpus (N11)
# ---------------------------------------------------------------------------


def synth_documents(
    spark: SparkSession,
    n_docs: int,
    n_stations: int | None = None,
    seed: int = 7,
    partitions: int | None = None,
    hot_doc_share: float = 0.5,
    media_every: int = 3,
    start_id: int = 0,
    multi_subset_every: int | None = None,
) -> DataFrame:
    """Scaled deterministic corpus: ``spark.range(n_docs)`` → ``mapInPandas``.

    * station assignment is skewed: ``hot_doc_share`` of documents land on the
      hot 10% of stations (which are geographically clustered), producing the
      hot cells the salted aggregation (N7) must handle;
    * identification style varies by station kind to exercise the reference's
      WSI precedence chain (``bufr2geojson/__init__.py:651-780``);
    * every ``media_every``-th document interleaves a media span;
    * every ``multi_subset_every``-th document (when set) is a MULTI-SUBSET
      bulletin — 2 or 3 station reports in one document, one header span per
      subset (``numberOfSubsets``/``subsetNumber`` set accordingly) — the
      shape the reference explodes with ``codes_bufr_extract_subset``
      (``bufr2geojson/__init__.py:1224-1232``, R3).
    """
    if n_stations is None:
        n_stations = default_n_stations(n_docs)
    st = _station_arrays(n_stations, seed)
    n_hot = int(st["n_hot"])

    st_lat = st["lat"]
    st_lon = st["lon"]
    st_kind = st["kind"]
    st_block = st["block"]
    st_stnum = st["stnum"]
    st_tsi = st["tsi"]
    st_elev = st["elevation_m"]

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf["id"].to_numpy(dtype=np.uint64)
            n = len(ids)
            if n == 0:
                continue
            u_station = _uni(ids, seed, 1)
            hot = u_station < hot_doc_share
            sidx = np.where(
                hot,
                (_h(ids, seed, 2) % np.uint64(n_hot)).astype(np.int64),
                (_h(ids, seed, 3) % np.uint64(n_stations)).astype(np.int64),
            )
            jlat = np.round((_uni(ids, seed, 4) - 0.5) * 0.6, 5)
            jlon = np.round((_uni(ids, seed, 5) - 0.5) * 0.6, 5)
            day = 1 + (_h(ids, seed, 6) % np.uint64(28)).astype(np.int64)
            hour = (_h(ids, seed, 7) % np.uint64(24)).astype(np.int64)
            minute = 10 * (_h(ids, seed, 8) % np.uint64(6)).astype(np.int64)
            n_el = 4 + (_h(ids, seed, 9) % np.uint64(9)).astype(np.int64)
            cat0 = (_h(ids, seed, 10) % np.uint64(len(_DATA_CATALOG))).astype(np.int64)
            has_media = (ids % np.uint64(media_every)) == 0
            vals = np.stack(
                [_uni(ids, seed, 100 + j) for j in range(12)], axis=1
            )

            n_subsets = np.ones(n, dtype=np.int64)
            if multi_subset_every:
                is_multi = (ids % np.uint64(multi_subset_every)) == np.uint64(
                    multi_subset_every - 1
                )
                n_subsets = np.where(
                    is_multi,
                    2 + (_h(ids, seed, 20) % np.uint64(2)).astype(np.int64),
                    1,
                )

            out_ids = []
            out_spans = []
            for i in range(n):
                S = int(n_subsets[i])
                spans = []
                off = 0
                for k in range(S):
                    # subset k varies station/time deterministically so each
                    # subset is a distinct station report in the same doc
                    s = int((sidx[i] + 13 * k) % n_stations)
                    kind = int(st_kind[s])
                    block = int(st_block[s]) if kind <= 6 else None
                    stnum = int(st_stnum[s]) if kind <= 6 else None
                    callsign = str(st_tsi[s]) if 7 <= kind <= 8 else None
                    k_lat = float(np.clip(
                        np.round(st_lat[s] + jlat[i], 5), -89.9, 89.9))
                    k_lon = float(np.round(
                        (st_lon[s] + jlon[i] + 180.0) % 360.0 - 180.0, 5))
                    k_hour = int((hour[i] + k) % 24)
                    spans.append(
                        _span(
                            "header",
                            _header_json(
                                year=2022,
                                month=3,
                                day=int(day[i]),
                                hour=k_hour,
                                minute=int(minute[i]),
                                sequence="307080",
                                number_of_subsets=S,
                                subset_number=k + 1,
                            ),
                            off,
                        )
                    )
                    spans += _qualifier_spans(
                        block=block,
                        station=stnum,
                        callsign=callsign,
                        wigos=(0, 20008, 0, str(st_tsi[s])) if kind == 9 else None,
                        year=2022,
                        month=3,
                        day=int(day[i]),
                        hour=k_hour,
                        minute=int(minute[i]),
                        lat=k_lat,
                        lon=k_lon,
                        ground_m=float(st_elev[s]),
                        barometer_m=float(st_elev[s]) + 1.5,
                        start_offset=off + 1,
                    )
                    off = spans[-1]["offset"] + 1
                    if has_media[i] and k == 0:
                        spans.append(
                            _span(
                                "media",
                                "station webcam frame",
                                off,
                                f"synthetic://img/{int(ids[i])}.png",
                            )
                        )
                        off += 1
                    for j in range(int(n_el[i])):
                        f, key, units, scale, width, lo, hi = _DATA_CATALOG[
                            (int(cat0[i]) + j + k) % len(_DATA_CATALOG)
                        ]
                        val = round(
                            lo + (hi - lo) * float(vals[i, (j + k) % 12]), 2
                        )
                        spans.append(
                            _span("element",
                                  element_text(f, key, val, units, scale, 0,
                                               width), off)
                        )
                        off += 1
                out_ids.append(f"doc-{int(ids[i]):010d}")
                out_spans.append(spans)
            yield pd.DataFrame({"doc_id": out_ids, "spans": out_spans})

    # start_id offsets the id space (disjoint corpora for append/stream tests)
    rng = spark.range(start_id, start_id + n_docs)
    if partitions:
        rng = rng.repartition(partitions)
    return rng.mapInPandas(gen, schema=DOCUMENT_SCHEMA)
