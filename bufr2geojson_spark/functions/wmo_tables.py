"""WMO BUFR code / flag / associated-field tables used by the decode stage.

The reference lazily loads these from the ecCodes table directory into
process-global caches (``bufr2geojson/__init__.py:782-841``, caches declared
at ``:61-62``) and loads the associated-field table 0-31-021 from a bundled
JSON resource (``:81-86``, ``resources/031021.json``). ecCodes is not
available here, so we ship the (public, WMO-published) table entries our
corpus exercises as plain dicts. On the cluster these are tiny and are
shipped to executors inside the UDF closure — the Spark analogue of the
reference's process-global cache (a per-executor broadcast, populated once).

Table contents are public WMO BUFR4 code/flag table facts
(https://codes.wmo.int/bufr4/codeflag), not code from the reference.
"""

from __future__ import annotations

# code tables: fxxyyy -> {entry:int -> label}
CODE_TABLES: dict[str, dict[int, str]] = {
    # 0-02-001 TYPE OF STATION
    "002001": {
        0: "AUTOMATIC STATION",
        1: "MANNED STATION",
        2: "HYBRID: BOTH MANNED AND AUTOMATIC",
        3: "MISSING VALUE",
    },
    # 0-20-003 PRESENT WEATHER (subset)
    "020003": {
        0: "CLOUD DEVELOPMENT NOT OBSERVED OR NOT OBSERVABLE",
        1: "CLOUDS GENERALLY DISSOLVING OR BECOMING LESS DEVELOPED",
        2: "STATE OF SKY ON THE WHOLE UNCHANGED",
        3: "CLOUDS GENERALLY FORMING OR DEVELOPING",
        10: "MIST",
        21: "PRECIPITATION",
        25: "SHOWER(S) OF RAIN",
        45: "FOG OR ICE FOG, SKY INVISIBLE",
        60: "RAIN, NOT FREEZING, INTERMITTENT, SLIGHT AT TIME OF OBSERVATION",
        61: "RAIN, NOT FREEZING, CONTINUOUS, SLIGHT AT TIME OF OBSERVATION",
        71: "CONTINUOUS FALL OF SNOWFLAKES, SLIGHT AT TIME OF OBSERVATION",
        80: "RAIN SHOWER(S), SLIGHT",
        95: "THUNDERSTORM, SLIGHT OR MODERATE, WITHOUT HAIL",
    },
    # 0-08-023 FIRST-ORDER STATISTICS
    "008023": {
        2: "Maximum value",
        3: "Minimum value",
        4: "Mean value",
        9: "Best estimate of standard deviation",
        10: "Standard deviation",
        32: "Vectorial mean",
    },
    # 0-02-038 METHOD OF WATER TEMPERATURE MEASUREMENT (subset)
    "002038": {
        0: "SHIP INTAKE",
        1: "BUCKET",
        2: "HULL CONTACT SENSOR",
        3: "REVERSING THERMOMETER",
    },
}

# flag tables: fxxyyy -> {bit_number_from_msb:int -> label}
# (bit numbering follows the reference's decode loop: the value is rendered
#  as a width-wide bitstring and bit k (1-based, MSB first) maps to entry k,
#  bufr2geojson/__init__.py:831-841)
FLAG_TABLES: dict[str, dict[int, str]] = {
    # 0-02-002 TYPE OF INSTRUMENTATION FOR WIND MEASUREMENT (width 4)
    "002002": {
        1: "CERTIFIED INSTRUMENTS",
        2: "ORIGINALLY MEASURED IN KNOTS",
        3: "ORIGINALLY MEASURED IN KM/H",
    },
    # 0-20-021 TYPE OF PRECIPITATION (subset, width 30)
    "020021": {
        1: "RAIN",
        2: "DRIZZLE",
        3: "SNOW",
        4: "HAIL",
        5: "ICE PELLETS",
        6: "GRAUPEL",
    },
    # 0-08-041 DATA SIGNIFICANCE (illustrative flag table, width 8)
    "008041": {
        1: "PARENT SITE",
        2: "OBSERVATION SITE",
        3: "BALLOON MANUFACTURE SITE",
    },
}

# associated-field significance table 0-31-021
# (shape mirrors the reference resource resources/031021.json — int-typed
#  entries decode the associated value through `values`, float-typed append
#  units; bufr2geojson/__init__.py:952-961)
ASSOCIATED_FIELDS: dict[str, dict] = {
    "1": {
        "type": "int",
        "label": "1-bit indicator of quality",
        "values": {"0": "Good", "1": "Suspect or bad"},
    },
    "2": {
        "type": "int",
        "label": "2-bit indicator of quality",
        "values": {
            "0": "Good",
            "1": "Slightly suspect",
            "2": "Highly suspect",
            "3": "Bad",
        },
    },
    "5": {
        "type": "int",
        "label": "8-bit indicator of quality",
        "values": {
            "0": "Data checked and declared good",
            "1": "Data checked and declared suspect",
            "7": "Data unchecked",
            "255": "Missing (QC info not available)",
        },
    },
    "7": {
        "type": "float",
        "label": "Percentage confidence",
        "units": "%",
    },
}

# Affine unit conversions applied by the reference through cfunits
# (PREFERRED_UNITS bufr2geojson/__init__.py:74-77, applied :1037-1044).
# cfunits is unavailable; K->Celsius and Pa->hPa are exact affine maps.
PREFERRED_UNITS: dict[str, tuple[str, float, float]] = {
    # units -> (target_units, multiplier, offset): target = value*m + o
    "K": ("Celsius", 1.0, -273.15),
    "Pa": ("hPa", 0.01, 0.0),
}
