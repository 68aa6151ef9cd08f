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

# ---------------------------------------------------------------------------
# pluggable table providers
# ---------------------------------------------------------------------------


class DictTableProvider:
    """Code/flag tables served from in-memory dicts — the default provider,
    wrapping the curated module-level tables above. Providers are plain
    picklable objects captured in the decode UDF closure: each executor
    materializes the tables once, the Spark analogue of the reference's
    process-global lazy cache (``bufr2geojson/__init__.py:61-62,782-841``).

    Miss semantics match the reference exactly: an uncovered code-table
    entry decodes to ``"Invalid"`` (``:806-808``); an uncovered flag bit is
    silently skipped (``:831-841`` only appends known labels)."""

    def __init__(self, code_tables: dict | None = None,
                 flag_tables: dict | None = None):
        self._code = CODE_TABLES if code_tables is None else code_tables
        self._flag = FLAG_TABLES if flag_tables is None else flag_tables

    def code_entry(self, fxxyyy: str, entry: int) -> str:
        return self._code.get(fxxyyy, {}).get(int(entry), "Invalid")

    def flag_label(self, fxxyyy: str, bit: int) -> str | None:
        return self._flag.get(fxxyyy, {}).get(int(bit))


class CsvTableProvider:
    """Code/flag tables lazily loaded from a CSV directory, mirroring the
    reference's per-master-table-version ecCodes table layout
    (``{root}/{version}/codetables/{fxxyyy}.csv``, loaded on first access and
    cached per process, ``bufr2geojson/__init__.py:782-841``). File format:
    one ``entry,label`` line per table entry (label may contain commas; only
    the first comma splits). Flag tables live in ``flagtables/``.

    On a real cluster, point ``root`` at a distributed-FS copy of the WMO
    tables: the provider pickles into the UDF closure and each executor
    reads each table file at most once."""

    def __init__(self, root: str, master_table_version: int = 14):
        self.root = root
        self.version = master_table_version
        self._code_cache: dict[str, dict[int, str]] = {}
        self._flag_cache: dict[str, dict[int, str]] = {}

    def _load(self, kind: str, fxxyyy: str) -> dict[int, str]:
        import os

        path = os.path.join(self.root, str(self.version), kind,
                            f"{fxxyyy}.csv")
        table: dict[int, str] = {}
        if os.path.exists(path):
            with open(path, encoding="utf-8") as fh:
                for line in fh:
                    line = line.rstrip("\n")
                    if not line or line.startswith("#"):
                        continue
                    entry, _, label = line.partition(",")
                    table[int(entry)] = label
        return table

    def code_entry(self, fxxyyy: str, entry: int) -> str:
        if fxxyyy not in self._code_cache:
            self._code_cache[fxxyyy] = self._load("codetables", fxxyyy)
        return self._code_cache[fxxyyy].get(int(entry), "Invalid")

    def flag_label(self, fxxyyy: str, bit: int) -> str | None:
        if fxxyyy not in self._flag_cache:
            self._flag_cache[fxxyyy] = self._load("flagtables", fxxyyy)
        return self._flag_cache[fxxyyy].get(int(bit))


#: default provider used by the decode stage when none is injected
DEFAULT_TABLE_PROVIDER = DictTableProvider()


# Affine unit conversions applied by the reference through cfunits
# (PREFERRED_UNITS bufr2geojson/__init__.py:74-77, applied :1037-1044).
# cfunits is unavailable; K->Celsius and Pa->hPa are exact affine maps.
PREFERRED_UNITS: dict[str, tuple[str, float, float]] = {
    # units -> (target_units, multiplier, offset): target = value*m + o
    "K": ("Celsius", 1.0, -273.15),
    "Pa": ("hPa", 0.01, 0.0),
}
