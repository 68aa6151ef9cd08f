"""Hierarchical spatial cell indexes (N1/N2): S2-style and H3-style, numpy.

Neither ``h3`` nor ``s2sphere`` is installed in this environment (verified
2026-08-16), and the north_star mandates batched, vectorized cell encoding —
so both indexes are implemented from scratch over numpy arrays from their
*published* schemes, exposed as Arrow-batched pandas UDFs. They are
deliberately NOT bit-compatible with the reference libraries; the bit layouts
below are the contract.

S2-style (``s2_encode``) — cube-face + quadratic s/t + Hilbert curve, from the
public S2 geometry scheme (faces, u/v projection, quadratic s-t transform,
Hilbert position, trailing-sentinel-bit level encoding):

    bit layout (int64, always positive):
        [ 6 unused=0 | 3 bits face (0-5) | 56 bits hilbert pos | sentinel ]
    leaf (level 28):  id = face<<57 | pos<<1 | 1
    level L id:       low bits cleared, single sentinel 1 at bit 2*(28-L)
    parent(id, L) is pure bit math → usable as a JVM-side Column expression
    (no UDF) for multi-resolution rollups (N5).

MAX_LEVEL is 28 (not 30) so every id fits a *positive* signed int64 — Spark
LongType ordering then equals unsigned Hilbert ordering, which
``repartitionByRange`` (N8) relies on for spatial clustering.

H3-style (``hex_encode``) — an aperture-4 hexagonal hierarchy on the
plate-carrée plane (pointy-top axial coordinates, cube rounding). True H3's
icosahedral projection is out of scope; parent containment follows H3's own
semantics (child *center* lies in the parent cell):

    bit layout: [ bit 62 = 1 (hex marker) | 4 bits res (0-15) at 58
                  | 29 bits q+2^28 | 29 bits r+2^28 ]

All encoders: vectorized numpy in, int64 out; no per-row Python.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import LongType

MAX_LEVEL = 28
_FACE_SHIFT = 57
_NBITS = MAX_LEVEL  # hilbert order

# ---------------------------------------------------------------------------
# S2-style: lat/lon -> face/u/v -> s/t -> i/j -> hilbert -> id
# ---------------------------------------------------------------------------


def _latlon_to_xyz(lat_deg, lon_deg):
    lat = np.radians(np.asarray(lat_deg, dtype=np.float64))
    lon = np.radians(np.asarray(lon_deg, dtype=np.float64))
    clat = np.cos(lat)
    return clat * np.cos(lon), clat * np.sin(lon), np.sin(lat)


def _xyz_to_face_uv(x, y, z):
    ax, ay, az = np.abs(x), np.abs(y), np.abs(z)
    face = np.where(
        (ax >= ay) & (ax >= az),
        np.where(x >= 0, 0, 3),
        np.where(ay >= az, np.where(y >= 0, 1, 4), np.where(z >= 0, 2, 5)),
    ).astype(np.int64)
    u = np.empty_like(x)
    v = np.empty_like(x)
    for f, (ufn, vfn) in enumerate(
        [
            (lambda x, y, z: y / x, lambda x, y, z: z / x),      # +x
            (lambda x, y, z: -x / y, lambda x, y, z: z / y),     # +y
            (lambda x, y, z: -x / z, lambda x, y, z: -y / z),    # +z
            (lambda x, y, z: z / x, lambda x, y, z: y / x),      # -x
            (lambda x, y, z: z / y, lambda x, y, z: -x / y),     # -y
            (lambda x, y, z: -y / z, lambda x, y, z: -x / z),    # -z
        ]
    ):
        m = face == f
        if m.any():
            u[m] = ufn(x[m], y[m], z[m])
            v[m] = vfn(x[m], y[m], z[m])
    return face, u, v


def _face_uv_to_xyz(face, u, v):
    x = np.empty_like(u)
    y = np.empty_like(u)
    z = np.empty_like(u)
    specs = [
        (lambda u, v: (np.ones_like(u), u, v)),
        (lambda u, v: (-u, np.ones_like(u), v)),
        (lambda u, v: (-u, -v, np.ones_like(u))),
        (lambda u, v: (-np.ones_like(u), -v, -u)),
        (lambda u, v: (v, -np.ones_like(u), -u)),
        (lambda u, v: (v, u, -np.ones_like(u))),
    ]
    for f, fn in enumerate(specs):
        m = face == f
        if m.any():
            xf, yf, zf = fn(u[m], v[m])
            x[m], y[m], z[m] = xf, yf, zf
    return x, y, z


def _uv_to_st(u):
    # quadratic transform (public S2 scheme); maxima guard against the
    # unselected np.where branch going negative under sqrt
    return np.where(u >= 0, 0.5 * np.sqrt(np.maximum(1.0 + 3.0 * u, 0.0)),
                    1.0 - 0.5 * np.sqrt(np.maximum(1.0 - 3.0 * u, 0.0)))


def _st_to_uv(s):
    return np.where(s >= 0.5, (4.0 * s * s - 1.0) / 3.0,
                    (1.0 - 4.0 * (1.0 - s) * (1.0 - s)) / 3.0)


def _hilbert_xy2d(i, j, order=_NBITS):
    """Vectorized Hilbert curve position (public xy2d algorithm)."""
    i = i.astype(np.int64).copy()
    j = j.astype(np.int64).copy()
    d = np.zeros_like(i, dtype=np.int64)
    s = np.int64(1) << (order - 1)
    while s > 0:
        rx = ((i & s) > 0).astype(np.int64)
        ry = ((j & s) > 0).astype(np.int64)
        d += s * s * ((3 * rx) ^ ry)
        # rotate quadrant
        flip = (ry == 0) & (rx == 1)
        i_f = s - 1 - i
        j_f = s - 1 - j
        i = np.where(flip, i_f, i)
        j = np.where(flip, j_f, j)
        swap = ry == 0
        i, j = np.where(swap, j, i), np.where(swap, i, j)
        s >>= 1
    return d


def _hilbert_d2xy(d, order=_NBITS):
    d = d.astype(np.int64).copy()
    i = np.zeros_like(d)
    j = np.zeros_like(d)
    t = d
    s = np.int64(1)
    n = np.int64(1) << order
    while s < n:
        rx = 1 & (t // 2)
        ry = 1 & (t ^ rx)
        # rotate
        flip = (ry == 0) & (rx == 1)
        i_f = s - 1 - i
        j_f = s - 1 - j
        i = np.where(flip, i_f, i)
        j = np.where(flip, j_f, j)
        swap = ry == 0
        i, j = np.where(swap, j, i), np.where(swap, i, j)
        i = i + s * rx
        j = j + s * ry
        t = t // 4
        s <<= 1
    return i, j


def s2_encode(lat, lon, level: int = MAX_LEVEL) -> np.ndarray:
    """(lat, lon) arrays -> S2-style cell ids at ``level`` (int64 ≥ 0)."""
    if not 0 <= level <= MAX_LEVEL:
        raise ValueError(f"level must be 0..{MAX_LEVEL}")
    x, y, z = _latlon_to_xyz(lat, lon)
    face, u, v = _xyz_to_face_uv(x, y, z)
    n = np.int64(1) << _NBITS
    i = np.clip((_uv_to_st(u) * n).astype(np.int64), 0, n - 1)
    j = np.clip((_uv_to_st(v) * n).astype(np.int64), 0, n - 1)
    pos = _hilbert_xy2d(i, j)
    leaf = (face << np.int64(_FACE_SHIFT)) | (pos << np.int64(1)) | np.int64(1)
    if level == MAX_LEVEL:
        return leaf
    lsb = np.int64(1) << np.int64(2 * (MAX_LEVEL - level))
    return (leaf & ~(2 * lsb - 1)) | lsb


def s2_level(cell: np.ndarray) -> np.ndarray:
    """Level from the sentinel bit position."""
    cell = np.asarray(cell, dtype=np.int64)
    lsb = cell & -cell
    # log2 of lsb via bit_length-ish trick
    shift = np.zeros_like(cell)
    v = lsb.copy()
    for b in (32, 16, 8, 4, 2, 1):
        m = v >= (np.int64(1) << b)
        shift = np.where(m, shift + b, shift)
        v = np.where(m, v >> b, v)
    return MAX_LEVEL - shift // 2


def s2_parent(cell: np.ndarray, level: int) -> np.ndarray:
    """Ancestor at ``level`` — pure bit math (also see s2_parent_col)."""
    cell = np.asarray(cell, dtype=np.int64)
    lsb = np.int64(1) << np.int64(2 * (MAX_LEVEL - level))
    return (cell & ~(2 * lsb - 1)) | lsb


def s2_center(cell: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Cell id -> (lat, lon) of the cell center."""
    cell = np.asarray(cell, dtype=np.int64)
    level = s2_level(cell)
    face = cell >> np.int64(_FACE_SHIFT)
    pos = (cell & ((np.int64(1) << _FACE_SHIFT) - 1)) >> np.int64(1)
    # center leaf position: keep the level prefix, descend middle
    # (pos already has the sentinel stripped; low bits are zero)
    half = np.where(level < MAX_LEVEL,
                    np.int64(1) << np.maximum(2 * (MAX_LEVEL - level) - 1, 0),
                    np.int64(0))
    pos_c = pos | half
    i, j = _hilbert_d2xy(pos_c)
    n = float(np.int64(1) << _NBITS)
    s = (i.astype(np.float64) + 0.5) / n
    t = (j.astype(np.float64) + 0.5) / n
    u = _st_to_uv(s)
    v = _st_to_uv(t)
    x, y, z = _face_uv_to_xyz(face, u, v)
    lat = np.degrees(np.arctan2(z, np.hypot(x, y)))
    lon = np.degrees(np.arctan2(y, x))
    return lat, lon


def s2_parent_col(cell: Column, level: int) -> Column:
    """JVM-side (no UDF) ancestor expression — keeps rollups in
    whole-stage codegen (SURVEY.md §2.2 N5)."""
    lsb = 1 << (2 * (MAX_LEVEL - level))
    mask = ~(2 * lsb - 1) & ((1 << 63) - 1)
    return (cell.bitwiseAND(F.lit(mask))).bitwiseOR(F.lit(lsb))


def cell_prefix_col(cell: Column, bits: int = 12) -> Column:
    """High-order prefix (face + leading Hilbert bits) as a small int —
    the explicit range-partitioning key of the north rule (N8)."""
    return F.shiftright(cell, 60 - bits).cast("int").alias("cell_prefix")


# ---------------------------------------------------------------------------
# H3-style hexagonal hierarchy
# ---------------------------------------------------------------------------

HEX_MAX_RES = 15
_HEX_SIZE0 = 16.0          # res-0 hex size (degrees, center-to-vertex)
_HEX_OFF = np.int64(1) << 28
_SQRT3 = np.sqrt(3.0)


def _hex_size(res: int) -> float:
    return _HEX_SIZE0 / (2.0 ** res)   # aperture 4: edge halves per res


def _axial_round(qf, rf):
    """Cube rounding of fractional axial coords (public hex-grid algorithm)."""
    xf = qf
    zf = rf
    yf = -xf - zf
    rx = np.round(xf)
    ry = np.round(yf)
    rz = np.round(zf)
    dx = np.abs(rx - xf)
    dy = np.abs(ry - yf)
    dz = np.abs(rz - zf)
    fix_x = (dx > dy) & (dx > dz)
    fix_z = ~fix_x & (dz > dy)
    rx = np.where(fix_x, -ry - rz, rx)
    rz = np.where(fix_z, -rx - ry, rz)
    return rx.astype(np.int64), rz.astype(np.int64)


def hex_encode(lat, lon, res: int = 7) -> np.ndarray:
    """(lat, lon) arrays -> H3-style hex cell ids at ``res`` (int64 > 0)."""
    if not 0 <= res <= HEX_MAX_RES:
        raise ValueError(f"res must be 0..{HEX_MAX_RES}")
    x = np.asarray(lon, dtype=np.float64)
    y = np.asarray(lat, dtype=np.float64)
    size = _hex_size(res)
    qf = (_SQRT3 / 3.0 * x - y / 3.0) / size
    rf = (2.0 / 3.0 * y) / size
    q, r = _axial_round(qf, rf)
    return (
        (np.int64(1) << 62)
        | (np.int64(res) << 58)
        | ((q + _HEX_OFF) << 29)
        | (r + _HEX_OFF)
    )


def hex_res(cell: np.ndarray) -> np.ndarray:
    return (np.asarray(cell, dtype=np.int64) >> 58) & np.int64(0xF)


def hex_center(cell: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    cell = np.asarray(cell, dtype=np.int64)
    res = hex_res(cell)
    q = ((cell >> 29) & ((np.int64(1) << 29) - 1)) - _HEX_OFF
    r = (cell & ((np.int64(1) << 29) - 1)) - _HEX_OFF
    size = _HEX_SIZE0 / (2.0 ** res.astype(np.float64))
    x = size * (_SQRT3 * q + _SQRT3 / 2.0 * r)
    y = size * 1.5 * r
    return y, x  # lat, lon


def hex_parent(cell: np.ndarray, res: int) -> np.ndarray:
    """Parent = hex at coarser res containing the child *center*
    (H3 parent semantics)."""
    lat, lon = hex_center(cell)
    return hex_encode(lat, lon, res)


def hex_parent_udf(res: int):
    """Arrow-batched hex parent (unlike the S2 parent, hex ancestry is not
    pure bit math — it re-encodes the child center at the coarser res, per
    H3's own parent semantics)."""

    @pandas_udf(LongType())
    def _par(cell: pd.Series) -> pd.Series:
        return pd.Series(hex_parent(cell.to_numpy(dtype=np.int64), res))

    return _par


# ---------------------------------------------------------------------------
# Spark surface: Arrow-batched pandas UDF factories
# ---------------------------------------------------------------------------


def s2_encode_udf(level: int = MAX_LEVEL):
    @pandas_udf(LongType())
    def _enc(lat: pd.Series, lon: pd.Series) -> pd.Series:
        return pd.Series(s2_encode(lat.to_numpy(), lon.to_numpy(), level))

    return _enc


def hex_encode_udf(res: int = 7):
    @pandas_udf(LongType())
    def _enc(lat: pd.Series, lon: pd.Series) -> pd.Series:
        return pd.Series(hex_encode(lat.to_numpy(), lon.to_numpy(), res))

    return _enc


def with_cells(
    df,
    lat_col: str = "lat",
    lon_col: str = "lon",
    s2_level_: int = 14,
    hex_res_: int = 7,
    prefix_bits: int = 12,
):
    """Stage T: append cell_s2 / cell_h3 / cell_prefix. Narrow (no shuffle);
    stays one stage with decode under whole-stage pipelining."""
    s2u = s2_encode_udf(s2_level_)
    hxu = hex_encode_udf(hex_res_)
    out = (
        df.withColumn("cell_s2", s2u(F.col(lat_col), F.col(lon_col)))
        .withColumn("cell_h3", hxu(F.col(lat_col), F.col(lon_col)))
        .withColumn("cell_prefix", cell_prefix_col(F.col("cell_s2"), prefix_bits))
    )
    return out


# ---------------------------------------------------------------------------
# z-order (Morton) interleave for multi-dimension write clustering
# ---------------------------------------------------------------------------

_SPREAD_MASKS = (
    (16, 0x0000FFFF0000FFFF),
    (8, 0x00FF00FF00FF00FF),
    (4, 0x0F0F0F0F0F0F0F0F),
    (2, 0x3333333333333333),
    (1, 0x5555555555555555),
)


def _spread_bits31(col):
    """Spread the low 31 bits of a long so bit i lands at position 2i —
    five shift/mask steps (the classic magic-number Morton spread), pure
    whole-stage-codegen bit math."""
    from pyspark.sql import functions as F

    x = col.bitwiseAND(F.lit(0x7FFFFFFF))
    for shift, mask in _SPREAD_MASKS:
        x = (x.bitwiseOR(F.shiftleft(x, shift))).bitwiseAND(F.lit(mask))
    return x


def zorder_key(col_a, col_b):
    """62-bit Morton key interleaving two 31-bit dimensions (a in even
    bits, b in odd; inputs masked to 31 bits so the key never sets the
    sign bit — a signed-negative key would sort BEFORE small keys and
    destroy the locality the interleave exists for). Rows close in BOTH
    dimensions get nearby keys, so range-partitioning the write by the
    z-key clusters files on cell AND time together — range queries on
    either dimension prune files, the standard lakehouse multi-dimensional
    clustering trick (N8 depth; Hilbert-ordered cell ids already give 1-D
    spatial locality)."""
    from pyspark.sql import functions as F

    return _spread_bits31(col_a).bitwiseOR(
        F.shiftleft(_spread_bits31(col_b), 1)
    )


# ---------------------------------------------------------------------------
# geohash (base32) — interop cell index
# ---------------------------------------------------------------------------

#: standard geohash base32 alphabet (public spec; no i, l, o)
GEOHASH32 = "0123456789bcdefghjkmnpqrstuvwxyz"


def geohash_col(lat, lon, precision: int = 7):
    """Standard geohash of (lat, lon) at ``precision`` chars — pure Column
    bit arithmetic (no UDF): quantize both axes, Morton-interleave with the
    existing 31-bit spreader (lon takes the MSB, per the public spec), then
    base32 the 5-bit groups. Because it is closed-form JVM codegen, the
    encode rides the same narrow projection as the S2/hex encodes.

    ``precision`` ≤ 12 (60 bits). Geohash's defining property — a parent
    cell is a string prefix — holds by construction: truncating the output
    equals encoding at lower precision (tested)."""
    from pyspark.sql import functions as F

    if not 1 <= precision <= 12:
        raise ValueError("geohash precision must be 1..12")
    n = 5 * precision
    lon_bits = (n + 1) // 2
    lat_bits = n // 2
    lon_q = F.least(
        F.floor((lon + 180.0) / 360.0 * (1 << lon_bits)),
        F.lit((1 << lon_bits) - 1),
    ).cast("long")
    lat_q = F.least(
        F.floor((lat + 90.0) / 180.0 * (1 << lat_bits)),
        F.lit((1 << lat_bits) - 1),
    ).cast("long")
    # odd total bits -> the MSB (bit n-1, an even LSB-position) is lon's, so
    # lon spreads to even positions; even total -> lon sits at odd positions
    key = (zorder_key(lon_q, lat_q) if n % 2 == 1
           else zorder_key(lat_q, lon_q))
    alph = F.array(*[F.lit(c) for c in GEOHASH32])
    chars = [
        F.element_at(
            alph,
            (F.shiftrightunsigned(key, n - 5 * (i + 1))
             .bitwiseAND(F.lit(31)) + 1).cast("int"),
        )
        for i in range(precision)
    ]
    return F.concat(*chars)
