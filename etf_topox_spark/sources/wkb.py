"""WKB (Well-Known Binary) polygon ingestion — the missing input contract a
real geospatial user hits first (VERDICT r3 "What's missing" #6): WKB
parquet is the common interchange (PostGIS, GeoPandas/GeoParquet, Sedona),
and until now only GML text and the synthetic mosaics could feed the
topology pipeline (SURVEY.md §1.2 features schema ``geom_wkb:binary``).

``wkb_to_rings`` turns a DataFrame of WKB polygon blobs into the canonical
rings frame (same shape as sources/mosaic.RING_SCHEMA / sources/gml) and
``rings_to_wkb`` is its exact inverse for single-exterior features —
doubles pass through bit-for-bit in both directions (WKB stores raw IEEE
754, no text formatting involved).

Dialect coverage (parser):
- both byte orders (the order byte is honored per geometry AND per
  contained polygon of a MultiPolygon — mixed-endian blobs are legal WKB);
- Polygon (3) and MultiPolygon (6), ISO variants Z/M/ZM (1000/2000/3000
  offsets) and PostGIS EWKB flags (0x80000000 Z, 0x40000000 M,
  0x20000000 SRID — the 4-byte SRID is skipped): z/m ordinates are
  projected away, matching the GML parser's srsDimension=3 handling —
  TopoX validates 2-D surface topology;
- ring_idx convention matches gml_to_rings: exteriors 0..n_ext-1 (one per
  contained polygon, document order), interiors continue after.

Execution shape: the parse is a map-only ``mapInPandas`` Arrow kernel —
no shuffle, scan-side, the blob never crosses an exchange (at 10^12
features the parse cost rides the scan like any projection). The
serializer needs rings co-located per feature, so it is one
``applyInPandas`` exchange on feature_id — an export-path cost.

Spark 4.1 ships ``st_geomfromwkb``/GEOMETRY as storage-only sugar
(SURVEY.md §1.2); where a catalog stores GEOMETRY, ``st_asbinary`` yields
exactly the bytes this module consumes, so the swap point stays this one
file.
"""

from __future__ import annotations

import struct
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

RING_SCHEMA = (
    "feature_id long, theme string, ring_idx int, is_exterior boolean, "
    "xs array<double>, ys array<double>"
)
WKB_SCHEMA = "feature_id long, theme string, geom_wkb binary"

_EWKB_Z = 0x80000000
_EWKB_M = 0x40000000
_EWKB_SRID = 0x20000000


def _geom_dims(type_code: int) -> tuple[int, int]:
    """(base_type, n_ordinates) from an ISO/EWKB type word (flags stripped)."""
    flags_z = bool(type_code & _EWKB_Z)
    flags_m = bool(type_code & _EWKB_M)
    code = type_code & 0x0FFFFFFF & ~_EWKB_SRID
    base = code % 1000
    iso = code // 1000  # 0=2D, 1=Z, 2=M, 3=ZM
    ndim = 2 + (1 if (iso in (1, 3) or flags_z) else 0) + (
        1 if (iso in (2, 3) or flags_m) else 0
    )
    return base, ndim


def _parse_rings(buf: bytes) -> list[tuple[bool, np.ndarray, np.ndarray]]:
    """Parse one WKB Polygon/MultiPolygon blob → [(is_exterior, xs, ys)]."""
    out_ext: list[tuple[np.ndarray, np.ndarray]] = []
    out_int: list[tuple[np.ndarray, np.ndarray]] = []

    def parse_polygon(off: int) -> int:
        bo = "<" if buf[off] == 1 else ">"
        type_word = struct.unpack_from(bo + "I", buf, off + 1)[0]
        base, ndim = _geom_dims(type_word)
        if base != 3:
            raise ValueError(f"expected Polygon (3) at offset {off}, got {base}")
        pos = off + 5
        if type_word & _EWKB_SRID:
            pos += 4
        (n_rings,) = struct.unpack_from(bo + "I", buf, pos)
        pos += 4
        for r in range(n_rings):
            (n_pts,) = struct.unpack_from(bo + "I", buf, pos)
            pos += 4
            coords = np.frombuffer(
                buf, dtype=np.dtype(bo + "f8"), count=n_pts * ndim, offset=pos
            ).reshape(n_pts, ndim)
            pos += n_pts * ndim * 8
            xs = np.ascontiguousarray(coords[:, 0], dtype=np.float64)
            ys = np.ascontiguousarray(coords[:, 1], dtype=np.float64)
            (out_ext if r == 0 else out_int).append((xs, ys))
        return pos

    bo = "<" if buf[0] == 1 else ">"
    type_word = struct.unpack_from(bo + "I", buf, 1)[0]
    base, _ = _geom_dims(type_word)
    pos = 5
    if type_word & _EWKB_SRID:
        pos += 4
    if base == 3:
        parse_polygon(0)
    elif base == 6:
        (n_polys,) = struct.unpack_from(bo + "I", buf, pos)
        pos += 4
        for _ in range(n_polys):
            pos = parse_polygon(pos)
    else:
        raise ValueError(f"unsupported WKB geometry type {base} (want 3 or 6)")
    return [(True, xs, ys) for xs, ys in out_ext] + [
        (False, xs, ys) for xs, ys in out_int
    ]


def wkb_to_rings(wkb_df: DataFrame) -> DataFrame:
    """(feature_id, theme, geom_wkb) → canonical rings frame. Map-only."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            fid_out: list[int] = []
            theme_out: list[str] = []
            ridx: list[int] = []
            isext: list[bool] = []
            xs_out: list[np.ndarray] = []
            ys_out: list[np.ndarray] = []
            for fid, theme, blob in zip(
                pdf["feature_id"], pdf["theme"], pdf["geom_wkb"]
            ):
                for i, (ext, xs, ys) in enumerate(_parse_rings(bytes(blob))):
                    fid_out.append(fid)
                    theme_out.append(theme)
                    ridx.append(i)
                    isext.append(ext)
                    xs_out.append(xs)
                    ys_out.append(ys)
            yield pd.DataFrame(
                {
                    "feature_id": pd.Series(fid_out, dtype="int64"),
                    "theme": pd.Series(theme_out, dtype="object"),
                    "ring_idx": pd.Series(ridx, dtype="int32"),
                    "is_exterior": pd.Series(isext, dtype="bool"),
                    "xs": xs_out,
                    "ys": ys_out,
                }
            )

    return wkb_df.select("feature_id", "theme", "geom_wkb").mapInPandas(
        kernel, RING_SCHEMA
    )


def _ring_bytes(xs: np.ndarray, ys: np.ndarray) -> bytes:
    pts = np.empty((len(xs), 2), dtype="<f8")
    pts[:, 0] = xs
    pts[:, 1] = ys
    return struct.pack("<I", len(xs)) + pts.tobytes()


def rings_to_wkb(rings: DataFrame) -> DataFrame:
    """Canonical rings frame → (feature_id, theme, geom_wkb), little-endian.

    One exterior → Polygon(3) carrying all interior rings; multiple
    exteriors with no interiors → MultiPolygon(6). Multiple exteriors PLUS
    interiors is rejected: the flat rings frame does not record which hole
    belongs to which shell (same limitation as the GML serializer), and
    guessing would corrupt topology silently.
    """

    def build(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("ring_idx")
        ext = pdf[pdf["is_exterior"]]
        intr = pdf[~pdf["is_exterior"]]
        if len(ext) == 0:
            raise ValueError(
                f"feature {pdf['feature_id'].iat[0]} has no exterior ring"
            )
        if len(ext) == 1:
            body = struct.pack("<BII", 1, 3, 1 + len(intr))
            parts = [body, _ring_bytes(ext["xs"].iat[0], ext["ys"].iat[0])]
            for _, row in intr.iterrows():
                parts.append(_ring_bytes(row["xs"], row["ys"]))
            blob = b"".join(parts)
        elif len(intr) == 0:
            parts = [struct.pack("<BII", 1, 6, len(ext))]
            for _, row in ext.iterrows():
                parts.append(
                    struct.pack("<BII", 1, 3, 1)
                    + _ring_bytes(row["xs"], row["ys"])
                )
            blob = b"".join(parts)
        else:
            raise ValueError(
                f"feature {pdf['feature_id'].iat[0]}: {len(ext)} exteriors + "
                f"{len(intr)} interiors — hole ownership is not representable "
                "in the flat rings frame; split the feature upstream"
            )
        return pd.DataFrame(
            {
                "feature_id": [pdf["feature_id"].iat[0]],
                "theme": [pdf["theme"].iat[0]],
                "geom_wkb": [blob],
            }
        )

    return rings.groupBy("feature_id", "theme").applyInPandas(build, WKB_SCHEMA)
