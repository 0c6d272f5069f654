#!/usr/bin/env python3
"""Generate the committed SpatiaLite fixture (driver-side tooling; the
Scala library only READS SpatiaLite). A REAL SQLite database produced by
the sqlite3 library — so the Scala SQLite kernel is exercised against a
genuine third-party writer, not a self-roundtrip — carrying SpatiaLite's
metadata dialect (geometry_columns + spatial_ref_sys), hand-packed
SpatiaLite serialized-geometry blobs (the public format: 0x00 start,
endianness byte, SRID, MBR, 0x7C, class-typed body with 0x69 entity
markers, 0xFE end), and a populated idx_<t>_<g> R*-tree.

Deterministic closed-form rows so the DuckDB oracle regenerates them
from range(). Small page size forces a multi-level feature b-tree.
"""
import os
import sqlite3
import struct

OUT = os.path.join(os.path.dirname(__file__), "..", "fixtures", "supplier_pts.sqlite")
os.makedirs(os.path.dirname(OUT), exist_ok=True)
if os.path.exists(OUT):
    os.remove(OUT)

con = sqlite3.connect(OUT)
con.execute("PRAGMA page_size=1024")
con.execute("PRAGMA journal_mode=DELETE")
cur = con.cursor()

# SpatiaLite metadata dialect (v4 layout for geometry_columns)
cur.execute("""CREATE TABLE spatial_ref_sys (
  srid INTEGER NOT NULL PRIMARY KEY, auth_name TEXT NOT NULL,
  auth_srid INTEGER NOT NULL, ref_sys_name TEXT,
  proj4text TEXT NOT NULL, srtext TEXT)""")
cur.execute("INSERT INTO spatial_ref_sys VALUES (4326, 'epsg', 4326, 'WGS 84', '+proj=longlat +datum=WGS84 +no_defs', 'GEOGCS[...]')")
cur.execute("""CREATE TABLE geometry_columns (
  f_table_name TEXT NOT NULL, f_geometry_column TEXT NOT NULL,
  geometry_type INTEGER NOT NULL, coord_dimension INTEGER NOT NULL,
  srid INTEGER NOT NULL, spatial_index_enabled INTEGER NOT NULL)""")
cur.execute("INSERT INTO geometry_columns VALUES ('supplier_pts', 'geom', 1, 2, 4326, 1)")
cur.execute("INSERT INTO geometry_columns VALUES ('shapes', 'geom', 0, 2, 4326, 0)")


def sl_blob(cls, body, mbr, srid=4326):
    return (b"\x00\x01" + struct.pack("<i", srid) + struct.pack("<4d", *mbr)
            + b"\x7c" + struct.pack("<i", cls) + body + b"\xfe")


def body_point(x, y):
    return struct.pack("<2d", x, y)


def body_line(pts):
    return struct.pack("<i", len(pts)) + b"".join(struct.pack("<2d", *p) for p in pts)


def body_poly(rings):
    out = struct.pack("<i", len(rings))
    for r in rings:
        out += struct.pack("<i", len(r)) + b"".join(struct.pack("<2d", *p) for p in r)
    return out


def entity(cls, body):
    return b"\x69" + struct.pack("<i", cls) + body


def mbr_of(pts):
    xs = [p[0] for p in pts]; ys = [p[1] for p in pts]
    return (min(xs), min(ys), max(xs), max(ys))


# feature table: 500 points, closed-form coordinates, a NULL geometry
# every 50th row, a NULL note every 7th
cur.execute("""CREATE TABLE supplier_pts (
  pk INTEGER PRIMARY KEY, s_suppkey INTEGER, s_name TEXT,
  weight DOUBLE, note TEXT, geom BLOB)""")
for i in range(500):
    x = i * 3.25 - 100.0
    y = (i % 100) * 7.5
    note = None if i % 7 == 0 else f"note_{i % 13}"
    geom = None if i % 50 == 49 else sl_blob(1, body_point(x, y), (x, y, x, y))
    cur.execute("INSERT INTO supplier_pts VALUES (?,?,?,?,?,?)",
                (i + 1, i, f"sup_{i}", i * 0.5 - 25.0, note, geom))

# one of each geometry class, closed forms for the codec spec
sq = [(0.0, 0.0), (4.0, 0.0), (4.0, 4.0), (0.0, 4.0), (0.0, 0.0)]
hole = [(1.0, 1.0), (2.0, 1.0), (2.0, 2.0), (1.0, 2.0), (1.0, 1.0)]
shapes = [
    (1, "point", sl_blob(1, body_point(3.5, -2.25), (3.5, -2.25, 3.5, -2.25))),
    (2, "line", sl_blob(2, body_line([(0, 0), (3, 4), (6, 4)]), (0, 0, 6, 4))),
    (3, "poly", sl_blob(3, body_poly([sq, hole]), (0, 0, 4, 4))),
    (4, "mpoint", sl_blob(4, struct.pack("<i", 2)
        + entity(1, body_point(1, 1)) + entity(1, body_point(2, 3)),
        (1, 1, 2, 3))),
    (5, "mline", sl_blob(5, struct.pack("<i", 2)
        + entity(2, body_line([(0, 10), (2, 12)]))
        + entity(2, body_line([(5, 15), (9, 19), (9, 10)])),
        (0, 10, 9, 19))),
    (6, "mpoly", sl_blob(6, struct.pack("<i", 2)
        + entity(3, body_poly([[(20, 20), (26, 20), (26, 26), (20, 26), (20, 20)]]))
        + entity(3, body_poly([[(40, 0), (44, 0), (44, 4), (40, 0)]])),
        (20, 0, 44, 26))),
    (7, "gc", sl_blob(7, struct.pack("<i", 2)
        + entity(1, body_point(7, 8))
        + entity(2, body_line([(0, 0), (1, 1)])),
        (0, 0, 7, 8))),
    # Z/M/ZM bands: +1000 Z, +2000 M, +3000 ZM — same layouts with extra
    # per-point doubles; the reader keeps z on points/lines, drops m
    (8, "zpoint", sl_blob(1001, struct.pack("<3d", 1.5, 2.5, 30.25),
        (1.5, 2.5, 1.5, 2.5))),
    (9, "zline", sl_blob(1002, struct.pack("<i", 2)
        + struct.pack("<3d", 0, 0, 1) + struct.pack("<3d", 3, 4, 2.5),
        (0, 0, 3, 4))),
    (10, "mpoint_m", sl_blob(2001, struct.pack("<3d", 5, 6, 99.0),
        (5, 6, 5, 6))),
    (11, "zmline", sl_blob(3002, struct.pack("<i", 2)
        + struct.pack("<4d", 0, 10, 7, 1) + struct.pack("<4d", 2, 12, 8, 2),
        (0, 10, 2, 12))),
]
cur.execute("CREATE TABLE shapes (pk INTEGER PRIMARY KEY, kind TEXT, geom BLOB)")
for pk, kind, blob in shapes:
    cur.execute("INSERT INTO shapes VALUES (?,?,?)", (pk, kind, blob))

# randomized codec cross-check: 120 random geometries stored BOTH as
# SpatiaLite blobs and as WKT text — the Scala spec decodes the blob and
# compares against st_geomfromtext(wkt), so the codec is validated
# against an independent textual encoding of the same coordinates,
# not a self-roundtrip. Deterministic seed.
import random

rnd = random.Random(20260816)


def rc():
    return round(rnd.uniform(-1000, 1000), 6)


def wkt_pts(pts):
    return ", ".join(f"{x} {y}" for x, y in pts)


cur.execute("INSERT INTO geometry_columns VALUES ('fuzz', 'geom', 0, 2, 4326, 0)")
cur.execute("CREATE TABLE fuzz (pk INTEGER PRIMARY KEY, wkt TEXT, geom BLOB)")
pk = 0
for i in range(120):
    kind = i % 4
    if kind == 0:
        p = (rc(), rc())
        wkt = f"POINT ({p[0]} {p[1]})"
        blob = sl_blob(1, body_point(*p), (p[0], p[1], p[0], p[1]))
    elif kind == 1:
        pts = [(rc(), rc()) for _ in range(2 + rnd.randrange(6))]
        wkt = f"LINESTRING ({wkt_pts(pts)})"
        blob = sl_blob(2, body_line(pts), mbr_of(pts))
    elif kind == 2:
        cx, cy, r = rc(), rc(), 1 + rnd.randrange(50)
        n = 3 + rnd.randrange(8)
        import math
        ring = [(round(cx + r * math.cos(2 * math.pi * k / n), 6),
                 round(cy + r * math.sin(2 * math.pi * k / n), 6))
                for k in range(n)]
        ring.append(ring[0])
        wkt = f"POLYGON (({wkt_pts(ring)}))"
        blob = sl_blob(3, body_poly([ring]), mbr_of(ring))
    else:
        pts = [(rc(), rc()) for _ in range(1 + rnd.randrange(4))]
        wkt = "MULTIPOINT (" + ", ".join(f"({x} {y})" for x, y in pts) + ")"
        blob = sl_blob(4, struct.pack("<i", len(pts))
                       + b"".join(entity(1, body_point(*p)) for p in pts),
                       mbr_of(pts))
    pk += 1
    cur.execute("INSERT INTO fuzz VALUES (?,?,?)", (pk, wkt, blob))

# SpatiaLite spatial index: idx_<table>_<geom> R*-tree + shadow tables,
# exactly as spatialite's CreateSpatialIndex() registers it
cur.execute("""CREATE VIRTUAL TABLE idx_supplier_pts_geom USING rtree(
  pkid, xmin, xmax, ymin, ymax)""")
cur.execute("""INSERT INTO idx_supplier_pts_geom
  SELECT pk, s_suppkey * 3.25 - 100.0, s_suppkey * 3.25 - 100.0,
         (s_suppkey % 100) * 7.5, (s_suppkey % 100) * 7.5
  FROM supplier_pts WHERE geom IS NOT NULL""")
con.commit()
con.close()

with open(OUT, "rb") as f:
    data = f.read()
print("bytes", len(data), "pages", len(data) // 1024)
con = sqlite3.connect(OUT)
for row in con.execute("SELECT name, rootpage FROM sqlite_master WHERE type='table' ORDER BY name"):
    print(row)
print(con.execute("SELECT count(*), count(geom) FROM supplier_pts").fetchone())
