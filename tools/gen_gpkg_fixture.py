#!/usr/bin/env python3
"""Generate the committed GeoPackage fixture (driver-side tooling; the Scala
library only READS gpkg). Deterministic closed-form rows so the DuckDB
oracle regenerates them from range() — no literals table needed.

Layout follows the OGC GeoPackage spec (gpkg_spatial_ref_sys, gpkg_contents,
gpkg_geometry_columns, one feature table) with standard GP geometry blobs
(little-endian, envelope indicator 1) wrapping WKB points. A small page size
forces a multi-level table b-tree so the reader's subtree partitioning is
actually exercised.
"""
import os
import sqlite3
import struct

OUT = os.path.join(os.path.dirname(__file__), "..", "fixtures", "supplier_pts.gpkg")
os.makedirs(os.path.dirname(OUT), exist_ok=True)
if os.path.exists(OUT):
    os.remove(OUT)

con = sqlite3.connect(OUT)
con.execute("PRAGMA page_size=1024")
con.execute("PRAGMA journal_mode=DELETE")
cur = con.cursor()
cur.execute("""CREATE TABLE gpkg_spatial_ref_sys (
  srs_name TEXT NOT NULL, srs_id INTEGER NOT NULL PRIMARY KEY,
  organization TEXT NOT NULL, organization_coordsys_id INTEGER NOT NULL,
  definition TEXT NOT NULL, description TEXT)""")
cur.execute("INSERT INTO gpkg_spatial_ref_sys VALUES ('WGS 84', 4326, 'EPSG', 4326, 'GEOGCS[...]', NULL)")
cur.execute("""CREATE TABLE gpkg_contents (
  table_name TEXT NOT NULL PRIMARY KEY, data_type TEXT NOT NULL,
  identifier TEXT UNIQUE, description TEXT DEFAULT '',
  last_change DATETIME NOT NULL DEFAULT (strftime('%Y-%m-%dT%H:%M:%fZ','now')),
  min_x DOUBLE, min_y DOUBLE, max_x DOUBLE, max_y DOUBLE, srs_id INTEGER)""")
cur.execute("""INSERT INTO gpkg_contents
  (table_name, data_type, identifier, last_change, srs_id)
  VALUES ('supplier_pts', 'features', 'supplier_pts', '2024-01-01T00:00:00.000Z', 4326)""")
cur.execute("""CREATE TABLE gpkg_geometry_columns (
  table_name TEXT NOT NULL, column_name TEXT NOT NULL,
  geometry_type_name TEXT NOT NULL, srs_id INTEGER NOT NULL,
  z TINYINT NOT NULL, m TINYINT NOT NULL)""")
cur.execute("INSERT INTO gpkg_geometry_columns VALUES ('supplier_pts', 'geom', 'POINT', 4326, 0, 0)")
cur.execute("""CREATE TABLE supplier_pts (
  fid INTEGER PRIMARY KEY,
  s_suppkey INTEGER,
  s_name TEXT,
  weight DOUBLE,
  note TEXT,
  geom BLOB)""")


def gpb_point(x, y):
    # GP magic, version 0, flags 0x03 (LE byte order, envelope indicator 1 = XY)
    header = b"GP" + bytes([0, 0x03]) + struct.pack("<i", 4326)
    env = struct.pack("<4d", x, x, y, y)
    wkb = struct.pack("<BI2d", 1, 1, x, y)  # LE, POINT, x, y
    return header + env + wkb


for i in range(500):
    x = i * 3.25 - 100.0
    y = (i % 100) * 7.5
    note = None if i % 7 == 0 else f"note_{i % 13}"
    cur.execute("INSERT INTO supplier_pts VALUES (?,?,?,?,?,?)",
                (i + 1, i, f"sup_{i}", i * 0.5 - 25.0, note, gpb_point(x, y)))

# spatial index, exactly as OGR registers it (gpkg_rtree_index extension):
# the SQLite R*-tree virtual table + populated shadow tables. The reader
# consumes the rtree_<t>_<col>_node shadow b-tree directly for bbox pruning.
cur.execute("""CREATE VIRTUAL TABLE rtree_supplier_pts_geom USING rtree(
  id, minx, maxx, miny, maxy)""")
cur.execute("""INSERT INTO rtree_supplier_pts_geom
  SELECT fid, s_suppkey * 3.25 - 100.0, s_suppkey * 3.25 - 100.0,
         (s_suppkey % 100) * 7.5, (s_suppkey % 100) * 7.5
  FROM supplier_pts""")
cur.execute("""CREATE TABLE IF NOT EXISTS gpkg_extensions (
  table_name TEXT, column_name TEXT, extension_name TEXT NOT NULL,
  definition TEXT NOT NULL, scope TEXT NOT NULL)""")
cur.execute("""INSERT INTO gpkg_extensions VALUES
  ('supplier_pts', 'geom', 'gpkg_rtree_index',
   'http://www.geopackage.org/spec120/#extension_rtree', 'write-only')""")
con.commit()
con.close()

# sanity: page count + root page depth
with open(OUT, "rb") as f:
    data = f.read()
print("bytes", len(data), "pages", len(data) // 1024)
con = sqlite3.connect(OUT)
for row in con.execute("SELECT name, rootpage FROM sqlite_master WHERE type='table'"):
    print(row)
print(con.execute("SELECT count(*) FROM supplier_pts").fetchone())
